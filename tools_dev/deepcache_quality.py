"""DeepCache quality evidence (VERDICT round-3 item 8): on-chip img/s +
PSNR/SSIM of the DeepCache loop vs the EXACT loop at reuse intervals 2
and 3, same seeds/latents/context.

Caveat (recorded with the numbers): weights are random (no model
download in this environment), so this measures the numerical
divergence the deep-feature splice introduces through a real-sized
SD1.5 UNet + VAE under the real 20-step DPM++ 2M loop — not perceptual
quality of a trained model. The tiny-model trajectory-correlation tests
(tests/test_deepcache.py) cover splice exactness; this adds the
full-size, on-chip measurement README points at.

Usage: python tools_dev/deepcache_quality.py
Prints one JSON line per interval.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b, data_range=2.0):
    import numpy as np
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float('inf')
    return 10.0 * np.log10(data_range ** 2 / mse)


def ssim(a, b, data_range=2.0):
    """Global mean SSIM, 7x7 uniform window per channel (standard
    constants K1=0.01, K2=0.03)."""
    import numpy as np
    from scipy.ndimage import uniform_filter
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    C1, C2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    vals = []
    for i in range(a.shape[0]):
        for c in range(a.shape[-1]):
            x, y = a[i, ..., c], b[i, ..., c]
            f = lambda t: uniform_filter(t, size=7)
            mx, my = f(x), f(y)
            vx = f(x * x) - mx * mx
            vy = f(y * y) - my * my
            cxy = f(x * y) - mx * my
            s = ((2 * mx * my + C1) * (2 * cxy + C2)) / (
                (mx * mx + my * my + C1) * (vx + vy + C2))
            vals.append(s.mean())
    return float(np.mean(vals))


def main():
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.environ['JAX_COMPILATION_CACHE_DIR'])
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from hcpdiff_tpu.diffusion.samplers import make_sampler
    from hcpdiff_tpu.diffusion.schedules import NoiseSchedule
    from hcpdiff_tpu.infer.pipeline import DenoiseLoop
    from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
    from hcpdiff_tpu.models.vae import VAEConfig, AutoencoderKL

    steps = int(os.environ.get('BENCH_STEPS', '20'))
    size = int(os.environ.get('BENCH_SIZE', '512'))
    batch = int(os.environ.get('BENCH_BATCH', '4'))
    lat = size // 8
    dtype = jnp.bfloat16

    ucfg = UNetConfig.sd15()
    unet = UNet2DCondition(ucfg, dtype=dtype)
    unet_params = unet.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, lat, lat, 4), dtype),
                            jnp.array([0]),
                            jnp.zeros((1, 77, 768), dtype))['params']
    vcfg = VAEConfig.sd()
    vae = AutoencoderKL(vcfg, dtype=dtype)
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                          jax.random.PRNGKey(2))['params']
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t)
    unet_params, vae_params = cast(unet_params), cast(vae_params)

    def unet_apply(p, x, t, ctx, **kw):
        return unet.apply({'params': p}, x, t, ctx, **kw)

    schedule = NoiseSchedule.make()
    sampler = make_sampler('dpm++_2m', schedule, steps)
    decode = jax.jit(lambda p, z: vae.apply(
        {'params': p}, z / vcfg.scaling_factor, method='decode'))

    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (2 * batch, 77, 768)).astype(dtype)
    latents = jax.random.normal(jax.random.PRNGKey(4), (batch, lat, lat, 4))

    def run(dc):
        loop = DenoiseLoop(unet_apply, sampler, deep_cache_interval=dc)
        out, _ = loop(unet_params, latents, ctx, jax.random.PRNGKey(7), 7.5)
        img = decode(vae_params, out)
        img.block_until_ready()           # compile
        t0 = time.perf_counter()
        out, _ = loop(unet_params, latents, ctx, jax.random.PRNGKey(7), 7.5)
        img = decode(vae_params, out)
        img.block_until_ready()
        dt = time.perf_counter() - t0
        return np.asarray(img, np.float32), batch / dt

    exact, exact_ips = run(0)
    print(json.dumps({'interval': 0, 'img_per_s': round(exact_ips, 4)}),
          flush=True)
    for dc in (2, 3):
        img, ips = run(dc)
        print(json.dumps({
            'interval': dc,
            'img_per_s': round(ips, 4),
            'speedup_vs_exact': round(ips / exact_ips, 4),
            'psnr_db': round(psnr(img, exact), 2),
            'ssim': round(ssim(img, exact), 4),
            'note': 'random weights — numerical splice divergence, '
                    'not trained-model perceptual quality',
        }), flush=True)


if __name__ == '__main__':
    main()
