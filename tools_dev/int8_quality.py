"""int8 w8a8 inference evidence (VERDICT round-4 stretch #9): on-chip
img/s + PSNR/SSIM of the HCP_INT8 loop vs the exact bf16 loop, same
seeds/latents/context — the DeepCache-style quality record.

Caveat (recorded with the numbers): weights are random (no model
download in this environment), so this measures the numerical
divergence dynamic w8a8 quantization introduces through a real-sized
SD1.5 UNet + VAE under the real 20-step DPM++ 2M loop — not perceptual
quality of a trained model. tests/test_int8.py covers matmul accuracy
and routing; this adds the full-size on-chip measurement.

Usage: python tools_dev/int8_quality.py
Prints one JSON line per mode.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepcache_quality import psnr, ssim  # noqa: E402  (same metrics)


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
    batch = int(os.environ.get('BENCH_BATCH', '8'))
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

    schedule = NoiseSchedule.make()
    sampler = make_sampler('dpm++_2m', schedule, steps)
    decode = jax.jit(lambda p, z: vae.apply(
        {'params': p}, z / vcfg.scaling_factor, method='decode'))

    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (2 * batch, 77, 768)).astype(dtype)
    latents = jax.random.normal(jax.random.PRNGKey(4), (batch, lat, lat, 4))

    def run(int8):
        os.environ['HCP_INT8'] = '1' if int8 else '0'

        def unet_apply(p, x, t, c, **kw):
            return unet.apply({'params': p}, x, t, c, **kw)

        loop = DenoiseLoop(unet_apply, sampler)
        out, _ = loop(unet_params, latents, ctx, jax.random.PRNGKey(7), 7.5)
        img = decode(vae_params, out)
        img.block_until_ready()           # compile
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out, _ = loop(unet_params, latents, ctx, jax.random.PRNGKey(7),
                          7.5)
            img = decode(vae_params, out)
            img.block_until_ready()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return np.asarray(img, np.float32), batch / best

    exact, exact_ips = run(False)
    print(json.dumps({'mode': 'bf16', 'img_per_s': round(exact_ips, 4)}),
          flush=True)
    img, ips = run(True)
    print(json.dumps({
        'mode': 'int8_w8a8',
        'img_per_s': round(ips, 4),
        'speedup_vs_bf16': round(ips / exact_ips, 4),
        'psnr_db': round(psnr(img, exact), 2),
        'ssim': round(ssim(img, exact), 4),
        'note': 'random weights — numerical quantization divergence, '
                'not trained-model perceptual quality',
    }), flush=True)


if __name__ == '__main__':
    main()
