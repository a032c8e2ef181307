"""Headline benchmark: SD1.5 512px 20-step txt2img images/sec/chip.

Runs the full-size SD1.5 UNet (random weights — throughput doesn't depend on
weight values) through the jitted CFG denoise loop (DPM++ 2M, 20 steps) plus
VAE decode, on whatever backend jax selects (TPU under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); we use 2.5
images/sec as the A100+xFormers SD1.5 20-step batched-throughput estimate
derived from public SD benchmarks (~16 TFLOP/image at 40% MFU of 312 TFLOPS
fp16, typical pipeline overheads included).
"""
import json
import os
import sys
import time

BASELINE_IMG_PER_S = 2.5


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

    from hcpdiff_tpu.diffusion.samplers import make_sampler
    from hcpdiff_tpu.diffusion.schedules import NoiseSchedule
    from hcpdiff_tpu.infer.pipeline import DenoiseLoop
    from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
    from hcpdiff_tpu.models.vae import VAEConfig, AutoencoderKL

    batch = int(os.environ.get('BENCH_BATCH', '8'))
    steps = int(os.environ.get('BENCH_STEPS', '20'))
    size = int(os.environ.get('BENCH_SIZE', '512'))
    lat = size // 8

    dtype = jnp.bfloat16
    ucfg = UNetConfig.sd15()
    unet = UNet2DCondition(ucfg, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    unet_params = unet.init(rng, jnp.zeros((1, lat, lat, 4), dtype),
                            jnp.array([0]), jnp.zeros((1, 77, 768), dtype))['params']
    vcfg = VAEConfig.sd()
    vae = AutoencoderKL(vcfg, dtype=dtype)
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                          jax.random.PRNGKey(2))['params']

    # inference-time weight cast: params live in HBM as bf16, halving the
    # weight reads each of the 2x20 UNet invocations per generation
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t)
    unet_params = cast(unet_params)
    vae_params = cast(vae_params)

    def unet_apply(p, x, t, ctx):
        return unet.apply({'params': p}, x, t, ctx)

    schedule = NoiseSchedule.make()
    sampler = make_sampler('dpm++_2m', schedule, steps)
    loop = DenoiseLoop(unet_apply, sampler)

    decode = jax.jit(lambda p, z: vae.apply(
        {'params': p}, z / vcfg.scaling_factor, method='decode'))

    ctx = jax.random.normal(jax.random.PRNGKey(3), (2 * batch, 77, 768)).astype(dtype)
    latents = jax.random.normal(jax.random.PRNGKey(4), (batch, lat, lat, 4))

    def one_gen(seed):
        out, _ = loop(unet_params, latents, ctx, jax.random.PRNGKey(seed), 7.5)
        img = decode(vae_params, out)
        return img

    # warmup/compile
    one_gen(0).block_until_ready()

    n_iters = int(os.environ.get('BENCH_ITERS', '3'))
    t0 = time.perf_counter()
    for i in range(n_iters):
        img = one_gen(i + 1)
    img.block_until_ready()
    dt = time.perf_counter() - t0
    img_per_s = (batch * n_iters) / dt

    print(json.dumps({
        'metric': f'SD1.5 {size}px {steps}-step txt2img (CFG, DPM++ 2M, bf16)',
        'value': round(img_per_s, 4),
        'unit': 'images/sec/chip',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 4),
    }))


if __name__ == '__main__':
    main()
