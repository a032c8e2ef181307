"""Headline benchmark: SD1.5 512px 20-step txt2img images/sec/chip.

Runs the full-size SD1.5 UNet (random weights — throughput doesn't depend on
weight values) through the jitted CFG denoise loop (DPM++ 2M, 20 steps) plus
VAE decode, on whatever backend jax selects (TPU under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); we use 2.5
images/sec as the A100+xFormers SD1.5 20-step batched-throughput estimate
derived from public SD benchmarks (~16 TFLOP/image at 40% MFU of 312 TFLOPS
fp16, typical pipeline overheads included).

Scope note (BASELINE.md): the timed loop covers the jitted CFG denoise
scan + VAE decode with precomputed text embeddings (77 tokens; the CLIP
pass is <1% of generation FLOPs) — matching how the A100 estimate is
normally quoted (pipeline with cached prompt embeds).

Extra modes (not used by the driver, which runs plain `python bench.py`):
  BENCH_MODEL=sdxl    SDXL base (2048-d context, pooled+time_ids), 1024px
  BENCH_SIZE=768      other resolutions for the sd15 model

Their baselines are FLOP-consistent A100+xFormers estimates: the 512px
anchor (2.5 img/s x 34.65 TF/img) puts the A100 at 87 TF/s (28% of its
312 TF/s fp16 peak); holding that 87 TF/s across the calibrated FLOP
model (TFLOP_PER_IMAGE below, tools_dev/flops_model.py) gives
768px -> 87/91.68 = 0.95 img/s and SDXL-1024 -> 87/280.92 = 0.31 img/s.
Earlier rounds shipped 1.1 (768, assumed pixel-proportional FLOPs — but
attention is S^2, true growth is 2.65x not 2.25x) and 0.55 (SDXL, a
public ~1.8 s/img@30-step scaling that implies the A100 jumps to 49%
MFU on SDXL, inconsistent with its own 512px anchor). Derivations:
BASELINE.md round-4 roofline section.
"""
import json
import os
import sys
import time

BASELINES = {
    ('sd15', 512): 2.5,
    ('sd15', 768): 0.95,   # was 1.1 (FLOP-inconsistent; see module docstring)
    ('sdxl', 1024): 0.31,  # was 0.55 (FLOP-inconsistent; see module docstring)
}

# TFLOP per image for the exact 20-step CFG loop + VAE decode, from the
# calibrated analytic model (tools_dev/flops_model.py; <1% vs XLA
# cost_analysis). Lets the JSON line report achieved TF/s and MFU.
TFLOP_PER_IMAGE = {
    ('sd15', 512): 34.65,
    ('sd15', 768): 91.68,
    ('sdxl', 1024): 280.92,
}
V5E_BF16_PEAK_TFLOPS = 197.0


def _v(msg):
    if os.environ.get('BENCH_VERBOSE', '0') == '1':
        print(f'[bench {time.strftime("%H:%M:%S")}] {msg}',
              file=sys.stderr, flush=True)


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

    model = os.environ.get('BENCH_MODEL', 'sd15')
    steps = int(os.environ.get('BENCH_STEPS', '20'))
    size = int(os.environ.get('BENCH_SIZE', '1024' if model == 'sdxl' else '512'))
    batch = int(os.environ.get('BENCH_BATCH', '4' if model == 'sdxl' else '8'))
    lat = size // 8

    dtype = jnp.bfloat16
    ucfg = UNetConfig.sdxl() if model == 'sdxl' else UNetConfig.sd15()
    ctx_dim = 2048 if model == 'sdxl' else 768
    unet = UNet2DCondition(ucfg, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    init_kw = {}
    if model == 'sdxl':
        init_kw = dict(pooled_text_emb=jnp.zeros((1, 1280), dtype),
                       time_ids=jnp.zeros((1, 6), jnp.float32))
    _v(f'init UNet ({model}, {size}px, batch {batch})')
    # jitted init: eager flax init dispatches thousands of tiny ops, which
    # over the axon tunnel costs ~10 min; one compiled program (persistent-
    # cached across bench rows) takes seconds.
    unet_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, lat, lat, 4), dtype),
        jnp.array([0]), jnp.zeros((1, 77, ctx_dim), dtype),
        **init_kw)['params']
    _v('UNet init done')
    vcfg = VAEConfig.sd()
    vae = AutoencoderKL(vcfg, dtype=dtype)
    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
        jax.random.PRNGKey(2))['params']

    # inference-time weight cast: params live in HBM as bf16, halving the
    # weight reads each of the 2x20 UNet invocations per generation.
    # donate_argnums frees each fp32 buffer as its convert completes —
    # without it the fp32 tree (10.4 GB for SDXL) and the bf16 copy are
    # live simultaneously and SDXL OOMs a 16 GB v5e before the loop runs.
    cast = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t),
        donate_argnums=0)
    unet_params = cast(unet_params)
    vae_params = cast(vae_params)

    def unet_apply(p, x, t, ctx, **kw):
        return unet.apply({'params': p}, x, t, ctx, **kw)

    schedule = NoiseSchedule.make()
    sampler = make_sampler('dpm++_2m', schedule, steps)
    # BENCH_DEEPCACHE=N: DeepCache acceleration (approximate; NOT used for
    # the headline — the default loop stays exact)
    dc = int(os.environ.get('BENCH_DEEPCACHE', '0'))
    loop = DenoiseLoop(unet_apply, sampler, deep_cache_interval=dc)

    decode = jax.jit(lambda p, z: vae.apply(
        {'params': p}, z / vcfg.scaling_factor, method='decode'))

    ctx = jax.random.normal(jax.random.PRNGKey(3), (2 * batch, 77, ctx_dim)).astype(dtype)
    latents = jax.random.normal(jax.random.PRNGKey(4), (batch, lat, lat, 4))
    extra = None
    if model == 'sdxl':
        extra = dict(
            pooled_text_emb=jax.random.normal(
                jax.random.PRNGKey(5), (2 * batch, 1280)).astype(dtype),
            time_ids=jnp.tile(jnp.array([[size, size, 0, 0, size, size]],
                                        jnp.float32), (2 * batch, 1)))

    def one_gen(seed):
        out, _ = loop(unet_params, latents, ctx, jax.random.PRNGKey(seed), 7.5,
                      extra_cond=extra)
        img = decode(vae_params, out)
        return img

    # warmup/compile
    _v('compiling denoise loop + decode')
    one_gen(0).block_until_ready()
    _v('compile done; timing')

    n_iters = int(os.environ.get('BENCH_ITERS', '3'))
    t0 = time.perf_counter()
    for i in range(n_iters):
        img = one_gen(i + 1)
    img.block_until_ready()
    dt = time.perf_counter() - t0
    img_per_s = (batch * n_iters) / dt

    name = 'SDXL' if model == 'sdxl' else 'SD1.5'
    if dc:
        name += f' +DeepCache/{dc}'
    baseline = BASELINES.get((model, size))
    line = {
        'metric': f'{name} {size}px {steps}-step txt2img (CFG, DPM++ 2M, bf16)',
        'value': round(img_per_s, 4),
        'unit': 'images/sec/chip',
        'vs_baseline': round(img_per_s / baseline, 4) if baseline else None,
    }
    tf = TFLOP_PER_IMAGE.get((model, size))
    if tf and steps == 20 and not dc:
        line['achieved_tflops_per_sec'] = round(img_per_s * tf, 1)
        line['mfu'] = round(img_per_s * tf / V5E_BF16_PEAK_TFLOPS, 3)
    print(json.dumps(line))


if __name__ == '__main__':
    main()
