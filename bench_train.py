"""Secondary headline benchmark: SD1.5 LoRA fine-tune samples/sec/chip
(ARB-style 512px latents, Min-SNR loss, cached latents — the BASELINE.md
training metric). Prints ONE JSON line like bench.py.

BENCH_MODEL=sdxl switches to SDXL-LoRA at 1024px latents (dual-TE encode,
pooled + time_ids conditioning — the trainer/step.py SDXL path). Its
baseline: SDXL has ~6x SD1.5's per-sample UNet FLOPs at 1024px, so the
A100+xFormers estimate scales 6.0 -> ~1.0 samples/s.
"""
import json
import os
import time

BASELINES = {'sd15': 6.0, 'sdxl': 1.0}  # A100+xFormers LoRA estimates


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
    import optax

    from hcpdiff_tpu.adapt.overlay import make_lora_overlay
    from hcpdiff_tpu.diffusion.losses import MinSNRLoss
    from hcpdiff_tpu.diffusion.schedules import NoiseSchedule
    from hcpdiff_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from hcpdiff_tpu.models.text_frontend import TextEncoderFrontend
    from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
    from hcpdiff_tpu.trainer.step import (StepConfig, build_train_step,
                                          init_train_state)
    from hcpdiff_tpu.utils.clip_tokenizer import CLIPTokenizer

    model = os.environ.get('BENCH_MODEL', 'sd15')
    sdxl = model == 'sdxl'
    B = int(os.environ.get('BENCH_BATCH', '4' if sdxl else '8'))
    lat = int(os.environ.get('BENCH_SIZE', '1024' if sdxl else '512')) // 8
    dtype = jnp.bfloat16

    ucfg = UNetConfig.sdxl() if sdxl else UNetConfig.sd15()
    ctx_dim = 2048 if sdxl else 768
    unet = UNet2DCondition(ucfg, dtype=dtype, remat=True)
    init_kw = {}
    if sdxl:
        init_kw = dict(pooled_text_emb=jnp.zeros((1, 1280)),
                       time_ids=jnp.zeros((1, 6)))
    frozen_bf16 = os.environ.get('HCP_FROZEN_BF16',
                                 '1' if sdxl else '0') == '1'
    # With bf16 frozen storage the TE modules must ALSO run bf16: a fp32
    # module dtype makes XLA materialize fp32 copies of the weights inside
    # the step — ~5.6 GB of temps for SDXL's bigG alone, which OOMs the
    # 16G chip before activations are even counted.
    te_dtype = jnp.bfloat16 if frozen_bf16 else jnp.float32

    def jinit(mod, *args, **kw):
        # jitted init: eager flax init dispatches thousands of tiny ops over
        # the axon tunnel (~10 min); one compiled, persistent-cached program
        # instead. With frozen_bf16 the cast happens INSIDE the program, so
        # the fp32 tree never materializes whole on the chip — casting after
        # init would peak at fp32(unet)+fp32(bigG)+cast temps ≈ 14.6 GB and
        # OOM the 16 GB v5e before the step is even traced.
        def f(rng):
            p = mod.init(rng, *args, **kw)['params']
            if frozen_bf16:
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x, p)
            return p
        return jax.jit(f)

    unet_params = jinit(unet, jnp.zeros((1, lat, lat, 4)), jnp.array([0]),
                        jnp.zeros((1, 77, ctx_dim)),
                        **init_kw)(jax.random.PRNGKey(0))
    tcfg = CLIPTextConfig.sd15()
    te = CLIPTextModel(tcfg, dtype=te_dtype)
    te_params = jinit(te, jnp.zeros((1, 77), jnp.int32))(jax.random.PRNGKey(1))
    te2 = te2_params = None
    if sdxl:
        from hcpdiff_tpu.models.clip import CLIPTextConfig as _TC
        te2 = CLIPTextModel(_TC.sdxl_big_g(), dtype=te_dtype)
        te2_params = jinit(te2, jnp.zeros((1, 77), jnp.int32))(
            jax.random.PRNGKey(4))

    schedule = NoiseSchedule.make()
    overlay, scales = make_lora_overlay(
        jax.random.PRNGKey(2), unet_params,
        [{'layers': ['re:.*attn[12]\\.to_(q|k|v|out)$', 're:.*ff\\.(proj|out)$'],
          'rank': 8}])
    pack = {'lora_unet': overlay}

    def unet_apply(p, x, t, ctx, **e):
        return unet.apply({'params': p}, x, t, ctx, **e)

    if sdxl:
        from hcpdiff_tpu.models.text_frontend import TextEncoderFrontend

        class _Tok:  # encode_ids only reads model_max_length
            model_max_length = 77
        fe1 = TextEncoderFrontend(_Tok(), te, te_params, clip_skip=1,
                                  clip_final_norm=False)
        fe2 = TextEncoderFrontend(_Tok(), te2, te2_params, clip_skip=1,
                                  clip_final_norm=False)

        def te_encode(p, ids, tm, ext):
            h1, _ = fe1.encode_ids(p['te'], ids, tm)
            h2, pooled = fe2.encode_ids(p['te2'], ids, tm)
            return jnp.concatenate([h1, h2], axis=-1), pooled
    else:
        def te_encode(p, ids, tm, ext):
            last, pooled, _ = te.apply({'params': p}, ids, emb_ext=ext,
                                       embedding_multiplier=tm)
            return last, pooled

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    step = jax.jit(build_train_step(unet_apply, te_encode, schedule,
                                    MinSNRLoss(schedule), tx, None,
                                    StepConfig(), {'lora_unet': scales}),
                   donate_argnums=(0,))
    state = init_train_state(pack, tx)
    # frozen_bf16 storage happened inside jinit (bf16 halves the dominant
    # HBM term — required to fit SDXL-1024 on one 16G v5e chip, where the
    # fp32 base alone is 10.3G; mirrors the Trainer's
    # model.frozen_base_dtype: bf16 config option, trainer.py:719).
    frozen = {'unet': unet_params, 'te': te_params}
    if sdxl:
        frozen['te2'] = te2_params

    rng = np.random.default_rng(0)
    batch = {'latents': jnp.asarray(rng.normal(size=(B, lat, lat, 4)),
                                    jnp.float32),
             'input_ids': jnp.asarray(rng.integers(0, 49405, size=(B, 77)),
                                      jnp.int32)}
    if sdxl:
        size = lat * 8
        batch['time_ids'] = jnp.tile(
            jnp.array([[size, size, 0, 0, size, size]], jnp.float32), (B, 1))

    state, m = step(state, frozen, batch, jax.random.PRNGKey(1))  # compile
    jax.block_until_ready(m)

    iters = int(os.environ.get('BENCH_ITERS', '10'))
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, frozen, batch, jax.random.PRNGKey(i + 2))
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    sps = B * iters / dt
    name = 'SDXL' if sdxl else 'SD1.5'
    print(json.dumps({
        'metric': f'{name} {lat * 8}px LoRA fine-tune (Min-SNR, bf16, remat)',
        'value': round(sps, 4), 'unit': 'samples/sec/chip',
        'vs_baseline': round(sps / BASELINES[model], 4)}))


if __name__ == '__main__':
    main()
