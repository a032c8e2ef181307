"""DeepCache-style deep-feature caching (models/unet.py deep_cache
protocol + DenoiseLoop deep_cache_interval).

Technique: 'Cache Me if You Can' / DeepCache (PAPERS.md) — deep UNet
levels are temporally redundant across denoise steps; recompute only the
shallowest level between full evaluations. Beyond-reference, opt-in
(changes outputs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hcpdiff_tpu.diffusion.samplers import make_sampler
from hcpdiff_tpu.diffusion.schedules import NoiseSchedule
from hcpdiff_tpu.infer.pipeline import DenoiseLoop
from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition


def _tiny():
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.array([0]),
                       jnp.zeros((1, 77, cfg.cross_attention_dim)))['params']
    return cfg, unet, params


def test_deep_cache_splice_is_exact_at_same_point():
    """At the SAME (x, t), splicing the just-computed deep feature must
    reproduce the full forward exactly — the approximation only comes
    from reusing it at a DIFFERENT step."""
    cfg, unet, params = _tiny()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([500, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, 77, cfg.cross_attention_dim))
    out_full, deep = unet.apply({'params': params}, x, t, ctx,
                                return_deep=True)
    assert deep is not None and deep.ndim == 4
    out_reuse = unet.apply({'params': params}, x, t, ctx, deep_cache=deep)
    np.testing.assert_allclose(np.asarray(out_reuse), np.asarray(out_full),
                               atol=1e-5, rtol=1e-5)


def test_deep_cache_loop_runs_and_tracks_exact():
    cfg, unet, params = _tiny()

    def unet_apply(p, x, t, c, **kw):
        return unet.apply({'params': p}, x, t, c, **kw)

    schedule = NoiseSchedule.make()
    steps = 6
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (4, 77, cfg.cross_attention_dim))
    lat = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 4))

    exact_loop = DenoiseLoop(unet_apply, make_sampler('dpm++_2m', schedule,
                                                      steps))
    out_exact, _ = exact_loop(params, lat, ctx, jax.random.PRNGKey(5), 7.5)

    dc_loop = DenoiseLoop(unet_apply, make_sampler('dpm++_2m', schedule,
                                                   steps),
                          deep_cache_interval=2)
    out_dc, _ = dc_loop(params, lat, ctx, jax.random.PRNGKey(5), 7.5)

    assert out_dc.shape == out_exact.shape
    assert np.all(np.isfinite(np.asarray(out_dc)))
    # approximate, but strongly correlated with the exact trajectory
    a = np.asarray(out_exact).ravel()
    b = np.asarray(out_dc).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9, corr
    # and genuinely different from the exact result (the cond took the
    # reuse branch at least once)
    assert not np.allclose(a, b)


def test_deep_cache_incompatible_with_dreamartist():
    cfg, unet, params = _tiny()

    def unet_apply(p, x, t, c, **kw):
        return unet.apply({'params': p}, x, t, c, **kw)

    loop = DenoiseLoop(unet_apply, make_sampler('ddim', NoiseSchedule.make(),
                                                4), deep_cache_interval=2)
    ctx = jnp.zeros((2, 77, cfg.cross_attention_dim))
    lat = jnp.zeros((1, 8, 8, 4))
    with pytest.raises(ValueError, match='DreamArtist'):
        loop(params, lat, ctx, jax.random.PRNGKey(0), 7.5,
             unet_params_neg=params)


def test_deep_cache_incompatible_with_controlnet_taps():
    cfg, unet, params = _tiny()
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    deep = jnp.zeros((1, 8, 8, cfg.block_out_channels[-2]))
    with pytest.raises(ValueError, match='ControlNet'):
        unet.apply({'params': params}, x, jnp.array([0]), ctx,
                   deep_cache=deep, mid_residual=jnp.zeros((1, 4, 4, 8)))


def test_txt2img_deep_cache_kwarg():
    """Pipeline-level wiring: txt2img(deep_cache_interval=2) produces an
    image batch of the right shape."""
    from tests.helpers import make_pipeline, tiny_world
    pipe = make_pipeline(tiny_world())
    img = pipe.txt2img('a cat', num_steps=4, width=64, height=64,
                       guidance_scale=7.5, deep_cache_interval=2)
    assert img.shape[0] == 1 and img.shape[-1] == 3
    assert np.all(np.isfinite(img))
