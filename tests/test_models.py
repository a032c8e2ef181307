import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
from hcpdiff_tpu.models.vae import VAEConfig, AutoencoderKL


@pytest.fixture(scope='module')
def tiny_unet():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([1, 2])
    ctx = jnp.zeros((2, 77, cfg.cross_attention_dim))
    params = model.init(rng, sample, t, ctx)['params']
    return cfg, model, params


def test_unet_shapes_and_determinism(tiny_unet):
    cfg, model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, cfg.cross_attention_dim))
    t = jnp.array([10, 500])
    out1 = model.apply({'params': params}, x, t, ctx)
    out2 = model.apply({'params': params}, x, t, ctx)
    assert out1.shape == (2, 16, 16, 4)
    assert out1.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_unet_timestep_sensitivity(tiny_unet):
    cfg, model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.cross_attention_dim))
    a = model.apply({'params': params}, x, jnp.array([10]), ctx)
    b = model.apply({'params': params}, x, jnp.array([900]), ctx)
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unet_context_sensitivity(tiny_unet):
    cfg, model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    c1 = jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.cross_attention_dim))
    c2 = jax.random.normal(jax.random.PRNGKey(3), (1, 77, cfg.cross_attention_dim))
    a = model.apply({'params': params}, x, jnp.array([10]), c1)
    b = model.apply({'params': params}, x, jnp.array([10]), c2)
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unet_grad_flows(tiny_unet):
    cfg, model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.cross_attention_dim))

    def loss(p):
        return jnp.mean(model.apply({'params': p}, x, jnp.array([10]), ctx) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_unet_sdxl_text_time():
    cfg = UNetConfig.tiny_sdxl()
    model = UNet2DCondition(cfg, dtype=jnp.float32)
    sample = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    pooled = jnp.zeros((1, 32))
    tid = jnp.zeros((1, 6))
    params = model.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx,
                        pooled_text_emb=pooled, time_ids=tid)['params']
    out = model.apply({'params': params}, sample, jnp.array([1]), ctx,
                      pooled_text_emb=pooled, time_ids=tid)
    assert out.shape == (1, 16, 16, 4)


def test_unet_controlnet_residual_taps(tiny_unet):
    cfg, model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.cross_attention_dim))
    base = model.apply({'params': params}, x, jnp.array([10]), ctx)
    mid = jnp.ones((1, 8, 8, cfg.block_out_channels[-1]))
    tweaked = model.apply({'params': params}, x, jnp.array([10]), ctx, mid_residual=mid)
    assert not np.allclose(np.asarray(base), np.asarray(tweaked), atol=1e-5)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))['params']
    mean, logvar = model.apply({'params': params}, x, method='encode')
    assert mean.shape == (1, 16, 16, 4) and logvar.shape == mean.shape
    dec = model.apply({'params': params}, mean, method='decode')
    assert dec.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(dec)).all()


def test_vae_downsample_factor_matches_sd():
    cfg = VAEConfig.tiny(block_out_channels=(8, 16, 16, 16), norm_num_groups=2)
    model = AutoencoderKL(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))['params']
    mean, _ = model.apply({'params': params}, x, method='encode')
    assert mean.shape == (1, 8, 8, 4)  # /8 like SD


def test_fused_qkv_matches_unfused(tiny_unet, monkeypatch):
    """HCP_FUSED_QKV=1 (one qkv matmul; opt-in, off by default — measured
    slower on v5e, see unet.py) must produce the exact param pytree and
    outputs of the separate to_q/to_k/to_v Dense path."""
    cfg, model, _ = tiny_unet
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([3, 5])
    c = jnp.ones((2, 77, cfg.cross_attention_dim))

    monkeypatch.setenv('HCP_FUSED_QKV', '1')
    p1 = model.init(jax.random.PRNGKey(0), x, t, c)['params']
    o1 = model.apply({'params': p1}, x, t, c)
    monkeypatch.setenv('HCP_FUSED_QKV', '0')
    p0 = model.init(jax.random.PRNGKey(0), x, t, c)['params']
    o0 = model.apply({'params': p0}, x, t, c)

    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat0 = dict(jax.tree_util.tree_leaves_with_path(p0))
    assert set(dict(flat1)) == set(flat0)
    for path, v in flat1:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat0[path]))
    # outputs agree to fp32 reassociation noise (same math, one fused matmul)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), atol=1e-5)
