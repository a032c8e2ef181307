import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hcpdiff_tpu.models.controlnet import ControlNet, init_from_unet
from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition


@pytest.fixture(scope='module')
def setup():
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg, dtype=jnp.float32)
    cn = ControlNet(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([5])
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    cond = jnp.zeros((1, 64, 64, 3))  # cond image at 8x latent res
    unet_params = unet.init(jax.random.PRNGKey(0), x, t, ctx)['params']
    cn_params = cn.init(jax.random.PRNGKey(1), x, t, ctx, cond)['params']
    return cfg, unet, cn, unet_params, cn_params


def test_zero_init_is_identity(setup):
    """Fresh ControlNet must not change the UNet output (zero heads)."""
    cfg, unet, cn, unet_params, cn_params = setup
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, cfg.cross_attention_dim))
    t = jnp.array([10])
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3))

    down_res, mid_res = cn.apply({'params': cn_params}, x, t, ctx, cond)
    base = unet.apply({'params': unet_params}, x, t, ctx)
    tapped = unet.apply({'params': unet_params}, x, t, ctx,
                        down_residuals=down_res, mid_residual=mid_res)
    for r in down_res + [mid_res]:
        assert float(jnp.abs(r).max()) == 0.0
    np.testing.assert_allclose(np.asarray(base), np.asarray(tapped), atol=1e-6)


def test_residual_shapes_match_skips(setup):
    cfg, unet, cn, unet_params, cn_params = setup
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    cond = jnp.zeros((1, 64, 64, 3))
    down_res, mid_res = cn.apply({'params': cn_params}, x, jnp.array([1]), ctx, cond)
    # skips: conv_in + per-layer + downsamples = 1 + 2*1 + 1 = 4 for tiny cfg
    assert len(down_res) == 1 + len(cfg.block_out_channels) * cfg.layers_per_block \
        + (len(cfg.block_out_channels) - 1)
    assert mid_res.shape[-1] == cfg.block_out_channels[-1]


def test_trained_head_changes_output(setup):
    cfg, unet, cn, unet_params, cn_params = setup
    import jax.tree_util as jtu
    # nudge the mid zero-conv away from zero
    cn_params2 = jax.device_get(cn_params)
    cn_params2['zero_mid']['kernel'] = np.ones_like(
        np.asarray(cn_params2['zero_mid']['kernel'])) * 0.1
    # cond-embedding head is also zero-init; open it so the cond image flows
    cn_params2['cond_embedding']['conv_out']['kernel'] = np.full_like(
        np.asarray(cn_params2['cond_embedding']['conv_out']['kernel']), 0.1)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, cfg.cross_attention_dim))
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3))
    t = jnp.array([10])
    down_res, mid_res = cn.apply({'params': cn_params2}, x, t, ctx, cond)
    base = unet.apply({'params': unet_params}, x, t, ctx)
    tapped = unet.apply({'params': unet_params}, x, t, ctx,
                        down_residuals=down_res, mid_residual=mid_res)
    assert not np.allclose(np.asarray(base), np.asarray(tapped), atol=1e-6)
    # cond image matters
    down2, mid2 = cn.apply({'params': cn_params2}, x, t, ctx, cond * 0)
    assert not np.allclose(np.asarray(mid_res), np.asarray(mid2), atol=1e-7)


def test_init_from_unet_copies_shared(setup):
    cfg, unet, cn, unet_params, cn_params = setup
    merged = init_from_unet(jax.device_get(cn_params), jax.device_get(unet_params))
    np.testing.assert_array_equal(
        np.asarray(merged['down_0_res_0']['conv1']['kernel']),
        np.asarray(unet_params['down_0_res_0']['conv1']['kernel']))
    # zero convs untouched
    assert float(np.abs(np.asarray(merged['zero_mid']['kernel'])).max()) == 0.0
