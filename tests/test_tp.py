"""Tensor-parallel inference (parallel/tp.py + the models/unet.py tp>1
sublayer paths) on the virtual 8-device CPU mesh: the Megatron-style
column/row-parallel decomposition with one psum per sublayer must
reproduce the single-device forward exactly (fp32)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
from hcpdiff_tpu.parallel.tp import (make_tp_mesh, tp_unet_apply,
                                     tp_unet_config)


def _init(cfg, sdxl=False):
    model = UNet2DCondition(cfg, dtype=jnp.float32)
    kw = {}
    if sdxl:
        kw = dict(pooled_text_emb=jnp.zeros((1, 16)),
                  time_ids=jnp.zeros((1, 6)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.array([0]),
                        jnp.zeros((1, 7, cfg.cross_attention_dim)), **kw)['params']
    return model, params


def _inputs(rng, B, cfg):
    r1, r2 = jax.random.split(rng)
    x = jax.random.normal(r1, (B, 8, 8, 4))
    t = jnp.arange(B) * 100
    ctx = jax.random.normal(r2, (B, 7, cfg.cross_attention_dim))
    return x, t, ctx


@pytest.mark.parametrize('tp,data', [(2, 2), (4, 1)])
def test_tp_unet_matches_single_device(tp, data):
    cfg = UNetConfig.tiny(num_heads=(4, 4))
    model, params = _init(cfg)
    x, t, ctx = _inputs(jax.random.PRNGKey(1), 2 * data, cfg)
    ref = model.apply({'params': params}, x, t, ctx)

    mesh = make_tp_mesh(tp=tp, data=data,
                        devices=jax.devices()[:tp * data])
    tp_model = UNet2DCondition(tp_unet_config(cfg, tp), dtype=jnp.float32)
    out = jax.jit(tp_unet_apply(tp_model, mesh))(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_tp_sdxl_extras_and_param_tree_identity():
    """SDXL text_time extras ride through the shard_map kwargs path.
    Param-tree identity with the tp=1 module is proven by construction
    here: the tp apply consumes the STANDARD (tp=1) init tree directly —
    any shape/path divergence would fail flax's param shape check."""
    cfg = UNetConfig.tiny_sdxl(num_heads=(2, 2))
    model, params = _init(cfg, sdxl=True)
    B = 2
    x, t, ctx = _inputs(jax.random.PRNGKey(2), B, cfg)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (B, 16))
    tids = jnp.ones((B, 6))
    ref = model.apply({'params': params}, x, t, ctx,
                      pooled_text_emb=pooled, time_ids=tids)

    tp_model = UNet2DCondition(tp_unet_config(cfg, 2), dtype=jnp.float32)
    mesh = make_tp_mesh(tp=2, data=1, devices=jax.devices()[:2])
    out = jax.jit(tp_unet_apply(tp_model, mesh))(
        params, x, t, ctx, pooled_text_emb=pooled, time_ids=tids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_tp_validation_errors():
    cfg = UNetConfig.tiny()          # heads (2, 4)
    with pytest.raises(ValueError, match='does not divide'):
        tp_unet_config(cfg, 4)
    mesh = make_tp_mesh(tp=2, data=1, devices=jax.devices()[:2])
    model = UNet2DCondition(cfg, dtype=jnp.float32)  # cfg.tp == 1
    with pytest.raises(ValueError, match='cfg.tp'):
        tp_unet_apply(model, mesh)
    with pytest.raises(ValueError, match='!= 8 devices'):
        make_tp_mesh(tp=3)
