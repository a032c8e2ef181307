"""Diffusers-layout pipeline export -> reload round trip."""
import numpy as np

import jax
import jax.numpy as jnp

from hcpdiff_tpu.ckpt.manager import CkptManagerDiffusers
from hcpdiff_tpu.models.factory import build_models
from helpers import tiny_world


def test_save_pipeline_reload_roundtrip(tmp_path):
    w = tiny_world()
    out = str(tmp_path / 'exported')
    CkptManagerDiffusers().save_pipeline(
        out,
        unet_params=jax.device_get(w['unet_params']), unet_cfg=w['unet_cfg'],
        vae_params=jax.device_get(w['vae_params']), vae_cfg=w['vae_cfg'],
        te_params=jax.device_get(w['te_params']), te_cfg=w['te_cfg'])

    world2 = build_models(out, dtype=jnp.float32)
    assert world2['unet_cfg'].block_out_channels == w['unet_cfg'].block_out_channels

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (1, 77, w['unet_cfg'].cross_attention_dim))
    t = jnp.array([7])
    a = w['unet'].apply({'params': w['unet_params']}, x, t, ctx)
    b = world2['unet'].apply({'params': world2['unet_params']}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    ids = jnp.zeros((1, 77), jnp.int32)
    la, _, _ = w['te'].apply({'params': w['te_params']}, ids)
    lb, _, _ = world2['te'].apply({'params': world2['te_params']}, ids)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)
