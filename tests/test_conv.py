"""Pallas 3x3 conv kernel tests (ops/conv.py) — interpret mode on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from hcpdiff_tpu.ops.conv import _conv3_ref, conv3x3


@pytest.mark.parametrize('B,H,W,Cin,Cout', [(2, 8, 8, 32, 64),
                                            (1, 16, 16, 64, 32),
                                            (2, 8, 12, 16, 48)])
def test_conv3x3_matches_xla(B, H, W, Cin, Cout):
    r = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(r[0], (B, H, W, Cin), jnp.float32)
    w = jax.random.normal(r[1], (3, 3, Cin, Cout), jnp.float32) * 0.1
    b = jax.random.normal(r[2], (Cout,), jnp.float32) * 0.1
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3(x, w, b)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_conv3_ref(x, w, b, None, None)),
                               atol=3e-4, rtol=1e-4)


def test_conv3x3_row_bias_and_res():
    r = jax.random.split(jax.random.PRNGKey(1), 5)
    B, H, W, Cin, Cout = 2, 8, 8, 16, 32
    x = jax.random.normal(r[0], (B, H, W, Cin), jnp.float32)
    w = jax.random.normal(r[1], (3, 3, Cin, Cout), jnp.float32) * 0.1
    b = jax.random.normal(r[2], (Cout,), jnp.float32) * 0.1
    rb = jax.random.normal(r[3], (B, Cout), jnp.float32)
    res = jax.random.normal(r[4], (B, H, W, Cout), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3(x, w, b, row_bias=rb, res=res)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_conv3_ref(x, w, b, rb, res)),
                               atol=3e-4, rtol=1e-4)


def test_conv3x3_grads():
    r = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(r[0], (1, 8, 8, 16), jnp.float32)
    w = jax.random.normal(r[1], (3, 3, 16, 16), jnp.float32) * 0.1
    b = jnp.zeros((16,), jnp.float32)

    def loss_pallas(x, w, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv3x3(x, w, b) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(_conv3_ref(x, w, b, None, None) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, rr in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(rr),
                                   atol=1e-2, rtol=1e-3)


def test_unet_pallas_conv_parity(monkeypatch):
    """HCP_PALLAS_CONV=1 must produce the exact nn.Conv param pytree and
    matching outputs (exercises the row_bias/res epilogues in the
    resblocks)."""
    from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
    cfg = UNetConfig.tiny()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([3, 5])
    c = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 77, cfg.cross_attention_dim))

    monkeypatch.setenv('HCP_PALLAS_CONV', '0')
    model = UNet2DCondition(cfg, dtype=jnp.float32)
    p0 = model.init(jax.random.PRNGKey(2), x, t, c)['params']
    o0 = model.apply({'params': p0}, x, t, c)

    monkeypatch.setenv('HCP_PALLAS_CONV', '1')
    monkeypatch.setenv('HCP_PALLAS_FORCE', '1')
    with pltpu.force_tpu_interpret_mode():
        p1 = model.init(jax.random.PRNGKey(2), x, t, c)['params']
        o1 = model.apply({'params': p1}, x, t, c)

    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=5e-4, rtol=1e-4)


def test_unet_all_pallas_kernels_compose(monkeypatch):
    """All opt-in Pallas routings together (conv + proj + LN) must still
    match the plain path — catches interaction bugs between the fused
    epilogues/prologues."""
    from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
    cfg = UNetConfig.tiny()
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
    t = jnp.array([40])
    c = jax.random.normal(jax.random.PRNGKey(8),
                          (1, 77, cfg.cross_attention_dim))

    for k in ('HCP_PALLAS_CONV', 'HCP_PALLAS_PROJ', 'HCP_PALLAS_LN',
              'HCP_PALLAS_FORCE'):
        monkeypatch.setenv(k, '0')
    monkeypatch.setenv('HCP_PALLAS_FF', '0')
    model = UNet2DCondition(cfg, dtype=jnp.float32)
    p0 = model.init(jax.random.PRNGKey(9), x, t, c)['params']
    o0 = model.apply({'params': p0}, x, t, c)

    for k in ('HCP_PALLAS_CONV', 'HCP_PALLAS_PROJ', 'HCP_PALLAS_LN',
              'HCP_PALLAS_FORCE'):
        monkeypatch.setenv(k, '1')
    with pltpu.force_tpu_interpret_mode():
        p1 = model.init(jax.random.PRNGKey(9), x, t, c)['params']
        o1 = model.apply({'params': p1}, x, t, c)

    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=1e-3, rtol=1e-4)


def test_train_step_with_all_pallas_kernels(monkeypatch):
    """One LoRA train step with every opt-in Pallas routing on (conv +
    proj + LN + ff), interpret mode: exercises the custom_vjp backwards
    under value_and_grad + grad-accum scan — finite loss and grads."""
    import optax

    from hcpdiff_tpu.adapt.overlay import make_lora_overlay
    from hcpdiff_tpu.diffusion.losses import MSELoss
    from hcpdiff_tpu.diffusion.schedules import NoiseSchedule
    from hcpdiff_tpu.trainer.step import (StepConfig, build_train_step,
                                          init_train_state)
    from tests.helpers import tiny_world

    for k in ('HCP_PALLAS_CONV', 'HCP_PALLAS_PROJ', 'HCP_PALLAS_LN',
              'HCP_PALLAS_FORCE'):
        monkeypatch.setenv(k, '1')
    world = tiny_world()
    unet, te = world['unet'], world['te']
    frontend = world['frontend']
    schedule = NoiseSchedule.make()

    def unet_apply(params, x, t, ctx, **extra):
        return unet.apply({'params': params}, x, t, ctx, **extra)

    def te_encode(te_params, ids, tm, emb_ext):
        return frontend.encode_ids(te_params, ids, tm, emb_ext)

    overlay, scales = make_lora_overlay(
        jax.random.PRNGKey(0), world['unet_params'],
        [{'layers': ['re:.*attn1\\.to_q$'], 'rank': 2}])
    pack = {'lora_unet': overlay}
    tx = optax.adam(1e-3)
    step = build_train_step(unet_apply, te_encode, schedule, MSELoss(),
                            tx, None, StepConfig(),
                            lora_scales={'lora_unet': scales})
    state = init_train_state(pack, tx, None, use_ema=False)
    frozen = {'unet': world['unet_params'], 'te': world['te_params']}
    ids, mult = frontend.tokenize_batch(['a cat'])
    batch = {'latents': jnp.zeros((1, 8, 8, 4)) + 0.1,
             'input_ids': jnp.asarray(ids),
             'token_mult': jnp.asarray(mult)}
    with pltpu.force_tpu_interpret_mode():
        state2, m = step(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m['loss']))
    assert np.isfinite(float(m['grad_norm'])) and float(m['grad_norm']) > 0
