"""Pallas projection GEMM tests (ops/matmul.py) — interpret mode on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from hcpdiff_tpu.ops.matmul import fused_dense, geglu_dense


def _ref_dense(x, w, b):
    return (x.astype(jnp.float32) @ w.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


def _ref_geglu(x, w, b):
    y = x.astype(jnp.float32) @ w.astype(jnp.float32) + b.astype(jnp.float32)
    h, gate = jnp.split(y, 2, axis=-1)
    return (h * jax.nn.gelu(gate, approximate=False)).astype(x.dtype)


@pytest.mark.parametrize('M,K,N', [(256, 320, 512), (128, 64, 128),
                                   (1024, 320, 2560)])
def test_fused_dense_matches(M, K, N):
    rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    x = jax.random.normal(r1, (M, K), jnp.float32)
    w = jax.random.normal(r2, (K, N), jnp.float32) * 0.05
    b = jax.random.normal(r3, (N,), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_dense(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref_dense(x, w, b)),
                               atol=2e-4, rtol=1e-4)


def test_fused_dense_3d_and_odd_blocks():
    # [B, S, K] input; M = 2*192 = 384 not divisible by 512 -> _pick path
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 192, 96), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (96, 160), jnp.float32) * 0.1
    b = jnp.zeros((160,), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_dense(x, w, b)
    assert out.shape == (2, 192, 160)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref_dense(x, w, b)),
                               atol=2e-4, rtol=1e-4)


def test_geglu_dense_matches():
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 64, 96), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (96, 2 * 384), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(5), (2 * 384,), jnp.float32) * 0.1
    with pltpu.force_tpu_interpret_mode():
        out = geglu_dense(x, w, b)
    assert out.shape == (4, 64, 384)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref_geglu(x, w, b)),
                               atol=3e-4, rtol=1e-4)


def test_fused_dense_grads():
    x = jax.random.normal(jax.random.PRNGKey(6), (32, 48), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(7), (48, 64), jnp.float32) * 0.1
    b = jnp.ones((64,), jnp.float32) * 0.1

    def loss_pallas(x, w, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_dense(x, w, b) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(_ref_dense(x, w, b) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-2, rtol=1e-3)


def test_geglu_grads():
    x = jax.random.normal(jax.random.PRNGKey(8), (16, 32), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(9), (32, 2 * 128), jnp.float32) * 0.1
    b = jnp.zeros((2 * 128,), jnp.float32)

    def loss_pallas(x, w, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(geglu_dense(x, w, b) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(_ref_geglu(x, w, b) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-2, rtol=1e-3)


@pytest.mark.parametrize('bk', [0, 32])
def test_fused_dense_residual(bk):
    """Epilogue residual: out = x@w + b + res, both K-resident (bk=0 auto)
    and K-streaming (bk=32 forces the accumulator path)."""
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 128, 96), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(11), (96, 160), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(12), (160,), jnp.float32)
    r = jax.random.normal(jax.random.PRNGKey(13), (2, 128, 160), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_dense(x, w, b, bk=bk, res=r)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref_dense(x, w, b) + r),
                               atol=2e-4, rtol=1e-4)


def test_fused_dense_residual_grads():
    x = jax.random.normal(jax.random.PRNGKey(14), (32, 48), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(15), (48, 64), jnp.float32) * 0.1
    b = jnp.ones((64,), jnp.float32) * 0.1
    r = jax.random.normal(jax.random.PRNGKey(16), (32, 64), jnp.float32)

    def loss_pallas(x, w, b, r):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_dense(x, w, b, res=r) ** 2)

    def loss_ref(x, w, b, r):
        return jnp.sum((_ref_dense(x, w, b) + r) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, w, b, r)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, b, r)
    for a, r_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r_),
                                   atol=1e-2, rtol=1e-3)


def _ref_ln(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * g + b


def test_ln_qkv_matches():
    from hcpdiff_tpu.ops.matmul import ln_qkv
    x = jax.random.normal(jax.random.PRNGKey(20), (2, 128, 96))
    g = jax.random.normal(jax.random.PRNGKey(21), (96,)) * 0.1 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(22), (96,)) * 0.1
    ws = [jax.random.normal(jax.random.PRNGKey(23 + i), (96, 96)) * 0.1
          for i in range(3)]
    with pltpu.force_tpu_interpret_mode():
        q, k, v = ln_qkv(x, g, b, *ws)
    xn = _ref_ln(x, g, b).astype(x.dtype)
    for out, w in zip((q, k, v), ws):
        np.testing.assert_allclose(np.asarray(out), np.asarray(xn @ w),
                                   atol=3e-4, rtol=1e-4)


def test_ln_geglu_matches_and_grads():
    from hcpdiff_tpu.ops.matmul import ln_geglu
    x = jax.random.normal(jax.random.PRNGKey(26), (3, 64, 64))
    g = jnp.ones((64,)) * 1.1
    b = jnp.zeros((64,)) + 0.05
    w = jax.random.normal(jax.random.PRNGKey(27), (64, 2 * 128)) * 0.1
    bb = jax.random.normal(jax.random.PRNGKey(28), (2 * 128,)) * 0.1

    def ref(x, g, b, w, bb):
        y = _ref_ln(x, g, b) @ w.astype(jnp.float32) + bb
        h, gate = jnp.split(y, 2, axis=-1)
        return (h * jax.nn.gelu(gate, approximate=False)).astype(x.dtype)

    with pltpu.force_tpu_interpret_mode():
        out = ln_geglu(x, g, b, w, bb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, g, b, w, bb)),
                               atol=5e-4, rtol=1e-4)

    def loss_pallas(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(ln_geglu(*a) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, g, b, w, bb)
    g2 = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, g, b, w, bb)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-2, rtol=1e-3)


def test_ln_dense_matches():
    from hcpdiff_tpu.ops.matmul import ln_dense
    x = jax.random.normal(jax.random.PRNGKey(30), (4, 64, 96))
    g = jnp.ones((96,)) * 0.9
    b = jnp.zeros((96,)) - 0.02
    w = jax.random.normal(jax.random.PRNGKey(31), (96, 128)) * 0.1
    with pltpu.force_tpu_interpret_mode():
        out = ln_dense(x, g, b, w)
    ref = _ref_ln(x, g, b).astype(x.dtype) @ w
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-4, rtol=1e-4)


def test_unet_pallas_ln_parity(monkeypatch):
    """HCP_PALLAS_LN=1 (+PROJ for the epilogues) must produce the exact
    nn.LayerNorm/nn.Dense param pytree and matching outputs."""
    from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
    cfg = UNetConfig.tiny()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([3, 5])
    c = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 77, cfg.cross_attention_dim))

    monkeypatch.setenv('HCP_PALLAS_PROJ', '0')
    monkeypatch.setenv('HCP_PALLAS_FF', '0')
    monkeypatch.setenv('HCP_PALLAS_LN', '0')
    model = UNet2DCondition(cfg, dtype=jnp.float32)
    p0 = model.init(jax.random.PRNGKey(2), x, t, c)['params']
    o0 = model.apply({'params': p0}, x, t, c)

    monkeypatch.setenv('HCP_PALLAS_LN', '1')
    monkeypatch.setenv('HCP_PALLAS_PROJ', '1')
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


def test_unet_pallas_proj_parity(monkeypatch):
    """HCP_PALLAS_PROJ=1 must produce the exact param pytree and matching
    outputs of the nn.Dense path (exercises the epilogue-residual routing
    in BasicTransformerBlock/Transformer2D too). HCP_PALLAS_FORCE lets the
    routing activate on the CPU backend under interpret mode."""
    from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
    cfg = UNetConfig.tiny()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([3, 5])
    c = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 77, cfg.cross_attention_dim))

    monkeypatch.setenv('HCP_PALLAS_PROJ', '0')
    monkeypatch.setenv('HCP_PALLAS_FF', '0')
    model = UNet2DCondition(cfg, dtype=jnp.float32)
    p0 = model.init(jax.random.PRNGKey(2), x, t, c)['params']
    o0 = model.apply({'params': p0}, x, t, c)

    monkeypatch.setenv('HCP_PALLAS_PROJ', '1')
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
                               atol=3e-4, rtol=1e-4)
