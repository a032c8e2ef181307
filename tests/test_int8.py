"""Dynamic w8a8 int8 matmul routing (HCP_INT8=1, ops/int8.py).

Covers: quantized-matmul accuracy vs exact, straight-through gradients,
and the UNet routing — param-pytree identity with the default path plus
bounded output divergence (int8 is approximate by construction, so the
routing test checks correlation, not allclose).
"""
import jax
import jax.numpy as jnp
import numpy as np

from hcpdiff_tpu.ops.int8 import int8_dense


def test_int8_dense_accuracy():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (64, 96), jnp.float32)
    w = jax.random.normal(k2, (96, 48), jnp.float32) * 0.1
    out = int8_dense(x, w)
    ref = x @ w
    # dynamic per-row/per-channel int8: relative error well under 1%
    denom = float(jnp.mean(jnp.abs(ref))) + 1e-9
    rel = float(jnp.mean(jnp.abs(out - ref))) / denom
    assert rel < 0.01, rel


def test_int8_dense_bias_res_and_lead_dims():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (2, 5, 7, 16), jnp.bfloat16)
    w = jax.random.normal(k2, (16, 24), jnp.float32)
    b = jnp.arange(24, dtype=jnp.float32) * 0.01
    res = jnp.ones((2, 5, 7, 24), jnp.bfloat16)
    out = int8_dense(x, w, b, res=res)
    assert out.shape == (2, 5, 7, 24)
    assert out.dtype == jnp.bfloat16
    ref = x.astype(jnp.float32) @ w + b + 1.0
    denom = float(jnp.mean(jnp.abs(ref))) + 1e-9
    rel = float(jnp.mean(jnp.abs(out.astype(jnp.float32) - ref))) / denom
    assert rel < 0.05, rel


def test_int8_dense_zero_rows_finite():
    # all-zero activation rows must not divide by zero
    x = jnp.zeros((4, 8), jnp.float32)
    w = jnp.ones((8, 3), jnp.float32)
    out = int8_dense(x, w)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_int8_dense_straight_through_grad():
    """custom_vjp passes exact-matmul gradients — non-zero and matching
    the bf16 product (round() alone would zero them out)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (8, 16), jnp.float32)
    w = jax.random.normal(k2, (16, 4), jnp.float32)

    def loss(x, w):
        return jnp.sum(int8_dense(x, w) ** 2)

    dx, dw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert float(jnp.max(jnp.abs(dx))) > 0
    assert float(jnp.max(jnp.abs(dw))) > 0
    # straight-through: d/dw of sum(y^2) = x^T (2y) with y = int8 forward
    y = int8_dense(x, w)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(x.T @ (2 * y)),
                               rtol=1e-4, atol=1e-4)


def test_unet_int8_routing(monkeypatch):
    """HCP_INT8=1 must keep the param pytree byte-identical to the default
    path (checkpoint/LoRA compat) and stay numerically close on a tiny
    UNet (quantization noise, so correlation, not allclose)."""
    from hcpdiff_tpu.models.unet import UNetConfig, UNet2DCondition
    cfg = UNetConfig.tiny()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([3, 5])
    c = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 77, cfg.cross_attention_dim))

    monkeypatch.setenv('HCP_INT8', '0')
    monkeypatch.setenv('HCP_PALLAS_FF', '0')
    model = UNet2DCondition(cfg, dtype=jnp.float32)
    p0 = model.init(jax.random.PRNGKey(2), x, t, c)['params']
    o0 = model.apply({'params': p0}, x, t, c)

    monkeypatch.setenv('HCP_INT8', '1')
    p1 = model.init(jax.random.PRNGKey(2), x, t, c)['params']
    o1 = model.apply({'params': p1}, x, t, c)

    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    a = np.asarray(o0, np.float64).ravel()
    b = np.asarray(o1, np.float64).ravel()
    assert np.all(np.isfinite(b))
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.995, corr
