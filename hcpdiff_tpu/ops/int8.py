"""Dynamic w8a8 int8 matmul routing for the UNet's projection/FF GEMMs
(opt-in ``HCP_INT8=1``).

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 peak (393.7 TOPS vs
196.9 TFLOPS), and after round-4/5 the bf16 inference loop sits at
~63% MFU with its biggest buckets (conv ~175 TF/s, projections) already
near the bf16 roofline — int8 is the only lever that raises the ceiling
itself (VERDICT r4 stretch #9). The reference has no quantized
inference path (its compiled-inference story is stable-fast/Triton,
``/root/reference/hcpdiff/viser_fast.py:16-138``); this is a
beyond-reference experiment.

Scheme (standard dynamic w8a8, as in AQT / TensorRT default):
  weights     per-output-channel symmetric: s_w[n] = amax(W[:, n]) / 127
  activations per-row (token) symmetric:    s_x[m] = amax(x[m, :]) / 127
  matmul      int8 x int8 -> int32 on the MXU
  dequant     fp32 (s_x outer s_w) scale + bias + residual epilogue,
              fused by XLA into the matmul consumer

Both quantizations happen inside jit on the traced values: weights are
tiny next to level-0 activations (a [320, 2560] kernel vs a
[65536, 320] activation), so re-quantizing per call costs noise while
keeping the param pytree byte-identical to the bf16 path — checkpoints,
LoRA overlays, and layer selectors see ordinary Dense kernels.

Gradients: a custom_vjp passes straight-through fp gradients (as if the
matmul were exact), so the path is QAT-shaped rather than silently
zero-gradient through ``round``. It is still an *inference* experiment:
training quality under quantization is unmeasured.
"""
import jax
import jax.numpy as jnp

__all__ = ['int8_dense']


def _quant_rows(x2: jnp.ndarray):
    """Per-row symmetric int8: [M, K] -> (int8 [M, K], fp32 [M, 1])."""
    xf = x2.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _quant_cols(w: jnp.ndarray):
    """Per-output-channel symmetric int8: [K, N] -> (int8, fp32 [1, N])."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


@jax.custom_vjp
def _int8_matmul(x2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    xq, sx = _quant_rows(x2)
    wq, sw = _quant_cols(w)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (sx * sw)).astype(x2.dtype)


def _int8_matmul_fwd(x2, w):
    return _int8_matmul(x2, w), (x2, w)


def _int8_matmul_bwd(resid, g):
    # Straight-through: gradients of the exact matmul (quantization is
    # treated as identity), standard for QAT-style estimators.
    x2, w = resid
    gf = g.astype(jnp.float32)
    dx = (gf @ w.astype(jnp.float32).T).astype(x2.dtype)
    dw = (x2.astype(jnp.float32).T @ gf).astype(w.dtype)
    return dx, dw


_int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


def int8_dense(x: jnp.ndarray, w: jnp.ndarray, b=None, res=None):
    """Dense layer through the dynamic w8a8 int8 MXU path.

    x: [..., K] (any float dtype); w: [K, N]; optional bias [N] and
    residual (broadcastable to the output). Returns x.dtype.
    """
    lead = x.shape[:-1]
    out = _int8_matmul(x.reshape(-1, x.shape[-1]), w)
    out = out.reshape(*lead, w.shape[1])
    if b is not None:
        out = out + b.astype(out.dtype)
    if res is not None:
        out = out + res
    return out
