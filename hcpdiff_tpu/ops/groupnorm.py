"""Fused GroupNorm + SiLU Pallas kernel for UNet/VAE resblocks
(BASELINE.json north star: "fused GroupNorm+SiLU conv-resblock kernels").

One VMEM round-trip computes stats, normalizes, applies affine and SiLU —
instead of XLA's normalize-then-activate pipeline that re-reads the
activation from HBM. Dispatcher falls back to the plain XLA path when the
(S, C) block exceeds the VMEM budget or on non-TPU backends.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int,
                    eps: float, apply_silu: bool):
    """Group stats via an indicator matmul (Mosaic dislikes minor-dim
    reshapes): M[c,g] = 1 if channel c belongs to group g; group sums are
    x.sum(0) @ M — 2D ops only, lands on the MXU."""
    x = x_ref[0].astype(jnp.float32)            # [S, C]
    S, C = x.shape
    cg = C // groups
    chan = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    M = (chan // cg == grp).astype(jnp.float32)  # [C, G]

    s1 = jnp.sum(x, axis=0, keepdims=True)       # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)   # [1, C]
    n = float(S * cg)
    gsum = jax.lax.dot_general(s1, M, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)   # [1, G]
    gsq = jax.lax.dot_general(s2, M, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    mean_g = gsum / n
    var_g = gsq / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)           # [1, G]
    # broadcast back to channels: [1, G] @ M^T -> [1, C]
    mean_c = jax.lax.dot_general(mean_g, M, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(inv_g, M, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    y = (x - mean_c) * inv_c
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _fits(S: int, C: int, itemsize: int) -> bool:
    # in + out blocks + ~3 fp32 temporaries (x, x*x, y) live at once
    return S * C * (2 * itemsize + 12) < VMEM_BUDGET_BYTES


def _gn_silu_xla(x, scale, bias, groups, eps, apply_silu):
    B, C = x.shape[0], x.shape[-1]
    orig_shape = x.shape
    xf = x.astype(jnp.float32).reshape(B, -1, groups, C // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(B, -1, C)
    y = xn * scale + bias
    if apply_silu:
        y = jax.nn.silu(y)
    return y.reshape(orig_shape).astype(x.dtype)


def _gn_silu_pallas_raw(x, scale, bias, groups, eps, apply_silu, S, C):
    B = x.shape[0]
    orig_shape = x.shape
    xf = x.reshape(B, S, C)
    kernel = functools.partial(_gn_silu_kernel, groups=groups, eps=eps,
                               apply_silu=apply_silu)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
    )(xf, scale.reshape(1, C), bias.reshape(1, C))
    return out.reshape(orig_shape)


@functools.lru_cache(maxsize=64)
def _make_gn_pallas(groups, eps, apply_silu, S, C):
    """pallas forward + XLA-recompute backward (pallas_call itself has no
    autodiff; training hits this under remat)."""

    @jax.custom_vjp
    def fn(x, scale, bias):
        return _gn_silu_pallas_raw(x, scale, bias, groups, eps, apply_silu, S, C)

    def fwd(x, scale, bias):
        return fn(x, scale, bias), (x, scale, bias)

    def bwd(res, g):
        x, scale, bias = res
        _, vjp = jax.vjp(
            lambda x_, s_, b_: _gn_silu_xla(x_, s_, b_, groups, eps, apply_silu),
            x, scale, bias)
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn


def group_norm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    groups: int = 32, eps: float = 1e-5,
                    apply_silu: bool = True,
                    use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """x: [B, H, W, C] (or [B, S, C]); scale/bias: [C]."""
    import math
    C = x.shape[-1]
    S = math.prod(x.shape[1:-1]) if x.ndim > 2 else x.shape[1]
    if use_pallas is None:
        use_pallas = (jax.default_backend() == 'tpu' and C % 128 == 0
                      and _fits(S, C, x.dtype.itemsize))
    if not use_pallas:
        return _gn_silu_xla(x, scale, bias, groups, eps, apply_silu)
    return _make_gn_pallas(groups, float(eps), bool(apply_silu), S, C)(
        x, scale, bias)
