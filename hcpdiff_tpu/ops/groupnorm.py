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
    import os
    if os.environ.get('HCP_GN_DIRECT', '1') == '1':
        return _gn_silu_xla_direct(x, scale, bias, groups, eps, apply_silu)
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


def _gn_silu_xla_direct(x, scale, bias, groups, eps, apply_silu):
    """GN with fp32-ACCUMULATED reductions reading the bf16 input directly.

    The legacy formulation upcast x to fp32 and reused that buffer for both
    the stats and the normalize — XLA materialized the fp32 copy to HBM
    (~84MB per level-0 activation, the 'convert_reduce' trace bucket). Here
    each fp32 convert has exactly one consumer, so it fuses into the reduce
    / the output elementwise and no fp32 copy is ever written."""
    import os
    B, C = x.shape[0], x.shape[-1]
    orig_shape = x.shape
    if os.environ.get('HCP_GN_BARRIER', '0') == '1':
        # keep the stats reductions OUT of the producer conv's fusion: the
        # conv+stats multi-output fusions run at ~40 TF/s while pure convs
        # hit ~195 TF/s (round-3 trace); the barrier trades an extra
        # bandwidth-bound stats pass for clean conv tiling
        x = jax.lax.optimization_barrier(x)
    xf = x.reshape(B, -1, C)
    n = xf.shape[1] * (C // groups)
    if os.environ.get('HCP_GN_SPATIAL_FIRST', '0') == '1':
        # reduce the spatial axis first (C stays the minor/lane dim — full
        # lanes), then the tiny per-group channel sum; the grouped
        # [B,S,G,C/G] reduce runs its minor dim at C/G=10 lanes
        s1 = jnp.sum(xf, axis=1, dtype=jnp.float32)                  # [B,C]
        s2 = jnp.sum(jax.lax.square(xf.astype(jnp.float32)), axis=1)
        mean_g = s1.reshape(B, groups, C // groups).sum(-1) / n      # [B,G]
        mean2_g = s2.reshape(B, groups, C // groups).sum(-1) / n
        var_g = jnp.maximum(mean2_g - jax.lax.square(mean_g), 0.0)
        inv_g = jax.lax.rsqrt(var_g + eps)
        mean_c = jnp.repeat(mean_g, C // groups, axis=1)[:, None]    # [B,1,C]
        inv_c = jnp.repeat(inv_g, C // groups, axis=1)[:, None]
        y = (xf.astype(jnp.float32) - mean_c) * inv_c * scale + bias
        if apply_silu:
            y = jax.nn.silu(y)
        return y.reshape(orig_shape).astype(x.dtype)
    xg = x.reshape(B, -1, groups, C // groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(jax.lax.square(xg.astype(jnp.float32)),
                     axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean2 - jax.lax.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xn = ((xg.astype(jnp.float32) - mean) * inv).reshape(B, -1, C)
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


# ---------------------------------------------------- streaming variant ----

def _indicator(C: int, groups: int):
    chan = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    return (chan // (C // groups) == grp).astype(jnp.float32)


def _gn_stats_kernel(x_ref, stats_ref, sum_ref, sq_ref, *, groups: int,
                     n_tiles: int, n_per_group: float):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    x = x_ref[0].astype(jnp.float32)                       # [TS, C]
    sum_ref[:] = sum_ref[:] + jnp.sum(x, axis=0, keepdims=True)
    sq_ref[:] = sq_ref[:] + jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(t == n_tiles - 1)
    def _finish():
        C = x.shape[-1]
        M = _indicator(C, groups)
        gsum = jax.lax.dot_general(sum_ref[:], M, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        gsq = jax.lax.dot_general(sq_ref[:], M, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        mean = gsum / n_per_group
        var = gsq / n_per_group - mean * mean
        stats_ref[0, 0] = mean[0]
        stats_ref[0, 1] = var[0]


def _gn_apply_kernel(x_ref, stats_ref, scale_ref, bias_ref, o_ref, *,
                     groups: int, eps: float, apply_silu: bool):
    x = x_ref[0].astype(jnp.float32)                       # [TS, C]
    C = x.shape[-1]
    M = _indicator(C, groups)
    mean_g = stats_ref[0, 0][None]                         # [1, G]
    var_g = stats_ref[0, 1][None]
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jax.lax.dot_general(mean_g, M, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(inv_g, M, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    y = (x - mean_c) * inv_c
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_silu_streaming_raw(x, scale, bias, groups, eps, apply_silu, S, C,
                           tile_s):
    B = x.shape[0]
    orig_shape = x.shape
    xf = x.reshape(B, S, C)
    n_tiles = S // tile_s
    stats = pl.pallas_call(
        functools.partial(_gn_stats_kernel, groups=groups, n_tiles=n_tiles,
                          n_per_group=float(S * (C // groups))),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, tile_s, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, groups), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, groups), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, C), jnp.float32),
                        pltpu.VMEM((1, C), jnp.float32)],
    )(xf)
    out = pl.pallas_call(
        functools.partial(_gn_apply_kernel, groups=groups, eps=eps,
                          apply_silu=apply_silu),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_s, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, groups), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_s, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
    )(xf, stats, scale.reshape(1, C), bias.reshape(1, C))
    return out.reshape(orig_shape)


@functools.lru_cache(maxsize=64)
def _make_gn_streaming(groups, eps, apply_silu, S, C, tile_s):
    @jax.custom_vjp
    def fn(x, scale, bias):
        return _gn_silu_streaming_raw(x, scale, bias, groups, eps, apply_silu,
                                      S, C, tile_s)

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
                    use_pallas: Optional[bool] = None,
                    streaming_tile: int = 512) -> jnp.ndarray:
    """x: [B, H, W, C] (or [B, S, C]); scale/bias: [C].

    Dispatch: single-block Pallas kernel when [S, C] fits VMEM; streaming
    two-pass kernel for larger blocks (any C — lanes pad internally);
    XLA fallback elsewhere."""
    import math
    C = x.shape[-1]
    S = math.prod(x.shape[1:-1]) if x.ndim > 2 else x.shape[1]
    on_tpu = jax.default_backend() == 'tpu'
    if use_pallas is None:
        use_pallas = on_tpu and (C % 128 == 0) and _fits(S, C, x.dtype.itemsize)
        # measured on v5e at (B16, 64x64, C320): streaming 1.34ms vs XLA
        # 1.25ms — XLA's GN fusion already wins there, so the streaming
        # kernel stays opt-in (HCP_GN_STREAMING=1)
        import os
        use_streaming = (os.environ.get('HCP_GN_STREAMING') == '1'
                         and on_tpu and not use_pallas
                         and S % streaming_tile == 0
                         and S >= 2 * streaming_tile)
    else:
        use_streaming = False
    if use_pallas:
        return _make_gn_pallas(groups, float(eps), bool(apply_silu), S, C)(
            x, scale, bias)
    if use_streaming:
        return _make_gn_streaming(groups, float(eps), bool(apply_silu), S, C,
                                  streaming_tile)(x, scale, bias)
    return _gn_silu_xla(x, scale, bias, groups, eps, apply_silu)
