"""Pallas 3x3 stride-1 SAME convolution for the UNet/VAE resblocks.

Round-3 traces: XLA's PURE convs hit ~195 TF/s on v5e, but the resblock
convs fuse GroupNorm statistics into their epilogues and the combined
fusions run at ~40 TF/s (~630ms of the 2.5s 512px denoise loop). This
kernel gives the conv its own high-MFU schedule and optionally fuses the
surrounding elementwise work the resblock needs anyway:

- ``row_bias``: per-batch-item bias [B, Cout] — the time-embedding add
  after conv1 (saves that tensor's HBM round-trip).
- ``res``: residual [B, H, W, Cout] added in the epilogue — the resblock
  skip connection after conv2.

Layout trick: with the input padded to [H+2, W+2, C] and flattened to
[(H+2)*(W+2), C], every (dy, dx) tap of the 3x3 window is ONE contiguous
sublane slice ``xp[r0 : r0 + H*(W+2)]`` with ``r0 = dy*(W+2)+dx`` — the
kernel is 9 K-resident [M, Cin] @ [Cin, bn] MXU dots into one fp32
accumulator, no im2col materialization. The 2/(W+2) junk columns are
sliced away in the epilogue store.

Opt-in (HCP_PALLAS_CONV=1 routes the UNet resblocks) until measured on
hardware. Backward recomputes through the XLA reference (custom_vjp).

Reference counterpart: torch/cuDNN convs inside diffusers' ResnetBlock2D
(SURVEY.md §2.10 delegated-native table).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul import _pl_call

_VMEM_BUDGET = 20 * 1024 * 1024
# Mosaic's actual scoped-VMEM stack allocation for this kernel runs ~1.7x
# the _footprint model (measured on-chip round 4: model 20.5M -> Mosaic
# 34.7M at [16,64,64,320] w/ res — epilogue temporaries and input
# double-buffering aren't in the model). Budget 20M * 1.7 ~= 35M peak, so
# a 64M scoped limit leaves real headroom on v5e's 128M VMEM.
_VMEM_LIMIT = 64 * 1024 * 1024


def _conv3_kernel(xp_ref, w_ref, b_ref, *rest, H: int, W: int,
                  use_bias: bool, use_row_bias: bool, use_res: bool):
    """One (batch item, Cout block): 9 contiguous-slice dots + epilogue."""
    idx = 0
    rb_ref = r_ref = None
    if use_row_bias:
        rb_ref = rest[idx]; idx += 1
    if use_res:
        r_ref = rest[idx]; idx += 1
    o_ref = rest[idx]

    Wp = W + 2
    M = H * Wp
    bn = o_ref.shape[-1]
    acc = jnp.zeros((M, bn), jnp.float32)
    for tap in range(9):
        dy, dx = divmod(tap, 3)
        r0 = dy * Wp + dx
        xs = xp_ref[0, pl.dslice(r0, M), :]
        acc += jax.lax.dot_general(xs, w_ref[tap],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    if use_bias:
        acc = acc + b_ref[0].astype(jnp.float32)[None, :]
    if use_row_bias:
        acc = acc + rb_ref[0, 0].astype(jnp.float32)[None, :]
    out = acc.reshape(H, Wp, bn)[:, :W, :]
    if use_res:
        out = out + r_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _conv3_pallas(x, w, b, row_bias, res, bn_pref: int = 512):
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    Wp = W + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(B, (H + 2) * Wp, Cin)
    # the junk-column positions of the last taps (r0 up to 2*Wp+2) read up
    # to 2 flat rows past (H+2)*Wp — pad 8 zero rows (sublane-aligned);
    # those lanes only feed the x>=W columns the epilogue slices away
    xp = jnp.pad(xp, ((0, 0), (0, 8), (0, 0)))
    w9 = w.reshape(9, Cin, Cout)
    use_bias = b is not None
    use_row_bias = row_bias is not None
    use_res = res is not None

    it = x.dtype.itemsize
    # Mosaic lane rule: the Cout block must be a multiple of 128 or the
    # full dimension (bn=160 on Cout=320 fails to lower) — pick the
    # largest LEGAL block <= bn_pref whose footprint fits, else the
    # smallest legal one (the caller's _fits gate guarantees it fits).
    bn = Cout
    for cand in _legal_bns(Cout):
        if cand <= bn_pref and _footprint(H, W, Cin, cand, it,
                                          use_res) <= _VMEM_BUDGET:
            bn = cand
            break
    else:
        bn = _legal_bns(Cout)[-1]

    in_specs = [
        pl.BlockSpec((1, (H + 2) * Wp + 8, Cin), lambda bi, j: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, Cin, bn), lambda bi, j: (0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda bi, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xp, w9, (b if use_bias else jnp.zeros((Cout,), x.dtype)
                         ).reshape(1, Cout)]
    if use_row_bias:
        # [B, 1, Cout] so the block's last-two dims are (1==dim, bn legal)
        in_specs.append(pl.BlockSpec((1, 1, bn), lambda bi, j: (bi, 0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(row_bias.astype(x.dtype)[:, None, :])
    if use_res:
        in_specs.append(pl.BlockSpec((1, H, W, bn),
                                     lambda bi, j: (bi, 0, 0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(res.astype(x.dtype))

    flops = 2 * B * H * W * 9 * Cin * Cout
    out = _pl_call(
        functools.partial(_conv3_kernel, H=H, W=W, use_bias=use_bias,
                          use_row_bias=use_row_bias, use_res=use_res),
        grid=(B, Cout // bn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, W, bn), lambda bi, j: (bi, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel'),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(B * H * W * (Cin + Cout) + 9 * Cin * Cout) * it,
            transcendentals=0),
    )(*operands)
    return out


def _conv3_ref(x, w, b, row_bias, res):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if b is not None:
        out = out + b.astype(jnp.float32)
    if row_bias is not None:
        out = out + row_bias.astype(jnp.float32)[:, None, None, :]
    if res is not None:
        out = out + res.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.lru_cache(maxsize=8)
def _make_conv3(use_bias: bool, use_row_bias: bool, use_res: bool,
                bn_pref: int):
    def _pack(x, w, b, rb, r):
        return _conv3_pallas(x, w, b if use_bias else None,
                             rb if use_row_bias else None,
                             r if use_res else None, bn_pref)

    def _refp(x, w, b, rb, r):
        return _conv3_ref(x, w, b if use_bias else None,
                          rb if use_row_bias else None,
                          r if use_res else None)

    @jax.custom_vjp
    def fn(x, w, b, rb, r):
        return _pack(x, w, b, rb, r)

    def fwd(x, w, b, rb, r):
        return fn(x, w, b, rb, r), (x, w, b, rb, r)

    def bwd(resids, g):
        _, vjp = jax.vjp(_refp, *resids)
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn


@functools.lru_cache(maxsize=32)
def _legal_bns(Cout: int):
    """Cout blocks Mosaic will lower, descending: the full dimension plus
    every 128-multiple divisor (grid needs bn | Cout)."""
    bns = [Cout] + [b for b in range(Cout - Cout % 128, 127, -128)
                    if Cout % b == 0]
    return tuple(sorted(set(bns), reverse=True))


def _footprint(H, W, Cin, bn, itemsize, use_res) -> int:
    """Single source of truth for the per-image-resident VMEM model:
    padded-flat input (+8 tap-overrun rows), 9 weight taps, fp32
    accumulator, double-buffered output (and residual)."""
    Wp = W + 2
    return ((H + 2) * Wp * Cin * itemsize + 8 * Cin * itemsize
            + 9 * Cin * bn * itemsize
            + H * Wp * bn * 4 + 2 * H * W * bn * itemsize
            + (2 * H * W * bn * itemsize if use_res else 0))


def _fits(H, W, Cin, Cout, itemsize, use_res) -> bool:
    """Minimal LEGAL-block footprint of the per-image-resident design —
    oversized shapes (VAE 512x512 decode, SDXL-1024 level 0) and channel
    counts whose only legal block is too large fall back to the XLA conv
    until an H-blocked kernel variant exists."""
    bn_min = _legal_bns(Cout)[-1]
    return _footprint(H, W, Cin, bn_min, itemsize, use_res) <= _VMEM_BUDGET


def _conv3_xla(x, w, b, row_bias, res):
    """XLA fallback in caller dtype (fp32 accumulation like nn.Conv)."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    if row_bias is not None:
        out = out + row_bias.astype(jnp.float32)[:, None, None, :]
    if res is not None:
        out = out + res.astype(jnp.float32)
    return out.astype(x.dtype)


def conv3x3(x: jnp.ndarray, w: jnp.ndarray,
            b: Optional[jnp.ndarray] = None,
            row_bias: Optional[jnp.ndarray] = None,
            res: Optional[jnp.ndarray] = None,
            bn_pref: int = 512) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, NHWC; w: [3, 3, Cin, Cout].

    ``row_bias`` [B, Cout] and ``res`` [B, H, W, Cout] fuse the resblock's
    time-embedding add / skip add into the epilogue. Shapes whose padded
    image does not fit the VMEM-resident design route to the XLA conv."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    if not _fits(H, W, Cin, Cout, x.dtype.itemsize, res is not None):
        return _conv3_xla(x, w.reshape(3, 3, Cin, Cout), b, row_bias, res)
    zb = jnp.zeros((Cout,), x.dtype)
    zrb = jnp.zeros((B, Cout), x.dtype)
    zr = jnp.zeros((B, H, W, Cout), x.dtype)
    fn = _make_conv3(b is not None, row_bias is not None, res is not None,
                     bn_pref)
    return fn(x, w.reshape(3, 3, Cin, Cout),
              b if b is not None else zb,
              row_bias if row_bias is not None else zrb,
              res if res is not None else zr)
