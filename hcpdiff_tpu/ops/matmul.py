"""Pallas fused projection GEMMs for the UNet transformer blocks.

Round-2 traces put the transformer projections (proj_in/proj_out, GEGLU
ff.proj/ff.out, attn to_out) at ~16-19% MFU inside XLA's `fusion` /
`convolution_add` ops — ~1.0s of the 2.57s 512px denoise loop
(ROUND_NOTES.md late-round-2). These kernels attack that bucket:

- ``fused_dense``: tiled [M,K]x[K,N] matmul + bias, fp32 accumulation,
  K-resident blocks (K <= 1280 for every SD projection).
- ``geglu_dense``: the GEGLU front half ``h * gelu(gate)`` computed INSIDE
  the GEMM epilogue — the [B,S,2*inner] intermediate (335MB bf16 at SD1.5
  level 0) never exists in HBM: two K-resident matmuls per output tile,
  combine in VMEM, write [B,S,inner] once.

Backward passes route through XLA einsums via custom_vjp (same math,
fp32 accumulation) — the projections' backward already ran at acceptable
MFU in training; these kernels are an inference-path optimization first.

Reference counterpart: torch/cuBLAS linear layers inside diffusers'
BasicTransformerBlock (SURVEY.md §2.10 delegated-native table).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BM = int(os.environ.get('HCP_PROJ_BM', '512'))


def _pl_call(*args, **kw):
    """pallas_call that self-selects interpret mode off-TPU, so the CPU
    test suite exercises these kernels under any transform (value_and_grad,
    remat, scan) without needing the force_tpu_interpret_mode context to
    be active at lowering time."""
    import jax as _jax
    kw.setdefault('interpret', _jax.default_backend() != 'tpu')
    return pl.pallas_call(*args, **kw)

DEFAULT_BN = int(os.environ.get('HCP_PROJ_BN', '512'))


def _pick(m: int, pref: int, quantum: int = 128) -> int:
    """Largest block <= pref dividing m (prefer multiples of quantum)."""
    if m <= pref:
        return m
    if m % pref == 0:
        return pref
    for b in range(pref - pref % quantum, quantum - 1, -quantum):
        if m % b == 0:
            return b
    for b in range(min(pref, m), 0, -1):
        if m % b == 0:
            return b
    return m


DEFAULT_BK = int(os.environ.get('HCP_PROJ_BK', '1280'))


def _dense_kernel_kres(x_ref, w_ref, b_ref, *rest, use_bias: bool,
                       use_res: bool):
    """K-resident GEMM tile: one dot straight to the output block (every
    SD1.5/SDXL projection except ff.out has K <= 1280 — no accumulator
    round-trip needed). With ``use_res`` the residual tile is added in the
    epilogue — Pallas calls are opaque to XLA fusion, so a separate
    ``x + proj(x)`` add would cost a full extra HBM read+write of the
    activation (the round-2 trace showed ~358ms of bare residual adds)."""
    if use_res:
        r_ref, o_ref = rest
    else:
        o_ref, = rest
    acc = jax.lax.dot_general(x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if use_bias:
        acc = acc + b_ref[0].astype(jnp.float32)[None, :]
    if use_res:
        acc = acc + r_ref[...].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _dense_kernel_kstream(x_ref, w_ref, b_ref, *rest, num_k: int,
                          use_bias: bool, use_res: bool):
    """K-streaming GEMM: grid (M, N, K) with the fp32 accumulator in
    scratch across the sequential K dimension (ff.out at the C=1280 UNet
    levels has K=5120 — a K-resident [BM,K] x block blows the 16MB scoped
    VMEM)."""
    if use_res:
        r_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == num_k - 1)
    def _finish():
        acc = acc_ref[...]
        if use_bias:
            acc = acc + b_ref[0].astype(jnp.float32)[None, :]
        if use_res:
            acc = acc + r_ref[...].astype(jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)


_VMEM_BUDGET = 15 * 1024 * 1024  # block-model budget for auto-tile picks
# raised scoped-VMEM ceiling for the pallas_calls: Mosaic's double-buffering
# decisions vary with grid size (a config that fits at grid (32,1) can blow
# the default 16MB at grid (2,1)), so give the compiler real headroom
_VMEM_LIMIT = 32 * 1024 * 1024


def _kres_bytes(bm, bn, K, itemsize, use_res: bool = False):
    """K-resident VMEM model: grid (i, j) iterates j innermost, so the
    x block (index (i, 0)) is single-buffered while w/out double-buffer.
    The optional residual input adds another double-buffered [bm, bn]."""
    return (bm * K + 2 * K * bn + bn
            + (4 if use_res else 2) * bm * bn) * itemsize


def _auto_dense_blocks(M, K, N, itemsize, use_res: bool = False):
    """Measured on v5e (tools_dev/tune_proj.py, trace-timed): K-resident
    with the largest fitting bm wins for K <= 2560 (l0 ff.out 0.341ms vs
    XLA-in-loop 1.4ms); K=5120 prefers bk=1280 streaming at bm1024."""
    for bm in (2048, 1024, 512):
        if _kres_bytes(min(bm, M), N if N <= 512 else 512, K,
                       itemsize, use_res) <= _VMEM_BUDGET:
            return bm, K
    return 1024, 1280


def _matmul_2d(x2, w, b, bm: int, bn: int, bk: int = 0, res=None):
    M, K = x2.shape
    N = w.shape[1]
    use_res_blocks = res is not None
    if bm == DEFAULT_BM and not bk:
        bm, bk = _auto_dense_blocks(M, K, N, x2.dtype.itemsize,
                                    use_res_blocks)
    bm = _pick(M, bm)
    bn = _pick(N, bn)
    bk = _pick(K, bk or DEFAULT_BK)
    # safety net: shrink bm until the block residency model fits scoped VMEM
    while bm > 128 and _kres_bytes(bm, bn, min(bk, K), x2.dtype.itemsize,
                                   use_res_blocks) > _VMEM_BUDGET:
        bm = _pick(M, bm // 2)
    use_bias = b is not None
    if b is None:
        b = jnp.zeros((1, N), x2.dtype)
    else:
        b = b.reshape(1, N)
    use_res = res is not None
    operands = [x2, w, b] + ([res] if use_res else [])
    io_bytes = (M * K + K * N + (1 + use_res) * M * N) * x2.dtype.itemsize
    if bk >= K:
        res_specs = [pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM)] if use_res else []
        return _pl_call(
            functools.partial(_dense_kernel_kres, use_bias=use_bias,
                              use_res=use_res),
            grid=(M // bm, N // bn),
            in_specs=[
                pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ] + res_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('parallel', 'parallel'),
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=io_bytes,
                transcendentals=0),
        )(*operands)
    res_specs = [pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                              memory_space=pltpu.VMEM)] if use_res else []
    return _pl_call(
        functools.partial(_dense_kernel_kstream, num_k=K // bk,
                          use_bias=use_bias, use_res=use_res),
        grid=(M // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ] + res_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary'),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=io_bytes,
            transcendentals=0),
    )(*operands)


@functools.lru_cache(maxsize=16)
def _make_fused_dense(bm: int, bn: int, bk: int = 0):
    @jax.custom_vjp
    def fn(x, w, b):
        shape = x.shape
        x2 = x.reshape(-1, shape[-1])
        out = _matmul_2d(x2, w, b, bm, bn, bk)
        return out.reshape(shape[:-1] + (w.shape[1],))

    def fwd(x, w, b):
        return fn(x, w, b), (x, w)

    def bwd(res, g):
        x, w = res
        x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        g2 = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
        dx = (g2 @ w.astype(jnp.float32).T).reshape(x.shape).astype(x.dtype)
        dw = (x2.T @ g2).astype(w.dtype)
        db = jnp.sum(g2, axis=0).astype(w.dtype)
        return dx, dw, db

    fn.defvjp(fwd, bwd)
    return fn


@functools.lru_cache(maxsize=16)
def _make_fused_dense_res(bm: int, bn: int, bk: int = 0):
    """fused_dense variant with a residual added in the GEMM epilogue
    (out = x@w + b + res). Residual grad is the pass-through cotangent."""
    @jax.custom_vjp
    def fn(x, w, b, r):
        shape = x.shape
        x2 = x.reshape(-1, shape[-1])
        out = _matmul_2d(x2, w, b, bm, bn, bk,
                         res=r.reshape(-1, r.shape[-1]))
        return out.reshape(shape[:-1] + (w.shape[1],))

    def fwd(x, w, b, r):
        return fn(x, w, b, r), (x, w)

    def bwd(res, g):
        x, w = res
        x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        g2 = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
        dx = (g2 @ w.astype(jnp.float32).T).reshape(x.shape).astype(x.dtype)
        dw = (x2.T @ g2).astype(w.dtype)
        db = jnp.sum(g2, axis=0).astype(w.dtype)
        return dx, dw, db, g

    fn.defvjp(fwd, bwd)
    return fn


def fused_dense(x: jnp.ndarray, w: jnp.ndarray,
                b: Optional[jnp.ndarray] = None,
                bm: int = DEFAULT_BM, bn: int = DEFAULT_BN,
                bk: int = 0, res: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[..., K] @ [K, N] (+ bias) (+ residual) via the Pallas tiled GEMM.

    ``res`` (same shape as the output) is added inside the kernel epilogue;
    use it for the transformer residual connections so the add never costs
    a separate HBM round-trip over the Pallas-call fusion boundary."""
    if b is None:
        # bias handled as zeros inside; grads for it are discarded by caller
        b = jnp.zeros((w.shape[1],), x.dtype)
    if res is not None:
        return _make_fused_dense_res(bm, bn, bk)(x, w, b,
                                                 res.astype(x.dtype))
    return _make_fused_dense(bm, bn, bk)(x, w, b)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| < 1.5e-7 — far below
    bf16 resolution). Pallas TPU has no erf lowering; only exp is needed."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _geglu_kernel(x_ref, wh_ref, wg_ref, b_ref, o_ref):
    """Out tile = (x@Wh + bh) * gelu(x@Wg + bg); b_ref = [2, BN] (h, g)."""
    x = x_ref[...]
    h = jax.lax.dot_general(x, wh_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    gt = jax.lax.dot_general(x, wg_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h = h + b_ref[0].astype(jnp.float32)[None, :]
    gt = gt + b_ref[1].astype(jnp.float32)[None, :]
    # exact-form (erf) gelu, matching jax.nn.gelu(approximate=False)
    gelu = gt * 0.5 * (1.0 + _erf(gt * 0.7071067811865475))
    o_ref[...] = (h * gelu).astype(o_ref.dtype)


def _geglu_2d(x2, w, b, bm: int, bn: int):
    M, K = x2.shape
    inner = w.shape[1] // 2
    if bm == DEFAULT_BM and bn == DEFAULT_BN:
        # measured on v5e (tools_dev/tune_proj.py): bm1024 with the full
        # inner as one column block wins at K=320 (x re-reads dominate);
        # narrower bn at the deeper levels where the two w blocks are big
        bm, bn = 1024, (inner if inner <= 1280 else 512)
    bm = _pick(M, bm)
    bn = _pick(inner, bn)
    def _gbytes(bm, bn):
        # x single-buffered (constant along the inner j dim), wh/wg/out double
        return (bm * K + 4 * K * bn + 2 * bm * bn) * x2.dtype.itemsize
    while bn > 256 and _gbytes(bm, bn) > _VMEM_BUDGET:
        bn = _pick(inner, bn // 2)
    while bm > 128 and _gbytes(bm, bn) > _VMEM_BUDGET:
        bm = _pick(M, bm // 2)
    b2 = jnp.stack([b[:inner], b[inner:]], axis=0)  # [2, inner]
    nblocks = inner // bn
    return _pl_call(
        _geglu_kernel,
        grid=(M // bm, nblocks),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j, nb=nblocks: (0, j + nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, inner), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel'),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * M * inner * K,
            bytes_accessed=(M * K + 2 * K * inner + M * inner)
            * x2.dtype.itemsize,
            transcendentals=M * inner),
    )(x2, w, w, b2)


@functools.lru_cache(maxsize=8)
def _make_geglu_dense(bm: int, bn: int):
    @jax.custom_vjp
    def fn(x, w, b):
        shape = x.shape
        out = _geglu_2d(x.reshape(-1, shape[-1]), w, b, bm, bn)
        return out.reshape(shape[:-1] + (w.shape[1] // 2,))

    def _ref(x, w, b):
        y = jnp.einsum('...k,kn->...n', x.astype(jnp.float32),
                       w.astype(jnp.float32)) + b.astype(jnp.float32)
        h, gate = jnp.split(y, 2, axis=-1)
        return (h * jax.nn.gelu(gate, approximate=False)).astype(x.dtype)

    def fwd(x, w, b):
        return fn(x, w, b), (x, w, b)

    def bwd(res, g):
        x, w, b = res
        _, vjp = jax.vjp(_ref, x, w, b)
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn


def geglu_dense(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                bm: int = DEFAULT_BM, bn: int = DEFAULT_BN) -> jnp.ndarray:
    """GEGLU front half: ``h * gelu(gate)`` with ``[h|gate] = x@w + b``,
    fused so the doubled intermediate never leaves VMEM. w: [K, 2*inner],
    b: [2*inner]; returns [..., inner]."""
    return _make_geglu_dense(bm, bn)(x, w, b)


# ------------------------------------------------- LayerNorm-fused GEMMs ----
# The transformer sublayers each do LayerNorm(x) -> projection(s). Fusing
# the LN into the GEMM prologue saves (a) the LN output's HBM round-trip
# (~80MB per level-0 block) and (b) for self-attention, reading the
# normalized tile once instead of three times for q/k/v. Three separate
# output buffers avoid the strided-split copies that made the round-2
# fused-QKV (one [.., 3C] matmul) SLOWER (ROUND2_NOTES late experiments).


def _ln_rows(x, g, b, eps):
    """Row LayerNorm of a [bm, K] fp32 tile; g/b: [1, K]."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * g + b


def _ln_qkv_kernel(x_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref,
                   q_ref, k_ref, v_ref, *, eps: float):
    xn = _ln_rows(x_ref[...].astype(jnp.float32),
                  g_ref[0].astype(jnp.float32)[None, :],
                  b_ref[0].astype(jnp.float32)[None, :], eps)
    xn = xn.astype(x_ref.dtype)
    for w_ref, o_ref in ((wq_ref, q_ref), (wk_ref, k_ref), (wv_ref, v_ref)):
        acc = jax.lax.dot_general(xn, w_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)


def _ln_qkv_2d(x2, g, b, wq, wk, wv, eps, bm):
    M, K = x2.shape
    N = wq.shape[1]
    bm = _pick(M, bm)
    it = x2.dtype.itemsize
    # x + 3 w (K-resident) + 3 out blocks, double-buffered x/outs
    while bm > 128 and (2 * bm * K + 3 * K * N + 6 * bm * N) * it \
            > _VMEM_BUDGET:
        bm = _pick(M, bm // 2)
    spec_w = pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bm, N), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((M, N), x2.dtype)
    return _pl_call(
        functools.partial(_ln_qkv_kernel, eps=eps),
        grid=(M // bm,),
        in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  spec_v, spec_v, spec_w, spec_w, spec_w],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[shape, shape, shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * M * N * K,
            bytes_accessed=(M * K + 3 * K * N + 3 * M * N) * it,
            transcendentals=0),
    )(x2, g.reshape(1, K), b.reshape(1, K), wq, wk, wv)


@functools.lru_cache(maxsize=8)
def _make_ln_qkv(eps: float, bm: int):
    def _ref(x, g, b, wq, wk, wv):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xn = (xc * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)
              + b.astype(jnp.float32)).astype(x.dtype)
        f32 = jnp.float32
        return tuple((xn.astype(f32) @ w.astype(f32)).astype(x.dtype)
                     for w in (wq, wk, wv))

    @jax.custom_vjp
    def fn(x, g, b, wq, wk, wv):
        shape = x.shape
        x2 = x.reshape(-1, shape[-1])
        q, k, v = _ln_qkv_2d(x2, g, b, wq, wk, wv, eps, bm)
        out_shape = shape[:-1] + (wq.shape[1],)
        return (q.reshape(out_shape), k.reshape(out_shape),
                v.reshape(out_shape))

    def fwd(x, g, b, wq, wk, wv):
        return fn(x, g, b, wq, wk, wv), (x, g, b, wq, wk, wv)

    def bwd(res, cot):
        _, vjp = jax.vjp(_ref, *res)
        return vjp(cot)

    fn.defvjp(fwd, bwd)
    return fn


def ln_qkv(x: jnp.ndarray, ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
           wq: jnp.ndarray, wk: jnp.ndarray, wv: jnp.ndarray,
           eps: float = 1e-5, bm: int = 1024):
    """LayerNorm + three bias-free projections of the SAME normalized
    tile (self-attention q/k/v), one x read, three output buffers."""
    return _make_ln_qkv(float(eps), bm)(x, ln_scale, ln_bias, wq, wk, wv)


def _ln_geglu_kernel(x_ref, g_ref, b_ref, wh_ref, wg_ref, bb_ref, o_ref, *,
                     eps: float):
    xn = _ln_rows(x_ref[...].astype(jnp.float32),
                  g_ref[0].astype(jnp.float32)[None, :],
                  b_ref[0].astype(jnp.float32)[None, :], eps)
    xn = xn.astype(x_ref.dtype)
    h = jax.lax.dot_general(xn, wh_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    gt = jax.lax.dot_general(xn, wg_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h = h + bb_ref[0].astype(jnp.float32)[None, :]
    gt = gt + bb_ref[1].astype(jnp.float32)[None, :]
    gelu = gt * 0.5 * (1.0 + _erf(gt * 0.7071067811865475))
    o_ref[...] = (h * gelu).astype(o_ref.dtype)


def _ln_geglu_2d(x2, g, b, w, bb, eps, bm, bn):
    M, K = x2.shape
    inner = w.shape[1] // 2
    if bm == DEFAULT_BM and bn == DEFAULT_BN:
        bm, bn = 1024, (inner if inner <= 1280 else 512)
    bm = _pick(M, bm)
    bn = _pick(inner, bn)
    it = x2.dtype.itemsize

    def _bytes(bm, bn):
        return (bm * K + 4 * K * bn + 2 * bm * bn) * it

    while bn > 256 and _bytes(bm, bn) > _VMEM_BUDGET:
        bn = _pick(inner, bn // 2)
    while bm > 128 and _bytes(bm, bn) > _VMEM_BUDGET:
        bm = _pick(M, bm // 2)
    b2 = jnp.stack([bb[:inner], bb[inner:]], axis=0)
    nblocks = inner // bn
    spec_v = pl.BlockSpec((1, K), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    return _pl_call(
        functools.partial(_ln_geglu_kernel, eps=eps),
        grid=(M // bm, nblocks),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            spec_v, spec_v,
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j, nb=nblocks: (0, j + nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, inner), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel'),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * M * inner * K,
            bytes_accessed=(M * K + 2 * K * inner + M * inner) * it,
            transcendentals=M * inner),
    )(x2, g.reshape(1, K), b.reshape(1, K), w, w, b2)


@functools.lru_cache(maxsize=8)
def _make_ln_geglu(eps: float, bm: int, bn: int):
    def _ref(x, g, b, w, bb):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xn = xc * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32) \
            + b.astype(jnp.float32)
        y = xn @ w.astype(jnp.float32) + bb.astype(jnp.float32)
        h, gate = jnp.split(y, 2, axis=-1)
        return (h * jax.nn.gelu(gate, approximate=False)).astype(x.dtype)

    @jax.custom_vjp
    def fn(x, g, b, w, bb):
        shape = x.shape
        out = _ln_geglu_2d(x.reshape(-1, shape[-1]), g, b, w, bb, eps,
                           bm, bn)
        return out.reshape(shape[:-1] + (w.shape[1] // 2,))

    def fwd(x, g, b, w, bb):
        return fn(x, g, b, w, bb), (x, g, b, w, bb)

    def bwd(res, cot):
        _, vjp = jax.vjp(_ref, *res)
        return vjp(cot)

    fn.defvjp(fwd, bwd)
    return fn


def ln_geglu(x: jnp.ndarray, ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
             w: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-5,
             bm: int = DEFAULT_BM, bn: int = DEFAULT_BN) -> jnp.ndarray:
    """LayerNorm + GEGLU front half in one kernel (ff.norm3 + ff.proj +
    h*gelu(gate)): neither the normalized x nor the [.., 2*inner]
    intermediate ever reaches HBM."""
    return _make_ln_geglu(float(eps), bm, bn)(x, ln_scale, ln_bias, w, b)


def _ln_dense_kernel(x_ref, g_ref, b_ref, w_ref, o_ref, *, eps: float):
    xn = _ln_rows(x_ref[...].astype(jnp.float32),
                  g_ref[0].astype(jnp.float32)[None, :],
                  b_ref[0].astype(jnp.float32)[None, :], eps)
    acc = jax.lax.dot_general(xn.astype(x_ref.dtype), w_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.lru_cache(maxsize=8)
def _make_ln_dense(eps: float, bm: int):
    def _ref(x, g, b, w):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xn = (xc * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)
              + b.astype(jnp.float32)).astype(x.dtype)
        return (xn.astype(jnp.float32) @ w.astype(jnp.float32)).astype(x.dtype)

    @jax.custom_vjp
    def fn(x, g, b, w):
        shape = x.shape
        x2 = x.reshape(-1, shape[-1])
        M, K = x2.shape
        N = w.shape[1]
        bm_ = _pick(M, bm)
        it = x2.dtype.itemsize
        while bm_ > 128 and (2 * bm_ * K + K * N + 2 * bm_ * N) * it \
                > _VMEM_BUDGET:
            bm_ = _pick(M, bm_ // 2)
        out = _pl_call(
            functools.partial(_ln_dense_kernel, eps=eps),
            grid=(M // bm_,),
            in_specs=[
                pl.BlockSpec((bm_, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm_, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('parallel',),
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=(M * K + K * N + M * N) * it,
                transcendentals=0),
        )(x2, g.reshape(1, K), b.reshape(1, K), w)
        return out.reshape(shape[:-1] + (N,))

    def fwd(x, g, b, w):
        return fn(x, g, b, w), (x, g, b, w)

    def bwd(res, cot):
        _, vjp = jax.vjp(_ref, *res)
        return vjp(cot)

    fn.defvjp(fwd, bwd)
    return fn


def ln_dense(x: jnp.ndarray, ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
             w: jnp.ndarray, eps: float = 1e-5, bm: int = 1024) -> jnp.ndarray:
    """LayerNorm + one bias-free projection (cross-attention to_q)."""
    return _make_ln_dense(float(eps), bm)(x, ln_scale, ln_bias, w)
