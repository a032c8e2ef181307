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


def _dense_kernel(x_ref, w_ref, b_ref, o_ref, *, use_bias: bool):
    x = x_ref[...]
    w = w_ref[...]
    acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if use_bias:
        acc = acc + b_ref[0].astype(jnp.float32)[None, :]
    o_ref[...] = acc.astype(o_ref.dtype)


def _matmul_2d(x2, w, b, bm: int, bn: int):
    M, K = x2.shape
    N = w.shape[1]
    bm = _pick(M, bm)
    bn = _pick(N, bn)
    use_bias = b is not None
    if b is None:
        b = jnp.zeros((1, N), x2.dtype)
    else:
        b = b.reshape(1, N)
    return pl.pallas_call(
        functools.partial(_dense_kernel, use_bias=use_bias),
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + K * N + M * N) * x2.dtype.itemsize,
            transcendentals=0),
    )(x2, w, b)


@functools.lru_cache(maxsize=8)
def _make_fused_dense(bm: int, bn: int):
    @jax.custom_vjp
    def fn(x, w, b):
        shape = x.shape
        x2 = x.reshape(-1, shape[-1])
        out = _matmul_2d(x2, w, b, bm, bn)
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


def fused_dense(x: jnp.ndarray, w: jnp.ndarray,
                b: Optional[jnp.ndarray] = None,
                bm: int = DEFAULT_BM, bn: int = DEFAULT_BN) -> jnp.ndarray:
    """[..., K] @ [K, N] (+ bias) via the Pallas tiled GEMM."""
    fn = _make_fused_dense(bm, bn)
    if b is None:
        # bias handled as zeros inside; grads for it are discarded by caller
        b = jnp.zeros((w.shape[1],), x.dtype)
    return fn(x, w, b)


def _geglu_kernel(x_ref, wh_ref, wg_ref, b_ref, o_ref):
    """Out tile = (x@Wh + bh) * gelu(x@Wg + bg); b_ref = [2, BN] (h, g)."""
    x = x_ref[...]
    h = jax.lax.dot_general(x, wh_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    gt = jax.lax.dot_general(x, wg_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h = h + b_ref[0].astype(jnp.float32)[None, :]
    gt = gt + b_ref[1].astype(jnp.float32)[None, :]
    # exact (erf) gelu, matching jax.nn.gelu(approximate=False)
    gelu = gt * 0.5 * (1.0 + jax.lax.erf(gt * 0.7071067811865475))
    o_ref[...] = (h * gelu).astype(o_ref.dtype)


def _geglu_2d(x2, w, b, bm: int, bn: int):
    M, K = x2.shape
    inner = w.shape[1] // 2
    bm = _pick(M, bm)
    bn = _pick(inner, bn)
    b2 = jnp.stack([b[:inner], b[inner:]], axis=0)  # [2, inner]
    nblocks = inner // bn
    return pl.pallas_call(
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
            dimension_semantics=('parallel', 'parallel')),
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
