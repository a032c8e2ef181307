"""Flash attention for TPU (Pallas) — the xFormers stand-in on the UNet/VAE
self-attention hot path (SURVEY.md §2.10 native-inventory row 1).

Online-softmax tiled attention: grid over (batch, heads, q-blocks); the
kernel streams K/V blocks through VMEM with fp32 running (max, sum, acc)
scratch. Forward is Pallas; backward recomputes attention under XLA (exact
same math in fp32) via custom_vjp — correct gradients with zero extra
forward memory; a fused Pallas backward is a later optimization.

Layout: [B, H, S, D] operands are consumed directly — no host-side lane
padding (Mosaic pads sub-128 minor dims inside VMEM tiles) and no
(B*H)-flattening reshape (XLA materialized both as HBM copies costing
~20% of the denoise loop). Block sizes are chosen to divide S exactly
(see _pick_block), so any S works; the dispatcher additionally prefers
S % 128 == 0 so blocks stay tile-aligned.

Softmax defaults (v5e round-4 A/B, BASELINE.md): the kernel is VPU-
bound, so the no-running-max variant (HCP_FLASH_NOMAX, clamp instead of
max-reduce/rescale — see NOMAX_CLAMP) and the MXU-ridden row sum
(HCP_FLASH_MXU_SUM, ones-column on V) are both ON by default:
3.055 -> 3.199 img/s at 512px (+4.7%), 31.74 -> 32.29 samples/s
training. Set either env var to 0 to restore the classic online
softmax.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Swept on v5e at (B8,H8,S4096,D40): 256/256=16.9ms, 512/512=9.2ms,
# 512/1024=6.0ms, 1024/1024=5.8ms (XLA fused attention: 18.7ms).
DEFAULT_BLOCK_Q = int(os.environ.get('HCP_FLASH_BQ', '1024'))
DEFAULT_BLOCK_K = int(os.environ.get('HCP_FLASH_BK', '1024'))
NEG_INF = -1e30
# No-max softmax safety ceiling, in log2 units of the scaled logits
# (exp2 mode). exp2(80) = 1.2e24; a full fp32 row sum over even 10^6 keys
# stays < 1.2e30 and the PV accumulation < ~1e33 — far from fp32
# overflow (3.4e38). Exactness additionally needs the row max above the
# fp32 denormal window (> -100 log2); real attention logits sit within
# +-60 log2 units, so both bounds have orders-of-magnitude margin. The
# clamp only engages on inputs whose softmax is already saturated
# one-hot. exp mode uses the natural-units equivalent (80 * ln 2 ~ 55).
NOMAX_CLAMP = 80.0
NOMAX_CLAMP_NAT = 55.0


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  block_k: int, seq_k: int, scale: float, causal: bool,
                  block_q: int, use_exp2: bool, p_bf16: bool,
                  no_max: bool = False, mxu_sum: bool = False,
                  unroll2: bool = False):
    qi = pl.program_id(2)
    # exp2 softmax: exp(x) = exp2(x * log2 e); the log2 e factor folds into
    # the existing q scale, so the running max/sum run in log2 space for
    # free — one fewer VPU multiply per logit on the exp-bound hot path.
    q_scale = scale * (1.4426950408889634 if use_exp2 else 1.0)
    expf = jnp.exp2 if use_exp2 else jnp.exp
    q = q_ref[0, 0].astype(jnp.float32) * q_scale      # [BQ, D]

    num_k = seq_k // block_k

    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body_no_max(ki, _):
        # No-running-max online softmax (kernel is VPU-bound, not MXU-
        # bound — BASELINE.md round 4): with fp32 accumulators the max
        # subtraction is only an overflow guard, so an upper clamp at
        # NOMAX_CLAMP replaces the max-reduce, broadcast-subtract and
        # accumulator rescale. Exact (softmax is shift-free here) as long
        # as some row score lands above the fp32 underflow window — true
        # by construction for attention logits (see NOMAX_CLAMP note).
        k = k_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if causal:
            q_ids = (qi * block_q
                     + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
            k_ids = (ki * block_k
                     + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        p = expf(jnp.minimum(
            s, NOMAX_CLAMP if use_exp2 else NOMAX_CLAMP_NAT))
        pv_dtype = jnp.bfloat16 if p_bf16 else jnp.float32
        if p_bf16:
            # honor the HCP_FLASH_P_BF16 knob here too (it was silently
            # dead under the no-max default — ADVICE r4 low #3): bf16 p
            # halves the PV operand bytes; row sums still accumulate fp32
            # via preferred_element_type.
            p = p.astype(jnp.bfloat16)
        v = v_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(pv_dtype)
        if mxu_sum:
            # ride the row sum on the MXU: augment V with a ones column
            # (D=40/80 pads to 128 lanes anyway, so the PV matmul cost
            # is unchanged) — acc's last column accumulates l, and the
            # per-element VPU row-sum disappears. acc_ref is [BQ, D+1].
            v = jnp.concatenate(
                [v, jnp.ones((v.shape[0], 1), pv_dtype)], axis=1)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            l_ref[:, 0] = l_ref[:, 0] + jnp.sum(p, axis=1,
                                                dtype=jnp.float32)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return ()

    def body(ki, _):
        k = k_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [BQ, BK]
        if causal:
            q_ids = (qi * block_q
                     + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
            k_ids = (ki * block_k
                     + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        m_prev = m_ref[:, 0]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = expf(m_prev - m_cur)
        if p_bf16:
            # bf16 exp halves VPU transcendental work and feeds the PV
            # matmul with native-bf16 operands; row sums stay fp32
            p = expf((s - m_cur[:, None]).astype(jnp.bfloat16))
            v = v_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.bfloat16)
        else:
            p = expf(s - m_cur[:, None])
            v = v_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(
            p, axis=1, dtype=jnp.float32)
        acc_ref[:] = (acc_ref[:] * alpha[:, None]
                      + jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32))
        m_ref[:, 0] = m_cur
        return ()

    if no_max:
        body = body_no_max

    def _load_kv(ki):
        pv_dtype = jnp.bfloat16 if p_bf16 else jnp.float32
        k = k_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(pv_dtype)
        if mxu_sum:
            v = jnp.concatenate(
                [v, jnp.ones((v.shape[0], 1), pv_dtype)], axis=1)
        return k, v

    def body_no_max_pair(i, _):
        # 2-way unrolled no-max body: block ki+1's QK^T (MXU) is
        # independent of block ki's exp (VPU), so the VLIW scheduler can
        # overlap them — the serial s->exp->PV chain of the 1-block body
        # leaves whichever unit is not the bottleneck idle. Also halves
        # the acc_ref read-modify-writes (one combined add per pair).
        ki = i * 2
        clamp = NOMAX_CLAMP if use_exp2 else NOMAX_CLAMP_NAT
        pv_dtype = jnp.bfloat16 if p_bf16 else jnp.float32
        k0, v0 = _load_kv(ki)
        s0 = jax.lax.dot_general(q, k0, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p0 = expf(jnp.minimum(s0, clamp)).astype(pv_dtype)
        k1, v1 = _load_kv(ki + 1)
        s1 = jax.lax.dot_general(q, k1, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p1 = expf(jnp.minimum(s1, clamp)).astype(pv_dtype)
        pv = (jax.lax.dot_general(p0, v0, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(p1, v1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32))
        if mxu_sum:
            acc_ref[:] = acc_ref[:] + pv
        else:
            l_ref[:, 0] = (l_ref[:, 0]
                           + jnp.sum(p0.astype(jnp.float32), axis=1)
                           + jnp.sum(p1.astype(jnp.float32), axis=1))
            acc_ref[:] = acc_ref[:] + pv
        return ()

    if causal:
        # only blocks with k_start <= q_end contribute
        upper = jnp.minimum(num_k, (qi + 1) * block_q // block_k + 1)
        jax.lax.fori_loop(0, upper, body, ())
    elif no_max and unroll2 and num_k % 2 == 0:
        jax.lax.fori_loop(0, num_k // 2, body_no_max_pair, ())
    else:
        jax.lax.fori_loop(0, num_k, body, ())

    if no_max and mxu_sum:
        acc = acc_ref[:]                      # [BQ, D+1]; last col = l
        # static slices only: a negative jnp index traces to select_n +
        # dynamic_slice, which Mosaic's TPU lowering rejects
        d = acc.shape[1] - 1
        l = jnp.maximum(jax.lax.slice_in_dim(acc, d, d + 1, axis=1)[:, 0],
                        1e-20)
        o_ref[0, 0] = (jax.lax.slice_in_dim(acc, 0, d, axis=1)
                       / l[:, None]).astype(o_ref.dtype)
    else:
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:, 0], 1e-20)[:, None]
                       ).astype(o_ref.dtype)


def _resident_fwd_bytes(block_q: int, block_k: int, seq_k: int, d: int,
                        itemsize: int) -> float:
    """Scoped-VMEM estimate for the K/V-resident forward kernel, calibrated
    against Mosaic's own accounting (15.05M at BQ=BK=1024, Sk=4096 bf16;
    17.67M at Sk=9216 — the 768px OOM). Softmax temporaries scale with
    BQ*BK; K/V residency with Sk (minor dim lane-padded to 128)."""
    lanes = -(-d // 128) * 128
    temps = (11.2e6 * (block_q / 1024) * (block_k / 1024)
             + 1.0e6 * (block_k / 1024) + 0.75e6 * (block_q / 1024))
    return temps * (lanes / 128) + 2 * seq_k * lanes * itemsize

_SCOPED_VMEM_BUDGET = 15.9e6


def _flash_kernel_stream(q_ref, k_ref, v_ref, o_ref, *rest, num_k: int,
                         scale: float, causal: bool, block_q: int,
                         block_k: int, use_exp2: bool, emit_lse: bool,
                         no_max: bool = False, mxu_sum: bool = False):
    """Streaming variant: grid (B, H, q-blocks, k-blocks) with the online
    (max, sum, acc) state carried in scratch across the sequential k grid
    dimension — only ONE [BK, D] K/V block is VMEM-resident at a time, so
    any sequence length fits (the resident kernel caps at Sk ≈ 24k bf16;
    S=9216 at 768px already blew the 16MB scoped limit).

    ``rest`` is (lse_ref?, acc_ref, m_ref, l_ref): the lse output ref exists
    only when emit_lse (no garbage [B,H,Sq,1] copy-out on inference)."""
    if emit_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        acc_ref, m_ref, l_ref = rest
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def _compute():
        q_scale = scale * (1.4426950408889634 if use_exp2 else 1.0)
        expf = jnp.exp2 if use_exp2 else jnp.exp
        q = q_ref[0, 0].astype(jnp.float32) * q_scale       # [BQ, D]
        k = k_ref[0, 0].astype(jnp.float32)                 # [BK, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if causal:
            q_ids = (qi * block_q
                     + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
            k_ids = (ki * block_k
                     + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        v = v_ref[0, 0].astype(jnp.float32)
        if no_max:
            # see _flash_kernel.body_no_max / NOMAX_CLAMP
            p = expf(jnp.minimum(
                s, NOMAX_CLAMP if use_exp2 else NOMAX_CLAMP_NAT))
            if mxu_sum:  # see _flash_kernel: acc's last column carries l
                v = jnp.concatenate(
                    [v, jnp.ones((v.shape[0], 1), jnp.float32)], axis=1)
                acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                l_ref[:, 0] = l_ref[:, 0] + jnp.sum(p, axis=1,
                                                    dtype=jnp.float32)
                acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:
            m_prev = m_ref[:, 0]
            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
            alpha = expf(m_prev - m_cur)
            p = expf(s - m_cur[:, None])
            l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1,
                                                        dtype=jnp.float32)
            acc_ref[:] = (acc_ref[:] * alpha[:, None]
                          + jax.lax.dot_general(
                              p, v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32))
            m_ref[:, 0] = m_cur

    if causal:
        # fully-masked blocks (k block entirely above the diagonal) skip the
        # matmuls; the block's DMA still happens but the MXU/VPU work doesn't
        pl.when(ki * block_k < (qi + 1) * block_q)(_compute)
    else:
        _compute()

    @pl.when(ki == num_k - 1)
    def _finish():
        if no_max and mxu_sum:
            acc = acc_ref[:]                   # [BQ, D+1]; last col = l
            # static slices only (see _flash_kernel): negative jnp indices
            # trace to dynamic_slice, unsupported by Mosaic TPU lowering
            d = acc.shape[1] - 1
            l = jnp.maximum(
                jax.lax.slice_in_dim(acc, d, d + 1, axis=1)[:, 0], 1e-20)
            o_ref[0, 0] = (jax.lax.slice_in_dim(acc, 0, d, axis=1)
                           / l[:, None]).astype(o_ref.dtype)
        else:
            l = jnp.maximum(l_ref[:, 0], 1e-20)
            o_ref[0, 0] = (acc_ref[:] / l[:, None]).astype(o_ref.dtype)
        if emit_lse:
            if no_max:
                # sums were never shifted: l = sum(exp2(s_log2)) =
                # sum(exp(s_nat)), so lse_nat = ln(l) in both exp modes
                lse = jnp.log(l)
            else:
                lse = jnp.log(l) + m_ref[:, 0] * (LN2 if use_exp2 else 1.0)
            lse_ref[0, 0] = lse[:, None]


def _flash_forward_stream(q, k, v, causal, scale, block_q, block_k,
                          emit_lse: bool):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    use_exp2 = os.environ.get('HCP_FLASH_EXP2', '1') == '1'
    no_max = os.environ.get('HCP_FLASH_NOMAX', '1') == '1'
    mxu_sum = no_max and os.environ.get('HCP_FLASH_MXU_SUM', '1') == '1'
    kernel = functools.partial(
        _flash_kernel_stream, num_k=Sk // block_k, scale=scale,
        causal=causal, block_q=block_q, block_k=block_k,
        use_exp2=use_exp2, emit_lse=emit_lse, no_max=no_max,
        mxu_sum=mxu_sum)
    out_specs = [pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype)]
    if emit_lse:
        out_specs.append(pl.BlockSpec((1, 1, block_q, 1),
                                      lambda b, h, i, j: (b, h, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, H, Sq, 1), jnp.float32))
    result = pl.pallas_call(
        kernel,
        grid=(B, H, Sq // block_q, Sk // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, D + 1 if mxu_sum else D), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        # default 16M scoped limit is slightly blown at D=512 (SDXL VAE
        # decode, S=16384: Mosaic wants 17.22M with 1k x 1k blocks —
        # measured on-chip round 4); the k-block dim is the sequential
        # online-softmax carry
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'arbitrary'),
            vmem_limit_bytes=32 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Sk * D,
            bytes_accessed=(B * H * (Sq + 2 * Sk) * D * q.dtype.itemsize),
            transcendentals=B * H * Sq * Sk),
    )(q, k, v)
    return tuple(result) if emit_lse else result[0]


def _flash_kernel_tq(*args, num_k: int, scale: float, causal: bool,
                     block_q: int, block_k: int, use_exp2: bool,
                     p_bf16: bool, emit_lse: bool = False):
    """Transposed-layout forward: defeats MXU lane padding at small head
    dims (VERDICT r4 weak #5 / next #1 — the UNet's D=40/80 heads).

    The classic layout pays the 128-lane pad TWICE per k-block:
      QK^T  [BQ, D] x [D, BK]  — contraction D pads to 128 lanes
      PV    [BQ, BK] x [BK, D] — output D pads to 128 lanes
    The contraction pad is unavoidable (each logit genuinely sums 40
    products; zeros cost the same systolic cycles wherever you pack
    them), but the PV pad is pure layout: computed TRANSPOSED,
      S^T = K   @ Q^T : [BK, D] x [D, BQ]  -> [BK, BQ]
      O^T = V^T @ P^T : [D, BK] x [BK, BQ] -> [D,  BQ]
    the PV's D rides the streamed M dimension, which pads to 8 sublanes
    instead of 128 lanes: padded PV volume drops 128/48 = 2.7x at D=40
    (M = D+1 ones-row, rounded to 8), ~1.45x off the whole-kernel MXU
    floor. The softmax row sum rides row D of the augmented V^T (the
    transposed HCP_FLASH_MXU_SUM trick: l = ones-row @ P^T), and the
    final divide broadcasts a LANE vector across sublanes — cheaper than
    the classic layout's sublane broadcast.

    No-running-max only (see NOMAX_CLAMP — the round-4 default): the
    transposed layout would make a running max a cross-SUBLANE reduce,
    and nomax is what the dispatcher ships anyway. Callers with
    HCP_FLASH_NOMAX=0 stay on the classic kernels.

    Layout contract: q/v arrive pre-transposed as [B, H, D, S] (the
    wrapper swaps axes under XLA, where the relayout fuses with the
    surrounding head split/merge transposes); the kernel emits O^T
    [B, H, D, Sq] and the wrapper swaps back.
    """
    if emit_lse:
        qt_ref, k_ref, vt_ref, ot_ref, lse_ref, acc_ref = args
    else:
        qt_ref, k_ref, vt_ref, ot_ref, acc_ref = args
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_scale = scale * (1.4426950408889634 if use_exp2 else 1.0)
    expf = jnp.exp2 if use_exp2 else jnp.exp
    qt = qt_ref[0, 0].astype(jnp.float32) * q_scale       # [D, BQ]
    k = k_ref[0, 0].astype(jnp.float32)                   # [BK, D]
    st = jax.lax.dot_general(k, qt, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [BK, BQ]
    if causal:
        k_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        q_ids = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
        st = jnp.where(q_ids >= k_ids, st, NEG_INF)
    pt = expf(jnp.minimum(st, NOMAX_CLAMP if use_exp2 else NOMAX_CLAMP_NAT))
    pv_dtype = jnp.bfloat16 if p_bf16 else jnp.float32
    if p_bf16:
        pt = pt.astype(jnp.bfloat16)
    vt = vt_ref[0, 0].astype(pv_dtype)                    # [D, BK]
    # ones ROW -> O^T row D accumulates the softmax denominator l
    v_aug = jnp.concatenate(
        [vt, jnp.ones((1, vt.shape[1]), pv_dtype)], axis=0)  # [D+1, BK]
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        v_aug, pt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [D+1, BQ]

    @pl.when(ki == num_k - 1)
    def _finish():
        acc = acc_ref[:]                                  # [D+1, BQ]
        d = acc.shape[0] - 1
        # static sublane slices (Mosaic rejects dynamic_slice lowerings
        # traced from negative jnp indices — see _flash_kernel)
        l = jnp.maximum(jax.lax.slice_in_dim(acc, d, d + 1, axis=0), 1e-20)
        ot_ref[0, 0] = (jax.lax.slice_in_dim(acc, 0, d, axis=0) / l
                        ).astype(ot_ref.dtype)
        if emit_lse:
            # nomax sums are unshifted natural-exp sums in both exp modes
            # (2^(s*log2e) == e^s), so lse = ln l exactly — the identity
            # _flash_kernel_lse uses for its no_max branch
            lse_ref[0, 0] = jnp.log(l)                    # [1, BQ]


def _flash_forward_tq(q, k, v, causal, scale, block_q, block_k,
                      emit_lse: bool = False):
    """Driver for the transposed-layout kernel (see _flash_kernel_tq).
    ``emit_lse`` adds the natural-log row logsumexp output for the
    training path (the nomax sums are unshifted natural-exp sums in both
    exp modes, so lse = ln l — same identity as _flash_kernel_lse)."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    use_exp2 = os.environ.get('HCP_FLASH_EXP2', '1') == '1'
    p_bf16 = os.environ.get('HCP_FLASH_P_BF16', '0') == '1'
    qt = jnp.swapaxes(q, 2, 3)                            # [B, H, D, Sq]
    vt = jnp.swapaxes(v, 2, 3)                            # [B, H, D, Sk]
    kernel = functools.partial(
        _flash_kernel_tq, num_k=Sk // block_k, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, use_exp2=use_exp2, p_bf16=p_bf16,
        emit_lse=emit_lse)
    out_specs = [pl.BlockSpec((1, 1, D, block_q),
                              lambda b, h, i, j: (b, h, 0, i),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, H, D, Sq), q.dtype)]
    if emit_lse:
        out_specs.append(pl.BlockSpec((1, 1, 1, block_q),
                                      lambda b, h, i, j: (b, h, 0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, H, 1, Sq), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(B, H, Sq // block_q, Sk // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, D, block_q), lambda b, h, i, j: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, block_k), lambda b, h, i, j: (b, h, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if emit_lse else out_specs[0],
        out_shape=out_shape if emit_lse else out_shape[0],
        scratch_shapes=[pltpu.VMEM((D + 1, block_q), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel',
                                 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Sk * D,
            bytes_accessed=(B * H * (Sq + 2 * Sk) * D * q.dtype.itemsize),
            transcendentals=B * H * Sq * Sk),
    )(qt, k, vt)
    if emit_lse:
        ot, lse_t = res
        return jnp.swapaxes(ot, 2, 3), jnp.swapaxes(lse_t, 2, 3)
    return jnp.swapaxes(res, 2, 3)


def _use_tq(D: int, no_max: bool) -> bool:
    """Transposed kernel routing: wins exactly when the head dim pays a
    lane pad the sublane pad avoids — (D+1 rounded to 8) < (D rounded to
    128). Covers the UNet's D=40/80 and SDXL's D=64; the VAE's D=512 is
    already lane-exact and stays on the classic kernels. nomax-only (see
    _flash_kernel_tq).

    Default ON since round 5: on-chip A/B at the 512px headline measured
    3.5611 vs 3.2028 img/s (+11.2%, MFU 0.563 -> 0.626) — the lane-pad
    attack VERDICT r4 next #1 asked for. HCP_FLASH_TQ=0 is the escape
    hatch."""
    if not no_max or os.environ.get('HCP_FLASH_TQ', '1') == '0':
        return False
    return -(-(D + 1) // 8) * 8 < -(-D // 128) * 128


def _pick_block(seq: int, preferred: int) -> int:
    """Largest block <= preferred that divides seq (multiple of 128 when
    possible). ARB buckets produce non-square resolutions whose S is a
    multiple of 128 but not of the preferred 1024 (e.g. 576x640px ->
    S=5760); a non-dividing block would leave the tail q rows unwritten
    and drop tail keys from the softmax."""
    if seq <= preferred:
        return seq
    if seq % preferred == 0:
        return preferred
    for blk in range(preferred - (preferred % 128), 127, -128):
        if seq % blk == 0:
            return blk
    for blk in range(min(preferred, seq), 0, -1):  # seq % 128 != 0 fallback
        if seq % blk == 0:
            return blk
    return seq


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   causal: bool, scale: float,
                   block_q: int = DEFAULT_BLOCK_Q,
                   block_k: int = DEFAULT_BLOCK_K) -> jnp.ndarray:
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    block_q = _pick_block(Sq, block_q)
    block_k = _pick_block(Sk, block_k)
    no_max = os.environ.get('HCP_FLASH_NOMAX', '1') == '1'
    if _use_tq(D, no_max):
        # streams k-blocks through the grid itself — any Sk fits, so it
        # preempts the resident-vs-streaming VMEM routing below
        return _flash_forward_tq(q, k, v, causal, scale, block_q, block_k)
    if (_resident_fwd_bytes(block_q, block_k, Sk, D, q.dtype.itemsize)
            > _SCOPED_VMEM_BUDGET):
        return _flash_forward_stream(q, k, v, causal, scale, block_q,
                                     block_k, emit_lse=False)
    # No host-side lane padding (Mosaic pads sub-128 minor dims inside the
    # VMEM tiles) and no (B,H,S,D)->(B*H,S,D) reshape (XLA materialized it
    # as a copy): the kernel grids directly over (B, H, q-blocks).
    Dp = D
    use_exp2 = os.environ.get('HCP_FLASH_EXP2', '1') == '1'
    p_bf16 = os.environ.get('HCP_FLASH_P_BF16', '0') == '1'
    mxu_sum = no_max and os.environ.get('HCP_FLASH_MXU_SUM', '1') == '1'
    unroll2 = os.environ.get('HCP_FLASH_UNROLL', '0') == '1'

    kernel = functools.partial(_flash_kernel, block_k=block_k, seq_k=Sk,
                               scale=scale, causal=causal, block_q=block_q,
                               use_exp2=use_exp2, p_bf16=p_bf16,
                               no_max=no_max, mxu_sum=mxu_sum,
                               unroll2=unroll2)
    out = pl.pallas_call(
        kernel,
        grid=(B, H, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sk, Dp), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sk, Dp), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, Dp), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, Dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, Dp + 1 if mxu_sum else Dp), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        # the 2-way unrolled body keeps two (s, p) block pairs live; lift
        # the default 16M scoped-VMEM limit so Mosaic can place them
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if unroll2 else None),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Sk * Dp,
            bytes_accessed=(B * H * (Sq + 2 * Sk) * Dp * q.dtype.itemsize),
            transcendentals=B * H * Sq * Sk),
    )(q, k, v)
    return out


LN2 = 0.6931471805599453


def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref,
                      l_ref, *, block_k: int, seq_k: int, scale: float,
                      causal: bool, block_q: int, use_exp2: bool,
                      p_bf16: bool, no_max: bool = False):
    """Forward that also emits the natural-log row logsumexp (for the
    fused Pallas backward)."""
    _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  block_k=block_k, seq_k=seq_k, scale=scale, causal=causal,
                  block_q=block_q, use_exp2=use_exp2, p_bf16=p_bf16,
                  no_max=no_max)
    l = jnp.maximum(l_ref[:, 0], 1e-20)
    if no_max:
        # unshifted sums: l = sum(exp(s_nat)) directly in both exp modes
        lse = jnp.log(l)
    else:
        # exp2 mode tracks the max in log2 units of the scaled logits:
        # sum(exp(s_nat)) = l * 2^m  ->  lse = ln l + m ln 2
        lse = jnp.log(l) + m_ref[:, 0] * (LN2 if use_exp2 else 1.0)
    lse_ref[0, 0] = lse[:, None]


def _flash_forward_lse(q, k, v, causal, scale, block_q=DEFAULT_BLOCK_Q,
                       block_k=DEFAULT_BLOCK_K):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    block_q = _pick_block(Sq, block_q)
    block_k = _pick_block(Sk, block_k)
    no_max = os.environ.get('HCP_FLASH_NOMAX', '1') == '1'
    if _use_tq(D, no_max) and _tq_train():
        # k-blocks stream through the grid — any Sk fits, preempting the
        # residency routing below (same as the inference forward)
        return _flash_forward_tq(q, k, v, causal, scale, block_q, block_k,
                                 emit_lse=True)
    if (_resident_fwd_bytes(block_q, block_k, Sk, D, q.dtype.itemsize)
            > _SCOPED_VMEM_BUDGET):
        return _flash_forward_stream(q, k, v, causal, scale, block_q,
                                     block_k, emit_lse=True)
    use_exp2 = os.environ.get('HCP_FLASH_EXP2', '1') == '1'
    kernel = functools.partial(_flash_kernel_lse, block_k=block_k, seq_k=Sk,
                               scale=scale, causal=causal, block_q=block_q,
                               use_exp2=use_exp2, p_bf16=False,
                               no_max=no_max)
    o, lse = pl.pallas_call(
        kernel,
        grid=(B, H, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sk, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, Sq, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
    )(q, k, v)
    return o, lse


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, acc_ref, *, num_k: int, scale: float,
                         causal: bool, block_q: int, block_k: int,
                         clamp_nat: Optional[float] = None):
    """Streaming dq: grid (B, H, q-blocks, k-blocks), dq accumulated in
    scratch across the sequential k dimension. Only one K/V block is
    VMEM-resident — the earlier fori_loop version kept full K/V (plus
    lane-padded [Sq,1] lse/delta) resident and blew the 16MB scoped VMEM
    at S=9216 (768px)."""
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32)                 # [BQ, D]
    do = do_ref[0, 0].astype(jnp.float32)               # [BQ, D]
    lse = lse_ref[0, 0]                                 # [BQ, 1]
    delta = delta_ref[0, 0]                             # [BQ, 1]
    k = k_ref[0, 0].astype(jnp.float32)                 # [BK, D]
    v = v_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if causal:
        q_ids = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(q_ids >= k_ids, s, NEG_INF)
    if clamp_nat is not None:
        # no-max forward clamped the logits before exp (see NOMAX_CLAMP);
        # backward must recompute p from the SAME clamped logits — with
        # unclamped s, any logit above the clamp makes p here >> forward p
        # and silently explodes gradients (ADVICE r4 medium). The clamp's
        # own gradient is zero where it engages.
        live = s <= clamp_nat
        s = jnp.minimum(s, clamp_nat)
    p = jnp.exp(s - lse)                                 # [BQ, BK]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    if clamp_nat is not None:
        ds = jnp.where(live, ds, 0.0)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ki == num_k - 1)
    def _finish():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, num_q: int,
                          scale: float, causal: bool, block_q: int,
                          block_k: int, clamp_nat: Optional[float] = None):
    """Streaming dk/dv: grid (B, H, k-blocks, q-blocks), accumulators in
    scratch across the sequential q dimension."""
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0, 0].astype(jnp.float32)                 # [BK, D]
    v = v_ref[0, 0].astype(jnp.float32)
    q = q_ref[0, 0].astype(jnp.float32)                 # [BQ, D]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]                                 # [BQ, 1]
    delta = delta_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if causal:
        q_ids = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(q_ids >= k_ids, s, NEG_INF)
    if clamp_nat is not None:
        # match the no-max forward's logit clamp (see _flash_bwd_dq_kernel)
        live = s <= clamp_nat
        s = jnp.minimum(s, clamp_nat)
    p = jnp.exp(s - lse)                                 # [BQ, BK]
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    if clamp_nat is not None:
        ds = jnp.where(live, ds, 0.0)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(qi == num_q - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel_tq(qt_ref, kt_ref, k_ref, v_ref, dot_ref, lse_ref,
                            delta_ref, dqt_ref, acc_ref, *, num_k: int,
                            scale: float, causal: bool, block_q: int,
                            block_k: int, clamp_nat: Optional[float]):
    """Transposed-layout dq (round 5): the classic dq kernel's output
    matmul dS@K pads D to 128 lanes — computed transposed,
      S^T  = K   @ Q^T  : [BK, D] x [D, BQ] -> [BK, BQ]
      dP^T = V   @ dO^T : [BK, D] x [D, BQ] -> [BK, BQ]
      dQ^T = K^T @ dS^T : [D, BK] x [BK, BQ] -> [D, BQ]
    every matmul is classic-mode (contraction lhs-lanes x rhs-sublanes)
    and the only [*, D]-shaped product rides D on the 8-padded sublane
    dim. lse/delta arrive as [1, BQ] LANE vectors — their broadcasts
    across sublanes are cheaper than the classic layout's sublane
    broadcasts. K is read in BOTH layouts (k for S^T, kt for dQ^T): the
    extra stream is ~D*BK bytes/block, noise next to the three
    [BK,BQ]-sized matmuls."""
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qt = qt_ref[0, 0].astype(jnp.float32)                # [D, BQ]
    dot = dot_ref[0, 0].astype(jnp.float32)              # [D, BQ]
    lse_t = lse_ref[0, 0]                                # [1, BQ]
    delta_t = delta_ref[0, 0]                            # [1, BQ]
    k = k_ref[0, 0].astype(jnp.float32)                  # [BK, D]
    v = v_ref[0, 0].astype(jnp.float32)                  # [BK, D]
    st = jax.lax.dot_general(k, qt, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    if causal:
        k_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        q_ids = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
        st = jnp.where(q_ids >= k_ids, st, NEG_INF)
    if clamp_nat is not None:
        live = st <= clamp_nat   # match the no-max forward's clamp
        st = jnp.minimum(st, clamp_nat)
    pt = jnp.exp(st - lse_t)                             # [BK, BQ]
    dpt = jax.lax.dot_general(v, dot, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dst = pt * (dpt - delta_t) * scale
    if clamp_nat is not None:
        dst = jnp.where(live, dst, 0.0)
    kt = kt_ref[0, 0].astype(jnp.float32)                # [D, BK]
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        kt, dst, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [D, BQ]

    @pl.when(ki == num_k - 1)
    def _finish():
        dqt_ref[0, 0] = acc_ref[:].astype(dqt_ref.dtype)


def _flash_bwd_dkv_kernel_tq(qt_ref, k_ref, v_ref, dot_ref, lse_ref,
                             delta_ref, dkt_ref, dvt_ref, dk_acc, dv_acc, *,
                             num_q: int, scale: float, causal: bool,
                             block_q: int, block_k: int,
                             clamp_nat: Optional[float]):
    """Transposed-layout dk/dv (see _flash_bwd_dq_kernel_tq):
      dV^T = dO^T @ P^T^T : [D, BQ] x ([BK, BQ])^T -> [D, BK]
      dK^T = Q^T  @ dS^T^T: [D, BQ] x ([BK, BQ])^T -> [D, BK]
    both use rhs-transposed contraction (lanes x lanes), which Mosaic
    lowers natively via tpu.matmul dimension numbers; the outputs ride
    D on sublanes instead of the classic kernels' 128-lane pad."""
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    qt = qt_ref[0, 0].astype(jnp.float32)                # [D, BQ]
    dot = dot_ref[0, 0].astype(jnp.float32)              # [D, BQ]
    lse_t = lse_ref[0, 0]                                # [1, BQ]
    delta_t = delta_ref[0, 0]                            # [1, BQ]
    k = k_ref[0, 0].astype(jnp.float32)                  # [BK, D]
    v = v_ref[0, 0].astype(jnp.float32)
    st = jax.lax.dot_general(k, qt, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    if causal:
        k_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        q_ids = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
        st = jnp.where(q_ids >= k_ids, st, NEG_INF)
    if clamp_nat is not None:
        live = st <= clamp_nat
        st = jnp.minimum(st, clamp_nat)
    pt = jnp.exp(st - lse_t)                             # [BK, BQ]
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        dot, pt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [D, BK]
    dpt = jax.lax.dot_general(v, dot, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dst = pt * (dpt - delta_t) * scale
    if clamp_nat is not None:
        dst = jnp.where(live, dst, 0.0)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        qt, dst, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [D, BK]

    @pl.when(qi == num_q - 1)
    def _finish():
        dkt_ref[0, 0] = dk_acc[:].astype(dkt_ref.dtype)
        dvt_ref[0, 0] = dv_acc[:].astype(dvt_ref.dtype)


def _tq_train() -> bool:
    """Transposed-layout TRAINING path (lse forward + dq/dk/dv backward)
    gate — separate from the inference-forward default so each is A/B-able
    alone. Default ON since round 5: on-chip bench_train A/B measured
    37.36 vs 32.02 samples/s (+16.7%; kernel-level bwd micro 1.28x at
    S=4096 D=40, neutral at S=1024 D=80 — under remat the transposed
    forward also pays off twice). HCP_FLASH_TQ_TRAIN=0 is the escape
    hatch."""
    return os.environ.get('HCP_FLASH_TQ_TRAIN', '1') != '0'


def _flash_backward_tq(q, k, v, o, lse, g, causal, scale,
                       block_q=None, block_k=None):
    """Transposed-layout backward driver — routed for the same head dims
    as the TQ forward (_use_tq). Residuals stay classic [B,H,S,D]; the
    transposed operand copies are XLA-level swapaxes that fuse with the
    surrounding head split/merge."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    block_q = _pick_block(Sq, block_q or DEFAULT_BWD_BLOCK)
    block_k = _pick_block(Sk, block_k or DEFAULT_BWD_BLOCK)
    if os.environ.get('HCP_FLASH_NOMAX', '1') == '1':
        clamp_nat = (NOMAX_CLAMP * LN2
                     if os.environ.get('HCP_FLASH_EXP2', '1') == '1'
                     else NOMAX_CLAMP_NAT)
    else:
        clamp_nat = None
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)                       # [B,H,Sq,1]
    qt = jnp.swapaxes(q, 2, 3)                           # [B,H,D,Sq]
    kt = jnp.swapaxes(k, 2, 3)                           # [B,H,D,Sk]
    dot = jnp.swapaxes(g, 2, 3)                          # [B,H,D,Sq]
    lse_t = jnp.swapaxes(lse, 2, 3)                      # [B,H,1,Sq]
    delta_t = jnp.swapaxes(delta, 2, 3)

    # grid (B, H, qi, ki)
    qt_by_qi = pl.BlockSpec((1, 1, D, block_q), lambda b, h, i, j: (b, h, 0, i),
                            memory_space=pltpu.VMEM)
    kt_by_ki = pl.BlockSpec((1, 1, D, block_k), lambda b, h, i, j: (b, h, 0, j),
                            memory_space=pltpu.VMEM)
    k_by_ki = pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0),
                           memory_space=pltpu.VMEM)
    r1_by_qi = pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, i),
                            memory_space=pltpu.VMEM)
    # grid (B, H, ki, qi): mirrored assignment
    qt_by_qi2 = pl.BlockSpec((1, 1, D, block_q),
                             lambda b, h, i, j: (b, h, 0, j),
                             memory_space=pltpu.VMEM)
    kt_by_ki2 = pl.BlockSpec((1, 1, D, block_k),
                             lambda b, h, i, j: (b, h, 0, i),
                             memory_space=pltpu.VMEM)
    k_by_ki2 = pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, i, 0),
                            memory_space=pltpu.VMEM)
    r1_by_qi2 = pl.BlockSpec((1, 1, 1, block_q),
                             lambda b, h, i, j: (b, h, 0, j),
                             memory_space=pltpu.VMEM)
    sem = pltpu.CompilerParams(
        dimension_semantics=('parallel', 'parallel', 'parallel', 'arbitrary'))

    dqt = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel_tq, num_k=Sk // block_k,
                          scale=scale, causal=causal, block_q=block_q,
                          block_k=block_k, clamp_nat=clamp_nat),
        grid=(B, H, Sq // block_q, Sk // block_k),
        in_specs=[qt_by_qi, kt_by_ki, k_by_ki, k_by_ki, qt_by_qi,
                  r1_by_qi, r1_by_qi],
        out_specs=qt_by_qi,
        out_shape=jax.ShapeDtypeStruct((B, H, D, Sq), q.dtype),
        scratch_shapes=[pltpu.VMEM((D, block_q), jnp.float32)],
        compiler_params=sem,
    )(qt, kt, k, v, dot, lse_t, delta_t)

    dkt, dvt = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel_tq, num_q=Sq // block_q,
                          scale=scale, causal=causal, block_q=block_q,
                          block_k=block_k, clamp_nat=clamp_nat),
        grid=(B, H, Sk // block_k, Sq // block_q),
        in_specs=[qt_by_qi2, k_by_ki2, k_by_ki2, qt_by_qi2, r1_by_qi2,
                  r1_by_qi2],
        out_specs=[kt_by_ki2, kt_by_ki2],
        out_shape=[jax.ShapeDtypeStruct((B, H, D, Sk), k.dtype),
                   jax.ShapeDtypeStruct((B, H, D, Sk), v.dtype)],
        scratch_shapes=[pltpu.VMEM((D, block_k), jnp.float32),
                        pltpu.VMEM((D, block_k), jnp.float32)],
        compiler_params=sem,
    )(qt, k, v, dot, lse_t, delta_t)
    return (jnp.swapaxes(dqt, 2, 3), jnp.swapaxes(dkt, 2, 3),
            jnp.swapaxes(dvt, 2, 3))


DEFAULT_BWD_BLOCK = int(os.environ.get('HCP_FLASH_BWD_BLOCK', '512'))


def _flash_backward(q, k, v, o, lse, g, causal, scale,
                    block_q=DEFAULT_BWD_BLOCK, block_k=DEFAULT_BWD_BLOCK):
    """Fused Pallas dq/dk/dv with in-kernel recompute — replaces the XLA
    vjp that materialized the full S^2 attention matrix (VERDICT.md weak
    item 2; ~4.3GB/layer at SD1.5 level 0).

    Backward blocks default to 512 (not the forward's 1024): the kernels
    keep four [BQ,BK] fp32 intermediates (s, p, dp, ds) live, and 4x4MB
    blows the 16MB scoped-VMEM limit."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    block_q = _pick_block(Sq, block_q)
    block_k = _pick_block(Sk, block_k)
    # forward/backward must agree on the no-max logit clamp (natural units;
    # the exp2 forward clamps at NOMAX_CLAMP log2 = NOMAX_CLAMP*ln2 natural)
    if os.environ.get('HCP_FLASH_NOMAX', '1') == '1':
        clamp_nat = (NOMAX_CLAMP * LN2
                     if os.environ.get('HCP_FLASH_EXP2', '1') == '1'
                     else NOMAX_CLAMP_NAT)
    else:
        clamp_nat = None
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)                       # [B,H,Sq,1]

    # grid (B, H, qi, ki): q-side operands indexed by qi, K/V by ki
    q_by_qi = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0),
                           memory_space=pltpu.VMEM)
    k_by_ki = pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0),
                           memory_space=pltpu.VMEM)
    q1_by_qi = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0),
                            memory_space=pltpu.VMEM)
    # grid (B, H, ki, qi): the mirrored assignment
    q_by_qi2 = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, j, 0),
                            memory_space=pltpu.VMEM)
    k_by_ki2 = pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, i, 0),
                            memory_space=pltpu.VMEM)
    q1_by_qi2 = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, j, 0),
                             memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, num_k=Sk // block_k,
                          scale=scale, causal=causal, block_q=block_q,
                          block_k=block_k, clamp_nat=clamp_nat),
        grid=(B, H, Sq // block_q, Sk // block_k),
        in_specs=[q_by_qi, k_by_ki, k_by_ki, q_by_qi, q1_by_qi, q1_by_qi],
        out_specs=q_by_qi,
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
    )(q, k, v, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, num_q=Sq // block_q,
                          scale=scale, causal=causal, block_q=block_q,
                          block_k=block_k, clamp_nat=clamp_nat),
        grid=(B, H, Sk // block_k, Sq // block_q),
        in_specs=[q_by_qi2, k_by_ki2, k_by_ki2, q_by_qi2, q1_by_qi2,
                  q1_by_qi2],
        out_specs=[k_by_ki2, k_by_ki2],
        out_shape=[jax.ShapeDtypeStruct((B, H, Sk, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Sk, D), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, D), jnp.float32),
                        pltpu.VMEM((block_k, D), jnp.float32)],
    )(q, k, v, g, lse, delta)
    return dq, dk, dv


def _xla_reference(q, k, v, causal, scale):
    logits = jnp.einsum('bhqd,bhkd->bhqk', q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if causal:
        ql, kl = q.shape[-2], k.shape[-2]
        mask = jnp.tril(jnp.ones((ql, kl), dtype=bool), k=kl - ql)
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', probs,
                      v.astype(jnp.float32)).astype(q.dtype)


@functools.lru_cache(maxsize=32)
def _make_flash(causal: bool, scale: Optional[float]):
    """custom_vjp closure over the static (causal, scale) config —
    nondiff_argnums breaks under jax.remat (flax grad checkpointing), so
    statics are baked into a cached function instead."""

    use_pallas_bwd = os.environ.get('HCP_FLASH_BWD', 'pallas') == 'pallas'

    @jax.custom_vjp
    def fn(q, k, v):
        s = (q.shape[-1] ** -0.5) if scale is None else scale
        return _flash_forward(q, k, v, causal, s)

    def fwd(q, k, v):
        s = (q.shape[-1] ** -0.5) if scale is None else scale
        if use_pallas_bwd:
            o, lse = _flash_forward_lse(q, k, v, causal, s)
            # Name the forward-kernel outputs so a selective remat policy
            # (models/unet.py HCP_REMAT_POLICY=flash ->
            # save_only_these_names('flash_out','flash_lse')) can SAVE them:
            # with o and lse stored, the rematerialized backward jaxpr has no
            # consumer of the forward kernel and DCE elides it — the flash
            # forward then runs once per step instead of twice under
            # whole-block nn.remat. No-op unless such a policy is active.
            from jax.ad_checkpoint import checkpoint_name
            o = checkpoint_name(o, 'flash_out')
            lse = checkpoint_name(lse, 'flash_lse')
            return o, (q, k, v, o, lse)
        return fn(q, k, v), (q, k, v, None, None)

    def bwd(res, g):
        q, k, v, o, lse = res
        s = (q.shape[-1] ** -0.5) if scale is None else scale
        if use_pallas_bwd and o is not None:
            no_max = os.environ.get('HCP_FLASH_NOMAX', '1') == '1'
            if _use_tq(q.shape[-1], no_max) and _tq_train():
                return _flash_backward_tq(q, k, v, o, lse, g, causal, s)
            return _flash_backward(q, k, v, o, lse, g, causal, s)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_reference(q_, k_, v_, causal, s), q, k, v)
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn


def flash_attention(q, k, v, causal: bool = False,
                    scale: Optional[float] = None):
    return _make_flash(bool(causal), scale)(q, k, v)
