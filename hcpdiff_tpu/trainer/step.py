"""The jitted training step.

One ``train_step(state, frozen, batch, rng) -> (state, metrics)`` compiled
under a data-parallel mesh replaces the reference's whole hot loop
(hcpdiff/train_ac.py:467-521): grad accumulation is a ``lax.scan`` over
microbatches, the two optimizers (model + prompt-embedding, reference
train_ac.py:361-379) are two optax transforms over disjoint subtrees, EMA is
a pytree lerp, grad clipping rides inside the optax chain, and DreamArtist's
dual-branch CFG (hcpdiff/models/cfg_context.py:12-38) is two UNet applies on
the half-batches with branch-specific overlays.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..diffusion.schedules import NoiseSchedule, pyramid_noise
from .assemble import assemble, assemble_te2


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    pack: Any                       # trainable pytrees (see assemble.py)
    opt_state: Any
    opt_state_pt: Any
    ema: Any


def is_pt_key(k: str) -> bool:
    return k.startswith('emb')


def split_pack(pack: Dict[str, Any]) -> Tuple[Dict, Dict]:
    model = {k: v for k, v in pack.items() if not is_pt_key(k)}
    pt = {k: v for k, v in pack.items() if is_pt_key(k)}
    return model, pt


@dataclasses.dataclass
class StepConfig:
    grad_accum: int = 1
    ema_decay: Optional[float] = None   # None -> no EMA; <0 -> power ramp
    ema_power_ramp: bool = True
    max_ema_decay: float = 0.9999
    pred_type_target: str = 'auto'      # 'auto' uses schedule.prediction_type
    noise_kind: str = 'gaussian'        # | 'pyramid'
    pyramid_discount: float = 0.9
    dream_artist: bool = False
    da_cfg_low: float = 1.0
    da_cfg_high: float = 3.0
    da_cfg_ramp: str = 'cos'            # cos | cos2 | ln | linear
    min_timestep: int = 0
    max_timestep: Optional[int] = None


def _da_scale(t: jnp.ndarray, T: int, lo: float, hi: float, ramp: str) -> jnp.ndarray:
    """Dynamic CFG scale ramp over timestep (reference
    hcpdiff/models/cfg_context.py DreamArtistPTContext + utils.py:74-83)."""
    r = t.astype(jnp.float32) / T
    if ramp == 'cos':
        w = (1 - jnp.cos(jnp.pi * r)) / 2
    elif ramp == 'cos2':
        w = (1 - jnp.cos(jnp.pi * r ** 2)) / 2
    elif ramp == 'ln':
        w = jnp.log1p((jnp.e - 1) * r)
    else:
        w = r
    return lo + (hi - lo) * w


def build_train_step(unet_apply: Callable, te_encode: Callable,
                     schedule: NoiseSchedule, criterion,
                     tx: optax.GradientTransformation,
                     tx_pt: Optional[optax.GradientTransformation],
                     cfg: StepConfig,
                     lora_scales: Optional[Dict[str, Dict[str, float]]] = None,
                     controlnet_apply: Optional[Callable] = None,
                     grad_constraint: Optional[Callable] = None):
    """Returns ``train_step(state, frozen, batch, rng)``.

    unet_apply(params, x, t, ctx, **extra) -> eps
    te_encode(te_params, input_ids, token_mult, emb_ext) -> (ctx, pooled)
    batch: {'latents': [B,h,w,4] (already VAE-scaled), 'input_ids': [B,S],
            'token_mult': [B,S]?, 'att_mask': [B,h,w]?, 'loss_weight': []/[B]?,
            'extra_cond': {...}?}
    With grad_accum>1 every batch leaf has a leading [accum] axis.
    grad_constraint: optional pytree->pytree sharding constraint applied to
    the gradients (ZeRO-2: grads live sharded over 'data' so the sharded
    optimizer update never materializes the replicated grad tree —
    reference cfgs/zero2.json gradient partitioning).
    """
    T = schedule.num_train_timesteps
    t_hi = cfg.max_timestep or T

    def forward_loss(pack, frozen, batch, rng):
        latents = batch['latents']
        B = latents.shape[0]
        r_noise, r_t = jax.random.split(rng)
        if cfg.noise_kind == 'pyramid':
            noise = pyramid_noise(r_noise, latents.shape, cfg.pyramid_discount)
        else:
            noise = jax.random.normal(r_noise, latents.shape)
        t = jax.random.randint(r_t, (B,), cfg.min_timestep, t_hi)
        noisy = schedule.add_noise(latents, noise, t)
        target = schedule.target(latents, noise, t)
        extra = batch.get('extra_cond') or {}
        sdxl = 'te2' in frozen

        def encode(te_p, ids, tm, ext, branch='pos'):
            """-> (ctx, pooled); te params packed as a dict when SDXL
            (reference trains through SDXLTEUnetWrapper pooled emb,
            hcpdiff/models/wrapper.py:57-96)."""
            if sdxl:
                te2_p = assemble_te2(frozen['te2'], pack, lora_scales, branch)
                return te_encode({'te': te_p, 'te2': te2_p}, ids, tm, ext)
            return te_encode(te_p, ids, tm, ext)

        def sdxl_cond(extra, pooled, n):
            """Attach pooled emb + crop-info time_ids for the SDXL UNet."""
            tid = batch.get('time_ids')
            if tid is None:
                tid = jnp.zeros((n, 6), jnp.float32)
            return dict(extra, pooled_text_emb=pooled, time_ids=tid)

        if cfg.dream_artist:
            # input_ids laid out [neg..., pos...] (reference collate
            # pair_dataset.py:109-146); latents are the half batch.
            ids_n, ids_p = jnp.split(batch['input_ids'], 2, axis=0)
            tm = batch.get('token_mult')
            tm_n, tm_p = (jnp.split(tm, 2, axis=0) if tm is not None else (None, None))
            up_n, te_n, emb_n = assemble(frozen['unet'], frozen['te'], pack,
                                         lora_scales, branch='neg')
            up_p, te_p, emb_p = assemble(frozen['unet'], frozen['te'], pack,
                                         lora_scales, branch='pos')
            ctx_n, pooled_n = encode(te_n, ids_n, tm_n, emb_n, 'neg')
            ctx_p, pooled_p = encode(te_p, ids_p, tm_p, emb_p, 'pos')
            extra_n = sdxl_cond(extra, pooled_n, B) if sdxl else extra
            extra_p = sdxl_cond(extra, pooled_p, B) if sdxl else extra
            e_n = unet_apply(up_n, noisy, t, ctx_n, **extra_n)
            e_p = unet_apply(up_p, noisy, t, ctx_p, **extra_p)
            scale = _da_scale(t, T, cfg.da_cfg_low, cfg.da_cfg_high, cfg.da_cfg_ramp)
            scale = scale.reshape((-1,) + (1,) * (e_n.ndim - 1))
            pred = e_n + scale * (e_p - e_n)
        else:
            unet_p, te_p, emb_ext = assemble(frozen['unet'], frozen['te'], pack,
                                             lora_scales)
            ctx, pooled = encode(te_p, batch['input_ids'],
                                 batch.get('token_mult'), emb_ext)
            if sdxl:
                extra = sdxl_cond(extra, pooled, B)
            if (controlnet_apply is not None and 'controlnet' in pack
                    and batch.get('cond') is not None):
                down_res, mid_res = controlnet_apply(
                    pack['controlnet'], noisy, t, ctx, batch['cond'])
                extra = dict(extra, down_residuals=down_res,
                             mid_residual=mid_res)
            pred = unet_apply(unet_p, noisy, t, ctx, **extra)

        loss = criterion(pred, target, t)
        if batch.get('att_mask') is not None:
            loss = loss * batch['att_mask'][..., None]
        if batch.get('loss_weight') is not None:
            lw = jnp.asarray(batch['loss_weight'])
            loss = loss * lw.reshape((-1,) + (1,) * (loss.ndim - 1))
        return jnp.mean(loss)

    # one forward pass yields both loss and grads (XLA is not guaranteed to
    # CSE a separate forward + VJP forward into one)
    loss_grad_fn = jax.value_and_grad(forward_loss, argnums=0)

    def train_step(state: TrainState, frozen: Dict[str, Any],
                   batch: Dict[str, jnp.ndarray], rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if cfg.grad_accum > 1:
            def micro(carry, xs):
                g_acc, l_acc = carry
                mb, r = xs
                l, g = loss_grad_fn(state.pack, frozen, mb, r)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                if grad_constraint is not None:
                    # ZeRO-2: the accumulator carry stays sharded between
                    # microbatches (reduce-scatter instead of all-reduce)
                    g_acc = grad_constraint(g_acc)
                return (g_acc, l_acc + l), None

            rngs = jax.random.split(rng, cfg.grad_accum)
            zero = jax.tree_util.tree_map(jnp.zeros_like, state.pack)
            (grads, loss_sum), _ = jax.lax.scan(micro, (zero, 0.0), (batch, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / cfg.grad_accum, grads)
            loss = loss_sum / cfg.grad_accum
        else:
            loss, grads = loss_grad_fn(state.pack, frozen, batch, rng)
        if grad_constraint is not None:
            grads = grad_constraint(grads)

        g_model, g_pt = split_pack(grads)
        p_model, p_pt = split_pack(state.pack)

        new_pack = dict(state.pack)
        opt_state, opt_state_pt = state.opt_state, state.opt_state_pt
        if g_model:
            upd, opt_state = tx.update(g_model, state.opt_state, p_model)
            p_model = optax.apply_updates(p_model, upd)
            new_pack.update(p_model)
        if g_pt and tx_pt is not None:
            upd, opt_state_pt = tx_pt.update(g_pt, state.opt_state_pt, p_pt)
            p_pt = optax.apply_updates(p_pt, upd)
            new_pack.update(p_pt)

        step = state.step + 1
        ema = state.ema
        if ema is not None:
            if cfg.ema_decay is None or cfg.ema_decay < 0 or cfg.ema_power_ramp:
                d = jnp.minimum((1.0 + step) / (10.0 + step), cfg.max_ema_decay)
                if cfg.ema_decay and cfg.ema_decay > 0:
                    d = jnp.minimum(d, cfg.ema_decay)
            else:
                d = jnp.asarray(cfg.ema_decay)
            ema = jax.tree_util.tree_map(lambda e, p: e * d + p * (1 - d),
                                         ema, new_pack)

        metrics = {'loss': loss,
                   'grad_norm': optax.global_norm(grads)}
        return TrainState(step=step, pack=new_pack, opt_state=opt_state,
                          opt_state_pt=opt_state_pt, ema=ema), metrics

    return train_step


def init_train_state(pack: Dict[str, Any], tx: optax.GradientTransformation,
                     tx_pt: Optional[optax.GradientTransformation] = None,
                     use_ema: bool = False) -> TrainState:
    model, pt = split_pack(pack)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        pack=pack,
        opt_state=tx.init(model) if model else (),
        opt_state_pt=(tx_pt.init(pt) if (tx_pt is not None and pt) else ()),
        ema=jax.tree_util.tree_map(jnp.copy, pack) if use_ema else None)
