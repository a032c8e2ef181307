"""Optimizer + LR schedule factories (optax).

Covers the reference surface (hcpdiff/utils/net_utils.py:14-83 scheduler
factory; optimizer-as-class-path via hydra partial, README.md:46): any optax
transform is reachable by `_target_`, plus short names here. The reference's
8-bit bitsandbytes path maps to optax adamw with bf16 state (TPU-friendly).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import optax

from ..config.instantiate import register


def make_schedule(name: str = 'constant', lr: float = 1e-5,
                  warmup_steps: int = 0, training_steps: int = 1000,
                  num_cycles: float = 0.5, power: float = 1.0,
                  min_lr_ratio: float = 0.0, **kw) -> optax.Schedule:
    """diffusers get_scheduler parity + one_cycle
    (reference net_utils.py:30-83)."""
    name = name.lower()
    if name in ('constant',):
        base = optax.constant_schedule(lr)
    elif name in ('constant_with_warmup',):
        base = optax.constant_schedule(lr)
    elif name == 'linear':
        base = optax.linear_schedule(lr, lr * min_lr_ratio,
                                     max(training_steps - warmup_steps, 1))
    elif name == 'cosine':
        base = optax.cosine_decay_schedule(
            lr, max(training_steps - warmup_steps, 1), alpha=min_lr_ratio)
    elif name == 'cosine_with_restarts':
        n = max(int(num_cycles), 1)
        period = max((training_steps - warmup_steps) // n, 1)
        base = optax.join_schedules(
            [optax.cosine_decay_schedule(lr, period, alpha=min_lr_ratio)] * n,
            [period * i for i in range(1, n)])
    elif name == 'polynomial':
        base = optax.polynomial_schedule(lr, lr * min_lr_ratio, power,
                                         max(training_steps - warmup_steps, 1))
    elif name == 'one_cycle':
        base = optax.cosine_onecycle_schedule(training_steps, lr,
                                              pct_start=min(max(
                                                  warmup_steps / max(training_steps, 1),
                                                  0.02), 0.5))
        return base
    else:
        raise ValueError(f'unknown lr schedule: {name}')
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, lr, warmup_steps)
        return optax.join_schedules([warm, base], [warmup_steps])
    return base


def adamw(lr: Any = 1e-5, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 1e-2, **kw) -> optax.GradientTransformation:
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)


def adam(lr: Any = 1e-5, betas=(0.9, 0.999), eps: float = 1e-8, **kw):
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def lion(lr: Any = 1e-6, betas=(0.9, 0.99), weight_decay: float = 0.0, **kw):
    return optax.lion(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)


def sgd(lr: Any = 1e-4, momentum: float = 0.9, **kw):
    return optax.sgd(lr, momentum=momentum)


def adafactor(lr: Any = 1e-5, **kw):
    return optax.adafactor(lr)


def adamw_8bit(lr: Any = 1e-5, betas=(0.9, 0.999), eps: float = 1e-8,
               weight_decay: float = 1e-2, **kw):
    """bitsandbytes-analog: adamw with low-precision (bf16) optimizer state
    to cut HBM, the TPU-native counterpart of 8-bit Adam."""
    import jax.numpy as jnp
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps,
                            mu_dtype=jnp.bfloat16),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(lr))


def dadapt_adamw(lr: Any = 1.0, betas=(0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 0.0, **kw):
    """D-Adaptation AdamW (learning-rate-free; the reference reaches
    dadaptation.DAdaptAdam via hydra class path, README.md:46)."""
    import optax.contrib
    return optax.contrib.dadapt_adamw(lr, betas=tuple(betas), eps=eps,
                                      weight_decay=weight_decay)


def prodigy(lr: Any = 1.0, betas=(0.9, 0.999), eps: float = 1e-8,
            weight_decay: float = 0.0, **kw):
    import optax.contrib
    return optax.contrib.prodigy(lr, betas=tuple(betas), eps=eps,
                                 weight_decay=weight_decay)


OPTIMIZERS: dict = {
    'adamw': adamw, 'adam': adam, 'lion': lion, 'sgd': sgd,
    'adafactor': adafactor, 'adamw_8bit': adamw_8bit,
    'dadapt_adamw': dadapt_adamw, 'prodigy': prodigy,
}

for _n, _f in OPTIMIZERS.items():
    register(f'optim.{_n}', _f)
register('torch.optim.AdamW', adamw)
register('torch.optim.Adam', adam)
register('torch.optim.SGD', sgd)
register('lion_pytorch.Lion', lion)
register('bitsandbytes.optim.AdamW8bit', adamw_8bit)
register('dadaptation.DAdaptAdam', dadapt_adamw)
register('dadaptation.DAdaptAdamW', dadapt_adamw)
register('prodigyopt.Prodigy', prodigy)
register('transformers.optimization.Adafactor', adafactor)


def resolve_optimizer(ocfg) -> tuple:
    """Resolve an optimizer config node {_target_: path, **kwargs} to
    (factory, kwargs) — the hydra-partial-any-class parity path (reference
    train_ac.py:324-379).

    Resolution order: short name in OPTIMIZERS -> registry / import via
    locate() (must be callable). Unknown or unresolvable targets RAISE —
    never a silent adamw fallback (a typo'd class training with default
    betas is exactly the silent-config-bug class). Kwargs pass through to
    the factory verbatim (no whitelist); 'lr' is dropped because group lrs
    drive the schedule (reference param_groups semantics)."""
    from ..config.instantiate import locate
    spec = dict(ocfg or {})
    tgt = spec.pop('_target_', None)
    spec.pop('_partial_', None)
    spec.pop('lr', None)
    if 'betas' in spec:
        spec['betas'] = tuple(spec['betas'])
    if tgt is None:
        return adamw, spec
    t = str(tgt)
    low = t.lower()
    if low in OPTIMIZERS:
        return OPTIMIZERS[low], spec
    tail = low.rsplit('.', 1)[-1]
    if tail in OPTIMIZERS:
        return OPTIMIZERS[tail], spec
    if tail in ('adamw8bit', 'adam8bit'):
        return OPTIMIZERS['adamw_8bit'], spec
    try:
        fn = locate(t)
    except Exception as e:
        raise ValueError(
            f'cannot resolve optimizer _target_ {t!r}: {e}. Use an optax '
            'factory path (fn(lr=..., **kw) -> GradientTransformation), a '
            'short name ' + str(sorted(OPTIMIZERS)) + ', or a registered '
            'torch-class alias.') from e
    if not callable(fn):
        raise ValueError(f'optimizer _target_ {t!r} resolved to '
                         f'non-callable {type(fn).__name__}')
    return fn, spec


def make_optimizer(name_or_fn='adamw', lr=1e-5, clip_norm: Optional[float] = None,
                   schedule: Optional[optax.Schedule] = None,
                   **kw) -> optax.GradientTransformation:
    fn = OPTIMIZERS[name_or_fn] if isinstance(name_or_fn, str) else name_or_fn
    # positional lr: our factories take (lr, ...), raw optax factories take
    # (learning_rate, ...) — positional reaches both
    tx = fn(schedule if schedule is not None else lr, **kw)
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx
