"""Ahead-of-time warmup — the stable-fast/viser_fast analog
(reference hcpdiff/viser_fast.py:16-138).

jit compilation already gives compiled inference; this helper eagerly
compiles the denoise loops for a list of (resolution, steps, sampler)
settings so the first user request pays no compile latency, and primes the
persistent compilation cache (JAX_COMPILATION_CACHE_DIR).
"""
from __future__ import annotations

import time
from typing import Iterable, Sequence, Tuple

import jax
import jax.numpy as jnp


def precompile(pipe, settings: Iterable[Tuple[int, int, int, str]],
               guidance_scale: float = 7.5, verbose: bool = True) -> None:
    """settings: iterable of (width, height, num_steps, sampler)."""
    for (w, h, steps, sampler) in settings:
        t0 = time.perf_counter()
        pipe.txt2img('warmup', '', width=w, height=h, num_steps=steps,
                     guidance_scale=guidance_scale, sampler=sampler,
                     seed=0, return_latents=True).block_until_ready()
        if verbose:
            print(f'[aot] {w}x{h} {sampler}/{steps}: '
                  f'{time.perf_counter() - t0:.1f}s')


DEFAULT_SETTINGS = (
    (512, 512, 20, 'dpm++_2m'),
    (512, 512, 30, 'euler_a'),
    (768, 768, 20, 'dpm++_2m'),
)
