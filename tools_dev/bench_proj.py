"""Micro-bench: XLA dense vs Pallas fused_dense/geglu_dense at the SD1.5
transformer projection shapes (on the real chip). Times are scan-amortized
over 50 iterations.

Usage: python tools_dev/bench_proj.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp

from hcpdiff_tpu.ops.matmul import fused_dense, geglu_dense

REPS = 50


def timed(fn, x, *rest):
    # args must be real jit inputs (a zero-arg closure embeds the 40-170MB
    # operands as HLO constants — pathologically slow), and the op must
    # depend on the scan carry or XLA hoists it out of the loop.
    @jax.jit
    def run(x, *rest):
        def body(c, _):
            out = fn(x + c.astype(x.dtype), *rest)
            # full-tensor reduction: consuming only out[0] lets XLA DCE the
            # matmul down to a single dot-product row
            return jnp.mean(out).astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[0]

    run(x, *rest).block_until_ready()  # compile
    t0 = time.perf_counter()
    run(x, *rest).block_until_ready()
    return (time.perf_counter() - t0) / REPS * 1e3  # ms


def main():
    dt = jnp.bfloat16
    # (label, M, K, N) — per-level projection shapes at 512px batch 16 (CFG)
    denses = [
        ('l0 proj/to_out  ', 16 * 4096, 320, 320),
        ('l0 ff.out       ', 16 * 4096, 1280, 320),
        ('l1 proj/to_out  ', 16 * 1024, 640, 640),
        ('l1 ff.out       ', 16 * 1024, 2560, 640),
        ('l2 proj/to_out  ', 16 * 256, 1280, 1280),
        ('l2 ff.out       ', 16 * 256, 5120, 1280),
    ]
    for label, M, K, N in denses:
        x = jax.random.normal(jax.random.PRNGKey(0), (M, K), dt)
        w = jax.random.normal(jax.random.PRNGKey(1), (K, N), dt) * 0.02
        b = jnp.zeros((N,), dt)
        t_xla = timed(lambda x, w, b: (x @ w + b[None, :]), x, w, b)
        t_pls = timed(fused_dense, x, w, b)
        flops = 2 * M * K * N
        print(f'{label} M{M} K{K} N{N}: xla {t_xla:6.3f}ms '
              f'({flops/t_xla/1e9:5.1f} TF/s)  pallas {t_pls:6.3f}ms '
              f'({flops/t_pls/1e9:5.1f} TF/s)', flush=True)

    geglus = [
        ('l0 geglu', 16 * 4096, 320, 1280),
        ('l1 geglu', 16 * 1024, 640, 2560),
        ('l2 geglu', 16 * 256, 1280, 5120),
    ]

    def xla_geglu(x, w, b):
        y = x @ w + b[None, :]
        h, g = jnp.split(y, 2, axis=-1)
        return h * jax.nn.gelu(g, approximate=False)

    for label, M, K, inner in geglus:
        x = jax.random.normal(jax.random.PRNGKey(0), (M, K), dt)
        w = jax.random.normal(jax.random.PRNGKey(1), (K, 2 * inner), dt) * 0.02
        b = jnp.zeros((2 * inner,), dt)
        t_xla = timed(xla_geglu, x, w, b)
        t_pls = timed(geglu_dense, x, w, b)
        flops = 4 * M * K * inner
        print(f'{label} M{M} K{K} I{inner}: xla {t_xla:6.3f}ms '
              f'({flops/t_xla/1e9:5.1f} TF/s)  pallas {t_pls:6.3f}ms '
              f'({flops/t_pls/1e9:5.1f} TF/s)', flush=True)


if __name__ == '__main__':
    main()
