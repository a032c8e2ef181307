"""Dev sweep: Pallas fused_dense/geglu_dense block sizes at SD projection
shapes, in-scan timing (XLA comparison is impossible in-scan — the
algebraic simplifier collapses mean(x@w); compare end-to-end instead).

usage: python tools_dev/sweep_proj.py [dense|geglu]
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
    @jax.jit
    def run(x, *rest):
        def body(c, _):
            out = fn(x + c.astype(x.dtype), *rest)
            return jnp.mean(out.astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[0]

    run(x, *rest).block_until_ready()
    t0 = time.perf_counter()
    run(x, *rest).block_until_ready()
    return (time.perf_counter() - t0) / REPS * 1e3


DENSES = [
    ('l0 proj', 16 * 4096, 320, 320),
    ('l0 ffout', 16 * 4096, 1280, 320),
    ('l1 proj', 16 * 1024, 640, 640),
    ('l1 ffout', 16 * 1024, 2560, 640),
    ('l2 proj', 16 * 256, 1280, 1280),
    ('l2 ffout', 16 * 256, 5120, 1280),
]

GEGLUS = [
    ('l0 geglu', 16 * 4096, 320, 1280),
    ('l1 geglu', 16 * 1024, 640, 2560),
    ('l2 geglu', 16 * 256, 1280, 5120),
]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'dense'
    dt = jnp.bfloat16
    if which == 'dense':
        for label, M, K, N in DENSES:
            x = jax.random.normal(jax.random.PRNGKey(0), (M, K), dt)
            w = jax.random.normal(jax.random.PRNGKey(1), (K, N), dt) * 0.02
            b = jnp.zeros((N,), dt)
            ideal = (M * K + K * N + M * N) * 2 / 819e9 * 1e3  # ms @819GB/s
            for bm in (512, 1024, 2048, 4096):
                if bm > M:
                    continue
                t = timed(lambda x, w, b, bm=bm: fused_dense(x, w, b, bm=bm),
                          x, w, b)
                fl = 2 * M * K * N
                print(f'{label} M{M} K{K} N{N} bm{bm}: {t:7.3f}ms '
                      f'({fl/t/1e9:6.1f} TF/s, ideal-bw {ideal:5.3f}ms)',
                      flush=True)
    else:
        for label, M, K, inner in GEGLUS:
            x = jax.random.normal(jax.random.PRNGKey(0), (M, K), dt)
            w = jax.random.normal(jax.random.PRNGKey(1), (K, 2 * inner), dt) * 0.02
            b = jnp.zeros((2 * inner,), dt)
            ideal = (M * K + 2 * K * inner + M * inner) * 2 / 819e9 * 1e3
            for bm, bn in ((512, 512), (1024, 512), (2048, 512), (1024, 1280),
                           (2048, 1280)):
                if bm > M or bn > inner:
                    continue
                t = timed(lambda x, w, b, bm=bm, bn=bn:
                          geglu_dense(x, w, b, bm=bm, bn=bn), x, w, b)
                fl = 4 * M * K * inner
                print(f'{label} M{M} K{K} I{inner} bm{bm} bn{bn}: {t:7.3f}ms '
                      f'({fl/t/1e9:6.1f} TF/s, ideal-bw {ideal:5.3f}ms)',
                      flush=True)


if __name__ == '__main__':
    main()
