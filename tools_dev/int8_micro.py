"""int8 MXU micro-probe (real chip): is int8 x int8 -> int32 actually ~2x
bf16 on v5e through XLA at the UNet's matmul shapes? Decides whether the
int8-weight inference experiment (VERDICT r4 stretch #9) can move the
ceiling above bf16 MFU.

Measures, per shape:
  bf16       x_bf16 @ w_bf16                     (the current path)
  int8_raw   x_int8 @ w_int8 -> int32            (raw MXU ceiling)
  int8_dyn   full dynamic path: quantize x per-tensor, int8 matmul,
             rescale to bf16 (what a real layer must do)

Serial dependency: the carry is a scalar folded into the next input at
1e-20 weight — defeats cross-iteration caching without reshaping costs.

usage: python tools_dev/int8_micro.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import jax.numpy as jnp

# (M, K, N): the 512px UNet's heavy projections at batch 8 CFG-doubled
# (M = 16 * S), ff in/out at level 0/1, attn out proj, and a conv-as-GEMM
SHAPES = [
    (65536, 320, 2560),    # L0 ff.proj (S=4096)
    (65536, 1280, 320),    # L0 ff.out
    (16384, 640, 5120),    # L1 ff.proj
    (65536, 320, 320),     # L0 attn proj
    (16384, 2304, 640),    # L1 conv1 3x3 as GEMM (K=9*256)
]
N_CHAIN = 30


def _time(f, *args):
    r = jax.jit(f)
    float(r(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(r(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / N_CHAIN * 1e3


def main():
    print(f'backend={jax.default_backend()}', flush=True)
    for M, K, N in SHAPES:
        r1, r2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(r1, (M, K)).astype(jnp.bfloat16)
        w = jax.random.normal(r2, (K, N)).astype(jnp.bfloat16)
        x8 = (jax.random.randint(r1, (M, K), -127, 127)).astype(jnp.int8)
        w8 = (jax.random.randint(r2, (K, N), -127, 127)).astype(jnp.int8)
        sw = jnp.abs(w.astype(jnp.float32)).max(axis=0) / 127.0

        def bf16(x, w):
            def step(acc, _):
                xi = x * (1 + acc * jnp.bfloat16(1e-20))
                y = jnp.dot(xi, w, preferred_element_type=jnp.float32)
                return y.mean().astype(jnp.bfloat16), None
            out, _ = jax.lax.scan(step, jnp.bfloat16(0), None, length=N_CHAIN)
            return out.astype(jnp.float32)

        def i8(x8, w8):
            def step(acc, _):
                xi = x8 + (acc & 0)          # int dependency, no-op value
                y = jax.lax.dot_general(
                    xi, w8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return y.sum(dtype=jnp.int32) & 0x7f, None
            out, _ = jax.lax.scan(step, jnp.int32(0), None, length=N_CHAIN)
            return out.astype(jnp.float32)

        def i8_dyn(x, w8, sw):
            def step(acc, _):
                xi = x * (1 + acc * jnp.bfloat16(1e-20))
                sx = jnp.abs(xi.astype(jnp.float32)).max() / 127.0
                cq = jnp.clip(jnp.round(xi.astype(jnp.float32) / sx),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.dot_general(
                    cq, w8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = (y.astype(jnp.float32) * (sx * sw)).astype(jnp.bfloat16)
                return y.mean().astype(jnp.bfloat16), None
            out, _ = jax.lax.scan(step, jnp.bfloat16(0), None, length=N_CHAIN)
            return out.astype(jnp.float32)

        tf = 2 * M * K * N / 1e12
        try:
            t_bf = _time(bf16, x, w)
            print(f'M{M} K{K} N{N} bf16      {t_bf:7.3f} ms '
                  f'{tf / (t_bf / 1e3):6.1f} TF/s', flush=True)
        except Exception as e:
            print(f'M{M} K{K} N{N} bf16 FAILED {type(e).__name__}: '
                  f'{str(e)[:120]}', flush=True)
            continue
        for name, fn, args in (('int8_raw ', i8, (x8, w8)),
                               ('int8_dyn ', i8_dyn, (x, w8, sw))):
            try:
                t = _time(fn, *args)
                print(f'M{M} K{K} N{N} {name} {t:7.3f} ms '
                      f'{tf / (t / 1e3):6.1f} TOP/s ({t_bf / t:.2f}x vs bf16)',
                      flush=True)
            except Exception as e:
                print(f'M{M} K{K} N{N} {name} FAILED {type(e).__name__}: '
                      f'{str(e)[:120]}', flush=True)


if __name__ == '__main__':
    main()
