"""Round-5b attention micro-benches (real chip):

1. TQ forward block-size sweep (direct _flash_forward_tq calls) at the
   two flash-routed headline shapes — is 1024x1024 the right tile?
2. Training-path A/B: classic lse-forward + classic backward vs the
   transposed TQ training path (HCP_FLASH_TQ_TRAIN), timed via
   jax.grad at the same shapes. Decides the TQ_TRAIN default.

usage: python tools_dev/micro_attn_r5b.py [fwd|bwd|all]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import jax.numpy as jnp

from hcpdiff_tpu.ops import flash_attention as fa

SHAPES = [
    (16, 8, 4096, 40),
    (16, 8, 1024, 80),
]
N_CHAIN = 20


def _time_chain(fn, q, k, v):
    def chain(q, k, v):
        def step(c, _):
            return fn(c, k, v), None
        out, _ = jax.lax.scan(step, q, None, length=N_CHAIN)
        return out.astype(jnp.float32).mean()

    f = jax.jit(chain)
    float(f(q, k, v))
    times = []
    for i in range(1, 4):
        qi = (q + jnp.bfloat16(i * 1e-3)).block_until_ready()
        t0 = time.perf_counter()
        float(f(qi, k, v))
        times.append(time.perf_counter() - t0)
    return min(times) / N_CHAIN * 1e3


def _mk(B, H, S, D):
    r1, r2, r3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return (jax.random.normal(r1, (B, H, S, D)).astype(jnp.bfloat16),
            jax.random.normal(r2, (B, H, S, D)).astype(jnp.bfloat16),
            jax.random.normal(r3, (B, H, S, D)).astype(jnp.bfloat16))


def sweep_fwd():
    for B, H, S, D in SHAPES:
        q, k, v = _mk(B, H, S, D)
        scale = D ** -0.5
        base = None
        for bq in (512, 1024, 2048):
            for bk in (512, 1024, 2048):
                if bq > S or bk > S:
                    continue
                fn = functools.partial(fa._flash_forward_tq, causal=False,
                                       scale=scale, block_q=bq, block_k=bk)
                try:
                    ms = _time_chain(lambda a, b, c: fn(a, b, c), q, k, v)
                except Exception as e:
                    print(f'fwd S={S} D={D} bq={bq} bk={bk} FAILED: '
                          f'{type(e).__name__}: {str(e)[:160]}', flush=True)
                    continue
                if base is None:
                    base = ms
                print(f'fwd S={S} D={D} bq={bq:4d} bk={bk:4d} {ms:7.3f} ms '
                      f'({base / ms:.3f}x vs first)', flush=True)


def _time_grad(q, k, v, causal=False):
    def loss(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, causal=causal)
                       .astype(jnp.float32) ** 2)

    def chain(q, k, v):
        def step(c, _):
            g = jax.grad(loss, argnums=0)(c, k, v)
            return g.astype(jnp.bfloat16), None
        out, _ = jax.lax.scan(step, q, None, length=N_CHAIN)
        return out.astype(jnp.float32).mean()

    f = jax.jit(chain)
    float(f(q, k, v))
    times = []
    for i in range(1, 4):
        qi = (q + jnp.bfloat16(i * 1e-3)).block_until_ready()
        t0 = time.perf_counter()
        float(f(qi, k, v))
        times.append(time.perf_counter() - t0)
    return min(times) / N_CHAIN * 1e3


def sweep_bwd():
    for B, H, S, D in SHAPES:
        q, k, v = _mk(B, H, S, D)
        res = {}
        for name, env in (('classic', '0'), ('tq_train', '1')):
            os.environ['HCP_FLASH_TQ_TRAIN'] = env
            fa._make_flash.cache_clear()
            try:
                res[name] = _time_grad(q, k, v)
                print(f'bwd S={S} D={D} {name:9s} {res[name]:7.3f} ms',
                      flush=True)
            except Exception as e:
                print(f'bwd S={S} D={D} {name:9s} FAILED: '
                      f'{type(e).__name__}: {str(e)[:200]}', flush=True)
        if len(res) == 2:
            print(f'bwd S={S} D={D} tq_train speedup: '
                  f'{res["classic"] / res["tq_train"]:.3f}x', flush=True)
    os.environ.pop('HCP_FLASH_TQ_TRAIN', None)
    fa._make_flash.cache_clear()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else 'all'
    print(f'backend={jax.default_backend()} devices={jax.devices()}',
          flush=True)
    if mode in ('fwd', 'all'):
        sweep_fwd()
    if mode in ('bwd', 'all'):
        sweep_bwd()


if __name__ == '__main__':
    main()
