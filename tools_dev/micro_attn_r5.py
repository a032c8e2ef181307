"""Round-5 attention kernel A/B micro-bench (real chip).

Shapes = the two flash-routed self-attention shapes in the 512px headline
loop at batch 8 (CFG-doubled to 16): level-0 (S=4096, D=40, H=8) and
level-1 (S=1024, D=80, H=8).

Variants:
  control        round-4 defaults (nomax + mxusum + exp2)
  unroll2        HCP_FLASH_UNROLL=1  (2-way body: overlap exp with next QK^T)
  pbf16          HCP_FLASH_P_BF16=1  (bf16 p into the PV matmul)
  unroll2+pbf16  both

usage: python tools_dev/micro_attn_r5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import jax.numpy as jnp

from hcpdiff_tpu.ops.flash_attention import flash_attention

VARIANTS = [
    ('control', {}),
    ('unroll2', {'HCP_FLASH_UNROLL': '1'}),
    ('pbf16', {'HCP_FLASH_P_BF16': '1'}),
    ('unroll2+pbf16', {'HCP_FLASH_UNROLL': '1', 'HCP_FLASH_P_BF16': '1'}),
    ('tq', {'HCP_FLASH_TQ': '1'}),
    ('tq+pbf16', {'HCP_FLASH_TQ': '1', 'HCP_FLASH_P_BF16': '1'}),
]

SHAPES = [
    (16, 8, 4096, 40),
    (16, 8, 1024, 80),
]

N_CHAIN = 20


def bench_one(B, H, S, D, env):
    for k in ('HCP_FLASH_UNROLL', 'HCP_FLASH_P_BF16', 'HCP_FLASH_TQ'):
        os.environ.pop(k, None)
    os.environ.update(env)
    rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    q = jax.random.normal(r1, (B, H, S, D)).astype(jnp.bfloat16)
    k = jax.random.normal(r2, (B, H, S, D)).astype(jnp.bfloat16)
    v = jax.random.normal(r3, (B, H, S, D)).astype(jnp.bfloat16)

    def chain(q, k, v):
        # serial dependency chain defeats CSE; output shape == q shape
        def step(c, _):
            return flash_attention(c, k, v), None
        out, _ = jax.lax.scan(step, q, None, length=N_CHAIN)
        # scalar result: float() below forces a true round-trip sync over
        # the axon tunnel (block_until_ready alone proved unreliable here)
        return out.astype(jnp.float32).mean()

    f = jax.jit(chain)
    float(f(q, k, v))                        # compile + settle
    # distinct inputs per rep: the tunnel serves repeated identical
    # executions from cache
    times = []
    for i in range(1, 4):
        qi = (q + jnp.bfloat16(i * 1e-3)).block_until_ready()
        t0 = time.perf_counter()
        float(f(qi, k, v))
        times.append(time.perf_counter() - t0)
    ms = min(times) / N_CHAIN * 1e3
    # padded-FLOP model: both matmuls pad to 128 lanes
    tf = 4 * B * H * S * S * D / 1e12
    return ms, tf / (ms / 1e3)


def main():
    print(f'backend={jax.default_backend()} devices={jax.devices()}',
          flush=True)
    for B, H, S, D in SHAPES:
        base = None
        for name, env in VARIANTS:
            try:
                ms, tfs = bench_one(B, H, S, D, env)
            except Exception as e:
                print(f'S={S} D={D} {name:15s} FAILED: '
                      f'{type(e).__name__}: {str(e)[:200]}', flush=True)
                continue
            if base is None:
                base = ms
            print(f'S={S} D={D} {name:15s} {ms:7.3f} ms  {tfs:6.1f} TF/s '
                  f'({base / ms:.3f}x vs control)', flush=True)


if __name__ == '__main__':
    main()
