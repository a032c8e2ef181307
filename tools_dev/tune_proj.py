"""Dev tuner: block sizes for fused_dense / geglu_dense on the real chip.

Wall-clock timing of repeated dispatches is unreliable through the axon
tunnel (identical re-dispatches can return near-instantly), so each config
is measured from a jax.profiler trace: sum of device-lane durations of the
pallas custom-call events over R=8 applications on distinct inputs.

usage: python tools_dev/tune_proj.py [dense|geglu]
"""
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp

from hcpdiff_tpu.ops.matmul import fused_dense, geglu_dense

R = 8
TRACE_DIR = '/tmp/tune_trace'


def _device_pallas_ms():
    files = sorted(glob.glob(f'{TRACE_DIR}/plugins/profile/*/*.trace.json.gz'))
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    ev = data['traceEvents']
    procs = {e.get('pid'): e.get('args', {}).get('name')
             for e in ev if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    tpu = {p for p, n in procs.items() if n and 'TPU' in n}
    tot = 0.0
    for e in ev:
        if (e.get('ph') == 'X' and 'dur' in e and e.get('pid') in tpu
                and 'matmul.py' in str(e.get('args', {}).get('source', ''))):
            tot += e['dur']
    return tot / 1000.0


def timed(fn, xs, *rest):
    @jax.jit
    def run(xs, *rest):
        return sum(jnp.mean(fn(xs[i], *rest).astype(jnp.float32))
                   for i in range(R))

    try:
        run(xs, *rest).block_until_ready()  # compile
    except Exception as e:
        return None
    xs2 = xs + 1e-3  # fresh buffers so the traced dispatch can't be elided
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        run(xs2, *rest).block_until_ready()
    ms = _device_pallas_ms()
    return ms / R if ms else None


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'geglu'
    dt = jnp.bfloat16
    if which == 'geglu':
        shapes = [('l0', 16 * 4096, 320, 1280), ('l1', 16 * 1024, 640, 2560),
                  ('l2', 16 * 256, 1280, 5120)]
        for label, M, K, inner in shapes:
            xs = jax.random.normal(jax.random.PRNGKey(0), (R, M, K), dt)
            w = jax.random.normal(jax.random.PRNGKey(1), (K, 2 * inner), dt) * 0.02
            b = jnp.zeros((2 * inner,), dt)
            fl = 4 * M * K * inner
            bw = (M * K + 2 * K * inner + M * inner) * 2
            print(f'{label} M{M} K{K} I{inner} roofline '
                  f'{max(fl/197e12, bw/819e9)*1e3:.3f}ms', flush=True)
            for bm in (256, 512, 1024):
                for bn in (256, 512, 1280):
                    if bn > inner or bm > M:
                        continue
                    t = timed(lambda x, w, b, bm=bm, bn=bn:
                              geglu_dense(x, w, b, bm=bm, bn=bn), xs, w, b)
                    msg = 'FAIL' if t is None else \
                        f'{t:6.3f}ms ({fl/t/1e9:6.1f} TF/s)'
                    print(f'  bm{bm} bn{bn}: {msg}', flush=True)
    else:
        shapes = [('l0 out', 16 * 4096, 1280, 320),
                  ('l1 out', 16 * 1024, 2560, 640),
                  ('l2 out', 16 * 256, 5120, 1280),
                  ('l0 proj', 16 * 4096, 320, 320),
                  ('l1 proj', 16 * 1024, 640, 640),
                  ('l2 proj', 16 * 256, 1280, 1280)]
        for label, M, K, N in shapes:
            xs = jax.random.normal(jax.random.PRNGKey(0), (R, M, K), dt)
            w = jax.random.normal(jax.random.PRNGKey(1), (K, N), dt) * 0.02
            b = jnp.zeros((N,), dt)
            fl = 2 * M * K * N
            bw = (M * K + K * N + M * N) * 2
            print(f'{label} M{M} K{K} N{N} roofline '
                  f'{max(fl/197e12, bw/819e9)*1e3:.3f}ms', flush=True)
            for bm in (256, 512, 1024, 2048):
                for bk in (640, 1280, 2560):
                    if bm > M:
                        continue
                    t = timed(lambda x, w, b, bm=bm, bk=bk:
                              fused_dense(x, w, b, bm=bm, bk=bk), xs, w, b)
                    msg = 'FAIL' if t is None else \
                        f'{t:6.3f}ms ({fl/t/1e9:6.1f} TF/s)'
                    print(f'  bm{bm} bk{bk}: {msg}', flush=True)


if __name__ == '__main__':
    main()
