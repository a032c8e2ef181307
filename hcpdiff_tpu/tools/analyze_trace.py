"""Aggregate a jax.profiler trace by op category.

usage:
  python -m hcpdiff_tpu.tools.analyze_trace /tmp/my_trace [top_n]

Works with traces captured via utils.profiling.trace() or
jax.profiler.start_trace — including through the axon TPU tunnel (device
lane events appear under a /device:TPU pid).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def analyze(trace_dir: str, top_n: int = 30):
    files = sorted(glob.glob(f'{trace_dir}/plugins/profile/*/*.trace.json.gz'))
    if not files:
        raise SystemExit(f'no trace files under {trace_dir}')
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    events = data.get('traceEvents', [])
    procs = {e.get('pid'): e.get('args', {}).get('name')
             for e in events
             if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    agg: collections.Counter = collections.Counter()
    for e in events:
        if e.get('ph') == 'X' and 'dur' in e:
            name = e.get('name', '?').split('.')[0][:48]
            agg[(e.get('pid'), name)] += e['dur']
    print(f'{"ms":>10}  {"process":<18} op')
    for (pid, name), dur in agg.most_common(top_n):
        print(f'{dur / 1000:10.2f}  {str(procs.get(pid, pid)):<18} {name}')


if __name__ == '__main__':
    analyze(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
