"""2-process jax.distributed save/restore test (VERDICT round-2 item 2:
'make save/ckpt multi-host-correct + prove it').

Spawns two REAL processes, each owning one cpu device, joined via
jax.distributed — the closest single-machine analog of a pod slice. The
worker trains with zero1 (optimizer state sharded ACROSS the processes),
saves through the multi-host protocol and restores. A collective entered
by only one process (the round-2 bug) hangs and trips the timeout."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_save_restore(tmp_path):
    # real timeout = communicate(timeout=840) below (pytest-timeout absent)
    imgs = tmp_path / 'imgs'
    imgs.mkdir()
    rng = np.random.default_rng(0)
    caps = {}
    for i in range(4):
        arr = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(imgs / f'img_{i}.png')
        caps[f'img_{i}'] = f'a photo of cat {i}'
    with open(imgs / 'captions.json', 'w') as f:
        json.dump(caps, f)

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')
    env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
    env['JAX_PLATFORMS'] = 'cpu'
    logs = [tmp_path / f'worker{i}.log' for i in range(2)]
    handles = [open(l, 'w') for l in logs]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), '2', str(port), str(tmp_path)],
        stdout=handles[i], stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    try:
        for p in procs:
            p.communicate(timeout=840)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        for h in handles:
            h.close()
        outs = [l.read_text() for l in logs]
        pytest.fail('multihost worker hung (collective entered by only '
                    'one process?)\n' + '\n--- worker ---\n'.join(outs))
    for h in handles:
        h.close()
    for i, p in enumerate(procs):
        assert p.returncode == 0, f'proc {i} failed:\n{logs[i].read_text()}'
    assert (tmp_path / 'ok').exists()
