"""Device mesh + sharding policy (replaces the reference's accelerate/
DeepSpeed/ColossalAI stack, SURVEY.md §2.9).

- DP: batch sharded over the 'data' axis, params replicated; XLA inserts the
  gradient all-reduce over ICI (covers DDP, reference train_ac.py:117-190).
- ZeRO-1: optimizer-state pytrees sharded over 'data'
  (covers DeepSpeed zero2.json's optimizer sharding).
- FSDP axis: optional param sharding over 'fsdp' for SDXL-scale models
  (covers ZeRO-3 / Gemini chunked placement, train_colo.py).

Multi-host: jax.distributed.initialize() before mesh creation; everything
below is process-count agnostic.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, fsdp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        data = n // fsdp
    assert data * fsdp == n, f'mesh {data}x{fsdp} != {n} devices'
    arr = np.asarray(devices).reshape(data, fsdp)
    return Mesh(arr, ('data', 'fsdp'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch with the leading axis split over 'data'.
    Scalars and non-divisible leaves are replicated.

    Multi-host: leaves are expected to be this host's slice of the global
    batch (datasets slice per host, data/dataset.py get_batch); the global
    array is assembled from per-process shards without gathering."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    n = mesh.shape['data']
    nproc = jax.process_count()
    n_local = max(n // nproc, 1)

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] > 0:
            if nproc > 1 and x.shape[0] % n_local == 0:
                import numpy as _np
                return jax.make_array_from_process_local_data(
                    sh, _np.asarray(x))
            if x.shape[0] % n == 0:
                return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def _zero1_spec(x: jnp.ndarray, n_shards: int) -> P:
    """Shard the largest divisible axis (ZeRO-1 optimizer-state layout)."""
    if x.ndim == 0:
        return P()
    dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
    for d in dims:
        if x.shape[d] % n_shards == 0 and x.shape[d] >= n_shards:
            spec: list = [None] * x.ndim
            spec[d] = 'data'
            return P(*spec)
    return P()


def zero1_shardings(tree: Any, mesh: Mesh) -> Any:
    n = mesh.shape['data']
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _zero1_spec(x, n)), tree)


def fsdp_spec(x: jnp.ndarray, n_shards: int) -> P:
    if x.ndim == 0:
        return P()
    for d in sorted(range(x.ndim), key=lambda d: -x.shape[d]):
        if x.shape[d] % n_shards == 0 and x.shape[d] >= n_shards:
            spec: list = [None] * x.ndim
            spec[d] = 'fsdp'
            return P(*spec)
    return P()


def fsdp_shardings(tree: Any, mesh: Mesh) -> Any:
    n = mesh.shape['fsdp']
    if n == 1:
        return jax.tree_util.tree_map(lambda x: replicated(mesh), tree)
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, fsdp_spec(x, n)), tree)


def gather_to_host(tree: Any) -> Any:
    """Fetch a (possibly cross-process sharded) pytree to host numpy.

    COLLECTIVE on multi-host when any leaf is not fully addressable
    (zero1/zero2/fsdp shards live on other processes): every process must
    call this together — the reference's accelerate gather-then-save
    equivalent (train_ac.py:400-426). Fully-addressable leaves (replicated
    or single-process) are plain device_gets with no communication."""
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils as mhu
            return np.asarray(mhu.process_allgather(x, tiled=True))
        return np.asarray(jax.device_get(x))

    return jax.tree_util.tree_map(get, tree)


def broadcast_string(s: str, max_len: int = 256) -> str:
    """Process-0's string on every process (utf-8, fixed-width uint8)."""
    from jax.experimental import multihost_utils as mhu
    buf = np.zeros(max_len, np.uint8)
    raw = s.encode('utf-8')[:max_len]
    buf[:len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(mhu.broadcast_one_to_all(buf))
    return bytes(out[out != 0]).decode('utf-8')


def barrier(name: str = 'barrier') -> None:
    """Cross-process sync (reference accelerator.wait_for_everyone,
    train_ac.py:425-426). No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils as mhu
        mhu.sync_global_devices(name)


def pad_to_multiple(n_items: int, multiple: int) -> int:
    """Bucket padding invariant (reference data/bucket.py:181-188):
    pad item count to a multiple of batch_size x n_devices."""
    return ((n_items + multiple - 1) // multiple) * multiple


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_slice(global_batch: int, mesh: Mesh) -> Tuple[int, int]:
    """(start, size) of this host's shard of the global batch."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    return jax.process_index() * per, per
