"""Distributed communication helpers — API-parity shims over JAX collectives.

Parity: ``pcdet/utils/commu_utils.py`` (pickle-to-ByteTensor ``all_gather``
:50-111, ``reduce_dict`` :114-140, ``average_reduce_value`` :143-145,
``all_reduce`` :148-168, ``concat_all_gather`` :171-182) and
``common_utils.merge_results_dist`` :199-220.

On TPU there is no NCCL to port: inside jitted code use ``jax.lax`` psum /
all_gather over the mesh axis; these host-level helpers cover the reference's
out-of-graph uses (metric averaging, per-rank object merging) via
``multihost_utils.process_allgather`` and degrade to no-ops single-process.
"""

from __future__ import annotations

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def all_gather(data):
    """Gather arbitrary picklable objects from every host process.
    Parity: ``commu_utils.all_gather:50-111`` — pickle to a byte buffer,
    allgather the per-rank sizes, pad to the max, allgather, unpickle.
    (``process_allgather`` alone requires identical leaf shapes across
    ranks, which arbitrary objects don't satisfy.)"""
    if get_world_size() == 1:
        return [data]
    import pickle
    from jax.experimental import multihost_utils
    buf = np.frombuffer(pickle.dumps(data), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([buf.size], np.int64))
    max_size = int(np.max(sizes))
    padded = np.zeros((max_size,), np.uint8)
    padded[:buf.size] = buf
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, :int(sizes[i, 0])].tobytes())
            for i in range(get_world_size())]


def average_reduce_value(data):
    """Mean of a scalar across processes (timing stats — :143-145)."""
    vals = all_gather(float(data))
    return float(np.mean(vals))


def all_reduce(data, op: str = 'sum'):
    vals = np.asarray(all_gather(np.asarray(data)))
    return {'sum': vals.sum(0), 'max': vals.max(0),
            'min': vals.min(0), 'prod': vals.prod(0)}[op]


def reduce_dict(input_dict: dict, average: bool = True) -> dict:
    """Reduce dict of scalars across processes (parity :114-140)."""
    world = get_world_size()
    if world == 1:
        return dict(input_dict)
    keys = sorted(input_dict)
    stacked = np.asarray(all_gather([float(input_dict[k]) for k in keys]))
    red = stacked.mean(0) if average else stacked.sum(0)
    return dict(zip(keys, red.tolist()))


def merge_results_dist(part_list, total_size: int):
    """Merge per-process result lists into a deduped, size-capped list.
    Parity: ``common_utils.merge_results_dist`` (the reference rendezvouses
    through a pickle tmpdir; process_allgather removes the filesystem)."""
    gathered = all_gather(part_list)
    ordered = []
    for parts in zip(*[g + [None] * (max(map(len, gathered)) - len(g))
                       for g in gathered]):
        ordered.extend(p for p in parts if p is not None)
    return ordered[:total_size]


def synchronize():
    if get_world_size() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('commu_utils_barrier')
