"""Parallelism: device-mesh data parallelism + sharded pool scoring.

Replaces the reference's DDP/NCCL layer (SURVEY.md §2.6):
  - ``torch.nn.parallel.DistributedDataParallel`` (tools/train.py:195-196)
    → ``jax.sharding.Mesh`` + NamedSharding on the batch axis; XLA inserts
    the gradient psum over ICI automatically.
  - ``commu_utils.all_gather/average_reduce_value`` (pcdet/utils/commu_utils)
    → ``jax.lax`` collectives / ``process_allgather``.
  - DistributedSampler pool sharding (pcdet/datasets/__init__.py:26-46)
    → batch-dim sharding of the jitted pool-scoring pass.

Single-host multi-chip works as-is; multi-host adds
``jax.distributed.initialize()`` at CLI start (DCN bootstrap — the analogue
of ``init_dist_pytorch/init_dist_slurm``).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed():
    """Multi-host bootstrap (parity: common_utils.init_dist_pytorch:161-174).
    No-op on single-host."""
    if int(jax.process_count()) > 1:
        return
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process run


def make_mesh(devices=None, axis_name: str = 'dp') -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'dp') -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = 'dp') -> dict:
    """Place a host batch with the batch dim sharded over the mesh.
    Batch size must be divisible by the mesh size."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_parallel_train_step(model, optimizer, dataset, mesh: Mesh,
                             axis_name: str = 'dp'):
    """DP version of runtime.train.make_train_step: state replicated, batch
    sharded; the jitted step's gradient reduction rides ICI via the psum XLA
    inserts for the replicated-output constraint."""
    from ..runtime.train import make_train_step
    step = make_train_step(model, optimizer, dataset)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, axis_name)

    def parallel_step(state, host_batch, rng):
        state = jax.tree.map(lambda x: jax.device_put(x, rep), state)
        batch = jax.tree.map(lambda x: jax.device_put(x, bsh), host_batch)
        return step(state, batch, rng)

    return parallel_step


def make_sharded_pool_scorer(score_fn, mesh: Mesh, axis_name: str = 'dp'):
    """Shard the unlabelled-pool scoring pass across chips: the per-frame
    signal vectors come back gathered (replicated), matching the reference's
    per-rank DistributedSampler + pickle merge (strategy.py:73-76) without
    any filesystem rendezvous."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, axis_name)

    def sharded_score(variables, host_batch, rng):
        variables = jax.tree.map(lambda x: jax.device_put(x, rep), variables)
        batch = jax.tree.map(lambda x: jax.device_put(x, bsh), host_batch)
        out = score_fn(variables, batch, rng)
        return jax.tree.map(lambda x: jax.device_put(x, rep), out)

    return sharded_score
