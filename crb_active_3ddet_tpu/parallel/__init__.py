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


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Multi-host bootstrap: ``jax.distributed.initialize`` with explicit
    args, env vars, or SLURM auto-detection.

    Parity: ``common_utils.init_dist_pytorch`` :161-174 (explicit/env
    bootstrap) and ``init_dist_slurm`` :134-158 (SLURM_PROCID/NTASKS/
    NODELIST → MASTER_ADDR rendezvous).  JAX's cluster detection already
    understands SLURM and GKE env; explicit args win when given.

    Returns (num_processes, process_id) like the reference's
    ``(total_gpus, rank)``.  Call once at CLI start, before any jax op.
    """
    import os
    already = getattr(jax.distributed, 'is_initialized', None)
    if already is not None and jax.distributed.is_initialized():
        return jax.process_count(), jax.process_index()

    if coordinator_address is None and 'SLURM_PROCID' in os.environ \
            and int(os.environ.get('SLURM_NTASKS', '1')) > 1:
        # SLURM rendezvous (init_dist_slurm parity): first node hosts the
        # coordinator; jax's SlurmCluster computes the same, but be explicit
        # so a port choice can ride through like the reference's tcp_port
        num_processes = int(os.environ['SLURM_NTASKS'])
        process_id = int(os.environ['SLURM_PROCID'])

    if coordinator_address is not None or num_processes is not None \
            or os.environ.get('JAX_COORDINATOR_ADDRESS'):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            local_device_ids=local_device_ids)
    else:
        # single-process run: nothing to initialize
        return 1, 0
    return jax.process_count(), jax.process_index()


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


def default_mesh(batch_size=None, axis_name: str = 'dp'):
    """DP mesh over all local devices, or None when parallelism is moot
    (single device, or a batch that can't shard evenly)."""
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    if batch_size is not None and batch_size % len(devices):
        return None
    return make_mesh(devices, axis_name)


def place_replicated(tree, mesh: Mesh):
    """Place a pytree replicated on the mesh (do this ONCE for the train
    state; the donated state stays resident afterwards)."""
    return jax.device_put(tree, replicated(mesh))


def make_parallel_train_step(model, optimizer, dataset, mesh: Mesh,
                             axis_name: str = 'dp'):
    """DP version of runtime.train.make_train_step: state replicated, batch
    sharded, both expressed as jit in/out shardings so XLA inserts the
    gradient psum over ICI and no per-step host transfers occur."""
    from ..runtime.train import make_train_step
    return make_train_step(model, optimizer, dataset, mesh=mesh,
                           axis_name=axis_name)


def make_sharded_pool_scorer(score_fn, mesh: Mesh, axis_name: str = 'dp'):
    """Jit an (un-jitted) pool scorer with the batch sharded over the mesh
    and the per-frame signal vectors replicated back — the reference's
    per-rank DistributedSampler + pickle merge (strategy.py:73-76) without
    any filesystem rendezvous.  ``Strategy.build_score_fn`` applies this
    automatically whenever a mesh is available."""
    return jax.jit(score_fn,
                   in_shardings=(replicated(mesh), batch_sharding(mesh, axis_name),
                                 replicated(mesh)),
                   out_shardings=replicated(mesh))
