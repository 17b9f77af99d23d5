"""Training loop: jitted train step with fused on-device voxelization.

Parity: ``tools/train_utils/train_utils.py`` (train_one_epoch :12-88,
train_model :90-136) — per-iteration timing meters, tqdm, tb/wandb hooks.

TPU-first: one ``train_step(state, host_batch, rng)`` pure function, jitted
with donated state; the point→voxel transform runs inside the same XLA
program as the model fwd/bwd (the reference voxelizes on dataloader-worker
CPUs).  Data parallelism plugs in via ``parallel.shard_batch`` — the step
itself is sharding-agnostic.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..ops import voxelize as vx_ops


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


_CAMERA_KEYS = ('images', 'depth_maps', 'trans_lidar_to_cam',
                'trans_cam_to_img', 'image_shape', 'gt_boxes2d')


def prepare_device_batch(batch, voxel_cfg, grid_size, point_cloud_range,
                         voxel_size):
    """Host numpy batch → device arrays + fused per-sample voxelization.
    Jit-compatible (called inside the train/eval step).  Camera-only models
    (CaDDN) carry no points/voxel_cfg — image keys pass through."""
    out = {}
    if 'points' in batch and voxel_cfg is not None:
        points = batch['points']            # (B, N, C)
        num_points = batch['num_points']    # (B,)
        n = points.shape[1]
        points_valid = jnp.arange(n)[None, :] < num_points[:, None]

        vox = jax.vmap(lambda p, v: vx_ops.voxelize(
            p, v, jnp.asarray(point_cloud_range), jnp.asarray(voxel_size),
            tuple(grid_size), voxel_cfg['max_voxels'],
            voxel_cfg['max_points_per_voxel']))(points, points_valid)

        out.update({
            'points': points,
            'points_valid': points_valid,
            'voxels': vox['voxels'],
            'voxel_coords': vox['voxel_coords'],
            'voxel_num_points': vox['voxel_num_points'],
            'voxel_valid': vox['voxel_valid'],
            'point_slot': vox['point_slot'],
            'batch_size': points.shape[0],
        })
    for k in _CAMERA_KEYS:
        if k in batch:
            out[k] = batch[k]
            out.setdefault('batch_size', batch[k].shape[0])
    if 'gt_boxes' in batch:
        out['gt_boxes'] = batch['gt_boxes']
    return out


def host_to_device_batch(batch):
    """Select the array keys the device step consumes."""
    keep = ('points', 'num_points', 'gt_boxes') + _CAMERA_KEYS
    return {k: jnp.asarray(np.asarray(batch[k])) for k in keep if k in batch}


def make_train_step(model, optimizer, dataset, mesh=None, axis_name='dp'):
    """Build the jitted train step closed over static data config.

    With ``mesh`` (a 1-D jax.sharding.Mesh), the step is jitted with the
    batch sharded over ``axis_name`` and state/outputs replicated — XLA
    inserts the gradient all-reduce over ICI (the DDP equivalent of
    ``tools/train.py:195-196`` in the reference).  Callers should place the
    state once via :func:`place_replicated` — the donated state then stays
    resident and no per-step transfers happen.
    """
    voxel_cfg = dataset.voxel_cfg
    grid_size = tuple(int(g) for g in dataset.grid_size)
    pcr = tuple(float(x) for x in dataset.point_cloud_range)
    vs = tuple(float(v) for v in dataset.voxel_size)

    def train_step(state: TrainState, host_batch, rng):
        batch = prepare_device_batch(host_batch, voxel_cfg, grid_size, pcr, vs)

        def loss_fn(params):
            out, mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, training=True, mutable=['batch_stats'],
                rngs={'dropout': rng})
            loss, tb = model.compute_loss(out)
            return loss, (tb, mutated)

        (loss, (tb, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, batch_stats=mutated['batch_stats'],
            opt_state=opt_state, step=state.step + 1)
        metrics = {'loss': loss}
        metrics.update({k: v for k, v in tb.items()
                        if jnp.ndim(v) == 0})
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis_name))
    return jax.jit(train_step, donate_argnums=(0,),
                   in_shardings=(rep, bsh, rep),
                   out_shardings=(rep, rep))


def init_train_state(model, optimizer, dataset, batch_size, rng=None):
    """Initialize params/batch_stats with a dummy batch (shapes from cfg)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = dataset.data_processor.max_points_per_frame
    c = dataset.num_point_features
    host_batch = {
        'points': jnp.zeros((batch_size, n, c), jnp.float32),
        'num_points': jnp.full((batch_size,), 16, jnp.int32),
        'gt_boxes': jnp.zeros((batch_size, dataset.max_gt_boxes, 8), jnp.float32),
    }
    if 'images' in dataset.dataset_cfg.get('GET_ITEM_LIST', []):
        ph, pw = dataset.image_pad_shape
        f = dataset.depth_downsample_factor or 1
        host_batch.update({
            'images': jnp.zeros((batch_size, ph, pw, 3), jnp.float32),
            'depth_maps': jnp.zeros(
                (batch_size, -(-ph // f), -(-pw // f)), jnp.float32),
            'trans_lidar_to_cam': jnp.tile(jnp.eye(4), (batch_size, 1, 1)),
            'trans_cam_to_img': jnp.tile(
                jnp.asarray([[100., 0, pw / 2, 0], [0, 100., ph / 2, 0],
                             [0, 0, 1, 0]]), (batch_size, 1, 1)),
            'image_shape': jnp.tile(jnp.asarray([ph, pw], jnp.int32),
                                    (batch_size, 1)),
            'gt_boxes2d': jnp.zeros((batch_size, dataset.max_gt_boxes, 4),
                                    jnp.float32),
        })
        if dataset.voxel_cfg is None:
            host_batch.pop('points')
            host_batch.pop('num_points')
    voxel_cfg = dataset.voxel_cfg
    grid_size = tuple(int(g) for g in dataset.grid_size)
    pcr = tuple(float(x) for x in dataset.point_cloud_range)
    vs = tuple(float(v) for v in dataset.voxel_size)
    batch = prepare_device_batch(host_batch, voxel_cfg, grid_size, pcr, vs)
    variables = model.init({'params': rng, 'dropout': rng}, batch,
                           training=True)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    opt_state = optimizer.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.asarray(0, jnp.int32))


class ProfilerHook:
    """``jax.profiler.trace`` over the first N steps (SURVEY §5.1 — product
    replacement for the reference's timing meters; view with TensorBoard's
    profile plugin or xprof)."""

    def __init__(self, num_steps: int, log_dir):
        self.num_steps = int(num_steps)
        self.log_dir = str(log_dir)
        self._step = 0
        self._active = False

    def step_start(self):
        if self.num_steps > 0 and self._step == 0 and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def step_end(self):
        self._step += 1
        if self._active and self._step >= self.num_steps:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def train_one_epoch(state, train_step, loader, rng, logger=None,
                    log_interval=50, tb_log=None, cur_epoch=0,
                    profiler: ProfilerHook | None = None):
    """Parity surface: ``train_utils.train_one_epoch`` (timing meters,
    scalar logging)."""
    data_time = fwd_time = 0.0
    losses = []
    end = time.time()
    for it, batch in enumerate(loader):
        host_batch = host_to_device_batch(batch)
        data_time += time.time() - end
        if profiler is not None:
            profiler.step_start()
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(state, host_batch, step_rng)
        losses.append(metrics['loss'])
        if profiler is not None:
            jax.block_until_ready(metrics['loss'])
            profiler.step_end()
        fwd_time += time.time() - end
        end = time.time()
        if logger is not None and (it % log_interval) == 0:
            logger.info('epoch %d it %d loss %.4f', cur_epoch, it,
                        float(metrics['loss']))
        if tb_log is not None:
            tb_log.add_scalar('train/loss', float(metrics['loss']),
                              int(state.step))
    mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float('nan')
    return state, {'loss': mean_loss, 'data_time': data_time,
                   'batch_time': fwd_time}, rng
