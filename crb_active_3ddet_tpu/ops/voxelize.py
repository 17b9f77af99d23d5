"""Device-side dynamic voxelization with fixed-capacity outputs.

TPU-native replacement for the reference's CPU voxelizer
(``spconv.utils.Point2VoxelCPU3d`` wrapped by ``VoxelGeneratorWrapper`` at
``pcdet/datasets/processor/data_processor.py:15-60``, driven by
``transform_points_to_voxels`` at ``:115-143``).

Instead of hashing points into voxels on dataloader-worker CPUs, we voxelize
**on device, inside jit**: sort points by linearized voxel id (stable sort →
keeps arrival order within a voxel like the reference), mark first occurrences
to assign dense voxel slots, and scatter points into a fixed
(max_voxels, max_points_per_voxel, C) buffer.  Everything is fixed-shape;
overflow voxels/points are dropped exactly like the reference's caps
(train 16k / test 40k voxels for KITTI, ``kitti_dataset.yaml:64-70``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def grid_size_from_range(point_cloud_range, voxel_size):
    pcr = np.asarray(point_cloud_range, np.float64)
    vs = np.asarray(voxel_size, np.float64)
    grid = np.round((pcr[3:6] - pcr[0:3]) / vs).astype(np.int64)
    return tuple(int(g) for g in grid)  # (nx, ny, nz)


@partial(jax.jit, static_argnames=('grid_size', 'max_voxels', 'max_points_per_voxel'))
def voxelize(points, points_valid, point_cloud_range, voxel_size,
             grid_size: tuple, max_voxels: int, max_points_per_voxel: int):
    """Voxelize one frame of padded points.

    Args:
        points: (N, C) with xyz in the first 3 channels (padded rows arbitrary).
        points_valid: (N,) bool.
        point_cloud_range: (6,) [x0, y0, z0, x1, y1, z1].
        voxel_size: (3,) [vx, vy, vz].
        grid_size: static (nx, ny, nz).
        max_voxels / max_points_per_voxel: static capacity.

    Returns dict:
        voxels: (max_voxels, max_points_per_voxel, C) float32
        voxel_coords: (max_voxels, 3) int32 in (z, y, x) order (reference
            layout after the [::-1] flip in ``data_processor.py``)
        voxel_num_points: (max_voxels,) int32
        voxel_valid: (max_voxels,) bool
        num_voxels: () int32
    """
    nx, ny, nz = grid_size
    n, c = points.shape
    pcr = jnp.asarray(point_cloud_range, points.dtype)
    vs = jnp.asarray(voxel_size, points.dtype)

    coords_f = (points[:, :3] - pcr[:3]) / vs
    coords = jnp.floor(coords_f).astype(jnp.int32)  # (N, 3) x, y, z
    in_range = ((coords >= 0).all(axis=1)
                & (coords[:, 0] < nx) & (coords[:, 1] < ny) & (coords[:, 2] < nz))
    valid = points_valid & in_range

    # linear voxel id; invalid points pushed to the end with id = num_cells
    num_cells = nx * ny * nz
    vid = (coords[:, 2] * (ny * nx) + coords[:, 1] * nx + coords[:, 0])
    vid = jnp.where(valid, vid, num_cells)

    # stable payload-carrying sort: lax.sort moves the original index WITH
    # the key, so vid_s needs no vid[order] scalar gather afterwards
    # (scalar gathers cost ~20 ns/idx on TPU — the payload rides free)
    vid_s, order = jax.lax.sort(
        (vid, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True)
    valid_s = vid_s < num_cells

    first = jnp.concatenate([jnp.ones((1,), bool), vid_s[1:] != vid_s[:-1]])
    first &= valid_s
    # dense voxel slot per sorted point
    slot = jnp.cumsum(first) - 1  # (N,) int
    num_voxels_total = first.sum()
    voxel_ok = valid_s & (slot < max_voxels)

    # rank of each point within its voxel (arrival order)
    seg_start = jnp.where(first, jnp.arange(n), 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = jnp.arange(n) - seg_start
    point_ok = voxel_ok & (rank < max_points_per_voxel)

    # scatter points into the fixed voxel buffer
    flat_pos = jnp.where(point_ok, slot * max_points_per_voxel + rank,
                         max_voxels * max_points_per_voxel)
    voxels = jnp.zeros((max_voxels * max_points_per_voxel, c), points.dtype)
    voxels = voxels.at[flat_pos].set(points[order], mode='drop')
    voxels = voxels.reshape(max_voxels, max_points_per_voxel, c)

    # per-voxel point counts (capped) and coords from the first point
    ones = jnp.where(point_ok, 1, 0)
    voxel_num_points = jnp.zeros((max_voxels,), jnp.int32).at[
        jnp.where(point_ok, slot, max_voxels)].add(ones, mode='drop')

    # voxel coords decoded arithmetically from the sorted voxel id (no
    # coords[order] gather); invalid rows land in the drop slot anyway
    vz = vid_s // (ny * nx)
    vrem = vid_s % (ny * nx)
    czyx = jnp.stack([vz, vrem // nx, vrem % nx], axis=1)
    coord_pos = jnp.where(first & (slot < max_voxels), slot, max_voxels)
    voxel_coords = jnp.full((max_voxels, 3), -1, jnp.int32).at[coord_pos].set(
        czyx, mode='drop')

    voxel_valid = jnp.arange(max_voxels) < jnp.minimum(num_voxels_total, max_voxels)

    # per-ORIGINAL-point voxel slot, uncapped by max_points_per_voxel —
    # the dynamic VFEs (scatter over ALL in-range points, reference
    # dynamic_mean_vfe.py:52-66) segment-reduce over this
    point_slot = jnp.full((n,), max_voxels, jnp.int32).at[order].set(
        jnp.where(voxel_ok, slot, max_voxels).astype(jnp.int32))

    return {
        'voxels': voxels,
        'voxel_coords': voxel_coords,
        'voxel_num_points': voxel_num_points,
        'voxel_valid': voxel_valid,
        'point_slot': point_slot,
        'num_voxels': jnp.minimum(num_voxels_total, max_voxels).astype(jnp.int32),
    }


def voxelize_numpy(points, point_cloud_range, voxel_size, grid_size,
                   max_voxels, max_points_per_voxel):
    """Host-side reference/debug voxelizer with identical semantics."""
    nx, ny, nz = grid_size
    pcr = np.asarray(point_cloud_range, np.float64)
    vs = np.asarray(voxel_size, np.float64)
    coords = np.floor((points[:, :3] - pcr[:3]) / vs).astype(np.int64)
    in_range = ((coords >= 0).all(axis=1)
                & (coords[:, 0] < nx) & (coords[:, 1] < ny) & (coords[:, 2] < nz))
    voxels = np.zeros((max_voxels, max_points_per_voxel, points.shape[1]), np.float32)
    voxel_coords = np.full((max_voxels, 3), -1, np.int32)
    nums = np.zeros((max_voxels,), np.int32)
    vid_to_slot = {}
    for i in range(points.shape[0]):
        if not in_range[i]:
            continue
        key = (coords[i, 2], coords[i, 1], coords[i, 0])
        if key not in vid_to_slot:
            if len(vid_to_slot) >= max_voxels:
                continue
            vid_to_slot[key] = len(vid_to_slot)
            voxel_coords[vid_to_slot[key]] = key
        s = vid_to_slot[key]
        if nums[s] < max_points_per_voxel:
            voxels[s, nums[s]] = points[i]
            nums[s] += 1
    return {
        'voxels': voxels, 'voxel_coords': voxel_coords,
        'voxel_num_points': nums, 'num_voxels': len(vid_to_slot),
    }
