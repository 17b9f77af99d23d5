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

    # Compact the per-voxel metadata (first-entry position, voxel id, group
    # length) to the front with ONE payload sort instead of scattering: a
    # round-5 device trace showed XLA:TPU runs these scatters serially at
    # ~4-7 ns/update regardless of unique_indices (the voxel-buffer +
    # coords + counts scatters cost ~8 ms/step at the bench shape), while a
    # payload sort of the same rows costs ~1 ms and the buffer then falls
    # out of a row GATHER (~1.5 ns/row).
    n_valid = valid_s.sum()
    # smallest first-position strictly after p (reverse cummin)
    fpos = jnp.where(first, jnp.arange(n, dtype=jnp.int32), n)
    nxt = jax.lax.associative_scan(jnp.minimum, fpos, reverse=True)
    nxt = jnp.concatenate([nxt[1:], jnp.full((1,), n, jnp.int32)])
    grp_len = jnp.minimum(nxt, n_valid).astype(jnp.int32) \
        - jnp.arange(n, dtype=jnp.int32)                 # valid at firsts
    ckey = jnp.where(first & (slot < max_voxels), slot.astype(jnp.int32),
                     jnp.int32(0x7FFFFFF0))
    _, seg_pos, vid_c, cnt_c = jax.lax.sort(
        (ckey, jnp.arange(n, dtype=jnp.int32), vid_s, grp_len), num_keys=1)
    if n < max_voxels:                                   # tiny-scene pad
        pad = max_voxels - n
        seg_pos = jnp.concatenate([seg_pos, jnp.zeros((pad,), jnp.int32)])
        vid_c = jnp.concatenate([vid_c, jnp.zeros((pad,), vid_c.dtype)])
        cnt_c = jnp.concatenate([cnt_c, jnp.zeros((pad,), jnp.int32)])
    seg_pos = seg_pos[:max_voxels]
    vid_c = vid_c[:max_voxels]
    cnt_c = cnt_c[:max_voxels]

    voxel_valid = jnp.arange(max_voxels) < jnp.minimum(num_voxels_total,
                                                       max_voxels)
    voxel_num_points = jnp.where(
        voxel_valid, jnp.minimum(cnt_c, max_points_per_voxel), 0)

    # voxel buffer by gather from the slot-major sorted points
    points_sorted = points[order]
    src = seg_pos[:, None] + jnp.arange(max_points_per_voxel,
                                        dtype=jnp.int32)[None, :]
    within = (jnp.arange(max_points_per_voxel)[None, :]
              < voxel_num_points[:, None])
    voxels = jnp.where(within[..., None],
                       points_sorted[jnp.clip(src, 0, n - 1)], 0.0)

    # voxel coords decoded arithmetically from the compacted voxel id
    vz = vid_c // (ny * nx)
    vrem = vid_c % (ny * nx)
    voxel_coords = jnp.where(
        voxel_valid[:, None],
        jnp.stack([vz, vrem // nx, vrem % nx], axis=1).astype(jnp.int32), -1)

    # per-ORIGINAL-point voxel slot, uncapped by max_points_per_voxel —
    # the dynamic VFEs (scatter over ALL in-range points, reference
    # dynamic_mean_vfe.py:52-66) segment-reduce over this
    point_slot = jnp.full((n,), max_voxels, jnp.int32).at[order].set(
        jnp.where(voxel_ok, slot, max_voxels).astype(jnp.int32),
        unique_indices=True)   # order is a permutation

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
