"""Points-in-rotated-boxes tests + per-box point statistics.

TPU-native replacement for ``pcdet/ops/roiaware_pool3d`` (kernels
``points_in_boxes_kernel`` / ``generate_pts_mask_for_box3d`` at
``src/roiaware_pool3d_kernel.cu:313,39``; Python
``roiaware_pool3d_utils.points_in_boxes_cpu/gpu``), plus the fused per-box
count / density statistics the AL layer needs
(``detector3d_template.py:249-267,379-387`` — gt point stats and
``pred_box_unique_density``).

The CUDA version assigns one thread per (box, point); here the whole (N, M)
membership matrix is one fused XLA elementwise kernel — no gather/scatter, no
atomics.  Fixed shapes: padded points carry a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _in_box_local(px, py, pz, box):
    """Membership of points (broadcast) in one (7,) box."""
    shift_x = px - box[0]
    shift_y = py - box[1]
    shift_z = pz - box[2]
    cosa = jnp.cos(-box[6])
    sina = jnp.sin(-box[6])
    local_x = shift_x * cosa - shift_y * sina
    local_y = shift_x * sina + shift_y * cosa
    return ((jnp.abs(shift_z) <= box[5] / 2.0)
            & (jnp.abs(local_x) <= box[3] / 2.0)
            & (jnp.abs(local_y) <= box[4] / 2.0))


@jax.jit
def points_in_boxes(points, boxes):
    """(N, 3+) points, (M, 7) boxes → (N, M) bool membership matrix."""
    px, py, pz = points[:, 0:1], points[:, 1:2], points[:, 2:3]
    cosa = jnp.cos(-boxes[:, 6])[None, :]
    sina = jnp.sin(-boxes[:, 6])[None, :]
    shift_x = px - boxes[None, :, 0]
    shift_y = py - boxes[None, :, 1]
    shift_z = pz - boxes[None, :, 2]
    local_x = shift_x * cosa - shift_y * sina
    local_y = shift_x * sina + shift_y * cosa
    return ((jnp.abs(shift_z) <= boxes[None, :, 5] / 2.0)
            & (jnp.abs(local_x) <= boxes[None, :, 3] / 2.0)
            & (jnp.abs(local_y) <= boxes[None, :, 4] / 2.0))


@jax.jit
def points_in_boxes_index(points, boxes, points_valid=None, boxes_valid=None):
    """First-box index per point, −1 for background.

    Parity: ``points_in_boxes_gpu`` returning box_idxs_of_pts.
    """
    member = points_in_boxes(points, boxes)
    if points_valid is not None:
        member &= points_valid[:, None]
    if boxes_valid is not None:
        member &= boxes_valid[None, :]
    any_box = member.any(axis=1)
    first = jnp.argmax(member, axis=1)
    return jnp.where(any_box, first, -1).astype(jnp.int32)


@jax.jit
def points_count_per_box(points, boxes, points_valid=None, boxes_valid=None):
    """(M,) number of (valid) points inside each (valid) box."""
    member = points_in_boxes(points, boxes)
    if points_valid is not None:
        member &= points_valid[:, None]
    counts = member.sum(axis=0).astype(jnp.float32)
    if boxes_valid is not None:
        counts = jnp.where(boxes_valid, counts, 0.0)
    return counts


@jax.jit
def box_point_density(points, boxes, points_valid=None, boxes_valid=None):
    """Per-box "unique density" = #points inside / box volume.

    Parity: ``detector3d_template.py:379-387`` (``pred_box_unique_density``) —
    the CRB stage-3 signal.
    """
    counts = points_count_per_box(points, boxes, points_valid, boxes_valid)
    volume = boxes[:, 3] * boxes[:, 4] * boxes[:, 5]
    dens = counts / jnp.clip(volume, 1e-6)
    if boxes_valid is not None:
        dens = jnp.where(boxes_valid, dens, 0.0)
    return dens


@jax.jit
def box_point_stats(points, boxes, points_valid=None, boxes_valid=None):
    """Fused per-frame gt point statistics for the AL dashboards.

    Parity: ``detector3d_template.py:249-267`` — per-box point counts plus the
    mean/median/variance over valid boxes.
    Returns dict(counts (M,), mean (), median (), var ()).
    """
    counts = points_count_per_box(points, boxes, points_valid, boxes_valid)
    if boxes_valid is None:
        boxes_valid = jnp.ones(boxes.shape[0], bool)
    nvalid = jnp.clip(boxes_valid.sum(), 1)
    mean = jnp.sum(jnp.where(boxes_valid, counts, 0.0)) / nvalid
    var = jnp.sum(jnp.where(boxes_valid, (counts - mean) ** 2, 0.0)) / nvalid
    # masked median: sort with invalid pushed to +inf, take middle of valid
    sorted_counts = jnp.sort(jnp.where(boxes_valid, counts, jnp.inf))
    median = sorted_counts[jnp.clip((nvalid - 1) // 2, 0, boxes.shape[0] - 1)]
    return {'counts': counts, 'mean': mean, 'median': median, 'var': var}


def points_in_boxes_numpy(points, boxes):
    """Host-side numpy (N, M) membership (augmentor / gt-database path).

    Parity: ``roiaware_pool3d_utils.points_in_boxes_cpu``.
    """
    px, py, pz = points[:, 0:1], points[:, 1:2], points[:, 2:3]
    cosa = np.cos(-boxes[:, 6])[None, :]
    sina = np.sin(-boxes[:, 6])[None, :]
    shift_x = px - boxes[None, :, 0]
    shift_y = py - boxes[None, :, 1]
    shift_z = pz - boxes[None, :, 2]
    local_x = shift_x * cosa - shift_y * sina
    local_y = shift_x * sina + shift_y * cosa
    return ((np.abs(shift_z) <= boxes[None, :, 5] / 2.0)
            & (np.abs(local_x) <= boxes[None, :, 3] / 2.0)
            & (np.abs(local_y) <= boxes[None, :, 4] / 2.0))
