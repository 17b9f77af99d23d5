"""RoI pooling ops: RoI-aware voxel pooling (PartA2) and RoI point pooling
(PointRCNN) — TPU-native equivalents of the reference CUDA extensions.

Parity surfaces:
  - roiaware_pool3d (pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu
    :111-160 roiaware_max/avgpool3d): divide each rotated ROI into a G³
    grid and max/avg-pool the features of the points falling in each cell.
  - roipoint_pool3d (pcdet/ops/roipoint_pool3d/src/roipoint_pool3d_kernel.cu
    :38-103): sample a fixed number of raw points (+features) per ROI, with
    an empty flag.

TPU-first: both are one (N points × R rois) membership pass (VPU) feeding a
segment scatter (roiaware) or a fixed-capacity ordered compaction
(roipoint) — fixed shapes, no atomics, fully jittable and vmappable over
the batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rotate_to_local(points, boxes):
    """points (N, 3), boxes (R, 7) → local coords (N, R, 3) in each box
    frame (centered, yaw-aligned)."""
    shift = points[:, None, :] - boxes[None, :, 0:3]           # (N, R, 3)
    cosa = jnp.cos(-boxes[:, 6])[None, :]
    sina = jnp.sin(-boxes[:, 6])[None, :]
    lx = shift[..., 0] * cosa - shift[..., 1] * sina
    ly = shift[..., 0] * sina + shift[..., 1] * cosa
    return jnp.stack([lx, ly, shift[..., 2]], axis=-1)


@partial(jax.jit, static_argnames=('out_size', 'pool_method'))
def roiaware_pool3d(points, point_features, rois, points_valid=None,
                    rois_valid=None, out_size: int = 12,
                    pool_method: str = 'max'):
    """points (N, 3); point_features (N, C); rois (R, 7).
    Returns (R, G, G, G, C) pooled features (zeros for empty cells)."""
    n = points.shape[0]
    r = rois.shape[0]
    c = point_features.shape[-1]
    g = out_size
    local = _rotate_to_local(points, rois)                      # (N, R, 3)
    dims = rois[None, :, 3:6]                                   # l, w, h
    inside = (jnp.abs(local[..., 0]) <= dims[..., 0] / 2) & \
             (jnp.abs(local[..., 1]) <= dims[..., 1] / 2) & \
             (jnp.abs(local[..., 2]) <= dims[..., 2] / 2)
    if points_valid is not None:
        inside &= points_valid[:, None]
    if rois_valid is not None:
        inside &= rois_valid[None, :]
    # cell index per (point, roi): local + half-dims → [0, dim) → * G / dim
    rel = local + dims / 2
    cell = jnp.floor(rel / jnp.maximum(dims, 1e-6) * g).astype(jnp.int32)
    cell = jnp.clip(cell, 0, g - 1)
    flat = (cell[..., 0] * g * g + cell[..., 1] * g + cell[..., 2])  # x,y,z
    seg = jnp.where(inside, jnp.arange(r)[None, :] * (g ** 3) + flat,
                    r * g ** 3)                                  # (N, R)
    seg = seg.reshape(-1)
    feats = jnp.broadcast_to(point_features[:, None, :],
                             (n, r, c)).reshape(-1, c)
    if pool_method == 'max':
        neg = jnp.finfo(point_features.dtype).min
        out = jnp.full((r * g ** 3 + 1, c), neg, point_features.dtype)
        out = out.at[seg].max(feats, mode='drop')
        out = jnp.where(out == neg, 0.0, out)
    else:  # avg
        out = jnp.zeros((r * g ** 3 + 1, c), point_features.dtype)
        out = out.at[seg].add(feats, mode='drop')
        cnt = jnp.zeros((r * g ** 3 + 1,), point_features.dtype)
        cnt = cnt.at[seg].add(1.0, mode='drop')
        out = out / jnp.maximum(cnt[:, None], 1.0)
    return out[:-1].reshape(r, g, g, g, c)


@partial(jax.jit, static_argnames=('num_sampled_points',))
def roipoint_pool3d(points, point_features, rois, points_valid=None,
                    rois_valid=None, num_sampled_points: int = 512,
                    extra_width=(0.0, 0.0, 0.0)):
    """Pool a fixed number of raw points (+features) per ROI.

    Returns (pooled (R, S, 3+C) [xyz | features], empty_flag (R,) bool).
    Points are taken in their original order (the CUDA kernel's first-S
    semantics); rois with fewer than S members wrap-repeat their members
    (the kernel duplicates the first point — wrap-repeat keeps more
    geometry and identical downstream semantics since order is arbitrary).
    """
    n = points.shape[0]
    r = rois.shape[0]
    s = num_sampled_points
    ext = jnp.asarray(extra_width)
    rois_ext = rois.at[:, 3:6].add(ext) if extra_width is not None else rois
    local = _rotate_to_local(points, rois_ext)
    dims = rois_ext[None, :, 3:6]
    inside = (jnp.abs(local[..., 0]) <= dims[..., 0] / 2) & \
             (jnp.abs(local[..., 1]) <= dims[..., 1] / 2) & \
             (jnp.abs(local[..., 2]) <= dims[..., 2] / 2)
    if points_valid is not None:
        inside &= points_valid[:, None]
    if rois_valid is not None:
        inside &= rois_valid[None, :]
    inside_t = inside.T                                         # (R, N)
    counts = inside_t.sum(-1)                                   # (R,)
    # ordered compaction: rank of each member within its roi
    rank = jnp.cumsum(inside_t, axis=-1) - 1                    # (R, N)
    slot = jnp.where(inside_t, rank, s)
    slot = jnp.where(slot < s, slot, s)
    gathered = jnp.concatenate([points, point_features], axis=-1)  # (N, 3+C)
    out = jnp.zeros((r, s + 1, gathered.shape[-1]), gathered.dtype)
    ridx = jnp.broadcast_to(jnp.arange(r)[:, None], (r, n))
    pidx = jnp.broadcast_to(jnp.arange(n)[None, :], (r, n))
    out = out.at[ridx, slot].set(gathered[pidx], mode='drop')
    out = out[:, :s]
    # wrap-repeat members for under-full rois
    idx = jnp.arange(s)[None, :] % jnp.maximum(counts[:, None], 1)
    out = jnp.take_along_axis(out, idx[..., None], axis=1)
    empty = counts == 0
    out = jnp.where(empty[:, None, None], 0.0, out)
    return out, empty
