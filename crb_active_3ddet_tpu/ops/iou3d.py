"""Rotated BEV overlap / IoU — TPU-native replacement for the reference CUDA
extension ``pcdet/ops/iou3d_nms`` (kernels ``boxes_overlap_kernel``,
``boxes_iou_bev_kernel`` at ``src/iou3d_nms_kernel.cu:236,251``; Python surface
``iou3d_nms_utils.boxes_bev_iou_cpu/boxes_iou_bev/boxes_iou3d_gpu``).

Instead of per-pair scalar CUDA threads doing Sutherland–Hodgman clipping with
dynamic vertex lists, we run the same polygon clip **vectorized over all pairs**
with fixed-capacity (8-vertex) padded polygons + validity counts — pure XLA,
fully jittable and vmappable, so the (N, M) IoU matrix is one fused kernel.

Box convention: (x, y, z, dx, dy, dz, heading) — see utils/box_utils.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-8
_CAP = 8  # max vertices of the intersection of two convex quads


def _box_corners_bev(box):
    """(7,) box → (4, 2) CCW BEV corners."""
    dx2, dy2 = box[3] / 2.0, box[4] / 2.0
    # CCW local corners: (+,+), (-,+), (-,-), (+,-)
    lx = jnp.array([1.0, -1.0, -1.0, 1.0]) * dx2
    ly = jnp.array([1.0, 1.0, -1.0, -1.0]) * dy2
    cosa, sina = jnp.cos(box[6]), jnp.sin(box[6])
    cx = lx * cosa - ly * sina + box[0]
    cy = lx * sina + ly * cosa + box[1]
    return jnp.stack([cx, cy], axis=-1)


def _cross2(o, a, b):
    """2D cross product (a - o) x (b - o), broadcasting over leading dims."""
    return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
            - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))


def _clip_halfplane(poly, n, e1, e2):
    """Clip padded CCW polygon (poly: (CAP,2), count n) by halfplane left of
    directed edge e1→e2. Returns (new_poly, new_n). Fixed shapes throughout."""
    idx = jnp.arange(_CAP)
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    v = poly
    vn = poly[nxt]
    d = _cross2(e1, e2, v)    # signed dist of v  (>=0 == inside for CCW)
    dn = _cross2(e1, e2, vn)  # signed dist of next vertex
    inside = d >= 0
    inside_n = dn >= 0
    denom = d - dn
    t = d / jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    x = v + t[:, None] * (vn - v)  # edge/line intersection points
    is_valid = idx < n
    emit_v = inside & is_valid
    emit_x = (inside != inside_n) & is_valid
    # interleave [v0, x0, v1, x1, ...] then compact the emitted ones
    cand = jnp.stack([v, x], axis=1).reshape(2 * _CAP, 2)
    flags = jnp.stack([emit_v, emit_x], axis=1).reshape(2 * _CAP)
    pos = jnp.cumsum(flags) - 1
    pos = jnp.where(flags, pos, 2 * _CAP)  # out-of-range → dropped by scatter
    out = jnp.zeros((_CAP, 2), poly.dtype).at[pos].set(cand, mode='drop')
    return out, flags.sum()


def _poly_area(poly, n):
    """Shoelace area of padded CCW polygon."""
    idx = jnp.arange(_CAP)
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    v, vn = poly, poly[nxt]
    terms = v[:, 0] * vn[:, 1] - vn[:, 0] * v[:, 1]
    return 0.5 * jnp.abs(jnp.sum(jnp.where(idx < n, terms, 0.0)))


def _pair_overlap_bev(box_a, box_b):
    """Intersection area of two rotated BEV rectangles ((7,) boxes)."""
    ca = _box_corners_bev(box_a)
    cb = _box_corners_bev(box_b)
    poly = jnp.zeros((_CAP, 2), ca.dtype).at[:4].set(ca)
    n = jnp.asarray(4, jnp.int32)
    for i in range(4):
        poly, n = _clip_halfplane(poly, n, cb[i], cb[(i + 1) % 4])
    return _poly_area(poly, n)


@jax.jit
def boxes_overlap_bev(boxes_a, boxes_b):
    """(N, 7), (M, 7) → (N, M) rotated BEV intersection areas.

    Parity: ``iou3d_nms_cuda.boxes_overlap_bev_gpu``.
    """
    f = jax.vmap(jax.vmap(_pair_overlap_bev, in_axes=(None, 0)), in_axes=(0, None))
    return f(boxes_a, boxes_b)


@jax.jit
def boxes_iou_bev(boxes_a, boxes_b):
    """(N, 7), (M, 7) → (N, M) rotated BEV IoU.

    Parity: ``iou3d_nms_utils.boxes_iou_bev`` / ``boxes_iou_bev_cpu``.
    """
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, _EPS)


@jax.jit
def boxes_iou3d(boxes_a, boxes_b):
    """(N, 7), (M, 7) → (N, M) 3D IoU with BEV rotated overlap × z overlap.

    Parity: ``iou3d_nms_utils.boxes_iou3d_gpu`` (`iou3d_nms_utils.py:48-81`).
    """
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)
    a_top = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_bot = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_top = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_bot = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    overlap_h = jnp.clip(jnp.minimum(a_top, b_top) - jnp.maximum(a_bot, b_bot), 0.0)
    overlap_3d = overlap_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, _EPS)


@jax.jit
def boxes3d_nearest_bev_iou(boxes_a, boxes_b):
    """Axis-aligned BEV IoU after snapping each heading to the nearest axis.

    Parity: ``box_utils.boxes3d_nearest_bev_iou`` (used by the axis-aligned
    anchor target assigner).  Snapping swaps dx/dy when the heading is closer
    to ±π/2; the IoU is then plain axis-aligned.
    """
    def to_aabb(b):
        rot = jnp.abs(jnp.mod(b[:, 6], jnp.pi))
        swap = (rot > jnp.pi / 4) & (rot < 3 * jnp.pi / 4)
        dx = jnp.where(swap, b[:, 4], b[:, 3])
        dy = jnp.where(swap, b[:, 3], b[:, 4])
        return jnp.stack([b[:, 0] - dx / 2, b[:, 1] - dy / 2,
                          b[:, 0] + dx / 2, b[:, 1] + dy / 2], axis=1)

    aa, bb = to_aabb(boxes_a), to_aabb(boxes_b)
    x_min = jnp.maximum(aa[:, None, 0], bb[None, :, 0])
    y_min = jnp.maximum(aa[:, None, 1], bb[None, :, 1])
    x_max = jnp.minimum(aa[:, None, 2], bb[None, :, 2])
    y_max = jnp.minimum(aa[:, None, 3], bb[None, :, 3])
    inter = jnp.clip(x_max - x_min, 0) * jnp.clip(y_max - y_min, 0)
    area_a = ((aa[:, 2] - aa[:, 0]) * (aa[:, 3] - aa[:, 1]))[:, None]
    area_b = ((bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1]))[None, :]
    return inter / jnp.clip(area_a + area_b - inter, _EPS)


@partial(jax.jit, static_argnames=('row_chunk',))
def boxes_iou_bev_chunked(boxes_a, boxes_b, row_chunk: int = 256):
    """Row-chunked (N, M) BEV IoU for large N·M (bounds peak memory).

    Uses ``lax.map`` over row blocks so XLA materializes only one
    (row_chunk, M) clip workspace at a time.
    """
    n = boxes_a.shape[0]
    pad = (-n) % row_chunk
    a = jnp.pad(boxes_a, ((0, pad), (0, 0)))
    a = a.reshape(-1, row_chunk, 7)
    out = jax.lax.map(lambda blk: boxes_iou_bev(blk, boxes_b), a)
    return out.reshape(-1, boxes_b.shape[0])[:n]
