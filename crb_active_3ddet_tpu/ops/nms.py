"""Fixed-shape rotated NMS — TPU-native replacement for the reference CUDA
bitmask NMS (``pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu:267`` ``nms_kernel``
with ``THREADS_PER_BLOCK_NMS=64`` bitmasks; Python surface
``iou3d_nms_utils.nms_gpu``/``nms_normal_gpu`` and
``model_nms_utils.class_agnostic_nms``/``multi_classes_nms``).

Design: exact greedy NMS as a ``lax.while_loop`` that each iteration picks
the highest-scoring survivor and suppresses via ONE vectorized rotated-IoU
row computed on the fly.  This is the canonical TPU shape: no O(K²) IoU
matrix in HBM, iterations bounded by the number of kept boxes (early exit),
all per-iteration work is a K-wide VPU sweep.  (A first implementation used
a K-step suppression scan over a precomputed K×K matrix — 4096 sequential
steps made eval ~17 s/frame and tripped the TPU worker watchdog.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .iou3d import _corners_xy, _overlap_pairs, boxes3d_nearest_bev_iou

_NEG_INF = -1e10


def _iou_row_bev(boxes, areas, i):
    """Rotated BEV IoU of box i vs all boxes. boxes: (K, 7); returns (K,)."""
    cx, cy = _corners_xy(boxes)                      # (K, 4)
    ci_x = jax.lax.dynamic_slice_in_dim(cx, i, 1, 0)  # (1, 4)
    ci_y = jax.lax.dynamic_slice_in_dim(cy, i, 1, 0)
    k = boxes.shape[0]
    ax = jnp.broadcast_to(ci_x, (k, 4)).T            # (4, K)
    ay = jnp.broadcast_to(ci_y, (k, 4)).T
    overlap = _overlap_pairs(ax, ay, cx.T, cy.T)     # (K,)
    area_i = jax.lax.dynamic_slice_in_dim(areas, i, 1, 0)[0]
    return overlap / jnp.clip(area_i + areas - overlap, 1e-8)


@partial(jax.jit, static_argnames=('pre_max', 'post_max', 'use_bev_iou'))
def rotated_nms(boxes, scores, iou_thresh: float, pre_max: int, post_max: int,
                score_thresh: float | None = None, use_bev_iou: bool = True):
    """Rotated NMS over padded boxes.

    Args:
        boxes: (N, 7) — padded rows allowed (give them score=-inf or use
            score_thresh masking).
        scores: (N,) — -inf rows are treated as invalid padding.
        iou_thresh: suppression threshold (rotated BEV IoU, like the CUDA
            ``nms_gpu``).
        pre_max / post_max: NMS_PRE_MAXSIZE / NMS_POST_MAXSIZE — static.

    Returns:
        keep_idx: (post_max,) int32 indices into the input (padded with 0),
        keep_valid: (post_max,) bool,
        keep_scores: (post_max,) scores of kept boxes (−inf on padding).
    """
    n = boxes.shape[0]
    if score_thresh is not None:
        scores = jnp.where(scores >= score_thresh, scores, _NEG_INF)
    k = min(pre_max, n)
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    areas = top_boxes[:, 3] * top_boxes[:, 4]

    if not use_bev_iou:
        aabb_iou = boxes3d_nearest_bev_iou(top_boxes, top_boxes)

    def iou_row(i):
        if use_bev_iou:
            return _iou_row_bev(top_boxes, areas, i)
        return jax.lax.dynamic_slice_in_dim(aabb_iou, i, 1, 0)[0]

    def cond(state):
        count, live_scores, *_ = state
        return (count < post_max) & (live_scores.max() > _NEG_INF / 2)

    def body(state):
        count, live_scores, keep_idx, keep_valid, keep_scores = state
        i = jnp.argmax(live_scores).astype(jnp.int32)
        row = iou_row(i)
        suppress = row > iou_thresh
        new_scores = jnp.where(suppress, _NEG_INF, live_scores)
        new_scores = new_scores.at[i].set(_NEG_INF)
        keep_idx = keep_idx.at[count].set(order[i].astype(jnp.int32))
        keep_valid = keep_valid.at[count].set(True)
        keep_scores = keep_scores.at[count].set(live_scores[i])
        return count + 1, new_scores, keep_idx, keep_valid, keep_scores

    init = (jnp.asarray(0, jnp.int32), top_scores,
            jnp.zeros((post_max,), jnp.int32),
            jnp.zeros((post_max,), bool),
            jnp.full((post_max,), _NEG_INF, scores.dtype))
    _, _, keep_idx, keep_valid, keep_scores = jax.lax.while_loop(
        cond, body, init)
    return keep_idx, keep_valid, keep_scores


@partial(jax.jit, static_argnames=('pre_max', 'post_max'))
def nms_normal(boxes, scores, iou_thresh: float, pre_max: int, post_max: int):
    """Axis-aligned-snapped NMS (parity: ``nms_normal_gpu``)."""
    return rotated_nms(boxes, scores, iou_thresh, pre_max, post_max,
                       use_bev_iou=False)


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None):
    """Parity with ``model_nms_utils.class_agnostic_nms`` (`model_nms_utils.py:6-37`)
    under fixed shapes."""
    return rotated_nms(
        box_preds, box_scores,
        iou_thresh=float(nms_config.NMS_THRESH),
        pre_max=int(nms_config.NMS_PRE_MAXSIZE),
        post_max=int(nms_config.NMS_POST_MAXSIZE),
        score_thresh=score_thresh,
    )


def multi_classes_nms(cls_scores, box_preds, nms_config, score_thresh=None):
    """Per-class NMS (parity: ``model_nms_utils.multi_classes_nms:40-67``)."""
    import jax.numpy as jnp
    num_classes = cls_scores.shape[1]
    post = int(nms_config.NMS_POST_MAXSIZE)
    out_scores, out_boxes, out_valid, out_labels = [], [], [], []
    for c in range(num_classes):
        s = cls_scores[:, c]
        b = box_preds if box_preds.ndim == 2 else box_preds[:, c]
        idx, valid, scores = rotated_nms(
            b, s, float(nms_config.NMS_THRESH),
            int(nms_config.NMS_PRE_MAXSIZE), post,
            score_thresh=score_thresh)
        out_scores.append(scores)
        out_boxes.append(b[idx])
        out_valid.append(valid)
        out_labels.append(jnp.full((post,), c + 1, jnp.int32))
    return (jnp.stack(out_scores), jnp.stack(out_labels),
            jnp.stack(out_boxes), jnp.stack(out_valid))
