"""Fixed-shape rotated NMS — TPU-native replacement for the reference CUDA
bitmask NMS (``pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu:267`` ``nms_kernel``
with ``THREADS_PER_BLOCK_NMS=64`` bitmasks; Python surface
``iou3d_nms_utils.nms_gpu``/``nms_normal_gpu`` and
``model_nms_utils.class_agnostic_nms``/``multi_classes_nms``).

The CUDA version builds 64-bit suppression bitmasks and walks them on the
host, producing a variable-length keep list.  Here the keep list is a
fixed-size (post_max,) index buffer + validity count: we compute the (K, K)
pairwise IoU matrix once (one big fused XLA kernel, MXU-friendly shapes) and
run the greedy suppression scan as a ``lax.fori_loop`` of vector ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .iou3d import boxes_iou_bev, boxes3d_nearest_bev_iou

_NEG_INF = -1e10


def _greedy_suppress(iou, valid):
    """Greedy NMS scan. iou: (K, K) of score-sorted boxes; valid: (K,) bool.
    Returns keep mask (K,)."""
    k = iou.shape[0]
    tri = jnp.triu(jnp.ones((k, k), bool), 1)  # j > i

    def body_fn(i, suppressed):
        alive_i = jnp.logical_not(suppressed[i]) & valid[i]
        new_sup = suppressed | (alive_i & iou[i] & tri[i])
        return new_sup

    suppressed = jax.lax.fori_loop(0, k, body_fn, jnp.zeros((k,), bool))
    return jnp.logical_not(suppressed) & valid


@partial(jax.jit, static_argnames=('pre_max', 'post_max', 'use_bev_iou'))
def rotated_nms(boxes, scores, iou_thresh: float, pre_max: int, post_max: int,
                score_thresh: float | None = None, use_bev_iou: bool = True):
    """Rotated NMS over padded boxes.

    Args:
        boxes: (N, 7) — padded rows allowed (give them score=-inf or use
            score_thresh masking).
        scores: (N,) — -inf rows are treated as invalid padding.
        iou_thresh: suppression threshold (rotated BEV IoU, like the CUDA
            ``nms_gpu``; ``iou3d_nms_kernel.cu`` computes BEV overlap IoU).
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
    valid = top_scores > _NEG_INF / 2

    if use_bev_iou:
        # row-chunked rotated IoU: bounds the polygon-clip workspace to
        # (chunk, K) pairs at a time; only the thresholded bool matrix
        # persists (a full (K, K) f32 clip workspace at K=4096 would be
        # hundreds of GB)
        chunk = min(256, k)
        pad = (-k) % chunk
        rows = jnp.pad(top_boxes, ((0, pad), (0, 0))).reshape(-1, chunk, 7)
        iou_hit = jax.lax.map(
            lambda blk: boxes_iou_bev(blk, top_boxes) > iou_thresh,
            rows).reshape(-1, k)[:k]
    else:
        iou_hit = boxes3d_nearest_bev_iou(top_boxes, top_boxes) > iou_thresh
    keep = _greedy_suppress(iou_hit, valid)

    # compact kept (score-sorted already) into fixed (post_max,) buffer
    rank = jnp.cumsum(keep) - 1
    rank = jnp.where(keep & (rank < post_max), rank, post_max)
    keep_idx = jnp.zeros((post_max,), jnp.int32).at[rank].set(
        order.astype(jnp.int32), mode='drop')
    keep_scores = jnp.full((post_max,), _NEG_INF, scores.dtype).at[rank].set(
        top_scores, mode='drop')
    keep_valid = jnp.zeros((post_max,), bool).at[rank].set(True, mode='drop')
    return keep_idx, keep_valid, keep_scores


@partial(jax.jit, static_argnames=('pre_max', 'post_max'))
def nms_normal(boxes, scores, iou_thresh: float, pre_max: int, post_max: int):
    """Axis-aligned-snapped NMS (parity: ``nms_normal_gpu``)."""
    return rotated_nms(boxes, scores, iou_thresh, pre_max, post_max,
                       use_bev_iou=False)


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None):
    """Parity with ``model_nms_utils.class_agnostic_nms`` (`model_nms_utils.py:6-37`)
    under fixed shapes.

    Returns (selected_idx, selected_valid, selected_scores) each of length
    NMS_POST_MAXSIZE.
    """
    return rotated_nms(
        box_preds, box_scores,
        iou_thresh=float(nms_config.NMS_THRESH),
        pre_max=int(nms_config.NMS_PRE_MAXSIZE),
        post_max=int(nms_config.NMS_POST_MAXSIZE),
        score_thresh=score_thresh,
    )


def multi_classes_nms(cls_scores, box_preds, nms_config, score_thresh=None):
    """Per-class NMS (parity: ``model_nms_utils.multi_classes_nms:40-67``).

    cls_scores: (N, num_classes); box_preds: (N, 7) or (N, num_classes, 7).
    Returns per-class fixed-size results stacked:
        scores (C, post), labels (C, post), boxes (C, post, 7), valid (C, post).
    """
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
