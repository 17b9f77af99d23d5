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


def _pairwise_iou_bev(boxes, areas, block: int = 512):
    """(K, K) rotated BEV IoU, computed in row blocks to bound VMEM."""
    k = boxes.shape[0]
    cx, cy = _corners_xy(boxes)                      # (K, 4)
    nb = -(-k // block)
    pad = nb * block - k
    cxp = jnp.pad(cx, ((0, pad), (0, 0)))
    cyp = jnp.pad(cy, ((0, pad), (0, 0)))
    areap = jnp.pad(areas, (0, pad))

    def rows(i0):
        ax = jax.lax.dynamic_slice_in_dim(cxp, i0, block, 0)   # (B, 4)
        ay = jax.lax.dynamic_slice_in_dim(cyp, i0, block, 0)
        a_area = jax.lax.dynamic_slice_in_dim(areap, i0, block, 0)
        ov = jax.vmap(lambda x, y: _overlap_pairs(
            jnp.broadcast_to(x[:, None], (4, k)),
            jnp.broadcast_to(y[:, None], (4, k)), cx.T, cy.T))(ax, ay)
        return ov / jnp.clip(a_area[:, None] + areas[None, :] - ov, 1e-8)

    # lax.map (not a Python loop): one traced copy of the clip kernel keeps
    # the HLO small — the unrolled form blew up compile times noticeably
    out = jax.lax.map(rows, jnp.arange(nb, dtype=jnp.int32) * block)
    return out.reshape(nb * block, k)[:k]


def _suppress_fixpoint_packed(o_lower, rounds: int):
    """Greedy-NMS fixpoint on a bit-packed suppression matrix.

    o_lower: (K, K) bool with [i, j] = True iff j < i, both alive, and
    iou(i, j) > thresh.  Returns keep (K,) bool — the unique greedy
    solution of keep_i = NOT OR_j (o_lower[i, j] & keep_j).

    Bit-packing the columns into uint32 words makes each fixpoint round a
    (K, K/32) word AND + reduce (~0.5 MB at K=2048) instead of a (K, K)
    bool matvec (4 MB) — and the while_loop exits as soon as the keep set
    stops changing (real suppression chains converge in <10 rounds).
    """
    k = o_lower.shape[0]
    w = -(-k // 32)
    pad = w * 32 - k
    powers = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
    bits = jnp.pad(o_lower, ((0, 0), (0, pad)))
    words = (bits.reshape(k, w, 32).astype(jnp.uint32)
             * powers).sum(-1).astype(jnp.uint32)

    def pack(keep):
        kb = jnp.pad(keep, (0, pad)).reshape(w, 32)
        return (kb.astype(jnp.uint32) * powers).sum(-1).astype(jnp.uint32)

    def cond(state):
        r, _, changed = state
        return changed & (r < rounds)

    def body(state):
        r, keep, _ = state
        kw = pack(keep)
        new = ~((words & kw[None, :]) != 0).any(-1)
        return r + 1, new, (new != keep).any()

    _, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), jnp.ones((k,), bool),
                     jnp.asarray(True)))
    return keep


@partial(jax.jit, static_argnames=('pre_max', 'post_max', 'rounds',
                                   'matrix_cap'))
def rotated_nms_matrix(boxes, scores, iou_thresh: float, pre_max: int,
                       post_max: int, score_thresh: float | None = None,
                       rounds: int = 32, matrix_cap: int = 2048):
    """EXACT greedy NMS via fixpoint iteration — no sequential while loop.

    Greedy's keep-set is the unique solution of
        keep_i = NOT OR_{j<i, iou(i,j)>t} keep_j       (score-descending i)
    which converges from any start in D rounds, where D is the longest
    suppression chain (keep→suppress alternations).  Each round is one
    boolean matvec over the (pre_max, pre_max) IoU>t matrix — O(rounds·K²)
    vector ops instead of post_max sequential loop iterations (a device
    trace showed the while-loop NMS at ~24 ms/iteration under vmap — the
    dominant cost of the whole CRB stage 2).

    ``rounds`` bounds the chain length handled exactly; real suppression
    chains are short (<10 even at train thresholds) — parity with the
    while-loop implementation is pinned by tests over random box sets.

    Same contract as :func:`rotated_nms`.  The matrix width is
    ``min(pre_max, matrix_cap)`` — boxes ranked below it never enter the
    kept set.  This deviates from the while-loop version only when more
    than ``matrix_cap − post_max`` of the top-``matrix_cap`` boxes get
    suppressed (suppression rates at real thresholds are far below that;
    raise ``matrix_cap`` to tighten).
    """
    n = boxes.shape[0]
    if score_thresh is not None:
        scores = jnp.where(scores >= score_thresh, scores, _NEG_INF)
    k = min(pre_max, n, matrix_cap)
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    areas = top_boxes[:, 3] * top_boxes[:, 4]
    alive = top_scores > _NEG_INF / 2

    if jax.default_backend() == 'tpu':
        # Pallas clip kernel: all Sutherland–Hodgman intermediates stay in
        # VMEM (the XLA path's per-stage compaction sorts round-trip multi-
        # GB intermediates through HBM at this size — ~250x slower on chip)
        from .pallas_overlap import boxes_overlap_bev_pallas
        overlap = boxes_overlap_bev_pallas(top_boxes, top_boxes)
        iou = overlap / jnp.clip(areas[:, None] + areas[None, :] - overlap,
                                 1e-8)
    else:
        iou = _pairwise_iou_bev(top_boxes, areas)
    idx = jnp.arange(k)
    o_lower = (iou > iou_thresh) & (idx[None, :] < idx[:, None]) \
        & alive[None, :] & alive[:, None]
    keep = _suppress_fixpoint_packed(o_lower, rounds)
    keep &= alive

    # kept boxes in score order, capped at post_max
    kept_scores = jnp.where(keep, top_scores, _NEG_INF)
    keep_scores, kidx = jax.lax.top_k(kept_scores, min(post_max, k))
    keep_valid = keep_scores > _NEG_INF / 2
    keep_idx = jnp.where(keep_valid, order[kidx], 0).astype(jnp.int32)
    if post_max > k:
        pad = post_max - k
        keep_idx = jnp.concatenate([keep_idx, jnp.zeros((pad,), jnp.int32)])
        keep_valid = jnp.concatenate([keep_valid, jnp.zeros((pad,), bool)])
        keep_scores = jnp.concatenate(
            [keep_scores, jnp.full((pad,), _NEG_INF, keep_scores.dtype)])
    return keep_idx, keep_valid, jnp.where(keep_valid, keep_scores, _NEG_INF)


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None):
    """Parity with ``model_nms_utils.class_agnostic_nms`` (`model_nms_utils.py:6-37`)
    under fixed shapes.  Runs the fixpoint matrix formulation — a device
    trace showed the sequential greedy loop at ~24 ms/iteration under vmap
    (13 s per CRB stage-2 chunk)."""
    return rotated_nms_matrix(
        box_preds, box_scores,
        iou_thresh=float(nms_config.NMS_THRESH),
        pre_max=int(nms_config.NMS_PRE_MAXSIZE),
        post_max=int(nms_config.NMS_POST_MAXSIZE),
        score_thresh=score_thresh,
        matrix_cap=int(nms_config.get('MATRIX_CAP', 2048)),
    )


def multi_classes_nms(cls_scores, box_preds, nms_config, score_thresh=None):
    """Per-class NMS (parity: ``model_nms_utils.multi_classes_nms:40-67``).

    Returns stacked (C, post) scores/labels/valid/idx and (C, post, D) boxes
    — the caller flattens to the reference's concatenated per-class layout.
    ``idx`` indexes the source anchor row (for logits export).
    """
    import jax.numpy as jnp
    num_classes = cls_scores.shape[1]
    post = int(nms_config.NMS_POST_MAXSIZE)
    out = {'scores': [], 'boxes': [], 'valid': [], 'labels': [], 'idx': []}
    for c in range(num_classes):
        s = cls_scores[:, c]
        b = box_preds if box_preds.ndim == 2 else box_preds[:, c]
        idx, valid, scores = rotated_nms_matrix(
            b[:, :7], s, float(nms_config.NMS_THRESH),
            int(nms_config.NMS_PRE_MAXSIZE), post,
            score_thresh=score_thresh,
            matrix_cap=int(nms_config.get('MATRIX_CAP', 2048)))
        out['scores'].append(scores)
        out['boxes'].append(b[idx])
        out['valid'].append(valid)
        out['labels'].append(jnp.full((post,), c + 1, jnp.int32))
        out['idx'].append(idx)
    return (jnp.stack(out['scores']), jnp.stack(out['labels']),
            jnp.stack(out['boxes']), jnp.stack(out['valid']),
            jnp.stack(out['idx']))
