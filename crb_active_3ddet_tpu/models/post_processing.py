"""Post-processing: NMS + the AL-rich per-frame outputs, fully jittable.

Parity: ``pcdet/models/detectors/detector3d_template.py:186-409`` — besides
standard class-agnostic NMS this exports the extra signals the query
strategies consume: full classification logits of the kept boxes
(``pred_logits``), per-pred-box point density (``pred_box_unique_density``),
and per-frame gt point statistics.  Fixed shapes: every per-frame output is a
(post_max,)-padded tensor + validity mask (the reference returns ragged
per-frame dicts).

Also implements recall records (``generate_recall_record``,
`detector3d_template.py:411-453`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import nms as nms_ops
from ..ops import iou3d
from ..ops.points_in_boxes import box_point_density


def post_process_frame(cls_preds, box_preds, post_cfg, num_class,
                       normalized=False, points=None, points_valid=None,
                       roi_labels=None, full_cls_scores=None):
    """Single frame. cls_preds: (A, num_class) logits; box_preds: (A, 7+).

    Returns fixed-shape dict: pred_boxes (P, 7), pred_scores (P,),
    pred_labels (P,), pred_logits (P, num_class), pred_valid (P,),
    and pred_box_unique_density (P,) when points are given.
    For two-stage models pass roi_labels (class-agnostic rcnn scores carry
    no class; parity: ``has_class_labels`` path, detector3d_template:332-337)
    and full_cls_scores as the exported pred_logits.
    """
    scores = cls_preds if normalized else jax.nn.sigmoid(cls_preds)
    max_scores = scores.max(axis=-1)
    labels = roi_labels if roi_labels is not None \
        else scores.argmax(axis=-1) + 1
    logits_src = full_cls_scores if full_cls_scores is not None else cls_preds

    nms_cfg = post_cfg.get('NMS_CONFIG', None)
    score_thresh = post_cfg.get('SCORE_THRESH', None)
    if nms_cfg is not None and bool(nms_cfg.get('MULTI_CLASSES_NMS', False)):
        # per-class NMS, concatenated per-class layout (parity:
        # model_nms_utils.multi_classes_nms:40-67 via detector3d_template's
        # MULTI_CLASSES_NMS branch). Output width = C·post_max.
        mc_scores, mc_labels, mc_boxes, mc_valid, mc_idx = \
            nms_ops.multi_classes_nms(
                scores, box_preds, nms_cfg,
                score_thresh=float(score_thresh) if score_thresh else None)
        keep_scores = mc_scores.reshape(-1)
        keep_valid = mc_valid.reshape(-1)
        keep_idx = mc_idx.reshape(-1)
        out = {
            'pred_boxes': jnp.where(
                keep_valid[:, None],
                mc_boxes.reshape(-1, mc_boxes.shape[-1]), 0.0),
            'pred_scores': jnp.where(keep_valid, keep_scores, 0.0),
            'pred_labels': jnp.where(keep_valid, mc_labels.reshape(-1), 0),
            'pred_logits': jnp.where(keep_valid[:, None],
                                     logits_src[keep_idx], 0.0),
            'pred_valid': keep_valid,
        }
        if points is not None:
            out['pred_box_unique_density'] = box_point_density(
                points[:, :3], out['pred_boxes'][:, :7], points_valid,
                keep_valid)
        return out
    if nms_cfg is not None:
        keep_idx, keep_valid, keep_scores = nms_ops.rotated_nms_matrix(
            box_preds[:, :7], max_scores,
            iou_thresh=float(nms_cfg.NMS_THRESH),
            pre_max=int(nms_cfg.NMS_PRE_MAXSIZE),
            post_max=int(nms_cfg.NMS_POST_MAXSIZE),
            score_thresh=float(score_thresh) if score_thresh else None,
            matrix_cap=int(nms_cfg.get('MATRIX_CAP', 2048)))
    else:
        # CenterPoint-style configs carry no model-level NMS: the dense head
        # already suppressed peaks and emitted final boxes (reference
        # centerpoint.py:36-51 takes final_box_dicts as-is) — select by
        # score only
        post_max = int(post_cfg.get('MAX_OBJ_PER_SAMPLE',
                                    min(500, box_preds.shape[0])))
        s = jnp.where(max_scores >= float(score_thresh or 0.0), max_scores,
                      -jnp.inf)
        keep_scores, keep_idx = jax.lax.top_k(s, min(post_max,
                                                     box_preds.shape[0]))
        keep_valid = jnp.isfinite(keep_scores)
        keep_scores = jnp.where(keep_valid, keep_scores, -1e10)

    out = {
        # full box width (7 for kitti/waymo; 9 with velocity for nuscenes)
        'pred_boxes': jnp.where(keep_valid[:, None], box_preds[keep_idx], 0.0),
        'pred_scores': jnp.where(keep_valid, keep_scores, 0.0),
        'pred_labels': jnp.where(keep_valid, labels[keep_idx], 0),
        'pred_logits': jnp.where(keep_valid[:, None], logits_src[keep_idx], 0.0),
        'pred_valid': keep_valid,
    }
    if points is not None:
        # parity: pred_box_unique_density (detector3d_template.py:379-387)
        out['pred_box_unique_density'] = box_point_density(
            points[:, :3], out['pred_boxes'][:, :7], points_valid, keep_valid)
    return out


def post_processing(batch_dict, post_cfg, num_class):
    """Batched post-processing (vmapped per frame).

    batch_dict needs: batch_cls_preds (B, A, C), batch_box_preds (B, A, 7+),
    cls_preds_normalized (bool), optionally points (B, N, 3+) + points_valid.
    Returns dict of (B, P, ...) arrays.
    """
    cls_preds = batch_dict['batch_cls_preds']
    box_preds = batch_dict['batch_box_preds']
    normalized = bool(batch_dict.get('cls_preds_normalized', False))
    points = batch_dict.get('points', None)
    points_valid = batch_dict.get('points_valid', None)

    # IoU-head score fusion (parity: second_net_iou.post_processing
    # SCORE_TYPE iou/cls/weighted_iou_cls/num_pts_iou_cls + SCORE_BY_CLASS)
    score_type = post_cfg.get('NMS_CONFIG', {}).get('SCORE_TYPE', None) \
        if post_cfg.get('NMS_CONFIG', None) is not None else None
    if score_type is not None and 'roi_scores' in batch_dict:
        iou_s = cls_preds.max(-1) if normalized \
            else jax.nn.sigmoid(cls_preds).max(-1)          # (B, R)
        cls_s = jax.nn.sigmoid(batch_dict['roi_scores'])    # (B, R)
        if score_type == 'iou':
            fused = iou_s
        elif score_type == 'cls':
            fused = cls_s
        elif score_type == 'weighted_iou_cls':
            w = post_cfg.NMS_CONFIG.SCORE_WEIGHTS
            fused = float(w['iou']) * iou_s + float(w['cls']) * cls_s
        elif score_type == 'num_pts_iou_cls':
            from ..ops.points_in_boxes import points_count_per_box
            cnt = jax.vmap(points_count_per_box)(
                points[..., :3], box_preds[..., :7],
                points_valid).astype(jnp.float32)           # (B, R)
            th = post_cfg.NMS_CONFIG.SCORE_THRESH
            lo, hi = float(th['cls']), float(th['iou'])
            alpha = jnp.clip((cnt - lo) / max(hi - lo, 1e-6), 0.0, 1.0)
            fused = (1 - alpha) * cls_s + alpha * iou_s
        elif score_type == 'score_by_class':
            table = post_cfg.NMS_CONFIG.SCORE_BY_CLASS
            use_iou = jnp.asarray(
                [1.0 if table[c] == 'iou' else 0.0
                 for c in post_cfg.NMS_CONFIG.CLASS_NAMES])
            lbl = batch_dict['roi_labels'] - 1              # (B, R)
            sel = use_iou[jnp.clip(lbl, 0)]
            fused = sel * iou_s + (1 - sel) * cls_s
        else:
            raise NotImplementedError(score_type)
        cls_preds = fused[..., None]
        normalized = True
    has_class_labels = bool(batch_dict.get('has_class_labels', False))
    roi_labels = batch_dict.get('roi_labels', None) if has_class_labels else None
    full_cls = batch_dict.get('full_cls_scores', None)

    fn = partial(post_process_frame, post_cfg=post_cfg, num_class=num_class,
                 normalized=normalized)
    extra = {}
    if roi_labels is not None:
        extra['roi_labels'] = roi_labels
    if full_cls is not None:
        extra['full_cls_scores'] = full_cls
    if points is not None:
        extra['points'] = points
        extra['points_valid'] = points_valid
    keys = sorted(extra)
    return jax.vmap(lambda c, b, *e: fn(c, b, **dict(zip(keys, e))))(
        cls_preds, box_preds, *[extra[k] for k in keys])


def gt_class_stats(points, points_valid, gt_boxes, num_classes: int):
    """Per-class gt box counts + per-class mean/median/variance of
    points-in-box, single frame.

    Parity: ``detector3d_template.py:242-267`` (num_bbox / mean_points /
    median_points / variance_points dicts — here fixed (C,) arrays).
    gt_boxes: (M, 8) zero-padded with class id in last channel.
    """
    from .. import ops
    from ..ops.points_in_boxes import points_in_boxes
    labels = gt_boxes[:, -1].astype(jnp.int32)
    valid = jnp.abs(gt_boxes).sum(-1) > 0
    member = points_in_boxes(points[:, :3], gt_boxes[:, :7])
    if points_valid is not None:
        member &= points_valid[:, None]
    counts = member.sum(axis=0).astype(jnp.float32)  # (M,)

    m = gt_boxes.shape[0]
    num_bbox, mean_pts, median_pts, var_pts = [], [], [], []
    for c in range(1, num_classes + 1):
        cls_mask = valid & (labels == c)
        n = cls_mask.sum()
        num_bbox.append(n)
        cnt_c = jnp.where(cls_mask, counts, 0.0)
        mean = jnp.where(n > 0, cnt_c.sum() / jnp.clip(n, 1), 0.0)
        var = jnp.where(
            n > 0,
            jnp.where(cls_mask, (counts - mean) ** 2, 0.0).sum() / jnp.clip(n, 1),
            0.0)
        sorted_c = jnp.sort(jnp.where(cls_mask, counts, jnp.inf))
        med_idx = jnp.clip((n - 1) // 2, 0, m - 1)
        median = jnp.where(n > 0, sorted_c[med_idx], 0.0)
        mean_pts.append(mean)
        median_pts.append(median)
        var_pts.append(var)
    return {
        'num_bbox': jnp.stack(num_bbox).astype(jnp.int32),
        'mean_points': jnp.stack(mean_pts),
        'median_points': jnp.stack(median_pts),
        'variance_points': jnp.stack(var_pts),
    }


def generate_recall_record(pred_boxes, pred_valid, gt_boxes, gt_valid,
                           thresh_list=(0.3, 0.5, 0.7)):
    """Single-frame recall counts vs rotated-IoU thresholds.

    Parity: ``detector3d_template.generate_recall_record:411-453`` (rcnn
    recall part). Returns dict {recalled_<t>: scalar count, gt: scalar}.
    """
    iou = iou3d.boxes_iou3d(gt_boxes[:, :7], pred_boxes[:, :7])
    iou = jnp.where(pred_valid[None, :], iou, 0.0)
    gt_max = jnp.where(gt_valid, iou.max(axis=1), 0.0)
    out = {'gt': gt_valid.sum()}
    for t in thresh_list:
        out[f'rcnn_{t}'] = (gt_max > t).sum()
    return out
