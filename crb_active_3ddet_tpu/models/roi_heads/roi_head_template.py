"""RoI head machinery: proposals, target sampling, losses (pure JAX).

Parity: ``pcdet/models/roi_heads/roi_head_template.py`` (proposal_layer
:45-108 incl. the ``full_cls_scores`` export for the AL layer, assign_targets
canonical transform :110-140, cls/reg/corner losses with per-sample
``reduce=False`` :142-287, BADGE ``reg_sample_targets`` branch :146-156,
LossPredLoss :289-310) and
``target_assigner/proposal_target_layer.py`` (roi_iou soft labels :39-56,
subsample_rois fg/hard-bg/easy-bg :117-180).

TPU-first: everything fixed-shape; the reference's dynamic fg/bg index lists
become rank-compacted slot selection with explicit PRNG keys.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import nms as nms_ops
from ...ops.iou3d import boxes_iou3d
from ...utils import common, loss_utils
from ...utils.box_coder import ResidualCoder


# ---------------------------------------------------------------------------
# proposal layer
# ---------------------------------------------------------------------------

def proposal_layer(batch_dict, nms_config, num_class_names: int):
    """rois from the dense head's decoded boxes. Returns updated batch_dict
    with rois (B, P, 7), roi_scores, roi_labels (1-based), roi_valid and the
    AL export full_cls_scores (B, P, num_classes)."""
    box_preds = batch_dict['batch_box_preds']   # (B, A, 7+)
    cls_preds = batch_dict['batch_cls_preds']   # (B, A, C)
    post = int(nms_config.NMS_POST_MAXSIZE)

    def single(boxes, cls):
        roi_scores, roi_labels = cls.max(-1), cls.argmax(-1)
        keep_idx, keep_valid, keep_scores = nms_ops.rotated_nms_matrix(
            boxes[:, :7], roi_scores,
            iou_thresh=float(nms_config.NMS_THRESH),
            pre_max=int(nms_config.NMS_PRE_MAXSIZE), post_max=post,
            matrix_cap=int(nms_config.get('MATRIX_CAP', 2048)))
        return {
            'rois': jnp.where(keep_valid[:, None], boxes[keep_idx, :7], 0.0),
            'roi_scores': jnp.where(keep_valid, roi_scores[keep_idx], 0.0),
            'roi_labels': jnp.where(keep_valid, roi_labels[keep_idx] + 1, 0),
            'full_cls_scores': jnp.where(keep_valid[:, None], cls[keep_idx], 0.0),
            'roi_valid': keep_valid,
        }

    # parity: the reference proposal layer runs under @torch.no_grad()
    # (roi_head_template.py:45) — detaching here also keeps NMS out of the
    # differentiated graph (leaner jvp tracing/compile)
    out = jax.vmap(single)(jax.lax.stop_gradient(box_preds),
                           jax.lax.stop_gradient(cls_preds))
    batch_dict.update(out)
    batch_dict['has_class_labels'] = cls_preds.shape[-1] > 1
    return batch_dict


# ---------------------------------------------------------------------------
# proposal target layer (training subsampling)
# ---------------------------------------------------------------------------

def get_max_iou_with_same_class(rois, roi_labels, gt_boxes, gt_labels,
                                gt_valid):
    """Per-roi max IoU restricted to gts of the same class.
    Parity: proposal_target_layer.get_max_iou_with_same_class."""
    iou = boxes_iou3d(rois[:, :7], gt_boxes[:, :7])  # (R, M)
    same = (roi_labels[:, None] == gt_labels[None, :]) & gt_valid[None, :]
    iou = jnp.where(same, iou, -1.0)
    max_overlaps = jnp.clip(iou.max(axis=1), 0.0)
    gt_assignment = iou.argmax(axis=1)
    return max_overlaps, gt_assignment


def _ordered_pool(rng, mask):
    """Random-order compaction: indices of True entries first (shuffled),
    then the rest. Returns (order (N,), count)."""
    pri = jnp.where(mask, jax.random.uniform(rng, mask.shape), -1.0)
    order = jnp.argsort(-pri)
    return order, mask.sum()


def subsample_rois(rng, max_overlaps, roi_valid, sampler_cfg):
    """Fixed-shape fg/bg roi sampling (parity: subsample_rois :117-180)."""
    r_total = int(sampler_cfg.ROI_PER_IMAGE)
    fg_per_image = int(np.round(float(sampler_cfg.FG_RATIO) * r_total))
    fg_thresh = min(float(sampler_cfg.REG_FG_THRESH),
                    float(sampler_cfg.CLS_FG_THRESH))
    bg_lo = float(sampler_cfg.CLS_BG_THRESH_LO)
    hard_ratio = float(sampler_cfg.HARD_BG_RATIO)

    fg_mask = (max_overlaps >= fg_thresh) & roi_valid
    easy_mask = (max_overlaps < bg_lo) & roi_valid
    hard_mask = ((max_overlaps < float(sampler_cfg.REG_FG_THRESH))
                 & (max_overlaps >= bg_lo) & roi_valid)

    k_fg, k_hard, k_easy, k_slot = jax.random.split(rng, 4)
    fg_order, n_fg = _ordered_pool(k_fg, fg_mask)
    hard_order, n_hard = _ordered_pool(k_hard, hard_mask)
    easy_order, n_easy = _ordered_pool(k_easy, easy_mask)
    n_bg = n_hard + n_easy

    nf = jnp.where(n_bg > 0, jnp.minimum(n_fg, fg_per_image),
                   jnp.where(n_fg > 0, r_total, 0))
    bg_needed = r_total - nf
    hard_num = jnp.where(
        (n_hard > 0) & (n_easy > 0),
        jnp.minimum((bg_needed * hard_ratio).astype(jnp.int32), n_hard),
        jnp.where(n_hard > 0, bg_needed, 0))
    # slot assembly: [fg x nf | hard x hard_num | easy x rest]
    slots = jnp.arange(r_total)
    rand_ints = jax.random.randint(k_slot, (r_total,), 0, 1 << 30)
    fg_pick = fg_order[jnp.where(n_fg > 0, rand_ints % jnp.clip(n_fg, 1), 0)]
    fg_seq = fg_order[jnp.clip(slots, 0, jnp.clip(n_fg, 1) - 1)]
    # fg slots: in-order (no replacement) when n_bg>0, random w/ replacement
    # when bg empty (reference :145-150)
    fg_sel = jnp.where(n_bg > 0, fg_seq, fg_pick)
    hard_sel = hard_order[jnp.where(n_hard > 0,
                                    rand_ints % jnp.clip(n_hard, 1), 0)]
    easy_sel = easy_order[jnp.where(n_easy > 0,
                                    rand_ints % jnp.clip(n_easy, 1), 0)]
    sel = jnp.where(slots < nf, fg_sel,
                    jnp.where(slots < nf + hard_num, hard_sel, easy_sel))
    return sel.astype(jnp.int32), (slots < nf)


def proposal_target_single(rng, rois, roi_labels, roi_scores, roi_valid,
                           gt_boxes, sampler_cfg):
    """One sample of ProposalTargetLayer.forward (:13-63)."""
    gt_labels = gt_boxes[:, -1].astype(jnp.int32)
    gt_valid = jnp.abs(gt_boxes).sum(-1) > 0
    if sampler_cfg.get('SAMPLE_ROI_BY_EACH_CLASS', False):
        max_overlaps, gt_assignment = get_max_iou_with_same_class(
            rois, roi_labels, gt_boxes, gt_labels, gt_valid)
    else:
        iou = boxes_iou3d(rois[:, :7], gt_boxes[:, :7])
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        max_overlaps = jnp.clip(iou.max(axis=1), 0.0)
        gt_assignment = iou.argmax(axis=1)

    sel, is_fg_slot = subsample_rois(rng, max_overlaps, roi_valid, sampler_cfg)
    out = {
        'rois': rois[sel],
        'roi_labels': roi_labels[sel],
        'roi_scores': roi_scores[sel],
        'gt_iou_of_rois': max_overlaps[sel],
        'gt_of_rois': gt_boxes[gt_assignment[sel]],
    }
    ious = out['gt_iou_of_rois']
    out['reg_valid_mask'] = (ious > float(sampler_cfg.REG_FG_THRESH)).astype(jnp.int32)
    if sampler_cfg.CLS_SCORE_TYPE == 'roi_iou':
        fg_t = float(sampler_cfg.CLS_FG_THRESH)
        bg_t = float(sampler_cfg.CLS_BG_THRESH)
        soft = (ious - bg_t) / (fg_t - bg_t)
        labels = jnp.where(ious > fg_t, 1.0,
                           jnp.where(ious < bg_t, 0.0, soft))
        out['rcnn_cls_labels'] = labels
    elif sampler_cfg.CLS_SCORE_TYPE == 'cls':
        labels = (ious > float(sampler_cfg.CLS_FG_THRESH)).astype(jnp.float32)
        ignore = ((ious > float(sampler_cfg.CLS_BG_THRESH))
                  & (ious < float(sampler_cfg.CLS_FG_THRESH)))
        out['rcnn_cls_labels'] = jnp.where(ignore, -1.0, labels)
    else:
        raise NotImplementedError(sampler_cfg.CLS_SCORE_TYPE)
    return out


def assign_targets(rng, batch_dict, sampler_cfg):
    """Batched target sampling + canonical transform (template :110-140)."""
    b = batch_dict['rois'].shape[0]
    rngs = jax.random.split(rng, b)
    t = jax.vmap(partial(proposal_target_single, sampler_cfg=sampler_cfg))(
        rngs, batch_dict['rois'], batch_dict['roi_labels'],
        batch_dict['roi_scores'], batch_dict['roi_valid'],
        batch_dict['gt_boxes'])

    rois = t['rois']                      # (B, R, 7)
    gt_of_rois = t['gt_of_rois']          # (B, R, 8)
    t['gt_of_rois_src'] = gt_of_rois

    roi_center = rois[..., 0:3]
    roi_ry = rois[..., 6] % (2 * jnp.pi)
    shifted = jnp.concatenate([
        gt_of_rois[..., 0:3] - roi_center,
        gt_of_rois[..., 3:6],
        gt_of_rois[..., 6:7] - roi_ry[..., None],
        gt_of_rois[..., 7:]], axis=-1)
    # rotate gt centers into roi local frame
    flat = shifted.reshape(-1, 1, shifted.shape[-1])
    rotated = common.rotate_points_along_z(flat, -roi_ry.reshape(-1))
    gt_ct = rotated.reshape(gt_of_rois.shape)

    heading = gt_ct[..., 6] % (2 * jnp.pi)
    opposite = (heading > jnp.pi * 0.5) & (heading < jnp.pi * 1.5)
    heading = jnp.where(opposite, (heading + jnp.pi) % (2 * jnp.pi), heading)
    heading = jnp.where(heading > jnp.pi, heading - 2 * jnp.pi, heading)
    heading = jnp.clip(heading, -jnp.pi / 2, jnp.pi / 2)
    gt_ct = gt_ct.at[..., 6].set(heading)
    t['gt_of_rois'] = gt_ct
    return t


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

_CODER = ResidualCoder()


def get_box_cls_layer_loss(forward_ret_dict, loss_cfg, reduce=True):
    """Parity: template :265-287 + BADGE hypothetical-label mode."""
    rcnn_cls = forward_ret_dict['rcnn_cls'].reshape(-1)
    labels = forward_ret_dict['rcnn_cls_labels']
    b = labels.shape[0]
    labels_flat = labels.reshape(-1)
    assert loss_cfg.CLS_LOSS == 'BinaryCrossEntropy'
    loss = loss_utils.binary_cross_entropy_with_logits(
        rcnn_cls, labels_flat.astype(jnp.float32))
    valid = (labels_flat >= 0).astype(jnp.float32)
    w = loss_cfg.LOSS_WEIGHTS['rcnn_cls_weight']
    if reduce:
        return (loss * valid).sum() / jnp.clip(valid.sum(), 1.0) * w
    per = (loss * valid) / jnp.clip(valid.sum(), 1.0)
    return per.reshape(b, -1).sum(-1) * w


def get_box_reg_layer_loss(forward_ret_dict, loss_cfg, reduce=True):
    """Parity: template :142-263 (smooth-l1 + corner regularization)."""
    code_size = 7
    rcnn_reg = forward_ret_dict['rcnn_reg']            # (B·R, code)
    reg_valid = forward_ret_dict['reg_valid_mask'].reshape(-1)
    gt_ct = forward_ret_dict['gt_of_rois'][..., :code_size]
    gt_src = forward_ret_dict['gt_of_rois_src'][..., :code_size]
    rois = forward_ret_dict['rois']
    b = gt_ct.shape[0]
    n = gt_ct.reshape(-1, code_size).shape[0]

    fg_mask = reg_valid > 0
    fg_sum = jnp.clip(fg_mask.sum(), 1)

    rois_anchor = rois.reshape(-1, code_size)
    rois_anchor = rois_anchor.at[:, 0:3].set(0.0).at[:, 6].set(0.0)
    reg_targets = _CODER.encode(gt_ct.reshape(-1, code_size), rois_anchor)
    lw = loss_cfg.LOSS_WEIGHTS
    loss_src = loss_utils.weighted_smooth_l1_loss(
        rcnn_reg.reshape(1, n, -1), reg_targets.reshape(1, n, -1),
        code_weights=lw['code_weights'])[0]           # (N, code)
    loss_src = loss_src * fg_mask[:, None].astype(jnp.float32)
    if reduce:
        reg_loss = loss_src.sum() / fg_sum
    else:
        reg_loss = (loss_src / fg_sum).reshape(b, -1).sum(-1)
    reg_loss = reg_loss * lw['rcnn_reg_weight']

    if loss_cfg.get('CORNER_LOSS_REGULARIZATION', False):
        # decode fg boxes back to global frame; masked fixed-shape version of
        # the reference's fg gather (:194-216)
        roi_flat = rois.reshape(-1, code_size)
        anchors0 = roi_flat.at[:, 0:3].set(0.0)
        boxes_local = _CODER.decode(rcnn_reg.reshape(-1, code_size), anchors0)
        rotated = common.rotate_points_along_z(
            boxes_local[:, None, :], roi_flat[:, 6]).reshape(-1, code_size)
        boxes_global = rotated.at[:, 0:3].add(roi_flat[:, 0:3])
        corner_per_box = loss_utils.get_corner_loss_lidar(
            boxes_global[:, :7], gt_src.reshape(-1, 7))   # (N,)
        corner_per_box = jnp.where(fg_mask, corner_per_box, 0.0)
        if reduce:
            corner = corner_per_box.sum() / fg_sum
        else:
            per_b = corner_per_box.reshape(b, -1)
            fg_b = jnp.clip(fg_mask.reshape(b, -1).sum(-1), 1)
            corner = per_b.sum(-1) / fg_b
        reg_loss = reg_loss + corner * lw['rcnn_corner_weight']
    return reg_loss


def get_rcnn_loss(forward_ret_dict, loss_cfg, reduce=True):
    cls = get_box_cls_layer_loss(forward_ret_dict, loss_cfg, reduce=reduce)
    reg = get_box_reg_layer_loss(forward_ret_dict, loss_cfg, reduce=reduce)
    return cls + reg, {'rcnn_loss_cls': cls, 'rcnn_loss_reg': reg}


def generate_predicted_boxes(rois, cls_preds, box_preds):
    """Decode rcnn predictions back to global boxes.
    Parity: template.generate_predicted_boxes (:335+).
    rois: (B, R, 7); cls_preds: (B·R, C); box_preds: (B·R, code)."""
    b, r = rois.shape[:2]
    code_size = 7
    batch_cls = cls_preds.reshape(b, r, -1)
    roi_flat = rois.reshape(-1, code_size)
    anchors0 = roi_flat.at[:, 0:3].set(0.0)
    local = _CODER.decode(box_preds.reshape(-1, code_size), anchors0)
    rotated = common.rotate_points_along_z(
        local[:, None, :], roi_flat[:, 6]).reshape(-1, code_size)
    boxes_global = rotated.at[:, 0:3].add(roi_flat[:, 0:3])
    return batch_cls, boxes_global.reshape(b, r, code_size)


# ---- CRB stage-2 hypothetical-label losses (crb_sampling.py:194-196) ----

def get_box_cls_layer_loss_hyp(rcnn_cls, hyp_labels, roi_cfg):
    loss = loss_utils.binary_cross_entropy_with_logits(
        rcnn_cls.reshape(-1), hyp_labels.reshape(-1))
    return loss.mean()


def get_box_reg_layer_loss_hyp(rcnn_reg, hyp_targets, roi_cfg):
    return loss_utils.smooth_l1_loss(
        rcnn_reg.reshape(-1) - hyp_targets.reshape(-1))
