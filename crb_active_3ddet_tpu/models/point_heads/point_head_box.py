"""PointHeadBox (PointRCNN first stage) and PointIntraPartOffsetHead
(PartA2 part segmentation).

Parity: ``pcdet/models/dense_heads/point_head_box.py`` (per-point class
logits + PointResidualCoder box residuals, decoded to batch_box_preds for
the RoI head) and ``point_head_template.assign_stack_targets`` with
``ret_box_labels``/``ret_part_labels`` (fg = inside a gt box, ignore = only
inside the GT_EXTRA_WIDTH-enlarged box; part labels = intra-box coordinates
normalized to [0, 1]); ``point_intra_part_offset_head.py`` for the part
head.  Losses: focal cls, weighted smooth-L1 box residuals, BCE part
offsets.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.points_in_boxes import points_in_boxes
from ...utils import box_coder as box_coder_utils
from ...utils import box_utils, common, loss_utils
from .point_head_simple import assign_point_targets


def assign_point_box_targets(points, points_valid, gt_boxes, extra_width,
                             coder):
    """Per-point class labels (0 bg, −1 ignore, 1..C fg) + encoded box
    targets for fg points.  points (K, 3); gt_boxes (M, 8) last col class."""
    m = gt_boxes.shape[0]
    gt_valid = jnp.abs(gt_boxes).sum(-1) > 0
    in_box = points_in_boxes(points, gt_boxes[:, :7]) & gt_valid[None, :]
    enlarged = box_utils.enlarge_box3d(gt_boxes[:, :7],
                                       jnp.asarray(extra_width))
    in_enl = (points_in_boxes(points, enlarged) & gt_valid[None, :]).any(1)
    # first matching box per point
    first = jnp.argmax(in_box, axis=1)
    has_box = in_box.any(axis=1)
    box_of_point = gt_boxes[first]                              # (K, 8)
    cls = jnp.where(has_box, box_of_point[:, 7].astype(jnp.int32),
                    jnp.where(in_enl, -1, 0))
    cls = jnp.where(points_valid, cls, -1)
    gt_classes = box_of_point[:, 7].astype(jnp.int32)
    box_targets = coder.encode(box_of_point[:, :7], points,
                               gt_classes=gt_classes)           # (K, code)
    box_targets = jnp.where(has_box[:, None], box_targets, 0.0)
    # intra-part offsets: local coords normalized to [0,1] (z from bottom)
    local = common.rotate_points_along_z(
        (points - box_of_point[:, 0:3])[:, None, :],
        -box_of_point[:, 6])[:, 0, :]
    part = local / jnp.maximum(box_of_point[:, 3:6], 1e-6) \
        + jnp.asarray([0.5, 0.5, 0.5])
    part = jnp.clip(jnp.where(has_box[:, None], part, 0.0), 0.0, 1.0)
    return cls, box_targets, part


class PointHeadBox(nn.Module):
    """Per-point classification + box regression (PointRCNN stage 1)."""
    model_cfg: Any
    num_class: int
    predict_boxes_when_training: bool = True

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        from ...config import to_cfg
        cfg = to_cfg(self.model_cfg)
        coder_cfg = dict(cfg.TARGET_CONFIG.get('BOX_CODER_CONFIG', {}))
        coder = box_coder_utils.build_box_coder(
            cfg.TARGET_CONFIG.get('BOX_CODER', 'PointResidualCoder'),
            **coder_cfg)
        feats = batch_dict['point_features']                    # (B, K, C)

        def tower(x, fcs, out_ch):
            for ch in fcs:
                x = nn.Dense(ch, use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.99, epsilon=1e-3)(x)
                x = nn.relu(x)
            return nn.Dense(out_ch)(x)

        n_cls = 1 if cfg.CLASS_AGNOSTIC else self.num_class
        point_cls_preds = tower(feats, tuple(cfg.CLS_FC), n_cls)
        point_box_preds = tower(feats, tuple(cfg.REG_FC), coder.code_size)
        batch_dict['point_cls_preds'] = point_cls_preds
        batch_dict['point_box_preds_raw'] = point_box_preds
        batch_dict['point_cls_scores'] = jax.nn.sigmoid(
            point_cls_preds.max(axis=-1))

        coords = batch_dict['point_coords']                     # (B, K, 3)
        valid = batch_dict.get('point_valid',
                               batch_dict.get('point_coords_valid'))
        if training:
            extra = tuple(cfg.TARGET_CONFIG.GT_EXTRA_WIDTH)
            cls_l, box_t, _ = jax.vmap(
                lambda p, v, g: assign_point_box_targets(p, v, g, extra,
                                                         coder))(
                coords, valid, batch_dict['gt_boxes'])
            batch_dict['point_cls_labels'] = cls_l
            batch_dict['point_box_labels'] = box_t
        if (not training) or self.predict_boxes_when_training:
            pred_classes = point_cls_preds.argmax(-1) + 1
            boxes = jax.vmap(lambda e, p, c: coder.decode(e, p,
                                                          pred_classes=c))(
                point_box_preds, coords, pred_classes)
            # invalid point slots must never win NMS
            masked_cls = jnp.where(valid[..., None], point_cls_preds, -1e9)
            batch_dict['batch_cls_preds'] = masked_cls          # (B, K, C)
            batch_dict['batch_box_preds'] = boxes               # (B, K, 7)
            batch_dict['batch_valid'] = valid
            batch_dict['cls_preds_normalized'] = False
        return batch_dict


class PointIntraPartOffsetHead(nn.Module):
    """Per-point fg seg + intra-object part offsets (PartA2)."""
    model_cfg: Any
    num_class: int

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        from ...config import to_cfg
        cfg = to_cfg(self.model_cfg)
        feats = batch_dict['point_features']                    # (B, V, C)

        def tower(x, fcs, out_ch):
            for ch in fcs:
                x = nn.Dense(ch, use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.99, epsilon=1e-3)(x)
                x = nn.relu(x)
            return nn.Dense(out_ch)(x)

        n_cls = 1 if cfg.CLASS_AGNOSTIC else self.num_class
        point_cls_preds = tower(feats, tuple(cfg.get('CLS_FC', [])), n_cls)
        point_part_preds = tower(feats, tuple(cfg.get('PART_FC', [])), 3)
        batch_dict['point_cls_preds'] = point_cls_preds
        batch_dict['point_cls_scores'] = jax.nn.sigmoid(
            point_cls_preds.max(axis=-1))
        batch_dict['point_part_offset'] = jax.nn.sigmoid(point_part_preds)

        # anchor-free PartA2_free variant: a REG_FC box branch turns this
        # head into the proposal source (reference
        # point_intra_part_offset_head.py builds box_layers when the config
        # carries REG_FC and decodes batch_box_preds at predict time)
        has_box_branch = bool(cfg.get('REG_FC', None))
        coder = None
        if has_box_branch:
            coder_cfg = dict(cfg.TARGET_CONFIG.get('BOX_CODER_CONFIG', {}))
            coder = box_coder_utils.build_box_coder(
                cfg.TARGET_CONFIG.get('BOX_CODER', 'PointResidualCoder'),
                **coder_cfg)
            point_box_preds = tower(feats, tuple(cfg.REG_FC),
                                    coder.code_size)
            batch_dict['point_box_preds_raw'] = point_box_preds

        coords = batch_dict['point_coords']
        valid = batch_dict.get('point_valid',
                               batch_dict.get('point_coords_valid'))
        if training:
            extra = tuple(cfg.TARGET_CONFIG.GT_EXTRA_WIDTH)
            t_coder = coder if coder is not None else \
                box_coder_utils.build_box_coder('PointResidualCoder',
                                                use_mean_size=False)
            cls_l, box_t, part_t = jax.vmap(
                lambda p, v, g: assign_point_box_targets(p, v, g, extra,
                                                         t_coder))(
                coords, valid, batch_dict['gt_boxes'])
            if has_box_branch:
                # multi-class labels feed both seg and box towers
                batch_dict['point_cls_labels'] = cls_l if not \
                    cfg.CLASS_AGNOSTIC else jnp.where(cls_l > 0, 1, cls_l)
                batch_dict['point_box_labels'] = box_t
            else:
                batch_dict['point_cls_labels'] = jnp.where(cls_l > 0, 1,
                                                           cls_l)
            batch_dict['point_part_labels'] = part_t
        if has_box_branch:
            pred_classes = point_cls_preds.argmax(-1) + 1
            boxes = jax.vmap(lambda e, p, c: coder.decode(
                e, p, pred_classes=c))(point_box_preds, coords, pred_classes)
            masked_cls = jnp.where(valid[..., None], point_cls_preds, -1e9)
            batch_dict['batch_cls_preds'] = masked_cls
            batch_dict['batch_box_preds'] = boxes
            batch_dict['batch_valid'] = valid
            batch_dict['cls_preds_normalized'] = False
        return batch_dict


def get_point_box_loss(batch_dict, loss_weights, num_class, reduce=True):
    """Focal cls (multi-class one-hot) + weighted smooth-L1 box residuals
    over fg points (parity: point_head_template.get_cls/box_layer_loss)."""
    preds = batch_dict['point_cls_preds']        # (B, K, C)
    labels = batch_dict['point_cls_labels']      # (B, K) 0 bg, -1 ign, 1..C
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (positives + negatives).astype(jnp.float32)
    pos_norm = jnp.clip(positives.sum(1, keepdims=True).astype(jnp.float32),
                        1.0)
    cls_weights = cls_weights / pos_norm
    n_out = preds.shape[-1]
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0), n_out + 1)[..., 1:]
    cls_loss = loss_utils.sigmoid_focal_cls_loss(preds, one_hot, cls_weights)
    w = loss_weights
    total_cls = cls_loss.sum(axis=(-1, -2)) * w.get('point_cls_weight', 1.0)

    box_preds = batch_dict['point_box_preds_raw']   # (B, K, code)
    box_t = batch_dict['point_box_labels']
    reg_w = positives.astype(jnp.float32)
    reg_w = reg_w / pos_norm
    code_w = jnp.asarray(w.get('code_weights',
                               [1.0] * box_preds.shape[-1]))
    diff = loss_utils.smooth_l1_loss(
        (box_preds - box_t) * code_w[None, None, :])
    box_loss = (diff.sum(-1) * reg_w).sum(-1) \
        * w.get('point_box_weight', 1.0)
    loss = total_cls + box_loss
    if reduce:
        return loss.mean()
    return loss


def get_point_part_loss(batch_dict, loss_weights, reduce=True):
    """Focal cls + BCE part offsets (parity: PointIntraPartOffsetHead
    get_loss)."""
    from .point_head_simple import get_point_loss
    cls_loss = get_point_loss(batch_dict, loss_weights, reduce=reduce)
    part_preds = batch_dict['point_part_offset']   # (B, V, 3) sigmoid
    part_t = batch_dict['point_part_labels']
    labels = batch_dict['point_cls_labels']
    pos = (labels > 0).astype(jnp.float32)
    eps = 1e-6
    bce = -(part_t * jnp.log(part_preds + eps)
            + (1 - part_t) * jnp.log(1 - part_preds + eps)).mean(-1)
    pos_n = jnp.clip(pos.sum(axis=-1), 1.0)
    part_loss = (bce * pos).sum(-1) / pos_n \
        * loss_weights.get('point_part_weight', 1.0)
    total = part_loss
    if 'point_box_labels' in batch_dict and \
            'point_box_preds_raw' in batch_dict:
        # PartA2_free box branch (reference get_box_layer_loss)
        box_preds = batch_dict['point_box_preds_raw']
        box_t = batch_dict['point_box_labels']
        labels = batch_dict['point_cls_labels']
        w = (labels > 0).astype(jnp.float32)
        wn = w / jnp.clip(w.sum(-1, keepdims=True), 1.0)
        cw = loss_weights.get('code_weights', None)
        box_loss = loss_utils.weighted_smooth_l1_loss(
            box_preds, box_t, weights=wn,
            code_weights=jnp.asarray(cw) if cw is not None else None)
        total = total + box_loss.sum(axis=(-1, -2)) \
            * loss_weights.get('point_box_weight', 1.0)
    if reduce:
        return cls_loss + total.mean()
    return cls_loss + total
