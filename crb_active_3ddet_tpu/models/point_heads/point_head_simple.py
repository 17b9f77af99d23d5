"""Point head: keypoint foreground segmentation for PV-RCNN.

Parity: ``pcdet/models/dense_heads/point_head_simple.py`` (:7-99) and the
target assignment in ``point_head_template.assign_stack_targets`` — points
inside gt boxes are fg, points only inside the GT_EXTRA_WIDTH-enlarged boxes
are ignored (−1), rest bg; focal cls loss.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.points_in_boxes import points_in_boxes
from ...utils import box_utils, loss_utils


def assign_point_targets(points, points_valid, gt_boxes, extra_width):
    """points: (K, 3); gt_boxes: (M, 8). Returns (K,) int32 labels
    (−1 ignore, 0 bg, 1 fg — class-agnostic)."""
    gt_valid = jnp.abs(gt_boxes).sum(-1) > 0
    in_box = (points_in_boxes(points, gt_boxes[:, :7])
              & gt_valid[None, :]).any(axis=1)
    enlarged = box_utils.enlarge_box3d(gt_boxes[:, :7],
                                       jnp.asarray(extra_width))
    in_enlarged = (points_in_boxes(points, enlarged)
                   & gt_valid[None, :]).any(axis=1)
    labels = jnp.where(in_box, 1, jnp.where(in_enlarged, -1, 0))
    return jnp.where(points_valid, labels, -1).astype(jnp.int32)


class PointHeadSimple(nn.Module):
    model_cfg: Any
    num_class: int

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        from ...config import to_cfg
        cfg = to_cfg(self.model_cfg)
        if cfg.get('USE_POINT_FEATURES_BEFORE_FUSION', False):
            feats = batch_dict['point_features_before_fusion']
        else:
            feats = batch_dict['point_features']
        x = feats
        for ch in cfg.CLS_FC:
            x = nn.Dense(ch, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                             epsilon=1e-3)(x)
            x = nn.relu(x)
        point_cls_preds = nn.Dense(1 if cfg.CLASS_AGNOSTIC
                                   else self.num_class)(x)  # (B, K, C)
        batch_dict['point_cls_preds'] = point_cls_preds
        batch_dict['point_cls_scores'] = jax.nn.sigmoid(
            point_cls_preds.max(axis=-1))                    # (B, K)

        if training:
            extra = tuple(cfg.TARGET_CONFIG.GT_EXTRA_WIDTH)
            labels = jax.vmap(
                lambda p, v, g: assign_point_targets(p, v, g, extra))(
                batch_dict['point_coords'], batch_dict['point_coords_valid'],
                batch_dict['gt_boxes'])
            batch_dict['point_cls_labels'] = labels          # (B, K)
        return batch_dict


def get_point_loss(batch_dict, loss_weights, reduce=True):
    """Focal segmentation loss (parity: point_head_template.get_cls_layer_loss)."""
    preds = batch_dict['point_cls_preds']    # (B, K, 1)
    labels = batch_dict['point_cls_labels']  # (B, K)
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (positives * 1.0 + negatives * 1.0)
    pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0)
    cls_weights = cls_weights / pos_norm
    one_hot = positives[..., None].astype(preds.dtype)
    loss = loss_utils.sigmoid_focal_cls_loss(preds, one_hot, cls_weights)
    w = loss_weights.get('point_cls_weight', 1.0)
    if reduce:
        return loss.sum() / preds.shape[0] * w
    return loss.sum(axis=(-1, -2)) * w


def build_point_head(point_head_cfg, model_cfg, num_class, voxel_size,
                     point_cloud_range):
    name = point_head_cfg['NAME']
    if name == 'PointHeadSimple':
        return PointHeadSimple(model_cfg=point_head_cfg, num_class=num_class)
    if name == 'PointHeadBox':
        from .point_head_box import PointHeadBox
        return PointHeadBox(model_cfg=point_head_cfg, num_class=num_class,
                            predict_boxes_when_training=True)
    if name == 'PointIntraPartOffsetHead':
        from .point_head_box import PointIntraPartOffsetHead
        return PointIntraPartOffsetHead(model_cfg=point_head_cfg,
                                        num_class=num_class)
    raise KeyError(f'unknown point head {name}')
