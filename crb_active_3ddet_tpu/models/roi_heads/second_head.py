"""SECOND IoU head: rotated BEV RoI-align + IoU quality regression.

Parity: ``pcdet/models/roi_heads/second_head.py`` — each ROI samples a
G×G grid of bilinear taps from the (detached) BEV feature map, rotated and
scaled to the ROI footprint (the reference's affine_grid/grid_sample pair,
:53-110, expressed directly as rotated grid points here), shared 1×1 FC
tower, one IoU logit per ROI.  Eval exports the IoU logit as
batch_cls_preds with the RPN rois as boxes (:112-142); training regresses
the logit against the soft roi-gt IoU labels (CLS_SCORE_TYPE roi_iou).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones_3d.pfe import bilinear_interpolate
from . import roi_head_template as rht


class SECONDHead(nn.Module):
    model_cfg: Any
    num_class: int = 1
    voxel_size: tuple = (0.05, 0.05, 0.1)
    point_cloud_range: tuple = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        from ...config import to_cfg
        cfg = to_cfg(self.model_cfg)
        nms_cfg = cfg.NMS_CONFIG['TRAIN' if training else 'TEST']
        batch_dict = rht.proposal_layer(batch_dict, nms_cfg,
                                        num_class_names=self.num_class)
        if training:
            rng = self.make_rng('dropout')
            targets = rht.assign_targets(rng, batch_dict, cfg.TARGET_CONFIG)
            batch_dict['rois'] = targets['rois']
            batch_dict['roi_labels'] = targets['roi_labels']
            batch_dict['roi_scores'] = targets['roi_scores']
            batch_dict['roi_valid'] = jnp.ones(targets['rois'].shape[:2],
                                               bool)

        rois = jax.lax.stop_gradient(batch_dict['rois'])        # (B, R, 7)
        bev = jax.lax.stop_gradient(batch_dict['spatial_features_2d'])
        b, r = rois.shape[:2]
        g = int(cfg.ROI_GRID_POOL.GRID_SIZE)
        down = float(cfg.ROI_GRID_POOL.DOWNSAMPLE_RATIO)

        # rotated G x G tap grid over each ROI footprint, in BEV pixel coords
        lin = (jnp.arange(g) + 0.5) / g - 0.5                   # (-0.5, 0.5)
        gx, gy = jnp.meshgrid(lin, lin, indexing='ij')          # (G, G)
        ux = gx[None, None] * rois[..., 3, None, None]          # local x
        uy = gy[None, None] * rois[..., 4, None, None]          # local y
        cosa = jnp.cos(rois[..., 6])[..., None, None]
        sina = jnp.sin(rois[..., 6])[..., None, None]
        wx = ux * cosa - uy * sina + rois[..., 0, None, None]
        wy = ux * sina + uy * cosa + rois[..., 1, None, None]
        px = (wx - self.point_cloud_range[0]) / (self.voxel_size[0] * down)
        py = (wy - self.point_cloud_range[1]) / (self.voxel_size[1] * down)

        pooled = jax.vmap(bilinear_interpolate)(
            bev, px.reshape(b, -1), py.reshape(b, -1))          # (B, R·G², C)
        pooled = pooled.reshape(b * r, g * g * bev.shape[-1])

        dp = float(cfg.get('DP_RATIO', 0.3))
        x = pooled
        fcs = tuple(cfg.SHARED_FC)
        for i, ch in enumerate(fcs):
            x = nn.Dense(ch, use_bias=False, name=f'shared_fc_{i}')(x)
            x = nn.BatchNorm(use_running_average=not training,
                             momentum=0.99, epsilon=1e-3,
                             name=f'shared_bn_{i}')(x)
            x = nn.relu(x)
            if i != len(fcs) - 1 and dp > 0:
                x = nn.Dropout(dp)(
                    x, deterministic=not (training
                                          or self.has_rng('dropout')))
        shared = x
        y = shared
        for i, ch in enumerate(tuple(cfg.IOU_FC)):
            y = nn.Dense(ch, use_bias=False, name=f'iou_fc_{i}')(y)
            y = nn.BatchNorm(use_running_average=not training,
                             momentum=0.99, epsilon=1e-3,
                             name=f'iou_bn_{i}')(y)
            y = nn.relu(y)
        rcnn_iou = nn.Dense(1, name='iou_out')(y)               # (B·R, 1)

        if not training:
            batch_dict['batch_cls_preds'] = rcnn_iou.reshape(b, r, 1)
            batch_dict['batch_box_preds'] = rois
            batch_dict['cls_preds_normalized'] = False
            batch_dict['rcnn_cls'] = rcnn_iou
            batch_dict['rcnn_reg'] = jnp.zeros((b * r, 7), rcnn_iou.dtype)
        else:
            targets['rcnn_iou'] = rcnn_iou
            batch_dict['rcnn_cls'] = rcnn_iou
            batch_dict['roi_iou_targets'] = targets
        batch_dict['shared_features'] = shared.reshape(b, r, -1)
        return batch_dict


def get_box_iou_layer_loss(targets, loss_cfg, reduce=True):
    """Parity: second_head.get_box_iou_layer_loss (:153-178)."""
    from ...utils import loss_utils
    iou_pred = targets['rcnn_iou'].reshape(-1)
    labels = targets['rcnn_cls_labels'].reshape(-1)
    kind = loss_cfg.get('IOU_LOSS', 'BinaryCrossEntropy')
    if kind == 'BinaryCrossEntropy':
        per = loss_utils.binary_cross_entropy_with_logits(
            iou_pred, jnp.clip(labels, 0.0))
    elif kind == 'L2':
        per = (iou_pred - labels) ** 2
    elif kind == 'smoothL1':
        per = loss_utils.smooth_l1_loss(iou_pred - labels)
    else:
        raise NotImplementedError(kind)
    valid = (labels >= 0).astype(jnp.float32)
    loss = (per * valid).sum() / jnp.clip(valid.sum(), 1.0)
    return loss * float(loss_cfg.LOSS_WEIGHTS['rcnn_iou_weight'])
