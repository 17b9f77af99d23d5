"""PartA2 part-aggregation RoI head.

Parity: ``pcdet/models/roi_heads/partA2_head.py`` — RoI-aware pooling of
part offsets (avg) and UNet seg features (max) into a G³ grid per ROI,
two small conv stacks (part / rpn branches), merged features → shared FCs →
cls/reg.

TPU-first: the per-ROI G³ grids are small dense volumes, so the reference's
sparse convs over pooled grids become masked dense 3D convs
(DenseMaskedConv3d) batched over all ROIs — pure MXU work with no index
machinery.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_pooling import roiaware_pool3d
from ..backbones_3d.spconv_backbone import DenseMaskedConv3d
from . import roi_head_template as rht


class PartA2FCHead(nn.Module):
    model_cfg: Any
    num_class: int = 1

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
            batch_dict['roi_valid'] = jnp.ones(targets['rois'].shape[:2],
                                               bool)

        rois = batch_dict['rois']                       # (B, R, 7)
        b, r = rois.shape[:2]
        g = int(cfg.ROI_AWARE_POOL.POOL_SIZE)
        coords = batch_dict['point_coords']             # (B, V, 3)
        valid = batch_dict.get('point_valid')
        seg_feats = batch_dict['point_features']        # (B, V, C)
        # part features: [offsets (3), seg score (1)]; offsets of low-score
        # points are zeroed (partA2_head.py:121-125)
        part_offset = batch_dict['point_part_offset']   # (B, V, 3)
        seg_score = batch_dict['point_cls_scores'][..., None]
        thresh = float(cfg.get('SEG_MASK_SCORE_THRESH', 0.3))
        part_offset = jnp.where(seg_score > thresh, part_offset, 0.0)
        part_feats = jnp.concatenate([part_offset, seg_score], axis=-1)

        pooled_part = jax.vmap(partial(roiaware_pool3d, out_size=g,
                                       pool_method='avg'))(
            coords, part_feats, rois, valid,
            jnp.ones((b, r), bool))                     # (B, R, G,G,G, 4)
        pooled_rpn = jax.vmap(partial(roiaware_pool3d, out_size=g,
                                      pool_method='max'))(
            coords, seg_feats, rois, valid, jnp.ones((b, r), bool))

        c0 = int(cfg.ROI_AWARE_POOL.NUM_FEATURES) // 2
        br = b * r
        part = pooled_part.reshape(br, g, g, g, -1)
        rpn = pooled_rpn.reshape(br, g, g, g, -1)
        mask = jnp.abs(part).sum(-1) + jnp.abs(rpn).sum(-1) > 0  # occupancy

        # conv_part / conv_rpn: 2 masked 3x3x3 convs each (:18-27)
        def branch(x, m, chans, name):
            for i, ch in enumerate(chans):
                x, m = DenseMaskedConv3d(ch, name=f'{name}_{i}')(
                    x, m, training)
            return x

        x_part = branch(part, mask, (64, c0), 'conv_part')
        x_rpn = branch(rpn, mask, (64, c0), 'conv_rpn')
        merged = jnp.concatenate([x_rpn, x_part], axis=-1)  # (BR, G³ 2c0)
        shared = merged.reshape(br, -1)

        dp = float(cfg.get('DP_RATIO', 0.3))
        fcs = tuple(cfg.SHARED_FC)
        for i, ch in enumerate(fcs):
            shared = nn.Dense(ch, use_bias=False, name=f'shared_fc_{i}')(
                shared)
            shared = nn.BatchNorm(use_running_average=not training,
                                  momentum=0.99, epsilon=1e-3,
                                  name=f'shared_bn_{i}')(shared)
            shared = nn.relu(shared)
            if i != len(fcs) - 1 and dp > 0:
                shared = nn.Dropout(dp)(
                    shared,
                    deterministic=not (training or self.has_rng('dropout')))

        def fc_tower(x, chans, out_ch, name):
            for i, ch in enumerate(chans):
                x = nn.Dense(ch, use_bias=False, name=f'{name}_{i}')(x)
                x = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.99, epsilon=1e-3,
                                 name=f'{name}_bn_{i}')(x)
                x = nn.relu(x)
            return nn.Dense(out_ch, name=f'{name}_out')(x)

        rcnn_cls = fc_tower(shared, tuple(cfg.CLS_FC), self.num_class, 'cls')
        rcnn_reg = fc_tower(shared, tuple(cfg.REG_FC), 7, 'reg')

        if not training:
            batch_cls, batch_box = rht.generate_predicted_boxes(
                rois, rcnn_cls, rcnn_reg)
            batch_dict['batch_cls_preds'] = batch_cls
            batch_dict['batch_box_preds'] = batch_box
            batch_dict['cls_preds_normalized'] = False
            batch_dict['rcnn_cls'] = rcnn_cls
            batch_dict['rcnn_reg'] = rcnn_reg
        else:
            targets['rcnn_cls'] = rcnn_cls
            targets['rcnn_reg'] = rcnn_reg
            batch_dict['rcnn_cls'] = rcnn_cls
            batch_dict['rcnn_reg'] = rcnn_reg
            batch_dict['roi_targets'] = targets
        batch_dict['shared_features'] = shared.reshape(b, r, -1)
        return batch_dict
