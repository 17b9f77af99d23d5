"""PointRCNN second stage: RoI point pooling + canonical PointNet encoder.

Parity: ``pcdet/models/roi_heads/pointrcnn_head.py`` — roipoint_pool3d of
raw points + [seg score, normalized depth, backbone features], canonical
transform into each ROI frame (:120-129), xyz-up + merge-down 1×1 convs,
3 PointnetSAModule stages (last one group-all), cls/reg FCs.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pointnet2 as pn2
from ...ops.roi_pooling import roipoint_pool3d
from ...utils import common
from ..backbones_3d.pfe import StackSAModuleMSG
from . import roi_head_template as rht


class PointRCNNHead(nn.Module):
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
        coords = batch_dict['point_coords']             # (B, N, 3)
        valid = batch_dict.get('point_valid',
                               batch_dict.get('point_coords_valid'))
        feats = batch_dict['point_features']            # (B, N, C)
        scores = jax.lax.stop_gradient(
            batch_dict['point_cls_scores'])             # (B, N)
        depth = jnp.linalg.norm(coords, axis=-1) \
            / float(cfg.ROI_POINT_POOL.DEPTH_NORMALIZER) - 0.5
        pool_feats = jnp.concatenate(
            [scores[..., None], depth[..., None], feats], axis=-1)

        s = int(cfg.ROI_POINT_POOL.NUM_SAMPLED_POINTS)
        extra = tuple(cfg.ROI_POINT_POOL.POOL_EXTRA_WIDTH)
        pooled, empty = jax.vmap(partial(
            roipoint_pool3d, num_sampled_points=s, extra_width=extra))(
            coords, pool_feats, rois,
            valid, jnp.ones((b, r), bool))              # (B, R, S, 3+2+C)

        # canonical transform (:120-129)
        local_xyz = pooled[..., 0:3] - rois[:, :, None, 0:3]
        local_xyz = common.rotate_points_along_z(
            local_xyz.reshape(b * r, s, 3),
            -rois.reshape(b * r, 7)[:, 6]).reshape(b, r, s, 3)
        pooled = jnp.concatenate([local_xyz, pooled[..., 3:]], axis=-1)
        pooled = jnp.where(empty[..., None, None], 0.0, pooled)
        pooled = pooled.reshape(b * r, s, -1)

        num_prefix = 5                                  # xyz + score + depth
        use_bn = bool(cfg.get('USE_BN', False))

        def mlp1x1(x, chans, name):
            for i, ch in enumerate(chans):
                x = nn.Dense(ch, use_bias=not use_bn,
                             name=f'{name}_{i}')(x)
                if use_bn:
                    x = nn.BatchNorm(use_running_average=not training,
                                     momentum=0.99, epsilon=1e-3,
                                     name=f'{name}_bn_{i}')(x)
                x = nn.relu(x)
            return x

        xyz_feats = mlp1x1(pooled[..., :num_prefix],
                           tuple(cfg.XYZ_UP_LAYER), 'xyz_up')
        pt_feats = pooled[..., num_prefix:]
        merged = jnp.concatenate([xyz_feats, pt_feats], axis=-1)
        merged = mlp1x1(merged, (int(cfg.XYZ_UP_LAYER[-1]),), 'merge_down')

        # SA encoder over each roi's point set
        xyz = pooled[..., 0:3]                          # (B·R, S, 3)
        pt_valid = jnp.ones(xyz.shape[:2], bool) \
            & ~empty.reshape(b * r)[:, None]
        x_feats = merged
        sa_cfg = cfg.SA_CONFIG
        for k, npoint in enumerate(sa_cfg.NPOINTS):
            if int(npoint) == -1:
                # group-all: one max-pooled feature per roi
                x = jnp.concatenate([xyz, x_feats], axis=-1)
                for li, ch in enumerate(sa_cfg.MLPS[k]):
                    # name by layer index — repeated widths (e.g. [512, 512])
                    # would collide under a width-based name
                    x = nn.Dense(ch, use_bias=False,
                                 name=f'sa{k}_d{li}')(x)
                    x = nn.BatchNorm(use_running_average=not training,
                                     momentum=0.99, epsilon=1e-3,
                                     name=f'sa{k}_bn{li}')(x)
                    x = nn.relu(x)
                x = jnp.where(pt_valid[..., None], x, -1e9)
                shared = x.max(axis=1)                  # (B·R, C)
                shared = jnp.where(shared <= -1e8, 0.0, shared)
                break
            fps_idx = jax.vmap(partial(pn2.farthest_point_sample,
                                       num_samples=int(npoint)))(
                xyz, pt_valid)
            new_xyz = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)
            new_valid = jnp.take_along_axis(pt_valid, fps_idx, axis=1)
            sa = StackSAModuleMSG(radii=(float(sa_cfg.RADIUS[k]),),
                                  nsamples=(int(sa_cfg.NSAMPLE[k]),),
                                  mlps=(tuple(sa_cfg.MLPS[k]),),
                                  name=f'sa_{k}')
            x_feats = sa(xyz, pt_valid, new_xyz, new_valid, x_feats,
                         training)
            xyz, pt_valid = new_xyz, new_valid

        def fc_tower(x, chans, out_ch, name):
            for i, ch in enumerate(chans):
                x = nn.Dense(ch, use_bias=False, name=f'{name}_{i}')(x)
                x = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.99, epsilon=1e-3,
                                 name=f'{name}_bn_{i}')(x)
                x = nn.relu(x)
            return nn.Dense(out_ch, name=f'{name}_out')(x)

        rcnn_cls = fc_tower(shared, tuple(cfg.CLS_FC), self.num_class,
                            'cls')                       # (B·R, 1)
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
