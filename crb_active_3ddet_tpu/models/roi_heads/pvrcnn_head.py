"""PV-RCNN RoI head (Flax).

Parity: ``pcdet/models/roi_heads/pvrcnn_head.py`` — RoI-grid pooling over
keypoint features (6³ grid, :68-137), shared FC with Dropout(DP_RATIO)
(:20-33), cls/reg heads, MC-dropout ``SAMPLING_ROUND`` re-runs at eval
(:188-202), coreset ``EMBEDDING_REQUIRED`` shared-features export
(:204-205), llal LossNet latent taps (:163-179).

TPU-first: MC rounds are a static Python loop of the (shared-FC → heads)
tail with fresh dropout rngs — one jitted program, no Python-side module
mutation; the roi-grid ball query is the vmapped fixed-capacity op.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import common
from ..backbones_3d.pfe import StackSAModuleMSG
from . import roi_head_template as rht
from .loss_net import LossNet


def get_dense_grid_points(rois, grid_size: int):
    """(N, 7) rois → (N, G³, 3) local grid points (parity :131-139)."""
    g = grid_size
    idx = jnp.stack(jnp.meshgrid(jnp.arange(g), jnp.arange(g), jnp.arange(g),
                                 indexing='ij'), axis=-1).reshape(-1, 3)
    idx = idx.astype(jnp.float32)
    local_size = rois[:, None, 3:6]
    return (idx[None] + 0.5) / g * local_size - local_size / 2


def get_global_grid_points_of_roi(rois, grid_size: int):
    """(N, 7) rois → (N, G³, 3) global grid points (parity :120-129)."""
    local = get_dense_grid_points(rois, grid_size)
    rotated = common.rotate_points_along_z(local, rois[:, 6])
    return rotated + rois[:, None, 0:3]


class PVRCNNHead(nn.Module):
    model_cfg: Any
    num_class: int = 1

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        from ...config import to_cfg
        cfg = to_cfg(self.model_cfg)
        if 'rois' not in batch_dict:
            nms_cfg = cfg.NMS_CONFIG['TRAIN' if training else 'TEST']
            batch_dict = rht.proposal_layer(batch_dict, nms_cfg,
                                            num_class_names=self.num_class)
            if training:
                rng = self.make_rng('dropout')
                targets = rht.assign_targets(rng, batch_dict,
                                             cfg.TARGET_CONFIG)
                batch_dict['rois'] = targets['rois']
                batch_dict['roi_labels'] = targets['roi_labels']
                batch_dict['roi_valid'] = jnp.ones(
                    targets['rois'].shape[:2], bool)
        elif training:
            # PVRCNN++ ran the proposal stage before the PFE
            targets = batch_dict['roi_targets_dict']

        rois = batch_dict['rois']               # (B, R, 7)
        b, r = rois.shape[:2]
        grid_size = int(cfg.ROI_GRID_POOL.GRID_SIZE)

        # ---- RoI grid pooling (:68-117) ----
        point_coords = batch_dict['point_coords']        # (B, K, 3)
        point_valid = batch_dict['point_coords_valid']
        point_features = batch_dict['point_features'] \
            * batch_dict['point_cls_scores'][..., None]

        grid_pts = jax.vmap(lambda rr: get_global_grid_points_of_roi(
            rr, grid_size))(rois)                        # (B, R, G³, 3)
        grid_pts = grid_pts.reshape(b, r * grid_size ** 3, 3)
        grid_valid = jnp.ones(grid_pts.shape[:2], bool)

        if 'NUM_GROUPS' in cfg.ROI_GRID_POOL:   # PV-RCNN++ vector pool
            from ..backbones_3d.vector_pool import VectorPoolAggregationMSG
            pool = VectorPoolAggregationMSG(config=cfg.ROI_GRID_POOL,
                                            name='roi_grid_pool')
        else:
            pool = StackSAModuleMSG(
                radii=tuple(cfg.ROI_GRID_POOL.POOL_RADIUS),
                nsamples=tuple(cfg.ROI_GRID_POOL.NSAMPLE),
                mlps=tuple(tuple(m) for m in cfg.ROI_GRID_POOL.MLPS),
                name='roi_grid_pool')
        pooled = pool(point_coords, point_valid, grid_pts, grid_valid,
                      point_features, training)          # (B, R·G³, C)
        c_out = pooled.shape[-1]
        pooled = pooled.reshape(b * r, grid_size ** 3 * c_out)

        # ---- shared FC tower with dropout taps ----
        # instantiate all layers ONCE (flax forbids re-creating named
        # modules); MC rounds then re-call the same instances with fresh
        # dropout rngs
        shared_fc = list(cfg.SHARED_FC)
        dp_ratio = float(cfg.get('DP_RATIO', 0.0))
        use_loss_net = bool(cfg.get('LOSS_NET', None))
        mc_rounds = int(cfg.get('SAMPLING_ROUND', 0) or 0)
        deterministic = not (training or self.has_rng('dropout'))

        shared_layers = [
            (nn.Dense(ch, use_bias=False, name=f'shared_fc_{k}'),
             nn.BatchNorm(use_running_average=not training, momentum=0.99,
                          epsilon=1e-3, name=f'shared_bn_{k}'))
            for k, ch in enumerate(shared_fc)]

        def make_head(fc_list, out_ch, name):
            layers = [
                (nn.Dense(ch, use_bias=False, name=f'{name}_fc_{k}'),
                 nn.BatchNorm(use_running_average=not training,
                              momentum=0.99, epsilon=1e-3,
                              name=f'{name}_bn_{k}'))
                for k, ch in enumerate(fc_list)]
            out = nn.Dense(out_ch, name=f'{name}_out',
                           kernel_init=nn.initializers.normal(0.001))
            return layers, out

        cls_layers, cls_out = make_head(cfg.CLS_FC, self.num_class, 'cls')
        reg_layers, reg_out = make_head(
            cfg.REG_FC, rht._CODER.code_size * self.num_class, 'reg')
        dropout = nn.Dropout(dp_ratio) if dp_ratio > 0 else None

        def run_head(x, layers, out):
            for k, (dense, bn) in enumerate(layers):
                x = nn.relu(bn(dense(x)))
                if k == 0 and dropout is not None:
                    x = dropout(x, deterministic=deterministic)
            return out(x)

        def tower(x):
            latents = []
            for k, (dense, bn) in enumerate(shared_layers):
                x = nn.relu(bn(dense(x)))
                latents.append(x)
                if k != len(shared_layers) - 1 and dropout is not None:
                    x = dropout(x, deterministic=deterministic)
            return (x, run_head(x, cls_layers, cls_out),
                    run_head(x, reg_layers, reg_out), latents)

        shared, rcnn_cls, rcnn_reg, latents = tower(pooled)

        if use_loss_net:
            loss_preds = LossNet(model_cfg=cfg, name='loss_net')(
                latents, batch_size=b, training=training)
            if training:
                batch_dict['loss_predictions_train'] = loss_preds
            else:
                batch_dict['loss_predictions'] = loss_preds

        if not training:
            if mc_rounds > 1 and not deterministic:
                # MC-dropout rounds (:188-202): rerun the tower with live
                # dropout; BN stays in eval mode
                cls_list, reg_list = [rcnn_cls], [rcnn_reg]
                for _ in range(mc_rounds - 1):
                    _, c_i, r_i, _ = tower(pooled)
                    cls_list.append(c_i)
                    reg_list.append(r_i)
                batch_dict['rcnn_cls'] = jnp.stack(cls_list, 0)  # (S, BR, 1)
                batch_dict['rcnn_reg'] = jnp.stack(reg_list, 0)
            else:
                batch_dict['rcnn_cls'] = rcnn_cls
                batch_dict['rcnn_reg'] = rcnn_reg
            if cfg.get('EMBEDDING_REQUIRED', False):
                batch_dict['shared_features'] = shared.reshape(b, r, -1)

            batch_cls_preds, batch_box_preds = rht.generate_predicted_boxes(
                rois, rcnn_cls, rcnn_reg)
            batch_dict['batch_cls_preds'] = batch_cls_preds
            batch_dict['batch_box_preds'] = batch_box_preds
            batch_dict['cls_preds_normalized'] = False
        else:
            targets['rcnn_cls'] = rcnn_cls
            targets['rcnn_reg'] = rcnn_reg
            batch_dict['rcnn_cls'] = rcnn_cls
            batch_dict['rcnn_reg'] = rcnn_reg
            batch_dict['roi_targets'] = targets
            loss, tb = rht.get_rcnn_loss(targets, cfg.LOSS_CONFIG)
            batch_dict['rcnn_loss'] = loss
            batch_dict['rcnn_loss_tb'] = tb
        return batch_dict


def build_roi_head(model_cfg, num_class, voxel_size, point_cloud_range):
    name = model_cfg['NAME']
    # CLASS_AGNOSTIC roi heads use num_class=1 (roi_head_template)
    agnostic = model_cfg.get('CLASS_AGNOSTIC', True)
    nc = 1 if agnostic else num_class
    if name == 'PVRCNNHead':
        return PVRCNNHead(model_cfg=model_cfg, num_class=nc)
    if name == 'PointRCNNHead':
        from .pointrcnn_head import PointRCNNHead
        return PointRCNNHead(model_cfg=model_cfg, num_class=nc)
    if name == 'PartA2FCHead':
        from .parta2_head import PartA2FCHead
        return PartA2FCHead(model_cfg=model_cfg, num_class=nc)
    if name == 'VoxelRCNNHead':
        from .voxelrcnn_head import VoxelRCNNHead
        return VoxelRCNNHead(model_cfg=model_cfg, num_class=nc,
                             voxel_size=tuple(float(v) for v in voxel_size),
                             point_cloud_range=tuple(
                                 float(x) for x in point_cloud_range))
    if name == 'SECONDHead':
        from .second_head import SECONDHead
        return SECONDHead(model_cfg=model_cfg, num_class=nc,
                          voxel_size=tuple(float(v) for v in voxel_size),
                          point_cloud_range=tuple(
                              float(x) for x in point_cloud_range))
    raise KeyError(f'unknown roi head {name}')
