"""Generic config-driven detector (Flax).

Parity: ``pcdet/models/detectors/detector3d_template.py`` (module topology
``vfe → backbone_3d → map_to_bev → pfe → backbone_2d → dense_head →
point_head → roi_head`` :24-53) and the thin detector forwards
(``pointpillar.py:9-34``, ``second_net.py:9-34``, ``pv_rcnn.py:9-43``).

TPU-first: one Flax module whose ``__call__`` threads the batch_dict through
the configured submodules; the training loss is a pure function
(``compute_loss``) so the train step can ``jax.value_and_grad`` it directly;
post-processing/NMS lives in :mod:`..post_processing` and is called outside
the gradient path.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

from ..backbones_3d.vfe import build_vfe
from ..backbones_2d import build_backbone_2d, build_map_to_bev
from ..dense_heads import build_dense_head
from ..dense_heads import anchor_head_single as ahs


class Detector3D(nn.Module):
    """Config-driven detector. Supports PointPillar / SECOND topology now;
    PV-RCNN modules (pfe/point_head/roi_head) plug into the same chain."""
    model_cfg: Any
    num_class: int
    class_names: tuple
    grid_size: tuple          # (nx, ny, nz)
    point_cloud_range: tuple
    voxel_size: tuple
    num_point_features: int

    def setup(self):
        from ...config import to_cfg
        cfg = to_cfg(self.model_cfg)
        modules = []
        if cfg.get('VFE', None) is not None:
            self.vfe = build_vfe(cfg.VFE, self.num_point_features,
                                 self.voxel_size, self.point_cloud_range,
                                 self.grid_size)
            modules.append('vfe')
            point_feats = self.vfe.get_output_feature_dim()
        else:
            point_feats = self.num_point_features

        if cfg.get('BACKBONE_3D', None) is not None:
            from ..backbones_3d.spconv_backbone import build_backbone_3d
            self.backbone_3d = build_backbone_3d(
                cfg.BACKBONE_3D, input_channels=point_feats,
                grid_size=self.grid_size, voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range)
            modules.append('backbone_3d')

        if cfg.get('MAP_TO_BEV', None) is not None:
            self.map_to_bev = build_map_to_bev(cfg.MAP_TO_BEV, self.grid_size)
            modules.append('map_to_bev')
            bev_feats = cfg.MAP_TO_BEV.NUM_BEV_FEATURES
        else:
            bev_feats = point_feats

        if cfg.get('BACKBONE_2D', None) is not None:
            self.backbone_2d = build_backbone_2d(cfg.BACKBONE_2D, bev_feats)
            modules.append('backbone_2d')
            bev_feats = self.backbone_2d.num_bev_features

        if cfg.get('DENSE_HEAD', None) is not None:
            self.dense_head = build_dense_head(
                cfg.DENSE_HEAD, input_channels=bev_feats,
                num_class=self.num_class, class_names=self.class_names,
                grid_size=self.grid_size,
                point_cloud_range=self.point_cloud_range,
                predict_boxes_when_training=cfg.get('ROI_HEAD', None) is not None,
                voxel_size=self.voxel_size)
            modules.append('dense_head')

        if cfg.get('POINT_HEAD', None) is not None:
            from ..point_heads import build_point_head
            self.point_head = build_point_head(
                cfg.POINT_HEAD, model_cfg=cfg, num_class=self.num_class,
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range)
            modules.append('point_head')

        if cfg.get('ROI_HEAD', None) is not None:
            from ..roi_heads import build_roi_head
            self.roi_head = build_roi_head(
                cfg.ROI_HEAD, num_class=self.num_class,
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range)
            modules.append('roi_head')

        if cfg.get('PFE', None) is not None:
            from ..backbones_3d.pfe import build_pfe
            self.pfe = build_pfe(
                cfg.PFE, voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                num_bev_features=bev_feats,
                num_rawpoint_features=self.num_point_features)
            # pfe runs between map_to_bev and backbone_2d in the reference
            # topology (detector3d_template.py:24-27)
            idx = modules.index('backbone_2d')
            modules.insert(idx, 'pfe')

        if cfg.NAME == 'PVRCNNPlusPlus':
            # proposals come BEFORE keypoint sampling so SPC can center on
            # them (reference pv_rcnn_plusplus.py:9-31)
            modules = [m for m in ('vfe', 'backbone_3d', 'map_to_bev',
                                   'backbone_2d', 'dense_head',
                                   'roi_proposal', 'pfe', 'point_head',
                                   'roi_head') if m == 'roi_proposal'
                       or m in modules]
        self.module_topology = tuple(modules)

    def __call__(self, batch_dict, training: bool = False):
        # never mutate the caller's dict — in-place tracer writes would leak
        # across jit traces (the reference mutates batch_dict freely; we copy)
        batch_dict = dict(batch_dict)
        for name in self.module_topology:
            if name == 'roi_proposal':
                batch_dict = self._early_roi_proposal(batch_dict, training)
                continue
            batch_dict = getattr(self, name)(batch_dict, training=training)
        return batch_dict

    def _early_roi_proposal(self, batch_dict, training):
        """PVRCNNPlusPlus: run proposal NMS + target assignment before the
        PFE so SPC keypoint sampling can center on the rois."""
        from ...config import to_cfg
        from ..roi_heads import roi_head_template as rht
        roi_cfg = to_cfg(self.model_cfg['ROI_HEAD'])
        nms_cfg = roi_cfg.NMS_CONFIG['TRAIN' if training else 'TEST']
        nc = 1 if roi_cfg.get('CLASS_AGNOSTIC', True) else self.num_class
        batch_dict = rht.proposal_layer(batch_dict, nms_cfg,
                                        num_class_names=nc)
        if training:
            rng = self.make_rng('dropout')
            targets = rht.assign_targets(rng, batch_dict,
                                         roi_cfg.TARGET_CONFIG)
            batch_dict['rois'] = targets['rois']
            batch_dict['roi_labels'] = targets['roi_labels']
            batch_dict['roi_valid'] = jnp.ones(targets['rois'].shape[:2],
                                               bool)
            batch_dict['roi_targets_dict'] = targets
        return batch_dict

    # ---- loss (pure function over the forward output) ----
    def compute_loss(self, batch_dict, reduce: bool = True):
        """Training loss. Parity: the detectors' ``get_training_loss``
        (``pointpillar.py:26-34``, ``second_net.py:26-34``, ``pv_rcnn.py``,
        ``parta2_net.py``, ``point_rcnn.py``) — rpn loss from the anchor
        head when present (+ point/rcnn losses)."""
        from ...config import to_cfg as _to_cfg
        tb = {}
        loss = 0.0
        if self.model_cfg.get('DENSE_HEAD', None) is not None:
            dh_cfg = _to_cfg(self.model_cfg['DENSE_HEAD'])
            if dh_cfg['NAME'] == 'CenterHead':
                from ..dense_heads.center_head import get_center_loss
                loss, tb = get_center_loss(batch_dict, dh_cfg.LOSS_CONFIG,
                                           reduce=reduce)
            else:
                core = ahs.make_core(
                    self.model_cfg['DENSE_HEAD'], self.num_class,
                    self.class_names, np.asarray(self.grid_size),
                    self.point_cloud_range)
                loss, tb = ahs.get_loss(batch_dict, core, reduce=reduce)
        if 'depth_logits' in batch_dict and 'depth_maps' in batch_dict:
            # CaDDN: loss = loss_rpn + loss_depth (caddn.py:25-38)
            from ..backbones_3d.image_vfe import get_ddn_loss
            vfe_cfg = _to_cfg(self.model_cfg['VFE'])
            depth_loss, depth_tb = get_ddn_loss(
                batch_dict, vfe_cfg.FFN,
                int(vfe_cfg.get('DOWNSAMPLE_FACTOR', 4)))
            loss = loss + depth_loss
            tb.update(depth_tb)
        if 'point_cls_preds' in batch_dict and 'point_cls_labels' in batch_dict:
            from ...config import to_cfg
            ph_cfg = to_cfg(self.model_cfg['POINT_HEAD'])
            lw = ph_cfg.LOSS_CONFIG.LOSS_WEIGHTS
            if ph_cfg['NAME'] == 'PointHeadBox':
                from ..point_heads.point_head_box import get_point_box_loss
                point_loss = get_point_box_loss(batch_dict, lw,
                                                self.num_class, reduce=reduce)
            elif ph_cfg['NAME'] == 'PointIntraPartOffsetHead':
                from ..point_heads.point_head_box import get_point_part_loss
                point_loss = get_point_part_loss(batch_dict, lw,
                                                 reduce=reduce)
            else:
                from ..point_heads.point_head_simple import get_point_loss
                point_loss = get_point_loss(batch_dict, lw, reduce=reduce)
            loss = loss + point_loss
            tb['point_loss'] = point_loss
        if 'roi_iou_targets' in batch_dict:
            from ..roi_heads.second_head import get_box_iou_layer_loss
            from ...config import to_cfg
            roi_cfg = to_cfg(self.model_cfg['ROI_HEAD'])
            iou_loss = get_box_iou_layer_loss(
                batch_dict['roi_iou_targets'], roi_cfg.LOSS_CONFIG)
            loss = loss + iou_loss
            tb['rcnn_loss_iou'] = iou_loss
        if 'roi_targets' in batch_dict:
            from ..roi_heads import roi_head_template as rht
            from ...config import to_cfg
            roi_cfg = to_cfg(self.model_cfg['ROI_HEAD'])
            rcnn_loss, rcnn_tb = rht.get_rcnn_loss(
                batch_dict['roi_targets'], roi_cfg.LOSS_CONFIG, reduce=reduce)
            loss = loss + rcnn_loss
            tb.update(rcnn_tb)
            tb['rcnn_loss'] = rcnn_loss
        tb['loss'] = loss
        return loss, tb


_DETECTOR_NAMES = {
    # all share the generic topology driver; names kept for config parity
    'PointPillar', 'SECONDNet', 'PVRCNN', 'CenterPoint', 'PartA2Net',
    'PointRCNN', 'SECONDNetIoU', 'VoxelRCNN', 'PVRCNNPlusPlus', 'CaDDN',
}


def build_detector(model_cfg, num_class, dataset):
    """dataset: provides grid_size, point_cloud_range, voxel_size,
    num_point_features, class_names (like pcdet's dataset objects)."""
    name = model_cfg.NAME
    if name not in _DETECTOR_NAMES:
        raise KeyError(f'unknown detector {name}')
    return Detector3D(
        model_cfg=model_cfg,
        num_class=num_class,
        class_names=tuple(dataset.class_names),
        grid_size=tuple(int(g) for g in dataset.grid_size),
        point_cloud_range=tuple(float(x) for x in dataset.point_cloud_range),
        voxel_size=tuple(float(v) for v in dataset.voxel_size),
        num_point_features=int(dataset.num_point_features),
    )
