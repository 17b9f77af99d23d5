"""Multi-head anchor RPN (CBGS-style grouped class heads).

Parity: ``pcdet/models/dense_heads/anchor_head_multi.py`` (:9-151 SingleHead
towers incl. SEPARATE_REG_CONFIG reg branches, :151-244 shared conv +
per-head forward with channel concatenation).  In the non-separate mode the
concatenated per-location layout [head0 anchors | head1 anchors | ...] is
exactly the global anchor order of the full ANCHOR_GENERATOR_CONFIG (heads
partition class_names in order), so target assignment, losses, and box
decoding reuse the AnchorHeadSingle core unchanged — the multi-head part is
purely the conv topology, which is the actual CBGS contribution.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from . import anchor_head_single as ahs


class AnchorHeadMulti(nn.Module):
    model_cfg: Any
    num_class: int
    class_names: tuple
    grid_size: tuple
    point_cloud_range: tuple
    predict_boxes_when_training: bool = True
    voxel_size: tuple = (0.05, 0.05, 0.1)

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        from ...config import to_cfg
        cfg = to_cfg(self.model_cfg)
        core = ahs.make_core(self.model_cfg, self.num_class,
                             self.class_names, np.asarray(self.grid_size),
                             list(self.point_cloud_range))
        x = batch_dict['spatial_features_2d']            # (B, H, W, C)
        if cfg.get('SHARED_CONV_NUM_FILTER', None):
            x = nn.Conv(int(cfg.SHARED_CONV_NUM_FILTER), (3, 3),
                        use_bias=False, name='shared_conv')(x)
            x = nn.BatchNorm(use_running_average=not training,
                             momentum=0.99, epsilon=1e-3,
                             name='shared_bn')(x)
            x = nn.relu(x)

        head_cfgs = list(cfg.RPN_HEAD_CFGS)
        # anchors per location for each class, in class_names order
        per_class_a = list(core.num_anchors_per_location)
        anchor_names = [c['class_name']
                        for c in cfg.ANCHOR_GENERATOR_CONFIG]
        name_to_a = dict(zip(anchor_names, per_class_a))
        sep_reg = cfg.get('SEPARATE_REG_CONFIG', None)
        code = core.box_coder.code_size
        use_dir = cfg.get('USE_DIRECTION_CLASSIFIER', False)
        n_dir = int(cfg.get('NUM_DIR_BINS', 2))

        cls_list, box_list, dir_list = [], [], []
        for h, head_cfg in enumerate(head_cfgs):
            names = list(head_cfg['HEAD_CLS_NAME'])
            a_h = sum(int(name_to_a[n]) for n in names)

            def mid_tower(inp, tag):
                y = inp
                if sep_reg is not None:
                    for k in range(int(sep_reg.NUM_MIDDLE_CONV)):
                        y = nn.Conv(int(sep_reg.NUM_MIDDLE_FILTER), (3, 3),
                                    use_bias=False,
                                    name=f'head{h}_{tag}_mid{k}')(y)
                        y = nn.BatchNorm(use_running_average=not training,
                                         momentum=0.99, epsilon=1e-3,
                                         name=f'head{h}_{tag}_bn{k}')(y)
                        y = nn.relu(y)
                return y

            ksz = (3, 3) if sep_reg is not None else (1, 1)
            yc = mid_tower(x, 'cls')
            cls_h = nn.Conv(a_h * self.num_class, ksz,
                            bias_init=nn.initializers.constant(
                                -np.log((1 - 0.01) / 0.01)),
                            name=f'head{h}_conv_cls')(yc)
            cls_list.append(cls_h.reshape(*cls_h.shape[:3], a_h,
                                          self.num_class))
            if sep_reg is not None:
                parts = []
                for reg in sep_reg.REG_LIST:
                    rname, rch = str(reg).split(':')
                    yb = mid_tower(x, f'reg_{rname}')
                    parts.append(nn.Conv(a_h * int(rch), ksz,
                                         name=f'head{h}_conv_{rname}')(yb)
                                 .reshape(*x.shape[:3], a_h, int(rch)))
                box_h = jnp.concatenate(parts, axis=-1)
            else:
                box_h = nn.Conv(a_h * code, ksz,
                                name=f'head{h}_conv_box')(x).reshape(
                    *x.shape[:3], a_h, code)
            box_list.append(box_h)
            if use_dir:
                dir_h = nn.Conv(a_h * n_dir, ksz,
                                name=f'head{h}_conv_dir')(x).reshape(
                    *x.shape[:3], a_h, n_dir)
                dir_list.append(dir_h)

        b, hh, ww = x.shape[:3]
        cls_preds = jnp.concatenate(cls_list, axis=3).reshape(b, hh, ww, -1)
        box_preds = jnp.concatenate(box_list, axis=3).reshape(b, hh, ww, -1)
        batch_dict['cls_preds'] = cls_preds
        batch_dict['box_preds'] = box_preds
        dir_cls_preds = None
        if use_dir:
            dir_cls_preds = jnp.concatenate(dir_list, axis=3).reshape(
                b, hh, ww, -1)
            batch_dict['dir_cls_preds'] = dir_cls_preds

        if training and 'gt_boxes' in batch_dict:
            batch_dict.update(core.assign_targets(batch_dict['gt_boxes']))
        if (not training) or self.predict_boxes_when_training:
            batch_cls_preds, batch_box_preds = core.generate_predicted_boxes(
                cls_preds, box_preds, dir_cls_preds)
            batch_dict['rpn_preds'] = cls_preds
            batch_dict['batch_cls_preds'] = batch_cls_preds
            batch_dict['batch_box_preds'] = batch_box_preds
            batch_dict['cls_preds_normalized'] = False
        return batch_dict
