"""Anchor head (Flax) + RPN losses.

Parity: ``pcdet/models/dense_heads/anchor_head_single.py`` (1×1 conv heads,
focal-init cls bias, exports ``rpn_preds`` at eval :41-76) and
``anchor_head_template.py`` (losses :101-227 incl. the AL layer's
``reduce=False`` per-sample mode and ``new_data=`` BADGE injection; box
decode :238-285).

TPU-first: the head is stateless w.r.t. targets — ``forward_ret_dict``
becomes extra keys in the batch_dict pytree; anchors are a host-side numpy
constant folded into the jitted graph; target assignment is the vmapped
fixed-shape assigner.
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils import box_coder as box_coder_utils
from ...utils import loss_utils, common
from .anchor_generator import generate_anchors
from .target_assigner import AxisAlignedTargetAssigner


class AnchorHeadCore:
    """Static (non-learned) machinery shared by head forward + losses:
    anchors, box coder, target assigner. Pure host-side construction."""

    def __init__(self, model_cfg, num_class, class_names, grid_size,
                 point_cloud_range):
        from ...config import to_cfg
        model_cfg = to_cfg(model_cfg)
        self.model_cfg = model_cfg
        self.num_class = num_class
        self.class_names = class_names
        tgt_cfg = model_cfg.TARGET_ASSIGNER_CONFIG
        self.box_coder = getattr(box_coder_utils, tgt_cfg.BOX_CODER)(
            num_dir_bins=tgt_cfg.get('NUM_DIR_BINS', 6),
            **tgt_cfg.get('BOX_CODER_CONFIG', {}))
        self.anchors_list, self.num_anchors_per_location = generate_anchors(
            model_cfg.ANCHOR_GENERATOR_CONFIG, grid_size=np.asarray(grid_size),
            point_cloud_range=point_cloud_range,
            anchor_ndim=self.box_coder.code_size)
        if tgt_cfg.get('NAME', 'AxisAlignedTargetAssigner') \
                == 'ATSSTargetAssigner':
            from .target_assigner import ATSSTargetAssigner
            self.target_assigner = ATSSTargetAssigner(
                model_cfg, class_names, box_coder=self.box_coder,
                match_height=tgt_cfg.MATCH_HEIGHT)
        else:
            self.target_assigner = AxisAlignedTargetAssigner(
                model_cfg, class_names, box_coder=self.box_coder,
                match_height=tgt_cfg.MATCH_HEIGHT)
        # flattened anchors in the (H, W, class·S·R) interleaved order — the
        # reference's torch.cat(self.anchors, dim=-3) (anchor_head_template:186)
        # Stored as NUMPY: the core is cached across jit traces, and a jnp
        # array created inside one trace is a tracer that must not leak into
        # the next trace.
        cat = np.concatenate(self.anchors_list, axis=-3)
        self._flat_anchors_np = cat.reshape(-1, cat.shape[-1]).astype(np.float32)
        self.total_anchors = self._flat_anchors_np.shape[0]

    @property
    def flat_anchors(self):
        return jnp.asarray(self._flat_anchors_np)

    def assign_targets(self, gt_boxes):
        return self.target_assigner.assign_targets(self.anchors_list, gt_boxes)

    def generate_predicted_boxes(self, cls_preds, box_preds, dir_cls_preds=None):
        """(B, H, W, C·A)-style preds → (B, A_total, num_class)/(B, A_total, 7+).
        Parity: ``anchor_head_template.generate_predicted_boxes:238-285``."""
        b = cls_preds.shape[0]
        batch_cls = cls_preds.reshape(b, self.total_anchors, -1)
        batch_box = box_preds.reshape(b, self.total_anchors, -1)
        anchors = self.flat_anchors[None]
        batch_box = self.box_coder.decode(batch_box, anchors)
        if dir_cls_preds is not None:
            cfg = self.model_cfg
            dir_offset = cfg.DIR_OFFSET
            dir_limit_offset = cfg.DIR_LIMIT_OFFSET
            num_bins = cfg.NUM_DIR_BINS
            dir_logits = dir_cls_preds.reshape(b, self.total_anchors, -1)
            dir_labels = dir_logits.argmax(axis=-1)
            period = 2 * np.pi / num_bins
            dir_rot = common.limit_period(
                batch_box[..., 6] - dir_offset, dir_limit_offset, period)
            heading = dir_rot + dir_offset + period * dir_labels.astype(batch_box.dtype)
            batch_box = batch_box.at[..., 6].set(heading)
        return batch_cls, batch_box


_CORE_CACHE: dict = {}


def make_core(model_cfg, num_class, class_names, grid_size, point_cloud_range):
    """Memoized core construction (anchor grids are ~MBs of numpy; building
    them once per config keeps repeated jit traces cheap). Keyed on config
    CONTENT — id()-keys collide after GC and returned stale cores."""
    import json
    try:
        cfg_key = json.dumps(dict(model_cfg), sort_keys=True, default=str)
    except TypeError:
        cfg_key = repr(model_cfg)
    key = (cfg_key, num_class, tuple(class_names),
           tuple(int(g) for g in grid_size),
           tuple(float(x) for x in point_cloud_range))
    if key not in _CORE_CACHE:
        _CORE_CACHE[key] = AnchorHeadCore(
            model_cfg, num_class, list(class_names), np.asarray(grid_size),
            list(point_cloud_range))
    return _CORE_CACHE[key]


class AnchorHeadSingle(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int
    class_names: tuple
    grid_size: tuple
    point_cloud_range: tuple
    predict_boxes_when_training: bool = True

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        core = make_core(self.model_cfg, self.num_class, self.class_names,
                         self.grid_size, self.point_cloud_range)
        num_anchors = sum(core.num_anchors_per_location)
        x = batch_dict['spatial_features_2d']  # (B, H, W, C)

        pi = 0.01
        cls_preds = nn.Conv(
            num_anchors * self.num_class, (1, 1),
            bias_init=nn.initializers.constant(-np.log((1 - pi) / pi)),
            name='conv_cls')(x)
        box_preds = nn.Conv(
            num_anchors * core.box_coder.code_size, (1, 1),
            kernel_init=nn.initializers.normal(stddev=0.001),
            name='conv_box')(x)

        batch_dict['cls_preds'] = cls_preds   # (B, H, W, A·C) — rpn logits
        batch_dict['box_preds'] = box_preds

        dir_cls_preds = None
        if core.model_cfg.get('USE_DIRECTION_CLASSIFIER', None) is not None:
            dir_cls_preds = nn.Conv(
                num_anchors * core.model_cfg.NUM_DIR_BINS, (1, 1),
                name='conv_dir_cls')(x)
            batch_dict['dir_cls_preds'] = dir_cls_preds

        if training and 'gt_boxes' in batch_dict:
            batch_dict.update(core.assign_targets(batch_dict['gt_boxes']))

        if (not training) or self.predict_boxes_when_training:
            batch_cls_preds, batch_box_preds = core.generate_predicted_boxes(
                cls_preds, box_preds, dir_cls_preds)
            batch_dict['rpn_preds'] = cls_preds  # AL: BADGE/CRB rpn signal
            batch_dict['batch_cls_preds'] = batch_cls_preds
            batch_dict['batch_box_preds'] = batch_box_preds
            batch_dict['cls_preds_normalized'] = False
        return batch_dict


# ---------------------------------------------------------------------------
# Losses (pure functions of batch_dict — parity anchor_head_template.py:101-227)
# ---------------------------------------------------------------------------

def add_sin_difference(boxes1, boxes2, dim: int = 6):
    rad_pred = jnp.sin(boxes1[..., dim:dim + 1]) * jnp.cos(boxes2[..., dim:dim + 1])
    rad_tg = jnp.cos(boxes1[..., dim:dim + 1]) * jnp.sin(boxes2[..., dim:dim + 1])
    b1 = jnp.concatenate([boxes1[..., :dim], rad_pred, boxes1[..., dim + 1:]], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :dim], rad_tg, boxes2[..., dim + 1:]], axis=-1)
    return b1, b2


def get_direction_target(anchors, reg_targets, dir_offset=0.0, num_bins=2):
    """anchors: (B, A, 7+); reg_targets: (B, A, C). One-hot (B, A, num_bins)."""
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = common.limit_period(rot_gt - dir_offset, 0, 2 * np.pi)
    dir_cls = jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32)
    dir_cls = jnp.clip(dir_cls, 0, num_bins - 1)
    return jax.nn.one_hot(dir_cls, num_bins, dtype=anchors.dtype)


def get_cls_layer_loss(batch_dict, core: AnchorHeadCore, reduce=True,
                       new_data=None):
    """Parity: ``anchor_head_template.get_cls_layer_loss:101-142`` incl. the
    BADGE ``new_data`` injection and ``reduce=False`` per-sample mode."""
    if new_data is None:
        cls_preds = batch_dict['cls_preds']
        box_cls_labels = batch_dict['box_cls_labels']
    else:
        cls_preds = new_data['cls_preds']
        box_cls_labels = new_data['box_cls_labels']
    b = cls_preds.shape[0]
    num_class = core.num_class
    cared = box_cls_labels >= 0
    positives = box_cls_labels > 0
    negatives = box_cls_labels == 0
    lw = core.model_cfg.LOSS_CONFIG.LOSS_WEIGHTS
    # CBGS multihead configs weight bg anchors (anchor_head_multi.py:259-262)
    pos_w = float(lw.get('pos_cls_weight', 1.0))
    neg_w = float(lw.get('neg_cls_weight', 1.0))
    cls_weights = (negatives * neg_w + positives * pos_w).astype(jnp.float32)
    pos_normalizer = jnp.clip(positives.sum(1, keepdims=True).astype(jnp.float32), 1.0)
    cls_weights = cls_weights / pos_normalizer
    labels = box_cls_labels
    if num_class == 1:
        labels = jnp.where(positives, 1, labels)
    cls_targets = labels * cared.astype(labels.dtype)
    one_hot = jax.nn.one_hot(cls_targets, num_class + 1,
                             dtype=cls_preds.dtype)[..., 1:]
    cls_preds = cls_preds.reshape(b, -1, num_class)
    loss_src = loss_utils.sigmoid_focal_cls_loss(cls_preds, one_hot, cls_weights)
    w = core.model_cfg.LOSS_CONFIG.LOSS_WEIGHTS['cls_weight']
    if reduce:
        return loss_src.sum() / b * w
    return loss_src.sum(axis=(-1, -2)) * w


def get_box_reg_layer_loss(batch_dict, core: AnchorHeadCore, reduce=True):
    """Parity: ``anchor_head_template.get_box_reg_layer_loss:169-227``."""
    box_preds = batch_dict['box_preds']
    dir_cls_preds = batch_dict.get('dir_cls_preds', None)
    box_reg_targets = batch_dict['box_reg_targets']
    box_cls_labels = batch_dict['box_cls_labels']
    b = box_preds.shape[0]
    lw = core.model_cfg.LOSS_CONFIG.LOSS_WEIGHTS

    positives = box_cls_labels > 0
    reg_weights = positives.astype(jnp.float32)
    pos_normalizer = jnp.clip(positives.sum(1, keepdims=True).astype(jnp.float32), 1.0)
    reg_weights = reg_weights / pos_normalizer

    anchors = jnp.broadcast_to(core.flat_anchors[None],
                               (b, *core.flat_anchors.shape))
    box_preds = box_preds.reshape(b, -1, core.box_coder.code_size)
    preds_sin, targets_sin = add_sin_difference(box_preds, box_reg_targets)
    reg_loss_type = core.model_cfg.LOSS_CONFIG.get(
        'REG_LOSS_TYPE', 'WeightedSmoothL1Loss')
    reg_fn = (loss_utils.weighted_l1_loss if reg_loss_type == 'WeightedL1Loss'
              else loss_utils.weighted_smooth_l1_loss)
    loc_loss_src = reg_fn(
        preds_sin, targets_sin, reg_weights, code_weights=lw['code_weights'])
    if reduce:
        loc_loss = loc_loss_src.sum() / b
    else:
        loc_loss = loc_loss_src.sum(axis=(-1, -2))
    box_loss = loc_loss * lw['loc_weight']

    if dir_cls_preds is not None:
        cfg = core.model_cfg
        dir_targets = get_direction_target(
            anchors, box_reg_targets, dir_offset=cfg.DIR_OFFSET,
            num_bins=cfg.NUM_DIR_BINS)
        dir_logits = dir_cls_preds.reshape(b, -1, cfg.NUM_DIR_BINS)
        weights = positives.astype(dir_logits.dtype)
        weights = weights / jnp.clip(weights.sum(-1, keepdims=True), 1.0)
        dir_loss = loss_utils.weighted_cross_entropy_loss(
            dir_logits, dir_targets, weights)
        dir_loss = (dir_loss.sum() / b) if reduce else dir_loss.sum(axis=-1)
        box_loss = box_loss + dir_loss * lw['dir_weight']
    return box_loss


def get_loss(batch_dict, core: AnchorHeadCore, reduce=True):
    """rpn_loss = cls + box (+dir). Parity: ``get_loss:229-236``."""
    cls_loss = get_cls_layer_loss(batch_dict, core, reduce=reduce)
    box_loss = get_box_reg_layer_loss(batch_dict, core, reduce=reduce)
    rpn_loss = cls_loss + box_loss
    tb = {'rpn_loss_cls': cls_loss, 'rpn_loss_loc': box_loss,
          'rpn_loss': rpn_loss}
    return rpn_loss, tb


def build_dense_head(model_cfg, input_channels, num_class, class_names,
                     grid_size, point_cloud_range, predict_boxes_when_training=True,
                     voxel_size=None):
    name = model_cfg['NAME']
    if name == 'CenterHead':
        from .center_head import CenterHead
        return CenterHead(
            model_cfg=model_cfg, input_channels=input_channels,
            num_class=num_class, class_names=tuple(class_names),
            grid_size=tuple(int(g) for g in grid_size),
            point_cloud_range=tuple(float(x) for x in point_cloud_range),
            voxel_size=tuple(float(v) for v in (voxel_size or (1, 1, 1))),
            predict_boxes_when_training=predict_boxes_when_training)
    if name == 'AnchorHeadSingle':
        return AnchorHeadSingle(
            model_cfg=model_cfg, input_channels=input_channels,
            num_class=num_class, class_names=tuple(class_names),
            grid_size=tuple(int(g) for g in grid_size),
            point_cloud_range=tuple(float(x) for x in point_cloud_range),
            predict_boxes_when_training=predict_boxes_when_training)
    if name == 'AnchorHeadMulti':
        from .anchor_head_multi import AnchorHeadMulti
        return AnchorHeadMulti(
            model_cfg=model_cfg, num_class=num_class,
            class_names=tuple(class_names),
            grid_size=tuple(int(g) for g in grid_size),
            point_cloud_range=tuple(float(x) for x in point_cloud_range),
            predict_boxes_when_training=predict_boxes_when_training)
    raise KeyError(f'unknown dense head {name}')
