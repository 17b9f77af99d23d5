"""CenterPoint head (Flax) — anchor-free center-based detection.

Parity: ``pcdet/models/dense_heads/center_head.py`` (~355 LoC; SeparateHead
branches, gaussian heatmap targets via ``centernet_utils.draw_gaussian_to_heatmap``,
gaussian focal loss + L1 reg loss, max-pool peak decoding) registered for the
CenterPoint detector (``pcdet/models/detectors/centerpoint.py``).

TPU-first: heatmap targets are drawn fully vectorized — a (M, H, W) gaussian
bank maxed over boxes per class (the reference loops boxes on CPU/GPU);
decoding is 3×3 maxpool peak suppression + one global top-k; everything is
fixed-shape.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp


def gaussian_radius(dx, dy, min_overlap=0.5):
    """CornerNet radius heuristic (parity: centernet_utils.gaussian_radius)."""
    a1 = 1
    b1 = dy + dx
    c1 = dx * dy * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, 0))
    r1 = (b1 + sq1) / 2
    a2 = 4
    b2 = 2 * (dy + dx)
    c2 = (1 - min_overlap) * dx * dy
    sq2 = jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, 0))
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (dy + dx)
    c3 = (min_overlap - 1) * dx * dy
    sq3 = jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def make_center_targets(gt_boxes, num_classes, grid_hw, pcr, voxel_size,
                        stride, max_objs, min_radius=2.0):
    """Single frame: gt_boxes (M, 8) → heatmaps (C, H, W) + reg targets.

    Returns dict(heatmap (C,H,W), inds (max_objs,), mask (max_objs,),
    reg_targets (max_objs, 8): [dx_off, dy_off, z, log l, log w, log h,
    sin, cos])."""
    h, w = grid_hw
    labels = gt_boxes[:, -1].astype(jnp.int32)
    valid = jnp.abs(gt_boxes).sum(-1) > 0
    m = gt_boxes.shape[0]

    cx = (gt_boxes[:, 0] - pcr[0]) / voxel_size[0] / stride   # (M,) fm coords
    cy = (gt_boxes[:, 1] - pcr[1]) / voxel_size[1] / stride
    dxf = gt_boxes[:, 3] / voxel_size[0] / stride
    dyf = gt_boxes[:, 4] / voxel_size[1] / stride
    radius = jnp.clip(gaussian_radius(dyf, dxf), min_radius)

    # gaussian centered on the INT cell (reference draw_gaussian_to_heatmap
    # centers at the integer location so the peak is exactly 1)
    cxi = jnp.floor(cx)
    cyi = jnp.floor(cy)
    xs = jnp.arange(w)[None, None, :]
    ys = jnp.arange(h)[None, :, None]
    d2 = (xs - cxi[:, None, None]) ** 2 + (ys - cyi[:, None, None]) ** 2
    sigma2 = (2 * radius[:, None, None] / 3) ** 2 / 2
    g = jnp.exp(-d2 / jnp.clip(2 * sigma2, 1e-6))             # (M, H, W)
    in_bounds = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h) & valid
    g = jnp.where(in_bounds[:, None, None], g, 0.0)

    onehot = jax.nn.one_hot(labels - 1, num_classes, axis=0)  # (C, M)
    heatmap = (onehot[:, :, None, None] * g[None]).max(axis=1)  # (C, H, W)

    # regression targets at integer centers, first max_objs boxes
    xi = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, h - 1)
    inds = (yi * w + xi).astype(jnp.int32)[:max_objs]
    mask = in_bounds[:max_objs]
    reg = jnp.stack([
        cx - xi, cy - yi, gt_boxes[:, 2],
        jnp.log(jnp.clip(gt_boxes[:, 3], 1e-3)),
        jnp.log(jnp.clip(gt_boxes[:, 4], 1e-3)),
        jnp.log(jnp.clip(gt_boxes[:, 5], 1e-3)),
        jnp.sin(gt_boxes[:, 6]), jnp.cos(gt_boxes[:, 6])], axis=1)[:max_objs]
    cls_ind = (labels - 1)[:max_objs]
    return {'heatmap': heatmap, 'inds': inds, 'mask': mask,
            'reg_targets': reg, 'cls_ind': cls_ind}


def gaussian_focal_loss(pred, target, alpha=2.0, beta=4.0):
    """CenterNet focal loss (parity: loss_utils.FocalLossCenterNet)."""
    eps = 1e-6
    pred = jnp.clip(jax.nn.sigmoid(pred), eps, 1 - eps)
    pos = (target >= 1.0 - 1e-4).astype(pred.dtype)
    neg_weights = jnp.power(1 - target, beta)
    pos_loss = -jnp.log(pred) * jnp.power(1 - pred, alpha) * pos
    neg_loss = -jnp.log(1 - pred) * jnp.power(pred, alpha) * neg_weights * (1 - pos)
    num_pos = jnp.clip(pos.sum(), 1.0)
    return (pos_loss.sum() + neg_loss.sum()) / num_pos


class CenterHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: tuple
    grid_size: tuple
    point_cloud_range: tuple
    voxel_size: tuple
    predict_boxes_when_training: bool = False

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        from ...config import to_cfg
        cfg = to_cfg(self.model_cfg)
        x = batch_dict['spatial_features_2d']           # (B, H, W, C)
        b, h, w, _ = x.shape
        stride = int(cfg.get('FEATURE_MAP_STRIDE', 8))
        max_objs = int(cfg.get('MAX_OBJS', 64))

        shared_ch = int(cfg.get('SHARED_CONV_CHANNEL', 64))
        x = nn.Conv(shared_ch, (3, 3), padding='SAME', use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3)(x)
        x = nn.relu(x)

        def branch(out_ch, name, bias_init=0.0):
            y = nn.Conv(shared_ch, (3, 3), padding='SAME',
                        name=f'{name}_conv')(x)
            y = nn.relu(y)
            return nn.Conv(out_ch, (3, 3), padding='SAME', name=f'{name}_out',
                           bias_init=nn.initializers.constant(bias_init))(y)

        heatmap = branch(self.num_class, 'hm', bias_init=-2.19)  # (B,H,W,C)
        center = branch(2, 'center')
        center_z = branch(1, 'center_z')
        dim = branch(3, 'dim')
        rot = branch(2, 'rot')

        batch_dict['center_heatmap'] = heatmap
        batch_dict['center_reg'] = jnp.concatenate(
            [center, center_z, dim, rot], axis=-1)      # (B, H, W, 8)

        if training:
            pcr = jnp.asarray(self.point_cloud_range)
            vs = jnp.asarray(self.voxel_size)
            targets = jax.vmap(partial(
                make_center_targets, num_classes=self.num_class,
                grid_hw=(h, w), pcr=pcr, voxel_size=vs, stride=stride,
                max_objs=max_objs))(batch_dict['gt_boxes'])
            batch_dict['center_targets'] = targets

        if not training or self.predict_boxes_when_training:
            batch_dict.update(self._decode(heatmap, center, center_z, dim,
                                           rot, stride))
        return batch_dict

    def _decode(self, heatmap, center, center_z, dim, rot, stride):
        """Peak extraction + box decode (parity: centernet_utils
        decode_bbox_from_heatmap). Output matches the anchor-head surface:
        batch_cls_preds (B, K, C) pseudo-logits + batch_box_preds (B, K, 7)."""
        b, h, w, c = heatmap.shape
        k = int(self.model_cfg.get('MAX_OBJS', 64))
        hm = jax.nn.sigmoid(heatmap)
        hmax = nn.max_pool(hm, (3, 3), strides=(1, 1), padding='SAME')
        peaks = jnp.where(hmax == hm, hm, 0.0)          # (B, H, W, C)
        flat = peaks.transpose(0, 3, 1, 2).reshape(b, c * h * w)
        scores, idx = jax.lax.top_k(flat, k)            # (B, K)
        cls_id = idx // (h * w)
        yx = idx % (h * w)
        yi = (yx // w).astype(jnp.float32)
        xi = (yx % w).astype(jnp.float32)

        def gather_hw(t, yx_idx):
            tf = t.reshape(b, h * w, t.shape[-1])
            return jnp.take_along_axis(tf, yx_idx[..., None], axis=1)

        ctr = gather_hw(center, yx)
        z = gather_hw(center_z, yx)[..., 0]
        dims = jnp.exp(gather_hw(dim, yx))
        r = gather_hw(rot, yx)
        angle = jnp.arctan2(r[..., 0], r[..., 1])
        pcr = self.point_cloud_range
        vs = self.voxel_size
        xs = (xi + ctr[..., 0]) * stride * vs[0] + pcr[0]
        ys = (yi + ctr[..., 1]) * stride * vs[1] + pcr[1]
        boxes = jnp.stack([xs, ys, z, dims[..., 0], dims[..., 1],
                           dims[..., 2], angle], axis=-1)
        # pseudo-logits: one-hot class scaled by logit(score) so the shared
        # post-processing's sigmoid+argmax reproduces (score, label)
        logits = jax.scipy.special.logit(jnp.clip(scores, 1e-6, 1 - 1e-6))
        cls_preds = (jax.nn.one_hot(cls_id, self.num_class) * logits[..., None]
                     + (jax.nn.one_hot(cls_id, self.num_class) - 1) * 20.0)
        return {'batch_cls_preds': cls_preds, 'batch_box_preds': boxes,
                'cls_preds_normalized': False,
                'rpn_preds': heatmap}


def get_center_loss(batch_dict, loss_cfg, reduce=True):
    """Heatmap focal + masked L1 reg (parity: center_head get_loss)."""
    t = batch_dict['center_targets']
    pred_hm = batch_dict['center_heatmap'].transpose(0, 3, 1, 2)  # (B,C,H,W)
    hm_per_sample = jax.vmap(gaussian_focal_loss)(pred_hm, t['heatmap'])

    reg = batch_dict['center_reg']
    b, h, w, _ = reg.shape
    reg_flat = reg.reshape(b, h * w, 8)
    pred_at = jnp.take_along_axis(reg_flat, t['inds'][..., None], axis=1)
    l1 = jnp.abs(pred_at - t['reg_targets'])
    mask = t['mask'][..., None].astype(l1.dtype)
    code_w = jnp.asarray(loss_cfg.LOSS_WEIGHTS.get(
        'code_weights', [1.0] * 8))[None, None, :]
    reg_per_sample = (l1 * mask * code_w).sum((1, 2)) / jnp.clip(
        (mask.sum((1, 2)) * l1.shape[-1]), 1.0)
    w_cls = loss_cfg.LOSS_WEIGHTS.get('cls_weight', 1.0)
    w_loc = loss_cfg.LOSS_WEIGHTS.get('loc_weight', 2.0)
    per_sample = hm_per_sample * w_cls + reg_per_sample * w_loc
    if reduce:
        loss = per_sample.mean()
        return loss, {'center_hm_loss': hm_per_sample.mean(),
                      'center_reg_loss': reg_per_sample.mean()}
    return per_sample, {'center_hm_loss': hm_per_sample,
                        'center_reg_loss': reg_per_sample}
