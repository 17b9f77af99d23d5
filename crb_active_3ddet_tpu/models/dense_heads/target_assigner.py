"""Axis-aligned anchor target assignment (JAX, fixed shapes, jittable).

Parity: ``pcdet/models/dense_heads/target_assigner/axis_aligned_target_assigner.py``
(``assign_targets`` :37-133, ``assign_targets_single`` :135-212).  The
reference loops per batch sample and slices gt boxes per class; here the
whole assignment is one vmapped fixed-shape computation: the per-class gt
subset becomes an IoU mask (non-class or padded gts get IoU −1, so they can
never match), and the force-match / threshold logic is pure vector ops.

Assumes POS_FRACTION < 0 (no subsampling — true for every config in the
reference's active-KITTI/Waymo zoo), which keeps the assignment deterministic
and shape-static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.iou3d import boxes3d_nearest_bev_iou, boxes_iou3d


class AxisAlignedTargetAssigner:
    def __init__(self, model_cfg, class_names, box_coder, match_height=False):
        anchor_generator_cfg = model_cfg.ANCHOR_GENERATOR_CONFIG
        anchor_target_cfg = model_cfg.TARGET_ASSIGNER_CONFIG
        self.box_coder = box_coder
        self.match_height = match_height
        self.class_names = list(class_names)
        self.anchor_class_names = [c['class_name'] for c in anchor_generator_cfg]
        # class id (1-based, into class_names) each anchor set matches
        self.anchor_class_ids = [self.class_names.index(n) + 1
                                 for n in self.anchor_class_names]
        self.matched_thresholds = [float(c['matched_threshold'])
                                   for c in anchor_generator_cfg]
        self.unmatched_thresholds = [float(c['unmatched_threshold'])
                                     for c in anchor_generator_cfg]
        assert anchor_target_cfg.POS_FRACTION < 0, \
            'static-shape assigner requires POS_FRACTION < 0 (no sampling)'
        self.norm_by_num_examples = anchor_target_cfg.NORM_BY_NUM_EXAMPLES

    def assign_targets(self, all_anchors, gt_boxes_with_classes):
        """all_anchors: list of (1, ny, nx, S, R, 7) arrays (static);
        gt_boxes_with_classes: (B, M, 8) zero-padded.

        Returns dict with (B, num_total_anchors[, code_size]) arrays:
        box_cls_labels (int32; −1 ignore / 0 bg / c fg), box_reg_targets,
        reg_weights — flattened in the reference's (H, W, class·S·R) order.
        """
        gt_boxes = gt_boxes_with_classes[:, :, :-1]
        gt_classes = gt_boxes_with_classes[:, :, -1].astype(jnp.int32)
        gt_valid = jnp.abs(gt_boxes_with_classes).sum(axis=-1) > 0  # (B, M)

        feature_shape = all_anchors[0].shape[:3]  # (1, ny, nx)
        per_class = []
        for cls_id, anchors, m_th, u_th in zip(
                self.anchor_class_ids, all_anchors,
                self.matched_thresholds, self.unmatched_thresholds):
            flat_anchors = jnp.asarray(anchors.reshape(-1, anchors.shape[-1]))
            num_sr = int(np.prod(anchors.shape[3:5]))
            single = jax.vmap(
                partial(self._assign_single, flat_anchors, m_th, u_th, cls_id))(
                gt_boxes, gt_classes, gt_valid)
            # reshape to (B, H, W, S*R[, code]) for interleaved concat
            single = jax.tree.map(
                lambda t: t.reshape(t.shape[0], *feature_shape[1:], num_sr,
                                    *t.shape[2:]), single)
            per_class.append(single)

        b = gt_boxes.shape[0]
        cls_labels = jnp.concatenate([s['labels'] for s in per_class], axis=3)
        reg_targets = jnp.concatenate([s['reg_targets'] for s in per_class], axis=3)
        reg_weights = jnp.concatenate([s['reg_weights'] for s in per_class], axis=3)
        return {
            'box_cls_labels': cls_labels.reshape(b, -1),
            'box_reg_targets': reg_targets.reshape(b, -1, self.box_coder.code_size),
            'reg_weights': reg_weights.reshape(b, -1),
        }

    def _assign_single(self, anchors, matched_th, unmatched_th, cls_id,
                       gt_boxes, gt_classes, gt_valid):
        """Single sample, single anchor class. anchors: (N, 7);
        gt_boxes: (M, 7); gt_classes/gt_valid: (M,)."""
        num_anchors = anchors.shape[0]
        class_mask = gt_valid & (gt_classes == cls_id)  # (M,)

        iou_fn = boxes_iou3d if self.match_height else boxes3d_nearest_bev_iou
        overlap = iou_fn(anchors[:, :7], gt_boxes[:, :7])  # (N, M)
        overlap = jnp.where(class_mask[None, :], overlap, -1.0)

        anchor_to_gt_max = overlap.max(axis=1)
        anchor_to_gt_argmax = overlap.argmax(axis=1)
        gt_to_anchor_max = overlap.max(axis=0)  # (M,)
        # reference: empty gts (max overlap 0) are not force-matched
        gt_to_anchor_max = jnp.where(class_mask & (gt_to_anchor_max > 0),
                                     gt_to_anchor_max, -2.0)
        force_match = (overlap == gt_to_anchor_max[None, :]).any(axis=1)  # (N,)

        pos = anchor_to_gt_max >= matched_th
        bg = anchor_to_gt_max < unmatched_th
        fg = pos | force_match
        # label order follows the reference: start −1, bg→0, force/pos→cls_id
        labels = jnp.full((num_anchors,), -1, jnp.int32)
        labels = jnp.where(bg, 0, labels)
        labels = jnp.where(fg, cls_id, labels)

        matched_gt = gt_boxes[anchor_to_gt_argmax]  # (N, 7)
        reg_targets = jnp.where(
            fg[:, None], self.box_coder.encode(matched_gt, anchors), 0.0)

        reg_weights = fg.astype(jnp.float32)
        if self.norm_by_num_examples:
            num_examples = jnp.clip((labels >= 0).sum().astype(jnp.float32), 1.0)
            reg_weights = reg_weights / num_examples
        return {'labels': labels, 'reg_targets': reg_targets,
                'reg_weights': reg_weights}


class ATSSTargetAssigner:
    """Adaptive Training Sample Selection (arXiv:1912.02424).

    Parity: ``pcdet/models/dense_heads/target_assigner/atss_target_assigner.py``
    — per-gt top-k nearest anchors by center distance, adaptive IoU
    threshold mean+std(ddof=1), candidate centers must fall inside the gt
    footprint (the reference compares local x against dy and local y against
    dx per its own 'bugfixed' comment — preserved verbatim), conflicts
    resolved by max IoU, and each gt force-claims its best-IoU anchor.

    Fixed shapes: gt padded (B, M, 8); invalid gts get distance=BIG and
    IoU=0 so they never select candidates.
    """

    def __init__(self, model_cfg, class_names, box_coder, match_height=False,
                 topk=9):
        tgt = model_cfg.TARGET_ASSIGNER_CONFIG
        self.topk = int(tgt.get('TOPK', topk))
        self.box_coder = box_coder
        self.match_height = match_height

    def assign_targets(self, all_anchors, gt_boxes_with_classes):
        from ...ops import iou3d as iou_ops
        cat = jnp.concatenate([jnp.asarray(a) for a in all_anchors], axis=-3)
        anchors = cat.reshape(-1, cat.shape[-1])[:, :7]
        n = anchors.shape[0]

        gt_boxes = gt_boxes_with_classes[:, :, :7]
        gt_classes = gt_boxes_with_classes[:, :, -1].astype(jnp.int32)
        gt_valid = jnp.abs(gt_boxes_with_classes).sum(axis=-1) > 0
        big = jnp.float32(1e9)

        def single(gt, gt_cls, valid):
            m = gt.shape[0]
            if self.match_height:
                ious = iou_ops.boxes_iou3d(anchors, gt)        # (N, M)
            else:
                ious = iou_ops.boxes_iou_bev(anchors, gt)
            ious = jnp.where(valid[None, :], ious, 0.0)
            dist = jnp.linalg.norm(anchors[:, None, :3] - gt[None, :, :3],
                                   axis=-1)
            dist = jnp.where(valid[None, :], dist, big)
            k = min(self.topk, n)
            _, idx = jax.lax.top_k(-dist.T, k)                 # (M, K)
            cand = jnp.take_along_axis(ious.T, idx, axis=1)    # (M, K)
            mean = cand.mean(1)
            std = cand.std(1, ddof=1)
            thr = mean + std + 1e-6
            is_pos = cand >= thr[:, None]
            # candidate centers inside the gt footprint (quirk preserved)
            cand_xyz = anchors[idx][..., :3] - gt[:, None, :3]
            cosg = jnp.cos(-gt[:, 6])[:, None]
            sing = jnp.sin(-gt[:, 6])[:, None]
            lx = cand_xyz[..., 0] * cosg - cand_xyz[..., 1] * sing
            ly = cand_xyz[..., 0] * sing + cand_xyz[..., 1] * cosg
            lw = gt[:, 4:5], gt[:, 3:4]                        # (dy, dx)
            in_gt = (jnp.abs(lx) <= lw[0] / 2) & (jnp.abs(ly) <= lw[1] / 2)
            is_pos = is_pos & in_gt & valid[:, None]

            pos_mask = jnp.zeros((n, m), bool).at[
                idx, jnp.arange(m)[:, None]].max(is_pos)
            neg_inf = jnp.float32(-1e9)
            ious_inf = jnp.where(pos_mask, ious, neg_inf)
            a2g_val = ious_inf.max(1)
            a2g_idx = ious_inf.argmax(1)
            # each gt force-claims its best anchor
            best_anchor = jnp.where(valid, ious.argmax(0), n)
            a2g_idx = a2g_idx.at[best_anchor].set(
                jnp.arange(m), mode='drop')
            a2g_val = a2g_val.at[best_anchor].set(
                ious.max(0), mode='drop')

            pos = a2g_val > neg_inf
            cls_labels = jnp.where(pos, gt_cls[a2g_idx], 0)
            matched = gt[a2g_idx]
            reg_targets = jnp.where(
                pos[:, None], self.box_coder.encode(matched, anchors), 0.0)
            reg_weights = pos.astype(jnp.float32)
            return cls_labels.astype(jnp.int32), reg_targets, reg_weights

        cls, reg, w = jax.vmap(single)(gt_boxes, gt_classes, gt_valid)
        return {'box_cls_labels': cls, 'box_reg_targets': reg,
                'reg_weights': w}
