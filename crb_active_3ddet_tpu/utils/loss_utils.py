"""Loss functions (pure JAX). Parity: ``pcdet/utils/loss_utils.py``.

All losses are elementwise / per-anchor and return unreduced tensors so the
caller can apply the reference's weighting and — crucially for the AL layer —
the ``reduce=False`` per-sample mode (``anchor_head_template.py:101-142``,
``roi_head_template.py:142-287``) used by BADGE / CRB / llal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sigmoid_focal_cls_loss(input, target, weights, gamma: float = 2.0,
                           alpha: float = 0.25):
    """Sigmoid focal loss (parity: ``SigmoidFocalClassificationLoss``,
    `loss_utils.py:9-72`). input/target: (B, A, C); weights: (B, A) or (B, A, C).
    Returns (B, A, C) weighted loss."""
    pred_sigmoid = jax.nn.sigmoid(input)
    alpha_weight = target * alpha + (1 - target) * (1 - alpha)
    pt = target * (1.0 - pred_sigmoid) + (1.0 - target) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)

    # numerically-stable BCE-with-logits
    bce = jnp.clip(input, 0) - input * target + jnp.log1p(jnp.exp(-jnp.abs(input)))
    loss = focal_weight * bce
    if weights.ndim == 2 or (weights.ndim == loss.ndim - 1):
        weights = weights[..., None]
    return loss * weights


def smooth_l1_loss(diff, beta: float = 1.0 / 9.0):
    if beta < 1e-5:
        return jnp.abs(diff)
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)


def weighted_smooth_l1_loss(input, target, weights=None, beta: float = 1.0 / 9.0,
                            code_weights=None):
    """Parity: ``WeightedSmoothL1Loss`` (`loss_utils.py:75-129`).
    input/target: (B, A, D); weights: (B, A). Returns (B, A, D)."""
    target = jnp.where(jnp.isnan(target), input, target)
    diff = input - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)[None, None, :]
    loss = smooth_l1_loss(diff, beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_l1_loss(input, target, weights=None, code_weights=None):
    """Parity: ``WeightedL1Loss`` (`loss_utils.py:132-170`)."""
    target = jnp.where(jnp.isnan(target), input, target)
    diff = input - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)[None, None, :]
    loss = jnp.abs(diff)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy_loss(input, target, weights):
    """Parity: ``WeightedCrossEntropyLoss`` (`loss_utils.py:173-207`).
    input: (B, A, C) logits; target: (B, A, C) one-hot; weights (B, A)."""
    logprobs = jax.nn.log_softmax(input, axis=-1)
    loss = -(target * logprobs).sum(axis=-1)
    return loss * weights


def binary_cross_entropy_with_logits(input, target):
    """Unreduced BCE-with-logits (rcnn cls loss, `roi_head_template.py:261+`)."""
    return jnp.clip(input, 0) - input * target + jnp.log1p(jnp.exp(-jnp.abs(input)))


def get_corner_loss_lidar(pred_bbox3d, gt_bbox3d):
    """Corner loss with flipped-gt minimum (parity:
    ``loss_utils.get_corner_loss_lidar`` `loss_utils.py:210-239`).
    pred/gt: (N, 7) → (N,) mean-over-8-corners smooth-L1 (beta=1)."""
    from . import box_utils
    pred_corners = box_utils.boxes_to_corners_3d(pred_bbox3d)
    gt_corners = box_utils.boxes_to_corners_3d(gt_bbox3d)
    gt_flip = gt_bbox3d.at[:, 6].add(jnp.pi) if isinstance(gt_bbox3d, jnp.ndarray) \
        else np.concatenate([gt_bbox3d[:, :6], gt_bbox3d[:, 6:7] + np.pi], axis=1)
    gt_corners_flip = box_utils.boxes_to_corners_3d(gt_flip)
    dist = jnp.minimum(
        jnp.linalg.norm(pred_corners - gt_corners, axis=-1),
        jnp.linalg.norm(pred_corners - gt_corners_flip, axis=-1))
    return smooth_l1_loss(dist, beta=1.0).mean(axis=1)


def loss_pred_loss(input, target, margin: float = 1.0):
    """LossPredLoss margin-ranking loss for the llal LossNet (parity:
    ``roi_head_template.LossPredLoss`` `roi_head_template.py:289-310`).

    input: (B,) predicted losses; target: (B,) true per-sample losses.
    Pairs (i, B/2+i); requires even B.
    """
    b = input.shape[0]
    half = b // 2
    inp = input[:2 * half]
    tgt = target[:2 * half]
    input_diff = inp[:half] - inp[half:]
    target_diff = tgt[:half] - tgt[half:]
    one = jnp.where(target_diff > 0, 1.0, -1.0)
    loss = jnp.clip(margin - one * input_diff, 0)
    return loss.mean()
