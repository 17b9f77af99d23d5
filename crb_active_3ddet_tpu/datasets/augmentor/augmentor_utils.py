"""Geometric augmentation primitives (host-side numpy, dataloader workers).

Parity: ``pcdet/datasets/augmentor/augmentor_utils.py`` (random_flip_along_x/y,
global_rotation, global_scaling + local per-object variants).  Uses
``np.random`` like the reference (per-worker seeded)."""

from __future__ import annotations

import numpy as np

from ...utils.common import rotate_points_along_z_single


def random_flip_along_x(gt_boxes, points):
    """Flip across the x axis (negate y). 50% chance."""
    enable = np.random.choice([False, True], p=[0.5, 0.5])
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 8] = -gt_boxes[:, 8]
    return gt_boxes, points


def random_flip_along_y(gt_boxes, points):
    """Flip across the y axis (negate x). 50% chance."""
    enable = np.random.choice([False, True], p=[0.5, 0.5])
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        gt_boxes[:, 6] = -(gt_boxes[:, 6] + np.pi)
        points[:, 0] = -points[:, 0]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]
    return gt_boxes, points


def global_rotation(gt_boxes, points, rot_range):
    noise_rotation = np.random.uniform(rot_range[0], rot_range[1])
    points = rotate_points_along_z_single(points, noise_rotation)
    gt_boxes = gt_boxes.copy()
    gt_boxes[:, 0:3] = rotate_points_along_z_single(
        gt_boxes[:, 0:3], noise_rotation)
    gt_boxes[:, 6] += noise_rotation
    if gt_boxes.shape[1] > 7:
        vel = np.concatenate([gt_boxes[:, 7:9],
                              np.zeros((gt_boxes.shape[0], 1), gt_boxes.dtype)], axis=1)
        gt_boxes[:, 7:9] = rotate_points_along_z_single(vel, noise_rotation)[:, :2]
    return gt_boxes, points


def global_scaling(gt_boxes, points, scale_range):
    if scale_range[1] - scale_range[0] < 1e-3:
        return gt_boxes, points
    noise_scale = np.random.uniform(scale_range[0], scale_range[1])
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, :3] *= noise_scale
    gt_boxes[:, :6] *= noise_scale
    return gt_boxes, points
