"""Lyft 3D mAP evaluation — numpy port of the reference's embedded
``pcdet/datasets/lyft/lyft_mAP_eval/lyft_eval.py`` (itself from the lyft
devkit): Box3D ground-plane IoU, PASCAL-style AP with precision envelope,
greedy per-sample matching at multiple IoU thresholds.

Delta vs the reference: the convex-polygon intersection is a from-scratch
Sutherland–Hodgman clip (the reference uses shapely, not in this image) —
numerically identical areas for the convex ground rectangles involved.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def polygon_clip(subject, clip):
    """Sutherland–Hodgman: clip convex polygon `subject` (N,2) by convex
    polygon `clip` (M,2), both CCW or CW consistently.  Returns (K,2)."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])

    # ensure clip polygon orientation: make the inside test sign-consistent
    area2 = 0.0
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        area2 += a[0] * b[1] - b[0] * a[1]
    sign = 1.0 if area2 > 0 else -1.0

    output = list(subject)
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        input_list = output
        output = []
        if not input_list:
            break
        s = input_list[-1]
        for p in input_list:
            p_in = sign * inside(p, a, b) >= 0
            s_in = sign * inside(s, a, b) >= 0
            if p_in:
                if not s_in:
                    output.append(_intersect(s, p, a, b))
                output.append(p)
            elif s_in:
                output.append(_intersect(s, p, a, b))
            s = p
    return np.asarray(output) if output else np.zeros((0, 2))


def _intersect(s, p, a, b):
    dx1, dy1 = p[0] - s[0], p[1] - s[1]
    dx2, dy2 = b[0] - a[0], b[1] - a[1]
    denom = dx1 * dy2 - dy1 * dx2
    if abs(denom) < 1e-12:
        return p
    t = ((a[0] - s[0]) * dy2 - (a[1] - s[1]) * dx2) / denom
    return (s[0] + t * dx1, s[1] + t * dy1)


def polygon_area(poly):
    if len(poly) < 3:
        return 0.0
    x, y = np.asarray(poly).T
    return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


class Box3D:
    """Parity: lyft_eval.py:54-211 (validation, ground bbox from the
    quaternion's yaw projection, height × area intersection IoU)."""

    def __init__(self, **kwargs):
        sample_token = kwargs['sample_token']
        translation = kwargs['translation']
        size = kwargs['size']
        rotation = kwargs['rotation']
        name = kwargs['name']
        score = kwargs.get('score', -1)
        if not isinstance(sample_token, str):
            raise TypeError('Sample_token must be a string!')
        if len(translation) != 3 or np.any(np.isnan(translation)):
            raise ValueError('bad translation')
        if len(size) != 3 or np.any(np.isnan(size)):
            raise ValueError('bad size')
        if len(rotation) != 4 or np.any(np.isnan(rotation)):
            raise ValueError('bad rotation')
        assert np.all([x > 0 for x in size])
        self.sample_token = sample_token
        self.translation = translation
        self.size = size
        self.volume = float(np.prod(size))
        self.score = score
        self.rotation = rotation
        self.name = name
        self.width, self.length, self.height = size
        self.center_x, self.center_y, self.center_z = translation
        self.min_z = self.center_z - self.height / 2
        self.max_z = self.center_z + self.height / 2
        self.ground_bbox_coords = self._ground_coords()

    def _ground_coords(self):
        w, x, y, z = [float(v) for v in self.rotation]
        n = np.sqrt(w * w + x * x + y * y + z * z)
        w, x, y, z = w / n, x / n, y / n, z / n
        # rotation_matrix[0,0], [1,0] of the quaternion
        cos_a = 1 - 2 * (y * y + z * z)
        sin_a = 2 * (x * y + w * z)
        cx, cy = self.center_x, self.center_y
        l2, w2 = self.length / 2, self.width / 2
        pts = [
            (cx + l2 * cos_a + w2 * sin_a, cy + l2 * sin_a - w2 * cos_a),
            (cx + l2 * cos_a - w2 * sin_a, cy + l2 * sin_a + w2 * cos_a),
            (cx - l2 * cos_a - w2 * sin_a, cy - l2 * sin_a + w2 * cos_a),
            (cx - l2 * cos_a + w2 * sin_a, cy - l2 * sin_a - w2 * cos_a),
        ]
        return np.asarray(pts)

    def get_height_intersection(self, other):
        return max(0.0, min(other.max_z, self.max_z)
                   - max(other.min_z, self.min_z))

    def get_area_intersection(self, other):
        return polygon_area(polygon_clip(self.ground_bbox_coords,
                                         other.ground_bbox_coords))

    def get_intersection(self, other):
        return self.get_height_intersection(other) \
            * self.get_area_intersection(other)

    def get_iou(self, other):
        inter = self.get_intersection(other)
        union = self.volume + other.volume - inter
        return float(np.clip(inter / union, 0, 1))


def group_by_key(detections, key):
    groups = defaultdict(list)
    for det in detections:
        groups[det[key]].append(det)
    return groups


def wrap_in_box(input_groups):
    return {token: [Box3D(**b) for b in boxes]
            for token, boxes in input_groups.items()}


def get_envelope(precisions):
    for i in range(precisions.size - 1, 0, -1):
        precisions[i - 1] = np.maximum(precisions[i - 1], precisions[i])
    return precisions


def get_ap(recalls, precisions):
    recalls = np.concatenate(([0.0], recalls, [1.0]))
    precisions = np.concatenate(([0.0], precisions, [0.0]))
    precisions = get_envelope(precisions)
    i = np.where(recalls[1:] != recalls[:-1])[0]
    return float(np.sum((recalls[i + 1] - recalls[i]) * precisions[i + 1]))


def get_ious(gt_boxes, predicted_box):
    return [predicted_box.get_iou(x) for x in gt_boxes]


def recall_precision(gt, predictions, iou_threshold_list):
    """Parity: lyft_eval.py:272-342 — greedy matching in score order."""
    num_gts = len(gt)
    if num_gts == 0:
        return -1, -1, -1
    image_gts = wrap_in_box(group_by_key(gt, 'sample_token'))
    sample_gt_checked = {
        token: np.zeros((len(boxes), len(iou_threshold_list)))
        for token, boxes in image_gts.items()}
    predictions = sorted(predictions, key=lambda x: x['score'], reverse=True)
    n_pred = len(predictions)
    tp = np.zeros((n_pred, len(iou_threshold_list)))
    fp = np.zeros((n_pred, len(iou_threshold_list)))
    for pi, prediction in enumerate(predictions):
        predicted_box = Box3D(**prediction)
        token = prediction['sample_token']
        max_overlap, jmax = -np.inf, -1
        gt_boxes = image_gts.get(token, [])
        gt_checked = sample_gt_checked.get(token)
        if len(gt_boxes) > 0:
            overlaps = get_ious(gt_boxes, predicted_box)
            max_overlap = np.max(overlaps)
            jmax = int(np.argmax(overlaps))
        for i, iou_threshold in enumerate(iou_threshold_list):
            if max_overlap > iou_threshold:
                if gt_checked[jmax, i] == 0:
                    tp[pi, i] = 1.0
                    gt_checked[jmax, i] = 1
                else:
                    fp[pi, i] = 1.0
            else:
                fp[pi, i] = 1.0
    fp = np.cumsum(fp, axis=0)
    tp = np.cumsum(tp, axis=0)
    recalls = tp / float(num_gts)
    precisions = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    ap_list = [get_ap(recalls[:, i], precisions[:, i])
               for i in range(len(iou_threshold_list))]
    return recalls, precisions, ap_list


def get_average_precisions(gt, predictions, class_names, iou_thresholds):
    """Parity: lyft_eval.py:345-393."""
    assert all(0 <= t <= 1 for t in iou_thresholds)
    gt_by_class = group_by_key(gt, 'name')
    pred_by_class = group_by_key(predictions, 'name')
    average_precisions = np.zeros(len(class_names))
    for class_id, class_name in enumerate(class_names):
        if class_name in pred_by_class and class_name in gt_by_class:
            _, _, ap_list = recall_precision(
                gt_by_class[class_name], pred_by_class[class_name],
                iou_thresholds)
            average_precisions[class_id] = np.mean(ap_list)
    return average_precisions
