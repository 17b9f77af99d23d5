"""KITTI-official evaluator tests (native C++ kernels via ctypes)."""

import numpy as np
import pytest

from crb_active_3ddet_tpu.datasets.kitti.kitti_eval import eval as keval


def _make_anno(boxes_cam, names, scores=None, bbox_h=50.0):
    """Camera-frame annos: boxes_cam (N, 7) [x, y, z, l, h, w, ry]."""
    n = len(names)
    boxes_cam = np.asarray(boxes_cam, np.float64).reshape(n, 7)
    anno = {
        'name': np.asarray(names),
        'truncated': np.zeros(n),
        'occluded': np.zeros(n),
        'alpha': np.full(n, -10.0),
        'bbox': np.stack([np.full(n, 100.0), np.full(n, 100.0),
                          np.full(n, 150.0), np.full(n, 100.0 + bbox_h)], 1),
        'dimensions': boxes_cam[:, 3:6],
        'location': boxes_cam[:, 0:3],
        'rotation_y': boxes_cam[:, 6],
    }
    if scores is not None:
        anno['score'] = np.asarray(scores, np.float64)
    return anno


class TestNativeOverlaps:
    def test_rotated_identity(self):
        b = np.array([[0, 0, 2, 4, 0.3]], np.float64)
        assert abs(keval.rotate_iou_eval(b, b)[0, 0] - 1.0) < 1e-6

    def test_rotated_disjoint(self):
        a = np.array([[0, 0, 2, 2, 0.0]], np.float64)
        b = np.array([[10, 10, 2, 2, 1.0]], np.float64)
        assert keval.rotate_iou_eval(a, b)[0, 0] == 0.0

    def test_rotated_45_octagon(self):
        a = np.array([[0, 0, 1, 1, 0.0]], np.float64)
        b = np.array([[0, 0, 1, 1, np.pi / 4]], np.float64)
        inter = keval.rotate_iou_eval(a, b, criterion=2)[0, 0]
        assert abs(inter - 8 * (np.sqrt(2) - 1) / 4) < 1e-6

    def test_matches_jax_kernel(self):
        import jax.numpy as jnp
        from crb_active_3ddet_tpu.ops.iou3d import boxes_iou_bev
        rng = np.random.RandomState(0)
        n, m = 12, 9
        boxes7_a = np.concatenate([
            rng.uniform(-5, 5, (n, 2)), np.zeros((n, 1)),
            rng.uniform(1, 4, (n, 3)), rng.uniform(-np.pi, np.pi, (n, 1))], 1)
        boxes7_b = np.concatenate([
            rng.uniform(-5, 5, (m, 2)), np.zeros((m, 1)),
            rng.uniform(1, 4, (m, 3)), rng.uniform(-np.pi, np.pi, (m, 1))], 1)
        jax_iou = np.asarray(boxes_iou_bev(
            jnp.asarray(boxes7_a, jnp.float32), jnp.asarray(boxes7_b, jnp.float32)))
        native = keval.rotate_iou_eval(
            boxes7_a[:, [0, 1, 3, 4, 6]], boxes7_b[:, [0, 1, 3, 4, 6]])
        assert np.allclose(jax_iou, native, atol=1e-4)

    def test_image_overlap(self):
        a = np.array([[0, 0, 2, 2]], np.float64)
        b = np.array([[1, 1, 3, 3]], np.float64)
        got = keval.image_box_overlap(a, b)[0, 0]
        assert abs(got - 1.0 / 7.0) < 1e-9

    def test_d3_overlap_identity(self):
        # camera frame [x, y, z, l, h, w, ry]
        b = np.array([[1, 2, 10, 4, 1.5, 2, 0.2]], np.float64)
        assert abs(keval.d3_box_overlap(b, b)[0, 0] - 1.0) < 1e-6


class TestOfficialEval:
    def _box(self, x=5.0, z=10.0):
        return [x, 1.0, z, 3.9, 1.56, 1.6, 0.1]

    def test_perfect_detection_ap100(self):
        # needs >= 41 valid gts so every 41-point recall bin is reachable
        gt_annos, dt_annos = [], []
        for f in range(30):
            boxes = np.array([self._box(5.0 + f, 10.0 + f),
                              self._box(-5.0 - f, 20.0 + f)])
            gt_annos.append(_make_anno(boxes, ['Car', 'Car']))
            dt_annos.append(_make_anno(boxes, ['Car', 'Car'],
                                       scores=[0.9 - f * 0.01, 0.8 - f * 0.01]))
        result, ret = keval.get_official_eval_result(gt_annos, dt_annos, ['Car'])
        assert abs(ret['Car_3d/moderate_R40'] - 100.0) < 1e-6
        assert abs(ret['Car_bev/easy_R40'] - 100.0) < 1e-6

    def test_miss_half_lowers_ap(self):
        gt_annos, dt_annos = [], []
        for f in range(8):
            boxes = np.array([self._box(5.0 + f, 10.0 + f),
                              self._box(-5.0 - f, 20.0 + f)])
            gt_annos.append(_make_anno(boxes, ['Car', 'Car']))
            dt_annos.append(_make_anno(boxes[:1], ['Car'], scores=[0.9]))
        _, ret = keval.get_official_eval_result(gt_annos, dt_annos, ['Car'])
        assert ret['Car_3d/moderate_R40'] < 60.0

    def test_false_positives_lower_ap(self):
        gt_annos, dt_annos = [], []
        for f in range(8):
            boxes = np.array([self._box(5.0 + f, 10.0 + f)])
            fps = np.array([self._box(-20.0, 40.0)])
            gt_annos.append(_make_anno(boxes, ['Car']))
            dt_annos.append(_make_anno(
                np.concatenate([boxes, fps]), ['Car', 'Car'],
                scores=[0.9, 0.95]))  # FP scored higher than TP
        _, ret = keval.get_official_eval_result(gt_annos, dt_annos, ['Car'])
        assert ret['Car_3d/moderate_R40'] < 100.0

    def test_van_ignored_for_car(self):
        # dets matching a Van gt must be ignored (not FPs) when scoring Car:
        # AP with a Van gt under the extra det == AP with no extra det at all,
        # and > AP when the extra det is a pure FP.
        def run(second_gt_name, extra_det):
            gt_annos, dt_annos = [], []
            for f in range(30):
                car = np.array([self._box(5.0 + f, 10.0 + f),
                                self._box(-5.0 - f, 20.0 + f)])
                other = np.array([self._box(25.0, 40.0)])
                gt_names = ['Car', 'Car'] + ([second_gt_name] if second_gt_name else [])
                gt_boxes = np.concatenate([car, other]) if second_gt_name else car
                gt_annos.append(_make_anno(gt_boxes, gt_names))
                det_boxes = np.concatenate([car, other]) if extra_det else car
                det_names = ['Car'] * len(det_boxes)
                scores = [0.9 - f * 0.01, 0.8 - f * 0.01] + ([0.95] if extra_det else [])
                dt_annos.append(_make_anno(det_boxes, det_names, scores=scores))
            _, ret = keval.get_official_eval_result(gt_annos, dt_annos, ['Car'])
            return ret['Car_3d/moderate_R40']

        clean = run(None, False)
        with_van = run('Van', True)
        with_fp = run(None, True)
        assert abs(with_van - clean) < 1e-6
        assert with_fp < clean - 1.0

    def test_offset_detection_fails_iou(self):
        gt_annos, dt_annos = [], []
        for f in range(4):
            boxes = np.array([self._box(5.0, 10.0)])
            shifted = boxes.copy()
            shifted[0][0] += 3.0  # way off
            gt_annos.append(_make_anno(boxes, ['Car']))
            dt_annos.append(_make_anno(shifted, ['Car'], scores=[0.9]))
        _, ret = keval.get_official_eval_result(gt_annos, dt_annos, ['Car'])
        assert ret['Car_3d/moderate_R40'] < 1e-6
