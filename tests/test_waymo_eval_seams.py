"""Pure-python seams of the TF-guarded Waymo official evaluator
(VERDICT r2 Weak #6): flattening/level-assignment/distance-mask logic runs
without waymo-open-dataset installed."""

import numpy as np

from crb_active_3ddet_tpu.datasets.waymo import waymo_eval


def _est():
    # __init__ may require the TF metrics op — construct bare
    return object.__new__(waymo_eval.OpenPCDetWaymoDetectionMetricsEstimator)


def test_limit_period():
    v = waymo_eval.limit_period(np.array([0.0, np.pi, 3 * np.pi, -np.pi]),
                                offset=0.5, period=2 * np.pi)
    assert np.all(v >= -np.pi) and np.all(v < np.pi)


def test_generate_waymo_type_results_gt_levels():
    est = _est()
    infos = [{
        'annos': {
            'name': np.array(['Vehicle', 'Pedestrian', 'Vehicle', 'Sign']),
            'gt_boxes_lidar': np.tile(
                np.array([[1, 2, 0, 4, 2, 1.5, 0.3]], np.float64), (4, 1)),
            'difficulty': np.array([0, 0, 2, 0]),
            'num_points_in_gt': np.array([10, 3, 7, 9]),
        }
    }]
    fid, boxes, typ, score, nlz, diff = est.generate_waymo_type_results(
        infos, ['Vehicle', 'Pedestrian'], is_gt=True)
    # 'Sign' filtered by class list; all with >0 points kept
    assert len(fid) == 3
    # level rules: difficulty 0 & >5 pts → L1; 0 & <=5 → L2; explicit 2 stays
    assert diff.tolist() == [1, 2, 2]
    assert boxes.shape == (3, 7)
    assert (score == 1.0).all()


def test_generate_waymo_type_results_pred_and_mask():
    est = _est()
    infos = [{
        'name': np.array(['Vehicle', 'Cyclist']),
        'boxes_lidar': np.array([[1, 1, 0, 4, 2, 1.5, 0.0],
                                 [200, 0, 0, 2, 1, 1.5, 0.0]], np.float64),
        'score': np.array([0.9, 0.4]),
    }]
    fid, boxes, typ, score, nlz, diff = est.generate_waymo_type_results(
        infos, ['Vehicle', 'Cyclist'], is_gt=False)
    assert len(fid) == 2 and score.tolist() == [0.8999999761581421,
                                               0.4000000059604645]
    kept = est.mask_by_distance(100, boxes, fid, typ, score)
    # the 200m box is dropped
    assert kept[0].shape[0] == 1 and kept[2].tolist() == [1]


def test_velocity_boxes_sliced():
    est = _est()
    infos = [{
        'annos': {
            'name': np.array(['Vehicle']),
            'gt_boxes_lidar': np.array(
                [[1, 2, 0, 4, 2, 1.5, 9.9, 0.0, 0.3]], np.float64),
            'num_points_in_gt': np.array([10]),
        }
    }]
    _, boxes, *_ = est.generate_waymo_type_results(
        infos, ['Vehicle'], is_gt=True, fake_gt_infos=False)
    # 9-col boxes: heading comes from col 8 when infos carry velocity
    assert boxes.shape == (1, 7)
    np.testing.assert_allclose(boxes[0, 6], 0.3)
