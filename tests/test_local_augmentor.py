"""Local per-object augmentation primitives (VERDICT r1 item 10)."""

import numpy as np

from crb_active_3ddet_tpu.datasets.augmentor import augmentor_utils as au
from crb_active_3ddet_tpu.datasets.augmentor.data_augmentor import (
    DataAugmentor)


def _scene(seed=0):
    rng = np.random.RandomState(seed)
    box = np.array([[5.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.3]])
    # points inside the box + background
    inside = rng.uniform(-0.8, 0.8, (50, 3)) * [2.0, 1.0, 1.0] / 2
    inside = au.rotate_points_along_z_single(
        inside.astype(np.float64), 0.3) + box[0, :3]
    bg = rng.uniform(-20, 20, (200, 3))
    bg = bg[~au._points_in_box_mask(bg, box[0])]
    pts = np.concatenate([inside, bg]).astype(np.float64)
    pts = np.concatenate([pts, rng.rand(len(pts), 1)], axis=1)
    return box, pts, len(inside)


def test_local_translation_moves_box_and_members():
    np.random.seed(1)
    box, pts, n_in = _scene()
    new_box, new_pts = au.random_local_translation(box, pts, [0.5, 0.5],
                                                   axes=('x',))
    assert np.isclose(new_box[0, 0] - box[0, 0], 0.5)
    assert np.allclose(new_pts[:n_in, 0] - pts[:n_in, 0], 0.5)
    # background untouched
    assert np.allclose(new_pts[n_in:], pts[n_in:])


def test_local_rotation_keeps_membership():
    np.random.seed(2)
    box, pts, n_in = _scene()
    new_box, new_pts = au.local_rotation(box, pts, [0.4, 0.4])
    assert np.isclose(new_box[0, 6] - box[0, 6], 0.4)
    # members stay inside the rotated box
    assert au._points_in_box_mask(new_pts[:n_in], new_box[0]).all()
    assert np.allclose(new_pts[n_in:], pts[n_in:])


def test_local_scaling_scales_dims():
    # note: a degenerate range short-circuits (reference parity :312-320)
    np.random.seed(3)
    box, pts, n_in = _scene()
    new_box, new_pts = au.local_scaling(box.copy(), pts, [1.05, 1.15])
    ratio = new_box[0, 3] / box[0, 3]
    assert 1.05 <= ratio <= 1.15
    assert np.allclose(new_box[0, 3:6], box[0, 3:6] * ratio)
    assert au._points_in_box_mask(new_pts[:n_in], new_box[0]).all()
    # degenerate range is a no-op
    same_box, same_pts = au.local_scaling(box.copy(), pts, [1.1, 1.1])
    assert np.allclose(same_box, box)


def test_global_frustum_dropout():
    np.random.seed(4)
    box, pts, _ = _scene()
    gt, new_pts = au.global_frustum_dropout(box, pts, [0.3, 0.3], 'top')
    assert len(new_pts) < len(pts)
    zmax, zmin = pts[:, 2].max(), pts[:, 2].min()
    assert new_pts[:, 2].max() < zmax - 0.29 * (zmax - zmin)


def test_pyramid_dropout_and_sparsify():
    np.random.seed(5)
    box, pts, n_in = _scene()
    _, out = au.local_pyramid_dropout(box, pts, dropout_prob=1.0)
    assert len(out) < len(pts)
    _, out2 = au.local_pyramid_sparsify(box, pts, prob=1.0, max_num_pts=2)
    assert len(out2) <= len(pts)


def test_pyramid_swap_preserves_count():
    np.random.seed(6)
    boxes = np.array([[5.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.0],
                      [-5.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.0]])
    rng = np.random.RandomState(0)
    pts = np.concatenate([
        rng.uniform(-1, 1, (40, 3)) * [2, 1, 1] / 2 + boxes[0, :3],
        rng.uniform(-1, 1, (40, 3)) * [2, 1, 1] / 2 + boxes[1, :3]])
    pts = np.concatenate([pts, rng.rand(len(pts), 1)], axis=1)
    _, out = au.local_pyramid_swap(boxes, pts, prob=1.0, max_num_pts=10)
    assert out.shape == pts.shape


def test_dispatch_queue():
    cfgs = [
        {'NAME': 'random_world_translation',
         'NOISE_TRANSLATE_STD': [0.1, 0.1, 0.1]},
        {'NAME': 'random_local_translation',
         'LOCAL_TRANSLATION_RANGE': [-0.2, 0.2],
         'ALONG_AXIS_LIST': ['x', 'y']},
        {'NAME': 'random_local_rotation', 'LOCAL_ROT_ANGLE': 0.2},
        {'NAME': 'random_local_scaling', 'LOCAL_SCALE_RANGE': [0.95, 1.05]},
        {'NAME': 'random_world_frustum_dropout',
         'INTENSITY_RANGE': [0.0, 0.1], 'DIRECTION': ['top']},
        {'NAME': 'random_local_frustum_dropout',
         'INTENSITY_RANGE': [0.0, 0.1], 'DIRECTION': ['top']},
        {'NAME': 'random_local_pyramid_aug', 'DROP_PROB': 0.2,
         'SPARSIFY_PROB': 0.2, 'SPARSIFY_MAX_NUM': 50,
         'SWAP_PROB': 0.2, 'SWAP_MAX_NUM': 50},
        {'NAME': 'random_image_flip', 'ALONG_AXIS_LIST': ['horizontal']},
    ]
    from crb_active_3ddet_tpu.config import CfgNode
    cfgs = [CfgNode(c) for c in cfgs]
    aug = DataAugmentor(root_path=None, augmentor_configs=cfgs,
                        class_names=['Car'])
    np.random.seed(7)
    box, pts, _ = _scene()
    out = aug.forward({'gt_boxes': box, 'points': pts,
                       'gt_names': np.array(['Car'])})
    assert out['points'].shape[-1] == 4
    assert out['gt_boxes'].shape[-1] == 7
    assert np.isfinite(out['points']).all()
