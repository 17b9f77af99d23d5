"""WaymoDataset loading path on fabricated processed data."""

import pickle

import numpy as np
import pytest

from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.datasets.waymo.waymo_dataset import WaymoDataset


@pytest.fixture()
def waymo_root(tmp_path):
    root = tmp_path / 'waymo'
    (root / 'ImageSets').mkdir(parents=True)
    seqs = ['segment-0001', 'segment-0002']
    (root / 'ImageSets' / 'train.txt').write_text(
        '\n'.join(f'{s}.tfrecord' for s in seqs))
    (root / 'ImageSets' / 'val.txt').write_text(
        '\n'.join(f'{s}.tfrecord' for s in seqs))
    rng = np.random.RandomState(0)
    for s in seqs:
        seq_dir = root / 'waymo_processed_data' / s
        seq_dir.mkdir(parents=True)
        infos = []
        for idx in range(3):
            n = 500
            pts = np.concatenate([
                rng.uniform(0, 60, (n, 1)), rng.uniform(-30, 30, (n, 1)),
                rng.uniform(-2, 4, (n, 1)), rng.uniform(0, 1, (n, 1)),
                rng.uniform(0, 1, (n, 1)),
                np.full((n, 1), -1.0)], axis=1).astype(np.float32)
            np.save(seq_dir / f'{idx:04d}.npy', pts)
            infos.append({
                'frame_id': f'{s}_{idx:03d}',
                'point_cloud': {'lidar_sequence': s, 'sample_idx': idx,
                                'num_features': 5},
                'annos': {
                    'name': np.array(['Vehicle', 'Pedestrian']),
                    'gt_boxes_lidar': np.array([
                        [10, 0, 1, 4.5, 2.0, 1.8, 0.1],
                        [5, 3, 1, 0.9, 0.8, 1.8, 0.0]], np.float32),
                    'num_points_in_gt': np.array([50, 10]),
                },
            })
        with open(seq_dir / f'{s}.pkl', 'wb') as f:
            pickle.dump(infos, f)
    return root


def waymo_cfg(root):
    return CfgNode({
        'DATASET': 'WaymoDataset',
        'DATA_PATH': str(root),
        'PROCESSED_DATA_TAG': 'waymo_processed_data',
        'POINT_CLOUD_RANGE': [0, -40, -2, 70.4, 40, 4],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'MAX_GT_BOXES': 16,
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity'],
            'src_feature_list': ['x', 'y', 'z', 'intensity', 'elongation']},
        'DATA_AUGMENTOR': {'DISABLE_AUG_LIST': ['placeholder'],
                           'AUG_CONFIG_LIST': [
            {'NAME': 'random_world_flip', 'ALONG_AXIS_LIST': ['x']}]},
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'shuffle_points',
             'SHUFFLE_ENABLED': {'train': True, 'test': False}},
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.1, 0.1, 0.15],
             'MAX_POINTS_PER_VOXEL': 5,
             'MAX_NUMBER_OF_VOXELS': {'train': 2000, 'test': 2000},
             'MAX_POINTS_PER_FRAME': {'train': 1024, 'test': 1024}}],
    })


def test_waymo_loading(waymo_root):
    ds = WaymoDataset(waymo_cfg(waymo_root), ['Vehicle', 'Pedestrian',
                                              'Cyclist'], training=True)
    assert len(ds) == 6
    assert len(ds.frame_ids) == 6
    sample = ds[0]
    assert sample['points'].shape == (1024, 4)
    assert sample['gt_boxes'].shape == (16, 8)
    assert (sample['gt_boxes'][:2, -1] > 0).all()  # two real boxes


def test_waymo_al_identity(waymo_root):
    """AL pool split uses frame_ids+infos for Waymo (not sample_id_list)."""
    from crb_active_3ddet_tpu.datasets import _identity_attrs
    ds = WaymoDataset(waymo_cfg(waymo_root), ['Vehicle'], training=False)
    id_attr, info_attr = _identity_attrs(ds)
    assert (id_attr, info_attr) == ('frame_ids', 'infos')


def test_waymo_kitti_style_eval(waymo_root):
    ds = WaymoDataset(waymo_cfg(waymo_root), ['Vehicle', 'Pedestrian'],
                      training=False)
    det_annos = []
    for info in ds.infos:
        det_annos.append({
            'frame_id': info['frame_id'],
            'name': info['annos']['name'].copy(),
            'boxes_lidar': info['annos']['gt_boxes_lidar'].copy(),
            'score': np.array([0.9, 0.8]),
        })
    result_str, ret = ds.evaluation(det_annos, ['Vehicle', 'Pedestrian'],
                                    eval_metric='kitti')
    # perfect predictions → nonzero AP (few gts so R40 grid is sparse)
    assert ret['Car_3d/moderate_R40'] > 0
