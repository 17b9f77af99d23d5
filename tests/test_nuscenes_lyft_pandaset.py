"""NuScenes / Lyft / Pandaset datasets on fabricated data.

Covers: info-pkl loading, multi-sweep aggregation with transform matrices,
CBGS balanced resampling, velocity-column handling, fixed-shape collate,
prediction dicts, the numpy lyft mAP evaluator, pandaset pose geometry.
"""

import pickle

import numpy as np
import pytest

from crb_active_3ddet_tpu.config import CfgNode


def _write_nusc_like(tmp_path, version, n_frames=3, five_cols=True):
    root = tmp_path / version
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(n_frames):
        rel = f'sweeps/frame_{i}.bin'
        (root / 'sweeps').mkdir(exist_ok=True)
        pts = rng.uniform(-20, 20, (300, 5)).astype(np.float32)
        pts[:, 4] = 0
        pts.tofile(str(root / rel))
        tm = np.eye(4)
        tm[:3, 3] = [0.5, 0.0, 0.0]
        gt = np.concatenate([
            rng.uniform(-10, 10, (4, 2)), rng.uniform(-1, 1, (4, 1)),
            rng.uniform(1, 4, (4, 3)), rng.uniform(-3, 3, (4, 1)),
            rng.uniform(-2, 2, (4, 2)),
        ], axis=1).astype(np.float32)
        infos.append({
            'lidar_path': rel,
            'token': f'tok{i}',
            'sweeps': [{'lidar_path': rel, 'transform_matrix': tm,
                        'time_lag': 0.05, 'sample_data_token': f's{i}'}],
            'gt_boxes': gt,
            'gt_names': np.array(['car', 'pedestrian', 'car', 'truck']),
            'num_lidar_pts': np.array([10, 5, 0, 7]),
        })
    with open(root / 'infos_train.pkl', 'wb') as f:
        pickle.dump(infos, f)
    with open(root / 'infos_val.pkl', 'wb') as f:
        pickle.dump(infos, f)
    return infos


NUSC_CFG = {
    'DATASET': 'NuScenesDataset',
    'VERSION': 'v1.0-mini',
    'MAX_SWEEPS': 2,
    'PRED_VELOCITY': True,
    'SET_NAN_VELOCITY_TO_ZEROS': True,
    'FILTER_MIN_POINTS_IN_GT': 1,
    'BALANCED_RESAMPLING': True,
    'DATA_SPLIT': {'train': 'train', 'test': 'val'},
    'INFO_PATH': {'train': ['infos_train.pkl'], 'test': ['infos_val.pkl']},
    'POINT_CLOUD_RANGE': [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
    'MAX_GT_BOXES': 16,
    'DATA_AUGMENTOR': {'DISABLE_AUG_LIST': ['placeholder'],
                       'AUG_CONFIG_LIST': []},
    'POINT_FEATURE_ENCODING': {
        'encoding_type': 'absolute_coordinates_encoding',
        'used_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
        'src_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp']},
    'DATA_PROCESSOR': [
        {'NAME': 'mask_points_and_boxes_outside_range',
         'REMOVE_OUTSIDE_BOXES': True},
        {'NAME': 'transform_points_to_voxels',
         'VOXEL_SIZE': [0.8, 0.8, 8.0], 'MAX_POINTS_PER_VOXEL': 8,
         'MAX_NUMBER_OF_VOXELS': {'train': 2000, 'test': 2000},
         'MAX_POINTS_PER_FRAME': {'train': 2048, 'test': 2048}}],
}


def test_nuscenes_dataset(tmp_path):
    from crb_active_3ddet_tpu.datasets.nuscenes.nuscenes_dataset import \
        NuScenesDataset
    _write_nusc_like(tmp_path, 'v1.0-mini')
    cfg = CfgNode({**NUSC_CFG, 'DATA_PATH': str(tmp_path)})
    ds = NuScenesDataset(cfg, ['car', 'pedestrian', 'truck'], training=True)
    assert len(ds) > 0
    item = ds[0]
    # sweeps: keyframe + 1 sweep, timestamp channel present
    assert item['points'].shape[1] == 5
    assert item['num_points'] > 300          # sweep points were appended
    assert item['gt_boxes'].shape == (16, 10)  # 7 + vx,vy + class
    # FILTER_MIN_POINTS_IN_GT drops the zero-point box (index 2)
    n_valid = int((np.abs(item['gt_boxes']).sum(-1) > 0).sum())
    assert n_valid == 3

    batch = ds.collate_batch([ds[0], ds[1]])
    assert batch['points'].shape == (2, 2048, 5)

    preds = {'pred_valid': np.array([[True, False]]),
             'pred_boxes': np.zeros((1, 2, 7), np.float32),
             'pred_scores': np.array([[0.9, 0.0]], np.float32),
             'pred_labels': np.array([[1, 0]])}
    annos = ds.generate_prediction_dicts(
        {'batch_size': 1, 'frame_id': ['f0'],
         'metadata': [{'token': 'tok0'}]},
        preds, ['car', 'pedestrian', 'truck'])
    assert annos[0]['name'][0] == 'car'

    # no-velocity path drops vx/vy
    cfg2 = CfgNode({**NUSC_CFG, 'DATA_PATH': str(tmp_path),
                    'PRED_VELOCITY': False, 'BALANCED_RESAMPLING': False})
    ds2 = NuScenesDataset(cfg2, ['car', 'pedestrian', 'truck'],
                          training=True)
    assert ds2[0]['gt_boxes'].shape[1] == 8


LYFT_CFG = {
    'DATASET': 'LyftDataset', 'VERSION': 'trainval', 'MAX_SWEEPS': 2,
    'EVAL_LYFT_IOU_LIST': [0.5],
    'DATA_SPLIT': {'train': 'train', 'test': 'val'},
    'INFO_PATH': {'train': ['infos_train.pkl'], 'test': ['infos_val.pkl']},
    'POINT_CLOUD_RANGE': [-80.0, -80.0, -5.0, 80.0, 80.0, 3.0],
    'MAX_GT_BOXES': 16,
    'DATA_AUGMENTOR': {'DISABLE_AUG_LIST': ['placeholder'],
                       'AUG_CONFIG_LIST': []},
    'POINT_FEATURE_ENCODING': {
        'encoding_type': 'absolute_coordinates_encoding',
        'used_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
        'src_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp']},
    'DATA_PROCESSOR': [
        {'NAME': 'mask_points_and_boxes_outside_range',
         'REMOVE_OUTSIDE_BOXES': True},
        {'NAME': 'transform_points_to_voxels',
         'VOXEL_SIZE': [0.8, 0.8, 8.0], 'MAX_POINTS_PER_VOXEL': 8,
         'MAX_NUMBER_OF_VOXELS': {'train': 2000, 'test': 2000},
         'MAX_POINTS_PER_FRAME': {'train': 2048, 'test': 2048}}],
}


def test_lyft_dataset(tmp_path):
    from crb_active_3ddet_tpu.datasets.lyft.lyft_dataset import LyftDataset
    _write_nusc_like(tmp_path, 'trainval')
    # lyft gt has no velocity columns (7 + class)
    root = tmp_path / 'trainval'
    with open(root / 'infos_train.pkl', 'rb') as f:
        infos = pickle.load(f)
    for info in infos:
        info['gt_boxes'] = info['gt_boxes'][:, :7]
    for name in ('infos_train.pkl', 'infos_val.pkl'):
        with open(root / name, 'wb') as f:
            pickle.dump(infos, f)
    # truncated-tail robustness: append 3 stray floats to one bin
    with open(root / 'sweeps/frame_0.bin', 'ab') as f:
        np.zeros(3, np.float32).tofile(f)
    cfg = CfgNode({**LYFT_CFG, 'DATA_PATH': str(tmp_path)})
    ds = LyftDataset(cfg, ['car', 'pedestrian', 'truck'], training=True)
    item = ds[0]
    assert item['points'].shape[1] == 5
    assert item['gt_boxes'].shape == (16, 8)


def test_lyft_map_eval_numpy():
    from crb_active_3ddet_tpu.datasets.lyft.lyft_map_eval import (
        Box3D, get_average_precisions)
    gt = [{'sample_token': 't0', 'translation': [0, 0, 0],
           'size': [2, 4, 1.5], 'rotation': [1, 0, 0, 0], 'name': 'car'}]
    perfect = [{**gt[0], 'score': 0.9}]
    aps = get_average_precisions(gt, perfect, ['car'], [0.5])
    assert aps[0] == 1.0

    # IoU sanity: identical boxes → 1; rotated 90° square-based → known value
    a = Box3D(**gt[0])
    assert abs(a.get_iou(a) - 1.0) < 1e-6
    shifted = Box3D(sample_token='t0', translation=[1.0, 0, 0],
                    size=[2, 4, 1.5], rotation=[1, 0, 0, 0], name='car')
    # axis-aligned overlap: width 2 (x: length 4 along x? box frame:
    # length along x via yaw 0) → intersection volume known
    iou = a.get_iou(shifted)
    inter = 3 * 2 * 1.5
    union = 2 * (4 * 2 * 1.5) - inter
    assert abs(iou - inter / union) < 1e-6
    # miss → 0
    far = Box3D(sample_token='t0', translation=[100, 0, 0],
                size=[2, 4, 1.5], rotation=[1, 0, 0, 0], name='car')
    assert a.get_iou(far) == 0.0


def test_pandaset_pose_roundtrip(tmp_path):
    from crb_active_3ddet_tpu.datasets.pandaset.pandaset_dataset import (
        ego_to_lidar_points, lidar_points_to_ego, pose_dict_to_numpy,
        pose_numpy_to_dict)
    pose = {'position': {'x': 10.0, 'y': -3.0, 'z': 1.5},
            'heading': {'w': 0.96592583, 'x': 0.0, 'y': 0.0,
                        'z': 0.25881905}}   # 30° about z
    pts = np.random.RandomState(0).uniform(-5, 5, (50, 3))
    round_trip = ego_to_lidar_points(lidar_points_to_ego(pts, pose), pose)
    np.testing.assert_allclose(round_trip, pts, atol=1e-6)
    np.testing.assert_allclose(
        pose_dict_to_numpy(pose_numpy_to_dict(pose_dict_to_numpy(pose))),
        pose_dict_to_numpy(pose))


def test_pandaset_dataset(tmp_path):
    import gzip
    import json
    import pandas as pd
    from crb_active_3ddet_tpu.datasets.pandaset.pandaset_dataset import \
        PandasetDataset
    rng = np.random.RandomState(1)
    seq = '001'
    seq_dir = tmp_path / 'dataset' / seq
    (seq_dir / 'lidar').mkdir(parents=True)
    (seq_dir / 'annotations' / 'cuboids').mkdir(parents=True)
    poses = [{'position': {'x': 0.0, 'y': 0.0, 'z': 0.0},
              'heading': {'w': 1.0, 'x': 0.0, 'y': 0.0, 'z': 0.0}}]
    (seq_dir / 'lidar' / 'poses.json').write_text(json.dumps(poses))
    pts = pd.DataFrame({
        'x': rng.uniform(-20, 20, 400), 'y': rng.uniform(-20, 20, 400),
        'z': rng.uniform(-2, 1, 400), 'i': rng.uniform(0, 255, 400),
        't': np.zeros(400), 'd': np.zeros(400, np.int64)})
    pts.to_pickle(str(seq_dir / 'lidar' / '00.pkl.gz'))
    cuboids = pd.DataFrame({
        'position.x': [5.0, -3.0], 'position.y': [2.0, 4.0],
        'position.z': [0.0, 0.2], 'dimensions.x': [2.0, 0.7],
        'dimensions.y': [4.5, 0.8], 'dimensions.z': [1.6, 1.8],
        'yaw': [0.3, -1.0], 'label': ['Car', 'Pedestrian'],
        'cuboids.sensor_id': [0, 0]})
    cuboids.to_pickle(str(seq_dir / 'annotations' / 'cuboids' / '00.pkl.gz'))
    infos = [{'sequence': seq, 'frame_idx': 0,
              'lidar_path': str(seq_dir / 'lidar' / '00.pkl.gz'),
              'cuboids_path': str(seq_dir / 'annotations' / 'cuboids'
                                  / '00.pkl.gz')}]
    with open(tmp_path / 'pandaset_infos_train.pkl', 'wb') as f:
        pickle.dump(infos, f)
    cfg = CfgNode({
        'DATASET': 'PandasetDataset', 'DATA_PATH': str(tmp_path),
        'LIDAR_DEVICE': 0,
        'TRAINING_CATEGORIES': {'Car': 'Car'},
        'DATA_SPLIT': {'train': 'train', 'test': 'train'},
        'SEQUENCES': {'train': [seq]},
        'INFO_PATH': {'train': ['pandaset_infos_train.pkl'],
                      'test': ['pandaset_infos_train.pkl']},
        'POINT_CLOUD_RANGE': [-25.6, -25.6, -3.0, 25.6, 25.6, 3.0],
        'MAX_GT_BOXES': 8,
        'DATA_AUGMENTOR': {'DISABLE_AUG_LIST': ['placeholder'],
                           'AUG_CONFIG_LIST': []},
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity'],
            'src_feature_list': ['x', 'y', 'z', 'intensity']},
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.4, 0.4, 6.0], 'MAX_POINTS_PER_VOXEL': 8,
             'MAX_NUMBER_OF_VOXELS': {'train': 1000, 'test': 1000},
             'MAX_POINTS_PER_FRAME': {'train': 1024, 'test': 1024}}],
    })
    ds = PandasetDataset(cfg, ['Car', 'Pedestrian'], training=True)
    assert len(ds) == 1
    item = ds[0]
    # identity pose: ego == world; normative frame: x=y_panda, y=-x_panda
    gt = item['gt_boxes']
    valid = np.abs(gt).sum(-1) > 0
    assert valid.sum() == 2
    car = gt[0]
    np.testing.assert_allclose(car[:2], [2.0, -5.0], atol=1e-5)
    np.testing.assert_allclose(car[3:5], [4.5, 2.0], atol=1e-5)

    preds = {'pred_valid': np.array([[True]]),
             'pred_boxes': np.asarray([[[2.0, -5.0, 0.0, 4.5, 2.0, 1.6,
                                         0.3]]], np.float32),
             'pred_scores': np.array([[0.8]], np.float32),
             'pred_labels': np.array([[1]])}
    annos = ds.generate_prediction_dicts(
        {'batch_size': 1, 'frame_idx': [0], 'sequence': [1],
         'zrot_world_to_ego': [np.float32(0.0)],
         'pose': [np.array([0, 0, 0, 1, 0, 0, 0], np.float32)]},
        preds, ['Car', 'Pedestrian'], output_path=str(tmp_path / 'out'))
    df = annos[0]['preds']
    np.testing.assert_allclose(df['position.x'][0], 5.0, atol=1e-5)
    np.testing.assert_allclose(df['position.y'][0], 2.0, atol=1e-5)
