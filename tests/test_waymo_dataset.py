"""WaymoDataset loading path on fabricated processed data."""

import pickle


import numpy as np
import pytest

from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.datasets.waymo.waymo_dataset import WaymoDataset

pytestmark = pytest.mark.slow


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


def test_waymo_gt_database(waymo_root):
    """create_groundtruth_database writes db pkl + bin crops + global npy
    (parity: waymo_dataset.py:326-406 incl. the every-4th-Vehicle quirk)."""
    ds = WaymoDataset(waymo_cfg(waymo_root), ['Vehicle', 'Pedestrian'],
                      training=False)
    info_path = waymo_root / 'infos_train.pkl'
    with open(info_path, 'wb') as f:
        pickle.dump(ds.infos, f)
    ds.create_groundtruth_database(
        info_path=info_path, save_path=waymo_root, split='train',
        sampled_interval=1, used_classes=['Vehicle', 'Pedestrian'],
        processed_data_tag='waymo_processed_data')
    db_pkl = (waymo_root
              / 'waymo_processed_data_waymo_dbinfos_train_sampled_1.pkl')
    assert db_pkl.exists()
    with open(db_pkl, 'rb') as f:
        db = pickle.load(f)
    assert 'Pedestrian' in db and len(db['Pedestrian']) > 0
    # k%4!=0 frames drop Vehicles → fewer Vehicle than Pedestrian entries
    assert len(db.get('Vehicle', [])) < len(db['Pedestrian'])
    one = db['Pedestrian'][0]
    crop = np.fromfile(waymo_root / one['path'],
                       np.float32).reshape(-1, 5)
    assert crop.shape[0] == one['num_points_in_gt']
    glob_npy = (waymo_root
                / 'waymo_processed_data_gt_database_train_sampled_1_global.npy')
    assert glob_npy.exists()


def test_waymo_shared_memory_cache(waymo_root):
    cfg = waymo_cfg(waymo_root)
    cfg.USE_SHARED_MEMORY = True
    cfg.SHARED_MEMORY_FILE_LIMIT = 4
    ds = WaymoDataset(cfg, ['Vehicle'], training=True)
    try:
        pc = ds.infos[0]['point_cloud']
        direct = ds.get_lidar(pc['lidar_sequence'], pc['sample_idx'],
                              from_shm=False)
        cached = ds.get_lidar(pc['lidar_sequence'], pc['sample_idx'])
        assert np.allclose(direct, cached)
    finally:
        ds.clean_shared_memory()


def test_waymo_full_al_round(waymo_root, tmp_path):
    """One full AL round (pretrain scan + select + loader rebuild) over
    fabricated Waymo data — VERDICT r1 item 3 'Done' criterion."""
    import jax
    from crb_active_3ddet_tpu.config import CfgNode
    from crb_active_3ddet_tpu.datasets import build_active_dataloader
    from crb_active_3ddet_tpu.models.detectors import build_detector
    from crb_active_3ddet_tpu.query_strategies import build_strategy
    from crb_active_3ddet_tpu.runtime import train as train_rt
    from crb_active_3ddet_tpu.runtime.active import select_active_labels
    from crb_active_3ddet_tpu.runtime.optimization import build_optimizer
    from test_pointpillar_model import MODEL_CFG

    import copy
    model_cfg = CfgNode(copy.deepcopy(dict(MODEL_CFG)))
    model_cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG[0]['class_name'] = 'Vehicle'
    data_cfg = waymo_cfg(waymo_root)
    # PointPillar needs a single-z pillar grid
    data_cfg.DATA_PROCESSOR[-1]['VOXEL_SIZE'] = [0.4, 0.4, 6.0]
    cfg = CfgNode({
        'CLASS_NAMES': ['Vehicle'],
        'DATA_CONFIG': data_cfg,
        'MODEL': model_cfg,
        'OPTIMIZATION': {'OPTIMIZER': 'adam_onecycle', 'LR': 0.003,
                         'WEIGHT_DECAY': 0.01, 'PCT_START': 0.4,
                         'DIV_FACTOR': 10, 'GRAD_NORM_CLIP': 10,
                         'BATCH_SIZE_PER_GPU': 2, 'NUM_EPOCHS': 1},
        'ACTIVE_TRAIN': {
            'METHOD': 'entropy', 'AGGREGATION': 'mean',
            'PRE_TRAIN_SAMPLE_NUMS': 2, 'PRE_TRAIN_EPOCH_NUMS': 1,
            'TRAIN_RESUME': False, 'SELECT_NUMS': 2,
            'SELECT_LABEL_EPOCH_INTERVAL': 1, 'TOTAL_BUDGET_NUMS': 2},
    })
    (lab_set, unlab_set, lab_loader, unlab_loader, _, _) = \
        build_active_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, workers=0,
            training=True, pre_train_sample_nums=2, seed=0)
    assert len(lab_set) == 2 and len(unlab_set) == 4
    model = build_detector(cfg.MODEL, num_class=1, dataset=lab_set)
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=4)
    state = train_rt.init_train_state(model, optimizer, lab_set, batch_size=2)
    step = train_rt.make_train_step(model, optimizer, lab_set)
    rng = jax.random.PRNGKey(0)
    state, metrics, rng = train_rt.train_one_epoch(state, step, lab_loader,
                                                   rng)
    assert np.isfinite(metrics['loss'])

    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    class _L:
        def info(self, *a, **k):
            pass
    lab_loader, unlab_loader, selected = select_active_labels(
        model, variables, lab_loader, unlab_loader, rank=0, logger=_L(),
        method='entropy', cur_epoch=0, active_label_dir=str(tmp_path),
        cfg=cfg)
    assert len(selected) == 2
    assert len(lab_loader.dataset) == 4
    assert len(unlab_loader.dataset) == 2
    # waymo AL identity: moved frames tracked by frame_ids
    assert set(selected) <= set(f for f in
                                unlab_loader.dataset.frame_ids) | set(
        lab_loader.dataset.frame_ids)
