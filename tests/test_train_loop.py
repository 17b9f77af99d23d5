"""Integration: synthetic dataset → loader → jitted train step → eval."""

import numpy as np
import jax
import pytest


from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.datasets import build_dataloader
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.runtime import train as train_rt
from crb_active_3ddet_tpu.runtime import eval as eval_rt
from crb_active_3ddet_tpu.runtime import checkpoint as ckpt_rt
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

pytestmark = pytest.mark.slow


def tiny_data_cfg(training_scenes=8):
    return CfgNode({
        'DATASET': 'SyntheticDataset',
        'DATA_PATH': '/tmp/synthetic',
        'POINT_CLOUD_RANGE': [0, -6.4, -3, 12.8, 6.4, 1],
        'NUM_SCENES': training_scenes,
        'SEED': 7,
        'NUM_BG_POINTS': 512,
        'MAX_OBJECTS': 3,
        'MAX_GT_BOXES': 16,
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity'],
            'src_feature_list': ['x', 'y', 'z', 'intensity']},
        'DATA_AUGMENTOR': {
            'DISABLE_AUG_LIST': ['placeholder'],
            'AUG_CONFIG_LIST': [
                {'NAME': 'random_world_flip', 'ALONG_AXIS_LIST': ['x']},
                {'NAME': 'random_world_rotation',
                 'WORLD_ROT_ANGLE': [-0.785, 0.785]},
                {'NAME': 'random_world_scaling',
                 'WORLD_SCALE_RANGE': [0.95, 1.05]}]},
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'shuffle_points',
             'SHUFFLE_ENABLED': {'train': True, 'test': False}},
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.4, 0.4, 4.0],
             'MAX_POINTS_PER_VOXEL': 8,
             'MAX_NUMBER_OF_VOXELS': {'train': 512, 'test': 512},
             'MAX_POINTS_PER_FRAME': {'train': 2048, 'test': 2048}}],
    })


def tiny_model_cfg():
    from test_pointpillar_model import MODEL_CFG
    return MODEL_CFG


CLASS_NAMES = ['Car']


@pytest.fixture(scope='module')
def setup():
    np.random.seed(0)
    import random as _random
    _random.seed(0)
    data_cfg = tiny_data_cfg()
    train_set, train_loader, _ = build_dataloader(
        data_cfg, CLASS_NAMES, batch_size=2, training=True, workers=0, seed=0)
    model = build_detector(tiny_model_cfg(), num_class=1, dataset=train_set)
    optim_cfg = CfgNode({'OPTIMIZER': 'adam_onecycle', 'LR': 0.003,
                         'WEIGHT_DECAY': 0.01, 'MOMENTUM': 0.9,
                         'PCT_START': 0.4, 'DIV_FACTOR': 10,
                         'GRAD_NORM_CLIP': 10})
    optimizer, _ = build_optimizer(optim_cfg, total_steps=40)
    state = train_rt.init_train_state(model, optimizer, train_set,
                                      batch_size=2)
    return data_cfg, train_set, train_loader, model, optimizer, state


def test_dataset_shapes(setup):
    data_cfg, train_set, train_loader, *_ = setup
    batch = next(iter(train_loader))
    assert batch['points'].shape == (2, 2048, 4)
    assert batch['gt_boxes'].shape == (2, 16, 8)
    assert batch['num_points'].shape == (2,)
    assert batch['batch_size'] == 2


def test_training_reduces_loss(setup):
    np.random.seed(1)
    data_cfg, train_set, train_loader, model, optimizer, state = setup
    train_step = train_rt.make_train_step(model, optimizer, train_set)
    rng = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(6):
        state, metrics, rng = train_rt.train_one_epoch(
            state, train_step, train_loader, rng)
        losses.append(metrics['loss'])
    assert np.isfinite(losses).all()
    assert min(losses) < losses[0] * 0.85, f'loss did not decrease: {losses}'

    # checkpoint roundtrip
    ck = ckpt_rt.checkpoint_state(state, epoch=6, it=int(state.step))
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        fn = ckpt_rt.save_checkpoint(ck, os.path.join(d, 'checkpoint_epoch_6'))
        loaded = ckpt_rt.load_checkpoint(fn)
        state2 = ckpt_rt.restore_train_state(state, loaded)
        p0 = jax.tree.leaves(state.params)[0]
        p1 = jax.tree.leaves(state2.params)[0]
        assert np.allclose(p0, p1)

    # eval end-to-end on the val split
    val_cfg = tiny_data_cfg()
    val_set, val_loader, _ = build_dataloader(
        val_cfg, CLASS_NAMES, batch_size=2, training=False, workers=0)
    from test_pointpillar_model import MODEL_CFG
    eval_step = eval_rt.make_eval_step(model, val_set,
                                       MODEL_CFG.POST_PROCESSING, num_class=1)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    ap_str, ap_dict, recall = eval_rt.eval_one_epoch(
        variables, eval_step, val_set, val_loader, CLASS_NAMES)
    assert 'mAP' in ap_dict
    assert np.isfinite(ap_dict['mAP'])
