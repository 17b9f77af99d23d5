"""PartA2 + PointRCNN model families on a tiny synthetic setup."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.ops import voxelize as vx

from test_pvrcnn_model import (PCR, VOXEL_SIZE, GRID, FakeDataset,
                               make_batch, PVRCNN_CFG)

pytestmark = pytest.mark.slow

ROI_COMMON = {
    'NMS_CONFIG': {
        'TRAIN': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                  'NMS_PRE_MAXSIZE': 128, 'NMS_POST_MAXSIZE': 32,
                  'NMS_THRESH': 0.8},
        'TEST': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                 'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16,
                 'NMS_THRESH': 0.7}},
    'TARGET_CONFIG': {
        'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 16,
        'FG_RATIO': 0.5, 'SAMPLE_ROI_BY_EACH_CLASS': True,
        'CLS_SCORE_TYPE': 'roi_iou', 'CLS_FG_THRESH': 0.75,
        'CLS_BG_THRESH': 0.25, 'CLS_BG_THRESH_LO': 0.1,
        'HARD_BG_RATIO': 0.8, 'REG_FG_THRESH': 0.55},
    'LOSS_CONFIG': {
        'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
        'CORNER_LOSS_REGULARIZATION': True,
        'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                         'rcnn_corner_weight': 1.0,
                         'code_weights': [1.0] * 7}},
}

PARTA2_CFG = CfgNode({
    'NAME': 'PartA2Net',
    'VFE': {'NAME': 'MeanVFE'},
    'BACKBONE_3D': {'NAME': 'UNetV2'},
    'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256},
    'BACKBONE_2D': dict(PVRCNN_CFG.BACKBONE_2D),
    'DENSE_HEAD': dict(PVRCNN_CFG.DENSE_HEAD),
    'POINT_HEAD': {
        'NAME': 'PointIntraPartOffsetHead', 'CLS_FC': [], 'PART_FC': [],
        'CLASS_AGNOSTIC': True,
        'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
        'LOSS_CONFIG': {'LOSS_REG': 'smooth-l1',
                        'LOSS_WEIGHTS': {'point_cls_weight': 1.0,
                                         'point_part_weight': 1.0}}},
    'ROI_HEAD': {
        'NAME': 'PartA2FCHead', 'CLASS_AGNOSTIC': True,
        'SHARED_FC': [64, 64], 'CLS_FC': [64], 'REG_FC': [64],
        'DP_RATIO': 0.3, 'SEG_MASK_SCORE_THRESH': 0.3,
        'ROI_AWARE_POOL': {'POOL_SIZE': 4, 'NUM_FEATURES': 32,
                           'MAX_POINTS_PER_VOXEL': 64},
        **ROI_COMMON},
    'POST_PROCESSING': dict(PVRCNN_CFG.POST_PROCESSING),
})

POINTRCNN_CFG = CfgNode({
    'NAME': 'PointRCNN',
    'BACKBONE_3D': {
        'NAME': 'PointNet2MSG',
        'SA_CONFIG': {
            'NPOINTS': [128, 32],
            'RADIUS': [[0.4, 0.8], [0.8, 1.6]],
            'NSAMPLE': [[8, 8], [8, 8]],
            'MLPS': [[[8, 8], [8, 8]], [[16, 16], [16, 16]]]},
        'FP_MLPS': [[16, 16], [16, 16]]},
    'POINT_HEAD': {
        'NAME': 'PointHeadBox', 'CLS_FC': [16], 'REG_FC': [16],
        'CLASS_AGNOSTIC': False, 'USE_POINT_FEATURES_BEFORE_FUSION': False,
        'TARGET_CONFIG': {
            'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
            'BOX_CODER': 'PointResidualCoder',
            'BOX_CODER_CONFIG': {'use_mean_size': True,
                                 'mean_size': [[3.9, 1.6, 1.56]]}},
        'LOSS_CONFIG': {
            'LOSS_REG': 'WeightedSmoothL1Loss',
            'LOSS_WEIGHTS': {'point_cls_weight': 1.0,
                             'point_box_weight': 1.0,
                             'code_weights': [1.0] * 8}}},
    'ROI_HEAD': {
        'NAME': 'PointRCNNHead', 'CLASS_AGNOSTIC': True,
        'ROI_POINT_POOL': {'POOL_EXTRA_WIDTH': [0.0, 0.0, 0.0],
                           'NUM_SAMPLED_POINTS': 64,
                           'DEPTH_NORMALIZER': 70.0},
        'XYZ_UP_LAYER': [16, 16], 'CLS_FC': [16], 'REG_FC': [16],
        'DP_RATIO': 0.0, 'USE_BN': False,
        'SA_CONFIG': {'NPOINTS': [32, -1], 'RADIUS': [0.4, 100],
                      'NSAMPLE': [8, 8], 'MLPS': [[16, 16], [16, 32]]},
        **ROI_COMMON},
    'POST_PROCESSING': dict(PVRCNN_CFG.POST_PROCESSING),
})


@pytest.mark.parametrize('cfg,name', [(PARTA2_CFG, 'PartA2Net'),
                                      (POINTRCNN_CFG, 'PointRCNN')])
def test_train_and_eval(cfg, name):
    model = build_detector(cfg, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        batch, training=True)

    # train forward + loss + grads flow
    def loss_fn(params):
        out, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, training=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(2)})
        loss, tb = model.compute_loss(out)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0

    # eval forward: decoded rcnn predictions present and finite
    out = model.apply(variables, batch, training=False)
    assert out['batch_box_preds'].shape[-1] == 7
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()
    assert 'rcnn_cls' in out


def test_parta2_point_outputs():
    model = build_detector(PARTA2_CFG, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        batch, training=True)
    out, _ = model.apply(variables, batch, training=True,
                         mutable=['batch_stats'],
                         rngs={'dropout': jax.random.PRNGKey(3)})
    # part offsets are sigmoids in [0, 1]
    po = np.asarray(out['point_part_offset'])
    assert po.min() >= 0 and po.max() <= 1
    # part labels only populated for fg points
    labels = np.asarray(out['point_cls_labels'])
    parts = np.asarray(out['point_part_labels'])
    assert (parts[labels <= 0] == 0).all()
