"""PV-RCNN end-to-end model test on a tiny synthetic setup."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.models import post_processing as pp
from crb_active_3ddet_tpu.ops import voxelize as vx

pytestmark = pytest.mark.slow

PCR = [0.0, -6.4, -3.0, 12.8, 6.4, 1.0]
VOXEL_SIZE = [0.4, 0.4, 0.1]
GRID = vx.grid_size_from_range(PCR, VOXEL_SIZE)  # (32, 32, 40)

PVRCNN_CFG = CfgNode({
    'NAME': 'PVRCNN',
    'VFE': {'NAME': 'MeanVFE'},
    'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'},
    'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256},
    'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [2, 2],
                    'LAYER_STRIDES': [1, 2], 'NUM_FILTERS': [32, 64],
                    'UPSAMPLE_STRIDES': [1, 2], 'NUM_UPSAMPLE_FILTERS': [64, 64]},
    'DENSE_HEAD': {
        'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
        'USE_DIRECTION_CLASSIFIER': True, 'DIR_OFFSET': 0.78539,
        'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
        'ANCHOR_GENERATOR_CONFIG': [
            {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
             'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
             'align_center': False, 'feature_map_stride': 8,
             'matched_threshold': 0.6, 'unmatched_threshold': 0.45}],
        'TARGET_ASSIGNER_CONFIG': {
            'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
            'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
            'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder'},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
            'code_weights': [1.0] * 7}}},
    'PFE': {
        'NAME': 'VoxelSetAbstraction', 'POINT_SOURCE': 'raw_points',
        'NUM_KEYPOINTS': 128, 'NUM_OUTPUT_FEATURES': 64,
        'SAMPLE_METHOD': 'FPS',
        'FEATURES_SOURCE': ['bev', 'x_conv3', 'x_conv4', 'raw_points'],
        'SA_LAYER': {
            'raw_points': {'MLPS': [[8, 8], [8, 8]],
                           'POOL_RADIUS': [0.4, 0.8], 'NSAMPLE': [8, 8]},
            'x_conv3': {'DOWNSAMPLE_FACTOR': 4, 'MLPS': [[16, 16], [16, 16]],
                        'POOL_RADIUS': [1.2, 2.4], 'NSAMPLE': [8, 8]},
            'x_conv4': {'DOWNSAMPLE_FACTOR': 8, 'MLPS': [[16, 16], [16, 16]],
                        'POOL_RADIUS': [2.4, 4.8], 'NSAMPLE': [8, 8]}}},
    'POINT_HEAD': {
        'NAME': 'PointHeadSimple', 'CLS_FC': [32, 32], 'CLASS_AGNOSTIC': True,
        'USE_POINT_FEATURES_BEFORE_FUSION': True,
        'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
        'LOSS_CONFIG': {'LOSS_REG': 'smooth-l1',
                        'LOSS_WEIGHTS': {'point_cls_weight': 1.0}}},
    'ROI_HEAD': {
        'NAME': 'PVRCNNHead', 'CLASS_AGNOSTIC': True, 'SAMPLING_ROUND': 3,
        'SHARED_FC': [64, 64], 'CLS_FC': [64, 64], 'REG_FC': [64, 64],
        'DP_RATIO': 0.3,
        'NMS_CONFIG': {
            'TRAIN': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                      'NMS_PRE_MAXSIZE': 128, 'NMS_POST_MAXSIZE': 32,
                      'NMS_THRESH': 0.8},
            'TEST': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                     'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16,
                     'NMS_THRESH': 0.7}},
        'ROI_GRID_POOL': {'GRID_SIZE': 4, 'MLPS': [[16, 16], [16, 16]],
                          'POOL_RADIUS': [0.8, 1.6], 'NSAMPLE': [8, 8],
                          'POOL_METHOD': 'max_pool'},
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
                             'code_weights': [1.0] * 7}}},
    'POST_PROCESSING': {
        'RECALL_THRESH_LIST': [0.3, 0.5, 0.7], 'SCORE_THRESH': 0.1,
        'OUTPUT_RAW_SCORE': False, 'EVAL_METRIC': 'kitti',
        'NMS_CONFIG': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                       'NMS_THRESH': 0.1, 'NMS_PRE_MAXSIZE': 16,
                       'NMS_POST_MAXSIZE': 8}},
})


class FakeDataset:
    class_names = ['Car']
    grid_size = np.asarray(GRID)
    point_cloud_range = np.asarray(PCR)
    voxel_size = np.asarray(VOXEL_SIZE)
    num_point_features = 4


def make_batch(batch_size=2, seed=0):
    rng = np.random.RandomState(seed)
    n = 512
    pts_all, vox_all = [], []
    for b in range(batch_size):
        pts = np.concatenate([
            rng.uniform(0, 12.8, (n, 1)), rng.uniform(-6.4, 6.4, (n, 1)),
            rng.uniform(-3, 1, (n, 1)), rng.uniform(0, 1, (n, 1)),
        ], axis=1).astype(np.float32)
        out = vx.voxelize(jnp.asarray(pts), jnp.ones(n, bool),
                          jnp.asarray(PCR), jnp.asarray(VOXEL_SIZE), GRID,
                          max_voxels=256, max_points_per_voxel=5)
        pts_all.append(pts)
        vox_all.append(out)
    gt = np.zeros((batch_size, 4, 8), np.float32)
    gt[:, 0] = [6.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0, 1]
    return {
        'points': jnp.stack([jnp.asarray(p) for p in pts_all]),
        'points_valid': jnp.ones((batch_size, n), bool),
        'voxels': jnp.stack([o['voxels'] for o in vox_all]),
        'voxel_coords': jnp.stack([o['voxel_coords'] for o in vox_all]),
        'voxel_num_points': jnp.stack([o['voxel_num_points'] for o in vox_all]),
        'voxel_valid': jnp.stack([o['voxel_valid'] for o in vox_all]),
        'gt_boxes': jnp.asarray(gt),
        'batch_size': batch_size,
    }


@pytest.fixture(scope='module')
def model_and_vars():
    model = build_detector(PVRCNN_CFG, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        batch, training=True)
    return model, variables


def test_train_forward_and_loss(model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()
    out, _ = model.apply(variables, batch, training=True,
                         mutable=['batch_stats'],
                         rngs={'dropout': jax.random.PRNGKey(2)})
    assert out['rois'].shape == (2, 16, 7)
    assert out['rcnn_cls'].shape == (32, 1)
    assert out['rcnn_reg'].shape == (32, 7)
    assert 'point_cls_labels' in out
    loss, tb = model.compute_loss(out)
    assert np.isfinite(float(loss))
    assert 'rcnn_loss' in tb and 'point_loss' in tb


def test_gradients_flow(model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()

    def loss_fn(params):
        out, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, training=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(3)})
        loss, _ = model.compute_loss(out)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                               for g in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0
    # roi head shared fc got gradients (CRB stage-2 target layer)
    shared_g = grads['roi_head']['shared_fc_1']['kernel']
    assert float(jnp.abs(shared_g).sum()) > 0


def test_eval_deterministic(model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()
    out = model.apply(variables, batch, training=False)
    assert out['rcnn_cls'].ndim == 2  # no MC without dropout rng
    assert out['batch_cls_preds'].shape == (2, 16, 1)
    assert out['batch_box_preds'].shape == (2, 16, 7)
    preds = pp.post_processing(out, PVRCNN_CFG.POST_PROCESSING, num_class=1)
    assert preds['pred_boxes'].shape == (2, 8, 7)


def test_eval_mc_dropout(model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()
    out = model.apply(variables, batch, training=False,
                      rngs={'dropout': jax.random.PRNGKey(7)})
    assert out['rcnn_cls'].shape == (3, 32, 1)  # SAMPLING_ROUND=3
    # rounds differ (dropout active)
    assert not np.allclose(np.asarray(out['rcnn_cls'][0]),
                           np.asarray(out['rcnn_cls'][1]))
