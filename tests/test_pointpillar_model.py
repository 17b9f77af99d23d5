"""End-to-end model test: tiny PointPillars on synthetic voxels."""

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
VOXEL_SIZE = [0.4, 0.4, 4.0]
GRID = vx.grid_size_from_range(PCR, VOXEL_SIZE)  # (32, 32, 1)

MODEL_CFG = CfgNode({
    'NAME': 'PointPillar',
    'VFE': {'NAME': 'PillarVFE', 'WITH_DISTANCE': False, 'USE_ABSLOTE_XYZ': True,
            'USE_NORM': True, 'NUM_FILTERS': [32]},
    'MAP_TO_BEV': {'NAME': 'PointPillarScatter', 'NUM_BEV_FEATURES': 32},
    'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [2, 2],
                    'LAYER_STRIDES': [2, 2], 'NUM_FILTERS': [32, 64],
                    'UPSAMPLE_STRIDES': [1, 2], 'NUM_UPSAMPLE_FILTERS': [64, 64]},
    'DENSE_HEAD': {
        'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
        'USE_DIRECTION_CLASSIFIER': True, 'DIR_OFFSET': 0.78539,
        'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
        'ANCHOR_GENERATOR_CONFIG': [
            {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
             'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
             'align_center': False, 'feature_map_stride': 2,
             'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
        ],
        'TARGET_ASSIGNER_CONFIG': {
            'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
            'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
            'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder'},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
            'code_weights': [1.0] * 7}},
    },
    'POST_PROCESSING': {
        'RECALL_THRESH_LIST': [0.3, 0.5, 0.7], 'SCORE_THRESH': 0.1,
        'OUTPUT_RAW_SCORE': False, 'EVAL_METRIC': 'kitti',
        'NMS_CONFIG': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                       'NMS_THRESH': 0.01, 'NMS_PRE_MAXSIZE': 512,
                       'NMS_POST_MAXSIZE': 32}},
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
    batches = []
    for b in range(batch_size):
        pts = np.concatenate([
            rng.uniform(0, 12.8, (n, 1)), rng.uniform(-6.4, 6.4, (n, 1)),
            rng.uniform(-3, 1, (n, 1)), rng.uniform(0, 1, (n, 1)),
        ], axis=1).astype(np.float32)
        out = vx.voxelize(jnp.asarray(pts), jnp.ones(n, bool),
                          jnp.asarray(PCR), jnp.asarray(VOXEL_SIZE), GRID,
                          max_voxels=256, max_points_per_voxel=8)
        batches.append((pts, out))
    gt = np.zeros((batch_size, 5, 8), np.float32)
    gt[:, 0] = [6.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0, 1]  # one Car each
    gt[0, 1] = [3.0, -3.0, -1.0, 3.9, 1.6, 1.56, 1.0, 1]
    return {
        'points': jnp.stack([jnp.asarray(p) for p, _ in batches]),
        'points_valid': jnp.ones((batch_size, n), bool),
        'voxels': jnp.stack([o['voxels'] for _, o in batches]),
        'voxel_coords': jnp.stack([o['voxel_coords'] for _, o in batches]),
        'voxel_num_points': jnp.stack([o['voxel_num_points'] for _, o in batches]),
        'voxel_valid': jnp.stack([o['voxel_valid'] for _, o in batches]),
        'gt_boxes': jnp.asarray(gt),
        'batch_size': batch_size,
    }


@pytest.fixture(scope='module')
def model_and_vars():
    model = build_detector(MODEL_CFG, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, training=True)
    return model, variables


def test_forward_train_shapes(model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()
    out, _ = model.apply(variables, batch, training=True,
                         mutable=['batch_stats'])
    # anchors: 16x16 fm, 1 size, 2 rots = 512
    assert out['box_cls_labels'].shape == (2, 512)
    assert out['box_reg_targets'].shape == (2, 512, 7)
    assert out['cls_preds'].shape == (2, 16, 16, 2)
    assert out['box_preds'].shape == (2, 16, 16, 14)
    # at least one positive anchor per sample (gt exists)
    assert int((out['box_cls_labels'][0] > 0).sum()) > 0
    assert int((out['box_cls_labels'][1] > 0).sum()) > 0


def test_loss_finite_and_grads(model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()

    def loss_fn(params):
        out, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, training=True, mutable=['batch_stats'])
        loss, tb = model.compute_loss(out)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in flat)))
    assert np.isfinite(gnorm) and gnorm > 0


def test_per_sample_loss_mode(model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()
    out, _ = model.apply(variables, batch, training=True,
                         mutable=['batch_stats'])
    loss_vec, _ = model.compute_loss(out, reduce=False)
    assert loss_vec.shape == (2,)
    loss_red, _ = model.compute_loss(out, reduce=True)
    # reduce=True is the per-batch mean of summed per-sample losses
    assert np.allclose(float(loss_red), float(loss_vec.sum() / 2), rtol=1e-5)


def test_eval_forward_and_postprocess(model_and_vars):
    model, variables = model_and_vars
    batch = make_batch()
    out = model.apply(variables, batch, training=False)
    assert out['batch_cls_preds'].shape == (2, 512, 1)
    assert out['batch_box_preds'].shape == (2, 512, 7)
    assert 'rpn_preds' in out
    pred = pp.post_processing(out, MODEL_CFG.POST_PROCESSING, num_class=1)
    assert pred['pred_boxes'].shape == (2, 32, 7)
    assert pred['pred_logits'].shape == (2, 32, 1)
    assert pred['pred_valid'].shape == (2, 32)
    assert pred['pred_box_unique_density'].shape == (2, 32)


def test_recall_record():
    gt = jnp.asarray([[6.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0]])
    preds = jnp.asarray([[6.1, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0],
                         [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    rec = pp.generate_recall_record(
        preds, jnp.asarray([True, True]), gt, jnp.asarray([True]))
    assert int(rec['gt']) == 1
    assert int(rec['rcnn_0.7']) == 1


def test_dynamic_vfe_aliases():
    """DynMeanVFE / DynPillarVFE registry parity (scatter-based VFEs)."""
    from crb_active_3ddet_tpu.models.backbones_3d.vfe import build_vfe
    m = build_vfe({'NAME': 'DynMeanVFE'}, 4, [0.4, 0.4, 4.0], PCR)
    p = build_vfe({'NAME': 'DynPillarVFE', 'NUM_FILTERS': [32],
                   'USE_NORM': True, 'WITH_DISTANCE': False,
                   'USE_ABSLOTE_XYZ': True}, 4, [0.4, 0.4, 4.0], PCR)
    assert m.get_output_feature_dim() == 4
    assert p.get_output_feature_dim() == 32


def test_conv2d_collapse():
    """Conv2DCollapse folds depth into channels + learned reduction."""
    import jax
    import jax.numpy as jnp
    from crb_active_3ddet_tpu.models.backbones_2d.map_to_bev import (
        build_map_to_bev)
    m = build_map_to_bev({'NAME': 'Conv2DCollapse', 'NUM_BEV_FEATURES': 32,
                          'ARGS': {'kernel_size': 1, 'bias': False}},
                         grid_size=(8, 8, 4))
    x = jnp.ones((2, 4, 8, 8, 16))
    variables = m.init(jax.random.PRNGKey(0),
                       {'encoded_spconv_features': x}, training=False)
    out = m.apply(variables, {'encoded_spconv_features': x}, training=False)
    assert out['spatial_features'].shape == (2, 8, 8, 32)
