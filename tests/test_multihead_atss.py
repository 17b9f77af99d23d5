"""AnchorHeadMulti + ATSSTargetAssigner (VERDICT r1 item 10 tail)."""

import copy


import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.models.detectors import build_detector

from test_pvrcnn_model import FakeDataset, make_batch
from test_pointpillar_model import MODEL_CFG

pytestmark = pytest.mark.slow


def _anchor_cfg(name, size, height):
    return {'class_name': name, 'anchor_sizes': [size],
            'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [height],
            'align_center': False, 'feature_map_stride': 16,
            'matched_threshold': 0.6, 'unmatched_threshold': 0.45}


class FakeDataset3(FakeDataset):
    class_names = ['Car', 'Pedestrian', 'Cyclist']


def multi_cfg():
    cfg = CfgNode(copy.deepcopy(dict(MODEL_CFG)))
    cfg.NAME = 'SECONDNet'
    cfg.VFE = {'NAME': 'MeanVFE'}
    cfg.BACKBONE_3D = {'NAME': 'VoxelBackBone8x'}
    cfg.MAP_TO_BEV = {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256}
    dh = cfg.DENSE_HEAD
    dh.NAME = 'AnchorHeadMulti'
    dh.SHARED_CONV_NUM_FILTER = 32
    dh.ANCHOR_GENERATOR_CONFIG = [
        _anchor_cfg('Car', [3.9, 1.6, 1.56], -1.78),
        _anchor_cfg('Pedestrian', [0.8, 0.6, 1.73], -0.6),
        _anchor_cfg('Cyclist', [1.76, 0.6, 1.73], -0.6)]
    dh.RPN_HEAD_CFGS = [
        {'HEAD_CLS_NAME': ['Car']},
        {'HEAD_CLS_NAME': ['Pedestrian', 'Cyclist']}]
    dh.SEPARATE_REG_CONFIG = {
        'NUM_MIDDLE_CONV': 1, 'NUM_MIDDLE_FILTER': 32,
        'REG_LIST': ['reg:2', 'height:1', 'size:3', 'angle:1']}
    return cfg


def test_anchor_head_multi_train_eval():
    cfg = multi_cfg()
    model = build_detector(cfg, num_class=3, dataset=FakeDataset3())
    batch = make_batch()
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        batch, training=True)
    # both heads exist as separate towers
    params = variables['params']['dense_head']
    assert 'head0_conv_cls' in params and 'head1_conv_cls' in params
    assert 'head0_conv_reg' in params  # separate reg branch

    def loss_fn(p):
        out, _ = model.apply(
            {'params': p, 'batch_stats': variables['batch_stats']},
            batch, training=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(2)})
        loss, _ = model.compute_loss(out)
        return loss
    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    g = grads['dense_head']
    assert float(jnp.abs(g['head1_conv_cls']['kernel']).sum()) > 0

    out = model.apply(variables, batch, training=False)
    # decoded preds cover all 3 classes over the concatenated anchors
    assert out['batch_cls_preds'].shape[-1] == 3
    assert out['batch_box_preds'].shape[-1] == 7
    # anchor count = single-head total for the same generator config
    total = out['batch_box_preds'].shape[1]
    assert total == 2 * 2 * 3 * 2  # H/16 x W/16 x classes x rotations


def test_atss_assigner():
    cfg = multi_cfg()
    dh = cfg.DENSE_HEAD
    dh.NAME = 'AnchorHeadSingle'
    del dh['RPN_HEAD_CFGS']
    del dh['SEPARATE_REG_CONFIG']
    dh.TARGET_ASSIGNER_CONFIG = CfgNode(dict(dh.TARGET_ASSIGNER_CONFIG))
    dh.TARGET_ASSIGNER_CONFIG.NAME = 'ATSSTargetAssigner'
    dh.TARGET_ASSIGNER_CONFIG.TOPK = 9
    model = build_detector(cfg, num_class=3, dataset=FakeDataset3())
    batch = make_batch()
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        batch, training=True)
    out, _ = model.apply(variables, batch, training=True,
                         mutable=['batch_stats'],
                         rngs={'dropout': jax.random.PRNGKey(2)})
    labels = np.asarray(out['box_cls_labels'])
    # the gt (a Car at (6, 0)) must claim at least one positive anchor
    assert (labels == 1).sum() >= 1
    # positives carry reg targets + weights
    w = np.asarray(out['reg_weights'])
    assert (w > 0).sum() == (labels > 0).sum()
    loss, _ = model.compute_loss(out)
    assert np.isfinite(float(loss))
