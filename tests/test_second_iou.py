"""SECONDNetIoU: BEV RoI-align IoU head + score fusion post-processing."""

import pytest
import copy


import numpy as np
import jax
import jax.numpy as jnp

from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.models import post_processing as pp

from test_pvrcnn_model import FakeDataset, make_batch, PVRCNN_CFG

pytestmark = pytest.mark.slow


def second_iou_cfg():
    cfg = CfgNode(copy.deepcopy(dict(PVRCNN_CFG)))
    cfg.NAME = 'SECONDNetIoU'
    del cfg['PFE']
    del cfg['POINT_HEAD']
    cfg.ROI_HEAD = CfgNode({
        'NAME': 'SECONDHead', 'CLASS_AGNOSTIC': True,
        'SHARED_FC': [64, 64], 'IOU_FC': [64], 'DP_RATIO': 0.3,
        'ROI_GRID_POOL': {'GRID_SIZE': 7, 'DOWNSAMPLE_RATIO': 8},
        'NMS_CONFIG': dict(PVRCNN_CFG.ROI_HEAD.NMS_CONFIG),
        'TARGET_CONFIG': dict(PVRCNN_CFG.ROI_HEAD.TARGET_CONFIG),
        'LOSS_CONFIG': {'IOU_LOSS': 'BinaryCrossEntropy',
                        'LOSS_WEIGHTS': {'rcnn_iou_weight': 1.0}},
    })
    return cfg


def test_second_iou_train_eval():
    cfg = second_iou_cfg()
    model = build_detector(cfg, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        batch, training=True)

    def loss_fn(p):
        out, _ = model.apply(
            {'params': p, 'batch_stats': variables['batch_stats']},
            batch, training=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(2)})
        loss, tb = model.compute_loss(out)
        return loss
    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    assert float(jnp.abs(
        grads['roi_head']['iou_out']['kernel']).sum()) > 0

    out = model.apply(variables, batch, training=False)
    # eval: boxes are the rois, scores are IoU logits
    assert out['batch_cls_preds'].shape[-1] == 1
    assert np.allclose(np.asarray(out['batch_box_preds']),
                       np.asarray(out['rois']))

    # score fusion modes run through post_processing
    post = CfgNode(copy.deepcopy(dict(cfg.POST_PROCESSING)))
    for st in ('iou', 'cls', 'weighted_iou_cls', 'num_pts_iou_cls'):
        nms = CfgNode(dict(post.NMS_CONFIG))
        nms.SCORE_TYPE = st
        if st == 'weighted_iou_cls':
            nms.SCORE_WEIGHTS = {'iou': 0.7, 'cls': 0.3}
        if st == 'num_pts_iou_cls':
            nms.SCORE_THRESH = {'cls': 10, 'iou': 100}
        p2 = CfgNode(dict(post))
        p2.NMS_CONFIG = nms
        preds = pp.post_processing(dict(out), p2, num_class=1)
        scores = np.asarray(preds['pred_scores'])
        valid = np.asarray(preds['pred_valid'])
        assert np.isfinite(scores[valid]).all()
        assert (scores[valid] <= 1.0).all() and (scores[valid] >= 0.0).all()


def test_voxel_query_oracle():
    """voxel_query finds in-radius non-empty voxels (numpy oracle on the
    probed lattice)."""
    import numpy as np
    from crb_active_3ddet_tpu.ops.voxel_query import (voxel_query,
                                                      _probe_offsets)
    rng = np.random.RandomState(0)
    grid = (8, 20, 20)
    v = 60
    cells = rng.choice(8 * 400, size=v, replace=False)
    coords = np.stack([cells // 400, (cells % 400) // 20, cells % 20],
                      -1).astype(np.int32)
    valid = np.arange(v) < 50
    vs = np.array([0.2, 0.2, 0.2])
    centers = (coords[:, ::-1] + 0.5) * vs  # x,y,z metric
    q_cells = coords[:8].copy()
    q_xyz = centers[:8] + 0.01
    idx, cnt = voxel_query(
        jnp.asarray(q_cells), jnp.asarray(q_xyz), jnp.asarray(coords),
        jnp.asarray(valid), jnp.asarray(centers), grid=grid,
        query_range=(2, 2, 2), radius=0.5, nsample=8, probes_per_dim=5)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    offs = _probe_offsets((2, 2, 2), 5)
    for qi in range(8):
        # oracle: probed cells that are active + within radius
        expect = set()
        for off in offs:
            c = q_cells[qi] + off
            m = (coords == c).all(1) & valid
            if m.any():
                j = int(np.argmax(m))
                if np.sum((centers[j] - q_xyz[qi]) ** 2) < 0.25:
                    expect.add(j)
        got = set(idx[qi][:cnt[qi]].tolist())
        assert got == set(list(expect)[:8]) or got <= expect
        assert cnt[qi] == min(len(expect), 8)


def test_voxel_rcnn_train_eval():
    cfg = CfgNode(copy.deepcopy(dict(PVRCNN_CFG)))
    cfg.NAME = 'VoxelRCNN'
    del cfg['PFE']
    del cfg['POINT_HEAD']
    cfg.ROI_HEAD = CfgNode({
        'NAME': 'VoxelRCNNHead', 'CLASS_AGNOSTIC': True,
        'SHARED_FC': [64, 64], 'CLS_FC': [64], 'REG_FC': [64],
        'DP_RATIO': 0.3,
        'ROI_GRID_POOL': {
            'GRID_SIZE': 4,
            'FEATURES_SOURCE': ['x_conv3', 'x_conv4'],
            'POOL_LAYERS': {
                'x_conv3': {'MLPS': [[16, 16]], 'QUERY_RANGES': [[2, 2, 2]],
                            'POOL_RADIUS': [0.8], 'NSAMPLE': [8],
                            'POOL_METHOD': 'max_pool'},
                'x_conv4': {'MLPS': [[16, 16]], 'QUERY_RANGES': [[2, 2, 2]],
                            'POOL_RADIUS': [1.6], 'NSAMPLE': [8],
                            'POOL_METHOD': 'max_pool'}}},
        'NMS_CONFIG': dict(PVRCNN_CFG.ROI_HEAD.NMS_CONFIG),
        'TARGET_CONFIG': dict(PVRCNN_CFG.ROI_HEAD.TARGET_CONFIG),
        'LOSS_CONFIG': dict(PVRCNN_CFG.ROI_HEAD.LOSS_CONFIG),
    })
    model = build_detector(cfg, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        batch, training=True)

    def loss_fn(p):
        out, _ = model.apply(
            {'params': p, 'batch_stats': variables['batch_stats']},
            batch, training=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(2)})
        loss, _ = model.compute_loss(out)
        return loss
    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    # reg grads may be zero with no fg rois at random init; cls is always on
    assert float(jnp.abs(
        grads['roi_head']['cls_pred']['kernel']).sum()) > 0
    out = model.apply(variables, batch, training=False)
    assert out['batch_box_preds'].shape[-1] == 7
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()
