"""CenterPoint (CenterHead) model test on the tiny synthetic grid."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.models import post_processing as pp
from test_pointpillar_model import FakeDataset, make_batch, MODEL_CFG, GRID

pytestmark = pytest.mark.slow


def centerpoint_cfg():
    cfg = CfgNode(dict(MODEL_CFG))
    cfg.NAME = 'CenterPoint'
    cfg.DENSE_HEAD = CfgNode({
        'NAME': 'CenterHead', 'CLASS_AGNOSTIC': False,
        'FEATURE_MAP_STRIDE': 2, 'MAX_OBJS': 16,
        'SHARED_CONV_CHANNEL': 32,
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'cls_weight': 1.0, 'loc_weight': 2.0,
            'code_weights': [1.0] * 8}},
    })
    return cfg


@pytest.fixture(scope='module')
def model_and_vars():
    cfg = centerpoint_cfg()
    model = build_detector(cfg, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, training=True)
    return cfg, model, variables


def test_center_targets():
    from crb_active_3ddet_tpu.models.dense_heads.center_head import (
        make_center_targets)
    gt = jnp.asarray([[6.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.3, 1],
                      [0, 0, 0, 0, 0, 0, 0, 0]], jnp.float32)
    t = make_center_targets(gt, num_classes=1, grid_hw=(16, 16),
                            pcr=jnp.asarray([0., -6.4, -3.]),
                            voxel_size=jnp.asarray([0.4, 0.4, 4.0]),
                            stride=2, max_objs=4)
    hm = np.asarray(t['heatmap'][0])
    # peak at the box center cell: x = 6.0/0.8 = 7.5 -> 7, y = 6.4/0.8 = 8
    assert hm.max() > 0.99
    assert np.unravel_index(hm.argmax(), hm.shape) == (8, 7)
    assert bool(t['mask'][0]) and not bool(t['mask'][1])


def test_train_loss_and_grads(model_and_vars):
    cfg, model, variables = model_and_vars
    batch = make_batch()

    def loss_fn(params):
        out, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, training=True, mutable=['batch_stats'])
        loss, tb = model.compute_loss(out)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                               for g in jax.tree.leaves(grads))))
    assert np.isfinite(float(loss)) and gnorm > 0


def test_per_sample_loss(model_and_vars):
    cfg, model, variables = model_and_vars
    batch = make_batch()
    out, _ = model.apply(variables, batch, training=True,
                         mutable=['batch_stats'])
    vec, _ = model.compute_loss(out, reduce=False)
    assert vec.shape == (2,)


def test_eval_decode_and_nms(model_and_vars):
    cfg, model, variables = model_and_vars
    batch = make_batch()
    out = model.apply(variables, batch, training=False)
    assert out['batch_box_preds'].shape == (2, 16, 7)
    assert out['batch_cls_preds'].shape == (2, 16, 1)
    preds = pp.post_processing(out, cfg.POST_PROCESSING, num_class=1)
    assert preds['pred_boxes'].shape[0] == 2
