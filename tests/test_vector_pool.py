"""Vector-pool aggregation (PV-RCNN++ local feature op)."""

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.xslow]
import numpy as np
import jax
import jax.numpy as jnp


from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.models.backbones_3d.vector_pool import (
    VectorPoolAggregation, VectorPoolAggregationMSG, _sub_voxel_offsets,
    _chunked_three_interpolate)


def test_sub_voxel_offsets_span():
    offs = _sub_voxel_offsets(1.2, (2, 2, 2))
    assert offs.shape == (8, 3)
    assert np.isclose(np.abs(offs).max(), 0.6)  # centers at ±R/2 for G=2


def test_chunked_interpolate_matches_direct():
    from crb_active_3ddet_tpu.ops import pointnet2 as pn2
    rng = np.random.RandomState(0)
    n, c, q = 300, 8, 50
    xyz = jnp.asarray(rng.rand(n, 3) * 10, jnp.float32)
    feats = jnp.asarray(rng.randn(n, c), jnp.float32)
    queries = jnp.asarray(rng.rand(q, 3) * 10, jnp.float32)
    valid = jnp.ones(n, bool)
    got = _chunked_three_interpolate(xyz, valid, feats, queries,
                                     max_dist=100.0, chunk=16)
    dist, idx = pn2.three_nn(queries, jnp.ones(q, bool), xyz, valid)
    expect = pn2.three_interpolate(feats, idx, dist)
    assert np.allclose(np.asarray(got), np.asarray(expect), atol=1e-5)
    # out-of-range queries interpolate to zero
    far = jnp.asarray([[500.0, 500.0, 500.0]])
    z = _chunked_three_interpolate(xyz, valid, feats, far, max_dist=1.0,
                                   chunk=16)
    assert np.allclose(np.asarray(z), 0.0)


def test_vector_pool_msg_forward():
    rng = np.random.RandomState(1)
    b, n, m, c = 2, 256, 32, 32
    xyz = jnp.asarray(rng.rand(b, n, 3) * 20, jnp.float32)
    feats = jnp.asarray(rng.randn(b, n, c), jnp.float32)
    new_xyz = jnp.asarray(rng.rand(b, m, 3) * 20, jnp.float32)
    xyz_valid = jnp.asarray(np.arange(n)[None, :] < np.array([[200], [256]]))
    new_valid = jnp.ones((b, m), bool)

    cfg = CfgNode({
        'NUM_GROUPS': 2,
        'NUM_REDUCED_CHANNELS': 16,
        'NUM_CHANNELS_OF_LOCAL_AGGREGATION': 16,
        'LOCAL_AGGREGATION_TYPE': 'local_interpolation',
        'GROUP_CFG_0': {'NUM_LOCAL_VOXEL': [2, 2, 2],
                        'MAX_NEIGHBOR_DISTANCE': 0.8,
                        'NEIGHBOR_NSAMPLE': -1, 'POST_MLPS': [32, 32]},
        'GROUP_CFG_1': {'NUM_LOCAL_VOXEL': [3, 3, 3],
                        'MAX_NEIGHBOR_DISTANCE': 1.6,
                        'NEIGHBOR_NSAMPLE': -1, 'POST_MLPS': [32, 32]},
        'MSG_POST_MLPS': [64],
    })
    mod = VectorPoolAggregationMSG(config=cfg)
    variables = mod.init(jax.random.PRNGKey(0), xyz, xyz_valid, new_xyz,
                         new_valid, feats, training=False)
    out = mod.apply(variables, xyz, xyz_valid, new_xyz, new_valid, feats,
                    training=False)
    assert out.shape == (b, m, 64)
    assert np.isfinite(np.asarray(out)).all()
    # per-sub-voxel kernels exist and differ per position
    w = variables['params']['group_0']['local_kernel']
    assert w.shape[0] == 8
    # invalid query rows are zeroed
    nv = new_valid.at[0, 0].set(False)
    out2 = mod.apply(variables, xyz, xyz_valid, new_xyz, nv, feats,
                     training=False)
    assert np.allclose(np.asarray(out2)[0, 0], 0.0)


def test_pvrcnn_plusplus_train_eval():
    """PVRCNNPlusPlus: early proposals + SPC keypoints + vector-pool VSA and
    RoI grid pooling."""
    import copy
    from crb_active_3ddet_tpu.models.detectors import build_detector
    from test_pvrcnn_model import FakeDataset, make_batch, PVRCNN_CFG

    cfg = CfgNode(copy.deepcopy(dict(PVRCNN_CFG)))
    cfg.NAME = 'PVRCNNPlusPlus'
    vp_layer = {
        'NUM_GROUPS': 1, 'NUM_REDUCED_CHANNELS': 2,
        'NUM_CHANNELS_OF_LOCAL_AGGREGATION': 8,
        'LOCAL_AGGREGATION_TYPE': 'local_interpolation',
        'GROUP_CFG_0': {'NUM_LOCAL_VOXEL': [2, 2, 2],
                        'MAX_NEIGHBOR_DISTANCE': 0.8,
                        'NEIGHBOR_NSAMPLE': -1, 'POST_MLPS': [16, 16]},
        'MSG_POST_MLPS': [16],
    }
    cfg.PFE = CfgNode({
        'NAME': 'VoxelSetAbstraction', 'POINT_SOURCE': 'raw_points',
        'NUM_KEYPOINTS': 64, 'NUM_OUTPUT_FEATURES': 32,
        'SAMPLE_METHOD': 'SPC',
        'SPC_SAMPLING': {'NUM_SECTORS': 6, 'SAMPLE_RADIUS_WITH_ROI': 1.6},
        'FEATURES_SOURCE': ['bev', 'x_conv3', 'raw_points'],
        'SA_LAYER': {
            'raw_points': CfgNode(dict(vp_layer)),
            'x_conv3': CfgNode({**copy.deepcopy(vp_layer),
                                'NUM_REDUCED_CHANNELS': 16,
                                'DOWNSAMPLE_FACTOR': 4}),
        }})
    roi = CfgNode(copy.deepcopy(dict(cfg.ROI_HEAD)))
    roi.ROI_GRID_POOL = CfgNode({
        'GRID_SIZE': 4,
        **copy.deepcopy(vp_layer), 'NUM_REDUCED_CHANNELS': 16,
    })
    cfg.ROI_HEAD = roi

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
    # grads reach the vector-pool kernels in the pfe
    g = grads['pfe']
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert total > 0

    out = model.apply(variables, batch, training=False)
    assert out['batch_box_preds'].shape[-1] == 7
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()
    assert 'rcnn_cls' in out
