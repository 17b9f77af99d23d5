"""Vector-pool aggregation (PV-RCNN++ local feature op)."""

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
