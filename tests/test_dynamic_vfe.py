"""Dynamic VFEs: uncapped scatter semantics (parity: dynamic_mean_vfe.py,
dynamic_pillar_vfe.py — means/maxes over ALL in-range points, no
MAX_POINTS_PER_VOXEL cap)."""

import numpy as np
import jax
import jax.numpy as jnp

from crb_active_3ddet_tpu.ops import voxelize as vx
from crb_active_3ddet_tpu.models.backbones_3d.vfe import (
    DynamicMeanVFE, DynamicPillarVFE, MeanVFE)

PCR = (0.0, -4.0, -2.0, 8.0, 4.0, 2.0)
VS = (0.5, 0.5, 4.0)
GRID = (16, 16, 1)


def _voxelize_batch(points, k=3, max_voxels=64):
    n = points.shape[1]
    valid = jnp.ones(points.shape[:2], bool)
    out = jax.vmap(lambda p, v: vx.voxelize(
        p, v, jnp.asarray(PCR), jnp.asarray(VS), GRID, max_voxels, k))(
        jnp.asarray(points), valid)
    batch = {
        'points': jnp.asarray(points), 'points_valid': valid,
        'batch_size': points.shape[0], **{k_: out[k_] for k_ in out}}
    return batch


def test_dynamic_mean_is_uncapped():
    rng = np.random.RandomState(0)
    # 40 points all in ONE voxel → K=3 cap truncates MeanVFE, dynamic doesn't
    dense = np.concatenate([
        rng.uniform(0.1, 0.4, (40, 2)),      # x, y inside voxel (0, 8)
        rng.uniform(-1, 1, (40, 1)), rng.rand(40, 1)], 1)
    sparse = np.concatenate([
        rng.uniform(4, 7.9, (24, 1)), rng.uniform(-3.9, 3.9, (24, 1)),
        rng.uniform(-1, 1, (24, 1)), rng.rand(24, 1)], 1)
    pts = np.concatenate([dense, sparse]).astype(np.float32)[None]
    batch = _voxelize_batch(pts, k=3)

    m = DynamicMeanVFE(model_cfg={}, num_point_features=4)
    out = m.apply({}, dict(batch), training=False)
    feats = np.asarray(out['voxel_features'][0])
    coords = np.asarray(batch['voxel_coords'][0])
    valid = np.asarray(batch['voxel_valid'][0])

    # find the dense voxel (coords z,y,x = (0, 8+?, 0)): x bin 0
    dense_mean = dense.mean(0)
    found = False
    for i in range(valid.sum()):
        if coords[i][2] == 0 and abs(feats[i][0] - dense_mean[0]) < 1e-5:
            np.testing.assert_allclose(feats[i], dense_mean, atol=1e-5)
            found = True
    assert found, 'uncapped mean over all 40 points not found'

    # capped MeanVFE on the same batch must differ (only 3 of 40 points)
    mc = MeanVFE(model_cfg={}, num_point_features=4)
    out_c = mc.apply({}, dict(batch), training=False)
    capped = np.asarray(out_c['voxel_features'][0])
    diffs = np.abs(capped[valid] - feats[valid]).max()
    assert diffs > 1e-3


def test_dynamic_pillar_shapes_and_grad():
    rng = np.random.RandomState(1)
    pts = np.concatenate([
        rng.uniform(0.1, 7.9, (2, 64, 1)), rng.uniform(-3.9, 3.9, (2, 64, 1)),
        rng.uniform(-1, 1, (2, 64, 1)), rng.rand(2, 64, 1)], -1).astype(
        np.float32)
    batch = _voxelize_batch(pts, k=2)
    m = DynamicPillarVFE(model_cfg={'NUM_FILTERS': [16], 'USE_NORM': True,
                                    'WITH_DISTANCE': False,
                                    'USE_ABSLOTE_XYZ': True},
                         num_point_features=4, voxel_size=VS,
                         point_cloud_range=PCR)
    vars_ = m.init(jax.random.PRNGKey(0), dict(batch), training=True)
    out, _ = m.apply(vars_, dict(batch), training=True,
                     mutable=['batch_stats'])
    pf = out['pillar_features']
    assert pf.shape == (2, 64, 16)
    assert np.isfinite(np.asarray(pf)).all()
    # padding pillars must be zero
    v = np.asarray(batch['voxel_valid'])
    assert np.abs(np.asarray(pf)[~v]).max() == 0

    def loss(p):
        o = m.apply({'params': p, 'batch_stats': vars_['batch_stats']},
                    dict(batch), training=False)
        return (o['pillar_features'] ** 2).sum()
    g = jax.grad(loss)(vars_['params'])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(g))
