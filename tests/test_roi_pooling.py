"""RoI-aware voxel pooling + RoI point pooling vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from crb_active_3ddet_tpu.ops.roi_pooling import (roiaware_pool3d,
                                                  roipoint_pool3d)


def _local(points, box):
    shift = points - box[:3]
    c, s = np.cos(-box[6]), np.sin(-box[6])
    return np.stack([shift[:, 0] * c - shift[:, 1] * s,
                     shift[:, 0] * s + shift[:, 1] * c,
                     shift[:, 2]], axis=1)


def test_roiaware_pool3d_oracle():
    rng = np.random.RandomState(0)
    n, c, g = 300, 4, 4
    points = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    feats = rng.randn(n, c).astype(np.float32)
    rois = np.array([[0, 0, 0, 4.0, 2.0, 2.0, 0.3],
                     [2, 2, 0, 2.0, 2.0, 2.0, -0.5]], np.float32)
    for method in ('max', 'avg'):
        got = np.asarray(roiaware_pool3d(
            jnp.asarray(points), jnp.asarray(feats), jnp.asarray(rois),
            out_size=g, pool_method=method))
        for ri, box in enumerate(rois):
            local = _local(points, box)
            inside = (np.abs(local) <= box[3:6] / 2).all(1)
            rel = local + box[3:6] / 2
            cell = np.clip((rel / box[3:6] * g).astype(int), 0, g - 1)
            for gx in range(g):
                for gy in range(g):
                    for gz in range(g):
                        m = inside & (cell[:, 0] == gx) & \
                            (cell[:, 1] == gy) & (cell[:, 2] == gz)
                        if m.sum() == 0:
                            assert np.allclose(got[ri, gx, gy, gz], 0)
                        elif method == 'max':
                            assert np.allclose(got[ri, gx, gy, gz],
                                               feats[m].max(0), atol=1e-5)
                        else:
                            assert np.allclose(got[ri, gx, gy, gz],
                                               feats[m].mean(0), atol=1e-5)


def test_roipoint_pool3d():
    rng = np.random.RandomState(1)
    n, c, s = 200, 2, 16
    points = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    feats = rng.randn(n, c).astype(np.float32)
    rois = np.array([[0, 0, 0, 4.0, 4.0, 4.0, 0.0],     # many members
                     [20, 20, 20, 1.0, 1.0, 1.0, 0.0],  # empty
                     [1, 1, 0, 0.8, 0.8, 8.0, 0.7]],    # few members
                    np.float32)
    pooled, empty = roipoint_pool3d(
        jnp.asarray(points), jnp.asarray(feats), jnp.asarray(rois),
        num_sampled_points=s)
    pooled, empty = np.asarray(pooled), np.asarray(empty)
    assert pooled.shape == (3, s, 3 + c)
    assert list(empty) == [False, True, False]
    # roi 0: sampled points must actually lie inside
    local = _local(pooled[0, :, :3], rois[0])
    assert (np.abs(local) <= rois[0, 3:6] / 2 + 1e-4).all()
    # roi 0 members = first s inside points in original order
    inside0 = (np.abs(_local(points, rois[0])) <= rois[0, 3:6] / 2).all(1)
    expect = points[inside0][:s]
    assert np.allclose(pooled[0, :len(expect), :3], expect)
    # empty roi → zeros
    assert np.allclose(pooled[1], 0)
    # under-full roi wraps its members
    inside2 = (np.abs(_local(points, rois[2])) <= rois[2, 3:6] / 2).all(1)
    k = inside2.sum()
    if 0 < k < s:
        assert np.allclose(pooled[2, k], pooled[2, 0])
