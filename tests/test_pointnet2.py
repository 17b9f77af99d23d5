import numpy as np
import jax.numpy as jnp

from crb_active_3ddet_tpu.ops import pointnet2 as pn2


def test_fps_spreads_points():
    # 4 clusters far apart; fps with k=4 must pick one from each
    rng = np.random.RandomState(0)
    centers = np.array([[0, 0, 0], [100, 0, 0], [0, 100, 0], [100, 100, 0]],
                       np.float32)
    pts = np.concatenate([c + rng.randn(25, 3).astype(np.float32) * 0.1
                          for c in centers])
    idx = np.asarray(pn2.farthest_point_sample(
        jnp.asarray(pts), jnp.ones(100, bool), 4))
    picked_clusters = {int(i) // 25 for i in idx}
    assert picked_clusters == {0, 1, 2, 3}


def test_fps_ignores_invalid():
    pts = np.zeros((10, 3), np.float32)
    pts[5] = [1000, 0, 0]  # invalid far point
    valid = np.ones(10, bool)
    valid[5] = False
    idx = np.asarray(pn2.farthest_point_sample(
        jnp.asarray(pts), jnp.asarray(valid), 3))
    assert 5 not in idx.tolist()


def test_ball_query_basic():
    xyz = np.array([[0, 0, 0], [0.5, 0, 0], [5, 5, 5], [0.2, 0.2, 0]],
                   np.float32)
    new_xyz = np.array([[0, 0, 0]], np.float32)
    idx, cnt = pn2.ball_query(1.0, 3, jnp.asarray(xyz), jnp.ones(4, bool),
                              jnp.asarray(new_xyz), jnp.ones(1, bool))
    assert int(cnt[0]) == 3
    assert sorted(np.asarray(idx[0]).tolist()) == [0, 1, 3]


def test_ball_query_pads_with_first():
    xyz = np.array([[0, 0, 0], [10, 0, 0]], np.float32)
    new_xyz = np.array([[0.1, 0, 0]], np.float32)
    idx, cnt = pn2.ball_query(1.0, 4, jnp.asarray(xyz), jnp.ones(2, bool),
                              jnp.asarray(new_xyz), jnp.ones(1, bool))
    assert int(cnt[0]) == 1
    assert np.asarray(idx[0]).tolist() == [0, 0, 0, 0]


def test_three_nn_and_interpolate():
    known = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]], np.float32)
    feats = np.array([[1.0], [2.0], [3.0], [100.0]], np.float32)
    unknown = np.array([[0.1, 0.1, 0]], np.float32)
    dist, idx = pn2.three_nn(jnp.asarray(unknown), jnp.ones(1, bool),
                             jnp.asarray(known), jnp.ones(4, bool))
    assert sorted(np.asarray(idx[0]).tolist()) == [0, 1, 2]
    out = pn2.three_interpolate(jnp.asarray(feats), idx, dist)
    # nearest (idx 0, feat 1.0) dominates
    assert 1.0 < float(out[0, 0]) < 2.5


def test_grouping():
    feats = jnp.asarray(np.arange(12).reshape(4, 3).astype(np.float32))
    idx = jnp.asarray([[0, 2], [3, 3]], jnp.int32)
    out = pn2.grouping_operation(feats, idx)
    assert out.shape == (2, 2, 3)
    assert np.allclose(out[0, 1], [6, 7, 8])
