"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference op."""

import numpy as np
import jax.numpy as jnp

from crb_active_3ddet_tpu.ops.iou3d import boxes_iou_bev, boxes_overlap_bev
from crb_active_3ddet_tpu.ops.pallas_kernels import sparse_conv_gather_gemm
from crb_active_3ddet_tpu.ops.pallas_overlap import (boxes_iou_bev_pallas,
                                                     boxes_overlap_bev_pallas)
from crb_active_3ddet_tpu.ops.sparse.sparse_ops import subm_conv3d_gather


def _random_boxes(rng, n):
    b = np.zeros((n, 7), np.float32)
    b[:, 0:2] = rng.uniform(-10, 10, (n, 2))
    b[:, 2] = rng.uniform(-1, 1, n)
    b[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_pallas_overlap_matches_xla():
    rng = np.random.RandomState(3)
    a = jnp.asarray(_random_boxes(rng, 70))    # not a multiple of row_tile
    b = jnp.asarray(_random_boxes(rng, 150))   # not a multiple of 128
    ref = np.asarray(boxes_overlap_bev(a, b))
    got = np.asarray(boxes_overlap_bev_pallas(a, b, row_tile=16,
                                              interpret=True))
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=1e-4)


def test_pallas_overlap_degenerate_rows():
    rng = np.random.RandomState(4)
    a = _random_boxes(rng, 8)
    a[3:] = 0.0  # zero-padded (degenerate) boxes must produce zero overlap
    b = _random_boxes(rng, 8)
    got = np.asarray(boxes_overlap_bev_pallas(jnp.asarray(a), jnp.asarray(b),
                                              row_tile=8, interpret=True))
    assert np.allclose(got[3:], 0.0)
    ref = np.asarray(boxes_overlap_bev(jnp.asarray(a[:3]), jnp.asarray(b)))
    assert np.allclose(got[:3], ref, atol=1e-4)


def test_pallas_iou_matches_xla():
    rng = np.random.RandomState(5)
    a = jnp.asarray(_random_boxes(rng, 33))
    ref = np.asarray(boxes_iou_bev(a, a))
    got = np.asarray(boxes_iou_bev_pallas(a, a, row_tile=16, interpret=True))
    assert np.allclose(got, ref, atol=1e-4)


def test_matches_xla_gather_gemm():
    rng = np.random.RandomState(0)
    v_in, v_out, k, c_in, c_out = 64, 48, 27, 16, 32
    feats = jnp.asarray(rng.randn(v_in, c_in).astype(np.float32))
    rulebook = rng.randint(-1, v_in, (v_out, k)).astype(np.int32)
    w = jnp.asarray(rng.randn(k, c_in, c_out).astype(np.float32) * 0.1)

    ref = subm_conv3d_gather(feats, jnp.asarray(rulebook), w)
    got = sparse_conv_gather_gemm(feats, jnp.asarray(rulebook), w,
                                  block_v=16, interpret=True)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_all_missing_neighbors():
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    rulebook = jnp.full((8, 27), -1, jnp.int32)
    w = jnp.asarray(rng.randn(27, 4, 8).astype(np.float32))
    got = sparse_conv_gather_gemm(feats, rulebook, w, block_v=8,
                                  interpret=True)
    assert np.allclose(np.asarray(got), 0.0)


def test_unaligned_voxel_count():
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(20, 8).astype(np.float32))
    rulebook = jnp.asarray(rng.randint(-1, 20, (37, 27)).astype(np.int32))
    w = jnp.asarray(rng.randn(27, 8, 16).astype(np.float32) * 0.1)
    ref = subm_conv3d_gather(feats, rulebook, w)
    got = sparse_conv_gather_gemm(feats, rulebook, w, block_v=16,
                                  interpret=True)
    assert got.shape == (37, 16)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fps_pallas_parity():
    """farthest_point_sample_pallas (interpret) matches the XLA scan
    bit-exactly — same f32 distance math, same first-max tie-breaking."""
    import numpy as np
    import jax.numpy as jnp
    from crb_active_3ddet_tpu.ops.pallas_kernels import \
        farthest_point_sample_pallas
    from crb_active_3ddet_tpu.ops import pointnet2 as pn2

    rng = np.random.RandomState(42)
    for n, k, nv in ((300, 32, 300), (1024, 256, 640), (129, 64, 129)):
        pts = (rng.randn(n, 3) * 8).astype(np.float32)
        valid = np.arange(n) < nv
        # call the scan formulation directly (the public fn dispatches to
        # pallas on TPU; tests run on CPU so it IS the scan)
        ref = np.asarray(pn2.farthest_point_sample(
            jnp.asarray(pts), jnp.asarray(valid), k))
        got = np.asarray(farthest_point_sample_pallas(
            jnp.asarray(pts), jnp.asarray(valid), k, interpret=True))
        np.testing.assert_array_equal(got, ref)
        # all selected indices must be valid points
        assert (got < nv).all()
