"""Rotated IoU tests — oracles are closed-form axis-aligned cases and
Monte-Carlo area estimation (independent of the clip algorithm)."""

import numpy as np
import jax.numpy as jnp
import pytest

from crb_active_3ddet_tpu.ops import iou3d


def _mc_bev_overlap(box_a, box_b, n=200_000, seed=0):
    """Monte-Carlo rotated-rect intersection area (independent oracle)."""
    rng = np.random.RandomState(seed)
    # sample in bounding square of box_a
    r = np.hypot(box_a[3], box_a[4]) / 2
    xs = rng.uniform(box_a[0] - r, box_a[0] + r, n)
    ys = rng.uniform(box_a[1] - r, box_a[1] + r, n)

    def inside(box):
        ca, sa = np.cos(-box[6]), np.sin(-box[6])
        lx = (xs - box[0]) * ca - (ys - box[1]) * sa
        ly = (xs - box[0]) * sa + (ys - box[1]) * ca
        return (np.abs(lx) <= box[3] / 2) & (np.abs(ly) <= box[4] / 2)

    frac = (inside(box_a) & inside(box_b)).mean()
    return frac * (2 * r) ** 2


def box(x, y, z, dx, dy, dz, h):
    return np.array([x, y, z, dx, dy, dz, h], np.float32)


class TestBevOverlap:
    def test_identical_boxes(self):
        b = box(0, 0, 0, 4, 2, 1.5, 0.3)
        ov = iou3d.boxes_overlap_bev(jnp.asarray(b[None]), jnp.asarray(b[None]))
        assert np.allclose(ov, 8.0, atol=1e-4)

    def test_disjoint(self):
        a = box(0, 0, 0, 2, 2, 2, 0)
        b = box(10, 10, 0, 2, 2, 2, 1.0)
        ov = iou3d.boxes_overlap_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))
        assert np.allclose(ov, 0.0, atol=1e-6)

    def test_axis_aligned_partial(self):
        a = box(0, 0, 0, 2, 2, 2, 0)
        b = box(1, 1, 0, 2, 2, 2, 0)
        ov = iou3d.boxes_overlap_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))
        assert np.allclose(ov, 1.0, atol=1e-5)  # 1x1 overlap

    def test_rotated_45(self):
        # unit square vs same square rotated 45deg: intersection is a regular
        # octagon with area 8*(sqrt(2)-1) for unit square = 0.8284...
        a = box(0, 0, 0, 1, 1, 1, 0)
        b = box(0, 0, 0, 1, 1, 1, np.pi / 4)
        ov = float(iou3d.boxes_overlap_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
        assert abs(ov - (8 * (np.sqrt(2) - 1) / 4)) < 1e-4

    @pytest.mark.parametrize('seed', range(5))
    def test_random_vs_monte_carlo(self, seed):
        rng = np.random.RandomState(seed + 100)
        a = box(rng.uniform(-1, 1), rng.uniform(-1, 1), 0,
                rng.uniform(1, 4), rng.uniform(1, 4), 2, rng.uniform(-np.pi, np.pi))
        b = box(rng.uniform(-1, 1), rng.uniform(-1, 1), 0,
                rng.uniform(1, 4), rng.uniform(1, 4), 2, rng.uniform(-np.pi, np.pi))
        ours = float(iou3d.boxes_overlap_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
        mc = _mc_bev_overlap(a, b, seed=seed)
        assert abs(ours - mc) < 0.05 * max(mc, 1.0)

    def test_containment(self):
        a = box(0, 0, 0, 4, 4, 2, 0.7)
        b = box(0, 0, 0, 1, 1, 2, -0.3)
        ov = float(iou3d.boxes_overlap_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
        assert abs(ov - 1.0) < 1e-4


class TestIoU3D:
    def test_identical(self):
        b = jnp.asarray(box(1, 2, 3, 4, 2, 1.5, 0.3)[None])
        assert np.allclose(iou3d.boxes_iou3d(b, b), 1.0, atol=1e-4)

    def test_z_disjoint(self):
        a = box(0, 0, 0, 2, 2, 1, 0)
        b = box(0, 0, 5, 2, 2, 1, 0)
        assert np.allclose(
            iou3d.boxes_iou3d(jnp.asarray(a[None]), jnp.asarray(b[None])), 0.0)

    def test_half_z_overlap(self):
        a = box(0, 0, 0, 2, 2, 2, 0)
        b = box(0, 0, 1, 2, 2, 2, 0)
        # overlap vol = 2*2*1=4; union = 8+8-4=12
        got = float(iou3d.boxes_iou3d(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
        assert abs(got - 4 / 12) < 1e-5

    def test_matrix_shape(self):
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.uniform(-1, 1, (5, 7)).astype(np.float32) + 2)
        b = jnp.asarray(rng.uniform(-1, 1, (9, 7)).astype(np.float32) + 2)
        out = iou3d.boxes_iou3d(a, b)
        assert out.shape == (5, 9)
        assert bool(jnp.all((out >= -1e-6) & (out <= 1 + 1e-6)))


class TestNearestBevIoU:
    def test_no_rotation_matches_aabb(self):
        a = box(0, 0, 0, 2, 4, 2, 0)
        b = box(1, 0, 0, 2, 4, 2, 0)
        got = float(iou3d.boxes3d_nearest_bev_iou(
            jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
        # overlap = 1*4; union = 8+8-4
        assert abs(got - 4 / 12) < 1e-5

    def test_rot90_swaps_extent(self):
        a = box(0, 0, 0, 2, 4, 2, 0)
        b = box(0, 0, 0, 4, 2, 2, np.pi / 2)  # after snap same as a
        got = float(iou3d.boxes3d_nearest_bev_iou(
            jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
        assert abs(got - 1.0) < 1e-5


def test_chunked_matches_dense():
    rng = np.random.RandomState(3)
    a = jnp.asarray(np.concatenate([
        rng.uniform(-5, 5, (37, 2)), np.zeros((37, 1)),
        rng.uniform(1, 3, (37, 3)), rng.uniform(-3, 3, (37, 1))], axis=1).astype(np.float32))
    b = a[:21]
    dense = iou3d.boxes_iou_bev(a, b)
    chunked = iou3d.boxes_iou_bev_chunked(a, b, row_chunk=16)
    assert np.allclose(dense, chunked, atol=1e-5)
