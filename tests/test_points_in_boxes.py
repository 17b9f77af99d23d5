import numpy as np
import jax.numpy as jnp

from crb_active_3ddet_tpu.ops import points_in_boxes as pib


def test_simple_membership():
    points = np.array([
        [0, 0, 0], [0.9, 0, 0], [1.1, 0, 0], [0, 0, 0.6], [5, 5, 5],
    ], np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 1, 0]], np.float32)
    m = np.asarray(pib.points_in_boxes(jnp.asarray(points), jnp.asarray(boxes)))
    assert m[:, 0].tolist() == [True, True, False, False, False]


def test_rotated_box():
    # box rotated 90deg: dx=4 along y now
    boxes = np.array([[0, 0, 0, 4, 1, 2, np.pi / 2]], np.float32)
    points = np.array([[0, 1.9, 0], [1.9, 0, 0], [0.4, 0, 0]], np.float32)
    m = np.asarray(pib.points_in_boxes(jnp.asarray(points), jnp.asarray(boxes)))
    assert m[:, 0].tolist() == [True, False, True]


def test_jax_matches_numpy():
    rng = np.random.RandomState(0)
    points = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    boxes = np.concatenate([
        rng.uniform(-3, 3, (7, 3)), rng.uniform(1, 4, (7, 3)),
        rng.uniform(-np.pi, np.pi, (7, 1))], axis=1).astype(np.float32)
    m_jax = np.asarray(pib.points_in_boxes(jnp.asarray(points), jnp.asarray(boxes)))
    m_np = pib.points_in_boxes_numpy(points, boxes)
    assert (m_jax == m_np).all()


def test_density_and_stats():
    points = np.zeros((10, 3), np.float32)  # all at origin
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0], [50, 0, 0, 1, 1, 1, 0]], np.float32)
    pv = jnp.ones(10, bool)
    bv = jnp.asarray([True, True])
    dens = np.asarray(pib.box_point_density(
        jnp.asarray(points), jnp.asarray(boxes), pv, bv))
    assert abs(dens[0] - 10 / 8.0) < 1e-5 and dens[1] == 0.0
    stats = pib.box_point_stats(jnp.asarray(points), jnp.asarray(boxes), pv, bv)
    assert abs(float(stats['mean']) - 5.0) < 1e-5
    assert abs(float(stats['var']) - 25.0) < 1e-5


def test_validity_masks():
    points = np.zeros((4, 3), np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32)
    pv = jnp.asarray([True, True, False, False])
    counts = np.asarray(pib.points_count_per_box(
        jnp.asarray(points), jnp.asarray(boxes), pv, jnp.asarray([True])))
    assert counts[0] == 2


def test_first_box_index():
    points = np.array([[0, 0, 0], [3, 0, 0], [10, 10, 10]], np.float32)
    boxes = np.array([
        [0, 0, 0, 2, 2, 2, 0],
        [3, 0, 0, 2, 2, 2, 0],
    ], np.float32)
    idx = np.asarray(pib.points_in_boxes_index(jnp.asarray(points), jnp.asarray(boxes)))
    assert idx.tolist() == [0, 1, -1]
