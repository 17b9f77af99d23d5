import numpy as np
import jax.numpy as jnp

from crb_active_3ddet_tpu.ops import voxelize as vx


PCR = (0.0, -4.0, -2.0, 8.0, 4.0, 2.0)
VS = (0.5, 0.5, 1.0)
GRID = vx.grid_size_from_range(PCR, VS)  # (16, 16, 4)


def test_grid_size():
    assert GRID == (16, 16, 4)


def _voxelize(points, max_voxels=64, max_ppv=4):
    n = points.shape[0]
    return vx.voxelize(
        jnp.asarray(points), jnp.ones(n, bool),
        jnp.asarray(PCR), jnp.asarray(VS), GRID, max_voxels, max_ppv)


def test_single_voxel_mean():
    pts = np.array([
        [0.1, 0.1, 0.1, 1.0],
        [0.2, 0.2, 0.2, 2.0],
        [0.3, 0.3, 0.3, 3.0],
    ], np.float32)
    out = _voxelize(pts)
    assert int(out['num_voxels']) == 1
    assert int(out['voxel_num_points'][0]) == 3
    # coords (z, y, x): z = floor((0.1+2)/1)=2, y = floor((0.1+4)/0.5)=8, x=0
    assert np.asarray(out['voxel_coords'][0]).tolist() == [2, 8, 0]
    assert np.allclose(np.asarray(out['voxels'][0, :3]), pts)


def test_matches_numpy_as_sets():
    rng = np.random.RandomState(0)
    pts = np.concatenate([
        rng.uniform(0, 8, (500, 1)), rng.uniform(-4, 4, (500, 1)),
        rng.uniform(-2, 2, (500, 1)), rng.uniform(0, 1, (500, 1)),
    ], axis=1).astype(np.float32)
    out = _voxelize(pts, max_voxels=1024, max_ppv=8)
    ref = vx.voxelize_numpy(pts, PCR, VS, GRID, 1024, 8)
    assert int(out['num_voxels']) == ref['num_voxels']
    got = {tuple(c) for c in np.asarray(out['voxel_coords'])[np.asarray(out['voxel_valid'])]}
    want = {tuple(c) for c in ref['voxel_coords'][:ref['num_voxels']]}
    assert got == want
    # per-voxel point counts match
    got_counts = {tuple(c): int(n) for c, n in zip(
        np.asarray(out['voxel_coords']), np.asarray(out['voxel_num_points']))
        if tuple(c) != (-1, -1, -1)}
    want_counts = {tuple(c): int(n) for c, n in zip(
        ref['voxel_coords'][:ref['num_voxels']], ref['voxel_num_points'])}
    assert got_counts == want_counts


def test_out_of_range_dropped():
    pts = np.array([
        [100.0, 0, 0, 0], [-5.0, 0, 0, 0], [4.0, 0, 0, 1.0],
    ], np.float32)
    out = _voxelize(pts)
    assert int(out['num_voxels']) == 1


def test_point_cap():
    pts = np.tile(np.array([[1.1, 1.1, 0.5, 1.0]], np.float32), (10, 1))
    out = _voxelize(pts, max_ppv=4)
    assert int(out['voxel_num_points'][0]) == 4


def test_voxel_cap():
    # 20 distinct voxels along x, cap at 8
    pts = np.stack([
        np.linspace(0.25, 7.75, 16), np.zeros(16), np.zeros(16), np.ones(16),
    ], axis=1).astype(np.float32)
    out = _voxelize(pts, max_voxels=8, max_ppv=4)
    assert int(out['num_voxels']) == 8


def test_invalid_points_ignored():
    pts = np.array([[1, 0, 0, 1], [1, 0, 0, 1]], np.float32)
    out = vx.voxelize(
        jnp.asarray(pts), jnp.asarray([True, False]),
        jnp.asarray(PCR), jnp.asarray(VS), GRID, 8, 4)
    assert int(out['voxel_num_points'][0]) == 1
