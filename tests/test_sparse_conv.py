"""Sparse conv rulebook + backbone tests (oracle: dense 3D convolution)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
from crb_active_3ddet_tpu.ops.sparse.sparse_ops import (
    subm_conv3d_gather, sparse_tensor_to_dense)

GRID = (8, 8, 8)


def _rand_sparse(rng, n_active, cap, c=4):
    """Random sparse tensor with n_active unique sites padded to cap."""
    all_sites = np.stack(np.unravel_index(
        rng.choice(np.prod(GRID), n_active, replace=False), GRID), axis=1)
    coords = np.full((cap, 3), -1, np.int32)
    coords[:n_active] = all_sites
    valid = np.zeros(cap, bool)
    valid[:n_active] = True
    feats = np.zeros((cap, c), np.float32)
    feats[:n_active] = rng.randn(n_active, c)
    return (jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid))


def _dense_of(feats, coords, valid):
    return np.asarray(sparse_tensor_to_dense(feats, coords, valid, GRID))


class TestRulebook:
    def test_hash_lookup_roundtrip(self):
        rng = np.random.RandomState(0)
        feats, coords, valid = _rand_sparse(rng, 20, 32)
        sh, perm = rb.build_hash_table(coords, valid, GRID)
        q = rb.hash_coords(coords, valid, GRID)
        idx = rb.lookup(sh, perm, q)
        # every valid voxel finds itself
        assert (np.asarray(idx)[:20] == np.arange(20)).all()
        assert (np.asarray(idx)[20:] == -1).all()

    def test_subm_rulebook_center_is_self(self):
        rng = np.random.RandomState(1)
        feats, coords, valid = _rand_sparse(rng, 20, 32)
        rbk = rb.lookup_neighbors(coords, valid, coords, valid, GRID)
        center = np.asarray(rbk)[:, 13]  # (3,3,3) center offset
        assert (center[:20] == np.arange(20)).all()


class TestSubmConvVsDense:
    def test_matches_dense_conv(self):
        """Submanifold conv on active sites == dense conv masked to active."""
        rng = np.random.RandomState(2)
        c_in, c_out = 4, 8
        feats, coords, valid = _rand_sparse(rng, 30, 48, c_in)
        w = jnp.asarray(rng.randn(27, c_in, c_out).astype(np.float32) * 0.1)

        rbk = rb.lookup_neighbors(coords, valid, coords, valid, GRID)
        out = subm_conv3d_gather(feats, rbk, w, valid)

        # dense oracle
        dense_in = _dense_of(feats, coords, valid)  # (8, 8, 8, C)
        w_dense = np.asarray(w).reshape(3, 3, 3, c_in, c_out)
        out_dense = jax.lax.conv_general_dilated(
            jnp.asarray(dense_in)[None], jnp.asarray(w_dense),
            window_strides=(1, 1, 1), padding=((1, 1), (1, 1), (1, 1)),
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))[0]
        got_dense = _dense_of(out, coords, valid)
        active = _dense_of(jnp.ones_like(feats[:, :1]), coords, valid)[..., 0] > 0
        # subm conv only outputs at active sites
        assert np.allclose(got_dense[active], np.asarray(out_dense)[active],
                           atol=1e-4)
        assert np.allclose(got_dense[~active], 0.0)


class TestStridedDownsample:
    def test_output_sites(self):
        coords = jnp.asarray([[0, 0, 0], [4, 4, 4], [-1, -1, -1]], jnp.int32)
        valid = jnp.asarray([True, True, False])
        out_c, out_v = rb.downsample_coords(
            coords, valid, GRID, (3, 3, 3), (2, 2, 2), (1, 1, 1), max_out=16)
        got = {tuple(c) for c in np.asarray(out_c)[np.asarray(out_v)]}
        # input (0,0,0): o = floor((0+1-k)/2) exact for k=1 → 0.
        # input (4,4,4): k=1 → 2 per dim. Neighboring o from k∈{...}: (i+1-k)%2==0
        # → k=1 only (i odd+1=5... wait i=4: i+1=5, k∈{1}: (5-1)/2=2; k∈{3}? k<3.
        # so single site each.
        assert got == {(0, 0, 0), (2, 2, 2)}

    def test_strided_conv_matches_dense(self):
        rng = np.random.RandomState(3)
        c_in, c_out = 4, 6
        feats, coords, valid = _rand_sparse(rng, 25, 40, c_in)
        w = jnp.asarray(rng.randn(27, c_in, c_out).astype(np.float32) * 0.1)
        out_c, out_v = rb.downsample_coords(
            coords, valid, GRID, (3, 3, 3), (2, 2, 2), (1, 1, 1), max_out=40)
        rbk = rb.lookup_neighbors(out_c, out_v, coords, valid, GRID,
                                  kernel_size=(3, 3, 3), stride=(2, 2, 2),
                                  padding=(1, 1, 1))
        out = subm_conv3d_gather(feats, rbk, w, out_v)

        dense_in = _dense_of(feats, coords, valid)
        w_dense = np.asarray(w).reshape(3, 3, 3, c_in, c_out)
        out_dense = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(dense_in)[None], jnp.asarray(w_dense),
            window_strides=(2, 2, 2), padding=((1, 1), (1, 1), (1, 1)),
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))[0])
        out_grid = rb.conv_out_grid(GRID, (3, 3, 3), (2, 2, 2), (1, 1, 1))
        got_dense = np.asarray(sparse_tensor_to_dense(out, out_c, out_v, out_grid))
        active = np.asarray(sparse_tensor_to_dense(
            jnp.ones_like(out[:, :1]), out_c, out_v, out_grid))[..., 0] != 0
        assert active.sum() > 0
        assert np.allclose(got_dense[active], out_dense[active], atol=1e-4)


def test_backbone_shapes():
    """VoxelBackBone8x end-to-end on a tiny grid."""
    from crb_active_3ddet_tpu.models.backbones_3d.spconv_backbone import (
        VoxelBackBone8x)
    rng = np.random.RandomState(4)
    grid_size = (32, 32, 40)  # nx, ny, nz
    b, v, c = 2, 128, 4
    coords = np.stack([rng.randint(0, 40, (b, v)), rng.randint(0, 32, (b, v)),
                       rng.randint(0, 32, (b, v))], axis=-1).astype(np.int32)
    batch = {
        'voxel_features': jnp.asarray(rng.randn(b, v, c).astype(np.float32)),
        'voxel_coords': jnp.asarray(coords),
        'voxel_valid': jnp.ones((b, v), bool),
    }
    model = VoxelBackBone8x(model_cfg={}, input_channels=c,
                            grid_size=grid_size)
    variables = model.init(jax.random.PRNGKey(0), dict(batch), training=False)
    out = model.apply(variables, dict(batch), training=False)
    # z: 41→21→11→5→2 ; y/x: 32→16→8→4 (conv_out keeps H, W)
    assert out['encoded_spconv_features'].shape == (2, 2, 4, 4, 128)
    assert out['encoded_spconv_tensor_stride'] == 8
    assert np.isfinite(np.asarray(out['encoded_spconv_features'])).all()
    ms = out['multi_scale_3d_features']
    assert ms['x_conv1']['features'].shape[-1] == 16
    assert ms['x_conv4']['features'].shape[-1] == 64


def test_subm_rulebook_halved_matches_full_lookup():
    """Halved-query subm rulebook == the 27-query lookup_neighbors oracle."""
    from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
    rng = np.random.RandomState(7)
    grid = (8, 12, 10)
    v = 64
    # unique coords with some invalid tail
    cells = rng.choice(8 * 12 * 10, size=v, replace=False)
    coords = np.stack([cells // 120, (cells % 120) // 10, cells % 10],
                      axis=-1).astype(np.int32)
    valid = np.arange(v) < 50
    full = np.asarray(rb.lookup_neighbors(
        jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(coords),
        jnp.asarray(valid), grid=grid))
    halved = np.asarray(rb.subm_rulebook_halved(
        jnp.asarray(coords), jnp.asarray(valid), grid=grid))
    # oracle marks invalid-out rows via out_valid; halved leaves -1 there
    assert np.array_equal(halved[valid], full[valid])
    assert (halved[~valid] == -1).all()


def test_downsample_rulebook_matches_lookup():
    """Fused downsample+rulebook == downsample_coords + lookup_neighbors."""
    from functools import partial
    from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
    rng = np.random.RandomState(8)
    grid = (9, 16, 14)
    v = 80
    cells = rng.choice(9 * 16 * 14, size=v, replace=False)
    coords = np.stack([cells // (16 * 14), (cells % (16 * 14)) // 14,
                       cells % 14], axis=-1).astype(np.int32)
    valid = np.arange(v) < 70
    for ks, st, pd in [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
                       ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
                       ((3, 1, 1), (2, 1, 1), (0, 0, 0))]:
        oc, ov, rbk = rb.downsample_rulebook(
            jnp.asarray(coords), jnp.asarray(valid), grid=grid,
            kernel_size=ks, stride=st, padding=pd, max_out=v)
        oc_ref, ov_ref = rb.downsample_coords(
            jnp.asarray(coords), jnp.asarray(valid), grid=grid,
            kernel_size=ks, stride=st, padding=pd, max_out=v)
        assert np.array_equal(np.asarray(ov), np.asarray(ov_ref))
        assert np.array_equal(np.asarray(oc), np.asarray(oc_ref))
        rbk_ref = rb.lookup_neighbors(
            oc_ref, ov_ref, jnp.asarray(coords), jnp.asarray(valid),
            grid=grid, kernel_size=ks, stride=st, padding=pd)
        ovn = np.asarray(ov)
        assert np.array_equal(np.asarray(rbk)[ovn], np.asarray(rbk_ref)[ovn])


def test_downsample_rulebook_dense_matches_sort():
    """Dense-table downsample (no sort) == the sort-derived fused version,
    including the max_out truncation and a shared prebuilt table."""
    from functools import partial
    from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
    rng = np.random.RandomState(9)
    grid = (9, 16, 14)
    v = 80
    cells = rng.choice(9 * 16 * 14, size=v, replace=False)
    coords = np.stack([cells // (16 * 14), (cells % (16 * 14)) // 14,
                       cells % 14], axis=-1).astype(np.int32)
    valid = np.arange(v) < 70
    table = rb.build_dense_table(jnp.asarray(coords), jnp.asarray(valid),
                                 grid)
    for ks, st, pd in [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
                       ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
                       ((3, 1, 1), (2, 1, 1), (0, 0, 0))]:
        for max_out in (v, 24):
            oc, ov, rbk = rb.downsample_rulebook(
                jnp.asarray(coords), jnp.asarray(valid), grid=grid,
                kernel_size=ks, stride=st, padding=pd, max_out=max_out)
            for tbl in (None, table):
                oc_d, ov_d, rbk_d = rb.downsample_rulebook_dense(
                    jnp.asarray(coords), jnp.asarray(valid), grid=grid,
                    kernel_size=ks, stride=st, padding=pd, max_out=max_out,
                    table=tbl)
                assert np.array_equal(np.asarray(ov), np.asarray(ov_d))
                assert np.array_equal(np.asarray(oc), np.asarray(oc_d))
                ovn = np.asarray(ov)
                assert np.array_equal(np.asarray(rbk)[ovn],
                                      np.asarray(rbk_d)[ovn])


def test_subm_rulebook_batch_matches_lookup():
    """Batch-flat 128-lane-row table rulebook == per-sample lookup_neighbors
    (incl. invalid rows, boundary cells, both kernel shapes)."""
    from functools import partial
    from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
    rng = np.random.RandomState(11)
    grid = (9, 16, 14)
    b, v = 3, 64
    coords = np.zeros((b, v, 3), np.int32)
    for i in range(b):
        cells = rng.choice(9 * 16 * 14, size=v, replace=False)
        coords[i] = np.stack([cells // (16 * 14), (cells % (16 * 14)) // 14,
                              cells % 14], -1)
    valid = np.arange(v)[None, :] < np.array([64, 50, 1])[:, None]
    for ks in ((3, 3, 3), (3, 1, 1)):
        got = np.asarray(rb.subm_rulebook_batch(
            jnp.asarray(coords), jnp.asarray(valid), grid, kernel_size=ks))
        ref = np.asarray(jax.vmap(partial(
            rb.lookup_neighbors, grid=grid, kernel_size=ks, stride=(1, 1, 1),
            padding=tuple((k - 1) // 2 for k in ks)))(
            jnp.asarray(coords), jnp.asarray(valid),
            jnp.asarray(coords), jnp.asarray(valid)))
        assert np.array_equal(got, ref), ks


def test_strided_rulebook_batch_matches_lookup():
    from functools import partial
    from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
    rng = np.random.RandomState(13)
    grid = (9, 16, 14)
    b, v, mo = 2, 60, 40
    coords = np.zeros((b, v, 3), np.int32)
    for i in range(b):
        cells = rng.choice(9 * 16 * 14, size=v, replace=False)
        coords[i] = np.stack([cells // (16 * 14), (cells % (16 * 14)) // 14,
                              cells % 14], -1)
    valid = np.ones((b, v), bool)
    ks, st, pd = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    oc, ov, _ = jax.vmap(partial(
        rb.downsample_rulebook, grid=grid, kernel_size=ks, stride=st,
        padding=pd, max_out=mo))(jnp.asarray(coords), jnp.asarray(valid))
    table2d = rb.build_dense_table_batch(jnp.asarray(coords),
                                         jnp.asarray(valid), grid)
    got = np.asarray(rb.strided_rulebook_batch(oc, ov, grid, ks, st, pd,
                                               table2d))
    ref = np.asarray(jax.vmap(partial(
        rb.lookup_neighbors, grid=grid, kernel_size=ks, stride=st,
        padding=pd))(oc, ov, jnp.asarray(coords), jnp.asarray(valid)))
    ovn = np.asarray(ov)
    assert np.array_equal(got[ovn], ref[ovn])


def test_subm_rulebook_sortjoin_matches_batch():
    """Sort-join subm rulebook == dense-table rulebook on cell-SORTED
    unique coords (the voxelizer/downsample output contract), including
    boundary cells, an all-invalid tail, and a nearly-empty sample."""
    from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
    rng = np.random.RandomState(7)
    grid = (9, 16, 14)
    b, v = 3, 64
    coords = np.full((b, v, 3), -1, np.int32)
    n_valid = [64, 50, 1]
    for i in range(b):
        cells = np.sort(rng.choice(9 * 16 * 14, size=n_valid[i],
                                   replace=False))
        coords[i, :n_valid[i]] = np.stack(
            [cells // (16 * 14), (cells % (16 * 14)) // 14, cells % 14], -1)
    valid = np.arange(v)[None, :] < np.asarray(n_valid)[:, None]
    got = np.asarray(rb.subm_rulebook_sortjoin(
        jnp.asarray(coords), jnp.asarray(valid), grid))
    ref = np.asarray(rb.subm_rulebook_batch(
        jnp.asarray(coords), jnp.asarray(valid), grid))
    assert np.array_equal(got, ref)


def test_subm_rulebook_sortjoin_dense_cluster():
    """Sort-join on a fully dense 3x3x3 cluster: every in-bounds neighbor
    must be found (stresses the dx+-1 prev/next-cell arithmetic)."""
    from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
    grid = (6, 6, 6)
    zz, yy, xx = np.meshgrid(np.arange(1, 4), np.arange(1, 4),
                             np.arange(1, 4), indexing='ij')
    coords = np.stack([zz.ravel(), yy.ravel(), xx.ravel()], -1)
    cells = (coords[:, 0] * 6 + coords[:, 1]) * 6 + coords[:, 2]
    coords = coords[np.argsort(cells)].astype(np.int32)[None]
    valid = np.ones((1, 27), bool)
    got = np.asarray(rb.subm_rulebook_sortjoin(
        jnp.asarray(coords), jnp.asarray(valid), grid))[0]
    ref = np.asarray(rb.subm_rulebook_batch(
        jnp.asarray(coords), jnp.asarray(valid), grid))[0]
    assert np.array_equal(got, ref)
    # the center voxel sees all 27 neighbors
    center = np.where((coords[0] == 2).all(-1))[0][0]
    assert (got[center] >= 0).all()


def test_subm_rulebook_window_matches_batch():
    """Windowed packed rulebook, unpacked to tap columns, == dense-table
    rulebook on the same cell-sorted cases as the sort-join test."""
    from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
    rng = np.random.RandomState(7)
    grid = (9, 16, 14)
    b, v = 3, 64
    coords = np.full((b, v, 3), -1, np.int32)
    n_valid = [64, 50, 1]
    for i in range(b):
        cells = np.sort(rng.choice(9 * 16 * 14, size=n_valid[i],
                                   replace=False))
        coords[i, :n_valid[i]] = np.stack(
            [cells // (16 * 14), (cells % (16 * 14)) // 14, cells % 14], -1)
    valid = np.arange(v)[None, :] < np.asarray(n_valid)[:, None]
    packed = rb.subm_rulebook_window(jnp.asarray(coords), jnp.asarray(valid),
                                     grid)
    got = np.asarray(rb.unpack_window_rulebook(packed))
    ref = np.asarray(rb.subm_rulebook_batch(
        jnp.asarray(coords), jnp.asarray(valid), grid))
    assert np.array_equal(got, ref)


def test_subm_rulebook_window_dense_cluster():
    """Windowed rulebook on a fully dense 3x3x3 cluster (stresses every
    chunk-select code path incl. chunk0/chunk2 adjacency)."""
    from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
    grid = (6, 6, 6)
    zz, yy, xx = np.meshgrid(np.arange(1, 4), np.arange(1, 4),
                             np.arange(1, 4), indexing='ij')
    coords = np.stack([zz.ravel(), yy.ravel(), xx.ravel()], -1)
    cells = (coords[:, 0] * 6 + coords[:, 1]) * 6 + coords[:, 2]
    coords = coords[np.argsort(cells)].astype(np.int32)[None]
    valid = np.ones((1, 27), bool)
    packed = rb.subm_rulebook_window(jnp.asarray(coords), jnp.asarray(valid),
                                     grid)
    got = np.asarray(rb.unpack_window_rulebook(packed))[0]
    ref = np.asarray(rb.subm_rulebook_batch(
        jnp.asarray(coords), jnp.asarray(valid), grid))[0]
    assert np.array_equal(got, ref)


def test_sparse_conv_window_path_matches_column_path():
    """SparseConvLayer output with the 9-wide packed windowed rulebook ==
    output with the 27-column rulebook (same params, same coords/feats)."""
    from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
    from crb_active_3ddet_tpu.models.backbones_3d.spconv_backbone import (
        SparseConvLayer)
    rng = np.random.RandomState(3)
    grid = (8, 12, 10)
    b, v, cin = 2, 48, 5
    coords = np.full((b, v, 3), -1, np.int32)
    n_valid = [48, 30]
    for i in range(b):
        cells = np.sort(rng.choice(8 * 12 * 10, size=n_valid[i],
                                   replace=False))
        coords[i, :n_valid[i]] = np.stack(
            [cells // (12 * 10), (cells % (12 * 10)) // 10, cells % 10], -1)
    valid = np.arange(v)[None, :] < np.asarray(n_valid)[:, None]
    feats = rng.randn(b, v, cin).astype(np.float32) * valid[..., None]
    st = {'features': jnp.asarray(feats), 'coords': jnp.asarray(coords),
          'valid': jnp.asarray(valid), 'grid': grid}
    layer = SparseConvLayer(out_channels=7, grid=grid, subm=True)
    rbk_cols = rb.subm_rulebook_sortjoin(st['coords'], st['valid'], grid)
    rbk_win = rb.subm_rulebook_window(st['coords'], st['valid'], grid)
    params = layer.init(jax.random.PRNGKey(0), st, True, rulebook=rbk_cols)
    out_cols, _ = layer.apply(params, st, True, rulebook=rbk_cols,
                              mutable=['batch_stats'])
    out_win, _ = layer.apply(params, st, True, rulebook=rbk_win,
                             mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(out_cols['features']),
                               np.asarray(out_win['features']),
                               rtol=1e-5, atol=1e-5)
