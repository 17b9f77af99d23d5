"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference op."""

import numpy as np
import jax.numpy as jnp

from crb_active_3ddet_tpu.ops.pallas_kernels import sparse_conv_gather_gemm
from crb_active_3ddet_tpu.ops.sparse.sparse_ops import subm_conv3d_gather


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
