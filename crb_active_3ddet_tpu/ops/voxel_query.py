"""Voxel query: non-empty-voxel neighborhood lookup for VoxelRCNN.

Parity surface: ``pcdet/ops/pointnet2/pointnet2_stack/src/voxel_query_gpu.cu``
(:10-60) — for each query cell, scan a ±range window of the dense
voxel-to-index table, keep up to ``nsample`` non-empty voxels whose centers
fall within ``radius`` of the query point.

TPU delta: the CUDA kernel probes every cell of the (2r+1)³ window (729
probes for range 4) with early exit; scalar table gathers cost ~13-40 ns
each through XLA, so probing 27k grid points × 729 cells × 3 scales is
seconds.  Here the window is probed on a subsampled lattice of at most
``probes_per_dim``³ cells spanning the same ±range (range ≤ 1 keeps the
exact window).  Found voxels still pass the exact radius test; with
max/avg pooling over ≤nsample neighbors downstream, the coarser probe
lattice trades a denser sample of the neighborhood for a ~30× cheaper
lookup.  Compaction uses the one-hot-einsum trick (see ops/pointnet2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import rulebook as rb


def _probe_offsets(query_range, probes_per_dim):
    offs = []
    for r in query_range:
        r = int(r)
        n = min(2 * r + 1, probes_per_dim)
        offs.append(np.unique(np.round(np.linspace(-r, r, n)).astype(np.int64)))
    oz, oy, ox = np.meshgrid(offs[0], offs[1], offs[2], indexing='ij')
    return np.stack([oz.reshape(-1), oy.reshape(-1), ox.reshape(-1)], axis=1)


@partial(jax.jit, static_argnames=('grid', 'query_range', 'nsample',
                                  'probes_per_dim'))
def voxel_query(query_cells, query_xyz, coords, valid, voxel_xyz, grid,
                query_range=(4, 4, 4), radius=0.4, nsample=16,
                probes_per_dim=3):
    """query_cells (M, 3) int32 z,y,x; query_xyz (M, 3) metric; coords
    (V, 3) active voxel cells with ``valid``; voxel_xyz (V, 3) their metric
    centers.  Returns (idx (M, nsample) int32, cnt (M,)) — indices into the
    voxel array, empty slots repeat the first hit (−1-free; mask by cnt)."""
    offsets = jnp.asarray(_probe_offsets(query_range, probes_per_dim))
    nz, ny, nx = grid
    cells = nz * ny * nx
    table = rb.build_dense_table(coords, valid, grid)

    probe = query_cells[:, None, :] + offsets[None, :, :]       # (M, P, 3)
    in_bounds = ((probe >= 0).all(-1) & (probe[..., 0] < nz)
                 & (probe[..., 1] < ny) & (probe[..., 2] < nx))
    h = probe[..., 0] * (ny * nx) + probe[..., 1] * nx + probe[..., 2]
    h = jnp.where(in_bounds, h, cells)
    cand = jnp.where(in_bounds, table[h], -1)                   # (M, P)

    cand_xyz = voxel_xyz[jnp.clip(cand, 0)]                     # (M, P, 3)
    d2 = jnp.sum((cand_xyz - query_xyz[:, None, :]) ** 2, axis=-1)
    hit = (cand >= 0) & (d2 < radius * radius)

    p = offsets.shape[0]
    ranks = jnp.cumsum(hit.astype(jnp.int32), axis=1)
    first = hit & (ranks <= nsample)
    slot = jnp.where(first, ranks - 1, nsample)
    onehot = jax.nn.one_hot(slot, nsample + 1,
                            dtype=jnp.float32)[..., :nsample]   # (M, P, S)
    idx = jnp.round(jnp.einsum('mps,mp->ms', onehot,
                               cand.astype(jnp.float32))).astype(jnp.int32)
    cnt = jnp.minimum(ranks[:, -1], nsample).astype(jnp.int32)
    slot_valid = jnp.arange(nsample)[None, :] < cnt[:, None]
    idx = jnp.where(slot_valid, jnp.clip(idx, 0), idx[:, 0:1])
    return idx, cnt
