"""Vector-pool aggregation (PV-RCNN++ local feature learning).

Parity surface: ``pcdet/ops/pointnet2/pointnet2_stack/pointnet2_modules.py``
VectorPoolAggregationModule (:247-420) + VectorPoolAggregationModuleMSG
(:423-470) over the ``vector_pool_gpu.cu`` kernels — each query point
spreads a dense lattice of G=gx·gy·gz sub-voxel centers over its ±R
neighborhood, gathers a feature per sub-voxel (3-NN inverse-distance
interpolation of the support points), applies a SEPARATE learned kernel per
sub-voxel position (the grouped 1×1 conv that gives "vector pool" its
direction sensitivity), and flattens + MLPs.

TPU deltas: supports are the fixed-capacity (B, N, ·) padded buffers; the
3-NN search runs as chunked dense distance blocks (lax.map over query
chunks bounds the (Q, N) matrix to ~128 MB); the interpolation carries the
sub-voxel center offset as its position encoding (the CUDA kernel also
returns the three neighbor offsets — 9 extra channels; here 3).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import pointnet2 as pn2


def _sub_voxel_offsets(r, num_voxels):
    """(G³, 3) lattice of sub-voxel centers spanning ±r (reference
    get_dense_voxels_by_center :340-360)."""
    grids = [np.arange(-r + r / n, r - r / n + 1e-5, 2 * r / n)
             for n in num_voxels]
    gx, gy, gz = np.meshgrid(*grids, indexing='ij')
    return np.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], axis=1)


def _chunked_three_interpolate(support_xyz, support_valid, support_feat,
                               queries, max_dist, chunk=4096):
    """3-NN IDW interpolation of support features at (Q, 3) queries,
    distance-limited to ``max_dist`` (empty → zeros).  Chunked to bound the
    (chunk, N) distance matrix."""
    q = queries.shape[0]
    pad = (-q) % chunk
    qp = jnp.concatenate([queries, jnp.zeros((pad, 3), queries.dtype)])

    def one_chunk(qc):
        dist, idx = pn2.three_nn(qc, jnp.ones(qc.shape[0], bool),
                                 support_xyz, support_valid)
        feat = pn2.three_interpolate(support_feat, idx, dist)
        ok = dist[:, 0] <= max_dist          # nearest neighbor in range
        return jnp.where(ok[:, None], feat, 0.0)

    out = jax.lax.map(one_chunk, qp.reshape(-1, chunk, 3))
    return out.reshape(-1, support_feat.shape[-1])[:q]


class VectorPoolAggregation(nn.Module):
    """One vector-pool group (reference VectorPoolAggregationModule)."""
    num_local_voxel: tuple = (3, 3, 3)
    max_neighbor_distance: float = 1.2
    neighbor_nsample: int = -1
    post_mlps: tuple = (64,)
    num_reduced_channels: int = 16
    num_channels_of_local_aggregation: int = 32

    @nn.compact
    def __call__(self, xyz, xyz_valid, new_xyz, new_xyz_valid, features,
                 training: bool = False):
        """xyz (B, N, 3); features (B, N, C); new_xyz (B, M, 3) →
        (B, M, post_mlps[-1])."""
        b, m = new_xyz.shape[:2]
        g = int(np.prod(self.num_local_voxel))
        c_in = features.shape[-1]
        c_red = min(self.num_reduced_channels, c_in)
        # channel reduction by grouped sum (reference channel_reduction idiom)
        if c_in > c_red:
            assert c_in % c_red == 0
            feats = features.reshape(*features.shape[:-1], c_red,
                                     c_in // c_red).sum(-1)
        else:
            feats = features

        offsets = jnp.asarray(_sub_voxel_offsets(
            float(self.max_neighbor_distance), self.num_local_voxel),
            jnp.float32)                               # (G, 3)
        centers = new_xyz[:, :, None, :] + offsets[None, None]  # (B, M, G, 3)

        interp = jax.vmap(partial(
            _chunked_three_interpolate,
            max_dist=2.0 * float(self.max_neighbor_distance)))(
            xyz, xyz_valid, feats, centers.reshape(b, m * g, 3))
        interp = interp.reshape(b, m, g, feats.shape[-1])
        x = jnp.concatenate(
            [jnp.broadcast_to(offsets[None, None], (b, m, g, 3)), interp],
            axis=-1)                                   # (B, M, G, 3+C)

        # separate learned kernel per sub-voxel position (grouped 1x1 conv)
        w = self.param('local_kernel', nn.initializers.kaiming_normal(),
                       (g, 3 + feats.shape[-1],
                        self.num_channels_of_local_aggregation))
        x = jnp.einsum('bmgc,gco->bmgo', x, w)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3)(x)
        x = nn.relu(x)
        x = x.reshape(b, m, g * self.num_channels_of_local_aggregation)
        for ch in self.post_mlps:
            x = nn.Dense(ch, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not training,
                             momentum=0.99, epsilon=1e-3)(x)
            x = nn.relu(x)
        x = jnp.where(new_xyz_valid[..., None], x, 0.0)
        return x


class VectorPoolAggregationMSG(nn.Module):
    """Multi-group vector pool + xyz concat + post MLPs (reference
    VectorPoolAggregationModuleMSG).  ``config`` carries NUM_GROUPS,
    GROUP_CFG_k dicts, and MSG_POST_MLPS."""
    config: Any

    @nn.compact
    def __call__(self, xyz, xyz_valid, new_xyz, new_xyz_valid, features,
                 training: bool = False):
        from ...config import to_cfg
        cfg = to_cfg(self.config)
        outs = []
        for k in range(int(cfg.NUM_GROUPS)):
            gc = cfg[f'GROUP_CFG_{k}']
            mod = VectorPoolAggregation(
                num_local_voxel=tuple(gc.NUM_LOCAL_VOXEL),
                max_neighbor_distance=float(gc.MAX_NEIGHBOR_DISTANCE),
                neighbor_nsample=int(gc.get('NEIGHBOR_NSAMPLE', -1)),
                post_mlps=tuple(gc.POST_MLPS),
                num_reduced_channels=int(cfg.get('NUM_REDUCED_CHANNELS',
                                                 features.shape[-1])),
                num_channels_of_local_aggregation=int(
                    cfg.NUM_CHANNELS_OF_LOCAL_AGGREGATION),
                name=f'group_{k}')
            outs.append(mod(xyz, xyz_valid, new_xyz, new_xyz_valid,
                            features, training))
        x = jnp.concatenate([new_xyz] + outs, axis=-1)   # use_xyz
        for ch in cfg.MSG_POST_MLPS:
            x = nn.Dense(ch, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not training,
                             momentum=0.99, epsilon=1e-3)(x)
            x = nn.relu(x)
        return jnp.where(new_xyz_valid[..., None], x, 0.0)
