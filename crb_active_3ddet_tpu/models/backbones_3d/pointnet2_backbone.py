"""PointNet++ MSG backbone (PointRCNN's point-feature extractor).

Parity: ``pcdet/models/backbones_3d/pointnet2_backbone.py`` (PointNet2MSG
:9-96) over the pointnet2_batch CUDA ops — FPS downsampling SA stages with
multi-scale ball-query grouping, then feature-propagation (3-NN inverse
distance interpolation) back up to every input point.

TPU-first: all stages run on fixed-capacity (B, N, ·) buffers with validity
masks; FPS/ball-query/3-NN are the vmapped fixed-shape ops in
``ops/pointnet2.py``; every MLP is a Dense over the trailing axis so the
whole backbone is one jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pointnet2 as pn2
from .pfe import StackSAModuleMSG


class PointNet2MSG(nn.Module):
    model_cfg: Any
    input_channels: int        # total point feature channels incl. xyz

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        from ...config import to_cfg
        cfg = to_cfg(self.model_cfg)
        sa_cfg = cfg.SA_CONFIG
        points = batch_dict['points']                   # (B, N, 3+C)
        valid = batch_dict['points_valid']
        xyz = points[..., 0:3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        l_xyz, l_feats, l_valid = [xyz], [feats], [valid]
        npoints = list(sa_cfg.NPOINTS)
        for k in range(len(npoints)):
            fps_idx = jax.vmap(partial(pn2.farthest_point_sample,
                                       num_samples=int(npoints[k])))(
                l_xyz[k], l_valid[k])
            new_xyz = jnp.take_along_axis(l_xyz[k], fps_idx[..., None],
                                          axis=1)
            new_valid = jnp.take_along_axis(l_valid[k], fps_idx, axis=1)
            sa = StackSAModuleMSG(
                radii=tuple(sa_cfg.RADIUS[k]),
                nsamples=tuple(sa_cfg.NSAMPLE[k]),
                mlps=tuple(tuple(m) for m in sa_cfg.MLPS[k]),
                name=f'sa_{k}')
            new_feats = sa(l_xyz[k], l_valid[k], new_xyz, new_valid,
                           l_feats[k], training)
            l_xyz.append(new_xyz)
            l_feats.append(new_feats)
            l_valid.append(new_valid)

        # feature propagation back to the full point set
        fp_mlps = list(cfg.FP_MLPS)
        for i in range(len(fp_mlps) - 1, -1, -1):
            dist, idx = jax.vmap(pn2.three_nn)(
                l_xyz[i], l_valid[i], l_xyz[i + 1], l_valid[i + 1])
            interp = jax.vmap(pn2.three_interpolate)(l_feats[i + 1], idx,
                                                     dist)
            skip = l_feats[i]
            x = interp if skip is None else jnp.concatenate([skip, interp],
                                                            axis=-1)
            for ch in fp_mlps[i]:
                x = nn.Dense(ch, use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.99, epsilon=1e-3)(x)
                x = nn.relu(x)
            x = jnp.where(l_valid[i][..., None], x, 0.0)
            l_feats[i] = x

        batch_dict['point_features'] = l_feats[0]       # (B, N, C0)
        batch_dict['point_coords'] = l_xyz[0]           # (B, N, 3)
        batch_dict['point_valid'] = valid
        batch_dict['point_coords_valid'] = valid
        return batch_dict
