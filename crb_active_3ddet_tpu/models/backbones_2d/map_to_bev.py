"""Sparse→dense BEV projection modules (Flax).

Parity: ``pcdet/models/backbones_2d/map_to_bev/`` (pointpillar_scatter.py:5-38,
height_compression.py:4-26).  TPU-first: the reference's per-sample Python
loop + index assignment becomes one batched scatter into an NHWC canvas
(TPU conv layout), with invalid pillars dropped via out-of-range indices.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class PointPillarScatter(nn.Module):
    """Scatter pillar features into a dense (B, ny, nx, C) BEV image."""
    model_cfg: dict
    grid_size: tuple  # (nx, ny, nz)

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        pillar_features = batch_dict['pillar_features']  # (B, V, C)
        coords = batch_dict['voxel_coords']              # (B, V, 3) z, y, x
        valid = batch_dict['voxel_valid']                # (B, V)
        nx, ny, nz = self.grid_size
        assert nz == 1
        b, v, c = pillar_features.shape

        flat = jnp.where(valid, coords[..., 1] * nx + coords[..., 2], ny * nx)
        canvas = jnp.zeros((b, ny * nx, c), pillar_features.dtype)
        canvas = _batched_scatter(canvas, flat, pillar_features)
        batch_dict['spatial_features'] = canvas.reshape(b, ny, nx, c)
        batch_dict['spatial_features_stride'] = 1
        return batch_dict


def _batched_scatter(canvas, flat_idx, values):
    """(B, HW, C) ← values (B, V, C) at flat_idx (B, V), OOB dropped."""
    b, hw, c = canvas.shape
    v = values.shape[1]
    batch_off = jnp.arange(b, dtype=flat_idx.dtype)[:, None] * (hw + 1)
    lin = (flat_idx + batch_off).reshape(-1)
    flat_canvas = jnp.zeros((b * (hw + 1), c), values.dtype)
    flat_canvas = flat_canvas.at[lin].set(values.reshape(b * v, c), mode='drop')
    return flat_canvas.reshape(b, hw + 1, c)[:, :hw]


class HeightCompression(nn.Module):
    """Dense 3D feature volume → BEV by folding depth into channels.

    Parity: ``height_compression.py:10-26`` ((N,C,D,H,W)→(N,C·D,H,W)); here
    NHWC: (B, D, H, W, C) → (B, H, W, D·C).
    """
    model_cfg: dict

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        x = batch_dict['encoded_spconv_features']  # (B, D, H, W, C)
        b, d, h, w, c = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)
        batch_dict['spatial_features'] = x
        batch_dict['spatial_features_stride'] = batch_dict.get(
            'encoded_spconv_tensor_stride', 8)
        return batch_dict


class Conv2DCollapse(nn.Module):
    """Dense voxel volume → BEV via channel concat + learned 1-conv
    reduction (CaDDN's collapse).

    Parity: ``conv2d_collapse.py`` — (B, D, H, W, C) folds depth into
    channels then a BasicBlock2D (conv+BN+ReLU) reduces back to
    NUM_BEV_FEATURES.
    """
    model_cfg: dict
    grid_size: tuple

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        from ...config import to_cfg
        cfg = to_cfg(self.model_cfg)
        x = batch_dict['voxel_features_dense'] \
            if 'voxel_features_dense' in batch_dict \
            else batch_dict['encoded_spconv_features']  # (B, D, H, W, C)
        b, d, h, w, c = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)
        args = dict(cfg.get('ARGS', {}))
        ksz = int(args.get('kernel_size', 1))
        x = nn.Conv(int(cfg.NUM_BEV_FEATURES), (ksz, ksz),
                    use_bias=bool(args.get('bias', False)))(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3)(x)
        x = nn.relu(x)
        batch_dict['spatial_features'] = x
        batch_dict['spatial_features_stride'] = batch_dict.get(
            'encoded_spconv_tensor_stride', 1)
        return batch_dict


def build_map_to_bev(model_cfg, grid_size):
    name = model_cfg['NAME']
    if name == 'PointPillarScatter':
        return PointPillarScatter(model_cfg=model_cfg, grid_size=tuple(grid_size))
    if name == 'HeightCompression':
        return HeightCompression(model_cfg=model_cfg)
    if name == 'Conv2DCollapse':
        return Conv2DCollapse(model_cfg=model_cfg, grid_size=tuple(grid_size))
    raise KeyError(f'unknown map_to_bev {name}')
