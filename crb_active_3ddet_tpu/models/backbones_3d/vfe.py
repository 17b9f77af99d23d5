"""Voxel feature encoders (Flax). Parity: ``pcdet/models/backbones_3d/vfe/``
(mean_vfe.py:14-31, pillar_vfe.py:8-120).

TPU-first deltas vs the reference:
  - batched fixed shapes: voxels are (B, V, K, C) with a validity mask, so
    the PFN matmul is one big (B·V·K, C)×(C, F) MXU op — no 50k-row chunking
    hack (``pillar_vfe.py:29-35``), no ragged batches.
  - BatchNorm follows the reference's semantics (stats over all rows incl.
    zero-padded ones, momentum 0.01, eps 1e-3).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MeanVFE(nn.Module):
    """Per-voxel mean of point features (``mean_vfe.py:14-31``)."""
    model_cfg: dict
    num_point_features: int

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        voxels = batch_dict['voxels']                  # (B, V, K, C)
        num_points = batch_dict['voxel_num_points']    # (B, V)
        mean = voxels.sum(axis=2) / jnp.clip(
            num_points[..., None].astype(voxels.dtype), 1.0)
        batch_dict['voxel_features'] = mean            # (B, V, C)
        return batch_dict

    def get_output_feature_dim(self):
        return self.num_point_features


class PFNLayer(nn.Module):
    out_channels: int
    use_norm: bool = True
    last_layer: bool = False

    @nn.compact
    def __call__(self, x, training: bool):
        """x: (B, V, K, C) → (B, V, 1, F) if last else (B, V, K, 2·F)."""
        out = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(out, use_bias=not self.use_norm)(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                             epsilon=1e-3)(x)
        x = nn.relu(x)
        x_max = x.max(axis=2, keepdims=True)
        if self.last_layer:
            return x_max
        return jnp.concatenate(
            [x, jnp.broadcast_to(x_max, x.shape)], axis=-1)


class PillarVFE(nn.Module):
    """Pillar feature net (``pillar_vfe.py:52-120``): augment point features
    with cluster/center offsets, mask padding, Linear+BN+ReLU+max."""
    model_cfg: dict
    num_point_features: int
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        voxels = batch_dict['voxels']                  # (B, V, K, C)
        num_points = batch_dict['voxel_num_points']    # (B, V)
        coords = batch_dict['voxel_coords']            # (B, V, 3) z, y, x

        vx, vy, vz = self.voxel_size
        x_off = vx / 2 + self.point_cloud_range[0]
        y_off = vy / 2 + self.point_cloud_range[1]
        z_off = vz / 2 + self.point_cloud_range[2]

        npts = jnp.clip(num_points[..., None, None].astype(voxels.dtype), 1.0)
        points_mean = voxels[..., :3].sum(axis=2, keepdims=True) / npts
        f_cluster = voxels[..., :3] - points_mean

        cz = coords[..., 0:1].astype(voxels.dtype)
        cy = coords[..., 1:2].astype(voxels.dtype)
        cx = coords[..., 2:3].astype(voxels.dtype)
        f_center = jnp.stack([
            voxels[..., 0] - (cx * vx + x_off),
            voxels[..., 1] - (cy * vy + y_off),
            voxels[..., 2] - (cz * vz + z_off),
        ], axis=-1)

        if self.model_cfg.get('USE_ABSLOTE_XYZ', True):
            features = [voxels, f_cluster, f_center]
        else:
            features = [voxels[..., 3:], f_cluster, f_center]
        if self.model_cfg.get('WITH_DISTANCE', False):
            features.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        features = jnp.concatenate(features, axis=-1)

        k = voxels.shape[2]
        mask = (jnp.arange(k)[None, None, :] < num_points[..., None])
        features = features * mask[..., None].astype(features.dtype)

        num_filters = list(self.model_cfg['NUM_FILTERS'])
        use_norm = self.model_cfg.get('USE_NORM', True)
        for i, nf in enumerate(num_filters):
            features = PFNLayer(nf, use_norm=use_norm,
                                last_layer=(i == len(num_filters) - 1))(
                features, training)
        batch_dict['pillar_features'] = features.squeeze(2)  # (B, V, F)
        return batch_dict

    def get_output_feature_dim(self):
        return list(self.model_cfg['NUM_FILTERS'])[-1]


class DynamicMeanVFE(MeanVFE):
    """Parity: ``pcdet/models/backbones_3d/vfe/dynamic_mean_vfe.py`` —
    scatter-based voxel means without a voxelizer.  In this framework
    voxelization is already a fused on-device op, so the capped (V, K, C)
    buffer path of MeanVFE and the reference's dynamic scatter compute the
    same means; with MAX_POINTS_PER_VOXEL >= the densest cell they are
    identical.  Kept as a registry alias for config parity."""


class DynamicPillarVFE(PillarVFE):
    """Parity: ``dynamic_pillar_vfe.py`` — see DynamicMeanVFE note."""


_VFE_REGISTRY = {
    'MeanVFE': MeanVFE,
    'PillarVFE': PillarVFE,
    'DynMeanVFE': DynamicMeanVFE,
    'DynPillarVFE': DynamicPillarVFE,
}


def build_vfe(model_cfg, num_point_features, voxel_size, point_cloud_range,
              grid_size=None):
    name = model_cfg['NAME']
    if name in ('MeanVFE', 'DynMeanVFE'):
        return _VFE_REGISTRY[name](model_cfg=model_cfg,
                                   num_point_features=num_point_features)
    if name in ('PillarVFE', 'DynPillarVFE'):
        return _VFE_REGISTRY[name](
            model_cfg=model_cfg, num_point_features=num_point_features,
            voxel_size=voxel_size, point_cloud_range=point_cloud_range)
    raise KeyError(f'unknown VFE {name}')
