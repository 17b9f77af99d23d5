"""Voxel Set Abstraction (PV-RCNN's PFE) + multi-scale grouping module.

Parity: ``pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py``
(FPS keypoints :227-281, bilinear BEV interpolation :176-204, per-source
StackSAModuleMSG aggregation :130-174, fusion MLP :168-174) and
``pcdet/ops/pointnet2/pointnet2_stack/pointnet2_modules.py`` StackSAModuleMSG
(:30-110).

TPU-first: the ragged batch-cnt stacked tensors become (B, N, ...) padded
buffers + masks; ball query / grouping are vmapped fixed-capacity ops
(ops/pointnet2); each MLP level is a Dense over the last dim (the 1×1 conv)
so the grouped (B·M·ns, C) matmul lands on the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pointnet2 as pn2
from ...utils.common import get_voxel_centers


class StackSAModuleMSG(nn.Module):
    """Multi-scale grouping + pointnet + max-pool."""
    radii: tuple
    nsamples: tuple
    mlps: tuple           # tuple of tuples of channels
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, xyz_valid, new_xyz, new_xyz_valid, features,
                 training: bool = False):
        """xyz: (B, N, 3); new_xyz: (B, M, 3); features: (B, N, C) or None.
        Returns (B, M, sum_k mlps[k][-1])."""
        outs = []
        # ONE row-gather per radius from a combined [xyz | feat] table —
        # separate xyz/feature gathers each pay the per-row gather cost
        # (rows < 128 lanes cost the same as a full 128-lane row), so
        # fusing the tables halves the dominant HBM-read cost
        table = (jnp.concatenate([xyz, features], axis=-1)
                 if features is not None else xyz)
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            idx, cnt = jax.vmap(partial(pn2.ball_query, radius, nsample))(
                xyz, xyz_valid, new_xyz, new_xyz_valid)   # (B, M, ns)
            grouped_all = jax.vmap(pn2.grouping_operation)(table, idx)
            grouped_xyz = grouped_all[..., :3] - new_xyz[:, :, None, :]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, grouped_all[..., 3:]], axis=-1) \
                    if self.use_xyz else grouped_all[..., 3:]
            else:
                grouped = grouped_xyz
            # zero out empty groups / invalid centers
            ok = (cnt > 0) & new_xyz_valid
            grouped = jnp.where(ok[..., None, None], grouped, 0.0)
            x = grouped
            for ch in mlp:
                x = nn.Dense(ch, use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.99, epsilon=1e-3)(x)
                x = nn.relu(x)
            pooled = x.max(axis=2)                         # (B, M, ch)
            pooled = jnp.where(ok[..., None], pooled, 0.0)
            outs.append(pooled)
        return jnp.concatenate(outs, axis=-1)


def bilinear_interpolate(im, x, y):
    """im: (H, W, C); x, y: (M,) float indices → (M, C).
    Parity: ``voxel_set_abstraction.bilinear_interpolate_torch``."""
    h, w = im.shape[0], im.shape[1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    Ia, Ib = im[y0, x0], im[y1, x0]
    Ic, Id = im[y0, x1], im[y1, x1]
    wa = (x1 - x) * (y1 - y)
    wb = (x1 - x) * (y - y0)
    wc = (x - x0) * (y1 - y)
    wd = (x - x0) * (y - y0)
    return (Ia * wa[:, None] + Ib * wb[:, None] + Ic * wc[:, None]
            + Id * wd[:, None])


class VoxelSetAbstraction(nn.Module):
    model_cfg: Any
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    num_bev_features: int
    num_rawpoint_features: int

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        from ...config import to_cfg
        cfg = to_cfg(self.model_cfg)
        num_kp = int(cfg.NUM_KEYPOINTS)
        points = batch_dict['points']          # (B, N, C)
        points_valid = batch_dict['points_valid']
        b = points.shape[0]

        # --- keypoints via FPS over raw points (:227-281); SPC restricts
        # the candidate set to roi neighborhoods first (:206-285 —
        # sectorization is a GPU work-partitioning device, the coverage
        # objective is met by FPS over the masked set) ---
        cand_valid = points_valid
        if cfg.get('SAMPLE_METHOD', 'FPS') == 'SPC' and 'rois' in batch_dict:
            spc = cfg.SPC_SAMPLING
            rois = batch_dict['rois']                 # (B, R, 7)
            d = jnp.linalg.norm(
                points[:, :, None, :3] - rois[:, None, :, 0:3], axis=-1)
            roi_rad = jnp.linalg.norm(rois[..., 3:6] / 2, axis=-1)
            near = (d < roi_rad[:, None, :]
                    + float(spc.SAMPLE_RADIUS_WITH_ROI)).any(-1)
            cand_valid = points_valid & near
            # fall back to all points when a frame has no roi-near points
            cand_valid = jnp.where(cand_valid.any(-1, keepdims=True),
                                   cand_valid, points_valid)
        kp_idx = jax.vmap(partial(pn2.farthest_point_sample,
                                  num_samples=num_kp))(
            points[..., :3], cand_valid)
        keypoints = jnp.take_along_axis(points[..., :3], kp_idx[..., None],
                                        axis=1)           # (B, K, 3)
        kp_valid = jnp.take_along_axis(points_valid, kp_idx, axis=1)

        feats = []
        sa_cfg = cfg.SA_LAYER

        # --- BEV bilinear interpolation (:176-204) ---
        if 'bev' in cfg.FEATURES_SOURCE:
            bev = batch_dict['spatial_features']  # (B, H, W, C) NHWC
            stride = batch_dict.get('spatial_features_stride', 8)
            x_idx = (keypoints[..., 0] - self.point_cloud_range[0]) \
                / self.voxel_size[0] / stride
            y_idx = (keypoints[..., 1] - self.point_cloud_range[1]) \
                / self.voxel_size[1] / stride
            bev_feats = jax.vmap(bilinear_interpolate)(bev, x_idx, y_idx)
            feats.append(bev_feats)

        def make_sa(layer_cfg, name):
            if 'NUM_GROUPS' in layer_cfg:     # PV-RCNN++ vector pool
                from .vector_pool import VectorPoolAggregationMSG
                return VectorPoolAggregationMSG(config=layer_cfg, name=name)
            return StackSAModuleMSG(
                radii=tuple(layer_cfg.POOL_RADIUS),
                nsamples=tuple(layer_cfg.NSAMPLE),
                mlps=tuple(tuple(m) for m in layer_cfg.MLPS),
                name=name)

        # --- raw points SA ---
        if 'raw_points' in cfg.FEATURES_SOURCE:
            raw_cfg = sa_cfg.raw_points
            raw_feats = points[..., 3:] if points.shape[-1] > 3 else None
            sa = make_sa(raw_cfg, 'SA_rawpoints')
            if raw_feats is None:
                raw_feats = jnp.zeros((*points.shape[:2], 1), points.dtype)
            feats.append(sa(points[..., :3], points_valid, keypoints, kp_valid,
                            raw_feats, training))

        # --- multi-scale sparse conv features ---
        for src in cfg.FEATURES_SOURCE:
            if src in ('bev', 'raw_points'):
                continue
            ms = batch_dict['multi_scale_3d_features'][src]
            down = int(sa_cfg[src].DOWNSAMPLE_FACTOR)
            cur_coords = ms['coords']             # (B, V, 3) z,y,x
            cur_valid = ms['valid']
            centers = jax.vmap(partial(
                get_voxel_centers, downsample_times=down,
                voxel_size=jnp.asarray(self.voxel_size),
                point_cloud_range=jnp.asarray(self.point_cloud_range)))(
                cur_coords)
            sa = make_sa(sa_cfg[src], f'SA_{src}')
            feats.append(sa(centers, cur_valid, keypoints, kp_valid,
                            ms['features'], training))

        point_features = jnp.concatenate(feats, axis=-1)   # (B, K, c_in)
        batch_dict['point_features_before_fusion'] = point_features
        fused = nn.Dense(int(cfg.NUM_OUTPUT_FEATURES), use_bias=False,
                         name='vsa_fusion')(point_features)
        fused = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                             epsilon=1e-3)(fused)
        fused = nn.relu(fused)
        batch_dict['point_features'] = fused               # (B, K, 128)
        batch_dict['point_coords'] = keypoints             # (B, K, 3)
        batch_dict['point_coords_valid'] = kp_valid
        return batch_dict


def build_pfe(model_cfg, voxel_size, point_cloud_range, num_bev_features,
              num_rawpoint_features):
    name = model_cfg['NAME']
    if name == 'VoxelSetAbstraction':
        return VoxelSetAbstraction(
            model_cfg=model_cfg,
            voxel_size=tuple(float(v) for v in voxel_size),
            point_cloud_range=tuple(float(x) for x in point_cloud_range),
            num_bev_features=num_bev_features,
            num_rawpoint_features=num_rawpoint_features)
    raise KeyError(f'unknown pfe {name}')
