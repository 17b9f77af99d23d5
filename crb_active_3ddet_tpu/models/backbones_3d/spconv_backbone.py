"""Sparse 3D backbones (Flax) — TPU-native replacement for the spconv-based
``pcdet/models/backbones_3d/spconv_backbone.py`` (VoxelBackBone8x :69-180,
VoxelResBackBone8x :183+; layers built on SubMConv3d/SparseConv3d from
``pcdet/utils/spconv_utils.py``).

Sparse tensors are fixed-capacity batched dicts {features (B, V, C),
coords (B, V, 3), valid (B, V), grid}.  Per-sample index work (rulebook
binary search, capped-unique downsampling) is ``jax.vmap``-ed pure
functions; the conv itself is ONE batched gather-GEMM
(B, V, K³·Cin) × (K³·Cin, Cout) with shared weights — exactly the big
matmul the MXU wants.  BatchNorm runs over all valid sites of the whole
batch (spconv BatchNorm1d semantics, eps 1e-3 momentum 0.01).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.sparse import rulebook as rb
from ...ops.sparse.sparse_ops import sparse_tensor_to_dense


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows of a padded (B, V, C) tensor."""
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, valid, training: bool):
        c = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean', lambda: jnp.zeros((c,)))
        ra_var = self.variable('batch_stats', 'var', lambda: jnp.ones((c,)))
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        if training:
            red = tuple(range(x.ndim - 1))
            n = jnp.clip(valid.sum(), 1).astype(x.dtype)
            mean = jnp.where(valid[..., None], x, 0.0).sum(red) / n
            var = jnp.where(valid[..., None], (x - mean) ** 2, 0.0).sum(red) / n
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias


class SparseConvLayer(nn.Module):
    """Batched sparse conv (+BN+ReLU): submanifold (subm=True) or strided.

    Rulebooks: callers precompute and share subm rulebooks per stage
    (``rb.subm_rulebook_halved``); strided convs derive output sites AND the
    rulebook from one sort (``rb.downsample_rulebook``) — no dense-table
    lookups on the conv path at all."""
    out_channels: int
    grid: tuple
    kernel_size: tuple = (3, 3, 3)
    stride: tuple = (1, 1, 1)
    padding: tuple = (1, 1, 1)
    subm: bool = True
    max_out: int = 0
    use_norm: bool = True
    use_relu: bool = True
    compute_dtype: str = 'float32'   # 'bfloat16' halves gather traffic

    @nn.compact
    def __call__(self, st, training: bool = False, rulebook=None):
        feats, coords, valid = st['features'], st['coords'], st['valid']
        b, v, cin = feats.shape
        k = int(np.prod(self.kernel_size))
        w = self.param('kernel', nn.initializers.variance_scaling(
            1.0, 'fan_out', 'normal'), (k, cin, self.out_channels))

        if self.subm:
            out_coords, out_valid = coords, valid
            out_grid = self.grid
            if rulebook is None:
                # subm rulebooks are shared per stage (same voxel set) —
                # callers precompute and pass them in; this is the fallback
                rulebook = jax.vmap(partial(
                    rb.subm_rulebook_halved, grid=self.grid,
                    kernel_size=self.kernel_size))(coords, valid)
        else:
            out_coords, out_valid, rulebook = jax.vmap(partial(
                rb.downsample_rulebook, grid=self.grid,
                kernel_size=self.kernel_size, stride=self.stride,
                padding=self.padding, max_out=self.max_out or v))(
                coords, valid)
            out_grid = rb.conv_out_grid(self.grid, self.kernel_size,
                                        self.stride, self.padding)

        # batched gather-GEMM with shared weights; flat 2D row-gather (a
        # padded zero row absorbs missing neighbors) measures ~30% faster
        # than a 4D take_along_axis on TPU
        cdt = jnp.dtype(self.compute_dtype)
        vo = rulebook.shape[1]
        feats_flat = jnp.concatenate(
            [feats.astype(cdt).reshape(b * v, cin),
             jnp.zeros((1, cin), cdt)], axis=0)
        off = (jnp.arange(b, dtype=jnp.int32) * v)[:, None, None]
        idx = jnp.where(rulebook >= 0, rulebook + off, b * v)
        g = feats_flat[idx.reshape(-1)]                    # (B·Vo·K, C)
        out = jnp.dot(g.reshape(b * vo, k * cin),
                      w.astype(cdt).reshape(k * cin, self.out_channels),
                      preferred_element_type=jnp.float32).reshape(
            b, vo, self.out_channels)

        if self.use_norm:
            out = MaskedBatchNorm(momentum=0.99, epsilon=1e-3)(
                out, out_valid, training)
        if self.use_relu:
            out = nn.relu(out)
        out = jnp.where(out_valid[..., None], out, 0.0)
        return {'features': out, 'coords': out_coords, 'valid': out_valid,
                'grid': out_grid}


class SparseBasicBlock(nn.Module):
    """Residual block of two subm convs (VoxelResBackBone8x)."""
    channels: int
    grid: tuple

    @nn.compact
    def __call__(self, st, training: bool = False, rulebook=None):
        identity = st['features']
        out = SparseConvLayer(self.channels, self.grid, subm=True)(
            st, training, rulebook=rulebook)
        out2 = SparseConvLayer(self.channels, self.grid, subm=True,
                               use_relu=False)(out, training,
                                               rulebook=rulebook)
        feats = nn.relu(out2['features'] + identity)
        feats = jnp.where(st['valid'][..., None], feats, 0.0)
        return {**out2, 'features': feats}


class DenseMaskedConv3d(nn.Module):
    """Dense 3D conv emulating sparse conv semantics exactly:
    submanifold conv  == dense conv + multiply by the (unchanged) occupancy
    mask; strided sparse conv == dense strided conv + maxpooled mask.  At
    stride>=4 grids the dense NDHWC conv rides the MXU and beats the
    random-access gather path by >10x on TPU."""
    out_channels: int
    kernel_size: tuple = (3, 3, 3)
    stride: tuple = (1, 1, 1)
    padding: tuple = (1, 1, 1)
    subm: bool = True
    compute_dtype: str = 'float32'
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, mask, training: bool = False):
        """x: (B, D, H, W, C); mask: (B, D, H, W) bool."""
        cdt = jnp.dtype(self.compute_dtype)
        cin = x.shape[-1]
        k = self.kernel_size
        w = self.param('kernel', nn.initializers.variance_scaling(
            1.0, 'fan_out', 'normal'), (*k, cin, self.out_channels))
        pad = [(p, p) for p in self.padding]
        # conv in the compute dtype, cast after: preferred_element_type=f32
        # with bf16 operands breaks the conv VJP (cotangent dtype mismatch);
        # the MXU accumulates in f32 internally either way and BN renorms
        y = jax.lax.conv_general_dilated(
            x.astype(cdt), w.astype(cdt), window_strides=self.stride,
            padding=pad, dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        ).astype(jnp.float32)
        if self.subm:
            new_mask = mask
        else:
            new_mask = jax.lax.reduce_window(
                mask, False, jax.lax.bitwise_or,
                (1, *self.kernel_size), (1, *self.stride),
                [(0, 0), *pad])
        y = MaskedBatchNorm(momentum=0.99, epsilon=1e-3)(y, new_mask, training)
        if self.use_relu:
            y = nn.relu(y)
        y = jnp.where(new_mask[..., None], y, 0.0)
        return y, new_mask


class VoxelBackBone8x(nn.Module):
    """Parity: ``spconv_backbone.VoxelBackBone8x`` (:69-180).

    All stages run gather-GEMM sparse conv over fixed-capacity buffers;
    only the final conv_out output scatters to a small dense volume for
    HeightCompression.  Submanifold rulebooks are built once per voxel set
    (halved-query + mirror); strided rulebooks fall out of the downsample
    sort for free (rb.downsample_rulebook).

    ``VOXEL_CAPS`` (model cfg, fractions of the input voxel cap) bounds the
    active-site buffers after each of the 4 downsamples — strided sparse
    conv shrinks the active set, so deep stages can run on much smaller
    buffers (overflow truncates, like the voxelizer's MAX_NUMBER_OF_VOXELS).
    """
    model_cfg: Any
    input_channels: int
    grid_size: tuple           # (nx, ny, nz) dataset order
    residual: bool = False

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        # spconv sparse_shape = grid_size[::-1] + [1, 0, 0] (ref :141-146)
        cfg = dict(self.model_cfg)
        cdt = 'bfloat16' if cfg.get('USE_BF16', False) else 'float32'
        nx, ny, nz = self.grid_size
        grid0 = (nz + 1, ny, nx)
        st = {'features': batch_dict['voxel_features'],
              'coords': batch_dict['voxel_coords'],
              'valid': batch_dict['voxel_valid'], 'grid': grid0}
        cap = st['features'].shape[1]
        fracs = tuple(cfg.get('VOXEL_CAPS', (1.0, 1.0, 1.0, 1.0)))
        caps = [max(16, int(cap * f)) for f in fracs]

        def subm_rbk(st):
            return jax.vmap(partial(rb.subm_rulebook_halved,
                                    grid=st['grid']))(
                st['coords'], st['valid'])

        def stage(st, ch, n_blocks, rulebook):
            for _ in range(n_blocks):
                if self.residual:
                    st = SparseBasicBlock(ch, st['grid'])(
                        st, training, rulebook=rulebook)
                else:
                    st = SparseConvLayer(ch, st['grid'], subm=True,
                                         compute_dtype=cdt)(
                        st, training, rulebook=rulebook)
            return st

        rbk0 = subm_rbk(st)
        st = SparseConvLayer(16, grid0, subm=True, compute_dtype=cdt)(
            st, training, rulebook=rbk0)  # conv_input
        st = stage(st, 16, 1, rbk0)                                # conv1
        x_conv1 = st
        st = SparseConvLayer(32, st['grid'], subm=False, stride=(2, 2, 2),
                             max_out=caps[0], compute_dtype=cdt)(st, training)
        st = stage(st, 32, 2, subm_rbk(st))                        # conv2
        x_conv2 = st
        st = SparseConvLayer(64, st['grid'], subm=False, stride=(2, 2, 2),
                             max_out=caps[1], compute_dtype=cdt)(st, training)
        st = stage(st, 64, 2, subm_rbk(st))                        # conv3
        x_conv3 = st
        st = SparseConvLayer(64, st['grid'], subm=False, stride=(2, 2, 2),
                             padding=(0, 1, 1), max_out=caps[2],
                             compute_dtype=cdt)(st, training)
        st = stage(st, 64, 2, subm_rbk(st))                        # conv4
        x_conv4 = st
        st = SparseConvLayer(128, st['grid'], subm=False,
                             kernel_size=(3, 1, 1), stride=(2, 1, 1),
                             padding=(0, 0, 0), max_out=caps[3],
                             compute_dtype=cdt)(st, training)      # conv_out
        dense = jax.vmap(partial(sparse_tensor_to_dense, grid=st['grid']))(
            st['features'], st['coords'], st['valid'])
        batch_dict['encoded_spconv_features'] = dense   # (B, D, H, W, C)
        batch_dict['encoded_spconv_tensor_stride'] = 8
        batch_dict['multi_scale_3d_features'] = {
            'x_conv1': x_conv1, 'x_conv2': x_conv2,
            'x_conv3': x_conv3, 'x_conv4': x_conv4}
        batch_dict['multi_scale_3d_strides'] = {
            'x_conv1': 1, 'x_conv2': 2, 'x_conv3': 4, 'x_conv4': 8}
        return batch_dict


class VoxelResBackBone8x(VoxelBackBone8x):
    residual: bool = True


def build_backbone_3d(model_cfg, input_channels, grid_size, voxel_size,
                      point_cloud_range):
    name = model_cfg['NAME']
    if name == 'VoxelBackBone8x':
        return VoxelBackBone8x(model_cfg=model_cfg,
                               input_channels=input_channels,
                               grid_size=tuple(int(g) for g in grid_size))
    if name == 'VoxelResBackBone8x':
        return VoxelResBackBone8x(model_cfg=model_cfg,
                                  input_channels=input_channels,
                                  grid_size=tuple(int(g) for g in grid_size))
    raise KeyError(f'unknown backbone_3d {name}')
