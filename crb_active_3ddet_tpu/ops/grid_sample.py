"""Trilinear grid sampling (torch ``F.grid_sample`` semantics, 3D).

TPU-native replacement for the CUDA sampler behind CaDDN's frustum→voxel
transform (reference ``pcdet/models/backbones_3d/vfe/image_vfe_modules/f2v/
sampler.py:1-30`` wrapping ``F.grid_sample``).  The 8-corner fetch is a flat
row-gather over a (D·H·W, C) table — rows ride the vector lanes — and the
trilinear blend is pure VPU arithmetic.

Conventions (torch parity, ``align_corners=False``, ``padding_mode=zeros``):
grid[..., 0] indexes W (x), 1 indexes H (y), 2 indexes D (z), all normalized
to [-1, 1]; out-of-range corners contribute zero.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size):
    # align_corners=False: x = ((c + 1) * size - 1) / 2
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_3d(volume, grid):
    """volume: (D, H, W, C); grid: (..., 3) normalized (x, y, z).

    Returns (..., C) trilinearly sampled with zeros padding.
    """
    d, h, w, c = volume.shape
    out_shape = grid.shape[:-1]
    g = grid.reshape(-1, 3)
    ix = _unnormalize(g[:, 0], w)
    iy = _unnormalize(g[:, 1], h)
    iz = _unnormalize(g[:, 2], d)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    z0 = jnp.floor(iz)
    tx = (ix - x0)[:, None]
    ty = (iy - y0)[:, None]
    tz = (iz - z0)[:, None]

    flat = volume.reshape(d * h * w, c)
    n = g.shape[0]
    acc = jnp.zeros((n, c), volume.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0 + dx
                yi = y0 + dy
                zi = z0 + dz
                ok = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                      & (zi >= 0) & (zi < d))
                idx = (zi * h + yi) * w + xi
                idx = jnp.where(ok, idx, d * h * w - 1).astype(jnp.int32)
                vals = flat[idx]
                vals = jnp.where(ok[:, None], vals, 0.0)
                wgt = ((tx if dx else 1.0 - tx) * (ty if dy else 1.0 - ty)
                       * (tz if dz else 1.0 - tz))
                acc = acc + vals * wgt.astype(volume.dtype)
    return acc.reshape(*out_shape, c)


def grid_sample_2d(image, grid):
    """image: (H, W, C); grid: (..., 2) normalized (x, y).  Bilinear,
    zeros padding, align_corners=False (torch parity)."""
    h, w, c = image.shape
    out_shape = grid.shape[:-1]
    g = grid.reshape(-1, 2)
    ix = _unnormalize(g[:, 0], w)
    iy = _unnormalize(g[:, 1], h)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    tx = (ix - x0)[:, None]
    ty = (iy - y0)[:, None]
    flat = image.reshape(h * w, c)
    n = g.shape[0]
    acc = jnp.zeros((n, c), image.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.where(ok, yi * w + xi, h * w - 1).astype(jnp.int32)
            vals = jnp.where(ok[:, None], flat[idx], 0.0)
            wgt = (tx if dx else 1.0 - tx) * (ty if dy else 1.0 - ty)
            acc = acc + vals * wgt.astype(image.dtype)
    return acc.reshape(*out_shape, c)
