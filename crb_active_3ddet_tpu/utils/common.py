"""Common utilities: rotation, angle wrapping, logging, RNG discipline.

Reference parity: ``pcdet/utils/common_utils.py`` (rotate_points_along_z :35-57,
limit_period :60-63, create_logger :85-99, set_random_seed :102-107,
get_voxel_centers :66-82).  TPU-first: everything array-shaped is pure JAX,
seeds are threaded through ``jax.random`` keys instead of global state.
"""

from __future__ import annotations

import logging
import random

import jax
import jax.numpy as jnp
import numpy as np


def check_numpy_to_jax(x):
    if isinstance(x, np.ndarray):
        return jnp.asarray(x), True
    return x, False


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Wrap angles into [-offset*period, (1-offset)*period).

    Mirrors ``common_utils.limit_period`` (`common_utils.py:60-63`).
    Works for both numpy and jax inputs.
    """
    if isinstance(val, np.ndarray) or np.isscalar(val):
        return val - np.floor(val / period + offset) * period
    return val - jnp.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """(..., 3, 3) rotation matrices about +z for (...,) angles (jax)."""
    cosa, sina = jnp.cos(angle), jnp.sin(angle)
    zeros, ones = jnp.zeros_like(angle), jnp.ones_like(angle)
    rot = jnp.stack([
        cosa, sina, zeros,
        -sina, cosa, zeros,
        zeros, zeros, ones,
    ], axis=-1).reshape(*angle.shape, 3, 3)
    return rot


def rotate_points_along_z(points, angle):
    """Rotate batched points about the z axis.

    points: (B, N, 3 + C), angle: (B,) — counter-clockwise (lidar convention).
    Mirrors ``common_utils.rotate_points_along_z`` (`common_utils.py:35-57`).
    """
    xp = jnp if isinstance(points, jnp.ndarray) else np
    cosa, sina = xp.cos(angle), xp.sin(angle)
    zeros, ones = xp.zeros_like(angle), xp.ones_like(angle)
    rot = xp.stack([
        cosa, sina, zeros,
        -sina, cosa, zeros,
        zeros, zeros, ones,
    ], axis=-1).reshape(-1, 3, 3)
    xyz = points[..., :3] @ rot.swapaxes(-1, -2) if xp is np else jnp.einsum(
        'bnc,bdc->bnd', points[..., :3], rot)
    if xp is np:
        xyz = np.einsum('bnc,bdc->bnd', points[..., :3], rot)
    return xp.concatenate([xyz, points[..., 3:]], axis=-1)


def rotate_points_along_z_single(points, angle):
    """Rotate (N, 3+C) points by a scalar angle (host-side numpy augmentor)."""
    cosa, sina = np.cos(angle), np.sin(angle)
    rot = np.array([[cosa, sina, 0.0], [-sina, cosa, 0.0], [0.0, 0.0, 1.0]],
                   dtype=points.dtype)
    out = points.copy()
    out[:, :3] = points[:, :3] @ rot.T
    return out


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """Voxel-index (z, y, x int coords) → metric centers.

    Mirrors ``common_utils.get_voxel_centers`` (`common_utils.py:66-82`).
    voxel_coords: (N, 3) in (z, y, x) order.
    """
    xp = jnp if isinstance(voxel_coords, jnp.ndarray) else np
    coords = voxel_coords[:, [2, 1, 0]].astype(jnp.float32 if xp is jnp else np.float32)
    voxel_size = xp.asarray(voxel_size) * downsample_times
    pc_range = xp.asarray(point_cloud_range[0:3])
    return (coords + 0.5) * voxel_size + pc_range


def create_logger(log_file=None, rank: int = 0, log_level=logging.INFO):
    """Per-rank logger (rank>0 silenced), console + optional file.

    Mirrors ``common_utils.create_logger`` (`common_utils.py:85-99`).
    """
    logger = logging.getLogger(f'crb3d_tpu.r{rank}.{log_file}')
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    formatter = logging.Formatter('%(asctime)s  %(levelname)5s  %(message)s')
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else logging.ERROR)
        console.setFormatter(formatter)
        logger.addHandler(console)
        if log_file is not None:
            fh = logging.FileHandler(log_file)
            fh.setLevel(log_level if rank == 0 else logging.ERROR)
            fh.setFormatter(formatter)
            logger.addHandler(fh)
    return logger


def enable_compilation_cache(cache_dir: str = '/root/repo/.jax_cache'):
    """Persistent XLA compilation cache — compiles via the tunneled TPU
    service take 10-20 min, so caching across CLI invocations is essential
    on this setup."""
    import os
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception:
        pass


def set_random_seed(seed: int = 666):
    """Seed host-side RNGs (numpy/python). Device randomness is threaded via
    explicit ``jax.random`` keys; this mirrors the reference's fixed seeds
    (`tools/train.py:91` seed 666, `tools/test.py:53` seed 1024)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class AverageMeter:
    """Running mean tracker (reference `common_utils.py:110-127`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
