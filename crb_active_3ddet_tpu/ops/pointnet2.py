"""PointNet++ primitives (pure JAX, fixed shapes) — TPU-native replacement
for ``pcdet/ops/pointnet2`` (both the "stack" ragged variant
``pointnet2_stack/src/*.cu`` and the dense-batch ``pointnet2_batch``):
farthest point sampling (``sampling_gpu.cu:25``), ball query
(``ball_query_gpu.cu``), grouping, and three-NN interpolation
(``interpolate_gpu.cu``).

Ragged "stack" semantics become padded (N, ...) buffers + validity masks;
the batch dimension is vmapped by callers.  FPS is the inherently-sequential
piece — implemented as ``lax.fori_loop`` over K iterations of a vectorized
argmax (O(K·N) with all N-work on the VPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e10


@partial(jax.jit, static_argnames=('num_samples',))
def farthest_point_sample(points, valid, num_samples: int):
    """(N, 3) padded points → (num_samples,) int32 indices.

    Parity: ``pointnet2_stack_utils.farthest_point_sample`` /
    ``sampling_gpu.cu:25`` — starts from index 0, iteratively picks the
    point maximizing the min-distance to the selected set.  Invalid slots
    never get picked (distance −inf); if fewer valid points than samples,
    indices repeat (harmless downstream, like the reference's behavior with
    padded buffers).
    """
    if jax.default_backend() == 'tpu':
        # Pallas kernel: the whole K-iteration loop runs against
        # VMEM-resident state — the XLA scan below pays ~0.2 ms of
        # fusion/loop overhead PER ITERATION on the device (traced at 202
        # ms for a batch-16 PV-RCNN scorer step); the kernel collapses
        # that to ~ms.  Bit-identical selection (parity-tested).
        from .pallas_kernels import farthest_point_sample_pallas
        return farthest_point_sample_pallas(points, valid, num_samples)

    def step(carry, _):
        min_dist, last = carry
        d = jnp.sum((points - points[last]) ** 2, axis=1)
        min_dist = jnp.minimum(min_dist, jnp.where(valid, d, -_BIG))
        nxt = jnp.argmax(min_dist).astype(jnp.int32)
        return (min_dist, nxt), nxt

    # sequential by nature; unrolling trades a little HLO size for ~8x
    # fewer while-loop steps (each step's math is tiny — O(N) distance
    # update — so per-step loop overhead dominates on TPU)
    first = jnp.asarray(0, jnp.int32)
    init = (jnp.where(valid, _BIG, -_BIG), first)
    _, rest = jax.lax.scan(step, init, None, length=num_samples - 1,
                           unroll=8)
    return jnp.concatenate([first[None], rest])


@partial(jax.jit, static_argnames=('nsample',))
def ball_query(radius: float, nsample: int, xyz, xyz_valid, new_xyz,
               new_xyz_valid):
    """Fixed-capacity ball query.

    xyz: (N, 3) source points; new_xyz: (M, 3) query centers.
    Returns (idx (M, nsample) int32, cnt (M,)) — first ``nsample`` source
    points within ``radius`` of each center, in source order; empty slots
    repeat the first hit (CUDA kernel semantics: ``ball_query_gpu.cu``
    initializes all slots to the first found index).
    """
    d2 = jnp.sum((new_xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    in_ball = (d2 < radius * radius) & xyz_valid[None, :] \
        & new_xyz_valid[:, None]                       # (M, N)
    n = xyz.shape[0]
    # compaction as an MXU one-hot contraction: each hit's slot is its rank
    # among the row's hits; idx[m, s] = Σ_n onehot(slot)[m, n, s] · n.  The
    # measured ladder on v5e (`tools/profile.py gather` + /tmp benches): scalar
    # scatter 500+ ms → top_k 86 ms → searchsorted 40 ms → this, ~15 ms per
    # (1024 × 18k) query.  Exact: f32 represents indices < 2^24.
    ranks = jnp.cumsum(in_ball.astype(jnp.int32), axis=1)       # (M, N)
    first = in_ball & (ranks <= nsample)
    slot = jnp.where(first, ranks - 1, nsample)
    onehot = jax.nn.one_hot(slot, nsample + 1,
                            dtype=jnp.float32)[..., :nsample]
    src = jnp.arange(n, dtype=jnp.float32)
    idx = jnp.round(jnp.einsum('mnk,n->mk', onehot, src)).astype(jnp.int32)
    cnt = jnp.minimum(ranks[:, -1], nsample).astype(jnp.int32)
    # pad empty slots with the first hit (slot 0); fully-empty rows are
    # masked by cnt == 0 downstream
    slot_valid = jnp.arange(nsample)[None, :] < cnt[:, None]
    idx = jnp.where(slot_valid, idx, idx[:, 0:1])
    return idx, cnt


def grouping_operation(features, idx, idx_valid=None):
    """features: (N, C); idx: (M, K) → (M, K, C), zeros where invalid."""
    out = features[jnp.clip(idx, 0)]
    if idx_valid is not None:
        out = jnp.where(idx_valid[..., None], out, 0.0)
    return out


@jax.jit
def three_nn(unknown, unknown_valid, known, known_valid):
    """3 nearest neighbors: (M, 3) queries vs (N, 3) sources.

    Parity: ``interpolate_gpu.cu three_nn``. Returns (dist (M, 3),
    idx (M, 3) int32)."""
    d2 = jnp.sum((unknown[:, None, :] - known[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(known_valid[None, :], d2, _BIG)
    neg_top, idx = jax.lax.top_k(-d2, 3)
    dist = jnp.sqrt(jnp.clip(-neg_top, 0.0))
    return dist, idx.astype(jnp.int32)


@jax.jit
def three_interpolate(features, idx, dist):
    """Inverse-distance-weighted interpolation of (N, C) features at
    3-NN indices. Parity: ``interpolate_gpu.cu three_interpolate``."""
    weight = 1.0 / jnp.clip(dist * dist, 1e-8)
    weight = weight / weight.sum(axis=1, keepdims=True)
    neighbors = features[idx]          # (M, 3, C)
    return (neighbors * weight[..., None]).sum(axis=1)
