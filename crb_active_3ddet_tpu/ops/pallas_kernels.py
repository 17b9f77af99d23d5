"""Pallas TPU kernels for the sparse-conv gather-GEMM (reference
implementation; see status below for why XLA won the production slot).

The kernel streams rulebook-directed rows straight from the feature table in
VMEM into MXU accumulation, so each input feature row is read once per
kernel offset with no intermediate HBM round-trip.

Status: numerically validated in Pallas interpret mode (tests).  Two facts
keep it OFF the production path:
  1. the deployed Mosaic toolchain rejects in-kernel dynamic gathers
     (``Cannot do int indexing on TPU``), so the compiled form needs a
     scalar-prefetch DMA redesign;
  2. a device trace of the production path (tools/profile.py trace) showed
     XLA's native row-gather + one-big-GEMM already runs the feature
     gathers at ~1.5 ns/row — bandwidth-bound, within ~2x of the HBM
     speed-of-light for the (V, K³·Cin) materialization — so the ceiling a
     fused kernel could recover is small compared to the rulebook/index
     costs that dominated instead (fixed by payload-carrying sorts and
     128-lane-row tables in ops/sparse/rulebook.py).
Kept as the documented Pallas counterpart + interpret-mode oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_gemm_kernel(rb_ref, feat_ref, w_ref, out_ref, acc_ref):
    """Grid: (num_voxel_blocks, num_offsets).  Block shapes:
    rb_ref: (K, BLK_V) int32 neighbor ids, transposed so BLK_V rides lanes;
    feat_ref: (V_in, C_in) full feature table (VMEM resident);
    w_ref: (1, C_in, C_out) this offset's weight slice;
    out_ref: (BLK_V, C_out); acc_ref: (BLK_V, C_out) f32 scratch."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    idx = rb_ref[k, :]                      # (BLK_V,)
    ok = idx >= 0
    safe = jnp.where(ok, idx, 0)
    rows = feat_ref[safe, :]                # (BLK_V, C_in) dynamic gather
    rows = jnp.where(ok[:, None], rows, 0.0)
    acc_ref[:] += jnp.dot(rows, w_ref[0],
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@partial(jax.jit, static_argnames=('block_v', 'interpret'))
def sparse_conv_gather_gemm(features, rulebook, weights, block_v: int = 256,
                            interpret: bool = False):
    """Pallas sparse conv: out[v] = Σ_k feat[rulebook[v, k]] @ W[k].

    features: (V_in, C_in) f32; rulebook: (V_out, K) int32 (−1 = none);
    weights: (K, C_in, C_out). Returns (V_out, C_out) f32.
    """
    v_out, k = rulebook.shape
    c_in = features.shape[1]
    c_out = weights.shape[2]
    pad_v = (-v_out) % block_v
    rb_t = jnp.pad(rulebook, ((0, pad_v), (0, 0)), constant_values=-1).T
    vp = rb_t.shape[1]

    out = pl.pallas_call(
        _gather_gemm_kernel,
        grid=(vp // block_v, k),
        in_specs=[
            pl.BlockSpec((k, block_v), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(features.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in, c_out), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_v, c_out), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vp, c_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_v, c_out), jnp.float32)],
        interpret=interpret,
    )(rb_t, features, weights)
    return out[:v_out]


# ---------------------------------------------------------------------------
# Farthest point sampling — the PV-RCNN eval step's single hottest op
# ---------------------------------------------------------------------------

def _fps_kernel(pts_ref, out_ref, dist_ref, num_samples: int):
    """Single-sample FPS entirely in VMEM.

    pts_ref: (8, N) f32 — rows 0..2 = x/y/z, row 3 = validity (1/0);
    out_ref: (num_samples, 128) i32, index broadcast across lanes;
    dist_ref: (1, N) f32 scratch.

    The XLA formulation (ops/pointnet2.farthest_point_sample) runs
    num_samples sequential fusions against HBM-resident state — a device
    trace measured ~0.2 ms PER ITERATION of loop/fusion overhead (202 ms of
    a 1356 ms batch-16 PV-RCNN scorer step).  Here the point set (20k × 4
    rows ≈ 640 KB) and the min-distance state live in VMEM for the whole
    K-iteration loop; each iteration is ~6 short VPU passes with no HBM
    traffic, no per-iteration dispatch, and no dynamic int indexing (the
    argmax point's coordinates come from masked reductions — the deployed
    Mosaic toolchain rejects int gathers in-kernel)."""
    n = pts_ref.shape[1]
    xs = pts_ref[0:1, :]
    ys = pts_ref[1:2, :]
    zs = pts_ref[2:3, :]
    validf = pts_ref[3:4, :]                       # 1.0 valid / 0.0 pad
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    # start from index 0 (reference sampling_gpu.cu:25 semantics).  The
    # output is (num_samples, 128) with the index broadcast across lanes:
    # Mosaic rejects scalar VMEM stores and dynamic LANE-offset stores
    # ("cannot statically prove index is a multiple of 128"), but a full
    # (1, 128) row store at a dynamic SUBLANE offset is provable.  The
    # wrapper reads lane 0.
    out_ref[0:1, :] = jnp.zeros((1, 128), jnp.int32)
    dist_ref[:] = jnp.where(validf > 0, 1e10, -1e10)
    sel0 = (lane == 0).astype(jnp.float32)
    x0 = jnp.sum(xs * sel0)
    y0 = jnp.sum(ys * sel0)
    z0 = jnp.sum(zs * sel0)

    def body(i, carry):
        xc, yc, zc = carry
        d = (xs - xc) ** 2 + (ys - yc) ** 2 + (zs - zc) ** 2
        d = jnp.where(validf > 0, d, -1e10)
        dist_ref[:] = jnp.minimum(dist_ref[:], d)
        nxt = jnp.argmax(dist_ref[0, :]).astype(jnp.int32)
        out_ref[pl.ds(i, 1), :] = jnp.full((1, 128), nxt, jnp.int32)
        sel = (lane == nxt).astype(jnp.float32)
        return (jnp.sum(xs * sel), jnp.sum(ys * sel), jnp.sum(zs * sel))

    jax.lax.fori_loop(1, num_samples, body, (x0, y0, z0))


@partial(jax.jit, static_argnames=('num_samples', 'interpret'))
def farthest_point_sample_pallas(points, valid, num_samples: int,
                                 interpret: bool = False):
    """(N, 3) padded points + (N,) validity → (num_samples,) int32 indices.
    Numerically identical to ops.pointnet2.farthest_point_sample (same f32
    distance math, same first-max argmax tie-breaking); parity-tested in
    interpret mode."""
    n = points.shape[0]
    n_pad = (-n) % 128
    rows = jnp.concatenate([points.astype(jnp.float32).T,
                            valid.astype(jnp.float32)[None, :],
                            jnp.zeros((4, n), jnp.float32)], axis=0)
    rows = jnp.pad(rows, ((0, 0), (0, n_pad)))     # (8, N_pad), pads invalid
    out = pl.pallas_call(
        partial(_fps_kernel, num_samples=num_samples),
        out_shape=jax.ShapeDtypeStruct((num_samples, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, rows.shape[1]), jnp.float32)],
        interpret=interpret,
    )(rows)
    return out[:, 0]
