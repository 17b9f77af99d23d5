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
