"""Pallas TPU kernels for the hot ops.

The fleet-critical op is the sparse-conv gather-GEMM: XLA's formulation
materializes the gathered (V, K³, Cin) tensor in HBM before the matmul —
K³=27× read amplification of the feature buffer.  The Pallas kernel streams
rulebook-directed rows straight from the feature table in VMEM into MXU
accumulation, so each input feature row is read once per kernel offset with
no intermediate HBM round-trip.

Status: numerically validated in Pallas interpret mode (tests); the deployed
Mosaic toolchain in this environment rejects in-kernel dynamic gathers
(``Cannot do int indexing on TPU``; same-shape ``take_along_axis`` crashes
the remote tpu_compile_helper), so the production sparse-conv path stays on
XLA's native gather + one-big-GEMM formulation (ops/sparse/sparse_ops.py)
until the toolchain supports it.  Revisit with a scalar-prefetch DMA design
once profiling shows the gather is the bottleneck.
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
