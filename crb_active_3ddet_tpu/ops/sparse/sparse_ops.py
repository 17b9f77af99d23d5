"""Sparse conv compute: gather-GEMM over rulebooks + sparse→dense scatter.

The key identity making this MXU-friendly: for kernel offsets k,
    out[o] = Σ_k in[nbr_k(o)] · W_k  =  concat_k(in[nbr_k(o)]) @ vstack_k(W_k)
so each sparse conv layer is a single (V, K³·Cin) × (K³·Cin, Cout) matmul —
exactly the shape the 128×128 systolic array wants — with the gather feeding
it.  Missing neighbors gather zeros (index −1 → masked).
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_neighbors(features, rulebook):
    """features: (V_in, C); rulebook: (V_out, K) int32 (−1 = none).
    Returns (V_out, K, C) with zeros where no neighbor."""
    safe = jnp.clip(rulebook, 0)
    g = features[safe]                       # (V_out, K, C)
    return jnp.where((rulebook >= 0)[..., None], g, 0.0)


def subm_conv3d_gather(features, rulebook, weights, out_valid=None):
    """One sparse conv GEMM.

    features: (V_in, Cin); rulebook: (V_out, K); weights: (K, Cin, Cout).
    Returns (V_out, Cout).
    """
    v_out, k = rulebook.shape
    cin = features.shape[-1]
    cout = weights.shape[-1]
    g = gather_neighbors(features, rulebook).reshape(v_out, k * cin)
    w = weights.reshape(k * cin, cout)
    out = jnp.dot(g, w, preferred_element_type=jnp.float32)
    if out_valid is not None:
        out = jnp.where(out_valid[:, None], out, 0.0)
    return out


def sparse_tensor_to_dense(features, coords, valid, grid):
    """(V, C) + (V, 3) z,y,x coords → dense (D, H, W, C)."""
    nz, ny, nx = grid
    flat = jnp.where(valid, coords[:, 0] * (ny * nx) + coords[:, 1] * nx
                     + coords[:, 2], nz * ny * nx)
    canvas = jnp.zeros((nz * ny * nx + 1, features.shape[-1]), features.dtype)
    canvas = canvas.at[flat].set(features, mode='drop')
    return canvas[:-1].reshape(nz, ny, nx, features.shape[-1])
