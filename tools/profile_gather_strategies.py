"""Microbench: sparse-conv gather formulations on the real chip.

Candidates for the backbone hot path (VERDICT r2 Weak #1):
  A. XLA flat row-gather + one GEMM        (current production path)
  B. Pallas kernel, feature table VMEM-resident, in-kernel dynamic gather
  C. Pallas kernel, in-kernel one-hot matmul gather (MXU does the gather)
  D. XLA blocked one-hot matmul (lax.dot_general over int one-hot)
  E. dense scatter + lax.conv3d (NDHWC)    (per-stage dense alternative)

Run: python tools/profile_gather_strategies.py [stage]
"""
import sys
import time
from functools import partial
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crb_active_3ddet_tpu.utils.common import enable_compilation_cache
enable_compilation_cache()

B = 4
K = 27


def timed(fn, args, n=16, name=''):
    try:
        jax.tree.map(lambda x: np.asarray(x), fn(*args))
    except Exception as e:
        print(f'{name:40s} FAILED: {str(e)[:140]}', flush=True)
        return
    # pipelined: dispatch n, sync once — amortizes the ~27ms RPC floor
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for r in outs:
        jax.tree.map(lambda x: np.asarray(x), r)
    dt = (time.perf_counter() - t0) / n
    print(f'{name:40s} {dt * 1e3:9.2f} ms', flush=True)


# ---------------- A: current flat row gather ----------------
@partial(jax.jit, static_argnames=())
def xla_row_gather(feats, rbk, w):
    b, v, c = feats.shape
    cout = w.shape[-1]
    flat = jnp.concatenate([feats.reshape(b * v, c),
                            jnp.zeros((1, c), feats.dtype)], 0)
    off = (jnp.arange(b, dtype=jnp.int32) * v)[:, None, None]
    idx = jnp.where(rbk >= 0, rbk + off, b * v)
    g = flat[idx.reshape(-1)]
    return jnp.dot(g.reshape(b * v, K * c), w.reshape(K * c, cout),
                   preferred_element_type=jnp.float32)


# ---------------- B: pallas VMEM dynamic gather ----------------
def _pallas_gather_kernel(rb_ref, feat_ref, w_ref, out_ref, acc_ref):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    idx = rb_ref[k, :]
    ok = idx >= 0
    safe = jnp.where(ok, idx, 0)
    rows = feat_ref[safe, :]
    rows = jnp.where(ok[:, None], rows, 0).astype(w_ref.dtype)
    acc_ref[:] += jnp.dot(rows, w_ref[0], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=('block_v',))
def pallas_vmem_gather(feats, rbk, w, block_v=512):
    b, v, c = feats.shape
    cout = w.shape[-1]
    flat = feats.reshape(b * v, c)
    off = (jnp.arange(b, dtype=jnp.int32) * v)[:, None, None]
    idx = jnp.where(rbk >= 0, rbk + off, -1).reshape(b * v, K)
    pad_v = (-(b * v)) % block_v
    rb_t = jnp.pad(idx, ((0, pad_v), (0, 0)), constant_values=-1).T
    vp = rb_t.shape[1]
    out = pl.pallas_call(
        _pallas_gather_kernel,
        grid=(vp // block_v, K),
        in_specs=[
            pl.BlockSpec((K, block_v), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(flat.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, cout), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_v, cout), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vp, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_v, cout), jnp.float32)],
    )(rb_t, flat, w)
    return out[:b * v]


# ---------------- C: pallas in-kernel one-hot ----------------
def _pallas_onehot_kernel(rb_ref, feat_ref, w_ref, out_ref, acc_ref):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    idx = rb_ref[k, :]                               # (BLK,)
    vin = feat_ref.shape[0]
    onehot = (idx[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, vin), 1)).astype(w_ref.dtype)  # (BLK, Vin)
    rows = jnp.dot(onehot, feat_ref[:], preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(rows.astype(w_ref.dtype), w_ref[0],
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=('block_v',))
def pallas_onehot(feats, rbk, w, block_v=256):
    b, v, c = feats.shape
    cout = w.shape[-1]

    def one(feat, idx):
        pad_v = (-v) % block_v
        rb_t = jnp.pad(idx, ((0, pad_v), (0, 0)), constant_values=-1).T
        vp = rb_t.shape[1]
        return pl.pallas_call(
            _pallas_onehot_kernel,
            grid=(vp // block_v, K),
            in_specs=[
                pl.BlockSpec((K, block_v), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(feat.shape, lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c, cout), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_v, cout), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((vp, cout), jnp.float32),
            scratch_shapes=[pltpu.VMEM((block_v, cout), jnp.float32)],
        )(rb_t, feat, w)[:v]
    return jax.vmap(one)(feats, rbk)


# ---------------- D: XLA blocked one-hot ----------------
@partial(jax.jit, static_argnames=('block_v',))
def xla_onehot(feats, rbk, w, block_v=2048):
    b, v, c = feats.shape
    cout = w.shape[-1]

    def one(feat, idx):
        # scan over V blocks; per block contract one-hot (BLK, K, V) x (V, C)
        nb = v // block_v

        def body(_, blk_idx):
            oh = (blk_idx[..., None]
                  == jnp.arange(v, dtype=jnp.int32)).astype(feat.dtype)
            rows = jnp.einsum('bkv,vc->bkc', oh, feat)
            out = jnp.dot(rows.reshape(block_v, K * c),
                          w.reshape(K * c, cout),
                          preferred_element_type=jnp.float32)
            return None, out
        _, outs = jax.lax.scan(body, None,
                               idx[:nb * block_v].reshape(nb, block_v, K))
        return outs.reshape(nb * block_v, cout)
    return jax.vmap(one)(feats, rbk)


# ---------------- E: dense conv ----------------
@partial(jax.jit, static_argnames=('grid',))
def dense_conv(feats, coords, valid, w3, grid):
    b, v, c = feats.shape
    nz, ny, nx = grid
    flat = jnp.where(valid, coords[..., 0] * (ny * nx)
                     + coords[..., 1] * nx + coords[..., 2], nz * ny * nx)

    def scat(f, fl):
        canvas = jnp.zeros((nz * ny * nx + 1, c), f.dtype)
        return canvas.at[fl].set(f, mode='drop')[:-1]
    dense = jax.vmap(scat)(feats, flat).reshape(b, nz, ny, nx, c)
    y = jax.lax.conv_general_dilated(
        dense, w3, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    # gather back to sparse rows
    yflat = y.reshape(b, nz * ny * nx, -1)
    safe = jnp.where(valid, coords[..., 0] * (ny * nx)
                     + coords[..., 1] * nx + coords[..., 2], 0)
    return jax.vmap(lambda yy, ss: yy[ss])(yflat, safe)


STAGES = [
    # tag, V, C, Cout, grid
    ('stage1 16k x16ch', 16000, 16, 16, (41, 1600, 1408)),
    ('stage1 40k x16ch', 40000, 16, 16, (41, 1600, 1408)),
    ('stage2 12k x32ch', 12000, 32, 32, (21, 800, 704)),
    ('stage3 6.4k x64ch', 6400, 64, 64, (11, 400, 352)),
    ('stage4 4k x64ch', 4000, 64, 64, (5, 200, 176)),
]


def main():
    rng = np.random.RandomState(0)
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for tag, v, c, cout, grid in STAGES:
        if only and only not in tag:
            continue
        print(f'--- {tag} (B={B}, K={K}) ---', flush=True)
        rbk = np.where(rng.rand(B, v, K) < 0.4,
                       rng.randint(0, v, (B, v, K)), -1).astype(np.int32)
        rbk = jnp.asarray(rbk)
        feats = jnp.asarray(rng.randn(B, v, c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(K, c, cout), jnp.bfloat16)
        timed(xla_row_gather, (feats, rbk, w), name='A xla_row_gather')
        timed(pallas_vmem_gather, (feats, rbk, w), name='B pallas_vmem_gather')
        timed(pallas_onehot, (feats, rbk, w), name='C pallas_onehot')
        if v <= 16000:
            timed(xla_onehot, (feats, rbk, w), name='D xla_onehot')
        nz, ny, nx = grid
        if nz * ny * nx <= 20_000_000:
            coords = np.stack([rng.randint(0, nz, (B, v)),
                               rng.randint(0, ny, (B, v)),
                               rng.randint(0, nx, (B, v))], -1)
            w3 = jnp.asarray(rng.randn(3, 3, 3, c, cout), jnp.bfloat16)
            timed(dense_conv, (feats, jnp.asarray(coords.astype(np.int32)),
                               jnp.ones((B, v), bool), w3, grid),
                  name='E dense_conv')


if __name__ == '__main__':
    main()
