"""Isolate XLA gather cost vs table size, row width, and locality.

Questions:
  1. scalar gather cost/index vs table size (16k .. 92M cells)
  2. row-gather (V,4) cost/index
  3. does a tile-major cell relabeling (2x8x8 tiles) speed up the
     neighbor-query gathers into a 92M-cell table? (locality hypothesis)
"""
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import jax
import jax.numpy as jnp

from crb_active_3ddet_tpu.utils.common import enable_compilation_cache
enable_compilation_cache()

N_IDX = 2_000_000   # total gather indices per call


def timed(fn, args, n=12, name=''):
    try:
        np.asarray(fn(*args))
    except Exception as e:
        print(f'{name:52s} FAILED: {str(e)[:140]}', flush=True)
        return None
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / n
    print(f'{name:52s} {dt * 1e3:9.2f} ms  '
          f'({dt / N_IDX * 1e9:6.2f} ns/idx)', flush=True)
    return dt


@jax.jit
def scalar_gather(table, idx):
    return table[idx].sum()


@jax.jit
def row_gather4(table4, idx):
    return table4[idx].sum()


def main():
    global N_IDX
    rng = np.random.RandomState(0)

    for size in [16_384, 1_048_576, 16_777_216, 92_364_800]:
        table = jnp.arange(size, dtype=jnp.int32)
        idx = jnp.asarray(rng.randint(0, size, N_IDX).astype(np.int32))
        timed(scalar_gather, (table, idx),
              name=f'scalar gather, table {size/1e6:7.2f}M')

    # row gather from small (V,4) table
    v = 40_000
    table4 = jnp.arange(v * 4, dtype=jnp.int32).reshape(v, 4)
    idx = jnp.asarray(rng.randint(0, v, N_IDX).astype(np.int32))
    timed(row_gather4, (table4, idx), name=f'row gather (V,4), V=40k')
    table128 = jnp.arange(v * 128, dtype=jnp.int32).reshape(v, 128)
    timed(jax.jit(lambda t, i: t[i].sum()), (table128, idx),
          name=f'row gather (V,128), V=40k')

    # neighbor-structured queries into a 92M table: x-major vs tile-major
    nz, ny, nx = 41, 1600, 1408
    v = 16000
    b = 4
    size = nz * ny * nx
    cs = []
    for _ in range(b):
        hset = np.unique(rng.randint(0, size, 2 * v))[:v]
        cs.append(np.sort(hset))
    h = np.stack(cs)                                     # (B, V) cell ids
    z = h // (ny * nx)
    y = (h % (ny * nx)) // nx
    x = h % nx
    # all 26 neighbor queries (dz,dy,dx)
    offs = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
            for dx in (-1, 0, 1) if (dz, dy, dx) != (0, 0, 0)]
    qz = np.stack([z + o[0] for o in offs], -1)
    qy = np.stack([y + o[1] for o in offs], -1)
    qx = np.stack([x + o[2] for o in offs], -1)
    ok = ((qz >= 0) & (qz < nz) & (qy >= 0) & (qy < ny)
          & (qx >= 0) & (qx < nx))

    # x-major ids
    q_flat = np.where(ok, (qz * ny + qy) * nx + qx, 0).astype(np.int32)
    table_flat = jnp.zeros((b, size), jnp.int32)

    @jax.jit
    def query_xmajor(tb, q):
        return jax.vmap(lambda t, qq: t[qq])(tb, q).sum()
    N_IDX = b * v * 26
    timed(query_xmajor, (table_flat, jnp.asarray(q_flat.reshape(b, -1))),
          name='26-nbr query, x-major 92M table')

    # tile-major ids (2x8x8 tiles => 128-cell tiles)
    tz, tyy, txx = 2, 8, 8
    ntz, nty, ntx = -(-nz // tz), -(-ny // tyy), -(-nx // txx)
    tile = ((qz // tz) * nty + (qy // tyy)) * ntx + (qx // txx)
    within = ((qz % tz) * tyy + (qy % tyy)) * txx + (qx % txx)
    q_tile = np.where(ok, tile * 128 + within, 0).astype(np.int32)
    size_t = ntz * nty * ntx * 128
    table_tile = jnp.zeros((b, size_t), jnp.int32)
    timed(query_xmajor, (table_tile, jnp.asarray(q_tile.reshape(b, -1))),
          name='26-nbr query, tile-major(2x8x8) table')

    # same but only 13 queries (halved) for comparison
    N_IDX = b * v * 13
    timed(query_xmajor, (table_flat,
                         jnp.asarray(q_flat[..., :13].reshape(b, -1))),
          name='13-nbr query, x-major 92M table')
    timed(query_xmajor, (table_tile,
                         jnp.asarray(q_tile[..., :13].reshape(b, -1))),
          name='13-nbr query, tile-major table')


if __name__ == '__main__':
    main()
