"""Prototype+microbench: window-slice-gather subm rulebook vs the halved
scalar-gather build.  One (3,3,3)-slice gather per voxel from a border-padded
dense table replaces 13 scalar gathers + a mirror scatter.

Pipelined timing (dispatch n, sync once), scalar-reduced outputs so the
~60MB/s host tunnel never sees bulk data.
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

from crb_active_3ddet_tpu.utils.common import enable_compilation_cache
enable_compilation_cache()
from crb_active_3ddet_tpu.ops.sparse import rulebook as rb

B = 4


def timed(fn, args, n=16, name=''):
    try:
        np.asarray(fn(*args))
    except Exception as e:
        print(f'{name:46s} FAILED: {str(e)[:160]}', flush=True)
        return
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / n
    print(f'{name:46s} {dt * 1e3:9.2f} ms', flush=True)


@partial(jax.jit, static_argnames=('grid',))
def build_padded_table(coords, valid, grid):
    """Dense (nz+2)(ny+2)(nx+2) flat table, -1 border, cell->voxel row."""
    nz, ny, nx = grid
    pz, py, px = nz + 2, ny + 2, nx + 2
    cells = pz * py * px
    h = ((coords[:, 0] + 1) * py + (coords[:, 1] + 1)) * px + (coords[:, 2] + 1)
    in_b = ((coords[:, 0] >= 0) & (coords[:, 0] < nz)
            & (coords[:, 1] >= 0) & (coords[:, 1] < ny)
            & (coords[:, 2] >= 0) & (coords[:, 2] < nx))
    pos = jnp.where(valid & in_b, h, cells)
    table = jnp.full((cells + 1,), -1, jnp.int32)
    v = coords.shape[0]
    table = table.at[pos].set(jnp.arange(v, dtype=jnp.int32), mode='drop')
    return table[:cells].reshape(pz, py, px)


@partial(jax.jit, static_argnames=('grid',))
def subm_rulebook_window(coords, valid, grid, table=None):
    """(V, 27) subm rulebook: ONE (3,3,3) window gather per voxel."""
    if table is None:
        table = build_padded_table(coords, valid, grid)
    starts = jnp.clip(coords, 0)  # padded: start z-1+1 = z

    def win(s):
        return jax.lax.dynamic_slice(table, (s[0], s[1], s[2]), (3, 3, 3))
    w = jax.vmap(win)(starts).reshape(-1, 27)
    return jnp.where(valid[:, None], w, -1)


def main():
    rng = np.random.RandomState(0)
    for grid, v, tag in [((41, 1600, 1408), 16000, 'grid0 16k'),
                         ((41, 1600, 1408), 40000, 'grid0 40k'),
                         ((21, 800, 704), 12000, 'grid1 12k'),
                         ((11, 400, 352), 6400, 'grid2 6.4k'),
                         ((5, 200, 176), 4000, 'grid3 4k')]:
        nz, ny, nx = grid
        c = np.stack([rng.randint(0, min(nz, 20), (B, v)),
                      rng.randint(0, ny, (B, v)),
                      rng.randint(0, nx, (B, v))], -1).astype(np.int32)
        cj, vl = jnp.asarray(c), jnp.ones((B, v), bool)

        f_old = jax.jit(lambda cc, vv, g=grid: jnp.sum(jax.vmap(
            partial(rb.subm_rulebook_halved, grid=g))(cc, vv)))
        f_new = jax.jit(lambda cc, vv, g=grid: jnp.sum(jax.vmap(
            partial(subm_rulebook_window, grid=g))(cc, vv)))
        timed(f_old, (cj, vl), name=f'halved(scalar) {tag}')
        timed(f_new, (cj, vl), name=f'window(slice)  {tag}')

        # parity: compare against direct per-offset lookup semantics
        o = np.asarray(jax.vmap(partial(rb.lookup_neighbors, grid=grid))(
            cj, vl, cj, vl))
        nw = np.asarray(jax.vmap(partial(subm_rulebook_window, grid=grid))(
            cj, vl))
        same = (o == nw).mean()
        print(f'  parity vs lookup_neighbors = {same:.6f}', flush=True)


if __name__ == '__main__':
    main()
