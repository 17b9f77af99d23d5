"""Prototype+microbench: sorted-adjacency subm rulebook.

Voxel rows are hash-sorted (voxelize + downsample_rulebook both emit sorted
order), so x±1 neighbors are shift-compares on the hash array (zero gathers)
and each of the 8 off-center (dz,dy) planes costs ONE scalar table gather
(center position j) + ONE row gather of a precomputed (V,4) adjacency row.
No mirror scatter.

Also probes the pipelined dispatch floor with a trivial kernel.
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
_INVALID = np.iinfo(np.int32).max


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
def subm_rulebook_sorted(coords, valid, grid, table=None):
    """(V, 27) subm rulebook for HASH-SORTED voxel rows.

    Row-major offset order over (dz, dy, dx) to match _kernel_offsets.
    """
    nz, ny, nx = grid
    v = coords.shape[0]
    h = rb.hash_coords(coords, valid, grid)          # sorted (invalid=MAX)
    if table is None:
        table = rb.build_dense_table(coords, valid, grid)
    cells = nz * ny * nx

    x = coords[:, 2]
    idx = jnp.arange(v, dtype=jnp.int32)
    # in-plane x-adjacency from sort order (h+1/h-1 neighbors are adjacent)
    hp = jnp.concatenate([h[1:], jnp.full((1,), _INVALID, jnp.int32)])
    hm = jnp.concatenate([jnp.full((1,), _INVALID, jnp.int32), h[:-1]])
    right = jnp.where((hp == h + 1) & (x + 1 < nx) & valid, idx + 1, -1)
    left = jnp.where((hm == h - 1) & (x - 1 >= 0) & valid, idx - 1, -1)
    # adjacency rows: nbr[j] = (left(j), j, right(j), pad)
    nbrx = jnp.stack([left, idx, right, jnp.full((v,), -1, jnp.int32)],
                     axis=1)                          # (V, 4)
    nbrx = jnp.concatenate([nbrx, jnp.full((1, 4), -1, jnp.int32)], 0)

    cols = []
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dz == 0 and dy == 0:
                cols.append(jnp.stack(
                    [jnp.where(valid, left, -1),
                     jnp.where(valid, idx, -1),
                     jnp.where(valid, right, -1)], 1))
                continue
            zz = coords[:, 0] + dz
            yy = coords[:, 1] + dy
            ok = ((zz >= 0) & (zz < nz) & (yy >= 0) & (yy < ny) & valid)
            cell = (zz * ny + yy) * nx + x
            j = jnp.where(ok, table[jnp.where(ok, cell, cells)], -1)
            row = nbrx[jnp.where(j >= 0, j, v)]      # (V, 4) row gather
            cols.append(row[:, :3])
    return jnp.concatenate(cols, axis=1)             # (V, 27)


def main():
    rng = np.random.RandomState(0)

    # dispatch floor probe
    f_triv = jax.jit(lambda x: (x * 1.0001).sum())
    xx = jnp.ones((128, 128))
    timed(f_triv, (xx,), n=32, name='dispatch floor (trivial jit)')

    for grid, v, tag in [((41, 1600, 1408), 16000, 'grid0 16k'),
                         ((41, 1600, 1408), 40000, 'grid0 40k'),
                         ((21, 800, 704), 12000, 'grid1 12k'),
                         ((11, 400, 352), 6400, 'grid2 6.4k'),
                         ((5, 200, 176), 4000, 'grid3 4k')]:
        nz, ny, nx = grid
        # unique sorted coords per sample (realistic post-voxelizer state)
        cs = []
        for _ in range(B):
            hset = np.unique(rng.randint(0, nz * ny * nx, 2 * v))[:v]
            hset = np.sort(hset)
            cs.append(np.stack([hset // (ny * nx),
                                (hset % (ny * nx)) // nx,
                                hset % nx], -1))
        cj = jnp.asarray(np.stack(cs).astype(np.int32))
        vl = jnp.ones((B, v), bool)

        f_old = jax.jit(lambda cc, vv, g=grid: jnp.sum(jax.vmap(
            partial(rb.subm_rulebook_halved, grid=g))(cc, vv)))
        f_new = jax.jit(lambda cc, vv, g=grid: jnp.sum(jax.vmap(
            partial(subm_rulebook_sorted, grid=g))(cc, vv)))
        timed(f_old, (cj, vl), name=f'halved(scalar) {tag}')
        timed(f_new, (cj, vl), name=f'sorted(adj)    {tag}')

        o = np.asarray(jax.vmap(partial(rb.lookup_neighbors, grid=grid))(
            cj, vl, cj, vl))
        nw = np.asarray(jax.vmap(partial(subm_rulebook_sorted, grid=grid))(
            cj, vl))
        same = (o == nw).mean()
        print(f'  parity vs lookup_neighbors = {same:.6f}', flush=True)


if __name__ == '__main__':
    main()
