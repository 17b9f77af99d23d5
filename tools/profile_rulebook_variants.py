"""Micro-bench rulebook build+query variants on the real chip.

Workload: grid0 subm rulebook at the bench shape (B=8, V=24000, KITTI grid).
In-jit repetition (lax.scan K=8) — per-dispatch RPC floor must not be charged
per iteration (see STATUS.md methodology note).

Variants:
  base      current build_dense_table_batch + all-27 row-gather query
  uniq      scatter with unique_indices=True (distinct OOB drops)
  dxgroup   27 -> 9 (dz,dy) groups x 2-consecutive-row gathers, 3 lanes
            selected from 256
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

from crb_active_3ddet_tpu.ops.sparse import rulebook as rb

B, V = 8, 24000
GRID = (41, 1600, 1408)  # KITTI grid0 (nz+1, ny, nx)


def make_inputs(seed=0):
    """Cell-sorted unique coords per sample — the voxelizer's output
    contract (sortjoin relies on it; the table path doesn't care)."""
    rng = np.random.RandomState(seed)
    nz, ny, nx = GRID
    n_valid = 19000
    coords = np.zeros((B, V, 3), np.int32)
    valid = np.zeros((B, V), bool)
    for b in range(B):
        cell = np.unique(rng.randint(0, nz * ny * nx, 2 * n_valid))
        cell = cell[rng.permutation(len(cell))[:n_valid]]
        cell.sort()
        coords[b, :len(cell), 0] = cell // (ny * nx)
        coords[b, :len(cell), 1] = (cell // nx) % ny
        coords[b, :len(cell), 2] = cell % nx
        coords[b, len(cell):] = -1
        valid[b, :len(cell)] = True
    return jnp.asarray(coords), jnp.asarray(valid)


def timed(fn, *args, iters=8, reps=3, perturb=None):
    """perturb: index of an int array arg to offset by min(carry, 0)
    (runtime-zero) so XLA cannot hoist the body out of the scan."""
    if perturb is None:
        perturb = max(i for i, a in enumerate(args)
                      if a.dtype == jnp.int32)

    @jax.jit
    def run(*a):
        def body(c, x):
            a2 = list(a)
            # genuinely different data per iteration — a traced-shift roll
            # defeats loop-invariant hoisting without changing the workload
            a2[perturb] = jnp.roll(a2[perturb], x, axis=1 if
                                   a2[perturb].ndim > 1 else 0)
            out = fn(*a2)
            s = sum(jnp.sum(o.astype(jnp.int32)) if o.dtype != jnp.int32
                    else jnp.sum(o) for o in jax.tree.leaves(out))
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.int32(0),
                            jnp.arange(iters, dtype=jnp.int32))
        return c

    # block_until_ready is unreliable on the tunneled axon backend —
    # materialize the scalar on the host (bench.py methodology)
    np.asarray(run(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def build_uniq(coords, valid, grid):
    b, v, _ = coords.shape
    nz, ny, nx = grid
    cells = nz * ny * nx
    cellsp = -(-cells // 128) * 128
    h = (coords[..., 0] * ny + coords[..., 1]) * nx + coords[..., 2]
    in_b = ((coords >= 0).all(-1)
            & (coords[..., 0] < nz) & (coords[..., 1] < ny)
            & (coords[..., 2] < nx))
    off = (jnp.arange(b, dtype=jnp.int32) * cellsp)[:, None]
    tsize = b * cellsp + 128
    oob = tsize + jnp.arange(b * v, dtype=jnp.int32)
    pos = jnp.where((valid & in_b).reshape(-1), (h + off).reshape(-1), oob)
    vals = jnp.broadcast_to(
        jnp.arange(v, dtype=jnp.uint16)[None, :], (b, v)).reshape(-1)
    table = jnp.full((tsize,), 0xFFFF, jnp.uint16)
    table = table.at[pos].set(vals, mode='drop', unique_indices=True)
    return table.reshape(-1, 128)


def query_dxgroup(table2d, coords, valid, grid, kernel_size=(3, 3, 3)):
    """9 (dz,dy) groups; per group gather rows r,r+1 covering cells
    c-1..c+1, then one-hot select 3 lanes from the 256."""
    b, v, _ = coords.shape
    nz, ny, nx = grid
    cellsp = -(-(nz * ny * nx) // 128) * 128
    pad = tuple((k - 1) // 2 for k in kernel_size)
    # center cell per (dz, dy): c = (z+dz)*ny*nx + (y+dy)*nx + x  (dx = 0)
    outs = []
    off_b = (jnp.arange(b, dtype=jnp.int32) * cellsp)[:, None]
    n_rows = table2d.shape[0]
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            zz = coords[..., 0] + dz
            yy = coords[..., 1] + dy
            ok_zy = ((zz >= 0) & (zz < nz) & (yy >= 0) & (yy < ny) & valid)
            c = (zz * ny + yy) * nx + coords[..., 2]
            cm1 = jnp.maximum(c + off_b - 1, 0)      # clamp c=0,b=0 edge
            r0 = jnp.where(ok_zy, cm1 >> 7, n_rows - 1)
            r1 = jnp.minimum(r0 + 1, n_rows - 1)
            rows = jnp.concatenate(
                [table2d[r0.reshape(-1)], table2d[r1.reshape(-1)]],
                axis=-1).astype(jnp.int32)              # (N, 256)
            base = (r0 << 7).reshape(-1)
            lanes = jnp.arange(256, dtype=jnp.int32)[None, :]
            for ddx, dx in enumerate((-1, 0, 1)):
                xx = coords[..., 2] + dx
                ok = ok_zy & (xx >= 0) & (xx < nx)
                lane_t = (c + off_b - 1 + ddx).reshape(-1) - base
                sel = (lanes == lane_t[:, None])
                got = (rows * sel).sum(-1)
                found = (got != 0xFFFF) & ok.reshape(-1)
                outs.append(jnp.where(found, got, -1))
    return jnp.stack(outs, axis=-1).reshape(b, v, 27)


def main():
    coords, valid = make_inputs()
    print('device:', jax.devices()[0])

    t = timed(partial(rb.build_dense_table_batch, grid=GRID), coords, valid)
    print(f'build base      {t:7.2f} ms')
    t = timed(partial(build_uniq, grid=GRID), coords, valid)
    print(f'build uniq      {t:7.2f} ms')

    table = rb.build_dense_table_batch(coords, valid, GRID)
    table.block_until_ready()

    # table must be an ARGUMENT, not a closed-over constant — a 1.5 GB jit
    # constant stalls compilation for minutes
    t = timed(lambda tb, c, v: rb.subm_rulebook_batch(c, v, GRID, table2d=tb),
              table, coords, valid)
    print(f'query base(27)  {t:7.2f} ms')
    t = timed(partial(query_dxgroup, grid=GRID), table, coords, valid)
    print(f'query dxgroup   {t:7.2f} ms')

    t = timed(partial(rb.subm_rulebook_sortjoin, grid=GRID), coords, valid)
    print(f'sortjoin (b+q)  {t:7.2f} ms')

    # correctness: dxgroup and sortjoin must equal base
    a = rb.subm_rulebook_batch(coords, valid, GRID, table2d=table)
    d = query_dxgroup(table, coords, valid, GRID)
    print('dxgroup == base:', bool(jnp.all(a == d)))
    s = rb.subm_rulebook_sortjoin(coords, valid, GRID)
    print('sortjoin == base:', bool(jnp.all(a == s)))
    tu = build_uniq(coords, valid, GRID)
    print('uniq table == base table:',
          bool(jnp.all(tu == table)))


if __name__ == '__main__':
    main()
