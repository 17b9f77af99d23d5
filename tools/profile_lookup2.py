"""Wide-row table-gather rulebook lookup candidates (v2)."""
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

B, V, K = 4, 16000, 27
GRID0 = (41, 1600, 1408)
INVALID = np.iinfo(np.int32).max


def timed(fn, args, n=8, name=''):
    float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f'{name:46s} {sorted(ts)[n // 2] * 1e3:9.2f} ms', flush=True)


def wide_lookup(c, v, grid, width):
    """Dense table reshaped to (cells/width, width); row-gather + lane select."""
    nz, ny, nx = grid
    cells = nz * ny * nx
    cells_pad = -(-(cells + 1) // width) * width

    def one(c1, v1):
        h = rb.hash_coords(c1, v1, grid)
        pos = jnp.where(h == INVALID, cells, h)
        table = jnp.full((cells_pad,), -1, jnp.int32)
        table = table.at[pos].set(jnp.arange(V, dtype=jnp.int32), mode='drop')
        trows = table.reshape(-1, width)
        q = rb._neighbor_hashes(c1, v1, grid, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        qf = jnp.where(q == INVALID, cells, q).reshape(-1)
        rows = trows[qf // width]                     # (Q, width) row gather
        lane = qf % width
        onehot = lane[:, None] == jnp.arange(width)[None, :]
        got = jnp.where(onehot, rows, 0).sum(-1) + jnp.where(
            (rows * onehot).sum(-1) < 0, 0, 0)
        # select with where/sum: rows values can be -1; do masked select
        got = (jnp.where(onehot, rows + 1, 0).sum(-1)) - 1
        return got.reshape(V, K)
    return jnp.sum(jax.vmap(one)(c, v))


def main():
    rng = np.random.RandomState(0)
    coords = np.stack([
        rng.randint(0, 20, (B, V)),
        rng.randint(0, GRID0[1], (B, V)),
        rng.randint(0, GRID0[2], (B, V))], axis=-1).astype(np.int32)
    valid = np.ones((B, V), bool)
    cj, vj = jnp.asarray(coords), jnp.asarray(valid)

    # take_along_axis lane select
    def wide_taa(c, v, width=8):
        nz, ny, nx = GRID0
        cells = nz * ny * nx
        cells_pad = -(-(cells + 1) // width) * width

        def one(c1, v1):
            h = rb.hash_coords(c1, v1, GRID0)
            pos = jnp.where(h == INVALID, cells, h)
            table = jnp.full((cells_pad,), -1, jnp.int32)
            table = table.at[pos].set(jnp.arange(V, dtype=jnp.int32),
                                      mode='drop')
            trows = table.reshape(-1, width)
            q = rb._neighbor_hashes(c1, v1, GRID0, (3, 3, 3), (1, 1, 1),
                                    (1, 1, 1))
            qf = jnp.where(q == INVALID, cells, q).reshape(-1)
            rows = trows[qf // width]
            got = jnp.take_along_axis(rows, (qf % width)[:, None],
                                      axis=1)[:, 0]
            return got.reshape(V, K)
        return jnp.sum(jax.vmap(one)(c, v))
    timed(jax.jit(wide_taa), (cj, vj), name='wide-row lookup w=8 take_along')

    # feature row gather rate reference (1.7M x 64ch rows)
    feats = jnp.asarray(rng.randn(B * V + 1, 64), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, B * V, (B * V * K,)), jnp.int32)

    def fg(f, i):
        return jnp.sum(f[i].astype(jnp.float32))
    timed(jax.jit(fg), (feats, idx), name='feature row-gather 1.7M x 64ch')

    # scalar gather reference
    table = jnp.asarray(rng.randint(0, V, (GRID0[0] * GRID0[1] * GRID0[2],)),
                        jnp.int32)
    qidx = jnp.asarray(
        rng.randint(0, GRID0[0] * GRID0[1] * GRID0[2], (B * V * K,)))

    def sg(t, q):
        return jnp.sum(t[q])
    timed(jax.jit(sg), (table, qidx), name='scalar gather 1.7M from 92M')


if __name__ == '__main__':
    main()
