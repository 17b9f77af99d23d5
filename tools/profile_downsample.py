"""Head-to-head: sort-based vs dense-table downsample rulebooks, plus the
dense path's internal pieces, with in-jit repetition (K=8) so the ~29ms
dispatch floor amortizes away."""
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
K_REP = 8


def timed(fn, args, n=8, name=''):
    try:
        np.asarray(fn(*args))
    except Exception as e:
        print(f'{name:48s} FAILED: {str(e)[:140]}', flush=True)
        return
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / n
    print(f'{name:48s} {dt * 1e3:9.2f} ms/call ~{dt * 1e3 / K_REP:7.2f} '
          f'ms/op', flush=True)


def repeat_scan(op, k=K_REP):
    def fn(*args):
        def body(carry, i):
            return carry + op(i, *args), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
        return out
    return jax.jit(fn)


def main():
    rng = np.random.RandomState(0)
    cases = [((41, 1600, 1408), 40000, 12000, 'grid0->1 40k'),
             ((41, 1600, 1408), 16000, 12000, 'grid0->1 16k'),
             ((21, 800, 704), 12000, 6400, 'grid1->2'),
             ((11, 400, 352), 6400, 4000, 'grid2->3')]
    for grid, v, mo, tag in cases:
        nz, ny, nx = grid
        cells = nz * ny * nx
        cs = []
        for _ in range(B):
            hset = np.unique(rng.randint(0, cells, 2 * v))[:v]
            cs.append(np.sort(hset))
        h = jnp.asarray(np.stack(cs).astype(np.int32))
        coords = jnp.stack([h // (ny * nx), (h % (ny * nx)) // nx, h % nx],
                           -1)
        valid = jnp.ones((B, v), bool)
        print(f'--- {tag} ---', flush=True)

        def sort_op(i, c, vl):
            r = jax.vmap(partial(rb.downsample_rulebook, grid=grid,
                                 kernel_size=(3, 3, 3), stride=(2, 2, 2),
                                 padding=(1, 1, 1), max_out=mo))(
                c + (i - i), vl)
            return r[2].sum().astype(jnp.float32)
        timed(repeat_scan(sort_op), (coords, valid), name='sort-based')

        table = jax.vmap(partial(rb.build_dense_table, grid=grid))(
            coords, valid)

        def dense_op(i, c, vl, tb):
            r = jax.vmap(partial(rb.downsample_rulebook_dense, grid=grid,
                                 kernel_size=(3, 3, 3), stride=(2, 2, 2),
                                 padding=(1, 1, 1), max_out=mo))(
                c + (i - i), vl, table=tb)
            return r[2].sum().astype(jnp.float32)
        timed(repeat_scan(dense_op), (coords, valid, table),
              name='dense (prebuilt table)')

        # pieces of the dense path
        ks, st, pd = (3, 3, 3), (2, 2, 2), (1, 1, 1)
        out_grid = rb.conv_out_grid(grid, ks, st, pd)
        noz, noy, nox = out_grid
        out_cells = noz * noy * nox

        def occ_cumsum_op(i, c, vl):
            def one(cc, vv):
                ip = cc + jnp.asarray(pd)[None, :]
                k_base = ip % jnp.asarray(st)[None, :]
                o = (ip[:, None, :] - k_base[:, None, :]) \
                    // jnp.asarray(st)[None, None, :]
                oh = (o[..., 0] * (noy * nox) + o[..., 1] * nox
                      + o[..., 2]).reshape(-1)
                occ = jnp.zeros((out_cells + 1,), jnp.int32).at[oh].set(
                    1, mode='drop')[:out_cells]
                csum = jnp.cumsum(occ)
                ranks = jnp.arange(1, mo + 1, dtype=csum.dtype)
                return jnp.searchsorted(csum, ranks).sum()
            return jax.vmap(one)(c + (i - i), vl).sum().astype(jnp.float32)
        timed(repeat_scan(occ_cumsum_op), (coords, valid),
              name='  occ+cumsum+searchsorted')


if __name__ == '__main__':
    main()
