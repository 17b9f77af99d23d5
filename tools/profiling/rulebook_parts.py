"""Decompose subm-rulebook cost with in-jit repetition (defeats the ~29ms
dispatch floor: each timed call runs the op K times inside one jit via
lax.scan with index perturbation, so per-op cost = slope/K).
"""
import sys
import time
from functools import partial
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import jax
import jax.numpy as jnp

from crb_active_3ddet_tpu.utils.common import enable_compilation_cache
enable_compilation_cache()
from crb_active_3ddet_tpu.ops.sparse import rulebook as rb

B = 4
K_REP = 8
_INVALID = np.iinfo(np.int32).max


def timed(fn, args, n=8, name=''):
    try:
        np.asarray(fn(*args))
    except Exception as e:
        print(f'{name:52s} FAILED: {str(e)[:140]}', flush=True)
        return
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / n
    per_op = (dt * 1e3 - 29.0 / K_REP) / K_REP  # subtract amortized floor
    print(f'{name:52s} {dt * 1e3:9.2f} ms/call  ~{dt * 1e3 / K_REP:7.2f} '
          f'ms/op', flush=True)


def repeat_scan(op, k=K_REP):
    """Run op(i) K times with data-dependent perturbation, sum results."""
    def fn(*args):
        def body(carry, i):
            return carry + op(i, *args), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
        return out
    return jax.jit(fn)


def main():
    rng = np.random.RandomState(0)
    for grid, v, tag in [((41, 1600, 1408), 16000, 'grid0 16k'),
                         ((41, 1600, 1408), 40000, 'grid0 40k')]:
        nz, ny, nx = grid
        cells = nz * ny * nx
        cs = []
        for _ in range(B):
            hset = np.unique(rng.randint(0, cells, 2 * v))[:v]
            cs.append(np.sort(hset))
        h = jnp.asarray(np.stack(cs).astype(np.int32))      # (B, V)
        coords = jnp.stack([h // (ny * nx), (h % (ny * nx)) // nx, h % nx],
                           -1)
        valid = jnp.ones((B, v), bool)
        print(f'--- {tag} ---', flush=True)

        # A: dense table build alone
        def build_op(i, c, vl):
            t = jax.vmap(partial(rb.build_dense_table, grid=grid))(
                c + (i - i), vl)
            return t[:, ::1001].sum().astype(jnp.float32)
        timed(repeat_scan(build_op), (coords, valid), name='A table build')

        # B: 26-query gather into a PREBUILT table
        table = jax.vmap(partial(rb.build_dense_table, grid=grid))(
            coords, valid)
        offs = jnp.asarray([(dz, dy, dx) for dz in (-1, 0, 1)
                            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                            if (dz, dy, dx) != (0, 0, 0)], jnp.int32)

        def query_op(i, tb, c, vl):
            nbr = c[:, :, None, :] + offs[None, None, :, :]
            ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < nz)
                  & (nbr[..., 1] >= 0) & (nbr[..., 1] < ny)
                  & (nbr[..., 2] >= 0) & (nbr[..., 2] < nx)
                  & vl[:, :, None])
            q = (nbr[..., 0] * ny + nbr[..., 1]) * nx + nbr[..., 2]
            q = jnp.where(ok, q, cells) + (i - i)
            r = jax.vmap(lambda t, qq: t[qq.reshape(-1)])(tb, q)
            return r.sum().astype(jnp.float32)
        timed(repeat_scan(query_op), (table, coords, valid),
              name='B 26-query gather (prebuilt table)')

        # C: mirror scatter alone (the halved build's second half)
        j = jnp.asarray(rng.randint(-1, v, (B, v, 13)).astype(np.int32))

        def scatter_op(i, jj):
            def one(jrow):
                rbk = jnp.full((v, 27), -1, jnp.int32)
                i_idx = jnp.broadcast_to(
                    jnp.arange(v, dtype=jnp.int32)[:, None], (v, 13))
                kk = jnp.broadcast_to(jnp.arange(13)[None, :], (v, 13))
                row = jnp.where(jrow >= 0, jrow, v)
                return rbk.at[row, 26 - kk].set(i_idx, mode='drop')
            r = jax.vmap(one)(jj + (i - i))
            return r.sum().astype(jnp.float32)
        timed(repeat_scan(scatter_op), (j,), name='C mirror scatter (13 cols)')

        # D: full halved build
        def halved_op(i, c, vl):
            r = jax.vmap(partial(rb.subm_rulebook_halved, grid=grid))(
                c + (i - i), vl)
            return r.sum().astype(jnp.float32)
        timed(repeat_scan(halved_op), (coords, valid), name='D halved full')

        # E: full build via 26-query (build + query)
        def full26_op(i, c, vl):
            tb = jax.vmap(partial(rb.build_dense_table, grid=grid))(
                c + (i - i), vl)
            nbr = c[:, :, None, :] + offs[None, None, :, :]
            ok = ((nbr[..., 0] >= 0) & (nbr[..., 0] < nz)
                  & (nbr[..., 1] >= 0) & (nbr[..., 1] < ny)
                  & (nbr[..., 2] >= 0) & (nbr[..., 2] < nx)
                  & vl[:, :, None])
            q = (nbr[..., 0] * ny + nbr[..., 1]) * nx + nbr[..., 2]
            q = jnp.where(ok, q, cells)
            r = jax.vmap(lambda t, qq: t[qq.reshape(-1)])(tb, q)
            return r.sum().astype(jnp.float32)
        timed(repeat_scan(full26_op), (coords, valid),
              name='E full26 (build+query)')


if __name__ == '__main__':
    main()
