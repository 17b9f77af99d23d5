"""Microbench v2: the all-sparse backbone's index ops at real sizes."""
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
GRID0 = (41, 1600, 1408)
GRID1 = (21, 800, 704)
GRID2 = (11, 400, 352)
GRID3 = (5, 200, 176)


def timed(fn, args, n=16, name=''):
    float(fn(*args))
    # pipelined: dispatch n, sync once — amortizes the ~27ms RPC floor
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        float(o)
    dt = (time.perf_counter() - t0) / n
    print(f'{name:44s} {dt * 1e3:9.2f} ms', flush=True)


def coords_for(grid, v, rng):
    c = np.stack([rng.randint(0, min(grid[0], 20), (B, v)),
                  rng.randint(0, grid[1], (B, v)),
                  rng.randint(0, grid[2], (B, v))], -1).astype(np.int32)
    return jnp.asarray(c), jnp.ones((B, v), bool)


def main():
    rng = np.random.RandomState(0)
    for grid, v, tag in [(GRID0, 16000, 'grid0 16k'),
                         (GRID1, 12000, 'grid1 12k'),
                         (GRID2, 6400, 'grid2 6.4k'),
                         (GRID3, 4000, 'grid3 4k')]:
        c, vl = coords_for(grid, v, rng)
        f = jax.jit(lambda cc, vv, g=grid: jnp.sum(jax.vmap(
            partial(rb.subm_rulebook_halved, grid=g))(cc, vv)))
        timed(f, (c, vl), name=f'subm_rulebook_halved {tag}')

    for grid, v, mo, tag in [(GRID0, 16000, 12000, 'grid0->1'),
                             (GRID1, 12000, 6400, 'grid1->2'),
                             (GRID2, 6400, 4000, 'grid2->3')]:
        c, vl = coords_for(grid, v, rng)
        f = jax.jit(lambda cc, vv, g=grid, m=mo: jnp.sum(jax.vmap(
            partial(rb.downsample_rulebook, grid=g, kernel_size=(3, 3, 3),
                    stride=(2, 2, 2), padding=(1, 1, 1), max_out=m))(
            cc, vv)[2]))
        timed(f, (c, vl), name=f'downsample_rulebook {tag}')

    # gather-GEMM at per-stage sizes (27 offsets, bf16)
    for v, cin, cout, nl, tag in [(16000, 16, 16, 2, 'stage1 16ch x2'),
                                  (12000, 32, 32, 3, 'stage2 32ch x3'),
                                  (6400, 64, 64, 3, 'stage3 64ch x3'),
                                  (4000, 64, 64, 3, 'stage4 64ch x3')]:
        rbk = np.where(rng.rand(B, v, 27) < 0.3,
                       rng.randint(0, v, (B, v, 27)), -1).astype(np.int32)
        feats = jnp.asarray(rng.randn(B, v, cin), jnp.bfloat16)
        w = jnp.asarray(rng.randn(27, cin, cout), jnp.bfloat16)

        def layers(feats, rbk_, w, n=nl):
            b, vv, c = feats.shape
            x = feats
            for _ in range(n):
                flat = jnp.concatenate(
                    [x.reshape(b * vv, c), jnp.zeros((1, c), x.dtype)], 0)
                off = (jnp.arange(b, dtype=jnp.int32) * vv)[:, None, None]
                idx = jnp.where(rbk_ >= 0, rbk_ + off, b * vv)
                g = flat[idx.reshape(-1)]
                x = jnp.dot(g.reshape(b * vv, 27 * c), w.reshape(27 * c, -1),
                            preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16).reshape(b, vv, -1)
            return jnp.sum(x.astype(jnp.float32))
        timed(jax.jit(layers), (feats, jnp.asarray(rbk), w),
              name=f'gather-GEMM {tag}')


if __name__ == '__main__':
    main()
