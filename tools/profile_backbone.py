"""Microbench of VoxelBackBone8x internals on the current chip.

Isolates: RPC floor, dense-table build, subm rulebook lookup, one
gather-GEMM layer at each channel width, downsample_coords, the dense-masked
stage-3/4 convs.  All timings are host-synced via a scalar fetch.
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

B, V = 4, 16000
GRID0 = (41, 1600, 1408)


def timed(fn, args, n=8, name=''):
    float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f'{name:40s} {sorted(ts)[n // 2] * 1e3:9.2f} ms', flush=True)


def main():
    rng = np.random.RandomState(0)
    # realistic active coords: cluster near the ground plane like KITTI
    coords = np.stack([
        rng.randint(0, 20, (B, V)),        # z concentrated low
        rng.randint(0, GRID0[1], (B, V)),
        rng.randint(0, GRID0[2], (B, V))], axis=-1).astype(np.int32)
    valid = np.ones((B, V), bool)
    coords_j = jnp.asarray(coords)
    valid_j = jnp.asarray(valid)

    # RPC floor
    x_small = jnp.ones((8, 128))
    timed(jax.jit(lambda x: jnp.sum(x * 1.0001)), (x_small,), name='RPC floor (tiny add)')

    # dense table build on the 92M grid
    f = jax.jit(lambda c, v: jnp.sum(jax.vmap(
        partial(rb.build_dense_table, grid=GRID0))(c, v)))
    timed(f, (coords_j, valid_j), name='build_dense_table grid0 x4')

    # subm rulebook (table + 27-offset lookup)
    def rbk(c, v):
        table = jax.vmap(partial(rb.build_dense_table, grid=GRID0))(c, v)
        look = jax.vmap(partial(rb.lookup_neighbors, grid=GRID0,
                                kernel_size=(3, 3, 3), stride=(1, 1, 1),
                                padding=(1, 1, 1)))(c, v, c, v, table=table)
        return jnp.sum(look)
    timed(jax.jit(rbk), (coords_j, valid_j), name='table+subm rulebook grid0')

    # one gather-GEMM layer at 16 / 32 / 64 channels (bf16)
    rulebook = np.where(rng.rand(B, V, 27) < 0.3,
                        rng.randint(0, V, (B, V, 27)), -1).astype(np.int32)
    rulebook_j = jnp.asarray(rulebook)
    for cin, cout in [(16, 16), (32, 32), (64, 64)]:
        feats = jnp.asarray(rng.randn(B, V, cin), jnp.bfloat16)
        w = jnp.asarray(rng.randn(27, cin, cout), jnp.bfloat16)

        def layer(feats, rbk_, w):
            b, v, c = feats.shape
            flat = jnp.concatenate(
                [feats.reshape(b * v, c), jnp.zeros((1, c), feats.dtype)], 0)
            off = (jnp.arange(b, dtype=jnp.int32) * v)[:, None, None]
            idx = jnp.where(rbk_ >= 0, rbk_ + off, b * v)
            g = flat[idx.reshape(-1)]
            out = jnp.dot(g.reshape(b * v, 27 * c),
                          w.reshape(27 * c, -1),
                          preferred_element_type=jnp.float32)
            return jnp.sum(out)
        timed(jax.jit(layer), (feats, rulebook_j, w),
              name=f'gather-GEMM {cin}->{cout} (27 offsets)')

    # downsample_coords (strided conv active-site dedup)
    f = jax.jit(lambda c, v: jnp.sum(jax.vmap(partial(
        rb.downsample_coords, grid=GRID0, kernel_size=(3, 3, 3),
        stride=(2, 2, 2), padding=(1, 1, 1), max_out=V))(c, v)[0]))
    timed(f, (coords_j, valid_j), name='downsample_coords grid0')

    # strided rulebook on grid0 (uses dense table)
    def rbk_strided(c, v):
        look = jax.vmap(partial(rb.lookup_neighbors, grid=GRID0,
                                kernel_size=(3, 3, 3), stride=(2, 2, 2),
                                padding=(1, 1, 1)))(c, v, c, v)
        return jnp.sum(look)
    timed(jax.jit(rbk_strided), (coords_j, valid_j),
          name='strided rulebook grid0 (own table)')

    # dense-masked stage 3: conv3d 64->64 on (B, 11, 400, 352, 64) bf16
    for shape, ch, name in [
            ((B, 11, 400, 352), 64, 'dense conv3 64ch 11x400x352'),
            ((B, 6, 200, 176), 64, 'dense conv4 64ch 6x200x176')]:
        x = jnp.asarray(rng.randn(*shape, ch), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 3, ch, ch), jnp.bfloat16)

        def dense_conv(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
                preferred_element_type=jnp.float32)
            return jnp.sum(y)
        timed(jax.jit(dense_conv), (x, w), name=name)

    # sparse_tensor_to_dense scatter at grid3
    grid3 = (11, 400, 352)
    c3 = np.stack([rng.randint(0, g, (B, V)) for g in grid3], -1).astype(np.int32)
    f3 = jnp.asarray(rng.randn(B, V, 64), jnp.float32)
    from crb_active_3ddet_tpu.ops.sparse.sparse_ops import sparse_tensor_to_dense
    f = jax.jit(lambda ff, cc, vv: jnp.sum(jax.vmap(
        partial(sparse_tensor_to_dense, grid=grid3))(ff, cc, vv)))
    timed(f, (f3, jnp.asarray(c3), valid_j), name='sparse->dense grid3')


if __name__ == '__main__':
    main()
