"""Compare rulebook lookup strategies on the real chip at KITTI grid0 scale.

Candidates for (V=16k voxels) x (27 offsets) neighbor lookup on a
(41,1600,1408)=92M-cell grid, batch 4:
  a) dense table gather (current)
  b) searchsorted over the 16k sorted hashes (table fits in cache)
  c) sort-merge join of in-hashes + query-hashes
Plus: small-grid dense table, final-grid scatter, batch-8 gather-GEMM.
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
    print(f'{name:44s} {sorted(ts)[n // 2] * 1e3:9.2f} ms', flush=True)


def main():
    rng = np.random.RandomState(0)
    coords = np.stack([
        rng.randint(0, 20, (B, V)),
        rng.randint(0, GRID0[1], (B, V)),
        rng.randint(0, GRID0[2], (B, V))], axis=-1).astype(np.int32)
    valid = np.ones((B, V), bool)
    cj, vj = jnp.asarray(coords), jnp.asarray(valid)

    # (a) current: dense table + gather
    def dense_lookup(c, v):
        look = jax.vmap(partial(rb.lookup_neighbors, grid=GRID0,
                                kernel_size=(3, 3, 3), stride=(1, 1, 1),
                                padding=(1, 1, 1)))(c, v, c, v)
        return jnp.sum(look)
    timed(jax.jit(dense_lookup), (cj, vj), name='(a) dense-table lookup')

    # (b) searchsorted over sorted in-hashes
    def ss_lookup(c, v):
        def one(c1, v1):
            h = rb.hash_coords(c1, v1, GRID0)
            perm = jnp.argsort(h)
            sh = h[perm]
            q = rb._neighbor_hashes(c1, v1, GRID0, (3, 3, 3), (1, 1, 1),
                                    (1, 1, 1))
            pos = jnp.searchsorted(sh, q)
            pos = jnp.clip(pos, 0, V - 1)
            found = (sh[pos] == q) & (q != INVALID)
            return jnp.where(found, perm[pos], -1)
        return jnp.sum(jax.vmap(one)(c, v))
    timed(jax.jit(ss_lookup), (cj, vj), name='(b) searchsorted lookup')

    # (c) sort-merge join: sort [in_hashes | query_hashes] together
    def sm_lookup(c, v):
        def one(c1, v1):
            h = rb.hash_coords(c1, v1, GRID0)                    # (V,)
            q = rb._neighbor_hashes(c1, v1, GRID0, (3, 3, 3), (1, 1, 1),
                                    (1, 1, 1)).reshape(-1)       # (V*K,)
            nq = q.shape[0]
            keys = jnp.concatenate([h, q])
            # payload: for in rows, their index; for queries, -1
            payload = jnp.concatenate([
                jnp.arange(V, dtype=jnp.int32),
                jnp.full((nq,), -1, jnp.int32)])
            # stable sort with in-rows first at equal keys: sort by
            # (key, is_query) — pack into int64
            is_q = jnp.concatenate([jnp.zeros((V,), jnp.int32),
                                    jnp.ones((nq,), jnp.int32)])
            order = jnp.argsort(keys.astype(jnp.int64) * 2 + is_q)
            sk = keys[order]
            sp = payload[order]
            # propagate last seen in-row index forward
            def scanf(carry, x):
                k_prev, idx_prev = carry
                k, p = x
                idx = jnp.where(p >= 0, p, jnp.where(k == k_prev, idx_prev, -1))
                kk = jnp.where(p >= 0, k, k_prev)
                return (kk, idx), idx
            (_, _), filled = jax.lax.scan(
                scanf, (jnp.int32(-1), jnp.int32(-1)), (sk, sp))
            # gather back query answers
            res = jnp.full((V + nq,), -1, jnp.int32).at[order].set(filled)
            ans = res[V:]
            ans = jnp.where(q != INVALID, ans, -1)
            return ans.reshape(V, K)
        return jnp.sum(jax.vmap(one)(c, v))
    timed(jax.jit(sm_lookup), (cj, vj), name='(c) sort-merge lookup (scan)')

    # (b2) searchsorted, queries already deduped? same cost class; skip.

    # small-grid dense table at grid2 (11.8M cells)
    GRID2 = (21, 800, 704)
    c2 = np.stack([rng.randint(0, g, (B, V)) for g in GRID2], -1).astype(np.int32)
    c2j = jnp.asarray(c2)

    def dense_lookup2(c, v):
        look = jax.vmap(partial(rb.lookup_neighbors, grid=GRID2,
                                kernel_size=(3, 3, 3), stride=(1, 1, 1),
                                padding=(1, 1, 1)))(c, v, c, v)
        return jnp.sum(look)
    timed(jax.jit(dense_lookup2), (c2j, vj), name='dense-table lookup grid2 (12M)')

    GRID3 = (11, 400, 352)
    c3 = np.stack([rng.randint(0, g, (B, V)) for g in GRID3], -1).astype(np.int32)
    c3j = jnp.asarray(c3)

    def dense_lookup3(c, v):
        look = jax.vmap(partial(rb.lookup_neighbors, grid=GRID3,
                                kernel_size=(3, 3, 3), stride=(1, 1, 1),
                                padding=(1, 1, 1)))(c, v, c, v)
        return jnp.sum(look)
    timed(jax.jit(dense_lookup3), (c3j, vj), name='dense-table lookup grid3 (1.5M)')

    # searchsorted at grid3 for comparison
    def ss3(c, v):
        def one(c1, v1):
            h = rb.hash_coords(c1, v1, GRID3)
            perm = jnp.argsort(h)
            sh = h[perm]
            q = rb._neighbor_hashes(c1, v1, GRID3, (3, 3, 3), (1, 1, 1),
                                    (1, 1, 1))
            pos = jnp.clip(jnp.searchsorted(sh, q), 0, V - 1)
            found = (sh[pos] == q) & (q != INVALID)
            return jnp.where(found, perm[pos], -1)
        return jnp.sum(jax.vmap(one)(c, v))
    timed(jax.jit(ss3), (c3j, vj), name='searchsorted lookup grid3')

    # final-grid scatter (2, 200, 176) x 128ch
    GRIDF = (2, 200, 176)
    cf = np.stack([rng.randint(0, g, (B, V)) for g in GRIDF], -1).astype(np.int32)
    ff = jnp.asarray(rng.randn(B, V, 128), jnp.float32)
    from crb_active_3ddet_tpu.ops.sparse.sparse_ops import sparse_tensor_to_dense
    f = jax.jit(lambda fe, cc, vv: jnp.sum(jax.vmap(
        partial(sparse_tensor_to_dense, grid=GRIDF))(fe, cc, vv)))
    timed(f, (ff, jnp.asarray(cf), vj), name='sparse->dense final (70k cells)')

    # batch-8 gather-GEMM 64ch
    B8 = 8
    rulebook = np.where(rng.rand(B8, V, K) < 0.3,
                        rng.randint(0, V, (B8, V, K)), -1).astype(np.int32)
    feats = jnp.asarray(rng.randn(B8, V, 64), jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, 64, 64), jnp.bfloat16)

    def layer(feats, rbk_, w):
        b, v, c = feats.shape
        flat = jnp.concatenate(
            [feats.reshape(b * v, c), jnp.zeros((1, c), feats.dtype)], 0)
        off = (jnp.arange(b, dtype=jnp.int32) * v)[:, None, None]
        idx = jnp.where(rbk_ >= 0, rbk_ + off, b * v)
        g = flat[idx.reshape(-1)]
        out = jnp.dot(g.reshape(b * v, K * c), w.reshape(K * c, -1),
                      preferred_element_type=jnp.float32)
        return jnp.sum(out)
    timed(jax.jit(layer), (feats, jnp.asarray(rulebook), w),
          name='gather-GEMM 64ch batch8')

    # chained x8 gather-GEMM (amortize RPC floor): how fast is one layer
    def layer8(feats, rbk_, w):
        b, v, c = feats.shape
        def body(f, _):
            flat = jnp.concatenate(
                [f.reshape(b * v, c), jnp.zeros((1, c), f.dtype)], 0)
            off = (jnp.arange(b, dtype=jnp.int32) * v)[:, None, None]
            idx = jnp.where(rbk_ >= 0, rbk_ + off, b * v)
            g = flat[idx.reshape(-1)]
            out = jnp.dot(g.reshape(b * v, K * c), w.reshape(K * c, -1),
                          preferred_element_type=jnp.float32)
            return out.astype(f.dtype).reshape(b, v, c), ()
        f8, _ = jax.lax.scan(body, feats, None, length=8)
        return jnp.sum(f8.astype(jnp.float32))
    timed(jax.jit(layer8), (feats, jnp.asarray(rulebook), w),
          name='gather-GEMM 64ch batch8 x8 chained')


if __name__ == '__main__':
    main()
