"""Coreset (k-center greedy). Parity:
``pcdet/query_strategies/coreset_sampling.py`` — furthest-first on model
embeddings of unlabelled vs labelled pools (:31-50; pairwise dists :13-29).

Embeddings come from the model's ``shared_features`` output (PV-RCNN shared
FC); single-stage models fall back to mean-pooled BEV features exported as
``embeddings`` by the pool pass."""

from __future__ import annotations

import numpy as np

from .strategy import Strategy


def pairwise_squared_distances(x, y):
    x = x.reshape(x.shape[0], -1)
    y = y.reshape(y.shape[0], -1)
    x_norm = (x ** 2).sum(1)[:, None]
    y_norm = (y ** 2).sum(1)[None, :]
    dist = x_norm + y_norm - 2.0 * x @ y.T
    dist = np.nan_to_num(dist, nan=0.0)
    return np.clip(dist, 0.0, None)


def furthest_first(X, X_set, n):
    """Greedy k-center: parity with ``coreset_sampling.furthest_first``
    (seed distance = MEAN distance to the labelled set, like the reference)."""
    dist_ctr = pairwise_squared_distances(X, X_set)
    min_dist = dist_ctr.mean(axis=1)
    idxs = []
    for i in range(n):
        idx = int(np.argmax(min_dist))
        idxs.append(idx)
        if i < n - 1:
            dist_new = pairwise_squared_distances(X, X[idx:idx + 1])
            min_dist = np.minimum(min_dist, dist_new[:, 0])
    return idxs


class CoresetSampling(Strategy):
    def query(self, leave_pbar=True, cur_epoch=None):
        unlabeled = self.scan_pool(signals=('embeddings',))
        unlabeled_ids = list(unlabeled.keys())
        unlabeled_emb = np.stack([unlabeled[f]['embeddings']
                                  for f in unlabeled_ids])
        # labelled pool pass (no bookkeeping overwrite)
        labeled_emb = []
        import jax
        rng = jax.random.PRNGKey(1)
        from ..runtime.train import host_to_device_batch
        for batch in self.labelled_loader:
            rng, sub = jax.random.split(rng)
            sig = self._score_fns[(False, 0, frozenset(('embeddings',)))](
                self.variables, host_to_device_batch(batch), sub)
            labeled_emb.append(np.asarray(sig['embeddings']))
        labeled_emb = np.concatenate(labeled_emb, axis=0)
        idxs = furthest_first(unlabeled_emb, labeled_emb,
                              n=self.cfg.ACTIVE_TRAIN.SELECT_NUMS)
        return [unlabeled_ids[i] for i in idxs]
