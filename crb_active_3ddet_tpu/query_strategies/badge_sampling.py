"""BADGE sampling. Parity: ``pcdet/query_strategies/badge_sampling.py`` —
pass 1 (:73-108): per-anchor argmax RPN labels over the pool; pass 2
(:157-168): per-frame RPN cls loss against those hypothetical labels,
backprop, collect ``dense_head.conv_cls.weight.grad``; kmeans++ on the grad
embeddings (:196).

TPU-first: pass 2 is a jitted ``jax.grad`` over a batch-1 forward per frame
— no Python-side autograd state; the conv_cls kernel grad is read out of the
grad pytree.  Quirk preserved: hypothetical labels are argmax class indices
(0..C-1) fed directly as box_cls_labels, so class 0 acts as background.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.cluster import kmeans_plusplus

from ..models.dense_heads import anchor_head_single as ahs
from ..runtime.train import host_to_device_batch, prepare_device_batch
from .strategy import Strategy


class BadgeSampling(Strategy):
    def _build_grad_fn(self):
        dataset = self.unlabelled_set
        model = self.model
        voxel_cfg = dataset.voxel_cfg
        grid_size = tuple(int(g) for g in dataset.grid_size)
        pcr = tuple(float(x) for x in dataset.point_cloud_range)
        vs = tuple(float(v) for v in dataset.voxel_size)
        core = ahs.make_core(self.cfg.MODEL.DENSE_HEAD, self.num_class,
                             tuple(self.cfg.CLASS_NAMES),
                             np.asarray(dataset.grid_size),
                             list(dataset.point_cloud_range))

        @jax.jit
        def grad_fn(variables, host_batch, hyp_labels):
            batch = prepare_device_batch(host_batch, voxel_cfg, grid_size,
                                         pcr, vs)

            def loss_fn(params):
                out = model.apply(
                    {'params': params,
                     'batch_stats': variables['batch_stats']},
                    batch, training=False)
                new_data = {'cls_preds': out['cls_preds'],
                            'box_cls_labels': hyp_labels}
                return ahs.get_cls_layer_loss(out, core, new_data=new_data)

            grads = jax.grad(loss_fn)(variables['params'])
            return grads['dense_head']['conv_cls']['kernel']

        return grad_fn

    def query(self, leave_pbar=True, cur_epoch=None):
        emb_path = os.path.join(self.active_label_dir,
                                f'grad_embeddings_epoch_{cur_epoch}.pkl')
        if os.path.isfile(emb_path):
            with open(emb_path, 'rb') as f:
                cached = pickle.load(f)
            grad_embeddings, frame_ids = cached['embeddings'], cached['frame_ids']
        else:
            # pass 1: pool scan for bookkeeping + hypothetical rpn labels
            records = self.scan_pool(signals=())  # bookkeeping
            hyp = {}
            rng = jax.random.PRNGKey(17)
            for batch in self.unlabelled_loader:
                host_batch = host_to_device_batch(batch)
                rng, sub = jax.random.split(rng)
                out = self._rpn_labels(host_batch, rng=sub)
                for i, fid in enumerate(batch['frame_id']):
                    hyp[fid] = np.asarray(out[i])
            # pass 2: per-frame grads (batch-1)
            grad_fn = self._build_grad_fn()
            frame_ids, grads = [], []
            for fid, info in self.pairs:
                sample = self._load_single(fid)
                g = grad_fn(self.variables, sample, jnp.asarray(hyp[fid])[None])
                grads.append(np.asarray(g).reshape(-1))
                frame_ids.append(fid)
            grad_embeddings = np.stack(grads)
            self.save_active_labels(
                grad_embeddings={'embeddings': grad_embeddings,
                                 'frame_ids': frame_ids},
                cur_epoch=cur_epoch)

        n = self.cfg.ACTIVE_TRAIN.SELECT_NUMS
        _, selected_idx = kmeans_plusplus(
            grad_embeddings.astype(np.float64), n_clusters=n, random_state=0)
        return [frame_ids[i] for i in selected_idx]

    # -- helpers --
    def _rpn_labels(self, host_batch, rng=None):
        """argmax per-anchor class of the rpn head (pass-1 hypothetical).

        Parity: the reference runs pass 1 with ``model.eval()`` +
        ``enable_dropout`` (badge_sampling.py:45-59,73-88) — eval-mode BN but
        LIVE dropout.  Here: training=False with a 'dropout' rng, which our
        modules read as deterministic=False (``has_rng('dropout')``)."""
        if not hasattr(self, '_rpn_label_fn'):
            dataset = self.unlabelled_set
            model = self.model
            voxel_cfg = dataset.voxel_cfg
            grid_size = tuple(int(g) for g in dataset.grid_size)
            pcr = tuple(float(x) for x in dataset.point_cloud_range)
            vs = tuple(float(v) for v in dataset.voxel_size)

            @jax.jit
            def fn(variables, hb, r):
                batch = prepare_device_batch(hb, voxel_cfg, grid_size, pcr, vs)
                out = model.apply(variables, batch, training=False,
                                  rngs={'dropout': r})
                b = out['rpn_preds'].shape[0]
                logits = out['rpn_preds'].reshape(b, -1, self.num_class)
                return logits.argmax(-1).astype(jnp.int32)

            self._rpn_label_fn = fn
        if rng is None:
            rng = jax.random.PRNGKey(17)
        return self._rpn_label_fn(self.variables, host_batch, rng)

    def _load_single(self, frame_id):
        """Batch-1 host batch for one frame id (eval-mode pipeline)."""
        ds = self.unlabelled_set
        idx = [p[0] for p in self.pairs].index(frame_id)
        sample = ds[idx]
        batch = ds.collate_batch([sample])
        return host_to_device_batch(batch)
