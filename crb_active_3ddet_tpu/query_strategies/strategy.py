"""Strategy base: jitted batched pool scoring + selection bookkeeping.

Parity: ``pcdet/query_strategies/strategy.py`` (frame/info pairs :23-26,
``save_points`` :28-38, ``save_active_labels`` pickle layout :66-81, wandb
``update_dashboard`` :42-63).

TPU-first: instead of the reference's per-frame Python loop over pred_dicts,
``scan_pool`` runs ONE jitted function per batch that computes every
fixed-width per-frame signal (entropy, label histogram entropy, densities,
gt stats, MC stats, embeddings) on device; strategies then select on small
host arrays (SURVEY.md §7 "acquisition as a jitted batched pass").
"""

from __future__ import annotations

import os
import pickle
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import post_processing as pp
from ..runtime.train import prepare_device_batch, host_to_device_batch

try:
    import wandb
except Exception:  # pragma: no cover - wandb optional
    wandb = None


def _softmax_entropy(logits, valid=None):
    """Per-box softmax entropy → mean over (valid) boxes. logits: (P, C)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ent = -(jnp.exp(logp) * logp).sum(-1)  # (P,)
    if valid is None:
        return ent.mean()
    n = jnp.clip(valid.sum(), 1)
    return jnp.where(valid, ent, 0.0).sum() / n


class Strategy:
    def __init__(self, model, variables, labelled_loader, unlabelled_loader,
                 rank, active_label_dir, cfg):
        self.cfg = cfg
        self.active_label_dir = active_label_dir
        self.rank = rank
        self.model = model
        self.variables = variables
        self.labelled_loader = labelled_loader
        self.unlabelled_loader = unlabelled_loader
        self.labelled_set = labelled_loader.dataset
        self.unlabelled_set = unlabelled_loader.dataset
        self.class_names = list(cfg.CLASS_NAMES)
        self.num_class = len(self.class_names)
        self.bbox_records = {}
        self.point_measures = ['mean', 'median', 'variance']
        for met in self.point_measures:
            setattr(self, f'{met}_point_records', {})

        if hasattr(self.unlabelled_set, 'sample_id_list'):
            info_attr = 'kitti_infos' if hasattr(self.unlabelled_set, 'kitti_infos') \
                else 'infos'
            self.pairs = list(zip(self.unlabelled_set.sample_id_list,
                                  getattr(self.unlabelled_set, info_attr)))
        else:
            self.pairs = list(zip(self.unlabelled_set.frame_ids,
                                  self.unlabelled_set.infos))
        self._score_fns = {}  # keyed on (mc_dropout, num_mc)
        # shard pool scoring over all chips when the pool batch divides the
        # device count (the reference's DistributedSampler pool sharding,
        # pcdet/datasets/__init__.py:26-46, without per-rank pickle merges)
        from ..datasets import loader_batch_size
        from ..parallel import default_mesh
        self.mesh = default_mesh(loader_batch_size(unlabelled_loader))

    # ---- jitted pool scoring ------------------------------------------------
    #: signal names whose computation rides on the NMS'd predictions — when a
    #: strategy requests none of these, the scorer skips post_processing
    #: entirely (XLA prunes the NMS + density compute out of the jit)
    _PRED_SIGNALS = frozenset({'box_entropy', 'label_entropy', 'pred_density',
                               'pred_labels', 'pred_valid'})

    def build_score_fn(self, mc_dropout: bool = False, num_mc: int = 0,
                       signals=None):
        """Jitted (variables, host_batch, rng) → per-frame signal dict.

        ``signals``: optional iterable of signal names to emit — the slim
        scorer variant (VERDICT r4 #1).  None keeps every fixed-width signal
        (back-compat).  The per-frame gt bookkeeping stats are always
        included (``save_points`` consumes them for the dashboard parity
        surfaces).  Requesting fewer signals lets XLA dead-code-eliminate
        the corresponding compute: e.g. coreset/llal/confidence need no NMS
        at all, so the whole post-processing graph drops out of their pool
        scan."""
        dataset = self.unlabelled_set
        model = self.model
        post_cfg = self.cfg.MODEL.POST_PROCESSING
        num_class = self.num_class
        voxel_cfg = dataset.voxel_cfg
        grid_size = tuple(int(g) for g in dataset.grid_size)
        pcr = tuple(float(x) for x in dataset.point_cloud_range)
        vs = tuple(float(v) for v in dataset.voxel_size)
        want = None if signals is None else frozenset(signals)

        def wanted(name):
            return want is None or name in want

        def score(variables, host_batch, rng):
            batch = prepare_device_batch(host_batch, voxel_cfg, grid_size,
                                         pcr, vs)
            if mc_dropout and num_mc > 1:
                # MC-dropout rounds: eval-mode forward with live dropout rngs
                # (parity: SAMPLING_ROUND re-runs, pvrcnn_head.py:188-202)
                first = model.apply(variables, batch, training=False,
                                    rngs={'dropout': rng})
                if 'rcnn_cls' in first and first['rcnn_cls'].ndim == 3:
                    # two-stage model: MC rounds already ran inside the roi
                    # head — rcnn_cls/(S, B·R, 1)
                    out = dict(first)
                    mc_cls = jax.nn.sigmoid(out['rcnn_cls'])
                    b = out['batch_cls_preds'].shape[0]
                    out['mc_cls_mean'] = mc_cls.mean(0).reshape(b, -1, 1)
                    out['mc_cls_var'] = mc_cls.var(0).reshape(b, -1, 1)
                    out['mc_box_var'] = out['rcnn_reg'].var(0).reshape(
                        b, -1, out['rcnn_reg'].shape[-1])
                    # MC-mean rcnn scores (detector3d_template.py:208-210)
                    out['batch_rcnn_cls'] = out['mc_cls_mean']
                    out['batch_rcnn_reg'] = out['rcnn_reg'].mean(0).reshape(
                        b, -1, out['rcnn_reg'].shape[-1])
                else:
                    rngs = jax.random.split(rng, num_mc)
                    outs = [first] + [
                        model.apply(variables, batch, training=False,
                                    rngs={'dropout': r}) for r in rngs[1:]]
                    out = dict(first)
                    mc_cls = jnp.stack([jax.nn.sigmoid(o['batch_cls_preds'])
                                        for o in outs])   # (S, B, A, C)
                    mc_box = jnp.stack([o['batch_box_preds'] for o in outs])
                    out['mc_cls_mean'] = mc_cls.mean(0)
                    out['mc_cls_var'] = mc_cls.var(0)
                    out['mc_box_var'] = mc_box.var(0)
                    out['batch_cls_preds'] = (
                        jax.scipy.special.logit(
                            jnp.clip(out['mc_cls_mean'], 1e-6, 1 - 1e-6)))
            elif mc_dropout:
                # single dropout-live forward (BALD: model.eval() +
                # enable_dropout, bald_sampling.py:23-25, one pass)
                out = model.apply(variables, batch, training=False,
                                  rngs={'dropout': rng})
            else:
                out = model.apply(variables, batch, training=False)

            need_preds = want is None or bool(want & self._PRED_SIGNALS)
            preds = pp.post_processing(out, post_cfg, num_class=num_class) \
                if need_preds else None

            signals = {}
            if wanted('box_entropy'):
                # frame-level predictive entropy over kept-box logits
                signals['box_entropy'] = jax.vmap(_softmax_entropy)(
                    preds['pred_logits'], preds['pred_valid'])
            # CRB stage-1: Shannon entropy of the predicted label histogram.
            # Reference quirk (crb_sampling.py:86-93): absent classes get a
            # pseudo-count of 1 (`unique_proportions = torch.ones(num_class)`)
            # before Categorical normalization; empty frames score 0.
            def label_hist_entropy(labels, valid):
                onehot = jax.nn.one_hot(labels - 1, num_class) * valid[:, None]
                counts = onehot.sum(0)
                hist = jnp.maximum(counts, 1.0)
                p = hist / hist.sum()
                ent = -(p * jnp.log(p)).sum()
                return jnp.where(valid.any(), ent, 0.0)
            if wanted('label_entropy'):
                signals['label_entropy'] = jax.vmap(label_hist_entropy)(
                    preds['pred_labels'], preds['pred_valid'])
            if wanted('confidence_entropy'):
                # all-anchor confidence entropy (confidence strategy)
                cls_sig = jax.nn.sigmoid(out['batch_cls_preds'])
                signals['confidence_entropy'] = jax.vmap(
                    lambda s: _softmax_entropy(s))(cls_sig)
            if wanted('pred_density'):
                signals['pred_density'] = preds['pred_box_unique_density']
            if wanted('pred_labels'):
                signals['pred_labels'] = preds['pred_labels']
            if wanted('pred_valid'):
                signals['pred_valid'] = preds['pred_valid']
            if mc_dropout and num_mc > 1:
                if wanted('mc_cls_var'):
                    signals['mc_cls_var'] = out['mc_cls_var'].mean(axis=(1, 2))
                if wanted('mc_box_var'):
                    signals['mc_box_var'] = out['mc_box_var'].mean(axis=(1, 2))
                if 'batch_rcnn_cls' in out and wanted('batch_rcnn_cls'):
                    # CRB stage-2 hypothetical targets: the MC-mean rcnn
                    # outputs (reference crb_sampling.py:97-99 caches
                    # batch_rcnn_cls/batch_rcnn_reg per frame)
                    signals['batch_rcnn_cls'] = out['batch_rcnn_cls']
                    signals['batch_rcnn_reg'] = out['batch_rcnn_reg']
            if 'loss_predictions' in out and wanted('loss_predictions'):
                signals['loss_predictions'] = out['loss_predictions'].reshape(-1)
            if wanted('embeddings'):
                if 'shared_features' in out:
                    b = out['batch_cls_preds'].shape[0]
                    signals['embeddings'] = out['shared_features'].reshape(
                        b, -1)
                else:
                    # single-stage fallback for coreset: mean-pooled BEV feats
                    signals['embeddings'] = out['spatial_features_2d'].mean(
                        axis=(1, 2))
            # bookkeeping gt stats (dashboard parity)
            gt_stats = jax.vmap(partial(pp.gt_class_stats,
                                        num_classes=num_class))(
                batch['points'], batch['points_valid'], batch['gt_boxes'])
            signals.update(gt_stats)
            return signals

        if self.mesh is not None:
            from ..parallel import batch_sharding, replicated
            return jax.jit(score,
                           in_shardings=(replicated(self.mesh),
                                         batch_sharding(self.mesh),
                                         replicated(self.mesh)),
                           out_shardings=replicated(self.mesh))
        return jax.jit(score)

    def scan_pool(self, mc_dropout=False, num_mc=0, rng=None, loader=None,
                  signals=None):
        """Run the jitted scorer over the whole unlabelled pool.

        Returns dict frame_id → {signal: np.array}, in pool order.
        ``signals`` selects the slim scorer variant (see build_score_fn).
        """
        loader = loader if loader is not None else self.unlabelled_loader
        want = None if signals is None else frozenset(signals)
        key = (bool(mc_dropout), int(num_mc), want)
        if key not in self._score_fns:
            self._score_fns[key] = self.build_score_fn(mc_dropout, num_mc,
                                                       signals=want)
        score_fn = self._score_fns[key]
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # pipeline: dispatch every batch first (device executes in order),
        # materialize afterwards — avoids paying the host-sync round trip
        # once per batch (measured ~27 ms on the tunneled dev chip).  A
        # one-batch-lookahead prefetch thread runs getitem/collate +
        # host→device transfer concurrently with the dispatch loop, so the
        # single-core host's collate no longer serializes against the
        # transfer RPCs of the previous batch (VERDICT r4 #1c).
        import queue
        import threading
        q = queue.Queue(maxsize=2)

        def produce():
            try:
                for batch in loader:
                    q.put((batch['frame_id'], host_to_device_batch(batch)))
                q.put(None)
            except BaseException as e:  # surface loader errors to the consumer
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        pending = []
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            frame_ids, host_batch = item
            rng, sub = jax.random.split(rng)
            pending.append((frame_ids,
                            score_fn(self.variables, host_batch, sub)))
        t.join()
        records = {}
        if not pending:
            return records
        # ONE device-side concat + ONE fetch per signal: a per-batch
        # per-signal np.asarray costs a host↔device round trip each
        # (~27 ms RPC floor on the tunneled backend × batches × signals
        # dwarfs the compute)
        all_ids = [fid for frame_ids, _ in pending for fid in frame_ids]
        keys = list(pending[0][1].keys())
        stacked = {}
        for k in keys:
            parts = [sig[k] for _, sig in pending]
            stacked[k] = np.asarray(jnp.concatenate(parts, axis=0)
                                    if len(parts) > 1 else parts[0])
        for i, fid in enumerate(all_ids):
            records[fid] = {k: stacked[k][i] for k in keys}
            self.save_points(fid, records[fid])
        return records

    # ---- bookkeeping (reference-parity surfaces) ---------------------------
    def save_points(self, frame_id, record):
        as_dict = lambda arr: {c: float(np.asarray(arr)[i])
                               for i, c in enumerate(self.class_names)}
        self.bbox_records[frame_id] = as_dict(record['num_bbox'])
        self.mean_point_records[frame_id] = as_dict(record['mean_points'])
        self.median_point_records[frame_id] = as_dict(record['median_points'])
        self.variance_point_records[frame_id] = as_dict(record['variance_points'])

    def update_dashboard(self, cur_epoch=None, accumulated_iter=None,
                         metrics=None):
        """AL selection dashboard (parity: strategy.py:42-63 wandb panels).
        ``metrics``: a MetricsLogger — tensorboard + optional wandb.  Falls
        back to a live wandb run when no logger is passed."""
        sinks = []
        if metrics is not None:
            sinks.append(metrics.add_scalar)
        elif wandb is not None and wandb.run is not None:
            sinks.append(lambda k, v, s: wandb.log({k: v}, step=s))
        if not sinks:
            return

        def log(key, value):
            for s in sinks:
                s(key, value, accumulated_iter)

        # per-stage acquisition wall-clock (SURVEY §5.1 — replaces the
        # reference's stage prints at crb_sampling.py:222,239,262)
        for k, v in getattr(self, 'stage_times', {}).items():
            log(f'active_timing/{k}', float(v))
        if not getattr(self, 'selected_bbox', None):
            return

        classes = list(self.selected_bbox[0].keys())
        total_bbox = 0
        for cls_idx in classes:
            num_cls_bbox = sum(i[cls_idx] for i in self.selected_bbox)
            log(f'active_selection/num_bbox_{cls_idx}', num_cls_bbox)
            total_bbox += num_cls_bbox
            for met in self.point_measures:
                sel = getattr(self, f'selected_{met}_points')
                val = (sum(i[cls_idx] for i in sel) / len(sel)) if num_cls_bbox else 0
                log(f'active_selection/{met}_points_{cls_idx}', val)
        log('active_selection/total_bbox_selected', total_bbox)

    def save_active_labels(self, selected_frames=None, grad_embeddings=None,
                           cur_epoch=None):
        if selected_frames is not None:
            self.selected_bbox = [self.bbox_records[i] for i in selected_frames]
            for met in self.point_measures:
                setattr(self, f'selected_{met}_points',
                        [getattr(self, f'{met}_point_records')[i]
                         for i in selected_frames])
            path = os.path.join(
                self.active_label_dir,
                f'selected_frames_epoch_{cur_epoch}_rank_{self.rank}.pkl')
            with open(path, 'wb') as f:
                pickle.dump({
                    'frame_id': selected_frames,
                    'selected_mean_points': self.selected_mean_points,
                    'selected_bbox': self.selected_bbox,
                    'selected_median_points': self.selected_median_points,
                    'selected_variance_points': self.selected_variance_points,
                }, f)
        if grad_embeddings is not None:
            path = os.path.join(self.active_label_dir,
                                f'grad_embeddings_epoch_{cur_epoch}.pkl')
            with open(path, 'wb') as f:
                pickle.dump(grad_embeddings, f)

    def query(self, leave_pbar=True, cur_epoch=None):
        raise NotImplementedError
