"""CRB sampling — the paper's 3-stage acquisition.

Parity: ``pcdet/query_strategies/crb_sampling.py``:
  Stage 1 (:48-121) "Concise Label Sampling": MC-dropout eval pass; per-frame
    Shannon entropy of the predicted-label histogram (absent-class
    pseudo-count quirk preserved in the base scorer); keep top K1·N frames;
    cache MC-mean cls/reg as hypothetical gts, densities, labels.
  Stage 2 (:128-238) "Representative Prototype Selection": per-frame
    gradients of the second-stage cls+reg loss vs the stage-1 hypothetical
    labels at the shared-FC layer; kmeans++/kmeans/birch/gmm down to K2·N.
    (Single-stage models fall back to RPN conv_cls grads, BADGE-style, until
    the model has a roi head — selection math is identical.)
  Stage 3 (:240-338) "Greedy Point Density Balancing": per-class uniform
    prior over the [5%, 95%] density support; greedily add the frame whose
    per-class Gaussian-KDE of accumulated box densities maximizes
    mean(1 − (2/π)·arctan(π/2·KL(uniform ∥ KDE))).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats
from scipy.cluster.vq import vq
from scipy.stats import uniform
from sklearn.cluster import Birch, KMeans, kmeans_plusplus
from sklearn.mixture import GaussianMixture
from sklearn.neighbors import KernelDensity

from ..models.dense_heads import anchor_head_single as ahs
from ..runtime.train import host_to_device_batch, prepare_device_batch
from .strategy import Strategy


class CRBSampling(Strategy):
    def __init__(self, model, variables, labelled_loader, unlabelled_loader,
                 rank, active_label_dir, cfg):
        super().__init__(model, variables, labelled_loader, unlabelled_loader,
                         rank, active_label_dir, cfg)
        self._grad_fns = {}
        active_cfg = cfg.ACTIVE_TRAIN.get('ACTIVE_CONFIG', {})
        self.k1 = active_cfg.get('K1', 5)
        self.k2 = active_cfg.get('K2', 3)
        # reference's config key literally says BANDWDITH (crb_sampling.py:30)
        self.bandwidth = active_cfg.get('BANDWDITH',
                                        active_cfg.get('BANDWIDTH', 5))
        self.prototype = active_cfg.get('CLUSTERING', 'kmeans++')
        self.alpha = 0.95

    def query(self, leave_pbar=True, cur_epoch=None):
        num_class = self.num_class
        n_select = int(self.cfg.ACTIVE_TRAIN.SELECT_NUMS)

        # ---------------- Stage 1: concise label sampling ----------------
        t_stage1 = time.time()
        num_mc = int(self.cfg.MODEL.get('SAMPLING_ROUND', 5))
        # slim scorer: only the signals stages 1-3 consume (label-histogram
        # entropy for the K1 filter, densities/labels for GPDB, MC-mean rcnn
        # outputs as stage-2 hypothetical targets) — the per-anchor entropy /
        # MC-variance / embedding signals of the full scorer are for OTHER
        # strategies and XLA prunes their compute here (VERDICT r4 #1a)
        records = self.scan_pool(
            mc_dropout=True, num_mc=num_mc,
            signals=('label_entropy', 'pred_density', 'pred_labels',
                     'pred_valid', 'batch_rcnn_cls', 'batch_rcnn_reg'))
        select_dic = {fid: float(r['label_entropy'])
                      for fid, r in records.items()}
        density_list = {fid: r['pred_density'][r['pred_valid']]
                        for fid, r in records.items()}
        label_list = {fid: r['pred_labels'][r['pred_valid']]
                      for fid, r in records.items()}

        ranked = sorted(select_dic.items(), key=lambda kv: kv[1])
        k1_frames = [fid for fid, _ in ranked[::-1][:int(self.k1 * n_select)]]
        self.stage_times = {'crb_stage1_s': time.time() - t_stage1}

        # ---------------- Stage 2: representative prototypes -------------
        # hypothetical targets = stage-1 MC-mean rcnn outputs (reference
        # caches cls_results/reg_results at crb_sampling.py:97-99 and feeds
        # them to the stage-2 train-mode loss at :186-196)
        has_targets = ('batch_rcnn_cls' in next(iter(records.values())))
        cls_results = {fid: r.get('batch_rcnn_cls')
                       for fid, r in records.items()}
        reg_results = {fid: r.get('batch_rcnn_reg')
                       for fid, r in records.items()}

        start = time.time()
        # stage-2 per-sample grads hold chunk x a full PV-RCNN backward in
        # HBM — allow capping below the pool-scan batch (ACTIVE_TRAIN.
        # GRAD_CHUNK; a batch-16 backward OOMs a 16G v5e)
        chunk = int(self.cfg.ACTIVE_TRAIN.get('GRAD_CHUNK', 0)) \
            or getattr(getattr(self.unlabelled_loader, 'batch_sampler', None),
                       'batch_size', None) \
            or getattr(self.unlabelled_loader, 'batch_size', None) or 4
        if chunk not in self._grad_fns:   # re-tracing PV-RCNN costs ~30 s
            self._grad_fns[chunk] = self._build_grad_fn(chunk)
        grad_fn = self._grad_fns[chunk]
        rng = jax.random.PRNGKey(1)
        # pipelined like scan_pool: dispatch every chunk (device executes in
        # order while the host collates the next chunk), materialize at the
        # end — a per-chunk np.asarray sync costs a full host↔device round
        # trip per chunk on top of serializing collate against compute
        pending = []
        for i0 in range(0, len(k1_frames), chunk):
            fids = k1_frames[i0:i0 + chunk]
            load_ids = fids + [fids[-1]] * (chunk - len(fids))
            host_batch = self._load_frames(load_ids)
            rng, sub = jax.random.split(rng)
            if has_targets:
                targets = {
                    'cls': jnp.asarray(np.stack(
                        [cls_results[f] for f in load_ids])),
                    'reg': jnp.asarray(np.stack(
                        [reg_results[f] for f in load_ids]))}
            else:
                targets = {}
            pending.append(
                (fids, grad_fn(self.variables, host_batch, sub, targets)))
        frame_ids, grads = [], []
        for fids, g_dev in pending:
            g = np.asarray(g_dev)
            for j, fid in enumerate(fids):
                grads.append(g[j].reshape(-1))
                frame_ids.append(fid)
        # float32 like the reference's torch-numpy embeddings — f64 doubles
        # the host-side kmeans++ cost on a (K1·N, 64k) matrix for nothing
        embeddings = np.stack(grads).astype(np.float32)
        n_k2 = int(n_select * self.k2)
        if self.prototype == 'kmeans++':
            _, sel_idx = kmeans_plusplus(embeddings, n_clusters=n_k2,
                                         random_state=0)
        elif self.prototype == 'kmeans':
            km = KMeans(n_clusters=n_k2, random_state=0).fit(embeddings)
            sel_idx, _ = vq(km.cluster_centers_, embeddings)
        elif self.prototype == 'birch':
            ms = Birch(n_clusters=n_k2).fit(embeddings)
            sel_idx, _ = vq(ms.subcluster_centers_, embeddings)
        elif self.prototype == 'gmm':
            gmm = GaussianMixture(n_components=n_k2, random_state=0,
                                  covariance_type='diag').fit(embeddings)
            sel_idx, _ = vq(gmm.means_, embeddings)
        else:
            raise NotImplementedError(self.prototype)
        k2_frames = [frame_ids[i] for i in sel_idx]
        # sklearn center pickers can return duplicate indices when grad
        # embeddings collapse (tiny models / saturated heads); the greedy
        # GPDB would then happily select the same frame twice.  De-dup
        # preserving cluster order and backfill from the stage-1 ranking so
        # stage 3 always sees n_k2 distinct candidates.
        seen = set()
        k2_frames = [f for f in k2_frames
                     if not (f in seen or seen.add(f))]
        for f in k1_frames:
            if len(k2_frames) >= n_k2:
                break
            if f not in seen:
                seen.add(f)
                k2_frames.append(f)
        print(f'--- {{{self.prototype}}} running time: '
              f'{time.time() - start:.2f} seconds for fc grads---')
        self.stage_times['crb_stage2_s'] = time.time() - start

        # ---------------- Stage 3: greedy density balancing (GPDB) -------
        t_stage3 = time.time()
        out = self._gpdb(k2_frames, density_list, label_list, num_class,
                         n_select)
        self.stage_times['crb_stage3_s'] = time.time() - t_stage3
        return out

    def _gpdb(self, k2_frames, density_list, label_list, num_class, n_select):
        """Parity: crb_sampling.py:240-338."""
        density_all = np.concatenate(list(density_list.values()))
        label_all = np.concatenate(list(label_list.values()))
        x_axis, uniform_dist_per_cls = [], []
        for cls in range(num_class):
            d = np.sort(density_all[label_all == cls + 1])
            if len(d) == 0:
                d = np.asarray([0.0, 1.0])
            d_max = int(d[-1])
            hi_idx = min(int(self.alpha * len(d)), len(d) - 1)
            lo = int(d[-max(int(self.alpha * len(d)), 1)])
            hi = int(d[hi_idx])
            xs = np.linspace(-50, d_max + 50, 400)
            x_axis.append(xs)
            uniform_dist_per_cls.append(uniform.pdf(xs, lo, max(hi - lo, 1e-6)))

        dl = [np.asarray(density_list[f]) for f in k2_frames]
        ll = [np.asarray(label_list[f]) for f in k2_frames]
        fids = list(k2_frames)

        if self.cfg.ACTIVE_TRAIN.get('GPDB_DEVICE', True) and len(fids):
            return self._gpdb_greedy_device(fids, dl, ll, x_axis,
                                            uniform_dist_per_cls, num_class,
                                            n_select)
        return self._gpdb_greedy_host(fids, dl, ll, x_axis,
                                      uniform_dist_per_cls, num_class,
                                      n_select)

    def _gpdb_greedy_host(self, fids, dl, ll, x_axis, uniform_dist_per_cls,
                          num_class, n_select):
        """Reference-shaped host loop (sklearn KDE per candidate×class) —
        kept as the parity oracle for the device path."""
        selected_frames = []
        sel_densities = np.zeros((0,), np.float64)
        sel_labels = np.zeros((0,), np.int64)
        for j in range(n_select):
            if not fids:
                break
            if j == 0:
                best = 0
            else:
                best, best_coff = None, -1.0
                for i in range(len(fids)):
                    props = np.zeros(num_class)
                    for cls in range(num_class):
                        frame_cls_mask = ll[i] == cls + 1
                        if frame_cls_mask.sum() == 0:
                            props[cls] = 1.0
                            continue
                        dens_cls = np.concatenate([
                            sel_densities[sel_labels == cls + 1],
                            dl[i][frame_cls_mask]])
                        kde = KernelDensity(kernel='gaussian',
                                            bandwidth=self.bandwidth).fit(
                            dens_cls[:, None])
                        logprob = kde.score_samples(x_axis[cls][:, None])
                        kl = scipy.stats.entropy(uniform_dist_per_cls[cls],
                                                 np.exp(logprob))
                        props[cls] = 2 / np.pi * np.arctan(np.pi / 2 * kl)
                    coff = float(np.mean(1 - props))
                    if coff > best_coff:
                        best_coff, best = coff, i
            selected_frames.append(fids[best])
            sel_densities = np.concatenate([sel_densities, dl[best]])
            sel_labels = np.concatenate([sel_labels, ll[best]])
            del dl[best], ll[best], fids[best]
        return selected_frames

    def _gpdb_greedy_device(self, fids, dl, ll, x_axis, uniform_dist_per_cls,
                            num_class, n_select):
        """Batched device KDE (SURVEY §7): per greedy round, ONE jitted call
        evaluates every candidate's per-class Gaussian KDE on the fixed
        400-point grid and returns all coffs.  The math matches the host
        oracle: KL(uniform ‖ kde) over grid-normalized pdfs — sklearn's KDE
        normalization constant cancels in scipy.entropy's normalization.
        O(picks · candidates · classes · grid · densities) rides the MXU-free
        VPU as one big einsum instead of ~10⁵ sklearn fits."""
        n_cand = len(fids)
        d_max = max(1, max(len(d) for d in dl))
        cand_dens = np.zeros((n_cand, num_class, d_max), np.float32)
        cand_cnt = np.zeros((n_cand, num_class), np.int32)
        for i, (dens, labs) in enumerate(zip(dl, ll)):
            for cls in range(num_class):
                d = dens[labs == cls + 1]
                cand_dens[i, cls, :len(d)] = d
                cand_cnt[i, cls] = len(d)
        sel_cap = max(1, n_select * d_max)
        xs = jnp.asarray(np.stack(x_axis), jnp.float32)       # (C, 400)
        pk = np.stack(uniform_dist_per_cls)
        pk = pk / np.maximum(pk.sum(-1, keepdims=True), 1e-30)
        pk_j = jnp.asarray(pk, jnp.float32)
        inv2h2 = 1.0 / (2.0 * float(self.bandwidth) ** 2)

        @jax.jit
        def score_all(cands, ccnt, sel, scnt, alive):
            # kernel sums per class on the grid: dens (C, S) → (C, 400)
            def ksum(dens, cnt):
                m = jnp.arange(dens.shape[-1])[None, :] < cnt[:, None]
                e = jnp.exp(-(xs[:, :, None] - dens[:, None, :]) ** 2
                            * inv2h2)
                return (e * m[:, None, :]).sum(-1)
            sel_k = ksum(sel, scnt)                            # (C, 400)
            cand_k = jax.vmap(ksum)(cands, ccnt)               # (N, C, 400)
            total = cand_k + sel_k[None]
            qk = total / jnp.clip(total.sum(-1, keepdims=True), 1e-30)
            ratio = jnp.where(pk_j[None] > 0,
                              pk_j[None] / jnp.clip(qk, 1e-30), 1.0)
            kl = (pk_j[None] * jnp.log(ratio)).sum(-1)         # (N, C)
            props = jnp.where(ccnt > 0,
                              2 / jnp.pi * jnp.arctan(jnp.pi / 2 * kl), 1.0)
            coffs = (1.0 - props).mean(-1)
            return jnp.where(alive, coffs, -jnp.inf)

        sel_dens = np.zeros((num_class, sel_cap), np.float32)
        sel_cnt = np.zeros((num_class,), np.int32)
        alive = np.ones((n_cand,), bool)
        cands_j = jnp.asarray(cand_dens)
        ccnt_j = jnp.asarray(cand_cnt)
        selected_frames = []
        for j in range(min(n_select, n_cand)):
            if j == 0:
                best = 0
            else:
                coffs = np.asarray(score_all(
                    cands_j, ccnt_j, jnp.asarray(sel_dens),
                    jnp.asarray(sel_cnt), jnp.asarray(alive)))
                best = int(np.argmax(coffs))
            for cls in range(num_class):
                n = cand_cnt[best, cls]
                if n:
                    s = sel_cnt[cls]
                    take = min(n, sel_cap - s)
                    sel_dens[cls, s:s + take] = \
                        cand_dens[best, cls, :take]
                    sel_cnt[cls] = s + take
            alive[best] = False
            selected_frames.append(fids[best])
        return selected_frames

    # ---- stage-2 grad machinery ----
    def _build_grad_fn(self, chunk):
        """Per-sample grad embeddings: roi-head shared-FC grads when the
        model has a second stage, else RPN conv_cls grads (single-stage
        fallback).

        Parity: the reference runs stage 2 in ``model.train()`` with dropout
        live over a batch-1 loader (crb_sampling.py:163-214); here the forward
        runs training=True with a per-sample dropout rng, vmapped over a
        ``chunk`` of frames (SURVEY §7: vmap-of-grad instead of a
        ``.backward()`` loop).  BN per-sample batch stats == the reference's
        batch-1 train-mode BN.  Differentiating only the target kernel means
        XLA prunes the backward pass below the head — the backbone runs
        forward-only."""
        dataset = self.unlabelled_set
        model = self.model
        voxel_cfg = dataset.voxel_cfg
        grid_size = tuple(int(g) for g in dataset.grid_size)
        pcr = tuple(float(x) for x in dataset.point_cloud_range)
        vs = tuple(float(v) for v in dataset.voxel_size)
        has_roi = self.cfg.MODEL.get('ROI_HEAD', None) is not None
        core = ahs.make_core(self.cfg.MODEL.DENSE_HEAD, self.num_class,
                             tuple(self.cfg.CLASS_NAMES),
                             np.asarray(dataset.grid_size),
                             list(dataset.point_cloud_range))
        path = (('roi_head', 'shared_fc_1', 'kernel') if has_roi
                else ('dense_head', 'conv_cls', 'kernel'))
        roi_cfg = self.cfg.MODEL.get('ROI_HEAD', None)

        def _with_target(params, t):
            a, bkey, c = path
            inner = dict(params[a])
            leaf = dict(inner[bkey])
            leaf[c] = t
            inner[bkey] = leaf
            out = dict(params)
            out[a] = inner
            return out

        def grad_fn(variables, host_batch, rng, targets):
            batch = prepare_device_batch(host_batch, voxel_cfg, grid_size,
                                         pcr, vs)
            params = variables['params']
            target = params[path[0]][path[1]][path[2]]
            samples = {k: v for k, v in batch.items() if k != 'batch_size'}
            rngs = jax.random.split(rng, chunk)

            def single_loss(t, sample, drng, tgt):
                p = _with_target(params, t)
                b1 = {k: v[None] for k, v in sample.items()}
                b1['batch_size'] = 1
                out, _ = model.apply(
                    {'params': p, 'batch_stats': variables['batch_stats']},
                    b1, training=True, rngs={'dropout': drng},
                    mutable=['batch_stats'])
                if has_roi and 'rcnn_cls' in out and tgt:
                    # hypothetical labels: stage-1 MC-mean predictions
                    # (parity crb_sampling.py:186-196); ROI counts match by
                    # config (TEST NMS_POST == ROI_PER_IMAGE) — slice to the
                    # shorter if a config deviates
                    from ..models.roi_heads import roi_head_template as rht
                    pred_cls = out['rcnn_cls'].reshape(-1)
                    tgt_cls = tgt['cls'].reshape(-1)
                    r = min(pred_cls.shape[0], tgt_cls.shape[0])
                    cls_loss = rht.get_box_cls_layer_loss_hyp(
                        pred_cls[:r], tgt_cls[:r], roi_cfg)
                    code = out['rcnn_reg'].shape[-1]
                    pred_reg = out['rcnn_reg'].reshape(-1, code)
                    tgt_reg = tgt['reg'].reshape(-1, code)
                    rr = min(pred_reg.shape[0], tgt_reg.shape[0])
                    reg_loss = rht.get_box_reg_layer_loss_hyp(
                        pred_reg[:rr], tgt_reg[:rr], roi_cfg)
                    return cls_loss + reg_loss.mean()
                # single-stage fallback: rpn loss vs argmax labels (same
                # 0..C-1 quirk as badge_sampling.py:90 — class 0 acts as bg)
                logits = out['cls_preds'].reshape(1, -1, self.num_class)
                hyp = jax.lax.stop_gradient(
                    logits.argmax(-1).astype(jnp.int32))
                new_data = {'cls_preds': out['cls_preds'],
                            'box_cls_labels': hyp}
                return ahs.get_cls_layer_loss(out, core, new_data=new_data)

            g = jax.vmap(jax.grad(single_loss), in_axes=(None, 0, 0, 0))(
                target, samples, rngs, targets)
            return g.reshape(chunk, -1)

        if self.mesh is not None and chunk % self.mesh.size == 0:
            # stage-2 chunks shard over the DP mesh like the scoring pass —
            # the per-frame grad embedding is fixed-width, so the result
            # all-gathers back replicated (VERDICT r2 #2)
            from ..parallel import batch_sharding, replicated
            rep, shard = replicated(self.mesh), batch_sharding(self.mesh)
            return jax.jit(grad_fn,
                           in_shardings=(rep, shard, rep, shard),
                           out_shardings=rep)
        return jax.jit(grad_fn)

    def _load_frames(self, frame_ids):
        ds = self.unlabelled_set
        ids = [p[0] for p in self.pairs]
        batch = ds.collate_batch([ds[ids.index(f)] for f in frame_ids])
        return host_to_device_batch(batch)
