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
        num_mc = int(self.cfg.MODEL.get('SAMPLING_ROUND', 5))
        records = self.scan_pool(mc_dropout=True, num_mc=num_mc)
        select_dic = {fid: float(r['label_entropy'])
                      for fid, r in records.items()}
        density_list = {fid: r['pred_density'][r['pred_valid']]
                        for fid, r in records.items()}
        label_list = {fid: r['pred_labels'][r['pred_valid']]
                      for fid, r in records.items()}

        ranked = sorted(select_dic.items(), key=lambda kv: kv[1])
        k1_frames = [fid for fid, _ in ranked[::-1][:int(self.k1 * n_select)]]

        # ---------------- Stage 2: representative prototypes -------------
        start = time.time()
        grad_fn = self._build_grad_fn()
        frame_ids, grads = [], []
        for fid in k1_frames:
            host_batch = self._load_single(fid)
            g = grad_fn(self.variables, host_batch)
            grads.append(np.asarray(g).reshape(-1))
            frame_ids.append(fid)
        embeddings = np.stack(grads).astype(np.float64)
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
        print(f'--- {{{self.prototype}}} running time: '
              f'{time.time() - start:.2f} seconds for fc grads---')

        # ---------------- Stage 3: greedy density balancing (GPDB) -------
        return self._gpdb(k2_frames, density_list, label_list, num_class,
                          n_select)

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

    # ---- stage-2 grad machinery ----
    def _build_grad_fn(self):
        """Grad-embedding function: roi-head shared-FC grads when the model
        has a second stage, else RPN conv_cls grads (single-stage fallback)."""
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

        @jax.jit
        def grad_fn(variables, host_batch):
            batch = prepare_device_batch(host_batch, voxel_cfg, grid_size,
                                         pcr, vs)

            def loss_fn(params):
                out = model.apply(
                    {'params': params,
                     'batch_stats': variables['batch_stats']},
                    batch, training=False)
                if has_roi and 'rcnn_cls' in out:
                    # stage-1 hypothetical labels: the model's own MC-mean
                    # predictions (stop-grad), parity crb_sampling.py:194-196
                    cls_t = jax.lax.stop_gradient(
                        jax.nn.sigmoid(out['rcnn_cls']))
                    reg_t = jax.lax.stop_gradient(out['rcnn_reg'])
                    from ..models.roi_heads import roi_head_template as rht
                    cls_loss = rht.get_box_cls_layer_loss_hyp(
                        out['rcnn_cls'], cls_t, self.cfg.MODEL.ROI_HEAD)
                    reg_loss = rht.get_box_reg_layer_loss_hyp(
                        out['rcnn_reg'], reg_t, self.cfg.MODEL.ROI_HEAD)
                    return cls_loss + reg_loss.mean()
                # single-stage fallback: rpn loss vs argmax labels
                b = out['rpn_preds'].shape[0]
                logits = out['rpn_preds'].reshape(b, -1, self.num_class)
                hyp = jax.lax.stop_gradient(logits.argmax(-1).astype(jnp.int32))
                new_data = {'cls_preds': out['cls_preds'],
                            'box_cls_labels': hyp}
                return ahs.get_cls_layer_loss(out, core, new_data=new_data)

            grads = jax.grad(loss_fn)(variables['params'])
            if has_roi and 'roi_head' in grads:
                return grads['roi_head']['shared_fc_1']['kernel']
            return grads['dense_head']['conv_cls']['kernel']

        return grad_fn

    def _load_single(self, frame_id):
        ds = self.unlabelled_set
        idx = [p[0] for p in self.pairs].index(frame_id)
        batch = ds.collate_batch([ds[idx]])
        return host_to_device_batch(batch)
