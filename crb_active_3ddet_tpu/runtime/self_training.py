"""ST3D self-training: pseudo-label store + memory ensembles + trainer.

Parity surfaces:
  - ``pcdet/utils/self_training_utils.py`` (:13-232): module-level
    PSEUDO_LABELS store, per-epoch pseudo-label regeneration with per-class
    SCORE_THRESH/NEG_THRESH filtering, pickle checkpoints, load_ps_label.
  - ``pcdet/utils/memory_ensemble_utils.py`` (:9,137,225): consistency /
    nms / bipartite ensembles merging the previous store with fresh
    predictions (memory voting: ignore after IGNORE_THRESH misses, remove
    after RM_THRESH).
  - ``tools/train_utils/train_st_utils.py`` (:12-160 train_one_epoch_st /
    train_model_st): each iteration draws a source batch (real labels) and
    a target batch (pseudo labels) and sums the losses; pseudo labels are
    refreshed on UPDATE_PSEUDO_LABEL[_INTERVAL] epoch boundaries.

TPU deltas: pseudo labels are substituted into fixed-shape (B, M, 8) gt
buffers at collate time (no dataset surgery); IoU matrices for the
ensembles run through the jitted rotated-IoU op on device, the greedy
bookkeeping stays in numpy on host (tiny arrays).
"""

from __future__ import annotations

import pickle
import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.iou3d import boxes_iou3d
from ..ops.nms import rotated_nms_matrix
from . import train as train_rt

PSEUDO_LABELS = {}
NEW_PSEUDO_LABELS = {}


# ---------------------------------------------------------------------------
# pseudo-label store
# ---------------------------------------------------------------------------
def check_already_exist_pseudo_label(ps_label_dir, start_epoch):
    """Resume the store from the latest ps_label_e*.pkl (parity :17-59).
    Returns the epoch the latest store was written at, or None."""
    ps_label_dir = Path(ps_label_dir)
    pkls = sorted(ps_label_dir.glob('ps_label_e*.pkl'),
                  key=lambda p: int(re.search(r'e(\d+)', p.stem).group(1)))
    if not pkls:
        return None
    latest = pkls[-1]
    with open(latest, 'rb') as f:
        PSEUDO_LABELS.update(pickle.load(f))
    return int(re.search(r'e(\d+)', latest.stem).group(1))


def save_pseudo_label_batch(batch, preds, self_train_cfg,
                            ensemble_func=None):
    """Turn one eval batch's predictions into pseudo labels (parity
    :146-221).  gt_boxes layout (N, 9): [x y z dx dy dz heading label
    score]; labels below SCORE_THRESH flip negative (ignore at training);
    NEG_THRESH removes outright."""
    score_thresh = np.asarray(self_train_cfg.get('SCORE_THRESH', [0.0]))
    neg_thresh = self_train_cfg.get('NEG_THRESH', None)
    for i, fid in enumerate(batch['frame_id']):
        valid = np.asarray(preds['pred_valid'][i])
        boxes = np.asarray(preds['pred_boxes'][i])[valid]
        labels = np.asarray(preds['pred_labels'][i])[valid].astype(np.int64)
        scores = np.asarray(preds['pred_scores'][i])[valid]
        if neg_thresh is not None and len(labels):
            nt = np.asarray(neg_thresh)
            keep = scores >= nt[np.clip(labels - 1, 0, len(nt) - 1)]
            boxes, labels, scores = boxes[keep], labels[keep], scores[keep]
        lab = labels.astype(np.float64)
        if len(labels):
            ignore = scores < score_thresh[
                np.clip(labels - 1, 0, len(score_thresh) - 1)]
            lab = np.where(ignore, -lab, lab)
        gt_boxes = np.concatenate(
            [boxes[:, :7], lab[:, None], scores[:, None]], axis=1)
        gt_infos = {'gt_boxes': gt_boxes, 'cls_scores': scores.copy(),
                    'iou_scores': None,
                    'memory_counter': np.zeros(len(gt_boxes))}
        if ensemble_func is not None and fid in PSEUDO_LABELS:
            gt_infos = ensemble_func(PSEUDO_LABELS[fid], gt_infos,
                                     self_train_cfg.MEMORY_ENSEMBLE)
        NEW_PSEUDO_LABELS[fid] = gt_infos


def commit_pseudo_labels(ps_label_dir, cur_epoch):
    """Swap NEW → current and checkpoint the store (parity :122-143)."""
    PSEUDO_LABELS.clear()
    PSEUDO_LABELS.update(NEW_PSEUDO_LABELS)
    NEW_PSEUDO_LABELS.clear()
    with open(Path(ps_label_dir) / f'ps_label_e{cur_epoch}.pkl', 'wb') as f:
        pickle.dump(PSEUDO_LABELS, f)


def load_ps_label(frame_id):
    """(N, 8) [box7, label] pseudo gts for a frame (parity :226-237)."""
    if frame_id not in PSEUDO_LABELS:
        return np.zeros((0, 8), np.float32)
    return PSEUDO_LABELS[frame_id]['gt_boxes'][:, :8].astype(np.float32)


# ---------------------------------------------------------------------------
# memory ensembles
# ---------------------------------------------------------------------------
def _iou_matrix(boxes_a, boxes_b):
    return np.asarray(boxes_iou3d(jnp.asarray(boxes_a[:, :7], jnp.float32),
                                  jnp.asarray(boxes_b[:, :7], jnp.float32)))


def consistency_ensemble(gt_infos_a, gt_infos_b, cfg):
    """Parity: memory_ensemble_utils.consistency_ensemble (:9-136)."""
    box_a = gt_infos_a['gt_boxes']
    box_b = gt_infos_b['gt_boxes']
    if box_b.shape[0] == 0:
        out = {k: (v.copy() if isinstance(v, np.ndarray) else v)
               for k, v in gt_infos_a.items()}
        out['memory_counter'] = out['memory_counter'] + 1
        return out
    if box_a.shape[0] == 0:
        return gt_infos_b

    new_box = box_a.copy()
    new_cls = None if gt_infos_a['cls_scores'] is None \
        else gt_infos_a['cls_scores'].copy()
    new_cnt = gt_infos_a['memory_counter'].copy()

    iou = _iou_matrix(box_a, box_b)
    ious, match = iou.max(1), iou.argmax(1)
    iou_thresh = float(cfg.IOU_THRESH)
    matched = ious >= iou_thresh
    sel_a = np.where(matched)[0]
    sel_b = match[sel_a]
    # keep the higher-confidence box of each matched pair
    score_mask = box_a[sel_a, 8] < box_b[sel_b, 8]
    new_box[sel_a[score_mask]] = box_b[sel_b[score_mask]]
    if new_cls is not None:
        new_cls[sel_a[score_mask]] = gt_infos_b['cls_scores'][
            sel_b[score_mask]]
    new_cnt[sel_a] = 0

    # memory voting on disappeared boxes
    disappear = np.where(ious < iou_thresh)[0]
    mv = cfg.get('MEMORY_VOTING', None)
    if mv is not None and mv.get('ENABLED', False):
        new_cnt[disappear] += 1
        ignore = new_cnt >= float(mv.IGNORE_THRESH)
        new_box[ignore, 7] = -1
        remain = new_cnt < float(mv.RM_THRESH)
        new_box = new_box[remain]
        new_cnt = new_cnt[remain]
        if new_cls is not None:
            new_cls = new_cls[remain]

    # newly appeared current boxes
    ious_b2a = iou.max(0)
    fresh = np.where(ious_b2a < iou_thresh)[0]
    if len(fresh):
        new_box = np.concatenate([new_box, box_b[fresh]], axis=0)
        new_cnt = np.concatenate([new_cnt,
                                  gt_infos_b['memory_counter'][fresh]])
        if new_cls is not None:
            new_cls = np.concatenate([new_cls,
                                      gt_infos_b['cls_scores'][fresh]])
    return {'gt_boxes': new_box, 'cls_scores': new_cls, 'iou_scores': None,
            'memory_counter': new_cnt}


def nms_ensemble(gt_infos_a, gt_infos_b, cfg):
    """Parity: memory_ensemble_utils.nms_ensemble (:137-224) — concat both
    sets, NMS by score, matched survivors reset their counter."""
    box_a, box_b = gt_infos_a['gt_boxes'], gt_infos_b['gt_boxes']
    if box_b.shape[0] == 0:
        out = {k: (v.copy() if isinstance(v, np.ndarray) else v)
               for k, v in gt_infos_a.items()}
        out['memory_counter'] = out['memory_counter'] + 1
        return out
    if box_a.shape[0] == 0:
        return gt_infos_b
    boxes = np.concatenate([box_a, box_b], axis=0)
    cnt = np.concatenate([gt_infos_a['memory_counter'],
                          gt_infos_b['memory_counter']])
    n = len(boxes)
    keep_idx, keep_valid, _ = rotated_nms_matrix(
        jnp.asarray(boxes[:, :7], jnp.float32),
        jnp.asarray(boxes[:, 8], jnp.float32),
        iou_thresh=float(cfg.NMS_THRESH), pre_max=n, post_max=n)
    keep = np.asarray(keep_idx)[np.asarray(keep_valid)]
    new_box, new_cnt = boxes[keep], cnt[keep]
    # survivors from the old store that matched nothing current age by 1
    iou = _iou_matrix(new_box, box_b)
    stale = (iou.max(1) < float(cfg.IOU_THRESH)) if iou.size else \
        np.ones(len(new_box), bool)
    from_old = keep < len(box_a)
    new_cnt = np.where(from_old & stale, new_cnt + 1,
                       np.where(from_old, 0, new_cnt))
    mv = cfg.get('MEMORY_VOTING', None)
    if mv is not None and mv.get('ENABLED', False):
        ignore = new_cnt >= float(mv.IGNORE_THRESH)
        new_box[ignore, 7] = -np.abs(new_box[ignore, 7])
        remain = new_cnt < float(mv.RM_THRESH)
        new_box, new_cnt = new_box[remain], new_cnt[remain]
    return {'gt_boxes': new_box, 'cls_scores': None, 'iou_scores': None,
            'memory_counter': new_cnt}


def bipartite_ensemble(gt_infos_a, gt_infos_b, cfg):
    """Parity: memory_ensemble_utils.bipartite_ensemble (:225+) — greedy
    one-to-one matching by IoU; matched pairs keep the higher score, the
    rest follow the consistency rules."""
    box_a, box_b = gt_infos_a['gt_boxes'], gt_infos_b['gt_boxes']
    if box_b.shape[0] == 0 or box_a.shape[0] == 0:
        return consistency_ensemble(gt_infos_a, gt_infos_b, cfg)
    iou = _iou_matrix(box_a, box_b).copy()
    pairs = []
    for _ in range(min(len(box_a), len(box_b))):
        i, j = np.unravel_index(np.argmax(iou), iou.shape)
        if iou[i, j] < float(cfg.IOU_THRESH):
            break
        pairs.append((i, j))
        iou[i, :] = -1
        iou[:, j] = -1
    new_box = box_a.copy()
    new_cnt = gt_infos_a['memory_counter'].copy()
    matched_a = np.zeros(len(box_a), bool)
    matched_b = np.zeros(len(box_b), bool)
    for i, j in pairs:
        matched_a[i] = matched_b[j] = True
        if box_a[i, 8] < box_b[j, 8]:
            new_box[i] = box_b[j]
        new_cnt[i] = 0
    mv = cfg.get('MEMORY_VOTING', None)
    if mv is not None and mv.get('ENABLED', False):
        new_cnt[~matched_a] += 1
        ignore = new_cnt >= float(mv.IGNORE_THRESH)
        new_box[ignore, 7] = -np.abs(new_box[ignore, 7])
        remain = new_cnt < float(mv.RM_THRESH)
        new_box, new_cnt = new_box[remain], new_cnt[remain]
    fresh = ~matched_b
    new_box = np.concatenate([new_box, box_b[fresh]], axis=0)
    new_cnt = np.concatenate([new_cnt,
                              gt_infos_b['memory_counter'][fresh]])
    return {'gt_boxes': new_box, 'cls_scores': None, 'iou_scores': None,
            'memory_counter': new_cnt}


ENSEMBLES = {'consistency': consistency_ensemble, 'nms': nms_ensemble,
             'bipartite': bipartite_ensemble}


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------
def _substitute_pseudo_labels(host_batch, frame_ids, max_gt):
    """Replace the gt buffer of a target host batch with the current store's
    pseudo boxes (fixed (B, M, 8) shape)."""
    b = len(frame_ids)
    gt = np.zeros((b, max_gt, 8), np.float32)
    for i, fid in enumerate(frame_ids):
        ps = load_ps_label(fid)
        # ignored boxes (negative labels) are dropped for the anchor loss
        ps = ps[ps[:, 7] > 0][:max_gt]
        gt[i, :len(ps)] = ps
    out = dict(host_batch)
    out['gt_boxes'] = jnp.asarray(gt)
    return out


def save_pseudo_label_epoch(variables, eval_step, target_loader,
                            self_train_cfg, ps_label_dir, cur_epoch):
    """Regenerate the store with the current model (parity :62-120)."""
    name = self_train_cfg.get('MEMORY_ENSEMBLE', {}).get('NAME', None) \
        if cur_epoch > 0 or PSEUDO_LABELS else None
    ensemble = ENSEMBLES[name] if name else None
    for batch in target_loader:
        host_batch = train_rt.host_to_device_batch(batch)
        preds, _ = eval_step(variables, host_batch)
        preds = jax.tree.map(np.asarray, preds)
        save_pseudo_label_batch(batch, preds, self_train_cfg,
                                ensemble_func=ensemble)
    commit_pseudo_labels(ps_label_dir, cur_epoch)


def train_model_st(cfg, args, batch_size, logger, output_dir, ckpt_dir,
                   workers=0, tb_log=None):
    """The ST3D outer loop (parity: train_st_utils.train_model_st :96-160).
    Source loader provides real labels; the target loader's gt buffers are
    swapped for pseudo labels refreshed on the configured boundaries."""
    from ..datasets import build_dataloader
    from ..models import build_network
    from . import checkpoint as ckpt_rt
    from . import eval as eval_rt
    from .optimization import build_optimizer

    st_cfg = cfg.SELF_TRAIN
    ps_label_dir = output_dir / 'ps_label'
    ps_label_dir.mkdir(parents=True, exist_ok=True)

    src_cfg = cfg.get('DATA_CONFIG_SRC', cfg.DATA_CONFIG)
    source_set, source_loader, _ = build_dataloader(
        src_cfg, cfg.CLASS_NAMES, batch_size, workers=workers, logger=logger,
        training=True, seed=666)
    tgt_cfg = cfg.get('DATA_CONFIG_TAR', cfg.DATA_CONFIG)
    target_set, target_loader, _ = build_dataloader(
        tgt_cfg, cfg.CLASS_NAMES, batch_size, workers=workers, logger=logger,
        training=False, seed=666)

    model = build_network(model_cfg=cfg.MODEL,
                          num_class=len(cfg.CLASS_NAMES), dataset=source_set)
    epochs = int(args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS)
    steps = max(len(source_loader), 1)
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION,
                                   total_steps=steps * epochs)
    state = train_rt.init_train_state(model, optimizer, source_set,
                                      batch_size)
    if getattr(args, 'ckpt', None):
        state = ckpt_rt.restore_train_state(
            state, ckpt_rt.load_checkpoint(args.ckpt))
        logger.info('[st] restored %s', args.ckpt)
    train_step = train_rt.make_train_step(model, optimizer, source_set)
    eval_step = eval_rt.make_eval_step(model, target_set,
                                       cfg.MODEL.POST_PROCESSING,
                                       num_class=len(cfg.CLASS_NAMES))

    resumed = check_already_exist_pseudo_label(ps_label_dir, 0)
    if resumed is not None:
        logger.info('[st] resumed pseudo labels from epoch %d', resumed)

    update_at = set(st_cfg.get('UPDATE_PSEUDO_LABEL', [0]))
    interval = int(st_cfg.get('UPDATE_PSEUDO_LABEL_INTERVAL', 1))
    max_gt = source_set.max_gt_boxes
    rng = jax.random.PRNGKey(666)
    for epoch in range(epochs):
        if epoch in update_at or (interval and epoch % interval == 0):
            variables = {'params': state.params,
                         'batch_stats': state.batch_stats}
            save_pseudo_label_epoch(variables, eval_step, target_loader,
                                    st_cfg, ps_label_dir, epoch)
            logger.info('[st] epoch %d: pseudo labels for %d frames',
                        epoch, len(PSEUDO_LABELS))
        src_iter = iter(source_loader)
        losses = []
        for tgt_batch in target_loader:
            try:
                src_batch = next(src_iter)
            except StopIteration:
                src_iter = iter(source_loader)
                src_batch = next(src_iter)
            rng, r1, r2 = jax.random.split(rng, 3)
            state, m_src = train_step(
                state, train_rt.host_to_device_batch(src_batch), r1)
            tgt_host = _substitute_pseudo_labels(
                train_rt.host_to_device_batch(tgt_batch),
                tgt_batch['frame_id'], max_gt)
            state, m_tgt = train_step(state, tgt_host, r2)
            losses.append(float(m_src['loss']) + float(m_tgt['loss']))
        logger.info('[st] epoch %d loss %.4f', epoch,
                    float(np.mean(losses)) if losses else float('nan'))
        if tb_log is not None and losses:
            tb_log.add_scalar('st/epoch_loss', float(np.mean(losses)), epoch)
        ckpt_rt.save_checkpoint(
            ckpt_rt.checkpoint_state(state, epoch=epoch + 1,
                                     it=int(state.step)),
            str(Path(ckpt_dir) / f'checkpoint_epoch_{epoch + 1}'))
    return state
