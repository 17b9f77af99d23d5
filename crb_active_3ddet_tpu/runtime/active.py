"""Active-learning training driver.

Parity: ``tools/train_utils/train_active_utils.py`` (train_model_active
:85-376 — save init weights, PHASE A pretrain, selection-round boundaries,
reset-to-init + retrain per round) and
``pcdet/utils/active_training_utils.py`` (select_active_labels :240-325 —
build strategy, resume pickled selections, move frames between pools,
rebuild both dataloaders).
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path

import jax
import numpy as np

from ..datasets import (build_active_dataloader, _identity_attrs,
                        loader_batch_size)
from ..models import build_network
from ..query_strategies import build_strategy
from . import checkpoint as ckpt_rt
from . import train as train_rt
from .optimization import build_optimizer


def select_active_labels(model, variables, labelled_loader, unlabelled_loader,
                         rank, logger, method, cur_epoch=None,
                         dist_train=False, active_label_dir=None, cfg=None,
                         tb_log=None):
    """Parity: ``active_training_utils.select_active_labels:240-325``.
    Returns (labelled_loader, unlabelled_loader, selected_frames)."""
    resume_path = Path(active_label_dir) / \
        f'selected_frames_epoch_{cur_epoch}_rank_{rank}.pkl'
    if resume_path.exists():
        with open(resume_path, 'rb') as f:
            selected_frames = pickle.load(f)['frame_id']
        logger.info('found and resumed %s', resume_path)
    else:
        strategy = build_strategy(method, model, variables, labelled_loader,
                                  unlabelled_loader, rank, active_label_dir,
                                  cfg)
        selected_frames = list(strategy.query(cur_epoch=cur_epoch))
        strategy.save_active_labels(selected_frames=selected_frames,
                                    cur_epoch=cur_epoch)
        strategy.update_dashboard(cur_epoch=cur_epoch,
                                  accumulated_iter=cur_epoch,
                                  metrics=tb_log)

    labelled_set = labelled_loader.dataset
    unlabelled_set = unlabelled_loader.dataset
    id_attr, info_attr = _identity_attrs(unlabelled_set)

    sel_ids = list(getattr(labelled_set, id_attr))
    sel_infos = list(getattr(labelled_set, info_attr))
    unsel_ids, unsel_infos = [], []
    for fid, info in zip(getattr(unlabelled_set, id_attr),
                         getattr(unlabelled_set, info_attr)):
        if fid in selected_frames:
            sel_ids.append(fid)
            sel_infos.append(info)
        else:
            unsel_ids.append(fid)
            unsel_infos.append(info)

    batch_size = loader_batch_size(labelled_loader)
    workers = labelled_loader.num_workers
    active_training = (tuple(sel_ids), tuple(sel_infos),
                       tuple(unsel_ids), tuple(unsel_infos))
    (labelled_set, unlabelled_set, labelled_loader, unlabelled_loader,
     _, _) = build_active_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, dist_train,
        workers=workers, logger=logger, training=True,
        active_training=active_training)
    return labelled_loader, unlabelled_loader, selected_frames


def _loss_net_mask(params, invert=False):
    """Pytree mask selecting (or excluding) the roi_head loss_net subtree
    (parity: LOSS_NET_SKIP param freeze, optimization/__init__.py:13-15)."""
    import jax

    def mark(path, _):
        in_loss_net = any(getattr(p, 'key', None) == 'loss_net' for p in path)
        return in_loss_net != invert
    return jax.tree_util.tree_map_with_path(mark, params)


def make_lossnet_train_step(model, optimizer, dataset):
    """Jitted LossNet-only training step (parity:
    train_active_utils.py:242-296 — margin-ranking loss of predicted vs true
    per-sample detector losses, only loss-net params updated)."""
    import optax
    from ..utils import loss_utils

    voxel_cfg = dataset.voxel_cfg
    grid_size = tuple(int(g) for g in dataset.grid_size)
    pcr = tuple(float(x) for x in dataset.point_cloud_range)
    vs = tuple(float(v) for v in dataset.voxel_size)

    import jax

    @jax.jit
    def step(state: train_rt.TrainState, host_batch, rng):
        batch = train_rt.prepare_device_batch(host_batch, voxel_cfg,
                                              grid_size, pcr, vs)

        def loss_fn(params):
            out, mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, training=True, mutable=['batch_stats'],
                rngs={'dropout': rng})
            per_sample, _ = model.compute_loss(out, reduce=False)
            lp = out['loss_predictions_train']
            ll = loss_utils.loss_pred_loss(
                lp, jax.lax.stop_gradient(per_sample))
            return ll, mutated

        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # zero all non-loss-net grads
        mask = _loss_net_mask(grads)
        grads = jax.tree.map(lambda g, m: g * m, grads,
                             jax.tree.map(float, mask))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params,
                             batch_stats=mutated['batch_stats'],
                             opt_state=opt_state,
                             step=state.step + 1), loss

    return step


def train_loss_net(state, model, labelled_loader, cfg, logger, rng):
    """LLAL pre-selection LossNet fitting phase."""
    epochs = int(cfg.MODEL.ROI_HEAD.get('LOSS_NET_TRAIN_EPOCH', 1))
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION,
                                   total_steps=max(len(labelled_loader), 1)
                                   * epochs)
    step = make_lossnet_train_step(model, optimizer, labelled_loader.dataset)
    state = state.replace(opt_state=optimizer.init(state.params))
    import jax
    for e in range(epochs):
        losses = []
        for batch in labelled_loader:
            rng, sub = jax.random.split(rng)
            state, loss = step(state, train_rt.host_to_device_batch(batch),
                               sub)
            losses.append(float(loss))
        logger.info('[llal] loss-net epoch %d loss %.4f', e,
                    float(np.mean(losses)) if losses else float('nan'))
    return state, rng


def resume_dataset(labelled_loader, unlabelled_loader, active_label_dir,
                   cfg, logger, rank=0):
    """Re-apply all pickled selection rounds to rebuild the labelled split
    after a crash/restart — parity: ``train_utils.resume_datset`` (sic)
    :178-246. Returns (labelled_loader, unlabelled_loader, rounds_applied)."""
    import glob
    import re
    pkls = sorted(
        glob.glob(str(Path(active_label_dir)
                      / f'selected_frames_epoch_*_rank_{rank}.pkl')),
        key=lambda p: int(re.search(r'epoch_(\d+)_', p).group(1)))
    rounds = 0
    for pkl_path in pkls:
        with open(pkl_path, 'rb') as f:
            selected = set(pickle.load(f)['frame_id'])
        lab, unlab = labelled_loader.dataset, unlabelled_loader.dataset
        id_attr, info_attr = _identity_attrs(unlab)
        sel_ids = list(getattr(lab, id_attr))
        sel_infos = list(getattr(lab, info_attr))
        unsel_ids, unsel_infos = [], []
        for fid, info in zip(getattr(unlab, id_attr), getattr(unlab, info_attr)):
            if fid in selected:
                sel_ids.append(fid)
                sel_infos.append(info)
            else:
                unsel_ids.append(fid)
                unsel_infos.append(info)
        (ls, us, labelled_loader, unlabelled_loader, _, _) = \
            build_active_dataloader(
                cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                loader_batch_size(labelled_loader),
                False, workers=labelled_loader.num_workers, logger=logger,
                training=True,
                active_training=(tuple(sel_ids), tuple(sel_infos),
                                 tuple(unsel_ids), tuple(unsel_infos)))
        rounds += 1
    if rounds and logger is not None:
        logger.info('resume_dataset: replayed %d selection rounds '
                    '(labelled pool %d)', rounds, len(labelled_loader.dataset))
    return labelled_loader, unlabelled_loader, rounds


def train_model_active(cfg, args, batch_size, logger, output_dir, ckpt_dir,
                       workers=4, rank=0, mesh=None, tb_log=None):
    """The AL outer loop (parity: train_active_utils.train_model_active).
    With ``mesh``, every retrain phase runs DP-sharded over the chips and
    pool scoring shards automatically (Strategy.mesh)."""
    active_cfg = cfg.ACTIVE_TRAIN
    active_label_dir = output_dir / 'active_labels'
    backbone_dir = output_dir / 'backbone'
    active_label_dir.mkdir(parents=True, exist_ok=True)
    backbone_dir.mkdir(parents=True, exist_ok=True)

    (labelled_set, unlabelled_set, labelled_loader, unlabelled_loader,
     _, _) = build_active_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, False,
        workers=workers, logger=logger, training=True,
        pre_train_sample_nums=active_cfg.PRE_TRAIN_SAMPLE_NUMS, seed=666)

    model = build_network(model_cfg=cfg.MODEL,
                          num_class=len(cfg.CLASS_NAMES), dataset=labelled_set)

    pretrain_epochs = int(active_cfg.PRE_TRAIN_EPOCH_NUMS)
    interval = int(active_cfg.SELECT_LABEL_EPOCH_INTERVAL)
    num_rounds = int(active_cfg.TOTAL_BUDGET_NUMS) // int(active_cfg.SELECT_NUMS)
    total_epochs = pretrain_epochs + num_rounds * interval
    logger.info('AL schedule: pretrain %d epochs, %d rounds x %d epochs '
                '(select %d/round, budget %d)', pretrain_epochs, num_rounds,
                interval, active_cfg.SELECT_NUMS, active_cfg.TOTAL_BUDGET_NUMS)

    steps_per_epoch = max(len(labelled_loader), 1)
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION,
                                   total_steps=steps_per_epoch * pretrain_epochs)
    state = train_rt.init_train_state(model, optimizer, labelled_set,
                                      batch_size)
    rng = jax.random.PRNGKey(666)

    # save init weights — every round retrains from scratch from these
    # (parity: train_active_utils.py:97-105,320-322)
    init_ckpt_path = backbone_dir / 'init_checkpoint'
    if not (backbone_dir / 'init_checkpoint.pkl').exists():
        ckpt_rt.save_checkpoint(
            ckpt_rt.checkpoint_state(state, epoch=0, it=0), str(init_ckpt_path))
    init_ckpt = ckpt_rt.load_checkpoint(str(init_ckpt_path) + '.pkl')

    if mesh is not None:
        from ..parallel import place_replicated
        state = place_replicated(state, mesh)
    train_step = train_rt.make_train_step(model, optimizer, labelled_set,
                                          mesh=mesh)

    # ---------------- PHASE A: pretrain -------------------------------------
    pretrain_ckpt, resumed_epoch = (None, 0)
    if active_cfg.get('TRAIN_RESUME', False):
        pretrain_ckpt, resumed_epoch = ckpt_rt.find_latest_checkpoint(backbone_dir)
    if pretrain_ckpt and resumed_epoch >= pretrain_epochs:
        state = ckpt_rt.restore_train_state(
            state, ckpt_rt.load_checkpoint(pretrain_ckpt))
        logger.info('resumed pretrain from %s', pretrain_ckpt)
    else:
        for epoch in range(pretrain_epochs):
            state, metrics, rng = train_rt.train_one_epoch(
                state, train_step, labelled_loader, rng, logger=logger,
                cur_epoch=epoch, tb_log=tb_log)
            logger.info('[pretrain] epoch %d loss %.4f', epoch, metrics['loss'])
            if tb_log is not None:
                tb_log.add_scalar('train/epoch_loss', metrics['loss'], epoch)
        ckpt_rt.save_checkpoint(
            ckpt_rt.checkpoint_state(state, epoch=pretrain_epochs,
                                     it=int(state.step)),
            str(backbone_dir / f'checkpoint_epoch_{pretrain_epochs}'))

    # ---------------- PHASE B: selection rounds -----------------------------
    cur_epoch = pretrain_epochs
    for round_idx in range(num_rounds):
        logger.info('=== selection round %d/%d (epoch %d) ===',
                    round_idx + 1, num_rounds, cur_epoch)
        # crash-resume: if this round's final ckpt exists, replay its
        # selection into the loaders and skip retraining (parity:
        # train_utils.resume_datset + round short-circuit)
        done_ckpt = Path(ckpt_dir) / f'checkpoint_epoch_{cur_epoch + interval}.pkl'
        sel_pkl = Path(active_label_dir) / \
            f'selected_frames_epoch_{cur_epoch}_rank_{rank}.pkl'
        if active_cfg.get('TRAIN_RESUME', False) and done_ckpt.exists() \
                and sel_pkl.exists():
            with open(sel_pkl, 'rb') as f:
                selected = set(pickle.load(f)['frame_id'])
            lab, unlab = labelled_loader.dataset, unlabelled_loader.dataset
            id_attr, info_attr = _identity_attrs(unlab)
            sel_ids = list(getattr(lab, id_attr)) + [
                fid for fid in getattr(unlab, id_attr) if fid in selected]
            sel_infos = list(getattr(lab, info_attr)) + [
                info for fid, info in zip(getattr(unlab, id_attr),
                                          getattr(unlab, info_attr))
                if fid in selected]
            unsel = [(fid, info) for fid, info in
                     zip(getattr(unlab, id_attr), getattr(unlab, info_attr))
                     if fid not in selected]
            (labelled_set, unlabelled_set, labelled_loader,
             unlabelled_loader, _, _) = build_active_dataloader(
                cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, False,
                workers=workers, logger=logger, training=True,
                active_training=(tuple(sel_ids), tuple(sel_infos),
                                 tuple(f for f, _ in unsel),
                                 tuple(i for _, i in unsel)))
            state = ckpt_rt.restore_train_state(
                state, ckpt_rt.load_checkpoint(str(done_ckpt)))
            cur_epoch += interval
            logger.info('round %d already complete — resumed from %s',
                        round_idx + 1, done_ckpt)
            continue
        if (active_cfg.METHOD == 'llal'
                and cfg.MODEL.get('ROI_HEAD', {}).get('LOSS_NET', None)):
            # fit the LossNet before querying (train_active_utils.py:242-296)
            state, rng = train_loss_net(state, model, labelled_loader, cfg,
                                        logger, rng)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        labelled_loader, unlabelled_loader, selected = select_active_labels(
            model, variables, labelled_loader, unlabelled_loader, rank,
            logger, method=active_cfg.METHOD, cur_epoch=cur_epoch,
            active_label_dir=active_label_dir, cfg=cfg, tb_log=tb_log)
        logger.info('selected %d frames; labelled pool now %d', len(selected),
                    len(labelled_loader.dataset))

        # reset to init weights, fresh optimizer/schedule for this round
        steps_per_epoch = max(len(labelled_loader), 1)
        optimizer, _ = build_optimizer(
            cfg.OPTIMIZATION, total_steps=steps_per_epoch * interval)
        state = train_rt.init_train_state(model, optimizer,
                                          labelled_loader.dataset, batch_size)
        state = ckpt_rt.restore_train_state(state, init_ckpt)
        if mesh is not None:
            from ..parallel import place_replicated
            state = place_replicated(state, mesh)
        train_step = train_rt.make_train_step(model, optimizer,
                                              labelled_loader.dataset,
                                              mesh=mesh)
        for e in range(interval):
            state, metrics, rng = train_rt.train_one_epoch(
                state, train_step, labelled_loader, rng, logger=logger,
                cur_epoch=cur_epoch + e, tb_log=tb_log)
            logger.info('[round %d] epoch %d loss %.4f', round_idx + 1,
                        cur_epoch + e, metrics['loss'])
            if tb_log is not None:
                tb_log.add_scalar('train/epoch_loss', metrics['loss'],
                                  cur_epoch + e)
        cur_epoch += interval
        ckpt_rt.save_checkpoint(
            ckpt_rt.checkpoint_state(state, epoch=cur_epoch,
                                     it=int(state.step)),
            str(Path(ckpt_dir) / f'checkpoint_epoch_{cur_epoch}'))
    return state
