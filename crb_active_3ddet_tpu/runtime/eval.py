"""Evaluation loop.

Parity: ``tools/eval_utils/eval_utils.py`` (eval_one_epoch :53-154 —
inference with ``batch_dict['test']=True`` semantics, recall statistics,
dataset.evaluation).  Jitted fixed-shape forward + NMS; host side converts
padded preds to per-frame annos.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import post_processing as pp
from .train import prepare_device_batch, host_to_device_batch


def make_eval_step(model, dataset, post_cfg, num_class):
    voxel_cfg = dataset.voxel_cfg
    grid_size = tuple(int(g) for g in dataset.grid_size)
    pcr = tuple(float(x) for x in dataset.point_cloud_range)
    vs = tuple(float(v) for v in dataset.voxel_size)

    @jax.jit
    def eval_step(variables, host_batch):
        batch = prepare_device_batch(host_batch, voxel_cfg, grid_size, pcr, vs)
        out = model.apply(variables, batch, training=False)
        preds = pp.post_processing(out, post_cfg, num_class=num_class)
        rec = None
        if 'gt_boxes' in batch:
            gt = batch['gt_boxes']
            gt_valid = jnp.abs(gt).sum(-1) > 0
            rec = jax.vmap(pp.generate_recall_record)(
                preds['pred_boxes'], preds['pred_valid'], gt[..., :7], gt_valid)
        return preds, rec

    return eval_step


def eval_one_epoch(variables, eval_step, dataset, loader, class_names,
                   logger=None, result_dir=None, save_result_pkl=True,
                   profiler=None):
    """Returns (ap_result_str, ap_dict, recall_dict). Dumps result.pkl into
    result_dir (parity: eval_utils.py writes det_annos for visualize.py)."""
    det_annos = []
    recall_acc = {}
    num_frames = 0
    t0 = time.time()

    def drain(entry):
        nonlocal num_frames
        batch, preds, rec = entry
        preds = jax.tree.map(np.asarray, preds)
        det_annos.extend(dataset.generate_prediction_dicts(
            batch, preds, class_names, output_path=result_dir))
        num_frames += batch['batch_size']
        if rec is not None:
            rec = jax.tree.map(lambda x: np.asarray(x).sum(), rec)
            for k, v in rec.items():
                recall_acc[k] = recall_acc.get(k, 0) + int(v)

    # keep a small window of dispatched batches in flight so the device
    # never waits on the per-batch host sync (the host-side anno conversion
    # overlaps the next batches' compute)
    window = []
    for batch in loader:
        host_batch = host_to_device_batch(batch)
        if profiler is not None:
            profiler.step_start()
        preds, rec = eval_step(variables, host_batch)
        if profiler is not None:
            jax.block_until_ready(preds)
            profiler.step_end()
        window.append((batch, preds, rec))
        if len(window) >= 8:
            drain(window.pop(0))
    for entry in window:
        drain(entry)
    if profiler is not None:
        profiler.close()
    sec_per_example = (time.time() - t0) / max(num_frames, 1)
    if logger is not None:
        logger.info('Eval: %d frames, %.4f s/frame', num_frames, sec_per_example)
        gt_cnt = max(recall_acc.get('gt', 1), 1)
        for k, v in sorted(recall_acc.items()):
            if k != 'gt':
                logger.info('recall %s: %.4f', k, v / gt_cnt)
    if result_dir is not None and save_result_pkl:
        import pickle
        from pathlib import Path
        Path(result_dir).mkdir(parents=True, exist_ok=True)
        with open(Path(result_dir) / 'result.pkl', 'wb') as f:
            pickle.dump(det_annos, f)
    ap_result_str, ap_dict = dataset.evaluation(det_annos, class_names)
    ap_dict = dict(ap_dict or {})
    ap_dict['sec_per_example'] = sec_per_example
    return ap_result_str, ap_dict, recall_acc
