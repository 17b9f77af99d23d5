"""Break the CRB stage-1 pool scan into host vs device wall-clock.

The score fn's device time measured by a trace is small; the question is
where the per-batch wall-clock goes: dataset __getitem__/collate,
host→device transfer, dispatch, or the end-of-scan materialization.

Usage: python tools/profile_stage1_host.py [pool] [batch]
"""
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np

from crb_active_3ddet_tpu.utils.common import enable_compilation_cache
enable_compilation_cache()
import jax

from crb_active_3ddet_tpu.config import load_config, CfgNode
from crb_active_3ddet_tpu.datasets import build_active_dataloader
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.query_strategies import build_strategy
from crb_active_3ddet_tpu.runtime import train as train_rt
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

pool = int(sys.argv[1]) if len(sys.argv) > 1 else 128
batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 4

cfg = load_config(REPO_ROOT / 'tools/cfgs/synthetic_models/pv_rcnn_synth.yaml')
cfg.DATA_CONFIG.NUM_SCENES = pool + 8
cfg.ACTIVE_TRAIN = CfgNode({
    'METHOD': 'crb', 'AGGREGATION': 'mean',
    'PRE_TRAIN_SAMPLE_NUMS': 8, 'PRE_TRAIN_EPOCH_NUMS': 1,
    'TRAIN_RESUME': False, 'SELECT_NUMS': 4,
    'SELECT_LABEL_EPOCH_INTERVAL': 1, 'TOTAL_BUDGET_NUMS': 4,
    'ACTIVE_CONFIG': {'K1': 5, 'K2': 3, 'BANDWDITH': 5,
                      'CLUSTERING': 'kmeans++'}})
(lab_set, unlab_set, lab_loader, unlab_loader, _, _) = \
    build_active_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
                            workers=0, training=True,
                            pre_train_sample_nums=8, seed=666)
model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                       dataset=lab_set)
optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
state = train_rt.init_train_state(model, optimizer, lab_set, batch_size)
variables = {'params': state.params, 'batch_stats': state.batch_stats}

import tempfile
with tempfile.TemporaryDirectory() as tmp:
    strat = build_strategy('crb', model, variables, lab_loader,
                           unlab_loader, rank=0, active_label_dir=tmp,
                           cfg=cfg)
    score_fn = strat.build_score_fn(mc_dropout=True, num_mc=5)
    rng = jax.random.PRNGKey(0)

    # compile
    it = iter(unlab_loader)
    b0 = next(it)
    hb0 = train_rt.host_to_device_batch(b0)
    t0 = time.time()
    out = score_fn(strat.variables, hb0, rng)
    np.asarray(out['label_entropy'])
    print(f'compile+run {time.time() - t0:.1f}s', flush=True)

    # device-time truth: K dispatches, materialize all at the end
    t0 = time.time()
    outs = [score_fn(strat.variables, hb0, jax.random.PRNGKey(i))
            for i in range(16)]
    for o in outs:
        np.asarray(o['label_entropy'])
    dt = (time.time() - t0) / 16
    print(f'score steady-state (same batch, pipelined): '
          f'{dt * 1e3:.1f} ms/batch{batch_size}', flush=True)

    # full scan breakdown
    t_load = t_h2d = t_disp = 0.0
    pending = []
    t_all = time.time()
    t0 = time.time()
    for batch in unlab_loader:
        t_load += time.time() - t0
        t1 = time.time()
        hb = train_rt.host_to_device_batch(batch)
        t_h2d += time.time() - t1
        t1 = time.time()
        rng, sub = jax.random.split(rng)
        pending.append((batch['frame_id'],
                        score_fn(strat.variables, hb, sub)))
        t_disp += time.time() - t1
        t0 = time.time()
    t1 = time.time()
    records = {}
    for frame_ids, sig in pending:
        sig = jax.tree.map(np.asarray, sig)
        for i, fid in enumerate(frame_ids):
            records[fid] = {k: v[i] for k, v in sig.items()}
            strat.save_points(fid, records[fid])
    t_mat = time.time() - t1
    total = time.time() - t_all
    n = len(records)
    print(f'scan pool={n}: total {total:.1f}s '
          f'({total / n * 1e3:.0f} ms/frame)', flush=True)
    print(f'  loader(getitem+collate): {t_load:.1f}s', flush=True)
    print(f'  host_to_device:          {t_h2d:.1f}s', flush=True)
    print(f'  dispatch:                {t_disp:.1f}s', flush=True)
    print(f'  materialize+bookkeep:    {t_mat:.1f}s', flush=True)
