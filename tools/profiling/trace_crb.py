"""Trace the CRB stage-1 score fn and stage-2 grad fn (PV-RCNN) on the
real chip — the AL round's two dominant costs.

Usage: python tools/profile_trace_crb.py [out_dir]
"""
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import jax

from crb_active_3ddet_tpu.utils.common import enable_compilation_cache
enable_compilation_cache()
from crb_active_3ddet_tpu.config import load_config, CfgNode
from crb_active_3ddet_tpu.datasets import build_active_dataloader
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.query_strategies import build_strategy
from crb_active_3ddet_tpu.runtime import train as train_rt
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/crbtrace'

cfg = load_config(REPO_ROOT / 'tools/cfgs/synthetic_models/pv_rcnn_synth.yaml')
cfg.DATA_CONFIG.NUM_SCENES = 40
cfg.ACTIVE_TRAIN = CfgNode({
    'METHOD': 'crb', 'AGGREGATION': 'mean',
    'PRE_TRAIN_SAMPLE_NUMS': 8, 'PRE_TRAIN_EPOCH_NUMS': 1,
    'TRAIN_RESUME': False, 'SELECT_NUMS': 4,
    'SELECT_LABEL_EPOCH_INTERVAL': 1, 'TOTAL_BUDGET_NUMS': 4,
    'ACTIVE_CONFIG': {'K1': 5, 'K2': 3, 'BANDWDITH': 5,
                      'CLUSTERING': 'kmeans++'}})
batch_size = 4
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
    batch = next(iter(unlab_loader))
    hb = train_rt.host_to_device_batch(batch)
    print('compiling score fn...', flush=True)
    t0 = time.time()
    out = score_fn(variables, hb, rng)
    jax.block_until_ready(out)
    print(f'score compile+run {time.time() - t0:.1f}s', flush=True)
    t0 = time.time()
    for _ in range(4):
        out = score_fn(variables, hb, rng)
    jax.block_until_ready(out)
    print(f'score warm: {(time.time() - t0) / 4 * 1e3:.1f} ms/batch4',
          flush=True)

    grad_fn = strat._build_grad_fn(batch_size)
    targets = ({'cls': np.asarray(out['batch_rcnn_cls']),
                'reg': np.asarray(out['batch_rcnn_reg'])}
               if 'batch_rcnn_cls' in out else {})
    targets = {k: jax.numpy.asarray(v) for k, v in targets.items()}
    print('compiling grad fn...', flush=True)
    t0 = time.time()
    g = grad_fn(variables, hb, rng, targets)
    jax.block_until_ready(g)
    print(f'grad compile+run {time.time() - t0:.1f}s', flush=True)
    t0 = time.time()
    g = grad_fn(variables, hb, rng, targets)
    jax.block_until_ready(g)
    warm = time.time() - t0
    print(f'grad warm: {warm * 1e3:.1f} ms/chunk4', flush=True)

    jax.profiler.start_trace(out_dir)
    out = score_fn(variables, hb, rng)
    jax.block_until_ready(out)
    g = grad_fn(variables, hb, rng, targets)
    jax.block_until_ready(g)
    jax.profiler.stop_trace()
    print('trace ->', out_dir, flush=True)
