"""Capture a jax.profiler trace of the FULL eval step (bench.py workload:
batch 8, production voxel caps) on the real chip.

Usage: python tools/profile_trace_eval.py [out_dir] [batch_size]
Then:  python tools/trace_report.py <out_dir> 30 <iters>
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
from crb_active_3ddet_tpu.config import load_config
from crb_active_3ddet_tpu.datasets import build_dataloader
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.runtime import train as train_rt
from crb_active_3ddet_tpu.runtime import eval as eval_rt
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

out_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/jaxtrace_eval'
batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 8

t00 = time.time()


def log(m):
    print(f'[{time.time() - t00:7.1f}s] {m}', flush=True)


cfg = load_config(REPO_ROOT / 'tools/cfgs/synthetic_models/second_synth.yaml')
test_set, test_loader, _ = build_dataloader(
    cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, training=False, workers=0)
model = build_detector(cfg.MODEL, len(cfg.CLASS_NAMES), test_set)
optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
state = train_rt.init_train_state(model, optimizer, test_set, batch_size)
log('state init done')

# brief pretrain like bench.py: an untrained model keeps every anchor above
# SCORE_THRESH, driving the NMS fixpoint to its worst case — the trace would
# then overstate the NMS share vs the production (trained) workload
train_set, train_loader, _ = build_dataloader(
    cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, training=True, workers=0)
train_step = train_rt.make_train_step(model, optimizer, train_set)
rng = jax.random.PRNGKey(0)
it = iter(train_loader)
for _ in range(12):
    try:
        b = next(it)
    except StopIteration:
        it = iter(train_loader)
        b = next(it)
    rng, sub = jax.random.split(rng)
    state, _m = train_step(state, train_rt.host_to_device_batch(b), sub)
log('pretrain done')

variables = {'params': state.params, 'batch_stats': state.batch_stats}
eval_step = eval_rt.make_eval_step(model, test_set, cfg.MODEL.POST_PROCESSING,
                                   num_class=len(cfg.CLASS_NAMES))
batch = train_rt.host_to_device_batch(next(iter(test_loader)))
log('warmup (compile/cache-load)...')
preds, _ = eval_step(variables, batch)
np.asarray(preds['pred_scores'])
log('warm; tracing 2 iterations')
jax.profiler.start_trace(out_dir)
for _ in range(2):
    preds, _ = eval_step(variables, batch)
    np.asarray(preds['pred_scores'])
jax.profiler.stop_trace()
log('trace done -> ' + out_dir)
