"""Benchmark one CRB acquisition round on the current chip.

Times the three CRB stages over a synthetic pool shaped like the KITTI AL
workload (BASELINE.md: pool ~3600, SELECT_NUMS=100, K1=5, K2=3 → K1·N=500
stage-2 grads, K2·N=300 GPDB candidates).  Pool size / select count are
scaled by --scale for tractable runs on the tunneled dev chip; per-frame
stage costs are linear in pool size so the full-KITTI wall-clock is the
printed per-frame numbers × the real counts.

Prints one JSON line:
  {"metric": "crb_round_sec", "value": ..., "unit": "s", "vs_baseline": ...}
vs_baseline = 60s target / measured (>=1 is good), at the measured scale.
"""
import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pool', type=int, default=256)
    ap.add_argument('--select', type=int, default=10)
    ap.add_argument('--model', default='pv_rcnn',
                    choices=['pv_rcnn', 'second'])
    args = ap.parse_args()

    from crb_active_3ddet_tpu.utils.common import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np
    from crb_active_3ddet_tpu.config import load_config, CfgNode
    from crb_active_3ddet_tpu.datasets import build_active_dataloader
    from crb_active_3ddet_tpu.models.detectors import build_detector
    from crb_active_3ddet_tpu.query_strategies import build_strategy
    from crb_active_3ddet_tpu.runtime import train as train_rt
    from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

    cfg_file = (REPO_ROOT / 'tools/cfgs/synthetic_models'
                / f'{args.model}_synth.yaml')
    cfg = load_config(cfg_file)
    cfg.DATA_CONFIG.NUM_SCENES = args.pool + 8
    cfg.ACTIVE_TRAIN = CfgNode({
        'METHOD': 'crb', 'AGGREGATION': 'mean',
        'PRE_TRAIN_SAMPLE_NUMS': 8, 'PRE_TRAIN_EPOCH_NUMS': 1,
        'TRAIN_RESUME': False, 'SELECT_NUMS': args.select,
        'SELECT_LABEL_EPOCH_INTERVAL': 1,
        'TOTAL_BUDGET_NUMS': args.select,
        'ACTIVE_CONFIG': {'K1': 5, 'K2': 3, 'BANDWDITH': 5,
                          'CLUSTERING': 'kmeans++'}})
    batch_size = 8
    (lab_set, unlab_set, lab_loader, unlab_loader, _, _) = \
        build_active_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, workers=0,
            training=True, pre_train_sample_nums=8, seed=666)
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
        # cold round (includes jit compiles), then a warm round — the warm
        # number is the steady-state acquisition cost the AL loop pays
        t0 = time.time()
        strat.query(cur_epoch=0)
        cold = time.time() - t0
        t0 = time.time()
        selected = strat.query(cur_epoch=1)
        wall = time.time() - t0
    pool = len(unlab_set)
    per_frame_ms = wall / pool * 1e3
    full_kitti_est = per_frame_ms / 1e3 * 3600 * (
        1.0)  # stage-1 dominates and is linear in pool
    out = {
        'metric': 'crb_round_sec', 'value': round(wall, 2), 'unit': 's',
        'vs_baseline': round(60.0 / wall, 3),
        'pool': pool, 'select': args.select,
        'per_frame_ms': round(per_frame_ms, 2),
        'cold_round_sec': round(cold, 2),
        'selected': len(selected),
        'stages': {k: round(v, 2)
                   for k, v in getattr(strat, 'stage_times', {}).items()},
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
