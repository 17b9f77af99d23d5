"""Benchmark one CRB acquisition round on the current chip.

Times the three CRB stages over a synthetic pool shaped like the KITTI AL
workload.  Defaults are the HONEST shape (BASELINE.md: pool ~3600,
SELECT_NUMS=100, K1=5, K2=3 → K1·N=500 stage-2 grads, K2·N=300 GPDB
candidates) — pass --pool/--select to scale down for tractable smoke runs;
per-frame stage costs are linear in pool size.

The model is briefly pretrained (12 steps) before the timed rounds: the AL
loop always queries with a pretrained model (reference
train_active_utils.py:162-205 pretrains 40 epochs before the first query),
and an untrained net keeps every anchor alive, driving the NMS fixpoint to
its worst case — timing it would overstate the acquisition cost.

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
    ap.add_argument('--pool', type=int, default=3584)
    ap.add_argument('--select', type=int, default=100)
    ap.add_argument('--batch', type=int, default=16,
                    help='pool-scan batch size')
    ap.add_argument('--grad-chunk', type=int, default=8,
                    help='stage-2 per-sample-grad chunk (a batch-16 '
                         'PV-RCNN backward OOMs a 16G v5e)')
    ap.add_argument('--pretrain-batch', type=int, default=4,
                    help='pretrain train-step batch (kept small: the '
                         'batch-16 TRAIN step OOMs, the eval scan does not)')
    ap.add_argument('--model', default='pv_rcnn',
                    choices=['pv_rcnn', 'second'])
    ap.add_argument('--pretrain-steps', type=int, default=12)
    ap.add_argument('--skip-cold', action='store_true',
                    help='run one round only (skip the warm re-run)')
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
        'GRAD_CHUNK': args.grad_chunk,
        'ACTIVE_CONFIG': {'K1': 5, 'K2': 3, 'BANDWDITH': 5,
                          'CLUSTERING': 'kmeans++'}})
    batch_size = args.batch
    (lab_set, unlab_set, lab_loader, unlab_loader, _, _) = \
        build_active_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, workers=0,
            training=True, pre_train_sample_nums=8, seed=666)
    # separate small-batch loader for the pretrain TRAIN steps (see
    # --pretrain-batch)
    (_, _, pre_loader, _, _, _) = build_active_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.pretrain_batch, workers=0,
        training=True, pre_train_sample_nums=8, seed=666)
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                           dataset=lab_set)
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    state = train_rt.init_train_state(model, optimizer, lab_set,
                                      args.pretrain_batch)

    # brief pretrain (see module docstring)
    train_step = train_rt.make_train_step(model, optimizer, lab_set)
    rng = jax.random.PRNGKey(0)
    it = iter(pre_loader)
    t0 = time.time()
    for _ in range(args.pretrain_steps):
        try:
            b = next(it)
        except StopIteration:
            it = iter(pre_loader)
            b = next(it)
        rng, sub = jax.random.split(rng)
        state, _m = train_step(state, train_rt.host_to_device_batch(b), sub)
    jax.block_until_ready(state.params)
    pretrain_sec = time.time() - t0
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        strat = build_strategy('crb', model, variables, lab_loader,
                               unlab_loader, rank=0, active_label_dir=tmp,
                               cfg=cfg)
        # cold round (includes jit compiles), then a warm round — the warm
        # number is the steady-state acquisition cost the AL loop pays
        t0 = time.time()
        selected = strat.query(cur_epoch=0)
        cold = time.time() - t0
        cold_stages = dict(getattr(strat, 'stage_times', {}))
        if args.skip_cold:
            wall, warm_stages = cold, cold_stages
        else:
            t0 = time.time()
            selected = strat.query(cur_epoch=1)
            wall = time.time() - t0
            warm_stages = dict(getattr(strat, 'stage_times', {}))
    pool = len(unlab_set)
    per_frame_ms = wall / pool * 1e3
    out = {
        'metric': 'crb_round_sec', 'value': round(wall, 2), 'unit': 's',
        'vs_baseline': round(60.0 / wall, 3),
        'pool': pool, 'select': args.select, 'batch': batch_size,
        'per_frame_ms': round(per_frame_ms, 2),
        'cold_round_sec': round(cold, 2),
        'pretrain_sec': round(pretrain_sec, 1),
        'selected': len(selected),
        'stages': {k: round(v, 2) for k, v in warm_stages.items()},
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
