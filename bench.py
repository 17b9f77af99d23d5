"""Benchmark: detection forward throughput (scans/sec) on the current chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline context (BASELINE.md): the reference publishes no throughput; the
north-star target is >=2x A100 scans/sec for SECOND on a v5e chip.  We use
40 scans/sec as the nominal A100 SECOND-KITTI inference throughput
(OpenPCDet community benchmarks), so vs_baseline = value / 40.
"""

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

A100_SECOND_SCANS_PER_SEC = 40.0


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from crb_active_3ddet_tpu.utils.common import enable_compilation_cache
    enable_compilation_cache()
    from crb_active_3ddet_tpu.config import load_config, CfgNode
    from crb_active_3ddet_tpu.datasets import build_dataloader
    from crb_active_3ddet_tpu.models.detectors import build_detector
    from crb_active_3ddet_tpu.runtime import train as train_rt
    from crb_active_3ddet_tpu.runtime import eval as eval_rt
    from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

    cfg = load_config(REPO_ROOT / 'tools/cfgs/synthetic_models/second_synth.yaml')
    batch_size = 4
    data_cfg = cfg.DATA_CONFIG
    test_set, test_loader, _ = build_dataloader(
        data_cfg, cfg.CLASS_NAMES, batch_size, training=False, workers=0)
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                           dataset=test_set)
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    state = train_rt.init_train_state(model, optimizer, test_set, batch_size)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    eval_step = eval_rt.make_eval_step(model, test_set,
                                       cfg.MODEL.POST_PROCESSING,
                                       num_class=len(cfg.CLASS_NAMES))

    batches = [train_rt.host_to_device_batch(b) for _, b in
               zip(range(4), test_loader)]
    # warmup/compile
    preds, _ = eval_step(variables, batches[0])
    jax.block_until_ready(preds)

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        preds, _ = eval_step(variables, batches[i % len(batches)])
    jax.block_until_ready(preds)
    dt = time.perf_counter() - t0
    scans_per_sec = n_iters * batch_size / dt

    print(json.dumps({
        'metric': 'second_synth_scans_per_sec',
        'value': round(scans_per_sec, 2),
        'unit': 'scans/sec/chip',
        'vs_baseline': round(scans_per_sec / A100_SECOND_SCANS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
