"""CRB stage-1 mesh-scaling evidence (VERDICT r4 #1d).

The claim under test: pool scoring is embarrassingly parallel over the DP
mesh, so a v5e-8 divides the measured single-chip stage-1 wall (~linear in
pool size) by ~8.  This box has ONE physical core, so wall-clock of an
8-virtual-device CPU mesh cannot show the speedup (all 8 "devices" share
the core); what CAN be measured honestly is the compiled per-device
program: XLA cost analysis of the sharded scorer at mesh sizes 1/2/4/8.
Per-device FLOPs halving at each doubling + a collective byte count that
stays negligible is the compile-level substantiation that the sharded
program divides the work, and test_parallel_sparse.py already proves the
sharded pass is numerically identical to single-device.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python tools/profile.py mesh-scaling [batch]
Prints one row per mesh size: per-device FLOPs/batch, bytes accessed,
and the ratio vs the 1-device program.
"""
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO_ROOT))

import os
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np
import jax

jax.config.update('jax_platforms', 'cpu')

from crb_active_3ddet_tpu.utils.common import enable_compilation_cache
enable_compilation_cache()

from crb_active_3ddet_tpu.config import load_config, CfgNode
from crb_active_3ddet_tpu.datasets import build_active_dataloader
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.query_strategies import build_strategy
from crb_active_3ddet_tpu.runtime import train as train_rt
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

# the slim CRB stage-1 signal set (crb_sampling.py:65-68)
CRB_SIGNALS = ('label_entropy', 'pred_density', 'pred_labels',
               'pred_valid', 'batch_rcnn_cls', 'batch_rcnn_reg')


def build(batch_size, n_devices):
    from crb_active_3ddet_tpu import parallel as par
    cfg = load_config(REPO_ROOT / 'tools/cfgs/synthetic_models'
                      / 'pv_rcnn_synth.yaml')
    cfg.DATA_CONFIG.NUM_SCENES = 64
    cfg.ACTIVE_TRAIN = CfgNode({
        'METHOD': 'crb', 'AGGREGATION': 'mean',
        'PRE_TRAIN_SAMPLE_NUMS': 8, 'PRE_TRAIN_EPOCH_NUMS': 1,
        'TRAIN_RESUME': False, 'SELECT_NUMS': 8,
        'SELECT_LABEL_EPOCH_INTERVAL': 1, 'TOTAL_BUDGET_NUMS': 8,
        'ACTIVE_CONFIG': {'K1': 2, 'K2': 1, 'BANDWDITH': 5,
                          'CLUSTERING': 'kmeans++'}})
    (lab_set, unlab_set, lab_loader, unlab_loader, _, _) = \
        build_active_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, workers=0,
            training=True, pre_train_sample_nums=8, seed=666)
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                           dataset=lab_set)
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    state = train_rt.init_train_state(model, optimizer, lab_set, batch_size)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    strat = build_strategy('crb', model, variables, lab_loader,
                           unlab_loader, rank=0, active_label_dir='/tmp/ms',
                           cfg=cfg)
    # override the auto-detected all-devices mesh to sweep mesh sizes
    strat.mesh = par.make_mesh(jax.devices()[:n_devices]) \
        if n_devices > 1 else None
    score_fn = strat.build_score_fn(mc_dropout=True, num_mc=5,
                                    signals=frozenset(CRB_SIGNALS))
    host_batch = next(iter(unlab_loader))
    dev_batch = train_rt.host_to_device_batch(host_batch)
    return score_fn, variables, dev_batch


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    os.makedirs('/tmp/ms', exist_ok=True)
    rows = []
    for nd in (1, 2, 4, 8):
        if nd > len(jax.devices()):
            break
        score_fn, variables, dev_batch = build(batch_size, nd)
        rng = jax.random.PRNGKey(0)
        lowered = score_fn.lower(variables, dev_batch, rng)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get('flops', 0.0))
        byt = float(ca.get('bytes accessed', 0.0))
        rows.append((nd, flops, byt))
        base = rows[0][1]
        print(f'devices={nd}  per-device GFLOP/batch={flops / 1e9:9.3f}  '
              f'bytes={byt / 1e9:7.3f} GB  '
              f'vs 1-dev={flops / base:6.3f}', flush=True)
    print('\nExpected ~1/N per-device FLOPs: the sharded scorer divides the '
          'pool batch across the mesh; numerical shard-parity is proven in '
          'tests/test_parallel_sparse.py.')


if __name__ == '__main__':
    main()
