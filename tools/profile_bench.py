"""Component-level timing of the SECOND bench workload on the current chip.

Every timed function reduces its outputs to ONE scalar that is fetched to
the host — on the tunneled axon backend this is the only reliable sync.
Run: python tools/profile_bench.py
"""
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import jax
import jax.numpy as jnp

from crb_active_3ddet_tpu.utils.common import enable_compilation_cache
enable_compilation_cache()
from crb_active_3ddet_tpu.config import load_config
from crb_active_3ddet_tpu.datasets import build_dataloader
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.models import post_processing as pp
from crb_active_3ddet_tpu.runtime import train as train_rt
from crb_active_3ddet_tpu.runtime import eval as eval_rt
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer


def treesum(out):
    tot = 0.0
    for x in jax.tree.leaves(out):
        if hasattr(x, 'dtype'):
            tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def timed(fn, args, n=8, name=''):
    float(fn(*args))  # compile + sync
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f'{name:34s} {med * 1e3:9.2f} ms', flush=True)
    return med


def main():
    cfg = load_config(REPO_ROOT / 'tools/cfgs/synthetic_models/second_synth.yaml')
    batch_size = 4
    test_set, test_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, training=False, workers=0)
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                           dataset=test_set)
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    state = train_rt.init_train_state(model, optimizer, test_set, batch_size)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    voxel_cfg = test_set.voxel_cfg
    grid_size = tuple(int(g) for g in test_set.grid_size)
    pcr = tuple(float(x) for x in test_set.point_cloud_range)
    vs = tuple(float(v) for v in test_set.voxel_size)

    host_batch = train_rt.host_to_device_batch(next(iter(test_loader)))

    def prep(hb):
        return train_rt.prepare_device_batch(hb, voxel_cfg, grid_size, pcr, vs)

    timed(jax.jit(lambda hb: treesum(prep(hb))), (host_batch,),
          name='voxelize+prep')

    def upto(stage):
        def f(variables, hb):
            b = prep(hb)
            def run(mdl, b):
                b = mdl.vfe(b, training=False)
                if stage == 'vfe':
                    return b['voxel_features']
                b = mdl.backbone_3d(b, training=False)
                if stage == 'bb3d':
                    return b['encoded_spconv_features']
                b = mdl.map_to_bev(b, training=False)
                b = mdl.backbone_2d(b, training=False)
                if stage == 'bb2d':
                    return b['spatial_features_2d']
                b = mdl.dense_head(b, training=False)
                return (b['batch_cls_preds'], b['batch_box_preds'])
            return treesum(model.apply(variables, b, method=run))
        return jax.jit(f)

    timed(upto('vfe'), (variables, host_batch), name='prep+vfe')
    timed(upto('bb3d'), (variables, host_batch), name='prep+vfe+backbone3d')
    timed(upto('bb2d'), (variables, host_batch), name='prep+...+backbone2d')
    timed(upto('head'), (variables, host_batch), name='prep+...+dense_head')

    post_cfg = cfg.MODEL.POST_PROCESSING

    def full(variables, hb):
        b = prep(hb)
        out = model.apply(variables, b, training=False)
        preds = pp.post_processing(out, post_cfg,
                                   num_class=len(cfg.CLASS_NAMES))
        return treesum(preds)
    timed(jax.jit(full), (variables, host_batch), name='full fwd+postproc')

    eval_step = eval_rt.make_eval_step(model, test_set, post_cfg,
                                       num_class=len(cfg.CLASS_NAMES))

    def estep(variables, hb):
        preds, rec = eval_step(variables, hb)
        return np.asarray(preds['pred_scores']).sum()
    # not jitted on top — mirrors bench.py's measurement
    float(estep(variables, host_batch))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(estep(variables, host_batch))
        ts.append(time.perf_counter() - t0)
    print(f"{'eval_step (bench-style)':34s} {sorted(ts)[4] * 1e3:9.2f} ms",
          flush=True)

    tstep = train_rt.make_train_step(model, optimizer, test_set)
    s = state
    rng = jax.random.PRNGKey(0)
    s, m = tstep(s, host_batch, rng)
    float(m['loss'])
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        s, m = tstep(s, host_batch, rng)
        float(m['loss'])
        ts.append(time.perf_counter() - t0)
    print(f"{'train_step':34s} {sorted(ts)[4] * 1e3:9.2f} ms", flush=True)


if __name__ == '__main__':
    main()
