"""Decompose the SECOND eval step by phase via truncated-topology variants.

Each variant is ONE jit dispatch per call; pipelined timing; successive
differences cancel the per-dispatch overhead:
  v0 voxelize           → voxelize cost
  v1 +vfe+backbone_3d   → sparse backbone cost
  v2 +map_to_bev+bev2d  → BEV backbone cost
  v3 +dense_head        → head cost
  v4 full eval step     → post-processing/NMS/recall cost

Usage: python tools/profile_eval_phases.py [voxel_cap] [batch]
"""
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO_ROOT))

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


def timed(fn, args, n=16, name=''):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / n
    print(f'{name:34s} {dt * 1e3:9.2f} ms/call', flush=True)
    return dt


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg = load_config(REPO_ROOT / 'tools/cfgs/synthetic_models/second_synth.yaml')
    for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if p['NAME'] == 'transform_points_to_voxels':
            p['MAX_NUMBER_OF_VOXELS'] = {'train': cap, 'test': cap}
    test_set, test_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, training=False,
        workers=0)
    voxel_cfg = test_set.voxel_cfg
    grid_size = tuple(int(g) for g in test_set.grid_size)
    pcr = tuple(float(x) for x in test_set.point_cloud_range)
    vs = tuple(float(v) for v in test_set.voxel_size)
    batch = train_rt.host_to_device_batch(next(iter(test_loader)))
    print(f'=== cap {cap}, batch {batch_size} ===', flush=True)

    @jax.jit
    def v0(hb):
        b = train_rt.prepare_device_batch(hb, voxel_cfg, grid_size, pcr, vs)
        return b['voxels'].sum() + b['voxel_coords'].sum()
    timed(v0, (batch,), name='v0 voxelize')

    full_model = build_detector(cfg.MODEL, len(cfg.CLASS_NAMES), test_set)
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    state = train_rt.init_train_state(full_model, optimizer, test_set,
                                      batch_size)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    def make_variant(keys, out_key):
        mc = {k: v for k, v in dict(cfg.MODEL).items()
              if k in ('NAME',) + keys or k == 'POST_PROCESSING'}
        model = build_detector(CfgNode(mc), len(cfg.CLASS_NAMES), test_set)
        # init fresh (param values irrelevant for timing)
        st = train_rt.init_train_state(model, optimizer, test_set, batch_size)
        vv = {'params': st.params, 'batch_stats': st.batch_stats}

        @jax.jit
        def fn(vvv, hb):
            b = train_rt.prepare_device_batch(hb, voxel_cfg, grid_size, pcr,
                                              vs)
            out = model.apply(vvv, b, training=False)
            x = out[out_key]
            if isinstance(x, dict):
                x = x['features']
            return jnp.sum(x.astype(jnp.float32))
        return fn, vv

    f1, v1v = make_variant(('VFE', 'BACKBONE_3D'), 'encoded_spconv_features')
    timed(f1, (v1v, batch), name='v1 +backbone_3d')
    f2, v2v = make_variant(('VFE', 'BACKBONE_3D', 'MAP_TO_BEV',
                            'BACKBONE_2D'), 'spatial_features_2d')
    timed(f2, (v2v, batch), name='v2 +bev_backbone')
    f3, v3v = make_variant(('VFE', 'BACKBONE_3D', 'MAP_TO_BEV', 'BACKBONE_2D',
                            'DENSE_HEAD'), 'batch_cls_preds')
    timed(f3, (v3v, batch), name='v3 +dense_head')

    eval_step = eval_rt.make_eval_step(full_model, test_set,
                                       cfg.MODEL.POST_PROCESSING,
                                       num_class=len(cfg.CLASS_NAMES))

    def v4(vvv, hb):
        preds, rec = eval_step(vvv, hb)
        return preds['pred_scores']
    timed(v4, (variables, batch), name='v4 full eval step')


if __name__ == '__main__':
    main()
