"""Component timing of the PV-RCNN eval forward at KITTI scale (batch 4)."""
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
from crb_active_3ddet_tpu.config import load_config
from crb_active_3ddet_tpu.datasets import build_dataloader
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.runtime import train as train_rt
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer


def treesum(out):
    tot = 0.0
    for x in jax.tree.leaves(out):
        if hasattr(x, 'dtype'):
            tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def timed(fn, args, n=6, name=''):
    float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f'{name:34s} {sorted(ts)[n // 2] * 1e3:9.2f} ms', flush=True)


def main():
    cfg = load_config(REPO_ROOT / 'tools/cfgs/synthetic_models/pv_rcnn_synth.yaml')
    batch_size = 4
    test_set, test_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size, training=False,
        workers=0)
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

    def upto(stage):
        def f(variables, hb):
            b = prep(hb)
            def run(mdl, b):
                b = mdl.vfe(b, training=False)
                b = mdl.backbone_3d(b, training=False)
                if stage == 'bb3d':
                    return b['encoded_spconv_features']
                b = mdl.map_to_bev(b, training=False)
                if stage == 'pfe':
                    b = mdl.pfe(b, training=False)
                    return b['point_features']
                b = mdl.pfe(b, training=False)
                b = mdl.backbone_2d(b, training=False)
                b = mdl.dense_head(b, training=False)
                if stage == 'dense':
                    return (b['batch_cls_preds'], b['batch_box_preds'])
                b = mdl.point_head(b, training=False)
                b = mdl.roi_head(b, training=False)
                return (b['rcnn_cls'], b['rcnn_reg'])
            return treesum(model.apply(variables, b, method=run,
                                       rngs={'dropout': jax.random.PRNGKey(0)}))
        return jax.jit(f)

    timed(upto('bb3d'), (variables, host_batch), name='prep+vfe+backbone3d')
    timed(upto('pfe'), (variables, host_batch), name='... +pfe (VSA)')
    timed(upto('dense'), (variables, host_batch), name='... +bev2d+dense_head')
    timed(upto('roi'), (variables, host_batch), name='full incl roi head (MC)')


if __name__ == '__main__':
    main()
