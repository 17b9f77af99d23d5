"""Capture a jax.profiler trace of the SECOND eval backbone on the real
chip (validates the --profile machinery and gives op-level timings)."""
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import jax

from crb_active_3ddet_tpu.utils.common import enable_compilation_cache
enable_compilation_cache()
from crb_active_3ddet_tpu.config import load_config
from crb_active_3ddet_tpu.datasets import build_dataloader
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.runtime import train as train_rt
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

cap = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
out_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/jaxtrace'

cfg = load_config(REPO_ROOT / 'tools/cfgs/synthetic_models/second_synth.yaml')
for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
    if p['NAME'] == 'transform_points_to_voxels':
        p['MAX_NUMBER_OF_VOXELS'] = {'train': cap, 'test': cap}
test_set, test_loader, _ = build_dataloader(
    cfg.DATA_CONFIG, cfg.CLASS_NAMES, 4, training=False, workers=0)
model = build_detector(cfg.MODEL, len(cfg.CLASS_NAMES), test_set)
optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
state = train_rt.init_train_state(model, optimizer, test_set, 4)
variables = {'params': state.params, 'batch_stats': state.batch_stats}
voxel_cfg = test_set.voxel_cfg
grid_size = tuple(int(g) for g in test_set.grid_size)
pcr = tuple(float(x) for x in test_set.point_cloud_range)
vs = tuple(float(v) for v in test_set.voxel_size)


@jax.jit
def fwd(vvv, hb):
    b = train_rt.prepare_device_batch(hb, voxel_cfg, grid_size, pcr, vs)
    out = model.apply(vvv, b, training=False)
    return out['encoded_spconv_features'].sum()

batch = train_rt.host_to_device_batch(next(iter(test_loader)))
print('warmup...', flush=True)
print(float(fwd(variables, batch)), flush=True)

print('tracing...', flush=True)
jax.profiler.start_trace(out_dir)
for _ in range(4):
    r = fwd(variables, batch)
jax.block_until_ready(r)
jax.profiler.stop_trace()
print('trace done ->', out_dir, flush=True)
