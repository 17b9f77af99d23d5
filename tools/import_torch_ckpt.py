"""Import an OpenPCDet ``.pth`` checkpoint into this framework.

Reads the torch zip archive with a numpy-only unpickler (no torch needed),
maps the reference's module names onto our Flax param trees — including the
spconv weight-layout adaptation the reference performs at load time
(detector3d_template.py:455-536) — and writes a native checkpoint that
``tools/test.py --ckpt`` consumes directly.

Usage:
  python tools/import_torch_ckpt.py --cfg_file tools/cfgs/kitti_models/second.yaml \
      --ckpt second_7862.pth --out output/second_imported
"""

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg_file', required=True)
    ap.add_argument('--ckpt', required=True, help='OpenPCDet .pth file')
    ap.add_argument('--out', required=True,
                    help='output path (without .pkl suffix)')
    ap.add_argument('--batch_size', type=int, default=1)
    args = ap.parse_args()

    from crb_active_3ddet_tpu.config import load_config
    from crb_active_3ddet_tpu.datasets import build_dataloader
    from crb_active_3ddet_tpu.models.detectors import build_detector
    from crb_active_3ddet_tpu.runtime import train as train_rt
    from crb_active_3ddet_tpu.runtime import checkpoint as ckpt_rt
    from crb_active_3ddet_tpu.runtime.optimization import build_optimizer
    from crb_active_3ddet_tpu.utils.torch_ckpt import (
        import_openpcdet_checkpoint)

    cfg = load_config(args.cfg_file)
    dataset, _, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.batch_size, training=False,
        workers=0)
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                           dataset=dataset)
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    state = train_rt.init_train_state(model, optimizer, dataset,
                                      args.batch_size)

    params, stats, report, meta = import_openpcdet_checkpoint(
        args.ckpt, state.params, state.batch_stats)

    print(f'==> mapped {len(report["mapped"])} tensors from {args.ckpt}')
    for path, src, tgt in report['mismatched']:
        print(f'    shape mismatch (skipped): {path} src={src} tgt={tgt}')
    for path in report['unmatched_target']:
        print(f'    not updated (kept init): {path}')

    out = {'epoch': meta.get('epoch', 0), 'it': meta.get('it', 0),
           'version': f'imported+{meta.get("version", "unknown")}',
           'model_state': params, 'batch_stats': stats,
           'optimizer_state': None}
    fn = ckpt_rt.save_checkpoint(out, args.out)
    print(f'==> wrote {fn}')


if __name__ == '__main__':
    main()
