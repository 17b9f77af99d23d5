"""Re-run evaluation from a cached result.pkl.

Parity: ``tools/visualize.py`` of the reference (``eval_utils.vis_one_epoch``
:157-257 — re-scores cached detections without re-running the model; the
mayavi/open3d rendering is unavailable in this image, so this is the metric
path plus an optional text dump of top detections).
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from crb_active_3ddet_tpu.config import cfg, load_config  # noqa: E402
from crb_active_3ddet_tpu.datasets import build_dataloader  # noqa: E402
from crb_active_3ddet_tpu.utils import common as common_utils  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--result_pkl', type=str, required=True)
    parser.add_argument('--show_top', type=int, default=0,
                        help='print top-K detections per frame')
    args = parser.parse_args()

    load_config(args.cfg_file, cfg)
    logger = common_utils.create_logger(None, rank=0)
    test_set, _, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
        workers=0)
    with open(args.result_pkl, 'rb') as f:
        det_annos = pickle.load(f)
    logger.info('loaded %d frames from %s', len(det_annos), args.result_pkl)

    ap_str, ap_dict = test_set.evaluation(det_annos, cfg.CLASS_NAMES)
    logger.info('\n%s', ap_str)
    logger.info('Result: %s', {k: round(float(v), 4)
                               for k, v in (ap_dict or {}).items()})
    if args.show_top:
        for det in det_annos[:10]:
            order = (-det['score']).argsort()[:args.show_top]
            logger.info('%s: %s', det.get('frame_id'),
                        [(det['name'][i], round(float(det['score'][i]), 3))
                         for i in order])


if __name__ == '__main__':
    main()
