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


def add_avg_performance(dataset, result_dict):
    """Parity: ``eval_utils.add_avg_performance:22-51`` — cross-class
    Average/ rows per metric type and difficulty."""
    name = dataset.dataset_cfg['DATASET']
    if name in ('KittiDataset', 'SyntheticDataset'):
        for typ in ('3d', 'bev', 'image', 'aos'):
            for difficulty in ('easy', 'moderate', 'hard'):
                keys = [k for k in result_dict
                        if typ in k and difficulty in k]
                vals = [result_dict[k] for k in keys]
                result_dict['Average/{}_{}_R40'.format(typ, difficulty)] = \
                    sum(vals) / len(vals) if vals else 0
    elif name == 'WaymoDataset':
        for typ in ('AP', 'APH'):
            for difficulty in ('Level_1', 'Level_2'):
                keys = [k for k in result_dict
                        if typ.lower() == k.lower().split('/')[-1]
                        and difficulty.lower() in k.lower()
                        and 'sign' not in k.lower()]
                vals = [result_dict[k] for k in keys]
                result_dict['Average/{}_{}'.format(typ, difficulty)] = \
                    sum(vals) / len(vals) if vals else 0
    return result_dict


def _filter_annos(det_annos, thresh):
    out = []
    for det in det_annos:
        keep = det['score'] >= thresh
        d = dict(det)
        for k in ('name', 'score', 'boxes_lidar', 'pred_labels', 'bbox',
                  'location', 'dimensions', 'rotation_y', 'alpha',
                  'truncated', 'occluded'):
            if k in d and hasattr(d[k], '__len__') \
                    and len(d[k]) == len(keep):
                d[k] = d[k][keep]
        out.append(d)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--result_pkl', type=str, required=True)
    parser.add_argument('--show_top', type=int, default=0,
                        help='print top-K detections per frame')
    parser.add_argument('--score_sweep', type=str, default=None,
                        help='comma-separated score thresholds: re-score '
                             'the cached detections at each (the '
                             'vis_one_epoch inspection loop)')
    parser.add_argument('--frame', type=str, default=None,
                        help='render one frame (by frame_id) to a BEV png '
                             'with predictions + gt')
    parser.add_argument('--save_dir', type=str, default='vis_out')
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
    ap_dict = add_avg_performance(test_set, dict(ap_dict or {}))
    logger.info('Result: %s', {k: round(float(v), 4)
                               for k, v in ap_dict.items()})

    if args.score_sweep:
        for t in [float(x) for x in args.score_sweep.split(',')]:
            filtered = _filter_annos(det_annos, t)
            n = sum(len(d['score']) for d in filtered)
            _, swept = test_set.evaluation(filtered, cfg.CLASS_NAMES)
            swept = {k: round(float(v), 4) for k, v in (swept or {}).items()
                     if 'Average' in k or '3d' in k} or \
                {k: round(float(v), 4) for k, v in (swept or {}).items()}
            logger.info('score>=%.2f: %d boxes, %s', t, n, swept)

    if args.frame is not None:
        from visual_utils.vis_utils import draw_scenes_bev
        idx = [i for i, d in enumerate(det_annos)
               if str(d.get('frame_id')) == args.frame]
        assert idx, f'frame {args.frame} not in result.pkl'
        det = det_annos[idx[0]]
        ds_ids = list(getattr(test_set, 'sample_id_list', []) or [])
        sample = test_set[ds_ids.index(args.frame)] \
            if args.frame in ds_ids else test_set[idx[0]]
        pts = sample['points'][:int(sample.get('num_points',
                                               len(sample['points'])))]
        gt = sample.get('gt_boxes')
        out = Path(args.save_dir)
        out.mkdir(parents=True, exist_ok=True)
        path = out / f'frame_{args.frame}_bev.png'
        draw_scenes_bev(pts, gt_boxes=gt[:, :7] if gt is not None else None,
                        ref_boxes=det['boxes_lidar'],
                        ref_scores=det['score'], save_path=str(path))
        logger.info('wrote %s', path)
        from visual_utils.vis_utils import draw_scenes_html
        path3d = out / f'frame_{args.frame}_3d.html'
        draw_scenes_html(pts, gt_boxes=gt[:, :7] if gt is not None else None,
                         ref_boxes=det['boxes_lidar'],
                         ref_scores=det['score'],
                         ref_labels=det.get('pred_labels'),
                         class_names=list(cfg.CLASS_NAMES),
                         save_path=str(path3d))
        logger.info('wrote %s (interactive 3D)', path3d)

    if args.show_top:
        for det in det_annos[:10]:
            order = (-det['score']).argsort()[:args.show_top]
            logger.info('%s: %s', det.get('frame_id'),
                        [(det['name'][i], round(float(det['score'][i]), 3))
                         for i in order])


if __name__ == '__main__':
    main()
