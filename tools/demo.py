"""Single-scene / folder inference demo.

Parity: ``tools/demo.py`` of the reference (:23-60) — run a checkpoint over a
folder of .bin/.npy point clouds (or synthetic scenes with --synthetic) and
print/save detections.  No mayavi/open3d in this image; results go to stdout
and an optional .pkl.
"""

from __future__ import annotations

import argparse
import glob
import pickle
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402

from crb_active_3ddet_tpu.config import cfg, load_config  # noqa: E402
from crb_active_3ddet_tpu.datasets import build_dataloader  # noqa: E402
from crb_active_3ddet_tpu.datasets.dataset import DatasetTemplate  # noqa: E402
from crb_active_3ddet_tpu.models import build_network  # noqa: E402
from crb_active_3ddet_tpu.runtime import checkpoint as ckpt_rt  # noqa: E402
from crb_active_3ddet_tpu.runtime import eval as eval_rt  # noqa: E402
from crb_active_3ddet_tpu.runtime import train as train_rt  # noqa: E402
from crb_active_3ddet_tpu.utils import common as common_utils  # noqa: E402


class DemoDataset(DatasetTemplate):
    """Folder-of-bins dataset (parity: demo.py DemoDataset)."""

    def __init__(self, dataset_cfg, class_names, root_path, ext='.bin'):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=False, root_path=root_path)
        self.ext = ext
        self.sample_file_list = sorted(
            glob.glob(str(Path(root_path) / f'*{ext}')))

    def __len__(self):
        return len(self.sample_file_list)

    def __getitem__(self, index):
        fn = self.sample_file_list[index]
        if self.ext == '.bin':
            points = np.fromfile(fn, dtype=np.float32).reshape(-1, 4)
        elif self.ext == '.npy':
            points = np.load(fn)
        else:
            raise NotImplementedError(self.ext)
        return self.prepare_data({'points': points,
                                  'frame_id': Path(fn).stem})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--ckpt', type=str, required=True)
    parser.add_argument('--data_path', type=str, default=None,
                        help='folder of .bin/.npy clouds; omit for synthetic')
    parser.add_argument('--ext', type=str, default='.bin')
    parser.add_argument('--out', type=str, default=None)
    parser.add_argument('--vis', type=str, default=None,
                        help="'bev' saves <frame>_bev.png per frame "
                             "(headless); 'html' writes an interactive 3D "
                             "<frame>_3d.html (no deps, opens in a "
                             "browser); 'open3d' opens the interactive "
                             "viewer when open3d is installed")
    args = parser.parse_args()

    load_config(args.cfg_file, cfg)
    common_utils.enable_compilation_cache()
    logger = common_utils.create_logger(None, rank=0)

    if args.data_path:
        demo_set = DemoDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                               root_path=args.data_path, ext=args.ext)
        from torch.utils.data import DataLoader
        loader = DataLoader(demo_set, batch_size=1, num_workers=0,
                            shuffle=False, collate_fn=demo_set.collate_batch)
    else:
        demo_set, loader, _ = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
            workers=0)

    model = build_network(model_cfg=cfg.MODEL,
                          num_class=len(cfg.CLASS_NAMES), dataset=demo_set)
    import jax
    import jax.numpy as jnp
    ck = ckpt_rt.load_checkpoint(args.ckpt)
    variables = {'params': jax.tree.map(jnp.asarray, ck['model_state']),
                 'batch_stats': jax.tree.map(jnp.asarray, ck['batch_stats'])}
    eval_step = eval_rt.make_eval_step(model, demo_set,
                                       cfg.MODEL.POST_PROCESSING,
                                       num_class=len(cfg.CLASS_NAMES))
    results = []
    for batch in loader:
        preds, _ = eval_step(variables, train_rt.host_to_device_batch(batch))
        preds = jax.tree.map(np.asarray, preds)
        for i in range(batch['batch_size']):
            valid = preds['pred_valid'][i]
            det = {
                'frame_id': batch['frame_id'][i],
                'boxes': preds['pred_boxes'][i][valid],
                'scores': preds['pred_scores'][i][valid],
                'labels': [cfg.CLASS_NAMES[l - 1]
                           for l in preds['pred_labels'][i][valid]],
            }
            results.append(det)
            logger.info('%s: %d detections %s', det['frame_id'],
                        len(det['boxes']),
                        [(n, round(float(s), 2))
                         for n, s in zip(det['labels'], det['scores'])])
            if args.vis:
                from visual_utils import vis_utils
                n_pts = int(batch['num_points'][i])
                scene_pts = np.asarray(batch['points'][i][:n_pts])
                if args.vis == 'open3d':
                    vis_utils.draw_scenes(scene_pts, ref_boxes=det['boxes'],
                                          ref_scores=det['scores'])
                elif args.vis == 'html':
                    path = vis_utils.draw_scenes_html(
                        scene_pts, ref_boxes=det['boxes'],
                        ref_scores=det['scores'],
                        ref_labels=[cfg.CLASS_NAMES.index(n) + 1
                                    for n in det['labels']],
                        class_names=list(cfg.CLASS_NAMES),
                        save_path=f"{det['frame_id']}_3d.html")
                    logger.info('wrote %s', path)
                else:
                    path = vis_utils.draw_scenes_bev(
                        scene_pts, ref_boxes=det['boxes'],
                        ref_scores=det['scores'],
                        save_path=f"{det['frame_id']}_bev.png")
                    logger.info('wrote %s', path)
    if args.out:
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)
        logger.info('saved %d frames to %s', len(results), args.out)


if __name__ == '__main__':
    main()
