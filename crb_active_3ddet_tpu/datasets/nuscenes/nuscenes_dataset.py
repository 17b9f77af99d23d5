"""NuScenes dataset.

Parity: ``pcdet/datasets/nuscenes/nuscenes_dataset.py`` (info-pkl loading
:24-37, CBGS balanced resampling :39-72, multi-sweep lidar aggregation
:74-108, __getitem__ velocity handling :116-151, prediction dicts :153-196,
official evaluation :198-251, gt-database builder :253-296) and
``nuscenes_utils.py`` (detection-name mapping, attribute priors, info
filling, det→nusc anno conversion, result formatting).

TPU-first deltas: __getitem__ emits fixed-shape padded samples through the
shared DatasetTemplate.prepare_data; points-in-box assignment for the gt
database runs on the host numpy helper (``ops.points_in_boxes``'s numpy
twin) instead of a CUDA kernel.  The nuscenes devkit (not in this image) is
import-guarded: info/GT-db creation and the official NDS evaluation need it;
``evaluation`` falls back to the simple lidar-AP evaluator without it.
"""

from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate
from .nuscenes_utils import (boxes_lidar_to_nusenes, format_nuscene_results,
                             transform_det_annos_to_nusc_annos)


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        root_path = (Path(root_path) if root_path is not None
                     else Path(dataset_cfg.DATA_PATH)) / dataset_cfg.VERSION
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path,
                         logger=logger)
        self.infos = []
        self.include_nuscenes_data(self.mode)
        if self.training and self.dataset_cfg.get('BALANCED_RESAMPLING',
                                                  False):
            self.infos = self.balanced_infos_resampling(self.infos)
        self.sample_id_list = [Path(i['lidar_path']).stem for i in self.infos]

    def include_nuscenes_data(self, mode):
        if self.logger:
            self.logger.info('Loading NuScenes dataset')
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            info_path = self.root_path / info_path
            if not info_path.exists():
                continue
            with open(info_path, 'rb') as f:
                self.infos.extend(pickle.load(f))
        if self.logger:
            self.logger.info('Total samples for NuScenes dataset: %d'
                             % len(self.infos))

    def balanced_infos_resampling(self, infos):
        """CBGS class-balanced resampling (parity :39-72,
        https://arxiv.org/abs/1908.09492)."""
        if self.class_names is None:
            return infos
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info['gt_names']):
                if name in self.class_names:
                    cls_infos[name].append(info)
        duplicated = sum(len(v) for v in cls_infos.values())
        if duplicated == 0:
            return infos
        cls_dist = {k: len(v) / duplicated for k, v in cls_infos.items()}
        frac = 1.0 / len(self.class_names)
        sampled = []
        for cur, ratio in zip(cls_infos.values(),
                              [frac / max(v, 1e-9)
                               for v in cls_dist.values()]):
            if len(cur):
                sampled += np.random.choice(
                    cur, int(len(cur) * ratio)).tolist()
        if self.logger:
            self.logger.info('Total samples after balanced resampling: %s'
                             % len(sampled))
        return sampled

    # ---------------- lidar loading (multi-sweep) ----------------
    def get_sweep(self, sweep_info):
        """Parity :74-90 — load one sweep, drop ego-radius points, warp into
        the keyframe, attach the time lag."""
        def remove_ego_points(points, center_radius=1.0):
            mask = ~((np.abs(points[:, 0]) < center_radius)
                     & (np.abs(points[:, 1]) < center_radius))
            return points[mask]

        lidar_path = self.root_path / sweep_info['lidar_path']
        points_sweep = np.fromfile(str(lidar_path), dtype=np.float32,
                                   count=-1).reshape([-1, 5])[:, :4]
        points_sweep = remove_ego_points(points_sweep).T
        if sweep_info['transform_matrix'] is not None:
            num_points = points_sweep.shape[1]
            points_sweep[:3, :] = sweep_info['transform_matrix'].dot(
                np.vstack((points_sweep[:3, :],
                           np.ones(num_points))))[:3, :]
        cur_times = sweep_info['time_lag'] * np.ones((1,
                                                      points_sweep.shape[1]))
        return points_sweep.T, cur_times.T

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        """Parity :92-108 — keyframe + (max_sweeps−1) random sweeps with a
        timestamp channel."""
        info = self.infos[index]
        lidar_path = self.root_path / info['lidar_path']
        points = np.fromfile(str(lidar_path), dtype=np.float32,
                             count=-1).reshape([-1, 5])[:, :4]
        sweep_points = [points]
        sweep_times = [np.zeros((points.shape[0], 1))]
        n_sweeps = len(info.get('sweeps', []))
        for k in np.random.choice(n_sweeps, min(max_sweeps - 1, n_sweeps),
                                  replace=False):
            pts, times = self.get_sweep(info['sweeps'][k])
            sweep_points.append(pts)
            sweep_times.append(times)
        points = np.concatenate(sweep_points, axis=0)
        times = np.concatenate(sweep_times, axis=0).astype(points.dtype)
        return np.concatenate((points, times), axis=1)

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        points = self.get_lidar_with_sweeps(
            index, max_sweeps=self.dataset_cfg.MAX_SWEEPS)
        input_dict = {
            'points': points,
            'frame_id': Path(info['lidar_path']).stem,
            'metadata': {'token': info['token']},
        }
        if 'gt_boxes' in info:
            if self.dataset_cfg.get('FILTER_MIN_POINTS_IN_GT', False):
                mask = (info['num_lidar_pts']
                        > self.dataset_cfg.FILTER_MIN_POINTS_IN_GT - 1)
            else:
                mask = None
            input_dict.update({
                'gt_names': info['gt_names'] if mask is None
                else info['gt_names'][mask],
                'gt_boxes': info['gt_boxes'] if mask is None
                else info['gt_boxes'][mask],
            })
        data_dict = self.prepare_data(data_dict=input_dict)

        if self.dataset_cfg.get('SET_NAN_VELOCITY_TO_ZEROS', False) \
                and 'gt_boxes' in data_dict:
            gt_boxes = data_dict['gt_boxes']
            gt_boxes[np.isnan(gt_boxes)] = 0
            data_dict['gt_boxes'] = gt_boxes
        if not self.dataset_cfg.get('PRED_VELOCITY', True) \
                and 'gt_boxes' in data_dict:
            # drop the vx/vy columns, keep the class id (:147-149)
            data_dict['gt_boxes'] = \
                data_dict['gt_boxes'][:, [0, 1, 2, 3, 4, 5, 6, -1]]
        return data_dict

    # ---------------- predictions + evaluation ----------------
    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        """Fixed-shape device preds → per-frame annos (parity :153-196)."""
        annos = []
        for i in range(batch_dict['batch_size']):
            valid = np.asarray(pred_dicts['pred_valid'][i])
            boxes = np.asarray(pred_dicts['pred_boxes'][i])[valid]
            scores = np.asarray(pred_dicts['pred_scores'][i])[valid]
            labels = np.asarray(pred_dicts['pred_labels'][i])[valid]
            anno = {
                'name': np.array(class_names)[labels - 1] if len(labels)
                else np.zeros(0),
                'score': scores,
                'boxes_lidar': boxes,
                'pred_labels': labels,
                'frame_id': batch_dict['frame_id'][i],
            }
            if 'metadata' in batch_dict:
                anno['metadata'] = batch_dict['metadata'][i]
            annos.append(anno)
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """Official NDS/mAP via the nuscenes devkit when available
        (parity :198-251); simple lidar-AP fallback otherwise."""
        try:
            from nuscenes.nuscenes import NuScenes   # import-guarded
        except ImportError:
            if self.logger:
                self.logger.warning(
                    'nuscenes devkit unavailable — falling back to the '
                    'simple lidar-AP evaluator')
            from ...utils.simple_eval import evaluate_lidar_ap
            gt_annos = [{'boxes_lidar': info['gt_boxes'][:, :7],
                         'name': info['gt_names']}
                        for info in self.infos[:len(det_annos)]]
            ap_dict = evaluate_lidar_ap(det_annos, gt_annos, class_names)
            ap_str = '\n'.join(f'{k}: {v:.4f}' for k, v in ap_dict.items())
            return ap_str, ap_dict

        import json
        nusc = NuScenes(version=self.dataset_cfg.VERSION,
                        dataroot=str(self.root_path), verbose=True)
        nusc_annos = transform_det_annos_to_nusc_annos(det_annos, nusc)
        nusc_annos['meta'] = {
            'use_camera': False, 'use_lidar': True, 'use_radar': False,
            'use_map': False, 'use_external': False,
        }
        output_path = Path(kwargs['output_path'])
        output_path.mkdir(exist_ok=True, parents=True)
        res_path = str(output_path / 'results_nusc.json')
        with open(res_path, 'w') as f:
            json.dump(nusc_annos, f)
        if self.dataset_cfg.VERSION == 'v1.0-test':
            return 'No ground-truth annotations for evaluation', {}

        from nuscenes.eval.detection.config import config_factory
        from nuscenes.eval.detection.evaluate import NuScenesEval
        eval_set_map = {'v1.0-mini': 'mini_val', 'v1.0-trainval': 'val',
                        'v1.0-test': 'test'}
        try:
            eval_version = 'detection_cvpr_2019'
            eval_config = config_factory(eval_version)
        except Exception:
            eval_version = 'cvpr_2019'
            eval_config = config_factory(eval_version)
        nusc_eval = NuScenesEval(
            nusc, config=eval_config, result_path=res_path,
            eval_set=eval_set_map[self.dataset_cfg.VERSION],
            output_dir=str(output_path), verbose=True)
        nusc_eval.main(plot_examples=0, render_curves=False)
        with open(output_path / 'metrics_summary.json', 'r') as f:
            metrics = json.load(f)
        return format_nuscene_results(metrics, self.class_names,
                                      version=eval_version)

    # ---------------- offline builders ----------------
    def create_groundtruth_database(self, used_classes=None, max_sweeps=10):
        """Parity :253-296 — per-box point crops for gt_sampling (host
        numpy points-in-box instead of the CUDA kernel)."""
        from ...ops.points_in_boxes import points_in_boxes_numpy
        database_save_path = self.root_path \
            / f'gt_database_{max_sweeps}sweeps_withvelo'
        db_info_save_path = self.root_path \
            / f'nuscenes_dbinfos_{max_sweeps}sweeps_withvelo.pkl'
        database_save_path.mkdir(parents=True, exist_ok=True)
        all_db_infos = {}
        for idx in range(len(self.infos)):
            info = self.infos[idx]
            points = self.get_lidar_with_sweeps(idx, max_sweeps=max_sweeps)
            gt_boxes = info['gt_boxes']
            gt_names = info['gt_names']
            box_of_pts = points_in_boxes_numpy(points[:, :3],
                                               gt_boxes[:, :7])
            for i in range(gt_boxes.shape[0]):
                filename = '%s_%s_%d.bin' % (idx, gt_names[i], i)
                filepath = database_save_path / filename
                gt_points = points[box_of_pts == i]
                gt_points[:, :3] -= gt_boxes[i, :3]
                gt_points.astype(np.float32).tofile(str(filepath))
                if used_classes is None or gt_names[i] in used_classes:
                    db_path = str(filepath.relative_to(self.root_path))
                    db_info = {'name': gt_names[i], 'path': db_path,
                               'image_idx': idx, 'gt_idx': i,
                               'box3d_lidar': gt_boxes[i],
                               'num_points_in_gt': gt_points.shape[0]}
                    all_db_infos.setdefault(gt_names[i], []).append(db_info)
        with open(db_info_save_path, 'wb') as f:
            pickle.dump(all_db_infos, f)
        return all_db_infos


def create_nuscenes_info(version, data_path, save_path, max_sweeps=10):
    """Info-pkl builder CLI (parity :299-344). Requires the nuscenes
    devkit."""
    from nuscenes.nuscenes import NuScenes
    from nuscenes.utils import splits
    from .nuscenes_utils import fill_trainval_infos, get_available_scenes
    data_path = data_path / version
    save_path = save_path / version
    assert version in ('v1.0-trainval', 'v1.0-test', 'v1.0-mini')
    if version == 'v1.0-trainval':
        train_scenes, val_scenes = splits.train, splits.val
    elif version == 'v1.0-test':
        train_scenes, val_scenes = splits.test, []
    else:
        train_scenes, val_scenes = splits.mini_train, splits.mini_val

    nusc = NuScenes(version=version, dataroot=data_path, verbose=True)
    available = get_available_scenes(nusc)
    names = [s['name'] for s in available]
    train_scenes = {available[names.index(s)]['token']
                    for s in train_scenes if s in names}
    val_scenes = {available[names.index(s)]['token']
                  for s in val_scenes if s in names}
    train_infos, val_infos = fill_trainval_infos(
        data_path=data_path, nusc=nusc, train_scenes=train_scenes,
        val_scenes=val_scenes, test='test' in version, max_sweeps=max_sweeps)
    if version == 'v1.0-test':
        with open(save_path / f'nuscenes_infos_{max_sweeps}sweeps_test.pkl',
                  'wb') as f:
            pickle.dump(train_infos, f)
    else:
        with open(save_path / f'nuscenes_infos_{max_sweeps}sweeps_train.pkl',
                  'wb') as f:
            pickle.dump(train_infos, f)
        with open(save_path / f'nuscenes_infos_{max_sweeps}sweeps_val.pkl',
                  'wb') as f:
            pickle.dump(val_infos, f)


if __name__ == '__main__':
    import argparse
    import yaml
    from ...config import CfgNode

    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str, default=None)
    parser.add_argument('--func', type=str, default='create_nuscenes_infos')
    parser.add_argument('--version', type=str, default='v1.0-trainval')
    parser.add_argument('--data_path', type=str, default='../data/nuscenes')
    args = parser.parse_args()
    if args.func == 'create_nuscenes_infos':
        dataset_cfg = CfgNode(yaml.safe_load(open(args.cfg_file)))
        dataset_cfg['VERSION'] = args.version
        create_nuscenes_info(
            version=args.version, data_path=Path(args.data_path),
            save_path=Path(args.data_path),
            max_sweeps=int(dataset_cfg.MAX_SWEEPS))
        ds = NuScenesDataset(dataset_cfg=dataset_cfg, class_names=None,
                             root_path=Path(args.data_path), training=True)
        ds.create_groundtruth_database(
            max_sweeps=int(dataset_cfg.MAX_SWEEPS))
