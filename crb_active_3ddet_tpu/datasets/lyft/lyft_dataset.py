"""Lyft Level-5 dataset.

Parity: ``pcdet/datasets/lyft/lyft_dataset.py`` — info-pkl loading (:22-36),
ragged-tail-robust sweep loading (:38-80 — lyft bins are sometimes truncated,
hence the %5 trim), __getitem__ (:88-110), prediction dicts (:112-151),
kitti-style eval mapping (:153-177), official lyft mAP eval (:179-205,
devkit-guarded; the embedded ``lyft_mAP_eval`` port lives in
``lyft_map_eval.py`` with numpy polygon IoU instead of shapely), gt database
(:207-252).
"""

from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class LyftDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        root_path = (Path(root_path) if root_path is not None
                     else Path(dataset_cfg.DATA_PATH)) / dataset_cfg.VERSION
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path,
                         logger=logger)
        self.infos = []
        self.include_lyft_data(self.mode)
        self.sample_id_list = [Path(i['lidar_path']).stem for i in self.infos]

    def include_lyft_data(self, mode):
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            info_path = self.root_path / info_path
            if not info_path.exists():
                continue
            with open(info_path, 'rb') as f:
                self.infos.extend(pickle.load(f))
        if self.logger:
            self.logger.info('Total samples for lyft dataset: %d'
                             % len(self.infos))

    @staticmethod
    def remove_ego_points(points, center_radius=1.0):
        mask = ~((np.abs(points[:, 0]) < center_radius * 1.5)
                 & (np.abs(points[:, 1]) < center_radius))
        return points[mask]

    def _read_lidar(self, path):
        points = np.fromfile(str(path), dtype=np.float32, count=-1)
        if points.shape[0] % 5 != 0:      # truncated lyft bins (:44-46)
            points = points[:points.shape[0] - (points.shape[0] % 5)]
        return points.reshape([-1, 5])[:, :4]

    def get_sweep(self, sweep_info):
        points_sweep = self._read_lidar(self.root_path
                                        / sweep_info['lidar_path'])
        points_sweep = self.remove_ego_points(points_sweep).T
        if sweep_info['transform_matrix'] is not None:
            num_points = points_sweep.shape[1]
            points_sweep[:3, :] = sweep_info['transform_matrix'].dot(
                np.vstack((points_sweep[:3, :], np.ones(num_points))))[:3, :]
        cur_times = sweep_info['time_lag'] * np.ones(
            (1, points_sweep.shape[1]))
        return points_sweep.T, cur_times.T

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        info = self.infos[index]
        points = self._read_lidar(self.root_path / info['lidar_path'])
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
            input_dict.update({'gt_boxes': info['gt_boxes'],
                               'gt_names': info['gt_names']})
        return self.prepare_data(data_dict=input_dict)

    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        annos = []
        for i in range(batch_dict['batch_size']):
            valid = np.asarray(pred_dicts['pred_valid'][i])
            boxes = np.asarray(pred_dicts['pred_boxes'][i])[valid]
            scores = np.asarray(pred_dicts['pred_scores'][i])[valid]
            labels = np.asarray(pred_dicts['pred_labels'][i])[valid]
            anno = {
                'name': np.array(class_names)[labels - 1] if len(labels)
                else np.zeros(0),
                'score': scores, 'boxes_lidar': boxes, 'pred_labels': labels,
                'frame_id': batch_dict['frame_id'][i],
            }
            if 'metadata' in batch_dict:
                anno['metadata'] = batch_dict['metadata'][i]
            annos.append(anno)
        return annos

    def kitti_eval(self, eval_det_annos, eval_gt_annos, class_names):
        """Parity :153-177 — map lyft classes onto the KITTI evaluator."""
        from ..kitti.kitti_eval import eval as kitti_eval
        from ..kitti import kitti_utils

        map_name_to_kitti = {
            'car': 'Car', 'pedestrian': 'Pedestrian', 'truck': 'Truck',
            'bicycle': 'Cyclist', 'motorcycle': 'Cyclist',
        }
        kitti_utils.transform_to_kitti_format(
            eval_det_annos, map_name_to_kitti=map_name_to_kitti)
        kitti_utils.transform_to_kitti_format(
            eval_gt_annos, map_name_to_kitti=map_name_to_kitti,
            info_with_fakelidar=self.dataset_cfg.get('INFO_WITH_FAKELIDAR',
                                                     False))
        kitti_class_names = [map_name_to_kitti[x] for x in class_names]
        return kitti_eval.get_official_eval_result(
            gt_annos=eval_gt_annos, dt_annos=eval_det_annos,
            current_classes=kitti_class_names)

    def evaluation(self, det_annos, class_names, **kwargs):
        metric = kwargs.get('eval_metric', 'lyft')
        if metric == 'kitti':
            return self.kitti_eval(copy.deepcopy(det_annos),
                                   copy.deepcopy(self.infos), class_names)
        if metric == 'lyft':
            return self.lyft_eval(
                det_annos, class_names,
                iou_thresholds=self.dataset_cfg.get('EVAL_LYFT_IOU_LIST',
                                                    [0.5]))
        raise NotImplementedError(metric)

    def lyft_eval(self, det_annos, class_names, iou_thresholds=(0.5,)):
        """Official-format lyft mAP (parity :179-205).  Uses the devkit for
        record lookups when available; the mAP math itself is the numpy port
        in lyft_map_eval.py."""
        from . import lyft_utils
        from .lyft_map_eval import get_average_precisions
        try:
            from lyft_dataset_sdk.lyftdataset import LyftDataset as Lyft
        except ImportError:
            if self.logger:
                self.logger.warning(
                    'lyft_dataset_sdk unavailable — falling back to the '
                    'simple lidar-AP evaluator')
            from ...utils.simple_eval import evaluate_lidar_ap
            gt_annos = [{'boxes_lidar': info['gt_boxes'][:, :7],
                         'name': info['gt_names']}
                        for info in self.infos[:len(det_annos)]]
            ap_dict = evaluate_lidar_ap(det_annos, gt_annos, class_names)
            ap_str = '\n'.join(f'{k}: {v:.4f}' for k, v in ap_dict.items())
            return ap_str, ap_dict
        lyft = Lyft(json_path=self.root_path / 'data',
                    data_path=self.root_path, verbose=True)
        det_boxes, sample_tokens = lyft_utils.convert_det_to_lyft_format(
            lyft, det_annos)
        gt_boxes = lyft_utils.load_lyft_gt_by_tokens(lyft, sample_tokens)
        aps = get_average_precisions(gt_boxes, det_boxes, class_names,
                                     list(iou_thresholds))
        return lyft_utils.format_lyft_results(
            aps, class_names, list(iou_thresholds),
            version=self.dataset_cfg.VERSION)

    def create_groundtruth_database(self, used_classes=None, max_sweeps=10):
        """Parity :207-252."""
        from ...ops.points_in_boxes import points_in_boxes_numpy
        database_save_path = self.root_path / 'gt_database'
        db_info_save_path = self.root_path \
            / f'lyft_dbinfos_{max_sweeps}sweeps.pkl'
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
                    all_db_infos.setdefault(gt_names[i], []).append({
                        'name': gt_names[i], 'path': db_path,
                        'image_idx': idx, 'gt_idx': i,
                        'box3d_lidar': gt_boxes[i],
                        'num_points_in_gt': gt_points.shape[0]})
        with open(db_info_save_path, 'wb') as f:
            pickle.dump(all_db_infos, f)
        return all_db_infos


def create_lyft_info(version, data_path, save_path, max_sweeps=10,
                     split='trainval'):
    """Info-pkl builder (parity lyft_dataset.py __main__ + lyft_utils
    fill_trainval_infos).  Requires the lyft devkit."""
    from lyft_dataset_sdk.lyftdataset import LyftDataset as Lyft
    from . import lyft_utils
    data_path = data_path / version
    save_path = save_path / version
    lyft = Lyft(json_path=data_path / 'data', data_path=data_path,
                verbose=True)
    available = lyft_utils.get_available_scenes(lyft)
    names = [s['name'] for s in available]
    split_file = data_path / 'ImageSets' / f'{split}.txt'
    wanted = set(split_file.read_text().split()) if split_file.exists() \
        else set(names)
    scenes = {available[names.index(s)]['token'] for s in wanted
              if s in names}
    train_infos, _ = lyft_utils.fill_trainval_infos(
        data_path=data_path, lyft=lyft, train_scenes=scenes, val_scenes=set(),
        test='test' in version, max_sweeps=max_sweeps)
    with open(save_path / f'lyft_infos_{split}.pkl', 'wb') as f:
        pickle.dump(train_infos, f)
