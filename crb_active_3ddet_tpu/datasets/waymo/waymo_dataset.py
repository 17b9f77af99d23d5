"""Waymo Open Dataset support.

Parity: ``pcdet/datasets/waymo/waymo_dataset.py`` — sequence-info driven
loading (:38-124), per-frame npy point files, AL identity via
``frame_ids`` + ``infos`` (vs KITTI's sample_id_list), kitti-style or
official-metric evaluation (:273-325), tfrecord preprocessing CLI (:408+).

The tfrecord converter needs the ``waymo-open-dataset`` pip package (absent
in this image) and is gated behind a lazy import; everything downstream
works from the preprocessed ``.npy`` + info ``.pkl`` artifacts, which use
the same layout as the reference so existing preprocessed data drops in.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from ...utils import box_utils
from ..dataset import DatasetTemplate


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.data_path = self.root_path / \
            self.dataset_cfg.get('PROCESSED_DATA_TAG', 'waymo_processed_data')
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode]
        split_file = self.root_path / 'ImageSets' / f'{self.split}.txt'
        self.sample_sequence_list = [
            x.strip() for x in open(split_file).readlines()] \
            if split_file.exists() else []
        self.infos = []
        self.frame_ids = []
        self.include_waymo_data(self.mode)

    def include_waymo_data(self, mode):
        infos = []
        for seq in self.sample_sequence_list:
            seq_name = Path(seq).stem
            info_path = self.data_path / seq_name / f'{seq_name}.pkl'
            if not info_path.exists():
                continue
            with open(info_path, 'rb') as f:
                infos.extend(pickle.load(f))
        interval = int(self.dataset_cfg.get('SAMPLED_INTERVAL', {}).get(
            self.mode, 1)) if self.dataset_cfg.get('SAMPLED_INTERVAL') else 1
        self.infos = infos[::interval]
        self.frame_ids = [info['frame_id'] for info in self.infos]
        if self.logger is not None:
            self.logger.info('Total samples for Waymo dataset: %d',
                             len(self.infos))

    def get_lidar(self, sequence_name, sample_idx):
        lidar_file = self.data_path / sequence_name / f'{sample_idx:04d}.npy'
        point_features = np.load(lidar_file)  # (N, 6): x, y, z, i, elong, nlz
        points_all = point_features[:, 0:5]
        nlz_flag = point_features[:, 5]
        points_all = points_all[nlz_flag == -1]
        points_all[:, 3] = np.tanh(points_all[:, 3])
        return points_all

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = self.infos[index]
        pc_info = info['point_cloud']
        points = self.get_lidar(pc_info['lidar_sequence'],
                                pc_info['sample_idx'])
        input_dict = {'points': points, 'frame_id': info['frame_id']}
        if 'annos' in info:
            annos = info['annos']
            mask = annos['name'] != 'unknown'
            gt_boxes = annos['gt_boxes_lidar'][mask]
            input_dict.update({
                'gt_names': annos['name'][mask],
                'gt_boxes': gt_boxes[:, :7],
                'num_points_in_gt': annos.get('num_points_in_gt',
                                              None),
            })
        return self.prepare_data(data_dict=input_dict)

    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        annos = []
        for index in range(batch_dict['batch_size']):
            valid = np.asarray(pred_dicts['pred_valid'][index])
            boxes = np.asarray(pred_dicts['pred_boxes'][index])[valid]
            scores = np.asarray(pred_dicts['pred_scores'][index])[valid]
            labels = np.asarray(pred_dicts['pred_labels'][index])[valid]
            annos.append({
                'frame_id': batch_dict['frame_id'][index],
                'name': np.array([class_names[l - 1] for l in labels]),
                'score': scores,
                'boxes_lidar': boxes,
                'pred_labels': labels,
                'metadata': batch_dict.get('metadata', [None] * 16)[index]
                if 'metadata' in batch_dict else None,
            })
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        if 'annos' not in self.infos[0]:
            return 'No ground-truth boxes for evaluation', {}
        metric = kwargs.get('eval_metric', self.dataset_cfg.get(
            'EVAL_METRIC', 'kitti'))
        if metric == 'kitti':
            return self._kitti_style_eval(det_annos, class_names)
        if metric == 'waymo':
            return self._waymo_official_eval(det_annos, class_names)
        raise NotImplementedError(metric)

    def _kitti_style_eval(self, det_annos, class_names):
        """Parity: waymo_dataset.kitti_eval (:273-305) — map Vehicle→Car
        etc. and run the KITTI evaluator on lidar boxes."""
        from ..kitti.kitti_eval import eval as kitti_eval
        import copy
        map_name = {'Vehicle': 'Car', 'Pedestrian': 'Pedestrian',
                    'Cyclist': 'Cyclist', 'Sign': 'Sign', 'Car': 'Car'}

        def transform(annos):
            for anno in annos:
                anno['name'] = np.array(
                    [map_name.get(n, n) for n in anno['name']])
                boxes = anno.get('boxes_lidar', anno.get('gt_boxes_lidar'))
                if boxes is None:
                    boxes = np.zeros((0, 7))
                boxes = boxes.copy()
                n = len(boxes)
                anno['bbox'] = np.tile([0, 0, 50, 50.0], (n, 1))
                anno['truncated'] = np.zeros(n)
                anno['occluded'] = np.zeros(n)
                anno['alpha'] = np.full(n, -10.0)
                # lidar box → pseudo camera frame (x→-y, y→-z? kitti eval
                # uses location/dimensions/rotation_y in camera coords; the
                # reference builds them via boxes3d_lidar_to_kitti_camera
                # with a fake calib — here axis-permute like waymo_utils)
                anno['location'] = np.stack(
                    [-boxes[:, 1], -boxes[:, 2], boxes[:, 0]], axis=1) \
                    if n else np.zeros((0, 3))
                anno['dimensions'] = boxes[:, [3, 5, 4]] if n else np.zeros((0, 3))
                anno['rotation_y'] = -boxes[:, 6] - np.pi / 2 if n else np.zeros(0)
                if 'score' not in anno:
                    anno['score'] = np.zeros(n)
            return annos

        eval_det = transform(copy.deepcopy(det_annos))
        eval_gt = transform([
            {'name': info['annos']['name'],
             'gt_boxes_lidar': info['annos']['gt_boxes_lidar']}
            for info in self.infos])
        classes = [map_name.get(c, c) for c in class_names]
        return kitti_eval.get_official_eval_result(eval_gt, eval_det, classes)

    def _waymo_official_eval(self, det_annos, class_names):
        try:
            from .waymo_eval import OpenPCDetWaymoDetectionMetricsEstimator
        except ImportError as e:
            return f'waymo-open-dataset unavailable ({e}); use kitti metric', {}
        raise NotImplementedError('official waymo metrics need tensorflow + '
                                  'waymo-open-dataset')
