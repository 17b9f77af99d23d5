"""Lyft helpers.

Parity: ``pcdet/datasets/lyft/lyft_utils.py`` — scene/info builders
(:18-221), det→lyft-format conversion (:223-280), gt loading by token
(:282-317), result formatting (:319-332).

TPU-first delta: quaternion/box math is the shared numpy implementation in
``..nuscenes.nuscenes_utils`` (no pyquaternion); the lyft devkit is needed
only for record lookups (import-guarded at call sites).
"""

from __future__ import annotations

from functools import reduce
from pathlib import Path

import numpy as np

from ..nuscenes.nuscenes_utils import (quat_multiply, quat_rotate,
                                       quaternion_yaw, transform_matrix,
                                       yaw_to_quaternion)


def get_available_scenes(lyft):
    """Parity :18-44."""
    available_scenes = []
    for scene in lyft.scene:
        scene_rec = lyft.get('scene', scene['token'])
        sample_rec = lyft.get('sample', scene_rec['first_sample_token'])
        sd_rec = lyft.get('sample_data', sample_rec['data']['LIDAR_TOP'])
        lidar_path = lyft.get_sample_data_path(sd_rec['token'])
        if Path(lidar_path).exists():
            available_scenes.append(scene)
    return available_scenes


def get_sample_data(lyft, sample_data_token):
    """Parity :46-66 — sensor-frame boxes + ego pose record."""
    from pyquaternion import Quaternion
    sd_record = lyft.get('sample_data', sample_data_token)
    cs_record = lyft.get('calibrated_sensor',
                         sd_record['calibrated_sensor_token'])
    pose_record = lyft.get('ego_pose', sd_record['ego_pose_token'])
    boxes = lyft.get_boxes(sample_data_token)
    box_list = []
    for box in boxes:
        box.velocity = lyft.box_velocity(box.token)
        box.translate(-np.array(pose_record['translation']))
        box.rotate(Quaternion(pose_record['rotation']).inverse)
        box.translate(-np.array(cs_record['translation']))
        box.rotate(Quaternion(cs_record['rotation']).inverse)
        box_list.append(box)
    return box_list, pose_record


def fill_trainval_infos(data_path, lyft, train_scenes, val_scenes,
                        test=False, max_sweeps=10):
    """Parity :86-221."""
    train_infos, val_infos = [], []
    ref_chan = 'LIDAR_TOP'
    for sample in lyft.sample:
        ref_sd_token = sample['data'][ref_chan]
        ref_sd_rec = lyft.get('sample_data', ref_sd_token)
        ref_cs_rec = lyft.get('calibrated_sensor',
                              ref_sd_rec['calibrated_sensor_token'])
        ref_to_car = transform_matrix(ref_cs_rec['translation'],
                                      ref_cs_rec['rotation'], inverse=False)
        ref_from_car = transform_matrix(ref_cs_rec['translation'],
                                        ref_cs_rec['rotation'], inverse=True)
        ref_lidar_path = lyft.get_sample_data_path(ref_sd_token)
        ref_boxes, ref_pose_rec = get_sample_data(lyft, ref_sd_token)
        ref_time = 1e-6 * ref_sd_rec['timestamp']
        car_from_global = transform_matrix(ref_pose_rec['translation'],
                                           ref_pose_rec['rotation'],
                                           inverse=True)
        car_to_global = transform_matrix(ref_pose_rec['translation'],
                                         ref_pose_rec['rotation'],
                                         inverse=False)
        info = {
            'lidar_path': str(Path(ref_lidar_path).relative_to(data_path)),
            'ref_from_car': ref_from_car, 'ref_to_car': ref_to_car,
            'token': sample['token'], 'car_from_global': car_from_global,
            'car_to_global': car_to_global, 'timestamp': ref_time,
            'sweeps': [],
        }
        curr_sd_rec = lyft.get('sample_data', sample['data'][ref_chan])
        sweeps = []
        while len(sweeps) < max_sweeps - 1:
            if curr_sd_rec['prev'] == '':
                if len(sweeps) == 0:
                    sweeps.append({
                        'lidar_path': info['lidar_path'],
                        'sample_data_token': curr_sd_rec['token'],
                        'transform_matrix': None,
                        'time_lag': curr_sd_rec['timestamp'] * 0,
                    })
                else:
                    sweeps.append(sweeps[-1])
            else:
                curr_sd_rec = lyft.get('sample_data', curr_sd_rec['prev'])
                current_pose_rec = lyft.get('ego_pose',
                                            curr_sd_rec['ego_pose_token'])
                global_from_car = transform_matrix(
                    current_pose_rec['translation'],
                    current_pose_rec['rotation'], inverse=False)
                current_cs_rec = lyft.get(
                    'calibrated_sensor',
                    curr_sd_rec['calibrated_sensor_token'])
                car_from_current = transform_matrix(
                    current_cs_rec['translation'],
                    current_cs_rec['rotation'], inverse=False)
                tm = reduce(np.dot, [ref_from_car, car_from_global,
                                     global_from_car, car_from_current])
                lidar_path = lyft.get_sample_data_path(curr_sd_rec['token'])
                sweeps.append({
                    'lidar_path': str(Path(lidar_path).relative_to(
                        data_path)),
                    'sample_data_token': curr_sd_rec['token'],
                    'transform_matrix': tm,
                    'global_from_car': global_from_car,
                    'car_from_current': car_from_current,
                    'time_lag': ref_time - 1e-6 * curr_sd_rec['timestamp'],
                })
        info['sweeps'] = sweeps

        if not test:
            locs = np.array([b.center for b in ref_boxes]).reshape(-1, 3)
            dims = np.array([b.wlh for b in
                             ref_boxes]).reshape(-1, 3)[:, [1, 0, 2]]
            rots = np.array([quaternion_yaw(b.orientation.elements)
                             for b in ref_boxes]).reshape(-1, 1)
            velocity = np.array([b.velocity for b in
                                 ref_boxes]).reshape(-1, 3)
            names = np.array([b.name for b in ref_boxes])
            tokens = np.array([b.token for b in ref_boxes]).reshape(-1, 1)
            info['gt_boxes'] = np.concatenate([locs, dims, rots], axis=1)
            info['gt_boxes_velocity'] = velocity
            info['gt_names'] = names
            info['gt_boxes_token'] = tokens

        if sample['scene_token'] in train_scenes:
            train_infos.append(info)
        else:
            val_infos.append(info)
    return train_infos, val_infos


def boxes_lidar_to_lyft(boxes3d, scores=None, labels=None):
    """Parity :223-235 — numpy box dicts (center, wlh, wxyz quat)."""
    box_list = []
    for k in range(boxes3d.shape[0]):
        box_list.append({
            'center': boxes3d[k, :3].astype(np.float64),
            'wlh': boxes3d[k, [4, 3, 5]].astype(np.float64),
            'orientation': yaw_to_quaternion(float(boxes3d[k, 6])),
            'label': int(labels[k]) if labels is not None else np.nan,
            'score': float(scores[k]) if scores is not None else np.nan,
        })
    return box_list


def lidar_lyft_box_to_global(lyft, boxes, sample_token):
    """Parity :237-256."""
    s_record = lyft.get('sample', sample_token)
    sd_record = lyft.get('sample_data', s_record['data']['LIDAR_TOP'])
    cs_record = lyft.get('calibrated_sensor',
                         sd_record['calibrated_sensor_token'])
    pose_record = lyft.get('ego_pose', sd_record['ego_pose_token'])
    out = []
    for box in boxes:
        b = dict(box)
        for rec in (cs_record, pose_record):
            q = np.asarray(rec['rotation'])
            b['center'] = quat_rotate(q, b['center']) \
                + np.asarray(rec['translation'])
            b['orientation'] = quat_multiply(q, b['orientation'])
        out.append(b)
    return out


def convert_det_to_lyft_format(lyft, det_annos):
    """Parity :258-280."""
    sample_tokens, det_lyft_box = [], []
    for anno in det_annos:
        sample_tokens.append(anno['metadata']['token'])
        boxes = boxes_lidar_to_lyft(anno['boxes_lidar'], anno['score'],
                                    anno['pred_labels'])
        boxes = lidar_lyft_box_to_global(lyft, boxes,
                                         anno['metadata']['token'])
        for idx, box in enumerate(boxes):
            det_lyft_box.append({
                'sample_token': anno['metadata']['token'],
                'translation': np.asarray(box['center']).tolist(),
                'size': np.asarray(box['wlh']).tolist(),
                'rotation': np.asarray(box['orientation']).tolist(),
                'name': anno['name'][idx],
                'score': box['score'],
            })
    return det_lyft_box, sample_tokens


def load_lyft_gt_by_tokens(lyft, sample_tokens):
    """Parity :282-317."""
    gt_box3ds = []
    for sample_token in sample_tokens:
        sample = lyft.get('sample', sample_token)
        for ann_token in sample['anns']:
            ann = lyft.get('sample_annotation', ann_token)
            gt_box3ds.append({
                'sample_token': sample_token,
                'translation': ann['translation'],
                'size': ann['size'],
                'rotation': ann['rotation'],
                'name': ann['category_name'],
            })
    return gt_box3ds


def format_lyft_results(classwise_ap, class_names, iou_threshold_list,
                        version='trainval'):
    """Parity :319-332."""
    ret_dict = {}
    result = '----------------Lyft %s results-----------------\n' % version
    result += 'Average precision over IoUs: {}\n'.format(
        str(iou_threshold_list))
    for c_idx, class_name in enumerate(class_names):
        result += '{:<20}: \t {:.4f}\n'.format(class_name,
                                               classwise_ap[c_idx])
        ret_dict[class_name] = classwise_ap[c_idx]
    result += '--------------average performance-------------\n'
    mAP = float(np.mean(classwise_ap))
    result += 'mAP:\t {:.4f}\n'.format(mAP)
    ret_dict['mAP'] = mAP
    return result, ret_dict
