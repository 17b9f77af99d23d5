"""NuScenes helpers.

Parity: ``pcdet/datasets/nuscenes/nuscenes_utils.py`` — detection-name
mapping (:16-41), attribute priors (:44-155 — stored here as the per-class
argmax the reference's ``max(cls_attr_dist[name].items())`` reduces to),
scene/info builders (:157-381), det→nusc anno conversion (:383-469) and
result formatting (:471-500).

TPU-first delta: quaternion/box math is plain numpy (yaw-about-z boxes) so
the det→nusc conversion depends on the devkit only for record lookups; the
info builders still require the devkit (import-guarded at call sites).
"""

from __future__ import annotations

from functools import reduce
from pathlib import Path

import numpy as np

map_name_from_general_to_detection = {
    'human.pedestrian.adult': 'pedestrian',
    'human.pedestrian.child': 'pedestrian',
    'human.pedestrian.wheelchair': 'ignore',
    'human.pedestrian.stroller': 'ignore',
    'human.pedestrian.personal_mobility': 'ignore',
    'human.pedestrian.police_officer': 'pedestrian',
    'human.pedestrian.construction_worker': 'pedestrian',
    'animal': 'ignore',
    'vehicle.car': 'car',
    'vehicle.motorcycle': 'motorcycle',
    'vehicle.bicycle': 'bicycle',
    'vehicle.bus.bendy': 'bus',
    'vehicle.bus.rigid': 'bus',
    'vehicle.truck': 'truck',
    'vehicle.construction': 'construction_vehicle',
    'vehicle.emergency.ambulance': 'ignore',
    'vehicle.emergency.police': 'ignore',
    'vehicle.trailer': 'trailer',
    'movable_object.barrier': 'barrier',
    'movable_object.trafficcone': 'traffic_cone',
    'movable_object.pushable_pullable': 'ignore',
    'movable_object.debris': 'ignore',
    'static_object.bicycle_rack': 'ignore',
}

# argmax of the reference's nuScenes-train attribute-count table
# (nuscenes_utils.py:44-155); used when velocity/class rules leave the
# attribute undecided
default_attr_by_class = {
    'barrier': 'cycle.with_rider',          # all-zero row → first key
    'bicycle': 'cycle.without_rider',
    'bus': 'vehicle.moving',
    'car': 'vehicle.parked',
    'construction_vehicle': 'vehicle.parked',
    'ignore': 'cycle.with_rider',
    'motorcycle': 'cycle.without_rider',
    'pedestrian': 'pedestrian.moving',
    'traffic_cone': 'cycle.with_rider',     # all-zero row → first key
    'trailer': 'vehicle.parked',
    'truck': 'vehicle.parked',
}


# ---------------------------------------------------------------- quat ----

def yaw_to_quaternion(yaw):
    """wxyz quaternion for a rotation of ``yaw`` about +z."""
    return np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])


def quat_multiply(q, r):
    w0, x0, y0, z0 = q
    w1, x1, y1, z1 = r
    return np.array([
        w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
        w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
        w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
        w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
    ])


def quat_rotate(q, v):
    """Rotate vector(s) v (..., 3) by wxyz quaternion q."""
    w, x, y, z = q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return np.asarray(v) @ rot.T


def quaternion_yaw(q):
    """Parity :234-249 — yaw of a lidar/global-frame quaternion (wxyz)."""
    v = quat_rotate(np.asarray(q), np.array([1.0, 0.0, 0.0]))
    return float(np.arctan2(v[1], v[0]))


def transform_matrix(translation, rotation_q, inverse=False):
    """4x4 homogeneous transform from translation + wxyz quaternion (the
    devkit ``transform_matrix`` without the devkit)."""
    w, x, y, z = rotation_q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    tm = np.eye(4)
    if inverse:
        tm[:3, :3] = rot.T
        tm[:3, 3] = rot.T @ (-np.asarray(translation))
    else:
        tm[:3, :3] = rot
        tm[:3, 3] = np.asarray(translation)
    return tm


# ------------------------------------------------------- info builders ----

def get_available_scenes(nusc):
    """Parity :157-182 — scenes whose first lidar frame exists on disk."""
    available_scenes = []
    for scene in nusc.scene:
        scene_rec = nusc.get('scene', scene['token'])
        sample_rec = nusc.get('sample', scene_rec['first_sample_token'])
        sd_rec = nusc.get('sample_data', sample_rec['data']['LIDAR_TOP'])
        lidar_path, boxes, _ = nusc.get_sample_data(sd_rec['token'])
        if Path(lidar_path).exists():
            available_scenes.append(scene)
    return available_scenes


def get_sample_data(nusc, sample_data_token, selected_anntokens=None):
    """Parity :185-231 — annotations in the sensor frame."""
    from pyquaternion import Quaternion
    sd_record = nusc.get('sample_data', sample_data_token)
    cs_record = nusc.get('calibrated_sensor',
                         sd_record['calibrated_sensor_token'])
    sensor_record = nusc.get('sensor', cs_record['sensor_token'])
    pose_record = nusc.get('ego_pose', sd_record['ego_pose_token'])
    data_path = nusc.get_sample_data_path(sample_data_token)
    if sensor_record['modality'] == 'camera':
        cam_intrinsic = np.array(cs_record['camera_intrinsic'])
    else:
        cam_intrinsic = None
    if selected_anntokens is not None:
        boxes = list(map(nusc.get_box, selected_anntokens))
    else:
        boxes = nusc.get_boxes(sample_data_token)
    box_list = []
    for box in boxes:
        box.velocity = nusc.box_velocity(box.token)
        box.translate(-np.array(pose_record['translation']))
        box.rotate(Quaternion(pose_record['rotation']).inverse)
        box.translate(-np.array(cs_record['translation']))
        box.rotate(Quaternion(cs_record['rotation']).inverse)
        box_list.append(box)
    return data_path, box_list, cam_intrinsic


def fill_trainval_infos(data_path, nusc, train_scenes, val_scenes,
                        test=False, max_sweeps=10):
    """Parity :252-381 — per-sample info dicts with sweep chains and
    sensor-frame gt boxes (x y z dx dy dz yaw vx vy)."""
    train_nusc_infos, val_nusc_infos = [], []
    ref_chan = chan = 'LIDAR_TOP'

    for sample in nusc.sample:
        ref_sd_token = sample['data'][ref_chan]
        ref_sd_rec = nusc.get('sample_data', ref_sd_token)
        ref_cs_rec = nusc.get('calibrated_sensor',
                              ref_sd_rec['calibrated_sensor_token'])
        ref_pose_rec = nusc.get('ego_pose', ref_sd_rec['ego_pose_token'])
        ref_time = 1e-6 * ref_sd_rec['timestamp']
        ref_lidar_path, ref_boxes, _ = get_sample_data(nusc, ref_sd_token)
        ref_cam_token = sample['data']['CAM_FRONT']
        ref_cam_path, _, ref_cam_intrinsic = nusc.get_sample_data(
            ref_cam_token)

        ref_from_car = transform_matrix(ref_cs_rec['translation'],
                                        ref_cs_rec['rotation'], inverse=True)
        car_from_global = transform_matrix(ref_pose_rec['translation'],
                                           ref_pose_rec['rotation'],
                                           inverse=True)
        info = {
            'lidar_path': str(Path(ref_lidar_path).relative_to(data_path)),
            'cam_front_path': str(Path(ref_cam_path).relative_to(data_path)),
            'cam_intrinsic': ref_cam_intrinsic,
            'token': sample['token'],
            'sweeps': [],
            'ref_from_car': ref_from_car,
            'car_from_global': car_from_global,
            'timestamp': ref_time,
        }

        curr_sd_rec = nusc.get('sample_data', sample['data'][chan])
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
                curr_sd_rec = nusc.get('sample_data', curr_sd_rec['prev'])
                current_pose_rec = nusc.get('ego_pose',
                                            curr_sd_rec['ego_pose_token'])
                global_from_car = transform_matrix(
                    current_pose_rec['translation'],
                    current_pose_rec['rotation'], inverse=False)
                current_cs_rec = nusc.get(
                    'calibrated_sensor',
                    curr_sd_rec['calibrated_sensor_token'])
                car_from_current = transform_matrix(
                    current_cs_rec['translation'],
                    current_cs_rec['rotation'], inverse=False)
                tm = reduce(np.dot, [ref_from_car, car_from_global,
                                     global_from_car, car_from_current])
                lidar_path = nusc.get_sample_data_path(curr_sd_rec['token'])
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
            annotations = [nusc.get('sample_annotation', token)
                           for token in sample['anns']]
            num_lidar_pts = np.array([a['num_lidar_pts']
                                      for a in annotations])
            num_radar_pts = np.array([a['num_radar_pts']
                                      for a in annotations])
            mask = (num_lidar_pts + num_radar_pts > 0)
            locs = np.array([b.center for b in ref_boxes]).reshape(-1, 3)
            # wlh → dx dy dz (lwh)
            dims = np.array([b.wlh for b in
                             ref_boxes]).reshape(-1, 3)[:, [1, 0, 2]]
            velocity = np.array([b.velocity for b in
                                 ref_boxes]).reshape(-1, 3)
            rots = np.array([quaternion_yaw(b.orientation.elements)
                             for b in ref_boxes]).reshape(-1, 1)
            names = np.array([b.name for b in ref_boxes])
            tokens = np.array([b.token for b in ref_boxes])
            gt_boxes = np.concatenate([locs, dims, rots, velocity[:, :2]],
                                      axis=1)
            info['gt_boxes'] = gt_boxes[mask, :]
            info['gt_boxes_velocity'] = velocity[mask, :]
            info['gt_names'] = np.array(
                [map_name_from_general_to_detection[n] for n in names])[mask]
            info['gt_boxes_token'] = tokens[mask]
            info['num_lidar_pts'] = num_lidar_pts[mask]
            info['num_radar_pts'] = num_radar_pts[mask]

        if sample['scene_token'] in train_scenes:
            train_nusc_infos.append(info)
        else:
            val_nusc_infos.append(info)
    return train_nusc_infos, val_nusc_infos


# ------------------------------------------------- det→nusc conversion ----

def boxes_lidar_to_nusenes(det_info):
    """Parity :383-398 (typo'd name preserved) — per-box dicts in the lidar
    frame: center, wlh, wxyz quaternion, velocity, label, score."""
    boxes3d = det_info['boxes_lidar']
    scores = det_info['score']
    labels = det_info['pred_labels']
    box_list = []
    for k in range(boxes3d.shape[0]):
        velocity = (*boxes3d[k, 7:9], 0.0) if boxes3d.shape[1] == 9 \
            else (0.0, 0.0, 0.0)
        box_list.append({
            'center': boxes3d[k, :3].astype(np.float64),
            'wlh': boxes3d[k, [4, 3, 5]].astype(np.float64),
            'orientation': yaw_to_quaternion(float(boxes3d[k, 6])),
            'velocity': np.asarray(velocity, np.float64),
            'label': int(labels[k]),
            'score': float(scores[k]),
        })
    return box_list


def lidar_nusc_box_to_global(nusc, boxes, sample_token):
    """Parity :401-420 — sensor frame → ego → global, in numpy."""
    s_record = nusc.get('sample', sample_token)
    sample_data_token = s_record['data']['LIDAR_TOP']
    sd_record = nusc.get('sample_data', sample_data_token)
    cs_record = nusc.get('calibrated_sensor',
                         sd_record['calibrated_sensor_token'])
    pose_record = nusc.get('ego_pose', sd_record['ego_pose_token'])
    out = []
    for box in boxes:
        b = dict(box)
        for rec in (cs_record, pose_record):
            q = np.asarray(rec['rotation'])
            b['center'] = quat_rotate(q, b['center']) \
                + np.asarray(rec['translation'])
            b['orientation'] = quat_multiply(q, b['orientation'])
            b['velocity'] = quat_rotate(q, b['velocity'])
        out.append(b)
    return out


def transform_det_annos_to_nusc_annos(det_annos, nusc):
    """Parity :423-468 — velocity/class attribute rules + prior fallback."""
    nusc_annos = {'results': {}, 'meta': None}
    for det in det_annos:
        annos = []
        box_list = boxes_lidar_to_nusenes(det)
        box_list = lidar_nusc_box_to_global(
            nusc=nusc, boxes=box_list, sample_token=det['metadata']['token'])
        for k, box in enumerate(box_list):
            name = det['name'][k]
            if np.sqrt(box['velocity'][0] ** 2
                       + box['velocity'][1] ** 2) > 0.2:
                if name in ('car', 'construction_vehicle', 'bus', 'truck',
                            'trailer'):
                    attr = 'vehicle.moving'
                elif name in ('bicycle', 'motorcycle'):
                    attr = 'cycle.with_rider'
                else:
                    attr = None
            else:
                if name == 'pedestrian':
                    attr = 'pedestrian.standing'
                elif name == 'bus':
                    attr = 'vehicle.stopped'
                else:
                    attr = None
            attr = attr if attr is not None else default_attr_by_class[name]
            annos.append({
                'sample_token': det['metadata']['token'],
                'translation': np.asarray(box['center']).tolist(),
                'size': np.asarray(box['wlh']).tolist(),
                'rotation': np.asarray(box['orientation']).tolist(),
                'velocity': np.asarray(box['velocity'][:2]).tolist(),
                'detection_name': name,
                'detection_score': box['score'],
                'attribute_name': attr,
            })
        nusc_annos['results'][det['metadata']['token']] = annos
    return nusc_annos


def format_nuscene_results(metrics, class_names, version='default'):
    """Parity :471-500."""
    result = '----------------Nuscene %s results-----------------\n' % version
    for name in class_names:
        threshs = ', '.join(list(metrics['label_aps'][name].keys()))
        ap_list = list(metrics['label_aps'][name].values())
        err_name = ', '.join(
            [x.split('_')[0] for x in metrics['label_tp_errors'][name]])
        error_list = list(metrics['label_tp_errors'][name].values())
        result += f'***{name} error@{err_name} | AP@{threshs}\n'
        result += ', '.join(['%.2f' % x for x in error_list]) + ' | '
        result += ', '.join(['%.2f' % (x * 100) for x in ap_list])
        result += f" | mean AP: {metrics['mean_dist_aps'][name]}"
        result += '\n'
    result += '--------------average performance-------------\n'
    details = {}
    for key, val in metrics['tp_errors'].items():
        result += '%s:\t %.4f\n' % (key, val)
        details[key] = val
    result += 'mAP:\t %.4f\n' % metrics['mean_ap']
    result += 'NDS:\t %.4f\n' % metrics['nd_score']
    details.update({'mAP': metrics['mean_ap'], 'NDS': metrics['nd_score']})
    return result, details
