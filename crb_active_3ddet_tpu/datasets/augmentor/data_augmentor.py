"""Config-driven augmentation queue.

Parity: ``pcdet/datasets/augmentor/data_augmentor.py:9-120`` (dispatch by
NAME with DISABLE_AUG_LIST, gt_sampling via DataBaseSampler, world
flip/rotation/scaling)."""

from __future__ import annotations

from functools import partial

from . import augmentor_utils
from .database_sampler import DataBaseSampler


class DataAugmentor:
    def __init__(self, root_path, augmentor_configs, class_names, logger=None):
        self.root_path = root_path
        self.class_names = class_names
        self.logger = logger
        self.data_augmentor_queue = []
        aug_config_list = augmentor_configs if isinstance(augmentor_configs, list) \
            else augmentor_configs.AUG_CONFIG_LIST
        for cur_cfg in aug_config_list:
            if not isinstance(augmentor_configs, list):
                if cur_cfg.NAME in augmentor_configs.DISABLE_AUG_LIST:
                    continue
            self.data_augmentor_queue.append(
                getattr(self, cur_cfg.NAME)(config=cur_cfg))

    def gt_sampling(self, config=None):
        return DataBaseSampler(
            root_path=self.root_path, sampler_cfg=config,
            class_names=self.class_names, logger=self.logger)

    def random_world_flip(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_flip, config=config)
        gt_boxes, points = data_dict['gt_boxes'], data_dict['points']
        for cur_axis in config['ALONG_AXIS_LIST']:
            assert cur_axis in ('x', 'y')
            gt_boxes, points = getattr(
                augmentor_utils, f'random_flip_along_{cur_axis}')(gt_boxes, points)
        data_dict['gt_boxes'], data_dict['points'] = gt_boxes, points
        return data_dict

    def random_world_rotation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_rotation, config=config)
        rot_range = config['WORLD_ROT_ANGLE']
        if not isinstance(rot_range, list):
            rot_range = [-rot_range, rot_range]
        gt_boxes, points = augmentor_utils.global_rotation(
            data_dict['gt_boxes'], data_dict['points'], rot_range)
        data_dict['gt_boxes'], data_dict['points'] = gt_boxes, points
        return data_dict

    def random_world_scaling(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_scaling, config=config)
        gt_boxes, points = augmentor_utils.global_scaling(
            data_dict['gt_boxes'], data_dict['points'],
            config['WORLD_SCALE_RANGE'])
        data_dict['gt_boxes'], data_dict['points'] = gt_boxes, points
        return data_dict

    def forward(self, data_dict):
        for augmentor in self.data_augmentor_queue:
            data_dict = augmentor(data_dict=data_dict)
        # filter non-class gts and drop the mask (parity:
        # data_augmentor.py:250-257; gt_sampling already consumed it if run)
        if 'gt_boxes_mask' in data_dict:
            mask = data_dict['gt_boxes_mask']
            data_dict['gt_boxes'] = data_dict['gt_boxes'][mask]
            data_dict['gt_names'] = data_dict['gt_names'][mask]
            if 'gt_boxes2d' in data_dict:
                data_dict['gt_boxes2d'] = data_dict['gt_boxes2d'][mask]
            data_dict.pop('gt_boxes_mask')
        return data_dict
