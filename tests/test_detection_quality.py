"""Detection-quality gates (VERDICT r3 #4).

The reference's de-facto oracle is end-to-end KITTI AP
(/root/reference/tools/test.py:95-154, SURVEY.md §4 item 1): a detector that
predicts garbage everywhere fails it.  These tests are the synthetic-scene
equivalent: they fail if ANY stage of voxelize → backbone → head → NMS →
eval is silently wrong, unlike the loss-decrease / mAP-is-finite checks in
test_train_loop.py.

Two gates:
  1. trained-to-threshold AP: tiny PointPillars on easy scenes (few large
     well-separated cars, dense object points) must reach mAP >= 0.60.
  2. acquisition quality: on a pool where most frames are empty, CRB
     selection rounds must land materially more object frames than random
     selection, aggregated over seeds (reference semantics: crb_sampling.py
     stage 1 drops empty/low-entropy frames; random_sampling.py:12-53
     cannot).  See test_crb_beats_random's docstring for why the
     learning-curve comparison is measured-but-not-gated at this scale.
"""

import copy

import numpy as np
import jax
import pytest

from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.datasets import build_dataloader, \
    build_active_dataloader
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.query_strategies import build_strategy
from crb_active_3ddet_tpu.runtime import train as train_rt
from crb_active_3ddet_tpu.runtime import eval as eval_rt
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

from test_pointpillar_model import MODEL_CFG

pytestmark = [pytest.mark.slow, pytest.mark.xslow]

CLASS_NAMES = ['Car']

# Gate 2 MUST be multi-class: CRB stage 1 scores each frame by the Shannon
# entropy of its predicted-label histogram over num_class bins (reference
# crb_sampling.py:86-92 — `unique_proportions = torch.ones(num_class)` then
# counts at the predicted labels).  With a single class the histogram has one
# bin, every frame scores exactly 0, and stage 1 degenerates to chance — by
# the reference's own formula, not a rebuild bug (measured: 3/8 object frames
# on the 1-class pool, i.e. chance).  Two classes restore the paper's signal:
# frames with zero predictions score exactly 0 and rank last.
#
# Both classes must be LEARNABLE by the deliberately-tiny gate model:
# round-5 calibration showed Car+Pedestrian pretrain plateaus at val AP
# ~0.05 (a 0.8x0.6 m pedestrian spans ~2 cells of the 0.4 m pillar grid)
# and the scorer then fires on 0/7 pool object frames — the gate measured
# the gate-model's blindness, not acquisition quality.  Car + Vehicle
# (waymo-sized, 4.7x2.1) are both multi-voxel and size-separable, so the
# pretrained scorer fires on object frames and the entropy signal is live.
AL_CLASS_NAMES = ['Car', 'Vehicle']
AL_MODEL_CFG = copy.deepcopy(MODEL_CFG)
AL_MODEL_CFG.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG.append(CfgNode(
    {'class_name': 'Vehicle', 'anchor_sizes': [[4.7, 2.1, 1.7]],
     'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.65],
     'align_center': False, 'feature_map_stride': 2,
     'matched_threshold': 0.6, 'unmatched_threshold': 0.45}))
# a weakly-pretrained model fires low-score FP boxes on empty frames at the
# default 0.1 threshold; 0.3 keeps empty frames at entropy exactly 0
AL_MODEL_CFG.POST_PROCESSING.SCORE_THRESH = 0.3


def easy_data_cfg(n_scenes, seed=11, empty_fraction=0.0, max_objects=3):
    """Easy synthetic scenes: few large well-separated cars with dense
    object points over sparse ground clutter."""
    return CfgNode({
        'DATASET': 'SyntheticDataset',
        'DATA_PATH': '/tmp/synthetic',
        'POINT_CLOUD_RANGE': [0, -12.8, -3, 25.6, 12.8, 1],
        'NUM_SCENES': n_scenes,
        'SEED': seed,
        'NUM_BG_POINTS': 1024,
        'MAX_OBJECTS': max_objects,
        'POINTS_PER_OBJECT': [200, 400],
        'MIN_SEPARATION': 6.0,
        'EMPTY_FRACTION': empty_fraction,
        'MAX_GT_BOXES': 8,
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'POINT_FEATURE_ENCODING': {
            'encoding_type': 'absolute_coordinates_encoding',
            'used_feature_list': ['x', 'y', 'z', 'intensity'],
            'src_feature_list': ['x', 'y', 'z', 'intensity']},
        # flip-only: the gate model is deliberately tiny, and continuous
        # world rotation makes its task open-ended (calibrated r4: with
        # ±45° rotation the 32-filter model plateaus at mAP ~0.3-0.4 at
        # 144 epochs; without it, it overfits 4 scenes to mAP 1.0 and
        # generalizes to unseen scenes at ~0.88 by epoch 64).  Rotation
        # math itself is covered by the augmentor parity tests.
        'DATA_AUGMENTOR': {
            'DISABLE_AUG_LIST': ['placeholder'],
            'AUG_CONFIG_LIST': [
                {'NAME': 'random_world_flip', 'ALONG_AXIS_LIST': ['x']}]},
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'shuffle_points',
             'SHUFFLE_ENABLED': {'train': True, 'test': False}},
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.4, 0.4, 4.0],
             'MAX_POINTS_PER_VOXEL': 16,
             'MAX_NUMBER_OF_VOXELS': {'train': 1024, 'test': 1024},
             'MAX_POINTS_PER_FRAME': {'train': 3072, 'test': 3072}}],
    })


OPTIM_CFG = CfgNode({'OPTIMIZER': 'adam_onecycle', 'LR': 0.003,
                     'WEIGHT_DECAY': 0.01, 'MOMENTUM': 0.9,
                     'PCT_START': 0.4, 'DIV_FACTOR': 10,
                     'GRAD_NORM_CLIP': 10})


def train_and_eval(train_set, train_loader, val_set, val_loader, epochs,
                   batch_size=4, seed=0, model_cfg=MODEL_CFG,
                   class_names=CLASS_NAMES):
    """Fresh model → train `epochs` → (mAP dict, recall dict)."""
    model = build_detector(model_cfg, num_class=len(class_names),
                           dataset=train_set)
    steps = max(len(train_set) // batch_size, 1) * epochs
    optimizer, _ = build_optimizer(OPTIM_CFG, total_steps=steps)
    state = train_rt.init_train_state(model, optimizer, train_set,
                                      batch_size=batch_size)
    train_step = train_rt.make_train_step(model, optimizer, train_set)
    rng = jax.random.PRNGKey(seed)
    for _ in range(epochs):
        state, metrics, rng = train_rt.train_one_epoch(
            state, train_step, train_loader, rng)
    eval_step = eval_rt.make_eval_step(model, val_set,
                                       model_cfg.POST_PROCESSING,
                                       num_class=len(class_names))
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    _, ap_dict, recall = eval_rt.eval_one_epoch(
        variables, eval_step, val_set, val_loader, class_names)
    return ap_dict, recall


def test_pointpillar_reaches_threshold_ap():
    """Gate 1: the full voxelize→VFE→BEV→head→NMS→AP chain must actually
    DETECT — mAP@IoU0.5 >= 0.60 on easy scenes, evaluated on UNSEEN val
    scenes (threshold calibrated round 4: a healthy build reaches ~0.88
    by epoch 64; a build with any silently-wrong stage scores ~0)."""
    data_cfg = easy_data_cfg(32)
    train_set, train_loader, _ = build_dataloader(
        data_cfg, CLASS_NAMES, batch_size=4, training=True, workers=0,
        seed=0)
    val_cfg = easy_data_cfg(16)
    val_set, val_loader, _ = build_dataloader(
        val_cfg, CLASS_NAMES, batch_size=4, training=False, workers=0)
    ap_dict, recall = train_and_eval(train_set, train_loader, val_set,
                                     val_loader, epochs=64)
    assert ap_dict['mAP'] > 0.60, \
        f'detector failed to learn: {ap_dict} recall={recall}'


def _al_round(method, tmp_path, epochs_per_round=0, seed=0):
    """One pretrain + one acquisition (+ optional retrain when
    ``epochs_per_round`` > 0); returns (final mAP or None, n object frames
    selected).

    Pool sizing (round-5 calibration): 96 scenes at 55% empty ≈ 43 object
    frames; the 16-frame object seed leaves a pool of 80 with ~27 object
    frames (34%) — chance selects ~2.7 of 8 (the old 64-scene pool kept
    only 7 object frames, putting even a perfect scorer near chance)."""
    cfg = CfgNode({
        'CLASS_NAMES': AL_CLASS_NAMES,
        'DATA_CONFIG': easy_data_cfg(96, seed=23, empty_fraction=0.55,
                                     max_objects=3),
        'MODEL': AL_MODEL_CFG,
        'OPTIMIZATION': CfgNode({**OPTIM_CFG, 'BATCH_SIZE_PER_GPU': 4,
                                 'NUM_EPOCHS': 1}),
        'ACTIVE_TRAIN': {
            'METHOD': method, 'AGGREGATION': 'mean',
            'PRE_TRAIN_SAMPLE_NUMS': 8, 'PRE_TRAIN_EPOCH_NUMS': 1,
            'TRAIN_RESUME': False, 'SELECT_NUMS': 8,
            'SELECT_LABEL_EPOCH_INTERVAL': 1, 'TOTAL_BUDGET_NUMS': 8,
            'ACTIVE_CONFIG': {'K1': 2, 'K2': 1, 'BANDWDITH': 5,
                              'CLUSTERING': 'kmeans++'},
        },
    })
    # The seed labels must contain objects or acquisition scores a model
    # that predicts nothing and every entropy ties at 0 (measured: a random
    # 8-frame seed off this pool drew 1 object frame and CRB degenerated to
    # chance).  The reference pretrains on random KITTI frames, which are
    # essentially never empty (train_utils/train_active_utils.py pretrain
    # loop) — mirror that by seeding with object frames; the 60%-empty pool
    # remains the acquisition stressor.
    full_set, _, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=4, training=True,
        workers=0, seed=3)
    ids = list(full_set.sample_id_list)
    seed_ids = [i for i in ids if len(full_set.get_scene(i)[1]) > 0][:16]
    pool_ids = [i for i in ids if i not in set(seed_ids)]

    def infos(id_list):
        return [{'frame_id': s, 'point_cloud': {'lidar_idx': s}}
                for s in id_list]

    (lab_set, unlab_set, lab_loader, unlab_loader, _, _) = \
        build_active_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=4, workers=0,
            training=True, active_training=(seed_ids, infos(seed_ids),
                                            pool_ids, infos(pool_ids)),
            seed=3)

    # pretrain on the seed split so acquisition scores a model that fires
    # confident (>0.3) boxes on object frames and nothing on empty ones;
    # steps are cheap (tiny model, ~23 ms/step), compiles dominate the wall
    # clock.  512 steps is where gate 1's calibration curve crosses
    # mAP ~0.88 — below that the scorer is blind and every entropy ties at 0
    pretrain_epochs = 128
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                           dataset=lab_set)
    optimizer, _ = build_optimizer(
        OPTIM_CFG,
        total_steps=max(len(lab_set) // 4, 1) * pretrain_epochs)
    state = train_rt.init_train_state(model, optimizer, lab_set, batch_size=4)
    train_step = train_rt.make_train_step(model, optimizer, lab_set)
    rng = jax.random.PRNGKey(seed)
    for _ in range(pretrain_epochs):
        state, _m, rng = train_rt.train_one_epoch(
            state, train_step, lab_loader, rng)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    tmp_path.mkdir(parents=True, exist_ok=True)
    strat = build_strategy(method, model, variables, lab_loader,
                           unlab_loader, rank=0,
                           active_label_dir=str(tmp_path), cfg=cfg)
    selected = strat.query(cur_epoch=0)
    assert len(selected) == 8

    n_object_frames = sum(
        1 for fid in selected if len(unlab_set.get_scene(fid)[1]) > 0)
    if not epochs_per_round:
        return None, n_object_frames

    # retrain from scratch on pretrain + selected (the reference resets to
    # the init checkpoint each round, train_active_utils.py:320-322)
    sel_ids = list(lab_set.sample_id_list) + list(selected)
    sel_infos = [{'frame_id': s, 'point_cloud': {'lidar_idx': s}}
                 for s in sel_ids]
    unsel = [s for s in unlab_set.sample_id_list if s not in set(selected)]
    unsel_infos = [{'frame_id': s, 'point_cloud': {'lidar_idx': s}}
                   for s in unsel]
    (lab_set2, _u2, lab_loader2, _ul2, _, _) = build_active_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=4, workers=0,
        training=True, active_training=(sel_ids, sel_infos, unsel,
                                        unsel_infos), seed=3)
    val_cfg = easy_data_cfg(16, seed=29)
    val_set, val_loader, _ = build_dataloader(
        val_cfg, cfg.CLASS_NAMES, batch_size=4, training=False, workers=0)
    ap_dict, _recall = train_and_eval(lab_set2, lab_loader2, val_set,
                                      val_loader, epochs=epochs_per_round,
                                      seed=seed + 1, model_cfg=cfg.MODEL,
                                      class_names=cfg.CLASS_NAMES)
    return ap_dict['mAP'], n_object_frames


def test_crb_beats_random(tmp_path):
    """Gate 2: on a 55%-empty pool, CRB's entropy filter must concentrate
    the label budget on object frames — random selection cannot.

    Aggregated over 3 model-init seeds (round-5 calibration on this box:
    CRB picks 5/3/6 object frames of 8, random picks 3/3/1 — aggregate 14
    vs 7 at a per-seed chance level of ~2.7).  The per-seed margin is too
    tight for a flake-free gate (seed 1 ties at 3-3), so the assertion is
    on the aggregate with a cushion: crb >= rand + 3 (measured +7).

    The retrained-model mAP comparison was measured and REJECTED as a gate:
    at this deliberately-tiny scale the 2-class mAP of both arms lands in
    0.06-0.10 and anti-correlates with selection quality (seed 2: CRB 6/8
    object frames, mAP 0.062 vs random 1/8, mAP 0.100) — it gates model
    capacity noise, not acquisition.  The paper-scale learning-curve claim
    (CRB > RAND at equal budgets, Table 1) needs real KITTI training runs,
    which this box cannot host (BASELINE.md)."""
    crb_total = rand_total = 0
    for seed in (0, 1, 2):
        _, crb_obj = _al_round('crb', tmp_path / f'crb{seed}', seed=seed)
        _, rand_obj = _al_round('random', tmp_path / f'rand{seed}',
                                seed=seed)
        crb_total += crb_obj
        rand_total += rand_obj
    assert crb_total > rand_total, (crb_total, rand_total)
    assert crb_total >= rand_total + 3, \
        f'CRB {crb_total}/24 object frames vs random {rand_total}/24 — ' \
        'acquisition no longer concentrates the budget on object frames'


# ---------------------------------------------------------------------------
# Gate 3: the SPARSE stack must actually detect (VERDICT r4 #4) — a
# silently-wrong rulebook/gather-GEMM (ops/sparse/rulebook.py, the
# TPU-riskiest code in the repo) passes loss-descent and shard-parity tests
# but cannot pass a trained-to-threshold AP gate.
# ---------------------------------------------------------------------------

SECOND_MODEL_CFG = CfgNode({
    'NAME': 'SECONDNet',
    'VFE': {'NAME': 'MeanVFE'},
    'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'},
    'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256},
    # upsample the stride-8 sparse output back to a stride-4 BEV map:
    # 0.8 m anchor spacing at the 0.2 m voxel size below — the same
    # anchor density gate 1's PointPillars sees (round-5 calibration: a
    # stride-8 head detects — recall@0.3 31/32 — but plateaus at mAP@0.5
    # ~0.45 because 1.6 m anchor spacing starves IoU-0.5 localization)
    'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [2, 2],
                    'LAYER_STRIDES': [1, 2], 'NUM_FILTERS': [32, 64],
                    'UPSAMPLE_STRIDES': [2, 4],
                    'NUM_UPSAMPLE_FILTERS': [32, 32]},
    'DENSE_HEAD': {
        'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
        'USE_DIRECTION_CLASSIFIER': True, 'DIR_OFFSET': 0.78539,
        'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
        'ANCHOR_GENERATOR_CONFIG': [
            {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
             'anchor_rotations': [0, 1.57],
             'anchor_bottom_heights': [-1.78], 'align_center': False,
             'feature_map_stride': 4, 'matched_threshold': 0.6,
             'unmatched_threshold': 0.45}],
        'TARGET_ASSIGNER_CONFIG': {
            'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
            'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
            'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder'},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
            'code_weights': [1.0] * 7}}},
    'POST_PROCESSING': dict(MODEL_CFG.POST_PROCESSING),
})


def easy_second_data_cfg(n_scenes, seed=11):
    """The gate-1 easy scenes voxelized at KITTI-like geometry ratios for
    the sparse stack: 0.2x0.2x0.1 m voxels over a 25.6 m range mirror
    KITTI's 0.05 m voxels over 70 m (the same 8x-downsampled 1.6 m BEV
    cell the reference's SECOND head sees, kitti_dataset.yaml:64-70).
    Voxel budget: scenes carry <=2.3k points, so 3072 slots are lossless."""
    cfg = easy_data_cfg(n_scenes, seed=seed)
    cfg.DATA_PROCESSOR[-1]['VOXEL_SIZE'] = [0.2, 0.2, 0.1]
    cfg.DATA_PROCESSOR[-1]['MAX_POINTS_PER_VOXEL'] = 5
    cfg.DATA_PROCESSOR[-1]['MAX_NUMBER_OF_VOXELS'] = {
        'train': 3072, 'test': 3072}
    return cfg


def test_second_reaches_threshold_ap():
    """Gate 3: voxelize → sort-join rulebooks → gather-GEMM sparse stack →
    HeightCompression → BEV → head → NMS → AP must DETECT on unseen val
    scenes (threshold calibrated round 5: healthy build reaches ~0.9 by
    epoch 48 — see STATUS.md)."""
    data_cfg = easy_second_data_cfg(32)
    train_set, train_loader, _ = build_dataloader(
        data_cfg, CLASS_NAMES, batch_size=4, training=True, workers=0,
        seed=0)
    val_cfg = easy_second_data_cfg(16, seed=31)
    val_set, val_loader, _ = build_dataloader(
        val_cfg, CLASS_NAMES, batch_size=4, training=False, workers=0)
    ap_dict, recall = train_and_eval(train_set, train_loader, val_set,
                                     val_loader, epochs=48,
                                     model_cfg=SECOND_MODEL_CFG)
    assert ap_dict['mAP'] > 0.60, \
        f'sparse stack failed to learn: {ap_dict} recall={recall}'
