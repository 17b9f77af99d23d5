"""Active-learning loop integration tests on the tiny synthetic setup."""

import numpy as np
import jax
import pytest


from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.datasets import build_active_dataloader
from crb_active_3ddet_tpu.models.detectors import build_detector
from crb_active_3ddet_tpu.query_strategies import build_strategy
from crb_active_3ddet_tpu.runtime import train as train_rt
from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

from test_train_loop import tiny_data_cfg
from test_pointpillar_model import MODEL_CFG

pytestmark = pytest.mark.slow


def make_cfg(method='random', select_nums=2):
    return CfgNode({
        'CLASS_NAMES': ['Car'],
        'DATA_CONFIG': tiny_data_cfg(training_scenes=12),
        'MODEL': MODEL_CFG,
        'OPTIMIZATION': {'OPTIMIZER': 'adam_onecycle', 'LR': 0.003,
                         'WEIGHT_DECAY': 0.01, 'MOMENTUM': 0.9,
                         'PCT_START': 0.4, 'DIV_FACTOR': 10,
                         'GRAD_NORM_CLIP': 10, 'BATCH_SIZE_PER_GPU': 2,
                         'NUM_EPOCHS': 1},
        'ACTIVE_TRAIN': {
            'METHOD': method, 'AGGREGATION': 'mean',
            'PRE_TRAIN_SAMPLE_NUMS': 4, 'PRE_TRAIN_EPOCH_NUMS': 1,
            'TRAIN_RESUME': False, 'SELECT_NUMS': select_nums,
            'SELECT_LABEL_EPOCH_INTERVAL': 1, 'TOTAL_BUDGET_NUMS': 4,
            'ACTIVE_CONFIG': {'K1': 2, 'K2': 1, 'BANDWDITH': 5,
                              'CLUSTERING': 'kmeans++'},
        },
    })


@pytest.fixture(scope='module')
def al_setup():
    cfg = make_cfg()
    (lab_set, unlab_set, lab_loader, unlab_loader, _, _) = \
        build_active_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, workers=0,
            training=True, pre_train_sample_nums=4, seed=0)
    model = build_detector(cfg.MODEL, num_class=1, dataset=lab_set)
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=10)
    state = train_rt.init_train_state(model, optimizer, lab_set, batch_size=2)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    return cfg, model, variables, lab_loader, unlab_loader


def test_pool_split(al_setup):
    cfg, model, variables, lab_loader, unlab_loader = al_setup
    assert len(lab_loader.dataset) == 4
    assert len(unlab_loader.dataset) == 8
    lab_ids = set(lab_loader.dataset.sample_id_list)
    unlab_ids = set(unlab_loader.dataset.sample_id_list)
    assert not lab_ids & unlab_ids


@pytest.mark.parametrize('method', ['random', 'entropy', 'confidence',
                                    'montecarlo', 'coreset', 'bald'])
def test_strategy_selects(al_setup, method, tmp_path):
    cfg, model, variables, lab_loader, unlab_loader = al_setup
    strat = build_strategy(make_cfg(method).ACTIVE_TRAIN.METHOD, model,
                           variables, lab_loader, unlab_loader, rank=0,
                           active_label_dir=str(tmp_path),
                           cfg=make_cfg(method))
    selected = strat.query(cur_epoch=0)
    assert len(selected) == 2
    assert len(set(selected)) == 2
    assert set(selected) <= set(unlab_loader.dataset.sample_id_list)
    # bookkeeping + pickle parity
    strat.save_active_labels(selected_frames=list(selected), cur_epoch=0)
    import pickle
    with open(tmp_path / 'selected_frames_epoch_0_rank_0.pkl', 'rb') as f:
        saved = pickle.load(f)
    assert list(saved['frame_id']) == list(selected)
    assert len(saved['selected_bbox']) == 2


def test_badge_selects(al_setup, tmp_path):
    cfg, model, variables, lab_loader, unlab_loader = al_setup
    c = make_cfg('badge')
    strat = build_strategy('badge', model, variables, lab_loader,
                           unlab_loader, rank=0,
                           active_label_dir=str(tmp_path), cfg=c)
    selected = strat.query(cur_epoch=0)
    assert len(selected) == 2
    assert set(selected) <= set(unlab_loader.dataset.sample_id_list)


def test_crb_selects(al_setup, tmp_path):
    cfg, model, variables, lab_loader, unlab_loader = al_setup
    c = make_cfg('crb')
    strat = build_strategy('crb', model, variables, lab_loader, unlab_loader,
                           rank=0, active_label_dir=str(tmp_path), cfg=c)
    selected = strat.query(cur_epoch=0)
    assert len(selected) == 2
    assert set(selected) <= set(unlab_loader.dataset.sample_id_list)


def test_full_active_loop(tmp_path):
    from crb_active_3ddet_tpu.runtime.active import train_model_active
    import logging
    cfg = make_cfg('random')
    logger = logging.getLogger('test_al')
    logger.addHandler(logging.NullHandler())
    out = tmp_path / 'out'
    ckpt = out / 'ckpt'
    ckpt.mkdir(parents=True)
    state = train_model_active(cfg, None, batch_size=2, logger=logger,
                               output_dir=out, ckpt_dir=ckpt, workers=0)
    # 2 rounds happened: ckpts exist, selections pickled
    sel = list((out / 'active_labels').glob('selected_frames_*.pkl'))
    assert len(sel) == 2
    assert len(list(ckpt.glob('checkpoint_epoch_*.pkl'))) == 2
