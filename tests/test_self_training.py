"""ST3D self-training path: pseudo-label store, memory ensembles, trainer."""

import numpy as np
import pytest


from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.runtime import self_training as st

from test_train_loop import tiny_data_cfg
from test_pointpillar_model import MODEL_CFG

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _clear_store():
    st.PSEUDO_LABELS.clear()
    st.NEW_PSEUDO_LABELS.clear()
    yield
    st.PSEUDO_LABELS.clear()
    st.NEW_PSEUDO_LABELS.clear()


def _infos(boxes, scores=None, counter=None):
    boxes = np.asarray(boxes, np.float64)
    return {'gt_boxes': boxes,
            'cls_scores': None if scores is None else np.asarray(scores),
            'iou_scores': None,
            'memory_counter': np.zeros(len(boxes))
            if counter is None else np.asarray(counter, np.float64)}


ME_CFG = CfgNode({'NAME': 'consistency', 'IOU_THRESH': 0.1,
                  'NMS_THRESH': 0.1,
                  'MEMORY_VOTING': {'ENABLED': True, 'IGNORE_THRESH': 2,
                                    'RM_THRESH': 3}})


def test_consistency_ensemble_matching():
    a = _infos([[0, 0, 0, 4, 2, 2, 0.0, 1, 0.5],
                [10, 10, 0, 4, 2, 2, 0.0, 1, 0.9]])
    b = _infos([[0.1, 0, 0, 4, 2, 2, 0.0, 1, 0.8]])  # matches a[0], better
    out = st.consistency_ensemble(a, b, ME_CFG)
    # matched pair keeps the higher-score current box
    matched = out['gt_boxes'][np.isclose(out['gt_boxes'][:, 0], 0.1)]
    assert len(matched) == 1 and matched[0, 8] == 0.8
    # disappeared a[1] ages by 1 but survives (RM_THRESH=3)
    assert (out['memory_counter'] == 1).sum() == 1


def test_consistency_memory_voting_removes():
    a = _infos([[10, 10, 0, 4, 2, 2, 0.0, 1, 0.9]], counter=[2])
    b = _infos([[0, 0, 0, 4, 2, 2, 0.0, 1, 0.8]])
    out = st.consistency_ensemble(a, b, ME_CFG)
    # a's box hits RM_THRESH (2+1=3) and is removed; only b's box remains
    assert len(out['gt_boxes']) == 1
    assert np.isclose(out['gt_boxes'][0, 0], 0.0)


def test_nms_and_bipartite_ensembles():
    a = _infos([[0, 0, 0, 4, 2, 2, 0.0, 1, 0.5]])
    b = _infos([[0.05, 0, 0, 4, 2, 2, 0.0, 1, 0.9],
                [20, 0, 0, 4, 2, 2, 0.0, 1, 0.7]])
    for name in ('nms', 'bipartite'):
        out = st.ENSEMBLES[name](a, b, ME_CFG)
        # overlapping pair collapses to the higher-score box; fresh box kept
        assert len(out['gt_boxes']) == 2
        assert np.isclose(out['gt_boxes'][:, 8].max(), 0.9)


def test_pseudo_label_thresholds(tmp_path):
    batch = {'frame_id': ['f0']}
    preds = {
        'pred_valid': np.array([[True, True, True]]),
        'pred_boxes': np.array([[[0, 0, 0, 4, 2, 2, 0.0]] * 3], np.float32),
        'pred_labels': np.array([[1, 1, 1]]),
        'pred_scores': np.array([[0.9, 0.4, 0.1]]),
    }
    cfg = CfgNode({'SCORE_THRESH': [0.6], 'NEG_THRESH': [0.2]})
    st.save_pseudo_label_batch(batch, preds, cfg)
    st.commit_pseudo_labels(tmp_path, cur_epoch=0)
    ps = st.PSEUDO_LABELS['f0']['gt_boxes']
    # 0.1 removed by NEG_THRESH; 0.4 kept but label negated (ignore)
    assert len(ps) == 2
    assert ps[0, 7] == 1 and ps[1, 7] == -1
    assert (tmp_path / 'ps_label_e0.pkl').exists()
    # resume round-trips
    st.PSEUDO_LABELS.clear()
    assert st.check_already_exist_pseudo_label(tmp_path, 0) == 0
    assert 'f0' in st.PSEUDO_LABELS
    assert st.load_ps_label('f0').shape == (2, 8)


def test_train_model_st_end_to_end(tmp_path):
    cfg = CfgNode({
        'CLASS_NAMES': ['Car'],
        'DATA_CONFIG': tiny_data_cfg(training_scenes=8),
        'MODEL': MODEL_CFG,
        'OPTIMIZATION': {'OPTIMIZER': 'adam_onecycle', 'LR': 0.003,
                         'WEIGHT_DECAY': 0.01, 'PCT_START': 0.4,
                         'DIV_FACTOR': 10, 'GRAD_NORM_CLIP': 10,
                         'BATCH_SIZE_PER_GPU': 2, 'NUM_EPOCHS': 2},
        'SELF_TRAIN': {
            'SCORE_THRESH': [0.1],
            'UPDATE_PSEUDO_LABEL': [0],
            'UPDATE_PSEUDO_LABEL_INTERVAL': 1,
            'MEMORY_ENSEMBLE': {'NAME': 'consistency', 'IOU_THRESH': 0.1,
                                'MEMORY_VOTING': {'ENABLED': True,
                                                  'IGNORE_THRESH': 2,
                                                  'RM_THRESH': 3}},
        },
    })

    class Args:
        epochs = 2
        ckpt = None

    class _L:
        def info(self, *a, **k):
            pass
    ckpt_dir = tmp_path / 'ckpt'
    ckpt_dir.mkdir()
    state = st.train_model_st(cfg, Args(), batch_size=2, logger=_L(),
                              output_dir=tmp_path, ckpt_dir=ckpt_dir,
                              workers=0)
    assert (tmp_path / 'ps_label' / 'ps_label_e0.pkl').exists()
    assert (ckpt_dir / 'checkpoint_epoch_2.pkl').exists()
    assert int(state.step) > 0
