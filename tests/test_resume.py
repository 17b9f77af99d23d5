"""Crash-resume: replaying pickled selections + skipping completed rounds."""

import logging


import numpy as np
import pytest

from test_active_loop import make_cfg

pytestmark = pytest.mark.slow


def test_active_loop_resume(tmp_path):
    """Run the AL loop, then rerun with TRAIN_RESUME — completed rounds must
    be skipped and the final labelled pool identical."""
    from crb_active_3ddet_tpu.runtime.active import train_model_active
    cfg = make_cfg('random')
    cfg.ACTIVE_TRAIN.TRAIN_RESUME = True
    logger = logging.getLogger('test_resume')
    logger.addHandler(logging.NullHandler())
    out = tmp_path / 'out'
    ckpt = out / 'ckpt'
    ckpt.mkdir(parents=True)

    import random
    random.seed(0)
    np.random.seed(0)
    train_model_active(cfg, None, batch_size=2, logger=logger,
                       output_dir=out, ckpt_dir=ckpt, workers=0)
    sel_before = sorted(p.name for p in
                        (out / 'active_labels').glob('selected_frames_*.pkl'))
    ckpts_before = sorted(p.name for p in ckpt.glob('checkpoint_epoch_*.pkl'))
    assert len(sel_before) == 2 and len(ckpts_before) == 2

    # rerun: everything resumable; no new selections should be created
    random.seed(1)
    np.random.seed(1)
    train_model_active(cfg, None, batch_size=2, logger=logger,
                       output_dir=out, ckpt_dir=ckpt, workers=0)
    sel_after = sorted(p.name for p in
                       (out / 'active_labels').glob('selected_frames_*.pkl'))
    assert sel_after == sel_before


def test_commu_utils_single_process():
    from crb_active_3ddet_tpu.utils import commu_utils as cu
    assert cu.get_world_size() == 1
    assert cu.all_gather({'a': 1}) == [{'a': 1}]
    assert cu.average_reduce_value(3.0) == 3.0
    assert cu.all_reduce(np.asarray([1.0, 2.0]), 'sum').tolist() == [1.0, 2.0]
    assert cu.reduce_dict({'x': 2.0}) == {'x': 2.0}
    merged = cu.merge_results_dist([1, 2, 3], total_size=2)
    assert merged == [1, 2]
    cu.synchronize()
