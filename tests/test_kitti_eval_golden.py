"""Golden-file KITTI eval parity (VERDICT r1 item 8).

The fixture was produced by running the REFERENCE evaluator
(/root/reference/pcdet/datasets/kitti/kitti_object_eval_python/eval.py,
numba stubbed to plain python, rotated IoU from an independent numpy
clipper — see tools/make_eval_golden.py) on fabricated annos.  Our
C++-backed evaluator must reproduce every AP to 1e-6.
"""

import pickle
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / 'golden' / 'kitti_eval_golden.pkl'


@pytest.mark.skipif(not GOLDEN.exists(), reason='golden fixture missing')
def test_kitti_eval_matches_reference_golden():
    from crb_active_3ddet_tpu.datasets.kitti.kitti_eval import eval as keval
    with open(GOLDEN, 'rb') as f:
        g = pickle.load(f)
    _, ret = keval.get_official_eval_result(
        g['gt_annos'], g['dt_annos'], ['Car', 'Pedestrian', 'Cyclist'])
    golden = g['result_dict']
    assert set(ret.keys()) >= set(golden.keys()), \
        sorted(set(golden) - set(ret))
    mismatches = {k: (float(ret[k]), v) for k, v in golden.items()
                  if abs(float(ret[k]) - v) > 1e-6}
    assert not mismatches, mismatches
