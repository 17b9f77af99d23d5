"""GPDB stage-3: batched device KDE must select the same frames as the
sklearn host oracle (parity: reference crb_sampling.py:240-338)."""

import numpy as np
import pytest

from crb_active_3ddet_tpu.config import CfgNode
from crb_active_3ddet_tpu.query_strategies.crb_sampling import CRBSampling


def _make_strategy(bandwidth=5):
    s = object.__new__(CRBSampling)
    s.bandwidth = bandwidth
    s.alpha = 0.95
    s.cfg = CfgNode({'ACTIVE_TRAIN': {'GPDB_DEVICE': True}})
    return s


def _fabricate(seed, n_frames=24, num_class=3):
    rng = np.random.RandomState(seed)
    density_list, label_list = {}, {}
    for i in range(n_frames):
        n = rng.randint(1, 12)
        density_list[f'f{i}'] = rng.uniform(0, 120, n)
        label_list[f'f{i}'] = rng.randint(1, num_class + 1, n)
    return density_list, label_list


@pytest.mark.parametrize('seed', [0, 7])
def test_device_matches_host(seed):
    s = _make_strategy()
    num_class, n_select = 3, 6
    density_list, label_list = _fabricate(seed, num_class=num_class)
    frames = list(density_list.keys())

    import scipy.stats
    from scipy.stats import uniform
    density_all = np.concatenate(list(density_list.values()))
    label_all = np.concatenate(list(label_list.values()))
    x_axis, uni = [], []
    for cls in range(num_class):
        d = np.sort(density_all[label_all == cls + 1])
        if len(d) == 0:
            d = np.asarray([0.0, 1.0])
        d_max = int(d[-1])
        hi_idx = min(int(s.alpha * len(d)), len(d) - 1)
        lo = int(d[-max(int(s.alpha * len(d)), 1)])
        hi = int(d[hi_idx])
        xs = np.linspace(-50, d_max + 50, 400)
        x_axis.append(xs)
        uni.append(uniform.pdf(xs, lo, max(hi - lo, 1e-6)))

    dl = [np.asarray(density_list[f]) for f in frames]
    ll = [np.asarray(label_list[f]) for f in frames]
    host = s._gpdb_greedy_host(list(frames), [d.copy() for d in dl],
                               [l.copy() for l in ll], x_axis, uni,
                               num_class, n_select)
    dev = s._gpdb_greedy_device(list(frames), dl, ll, x_axis, uni,
                                num_class, n_select)
    assert host == dev
