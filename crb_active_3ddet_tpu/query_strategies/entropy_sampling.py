"""Entropy sampling. Parity: ``pcdet/query_strategies/entropy_sampling.py``
(:33-68) — per-box softmax entropy over kept-box full logits, mean-aggregated
per frame, pick the top SELECT_NUMS.  The per-frame entropy is computed on
device in the jitted pool pass (signal ``box_entropy``)."""

from __future__ import annotations

from .strategy import Strategy


class EntropySampling(Strategy):
    def query(self, leave_pbar=True, cur_epoch=None):
        assert self.cfg.ACTIVE_TRAIN.AGGREGATION == 'mean'
        records = self.scan_pool(signals=('box_entropy',))
        select_dic = {fid: float(r['box_entropy']) for fid, r in records.items()}
        ranked = sorted(select_dic.items(), key=lambda kv: kv[1])
        n = self.cfg.ACTIVE_TRAIN.SELECT_NUMS
        return [fid for fid, _ in ranked[len(ranked) - n:]]
