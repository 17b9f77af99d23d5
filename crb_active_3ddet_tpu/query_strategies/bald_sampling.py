"""BALD sampling. Parity: ``pcdet/query_strategies/bald_sampling.py``
(:22-70) — one dropout-live eval pass (``model.eval()`` + ``enable_dropout``),
per-box softmax entropy over the final full-class logits, mean-aggregated per
frame, top SELECT_NUMS.  (The reference leaves this class out of its factory
dict; registered here for completeness.)

TPU-first: the dropout-live forward is the ``mc_dropout=True, num_mc=1``
branch of the shared jitted pool scorer — the per-frame ``box_entropy``
signal IS the reference's mean box entropy."""

from __future__ import annotations

from .strategy import Strategy


class BALDSampling(Strategy):
    def query(self, leave_pbar=True, cur_epoch=None):
        assert self.cfg.ACTIVE_TRAIN.AGGREGATION == 'mean'
        records = self.scan_pool(mc_dropout=True, num_mc=1,
                                 signals=('box_entropy',))
        select_dic = {fid: float(r['box_entropy'])
                      for fid, r in records.items()}
        ranked = sorted(select_dic.items(), key=lambda kv: kv[1])
        n = self.cfg.ACTIVE_TRAIN.SELECT_NUMS
        return [fid for fid, _ in ranked[len(ranked) - n:]]
