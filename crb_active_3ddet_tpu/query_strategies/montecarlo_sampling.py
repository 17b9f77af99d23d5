"""MC-dropout regression-uncertainty sampling. Parity:
``pcdet/query_strategies/montecarlo_sampling.py`` — enable dropout at eval
(:7-14,33), rank frames by the variance across SAMPLING_ROUND MC samples of
sigmoid(rcnn_cls) + rcnn_reg (:52-58).

TPU-first: the MC rounds are ``SAMPLING_ROUND`` eval-mode forwards with
distinct dropout rngs inside one jitted score pass (signals ``mc_cls_var``
and ``mc_box_var``)."""

from __future__ import annotations

from .strategy import Strategy


class MonteCarloSampling(Strategy):
    def query(self, leave_pbar=True, cur_epoch=None):
        num_mc = int(self.cfg.MODEL.get('SAMPLING_ROUND', 5))
        records = self.scan_pool(mc_dropout=True, num_mc=num_mc,
                                 signals=('mc_cls_var', 'mc_box_var'))
        select_dic = {
            fid: float(r['mc_cls_var']) + float(r['mc_box_var'])
            for fid, r in records.items()}
        ranked = sorted(select_dic.items(), key=lambda kv: kv[1])
        n = self.cfg.ACTIVE_TRAIN.SELECT_NUMS
        return [fid for fid, _ in ranked[len(ranked) - n:]]
