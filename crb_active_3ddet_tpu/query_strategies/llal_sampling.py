"""Learning-loss (LLAL) sampling. Parity:
``pcdet/query_strategies/llal_sampling.py`` (:38-58) — rank frames by the
LossNet's predicted loss, take the top SELECT_NUMS.  The loss-net itself is
trained in the active trainer (``train_active_utils.py:242-296``)."""

from __future__ import annotations

from .strategy import Strategy


class LLALSampling(Strategy):
    def query(self, leave_pbar=True, cur_epoch=None):
        records = self.scan_pool(signals=('loss_predictions',))
        missing = [f for f, r in records.items() if 'loss_predictions' not in r]
        if missing:
            raise RuntimeError(
                'llal requires a model with a LossNet (MODEL.ROI_HEAD.LOSS_NET); '
                'the current model emits no loss_predictions')
        select_dic = {fid: float(r['loss_predictions'].sum())
                      for fid, r in records.items()}
        ranked = sorted(select_dic.items(), key=lambda kv: kv[1])
        n = self.cfg.ACTIVE_TRAIN.SELECT_NUMS
        return [fid for fid, _ in ranked[len(ranked) - n:]]
