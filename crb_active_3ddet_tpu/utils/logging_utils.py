"""Observability: tensorboard + optional wandb metric sinks.

Parity: the reference logs scalars to tensorboardX and wandb inline
(``train_active_utils.py:71-77``, ``strategy.py:42-63``, ``test.py:104-149``).
One thin sink object here so trainers/strategies stay clean; wandb is
optional (absent in this image) and silently skipped.
"""

from __future__ import annotations


class MetricsLogger:
    def __init__(self, log_dir=None, use_wandb=False, wandb_cfg=None):
        self.tb = None
        self.wandb = None
        if log_dir is not None:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(log_dir=str(log_dir))
            except Exception:
                pass
        if use_wandb:
            try:
                import wandb
                if wandb.run is None:
                    wandb.init(**(wandb_cfg or {}))
                self.wandb = wandb
            except Exception:
                pass

    def add_scalar(self, key, value, step):
        if self.tb is not None:
            self.tb.add_scalar(key, float(value), int(step))
        if self.wandb is not None:
            self.wandb.log({key: float(value)}, step=int(step))

    def add_scalars(self, scalars: dict, step):
        for k, v in scalars.items():
            try:
                self.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def flush(self):
        if self.tb is not None:
            self.tb.flush()
