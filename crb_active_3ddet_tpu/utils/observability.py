"""Metrics sinks: tensorboard (always available) + wandb (optional).

Parity: the reference logs train loss/LR, eval APs, and AL selection
dashboards to tensorboardX + wandb inline
(tools/train_utils/train_active_utils.py:71-77,
pcdet/query_strategies/strategy.py:42-63, tools/test.py:104-149).  Here one
``MetricsLogger`` owns both sinks so every CLI wires observability with two
lines; wandb engages only when importable AND WANDB_PROJECT/--wandb asks.
"""

from __future__ import annotations

import os

try:
    import wandb as _wandb
except Exception:  # pragma: no cover - wandb optional
    _wandb = None


class MetricsLogger:
    """add_scalar-style facade over tensorboard + optional wandb."""

    def __init__(self, log_dir=None, use_wandb=False, run_name=None,
                 config=None):
        self._tb = None
        self._wandb_run = None
        if log_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=str(log_dir))
            except Exception:  # pragma: no cover
                self._tb = None
        if use_wandb and _wandb is not None:
            project = os.environ.get('WANDB_PROJECT', 'crb_active_3ddet_tpu')
            try:
                self._wandb_run = _wandb.init(
                    project=project, name=run_name,
                    config=dict(config) if config else None, reinit=True)
            except Exception:  # pragma: no cover
                self._wandb_run = None

    def add_scalar(self, key, value, step=None):
        if self._tb is not None:
            self._tb.add_scalar(key, float(value), step)
        if self._wandb_run is not None:
            self._wandb_run.log({key: float(value)}, step=step)

    def add_scalars(self, mapping, step=None, prefix=''):
        for k, v in mapping.items():
            try:
                self.add_scalar(f'{prefix}{k}', float(v), step)
            except (TypeError, ValueError):
                continue

    def flush(self):
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._wandb_run is not None:
            self._wandb_run.finish()
