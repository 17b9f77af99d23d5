"""Optimizer + LR schedule builders (optax).

Parity: ``tools/train_utils/optimization/__init__.py`` (build_optimizer
:11-41 adam/sgd/adam_onecycle, build_scheduler :44-71 OneCycle/lambda+warmup).
The fastai OptimWrapper machinery (layer-group flattening, fastai_optim.py)
collapses to an optax chain; OneCycle = optax.cosine_onecycle_schedule with
the same peak LR / pct_start / div factors.
"""

from __future__ import annotations

import optax


def build_lr_schedule(optim_cfg, total_steps: int):
    name = optim_cfg.get('OPTIMIZER', 'adam_onecycle')
    lr = float(optim_cfg.LR)
    if name == 'adam_onecycle':
        return optax.cosine_onecycle_schedule(
            transition_steps=max(total_steps, 1),
            peak_value=lr,
            pct_start=float(optim_cfg.get('PCT_START', 0.4)),
            div_factor=float(optim_cfg.get('DIV_FACTOR', 10)),
            final_div_factor=1e4)
    # adam / sgd: exponential decay at DECAY_STEP_LIST epochs, here piecewise
    steps_per_epoch = max(total_steps, 1)
    boundaries = {}
    decay = float(optim_cfg.get('LR_DECAY', 0.1))
    for i, e in enumerate(optim_cfg.get('DECAY_STEP_LIST', [])):
        boundaries[int(e)] = decay
    if boundaries:
        return optax.piecewise_constant_schedule(lr, boundaries)
    return optax.constant_schedule(lr)


def build_optimizer(optim_cfg, total_steps: int):
    """Returns (optax.GradientTransformation, schedule_fn)."""
    schedule = build_lr_schedule(optim_cfg, total_steps)
    name = optim_cfg.get('OPTIMIZER', 'adam_onecycle')
    wd = float(optim_cfg.get('WEIGHT_DECAY', 0.0))
    clip = float(optim_cfg.get('GRAD_NORM_CLIP', 0.0))

    if name in ('adam', 'adam_onecycle'):
        opt = optax.adamw(schedule, weight_decay=wd) if wd > 0 \
            else optax.adam(schedule)
    elif name == 'sgd':
        opt = optax.sgd(schedule, momentum=float(optim_cfg.get('MOMENTUM', 0.9)))
        if wd > 0:
            opt = optax.chain(optax.add_decayed_weights(wd), opt)
    else:
        raise KeyError(f'unknown optimizer {name}')

    chain = [optax.clip_by_global_norm(clip)] if clip > 0 else []
    chain.append(opt)
    return optax.chain(*chain), schedule
