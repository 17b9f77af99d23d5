"""Checkpoint save/load.

Parity: ``tools/train_utils/train_utils.py`` (checkpoint_state /
save_checkpoint :146-176, ckpt scanning for resume) — ckpt dict carries
{epoch, it, model_state, optimizer_state, version}.  Storage is a pickle of
host numpy pytrees (orbax is available but pickle keeps the artifact layout
transparent and dependency-free for the resume logic).
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from pathlib import Path

import jax
import numpy as np

from .. import __version__


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def checkpoint_state(state=None, epoch=None, it=None):
    out = {'epoch': epoch, 'it': it, 'version': f'crb3d_tpu+{__version__}'}
    if state is not None:
        out['model_state'] = _to_host(state.params)
        out['batch_stats'] = _to_host(state.batch_stats)
        out['optimizer_state'] = _to_host(state.opt_state)
        out['step'] = int(state.step)
    return out


def save_checkpoint(ckpt_state: dict, filename='checkpoint'):
    filename = f'{filename}.pkl'
    with open(filename, 'wb') as f:
        pickle.dump(ckpt_state, f)
    return filename


def load_checkpoint(filename):
    with open(filename, 'rb') as f:
        return pickle.load(f)


def restore_train_state(state, ckpt: dict):
    """Graft checkpointed arrays back into a TrainState pytree."""
    def graft(template, stored):
        return jax.tree.map(lambda t, s: jax.numpy.asarray(s), template, stored)

    new = state.replace(params=graft(state.params, ckpt['model_state']),
                        batch_stats=graft(state.batch_stats, ckpt['batch_stats']))
    if ckpt.get('optimizer_state') is not None:
        new = new.replace(opt_state=jax.tree.map(
            lambda t, s: jax.numpy.asarray(s) if hasattr(s, 'shape') else s,
            state.opt_state, ckpt['optimizer_state']))
    if 'step' in ckpt:
        new = new.replace(step=jax.numpy.asarray(ckpt['step'], jax.numpy.int32))
    return new


def find_latest_checkpoint(ckpt_dir):
    """Newest epoch ckpt in a dir (parity: train_active_utils.py:107-158
    resume scan)."""
    ckpts = glob.glob(str(Path(ckpt_dir) / 'checkpoint_epoch_*.pkl'))
    if not ckpts:
        return None, 0
    def epoch_of(p):
        m = re.search(r'checkpoint_epoch_(\d+)', os.path.basename(p))
        return int(m.group(1)) if m else -1
    latest = max(ckpts, key=epoch_of)
    return latest, epoch_of(latest)
