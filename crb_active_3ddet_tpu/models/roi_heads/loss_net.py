"""LossNet for learning-loss AL (llal).

Parity: ``pcdet/models/roi_heads/loss_net.py`` — per shared-FC ReLU layer a
1×1 conv→BN→ReLU down to 1 channel, concatenated over layers and rois, then
one linear to a scalar predicted loss per batch sample.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class LossNet(nn.Module):
    model_cfg: Any  # ROI_HEAD cfg with LOSS_NET.SHARED_FC + TARGET_CONFIG

    @nn.compact
    def __call__(self, latent_features, batch_size: int, training: bool = False):
        """latent_features: list of (B·R, C_k) post-ReLU shared-FC activations.
        Returns (B,) predicted per-sample losses."""
        outs = []
        for k, feats in enumerate(latent_features):
            x = nn.Dense(1, use_bias=False, name=f'conv_{k}')(feats)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                             epsilon=1e-3, name=f'bn_{k}')(x)
            x = nn.relu(x)
            outs.append(x.reshape(batch_size, -1))  # (B, R)
        cat = jnp.concatenate(outs, axis=1)         # (B, R·num_layers)
        return nn.Dense(1, name='linear')(cat)[:, 0]
