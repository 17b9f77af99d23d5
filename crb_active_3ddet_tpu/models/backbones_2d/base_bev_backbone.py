"""Dense 2D BEV backbone (Flax, NHWC). Parity:
``pcdet/models/backbones_2d/base_bev_backbone.py:6-111`` — conv pyramid with
stride-2 downsampling blocks and transpose-conv upsampling, concatenated.
NHWC + bias-free conv + BN(eps 1e-3, momentum 0.01) exactly as the reference;
layout is TPU-native channels-last so XLA maps the 3×3 convs onto the MXU.
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax.numpy as jnp


class _ConvBlock(nn.Module):
    features: int
    stride: int
    num_layers: int
    dtype: str = 'float32'

    @nn.compact
    def __call__(self, x, training: bool):
        # convs run in the compute dtype (bf16 halves HBM traffic and feeds
        # the MXU its native operand type); BN statistics stay f32 — same
        # pattern as the 3D backbone's MaskedSparseConv
        cdt = jnp.dtype(self.dtype)
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=cdt)(x.astype(cdt)).astype(jnp.float32)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3)(x)
        x = nn.relu(x)
        for _ in range(self.num_layers):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False,
                        dtype=cdt)(x.astype(cdt)).astype(jnp.float32)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                             epsilon=1e-3)(x)
            x = nn.relu(x)
        return x


class _DeBlock(nn.Module):
    features: int
    upsample_stride: float
    dtype: str = 'float32'

    @nn.compact
    def __call__(self, x, training: bool):
        s = self.upsample_stride
        cdt = jnp.dtype(self.dtype)
        x = x.astype(cdt)
        if s >= 1:
            s = int(s)
            x = nn.ConvTranspose(self.features, (s, s), strides=(s, s),
                                 use_bias=False, dtype=cdt)(x)
        else:
            s = int(np.round(1 / s))
            x = nn.Conv(self.features, (s, s), strides=(s, s), use_bias=False,
                        dtype=cdt)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3)(x.astype(jnp.float32))
        return nn.relu(x)


class BaseBEVBackbone(nn.Module):
    model_cfg: dict
    input_channels: int

    @nn.compact
    def __call__(self, batch_dict, training: bool = False):
        x = batch_dict['spatial_features']  # (B, H, W, C)
        cfg = self.model_cfg
        layer_nums = list(cfg.get('LAYER_NUMS', []))
        layer_strides = list(cfg.get('LAYER_STRIDES', []))
        num_filters = list(cfg.get('NUM_FILTERS', []))
        upsample_strides = list(cfg.get('UPSAMPLE_STRIDES', []))
        num_upsample_filters = list(cfg.get('NUM_UPSAMPLE_FILTERS', []))

        cdt = 'bfloat16' if cfg.get('USE_BF16', False) else 'float32'

        ups = []
        h_in = x.shape[1]
        for i in range(len(layer_nums)):
            x = _ConvBlock(num_filters[i], layer_strides[i], layer_nums[i],
                           dtype=cdt)(x, training)
            stride = int(h_in / x.shape[1])
            batch_dict[f'spatial_features_{stride}x'] = x
            if upsample_strides:
                ups.append(_DeBlock(num_upsample_filters[i],
                                    upsample_strides[i], dtype=cdt)(x, training))
            else:
                ups.append(x)

        out = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if len(upsample_strides) > len(layer_nums):
            out = _DeBlock(out.shape[-1], upsample_strides[-1],
                           dtype=cdt)(out, training)
        batch_dict['spatial_features_2d'] = out
        return batch_dict

    @property
    def num_bev_features(self):
        ups = self.model_cfg.get('NUM_UPSAMPLE_FILTERS', None)
        if ups:
            n = sum(ups)
        else:
            n = self.model_cfg['NUM_FILTERS'][-1]
        return n


def build_backbone_2d(model_cfg, input_channels):
    name = model_cfg['NAME']
    if name == 'BaseBEVBackbone':
        return BaseBEVBackbone(model_cfg=model_cfg, input_channels=input_channels)
    raise KeyError(f'unknown backbone_2d {name}')
