"""Box coders (JAX). Parity: ``pcdet/utils/box_coder_utils.py``.

``ResidualCoder`` (`box_coder_utils.py:5-78`) is the one used by every anchor
head in the reference zoo; ``PointResidualCoder`` backs PointRCNN-style heads.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class ResidualCoder:
    """Anchor-residual box coder (`box_coder_utils.py:5-78`)."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if self.encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        """boxes/anchors: (..., 7 + C) → (..., code_size) targets."""
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(boxes[..., :7], 7, axis=-1)
        dxa = jnp.clip(dxa, 1e-5)
        dya = jnp.clip(dya, 1e-5)
        dza = jnp.clip(dza, 1e-5)
        dxg = jnp.clip(dxg, 1e-5)
        dyg = jnp.clip(dyg, 1e-5)
        dzg = jnp.clip(dzg, 1e-5)

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        # extras (e.g. nuscenes vx/vy) up to code_size — NOT boxes' width:
        # gt may carry more dims than the coder regresses (lyft gt has a
        # separate velocity array the reference never encodes)
        n_extra = self.code_size - (8 if self.encode_angle_by_sincos else 7)
        cts = [boxes[..., 7 + i:8 + i] - anchors[..., 7 + i:8 + i]
               for i in range(n_extra)]
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], axis=-1)

    def decode(self, encodings, anchors):
        """(..., code_size) encodings + anchors → (..., 7 + C) boxes."""
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        if not self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, rt = jnp.split(
                encodings[..., :7], 7, axis=-1)
            cts = encodings[..., 7:]
        else:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.split(
                encodings[..., :8], 8, axis=-1)
            cts = encodings[..., 8:]

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        extra = [cts[..., i:i + 1] + anchors[..., 7 + i:8 + i]
                 for i in range(cts.shape[-1])]
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg, *extra], axis=-1)


class PointResidualCoder:
    """Point-anchored coder (`box_coder_utils.py:147-200`), used by point heads."""

    def __init__(self, code_size=8, use_mean_size=True, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = jnp.asarray(kwargs['mean_size'], jnp.float32)

    def encode(self, gt_boxes, points, gt_classes=None):
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(gt_boxes[..., :7], 7, axis=-1)
        dxg = jnp.clip(dxg, 1e-5)
        dyg = jnp.clip(dyg, 1e-5)
        dzg = jnp.clip(dzg, 1e-5)
        xa, ya, za = jnp.split(points[..., :3], 3, axis=-1)
        if self.use_mean_size:
            pt_mean = self.mean_size[gt_classes - 1]
            dxa, dya, dza = jnp.split(pt_mean, 3, axis=-1)
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        return jnp.concatenate(
            [xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg)], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.split(
            box_encodings[..., :8], 8, axis=-1)
        xa, ya, za = jnp.split(points[..., :3], 3, axis=-1)
        if self.use_mean_size:
            pt_mean = self.mean_size[pred_classes - 1]
            dxa, dya, dza = jnp.split(pt_mean, 3, axis=-1)
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


class PreviousResidualDecoder:
    """Legacy decoder (`box_coder_utils.py:80-109`): encodings ordered
    [x, y, z, w, l, h, r] (w/l swapped vs ResidualCoder), rg = rt + ra."""

    def __init__(self, code_size=7, **kwargs):
        self.code_size = code_size

    @staticmethod
    def decode(box_encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, -1)
        xt, yt, zt, wt, lt, ht, rt = jnp.split(box_encodings[..., :7], 7, -1)
        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        out = [xt * diagonal + xa, yt * diagonal + ya, zt * dza + za,
               jnp.exp(lt) * dxa, jnp.exp(wt) * dya, jnp.exp(ht) * dza,
               rt + ra]
        return jnp.concatenate(out, axis=-1)


class PreviousResidualRoIDecoder:
    """Legacy RoI decoder (`box_coder_utils.py:112-142`): like
    PreviousResidualDecoder but rg = ra − rt."""

    def __init__(self, code_size=7, **kwargs):
        self.code_size = code_size

    @staticmethod
    def decode(box_encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, -1)
        xt, yt, zt, wt, lt, ht, rt = jnp.split(box_encodings[..., :7], 7, -1)
        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        out = [xt * diagonal + xa, yt * diagonal + ya, zt * dza + za,
               jnp.exp(lt) * dxa, jnp.exp(wt) * dya, jnp.exp(ht) * dza,
               ra - rt]
        return jnp.concatenate(out, axis=-1)


def build_box_coder(name: str, **kwargs):
    coders = {
        'ResidualCoder': ResidualCoder,
        'PreviousResidualDecoder': PreviousResidualDecoder,
        'PreviousResidualRoIDecoder': PreviousResidualRoIDecoder,
        'PointResidualCoder': PointResidualCoder,
    }
    return coders[name](**kwargs)
