import numpy as np
import jax.numpy as jnp

from crb_active_3ddet_tpu.utils.box_coder import ResidualCoder


def _rand_boxes(rng, n):
    return np.concatenate([
        rng.uniform(-10, 10, (n, 3)), rng.uniform(1, 4, (n, 3)),
        rng.uniform(-np.pi, np.pi, (n, 1))], axis=1).astype(np.float32)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    coder = ResidualCoder()
    boxes = jnp.asarray(_rand_boxes(rng, 50))
    anchors = jnp.asarray(_rand_boxes(rng, 50))
    enc = coder.encode(boxes, anchors)
    dec = coder.decode(enc, anchors)
    assert np.allclose(dec, boxes, atol=1e-3)


def test_encode_decode_sincos():
    rng = np.random.RandomState(1)
    coder = ResidualCoder(encode_angle_by_sincos=True)
    boxes = jnp.asarray(_rand_boxes(rng, 20))
    anchors = jnp.asarray(_rand_boxes(rng, 20))
    enc = coder.encode(boxes, anchors)
    assert enc.shape[-1] == 8
    dec = coder.decode(enc, anchors)
    # angle recovered up to wrapping
    assert np.allclose(dec[:, :6], boxes[:, :6], atol=1e-3)
    dr = np.asarray(dec[:, 6] - boxes[:, 6])
    dr = (dr + np.pi) % (2 * np.pi) - np.pi
    assert np.allclose(dr, 0, atol=1e-3)


def test_zero_residual_for_identical():
    coder = ResidualCoder()
    b = jnp.asarray(_rand_boxes(np.random.RandomState(2), 5))
    enc = coder.encode(b, b)
    assert np.allclose(enc, 0, atol=1e-5)


def test_extra_channels_passthrough():
    rng = np.random.RandomState(3)
    coder = ResidualCoder(code_size=9)
    base = _rand_boxes(rng, 8)
    vel = rng.uniform(-2, 2, (8, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([base, vel], axis=1))
    anchors = jnp.asarray(np.concatenate([_rand_boxes(rng, 8), np.zeros((8, 2), np.float32)], axis=1))
    enc = coder.encode(boxes, anchors)
    dec = coder.decode(enc, anchors)
    assert np.allclose(dec, boxes, atol=1e-3)
