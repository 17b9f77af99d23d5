import numpy as np
import jax
import jax.numpy as jnp

from crb_active_3ddet_tpu.utils import loss_utils


def test_focal_loss_basic():
    logits = jnp.asarray(np.zeros((2, 4, 3), np.float32))
    targets = jnp.zeros((2, 4, 3))
    weights = jnp.ones((2, 4))
    loss = loss_utils.sigmoid_focal_cls_loss(logits, targets, weights)
    # p=0.5, alpha=0.75 (neg), pt=0.5, bce=log(2)
    expected = 0.75 * 0.25 * np.log(2)
    assert np.allclose(loss, expected, atol=1e-5)


def test_focal_loss_confident_correct_small():
    logits = jnp.full((1, 1, 1), 10.0)
    targets = jnp.ones((1, 1, 1))
    weights = jnp.ones((1, 1))
    loss = loss_utils.sigmoid_focal_cls_loss(logits, targets, weights)
    assert float(loss[0, 0, 0]) < 1e-6


def test_smooth_l1_regions():
    beta = 1.0 / 9.0
    small = loss_utils.smooth_l1_loss(jnp.asarray(beta / 2), beta)
    assert abs(float(small) - 0.5 * (beta / 2) ** 2 / beta) < 1e-7
    big = loss_utils.smooth_l1_loss(jnp.asarray(2.0), beta)
    assert abs(float(big) - (2.0 - 0.5 * beta)) < 1e-6


def test_weighted_smooth_l1_code_weights():
    x = jnp.ones((1, 2, 3))
    y = jnp.zeros((1, 2, 3))
    w = jnp.ones((1, 2))
    cw = [1.0, 2.0, 0.0]
    loss = loss_utils.weighted_smooth_l1_loss(x, y, w, code_weights=cw)
    base = 1.0 - 0.5 / 9.0
    assert np.allclose(np.asarray(loss[0, 0]), [base, 2.0 - 0.5 / 9.0, 0.0], atol=1e-6)


def test_nan_targets_zeroed():
    x = jnp.ones((1, 1, 2))
    y = jnp.asarray([[[np.nan, 0.0]]])
    loss = loss_utils.weighted_smooth_l1_loss(x, y, jnp.ones((1, 1)))
    assert float(loss[0, 0, 0]) == 0.0


def test_bce_matches_manual():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(20).astype(np.float32))
    t = jnp.asarray(rng.randint(0, 2, 20).astype(np.float32))
    got = loss_utils.binary_cross_entropy_with_logits(x, t)
    p = jax.nn.sigmoid(x)
    want = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
    assert np.allclose(got, want, atol=1e-4)


def test_corner_loss_zero_for_identical():
    boxes = jnp.asarray([[0, 0, 0, 4, 2, 1.5, 0.3]], dtype=jnp.float32)
    loss = loss_utils.get_corner_loss_lidar(boxes, boxes)
    assert float(loss[0]) < 1e-6


def test_corner_loss_flip_invariant():
    a = jnp.asarray([[0, 0, 0, 4, 2, 1.5, 0.3]], dtype=jnp.float32)
    b = a.at[:, 6].add(jnp.pi)  # flipped heading — corner loss should be ~0
    loss = loss_utils.get_corner_loss_lidar(a, b)
    assert float(loss[0]) < 1e-5


def test_loss_pred_loss_ranking():
    # perfect ranking → below margin clip only
    inp = jnp.asarray([5.0, 1.0])  # predicts sample0 lossier
    tgt = jnp.asarray([3.0, 0.5])  # true: sample0 lossier → correct
    loss = loss_utils.loss_pred_loss(inp, tgt, margin=1.0)
    assert float(loss) == 0.0
    # inverted ranking → penalized
    loss2 = loss_utils.loss_pred_loss(jnp.asarray([1.0, 5.0]), tgt, margin=1.0)
    assert float(loss2) > 1.0
