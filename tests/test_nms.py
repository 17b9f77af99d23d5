"""NMS tests against a tiny numpy greedy-NMS oracle."""

import numpy as np
import jax.numpy as jnp

from crb_active_3ddet_tpu.ops import nms as nms_ops
from crb_active_3ddet_tpu.ops import iou3d


def _numpy_nms_oracle(boxes, scores, thresh):
    """Greedy rotated NMS using the (tested) IoU matrix."""
    order = np.argsort(-scores, kind='stable')
    iou = np.asarray(iou3d.boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= -1e9:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return keep


def _rand_boxes(rng, n):
    return np.concatenate([
        rng.uniform(-10, 10, (n, 2)), np.zeros((n, 1)),
        rng.uniform(1, 4, (n, 3)), rng.uniform(-np.pi, np.pi, (n, 1)),
    ], axis=1).astype(np.float32)


def test_simple_suppression():
    boxes = np.array([
        [0, 0, 0, 2, 2, 2, 0],
        [0.1, 0, 0, 2, 2, 2, 0],   # heavy overlap with 0 → suppressed
        [10, 10, 0, 2, 2, 2, 0],    # disjoint → kept
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, valid, s = nms_ops.rotated_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1, pre_max=3, post_max=3)
    kept = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == [0, 2]


def test_matches_oracle_random():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 64
        boxes = _rand_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        idx, valid, _ = nms_ops.rotated_nms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.2, pre_max=n, post_max=n)
        ours = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
        oracle = sorted(_numpy_nms_oracle(boxes, scores, 0.2))
        assert ours == oracle, f'trial {trial}: {ours} vs {oracle}'


def test_post_max_truncation():
    rng = np.random.RandomState(1)
    boxes = _rand_boxes(rng, 32)
    boxes[:, :2] = rng.uniform(-100, 100, (32, 2))  # all disjoint
    scores = rng.uniform(0, 1, 32).astype(np.float32)
    idx, valid, s = nms_ops.rotated_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1, pre_max=32, post_max=5)
    assert int(np.asarray(valid).sum()) == 5
    # results are score-sorted
    svals = np.asarray(s)[np.asarray(valid)]
    assert np.all(np.diff(svals) <= 1e-6)


def test_padding_rows_ignored():
    boxes = np.zeros((8, 7), np.float32)
    boxes[0] = [0, 0, 0, 2, 2, 2, 0]
    boxes[1] = [20, 0, 0, 2, 2, 2, 0]
    scores = np.full(8, -1e10, np.float32)
    scores[0], scores[1] = 0.5, 0.4
    idx, valid, _ = nms_ops.rotated_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1, pre_max=8, post_max=8)
    assert int(np.asarray(valid).sum()) == 2


def test_score_thresh():
    boxes = _rand_boxes(np.random.RandomState(2), 10)
    boxes[:, :2] += np.arange(10)[:, None] * 50  # disjoint
    scores = np.linspace(0.05, 0.95, 10).astype(np.float32)
    idx, valid, _ = nms_ops.rotated_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1, pre_max=10, post_max=10,
        score_thresh=0.5)
    assert int(np.asarray(valid).sum()) == 5


def test_matrix_nms_matches_greedy():
    """Fixpoint matrix NMS == sequential greedy NMS (same keep set, order,
    scores) across thresholds incl. the train (0.8) and eval (0.01)
    regimes, with and without score_thresh masking."""
    import numpy as np
    import jax.numpy as jnp
    from crb_active_3ddet_tpu.ops import nms as nms_ops
    rng = np.random.RandomState(3)
    n = 300
    # clustered boxes so suppression chains actually form
    centers = rng.uniform(0, 40, (12, 2))
    pick = rng.randint(0, 12, n)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :2] = centers[pick] + rng.normal(0, 1.2, (n, 2))
    boxes[:, 2] = 0.0
    boxes[:, 3:5] = rng.uniform(1.5, 4.5, (n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.rand(n).astype(np.float32)

    for thresh in (0.01, 0.3, 0.7, 0.8):
        for st in (None, 0.2):
            gi, gv, gs = nms_ops.rotated_nms(
                jnp.asarray(boxes), jnp.asarray(scores), thresh,
                pre_max=256, post_max=64, score_thresh=st)
            mi, mv, ms = nms_ops.rotated_nms_matrix(
                jnp.asarray(boxes), jnp.asarray(scores), thresh,
                pre_max=256, post_max=64, score_thresh=st, rounds=64)
            gvn, mvn = np.asarray(gv), np.asarray(mv)
            assert np.array_equal(gvn, mvn), (thresh, st)
            assert np.array_equal(np.asarray(gi)[gvn], np.asarray(mi)[mvn]), \
                (thresh, st)
            np.testing.assert_allclose(np.asarray(gs)[gvn],
                                       np.asarray(ms)[mvn], rtol=1e-6)


def test_matrix_nms_post_exceeds_matrix():
    import numpy as np
    import jax.numpy as jnp
    from crb_active_3ddet_tpu.ops import nms as nms_ops
    boxes = jnp.asarray(np.random.RandomState(0).uniform(
        0, 50, (40, 7)).astype(np.float32))
    scores = jnp.asarray(np.random.RandomState(1).rand(40).astype(np.float32))
    ki, kv, ks = nms_ops.rotated_nms_matrix(
        boxes, scores, 0.5, pre_max=32, post_max=64, matrix_cap=16)
    assert ki.shape == (64,) and kv.shape == (64,)


def test_multi_classes_nms_per_class_and_velocity():
    """Per-class NMS: each class suppressed independently (parity:
    model_nms_utils.multi_classes_nms); 9-dim (velocity) boxes pass through."""
    rng = np.random.RandomState(3)
    n, c = 24, 3
    boxes = _rand_boxes(rng, n)
    velo = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    boxes9 = np.concatenate([boxes, velo], axis=1)
    cls_scores = rng.rand(n, c).astype(np.float32)

    class NmsCfg(dict):
        __getattr__ = dict.__getitem__
    cfg = NmsCfg(NMS_THRESH=0.3, NMS_PRE_MAXSIZE=24, NMS_POST_MAXSIZE=8)

    sc, lb, bx, vd, ix = nms_ops.multi_classes_nms(
        jnp.asarray(cls_scores), jnp.asarray(boxes9), cfg, score_thresh=0.1)
    assert bx.shape == (c, 8, 9)
    for k in range(c):
        keep = _numpy_nms_oracle(boxes, np.where(
            cls_scores[:, k] >= 0.1, cls_scores[:, k], -2e9), 0.3)[:8]
        got = np.asarray(ix[k])[np.asarray(vd[k])]
        assert list(got) == keep, k
        assert (np.asarray(lb[k]) == k + 1).all()
        np.testing.assert_allclose(
            np.asarray(bx[k])[np.asarray(vd[k])], boxes9[keep], rtol=1e-6)


def test_post_processing_multi_class_dispatch():
    """post_processing routes MULTI_CLASSES_NMS configs through per-class
    NMS and keeps full (velocity) box width."""
    from crb_active_3ddet_tpu.models import post_processing as pp

    class Node(dict):
        def __getattr__(self, k):
            return self[k]
    rng = np.random.RandomState(11)
    b, a, c = 2, 32, 4
    boxes = np.stack([_rand_boxes(rng, a) for _ in range(b)])
    velo = rng.uniform(-1, 1, (b, a, 2)).astype(np.float32)
    batch = {
        'batch_size': b,
        'batch_cls_preds': jnp.asarray(rng.randn(b, a, c).astype(np.float32)),
        'batch_box_preds': jnp.asarray(
            np.concatenate([boxes, velo], axis=-1)),
        'cls_preds_normalized': False,
    }
    post_cfg = Node(SCORE_THRESH=0.1, NMS_CONFIG=Node(
        MULTI_CLASSES_NMS=True, NMS_THRESH=0.2,
        NMS_PRE_MAXSIZE=32, NMS_POST_MAXSIZE=8))
    out = pp.post_processing(batch, post_cfg, num_class=c)
    assert out['pred_boxes'].shape == (b, c * 8, 9)
    assert out['pred_labels'].shape == (b, c * 8)
    lbl = np.asarray(out['pred_labels'])
    vd = np.asarray(out['pred_valid'])
    assert set(np.unique(lbl[vd])) <= set(range(1, c + 1))
    # per-class blocks carry that class's label
    lbl_grid = lbl.reshape(b, c, 8)
    for k in range(c):
        blk = lbl_grid[:, k][vd.reshape(b, c, 8)[:, k]]
        assert (blk == k + 1).all()


def test_matrix_cap_exact_when_alive_below_cap():
    """MATRIX_CAP semantics (the perf knob class_agnostic_nms now plumbs):
    when fewer than matrix_cap boxes survive the score threshold — the
    trained-model eval regime — a capped matrix is EXACTLY the unbounded
    greedy NMS, deviation bound per rotated_nms_matrix's docstring."""
    import numpy as np
    import jax.numpy as jnp
    from crb_active_3ddet_tpu.ops import nms as nms_ops
    rng = np.random.RandomState(7)
    n = 600
    centers = rng.uniform(0, 50, (15, 2))
    pick = rng.randint(0, 15, n)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :2] = centers[pick] + rng.normal(0, 1.0, (n, 2))
    boxes[:, 3:5] = rng.uniform(1.5, 4.0, (n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    # trained-model score profile: few confident boxes, a sea of junk
    scores = (rng.rand(n) * 0.08).astype(np.float32)
    hot = rng.choice(n, 60, replace=False)
    scores[hot] = 0.3 + 0.7 * rng.rand(60).astype(np.float32)

    for thresh in (0.01, 0.5):
        gi, gv, gs = nms_ops.rotated_nms(
            jnp.asarray(boxes), jnp.asarray(scores), thresh,
            pre_max=512, post_max=64, score_thresh=0.1)
        mi, mv, ms = nms_ops.rotated_nms_matrix(
            jnp.asarray(boxes), jnp.asarray(scores), thresh,
            pre_max=512, post_max=64, score_thresh=0.1, rounds=64,
            matrix_cap=128)
        gvn, mvn = np.asarray(gv), np.asarray(mv)
        assert np.array_equal(gvn, mvn), thresh
        assert np.array_equal(np.asarray(gi)[gvn], np.asarray(mi)[mvn]), \
            thresh
