"""CaDDN: ImageVFE (DDN + frustum->voxel), depth loss, full model train+eval.

Parity targets: pcdet/models/detectors/caddn.py, backbones_3d/vfe/image_vfe.py
+ image_vfe_modules/, utils/transform_utils.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


# ------------------------------------------------------------ unit level ---

def test_bin_depths_modes():
    from crb_active_3ddet_tpu.models.backbones_3d.image_vfe import bin_depths
    d = jnp.asarray([[2.0, 10.0, 46.8, 100.0, jnp.nan]])
    for mode in ('UD', 'LID', 'SID'):
        idx = bin_depths(d, mode, 2.0, 46.8, 80)
        assert idx.shape == d.shape
        tgt = bin_depths(d, mode, 2.0, 46.8, 80, target=True)
        assert tgt.dtype == jnp.int32
        # depth_min maps to bin ~0; out-of-range/nan maps to num_bins
        assert int(tgt[0, 0]) == 0
        assert int(tgt[0, 3]) == 80 and int(tgt[0, 4]) == 80

    # LID formula inverse check: bin edges at depth_min give index -0.5+0.5=0
    lid = bin_depths(jnp.asarray([[2.0]]), 'LID', 2.0, 46.8, 80)
    assert abs(float(lid[0, 0])) < 1e-4


def test_grid_sample_3d_matches_manual():
    from crb_active_3ddet_tpu.ops.grid_sample import grid_sample_3d
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(4, 5, 6, 3).astype(np.float32))
    # exact center of voxel (1,2,3): normalized via align_corners=False
    d, h, w = 4, 5, 6
    g = np.asarray([[(2 * (3 + 0.5) / w - 1), (2 * (2 + 0.5) / h - 1),
                     (2 * (1 + 0.5) / d - 1)]], np.float32)
    out = grid_sample_3d(vol, jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(vol[1, 2, 3]),
                               rtol=1e-5)
    # out-of-bounds → zeros
    out2 = grid_sample_3d(vol, jnp.asarray([[-2.0, -2.0, -2.0]]))
    np.testing.assert_allclose(np.asarray(out2[0]), 0.0)


def test_fg_mask_and_focal():
    from crb_active_3ddet_tpu.models.backbones_3d.image_vfe import (
        compute_fg_mask, softmax_focal_loss)
    boxes = jnp.asarray([[[4.0, 4.0, 12.0, 8.0], [0, 0, 0, 0]]])
    mask = compute_fg_mask(boxes, (1, 8, 16), downsample_factor=4)
    assert mask.shape == (1, 8, 16)
    assert bool(mask[0, 1, 1]) and bool(mask[0, 1, 2])
    assert not bool(mask[0, 4, 1])

    logits = jnp.zeros((1, 2, 2, 5))
    target = jnp.zeros((1, 2, 2), jnp.int32)
    fl = softmax_focal_loss(logits, target, 0.25, 2.0)
    expect = -0.25 * (1 - 0.2) ** 2 * np.log(0.2)
    np.testing.assert_allclose(np.asarray(fl), expect, rtol=1e-5)


def test_frustum_grid_projection():
    """A voxel center projected by hand must land on the same normalized
    (u, v, depth-bin) triple the grid generator emits."""
    from crb_active_3ddet_tpu.models.backbones_3d.image_vfe import (
        make_frustum_grid)
    # KITTI-style axis permutation: x_cam=-y, y_cam=-z, z_cam=x
    l2c = jnp.asarray([[[0, -1, 0, 0], [0, 0, -1, 0],
                        [1, 0, 0, 0], [0, 0, 0, 1.0]]])
    f, cu, cv = 100.0, 32.0, 16.0
    c2i = jnp.asarray([[[f, 0, cu, 0], [0, f, cv, 0], [0, 0, 1, 0.0]]])
    grid = make_frustum_grid(
        grid_size=(4, 4, 4), pc_range=(0, -2, -2, 8, 2, 2),
        disc_cfg={'mode': 'UD', 'depth_min': 0.0, 'depth_max': 8.0,
                  'num_bins': 8},
        lidar_to_cam=l2c, cam_to_img=c2i,
        image_shape=jnp.asarray([[32, 64]]))
    assert grid.shape == (1, 4, 4, 4, 3)
    # voxel (x_idx=1, y_idx=2, z_idx=2): lidar center (3.0, 0.5, 0.5)
    # → cam (-0.5, -0.5, 3.0): u = (f*(-0.5) + cu*3)/3, depth = 3 → bin 3
    g = np.asarray(grid[0, 1, 2, 2])
    u = (f * -0.5 + cu * 3.0) / 3.0
    v = (f * -0.5 + cv * 3.0) / 3.0
    np.testing.assert_allclose(g[0], 2 * u / 63 - 1, atol=1e-5)
    np.testing.assert_allclose(g[1], 2 * v / 31 - 1, atol=1e-5)
    np.testing.assert_allclose(g[2], 2 * 3.0 / 7 - 1, atol=1e-5)


# ------------------------------------------------------- model level -------

@pytest.mark.slow
def test_caddn_train_and_eval():
    from crb_active_3ddet_tpu.config import load_config
    from crb_active_3ddet_tpu.datasets import build_dataloader
    from crb_active_3ddet_tpu.models.detectors import build_detector
    from crb_active_3ddet_tpu.runtime import train as train_rt
    from crb_active_3ddet_tpu.runtime import eval as eval_rt
    from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

    cfg = load_config(REPO / 'tools/cfgs/synthetic_models/caddn_synth.yaml')
    train_set, train_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True,
        workers=0)
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                           dataset=train_set)
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=4)
    state = train_rt.init_train_state(model, optimizer, train_set,
                                      batch_size=2)
    step = train_rt.make_train_step(model, optimizer, train_set)
    rng = jax.random.PRNGKey(0)
    batch = train_rt.host_to_device_batch(next(iter(train_loader))[1]
                                          if isinstance(
        next(iter(train_loader)), tuple) else next(iter(train_loader)))
    state, metrics = step(state, batch, rng)
    loss = float(metrics['loss'])
    assert np.isfinite(loss) and loss > 0
    assert float(metrics['ddn_loss']) > 0    # depth loss is in the total

    # eval decode
    test_set, test_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=False,
        workers=0)
    eval_step = eval_rt.make_eval_step(model, test_set,
                                       cfg.MODEL.POST_PROCESSING,
                                       num_class=len(cfg.CLASS_NAMES))
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    hb = train_rt.host_to_device_batch(next(iter(test_loader))[1]
                                       if isinstance(
        next(iter(test_loader)), tuple) else next(iter(test_loader)))
    preds, rec = eval_step(variables, hb)
    assert preds['pred_boxes'].shape[-1] == 7
    assert np.isfinite(np.asarray(preds['pred_scores'])).all()


@pytest.mark.slow
@pytest.mark.xslow
def test_caddn_depth_bin_accuracy():
    """Camera-path quality gate (VERDICT r4 #7): after a short train run the
    DDN's depth-bin argmax must materially beat chance on the depth maps.

    Chance = ~1/21 (20 LID bins + out-of-range) ≈ 5%; an untrained DDN
    measures near that, and a DDN whose frustum/loss plumbing is silently
    wrong cannot learn the depth→bin mapping at all.  Threshold calibrated
    round 5 (see STATUS.md): trained accuracy on the training scenes'
    valid (in-range) pixels passes 0.35 comfortably at 48 steps."""
    from crb_active_3ddet_tpu.config import load_config
    from crb_active_3ddet_tpu.datasets import build_dataloader
    from crb_active_3ddet_tpu.models.detectors import build_detector
    from crb_active_3ddet_tpu.models.backbones_3d.image_vfe import bin_depths
    from crb_active_3ddet_tpu.runtime import train as train_rt
    from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

    cfg = load_config(REPO / 'tools/cfgs/synthetic_models/caddn_synth.yaml')
    train_set, train_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True,
        workers=0)
    model = build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                           dataset=train_set)
    n_steps = 48
    optimizer, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=n_steps)
    state = train_rt.init_train_state(model, optimizer, train_set,
                                      batch_size=2)
    step = train_rt.make_train_step(model, optimizer, train_set)
    rng = jax.random.PRNGKey(0)
    it = iter(train_loader)
    for _ in range(n_steps):
        try:
            b = next(it)
        except StopIteration:
            it = iter(train_loader)
            b = next(it)
        rng, sub = jax.random.split(rng)
        state, _m = step(state, train_rt.host_to_device_batch(b), sub)

    disc = cfg.MODEL.VFE.FFN.DISCRETIZE
    num_bins = int(disc['num_bins'])
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    @jax.jit
    def depth_preds(variables, batch):
        out = model.apply(variables, batch, training=False)
        return out['depth_logits']

    correct = valid = 0
    for b in train_loader:
        batch = train_rt.host_to_device_batch(b)
        logits = np.asarray(depth_preds(variables, batch))
        target = np.asarray(bin_depths(
            jnp.asarray(batch['depth_maps']), mode=disc['mode'],
            depth_min=float(disc['depth_min']),
            depth_max=float(disc['depth_max']),
            num_bins=num_bins, target=True))
        pred = logits.argmax(-1)
        ok = target < num_bins          # in-range pixels only
        correct += int((pred[ok] == target[ok]).sum())
        valid += int(ok.sum())
    acc = correct / max(valid, 1)
    assert acc > 0.35, \
        f'DDN depth-bin accuracy {acc:.3f} on {valid} px — camera path ' \
        'is not learning depth (chance ~0.05)'
