"""Golden tests for the torch-checkpoint importer (VERDICT r3 missing #2).

torch (cpu) is available in the test image, so these tests fabricate REAL
torch ``.pth`` archives / run REAL torch reference ops and verify:
  1. the numpy-only zip reader reproduces ``torch.save`` outputs exactly,
  2. each layout transform matches torch's functional op numerically,
  3. a fabricated OpenPCDet SECOND state dict imports end-to-end with every
     target leaf updated.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from crb_active_3ddet_tpu.utils import torch_ckpt as tc  # noqa: E402


# ---------------------------------------------------------------------------
# 1. zip reader golden parity
# ---------------------------------------------------------------------------

def test_zip_reader_golden(tmp_path):
    rng = np.random.RandomState(0)
    sd = {
        'a.weight': torch.tensor(rng.randn(4, 3, 3, 3).astype(np.float32)),
        'a.bias': torch.tensor(rng.randn(4).astype(np.float32)),
        'b.long': torch.tensor(rng.randint(-5, 5, (7,)).astype(np.int64)),
        'b.half': torch.tensor(rng.randn(5).astype(np.float16)),
        'b.bool': torch.tensor(np.asarray([True, False, True])),
        'b.scalar': torch.tensor(3.25),
        # non-contiguous view → exercises stride handling
        'c.t': torch.tensor(rng.randn(6, 4).astype(np.float32)).t(),
        'c.bf16': torch.tensor(rng.randn(9).astype(np.float32)).bfloat16(),
    }
    ckpt = {'model_state': sd, 'epoch': 17, 'version': 'pcdet+0.5'}
    path = tmp_path / 'golden.pth'
    torch.save(ckpt, str(path))

    loaded = tc.load_torch_file(str(path))
    assert loaded['epoch'] == 17
    assert loaded['version'] == 'pcdet+0.5'
    got = loaded['model_state']
    for key, ten in sd.items():
        want = ten.float().numpy() if ten.dtype == torch.bfloat16 \
            else ten.numpy()
        np.testing.assert_array_equal(got[key], want, err_msg=key)
        assert got[key].shape == tuple(ten.shape)


# ---------------------------------------------------------------------------
# 2. layout transforms vs torch functional ops
# ---------------------------------------------------------------------------

def test_conv2d_transform_matches_torch():
    import jax.numpy as jnp
    import jax
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)          # NHWC
    w = rng.randn(5, 3, 3, 3).astype(np.float32)          # torch (O,I,kh,kw)

    ref = torch.nn.functional.conv2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w),
        padding=1).numpy().transpose(0, 2, 3, 1)

    got = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(tc._t_conv2d(w)),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_convtranspose2d_transform_matches_torch():
    """DeBlock case: kernel == stride (the only shape the BEV backbone
    uses), flax ConvTranspose with SAME padding."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(2)
    for k in (1, 2):
        x = rng.randn(2, 6, 6, 4).astype(np.float32)
        w = rng.randn(4, 5, k, k).astype(np.float32)      # torch (I,O,kh,kw)
        ref = torch.nn.functional.conv_transpose2d(
            torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w),
            stride=k).numpy().transpose(0, 2, 3, 1)

        mod = nn.ConvTranspose(5, (k, k), strides=(k, k), use_bias=False)
        var = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        var = {'params': {'kernel': jnp.asarray(tc._t_convtranspose2d(w))}}
        got = mod.apply(var, jnp.asarray(x))
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4,
                                   err_msg=f'k={k}')


def test_linearish_transform_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(7, 6).astype(np.float32)
    w2 = rng.randn(9, 6).astype(np.float32)               # Linear (O,I)
    ref = torch.nn.functional.linear(torch.tensor(x),
                                     torch.tensor(w2)).numpy()
    np.testing.assert_allclose(x @ tc._t_linearish(w2), ref, atol=1e-4)
    # Conv1d (O,I,1) and 1x1 Conv2d (O,I,1,1) reduce to the same kernel
    np.testing.assert_array_equal(tc._t_linearish(w2[:, :, None]),
                                  tc._t_linearish(w2))
    np.testing.assert_array_equal(tc._t_linearish(w2[:, :, None, None]),
                                  tc._t_linearish(w2))


@pytest.mark.slow
def test_spconv_transform_matches_torch_dense_conv3d():
    """Disk layout (kz,ky,kx,in,out) → our (27,in,out): sparse subm conv on
    a dense-equivalent grid must equal torch F.conv3d."""
    import jax
    import jax.numpy as jnp
    from crb_active_3ddet_tpu.ops.sparse import rulebook as rb
    from crb_active_3ddet_tpu.ops.sparse.sparse_ops import subm_conv3d_gather

    rng = np.random.RandomState(4)
    nz, ny, nx = 6, 7, 8
    v, c_in, c_out = 48, 3, 5
    cells = rng.choice(nz * ny * nx, size=v, replace=False)
    coords = np.stack([cells // (ny * nx), (cells % (ny * nx)) // nx,
                       cells % nx], axis=-1).astype(np.int32)
    valid = np.ones(v, bool)
    feats = rng.randn(v, c_in).astype(np.float32)
    w_disk = rng.randn(3, 3, 3, c_in, c_out).astype(np.float32)

    # torch dense reference: weight (out, in, kz, ky, kx)
    dense = np.zeros((nz, ny, nx, c_in), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    ref = torch.nn.functional.conv3d(
        torch.tensor(dense.transpose(3, 0, 1, 2)[None]),
        torch.tensor(w_disk.transpose(4, 3, 0, 1, 2)),
        padding=1).numpy()[0].transpose(1, 2, 3, 0)

    kern = jnp.asarray(tc._t_spconv(w_disk, c_in, c_out))
    rbk = rb.subm_rulebook_halved(jnp.asarray(coords), jnp.asarray(valid),
                                  grid=(nz, ny, nx))
    out = np.asarray(subm_conv3d_gather(jnp.asarray(feats), rbk, kern,
                                        jnp.asarray(valid)))
    np.testing.assert_allclose(
        out, ref[coords[:, 0], coords[:, 1], coords[:, 2]], atol=1e-3)

    # spconv-2.x native layout (c_out, kz, ky, kx, c_in) orients identically
    w_native = w_disk.transpose(4, 0, 1, 2, 3)
    np.testing.assert_array_equal(tc._t_spconv(w_native, c_in, c_out),
                                  tc._t_spconv(w_disk, c_in, c_out))


# ---------------------------------------------------------------------------
# 3. end-to-end SECOND import from a fabricated OpenPCDet checkpoint
# ---------------------------------------------------------------------------

def _fabricate_second_state_dict(params, stats, rng):
    """Inverse-map our tiny-SECOND tree into reference-named torch tensors."""
    sd = {}

    def t(x):
        # small magnitudes: N(0,1) weights through 12 stacked convs explode
        # the exp() box decoding into inf — this tests mapping, not training
        return torch.tensor((rng.randn(*x) * 0.05).astype(np.float32))

    # backbone_3d
    for i, sub in enumerate(tc._VOXEL8X_ORDER):
        layer = params['backbone_3d'][f'SparseConvLayer_{i}']
        k, ci, co = layer['kernel'].shape
        kz = 3 if k == 27 else k
        shape = (3, 3, 3, ci, co) if k == 27 else (k, 1, 1, ci, co)
        sd[f'backbone_3d.{sub}.0.weight'] = t(shape)
        sd[f'backbone_3d.{sub}.1.weight'] = t((co,))
        sd[f'backbone_3d.{sub}.1.bias'] = t((co,))
        sd[f'backbone_3d.{sub}.1.running_mean'] = t((co,))
        sd[f'backbone_3d.{sub}.1.running_var'] = torch.tensor(
            np.abs(rng.randn(co)).astype(np.float32) + 0.5)

    # backbone_2d: ZeroPad(0) Conv(1) BN(2) ReLU(3) then [Conv BN ReLU]*
    for b, blk in enumerate(sorted(k for k in params['backbone_2d']
                                   if k.startswith('_ConvBlock'))):
        node = params['backbone_2d'][blk]
        convs = sorted(k for k in node if k.startswith('Conv_'))
        idx = 1
        for j, cname in enumerate(convs):
            kh, kw, ci, co = node[cname]['kernel'].shape
            sd[f'backbone_2d.blocks.{b}.{idx}.weight'] = t((co, ci, kh, kw))
            sd[f'backbone_2d.blocks.{b}.{idx + 1}.weight'] = t((co,))
            sd[f'backbone_2d.blocks.{b}.{idx + 1}.bias'] = t((co,))
            sd[f'backbone_2d.blocks.{b}.{idx + 1}.running_mean'] = t((co,))
            sd[f'backbone_2d.blocks.{b}.{idx + 1}.running_var'] = \
                torch.tensor(np.abs(rng.randn(co)).astype(np.float32) + 0.5)
            idx += 3
    for b, blk in enumerate(sorted(k for k in params['backbone_2d']
                                   if k.startswith('_DeBlock'))):
        node = params['backbone_2d'][blk]
        kh, kw, ci, co = node['ConvTranspose_0']['kernel'].shape
        sd[f'backbone_2d.deblocks.{b}.0.weight'] = t((ci, co, kh, kw))
        sd[f'backbone_2d.deblocks.{b}.1.weight'] = t((co,))
        sd[f'backbone_2d.deblocks.{b}.1.bias'] = t((co,))
        sd[f'backbone_2d.deblocks.{b}.1.running_mean'] = t((co,))
        sd[f'backbone_2d.deblocks.{b}.1.running_var'] = torch.tensor(
            np.abs(rng.randn(co)).astype(np.float32) + 0.5)

    # dense head
    for name in ('conv_cls', 'conv_box', 'conv_dir_cls'):
        kh, kw, ci, co = params['dense_head'][name]['kernel'].shape
        sd[f'dense_head.{name}.weight'] = t((co, ci, kh, kw))
        sd[f'dense_head.{name}.bias'] = t((co,))
    return sd


@pytest.mark.slow
def test_second_end_to_end_import(tmp_path):
    import jax
    from __graft_entry__ import _tiny_second_setup
    from crb_active_3ddet_tpu.config import CfgNode
    from crb_active_3ddet_tpu.models.detectors import build_detector
    from crb_active_3ddet_tpu.runtime import train as train_rt
    from crb_active_3ddet_tpu.runtime.optimization import build_optimizer

    train_set, train_loader, model_cfg = _tiny_second_setup(batch_size=2)
    model = build_detector(model_cfg, num_class=1, dataset=train_set)
    optim_cfg = CfgNode({'OPTIMIZER': 'adam', 'LR': 1e-3,
                         'WEIGHT_DECAY': 0.01, 'GRAD_NORM_CLIP': 10})
    optimizer, _ = build_optimizer(optim_cfg, total_steps=1)
    state = train_rt.init_train_state(model, optimizer, train_set,
                                      batch_size=2)
    params = jax.tree.map(np.asarray, state.params)
    stats = jax.tree.map(np.asarray, state.batch_stats)

    rng = np.random.RandomState(7)
    sd = _fabricate_second_state_dict(params, stats, rng)
    path = tmp_path / 'second_fab.pth'
    torch.save({'model_state': sd, 'epoch': 80, 'version': 'pcdet+0.5'},
               str(path))

    new_p, new_s, report, meta = tc.import_openpcdet_checkpoint(
        str(path), params, stats)
    assert meta['epoch'] == 80
    assert not report['mismatched'], report['mismatched']
    assert not report['unmatched_target'], report['unmatched_target']

    # every leaf actually changed (fabricated values ≠ init values)
    def count_changed(old, new):
        olds = tc._flatten(old)
        news = tc._flatten(new)
        return sum(not np.allclose(olds[k], news[k]) for k in olds)
    assert count_changed(params, new_p) == len(tc._flatten(params))

    # the imported model runs forward
    batch = train_rt.host_to_device_batch(next(iter(train_loader)))
    variables = {'params': new_p, 'batch_stats': new_s}
    voxel_cfg = train_set.voxel_cfg
    grid = tuple(int(g) for g in train_set.grid_size)
    pcr = tuple(float(x) for x in train_set.point_cloud_range)
    vs = tuple(float(v) for v in train_set.voxel_size)
    dev_batch = train_rt.prepare_device_batch(batch, voxel_cfg, grid, pcr, vs)
    out = model.apply(variables, dev_batch, training=False)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


# ---------------------------------------------------------------------------
# 4. PointPillar / CenterPoint family imports (VERDICT r4 #6)
# ---------------------------------------------------------------------------

def _rand_bn(rng, co):
    return {
        'weight': torch.tensor(rng.randn(co).astype(np.float32) * 0.05),
        'bias': torch.tensor(rng.randn(co).astype(np.float32) * 0.05),
        'running_mean': torch.tensor(
            rng.randn(co).astype(np.float32) * 0.05),
        'running_var': torch.tensor(
            np.abs(rng.randn(co)).astype(np.float32) + 0.5),
    }


def _fab_backbone2d_and_head(params, sd, rng):
    def t(x):
        return torch.tensor((rng.randn(*x) * 0.05).astype(np.float32))

    for b, blk in enumerate(sorted(k for k in params['backbone_2d']
                                   if k.startswith('_ConvBlock'))):
        node = params['backbone_2d'][blk]
        idx = 1
        for cname in sorted(k for k in node if k.startswith('Conv_')):
            kh, kw, ci, co = node[cname]['kernel'].shape
            sd[f'backbone_2d.blocks.{b}.{idx}.weight'] = t((co, ci, kh, kw))
            for bk, bv in _rand_bn(rng, co).items():
                sd[f'backbone_2d.blocks.{b}.{idx + 1}.{bk}'] = bv
            idx += 3
    for b, blk in enumerate(sorted(k for k in params['backbone_2d']
                                   if k.startswith('_DeBlock'))):
        node = params['backbone_2d'][blk]
        kh, kw, ci, co = node['ConvTranspose_0']['kernel'].shape
        sd[f'backbone_2d.deblocks.{b}.0.weight'] = t((ci, co, kh, kw))
        for bk, bv in _rand_bn(rng, co).items():
            sd[f'backbone_2d.deblocks.{b}.1.{bk}'] = bv
    if 'dense_head' in params:
        for name in ('conv_cls', 'conv_box', 'conv_dir_cls'):
            if name not in params['dense_head']:
                continue
            kh, kw, ci, co = params['dense_head'][name]['kernel'].shape
            sd[f'dense_head.{name}.weight'] = t((co, ci, kh, kw))
            sd[f'dense_head.{name}.bias'] = t((co,))


@pytest.mark.slow
def test_pointpillar_end_to_end_import(tmp_path):
    """PillarVFE PFN + BEV backbone + anchor head import (reference
    name-generic loader, detector3d_template.py:455-536)."""
    import jax
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from test_pointpillar_model import MODEL_CFG as PP_CFG, make_batch, \
        FakeDataset
    from crb_active_3ddet_tpu.models.detectors import build_detector

    model = build_detector(PP_CFG, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, training=True)
    params = jax.tree.map(np.asarray, variables['params'])
    stats = jax.tree.map(np.asarray, variables['batch_stats'])

    rng = np.random.RandomState(11)
    sd = {}
    # PFN layers
    for i, pl in enumerate(sorted(k for k in params['vfe']
                                  if k.startswith('PFNLayer'))):
        ci, co = params['vfe'][pl]['Dense_0']['kernel'].shape
        sd[f'vfe.pfn_layers.{i}.linear.weight'] = torch.tensor(
            (rng.randn(co, ci) * 0.05).astype(np.float32))
        for bk, bv in _rand_bn(rng, co).items():
            sd[f'vfe.pfn_layers.{i}.norm.{bk}'] = bv
    _fab_backbone2d_and_head(params, sd, rng)
    path = tmp_path / 'pp_fab.pth'
    torch.save({'model_state': sd, 'epoch': 80}, str(path))

    new_p, new_s, report, meta = tc.import_openpcdet_checkpoint(
        str(path), params, stats)
    assert not report['mismatched'], report['mismatched']
    assert not report['unmatched_target'], report['unmatched_target']

    out, _ = model.apply({'params': new_p, 'batch_stats': new_s}, batch,
                         training=False, mutable=[])
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


def test_fold_bn_into_conv2d_matches_torch():
    """The CenterHead branch fold (conv(bias=False)+BN → biased conv) is
    inference-exact vs torch eval-mode Sequential."""
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    ci, co = 6, 5
    x = rng.randn(2, 9, 9, ci).astype(np.float32)
    w = rng.randn(co, ci, 3, 3).astype(np.float32)
    bn = _rand_bn(rng, co)

    conv = torch.nn.Conv2d(ci, co, 3, padding=1, bias=False)
    conv.weight.data = torch.tensor(w)
    norm = torch.nn.BatchNorm2d(co, eps=1e-3)
    norm.weight.data = bn['weight']
    norm.bias.data = bn['bias']
    norm.running_mean.data = bn['running_mean']
    norm.running_var.data = bn['running_var']
    norm.eval()
    ref = norm(conv(torch.tensor(x.transpose(0, 3, 1, 2))))
    ref = ref.detach().numpy().transpose(0, 2, 3, 1)

    w_f, b_f = tc._fold_bn_into_conv2d(
        w, {k: v.numpy() for k, v in bn.items()})
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w_f), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b_f
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


@pytest.mark.slow
def test_centerpoint_end_to_end_import(tmp_path):
    """CenterHead import: shared conv + BN direct, branch conv+BN folded,
    final convs direct (reference center_head.py:73-88 naming)."""
    import copy
    import jax
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from test_pointpillar_model import MODEL_CFG as PP_CFG, make_batch, \
        FakeDataset
    from crb_active_3ddet_tpu.config import CfgNode
    from crb_active_3ddet_tpu.models.detectors import build_detector

    cfg = copy.deepcopy(PP_CFG)
    cfg['NAME'] = 'CenterPoint'
    cfg['DENSE_HEAD'] = CfgNode({
        'NAME': 'CenterHead', 'CLASS_AGNOSTIC': False,
        'CLASS_NAMES_EACH_HEAD': [['Car']],
        'SHARED_CONV_CHANNEL': 16, 'USE_BIAS_BEFORE_NORM': True,
        'NUM_HM_CONV': 2,
        'SEPARATE_HEAD_CFG': {
            'HEAD_ORDER': ['center', 'center_z', 'dim', 'rot'],
            'HEAD_DICT': {'center': {'out_channels': 2, 'num_conv': 2},
                          'center_z': {'out_channels': 1, 'num_conv': 2},
                          'dim': {'out_channels': 3, 'num_conv': 2},
                          'rot': {'out_channels': 2, 'num_conv': 2}}},
        'TARGET_ASSIGNER_CONFIG': {
            'FEATURE_MAP_STRIDE': 2, 'NUM_MAX_OBJS': 64,
            'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'cls_weight': 1.0, 'loc_weight': 2.0,
            'code_weights': [1.0] * 8}},
        'POST_PROCESSING': {'SCORE_THRESH': 0.1, 'POST_CENTER_LIMIT_RANGE':
                            [-80, -80, -10, 80, 80, 10],
                            'MAX_OBJ_PER_SAMPLE': 64},
    })
    cfg['POST_PROCESSING'] = CfgNode({
        'RECALL_THRESH_LIST': [0.3, 0.5, 0.7], 'SCORE_THRESH': 0.1,
        'OUTPUT_RAW_SCORE': False, 'EVAL_METRIC': 'kitti',
        'MAX_OBJ_PER_SAMPLE': 64})

    model = build_detector(cfg, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, training=True)
    params = jax.tree.map(np.asarray, variables['params'])
    stats = jax.tree.map(np.asarray, variables['batch_stats'])

    rng = np.random.RandomState(13)
    sd = {}
    for i, pl in enumerate(sorted(k for k in params['vfe']
                                  if k.startswith('PFNLayer'))):
        ci, co = params['vfe'][pl]['Dense_0']['kernel'].shape
        sd[f'vfe.pfn_layers.{i}.linear.weight'] = torch.tensor(
            (rng.randn(co, ci) * 0.05).astype(np.float32))
        for bk, bv in _rand_bn(rng, co).items():
            sd[f'vfe.pfn_layers.{i}.norm.{bk}'] = bv
    _fab_backbone2d_and_head(params, sd, rng)
    # center head: shared conv + BN, then per-branch nested sequentials
    kh, kw, ci, co = params['dense_head']['Conv_0']['kernel'].shape
    sd['dense_head.shared_conv.0.weight'] = torch.tensor(
        (rng.randn(co, ci, kh, kw) * 0.05).astype(np.float32))
    for bk, bv in _rand_bn(rng, co).items():
        sd[f'dense_head.shared_conv.1.{bk}'] = bv
    for br in tc._CENTER_BRANCHES:
        t = f'dense_head.heads_list.0.{br}'
        kh, kw, ci, co = params['dense_head'][f'{br}_conv']['kernel'].shape
        sd[f'{t}.0.0.weight'] = torch.tensor(
            (rng.randn(co, ci, kh, kw) * 0.05).astype(np.float32))
        for bk, bv in _rand_bn(rng, co).items():
            sd[f'{t}.0.1.{bk}'] = bv
        kh, kw, ci, co = params['dense_head'][f'{br}_out']['kernel'].shape
        sd[f'{t}.1.weight'] = torch.tensor(
            (rng.randn(co, ci, kh, kw) * 0.05).astype(np.float32))
        sd[f'{t}.1.bias'] = torch.tensor(
            (rng.randn(co) * 0.05).astype(np.float32))
    path = tmp_path / 'cp_fab.pth'
    torch.save({'model_state': sd, 'epoch': 36}, str(path))

    new_p, new_s, report, meta = tc.import_openpcdet_checkpoint(
        str(path), params, stats)
    assert not report['mismatched'], report['mismatched']
    # branch convs are FOLDED targets: their BN stats do not exist in our
    # tree, so unmatched_target must be empty all the same
    assert not report['unmatched_target'], report['unmatched_target']

    out, _ = model.apply({'params': new_p, 'batch_stats': new_s}, batch,
                         training=False, mutable=[])
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


# ---------------------------------------------------------------------------
# 5. PartA2 / PointRCNN / VoxelRCNN family imports (VERDICT r4 #6)
# ---------------------------------------------------------------------------

def _t(rng, shape):
    return torch.tensor((rng.randn(*shape) * 0.05).astype(np.float32))


def _fab_fc_stack(sd, rng, prefix, node, fc_name, out_name):
    """Inverse of tc._map_fc_stack: reference make_fc_layers layout
    [Conv1d(bias=False), BN, ReLU]* + optional final biased Conv1d."""
    idx = 0
    i = 0
    while f'{fc_name}_{i}' in node:
        ci, co = node[f'{fc_name}_{i}']['kernel'].shape
        sd[f'{prefix}.{idx}.weight'] = _t(rng, (co, ci))
        for bk, bv in _rand_bn(rng, co).items():
            sd[f'{prefix}.{idx + 1}.{bk}'] = bv
        idx += 3
        i += 1
    if out_name and out_name in node:
        ci, co = node[out_name]['kernel'].shape
        sd[f'{prefix}.{idx}.weight'] = _t(rng, (co, ci))
        sd[f'{prefix}.{idx}.bias'] = _t(rng, (co,))


def _fab_sa(sd, rng, torch_prefix, node):
    """Single-branch fabrication of an SA module: tc._map_sa_module flattens
    Dense/BN counters across branches, so mlps.0 holding every layer maps
    identically (shape-driven, no cross-layer chaining needed)."""
    n = sum(1 for k in node if k.startswith('Dense_'))
    idx = 0
    for i in range(n):
        ci, co = node[f'Dense_{i}']['kernel'].shape
        sd[f'{torch_prefix}.mlps.0.{idx}.weight'] = _t(rng, (co, ci))
        for bk, bv in _rand_bn(rng, co).items():
            sd[f'{torch_prefix}.mlps.0.{idx + 1}.{bk}'] = bv
        idx += 3


def _fab_spconv_layer(sd, rng, torch_prefix, layer_node):
    k, ci, co = layer_node['kernel'].shape
    shape = (3, 3, 3, ci, co) if k == 27 else (k, 1, 1, ci, co)
    sd[f'{torch_prefix}.0.weight'] = _t(rng, shape)
    for bk, bv in _rand_bn(rng, co).items():
        sd[f'{torch_prefix}.1.{bk}'] = bv


@pytest.mark.slow
def test_parta2_end_to_end_import(tmp_path):
    """UNetV2 encoder+decoder, PointIntraPartOffsetHead, PartA2FCHead
    (reference spconv_unet.py:65-131, partA2_head.py:19-51)."""
    import jax
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from test_pvrcnn_model import FakeDataset, make_batch
    from test_parta2_pointrcnn import PARTA2_CFG
    from crb_active_3ddet_tpu.models.detectors import build_detector

    model = build_detector(PARTA2_CFG, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        batch, training=True)
    params = jax.tree.map(np.asarray, variables['params'])
    stats = jax.tree.map(np.asarray, variables['batch_stats'])

    rng = np.random.RandomState(17)
    sd = {}
    b3d = params['backbone_3d']
    # encoder (shared names with VoxelBackBone8x)
    for i, sub in enumerate(tc._VOXEL8X_ORDER):
        if f'SparseConvLayer_{i}' in b3d:
            _fab_spconv_layer(sd, rng, f'backbone_3d.{sub}',
                              b3d[f'SparseConvLayer_{i}'])
    # decoder
    for torch_sub, layer in tc._UNET_DECODER:
        if layer in b3d:
            _fab_spconv_layer(sd, rng, f'backbone_3d.{torch_sub}',
                              b3d[layer])
    for k in range(4):
        blk = b3d.get(f'SparseBasicBlock_{k}')
        if blk is None:
            continue
        t = f'backbone_3d.conv_up_t{4 - k}'
        for j in (1, 2):
            _, ci, co = blk[f'SparseConvLayer_{j - 1}']['kernel'].shape
            sd[f'{t}.conv{j}.weight'] = _t(rng, (3, 3, 3, ci, co))
            for bk, bv in _rand_bn(rng, co).items():
                sd[f'{t}.bn{j}.{bk}'] = bv
    _fab_backbone2d_and_head(params, sd, rng)
    # point head: CLS_FC=[] / PART_FC=[] → single biased final conv each
    ph = params['point_head']
    for stack, dname in (('cls_layers', 'Dense_0'),
                         ('part_reg_layers', 'Dense_1')):
        ci, co = ph[dname]['kernel'].shape
        sd[f'point_head.{stack}.0.weight'] = _t(rng, (co, ci))
        sd[f'point_head.{stack}.0.bias'] = _t(rng, (co,))
    # roi head: conv_part/conv_rpn sparse sequentials + fc towers
    rh = params['roi_head']
    for branch in ('conv_part', 'conv_rpn'):
        idx = 0
        for j in range(8):
            node = rh.get(f'{branch}_{j}')
            if node is None:
                break
            kz, ky, kx, ci, co = node['kernel'].shape
            sd[f'roi_head.{branch}.{idx}.weight'] = _t(rng,
                                                       (kz, ky, kx, ci, co))
            for bk, bv in _rand_bn(rng, co).items():
                sd[f'roi_head.{branch}.{idx + 1}.{bk}'] = bv
            idx += 3
    _fab_fc_stack(sd, rng, 'roi_head.shared_fc_layer', rh, 'shared_fc',
                  None)
    _fab_fc_stack(sd, rng, 'roi_head.cls_layers', rh, 'cls', 'cls_out')
    _fab_fc_stack(sd, rng, 'roi_head.reg_layers', rh, 'reg', 'reg_out')

    path = tmp_path / 'parta2_fab.pth'
    torch.save({'model_state': sd, 'epoch': 80}, str(path))
    new_p, new_s, report, meta = tc.import_openpcdet_checkpoint(
        str(path), params, stats)
    assert not report['mismatched'], report['mismatched']
    assert not report['unmatched_target'], report['unmatched_target']

    out = model.apply({'params': new_p, 'batch_stats': new_s}, batch,
                      training=False)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


@pytest.mark.slow
def test_pointrcnn_end_to_end_import(tmp_path):
    """PointNet2MSG (SA + reversed FP), PointHeadBox, PointRCNNHead
    (reference pointnet2_backbone.py:9-96, pointrcnn_head.py:13-59)."""
    import jax
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from test_pvrcnn_model import FakeDataset, make_batch
    from test_parta2_pointrcnn import POINTRCNN_CFG
    from crb_active_3ddet_tpu.models.detectors import build_detector

    model = build_detector(POINTRCNN_CFG, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        batch, training=True)
    params = jax.tree.map(np.asarray, variables['params'])
    stats = jax.tree.map(np.asarray, variables['batch_stats'])

    rng = np.random.RandomState(19)
    sd = {}
    b3d = params['backbone_3d']
    for k in range(8):
        if f'sa_{k}' not in b3d:
            break
        _fab_sa(sd, rng, f'backbone_3d.SA_modules.{k}', b3d[f'sa_{k}'])
    # FP modules: our Dense_0/1 ↔ the LAST registered FP module (both
    # forwards consume FP modules in reverse)
    n_dense = sum(1 for k in b3d if k.startswith('Dense_'))
    n_fp = 2  # FP_MLPS has 2 entries in the test config, 2 layers each
    per_fp = n_dense // n_fp
    di = 0
    for i in reversed(range(n_fp)):
        idx = 0
        for _ in range(per_fp):
            ci, co = b3d[f'Dense_{di}']['kernel'].shape
            sd[f'backbone_3d.FP_modules.{i}.mlp.{idx}.weight'] = _t(
                rng, (co, ci))
            for bk, bv in _rand_bn(rng, co).items():
                sd[f'backbone_3d.FP_modules.{i}.mlp.{idx + 1}.{bk}'] = bv
            idx += 3
            di += 1
    # point head: cls_layers (CLS_FC=[16] + final) then box_layers
    ph = params['point_head']
    for stack, first, final, bn_i in (('cls_layers', 'Dense_0', 'Dense_1',
                                       'BatchNorm_0'),
                                      ('box_layers', 'Dense_2', 'Dense_3',
                                       'BatchNorm_1')):
        ci, co = ph[first]['kernel'].shape
        sd[f'point_head.{stack}.0.weight'] = _t(rng, (co, ci))
        for bk, bv in _rand_bn(rng, co).items():
            sd[f'point_head.{stack}.1.{bk}'] = bv
        ci, co = ph[final]['kernel'].shape
        sd[f'point_head.{stack}.3.weight'] = _t(rng, (co, ci))
        sd[f'point_head.{stack}.3.bias'] = _t(rng, (co,))
    # roi head
    rh = params['roi_head']
    for torch_name, ours in (('xyz_up_layer', 'xyz_up'),
                             ('merge_down_layer', 'merge_down')):
        idx = 0
        for j in range(8):
            node = rh.get(f'{ours}_{j}')
            if node is None:
                break
            ci, co = node['kernel'].shape
            sd[f'roi_head.{torch_name}.{idx}.weight'] = _t(rng, (co, ci))
            if 'bias' in node:  # USE_BN False → biased conv, no BN
                sd[f'roi_head.{torch_name}.{idx}.bias'] = _t(rng, (co,))
                idx += 2
            else:
                for bk, bv in _rand_bn(rng, co).items():
                    sd[f'roi_head.{torch_name}.{idx + 1}.{bk}'] = bv
                idx += 3
    _fab_sa(sd, rng, 'roi_head.SA_modules.0', rh['sa_0'])
    # group-all SA module (flat names sa1_d{li}/sa1_bn{li})
    idx = 0
    for li in range(8):
        if f'sa1_d{li}' not in rh:
            break
        ci, co = rh[f'sa1_d{li}']['kernel'].shape
        sd[f'roi_head.SA_modules.1.mlps.0.{idx}.weight'] = _t(rng, (co, ci))
        for bk, bv in _rand_bn(rng, co).items():
            sd[f'roi_head.SA_modules.1.mlps.0.{idx + 1}.{bk}'] = bv
        idx += 3
    _fab_fc_stack(sd, rng, 'roi_head.cls_layers', rh, 'cls', 'cls_out')
    _fab_fc_stack(sd, rng, 'roi_head.reg_layers', rh, 'reg', 'reg_out')

    path = tmp_path / 'pointrcnn_fab.pth'
    torch.save({'model_state': sd, 'epoch': 80}, str(path))
    new_p, new_s, report, meta = tc.import_openpcdet_checkpoint(
        str(path), params, stats)
    assert not report['mismatched'], report['mismatched']
    assert not report['unmatched_target'], report['unmatched_target']

    out = model.apply({'params': new_p, 'batch_stats': new_s}, batch,
                      training=False)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


@pytest.mark.slow
def test_voxelrcnn_end_to_end_import(tmp_path):
    """VoxelRCNNHead: roi_grid_pool_layers mlps_in/mlps_pos/mlps_out +
    fc towers + separate pred layers (reference voxelrcnn_head.py:18-79,
    voxel_pool_modules.py:24-48)."""
    import copy
    import jax
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from test_pvrcnn_model import FakeDataset, make_batch, PVRCNN_CFG
    from crb_active_3ddet_tpu.config import CfgNode
    from crb_active_3ddet_tpu.models.detectors import build_detector

    cfg = CfgNode(copy.deepcopy(dict(PVRCNN_CFG)))
    cfg.NAME = 'VoxelRCNN'
    del cfg['PFE']
    del cfg['POINT_HEAD']
    cfg.ROI_HEAD = CfgNode({
        'NAME': 'VoxelRCNNHead', 'CLASS_AGNOSTIC': True,
        'SHARED_FC': [64, 64], 'CLS_FC': [64], 'REG_FC': [64],
        'DP_RATIO': 0.3,
        'ROI_GRID_POOL': {
            'GRID_SIZE': 4, 'FEATURES_SOURCE': ['x_conv3', 'x_conv4'],
            'POOL_LAYERS': {
                'x_conv3': {'MLPS': [[16, 16]], 'QUERY_RANGES': [[2, 2, 2]],
                            'POOL_RADIUS': [0.8], 'NSAMPLE': [8],
                            'POOL_METHOD': 'max_pool'},
                'x_conv4': {'MLPS': [[16, 16]], 'QUERY_RANGES': [[2, 2, 2]],
                            'POOL_RADIUS': [1.6], 'NSAMPLE': [8],
                            'POOL_METHOD': 'max_pool'}}},
        'NMS_CONFIG': dict(PVRCNN_CFG.ROI_HEAD.NMS_CONFIG),
        'TARGET_CONFIG': dict(PVRCNN_CFG.ROI_HEAD.TARGET_CONFIG),
        'LOSS_CONFIG': dict(PVRCNN_CFG.ROI_HEAD.LOSS_CONFIG)})
    model = build_detector(cfg, num_class=1, dataset=FakeDataset())
    batch = make_batch()
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        batch, training=True)
    params = jax.tree.map(np.asarray, variables['params'])
    stats = jax.tree.map(np.asarray, variables['batch_stats'])

    rng = np.random.RandomState(23)
    sd = {}
    b3d = params['backbone_3d']
    for i, sub in enumerate(tc._VOXEL8X_ORDER):
        if f'SparseConvLayer_{i}' in b3d:
            _fab_spconv_layer(sd, rng, f'backbone_3d.{sub}',
                              b3d[f'SparseConvLayer_{i}'])
    _fab_backbone2d_and_head(params, sd, rng)
    rh = params['roi_head']
    pool_names = sorted(k[:-3] for k in rh
                        if k.startswith('pool_') and k.endswith('_in'))
    srcs = []
    for nm in pool_names:
        src = nm[len('pool_'):].rsplit('_', 1)[0]
        if src not in srcs:
            srcs.append(src)
    for li, src in enumerate(srcs):
        for k, nm in enumerate(sorted(n for n in pool_names
                                      if n.startswith(f'pool_{src}_'))):
            for part in ('in', 'pos', 'out'):
                ci, co = rh[f'{nm}_{part}']['kernel'].shape
                t = f'roi_head.roi_grid_pool_layers.{li}.mlps_{part}.{k}'
                sd[f'{t}.0.weight'] = _t(rng, (co, ci))
                for bk, bv in _rand_bn(rng, co).items():
                    sd[f'{t}.1.{bk}'] = bv
    _fab_fc_stack(sd, rng, 'roi_head.shared_fc_layer', rh, 'shared_fc',
                  None)
    _fab_fc_stack(sd, rng, 'roi_head.cls_fc_layers', rh, 'cls_fc', None)
    _fab_fc_stack(sd, rng, 'roi_head.reg_fc_layers', rh, 'reg_fc', None)
    for torch_name, ours in (('cls_pred_layer', 'cls_pred'),
                             ('reg_pred_layer', 'reg_pred')):
        ci, co = rh[ours]['kernel'].shape
        sd[f'roi_head.{torch_name}.weight'] = _t(rng, (co, ci))
        sd[f'roi_head.{torch_name}.bias'] = _t(rng, (co,))

    path = tmp_path / 'voxelrcnn_fab.pth'
    torch.save({'model_state': sd, 'epoch': 80}, str(path))
    new_p, new_s, report, meta = tc.import_openpcdet_checkpoint(
        str(path), params, stats)
    assert not report['mismatched'], report['mismatched']
    assert not report['unmatched_target'], report['unmatched_target']

    out = model.apply({'params': new_p, 'batch_stats': new_s}, batch,
                      training=False)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


def test_spconv_dense_transform_matches_torch_conv3d():
    """PartA2 conv_part/conv_rpn transform: dense lax conv with the mapped
    kernel equals torch F.conv3d for both shipped disk layouts."""
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(29)
    ci, co = 3, 5
    x = rng.randn(2, 4, 4, 4, ci).astype(np.float32)
    w_disk = rng.randn(3, 3, 3, ci, co).astype(np.float32)   # spconv 1.x
    ref = torch.nn.functional.conv3d(
        torch.tensor(x.transpose(0, 4, 1, 2, 3)),
        torch.tensor(w_disk.transpose(4, 3, 0, 1, 2)),
        padding=1).numpy().transpose(0, 2, 3, 4, 1)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(tc._t_spconv_dense(w_disk, ci, co)),
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
    # 2.x native layout (co, k, k, k, ci) orients identically
    w_native = w_disk.transpose(4, 0, 1, 2, 3)
    np.testing.assert_array_equal(tc._t_spconv_dense(w_native, ci, co),
                                  tc._t_spconv_dense(w_disk, ci, co))
