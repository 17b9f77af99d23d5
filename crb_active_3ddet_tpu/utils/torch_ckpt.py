"""Torch checkpoint import: read OpenPCDet ``.pth`` zoo checkpoints and
graft them into this framework's Flax param trees — no torch required.

Parity: ``pcdet/models/detectors/detector3d_template.py:455-536``
(``load_params_from_file`` + ``_load_state_dict``) — including the spconv
1.x→2.x weight-layout adaptation (:461-474): zoo checkpoints store sparse
conv kernels as ``(k1, k2, k3, c_in, c_out)``; spconv-2.x native layout is
``(c_out, k1, k2, k3, c_in)``.  Our sparse kernels are ``(K³, c_in, c_out)``
row-major over (kz, ky, kx) — the same tap order ``rulebook._kernel_offsets``
enumerates — so either torch layout maps by a transpose + reshape.

Reader: torch's zip serialization (torch>=1.6 default) is a zipfile holding
``data.pkl`` (a pickle whose persistent IDs reference storages) plus one raw
little-endian buffer per storage under ``data/<key>``.  A restricted
Unpickler reconstructs every tensor as numpy without importing torch.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

_STORAGE_DTYPES = {
    'FloatStorage': np.dtype('<f4'),
    'DoubleStorage': np.dtype('<f8'),
    'HalfStorage': np.dtype('<f2'),
    'LongStorage': np.dtype('<i8'),
    'IntStorage': np.dtype('<i4'),
    'ShortStorage': np.dtype('<i2'),
    'CharStorage': np.dtype('<i1'),
    'ByteStorage': np.dtype('<u1'),
    'BoolStorage': np.dtype('<u1'),   # numpy bool_ is 1 byte too
    'BFloat16Storage': np.dtype('<u2'),  # converted to f32 on rebuild
}


class _StorageType:
    def __init__(self, name):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name)
        self.is_bool = name == 'BoolStorage'
        self.is_bf16 = name == 'BFloat16Storage'


def _bf16_to_f32(u16):
    return (u16.astype(np.uint32) << 16).view(np.float32)


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    arr, stype = storage
    itemsize = arr.dtype.itemsize
    if not size:
        out = arr[storage_offset:storage_offset + 1].reshape(())
    else:
        out = np.lib.stride_tricks.as_strided(
            arr[storage_offset:],
            shape=tuple(size),
            strides=tuple(s * itemsize for s in stride))
    # (ascontiguousarray would promote 0-d scalars to (1,))
    out = np.array(out, copy=True)
    if stype.is_bool:
        out = out.astype(bool)
    elif stype.is_bf16:
        out = _bf16_to_f32(out)
    return out


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _Stub:
    """Absorbs unknown classes (optimizer states, schedulers) so a full
    checkpoint unpickles even when we only care about model_state."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        self.state = state

    def append(self, *a):
        pass

    def extend(self, *a):
        pass


_SAFE_BUILTINS = {
    ('collections', 'OrderedDict'): OrderedDict,
    ('builtins', 'dict'): dict,
    ('builtins', 'list'): list,
    ('builtins', 'tuple'): tuple,
    ('builtins', 'set'): set,
    ('builtins', 'int'): int,
    ('builtins', 'float'): float,
    ('builtins', 'str'): str,
    ('builtins', 'complex'): complex,
    ('builtins', 'bytes'): bytes,
}


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, f, load_storage):
        super().__init__(f, encoding='latin1')
        self._load_storage = load_storage

    def find_class(self, module, name):
        if (module, name) in _SAFE_BUILTINS:
            return _SAFE_BUILTINS[(module, name)]
        if module.startswith('numpy'):
            import numpy
            import numpy.core.multiarray
            if module == 'numpy.core.multiarray' or \
                    module == 'numpy._core.multiarray':
                import numpy.core.multiarray as m
                return getattr(m, name)
            return getattr(numpy, name)
        if module.startswith('torch'):
            if name.endswith('Storage') and name in _STORAGE_DTYPES:
                return _StorageType(name)
            if name == '_rebuild_tensor_v2':
                return _rebuild_tensor_v2
            if name == '_rebuild_parameter':
                return _rebuild_parameter
            if name == 'Size':
                return tuple
            return _Stub
        # anything else (argparse.Namespace in some ckpts, easydict cfgs…)
        return _Stub

    def persistent_load(self, pid):
        # ('storage', StorageType, key, location, numel)
        assert isinstance(pid, tuple) and pid[0] == 'storage', pid
        stype, key, _location, _numel = pid[1], pid[2], pid[3], pid[4]
        if not isinstance(stype, _StorageType):  # e.g. UntypedStorage path
            stype = _StorageType(getattr(stype, 'name', ''))
        if stype.dtype is None:
            # decoding with a default dtype would yield silently-garbage
            # tensors; unknown storages must be a hard error
            raise ValueError(
                f'unsupported torch storage type {stype.name!r}; known: '
                f'{sorted(_STORAGE_DTYPES)}')
        raw = self._load_storage(str(key))
        arr = np.frombuffer(raw, dtype=stype.dtype)
        return (arr, stype)


def load_torch_file(path):
    """Load a torch zip-format ``.pth`` file into plain python/numpy.

    Tensors come back as numpy arrays; unknown objects as stubs.  Falls back
    to ``torch.load`` for the pre-1.6 legacy format when torch is available.
    """
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            pkl_name = next(n for n in names if n.endswith('/data.pkl')
                            or n == 'data.pkl')
            root = pkl_name[:-len('data.pkl')]

            def load_storage(key):
                return zf.read(f'{root}data/{key}')

            with zf.open(pkl_name) as f:
                data = f.read()
            return _TorchUnpickler(io.BytesIO(data), load_storage).load()
    # legacy sequential-pickle format — weights_only=True keeps torch's
    # restricted unpickler engaged; these files come from untrusted zoo
    # downloads, so arbitrary-pickle execution is never acceptable here
    try:
        import torch
    except ImportError as e:
        raise RuntimeError(
            f'{path} is not a torch zip archive and torch is unavailable '
            'for the legacy format') from e
    ckpt = torch.load(path, map_location='cpu', weights_only=True)

    def to_np(x):
        return x.detach().cpu().numpy() if hasattr(x, 'detach') else x
    return _map_nested(ckpt, to_np)


def _map_nested(obj, fn):
    if isinstance(obj, dict):
        return type(obj)((k, _map_nested(v, fn)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(_map_nested(v, fn) for v in obj)
    return fn(obj)


# ---------------------------------------------------------------------------
# name mapping: OpenPCDet state_dict → this framework's Flax trees
# ---------------------------------------------------------------------------

def _t_conv2d(w):
    """torch Conv2d (out, in, kh, kw) → flax (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def _t_linearish(w):
    """torch Linear (out, in) / Conv1d (out, in, 1) / 1×1 Conv2d
    (out, in, 1, 1) → flax Dense kernel (in, out)."""
    w = np.asarray(w)
    w = w.reshape(w.shape[0], w.shape[1])
    return np.transpose(w, (1, 0))


def _t_convtranspose2d(w):
    """torch ConvTranspose2d (in, out, kh, kw) → flax ConvTranspose
    (kh, kw, in, out).

    torch's transposed conv scatters the kernel un-mirrored
    (gradient-of-correlation); flax's ``ConvTranspose`` lowers to
    ``lax.conv_transpose(transpose_kernel=False)`` which *correlates* the
    fractionally-strided input, i.e. mirrors the taps relative to torch —
    so flip the spatial axes (validated numerically in
    tests/test_torch_import.py)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def _t_spconv(w, c_in, c_out):
    """spconv kernel (any shipped layout) → ours (K³, c_in, c_out) with taps
    row-major over (kz, ky, kx) — matching ``rulebook._kernel_offsets``.

    Zoo checkpoints store (k1, k2, k3, c_in, c_out) [spconv 1.x]; some store
    the 2.x native (c_out, k1, k2, k3, c_in).  Disambiguate by the channel
    positions exactly like the reference (detector3d_template.py:461-474).
    """
    w = np.asarray(w)
    assert w.ndim == 5, f'spconv kernels are 5D, got {w.shape}'
    if w.shape[-2] == c_in and w.shape[-1] == c_out:
        pass  # (k1, k2, k3, in, out)
    elif w.shape[0] == c_out and w.shape[-1] == c_in:
        w = np.transpose(w, (1, 2, 3, 4, 0))  # 2.x native → (k,k,k,in,out)
    elif w.shape[-2] == c_out and w.shape[-1] == c_in:
        w = np.transpose(w, (0, 1, 2, 4, 3))  # (k,k,k,out,in)
    else:
        raise ValueError(f'cannot orient spconv kernel {w.shape} '
                         f'for c_in={c_in}, c_out={c_out}')
    k = w.shape[0] * w.shape[1] * w.shape[2]
    return w.reshape(k, c_in, c_out)


def _t_spconv_dense(w, c_in, c_out):
    """spconv kernel (any shipped layout) → dense lax-conv layout
    (k0, k1, k2, c_in, c_out), spatial axes in grid-dim order (the PartA2
    RoI-aware pooled grid is (x, y, z) in both impls — roiaware_pool3d
    cell order matches the reference kernel's grid order).  Same
    orientation detection as ``_t_spconv``; used for the PartA2 head's
    conv_part/conv_rpn which run as DenseMaskedConv3d here."""
    w = np.asarray(w)
    assert w.ndim == 5, f'spconv kernels are 5D, got {w.shape}'
    if w.shape[-2] == c_in and w.shape[-1] == c_out:
        return w
    if w.shape[0] == c_out and w.shape[-1] == c_in:
        return np.transpose(w, (1, 2, 3, 4, 0))
    if w.shape[-2] == c_out and w.shape[-1] == c_in:
        return np.transpose(w, (0, 1, 2, 4, 3))
    raise ValueError(f'cannot orient spconv kernel {w.shape} '
                     f'for c_in={c_in}, c_out={c_out}')


def group_torch_sequential(sd, prefix):
    """Split the keys under a torch ``nn.Sequential`` prefix into ordered
    (convs, bns) lists, immune to ReLU/Dropout index gaps.

    Returns (conv_weights, bn_dicts) where each bn dict has
    weight/bias/running_mean/running_var.  A final conv with a bias is
    returned as a (weight, bias) tuple in ``conv_weights``.
    """
    sub = {}
    for key, val in sd.items():
        if key.startswith(prefix + '.') or prefix == '':
            rest = key[len(prefix) + 1 if prefix else 0:]
            parts = rest.split('.')
            if not parts[0].isdigit():
                continue
            idx = int(parts[0])
            sub.setdefault(idx, {})['.'.join(parts[1:])] = val
    convs, bns = [], []
    for idx in sorted(sub):
        entry = sub[idx]
        if 'running_mean' in entry:
            bns.append(entry)
        elif 'weight' in entry:
            if 'bias' in entry:
                convs.append((entry['weight'], entry['bias']))
            else:
                convs.append(entry['weight'])
    return convs, bns


def _bn_into(out_params, out_stats, flax_prefix, bn_name, bn):
    out_params[flax_prefix + (bn_name, 'scale')] = np.asarray(bn['weight'])
    out_params[flax_prefix + (bn_name, 'bias')] = np.asarray(bn['bias'])
    out_stats[flax_prefix + (bn_name, 'mean')] = np.asarray(
        bn['running_mean'])
    out_stats[flax_prefix + (bn_name, 'var')] = np.asarray(
        bn['running_var'])


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    out = {}
    for path, v in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return out


# torch module prefixes of VoxelBackBone8x(/Res with identity blocks ignored)
# in our SparseConvLayer_{i} order (spconv_backbone.py builds conv_input,
# conv1.0, conv2.0-2, conv3.0-2, conv4.0-2, conv_out — reference
# pcdet/models/backbones_3d/spconv_backbone.py:40-96)
_VOXEL8X_ORDER = [
    'conv_input', 'conv1.0',
    'conv2.0', 'conv2.1', 'conv2.2',
    'conv3.0', 'conv3.1', 'conv3.2',
    'conv4.0', 'conv4.1', 'conv4.2',
    'conv_out',
]


def _map_backbone3d(sd, targets, out_p, out_s):
    for i, torch_sub in enumerate(_VOXEL8X_ORDER):
        layer = f'SparseConvLayer_{i}'
        kpath = ('backbone_3d', layer, 'kernel')
        if kpath not in targets:
            continue
        k_tgt, c_in, c_out = targets[kpath].shape
        convs, bns = group_torch_sequential(sd, f'backbone_3d.{torch_sub}')
        if not convs:
            continue
        w = convs[0][0] if isinstance(convs[0], tuple) else convs[0]
        out_p[kpath] = _t_spconv(w, c_in, c_out)
        if bns:
            _bn_into(out_p, out_s, ('backbone_3d', layer),
                     'MaskedBatchNorm_0', bns[0])


def _map_backbone2d(sd, targets, out_p, out_s):
    for i in range(8):
        blk = ('backbone_2d', f'_ConvBlock_{i}')
        if blk + ('Conv_0', 'kernel') not in targets:
            break
        convs, bns = group_torch_sequential(sd, f'backbone_2d.blocks.{i}')
        for j, w in enumerate(convs):
            w = w[0] if isinstance(w, tuple) else w
            out_p[blk + (f'Conv_{j}', 'kernel')] = _t_conv2d(w)
        for j, bn in enumerate(bns):
            _bn_into(out_p, out_s, blk, f'BatchNorm_{j}', bn)
    for i in range(8):
        blk = ('backbone_2d', f'_DeBlock_{i}')
        up = blk + ('ConvTranspose_0', 'kernel')
        down = blk + ('Conv_0', 'kernel')
        if up not in targets and down not in targets:
            break
        convs, bns = group_torch_sequential(sd, f'backbone_2d.deblocks.{i}')
        if convs:
            w = convs[0][0] if isinstance(convs[0], tuple) else convs[0]
            if up in targets:
                out_p[up] = _t_convtranspose2d(w)
            else:  # UPSAMPLE_STRIDE < 1 → plain strided conv in both impls
                out_p[down] = _t_conv2d(w)
        if bns:
            _bn_into(out_p, out_s, blk, 'BatchNorm_0', bns[0])


def _map_dense_head(sd, targets, out_p, out_s):
    for name in ('conv_cls', 'conv_box', 'conv_dir_cls'):
        kpath = ('dense_head', name, 'kernel')
        if kpath in targets and f'dense_head.{name}.weight' in sd:
            out_p[kpath] = _t_conv2d(sd[f'dense_head.{name}.weight'])
            out_p[('dense_head', name, 'bias')] = np.asarray(
                sd[f'dense_head.{name}.bias'])


def _map_vfe(sd, targets, out_p, out_s):
    """PillarVFE PFN layers: reference ``vfe.pfn_layers.{i}.linear`` +
    ``.norm`` (pillar_vfe.py:22-23) → our ``vfe.PFNLayer_{i}.Dense_0`` +
    ``BatchNorm_0``."""
    for i in range(8):
        flax_prefix = ('vfe', f'PFNLayer_{i}')
        if flax_prefix + ('Dense_0', 'kernel') not in targets:
            break
        w_key = f'vfe.pfn_layers.{i}.linear.weight'
        if w_key not in sd:
            break
        out_p[flax_prefix + ('Dense_0', 'kernel')] = _t_linearish(sd[w_key])
        bn_prefix = f'vfe.pfn_layers.{i}.norm'
        if f'{bn_prefix}.running_mean' in sd:
            _bn_into(out_p, out_s, flax_prefix, 'BatchNorm_0', {
                'weight': sd[f'{bn_prefix}.weight'],
                'bias': sd[f'{bn_prefix}.bias'],
                'running_mean': sd[f'{bn_prefix}.running_mean'],
                'running_var': sd[f'{bn_prefix}.running_var']})


def _fold_bn_into_conv2d(w, bn, eps=1e-3):
    """Fold a torch BatchNorm2d that FOLLOWS a bias-free torch Conv2d into a
    flax conv (kernel, bias) pair — inference-exact.

    Used where our module runs conv→relu while the reference runs
    conv(bias=False)→BN→relu (CenterHead SeparateHead branches,
    center_head.py:22-27): y = γ·(Wx − μ)/√(σ²+ε) + β ≡ (γ/√(σ²+ε))·Wx +
    (β − γμ/√(σ²+ε))."""
    gamma = np.asarray(bn['weight'], np.float64)
    beta = np.asarray(bn['bias'], np.float64)
    mean = np.asarray(bn['running_mean'], np.float64)
    var = np.asarray(bn['running_var'], np.float64)
    inv = gamma / np.sqrt(var + eps)
    w_f = _t_conv2d(np.asarray(w, np.float64)) * inv[None, None, None, :]
    b_f = beta - mean * inv
    return w_f.astype(np.float32), b_f.astype(np.float32)


# CenterHead branch names: reference SeparateHead attribute → our flax
# branch prefix (center_head.py builds hm/center/center_z/dim/rot branches)
_CENTER_BRANCHES = ('hm', 'center', 'center_z', 'dim', 'rot')


def _map_center_head(sd, targets, out_p, out_s):
    """CenterHead: reference ``dense_head.shared_conv.{0,1}`` +
    ``dense_head.heads_list.0.{branch}.{i}...`` (center_head.py:73-88)
    → our ``dense_head.{Conv_0, BatchNorm_0, {branch}_conv/{branch}_out}``.

    The reference branch = Sequential(Conv2d(bias=False), BN, ReLU) + final
    biased Conv2d; ours = biased Conv → relu → biased Conv, so the branch BN
    folds into the first conv (inference-exact).  Multi-head-group configs
    (CLASS_NAMES_EACH_HEAD with >1 groups) are not yet mapped — only
    heads_list.0."""
    if ('dense_head', 'Conv_0', 'kernel') not in targets or \
            'dense_head.shared_conv.0.weight' not in sd:
        return
    out_p[('dense_head', 'Conv_0', 'kernel')] = _t_conv2d(
        sd['dense_head.shared_conv.0.weight'])
    if 'dense_head.shared_conv.1.running_mean' in sd:
        _bn_into(out_p, out_s, ('dense_head',), 'BatchNorm_0', {
            'weight': sd['dense_head.shared_conv.1.weight'],
            'bias': sd['dense_head.shared_conv.1.bias'],
            'running_mean': sd['dense_head.shared_conv.1.running_mean'],
            'running_var': sd['dense_head.shared_conv.1.running_var']})
    for br in _CENTER_BRANCHES:
        # reference names the heatmap branch 'hm' inside sep_head_dict.
        # Branch layout (num_conv=2, the shipped configs): nested
        # Sequential — {br}.0.0 = bias-free Conv, {br}.0.1 = BN, {br}.1 =
        # final biased Conv.
        t = f'dense_head.heads_list.0.{br}'
        conv_path = ('dense_head', f'{br}_conv')
        out_path = ('dense_head', f'{br}_out')
        if conv_path + ('kernel',) not in targets or \
                f'{t}.0.0.weight' not in sd:
            continue
        # first (bias-free) conv + its BN fold into our biased branch conv
        if f'{t}.0.1.running_mean' in sd:
            w_f, b_f = _fold_bn_into_conv2d(sd[f'{t}.0.0.weight'], {
                'weight': sd[f'{t}.0.1.weight'],
                'bias': sd[f'{t}.0.1.bias'],
                'running_mean': sd[f'{t}.0.1.running_mean'],
                'running_var': sd[f'{t}.0.1.running_var']})
        else:
            w_f = _t_conv2d(sd[f'{t}.0.0.weight'])
            b_f = sd.get(f'{t}.0.0.bias',
                         np.zeros(w_f.shape[-1], np.float32))
        out_p[conv_path + ('kernel',)] = w_f
        out_p[conv_path + ('bias',)] = np.asarray(b_f)
        # final biased conv maps directly
        if f'{t}.1.weight' in sd:
            out_p[out_path + ('kernel',)] = _t_conv2d(sd[f'{t}.1.weight'])
            out_p[out_path + ('bias',)] = np.asarray(sd[f'{t}.1.bias'])


def _map_sa_module(sd, torch_prefix, flax_prefix, out_p, out_s):
    """StackSAModuleMSG: per-branch shared mlps → flat Dense_i/BatchNorm_i
    counters in branch order (matching our pointnet2 SA module layout)."""
    di = 0
    for m in range(8):
        convs, bns = group_torch_sequential(sd, f'{torch_prefix}.mlps.{m}')
        if not convs:
            break
        for w, bn in zip(convs, bns):
            w = w[0] if isinstance(w, tuple) else w
            out_p[flax_prefix + (f'Dense_{di}', 'kernel')] = _t_linearish(w)
            _bn_into(out_p, out_s, flax_prefix, f'BatchNorm_{di}', bn)
            di += 1
    return di


def _map_fc_stack(sd, torch_prefix, flax_prefix, fc_name, bn_name, out_name,
                  targets, out_p, out_s):
    """A reference make_fc_layers stack (Conv1d/Linear+BN+ReLU…, final
    biased layer) → our {fc_name}_i / {bn_name}_i / optional {out_name}."""
    convs, bns = group_torch_sequential(sd, torch_prefix)
    if not convs:
        return
    n_bn = len(bns)
    for j, bn in enumerate(bns):
        _bn_into(out_p, out_s, flax_prefix, f'{bn_name}_{j}', bn)
    for j, w in enumerate(convs):
        is_final = isinstance(w, tuple)
        if is_final and out_name is not None:
            out_p[flax_prefix + (out_name, 'kernel')] = _t_linearish(w[0])
            out_p[flax_prefix + (out_name, 'bias')] = np.asarray(w[1])
        else:
            w_ = w[0] if is_final else w
            out_p[flax_prefix + (f'{fc_name}_{j}', 'kernel')] = \
                _t_linearish(w_)


def _map_point_head(sd, targets, out_p, out_s):
    """Point-head fc stacks → flat Dense_i / BatchNorm_i counters.

    All three reference point heads build their towers in a fixed attribute
    order matching our flax call order (point_head_template.make_fc_layers):
    PointHeadSimple = cls_layers; PointHeadBox = cls_layers + box_layers
    (point_head_box.py:16-31); PointIntraPartOffsetHead = cls_layers +
    part_reg_layers [+ box_layers] (point_intra_part_head.py:16-37).  The
    Dense/BatchNorm counters run globally across the stacks, mirroring flax
    auto-naming over sequential tower calls."""
    di = bi = 0
    for stack in ('cls_layers', 'part_reg_layers', 'box_layers'):
        convs, bns = group_torch_sequential(sd, f'point_head.{stack}')
        for bn in bns:
            _bn_into(out_p, out_s, ('point_head',), f'BatchNorm_{bi}', bn)
            bi += 1
        for w in convs:
            if isinstance(w, tuple):
                out_p[('point_head', f'Dense_{di}', 'kernel')] = \
                    _t_linearish(w[0])
                out_p[('point_head', f'Dense_{di}', 'bias')] = \
                    np.asarray(w[1])
            else:
                out_p[('point_head', f'Dense_{di}', 'kernel')] = \
                    _t_linearish(w)
            di += 1


def _map_pfe(sd, targets, out_p, out_s):
    _map_sa_module(sd, 'pfe.SA_rawpoints', ('pfe', 'SA_rawpoints'),
                   out_p, out_s)
    # SA_layers.{k} ↔ SA_x_conv{idx}: the reference appends one SA layer per
    # entry of FEATURES_SOURCE that is an x_conv (voxel_set_abstraction.py:
    # 120-141); our modules are named by the conv they sample
    sa_names = sorted(n for n in {p[1] for p in targets
                                  if p[0] == 'pfe' and len(p) > 1}
                      if n.startswith('SA_x_conv'))
    for k, name in enumerate(sa_names):
        _map_sa_module(sd, f'pfe.SA_layers.{k}', ('pfe', name), out_p, out_s)
    if 'pfe.vsa_point_feature_fusion.0.weight' in sd:
        out_p[('pfe', 'vsa_fusion', 'kernel')] = _t_linearish(
            sd['pfe.vsa_point_feature_fusion.0.weight'])
        _bn_into(out_p, out_s, ('pfe',), 'BatchNorm_0', {
            'weight': sd['pfe.vsa_point_feature_fusion.1.weight'],
            'bias': sd['pfe.vsa_point_feature_fusion.1.bias'],
            'running_mean': sd['pfe.vsa_point_feature_fusion.1.running_mean'],
            'running_var': sd['pfe.vsa_point_feature_fusion.1.running_var']})


def _map_roi_head(sd, targets, out_p, out_s):
    _map_sa_module(sd, 'roi_head.roi_grid_pool_layer',
                   ('roi_head', 'roi_grid_pool'), out_p, out_s)
    _map_fc_stack(sd, 'roi_head.shared_fc_layer', ('roi_head',),
                  'shared_fc', 'shared_bn', None, targets, out_p, out_s)
    # cls/reg tower naming differs per head family (PVRCNN: cls_fc_i;
    # PartA2/PointRCNN: cls_i) — write both schemes, the absent one is
    # dropped (same source tensors either way)
    for fc, bn in (('cls_fc', 'cls_bn'), ('cls', 'cls_bn')):
        _map_fc_stack(sd, 'roi_head.cls_layers', ('roi_head',),
                      fc, bn, 'cls_out', targets, out_p, out_s)
    for fc, bn in (('reg_fc', 'reg_bn'), ('reg', 'reg_bn')):
        _map_fc_stack(sd, 'roi_head.reg_layers', ('roi_head',),
                      fc, bn, 'reg_out', targets, out_p, out_s)


# UNetV2 decoder (spconv_unet.py:112-131): torch attr → our flax layer in
# instantiation order (spconv_backbone.py UNetV2: ur_block(level4..1) creates
# SparseBasicBlock_k = conv_up_t{4-k}, SparseConvLayer_{12+k} = conv_up_m,
# SparseInverseConvLayer_k = inv_conv{4-k}; the last ur_block's final conv is
# the subm conv5 = SparseConvLayer_16)
_UNET_DECODER = [
    ('conv_up_m4', 'SparseConvLayer_12'),
    ('conv_up_m3', 'SparseConvLayer_13'),
    ('conv_up_m2', 'SparseConvLayer_14'),
    ('conv_up_m1', 'SparseConvLayer_15'),
    ('conv5', 'SparseConvLayer_16'),
    ('inv_conv4', 'SparseInverseConvLayer_0'),
    ('inv_conv3', 'SparseInverseConvLayer_1'),
    ('inv_conv2', 'SparseInverseConvLayer_2'),
]


def _map_unet_decoder(sd, targets, out_p, out_s):
    if ('backbone_3d', 'SparseInverseConvLayer_0', 'kernel') not in targets:
        return
    for torch_sub, layer in _UNET_DECODER:
        kpath = ('backbone_3d', layer, 'kernel')
        if kpath not in targets:
            continue
        convs, bns = group_torch_sequential(sd, f'backbone_3d.{torch_sub}')
        if not convs:
            continue
        _, c_in, c_out = targets[kpath].shape
        w = convs[0][0] if isinstance(convs[0], tuple) else convs[0]
        out_p[kpath] = _t_spconv(w, c_in, c_out)
        if bns:
            _bn_into(out_p, out_s, ('backbone_3d', layer),
                     'MaskedBatchNorm_0', bns[0])
    # SparseBasicBlock_k ← conv_up_t{4-k} (attrs conv1/bn1/conv2/bn2,
    # spconv_unet.py:11-25)
    for k in range(4):
        t = f'backbone_3d.conv_up_t{4 - k}'
        for j in (1, 2):
            w = sd.get(f'{t}.conv{j}.weight')
            if w is None:
                continue
            kpath = ('backbone_3d', f'SparseBasicBlock_{k}',
                     f'SparseConvLayer_{j - 1}', 'kernel')
            if kpath not in targets:
                continue
            _, c_in, c_out = targets[kpath].shape
            out_p[kpath] = _t_spconv(w, c_in, c_out)
            if f'{t}.bn{j}.running_mean' in sd:
                _bn_into(out_p, out_s, kpath[:-1], 'MaskedBatchNorm_0', {
                    'weight': sd[f'{t}.bn{j}.weight'],
                    'bias': sd[f'{t}.bn{j}.bias'],
                    'running_mean': sd[f'{t}.bn{j}.running_mean'],
                    'running_var': sd[f'{t}.bn{j}.running_var']})


def _map_parta2_roi_head(sd, targets, out_p, out_s):
    """PartA2FCHead conv_part/conv_rpn SparseSequentials (partA2_head.py:
    19-27) → our DenseMaskedConv3d branches (dense (3,3,3,ci,co) kernels
    over the same (x,y,z) RoI-aware pooled grid)."""
    for branch in ('conv_part', 'conv_rpn'):
        if ('roi_head', f'{branch}_0', 'kernel') not in targets:
            continue
        convs, bns = group_torch_sequential(sd, f'roi_head.{branch}')
        for j, w in enumerate(convs):
            kpath = ('roi_head', f'{branch}_{j}', 'kernel')
            if kpath not in targets:
                continue
            shape = targets[kpath].shape            # (3, 3, 3, ci, co)
            w = w[0] if isinstance(w, tuple) else w
            out_p[kpath] = _t_spconv_dense(w, shape[-2], shape[-1])
            if j < len(bns):
                _bn_into(out_p, out_s, kpath[:-1], 'MaskedBatchNorm_0',
                         bns[j])


def _map_voxelrcnn_roi_head(sd, targets, out_p, out_s):
    """VoxelRCNNHead: roi_grid_pool_layers.{li}.mlps_{in,pos,out}.{k}
    (voxel_pool_modules.py:24-48) → our pool_{src}_{k}_{in,pos,out}(+_bn);
    shared/cls/reg towers + separate biased pred layers
    (voxelrcnn_head.py:51-79)."""
    # our pool-layer names sorted lexicographically = FEATURES_SOURCE order
    # (x_conv indices ascend in every shipped config)
    pool_names = sorted({p[1][:-3] for p in targets
                         if len(p) == 3 and p[0] == 'roi_head'
                         and p[1].startswith('pool_')
                         and p[1].endswith('_in') and p[2] == 'kernel'})
    srcs = []
    for nm in pool_names:
        src = nm[len('pool_'):].rsplit('_', 1)[0]
        if src not in srcs:
            srcs.append(src)
    for li, src in enumerate(srcs):
        ks = [nm for nm in pool_names
              if nm.startswith(f'pool_{src}_')]
        for k, nm in enumerate(sorted(ks)):
            t = f'roi_head.roi_grid_pool_layers.{li}'
            for part in ('in', 'pos', 'out'):
                convs, bns = group_torch_sequential(
                    sd, f'{t}.mlps_{part}.{k}')
                if not convs:
                    continue
                w = convs[0][0] if isinstance(convs[0], tuple) else convs[0]
                out_p[('roi_head', f'{nm}_{part}', 'kernel')] = \
                    _t_linearish(w)
                if bns:
                    _bn_into(out_p, out_s, ('roi_head',), f'{nm}_{part}_bn',
                             bns[0])
    _map_fc_stack(sd, 'roi_head.shared_fc_layer', ('roi_head',),
                  'shared_fc', 'shared_fc_bn', None, targets, out_p, out_s)
    _map_fc_stack(sd, 'roi_head.cls_fc_layers', ('roi_head',),
                  'cls_fc', 'cls_fc_bn', None, targets, out_p, out_s)
    _map_fc_stack(sd, 'roi_head.reg_fc_layers', ('roi_head',),
                  'reg_fc', 'reg_fc_bn', None, targets, out_p, out_s)
    for torch_name, ours in (('cls_pred_layer', 'cls_pred'),
                             ('reg_pred_layer', 'reg_pred')):
        w = sd.get(f'roi_head.{torch_name}.weight')
        if w is not None:
            out_p[('roi_head', ours, 'kernel')] = _t_linearish(w)
            out_p[('roi_head', ours, 'bias')] = np.asarray(
                sd[f'roi_head.{torch_name}.bias'])


def _map_pointnet2_backbone(sd, targets, out_p, out_s):
    """PointNet2MSG (pointnet2_backbone.py:9-96): SA_modules.{k} → sa_{k};
    FP_modules iterate REVERSED in both forwards (reference :87-91, ours
    runs the decoder loop from the deepest level), so our flat Dense/BN
    counters start at the LAST registered FP module."""
    for k in range(8):
        if f'backbone_3d.SA_modules.{k}.mlps.0.0.weight' not in sd:
            break
        _map_sa_module(sd, f'backbone_3d.SA_modules.{k}',
                       ('backbone_3d', f'sa_{k}'), out_p, out_s)
    n_fp = 0
    while f'backbone_3d.FP_modules.{n_fp}.mlp.0.weight' in sd:
        n_fp += 1
    di = 0
    for i in reversed(range(n_fp)):
        convs, bns = group_torch_sequential(
            sd, f'backbone_3d.FP_modules.{i}.mlp')
        for w, bn in zip(convs, bns):
            w = w[0] if isinstance(w, tuple) else w
            out_p[('backbone_3d', f'Dense_{di}', 'kernel')] = _t_linearish(w)
            _bn_into(out_p, out_s, ('backbone_3d',), f'BatchNorm_{di}', bn)
            di += 1


def _map_pointrcnn_roi_head(sd, targets, out_p, out_s):
    """PointRCNNHead (pointrcnn_head.py:13-59): xyz_up_layer /
    merge_down_layer 1×1 conv stacks, SA_modules (last one is the group-all
    module with flat sa{k}_d{li} names here), cls/reg towers."""
    if ('roi_head', 'xyz_up_0', 'kernel') not in targets:
        return
    for torch_name, ours in (('xyz_up_layer', 'xyz_up'),
                             ('merge_down_layer', 'merge_down')):
        convs, bns = group_torch_sequential(sd, f'roi_head.{torch_name}')
        for j, w in enumerate(convs):
            if isinstance(w, tuple):
                out_p[('roi_head', f'{ours}_{j}', 'kernel')] = \
                    _t_linearish(w[0])
                out_p[('roi_head', f'{ours}_{j}', 'bias')] = np.asarray(w[1])
            else:
                out_p[('roi_head', f'{ours}_{j}', 'kernel')] = \
                    _t_linearish(w)
        for j, bn in enumerate(bns):
            _bn_into(out_p, out_s, ('roi_head',), f'{ours}_bn_{j}', bn)
    for k in range(8):
        if f'roi_head.SA_modules.{k}.mlps.0.0.weight' not in sd:
            break
        if ('roi_head', f'sa_{k}') in {p[:2] for p in targets}:
            _map_sa_module(sd, f'roi_head.SA_modules.{k}',
                           ('roi_head', f'sa_{k}'), out_p, out_s)
        else:
            # group-all module: flat sa{k}_d{li}/sa{k}_bn{li} names
            convs, bns = group_torch_sequential(
                sd, f'roi_head.SA_modules.{k}.mlps.0')
            for li, (w, bn) in enumerate(zip(convs, bns)):
                w = w[0] if isinstance(w, tuple) else w
                out_p[('roi_head', f'sa{k}_d{li}', 'kernel')] = \
                    _t_linearish(w)
                _bn_into(out_p, out_s, ('roi_head',), f'sa{k}_bn{li}', bn)


def map_openpcdet_state(sd, params_tree, stats_tree):
    """Map a flat OpenPCDet ``model_state`` dict onto copies of our Flax
    ``params``/``batch_stats`` trees (SECOND, PointPillar, CenterPoint,
    PV-RCNN, PartA2, PointRCNN, VoxelRCNN families).

    Returns ``(new_params, new_stats, report)``; unmatched target leaves
    keep their existing values (the reference's ``strict=False`` behavior,
    detector3d_template.py:487-491).  ``report['mismatched']`` lists mapped
    keys whose shapes disagreed (those are skipped, like the reference).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()
          if hasattr(v, 'shape') or np.isscalar(v)}
    p_flat = {k: np.asarray(v) for k, v in _flatten(params_tree).items()}
    s_flat = {k: np.asarray(v) for k, v in _flatten(stats_tree).items()}
    targets = dict(p_flat)
    targets.update(s_flat)

    out_p, out_s = {}, {}
    _map_vfe(sd, targets, out_p, out_s)
    _map_backbone3d(sd, targets, out_p, out_s)
    _map_unet_decoder(sd, targets, out_p, out_s)
    _map_pointnet2_backbone(sd, targets, out_p, out_s)
    _map_backbone2d(sd, targets, out_p, out_s)
    _map_dense_head(sd, targets, out_p, out_s)
    _map_center_head(sd, targets, out_p, out_s)
    _map_pfe(sd, targets, out_p, out_s)
    _map_point_head(sd, targets, out_p, out_s)
    _map_roi_head(sd, targets, out_p, out_s)
    _map_parta2_roi_head(sd, targets, out_p, out_s)
    _map_voxelrcnn_roi_head(sd, targets, out_p, out_s)
    _map_pointrcnn_roi_head(sd, targets, out_p, out_s)

    report = {'mapped': [], 'mismatched': [], 'unmatched_target': [],
              'unused_source': [], 'dropped_names': []}
    used_targets = set()
    for path, val in list(out_p.items()) + list(out_s.items()):
        tgt = p_flat if path in p_flat else (
            s_flat if path in s_flat else None)
        if tgt is None:
            # mappers write speculatively (several detector families share
            # torch prefixes but use different flax names); a write whose
            # target leaf doesn't exist is dropped like the reference's
            # strict=False load (detector3d_template.py:487-491).  A wrong
            # name map still surfaces as unmatched_target.
            report['dropped_names'].append('.'.join(path))
            continue
        if tuple(tgt[path].shape) != tuple(val.shape):
            report['mismatched'].append(
                ('.'.join(path), tuple(val.shape), tuple(tgt[path].shape)))
            continue
        tgt[path] = val.astype(tgt[path].dtype)
        used_targets.add(path)
        report['mapped'].append('.'.join(path))
    report['unmatched_target'] = sorted(
        '.'.join(p) for p in set(p_flat) | set(s_flat)
        if p not in used_targets)
    return _unflatten(p_flat), _unflatten(s_flat), report


def import_openpcdet_checkpoint(pth_path, params_tree, stats_tree):
    """End-to-end: read a ``.pth`` and graft its model_state into our trees.
    Returns (params, batch_stats, report, meta)."""
    ckpt = load_torch_file(pth_path)
    sd = ckpt.get('model_state', ckpt) if isinstance(ckpt, dict) else ckpt
    meta = {}
    if isinstance(ckpt, dict):
        for k in ('epoch', 'it', 'version'):
            if k in ckpt and not isinstance(ckpt[k], _Stub):
                meta[k] = ckpt[k]
    params, stats, report = map_openpcdet_state(sd, params_tree, stats_tree)
    return params, stats, report, meta
