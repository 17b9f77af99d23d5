"""Generate the golden KITTI-eval fixture from the REFERENCE evaluator.

Runs /root/reference's kitti_object_eval_python/eval.py on fabricated annos
with two substitutions (this environment has no numba/CUDA):
  - numba.jit/njit stubbed to identity (the decorated code is plain python)
  - rotate_iou_gpu_eval replaced by an INDEPENDENT numpy Sutherland-Hodgman
    polygon clipper written below (not shared with either codebase)

The output pickle (tests/golden/kitti_eval_golden.pkl) freezes the
reference's exact AP numbers; tests/test_kitti_eval_golden.py asserts our
evaluator reproduces them to 1e-6.  Regenerate only if the fixture design
changes:  python tools/make_eval_golden.py
"""
import pickle
import sys
import types
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent


# ---- independent rotated-rectangle intersection (numpy) --------------------
def _box_corners(boxes):
    """boxes (N, 5) [cx, cy, w, h, angle] → (N, 4, 2) corners."""
    cx, cy, w, h, a = [boxes[:, i] for i in range(5)]
    dx = np.stack([w / 2, w / 2, -w / 2, -w / 2], 1)
    dy = np.stack([-h / 2, h / 2, h / 2, -h / 2], 1)
    cos, sin = np.cos(a)[:, None], np.sin(a)[:, None]
    x = cx[:, None] + dx * cos - dy * sin
    y = cy[:, None] + dx * sin + dy * cos
    return np.stack([x, y], axis=-1)


def _clip_poly(poly, a, b):
    """Clip polygon (list of 2d pts) by half-plane left of a→b."""
    out = []
    n = len(poly)
    for i in range(n):
        p, q = poly[i], poly[(i + 1) % n]
        side_p = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        side_q = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
        if side_p >= 0:
            out.append(p)
        if (side_p >= 0) != (side_q >= 0):
            t = side_p / (side_p - side_q)
            out.append(p + t * (q - p))
    return out


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    pts = np.asarray(poly)
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _intersection_area(c1, c2):
    poly = [c1[i] for i in range(4)]
    for i in range(4):
        poly = _clip_poly(poly, c2[i], c2[(i + 1) % 4])
        if not poly:
            return 0.0
    return _poly_area(poly)


def rotate_iou_numpy(boxes, query_boxes, criterion=-1):
    boxes = np.asarray(boxes, np.float64)
    query_boxes = np.asarray(query_boxes, np.float64)
    c1 = _box_corners(boxes)
    c2 = _box_corners(query_boxes)
    n, k = len(boxes), len(query_boxes)
    out = np.zeros((n, k), np.float64)
    for i in range(n):
        for j in range(k):
            inter = _intersection_area(c1[i], c2[j])
            a1 = boxes[i, 2] * boxes[i, 3]
            a2 = query_boxes[j, 2] * query_boxes[j, 3]
            if criterion == -1:
                ua = a1 + a2 - inter
            elif criterion == 0:
                ua = a1
            elif criterion == 1:
                ua = a2
            else:
                ua = 1.0
            out[i, j] = inter / ua if criterion != 2 else inter
    return out.astype(np.float32)


# ---- numba stub + reference import -----------------------------------------
def _stub_numba():
    numba = types.ModuleType('numba')

    def _identity_dec(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def wrap(fn):
            return fn
        return wrap

    numba.jit = _identity_dec
    numba.njit = _identity_dec
    numba.prange = range
    cuda = types.ModuleType('numba.cuda')
    cuda.jit = _identity_dec
    numba.cuda = cuda
    sys.modules['numba'] = numba
    sys.modules['numba.cuda'] = cuda


def _fabricate_annos(num_frames=30, seed=42):
    rng = np.random.RandomState(seed)
    classes = ['Car', 'Pedestrian', 'Cyclist']
    sizes = {'Car': [1.56, 1.6, 3.9], 'Pedestrian': [1.73, 0.6, 0.8],
             'Cyclist': [1.73, 0.6, 1.76]}  # h, w, l
    gt_annos, dt_annos = [], []
    for f in range(num_frames):
        n_gt = rng.randint(2, 7)
        names, bbox, dims, locs, rots = [], [], [], [], []
        trunc, occ, alpha = [], [], []
        for _ in range(n_gt):
            cls = classes[rng.randint(3)]
            h, w, l = sizes[cls]
            x = rng.uniform(-15, 15)
            z = rng.uniform(5, 35)
            y = rng.uniform(1.2, 1.8)
            ry = rng.uniform(-np.pi, np.pi)
            names.append(cls)
            dims.append([h + rng.uniform(-0.1, 0.1),
                         w + rng.uniform(-0.05, 0.05),
                         l + rng.uniform(-0.2, 0.2)])
            locs.append([x, y, z])
            rots.append(ry)
            # plausible image box (height shrinks with distance)
            bh = 800.0 / z * h
            bw = 800.0 / z * max(w, l * abs(np.sin(ry)) + w * abs(np.cos(ry)))
            cxi = 600 + x / z * 700
            cyi = 180 + 40.0 / z
            bbox.append([cxi - bw / 2, cyi - bh / 2, cxi + bw / 2,
                         cyi + bh / 2])
            trunc.append(float(rng.uniform(0, 0.2)))
            occ.append(int(rng.choice([0, 0, 0, 1, 1, 2])))
            alpha.append(float(-np.arctan2(x, z) + ry))
        gt = {
            'name': np.array(names),
            'truncated': np.array(trunc),
            'occluded': np.array(occ, np.int64),
            'alpha': np.array(alpha),
            'bbox': np.array(bbox, np.float64).reshape(-1, 4),
            'dimensions': np.array(dims, np.float64).reshape(-1, 3)[:, [2, 0, 1]],
            'location': np.array(locs, np.float64).reshape(-1, 3),
            'rotation_y': np.array(rots, np.float64),
            'score': np.zeros(n_gt),
        }
        gt_annos.append(gt)

        # detections: jittered copies of most gts + a couple of false alarms
        keep = rng.rand(n_gt) > 0.15
        d_names, d_bbox, d_dims, d_locs, d_rots, d_scores, d_alpha = \
            [], [], [], [], [], [], []
        for i in range(n_gt):
            if not keep[i]:
                continue
            d_names.append(gt['name'][i])
            d_bbox.append(gt['bbox'][i] + rng.uniform(-2, 2, 4))
            d_dims.append(gt['dimensions'][i] * rng.uniform(0.98, 1.02, 3))
            d_locs.append(gt['location'][i] + rng.uniform(-0.12, 0.12, 3))
            d_rots.append(gt['rotation_y'][i] + rng.uniform(-0.03, 0.03))
            d_alpha.append(gt['alpha'][i])
            d_scores.append(rng.uniform(0.4, 1.0))
        for _ in range(rng.randint(0, 3)):  # false positives
            cls = classes[rng.randint(3)]
            h, w, l = sizes[cls]
            d_names.append(cls)
            d_bbox.append(np.array([rng.uniform(0, 1000),
                                    rng.uniform(100, 250), 0, 0])
                          + np.array([0, 0, 60, 40]))
            d_dims.append([l, h, w])
            d_locs.append([rng.uniform(-15, 15), 1.5, rng.uniform(5, 60)])
            d_rots.append(rng.uniform(-np.pi, np.pi))
            d_alpha.append(0.0)
            d_scores.append(rng.uniform(0.05, 0.5))
        nd = len(d_names)
        dt = {
            'name': np.array(d_names),
            'truncated': np.zeros(nd),
            'occluded': np.zeros(nd, np.int64),
            'alpha': np.array(d_alpha),
            'bbox': np.array(d_bbox, np.float64).reshape(-1, 4),
            'dimensions': np.array(d_dims, np.float64).reshape(-1, 3),
            'location': np.array(d_locs, np.float64).reshape(-1, 3),
            'rotation_y': np.array(d_rots, np.float64),
            'score': np.array(d_scores),
        }
        dt_annos.append(dt)
    return gt_annos, dt_annos


def main():
    _stub_numba()
    # load the reference eval.py under a synthetic package so its relative
    # imports resolve without importing the full pcdet package
    pkg = types.ModuleType('refkittieval')
    pkg.__path__ = [
        '/root/reference/pcdet/datasets/kitti/kitti_object_eval_python']
    sys.modules['refkittieval'] = pkg
    rotate_mod = types.ModuleType('refkittieval.rotate_iou')
    rotate_mod.rotate_iou_gpu_eval = rotate_iou_numpy
    sys.modules['refkittieval.rotate_iou'] = rotate_mod
    import importlib
    ref_eval = importlib.import_module('refkittieval.eval')
    assert ref_eval.rotate_iou_gpu_eval is rotate_iou_numpy

    gt_annos, dt_annos = _fabricate_annos()
    result_str, result_dict = ref_eval.get_official_eval_result(
        [dict(a) for a in gt_annos], [dict(a) for a in dt_annos],
        ['Car', 'Pedestrian', 'Cyclist'])
    out = {
        'gt_annos': gt_annos,
        'dt_annos': dt_annos,
        'result_dict': {k: float(v) for k, v in result_dict.items()},
    }
    golden = REPO_ROOT / 'tests' / 'golden'
    golden.mkdir(exist_ok=True)
    with open(golden / 'kitti_eval_golden.pkl', 'wb') as f:
        pickle.dump(out, f)
    print('golden keys:', len(out['result_dict']))
    for k in sorted(out['result_dict'])[:8]:
        print(' ', k, out['result_dict'][k])


if __name__ == '__main__':
    main()
