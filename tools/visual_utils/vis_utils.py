"""Scene visualization: open3d interactive viewer + headless matplotlib BEV.

Parity surface: ``tools/visual_utils/open3d_vis_utils.py`` (draw_scenes,
box line sets) and ``visualize_utils.py`` (corner geometry).  open3d and
mayavi are not in this image, so the interactive path is import-guarded;
``draw_scenes_bev`` renders the same scene top-down with matplotlib (always
available) so demo.py has a working artifact everywhere.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - optional interactive backend
    import open3d
    _OPEN3D = True
except Exception:  # pragma: no cover
    open3d = None
    _OPEN3D = False

BOX_COLORMAP = [(1, 1, 1), (0, 1, 0), (0, 1, 1), (1, 1, 0)]


def boxes_to_corners_3d(boxes3d):
    """(N, 7) [x y z dx dy dz heading] → (N, 8, 3) corners (reference
    corner ordering: visualize_utils.boxes_to_corners_3d :44-69)."""
    boxes3d = np.asarray(boxes3d)
    template = np.array([
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]], np.float32) / 2
    corners = boxes3d[:, None, 3:6] * template[None]
    cosa = np.cos(boxes3d[:, 6])[:, None]
    sina = np.sin(boxes3d[:, 6])[:, None]
    x = corners[..., 0] * cosa - corners[..., 1] * sina
    y = corners[..., 0] * sina + corners[..., 1] * cosa
    out = np.stack([x, y, corners[..., 2]], axis=-1)
    return out + boxes3d[:, None, 0:3]


_BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
              (7, 4), (0, 4), (1, 5), (2, 6), (3, 7), (0, 5), (1, 4)]


def draw_scenes(points, gt_boxes=None, ref_boxes=None, ref_labels=None,
                ref_scores=None, point_colors=None, draw_origin=True):
    """Interactive open3d viewer (parity: open3d_vis_utils.draw_scenes)."""
    if not _OPEN3D:
        raise ImportError('open3d is not installed; use draw_scenes_bev '
                          'for a headless rendering')
    vis = open3d.visualization.Visualizer()
    vis.create_window()
    vis.get_render_option().point_size = 1.0
    vis.get_render_option().background_color = np.zeros(3)
    if draw_origin:
        vis.add_geometry(open3d.geometry.TriangleMesh.create_coordinate_frame(
            size=1.0, origin=[0, 0, 0]))
    pts = open3d.geometry.PointCloud()
    pts.points = open3d.utility.Vector3dVector(np.asarray(points)[:, :3])
    pts.colors = open3d.utility.Vector3dVector(
        point_colors if point_colors is not None
        else np.ones((len(points), 3)))
    vis.add_geometry(pts)
    for boxes, color_idx in ((gt_boxes, None), (ref_boxes, ref_labels)):
        if boxes is None:
            continue
        corners = boxes_to_corners_3d(np.asarray(boxes)[:, :7])
        for i, c in enumerate(corners):
            ls = open3d.geometry.LineSet()
            ls.points = open3d.utility.Vector3dVector(c)
            ls.lines = open3d.utility.Vector2iVector(np.asarray(_BOX_EDGES))
            col = (0, 0, 1) if color_idx is None else BOX_COLORMAP[
                int(np.asarray(color_idx)[i]) % len(BOX_COLORMAP)]
            ls.colors = open3d.utility.Vector3dVector(
                np.tile(col, (len(_BOX_EDGES), 1)))
            vis.add_geometry(ls)
    vis.run()
    vis.destroy_window()


def draw_scenes_bev(points, gt_boxes=None, ref_boxes=None, ref_scores=None,
                    save_path=None, xlim=(0, 70.4), ylim=(-40, 40)):
    """Headless top-down rendering (matplotlib). Returns the save path."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(10, 10), facecolor='black')
    ax.set_facecolor('black')
    pts = np.asarray(points)
    ax.scatter(pts[:, 0], pts[:, 1], s=0.2, c='white', linewidths=0)

    def draw(boxes, color, scores=None):
        corners = boxes_to_corners_3d(np.asarray(boxes)[:, :7])[:, :4, :2]
        for i, c in enumerate(corners):
            ax.plot(np.append(c[:, 0], c[0, 0]), np.append(c[:, 1], c[0, 1]),
                    color=color, linewidth=1.0)
            if scores is not None:
                ax.text(c[:, 0].mean(), c[:, 1].mean(),
                        f'{float(scores[i]):.2f}', color=color, fontsize=6)

    if gt_boxes is not None and len(gt_boxes):
        draw(gt_boxes, 'lime')
    if ref_boxes is not None and len(ref_boxes):
        draw(ref_boxes, 'cyan', ref_scores)
    ax.set_xlim(*xlim)
    ax.set_ylim(*ylim)
    ax.set_aspect('equal')
    ax.axis('off')
    save_path = save_path or 'scene_bev.png'
    fig.savefig(save_path, dpi=150, bbox_inches='tight', facecolor='black')
    plt.close(fig)
    return save_path
