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


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>scene</title><style>
html,body{margin:0;height:100%;background:#000;overflow:hidden;font:12px monospace}
#hud{position:fixed;left:8px;top:8px;color:#9f9;user-select:none}
canvas{display:block}
</style></head><body>
<div id="hud">drag: orbit &nbsp; wheel: zoom &nbsp; shift-drag: pan &nbsp; c: color mode</div>
<canvas id="cv"></canvas>
<script>
const _s=atob("__PTS_B64__");const _u8=new Uint8Array(__PTS_BYTES__);
for(let i=0;i<_s.length;i++)_u8[i]=_s.charCodeAt(i);
const PTS=new Float32Array(_u8.buffer);
const NPT = PTS.length/4;              // x,y,z,intensity rows
const BOXES = __BOXES_JSON__;          // [{c:[8 corners x3 flat], col:"#rgb", lab:""}]
const cv=document.getElementById('cv'),ctx=cv.getContext('2d');
let az=-0.8, el=0.45, dist=__DIST__, cx=__CX__, cy=__CY__, cz=0, colorMode=0;
function resize(){cv.width=innerWidth;cv.height=innerHeight;draw();}
addEventListener('resize',resize);
let drag=null;
cv.addEventListener('mousedown',e=>drag=[e.clientX,e.clientY,e.shiftKey]);
addEventListener('mouseup',()=>drag=null);
addEventListener('mousemove',e=>{if(!drag)return;const dx=e.clientX-drag[0],dy=e.clientY-drag[1];
 if(drag[2]){const s=dist/600;cx-=(Math.cos(az)*dx- Math.sin(az)*dy)*s; cy-=(-Math.sin(az)*dx-Math.cos(az)*dy)*s;}
 else{az+=dx*0.008; el=Math.max(-1.5,Math.min(1.5,el+dy*0.008));}
 drag=[e.clientX,e.clientY,drag[2]];draw();});
cv.addEventListener('wheel',e=>{dist*=Math.exp(e.deltaY*0.001);draw();e.preventDefault();},{passive:false});
addEventListener('keydown',e=>{if(e.key=='c'){colorMode=(colorMode+1)%2;draw();}});
function proj(x,y,z,M,out){ // world -> screen
 const X=x-cx,Y=y-cy,Z=z-cz;
 const x1=M[0]*X+M[1]*Y, y1=M[2]*X+M[3]*Y;          // yaw
 const y2=M[4]*y1+M[5]*Z, z2=M[6]*y1+M[7]*Z;        // pitch
 const w=dist/Math.max(dist+y2,1);                    // perspective on view depth
 out[0]=cv.width/2 + x1*w*(cv.height/1.2)/dist;
 out[1]=cv.height/2 - z2*w*(cv.height/1.2)/dist;
 out[2]=y2;
 return out;}
function mat(){const ca=Math.cos(az),sa=Math.sin(az),ce=Math.cos(el),se=Math.sin(el);
 return [ca,-sa, sa,ca, ce,-se, se,ce];}
function heightColor(z){const t=Math.max(0,Math.min(1,(z+2.5)/4.5));
 return `rgb(${Math.round(40+215*t)},${Math.round(80+120*(1-Math.abs(t-0.5)*2))},${Math.round(255-215*t)})`;}
function draw(){
 ctx.fillStyle='#000';ctx.fillRect(0,0,cv.width,cv.height);
 const M=mat(),p=[0,0,0];
 const img=ctx.getImageData(0,0,cv.width,cv.height),d=img.data,W=cv.width,H=cv.height;
 for(let i=0;i<NPT;i++){
  proj(PTS[4*i],PTS[4*i+1],PTS[4*i+2],M,p);
  const x=p[0]|0,y=p[1]|0;
  if(x<0||y<0||x>=W||y>=H)continue;
  const o=4*(y*W+x);
  if(colorMode==0){const z=PTS[4*i+2],t=Math.max(0,Math.min(1,(z+2.5)/4.5));
   d[o]=40+215*t;d[o+1]=80+120*(1-Math.abs(t-0.5)*2);d[o+2]=255-215*t;}
  else{const v=Math.max(0,Math.min(1,PTS[4*i+3]));d[o]=255*v;d[o+1]=255*v;d[o+2]=160+95*v;}
  d[o+3]=255;}
 ctx.putImageData(img,0,0);
 const E=[[0,1],[1,2],[2,3],[3,0],[4,5],[5,6],[6,7],[7,4],[0,4],[1,5],[2,6],[3,7],[0,5],[1,4]];
 const q=[0,0,0],r=[0,0,0];
 for(const b of BOXES){ctx.strokeStyle=b.col;ctx.lineWidth=1.2;ctx.beginPath();
  for(const[e0,e1]of E){proj(b.c[3*e0],b.c[3*e0+1],b.c[3*e0+2],M,q);
   proj(b.c[3*e1],b.c[3*e1+1],b.c[3*e1+2],M,r);
   ctx.moveTo(q[0],q[1]);ctx.lineTo(r[0],r[1]);}
  ctx.stroke();
  if(b.lab){proj(b.c[0],b.c[1],b.c[2],M,q);ctx.fillStyle=b.col;ctx.fillText(b.lab,q[0]+3,q[1]-3);}}
}
resize();
</script></body></html>
"""


def draw_scenes_html(points, gt_boxes=None, ref_boxes=None, ref_labels=None,
                     ref_scores=None, save_path=None, max_points=150_000,
                     class_names=None):
    """Interactive full-3D scene viewer with ZERO dependencies: writes a
    self-contained HTML file (canvas orbit renderer — drag to rotate, wheel
    to zoom, shift-drag to pan, 'c' toggles height/intensity coloring).

    Capability parity with the reference's mayavi ``draw_scenes``
    (/root/reference/tools/visual_utils/visualize_utils.py:100-153: point
    cloud + green gt wireframes + per-label colored prediction wireframes
    with score text) without requiring a GUI stack in the image — the
    artifact opens in any browser.
    """
    import base64
    import json

    pts = np.asarray(points, np.float32)
    if pts.shape[1] < 4:
        pts = np.concatenate(
            [pts[:, :3], np.zeros((len(pts), 1), np.float32)], axis=1)
    pts = np.ascontiguousarray(pts[:, :4])
    if len(pts) > max_points:
        sel = np.random.RandomState(0).choice(len(pts), max_points,
                                              replace=False)
        pts = pts[sel]

    boxes = []

    def add(b3d, color, labels=None, scores=None):
        corners = boxes_to_corners_3d(np.asarray(b3d)[:, :7])
        for i, c in enumerate(corners):
            col = color
            lab = ''
            if labels is not None:
                li = int(np.asarray(labels)[i])
                rgb = BOX_COLORMAP[li % len(BOX_COLORMAP)]
                col = '#%02x%02x%02x' % tuple(int(255 * v) for v in rgb)
                if class_names and 1 <= li <= len(class_names):
                    lab = class_names[li - 1]
            if scores is not None:
                lab = (lab + f' {float(np.asarray(scores)[i]):.2f}').strip()
            boxes.append({'c': [round(float(v), 3) for v in c.reshape(-1)],
                          'col': col, 'lab': lab})

    if gt_boxes is not None and len(gt_boxes):
        add(gt_boxes, '#00ff00')
    if ref_boxes is not None and len(ref_boxes):
        add(ref_boxes, '#00ffff', ref_labels, ref_scores)

    center = pts[:, :2].mean(0) if len(pts) else np.zeros(2)
    span = float(np.percentile(
        np.abs(pts[:, :2] - center).max(1), 95)) if len(pts) else 50.0
    raw = pts.tobytes()
    html = (_HTML_TEMPLATE
            .replace('__PTS_B64__', base64.b64encode(raw).decode())
            .replace('__PTS_BYTES__', str(len(raw)))
            .replace('__BOXES_JSON__', json.dumps(boxes))
            .replace('__DIST__', f'{max(span * 2.0, 10.0):.1f}')
            .replace('__CX__', f'{center[0]:.2f}')
            .replace('__CY__', f'{center[1]:.2f}'))
    save_path = save_path or 'scene_3d.html'
    with open(save_path, 'w') as f:
        f.write(html)
    return save_path
