"""Self-contained software renderer (no GL / pyrender / Open3D).

The reference renders with pyrender's OffscreenRenderer + raymond
lights (vis.py:329-396) and Open3D (global_vis.py:67-178); neither GL
stack is available headless here, so the framework ships its own
painter's-algorithm rasterizer: depth-sorted triangle fill (cv2) with
Lambertian shading under three raymond-style directional lights, plus
point-cloud splatting for scene clouds. Camera model is the pinhole
IntrinsicsCamera the reference uses (fx=fy=692, cx=640, cy=360,
vis.py:358-360), with the OpenGL-style convention (camera looks down
-Z, +Y up) so poses/flips carry over unchanged.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:                      # pragma: no cover
    _HAS_CV2 = False

# raymond light rig: three directional lights in a triangle overhead
# (the rig the reference steals from pyrender's viewer, vis.py:274-276)
_RAYMOND_DIRS = np.array([
    [0.0, -1.0, -1.0],
    [0.866, 0.5, -1.0],
    [-0.866, 0.5, -1.0],
], dtype=np.float32)
_RAYMOND_DIRS /= np.linalg.norm(_RAYMOND_DIRS, axis=1, keepdims=True)
_RAYMOND_INTENSITY = np.array([0.45, 0.35, 0.35], dtype=np.float32)


@dataclass
class Camera:
    """Pinhole intrinsics; OpenGL view convention (look down -Z)."""
    fx: float = 692.0
    fy: float = 692.0
    cx: float = 640.0
    cy: float = 360.0
    width: int = 1280
    height: int = 720

    def project(self, pts_cam: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """[N,3] camera-space -> ([N,2] pixels, [N] depth>0 in front).

        GL convention: visible points have z < 0; depth = -z. Image y
        grows downward, so v = cy - fy * y / depth."""
        z = -pts_cam[:, 2]
        depth = np.maximum(z, 1e-6)
        u = self.fx * pts_cam[:, 0] / depth + self.cx
        v = self.cy - self.fy * pts_cam[:, 1] / depth
        return np.stack([u, v], axis=1), z


def _shade(normals: np.ndarray, base_color: np.ndarray,
           ambient: float = 0.3) -> np.ndarray:
    """Lambertian under the raymond rig. normals [F,3] -> colors [F,3]."""
    lam = np.zeros(normals.shape[0], dtype=np.float32)
    for d, w in zip(_RAYMOND_DIRS, _RAYMOND_INTENSITY):
        lam += w * np.clip(normals @ (-d), 0.0, None)
    inten = np.clip(ambient + lam, 0.0, 1.0)[:, None]
    return np.clip(inten * base_color[None, :], 0.0, 1.0)


def render_mesh(verts_cam: np.ndarray, faces: np.ndarray, camera: Camera,
                base_color=(1.0, 1.0, 0.9),
                image: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Render a triangle mesh.

    verts_cam [V,3] camera-space vertices, faces [F,3]. Returns
    (rgb float [H,W,3], mask float [H,W,1]) — the RGBA-and-valid-mask
    contract of the reference's offscreen render (vis.py:369-374).
    Painter's algorithm: faces sorted far-to-near, each filled with
    its shaded flat color.
    """
    H, W = camera.height, camera.width
    rgb = np.zeros((H, W, 3), dtype=np.float32) if image is None \
        else image.astype(np.float32).copy()
    mask = np.zeros((H, W, 1), dtype=np.float32)
    if not _HAS_CV2 or len(faces) == 0:
        return rgb, mask

    uv, z = camera.project(verts_cam)
    tri_uv = uv[faces]                            # [F,3,2]
    tri_z = z[faces].mean(axis=1)                 # [F]

    # face normals in camera space
    a = verts_cam[faces[:, 1]] - verts_cam[faces[:, 0]]
    b = verts_cam[faces[:, 2]] - verts_cam[faces[:, 0]]
    n = np.cross(a, b)
    n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-12
    colors = _shade(n, np.asarray(base_color, dtype=np.float32))

    # keep faces fully in front of the camera; sort far -> near
    visible = np.all(z[faces] > 1e-4, axis=1)
    order = np.argsort(-tri_z)
    order = order[visible[order]]

    buf = (rgb * 255).astype(np.uint8)
    mbuf = np.zeros((H, W), dtype=np.uint8)
    pts_int = np.round(tri_uv).astype(np.int32)
    for f in order:
        p = pts_int[f]
        if (p[:, 0].max() < 0 or p[:, 0].min() >= W
                or p[:, 1].max() < 0 or p[:, 1].min() >= H):
            continue
        c = tuple(int(v * 255) for v in colors[f])
        cv2.fillConvexPoly(buf, p, c, lineType=cv2.LINE_8)
        cv2.fillConvexPoly(mbuf, p, 255, lineType=cv2.LINE_8)
    return buf.astype(np.float32) / 255.0, \
        (mbuf[..., None] > 0).astype(np.float32)


def render_points(pts_cam: np.ndarray, camera: Camera,
                  colors: Optional[np.ndarray] = None,
                  radius: int = 1,
                  image: Optional[np.ndarray] = None) -> np.ndarray:
    """Splat a point cloud (world/scene view). Returns rgb [H,W,3]."""
    H, W = camera.height, camera.width
    rgb = np.zeros((H, W, 3), dtype=np.float32) if image is None \
        else image.astype(np.float32).copy()
    uv, z = camera.project(pts_cam)
    ok = (z > 1e-4) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
        & (uv[:, 1] >= 0) & (uv[:, 1] < H)
    uv = uv[ok].astype(np.int32)
    z = z[ok]
    if colors is None:
        cols = np.full((len(uv), 3), 0.6, dtype=np.float32)
    else:
        cols = np.asarray(colors, dtype=np.float32)
        cols = np.broadcast_to(cols, (len(z), 3)) if cols.ndim == 1 \
            else cols[ok]
    # far-to-near so near points overwrite
    order = np.argsort(-z)
    if radius <= 1 or not _HAS_CV2:
        rgb[uv[order, 1], uv[order, 0]] = cols[order]
    else:
        buf = (rgb * 255).astype(np.uint8)
        for i in order:
            cv2.circle(buf, (int(uv[i, 0]), int(uv[i, 1])), radius,
                       tuple(int(v * 255) for v in cols[i]), -1)
        rgb = buf.astype(np.float32) / 255.0
    return rgb


def composite(render_rgb: np.ndarray, mask: np.ndarray,
              background: np.ndarray) -> np.ndarray:
    """Alpha-composite the render over a background frame — the
    valid_mask blend of the reference (vis.py:373-396)."""
    return render_rgb * mask + (1.0 - mask) * background


def draw_circles(image: np.ndarray, uv: np.ndarray, radius: int = 4,
                 color=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Draw keypoint circles (local_vis.py:368-378 reprojection dots)."""
    out = (image * 255).astype(np.uint8)
    if _HAS_CV2:
        for p in np.asarray(uv):
            cv2.circle(out, (int(round(p[0])), int(round(p[1]))), radius,
                       tuple(int(c * 255) for c in color), -1)
    return out.astype(np.float32) / 255.0


def rotation_x_180() -> np.ndarray:
    """The 180-degree X flip applied to meshes before rendering
    (vis.py:334-336) — pyrender camera convention adapter."""
    m = np.eye(4, dtype=np.float32)
    m[1, 1] = -1.0
    m[2, 2] = -1.0
    return m
