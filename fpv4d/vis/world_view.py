"""World-coordinate rendering (reference C11: global_vis.py and
interactive_vis.py).

Renders, per frame: the scene cloud/mesh, the body mesh transformed
into world coordinates by camera_ext @ (I | scale*camera_translation)
(global_vis.py:116-129), and red trajectory spheres at the camera
centers (:156-160). Viewpoint: the first frame's camera pose
(world_trans = inv(first camerapose line), :80-92) or a follow-cam
(interactive_vis.py's camera-following mode). Images are written as
render<num>/img_%03d.png (:173-176).
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from fpv4d.core.transforms import invert_rigid
from fpv4d.io import body_pkl
from fpv4d.models import vposer as VP
from fpv4d.models.smplx import SmplxModel
from fpv4d.vis import raster

# intrinsics of the world view (global_vis.py:163-170)
WORLD_CAMERA = raster.Camera(fx=692.0, fy=692.0, cx=639.5, cy=359.5)


def body_to_world(param: Dict) -> np.ndarray:
    """camera_ext @ (I | scale * camera_translation) — the world
    placement of a saved frame (global_vis.py:116-129)."""
    scale = float(param.get("scale", 1.0))
    ct = np.asarray(param["camera_translation"],
                    dtype=np.float32).reshape(3)
    pivot = np.eye(4, dtype=np.float32)
    pivot[:3, 3] = ct * scale
    cam_ext = np.asarray(param.get("camera_ext", np.eye(4)),
                         dtype=np.float32)
    return cam_ext @ pivot


def camera_center(cam_ext: np.ndarray) -> np.ndarray:
    """World position of the camera from its world-from-camera matrix
    (the solve(R, -t) of global_vis.py:156-160 applied to the inverse
    convention)."""
    return cam_ext[:3, 3]


def render_frame(model: SmplxModel, vposer_params, param: Dict,
                 scene_pts: np.ndarray,
                 view: np.ndarray,
                 trajectory: Optional[np.ndarray] = None,
                 camera: raster.Camera = WORLD_CAMERA) -> np.ndarray:
    """One world-view frame. view: [4,4] world-from-camera of the
    viewpoint; scene_pts [M,3]; trajectory [K,3] camera centers so far
    (drawn as red points)."""
    pose63 = VP.decode(vposer_params,
                       jnp.asarray(param["body_pose"], jnp.float32))
    out = model(
        betas=jnp.asarray(param["betas"], jnp.float32),
        global_orient=jnp.asarray(param["global_orient"], jnp.float32),
        body_pose=pose63,
        transl=jnp.asarray(param["transl"], jnp.float32),
        left_hand_pose=jnp.asarray(param["left_hand_pose"], jnp.float32),
        right_hand_pose=jnp.asarray(param["right_hand_pose"],
                                    jnp.float32))
    scale = float(param.get("scale", 1.0))
    verts = np.asarray(out["vertices"][0]) * scale
    trans = body_to_world(param)
    verts_w = verts @ trans[:3, :3].T + trans[:3, 3]

    # into the view camera's frame. camera_ext is COLMAP/OpenCV
    # convention (x right, y down, z FORWARD); the rasterizer uses the
    # GL convention (y up, -z forward), so flip y and z after the view
    # transform (else everything sits "behind" the camera and renders
    # black).
    view_inv = np.asarray(invert_rigid(jnp.asarray(view)))
    cv_to_gl = np.array([1.0, -1.0, -1.0], dtype=np.float32)

    def to_cam(p):
        return (p @ view_inv[:3, :3].T + view_inv[:3, 3]) * cv_to_gl

    img = raster.render_points(to_cam(scene_pts), camera)
    if trajectory is not None and len(trajectory):
        img = raster.render_points(to_cam(np.asarray(trajectory)), camera,
                                   colors=np.array([1.0, 0.0, 0.0]),
                                   radius=3, image=img)
    rgb, mask = raster.render_mesh(to_cam(verts_w), model.faces, camera,
                                   base_color=(0.95, 0.8, 0.7))
    return raster.composite(rgb, mask, img)


def orbit_view(center: np.ndarray, radius: float, azimuth: float,
               elevation: float = 0.35) -> np.ndarray:
    """World-from-camera matrix (COLMAP convention, +Z forward) of a
    turntable camera at `azimuth` radians around `center`, looking at
    it — the offline equivalent of the windowed viewer's rotating
    orbit (interactive_vis.py:123-143, the one capability fixed/follow
    viewpoints don't cover).

    The WORLD here is y-UP (the repo's synthetic scenes put the floor
    at y=-1; only the camera axes follow COLMAP's y-down convention),
    so positive `elevation` raises the eye ABOVE the center — the
    usual slightly-elevated turntable shot. Tested:
    test_cli.py::test_orbit_eye_above_centroid."""
    eye = center + radius * np.array(
        [np.cos(azimuth) * np.cos(elevation), np.sin(elevation),
         np.sin(azimuth) * np.cos(elevation)], dtype=np.float32)
    fwd = center - eye
    fwd = fwd / (np.linalg.norm(fwd) + 1e-9)           # +Z forward
    up = np.array([0.0, -1.0, 0.0], dtype=np.float32)  # COLMAP y down
    right = np.cross(up, fwd)
    right /= (np.linalg.norm(right) + 1e-9)
    down = np.cross(fwd, right)
    view = np.eye(4, dtype=np.float32)
    view[:3, 0], view[:3, 1], view[:3, 2] = right, down, fwd
    view[:3, 3] = eye
    return view


def render_dir(fitting_dir: str, model: SmplxModel, vposer_params,
               scene_pts: np.ndarray, out_dir: str,
               follow: bool = False, orbit: bool = False,
               orbit_turns: float = 1.0,
               limit: Optional[int] = None) -> int:
    """Render all frames of a smoothed_body directory.

    follow=False: fixed viewpoint at the first frame's camera pose
    (global_vis.py); follow=True: viewpoint tracks each frame's camera
    (interactive_vis.py's camera-following mode); orbit=True: a
    turntable sweep of `orbit_turns` revolutions around the scene over
    the clip (the windowed viewer's orbiting mode, offline). Writes
    <out_dir>/img_%03d.png. Returns frame count."""
    pkls = sorted(glob.glob(os.path.join(fitting_dir, "*.pkl")))[:limit]
    os.makedirs(out_dir, exist_ok=True)
    center = radius = None
    if orbit and pkls:
        # orbit around the body trajectory's centroid, at a radius
        # covering the trajectory extent (plus margin for the body)
        centers = []
        for path in pkls:
            p = body_pkl.load_frame(path)
            centers.append(body_to_world(p)[:3, 3])
        centers = np.asarray(centers, dtype=np.float32)
        center = centers.mean(0)
        radius = float(max(2.5, 1.8 * np.linalg.norm(
            centers - center, axis=1).max()))
    trajectory: List[np.ndarray] = []
    view0 = None
    count = 0
    n = max(len(pkls), 1)
    for i, path in enumerate(pkls):
        param = body_pkl.load_frame(path)
        cam_ext = np.asarray(param.get("camera_ext", np.eye(4)),
                             dtype=np.float32)
        trajectory.append(camera_center(cam_ext))
        if view0 is None:
            view0 = cam_ext
        if orbit:
            view = orbit_view(center, radius,
                              2.0 * np.pi * orbit_turns * i / n)
        else:
            view = cam_ext if follow else view0
        img = render_frame(model, vposer_params, param, scene_pts, view,
                           np.asarray(trajectory))
        from PIL import Image
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"img_{i:03d}.png"))
        count += 1
    return count
