"""Egocentric overlay rendering (reference C10: vis.py,
baseline_vis.py, local_vis.py main loops).

For each per-frame pkl: decode the VPoser latent, run the SMPL-X
forward, flip the mesh 180 degrees about X (vis.py:334-336), place the
pinhole camera at camera_translation with its x negated (vis.py:352),
render 1280x720, alpha-composite over the matching source frame
images/%04d.jpg, write <out>/%04d.png (vis.py:375-396).

Variants map to the reference scripts:
  * source='smoothed'  -> vis.py      (reads smoothed_body/, writes
    smoothed_vis/)
  * source='baseline'  -> baseline_vis.py (reads body_gen results,
    writes baseline_vis/)
  * apply_scale=True   -> local_vis.py (multiplies verts and camera
    translation by the saved 'scale' and draws the 23 reprojected
    joints, local_vis.py:313-378)
"""
from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from fpv4d.io import body_pkl
from fpv4d.models import params as P
from fpv4d.models import vposer as VP
from fpv4d.models.smplx import SmplxModel
from fpv4d.vis import raster


def render_frame(model: SmplxModel, vposer_params, param: Dict,
                 camera: Optional[raster.Camera] = None,
                 apply_scale: bool = False,
                 background: Optional[np.ndarray] = None,
                 draw_joints: bool = False) -> np.ndarray:
    """One pkl dict -> composited overlay image [H,W,3] float."""
    camera = camera or raster.Camera()
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
    verts = np.asarray(out["vertices"][0])
    joints = np.asarray(out["joints"][0, :23])

    scale = float(param.get("scale", 1.0)) if apply_scale else 1.0
    verts = verts * scale
    joints = joints * scale

    # 180-degree X flip (vis.py:334-336): y,z negate
    flip = raster.rotation_x_180()[:3, :3]
    verts = verts @ flip.T
    joints = joints @ flip.T

    # camera at camera_translation with x negated (vis.py:350-361);
    # view transform = inverse of the camera pose = subtract position
    cam_t = np.asarray(param["camera_translation"],
                       dtype=np.float32).reshape(3).copy()
    cam_t *= scale if apply_scale else 1.0
    cam_t[0] *= -1.0
    verts_cam = verts - cam_t
    joints_cam = joints - cam_t

    if background is None:
        background = np.zeros((camera.height, camera.width, 3),
                              dtype=np.float32)
    rgb, mask = raster.render_mesh(verts_cam, model.faces, camera)
    img = raster.composite(rgb, mask, background)
    if draw_joints:
        uv, z = camera.project(joints_cam)
        img = raster.draw_circles(img, uv[z > 0])
    return img


def render_dir(fitting_dir: str, model: SmplxModel, vposer_params,
               source: str = "smoothed",
               camera: Optional[raster.Camera] = None,
               limit: Optional[int] = None) -> int:
    """Directory driver mirroring the reference mains. Reads pkls from
    fitting_dir, composites over sibling images/, writes PNGs to the
    sibling vis folder. Returns number of frames written."""
    apply_scale = source == "local"
    if source == "baseline":
        pkls = body_pkl.list_body_gen(os.path.dirname(fitting_dir)
                                      or fitting_dir)
        out_name = "baseline_vis"
    else:
        pkls = sorted(glob.glob(os.path.join(fitting_dir, "*.pkl")))
        out_name = "smoothed_vis" if source == "smoothed" else "local_vis"

    base = os.path.dirname(os.path.abspath(fitting_dir))
    img_dir = os.path.join(base, "images")
    out_dir = os.path.join(base, out_name)
    os.makedirs(out_dir, exist_ok=True)

    count = 0
    for i, path in enumerate(pkls[:limit]):
        param = body_pkl.load_frame(path)
        bg = _load_background(img_dir, i, camera)
        img = render_frame(model, vposer_params, param, camera,
                           apply_scale=apply_scale, background=bg,
                           draw_joints=apply_scale)
        _save_png(os.path.join(out_dir, f"{i:04d}.png"), img)
        count += 1
    return count


def _load_background(img_dir: str, idx: int,
                     camera: Optional[raster.Camera]) -> Optional[np.ndarray]:
    cam = camera or raster.Camera()
    for pattern in (f"{idx:04d}.jpg", f"{idx:06d}.jpg", f"{idx:04d}.png",
                    f"{idx:06d}.png"):
        path = os.path.join(img_dir, pattern)
        if os.path.exists(path):
            import cv2
            img = cv2.imread(path)
            if img is not None:
                img = cv2.resize(img, (cam.width, cam.height))
                return img[:, :, ::-1].astype(np.float32) / 255.0
    return None


def _save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)
