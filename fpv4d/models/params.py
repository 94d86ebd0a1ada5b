"""Canonical 75-d body-parameter codec.

The whole pipeline works on a flat per-frame parameter vector
(reference layout fixed at cvae.py:188-208 / global_optimization.py:64-76):

    [ 0: 3]  transl               global body translation
    [ 3: 6]  global_orient        axis-angle (6D slots [3:9] in 78-d form)
    [ 6:16]  betas                10 shape coefficients
    [16:48]  body_pose            32-d VPoser latent
    [48:60]  left_hand_pose       12 PCA coefficients
    [60:72]  right_hand_pose      12 PCA coefficients
    [72:75]  camera_translation   egocentric camera pivot

This module is the typed replacement for HumanCVAE's static codec
methods, and *defines* the two contracts the reference leaves dangling
(SURVEY.md section 0 items 1-2):

  * ``split`` == the undefined ``body_params_encapsulate_batch``
    (called at global_optimization.py:268,321,384): batch [T,75] ->
    dict of arrays keyed for the SMPL-X forward.
  * ``encapsulate_frames(x, scale, camera_ext)`` == the 3-arg
    ``body_params_encapsulate`` (called at global_optimization.py:644):
    per-frame numpy dicts additionally carrying 'scale' and
    'camera_ext', as consumed by global_vis.py:120-124 and
    local_vis.py:311-313.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

# slot ranges in the 75-d (axis-angle) layout
SLICES = {
    "transl": (0, 3),
    "global_orient": (3, 6),
    "betas": (6, 16),
    "body_pose": (16, 48),
    "left_hand_pose": (48, 60),
    "right_hand_pose": (60, 72),
    "camera_translation": (72, 75),
}
DIM = 75          # axis-angle layout
DIM_6D = 78       # 6D-rotation layout (global_orient takes slots [3:9])
# same slots in the 78-d layout: global_orient widens 3 -> 6, every
# slot after it shifts by +3 (derived, so a layout change cannot
# desync consumers like the solver's direct 78-d decode)
SLICES_6D = {
    k: (a if a <= 3 else a + 3, b + 3 if b > 3 else b)
    for k, (a, b) in SLICES.items()
}
VPOSER_SLICE = (16, 48)          # in the 75-d layout
VPOSER_SLICE_6D = (19, 51)       # in the 78-d layout


def split_6d(x) -> Dict[str, jnp.ndarray]:
    """[..., 78] -> dict of named slices in the 6D layout (views;
    'global_orient' is the 6-d rotation slot)."""
    return {k: x[..., a:b] for k, (a, b) in SLICES_6D.items()}
# betas+pose slice smoothed by the sequential smoother in 6D layout
# (optimization.py:182 smooths [9:51] = betas[9:19] + pose[19:51])
SMOOTH_SLICE_6D = (9, 51)


def split(x) -> Dict[str, jnp.ndarray]:
    """[..., 75] -> dict of named slices (views, no copies)."""
    return {k: x[..., a:b] for k, (a, b) in SLICES.items()}


def join(d: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """dict -> [..., 75] in canonical order."""
    return jnp.concatenate([d[k] for k in SLICES], axis=-1)


def smplx_kwargs(x) -> Dict[str, jnp.ndarray]:
    """[..., 75] -> kwargs for the SMPL-X forward, minus body_pose.

    The 32-d VPoser latent is *not* a joint rotation; the caller must
    decode it first (global_optimization.py:270-282 pattern).
    camera_translation is excluded (it parameterizes body2world, not
    the mesh).
    """
    d = split(x)
    return {k: d[k] for k in
            ("transl", "global_orient", "betas",
             "left_hand_pose", "right_hand_pose")}


def from_pkl_dict(param: Dict[str, np.ndarray],
                  with_camera: bool = True) -> np.ndarray:
    """SMPLify-X pkl dict -> [1, 75] (or [1, 72] without camera).

    Mirrors body_params_parse (global_optimization.py:64-76,
    cvae.py:243-275).
    """
    keys = ["transl", "global_orient", "betas", "body_pose",
            "left_hand_pose", "right_hand_pose"]
    if with_camera:
        keys.append("camera_translation")
    parts = [np.asarray(param[k], dtype=np.float32).reshape(1, -1)
             for k in keys]
    return np.concatenate(parts, axis=-1)


def encapsulate_frames(x: np.ndarray,
                       scale: Optional[float] = None,
                       camera_ext: Optional[np.ndarray] = None
                       ) -> List[Dict[str, np.ndarray]]:
    """[T, 75] -> list of T per-frame dicts for pkl output.

    With scale/camera_ext supplied, each dict also carries the scalar
    'scale' and the [4,4] 'camera_ext' of its frame — the extended
    contract needed by world/local visualization (global_vis.py:120-124,
    local_vis.py:311-313).
    """
    x = np.asarray(x)
    out = []
    for t in range(x.shape[0]):
        d = {k: x[t:t + 1, a:b].copy() for k, (a, b) in SLICES.items()}
        if scale is not None:
            d["scale"] = np.float32(scale)
        if camera_ext is not None:
            d["camera_ext"] = np.asarray(camera_ext[t], dtype=np.float32)
        out.append(d)
    return out
