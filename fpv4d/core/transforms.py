"""Homogeneous transforms and camera-pose math.

Replaces the reference's verts_transform (global_optimization.py:119-127),
body2world pivot construction (:191-206), and COLMAP extrinsic
inversion (:208-230) with batched, jit-safe jnp equivalents.
"""
from __future__ import annotations

import jax.numpy as jnp

from fpv4d.core.rotations import quat_to_matrot


def to_homo(points: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 3] -> [..., N, 4] with trailing 1s."""
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    return jnp.concatenate([points, ones], axis=-1)


def transform_points(points: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] to [..., N, 3] -> [..., N, 3].

    Same math as verts_transform: pad-to-homo then matmul by the
    transpose (global_optimization.py:119-127); batch dims broadcast.
    """
    homo = to_homo(points)
    out = jnp.matmul(homo, jnp.swapaxes(mat, -1, -2))
    return out[..., :3]


def make_translation_mat(t: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 4, 4] identity-rotation transform.

    Batched version of the reference's per-frame python loop that
    builds (I | scale*camera_transl) pivots (global_optimization.py:194-203).
    """
    eye = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), t.shape[:-1] + (4, 4))
    return eye.at[..., :3, 3].set(t)


def body2world(camera_ext: jnp.ndarray, camera_transl: jnp.ndarray,
               scale: jnp.ndarray) -> jnp.ndarray:
    """World-from-body per frame: camera_ext @ (I | scale * camera_transl).

    camera_ext: [T, 4, 4] world-from-camera; camera_transl: [T, 3]
    (slot [72:75] of the 75-d params); scale: scalar metric scale.
    Matches FittingOP.body2world (global_optimization.py:191-206)
    without the host-side loop.
    """
    pivot = make_translation_mat(camera_transl * scale)
    return jnp.matmul(camera_ext, pivot)


def invert_rigid(mat: jnp.ndarray) -> jnp.ndarray:
    """Invert [..., 4, 4] rigid transforms analytically (R^T | -R^T t)."""
    R = mat[..., :3, :3]
    t = mat[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.matmul(Rt, t[..., None])[..., 0]
    out = jnp.broadcast_to(jnp.eye(4, dtype=mat.dtype), mat.shape).copy()
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    return out


def colmap_pose_to_world_from_cam(qvec: jnp.ndarray,
                                  tvec: jnp.ndarray) -> jnp.ndarray:
    """COLMAP (qw qx qy qz, t) world-to-cam -> [..., 4, 4] world-from-cam.

    The reference builds [R|t] then inverts with numpy
    (global_optimization.py:213-224); here the inverse is analytic.
    """
    R = quat_to_matrot(qvec)
    t = tvec
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.matmul(Rt, t[..., None])[..., 0]
    batch = R.shape[:-2]
    out = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), batch + (4, 4)).copy()
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    return out
