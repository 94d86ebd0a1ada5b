"""Rotation codecs: axis-angle <-> rotation matrix <-> quaternion <-> 6D.

TPU-native replacements for the reference's rotation stack
(torchgeometry Rodrigues at cvae.py:86-93, Gram-Schmidt 6D decode at
cvae.py:62-72, and the 75<->78-dim parameter lifts at
global_optimization.py:96-115). Everything here is pure jnp, static
shape, jit/vmap/grad-safe (no data-dependent branching; singular
configurations are handled with `where`-style smooth guards).

Conventions match the reference exactly:
  * 6D representation = first two COLUMNS of the rotation matrix,
    flattened row-major as ``mat[..., :, :2].reshape(6)`` (the
    torch ``view(-1, 3, 2)`` layout of cvae.py:51,64).
  * ``matrot2aa`` goes through a quaternion (numerically robust for
    all rotation angles, unlike naive acos-trace).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def aa_to_matrot(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues).

    Smooth at theta=0 via sinc-style guards, so it is grad-safe.
    Equivalent to torchgeometry.angle_axis_to_rotation_matrix[:3,:3]
    used at cvae.py:92.
    """
    aa = jnp.asarray(aa)
    theta2 = jnp.sum(aa * aa, axis=-1)                 # [...]
    small = theta2 < 1e-8
    # double-where: denominators are made non-zero in the unselected
    # branch, otherwise the masked gradient is 0/0 = NaN at theta=0
    safe_t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_t2)
    # sin(t)/t and (1-cos(t))/t^2 with smooth small-angle limits.
    s = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    c = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / safe_t2)
    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)  # [..., 3, 3]
    eye = jnp.eye(3, dtype=aa.dtype)
    K2 = jnp.matmul(K, K)
    return eye + s[..., None, None] * K + c[..., None, None] * K2


def matrot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w,x,y,z).

    Branchless 4-case Shepperd selection: compute all four candidate
    quaternions and pick the one keyed by the largest denominator.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    def cand(t, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(t, _EPS)) * 2.0  # 2*sqrt(pivot)
        return jnp.stack([a / s, b / s, c / s, d / s], axis=-1), s

    q0, s0 = cand(1.0 + tr, (1.0 + tr) , m21 - m12, m02 - m20, m10 - m01)
    q1, s1 = cand(1.0 + m00 - m11 - m22, m21 - m12, (1.0 + m00 - m11 - m22),
                  m01 + m10, m02 + m20)
    q2, s2 = cand(1.0 - m00 + m11 - m22, m02 - m20, m01 + m10,
                  (1.0 - m00 + m11 - m22), m12 + m21)
    q3, s3 = cand(1.0 - m00 - m11 + m22, m10 - m01, m02 + m20,
                  m12 + m21, (1.0 - m00 - m11 + m22))

    # note: candN[..., pivot_slot] equals s/4 by construction above.
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)          # [..., 4, 4]
    pivots = jnp.stack([s0, s1, s2, s3], axis=-1)         # [..., 4]
    idx = jnp.argmax(pivots, axis=-1)                     # [...]
    # branchless one-hot select instead of take_along_axis: dynamic
    # gathers cost ~20ns/row on TPU regardless of row size, and this
    # runs on [T, 21] rotations inside every scanned Adam step
    onehot = (jnp.arange(4, dtype=idx.dtype) == idx[..., None])
    q = jnp.sum(cands * onehot[..., None].astype(cands.dtype), axis=-2)
    # canonicalize sign (w >= 0) and normalize
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_aa(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w,x,y,z) -> axis-angle [..., 3].

    Grad-safe at the identity: the vector norm is computed with the
    double-`where` pattern so no NaN leaks through the unselected
    branch (plain `where(small, ..., theta/norm)` still backprops NaN
    from d norm(0)).
    """
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    v2 = jnp.sum(v * v, axis=-1)
    small = v2 < 1e-12
    safe_v2 = jnp.where(small, 1.0, v2)       # keeps sqrt grad finite
    vn = jnp.sqrt(safe_v2)
    theta = 2.0 * jnp.arctan2(jnp.where(small, 0.0, vn), w)
    # aa = v * theta/|v|; near identity q ~ (1, aa/2) so the limit is 2
    k = jnp.where(small, 2.0, theta / vn)
    return v * k[..., None]


def matrot_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3].

    Robust for all angles incl. near pi (reference used
    tgm.rotation_matrix_to_angle_axis, cvae.py:83).
    """
    return quat_to_aa(matrot_to_quat(R))


def quat_to_matrot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w,x,y,z) -> rotation matrix [..., 3, 3].

    Same formula as the reference's COLMAP qvec2rotmat
    (global_optimization.py:51-61) but batched.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z,
                   2 * z * x + 2 * w * y], axis=-1),
        jnp.stack([2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z,
                   2 * y * z - 2 * w * x], axis=-1),
        jnp.stack([2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x,
                   1 - 2 * x * x - 2 * y * y], axis=-1),
    ], axis=-2)


def matrot_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6]: first two columns, row-major flatten.

    Matches ``xr_mat[:, :, :-1].reshape([-1, 6])`` at
    global_optimization.py:101-102.
    """
    return R[..., :, :2].reshape(R.shape[:-2] + (6,))


def _safe_normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Normalize along the last axis with finite gradients at v=0."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = n2 < 1e-16
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    return jnp.where(small, 0.0, v / n)


def rot6d_to_matrot(r6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] by Gram-Schmidt (cvae.py:62-72)."""
    m = r6.reshape(r6.shape[:-1] + (3, 2))
    a1, a2 = m[..., :, 0], m[..., :, 1]
    b1 = _safe_normalize(a1)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = _safe_normalize(a2 - dot * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def aa_to_rot6d(aa: jnp.ndarray) -> jnp.ndarray:
    return matrot_to_rot6d(aa_to_matrot(aa))


def rot6d_to_aa(r6: jnp.ndarray) -> jnp.ndarray:
    return matrot_to_aa(rot6d_to_matrot(r6))


# ---------------------------------------------------------------------------
# Whole-parameter-vector lifts between the 75-d (axis-angle) and 78-d
# (6D-rotation) layouts (global_optimization.py:96-115). Only the
# global_orient slot [3:6] is re-encoded; everything else passes through.
# ---------------------------------------------------------------------------

def params_to_6d(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 3+3+K] aa layout -> [..., 3+6+K] 6D layout."""
    xt, xr, xb = x[..., :3], x[..., 3:6], x[..., 6:]
    return jnp.concatenate([xt, aa_to_rot6d(xr), xb], axis=-1)


def params_to_3d(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 3+6+K] 6D layout -> [..., 3+3+K] aa layout."""
    xt, xr, xb = x[..., :3], x[..., 3:9], x[..., 9:]
    return jnp.concatenate([xt, rot6d_to_aa(xr), xb], axis=-1)
