"""Loss terms of the capture pipeline — pure, jit-safe functions.

Each function mirrors one term of the reference objective (cited), but
is expressed over explicit inputs so the clip solver can fuse
everything into a single compiled step.
"""
from __future__ import annotations

import jax.numpy as jnp

from fpv4d.core.dct import dct_basis

EPS_CONTACT = 1e-4


def rec_l1(target_6d: jnp.ndarray, rec_6d: jnp.ndarray,
           frame_weights: jnp.ndarray) -> jnp.ndarray:
    """Masked L1 reconstruction in 6D-param space.

    frame_weights [T] (0 for outlier frames) — the reference builds a
    [T,78] weight tensor zeroed on outlier rows
    (global_optimization.py:255-259).
    """
    return jnp.mean(jnp.abs(target_6d - rec_6d)
                    * frame_weights[:, None])


def vposer_prior(latent: jnp.ndarray) -> jnp.ndarray:
    """mean(latent^2) (global_optimization.py:261-263)."""
    return jnp.mean(latent ** 2)


def second_order_smoothness(seq: jnp.ndarray) -> jnp.ndarray:
    """mean |d2/dt2 seq| — L1 of the diff-of-diff along axis 0
    (global_optimization.py:266-267; also verts variant :404-405)."""
    d = seq[:-1] - seq[1:]
    return jnp.mean(jnp.abs(d[:-1] - d[1:]))


def first_order_smoothness(seq: jnp.ndarray) -> jnp.ndarray:
    """mean |d/dt seq| — world joint smoothing
    (global_optimization.py:304)."""
    return jnp.mean(jnp.abs(seq[:-1] - seq[1:]))


def robust_contact(dist_sq: jnp.ndarray) -> jnp.ndarray:
    """mean( sqrt(d)/(sqrt(d)+1) ) over all contact verts+frames —
    the saturating contact energy (global_optimization.py:295)."""
    r = jnp.sqrt(dist_sq + EPS_CONTACT)
    return jnp.mean(r / (r + 1.0))


def robust_contact_per_frame(dist_sq: jnp.ndarray) -> jnp.ndarray:
    """[T, N] -> [T]: the per-frame variant used by the (commented)
    alternating contact term of cal_loss2 (global_optimization.py:436,443)."""
    r = jnp.sqrt(dist_sq + EPS_CONTACT)
    return jnp.mean(r / (r + 1.0), axis=-1)


def gm(e: jnp.ndarray) -> jnp.ndarray:
    """Geman-McClure-style saturation e/(e+1)."""
    return e / (e + 1.0)


def dct_trajectory(joints_world: jnp.ndarray, c_dct: jnp.ndarray,
                   window: int = 60) -> jnp.ndarray:
    """Low-frequency DCT trajectory prior (global_optimization.py:232-246).

    joints_world [T, J, 3] with T = num_windows * window;
    c_dct [num_windows, J, 3, K] learned coefficients. For every
    (window, joint, axis): e = (traj - basis @ coeffs)^2,
    obj = sum(e/(e+1)); loss = mean over all objs.
    """
    T, J, _ = joints_world.shape
    W, Jc, _, K = c_dct.shape
    assert W * window == T and Jc <= J
    basis = dct_basis(window, K).astype(joints_world.dtype)   # [window, K]
    traj = joints_world[:, :Jc, :].reshape(W, window, Jc, 3)
    rec = jnp.einsum("tk,wjak->wtja", basis, c_dct)           # [W,window,J,3]
    e = (traj - rec) ** 2
    # sum over the window per (w,j,a); mean over all (w,j,a) objectives
    return jnp.mean(jnp.sum(gm(e), axis=1))


def dct_encode(joints_world: jnp.ndarray, window: int = 60,
               k: int = 5) -> jnp.ndarray:
    """Least-squares DCT coefficients of joint trajectories — closed
    form init for c_dct (the basis is orthonormal, so projection
    suffices). [T,J,3] -> [W,J,3,K]."""
    T, J, _ = joints_world.shape
    W = T // window
    basis = dct_basis(window, k).astype(joints_world.dtype)
    traj = joints_world.reshape(W, window, J, 3)
    return jnp.einsum("tk,wtja->wjak", basis, traj)


def foot_skate(contact_verts_left: jnp.ndarray,
               contact_verts_right: jnp.ndarray,
               weight_right: jnp.ndarray) -> jnp.ndarray:
    """Planted-foot anti-skate term (global_optimization.py:415-429).

    contact_verts_{left,right} [T, Nc, 3] world-space foot vertices;
    weight_right [T] soft probability the right foot is planted.
    Weights below 0.5 are hard-zeroed (reference :421-422); the frame-
    difference of each foot's vertices is L1-penalized in proportion
    to that foot's planted weight.
    """
    w_r = jnp.where(weight_right < 0.5, 0.0, weight_right)
    w_l_full = 1.0 - weight_right
    w_l = jnp.where(w_l_full < 0.5, 0.0, w_l_full)
    diff_l = contact_verts_left[:-1] - contact_verts_left[1:]
    diff_r = contact_verts_right[:-1] - contact_verts_right[1:]
    return (jnp.mean(jnp.abs(diff_l * w_l[1:, None, None]))
            + jnp.mean(jnp.abs(diff_r * w_r[1:, None, None])))


def planted_foot_weight(dist_left: jnp.ndarray,
                        dist_right: jnp.ndarray) -> jnp.ndarray:
    """Soft which-foot-is-planted weight from per-frame mean chamfer.

    Returns weight_right = left/(left+right): large when the RIGHT
    foot is closer to the scene (planted). This implements the
    evident intent of detect_contact — the published code divides by
    (left + left), a constant 0.5 (global_optimization.py:364; see
    SURVEY.md section 0 item 5) — and feeds cal_loss2's
    weight_right/weight_left split (:418-419).
    """
    return dist_left / (dist_left + dist_right + 1e-12)


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Plain mean-L1 (torch F.l1_loss contract, optimization.py:157)."""
    return jnp.mean(jnp.abs(a - b))
