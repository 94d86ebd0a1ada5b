"""Per-frame fitting and sequential smoothing (reference C2,
FittingOP at optimization.py:94-350).

The reference re-fits each frame's SMPLify-X output with 50 Adam steps
(lr 0.1): frame 0 to itself (rec + VPoser prior), frame t with an
extra L1 pull of its betas+pose slice toward frame t-1's result
(smoothing_loss x5, optimization.py:173-183,227), or toward a GRU
motion-prior prediction (fitting_motion_smoothing, :240-274). That
outer loop is strictly sequential (frame t needs t-1's result).

TPU-first rebuild:
  * ``fit_independent`` — the no-smoothing fit vmapped over ALL frames
    at once (one compiled program, hundreds of frames per step);
  * ``fit_sequential`` — the exact sequential semantics as ONE
    lax.scan over frames whose body runs the 50 inner Adam steps (and
    carries the Adam moments across frames like the reference's single
    persistent optimizer, optimization.py:126);
  * ``fit_sequential_motion`` — the GRU-motion-prior variant, with the
    encoder/decoder hidden states threaded through the same scan.

All functions operate on the 78-d (6D-rotation) parameter layout and
return 75-d results.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from fpv4d.config import FrameFitConfig
from fpv4d.core import rotations
from fpv4d.models import params as P
from fpv4d.models import motion_gru
from fpv4d.ops import losses


def _frame_loss(x_6d: jnp.ndarray, target_6d: jnp.ndarray,
                weights) -> jnp.ndarray:
    """rec (L1 in 6D space) + VPoser latent prior
    (optimization.py:155-163). Operates on a single [78] vector."""
    rec = weights.rec * losses.l1(target_6d, x_6d)
    body_75 = rotations.params_to_3d(x_6d[None])[0]
    a, b = P.VPOSER_SLICE
    prior = weights.vposer * jnp.mean(body_75[a:b] ** 2)
    return rec + prior


def _smooth_term(x_6d: jnp.ndarray, prev_6d: jnp.ndarray) -> jnp.ndarray:
    """L1 pull of the betas+pose slice toward the previous frame
    (slice [9:51] of the 78-d layout; optimization.py:182)."""
    a, b = P.SMOOTH_SLICE_6D
    return losses.l1(prev_6d[a:b], x_6d[a:b])


def _adam_steps(loss_fn, x, opt, opt_state, num_iter: int):
    def step(carry, _):
        x, opt_state = carry
        loss, g = jax.value_and_grad(loss_fn)(x)
        updates, opt_state = opt.update(g, opt_state, x)
        x = optax.apply_updates(x, updates)
        return (x, opt_state), loss

    (x, opt_state), hist = jax.lax.scan(step, (x, opt_state), None,
                                        length=num_iter)
    return x, opt_state, hist


def fit_independent(body_75: jnp.ndarray,
                    config: FrameFitConfig = FrameFitConfig()
                    ) -> jnp.ndarray:
    """Re-fit every frame independently (fitting(),
    optimization.py:185-208) — vmapped over the whole clip. [T,75] ->
    [T,75]."""
    target_6d = rotations.params_to_6d(body_75)
    opt = optax.adam(config.lr)

    def fit_one(t6):
        loss_fn = lambda x: _frame_loss(x, t6, config.weights)
        x, _, _ = _adam_steps(loss_fn, t6, opt, opt.init(t6),
                              config.num_iter)
        return x

    fitted = jax.vmap(fit_one)(target_6d)
    return rotations.params_to_3d(fitted)


def fit_sequential(body_75: jnp.ndarray,
                   config: FrameFitConfig = FrameFitConfig()
                   ) -> jnp.ndarray:
    """Exact sequential smoothing semantics (the __main__ driver loop,
    optimization.py:334-348) as one compiled lax.scan. [T,75] ->
    [T,75].

    Frame 0: rec + prior. Frame t>0: + smooth_mult x L1 toward the
    PREVIOUS FITTED frame. Adam moments persist across frames (the
    reference reuses one optimizer instance)."""
    target_6d = rotations.params_to_6d(body_75)
    opt = optax.adam(config.lr)
    opt_state0 = opt.init(target_6d[0])

    def fit_frame(carry, inp):
        prev_6d, opt_state = carry
        t6, w_smooth = inp

        def loss_fn(x):
            base = _frame_loss(x, t6, config.weights)
            return base + w_smooth * config.smooth_mult \
                * _smooth_term(x, prev_6d)

        x, opt_state, _ = _adam_steps(loss_fn, t6, opt, opt_state,
                                      config.num_iter)
        return (jax.lax.stop_gradient(x), opt_state), x

    T = target_6d.shape[0]
    w = jnp.ones(T).at[0].set(0.0)      # frame 0 has no predecessor
    (_, _), fitted = jax.lax.scan(fit_frame,
                                  (target_6d[0], opt_state0),
                                  (target_6d, w))
    return rotations.params_to_3d(fitted)


def fit_sequential_motion(body_75: jnp.ndarray,
                          gru_params: Dict[str, jnp.ndarray],
                          config: FrameFitConfig = FrameFitConfig()
                          ) -> jnp.ndarray:
    """GRU-motion-prior variant (fitting_motion_smoothing,
    optimization.py:240-274): the prior pulls the decoded VPoser
    latent toward the GRU's next-pose prediction from the previous
    fitted frame; encoder/decoder hidden states thread through the
    scan (:251-257)."""
    target_6d = rotations.params_to_6d(body_75)
    opt = optax.adam(config.lr)
    opt_state0 = opt.init(target_6d[0])
    a75, b75 = P.VPOSER_SLICE

    def fit_frame(carry, inp):
        prev_75, opt_state, h_enc, h_dec = carry
        t6, w_motion = inp

        pose_prev = prev_75[a75:b75][None]           # [1, 32]
        pred, h_enc_n, h_dec_n = motion_gru.forward_seq(
            gru_params, pose_prev, seq_length=1, h_enc=h_enc,
            h_dec=h_dec)
        # frame 0 (w_motion=0) makes NO gru step in the reference —
        # fitting() handles it and the hidden states stay zero until
        # frame 1 (optimization.py:146-149,251-257). Masking only the
        # loss would still advance h_enc/h_dec on the UNFITTED target
        # pose and condition every later prediction on that spurious
        # step, so the state update is masked too.
        h_enc = jnp.where(w_motion > 0, h_enc_n, h_enc)
        h_dec = jnp.where(w_motion > 0, h_dec_n, h_dec)
        pose_pred = jax.lax.stop_gradient(pred[0, :, -1])

        def loss_fn(x):
            base = _frame_loss(x, t6, config.weights)
            body_75x = rotations.params_to_3d(x[None])[0]
            motion = losses.l1(body_75x[a75:b75], pose_pred)
            return base + w_motion * motion

        x, opt_state, _ = _adam_steps(loss_fn, t6, opt, opt_state,
                                      config.num_iter)
        x75 = rotations.params_to_3d(x[None])[0]
        return (jax.lax.stop_gradient(x75), opt_state, h_enc, h_dec), x75

    T = target_6d.shape[0]
    w = jnp.ones(T).at[0].set(0.0)
    init_75 = rotations.params_to_3d(target_6d[0][None])[0]
    (_, _, _, _), fitted = jax.lax.scan(
        fit_frame,
        (init_75, opt_state0,
         jnp.zeros((1, motion_gru.H_ENC)),
         jnp.zeros((1, motion_gru.H_DEC))),
        (target_6d, w))
    return fitted
