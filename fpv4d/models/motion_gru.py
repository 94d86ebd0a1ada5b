"""GRU motion prior (next-pose prediction in VPoser latent space).

JAX equivalent of the reference's missing external
``MotionGeneration.LocalHumanDynamicsGRUNoise`` (optimization.py:36,
128-141): a GRU encoder over the previous 32-d pose latent and a GRU
decoder that emits the predicted next latent, with a noise input of
``eps_dim``. API mirrors ``forward_seq(pose_prev, seq_length, h_enc,
h_dec) -> (pose_pred, h_enc', h_dec')`` (optimization.py:252-257).

The reference's checkpoint is not in its repo (SURVEY.md section 0
item 3); ``random_params`` provides a deterministic stand-in and
``params_from_torch_state_dict`` a converter hook.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

IN_DIM = 32
H_ENC = 512
H_DEC = 512
EPS_DIM = 32


def _gru_params(rng, in_dim: int, h_dim: int, prefix: str, dtype):
    out = {}
    s = 1.0 / np.sqrt(h_dim)
    for gate in ("r", "z", "n"):
        out[f"{prefix}_w_i{gate}"] = jnp.asarray(
            rng.uniform(-s, s, (in_dim, h_dim)), dtype=dtype)
        out[f"{prefix}_w_h{gate}"] = jnp.asarray(
            rng.uniform(-s, s, (h_dim, h_dim)), dtype=dtype)
        out[f"{prefix}_b_{gate}"] = jnp.zeros(h_dim, dtype=dtype)
    # the n gate keeps its hidden bias separate: torch applies the
    # reset gate to (W_hn h + b_hn), so b_hn cannot be folded with
    # b_in (tests/test_converters.py's torch.nn.GRU oracle)
    out[f"{prefix}_b_hn"] = jnp.zeros(h_dim, dtype=dtype)
    return out


def random_params(seed: int = 0, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    rng = np.random.RandomState(seed)
    p = {}
    p.update(_gru_params(rng, IN_DIM, H_ENC, "enc", dtype))
    p.update(_gru_params(rng, H_ENC + EPS_DIM, H_DEC, "dec", dtype))
    s = 1.0 / np.sqrt(H_DEC)
    p["out_w"] = jnp.asarray(rng.uniform(-s, s, (H_DEC, IN_DIM)), dtype=dtype)
    p["out_b"] = jnp.zeros(IN_DIM, dtype=dtype)
    return p


def _gru_cell(p, prefix: str, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    r = jax.nn.sigmoid(x @ p[f"{prefix}_w_ir"] + h @ p[f"{prefix}_w_hr"]
                       + p[f"{prefix}_b_r"])
    z = jax.nn.sigmoid(x @ p[f"{prefix}_w_iz"] + h @ p[f"{prefix}_w_hz"]
                       + p[f"{prefix}_b_z"])
    # torch convention: the reset gate multiplies the WHOLE hidden
    # contribution INCLUDING its bias — n = tanh(W_in x + b_in
    # + r * (W_hn h + b_hn)); b_hn must stay un-folded
    # (tests/test_converters.py oracle vs torch.nn.GRU)
    n = jnp.tanh(x @ p[f"{prefix}_w_in"] + p[f"{prefix}_b_n"]
                 + r * (h @ p[f"{prefix}_w_hn"] + p[f"{prefix}_b_hn"]))
    return (1.0 - z) * n + z * h


def forward_seq(params: Dict[str, jnp.ndarray],
                pose_prev: jnp.ndarray,
                seq_length: int = 1,
                h_enc: jnp.ndarray = None,
                h_dec: jnp.ndarray = None,
                noise: jnp.ndarray = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Predict the next seq_length pose latents.

    pose_prev [B, 32] (the reference passes [B,32,1]; trailing
    singleton is squeezed), h_enc/h_dec [B, H] (or [B,1,H], squeezed).
    Returns (pose_pred [B, 32, seq_length], h_enc', h_dec') matching
    the reference call-site contract (optimization.py:251-257 takes
    pose_pred[:, :, -1]).
    """
    if pose_prev.ndim == 3:
        pose_prev = pose_prev[..., 0]
    B = pose_prev.shape[0]
    dtype = pose_prev.dtype
    squeeze_back = False
    if h_enc is None:
        h_enc = jnp.zeros((B, H_ENC), dtype=dtype)
    elif h_enc.ndim == 3:
        h_enc, squeeze_back = h_enc[:, 0], True
    if h_dec is None:
        h_dec = jnp.zeros((B, H_DEC), dtype=dtype)
    elif h_dec.ndim == 3:
        h_dec = h_dec[:, 0]
    if noise is None:
        noise = jnp.zeros((B, seq_length, EPS_DIM), dtype=dtype)

    h_enc = _gru_cell(params, "enc", pose_prev, h_enc)

    def step(h_dec, eps):
        h_dec = _gru_cell(params, "dec",
                          jnp.concatenate([h_enc, eps], axis=-1), h_dec)
        pose = h_dec @ params["out_w"] + params["out_b"]
        return h_dec, pose

    h_dec, poses = jax.lax.scan(step, h_dec, jnp.swapaxes(noise, 0, 1))
    pose_pred = jnp.transpose(poses, (1, 2, 0))          # [B, 32, S]
    if squeeze_back:
        h_enc, h_dec = h_enc[:, None], h_dec[:, None]
    return pose_pred, h_enc, h_dec


def params_from_torch_state_dict(sd) -> Dict[str, jnp.ndarray]:
    """Convert a torch GRU checkpoint if the user has one. Expects
    nn.GRU-style keys; splits the stacked (r|z|n) gate matrices."""
    def arr(v):
        return np.asarray(v, dtype=np.float32)

    out = {}
    for prefix, tname in (("enc", "gru_enc"), ("dec", "gru_dec")):
        w_ih = arr(sd[f"{tname}.weight_ih_l0"])   # [3H, in]
        w_hh = arr(sd[f"{tname}.weight_hh_l0"])   # [3H, H]
        b_ih = arr(sd.get(f"{tname}.bias_ih_l0", 0))
        b_hh = arr(sd.get(f"{tname}.bias_hh_l0", 0))
        H = w_hh.shape[1]
        b_ih = np.broadcast_to(b_ih, (3 * H,))
        b_hh = np.broadcast_to(b_hh, (3 * H,))
        for i, gate in enumerate(("r", "z", "n")):
            out[f"{prefix}_w_i{gate}"] = jnp.asarray(
                w_ih[i * H:(i + 1) * H].T)
            out[f"{prefix}_w_h{gate}"] = jnp.asarray(
                w_hh[i * H:(i + 1) * H].T)
            if gate == "n":
                # torch gates n as r*(W_hn h + b_hn): keep the two
                # biases separate (folding them is measurably wrong —
                # caught by the torch.nn.GRU oracle test)
                out[f"{prefix}_b_n"] = jnp.asarray(b_ih[2 * H:3 * H])
                out[f"{prefix}_b_hn"] = jnp.asarray(b_hh[2 * H:3 * H])
            else:
                out[f"{prefix}_b_{gate}"] = jnp.asarray(
                    b_ih[i * H:(i + 1) * H] + b_hh[i * H:(i + 1) * H])
    out["out_w"] = jnp.asarray(arr(sd["out.weight"]).T)
    out["out_b"] = jnp.asarray(arr(sd["out.bias"]))
    return out
