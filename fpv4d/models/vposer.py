"""Pure-JAX VPoser (v1 "snapshot") pose prior.

Replaces human_body_prior's ``load_vposer(...).decode(latent,
output_type='aa')`` used throughout the reference
(global_optimization.py:153,270-271; vis.py:297,315). Architecture is
the published VPoser v1 decoder: 32-d latent -> Linear(512) ->
leaky_relu -> Linear(512) -> leaky_relu -> Linear(21*6) -> continuous
6D rotation decode -> 21 axis-angle body-joint rotations (63-d).

Weights: ``random_params`` gives a deterministic stand-in (the real
checkpoint is licensed); ``params_from_torch_state_dict`` converts a
real VPoser snapshot if the user provides one.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from fpv4d.core.rotations import rot6d_to_aa, aa_to_rot6d

LATENT_DIM = 32
HIDDEN_DIM = 512
NUM_JOINTS = 21


def random_params(seed: int = 0, scale: float = 0.05,
                  dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Deterministic random decoder weights (He-style init, damped so a
    unit-Gaussian latent decodes to plausible small joint rotations)."""
    rng = np.random.RandomState(seed)

    def lin(fan_in, fan_out, s):
        w = rng.randn(fan_in, fan_out).astype(np.float32)
        w *= s / np.sqrt(fan_in)
        b = np.zeros(fan_out, dtype=np.float32)
        return jnp.asarray(w, dtype=dtype), jnp.asarray(b, dtype=dtype)

    w1, b1 = lin(LATENT_DIM, HIDDEN_DIM, 1.0)
    w2, b2 = lin(HIDDEN_DIM, HIDDEN_DIM, 1.0)
    w3, b3 = lin(HIDDEN_DIM, NUM_JOINTS * 6, scale)
    # bias the 6D output toward identity rotations (cols of I)
    ident6 = aa_to_rot6d(jnp.zeros(3)).reshape(-1)
    b3 = b3 + jnp.tile(ident6, NUM_JOINTS).astype(dtype)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3}


def params_from_torch_state_dict(sd) -> Dict[str, jnp.ndarray]:
    """Convert a human_body_prior VPoser v1 state dict (torch tensors
    or numpy arrays keyed bodyprior_dec_fc1/fc2/out) to our params."""
    def arr(v):
        return jnp.asarray(np.asarray(v), dtype=jnp.float32)

    return {
        "w1": arr(sd["bodyprior_dec_fc1.weight"]).T,
        "b1": arr(sd["bodyprior_dec_fc1.bias"]),
        "w2": arr(sd["bodyprior_dec_fc2.weight"]).T,
        "b2": arr(sd["bodyprior_dec_fc2.bias"]),
        "w3": arr(sd["bodyprior_dec_out.weight"]).T,
        "b3": arr(sd["bodyprior_dec_out.bias"]),
    }


def decode(params: Dict[str, jnp.ndarray], latent: jnp.ndarray,
           output_type: str = "aa") -> jnp.ndarray:
    """latent [..., 32] -> body pose.

    output_type 'aa' -> [..., 63] axis-angle (the reference reshapes
    decode output to [B, 63], global_optimization.py:270-271);
    'matrot' -> [..., 21, 3, 3].
    """
    h = jax.nn.leaky_relu(latent @ params["w1"] + params["b1"], 0.2)
    h = jax.nn.leaky_relu(h @ params["w2"] + params["b2"], 0.2)
    r6 = (h @ params["w3"] + params["b3"])
    r6 = r6.reshape(r6.shape[:-1] + (NUM_JOINTS, 6))
    if output_type == "matrot":
        from fpv4d.core.rotations import rot6d_to_matrot
        return rot6d_to_matrot(r6)
    aa = rot6d_to_aa(r6)
    return aa.reshape(aa.shape[:-2] + (NUM_JOINTS * 3,))


def latent_prior_loss(latent: jnp.ndarray) -> jnp.ndarray:
    """mean(latent^2) — the VPoser L2 prior the reference applies to
    the 32-d slice (global_optimization.py:261-263, optimization.py:161-162)."""
    return jnp.mean(latent ** 2)
