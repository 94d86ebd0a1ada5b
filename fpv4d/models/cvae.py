"""Scene-conditioned CVAE over flat body parameters.

JAX rebuild of the reference's HumanCVAE network (cvae.py:99-186):
encoder/decoder MLPs with swish activations and residual links mapping
(n_dim_body-d body vector, n_dim_scene-d scene latent) <-> latentD-d
latent. The reference only exercises the static codec methods of its
class (cvae.py:100-103) — those live in fpv4d.models.params here — but
the generative network itself is part of the component inventory
(SURVEY.md C4), so it is provided in full, functional form.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

LATENT_D = 64
N_DIM_BODY = 72
N_DIM_SCENE = 128


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def random_params(latent_d: int = LATENT_D, n_dim_body: int = N_DIM_BODY,
                  n_dim_scene: int = N_DIM_SCENE, seed: int = 0,
                  dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    rng = np.random.RandomState(seed)

    def lin(fi, fo):
        s = 1.0 / np.sqrt(fi)
        return (jnp.asarray(rng.uniform(-s, s, (fi, fo)), dtype=dtype),
                jnp.zeros(fo, dtype=dtype))

    n_in = n_dim_body + n_dim_scene
    p = {}
    p["enc_fc1_w"], p["enc_fc1_b"] = lin(n_in, latent_d)
    p["enc_fc2_w"], p["enc_fc2_b"] = lin(latent_d, latent_d)
    p["enc_fc3_w"], p["enc_fc3_b"] = lin(latent_d, latent_d)
    p["enc_mu_w"], p["enc_mu_b"] = lin(latent_d, latent_d)
    p["enc_ls_w"], p["enc_ls_b"] = lin(latent_d, latent_d)
    p["dec_fc1_w"], p["dec_fc1_b"] = lin(latent_d + n_dim_scene, latent_d)
    p["dec_fc2_w"], p["dec_fc2_b"] = lin(latent_d, latent_d)
    p["dec_fc3_w"], p["dec_fc3_b"] = lin(latent_d, n_dim_body)
    return p


def encode(p: Dict[str, jnp.ndarray], x_body: jnp.ndarray,
           z_s: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(body [B,72], scene [B,128]) -> (mu, logsigma2), with the
    residual links of cvae.py:143-145."""
    h = jnp.concatenate([x_body, z_s], axis=-1)
    h = swish(h @ p["enc_fc1_w"] + p["enc_fc1_b"])
    h = swish(h @ p["enc_fc2_w"] + p["enc_fc2_b"]) + h
    h = swish(h @ p["enc_fc3_w"] + p["enc_fc3_b"]) + h
    mu = h @ p["enc_mu_w"] + p["enc_mu_b"]
    logsigma2 = h @ p["enc_ls_w"] + p["enc_ls_b"]
    return mu, logsigma2


def decode(p: Dict[str, jnp.ndarray], z: jnp.ndarray,
           z_s: jnp.ndarray, dropout_ratio: float = 0.0,
           rng: jnp.ndarray | None = None) -> jnp.ndarray:
    """(latent [B,64], scene [B,128]) -> body [B,72] (cvae.py:153-171).

    dropout_ratio > 0 applies inverted dropout after the first two
    decoder layers exactly where the reference's nn.Dropout sits
    (cvae.py:160-166; train-mode only there, and dead in its pipeline
    — the class is never constructed with dropout > 0). Functional
    form: pass an explicit `rng` key; with rng=None the knob is
    inference-mode (identity), matching torch eval() semantics."""
    h = jnp.concatenate([z, z_s], axis=-1)

    def drop(x, key):
        if dropout_ratio <= 0.0 or key is None:
            return x
        keep = 1.0 - dropout_ratio
        m = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(m, x / keep, 0.0)

    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)
    h = drop(swish(h @ p["dec_fc1_w"] + p["dec_fc1_b"]), k1)
    h = drop(swish(h @ p["dec_fc2_w"] + p["dec_fc2_b"]) + h, k2)
    return h @ p["dec_fc3_w"] + p["dec_fc3_b"]


def forward(p: Dict[str, jnp.ndarray], x_body: jnp.ndarray,
            eps: jnp.ndarray, z_s: jnp.ndarray,
            dropout_ratio: float = 0.0,
            rng: jnp.ndarray | None = None
            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reparameterized autoencode (cvae.py:174-186)."""
    mu, logsigma2 = encode(p, x_body, z_s)
    z = eps * jnp.exp(logsigma2 / 2.0) + mu
    return decode(p, z, z_s, dropout_ratio, rng), mu, logsigma2


def kl_loss(mu: jnp.ndarray, logsigma2: jnp.ndarray) -> jnp.ndarray:
    """Standard VAE KL(q || N(0,I)) term for training the CVAE."""
    return 0.5 * jnp.mean(jnp.sum(
        jnp.exp(logsigma2) + mu ** 2 - 1.0 - logsigma2, axis=-1))
