"""Plain-JAX chamfer / nearest-neighbor distances (reference impl).

Ground-truth oracle for the Pallas kernel and a CPU-friendly fallback,
covering the capability of the reference's pure-torch
chamfer_python.distChamfer (Gram-matrix trick, chamfer_python.py:18-28)
and the CUDA ``ext.chamferDist()`` extension
(global_optimization.py:33,292-295). Unlike the reference, the scene
cloud is NOT replicated per frame ([T,S,3] repeat at
global_optimization.py:175-176) — it broadcasts.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 3] x [..., M, 3] -> [..., N, M] squared distances via
    |x|^2 + |y|^2 - 2 x.y (one big MXU matmul)."""
    xx = jnp.sum(x * x, axis=-1)                       # [..., N]
    yy = jnp.sum(y * y, axis=-1)                       # [..., M]
    xy = jnp.matmul(x, jnp.swapaxes(y, -1, -2))        # [..., N, M]
    return xx[..., :, None] + yy[..., None, :] - 2.0 * xy


def nn_distance_ref(x: jnp.ndarray, y: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each point of x, squared distance to (and index of) its
    nearest neighbor in y.

    x [..., N, 3], y [..., M, 3] (y batch dims broadcast) ->
    (dist [..., N], idx [..., N] int32). This is the x->y direction of
    distChamfer's 4-tuple, the only direction the pipeline consumes
    (contact_dist, _ = chamferDist(...), global_optimization.py:293).
    """
    d = pairwise_sqdist(x, y)
    return jnp.maximum(d.min(axis=-1), 0.0), d.argmin(axis=-1).astype(jnp.int32)


def chamfer_ref(x: jnp.ndarray, y: jnp.ndarray):
    """Full 4-tuple (dist_x, dist_y, idx_x, idx_y) parity with
    chamfer_python.distChamfer's return contract."""
    d = pairwise_sqdist(x, y)
    return (jnp.maximum(d.min(axis=-1), 0.0),
            jnp.maximum(d.min(axis=-2), 0.0),
            d.argmin(axis=-1).astype(jnp.int32),
            d.argmin(axis=-2).astype(jnp.int32))
