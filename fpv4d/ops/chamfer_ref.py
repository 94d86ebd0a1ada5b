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

import jax
import jax.numpy as jnp


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 3] x [..., M, 3] -> [..., N, M] squared distances via
    |x|^2 + |y|^2 - 2 x.y (one big MXU matmul).

    HIGHEST precision: TPU matmuls default to single-pass bf16, whose
    ~0.4% relative error on the x.y term flips argmins between close
    candidates (measured 0.06 absolute NN-distance error vs f64 on a
    3cm-spaced scene)."""
    xx = jnp.sum(x * x, axis=-1)                       # [..., N]
    yy = jnp.sum(y * y, axis=-1)                       # [..., M]
    xy = jnp.matmul(x, jnp.swapaxes(y, -1, -2),
                    precision=jax.lax.Precision.HIGHEST)
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


def nn_distance_chunked(x: jnp.ndarray, y: jnp.ndarray,
                        query_chunk: int = 8192,
                        scene_chunk: int = 8192
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Memory-bounded exact NN: stream the scene through a lax.scan of
    chunks, carrying a running (min, argmin); map over query chunks.

    Works at any size without materializing the [Q, M] distance matrix
    (peak temp = query_chunk x scene_chunk). Pure XLA — the fallback
    hot path when the Pallas kernel is unavailable. x [..., 3] any
    leading shape, y [M, 3] -> (dist [...], idx [...])."""
    batch_shape = x.shape[:-1]
    q = x.reshape(-1, 3)
    Q, M = q.shape[0], y.shape[0]
    # adapt chunk sizes down for small problems (tests / tiny scenes)
    query_chunk = min(query_chunk, max(128, -(-Q // 128) * 128))
    scene_chunk = min(scene_chunk, max(128, -(-M // 128) * 128))

    q_pad = -Q % query_chunk
    q = jnp.pad(q, ((0, q_pad), (0, 0)))
    m_pad = -M % scene_chunk
    # pad scene far away so padded rows never win
    y_p = jnp.pad(y, ((0, m_pad), (0, 0)), constant_values=1e15)
    n_sc = y_p.shape[0] // scene_chunk
    y_chunks = y_p.reshape(n_sc, scene_chunk, 3)

    def one_query_chunk(qc):
        qq = jnp.sum(qc * qc, axis=-1)                      # [qc]

        def scan_scene(carry, inp):
            best_d, best_i = carry
            yc, base = inp
            yy = jnp.sum(yc * yc, axis=-1)
            # HIGHEST precision: see pairwise_sqdist
            d = (qq[:, None] + yy[None, :]
                 - 2.0 * jnp.matmul(
                     qc, yc.T,
                     precision=jax.lax.Precision.HIGHEST))  # [qc, sc]
            dmin = d.min(axis=1)
            darg = d.argmin(axis=1).astype(jnp.int32) + base
            better = dmin < best_d
            return (jnp.where(better, dmin, best_d),
                    jnp.where(better, darg, best_i)), None

        init = (jnp.full(qc.shape[0], jnp.inf, dtype=jnp.float32),
                jnp.zeros(qc.shape[0], dtype=jnp.int32))
        bases = jnp.arange(n_sc, dtype=jnp.int32) * scene_chunk
        (d, i), _ = jax.lax.scan(scan_scene, init, (y_chunks, bases))
        return jnp.maximum(d, 0.0), i

    q_blocks = q.reshape(-1, query_chunk, 3)
    d, i = jax.lax.map(one_query_chunk, q_blocks)
    d = d.reshape(-1)[:Q].reshape(batch_shape)
    i = i.reshape(-1)[:Q].reshape(batch_shape)
    return d, i


def chamfer_ref(x: jnp.ndarray, y: jnp.ndarray):
    """Full 4-tuple (dist_x, dist_y, idx_x, idx_y) parity with
    chamfer_python.distChamfer's return contract."""
    d = pairwise_sqdist(x, y)
    return (jnp.maximum(d.min(axis=-1), 0.0),
            jnp.maximum(d.min(axis=-2), 0.0),
            d.argmin(axis=-1).astype(jnp.int32),
            d.argmin(axis=-2).astype(jnp.int32))
