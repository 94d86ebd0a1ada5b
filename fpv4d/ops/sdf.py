"""Scene-SDF collision term (the reference's declared-but-dead knob).

The reference ships ``'weight_collision': 0.5`` in every lossconfig
(global_optimization.py:685, optimization.py:326) and its module
docstrings say the method "is based on the scene sdf and the contact
loss" (global_optimization.py:5) — the PROX lineage penalizes body
vertices penetrating the scene via a precomputed signed distance
field (optimization.py:309 even wires a ``scene_sdf_path``) — but the
published code never computes a collision loss (the mesh_intersection
import is commented out, cvae.py:26). fpv4d completes the contract:

  * ``SdfGrid`` — a dense [Dx, Dy, Dz] signed-distance grid over an
    axis-aligned box (the PROX on-disk format: ``<scene>_sdf.npy``
    plus a json with ``min``/``max``/``dim``), loadable via
    ``load_prox_sdf`` or built synthetically (``plane_sdf``).
  * ``sample`` — trilinear SDF lookup (+ analytic gradient) for
    arbitrary points. Gathers are involved, so this runs at REFRESH
    time, never inside the optimizer scan (TPU dynamic gathers cost
    ~20 ns/row; 783k rows x 8 corners would be ~120 ms/step).
  * ``linearize`` / ``collision_penalty`` — the lazy-refresh pattern
    the contact term already uses: every ``contact_refresh_steps``
    Adam steps the SDF value + gradient are sampled at the current
    vertices; the per-step penalty is the GATHER-FREE linearized
    field  relu(-(s0 + g . (v - v0)))  — exact at the refresh point,
    first-order within the step window, and zero wherever the body is
    outside the scene (sdf > 0), so staleness only matters while
    actively penetrating.
"""
from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SdfGrid:
    """Dense SDF over the box [mins, maxs]; values [Dx, Dy, Dz] f32,
    grid-node convention (node i at mins + i * (maxs-mins)/(D-1))."""
    values: jnp.ndarray
    mins: jnp.ndarray              # [3]
    maxs: jnp.ndarray              # [3]

    def tree_flatten(self):
        return (self.values, self.mins, self.maxs), ()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def load_prox_sdf(json_path: str, npy_path: str) -> SdfGrid:
    """PROX scene-SDF artifacts: json {'min': [3], 'max': [3],
    'dim': D} + flat npy of D^3 values."""
    meta = json.load(open(json_path))
    d = int(meta["dim"])
    vals = np.load(npy_path).reshape(d, d, d).astype(np.float32)
    return SdfGrid(values=jnp.asarray(vals),
                   mins=jnp.asarray(np.asarray(meta["min"], np.float32)
                                    .reshape(3)),
                   maxs=jnp.asarray(np.asarray(meta["max"], np.float32)
                                    .reshape(3)))


def plane_sdf(y0: float = -1.0, extent: float = 6.0, dim: int = 32
              ) -> SdfGrid:
    """Synthetic SDF of the half-space y <= y0 (floor plane): keeps
    everything runnable/testable without PROX artifacts."""
    lin = np.linspace(-extent, extent, dim, dtype=np.float32)
    y = np.broadcast_to(lin[None, :, None], (dim, dim, dim))
    return SdfGrid(values=jnp.asarray((y - y0).astype(np.float32)),
                   mins=jnp.asarray([-extent, -extent, -extent],
                                    jnp.float32),
                   maxs=jnp.asarray([extent, extent, extent],
                                    jnp.float32))


def sample(sdf: SdfGrid, pts: jnp.ndarray
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinear SDF value + analytic gradient at pts [..., 3] ->
    (s [...], g [..., 3]). Points outside the box clamp to it (the
    SDF is extended constantly; gradients flatten there, which biases
    nothing because outside-the-box means far from the scene).

    Contains gathers — refresh-time only, never inside a scan."""
    D = jnp.asarray(sdf.values.shape, jnp.float32)
    cell = (sdf.maxs - sdf.mins) / (D - 1.0)
    u = (pts - sdf.mins) / cell                       # grid coords
    u = jnp.clip(u, 0.0, D - 1.0)
    # clamp the base corner to D-2 in integers (a float epsilon is
    # below f32 ulp once D ~ 2^7, e.g. PROX 256^3 grids, and would
    # round back to D-1, pushing the +1 corners out of bounds)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0,
                  jnp.asarray(sdf.values.shape, jnp.int32) - 2)
    f = jnp.clip(u - i0, 0.0, 1.0)
    ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    def at(dx, dy, dz):
        return sdf.values[ix + dx, iy + dy, iz + dz]

    c000, c100 = at(0, 0, 0), at(1, 0, 0)
    c010, c110 = at(0, 1, 0), at(1, 1, 0)
    c001, c101 = at(0, 0, 1), at(1, 0, 1)
    c011, c111 = at(0, 1, 1), at(1, 1, 1)

    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    s = c0 * (1 - fz) + c1 * fz

    # analytic trilinear gradient (in world units)
    gx = ((c100 - c000) * (1 - fy) + (c110 - c010) * fy) * (1 - fz) \
        + ((c101 - c001) * (1 - fy) + (c111 - c011) * fy) * fz
    gy = (c10 - c00) * (1 - fz) + (c11 - c01) * fz
    gz = c1 - c0
    g = jnp.stack([gx, gy, gz], axis=-1) / cell
    return s, g


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SdfLin:
    """Per-refresh linearization tables: s0 [T,N], g [T,N,3], v0
    [T,N,3] such that sdf(v) ~= s0 + g . (v - v0) near v0."""
    s0: jnp.ndarray
    g: jnp.ndarray
    v0: jnp.ndarray

    def tree_flatten(self):
        return (self.s0, self.g, self.v0), ()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def linearize(sdf: SdfGrid, verts_w: jnp.ndarray) -> SdfLin:
    """Sample the SDF + gradient at the current world vertices
    (refresh-time; contains the gathers)."""
    s0, g = sample(sdf, verts_w)
    return SdfLin(s0=s0, g=g, v0=verts_w)


def collision_penalty(verts_w: jnp.ndarray, lin: SdfLin) -> jnp.ndarray:
    """Mean penetration depth under the linearized SDF — the per-step
    hot-path term: pure fused elementwise, no gathers.

    relu(-sdf) is the standard PROX-style penetration energy; the
    linearization is exact at the refresh point and first-order in
    the drift since."""
    s = lin.s0 + jnp.sum(lin.g * (verts_w - lin.v0), axis=-1)
    return jnp.mean(jax.nn.relu(-s))
