"""Unified nearest-neighbor front-end for the contact hot path.

Three interchangeable implementations of "squared distance from each
query point to its nearest scene point", all sharing one custom VJP
(d/dx |x - y_idx|^2 = 2 (x - y_idx), gathered at the selected
neighbor):

  * 'grid'   — voxel-grid accelerated (the TPU-first default): the
    scene is STATIC across all solver iterations, so we precompute —
    once, on the host — a per-cell table of the K candidate points of
    each cell's 3x3x3 neighborhood, stored as coordinates. A query
    then costs ONE gather of [K, 3] by cell id + a K-way min: no
    27-cell indexing, no second-level indirection. Exact within one
    voxel radius; beyond it the distance saturates to BIG, which
    matches the robust contact energy sqrt(d)/(sqrt(d)+1) ~ 1
    (gradient ~ 0) the pipeline applies (global_optimization.py:295).
  * 'pallas' — the brute-force Pallas MXU kernel (chamfer_pallas).
  * 'xla'    — memory-bounded chunked XLA brute force (chamfer_ref).

All brute-force paths re-compute the final distance EXACTLY at the
winning index in f32 VPU math: the Gram-trick value |x|^2+|y|^2-2x.y
loses ~1e-2 absolute accuracy to MXU bf16 passes; the argmin is
selected from the fast approximate values, then the reported distance
(and the gradient, by construction of the VJP) is exact for that
neighbor.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from fpv4d.ops import chamfer_pallas
from fpv4d.ops.chamfer_ref import nn_distance_chunked, nn_distance_ref

BIG = 1e4   # saturation distance^2 for empty neighborhoods (grid mode)
# bf16 rounding of BIG (9984.0), computed host-side via ml_dtypes so
# module import never touches a device backend (the multichip dryrun
# relies on lazy backend init)
import ml_dtypes  # noqa: E402  (ships with jax)
_BIG_BF16 = float(np.float32(np.asarray(BIG, ml_dtypes.bfloat16)))

_QUERY_BLOCK = 1 << 20   # bounds the [block, K, 3] gather intermediate


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class VoxelGrid:
    """Dense voxel table over the scene bounding box.

    cand_pts[c, k] = coordinates of the k-th candidate point for
    queries landing in cell c (the candidates are the points of the
    cell's 3x3x3 neighborhood, nearest-to-cell-center first, up to K);
    cand_idx holds their original scene indices (-1 = empty slot).
    dims/origin/h are static metadata.
    """
    cand_pts: jnp.ndarray          # [num_cells, K, 3] f32
    cand_idx: jnp.ndarray          # [num_cells, K] int32
    origin: jnp.ndarray            # [3]
    dims: Tuple[int, int, int] = field(compare=False)
    h: float = field(compare=False)

    def tree_flatten(self):
        return (self.cand_pts, self.cand_idx, self.origin), \
            (self.dims, self.h)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        cand_pts, cand_idx, origin = leaves
        dims, h = aux
        return cls(cand_pts=cand_pts, cand_idx=cand_idx, origin=origin,
                   dims=dims, h=h)


def build_voxel_grid(points: np.ndarray, h: float = 0.25,
                     slots_per_cell: int = 32,
                     max_cells: int = 500_000,
                     use_native: bool = True) -> VoxelGrid:
    """Host-side construction (one-time per scene).

    Cell size h == search radius guarantee: any true NN within h of a
    query is found exactly as long as the cell's neighborhood holds at
    most K points (overflowing neighborhoods keep the K points nearest
    to the cell center — voxel-downsample dense scenes first).

    Uses the C++ builder from the native data plane when available
    (the numpy active-cell loop below takes 1.5-3 s at 1e5-5e5 scene
    points vs ~0.1 s native; identical tables up to argsort tie
    order), falling back to the pure-numpy path otherwise."""
    pts = np.ascontiguousarray(points, dtype=np.float32)
    if use_native:
        try:
            from fpv4d.io import native as NAT
            res = NAT.build_cand_tables(pts, h, slots_per_cell,
                                        max_cells)
        except Exception:
            res = None
        if res is not None:
            cand_pts, cand_idx, origin, dims, h_out = res
            return VoxelGrid(cand_pts=jnp.asarray(cand_pts),
                             cand_idx=jnp.asarray(cand_idx),
                             origin=jnp.asarray(origin),
                             dims=dims, h=h_out)
    mins = pts.min(axis=0) - h
    maxs = pts.max(axis=0) + h
    dims = np.maximum(1, np.ceil((maxs - mins) / h).astype(np.int64))
    # coarsen h if the box would exceed the cell budget
    while int(dims.prod()) > max_cells:
        h *= 1.5
        dims = np.maximum(1, np.ceil((maxs - mins) / h).astype(np.int64))
    cells = np.floor((pts - mins) / h).astype(np.int64)
    cells = np.minimum(cells, dims - 1)
    flat = (cells[:, 0] * dims[1] + cells[:, 1]) * dims[2] + cells[:, 2]

    order = np.argsort(flat, kind="stable")
    flat_sorted = flat[order]
    num_cells = int(dims.prod())
    K = slots_per_cell

    starts = np.searchsorted(flat_sorted, np.arange(num_cells), "left")
    ends = np.searchsorted(flat_sorted, np.arange(num_cells), "right")
    counts = ends - starts

    cand_idx = np.full((num_cells, K), -1, dtype=np.int32)
    cand_pts = np.zeros((num_cells, K, 3), dtype=np.float32)

    # neighborhoods of cells that have ANY point within one cell of
    # them: iterate over cells with a nonempty 3x3x3 neighborhood
    dx, dy, dz = np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                             indexing="ij")
    offsets = (dx.ravel() * dims[1] + dy.ravel()) * dims[2] + dz.ravel()
    occupied = np.nonzero(counts > 0)[0]
    # mark all cells whose neighborhood intersects an occupied cell
    neigh_mask = np.zeros(num_cells, dtype=bool)
    cx = occupied // (dims[1] * dims[2])
    cy = (occupied // dims[2]) % dims[1]
    cz = occupied % dims[2]
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                nx = np.clip(cx + ox, 0, dims[0] - 1)
                ny = np.clip(cy + oy, 0, dims[1] - 1)
                nz = np.clip(cz + oz, 0, dims[2] - 1)
                neigh_mask[(nx * dims[1] + ny) * dims[2] + nz] = True
    active = np.nonzero(neigh_mask)[0]

    half = h * 0.5
    for c in active:
        x, y, z = (c // (dims[1] * dims[2]),
                   (c // dims[2]) % dims[1], c % dims[2])
        idxs = []
        for ox in (-1, 0, 1):
            nx = x + ox
            if nx < 0 or nx >= dims[0]:
                continue
            for oy in (-1, 0, 1):
                ny = y + oy
                if ny < 0 or ny >= dims[1]:
                    continue
                for oz in (-1, 0, 1):
                    nz = z + oz
                    if nz < 0 or nz >= dims[2]:
                        continue
                    n = (nx * dims[1] + ny) * dims[2] + nz
                    if counts[n]:
                        idxs.append(order[starts[n]:ends[n]])
        if not idxs:
            continue
        idxs = np.concatenate(idxs)
        if len(idxs) > K:
            center = mins + (np.array([x, y, z]) + 0.5) * h
            d2 = ((pts[idxs] - center) ** 2).sum(1)
            idxs = idxs[np.argsort(d2)[:K]]
        cand_idx[c, :len(idxs)] = idxs
        cand_pts[c, :len(idxs)] = pts[idxs]

    return VoxelGrid(cand_pts=jnp.asarray(cand_pts),
                     cand_idx=jnp.asarray(cand_idx),
                     origin=jnp.asarray(mins, dtype=jnp.float32),
                     dims=(int(dims[0]), int(dims[1]), int(dims[2])),
                     h=float(h))


def build_voxel_grid_batch(scenes, h: float = 0.25,
                           slots_per_cell: int = 32,
                           max_cells: int = 500_000) -> VoxelGrid:
    """Batched grids for a multi-clip solve: one VoxelGrid whose
    leaves carry a leading clip axis [C, ...]. All clips share the
    same (dims, h) metadata — dims are the per-axis maxima, h the
    coarsest chosen by any clip — so the batched structure vmaps
    cleanly (static aux, batched leaves)."""
    built = []
    h_common = h
    for s in scenes:
        g = build_voxel_grid(np.asarray(s), h=h_common,
                             slots_per_cell=slots_per_cell,
                             max_cells=max_cells)
        h_common = max(h_common, g.h)
        built.append(g)
    if any(g.h != h_common for g in built):     # rebuild at common h
        built = [build_voxel_grid(np.asarray(s), h=h_common,
                                  slots_per_cell=slots_per_cell,
                                  max_cells=max_cells) for s in scenes]
    dims = tuple(int(max(g.dims[a] for g in built)) for a in range(3))
    num_cells = dims[0] * dims[1] * dims[2]
    K = slots_per_cell
    C = len(built)
    pts = np.zeros((C, num_cells, K, 3), np.float32)
    idx = np.full((C, num_cells, K), -1, np.int32)
    origins = np.zeros((C, 3), np.float32)
    for c, g in enumerate(built):
        # re-scatter the per-clip table into the common-dims layout,
        # EDGE-replicating into the padding: the query path clamps
        # cells against the COMMON dims, so a query past this clip's
        # own bbox must land on a copy of its edge cell — exactly the
        # single-clip grid's clamp semantics. Zero-padding instead
        # gave such queries an empty cell (distance BIG, zero
        # gradient), silently diverging fleet solves from single-clip
        # ones for bodies near a smaller clip's scene boundary.
        gd = g.dims
        pad = tuple((0, dims[a] - gd[a]) for a in range(3))
        src_pts = np.asarray(g.cand_pts).reshape(gd + (K, 3))
        src_idx = np.asarray(g.cand_idx).reshape(gd + (K,))
        pts[c] = np.pad(src_pts, pad + ((0, 0), (0, 0)),
                        mode="edge").reshape(num_cells, K, 3)
        idx[c] = np.pad(src_idx, pad + ((0, 0),),
                        mode="edge").reshape(num_cells, K)
        origins[c] = np.asarray(g.origin)
    return VoxelGrid(cand_pts=jnp.asarray(pts), cand_idx=jnp.asarray(idx),
                     origin=jnp.asarray(origins), dims=dims, h=h_common)


def grid_axes(grid: VoxelGrid) -> VoxelGrid:
    """vmap in_axes spec mapping the leading clip axis of a batched
    VoxelGrid (leaves axis 0; static aux shared)."""
    return VoxelGrid(cand_pts=0, cand_idx=0, origin=0,
                     dims=grid.dims, h=grid.h)


def _grid_forward_block(grid: VoxelGrid, q: jnp.ndarray):
    """q [B, 3] -> (dist_sq [B], idx [B] int32 (-1 if empty),
    nearest [B, 3] coords of the winner, = q where empty)."""
    dims = jnp.asarray(grid.dims, dtype=jnp.int32)
    cell = jnp.floor((q - grid.origin) / grid.h).astype(jnp.int32)
    cell = jnp.clip(cell, 0, dims - 1)
    flat = (cell[:, 0] * grid.dims[1] + cell[:, 1]) \
        * grid.dims[2] + cell[:, 2]                        # [B]
    pts = grid.cand_pts[flat]                              # [B, K, 3]
    cand = grid.cand_idx[flat]                             # [B, K]
    d = jnp.sum((q[:, None, :] - pts) ** 2, axis=-1)
    d = jnp.where(cand >= 0, d, BIG)
    slot = jnp.argmin(d, axis=-1)
    dist = jnp.take_along_axis(d, slot[:, None], axis=-1)[:, 0]
    idx = jnp.take_along_axis(cand, slot[:, None], axis=-1)[:, 0]
    idx = jnp.where(dist >= BIG, -1, idx)
    nearest = jnp.take_along_axis(
        pts, slot[:, None, None].repeat(3, -1), axis=1)[:, 0]
    nearest = jnp.where((idx >= 0)[:, None], nearest, q)
    return jnp.minimum(dist, BIG), idx, nearest


def _grid_forward(grid: VoxelGrid, q: jnp.ndarray):
    """q [..., 3] -> (dist_sq [...], idx [...], nearest [..., 3]).
    Processes queries in blocks so the [block, K, 3] gather stays
    bounded at extreme sizes."""
    batch_shape = q.shape[:-1]
    qf = q.reshape(-1, 3)
    Q = qf.shape[0]
    if Q <= _QUERY_BLOCK:
        d, i, n = _grid_forward_block(grid, qf)
        return (d.reshape(batch_shape), i.reshape(batch_shape),
                n.reshape(batch_shape + (3,)))
    pad = -Q % _QUERY_BLOCK
    qf = jnp.pad(qf, ((0, pad), (0, 0)))
    blocks = qf.reshape(-1, _QUERY_BLOCK, 3)
    d, i, n = jax.lax.map(lambda b: _grid_forward_block(grid, b), blocks)
    return (d.reshape(-1)[:Q].reshape(batch_shape),
            i.reshape(-1)[:Q].reshape(batch_shape),
            n.reshape(-1, 3)[:Q].reshape(batch_shape + (3,)))


def grid_min_dist(grid: VoxelGrid, q: jnp.ndarray) -> jnp.ndarray:
    """Distance-only voxel NN for the loss hot path: q [..., 3] ->
    dist_sq [...]. Plain XLA autodiff (measured ~10x cheaper than the
    equivalent custom-VJP formulation on TPU: the backward of
    gather+min is a masked elementwise op that XLA fuses for free)."""
    batch_shape = q.shape[:-1]
    qf = q.reshape(-1, 3)
    dims = jnp.asarray(grid.dims, dtype=jnp.int32)
    cell = jnp.clip(jnp.floor((qf - grid.origin) / grid.h)
                    .astype(jnp.int32), 0, dims - 1)
    flat = (cell[:, 0] * grid.dims[1] + cell[:, 1]) \
        * grid.dims[2] + cell[:, 2]
    pts = grid.cand_pts[flat]                              # [B, K, 3]
    valid = grid.cand_idx[flat] >= 0
    d = jnp.sum((qf[:, None, :] - pts) ** 2, axis=-1)
    d = jnp.where(valid, d, BIG)
    return jnp.minimum(jnp.min(d, axis=-1), BIG).reshape(batch_shape)


_FILL_CELL = jnp.int32(2 ** 30)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class FrameCands:
    """Per-frame candidate point sets for the lazy-refresh contact NN:
    cand [T, P, 3] scene points near frame t's contact vertices,
    valid [T, P] mask. Built by frame_candidates() at refresh points
    (outside the optimizer scan); consumed by nn_to_candidates() every
    step."""
    cand: jnp.ndarray
    valid: jnp.ndarray

    def tree_flatten(self):
        return (self.cand, self.valid), ()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def frame_candidates(grid: VoxelGrid, q: jnp.ndarray,
                     budget: int = 64) -> FrameCands:
    """Gather each frame's candidate scene points from the voxel grid:
    q [T, N, 3] -> FrameCands with P = budget * K points per frame
    (the tables of the frame's <= budget unique occupied cells).

    TPU dynamic gathers cost ~20ns per row regardless of row size and
    sorts (jnp.unique) are similarly expensive, so this runs OUTSIDE
    the optimizer scan — once per refresh interval — while the
    per-step loss only touches the [T, P, 3] result (see
    nn_to_candidates). Queries drifting > h beyond the refresh-time
    cells lose exactness until the next refresh (the robust contact
    energy's far-field gradient is ~0, so staleness is benign).
    """
    T, N, _ = q.shape
    K = grid.cand_pts.shape[-2]
    dims = jnp.asarray(grid.dims, dtype=jnp.int32)
    cell = jnp.clip(jnp.floor((q - grid.origin) / grid.h)
                    .astype(jnp.int32), 0, dims - 1)
    flat = (cell[..., 0] * grid.dims[1] + cell[..., 1]) \
        * grid.dims[2] + cell[..., 2]                      # [T, N]
    uniq = jax.vmap(
        lambda f: jnp.unique(f, size=budget, fill_value=_FILL_CELL)
    )(flat)                                                # [T, B]
    num_cells = grid.cand_pts.shape[-3]
    safe_u = jnp.minimum(uniq, num_cells - 1)
    cand = grid.cand_pts[safe_u].reshape(T, budget * K, 3)
    valid = (grid.cand_idx[safe_u] >= 0).reshape(T, budget * K) \
        & (uniq < _FILL_CELL).repeat(K, axis=-1)
    return FrameCands(cand=cand, valid=valid)


def frame_candidates_folded(grid_b: VoxelGrid, q_flat: jnp.ndarray,
                            C: int, budget: int = 64) -> FrameCands:
    """frame_candidates over a BATCHED VoxelGrid with the clips axis
    folded into frames: q_flat [C*T, N, 3] against grid_b (leaves
    [C, ...], shared static dims/h from build_voxel_grid_batch) ->
    FrameCands [C*T, P, ...].

    The clips-vmapped form gathers each clip's rows from its OWN
    table — a batched gather, which TPUs lower badly (the fleet's
    batched refresh measured ~6x the per-clip single cost). Folding
    concatenates the per-clip tables row-wise and offsets each
    frame's cell ids by its clip's table start, so ONE flat row
    gather serves every clip — the single-clip lowering. Exact: the
    offset indexes the identical per-clip rows. Only for one-device
    meshes (on a real mesh the per-shard tables never batch)."""
    CT, N, _ = q_flat.shape
    T = CT // C
    K = grid_b.cand_pts.shape[-2]
    num_cells = grid_b.cand_pts.shape[-3]
    dims = jnp.asarray(grid_b.dims, dtype=jnp.int32)
    origin_f = jnp.repeat(grid_b.origin, T, axis=0)        # [CT, 3]
    cell = jnp.clip(
        jnp.floor((q_flat - origin_f[:, None, :]) / grid_b.h)
        .astype(jnp.int32), 0, dims - 1)
    flat = (cell[..., 0] * grid_b.dims[1] + cell[..., 1]) \
        * grid_b.dims[2] + cell[..., 2]                    # [CT, N]
    uniq = jax.vmap(
        lambda f: jnp.unique(f, size=budget, fill_value=_FILL_CELL)
    )(flat)                                                # [CT, B]
    offs = jnp.repeat(
        jnp.arange(C, dtype=jnp.int32) * num_cells, T)     # [CT]
    safe_u = jnp.minimum(uniq, num_cells - 1) + offs[:, None]
    pts_flat = grid_b.cand_pts.reshape(C * num_cells, K, 3)
    idx_flat = grid_b.cand_idx.reshape(C * num_cells, K)
    cand = pts_flat[safe_u].reshape(CT, budget * K, 3)
    valid = (idx_flat[safe_u] >= 0).reshape(CT, budget * K) \
        & (uniq < _FILL_CELL).repeat(K, axis=-1)
    return FrameCands(cand=cand, valid=valid)


def compact_candidates(q: jnp.ndarray, fc: FrameCands,
                       P_out: int) -> FrameCands:
    """Shrink a frame's candidate table to the `P_out` candidates most
    contended to be some query's nearest neighbor.

    score[t, p] = min_n ( d(q[t,n], cand[t,p]) - d_nn(q[t,n]) ): it is
    exactly 0 for every candidate that IS some query's NN and grows
    with how far the candidate is from ever winning. Keeping the
    P_out smallest therefore keeps EVERY distinct refresh-time NN
    whenever they number <= P_out (tested exactness property); a
    dropped candidate can only matter for a query that drifts toward
    it before the next refresh, where the distance error is bounded by
    the local candidate spacing — the same benign-staleness regime the
    lazy-refresh tables already accept (frame_candidates docstring).
    Runs at refresh time, outside the optimizer scan: the per-step
    [T, N, P] contact pass (nn_to_candidates) then reads a table
    P/P_out-times smaller. Scoring uses the same bf16 selection pass
    as the per-step NN (ranking only — near-tie drift just reorders
    which redundant near-candidates survive); selection is one
    top_k + the factored one-hot extraction (no row gathers).

    P_out >= P returns fc unchanged. Invalid slots score +inf, so they
    are kept only when fewer than P_out valid candidates exist — and
    then keep their valid=False flag.
    """
    P = fc.cand.shape[-2]
    if P_out >= P:
        return fc
    qb = q.astype(jnp.bfloat16)
    cb = fc.cand.astype(jnp.bfloat16)
    d = _dist_sq_tnp(qb, cb)                               # [T, N, P]
    d = jnp.where(fc.valid[:, None, :], d,
                  jnp.asarray(BIG, jnp.bfloat16))
    dnn = jnp.min(d, axis=-1, keepdims=True)               # [T, N, 1]
    score = jnp.min(d - dnn, axis=1).astype(jnp.float32)   # [T, P]
    score = jnp.where(fc.valid, score, jnp.inf)
    _, idx = jax.lax.top_k(-score, P_out)                  # [T, P_out]
    # payload = coords + validity in one channel: ONE factored one-hot
    # selection (_select_nearest is last-dim generic) instead of a
    # [T*P_out]-row gather (~20 ns/row on TPU)
    payload = jnp.concatenate(
        [fc.cand, fc.valid.astype(jnp.float32)[..., None]], -1)
    sel = _select_nearest(idx, payload)                    # [T,P_out,4]
    return FrameCands(cand=sel[..., :3], valid=sel[..., 3] > 0.5)


from jax import custom_batching as _custom_batching  # noqa: E402


def _flatten_clips_vmap_rule(core):
    """custom_vmap rule folding a mapped clips axis into the frame
    axis: the per-frame candidate NN is frame-independent, so
    vmap(nn)([C,T,...]) computes EXACTLY nn([C*T,...]) — but the
    batched lowering of the one-hot selection einsums (two batch dims)
    measured 4.56 ms/step/clip against the flat form's 1.89 at fleet
    shapes (tools/ablate_fleet.py, r4): the extra batch dim forces
    layout copies around the batched dots. Flattening restores the
    single-clip lowering for every vmapped caller (the multi-clip
    fleet, sharded phase programs). `core` returns a tuple of
    per-frame arrays; the rule is attached to the shared forward cores
    (the public functions stay plain custom_vjp so direct grad works —
    custom_vmap has no reverse-mode rule of its own)."""
    def rule(axis_size, in_batched, q, cands):
        q_b, cands_b = in_batched
        if not q_b:
            q = jnp.broadcast_to(q, (axis_size,) + q.shape)
        cands = jax.tree.map(
            lambda x, b: x if b else jnp.broadcast_to(
                x, (axis_size,) + x.shape), cands, cands_b)
        T = q.shape[1]
        qf = q.reshape((-1,) + q.shape[2:])
        candsf = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), cands)
        outs = core(qf, candsf)
        outs = tuple(o.reshape((axis_size, T) + o.shape[1:])
                     for o in outs)
        return outs, tuple(True for _ in outs)
    return rule


def _cand_core(q, cands):
    """(distance, winner coords) — the shared fwd work of the f32
    candidate NN (primal + custom_vjp fwd)."""
    d, slot = _cand_forward(q, cands)
    return d, _select_nearest(slot, cands.cand)


_cand_flat = _custom_batching.custom_vmap(_cand_core)
_cand_flat.def_vmap(_flatten_clips_vmap_rule(_cand_core))


@jax.custom_vjp
def nn_to_candidates(q: jnp.ndarray, cands: FrameCands) -> jnp.ndarray:
    """q [T, N, 3] vs per-frame candidates -> squared NN distance
    [T, N] (BIG where a frame has no valid candidates).

    The per-step contact hot path: a VPU-fused broadcast-subtract-min
    over [T, N, P] with NO gathers or sorts; the VJP extracts the
    winning candidate's coordinates with a one-hot MXU matmul instead
    of a per-query gather (the gather would cost more than the whole
    distance computation at clip scale). Under vmap the clips axis
    folds into the frame axis (_flatten_clips_vmap_rule).
    """
    d, _ = _cand_flat(q, cands)
    return d


def _dist_sq_tnp(q, cand):
    """Squared distances [T, N, P] with the xyz axis UNROLLED into
    three elementwise [T, N, P] terms. The naive
    sum((q[:,:,None,:] - c[:,None,:,:])**2, -1) makes XLA materialize
    the [T, N, P, 3] subtract intermediate (~2.4 GB at bench shapes)
    because the length-3 reduce breaks the fusion into the min that
    follows; unrolled, the whole distance+min pass is ONE fusion
    reading only q and c (measured: the bf16 pass dropped 6.9 ->
    compute-bound, r3 micro-split). Same left-to-right summation
    order, so results are bit-identical."""
    dx = q[:, :, None, 0] - cand[:, None, :, 0]
    dy = q[:, :, None, 1] - cand[:, None, :, 1]
    dz = q[:, :, None, 2] - cand[:, None, :, 2]
    return (dx * dx + dy * dy) + dz * dz


def _cand_forward(q, cands):
    d = _dist_sq_tnp(q, cands.cand)                        # [T, N, P]
    d = jnp.where(cands.valid[:, None, :], d, BIG)
    slot = jnp.argmin(d, axis=-1)                          # [T, N]
    dmin = jnp.min(d, axis=-1)
    return jnp.minimum(dmin, BIG), slot


def _cand_forward_bf16(q, cands):
    """Selection pass of _cand_forward in bf16: halves the VPU/HBM
    cost of the [T, N, P] broadcast-subtract-min. Only WHICH candidate
    wins can drift (between near-ties within bf16's ~0.4% relative
    error); the reported distance is recomputed exactly in f32 at the
    winner by the caller (same contract as nn_brute's exact
    re-evaluation).

    The winner index rides in the 16 zero low-mantissa bits of the
    bf16-as-f32 distance (bf16 keeps 7 of f32's 23 mantissa bits), so
    ONE uint-min reduce replaces the (min, argmin) pair — the [T,N,P]
    distance tensor then lives entirely inside a single reduce fusion
    instead of being materialized for two reductions (r3 ablation:
    the NN block was 7.1 of local_a's 9.7 ms/step). Distances are
    >= 0, so uint ordering == float ordering, and ties break to the
    smallest index exactly like argmin."""
    P = cands.cand.shape[1]
    if P > 65536:  # index no longer fits the zero mantissa bits
        qb = q.astype(jnp.bfloat16)
        cb = cands.cand.astype(jnp.bfloat16)
        d = _dist_sq_tnp(qb, cb)
        d = jnp.where(cands.valid[:, None, :], d,
                      jnp.asarray(BIG, jnp.bfloat16))
        slot = jnp.argmin(d, axis=-1)
        dmin = jnp.min(d, axis=-1).astype(jnp.float32)
        return jnp.minimum(dmin, BIG), slot
    qb = q.astype(jnp.bfloat16)
    cb = cands.cand.astype(jnp.bfloat16)
    d = _dist_sq_tnp(qb, cb)                               # bf16
    d = jnp.where(cands.valid[:, None, :], d,
                  jnp.asarray(BIG, jnp.bfloat16))
    # the explicit &~0xFFFF guards the index field even if XLA's
    # allow-excess-precision mode ever keeps this chain in f32 (the
    # low mantissa bits would then be nonzero); for genuinely
    # bf16-rounded values it is a no-op, so results are unchanged
    bits = jax.lax.bitcast_convert_type(
        d.astype(jnp.float32), jnp.uint32) & ~jnp.uint32(0xFFFF)
    packed = bits | jnp.arange(P, dtype=jnp.uint32)
    m = jnp.min(packed, axis=-1)                           # [T, N]
    slot = (m & jnp.uint32(0xFFFF)).astype(jnp.int32)
    dmin = jax.lax.bitcast_convert_type(
        m & ~jnp.uint32(0xFFFF), jnp.float32)
    return jnp.minimum(dmin, BIG), slot


def _select_nearest(slot: jnp.ndarray, cand: jnp.ndarray
                    ) -> jnp.ndarray:
    """Winner coordinates cand[t, slot[t, n]] -> [T, N, 3] WITHOUT a
    gather (TPU gathers cost ~20 ns/row — 783k rows would be ~15 ms)
    and without the full [T, N, P] one-hot (whose materialization +
    matmul read was measured at ~4 ms/step of HBM traffic at bench
    shapes, r3 ablation).

    Factored two-level one-hot: slot = g*R + r, so
      nearest[t,n,:] = sum_{g,r} og[t,n,g] or[t,n,r] cand[t,g*R+r,:]
    contracts an [T,N,R] and an [T,N,G] one-hot against the reshaped
    [T,G,R,3] table — ~20x less traffic than the flat one-hot.
    Selection through HIGHEST-precision matmuls with exact 0/1
    multipliers is exact (bf16x6 reconstructs f32)."""
    T_, P = cand.shape[0], cand.shape[1]
    C = cand.shape[-1]
    R = 32
    if P % R or P <= R:
        onehot = (slot[..., None]
                  == jnp.arange(P, dtype=slot.dtype)).astype(cand.dtype)
        return jnp.einsum("tnp,tpc->tnc", onehot, cand,
                          precision=jax.lax.Precision.HIGHEST)
    G = P // R
    og = (slot[..., None] // R
          == jnp.arange(G, dtype=slot.dtype)).astype(cand.dtype)
    orr = (slot[..., None] % R
           == jnp.arange(R, dtype=slot.dtype)).astype(cand.dtype)
    candg = cand.reshape(T_, G, R, C)
    # [T, N, R] x [T, G, R, 3] -> [T, N, G, 3] batched matmul
    tmp = jnp.einsum("tnr,tgrc->tngc", orr, candg,
                     precision=jax.lax.Precision.HIGHEST)
    # mult-reduce over the group axis (VPU fusion, no matmul)
    return jnp.einsum("tng,tngc->tnc", og, tmp,
                      precision=jax.lax.Precision.HIGHEST)


def _cand_fwd(q, cands):
    d, nearest = _cand_flat(q, cands)
    return d, (q, nearest, d < BIG)


def _cand_bwd(res, g):
    q, nearest, hit = res
    dq = jnp.where(hit[..., None], g[..., None] * 2.0 * (q - nearest),
                   0.0)
    return dq, None


nn_to_candidates.defvjp(_cand_fwd, _cand_bwd)


@jax.custom_vjp
def nn_to_candidates_bf16(q: jnp.ndarray, cands: FrameCands
                          ) -> jnp.ndarray:
    """nn_to_candidates with the selection pass in bf16 (see
    _cand_forward_bf16): same [T, N] output contract, exact f32
    distance at the (possibly near-tie-drifted) winner. Under vmap the
    clips axis folds into the frame axis (_flatten_clips_vmap_rule)."""
    d, _ = _cand16_flat(q, cands)
    return d


def _cand16_full(q, cands):
    dmin_bf, slot = _cand_forward_bf16(q, cands)
    nearest = _select_nearest(slot, cands.cand)
    # invalid slots carry bf16(BIG) = 9984 (not BIG itself), so the
    # hit test must use that value: valid candidates with d^2 in
    # [9984, BIG) saturate to BIG — already deep in the robust loss's
    # flat far field (sqrt(d)/(sqrt(d)+1) ~ 0.99, gradient ~1e-6)
    hit = dmin_bf < _BIG_BF16
    nearest = jnp.where(hit[..., None], nearest, q)
    d = jnp.minimum(jnp.sum((q - nearest) ** 2, axis=-1), BIG)
    return jnp.where(hit, d, BIG), nearest


_cand16_flat = _custom_batching.custom_vmap(_cand16_full)
_cand16_flat.def_vmap(_flatten_clips_vmap_rule(_cand16_full))


def _cand16_fwd(q, cands):
    d, nearest = _cand16_flat(q, cands)
    # live = hit AND unsaturated: d == BIG both on miss and when the
    # exact recompute saturates at BIG, and in both cases the forward
    # output is the constant BIG, so the VJP must vanish (matching
    # _cand_bwd's f32 semantics).
    return d, (q, nearest, d < BIG)


def _cand16_bwd(res, g):
    q, nearest, live = res
    dq = jnp.where(live[..., None],
                   g[..., None] * 2.0 * (q - nearest), 0.0)
    return dq, None


nn_to_candidates_bf16.defvjp(_cand16_fwd, _cand16_bwd)


@jax.custom_vjp
def grid_nn(grid: VoxelGrid, q: jnp.ndarray):
    """Voxel-accelerated NN: (dist_sq [...], idx [...])."""
    d, i, _ = _grid_forward(grid, q)
    return d, i


def _grid_fwd(grid, q):
    # the winner's coordinates are kept as the VJP residual, so the
    # backward touches no tables at all
    dist, idx, nearest = _grid_forward(grid, q)
    return (dist, idx), (q, idx, nearest)


def _grid_bwd(res, grads):
    q, idx, nearest = res
    g_dist, _ = grads
    dq = jnp.where((idx >= 0)[..., None],
                   g_dist[..., None] * 2.0 * (q - nearest), 0.0)
    # no gradient to the (static) grid
    return None, dq


grid_nn.defvjp(_grid_fwd, _grid_bwd)


def _exact_at(y: jnp.ndarray, x: jnp.ndarray, idx: jnp.ndarray
              ) -> jnp.ndarray:
    """Exact |x - y[idx]|^2 in VPU f32 (no Gram cancellation)."""
    nearest = jnp.take(y, jnp.maximum(idx, 0), axis=0)
    return jnp.sum((x - nearest) ** 2, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def nn_brute(x: jnp.ndarray, y: jnp.ndarray, impl: str = "xla"):
    """Brute-force NN with exact re-evaluation at the argmin.
    x [..., 3], y [M, 3] -> (dist_sq [...], idx [...])."""
    return _brute_forward(x, y, impl)


def _brute_forward(x, y, impl):
    if impl == "pallas":
        _, idx = chamfer_pallas.nn_distance(x, y)
    elif impl == "pallas_interpret":
        _, idx = chamfer_pallas.nn_distance(x, y, 128, 256, True)
    elif impl == "xla":
        _, idx = nn_distance_chunked(x, y)
    elif impl == "ref":
        _, idx = nn_distance_ref(x.reshape(-1, 3)[None], y[None])
        idx = idx[0].reshape(x.shape[:-1])
    else:
        raise ValueError(f"unknown impl {impl!r}")
    return _exact_at(y, x, idx), idx


def _brute_fwd(x, y, impl):
    dist, idx = _brute_forward(x, y, impl)
    return (dist, idx), (x, y, idx)


def _brute_bwd(impl, res, grads):
    x, y, idx = res
    g_dist, _ = grads
    nearest = jnp.take(y, idx, axis=0)
    dx = g_dist[..., None] * 2.0 * (x - nearest)
    dy = jnp.zeros_like(y).at[idx.reshape(-1)].add(
        (-dx).reshape(-1, 3))
    return dx, dy


nn_brute.defvjp(_brute_fwd, _brute_bwd)


def nn_distance(x: jnp.ndarray, y: jnp.ndarray, impl: str = "xla",
                grid: Optional[VoxelGrid] = None):
    """Dispatch: impl in {'grid', 'pallas', 'pallas_interpret', 'xla',
    'ref'}. 'grid' requires a prebuilt VoxelGrid."""
    if impl == "grid":
        if grid is None:
            raise ValueError("impl='grid' needs a VoxelGrid")
        return grid_nn(grid, x)
    return nn_brute(x, y, impl)
