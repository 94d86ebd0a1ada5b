"""Fused Pallas kernel for the per-step contact hot path.

`nn_to_candidates` (fpv4d.ops.nn) — squared NN distance from each
frame's contact vertices [T, N, 3] to that frame's candidate scene
points [T, P, 3] — is the TPU-native replacement for the reference's
per-iteration CUDA chamfer call (ext.chamferDist(),
global_optimization.py:33,292-295). Its XLA formulation is a
broadcast-subtract-min whose [T, N, P] distance tensor XLA materializes
in HBM (measured: 7.5 ms of a 12.4 ms local_a step at the bench shapes
T=900, N=870, P=512 — ~4.8 GB of HBM traffic per evaluation). This
kernel keeps the [N, P] distance tile in VMEM, so per-step HBM traffic
drops to the inputs/outputs (~50 MB).

Design (what made it fast — earlier variants and their measured costs
are in PERFORMANCE.md):

  * CANONICAL MATMUL LAYOUT, ZERO PER-STEP TRANSPOSES. The query side
    is packed once per step by a fused elementwise pass into
    qk [T, N, 16] bf16 whose lane-columns hold the bf16x3 splits of
    -2q plus two ones-columns; the candidate side is packed ONCE PER
    REFRESH (the tables are static for `contact_refresh_steps` Adam
    steps) into yk [T, 16, P] holding [y_hi | y_lo | y_hi | yy_hi |
    yy_lo] rows. One [N,16]x[16,P] MXU pass then yields
    part = |y|^2 - 2 q.y per frame (invalid slots carry |y|^2 = 1e30).
    The bf16x3 split emulates the f32 matmul Mosaic won't do
    (it ignores the precision attribute; see chamfer_pallas).
  * NO ARGMIN. A lane-argmin over [896, 512] cost ~3.8 ms/eval in
    Mosaic. Instead the candidate index is packed into the low 9
    mantissa bits of the (non-negative, bitcast-monotone) distance:
    ipack = (bits(d) & ~511) | col, and ONE int-min reduction yields
    both the winner column and a truncated distance. The 2^-14
    relative truncation only affects WHICH near-tied candidate wins;
    the reported distance is recomputed exactly in f32 afterwards.
  * positivity for the bitcast trick comes from adding |q|^2, which is
    a per-row constant (never changes the row's argmin) reconstructed
    in-kernel from the bf16 splits.
  * the winner's coordinates come from a one-hot matmul against the
    per-refresh ysel [T, P, 8] table (one-hot and the bf16 coordinate
    halves are all exactly representable, so the extraction is exact);
    the exact squared distance and the robust-loss saturation are
    evaluated OUTSIDE the kernel as cheap fused elementwise XLA over
    [T, N, 3].
  * the custom VJP is d/dq |q - y*|^2 = 2 (q - y*) with y* a VJP
    residual — no second kernel pass, no gathers.

Semantics match NN.nn_to_candidates: distances saturate at NN.BIG
(1e4) and frames with no valid candidate return BIG with zero gradient
(nearest == q there, so the VJP vanishes identically).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_SAT = 1e4      # public saturation value (== fpv4d.ops.nn.BIG)
_BIG = 1e30        # invalid-slot |y|^2 marker (never wins the min)

DEFAULT_TB = 8     # frames per grid step (statically unrolled)
_IDX_BITS = 511    # low 9 mantissa bits hold the candidate column


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split2(v):
    """bf16 hi/lo decomposition: v ~= hi + lo, both bf16-exact.

    CRITICAL: the rounding must go through lax.reduce_precision, not
    an astype round-trip — this environment compiles with
    --xla_allow_excess_precision=true, under which XLA ELIDES
    f32->bf16->f32 convert chains, silently turning the residual
    `v - f32(bf16(v))` into zero (measured: the lo halves of packed
    operands came back all-zero from compiled code while interpret
    mode was exact). reduce_precision is semantically explicit and
    survives. Inside Mosaic kernels the astype form is safe (no XLA
    algebraic simplifier), which is why chamfer_pallas's in-kernel
    split never hit this."""
    hi_f32 = jax.lax.reduce_precision(v, exponent_bits=8,
                                      mantissa_bits=7)
    hi = hi_f32.astype(jnp.bfloat16)          # exact: already on grid
    lo = (v - hi_f32).astype(jnp.bfloat16)
    return hi, lo


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class PackedCands:
    """Per-refresh packed candidate tables for the Pallas contact NN.

    yk   [T, P, 16] bf16 — distance-matmul rhs, K on lanes (the
                           dim1 x dim1 contraction orientation Mosaic
                           runs at full speed): lane-cols
                           [y_hi | y_lo | y_hi | yy_hi | yy_lo | 0...]
    ysel [T, 8, P] bf16  — winner-extraction rhs rows
                           [y_hi | y_lo | 0 | 0], P on lanes
    Build with pack_candidates(); P is padded to a multiple of 128 and
    must stay <= 512 (the index packs into 9 mantissa bits).
    """
    yk: jnp.ndarray
    ysel: jnp.ndarray

    def tree_flatten(self):
        return (self.yk, self.ysel), ()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def pack_candidates(cand: jnp.ndarray, valid: jnp.ndarray
                    ) -> PackedCands:
    """cand [T, P, 3] f32, valid [T, P] bool -> PackedCands.

    Runs once per contact-refresh interval (outside the optimizer
    scan), so its transposes are amortized over
    `contact_refresh_steps` Adam steps."""
    T, P, _ = cand.shape
    if P > _IDX_BITS + 1:
        raise ValueError(f"P={P} exceeds the 9-bit index budget (512)")
    Pp = _round_up(P, 128)

    yy = jnp.where(valid, jnp.sum(cand * cand, -1), _BIG)  # [T, P]
    c_hi, c_lo = _split2(cand)                          # [T, P, 3]
    yy_hi, yy_lo = _split2(yy[:, :, None])              # [T, P, 1]
    zeros = jnp.zeros((T, P, 16 - 11), jnp.bfloat16)
    yk = jnp.concatenate([c_hi, c_lo, c_hi, yy_hi, yy_lo, zeros], -1)
    yk = jnp.pad(yk, ((0, 0), (0, Pp - P), (0, 0)))
    # padded candidate slots must never win: give them |y|^2 = BIG
    if Pp > P:
        big = jnp.full((T, Pp - P, 1), _BIG, jnp.bfloat16)
        yk = yk.at[:, P:, 9:10].set(big)

    y3t = jnp.swapaxes(cand, 1, 2)                      # [T, 3, P]
    t_hi, t_lo = _split2(y3t)
    zsel = jnp.zeros((T, 2, P), jnp.bfloat16)
    ysel = jnp.concatenate([t_hi, t_lo, zsel], 1)       # [T, 8, P]
    ysel = jnp.pad(ysel, ((0, 0), (0, 0), (0, Pp - P)))
    return PackedCands(yk=yk, ysel=ysel)


def _pack_queries(q: jnp.ndarray, Np: int, Tp: int) -> jnp.ndarray:
    """q [T, N, 3] -> qk [Tp, Np, 16] bf16 (fused elementwise; the
    lane-column layout matches pack_candidates' yk rows)."""
    T, N, _ = q.shape
    m = -2.0 * q
    m_hi, m_lo = _split2(m)
    ones = jnp.ones((T, N, 2), jnp.bfloat16)
    zeros = jnp.zeros((T, N, 16 - 11), jnp.bfloat16)
    qk = jnp.concatenate([m_hi, m_hi, m_lo, ones, zeros], -1)
    return jnp.pad(qk, ((0, Tp - T), (0, Np - N), (0, 0)))


def _cand_kernel(q_ref, yk_ref, ysel_ref, imin_ref, near_ref, *,
                 tb: int):
    """One grid step: tb frames (statically unrolled).

    q_ref    [tb, N, 16] bf16
    yk_ref   [tb, P, 16] bf16
    ysel_ref [tb, 8, P] bf16
    imin_ref [tb, N] int32 — packed (distance-bits | winner column)
    near_ref [tb, N, 8] bf16 — winner coord halves [hi(3) | lo(3) | 0]

    Both matmuls contract dim1 x dim1 (K on lanes for lhs AND rhs) —
    the orientation chamfer_pallas proved Mosaic runs without operand
    relayouts.
    """
    for t in range(tb):
        qk = q_ref[t]                                    # [N, 16]
        part = jax.lax.dot_general(
            qk, yk_ref[t], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [N, P]

        # |q|^2 per row from the bf16 halves: a per-row constant, so
        # it never changes the row's argmin — it only makes dfull
        # non-negative, which the bitcast ordering trick requires
        qh = qk[:, 0:3].astype(jnp.float32)
        ql = qk[:, 6:9].astype(jnp.float32)
        q3 = -0.5 * (qh + ql)                            # [N, 3]
        xx = jnp.sum(q3 * q3, axis=1, keepdims=True)     # [N, 1]

        dfull = jnp.maximum(part + xx, 0.0)              # [N, P]
        ibits = jax.lax.bitcast_convert_type(dfull, jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, part.shape, 1)
        ipack = (ibits & ~_IDX_BITS) | cols
        imin = jnp.min(ipack, axis=1)                    # [N]
        wincol = imin & _IDX_BITS

        onehot = (cols == wincol[:, None]).astype(jnp.bfloat16)
        near8 = jax.lax.dot_general(
            onehot, ysel_ref[t],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [N, 8]

        imin_ref[t] = imin
        near_ref[t] = near8.astype(jnp.bfloat16)         # halves exact


def _forward(q: jnp.ndarray, packed: PackedCands, tb: int,
             interpret: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (dist [T, N] f32 exact+saturated, nearest [T, N, 3] f32,
    nearest == q where a frame has no valid candidate)."""
    T, N, _ = q.shape
    Pp = packed.yk.shape[-2]
    Tp = _round_up(T, tb)
    Np = _round_up(N, 128)
    qk = _pack_queries(q, Np, Tp)
    yk = jnp.pad(packed.yk, ((0, Tp - T), (0, 0), (0, 0)))
    ysel = jnp.pad(packed.ysel, ((0, Tp - T), (0, 0), (0, 0)))

    kernel = functools.partial(_cand_kernel, tb=tb)
    imin, near8 = pl.pallas_call(
        kernel,
        grid=(Tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, Np, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Pp, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 8, Pp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Np, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Np), jnp.int32),
            jax.ShapeDtypeStruct((Tp, Np, 8), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * Np * Pp * 24,
            bytes_accessed=(Tp * Np * 16 * 2 + Tp * 16 * Pp * 2
                            + Tp * Pp * 8 * 2 + Tp * Np * 4
                            + Tp * Np * 8 * 2),
            transcendentals=0),
        # the unrolled tb frames keep several [N, P] f32 tiles live at
        # once; the default 16M scoped-vmem budget is ~2M short at
        # tb=8, N=896, P=512 (v5e cores have far more physical VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qk, yk, ysel)

    imin = imin[:T, :N]
    near8 = near8[:T, :N]
    # fused elementwise epilogue: exact f32 distance at the winner
    dapprox = jax.lax.bitcast_convert_type(imin & ~_IDX_BITS,
                                           jnp.float32)
    hit = dapprox < _BIG * 0.5
    near = (near8[..., 0:3].astype(jnp.float32)
            + near8[..., 3:6].astype(jnp.float32))
    nearest = jnp.where(hit[..., None], near, q)
    d = jnp.minimum(jnp.sum((q - nearest) ** 2, -1), BIG_SAT)
    dist = jnp.where(hit, d, BIG_SAT)
    return dist, nearest


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cand_nn(q: jnp.ndarray, packed: PackedCands,
            tb: int = DEFAULT_TB, interpret: bool = False) -> jnp.ndarray:
    """Squared NN distance per frame: q [T,N,3] vs the frame's packed
    candidate tables -> dist [T,N] f32 (BIG_SAT where a frame has no
    valid candidate). Differentiable in q only."""
    d, _ = _forward(q, packed, tb, interpret)
    return d


def _cand_nn_fwd(q, packed, tb, interpret):
    d, nearest = _forward(q, packed, tb, interpret)
    # live = hit AND unsaturated: d == BIG_SAT both on miss and when
    # the exact recompute saturates, and in both cases the forward
    # output is constant, so the VJP must vanish there (matching
    # nn._cand_bwd's f32 semantics).
    return d, (q, nearest, d < BIG_SAT)


def _cand_nn_bwd(tb, interpret, res, g):
    q, nearest, live = res
    dq = jnp.where(live[..., None],
                   g[..., None] * 2.0 * (q - nearest), 0.0)
    return dq, None


cand_nn.defvjp(_cand_nn_fwd, _cand_nn_bwd)
