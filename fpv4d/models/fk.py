"""Forward kinematics with a hand-written adjoint (custom VJP).

The SMPL-X kinematic chain (reference: the smplx package's
batch_rigid_transform, driven per Adam step at
global_optimization.py:280-283) is a depth-11 tree of 4x4 transform
composes. The forward is ~11 batched matmuls; XLA's op-granular
reverse-mode turns the backward into ~100 small sequential ops
(matmul VJP pairs + gather/scatter transposes + concat/slice adjoints)
at ~30 us each — measured 3.24 ms/step of the production local_a's
4.97 ms and the skate phase's 4.8 ms on a v5e chip (r3 ablation,
PERFORMANCE.md "Next"). Neither pointer-doubling (2x slower: padded
4x4 matmul volume beats chain depth on the MXU) nor level-concat
restructuring (cost-neutral) moved it, because the cost is op COUNT,
not any single op.

This module writes the adjoint by hand as one reverse sweep over the
same 11 depth levels the forward uses:

  forward  per level k:   W_k = W_{k-1}[parent] @ L_k
  backward per level k:   Lbar_k  = W_{k-1}[parent]^T @ Wbar_k
                          Wbar_{k-1} += scatter_by_parent(Wbar_k @ L_k^T)

with the parent scatter expressed as a static one-hot matmul at
precision=HIGHEST (TPU scatter-adds and bf16 dot passes both measured
harmful here), and the rel-joint difference adjoint likewise as one
static-matrix matmul instead of a scatter. Total: ~4 ops per level
instead of ~10 — the backward collapses from ~100 ops to ~45.

Forward values are bit-identical to the autodiff reference
(`rigid_transform_ref` keeps the plain implementation): same matmuls,
same order. Gradients agree to f32 roundoff (the one-hot HIGHEST
matmuls are 3-pass bf16 emulations, ~1e-6 relative); exactness is
regression-tested against jax.grad of the reference in
tests/test_fk_vjp.py.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=None)
def _schedule(parents: Tuple[int, ...]):
    """Static per-level schedule: (levels, pos_in_prev, onehot) per
    depth. levels[k] = joint ids at tree depth k (sorted); pos[k] =
    each joint's parent's slot in levels[k-1]; onehot[k] =
    [n_{k-1}, n_k] 0/1 accumulation matrix (rows: parent slots)."""
    parents_arr = np.asarray(parents)
    depth = [0] * len(parents)
    for j in range(1, len(parents)):
        depth[j] = depth[parents[j]] + 1
    by_d = {}
    for j, d in enumerate(depth):
        by_d.setdefault(d, []).append(j)
    levels = [np.asarray(by_d[d]) for d in sorted(by_d)]
    pos = [None]
    onehot = [None]
    for k in range(1, len(levels)):
        p = np.searchsorted(levels[k - 1], parents_arr[levels[k]])
        pos.append(p)
        S = np.zeros((len(levels[k - 1]), len(levels[k])), np.float32)
        S[p, np.arange(len(levels[k]))] = 1.0
        onehot.append(S)
    order = np.concatenate(levels)
    inv = np.argsort(order)
    # rel-joint adjoint matrix: rel = M @ joints with M = I - P
    # (P[j, parent(j)] = 1 for j >= 1); joints_bar = M^T @ rel_bar
    J = len(parents)
    Mt = np.eye(J, dtype=np.float32)
    Mt[parents_arr[1:], np.arange(1, J)] -= 1.0
    return levels, pos, onehot, inv, Mt


def _local_transforms(rot_mats, rel_joints):
    """[B,J,3,3] + [B,J,3] -> [B,J,4,4] rigid local transforms."""
    B, J = rel_joints.shape[:2]
    dtype = rel_joints.dtype
    pad = jnp.zeros((B, J, 1, 3), dtype=dtype)
    top = jnp.concatenate([rot_mats, rel_joints[..., None]], axis=-1)
    bottom = jnp.concatenate(
        [pad, jnp.ones((B, J, 1, 1), dtype=dtype)], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def _level_sweep(local, parents):
    """Compose local transforms down the tree by depth level. Returns
    (world [B,J,4,4], outs: per-level world blocks — the backward's
    residuals)."""
    levels, pos, _, inv, _ = _schedule(tuple(parents))
    B = local.shape[0]
    outs = [local[:, levels[0]]]
    for k in range(1, len(levels)):
        idx, p = levels[k], pos[k]
        n = len(idx)
        # flatten (batch, level) before the matmul: multi-batch-dim
        # dots from gathered operands trip an XLA algebraic-simplifier
        # RET_CHECK under vmap
        wp = outs[-1][:, p].reshape(B * n, 4, 4)
        lc = local[:, idx].reshape(B * n, 4, 4)
        outs.append(jnp.matmul(wp, lc).reshape(B, n, 4, 4))
    world = jnp.concatenate(outs, axis=1)[:, inv]
    return world, outs


def _fwd_impl(rot_mats, joints, parents):
    """Shared forward math (identical op schedule to r3's
    batch_rigid_transform)."""
    parents_arr = np.asarray(parents)
    rel_joints = jnp.concatenate(
        [joints[:, :1],
         joints[:, 1:] - joints[:, parents_arr[1:]]], axis=1)
    local = _local_transforms(rot_mats, rel_joints)
    world, outs = _level_sweep(local, parents)
    posed_joints = world[..., :3, 3]
    correction = jnp.einsum("bjpq,bjq->bjp", world[..., :3, :3], joints)
    rel_transforms = world.at[..., :3, 3].add(-correction)
    return posed_joints, rel_transforms, (local, outs, world)


def rigid_transform_ref(rot_mats, joints, parents):
    """Plain-autodiff reference implementation (oracle for the custom
    VJP; also the path for exotic dtypes/trees in tests)."""
    posed, rel, _ = _fwd_impl(rot_mats, joints, parents)
    return posed, rel


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def rigid_transform(rot_mats, joints, parents_key):
    """FK with the hand-written level-sweep adjoint.

    rot_mats [B,J,3,3], joints [B,J,3] rest positions, parents_key a
    (static, hashable) tuple of parent indices. Returns posed joints
    [B,J,3] and skinning-relative transforms [B,J,4,4] — same contract
    as the smplx package's batch_rigid_transform.
    """
    posed, rel, _ = _fwd_impl(rot_mats, joints, parents_key)
    return posed, rel


def _rt_fwd(rot_mats, joints, parents_key):
    posed, rel, res = _fwd_impl(rot_mats, joints, parents_key)
    local, outs, world = res
    return (posed, rel), (local, outs, world, joints)


def _rt_bwd(parents_key, res, cots):
    local, outs, world, joints = res
    g_posed, g_rel = cots
    parents = parents_key
    levels, pos, onehot, inv, Mt = _schedule(tuple(parents))
    B, J = joints.shape[:2]
    f32 = joints.dtype

    # ---- rim: rel_transforms / posed_joints / correction adjoints ----
    # rel = world - e_t @ correction; posed = world[..., :3, 3]
    g_corr = -g_rel[..., :3, 3]                                # [B,J,3]
    gW = g_rel.at[..., :3, 3].add(g_posed)
    # correction = Wrot @ joints:
    gW = gW.at[..., :3, :3].add(
        g_corr[..., :, None] * joints[..., None, :])
    g_joints = jnp.einsum("bjpq,bjp->bjq", world[..., :3, :3], g_corr)

    # ---- reverse level sweep ----
    # gW blocks in level order (static permutation of the joint axis)
    gW_lvl = [gW[:, lv] for lv in levels]
    g_local_lvl = [None] * len(levels)
    hi = lax.Precision.HIGHEST
    for k in range(len(levels) - 1, 0, -1):
        idx, p = levels[k], pos[k]
        n = len(idx)
        g = gW_lvl[k]                                    # [B,n,4,4]
        wp = outs[k - 1][:, p]                           # [B,n,4,4]
        lc = local[:, idx]
        gf = g.reshape(B * n, 4, 4)
        # Lbar = Wp^T @ Wbar  (dot_general, no explicit transpose op)
        g_local_lvl[k] = jnp.einsum(
            "bij,bik->bjk", wp.reshape(B * n, 4, 4), gf
        ).reshape(B, n, 4, 4)
        # parent contribution: Wbar @ L^T, summed over siblings via a
        # static one-hot matmul (HIGHEST: bf16 single-pass dots lose
        # ~3 digits of the gradient; TPU scatter-add is row-latency
        # bound — both measured harmful, see module docstring)
        t = jnp.einsum("bij,bkj->bik", gf, lc.reshape(B * n, 4, 4)
                       ).reshape(B, n, 16)
        acc = jnp.einsum("pc,bcf->bpf", jnp.asarray(onehot[k]), t,
                         precision=hi).reshape(B, -1, 4, 4)
        gW_lvl[k - 1] = gW_lvl[k - 1] + acc
    g_local_lvl[0] = gW_lvl[0]

    g_local = jnp.concatenate(g_local_lvl, axis=1)[:, inv]   # [B,J,4,4]
    g_rot = g_local[..., :3, :3]
    g_relj = g_local[..., :3, 3]                             # [B,J,3]

    # rel_joints = M @ joints  =>  joints_bar += M^T @ rel_joints_bar
    g_joints = g_joints + jnp.einsum(
        "jk,bkc->bjc", jnp.asarray(Mt), g_relj, precision=hi)
    return g_rot.astype(f32), g_joints.astype(f32)


rigid_transform.defvjp(_rt_fwd, _rt_bwd)


# The implementation the model actually calls. r4 hardware A/B
# (tools/ablate_fk.py, T=900 bench shapes): the hand-written adjoint
# measured ~8% SLOWER than XLA autodiff (joints-only fwd+bwd 3.50 vs
# 3.24 ms/step; full local_a step 5.68 vs 5.23) — see PERFORMANCE.md
# r4 for the variant attribution. Production therefore stays on
# autodiff; the custom VJP remains as the measured negative result +
# oracle (tests/test_fk_vjp.py keeps both paths exact).
rigid_transform_prod = rigid_transform_ref
