"""FK adjoint variant sweep (r4): WHERE does the hand-written
level-sweep backward lose to XLA autodiff?

Times scanned fwd+bwd of the BARE FK (free rot_mats/joints variables,
B=900, SMPL-X tree) for:

  autodiff     plain jax.grad of the level-sweep forward
  custom       fpv4d.models.fk.rigid_transform as shipped
  onehot_def   one-hot accumulations at DEFAULT precision (bf16 pass)
  scatter      .at[:, pos].add parent accumulation instead of one-hot
  merged       per-level Lbar and parent-contribution matmuls merged
               into ONE batched dot (concat along the batch axis)

One TPU process, all variants in one run (remote AOT ~60 s/variant
first time). Usage: python -u tools/fk_variants.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    steps = int(os.environ.get("FPV4D_ABL_STEPS", "50"))
    B = int(os.environ.get("FPV4D_FK_B", "900"))

    import jax
    import jax.numpy as jnp
    from jax import lax
    import optax
    from fpv4d.models import fk
    from fpv4d.models.smplx import PARENTS
    from fpv4d.utils import bench_problem as BP

    BP.enable_persistent_cache()
    parents = PARENTS
    levels, pos, onehot, inv, Mt = fk._schedule(tuple(parents))
    J = len(parents)
    rng = np.random.RandomState(0)
    rot0 = jnp.asarray(rng.randn(B, J, 3, 3).astype(np.float32) * 0.1)
    joints0 = jnp.asarray(rng.randn(B, J, 3).astype(np.float32))

    def make_variant(accum: str, precision):
        """Build a custom-vjp rigid_transform with a modified bwd."""

        @partial(jax.custom_vjp, nondiff_argnums=(2,))
        def rt(rot_mats, joints, parents_key):
            p, r, _ = fk._fwd_impl(rot_mats, joints, parents_key)
            return p, r

        def fwd(rot_mats, joints, parents_key):
            p, r, res = fk._fwd_impl(rot_mats, joints, parents_key)
            local, outs, world = res
            return (p, r), (local, outs, world, joints)

        def bwd(parents_key, res, cots):
            local, outs, world, joints = res
            g_posed, g_rel = cots
            g_corr = -g_rel[..., :3, 3]
            gW = g_rel.at[..., :3, 3].add(g_posed)
            gW = gW.at[..., :3, :3].add(
                g_corr[..., :, None] * joints[..., None, :])
            g_joints = jnp.einsum("bjpq,bjp->bjq", world[..., :3, :3],
                                  g_corr)
            gW_lvl = [gW[:, lv] for lv in levels]
            g_local_lvl = [None] * len(levels)
            for k in range(len(levels) - 1, 0, -1):
                idx, p = levels[k], pos[k]
                n = len(idx)
                g = gW_lvl[k]
                wp = outs[k - 1][:, p]
                lc = local[:, idx]
                gf = g.reshape(B * n, 4, 4)
                if accum == "merged":
                    # ONE batched dot: [wp^T@g ; g@lc^T] — stack
                    # (A,B) pairs along the batch axis
                    a = jnp.concatenate(
                        [wp.reshape(B * n, 4, 4).transpose(0, 2, 1),
                         gf], axis=0)
                    b = jnp.concatenate(
                        [gf,
                         lc.reshape(B * n, 4, 4).transpose(0, 2, 1)],
                        axis=0)
                    both = jnp.matmul(a, b)
                    g_local_lvl[k] = both[:B * n].reshape(B, n, 4, 4)
                    t = both[B * n:].reshape(B, n, 16)
                else:
                    g_local_lvl[k] = jnp.einsum(
                        "bij,bik->bjk", wp.reshape(B * n, 4, 4), gf
                    ).reshape(B, n, 4, 4)
                    t = jnp.einsum(
                        "bij,bkj->bik", gf, lc.reshape(B * n, 4, 4)
                    ).reshape(B, n, 16)
                if accum == "scatter":
                    acc = jnp.zeros(
                        (B, len(levels[k - 1]), 16), t.dtype
                    ).at[:, p].add(t).reshape(B, -1, 4, 4)
                    gW_lvl[k - 1] = gW_lvl[k - 1] + acc
                else:
                    acc = jnp.einsum(
                        "pc,bcf->bpf", jnp.asarray(onehot[k]), t,
                        precision=precision).reshape(B, -1, 4, 4)
                    gW_lvl[k - 1] = gW_lvl[k - 1] + acc
            g_local_lvl[0] = gW_lvl[0]
            g_local = jnp.concatenate(g_local_lvl, axis=1)[:, inv]
            g_rot = g_local[..., :3, :3]
            g_relj = g_local[..., :3, 3]
            g_joints = g_joints + jnp.einsum(
                "jk,bkc->bjc", jnp.asarray(Mt), g_relj,
                precision=lax.Precision.HIGHEST)
            return g_rot, g_joints

        rt.defvjp(fwd, bwd)
        return rt

    hi = lax.Precision.HIGHEST
    variants = {
        "autodiff": lambda r, j: fk.rigid_transform_ref(r, j, parents),
        "custom": lambda r, j: fk.rigid_transform(r, j, parents),
        "onehot_def": None,
        "scatter": None,
        "merged": None,
    }
    variants["onehot_def"] = (
        lambda r, j, f=make_variant("onehot", None):
        f(r, j, parents))
    variants["scatter"] = (
        lambda r, j, f=make_variant("scatter", hi): f(r, j, parents))
    variants["merged"] = (
        lambda r, j, f=make_variant("merged", hi): f(r, j, parents))

    cp = jnp.asarray(rng.randn(B, J, 3).astype(np.float32))
    cr = jnp.asarray(rng.randn(B, J, 4, 4).astype(np.float32) * 0.01)

    results = {}
    for name, f in variants.items():
        from tools.ablate_common import adam_scan, steady_ms

        def loss(params, cp_, cr_, f=f):
            rot, joints = params
            p, r = f(rot, joints)
            return jnp.sum(p * cp_) * 1e-3 + jnp.sum(r * cr_) * 1e-3

        run, opt = adam_scan(loss, steps, lr=1e-4)
        carry = ((rot0, joints0), opt.init((rot0, joints0)))
        ms, final = steady_ms(run, (carry, (cp, cr)), steps,
                              tag="fk_variants", label=f"{name:12s}")
        results[name] = round(ms, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
