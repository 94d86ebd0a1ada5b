"""FK custom-VJP A/B timing on hardware (r4).

Times scanned fwd+bwd steps at bench shapes (T=900) with the
hand-written level-sweep adjoint (fpv4d.models.fk.rigid_transform,
production) vs plain autodiff (rigid_transform_ref), for:

  model   forward_world fwd+bwd on the contact vertex subset — the
          local_a-phase model block (r3 split: 3.37 ms/step, of which
          the backward is ~2.8)
  joints  joints-only fwd+bwd (skinning restricted to 1 dummy vertex)
          — the keypoint-fit shape (r3: grad of this costs 3.24 ms)
  full    the production local_a step (lazy candidates)
  skate   the terms2 skate-phase step

Each variant compiles through the remote AOT (~60 s first, cached).
Usage: python -u tools/ablate_fk.py   [FPV4D_ABL_STEPS=50]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    steps = int(os.environ.get("FPV4D_ABL_STEPS", "50"))
    small = os.environ.get("FPV4D_BENCH_SMALL") == "1"

    import jax
    import jax.numpy as jnp
    import optax
    from fpv4d.models import fk
    from fpv4d.utils import bench_problem as BP
    from fpv4d.solve.clip_solve import (forward_world,
                                        mask_stop_gradient, _grad_mask)

    BP.enable_persistent_cache()
    T = 60 if small else 900
    prob = BP.standard_problem(
        T=T, num_verts=512 if small else 10475,
        scene_pts=1024 if small else 100_489,
        num_iter=20 if small else 500)
    solver = prob.solver
    body_j = jnp.asarray(prob.body)
    cam_j = jnp.asarray(prob.cam)
    state, target, weights = solver.init_state(body_j, cam_j)
    if solver._use_lazy_contact("local_a"):
        cands = solver._refresh_cands(state)
        ctx = solver.ctx._replace(grid=cands)
    else:
        ctx = solver.ctx
    mask = solver.phase_mask("local_a")
    cfg = solver.config

    prod_before = fk.rigid_transform_prod
    custom_rt = fk.rigid_transform

    from tools.ablate_common import adam_scan, steady_ms

    def timed_scan(name, loss_fn, init_carry, extra_args):
        # init_carry is the full (params, opt_state) pair; the opt
        # state the caller builds with adam(1e-3) matches adam_scan's
        run, _ = adam_scan(loss_fn, steps)
        return steady_ms(run, (init_carry, extra_args), steps,
                         tag="ablate_fk", label=f"{name:16s}")

    def model_loss(st_, ctx_):
        verts_w, joints_w, _ = forward_world(
            ctx_, mask_stop_gradient(st_, mask),
            vertex_subset=solver.contact_vids)
        return jnp.sum(verts_w * 1e-6) + jnp.sum(joints_w * 1e-6)

    dummy = np.zeros(1, np.int32)

    def joints_loss(st_, ctx_):
        _, joints_w, _ = forward_world(
            ctx_, mask_stop_gradient(st_, mask), vertex_subset=dummy)
        return jnp.sum(joints_w * 1e-6)

    def full_loss(st_, ctx_, tgt, wts):
        return solver.phase_loss("local_a",
                                 mask_stop_gradient(st_, mask), tgt,
                                 wts, ctx_)

    skate_mask = _grad_mask(body=True)
    wr = solver.detect_contact(state)

    def skate_loss(st_, ctx_, tgt, wts, wr_):
        rec, local_s, vert_s, skate = solver.terms2(
            mask_stop_gradient(st_, skate_mask), tgt, wts, wr_, ctx_)
        return vert_s + local_s + rec + skate

    variants = [
        ("model", model_loss, (ctx,)),
        ("joints", joints_loss, (ctx,)),
        ("full", full_loss, (ctx, target, weights)),
        ("skate", skate_loss, (solver.ctx, target, weights, wr)),
    ]
    results = {}
    for impl_name, impl in (("custom", custom_rt),
                            ("autodiff", fk.rigid_transform_ref)):
        fk.rigid_transform_prod = impl
        for name, loss, args in variants:
            ms, final = timed_scan(f"{name}/{impl_name}", loss,
                                   (state, optax.adam(1e-3).init(state)),
                                   args)
            results[f"{name}_{impl_name}"] = round(ms, 3)
            results[f"{name}_{impl_name}_final"] = final
    fk.rigid_transform_prod = prod_before

    print(json.dumps(results))


if __name__ == "__main__":
    main()
