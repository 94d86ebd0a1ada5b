"""Ablation timing of the local_a production (lazy candidate) step:
where do the ~9.6 ms/step go?

Times 50-step lax.scan programs that keep only a subset of the step's
work, at the full bench shapes (T=900, V=10475, 870 contact verts,
P=512 candidates):

  full          the production body: contact+smooth+rec, grad, Adam
  contact_only  contact term only (model fwd+bwd + NN fwd+bwd)
  model_only    SMPL-X forward_world fwd+bwd (no NN, no losses)
  model_fwd     forward_world fwd only (no grad)
  nn_only       candidate-NN fwd+bwd on free vertex variables
                (no SMPL-X model in the graph)
  params_only   rec+smooth terms on the 78-d params (no model, no NN)

Each variant compiles through the remote AOT (~60 s first time,
cached after); timings are steady per-step from inside the scan.
Usage: python tools/ablate_local.py  [FPV4D_ABL_STEPS=50]
"""
from __future__ import annotations

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
    from fpv4d.utils import bench_problem as BP
    from fpv4d.solve.clip_solve import forward_world, mask_stop_gradient
    from fpv4d.ops import losses

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
    opt_state = solver._opt.init(state)
    if solver._use_lazy_contact("local_a"):
        cands = solver._refresh_cands(state)
        ctx = solver.ctx._replace(grid=cands)
    else:  # exact-NN fallback (e.g. CPU smoke without a voxel grid)
        ctx = solver.ctx
    mask = solver.phase_mask("local_a")
    cfg = solver.config

    from tools.ablate_common import adam_scan, steady_ms

    def timed_scan(name, loss_fn, init_carry, extra_args):
        """Scan `steps` of grad+Adam on loss_fn, print ms/step
        (shared harness — init_carry is the full (params, opt_state)
        pair built with adam(1e-3), matching adam_scan's)."""
        run, _ = adam_scan(loss_fn, steps)
        ms, _final = steady_ms(run, (init_carry, extra_args), steps,
                               tag="ablate", label=f"{name:14s}")
        return ms

    results = {}

    # 1. full production body (lazy candidates)
    def full_loss(st_, ctx_, tgt, wts):
        return solver.phase_loss("local_a",
                                 mask_stop_gradient(st_, mask), tgt,
                                 wts, ctx_)

    results["full"] = timed_scan(
        "full", full_loss, (state, optax.adam(1e-3).init(state)),
        (ctx, target, weights))

    # 2. contact only
    def contact_loss(st_, ctx_):
        verts_w, _, _ = forward_world(ctx_,
                                      mask_stop_gradient(st_, mask),
                                      vertex_subset=solver.contact_vids)
        d = solver._nn(verts_w, ctx_.scene, ctx_.grid)
        return (solver.config.weights.contact
                * losses.robust_contact(d)
                * cfg.local_contact_mult)

    results["contact_only"] = timed_scan(
        "contact_only", contact_loss,
        (state, optax.adam(1e-3).init(state)), (ctx,))

    # 3. model fwd+bwd only
    def model_loss(st_, ctx_):
        verts_w, joints_w, _ = forward_world(
            ctx_, mask_stop_gradient(st_, mask),
            vertex_subset=solver.contact_vids)
        return jnp.sum(verts_w * 1e-6) + jnp.sum(joints_w * 1e-6)

    results["model_only"] = timed_scan(
        "model_only", model_loss,
        (state, optax.adam(1e-3).init(state)), (ctx,))

    # 4. model fwd only (no value_and_grad): plain scan of the forward
    @jax.jit
    def fwd_only(state, ctx_):
        def step(c, _):
            verts_w, joints_w, _ = forward_world(
                ctx_, c, vertex_subset=solver.contact_vids)
            return c, jnp.sum(verts_w) * 1e-6

        _, h = jax.lax.scan(step, state, None, length=steps)
        return h

    h = fwd_only(state, ctx)
    _ = float(np.asarray(h)[-1])
    t0 = time.perf_counter()
    h = fwd_only(state, ctx)
    _ = float(np.asarray(h)[-1])
    results["model_fwd"] = (time.perf_counter() - t0) / steps * 1e3
    print(f"[ablate] {'model_fwd':14s} {results['model_fwd']:7.3f} "
          f"ms/step", file=sys.stderr)

    # 5. NN only: free vertex variables, no model
    verts0 = jax.lax.stop_gradient(
        forward_world(ctx, state, vertex_subset=solver.contact_vids)[0])

    def nn_loss(q, ctx_):
        d = solver._nn(q, ctx_.scene, ctx_.grid)
        return (solver.config.weights.contact
                * losses.robust_contact(d) * cfg.local_contact_mult)

    results["nn_only"] = timed_scan(
        "nn_only", nn_loss, (verts0, optax.adam(1e-3).init(verts0)),
        (ctx,))

    # 6. params-only terms (rec + smooth)
    def params_loss(st_, tgt, wts):
        stm = mask_stop_gradient(st_, mask)
        return (losses.rec_l1(tgt, stm.body_6d, wts)
                * solver.config.weights.rec
                + losses.second_order_smoothness(stm.body_6d))

    results["params_only"] = timed_scan(
        "params_only", params_loss,
        (state, optax.adam(1e-3).init(state)), (target, weights))

    # 7. skate-phase split: full terms2 body vs subset-LBS model only
    from fpv4d.solve.clip_solve import _grad_mask
    skate_mask = _grad_mask(body=True)
    wr = solver.detect_contact(state)

    def skate_loss(st_, ctx_, tgt, wts, wr_):
        rec, local_s, vert_s, skate = solver.terms2(
            mask_stop_gradient(st_, skate_mask), tgt, wts, wr_, ctx_)
        return vert_s + local_s + rec + skate

    results["skate_full"] = timed_scan(
        "skate_full", skate_loss,
        (state, optax.adam(1e-3).init(state)),
        (solver.ctx, target, weights, wr))

    def skate_model_loss(st_, ctx_):
        verts_w, _, _ = forward_world(
            ctx_, mask_stop_gradient(st_, skate_mask),
            vertex_subset=solver._skate_vids)
        return jnp.sum(verts_w * 1e-6)

    results["skate_model"] = timed_scan(
        "skate_model", skate_model_loss,
        (state, optax.adam(1e-3).init(state)), (solver.ctx,))

    import json
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
