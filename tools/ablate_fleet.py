"""Attribute the multi-clip (fleet) per-clip batching overhead.

VERDICT r3/r4 ask #2: the C=8 batched solve costs >1.1x per clip vs
the single-clip solve at identical shapes. This tool times matched
50-step local_a scans single vs batched (C=8) for nested subsets of
the step's work, so the super-linear component is named:

  full        production local_a step (contact + smooth + rec)
  model       forward_world fwd+bwd only (pruned FK + LBS chain)
  nn          candidate-NN fwd+bwd on free vertex variables
  refresh     one candidate-table rebuild (amortized per step at the
              production refresh interval)

Batched times are divided by C for the per-clip figure. Matches
BASELINE config 5 against fpv4d/parallel/multi_clip.py.

Usage: python tools/ablate_fleet.py   [FPV4D_FLEET_C=8]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    C = int(os.environ.get("FPV4D_FLEET_C", "8"))
    steps = int(os.environ.get("FPV4D_ABL_STEPS", "50"))
    small = os.environ.get("FPV4D_BENCH_SMALL") == "1"

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh
    from fpv4d.utils import bench_problem as BP
    from fpv4d.solve.clip_solve import (forward_world,
                                        mask_stop_gradient, Ctx)
    from fpv4d.parallel.multi_clip import MultiClipSolver
    from fpv4d.parallel import sharding as SH
    from fpv4d.ops import nn as NN, losses

    BP.enable_persistent_cache()
    T = 60 if small else 900
    prob = BP.standard_problem(
        T=T, num_verts=512 if small else 10475,
        scene_pts=1024 if small else 100_489,
        num_iter=20 if small else 500)
    solver = prob.solver
    if solver.nn_impl != "grid":
        # this tool measures the production lazy-candidate path; off
        # TPU the solver defaults to 'xla' (no voxel grid), so force
        # grid mode for the CPU smoke run
        from fpv4d.solve.clip_solve import ClipSolver
        solver = ClipSolver(
            model=solver.model, vposer_params=solver.vposer_params,
            scene_verts=prob.scene, contact_vids=solver.contact_vids,
            contact_vids_left=solver.contact_vids_left,
            contact_vids_right=solver.contact_vids_right,
            config=solver.config, nn_impl="grid")
    state, target, weights = solver.init_state(
        jnp.asarray(prob.body), jnp.asarray(prob.cam))
    cands = solver._refresh_cands(state)
    ctx1 = solver.ctx._replace(grid=cands)
    mask = solver.phase_mask("local_a")
    mult = solver.config.local_contact_mult

    # batched problem: C copies of the same clip (identical FLOPs to
    # C independent solves — any per-clip ratio >1 is pure batching
    # overhead, not workload difference)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("clips", "frames"))
    mc = MultiClipSolver(solver=solver, mesh=mesh)
    bodies = np.broadcast_to(prob.body, (C,) + prob.body.shape)
    cams = np.broadcast_to(prob.cam, (C,) + prob.cam.shape)
    scenes = np.broadcast_to(prob.scene, (C,) + prob.scene.shape)
    state_b, target_b, weights_b = mc.init_batch(
        jnp.asarray(bodies), jnp.asarray(cams))
    scene_b = jnp.asarray(scenes)
    grid_b = mc._get_grids(scenes)
    refresh_b = mc._get_refresh((C, T, scene_b.shape[1], True), grid_b)
    cands_b = refresh_b(state_b, scene_b, grid=grid_b)

    from tools.ablate_common import adam_scan, steady_ms

    def timed(name, run, args, per_clip_div):
        ms, _ = steady_ms(run, args, steps, repeats=2, tag="fleet",
                          label=f"{name:22s}", per_div=per_clip_div,
                          unit="ms/step/clip")
        return ms

    scan_of = lambda loss_fn: adam_scan(loss_fn, steps)  # noqa: E731

    results = {}

    # the model tables / scenes / candidate grids ride through the
    # jitted scans as ARGUMENTS (the `args` half of carry_args), never
    # as closure captures — closure-captured big arrays become HLO
    # literals and multiply compile time (CLAUDE.md; Ctx pattern of
    # fpv4d/solve/clip_solve.py)

    # ---- full production step --------------------------------------
    def full_1(st_, tgt, wts, ctx):
        t = solver.terms(mask_stop_gradient(st_, mask), tgt, wts, ctx,
                         prune=solver._contact_prune)
        return t.contact * mult + t.smooth + t.rec + t.collision

    run, opt = scan_of(full_1)
    results["full_single"] = timed("full single", run,
                                   ((state, opt.init(state)),
                                    (target, weights, ctx1)), 1)

    def full_b(st_b, tgt_b, wts_b, cands_bb, ctx_base, scene1):
        def per_clip(st_, tgt, wts, cand_c):
            ctx = Ctx(model=ctx_base.model, vposer=ctx_base.vposer,
                      scene=scene1, grid=cand_c)
            t = solver.terms(mask_stop_gradient(st_, mask), tgt, wts,
                             ctx, prune=solver._contact_prune)
            return t.contact * mult + t.smooth + t.rec + t.collision
        cand_ax = jax.tree.map(lambda _: 0, cands_bb)
        return jnp.sum(jax.vmap(per_clip, in_axes=(0, 0, 0, cand_ax))(
            st_b, tgt_b, wts_b, cands_bb))

    run, opt = scan_of(full_b)
    results["full_batched"] = timed(
        "full batched", run,
        ((state_b, opt.init(state_b)),
         (target_b, weights_b, cands_b, ctx1, scene_b[0])), C)

    # ---- model chain only -------------------------------------------
    def model_1(st_, ctx):
        v, _, _ = forward_world(ctx, mask_stop_gradient(st_, mask),
                                vertex_subset=solver.contact_vids,
                                prune=solver._contact_prune)
        return jnp.sum(v * 1e-6)

    run, opt = scan_of(model_1)
    results["model_single"] = timed("model single", run,
                                    ((state, opt.init(state)),
                                     (ctx1,)), 1)

    def model_b(st_b, ctx):
        def per_clip(st_):
            v, _, _ = forward_world(ctx, mask_stop_gradient(st_, mask),
                                    vertex_subset=solver.contact_vids,
                                    prune=solver._contact_prune)
            return jnp.sum(v * 1e-6)
        return jnp.sum(jax.vmap(per_clip)(st_b))

    run, opt = scan_of(model_b)
    results["model_batched"] = timed(
        "model batched", run, ((state_b, opt.init(state_b)), (ctx1,)),
        C)

    # ---- candidate-NN only (free vertex variables) -------------------
    nv = len(solver.contact_vids)
    verts0, _, _ = forward_world(ctx1, state,
                                 vertex_subset=solver.contact_vids,
                                 prune=solver._contact_prune)

    def nn_1(v, cand, scene1):
        d = solver._nn(v, scene1, cand)
        return losses.robust_contact(d)

    run, opt = scan_of(nn_1)
    results["nn_single"] = timed("nn single", run,
                                 ((verts0, opt.init(verts0)),
                                  (cands, ctx1.scene)), 1)

    verts0_b = jnp.broadcast_to(verts0, (C,) + verts0.shape)

    def nn_b(v_b, cands_bb, scene1):
        def per_clip(v, cand):
            d = solver._nn(v, scene1, cand)
            return losses.robust_contact(d)
        cand_ax = jax.tree.map(lambda _: 0, cands_bb)
        return jnp.sum(jax.vmap(per_clip, in_axes=(0, cand_ax))(
            v_b, cands_bb))

    run, opt = scan_of(nn_b)
    results["nn_batched"] = timed(
        "nn batched", run,
        ((verts0_b, opt.init(verts0_b)), (cands_b, ctx1.scene)), C)

    # ---- skate step (the post-r4 fleet offender: 6.04 batched vs
    # 4.72 single ms/clip-step in BENCH_r04) --------------------------
    from fpv4d.solve.clip_solve import _grad_mask
    skate_mask = _grad_mask(body=True)
    wr = solver.detect_contact(state)
    wr_b = jnp.broadcast_to(wr, (C,) + wr.shape)

    def skate_1(st_, tgt, wts, wr_, ctx):
        rec, ls, vs, sk = solver.terms2(
            mask_stop_gradient(st_, skate_mask), tgt, wts, wr_, ctx)
        return vs + ls + rec + sk

    run, opt = scan_of(skate_1)
    results["skate_single"] = timed("skate single", run,
                                    ((state, opt.init(state)),
                                     (target, weights, wr, ctx1)), 1)

    def skate_b(st_b, tgt_b, wts_b, wr_bb, ctx):
        def per_clip(st_, tgt, wts, wr_):
            rec, ls, vs, sk = solver.terms2(
                mask_stop_gradient(st_, skate_mask), tgt, wts, wr_,
                ctx)
            return vs + ls + rec + sk
        return jnp.sum(jax.vmap(per_clip)(st_b, tgt_b, wts_b, wr_bb))

    run, opt = scan_of(skate_b)
    results["skate_batched"] = timed(
        "skate batched", run,
        ((state_b, opt.init(state_b)),
         (target_b, weights_b, wr_b, ctx1)), C)

    # skate sub-splits: the 2900-vert LBS chain alone, and the
    # [T,V,3] second-order smoothing alone on free vertex variables —
    # whichever inherits a batching tax names the skate offender
    def skate_model_1(st_, ctx):
        v, _, _ = forward_world(ctx, mask_stop_gradient(st_, skate_mask),
                                vertex_subset=solver._skate_vids,
                                prune=solver._skate_prune)
        return jnp.sum(v * 1e-6)

    run, opt = scan_of(skate_model_1)
    results["skate_model_single"] = timed(
        "skate model single", run, ((state, opt.init(state)), (ctx1,)),
        1)

    def skate_model_b(st_b, ctx):
        def per_clip(st_):
            v, _, _ = forward_world(
                ctx, mask_stop_gradient(st_, skate_mask),
                vertex_subset=solver._skate_vids,
                prune=solver._skate_prune)
            return jnp.sum(v * 1e-6)
        return jnp.sum(jax.vmap(per_clip)(st_b))

    run, opt = scan_of(skate_model_b)
    results["skate_model_batched"] = timed(
        "skate model batched", run,
        ((state_b, opt.init(state_b)), (ctx1,)), C)

    sverts0, _, _ = forward_world(ctx1, state,
                                  vertex_subset=solver._skate_vids,
                                  prune=solver._skate_prune)

    def smooth_1(v):
        return losses.second_order_smoothness(v)

    run, opt = scan_of(smooth_1)
    results["skate_smooth_single"] = timed(
        "skate smooth single", run, ((sverts0, opt.init(sverts0)), ()),
        1)

    sverts0_b = jnp.broadcast_to(sverts0, (C,) + sverts0.shape)

    def smooth_b(v_b):
        return jnp.sum(jax.vmap(losses.second_order_smoothness)(v_b))

    run, opt = scan_of(smooth_b)
    results["skate_smooth_batched"] = timed(
        "skate smooth batched", run,
        ((sverts0_b, opt.init(sverts0_b)), ()), C)

    # ---- refresh cost, amortized -------------------------------------
    for name, fn, args, div in (
            ("refresh single", solver._refresh_cands, (state,), 1),
            ("refresh batched",
             lambda s: refresh_b(s, scene_b, grid=grid_b),
             (state_b,), C)):
        fn(*args)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        # block_until_ready is NOT a reliable fence through the axon
        # tunnel (CLAUDE.md) — force a scalar readback off one leaf
        float(jnp.asarray(
            jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ms = (time.perf_counter() - t0) / 3 / div * 1e3
        # amortize over the production refresh interval
        per_step = ms / max(1, solver.config.contact_refresh_steps)
        print(f"[fleet] {name:22s} {ms:7.2f} ms/call/clip "
              f"({per_step:.3f} ms/step amortized)", file=sys.stderr)
        results[name.replace(" ", "_")] = ms

    import json
    print(json.dumps({"C": C, "steps": steps, **{
        k: round(v, 4) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
