"""Anti-skate subset ablation (VERDICT r4 ask #5).

The local-mode skate phase (200 steps of terms2) became the critical
path after r4's joint pruning (skate 4.72 ms/step = 37% of the 2.54 s
solve), and its `skate_subset` default (2048 stratified vertices +
both feet) had never been ablated against what it estimates: the
whole-mesh smoothing term of the reference's cal_loss2
(/root/reference/global_optimization.py:404-405).

For each subset size this sweeps, from ONE shared post-local_b state:
  * ms/step of the production 200-step skate scan (the cost);
  * the subset estimator's relative error on the vert-smooth term at
    that state, vs the exact full-mesh value (the estimator quality);
  * the EXACT full-mesh terms2 values at the phase's final state (the
    outcome: does optimizing the estimate move the true objective the
    same way?).

Usage: python tools/ablate_skate.py [--subsets 512,1024,2048,4096,0]
Prints one JSON line; persists ablate_skate_out.json on full runs.
Run on the real TPU chip (ONE client at a time).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subsets", default="512,1024,2048,4096,0",
                    help="comma list; a 'b' suffix (e.g. 1024b) sets "
                         "skate_body_only=True for that row")
    ap.add_argument("--steps", type=int, default=200,
                    help="skate phase length (reference: 0.4 x 500)")
    a = ap.parse_args()
    subsets = [(int(s.rstrip("b")), s.endswith("b"))
               for s in a.subsets.split(",")]

    import jax
    import jax.numpy as jnp
    from fpv4d.solve.clip_solve import ClipSolver
    from fpv4d.utils import bench_problem as BP

    BP.enable_persistent_cache()
    small = os.environ.get("FPV4D_BENCH_SMALL") == "1"
    if small:
        prob = BP.standard_problem(T=12, num_verts=256, scene_pts=64,
                                   num_iter=4)
        subsets = [(64, False), (64, True), (0, False)]
        a.steps = 4
    else:
        prob = BP.standard_problem()
    solver0 = prob.solver
    body = jnp.asarray(prob.body)
    cam = jnp.asarray(prob.cam)
    cfg = solver0.config

    # ONE shared pre-skate state: local_a + local_b on the default
    # solver, then the planted-foot weights (identical for every
    # subset — detect reads only the feet)
    state, target, weights = solver0.init_state(body, cam)
    opt_state = solver0._opt.init(state)
    n_a = int(cfg.num_iter * cfg.stage_split)
    state, opt_state, _ = solver0._run_phase_auto(
        state, opt_state, target, weights, n_a, "local_a")
    state, opt_state, _ = solver0._run_phase_auto(
        state, opt_state, target, weights, cfg.num_iter - n_a,
        "local_b")
    wr = solver0.detect_contact(state)
    _ = float(np.asarray(wr).ravel()[0])
    print(f"[ablate_skate] shared pre-skate state ready "
          f"(T={body.shape[0]})", file=sys.stderr)

    # exact (full-mesh) terms2 evaluator — the ground truth every
    # subset's outcome is scored against
    import dataclasses
    solver_full = ClipSolver(
        model=solver0.model, vposer_params=solver0.vposer_params,
        scene_verts=prob.scene, contact_vids=solver0.contact_vids,
        contact_vids_left=solver0.contact_vids_left,
        contact_vids_right=solver0.contact_vids_right,
        config=dataclasses.replace(cfg, skate_subset=0))

    @jax.jit
    def exact_terms(ctx, st, target, weights, wr):
        rec, local_s, vert_s, skate = solver_full.terms2(
            st, target, weights, wr)
        return jnp.stack([rec, local_s, vert_s, skate])

    t_pre = np.asarray(exact_terms(solver_full.ctx, state, target,
                                   weights, wr))
    print(f"[ablate_skate] exact terms at pre-state: rec={t_pre[0]:.6f}"
          f" local={t_pre[1]:.6f} vert={t_pre[2]:.6f} "
          f"skate={t_pre[3]:.6f}", file=sys.stderr)

    rows = {}
    for s, body_only in subsets:
        key = f"{s}b" if body_only else str(s)
        sv = ClipSolver(
            model=solver0.model, vposer_params=solver0.vposer_params,
            scene_verts=prob.scene, contact_vids=solver0.contact_vids,
            contact_vids_left=solver0.contact_vids_left,
            contact_vids_right=solver0.contact_vids_right,
            config=dataclasses.replace(cfg, skate_subset=s,
                                       skate_body_only=body_only))
        n_verts = (len(sv._skate_vids) if sv._skate_vids is not None
                   else sv.model.num_verts)
        # estimator quality at the shared state (vert-smooth term);
        # jitted — an eager terms2 is a tunnel-latency chain
        v_sub = float(jax.jit(
            lambda ctx, st, t, w, r: sv.terms2(st, t, w, r, ctx)[2]
        )(sv.ctx, state, target, weights, wr))
        est_rel_err = abs(v_sub - float(t_pre[2])) / max(
            abs(float(t_pre[2])), 1e-12)
        # production scan: compile + steady
        out = sv._run_skate_phase(state, opt_state, target, weights,
                                  a.steps, wr)
        _ = float(out[2][-1])
        t0 = time.perf_counter()
        out = sv._run_skate_phase(state, opt_state, target, weights,
                                  a.steps, wr)
        _ = float(out[2][-1])
        dt = time.perf_counter() - t0
        # outcome: exact full-mesh terms at the final state
        t_post = np.asarray(exact_terms(solver_full.ctx, out[0],
                                        target, weights, wr))
        rows[key] = {
            "verts": int(n_verts),
            "body_only": body_only,
            "ms_per_step": round(dt / a.steps * 1e3, 3),
            "vert_smooth_rel_err": round(est_rel_err, 5),
            "exact_final": {
                "rec": round(float(t_post[0]), 6),
                "local_smooth": round(float(t_post[1]), 6),
                "vert_smooth": round(float(t_post[2]), 6),
                "skate": round(float(t_post[3]), 6)},
            "prune_engaged": sv._skate_prune is not None,
        }
        print(f"[ablate_skate] subset={key} ({n_verts} verts): "
              f"{dt / a.steps * 1e3:.3f} ms/step, est_rel_err "
              f"{est_rel_err:.4f}, exact final vert_smooth "
              f"{t_post[2]:.6f} skate {t_post[3]:.6f}",
              file=sys.stderr)

    out = {"steps": a.steps, "frames": int(body.shape[0]),
           "exact_pre": {"vert_smooth": round(float(t_pre[2]), 6),
                         "skate": round(float(t_pre[3]), 6)},
           "subsets": rows}
    if not small:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ablate_skate_out.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[ablate_skate] -> {path}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
