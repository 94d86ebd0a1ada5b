"""A/B the static joint-support FK pruning on the bench workload.

Times the local_a production step (lazy candidates, grad + Adam, as a
50-step lax.scan) three ways on identical inputs:

  prune_on    solver as-built (contact FK restricted to the leg
              subtree support, SmplxModel.joint_support)
  prune_off   same solver programs with pruning force-disabled
  fwd split   model-only fwd+bwd with/without pruning (isolates the
              FK/LBS chain from the NN term)

Also reports the candidate-validity fraction of the contact NN tables
(the coherent leg contact sets sit near the floor, so their candidate
tables are denser than the r2/r3 random sets' — this is the workload
realism change, separate from pruning).

Usage: python tools/ablate_prune.py      [FPV4D_ABL_STEPS=50]
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

    BP.enable_persistent_cache()
    T = 60 if small else 900
    prob = BP.standard_problem(
        T=T, num_verts=512 if small else 10475,
        scene_pts=1024 if small else 100_489,
        num_iter=20 if small else 500)
    solver = prob.solver
    state, target, weights = solver.init_state(
        jnp.asarray(prob.body), jnp.asarray(prob.cam))
    assert solver._contact_prune is not None, \
        "bench workload must engage pruning"
    print(f"[ablate_prune] contact verts={len(solver.contact_vids)} "
          f"support={len(solver._contact_prune[0])}/55 joints",
          file=sys.stderr)

    if solver._use_lazy_contact("local_a"):
        cands = solver._refresh_cands(state)
        ctx = solver.ctx._replace(grid=cands)
        valid = getattr(cands, "valid", None)
        if valid is not None:
            frac = float(jnp.mean(valid.astype(jnp.float32)))
            print(f"[ablate_prune] candidate validity frac={frac:.3f}",
                  file=sys.stderr)
    else:
        ctx = solver.ctx
    mask = solver.phase_mask("local_a")

    from tools.ablate_common import adam_scan, steady_ms

    def timed_scan(name, loss_fn, extra):
        run, opt = adam_scan(loss_fn, steps)
        ms, _ = steady_ms(run, ((state, opt.init(state)), extra),
                          steps, tag="ablate_prune",
                          label=f"{name:18s}")
        return ms

    results = {}
    for tag, prune in (("on", solver._contact_prune), ("off", None)):

        def full_loss(st_, ctx_, tgt, wts, _p=prune):
            t = solver.terms(mask_stop_gradient(st_, mask), tgt, wts,
                             ctx_, prune=_p)
            return (t.contact * solver.config.local_contact_mult
                    + t.smooth + t.rec + t.collision)

        results[f"full_{tag}"] = timed_scan(
            f"full prune={tag}", full_loss, (ctx, target, weights))

        def model_loss(st_, ctx_, _p=prune):
            verts_w, _, _ = forward_world(
                ctx_, mask_stop_gradient(st_, mask),
                vertex_subset=solver.contact_vids, prune=_p)
            return jnp.sum(verts_w * 1e-6)

        results[f"model_{tag}"] = timed_scan(
            f"model prune={tag}", model_loss, (ctx,))

    import json
    print(json.dumps({"steps": steps, "small": small, **results}))


if __name__ == "__main__":
    main()
