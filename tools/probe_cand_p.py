"""Timing probe: how does the production a-phase (and dct_b) step
cost scale with the candidate count P of the lazy contact tables?

Slices the refresh-built FrameCands to P' (WRONG semantics — some
true NNs vanish — right shapes/timing) to size the win of a real
refresh-time compaction before building one.

Usage: python tools/probe_cand_p.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    steps = int(os.environ.get("FPV4D_ABL_STEPS", "50"))

    import jax
    import jax.numpy as jnp
    from fpv4d.utils import bench_problem as BP
    from fpv4d.ops import nn as NN
    from fpv4d.solve.clip_solve import mask_stop_gradient

    BP.enable_persistent_cache()
    # contact_compact=0: this probe slices the FULL refresh table —
    # compaction would shrink it below the P values being swept
    prob = BP.standard_problem(T=900, num_verts=10475,
                               scene_pts=100_489, num_iter=500,
                               contact_compact=0)
    solver = prob.solver
    body_j = jnp.asarray(prob.body)
    cam_j = jnp.asarray(prob.cam)
    state, target, weights = solver.init_state(body_j, cam_j)
    opt_state = solver._opt.init(state)
    assert solver._use_lazy_contact("local_a")
    cands = solver._refresh_cands(state)
    mask = solver.phase_mask("local_a")

    from tools.ablate_common import adam_scan, steady_ms

    # how many candidates are within "contention" of being a NN?
    q, _, _ = None, None, None
    from fpv4d.solve.clip_solve import forward_world
    verts_w, _, _ = forward_world(solver.ctx, state,
                                  vertex_subset=solver.contact_vids,
                                  prune=solver._contact_prune)

    @jax.jit
    def contention(q, cands):
        d = jnp.sum((q[:, :, None, :] - cands.cand[:, None, :, :]) ** 2,
                    -1)
        d = jnp.where(cands.valid[:, None, :], d, NN.BIG)
        dnn = jnp.min(d, axis=-1, keepdims=True)           # [T,N,1]
        score = jnp.min(d - dnn, axis=1)                   # [T,P]
        score = jnp.where(cands.valid, score, np.inf)
        h = solver._grid.h if solver._grid is not None else 0.25
        near = jnp.sum(score <= (2.0 * h) ** 2, axis=-1)   # per frame
        return near, jnp.sum(cands.valid, -1)

    near, nval = contention(verts_w, cands)
    near = np.asarray(near)
    nval = np.asarray(nval)
    print(f"[probe] valid/frame mean={nval.mean():.0f} max={nval.max()}"
          f" | within (2h)^2 of NN: mean={near.mean():.0f}"
          f" p95={np.percentile(near, 95):.0f} max={near.max()}")

    for P in (512, 384, 320, 256, 192):
        c = NN.FrameCands(cand=cands.cand[:, :P],
                          valid=cands.valid[:, :P])

        def loss_fn(st_, ctx_, tgt, wts):
            return solver.phase_loss(
                "local_a", mask_stop_gradient(st_, mask), tgt, wts,
                ctx_)

        ctx = solver.ctx._replace(grid=c)
        run, opt = adam_scan(loss_fn, steps)
        carry = (state, opt.init(state))
        ms, _ = steady_ms(run, (carry, (ctx, target, weights)), steps,
                          tag="probe", label=f"local_a P={P:4d}")


if __name__ == "__main__":
    main()
