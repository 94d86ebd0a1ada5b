"""HBM-capacity probe for the fleet workload: largest clip batch C
that fits on one chip.

The axon PJRT plugin exposes no memory_stats counters, so peak HBM for
the C=8 fleet run cannot be read directly — this probes it the only
way available: grow C geometrically until an allocation fails, then
bisect to the boundary. Each point compiles + runs a short
MultiClipSolver.fit at the full fleet shapes (T=900, 10,475-vert
model; num_iter is tiny — scan length does not change peak working
set, which lives in the per-step forward+backward). The implied
per-clip footprint (16 GB v5e HBM / C_max) is the recorded figure.

Usage: python tools/hbm_probe.py [--start 8] [--tmax 64]
Prints one JSON line. Run AFTER bench.py, never concurrently with
another TPU process.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def try_c(C: int, prob, num_iter: int = 2) -> tuple[bool, float, str]:
    """One fit at clip count C. Returns (fits, seconds, error)."""
    import jax
    import jax.numpy as jnp
    from fpv4d.parallel import sharding as SH
    from fpv4d.parallel.multi_clip import MultiClipSolver, pad_scenes
    from fpv4d.solve.clip_solve import ClipSolver

    cfg = dataclasses.replace(prob.solver.config, num_iter=num_iter)
    solver = ClipSolver(model=prob.solver.model,
                       vposer_params=prob.solver.vposer_params,
                       scene_verts=prob.scene,
                       contact_vids=prob.solver.contact_vids,
                       contact_vids_left=prob.solver.contact_vids_left,
                       contact_vids_right=prob.solver.contact_vids_right,
                       config=cfg)
    mesh = SH.make_mesh({"clips": 1})
    mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None)
    bodies = jnp.asarray(np.tile(np.asarray(prob.body)[None],
                                 (C, 1, 1)))
    cams = jnp.asarray(np.tile(np.asarray(prob.cam)[None],
                               (C, 1, 1, 1)))
    scenes = jnp.asarray(pad_scenes([np.asarray(prob.scene)] * C))
    t0 = time.time()
    try:
        sb, _ = mc.fit(bodies, cams, scenes, mode="local")
        jax.block_until_ready(sb.body_6d)
        float(sb.body_6d.reshape(-1)[0])     # tunnel-safe fence
        return True, time.time() - t0, ""
    except Exception as e:                    # RESOURCE_EXHAUSTED etc.
        return False, time.time() - t0, f"{type(e).__name__}: {e}"[:200]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=8)
    ap.add_argument("--tmax", type=int, default=64,
                    help="give up growing past this C")
    a = ap.parse_args()

    import os
    from fpv4d.utils import bench_problem as BP
    BP.enable_persistent_cache()
    if os.environ.get("FPV4D_BENCH_SMALL") == "1":   # CPU smoke
        prob = BP.standard_problem(T=12, num_verts=256, scene_pts=64,
                                   num_iter=4, skate_subset=0)
        a.start, a.tmax = min(a.start, 2), min(a.tmax, 4)
    else:
        prob = BP.standard_problem()

    results = {}
    lo, hi = 0, None          # lo = largest fitting, hi = smallest failing
    C = a.start
    while True:
        ok, dt, err = try_c(C, prob)
        results[C] = {"fits": ok, "s": round(dt, 1),
                      **({"error": err} if err else {})}
        print(f"[hbm_probe] C={C}: {'OK' if ok else 'OOM/FAIL'} "
              f"({dt:.0f}s) {err}", file=sys.stderr)
        if ok:
            lo = max(lo, C)
            if C >= a.tmax:
                break
            C = min(2 * C, a.tmax) if hi is None else (lo + hi) // 2
        else:
            hi = C if hi is None else min(hi, C)
            C = (lo + hi) // 2                # bisects DOWN from
        if C < 1 or C in results:             # --start too when the
            break                             # first point fails;
        if hi is not None and hi - lo <= max(1, lo // 8):
            break                             # boundary bracketed

    out = {"max_clips_per_chip": lo,
           "first_failing_c": hi,
           "implied_gb_per_clip": (round(16.0 / lo, 2) if lo else None),
           "points": {str(k): v for k, v in sorted(results.items())}}
    # persist beside bench_out.json: bench.py folds the latest record
    # into extras.multi_clip.hbm_probe (the probe must run AFTER bench
    # — it drives the chip to OOM — so the fold-in is one run behind;
    # tools/round_close.sh re-folds it into bench_out.json same-round)
    if os.environ.get("FPV4D_BENCH_SMALL") != "1":
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "hbm_probe_out.json")
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[hbm_probe] -> {out_path}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
