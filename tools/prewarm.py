"""Prewarm the persistent compilation cache for the standard
production shapes, so a fresh deployment's first real solve is seconds
instead of the 90-380 s of remote-AOT compilation measured in
PERFORMANCE.md (cold-start section).

Runs every production program once at the standard shapes — all three
clip-solve modes (local incl. contact detection + skate, global, dct)
plus the keypoint-fit entry point — with jax's persistent compilation
cache pointed at the repo-local `.jax_cache/`. Execution cost on top
of compilation is ~15 s; everything else is the compile time this tool
exists to pay ONCE.

Writes `.jax_cache/prewarm_stats.json` recording whether the run was
cold (empty cache) and how long it took; bench.py folds that record
into its extras so the round artifact carries a measured
cold-vs-warm pair.

Usage:
  python tools/prewarm.py                 # production shapes (TPU)
  python tools/prewarm.py --small         # tiny shapes (CPU smoke)
  python tools/prewarm.py --frames 1800   # additional clip length
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def prewarm(T: int, small: bool, modes: list[str],
            keypoint: bool = True,
            cache_dir: str | None = None) -> dict:
    from fpv4d.utils import bench_problem as BP

    cache_dir = BP.enable_persistent_cache(cache_dir)
    n_before = len(glob.glob(os.path.join(cache_dir, "jit_*")))
    cold = n_before == 0

    import jax
    import jax.numpy as jnp

    num_verts = 512 if small else 10475
    scene_pts = 1024 if small else 100_489
    # step counts must match production schedules: the compiled phase
    # programs are keyed by (phase, num_steps) shapes
    num_iter = 20 if small else 500
    num_iter_dct = 40 if small else 10000

    t0 = time.perf_counter()
    prob = BP.standard_problem(
        T=T, num_verts=num_verts, scene_pts=scene_pts,
        num_iter=num_iter, num_iter_dct=num_iter_dct,
        cache_dir=cache_dir)
    body_j = jnp.asarray(prob.body)
    cam_j = jnp.asarray(prob.cam)

    per_mode = {}
    for mode in modes:
        tm = time.perf_counter()
        state, _ = prob.solver.fit(body_j, cam_j, mode=mode)
        jax.block_until_ready(state.body_6d)
        per_mode[mode] = round(time.perf_counter() - tm, 2)
        print(f"[prewarm] mode {mode}: {per_mode[mode]:.1f}s "
              f"(incl. any compiles)", file=sys.stderr)

    if keypoint:
        from fpv4d.config import KeypointFitConfig
        from fpv4d.solve.keypoint_fit import (fit_keypoints, project,
                                              BODY25_FROM_SMPLX)
        kcfg = KeypointFitConfig(num_iter=10 if small else 120)
        rng = np.random.RandomState(0)
        valid = BODY25_FROM_SMPLX >= 0
        ids = np.where(valid, BODY25_FROM_SMPLX, 0)
        out = prob.model(betas=jnp.zeros((T, 10)),
                         global_orient=jnp.zeros((T, 3)),
                         body_pose=jnp.zeros((T, 63)))
        j_cam = np.asarray(out["joints"])[:, ids] + np.asarray(
            [0.0, 0.0, 3.0], np.float32)
        center = jnp.asarray([kcfg.image_size[0] / 2,
                              kcfg.image_size[1] / 2])
        j2d = np.asarray(project(jnp.asarray(j_cam), kcfg.focal_length,
                                 center))
        kp = np.concatenate(
            [j2d + rng.randn(*j2d.shape).astype(np.float32),
             np.tile(valid.astype(np.float32)[None, :, None],
                     (T, 1, 1))], -1).astype(np.float32)
        tm = time.perf_counter()
        fit_keypoints(prob.model, prob.vp, jnp.asarray(kp), kcfg)
        per_mode["keypoint_fit"] = round(time.perf_counter() - tm, 2)
        print(f"[prewarm] keypoint fit: {per_mode['keypoint_fit']:.1f}s",
              file=sys.stderr)

    total = time.perf_counter() - t0
    n_after = len(glob.glob(os.path.join(cache_dir, "jit_*")))
    stats = {
        "frames": T, "cold": cold, "total_s": round(total, 2),
        "per_entry_s": per_mode,
        "cache_entries_before": n_before,
        "cache_entries_after": n_after,
        "backend": jax.default_backend(),
    }
    with open(os.path.join(cache_dir, "prewarm_stats.json"), "w") as f:
        json.dump(stats, f)
    print(f"[prewarm] {'COLD' if cold else 'warm'} run: {total:.1f}s "
          f"total, cache {n_before} -> {n_after} entries",
          file=sys.stderr)
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=900)
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (CPU smoke test)")
    ap.add_argument("--modes", default="local,global,dct")
    ap.add_argument("--no-keypoint", action="store_true")
    ap.add_argument("--cache-dir", default=None,
                    help="compilation-cache directory (default: the "
                         "repo-local .jax_cache)")
    a = ap.parse_args()
    if a.small:
        a.frames = min(a.frames, 12)
    print(json.dumps(prewarm(a.frames, a.small, a.modes.split(","),
                             keypoint=not a.no_keypoint,
                             cache_dir=a.cache_dir)))


if __name__ == "__main__":
    main()
