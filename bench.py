"""Headline benchmark: 900-frame clip-level joint optimization
wall-clock (BASELINE.md north star: < 60 s on TPU; reference workload
is 300 frames x 500-700 Adam iterations on a single CUDA GPU with
per-iteration host syncs, global_optimization.py:491-556).

Runs the full 'local'-mode schedule (400 + 100 + 200 steps at the
reference's 0.8/0.2/0.4 split) on a synthetic SMPL-X-sized problem:
10,475 vertices, 55 joints, ~870 contact vertices, 100k-point scene
cloud. Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 60/value}

Env knobs: FPV4D_BENCH_FRAMES (default 900), FPV4D_BENCH_SMALL=1 for a
CPU-friendly smoke run.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    small = os.environ.get("FPV4D_BENCH_SMALL") == "1"
    T = int(os.environ.get("FPV4D_BENCH_FRAMES", "60" if small else "900"))
    num_verts = 512 if small else 10475
    scene_pts = 1024 if small else 100_489      # 317^2 grid
    num_iter = 20 if small else 500

    import jax
    # persistent compilation cache: phase programs are identical
    # across bench runs, so recompiles (2-3 min of AOT time on the
    # remote TPU compiler) are skipped after the first run
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from fpv4d.config import ClipConfig
    from fpv4d.models import smplx as jsmplx
    from fpv4d.models import vposer
    from fpv4d.ops import contact
    from fpv4d.solve.clip_solve import ClipSolver

    backend = jax.default_backend()
    print(f"[bench] backend={backend} T={T} V={num_verts} "
          f"scene={scene_pts} iters={num_iter}", file=sys.stderr)

    # the synthetic model takes ~20s of single-core numpy to generate;
    # cache its arrays next to the compilation cache
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    model_cache = os.path.join(cache_dir, f"synthmodel_{num_verts}.npz")
    if os.path.exists(model_cache):
        data = np.load(model_cache)
        model = jsmplx.SmplxModel(
            **{k: jnp.asarray(data[k]) for k in jsmplx.SmplxModel._LEAVES},
            faces=data["faces"])
    else:
        model = jsmplx.synthetic_model(num_verts=num_verts, seed=0)
        np.savez(model_cache, faces=model.faces,
                 **{k: np.asarray(getattr(model, k))
                    for k in jsmplx.SmplxModel._LEAVES})
    vp = vposer.random_params(seed=0)
    rng = np.random.RandomState(0)

    g = int(np.sqrt(scene_pts))
    xs, zs = np.meshgrid(np.linspace(-5, 5, g), np.linspace(-5, 5, g))
    scene = np.stack([xs.ravel(), -1.0 + 0.05 * rng.randn(g * g),
                      zs.ravel()], 1).astype(np.float32)

    segs = contact.synthetic_segments(num_verts, seed=0)
    vids_l = np.asarray(segs["L_Leg"], np.int32)
    vids_r = np.asarray(segs["R_Leg"], np.int32)

    cfg = ClipConfig(num_iter=num_iter, window=60 if T % 60 == 0 else T,
                     dct_num=5)
    solver = ClipSolver(model=model, vposer_params=vp,
                        scene_verts=scene,  # np: grid builds host-side, device upload is lazy
                        contact_vids=np.concatenate([vids_l, vids_r]),
                        contact_vids_left=vids_l,
                        contact_vids_right=vids_r, config=cfg)

    # smooth synthetic clip (same statistics as tests/helpers.py)
    def smooth_noise(T, dim, scale):
        k = 11
        x = rng.randn(T + k - 1, dim)
        x = np.stack([np.convolve(x[:, i], np.ones(k) / k, mode="valid")
                      for i in range(dim)], 1)
        return (x * scale).astype(np.float32)

    body = np.zeros((T, 75), dtype=np.float32)
    body[:, 0:3] = smooth_noise(T, 3, 0.3)
    body[:, 3:6] = smooth_noise(T, 3, 0.2)
    body[:, 6:16] = rng.randn(10) * 0.3
    body[:, 16:48] = smooth_noise(T, 32, 0.5)
    body[:, 48:75] = smooth_noise(T, 27, 0.2)
    cam = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    cam[:, :3, 3] = smooth_noise(T, 3, 0.5)

    body_j = jnp.asarray(body)
    cam_j = jnp.asarray(cam)

    # warm-up: compile all phase programs on a tiny run is not possible
    # (shapes differ), so compile the real ones once and time the
    # second full solve (compile cache makes re-runs realistic).
    t0 = time.perf_counter()
    state, hist = solver.fit(body_j, cam_j, mode="local")
    jax.block_until_ready(state.body_6d)
    t_first = time.perf_counter() - t0
    print(f"[bench] first solve (incl compile): {t_first:.2f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    state, hist = solver.fit(body_j, cam_j, mode="local")
    jax.block_until_ready(state.body_6d)
    dt = time.perf_counter() - t0

    total_steps = sum(len(v) for v in hist.values())
    fps = T * total_steps / dt
    print(f"[bench] steady solve: {dt:.2f}s ({total_steps} steps, "
          f"{fps:.0f} frame-iters/s)", file=sys.stderr)
    for k, v in hist.items():
        print(f"[bench]   {k}: {v[0]:.4f} -> {v[-1]:.4f}",
              file=sys.stderr)

    # secondary headline (stderr): frames/sec of SMPL-X keypoint
    # fitting per chip — the fit-from-keypoints entry point (the
    # reference's external smplifyx stage takes "up to several hours"
    # per 300-frame clip, README.md:14)
    try:
        from fpv4d.config import KeypointFitConfig
        from fpv4d.solve.keypoint_fit import fit_keypoints, project, \
            BODY25_FROM_SMPLX
        from fpv4d.models import vposer as VPm
        kcfg = KeypointFitConfig(num_iter=10 if small else 120)
        valid = BODY25_FROM_SMPLX >= 0
        ids = np.where(valid, BODY25_FROM_SMPLX, 0)
        lat = jnp.asarray(rng.randn(T, 32).astype(np.float32) * 0.3)
        out_gt = model(betas=jnp.zeros((T, 10)),
                       global_orient=jnp.zeros((T, 3)),
                       body_pose=VPm.decode(vp, lat))
        j_cam = np.asarray(out_gt["joints"])[:, ids] + np.array(
            [0.0, 0.0, 3.0], np.float32)
        center = jnp.asarray([kcfg.image_size[0] / 2,
                              kcfg.image_size[1] / 2])
        j2d = np.asarray(project(jnp.asarray(j_cam), kcfg.focal_length,
                                 center))
        kp = np.concatenate(
            [j2d, np.tile(valid.astype(np.float32)[None, :, None],
                          (T, 1, 1))], -1)
        fit_keypoints(model, vp, kp, kcfg)      # compile
        t0 = time.perf_counter()
        fit_keypoints(model, vp, kp, kcfg)
        dt_fit = time.perf_counter() - t0
        print(f"[bench] keypoint fit: {T} frames x "
              f"{3 * kcfg.num_iter} steps in {dt_fit:.2f}s -> "
              f"{T / dt_fit:.0f} frames/s per chip", file=sys.stderr)
    except Exception as e:
        print(f"[bench] keypoint-fit secondary metric skipped: {e}",
              file=sys.stderr)

    print(json.dumps({
        "metric": f"clip_joint_opt_{T}f_local_mode_wallclock",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(60.0 / dt, 3),
    }))


if __name__ == "__main__":
    main()
