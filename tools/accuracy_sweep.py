"""Accuracy-vs-time frontier of the clip solve (VERDICT r3 ask #4).

Same synthetic-truth fixture as tools/accuracy_report.py (identical
seeds/shapes: smooth GT motion, white parameter noise on the init,
contact saturated), swept over (num_iter x rec weight): the rec term
anchors the solve to the NOISY target, so the objective's optimum is a
compromise between data fidelity and smoothness — the sweep separates
under-convergence (more iters keep helping at fixed weights) from
objective bias (error plateaus per weight; moving the weight moves the
plateau). Matches the recovery question on the reference's cal_loss
(global_optimization.py:249-312).

Usage: python tools/accuracy_sweep.py [--frames 24] [--body-noise 0.05]
Prints one JSON line: [{iters, rec_w, mpjpe_mm, jitter_mm}, ...].
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--num-verts", type=int, default=512)
    ap.add_argument("--body-noise", type=float, default=0.05)
    ap.add_argument("--iters", type=int, nargs="+",
                    default=[60, 180, 600])
    ap.add_argument("--rec-weights", type=float, nargs="+",
                    default=[1.0, 0.3])
    a = ap.parse_args()

    import jax.numpy as jnp
    from fpv4d.config import ClipConfig, LossWeights
    from fpv4d.core import rotations
    from fpv4d.models import smplx as jsmplx, vposer as VP
    from fpv4d.models import params as P
    from fpv4d.ops import contact
    from fpv4d.solve.clip_solve import ClipSolver

    T = a.frames
    rng = np.random.RandomState(0)
    model = jsmplx.synthetic_model(num_verts=a.num_verts, seed=3)
    vp = VP.random_params(seed=3)

    def smooth(dim, scale, k=None):
        k = k or max(7, (T // 2) | 1)
        x = rng.randn(T + k - 1, dim)
        x = np.stack([np.convolve(x[:, i], np.ones(k) / k, "valid")
                      for i in range(dim)], 1)
        return (x * scale).astype(np.float32)

    latent_gt = smooth(32, 0.4)
    orient_gt = smooth(3, 0.1)
    cam_t_gt = (np.asarray([0.0, 0.0, 3.0], np.float32)
                + smooth(3, 0.15))
    body_gt = np.concatenate(
        [np.zeros((T, 3), np.float32), orient_gt,
         np.zeros((T, model.num_betas), np.float32), latent_gt,
         np.zeros((T, 24), np.float32), cam_t_gt], -1)
    noise = rng.randn(T, 75).astype(np.float32) * a.body_noise
    noise[:, 6:16] = 0
    body_noisy = body_gt + noise

    g = 24
    xs, zs = np.meshgrid(np.linspace(-4, 4, g), np.linspace(-4, 4, g))
    scene = np.stack([xs.ravel(), np.full(g * g, -10.0), zs.ravel()],
                     1).astype(np.float32)
    segs = contact.synthetic_segments(model.num_verts, seed=3)
    vl = np.asarray(segs["L_Leg"], np.int32)
    vr = np.asarray(segs["R_Leg"], np.int32)
    window = 6 if T % 6 == 0 else T
    cam = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))

    def cam_joints(body_75):
        d = P.split(jnp.asarray(body_75))
        o = model(betas=d["betas"], global_orient=d["global_orient"],
                  body_pose=VP.decode(vp, d["body_pose"]))
        return (np.asarray(o["joints"][:, :23])
                + np.asarray(d["camera_translation"])[:, None, :])

    def jitter(j):
        return float(np.linalg.norm(
            j[2:] - 2 * j[1:-1] + j[:-2], axis=-1).mean())

    jw_gt = cam_joints(body_gt)
    err0 = float(np.linalg.norm(cam_joints(body_noisy) - jw_gt,
                                axis=-1).mean())
    print(f"[sweep] init MPJPE {err0 * 1000:.1f} mm "
          f"(gt jitter {jitter(jw_gt) * 1000:.2f} mm)", file=sys.stderr)

    rows = []
    for rec_w in a.rec_weights:
        for iters in a.iters:
            cfg = ClipConfig(num_iter=iters, window=window, dct_num=3,
                             weights=LossWeights(rec=rec_w))
            solver = ClipSolver(model=model, vposer_params=vp,
                                scene_verts=scene,
                                contact_vids=np.concatenate([vl, vr]),
                                contact_vids_left=vl,
                                contact_vids_right=vr, config=cfg)
            st, _ = solver.fit(jnp.asarray(body_noisy),
                               jnp.asarray(cam), mode="local")
            jw = cam_joints(np.asarray(rotations.params_to_3d(
                st.body_6d)))
            err = float(np.linalg.norm(jw - jw_gt, axis=-1).mean())
            row = {"iters": iters, "rec_w": rec_w,
                   "mpjpe_mm": round(err * 1000, 2),
                   "jitter_mm": round(jitter(jw) * 1000, 3)}
            rows.append(row)
            print(f"[sweep] rec_w={rec_w} iters={iters}: "
                  f"MPJPE {err * 1000:.1f} mm, "
                  f"jitter {jitter(jw) * 1000:.2f} mm", file=sys.stderr)

    print(json.dumps({"init_mpjpe_mm": round(err0 * 1000, 2),
                      "rows": rows}))


if __name__ == "__main__":
    main()
