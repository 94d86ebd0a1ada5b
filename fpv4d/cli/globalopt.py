"""Clip-level joint optimization CLI — the main entry point
(reference: ``python3 global_optimization.py <body_path> <fit_path>
<mode>``, global_optimization.py:655-715).

    python -m fpv4d.cli.globalopt BODY_PATH FIT_PATH MODE \
        [--scene meshed-poisson.ply] [--camera camerapose.txt] \
        [--model ./models] [--vposer ./vposer] \
        [--segments ./body_segments] [--iters 500]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("body_path", help="SMPLify-X output dir (body_gen)")
    p.add_argument("fit_path", help="output dir for per-frame pkls")
    p.add_argument("mode", choices=["local", "global", "dct"],
                   help="smoothing-term mode")
    p.add_argument("--scene", default=None,
                   help="scene mesh/cloud (.ply or .xyz)")
    p.add_argument("--camera", default=None,
                   help="camerapose.txt (defaults to sibling of scene)")
    p.add_argument("--model", default="./models")
    p.add_argument("--vposer", default="./vposer")
    p.add_argument("--segments", default="./body_segments")
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--lr", type=float, default=0.005)
    p.add_argument("--nn-impl", default=None,
                   choices=["grid", "pallas", "xla", "ref"],
                   help="contact NN backend (default: grid on TPU, "
                        "xla elsewhere)")
    p.add_argument("--cand-impl", default="auto",
                   choices=["auto", "xla", "xla_bf16", "pallas",
                            "pallas_interpret"],
                   help="per-step candidate-NN implementation "
                        "(default auto: bf16 selection on TPU)")
    p.add_argument("--skate-subset", type=int, default=0,
                   help="stratified vertex count for the anti-skate "
                        "smoothing estimator (default 0 = exact full "
                        "mesh, matching the reference semantics; "
                        "e.g. 2048 trades exactness for speed)")
    p.add_argument("--skate-body-only", action="store_true",
                   help="restrict the skate sample to body-subtree "
                        "vertices (zero weight on all hand/eye "
                        "joints) so the skate FK prunes to <=23 "
                        "joints; requires --skate-subset > 0")
    p.add_argument("--contact-compact", type=int, default=0,
                   help="refresh-time contact candidate-table "
                        "compaction budget (default 0 = full table, "
                        "exact reference semantics; e.g. 192 keeps "
                        "the most NN-contended candidates per frame "
                        "and shrinks the per-step contact pass)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="orbax-checkpoint solver state after each "
                        "phase (mid-optimization resume)")
    p.add_argument("--sdf-json", default=None,
                   help="PROX scene-SDF metadata json (with --sdf-npy "
                        "activates the collision term)")
    p.add_argument("--sdf-npy", default=None,
                   help="PROX scene-SDF values npy")
    p.add_argument("--verbose", action="store_true")
    return p


def main(argv=None) -> int:
    from fpv4d.cli import common
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    from fpv4d.config import ClipConfig
    from fpv4d.io import body_pkl, colmap
    from fpv4d.solve.clip_solve import ClipSolver

    body = body_pkl.load_clip(args.body_path)
    T = body.shape[0]
    print(f"[fpv4d.globalopt] {T} frames from {args.body_path}",
          file=sys.stderr)

    model = common.load_model(args.model)
    vp = common.load_vposer(args.vposer)
    scene = common.load_scene(args.scene)

    if args.camera and os.path.isfile(args.camera):
        cam = np.asarray(colmap.camera_ext_from_file(args.camera))[:T]
        if cam.shape[0] < T:
            pad = np.tile(cam[-1:], (T - cam.shape[0], 1, 1))
            cam = np.concatenate([cam, pad])
    else:
        print("[fpv4d.globalopt] no camerapose.txt -> identity camera "
              "init", file=sys.stderr)
        cam = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))

    nv = model.num_verts
    vids_l = common.load_contacts(args.segments, ["L_Leg"], nv)
    vids_r = common.load_contacts(args.segments, ["R_Leg"], nv)

    sdf = None
    if args.sdf_json and args.sdf_npy:
        from fpv4d.ops import sdf as SDF
        sdf = SDF.load_prox_sdf(args.sdf_json, args.sdf_npy)
        print("[fpv4d.globalopt] scene SDF loaded -> collision term "
              "active", file=sys.stderr)

    window = 60 if T % 60 == 0 else T
    cfg = ClipConfig(num_iter=args.iters, lr=args.lr, window=window,
                     skate_subset=args.skate_subset,
                     skate_body_only=args.skate_body_only,
                     contact_compact=args.contact_compact,
                     cand_impl=args.cand_impl)
    solver = ClipSolver(model=model, vposer_params=vp,
                        scene_verts=jnp.asarray(scene),
                        contact_vids=np.concatenate([vids_l, vids_r]),
                        contact_vids_left=vids_l,
                        contact_vids_right=vids_r, config=cfg,
                        nn_impl=args.nn_impl, sdf=sdf)

    state, hist = solver.fit(jnp.asarray(body), jnp.asarray(cam),
                             mode=args.mode, verbose=True,
                             checkpoint_dir=args.checkpoint_dir)
    body_out, scale, camera_ext = solver.result_params(state)
    paths = body_pkl.save_clip(args.fit_path, body_out, scale, camera_ext)
    print(f"[fpv4d.globalopt] wrote {len(paths)} pkls to {args.fit_path} "
          f"(scale={scale:.4f})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
