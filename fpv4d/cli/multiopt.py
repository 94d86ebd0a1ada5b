"""Multi-clip sharded joint optimization CLI — BASELINE config 5
("N egocentric videos sharded across the chips of a slice").

    python -m fpv4d.cli.multiopt CLIP_DIR [CLIP_DIR ...] \
        --out OUT_ROOT --mode global \
        [--scene-name meshed-poisson.ply] [--camera-name camerapose.txt] \
        [--frames T] [--mesh clips=4,frames=2]

Each CLIP_DIR follows the reference's per-video layout (README.md:28-38):
body_gen pkls + scene mesh/cloud + camerapose.txt. All clips are
solved simultaneously: decision variables batch over a leading clip
axis sharded across the device mesh; scenes are padded to a common
size, voxel grids batch per clip.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_mesh(spec: str):
    axes = {}
    for part in spec.split(","):
        k, v = part.split("=")
        axes[k.strip()] = int(v)
    return axes


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("clips", nargs="+", help="clip directories")
    p.add_argument("--out", required=True)
    p.add_argument("--mode", default="global",
                   choices=["local", "global", "dct"])
    p.add_argument("--scene-name", default="meshed-poisson.ply")
    p.add_argument("--camera-name", default="camerapose.txt")
    p.add_argument("--frames", type=int, default=None,
                   help="truncate/align all clips to T frames")
    p.add_argument("--mesh", default=None,
                   help="mesh spec, e.g. clips=4 or clips=4,frames=2 "
                   "(default: all devices on the clip axis)")
    p.add_argument("--model", default="./models")
    p.add_argument("--vposer", default="./vposer")
    p.add_argument("--segments", default="./body_segments")
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--contact-compact", type=int, default=0,
                   help="refresh-time contact candidate-table "
                        "compaction budget (default 0 = full table; "
                        "see globalopt --contact-compact)")
    p.add_argument("--sdf-json", default=None,
                   help="PROX scene-SDF metadata json (with --sdf-npy "
                        "activates the collision term; one SDF shared "
                        "by all clips)")
    p.add_argument("--sdf-npy", default=None,
                   help="PROX scene-SDF values npy")
    return p


def main(argv=None) -> int:
    from fpv4d.cli import common
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from fpv4d.config import ClipConfig
    from fpv4d.io import body_pkl, colmap
    from fpv4d.parallel import sharding as SH
    from fpv4d.parallel.multi_clip import MultiClipSolver, pad_scenes
    from fpv4d.solve.clip_solve import ClipSolver

    bodies, cams, scenes = [], [], []
    for clip in args.clips:
        body = body_pkl.load_clip(os.path.join(clip, "body_gen")
                                  if os.path.isdir(
                                      os.path.join(clip, "body_gen"))
                                  else clip)
        scene = common.load_scene(os.path.join(clip, args.scene_name))
        cam_path = os.path.join(clip, args.camera_name)
        T = body.shape[0]
        if os.path.isfile(cam_path):
            cam = np.asarray(colmap.camera_ext_from_file(cam_path))[:T]
            if cam.shape[0] < T:
                cam = np.concatenate(
                    [cam, np.tile(cam[-1:], (T - cam.shape[0], 1, 1))])
        else:
            cam = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
        bodies.append(body)
        cams.append(cam)
        scenes.append(scene)

    T = args.frames or min(b.shape[0] for b in bodies)
    bodies = np.stack([b[:T] for b in bodies])
    cams = np.stack([c[:T] for c in cams])
    print(f"[fpv4d.multiopt] {len(args.clips)} clips x {T} frames on "
          f"{len(jax.devices())} devices", file=sys.stderr)

    model = common.load_model(args.model)
    vp = common.load_vposer(args.vposer)
    nv = model.num_verts
    vids_l = common.load_contacts(args.segments, ["L_Leg"], nv)
    vids_r = common.load_contacts(args.segments, ["R_Leg"], nv)

    sdf = None
    if args.sdf_json and args.sdf_npy:
        from fpv4d.ops import sdf as SDF
        sdf = SDF.load_prox_sdf(args.sdf_json, args.sdf_npy)
        print("[fpv4d.multiopt] scene SDF loaded -> collision term "
              "active", file=sys.stderr)

    window = 60 if T % 60 == 0 else T
    cfg = ClipConfig(num_iter=args.iters, window=window,
                     contact_compact=args.contact_compact)
    solver = ClipSolver(model=model, vposer_params=vp,
                        scene_verts=scenes[0],
                        contact_vids=np.concatenate([vids_l, vids_r]),
                        contact_vids_left=vids_l,
                        contact_vids_right=vids_r, config=cfg, sdf=sdf)

    n_dev = len(jax.devices())
    axes = parse_mesh(args.mesh) if args.mesh else \
        {"clips": min(n_dev, len(args.clips))}
    mesh = SH.make_mesh(axes)
    mc = MultiClipSolver(solver=solver, mesh=mesh,
                         frame_axis="frames" if "frames" in axes
                         else None)
    state_b, hist = mc.fit(jnp.asarray(bodies), jnp.asarray(cams),
                           jnp.asarray(pad_scenes(list(scenes))),
                           mode=args.mode)
    for phase, h in hist.items():
        print(f"[fpv4d.multiopt] {phase}: mean loss {h[0].mean():.4f} "
              f"-> {h[-1].mean():.4f}", file=sys.stderr)

    for c, (body_out, scale, camera_ext) in enumerate(
            mc.result_params(state_b)):
        name = os.path.basename(os.path.normpath(args.clips[c]))
        out_dir = os.path.join(args.out, name)
        paths = body_pkl.save_clip(out_dir, body_out, scale, camera_ext)
        print(f"[fpv4d.multiopt] {name}: {len(paths)} pkls "
              f"(scale={scale:.4f})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
