"""Visualization CLI — covers the reference's five vis scripts:

  ego smoothed   -> vis.py            (smoothed_body overlay)
  ego baseline   -> baseline_vis.py   (raw body_gen overlay)
  ego local      -> local_vis.py      (scale-aware overlay + joints)
  world          -> global_vis.py     (fixed first-frame viewpoint)
  world --follow -> interactive_vis.py camera-following mode
  interactive    -> interactive_vis.py live windowed event loop
                    (headless rebuild: browser-driven HTTP viewer)
  pack           -> pack_videosoutputs.py

    python -m fpv4d.cli.vis ego FITTING_DIR [--source smoothed|baseline|local]
    python -m fpv4d.cli.vis world FITTING_DIR --scene scene.ply --out render0
    python -m fpv4d.cli.vis interactive FITTING_DIR --scene scene.ply --port 8089
    python -m fpv4d.cli.vis pack VIS_DIR [--out out.mp4]
"""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    ego = sub.add_parser("ego", help="egocentric overlay")
    ego.add_argument("fitting_dir")
    ego.add_argument("--source", default="smoothed",
                     choices=["smoothed", "baseline", "local"])
    ego.add_argument("--model", default="./models")
    ego.add_argument("--vposer", default="./vposer")
    ego.add_argument("--limit", type=int, default=None)

    world = sub.add_parser("world", help="world-coordinate render")
    world.add_argument("fitting_dir")
    world.add_argument("--scene", required=True)
    world.add_argument("--out", default="render0")
    world.add_argument("--follow", action="store_true",
                       help="camera-following viewpoint")
    world.add_argument("--orbit", action="store_true",
                       help="turntable sweep around the scene (the "
                            "windowed viewer's orbit mode, offline)")
    world.add_argument("--orbit-turns", type=float, default=1.0,
                       help="revolutions over the clip with --orbit")
    world.add_argument("--model", default="./models")
    world.add_argument("--vposer", default="./vposer")
    world.add_argument("--limit", type=int, default=None)

    ia = sub.add_parser("interactive",
                        help="live viewer (HTTP event loop — the "
                             "windowed interactive_vis.py, headless)")
    ia.add_argument("fitting_dir")
    ia.add_argument("--scene", required=True)
    ia.add_argument("--port", type=int, default=8089)
    ia.add_argument("--host", default="127.0.0.1")
    ia.add_argument("--model", default="./models")
    ia.add_argument("--vposer", default="./vposer")
    ia.add_argument("--limit", type=int, default=None)

    pack = sub.add_parser("pack", help="frames -> video")
    pack.add_argument("vis_dir")
    pack.add_argument("--out", default=None)
    pack.add_argument("--fps", type=int, default=30)
    return p


def main(argv=None) -> int:
    from fpv4d.cli import common
    args = build_parser().parse_args(argv)

    if args.cmd == "pack":
        from fpv4d.vis.export import pack_vis_outputs
        ok, err = pack_vis_outputs(args.vis_dir, args.out, args.fps)
        if not ok:
            print(f"[fpv4d.vis] pack failed: {err}", file=sys.stderr)
            return 1
        return 0

    model = common.load_model(args.model)
    vp = common.load_vposer(args.vposer)

    if args.cmd == "ego":
        from fpv4d.vis.ego_overlay import render_dir
        n = render_dir(args.fitting_dir, model, vp, source=args.source,
                       limit=args.limit)
        print(f"[fpv4d.vis] rendered {n} overlay frames",
              file=sys.stderr)
        return 0

    if args.cmd == "world":
        from fpv4d.vis.world_view import render_dir
        scene = common.load_scene(args.scene)
        n = render_dir(args.fitting_dir, model, vp, scene, args.out,
                       follow=args.follow, orbit=args.orbit,
                       orbit_turns=args.orbit_turns, limit=args.limit)
        print(f"[fpv4d.vis] rendered {n} world frames to {args.out}",
              file=sys.stderr)
        return 0

    if args.cmd == "interactive":
        from fpv4d.vis.interactive import InteractiveViewer, make_server
        scene = common.load_scene(args.scene)
        viewer = InteractiveViewer(args.fitting_dir, model, vp, scene,
                                   limit=args.limit)
        srv = make_server(viewer, port=args.port, host=args.host)
        print(f"[fpv4d.vis] interactive viewer: "
              f"http://{args.host}:{srv.server_address[1]}/ "
              f"({viewer.num_frames} frames; ctrl-c to stop)",
              file=sys.stderr)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.server_close()
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
