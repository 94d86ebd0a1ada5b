"""Sequential per-frame smoothing CLI (reference: ``python3
optimization.py <gen_path> <fit_path>``, optimization.py:297-350).

    python -m fpv4d.cli.smooth GEN_PATH FIT_PATH \
        [--mode sequential|independent|motion] [--iters 50] [--lr 0.1]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("gen_path", help="SMPLify-X output dir")
    p.add_argument("fit_path", help="output root (smoothed_body/ created)")
    p.add_argument("--mode", default="sequential",
                   choices=["sequential", "independent", "motion"])
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--motion-ckpt", default="./motion_model/epoch-30.ckp")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    from fpv4d.config import FrameFitConfig
    from fpv4d.io import body_pkl
    from fpv4d.solve import frame_fit

    body = body_pkl.load_clip(args.gen_path)
    print(f"[fpv4d.smooth] {body.shape[0]} frames, mode={args.mode}",
          file=sys.stderr)
    cfg = FrameFitConfig(num_iter=args.iters, lr=args.lr)

    if args.mode == "independent":
        out = frame_fit.fit_independent(jnp.asarray(body), cfg)
    elif args.mode == "motion":
        from fpv4d.models import motion_gru
        import os
        params = motion_gru.random_params()
        if os.path.isfile(args.motion_ckpt):
            try:
                import torch
                ckpt = torch.load(args.motion_ckpt, map_location="cpu",
                                  weights_only=False)
                sd = ckpt.get("model_state_dict", ckpt)
                params = motion_gru.params_from_torch_state_dict(sd)
                print(f"[fpv4d.smooth] GRU ckpt: {args.motion_ckpt}",
                      file=sys.stderr)
            except Exception as e:
                print(f"[fpv4d.smooth] GRU ckpt load failed ({e}) -> "
                      "random weights", file=sys.stderr)
        out = frame_fit.fit_sequential_motion(jnp.asarray(body), params,
                                              cfg)
    else:
        out = frame_fit.fit_sequential(jnp.asarray(body), cfg)

    paths = body_pkl.save_smoothed(args.fit_path, np.asarray(out))
    print(f"[fpv4d.smooth] wrote {len(paths)} pkls under "
          f"{args.fit_path}/smoothed_body", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
