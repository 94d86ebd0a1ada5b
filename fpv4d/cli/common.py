"""Shared CLI plumbing: asset loading with graceful synthetic
fallbacks (the SMPL-X npz, VPoser ckpt, and PROX body segments are
licensed artifacts the user supplies; everything else works without
them so the pipeline is runnable end-to-end out of the box)."""
from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

import numpy as np


def load_model(model_path: Optional[str], num_verts: int = 10475):
    """SMPL-X model: real npz if given/found, else synthetic."""
    from fpv4d.models import smplx as jsmplx
    if model_path:
        for cand in (model_path,
                     os.path.join(model_path, "smplx",
                                  "SMPLX_NEUTRAL.npz"),
                     os.path.join(model_path, "SMPLX_NEUTRAL.npz")):
            if os.path.isfile(cand):
                print(f"[fpv4d] SMPL-X model: {cand}", file=sys.stderr)
                return jsmplx.load_npz(cand)
    print("[fpv4d] SMPL-X npz not found -> synthetic stand-in model "
          f"({num_verts} verts)", file=sys.stderr)
    return jsmplx.synthetic_model(num_verts=num_verts)


def load_vposer(ckpt_path: Optional[str]):
    """VPoser decoder params: converted torch snapshot if available,
    else deterministic random weights."""
    from fpv4d.models import vposer
    if ckpt_path and os.path.exists(ckpt_path):
        path = ckpt_path
        if os.path.isdir(path):
            import glob
            snaps = sorted(glob.glob(os.path.join(path, "snapshots",
                                                  "*.pt"))) + \
                sorted(glob.glob(os.path.join(path, "*.pt"))) + \
                sorted(glob.glob(os.path.join(path, "*.ckp")))
            path = snaps[-1] if snaps else None
        if path and os.path.isfile(path):
            try:
                import torch
                sd = torch.load(path, map_location="cpu",
                                weights_only=False)
                if hasattr(sd, "state_dict"):
                    sd = sd.state_dict()
                if "state_dict" in sd:
                    sd = sd["state_dict"]
                print(f"[fpv4d] VPoser ckpt: {path}", file=sys.stderr)
                return vposer.params_from_torch_state_dict(sd)
            except Exception as e:      # fall through to random
                print(f"[fpv4d] VPoser ckpt load failed ({e}) -> "
                      "random weights", file=sys.stderr)
    print("[fpv4d] VPoser ckpt not found -> deterministic random "
          "decoder", file=sys.stderr)
    return vposer.random_params()


def load_scene(scene_path: Optional[str], num_pts_fallback: int = 10000
               ) -> np.ndarray:
    """Scene vertices from .ply/.xyz, else a synthetic floor plane."""
    if scene_path and os.path.isfile(scene_path):
        if scene_path.endswith(".ply"):
            from fpv4d.io.ply import read_ply
            v, _ = read_ply(scene_path)
            return v
        from fpv4d.io.colmap import read_xyz
        return read_xyz(scene_path)
    print("[fpv4d] scene not found -> synthetic floor plane",
          file=sys.stderr)
    g = int(np.sqrt(num_pts_fallback))
    xs, zs = np.meshgrid(np.linspace(-5, 5, g), np.linspace(-5, 5, g))
    return np.stack([xs.ravel(), np.full(g * g, -1.0), zs.ravel()],
                    1).astype(np.float32)


def load_contacts(segments_folder: Optional[str], parts, num_verts: int
                  ) -> np.ndarray:
    from fpv4d.ops import contact
    return contact.contact_ids(segments_folder or "", tuple(parts),
                               num_verts)
