"""Per-frame body-parameter pkl contract (reference L1 data plumbing).

The pipeline's stage handoffs are directories of per-frame pickles:
  * ``body_gen/results/*/*.pkl`` — SMPLify-X outputs (read at
    global_optimization.py:688-703);
  * ``smoothed_body/*.pkl`` — smoother/clip-solver outputs, written
    one dict per frame (optimization.py:277-294,
    global_optimization.py:637-653), consumed by every visualizer.

Each dict holds [1,k] float arrays keyed transl / global_orient /
betas / body_pose / left_hand_pose / right_hand_pose /
camera_translation, plus — for clip-solve outputs — scalar 'scale' and
[4,4] 'camera_ext' (the contract the reference leaves undefined;
SURVEY.md section 0 item 2, global_vis.py:120-124).

Stage-granular checkpoint/resume falls out of this layout: re-running
any stage resumes from its input directory.
"""
from __future__ import annotations

import glob
import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from fpv4d.models import params as P


def load_frame(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_frame(path: str, param: Dict[str, np.ndarray]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(param, f)


def list_body_gen(body_path: str) -> List[str]:
    """SMPLify-X output layout: <body_path>/results/*/*.pkl, sorted
    (global_optimization.py:688)."""
    pkls = sorted(glob.glob(os.path.join(body_path, "results", "*",
                                         "*.pkl")))
    if not pkls:   # flattened layout (utils/helper.py output)
        pkls = sorted(glob.glob(os.path.join(body_path, "*.pkl")))
    return pkls


def load_clip(body_path: str) -> np.ndarray:
    """Directory of per-frame pkls -> packed [T,75] parameters
    (the vstack at global_optimization.py:694-707)."""
    rows = [P.from_pkl_dict(load_frame(p)) for p in list_body_gen(body_path)]
    if not rows:
        raise FileNotFoundError(f"no body pkls under {body_path}")
    return np.vstack(rows)


def save_clip(fit_path: str, body_75: np.ndarray,
              scale: Optional[float] = None,
              camera_ext: Optional[np.ndarray] = None,
              prefix: str = "body_gen_",
              extra: Optional[Dict[str, np.ndarray]] = None
              ) -> List[str]:
    """[T,75] (+scale/camera_ext) -> per-frame pkls
    ``<fit_path>/body_gen_%06d.pkl`` (global_optimization.py:649-653).

    extra: optional dict of [T, ...] arrays stored per frame under
    their own keys — e.g. jaw_pose/expression, which the reference's
    smplifyx-produced pkls carry and its visualizers filter out
    (vis.py:318-321)."""
    os.makedirs(fit_path, exist_ok=True)
    frames = P.encapsulate_frames(body_75, scale, camera_ext)
    paths = []
    for i, d in enumerate(frames):
        if extra:
            d = dict(d, **{k: np.asarray(v[i]) for k, v in
                           extra.items()})
        path = os.path.join(fit_path, f"{prefix}{i:06d}.pkl")
        with open(path, "wb") as f:
            pickle.dump(d, f)
        paths.append(path)
    return paths


def save_smoothed(fit_path: str, body_75: np.ndarray) -> List[str]:
    """Sequential-smoother layout: <fit_path>/smoothed_body/%06d.pkl
    (optimization.py:338)."""
    out_dir = os.path.join(fit_path, "smoothed_body")
    os.makedirs(out_dir, exist_ok=True)
    frames = P.encapsulate_frames(body_75)
    paths = []
    for i, d in enumerate(frames):
        path = os.path.join(out_dir, f"{i:06d}.pkl")
        with open(path, "wb") as f:
            pickle.dump(d, f)
        paths.append(path)
    return paths


def flatten_smplifyx_results(src_root: str, dst_dir: str) -> int:
    """Flatten <src>/results/*/*.pkl into <dst>/ sequential pkls —
    utils/helper.py's body_gen flattener."""
    os.makedirs(dst_dir, exist_ok=True)
    pkls = sorted(glob.glob(os.path.join(src_root, "results", "*",
                                         "*.pkl")))
    for i, src in enumerate(pkls):
        with open(src, "rb") as f:
            data = f.read()
        with open(os.path.join(dst_dir, f"body_gen_{i:06d}.pkl"),
                  "wb") as f:
            f.write(data)
    return len(pkls)
