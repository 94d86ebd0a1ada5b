"""COLMAP text-format parsers and converters (reference C9/C17).

Covers:
  * ``camerapose.txt`` (one line per frame: name qw qx qy qz tx ty tz)
    -> batched world-from-camera [T,4,4] (extract_ext,
    global_optimization.py:208-230);
  * ``images.txt`` -> ``camerapose.txt`` (utils/camerapose_helper.py);
  * ``points3D.txt`` -> xyz point array / .xyz file
    (utils/pointcloud_helper.py);
  * match-pair list generation for COLMAP's matcher with the temporal
    window pattern (utils/match_helper.py:31-50).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from fpv4d.core.transforms import colmap_pose_to_world_from_cam


def read_camerapose(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """camerapose.txt -> (qvec [T,4], tvec [T,3]).

    Line format: ``<name> qw qx qy qz tx ty tz`` (world-to-camera, the
    COLMAP images.txt convention kept by camerapose_helper)."""
    qs, ts = [], []
    with open(path) as f:
        for line in f:
            items = line.strip().split()
            if len(items) < 8:
                continue
            vals = [float(v) for v in items[1:8]]
            qs.append(vals[:4])
            ts.append(vals[4:7])
    return (np.asarray(qs, dtype=np.float32),
            np.asarray(ts, dtype=np.float32))


def camera_ext_from_file(path: str) -> jnp.ndarray:
    """camerapose.txt -> [T,4,4] world-from-camera matrices (the
    inverted extrinsics the clip solver seeds camera_ext with,
    global_optimization.py:213-224)."""
    q, t = read_camerapose(path)
    return colmap_pose_to_world_from_cam(jnp.asarray(q), jnp.asarray(t))


def images_txt_to_camerapose(images_txt: str, out_path: str) -> int:
    """COLMAP sparse/images.txt -> camerapose.txt, ordered by image
    name (utils/camerapose_helper.py behavior: skip the 4 comment
    lines, take every other line — pose lines alternate with 2D-point
    lines — and sort by the trailing image-name column)."""
    entries = []
    with open(images_txt) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    for ln in lines:
        if ln.startswith("#"):
            continue
        items = ln.split()
        # pose lines: IMAGE_ID qw qx qy qz tx ty tz CAMERA_ID NAME
        if len(items) == 10 and _is_float(items[1]):
            name = items[9]
            entries.append((name, items[1:8]))
    entries.sort(key=lambda e: e[0])
    with open(out_path, "w") as f:
        for name, vals in entries:
            f.write(name + " " + " ".join(vals) + "\n")
    return len(entries)


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def read_points3d(points3d_txt: str) -> np.ndarray:
    """COLMAP points3D.txt -> [N,3] float32 xyz (pointcloud_helper
    keeps columns 1:4 of each non-comment line)."""
    pts = []
    with open(points3d_txt) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            items = ln.split()
            pts.append([float(items[1]), float(items[2]),
                        float(items[3])])
    return np.asarray(pts, dtype=np.float32)


def write_xyz(points: np.ndarray, out_path: str) -> None:
    """[N,3] -> whitespace .xyz file (utils/pointcloud_helper.py
    output contract)."""
    with open(out_path, "w") as f:
        for p in np.asarray(points):
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def read_xyz(path: str) -> np.ndarray:
    return np.loadtxt(path, dtype=np.float32).reshape(-1, 3)


def match_pairs(image_names: Sequence[str],
                offsets: Sequence[int] = (60, 61, 70, 71, 80, 81, 90, 91)
                ) -> List[Tuple[str, str]]:
    """Temporal match-pair list for COLMAP's matcher: pair frame i
    with frames i+offset for the window pattern the reference emits
    (utils/match_helper.py:31-50)."""
    n = len(image_names)
    pairs = []
    for i in range(n):
        for off in offsets:
            j = i + off
            if j < n:
                pairs.append((image_names[i], image_names[j]))
    return pairs


def write_match_pairs(image_names: Sequence[str], out_path: str,
                      offsets: Sequence[int] = (60, 61, 70, 71, 80, 81,
                                                90, 91)) -> int:
    pairs = match_pairs(image_names, offsets)
    with open(out_path, "w") as f:
        for a, b in pairs:
            f.write(f"{a} {b}\n")
    return len(pairs)
