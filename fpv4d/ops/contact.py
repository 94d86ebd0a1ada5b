"""Contact-vertex registry: which SMPL-X vertices may touch the scene.

Replaces get_contact_id (global_optimization.py:79-94): loads PROX
body-segment JSONs ``{part}.json`` with ``verts_ind``/``faces_ind``
keys from a folder, dedups, and concatenates. Also provides a
synthetic fallback registry for tests/benchmarks when the PROX segment
files are absent (they are licensed assets).

Part names used by the pipeline: ['L_Leg','R_Leg'] for the clip solve
(global_optimization.py:676) and ['back','butt','L_Hand','R_Hand',
'L_Leg','R_Leg','thighs'] for the per-frame smoother
(optimization.py:317).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

CLIP_SOLVE_PARTS = ("L_Leg", "R_Leg")
FRAME_FIT_PARTS = ("back", "butt", "L_Hand", "R_Hand", "L_Leg", "R_Leg",
                   "thighs")
ALL_PARTS = ("back", "butt", "gluteus", "L_Hand", "R_Hand", "L_Leg",
             "R_Leg", "thighs")


def load_contact_ids(segments_folder: str,
                     parts: Sequence[str] = ("L_Hand", "R_Hand")
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Read {part}.json files -> (vert_ids, face_ids), each a
    concatenation of the per-part deduplicated index sets."""
    verts, faces = [], []
    for part in parts:
        with open(os.path.join(segments_folder, part + ".json")) as f:
            data = json.load(f)
        verts.append(np.asarray(sorted(set(data["verts_ind"])), np.int32))
        faces.append(np.asarray(sorted(set(data["faces_ind"])), np.int32))
    return np.concatenate(verts), np.concatenate(faces)


# PROX part name -> generating-bone joints of the synthetic model
# (SMPL-X joint ids; bone j spans joint j -> parent(j)). Matches what
# the real segment files name: L_Leg = calf+foot surface, thighs =
# upper legs, butt/gluteus = pelvis ring, back = spine, hands =
# finger surfaces.
_PART_BONES = {
    "L_Leg": (4, 7, 10), "R_Leg": (5, 8, 11),
    "thighs": (1, 2), "butt": (1, 2), "gluteus": (1, 2),
    "back": (3, 6, 9),
    "L_Hand": tuple(range(25, 40)), "R_Hand": tuple(range(40, 55)),
}


def synthetic_segments(num_verts: int, seed: int = 0,
                       parts: Sequence[str] = ALL_PARTS,
                       coherent: bool = False, model_seed: int = 0
                       ) -> Dict[str, List[int]]:
    """Deterministic fake segment map over a model with num_verts
    vertices, sized like PROX segments (hundreds of verts per leg).

    coherent=False (legacy fixtures): random disjoint id blocks per
    part — structurally WRONG for a real-artifact solve, whose 'L_Leg'
    names actual leg-surface vertices, but fine for tests that only
    need some contact set.
    coherent=True: ids are the synthetic model's vertices generated
    around that part's bones (_PART_BONES), matching the real segment
    files' body-part locality — with sparse_weights models this is
    what lets the clip solver's static FK pruning collapse the contact
    chain to the leg subtree, as it does on the licensed artifacts.
    model_seed must equal the synthetic_model seed (bone assignment is
    shared via smplx.synthetic_vertex_bones)."""
    if coherent:
        from fpv4d.models.smplx import synthetic_vertex_bones
        bones = synthetic_vertex_bones(num_verts, seed=model_seed)
        rng = np.random.RandomState(seed)
        out = {}
        for part in parts:
            ids = np.where(np.isin(bones, _PART_BONES[part]))[0]
            # PROX segments are subsets of the part surface; sample
            # like them (and keep leg sets hundreds-sized at 10k verts)
            keep = max(8, int(0.7 * len(ids)))
            if len(ids) > keep:
                ids = rng.choice(ids, size=keep, replace=False)
            out[part] = sorted(int(v) for v in ids)
        # parts generated from the SAME bone set (thighs/butt/gluteus
        # all ride the pelvis ring) would otherwise overlap ~70%,
        # double-weighting vertices for any caller that concatenates
        # parts — real PROX segments are disjoint surfaces. Dedup in
        # `parts` order AFTER sampling (a post-pass keeps the rng
        # stream, and therefore every other part's ids, unchanged).
        taken: Dict[tuple, set] = {}
        for part in parts:
            key = _PART_BONES[part]
            seen = taken.setdefault(key, set())
            uniq = [v for v in out[part] if v not in seen]
            out[part] = uniq if uniq else out[part][:8]
            seen.update(out[part])
        return out
    rng = np.random.RandomState(seed)
    per_part = max(8, num_verts // (len(parts) * 3))
    out = {}
    for i, part in enumerate(parts):
        ids = rng.choice(num_verts, size=per_part, replace=False)
        out[part] = sorted(int(v) for v in ids)
    return out


def write_synthetic_segments(folder: str, num_verts: int,
                             seed: int = 0) -> None:
    """Materialize synthetic {part}.json files in the reference's
    segment-file format."""
    os.makedirs(folder, exist_ok=True)
    segs = synthetic_segments(num_verts, seed)
    for part, ids in segs.items():
        with open(os.path.join(folder, part + ".json"), "w") as f:
            json.dump({"verts_ind": ids, "faces_ind": ids}, f)


def contact_ids(segments_folder: str, parts: Sequence[str],
                num_verts: int, seed: int = 0) -> np.ndarray:
    """Vertex ids for the given parts; falls back to the synthetic
    registry if the folder (or any part file) is missing."""
    try:
        vids, _ = load_contact_ids(segments_folder, parts)
        return vids
    except (FileNotFoundError, TypeError):
        segs = synthetic_segments(num_verts, seed)
        return np.concatenate([np.asarray(segs[p], np.int32)
                               for p in parts])
