"""Full-solve ablation of contact_compact (refresh-time candidate
compaction, ops/nn.py compact_candidates) on the bench problem.

The per-step win was sized by tools/probe_cand_p.py with arbitrary
table slices (P=512 3.855 / 256 3.335 / 192 2.964 ms/step at the
a-phase); this tool measures the REAL thing end-to-end: the public-API
`solver.fit` (warm + steady) with compaction active in the refresh
executables, so refresh overhead (scoring + top_k every
contact_refresh_steps) and accuracy (final per-phase losses) are both
included.

Usage:
  python tools/ablate_compact.py                  # local @ 0/256/192
  FPV4D_ABL_COMPACT=192 FPV4D_ABL_MODES=global,dct \
      python tools/ablate_compact.py              # winner, other modes

Env: FPV4D_ABL_COMPACT comma list (default "0,256,192"),
     FPV4D_ABL_MODES comma list (default "local").
Emits one JSON line per (compact, mode) and a final summary JSON.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    compacts = [int(x) for x in os.environ.get(
        "FPV4D_ABL_COMPACT", "0,256,192").split(",")]
    modes = os.environ.get("FPV4D_ABL_MODES", "local").split(",")

    import jax.numpy as jnp
    from fpv4d.utils import bench_problem as BP

    BP.enable_persistent_cache()
    rows = []
    for compact in compacts:
        prob = BP.standard_problem(T=900, num_verts=10475,
                                   scene_pts=100_489, num_iter=500,
                                   contact_compact=compact)
        body_j = jnp.asarray(prob.body)
        cam_j = jnp.asarray(prob.cam)
        for mode in modes:
            t0 = time.perf_counter()
            state, hist = prob.solver.fit(body_j, cam_j, mode=mode)
            _ = float(state.scale)                  # tunnel-safe fence
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, hist = prob.solver.fit(body_j, cam_j, mode=mode)
            _ = float(state.scale)
            dt = time.perf_counter() - t0
            finals = {k: round(float(v[-1]), 6) for k, v in hist.items()}
            row = {"compact": compact, "mode": mode,
                   "steady_s": round(dt, 3),
                   "first_s": round(t_first, 1), "final": finals}
            rows.append(row)
            print("[ablate_compact] " + json.dumps(row), flush=True)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
