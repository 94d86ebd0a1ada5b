"""2-D-mesh scaling analysis (VERDICT r1 item 8).

Counts the XLA collectives in the compiled sharded clip-solve step and
measures CPU-mesh weak scaling (1 -> 8 virtual devices; fixed work per
device). Run:

    env PYTHONPATH= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_report.py

Output feeds the "2-D mesh scaling" section of PERFORMANCE.md.
"""
from __future__ import annotations

import os
import re
import sys
import time

if "--xla_force_host_platform_device_count" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from fpv4d.config import ClipConfig  # noqa: E402
from fpv4d.models import smplx as jsmplx  # noqa: E402
from fpv4d.models import vposer  # noqa: E402
from fpv4d.ops import contact  # noqa: E402
from fpv4d.parallel import sharding as SH  # noqa: E402
from fpv4d.parallel.multi_clip import MultiClipSolver, pad_scenes  # noqa: E402
from fpv4d.solve.clip_solve import ClipSolver  # noqa: E402

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter")


def count_collectives(jitted, *args):
    hlo = jitted.lower(*args).compile().as_text()
    return {c: len(re.findall(rf"{c}(\.\d+)?\(", hlo))
            for c in COLLECTIVES}


def build(T, window, num_verts=128, scene_pts=256):
    model = jsmplx.synthetic_model(num_verts=num_verts, seed=2)
    vp = vposer.random_params(seed=2)
    rng = np.random.RandomState(2)
    g = int(np.sqrt(scene_pts))
    xs, zs = np.meshgrid(np.linspace(-3, 3, g), np.linspace(-3, 3, g))
    scene = np.stack([xs.ravel(), np.full(g * g, -1.0), zs.ravel()],
                     1).astype(np.float32)
    segs = contact.synthetic_segments(num_verts, seed=2)
    cfg = ClipConfig(num_iter=8, window=window, dct_num=3,
                     contact_refresh_steps=0)
    solver = ClipSolver(model=model, vposer_params=vp, scene_verts=scene,
                        contact_vids=np.concatenate(
                            [segs["L_Leg"], segs["R_Leg"]]),
                        contact_vids_left=np.asarray(segs["L_Leg"],
                                                     np.int32),
                        contact_vids_right=np.asarray(segs["R_Leg"],
                                                      np.int32),
                        config=cfg, use_pallas=False)
    body = rng.randn(T, 75).astype(np.float32) * 0.1
    cam = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    return solver, body, cam, scene, rng


def collective_counts(T=None, frames=4):
    """Frame-sharded step: collectives with aligned vs replicated
    c_dct sharding. Returns the per-layout counts (also printed) so
    tests can smoke this path — its closure-reaching lowering
    duplicates build_sharded_step's program signature and silently
    drifts when that signature changes (it did in r4's None-tolerant
    wrapper collapse)."""
    T, window = (T or 32), 4             # W windows, `frames` shards
    solver, body, cam, scene, rng = build(T, window)
    mesh = SH.make_mesh({"clips": 2, "frames": frames})
    mc = MultiClipSolver(solver=solver, mesh=mesh)
    C = 2
    bodies = jnp.asarray(np.tile(body[None], (C, 1, 1)))
    cams = jnp.asarray(np.tile(cam[None], (C, 1, 1, 1)))
    scenes = jnp.asarray(pad_scenes([scene] * C))
    state_b, target_b, weights_b = mc.init_batch(bodies, cams)

    print(f"== collectives per compiled dct_a step "
          f"(T={T}, window={window}, mesh clips=2 x frames={frames}) ==")
    results = {}
    for tag, dct_windows in (("c_dct P(clips) [replicated over frames]",
                              None),
                             ("c_dct P(clips, frames) [aligned windows]",
                              T // window)):
        sb, tb, wb, scb = SH.shard_batch(mesh, state_b, target_b,
                                         weights_b, scenes)
        if dct_windows is None:          # force the replicated layout
            sh = SH.clip_batch_shardings(mesh, dct_windows=None)
            sb = jax.device_put(sb, sh["state"])
        step_fn, init_fn = SH.build_sharded_step(
            solver, mesh, "dct_a", grid_b=None, num_steps=1,
            dct_windows=dct_windows)
        opt_state = init_fn(sb)
        jitted = step_fn.__closure__  # noqa: F841 (doc: jit inside)
        # count on the underlying jit by lowering through a wrapper
        import fpv4d.parallel.sharding as S

        def run(sb, opt_state, tb, wb, scb):
            return step_fn(sb, opt_state, tb, wb, scb)

        # lower via jax.jit of the closure (step_fn already jitted
        # inside; compile and read the HLO of a direct call)
        out = step_fn(sb, opt_state, tb, wb, scb)
        jax.block_until_ready(out[2])
        # reach the jitted callable: it is the only jit in the closure
        cells = [c.cell_contents for c in step_fn.__closure__
                 if hasattr(c.cell_contents, "lower")]
        jitted = cells[0]
        # the collapsed None-tolerant program's signature (sharding.py
        # build_sharded_step): (ctx, scene, grid, sdf, state,
        # opt_state, target, weights, extra) — grid/sdf ride as None
        counts = count_collectives(jitted, solver.ctx, scb, None,
                                   None, sb, opt_state, tb, wb,
                                   jnp.zeros((), jnp.float32))
        total = sum(counts.values())
        print(f"  {tag}: total={total}  " + "  ".join(
            f"{k}={v}" for k, v in counts.items() if v))
        results[tag] = counts
    return results


def weak_scaling():
    """Fixed per-device work (1 clip of T=24 per device), 1 -> 8
    devices on the clips axis."""
    T, window = 24, 4
    solver, body, cam, scene, rng = build(T, window)
    print(f"== weak scaling (T={T}/clip, 1 clip per device, 'local' "
          f"8 steps + skate) ==")
    base = None
    for n in (1, 2, 4, 8):
        mesh = SH.make_mesh({"clips": n})
        mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None)
        C = n
        bodies = jnp.asarray(np.tile(body[None], (C, 1, 1))
                             + rng.randn(C, T, 75).astype(np.float32)
                             * 0.01)
        cams = jnp.asarray(np.tile(cam[None], (C, 1, 1, 1)))
        scenes = jnp.asarray(pad_scenes([scene] * C))
        state_b, hist = mc.fit(bodies, cams, scenes, mode="local")
        jax.block_until_ready(state_b.body_6d)
        t0 = time.perf_counter()
        state_b, hist = mc.fit(bodies, cams, scenes, mode="local")
        jax.block_until_ready(state_b.body_6d)
        dt = time.perf_counter() - t0
        if base is None:
            base = dt
        # the 8 virtual devices share ONE physical core, so ideal
        # weak scaling here is the serialized time n*base; efficiency
        # = n*base/dt measures sharding overhead (collectives,
        # resharding), not parallel speedup
        print(f"  devices={n}: {dt:.3f}s  sharding-overhead-adjusted "
              f"efficiency={min(1.0, n * base / dt) * 100:.0f}% "
              f"(1-core emulation; ideal = {n}x base)")


if __name__ == "__main__":
    collective_counts()
    weak_scaling()
