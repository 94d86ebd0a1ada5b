"""Headline benchmark: 900-frame clip-level joint optimization
wall-clock (BASELINE.md north star: < 60 s on TPU; reference workload
is 300 frames x 500-700 Adam iterations on a single CUDA GPU with
per-iteration host syncs, global_optimization.py:491-556).

Runs the full 'local'-mode schedule (400 + 100 + 200 steps at the
reference's 0.8/0.2/0.4 split) on a synthetic SMPL-X-sized problem:
10,475 vertices, 55 joints, ~870 contact vertices, 100k-point scene
cloud — then benches the 'global' and 'dct' reference modes, per-phase
roofline numbers (FLOPs + bytes from XLA cost analysis -> achieved
TFLOP/s, GB/s, MFU), the keypoint-fit entry point, the Pallas brute-NN
kernel against the XLA brute path (compiled on hardware, so Mosaic
regressions surface here), and optionally the sharded multi-clip path.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 60/value,
   "extras": {...}}

Env knobs:
  FPV4D_BENCH_FRAMES   clip length (default 900)
  FPV4D_BENCH_SMALL=1  CPU-friendly smoke run
  FPV4D_BENCH_MODES    comma list, default "local,global,dct"
  FPV4D_BENCH_MULTI=N  bench MultiClipSolver with N batched clips
                       (the per-chip fleet workload; default 8 on
                       full TPU runs, 0 disables, 1 = legacy 2-clip)
  FPV4D_BENCH_SKATE_SUBSET  stratified-vertex count for the anti-skate
                       phase (default 2048; 0 = exact full mesh)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# v5e chip peaks (public: cloud.google.com/tpu/docs/v5e): 197 TFLOP/s
# bf16 on the MXU, 819 GB/s HBM bandwidth. MFU is reported against the
# bf16 peak (f32 matmuls run as bf16 passes on this hardware).
PEAK_FLOPS = {"tpu": 197e12, "cpu": 1e11}
PEAK_BYTES = {"tpu": 819e9, "cpu": 1e10}


def _timed_ms(f, *args, n: int = 10) -> float:
    """Pipelined per-call ms: n async dispatches, one scalar readback
    as the fence (single-shot timing through the axon tunnel is
    dominated by the ~25ms+ roundtrip latency, not throughput)."""
    out = f(*args)
    _ = float(np.asarray(out).reshape(-1)[0])
    t0 = time.perf_counter()
    for _i in range(n):
        out = f(*args)
    _ = float(np.asarray(out).reshape(-1)[0])
    return round((time.perf_counter() - t0) / n * 1e3, 2)


def _cost(jitted, *args):
    """FLOPs + bytes of a compiled program via XLA cost analysis."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception as e:  # cost analysis is best-effort
        print(f"[bench] cost_analysis failed: {e}", file=sys.stderr)
        return 0.0, 0.0


def _phase_stats(solver, state, opt_state, target, weights, steps,
                 phase, backend, weight_right=None):
    """Run one phase, timed, and return (new state/opt, stats dict)."""
    if phase == "skate":
        run = lambda: solver._run_skate_phase(
            state, opt_state, target, weights, steps, weight_right)
    else:
        run = lambda: solver._run_phase(state, opt_state, target,
                                        weights, steps, phase)
    import jax
    out = run()                      # compile (cached across runs)
    jax.block_until_ready(out[0].body_6d)
    t0 = time.perf_counter()
    out = run()
    jax.block_until_ready(out[0].body_6d)
    dt = time.perf_counter() - t0

    # Roofline cost basis: a standalone jit of the scan BODY (one
    # loss -> masked grad -> Adam step, ClipSolver.phase_step_body).
    # XLA cost analysis counts a lax.scan body once but ALSO counts
    # the phase program's prologue — ctx/table reads and, for dct_a,
    # the hoisted once-per-phase SMPL-X forward — which is how r02
    # published a physically impossible 229 TB/s for dct_a. The body
    # program is exactly what the steady scan executes per step.
    body_fn = solver.phase_step_body(phase)
    if phase == "skate":
        flops, nbytes = _cost(body_fn, solver.ctx, state, opt_state,
                              target, weights, weight_right)
    elif phase == "dct_a":
        from fpv4d.solve.clip_solve import forward_world
        joints_w = jax.jit(lambda ctx, st: forward_world(
            ctx, st, vertex_subset=solver.contact_vids,
            prune=solver._contact_prune)[1]
        )(solver.ctx, state)
        flops, nbytes = _cost(body_fn, joints_w, state, opt_state)
    else:
        flops, nbytes = _cost(body_fn, solver.ctx, state, opt_state,
                              target, weights)
    dt_step = dt / steps
    # NOTE on the bytes columns: "logical" bytes come from HLO cost
    # analysis, which counts every fusion's operands/outputs — a
    # buffer feeding several fusions is counted once per consumer, so
    # the number is an UPPER BOUND on physical HBM traffic and
    # logical_bytes_frac can exceed 1.0 for well-fused programs. The
    # FLOPs columns (and mfu) are exact.
    stats = {
        "steps": steps,
        "final_loss": float(out[2][-1]),
        "ms_per_step": round(dt_step * 1e3, 3),
        "gflops_per_step": round(flops / 1e9, 2),
        "tflops_achieved": round(flops / dt_step / 1e12, 3),
        "mfu": round(flops / dt_step / PEAK_FLOPS.get(backend, 1e18),
                     4),
        "logical_gbps": round(nbytes / dt_step / 1e9, 1),
        "logical_bytes_frac": round(nbytes / dt_step
                                    / PEAK_BYTES.get(backend, 1e18), 4),
    }
    # the production path for contact phases is the lazy-refresh
    # candidate-table variant (_run_phase_auto); the exact-grid
    # numbers above are the semantic roofline
    if phase != "skate" and solver._use_lazy_contact(phase):
        out = solver._run_phase_auto(state, opt_state, target, weights,
                                     steps, phase)
        jax.block_until_ready(out[0].body_6d)
        t0 = time.perf_counter()
        out = solver._run_phase_auto(state, opt_state, target, weights,
                                     steps, phase)
        _ = float(out[2][-1])
        dt_lazy = (time.perf_counter() - t0) / steps
        stats["ms_per_step_lazy"] = round(dt_lazy * 1e3, 3)
        # production (lazy candidate-table) cost basis: the same scan
        # body, but the contact term reads per-frame candidate tables
        # instead of the full scene grid
        cands = solver._refresh_cands(state)
        flops_l, nbytes_l = _cost(body_fn,
                                  solver.ctx._replace(grid=cands),
                                  state, opt_state, target, weights)
        stats["lazy"] = {
            "gflops_per_step": round(flops_l / 1e9, 2),
            "tflops_achieved": round(flops_l / dt_lazy / 1e12, 3),
            "mfu": round(flops_l / dt_lazy
                         / PEAK_FLOPS.get(backend, 1e18), 4),
            "logical_gbps": round(nbytes_l / dt_lazy / 1e9, 1),
            "logical_bytes_frac": round(
                nbytes_l / dt_lazy / PEAK_BYTES.get(backend, 1e18), 4),
        }
    return out[0], out[1], dt, stats


def bench_mode(solver, body_j, cam_j, mode, backend, phases_out):
    """Steady-state wall-clock of one full mode schedule, per-phase
    roofline stats collected into phases_out."""
    import jax
    cfg = solver.config
    state, target, weights = solver.init_state(body_j, cam_j)
    opt_state = solver._opt.init(state)
    total = 0.0
    hist = {}
    if mode == "local":
        n_a = int(cfg.num_iter * cfg.stage_split)
        sched = [("local_a", n_a), ("local_b", cfg.num_iter - n_a)]
    elif mode == "global":
        n_a = int(cfg.num_iter * cfg.stage_split)
        sched = [("global_a", n_a), ("global_b", cfg.num_iter - n_a)]
    else:  # dct
        n = cfg.num_iter_dct
        sched = [("dct_a", int(n * cfg.dct_split)),
                 ("dct_b", n - int(n * cfg.dct_split))]
    for phase, steps in sched:
        state, opt_state, dt, stats = _phase_stats(
            solver, state, opt_state, target, weights, steps, phase,
            backend)
        total += dt
        phases_out[phase] = stats
    if mode == "local":
        wr = solver.detect_contact(state)
        jax.block_until_ready(wr)
        t0 = time.perf_counter()
        wr = solver.detect_contact(state)
        jax.block_until_ready(wr)
        total += time.perf_counter() - t0
        steps = int(cfg.contact_phase_frac * cfg.num_iter)
        state, opt_state, dt, stats = _phase_stats(
            solver, state, opt_state, target, weights, steps, "skate",
            backend, weight_right=wr)
        total += dt
        phases_out["skate"] = stats
    return total, state


def bench_dct_closed_form(solver, body_j, cam_j, extras):
    """Algorithmic speedup demo: the reference fits c_dct from randn
    for 9,500 Geman-McClure iterations (global_optimization.py:596,
    :186); the orthonormal-DCT closed-form projection
    (losses.dct_encode) starts dct_a at the least-squares optimum, so
    a 10x-shorter schedule reaches an equal-or-better dct loss.
    Compares against the full schedule's final loss already measured
    by bench_mode (extras['phases']['dct_a'])."""
    import dataclasses
    import jax
    cfg_cf = dataclasses.replace(
        solver.config, dct_closed_form_init=True,
        num_iter_dct=max(20, solver.config.num_iter_dct // 10))
    solver_cf = type(solver)(
        model=solver.model, vposer_params=solver.vposer_params,
        scene_verts=solver.scene_verts,
        contact_vids=solver.contact_vids,
        contact_vids_left=solver.contact_vids_left,
        contact_vids_right=solver.contact_vids_right, config=cfg_cf,
        nn_impl=solver.nn_impl)
    state, hist = solver_cf.fit(body_j, cam_j, mode="dct")   # compile
    jax.block_until_ready(state.body_6d)
    t0 = time.perf_counter()
    state, hist = solver_cf.fit(body_j, cam_j, mode="dct")
    jax.block_until_ready(state.body_6d)
    dt = time.perf_counter() - t0
    full_final = extras["phases"].get("dct_a", {}).get("final_loss")
    extras["dct_closed_form"] = {
        "steady_s": round(dt, 3),
        "iters": cfg_cf.num_iter_dct,
        "dct_a_final": float(hist["dct_a"][-1]),
        "full_schedule_dct_a_final": full_final,
    }
    print(f"[bench] dct closed-form init: {dt:.2f}s at "
          f"{cfg_cf.num_iter_dct} iters, dct_a final "
          f"{hist['dct_a'][-1]:.6f} vs full-schedule "
          f"{full_final}", file=sys.stderr)


def _tpu_reachable(timeout_s: float = 300.0) -> bool:
    """Probe the TPU backend in a BOUNDED subprocess.

    When the axon tunnel relay is down, backend init hangs forever
    (not an exception) — a direct jax.devices() here would wedge the
    whole bench and the round artifact would end up empty. The child
    either completes a tiny matmul or gets killed at the deadline.
    """
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "x = jnp.ones((8, 8));"
             "print(jax.default_backend(),"
             "      float((x @ x)[0, 0]))"],
            capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0 and "tpu" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _last_tpu_headline():
    """Headline of the last committed real-TPU run (bench_out.json),
    folded into the compact line when this run degrades to the CPU
    fallback — the round tail should never lose the TPU number just
    because the relay was down at capture time."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_out.json")
        with open(path) as f:
            d = json.load(f)
        return {"metric": d.get("metric"), "value": d.get("value"),
                "unit": d.get("unit"),
                "vs_baseline": d.get("vs_baseline"),
                "backend": d.get("extras", {}).get("backend")}
    except Exception:
        return None


def main():
    small = os.environ.get("FPV4D_BENCH_SMALL") == "1"
    tunnel_down = False
    if not small and os.environ.get("FPV4D_BENCH_SKIP_PROBE") != "1":
        if not _tpu_reachable():
            # fall back to a clearly-labeled CPU smoke run rather
            # than hanging: a degraded artifact beats no artifact
            print("[bench] TPU probe failed/timed out -> CPU-small "
                  "fallback (tunnel_down=true)", file=sys.stderr)
            small = True
            tunnel_down = True
            import jax
            jax.config.update("jax_platforms", "cpu")
    T = int(os.environ.get("FPV4D_BENCH_FRAMES", "60" if small else "900"))
    num_verts = 512 if small else 10475
    scene_pts = 1024 if small else 100_489      # 317^2 grid
    num_iter = 20 if small else 500
    num_iter_dct = 40 if small else 10000
    # 1024: the r5 hardware ablation's pick (tools/ablate_skate.py,
    # ablate_skate_out.json) — the EXACT full-mesh terms at the phase's
    # final state are flat across 512..full (vert_smooth 0.0050-0.0055;
    # 1024 lands the best one) while ms/step drops 4.74 -> 3.98
    skate_subset = int(os.environ.get("FPV4D_BENCH_SKATE_SUBSET", "1024"))
    # 192: the r5 full-solve ablation's pick (tools/ablate_compact.py)
    # — local steady 2.439 -> 2.098 s with final phase losses flat to
    # within 2e-5 across the 0/256/192/160/128 sweep
    contact_compact = int(os.environ.get("FPV4D_BENCH_COMPACT", "192"))
    modes = os.environ.get(
        "FPV4D_BENCH_MODES", "local" if small else "local,global,dct"
    ).split(",")

    import jax
    from fpv4d.utils import bench_problem as BP
    cache_dir = BP.enable_persistent_cache()
    import jax.numpy as jnp

    backend = jax.default_backend()
    print(f"[bench] backend={backend} T={T} V={num_verts} "
          f"scene={scene_pts} iters={num_iter} modes={modes} "
          f"skate_subset={skate_subset}", file=sys.stderr)

    prob = BP.standard_problem(
        T=T, num_verts=num_verts, scene_pts=scene_pts,
        num_iter=num_iter, num_iter_dct=num_iter_dct,
        skate_subset=skate_subset, contact_compact=contact_compact,
        cache_dir=cache_dir)
    model, vp, solver = prob.model, prob.vp, prob.solver
    body, cam, scene = prob.body, prob.cam, prob.scene
    rng = np.random.RandomState(1)

    body_j = jnp.asarray(body)
    cam_j = jnp.asarray(cam)

    extras = {"backend": backend, "frames": T,
              "skate_subset": skate_subset,
              "contact_compact": contact_compact,
              "modes": {}, "phases": {}}
    if tunnel_down:
        extras["tunnel_down"] = True

    # cold-start record: tools/prewarm.py stamps its run (cold = empty
    # cache) next to the cache; carried here so the round artifact has
    # a measured cold-vs-warm first-solve pair
    stats_path = os.path.join(cache_dir, "prewarm_stats.json")
    if os.path.exists(stats_path):
        try:
            extras["prewarm"] = json.load(open(stats_path))
        except Exception:
            pass

    # headline: full 'local' fit via the public API — first (incl
    # compile) and steady
    t0 = time.perf_counter()
    state, hist = solver.fit(body_j, cam_j, mode="local")
    _ = float(state.scale)     # scalar D2H: tunnel-safe fence
    t_first = time.perf_counter() - t0
    extras["first_solve_s"] = round(t_first, 2)
    print(f"[bench] first solve (incl compile): {t_first:.2f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    state, hist = solver.fit(body_j, cam_j, mode="local")
    _ = float(state.scale)
    dt = time.perf_counter() - t0

    total_steps = sum(len(v) for v in hist.values())
    fps = T * total_steps / dt
    extras["modes"]["local"] = {"steady_s": round(dt, 3),
                                "frame_iters_per_s": round(fps)}
    print(f"[bench] steady local solve: {dt:.2f}s ({total_steps} steps, "
          f"{fps:.0f} frame-iters/s)", file=sys.stderr)
    for k, v in hist.items():
        print(f"[bench]   {k}: {v[0]:.4f} -> {v[-1]:.4f}",
              file=sys.stderr)

    # per-phase roofline for every requested mode (exact-grid
    # semantics; production lazy timings land in ms_per_step_lazy),
    # plus the public-API production steady time for non-local modes
    for mode in modes:
        t_mode, _ = bench_mode(solver, body_j, cam_j, mode,
                               backend, extras["phases"])
        if mode != "local":
            state_m, _ = solver.fit(body_j, cam_j, mode=mode)
            _ = float(state_m.scale)
            t0 = time.perf_counter()
            state_m, _ = solver.fit(body_j, cam_j, mode=mode)
            _ = float(state_m.scale)
            dt_m = time.perf_counter() - t0
            extras["modes"][mode] = {"steady_s": round(dt_m, 3),
                                     "steady_exact_s": round(t_mode, 3)}
            t_mode = dt_m
        print(f"[bench] mode {mode}: steady {t_mode:.2f}s",
              file=sys.stderr)
    for k, v in extras["phases"].items():
        print(f"[bench]   {k}: {v['ms_per_step']}ms/step "
              f"{v['gflops_per_step']}GF {v['tflops_achieved']}TF/s "
              f"mfu={v['mfu']} {v['logical_gbps']}GB/s(logical) "
              f"frac={v['logical_bytes_frac']}", file=sys.stderr)

    if "dct" in modes:
        try:
            bench_dct_closed_form(solver, body_j, cam_j, extras)
        except Exception as e:
            print(f"[bench] dct closed-form demo skipped: {e}",
                  file=sys.stderr)

    # secondary headline (stderr): frames/sec of SMPL-X keypoint
    # fitting per chip — the fit-from-keypoints entry point (the
    # reference's external smplifyx stage takes "up to several hours"
    # per 300-frame clip, README.md:14)
    try:
        from fpv4d.solve.keypoint_fit import fit_keypoints
        # SAME constructor as tools/kp_bench.py (VERDICT r4 ask #4)
        kp, kcfg = BP.keypoint_problem(model, vp, T,
                                       num_iter=10 if small else 120)
        fit_keypoints(model, vp, kp, kcfg)      # compile
        t0 = time.perf_counter()
        fit_keypoints(model, vp, kp, kcfg)
        dt_fit = time.perf_counter() - t0
        extras["keypoint_fit_fps"] = round(T / dt_fit, 1)
        print(f"[bench] keypoint fit: {T} frames x "
              f"{3 * kcfg.num_iter} steps in {dt_fit:.2f}s -> "
              f"{T / dt_fit:.0f} frames/s per chip", file=sys.stderr)

        # fleet shape of the same stage: C clips batched through one
        # vmapped program (pipeline step 3 at deployment scale; the
        # reference runs this serially per clip, README.md:14-17)
        C_kp = 2 if small else 8
        kp_b = np.broadcast_to(kp, (C_kp,) + kp.shape).copy()
        # de-correlate clips so no lane is trivially converged
        kp_b[..., :2] += rng.randn(*kp_b[..., :2].shape).astype(
            np.float32)
        fit_keypoints(model, vp, kp_b, kcfg)    # compile
        t0 = time.perf_counter()
        fit_keypoints(model, vp, kp_b, kcfg)
        dt_b = time.perf_counter() - t0
        fps_b = C_kp * T / dt_b
        extras["keypoint_fleet"] = {
            "clips": C_kp, "frames_per_s_per_chip": round(fps_b, 1),
            "per_clip_vs_single": round(dt_b / (C_kp * dt_fit), 3)}
        print(f"[bench] keypoint fleet: {C_kp} clips x {T} frames in "
              f"{dt_b:.2f}s -> {fps_b:.0f} frames/s per chip "
              f"({dt_b / (C_kp * dt_fit):.2f}x per-clip vs single)",
              file=sys.stderr)
    except Exception as e:
        print(f"[bench] keypoint-fit secondary metric skipped: {e}",
              file=sys.stderr)

    # fold the most recent per-optimizer keypoint sweep (tools/
    # kp_bench.py: adam vs joint-batch L-BFGS vs per-frame L-BFGS at
    # T=900) into the round artifact — the sweep is too compile-heavy
    # to rerun inside bench, so kp_bench persists its record
    try:
        kp_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "kp_bench_out.json")
        if os.path.exists(kp_path):
            with open(kp_path) as f:
                extras["keypoint_optimizers"] = json.load(f)
    except Exception as e:
        print(f"[bench] kp_bench record fold-in skipped: {e}",
              file=sys.stderr)

    # Pallas brute-NN kernel, compiled on this backend, vs the XLA
    # brute path — correctness + timing each round so Mosaic
    # regressions can't ship silently (VERDICT r1)
    try:
        from fpv4d.ops import nn as NN
        q = jnp.asarray(rng.randn(64, 896, 3).astype(np.float32))
        sc = jnp.asarray(scene[:4096])
        p_impl = "pallas" if backend == "tpu" else "pallas_interpret"
        f_p = jax.jit(lambda q, s: NN.nn_brute(q, s, p_impl)[0])
        f_x = jax.jit(lambda q, s: NN.nn_brute(q, s, "xla")[0])
        d_p = np.asarray(f_p(q, sc))
        d_x = np.asarray(f_x(q, sc))
        err = float(np.abs(d_p - d_x).max())
        ms_p = _timed_ms(f_p, q, sc)
        ms_x = _timed_ms(f_x, q, sc)
        extras["pallas_check"] = {"ok": bool(err < 1e-3),
                                  "max_err": err,
                                  "ms_pallas": round(ms_p, 2),
                                  "ms_xla": round(ms_x, 2)}
        print(f"[bench] pallas NN check: err={err:.2e} "
              f"pallas={ms_p:.2f}ms xla={ms_x:.2f}ms", file=sys.stderr)
    except Exception as e:
        extras["pallas_check"] = {"ok": False, "error": str(e)[:200]}
        print(f"[bench] pallas NN check FAILED: {e}", file=sys.stderr)

    # fused candidate-NN Pallas kernel (ops/cand_pallas) vs the XLA
    # lazy-candidates production path — compiled on this backend, so
    # correctness AND the relative timing stay measured every round
    try:
        from fpv4d.ops import nn as NN
        from fpv4d.ops import cand_pallas as CP
        Tc, Nc, Pc = (64, 128, 128) if small else (900, 870, 512)
        qc = jnp.asarray(rng.randn(Tc, Nc, 3).astype(np.float32) * 2)
        cc = jnp.asarray(rng.randn(Tc, Pc, 3).astype(np.float32) * 2)
        vc = jnp.asarray(rng.rand(Tc, Pc) > 0.1)
        fc = NN.FrameCands(cand=cc, valid=vc)
        packed = jax.jit(CP.pack_candidates)(cc, vc)
        interp = backend != "tpu"
        # tables ride as ARGS, not closures (closure arrays become HLO
        # literals and multiply the remote-AOT compile time)
        f_c = jax.jit(lambda q, p: CP.cand_nn(q, p, 8, interp))
        f_x = jax.jit(NN.nn_to_candidates)
        d_c = np.asarray(f_c(qc, packed)); d_x = np.asarray(f_x(qc, fc))
        cerr = float(np.abs(d_c - d_x).max())
        ms_c = _timed_ms(f_c, qc, packed)
        ms_x = _timed_ms(f_x, qc, fc)
        extras["cand_kernel_check"] = {
            "ok": bool(cerr < 1e-2), "max_err": cerr,
            "ms_pallas": round(ms_c, 2), "ms_xla": round(ms_x, 2)}
        print(f"[bench] cand-NN kernel check: err={cerr:.2e} "
              f"pallas={ms_c:.2f}ms xla={ms_x:.2f}ms", file=sys.stderr)
    except Exception as e:
        extras["cand_kernel_check"] = {"ok": False, "error": str(e)[:200]}
        print(f"[bench] cand-NN kernel check FAILED: {e}",
              file=sys.stderr)

    # accuracy: ground-truth recovery recorded per round, so a
    # numerics regression breaks the round artifact just like a perf
    # one (VERDICT r2). Runs CPU-small in a subprocess — keeps the
    # TPU tunnel free and adds nothing to the remote-AOT cache.
    try:
        import subprocess
        env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "accuracy_report.py"),
             "--frames", "24", "--num-verts", "256", "--iters", "60",
             "--optimizer", "both", "--deep-iters", "180",
             "--frontier-iters", "800", "--frontier-rec", "0.25"],
            env=env, capture_output=True, text=True, timeout=2700)
        # a failed subprocess prints nothing to stdout — surface ITS
        # stderr, not the secondary index error from splitlines()[-1]
        if r.returncode != 0 or not r.stdout.strip():
            raise RuntimeError(
                f"rc={r.returncode} stderr: {r.stderr[-400:]}")
        extras["accuracy"] = json.loads(
            r.stdout.strip().splitlines()[-1])
        print(f"[bench] accuracy: {extras['accuracy']}",
              file=sys.stderr)
    except Exception as e:
        extras["accuracy"] = {"error": str(e)[:400]}
        print(f"[bench] accuracy block FAILED: {e}", file=sys.stderr)

    # sharded multi-clip throughput vs single-clip: the fleet workload
    # (BASELINE config 5 is 8 videos over v5e-8, i.e. C clips batched
    # PER CHIP; the per-chip batched number is what a fleet deployment
    # sees). Default C=8 on full TPU runs; FPV4D_BENCH_MULTI=N
    # overrides (0 disables, 1 = legacy 2-clip check).
    mc_env = os.environ.get("FPV4D_BENCH_MULTI",
                            "8" if (backend == "tpu" and not small)
                            else "0")
    if mc_env not in ("", "0"):
        mc = None
        try:
            from fpv4d.parallel import sharding as SH
            from fpv4d.parallel.multi_clip import (MultiClipSolver,
                                                   pad_scenes)
            C = max(2, int(mc_env))
            mesh = SH.make_mesh({"clips": 1})
            mc = MultiClipSolver(solver=solver, mesh=mesh,
                                 frame_axis=None)
            bodies = jnp.asarray(np.tile(body[None], (C, 1, 1)))
            cams = jnp.asarray(np.tile(cam[None], (C, 1, 1, 1)))
            # scenes stay NUMPY: fit()'s grid cache hashes its scenes
            # argument host-side — handing it a device array made
            # every fit() D2H the 9.6 MB cloud through the tunnel
            # just to compute the cache key (r5 fix; the one H2D for
            # the solve itself happens inside shard_batch)
            scenes = pad_scenes([scene] * C)
            sb, hist_m = mc.fit(bodies, cams, scenes,
                                mode="local")          # compile
            np.asarray(sb.scale)    # tunnel-safe fence (tiny D2H)
            t0 = time.perf_counter()
            sb, hist_m = mc.fit(bodies, cams, scenes,
                                mode="local")
            np.asarray(sb.scale)
            dt_m = time.perf_counter() - t0
            steps_m = sum(v.shape[0] for v in hist_m.values())
            per_clip_fps = C * T * steps_m / dt_m
            extras["multi_clip"] = {
                "clips": C, "steady_s": round(dt_m, 3),
                "frame_iters_per_s": round(per_clip_fps),
                "clips_per_hour_per_chip": round(C * 3600.0 / dt_m, 1),
                "per_clip_slowdown_vs_single": round(
                    dt_m / (C * dt), 3)}
            try:
                ms = jax.local_devices()[0].memory_stats() or {}
                if "peak_bytes_in_use" in ms:
                    extras["multi_clip"]["peak_hbm_gb"] = round(
                        ms["peak_bytes_in_use"] / 2 ** 30, 2)
                    extras["multi_clip"]["hbm_limit_gb"] = round(
                        ms.get("bytes_limit", 0) / 2 ** 30, 2)
            except Exception:
                pass
            print(f"[bench] multi-clip: {C} clips in {dt_m:.2f}s "
                  f"({per_clip_fps:.0f} frame-iters/s, "
                  f"{C * 3600.0 / dt_m:.1f} clips/h/chip, "
                  f"{dt_m / (C * dt):.2f}x per-clip vs single, "
                  f"peak HBM "
                  f"{extras['multi_clip'].get('peak_hbm_gb', '?')} GB)",
                  file=sys.stderr)
        except Exception as e:
            extras["multi_clip"] = {"error": str(e)[:200]}
            mc = None
            print(f"[bench] multi-clip bench FAILED: {e}",
                  file=sys.stderr)

        # attribution run in its OWN try (ADVICE r4: a fencing failure
        # must not discard the measured headline above): per-stage
        # wall-clock with scalar-readback fences, then CALIBRATED —
        # fencing serializes pipelined stages and each fence costs ~2
        # tunnel dispatches, so the raw table over-reads small stages.
        # The per-fence overhead is estimated from the attribution
        # run's excess over the unfenced steady time and subtracted
        # proportional to each stage's fence count, which by
        # construction reconciles the table with the steady number
        # (VERDICT r4 ask #1b).
        if mc is not None:
            try:
                # warm-fence pass: the per-stage readbacks can compile
                # tiny eager slice programs the first time a large-leaf
                # stage is fenced (remote AOT, seconds-to-minutes) —
                # r5's first recorded attribution charged one such
                # compile (12.8 s) to 'init'. One throwaway fenced fit
                # compiles them all (persisted in .jax_cache).
                mc.fit(bodies, cams, scenes, mode="local", timings={})
                tms = {}
                t0 = time.perf_counter()
                sb, _ = mc.fit(bodies, cams, scenes,
                               mode="local", timings=tms)
                dt_attr = time.perf_counter() - t0
                fences = tms.pop("_fences", {})
                raw = {k: round(v, 3) for k, v in tms.items()}
                n_f = max(1, sum(fences.values()))
                over = max(0.0, sum(tms.values()) - dt_m) / n_f
                adj = {k: round(max(0.0, v - over * fences.get(k, 0)),
                                3) for k, v in tms.items()}
                extras["multi_clip"]["phase_s"] = adj
                extras["multi_clip"]["phase_s_raw"] = raw
                extras["multi_clip"]["attribution"] = {
                    "fenced_total_s": round(dt_attr, 3),
                    "fences": fences,
                    "per_fence_overhead_s": round(over, 4),
                    "method": "raw minus per-fence overhead "
                              "(= (sum(raw) - steady_s)/n_fences) "
                              "x stage fence count",
                }
                print(f"[bench] multi-clip attribution: raw={raw} "
                      f"-> calibrated={adj} "
                      f"(overhead {over * 1e3:.0f} ms/fence x "
                      f"{n_f} fences)", file=sys.stderr)
            except Exception as e:
                extras["multi_clip"]["attribution_error"] = \
                    str(e)[:200]
                print(f"[bench] multi-clip attribution FAILED: {e}",
                      file=sys.stderr)

        # fleet beyond local mode (VERDICT r4 ask #7): the global and
        # dct schedules batched at the same C
        if mc is not None and os.environ.get(
                "FPV4D_BENCH_MULTI_MODES", "1") == "1":
            extras["multi_clip"]["modes"] = {}
            for mode_m in ("global", "dct"):
                try:
                    sb, hist_m = mc.fit(bodies, cams, scenes,
                                        mode=mode_m)   # compile
                    np.asarray(sb.scale)
                    t0 = time.perf_counter()
                    sb, hist_m = mc.fit(bodies, cams, scenes,
                                        mode=mode_m)
                    np.asarray(sb.scale)
                    dt_mm = time.perf_counter() - t0
                    single_s = extras["modes"].get(mode_m, {}).get(
                        "steady_s")
                    extras["multi_clip"]["modes"][mode_m] = {
                        "steady_s": round(dt_mm, 3),
                        "clips_per_hour_per_chip": round(
                            C * 3600.0 / dt_mm, 1),
                        **({"per_clip_slowdown_vs_single": round(
                            dt_mm / (C * single_s), 3)}
                           if single_s else {})}
                    print(f"[bench] multi-clip {mode_m}: {C} clips in "
                          f"{dt_mm:.2f}s", file=sys.stderr)
                except Exception as e:
                    extras["multi_clip"]["modes"][mode_m] = {
                        "error": str(e)[:200]}
                    print(f"[bench] multi-clip {mode_m} FAILED: {e}",
                          file=sys.stderr)

        if mc is not None:
            # voxel-grid cache observability (VERDICT r4 ask #8): the
            # content-keyed cache must show 1 miss + N-1 hits across
            # this section's repeated fit() calls
            extras["multi_clip"]["grid_cache"] = {
                "hits": mc.grid_cache_hits,
                "misses": mc.grid_cache_misses}

    # fold the latest HBM-capacity probe (tools/hbm_probe.py: grows
    # the clip batch to OOM, bisects the boundary — it must run AFTER
    # bench, so it persists its record and bench folds in the previous
    # run's; VERDICT r4 ask #2). The axon plugin exposes no
    # memory_stats, so this is the only peak-HBM evidence available.
    try:
        hbm_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "hbm_probe_out.json")
        if os.path.exists(hbm_path):
            with open(hbm_path) as f:
                extras.setdefault("multi_clip", {})["hbm_probe"] = \
                    json.load(f)
    except Exception as e:
        print(f"[bench] hbm_probe record fold-in skipped: {e}",
              file=sys.stderr)

    # Full result dict -> bench_out.json (the driver captures only the
    # LAST 2000 chars of stdout, which used to truncate away the
    # headline when the full extras dict rode on the one stdout line —
    # VERDICT r3 weak #1). The single stdout JSON line is now a COMPACT
    # summary that always fits the tail; everything else is in the
    # file.
    full = {
        "metric": f"clip_joint_opt_{T}f_local_mode_wallclock",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(60.0 / dt, 3),
        "extras": extras,
    }
    # a degraded run must not clobber the committed TPU artifact —
    # neither the CPU/tunnel-down fallback NOR a small TPU smoke run
    # (on this box the axon plugin is the default backend, so
    # FPV4D_BENCH_SMALL=1 with the tunnel up still lands on TPU)
    out_name = ("bench_out.json" if (backend == "tpu" and not small)
                else "bench_out_cpu.json")
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            out_name)
    try:
        with open(out_path, "w") as f:
            json.dump(full, f, indent=1)
        print(f"[bench] full results -> {out_path}", file=sys.stderr)
    except Exception as e:
        print(f"[bench] bench_out.json write failed: {e}",
              file=sys.stderr)

    def _phase_ms(name):
        p = extras["phases"].get(name, {})
        return p.get("ms_per_step_lazy", p.get("ms_per_step"))

    acc = extras.get("accuracy", {})
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "s",
        "vs_baseline": full["vs_baseline"],
        "extras": {
            "modes_steady_s": {m: v.get("steady_s")
                               for m, v in extras["modes"].items()},
            "phase_ms_per_step": {k: _phase_ms(k)
                                  for k in extras["phases"]},
            "keypoint_fit_fps": extras.get("keypoint_fit_fps"),
            "keypoint_fleet_fps": extras.get(
                "keypoint_fleet", {}).get("frames_per_s_per_chip"),
            "keypoint_optimizer_fps": {
                k: v.get("frames_per_s")
                for k, v in extras.get("keypoint_optimizers",
                                       {}).items()
                if isinstance(v, dict)} or None,
            "fleet_clips_per_hour_per_chip": extras.get(
                "multi_clip", {}).get("clips_per_hour_per_chip"),
            "fleet_per_clip_vs_single": extras.get(
                "multi_clip", {}).get("per_clip_slowdown_vs_single"),
            "fleet_modes_clips_per_hour": {
                m: v.get("clips_per_hour_per_chip")
                for m, v in extras.get("multi_clip", {}).get(
                    "modes", {}).items()
                if isinstance(v, dict)} or None,
            "fleet_max_clips_per_chip": extras.get(
                "multi_clip", {}).get("hbm_probe", {}).get(
                "max_clips_per_chip"),
            "fleet_implied_gb_per_clip": extras.get(
                "multi_clip", {}).get("hbm_probe", {}).get(
                "implied_gb_per_clip"),
            "accuracy": ({
                "keypoint_mpjpe_mm": {
                    k: v.get("mpjpe_mm")
                    for k, v in acc.get("keypoint_fit", {}).items()},
                "clip_mpjpe_mm": [
                    acc.get("clip_solve_mpjpe_mm_before"),
                    acc.get("clip_solve_mpjpe_mm_after"),
                    acc.get("clip_solve_deep", {}).get(
                        "mpjpe_mm_after")],
                "frontier_mpjpe_mm": acc.get("frontier", {}).get(
                    "mpjpe_mm_after"),
            } if "error" not in acc else acc.get("error")),
            "pallas_ok": extras.get("pallas_check", {}).get("ok"),
            "cand_kernel_ok": extras.get("cand_kernel_check",
                                         {}).get("ok"),
            **({"tunnel_down": True} if tunnel_down else {}),
            # degraded runs still carry the last committed TPU
            # headline so the driver-captured tail stays meaningful
            **({"last_tpu": _last_tpu_headline()} if tunnel_down
               else {}),
            "full_results": out_name,
        },
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
