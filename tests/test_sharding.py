"""Multi-device sharding tests on the 8-virtual-CPU-device mesh
(conftest sets xla_force_host_platform_device_count=8)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpv4d.config import ClipConfig
from fpv4d.parallel import sharding as SH
from fpv4d.parallel.multi_clip import MultiClipSolver, pad_scenes
from fpv4d.solve.clip_solve import ClipSolver
from tests.helpers import make_scenario


@pytest.fixture(scope="module")
def setup():
    s = make_scenario(T=8, num_verts=128, seed=2)
    cfg = ClipConfig(num_iter=4, window=4, dct_num=2)
    solver = ClipSolver(model=s["model"], vposer_params=s["vp"],
                        scene_verts=s["scene"], contact_vids=s["vids"],
                        contact_vids_left=s["vids_l"],
                        contact_vids_right=s["vids_r"],
                        config=cfg, use_pallas=False)
    return s, solver


def test_device_count():
    assert len(jax.devices()) == 8


def test_make_mesh_2d():
    mesh = SH.make_mesh({"clips": 2, "frames": 4})
    assert mesh.axis_names == ("clips", "frames")
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        SH.make_mesh({"clips": 16})


def _batch(s, C, T):
    rng = np.random.RandomState(0)
    bodies = jnp.asarray(np.tile(np.asarray(s["body"])[None, :T], (C, 1, 1))
                         + rng.randn(C, T, 75).astype(np.float32) * 0.01)
    cams = jnp.asarray(np.tile(np.asarray(s["camera_ext"])[None, :T],
                               (C, 1, 1, 1)))
    scenes = pad_scenes([np.asarray(s["scene"])] * C)
    return bodies, cams, scenes


def test_sharded_step_matches_unsharded(setup):
    s, solver = setup
    C, T = 4, 8
    bodies, cams, scenes = _batch(s, C, T)
    mesh = SH.make_mesh({"clips": 2, "frames": 4})
    mc = MultiClipSolver(solver=solver, mesh=mesh)
    state_b, target_b, weights_b = mc.init_batch(bodies, cams)

    # sharded one step
    sb, tb, wb, scb = SH.shard_batch(mesh, state_b, target_b, weights_b,
                                     jnp.asarray(scenes))
    step_fn, init_fn = SH.build_sharded_step(solver, mesh, "local_a")
    opt_state = init_fn(sb)
    sb1, _, hist = step_fn(sb, opt_state, tb, wb, scb)
    assert np.asarray(hist).shape == (1, C)
    per_clip = np.asarray(hist)[0]
    assert np.all(np.isfinite(per_clip))

    # per-clip losses must match the single-clip solver's loss exactly
    for c in range(C):
        state_c, target_c, w_c = solver.init_state(bodies[c], cams[c])
        t = solver.terms(state_c, target_c, w_c)
        expected = float(t.contact * solver.config.local_contact_mult
                         + t.smooth + t.rec)
        assert per_clip[c] == pytest.approx(expected, rel=1e-4)


def test_frame_axis_sharding_changes_nothing(setup):
    s, solver = setup
    C, T = 2, 8
    bodies, cams, scenes = _batch(s, C, T)
    results = []
    for axes, frame_axis in (({"clips": 2}, None),
                             ({"clips": 2, "frames": 4}, "frames")):
        mesh = SH.make_mesh(axes)
        mc = MultiClipSolver(solver=solver, mesh=mesh,
                             frame_axis=frame_axis)
        state_b, target_b, weights_b = mc.init_batch(bodies, cams)
        sb, tb, wb, scb = SH.shard_batch(mesh, state_b, target_b,
                                         weights_b, jnp.asarray(scenes),
                                         frame_axis=frame_axis)
        step_fn, init_fn = SH.build_sharded_step(solver, mesh, "local_a",
                                                 frame_axis=frame_axis,
                                                 num_steps=2)
        opt_state = init_fn(sb)
        sb1, _, _ = step_fn(sb, opt_state, tb, wb, scb)
        results.append(np.asarray(sb1.body_6d))
    np.testing.assert_allclose(results[0], results[1], atol=1e-5)


def test_multi_clip_fit_runs(setup):
    s, solver = setup
    C, T = 2, 8
    bodies, cams, scenes = _batch(s, C, T)
    mesh = SH.make_mesh({"clips": 2})
    mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None)
    tms = {}
    state_b, hist = mc.fit(bodies, cams, jnp.asarray(scenes),
                           mode="global", timings=tms)
    assert set(hist) == {"global_a", "global_b"}
    # the fenced attribution run records every stage it executed,
    # plus per-stage fence counts under '_fences' (r5: callers
    # calibrate the per-fence readback overhead out)
    fences = tms.pop("_fences")
    assert {"init", "global_a", "global_b"} <= set(tms)
    assert all(v > 0 for v in tms.values())
    assert set(fences) == set(tms)
    assert all(isinstance(n, int) and n >= 1 for n in fences.values())
    assert fences["init"] == 1
    assert hist["global_a"].shape[1] == C
    results = mc.result_params(state_b)
    assert len(results) == C
    body0, scale0, cam0 = results[0]
    assert body0.shape == (T, 75)
    assert np.isfinite(scale0)


def test_multi_clip_fit_matches_per_clip(setup):
    """Full 'local' multi-clip fit (incl. the sharded skate phase)
    reproduces per-clip ClipSolver.fit trajectories: independent clips
    summed into one objective have identical per-clip gradients, and
    Adam is elementwise, so the paths must match."""
    s, solver = setup
    C, T = 2, 8
    bodies, cams, scenes = _batch(s, C, T)
    mesh = SH.make_mesh({"clips": 2})
    mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None)
    state_b, hist = mc.fit(bodies, cams, jnp.asarray(scenes),
                           mode="local")
    assert set(hist) == {"local_a", "local_b", "local_skate"}
    for c in range(C):
        state_c, hist_c = solver.fit(bodies[c], cams[c], mode="local")
        np.testing.assert_allclose(np.asarray(state_b.body_6d[c]),
                                   np.asarray(state_c.body_6d),
                                   atol=2e-5)
        np.testing.assert_allclose(float(state_b.scale[c]),
                                   float(state_c.scale), atol=2e-5)
        for k in hist_c:
            np.testing.assert_allclose(hist[k][:, c], hist_c[k],
                                       atol=2e-5)


def test_frame_candidates_folded_matches_per_clip():
    """NN.frame_candidates_folded (the r5 one-device refresh fold)
    must reproduce per-clip frame_candidates exactly — including with
    DIFFERENT per-clip scenes/grids (the offset indexes each clip's
    own rows of the concatenated table)."""
    from fpv4d.ops import nn as NN
    rng = np.random.RandomState(0)
    C, T, N = 3, 4, 16
    scenes = [rng.randn(50 + 20 * c, 3).astype(np.float32)
              for c in range(C)]
    grid_b = NN.build_voxel_grid_batch(scenes, h=0.5, slots_per_cell=4)
    q = rng.randn(C, T, N, 3).astype(np.float32)
    budget = 8
    folded = NN.frame_candidates_folded(
        grid_b, jnp.asarray(q.reshape(C * T, N, 3)), C=C,
        budget=budget)
    for c in range(C):
        g_c = NN.VoxelGrid(cand_pts=grid_b.cand_pts[c],
                           cand_idx=grid_b.cand_idx[c],
                           origin=grid_b.origin[c],
                           dims=grid_b.dims, h=grid_b.h)
        ref = NN.frame_candidates(g_c, jnp.asarray(q[c]), budget)
        np.testing.assert_array_equal(
            np.asarray(folded.cand[c * T:(c + 1) * T]),
            np.asarray(ref.cand), err_msg=f"clip {c}")
        np.testing.assert_array_equal(
            np.asarray(folded.valid[c * T:(c + 1) * T]),
            np.asarray(ref.valid), err_msg=f"clip {c}")


def test_multi_clip_flat_skate_matches_per_clip(setup):
    """On a ONE-device mesh the fleet skate step folds clips into the
    frame axis for the model chain (sharding._skate_flat_loss — the
    r5 fix for the +11% clips-vmapped FK/LBS tax). Trajectories must
    still reproduce per-clip ClipSolver.fit exactly (f32 order)."""
    s, solver = setup
    C, T = 2, 8
    bodies, cams, scenes = _batch(s, C, T)
    mesh = SH.make_mesh({"clips": 1})
    assert mesh.devices.size == 1
    mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None)
    state_b, hist = mc.fit(bodies, cams, jnp.asarray(scenes),
                           mode="local")
    assert "local_skate" in hist
    for c in range(C):
        state_c, hist_c = solver.fit(bodies[c], cams[c], mode="local")
        np.testing.assert_allclose(np.asarray(state_b.body_6d[c]),
                                   np.asarray(state_c.body_6d),
                                   atol=2e-5)
        np.testing.assert_allclose(hist["local_skate"][:, c],
                                   hist_c["local_skate"], atol=2e-5)


def test_pad_scenes_far_points():
    a = np.zeros((5, 3), np.float32)
    b = np.ones((3, 3), np.float32)
    out = pad_scenes([a, b])
    assert out.shape == (2, 5, 3)
    assert np.all(out[1, 3:] == 1e6)


def test_multi_clip_grid_nn_matches_single(setup):
    """Batched voxel grids under vmap+sharding give the same per-clip
    losses as single-clip grid solving."""
    import jax.numpy as jnp
    from fpv4d.ops import nn as NN

    s, _ = setup
    cfg = ClipConfig(num_iter=2, window=4, dct_num=2)
    solver = ClipSolver(model=s["model"], vposer_params=s["vp"],
                        scene_verts=np.asarray(s["scene"]),
                        contact_vids=s["vids"],
                        contact_vids_left=s["vids_l"],
                        contact_vids_right=s["vids_r"],
                        config=cfg, nn_impl="grid", grid_h=0.3)
    C, T = 2, 8
    bodies, cams, scenes = _batch(s, C, T)
    mesh = SH.make_mesh({"clips": 2})
    mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None)
    state_b, target_b, weights_b = mc.init_batch(bodies, cams)
    sb, tb, wb, scb = SH.shard_batch(mesh, state_b, target_b, weights_b,
                                     jnp.asarray(scenes),
                                     frame_axis=None)
    grid_b = NN.build_voxel_grid_batch(
        [np.asarray(s["scene"])] * C, h=0.3)
    step_fn, init_fn = SH.build_sharded_step(solver, mesh, "local_a",
                                             frame_axis=None,
                                             grid_b=grid_b)
    opt_state = init_fn(sb)
    # grid-mode steps take the tables per call (no build-time
    # snapshot is retained in the step closure)
    with pytest.raises(ValueError, match="requires grid"):
        step_fn(sb, opt_state, tb, wb, scb)
    _, _, hist = step_fn(sb, opt_state, tb, wb, scb, grid=grid_b)
    per_clip = np.asarray(hist)[0]
    for c in range(C):
        state_c, target_c, w_c = solver.init_state(bodies[c], cams[c])
        t = solver.terms(state_c, target_c, w_c)
        expected = float(t.contact * solver.config.local_contact_mult
                         + t.smooth + t.rec)
        assert per_clip[c] == pytest.approx(expected, rel=1e-4)


def test_multi_clip_fit_with_grid(setup):
    import jax.numpy as jnp
    s, _ = setup
    cfg = ClipConfig(num_iter=4, window=4, dct_num=2)
    solver = ClipSolver(model=s["model"], vposer_params=s["vp"],
                        scene_verts=np.asarray(s["scene"]),
                        contact_vids=s["vids"],
                        contact_vids_left=s["vids_l"],
                        contact_vids_right=s["vids_r"],
                        config=cfg, nn_impl="grid", grid_h=0.3)
    C, T = 2, 8
    bodies, cams, scenes = _batch(s, C, T)
    mesh = SH.make_mesh({"clips": 2})
    mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None)
    state_b, hist = mc.fit(bodies, cams, jnp.asarray(scenes),
                           mode="global")
    assert np.all(np.isfinite(hist["global_a"]))


def test_multi_clip_chunked_skate_matches_per_clip(setup):
    """skate_clip_chunk splits the fleet skate phase into sequential
    clip sub-batches of one compiled program (r5: the HBM-bound skate
    step's per-clip cost RISES with batch size on hardware). Per-clip
    Adam moments never mix across clips, so C=4 chunked at 2 must
    reproduce per-clip ClipSolver.fit trajectories exactly."""
    s, solver = setup
    C, T = 4, 8
    bodies, cams, scenes = _batch(s, C, T)
    mesh = SH.make_mesh({"clips": 1})
    mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None,
                         skate_clip_chunk=2)
    state_b, hist = mc.fit(bodies, cams, jnp.asarray(scenes),
                           mode="local")
    assert hist["local_skate"].shape[1] == C
    for c in range(C):
        state_c, hist_c = solver.fit(bodies[c], cams[c], mode="local")
        np.testing.assert_allclose(np.asarray(state_b.body_6d[c]),
                                   np.asarray(state_c.body_6d),
                                   atol=2e-5)
        np.testing.assert_allclose(hist["local_skate"][:, c],
                                   hist_c["local_skate"], atol=2e-5)


def test_multi_clip_grid_fit_one_device_matches_per_clip(setup):
    """Full grid-mode local fit on a ONE-device mesh — the production
    fleet-bench path, which r5 folds clips into frames for BOTH the
    skate model chain and the candidate refresh — must reproduce
    per-clip grid-mode ClipSolver.fit trajectories."""
    import jax.numpy as jnp
    s, _ = setup
    cfg = ClipConfig(num_iter=4, window=4, dct_num=2,
                     contact_refresh_steps=2)
    solver = ClipSolver(model=s["model"], vposer_params=s["vp"],
                        scene_verts=np.asarray(s["scene"]),
                        contact_vids=s["vids"],
                        contact_vids_left=s["vids_l"],
                        contact_vids_right=s["vids_r"],
                        config=cfg, nn_impl="grid", grid_h=0.3)
    C, T = 2, 8
    bodies, cams, scenes = _batch(s, C, T)
    mesh = SH.make_mesh({"clips": 1})
    mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None)
    state_b, hist = mc.fit(bodies, cams, jnp.asarray(scenes),
                           mode="local")
    for c in range(C):
        state_c, hist_c = solver.fit(bodies[c], cams[c], mode="local")
        np.testing.assert_allclose(np.asarray(state_b.body_6d[c]),
                                   np.asarray(state_c.body_6d),
                                   atol=2e-5)
        for k in hist_c:
            np.testing.assert_allclose(hist[k][:, c], hist_c[k],
                                       atol=2e-5, err_msg=k)


def test_maybe_initialize_distributed_noop(monkeypatch):
    """Single-process path is a strict no-op; the env flag routes to
    jax.distributed.initialize with pass-through args."""
    calls = []
    monkeypatch.delenv("FPV4D_DISTRIBUTED", raising=False)
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    assert SH.maybe_initialize_distributed() is False
    assert calls == []

    monkeypatch.setenv("FPV4D_DISTRIBUTED", "1")
    assert SH.maybe_initialize_distributed() is True
    assert len(calls) == 1

    monkeypatch.delenv("FPV4D_DISTRIBUTED")
    assert SH.maybe_initialize_distributed(
        coordinator_address="10.0.0.1:1234", num_processes=2,
        process_id=0) is True
    assert calls[-1]["coordinator_address"] == "10.0.0.1:1234"

    # REGRESSION: the guard must never enumerate devices — doing so
    # initializes the local backend, after which the real
    # jax.distributed.initialize() unconditionally raises ("must be
    # called before any JAX device operations")
    def _boom(*a, **k):
        raise AssertionError("guard must not touch jax devices")
    monkeypatch.setattr(jax, "process_count", _boom)
    monkeypatch.setattr(jax, "devices", _boom)
    monkeypatch.setenv("FPV4D_DISTRIBUTED", "1")
    assert SH.maybe_initialize_distributed() is True

    # already-initialized short-circuit: a live client handle returns
    # True without re-calling initialize
    from jax._src import distributed as _jdist
    n_calls = len(calls)
    monkeypatch.setattr(_jdist.global_state, "client", object(),
                        raising=False)
    assert SH.maybe_initialize_distributed() is True
    assert len(calls) == n_calls


def test_dct_window_sharding_alignment():
    """c_dct's window axis shards over the frame axis exactly when the
    window count divides it; the sharded dct step matches unsharded."""
    mesh = SH.make_mesh({"clips": 2, "frames": 4})
    sh_aligned = SH.clip_batch_shardings(mesh, dct_windows=8)
    sh_odd = SH.clip_batch_shardings(mesh, dct_windows=6)
    sh_none = SH.clip_batch_shardings(mesh)
    assert sh_aligned["state"].c_dct.spec == ("clips", "frames")
    assert tuple(sh_odd["state"].c_dct.spec) == ("clips", None)
    assert tuple(sh_none["state"].c_dct.spec) == ("clips", None)


def test_sharded_dct_a_matches_single_clip(setup):
    """The sharded dct_a specialization (hoisted loop-invariant joints,
    see build_sharded_step) steps c_dct identically to the single-clip
    solver's _make_dct_only_phase."""
    s, solver = setup
    C, T = 2, 8
    bodies, cams, scenes = _batch(s, C, T)
    mesh = SH.make_mesh({"clips": 2})
    mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None)
    state_b, target_b, weights_b = mc.init_batch(bodies, cams)
    sb, tb, wb, scb = SH.shard_batch(mesh, state_b, target_b, weights_b,
                                     jnp.asarray(scenes),
                                     frame_axis=None)
    step_fn, init_fn = SH.build_sharded_step(solver, mesh, "dct_a",
                                             frame_axis=None,
                                             num_steps=3)
    opt_state = init_fn(sb)
    sb1, _, hist = step_fn(sb, opt_state, tb, wb, scb)
    hist = np.asarray(hist)
    assert hist.shape == (3, C)

    for c in range(C):
        state_c, target_c, w_c = solver.init_state(bodies[c], cams[c])
        opt_c = solver._opt.init(state_c)
        st_c, _, h_c = solver._run_phase(state_c, opt_c, target_c, w_c,
                                         3, "dct_a")
        np.testing.assert_allclose(hist[:, c], np.asarray(h_c),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sb1.c_dct[c]),
                                   np.asarray(st_c.c_dct), atol=1e-6)


def test_multi_clip_grid_cache(setup):
    """Per-clip voxel grids are cached across fit() calls keyed by the
    scene CONTENT (r3: rebuilding cost ~1.4 s/call at C=8 production
    scale) — a repeated fit reuses them, a changed scene rebuilds."""
    s, _ = setup
    cfg = ClipConfig(num_iter=4, window=4, dct_num=2)
    solver = ClipSolver(model=s["model"], vposer_params=s["vp"],
                        scene_verts=s["scene"], contact_vids=s["vids"],
                        contact_vids_left=s["vids_l"],
                        contact_vids_right=s["vids_r"],
                        config=cfg, nn_impl="grid")
    C, T = 2, 8
    bodies, cams, scenes = _batch(s, C, T)
    mesh = SH.make_mesh({"clips": 2})
    mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None)
    g1 = mc._get_grids(scenes)
    assert g1 is not None
    assert mc._get_grids(scenes) is g1            # cache hit
    scenes2 = np.asarray(scenes).copy()
    scenes2[0, 0] += 0.125
    g2 = mc._get_grids(scenes2)
    assert g2 is not g1                           # content change
    # observability counters track the hit/miss history above
    assert (mc.grid_cache_hits, mc.grid_cache_misses) == (1, 2)

    # and the cached grids are what fit() consumes: two consecutive
    # fits give identical results
    st1, _ = mc.fit(bodies, cams, jnp.asarray(scenes), mode="global")
    st2, _ = mc.fit(bodies, cams, jnp.asarray(scenes), mode="global")
    np.testing.assert_array_equal(np.asarray(st1.body_6d),
                                  np.asarray(st2.body_6d))
