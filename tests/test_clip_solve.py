"""Integration tests of the clip-level joint solver on a synthetic
30-frame-class scenario (SURVEY.md section 4 strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpv4d.config import ClipConfig
from fpv4d.solve.clip_solve import ClipSolver, ClipState
from tests.helpers import make_scenario


@pytest.fixture(scope="module")
def scenario():
    return make_scenario(T=12, num_verts=256, seed=0)


@pytest.fixture(scope="module")
def solver(scenario):
    cfg = ClipConfig(num_iter=10, num_iter_dct=20, window=6,
                     num_dct_joints=23, dct_num=3)
    s = scenario
    return ClipSolver(model=s["model"], vposer_params=s["vp"],
                      scene_verts=s["scene"], contact_vids=s["vids"],
                      contact_vids_left=s["vids_l"],
                      contact_vids_right=s["vids_r"],
                      config=cfg, use_pallas=False)


def test_init_state_shapes_and_outliers(solver, scenario):
    body = np.asarray(scenario["body"]).copy()
    # corrupt frame 5 with a huge vposer latent -> must be flagged
    body[5, 16:48] = 20.0
    state, target, w = solver.init_state(jnp.asarray(body),
                                         scenario["camera_ext"])
    assert state.body_6d.shape == (12, 78)
    assert state.camera_ext.shape == (12, 4, 4)
    assert state.c_dct.shape == (2, 23, 3, 3)
    assert float(state.scale) == pytest.approx(1.8)
    w = np.asarray(w)
    assert w[5] == 0.0 and w.sum() == 11
    # outlier frame re-seeded from a neighbor, not from itself
    b6 = np.asarray(state.body_6d)
    t6 = np.asarray(target)
    assert not np.allclose(b6[5], t6[5])
    assert np.allclose(b6[4], t6[4])


def test_terms_finite(solver, scenario):
    state, target, w = solver.init_state(scenario["body"],
                                         scenario["camera_ext"])
    t = solver.terms(state, target, w)
    for name, val in t._asdict().items():
        assert np.isfinite(float(val)), name


def test_local_mode_improves(solver, scenario):
    state, target, w = solver.init_state(scenario["body"],
                                         scenario["camera_ext"])
    t0 = solver.terms(state, target, w)
    loss0 = float(t0.contact * 0.2 + t0.smooth + t0.rec)
    final, hist = solver.fit(scenario["body"], scenario["camera_ext"],
                             mode="local")
    assert set(hist) == {"local_a", "local_b", "local_skate"}
    assert hist["local_a"].shape == (8,)      # 0.8 * 10
    assert hist["local_b"].shape == (2,)
    assert hist["local_skate"].shape == (4,)  # 0.4 * 10
    assert np.all(np.isfinite(hist["local_a"]))
    assert hist["local_a"][-1] < loss0 + 1e-6
    body, scale, cam = solver.result_params(final)
    assert body.shape == (12, 75)
    assert np.isfinite(scale)
    assert cam.shape == (12, 4, 4)


def test_global_mode_runs(solver, scenario):
    final, hist = solver.fit(scenario["body"], scenario["camera_ext"],
                             mode="global")
    assert set(hist) == {"global_a", "global_b"}
    for h in hist.values():
        assert np.all(np.isfinite(h))
    assert hist["global_a"][-1] <= hist["global_a"][0]


def test_dct_mode_fits_coefficients(solver, scenario):
    final, hist = solver.fit(scenario["body"], scenario["camera_ext"],
                             mode="dct")
    assert set(hist) == {"dct_a", "dct_b"}
    # DCT phase must drive the trajectory-prior loss down
    assert hist["dct_a"][-1] < hist["dct_a"][0]
    assert float(jnp.abs(final.c_dct).max()) > 0.0


def test_stage_masks_freeze_variables(solver, scenario):
    # in dct_a only c_dct may move
    state, target, w = solver.init_state(scenario["body"],
                                         scenario["camera_ext"])
    opt_state = solver._opt.init(state)
    new_state, _, _ = solver._run_phase(state, opt_state, target, w,
                                        3, "dct_a")
    assert np.allclose(np.asarray(new_state.body_6d),
                       np.asarray(state.body_6d))
    assert float(new_state.scale) == float(state.scale)
    assert np.allclose(np.asarray(new_state.camera_ext),
                       np.asarray(state.camera_ext))
    assert not np.allclose(np.asarray(new_state.c_dct),
                           np.asarray(state.c_dct))
    # in local_a, camera is frozen but body and scale move
    new_state, _, _ = solver._run_phase(state, opt_state, target, w,
                                        3, "local_a")
    assert np.allclose(np.asarray(new_state.camera_ext),
                       np.asarray(state.camera_ext))
    assert not np.allclose(np.asarray(new_state.body_6d),
                           np.asarray(state.body_6d))
    assert float(new_state.scale) != float(state.scale)


def test_detect_contact_weights(solver, scenario):
    state, _, _ = solver.init_state(scenario["body"],
                                    scenario["camera_ext"])
    w = np.asarray(solver.detect_contact(state))
    assert w.shape == (12,)
    assert np.all((w >= 0) & (w <= 1))
    # weights must not be the constant 0.5 of the reference's bug
    assert np.abs(w - 0.5).max() > 1e-6


def test_fit_checkpoints_phases(solver, scenario, tmp_path):
    import os
    final, hist = solver.fit(scenario["body"], scenario["camera_ext"],
                             mode="global",
                             checkpoint_dir=str(tmp_path / "ck"))
    assert os.path.isdir(tmp_path / "ck" / "global_a")
    assert os.path.isdir(tmp_path / "ck" / "global_b")
    # restorable
    import optax
    from fpv4d.utils.checkpoint import load_solver_state
    state0, _, _ = solver.init_state(scenario["body"],
                                     scenario["camera_ext"])
    template = {"state": state0,
                "opt_state": solver._opt.init(state0),
                "step": np.int64(0)}
    s2, o2, step = load_solver_state(str(tmp_path / "ck" / "global_b"),
                                     template)
    np.testing.assert_allclose(np.asarray(s2.body_6d),
                               np.asarray(final.body_6d), atol=1e-6)


def test_dct_closed_form_init(scenario):
    from fpv4d.ops import losses as L
    cfg = ClipConfig(num_iter=4, num_iter_dct=6, window=6, dct_num=3,
                     dct_closed_form_init=True)
    s = scenario
    solver2 = ClipSolver(model=s["model"], vposer_params=s["vp"],
                         scene_verts=s["scene"], contact_vids=s["vids"],
                         contact_vids_left=s["vids_l"],
                         contact_vids_right=s["vids_r"],
                         config=cfg, use_pallas=False)
    state, target, w = solver2.init_state(s["body"], s["camera_ext"])
    assert float(jnp.abs(state.c_dct).max()) > 0
    # the DCT term starts far lower than with a zero init
    t_cf = solver2.terms(state, target, w)
    zero_state = state._replace(c_dct=jnp.zeros_like(state.c_dct))
    t_zero = solver2.terms(zero_state, target, w)
    assert float(t_cf.dct) < 0.5 * float(t_zero.dct)


def test_skate_subset_estimator(scenario):
    """terms2 on a stratified vertex subset: the skate term (feet are
    always included exactly) matches the full-mesh value exactly; the
    whole-mesh smoothing estimate tracks the full value closely."""
    s = scenario
    kw = dict(model=s["model"], vposer_params=s["vp"],
              scene_verts=s["scene"], contact_vids=s["vids"],
              contact_vids_left=s["vids_l"],
              contact_vids_right=s["vids_r"], use_pallas=False)
    full = ClipSolver(config=ClipConfig(num_iter=4, window=6,
                                        dct_num=3), **kw)
    sub = ClipSolver(config=ClipConfig(num_iter=4, window=6, dct_num=3,
                                       skate_subset=128), **kw)
    assert sub._skate_vids is not None
    assert len(sub._skate_vids) < s["model"].num_verts

    state, target, w = full.init_state(s["body"], s["camera_ext"])
    wr = full.detect_contact(state)
    rec_f, ls_f, vs_f, sk_f = [float(x) for x in
                               full.terms2(state, target, w, wr)]
    rec_s, ls_s, vs_s, sk_s = [float(x) for x in
                               sub.terms2(state, target, w, wr)]
    assert rec_s == pytest.approx(rec_f, rel=1e-5)
    assert ls_s == pytest.approx(ls_f, rel=1e-5)
    assert sk_s == pytest.approx(sk_f, rel=1e-4)   # feet exact
    assert vs_s == pytest.approx(vs_f, rel=0.25)   # unbiased estimate

    # the subset solver still runs the full local schedule
    st, hist = sub.fit(s["body"], s["camera_ext"], mode="local")
    assert np.all(np.isfinite(hist["local_skate"]))


def test_skate_body_only_prunes_and_tracks(scenario):
    """skate_body_only on a sparse-weight model: the sample pool drops
    to body-subtree vertices, joint pruning engages on the skate
    forward, feet stay exact, the smoothing estimate still tracks the
    full-mesh value, and the full local fit stays finite."""
    from fpv4d.models import smplx as jsmplx
    from fpv4d.ops import contact
    s = scenario
    nv = s["model"].num_verts
    model = jsmplx.synthetic_model(num_verts=nv, seed=0,
                                   sparse_weights=True)
    segs = contact.synthetic_segments(nv, seed=0, coherent=True)
    vids_l = np.asarray(segs["L_Leg"], np.int32)
    vids_r = np.asarray(segs["R_Leg"], np.int32)
    kw = dict(model=model, vposer_params=s["vp"],
              scene_verts=s["scene"],
              contact_vids=np.concatenate([vids_l, vids_r]),
              contact_vids_left=vids_l, contact_vids_right=vids_r,
              use_pallas=False)
    full = ClipSolver(config=ClipConfig(num_iter=4, window=6,
                                        dct_num=3), **kw)
    sub = ClipSolver(config=ClipConfig(num_iter=4, window=6, dct_num=3,
                                       skate_subset=128,
                                       skate_body_only=True), **kw)
    # the pool really is body-only: every sampled vertex (minus the
    # always-appended feet) has zero weight on joints >= 23
    w = np.asarray(model.lbs_weights)
    feet = set(int(v) for v in np.concatenate([vids_l, vids_r]))
    strat = [int(v) for v in sub._skate_vids if int(v) not in feet]
    assert strat, "stratified sample empty"
    assert (w[strat][:, 23:] == 0).all()
    # joint pruning engages on the skate forward and stays in the
    # body subtree (plus whatever the foot verts touch, which on the
    # coherent segments is the leg chain < 23)
    assert sub._skate_prune is not None
    kept = np.asarray(sub._skate_prune[0])
    assert kept.max() < 23

    state, target, wts = full.init_state(s["body"], s["camera_ext"])
    wr = full.detect_contact(state)
    rec_f, ls_f, vs_f, sk_f = [float(x) for x in
                               full.terms2(state, target, wts, wr)]
    rec_s, ls_s, vs_s, sk_s = [float(x) for x in
                               sub.terms2(state, target, wts, wr)]
    assert sk_s == pytest.approx(sk_f, rel=1e-4)   # feet exact
    assert vs_s == pytest.approx(vs_f, rel=0.35)   # biased-pool estimate
    st, hist = sub.fit(s["body"], s["camera_ext"], mode="local")
    assert np.all(np.isfinite(hist["local_skate"]))


def test_lazy_contact_matches_exact_grid(scenario):
    """Grid mode with lazy candidate refresh: close to the exact
    per-step grid solve (identical while queries stay within their
    refresh-time cells), and multi-clip sharded lazy == single-clip
    lazy exactly."""
    import jax.numpy as jnp
    s = scenario
    kw = dict(model=s["model"], vposer_params=s["vp"],
              scene_verts=np.asarray(s["scene"]),
              contact_vids=s["vids"], contact_vids_left=s["vids_l"],
              contact_vids_right=s["vids_r"], nn_impl="grid",
              grid_h=0.3)
    cfg_exact = ClipConfig(num_iter=8, window=6, dct_num=3,
                           contact_refresh_steps=0)
    cfg_lazy = ClipConfig(num_iter=8, window=6, dct_num=3,
                          contact_refresh_steps=4)
    exact = ClipSolver(config=cfg_exact, **kw)
    lazy = ClipSolver(config=cfg_lazy, **kw)
    st_e, hist_e = exact.fit(s["body"], s["camera_ext"], mode="local")
    st_l, hist_l = lazy.fit(s["body"], s["camera_ext"], mode="local")
    assert len(hist_l["local_a"]) == len(hist_e["local_a"])
    # trajectories stay close (few steps, small drift)
    np.testing.assert_allclose(np.asarray(st_l.body_6d),
                               np.asarray(st_e.body_6d), atol=5e-3)

    # sharded multi-clip lazy == per-clip lazy (same chunking)
    from fpv4d.parallel import sharding as SH
    from fpv4d.parallel.multi_clip import MultiClipSolver, pad_scenes
    C = 2
    bodies = jnp.asarray(np.tile(np.asarray(s["body"])[None], (C, 1, 1)))
    cams = jnp.asarray(np.tile(np.asarray(s["camera_ext"])[None],
                               (C, 1, 1, 1)))
    scenes = pad_scenes([np.asarray(s["scene"])] * C)
    mesh = SH.make_mesh({"clips": 2})
    mc = MultiClipSolver(solver=lazy, mesh=mesh, frame_axis=None)
    state_b, hist_b = mc.fit(bodies, cams, jnp.asarray(scenes),
                             mode="local")
    for c in range(C):
        np.testing.assert_allclose(np.asarray(state_b.body_6d[c]),
                                   np.asarray(st_l.body_6d),
                                   atol=2e-5)
        for k in hist_l:
            np.testing.assert_allclose(hist_b[k][:, c], hist_l[k],
                                       atol=2e-5)


def test_compact_candidates_solve_parity(scenario):
    """contact_compact (refresh-time candidate compaction): the lazy
    local solve with a compacted table large enough to hold every
    distinct refresh-time NN tracks the uncompacted lazy solve, and
    the sharded multi-clip refresh applies the same compaction
    (sharded == single exactly)."""
    import jax.numpy as jnp
    s = scenario
    kw = dict(model=s["model"], vposer_params=s["vp"],
              scene_verts=np.asarray(s["scene"]),
              contact_vids=s["vids"], contact_vids_left=s["vids_l"],
              contact_vids_right=s["vids_r"], nn_impl="grid",
              grid_h=0.3)
    cfg_lazy = ClipConfig(num_iter=8, window=6, dct_num=3,
                          contact_refresh_steps=4)
    cfg_comp = ClipConfig(num_iter=8, window=6, dct_num=3,
                          contact_refresh_steps=4, contact_compact=64)
    lazy = ClipSolver(config=cfg_lazy, **kw)
    comp = ClipSolver(config=cfg_comp, **kw)
    st_l, hist_l = lazy.fit(s["body"], s["camera_ext"], mode="local")
    st_c, hist_c = comp.fit(s["body"], s["camera_ext"], mode="local")
    # compacted table shape actually shrank
    fc = comp._refresh_cands(st_c)
    assert fc.cand.shape[1] == 64
    np.testing.assert_allclose(np.asarray(st_c.body_6d),
                               np.asarray(st_l.body_6d), atol=5e-3)

    from fpv4d.parallel import sharding as SH
    from fpv4d.parallel.multi_clip import MultiClipSolver, pad_scenes
    C = 2
    bodies = jnp.asarray(np.tile(np.asarray(s["body"])[None], (C, 1, 1)))
    cams = jnp.asarray(np.tile(np.asarray(s["camera_ext"])[None],
                               (C, 1, 1, 1)))
    scenes = pad_scenes([np.asarray(s["scene"])] * C)
    mesh = SH.make_mesh({"clips": 2})
    mc = MultiClipSolver(solver=comp, mesh=mesh, frame_axis=None)
    state_b, hist_b = mc.fit(bodies, cams, jnp.asarray(scenes),
                             mode="local")
    for c in range(C):
        np.testing.assert_allclose(np.asarray(state_b.body_6d[c]),
                                   np.asarray(st_c.body_6d),
                                   atol=2e-5)


def test_dct_only_phase_matches_generic(solver, scenario):
    """The specialized dct_a runner (loop-invariant joints hoisted out
    of the scan, _make_dct_only_phase) must reproduce the generic
    masked value_and_grad path exactly."""
    import optax
    from fpv4d.solve.clip_solve import mask_stop_gradient

    state, target, w = solver.init_state(scenario["body"],
                                         scenario["camera_ext"])
    opt_state = solver._opt.init(state)
    # specialized path (what _run_phase dispatches to for dct_a)
    st_s, _, h_s = solver._run_phase(state, opt_state, target, w, 5,
                                     "dct_a")

    # generic reference: full-state value_and_grad with the static
    # stop-gradient mask, stepped manually
    mask = solver.phase_mask("dct_a")
    st_g, opt_g = state, opt_state
    h_g = []
    for _ in range(5):
        def loss_fn(st):
            return solver.phase_loss("dct_a",
                                     mask_stop_gradient(st, mask),
                                     target, w)
        loss, grads = jax.value_and_grad(loss_fn)(st_g)
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        updates, opt_g = solver._opt.update(grads, opt_g, st_g)
        st_g = optax.apply_updates(st_g, updates)
        h_g.append(float(loss))

    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_g),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st_s.c_dct),
                               np.asarray(st_g.c_dct), atol=1e-7)
    np.testing.assert_allclose(np.asarray(st_s.body_6d),
                               np.asarray(st_g.body_6d), atol=0)


def test_phase_step_body_matches_run_phase(solver, scenario):
    """phase_step_body (bench.py's roofline cost basis) is the EXACT
    scan body: one call must reproduce _run_phase's 1-step result for
    a generic phase, the skate phase, and the dct_a specialization."""
    from fpv4d.solve.clip_solve import forward_world
    state, target, w = solver.init_state(scenario["body"],
                                         scenario["camera_ext"])
    opt_state = solver._opt.init(state)

    st_ref, _, h = solver._run_phase(state, opt_state, target, w, 1,
                                     "local_a")
    body = solver.phase_step_body("local_a")
    st_b, _, loss = body(solver.ctx, state, opt_state, target, w)
    np.testing.assert_allclose(np.asarray(st_b.body_6d),
                               np.asarray(st_ref.body_6d), atol=1e-7)
    np.testing.assert_allclose(float(loss), float(h[0]), rtol=1e-6)

    wr = solver.detect_contact(state)
    st_ref, _, h = solver._run_skate_phase(state, opt_state, target, w,
                                           1, wr)
    st_b, _, loss = solver.phase_step_body("skate")(
        solver.ctx, state, opt_state, target, w, wr)
    np.testing.assert_allclose(np.asarray(st_b.body_6d),
                               np.asarray(st_ref.body_6d), atol=1e-7)
    np.testing.assert_allclose(float(loss), float(h[0]), rtol=1e-6)

    st_ref, _, h = solver._run_phase(state, opt_state, target, w, 1,
                                     "dct_a")
    joints_w = jax.jit(lambda ctx, st: forward_world(
        ctx, st, vertex_subset=solver.contact_vids)[1])(solver.ctx,
                                                        state)
    st_b, _, loss = solver.phase_step_body("dct_a")(joints_w, state,
                                                    opt_state)
    np.testing.assert_allclose(np.asarray(st_b.c_dct),
                               np.asarray(st_ref.c_dct), atol=1e-7)
    np.testing.assert_allclose(float(loss), float(h[0]), rtol=1e-6)


def test_contact_a_shared_program(solver, scenario):
    """local_a and global_a compile ONE shared executable (key
    'contact_a'; the contact multiplier rides through as a traced
    scalar — compiled-program-budget cut), and each phase's scanned
    losses match a manual masked value_and_grad on its phase_loss.
    Also: dct_a's 5-arg specialized runner must survive a cache HIT
    (it takes no contact-multiplier argument)."""
    import optax
    from fpv4d.solve.clip_solve import mask_stop_gradient

    state, target, w = solver.init_state(scenario["body"],
                                         scenario["camera_ext"])
    opt_state = solver._opt.init(state)
    st_l, _, h_l = solver._run_phase(state, opt_state, target, w, 4,
                                     "local_a")
    st_g, _, h_g = solver._run_phase(state, opt_state, target, w, 4,
                                     "global_a")
    a_keys = [k for k in solver._compiled
              if k[0] in ("local_a", "global_a", "contact_a")
              and len(k) == 2 and k[1] == 4]
    assert a_keys == [("contact_a", 4)]
    # the multipliers differ (0.2 vs 0.5), so the trajectories must
    assert not np.allclose(np.asarray(h_l), np.asarray(h_g))

    for phase, st_s, h_s in (("local_a", st_l, h_l),
                             ("global_a", st_g, h_g)):
        mask = solver.phase_mask(phase)
        st_r, opt_r = state, opt_state
        h_r = []
        for _ in range(4):
            def loss_fn(st):
                return solver.phase_loss(
                    phase, mask_stop_gradient(st, mask), target, w)
            loss, grads = jax.value_and_grad(loss_fn)(st_r)
            grads = jax.tree.map(lambda g, m: g * m, grads, mask)
            updates, opt_r = solver._opt.update(grads, opt_r, st_r)
            st_r = optax.apply_updates(st_r, updates)
            h_r.append(float(loss))
        np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_r),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st_s.body_6d),
                                   np.asarray(st_r.body_6d), atol=1e-5)

    # dct_a cache hit: same (phase, steps) twice, no signature error
    solver._run_phase(state, opt_state, target, w, 4, "dct_a")
    solver._run_phase(state, opt_state, target, w, 4, "dct_a")
