"""Scene-SDF collision term (fpv4d.ops.sdf): sampling accuracy,
linearization semantics, PROX loader round-trip, and solver
integration (the reference declares weight_collision but never
implements the term — fpv4d completes the contract)."""
import json

import numpy as np
import jax
import jax.numpy as jnp

from fpv4d.ops import sdf as SDF


def test_plane_sdf_sampling_and_gradient():
    g = SDF.plane_sdf(y0=-1.0, extent=4.0, dim=33)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-3, 3, (200, 3)).astype(np.float32))
    s, grad = SDF.sample(g, pts)
    # exact linear field: sdf = y + 1, grad = (0, 1, 0)
    np.testing.assert_allclose(np.asarray(s),
                               np.asarray(pts[:, 1]) + 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad),
                               np.tile([0.0, 1.0, 0.0], (200, 1)),
                               atol=1e-3)


def test_linearize_exact_at_refresh_point():
    g = SDF.plane_sdf(y0=0.0, extent=4.0, dim=17)
    rng = np.random.RandomState(1)
    v0 = jnp.asarray(rng.uniform(-2, 2, (4, 10, 3)).astype(np.float32))
    lin = SDF.linearize(g, v0)
    pen0 = SDF.collision_penalty(v0, lin)
    s_exact, _ = SDF.sample(g, v0)
    expect = float(np.mean(np.maximum(-np.asarray(s_exact), 0.0)))
    np.testing.assert_allclose(float(pen0), expect, atol=1e-6)
    # drift: the linear model tracks the true (linear) plane SDF
    v1 = v0 + 0.05
    pen1 = SDF.collision_penalty(v1, lin)
    s1, _ = SDF.sample(g, v1)
    np.testing.assert_allclose(
        float(pen1), float(np.mean(np.maximum(-np.asarray(s1), 0.0))),
        atol=1e-4)


def test_collision_gradient_pushes_out():
    g = SDF.plane_sdf(y0=0.0, extent=4.0, dim=17)
    v = jnp.asarray(np.array([[[0.0, -0.5, 0.0]]], np.float32))
    lin = SDF.linearize(g, v)
    grad = jax.grad(lambda v: SDF.collision_penalty(v, lin))(v)
    # penalty decreases as y increases -> d pen / d y < 0
    assert float(grad[0, 0, 1]) < -0.5
    # outside the scene: zero penalty, zero gradient
    v_out = jnp.asarray(np.array([[[0.0, 0.5, 0.0]]], np.float32))
    lin_out = SDF.linearize(g, v_out)
    assert float(SDF.collision_penalty(v_out, lin_out)) == 0.0
    g_out = jax.grad(lambda v: SDF.collision_penalty(v, lin_out))(v_out)
    assert float(jnp.abs(g_out).max()) == 0.0


def test_prox_loader_roundtrip(tmp_path):
    d = 8
    vals = np.random.RandomState(2).randn(d, d, d).astype(np.float32)
    np.save(tmp_path / "scene_sdf.npy", vals.ravel())
    json.dump({"min": [-1, -2, -3], "max": [1, 2, 3], "dim": d},
              open(tmp_path / "scene.json", "w"))
    g = SDF.load_prox_sdf(str(tmp_path / "scene.json"),
                          str(tmp_path / "scene_sdf.npy"))
    assert g.values.shape == (d, d, d)
    np.testing.assert_allclose(np.asarray(g.mins), [-1, -2, -3])
    # sampling at a grid node returns the stored value
    node = np.asarray(g.mins) + (np.asarray(g.maxs) - np.asarray(
        g.mins)) * np.array([2, 3, 4]) / (d - 1)
    s, _ = SDF.sample(g, jnp.asarray(node[None].astype(np.float32)))
    np.testing.assert_allclose(float(s[0]), vals[2, 3, 4], atol=1e-4)


def test_solver_collision_reduces_penetration():
    """A body initialized below the floor gets pushed out when the
    solver is given the scene SDF."""
    from fpv4d.config import ClipConfig
    from fpv4d.solve.clip_solve import ClipSolver, forward_world
    from tests.helpers import make_scenario

    s = make_scenario(T=6, num_verts=128, seed=5)
    body = np.asarray(s["body"]).copy()
    body[:, 1] -= 2.0      # transl y: sink the body below the floor

    results = {}
    for name, grid in (("off", None),
                       ("on", SDF.plane_sdf(y0=-1.0, extent=6.0,
                                            dim=25))):
        cfg = ClipConfig(num_iter=20, window=3, dct_num=2,
                         contact_refresh_steps=5)
        solver = ClipSolver(model=s["model"], vposer_params=s["vp"],
                            scene_verts=np.asarray(s["scene"]),
                            contact_vids=s["vids"],
                            contact_vids_left=s["vids_l"],
                            contact_vids_right=s["vids_r"],
                            config=cfg, nn_impl="xla", sdf=grid)
        state, hist = solver.fit(jnp.asarray(body), s["camera_ext"],
                                 mode="local")
        verts_w, _, _ = forward_world(solver.ctx, state)
        pen = float(np.maximum(
            -1.0 - np.asarray(verts_w)[..., 1], 0.0).mean())
        results[name] = pen
        assert np.all([np.all(np.isfinite(v)) for v in hist.values()])
    assert results["on"] < results["off"]

def test_sharded_collision_matches_single_clip():
    """Multi-clip sharded fit with a scene SDF reproduces the
    single-clip solver's trajectories (independent clips, identical
    per-clip gradients)."""
    from fpv4d.config import ClipConfig
    from fpv4d.parallel import sharding as SH
    from fpv4d.parallel.multi_clip import MultiClipSolver, pad_scenes
    from fpv4d.solve.clip_solve import ClipSolver
    from tests.helpers import make_scenario

    s = make_scenario(T=6, num_verts=128, seed=6)
    body = np.asarray(s["body"]).copy()
    body[:, 1] -= 1.5
    grid = SDF.plane_sdf(y0=-1.0, extent=6.0, dim=17)
    cfg = ClipConfig(num_iter=8, window=3, dct_num=2,
                     contact_refresh_steps=4)
    solver = ClipSolver(model=s["model"], vposer_params=s["vp"],
                        scene_verts=np.asarray(s["scene"]),
                        contact_vids=s["vids"],
                        contact_vids_left=s["vids_l"],
                        contact_vids_right=s["vids_r"],
                        config=cfg, nn_impl="xla", sdf=grid)
    st_single, hist_single = solver.fit(jnp.asarray(body),
                                        s["camera_ext"], mode="local")

    C = 2
    bodies = jnp.asarray(np.tile(body[None], (C, 1, 1)))
    cams = jnp.asarray(np.tile(np.asarray(s["camera_ext"])[None],
                               (C, 1, 1, 1)))
    scenes = pad_scenes([np.asarray(s["scene"])] * C)
    mesh = SH.make_mesh({"clips": 2})
    mc = MultiClipSolver(solver=solver, mesh=mesh, frame_axis=None)
    st_b, hist_b = mc.fit(bodies, cams, jnp.asarray(scenes),
                          mode="local")
    for c in range(C):
        np.testing.assert_allclose(np.asarray(st_b.body_6d[c]),
                                   np.asarray(st_single.body_6d),
                                   atol=2e-5)
    for k in hist_single:
        np.testing.assert_allclose(hist_b[k][:, 0], hist_single[k],
                                   atol=2e-5)
