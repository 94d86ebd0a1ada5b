"""Fused candidate-NN Pallas kernel (ops/cand_pallas) vs the XLA
production path (ops/nn.nn_to_candidates): identical semantics — exact
distance at the selected neighbor, BIG saturation for empty frames,
gradient 2(q - y*) with zero gradient on misses. Selection may differ
between the two implementations only among candidates within the
packed-index truncation (2^-14 relative), so distances are compared
with that tolerance and must never undercut the true minimum."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpv4d.ops import nn as NN
from fpv4d.ops.cand_pallas import cand_nn, pack_candidates


def _mk(T=6, N=40, P=36, seed=0, scale=2.0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(T, N, 3).astype(np.float32) * scale)
    cand = jnp.asarray(rng.randn(T, P, 3).astype(np.float32) * scale)
    valid = jnp.asarray(rng.rand(T, P) > 0.3)
    return q, cand, valid


def test_matches_xla_path():
    q, cand, valid = _mk()
    fc = NN.FrameCands(cand=cand, valid=valid)
    d_ref = NN.nn_to_candidates(q, fc)
    d_k = cand_nn(q, pack_candidates(cand, valid), 4, True)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_ref),
                               atol=1e-3)
    # exact-at-winner: the kernel may pick a near-tied rival but must
    # never report a distance meaningfully below the true minimum
    # (the winner's coords are reconstructed from bf16 halves, whose
    # ~2^-16 relative residual bounds the undershoot)
    assert np.all(np.asarray(d_k) >= np.asarray(d_ref) - 1e-3)


def test_empty_frame_saturates_with_zero_grad():
    q, cand, valid = _mk()
    valid = valid.at[2].set(False)
    packed = pack_candidates(cand, valid)
    d = cand_nn(q, packed, 4, True)
    assert np.all(np.asarray(d[2]) == NN.BIG)
    g = jax.grad(lambda q: jnp.sum(cand_nn(q, packed, 4, True)))(q)
    assert np.all(np.asarray(g[2]) == 0.0)


def test_duplicate_candidates():
    # candidate tables carry duplicates (a point appears in up to 27
    # cell neighborhoods); the packed-index tie-break must still
    # return that exact point's distance
    q, cand, valid = _mk()
    cand = cand.at[:, 1].set(cand[:, 0])
    valid = jnp.ones_like(valid, bool)
    fc = NN.FrameCands(cand=cand, valid=valid)
    d_ref = NN.nn_to_candidates(q, fc)
    d_k = cand_nn(q, pack_candidates(cand, valid), 4, True)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_ref),
                               atol=1e-3)


def test_gradient_matches_xla_path():
    q, cand, valid = _mk(seed=3)
    fc = NN.FrameCands(cand=cand, valid=valid)
    packed = pack_candidates(cand, valid)
    # robust-contact-shaped downstream so grads are O(1)
    g_ref = jax.grad(lambda q: jnp.sum(jnp.sqrt(
        NN.nn_to_candidates(q, fc) + 1e-9)))(q)
    g_k = jax.grad(lambda q: jnp.sum(jnp.sqrt(
        cand_nn(q, packed, 4, True) + 1e-9)))(q)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               atol=1e-2)


def test_p_cap():
    with pytest.raises(ValueError):
        pack_candidates(jnp.zeros((2, 600, 3)), jnp.ones((2, 600), bool))


def test_solver_lazy_contact_pallas_matches_xla():
    """The full local_a phase with cand_impl='pallas_interpret' tracks
    the XLA lazy-candidate path step for step."""
    from fpv4d.config import ClipConfig
    from fpv4d.solve.clip_solve import ClipSolver
    from tests.helpers import make_scenario

    s = make_scenario(T=8, num_verts=256, seed=0)
    hists = {}
    for impl in ("xla", "pallas_interpret"):
        cfg = ClipConfig(num_iter=8, window=4, dct_num=3,
                         contact_refresh_steps=4, cand_impl=impl)
        solver = ClipSolver(model=s["model"], vposer_params=s["vp"],
                            scene_verts=np.asarray(s["scene"]),
                            contact_vids=s["vids"],
                            contact_vids_left=s["vids_l"],
                            contact_vids_right=s["vids_r"],
                            config=cfg, nn_impl="grid")
        state, target, w = solver.init_state(s["body"], s["camera_ext"])
        opt = solver._opt.init(state)
        _, _, h = solver._run_phase_auto(state, opt, target, w, 8,
                                         "local_a")
        hists[impl] = np.asarray(h)
        assert np.all(np.isfinite(hists[impl]))
    np.testing.assert_allclose(hists["pallas_interpret"], hists["xla"],
                               rtol=1e-4, atol=1e-5)
