"""Static joint-support pruning (SmplxModel.joint_support).

Real SMPL-X artifacts store sparse skinning weights, so a subset-
skinned forward only needs the FK transforms of the joints that
actually influence the subset (plus ancestors). These tests pin the
exactness contract: pruning drops exactly-zero terms only, so pruned
and full forwards agree to f32 summation order. Reference semantics
being preserved: the full-mesh forward of
/root/reference/global_optimization.py:283-290.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpv4d.models import smplx as jsmplx
from fpv4d.models.smplx import NUM_JOINTS, PARENTS
from fpv4d.ops import contact
from fpv4d.solve.clip_solve import ClipSolver, forward_world
from fpv4d.config import ClipConfig

from helpers import make_scenario, smooth_noise


@pytest.fixture(scope="module")
def sparse_model():
    # sparse_posedirs too: exercises the pose_joint_subset path (the
    # real artifact has dense posedirs — covered by _sparse_scenario)
    return jsmplx.synthetic_model(num_verts=256, seed=0,
                                  sparse_weights=True,
                                  sparse_posedirs=True)


@pytest.fixture(scope="module")
def leg_vids():
    segs = contact.synthetic_segments(256, seed=0)
    return np.concatenate([np.asarray(segs["L_Leg"], np.int32),
                           np.asarray(segs["R_Leg"], np.int32)])


def _pose_inputs(model, B=3, seed=7):
    rng = np.random.RandomState(seed)
    return dict(
        betas=jnp.asarray(rng.randn(B, model.num_betas) * 0.3,
                          jnp.float32),
        global_orient=jnp.asarray(rng.randn(B, 3) * 0.2, jnp.float32),
        body_pose=jnp.asarray(rng.randn(B, 63) * 0.2, jnp.float32),
        transl=jnp.asarray(rng.randn(B, 3) * 0.1, jnp.float32),
        left_hand_pose=jnp.asarray(rng.randn(B, model.num_pca) * 0.3,
                                   jnp.float32),
        right_hand_pose=jnp.asarray(rng.randn(B, model.num_pca) * 0.3,
                                    jnp.float32),
    )


def test_dense_model_returns_none():
    # the default synthetic model's Gaussian weights underflow to
    # exact zeros for far joints, so it legitimately prunes a little;
    # force strictly-positive weights to exercise the None path
    import dataclasses
    m = jsmplx.synthetic_model(num_verts=64, seed=0)
    m = dataclasses.replace(
        m, lbs_weights=jnp.full_like(m.lbs_weights, 1.0 / NUM_JOINTS))
    assert m.joint_support(np.arange(8, dtype=np.int32)) is None


def test_sparse_support_prunes_and_is_ancestor_closed(sparse_model,
                                                      leg_vids):
    sup = sparse_model.joint_support(leg_vids)
    assert sup is not None
    kept, pose_joints = sup
    # genuinely prunes: leg verts never touch the 30 finger joints
    assert len(kept) < NUM_JOINTS
    assert 0 in kept                      # root always present
    kept_set = set(int(j) for j in kept)
    for j in kept_set:
        p = PARENTS[j]
        assert p < 0 or p in kept_set     # ancestor closure
    # pose-blendshape support is a subset of all non-root joints
    assert np.all(pose_joints >= 1) and len(pose_joints) < NUM_JOINTS - 1


def test_pruned_forward_matches_full(sparse_model, leg_vids):
    sup = sparse_model.joint_support(leg_vids)
    kept, pose_joints = sup
    inp = _pose_inputs(sparse_model)
    full = sparse_model(**inp, vertex_subset=leg_vids)
    pruned = sparse_model(**inp, vertex_subset=leg_vids,
                          joint_subset=kept,
                          pose_joint_subset=pose_joints)
    # vertices: exact modulo f32 summation order
    np.testing.assert_allclose(np.asarray(pruned["vertices"]),
                               np.asarray(full["vertices"]),
                               atol=1e-5, rtol=1e-5)
    # joints: real at kept slots, NaN (loud) elsewhere
    jp = np.asarray(pruned["joints"])
    jf = np.asarray(full["joints"])
    np.testing.assert_allclose(jp[:, kept], jf[:, kept],
                               atol=1e-5, rtol=1e-5)
    dropped = sorted(set(range(NUM_JOINTS)) - set(int(j) for j in kept))
    assert np.all(np.isnan(jp[:, dropped]))


def test_pruned_gradients_match_full(sparse_model, leg_vids):
    sup = sparse_model.joint_support(leg_vids)
    kept, pose_joints = sup
    inp = _pose_inputs(sparse_model, B=2)

    def loss(body_pose, prune):
        kw = dict(inp)
        kw["body_pose"] = body_pose
        if prune:
            out = sparse_model(**kw, vertex_subset=leg_vids,
                               joint_subset=kept,
                               pose_joint_subset=pose_joints)
        else:
            out = sparse_model(**kw, vertex_subset=leg_vids)
        return jnp.sum(out["vertices"] ** 2)

    g_full = jax.grad(lambda p: loss(p, False))(inp["body_pose"])
    g_pruned = jax.grad(lambda p: loss(p, True))(inp["body_pose"])
    np.testing.assert_allclose(np.asarray(g_pruned), np.asarray(g_full),
                               atol=1e-4, rtol=1e-4)


def _sparse_scenario(T=8):
    # the REAL artifact's structure: sparse lbs_weights, dense learned
    # posedirs (FK prunes; pose blendshapes don't) — what the bench
    # workload uses
    sc = make_scenario(T=T, num_verts=256, seed=0)
    sc["model"] = jsmplx.synthetic_model(num_verts=256, seed=0,
                                         sparse_weights=True)
    return sc


def _solver(sc, **kw):
    return ClipSolver(model=sc["model"], vposer_params=sc["vp"],
                      scene_verts=sc["scene"],
                      contact_vids=sc["vids"],
                      contact_vids_left=sc["vids_l"],
                      contact_vids_right=sc["vids_r"],
                      config=ClipConfig(num_iter=10, window=4,
                                        skate_subset=64),
                      **kw)


def test_solver_prune_engages_on_sparse_model():
    sc = _sparse_scenario()
    s = _solver(sc)
    assert s._contact_prune is not None
    assert len(s._contact_prune[0]) < NUM_JOINTS
    assert s._feet_prune is not None


def test_forward_world_prune_parity():
    sc = _sparse_scenario()
    s = _solver(sc)
    state, _, _ = s.init_state(sc["body"], sc["camera_ext"])
    v_full, _, _ = forward_world(s.ctx, state,
                                 vertex_subset=s.contact_vids)
    v_pruned, _, _ = forward_world(s.ctx, state,
                                   vertex_subset=s.contact_vids,
                                   prune=s._contact_prune)
    np.testing.assert_allclose(np.asarray(v_pruned), np.asarray(v_full),
                               atol=1e-5, rtol=1e-5)


def test_local_solve_matches_unpruned():
    """Full local-mode solve (both contact phases + skate + detect)
    with pruning engaged vs forcibly disabled: Adam trajectories may
    only differ by f32 summation order."""
    sc = _sparse_scenario()
    s_on = _solver(sc)
    s_off = _solver(sc)
    s_off._contact_prune = None
    s_off._skate_prune = None
    s_off._feet_prune = None
    st_on, h_on = s_on.fit(sc["body"], sc["camera_ext"], mode="local")
    st_off, h_off = s_off.fit(sc["body"], sc["camera_ext"], mode="local")
    for k in h_on:
        np.testing.assert_allclose(h_on[k], h_off[k], rtol=2e-4,
                                   atol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(st_on.body_6d),
                               np.asarray(st_off.body_6d),
                               atol=1e-4, rtol=1e-3)


def test_body_subtree_joints_match_full_chain():
    """forward_world's pruned-path joints come from a 23-joint
    body-subtree FK (r5, clip_solve._BODY_JOINTS) — they must equal
    the full 55-joint chain's joints[:, :23] to f32 order."""
    sc = _sparse_scenario()
    s = _solver(sc)
    state, _, _ = s.init_state(sc["body"], sc["camera_ext"])
    _, j_full, _ = forward_world(s.ctx, state,
                                 vertex_subset=s.contact_vids)
    _, j_pruned, _ = forward_world(s.ctx, state,
                                   vertex_subset=s.contact_vids,
                                   prune=s._contact_prune)
    assert j_pruned.shape == j_full.shape == (8, 23, 3)
    assert np.all(np.isfinite(np.asarray(j_pruned)))
    np.testing.assert_allclose(np.asarray(j_pruned),
                               np.asarray(j_full),
                               atol=1e-5, rtol=1e-5)


def test_dct_solve_matches_unpruned():
    """dct mode reads joints (dct term) AND contact verts (dct_b):
    with r5 pruning it runs a leg-chain vertex FK + a body-subtree
    joints FK — trajectories must match the unpruned single-call path
    to f32 summation order."""
    sc = _sparse_scenario()
    s_on = _solver(sc)
    s_off = _solver(sc)
    s_off._contact_prune = None
    import dataclasses
    for s in (s_on, s_off):
        s.config = dataclasses.replace(s.config, num_iter_dct=12)
    st_on, h_on = s_on.fit(sc["body"], sc["camera_ext"], mode="dct")
    st_off, h_off = s_off.fit(sc["body"], sc["camera_ext"], mode="dct")
    for k in h_on:
        assert np.all(np.isfinite(h_on[k])), k
        np.testing.assert_allclose(h_on[k], h_off[k], rtol=2e-4,
                                   atol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(st_on.body_6d),
                               np.asarray(st_off.body_6d),
                               atol=1e-4, rtol=1e-3)


def test_merged_call_matches_two_call_path():
    """forward_world(merge_joints=True) serves verts AND joints from
    ONE body-subtree model call (r5, dct_b's recipe) — both outputs
    must match the two-call pruned path and the unpruned single-call
    path to f32 summation order, and gradients through both outputs
    must agree."""
    sc = _sparse_scenario()
    s = _solver(sc)
    state, _, _ = s.init_state(sc["body"], sc["camera_ext"])
    v_two, j_two, _ = forward_world(s.ctx, state,
                                    vertex_subset=s.contact_vids,
                                    prune=s._contact_prune)
    v_one, j_one, _ = forward_world(s.ctx, state,
                                    vertex_subset=s.contact_vids,
                                    prune=s._contact_prune,
                                    merge_joints=True)
    assert np.all(np.isfinite(np.asarray(v_one)))
    assert np.all(np.isfinite(np.asarray(j_one)))
    np.testing.assert_allclose(np.asarray(v_one), np.asarray(v_two),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(j_one), np.asarray(j_two),
                               atol=1e-5, rtol=1e-5)

    def loss(fw_kwargs):
        def f(b6d):
            st = state._replace(body_6d=b6d)
            v, j, _ = forward_world(s.ctx, st,
                                    vertex_subset=s.contact_vids,
                                    **fw_kwargs)
            return jnp.sum(v ** 2) + jnp.sum(j ** 2)
        return jax.grad(f)(state.body_6d)

    g_two = loss(dict(prune=s._contact_prune))
    g_one = loss(dict(prune=s._contact_prune, merge_joints=True))
    np.testing.assert_allclose(np.asarray(g_one), np.asarray(g_two),
                               atol=1e-4, rtol=1e-4)


def test_joints_reading_phase_unaffected():
    """global mode reads joints_w (world_smooth): pruning must leave it
    on the full-chain path — finite losses, identical to unpruned."""
    sc = _sparse_scenario()
    s_on = _solver(sc)
    s_off = _solver(sc)
    s_off._contact_prune = None
    _, h_on = s_on.fit(sc["body"], sc["camera_ext"], mode="global")
    _, h_off = s_off.fit(sc["body"], sc["camera_ext"], mode="global")
    for k in h_on:
        assert np.all(np.isfinite(h_on[k])), k
        np.testing.assert_allclose(h_on[k], h_off[k], rtol=2e-4,
                                   atol=1e-5, err_msg=k)


def test_coherent_segments_collapse_to_leg_subtree():
    """Part-coherent synthetic segments + kinematically-local sparse
    weights must reproduce the real-artifact structure: the L/R leg
    contact set's joint support is the pelvis->feet subtree (~10 of
    55 joints, FK depth 5), never the finger chains. Bone assignment
    consistency between model and segments is pinned here too."""
    m = jsmplx.synthetic_model(num_verts=512, seed=0,
                               sparse_weights=True)
    segs = contact.synthetic_segments(512, seed=0, coherent=True)
    vids = np.concatenate([np.asarray(segs["L_Leg"], np.int32),
                           np.asarray(segs["R_Leg"], np.int32)])
    assert len(vids) >= 16
    sup = m.joint_support(vids)
    assert sup is not None
    kept = set(int(j) for j in sup[0])
    legs = {0, 1, 2, 3, 4, 5, 7, 8, 10, 11}
    assert kept <= legs | {6, 9}         # never arms/fingers/head
    # depth of the pruned chain is the leg subtree's (5), not 11
    def depth(j):
        d = 0
        while PARENTS[j] >= 0:
            j = PARENTS[j]
            d += 1
        return d
    assert max(depth(j) for j in kept) <= 5

    # bone-assignment consistency contract of synthetic_vertex_bones
    bones = jsmplx.synthetic_vertex_bones(512, seed=0)
    legs_b = np.isin(bones, (4, 7, 10, 5, 8, 11))
    assert np.all(legs_b[vids])
