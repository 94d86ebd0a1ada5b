"""SMPL-X forward parity: our JAX implementation vs an independent
PyTorch implementation of the published SMPL-X algorithm (shape/expr
blendshapes -> joint regression -> pose blendshapes -> forward
kinematics -> LBS), written here from the paper definition. Target:
mean vertex error well under 1mm on the synthetic asset."""
import numpy as np
import jax.numpy as jnp
import torch
import pytest

from fpv4d.models import smplx as jsmplx


def torch_rodrigues(aa):
    """[N,3] -> [N,3,3], classic Rodrigues (independent impl)."""
    angle = torch.norm(aa + 1e-12, dim=1, keepdim=True)
    axis = aa / angle
    c = torch.cos(angle)[:, :, None]
    s = torch.sin(angle)[:, :, None]
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    zeros = torch.zeros_like(x)
    K = torch.stack([zeros, -z, y, z, zeros, -x, -y, x, zeros],
                    dim=1).view(-1, 3, 3)
    eye = torch.eye(3).unsqueeze(0)
    return eye * c + (1 - c) * torch.bmm(axis[:, :, None],
                                         axis[:, None, :]) + s * K


def torch_smplx_forward(model, betas, global_orient, body_pose, transl,
                        lhand, rhand, expression=None):
    """Independent torch forward over the same model tables."""
    t = lambda a: torch.from_numpy(np.asarray(a, dtype=np.float64)).float()
    v_template = t(model.v_template)
    shapedirs = t(model.shapedirs)
    exprdirs = t(model.exprdirs)
    posedirs = t(model.posedirs)
    j_reg = t(model.j_regressor)
    weights = t(model.lbs_weights)
    parents = list(jsmplx.PARENTS)

    B = betas.shape[0]
    betas, global_orient = t(betas), t(global_orient)
    body_pose, transl = t(body_pose), t(transl)
    lhand, rhand = t(lhand), t(rhand)
    expression = (t(expression) if expression is not None
                  else torch.zeros(B, exprdirs.shape[-1]))

    lh_aa = lhand @ t(model.hands_components_l) + t(model.hands_mean_l)
    rh_aa = rhand @ t(model.hands_components_r) + t(model.hands_mean_r)

    full_pose = torch.cat([
        global_orient.view(B, 1, 3), body_pose.view(B, 21, 3),
        torch.zeros(B, 3, 3),                       # jaw/leye/reye
        lh_aa.view(B, 15, 3), rh_aa.view(B, 15, 3)], dim=1)

    shape_feat = torch.cat([betas, expression], dim=-1)
    dirs = torch.cat([shapedirs, exprdirs], dim=-1)
    v_shaped = v_template + torch.einsum("vcs,bs->bvc", dirs, shape_feat)
    J = torch.einsum("jv,bvc->bjc", j_reg, v_shaped)

    rot = torch_rodrigues(full_pose.view(-1, 3)).view(B, 55, 3, 3)
    pose_feat = (rot[:, 1:] - torch.eye(3)).reshape(B, -1)
    v_posed = v_shaped + (pose_feat @ posedirs).view(B, -1, 3)

    # forward kinematics
    transforms = []
    for j in range(55):
        R = rot[:, j]
        if j == 0:
            tj = J[:, 0]
        else:
            tj = J[:, j] - J[:, parents[j]]
        A = torch.zeros(B, 4, 4)
        A[:, :3, :3] = R
        A[:, :3, 3] = tj
        A[:, 3, 3] = 1.0
        if j == 0:
            transforms.append(A)
        else:
            transforms.append(torch.bmm(transforms[parents[j]], A))
    world = torch.stack(transforms, dim=1)
    posed_joints = world[:, :, :3, 3]

    corr = torch.einsum("bjpq,bjq->bjp", world[:, :, :3, :3], J)
    rel = world.clone()
    rel[:, :, :3, 3] -= corr

    T = torch.einsum("vj,bjpq->bvpq", weights, rel)
    homo = torch.cat([v_posed, torch.ones(B, v_posed.shape[1], 1)], dim=-1)
    verts = torch.einsum("bvpq,bvq->bvp", T, homo)[..., :3]
    return (verts + transl[:, None]).numpy(), \
           (posed_joints + transl[:, None]).numpy()


@pytest.fixture(scope="module")
def model():
    return jsmplx.synthetic_model(num_verts=512, seed=0)


def random_inputs(B, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        betas=rng.randn(B, 10).astype(np.float32) * 0.5,
        global_orient=rng.randn(B, 3).astype(np.float32) * 0.4,
        body_pose=rng.randn(B, 63).astype(np.float32) * 0.3,
        transl=rng.randn(B, 3).astype(np.float32),
        left_hand_pose=rng.randn(B, 12).astype(np.float32) * 0.5,
        right_hand_pose=rng.randn(B, 12).astype(np.float32) * 0.5,
    )


def test_forward_shapes(model):
    inp = random_inputs(4)
    out = model(**{k: jnp.asarray(v) for k, v in inp.items()})
    assert out["vertices"].shape == (4, 512, 3)
    assert out["joints"].shape == (4, 55, 3)


def test_parity_vs_independent_torch(model):
    inp = random_inputs(6, seed=1)
    ours = model(**{k: jnp.asarray(v) for k, v in inp.items()})
    tv, tj = torch_smplx_forward(
        model, inp["betas"], inp["global_orient"], inp["body_pose"],
        inp["transl"], inp["left_hand_pose"], inp["right_hand_pose"])
    verts_err = np.abs(np.asarray(ours["vertices"]) - tv)
    joints_err = np.abs(np.asarray(ours["joints"]) - tj)
    # mean vertex error target: <= 1mm (BASELINE.md); we demand far less
    assert verts_err.mean() < 1e-5
    assert verts_err.max() < 1e-3
    assert joints_err.max() < 1e-3


def test_rest_pose_is_template(model):
    B = 2
    zeros = {k: jnp.zeros((B, d)) for k, d in
             [("betas", 10), ("global_orient", 3), ("body_pose", 63),
              ("transl", 3)]}
    # zero PCA coeffs still include hands_mean (flat_hand_mean=False),
    # so only check body vertices are near template: use flat-hands model
    flat = jsmplx.SmplxModel(
        **{k: getattr(model, k) for k in model._LEAVES},
        faces=model.faces, flat_hand_mean=True)
    out = flat(**zeros)
    v = np.asarray(out["vertices"][0])
    np.testing.assert_allclose(v, np.asarray(model.v_template), atol=1e-5)


def test_ignores_unknown_kwargs(model):
    # the reference pipes camera_translation into the smplx forward
    inp = {k: jnp.asarray(v) for k, v in random_inputs(2).items()}
    out = model(camera_translation=jnp.zeros((2, 3)), **inp)
    assert out["vertices"].shape[0] == 2


def test_translation_is_additive(model):
    inp = {k: jnp.asarray(v) for k, v in random_inputs(3, seed=2).items()}
    t0 = dict(inp, transl=jnp.zeros((3, 3)))
    out0 = model(**t0)
    out1 = model(**inp)
    np.testing.assert_allclose(
        np.asarray(out1["vertices"]),
        np.asarray(out0["vertices"]) + np.asarray(inp["transl"])[:, None],
        atol=1e-5)


def test_jit_and_grad(model):
    import jax
    inp = {k: jnp.asarray(v) for k, v in random_inputs(2, seed=3).items()}

    @jax.jit
    def loss(body_pose):
        out = model(**dict(inp, body_pose=body_pose))
        return jnp.sum(out["vertices"] ** 2)

    g = jax.grad(loss)(inp["body_pose"])
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_vertex_subset_matches_full(model):
    inp = {k: jnp.asarray(v) for k, v in random_inputs(3, seed=7).items()}
    full = model(**inp)
    sub_ids = np.array([3, 17, 100, 101, 450], dtype=np.int32)
    sub = model(vertex_subset=sub_ids, **inp)
    np.testing.assert_allclose(np.asarray(sub["vertices"]),
                               np.asarray(full["vertices"][:, sub_ids]),
                               atol=1e-5)
    # joints regress from the FULL shaped mesh (unchanged)
    np.testing.assert_allclose(np.asarray(sub["joints"]),
                               np.asarray(full["joints"]), atol=1e-6)
