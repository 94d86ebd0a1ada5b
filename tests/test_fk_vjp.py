"""The hand-written FK adjoint (fpv4d.models.fk) against autodiff.

The custom VJP exists purely for TPU op-count (PERFORMANCE.md r4) —
it must be numerically invisible: forward bit-identical to the plain
implementation, gradients equal to jax.grad of the reference to f32
roundoff, for the SMPL-X tree and arbitrary other trees.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpv4d.models import fk
from fpv4d.models.smplx import PARENTS

CHAIN = (-1, 0, 1, 2, 0, 4, 4)       # small generic tree w/ siblings


def _rand(parents, B=5, seed=0):
    rng = np.random.RandomState(seed)
    J = len(parents)
    rot = rng.randn(B, J, 3, 3).astype(np.float32)
    joints = rng.randn(B, J, 3).astype(np.float32)
    return jnp.asarray(rot), jnp.asarray(joints)


@pytest.mark.parametrize("parents", [PARENTS, CHAIN])
def test_fk_forward_bitexact(parents):
    rot, joints = _rand(parents)
    p_new, r_new = jax.jit(
        lambda a, b: fk.rigid_transform(a, b, parents))(rot, joints)
    p_ref, r_ref = jax.jit(
        lambda a, b: fk.rigid_transform_ref(a, b, parents))(rot, joints)
    assert np.array_equal(np.asarray(p_new), np.asarray(p_ref))
    assert np.array_equal(np.asarray(r_new), np.asarray(r_ref))


@pytest.mark.parametrize("parents", [PARENTS, CHAIN])
def test_fk_grad_matches_autodiff(parents):
    rot, joints = _rand(parents, seed=1)
    rng = np.random.RandomState(2)
    cp = jnp.asarray(rng.randn(*(rot.shape[0], len(parents), 3))
                     .astype(np.float32))
    cr = jnp.asarray(rng.randn(*(rot.shape[0], len(parents), 4, 4))
                     .astype(np.float32))

    def scalar(f):
        def g(rot, joints):
            p, r = f(rot, joints, parents)
            return jnp.sum(p * cp) + jnp.sum(r * cr)
        return jax.jit(jax.grad(g, argnums=(0, 1)))

    g_new = scalar(fk.rigid_transform)(rot, joints)
    g_ref = scalar(fk.rigid_transform_ref)(rot, joints)
    for a, b in zip(g_new, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5)


def test_fk_grad_through_model(monkeypatch):
    """End to end: gradients of a full SMPL-X forward (blendshapes +
    FK + LBS) through the production path vs the same model with the
    FK VJP swapped back to plain autodiff."""
    from fpv4d.models import smplx as S

    model = S.synthetic_model(num_verts=128, seed=0)
    rng = np.random.RandomState(3)
    T = 4
    args = dict(
        betas=jnp.asarray(rng.randn(T, 10).astype(np.float32) * 0.1),
        global_orient=jnp.asarray(
            rng.randn(T, 3).astype(np.float32) * 0.3),
        body_pose=jnp.asarray(
            rng.randn(T, 63).astype(np.float32) * 0.2),
        transl=jnp.asarray(rng.randn(T, 3).astype(np.float32)),
        left_hand_pose=jnp.asarray(
            rng.randn(T, 12).astype(np.float32) * 0.2),
    )
    keys = sorted(args)

    def loss(*vals):
        out = model(**dict(zip(keys, vals)))
        return (jnp.sum(out["vertices"] ** 2) * 1e-3
                + jnp.sum(jnp.abs(out["joints"])))

    vals = [args[k] for k in keys]
    monkeypatch.setattr(fk, "rigid_transform_prod", fk.rigid_transform)
    g_new = jax.grad(loss, argnums=tuple(range(len(keys))))(*vals)
    monkeypatch.setattr(fk, "rigid_transform_prod",
                        fk.rigid_transform_ref)
    g_ref = jax.grad(loss, argnums=tuple(range(len(keys))))(*vals)
    for k, a, b in zip(keys, g_new, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5,
                                   err_msg=k)
