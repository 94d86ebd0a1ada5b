import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpv4d.core import rotations as R


def random_aa(n, seed=0, max_angle=np.pi * 0.95):
    rng = np.random.RandomState(seed)
    axis = rng.randn(n, 3)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(0.001, max_angle, (n, 1))
    return (axis * angle).astype(np.float32)


def test_aa_matrot_is_rotation():
    aa = random_aa(64)
    mats = np.asarray(R.aa_to_matrot(aa))
    eye = np.eye(3)
    for m in mats:
        np.testing.assert_allclose(m @ m.T, eye, atol=1e-5)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-5)


def test_aa_matrot_roundtrip():
    aa = random_aa(128, seed=1)
    back = np.asarray(R.matrot_to_aa(R.aa_to_matrot(aa)))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_aa_matrot_matches_scipy():
    from scipy.spatial.transform import Rotation
    aa = random_aa(32, seed=2)
    ours = np.asarray(R.aa_to_matrot(aa))
    theirs = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_matrot_to_aa_near_pi():
    from scipy.spatial.transform import Rotation
    # near-pi rotations are the classic instability
    aa = random_aa(16, seed=3)
    aa = aa / np.linalg.norm(aa, axis=1, keepdims=True) * (np.pi - 1e-3)
    mats = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
    ours = np.asarray(R.matrot_to_aa(mats))
    theirs = Rotation.from_matrix(mats).as_rotvec()
    # aa is only unique up to 2*pi flips; compare rotation matrices
    np.testing.assert_allclose(
        np.asarray(R.aa_to_matrot(ours)),
        Rotation.from_rotvec(theirs).as_matrix(), atol=1e-3)


def test_identity_rotation():
    aa = jnp.zeros((4, 3))
    np.testing.assert_allclose(
        np.asarray(R.aa_to_matrot(aa)),
        np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(R.matrot_to_aa(
        jnp.broadcast_to(jnp.eye(3), (4, 3, 3)))), np.zeros((4, 3)),
        atol=1e-4)


def test_rot6d_roundtrip():
    aa = random_aa(64, seed=4)
    r6 = R.aa_to_rot6d(aa)
    assert r6.shape == (64, 6)
    back = np.asarray(R.rot6d_to_aa(r6))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_rot6d_layout_matches_reference():
    # 6D = first two COLUMNS flattened row-major (cvae.py view(-1,3,2))
    aa = random_aa(8, seed=5)
    mats = np.asarray(R.aa_to_matrot(aa))
    r6 = np.asarray(R.aa_to_rot6d(aa))
    np.testing.assert_allclose(
        r6, mats[:, :, :2].reshape(8, 6), atol=1e-6)


def test_rot6d_gram_schmidt_denoises():
    rng = np.random.RandomState(6)
    r6 = rng.randn(32, 6).astype(np.float32)
    mats = np.asarray(R.rot6d_to_matrot(r6))
    eye = np.eye(3)
    for m in mats:
        np.testing.assert_allclose(m @ m.T, eye, atol=1e-4)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-4)


def test_quat_to_matrot_matches_reference_formula():
    # same formula as global_optimization.py:51-61
    rng = np.random.RandomState(7)
    q = rng.randn(16, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ours = np.asarray(R.quat_to_matrot(jnp.asarray(q, dtype=jnp.float32)))

    def ref_qvec2rotmat(qvec):
        return np.array([
            [1 - 2 * qvec[2]**2 - 2 * qvec[3]**2,
             2 * qvec[1] * qvec[2] - 2 * qvec[0] * qvec[3],
             2 * qvec[3] * qvec[1] + 2 * qvec[0] * qvec[2]],
            [2 * qvec[1] * qvec[2] + 2 * qvec[0] * qvec[3],
             1 - 2 * qvec[1]**2 - 2 * qvec[3]**2,
             2 * qvec[2] * qvec[3] - 2 * qvec[0] * qvec[1]],
            [2 * qvec[3] * qvec[1] - 2 * qvec[0] * qvec[2],
             2 * qvec[2] * qvec[3] + 2 * qvec[0] * qvec[1],
             1 - 2 * qvec[1]**2 - 2 * qvec[2]**2]])

    for i in range(16):
        np.testing.assert_allclose(ours[i], ref_qvec2rotmat(q[i]), atol=1e-5)


def test_params_lift_roundtrip():
    rng = np.random.RandomState(8)
    x = rng.randn(20, 75).astype(np.float32) * 0.5
    x[:, 3:6] = random_aa(20, seed=9)
    x6 = R.params_to_6d(x)
    assert x6.shape == (20, 78)
    back = np.asarray(R.params_to_3d(x6))
    np.testing.assert_allclose(back, x, atol=1e-4)
    # non-rotation slots pass through untouched
    np.testing.assert_allclose(np.asarray(x6[:, :3]), x[:, :3], atol=0)
    np.testing.assert_allclose(np.asarray(x6[:, 9:]), x[:, 6:], atol=0)


def test_rotations_jit_and_grad():
    aa = jnp.asarray(random_aa(4, seed=10))

    def loss(a):
        return jnp.sum(R.rot6d_to_aa(R.aa_to_rot6d(a)) ** 2)

    g = jax.grad(loss)(aa)
    assert np.all(np.isfinite(np.asarray(g)))
    jitted = jax.jit(R.params_to_3d)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 78), dtype=jnp.float32)
    assert jitted(x).shape == (3, 75)


def test_grad_finite_at_identity():
    # regression: 0/0 NaN leak through where() at theta=0
    g = jax.grad(lambda a: jnp.sum(R.matrot_to_aa(R.aa_to_matrot(a)) ** 2))(
        jnp.zeros((2, 3)))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda r6: jnp.sum(R.rot6d_to_aa(r6) ** 2))(
        R.aa_to_rot6d(jnp.zeros((2, 3))))
    assert np.all(np.isfinite(np.asarray(g2)))
