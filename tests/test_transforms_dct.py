import numpy as np
import jax.numpy as jnp

from fpv4d.core import transforms as T
from fpv4d.core.dct import dct_basis


def test_transform_points_matches_naive():
    rng = np.random.RandomState(0)
    pts = rng.randn(5, 100, 3).astype(np.float32)
    mats = np.broadcast_to(np.eye(4), (5, 4, 4)).copy().astype(np.float32)
    from scipy.spatial.transform import Rotation
    for i in range(5):
        mats[i, :3, :3] = Rotation.random(random_state=i).as_matrix()
        mats[i, :3, 3] = rng.randn(3)
    out = np.asarray(T.transform_points(jnp.asarray(pts), jnp.asarray(mats)))
    for i in range(5):
        expected = pts[i] @ mats[i, :3, :3].T + mats[i, :3, 3]
        np.testing.assert_allclose(out[i], expected, atol=1e-5)


def test_invert_rigid():
    rng = np.random.RandomState(1)
    from scipy.spatial.transform import Rotation
    mats = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    mats[:, :3, :3] = Rotation.random(8, random_state=2).as_matrix()
    mats[:, :3, 3] = rng.randn(8, 3)
    inv = np.asarray(T.invert_rigid(jnp.asarray(mats)))
    prod = np.matmul(mats, inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_colmap_pose_inversion_matches_numpy():
    # reference: build [R|t] then np.linalg.inv (global_optimization.py:213-224)
    rng = np.random.RandomState(3)
    q = rng.randn(6, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t = rng.randn(6, 3)
    ours = np.asarray(T.colmap_pose_to_world_from_cam(
        jnp.asarray(q, dtype=jnp.float32), jnp.asarray(t, dtype=jnp.float32)))
    from fpv4d.core.rotations import quat_to_matrot
    for i in range(6):
        m = np.eye(4)
        m[:3, :3] = np.asarray(quat_to_matrot(jnp.asarray(q[i],
                                                          dtype=jnp.float32)))
        m[:3, 3] = t[i]
        np.testing.assert_allclose(ours[i], np.linalg.inv(m), atol=1e-5)


def test_body2world_composition():
    rng = np.random.RandomState(4)
    cam_ext = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    cam_ext[:, :3, 3] = rng.randn(4, 3)
    transl = rng.randn(4, 3).astype(np.float32)
    scale = 1.8
    out = np.asarray(T.body2world(jnp.asarray(cam_ext), jnp.asarray(transl),
                                  jnp.float32(scale)))
    for i in range(4):
        pivot = np.eye(4)
        pivot[:3, 3] = transl[i] * scale
        np.testing.assert_allclose(out[i], cam_ext[i] @ pivot, atol=1e-5)


def test_dct_basis_orthonormal_and_matches_scipy():
    from scipy.fft import idct
    B = np.asarray(dct_basis(60, 5))
    assert B.shape == (60, 5)
    # columns orthonormal
    np.testing.assert_allclose(B.T @ B, np.eye(5), atol=1e-5)
    # column k equals scipy's orthonormal inverse-DCT of unit coeff k
    for k in range(5):
        c = np.zeros(60)
        c[k] = 1.0
        np.testing.assert_allclose(B[:, k], idct(c, norm="ortho"), atol=1e-5)


def test_dct_reconstruction_of_smooth_signal():
    # a low-frequency trajectory should be almost perfectly represented
    t = np.linspace(0, 1, 60)
    sig = 0.3 * np.cos(np.pi * t) + 0.1
    B = np.asarray(dct_basis(60, 5))
    coef = B.T @ sig
    rec = B @ coef
    assert np.abs(rec - sig).max() < 2e-3
