"""Direct unit tests of every loss term against naive numpy
re-implementations of the reference formulas."""
import numpy as np
import jax.numpy as jnp
import pytest

from fpv4d.ops import losses
from fpv4d.core.dct import dct_basis


def test_rec_l1_masks_outlier_frames():
    rng = np.random.RandomState(0)
    t = rng.randn(5, 78).astype(np.float32)
    r = rng.randn(5, 78).astype(np.float32)
    w = np.array([1, 1, 0, 1, 1], np.float32)
    out = float(losses.rec_l1(jnp.asarray(t), jnp.asarray(r),
                              jnp.asarray(w)))
    # reference builds a [T,78] weight tensor zeroed on outlier rows
    # and takes the mean over ALL entries (global_optimization.py:255-259)
    expected = np.mean(np.abs(t - r) * w[:, None])
    assert out == pytest.approx(expected, rel=1e-6)


def test_smoothness_orders():
    x = np.array([[0.0], [1.0], [2.0], [3.0]], np.float32)  # linear
    # second-order diff of a linear ramp is zero
    assert float(losses.second_order_smoothness(jnp.asarray(x))) == 0.0
    assert float(losses.first_order_smoothness(jnp.asarray(x))) == 1.0
    y = np.array([[0.0], [1.0], [0.0]], np.float32)
    # diff = [-1, 1]; diff-of-diff = [-2] -> mean |.| = 2
    assert float(losses.second_order_smoothness(jnp.asarray(y))) == 2.0


def test_robust_contact_formula():
    d = np.array([[0.0, 1.0, 1e6]], np.float32)
    out = float(losses.robust_contact(jnp.asarray(d)))
    r = np.sqrt(d + 1e-4)
    expected = np.mean(r / (r + 1.0))
    assert out == pytest.approx(expected, rel=1e-5)
    # saturates below 1
    assert out < 1.0


def test_dct_trajectory_zero_for_representable():
    # trajectories that ARE low-frequency DCT series with the learned
    # coefficients give (near-)zero loss
    rng = np.random.RandomState(1)
    W, window, J, K = 2, 10, 23, 4
    c = rng.randn(W, J, 3, K).astype(np.float32) * 0.1
    basis = np.asarray(dct_basis(window, K))
    traj = np.einsum("tk,wjak->wtja", basis, c)
    joints = traj.reshape(W * window, J, 3)
    loss = float(losses.dct_trajectory(jnp.asarray(joints),
                                       jnp.asarray(c), window))
    assert loss < 1e-10


def test_dct_trajectory_matches_naive_loops():
    rng = np.random.RandomState(2)
    W, window, J, K = 2, 6, 23, 3
    joints = rng.randn(W * window, J, 3).astype(np.float32)
    c = rng.randn(W, J, 3, K).astype(np.float32)
    out = float(losses.dct_trajectory(jnp.asarray(joints),
                                      jnp.asarray(c), window))
    # naive triple loop like cal_dctloss (global_optimization.py:232-246)
    basis = np.asarray(dct_basis(window, K))
    objs = []
    for j in range(J):
        for a in range(3):
            for w in range(W):
                traj = joints[w * window:(w + 1) * window, j, a]
                rec = basis @ c[w, j, a]
                e = (traj - rec) ** 2
                objs.append(np.sum(e / (e + 1.0)))
    assert out == pytest.approx(np.mean(objs), rel=1e-5)


def test_dct_encode_inverts_representable():
    rng = np.random.RandomState(3)
    W, window, J, K = 1, 8, 4, 3
    c = rng.randn(W, J, 3, K).astype(np.float32)
    basis = np.asarray(dct_basis(window, K))
    joints = np.einsum("tk,wjak->wtja", basis, c).reshape(W * window, J, 3)
    c2 = np.asarray(losses.dct_encode(jnp.asarray(joints), window, K))
    np.testing.assert_allclose(c2, c, atol=1e-5)


def test_planted_foot_weight_direction():
    # left foot close to scene (small dist) -> weight_right small
    d_l = jnp.asarray([0.001, 1.0])
    d_r = jnp.asarray([1.0, 0.001])
    w_r = np.asarray(losses.planted_foot_weight(d_l, d_r))
    assert w_r[0] < 0.01      # left planted: right weight tiny
    assert w_r[1] > 0.99      # right planted: right weight ~1
    # and NOT the reference's constant 0.5 (global_optimization.py:364)


def test_foot_skate_thresholds_and_weights():
    rng = np.random.RandomState(4)
    T, N = 4, 5
    left = np.cumsum(rng.randn(T, N, 3), axis=0).astype(np.float32)
    right = np.cumsum(rng.randn(T, N, 3), axis=0).astype(np.float32)
    w_r = jnp.asarray([0.9, 0.9, 0.9, 0.9])
    out = float(losses.foot_skate(jnp.asarray(left), jnp.asarray(right),
                                  w_r))
    # naive: weights < 0.5 zeroed; weight_left = 1-0.9=0.1 -> zeroed
    dl = np.abs(np.diff(left, axis=0)) * 0.0
    dr = np.abs(np.diff(right, axis=0)) * 0.9
    expected = dl.mean() + dr.mean()
    assert out == pytest.approx(expected, rel=1e-5)


def test_gm_saturation():
    assert float(losses.gm(jnp.asarray(0.0))) == 0.0
    assert float(losses.gm(jnp.asarray(1e9))) == pytest.approx(1.0,
                                                               abs=1e-6)
