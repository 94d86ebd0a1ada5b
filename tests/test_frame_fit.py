"""Per-frame fitting / sequential smoothing tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from fpv4d.config import FrameFitConfig
from fpv4d.models import motion_gru
from fpv4d.solve import frame_fit
from tests.helpers import make_scenario, smooth_noise


@pytest.fixture(scope="module")
def noisy_clip():
    rng = np.random.RandomState(0)
    T = 8
    body = np.zeros((T, 75), dtype=np.float32)
    body[:, 0:3] = smooth_noise(T, 3, rng, 0.3)
    body[:, 3:6] = smooth_noise(T, 3, rng, 0.2)
    body[:, 6:16] = rng.randn(10).astype(np.float32) * 0.3
    body[:, 16:48] = smooth_noise(T, 32, rng, 0.5)
    body[:, 48:75] = smooth_noise(T, 27, rng, 0.2)
    # add per-frame jitter the smoother should remove
    noisy = body + rng.randn(T, 75).astype(np.float32) * 0.1
    return jnp.asarray(noisy)


CFG = FrameFitConfig(num_iter=30)


def frame_diff(x):
    return float(np.mean(np.abs(np.diff(np.asarray(x)[:, 9:51], axis=0))))


def test_fit_independent_stays_near_target(noisy_clip):
    out = frame_fit.fit_independent(noisy_clip, CFG)
    assert out.shape == noisy_clip.shape
    err = np.abs(np.asarray(out) - np.asarray(noisy_clip))
    # rec loss dominates: result stays near the target
    assert err.mean() < 0.05


def test_fit_sequential_smooths(noisy_clip):
    out = frame_fit.fit_sequential(noisy_clip, CFG)
    assert out.shape == noisy_clip.shape
    assert np.all(np.isfinite(np.asarray(out)))
    # the betas+pose slice must be temporally smoother than the input
    assert frame_diff(out) < frame_diff(noisy_clip)


def test_fit_sequential_frame0_matches_independent(noisy_clip):
    # frame 0 has no smoothing term: identical to the independent fit
    seq = frame_fit.fit_sequential(noisy_clip, CFG)
    ind = frame_fit.fit_independent(noisy_clip[:1], CFG)
    np.testing.assert_allclose(np.asarray(seq[0]), np.asarray(ind[0]),
                               atol=1e-4)


def test_fit_sequential_motion_runs(noisy_clip):
    gru = motion_gru.random_params(seed=1)
    out = frame_fit.fit_sequential_motion(noisy_clip, gru, CFG)
    assert out.shape == noisy_clip.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_fit_sequential_motion_frame0_makes_no_gru_step(noisy_clip):
    """Reference semantics (optimization.py:146-149,251-257): frame 0
    is fitted WITHOUT the GRU — the encoder/decoder hidden states
    stay zero until frame 1. Regression for a bug where the scan
    advanced the GRU at t=0 on the UNFITTED target pose, conditioning
    every later prediction on that spurious step. Checked against an
    explicit python loop implementing the reference schedule."""
    import jax
    import optax
    from fpv4d.core import rotations
    from fpv4d.models import params as P
    from fpv4d.ops import losses

    gru = motion_gru.random_params(seed=2)
    clip = noisy_clip[:3]
    got = np.asarray(frame_fit.fit_sequential_motion(clip, gru, CFG))

    # reference-style loop
    target_6d = rotations.params_to_6d(clip)
    opt = optax.adam(CFG.lr)
    opt_state = opt.init(target_6d[0])
    a75, b75 = P.VPOSER_SLICE
    h_enc = h_dec = jnp.zeros((1, motion_gru.H_ENC))
    prev_75 = None
    fitted = []
    for t in range(3):
        if t == 0:
            w_motion, pose_pred = 0.0, jnp.zeros(32)
        else:
            w_motion = 1.0
            pred, h_enc, h_dec = motion_gru.forward_seq(
                gru, prev_75[a75:b75][None], seq_length=1,
                h_enc=h_enc, h_dec=h_dec)
            pose_pred = jax.lax.stop_gradient(pred[0, :, -1])

        def loss_fn(x):
            base = frame_fit._frame_loss(x, target_6d[t], CFG.weights)
            body_75x = rotations.params_to_3d(x[None])[0]
            return base + w_motion * losses.l1(body_75x[a75:b75],
                                               pose_pred)

        x, opt_state, _ = frame_fit._adam_steps(
            loss_fn, target_6d[t], opt, opt_state, CFG.num_iter)
        prev_75 = rotations.params_to_3d(x[None])[0]
        fitted.append(np.asarray(prev_75))

    np.testing.assert_allclose(got, np.asarray(fitted), atol=2e-5)
