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
