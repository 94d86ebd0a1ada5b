"""Ground-truth recovery regression (tools/accuracy_report):

* the keypoint fitter recovers a known body to small 3D error from
  noisy 2D observations;
* the clip solve REDUCES joint error and jitter of a noisy init when
  the truth satisfies the pipeline's motion priors (smooth motion).

Thresholds are loose multiples of the measured values (20.5 mm /
47 vs 93 mm / jitter 19 vs 237) so real regressions trip them but
numeric noise does not.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tools"))


@pytest.fixture(scope="module")
def report():
    import accuracy_report
    # frames=24 deliberately exceeds the usual T<=12 CPU test-size
    # guideline: the recovery claim needs enough frames for the
    # temporal smoothing to act on (the whole run is ~60 s, one
    # fixture for both tests)
    return accuracy_report.run(frames=24, num_verts=256, iters=60)


def test_keypoint_fit_recovers_truth(report):
    assert report["keypoint_fit_mpjpe_mm"] < 60
    assert report["keypoint_fit_reproj_px"] < 4 * report["obs_noise_px"]


def test_clip_solve_improves_toward_truth(report):
    assert report["clip_solve_mpjpe_mm_after"] \
        < report["clip_solve_mpjpe_mm_before"]
    assert report["jitter_mm_solved"] < 0.3 * report["jitter_mm_noisy"]
