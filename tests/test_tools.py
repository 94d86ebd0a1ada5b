"""Smoke tests of the tools/ entry points that guard production
workflows (prewarm's cache-stats contract; the ablation harness's
variant set) — CPU-small, subprocess-driven like a user would run
them."""
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env_extra, timeout=420):
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               **env_extra)
    env.pop("XLA_FLAGS", None)
    return subprocess.run([sys.executable] + args, cwd=_REPO, env=env,
                          capture_output=True, text=True,
                          timeout=timeout)


@pytest.mark.slow
def test_prewarm_small_writes_stats(tmp_path):
    """prewarm --small runs the local schedule end-to-end and stamps
    prewarm_stats.json with the cold/warm record bench.py folds into
    its extras."""
    cache = str(tmp_path / "cache")
    r = _run(["tools/prewarm.py", "--small", "--modes", "local",
              "--no-keypoint", "--cache-dir", cache], {})
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert {"cold", "total_s", "per_entry_s",
            "cache_entries_after"} <= set(stats)
    assert stats["cold"] is True          # fresh cache dir
    assert "local" in stats["per_entry_s"]
    path = os.path.join(cache, "prewarm_stats.json")
    assert os.path.exists(path)
    assert json.load(open(path))["frames"] == stats["frames"]


@pytest.mark.slow
def test_ablate_local_small_reports_all_variants():
    r = _run(["tools/ablate_local.py"],
             {"FPV4D_BENCH_SMALL": "1", "FPV4D_ABL_STEPS": "2"},
             timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert {"full", "contact_only", "model_only", "model_fwd",
            "nn_only", "params_only", "skate_full",
            "skate_model"} == set(res)
    assert all(v > 0 for v in res.values())


def test_standard_problem_workload_pinned(tmp_path):
    """The benchmark's synthetic workload is part of the round-over-
    round record: pin its content so a refactor of
    fpv4d.utils.bench_problem can't silently change what bench.py
    measures (hashes recorded r3 — regenerate them ONLY with an
    explicit decision to re-baseline).

    r4 deliberate re-baseline: the MODEL hash changed (and is now
    pinned too) because the bench model gained the real artifact's
    sparse skinning structure (cached_synthetic_model docstring;
    dense-vs-sparse A/B recorded in PERFORMANCE.md). body/cam/scene
    are unchanged from r3."""
    import hashlib
    import numpy as np
    from fpv4d.utils import bench_problem as BP
    p = BP.standard_problem(T=24, num_verts=256, scene_pts=256,
                            num_iter=10, num_iter_dct=10,
                            cache_dir=str(tmp_path))

    def h(a):
        return hashlib.sha1(
            np.ascontiguousarray(a).tobytes()).hexdigest()[:16]

    assert h(p.body) == "3ca019024c851030"
    assert h(p.cam) == "cd76c4d9cea0a67c"
    assert h(p.scene) == "4ebb183e999b9490"
    assert h(np.asarray(p.model.lbs_weights)) == "1ca3ed9280e9da4a"
    # the bench model must genuinely engage the FK pruning the way a
    # real-artifact solve does (sparse kinematically-local weights +
    # part-coherent leg contact sets): the contact chain collapses to
    # the leg subtree — this is what the r4 headline measures
    assert p.solver._contact_prune is not None
    assert len(p.solver._contact_prune[0]) <= 14
    # r5: the bench solve runs with refresh-time candidate compaction
    # at the ablated budget (tools/ablate_compact.py; PERFORMANCE.md)
    assert p.solver.config.contact_compact == 192


@pytest.mark.slow
def test_hbm_probe_small_reports_boundary():
    """hbm_probe --small exercises the grow-then-bisect loop on tiny
    shapes (everything fits on CPU, so the probe must cleanly report
    max C == tmax with no failing point)."""
    r = _run(["tools/hbm_probe.py"], {"FPV4D_BENCH_SMALL": "1"},
             timeout=900)
    assert r.returncode == 0, r.stderr[-500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["max_clips_per_chip"] == 4
    assert out["first_failing_c"] is None
    assert out["points"]["2"]["fits"] and out["points"]["4"]["fits"]


@pytest.mark.slow
def test_scaling_report_collectives_smoke():
    """collective_counts() reaches into build_sharded_step's closure
    and lowers the underlying jitted program with a hand-written copy
    of its 9-slot signature — which silently drifts when that
    signature changes (it broke in r4's None-tolerant wrapper
    collapse). Lower it at tiny shapes; also pin the headline claim
    that window-aligned c_dct sharding needs NO gather while the
    replicated layout pays one."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import scaling_report
    res = scaling_report.collective_counts(T=8, frames=2)
    (rep_tag, rep), (ali_tag, ali) = sorted(res.items())
    assert "replicated" in rep_tag and "aligned" in ali_tag
    assert rep["all-gather"] >= 1       # replicated c_dct pays a gather
    assert ali["all-gather"] == 0       # aligned windows stay local
    assert ali["all-reduce"] >= 1       # loss/grad reduction remains
