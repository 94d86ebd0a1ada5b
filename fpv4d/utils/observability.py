"""Tracing, profiling, and numeric-anomaly debugging.

The reference's only observability is print() lines and
torch.autograd.set_detect_anomaly(True) around every step
(global_optimization.py:502,514-516; SURVEY.md section 5). TPU-native
equivalents:
  * `trace(path)` — jax.profiler trace context (view in TensorBoard /
    xprof);
  * `debug_nans(enable)` — jax_debug_nans: re-runs the offending op
    un-jitted and pinpoints NaN provenance (the autograd-anomaly
    analogue);
  * `StageTimer` — per-stage wall-clock logging with device sync.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile everything inside the context to `log_dir`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True) -> None:
    """Toggle jax_debug_nans — the NaN-provenance sanitizer."""
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def nan_debugging():
    debug_nans(True)
    try:
        yield
    finally:
        debug_nans(False)


def checked(fn, *args, **kwargs):
    """Run `fn` under jax.experimental.checkify with the full check set
    (NaN, div-by-zero, out-of-bounds indexing) and RAISE on the first
    error — the bounds-checking complement to debug_nans (the
    reference's only sanitizer is torch's autograd anomaly mode,
    global_optimization.py:502)."""
    from jax.experimental import checkify
    checked_fn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
        | checkify.div_checks)
    err, out = checked_fn(*args, **kwargs)
    err.throw()
    return out


@dataclass
class StageTimer:
    """Wall-clock per named stage, with block_until_ready sync so
    device time is attributed to the right stage."""
    records: Dict[str, List[float]] = field(default_factory=dict)
    verbose: bool = True

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.records.setdefault(name, []).append(dt)
            if self.verbose:
                print(f"[fpv4d.timer] {name}: {dt:.3f}s")

    def summary(self) -> Dict[str, float]:
        return {k: sum(v) for k, v in self.records.items()}
