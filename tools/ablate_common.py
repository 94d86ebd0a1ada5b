"""Shared measurement harness for the ablation tools (ablate_fk /
ablate_prune / ablate_fleet): ONE definition of the timed Adam scan so
the timing methodology cannot drift between tools.

Methodology (PERFORMANCE.md "Measured hardware facts"): per-step times
are only real when measured from inside a single compiled `lax.scan`
(per-call dispatch through the axon TPU tunnel has a ~2 ms floor), and
`jax.block_until_ready` is not a reliable fence through the tunnel —
every timing forces a scalar readback instead. Operands (model tables,
scenes, candidate grids) must ride through `run` as ARGUMENTS, never
closure captures (closure-captured big arrays become HLO literals and
multiply compile time — CLAUDE.md).
"""
from __future__ import annotations

import sys
import time

import numpy as np


def adam_scan(loss_fn, steps: int, lr: float = 1e-3):
    """Jitted `steps`-long Adam scan over `loss_fn(params, *args)`.

    Returns (run, opt): run((carry, args)) -> loss history, with
    carry = (params, opt.init(params)). args is the tuple of loss
    operands, threaded through jit (NOT closed over)."""
    import jax
    import optax

    opt = optax.adam(lr)

    @jax.jit
    def run(carry_args):
        carry, args = carry_args

        def step(c, _):
            p, st = c
            loss, g = jax.value_and_grad(loss_fn)(p, *args)
            u, st = opt.update(g, st, p)
            return (optax.apply_updates(p, u), st), loss

        (_, _), h = jax.lax.scan(step, carry, None, length=steps)
        return h

    return run, opt


def steady_ms(run, carry_args, steps: int, repeats: int = 1,
              tag: str = "", label: str = "", per_div: float = 1.0,
              unit: str = "ms/step"):
    """Compile + warm `run`, then time it `repeats` times and return
    (best ms/step / per_div, final loss). Scalar-readback fenced."""
    h = run(carry_args)
    _ = float(np.asarray(h).ravel()[-1])          # fence (compile+warm)
    best = float("inf")
    final = float("nan")
    for _r in range(max(1, repeats)):
        t0 = time.perf_counter()
        h = run(carry_args)
        final = float(np.asarray(h).ravel()[-1])  # fence
        best = min(best, (time.perf_counter() - t0) / steps * 1e3)
    ms = best / per_div
    if label:
        print(f"[{tag}] {label} {ms:7.3f} {unit}"
              + (f" (final {final:.6f})" if repeats == 1 else ""),
              file=sys.stderr)
    return ms, final
