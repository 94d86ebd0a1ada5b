"""Checkpoint / resume.

The reference's only checkpointing is its stage outputs: one pkl per
frame after each pipeline stage (optimization.py:277-294,
global_optimization.py:637-653) — re-running a stage resumes from its
input directory. That contract lives in fpv4d.io.body_pkl. This module
adds what the reference lacks (SURVEY.md section 5): mid-optimization
checkpointing of the solver state (decision variables + Adam moments)
via orbax, so long clip solves survive preemption.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_solver_state(path: str, state: Any, opt_state: Any,
                      step: int = 0) -> None:
    """Write (state, opt_state, step) as an orbax PyTree checkpoint."""
    ckpt = {"state": state, "opt_state": opt_state,
            "step": np.int64(step)}
    _checkpointer().save(os.path.abspath(path), ckpt, force=True)


def load_solver_state(path: str, template: Optional[Any] = None
                      ) -> Tuple[Any, Any, int]:
    """Restore (state, opt_state, step). Pass a {'state':..,
    'opt_state':.., 'step':..} template pytree for exact type/shape
    restoration."""
    import orbax.checkpoint as ocp
    restored = _checkpointer().restore(
        os.path.abspath(path),
        item=template if template is not None else None)
    return restored["state"], restored["opt_state"], int(restored["step"])


def latest_stage_output(fit_path: str) -> Optional[str]:
    """Stage-granular resume helper: newest frame pkl under a stage
    directory, or None if the stage hasn't run."""
    import glob
    pkls = sorted(glob.glob(os.path.join(fit_path, "**", "*.pkl"),
                            recursive=True))
    return pkls[-1] if pkls else None
