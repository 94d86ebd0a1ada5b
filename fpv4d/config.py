"""Configuration dataclasses: the single home of every knob the
reference scatters across inline dicts and hardcoded stage multipliers
(global_optimization.py:145-150,663-686; optimization.py:98-103,304-327).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class LossWeights:
    """lossconfig of the reference (global_optimization.py:681-686)."""
    rec: float = 1.0
    vposer: float = 0.001
    contact: float = 0.1
    # declared by every reference lossconfig but never implemented
    # there (mesh_intersection import commented out, cvae.py:26);
    # active in fpv4d when the solver is given a scene SDF
    # (fpv4d.ops.sdf, ClipSolver(sdf=...))
    collision: float = 0.5


@dataclass(frozen=True)
class ClipConfig:
    """Clip-level joint optimization (global_optimization.py)."""
    num_iter: int = 500                   # :672
    num_iter_dct: int = 10000             # :596
    lr: float = 0.005                     # :671
    scale_init: float = 1.8               # :179
    window: int = 60                      # BATCH_FRAME_NUM :41
    dct_num: int = 5                      # DCT_NUM :44
    num_dct_joints: int = 23              # :233
    outlier_factor: float = 1.8           # :466
    weights: LossWeights = field(default_factory=LossWeights)
    contact_parts: Tuple[str, ...] = ("L_Leg", "R_Leg")   # :676
    # stage multipliers (:505-523, :558-582, :595-620)
    local_contact_mult: float = 0.2
    global_contact_mult: float = 0.1
    phase_b_smooth_mult: float = 0.5
    dct_mult: float = 10.0
    stage_split: float = 0.8              # :505/:517 phase boundary
    contact_phase_frac: float = 0.4       # :536 second local phase
    dct_split: float = 0.95               # :601/:614
    # closed-form DCT-coefficient init (orthonormal projection of the
    # initial joint trajectories) instead of the reference's zero/randn
    # start — dct_a then starts near its optimum
    dct_closed_form_init: bool = False
    # anti-skate phase: evaluate the whole-mesh second-order smoothing
    # term (global_optimization.py:404-405) on a stratified subset of
    # this many vertices (+ the foot-contact vertices) instead of all
    # 10,475 — an unbiased estimator of the mean that cuts the phase's
    # LBS and HBM traffic ~5x. 0 = full mesh (exact reference
    # semantics).
    skate_subset: int = 0
    # restrict the stratified skate sample to vertices whose LBS
    # weights are zero on every joint >= 23 (eyes + 30 finger
    # joints), so the skate forward's joint support stays in the
    # body subtree: FK prunes 55 joints/depth 11 -> <=23/depth 8 and
    # the hand-PCA chains drop out of that phase. The estimator then
    # under-covers hand/eye vertices; effect measured on hardware via
    # tools/ablate_skate.py rows with a 'b' suffix. No-op when
    # skate_subset == 0 or weights are dense (nothing qualifies).
    skate_body_only: bool = False
    # lazy-refresh contact NN (nn_impl='grid' only): rebuild each
    # frame's candidate point set every this-many Adam steps (outside
    # the compiled scan) and evaluate the per-step contact term
    # against it with a gather-free fused brute min. TPU gathers cost
    # ~20ns/row, so the per-step per-query candidate gather is the
    # single largest cost of the whole solve; candidates drift-stale
    # within the window saturate to the far field (gradient ~0).
    # 0 = exact per-step grid query for the CONTACT term. NOTE: when a
    # scene SDF is attached, the collision term's linearization is
    # refreshed on the same chunk boundary — with 0 it falls back to
    # clip_solve.DEFAULT_REFRESH_STEPS (50), NOT per-step
    # re-linearization (per-step would cross the host/jit boundary
    # every Adam step, ~25 ms/dispatch through the TPU tunnel).
    contact_refresh_steps: int = 50
    # unique-cell budget per frame for the candidate refresh
    contact_cell_budget: int = 64
    # refresh-time candidate compaction (lazy contact NN only): keep
    # per frame only the this-many candidates most contended to be
    # some contact vertex's nearest neighbor (ops/nn.py
    # compact_candidates — keeps every distinct refresh-time NN while
    # they number <= the budget; dropped candidates matter only for
    # queries drifting toward them within a refresh window, the same
    # benign-staleness regime the tables already accept). The
    # per-step [T, N, P] contact pass shrinks proportionally.
    # 0 = off (full budget*slots table — exact current semantics).
    contact_compact: int = 0
    # per-step candidate-NN implementation: 'auto' (xla_bf16 on TPU,
    # xla elsewhere), 'xla' (fused f32 broadcast-subtract-min),
    # 'xla_bf16' (selection pass in bf16 — winner drift only among
    # ~0.4% near-ties, distance recomputed exactly in f32 at the
    # winner; measured local_a 11.5 -> 10.6 ms/step at equal final
    # loss), 'pallas' (fused VMEM kernel, ops/cand_pallas — correct on
    # hardware but slower at bench shapes, kept as oracle;
    # PERFORMANCE.md), or 'pallas_interpret' (CPU tests)
    cand_impl: str = "auto"


@dataclass(frozen=True)
class FrameFitConfig:
    """Per-frame sequential smoothing (optimization.py:304-327)."""
    num_iter: int = 50                    # :314
    lr: float = 0.1                       # :313
    smooth_mult: float = 5.0              # :227
    weights: LossWeights = field(default_factory=LossWeights)
    contact_parts: Tuple[str, ...] = (
        "back", "butt", "L_Hand", "R_Hand", "L_Leg", "R_Leg", "thighs")


@dataclass(frozen=True)
class KeypointFitConfig:
    """SMPLify-X-style fit from 2D keypoints (pipeline step 3,
    README.md:14-17; focal length 694 per README.md:16)."""
    focal_length: float = 694.0
    image_size: Tuple[int, int] = (1280, 720)
    num_iter: int = 120
    lr: float = 0.02
    stages: int = 3
    weight_reproj: float = 1.0
    weight_vposer: float = 0.05
    weight_shape: float = 0.01
    weight_hand: float = 0.01
    weight_expr: float = 0.01
    weight_jaw: float = 0.1
    gmof_rho: float = 100.0
    # 'adam' (vmapped staged Adam, the measured default), 'lbfgs'
    # (joint-batch L-BFGS with zoom linesearch, like smplifyx's torch
    # LBFGS — scan-speed on TPU), or 'lbfgs_perframe' (vmapped
    # per-frame L-BFGS: per-frame curvature/step, best recovery per
    # iteration). r3 measured the perframe ZOOM linesearch at ~58x
    # slower than Adam on TPU (lanes wait for the slowest); r4
    # replaced it with a bounded backtracking search that vectorizes
    # under vmap at unchanged recovery (PERFORMANCE.md), measured at
    # 22 frames/s on v5e at T=900 (tools/kp_bench.py) — still ~2x
    # slower than 'lbfgs' (46 f/s) at equal recovery, so
    # fit_keypoints REJECTS it on TPU unless allow_slow_perframe.
    optimizer: str = "adam"
    # opt-in override for the lbfgs_perframe-on-TPU guard above
    allow_slow_perframe: bool = False
    lbfgs_memory: int = 8
