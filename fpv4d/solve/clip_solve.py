"""Clip-level joint optimization — the main capability (reference C1,
FittingOP at global_optimization.py:141-653).

Jointly optimizes, over a whole clip at once:
  * the body parameter sequence  [T, 78] (6D-rotation layout),
  * a global metric scale        (init 1.8),
  * per-frame camera extrinsics  [T, 4, 4],
  * DCT trajectory coefficients  [W, 23, 3, K].

TPU-first design vs the reference:
  * every optimization phase compiles to ONE jitted lax.scan over Adam
    steps — no host round-trips inside the hot loop (the reference
    runs a Python loop with per-iteration .item() syncs and
    empty_cache, global_optimization.py:501-532);
  * the reference's imperative requires_grad staging (:505-521) maps
    to *static* per-phase gradient masks (stage boundaries are known
    at trace time, so each phase is its own compiled program and the
    Adam moments persist across phases);
  * model tables and the scene cloud are threaded through the jit
    boundary as a `Ctx` pytree argument — NOT closure constants —
    so megabytes of blendshape/scene data never get baked into the
    compiled program as literals (a compile-time killer on TPU);
  * the scene cloud is shared, not replicated per frame (:175-176);
  * contact distances default to the voxel-grid accelerated NN on TPU
    (precomputed per-cell candidate tables; fpv4d.ops.nn) with brute
    Pallas/XLA implementations selectable via nn_impl;
  * only the vertices a phase's loss actually reads are skinned
    (vertex_subset) — XLA additionally dead-code-eliminates the whole
    SMPL-X forward out of phases whose loss is parameter-only.

Modes: 'local' (contact + smoothing, then planted-foot anti-skate
phase), 'global' (adds world joint smoothing), 'dct' (trajectory-prior
refinement) — same three entry modes as the reference CLI (:660).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from fpv4d.config import ClipConfig
from fpv4d.core import rotations, transforms
from fpv4d.models import params as P
from fpv4d.models import vposer as VP
from fpv4d.models.smplx import SmplxModel
from fpv4d.ops import cand_pallas as CP
from fpv4d.ops import losses
from fpv4d.ops import nn as NN
from fpv4d.ops import sdf as SDF


# lazy-refresh interval used when a scene SDF forces chunked phases
# but contact_refresh_steps is 0 ("exact contact NN"): without it the
# phase would re-linearize + re-dispatch every single Adam step.
DEFAULT_REFRESH_STEPS = 50


class Ctx(NamedTuple):
    """Traced context: everything large the objective reads. Passed as
    an argument through every jit boundary (never closed over)."""
    model: SmplxModel
    vposer: Dict[str, jnp.ndarray]
    scene: jnp.ndarray            # [M, 3]
    grid: object = None           # Optional[NN.VoxelGrid] (impl='grid')
    sdf_lin: object = None        # Optional[SDF.SdfLin] (collision)


class ClipState(NamedTuple):
    """Decision variables (a pytree; one leaf per reference Variable,
    global_optimization.py:179-186)."""
    body_6d: jnp.ndarray      # [T, 78]
    scale: jnp.ndarray        # scalar
    camera_ext: jnp.ndarray   # [T, 4, 4]
    c_dct: jnp.ndarray        # [W, J_dct, 3, K]


class Terms(NamedTuple):
    """All loss terms, computed every step (as cal_loss does).

    ``collision`` completes the reference's declared-but-dead
    ``weight_collision`` knob (lossconfig at global_optimization.py:685
    ships the weight; the docstrings promise "scene sdf and the
    contact loss" but no collision term was ever implemented) — it is
    0 unless the solver is given a scene SDF (fpv4d.ops.sdf)."""
    rec: jnp.ndarray
    vposer: jnp.ndarray
    contact: jnp.ndarray
    smooth: jnp.ndarray
    world_smooth: jnp.ndarray
    dct: jnp.ndarray
    collision: jnp.ndarray = 0.0    # plain float default: creating a
    # device array at class-definition time would initialize a jax
    # backend on module import (breaks the dryrun's lazy provisioning)


def _grad_mask(body=False, scale=False, camera=False, dct=False):
    """Static per-leaf gradient mask == one requires_grad configuration
    of the reference (global_optimization.py:505-521)."""
    return ClipState(body_6d=float(body), scale=float(scale),
                     camera_ext=float(camera), c_dct=float(dct))


def mask_stop_gradient(state: ClipState, mask: ClipState) -> ClipState:
    """Prune the backward graph of statically-masked leaves.

    The phase masks are known at trace time, so leaves a phase never
    optimizes are wrapped in stop_gradient INSIDE the loss — XLA then
    dead-code-eliminates their entire upstream backward (e.g. the
    10,000-iteration dct_a phase optimizes only c_dct and stops paying
    the SMPL-X FK backward). Numerically identical to the post-hoc
    `grads * mask` (which stays on as a belt): both give masked leaves
    exactly-zero gradients, so Adam states evolve identically."""
    return jax.tree.map(
        lambda x, m: x if m else jax.lax.stop_gradient(x), state, mask)


_DUMMY_VERT = np.zeros(1, np.int32)
# Every joints_w consumer reads joints[:, :23] (body + jaw; the
# reference's cal_loss likewise uses smplx_output.joints[:, :23],
# global_optimization.py:298-299) — and joints 0..22 form an
# ancestor-closed prefix of the SMPL-X tree (PARENTS[j] < 23 for
# j < 23), so the joints-only FK can statically stop at the body
# subtree: 8 sequential levels instead of 11, 23 joints instead of
# 55, and the 30-joint hand PCA->matrot chains become dead code.
_BODY_JOINTS = np.arange(23, dtype=np.int32)


def forward_world(ctx: Ctx, state: ClipState,
                  vertex_subset=None, prune=None,
                  merge_joints: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """body_6d -> world-space vertices [T,V,3] and joints [T,23,3].

    Pipeline of cal_loss (global_optimization.py:261-299): decode 6D ->
    75-d, VPoser decode the 32-d latent, SMPL-X forward, scale
    vertices, rigid-transform by camera_ext @ pivot. Joints are
    transformed UNscaled, exactly like the reference (:298-299 applies
    verts_transform without the *scale it gives verts).

    vertex_subset (static ids) restricts skinning to the vertices a
    loss actually reads (e.g. the contact set) — a ~12x LBS cut.

    prune: optional (joint_subset, pose_joint_subset) from
    model.joint_support(vertex_subset) — the VERTICES then come from a
    joint-support-pruned forward (depth-5, ~9-joint FK for leg contact
    sets) and the JOINTS from a separate body-subtree call pruned to
    joints 0..22 (all any consumer reads — _BODY_JOINTS above; r5,
    VERDICT r4 ask #3: the 30 hand joints at FK depth 8-11 were dead
    weight in every joints-reading phase). Phase losses that read only
    one of the two leave the other call to XLA dead-code elimination,
    so contact-only phases (local_a/global_a/skate/refresh) never pay
    the body chain at all, and joints-reading phases (global_b/dct_b/
    the dct_a hoist) never pay the hand chains.
    Exact: pruning drops exactly-zero terms only (f32 sum order).

    merge_joints (with prune): phases whose loss reads BOTH outputs
    (dct_b: contact verts + DCT joints) would pay the leg-subtree FK
    AND the body-subtree FK under the two-call form — but the body
    chain already contains every leg transform, so ONE call with
    joint_subset = leg-support ∪ body serves both outputs. Exact for
    the same reason pruning is: the extra kept joints multiply the
    subset's exactly-zero skinning-weight columns (a +0.0 into the
    LBS sum). Verts-only phases must NOT merge — their joints output
    is dead code, and merging would deepen the live vertex FK from
    the depth-5 leg chain to the depth-8 body chain for nothing."""
    # decode straight from the 78-d layout (P.split_6d — canonical
    # slot table in fpv4d.models.params): rotations flow as MATRICES
    # end to end — the 6D orient slot and VPoser's 6D decode both
    # produce matrots, and the former path round-tripped them through
    # quat -> aa -> Rodrigues every Adam step (latency-bound chains of
    # small TPU ops; see PERFORMANCE.md)
    d = P.split_6d(state.body_6d)
    latent = d["body_pose"]
    pose_mat = VP.decode(ctx.vposer, latent, output_type="matrot")
    orient_mat = rotations.rot6d_to_matrot(d["global_orient"])
    common = dict(
        betas=d["betas"], global_orient=jnp.zeros_like(d["transl"]),
        global_orient_matrot=orient_mat,
        body_pose_matrot=pose_mat, transl=d["transl"],
        left_hand_pose=d["left_hand_pose"],
        right_hand_pose=d["right_hand_pose"])
    if prune is None:
        out = ctx.model(**common, vertex_subset=vertex_subset)
        verts, joints = out["vertices"], out["joints"]
    elif merge_joints:
        js = prune[0]
        if js is not None:
            js = np.union1d(np.asarray(js),
                            _BODY_JOINTS).astype(np.int32)
        out_m = ctx.model(**common, vertex_subset=vertex_subset,
                          joint_subset=js,
                          pose_joint_subset=prune[1])
        verts, joints = out_m["vertices"], out_m["joints"]
    else:
        out_v = ctx.model(**common, vertex_subset=vertex_subset,
                          joint_subset=prune[0],
                          pose_joint_subset=prune[1])
        out_j = ctx.model(**common, vertex_subset=_DUMMY_VERT,
                          joint_subset=_BODY_JOINTS)
        verts, joints = out_v["vertices"], out_j["joints"]
    # scale is normally the per-clip scalar; a [T] vector is accepted
    # for the clips-folded fleet form (parallel.sharding flattens
    # [C,T] -> [C*T] frames and repeats each clip's scale per frame)
    s = state.scale
    s_t = s[:, None] if getattr(s, "ndim", 0) else s
    s_v = s[:, None, None] if getattr(s, "ndim", 0) else s
    b2w = transforms.body2world(state.camera_ext,
                                d["camera_translation"], s_t)
    verts_w = transforms.transform_points(verts * s_v, b2w)
    joints_w = transforms.transform_points(joints[:, :23], b2w)
    return verts_w, joints_w, {"latent": latent}


@dataclass
class ClipSolver:
    """Owns the models + scene and exposes fit()/save-ready outputs."""
    model: SmplxModel
    vposer_params: Dict[str, jnp.ndarray]
    scene_verts: jnp.ndarray            # [M, 3]
    contact_vids: np.ndarray            # combined contact parts
    contact_vids_left: np.ndarray       # L_Leg
    contact_vids_right: np.ndarray      # R_Leg
    config: ClipConfig = ClipConfig()
    use_pallas: Optional[bool] = None   # legacy toggle: True -> 'pallas'
    nn_impl: Optional[str] = None       # 'grid'|'pallas'|'xla'|'ref'
    grid_h: float = 0.25                # voxel size for impl='grid'
    grid_slots: int = 8
    # optional scene SDF (fpv4d.ops.sdf): activates the collision
    # term (weights.collision) on the contact-bearing phases via lazy
    # linearization (the sharded multi-clip path inherits it through
    # build_sharded_step's with_sdf variant)
    sdf: Optional[SDF.SdfGrid] = None

    def __post_init__(self):
        if self.nn_impl is None:
            if self.use_pallas is True:
                self.nn_impl = "pallas"
            elif self.use_pallas is False:
                self.nn_impl = "xla"
            else:
                # TPU default: voxel-grid acceleration (the scene is
                # static across all iterations)
                self.nn_impl = ("grid" if jax.default_backend() == "tpu"
                                else "xla")
        self._cand_impl = self.config.cand_impl
        if self._cand_impl == "auto":
            self._cand_impl = ("xla_bf16"
                               if jax.default_backend() == "tpu"
                               else "xla")
        self._grid = None
        if self.nn_impl == "grid":
            # build from host memory; np scenes avoid a device download
            self._grid = NN.build_voxel_grid(
                np.asarray(self.scene_verts), h=self.grid_h,
                slots_per_cell=self.grid_slots)
        self._opt = optax.adam(self.config.lr)
        # jitted phase programs, keyed by (phase, num_steps); large
        # arrays ride through the Ctx argument, never as constants
        self._compiled = {}
        self._scene_dev = None
        # anti-skate phase vertex set: stratified sample + both feet
        # (config.skate_subset=0 -> full mesh, exact reference
        # semantics)
        n_sub = self.config.skate_subset
        if n_sub and n_sub < self.model.num_verts:
            pool = np.arange(self.model.num_verts, dtype=np.int64)
            if self.config.skate_body_only:
                # keep only vertices skinned entirely by the body
                # subtree (joints < len(_BODY_JOINTS)) so
                # joint_support prunes the skate FK to <=23 joints;
                # feet vids are appended below either way
                w = np.asarray(self.model.lbs_weights)
                nb = len(_BODY_JOINTS)
                if w.shape[1] > nb:
                    ok = (w[:, nb:] == 0).all(axis=1)
                    if ok.any():
                        pool = pool[ok]
            strat = pool[np.linspace(0, len(pool) - 1,
                                     min(n_sub, len(pool)),
                                     dtype=np.int64)]
            vids = np.unique(np.concatenate(
                [strat, self.contact_vids_left, self.contact_vids_right]))
            self._skate_vids = vids.astype(np.int32)
            pos = {int(v): i for i, v in enumerate(vids)}
            self._skate_left = np.asarray(
                [pos[int(v)] for v in self.contact_vids_left], np.int32)
            self._skate_right = np.asarray(
                [pos[int(v)] for v in self.contact_vids_right], np.int32)
        else:
            self._skate_vids = None
            self._skate_left = np.asarray(self.contact_vids_left,
                                          np.int32)
            self._skate_right = np.asarray(self.contact_vids_right,
                                           np.int32)
        # static joint-support pruning (r4): with sparse real-artifact
        # skinning weights the contact set touches only the leg chain,
        # so contact/skate/refresh forwards skip most of the 55-joint
        # FK. None when nothing prunes (dense models) — exact either
        # way (model.joint_support docstring).
        self._feet_vids = np.concatenate([self.contact_vids_left,
                                          self.contact_vids_right])
        self._contact_prune = self.model.joint_support(self.contact_vids)
        self._skate_prune = (self.model.joint_support(self._skate_vids)
                             if self._skate_vids is not None else None)
        self._feet_prune = self.model.joint_support(self._feet_vids)

    @property
    def ctx(self) -> Ctx:
        if self._scene_dev is None:
            self._scene_dev = jnp.asarray(self.scene_verts)
        return Ctx(model=self.model, vposer=self.vposer_params,
                   scene=self._scene_dev, grid=self._grid)

    # -- geometry ------------------------------------------------------------

    def _nn(self, pts: jnp.ndarray, scene: jnp.ndarray,
            grid=None) -> jnp.ndarray:
        """[T, N, 3] vs scene [M, 3] -> squared NN distance [T, N].
        `grid` may be a VoxelGrid (exact per-step query), a FrameCands
        table (lazy-refresh contact path, fused XLA), or a PackedCands
        table (same semantics via the fused Pallas kernel)."""
        if isinstance(grid, NN.FrameCands):
            if self._cand_impl == "xla_bf16":
                return NN.nn_to_candidates_bf16(pts, grid)
            return NN.nn_to_candidates(pts, grid)
        if isinstance(grid, CP.PackedCands):
            return CP.cand_nn(
                pts, grid,
                interpret=self._cand_impl == "pallas_interpret")
        if grid is not None and self.nn_impl == "grid":
            return NN.grid_min_dist(grid, pts)
        impl = "xla" if self.nn_impl == "grid" else self.nn_impl
        d, _ = NN.nn_brute(pts, scene, impl)
        return d

    # -- objectives ----------------------------------------------------------

    def terms(self, state: ClipState, target_6d: jnp.ndarray,
              frame_weights: jnp.ndarray,
              ctx: Optional[Ctx] = None, prune=None,
              merge_joints: bool = False) -> Terms:
        """All six cal_loss terms (global_optimization.py:249-312).

        prune: optional joint-support pruning for the VERTEX forward
        (forward_world docstring) — pass only from phases whose loss
        reads verts_w but not joints_w, so the full-chain joints call
        is dead code XLA removes. merge_joints: for phases reading
        BOTH outputs (dct_b), serve them from one body-subtree call
        (forward_world docstring)."""
        ctx = self.ctx if ctx is None else ctx
        w = self.config.weights
        # skin only the contact vertices — everything else the loss
        # reads (joints, params) doesn't need the other ~10k verts
        verts_w, joints_w, aux = forward_world(
            ctx, state, vertex_subset=self.contact_vids, prune=prune,
            merge_joints=merge_joints)
        rec = w.rec * losses.rec_l1(target_6d, state.body_6d, frame_weights)
        vposer = w.vposer * losses.vposer_prior(aux["latent"])
        smooth = losses.second_order_smoothness(state.body_6d)
        contact_d = self._nn(verts_w, ctx.scene, ctx.grid)
        contact = w.contact * losses.robust_contact(contact_d)
        world_smooth = losses.first_order_smoothness(joints_w)
        dct = losses.dct_trajectory(joints_w, state.c_dct,
                                    self.config.window)
        if ctx.sdf_lin is not None:
            collision = w.collision * SDF.collision_penalty(
                verts_w, ctx.sdf_lin)
        else:
            collision = jnp.float32(0.0)
        return Terms(rec, vposer, contact, smooth, world_smooth, dct,
                     collision)

    def terms2(self, state: ClipState, target_6d: jnp.ndarray,
               frame_weights: jnp.ndarray, weight_right: jnp.ndarray,
               ctx: Optional[Ctx] = None) -> Tuple[jnp.ndarray, ...]:
        """cal_loss2: anti-foot-skate phase terms
        (global_optimization.py:368-447).

        With config.skate_subset > 0, the whole-mesh smoothing term is
        estimated on the stratified vertex subset built in
        __post_init__ (the mean over a uniform index-stratified sample
        is an unbiased estimator of the full-mesh mean; the foot
        vertices of the skate term are always included exactly)."""
        ctx = self.ctx if ctx is None else ctx
        w = self.config.weights
        verts_w, _, _ = forward_world(ctx, state,
                                      vertex_subset=self._skate_vids,
                                      prune=self._skate_prune)
        rec = w.rec * losses.rec_l1(target_6d, state.body_6d, frame_weights)
        local_smooth = losses.second_order_smoothness(state.body_6d)
        vert_smooth = losses.second_order_smoothness(verts_w)
        skate = losses.foot_skate(verts_w[:, self._skate_left],
                                  verts_w[:, self._skate_right],
                                  weight_right)
        return rec, local_smooth, vert_smooth, skate

    # contact phases eligible for the lazy-refresh candidate tables
    _CONTACT_PHASES = ("local_a", "global_a", "dct_b")

    def _refresh_cands(self, state: ClipState):
        """Rebuild the per-frame contact candidate tables from the
        CURRENT world-space contact vertices (runs between scan
        chunks, never inside them — unique-sort + row gathers are the
        expensive ops the per-step path must avoid)."""
        if "refresh_cands" not in self._compiled:
            budget = self.config.contact_cell_budget
            compact = self.config.contact_compact
            pack = self._cand_impl.startswith("pallas")

            @jax.jit
            def run(ctx, state):
                verts_w, _, _ = forward_world(
                    ctx, state, vertex_subset=self.contact_vids,
                    prune=self._contact_prune)
                fc = NN.frame_candidates(ctx.grid, verts_w, budget)
                if compact:
                    fc = NN.compact_candidates(verts_w, fc, compact)
                if pack:
                    return CP.pack_candidates(fc.cand, fc.valid)
                return fc

            self._compiled["refresh_cands"] = run
        return self._compiled["refresh_cands"](self.ctx, state)

    def _use_lazy_contact(self, phase: str) -> bool:
        return (self.nn_impl == "grid"
                and self.config.contact_refresh_steps > 0
                and phase in self._CONTACT_PHASES)

    def _refresh_sdf(self, state: ClipState):
        """Linearize the scene SDF at the current contact vertices
        (refresh-time gathers; the per-step collision term is then
        gather-free, see fpv4d.ops.sdf)."""
        if "refresh_sdf" not in self._compiled:

            @jax.jit
            def run(ctx, sdf, state):
                verts_w, _, _ = forward_world(
                    ctx, state, vertex_subset=self.contact_vids,
                    prune=self._contact_prune)
                return SDF.linearize(sdf, verts_w)

            self._compiled["refresh_sdf"] = run
        return self._compiled["refresh_sdf"](self.ctx, self.sdf, state)

    def _run_phase_auto(self, state, opt_state, target_6d, frame_weights,
                        num_steps: int, phase: str):
        """Phase runner with lazy refresh: contact-bearing phases run
        as chunks of `contact_refresh_steps` scans, rebuilding the
        candidate tables (and the SDF linearization when a scene SDF
        is present) between chunks."""
        lazy_contact = self._use_lazy_contact(phase)
        lazy_sdf = (self.sdf is not None
                    and phase in self._CONTACT_PHASES)
        if not (lazy_contact or lazy_sdf):
            return self._run_phase(state, opt_state, target_6d,
                                   frame_weights, num_steps, phase)
        # contact_refresh_steps=0 means "exact contact NN" (no lazy
        # candidate tables) — but an SDF can still force lazy mode, and
        # a chunk of 1 would cross the host/jit boundary every Adam
        # step (~25 ms/dispatch through the TPU tunnel). Fall back to
        # a sane refresh interval instead.
        chunk = max(1, self.config.contact_refresh_steps
                    or DEFAULT_REFRESH_STEPS)
        hists = []
        left = num_steps
        while left > 0:
            k = min(chunk, left)
            cands = self._refresh_cands(state) if lazy_contact else None
            lin = self._refresh_sdf(state) if lazy_sdf else None
            state, opt_state, h = self._run_phase(
                state, opt_state, target_6d, frame_weights, k, phase,
                cands=cands, sdf_lin=lin)
            hists.append(h)
            left -= k
        return state, opt_state, jnp.concatenate(hists)

    def detect_contact(self, state: ClipState) -> jnp.ndarray:
        """Per-frame planted-foot weight (detect_contact,
        global_optimization.py:315-365, with the intended
        left/(left+right) formula — see losses.planted_foot_weight)."""
        if "detect_contact" not in self._compiled:

            n_left = len(self.contact_vids_left)
            feet = self._feet_vids

            @jax.jit
            def run(ctx, state):
                verts_w, _, _ = forward_world(ctx, state,
                                              vertex_subset=feet,
                                              prune=self._feet_prune)
                d_l = jnp.mean(self._nn(
                    verts_w[:, :n_left], ctx.scene, ctx.grid), axis=1)
                d_r = jnp.mean(self._nn(
                    verts_w[:, n_left:], ctx.scene, ctx.grid), axis=1)
                return losses.planted_foot_weight(d_l, d_r)

            self._compiled["detect_contact"] = run
        return jax.lax.stop_gradient(
            self._compiled["detect_contact"](self.ctx, state))

    # -- init ----------------------------------------------------------------

    @staticmethod
    def init_core(body_75: jnp.ndarray, outlier_factor: float
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Outlier-aware init on ONE clip's [T, 75] params -> (seeded
        body_6d, target_6d, frame_weights). Pure/traceable — the
        single-clip init_state jits it and the fleet's
        MultiClipSolver.init_batch vmaps it over clips (one program,
        so the two paths cannot drift; VERDICT r4 ask #1a)."""
        T = body_75.shape[0]
        body_6d = rotations.params_to_6d(body_75)
        a, b = P.VPOSER_SLICE
        latent = body_75[:, a:b]
        stats = jnp.sum(latent ** 2, axis=1)
        good = stats <= outlier_factor * jnp.mean(stats)

        idx = jnp.arange(T)
        # nearest good frame (outliers re-seeded from it)
        dist = jnp.abs(idx[:, None] - idx[None, :]) + jnp.where(
            good[None, :], 0, 10 * T)
        nearest_good = jnp.argmin(dist, axis=1)
        seed_from = jnp.where(good, idx, nearest_good)
        return body_6d[seed_from], body_6d, good.astype(jnp.float32)

    def init_state(self, body_75: jnp.ndarray, camera_ext: jnp.ndarray
                   ) -> Tuple[ClipState, jnp.ndarray, jnp.ndarray]:
        """Seed decision variables + outlier handling (init(),
        global_optimization.py:450-489).

        Frames whose VPoser latent energy exceeds outlier_factor x mean
        are treated as wrong upstream detections: their reconstruction
        weight is zeroed and their initialization is replaced by the
        nearest non-outlier frame. Returns (state, target_6d,
        frame_weights)."""
        cfg = self.config
        T = body_75.shape[0]

        if "init_state" not in self._compiled:
            self._compiled["init_state"] = jax.jit(
                lambda b: self.init_core(b, cfg.outlier_factor))

        body_init, target_6d, weights = self._compiled["init_state"](
            body_75)
        num_windows = T // cfg.window
        c_dct = jnp.zeros((num_windows, cfg.num_dct_joints, 3,
                           cfg.dct_num), dtype=jnp.float32)
        state = ClipState(
            body_6d=body_init,
            scale=jnp.asarray(cfg.scale_init, dtype=jnp.float32),
            camera_ext=camera_ext.astype(jnp.float32),
            c_dct=c_dct,
        )
        if cfg.dct_closed_form_init:
            # project the INITIAL world joint trajectories onto the
            # orthonormal DCT basis — phase dct_a then starts at the
            # least-squares optimum for the initial pose sequence
            _, joints_w, _ = forward_world(
                self.ctx, state, vertex_subset=self.contact_vids,
                prune=self._contact_prune)
            state = state._replace(c_dct=losses.dct_encode(
                joints_w[:, :cfg.num_dct_joints], cfg.window,
                cfg.dct_num))
        return state, target_6d, weights

    # -- phase runner ----------------------------------------------------------

    @staticmethod
    def contact_a_loss(t: Terms, contact_mult) -> jnp.ndarray:
        """THE a-phase recipe (local_a/global_a), in one place: the
        phases differ only by the contact multiplier, which may be a
        static config float (phase_loss, sharded fleet, roofline) or
        a traced scalar (the shared 'contact_a' executable in
        run_phase). One definition so the production single-clip
        program can never drift from the sharded/roofline one."""
        return (t.contact * contact_mult + t.smooth + t.rec
                + t.collision)

    def phase_loss(self, phase: str, state: ClipState, target_6d,
                   frame_weights, ctx: Optional[Ctx] = None) -> jnp.ndarray:
        """Stage loss recipes — the static equivalents of the
        reference's per-stage loss lines (global_optimization.py:
        505-523 local, :564-582 global, :601-620 dct)."""
        cfg = self.config
        # joint-support pruning on every FK-bearing phase (r5 — the
        # joints call now stops at the 23-joint body subtree, see
        # forward_world): local_a/global_a read verts only (the joints
        # call is DCE'd), global_b reads joints only (the leg-pruned
        # vertex call is DCE'd), dct_b reads both (leg-chain vertex FK
        # + body-chain joints FK — together still cheaper than one
        # 55-joint, depth-11 chain). local_b/dct_a are parameter-only
        # here (prune moot; dct_a's hoisted FK lives in
        # _make_dct_only_phase). None when nothing prunes (dense
        # models) keeps single-call reference semantics.
        prune = (self._contact_prune
                 if phase in ("local_a", "global_a", "global_b",
                              "dct_b") else None)
        # dct_b reads verts AND joints: one merged body-subtree call
        # instead of leg-FK + body-FK (forward_world merge_joints).
        # global_b merges too — its verts are dead code either way, so
        # the merged program is identical after DCE (and the joints
        # half is the same _BODY_JOINTS chain).
        t = self.terms(state, target_6d, frame_weights, ctx, prune=prune,
                       merge_joints=phase in ("dct_b", "global_b"))
        # t.collision is 0 unless a scene SDF was supplied; it rides
        # with the contact term in every contact-bearing phase (the
        # reference's weight_collision shipped beside weight_contact)
        if phase == "local_a":
            return self.contact_a_loss(t, cfg.local_contact_mult)
        if phase == "local_b":
            return t.rec + t.smooth * cfg.phase_b_smooth_mult
        if phase == "global_a":
            return self.contact_a_loss(t, cfg.global_contact_mult)
        if phase == "global_b":
            return t.rec + t.world_smooth + t.smooth \
                * cfg.phase_b_smooth_mult
        if phase == "dct_a":
            return t.dct * cfg.dct_mult
        if phase == "dct_b":
            return (t.dct * 1e-4 + t.rec * 0.5 + t.contact * 0.1
                    + t.collision)
        raise ValueError(f"unknown phase {phase}")

    def phase_mask(self, phase: str) -> ClipState:
        return {
            "local_a": _grad_mask(body=True, scale=True),
            "local_b": _grad_mask(body=True, camera=True),
            "global_a": _grad_mask(body=True, scale=True),
            "global_b": _grad_mask(body=True, camera=True),
            "dct_a": _grad_mask(dct=True),
            "dct_b": _grad_mask(body=True, scale=True),
        }[phase]

    def _run_phase(self, state, opt_state, target_6d, frame_weights,
                   num_steps: int, phase: str, cands=None,
                   sdf_lin=None):
        """One optimization phase: `num_steps` Adam steps under a
        static gradient mask, as a single jitted lax.scan (compiled
        once per (phase, num_steps)).

        cands: optional NN.FrameCands — evaluate the contact term
        against per-frame candidate tables instead of per-step grid
        queries (threaded through ctx.grid; _nn dispatches on type).
        sdf_lin: optional SDF.SdfLin — activates the linearized
        collision term for the chunk (threaded through ctx.sdf_lin)."""
        # local_a and global_a share ONE compiled program: identical
        # term set and gradient mask, differing only by the contact
        # multiplier — which rides through as a TRACED scalar, so the
        # expensive a-phase executable is compiled (and prewarmed,
        # and shipped through the tunnel) once instead of twice
        # (VERDICT r3 ask #5: compiled-program budget / cold start).
        contact_a = phase in ("local_a", "global_a")
        key_name = "contact_a" if contact_a else phase
        # key extends only when a SDF linearization rides along, so
        # plain lookups by (phase, steps) — e.g. bench.py's 1-step
        # roofline compile — keep working
        key = ((key_name, num_steps) if sdf_lin is None
               else (key_name, num_steps, "sdf"))
        mult = jnp.float32(
            self.config.local_contact_mult if phase == "local_a"
            else self.config.global_contact_mult)
        # dispatch on the phase NAME: the specialized runner hardcodes
        # the dct_a loss recipe (and a 5-arg signature — no traced
        # contact multiplier), so it is compiled AND called here, on
        # cache hits too
        if phase == "dct_a":
            run = self._compiled.get(key)
            if run is None:
                run = self._make_dct_only_phase(num_steps)
                self._compiled[key] = run
            return run(self.ctx if cands is None else
                       self.ctx._replace(grid=cands), state,
                       opt_state, target_6d, frame_weights)
        if key not in self._compiled:
            mask = self.phase_mask(phase)

            @jax.jit
            def run(ctx, state, opt_state, target_6d, frame_weights,
                    contact_mult):
                def loss_fn(state):
                    st = mask_stop_gradient(state, mask)
                    if contact_a:
                        t = self.terms(st, target_6d, frame_weights,
                                       ctx, prune=self._contact_prune)
                        return self.contact_a_loss(t, contact_mult)
                    return self.phase_loss(phase, st, target_6d,
                                           frame_weights, ctx)

                def step(carry, _):
                    state, opt_state = carry
                    loss, grads = jax.value_and_grad(loss_fn)(state)
                    grads = jax.tree.map(lambda g, m: g * m, grads, mask)
                    updates, opt_state = self._opt.update(
                        grads, opt_state, state)
                    state = optax.apply_updates(state, updates)
                    return (state, opt_state), loss

                (state, opt_state), hist = jax.lax.scan(
                    step, (state, opt_state), None, length=num_steps)
                return state, opt_state, hist

            self._compiled[key] = run
        ctx = self.ctx
        if cands is not None:
            ctx = ctx._replace(grid=cands)
        if sdf_lin is not None:
            ctx = ctx._replace(sdf_lin=sdf_lin)
        return self._compiled[key](ctx, state, opt_state, target_6d,
                                   frame_weights, mult)

    def _make_dct_only_phase(self, num_steps: int):
        """Specialized runner for phases that optimize ONLY c_dct
        (phase dct_a — 95% of the reference's heaviest 10,000-iteration
        schedule, global_optimization.py:596,601): the body is frozen,
        so the world joint trajectories are LOOP-INVARIANT and the
        SMPL-X forward runs ONCE per phase instead of once per Adam
        step. The scanned step is then just the DCT residual + its
        c_dct gradient. Loss values and c_dct trajectories are
        bit-identical to the generic path (the hoisted joints_w is
        exactly what every step recomputed); regression-tested in
        tests/test_clip_solve.py::test_dct_only_phase_matches_generic.
        """
        cfg = self.config

        @jax.jit
        def run(ctx, state, opt_state, target_6d, frame_weights):
            # joints need no skinning at all: with prune, the vertex
            # call is dead code and the joints FK stops at the body
            # subtree (forward_world _BODY_JOINTS)
            _, joints_w, _ = forward_world(
                ctx, state, vertex_subset=self.contact_vids,
                prune=self._contact_prune)
            joints_w = jax.lax.stop_gradient(joints_w)

            def loss_fn(c_dct):
                # == phase_loss('dct_a'): t.dct * cfg.dct_mult
                return losses.dct_trajectory(
                    joints_w, c_dct, cfg.window) * cfg.dct_mult

            def step(carry, _):
                state, opt_state = carry
                loss, g_c = jax.value_and_grad(loss_fn)(state.c_dct)
                grads = ClipState(
                    body_6d=jnp.zeros_like(state.body_6d),
                    scale=jnp.zeros_like(state.scale),
                    camera_ext=jnp.zeros_like(state.camera_ext),
                    c_dct=g_c)
                updates, opt_state = self._opt.update(
                    grads, opt_state, state)
                state = optax.apply_updates(state, updates)
                return (state, opt_state), loss

            (state, opt_state), hist = jax.lax.scan(
                step, (state, opt_state), None, length=num_steps)
            return state, opt_state, hist

        return run

    def phase_step_body(self, phase: str):
        """Standalone jit of ONE scan-body step of `phase` — exactly
        the per-step work inside the phase program's lax.scan (loss ->
        masked grad -> Adam update), without the program prologue or,
        for dct_a, the hoisted once-per-phase SMPL-X forward.

        bench.py cost-analyzes this program for the roofline columns:
        XLA's cost analysis counts a scan body once but also counts
        the phase prologue, so analysing a full phase program mixes
        table transfers (and dct_a's hoisted FK) into the per-step
        numbers — which is how BENCH_r02 reported a physically
        impossible 229 TB/s for dct_a.

        Signatures:
          dct_a: f(joints_w, state, opt_state)
          skate: f(ctx, state, opt_state, target_6d, frame_weights,
                   weight_right)
          else:  f(ctx, state, opt_state, target_6d, frame_weights)
        each returning (state, opt_state, loss)."""
        cfg = self.config
        if phase == "dct_a":

            @jax.jit
            def body(joints_w, state, opt_state):
                def loss_fn(c_dct):
                    return losses.dct_trajectory(
                        joints_w, c_dct, cfg.window) * cfg.dct_mult

                loss, g_c = jax.value_and_grad(loss_fn)(state.c_dct)
                grads = ClipState(
                    body_6d=jnp.zeros_like(state.body_6d),
                    scale=jnp.zeros_like(state.scale),
                    camera_ext=jnp.zeros_like(state.camera_ext),
                    c_dct=g_c)
                updates, opt_state = self._opt.update(
                    grads, opt_state, state)
                return (optax.apply_updates(state, updates), opt_state,
                        loss)

            return body

        if phase == "skate":
            mask = _grad_mask(body=True)

            @jax.jit
            def body(ctx, state, opt_state, target_6d, frame_weights,
                     weight_right):
                def loss_fn(state):
                    rec, local_s, vert_s, skate = self.terms2(
                        mask_stop_gradient(state, mask), target_6d,
                        frame_weights, weight_right, ctx)
                    return vert_s + local_s + rec + skate

                loss, grads = jax.value_and_grad(loss_fn)(state)
                grads = jax.tree.map(lambda g, m: g * m, grads, mask)
                updates, opt_state = self._opt.update(
                    grads, opt_state, state)
                return (optax.apply_updates(state, updates), opt_state,
                        loss)

            return body

        mask = self.phase_mask(phase)

        @jax.jit
        def body(ctx, state, opt_state, target_6d, frame_weights):
            def loss_fn(state):
                return self.phase_loss(
                    phase, mask_stop_gradient(state, mask), target_6d,
                    frame_weights, ctx)

            loss, grads = jax.value_and_grad(loss_fn)(state)
            grads = jax.tree.map(lambda g, m: g * m, grads, mask)
            updates, opt_state = self._opt.update(grads, opt_state,
                                                  state)
            return optax.apply_updates(state, updates), opt_state, loss

        return body

    def _run_skate_phase(self, state, opt_state, target_6d, frame_weights,
                         num_steps: int, weight_right):
        """Local-mode phase 2: anti-foot-skate refinement over the body
        sequence only (global_optimization.py:536-556)."""
        key = ("skate", num_steps)
        if key not in self._compiled:
            mask = _grad_mask(body=True)

            @jax.jit
            def run(ctx, state, opt_state, target_6d, frame_weights,
                    weight_right):
                def loss_fn(state):
                    rec, local_s, vert_s, skate = self.terms2(
                        mask_stop_gradient(state, mask), target_6d,
                        frame_weights, weight_right, ctx)
                    return vert_s + local_s + rec + skate

                def step(carry, _):
                    state, opt_state = carry
                    loss, grads = jax.value_and_grad(loss_fn)(state)
                    grads = jax.tree.map(lambda g, m: g * m, grads, mask)
                    updates, opt_state = self._opt.update(
                        grads, opt_state, state)
                    state = optax.apply_updates(state, updates)
                    return (state, opt_state), loss

                (state, opt_state), hist = jax.lax.scan(
                    step, (state, opt_state), None, length=num_steps)
                return state, opt_state, hist

            self._compiled[key] = run
        return self._compiled[key](self.ctx, state, opt_state, target_6d,
                                   frame_weights, weight_right)

    # -- public API ------------------------------------------------------------

    def fit(self, body_75: jnp.ndarray, camera_ext: jnp.ndarray,
            mode: str = "local", verbose: bool = False,
            checkpoint_dir: Optional[str] = None
            ) -> Tuple[ClipState, Dict[str, np.ndarray]]:
        """Run the staged solve. body_75 [T,75] packed SMPLify-X
        outputs; camera_ext [T,4,4] COLMAP world-from-camera init.

        checkpoint_dir: if given, the solver state + Adam moments are
        orbax-checkpointed after every phase (mid-optimization resume —
        the reference can only resume at stage-directory granularity,
        SURVEY.md section 5).

        Returns the final state and a history dict of per-step losses.
        Phase schedule mirrors fitting() (global_optimization.py:491-635).
        """
        cfg = self.config
        state, target_6d, frame_weights = self.init_state(body_75,
                                                          camera_ext)
        opt_state = self._opt.init(state)
        hist: Dict[str, np.ndarray] = {}

        def ckpt(state, opt_state, tag):
            if checkpoint_dir:
                import os
                from fpv4d.utils.checkpoint import save_solver_state
                save_solver_state(os.path.join(checkpoint_dir, tag),
                                  state, opt_state,
                                  step=sum(len(v) for v in hist.values()))

        if mode == "local":
            n_a = int(cfg.num_iter * cfg.stage_split)
            n_b = cfg.num_iter - n_a
            state, opt_state, h = self._run_phase_auto(
                state, opt_state, target_6d, frame_weights, n_a, "local_a")
            hist["local_a"] = np.asarray(h)
            ckpt(state, opt_state, "local_a")
            state, opt_state, h = self._run_phase_auto(
                state, opt_state, target_6d, frame_weights, n_b, "local_b")
            hist["local_b"] = np.asarray(h)
            ckpt(state, opt_state, "local_b")
            weight_right = self.detect_contact(state)
            n_c = int(cfg.contact_phase_frac * cfg.num_iter)
            state, opt_state, h = self._run_skate_phase(
                state, opt_state, target_6d, frame_weights, n_c,
                weight_right)
            hist["local_skate"] = np.asarray(h)
            ckpt(state, opt_state, "local_skate")
        elif mode == "global":
            n_a = int(cfg.num_iter * cfg.stage_split)
            n_b = cfg.num_iter - n_a
            state, opt_state, h = self._run_phase_auto(
                state, opt_state, target_6d, frame_weights, n_a, "global_a")
            hist["global_a"] = np.asarray(h)
            ckpt(state, opt_state, "global_a")
            state, opt_state, h = self._run_phase_auto(
                state, opt_state, target_6d, frame_weights, n_b, "global_b")
            hist["global_b"] = np.asarray(h)
            ckpt(state, opt_state, "global_b")
        elif mode == "dct":
            n = cfg.num_iter_dct
            n_a = int(n * cfg.dct_split)
            state, opt_state, h = self._run_phase_auto(
                state, opt_state, target_6d, frame_weights, n_a, "dct_a")
            hist["dct_a"] = np.asarray(h)
            ckpt(state, opt_state, "dct_a")
            state, opt_state, h = self._run_phase_auto(
                state, opt_state, target_6d, frame_weights, n - n_a, "dct_b")
            hist["dct_b"] = np.asarray(h)
            ckpt(state, opt_state, "dct_b")
        else:
            raise ValueError(f"unknown mode {mode!r}")

        if verbose:
            for k, v in hist.items():
                print(f"[fpv4d.clip_solve] {k}: loss {v[0]:.4f} -> "
                      f"{v[-1]:.4f} ({len(v)} steps)")
        return state, hist

    def result_params(self, state: ClipState) -> Tuple[np.ndarray,
                                                       float, np.ndarray]:
        """Final (body_75 [T,75], scale, camera_ext [T,4,4]) — the
        save_result inputs (global_optimization.py:633-635)."""
        body = np.asarray(rotations.params_to_3d(state.body_6d))
        return body, float(state.scale), np.asarray(state.camera_ext)
