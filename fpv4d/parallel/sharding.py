"""Device-mesh scaling for the capture pipeline.

The reference is strictly single-GPU (SURVEY.md section 2.3: no
torch.distributed, no collectives; the only batching is the frame axis
of one clip). The TPU-native scaling axes are:

  * **clips** (data parallel): independent videos/clips — one clip (or
    clip-shard) per chip over ICI; embarrassingly parallel, collectives
    only in the shared-model broadcast.
  * **frames** (sequence parallel): the temporal axis of one clip.
    Every term of the objective is frame-local except the
    finite-difference smoothness terms (+-2 neighbors) and the DCT
    windows (60-frame blocks). We annotate shardings with
    `jax.sharding.NamedSharding` and let XLA insert the halo
    collective-permutes for the shifted differences — no NCCL-style
    hand scheduling.

`jax.distributed` initialization covers multi-host (DCN) runs; within
a slice everything rides ICI.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fpv4d.ops.sdf import SdfLin
from fpv4d.solve.clip_solve import (ClipSolver, ClipState, Ctx,
                                    mask_stop_gradient)


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Multi-host (DCN) runtime init, gated so single-process runs are
    a strict no-op.

    Activates when FPV4D_DISTRIBUTED=1 (cluster parameters then come
    from the standard environment auto-detection: SLURM / GKE / TPU
    metadata) or when an explicit coordinator_address is given.
    Returns True if jax.distributed was initialized (or already was).
    Within a slice, collectives ride ICI; across hosts, DCN — the mesh
    helpers below are agnostic to that.
    """
    import os
    if coordinator_address is None \
            and os.environ.get("FPV4D_DISTRIBUTED") != "1":
        return False
    # already-initialized check via the distributed client handle.
    # NEVER probe jax.process_count()/jax.devices() here: enumerating
    # devices initializes the local backend, after which
    # jax.distributed.initialize() unconditionally raises ("must be
    # called before any JAX device operations") — the guard itself
    # would make every multi-host launch crash at init.
    from jax._src import distributed as _jdist
    if getattr(_jdist.global_state, "client", None) is not None:
        return True                      # already initialized
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def make_mesh(axes: Dict[str, int],
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over the first prod(axes) available devices, e.g.
    {'clips': 2, 'frames': 4} on a v5e-8."""
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(list(axes.values())))
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(tuple(axes.values()))
    return Mesh(dev, tuple(axes.keys()))


def clip_batch_shardings(mesh: Mesh, clip_axis: str = "clips",
                         frame_axis: Optional[str] = "frames",
                         dct_windows: Optional[int] = None):
    """NamedShardings for a batched clip problem.

    Batched layout (leading clip axis C, then frame axis T):
      body_6d     [C, T, 78]    -> P(clips, frames)
      scale       [C]           -> P(clips)
      camera_ext  [C, T, 4, 4]  -> P(clips, frames)
      c_dct       [C, W, ...]   -> P(clips, frames) when the window
                   count W (pass it as dct_windows) divides evenly
                   over the frame axis — the [T] -> [W, window]
                   trajectory reshape of losses.dct_trajectory is then
                   shard-local and the dct term needs NO collectives;
                   otherwise P(clips) (windows whole, XLA gathers)
      target_6d   [C, T, 78]    -> P(clips, frames)
      weights     [C, T]        -> P(clips, frames)
      scene       [C, M, 3]     -> P(clips)
    """
    f = frame_axis if (frame_axis and frame_axis in mesh.axis_names) \
        else None
    f_dct = f
    if f is not None:
        nf = mesh.shape[f]
        if dct_windows is None or dct_windows % nf != 0:
            f_dct = None
    state = ClipState(
        body_6d=NamedSharding(mesh, P(clip_axis, f)),
        scale=NamedSharding(mesh, P(clip_axis)),
        camera_ext=NamedSharding(mesh, P(clip_axis, f)),
        c_dct=NamedSharding(mesh, P(clip_axis, f_dct)),
    )
    return dict(
        state=state,
        target=NamedSharding(mesh, P(clip_axis, f)),
        weights=NamedSharding(mesh, P(clip_axis, f)),
        scene=NamedSharding(mesh, P(clip_axis)),
        replicated=NamedSharding(mesh, P()),
    )


def _flatten_state(state_b: ClipState) -> ClipState:
    """[C, T, ...] batched state -> [C*T, ...] frames-folded state for
    the frame-parallel model chain (per-clip scale repeats per frame;
    c_dct is never read by folded consumers)."""
    C, T = state_b.body_6d.shape[:2]
    return ClipState(
        body_6d=state_b.body_6d.reshape(C * T, -1),
        scale=jnp.repeat(state_b.scale, T),
        camera_ext=state_b.camera_ext.reshape(C * T, 4, 4),
        c_dct=state_b.c_dct)


def _skate_flat_loss(solver: ClipSolver):
    """Single-device fleet skate loss with the clips axis FOLDED into
    the frame axis for the model chain.

    The clips-vmapped 55-joint FK/LBS lowering pays ~+11% per clip at
    C=8 (tools/ablate_fleet.py skate_model rows — the same batched-dot
    layout tax the candidate NN fixed with its custom_vmap flatten
    rule, PERFORMANCE.md r4), and the skate forward is frame-parallel:
    folding [C,T] -> [C*T] recovers the single-clip lowering exactly.
    The temporal terms (second-order smoothing, foot skate) stay
    per-clip on the reshaped outputs, so no difference crosses a clip
    boundary. Only valid on a ONE-DEVICE mesh: on a real multi-chip
    mesh the reshape would merge sharded axes and buy an all-gather
    instead of a layout fix (build_sharded_step gates on mesh size)."""
    from fpv4d.ops import losses as L
    w = solver.config.weights

    def loss(state_b, target_b, weights_b, wr_b, ctx):
        C, T = state_b.body_6d.shape[:2]
        st_flat = _flatten_state(state_b)
        from fpv4d.solve.clip_solve import forward_world
        verts_flat, _, _ = forward_world(
            ctx, st_flat, vertex_subset=solver._skate_vids,
            prune=solver._skate_prune)
        verts_b = verts_flat.reshape((C, T) + verts_flat.shape[1:])

        def per_clip(verts_w, body_6d, tgt, wts, wr_):
            rec = w.rec * L.rec_l1(tgt, body_6d, wts)
            local_s = L.second_order_smoothness(body_6d)
            vert_s = L.second_order_smoothness(verts_w)
            skate = L.foot_skate(verts_w[:, solver._skate_left],
                                 verts_w[:, solver._skate_right], wr_)
            return vert_s + local_s + rec + skate

        return jax.vmap(per_clip)(verts_b, state_b.body_6d, target_b,
                                  weights_b, wr_b)

    return loss


def _per_clip_loss(solver: ClipSolver, phase: str):
    """Per-clip loss closure for a phase. `extra` threads phase-specific
    per-clip data ('skate' needs the planted-foot weights [T])."""
    if phase == "skate":
        def loss(state, target, weights, extra, ctx):
            rec, local_s, vert_s, skate = solver.terms2(
                state, target, weights, extra, ctx)
            return vert_s + local_s + rec + skate
    else:
        def loss(state, target, weights, extra, ctx):
            return solver.phase_loss(phase, state, target, weights, ctx)
    return loss


def build_sharded_step(solver: ClipSolver, mesh: Mesh, phase: str = "local_a",
                       clip_axis: str = "clips",
                       frame_axis: Optional[str] = "frames",
                       grid_b=None, num_steps: int = 1,
                       dct_windows: Optional[int] = None,
                       with_sdf: bool = False):
    """One optimization phase of the clip solve, batched over clips and
    jitted over the mesh with 2-D (clips x frames) shardings: num_steps
    Adam steps compiled as a single `lax.scan` (no host round-trips —
    same structure as ClipSolver._run_phase). XLA inserts the halo
    exchanges for the temporal-difference terms and keeps everything
    else local.

    grid_b: optional batched VoxelGrid (fpv4d.ops.nn.build_voxel_grid_batch,
    leading clip axis) — enables the voxel-accelerated contact path
    per clip; without it the contact term uses brute XLA NN.

    with_sdf: step_fn takes a trailing batched SDF linearization
    (fpv4d.ops.sdf.SdfLin with a leading clip axis, from
    build_sharded_sdf_refresh) and activates the collision term —
    the sharded twin of ClipSolver's lazy SDF path.

    phase='skate' runs the anti-foot-skate objective (terms2); its
    step_fn then takes the planted-foot weights as a trailing [C,T]
    argument (see build_sharded_detect_contact).

    Returns (step_fn, init_fn):
      init_fn(state_batch) -> opt_state (sharded like the state)
      step_fn(state, opt_state, target, weights, scene[, weight_right])
          -> (state', opt_state', loss_hist [num_steps, C])
    """
    sh = clip_batch_shardings(mesh, clip_axis, frame_axis,
                              dct_windows=dct_windows)
    opt = solver._opt
    mask = (_skate_mask() if phase == "skate"
            else solver.phase_mask(phase))
    use_grid = grid_b is not None and solver.nn_impl == "grid"
    # one-device mesh: fold clips into frames for the skate model
    # chain (_skate_flat_loss docstring — on a real mesh the reshape
    # would cross sharded axes, so multi-device keeps the vmap form)
    flat_skate = (_skate_flat_loss(solver)
                  if phase == "skate" and mesh.devices.size == 1
                  else None)
    clip_loss = _per_clip_loss(solver, phase)
    extra_ax = 0 if phase == "skate" else None
    grid_ax = _grid_in_axes(grid_b)
    f = frame_axis if (frame_axis and frame_axis in mesh.axis_names) \
        else None

    sdf_ax = (jax.tree.map(lambda _: 0, SdfLin(s0=0, g=0, v0=0))
              if with_sdf else None)

    def batched_loss(ctx_base, scene_b, grid_b, sdf_b, state_b,
                     target_b, weights_b, extra_b):
        if flat_skate is not None:
            losses = flat_skate(state_b, target_b, weights_b, extra_b,
                                ctx_base)
            return jnp.sum(losses), losses
        # per-clip scene/grid/sdf ride the vmapped axes; the shared
        # model tables broadcast (in_axes=None leaves)
        if use_grid:
            def per_clip(scene, grid_c, sdf_c, state, target, weights,
                         extra):
                ctx = Ctx(model=ctx_base.model, vposer=ctx_base.vposer,
                          scene=scene, grid=grid_c, sdf_lin=sdf_c)
                return clip_loss(state, target, weights, extra, ctx)

            losses = jax.vmap(
                per_clip,
                in_axes=(0, grid_ax, sdf_ax, 0, 0, 0, extra_ax))(
                    scene_b, grid_b, sdf_b, state_b, target_b,
                    weights_b, extra_b)
        else:
            def per_clip(scene, sdf_c, state, target, weights, extra):
                ctx = Ctx(model=ctx_base.model, vposer=ctx_base.vposer,
                          scene=scene, sdf_lin=sdf_c)
                return clip_loss(state, target, weights, extra, ctx)

            losses = jax.vmap(
                per_clip, in_axes=(0, sdf_ax, 0, 0, 0, extra_ax))(
                    scene_b, sdf_b, state_b, target_b, weights_b,
                    extra_b)
        return jnp.sum(losses), losses

    def phase_scan(ctx_base, scene_b, grid_arg, sdf_b, state_b,
                   opt_state, target_b, weights_b, extra_b):
        if phase == "dct_a":
            # dct_a optimizes ONLY c_dct: the per-clip world joint
            # trajectories are loop-invariant, so the SMPL-X forward
            # runs once per phase, not once per Adam step (mirrors
            # ClipSolver._make_dct_only_phase; parity is covered by
            # the sharded-vs-single dct tests)
            from fpv4d.ops import losses as L
            from fpv4d.solve.clip_solve import forward_world
            cfg = solver.config

            def clip_joints(scene, state):
                ctx = Ctx(model=ctx_base.model, vposer=ctx_base.vposer,
                          scene=scene)
                _, joints_w, _ = forward_world(
                    ctx, state, vertex_subset=solver.contact_vids,
                    prune=solver._contact_prune)
                return joints_w

            joints_b = jax.lax.stop_gradient(
                jax.vmap(clip_joints)(scene_b, state_b))

            def dct_step(carry, _):
                state_b, opt_state = carry
                per_clip, g_c = jax.vmap(
                    jax.value_and_grad(
                        lambda c, j: L.dct_trajectory(j, c, cfg.window)
                        * cfg.dct_mult))(state_b.c_dct, joints_b)
                grads = ClipState(
                    body_6d=jnp.zeros_like(state_b.body_6d),
                    scale=jnp.zeros_like(state_b.scale),
                    camera_ext=jnp.zeros_like(state_b.camera_ext),
                    c_dct=g_c)
                updates, opt_state = opt.update(grads, opt_state,
                                                state_b)
                state_b = optax.apply_updates(state_b, updates)
                return (state_b, opt_state), per_clip

            (state_b, opt_state), hist = jax.lax.scan(
                dct_step, (state_b, opt_state), None, length=num_steps)
            return state_b, opt_state, hist

        def one_step(carry, _):
            state_b, opt_state = carry
            # static-mask stop_gradient prunes the backward of leaves
            # this phase never optimizes (see clip_solve)
            (_, per_clip), grads = jax.value_and_grad(
                lambda c, s, g, sd, st, t, w, e: batched_loss(
                    c, s, g, sd, mask_stop_gradient(st, mask), t, w, e),
                argnums=4, has_aux=True)(
                    ctx_base, scene_b, grid_arg, sdf_b, state_b,
                    target_b, weights_b, extra_b)
            grads = jax.tree.map(lambda g, m: g * m, grads, mask)
            updates, opt_state = opt.update(grads, opt_state, state_b)
            state_b = optax.apply_updates(state_b, updates)
            return (state_b, opt_state), per_clip

        (state_b, opt_state), hist = jax.lax.scan(
            one_step, (state_b, opt_state), None, length=num_steps)
        return state_b, opt_state, hist

    out_sh = (sh["state"], None, NamedSharding(mesh, P(None, clip_axis)))
    extra_sh = (NamedSharding(mesh, P(clip_axis, f)) if phase == "skate"
                else sh["replicated"])
    zero_extra = jnp.zeros((), jnp.float32)
    sdf_sh = (jax.tree.map(
        lambda _: NamedSharding(mesh, P(clip_axis, f)),
        SdfLin(s0=0, g=0, v0=0)) if with_sdf else None)

    # ONE jitted program covers all four (use_grid x with_sdf)
    # variants: None is a valid (empty) pytree argument with a None
    # sharding spec, so the absent grid/sdf slots simply carry None —
    # no per-variant wrapper duplication
    grid_sharding = (jax.tree.map(
        lambda _: NamedSharding(mesh, P(clip_axis)), grid_b)
        if use_grid else None)
    jitted = jax.jit(
        phase_scan,
        in_shardings=(sh["replicated"], sh["scene"], grid_sharding,
                      sdf_sh, sh["state"], None, sh["target"],
                      sh["weights"], extra_sh),
        out_shardings=out_sh)

    def step_fn(state_b, opt_state, target_b, weights_b,
                scene_b, extra_b=None, grid=None, sdf_b=None):
        if use_grid and grid is None:
            # no silent fallback to the build-time grid_b: a closure
            # default would pin that candidate-table snapshot (tens
            # of MB of device HBM) for the lifetime of the cached
            # step program
            raise ValueError("grid-mode step_fn requires grid=...")
        return jitted(solver.ctx, scene_b,
                      grid if use_grid else None,
                      sdf_b if with_sdf else None,
                      state_b, opt_state, target_b, weights_b,
                      zero_extra if extra_b is None else extra_b)

    def init_fn(state_b):
        return opt.init(state_b)

    return step_fn, init_fn


def build_sharded_sdf_refresh(solver: ClipSolver, mesh: Mesh,
                              clip_axis: str = "clips",
                              frame_axis: Optional[str] = "frames"):
    """Batched SDF linearization at the current contact vertices:
    state_b -> SdfLin with a leading clip axis (sharded twin of
    ClipSolver._refresh_sdf; the shared solver.sdf grid applies to
    every clip). Run between scan chunks, never inside them."""
    from fpv4d.solve.clip_solve import forward_world
    from fpv4d.ops import sdf as SDFM

    sh = clip_batch_shardings(mesh, clip_axis, frame_axis)
    f = frame_axis if (frame_axis and frame_axis in mesh.axis_names) \
        else None

    def batched(ctx_base, sdf, state_b):
        def one(state):
            ctx = Ctx(model=ctx_base.model, vposer=ctx_base.vposer,
                      scene=ctx_base.scene)
            verts_w, _, _ = forward_world(
                ctx, state, vertex_subset=solver.contact_vids,
                prune=solver._contact_prune)
            return SDFM.linearize(sdf, verts_w)
        return jax.vmap(one)(state_b)

    out_sh = jax.tree.map(
        lambda _: NamedSharding(mesh, P(clip_axis, f)),
        SdfLin(s0=0, g=0, v0=0))
    jitted = jax.jit(batched,
                     in_shardings=(sh["replicated"], sh["replicated"],
                                   sh["state"]),
                     out_shardings=out_sh)

    def run(state_b):
        return jax.lax.stop_gradient(
            jitted(solver.ctx, solver.sdf, state_b))
    return run


def _skate_mask() -> ClipState:
    return ClipState(body_6d=1.0, scale=0.0, camera_ext=0.0, c_dct=0.0)


def _grid_in_axes(grid_b):
    """vmap in_axes for the per-clip grid argument: VoxelGrid has its
    own static-aux spec; a batched FrameCands table maps axis 0 on
    every leaf."""
    from fpv4d.ops import nn as NN
    if isinstance(grid_b, NN.VoxelGrid):
        return NN.grid_axes(grid_b)
    return jax.tree.map(lambda _: 0, grid_b)


def build_sharded_refresh(solver: ClipSolver, mesh: Mesh,
                          clip_axis: str = "clips",
                          frame_axis: Optional[str] = "frames",
                          grid_b=None, dct_windows: Optional[int] = None):
    """Batched lazy-contact candidate refresh: (state_b, scene_b) ->
    FrameCands with a leading clip axis (the sharded equivalent of
    ClipSolver._refresh_cands, run between scan chunks)."""
    from fpv4d.ops import nn as NN
    from fpv4d.solve.clip_solve import forward_world

    sh = clip_batch_shardings(mesh, clip_axis, frame_axis)
    budget = solver.config.contact_cell_budget
    compact = solver.config.contact_compact
    grid_ax = _grid_in_axes(grid_b)
    # one-device mesh: fold clips into frames — the clips-vmapped
    # refresh pays a batched row gather from per-clip tables (~6x the
    # per-clip single cost, BENCH r5 attribution); the folded form
    # offsets cell ids into the concatenated tables and recovers the
    # single-clip gather lowering (NN.frame_candidates_folded)
    fold = (mesh.devices.size == 1
            and isinstance(grid_b, NN.VoxelGrid))

    def batched(ctx_base, scene_b, grid_arg, state_b):
        if fold:
            C, T = state_b.body_6d.shape[:2]
            st_flat = _flatten_state(state_b)
            verts_flat, _, _ = forward_world(
                ctx_base, st_flat, vertex_subset=solver.contact_vids,
                prune=solver._contact_prune)
            fc = NN.frame_candidates_folded(grid_arg, verts_flat, C,
                                            budget)
            if compact:
                fc = NN.compact_candidates(verts_flat, fc, compact)
            return NN.FrameCands(
                cand=fc.cand.reshape((C, T) + fc.cand.shape[1:]),
                valid=fc.valid.reshape((C, T) + fc.valid.shape[1:]))

        def one(scene, grid_c, state):
            ctx = Ctx(model=ctx_base.model, vposer=ctx_base.vposer,
                      scene=scene, grid=grid_c)
            verts_w, _, _ = forward_world(
                ctx, state, vertex_subset=solver.contact_vids,
                prune=solver._contact_prune)
            fc = NN.frame_candidates(grid_c, verts_w, budget)
            if compact:
                fc = NN.compact_candidates(verts_w, fc, compact)
            return fc

        return jax.vmap(one, in_axes=(0, grid_ax, 0))(
            scene_b, grid_arg, state_b)

    grid_sharding = jax.tree.map(
        lambda _: NamedSharding(mesh, P(clip_axis)), grid_b)
    out_sh = jax.tree.map(
        lambda _: NamedSharding(mesh, P(clip_axis)),
        NN.FrameCands(cand=0, valid=0))
    jitted = jax.jit(batched,
                     in_shardings=(sh["replicated"], sh["scene"],
                                   grid_sharding, sh["state"]),
                     out_shardings=out_sh)

    def run(state_b, scene_b, grid=None):
        return jax.lax.stop_gradient(
            jitted(solver.ctx, scene_b,
                   grid_b if grid is None else grid, state_b))
    return run


def build_sharded_detect_contact(solver: ClipSolver, mesh: Mesh,
                                 clip_axis: str = "clips",
                                 frame_axis: Optional[str] = "frames",
                                 grid_b=None,
                                 dct_windows: Optional[int] = None):
    """Batched planted-foot weights: [C] clips -> weight_right [C, T]
    (per-clip ClipSolver.detect_contact, sharded over the mesh)."""
    from fpv4d.ops import nn as NN
    from fpv4d.core import transforms as _  # noqa: F401 (doc parity)
    from fpv4d.ops import losses as L
    from fpv4d.solve.clip_solve import forward_world

    sh = clip_batch_shardings(mesh, clip_axis, frame_axis)
    use_grid = grid_b is not None and solver.nn_impl == "grid"
    n_left = len(solver.contact_vids_left)
    feet = np.concatenate([solver.contact_vids_left,
                           solver.contact_vids_right])
    f = frame_axis if (frame_axis and frame_axis in mesh.axis_names) \
        else None

    def per_clip(ctx, state):
        verts_w, _, _ = forward_world(ctx, state, vertex_subset=feet,
                                      prune=solver._feet_prune)
        d_l = jnp.mean(solver._nn(verts_w[:, :n_left], ctx.scene,
                                  ctx.grid), axis=1)
        d_r = jnp.mean(solver._nn(verts_w[:, n_left:], ctx.scene,
                                  ctx.grid), axis=1)
        return L.planted_foot_weight(d_l, d_r)

    def batched(ctx_base, scene_b, grid_arg, state_b):
        if use_grid:
            def one(scene, grid_c, state):
                return per_clip(Ctx(model=ctx_base.model,
                                    vposer=ctx_base.vposer,
                                    scene=scene, grid=grid_c), state)
            return jax.vmap(one, in_axes=(0, NN.grid_axes(grid_arg), 0))(
                scene_b, grid_arg, state_b)

        def one(scene, state):
            return per_clip(Ctx(model=ctx_base.model,
                                vposer=ctx_base.vposer, scene=scene),
                            state)
        return jax.vmap(one)(scene_b, state_b)

    out_sh = NamedSharding(mesh, P(clip_axis, f))
    if use_grid:
        grid_sharding = jax.tree.map(
            lambda _: NamedSharding(mesh, P(clip_axis)), grid_b)
        jitted = jax.jit(batched,
                         in_shardings=(sh["replicated"], sh["scene"],
                                       grid_sharding, sh["state"]),
                         out_shardings=out_sh)

        def run(state_b, scene_b, grid=None):
            return jax.lax.stop_gradient(
                jitted(solver.ctx, scene_b,
                       grid_b if grid is None else grid, state_b))
    else:
        def no_grid(ctx_base, scene_b, state_b):
            return batched(ctx_base, scene_b, None, state_b)

        jitted = jax.jit(no_grid,
                         in_shardings=(sh["replicated"], sh["scene"],
                                       sh["state"]),
                         out_shardings=out_sh)

        def run(state_b, scene_b, grid=None):
            return jax.lax.stop_gradient(
                jitted(solver.ctx, scene_b, state_b))
    return run


def shard_batch(mesh: Mesh, state_b: ClipState, target_b, weights_b,
                scene_b, clip_axis: str = "clips",
                frame_axis: Optional[str] = "frames"):
    """Device-put a batched clip problem with the standard shardings
    (c_dct window axis sharded when it divides the frame axis)."""
    W = state_b.c_dct.shape[1]
    sh = clip_batch_shardings(mesh, clip_axis, frame_axis,
                              dct_windows=W)
    return (jax.device_put(state_b, sh["state"]),
            jax.device_put(target_b, sh["target"]),
            jax.device_put(weights_b, sh["weights"]),
            jax.device_put(scene_b, sh["scene"]))
