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

from fpv4d.solve.clip_solve import ClipSolver, ClipState, Ctx


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
                         frame_axis: Optional[str] = "frames"):
    """NamedShardings for a batched clip problem.

    Batched layout (leading clip axis C, then frame axis T):
      body_6d     [C, T, 78]    -> P(clips, frames)
      scale       [C]           -> P(clips)
      camera_ext  [C, T, 4, 4]  -> P(clips, frames)
      c_dct       [C, W, ...]   -> P(clips)  (windows stay whole)
      target_6d   [C, T, 78]    -> P(clips, frames)
      weights     [C, T]        -> P(clips, frames)
      scene       [C, M, 3]     -> P(clips)
    """
    f = frame_axis if (frame_axis and frame_axis in mesh.axis_names) \
        else None
    state = ClipState(
        body_6d=NamedSharding(mesh, P(clip_axis, f)),
        scale=NamedSharding(mesh, P(clip_axis)),
        camera_ext=NamedSharding(mesh, P(clip_axis, f)),
        c_dct=NamedSharding(mesh, P(clip_axis)),
    )
    return dict(
        state=state,
        target=NamedSharding(mesh, P(clip_axis, f)),
        weights=NamedSharding(mesh, P(clip_axis, f)),
        scene=NamedSharding(mesh, P(clip_axis)),
        replicated=NamedSharding(mesh, P()),
    )


def build_sharded_step(solver: ClipSolver, mesh: Mesh, phase: str = "local_a",
                       clip_axis: str = "clips",
                       frame_axis: Optional[str] = "frames",
                       grid_b=None):
    """One full training step (loss -> grad -> Adam update) of the
    clip solve, batched over clips and jitted over the mesh with 2-D
    (clips x frames) shardings. XLA inserts the halo exchanges for the
    temporal-difference terms and keeps everything else local.

    grid_b: optional batched VoxelGrid (fpv4d.ops.nn.build_voxel_grid_batch,
    leading clip axis) — enables the voxel-accelerated contact path
    per clip; without it the contact term uses brute XLA NN.

    Returns (step_fn, init_fn):
      init_fn(state_batch) -> opt_state (sharded like the state)
      step_fn(state, opt_state, target, weights, scene) ->
          (state', opt_state', loss [C])
    """
    from fpv4d.ops import nn as NN

    sh = clip_batch_shardings(mesh, clip_axis, frame_axis)
    opt = solver._opt
    mask = solver.phase_mask(phase)
    use_grid = grid_b is not None and solver.nn_impl == "grid"

    def batched_loss(ctx_base, scene_b, grid_b, state_b, target_b,
                     weights_b):
        # per-clip scene/grid ride the vmapped axes; the shared model
        # tables broadcast (in_axes=None leaves)
        if use_grid:
            def per_clip(scene, grid_c, state, target, weights):
                ctx = Ctx(model=ctx_base.model, vposer=ctx_base.vposer,
                          scene=scene, grid=grid_c)
                return solver.phase_loss(phase, state, target, weights,
                                         ctx)

            losses = jax.vmap(
                per_clip,
                in_axes=(0, NN.grid_axes(grid_b), 0, 0, 0))(
                    scene_b, grid_b, state_b, target_b, weights_b)
        else:
            def per_clip(scene, state, target, weights):
                ctx = Ctx(model=ctx_base.model, vposer=ctx_base.vposer,
                          scene=scene)
                return solver.phase_loss(phase, state, target, weights,
                                         ctx)

            losses = jax.vmap(per_clip)(scene_b, state_b, target_b,
                                        weights_b)
        return jnp.sum(losses), losses

    def _update(grads, opt_state, state_b):
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        updates, opt_state = opt.update(grads, opt_state, state_b)
        return optax.apply_updates(state_b, updates), opt_state

    out_sh = (sh["state"], None, NamedSharding(mesh, P(clip_axis)))

    if use_grid:
        def step(ctx_base, scene_b, grid_arg, state_b, opt_state,
                 target_b, weights_b):
            (_, per_clip), grads = jax.value_and_grad(
                batched_loss, argnums=3, has_aux=True)(
                    ctx_base, scene_b, grid_arg, state_b, target_b,
                    weights_b)
            state_b, opt_state = _update(grads, opt_state, state_b)
            return state_b, opt_state, per_clip

        grid_sharding = jax.tree.map(
            lambda _: NamedSharding(mesh, P(clip_axis)), grid_b)
        jitted = jax.jit(
            step,
            in_shardings=(sh["replicated"], sh["scene"], grid_sharding,
                          sh["state"], None, sh["target"], sh["weights"]),
            out_shardings=out_sh)

        def step_fn(state_b, opt_state, target_b, weights_b, scene_b):
            return jitted(solver.ctx, scene_b, grid_b, state_b,
                          opt_state, target_b, weights_b)
    else:
        def step(ctx_base, scene_b, state_b, opt_state, target_b,
                 weights_b):
            (_, per_clip), grads = jax.value_and_grad(
                batched_loss, argnums=3, has_aux=True)(
                    ctx_base, scene_b, None, state_b, target_b,
                    weights_b)
            state_b, opt_state = _update(grads, opt_state, state_b)
            return state_b, opt_state, per_clip

        jitted = jax.jit(
            step,
            in_shardings=(sh["replicated"], sh["scene"], sh["state"],
                          None, sh["target"], sh["weights"]),
            out_shardings=out_sh)

        def step_fn(state_b, opt_state, target_b, weights_b, scene_b):
            return jitted(solver.ctx, scene_b, state_b, opt_state,
                          target_b, weights_b)

    def init_fn(state_b):
        return opt.init(state_b)

    return step_fn, init_fn


def shard_batch(mesh: Mesh, state_b: ClipState, target_b, weights_b,
                scene_b, clip_axis: str = "clips",
                frame_axis: Optional[str] = "frames"):
    """Device-put a batched clip problem with the standard shardings."""
    sh = clip_batch_shardings(mesh, clip_axis, frame_axis)
    return (jax.device_put(state_b, sh["state"]),
            jax.device_put(target_b, sh["target"]),
            jax.device_put(weights_b, sh["weights"]),
            jax.device_put(scene_b, sh["scene"]))
