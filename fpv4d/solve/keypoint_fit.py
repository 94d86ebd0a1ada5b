"""SMPLify-X-style fitting from 2D keypoints (reference X12).

The reference outsources pipeline step 3 to the external smplifyx
repo ("may take up to several hours" per clip, README.md:14-17,
--focal_length 694 per README.md:16). This module owns that capability
TPU-natively: a staged perspective-reprojection fit of SMPL-X
parameters to OpenPose BODY_25 keypoints, vmapped over ALL frames of a
clip simultaneously — hundreds of per-frame problems advance per
compiled Adam step instead of one frame at a time.

Stages (classic SMPLify-X schedule):
  1. camera: depth init from torso size, then global_orient +
     camera_translation on torso joints only;
  2. body: + VPoser latent and betas, full-body robust reprojection;
  3. all: + hand PCA coefficients, all priors.

Losses: Geman-McClure robust reprojection (confidence-weighted),
VPoser latent L2, betas L2, hand-PCA L2.

Output: [T, 75] canonical parameter vectors (fpv4d.models.params
layout) with transl = 0 and the camera offset in camera_translation —
the same convention the reference's body_gen pkls use downstream
(vis.py:305-361 renders with camera at camera_translation).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from fpv4d.config import KeypointFitConfig
from fpv4d.models import params as P
from fpv4d.models import vposer as VP
from fpv4d.models.smplx import SmplxModel

# BODY_25 slot <- SMPL-X skeleton joint (-1 = no correspondence; ears,
# heels and small toes have no skeleton joint and get weight 0).
BODY25_FROM_SMPLX = np.array([
    22,   # 0  nose        <- jaw (closest skeleton joint)
    12,   # 1  neck
    17,   # 2  RShoulder
    19,   # 3  RElbow
    21,   # 4  RWrist
    16,   # 5  LShoulder
    18,   # 6  LElbow
    20,   # 7  LWrist
    0,    # 8  MidHip      <- pelvis
    2,    # 9  RHip
    5,    # 10 RKnee
    8,    # 11 RAnkle
    1,    # 12 LHip
    4,    # 13 LKnee
    7,    # 14 LAnkle
    24,   # 15 REye
    23,   # 16 LEye
    -1,   # 17 REar
    -1,   # 18 LEar
    10,   # 19 LBigToe     <- left_foot
    -1,   # 20 LSmallToe
    -1,   # 21 LHeel
    11,   # 22 RBigToe     <- right_foot
    -1,   # 23 RSmallToe
    -1,   # 24 RHeel
], dtype=np.int32)

TORSO_BODY25 = np.array([1, 2, 5, 8, 9, 12], dtype=np.int32)

# OpenPose hand-21 slot <- SMPL-X hand joint, per side. OpenPose hand
# layout: 0 wrist, then 4 per finger (thumb 1-4, index 5-8, middle
# 9-12, ring 13-16, pinky 17-20; the 4th of each is the fingertip,
# which has no SMPL-X joint). SMPL-X hand joints (15/side) are ordered
# index1-3, middle1-3, pinky1-3, ring1-3, thumb1-3 (left: 25-39,
# right: 40-54).
_HAND21_SLOTS = np.array([5, 6, 7, 9, 10, 11, 17, 18, 19, 13, 14, 15,
                          1, 2, 3], dtype=np.int32)
LHAND_SMPLX = np.arange(25, 40, dtype=np.int32)
RHAND_SMPLX = np.arange(40, 55, dtype=np.int32)


class FitVars(NamedTuple):
    """Per-frame decision variables."""
    global_orient: jnp.ndarray     # [3]
    camera_translation: jnp.ndarray  # [3]
    betas: jnp.ndarray             # [10]
    latent: jnp.ndarray            # [32] VPoser
    left_hand: jnp.ndarray         # [12]
    right_hand: jnp.ndarray        # [12]
    jaw: jnp.ndarray               # [3]
    expression: jnp.ndarray        # [10]


def gmof(x: jnp.ndarray, rho: float) -> jnp.ndarray:
    """Geman-McClure robustifier rho^2 * d/(d + rho^2), d = x^2."""
    d = x ** 2
    return rho ** 2 * d / (d + rho ** 2)


def gmof_sq(d: jnp.ndarray, rho: float) -> jnp.ndarray:
    """gmof on an already-squared residual (grad-safe at 0: no sqrt)."""
    return rho ** 2 * d / (d + rho ** 2)


def project(points_cam: jnp.ndarray, focal: float,
            center: jnp.ndarray) -> jnp.ndarray:
    """Perspective projection [..., 3] -> [..., 2] pixels."""
    z = jnp.maximum(points_cam[..., 2:3], 1e-4)
    return focal * points_cam[..., :2] / z + center


def _stage_mask(camera=False, body=False, hands=False,
                face=False) -> FitVars:
    return FitVars(global_orient=float(camera),
                   camera_translation=float(camera),
                   betas=float(body), latent=float(body),
                   left_hand=float(hands), right_hand=float(hands),
                   jaw=float(face), expression=float(face))


def init_camera_translation(keypoints: jnp.ndarray, rest_joints: jnp.ndarray,
                            focal: float) -> jnp.ndarray:
    """Depth-from-torso init: z ~= focal * torso_height_3d /
    torso_height_2d (the standard SMPLify(-X) camera bootstrap).
    keypoints [T, 25, 3]; rest_joints [55, 3] of the rest body."""
    smplx_ids = BODY25_FROM_SMPLX[TORSO_BODY25]
    torso3d = rest_joints[smplx_ids]
    h3d = jnp.linalg.norm(torso3d.max(0) - torso3d.min(0))
    torso2d = keypoints[..., TORSO_BODY25, :2]
    conf = keypoints[..., TORSO_BODY25, 2:3]
    span = ((torso2d * (conf > 0)).max(-2)
            - (torso2d * (conf > 0)).min(-2))
    h2d = jnp.maximum(jnp.linalg.norm(span, axis=-1), 1.0)
    z = focal * h3d / h2d
    return jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], axis=-1)


def fit_keypoints(model: SmplxModel, vposer_params: Dict[str, jnp.ndarray],
                  keypoints: jnp.ndarray,
                  config: KeypointFitConfig = KeypointFitConfig(),
                  hand_left: Optional[np.ndarray] = None,
                  hand_right: Optional[np.ndarray] = None,
                  face: Optional[np.ndarray] = None,
                  mesh=None
                  ) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Fit SMPL-X to OpenPose keypoints for a whole clip at once.

    keypoints [T, 25, 3] (x, y, confidence) BODY_25 pixels;
    hand_left/hand_right optional [T, 21, 3] OpenPose hand keypoints —
    when given, the 'all' stage adds hand-joint reprojection so the
    PCA coefficients are data-driven (the external smplifyx stage fits
    hands/face the same way, README.md:12; utils/openpose_call.py:6-8
    passes --face --hand to OpenPose).
    face: optional [T, 70, 3] OpenPose face keypoints — the 51
    internal landmarks (slots 17:68) drive jaw_pose + expression in
    the 'all' stage through the model's barycentric face-landmark
    embedding (SMPLify-X's expression fitting). Requires the model to
    carry lmk_faces_idx/lmk_bary_coords (official artifact keys).
    Returns ([T, 75] canonical params, history dict). jaw/expression
    are returned in the history dict under 'jaw'/'expression' (the
    75-d canonical layout has no face slots, matching the reference
    pkl contract).

    FLEET SHAPE (r4): keypoints may carry a leading clips axis
    [C, T, 25, 3] (hands/face likewise [C, T, ...]) — the stage
    programs are then vmapped over clips, so one compiled Adam/L-BFGS
    step advances every frame of every clip. Loss normalization and
    optimizer state stay PER CLIP (vmap lanes), so batched results
    equal a per-clip loop exactly (modulo f32 summation order;
    tests/test_keypoint_fit.py). The reference runs this stage one
    clip at a time for "several hours" (README.md:14-17).
    mesh: optional jax.sharding.Mesh — shards the clips axis over
    mesh.axis_names[0] (C divisible by that axis size), turning the
    vmap into a data-parallel fleet step.
    """
    if (config.optimizer == "lbfgs_perframe"
            and jax.default_backend() == "tpu"
            and not config.allow_slow_perframe):
        # Measured on v5e (tools/kp_bench.py, T=900): 22 frames/s —
        # ~2x slower than 'lbfgs' (46 f/s) at essentially identical
        # recovery (18.0 vs 17.4 mm MPJPE). Opt in explicitly if the
        # per-frame curvature form is really wanted on TPU.
        raise ValueError(
            "optimizer='lbfgs_perframe' is ~2x slower than 'lbfgs' on "
            "TPU at equal recovery (22 vs 46 frames/s measured at "
            "T=900); use optimizer='lbfgs', or set "
            "allow_slow_perframe=True to override.")
    batched = keypoints.ndim == 4
    lead = tuple(keypoints.shape[:-2])       # (T,) or (C, T)
    T = lead[-1]
    keypoints = jnp.asarray(keypoints, dtype=jnp.float32)
    # fold hand keypoints into one [*lead, 25+15+15, 3] target array
    # with per-joint smplx ids; missing hands contribute zero
    # confidence
    hand_targets = []
    hand_ids = []
    for kp_h, ids in ((hand_left, LHAND_SMPLX),
                      (hand_right, RHAND_SMPLX)):
        if kp_h is not None:
            hand_targets.append(np.asarray(kp_h, np.float32)
                                [..., _HAND21_SLOTS, :])
            hand_ids.append(ids)
    center = jnp.asarray([config.image_size[0] / 2.0,
                          config.image_size[1] / 2.0], dtype=jnp.float32)
    focal = config.focal_length

    valid = BODY25_FROM_SMPLX >= 0
    ids_np = np.where(valid, BODY25_FROM_SMPLX, 0)
    w_np = valid.astype(np.float32)
    torso_np = np.zeros(25, np.float32)
    torso_np[TORSO_BODY25] = 1.0
    torso_np *= w_np
    kp_all = np.asarray(keypoints)
    if hand_targets:
        kp_all = np.concatenate([kp_all] + hand_targets, axis=-2)
        ids_np = np.concatenate([ids_np] + hand_ids)
        n_hand = sum(len(i) for i in hand_ids)
        w_np = np.concatenate([w_np, np.ones(n_hand, np.float32)])
        torso_np = np.concatenate([torso_np, np.zeros(n_hand,
                                                      np.float32)])
        # body-stage weights exclude hands (fitted only in 'all')
    body_np = w_np.copy()
    if hand_targets:
        body_np[25:] = 0.0
    keypoints = jnp.asarray(kp_all, dtype=jnp.float32)
    smplx_ids = jnp.asarray(ids_np)
    base_w = jnp.asarray(w_np)
    body_w = jnp.asarray(body_np)
    torso_only = jnp.asarray(torso_np)

    # face landmarks: static barycentric embedding -> a tiny vertex
    # subset is skinned only when face fitting is active
    lmk = model.landmark_vertex_subset() if face is not None else None
    use_face = lmk is not None
    if use_face:
        lmk_vids, lmk_tri, lmk_bary = lmk
        face_kp = jnp.asarray(
            np.asarray(face, np.float32)[..., 17:68, :])
    else:
        face_kp = jnp.zeros(lead + (1, 3), dtype=jnp.float32)
    # the reprojection loss reads ONLY the 55 joints unless face
    # landmarks are fitted (joints regress from the composed
    # j_regressor tables, not the skinned mesh) — restrict skinning to
    # one dummy vertex and the per-step pose-blendshape/LBS work drops
    # by ~10^4 (the reference's smplifyx always skins the full mesh)
    skin_subset = lmk_vids if use_face else np.zeros(1, np.int32)

    rest = model(betas=jnp.zeros((1, model.num_betas)),
                 global_orient=jnp.zeros((1, 3)),
                 body_pose=jnp.zeros((1, 63)))
    cam_t0 = init_camera_translation(keypoints, rest["joints"][0], focal)

    vars0 = FitVars(
        global_orient=jnp.zeros(lead + (3,)),
        camera_translation=cam_t0,
        betas=jnp.zeros(lead + (model.num_betas,)),
        latent=jnp.zeros(lead + (32,)),
        left_hand=jnp.zeros(lead + (model.num_pca,)),
        right_hand=jnp.zeros(lead + (model.num_pca,)),
        jaw=jnp.zeros(lead + (3,)),
        expression=jnp.zeros(lead + (model.num_expr,)),
    )

    def reproj_loss(model, vposer_params, kp, face_kp, v: FitVars,
                    joint_w: jnp.ndarray, face_w) -> jnp.ndarray:
        pose63 = VP.decode(vposer_params, v.latent)
        out = model(betas=v.betas, global_orient=v.global_orient,
                    body_pose=pose63, left_hand_pose=v.left_hand,
                    right_hand_pose=v.right_hand, jaw_pose=v.jaw,
                    expression=v.expression, vertex_subset=skin_subset)
        j_cam = out["joints"] + v.camera_translation[:, None, :]
        j2d = project(jnp.take(j_cam, smplx_ids, axis=1), focal, center)
        resid_sq = jnp.sum((j2d - kp[..., :2]) ** 2, axis=-1)
        conf = kp[..., 2]
        w = conf * joint_w[None, :]
        num = jnp.sum(w * gmof_sq(resid_sq, config.gmof_rho))
        den = jnp.sum(w)
        if use_face:
            # landmarks = bary-weighted corners of the embedded tris
            tri_pts = out["vertices"][:, lmk_tri]       # [T, 51, 3, 3]
            lmk_cam = jnp.einsum("lk,tlkc->tlc",
                                 jnp.asarray(lmk_bary), tri_pts) \
                + v.camera_translation[:, None, :]
            l2d = project(lmk_cam, focal, center)
            lresid = jnp.sum((l2d - face_kp[..., :2]) ** 2, axis=-1)
            wl = face_kp[..., 2] * face_w
            num = num + jnp.sum(wl * gmof_sq(lresid, config.gmof_rho))
            den = den + jnp.sum(wl)
        return num / (den + 1e-6)

    def total_loss(model, vposer_params, kp, face_kp, v: FitVars,
                   joint_w: jnp.ndarray, face_w) -> jnp.ndarray:
        return (config.weight_reproj
                * reproj_loss(model, vposer_params, kp, face_kp, v,
                              joint_w, face_w)
                + config.weight_vposer * jnp.mean(v.latent ** 2)
                + config.weight_shape * jnp.mean(v.betas ** 2)
                + config.weight_hand * (jnp.mean(v.left_hand ** 2)
                                        + jnp.mean(v.right_hand ** 2))
                + config.weight_expr * jnp.mean(v.expression ** 2)
                + config.weight_jaw * jnp.mean(v.jaw ** 2))

    opt = optax.adam(config.lr)

    # model/vposer/keypoints ride through the jit boundary as traced
    # arguments, never closure constants (TPU compile-time killer).
    # The stage mask is also TRACED so all three stages share ONE
    # compiled program — baking masks statically (which would let XLA
    # prune per-stage backwards) was measured a net loss: three
    # per-call retraces cost far more than the pruned backward saved
    # (bench keypoint fit 239 -> 125 frames/s).
    def run_stage(model, vposer_params, kp, face_kp, v, opt_state,
                  joint_w, face_w, mask):
        def step(carry, _):
            v, opt_state = carry
            loss, g = jax.value_and_grad(total_loss, argnums=4)(
                model, vposer_params, kp, face_kp, v, joint_w, face_w)
            g = jax.tree.map(lambda gi, m: gi * m, g, mask)
            updates, opt_state = opt.update(g, opt_state, v)
            v = optax.apply_updates(v, updates)
            return (v, opt_state), loss

        (v, opt_state), hist = jax.lax.scan(step, (v, opt_state), None,
                                            length=config.num_iter)
        return v, opt_state, hist

    # L-BFGS stages (the reference's smplifyx optimizer family). Two
    # variants, both with stage masks freezing variables INSIDE the
    # objective via a stop_gradient splice — the masked-gradients-
    # outside-the-objective form made the zoom linesearch diverge
    # (round-2 negative result, now root-caused):
    #   'lbfgs'          — joint-batch: ONE curvature memory and
    #     linesearch over the summed objective, exactly like torch
    #     LBFGS in smplifyx. Runs at scan speed on TPU.
    #   'lbfgs_perframe' — vmapped per-frame: each ~83-dim frame
    #     problem gets its own memory and step size. Slightly better
    #     recovery per iteration. Uses a BOUNDED backtracking
    #     linesearch instead of zoom: the vmapped zoom while-loops ran
    #     until the LAST lane converged (measured 58x slower than Adam
    #     on TPU, 5 frames/s at T=900 — r3); backtracking caps every
    #     lane at max_backtracking_steps trials, which vectorizes.
    lbfgs = optax.lbfgs(memory_size=config.lbfgs_memory)
    lbfgs_pf = optax.lbfgs(
        memory_size=config.lbfgs_memory,
        linesearch=optax.scale_by_backtracking_linesearch(
            max_backtracking_steps=15, store_grad=True))

    def run_stage_lbfgs_joint(model, vposer_params, kp, face_kp, v,
                              joint_w, face_w, mask):
        def loss_fn(p):
            pm = jax.tree.map(
                lambda x, m: x * m + jax.lax.stop_gradient(x) * (1.0 - m),
                p, mask)
            return total_loss(model, vposer_params, kp, face_kp, pm,
                              joint_w, face_w)

        vg = optax.value_and_grad_from_state(loss_fn)

        def step(carry, _):
            p, st = carry
            value, grad = vg(p, state=st)
            updates, st = lbfgs.update(grad, st, p, value=value,
                                       grad=grad, value_fn=loss_fn)
            return (optax.apply_updates(p, updates), st), value

        (p, _), h = jax.lax.scan(step, (v, lbfgs.init(v)), None,
                                 length=config.num_iter)
        return p, h

    def run_stage_lbfgs_perframe(model, vposer_params, kp, face_kp, v,
                                 joint_w, face_w, mask):
        def fit_one(v_t, kp_t, fk_t):
            def loss_fn(p):
                p1 = jax.tree.map(lambda x: x[None], p)
                p1 = jax.tree.map(
                    lambda x, m: x * m
                    + jax.lax.stop_gradient(x) * (1.0 - m), p1, mask)
                return total_loss(model, vposer_params, kp_t[None],
                                  fk_t[None], p1, joint_w, face_w)

            vg = optax.value_and_grad_from_state(loss_fn)

            def step(carry, _):
                p, st = carry
                value, grad = vg(p, state=st)
                updates, st = lbfgs_pf.update(grad, st, p, value=value,
                                              grad=grad,
                                              value_fn=loss_fn)
                return (optax.apply_updates(p, updates), st), value

            (p, _), h = jax.lax.scan(step, (v_t, lbfgs_pf.init(v_t)),
                                     None, length=config.num_iter)
            return p, h

        v_out, h = jax.vmap(fit_one)(v, kp, face_kp)
        return v_out, jnp.mean(h, axis=0)

    # batched (fleet) form: vmap each stage program over the clips
    # axis — per-clip loss normalization / optimizer state / history,
    # one compiled program advancing C*T frame problems per step
    if batched:
        run_stage = jax.jit(jax.vmap(
            run_stage, in_axes=(None, None, 0, 0, 0, 0, None, None,
                                None)))
        lb_axes = (None, None, 0, 0, 0, None, None, None)
        run_stage_lbfgs_joint = jax.jit(jax.vmap(
            run_stage_lbfgs_joint, in_axes=lb_axes))
        run_stage_lbfgs_perframe = jax.jit(jax.vmap(
            run_stage_lbfgs_perframe, in_axes=lb_axes))
    else:
        run_stage = jax.jit(run_stage)
        run_stage_lbfgs_joint = jax.jit(run_stage_lbfgs_joint)
        run_stage_lbfgs_perframe = jax.jit(run_stage_lbfgs_perframe)

    v = vars0
    # vmapped init when batched so EVERY optimizer-state leaf (incl.
    # adam's step count) carries the clips axis the vmapped stage
    # expects
    opt_state = jax.vmap(opt.init)(v) if batched else opt.init(v)
    if batched and mesh is not None:
        # data-parallel fleet: shard the clips axis; jit propagates
        # the sharding through the scan (clips never interact)
        from jax.sharding import NamedSharding, PartitionSpec
        s = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        put = lambda x: jax.device_put(x, s)  # noqa: E731
        keypoints = put(keypoints)
        face_kp = put(face_kp)
        v = jax.tree.map(put, v)
        opt_state = jax.tree.map(put, opt_state)
    hist = {}
    schedule = [
        ("camera", torso_only, 0.0, _stage_mask(camera=True)),
        ("body", body_w, 0.0, _stage_mask(camera=True, body=True)),
        ("all", base_w, 1.0 if use_face else 0.0,
         _stage_mask(camera=True, body=True, hands=True,
                     face=use_face)),
    ][: config.stages]
    for name, joint_w, face_w, mask in schedule:
        if config.optimizer == "lbfgs":
            v, h = run_stage_lbfgs_joint(model, vposer_params,
                                         keypoints, face_kp, v,
                                         joint_w,
                                         jnp.asarray(face_w,
                                                     jnp.float32),
                                         mask)
        elif config.optimizer == "lbfgs_perframe":
            v, h = run_stage_lbfgs_perframe(
                model, vposer_params, keypoints, face_kp, v, joint_w,
                jnp.asarray(face_w, jnp.float32), mask)
        else:
            v, opt_state, h = run_stage(model, vposer_params,
                                        keypoints, face_kp, v,
                                        opt_state, joint_w,
                                        jnp.asarray(face_w, jnp.float32),
                                        mask)
        hist[name] = np.asarray(h)

    out = jnp.concatenate([
        jnp.zeros(lead + (3,)),            # transl (camera holds offset)
        v.global_orient, v.betas, v.latent, v.left_hand, v.right_hand,
        v.camera_translation], axis=-1)
    hist["jaw"] = np.asarray(v.jaw)
    hist["expression"] = np.asarray(v.expression)
    return np.asarray(out), hist
