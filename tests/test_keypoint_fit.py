"""Keypoint (SMPLify-X style) fitting: recover synthetic ground truth
from its own 2D projections."""
import numpy as np
import jax.numpy as jnp
import pytest

from fpv4d.config import KeypointFitConfig
from fpv4d.models import vposer as VP
from fpv4d.models import smplx as jsmplx
from fpv4d.solve import keypoint_fit as KF


@pytest.fixture(scope="module")
def setup():
    model = jsmplx.synthetic_model(num_verts=256, seed=3)
    vp = VP.random_params(seed=3)
    rng = np.random.RandomState(4)
    T = 4
    gt = dict(
        global_orient=jnp.asarray(rng.randn(T, 3) * 0.1, jnp.float32),
        latent=jnp.asarray(rng.randn(T, 32) * 0.3, jnp.float32),
        betas=jnp.asarray(np.tile(rng.randn(1, 10) * 0.2, (T, 1)),
                          jnp.float32),
        cam_t=jnp.asarray(
            np.stack([rng.randn(T) * 0.1, rng.randn(T) * 0.1,
                      3.0 + rng.rand(T)], axis=1), jnp.float32),
    )
    cfg = KeypointFitConfig(num_iter=80, lr=0.02)
    pose63 = VP.decode(vp, gt["latent"])
    out = model(betas=gt["betas"], global_orient=gt["global_orient"],
                body_pose=pose63)
    j_cam = out["joints"] + gt["cam_t"][:, None, :]
    center = jnp.asarray([cfg.image_size[0] / 2, cfg.image_size[1] / 2])
    valid = KF.BODY25_FROM_SMPLX >= 0
    ids = np.where(valid, KF.BODY25_FROM_SMPLX, 0)
    j2d = KF.project(jnp.take(j_cam, jnp.asarray(ids), axis=1),
                     cfg.focal_length, center)
    kp = np.concatenate(
        [np.asarray(j2d), np.tile(valid.astype(np.float32)[None, :, None],
                                  (T, 1, 1))], axis=-1)
    return dict(model=model, vp=vp, gt=gt, kp=kp, cfg=cfg)


def test_fit_reduces_reprojection(setup):
    params, hist = KF.fit_keypoints(setup["model"], setup["vp"],
                                    setup["kp"], setup["cfg"])
    assert params.shape == (4, 75)
    assert {"camera", "body", "all"} <= set(hist)
    # robust reprojection must drop substantially across the schedule
    assert hist["all"][-1] < 0.3 * hist["camera"][0]
    assert np.all(np.isfinite(params))


def test_fit_recovers_depth(setup):
    params, _ = KF.fit_keypoints(setup["model"], setup["vp"],
                                 setup["kp"], setup["cfg"])
    cam_t = params[:, 72:75]
    gt_z = np.asarray(setup["gt"]["cam_t"])[:, 2]
    # depth recovered within ~15% (monocular scale ambiguity bounded
    # here because betas are optimized from the right prior mean)
    assert np.all(np.abs(cam_t[:, 2] - gt_z) / gt_z < 0.15)


def test_camera_init_sane(setup):
    model = setup["model"]
    rest = model(betas=jnp.zeros((1, 10)), global_orient=jnp.zeros((1, 3)),
                 body_pose=jnp.zeros((1, 63)))
    t = KF.init_camera_translation(jnp.asarray(setup["kp"]),
                                   rest["joints"][0],
                                   setup["cfg"].focal_length)
    z = np.asarray(t)[:, 2]
    assert np.all(z > 0.5) and np.all(z < 50.0)


def test_gmof_robustifier():
    x = jnp.asarray([0.0, 1.0, 1e6])
    out = np.asarray(KF.gmof(x, rho=100.0))
    assert out[0] == 0.0
    assert out[1] == pytest.approx(100.0 ** 2 / (1 + 100.0 ** 2), rel=1e-5)
    assert out[2] <= 100.0 ** 2 + 1e-3   # saturates at rho^2


def test_fit_with_hand_keypoints(setup):
    """Hand keypoints drive the PCA coefficients toward ground truth."""
    import jax.numpy as jnp
    import numpy as np
    from fpv4d.models import vposer as VP

    model, vp, cfg = setup["model"], setup["vp"], setup["cfg"]
    rng = np.random.RandomState(20)
    T = 2
    gt_lh = jnp.asarray(rng.randn(T, 12).astype(np.float32) * 1.0)
    gt_rh = jnp.asarray(rng.randn(T, 12).astype(np.float32) * 1.0)
    latent = jnp.asarray(rng.randn(T, 32).astype(np.float32) * 0.2)
    cam_t = jnp.asarray(np.stack([np.zeros(T), np.zeros(T),
                                  2.5 + 0.2 * rng.rand(T)], 1),
                        jnp.float32)
    pose63 = VP.decode(vp, latent)
    out = model(betas=jnp.zeros((T, 10)), global_orient=jnp.zeros((T, 3)),
                body_pose=pose63, left_hand_pose=gt_lh,
                right_hand_pose=gt_rh)
    j_cam = np.asarray(out["joints"]) + np.asarray(cam_t)[:, None]
    center = jnp.asarray([cfg.image_size[0] / 2, cfg.image_size[1] / 2])

    valid = KF.BODY25_FROM_SMPLX >= 0
    body_ids = np.where(valid, KF.BODY25_FROM_SMPLX, 0)
    body2d = np.asarray(KF.project(jnp.asarray(j_cam[:, body_ids]),
                                   cfg.focal_length, center))
    kp = np.concatenate([body2d, np.tile(
        valid.astype(np.float32)[None, :, None], (T, 1, 1))], -1)

    def hand_kp(ids):
        h = np.zeros((T, 21, 3), np.float32)
        j2d = np.asarray(KF.project(jnp.asarray(j_cam[:, ids]),
                                    cfg.focal_length, center))
        h[:, KF._HAND21_SLOTS, :2] = j2d
        h[:, KF._HAND21_SLOTS, 2] = 1.0
        return h

    from fpv4d.config import KeypointFitConfig
    cfg2 = KeypointFitConfig(num_iter=80, lr=0.02, weight_hand=0.001)
    p_with, _ = KF.fit_keypoints(model, vp, kp, cfg2,
                                 hand_left=hand_kp(KF.LHAND_SMPLX),
                                 hand_right=hand_kp(KF.RHAND_SMPLX))
    p_without, _ = KF.fit_keypoints(model, vp, kp, cfg2)
    err_with = np.abs(p_with[:, 48:72] - np.concatenate(
        [np.asarray(gt_lh), np.asarray(gt_rh)], 1)).mean()
    err_without = np.abs(p_without[:, 48:72] - np.concatenate(
        [np.asarray(gt_lh), np.asarray(gt_rh)], 1)).mean()
    # hand keypoints must pull the PCA coefficients toward GT
    assert err_with < err_without


def test_fit_with_face_keypoints(setup):
    """Face keypoints drive jaw pose + expression toward injected
    ground truth through the barycentric landmark embedding
    (SMPLify-X's expression fitting; OpenPose --face,
    utils/openpose_call.py:6-8)."""
    from fpv4d.config import KeypointFitConfig

    model, vp, cfg = setup["model"], setup["vp"], setup["cfg"]
    assert model.lmk_faces_idx is not None
    rng = np.random.RandomState(21)
    T = 2
    gt_jaw = jnp.asarray(rng.randn(T, 3).astype(np.float32) * 0.2)
    gt_expr = jnp.asarray(rng.randn(T, 10).astype(np.float32) * 2.0)
    latent = jnp.asarray(rng.randn(T, 32).astype(np.float32) * 0.2)
    cam_t = np.stack([np.zeros(T), np.zeros(T),
                      2.5 + 0.2 * rng.rand(T)], 1).astype(np.float32)
    pose63 = VP.decode(vp, latent)
    out = model(betas=jnp.zeros((T, 10)),
                global_orient=jnp.zeros((T, 3)), body_pose=pose63,
                jaw_pose=gt_jaw, expression=gt_expr)
    center = jnp.asarray([cfg.image_size[0] / 2, cfg.image_size[1] / 2])

    # body targets
    j_cam = np.asarray(out["joints"]) + cam_t[:, None]
    valid = KF.BODY25_FROM_SMPLX >= 0
    body_ids = np.where(valid, KF.BODY25_FROM_SMPLX, 0)
    body2d = np.asarray(KF.project(jnp.asarray(j_cam[:, body_ids]),
                                   cfg.focal_length, center))
    kp = np.concatenate([body2d, np.tile(
        valid.astype(np.float32)[None, :, None], (T, 1, 1))], -1)

    # face targets from the ground-truth landmarks (70-slot layout,
    # internal 51 at 17:68)
    vids, tri, bary = model.landmark_vertex_subset()
    tri_pts = np.asarray(out["vertices"])[:, vids][:, tri]  # [T,51,3,3]
    lmk_cam = np.einsum("lk,tlkc->tlc", bary, tri_pts) + cam_t[:, None]
    l2d = np.asarray(KF.project(jnp.asarray(lmk_cam),
                                cfg.focal_length, center))
    face = np.zeros((T, 70, 3), np.float32)
    face[:, 17:68, :2] = l2d
    face[:, 17:68, 2] = 1.0

    cfg2 = KeypointFitConfig(num_iter=80, lr=0.02, weight_expr=1e-4,
                             weight_jaw=1e-3)
    params, hist = KF.fit_keypoints(model, vp, kp, cfg2, face=face)

    def lmk_pixel_err(jaw, expr):
        pose = VP.decode(vp, jnp.asarray(params[:, 16:48]))
        o = model(betas=jnp.asarray(params[:, 6:16]),
                  global_orient=jnp.asarray(params[:, 3:6]),
                  body_pose=pose, jaw_pose=jnp.asarray(jaw),
                  expression=jnp.asarray(expr))
        pts = np.asarray(o["vertices"])[:, vids][:, tri]
        lc = np.einsum("lk,tlkc->tlc", bary, pts) \
            + params[:, 72:75][:, None]
        p2 = np.asarray(KF.project(jnp.asarray(lc), cfg.focal_length,
                                   center))
        return np.linalg.norm(p2 - face[:, 17:68, :2], axis=-1).mean()

    err_fit = lmk_pixel_err(hist["jaw"], hist["expression"])
    err_zero = lmk_pixel_err(np.zeros((T, 3), np.float32),
                             np.zeros((T, 10), np.float32))
    # the face stage must fit the landmark observations (jaw and
    # expression are partially degenerate on 51 points, so the
    # contract is reprojection, not per-variable recovery)
    assert err_fit < 0.5 * err_zero
    # expression (the dominant, well-observed factor) moves toward GT
    err_expr = np.abs(hist["expression"] - np.asarray(gt_expr)).mean()
    assert err_expr < 0.8 * np.abs(np.asarray(gt_expr)).mean()

    # without face keypoints the face vars stay at zero
    _, hist0 = KF.fit_keypoints(model, vp, kp, cfg2)
    assert np.abs(hist0["jaw"]).max() == 0.0
    assert np.abs(hist0["expression"]).max() == 0.0


def test_fit_lbfgs_recovers_truth(setup):
    """config.optimizer='lbfgs' (JOINT-BATCH L-BFGS — one curvature
    memory over the summed objective, torch-LBFGS/smplifyx semantics)
    must converge — and at least match Adam's 3D recovery at a third
    of the iterations (measured: 8.2 mm vs Adam's 11.1 mm on the CPU
    dev fixture). The per-frame vmapped variant is
    'lbfgs_perframe', checked below."""
    import dataclasses
    from fpv4d.models import params as P
    cfg = dataclasses.replace(setup["cfg"], optimizer="lbfgs",
                              num_iter=60)
    params, hist = KF.fit_keypoints(setup["model"], setup["vp"],
                                    setup["kp"], cfg)
    assert np.all(np.isfinite(params))
    assert hist["all"][-1] < 0.5 * hist["camera"][0]

    def mpjpe(params):
        d = P.split(jnp.asarray(params))
        o = setup["model"](betas=d["betas"],
                           global_orient=d["global_orient"],
                           body_pose=VP.decode(setup["vp"],
                                               d["body_pose"]))
        valid = KF.BODY25_FROM_SMPLX >= 0
        ids = np.where(valid, KF.BODY25_FROM_SMPLX, 0)
        sel = np.unique(ids[valid])
        gt = setup["gt"]
        out_gt = setup["model"](betas=gt["betas"],
                                global_orient=gt["global_orient"],
                                body_pose=VP.decode(setup["vp"],
                                                    gt["latent"]))
        j_gt = np.asarray(out_gt["joints"] + gt["cam_t"][:, None, :])
        j_f = (np.asarray(o["joints"])
               + np.asarray(d["camera_translation"])[:, None, :])
        return np.linalg.norm(j_f[:, sel] - j_gt[:, sel],
                              axis=-1).mean()

    # on noiseless fixtures all optimizers reach mm-scale recovery
    # (measured: joint lbfgs ~8 mm @60 iters, per-frame lbfgs 4.8 mm
    # @30, adam 2.8 mm @80; on the NOISY accuracy fixture lbfgs wins,
    # 8.2 vs 11.1 mm) — bound absolute quality, not the
    # inter-optimizer ratio
    assert mpjpe(params) < 0.010

    # the per-frame variant: own curvature/step per frame, best
    # per-iteration recovery (slow on TPU, fine at CPU test sizes)
    cfg_pf = dataclasses.replace(setup["cfg"],
                                 optimizer="lbfgs_perframe",
                                 num_iter=30)
    params_pf, hist_pf = KF.fit_keypoints(setup["model"], setup["vp"],
                                          setup["kp"], cfg_pf)
    assert np.all(np.isfinite(params_pf))
    assert mpjpe(params_pf) < 0.010


def test_perframe_tpu_guard(setup, monkeypatch):
    """On TPU, 'lbfgs_perframe' is rejected unless explicitly allowed
    (measured ~3x slower than 'lbfgs' at equal recovery — config.py).
    The backend is monkeypatched; the allow path must not raise before
    reaching actual work."""
    import dataclasses
    import jax as _jax
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    cfg = dataclasses.replace(setup["cfg"], optimizer="lbfgs_perframe",
                              num_iter=2)
    with pytest.raises(ValueError, match="lbfgs_perframe"):
        KF.fit_keypoints(setup["model"], setup["vp"], setup["kp"], cfg)
    monkeypatch.undo()
    cfg_ok = dataclasses.replace(cfg, allow_slow_perframe=True)
    params, _ = KF.fit_keypoints(setup["model"], setup["vp"],
                                 setup["kp"], cfg_ok)
    assert np.all(np.isfinite(params))


def test_fit_batched_clips_matches_loop(setup):
    """FLEET SHAPE (r4): a [C, T] clips-batched fit must equal the
    per-clip loop exactly — loss normalization, optimizer state and
    history are per vmap lane — modulo f32 summation order. Covers
    the multi-clip pipeline-step-3 path (the reference runs smplifyx
    one clip at a time, README.md:14-17)."""
    import dataclasses
    model, vp = setup["model"], setup["vp"]
    cfg = dataclasses.replace(setup["cfg"], num_iter=15)
    kp0 = np.asarray(setup["kp"], np.float32)          # [T,25,3]
    rng = np.random.RandomState(9)
    kp1 = kp0.copy()
    kp1[..., :2] += rng.randn(*kp1[..., :2].shape).astype(np.float32) * 3.0
    kp_b = np.stack([kp0, kp1])                        # [2,T,25,3]
    p_b, h_b = KF.fit_keypoints(model, vp, kp_b, cfg)
    assert p_b.shape == (2, kp0.shape[0], 75)
    for c, kp in enumerate([kp0, kp1]):
        p_s, h_s = KF.fit_keypoints(model, vp, kp, cfg)
        np.testing.assert_allclose(p_b[c], p_s, atol=2e-5, rtol=1e-4)
        for k in ("camera", "body", "all"):
            np.testing.assert_allclose(h_b[k][c], h_s[k],
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"clip {c} stage {k}")


def test_fit_batched_lbfgs_and_sharded(setup):
    """Batched clips under the joint L-BFGS optimizer, and the
    mesh-sharded (data-parallel fleet) form of the Adam path — both
    must be finite and, for the sharded run, equal the unsharded
    batched run."""
    import dataclasses
    import jax
    from jax.sharding import Mesh
    model, vp = setup["model"], setup["vp"]
    kp0 = np.asarray(setup["kp"], np.float32)
    kp_b = np.stack([kp0] * 4)                         # [4,T,25,3]

    cfg_l = dataclasses.replace(setup["cfg"], optimizer="lbfgs",
                                num_iter=10)
    p_l, h_l = KF.fit_keypoints(model, vp, kp_b, cfg_l)
    assert p_l.shape == (4, kp0.shape[0], 75)
    assert np.all(np.isfinite(p_l))

    cfg = dataclasses.replace(setup["cfg"], num_iter=10)
    p_ref, _ = KF.fit_keypoints(model, vp, kp_b, cfg)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("clips",))
    p_sh, _ = KF.fit_keypoints(model, vp, kp_b, cfg, mesh=mesh)
    np.testing.assert_allclose(p_sh, p_ref, atol=2e-5, rtol=1e-4)
