"""Golden-path end-to-end pipeline test on synthetic data:

  keypoint JSONs -> keypoint fit (body_gen pkls) -> sequential smooth
  (smoothed_body pkls) -> clip-level joint optimization (pkls with
  scale + camera_ext) -> ego overlay + world render PNGs.

This is the full reference pipeline (README.md steps 2-7) running
through the framework's own CLIs on a tiny problem.
"""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fpv4d.config import ClipConfig, FrameFitConfig, KeypointFitConfig
from fpv4d.io import body_pkl, keypoints
from fpv4d.models import smplx as jsmplx, vposer as VP
from fpv4d.models import params as P
from fpv4d.ops import contact
from fpv4d.solve import frame_fit
from fpv4d.solve.keypoint_fit import fit_keypoints, project, \
    BODY25_FROM_SMPLX
from fpv4d.solve.clip_solve import ClipSolver
from fpv4d.vis import raster
from fpv4d.vis.ego_overlay import render_dir as ego_render
from fpv4d.vis.world_view import render_dir as world_render

T = 4


@pytest.fixture(scope="module")
def assets():
    model = jsmplx.synthetic_model(num_verts=192, seed=11)
    vp = VP.random_params(seed=11)
    return model, vp


@pytest.fixture(scope="module")
def keypoint_dir(tmp_path_factory, assets):
    """Synthesize OpenPose JSONs from a ground-truth motion."""
    model, vp = assets
    rng = np.random.RandomState(12)
    latent = rng.randn(1, 32).astype(np.float32) * 0.3
    latent = np.tile(latent, (T, 1)) + \
        rng.randn(T, 32).astype(np.float32) * 0.05
    cfg = KeypointFitConfig()
    pose63 = VP.decode(vp, jnp.asarray(latent))
    out = model(betas=jnp.zeros((T, 10)),
                global_orient=jnp.asarray(
                    rng.randn(T, 3).astype(np.float32) * 0.05),
                body_pose=pose63)
    cam_t = np.stack([0.1 * rng.randn(T), 0.1 * rng.randn(T),
                      3.0 + 0.2 * rng.rand(T)], 1).astype(np.float32)
    j_cam = np.asarray(out["joints"]) + cam_t[:, None, :]
    center = jnp.asarray([cfg.image_size[0] / 2, cfg.image_size[1] / 2])
    valid = BODY25_FROM_SMPLX >= 0
    ids = np.where(valid, BODY25_FROM_SMPLX, 0)
    j2d = np.asarray(project(jnp.asarray(j_cam[:, ids]),
                             cfg.focal_length, center))
    d = tmp_path_factory.mktemp("keypoints")
    for t in range(T):
        flat = []
        for k in range(25):
            flat += [float(j2d[t, k, 0]), float(j2d[t, k, 1]),
                     float(valid[k])]
        with open(d / f"{t:06d}_keypoints.json", "w") as f:
            json.dump({"people": [{"pose_keypoints_2d": flat}]}, f)
    return str(d)


def test_full_pipeline(tmp_path, assets, keypoint_dir):
    model, vp = assets

    # step 3: fit from keypoints -> body_gen
    kp = keypoints.load_clip_keypoints(keypoint_dir)
    assert kp.shape == (T, 25, 3)
    params, hist = fit_keypoints(model, vp, kp,
                                 KeypointFitConfig(num_iter=40))
    assert hist["all"][-1] < hist["camera"][0]
    body_gen = tmp_path / "body_gen"
    body_pkl.save_clip(str(body_gen), params)

    # step 5: sequential smoothing -> smoothed_body
    packed = body_pkl.load_clip(str(body_gen))
    np.testing.assert_allclose(packed, params, atol=1e-6)
    smoothed = frame_fit.fit_sequential(jnp.asarray(packed),
                                        FrameFitConfig(num_iter=10))
    clip_dir = tmp_path / "clip"
    body_pkl.save_smoothed(str(clip_dir), np.asarray(smoothed))

    # step 6: clip-level joint optimization with scene + camera
    scene = np.stack(np.meshgrid(np.linspace(-3, 3, 16),
                                 np.linspace(-3, 3, 16)), -1)
    scene = np.concatenate(
        [scene.reshape(-1, 2)[:, :1], np.full((256, 1), -1.0),
         scene.reshape(-1, 2)[:, 1:]], 1).astype(np.float32)
    segs = contact.synthetic_segments(model.num_verts, seed=11)
    vl = np.asarray(segs["L_Leg"], np.int32)
    vr = np.asarray(segs["R_Leg"], np.int32)
    solver = ClipSolver(
        model=model, vposer_params=vp, scene_verts=jnp.asarray(scene),
        contact_vids=np.concatenate([vl, vr]), contact_vids_left=vl,
        contact_vids_right=vr,
        config=ClipConfig(num_iter=5, window=2, dct_num=2),
        use_pallas=False)
    cam = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    state, hist2 = solver.fit(jnp.asarray(np.asarray(smoothed)),
                              jnp.asarray(cam), mode="local")
    body_out, scale, camera_ext = solver.result_params(state)
    fit_dir = clip_dir / "smoothed_body2"
    body_pkl.save_clip(str(fit_dir), body_out, scale, camera_ext,
                       prefix="")

    # step 7: visualization (ego overlay + world view)
    cam_small = raster.Camera(width=128, height=96, fx=80, fy=80,
                              cx=64, cy=48)
    n = ego_render(str(clip_dir / "smoothed_body"), model, vp,
                   source="smoothed", camera=cam_small)
    assert n == T
    n = world_render(str(fit_dir), model, vp, scene,
                     str(tmp_path / "render0"))
    assert n == T
    pngs = sorted(os.listdir(tmp_path / "render0"))
    assert len(pngs) == T

    # output contract: every frame pkl has the full key set
    d = body_pkl.load_frame(str(sorted(fit_dir.glob("*.pkl"))[0]))
    assert set(d) == set(P.SLICES) | {"scale", "camera_ext"}
