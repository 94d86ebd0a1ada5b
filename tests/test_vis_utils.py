"""Visualization + utils tests (rasterizer geometry, monitor,
end-to-end render of a saved clip)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fpv4d.vis import raster
from fpv4d.utils.monitor import FittingMonitor, rel_change, \
    steps_until_converged


def test_camera_projection_center():
    cam = raster.Camera()
    # a point straight ahead (GL: -z) projects to the principal point
    uv, z = cam.project(np.array([[0.0, 0.0, -2.0]]))
    assert z[0] == pytest.approx(2.0)
    np.testing.assert_allclose(uv[0], [cam.cx, cam.cy], atol=1e-5)
    # +x -> right of center, +y -> ABOVE center (image y down)
    uv, _ = cam.project(np.array([[0.5, 0.5, -2.0]]))
    assert uv[0, 0] > cam.cx and uv[0, 1] < cam.cy


def test_render_triangle_coverage():
    cam = raster.Camera(width=160, height=120, fx=100, fy=100,
                        cx=80, cy=60)
    verts = np.array([[-0.5, -0.5, -2.0], [0.5, -0.5, -2.0],
                      [0.0, 0.6, -2.0]], dtype=np.float32)
    faces = np.array([[0, 1, 2]], dtype=np.int32)
    rgb, mask = raster.render_mesh(verts, faces, cam)
    assert mask.sum() > 100          # triangle covers pixels
    assert mask[60, 80, 0] == 1.0    # center is inside
    assert mask[0, 0, 0] == 0.0      # corner is not
    assert rgb[60, 80].max() > 0.1   # shaded, not black


def test_painter_occlusion():
    cam = raster.Camera(width=100, height=100, fx=100, fy=100,
                        cx=50, cy=50)
    # near red-ish triangle should cover far one at center
    tri = np.array([[-1, -1], [1, -1], [0, 1]], dtype=np.float32)
    far = np.concatenate([tri, np.full((3, 1), -5.0)], 1)
    near = np.concatenate([tri * 0.5, np.full((3, 1), -2.0)], 1)
    verts = np.concatenate([far, near]).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int32)
    # give them distinct normals? same normal; check mask only + near
    # via depth ordering: last drawn must be the near one -> brighter
    # pixel from the identical shading is equal; instead check with
    # points:
    img = raster.render_points(
        np.array([[0, 0, -5.0], [0, 0, -2.0]], dtype=np.float32), cam,
        colors=np.array([[1.0, 0, 0], [0, 1.0, 0]]))
    np.testing.assert_allclose(img[50, 50], [0, 1.0, 0])  # near wins


def test_composite():
    rgb = np.ones((4, 4, 3), np.float32)
    mask = np.zeros((4, 4, 1), np.float32)
    mask[1, 1] = 1.0
    bg = np.zeros((4, 4, 3), np.float32)
    out = raster.composite(rgb, mask, bg)
    assert out[1, 1, 0] == 1.0 and out[0, 0, 0] == 0.0


def test_ego_overlay_end_to_end(tmp_path):
    from fpv4d.io import body_pkl
    from fpv4d.models import smplx as jsmplx, vposer
    from fpv4d.vis.ego_overlay import render_dir

    model = jsmplx.synthetic_model(num_verts=128, seed=5)
    vp = vposer.random_params(seed=5)
    rng = np.random.RandomState(6)
    body = (rng.randn(2, 75) * 0.1).astype(np.float32)
    body[:, 74] = 2.5     # camera z offset
    base = tmp_path / "clip"
    smoothed = base / "smoothed_body"
    body_pkl.save_smoothed(str(base), body)
    cam = raster.Camera(width=160, height=120, fx=100, fy=100,
                        cx=80, cy=60)
    n = render_dir(str(smoothed), model, vp, source="smoothed",
                   camera=cam)
    assert n == 2
    outs = sorted(os.listdir(base / "smoothed_vis"))
    assert outs == ["0000.png", "0001.png"]


def test_world_view_end_to_end(tmp_path):
    from fpv4d.io import body_pkl
    from fpv4d.models import smplx as jsmplx, vposer
    from fpv4d.vis.world_view import render_dir

    model = jsmplx.synthetic_model(num_verts=128, seed=7)
    vp = vposer.random_params(seed=7)
    rng = np.random.RandomState(8)
    body = (rng.randn(2, 75) * 0.1).astype(np.float32)
    cam_ext = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    cam_ext[:, 2, 3] = 3.0
    base = tmp_path / "clip"
    body_pkl.save_clip(str(base / "smoothed_body"), body, scale=1.5,
                       camera_ext=cam_ext, prefix="")
    scene = rng.randn(200, 3).astype(np.float32)
    n = render_dir(str(base / "smoothed_body"), model, vp, scene,
                   str(tmp_path / "render0"))
    assert n == 2
    assert len(os.listdir(tmp_path / "render0")) == 2


def test_monitor_nan_stop():
    m = FittingMonitor()
    assert not m.update(1.0)
    assert not m.update(0.5)
    assert m.update(float("nan"))
    assert m.stopped_reason == "non-finite loss"


def test_monitor_ftol_stop():
    m = FittingMonitor(ftol=1e-3)
    assert not m.update(1.0)
    assert m.update(1.0 + 1e-7)
    assert m.stopped_reason == "ftol"


def test_rel_change():
    assert rel_change(2.0, 1.0) == 0.5
    assert rel_change(0.0, 0.0) == 0.0
    assert rel_change(1e-9, 2e-9) == pytest.approx(1e-9)


def test_steps_until_converged():
    losses = np.array([1.0, 0.5, 0.25, 0.25 + 1e-12, 0.1])
    assert steps_until_converged(losses, ftol=1e-9) == 3
    assert steps_until_converged(np.array([1.0, 0.5]), ftol=1e-9) == 2


def test_solver_checkpoint_roundtrip(tmp_path):
    import optax
    from fpv4d.utils import checkpoint as CK
    from fpv4d.solve.clip_solve import ClipState

    state = ClipState(body_6d=jnp.ones((3, 78)), scale=jnp.float32(1.8),
                      camera_ext=jnp.zeros((3, 4, 4)),
                      c_dct=jnp.zeros((1, 23, 3, 5)))
    opt = optax.adam(1e-3)
    opt_state = opt.init(state)
    path = str(tmp_path / "ckpt")
    CK.save_solver_state(path, state, opt_state, step=7)
    template = {"state": state, "opt_state": opt_state,
                "step": np.int64(0)}
    s2, o2, step = CK.load_solver_state(path, template)
    assert step == 7
    np.testing.assert_allclose(np.asarray(s2.body_6d),
                               np.asarray(state.body_6d))


def test_world_view_renders_content(tmp_path):
    """Regression: COLMAP (+Z fwd) vs GL (-Z fwd) convention mismatch
    rendered all-black world views."""
    from fpv4d.io import body_pkl
    from fpv4d.models import smplx as jsmplx, vposer
    from fpv4d.vis.world_view import render_dir

    model = jsmplx.synthetic_model(num_verts=128, seed=9)
    vp = vposer.random_params(seed=9)
    rng = np.random.RandomState(10)
    body = (rng.randn(1, 75) * 0.1).astype(np.float32)
    cam_ext = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
    base = tmp_path / "clip"
    body_pkl.save_clip(str(base / "smoothed_body"), body, scale=1.0,
                       camera_ext=cam_ext, prefix="")
    # scene IN FRONT of a COLMAP camera at origin: +z, spread in x/y
    scene = np.stack([np.random.RandomState(11).uniform(-1, 1, 500),
                      np.random.RandomState(12).uniform(-1, 1, 500),
                      np.random.RandomState(13).uniform(2, 4, 500)],
                     1).astype(np.float32)
    render_dir(str(base / "smoothed_body"), model, vp, scene,
               str(tmp_path / "r"))
    from PIL import Image
    img = np.asarray(Image.open(tmp_path / "r" / "img_000.png"))
    assert (img.sum(-1) > 0).mean() > 0.0003  # not a black frame


def test_checked_catches_oob_and_nan():
    from fpv4d.utils.observability import checked

    def oob(x):
        return x[jnp.asarray(10)]     # out of bounds for len-3 input

    with pytest.raises(Exception):
        checked(oob, jnp.ones(3))

    def nan_fn(x):
        return jnp.log(x)

    with pytest.raises(Exception):
        checked(nan_fn, jnp.asarray(-1.0))
    # clean functions pass through
    assert float(checked(lambda x: x * 2, jnp.asarray(3.0))) == 6.0


def test_orbit_view_looks_at_center():
    """orbit_view: the camera sits on the requested ring, +Z (COLMAP
    forward) points at the center, and the matrix is rigid."""
    import numpy as np
    from fpv4d.vis.world_view import orbit_view
    center = np.array([1.0, -0.5, 2.0], np.float32)
    for az in (0.0, 1.1, 3.9):
        v = orbit_view(center, radius=3.0, azimuth=az)
        R, eye = v[:3, :3], v[:3, 3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.norm(eye - center) - 3.0) < 1e-4
        fwd = R[:, 2]
        to_c = (center - eye) / np.linalg.norm(center - eye)
        np.testing.assert_allclose(fwd, to_c, atol=1e-5)
