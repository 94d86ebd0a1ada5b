"""IO layer tests: COLMAP parsers, keypoint JSON, PLY, body pkls."""
import json
import os

import numpy as np
import pytest

from fpv4d.io import colmap, keypoints, ply, body_pkl
from fpv4d.models import params as P


def test_camerapose_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    q = rng.randn(5, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t = rng.randn(5, 3)
    path = tmp_path / "camerapose.txt"
    with open(path, "w") as f:
        for i in range(5):
            f.write(f"{i:06d}.jpg " + " ".join(
                str(v) for v in np.concatenate([q[i], t[i]])) + "\n")
    ext = np.asarray(colmap.camera_ext_from_file(str(path)))
    assert ext.shape == (5, 4, 4)
    # world-from-cam @ [R|t] == I
    from fpv4d.core.rotations import quat_to_matrot
    import jax.numpy as jnp
    for i in range(5):
        m = np.eye(4)
        m[:3, :3] = np.asarray(quat_to_matrot(
            jnp.asarray(q[i], jnp.float32)))
        m[:3, 3] = t[i]
        np.testing.assert_allclose(ext[i] @ m, np.eye(4), atol=1e-5)


def test_images_txt_conversion(tmp_path):
    src = tmp_path / "images.txt"
    with open(src, "w") as f:
        f.write("# comment line\n")
        f.write("1 0.9 0.1 0.2 0.3 1.0 2.0 3.0 1 000002.jpg\n")
        f.write("5 6 7 8\n")   # 2D points line (skipped)
        f.write("2 0.8 0.0 0.1 0.2 4.0 5.0 6.0 1 000001.jpg\n")
        f.write("9 9 9 9\n")
    out = tmp_path / "camerapose.txt"
    n = colmap.images_txt_to_camerapose(str(src), str(out))
    assert n == 2
    lines = open(out).read().splitlines()
    # sorted by image name
    assert lines[0].startswith("000001.jpg 0.8")
    assert lines[1].startswith("000002.jpg 0.9")


def test_points3d_and_xyz(tmp_path):
    src = tmp_path / "points3D.txt"
    with open(src, "w") as f:
        f.write("# header\n")
        f.write("1 0.5 1.5 2.5 255 0 0 0.1 7 0\n")
        f.write("2 -1.0 0.0 3.0 0 255 0 0.2 8 1\n")
    pts = colmap.read_points3d(str(src))
    np.testing.assert_allclose(pts, [[0.5, 1.5, 2.5], [-1.0, 0.0, 3.0]])
    xyz = tmp_path / "out.xyz"
    colmap.write_xyz(pts, str(xyz))
    np.testing.assert_allclose(colmap.read_xyz(str(xyz)), pts)


def test_match_pairs_window_pattern():
    names = [f"{i:06d}.jpg" for i in range(200)]
    pairs = colmap.match_pairs(names)
    assert (names[0], names[60]) in pairs
    assert (names[0], names[91]) in pairs
    assert all(b in names for _, b in pairs)   # never out of range
    # every pair respects the offset set
    offs = {60, 61, 70, 71, 80, 81, 90, 91}
    for a, b in pairs:
        assert int(b[:6]) - int(a[:6]) in offs


def _openpose_json(path, people_xy):
    people = []
    for (x, y, c) in people_xy:
        flat = []
        for k in range(25):
            flat += [x + k, y + k, c]
        people.append({"pose_keypoints_2d": flat})
    with open(path, "w") as f:
        json.dump({"version": 1.3, "people": people}, f)


def test_keypoints_read_and_filter(tmp_path):
    p = tmp_path / "000000_keypoints.json"
    _openpose_json(str(p), [(10, 20, 0.3), (100, 200, 0.9)])
    kp = keypoints.read_keypoints(str(p))
    assert kp["pose"].shape == (25, 3)
    assert kp["pose"][0, 0] == 10   # people[0]
    assert keypoints.most_confident_person(str(p)) == 1
    out = tmp_path / "filtered.json"
    keypoints.filter_single_person(str(p), str(out), best=True)
    kp2 = keypoints.read_keypoints(str(out))
    assert kp2["pose"][0, 0] == 100
    data = json.load(open(out))
    assert len(data["people"]) == 1


def test_load_clip_keypoints(tmp_path):
    for i in range(3):
        _openpose_json(str(tmp_path / f"{i:06d}_keypoints.json"),
                       [(i, i, 1.0)])
    arr = keypoints.load_clip_keypoints(str(tmp_path))
    assert arr.shape == (3, 25, 3)
    assert arr[2, 0, 0] == 2


def test_bbox_mask():
    kp = np.zeros((25, 3), np.float32)
    kp[0] = [100, 100, 1.0]
    kp[1] = [200, 300, 1.0]
    m = keypoints.human_bbox_mask(kp, 720, 1280)
    assert m.shape == (720, 1280)
    assert m[0, 0] == 255
    assert m[200, 150] == 0      # inside the (scaled) box
    assert m[719, 1279] == 255


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    v = rng.randn(50, 3).astype(np.float32)
    f = rng.randint(0, 50, (30, 3)).astype(np.int32)
    for binary in (True, False):
        path = str(tmp_path / f"m_{binary}.ply")
        ply.write_ply(path, v, f, binary=binary)
        v2, f2 = ply.read_ply(path)
        np.testing.assert_allclose(v2, v, atol=1e-6)
        np.testing.assert_array_equal(f2, f)


def test_ply_vertex_only(tmp_path):
    v = np.random.RandomState(2).randn(10, 3).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    ply.write_ply(path, v)
    v2, f2 = ply.read_ply(path)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    assert f2 is None


def test_body_pkl_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    body = rng.randn(4, 75).astype(np.float32)
    cam = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    paths = body_pkl.save_clip(str(tmp_path / "fit"), body, scale=1.7,
                               camera_ext=cam)
    assert len(paths) == 4
    d = body_pkl.load_frame(paths[0])
    assert set(d) == set(P.SLICES) | {"scale", "camera_ext"}
    assert d["scale"] == np.float32(1.7)
    assert d["camera_ext"].shape == (4, 4)
    # reload through the body_gen reader (flattened layout)
    packed = body_pkl.load_clip(str(tmp_path / "fit"))
    np.testing.assert_allclose(packed, body, atol=1e-6)


def test_body_gen_results_layout(tmp_path):
    rng = np.random.RandomState(4)
    body = rng.randn(3, 75).astype(np.float32)
    frames = P.encapsulate_frames(body)
    for i, fr in enumerate(frames):
        body_pkl.save_frame(
            str(tmp_path / "results" / f"{i:03d}" / "000.pkl"), fr)
    packed = body_pkl.load_clip(str(tmp_path))
    np.testing.assert_allclose(packed, body, atol=1e-6)


def test_save_clip_extra_keys(tmp_path):
    """jaw_pose/expression ride per-frame pkls under their own keys
    (the reference's smplifyx pkls carry them, vis.py:318-321 filters)
    and don't break the 75-d reload path."""
    from fpv4d.io import body_pkl
    from fpv4d.models import params as P
    body = np.random.RandomState(0).randn(3, 75).astype(np.float32)
    jaw = np.random.RandomState(1).randn(3, 3).astype(np.float32)
    expr = np.random.RandomState(2).randn(3, 10).astype(np.float32)
    paths = body_pkl.save_clip(str(tmp_path), body,
                               extra={"jaw_pose": jaw,
                                      "expression": expr})
    d0 = body_pkl.load_frame(paths[0])
    np.testing.assert_allclose(d0["jaw_pose"], jaw[0])
    np.testing.assert_allclose(d0["expression"], expr[0])
    np.testing.assert_allclose(body_pkl.load_clip(str(tmp_path)), body,
                               atol=1e-6)
