"""CLI entry-point integration tests on tiny synthetic data — the
framework's equivalents of the reference's script invocations
(global_optimization.py / optimization.py / vis.py / utils/*)."""
import json
import os

import numpy as np
import pytest

from fpv4d.io import body_pkl
from fpv4d.models import params as P


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    """A minimal clip directory: body_gen pkls + keypoints + scene."""
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("clip")
    T = 3
    body = (rng.randn(T, 75) * 0.1).astype(np.float32)
    body_pkl.save_clip(str(root / "body_gen"), body)

    kp_dir = root / "keypoints"
    kp_dir.mkdir()
    for t in range(T):
        flat = []
        for k in range(25):
            flat += [600.0 + 5 * k, 300.0 + 4 * k, 1.0]
        with open(kp_dir / f"{t:06d}_keypoints.json", "w") as f:
            json.dump({"people": [{"pose_keypoints_2d": flat}]}, f)

    from fpv4d.io.ply import write_ply
    scene = rng.randn(300, 3).astype(np.float32)
    write_ply(str(root / "scene.ply"), scene)

    with open(root / "camerapose.txt", "w") as f:
        for t in range(T):
            f.write(f"{t:06d}.jpg 1 0 0 0 0.1 0.2 {0.3 + t}\n")
    return root


def test_cli_fit(clip_dir, tmp_path):
    from fpv4d.cli.fit import main
    rc = main([str(clip_dir / "keypoints"), str(tmp_path / "bg"),
               "--iters", "4", "--model", "NONE", "--vposer", "NONE"])
    assert rc == 0
    pkls = sorted((tmp_path / "bg").glob("*.pkl"))
    assert len(pkls) == 3
    d = body_pkl.load_frame(str(pkls[0]))
    assert set(d) == set(P.SLICES)


def test_cli_smooth(clip_dir, tmp_path):
    from fpv4d.cli.smooth import main
    rc = main([str(clip_dir / "body_gen"), str(tmp_path / "out"),
               "--iters", "3"])
    assert rc == 0
    assert len(list((tmp_path / "out" / "smoothed_body").glob(
        "*.pkl"))) == 3


def test_cli_smooth_independent(clip_dir, tmp_path):
    from fpv4d.cli.smooth import main
    rc = main([str(clip_dir / "body_gen"), str(tmp_path / "out2"),
               "--iters", "2", "--mode", "independent"])
    assert rc == 0


def test_cli_globalopt(clip_dir, tmp_path):
    from fpv4d.cli.globalopt import main
    rc = main([str(clip_dir / "body_gen"), str(tmp_path / "fit"),
               "global", "--scene", str(clip_dir / "scene.ply"),
               "--camera", str(clip_dir / "camerapose.txt"),
               "--iters", "4", "--model", "NONE", "--vposer", "NONE"])
    assert rc == 0
    pkls = sorted((tmp_path / "fit").glob("*.pkl"))
    assert len(pkls) == 3
    d = body_pkl.load_frame(str(pkls[0]))
    assert "scale" in d and "camera_ext" in d


def test_cli_vis_world(clip_dir, tmp_path):
    # first produce clip-solve outputs with scale/camera_ext
    from fpv4d.cli.globalopt import main as gmain
    fit = tmp_path / "fit"
    assert gmain([str(clip_dir / "body_gen"), str(fit), "global",
                  "--scene", str(clip_dir / "scene.ply"),
                  "--iters", "2", "--model", "NONE",
                  "--vposer", "NONE"]) == 0
    from fpv4d.cli.vis import main as vmain
    rc = vmain(["world", str(fit), "--scene",
                str(clip_dir / "scene.ply"),
                "--out", str(tmp_path / "render0"),
                "--model", "NONE", "--vposer", "NONE", "--limit", "2"])
    assert rc == 0
    assert len(os.listdir(tmp_path / "render0")) == 2
    # orbit/turntable sweep (the windowed viewer's rotating mode,
    # offline): frames render and are not black
    rc = vmain(["world", str(fit), "--scene",
                str(clip_dir / "scene.ply"),
                "--out", str(tmp_path / "render_orbit"), "--orbit",
                "--model", "NONE", "--vposer", "NONE", "--limit", "2"])
    assert rc == 0
    from PIL import Image
    import numpy as np
    imgs = sorted((tmp_path / "render_orbit").glob("*.png"))
    assert len(imgs) == 2
    for p in imgs:
        arr = np.asarray(Image.open(p)).astype(float)
        assert (arr.sum(-1) > 0).mean() > 0.005, p


def test_orbit_eye_above_centroid():
    """The world is y-up (synthetic floors sit at y=-1), so a positive
    default elevation must put the turntable eye ABOVE the orbit
    center — the r3 sign had it ~0.85 m below, near floor level,
    looking up (ADVICE r3)."""
    import numpy as np
    from fpv4d.vis.world_view import orbit_view
    center = np.array([0.5, 0.2, -1.0], np.float32)
    for az in (0.0, 1.3, 2.9, 4.4):
        view = orbit_view(center, radius=3.0, azimuth=az)
        eye = view[:3, 3]
        assert eye[1] > center[1], (az, eye)
        # and it still looks AT the center: +Z column points there
        fwd = view[:3, 2]
        to_c = (center - eye) / np.linalg.norm(center - eye)
        assert np.dot(fwd, to_c) > 0.99


def test_cli_prep_pairs_campose_cloud(clip_dir, tmp_path):
    from fpv4d.cli.prep import main
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(70):
        (img_dir / f"{i:06d}.jpg").write_bytes(b"")
    assert main(["pairs", str(img_dir), "--out",
                 str(tmp_path / "pairs.txt")]) == 0
    pairs = open(tmp_path / "pairs.txt").read().splitlines()
    assert all(len(line.split()) == 2 for line in pairs)

    images_txt = tmp_path / "images.txt"
    images_txt.write_text(
        "# hdr\n1 0.9 0.1 0.2 0.3 1 2 3 1 000000.jpg\n9 9\n")
    assert main(["campose", str(images_txt), "--out",
                 str(tmp_path / "campose.txt")]) == 0

    pts_txt = tmp_path / "points3D.txt"
    pts_txt.write_text("# hdr\n1 1.0 2.0 3.0 255 0 0 0.5 1 2\n")
    assert main(["cloud", str(pts_txt), "--out",
                 str(tmp_path / "xyz.xyz")]) == 0
    assert os.path.getsize(tmp_path / "xyz.xyz") > 0


def test_cli_prep_filter_rename_masks(clip_dir, tmp_path):
    from fpv4d.cli.prep import main
    assert main(["rename", str(clip_dir / "keypoints"), "--out",
                 str(tmp_path / "renamed")]) == 0
    assert len(list((tmp_path / "renamed").glob(
        "*_keypoints.json"))) == 3
    assert main(["filter", str(clip_dir / "keypoints"), "--out",
                 str(tmp_path / "filtered")]) == 0
    assert main(["masks", str(clip_dir / "keypoints"), "--out",
                 str(tmp_path / "masks"), "--width", "1280",
                 "--height", "720"]) == 0
    assert len(os.listdir(tmp_path / "masks")) == 3


def test_cli_openpose_cmd(capsys):
    from fpv4d.cli.prep import main
    assert main(["openpose-cmd", "vid.mp4", "--json-out", "out/"]) == 0
    out = capsys.readouterr().out
    assert "--video vid.mp4" in out and "--write_json out/" in out
    assert "--face" in out and "--hand" in out


def test_cli_multiopt(clip_dir, tmp_path):
    from fpv4d.cli.multiopt import main
    # two "clips" sharing the same body_gen layout
    import shutil
    c1 = tmp_path / "clipA"
    c2 = tmp_path / "clipB"
    for c in (c1, c2):
        shutil.copytree(clip_dir / "body_gen", c / "body_gen")
        shutil.copyfile(clip_dir / "scene.ply", c / "scene.ply")
        shutil.copyfile(clip_dir / "camerapose.txt",
                        c / "camerapose.txt")
    rc = main([str(c1), str(c2), "--out", str(tmp_path / "out"),
               "--mode", "global", "--iters", "4",
               "--scene-name", "scene.ply", "--mesh", "clips=2",
               "--model", "NONE", "--vposer", "NONE"])
    assert rc == 0
    for name in ("clipA", "clipB"):
        pkls = list((tmp_path / "out" / name).glob("*.pkl"))
        assert len(pkls) == 3


def test_interactive_viewer_http(clip_dir, tmp_path):
    """The live viewer (reference interactive_vis.py:86-206 event
    loop, rebuilt as an HTTP server for headless use): index page,
    meta, and frames in all three camera modes render over HTTP;
    repeated requests hit the render memo; bad paths 404."""
    import threading
    import urllib.request
    from fpv4d.cli.globalopt import main as gmain
    fit = tmp_path / "fit"
    assert gmain([str(clip_dir / "body_gen"), str(fit), "global",
                  "--scene", str(clip_dir / "scene.ply"),
                  "--iters", "2", "--model", "NONE",
                  "--vposer", "NONE"]) == 0

    from fpv4d.cli import common
    from fpv4d.vis.interactive import InteractiveViewer, make_server
    model = common.load_model("NONE")
    vp = common.load_vposer("NONE")
    scene = common.load_scene(str(clip_dir / "scene.ply"))
    viewer = InteractiveViewer(str(fit), model, vp, scene, limit=2)
    srv = make_server(viewer, port=0)       # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        html = urllib.request.urlopen(base + "/").read()
        assert b"fpv4d" in html
        meta = json.loads(urllib.request.urlopen(
            base + "/meta").read())
        assert meta["num_frames"] == 2
        from PIL import Image
        import io as _io
        for q in ("i=0&mode=fixed", "i=1&mode=follow",
                  "i=1&mode=orbit&azim=0.7&elev=0.4&zoom=1.5"):
            png = urllib.request.urlopen(
                base + "/frame?" + q).read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            arr = np.asarray(Image.open(_io.BytesIO(png))).astype(float)
            # follow is exempt from the non-black check: this tiny
            # fixture's frame-1 camera legitimately looks away from
            # the 300-point cloud
            if "follow" not in q:
                assert (arr.sum(-1) > 0).mean() > 0.005, q
        # memoized second hit returns identical bytes
        p1 = urllib.request.urlopen(base + "/frame?i=0&mode=fixed").read()
        assert p1 == urllib.request.urlopen(
            base + "/frame?i=0&mode=fixed").read()
        assert len(viewer._cache) == 3   # memo hit added no entry
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(base + "/nope")
        assert ei.value.code == 404
    finally:
        srv.shutdown()
        srv.server_close()
