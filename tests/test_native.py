"""Native C++ data-plane tests (library auto-builds via make; all
functions also have pure-Python fallbacks that these tests cover when
the toolchain is absent)."""
import numpy as np
import pytest

from fpv4d.io import native, ply


@pytest.fixture(scope="module")
def cloud():
    return np.random.RandomState(0).randn(4000, 3).astype(np.float32) * 2


def test_ply_read_binary(tmp_path, cloud):
    path = str(tmp_path / "c.ply")
    ply.write_ply(path, cloud, binary=True)
    v = native.read_ply_vertices(path)
    np.testing.assert_allclose(v, cloud, atol=1e-6)


def test_ply_read_ascii(tmp_path, cloud):
    path = str(tmp_path / "c.ply")
    ply.write_ply(path, cloud[:200], binary=False)
    v = native.read_ply_vertices(path)
    np.testing.assert_allclose(v, cloud[:200], atol=1e-4)


def test_voxel_downsample(cloud):
    ds = native.voxel_downsample(cloud, 0.5)
    assert 0 < ds.shape[0] < cloud.shape[0]
    # every output point is the centroid of a non-empty cell: it must
    # lie within the cloud's bounding box
    assert ds.min() >= cloud.min() - 1e-5
    assert ds.max() <= cloud.max() + 1e-5
    # downsampling an already-sparse cloud is identity-sized
    sparse = np.eye(3, dtype=np.float32) * 100
    assert native.voxel_downsample(sparse, 0.5).shape[0] == 3


def test_kdtree_matches_scipy(cloud):
    from scipy.spatial import cKDTree
    tree = native.KdTree(cloud)
    q = np.random.RandomState(1).randn(500, 3).astype(np.float32) * 2
    d, i = tree.query(q)
    dd, ii = cKDTree(cloud).query(q)
    np.testing.assert_allclose(d, dd.astype(np.float32) ** 2, rtol=1e-3,
                               atol=1e-4)
    assert (i == ii).mean() > 0.999


def test_kdtree_exact_hits(cloud):
    tree = native.KdTree(cloud)
    d, i = tree.query(cloud[10:20])
    np.testing.assert_allclose(d, 0.0, atol=1e-6)
    np.testing.assert_array_equal(i, np.arange(10, 20))


def test_kdtree_matches_pallas_reference(cloud):
    """The host KD-tree is the gold check for the device NN kernel."""
    import jax.numpy as jnp
    from fpv4d.ops.chamfer_ref import nn_distance_ref
    q = np.random.RandomState(2).randn(64, 3).astype(np.float32)
    d_ref, i_ref = nn_distance_ref(jnp.asarray(q[None]),
                                   jnp.asarray(cloud[None]))
    tree = native.KdTree(cloud)
    d, i = tree.query(q)
    np.testing.assert_allclose(d, np.asarray(d_ref)[0], rtol=1e-3,
                               atol=1e-4)
    assert (i == np.asarray(i_ref)[0]).mean() > 0.999


def test_native_cand_tables_match_numpy():
    """C++ voxel candidate-table builder == the numpy builder
    bit-for-bit on tie-free data (fpv4d.ops.nn.build_voxel_grid)."""
    from fpv4d.io import native as NAT
    from fpv4d.ops.nn import build_voxel_grid
    if not NAT.available():
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(4)
    pts = rng.randn(5000, 3).astype(np.float32) * 2
    gn = build_voxel_grid(pts, h=0.3, slots_per_cell=6)
    gp = build_voxel_grid(pts, h=0.3, slots_per_cell=6,
                          use_native=False)
    assert gn.dims == gp.dims and gn.h == gp.h
    np.testing.assert_array_equal(np.asarray(gn.cand_idx),
                                  np.asarray(gp.cand_idx))
    np.testing.assert_array_equal(np.asarray(gn.cand_pts),
                                  np.asarray(gp.cand_pts))
    np.testing.assert_array_equal(np.asarray(gn.origin),
                                  np.asarray(gp.origin))


def test_native_cand_tables_coarsening():
    """Cell-budget coarsening picks the same h as the numpy path."""
    from fpv4d.io import native as NAT
    from fpv4d.ops.nn import build_voxel_grid
    if not NAT.available():
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(5)
    pts = (rng.rand(2000, 3).astype(np.float32) * 40)   # big box
    gn = build_voxel_grid(pts, h=0.1, slots_per_cell=4, max_cells=5000)
    gp = build_voxel_grid(pts, h=0.1, slots_per_cell=4, max_cells=5000,
                          use_native=False)
    assert gn.h == gp.h and gn.dims == gp.dims
    np.testing.assert_array_equal(np.asarray(gn.cand_idx),
                                  np.asarray(gp.cand_idx))


# ---- adversarial PLY inputs (VERDICT r2: the native reader parses
# untrusted binary input; every hostile case must produce a clean
# Python-side error or correct values — never a segfault or an
# allocation driven by a lying header) -------------------------------------


def _hdr(count, fmt="binary_little_endian",
         props=("float x", "float y", "float z"), extra=""):
    lines = ["ply", f"format {fmt} 1.0", f"element vertex {count}"]
    lines += [f"property {p}" for p in props]
    if extra:
        lines.append(extra)
    lines.append("end_header")
    return ("\n".join(lines) + "\n").encode()


def test_ply_truncated_binary_body(tmp_path):
    """Header declares 100 vertices, file carries 10: clean error."""
    p = tmp_path / "trunc.ply"
    p.write_bytes(_hdr(100) + np.zeros((10, 3), "<f4").tobytes())
    with pytest.raises(Exception):
        native.read_ply_vertices(str(p))
    if native.available():
        assert native._load().fpv4d_ply_vertex_count(
            str(p).encode()) == -1


def test_ply_absurd_vertex_count(tmp_path):
    """A lying header (1e12 vertices in a 1 kB file) must not drive a
    multi-terabyte allocation."""
    p = tmp_path / "liar.ply"
    p.write_bytes(_hdr(10 ** 12) + b"\x00" * 1024)
    with pytest.raises(Exception):
        native.read_ply_vertices(str(p))
    if native.available():
        assert native._load().fpv4d_ply_vertex_count(
            str(p).encode()) == -1


def test_ply_negative_vertex_count(tmp_path):
    p = tmp_path / "neg.ply"
    p.write_bytes(_hdr(-5) + b"")
    with pytest.raises(Exception):
        native.read_ply_vertices(str(p))
    if native.available():
        assert native._load().fpv4d_ply_vertex_count(
            str(p).encode()) == -1


def test_ply_non_ply_garbage(tmp_path):
    p = tmp_path / "garbage.ply"
    p.write_bytes(b"\x89PNG\r\n\x1a\n" + bytes(range(256)) * 8)
    with pytest.raises(Exception):
        native.read_ply_vertices(str(p))
    if native.available():
        assert native._load().fpv4d_ply_vertex_count(
            str(p).encode()) == -1


def test_ply_overlong_header_line(tmp_path):
    p = tmp_path / "longline.ply"
    body = np.zeros((2, 3), "<f4").tobytes()
    p.write_bytes(b"ply\nformat binary_little_endian 1.0\n"
                  b"comment " + b"A" * 5000 + b"\n"
                  b"element vertex 2\nproperty float x\n"
                  b"property float y\nproperty float z\nend_header\n"
                  + body)
    # the native parser rejects the overlong line (falls back); either
    # path must end in correct values or a clean error — never UB
    try:
        v = native.read_ply_vertices(str(p))
        assert v.shape == (2, 3)
    except Exception:
        pass


def test_ply_big_endian_double_records(tmp_path, cloud):
    """binary_big_endian float64 coordinates parse correctly."""
    p = tmp_path / "be.ply"
    p.write_bytes(_hdr(len(cloud), fmt="binary_big_endian",
                       props=("double x", "double y", "double z"))
                  + cloud.astype(">f8").tobytes())
    v = native.read_ply_vertices(str(p))
    np.testing.assert_allclose(v, cloud, atol=1e-6)
    if native.available():
        lib = native._load()
        assert lib.fpv4d_ply_vertex_count(str(p).encode()) == len(cloud)


def test_ply_ascii_xyz_not_first_fields(tmp_path, cloud):
    """ascii rows whose x/y/z are NOT the leading fields (normals
    first) must be read by property ordinal, not position."""
    p = tmp_path / "norms.ply"
    rows = "".join(f"9 9 9 {x} {y} {z}\n" for x, y, z in cloud[:16])
    p.write_bytes(_hdr(16, fmt="ascii",
                       props=("float nx", "float ny", "float nz",
                              "float x", "float y", "float z"))
                  + rows.encode())
    v = native.read_ply_vertices(str(p))
    np.testing.assert_allclose(v, cloud[:16], atol=1e-5)


def test_ply_mixed_coord_sizes_falls_back(tmp_path):
    """x float64 but y/z float32: the native reader refuses (reading 8
    bytes at y_off could run past the record); the Python fallback
    parses it via numpy dtypes."""
    p = tmp_path / "mixed.ply"
    rec = np.zeros(4, dtype=[("x", "<f8"), ("y", "<f4"), ("z", "<f4")])
    rec["x"] = [1, 2, 3, 4]
    rec["y"] = [5, 6, 7, 8]
    rec["z"] = [9, 10, 11, 12]
    p.write_bytes(_hdr(4, props=("double x", "float y", "float z"))
                  + rec.tobytes())
    if native.available():
        assert native._load().fpv4d_ply_vertex_count(
            str(p).encode()) == -1
    v = native.read_ply_vertices(str(p))
    np.testing.assert_allclose(v[:, 0], [1, 2, 3, 4])
    np.testing.assert_allclose(v[:, 2], [9, 10, 11, 12])


def test_ply_binary_extra_trailing_data_ok(tmp_path, cloud):
    """Trailing bytes after the vertex records (e.g. a face element)
    must not confuse the count validation."""
    p = tmp_path / "trail.ply"
    p.write_bytes(_hdr(len(cloud)) + cloud.astype("<f4").tobytes()
                  + b"\x00" * 999)
    v = native.read_ply_vertices(str(p))
    np.testing.assert_allclose(v, cloud, atol=1e-6)


def test_ply_element_before_vertex_falls_back(tmp_path, cloud):
    """A spec-legal PLY that declares a non-empty element BEFORE the
    vertex element stores that element's data first; the native
    reader (which assumes vertex records start at end_header) must
    REFUSE rather than parse the camera bytes as vertices, and the
    Python fallback — which walks elements in order — must return the
    true cloud."""
    p = tmp_path / "cam_first.ply"
    hdr = (b"ply\nformat binary_little_endian 1.0\n"
           b"element camera 1\n"
           b"property float cx\nproperty float cy\nproperty float cz\n"
           + f"element vertex {len(cloud)}\n".encode()
           + b"property float x\nproperty float y\nproperty float z\n"
           b"end_header\n")
    cam = np.asarray([[9.0, 9.0, 9.0]], "<f4")
    p.write_bytes(hdr + cam.tobytes() + cloud.astype("<f4").tobytes())
    if native.available():
        assert native._load().fpv4d_ply_vertex_count(
            str(p).encode()) == -1
    v = native.read_ply_vertices(str(p))
    np.testing.assert_allclose(v, cloud, atol=1e-6)


def test_ply_overlong_ascii_row_falls_back(tmp_path):
    """An ascii row longer than the native reader's 4096-byte line
    buffer would otherwise be split, with the remainder parsed as the
    next row — the native path must bail and the fallback parse."""
    p = tmp_path / "long_row.ply"
    pad = " ".join(["7"] * 900)          # ~1800 chars of junk props
    props = ("float x", "float y", "float z") + tuple(
        f"float j{i}" for i in range(900))
    rows = (f"1.0 2.0 3.0 {pad}\n" * 3).encode()
    assert len(f"1.0 2.0 3.0 {pad}\n") < 4096  # row fits: sanity
    # make ONE row overlong by appending junk floats to it
    long_pad = " ".join(["7"] * 2500)
    rows = (f"1.0 2.0 3.0 {long_pad}\n".encode()
            + f"4.0 5.0 6.0 {long_pad}\n".encode())
    assert len(f"1.0 2.0 3.0 {long_pad}\n") > 4096
    props = ("float x", "float y", "float z") + tuple(
        f"float j{i}" for i in range(2500))
    p.write_bytes(_hdr(2, fmt="ascii", props=props) + rows)
    v = native.read_ply_vertices(str(p))
    np.testing.assert_allclose(v, [[1, 2, 3], [4, 5, 6]], atol=1e-6)


def test_cand_tables_nonfinite_scene_refused():
    """A scene with one inf/NaN vertex must make the native planner
    return cleanly (None from build_cand_tables -> numpy fallback),
    never undefined-behavior casts into the fill phase."""
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(0)
    pts = rng.randn(500, 3).astype(np.float32)
    for bad in (np.inf, -np.inf, np.nan, 1e30):
        poisoned = pts.copy()
        poisoned[7, 1] = bad
        assert native.build_cand_tables(poisoned, h=0.25,
                                        slots_per_cell=8,
                                        max_cells=500_000) is None
