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
