"""Unified NN front-end tests: voxel-grid accelerated vs brute-force,
custom VJP correctness, and the exact-at-argmin accuracy guarantee."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpv4d.ops import nn as NN
from fpv4d.ops.chamfer_ref import nn_distance_ref, nn_distance_chunked


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(0)
    # a floor plane plus a wall, dense enough for grid queries
    floor = np.stack([rng.uniform(-2, 2, 3000),
                      np.full(3000, -1.0) + 0.01 * rng.randn(3000),
                      rng.uniform(-2, 2, 3000)], 1)
    wall = np.stack([np.full(1000, 2.0) + 0.01 * rng.randn(1000),
                     rng.uniform(-1, 1, 1000),
                     rng.uniform(-2, 2, 1000)], 1)
    return np.concatenate([floor, wall]).astype(np.float32)


def test_chunked_matches_ref(scene):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 40, 3).astype(np.float32))
    y = jnp.asarray(scene)
    d1, i1 = nn_distance_chunked(x, y)
    d2, i2 = nn_distance_ref(x, y[None])
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-3)
    assert float((i1 == i2).mean()) > 0.999


def test_grid_exact_near_scene(scene):
    """Queries within one voxel of the scene must get the EXACT NN."""
    rng = np.random.RandomState(2)
    grid = NN.build_voxel_grid(scene, h=0.25, slots_per_cell=32)
    base = scene[rng.choice(len(scene), 200)]
    q = jnp.asarray(base + rng.randn(200, 3).astype(np.float32) * 0.03)
    d_grid, i_grid = NN.grid_nn(grid, q)
    d_ref, i_ref = nn_distance_ref(q[None], jnp.asarray(scene)[None])
    np.testing.assert_allclose(np.asarray(d_grid), np.asarray(d_ref)[0],
                               atol=1e-5)


def test_grid_far_saturates(scene):
    grid = NN.build_voxel_grid(scene, h=0.25)
    q = jnp.asarray(np.array([[50.0, 50.0, 50.0]], np.float32))
    d, i = NN.grid_nn(grid, q)
    assert float(d[0]) == NN.BIG
    assert int(i[0]) == -1


def test_grid_gradient_matches_exact(scene):
    rng = np.random.RandomState(3)
    grid = NN.build_voxel_grid(scene, h=0.25, slots_per_cell=32)
    base = scene[rng.choice(len(scene), 50)]
    q = jnp.asarray(base + rng.randn(50, 3).astype(np.float32) * 0.02)

    def loss_grid(q):
        d, _ = NN.grid_nn(grid, q)
        r = jnp.sqrt(d + 1e-4)
        return jnp.mean(r / (r + 1.0))

    def loss_ref(q):
        d, _ = nn_distance_ref(q[None], jnp.asarray(scene)[None])
        r = jnp.sqrt(d[0] + 1e-4)
        return jnp.mean(r / (r + 1.0))

    g1 = np.asarray(jax.grad(loss_grid)(q))
    g2 = np.asarray(jax.grad(loss_ref)(q))
    np.testing.assert_allclose(g1, g2, atol=1e-4, rtol=1e-3)


def test_grid_far_gradient_is_zero(scene):
    grid = NN.build_voxel_grid(scene, h=0.25)
    q = jnp.asarray(np.array([[50.0, 50.0, 50.0]], np.float32))
    g = jax.grad(lambda q: jnp.sum(NN.grid_nn(grid, q)[0]))(q)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_nn_brute_exact_at_argmin(scene):
    """The reported distance must be the exact f32 distance to the
    selected neighbor (no Gram-trick cancellation error)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 30, 3).astype(np.float32) * 2)
    y = jnp.asarray(scene)
    d, i = NN.nn_brute(x, y, "xla")
    exact = np.sum((np.asarray(x) - scene[np.asarray(i)]) ** 2, -1)
    np.testing.assert_allclose(np.asarray(d), exact, rtol=1e-6, atol=1e-7)


def test_nn_brute_grad(scene):
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(20, 3).astype(np.float32))
    y = jnp.asarray(scene)

    def loss(x, y):
        d, _ = NN.nn_brute(x, y, "xla")
        return jnp.sum(d)

    gx, gy = jax.grad(loss, argnums=(0, 1))(x, y)
    # analytic: 2*(x - nearest)
    _, i = NN.nn_brute(x, y, "xla")
    expected = 2 * (np.asarray(x) - scene[np.asarray(i)])
    np.testing.assert_allclose(np.asarray(gx), expected, atol=1e-5)
    # scene grads accumulate the negatives
    np.testing.assert_allclose(np.asarray(gy).sum(0), -expected.sum(0),
                               atol=1e-4)


def test_dispatch(scene):
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(10, 3).astype(np.float32))
    y = jnp.asarray(scene)
    grid = NN.build_voxel_grid(scene, h=0.25)
    d1, _ = NN.nn_distance(x, y, impl="xla")
    d2, _ = NN.nn_distance(x, y, impl="grid", grid=grid)
    assert d1.shape == d2.shape == (10,)
    with pytest.raises(ValueError):
        NN.nn_distance(x, y, impl="grid")


def test_grid_jittable(scene):
    grid = NN.build_voxel_grid(scene, h=0.25)
    q = jnp.asarray(np.random.RandomState(7).randn(16, 3), jnp.float32)
    f = jax.jit(lambda g, q: NN.grid_nn(g, q)[0])
    d = f(grid, q)
    assert d.shape == (16,)


def test_grid_min_dist_matches_grid_nn(scene):
    import jax
    rng = np.random.RandomState(8)
    grid = NN.build_voxel_grid(scene, h=0.25, slots_per_cell=32)
    q = jnp.asarray(scene[rng.choice(len(scene), 100)]
                    + rng.randn(100, 3).astype(np.float32) * 0.05)
    d1 = NN.grid_min_dist(grid, q)
    d2, _ = NN.grid_nn(grid, q)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    # autodiff gradient matches the custom-VJP gradient
    g1 = jax.grad(lambda q: jnp.sum(NN.grid_min_dist(grid, q)))(q)
    g2 = jax.grad(lambda q: jnp.sum(NN.grid_nn(grid, q)[0]))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_frame_candidates_nn_matches_plain():
    """Lazy-refresh contact NN: nn_to_candidates against the
    frame_candidates table == plain grid query when the per-frame
    unique-cell count fits the budget (the union is a superset of each
    query's own-cell candidates, so it can only be tighter)."""
    import jax
    import jax.numpy as jnp
    from fpv4d.ops import nn as NN

    rng = np.random.RandomState(8)
    scene = rng.randn(2000, 3).astype(np.float32) * 2.0
    grid = NN.build_voxel_grid(scene, h=0.4)
    # frame-coherent queries: tight clusters per frame
    T, N = 6, 50
    centers = rng.randn(T, 1, 3).astype(np.float32) * 1.5
    q = jnp.asarray(centers + rng.randn(T, N, 3).astype(np.float32)
                    * 0.15)
    d_plain = np.asarray(NN.grid_min_dist(grid, q))
    cands = NN.frame_candidates(grid, q, budget=128)
    d_cand = np.asarray(NN.nn_to_candidates(q, cands))
    np.testing.assert_allclose(d_cand, d_plain, atol=1e-6)

    # gradients agree (custom one-hot-matmul VJP vs autodiff gather)
    g_plain = np.asarray(jax.grad(
        lambda x: jnp.sum(NN.grid_min_dist(grid, x)))(q))
    g_cand = np.asarray(jax.grad(
        lambda x: jnp.sum(NN.nn_to_candidates(x, cands)))(q))
    np.testing.assert_allclose(g_cand, g_plain, atol=1e-5)

    # budget overflow: distances stay valid UPPER bounds of the true
    # NN (min over a subset of scene points), never phantom values
    cands2 = NN.frame_candidates(grid, q, budget=2)
    d_tiny = np.asarray(NN.nn_to_candidates(q, cands2))
    d_true, _ = NN.nn_brute(q, jnp.asarray(scene), "xla")
    assert np.all(d_tiny >= np.asarray(d_true) - 1e-6)

    # stale candidates: distances stay exact TO THE TABLE (upper
    # bound semantics), gradients stay finite
    q2 = q + 0.05
    d_stale = np.asarray(NN.nn_to_candidates(q2, cands))
    assert np.all(np.isfinite(d_stale))
    g = np.asarray(jax.grad(
        lambda x: jnp.sum(NN.nn_to_candidates(x, cands)))(q2))
    assert np.all(np.isfinite(g))


def test_nn_to_candidates_bf16_variant():
    """bf16-selection variant: distances match the f32 path up to
    near-tie winner drift, never undercut it, saturate on empty
    frames with zero gradient."""
    rng = np.random.RandomState(7)
    T, N, P = 6, 40, 32
    q = jnp.asarray(rng.randn(T, N, 3).astype(np.float32))
    cand = jnp.asarray(rng.randn(T, P, 3).astype(np.float32))
    valid = jnp.asarray(rng.rand(T, P) > 0.3).at[3].set(False)
    fc = NN.FrameCands(cand=cand, valid=valid)
    d_ref = np.asarray(NN.nn_to_candidates(q, fc))
    d_b = np.asarray(NN.nn_to_candidates_bf16(q, fc))
    # exact at the chosen winner -> upper bound of the true min
    assert np.all(d_b >= d_ref - 1e-6)
    # bf16 drift stays within ~1% of the selected distances
    np.testing.assert_allclose(d_b, d_ref, rtol=0.05, atol=0.05)
    assert np.all(d_b[3] == NN.BIG)
    g = np.asarray(jax.grad(
        lambda x: jnp.sum(NN.nn_to_candidates_bf16(x, fc)))(q))
    assert np.all(np.isfinite(g)) and np.all(g[3] == 0.0)


def test_candidate_saturated_distance_zero_gradient():
    """A valid candidate whose distance saturates at BIG yields a
    CONSTANT forward output, so the VJP must vanish — in the f32 path,
    the bf16-selection path, and the packed Pallas path alike
    (round-2 advisor finding)."""
    from fpv4d.ops import cand_pallas as CP
    # one frame, one far query (d^2 = 4e4 > BIG) + one near query
    q = jnp.asarray([[[200.0, 0.0, 0.0], [0.5, 0.0, 0.0]]],
                    jnp.float32)
    cand = jnp.zeros((1, 8, 3), jnp.float32)
    valid = jnp.ones((1, 8), bool)
    fc = NN.FrameCands(cand=cand, valid=valid)
    for fn in (NN.nn_to_candidates, NN.nn_to_candidates_bf16):
        d = np.asarray(fn(q, fc))
        assert d[0, 0] == NN.BIG and d[0, 1] < NN.BIG
        g = np.asarray(jax.grad(lambda x: jnp.sum(fn(x, fc)))(q))
        assert np.all(g[0, 0] == 0.0), fn
        assert np.any(g[0, 1] != 0.0), fn
    packed = CP.pack_candidates(cand, valid)
    fn = lambda x: jnp.sum(CP.cand_nn(x, packed, 8, True))
    d = np.asarray(CP.cand_nn(q, packed, 8, True))
    assert d[0, 0] == CP.BIG_SAT and d[0, 1] < CP.BIG_SAT
    g = np.asarray(jax.grad(fn)(q))
    assert np.all(g[0, 0] == 0.0) and np.any(g[0, 1] != 0.0)


def test_select_nearest_exact():
    """The factored two-level one-hot (r3: kills ~4 ms/step of HBM
    traffic) must extract cand[t, slot] EXACTLY, in both the factored
    (P % 32 == 0) and flat-fallback shapes."""
    rng = np.random.RandomState(11)
    for T, N, P in ((3, 17, 64), (2, 5, 24), (1, 7, 512)):
        cand = jnp.asarray(rng.randn(T, P, 3).astype(np.float32) * 7)
        slot = jnp.asarray(rng.randint(0, P, size=(T, N)))
        got = np.asarray(NN._select_nearest(slot, cand))
        want = np.asarray(cand)[np.arange(T)[:, None], np.asarray(slot)]
        np.testing.assert_array_equal(got, want)


def test_batched_grid_matches_single_beyond_small_bbox():
    """A batched grid pads each clip's table to the common dims.
    Queries past a SMALLER clip's own bbox must behave exactly like
    that clip's single grid (clamp into its occupied edge cells —
    finite distance, pulling gradient), not fall into empty padding
    (BIG, zero gradient). The padding is edge-replicated so the
    common-dims clamp IS the per-clip clamp."""
    rng = np.random.RandomState(3)
    small = np.stack([rng.uniform(-1, 1, 800),
                      np.full(800, -1.0),
                      rng.uniform(-1, 1, 800)], 1).astype(np.float32)
    big = np.stack([rng.uniform(-4, 4, 800),
                    np.full(800, -1.0),
                    rng.uniform(-4, 4, 800)], 1).astype(np.float32)
    g_small = NN.build_voxel_grid(small, h=0.4)
    g_batch = NN.build_voxel_grid_batch([small, big], h=0.4)

    # queries beyond the small clip's bbox in +x/+z (inside big's)
    q = jnp.asarray(rng.uniform(1.5, 3.5, (64, 3)).astype(np.float32))
    d_single, i_single = NN.grid_nn(g_small, q)
    g0 = NN.VoxelGrid(cand_pts=g_batch.cand_pts[0],
                      cand_idx=g_batch.cand_idx[0],
                      origin=g_batch.origin[0],
                      dims=g_batch.dims, h=g_batch.h)
    d_batch, i_batch = NN.grid_nn(g0, q)
    np.testing.assert_allclose(np.asarray(d_batch),
                               np.asarray(d_single), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_batch),
                                  np.asarray(i_single))


def test_compact_candidates_keeps_distinct_nns():
    """Refresh-time compaction (compact_candidates): with P_out >= the
    number of distinct per-query NNs, every query's nearest neighbor
    survives, so nn_to_candidates distances are IDENTICAL to the
    uncompacted table's. (The contention score is exactly 0 for every
    candidate that is some query's NN, so top_k keeps them all.)"""
    rng = np.random.RandomState(11)
    T, N, P = 5, 48, 96
    q = jnp.asarray(rng.randn(T, N, 3).astype(np.float32))
    cand = jnp.asarray(rng.randn(T, P, 3).astype(np.float32))
    valid = jnp.asarray(rng.rand(T, P) > 0.2)
    fc = NN.FrameCands(cand=cand, valid=valid)

    d_full = np.asarray(NN.nn_to_candidates(q, fc))
    # distinct winners per frame (<= N=48 <= P_out=64)
    fc2 = NN.compact_candidates(q, fc, 64)
    assert fc2.cand.shape == (T, 64, 3)
    d_comp = np.asarray(NN.nn_to_candidates(q, fc2))
    np.testing.assert_allclose(d_comp, d_full, rtol=1e-6, atol=1e-6)

    # jit + vmap (the sharded refresh path) agree with eager
    fc3 = jax.jit(lambda a, b: NN.compact_candidates(a, b, 64))(q, fc)
    np.testing.assert_allclose(np.asarray(fc3.cand),
                               np.asarray(fc2.cand))
    qb = jnp.stack([q, q + 0.1])
    fcb = NN.FrameCands(cand=jnp.stack([cand, cand]),
                        valid=jnp.stack([valid, valid]))
    fcv = jax.vmap(lambda a, b: NN.compact_candidates(a, b, 64))(qb, fcb)
    np.testing.assert_allclose(np.asarray(fcv.cand[0]),
                               np.asarray(fc2.cand))

    # P_out >= P: unchanged table (same object semantics)
    fc_same = NN.compact_candidates(q, fc, P)
    assert fc_same is fc


def test_compact_candidates_all_valid_kept_when_fits():
    """P_out >= the number of VALID candidates: compaction is lossless
    (every valid candidate survives; padding slots carry valid=False),
    so even far-field / drifted queries see identical distances."""
    rng = np.random.RandomState(12)
    T, N, P = 4, 20, 64
    q = jnp.asarray(rng.randn(T, N, 3).astype(np.float32))
    cand = jnp.asarray(rng.randn(T, P, 3).astype(np.float32))
    valid = jnp.asarray(np.arange(P)[None, :] < 24).repeat(T, 0)
    fc = NN.FrameCands(cand=cand, valid=valid)
    fc2 = NN.compact_candidates(q, fc, 32)
    assert int(np.asarray(fc2.valid).sum()) == T * 24
    # drifted queries: distances identical (set equality of candidates)
    q2 = q + 0.3
    d_full = np.asarray(NN.nn_to_candidates(q2, fc))
    d_comp = np.asarray(NN.nn_to_candidates(q2, fc2))
    np.testing.assert_allclose(d_comp, d_full, rtol=1e-6, atol=1e-6)


def test_compact_candidates_upper_bound_and_grads():
    """Aggressive compaction (P_out < distinct NNs): distances stay
    valid UPPER bounds of the uncompacted table's (min over a kept
    subset), and gradients through nn_to_candidates remain finite —
    the same contract as a budget-overflowing frame_candidates
    table."""
    rng = np.random.RandomState(13)
    T, N, P = 3, 64, 96
    q = jnp.asarray(rng.randn(T, N, 3).astype(np.float32))
    cand = jnp.asarray(rng.randn(T, P, 3).astype(np.float32))
    fc = NN.FrameCands(cand=cand, valid=jnp.ones((T, P), bool))
    fc2 = NN.compact_candidates(q, fc, 32)
    d_full = np.asarray(NN.nn_to_candidates(q, fc))
    d_comp = np.asarray(NN.nn_to_candidates(q, fc2))
    assert np.all(d_comp >= d_full - 1e-6)
    g = np.asarray(jax.grad(
        lambda x: jnp.sum(NN.nn_to_candidates(x, fc2)))(q))
    assert np.all(np.isfinite(g))
