"""Reference-numerics oracle tests.

These run small, cited ports of the reference's OWN torch code (not
our reading of it) against our JAX implementations, so a convention
drift between fpv4d and the published 4DCapture-FPV code fails loudly.
torch is installed in this environment; torchgeometry is not, so only
the pure-torch reference paths are oracled here (the tgm-based
Rodrigues is covered by round-trip + independent-formula tests in
test_rotations.py).

Oracles:
  * distChamfer (chamfer_python.py:18-28) — the Gram-matrix chamfer,
    with the hardcoded `torch.cuda.LongTensor` at :24 swapped for CPU.
  * ContinousRotReprDecoder.decode (cvae.py:62-72) — Gram-Schmidt 6D
    rotation decode.
  * the 6D-encode slicing convention `xr_mat[:, :, :-1].reshape(-1,6)`
    (global_optimization.py:101-102).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fpv4d.core import rotations
from fpv4d.ops import chamfer_ref
from fpv4d.ops import nn as NN


# -- reference ports (behavioral oracles, cited) ---------------------------

def ref_dist_chamfer(a, b):
    """chamfer_python.py:18-28 verbatim semantics, CPU LongTensor."""
    x, y = a, b
    bs, num_points, points_dim = x.size()
    xx = torch.bmm(x, x.transpose(2, 1))
    yy = torch.bmm(y, y.transpose(2, 1))
    zz = torch.bmm(x, y.transpose(2, 1))
    diag_ind_x = torch.arange(0, num_points).type(torch.LongTensor)
    diag_ind_y = torch.arange(0, y.size(1)).type(torch.LongTensor)
    rx = xx[:, diag_ind_x, diag_ind_x].unsqueeze(1).expand(
        xx.size(0), yy.size(1), xx.size(1))
    ry = yy[:, diag_ind_y, diag_ind_y].unsqueeze(1).expand(
        yy.size(0), xx.size(1), yy.size(1))
    P = rx.transpose(2, 1) + ry - 2 * zz
    return (torch.min(P, 1)[0], torch.min(P, 2)[0],
            torch.min(P, 1)[1], torch.min(P, 2)[1])


def ref_rot6d_decode(module_input):
    """cvae.py:62-72 verbatim semantics (pure torch)."""
    import torch.nn.functional as F
    reshaped_input = module_input.view(-1, 3, 2)
    b1 = F.normalize(reshaped_input[:, :, 0], dim=1)
    dot_prod = torch.sum(b1 * reshaped_input[:, :, 1], dim=1,
                         keepdim=True)
    b2 = F.normalize(reshaped_input[:, :, 1] - dot_prod * b1, dim=-1)
    b3 = torch.cross(b1, b2, dim=1)
    return torch.stack([b1, b2, b3], dim=-1)


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.RandomState(7)
    a = rng.randn(2, 64, 3).astype(np.float32)
    b = rng.randn(2, 96, 3).astype(np.float32) * 1.5 + 0.2
    return a, b


def test_chamfer_ref_matches_reference(clouds):
    """chamfer_ref.chamfer_ref == reference distChamfer (values AND
    argmin indices) on random batched clouds."""
    a, b = clouds
    # reference returns (min over dim1 = per-b-point nearest a,
    #                    min over dim2 = per-a-point nearest b)
    d_per_b_t, d_per_a_t, i_per_b_t, i_per_a_t = ref_dist_chamfer(
        torch.from_numpy(a), torch.from_numpy(b))
    # ours returns (per-a-point, per-b-point, ...)
    d_per_a, d_per_b, i_per_a, i_per_b = chamfer_ref.chamfer_ref(
        jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(d_per_a),
                               d_per_a_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(d_per_b),
                               d_per_b_t.numpy(), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(i_per_a),
                                  i_per_a_t.numpy())
    np.testing.assert_array_equal(np.asarray(i_per_b),
                                  i_per_b_t.numpy())


def test_nn_brute_matches_reference(clouds):
    """The production NN paths (xla chunked; the grid path is exact
    within a voxel) agree with the reference chamfer min over dim 2."""
    a, b = clouds
    _, d_ba_t, _, i_ba_t = ref_dist_chamfer(torch.from_numpy(a),
                                            torch.from_numpy(b))
    for impl in ("xla", "ref"):
        d, idx = NN.nn_brute(jnp.asarray(a[0]), jnp.asarray(b[0]), impl)
        np.testing.assert_allclose(np.asarray(d), d_ba_t[0].numpy(),
                                   atol=2e-4)
        np.testing.assert_array_equal(np.asarray(idx),
                                      i_ba_t[0].numpy())


def test_contact_gradient_matches_reference(clouds):
    """d/dx of the robust contact energy mean(sqrt(d)/(sqrt(d)+1))
    (global_optimization.py:295) via our custom-VJP NN matches torch
    autograd through the reference distChamfer."""
    a, b = clouds
    at = torch.from_numpy(a).requires_grad_(True)
    bt = torch.from_numpy(b)
    _, d_ba, _, _ = ref_dist_chamfer(at, bt)
    r = torch.sqrt(d_ba.clamp_min(0) + 1e-4)
    (r / (r + 1.0)).mean().backward()
    g_ref = at.grad.numpy()

    def loss(x):
        d, _ = NN.nn_brute(x, jnp.asarray(b[0]), "xla")
        rr = jnp.sqrt(d + 1e-4)
        return jnp.mean(rr / (rr + 1.0))

    # torch meaned over both batch entries; ours over batch 0 only
    g = np.asarray(jax.grad(loss)(jnp.asarray(a[0])))
    np.testing.assert_allclose(g, g_ref[0] * a.shape[0], atol=1e-5)


def test_rot6d_decode_matches_reference():
    rng = np.random.RandomState(3)
    r6 = rng.randn(32, 6).astype(np.float32)
    R_ref = ref_rot6d_decode(torch.from_numpy(r6)).numpy()
    R = np.asarray(rotations.rot6d_to_matrot(jnp.asarray(r6)))
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rot6d_encode_convention_matches_reference():
    """matrot_to_rot6d must equal the torch slicing
    `xr_mat[:, :, :-1].reshape(-1, 6)` (global_optimization.py:101-102)."""
    rng = np.random.RandomState(4)
    aa = rng.randn(16, 3).astype(np.float32)
    R = np.asarray(rotations.aa_to_matrot(jnp.asarray(aa)))
    enc_ref = torch.from_numpy(R)[:, :, :-1].reshape(-1, 6).numpy()
    enc = np.asarray(rotations.matrot_to_rot6d(jnp.asarray(R)))
    np.testing.assert_allclose(enc, enc_ref, atol=0)


def test_param_lift_roundtrip_against_reference_slicing():
    """convert_to_6D_rot keeps [:3] and [6:] slots untouched and
    re-encodes only the rotation slot (global_optimization.py:96-105);
    params_to_6d must do the same."""
    rng = np.random.RandomState(5)
    x75 = rng.randn(8, 75).astype(np.float32) * 0.3
    x78 = np.asarray(rotations.params_to_6d(jnp.asarray(x75)))
    np.testing.assert_allclose(x78[:, :3], x75[:, :3], atol=0)
    np.testing.assert_allclose(x78[:, 9:], x75[:, 6:], atol=0)
    R = ref_rot6d_decode(torch.from_numpy(x78[:, 3:9])).numpy()
    R_direct = np.asarray(rotations.aa_to_matrot(
        jnp.asarray(x75[:, 3:6])))
    np.testing.assert_allclose(R, R_direct, atol=1e-5)
