"""Torch-checkpoint converters exercised on FABRICATED official-format
artifacts (same key names / dtypes / shapes as the licensed releases,
synthetic values) — so the convert -> load -> forward paths run in the
normal suite, not only under the gated real-artifact tests
(test_artifact_parity.py).

The GRU test is a true oracle: torch.nn.GRU's own forward vs our
gate-split conversion. The VPoser test drives the documented
architecture (VPoser v1 decoder: fc1 -> leaky_relu(0.2) -> fc2 ->
leaky_relu(0.2) -> out, fpv4d/models/vposer.py:1-12) through torch
Linears and compares the pre-codec 6D features. Reference artifact
loading being replaced: global_optimization.py:153-168.
"""
import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from fpv4d.models import motion_gru, vposer  # noqa: E402


def _vposer_torch_stack(seed=0):
    g = torch.Generator().manual_seed(seed)
    fc1 = torch.nn.Linear(32, 512)
    fc2 = torch.nn.Linear(512, 512)
    out = torch.nn.Linear(512, 21 * 6)
    for m in (fc1, fc2, out):
        with torch.no_grad():
            m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
            m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.01)
    sd = {}
    for name, m in (("bodyprior_dec_fc1", fc1),
                    ("bodyprior_dec_fc2", fc2),
                    ("bodyprior_dec_out", out)):
        sd[f"{name}.weight"] = m.weight.detach()
        sd[f"{name}.bias"] = m.bias.detach()
    return (fc1, fc2, out), sd


def test_vposer_converter_matches_torch_forward():
    (fc1, fc2, out), sd = _vposer_torch_stack()
    params = vposer.params_from_torch_state_dict(sd)
    x = torch.randn(5, 32, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        h = torch.nn.functional.leaky_relu(fc1(x), 0.2)
        h = torch.nn.functional.leaky_relu(fc2(h), 0.2)
        r6_t = out(h).numpy()
    xj = jnp.asarray(x.numpy())
    h = jnp.maximum(0.2 * (xj @ params["w1"] + params["b1"]),
                    xj @ params["w1"] + params["b1"])
    h = jnp.maximum(0.2 * (h @ params["w2"] + params["b2"]),
                    h @ params["w2"] + params["b2"])
    r6_j = np.asarray(h @ params["w3"] + params["b3"])
    np.testing.assert_allclose(r6_j, r6_t, atol=1e-5, rtol=1e-5)
    # and the full decode (6D codec included) is finite/shaped
    aa = vposer.decode(params, jnp.zeros((2, 32)))
    assert aa.shape == (2, 63) and np.all(np.isfinite(np.asarray(aa)))


def test_vposer_cli_loader_consumes_snapshot_layout(tmp_path):
    """cli.common.load_vposer on the official on-disk layout (a
    snapshot dir holding snapshots/*.pt of the state dict)."""
    from fpv4d.cli import common
    _, sd = _vposer_torch_stack(seed=2)
    snap = tmp_path / "vposer_v1_0" / "snapshots"
    snap.mkdir(parents=True)
    torch.save(sd, snap / "TR00_E096.pt")
    params = common.load_vposer(str(tmp_path / "vposer_v1_0"))
    direct = vposer.params_from_torch_state_dict(sd)
    for k in direct:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(direct[k]), err_msg=k)


def _gru_torch(seed=0):
    torch.manual_seed(seed)
    enc = torch.nn.GRU(motion_gru.IN_DIM, motion_gru.H_ENC)
    dec = torch.nn.GRU(motion_gru.H_ENC + motion_gru.EPS_DIM,
                       motion_gru.H_DEC)
    out = torch.nn.Linear(motion_gru.H_DEC, motion_gru.IN_DIM)
    sd = {}
    for prefix, m in (("gru_enc", enc), ("gru_dec", dec), ("out", out)):
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    return (enc, dec, out), sd


def test_gru_converter_matches_torch_gru():
    """True oracle: torch.nn.GRU forward vs the converted gate-split
    params through motion_gru.forward_seq — pins the (r|z|n) stacking
    convention and the bias folding."""
    (enc, dec, out), sd = _gru_torch()
    params = motion_gru.params_from_torch_state_dict(sd)
    B, S = 2, 3
    g = torch.Generator().manual_seed(3)
    pose_prev = torch.randn(B, motion_gru.IN_DIM, generator=g)
    noise = torch.randn(B, S, motion_gru.EPS_DIM, generator=g)
    with torch.no_grad():
        _, h_enc = enc(pose_prev[None])               # [1,B,H]
        h_dec = torch.zeros(1, B, motion_gru.H_DEC)
        poses_t = []
        for s in range(S):
            x = torch.cat([h_enc[0], noise[:, s]], dim=-1)
            _, h_dec = dec(x[None], h_dec)
            poses_t.append(out(h_dec[0]).numpy())
    want = np.stack(poses_t, axis=-1)                 # [B,32,S]
    got, _, _ = motion_gru.forward_seq(
        params, jnp.asarray(pose_prev.numpy()), seq_length=S,
        noise=jnp.asarray(noise.numpy()))
    np.testing.assert_allclose(np.asarray(got), want,
                               atol=1e-5, rtol=1e-4)


def test_gru_ckpt_drives_smoother(tmp_path):
    """Fabricated official-format GRU checkpoint consumed by the
    motion-mode smoother path (cli/smooth.py's model_state_dict
    contract), end-to-end to finite smoothed params."""
    from fpv4d.solve import frame_fit
    from fpv4d.config import FrameFitConfig
    _, sd = _gru_torch(seed=4)
    ckpt = tmp_path / "gru.pt"
    torch.save({"model_state_dict": sd}, ckpt)
    loaded = torch.load(ckpt, map_location="cpu", weights_only=False)
    params = motion_gru.params_from_torch_state_dict(
        loaded["model_state_dict"])
    body = np.zeros((4, 75), np.float32)
    body[:, 16:48] = np.random.RandomState(0).randn(4, 32) * 0.3
    out = frame_fit.fit_sequential_motion(
        jnp.asarray(body), params, FrameFitConfig(num_iter=5))
    assert out.shape == (4, 75)
    assert np.all(np.isfinite(np.asarray(out)))
