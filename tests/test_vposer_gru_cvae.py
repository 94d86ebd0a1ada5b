import numpy as np
import jax
import jax.numpy as jnp

from fpv4d.models import vposer, motion_gru, cvae


def test_vposer_decode_shapes():
    p = vposer.random_params()
    z = jnp.asarray(np.random.RandomState(0).randn(7, 32), dtype=jnp.float32)
    aa = vposer.decode(p, z, output_type="aa")
    assert aa.shape == (7, 63)
    mats = vposer.decode(p, z, output_type="matrot")
    assert mats.shape == (7, 21, 3, 3)
    # decoded matrices are valid rotations
    m = np.asarray(mats).reshape(-1, 3, 3)
    np.testing.assert_allclose(
        np.matmul(m, np.transpose(m, (0, 2, 1))),
        np.tile(np.eye(3), (m.shape[0], 1, 1)), atol=1e-4)


def test_vposer_zero_latent_small_pose():
    p = vposer.random_params()
    aa = vposer.decode(p, jnp.zeros((1, 32)))
    # identity-biased output head -> near-zero pose at the origin
    assert float(jnp.abs(aa).max()) < 0.3


def test_vposer_grad_flows():
    p = vposer.random_params()

    def loss(z):
        return jnp.sum(vposer.decode(p, z) ** 2)

    g = jax.grad(loss)(jnp.ones((2, 32)) * 0.1)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_vposer_latent_prior():
    z = jnp.ones((4, 32)) * 2.0
    assert float(vposer.latent_prior_loss(z)) == 4.0


def test_vposer_torch_state_dict_conversion():
    import torch
    torch.manual_seed(0)
    sd = {
        "bodyprior_dec_fc1.weight": torch.randn(512, 32),
        "bodyprior_dec_fc1.bias": torch.randn(512),
        "bodyprior_dec_fc2.weight": torch.randn(512, 512),
        "bodyprior_dec_fc2.bias": torch.randn(512),
        "bodyprior_dec_out.weight": torch.randn(126, 512),
        "bodyprior_dec_out.bias": torch.randn(126),
    }
    p = vposer.params_from_torch_state_dict(sd)
    z = jnp.zeros((1, 32))
    out = vposer.decode(p, z)
    # independent torch forward of the same net
    h = torch.nn.functional.leaky_relu(
        torch.zeros(1, 32) @ sd["bodyprior_dec_fc1.weight"].T
        + sd["bodyprior_dec_fc1.bias"], 0.2)
    h = torch.nn.functional.leaky_relu(
        h @ sd["bodyprior_dec_fc2.weight"].T + sd["bodyprior_dec_fc2.bias"],
        0.2)
    r6 = (h @ sd["bodyprior_dec_out.weight"].T
          + sd["bodyprior_dec_out.bias"]).view(21, 6).numpy()
    from fpv4d.core.rotations import rot6d_to_aa
    expected = np.asarray(rot6d_to_aa(jnp.asarray(r6))).reshape(-1)
    np.testing.assert_allclose(np.asarray(out[0]), expected, atol=1e-5)


def test_gru_forward_seq_contract():
    p = motion_gru.random_params()
    pose_prev = jnp.asarray(
        np.random.RandomState(1).randn(3, 32, 1), dtype=jnp.float32)
    h_enc = jnp.zeros((3, 1, 512))
    h_dec = jnp.zeros((3, 1, 512))
    pred, he, hd = motion_gru.forward_seq(p, pose_prev, seq_length=1,
                                          h_enc=h_enc, h_dec=h_dec)
    # matches reference call site: pose_pred[:, :, -1] is the next pose
    assert pred.shape == (3, 32, 1)
    assert he.shape == (3, 1, 512) and hd.shape == (3, 1, 512)
    # hidden state actually evolves
    assert float(jnp.abs(hd).max()) > 0


def test_gru_multi_step():
    p = motion_gru.random_params()
    pred, _, _ = motion_gru.forward_seq(
        p, jnp.ones((2, 32)) * 0.1, seq_length=5)
    assert pred.shape == (2, 32, 5)
    assert np.all(np.isfinite(np.asarray(pred)))


def test_cvae_roundtrip_shapes():
    p = cvae.random_params(seed=1)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 72), dtype=jnp.float32)
    zs = jnp.asarray(rng.randn(4, 128), dtype=jnp.float32)
    eps = jnp.asarray(rng.randn(4, 64), dtype=jnp.float32)
    rec, mu, ls = cvae.forward(p, x, eps, zs)
    assert rec.shape == (4, 72)
    assert mu.shape == (4, 64) and ls.shape == (4, 64)
    assert float(cvae.kl_loss(mu, ls)) >= 0.0


def test_cvae_trains_one_step():
    import optax
    p = cvae.random_params(seed=3)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(16, 72), dtype=jnp.float32)
    zs = jnp.asarray(rng.randn(16, 128), dtype=jnp.float32)
    eps = jnp.zeros((16, 64))

    def loss_fn(p):
        rec, mu, ls = cvae.forward(p, x, eps, zs)
        return jnp.mean((rec - x) ** 2) + 0.001 * cvae.kl_loss(mu, ls)

    opt = optax.adam(1e-3)
    state = opt.init(p)
    l0 = loss_fn(p)
    for _ in range(20):
        g = jax.grad(loss_fn)(p)
        upd, state = opt.update(g, state)
        p = optax.apply_updates(p, upd)
    assert float(loss_fn(p)) < float(l0)


def test_cvae_decoder_dropout():
    """The reference's dropout_ratio knob (cvae.py:105-127,160-166):
    identity without an rng key (eval semantics) and at ratio 0;
    train-mode dropout zeroes units and rescales survivors (inverted
    dropout keeps the expectation), and randomizes with the key."""
    p = cvae.random_params(seed=1)
    rng = np.random.RandomState(5)
    z = jnp.asarray(rng.randn(8, 64), dtype=jnp.float32)
    zs = jnp.asarray(rng.randn(8, 128), dtype=jnp.float32)
    base = cvae.decode(p, z, zs)
    # no key -> identity regardless of the ratio (torch eval())
    np.testing.assert_allclose(
        np.asarray(cvae.decode(p, z, zs, dropout_ratio=0.5)),
        np.asarray(base))
    # ratio 0 with a key -> identity too
    key = jax.random.PRNGKey(0)
    np.testing.assert_allclose(
        np.asarray(cvae.decode(p, z, zs, 0.0, key)), np.asarray(base))
    # train mode: output differs, and differs per key
    d1 = cvae.decode(p, z, zs, 0.5, key)
    d2 = cvae.decode(p, z, zs, 0.5, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(d1), np.asarray(base))
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    # forward threads the knob through
    eps = jnp.zeros((8, 64))
    x = jnp.asarray(rng.randn(8, 72), dtype=jnp.float32)
    rec, _, _ = cvae.forward(p, x, eps, zs, 0.5, key)
    assert rec.shape == (8, 72)
