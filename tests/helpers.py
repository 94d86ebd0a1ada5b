"""Shared synthetic-scenario builders for solver tests."""
import numpy as np
import jax.numpy as jnp

from fpv4d.models import smplx as jsmplx
from fpv4d.models import vposer
from fpv4d.ops import contact


def smooth_noise(T, dim, rng, scale=1.0, smooth=5):
    """Temporally smooth random sequence [T, dim]."""
    x = rng.randn(T + 2 * smooth, dim)
    k = np.ones(2 * smooth + 1) / (2 * smooth + 1)
    x = np.stack([np.convolve(x[:, i], k, mode="valid")
                  for i in range(dim)], axis=1)
    return (x[:T] * scale).astype(np.float32)


def make_scenario(T=12, num_verts=256, seed=0, scene_pts=400):
    """A tiny but complete clip-solve scenario: model, vposer, smooth
    body-parameter sequence, floor-plane scene cloud, camera inits."""
    rng = np.random.RandomState(seed)
    model = jsmplx.synthetic_model(num_verts=num_verts, seed=seed)
    vp = vposer.random_params(seed=seed)

    body = np.zeros((T, 75), dtype=np.float32)
    body[:, 0:3] = smooth_noise(T, 3, rng, 0.3)           # transl
    body[:, 3:6] = smooth_noise(T, 3, rng, 0.2)           # orient
    body[:, 6:16] = rng.randn(10).astype(np.float32) * 0.3  # betas (const)
    body[:, 16:48] = smooth_noise(T, 32, rng, 0.5)        # vposer latent
    body[:, 48:72] = smooth_noise(T, 24, rng, 0.2)        # hands
    body[:, 72:75] = smooth_noise(T, 3, rng, 0.2)         # camera transl

    # floor plane + wall as the scene cloud
    g = int(np.sqrt(scene_pts))
    xs, zs = np.meshgrid(np.linspace(-3, 3, g), np.linspace(-3, 3, g))
    floor = np.stack([xs.ravel(), np.full(g * g, -1.0), zs.ravel()],
                     axis=1).astype(np.float32)
    scene = jnp.asarray(floor)

    cam = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    cam[:, :3, 3] = smooth_noise(T, 3, rng, 0.5)

    segs = contact.synthetic_segments(num_verts, seed=seed)
    vids_l = np.asarray(segs["L_Leg"], np.int32)
    vids_r = np.asarray(segs["R_Leg"], np.int32)
    vids = np.concatenate([vids_l, vids_r])

    return dict(model=model, vp=vp, body=jnp.asarray(body),
                scene=scene, camera_ext=jnp.asarray(cam),
                vids=vids, vids_l=vids_l, vids_r=vids_r, rng=rng)
