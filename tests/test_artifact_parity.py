"""Real-artifact parity gates.

The licensed SMPL-X npz / VPoser ckpt are never committed (CLAUDE.md),
so two layers of protection:

  * ALWAYS RUN: a synthetic npz written in the OFFICIAL artifact key
    layout (shapedirs [V,3,300+expr] stacked, posedirs [V,3,(J-1)*9],
    hands_components* [45,45], keys named as in SMPLX_NEUTRAL.npz) is
    round-tripped through fpv4d.models.smplx.load_npz and must
    reproduce the source model's forward exactly — this pins the
    loader's slicing/reshape conventions against the published layout
    (reference loads the real artifact at global_optimization.py:154-168).
  * GATED (skipif absent): when a real SMPLX_NEUTRAL.npz / VPoser
    snapshot is present (FPV4D_SMPLX_NPZ / FPV4D_VPOSER_CKPT env, or
    ./models paths), load them through the production converters and
    check the BASELINE.md <=1mm target against the independent torch
    oracle of test_smplx.py.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from fpv4d.models import smplx as jsmplx
from fpv4d.models import vposer
from tests.test_smplx import torch_smplx_forward, random_inputs

SMPLX_NPZ = os.environ.get("FPV4D_SMPLX_NPZ", "models/SMPLX_NEUTRAL.npz")
VPOSER_CKPT = os.environ.get("FPV4D_VPOSER_CKPT",
                             "vposer/snapshots/TR00_E096.pt")


def write_official_layout_npz(path, model, num_expr=10):
    """Serialize a SmplxModel into the official SMPL-X npz key layout."""
    V = model.num_verts
    shapedirs = np.zeros((V, 3, 300 + 100), np.float32)
    nb = model.shapedirs.shape[-1]
    shapedirs[..., :nb] = np.asarray(model.shapedirs)
    shapedirs[..., 300:300 + num_expr] = np.asarray(model.exprdirs)
    # ours: [(J-1)*9, V*3]; official: [V, 3, (J-1)*9]
    posedirs = np.asarray(model.posedirs).T.reshape(V, 3, -1)
    hands_l = np.zeros((45, 45), np.float32)
    hands_r = np.zeros((45, 45), np.float32)
    hands_l[:model.hands_components_l.shape[0]] = np.asarray(
        model.hands_components_l)
    hands_r[:model.hands_components_r.shape[0]] = np.asarray(
        model.hands_components_r)
    np.savez(
        path,
        v_template=np.asarray(model.v_template),
        shapedirs=shapedirs,
        posedirs=posedirs,
        J_regressor=np.asarray(model.j_regressor),
        weights=np.asarray(model.lbs_weights),
        hands_componentsl=hands_l,
        hands_componentsr=hands_r,
        hands_meanl=np.asarray(model.hands_mean_l),
        hands_meanr=np.asarray(model.hands_mean_r),
        f=model.faces,
        kintree_table=np.stack(
            [np.asarray(jsmplx.PARENTS), np.arange(55)]),
        lmk_faces_idx=np.asarray(model.lmk_faces_idx),
        lmk_bary_coords=np.asarray(model.lmk_bary_coords),
    )


def test_load_npz_official_layout_roundtrip(tmp_path):
    src = jsmplx.synthetic_model(num_verts=256, seed=11)
    path = str(tmp_path / "SMPLX_SYNTH.npz")
    write_official_layout_npz(path, src)
    loaded = jsmplx.load_npz(path)

    assert loaded.num_verts == src.num_verts
    inp = {k: jnp.asarray(v) for k, v in random_inputs(3, seed=5).items()}
    out_src = src(**inp)
    out_ld = loaded(**inp)
    np.testing.assert_allclose(np.asarray(out_ld["vertices"]),
                               np.asarray(out_src["vertices"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_ld["joints"]),
                               np.asarray(out_src["joints"]), atol=1e-6)
    # faces + face-landmark embedding survive the trip
    np.testing.assert_array_equal(loaded.faces, src.faces)
    np.testing.assert_array_equal(loaded.lmk_faces_idx,
                                  src.lmk_faces_idx)
    np.testing.assert_allclose(loaded.lmk_bary_coords,
                               src.lmk_bary_coords, atol=0)


def test_load_npz_expression_slot(tmp_path):
    """Expression blendshapes live at columns 300+ of the official
    shapedirs; the loader must pick them up (not the zero columns
    10..300)."""
    src = jsmplx.synthetic_model(num_verts=128, seed=12)
    path = str(tmp_path / "SMPLX_SYNTH.npz")
    write_official_layout_npz(path, src)
    loaded = jsmplx.load_npz(path)
    expr = jnp.asarray(np.random.RandomState(0).randn(2, 10)
                       .astype(np.float32))
    base = {k: jnp.zeros((2, d)) for k, d in
            [("betas", 10), ("global_orient", 3), ("body_pose", 63),
             ("transl", 3)]}
    out0 = loaded(**base)
    out1 = loaded(expression=expr, **base)
    assert float(jnp.abs(out1["vertices"]
                         - out0["vertices"]).max()) > 1e-4


@pytest.mark.skipif(not os.path.exists(SMPLX_NPZ),
                    reason=f"real SMPL-X artifact not present "
                           f"({SMPLX_NPZ}); licensed, never committed")
def test_real_smplx_artifact_parity():
    model = jsmplx.load_npz(SMPLX_NPZ)
    assert model.num_verts == 10475
    inp = random_inputs(4, seed=9)
    ours = model(**{k: jnp.asarray(v) for k, v in inp.items()})
    tv, tj = torch_smplx_forward(
        model, inp["betas"], inp["global_orient"], inp["body_pose"],
        inp["transl"], inp["left_hand_pose"], inp["right_hand_pose"])
    # BASELINE.md target: mean vertex error <= 1mm
    assert np.abs(np.asarray(ours["vertices"]) - tv).mean() < 1e-3
    assert np.abs(np.asarray(ours["joints"]) - tj).mean() < 1e-3


@pytest.mark.skipif(not os.path.exists(VPOSER_CKPT),
                    reason=f"real VPoser ckpt not present "
                           f"({VPOSER_CKPT}); licensed, never committed")
def test_real_vposer_ckpt_decodes():
    import torch
    sd = torch.load(VPOSER_CKPT, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = vposer.params_from_torch_state_dict(sd)
    aa = vposer.decode(params, jnp.zeros((2, 32)))
    assert aa.shape == (2, 63)
    assert np.all(np.isfinite(np.asarray(aa)))
