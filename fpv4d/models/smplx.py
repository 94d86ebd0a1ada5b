"""Pure-JAX SMPL-X body model.

TPU-native replacement for the external ``smplx`` PyTorch package the
reference drives at global_optimization.py:154-168,280-298: shape and
expression blendshapes, pose-dependent corrective blendshapes, hand
PCA, a 55-joint kinematic chain, and linear blend skinning over 10,475
vertices — all expressed as einsums/matmuls so XLA tiles them onto the
MXU, with the frame axis as a leading batch dimension (one whole clip
per forward).

Model data loads from the official SMPL-X ``.npz`` artifacts when
available; ``synthetic_model`` builds a deterministic, geometrically
plausible stand-in (for tests and benchmarks — the artifact itself is
licensed and not redistributable).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from fpv4d.core.rotations import aa_to_matrot

# SMPL-X joint tree: 22 body joints, jaw, two eyes, 2x15 hand joints.
NUM_JOINTS = 55
NUM_BODY_JOINTS = 21          # body_pose covers joints 1..21
PARENTS: Tuple[int, ...] = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
    18, 19, 15, 15, 15,
    # left hand: index, middle, pinky, ring, thumb (3 links each)
    20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
    # right hand
    21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,
)

JOINT_NAMES_BODY = (
    "pelvis", "left_hip", "right_hip", "spine1", "left_knee",
    "right_knee", "spine2", "left_ankle", "right_ankle", "spine3",
    "left_foot", "right_foot", "neck", "left_collar", "right_collar",
    "head", "left_shoulder", "right_shoulder", "left_elbow",
    "right_elbow", "left_wrist", "right_wrist", "jaw", "left_eye",
    "right_eye",
)


class _StaticArray:
    """Hashable wrapper so a numpy array can ride in pytree aux data
    (compared by content, hashed by shape/dtype/bytes)."""

    __slots__ = ("arr", "_key")

    def __init__(self, arr):
        self.arr = np.asarray(arr)
        self._key = (self.arr.shape, self.arr.dtype.str,
                     self.arr.tobytes())

    def __eq__(self, other):
        return isinstance(other, _StaticArray) and self._key == other._key

    def __hash__(self):
        return hash((self._key[0], self._key[1], hash(self._key[2])))


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SmplxModel:
    """SMPL-X model tables. Array fields are pytree leaves (device
    arrays); ``faces`` and sizes are static aux data."""

    v_template: jnp.ndarray        # [V, 3]
    shapedirs: jnp.ndarray         # [V, 3, n_betas]
    exprdirs: jnp.ndarray          # [V, 3, n_expr]
    posedirs: jnp.ndarray          # [(J-1)*9, V*3]
    j_regressor: jnp.ndarray       # [J, V]
    lbs_weights: jnp.ndarray       # [V, J]
    hands_components_l: jnp.ndarray  # [n_pca, 45]
    hands_components_r: jnp.ndarray  # [n_pca, 45]
    hands_mean_l: jnp.ndarray      # [45]
    hands_mean_r: jnp.ndarray      # [45]
    faces: np.ndarray = field(compare=False)   # [F, 3] int32, host-side
    flat_hand_mean: bool = False
    # static face-landmark embedding (official artifact keys
    # lmk_faces_idx/lmk_bary_coords): 51 barycentric points on mesh
    # triangles, matching OpenPose face slots 17:68 (SMPLify-X fits
    # jaw/expression against these)
    lmk_faces_idx: Optional[np.ndarray] = field(default=None,
                                                compare=False)  # [L]
    lmk_bary_coords: Optional[np.ndarray] = field(default=None,
                                                  compare=False)  # [L,3]

    # -- pytree plumbing ----------------------------------------------------
    _LEAVES = ("v_template", "shapedirs", "exprdirs", "posedirs",
               "j_regressor", "lbs_weights", "hands_components_l",
               "hands_components_r", "hands_mean_l", "hands_mean_r")

    def tree_flatten(self):
        leaves = tuple(getattr(self, k) for k in self._LEAVES)
        # aux data must be hashable with simple equality (jit cache
        # keys) — wrap the faces array
        wrap = lambda a: None if a is None else _StaticArray(a)
        return leaves, (_StaticArray(self.faces), self.flat_hand_mean,
                        wrap(self.lmk_faces_idx),
                        wrap(self.lmk_bary_coords))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        faces, flat_hand_mean, lmk_f, lmk_b = aux
        unwrap = lambda a: None if a is None else a.arr
        return cls(*leaves, faces=faces.arr,
                   flat_hand_mean=flat_hand_mean,
                   lmk_faces_idx=unwrap(lmk_f),
                   lmk_bary_coords=unwrap(lmk_b))

    def landmark_vertex_subset(self):
        """Static (vertex_subset, tri_local [L,3], bary [L,3]) for
        computing the face landmarks from a subset-skinned mesh:
        landmarks = sum_k bary[:, k] * verts[:, tri_local[:, k]]."""
        if self.lmk_faces_idx is None:
            return None
        tris = self.faces[np.asarray(self.lmk_faces_idx)]     # [L, 3]
        vids = np.unique(tris.ravel()).astype(np.int32)
        pos = {int(v): i for i, v in enumerate(vids)}
        tri_local = np.vectorize(pos.get)(tris).astype(np.int32)
        return vids, tri_local, np.asarray(self.lmk_bary_coords,
                                           np.float32)

    # -- convenience sizes ---------------------------------------------------
    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    @property
    def num_expr(self) -> int:
        return self.exprdirs.shape[-1]

    @property
    def num_pca(self) -> int:
        return self.hands_components_l.shape[0]

    # -- static joint-support analysis ---------------------------------------
    def joint_support(self, vertex_subset) -> Optional[Tuple[np.ndarray,
                                                             np.ndarray]]:
        """Exact static support of a vertex subset over the joint set.

        Real SMPL-X artifacts store SPARSE skinning weights (each
        vertex is influenced by a handful of joints; a leg vertex has
        exactly-zero weight on all 30 finger joints), so a subset-
        skinned forward only needs the transforms of the joints that
        actually touch the subset — plus their ancestors to compose
        the chain. For the clip solver's ~870 leg contact vertices
        that collapses the FK from a depth-11, 55-joint tree to a
        depth-5, ~9-joint one (the latency-bound backward chain is
        the dominant phase cost — PERFORMANCE.md r4).

        Returns (joint_subset, pose_joint_subset) for __call__, or
        None when nothing prunes (dense-weight models keep exact
        reference semantics automatically). joint_subset is the
        ancestor-closed set of joints with nonzero LBS weight over the
        subset; pose_joint_subset the joints whose pose-blendshape
        rows are nonzero over the subset's columns — or None when ALL
        rows are nonzero (dense learned posedirs, the real artifact's
        structure): an identity permutation-gather there measures
        +2.6 ms/step over the plain slice at bench shapes (r4 probe),
        so the no-op prune must stay OFF the gather path. Pruning only
        drops terms that are EXACTLY zero — results differ from the
        full model by f32 summation order only (tested to 1e-6,
        tests/test_joint_prune.py)."""
        sub = np.asarray(vertex_subset)
        w_nz = np.asarray(jnp.max(
            (self.lbs_weights[sub] != 0).astype(jnp.int32), axis=0))
        kept = set(int(j) for j in np.where(w_nz)[0]) | {0}
        for j in list(kept):                       # ancestor closure
            while PARENTS[j] >= 0:
                j = PARENTS[j]
                kept.add(j)
        kept = np.asarray(sorted(kept), np.int32)
        cols = (sub[:, None] * 3 + np.arange(3)).reshape(-1)
        pd_nz = np.asarray(jnp.max(jnp.abs(
            self.posedirs[:, cols]).reshape(NUM_JOINTS - 1, -1),
            axis=1)) > 0
        pose_joints = (1 + np.where(pd_nz)[0]).astype(np.int32)
        pose_sub = (pose_joints if len(pose_joints) < NUM_JOINTS - 1
                    else None)
        # the same no-op-gather rule applies to the JOINT half: dense
        # weights keep all 55 joints, and an identity kept-gather in
        # the FK branch costs like the pose one — degrade each half to
        # None independently, prune only what genuinely shrinks
        joint_sub = kept if len(kept) < NUM_JOINTS else None
        if joint_sub is None and pose_sub is None:
            return None
        return joint_sub, pose_sub

    # -- forward -------------------------------------------------------------
    def hand_pose_aa(self, coeffs: jnp.ndarray, side: str) -> jnp.ndarray:
        """PCA coefficients [..., n_pca] -> axis-angle [..., 45]."""
        comp = (self.hands_components_l if side == "l"
                else self.hands_components_r)
        mean = (self.hands_mean_l if side == "l" else self.hands_mean_r)
        aa = jnp.einsum("...c,cd->...d", coeffs, comp)
        if not self.flat_hand_mean:
            aa = aa + mean
        return aa

    def __call__(self,
                 betas: jnp.ndarray,
                 global_orient: jnp.ndarray,
                 body_pose: Optional[jnp.ndarray] = None,
                 body_pose_matrot: Optional[jnp.ndarray] = None,
                 global_orient_matrot: Optional[jnp.ndarray] = None,
                 transl: Optional[jnp.ndarray] = None,
                 left_hand_pose: Optional[jnp.ndarray] = None,
                 right_hand_pose: Optional[jnp.ndarray] = None,
                 jaw_pose: Optional[jnp.ndarray] = None,
                 leye_pose: Optional[jnp.ndarray] = None,
                 reye_pose: Optional[jnp.ndarray] = None,
                 expression: Optional[jnp.ndarray] = None,
                 vertex_subset: Optional[np.ndarray] = None,
                 joint_subset: Optional[np.ndarray] = None,
                 pose_joint_subset: Optional[np.ndarray] = None,
                 **unused_kwargs) -> Dict[str, jnp.ndarray]:
        """Batched SMPL-X forward.

        Args (all [B, dim], broadcastable): betas [B,10],
        global_orient [B,3] aa, body_pose [B,63] aa (21 joints — the
        caller decodes VPoser latents first), hand poses [B,n_pca] PCA
        coefficients, transl [B,3].

        body_pose_matrot [B,21,3,3] / global_orient_matrot [B,3,3]:
        rotations given as matrices, bypassing the axis-angle
        round-trip — VPoser's 6D decode (and the solver's 6D orient
        slot) already produce rotation matrices, and the hot solver
        path was converting matrot -> quat -> aa here -> Rodrigues
        back to matrot every Adam step (a latency-bound chain of ~20
        small TPU ops, fwd+bwd). When a matrot input is given, the
        corresponding aa argument is ignored and the matching slots of
        the returned full_pose are zeros.

        vertex_subset: optional static int array — skin ONLY these
        vertices (pose blendshapes + LBS restricted to the subset;
        joints still regress from the full shaped mesh). The clip
        solver's contact term needs ~900 of the 10,475 vertices, a
        ~12x cut of the LBS hot path; the reference always skins the
        full mesh and slices afterwards (global_optimization.py:283-290).

        joint_subset / pose_joint_subset (static, from
        ``joint_support(vertex_subset)``): additionally restrict the
        FK chain + LBS columns (resp. the pose-blendshape rows) to the
        subset's exact static support — only valid together with
        vertex_subset, and only sound for callers that do NOT consume
        the joints output: the returned ``joints`` then carries real
        values at joint_subset slots and NaN elsewhere, so any
        accidental consumer fails loudly instead of silently reading
        zeros. Drops only exactly-zero terms (f32 summation order is
        the only difference; tests/test_joint_prune.py).

        Returns dict with vertices [B,V,3] (V = len(vertex_subset) if
        given) and joints [B,55,3], matching the .vertices/.joints
        surface the reference consumes (global_optimization.py:283,298).
        Unknown kwargs are accepted and ignored like the smplx package
        does (the reference passes camera_translation through,
        global_optimization.py:273-282).
        """
        B = betas.shape[0]
        dtype = self.v_template.dtype
        zeros3 = jnp.zeros((B, 3), dtype=dtype)

        jaw_pose = zeros3 if jaw_pose is None else jaw_pose
        leye_pose = zeros3 if leye_pose is None else leye_pose
        reye_pose = zeros3 if reye_pose is None else reye_pose
        if expression is None:
            expression = jnp.zeros((B, self.num_expr), dtype=dtype)
        if left_hand_pose is None:
            left_hand_pose = jnp.zeros((B, self.num_pca), dtype=dtype)
        if right_hand_pose is None:
            right_hand_pose = jnp.zeros((B, self.num_pca), dtype=dtype)

        lhand_aa = self.hand_pose_aa(left_hand_pose, "l")   # [B,45]
        rhand_aa = self.hand_pose_aa(right_hand_pose, "r")

        if body_pose_matrot is None:
            body_aa = body_pose.reshape(B, NUM_BODY_JOINTS, 3)
        else:
            # placeholder zeros: full_pose stays aa for the output
            # contract; the body slots of rot_mats are overwritten
            # with the given matrices below
            body_aa = jnp.zeros((B, NUM_BODY_JOINTS, 3), dtype=dtype)

        # [B, 55, 3] full axis-angle pose
        full_pose = jnp.concatenate([
            global_orient.reshape(B, 1, 3),
            body_aa,
            jaw_pose.reshape(B, 1, 3),
            leye_pose.reshape(B, 1, 3),
            reye_pose.reshape(B, 1, 3),
            lhand_aa.reshape(B, 15, 3),
            rhand_aa.reshape(B, 15, 3),
        ], axis=1)

        # 1. shape + expression blendshapes (MXU matmuls)
        shape_feat = jnp.concatenate([betas, expression], axis=-1)
        dirs = jnp.concatenate([self.shapedirs, self.exprdirs], axis=-1)
        V = dirs.shape[0]

        # 2. rest joints WITHOUT materializing the full shaped mesh:
        # J_reg @ (template + dirs . feat) = J_reg@template
        #   + (J_reg (.) dirs) . feat — the composed [S, J*3] table is
        # loop-invariant (XLA hoists it out of the solver scan), so
        # per step this is a tiny [B,S]@[S,165] matmul instead of a
        # [B,V,3]-sized elementwise pass over 10k vertices
        j_template = jnp.einsum("jv,vc->jc", self.j_regressor,
                                self.v_template)             # [J,3]
        j_dirs = jnp.einsum("jv,vcs->sjc", self.j_regressor,
                            dirs).reshape(dirs.shape[-1], -1)  # [S,J*3]
        j_rest = j_template + jnp.matmul(shape_feat, j_dirs).reshape(
            B, NUM_JOINTS, 3)

        # shaped vertices + skinning tables, restricted to the subset
        # the caller actually reads
        if vertex_subset is not None:
            sub = np.asarray(vertex_subset)
            template = self.v_template[sub]
            dirs_sub = dirs[sub]
            cols = (sub[:, None] * 3 + np.arange(3)).reshape(-1)
            posedirs = self.posedirs[:, cols]
            lbs_weights = self.lbs_weights[sub]
            Vs = len(sub)
        else:
            template = self.v_template
            dirs_sub = dirs
            posedirs = self.posedirs
            lbs_weights = self.lbs_weights
            Vs = V
        # explicit [B,S]@[S,Vs*3] matmul (the einsum form lowers to a
        # VPU multiply-reduce fusion on TPU)
        dirs2d = dirs_sub.reshape(Vs * 3, -1).T       # [S, Vs*3]
        v_shaped = template + jnp.matmul(shape_feat, dirs2d).reshape(
            -1, Vs, 3)
        # v_shaped above feeds only the RETURN dict — the skinning
        # path below applies shape and pose blendshapes in ONE merged
        # [B, S+486] matmul (halves the blendshape matmul count
        # fwd+bwd; the subset-LBS chain is op-count-bound, r3
        # ablation). XLA dead-code-eliminates the v_shaped matmul
        # whenever the caller doesn't read it (every hot path).

        # 3. per-joint rotation matrices + pose blendshapes
        if body_pose_matrot is None and global_orient_matrot is None:
            rot_mats = aa_to_matrot(full_pose)              # [B,55,3,3]
        else:
            # convert only the genuinely-aa joints in ONE batched
            # chain; splice the given matrices straight in (identical
            # FK/LBS downstream)
            aa_parts = []
            if global_orient_matrot is None:
                aa_parts.append(full_pose[:, :1])
            if body_pose_matrot is None:
                aa_parts.append(full_pose[:, 1:1 + NUM_BODY_JOINTS])
            aa_parts.append(full_pose[:, 1 + NUM_BODY_JOINTS:])
            conv = aa_to_matrot(jnp.concatenate(aa_parts, axis=1))
            i = 0
            if global_orient_matrot is None:
                head, i = conv[:, :1], 1
            else:
                head = global_orient_matrot.reshape(
                    B, 1, 3, 3).astype(dtype)
            if body_pose_matrot is None:
                body_m = conv[:, i:i + NUM_BODY_JOINTS]
                i += NUM_BODY_JOINTS
            else:
                body_m = body_pose_matrot.astype(dtype)
            rot_mats = jnp.concatenate([head, body_m, conv[:, i:]],
                                       axis=1)
        eye = jnp.eye(3, dtype=dtype)
        if pose_joint_subset is not None and vertex_subset is not None:
            # pose-blendshape rows restricted to the subset's exact
            # static support (rows outside it are all-zero over the
            # subset's columns)
            pj = np.asarray(pose_joint_subset)
            pose_feat = (rot_mats[:, pj] - eye).reshape(B, -1)
            rows = ((pj - 1)[:, None] * 9 + np.arange(9)).reshape(-1)
            posedirs_used = posedirs[rows]
        else:
            pose_feat = (rot_mats[:, 1:] - eye).reshape(B, -1)
            posedirs_used = posedirs
        # one [B, S+(J-1)*9] @ [S+(J-1)*9, Vs*3] matmul applies shape
        # AND pose blendshapes (the concatenated table is
        # loop-invariant — XLA hoists it out of solver scans)
        feat = jnp.concatenate([shape_feat, pose_feat], axis=-1)
        table = jnp.concatenate([dirs2d, posedirs_used], axis=0)
        v_posed = template + jnp.matmul(feat, table).reshape(B, -1, 3)

        # 4. forward kinematics along the (static) parent chain
        if joint_subset is not None and vertex_subset is not None:
            # FK over the ancestor-closed support only: for leg
            # contact vertices this is a depth-5, ~9-joint chain
            # instead of depth-11 x 55 — the chain's latency-bound
            # fwd+bwd is the dominant phase cost (PERFORMANCE.md r4).
            # The hand rotation-codec chains feeding the dropped
            # rot_mats rows are dead code XLA eliminates.
            kept = np.asarray(joint_subset)
            kpos = {int(j): i for i, j in enumerate(kept)}
            assert all(PARENTS[int(j)] < 0 or int(PARENTS[int(j)])
                       in kpos for j in kept), \
                "joint_subset must be ancestor-closed"
            parents_k = tuple(-1 if PARENTS[int(j)] < 0
                              else kpos[int(PARENTS[int(j)])]
                              for j in kept)
            joints_k, rel_k = batch_rigid_transform(
                rot_mats[:, kept], j_rest[:, kept], parents_k)
            # joints output: real values at kept slots, NaN elsewhere
            # (loud failure for any caller that consumes a pruned
            # joint — pruned calls are for vertices-only losses)
            joints_world = jnp.full((B, NUM_JOINTS, 3), jnp.nan,
                                    dtype=dtype).at[:, kept].set(joints_k)
            A = rel_k[..., :3, :].reshape(B, len(kept), 12)
            lbs_weights = lbs_weights[:, kept]
        else:
            joints_world, rel_transforms = batch_rigid_transform(
                rot_mats, j_rest, PARENTS)
            A = rel_transforms[..., :3, :].reshape(B, NUM_JOINTS, 12)

        # 5. linear blend skinning (3x4 blended affine per vertex)
        T = jnp.einsum("vj,bjk->bvk", lbs_weights,
                       A).reshape(B, -1, 3, 4)
        v_homo = jnp.concatenate(
            [v_posed, jnp.ones((B, v_posed.shape[1], 1), dtype=dtype)],
            axis=-1)
        verts = jnp.einsum("bvpq,bvq->bvp", T, v_homo)

        if transl is not None:
            verts = verts + transl[:, None, :]
            joints_world = joints_world + transl[:, None, :]

        return {"vertices": verts, "joints": joints_world,
                "full_pose": full_pose, "v_shaped": v_shaped}


def batch_rigid_transform(rot_mats: jnp.ndarray,
                          joints: jnp.ndarray,
                          parents: Tuple[int, ...]
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics.

    rot_mats [B,J,3,3], joints [B,J,3] rest positions -> posed joints
    [B,J,3] and skinning-relative transforms [B,J,4,4] (world transform
    with the rest-pose joint location factored out). The chain is
    processed by TREE DEPTH (static schedule): all joints at the same
    depth compose with their parents in one batched 4x4 matmul —
    ~11 sequential matmuls instead of 55 for the SMPL-X tree.

    Implementation lives in fpv4d.models.fk, which also carries a
    HAND-WRITTEN level-sweep adjoint (custom VJP) — built for r4
    because XLA's op-granular reverse of the depth-11 sweep is ~100
    small sequential ops and the dominant cost of every FK-bearing
    solver phase (r3 split: 3.24 of local_a's 4.97 ms/step). Measured
    on hardware it LOST to autodiff (~8%; fk.py, PERFORMANCE.md r4),
    so fk.rigid_transform_prod selects the production path.
    """
    from fpv4d.models import fk
    return fk.rigid_transform_prod(rot_mats, joints, tuple(parents))


# ---------------------------------------------------------------------------
# Loading / construction
# ---------------------------------------------------------------------------

def load_npz(path: str, num_betas: int = 10, num_expr: int = 10,
             num_pca: int = 12, dtype=jnp.float32) -> SmplxModel:
    """Load an official SMPL-X .npz artifact (e.g. SMPLX_NEUTRAL.npz).

    Key layout follows the published artifact: shapedirs has 300 shape
    + expression components stacked on the last axis; posedirs is
    [V, 3, (J-1)*9].
    """
    data = np.load(path, allow_pickle=True)
    shapedirs_all = np.asarray(data["shapedirs"], dtype=np.float32)
    if shapedirs_all.shape[-1] > 300:       # shape | expression split
        shapedirs = shapedirs_all[..., :num_betas]
        exprdirs = shapedirs_all[..., 300:300 + num_expr]
    else:
        shapedirs = shapedirs_all[..., :num_betas]
        exprdirs = np.zeros(shapedirs.shape[:2] + (num_expr,), np.float32)
    posedirs = np.asarray(data["posedirs"], dtype=np.float32)
    V = posedirs.shape[0]
    posedirs = posedirs.reshape(V * 3, -1).T        # [(J-1)*9, V*3]
    lmk_f = (np.asarray(data["lmk_faces_idx"], np.int32)
             if "lmk_faces_idx" in data else None)
    lmk_b = (np.asarray(data["lmk_bary_coords"], np.float32)
             if "lmk_bary_coords" in data else None)
    return SmplxModel(
        lmk_faces_idx=lmk_f,
        lmk_bary_coords=lmk_b,
        v_template=jnp.asarray(data["v_template"], dtype=dtype),
        shapedirs=jnp.asarray(shapedirs, dtype=dtype),
        exprdirs=jnp.asarray(exprdirs, dtype=dtype),
        posedirs=jnp.asarray(posedirs, dtype=dtype),
        j_regressor=jnp.asarray(data["J_regressor"], dtype=dtype),
        lbs_weights=jnp.asarray(data["weights"], dtype=dtype),
        hands_components_l=jnp.asarray(
            data["hands_componentsl"][:num_pca], dtype=dtype),
        hands_components_r=jnp.asarray(
            data["hands_componentsr"][:num_pca], dtype=dtype),
        hands_mean_l=jnp.asarray(data["hands_meanl"], dtype=dtype),
        hands_mean_r=jnp.asarray(data["hands_meanr"], dtype=dtype),
        faces=np.asarray(data["f"], dtype=np.int32),
    )


# Approximate rest-pose joint locations (meters, y-up) for the
# synthetic stand-in model. Body joints only; face/hand joints are
# derived with small offsets.
_REST_BODY = np.array([
    [0.00, 0.00, 0.00],    # pelvis
    [0.09, -0.07, 0.00],   # left_hip
    [-0.09, -0.07, 0.00],  # right_hip
    [0.00, 0.12, 0.00],    # spine1
    [0.10, -0.48, 0.00],   # left_knee
    [-0.10, -0.48, 0.00],  # right_knee
    [0.00, 0.25, 0.00],    # spine2
    [0.10, -0.88, -0.02],  # left_ankle
    [-0.10, -0.88, -0.02], # right_ankle
    [0.00, 0.32, 0.00],    # spine3
    [0.11, -0.94, 0.10],   # left_foot
    [-0.11, -0.94, 0.10],  # right_foot
    [0.00, 0.48, 0.00],    # neck
    [0.07, 0.42, 0.00],    # left_collar
    [-0.07, 0.42, 0.00],   # right_collar
    [0.00, 0.58, 0.02],    # head
    [0.17, 0.44, 0.00],    # left_shoulder
    [-0.17, 0.44, 0.00],   # right_shoulder
    [0.43, 0.42, 0.00],    # left_elbow
    [-0.43, 0.42, 0.00],   # right_elbow
    [0.68, 0.42, 0.00],    # left_wrist
    [-0.68, 0.42, 0.00],   # right_wrist
    [0.00, 0.60, 0.06],    # jaw
    [0.03, 0.65, 0.08],    # left_eye
    [-0.03, 0.65, 0.08],   # right_eye
], dtype=np.float32)


def _synthetic_rest_joints() -> np.ndarray:
    """[55,3] plausible rest skeleton."""
    joints = np.zeros((NUM_JOINTS, 3), dtype=np.float32)
    joints[:25] = _REST_BODY
    # hands: five fingers fanning out of each wrist along +-x
    for side, wrist, sgn in (("l", 20, 1.0), ("r", 21, -1.0)):
        base = 25 if side == "l" else 40
        for f in range(5):                    # index,middle,pinky,ring,thumb
            z = (f - 2) * 0.018
            for k in range(3):
                j = base + f * 3 + k
                joints[j] = joints[wrist] + np.array(
                    [sgn * (0.05 + 0.025 * (k + 1)), -0.01 * f, z],
                    dtype=np.float32)
    return joints


def synthetic_vertex_bones(num_verts: int, seed: int = 0) -> np.ndarray:
    """[V] generating bone of each synthetic vertex: vertex v was
    scattered around the segment joint[b] -> parent(joint[b]).

    MUST replicate synthetic_model's FIRST rng draw exactly (same
    seed, same call) — pinned by test_smplx's consistency test. Lets
    callers (fpv4d.ops.contact.synthetic_segments coherent=True) build
    body-part-coherent vertex sets like the real PROX segment files
    without re-deriving geometry."""
    rng = np.random.RandomState(seed)
    return rng.randint(1, NUM_JOINTS, size=num_verts)


def _tree_hops(parents: np.ndarray) -> np.ndarray:
    """[J,J] hop distance over the kinematic tree (BFS per node)."""
    J = len(parents)
    adj = [[] for _ in range(J)]
    for j in range(1, J):
        adj[j].append(int(parents[j]))
        adj[int(parents[j])].append(j)
    hops = np.full((J, J), J, np.int32)
    for s in range(J):
        hops[s, s] = 0
        queue = [s]
        while queue:
            nxt = []
            for u in queue:
                for v in adj[u]:
                    if hops[s, v] > hops[s, u] + 1:
                        hops[s, v] = hops[s, u] + 1
                        nxt.append(v)
            queue = nxt
    return hops


def synthetic_model(num_verts: int = 1024, num_betas: int = 10,
                    num_expr: int = 10, num_pca: int = 12,
                    seed: int = 0, dtype=jnp.float32,
                    sparse_weights: bool = False,
                    sparse_posedirs: bool = False) -> SmplxModel:
    """Deterministic synthetic SMPL-X-shaped model for tests/benchmarks.

    Vertices are scattered around the bone segments of a plausible
    skeleton; skinning weights fall off smoothly with distance to each
    joint, so posing produces sane meshes and well-conditioned fitting
    problems. Same tensor shapes/contracts as the licensed artifact at
    any vertex count.

    sparse_weights=True matches the real artifact's skinning
    STRUCTURE: official SMPL-X lbs_weights carry only a few nonzero
    joints per vertex AND those joints are kinematically local (a
    thigh vertex has exactly-zero weight on every finger joint even
    though rest-pose fingers hang Euclidean-near the thigh — skinning
    weights are learned per part, not by distance). Here: top-4 per
    vertex among joints within 2 tree hops of the vertex's generating
    bone, renormalized. This is what makes the static joint-support FK
    pruning (SmplxModel.joint_support) engage the way it does on the
    real artifact; the dense default keeps older fixtures/thresholds
    unchanged. The real artifact's posedirs are LEARNED AND DENSE, so
    they stay dense here by default; sparse_posedirs=True additionally
    restricts pose-blendshape entries to joints adjacent to each
    vertex's support (a stronger structure than the real artifact —
    test-only, to exercise the pose_joint_subset path).
    """
    rng = np.random.RandomState(seed)
    rest = _synthetic_rest_joints()                      # [55,3]
    parents = np.asarray(PARENTS)

    # sample vertices near bones (segment joint->parent); the bone
    # draw is shared with synthetic_vertex_bones (same seed => same
    # assignment — that function's contract)
    seg_j = rng.randint(1, NUM_JOINTS, size=num_verts)
    t = rng.rand(num_verts, 1).astype(np.float32)
    a = rest[seg_j]
    b = rest[parents[seg_j]]
    verts = a * t + b * (1 - t)
    verts += rng.randn(num_verts, 3).astype(np.float32) * 0.04

    # skinning weights: softmax of negative squared distance to joints
    d2 = ((verts[:, None, :] - rest[None, :, :]) ** 2).sum(-1)
    w = np.exp(-d2 / (2 * 0.05 ** 2))
    w /= w.sum(axis=1, keepdims=True) + 1e-12
    if sparse_weights:
        # kinematic locality first (the real artifact's structure):
        # candidate joints within 2 tree hops of the generating bone's
        # joint or its parent; then top-4 by distance, renormalized —
        # all other entries are exactly 0
        hops = _tree_hops(parents)
        local = ((hops[seg_j] <= 2)
                 | (hops[parents[seg_j]] <= 2))          # [V, J]
        w_m = np.where(local, w, 0.0)
        rows = np.arange(num_verts)[:, None]
        top = np.argsort(w_m, axis=1)[:, -4:]
        w_s = np.zeros_like(w)
        w_s[rows, top] = w_m[rows, top]
        w = w_s / (w_s.sum(axis=1, keepdims=True) + 1e-12)

    # joint regressor: for each joint, weights over its nearest verts
    jreg = np.zeros((NUM_JOINTS, num_verts), dtype=np.float32)
    near = np.argsort(d2, axis=0)                        # verts sorted per joint
    k = max(4, num_verts // 256)
    for j in range(NUM_JOINTS):
        idx = near[:k, j]
        jreg[j, idx] = 1.0 / k
    # correct the regressor so J_regressor @ verts == rest exactly:
    # add the residual to the nearest vertex positions via offset trick —
    # instead we shift v_template so regression is consistent enough for
    # tests (sub-mm not required of the synthetic asset itself).

    shapedirs = rng.randn(num_verts, 3, num_betas).astype(np.float32) * 0.01
    exprdirs = rng.randn(num_verts, 3, num_expr).astype(np.float32) * 0.002
    posedirs = (rng.randn((NUM_JOINTS - 1) * 9, num_verts * 3)
                .astype(np.float32) * 0.001)
    if sparse_posedirs:
        # pose-blendshape support mirrors the skinning support:
        # joint j's corrective rows touch only vertices influenced by
        # j or its parent (everything else exactly 0 — NOTE: stronger
        # than the real artifact, whose posedirs are dense; test-only)
        allow = ((w[:, 1:] > 0)
                 | (w[:, parents[1:]] > 0))          # [V, J-1]
        mask = np.repeat(np.repeat(allow.T, 9, axis=0), 3, axis=1)
        posedirs *= mask.astype(np.float32)
    hands_comp_l = rng.randn(num_pca, 45).astype(np.float32) * 0.1
    hands_comp_r = rng.randn(num_pca, 45).astype(np.float32) * 0.1
    hands_mean = rng.randn(2, 45).astype(np.float32) * 0.05

    # faces: random triangles over vertex indices (topology is only
    # needed by the renderer; geometry tests don't use it)
    num_faces = max(1, num_verts * 2 - 4)
    faces = rng.randint(0, num_verts, size=(num_faces, 3)).astype(np.int32)

    # face-landmark embedding: 51 barycentric points on triangles near
    # the head joint (same contract as the official lmk_faces_idx /
    # lmk_bary_coords keys); expression dirs are boosted on the
    # landmark vertices so synthetic expression-fitting is observable
    head_d2 = ((verts - rest[15]) ** 2).sum(-1)
    face_centroid_d2 = head_d2[faces].mean(axis=1)
    lmk_faces_idx = np.argsort(face_centroid_d2)[:51].astype(np.int32)
    bary = rng.rand(51, 3).astype(np.float32) + 0.1
    lmk_bary_coords = bary / bary.sum(axis=1, keepdims=True)
    lmk_vids = np.unique(faces[lmk_faces_idx].ravel())
    exprdirs[lmk_vids] = (rng.randn(len(lmk_vids), 3, num_expr)
                          .astype(np.float32) * 0.02)

    return SmplxModel(
        lmk_faces_idx=lmk_faces_idx,
        lmk_bary_coords=lmk_bary_coords,
        v_template=jnp.asarray(verts, dtype=dtype),
        shapedirs=jnp.asarray(shapedirs, dtype=dtype),
        exprdirs=jnp.asarray(exprdirs, dtype=dtype),
        posedirs=jnp.asarray(posedirs, dtype=dtype),
        j_regressor=jnp.asarray(jreg, dtype=dtype),
        lbs_weights=jnp.asarray(w, dtype=dtype),
        hands_components_l=jnp.asarray(hands_comp_l, dtype=dtype),
        hands_components_r=jnp.asarray(hands_comp_r, dtype=dtype),
        hands_mean_l=jnp.asarray(hands_mean[0], dtype=dtype),
        hands_mean_r=jnp.asarray(hands_mean[1], dtype=dtype),
        faces=faces,
    )
