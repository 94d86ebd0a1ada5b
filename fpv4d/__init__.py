"""fpv4d — TPU-native 4D egocentric human body capture framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
4DCapture-FPV pipeline ("4D Human Body Capture from Egocentric Video
via 3D Scene Grounding", 3DV 2021; reference code at
/root/reference): SMPL-X body model forward, VPoser pose prior,
chamfer human↔scene contact, per-frame SMPLify-X-style keypoint
fitting, sequential smoothing, and clip-level joint optimization of
(body sequence, metric scale, camera trajectory, DCT trajectory
prior) — all compiled to TPU with jit/vmap/pjit, with a Pallas
nearest-neighbor kernel on the contact hot path.

Layout:
  core/      rotation codecs (aa/matrot/6D/quaternion), homogeneous
             transforms, analytic DCT basis
  models/    pure-JAX SMPL-X, VPoser decoder, GRU motion prior,
             scene-conditioned CVAE, 75-d parameter codec
  ops/       chamfer (plain-JAX reference + Pallas TPU kernel),
             contact-vertex registry, loss terms
  solve/     per-frame fit, sequential smoother, keypoint (SMPLify-X)
             fit, clip-level joint solve
  parallel/  device mesh setup + sharded multi-clip / long-clip solves
  io/        COLMAP parsers, OpenPose keypoint JSON, PLY, body pkl
             contract, video (ffmpeg) drivers
  vis/       egocentric overlay + world-view rendering (own software
             rasterizer; no GL dependency)
  cli/       command-line entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
