"""scp_tpu — a TPU-native learned lossless LiDAR point-cloud geometry codec.

A ground-up JAX/Flax/Pallas re-design of the capability surface of SCP
("Spherical-Coordinate-based Learned Point Cloud Compression", AAAI 2024):
octree serialization of quantized point clouds in Cartesian / cylindrical /
spherical coordinates, transformer entropy models (OctAttention and EHEM),
a native C++ range coder, preprocessing / metric tooling, and a pjit
data-parallel trainer.

Layers (bottom-up):
  core    — pure geometry: Morton codes, octree build/unbuild, coordinate
            transforms, quantization, point-cloud I/O.
  native  — C++ runtime: range coder, octree builder, D1/D2 PSNR metric
            (ctypes bindings; built on demand with g++).
  ac      — arithmetic-coding front end (CDF quantization, stream API).
  models  — Flax entropy models: OctAttention, EHEM.
  train   — pjit data-parallel trainer (mesh axis "data"), orbax ckpts.
  codec   — encode/decode drivers (level-wavefront, two-phase checkerboard).
  tools   — offline preprocessing / normals / PSNR CLIs.
"""

__version__ = "0.1.0"
