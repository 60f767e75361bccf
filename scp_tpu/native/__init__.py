"""Native (C++) runtime components, loaded via ctypes.

Submodules:
  build          — compiles `src/*.cpp` into one shared library with g++.
  ac_native      — range coder (encode + streaming batched decode).
  octree_native  — single-pass BFS octree builder from sorted Morton keys.
  metrics_native — D1/D2 PSNR (pc_error equivalent) via native KD-tree.

Every binding degrades gracefully: if the toolchain is unavailable the pure
numpy/Python paths are used instead (`available()` returns False).
"""
