"""TPU-native incremental Structure-from-Motion.

The reference delegates SfM to pycolmap (reference ``reconstruction.py:12-110``,
C++ COLMAP on the host). This package provides a standalone incremental mapper
so reconstruction works without pycolmap: two-view initialization, batched DLT
triangulation, RANSAC PnP registration, and Levenberg-Marquardt bundle
adjustment — the geometry and BA run as jitted XLA programs (matrix-free
normal equations via jvp/vjp + CG), so the heavy linear algebra sits on the
TPU while the mapper loop stays on host.

When pycolmap *is* installed it remains the default backend (full COLMAP
fidelity); select this mapper with ``general.sfm_backend: native`` or let
``reconstruction.incremental_reconstruction`` fall back to it automatically.
"""

from .incremental import IncrementalMapper, native_incremental_mapping  # noqa: F401
