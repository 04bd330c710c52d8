"""deep-image-matching-tpu: TPU-native multiview image matching for SfM.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
3DOM-FBK/deep-image-matching: pair generation, a zoo of local-feature
extractors and matchers running as batched jitted programs sharded over a
TPU mesh, geometric verification (host USAC or on-device batched RANSAC),
HDF5 + COLMAP database export, and SfM reconstruction hooks.

Public API parity with the reference (``__init__.py:38-44``):
``Config``, ``ImageMatcher``, plus the enums and timer/logger utilities.
"""

__version__ = "0.1.0"

import os as _os

# Honor JAX_PLATFORMS even when a site TPU platform plugin would otherwise
# claim the device regardless of the env var (observed with the tunneled
# 'axon' plugin). Must happen before the first jax backend use; jax.config
# wins over plugin auto-selection where the env var alone does not.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - jax absent or already initialized
        pass

# Persistent XLA compilation cache: extraction/matching programs take
# O(minutes) to compile cold but are identical across CLI invocations.
# Opt out with DIM_TPU_NO_COMPILE_CACHE=1 or point elsewhere via
# JAX_COMPILATION_CACHE_DIR (which jax itself honors). CPU-forced runs
# skip the cache: XLA:CPU AOT executables bake in host CPU features, and
# this VM migrates across heterogeneous hosts (observed feature-mismatch
# warnings threatening SIGILL), while TPU executables are host-agnostic.
def _accelerator_plugin_available() -> bool:
    """True when a PJRT accelerator plugin is installed (without
    initializing any backend). CPU-only installs must not cache: XLA:CPU
    executables bake in host features and break across VM migrations.

    Two registration paths: the standard ``jax_plugins`` entry-point group,
    and an explicit non-cpu ``JAX_PLATFORMS`` (site plugins like the
    tunneled 'axon' TPU register WITHOUT an entry point — gating on entry
    points alone silently disabled the cache there, costing ~700 s of cold
    compiles per bench process)."""
    plat = _os.environ.get("JAX_PLATFORMS", "").lower()
    if plat and plat != "cpu":
        return True
    try:
        from importlib.metadata import entry_points

        return bool(list(entry_points(group="jax_plugins")))
    except Exception:  # pragma: no cover
        return False


if (
    not _os.environ.get("DIM_TPU_NO_COMPILE_CACHE")
    and not _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    and "cpu" != _os.environ.get("JAX_PLATFORMS", "").lower()
    and _accelerator_plugin_available()
):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/dim_tpu/xla_cache"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover
        pass

from .config import Config, confs, opt_zoo  # noqa: F401
from .constants import (  # noqa: F401
    GeometricVerification,
    Quality,
    TileSelection,
)
from .image_matching import ImageMatcher  # noqa: F401
from .utils.logger import change_logger_level, setup_logger  # noqa: F401
from .utils.timer import Timer, timeit  # noqa: F401

logger = setup_logger(name="dim_tpu", log_level="info")
timer = Timer(logger=logger)
