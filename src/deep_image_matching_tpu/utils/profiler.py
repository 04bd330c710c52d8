"""Device tracing/profiling hooks.

Parity + extension of the reference's tracing story (SURVEY.md section 5.1:
the reference only has wall-clock ``Timer`` lines): the same named-section
timers plus ``jax.profiler`` trace capture. Set ``DIM_TPU_PROFILE=/path`` or
use the context manager to dump a TensorBoard-compatible device trace
(XLA op timeline, HBM usage) of any pipeline stage.
"""

from __future__ import annotations

import contextlib
import logging
import os
from pathlib import Path
from typing import Optional

logger = logging.getLogger("dim_tpu")


@contextlib.contextmanager
def device_trace(name: str, out_dir: Optional[str] = None):
    """Capture a jax.profiler trace of the enclosed block when profiling is
    enabled (explicit out_dir or DIM_TPU_PROFILE env); no-op otherwise."""
    out_dir = out_dir or os.environ.get("DIM_TPU_PROFILE")
    if not out_dir:
        yield
        return
    import jax

    path = Path(out_dir) / name
    path.mkdir(parents=True, exist_ok=True)
    logger.info(f"Profiling '{name}' -> {path}")
    jax.profiler.start_trace(str(path))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for host-side sections (shows up in the
    profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
