"""Native (C++) runtime components, loaded via ctypes.

Compiled lazily on first use with the system toolchain and cached next to
the sources; every entry point has a pure-Python/scipy fallback so the
framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger("dim_tpu")

_NATIVE_DIR = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _NATIVE_DIR / "libunionfind.so"
    src = _NATIVE_DIR / "unionfind.cpp"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(so)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:
            logger.warning(f"Native build failed ({e}); using scipy fallback")
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.uf_components.restype = ctypes.c_int64
        lib.uf_components.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        _LIB = lib
    except OSError as e:
        logger.warning(f"Native load failed ({e}); using scipy fallback")
    return _LIB


def connected_components(n_nodes: int, edges: np.ndarray) -> np.ndarray:
    """Root label per node for the graph given by (E, 2) int edges."""
    edges = np.ascontiguousarray(edges, np.int64).reshape(-1, 2)
    lib = _load_lib()
    if lib is not None:
        roots = np.empty(n_nodes, np.int64)
        lib.uf_components(n_nodes, edges.reshape(-1), len(edges), roots)
        return roots
    # fallback: scipy connected components on a sparse graph
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as _cc

    if len(edges) == 0:
        return np.arange(n_nodes, dtype=np.int64)
    data = np.ones(len(edges), np.int8)
    g = coo_matrix(
        (data, (edges[:, 0], edges[:, 1])), shape=(n_nodes, n_nodes)
    )
    _, labels = _cc(g, directed=False)
    return labels.astype(np.int64)
