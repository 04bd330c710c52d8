"""Tiled matching: tile-pair selection + masked tile-pair batching.

Parity: reference ``matchers/matcher_base.py:362-485`` (``_match_by_tile``)
and ``:989-1342`` (``tile_selection``): EXHAUSTIVE = all tile pairs, GRID =
same-index pairs, PRESELECTION = low-res probe matches mapped into tile
rectangles (keep tile pairs with >= min_matches).

TPU-native design: features are extracted once per image with a ``tile_idx``
per keypoint; a tile-pair "sub-match" is the SAME batched matching program
with the validity masks refined to that tile pair (mask &= tile_idx == t).
Indices stay in the global per-image keypoint numbering, so no coordinate
offsetting or index remapping is needed — per-pair results are unioned and
deduplicated on the query index.
"""

from __future__ import annotations

import itertools
import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..constants import TileSelection
from ..utils.tiling import Tiler

logger = logging.getLogger("dim_tpu")


def tile_grid_for(image_wh, tile_size, overlap) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Recompute the tile origins used at extraction time for an image of
    (w, h). Returns (origins (N,2) x/y, (tile_w, tile_h))."""
    w, h = int(image_wh[0]), int(image_wh[1])
    tiler = Tiler()
    dummy = np.zeros((h, w), np.uint8)
    _, origins, _ = tiler.compute_tiles_array(dummy, tile_size, overlap)
    if isinstance(tile_size, int):
        tw = th = int(tile_size)
    else:
        tw, th = int(tile_size[0]), int(tile_size[1])
    return origins, (tw, th)


def points_in_tiles(pts: np.ndarray, origins: np.ndarray, tile_wh) -> np.ndarray:
    """(M, T) bool: point m falls inside tile t's rectangle."""
    tw, th = tile_wh
    x = pts[:, 0:1]
    y = pts[:, 1:2]
    x0 = origins[None, :, 0]
    y0 = origins[None, :, 1]
    return (x >= x0) & (x < x0 + tw) & (y >= y0) & (y < y0 + th)


def select_tile_pairs(
    mode: TileSelection,
    n_tiles0: int,
    n_tiles1: int,
    lowres_pts0: Optional[np.ndarray] = None,
    lowres_pts1: Optional[np.ndarray] = None,
    origins0: Optional[np.ndarray] = None,
    origins1: Optional[np.ndarray] = None,
    tile_wh0=None,
    tile_wh1=None,
    min_matches: int = 10,
) -> List[Tuple[int, int]]:
    if mode is TileSelection.EXHAUSTIVE:
        return list(itertools.product(range(n_tiles0), range(n_tiles1)))
    if mode is TileSelection.GRID:
        n = min(n_tiles0, n_tiles1)
        return [(t, t) for t in range(n)]
    if mode in (TileSelection.PRESELECTION, TileSelection.PRESELECTION_AFFINE_TRANSFORM):
        if lowres_pts0 is None or len(lowres_pts0) == 0:
            logger.debug("No low-res matches; falling back to exhaustive tiles")
            return list(itertools.product(range(n_tiles0), range(n_tiles1)))
        in0 = points_in_tiles(lowres_pts0, origins0, tile_wh0)  # (M, T0)
        in1 = points_in_tiles(lowres_pts1, origins1, tile_wh1)  # (M, T1)
        counts = in0.astype(np.int32).T @ in1.astype(np.int32)  # (T0, T1)
        pairs = [tuple(p) for p in np.argwhere(counts >= min_matches)]
        if not pairs:
            pairs = [tuple(np.unravel_index(np.argmax(counts), counts.shape))]
        return [(int(a), int(b)) for a, b in pairs]
    raise ValueError(f"Unsupported tile selection {mode}")


class LowResProbe:
    """Low-resolution match probe for tile preselection (reference
    ``matcher_base.py:1095-1138``: SuperPoint+matcher at
    ``tile_preselection_size``)."""

    def __init__(self, preselection_size: int = 1000, max_keypoints: int = 1024):
        self.size = preselection_size
        self.max_keypoints = max_keypoints
        self._runner = None
        self._cache: Dict[str, dict] = {}

    def _get_runner(self):
        if self._runner is None:
            from ..models.superpoint import SuperPointRunner

            self._runner = SuperPointRunner(
                max_keypoints=self.max_keypoints, resize_max=self.size
            )
        return self._runner

    def matches(self, path0, path1) -> Tuple[np.ndarray, np.ndarray]:
        """Matched full-resolution coordinate arrays for an image pair."""
        import jax.numpy as jnp

        from ..ops.nn_match import nn_match

        feats = []
        for p in (path0, path1):
            key = str(p)
            if key not in self._cache:
                self._cache[key] = self._get_runner().extract_images([p])[0]
            feats.append(self._cache[key])
        f0, f1 = feats
        cap = max(128, ((max(len(f0["keypoints"]), len(f1["keypoints"])) + 127) // 128) * 128)

        def pad(f):
            k = np.zeros((cap, 2), np.float32)
            d = np.zeros((cap, f["descriptors"].shape[-1]), np.float32)
            m = np.zeros((cap,), bool)
            n = len(f["keypoints"])
            k[:n], d[:n], m[:n] = f["keypoints"], f["descriptors"], True
            return k, d, m

        k0, d0, m0 = pad(f0)
        k1, d1, m1 = pad(f1)
        matches0, valid = nn_match(
            jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(m0), jnp.asarray(m1),
            mode="smnn", ratio_th=0.95,
        )
        matches0 = np.asarray(matches0)
        valid = np.asarray(valid)
        rows = np.nonzero(valid)[0]
        return k0[rows], k1[matches0[rows]]
