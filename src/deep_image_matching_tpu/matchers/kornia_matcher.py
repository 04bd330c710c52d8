"""Nearest-neighbor descriptor matcher (nn / mnn / snn / smnn + ratio).

Parity: reference ``matchers/kornia_matcher.py:9-80`` (kornia
``DescriptorMatcher`` modes and ratio threshold). The registry keeps the
``kornia_matcher`` name so reference configs work unchanged, but the
implementation is the TPU-native batched matmul matcher in
``ops/nn_match.py`` — one (B, K, K) distance program per pair batch on the
MXU instead of a per-pair torch call.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.nn_match import nn_match, nn_match_auto
from .matcher_base import BatchedMatcher


class NNMatcher(BatchedMatcher):
    default_conf = {
        "match_mode": "smnn",
        "th": 0.95,
    }

    def _match_batch_arrays(
        self, batch0: Dict[str, np.ndarray], batch1: Dict[str, np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        matches0, valid = nn_match_auto(
            jnp.asarray(batch0["descriptors"]),
            jnp.asarray(batch1["descriptors"]),
            jnp.asarray(batch0["mask"]),
            jnp.asarray(batch1["mask"]),
            mode=str(self.conf["match_mode"]),
            ratio_th=float(self.conf["th"]),
        )
        return matches0, valid  # lazy; caller materializes

    def _match_pairs(self, feats0: dict, feats1: dict) -> np.ndarray:
        """Single-pair fallback (parity path): pad to capacity and run the
        same device op."""
        d0 = _as_rows(feats0)
        d1 = _as_rows(feats1)
        cap = max(128, 1 << int(np.ceil(np.log2(max(len(d0), len(d1), 1)))))
        p0 = np.zeros((cap, d0.shape[1] if d0.size else 128), np.float32)
        p1 = np.zeros_like(p0)
        m0 = np.zeros(cap, bool)
        m1 = np.zeros(cap, bool)
        p0[: len(d0)] = d0
        p1[: len(d1)] = d1
        m0[: len(d0)] = True
        m1[: len(d1)] = True
        matches0, valid = nn_match(
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(m0), jnp.asarray(m1),
            mode=str(self.conf["match_mode"]), ratio_th=float(self.conf["th"]),
        )
        matches0 = np.asarray(matches0)
        valid = np.asarray(valid)
        rows = np.nonzero(valid)[0]
        return np.stack([rows, matches0[rows]], axis=1).astype(np.int32)


def _as_rows(feats: dict) -> np.ndarray:
    d = np.asarray(feats["descriptors"], np.float32)
    n = len(feats["keypoints"])
    if d.ndim != 2 or n == 0:
        return np.zeros((0, 128), np.float32)
    if d.shape[0] != n:
        d = d.T
    return d
