"""AdaLAM-style geometry-aware match filtering.

Parity: reference ``matchers/adalam.py:9-77`` (kornia
``GeometryAwareDescriptorMatcher`` in 'adalam' mode: NN matches filtered by
local affine/motion consistency; Cavalli et al., ECCV'20).

TPU-native formulation: mutual-NN + ratio candidates, then a dense local
motion-consistency vote — for each candidate, neighbors within a spatial
radius in image0 vote if their displacement agrees within a tolerance that
scales with the neighborhood radius; candidates with enough coherent votes
survive. All pairwise terms are (K, K) matrix ops on the MXU (no seed loop),
which replaces AdaLAM's per-seed CUDA kernels with one batched program.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn_match import nn_match_batch
from .matcher_base import BatchedMatcher


@functools.partial(
    jax.jit, static_argnames=("min_votes",)
)
def motion_consistency_filter(
    kpts0: jnp.ndarray,    # (K, 2)
    kpts1: jnp.ndarray,    # (K, 2)
    matches0: jnp.ndarray, # (K,) candidate match index into kpts1, -1 invalid
    valid: jnp.ndarray,    # (K,)
    radius_frac: float = 0.1,
    tolerance: float = 0.35,
    min_votes: int = 4,
):
    """Keep candidates whose displacement agrees with >= min_votes neighbors
    inside a radius (fraction of the image diagonal)."""
    K = kpts0.shape[0]
    tgt = kpts1[jnp.clip(matches0, 0, K - 1)]
    disp = tgt - kpts0  # (K, 2)
    span = jnp.maximum(kpts0.max(axis=0) - kpts0.min(axis=0), 1.0)
    radius = radius_frac * jnp.linalg.norm(span)

    d_space = jnp.linalg.norm(kpts0[:, None] - kpts0[None, :], axis=-1)  # (K, K)
    d_disp = jnp.linalg.norm(disp[:, None] - disp[None, :], axis=-1)
    both = valid[:, None] & valid[None, :]
    neighbor = both & (d_space < radius) & (d_space > 0)
    coherent = neighbor & (d_disp <= tolerance * radius)
    votes = coherent.sum(axis=1)
    keep = valid & (votes >= min_votes)
    return keep


class AdalamMatcher(BatchedMatcher):
    default_conf = {
        "match_mode": "adalam",
        "th": 0.8,
        "radius_frac": 0.1,
        "tolerance": 0.35,
        "min_votes": 4,
    }

    def _match_batch_arrays(
        self, batch0: Dict[str, np.ndarray], batch1: Dict[str, np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        matches0, valid = nn_match_batch(
            jnp.asarray(batch0["descriptors"]), jnp.asarray(batch1["descriptors"]),
            jnp.asarray(batch0["mask"]), jnp.asarray(batch1["mask"]),
            mode="smnn", ratio_th=float(self.conf.get("th", 0.8)),
        )
        keep = jax.vmap(
            lambda k0, k1, m, v: motion_consistency_filter(
                k0, k1, m, v,
                radius_frac=float(self.conf.get("radius_frac", 0.1)),
                tolerance=float(self.conf.get("tolerance", 0.35)),
                min_votes=int(self.conf.get("min_votes", 4)),
            )
        )(
            jnp.asarray(batch0["keypoints"]), jnp.asarray(batch1["keypoints"]),
            matches0, valid,
        )
        return matches0, keep  # lazy; caller materializes
