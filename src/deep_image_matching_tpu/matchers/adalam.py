"""AdaLAM geometry-aware match filtering.

Parity: reference ``matchers/adalam.py:9-77`` (kornia
``GeometryAwareDescriptorMatcher`` in 'adalam' mode; Cavalli et al.,
ECCV'20). Two modes:

- ``adalam`` (default, EXACT algorithm): seed selection by ratio-score NMS,
  per-seed neighborhoods, 128-iteration local-affine RANSAC with adaptive
  significance-based inlier selection and refit — ``ops/adalam.py``, one
  batched XLA program (no per-seed CUDA kernels).
- ``adalam_fast``: the cheaper dense motion-consistency vote (each candidate
  needs >= min_votes neighbors with a coherent displacement). An
  approximation — explicitly opt-in, not the reference algorithm.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.adalam import adalam_filter
from ..ops.nn_match import nn_match_batch, nn_match_with_ratios
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
        "match_mode": "adalam",   # 'adalam' (exact) | 'adalam_fast' (vote)
        "th": 0.8,
        # exact-AdaLAM knobs (kornia AdalamConfig defaults)
        "area_ratio": 100.0,
        "search_expansion": 4.0,
        "ransac_iters": 128,
        "min_inliers": 6,
        "min_confidence": 200.0,
        "seed": 0,
        # adalam_fast knobs
        "radius_frac": 0.1,
        "tolerance": 0.35,
        "min_votes": 4,
    }

    def _match_batch_arrays(
        self, batch0: Dict[str, np.ndarray], batch1: Dict[str, np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        mode = str(self.conf.get("match_mode", "adalam"))
        if mode == "adalam_fast":
            matches0, valid = nn_match_batch(
                jnp.asarray(batch0["descriptors"]),
                jnp.asarray(batch1["descriptors"]),
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
                jnp.asarray(batch0["keypoints"]),
                jnp.asarray(batch1["keypoints"]),
                matches0, valid,
            )
            return matches0, keep  # lazy; caller materializes

        # exact AdaLAM: ratio-scored candidates (no ratio gate — AdaLAM's
        # own filtering decides) + seed mutuality, then the local-affine
        # verification
        matches0, valid, ratios, mutual = jax.vmap(
            lambda a, b, c, d: nn_match_with_ratios(a, b, c, d, mode="mnn")
        )(
            jnp.asarray(batch0["descriptors"]),
            jnp.asarray(batch1["descriptors"]),
            jnp.asarray(batch0["mask"]), jnp.asarray(batch1["mask"]),
        )
        B = matches0.shape[0]
        keys = jax.random.split(
            jax.random.PRNGKey(int(self.conf.get("seed", 0))), B
        )
        wh0 = jnp.asarray(batch0["image_size"], jnp.float32)
        wh1 = jnp.asarray(batch1["image_size"], jnp.float32)
        keep = jax.vmap(
            lambda k0, k1, m, v, r, w0, w1, mu, key: adalam_filter(
                k0, k1, m, v, r, w0, w1, key, mnn=mu,
                area_ratio=float(self.conf.get("area_ratio", 100.0)),
                search_expansion=float(self.conf.get("search_expansion", 4.0)),
                ransac_iters=int(self.conf.get("ransac_iters", 128)),
                min_inliers=int(self.conf.get("min_inliers", 6)),
                min_confidence=float(self.conf.get("min_confidence", 200.0)),
            )
        )(
            jnp.asarray(batch0["keypoints"]), jnp.asarray(batch1["keypoints"]),
            matches0, valid, ratios, wh0, wh1, mutual, keys,
        )
        return matches0, keep  # lazy; caller materializes
