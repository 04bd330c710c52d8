"""AdaLAM: Adaptive Locally-Affine Matching (Cavalli et al., ECCV 2020).

Exact algorithm (reference wrapper ``matchers/adalam.py:9-77`` delegates to
kornia ``match_adalam``): seed selection by ratio-score NMS, per-seed
neighborhood gathering with optional orientation/scale-consistency gating,
128-iteration local-affine RANSAC per seed, ADAPTIVE inlier selection by
significance (confidence = k / (n * r_k^2 / R^2) against a uniform-residual
null model), one weighted refit, and match acceptance when any verified
seed's affinity counts the match as a significant inlier.

TPU-native formulation: everything is fixed-capacity and batched — seeds are
a static top-S set, neighborhoods are static top-M sets, hypothesis solves
are closed-form 2x2 inversions batched as (S, iters) tensors, and the
adaptive selection is a sort + prefix scan over (S, iters, M) residuals. No
per-seed loop: the whole filter is one XLA program on the MXU/VPU (the
original is custom CUDA kernels with data-dependent neighborhood sizes).

Defaults mirror kornia's AdalamConfig: area_ratio=100, search_expansion=4,
ransac_iters=128, min_inliers=6, min_confidence=200, orientation threshold
30 deg, scale_rate_threshold=1.5, refit=True.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) x (M, 2) -> (N, M) squared distances."""
    return (
        jnp.sum(a**2, -1)[:, None]
        + jnp.sum(b**2, -1)[None, :]
        - 2.0 * (a @ b.T)
    )


def _solve_2x2(X: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
    """Solve X A = Y for A (2x2) from two correspondences.

    X, Y: (..., 2, 2) rows = the two relative points. Degenerate samples
    (collinear with the seed) return a large-residual sentinel A=0."""
    det = X[..., 0, 0] * X[..., 1, 1] - X[..., 0, 1] * X[..., 1, 0]
    safe = jnp.abs(det) > 1e-8
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)
    Xinv = (
        jnp.stack(
            [
                jnp.stack([X[..., 1, 1], -X[..., 0, 1]], -1),
                jnp.stack([-X[..., 1, 0], X[..., 0, 0]], -1),
            ],
            -2,
        )
        * inv_det[..., None, None]
    )
    return Xinv @ Y


def _weighted_refit(
    x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Weighted least-squares A minimizing sum w ||x A - y||^2.

    x, y: (..., M, 2); w: (..., M). Normal equations with a ridge guard."""
    xw = x * w[..., None]
    G = jnp.swapaxes(xw, -1, -2) @ x
    b = jnp.swapaxes(xw, -1, -2) @ y
    G = G + 1e-6 * jnp.eye(2, dtype=x.dtype)
    return jnp.linalg.solve(G, b)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_seeds", "neigh_cap", "ransac_iters", "min_inliers", "refit",
        "force_seed_mnn",
    ),
)
def adalam_filter(
    kpts0: jnp.ndarray,      # (K, 2)
    kpts1: jnp.ndarray,      # (K, 2) matched target coords NOT required; full set
    matches0: jnp.ndarray,   # (K,) index into kpts1, -1/invalid allowed
    valid: jnp.ndarray,      # (K,) candidate validity (e.g. mutual-NN mask)
    ratios: jnp.ndarray,     # (K,) NN distance ratios (lower = better)
    im0_wh: jnp.ndarray,     # (2,) image 0 (w, h)
    im1_wh: jnp.ndarray,     # (2,)
    key: jax.Array,
    mnn: Optional[jnp.ndarray] = None,   # (K,) mutual-NN mask for seeds
    ori0: Optional[jnp.ndarray] = None,  # (K,) degrees
    ori1: Optional[jnp.ndarray] = None,  # (K,) degrees (full kpts1 set)
    scale0: Optional[jnp.ndarray] = None,  # (K,)
    scale1: Optional[jnp.ndarray] = None,
    area_ratio: float = 100.0,
    search_expansion: float = 4.0,
    ransac_iters: int = 128,
    n_seeds: int = 256,
    neigh_cap: int = 256,
    min_inliers: int = 6,
    min_confidence: float = 200.0,
    ort_th_deg: float = 30.0,
    scale_th: float = 1.5,
    refit: bool = True,
    force_seed_mnn: bool = True,
) -> jnp.ndarray:
    """Return the (K,) keep mask of candidates verified by local affinities."""
    K = kpts0.shape[0]
    f32 = jnp.float32
    kpts0 = kpts0.astype(f32)
    kpts1 = kpts1.astype(f32)
    midx = jnp.clip(matches0, 0, kpts1.shape[0] - 1)
    pts1m = kpts1[midx]  # (K, 2) matched coords in image 1

    # AdaLAM radii: one seed per area_ratio-th of the image (keypoint extent
    # fallback when the caller has no image size recorded)
    ext0 = jnp.maximum(kpts0.max(0) - kpts0.min(0), 1.0)
    ext1 = jnp.maximum(kpts1.max(0) - kpts1.min(0), 1.0)
    wh0 = jnp.where(im0_wh.astype(f32) > 0, im0_wh.astype(f32), ext0)
    wh1 = jnp.where(im1_wh.astype(f32) > 0, im1_wh.astype(f32), ext1)
    R1 = jnp.sqrt(jnp.prod(wh0) / (area_ratio * jnp.pi))
    R2 = jnp.sqrt(jnp.prod(wh1) / (area_ratio * jnp.pi))

    goodness = jnp.where(valid, -ratios.astype(f32), -jnp.inf)

    # ---- seed selection: ratio-score NMS over the image-0 R1 neighborhood
    d0 = _sqdist(kpts0, kpts0)
    neigh0 = (d0 < R1**2) & valid[None, :]
    better = goodness[None, :] > goodness[:, None]  # j strictly better than i
    seed_ok = valid & ~jnp.any(neigh0 & better, axis=1)
    if force_seed_mnn and mnn is not None:
        seed_ok = seed_ok & mnn
    seed_score = jnp.where(seed_ok, goodness, -jnp.inf)
    _, seed_idx = jax.lax.top_k(seed_score, min(n_seeds, K))
    S = seed_idx.shape[0]
    seed_valid = jnp.take(seed_ok, seed_idx)
    s_k0 = kpts0[seed_idx]          # (S, 2)
    s_k1 = pts1m[seed_idx]

    # ---- neighborhood sets: close in BOTH images, optional ori/scale gates
    dst0 = _sqdist(s_k0, kpts0)     # (S, K)
    dst1 = _sqdist(s_k1, pts1m)
    R1e2 = (R1 * search_expansion) ** 2
    R2e2 = (R2 * search_expansion) ** 2
    member = (dst0 < R1e2) & (dst1 < R2e2) & valid[None, :]
    if ori0 is not None and ori1 is not None:
        dori = (ori1[midx] - ori0).astype(f32)          # per-candidate rotation
        s_dori = jnp.take(dori, seed_idx)
        diff = jnp.abs(((dori[None, :] - s_dori[:, None]) + 180.0) % 360.0 - 180.0)
        member = member & (diff < ort_th_deg)
    if scale0 is not None and scale1 is not None:
        drate = (scale1[midx] / jnp.maximum(scale0, 1e-8)).astype(f32)
        s_drate = jnp.take(drate, seed_idx)
        rr = drate[None, :] / jnp.maximum(s_drate[:, None], 1e-8)
        member = member & (rr < scale_th) & (rr > 1.0 / scale_th)

    # static top-M members by image-0 distance
    M = min(neigh_cap, K)
    m_score = jnp.where(member, -dst0, -jnp.inf)
    _, n_idx = jax.lax.top_k(m_score, M)               # (S, M)
    n_ok = jnp.take_along_axis(member, n_idx, axis=1)  # (S, M)
    x = kpts0[n_idx] - s_k0[:, None]                   # (S, M, 2) rel coords
    y = pts1m[n_idx] - s_k1[:, None]
    n_count = n_ok.sum(axis=1).astype(f32)             # (S,)

    # ---- local-affine RANSAC: (S, iters) closed-form 2-point hypotheses
    k1, k2 = jax.random.split(key)
    samp = jax.random.randint(k1, (S, ransac_iters, 2), 0, M)
    take = jnp.take_along_axis
    Xs = take(x, samp.reshape(S, -1)[..., None], axis=1).reshape(
        S, ransac_iters, 2, 2
    )
    Ys = take(y, samp.reshape(S, -1)[..., None], axis=1).reshape(
        S, ransac_iters, 2, 2
    )
    samp_ok = take(n_ok, samp.reshape(S, -1), axis=1).reshape(
        S, ransac_iters, 2
    ).all(-1)
    A = _solve_2x2(Xs, Ys)                             # (S, iters, 2, 2)
    # residuals of all members under all hypotheses
    pred = jnp.einsum("smd,side->sime", x, A)          # (S, iters, M, 2)
    res = jnp.sum((pred - y[:, None]) ** 2, -1)        # (S, iters, M)
    res = jnp.where(n_ok[:, None] & samp_ok[..., None], res, jnp.inf)

    def _adaptive_select(res_sq):
        """res_sq: (..., M) squared residuals (inf = invalid member).
        Returns (count, threshold): the largest significant prefix under the
        uniform null model — confidence_k = k / (n * r_k^2 / R2e^2)."""
        srt = jnp.sort(res_sq, axis=-1)
        pos = jnp.arange(1, M + 1, dtype=f32)
        n = jnp.maximum(n_count, 1.0)
        expected = n.reshape(n.shape + (1,) * (srt.ndim - 1)) * (
            srt / R2e2
        )
        conf = pos / jnp.maximum(expected, 1e-12)
        sig = (conf >= min_confidence) & jnp.isfinite(srt)
        # the paper accepts the LARGEST k with confidence >= c_min: the whole
        # sorted prefix up to the last significant position is the inlier set
        idxs = jnp.arange(M)
        last = jnp.max(jnp.where(sig, idxs, -1), axis=-1)
        count = last + 1
        thr = jnp.take_along_axis(
            srt, jnp.clip(last, 0, M - 1)[..., None], axis=-1
        )[..., 0]
        thr = jnp.where(count > 0, thr, 0.0)
        return count, thr

    counts, thrs = _adaptive_select(res)               # (S, iters)
    best = jnp.argmax(counts, axis=1)                  # (S,)
    best_thr = take(thrs, best[:, None], axis=1)[:, 0]
    best_res = take(
        res, best[:, None, None].repeat(M, -1), axis=1
    )[:, 0]                                            # (S, M)
    inl = n_ok & (best_res <= best_thr[:, None]) & (best_thr[:, None] > 0)

    if refit:
        A_fit = _weighted_refit(x, y, inl.astype(f32)) # (S, 2, 2)
        res_fit = jnp.sum((x @ A_fit - y) ** 2, -1)
        res_fit = jnp.where(n_ok, res_fit, jnp.inf)
        cnt2, thr2 = _adaptive_select(res_fit)         # (S,)
        inl = n_ok & (res_fit <= thr2[:, None]) & (thr2[:, None] > 0)
        seed_accept = seed_valid & (cnt2 >= min_inliers)
    else:
        seed_accept = seed_valid & (
            take(counts, best[:, None], axis=1)[:, 0] >= min_inliers
        )

    # ---- scatter: keep candidates that are inliers of ANY accepted seed
    votes = jnp.zeros((K,), jnp.int32)
    contrib = (inl & seed_accept[:, None]).astype(jnp.int32)
    votes = votes.at[n_idx.reshape(-1)].add(contrib.reshape(-1))
    return valid & (votes > 0)


def adalam_filter_np(
    kpts0: np.ndarray, kpts1: np.ndarray, matches0: np.ndarray,
    valid: np.ndarray, ratios: np.ndarray, im0_wh, im1_wh, seed: int = 0,
    **kw,
) -> np.ndarray:
    """Host convenience wrapper."""
    out = adalam_filter(
        jnp.asarray(kpts0), jnp.asarray(kpts1), jnp.asarray(matches0),
        jnp.asarray(valid), jnp.asarray(ratios),
        jnp.asarray(np.asarray(im0_wh, np.float32)),
        jnp.asarray(np.asarray(im1_wh, np.float32)),
        jax.random.PRNGKey(seed), **kw,
    )
    return np.asarray(out)
