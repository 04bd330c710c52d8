"""Geometric verification: fundamental-matrix RANSAC dispatcher.

Parity: reference ``utils/geometric_verification.py:45-179`` — a dispatcher
over RANSAC-family estimators returning (F, inlier_mask), with a fallback
chain when a method is unavailable or fails. pydegensac is not in this
environment, so PYDEGENSAC falls back to OpenCV MAGSAC (the reference's own
fallback path). New in the TPU build: ``GeometricVerification.JAX_RANSAC``
runs a batched on-device 8-point RANSAC (``ops/ransac.py``) so a whole pair
batch is verified in one XLA program — use it for throughput mode; keep
host MAGSAC for fidelity mode.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import cv2
import numpy as np

from ..constants import GeometricVerification

logger = logging.getLogger("dim_tpu")

_CV2_METHODS = {
    GeometricVerification.RANSAC: cv2.FM_RANSAC,
    GeometricVerification.LMEDS: cv2.LMEDS,
    GeometricVerification.USAC_DEFAULT: cv2.USAC_DEFAULT,
    GeometricVerification.USAC_PARALLEL: cv2.USAC_PARALLEL,
    GeometricVerification.USAC_FM_8PTS: cv2.USAC_FM_8PTS,
    GeometricVerification.USAC_FAST: cv2.USAC_FAST,
    GeometricVerification.USAC_ACCURATE: cv2.USAC_ACCURATE,
    GeometricVerification.USAC_PROSAC: cv2.USAC_PROSAC,
    GeometricVerification.USAC_MAGSAC: cv2.USAC_MAGSAC,
    GeometricVerification.MAGSAC: cv2.USAC_MAGSAC,
}
# RHO passes through to cv2.findFundamentalMat exactly as the reference
# does (``utils/geometric_verification.py:22``); verified accepted by
# OpenCV's dispatcher on this build. The RANSAC fallback chain still
# catches a cv2.error on builds where it is homography-only.
_CV2_METHODS[GeometricVerification.RHO] = cv2.RHO


def geometric_verification(
    kpts0: np.ndarray,
    kpts1: np.ndarray,
    method: GeometricVerification = GeometricVerification.MAGSAC,
    threshold: float = 1.0,
    confidence: float = 0.9999,
    max_iters: int = 10000,
    quiet: bool = False,
) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """Estimate F between matched keypoints; return (F, inlier_mask).

    ``kpts0``/``kpts1``: (M, 2) matched coordinates. On failure or too few
    points, returns (None, all-False mask) so callers drop the pair rather
    than crash (reference behavior).
    """
    kpts0 = np.ascontiguousarray(kpts0, dtype=np.float64).reshape(-1, 2)
    kpts1 = np.ascontiguousarray(kpts1, dtype=np.float64).reshape(-1, 2)
    n = len(kpts0)
    empty = np.zeros(n, dtype=bool)
    if method is GeometricVerification.NONE:
        return None, np.ones(n, dtype=bool)
    if n < 8:
        if not quiet:
            logger.debug(f"Too few matches for GV ({n} < 8)")
        return None, empty

    if method is GeometricVerification.JAX_RANSAC:
        from ..ops.ransac import ransac_fundamental_np

        F, mask = ransac_fundamental_np(kpts0, kpts1, threshold=threshold)
        return F, mask

    if method is GeometricVerification.PYDEGENSAC:
        try:
            import pydegensac  # type: ignore

            F, mask = pydegensac.findFundamentalMatrix(
                kpts0, kpts1, px_th=threshold, conf=confidence, max_iters=max_iters
            )
            return F, np.asarray(mask, dtype=bool)
        except ImportError:
            if not quiet:
                logger.debug("pydegensac unavailable; falling back to MAGSAC")
            method = GeometricVerification.MAGSAC

    cv_method = _CV2_METHODS.get(method, cv2.USAC_MAGSAC)
    try:
        # cv2's RANSAC family draws from a process-global RNG: identical
        # inputs would otherwise verify differently depending on how many
        # cv2 calls ran before (observed as suite-order-dependent
        # registration flakiness). Seeding per call makes host GV a pure
        # function of its inputs, matching the device RANSAC's fixed key.
        cv2.setRNGSeed(0)
        F, mask = cv2.findFundamentalMat(
            kpts0, kpts1, cv_method, threshold, confidence, max_iters
        )
    except cv2.error as e:
        if not quiet:
            logger.warning(f"GV {method.name} failed ({e}); falling back to RANSAC")
        try:
            F, mask = cv2.findFundamentalMat(
                kpts0, kpts1, cv2.FM_RANSAC, threshold, confidence, max_iters
            )
        except cv2.error:
            return None, empty
    if F is None or mask is None:
        return None, empty
    if F.shape[0] > 3:  # 7-point can return stacked solutions
        F = F[:3]
    return F, np.asarray(mask, dtype=bool).ravel()[:n]
