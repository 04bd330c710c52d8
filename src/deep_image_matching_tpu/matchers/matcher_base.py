"""Matcher templates: sparse feature matching + verification + h5 writes.

Parity: reference ``matchers/matcher_base.py:63-573`` — template ``match()``
(load two feature sets from h5 -> ``_match_pairs`` -> raw_matches.h5 ->
quality-scaled GV threshold -> geometric verification -> min-inlier /
inlier-ratio gates -> matches.h5) and the detector-free variant that takes
image paths and appends new keypoints to features.h5
(``matcher_base.py:575-983``).

TPU-native shape: ``BatchedMatcher`` is the hot path. It loads all features
once, pads them to a fixed keypoint capacity (multiple of 128), stacks pair
batches into (B, K, D) arrays and runs one jitted program per batch
(``_match_batch_arrays``), optionally verifying the whole batch with the
on-device RANSAC (``ops/ransac.py``) instead of per-pair host USAC calls.
The per-pair Python loop of the reference (``image_matching.py:467-487``)
becomes one device program per B pairs.
"""

from __future__ import annotations

import inspect
import logging
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..constants import KPT_PAD_MULTIPLE, Quality
from ..io.h5 import get_features, list_h5_names, save_matches
from ..io.writer import MatchWriter
from ..utils.geometric_verification import geometric_verification
from ..constants import GeometricVerification

logger = logging.getLogger("dim_tpu")

# GV pixel threshold is scaled when matching at reduced quality
# (reference ``matcher_base.py:298-308``).
GV_QUALITY_SCALES = {
    Quality.HIGHEST: 1.0,
    Quality.HIGH: 1.0,
    Quality.MEDIUM: 1.5,
    Quality.LOW: 2.0,
    Quality.LOWEST: 3.0,
}


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


_TAKE_JIT = None


def _take_rows(table, ind):
    """jitted ``take(table, ind, axis=0)`` — with a replicated table and a
    batch-sharded ``ind``, GSPMD shards the gathered batch without any
    host staging."""
    global _TAKE_JIT
    if _TAKE_JIT is None:
        import jax
        import jax.numpy as jnp

        _TAKE_JIT = jax.jit(lambda v, i: jnp.take(v, i, axis=0))
    return _TAKE_JIT(table, ind)


_PACK_JITS: Dict[bool, object] = {}


def _pack_match_results(matches0, valid, inl=None):
    """Pack a chunk's (matches0 int32, valid bool[, inl bool]) — all (B, K)
    — into one int32 array: bits 15:0 = match index (K <= 65535; unmatched
    rows carry garbage there and are never read — ``valid`` gates every
    consumer), bit 16 = valid, bit 17 = inlier. One device->host transfer
    per chunk instead of three (each transfer pays a round trip)."""
    import jax
    import jax.numpy as jnp

    with_inl = inl is not None
    fn = _PACK_JITS.get(with_inl)
    if fn is None:
        if with_inl:
            def _pack(m, v, i):
                return (
                    (m & 0xFFFF)
                    | (v.astype(jnp.int32) << 16)
                    | (i.astype(jnp.int32) << 17)
                )
        else:
            def _pack(m, v):
                return (m & 0xFFFF) | (v.astype(jnp.int32) << 16)
        fn = jax.jit(_pack)
        _PACK_JITS[with_inl] = fn
    return fn(matches0, valid, inl) if with_inl else fn(matches0, valid)


class MatcherBase:
    default_conf: Dict = {}

    def __init__(self, config: dict):
        self.config = config
        matcher_conf = config.get("matcher", {})
        self.conf = {**self.default_conf, **matcher_conf}
        general = config.get("general", {})
        self.quality: Quality = general.get("quality", Quality.HIGH)
        self.gv_method = general.get("geom_verification", GeometricVerification.MAGSAC)
        self.gv_threshold = float(general.get("gv_threshold", 4.0))
        self.gv_confidence = float(general.get("gv_confidence", 0.99999))
        self.min_inliers_per_pair = int(general.get("min_inliers_per_pair", 15))
        self.min_inlier_ratio_per_pair = float(
            general.get("min_inlier_ratio_per_pair", 0.15)
        )
        self.tpu = dict(general.get("tpu", {}))
        # in-memory extract->match handoff, set by ImageMatcher: per-image
        # FeaturesDicts with h5-roundtrip-exact values (f16 desc/scores) so
        # the padded store skips re-reading the gzip features.h5 the same
        # process just wrote; any image absent here falls back to the file
        self.feature_cache: Optional[Dict[str, Dict[str, np.ndarray]]] = None
        # device-resident handoff from the extractor (TPU fast path), set by
        # ImageMatcher; the padded store builds its device arrays from it
        # and features.h5 is never re-read in-process
        self.device_handoff = None
        # persistent-handle h5 writer, set for the duration of match_all
        self._writer: Optional[MatchWriter] = None
        # persistent features.h5 handle (detector-free appends)
        self._feature_fd = None

    # ------------------------------------------------------------------ API
    def match(
        self,
        feature_path: Path,
        matches_path: Path,
        img0: str,
        img1: str,
    ) -> Optional[np.ndarray]:
        """Match one pair; returns verified (M,2) matches or None if the
        pair was dropped by the gates."""
        feats0 = get_features(feature_path, img0)
        feats1 = get_features(feature_path, img1)
        matches = self._match_pairs(feats0, feats1)
        self._save_raw(matches_path, img0, img1, matches)
        return self._verify_and_save(
            matches_path, img0, img1, matches,
            feats0["keypoints"], feats1["keypoints"],
        )

    def match_all(
        self,
        pairs: List[Tuple[str, str]],
        feature_path: Path,
        matches_path: Path,
    ) -> Dict[Tuple[str, str], int]:
        """Match a pair list; base implementation loops (host matchers)."""
        results: Dict[Tuple[str, str], int] = {}
        with MatchWriter(matches_path) as writer:
            self._writer = writer
            try:
                for img0, img1 in pairs:
                    try:
                        m = self.match(feature_path, matches_path, img0, img1)
                        results[(img0, img1)] = 0 if m is None else len(m)
                    except Exception as e:  # keep going (reference behavior)
                        logger.warning(f"Matching {img0}-{img1} failed: {e}")
                        results[(img0, img1)] = 0
            finally:
                self._writer = None
        return results

    # -------------------------------------------------------------- template
    def _match_pairs(self, feats0: dict, feats1: dict) -> np.ndarray:
        """Subclass hook: two FeaturesDicts -> (M, 2) int match indices."""
        raise NotImplementedError

    # ------------------------------------------------------------- internals
    def _save_raw(self, matches_path: Path, img0: str, img1: str, matches: np.ndarray):
        if self._writer is not None:
            self._writer.save_raw(img0, img1, matches)
            return
        raw_path = Path(matches_path).parent / "raw_matches.h5"
        save_matches(raw_path, img0, img1, matches)

    def _save_verified(self, matches_path: Path, img0: str, img1: str, matches: np.ndarray):
        if self._writer is not None:
            self._writer.save_verified(img0, img1, matches)
            return
        save_matches(matches_path, img0, img1, matches)

    def _verify_and_save(
        self,
        matches_path: Path,
        img0: str,
        img1: str,
        matches: np.ndarray,
        kpts0: np.ndarray,
        kpts1: np.ndarray,
        inlier_mask: Optional[np.ndarray] = None,
    ) -> Optional[np.ndarray]:
        """Geometric verification + gates + matches.h5 write. If
        ``inlier_mask`` is given (device-batched RANSAC already ran), the
        host GV call is skipped."""
        if len(matches) < 8:
            logger.debug(f"Too few matches ({len(matches)}) for {img0}-{img1}")
            return None
        if inlier_mask is None:
            threshold = self.gv_threshold * GV_QUALITY_SCALES[self.quality]
            _, inlier_mask = geometric_verification(
                kpts0=kpts0[matches[:, 0]],
                kpts1=kpts1[matches[:, 1]],
                method=self.gv_method,
                threshold=threshold,
                confidence=self.gv_confidence,
            )
        num_inliers = int(np.sum(inlier_mask))
        ratio = num_inliers / max(len(matches), 1)
        verified = matches[np.asarray(inlier_mask, bool)]
        if num_inliers < self.min_inliers_per_pair:
            logger.debug(f"Too few inliers ({num_inliers}) for {img0}-{img1}")
            return None
        if ratio < self.min_inlier_ratio_per_pair:
            logger.debug(f"Inlier ratio too small ({ratio:.2%}) for {img0}-{img1}")
            return None
        self._save_verified(matches_path, img0, img1, verified)
        return verified

    def _use_device_gv(self) -> bool:
        """Whether geometric verification runs as the batched on-device
        RANSAC (``ops/ransac.py``).

        ``tpu.device_ransac: "auto"`` (the default) routes the RANSAC-family
        methods (MAGSAC / RANSAC / JAX_RANSAC) to the device kernel whenever
        an accelerator backend is active, so the production default runs the
        bench-verified fast path. Host OpenCV/pydegensac remain the fidelity
        mode: pick any explicitly host-only method (PYDEGENSAC, LMEDS, RHO,
        USAC_*) or set ``device_ransac: false`` to keep GV on host."""
        dr = self.tpu.get("device_ransac", "auto")
        if isinstance(dr, str) and dr.lower() == "auto":
            import jax

            if jax.default_backend() == "cpu":
                return False
            return self.gv_method in (
                GeometricVerification.JAX_RANSAC,
                GeometricVerification.MAGSAC,
                GeometricVerification.RANSAC,
            )
        return bool(dr) and (
            self.gv_method is GeometricVerification.JAX_RANSAC
            or bool(self.tpu.get("force_device_ransac", False))
        )

    def _host_gv_batch(self, jobs):
        """Run host geometric verification for a list of
        ``(matches (M,2) int, kpts0, kpts1)`` jobs; returns one inlier mask
        per job (None where < 8 matches).

        Host GV (OpenCV USAC / pydegensac) is embarrassingly parallel per
        pair and the C++ solvers release the GIL, so a thread pool overlaps
        them across cores — the reference runs them serially in its per-pair
        loop (``image_matching.py:467-487``). ``tpu.gv_workers`` overrides
        the pool width (0 = cpu_count)."""
        import os

        threshold = self.gv_threshold * GV_QUALITY_SCALES[self.quality]

        def one(job):
            m, k0, k1 = job
            if len(m) < 8:
                return None
            _, mask = geometric_verification(
                kpts0=k0[m[:, 0]],
                kpts1=k1[m[:, 1]],
                method=self.gv_method,
                threshold=threshold,
                confidence=self.gv_confidence,
            )
            return mask

        workers = int(self.tpu.get("gv_workers", 0)) or (os.cpu_count() or 1)
        workers = min(workers, len(jobs))
        if workers <= 1:
            return [one(j) for j in jobs]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(workers) as ex:
            return list(ex.map(one, jobs))


class BatchedMatcher(MatcherBase):
    """Pads features to a fixed capacity and matches pairs in device batches.

    Subclasses implement ``_match_batch_arrays`` over stacked padded arrays;
    geometric verification runs either batched on device (JAX RANSAC) or
    per-pair on host, then the standard gates + h5 writes apply.
    """

    def match_all(self, pairs, feature_path, matches_path):
        if not pairs:
            return {}
        names = sorted({n for p in pairs for n in p})
        store = _PaddedFeatureStore(
            feature_path, names, cache=self.feature_cache,
            device_handoff=getattr(self, "device_handoff", None),
        )
        from ..constants import TileSelection

        tile_mode = self.config.get("general", {}).get(
            "tile_selection", TileSelection.NONE
        )
        if tile_mode is not TileSelection.NONE and store.has_tiles:
            return self._match_all_tiled(pairs, store, matches_path, tile_mode)
        bsz = int(self.tpu.get("match_batch_size", 32))
        use_device_gv = self._use_device_gv()
        results: Dict[Tuple[str, str], int] = {}
        # software pipelining: JAX dispatch is async, so issue chunk N+1's
        # (and N+2's) device program before materializing + verifying +
        # writing chunk N — host GV (USAC) and h5 writes overlap device
        # compute instead of serializing after it (the reference's per-pair
        # loop ``image_matching.py:467-487`` serializes all three). Two
        # chunks deep so chunk N's device->host transfer also overlaps
        # chunk N+1's compute (one-deep, finish(N) blocks on N's transfer
        # the moment N's compute ends).
        with MatchWriter(matches_path) as writer:
            self._writer = writer
            try:
                window: list = []  # [(chunk, dispatched device arrays)]
                for start in range(0, len(pairs), bsz):
                    chunk = pairs[start : start + bsz]
                    try:
                        disp = self._dispatch_chunk(chunk, store, use_device_gv)
                    except Exception as e:
                        logger.warning(
                            f"Dispatch of batch {len(chunk)} failed "
                            f"({type(e).__name__}: {e}); running synchronously"
                        )
                        disp = None
                    if disp is None:
                        while window:
                            self._finish_chunk_resilient(
                                *window.pop(0), store, matches_path,
                                use_device_gv, results,
                            )
                        self._match_chunk_resilient(
                            chunk, store, matches_path, use_device_gv, results
                        )
                        continue
                    window.append((chunk, disp))
                    if len(window) > 2:
                        self._finish_chunk_resilient(
                            *window.pop(0), store, matches_path,
                            use_device_gv, results,
                        )
                for job in window:
                    self._finish_chunk_resilient(
                        *job, store, matches_path, use_device_gv, results
                    )
            finally:
                self._writer = None
        return results

    def _finish_chunk_resilient(
        self, chunk, disp, store, matches_path, use_device_gv, results
    ):
        """Materialize + verify + write a dispatched chunk; on failure
        (async device errors surface here) fall back to the synchronous
        bisecting path — rewrites are idempotent (overwrite-on-rewrite)."""
        try:
            self._finish_chunk(
                chunk, disp, store, matches_path, use_device_gv, results
            )
        except Exception as e:
            logger.warning(
                f"Finishing batch of {len(chunk)} failed "
                f"({type(e).__name__}: {e}); retrying synchronously"
            )
            self._match_chunk_resilient(
                chunk, store, matches_path, use_device_gv, results
            )

    def _match_chunk_resilient(
        self, chunk, store, matches_path, use_device_gv, results
    ):
        """OOM/failure containment (reference ``matcher_base.py:246-256``
        falls back from full-image to tiled matching on CUDA OOM): a failed
        batch is bisected and retried — a device OOM at batch B usually
        succeeds at B/2 — and a single failing pair is logged and skipped
        rather than killing the run (reference per-pair try/except
        ``image_matching.py:476-486``)."""
        try:
            self._match_chunk(chunk, store, matches_path, use_device_gv, results)
        except Exception as e:
            if len(chunk) > 1:
                logger.warning(
                    f"Match batch of {len(chunk)} failed "
                    f"({type(e).__name__}: {e}); retrying in halves"
                )
                mid = len(chunk) // 2
                self._match_chunk_resilient(
                    chunk[:mid], store, matches_path, use_device_gv, results
                )
                self._match_chunk_resilient(
                    chunk[mid:], store, matches_path, use_device_gv, results
                )
            else:
                logger.warning(f"Matching {chunk[0][0]}-{chunk[0][1]} failed: {e}")
                results[tuple(chunk[0])] = 0

    def _match_chunk(self, chunk, store, matches_path, use_device_gv, results):
        disp = self._dispatch_chunk(chunk, store, use_device_gv)
        self._finish_chunk(
            chunk, disp, store, matches_path, use_device_gv, results
        )

    def _dispatch_chunk(self, chunk, store, use_device_gv: bool = False):
        """Issue the device matching program for a chunk; returns the (still
        lazy) device arrays so the caller can overlap host work with device
        compute before materializing them in ``_finish_chunk``.

        When ``use_device_gv`` is set and the HBM-resident store is live,
        the batched RANSAC is chained onto the matching program here (the
        keypoint gather happens on device from the resident store), so one
        chunk costs exactly one dispatch and one download — through a remote
        device tunnel every extra host sync is a round trip."""
        import jax

        from ..parallel.mesh import get_default_mesh

        idx0 = [store.index[a] for a, _ in chunk]
        idx1 = [store.index[b] for _, b in chunk]
        # data-parallel over the device mesh: pad to a divisible batch and
        # shard the batch axis; XLA partitions the matching program
        mesh = get_default_mesh()
        on_device_store = False
        if mesh.n_devices > 1:
            if not getattr(store, "_device_failed", False):
                # mesh-resident store: the padded per-image features are
                # replicated across the mesh ONCE; each chunk gathers its
                # pair batch on device from a sharded index vector, so the
                # O(pairs) host->device batch re-uploads of the host-gather
                # path disappear (the single-chip HBM store, generalized
                # to SPMD — replicated table + batch-sharded take)
                try:
                    in0 = store.gather_device_mesh(idx0, mesh)
                    in1 = store.gather_device_mesh(idx1, mesh)
                    on_device_store = True
                except Exception as e:
                    store._device_failed = True
                    logger.warning(
                        f"Mesh feature store unavailable ({type(e).__name__}:"
                        f" {e}); falling back to host-side batch gathers"
                    )
            if not on_device_store:
                batch0 = store.gather(idx0)
                batch1 = store.gather(idx1)
                full = batch0.pop("_full", None), batch1.pop("_full", None)
                in0 = mesh.shard_batch(mesh.pad_batch(batch0))
                in1 = mesh.shard_batch(mesh.pad_batch(batch1))
                in0["_full"], in1["_full"] = full
        elif jax.default_backend() != "cpu" and not getattr(
            store, "_device_failed", False
        ):
            # single accelerator: assemble the batch on device from the
            # HBM-resident store (features upload once, not once per pair).
            # If the whole-store upload itself doesn't fit HBM, fall back
            # to per-chunk host gathers permanently — retrying the same
            # upload per bisected chunk would fail identically and defeat
            # the OOM bisection recovery.
            try:
                in0 = store.gather_device(idx0)
                in1 = store.gather_device(idx1)
                on_device_store = True
            except Exception as e:
                store._device_failed = True
                logger.warning(
                    f"Device feature store unavailable ({type(e).__name__}: "
                    f"{e}); falling back to host-side batch gathers"
                )
                in0 = store.gather(idx0)
                in1 = store.gather(idx1)
        else:
            in0 = store.gather(idx0)
            in1 = store.gather(idx1)
        ind0 = in0.pop("_ind", None)
        ind1 = in1.pop("_ind", None)
        matches0, valid = self._match_batch_arrays(in0, in1)
        inl = None
        if use_device_gv and on_device_store:
            import jax.numpy as jnp

            from ..ops.ransac import ransac_fundamental_store_batch

            if mesh.n_devices > 1:
                kpts_table = store.device_mesh(mesh)["keypoints"]
            else:
                kpts_table = store.device()["keypoints"]
                ind0 = jnp.asarray(np.asarray(idx0, np.int32))
                ind1 = jnp.asarray(np.asarray(idx1, np.int32))
            inl = ransac_fundamental_store_batch(
                kpts_table, ind0, ind1,
                matches0, valid,
                jax.random.PRNGKey(0),
                self.gv_threshold * GV_QUALITY_SCALES[self.quality],
                iters=int(self.tpu.get("ransac_iters", 2048)),
            )
        # pack (matches0, valid[, inl]) into ONE int32 array so the chunk
        # costs a single device->host transfer instead of three — each
        # transfer pays a full round trip (measured 46 ms/array through the
        # tunnel; PCIe hosts still pay per-transfer latency). Lossless:
        # match indices use 16 bits (K <= 65535), flags the bits above.
        packed = _pack_match_results(matches0, valid, inl)
        # start the device->host copy NOW: it completes in the transfer
        # stream while the next chunk computes, so _finish_chunk's
        # device_get hits host memory instead of paying compute + download
        # latency serially
        if hasattr(packed, "copy_to_host_async"):
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
        return idx0, idx1, packed, inl is not None

    def _finish_chunk(
        self, chunk, disp, store, matches_path, use_device_gv, results
    ):
        import jax
        import jax.numpy as jnp

        idx0, idx1, packed, has_inl = disp
        B = len(chunk)
        # ONE materialization point for the whole chunk (see _dispatch_chunk)
        packed = np.asarray(jax.device_get(packed))[:B]
        matches0 = (packed & 0xFFFF).astype(np.int32)
        valid = ((packed >> 16) & 1).astype(bool)
        inl = ((packed >> 17) & 1).astype(bool) if has_inl else None

        if use_device_gv and inl is None:
            # mesh / host-gather paths: batch RANSAC from host arrays
            from ..ops.ransac import ransac_fundamental_batch

            # matched coordinate pairs: (kpts0[i], kpts1[matches0[i]])
            K = matches0.shape[1]
            mk0 = store.kpts[np.asarray(idx0)]
            gather_idx = np.clip(matches0, 0, K - 1)
            mk1 = np.take_along_axis(
                store.kpts[np.asarray(idx1)],
                gather_idx[..., None].repeat(2, -1), axis=1,
            )
            threshold = self.gv_threshold * GV_QUALITY_SCALES[self.quality]
            _, inl, _ = ransac_fundamental_batch(
                jnp.asarray(mk0), jnp.asarray(mk1), jnp.asarray(valid),
                jax.random.PRNGKey(0), threshold,
                int(self.tpu.get("ransac_iters", 2048)),
            )
            inl = np.asarray(inl)

        prepared = []
        for b, (img0, img1) in enumerate(chunk):
            sel = valid[b]
            pair_matches = np.stack(
                [np.nonzero(sel)[0], matches0[b][sel]], axis=1
            ).astype(np.int32)
            # map padded row indices back to the per-image feature indexing
            n0 = store.counts[idx0[b]]
            n1 = store.counts[idx1[b]]
            keep = (pair_matches[:, 0] < n0) & (pair_matches[:, 1] < n1)
            pair_matches = pair_matches[keep]
            mask = inl[b][sel][keep] if inl is not None else None
            prepared.append((b, img0, img1, pair_matches, mask))

        if inl is None:
            # host-GV mode: run the per-pair C++ solvers across a thread
            # pool before the (single-writer) h5 loop
            masks = self._host_gv_batch(
                [
                    (pm, store.keypoints_of(idx0[b]), store.keypoints_of(idx1[b]))
                    for b, _, _, pm, _ in prepared
                ]
            )
            prepared = [
                (b, i0, i1, pm, mk)
                for (b, i0, i1, pm, _), mk in zip(prepared, masks)
            ]

        for b, img0, img1, pair_matches, mask in prepared:
            self._save_raw(matches_path, img0, img1, pair_matches)
            verified = self._verify_and_save(
                matches_path, img0, img1, pair_matches,
                store.keypoints_of(idx0[b]), store.keypoints_of(idx1[b]),
                inlier_mask=mask,
            )
            results[(img0, img1)] = 0 if verified is None else len(verified)

    def _match_batch_arrays(
        self, batch0: Dict[str, np.ndarray], batch1: Dict[str, np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Subclass hook over stacked padded arrays.

        batch dicts hold ``keypoints (B,K,2)``, ``descriptors (B,K,D)``,
        ``scores (B,K)``, ``mask (B,K)``, ``image_size (B,2)``.
        Returns (matches0 (B,K) int32 into the second set, valid (B,K) bool).
        """
        raise NotImplementedError

    # ---------------------------------------------------------------- tiled
    def _match_all_tiled(self, pairs, store, matches_path, tile_mode):
        """Tiled matching: expand each pair into tile-pair jobs whose masks
        restrict the padded feature sets to one tile each; indices stay
        global, so results union + dedup directly (matchers/tiling.py)."""
        from ..constants import GeometricVerification, TileSelection
        from .tiling import LowResProbe, select_tile_pairs, tile_grid_for

        general = self.config.get("general", {})
        tile_size = general.get("tile_size", (2400, 2000))
        overlap = general.get("tile_overlap", 10)
        min_per_tile = int(general.get("min_matches_per_tile", 10))
        image_dir = general.get("image_dir")

        probe = None
        if tile_mode in (
            TileSelection.PRESELECTION,
            TileSelection.PRESELECTION_AFFINE_TRANSFORM,
        ):
            # reference matcher_base.py:1095-1110: the probe pipeline is
            # configurable — superpoint+lightglue (default) or roma
            presel_pipe = str(
                general.get("preselection_pipeline", "superpoint+lightglue")
            )
            if presel_pipe == "roma":
                from .tiling import RomaProbe

                probe = RomaProbe()
            else:
                probe = LowResProbe(
                    preselection_size=int(
                        general.get("tile_preselection_size", 2000)
                    )
                )

        # tile grids per image (origins recomputed from size + config)
        grids = {}
        for name, i in store.index.items():
            wh = store.image_size[i]
            origins, tile_wh = tile_grid_for(wh, tile_size, overlap)
            grids[name] = (origins, tile_wh)

        jobs = []  # (pair_idx, i0, i1, t0, t1)
        for p_idx, (name0, name1) in enumerate(pairs):
            i0, i1 = store.index[name0], store.index[name1]
            o0, twh0 = grids[name0]
            o1, twh1 = grids[name1]
            lp0 = lp1 = None
            if probe is not None and image_dir is not None:
                try:
                    lp0, lp1 = probe.matches(
                        Path(image_dir) / name0, Path(image_dir) / name1
                    )
                except Exception as e:
                    logger.warning(f"Tile preselection probe failed: {e}")
            tile_pairs = select_tile_pairs(
                tile_mode, len(o0), len(o1),
                lowres_pts0=lp0, lowres_pts1=lp1,
                origins0=o0, origins1=o1, tile_wh0=twh0, tile_wh1=twh1,
                min_matches=min_per_tile,
            )
            for t0, t1 in tile_pairs:
                jobs.append((p_idx, i0, i1, t0, t1))
        logger.info(
            f"Tiled matching: {len(pairs)} pairs -> {len(jobs)} tile-pair jobs"
        )

        bsz = int(self.tpu.get("match_batch_size", 32))
        per_pair: Dict[int, list] = {i: [] for i in range(len(pairs))}

        import os

        import jax

        use_device_store = (
            jax.default_backend() != "cpu"
            or os.environ.get("DIM_TPU_FORCE_DEVICE_STORE") == "1"
        ) and not getattr(store, "_device_failed", False)

        from ..parallel.mesh import get_default_mesh

        mesh = get_default_mesh()

        def dispatch(chunk):
            i0s = [j[1] for j in chunk]
            i1s = [j[2] for j in chunk]
            t0s = np.array([j[3] for j in chunk], np.float32)
            t1s = np.array([j[4] for j in chunk], np.float32)
            if use_device_store:
                # tiles-as-batch-dim on the HBM-resident store: the tile
                # restriction is a device-side mask AND, so a tile-pair
                # chunk uploads two small index vectors instead of
                # re-uploading (B, K, D) descriptor slabs per chunk; on a
                # >1-device mesh the store replicates and the job batch
                # shards (SPMD tiles-as-batch)
                try:
                    if mesh.n_devices > 1:
                        batch0 = store.gather_device_mesh_tiled(i0s, t0s, mesh)
                        batch1 = store.gather_device_mesh_tiled(i1s, t1s, mesh)
                    else:
                        batch0 = store.gather_device_tiled(i0s, t0s)
                        batch1 = store.gather_device_tiled(i1s, t1s)
                    batch0.pop("_ind", None)
                    batch1.pop("_ind", None)
                    return self._match_batch_arrays(batch0, batch1)
                except Exception as e:
                    store._device_failed = True
                    logger.warning(
                        f"Device feature store unavailable for tiled "
                        f"matching ({type(e).__name__}: {e}); falling back "
                        f"to host gathers"
                    )
            batch0 = dict(store.gather(i0s))
            batch1 = dict(store.gather(i1s))
            batch0.pop("_full", None)
            batch1.pop("_full", None)
            batch0["mask"] = batch0["mask"] & (
                store.tile_idx[i0s] == t0s[:, None]
            )
            batch1["mask"] = batch1["mask"] & (
                store.tile_idx[i1s] == t1s[:, None]
            )
            return self._match_batch_arrays(batch0, batch1)

        gv_per_tile = bool(general.get("geometric_verification_per_tile", False))
        gv_tile_th = float(general.get("gv_threshold_in_tiles_matching", 4))

        def finish(chunk, disp):
            matches0 = np.asarray(disp[0])
            valid = np.asarray(disp[1])
            for b, (p_idx, i0, i1, _t0, _t1) in enumerate(chunk):
                sel = valid[b]
                rows = np.nonzero(sel)[0]
                if not len(rows):
                    continue
                m = np.stack([rows, matches0[b][rows]], axis=1)
                if gv_per_tile:
                    # reference matcher_base.py:428-440: verify each
                    # tile-pair's matches independently; a tile pair with
                    # < 15 inliers contributes nothing
                    from ..utils.geometric_verification import (
                        geometric_verification,
                    )

                    _, inl = geometric_verification(
                        store.keypoints_of(i0)[m[:, 0]],
                        store.keypoints_of(i1)[m[:, 1]],
                        method=general.get(
                            "geom_verification", GeometricVerification.MAGSAC
                        ),
                        threshold=gv_tile_th,
                        confidence=float(general.get("gv_confidence", 0.99999)),
                        quiet=True,
                    )
                    if inl is None or inl.sum() < 15:
                        continue
                    m = m[inl]
                per_pair[p_idx].append(m)

        # one-chunk-deep pipeline: the next chunk's device program is in
        # flight while the previous chunk's results are post-processed
        pending = None
        for start in range(0, len(jobs), bsz):
            chunk = jobs[start : start + bsz]
            disp = dispatch(chunk)
            if pending is not None:
                finish(*pending)
            pending = (chunk, disp)
        if pending is not None:
            finish(*pending)

        results: Dict[Tuple[str, str], int] = {}
        with MatchWriter(matches_path) as writer:
            self._writer = writer
            try:
                for p_idx, (name0, name1) in enumerate(pairs):
                    chunks = per_pair[p_idx]
                    if chunks:
                        m = np.concatenate(chunks, axis=0).astype(np.int32)
                        # dedup: one match per query keypoint (keep first)
                        _, first = np.unique(m[:, 0], return_index=True)
                        m = m[np.sort(first)]
                        n0 = store.counts[store.index[name0]]
                        n1 = store.counts[store.index[name1]]
                        m = m[(m[:, 0] < n0) & (m[:, 1] < n1)]
                    else:
                        m = np.zeros((0, 2), np.int32)
                    self._save_raw(matches_path, name0, name1, m)
                    verified = self._verify_and_save(
                        matches_path, name0, name1, m,
                        store.keypoints_of(store.index[name0]),
                        store.keypoints_of(store.index[name1]),
                    )
                    results[(name0, name1)] = 0 if verified is None else len(verified)
            finally:
                self._writer = None
        return results


class _PaddedFeatureStore:
    """All images' features in fixed-capacity padded arrays (host memory)."""

    def __init__(self, feature_path, names: List[str], cache=None,
                 device_handoff=None):
        self._lazy_dev = None
        if device_handoff is not None and device_handoff.covers(names):
            self._init_from_handoff(device_handoff, names)
            return
        cache = cache or {}
        known = set(list_h5_names(feature_path)) if any(
            n not in cache for n in names
        ) else set()
        missing = [n for n in names if n not in known and n not in cache]
        if missing:
            raise ValueError(f"Features missing for {missing[:5]}...")
        feats = [
            cache[n] if n in cache else get_features(feature_path, n)
            for n in names
        ]
        counts = [len(f["keypoints"]) for f in feats]
        cap = _round_up(max(max(counts), 1), KPT_PAD_MULTIPLE)
        dims = [
            (f["descriptors"].shape[0] if f["descriptors"].shape[1] == c else f["descriptors"].shape[1])
            for f, c in zip(feats, counts) if "descriptors" in f and c > 0
        ]
        D = dims[0] if dims else 0
        n = len(names)
        self.index = {name: i for i, name in enumerate(names)}
        self.counts = np.array(counts, np.int32)
        self.kpts = np.zeros((n, cap, 2), np.float32)
        self.desc = np.zeros((n, cap, D), np.float32)
        self.scores = np.zeros((n, cap), np.float32)
        self.mask = np.zeros((n, cap), bool)
        self.image_size = np.zeros((n, 2), np.int32)
        self.tile_idx = np.full((n, cap), -1.0, np.float32)
        self.has_tiles = False
        for i, f in enumerate(feats):
            c = counts[i]
            self.kpts[i, :c] = f["keypoints"]
            if "descriptors" in f and c > 0:
                d = f["descriptors"]
                if d.shape[0] != c:  # stored (D, N) -> (N, D)
                    d = d.T
                self.desc[i, :c] = d
            if "scores" in f:
                self.scores[i, :c] = f["scores"]
            if "tile_idx" in f and c > 0:
                self.tile_idx[i, :c] = f["tile_idx"]
                self.has_tiles = True
            self.mask[i, :c] = True
            if "image_size" in f:
                self.image_size[i] = f["image_size"]

    def _init_from_handoff(self, handoff, names: List[str]) -> None:
        """Build the store from a DeviceFeatureHandoff: descriptors/scores/
        mask stay on device (where matching consumes them); host mirrors of
        the big arrays are materialized lazily, only if a fallback path
        (mesh gather, device-store failure) actually needs them."""
        import jax.numpy as jnp

        rows = np.asarray([handoff.index[n] for n in names], np.int32)
        self.index = {n: i for i, n in enumerate(names)}
        self.counts = handoff.counts[rows]
        self.kpts = handoff.kpts[rows]
        self.image_size = handoff.image_size[rows]
        cap = handoff.kpts.shape[1]
        if handoff.tile_idx is not None:
            self.tile_idx = handoff.tile_idx[rows]
            self.has_tiles = True
        else:
            self.tile_idx = np.full((len(names), cap), -1.0, np.float32)
            self.has_tiles = False
        ind = jnp.asarray(rows)
        self._dev = {
            k: jnp.take(v, ind, axis=0) for k, v in handoff.dev.items()
        }
        self._dev["image_size"] = jnp.asarray(self.image_size)
        self._lazy_dev = ("descriptors", "scores", "mask")

    def __getattr__(self, name):
        # lazy host mirrors for the handoff-built store (fallback paths)
        if name in ("desc", "scores", "mask") and self.__dict__.get("_lazy_dev"):
            import jax

            key = {"desc": "descriptors"}.get(name, name)
            val = np.asarray(jax.device_get(self.__dict__["_dev"][key]))
            if name == "desc":
                val = val.astype(np.float32)
            setattr(self, name, val)
            return val
        raise AttributeError(name)

    def _all_full(self, idx: np.ndarray) -> bool:
        """Host-side check that every gathered image fills its padded
        capacity — lets matchers promise ``assume_full_masks`` statically
        without a blocking device->host sync on the mask arrays."""
        cap = self.kpts.shape[1]
        return bool(np.all(self.counts[idx] == cap))

    def gather(self, idx: List[int]) -> Dict[str, np.ndarray]:
        idx = np.asarray(idx)
        return {
            "keypoints": self.kpts[idx],
            "descriptors": self.desc[idx],
            "scores": self.scores[idx],
            "mask": self.mask[idx],
            "image_size": self.image_size[idx],
            "_full": self._all_full(idx),
        }

    def device(self) -> Dict[str, "object"]:
        """Device-resident copy of the padded store, uploaded once.

        Each image participates in O(N) pairs under bruteforce; gathering
        pair batches on host re-uploads its descriptors once per pair
        (3.3 GB for 40 images / 780 pairs at K=2048). Uploading the store
        once (84 MB for the same set) and assembling batches with an
        on-device take() removes that traffic entirely — the TPU-native
        analog of keeping the feature database HBM-resident.
        """
        if not hasattr(self, "_dev"):
            import jax.numpy as jnp

            self._dev = {
                "keypoints": jnp.asarray(self.kpts),
                "descriptors": jnp.asarray(self.desc),
                "scores": jnp.asarray(self.scores),
                "mask": jnp.asarray(self.mask),
                "image_size": jnp.asarray(self.image_size),
            }
        return self._dev

    def device_tile_idx(self) -> "object":
        """Device copy of the per-keypoint tile indices (uploaded once;
        only the tiled match path needs it)."""
        if not hasattr(self, "_dev_tile_idx"):
            import jax.numpy as jnp

            self._dev_tile_idx = jnp.asarray(self.tile_idx)
        return self._dev_tile_idx

    def gather_device(self, idx: List[int]) -> Dict[str, "object"]:
        import jax.numpy as jnp

        dev = self.device()
        ind = jnp.asarray(np.asarray(idx, np.int32))
        out = {k: jnp.take(v, ind, axis=0) for k, v in dev.items()}
        out["_full"] = self._all_full(np.asarray(idx))
        return out

    def gather_device_tiled(self, idx: List[int], tiles: np.ndarray
                            ) -> Dict[str, "object"]:
        """Tiles-as-batch-dim gather (SURVEY §7 step 7): assemble a
        tile-pair batch on device from the HBM-resident store, restricting
        each row's validity mask to one tile. Host->device traffic per
        chunk is two small index vectors instead of the (B, K, D)
        descriptor slab the host-gather path re-uploads per tile pair."""
        import jax.numpy as jnp

        dev = self.device()
        tidx = self.device_tile_idx()
        ind = jnp.asarray(np.asarray(idx, np.int32))
        out = {k: jnp.take(v, ind, axis=0) for k, v in dev.items()}
        tsel = jnp.asarray(np.asarray(tiles, np.float32))
        out["mask"] = out["mask"] & (
            jnp.take(tidx, ind, axis=0) == tsel[:, None]
        )
        out["_full"] = False  # tile masks are partial by construction
        return out

    def device_mesh(self, mesh) -> Dict[str, "object"]:
        """Mesh-replicated copy of the padded store, uploaded once — the
        SPMD generalization of ``device()``: the feature table replicates
        across the mesh and each chunk's pair batch assembles on device
        from a batch-sharded index vector, so host->device traffic stays
        O(images) instead of O(pairs)."""
        if getattr(self, "_dev_mesh", None) is None:
            import jax

            host = {
                "keypoints": self.kpts,
                "descriptors": self.desc,
                "scores": self.scores,
                "mask": self.mask,
                "image_size": self.image_size,
            }
            rep = mesh.replicated()
            self._dev_mesh = {
                k: jax.device_put(v, rep) for k, v in host.items()
            }
        return self._dev_mesh

    def gather_device_mesh(self, idx: List[int], mesh) -> Dict[str, "object"]:
        """Assemble a pair batch on the mesh: replicated table, sharded
        index vector, sharded output (GSPMD propagates the take). The batch
        is padded up to a mesh multiple with repeated rows; callers trim.
        The padded sharded index rides along as ``_ind`` for programs that
        chain further table gathers (device RANSAC)."""
        import jax

        dev = self.device_mesh(mesh)
        arr = np.asarray(idx, np.int32)
        n = mesh.n_devices
        target = -(-len(arr) // n) * n
        if target != len(arr):
            arr = np.concatenate([arr, np.repeat(arr[-1:], target - len(arr))])
        ind = jax.device_put(arr, mesh.batch_sharding(1))
        out = {k: _take_rows(v, ind) for k, v in dev.items()}
        out["_full"] = self._all_full(np.asarray(idx))
        out["_ind"] = ind
        return out

    def device_mesh_tile_idx(self, mesh) -> "object":
        """Mesh-replicated per-keypoint tile indices (uploaded once)."""
        if getattr(self, "_dev_mesh_tile", None) is None:
            import jax

            self._dev_mesh_tile = jax.device_put(
                self.tile_idx, mesh.replicated()
            )
        return self._dev_mesh_tile

    def gather_device_mesh_tiled(
        self, idx: List[int], tiles: np.ndarray, mesh
    ) -> Dict[str, "object"]:
        """SPMD tiles-as-batch-dim gather: the mesh-replicated store +
        tile-index table, a batch-sharded index vector, and the tile
        restriction applied as a device-side mask AND — the multi-chip
        generalization of :meth:`gather_device_tiled`."""
        import jax

        out = self.gather_device_mesh(idx, mesh)
        ind = out["_ind"]
        rows = _take_rows(self.device_mesh_tile_idx(mesh), ind)
        arr = np.asarray(tiles, np.float32)
        n = mesh.n_devices
        target = -(-len(arr) // n) * n
        if target != len(arr):
            arr = np.concatenate(
                [arr, np.repeat(arr[-1:], target - len(arr))]
            )
        tsel = jax.device_put(arr, mesh.batch_sharding(1))
        out["mask"] = out["mask"] & (rows == tsel[:, None])
        out["_full"] = False  # tile masks are partial by construction
        return out

    def keypoints_of(self, i: int) -> np.ndarray:
        return self.kpts[i, : self.counts[i]]


class DetectorFreeMatcher(MatcherBase):
    """Detector-free matchers (LoFTR family): matching consumes image pairs
    and *produces* keypoints, which are appended per pair into features.h5
    with index offsetting (reference ``matcher_base.py:575-983``,
    ``_update_features_h5`` ``:824-849``)."""

    def match_all(self, pairs, feature_path, matches_path):
        general = self.config.get("general", {})
        image_dir = general.get("image_dir")
        if image_dir is None:
            raise ValueError("Detector-free matching needs general['image_dir']")
        results: Dict[Tuple[str, str], int] = {}
        # per-pair is measured FASTER per pair than batched for the dense
        # matchers on v5e (LoFTR 640x480: 58.7 pairs/s at B=1 vs 33 at B>=4 -
        # the (B, HW, HW-free) working set loses HBM locality), so the chunk
        # defaults to 1; raise matcher conf 'pair_batch_size' to batch.
        import h5py

        bsz = int(self.conf.get("pair_batch_size", 1))
        # matchers that expose a dispatch/finish split get 2-deep software
        # pipelining: pair N's (blocking) download, feature appends, and
        # host GV overlap pair N+1/N+2's device compute — the same shape as
        # BatchedMatcher.match_all. Without the split, chunks run
        # synchronously (RoMa/SE2-LoFTR until they opt in).
        dispatch = getattr(self, "_dispatch_images_batch", None)
        with MatchWriter(matches_path) as writer, h5py.File(
            str(feature_path), "a", libver="latest"
        ) as feature_fd:
            self._writer = writer
            self._feature_fd = feature_fd
            try:
                window: list = []

                def matched_of(paths):
                    try:
                        return self._match_images_batch(paths)
                    except Exception as e:
                        logger.warning(
                            f"Batched detector-free matching failed "
                            f"({type(e).__name__}: {e}); falling back per pair"
                        )
                        matched = []
                        for p0, p1 in paths:
                            try:
                                matched.append(self._match_images(p0, p1))
                            except Exception as e2:
                                logger.warning(
                                    f"Matching {p0.name}-{p1.name} failed: {e2}"
                                )
                                matched.append(None)
                        return matched

                def finish(chunk, disp, paths):
                    if disp is not None:
                        try:
                            matched = self._finish_images_batch(disp)
                        except Exception as e:
                            logger.warning(
                                f"Finishing detector-free batch failed "
                                f"({type(e).__name__}: {e}); retrying "
                                f"synchronously"
                            )
                            matched = matched_of(paths)
                    else:
                        matched = matched_of(paths)
                    self._consume_chunk(
                        chunk, matched, results, feature_path, matches_path
                    )

                for start in range(0, len(pairs), bsz):
                    chunk = pairs[start : start + bsz]
                    paths = [
                        (Path(image_dir) / a, Path(image_dir) / b) for a, b in chunk
                    ]
                    disp = None
                    if dispatch is not None:
                        try:
                            disp = dispatch(paths)
                        except Exception as e:
                            logger.warning(
                                f"Detector-free dispatch failed "
                                f"({type(e).__name__}: {e}); running "
                                f"synchronously"
                            )
                    if dispatch is not None and disp is not None:
                        window.append((chunk, disp, paths))
                        if len(window) > 2:
                            finish(*window.pop(0))
                        continue
                    # sync path: drain the window first (writes stay ordered)
                    while window:
                        finish(*window.pop(0))
                    finish(chunk, None, paths)
                while window:
                    finish(*window.pop(0))
            finally:
                self._writer = None
                self._feature_fd = None
        return results

    def _consume_chunk(
        self, chunk, matched, results, feature_path, matches_path
    ):
        """Per-pair host tail: append new keypoints to features.h5, write
        raw matches, GV + gates, write verified matches."""
        for (img0, img1), km in zip(chunk, matched):
            if km is None:
                results[(img0, img1)] = 0
                continue
            try:
                kpts0, kpts1 = km
                matches = self._append_features(
                    feature_path, img0, img1, kpts0, kpts1
                )
                self._save_raw(matches_path, img0, img1, matches)
                verified = self._verify_and_save_coords(
                    matches_path, img0, img1, matches, kpts0, kpts1
                )
                results[(img0, img1)] = (
                    0 if verified is None else len(verified)
                )
            except Exception as e:
                logger.warning(
                    f"Detector-free matching {img0}-{img1} failed: {e}"
                )
                results[(img0, img1)] = 0

    def _match_images(self, path0, path1):
        """Subclass hook: image paths -> matched coordinate arrays
        (kpts0 (M, 2), kpts1 (M, 2)) in full-resolution pixels."""
        raise NotImplementedError

    def _match_images_batch(self, paths):
        """Batched hook: list of (path0, path1) -> list of (kpts0, kpts1) or
        None per pair. Default: sequential per-pair matching; subclasses
        override to run shape-bucketed pair batches on device."""
        return [self._match_images(p0, p1) for p0, p1 in paths]

    def _append_features(self, feature_path, img0, img1, kpts0, kpts1):
        """Append per-pair keypoints to each image's feature group with
        index offsetting; returns the (M, 2) match index array.

        During ``match_all`` the file handle stays open and datasets are
        chunked + resizable, so each append is an in-place resize instead of
        a per-pair open / read-all / delete / rewrite cycle (which is
        O(total_kpts) per pair). Per-pair durability semantics (resume seam)
        are unchanged."""
        import h5py

        fd = self._feature_fd
        owns = fd is None
        if owns:
            fd = h5py.File(str(feature_path), "a", libver="latest")
        try:
            m = len(kpts0)
            matches = np.zeros((m, 2), np.int32)
            for col, (name, kpts) in enumerate(((img0, kpts0), (img1, kpts1))):
                grp = fd.require_group(name)
                kpts = np.asarray(kpts, np.float32).reshape(-1, 2)
                if "keypoints" in grp:
                    ds = grp["keypoints"]
                    offset = ds.shape[0]
                    if ds.maxshape[0] is None:  # resizable: append in place
                        ds.resize(offset + m, axis=0)
                        ds[offset:] = kpts
                    else:  # legacy fixed dataset: rewrite once as resizable
                        old = np.asarray(ds)
                        del grp["keypoints"]
                        grp.create_dataset(
                            "keypoints",
                            data=np.concatenate([old, kpts], axis=0),
                            maxshape=(None, 2), chunks=(4096, 2),
                        )
                else:
                    offset = 0
                    grp.create_dataset(
                        "keypoints", data=kpts,
                        maxshape=(None, 2), chunks=(4096, 2),
                    )
                matches[:, col] = np.arange(m) + offset
            return matches
        finally:
            if owns:
                fd.close()

    def _verify_and_save_coords(
        self, matches_path, img0, img1, matches, kpts0, kpts1
    ):
        """GV directly on the matched coordinates (indices are 1:1)."""
        if len(matches) < 8:
            return None
        threshold = self.gv_threshold * GV_QUALITY_SCALES[self.quality]
        _, inlier_mask = geometric_verification(
            kpts0=kpts0, kpts1=kpts1,
            method=self.gv_method, threshold=threshold,
            confidence=self.gv_confidence,
        )
        num_inliers = int(np.sum(inlier_mask))
        ratio = num_inliers / max(len(matches), 1)
        if num_inliers < self.min_inliers_per_pair:
            return None
        if ratio < self.min_inlier_ratio_per_pair:
            return None
        verified = matches[np.asarray(inlier_mask, bool)]
        self._save_verified(matches_path, img0, img1, verified)
        return verified


# ---------------------------------------------------------------------------
# Reflection loader (reference ``matchers/matcher_base.py:36-61``)
# ---------------------------------------------------------------------------

def matcher_loader(root_module, name: str):
    import importlib

    module = importlib.import_module(f"{root_module.__name__}.{name}")
    classes = [
        c for _, c in inspect.getmembers(module, inspect.isclass)
        if issubclass(c, MatcherBase)
        and c not in (MatcherBase, BatchedMatcher, DetectorFreeMatcher)
        and c.__module__ == module.__name__
    ]
    if not classes:
        raise ImportError(f"No matcher class found in module '{name}'")
    return classes[0]
