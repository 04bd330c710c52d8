"""Device-side tiling: slice overlapping tiles from a once-uploaded image
and merge per-tile features back into one padded per-image feature set.

Parity: reference ``extractors/extractor_base.py:279-390`` (per-tile extract,
origin offsetting, padding-border keypoint filter, dedup on rounded
coordinates, score-ranked cap) and ``utils/tiling.py:62-192`` (grid
geometry). The reference materializes every overlapping tile on host and
runs each through the GPU one at a time; the TPU-native shape uploads the
image ONCE (uint8), cuts the tile batch in HBM with vmapped dynamic slices,
and merges the per-tile results on device so the whole tiled extraction can
feed the device-resident extract->match handoff without descriptors ever
leaving HBM. Through the dev tunnel (~12-20 MB/s) the overlapping-tile
upload alone was ~17 MB per 2048 px image; this path moves the image bytes
once (and zero times when the device image cache already holds them).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from .detect import topk_flat


@functools.partial(jax.jit, static_argnames=("tile_hw", "pad"))
def cut_tiles(
    image: jnp.ndarray,       # (H, W[, C]) any dtype (uint8 preferred)
    starts_yx: jnp.ndarray,   # (T, 2) int32 (y, x) into the PADDED image
    tile_hw: tuple,           # (th, tw) static
    pad: tuple,               # (top, bottom, left, right) static
) -> jnp.ndarray:
    """Slice a (T, th, tw[, C]) tile batch out of one device-resident image.

    Equivalent to the host Tiler: the image is zero-padded to a
    window-divisible size, then overlapping windows are gathered — but the
    tiles never exist on host, so the host->device traffic is the image
    itself, once, instead of every overlapping window.
    """
    th, tw = tile_hw
    top, bottom, left, right = pad
    pad_spec = [(top, bottom), (left, right)] + [(0, 0)] * (image.ndim - 2)
    padded = jnp.pad(image, pad_spec)
    sizes = (th, tw) + padded.shape[2:]

    def one(s):
        start = (s[0], s[1]) + (0,) * (padded.ndim - 2)
        return jax.lax.dynamic_slice(padded, start, sizes)

    return jax.vmap(one)(starts_yx)


@functools.partial(jax.jit, static_argnames=("max_kpts",))
def merge_tile_features(
    kpts: jnp.ndarray,        # (T, K, 2) tile-local (x, y), f32
    scores: jnp.ndarray,      # (T, K) f32
    desc: jnp.ndarray,        # (T, K, D)
    mask: jnp.ndarray,        # (T, K) bool
    origins_xy: jnp.ndarray,  # (T, 2) f32/int tile origins in image coords
    wh: jnp.ndarray,          # (2,) f32 (w, h) of the (resized) image
    max_kpts: int,
) -> Dict[str, jnp.ndarray]:
    """Merge per-tile padded features into one (max_kpts, ...) padded set.

    Same semantics as the host ``_extract_by_tile`` merge:
      - keypoints offset by tile origins into image coordinates;
      - padding-border filter 0 <= x < w, 0 <= y < h;
      - dedup on rounded integer coordinates, keeping the lowest flat
        (tile-major) index among duplicates — the row
        ``np.unique(rounded, return_index=True)`` selects;
      - cap at ``max_kpts`` by score.
    Rows come back score-descending with valid rows as a prefix; ``tile_idx``
    is -1 on padding rows. Output order therefore differs from the host
    path's spatial order — downstream consumers (padded store, matchers,
    h5) are index-order-agnostic.
    """
    T, K, _ = kpts.shape
    D = desc.shape[-1]
    w = wh[0].astype(kpts.dtype)
    h = wh[1].astype(kpts.dtype)

    k = kpts + origins_xy[:, None, :].astype(kpts.dtype)
    inb = (
        mask
        & (k[..., 0] >= 0) & (k[..., 0] < w)
        & (k[..., 1] >= 0) & (k[..., 1] < h)
    )

    n = T * K
    fk = k.reshape(n, 2)
    fs = scores.reshape(n).astype(jnp.float32)
    fd = desc.reshape(n, D)
    fm = inb.reshape(n)
    ftile = jnp.repeat(jnp.arange(T, dtype=jnp.float32), K)

    # dedup on rounded coords without a 64-bit key: two stable sorts give
    # (ry, rx, flat-idx) lexicographic order; "first" rows are the lowest
    # flat index per unique rounded coordinate
    big = jnp.int32(2**30)
    rx = jnp.where(fm, jnp.round(fk[:, 0]).astype(jnp.int32), big)
    ry = jnp.where(fm, jnp.round(fk[:, 1]).astype(jnp.int32), big)
    o1 = jnp.argsort(rx, stable=True)
    o2 = jnp.argsort(ry[o1], stable=True)
    order = o1[o2]
    sy, sx = ry[order], rx[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), (sy[1:] != sy[:-1]) | (sx[1:] != sx[:-1])]
    )
    keep = jnp.zeros(n, bool).at[order].set(first) & fm

    s_eff = jnp.where(keep, fs, -jnp.inf)
    if n < max_kpts:  # tiny inputs: pad the candidate set to k
        padlen = max_kpts - n
        s_eff = jnp.concatenate([s_eff, jnp.full((padlen,), -jnp.inf)])
        fk = jnp.concatenate([fk, jnp.zeros((padlen, 2), fk.dtype)])
        fd = jnp.concatenate([fd, jnp.zeros((padlen, D), fd.dtype)])
        ftile = jnp.concatenate([ftile, jnp.zeros((padlen,), ftile.dtype)])
    vals, top = topk_flat(s_eff, max_kpts)
    out_mask = vals > -jnp.inf
    fl = out_mask.astype(fk.dtype)[:, None]
    return {
        "keypoints": fk[top] * fl,
        "scores": jnp.where(out_mask, vals, 0.0),
        "descriptors": fd[top] * fl.astype(fd.dtype),
        "mask": out_mask,
        "tile_idx": jnp.where(out_mask, ftile[top], -1.0),
    }
