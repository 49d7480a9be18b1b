"""64-bit DCT perceptual hash (public pHash design), pure numpy.

gray -> area-mean resize to 32x32 -> 2D DCT-II -> top-left 8x8 low
frequencies (DC excluded, replaced by coefficient (1,1) row-major
skip) -> median threshold -> 64 bits packed MSB-first row-major.

Deterministic; used as the exact-dedup key (``phash`` column,
BASELINE.json:15) and for near-dup hamming banding (SURVEY.md D3).
"""

from __future__ import annotations

import numpy as np

from engine.codec.image import _dct_matrix

_DCT32 = _dct_matrix(32)
_N = 32


def _resize_area(gray: np.ndarray, out: int = _N) -> np.ndarray:
    """Area-mean resample of (h, w) float to (out, out) — deterministic."""
    h, w = gray.shape
    ys = (np.arange(out + 1) * h) // out
    xs = (np.arange(out + 1) * w) // out
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    tot = (
        csum[ys[1:, None], xs[None, 1:]]
        - csum[ys[:-1, None], xs[None, 1:]]
        - csum[ys[1:, None], xs[None, :-1]]
        + csum[ys[:-1, None], xs[None, :-1]]
    )
    return tot / np.maximum(area, 1)


def _resize_area_batch(stack: np.ndarray, out: int = _N) -> np.ndarray:
    """Area-mean resample of (N, h, w[, c]) float to (N, out, out[, c]).

    Identical per-slice arithmetic to ``_resize_area`` (cumsum along h
    then w acts independently per (image, channel) slice), so results
    are bit-equal to the per-image path — required for tile pixel
    parity — while amortizing allocation overhead across the batch."""
    squeeze = stack.ndim == 3
    if squeeze:
        stack = stack[..., None]
    n, h, w, c = stack.shape
    if h % out == 0 and w % out == 0:
        # exact block mean: integer sum then one divide — bit-identical
        # to the cumsum path (both form the exact sum of integer-valued
        # pixels, then divide by area) at ~10x less memory traffic
        bh, bw = h // out, w // out
        tot = (
            stack.reshape(n, out, bh, out, bw, c)
            .sum(axis=(2, 4), dtype=np.float64)
        )
        res = tot / float(bh * bw)
        return res[..., 0] if squeeze else res
    ys = (np.arange(out + 1) * h) // out
    xs = (np.arange(out + 1) * w) // out
    if stack.dtype != np.float64:
        stack = stack.astype(np.float64)
    csum = np.zeros((n, h + 1, w + 1, c))
    csum[:, 1:, 1:, :] = np.cumsum(np.cumsum(stack, axis=1), axis=2)
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    tot = (
        csum[:, ys[1:, None], xs[None, 1:], :]
        - csum[:, ys[:-1, None], xs[None, 1:], :]
        - csum[:, ys[1:, None], xs[None, :-1], :]
        + csum[:, ys[:-1, None], xs[None, :-1], :]
    )
    res = tot / np.maximum(area, 1)[None, :, :, None]
    return res[..., 0] if squeeze else res


def phash64(pixels: np.ndarray) -> int:
    """(h, w, c) or (h, w) uint8 -> 64-bit perceptual hash (signed int64)."""
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.mean(axis=2) if px.ndim == 3 else px
    small = _resize_area(gray, _N)
    coef = _DCT32 @ small @ _DCT32.T
    block = coef[:8, :8].copy().ravel()
    vals = block[1:]  # drop DC
    med = np.median(vals)
    bits = vals > med
    h = np.uint64(0)
    for b in bits:  # 63 bits; bit 63 left zero-extended sign-safe
        h = (h << np.uint64(1)) | np.uint64(bool(b))
    return int(np.int64(h.astype(np.int64)))


def phash64_batch(pixel_list) -> np.ndarray:
    return np.array([phash64(p) for p in pixel_list], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Bitwise hamming distance between int64 hash arrays (vectorized)."""
    x = (np.asarray(a, dtype=np.int64).view(np.uint64)) ^ (
        np.asarray(b, dtype=np.int64).view(np.uint64)
    )
    # popcount via bit tricks (numpy 1.26 has no bit_count ufunc)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
