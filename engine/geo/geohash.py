"""Standard geohash base-32 encoding (Niemeyer's public spec).

Geohash interleaves quantized longitude/latitude bits (lon first) and
maps each 5-bit group onto the ``0123456789bcdefghjkmnpqrstuvwxyz``
alphabet. The prefix property makes it a groupby-able spatial key with
the same hierarchy trick as the H3/S2 columns: ``substr(geohash, 1, k)``
IS the precision-k cell, so per-cell rollups at any coarser precision
are a string-prefix groupby away — no re-encode pass.

Encoding is fully vectorized: quantization is two float ops + floor per
point, the 5*precision interleave steps are constant-count numpy shifts
over the whole column (no per-row Python), and the final char gather is
one take + a zero-copy ``S{p}`` view. The quantization expression
``floor((lon + 180) / 360 * 2^nlon)`` is kept in exactly this
operation order so the DuckDB oracle twin can reproduce it bit-for-bit.
"""

from __future__ import annotations

import numpy as np

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_ALPHA = np.frombuffer(ALPHABET.encode(), dtype=np.uint8)


def encode_int(
    lon: np.ndarray, lat: np.ndarray, precision: int
) -> np.ndarray:
    """Packed ``5*precision``-bit geohash integer (MSB-first bit order,
    lon bit first), before base-32 chunking. precision <= 12 fits
    uint64."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    x = np.floor(
        (np.asarray(lon, np.float64) + 180.0) / 360.0 * float(1 << nlon)
    )
    y = np.floor(
        (np.asarray(lat, np.float64) + 90.0) / 180.0 * float(1 << nlat)
    )
    x = np.clip(x, 0, (1 << nlon) - 1).astype(np.uint64)
    y = np.clip(y, 0, (1 << nlat) - 1).astype(np.uint64)
    val = np.zeros(x.shape, np.uint64)
    for t in range(nbits):
        if t % 2 == 0:
            bit = (x >> np.uint64(nlon - 1 - t // 2)) & np.uint64(1)
        else:
            bit = (y >> np.uint64(nlat - 1 - t // 2)) & np.uint64(1)
        val = (val << np.uint64(1)) | bit
    return val


def encode(
    lon: np.ndarray, lat: np.ndarray, precision: int = 6
) -> np.ndarray:
    """Base-32 geohash strings, vectorized (object array of str)."""
    val = encode_int(lon, lat, precision)
    chars = np.empty((len(val), precision), np.uint8)
    for c in range(precision):
        ix = (val >> np.uint64(5 * (precision - 1 - c))) & np.uint64(31)
        chars[:, c] = _ALPHA[ix.astype(np.int64)]
    return chars.reshape(-1).view(f"S{precision}").astype(str)


def decode_bbox(gh: str) -> tuple[float, float, float, float]:
    """(lon_min, lon_max, lat_min, lat_max) of a geohash cell —
    reference-path interval halving, used by the containment pytest."""
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    even = True
    for ch in gh:
        v = ALPHABET.index(ch)
        for k in range(4, -1, -1):
            bit = (v >> k) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lon_lo, lon_hi, lat_lo, lat_hi
