"""Polygon clipping for vector-tile materialization.

The reference ships per-area slippy-map overlays (boundary polygons
drawn per z/x/y tile page); the engine's vector half of raster<->vector
tiling is this module: clip every admin polygon ring to each tile's
axis-aligned rect in Web-Mercator unit space (Sutherland-Hodgman, one
vectorized numpy pass per clip edge — no Python loop over vertices).

Correctness is self-oracled by an exact conservation law: clipping
against a full tile grid PARTITIONS the polygon, so the shoelace areas
of the per-tile pieces must sum to the polygon's area bit-near-exactly
(tests/test_geo_kernels.py). Convex clip region => Sutherland-Hodgman
is exact for any simple input ring (holes are clipped separately and
their area subtracted — same law applies).
"""

from __future__ import annotations

import numpy as np


def shoelace_area(x: np.ndarray, y: np.ndarray) -> float:
    """Signed planar area of a ring (positive = counter-clockwise in a
    y-up frame). Works in whatever planar space the ring lives in;
    callers compare areas only within one space."""
    if len(x) < 3:
        return 0.0
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _clip_halfplane(
    x: np.ndarray, y: np.ndarray, axis: int, bound: float, keep_less: bool
) -> tuple[np.ndarray, np.ndarray]:
    """One Sutherland-Hodgman pass against an axis-aligned half-plane
    (axis 0: x, axis 1: y; keep coord <= bound when ``keep_less``).

    Vectorized: classify every edge, count emitted points per edge
    (in->in 1, in->out 1, out->in 2, out->out 0), place them by cumsum
    offsets. Emission order per edge follows the classic algorithm so
    ring orientation survives every pass."""
    n = len(x)
    if n == 0:
        return x, y
    v = x if axis == 0 else y
    inside = (v <= bound) if keep_less else (v >= bound)
    if inside.all():
        return x, y
    if not inside.any():
        return x[:0], y[:0]

    nxt = np.arange(1, n + 1)
    nxt[-1] = 0
    in0, in1 = inside, inside[nxt]
    cross = in0 != in1
    # intersection of crossing edges with the clip line (safe: v1 != v0)
    x0, y0, x1, y1 = x, y, x[nxt], y[nxt]
    v0 = v
    v1 = v[nxt]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(cross, (bound - v0) / np.where(cross, v1 - v0, 1.0), 0.0)
    ix = x0 + t * (x1 - x0)
    iy = y0 + t * (y1 - y0)
    if axis == 0:
        ix = np.where(cross, bound, ix)
    else:
        iy = np.where(cross, bound, iy)

    counts = np.where(
        in0 & in1, 1, np.where(in0 & ~in1, 1, np.where(~in0 & in1, 2, 0))
    )
    offs = np.concatenate(([0], np.cumsum(counts)))
    total = offs[-1]
    ox = np.empty(total, dtype=np.float64)
    oy = np.empty(total, dtype=np.float64)
    # in->in: emit next vertex
    m = in0 & in1
    ox[offs[:-1][m]] = x1[m]
    oy[offs[:-1][m]] = y1[m]
    # in->out: emit intersection
    m = in0 & ~in1
    ox[offs[:-1][m]] = ix[m]
    oy[offs[:-1][m]] = iy[m]
    # out->in: emit intersection, then next vertex
    m = ~in0 & in1
    ox[offs[:-1][m]] = ix[m]
    oy[offs[:-1][m]] = iy[m]
    ox[offs[:-1][m] + 1] = x1[m]
    oy[offs[:-1][m] + 1] = y1[m]
    return ox, oy


def clip_ring_rect(
    x: np.ndarray,
    y: np.ndarray,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Clip a simple ring to an axis-aligned rect (four half-plane
    passes). Returns empty arrays when nothing survives. Exact for any
    simple input because the clip region is convex."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    for axis, bound, keep_less in (
        (0, xmin, False),
        (0, xmax, True),
        (1, ymin, False),
        (1, ymax, True),
    ):
        x, y = _clip_halfplane(x, y, axis, bound, keep_less)
        if len(x) == 0:
            break
    return x, y


def lonlat_to_mercator_unit(
    lon: np.ndarray, lat: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """Web-Mercator 'tile unit' coords at a zoom: tile (tx,ty) spans
    [tx,tx+1) x [ty,ty+1) (same formula as pipeline/tile.lonlat_to_tile
    without the floor, so clip space and raster tiles line up)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.0511, 85.0511)
    n = float(1 << zoom)
    xf = (lon + 180.0) / 360.0 * n
    yf = (1.0 - np.arcsinh(np.tan(np.deg2rad(lat))) / np.pi) / 2.0 * n
    return xf, yf


def simplify_ring(
    x: np.ndarray, y: np.ndarray, epsilon: float
) -> tuple[np.ndarray, np.ndarray]:
    """Douglas-Peucker ring simplification (iterative stack, numpy
    segment-distance per span) — the per-zoom detail reduction step of
    vector tile generation. Keeps the first vertex as the anchor, treats
    the ring as the closed polyline v0..vn-1,v0, and guarantees every
    dropped vertex lies within ``epsilon`` of the kept polyline.
    epsilon=0 keeps every vertex. Deterministic: farthest-point ties
    break to the lowest index (numpy argmax)."""
    n = len(x)
    if n <= 3 or epsilon <= 0.0:
        return np.asarray(x, float), np.asarray(y, float)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # closed: wrap the anchor at the end
    cx = np.concatenate([x, x[:1]])
    cy = np.concatenate([y, y[:1]])
    keep = np.zeros(n + 1, dtype=bool)
    keep[0] = keep[n] = True
    # split first at the point farthest from the anchor so the two
    # initial chords are non-degenerate
    far = int(np.argmax((cx - cx[0]) ** 2 + (cy - cy[0]) ** 2))
    if far in (0, n):
        return x, y
    keep[far] = True
    stack = [(0, far), (far, n)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        sx, sy = cx[i], cy[i]
        ex, ey = cx[j], cy[j]
        px = cx[i + 1 : j]
        py = cy[i + 1 : j]
        dx, dy = ex - sx, ey - sy
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d2 = (px - sx) ** 2 + (py - sy) ** 2
        else:
            # distance to the chord SEGMENT (projection clamped to
            # [0,1]) — the textbook infinite-line variant silently
            # breaks the documented "within epsilon of the kept
            # polyline" guarantee when a vertex projects beyond an
            # anchor (concave spans near the anchor do exactly that)
            t = np.clip(((px - sx) * dx + (py - sy) * dy) / seg2, 0.0, 1.0)
            d2 = (px - (sx + t * dx)) ** 2 + (py - (sy + t * dy)) ** 2
        k = int(np.argmax(d2))
        if d2[k] > epsilon * epsilon:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    kept = np.flatnonzero(keep[:n])
    return x[kept], y[kept]
