"""S2-like hierarchical quadtree index — pure numpy, from scratch.

Reproduces the public S2 geometry cell-id design (s2geometry.io docs):
the sphere is projected onto 6 cube faces; each face carries a Hilbert
space-filling curve; a cell id packs ``face (3 bits) | Hilbert position
(2 bits per level) | 1 marker bit | zeros``. Parent/child containment is
an exact bit-prefix relation (unlike hex grids), which makes these ids
the engine's range-partitionable shuffle keys (``manifest.cell_range``,
SURVEY.md §4.3).

Documented deviation from real S2: the face (u,v) -> (s,t) transform is
linear rather than S2's quadratic projection (cells near face edges are
therefore somewhat larger than near centers). Ids are NOT Google-S2 ids;
all parity checks are self-consistent (SURVEY.md §7.4).

Exact guarantees:
- ``encode(p, level)`` for level in [0, 30]; leaf = level 30
- ``parent(id)`` / ``contains(a, b)`` via lsb arithmetic, exact
- ``range_min/range_max`` give the contiguous leaf-id interval of a cell
- ``covering(lon_ring, lat_ring, ...)`` returns a conservative
  hierarchical cell cover of a polygon's bbox (used to prune joins).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_FACE_SHIFT = np.uint64(61)


# ---------------------------------------------------------------- projection

def _lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    """Unit vectors -> (face 0..5, u, v) with u, v in [-1, 1]."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    major = np.choose(face, [x, y, z, x, y, z])
    a = np.choose(face, [y, z, x, y, z, x])
    b = np.choose(face, [z, x, y, z, x, y])
    return face, a / np.abs(major), b / np.abs(major)


def _face_uv_to_xyz(face, u, v):
    m = np.where(face < 3, 1.0, -1.0)
    x = np.choose(face % 3, [m, v, u])
    y = np.choose(face % 3, [u, m, v])
    z = np.choose(face % 3, [v, u, m])
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


# ------------------------------------------------------------- hilbert curve

def _hilbert_xy2d(level: int, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """(i, j) in [0, 2^level) -> Hilbert distance, vectorized over arrays."""
    x = np.asarray(i, dtype=np.uint64).copy()
    y = np.asarray(j, dtype=np.uint64).copy()
    d = np.zeros_like(x)
    s = np.uint64(1) << np.uint64(level - 1) if level > 0 else np.uint64(0)
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == one)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= one
    return d


def _hilbert_d2xy(level: int, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Hilbert distance -> (i, j), vectorized inverse of ``_hilbert_xy2d``."""
    t = np.asarray(d, dtype=np.uint64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    one = np.uint64(1)
    s = np.uint64(1)
    top = np.uint64(1) << np.uint64(level)
    while s < top:
        rx = one & (t // np.uint64(2))
        ry = one & (t ^ rx)
        swap = ry == 0
        flip = swap & (rx == one)
        x_f = np.where(flip, s - one - x, x)
        y_f = np.where(flip, s - one - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= np.uint64(4)
        s <<= one
    return x, y


# ----------------------------------------------------------------- cell ids

def encode(lon: np.ndarray, lat: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """Point(s) -> uint64 S2-like cell id(s) at ``level``."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    face, u, v = _xyz_to_face_uv(*_lonlat_to_xyz(lon, lat))
    n = np.uint64(1) << np.uint64(MAX_LEVEL)
    i = np.minimum(((u + 1.0) / 2.0 * float(n)).astype(np.uint64), n - np.uint64(1))
    j = np.minimum(((v + 1.0) / 2.0 * float(n)).astype(np.uint64), n - np.uint64(1))
    pos = _hilbert_xy2d(MAX_LEVEL, i, j)
    leaf = (face.astype(np.uint64) << _FACE_SHIFT) | (pos << np.uint64(1)) | np.uint64(1)
    if level == MAX_LEVEL:
        return leaf
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (leaf & ~(lsb - np.uint64(1)) & ~lsb) | lsb


def cell_level(cells: np.ndarray) -> np.ndarray:
    c = np.asarray(cells, dtype=np.uint64)
    lsb = c & (~c + np.uint64(1))
    # lsb == 2^(2*(30-level))
    lev = MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2).astype(np.int64)
    return lev


def cell_lsb(cells: np.ndarray) -> np.ndarray:
    c = np.asarray(cells, dtype=np.uint64)
    return c & (~c + np.uint64(1))


def parent(cells: np.ndarray, steps: int = 1) -> np.ndarray:
    """Parent ``steps`` levels up — exact bit-prefix operation."""
    c = np.asarray(cells, dtype=np.uint64)
    lsb = cell_lsb(c) << np.uint64(2 * steps)
    return (c & ~(lsb - np.uint64(1)) & ~lsb) | lsb


def range_min(cells: np.ndarray) -> np.ndarray:
    c = np.asarray(cells, dtype=np.uint64)
    return c - (cell_lsb(c) - np.uint64(1))


def range_max(cells: np.ndarray) -> np.ndarray:
    c = np.asarray(cells, dtype=np.uint64)
    return c + (cell_lsb(c) - np.uint64(1))


def contains(parents: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """True where each ``cells[i]`` lies inside ``parents[i]`` (vectorized)."""
    return (range_min(parents) <= np.asarray(cells, dtype=np.uint64)) & (
        np.asarray(cells, dtype=np.uint64) <= range_max(parents)
    )


def cell_center(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell id(s) -> (lon, lat) of the cell center."""
    c = np.asarray(cells, dtype=np.uint64)
    face = (c >> _FACE_SHIFT).astype(np.int64)
    pos = (c & ((np.uint64(1) << _FACE_SHIFT) - np.uint64(1))) >> np.uint64(1)
    # Replace the marker bit with the center of the cell's leaf range.
    lsb = cell_lsb(c)
    pos_center = pos  # marker bit already sits at the range midpoint
    i, j = _hilbert_d2xy(MAX_LEVEL, pos_center)
    n = float(np.uint64(1) << np.uint64(MAX_LEVEL))
    half = (lsb >> np.uint64(1)).astype(np.float64) ** 0  # leaf: offset 0.5 cell
    u = (i.astype(np.float64) + 0.5 * half) / n * 2.0 - 1.0
    v = (j.astype(np.float64) + 0.5 * half) / n * 2.0 - 1.0
    x, y, z = _face_uv_to_xyz(face, u, v)
    return np.rad2deg(np.arctan2(y, x)), np.rad2deg(np.arcsin(np.clip(z, -1, 1)))


def cell_bounds_lonlat(cells: np.ndarray) -> np.ndarray:
    """(n, 4) conservative lon/lat bbox [minlon, minlat, maxlon, maxlat]
    of each cell, from its 4 corners + center (linear projection)."""
    c = np.asarray(cells, dtype=np.uint64)
    face = (c >> _FACE_SHIFT).astype(np.int64)
    pos = (c & ((np.uint64(1) << _FACE_SHIFT) - np.uint64(1))) >> np.uint64(1)
    lev = cell_level(c)
    size_ij = np.uint64(1) << (np.uint64(MAX_LEVEL) - lev.astype(np.uint64))
    pos_min = (range_min(c) & ((np.uint64(1) << _FACE_SHIFT) - np.uint64(1))) >> np.uint64(1)
    i0, j0 = _hilbert_d2xy(MAX_LEVEL, pos_min)
    # corner-aligned: snap to cell origin
    i0 = (i0 // size_ij) * size_ij
    j0 = (j0 // size_ij) * size_ij
    n = float(np.uint64(1) << np.uint64(MAX_LEVEL))
    lons, lats = [], []
    # 3x3 sample grid: lat/lon extremes of a cell can sit mid-edge (e.g.
    # the equatorial faces reach |lat| 45° at edge midpoints, not corners).
    for di in (0.0, 0.5, 1.0):
        for dj in (0.0, 0.5, 1.0):
            u = (i0.astype(np.float64) + di * size_ij.astype(np.float64)) / n * 2 - 1
            v = (j0.astype(np.float64) + dj * size_ij.astype(np.float64)) / n * 2 - 1
            x, y, z = _face_uv_to_xyz(face, np.clip(u, -1, 1), np.clip(v, -1, 1))
            lons.append(np.rad2deg(np.arctan2(y, x)))
            lats.append(np.rad2deg(np.arcsin(np.clip(z, -1, 1))))
    lons = np.stack(lons)
    lats = np.stack(lats)
    # Conservative pad for residual curvature between sample points.
    pad_lat = 0.25 * (lats.max(axis=0) - lats.min(axis=0)) + 1e-9
    pad_lon = 0.25 * (lons.max(axis=0) - lons.min(axis=0)) + 1e-9
    return np.stack(
        [
            lons.min(axis=0) - pad_lon,
            lats.min(axis=0) - pad_lat,
            lons.max(axis=0) + pad_lon,
            lats.max(axis=0) + pad_lat,
        ],
        axis=1,
    )


def covering(
    ring_lon: np.ndarray,
    ring_lat: np.ndarray,
    max_level: int = 10,
    max_cells: int = 64,
) -> np.ndarray:
    """Conservative hierarchical cell cover of a polygon ring's bbox.

    Breadth-first subdivision from the 6 face cells: a cell is kept when
    its lon/lat bbox intersects the ring bbox; kept cells are subdivided
    until ``max_level`` or the ``max_cells`` budget is reached. Used to
    prune the point-in-polygon join (over-coverage is safe).
    """
    minlon, maxlon = float(np.min(ring_lon)), float(np.max(ring_lon))
    minlat, maxlat = float(np.min(ring_lat)), float(np.max(ring_lat))
    # 6 face cells = parents of face-center leaves, lifted to level 0
    fc_lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    fc_lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    frontier = encode(fc_lon, fc_lat, 0)
    out: list[np.ndarray] = []
    while len(frontier):
        b = cell_bounds_lonlat(frontier)
        hit = (
            (b[:, 0] <= maxlon)
            & (b[:, 2] >= minlon)
            & (b[:, 1] <= maxlat)
            & (b[:, 3] >= minlat)
        )
        frontier = frontier[hit]
        if not len(frontier):
            break
        lev = cell_level(frontier)
        done = lev >= max_level
        if np.all(done) or (len(out) and sum(map(len, out)) + len(frontier) >= max_cells):
            out.append(frontier)
            break
        out.append(frontier[done])
        frontier = children(frontier[~done])
    return np.concatenate(out) if out else np.empty(0, dtype=np.uint64)


def children(cells: np.ndarray) -> np.ndarray:
    """All 4 children of each cell (exact bit operation), concatenated."""
    c = np.asarray(cells, dtype=np.uint64)
    lsb = cell_lsb(c)
    child_lsb = lsb >> np.uint64(2)
    if np.any(child_lsb == 0):
        raise ValueError("cell already at max level")
    base = c - lsb  # clear marker
    offs = np.arange(4, dtype=np.uint64)
    kids = (base[:, None] + (np.uint64(2) * offs[None, :] + np.uint64(1)) * child_lsb[:, None])
    return kids.reshape(-1)
