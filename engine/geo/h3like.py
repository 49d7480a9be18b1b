"""H3-like hierarchical hexagonal index — pure numpy, from scratch.

Semantics reproduced from the public H3 design (Uber's H3 docs): a
multi-resolution hexagonal grid with uint64 cell ids, ``cell(point, res)``
encoding, cell centers/boundaries, k-rings (ring k has exactly ``6*k``
cells), grid distance, and parent/child traversal across resolutions.

Faithfulness note (SURVEY.md §7.4): true H3 is an aperture-7 hex grid on
an icosahedron. This engine implements a documented *aperture-4* variant
on an equirectangular projection — a pointy-top axial hex lattice in
(lon, lat) degree space whose circumradius halves each resolution, so
the res-(r+1) lattice is a strict superlattice of the res-r lattice and
every cell center is exactly representable at all finer resolutions.
Cell ids are NOT Uber-H3 ids; all parity checks in this repo are
self-consistent (the oracle uses this same index), which is what
BASELINE.json:2 requires. Hex-grid guarantees that DO hold exactly:

- ``cell(center(c), res(c)) == c`` (centers are lattice points)
- ``ring(c, k)`` has exactly ``6*k`` cells; neighbor symmetry
- ``grid_distance`` is the axial hex metric
- ``parent(c) == cell(center(c), res-1)``; for an arbitrary point p,
  ``grid_distance(cell(p, r-1), parent(cell(p, r))) <= 1`` (same
  approximate-containment caveat as real H3 aperture-7 children).

Resolutions 0..15 supported; the engine uses 5..12 (BASELINE.json:6).

Id layout (uint64):  [63:60]=0 | [59:56] res | [55:28] q+2^27 | [27:0] r+2^27
where (q, r) are axial coordinates at that resolution.
"""

from __future__ import annotations

import numpy as np

# Circumradius (degrees) of a res-0 hexagon. Halves each resolution:
# res 5 ≈ 0.5°, res 12 ≈ 0.0039° (~430 m at the equator).
BASE_SIZE = 16.0
MAX_RES = 15
_OFF = 1 << 27  # axial-coordinate offset so q, r pack as unsigned 28-bit
_SQRT3 = np.sqrt(3.0)

# Axial neighbor directions, pointy-top orientation (E, NE, NW, W, SW, SE).
DIRECTIONS = np.array(
    [[1, 0], [1, -1], [0, -1], [-1, 0], [-1, 1], [0, 1]], dtype=np.int64
)


def res_size(res: int) -> float:
    """Hex circumradius (degrees) at resolution ``res``."""
    return BASE_SIZE / (1 << res)


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Round fractional axial coords to the nearest hex center (vectorized)."""
    sf = -qf - rf
    q = np.rint(qf)
    r = np.rint(rf)
    s = np.rint(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (
        (np.uint64(res) << np.uint64(56))
        | (np.asarray(q + _OFF, dtype=np.uint64) << np.uint64(28))
        | np.asarray(r + _OFF, dtype=np.uint64)
    )


def cell_res(cells: np.ndarray) -> np.ndarray:
    """Resolution encoded in each cell id."""
    return ((np.asarray(cells, dtype=np.uint64) >> np.uint64(56)) & np.uint64(0xF)).astype(
        np.int64
    )


def _unpack(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    c = np.asarray(cells, dtype=np.uint64)
    res = ((c >> np.uint64(56)) & np.uint64(0xF)).astype(np.int64)
    q = ((c >> np.uint64(28)) & np.uint64(0xFFFFFFF)).astype(np.int64) - _OFF
    r = (c & np.uint64(0xFFFFFFF)).astype(np.int64) - _OFF
    return res, q, r


def encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Point(s) -> uint64 cell id(s) at ``res``. Vectorized; no loops."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    size = res_size(res)
    qf = (x / _SQRT3 - y / 3.0) / size
    rf = (2.0 / 3.0 * y) / size
    q, r = _cube_round(qf, rf)
    return _pack(res, q, r)


def encode_multi(lon: np.ndarray, lat: np.ndarray, resolutions) -> np.ndarray:
    """Point(s) -> (n, len(resolutions)) uint64 matrix, one column per res."""
    cols = [encode(lon, lat, res) for res in resolutions]
    return np.stack(cols, axis=1)


def cell_center(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell id(s) -> (lon, lat) of the hex center."""
    res, q, r = _unpack(cells)
    size = BASE_SIZE / np.exp2(res)
    x = size * _SQRT3 * (q + r / 2.0)
    y = size * 1.5 * r
    return x, y


def cell_boundary(cell: int) -> np.ndarray:
    """One cell id -> (6, 2) array of (lon, lat) vertices, CCW."""
    res, q, r = _unpack(np.asarray([cell], dtype=np.uint64))
    size = res_size(int(res[0]))
    cx = size * _SQRT3 * (q[0] + r[0] / 2.0)
    cy = size * 1.5 * r[0]
    ang = np.pi / 180.0 * (60.0 * np.arange(6) + 30.0)  # pointy-top
    return np.stack([cx + size * np.cos(ang), cy + size * np.sin(ang)], axis=1)


def ring(cell: int, k: int) -> np.ndarray:
    """All cells at exact grid distance ``k`` from ``cell`` (6k cells, k>=1)."""
    res, q0, r0 = _unpack(np.asarray([cell], dtype=np.uint64))
    if k == 0:
        return np.asarray([cell], dtype=np.uint64)
    # Start k steps in direction 4 (SW), then walk 6 sides of k steps each.
    steps = np.concatenate([np.full(k, d) for d in range(6)])
    moves = DIRECTIONS[steps]  # (6k, 2)
    start = np.array([q0[0], r0[0]]) + k * DIRECTIONS[4]
    coords = start + np.concatenate([[(0, 0)], np.cumsum(moves, axis=0)[:-1]])
    return _pack(int(res[0]), coords[:, 0], coords[:, 1])


def disk(cell: int, k: int) -> np.ndarray:
    """All cells at grid distance <= k (the filled k-disk, 1+3k(k+1) cells)."""
    return np.concatenate([ring(cell, i) for i in range(k + 1)])


def grid_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hex grid distance between same-resolution cells (vectorized)."""
    res_a, qa, ra = _unpack(a)
    res_b, qb, rb = _unpack(b)
    if not np.array_equal(res_a, res_b):
        raise ValueError("grid_distance requires same-resolution cells")
    dq = qa - qb
    dr = ra - rb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def parent(cells: np.ndarray, parent_res: int | None = None) -> np.ndarray:
    """Parent cell(s): the cell at the coarser res containing each center."""
    res, _, _ = _unpack(cells)
    target = res - 1 if parent_res is None else np.full_like(res, parent_res)
    if np.any(target < 0) or np.any(target >= res):
        raise ValueError("parent_res must be in [0, res)")
    lon, lat = cell_center(cells)
    if parent_res is not None:
        return encode(lon, lat, parent_res)
    out = np.empty(len(np.atleast_1d(res)), dtype=np.uint64)
    for rr in np.unique(res):
        m = res == rr
        out[m] = encode(lon[m], lat[m], int(rr) - 1)
    return out


def children(cell: int) -> np.ndarray:
    """Cells at res+1 whose center maps back to this cell via ``encode``.

    Aperture-4 note: the child lattice is the parent lattice plus the
    parent-edge midpoints, so midpoint children tie between two parents
    and are assigned by the deterministic ``_cube_round``. Counts vary
    (average 4); the exact invariants are (a) ``parent(children(c)) ==
    c`` and (b) children sets of distinct parents are disjoint and tile
    the child lattice.
    """
    res, _, _ = _unpack(np.asarray([cell], dtype=np.uint64))
    child_res = int(res[0]) + 1
    if child_res > MAX_RES:
        raise ValueError("cell already at max resolution")
    clon, clat = cell_center(np.asarray([cell], dtype=np.uint64))
    center_child = encode(clon, clat, child_res)[0]
    cand = disk(int(center_child), 2)
    lon, lat = cell_center(cand)
    back = encode(lon, lat, int(res[0]))
    return cand[back == np.uint64(cell)]
