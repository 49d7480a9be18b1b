"""kNN via H3-like cell-ring expansion + exact haversine re-rank.

Reproduces the reference's "nearest article/object" suggestion lookup
(SURVEY.md §2.4 J4) as a batch kernel. The candidate side is indexed
once per actor (``CellIndex``: cell id at a fixed resolution -> row
indices); queries expand k-rings (k = 0, 1, 2, ...) around their own
cell until at least K candidates are gathered *and* one extra safety
ring has been scanned (a ring-k hit can be farther than a ring-(k+1)
hit near cell corners), then exact haversine distances pick the top K.

Everything is deterministic: ties in distance break by ascending
candidate row order.
"""

from __future__ import annotations

import numpy as np

from engine.geo import h3like

EARTH_RADIUS_M = 6_371_008.8


def haversine_m(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in meters, vectorized (broadcasting ok)."""
    p1 = np.deg2rad(np.asarray(lat1, dtype=np.float64))
    p2 = np.deg2rad(np.asarray(lat2, dtype=np.float64))
    dp = p2 - p1
    dl = np.deg2rad(np.asarray(lon2, dtype=np.float64) - np.asarray(lon1, dtype=np.float64))
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def pick_res(lon: np.ndarray, lat: np.ndarray, k_hint: int = 8) -> int:
    """Index resolution matched to candidate density.

    Ring expansion cost is dominated by walking empty cells, so the cell
    size should be about the mean candidate spacing scaled by sqrt(k):
    then ring 1-2 gathers ~k candidates for typical queries. A fixed
    fine resolution over a sparse candidate set makes every query walk
    dozens of empty rings (measured 100x slowdown)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = max(len(lon), 1)
    area = max(float(np.ptp(lon)) * float(np.ptp(lat)), 1e-12)
    spacing = np.sqrt(area / n)
    target = max(spacing * np.sqrt(max(k_hint, 1)) / 1.5, 1e-9)
    sizes = [(r, h3like.res_size(r)) for r in range(0, 16)]
    return min(sizes, key=lambda rs: abs(np.log(rs[1] / target)))[0]


class CellIndex:
    """cell(res) -> candidate row indices; built once per kNN actor.

    ``res=None`` auto-selects via ``pick_res`` (recommended)."""

    def __init__(self, lon: np.ndarray, lat: np.ndarray, res: int | None = None,
                 k_hint: int = 8):
        if res is None:
            res = pick_res(lon, lat, k_hint)
        self.res = res
        self.lon = np.asarray(lon, dtype=np.float64)
        self.lat = np.asarray(lat, dtype=np.float64)
        cells = h3like.encode(self.lon, self.lat, res)
        order = np.argsort(cells, kind="stable")
        self.sorted_cells = cells[order]
        self.sorted_rows = order.astype(np.int64)
        self.xyz = lonlat_to_xyz(self.lon, self.lat)  # chord-topk prefilter

    def rows_in_cells(self, cells: np.ndarray) -> np.ndarray:
        """Candidate row indices for a set of cell ids (sorted, unique rows)."""
        lo = np.searchsorted(self.sorted_cells, cells, side="left")
        hi = np.searchsorted(self.sorted_cells, cells, side="right")
        if np.all(lo == hi):
            return np.empty(0, dtype=np.int64)
        parts = [self.sorted_rows[a:b] for a, b in zip(lo, hi) if b > a]
        return np.unique(np.concatenate(parts))


def knn_ring_expand(
    index: CellIndex,
    q_lon: np.ndarray,
    q_lat: np.ndarray,
    k: int,
    max_ring: int = 64,
    exclude_self_rows: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k candidate rows per query point.

    Returns (neighbor_rows, dist_m), each (n_queries, k); missing
    neighbors (fewer than k candidates within ``max_ring``) are -1 /
    inf. Queries sharing a cell share the expansion work: the loop is
    over *unique query cells*, not queries.
    """
    q_lon = np.asarray(q_lon, dtype=np.float64)
    q_lat = np.asarray(q_lat, dtype=np.float64)
    q_cells = h3like.encode(q_lon, q_lat, index.res)
    nn = np.full((len(q_lon), k), -1, dtype=np.int64)
    nd = np.full((len(q_lon), k), np.inf)
    size = h3like.res_size(index.res)  # hex circumradius, degrees
    for cell in np.unique(q_cells):
        q_mask = q_cells == cell
        q_rows = np.flatnonzero(q_mask)
        # Phase 1: expand rings until >= k candidates (or max_ring).
        cand = np.empty(0, dtype=np.int64)
        ring_k = 0
        while ring_k <= max_ring:
            new = index.rows_in_cells(h3like.ring(int(cell), ring_k))
            if len(new):
                cand = np.union1d(cand, new)
            n_eff = len(cand) - (1 if exclude_self_rows is not None else 0)
            if n_eff >= k:
                break
            ring_k += 1
        if len(cand) == 0:
            continue
        # Phase 2: the k-th best at this point may still be beaten by a
        # farther ring — degree-space rings are anisotropic in meters
        # (1° lon = 111 km * cos(lat)). Lower bound for any point in a
        # cell at grid distance g: (1.5*g - 2) * size degrees, converted
        # at the most-compressed scale. Expand until that bound exceeds
        # the provisional worst k-th distance. (Bound degrades within
        # ~5° of the poles; documented limitation.)
        d_prov = haversine_m(
            q_lon[q_rows][:, None], q_lat[q_rows][:, None],
            index.lon[cand][None, :], index.lat[cand][None, :],
        )
        if exclude_self_rows is not None:
            d_prov[cand[None, :] == exclude_self_rows[q_rows][:, None]] = np.inf
        kk0 = min(k, d_prov.shape[1])
        kth = np.sort(d_prov, axis=1)[:, kk0 - 1]
        worst_m = float(np.max(kth[np.isfinite(kth)], initial=0.0))
        lat_here = float(np.max(np.abs(q_lat[q_rows])))
        while ring_k < max_ring:
            g_next = ring_k + 1
            reach_deg = lat_here + (g_next + 1) * 2.0 * size
            cos_min = np.cos(np.deg2rad(min(85.0, reach_deg)))
            lb_m = max(0.0, 1.5 * g_next - 2.0) * size * 110_000.0 * cos_min
            if lb_m > worst_m:
                break
            new = index.rows_in_cells(h3like.ring(int(cell), g_next))
            if len(new):
                cand = np.union1d(cand, new)
            ring_k = g_next
        d = haversine_m(
            q_lon[q_rows][:, None],
            q_lat[q_rows][:, None],
            index.lon[cand][None, :],
            index.lat[cand][None, :],
        )
        if exclude_self_rows is not None:
            self_rows = exclude_self_rows[q_rows]
            d[cand[None, :] == self_rows[:, None]] = np.inf
        kk = min(k, d.shape[1])
        # stable top-k: order by (distance, candidate row) — cand is sorted
        part = np.argsort(d, axis=1, kind="stable")[:, :kk]
        rows_sel = cand[part]
        dist_sel = np.take_along_axis(d, part, axis=1)
        rows_sel[dist_sel == np.inf] = -1  # excluded-self / missing slots
        nn[q_rows[:, None], np.arange(kk)[None, :]] = rows_sel
        nd[q_rows[:, None], np.arange(kk)[None, :]] = dist_sel
    return nn, nd


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Unit-sphere 3D coordinates, (n, 3)."""
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    return np.stack([cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)], axis=1)


_CHORD_CHUNK_ENTRIES = 16_000_000  # cap on the (queries x candidates) score block


def knn_chord_topk(
    c_lon: np.ndarray,
    c_lat: np.ndarray,
    q_lon: np.ndarray,
    q_lat: np.ndarray,
    k: int,
    *,
    c_xyz: np.ndarray | None = None,
    exclude_self_rows: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k via chord-distance prefilter: one (queries x cands)
    dot-product matmul ranks by great-circle distance (chord length is
    strictly monotone in central angle), then exact haversine re-ranks
    only the selected k+pad per query. ~20x the trig-everywhere brute
    force; identical results incl. the (distance, candidate row)
    tie-break — queries whose tie group straddles the prefilter
    boundary (regular grids) fall back to the full per-query sort.
    Queries are chunked so the score block stays under ~128MB.
    """
    c_lon = np.asarray(c_lon, dtype=np.float64)
    c_lat = np.asarray(c_lat, dtype=np.float64)
    q_lon = np.asarray(q_lon, dtype=np.float64)
    q_lat = np.asarray(q_lat, dtype=np.float64)
    m, n = len(c_lon), len(q_lon)
    kk = min(k, m)
    out_rows = np.full((n, k), -1, dtype=np.int64)
    out_dist = np.full((n, k), np.inf)
    if m == 0 or n == 0:
        return out_rows, out_dist
    if c_xyz is None:
        c_xyz = lonlat_to_xyz(c_lon, c_lat)
    pad = min(kk + 8, m)
    chunk = max(1, _CHORD_CHUNK_ENTRIES // m)
    excl = None if exclude_self_rows is None else np.asarray(exclude_self_rows)
    for a in range(0, n, chunk):
        b = min(a + chunk, n)
        q_xyz = lonlat_to_xyz(q_lon[a:b], q_lat[a:b])
        dots = q_xyz @ c_xyz.T
        if excl is not None:
            cols = np.arange(m)
            dots[cols[None, :] == excl[a:b][:, None]] = -np.inf
        if pad < m:
            sel = np.argpartition(-dots, pad - 1, axis=1)[:, :pad]
        else:
            sel = np.broadcast_to(np.arange(m), (b - a, m)).copy()
        # tie safety: if candidates tied with the chunk's selection
        # minimum spill past the prefilter, sort those queries fully
        minsel = np.take_along_axis(dots, sel, axis=1).min(axis=1)
        spill = (dots >= minsel[:, None]).sum(axis=1) > pad
        sel = np.sort(sel, axis=1)  # ascending row => stable row tie-break
        d = haversine_m(q_lon[a:b, None], q_lat[a:b, None], c_lon[sel], c_lat[sel])
        if excl is not None:
            d[sel == excl[a:b][:, None]] = np.inf
        part = np.argsort(d, axis=1, kind="stable")[:, :kk]
        rows = np.take_along_axis(sel, part, axis=1).astype(np.int64)
        dist = np.take_along_axis(d, part, axis=1)
        if spill.any():
            qi = np.flatnonzero(spill)
            fr, fd = knn_brute_force(
                c_lon, c_lat, q_lon[a:b][qi], q_lat[a:b][qi], kk,
                exclude_self_rows=None if excl is None else excl[a:b][qi],
            )
            rows[qi], dist[qi] = fr[:, :kk], fd[:, :kk]
        rows[dist == np.inf] = -1
        out_rows[a:b, :kk] = rows
        out_dist[a:b, :kk] = dist
    return out_rows, out_dist


def knn_brute_force(
    c_lon: np.ndarray,
    c_lat: np.ndarray,
    q_lon: np.ndarray,
    q_lat: np.ndarray,
    k: int,
    exclude_self_rows: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """O(n*m) oracle for tests (SURVEY.md §5.2 layer 1)."""
    d = haversine_m(
        np.asarray(q_lon)[:, None],
        np.asarray(q_lat)[:, None],
        np.asarray(c_lon)[None, :],
        np.asarray(c_lat)[None, :],
    )
    if exclude_self_rows is not None:
        cols = np.arange(d.shape[1])
        d[cols[None, :] == np.asarray(exclude_self_rows)[:, None]] = np.inf
    kk = min(k, d.shape[1])
    part = np.argsort(d, axis=1, kind="stable")[:, :kk]
    dist = np.take_along_axis(d, part, axis=1)
    rows = part.astype(np.int64)
    rows[dist == np.inf] = -1
    out_rows = np.full((d.shape[0], k), -1, dtype=np.int64)
    out_dist = np.full((d.shape[0], k), np.inf)
    out_rows[:, :kk] = rows
    out_dist[:, :kk] = dist
    return out_rows, out_dist
