"""Distributed geo operators beyond the broadcast flagship stages.

``self_knn_halo``: kNN of every row against the WHOLE table (no
broadcastable candidate side — the both-big case, SURVEY T2 phase 2).

Partitioning scheme: each point is assigned to its coarse H3-like cell;
a ``flat_map``-style batch stage also emits GHOST copies of each point
into the ``halo_rings`` neighboring cells. One ``groupby(cell)`` then
co-locates every point with all candidates that could be among its k
nearest, and ``map_groups`` runs an exact local kNN for the group's
non-ghost members.

PARTITIONING ASSUMPTION (documented per the brief): a single halo pass
is exact only for queries whose true k-th neighbor lies within the
halo's certified radius; ``self_knn_halo`` therefore certifies each
query per pass and escalates the uncertified sparse tail to coarser
resolutions until exact (see its docstring). Choose ``coarse_res`` so
the expected per-cell count >> k and round one certifies ~everything.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from engine.geo import h3like, knn as knn_mod
from engine.state import default_pool


def _halo_explode(batch: pa.Table, coarse_res: int, halo_rings: int) -> pa.Table:
    lon = np.asarray(batch["lon"], dtype=np.float64)
    lat = np.asarray(batch["lat"], dtype=np.float64)
    ids = np.asarray(batch["image_id"]).astype(object)
    home = h3like.encode(lon, lat, coarse_res)
    out_cell, out_ix, out_ghost = [home], [np.arange(len(lon))], [np.zeros(len(lon), bool)]
    for cell in np.unique(home):
        m = np.flatnonzero(home == cell)
        neigh = np.concatenate(
            [h3like.ring(int(cell), g) for g in range(1, halo_rings + 1)]
        )
        for nc in neigh:
            out_cell.append(np.full(len(m), nc, dtype=np.uint64))
            out_ix.append(m)
            out_ghost.append(np.ones(len(m), bool))
    cells = np.concatenate(out_cell)
    ix = np.concatenate(out_ix)
    ghost = np.concatenate(out_ghost)
    return pa.table(
        {
            "cell": pa.array(cells, pa.uint64()),
            "image_id": pa.array(ids[ix].tolist(), pa.string()),
            "lon": pa.array(lon[ix], pa.float64()),
            "lat": pa.array(lat[ix], pa.float64()),
            "ghost": pa.array(ghost),
        }
    )


def self_knn_halo(
    ds: ray.data.Dataset,
    *,
    k: int = 3,
    coarse_res: int = 5,
    halo_rings: int = 1,
) -> ray.data.Dataset:
    """image table with lon/lat -> (image_id, neighbor_id, rank, dist_m)
    — EXACT global self-kNN, adaptively escalated.

    Round r runs the halo-shuffle kNN at ``coarse_res - r``: one
    groupby(cell) co-locates each point with every candidate within
    ``halo_rings`` rings. A query is CERTIFIED when it found all k
    neighbors and its k-th distance sits inside the halo's guaranteed
    covered radius. The tight bound: a query at a cell VERTEX reaches a
    grid-distance-(h+1) cell after h vertex hops of one edge length, so
    the union of cells within h rings is only guaranteed to cover
    h * cell_size degrees around the query (NOT the ~1.6x apothem-based
    figure a centered query would enjoy — the vertex case is exactly
    where round-2's oracle caught a missed true neighbor). Degrees
    convert to meters with the conservative global min-meters-per-
    degree bound.
    Uncertified queries — the sparse tail the round-2 oracle exposed:
    isolated points whose true neighbors live outside the halo — re-run
    at the next-coarser res against the full candidate set until
    certified; res 0 is the terminal whole-lattice fallback where any
    result is globally exact. Dense data certifies ~everything in round
    one, so the escalation cost is bounded by the sparse-tail size (the
    pending id set is the only driver-side state, and it only shrinks).
    """
    import ray

    from engine.state import cached_get

    def abs_lat(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"m": [float(np.abs(b["lat"].to_numpy()).max())]})

    max_abs_lat = float(
        ds.map_batches(abs_lat, batch_format="pandas").max("m") or 0.0
    )
    coslat = max(np.cos(np.deg2rad(min(max_abs_lat, 89.9))), 1e-6)
    ring_cover = float(halo_rings)  # h vertex hops of one edge length

    def one_pass(res: int, pending_ref, final_round: bool) -> ray.data.Dataset:
        safe_m = ring_cover * h3like.res_size(res) * 110_000.0 * coslat * 0.95

        def explode(batch: pa.Table) -> pa.Table:
            return _halo_explode(batch, res, halo_rings)

        def local_knn(g: pd.DataFrame) -> pd.DataFrame:
            own = g[~g["ghost"]]
            if pending_ref is not None and not own.empty:
                pend = cached_get(pending_ref)
                own = own[own["image_id"].isin(pend)]
            if own.empty:
                return pd.DataFrame(
                    {"image_id": pd.Series(dtype=str),
                     "neighbor_id": pd.Series(dtype=str),
                     "rank": pd.Series(dtype=np.int32),
                     "dist_m": pd.Series(dtype=np.float64),
                     "satisfied": pd.Series(dtype=bool)}
                )
            # candidates: every row in the group (dedup ghosts of same id)
            cand = g.drop_duplicates("image_id")
            c_lon, c_lat = cand["lon"].to_numpy(), cand["lat"].to_numpy()
            c_ids = cand["image_id"].to_numpy()
            order = np.argsort(c_ids, kind="stable")
            c_lon, c_lat, c_ids = c_lon[order], c_lat[order], c_ids[order]
            q_ids = own["image_id"].to_numpy()
            self_rows = np.searchsorted(c_ids, q_ids)
            nn, nd = knn_mod.knn_chord_topk(
                c_lon, c_lat, own["lon"].to_numpy(), own["lat"].to_numpy(),
                k, exclude_self_rows=self_rows,
            )
            valid = nn >= 0
            n, kk = nn.shape
            found = valid.sum(axis=1)
            kth = np.where(found > 0,
                           np.max(np.where(valid, nd, -np.inf), axis=1), 0.0)
            sat = (found >= kk) & (kth <= safe_m)
            if final_round:
                sat[:] = True
            rep_mask = valid.ravel()
            frame = pd.DataFrame(
                {
                    "image_id": np.repeat(q_ids, kk)[rep_mask],
                    "neighbor_id":
                        c_ids[np.where(valid, nn, 0)].ravel()[rep_mask],
                    "rank": np.tile(np.arange(kk, dtype=np.int32), n)[rep_mask],
                    "dist_m": np.round(nd.ravel()[rep_mask], 6),
                    "satisfied": np.repeat(sat, kk)[rep_mask],
                }
            )
            # a pending query with ZERO in-group neighbors would emit no
            # rows and silently fall out of the pending set — emit a
            # marker row (never satisfied, filtered from final output)
            zero = (found == 0) & ~sat
            if zero.any():
                frame = pd.concat([frame, pd.DataFrame({
                    "image_id": q_ids[zero],
                    "neighbor_id": "",
                    "rank": np.int32(-1),
                    "dist_m": 0.0,
                    "satisfied": False,
                })], ignore_index=True)
            return frame

        exploded = ds.map_batches(explode, batch_format="pyarrow")
        return exploded.groupby("cell").map_groups(
            local_knn, batch_format="pandas"
        )

    parts: list[ray.data.Dataset] = []
    pending_ref = None
    res = coarse_res
    while True:
        final_round = res <= 0
        rows = one_pass(res, pending_ref, final_round).materialize()
        done = rows.filter(expr="satisfied == True").drop_columns(["satisfied"])
        parts.append(done)
        if final_round:
            break
        unsat = rows.filter(expr="satisfied == False")
        uniq = unsat.select_columns(["image_id"]).unique("image_id")
        pend_ids = set(uniq) if uniq is not None and len(uniq) else set()
        if not pend_ids:
            break
        pending_ref = ray.put(pend_ids)
        res -= 1
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def polygon_centroids(poly: dict) -> ray.data.Dataset:
    """Vectorized ring centroids (SURVEY M5) as a Dataset.

    The reference takes a representative point of each way/relation
    geometry; here: area-weighted polygon centroid (shoelace), computed
    batch-wise over Arrow list columns via numpy on the ring arrays."""
    rows = []
    for i in range(len(poly["admin_id"])):
        rows.append(
            {
                "admin_id": str(poly["admin_id"][i]),
                "level": int(poly["level"][i]),
                "ring_lon": np.asarray(poly["ring_lon"][i], dtype=np.float64).tolist(),
                "ring_lat": np.asarray(poly["ring_lat"][i], dtype=np.float64).tolist(),
            }
        )
    ds = ray.data.from_items(rows)

    def centroid_batch(b: pa.Table) -> pa.Table:
        lons = b["ring_lon"].to_pylist()
        lats = b["ring_lat"].to_pylist()
        cx = np.empty(len(lons))
        cy = np.empty(len(lons))
        for i, (xs, ys) in enumerate(zip(lons, lats)):
            x = np.asarray(xs)
            y = np.asarray(ys)
            x1, y1 = np.roll(x, -1), np.roll(y, -1)
            cross = x * y1 - x1 * y
            a = cross.sum() / 2.0
            if abs(a) < 1e-12:  # degenerate ring: plain mean
                cx[i], cy[i] = x.mean(), y.mean()
            else:
                cx[i] = ((x + x1) * cross).sum() / (6.0 * a)
                cy[i] = ((y + y1) * cross).sum() / (6.0 * a)
        return pa.table(
            {
                "admin_id": b["admin_id"],
                "level": b["level"],
                "centroid_lon": pa.array(np.round(cx, 9), pa.float64()),
                "centroid_lat": pa.array(np.round(cy, 9), pa.float64()),
            }
        )

    return ds.map_batches(centroid_batch, batch_format="pyarrow")


def admin_rollup(joined: ray.data.Dataset, poly: dict) -> pd.DataFrame:
    """Category/area tree rollup (SURVEY A3): per-admin own counts from
    the joined table (distributed groupby), then child->parent subtree
    propagation driver-side over the TINY admin table (bounded depth 3,
    documented small-side assumption — the reference's category tree is
    likewise in-memory)."""
    own = (
        joined.groupby("admin_id")
        .count()
        .to_pandas()
        .rename(columns={"count()": "own_count"})
    )
    table = pd.DataFrame(
        {
            "admin_id": poly["admin_id"].astype(str),
            "level": poly["level"].astype(np.int64),
            "parent_id": poly["parent_id"].astype(str),
        }
    ).merge(own, on="admin_id", how="left")
    table["own_count"] = table["own_count"].fillna(0).astype(np.int64)
    table["subtree_count"] = table["own_count"].copy()
    parent = dict(zip(table["admin_id"], table["parent_id"]))
    idx = {a: i for i, a in enumerate(table["admin_id"])}
    for lvl in (3, 2):  # propagate leaves upward, one level at a time
        for _, row in table[table["level"] == lvl].iterrows():
            p = parent.get(row["admin_id"], "")
            if p and p in idx:
                table.loc[idx[p], "subtree_count"] += row["subtree_count"]
    return table[["admin_id", "level", "own_count", "subtree_count"]].sort_values(
        "admin_id", ignore_index=True
    )


# ------------------------------------------------------------- article match

def article_match(
    indexed: ray.data.Dataset, articles: pd.DataFrame
) -> ray.data.Dataset:
    """Tag-equality join (SURVEY J2): canonicalized caption == canonical
    article title. The article side (reference: per-theme category
    lists) is small relative to the image table, so it is ``ray.put``
    once as a dict and every batch does a vectorized map lookup — no
    shuffle of the image side. Emits one row per matched image:
    (image_id, article_id, caption_canon, theme)."""
    import ray

    from engine.state import cached_get

    lut_ref = ray.put(
        dict(zip(articles["title_canon"], articles["article_id"]))
    )
    theme_ref = ray.put(dict(zip(articles["article_id"], articles["theme"])))

    def f(b: pd.DataFrame) -> pd.DataFrame:
        lut = cached_get(lut_ref)
        themes = cached_get(theme_ref)
        aid = b["caption_canon"].map(lut)
        m = aid.notna()
        out = b.loc[m, ["image_id", "caption_canon"]].copy()
        out["article_id"] = aid[m]
        out["theme"] = out["article_id"].map(themes)
        return out[["image_id", "article_id", "caption_canon", "theme"]]

    return indexed.map_batches(f, batch_format="pandas")


def articles_untagged(
    indexed: ray.data.Dataset, articles: pd.DataFrame
) -> pd.DataFrame:
    """Anti-join side of the match (SURVEY J3): articles with NO image
    whose canonical caption equals the title — the reference's "still
    to tag" suggestion lists. The distinct canonical-caption set is
    aggregated distributedly (shuffles only the canon column); the
    anti filter runs driver-side on the small article table."""
    seen = set(
        indexed.select_columns(["caption_canon"])
        .unique("caption_canon")
    )
    out = articles[~articles["title_canon"].isin(seen)]
    return out.sort_values("article_id", ignore_index=True)


def untagged_by_area(
    indexed: ray.data.Dataset, articles: pd.DataFrame, poly: dict
) -> pd.DataFrame:
    """Per-area "articles still to tag" rows — the content of the
    reference's per-area GPX/CSV exports (phase 3 [PK], SURVEY §1.1
    S6): every untagged article (anti-join vs canonical captions,
    ``articles_untagged``) is located into EACH containing admin
    polygon with the same PIP kernel as the image join, one row per
    (admin area, article). The distinct-caption aggregation is
    distributed; the PIP of the small article table runs driver-side
    (same documented small-side assumption as ``articles_untagged``).
    Feed the result to ``engine.sinks.write_gpx_per_area`` /
    ``write_csv_per_area`` keyed on admin_id."""
    from engine.pipeline.join import build_polygon_set

    un = articles_untagged(indexed, articles)
    polys = build_polygon_set(poly)
    p_idx, g_idx = polys.contains_pairs(
        un["lon"].to_numpy(dtype=np.float64),
        un["lat"].to_numpy(dtype=np.float64),
    )
    out = un.iloc[p_idx].reset_index(drop=True)
    out["admin_id"] = polys.admin_ids[g_idx]
    out["level"] = polys.levels[g_idx].astype(np.int32)
    return out[
        ["admin_id", "level", "article_id", "title_canon", "theme",
         "lon", "lat"]
    ].sort_values(["admin_id", "article_id"], ignore_index=True)


def area_tag_stats(
    joined: ray.data.Dataset, articles: pd.DataFrame
) -> pd.DataFrame:
    """Per-area tagging stats (SURVEY A2): for each admin area, how many
    located images exist, how many match an article, and the match
    percentage — the reference's per-area progress numbers. One
    distributed groupby over (admin_id, matched) partial counts."""
    import ray

    from engine.state import cached_get

    title_ref = ray.put(set(articles["title_canon"]))

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        titles = cached_get(title_ref)
        out = b[["admin_id"]].copy()
        out["matched"] = b["caption_canon"].isin(titles)
        return out

    from engine.ops import relational

    counts = relational.partial_groupby_sum(
        joined.map_batches(flag, batch_format="pandas"),
        ["admin_id", "matched"], {}, count_as="n",
    ).to_pandas()
    pv = counts.pivot_table(
        index="admin_id", columns="matched", values="n",
        aggfunc="sum", fill_value=0,
    )
    n_tagged = pv[True] if True in pv.columns else 0
    n_images = pv.sum(axis=1)
    out = pd.DataFrame(
        {
            "admin_id": pv.index,
            "n_images": n_images.to_numpy(dtype=np.int64),
            "n_tagged": (
                n_tagged.to_numpy(dtype=np.int64)
                if hasattr(n_tagged, "to_numpy") else np.zeros(len(pv), np.int64)
            ),
        }
    )
    out["pct_tagged"] = np.round(
        100.0 * out["n_tagged"] / np.maximum(out["n_images"], 1), 4
    )
    return out.sort_values("admin_id", ignore_index=True)


# ------------------------------------------------------------- vector tiles

def vector_tiles(
    poly: dict, zoom: int = 8, epsilon: float = 0.0
) -> ray.data.Dataset:
    """Vector half of raster<->vector tiling (SURVEY §0.2: per-area
    boundary overlays on the reference's slippy-map pages): every admin
    polygon is projected to Web-Mercator tile units, optionally
    Douglas-Peucker simplified (``epsilon`` in tile units — the per-zoom
    detail knob), flat-mapped onto each z/x/y tile its bbox touches, and
    clipped exactly to the tile rect (Sutherland-Hodgman, convex clip =>
    exact). Holes are clipped too and their area subtracted.

    Emits one row per (polygon, tile): tile_key, z/x/y, admin_id, level,
    the clipped ring in in-tile pixel coords (256px tiles), n_vertices,
    and net area in tile-units^2. Conservation oracle: with epsilon=0
    the per-tile net areas of a polygon sum to its whole-polygon net
    area (the tile grid partitions the plane; verified in tests).

    Scale shape: one input row per polygon, fan-out bounded by bbox tile
    count; no shuffle at all — tiles needing assembly groupby(tile_key)
    downstream. Batches loop over POLYGONS (ragged rings), never over
    vertices; all vertex math is numpy."""
    from engine.geo import clip as clip_mod
    from engine.pipeline.tile import TILE_SIZE, tile_key as pack_key

    rows = []
    holes_all = poly.get("holes") or [[] for _ in poly["admin_id"]]
    for i in range(len(poly["admin_id"])):
        rows.append(
            {
                "admin_id": str(poly["admin_id"][i]),
                "level": int(poly["level"][i]),
                "ring_lon": np.asarray(poly["ring_lon"][i], np.float64).tolist(),
                "ring_lat": np.asarray(poly["ring_lat"][i], np.float64).tolist(),
                "hole_lon": [np.asarray(hx, np.float64).tolist() for hx, _ in holes_all[i]],
                "hole_lat": [np.asarray(hy, np.float64).tolist() for _, hy in holes_all[i]],
            }
        )
    ds = ray.data.from_items(rows)

    def clip_batch(b: pa.Table) -> pd.DataFrame:
        out: dict[str, list] = {
            "tile_key": [], "z": [], "x": [], "y": [],
            "admin_id": [], "level": [], "n_vertices": [],
            "area": [], "ring_px": [], "ring_py": [],
        }
        ids = b["admin_id"].to_pylist()
        lvls = b["level"].to_pylist()
        rlon = b["ring_lon"].to_pylist()
        rlat = b["ring_lat"].to_pylist()
        hlon = b["hole_lon"].to_pylist()
        hlat = b["hole_lat"].to_pylist()
        for aid, lvl, lons, lats, hxs, hys in zip(
            ids, lvls, rlon, rlat, hlon, hlat
        ):
            ex, ey = clip_mod.lonlat_to_mercator_unit(
                np.asarray(lons), np.asarray(lats), zoom
            )
            if epsilon > 0.0:
                ex, ey = clip_mod.simplify_ring(ex, ey, epsilon)
            holes_m = [
                clip_mod.lonlat_to_mercator_unit(
                    np.asarray(hx), np.asarray(hy), zoom
                )
                for hx, hy in zip(hxs, hys)
            ]
            n = 1 << zoom
            tx0 = max(0, int(np.floor(ex.min())))
            tx1 = min(n - 1, int(np.floor(ex.max())))
            ty0 = max(0, int(np.floor(ey.min())))
            ty1 = min(n - 1, int(np.floor(ey.max())))
            for tx in range(tx0, tx1 + 1):
                for ty in range(ty0, ty1 + 1):
                    cx, cy = clip_mod.clip_ring_rect(
                        ex, ey, tx, ty, tx + 1.0, ty + 1.0
                    )
                    if len(cx) < 3:
                        continue
                    area = abs(clip_mod.shoelace_area(cx, cy))
                    for hx, hy in holes_m:
                        chx, chy = clip_mod.clip_ring_rect(
                            hx, hy, tx, ty, tx + 1.0, ty + 1.0
                        )
                        if len(chx) >= 3:
                            area -= abs(clip_mod.shoelace_area(chx, chy))
                    if area <= 1e-12:
                        continue
                    key = int(pack_key(
                        np.asarray([tx]), np.asarray([ty]), zoom
                    )[0])
                    out["tile_key"].append(key)
                    out["z"].append(zoom)
                    out["x"].append(tx)
                    out["y"].append(ty)
                    out["admin_id"].append(aid)
                    out["level"].append(lvl)
                    out["n_vertices"].append(len(cx))
                    out["area"].append(round(float(area), 12))
                    out["ring_px"].append(
                        np.round((cx - tx) * TILE_SIZE, 6).tolist()
                    )
                    out["ring_py"].append(
                        np.round((cy - ty) * TILE_SIZE, 6).tolist()
                    )
        return pd.DataFrame(out)

    return ds.map_batches(clip_batch, batch_format="pyarrow")


# ------------------------------------------------------------- suggestions

def suggestions(
    indexed: ray.data.Dataset,
    articles: pd.DataFrame,
    k: int = 3,
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """The reference's suggestion lists (nuts4nuts semantics): for each
    UNTAGGED article — geolocated from its template coordinates — the k
    nearest located images, as "objects you could tag with this title".

    Exact without shuffling the image side: the small article set is
    broadcast once; every image batch computes its per-article local
    top-k (one chord-distance matmul per batch — the batch IS the
    candidate set), and ``grouped_topk(ascending=True)`` merges the
    bounded partials (≤ k rows per article per batch move). Per-article
    exactness holds because min-k over a partition of the candidates is
    associative."""
    from engine.geo.knn import knn_chord_topk
    from engine.ops.relational import grouped_topk
    from engine.state import cached_get

    unt = articles_untagged(indexed, articles)
    q_ref = ray.put(
        {
            "id": unt["article_id"].to_numpy(),
            "lon": unt["lon"].to_numpy(dtype=np.float64),
            "lat": unt["lat"].to_numpy(dtype=np.float64),
        }
    )

    def local_topk(batch: pa.Table) -> pd.DataFrame:
        q = cached_get(q_ref)
        # candidates = THIS batch's image points
        nn, nd = knn_chord_topk(
            np.asarray(batch["lon"], dtype=np.float64),
            np.asarray(batch["lat"], dtype=np.float64),
            q["lon"], q["lat"], k=k,
        )
        ids = np.asarray(batch["image_id"]).astype(object)
        n, kk = nn.shape
        valid = (nn >= 0).ravel()
        art = np.repeat(q["id"], kk)[valid]
        img = ids[np.where(nn >= 0, nn, 0).ravel()[valid]]
        return pd.DataFrame(
            {
                "article_id": art,
                "image_id": img,
                "dist_m": np.round(nd.ravel()[valid], 6),
            }
        )

    partials = indexed.map_batches(
        local_topk, batch_format="pyarrow", batch_size=batch_size
    )
    return grouped_topk(
        partials, "article_id", "dist_m", k, "image_id",
        rank_as="rank", ascending=True,
    )


def vector_tile_masks(
    poly: dict, zoom: int = 8
) -> ray.data.Dataset:
    """Raster half applied to the vector half: every (polygon, tile)
    clip ring from ``vector_tiles`` scanline-fills a 256px tile mask —
    the reference's per-tile boundary overlay raster. Emits mask pixel
    count and a crc for parity checks; masks themselves stay worker-side
    (wide binary never enters a shuffle, SURVEY §7.4)."""
    import zlib

    from engine.geo.raster import fill_rings_mask

    tiles = vector_tiles(poly, zoom=zoom)

    def rasterize(b: pd.DataFrame) -> pd.DataFrame:
        areas, crcs = [], []
        for px, py in zip(b["ring_px"], b["ring_py"]):
            m = fill_rings_mask(
                [(np.asarray(px, np.float64), np.asarray(py, np.float64))]
            )
            areas.append(int(m.sum()))
            crcs.append(zlib.crc32(m.tobytes()))
        out = b[["tile_key", "z", "x", "y", "admin_id", "level", "area"]].copy()
        out["mask_px"] = np.asarray(areas, np.int64)
        out["mask_crc"] = np.asarray(crcs, np.int64)
        return out

    return tiles.map_batches(rasterize, batch_format="pandas")


def radius_join(
    points: ray.data.Dataset,
    poi_ids: np.ndarray,
    poi_lon: np.ndarray,
    poi_lat: np.ndarray,
    radius_m: float,
    concurrency=None,
) -> ray.data.Dataset:
    """Spatial DWithin join (PostGIS ``ST_DWithin`` semantics): every
    (point, poi) pair within ``radius_m`` meters, exact after a
    haversine verify. The POI side broadcasts once as a ``CellIndex``
    whose resolution is chosen so one hex covers the radius — then a
    2-ring disk around each point's cell PROVABLY covers the search
    circle (cell circumradius >= radius ⇒ any POI within radius is at
    grid distance <= 2), keeping candidates O(POIs in ~19 cells). The
    big point side streams; unique point cells share expansion work.
    Exactness vs brute force is pytest-oracled across radii."""
    import ray

    from engine.geo import h3like
    from engine.geo.knn import CellIndex, haversine_m

    if len(np.asarray(poi_ids)) == 0:  # no POIs: no pairs, no index
        def empty(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "point_id": b.iloc[:0, 0],
                "poi_id": pd.Series(dtype=object),
                "dist_m": pd.Series(dtype=np.float64),
            })

        return points.map_batches(empty, batch_format="pandas")
    # Worst-case latitude for the longitudinal degree width: any point
    # that can MATCH a POI lies within radius of one, so its |lat| is at
    # most max|poi_lat| + the radius in latitude degrees. The old
    # max(0.2, cos) clamp understated the needed width above ~78.5°
    # and broke the 2-ring cover guarantee near the poles.
    lat_worst = min(
        90.0,
        float(np.abs(np.asarray(poi_lat)).max()) + radius_m / 111_000.0,
    )
    cos_w = float(np.cos(np.deg2rad(lat_worst)))
    rad_deg = (radius_m / 111_000.0 / cos_w) if cos_w > 1e-9 else float("inf")
    res = 0
    for r in range(15, -1, -1):  # finest res whose hex covers the radius
        if h3like.res_size(r) >= rad_deg:
            res = r
            break
    # Circle touches/overlaps a pole or is wider than the coarsest hex:
    # no planar 2-ring disk can cover it — stay exact by brute-force
    # verifying every (point, POI) pair (POIs are broadcast anyway;
    # only polar/continental-radius data ever lands here).
    brute = rad_deg > h3like.res_size(0)
    ref = ray.put((np.asarray(poi_ids), np.asarray(poi_lon, np.float64),
                   np.asarray(poi_lat, np.float64)))

    class Probe:
        def __init__(self):
            ids, lon, lat = ray.get(ref)
            self.ids = ids
            self.index = CellIndex(lon, lat, res=res)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            px = b["lon"].to_numpy(np.float64)
            py = b["lat"].to_numpy(np.float64)
            ids_np = b.iloc[:, 0].to_numpy()  # first col = point id
            if brute:
                d = haversine_m(
                    px[:, None], py[:, None],
                    self.index.lon[None, :], self.index.lat[None, :],
                )
                pi, qi = np.nonzero(d <= radius_m)
                return pd.DataFrame({
                    "point_id": ids_np[pi], "poi_id": self.ids[qi],
                    "dist_m": np.round(d[pi, qi], 3).astype(np.float64),
                })
            cells = h3like.encode(px, py, res)
            out_p, out_q, out_d = [], [], []
            for cell in np.unique(cells):
                disk = np.concatenate(
                    [h3like.ring(int(cell), k) for k in range(3)]
                )
                cand = self.index.rows_in_cells(disk)
                if not len(cand):
                    continue
                rows = np.flatnonzero(cells == cell)
                d = haversine_m(
                    px[rows][:, None], py[rows][:, None],
                    self.index.lon[cand][None, :],
                    self.index.lat[cand][None, :],
                )
                pi, qi = np.nonzero(d <= radius_m)
                out_p.extend(ids_np[rows[pi]])
                out_q.extend(self.ids[cand[qi]])
                out_d.extend(np.round(d[pi, qi], 3))
            return pd.DataFrame({
                "point_id": out_p, "poi_id": out_q,
                "dist_m": np.asarray(out_d, dtype=np.float64),
            })

    return points.map_batches(
        Probe, batch_format="pandas",
        concurrency=default_pool(concurrency)
    )


def toponym_infer(
    articles: ray.data.Dataset, poly: dict
) -> ray.data.Dataset:
    """Toponym inference (the reference's nuts4nuts fallback [PK],
    SURVEY S3): articles WITHOUT a usable coordinate template get a
    location inferred from the article text — here, the leftmost
    gazetteer (admin-polygon name) mention in the ``summary`` column,
    located at that polygon's shoelace centroid.

    Deterministic match rule (mirrored verbatim by the SQL oracle):
    smallest mention position, then longest name, then smallest
    admin_id. The 77-entry gazetteer plus centroid table broadcast
    once (``ray.put`` + per-worker ``cached_get``); the scan is a
    vectorized ``str.find`` per gazetteer name — O(G) Arrow kernel
    passes per batch, no shuffle. Output: one row per article with a
    mention: (article_id, admin_id, name, level, inferred_lon,
    inferred_lat)."""
    import ray

    from engine.state import cached_get

    cent = polygon_centroids(poly).to_pandas()  # 77 rows, driver-side
    names = [str(nm) for nm in poly["name"]]
    admin = [str(a) for a in poly["admin_id"]]
    # tie-break rank: longest name first, then smallest admin_id
    rank_order = sorted(
        range(len(names)), key=lambda g: (-len(names[g]), admin[g])
    )
    rank = np.empty(len(names), dtype=np.int64)
    rank[rank_order] = np.arange(len(names))
    gaz_ref = ray.put({
        "names": names,
        "admin": np.asarray(admin, dtype=object),
        "rank": rank,
        "cent": cent.set_index("admin_id"),
    })

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        gaz = cached_get(gaz_ref)
        s = b["summary"].astype(str)
        n, G = len(b), len(gaz["names"])
        # position matrix: -1 -> +inf so argmin picks real mentions
        pos = np.full((n, G), np.inf)
        for g, nm in enumerate(gaz["names"]):
            p = s.str.find(nm).to_numpy(dtype=np.float64)
            pos[:, g] = np.where(p < 0, np.inf, p)
        # lexicographic (pos, rank) argmin: G is small, positions are
        # bounded by the summary length, so pos*G+rank is collision-free
        key = np.where(np.isinf(pos), np.inf, pos * G + gaz["rank"])
        best = np.argmin(key, axis=1)
        hit = ~np.isinf(key[np.arange(n), best])
        if not hit.any():
            return pd.DataFrame({
                "article_id": pd.Series(dtype=str),
                "admin_id": pd.Series(dtype=str),
                "name": pd.Series(dtype=str),
                "level": pd.Series(dtype=np.int32),
                "inferred_lon": pd.Series(dtype=np.float64),
                "inferred_lat": pd.Series(dtype=np.float64),
            })
        aid = gaz["admin"][best[hit]]
        c = gaz["cent"].loc[aid]
        return pd.DataFrame({
            "article_id": b["article_id"].to_numpy()[hit],
            "admin_id": aid,
            "name": np.asarray(gaz["names"], dtype=object)[best[hit]],
            "level": c["level"].to_numpy(dtype=np.int32),
            "inferred_lon": c["centroid_lon"].to_numpy(),
            "inferred_lat": c["centroid_lat"].to_numpy(),
        })

    return articles.map_batches(probe, batch_format="pandas")


def josm_links(matched: ray.data.Dataset, pad: float = 0.001) -> ray.data.Dataset:
    """Editor-handoff link generation (reference phase 3 [PK]: JOSM
    remote-control and Overpass query links per matched row). Pure
    vectorized string templating over (image_id, lon, lat) — numpy
    ``%.6f`` formatting matches SQL ``printf('%.6f', ...)`` digit for
    digit, so the oracle twin hash-compares."""

    def fmt(b: pd.DataFrame) -> pd.DataFrame:
        lon = b["lon"].to_numpy(dtype=np.float64)
        lat = b["lat"].to_numpy(dtype=np.float64)
        ix = b.index
        left = pd.Series(np.char.mod("%.6f", lon - pad), index=ix)
        right = pd.Series(np.char.mod("%.6f", lon + pad), index=ix)
        top = pd.Series(np.char.mod("%.6f", lat + pad), index=ix)
        bottom = pd.Series(np.char.mod("%.6f", lat - pad), index=ix)
        clon = pd.Series(np.char.mod("%.6f", lon), index=ix)
        clat = pd.Series(np.char.mod("%.6f", lat), index=ix)
        out = b[["image_id"]].copy()
        out["josm_url"] = (
            "http://localhost:8111/load_and_zoom?left=" + left
            + "&right=" + right + "&top=" + top + "&bottom=" + bottom
        )
        out["overpass_query"] = (
            "node(around:100," + clat + "," + clon + ");out;"
        )
        return out

    return matched.map_batches(fmt, batch_format="pandas")


def polygon_areas(poly: dict) -> ray.data.Dataset:
    """Planar polygon areas (deg^2): outer-ring shoelace minus holes.

    The reference computes per-boundary statistics over OSM admin
    polygons [PK]; this is the area analog of ``polygon_centroids``
    with hole subtraction. Each ring is one row into ``map_batches``
    (vectorized shoelace per ring), then a tiny grouped sum folds
    rings into polygons — ring partials move, vertices never shuffle.
    """
    from engine.ops import relational

    rows = []
    for i in range(len(poly["admin_id"])):
        rings = [(0, poly["ring_lon"][i], poly["ring_lat"][i])]
        for hix, (hx, hy) in enumerate(poly["holes"][i], start=1):
            rings.append((hix, hx, hy))
        for rix, xs, ys in rings:
            rows.append(
                {
                    "admin_id": str(poly["admin_id"][i]),
                    "level": int(poly["level"][i]),
                    "ring_ix": rix,
                    "ring_lon": np.asarray(xs, dtype=np.float64).tolist(),
                    "ring_lat": np.asarray(ys, dtype=np.float64).tolist(),
                }
            )
    ds = ray.data.from_items(rows)

    def ring_area(b: pa.Table) -> pa.Table:
        lons = b["ring_lon"].to_pylist()
        lats = b["ring_lat"].to_pylist()
        rix = np.asarray(b["ring_ix"])
        signed = np.empty(len(lons))
        for i, (xs, ys) in enumerate(zip(lons, lats)):
            x = np.asarray(xs)
            y = np.asarray(ys)
            x1, y1 = np.roll(x, -1), np.roll(y, -1)
            a = np.abs((x * y1 - x1 * y).sum()) / 2.0
            signed[i] = a if rix[i] == 0 else -a  # holes subtract
        return pa.table(
            {
                "admin_id": b["admin_id"],
                "level": b["level"],
                "ring_area": pa.array(signed, pa.float64()),
            }
        )

    rings_ds = ds.map_batches(ring_area, batch_format="pyarrow")
    return relational.partial_groupby_sum(
        rings_ds, ["admin_id", "level"], {"ring_area": "area_deg2"}
    )


# dq*2^28 + dr for the 6 axial hex directions (h3like.DIRECTIONS) —
# neighbor cell ids differ from the center by exactly these packed
# deltas at equal resolution (id = res<<56 | (q+off)<<28 | (r+off))
_HEX_PACKED_DELTAS = np.array(
    [(dq << 28) + dr for dq, dr in h3like.DIRECTIONS], dtype=np.int64
)


def cell_ring_density(
    indexed: ray.data.Dataset, res: int = 5
) -> ray.data.Dataset:
    """Hex focal sum (neighborhood density smoothing): for every
    OCCUPIED cell at ``res``, its own image count plus the total over
    its 6 ring-1 neighbors (``disk_n`` = the filled 1-disk count).

    Scale path: the explode runs over the per-cell PARTIALS (|cells|
    rows, not |images|) — each cell count scatters to itself (own) and
    its 6 neighbor ids (ring contribution) by pure packed-id
    arithmetic, then ONE grouped sum folds both columns and empty
    cells are dropped. No joins, no row-level shuffle.
    """
    from engine.ops import relational

    col = f"h3_r{res}"
    counts = relational.partial_groupby_sum_arrow(
        indexed.select_columns([col]), [col], {}, count_as="n"
    )

    def explode(t: pa.Table) -> pa.Table:
        cells = np.asarray(t[col]).astype(np.int64)
        n = np.asarray(t["n"]).astype(np.int64)
        m = len(cells)
        tgt = np.concatenate(
            [cells, (cells[:, None] + _HEX_PACKED_DELTAS[None, :]).ravel()]
        )
        own = np.concatenate([n, np.zeros(6 * m, dtype=np.int64)])
        ring = np.concatenate([np.zeros(m, dtype=np.int64), np.repeat(n, 6)])
        return pa.table({col: tgt, "own_n": own, "ring_n": ring})

    exploded = counts.map_batches(explode, batch_format="pyarrow")
    agg = relational.partial_groupby_sum_arrow(
        exploded, [col], {"own_n": "n", "ring_n": "ring1_n"}
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater(t["n"], 0))
        return t.append_column("disk_n", pc.add(t["n"], t["ring1_n"]))

    return agg.map_batches(finish, batch_format="pyarrow")


def zonal_image_stats(
    indexed: ray.data.Dataset, poly: dict
) -> ray.data.Dataset:
    """Zonal statistics: per admin polygon, the count and total
    megapixels of the images it contains (the per-area payload budget
    the reference's per-area reports summarize [PK]).

    Scale path: the polygon set broadcasts ONCE (``ray.put`` +
    ``cached_get``); each batch runs the exact PIP containment and
    emits one (admin, n, sum_mpx) partial per admin it touched — only
    |admins|-sized partials move, the image table never shuffles.
    """
    from engine.ops import relational
    from engine.pipeline.join import build_polygon_set
    from engine.state import cached_get

    poly_ref = ray.put(build_polygon_set(poly))

    def combine(batch: pa.Table) -> pa.Table:
        polys = cached_get(poly_ref)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        mpx = (
            np.asarray(batch["w"], dtype=np.float64)
            * np.asarray(batch["h"], dtype=np.float64) / 1e6
        )
        p_idx, g_idx = polys.contains_pairs(lon, lat)
        order = np.argsort(g_idx, kind="stable")
        g_s = g_idx[order]
        bounds = np.concatenate(
            [[0], np.flatnonzero(np.diff(g_s)) + 1, [len(g_s)]]
        ) if len(g_s) else np.array([0, 0])
        gids, ns, sums, lvls = [], [], [], []
        for a, b in zip(bounds[:-1], bounds[1:]):
            if a == b:
                continue
            gi = int(g_s[a])
            gids.append(str(polys.admin_ids[gi]))
            lvls.append(int(polys.levels[gi]))
            ns.append(b - a)
            sums.append(mpx[p_idx[order[a:b]]].sum())
        return pa.table(
            {
                "admin_id": pa.array(gids, pa.string()),
                "level": pa.array(lvls, pa.int32()),
                "n_images": pa.array(ns, pa.int64()),
                "sum_mpx": pa.array(sums, pa.float64()),
            }
        )

    partials = indexed.map_batches(combine, batch_format="pyarrow")
    return relational.partial_groupby_sum_arrow(
        partials, ["admin_id", "level"],
        {"n_images": "n_images", "sum_mpx": "sum_mpx"},
    )


def reverse_geocode(
    indexed: ray.data.Dataset, poly: dict
) -> ray.data.Dataset:
    """Reverse geocode: each image's DEEPEST containing admin polygon
    (max level; smallest admin_id breaks ties) plus the full ancestor
    breadcrumb ``Region > Province > Municipality`` (the reference's
    per-area page breadcrumbs [PK]).

    The polygon set broadcasts once; breadcrumb strings precompute
    driver-side over the TINY admin meta (bounded depth 3) and ship
    inside the UDF closure. Images with no containing polygon are
    dropped (inner semantics, same as the PIP join).
    """
    from engine.pipeline.join import build_polygon_set
    from engine.state import cached_get

    admin_ids = [str(a) for a in poly["admin_id"]]
    name = dict(zip(admin_ids, [str(n) for n in poly["name"]]))
    parent = dict(zip(admin_ids, [str(p) for p in poly["parent_id"]]))

    def path_of(a: str) -> str:
        chain = [a]
        while parent.get(chain[-1], ""):
            chain.append(parent[chain[-1]])
        return " > ".join(name[c] for c in reversed(chain))

    paths = {a: path_of(a) for a in admin_ids}
    poly_ref = ray.put(build_polygon_set(poly))

    def fn(batch: pa.Table) -> pa.Table:
        polys = cached_get(poly_ref)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        p_idx, g_idx = polys.contains_pairs(lon, lat)
        lv = polys.levels[g_idx]
        adm = polys.admin_ids[g_idx].astype(object)
        # deepest level per point, then smallest admin_id — lexsort
        # (primary key LAST in numpy)
        order = np.lexsort((adm, -lv, p_idx))
        ps = p_idx[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = ps[1:] != ps[:-1]
        sel = order[first]
        pts = pa.array(p_idx[sel], pa.int64())
        chosen = adm[sel]
        return pa.table(
            {
                "image_id": pa.compute.take(batch["image_id"], pts),
                "admin_id": pa.array(chosen.astype(str), pa.string()),
                "level": pa.array(lv[sel], pa.int32()),
                "path": pa.array([paths[a] for a in chosen], pa.string()),
            }
        )

    return indexed.map_batches(fn, batch_format="pyarrow")


def idw_interpolate(
    indexed: ray.data.Dataset,
    points: "pd.DataFrame",
    value_col: str,
    *,
    k: int = 5,
    power: int = 2,
) -> ray.data.Dataset:
    """IDW spatial interpolation: the value at each query point is the
    1/d^power-weighted mean of its k nearest images' ``value_col``.

    Query points ride in the UDF closure (tiny side, ships once per
    worker). Each batch emits its LOCAL k nearest per point — the
    shuffle moves at most k * n_batches rows per point — then
    ``grouped_topk`` merges by (dist, image_id) and a per-point fold
    computes the weighted mean. Distances clamp at 1e-9 m so an image
    exactly on a query point dominates without dividing by zero (the
    SQL twin applies the same clamp).
    """
    from engine.geo import knn as knn_mod
    from engine.ops import relational

    q_ids = points["poi_id"].to_numpy().astype(object)
    q_lon = points["lon"].to_numpy(dtype=np.float64)
    q_lat = points["lat"].to_numpy(dtype=np.float64)

    def local_topk(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        val = np.asarray(b[value_col], dtype=np.float64)
        ids = np.asarray(b["image_id"]).astype(object)
        d = knn_mod.haversine_m(
            lon[None, :], lat[None, :], q_lon[:, None], q_lat[:, None]
        )
        kk = min(k, d.shape[1])
        sel = np.empty((len(q_ids), kk), dtype=np.int64)
        for qi in range(len(q_ids)):  # 1 lexsort per (tiny) point set
            sel[qi] = np.lexsort((ids, d[qi]))[:kk]
        return pa.table(
            {
                "poi_id": pa.array(
                    np.repeat(q_ids, kk).astype(str), pa.string()),
                "image_id": pa.array(
                    ids[sel].ravel().astype(str), pa.string()),
                "dist_m": pa.array(
                    np.take_along_axis(d, sel, axis=1).ravel(),
                    pa.float64()),
                "val": pa.array(val[sel].ravel(), pa.float64()),
            }
        )

    partials = indexed.map_batches(local_topk, batch_format="pyarrow")
    top = relational.grouped_topk(
        partials, "poi_id", "dist_m", k, tie_col="image_id",
        rank_as=None, ascending=True,
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        w = 1.0 / np.maximum(g["dist_m"].to_numpy(), 1e-9) ** power
        v = g["val"].to_numpy()
        return pd.DataFrame(
            {
                "poi_id": [g["poi_id"].iloc[0]],
                "n_used": [np.int64(len(g))],
                "idw_val": [float((w * v).sum() / w.sum())],
            }
        )

    return top.groupby("poi_id").map_groups(fold, batch_format="pandas")


def coverage_gaps(
    indexed: ray.data.Dataset, poly: dict
) -> ray.data.Dataset:
    """Spatial ANTI-join: images contained in NO admin polygon — the
    reference's "unmapped object" / coverage-gap report [PK]. Pure
    streaming filter: the polygon set broadcasts once per worker and
    each batch drops its contained points; nothing shuffles.
    """
    from engine.pipeline.join import build_polygon_set
    from engine.state import cached_get

    poly_ref = ray.put(build_polygon_set(poly))

    def fn(batch: pa.Table) -> pa.Table:
        polys = cached_get(poly_ref)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        p_idx, _ = polys.contains_pairs(lon, lat)
        keep = np.ones(len(lon), dtype=bool)
        keep[p_idx] = False
        sel = np.flatnonzero(keep)
        return pa.table(
            {
                "image_id": pa.compute.take(
                    batch["image_id"], pa.array(sel, pa.int64())),
                "lon": pa.array(lon[sel], pa.float64()),
                "lat": pa.array(lat[sel], pa.float64()),
            }
        )

    return indexed.map_batches(fn, batch_format="pyarrow")


def ring_perimeters(
    vertices: ray.data.Dataset, num_shards: int = 64
) -> ray.data.Dataset:
    """Per-polygon total ring perimeter in meters (outer + holes) —
    the line-geometry length op (ST_Perimeter).

    Vertex rows of one polygon must meet to close its rings, so this
    hash-shards by ``admin_id`` (a polygon's vertex count is tiny and
    bounded; polygons per shard are many — per-SHARD vectorized
    segments, not per-polygon Python dispatch). Each shard sorts by
    (admin_id, ring_ix, vertex_ix), computes haversine edge lengths
    with a roll-within-segment trick, and sums per polygon.
    """
    from engine.ops.relational import _sharded_by_key

    def shard_perims(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["admin_id", "ring_ix", "vertex_ix"],
                          kind="stable")
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        ring_key = (
            g["admin_id"].astype(str) + "\x00"
            + g["ring_ix"].astype(str)
        ).to_numpy()
        # index of each vertex's ring-successor (wraps to ring start)
        nxt = np.arange(1, len(g) + 1)
        starts = np.flatnonzero(
            np.r_[True, ring_key[1:] != ring_key[:-1]])
        ends = np.r_[starts[1:], len(g)] - 1
        nxt[ends] = starts
        d = knn_mod.haversine_m(lon, lat, lon[nxt], lat[nxt])
        out = pd.DataFrame({"admin_id": g["admin_id"].to_numpy(),
                            "level": g["level"].to_numpy(), "d": d})
        agg = out.groupby(["admin_id", "level"], sort=False, as_index=False)["d"].sum()
        return agg.rename(columns={"d": "perimeter_m"})

    sharded = _sharded_by_key(vertices, "admin_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_perims(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def voronoi_assign(
    indexed: ray.data.Dataset, sites: "pd.DataFrame"
) -> ray.data.Dataset:
    """Assign every image to its nearest site (Voronoi cell by
    haversine distance, site_id ascending breaks ties) and aggregate
    per site: member count + mean distance.

    Sites ride in the UDF closure (tiny side); per-batch argmin is one
    vectorized (batch x sites) distance matrix; only |sites| partial
    rows per batch shuffle to the final combine.
    """
    site_ids = sites["site_id"].to_numpy().astype(object)
    s_lon = sites["lon"].to_numpy(np.float64)
    s_lat = sites["lat"].to_numpy(np.float64)

    def local(batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        d = knn_mod.haversine_m(
            lon[:, None], lat[:, None], s_lon[None, :], s_lat[None, :])
        best = np.argmin(d, axis=1)  # ties: first (lowest index) —
        # sites are pre-sorted by site_id so this IS site_id ascending
        bd = d[np.arange(len(lon)), best]
        cnt = np.bincount(best, minlength=len(site_ids))
        sm = np.bincount(best, weights=bd, minlength=len(site_ids))
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "site_id": pa.array(
                    site_ids[nz].astype(str), pa.string()),
                "n": pa.array(cnt[nz], pa.int64()),
                "dist_sum": pa.array(sm[nz], pa.float64()),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "site_id": [g["site_id"].iloc[0]],
                "n_points": [np.int64(g["n"].sum())],
                "mean_dist_m": [float(g["dist_sum"].sum() / g["n"].sum())],
            }
        )

    partials = indexed.map_batches(local, batch_format="pyarrow")
    return partials.groupby("site_id").map_groups(
        final, batch_format="pandas")


def polygon_scan(
    layout_dir: str,
    ring_lon: np.ndarray,
    ring_lat: np.ndarray,
    holes: list | None = None,
    columns: list[str] | None = None,
    max_cells: int = 64,
) -> ray.data.Dataset:
    """Exact points-in-ONE-polygon scan over a ``write_cell_
    partitioned`` layout: spatial predicate PUSHDOWN. The polygon's
    conservative cell cover (``s2like.covering``, capped at the
    layout's cell level so cover cells are never finer than data
    dirs) prunes whole hive directories before any task schedules;
    the exact even-odd PIP filter runs per batch on the survivors.
    """
    import json

    from engine.geo import pip, s2like

    with open(f"{layout_dir}/_cellmap.json") as f:
        level = json.load(f)["level"]
    cover = s2like.covering(
        np.asarray(ring_lon, np.float64), np.asarray(ring_lat, np.float64),
        max_level=level, max_cells=max_cells)
    from engine import io as io_mod

    cols = None
    if columns is not None:
        cols = sorted(set(columns) | {"lon", "lat"})
    ds = io_mod.read_cell_cover(layout_dir, cover, columns=cols)
    rx = np.asarray(ring_lon, np.float64)
    ry = np.asarray(ring_lat, np.float64)
    hs = [(np.asarray(hx, np.float64), np.asarray(hy, np.float64))
          for hx, hy in (holes or [])]

    def fn(batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        inside = pip.points_in_ring(lon, lat, rx, ry)
        for hx, hy in hs:
            inside &= ~pip.points_in_ring(lon, lat, hx, hy)
        return batch.filter(pa.array(inside))

    out = ds.map_batches(fn, batch_format="pyarrow")
    if columns is not None:
        out = out.select_columns(columns)
    return out


def track_stats(
    points: ray.data.Dataset, num_shards: int = 64
) -> ray.data.Dataset:
    """Per-track trajectory statistics over (track_id, seq, lon, lat)
    rows: point count, polyline length in meters (haversine between
    seq-consecutive points) and net start-to-end displacement — the
    GPS-track / movement-analytics op.

    A track's points must meet in seq order, so this hash-shards by
    ``track_id`` (many tracks per shard — per-SHARD vectorized
    segment math, no per-track dispatch; the same discipline as
    ``ring_perimeters``).
    """
    from engine.ops.relational import _sharded_by_key

    def shard_tracks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        tid = g["track_id"].to_numpy()
        d = knn_mod.haversine_m(lon[:-1], lat[:-1], lon[1:], lat[1:])
        same = tid[1:] == tid[:-1]
        seg = pd.DataFrame({"track_id": tid[1:][same], "d": d[same]})
        lens = seg.groupby("track_id", sort=False)["d"].sum()
        starts = np.flatnonzero(np.r_[True, ~same])
        ends = np.r_[starts[1:], len(g)] - 1
        net = knn_mod.haversine_m(
            lon[starts], lat[starts], lon[ends], lat[ends])
        out = pd.DataFrame({
            "track_id": tid[starts],
            "n_points": (ends - starts + 1).astype(np.int64),
            "net_m": net,
        })
        out["track_m"] = out["track_id"].map(lens).fillna(0.0)
        return out[["track_id", "n_points", "track_m", "net_m"]]

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_tracks(g.drop(columns="__shard")),
        batch_format="pandas",
    )


_M_PER_DEG = 6371008.8 * np.pi / 180.0


def dist_to_boundary(
    indexed: ray.data.Dataset, poly: dict
) -> ray.data.Dataset:
    """Per-image distance to the NEAREST polygon boundary edge
    (ST_Distance to the boundary, equirectangular local projection —
    exact arithmetic twin of the SQL oracle) plus that edge's
    admin_id ((dist, admin_id) ascending breaks ties).

    Edge endpoints broadcast once per worker as flat arrays; each
    batch computes the (points x edges) clamped point-to-segment
    distance matrix vectorized — nothing shuffles.
    """
    from engine.state import cached_get

    ax, ay, bx, by, eadm = [], [], [], [], []
    for i in range(len(poly["admin_id"])):
        rings = [(poly["ring_lon"][i], poly["ring_lat"][i])]
        rings += list(poly["holes"][i])
        for xs, ys in rings:
            xs = np.asarray(xs, np.float64)
            ys = np.asarray(ys, np.float64)
            ax.append(xs)
            ay.append(ys)
            bx.append(np.roll(xs, -1))
            by.append(np.roll(ys, -1))
            eadm.append(np.full(len(xs), str(poly["admin_id"][i]),
                                dtype=object))
    edges = (np.concatenate(ax), np.concatenate(ay),
             np.concatenate(bx), np.concatenate(by),
             np.concatenate(eadm))
    edges_ref = ray.put(edges)

    def fn(batch: pa.Table) -> pa.Table:
        eax, eay, ebx, eby, adm = cached_get(edges_ref)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        kx = np.cos(np.deg2rad(lat))[:, None]
        rax = (eax[None, :] - lon[:, None]) * kx
        ray_ = eay[None, :] - lat[:, None]
        vx = (ebx[None, :] - eax[None, :]) * kx
        vy = np.broadcast_to(eby - eay, vx.shape)
        vv = vx * vx + vy * vy
        with np.errstate(invalid="ignore", divide="ignore"):
            t = -(rax * vx + ray_ * vy) / vv
        t = np.clip(np.nan_to_num(t, nan=0.0), 0.0, 1.0)
        cx = rax + t * vx
        cy = ray_ + t * vy
        d = np.sqrt(cx * cx + cy * cy) * _M_PER_DEG
        bd = d.min(axis=1)
        # (d, admin_id) ascending tie-break, vectorized: exact double
        # ties (shared parent/child boundary edges compute identical
        # arithmetic) resolve to the lexicographically smallest admin
        uniq, codes = np.unique(adm, return_inverse=True)
        tied = d == bd[:, None]
        code_min = np.where(tied, codes[None, :], len(uniq)).min(axis=1)
        badm = uniq[code_min]
        return pa.table(
            {
                "image_id": batch["image_id"],
                "boundary_admin": pa.array(badm.astype(str), pa.string()),
                "dist_m": pa.array(bd, pa.float64()),
            }
        )

    return indexed.map_batches(fn, batch_format="pyarrow")


def snap_to_boundary(
    indexed: ray.data.Dataset, poly: dict
) -> ray.data.Dataset:
    """Map-matching lite: snap each point to the CLOSEST polygon
    boundary segment — the nearest edge's identity (admin_id,
    ring_ix, vertex_ix), the projected point on it, and the snap
    distance. The trajectory/GPS analog of ``dist_to_boundary`` (same
    clamped point-to-segment arithmetic) but returning WHERE the
    point lands, which is what road-snapping and boundary-conflation
    consume.

    Edge arrays are pre-sorted by (admin_id, ring_ix, vertex_ix) so
    the vectorized first-True argmin IS the lexicographic tie-break
    the SQL twin's ROW_NUMBER ordering reproduces. The snap point is
    ``a + t*(b-a)`` in degrees: the equirect scaling is affine along
    the segment, so the scaled-frame parameter t transfers exactly.
    Edges broadcast once per worker; per batch one (points x edges)
    matrix; nothing shuffles."""
    from engine.state import cached_get

    ax, ay, bx, by, eadm, ering, evix = [], [], [], [], [], [], []
    for i in range(len(poly["admin_id"])):
        rings = [(poly["ring_lon"][i], poly["ring_lat"][i])]
        rings += list(poly["holes"][i])
        for rix, (xs, ys) in enumerate(rings):
            xs = np.asarray(xs, np.float64)
            ys = np.asarray(ys, np.float64)
            ax.append(xs)
            ay.append(ys)
            bx.append(np.roll(xs, -1))
            by.append(np.roll(ys, -1))
            eadm.append(np.full(len(xs), str(poly["admin_id"][i]),
                                dtype=object))
            ering.append(np.full(len(xs), rix, np.int64))
            evix.append(np.arange(len(xs), dtype=np.int64))
    eax, eay = np.concatenate(ax), np.concatenate(ay)
    ebx, eby = np.concatenate(bx), np.concatenate(by)
    adm = np.concatenate(eadm)
    rix = np.concatenate(ering)
    vix = np.concatenate(evix)
    order = np.lexsort((vix, rix, adm))
    edges = (eax[order], eay[order], ebx[order], eby[order],
             adm[order], rix[order], vix[order])
    edges_ref = ray.put(edges)

    def fn(batch: pa.Table) -> pa.Table:
        eax, eay, ebx, eby, adm, rix, vix = cached_get(edges_ref)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        kx = np.cos(np.deg2rad(lat))[:, None]
        rax = (eax[None, :] - lon[:, None]) * kx
        ray_ = eay[None, :] - lat[:, None]
        vx = (ebx[None, :] - eax[None, :]) * kx
        vy = np.broadcast_to(eby - eay, vx.shape)
        vv = vx * vx + vy * vy
        with np.errstate(invalid="ignore", divide="ignore"):
            t = -(rax * vx + ray_ * vy) / vv
        t = np.clip(np.nan_to_num(t, nan=0.0), 0.0, 1.0)
        cx = rax + t * vx
        cy = ray_ + t * vy
        d = np.sqrt(cx * cx + cy * cy) * _M_PER_DEG
        bd = d.min(axis=1)
        jstar = (d == bd[:, None]).argmax(axis=1)
        tj = np.take_along_axis(t, jstar[:, None], axis=1).ravel()
        return pa.table(
            {
                "image_id": batch["image_id"],
                "seg_admin": pa.array(adm[jstar].astype(str),
                                      pa.string()),
                "ring_ix": pa.array(rix[jstar], pa.int64()),
                "vertex_ix": pa.array(vix[jstar], pa.int64()),
                "snap_lon": pa.array(
                    eax[jstar] + tj * (ebx[jstar] - eax[jstar]),
                    pa.float64()),
                "snap_lat": pa.array(
                    eay[jstar] + tj * (eby[jstar] - eay[jstar]),
                    pa.float64()),
                "dist_m": pa.array(bd, pa.float64()),
            }
        )

    return indexed.map_batches(fn, batch_format="pyarrow")


def track_bearings(
    points: ray.data.Dataset, num_shards: int = 64
) -> ray.data.Dataset:
    """Per-track circular bearing statistics over (track_id, seq, lon,
    lat) rows: segment count, mean resultant length of the great-circle
    initial bearings (circular concentration in [0, 1] — 1.0 = all
    segments head the same way) and sinuosity (polyline length over
    net displacement, >= 1) — movement-pattern analytics over GPS
    tracks.

    Same hash-shard-by-track discipline as ``track_stats``: many
    tracks per shard, per-SHARD vectorized trig, no per-track
    dispatch. The bearing is the standard great-circle initial course
    ``atan2(sin dl * cos p2, cos p1 * sin p2 - sin p1 * cos p2 * cos
    dl)`` — operation-for-operation the SQL oracle's arithmetic.
    """
    from engine.ops.relational import _sharded_by_key

    def shard_tracks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lond = g["lon"].to_numpy(np.float64)
        latd = g["lat"].to_numpy(np.float64)
        lon = np.deg2rad(lond)
        lat = np.deg2rad(latd)
        tid = g["track_id"].to_numpy()
        same = tid[1:] == tid[:-1]
        p1, p2 = lat[:-1][same], lat[1:][same]
        dl = lon[1:][same] - lon[:-1][same]
        theta = np.arctan2(
            np.sin(dl) * np.cos(p2),
            np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dl),
        )
        d = knn_mod.haversine_m(
            lond[:-1][same], latd[:-1][same],
            lond[1:][same], latd[1:][same])
        seg = pd.DataFrame({
            "track_id": tid[1:][same],
            "s": np.sin(theta), "c": np.cos(theta), "d": d,
        })
        agg = seg.groupby("track_id", sort=False).agg(
            n_segs=("s", "size"), s=("s", "mean"), c=("c", "mean"),
            track_m=("d", "sum"))
        starts = np.flatnonzero(np.r_[True, ~same])
        ends = np.r_[starts[1:], len(g)] - 1
        net = pd.Series(
            knn_mod.haversine_m(lond[starts], latd[starts],
                                lond[ends], latd[ends]),
            index=tid[starts])
        agg = agg[agg["n_segs"] > 0]
        out = pd.DataFrame({
            "track_id": agg.index,
            "n_segs": agg["n_segs"].to_numpy(np.int64),
            "bearing_concentration": np.hypot(
                agg["s"].to_numpy(), agg["c"].to_numpy()),
            "sinuosity": np.where(
                net.reindex(agg.index).to_numpy() > 0,
                agg["track_m"].to_numpy()
                / net.reindex(agg.index).to_numpy(), 0.0),
        })
        return out.reset_index(drop=True)

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_tracks(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def kde_heatmap(
    indexed: ray.data.Dataset,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0, bandwidth_deg: float = 1.5,
) -> ray.data.Dataset:
    """Gaussian kernel-density heatmap on a fixed lon/lat grid — the
    density-surface / hotspot-map op. Each grid-cell center accumulates
    ``sum(exp(-d2 / (2 h^2)))`` over every point, with ``d2`` the
    squared equirectangular degree distance at the CELL's latitude.

    Scale shape: each batch computes its (points x cells) kernel matrix
    vectorized and emits ONE partial row per grid cell — only
    ``nx * ny`` rows per block ever move (classic combiner), merged by
    ``sum_final``. The grid is a closure constant; nothing broadcasts,
    nothing shuffles."""
    from engine.ops.relational import sum_final

    gy, gx = np.mgrid[0:ny, 0:nx]
    gx = gx.ravel().astype(np.int64)
    gy = gy.ravel().astype(np.int64)
    lonc = lon0 + (gx + 0.5) * cell_deg
    latc = lat0 + (gy + 0.5) * cell_deg
    kx = np.cos(np.deg2rad(latc))
    inv2h2 = 1.0 / (2.0 * bandwidth_deg * bandwidth_deg)

    def partial(batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        dx = (lonc[None, :] - lon[:, None]) * kx[None, :]
        dy = latc[None, :] - lat[:, None]
        dens = np.exp(-(dx * dx + dy * dy) * inv2h2).sum(axis=0)
        return pa.table({
            "gx": pa.array(gx), "gy": pa.array(gy),
            "density": pa.array(dens, pa.float64()),
        })

    partials = indexed.map_batches(partial, batch_format="pyarrow")
    return sum_final(partials, ["gx", "gy"])


def boundary_crossings(
    points: ray.data.Dataset, poly: dict, num_shards: int = 64
) -> ray.data.Dataset:
    """Per-track count of PROPER intersections between the track's
    seq-consecutive segments and any polygon boundary edge (the
    ST_Crosses trajectory/boundary event-detection op: how many times
    does each GPS track cross an admin border).

    Proper crossing = the two segments strictly straddle each other:
    ``cross(B-A, C-A) * cross(B-A, D-A) < 0 AND cross(D-C, A-C) *
    cross(D-C, B-C) < 0`` in plain lon/lat coordinates — exact float
    twin of the SQL oracle; endpoint-touching / collinear overlap
    (measure-zero for the irrational fixture) does not count.

    Boundary edges (all rings, holes included) are a closure constant
    (~1k edges for the fixture; broadcast once per worker via task
    closure). Segments assemble per-SHARD (hash by track_id, sorted by
    seq) and the (segments x edges) orientation tests run as one
    vectorized block; only one row per track leaves the shard."""
    from engine.ops.relational import _sharded_by_key

    ax, ay, bx, by = [], [], [], []
    for i in range(len(poly["admin_id"])):
        rings = [(poly["ring_lon"][i], poly["ring_lat"][i])]
        rings += list(poly["holes"][i])
        for xs, ys in rings:
            xs = np.asarray(xs, np.float64)
            ys = np.asarray(ys, np.float64)
            ax.append(xs)
            ay.append(ys)
            bx.append(np.roll(xs, -1))
            by.append(np.roll(ys, -1))
    cx0 = np.concatenate(ax)
    cy0 = np.concatenate(ay)
    cx1 = np.concatenate(bx)
    cy1 = np.concatenate(by)
    evx = cx1 - cx0
    evy = cy1 - cy0

    def shard_tracks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        tid = g["track_id"].to_numpy()
        same = tid[1:] == tid[:-1]
        sax, say = lon[:-1][same], lat[:-1][same]
        sbx, sby = lon[1:][same], lat[1:][same]
        svx, svy = sbx - sax, sby - say
        # o1/o2: edge endpoints vs the segment's line; o3/o4: segment
        # endpoints vs the edge's line — (n_segs x n_edges) each
        o1 = (svx[:, None] * (cy0[None, :] - say[:, None])
              - svy[:, None] * (cx0[None, :] - sax[:, None]))
        o2 = (svx[:, None] * (cy1[None, :] - say[:, None])
              - svy[:, None] * (cx1[None, :] - sax[:, None]))
        o3 = (evx[None, :] * (say[:, None] - cy0[None, :])
              - evy[None, :] * (sax[:, None] - cx0[None, :]))
        o4 = (evx[None, :] * (sby[:, None] - cy0[None, :])
              - evy[None, :] * (sbx[:, None] - cx0[None, :]))
        hits = ((o1 * o2 < 0) & (o3 * o4 < 0)).sum(axis=1)
        seg = pd.DataFrame({"track_id": tid[1:][same],
                            "n_crossings": hits.astype(np.int64)})
        out = seg.groupby("track_id", as_index=False, sort=False).agg(
            n_segs=("n_crossings", "size"),
            n_crossings=("n_crossings", "sum"))
        return out[["track_id", "n_segs", "n_crossings"]]

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_tracks(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def dbscan(
    points: ray.data.Dataset,
    eps_m: float,
    min_pts: int,
    *,
    max_abs_lat: float = 80.0,
    small_broadcast_ids: int = 2_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed grid-based DBSCAN over (node:int64, lon, lat) rows
    with haversine-meter eps — the density-based spatial-clustering op
    (hotspot extraction over image geotags).

    Returns Dataset(node, cluster, is_core): ``cluster`` = min node id
    of the point's core component (classic DBSCAN up to the
    deterministic border tie-break: a border point within eps of
    SEVERAL clusters takes the smallest label, not the
    scan-order-dependent one), ``is_core`` 0/1, noise cluster = -1.

    Scale shape: points explode into their 3x3 grid neighborhood
    (cell edge sized so eps can never cross a non-adjacent cell —
    requires ``|lat| <= max_abs_lat``, validated per batch); ONE
    groupby(cell) co-locates every eps-ball, per-group vectorized
    haversine emits the (src, dst) eps-edge list; neighbor counts are
    a combiner groupby over edges. Core flags attach back to edges by
    broadcast set below ``small_broadcast_ids`` distinct ids, else by
    two hash equi-joins (the ``_verify_candidate_pairs`` discipline).
    Components run on ``connected_components_distributed``; the final
    label table is O(clustered points) — broadcast for the per-point
    assignment, the one documented small side."""
    import ray as _ray

    from engine.ops.dedup import connected_components_distributed
    from engine.ops.relational import partial_groupby_sum
    from engine.state import cached_get, default_partitions

    if num_partitions is None:
        num_partitions = default_partitions()
    if max_abs_lat >= 89.0:
        raise ValueError("dbscan grid cover needs max_abs_lat < 89")
    cos_w = float(np.cos(np.deg2rad(max_abs_lat)))
    cd = eps_m / (110_000.0 * cos_w)  # conservative deg/cell edge

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        lat = b["lat"].to_numpy(np.float64)
        if len(lat) and float(np.abs(lat).max()) > max_abs_lat:
            raise ValueError(
                f"dbscan: |lat| > max_abs_lat={max_abs_lat}; raise it "
                "(the grid cover guarantee is latitude-bounded)")
        lon = b["lon"].to_numpy(np.float64)
        cx = np.floor(lon / cd).astype(np.int64)
        cy = np.floor(lat / cd).astype(np.int64)
        n = len(b)
        off = np.array([-1, 0, 1], np.int64)
        ox = np.repeat(np.tile(off, 3), n)  # 9 copies per point
        oy = np.repeat(np.repeat(off, 3), n)
        cell = ((np.tile(cx, 9) + ox) * 4_294_967_296
                + (np.tile(cy, 9) + oy) + 2_147_483_648)
        return pd.DataFrame({
            "cell": cell,
            "node": np.tile(b["node"].to_numpy(np.int64), 9),
            "lon": np.tile(lon, 9), "lat": np.tile(lat, 9),
            "real": (ox == 0) & (oy == 0),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        real = g[g["real"]]
        if not len(real):
            return pd.DataFrame({
                "src": pd.Series(dtype=np.int64),
                "dst": pd.Series(dtype=np.int64)})
        d = knn_mod.haversine_m(
            real["lon"].to_numpy()[:, None],
            real["lat"].to_numpy()[:, None],
            g["lon"].to_numpy()[None, :],
            g["lat"].to_numpy()[None, :])
        si, di = np.nonzero(d <= eps_m)
        sn = real["node"].to_numpy(np.int64)[si]
        dn = g["node"].to_numpy(np.int64)[di]
        keep = sn != dn
        return pd.DataFrame({"src": sn[keep], "dst": dn[keep]})

    exploded = points.map_batches(explode, batch_format="pandas")
    edges = exploded.groupby("cell").map_groups(
        lambda g: pairs(g), batch_format="pandas").materialize()

    counts = partial_groupby_sum(
        edges, ["src"], {}, count_as="n_neigh").materialize()
    n_counted = counts.count()

    def core_only(b: pd.DataFrame) -> pd.DataFrame:
        # |N_eps| includes the point itself (scikit semantics)
        return b.loc[b["n_neigh"] + 1 >= min_pts, ["src"]].rename(
            columns={"src": "node"})

    core_ds = counts.map_batches(core_only, batch_format="pandas")

    if n_counted <= small_broadcast_ids:
        core_set = frozenset(
            core_ds.to_pandas()["node"].astype(np.int64))
        ref = _ray.put(core_set)

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            cs = cached_get(ref)
            b = b.copy()
            b["src_core"] = b["src"].isin(cs)
            b["dst_core"] = b["dst"].isin(cs)
            return b

        tagged = edges.map_batches(tag, batch_format="pandas")
    else:  # co-shuffle flag attach: two hash equi-joins
        def flagged(side: str):
            return core_ds.map_batches(
                lambda b, s=side: b.rename(columns={"node": s})
                .assign(**{f"{s}_core_j": True}),
                batch_format="pandas")

        tagged = edges.join(
            flagged("src"), join_type="left_outer", on=("src",),
            right_on=("src",), num_partitions=num_partitions,
        ).join(
            flagged("dst"), join_type="left_outer", on=("dst",),
            right_on=("dst",), num_partitions=num_partitions,
        ).map_batches(
            lambda b: b.assign(
                src_core=b["src_core_j"].fillna(False).astype(bool),
                dst_core=b["dst_core_j"].fillna(False).astype(bool),
            ).drop(columns=["src_core_j", "dst_core_j"]),
            batch_format="pandas")
    tagged = tagged.materialize()

    cc_edges = tagged.map_batches(
        lambda b: b.loc[b["src_core"] & b["dst_core"],
                        ["src", "dst"]].rename(
            columns={"src": "a", "dst": "b"}),
        batch_format="pandas")
    lab = connected_components_distributed(cc_edges)
    label_map = dict(zip(lab["node"].astype(np.int64),
                         lab["label"].astype(np.int64)))
    # singleton cores (no core-core edge) label themselves; the label
    # table is O(clustered points), the documented small side
    core_nodes = core_ds.to_pandas()["node"].astype(np.int64)
    for nd in core_nodes:
        label_map.setdefault(int(nd), int(nd))

    # border points: non-core src with a core dst -> min core label
    lref = _ray.put(label_map)

    def border_partial(b: pd.DataFrame) -> pd.DataFrame:
        lm = cached_get(lref)
        m = b.loc[~b["src_core"] & b["dst_core"], ["src", "dst"]]
        if not len(m):
            return pd.DataFrame({"src": pd.Series(dtype=np.int64),
                                 "cluster": pd.Series(dtype=np.int64)})
        lab_ = m["dst"].map(lm).astype(np.int64)
        out = pd.DataFrame({"src": m["src"].to_numpy(np.int64),
                            "cluster": lab_.to_numpy()})
        return out.groupby("src", as_index=False, sort=False).min()

    def border_final(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "src" not in b.columns:  # all-empty blocks lose schema
            return pd.DataFrame({"src": pd.Series(dtype=np.int64),
                                 "cluster": pd.Series(dtype=np.int64)})
        return b.groupby("src", as_index=False, sort=False).min()

    border = tagged.map_batches(
        border_partial, batch_format="pandas"
    ).repartition(1).map_batches(
        border_final, batch_format="pandas", batch_size=None).to_pandas()
    border_map = {} if "src" not in border.columns else dict(
        zip(border["src"].astype(np.int64),
            border["cluster"].astype(np.int64)))
    aref = _ray.put((frozenset(int(n) for n in core_nodes),
                     label_map, border_map))

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        cs, lm, bm = cached_get(aref)
        nodes = pd.Series(b["node"].to_numpy(np.int64))
        clus = nodes.map(lm)
        clus = clus.fillna(nodes.map(bm)).fillna(-1).astype(np.int64)
        return pd.DataFrame({
            "node": nodes.to_numpy(),
            "cluster": clus.to_numpy(),
            "is_core": nodes.isin(cs).to_numpy().astype(np.int64),
        })

    return points.map_batches(assign, batch_format="pandas")


def bbox_overlap_join(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    cell_deg: float = 1.0,
) -> ray.data.Dataset:
    """Rectangle-intersection spatial join (the FILTER stage of the
    classic filter-refine spatial join; ST_Intersects on envelopes):
    every (a_id, b_id) pair whose [minx,maxx]x[miny,maxy] boxes
    overlap, touching included. Both inputs carry columns
    (id, minx, miny, maxx, maxy); BOTH sides stream — neither
    broadcasts.

    Scale shape: each box explodes into every ``cell_deg`` grid cell
    it covers; ONE groupby(cell) co-locates candidates; the per-group
    (na x nb) interval test is vectorized. A pair overlapping many
    cells is emitted exactly once WITHOUT a distinct-shuffle: only the
    cell containing the intersection's min corner reports it (that
    corner lies in both boxes, so both sides are present in that
    group — the standard PBSM / owner-cell de-duplication rule).
    Grid skew follows box skew; pick ``cell_deg`` near the median box
    size so wide boxes fan out boundedly."""

    def explode(side: str):
        def fn(d: pd.DataFrame) -> pd.DataFrame:
            x0 = np.floor(d["minx"].to_numpy(np.float64) / cell_deg)
            x1 = np.floor(d["maxx"].to_numpy(np.float64) / cell_deg)
            y0 = np.floor(d["miny"].to_numpy(np.float64) / cell_deg)
            y1 = np.floor(d["maxy"].to_numpy(np.float64) / cell_deg)
            nx = (x1 - x0 + 1).astype(np.int64)
            ny = (y1 - y0 + 1).astype(np.int64)
            reps = nx * ny
            ri = np.repeat(np.arange(len(d)), reps)
            # per-copy (cx, cy) offsets, fully vectorized: k-th copy of
            # row i is (x0[i] + k // ny[i], y0[i] + k % ny[i])
            k = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
            cx = x0.astype(np.int64)[ri] + k // ny[ri]
            cy = y0.astype(np.int64)[ri] + k % ny[ri]
            out = d.iloc[ri].reset_index(drop=True)
            out["cell"] = cx * 4_294_967_296 + (cy + 2_147_483_648)
            out["side"] = side
            return out

        return fn

    # both sides share ONE schema (id, minx..maxy, cell, side) so the
    # union's blocks stay homogeneous for the groupby sort
    ea = a.map_batches(explode("a"), batch_format="pandas")
    eb = b.map_batches(explode("b"), batch_format="pandas")

    def join_cell(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a_id": pd.Series(dtype=object),
                              "b_id": pd.Series(dtype=object)})
        if "side" not in g.columns:
            return empty
        ga = g[g["side"] == "a"]
        gb = g[g["side"] == "b"]
        if not len(ga) or not len(gb):
            return empty
        ax0 = ga["minx"].to_numpy(np.float64)[:, None]
        ax1 = ga["maxx"].to_numpy(np.float64)[:, None]
        ay0 = ga["miny"].to_numpy(np.float64)[:, None]
        ay1 = ga["maxy"].to_numpy(np.float64)[:, None]
        bx0 = gb["minx"].to_numpy(np.float64)[None, :]
        bx1 = gb["maxx"].to_numpy(np.float64)[None, :]
        by0 = gb["miny"].to_numpy(np.float64)[None, :]
        by1 = gb["maxy"].to_numpy(np.float64)[None, :]
        hit = (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)
        # owner-cell rule: report only where the intersection's min
        # corner falls in THIS cell
        packed = np.int64(g["cell"].iloc[0])
        ocx = packed // 4_294_967_296
        ocy = packed % 4_294_967_296 - 2_147_483_648
        ix = np.maximum(ax0, bx0)
        iy = np.maximum(ay0, by0)
        hit &= (np.floor(ix / cell_deg) == ocx) \
            & (np.floor(iy / cell_deg) == ocy)
        ai, bi = np.nonzero(hit)
        return pd.DataFrame({
            "a_id": ga["id"].to_numpy()[ai],
            "b_id": gb["id"].to_numpy()[bi],
        })

    both = ea.union(eb)
    return both.groupby("cell").map_groups(
        join_cell, batch_format="pandas")


def _hull_ccw(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain convex hull, CCW vertex indices; strict
    turns, so collinear boundary points are excluded (matching the
    all-pairs strict-left SQL hull-edge rule)."""
    order = np.lexsort((y, x))

    def cross(o, a, b):
        return ((x[a] - x[o]) * (y[b] - y[o])
                - (y[a] - y[o]) * (x[b] - x[o]))

    def half(idx):
        h: list[int] = []
        for p in idx:
            while len(h) >= 2 and cross(h[-2], h[-1], p) <= 0:
                h.pop()
            h.append(p)
        return h

    if len(order) == 1:
        return order.astype(np.int64)
    lower = half(order)
    upper = half(order[::-1])
    # collinear inputs collapse to [first, last] automatically
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.int64)


def convex_hulls(
    points: ray.data.Dataset,
    group_key: str = "track_id",
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Per-group convex hull summary (ST_ConvexHull): hull vertex
    count and shoelace hull area in degree^2 for each group of
    (group_key, lon, lat) rows — e.g. the activity envelope of each
    GPS track or image cluster.

    Hash-shards by group (many groups per shard); the monotone chain
    runs per GROUP but each group is small by construction — the
    partitioning assumption is bounded per-group cardinality, same as
    every map_groups op here. Degenerate groups (<3 points or all
    collinear) report their chain length and area 0."""
    from engine.ops.relational import _sharded_by_key

    def shard_hulls(g: pd.DataFrame) -> pd.DataFrame:
        keys, counts, areas = [], [], []
        for key, sub in g.groupby(group_key, sort=False):
            x = sub["lon"].to_numpy(np.float64)
            y = sub["lat"].to_numpy(np.float64)
            h = _hull_ccw(x, y)
            keys.append(key)
            counts.append(len(h))
            if len(h) >= 3:
                hx, hy = x[h], y[h]
                areas.append(float(
                    (hx * np.roll(hy, -1) - np.roll(hx, -1) * hy).sum()
                    / 2.0))
            else:
                areas.append(0.0)
        return pd.DataFrame({
            group_key: keys,
            "n_hull": np.asarray(counts, np.int64),
            "hull_area": np.asarray(areas, np.float64),
        })

    sharded = _sharded_by_key(points, group_key, num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_hulls(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def trip_segments(
    points: ray.data.Dataset,
    jump_m: float,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Trajectory trip segmentation (sessionization in space): a track
    splits into a new trip wherever the haversine jump between
    seq-consecutive fixes exceeds ``jump_m`` — the GPS gap/teleport
    splitter. Returns one row per (track_id, trip_ix) with point count
    and within-trip polyline meters.

    Same per-SHARD vectorized discipline as ``track_stats``: the trip
    index is a cumulative sum of break flags (first-of-track counts as
    a break), computed with one cumsum + one repeat — no per-track
    dispatch."""
    from engine.ops.relational import _sharded_by_key

    def shard_trips(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        tid = g["track_id"].to_numpy()
        d = knn_mod.haversine_m(lon[:-1], lat[:-1], lon[1:], lat[1:])
        same = tid[1:] == tid[:-1]
        newtrip = np.r_[True, (~same) | (d > jump_m)]
        # within-trip segment contribution: a row's incoming distance
        # counts iff it did NOT open a new trip
        contrib = np.r_[0.0, np.where(newtrip[1:], 0.0, d)]
        cs = np.cumsum(newtrip)
        starts = np.flatnonzero(np.r_[True, ~same])
        lens = np.r_[starts[1:], len(g)] - starts
        trip_ix = cs - np.repeat(cs[starts], lens)  # 0-based per track
        out = pd.DataFrame({
            "track_id": tid, "trip_ix": trip_ix.astype(np.int64),
            "contrib": contrib,
        })
        agg = out.groupby(["track_id", "trip_ix"], as_index=False,
                          sort=False).agg(
            n_points=("contrib", "size"), trip_m=("contrib", "sum"))
        return agg[["track_id", "trip_ix", "n_points", "trip_m"]]

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_trips(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def phash_spread(
    images: ray.data.Dataset, num_shards: int = 64
) -> ray.data.Dataset:
    """Duplicate-image geo-consistency check: for every phash carried
    by >= 2 images, the copy count and the MAX pairwise haversine km
    between its locations — the "same picture uploaded for places
    1000 km apart" anomaly report.

    Hash-shards by phash; duplicate groups are tiny (planted-dup rate
    ~1%), so the per-shard self-merge materializes only the dup
    groups' pairs, all distance math in one vectorized call."""
    from engine.ops.relational import _sharded_by_key

    def shard_spread(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("phash", sort=False)["image_id"].size()
        kept = cnt[cnt >= 2]
        sub = g[g["phash"].isin(kept.index)]
        if not len(sub):
            return pd.DataFrame({
                "phash": pd.Series(dtype=g["phash"].dtype),
                "n": pd.Series(dtype=np.int64),
                "max_km": pd.Series(dtype=np.float64)})
        p = sub.merge(sub, on="phash", suffixes=("_a", "_b"))
        p = p[p["image_id_a"] < p["image_id_b"]]
        d = knn_mod.haversine_m(
            p["lon_a"].to_numpy(np.float64),
            p["lat_a"].to_numpy(np.float64),
            p["lon_b"].to_numpy(np.float64),
            p["lat_b"].to_numpy(np.float64))
        agg = (pd.DataFrame({"phash": p["phash"].to_numpy(),
                             "km": d / 1000.0})
               .groupby("phash", sort=False, as_index=False)["km"]
               .max().rename(columns={"km": "max_km"}))
        agg["n"] = agg["phash"].map(kept).astype(np.int64)
        return agg[["phash", "n", "max_km"]]

    sharded = _sharded_by_key(images, "phash", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_spread(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def trip_od_matrix(
    points: ray.data.Dataset,
    jump_m: float,
    res: int = 4,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Origin-destination matrix over segmented trips: count of trips
    from the H3-like cell of each trip's FIRST fix to the cell of its
    LAST fix (movement-flow analytics). Trip segmentation rule is
    identical to ``trip_segments`` (break when the inter-fix jump
    exceeds ``jump_m``; first-of-track breaks).

    Per-shard the trips collapse to one (o_cell, d_cell) partial row
    each, pre-aggregated per shard before the tiny final merge —
    only distinct OD pairs ever leave a shard."""
    from engine.ops.relational import _sharded_by_key, sum_final

    def shard_od(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        tid = g["track_id"].to_numpy()
        d = knn_mod.haversine_m(lon[:-1], lat[:-1], lon[1:], lat[1:])
        same = tid[1:] == tid[:-1]
        newtrip = np.r_[True, (~same) | (d > jump_m)]
        starts = np.flatnonzero(newtrip)
        ends = np.r_[starts[1:], len(g)] - 1
        o_cell = h3like.encode(lon[starts], lat[starts], res)
        d_cell = h3like.encode(lon[ends], lat[ends], res)
        out = pd.DataFrame({"o_cell": o_cell, "d_cell": d_cell})
        return out.groupby(["o_cell", "d_cell"], as_index=False,
                           sort=False).agg(
            n_trips=("o_cell", "size"))

    sharded = _sharded_by_key(points, "track_id", num_shards)
    partials = sharded.groupby("__shard").map_groups(
        lambda g: shard_od(g.drop(columns="__shard")),
        batch_format="pandas",
    )
    return sum_final(partials, ["o_cell", "d_cell"])


def track_medoids(
    points: ray.data.Dataset, num_shards: int = 64
) -> ray.data.Dataset:
    """Per-track medoid: the fix minimizing the SUM of haversine
    distances to every other fix of its track (the representative-
    point / geomedian-on-the-set op), with (sum, seq) ascending
    tie-break. Returns (track_id, medoid_seq, sum_km).

    Hash-shards by track; each track's full pairwise matrix is one
    vectorized call — the bounded-group-cardinality assumption shared
    by every map_groups op here (a 10^6-fix single track would need
    the sampled approximate variant instead)."""
    from engine.ops.relational import _sharded_by_key

    def shard_medoids(g: pd.DataFrame) -> pd.DataFrame:
        keys, seqs, sums = [], [], []
        for key, sub in g.groupby("track_id", sort=False):
            lon = sub["lon"].to_numpy(np.float64)
            lat = sub["lat"].to_numpy(np.float64)
            seq = sub["seq"].to_numpy(np.int64)
            d = knn_mod.haversine_m(
                lon[:, None], lat[:, None], lon[None, :], lat[None, :])
            s = d.sum(axis=1)
            best = np.lexsort((seq, s))[0]
            keys.append(key)
            seqs.append(seq[best])
            sums.append(s[best] / 1000.0)
        return pd.DataFrame({
            "track_id": keys,
            "medoid_seq": np.asarray(seqs, np.int64),
            "sum_km": np.asarray(sums, np.float64),
        })

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_medoids(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def resample_tracks(
    points: ray.data.Dataset,
    step_m: float,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Resample each track's polyline at a fixed arc-length step:
    emit an interpolated fix at path offsets 0, step, 2*step, ... < L
    (linear interpolation in lon/lat within a segment, segment length
    by haversine — the standard GPS equal-spacing resampler).
    Returns (track_id, k, lon, lat) with k the sample index.

    Per-shard: cumulative segment lengths once per track, then one
    searchsorted over all sample offsets — boundary rule is
    ``c_j <= s < c_j + d_j`` (side='right'), mirrored exactly by the
    SQL twin's inequality join."""
    from engine.ops.relational import _sharded_by_key

    def shard_resample(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        outs = []
        for key, sub in g.groupby("track_id", sort=False):
            lon = sub["lon"].to_numpy(np.float64)
            lat = sub["lat"].to_numpy(np.float64)
            if len(lon) < 2:
                outs.append(pd.DataFrame({
                    "track_id": [key], "k": np.zeros(1, np.int64),
                    "lon": lon[:1], "lat": lat[:1]}))
                continue
            d = knn_mod.haversine_m(lon[:-1], lat[:-1],
                                    lon[1:], lat[1:])
            ends = np.cumsum(d)
            total = ends[-1]
            ks = np.arange(int(np.floor(total / step_m)) + 1,
                           dtype=np.int64)
            s = ks.astype(np.float64) * step_m
            j = np.searchsorted(ends, s, side="right")
            j = np.minimum(j, len(d) - 1)  # s == total edge guard
            c0 = np.r_[0.0, ends[:-1]][j]
            t = (s - c0) / d[j]
            outs.append(pd.DataFrame({
                "track_id": key,
                "k": ks,
                "lon": lon[j] + t * (lon[j + 1] - lon[j]),
                "lat": lat[j] + t * (lat[j + 1] - lat[j]),
            }))
        return pd.concat(outs, ignore_index=True)

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_resample(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def morans_i_grid(
    indexed: ray.data.Dataset,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
) -> pd.DataFrame:
    """Global Moran's I spatial autocorrelation of per-grid-cell image
    counts (rook adjacency, binary weights) — the clustered-vs-random
    hotspot statistic: I = (N/S0) * sum_ij w_ij (x_i-xbar)(x_j-xbar)
    / sum_i (x_i-xbar)^2 over ALL nx*ny cells (empty cells count 0).

    The distributed stage is the per-cell count combiner (one partial
    row per nonzero cell per block); the statistic itself runs on the
    driver over the nx*ny cell table — the documented small side
    (288 cells here; a planetary grid at res where cells ~ cluster
    count would shard the shifted products instead)."""
    from engine.ops.relational import sum_final

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        flat = gx[ok] * ny + gy[ok]
        cnt = np.bincount(flat, minlength=nx * ny)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    partials = indexed.map_batches(cells, batch_format="pyarrow")
    counts = sum_final(partials, ["cell"]).to_pandas()
    x = np.zeros(nx * ny, np.float64)
    if len(counts) and "cell" in counts.columns:  # empty-input guard
        x[counts["cell"].to_numpy(np.int64)] = counts["n"].to_numpy()
    grid = x.reshape(nx, ny)
    xd = grid - x.mean()
    num = ((xd[1:, :] * xd[:-1, :]).sum() * 2.0
           + (xd[:, 1:] * xd[:, :-1]).sum() * 2.0)
    s0 = 2 * ((nx - 1) * ny + nx * (ny - 1))
    den = (xd * xd).sum()
    # den == 0 (all cell counts equal, e.g. empty input): defined 0.0,
    # matching the grouped_gini/cusum zero-variance convention
    moran = (nx * ny / float(s0)) * (num / den) if den > 0 else 0.0
    return pd.DataFrame({
        "n_cells": np.asarray([nx * ny], np.int64),
        "s0_pairs": np.asarray([s0], np.int64),
        "moran_i": np.asarray([moran], np.float64),
    })


def geary_c_grid(
    indexed: ray.data.Dataset,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
) -> pd.DataFrame:
    """Global Geary's C spatial autocorrelation of per-grid-cell image
    counts (rook adjacency, binary weights) — the squared-difference
    companion of ``morans_i_grid``: C = ((N-1)/(2*S0)) * sum_ij w_ij
    (x_i-x_j)^2 / sum_i (x_i-xbar)^2 over ALL nx*ny cells (empty
    cells count 0). C < 1 means positive autocorrelation (clustering,
    like the planted hotspot), C > 1 negative; unlike Moran's
    cross-product, Geary is sensitive to LOCAL differences and the
    pair (I, C) together distinguishes global trends from local
    patchiness.

    Identical scale shape to ``morans_i_grid``: the distributed stage
    is the per-cell count combiner (one partial row per nonzero cell
    per block); the statistic folds on the driver over the nx*ny cell
    table (288 cells — the documented small side; at a resolution
    where cells ~ cluster count the shifted squared diffs would shard
    instead)."""
    from engine.ops.relational import sum_final

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        flat = gx[ok] * ny + gy[ok]
        cnt = np.bincount(flat, minlength=nx * ny)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    partials = indexed.map_batches(cells, batch_format="pyarrow")
    counts = sum_final(partials, ["cell"]).to_pandas()
    x = np.zeros(nx * ny, np.float64)
    if len(counts) and "cell" in counts.columns:  # empty-input guard
        x[counts["cell"].to_numpy(np.int64)] = counts["n"].to_numpy()
    grid = x.reshape(nx, ny)
    xd = grid - x.mean()
    # ordered-pair sum of (x_i - x_j)^2 over rook neighbors = 2x the
    # undirected vertical + horizontal squared diffs
    num = (((grid[1:, :] - grid[:-1, :]) ** 2).sum() * 2.0
           + ((grid[:, 1:] - grid[:, :-1]) ** 2).sum() * 2.0)
    s0 = 2 * ((nx - 1) * ny + nx * (ny - 1))
    den = (xd * xd).sum()
    # den == 0 (all counts equal, e.g. empty input): defined 0.0,
    # matching the morans_i_grid/grouped_gini zero-variance convention
    geary = ((nx * ny - 1) / (2.0 * s0)) * (num / den) \
        if den > 0 else 0.0
    return pd.DataFrame({
        "n_cells": np.asarray([nx * ny], np.int64),
        "s0_pairs": np.asarray([s0], np.int64),
        "geary_c": np.asarray([geary], np.float64),
    })


def _simplify_open(
    x: np.ndarray, y: np.ndarray, epsilon: float
) -> np.ndarray:
    """Douglas-Peucker for an OPEN polyline (endpoints always kept),
    clamped SEGMENT distance like ``engine.geo.clip.simplify_ring``
    (the infinite-chord variant breaks the epsilon guarantee on
    concave spans). Returns kept indices, ascending."""
    n = len(x)
    if n <= 2 or epsilon <= 0.0:
        return np.arange(n, dtype=np.int64)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        sx, sy, ex, ey = x[i], y[i], x[j], y[j]
        px = x[i + 1:j]
        py = y[i + 1:j]
        dx, dy = ex - sx, ey - sy
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d2 = (px - sx) ** 2 + (py - sy) ** 2
        else:
            t = np.clip(((px - sx) * dx + (py - sy) * dy) / seg2,
                        0.0, 1.0)
            d2 = (px - (sx + t * dx)) ** 2 + (py - (sy + t * dy)) ** 2
        k = int(np.argmax(d2))
        if d2[k] > epsilon * epsilon:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return np.flatnonzero(keep).astype(np.int64)


def simplify_tracks(
    points: ray.data.Dataset,
    epsilon_deg: float,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Per-track Douglas-Peucker polyline simplification summary:
    input fix count, kept count, and the max planar-degree deviation
    of any DROPPED fix from the kept polyline (always <= epsilon —
    property-tested; the SQL twin walks DP's interval tree with a
    recursive CTE over a precomputed per-interval argmax table). The
    track-thinning step before rendering or cheap storage."""
    from engine.ops.relational import _sharded_by_key

    def shard_simplify(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, sub in g.groupby("track_id", sort=False):
            sub = sub.sort_values("seq", kind="stable")
            x = sub["lon"].to_numpy(np.float64)
            y = sub["lat"].to_numpy(np.float64)
            kept = _simplify_open(x, y, epsilon_deg)
            dropped = np.setdiff1d(
                np.arange(len(x), dtype=np.int64), kept)
            max_dev = 0.0
            if len(dropped):
                sx, sy = x[kept[:-1]], y[kept[:-1]]
                ex, ey = x[kept[1:]], y[kept[1:]]
                dx, dy = ex - sx, ey - sy
                seg2 = dx * dx + dy * dy
                px = x[dropped][:, None]
                py = y[dropped][:, None]
                with np.errstate(invalid="ignore", divide="ignore"):
                    t = ((px - sx[None, :]) * dx[None, :]
                         + (py - sy[None, :]) * dy[None, :]) / seg2
                t = np.clip(np.nan_to_num(t, nan=0.0), 0.0, 1.0)
                d2 = ((px - (sx[None, :] + t * dx[None, :])) ** 2
                      + (py - (sy[None, :] + t * dy[None, :])) ** 2)
                max_dev = float(np.sqrt(d2.min(axis=1)).max())
            rows.append((key, len(x), len(kept), max_dev))
        out = pd.DataFrame(rows, columns=[
            "track_id", "n_in", "n_kept", "max_dev_deg"])
        out["n_in"] = out["n_in"].astype(np.int64)
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_simplify(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def getis_ord_grid(
    indexed: ray.data.Dataset,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
) -> pd.DataFrame:
    """Getis-Ord Gi* local hotspot z-score per grid cell (rook
    adjacency INCLUDING self, binary weights) — the local counterpart
    of ``morans_i_grid``: which cells are significantly hot/cold, not
    just whether the surface clusters globally.

    Gi* = (sum_j w_ij x_j - xbar W_i)
          / (S sqrt((N W_i - W_i^2) / (N - 1)))
    with W_i = |neighbors(i) ∪ {i}|, xbar/S the global mean and
    population std over ALL N = nx*ny cells (empties count 0).

    Distributed stage: the per-cell count combiner (one partial row
    per nonzero cell per block); local sums run on the driver over the
    small nx*ny grid via padded shifts — the documented small side."""
    from engine.ops.relational import sum_final

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        flat = gx[ok] * ny + gy[ok]
        cnt = np.bincount(flat, minlength=nx * ny)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    partials = indexed.map_batches(cells, batch_format="pyarrow")
    counts = sum_final(partials, ["cell"]).to_pandas()
    x = np.zeros(nx * ny, np.float64)
    if len(counts) and "cell" in counts.columns:  # empty-input guard
        x[counts["cell"].to_numpy(np.int64)] = counts["n"].to_numpy()
    grid = x.reshape(nx, ny)
    n_cells = nx * ny
    xbar = grid.mean()
    s = float(np.sqrt((grid * grid).mean() - xbar * xbar))

    def shift_sum(a: np.ndarray) -> np.ndarray:
        p = np.pad(a, 1)  # zero border: missing neighbors contribute 0
        return (p[1:-1, 1:-1] + p[:-2, 1:-1] + p[2:, 1:-1]
                + p[1:-1, :-2] + p[1:-1, 2:])

    nbr_sum = shift_sum(grid)
    w = shift_sum(np.ones_like(grid))  # W_i = self + rook neighbors
    denom = s * np.sqrt((n_cells * w - w * w) / (n_cells - 1.0))
    # s == 0 (all counts equal, e.g. empty input): defined 0.0 rows,
    # matching morans_i_grid's zero-variance convention
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(denom > 0, (nbr_sum - xbar * w) / denom, 0.0)
    gxs, gys = np.divmod(np.arange(n_cells, dtype=np.int64), ny)
    return pd.DataFrame({
        "gx": gxs, "gy": gys,
        "n": grid.reshape(-1).astype(np.int64),
        "gi_z": z.reshape(-1),
    })


def speed_outliers(
    points: ray.data.Dataset,
    max_speed: float,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """GPS spike detection: per-track implied speed between
    seq-consecutive fixes (haversine meters per unit of ``seq``; the
    fixture has no timestamps, so seq is the clock). A segment faster
    than ``max_speed`` is a spike — the teleporting-fix cleaning pass
    every ingest of real GPS data needs before trajectory analytics.

    Returns one row per track: segment count, spike count, max
    implied speed. Hash-sharded by track_id, per-shard vectorized
    (same discipline as ``track_stats``)."""
    from engine.ops.relational import _sharded_by_key

    def shard_speeds(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        tid = g["track_id"].to_numpy()
        seq = g["seq"].to_numpy(np.float64)
        d = knn_mod.haversine_m(lon[:-1], lat[:-1], lon[1:], lat[1:])
        same = tid[1:] == tid[:-1]
        dt = seq[1:] - seq[:-1]
        sp = pd.DataFrame({
            "track_id": tid[1:][same],
            "v": d[same] / dt[same],
        })
        agg = sp.groupby("track_id", sort=False)["v"].agg(
            n_segs="size",
            n_spikes=lambda s: int((s > max_speed).sum()),
            max_speed_mps="max",
        ).reset_index()
        agg["n_segs"] = agg["n_segs"].astype(np.int64)
        agg["n_spikes"] = agg["n_spikes"].astype(np.int64)
        return agg[["track_id", "n_segs", "n_spikes", "max_speed_mps"]]

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_speeds(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def geofence_dwell(
    points: ray.data.Dataset, poly: dict, num_shards: int = 64
) -> ray.data.Dataset:
    """Geofence visit episodes: for every (track, admin polygon) pair,
    how many distinct VISITS the track made (maximal runs of
    seq-consecutive fixes inside the fence) and its total fix-dwell —
    the enter/exit event op of fleet/geofence analytics, composing the
    exact PIP containment with per-track run detection.

    Scale path: the polygon set broadcasts ONCE (``ray.put`` +
    ``cached_get``); fixes hash-shard by ``track_id`` so each track's
    run structure assembles locally. Per shard, containment pairs come
    from one ``contains_pairs`` call and episode starts are found with
    a vectorized previous-row key probe — no per-fix Python."""
    from engine.ops.relational import _sharded_by_key
    from engine.pipeline.join import build_polygon_set
    from engine.state import cached_get

    poly_ref = ray.put(build_polygon_set(poly))

    def shard_dwell(g: pd.DataFrame) -> pd.DataFrame:
        polys = cached_get(poly_ref)
        n_poly = len(polys)
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        tid = g["track_id"].to_numpy()
        first = np.r_[True, tid[1:] != tid[:-1]]
        p_idx, g_idx = polys.contains_pairs(lon, lat)
        if len(p_idx) == 0:
            return pd.DataFrame({
                "track_id": np.empty(0, tid.dtype),
                "admin_id": pd.Series([], dtype=str),
                "level": np.empty(0, np.int64),
                "n_episodes": np.empty(0, np.int64),
                "n_inside": np.empty(0, np.int64),
            })
        key = p_idx.astype(np.int64) * n_poly + g_idx
        prev_key = key - n_poly  # same polygon, previous shard row
        starts = first[p_idx] | ~np.isin(prev_key, key)
        out = pd.DataFrame({
            "track_id": tid[p_idx],
            "admin_id": polys.admin_ids[g_idx].astype(str),
            "level": polys.levels[g_idx].astype(np.int64),
            "st": starts.astype(np.int64),
        })
        agg = out.groupby(
            ["track_id", "admin_id", "level"], as_index=False, sort=False
        ).agg(n_episodes=("st", "sum"), n_inside=("st", "size"))
        agg["n_episodes"] = agg["n_episodes"].astype(np.int64)
        agg["n_inside"] = agg["n_inside"].astype(np.int64)
        return agg

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_dwell(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def _track_pair_explode(
    points: ray.data.Dataset, with_seq: bool = False
):
    """Shared candidate machinery of the pairwise-track similarity
    ops (``track_hausdorff`` / ``track_frechet``): distributed
    per-track bbox combiner, driver-side sort/sweep overlap pairing
    (the sweep's output is EXACTLY the x-and-y bbox-overlap pair set,
    a < b — sortedness makes the second x test redundant), membership
    arrays broadcast once via ``ray.put``, and the explode that fans
    each fix to its track's candidate pairs as (pair, side, lon, lat
    [, seq]) rows. ``with_seq`` carries the fix order for
    sequence-aware metrics (Frechet); Hausdorff omits it to keep the
    exchanged rows minimal. Returns (exploded Dataset, mem_ref whose
    payload ends with (pair_a, pair_b))."""

    def bbox_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "track_id": np.asarray(b["track_id"]),
            "minx": np.asarray(b["lon"], np.float64),
            "miny": np.asarray(b["lat"], np.float64),
        })
        df["maxx"] = df["minx"]
        df["maxy"] = df["miny"]
        agg = df.groupby("track_id", as_index=False, sort=False).agg(
            minx=("minx", "min"), miny=("miny", "min"),
            maxx=("maxx", "max"), maxy=("maxy", "max"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    bb = (points.map_batches(bbox_partial, batch_format="pyarrow")
          .to_pandas()
          .groupby("track_id", as_index=False, sort=True)
          .agg(minx=("minx", "min"), miny=("miny", "min"),
               maxx=("maxx", "max"), maxy=("maxy", "max")))
    tid = bb["track_id"].to_numpy()
    # sparse candidate pairing by sort/sweep on the x intervals (the
    # round-2 ADVICE: the dense T x T overlap matrix is quadratic
    # driver memory at the multi-node target): sorted by minx, track i
    # can only x-overlap the following tracks up to the first with
    # minx > maxx[i]; the y test then filters the sweep output
    order = np.argsort(bb["minx"].to_numpy(), kind="stable")
    tid_s = tid[order]
    minx = bb["minx"].to_numpy()[order]
    maxx = bb["maxx"].to_numpy()[order]
    miny = bb["miny"].to_numpy()[order]
    maxy = bb["maxy"].to_numpy()[order]
    t_n = len(tid_s)
    ends = np.searchsorted(minx, maxx, side="right")
    counts = np.maximum(ends - np.arange(t_n) - 1, 0)
    total = int(counts.sum())
    ii = np.repeat(np.arange(t_n, dtype=np.int64), counts)
    rs = np.zeros(t_n, np.int64)
    if t_n:
        np.cumsum(counts[:-1], out=rs[1:])
    seq = np.arange(total, dtype=np.int64) - np.repeat(rs, counts)
    jj = ii + 1 + seq
    ok = (miny[ii] <= maxy[jj]) & (miny[jj] <= maxy[ii])
    ta, tb = tid_s[ii[ok]], tid_s[jj[ok]]
    pair_a = np.minimum(ta, tb)
    pair_b = np.maximum(ta, tb)
    # track -> (pair_id, side) membership as sorted ARRAYS, broadcast
    # ONCE via ray.put (the explode UDF used to closure-capture a
    # Python dict, re-pickled per task)
    n_pairs = len(pair_a)
    mt = np.concatenate([pair_a, pair_b])
    mp = np.concatenate([np.arange(n_pairs, dtype=np.int64)] * 2)
    ms = np.concatenate([np.zeros(n_pairs, np.int64),
                         np.ones(n_pairs, np.int64)])
    mo = np.argsort(mt, kind="stable")
    mem_ref = ray.put((mt[mo], mp[mo], ms[mo], pair_a, pair_b))

    def explode(d: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        mt_, mp_, ms_, _, _ = cached_get(mem_ref)
        outs = []
        for t, sub in d.groupby("track_id", sort=False):
            lo = np.searchsorted(mt_, t, side="left")
            hi = np.searchsorted(mt_, t, side="right")
            if hi == lo:
                continue
            pids, sides = mp_[lo:hi], ms_[lo:hi]
            n, k = len(sub), hi - lo
            cols = {
                "pair": np.repeat(pids, n),
                "side": np.repeat(sides, n),
                "lon": np.tile(sub["lon"].to_numpy(np.float64), k),
                "lat": np.tile(sub["lat"].to_numpy(np.float64), k),
            }
            if with_seq:
                cols["seq"] = np.tile(
                    sub["seq"].to_numpy(np.int64), k)
            outs.append(pd.DataFrame(cols))
        if not outs:
            empty = {
                "pair": np.empty(0, np.int64),
                "side": np.empty(0, np.int64),
                "lon": np.empty(0, np.float64),
                "lat": np.empty(0, np.float64)}
            if with_seq:
                empty["seq"] = np.empty(0, np.int64)
            return pd.DataFrame(empty)
        return pd.concat(outs, ignore_index=True)

    return points.map_batches(explode, batch_format="pandas"), mem_ref


def track_hausdorff(
    points: ray.data.Dataset,
) -> ray.data.Dataset:
    """Pairwise discrete Hausdorff distance between tracks whose
    bounding boxes overlap — the track-similarity matrix behind
    route-matching and near-duplicate-trajectory detection:
    H(A,B) = max(max_a min_b d(a,b), max_b min_a d(a,b)) in haversine
    meters, over candidate pairs from the bbox FILTER stage.

    Scale shape: per-track bboxes come from a distributed min/max
    combiner (one partial per track per block); the bbox table is the
    documented small side (O(#tracks)), so candidate pairing runs on
    the driver (``_track_pair_explode``). Fixes then flat_map one copy
    per candidate pair of their track and ONE groupby(pair) co-locates
    both tracks; the per-pair (na x nb) distance matrix is a single
    vectorized call."""
    exploded, mem_ref = _track_pair_explode(points)

    def pair_h(g: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        _, _, _, pair_a_, pair_b_ = cached_get(mem_ref)
        pid = int(g["pair"].iloc[0])
        a = g[g["side"] == 0]
        b = g[g["side"] == 1]
        d = knn_mod.haversine_m(
            a["lon"].to_numpy()[:, None], a["lat"].to_numpy()[:, None],
            b["lon"].to_numpy()[None, :], b["lat"].to_numpy()[None, :])
        h = max(float(d.min(axis=1).max()), float(d.min(axis=0).max()))
        return pd.DataFrame({
            "track_a": [pair_a_[pid]], "track_b": [pair_b_[pid]],
            "hausdorff_m": [h],
        })

    return exploded.groupby("pair").map_groups(
        pair_h, batch_format="pandas")


def track_frechet(
    points: ray.data.Dataset,
) -> ray.data.Dataset:
    """Pairwise DISCRETE FRECHET distance between tracks whose
    bounding boxes overlap — the order-aware companion of
    ``track_hausdorff`` (two tracks tracing the same loop in opposite
    directions are Hausdorff-identical but Frechet-far): the classic
    coupling recurrence ca[i,j] = max(d[i,j], min(ca[i-1,j],
    ca[i,j-1], ca[i-1,j-1])) over seq-ordered fixes, haversine meters.

    Same scale shape as Hausdorff (shared ``_track_pair_explode``
    machinery, one groupby(pair) co-shuffle); per pair the haversine
    matrix is one vectorized call, the DP fill is the unavoidable
    sequential recurrence — row-sliced numpy with a Python loop only
    over DP cells of ONE pair inside its own group task (bounded by
    track length squared, not by dataset size). The SQL twin walks the
    same recurrence as an anti-diagonal wavefront recursion."""
    exploded, mem_ref = _track_pair_explode(points, with_seq=True)

    def pair_f(g: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        _, _, _, pair_a_, pair_b_ = cached_get(mem_ref)
        pid = int(g["pair"].iloc[0])
        a = g[g["side"] == 0].sort_values("seq", kind="stable")
        b = g[g["side"] == 1].sort_values("seq", kind="stable")
        d = knn_mod.haversine_m(
            a["lon"].to_numpy()[:, None], a["lat"].to_numpy()[:, None],
            b["lon"].to_numpy()[None, :], b["lat"].to_numpy()[None, :])
        na, nb = d.shape
        ca = np.empty((na, nb), np.float64)
        ca[0, :] = np.maximum.accumulate(d[0, :])
        ca[1:, 0] = np.maximum.accumulate(d[1:, 0])
        ca[1:, 0] = np.maximum(ca[1:, 0], ca[0, 0])
        for i in range(1, na):
            ci, cp, di = ca[i], ca[i - 1], d[i]
            for j in range(1, nb):
                ci[j] = max(di[j],
                            min(cp[j], ci[j - 1], cp[j - 1]))
        return pd.DataFrame({
            "track_a": [pair_a_[pid]], "track_b": [pair_b_[pid]],
            "frechet_m": [float(ca[na - 1, nb - 1])],
        })

    return exploded.groupby("pair").map_groups(
        pair_f, batch_format="pandas")


def track_dtw(
    points: ray.data.Dataset,
) -> ray.data.Dataset:
    """Pairwise DTW (dynamic time warping) distance between tracks
    whose bounding boxes overlap — the elastic TOTAL-cost alignment
    companion of ``track_frechet``'s bottleneck max: dtw[i,j] = d[i,j]
    + min(dtw[i-1,j], dtw[i,j-1], dtw[i-1,j-1]) over seq-ordered
    fixes, haversine meters; DTW tolerates local speed variation two
    same-route tracks always show, which makes it the standard
    trajectory-clustering metric where Frechet is the worst-case
    guarantee.

    Same scale shape as Frechet (shared ``_track_pair_explode``
    machinery, one groupby(pair) co-shuffle; DP bounded by one pair's
    track lengths inside its own group task). The SQL twin walks the
    identical recurrence as an anti-diagonal wavefront recursion, so
    every float op happens in the same order on both sides."""
    exploded, mem_ref = _track_pair_explode(points, with_seq=True)

    def pair_dtw(g: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        _, _, _, pair_a_, pair_b_ = cached_get(mem_ref)
        pid = int(g["pair"].iloc[0])
        a = g[g["side"] == 0].sort_values("seq", kind="stable")
        b = g[g["side"] == 1].sort_values("seq", kind="stable")
        d = knn_mod.haversine_m(
            a["lon"].to_numpy()[:, None], a["lat"].to_numpy()[:, None],
            b["lon"].to_numpy()[None, :], b["lat"].to_numpy()[None, :])
        na, nb = d.shape
        ca = np.empty((na, nb), np.float64)
        ca[0, :] = np.cumsum(d[0, :])
        ca[:, 0] = np.cumsum(d[:, 0])
        for i in range(1, na):
            ci, cp, di = ca[i], ca[i - 1], d[i]
            for j in range(1, nb):
                ci[j] = di[j] + min(cp[j], ci[j - 1], cp[j - 1])
        return pd.DataFrame({
            "track_a": [pair_a_[pid]], "track_b": [pair_b_[pid]],
            "dtw_m": [float(ca[na - 1, nb - 1])],
        })

    return exploded.groupby("pair").map_groups(
        pair_dtw, batch_format="pandas")


def ripley_k(
    points: ray.data.Dataset,
    radii_m: list[float],
    *,
    max_abs_lat: float = 80.0,
) -> pd.DataFrame:
    """Ripley's K point-pattern statistic: for each radius r, the
    exact count of unordered point pairs within haversine distance r,
    plus the pair fraction 2*n_pairs/(n*(n-1)) — the
    clustered/random/dispersed diagnostic over image geotags at
    multiple scales (the multi-scale companion of ``morans_i_grid``).

    Scale shape (both-big, no broadcast): points explode into their
    3x3 grid neighborhood with the cell edge sized to the LARGEST
    radius (same latitude-bounded cover guarantee as ``dbscan``); one
    groupby(cell) co-locates every candidate pair; per group a single
    vectorized (real x all) haversine matrix counts pairs once under
    the owner rule (count only at the smaller node's home cell, via
    node_b > node_a) and emits one partial row per radius. Only
    |radii|-sized partials leave each group."""
    from engine.geo.knn import haversine_m
    from engine.ops.relational import sum_final

    radii = sorted(float(r) for r in radii_m)
    rmax = radii[-1]
    if max_abs_lat >= 89.0:
        raise ValueError("ripley_k grid cover needs max_abs_lat < 89")
    cos_w = float(np.cos(np.deg2rad(max_abs_lat)))
    cd = rmax / (110_000.0 * cos_w)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        lat = b["lat"].to_numpy(np.float64)
        if len(lat) and float(np.abs(lat).max()) > max_abs_lat:
            raise ValueError(
                f"ripley_k: |lat| > max_abs_lat={max_abs_lat}")
        lon = b["lon"].to_numpy(np.float64)
        cx = np.floor(lon / cd).astype(np.int64)
        cy = np.floor(lat / cd).astype(np.int64)
        n = len(b)
        off = np.array([-1, 0, 1], np.int64)
        ox = np.repeat(np.tile(off, 3), n)
        oy = np.repeat(np.repeat(off, 3), n)
        return pd.DataFrame({
            "cell": ((np.tile(cx, 9) + ox) * 4_294_967_296
                     + (np.tile(cy, 9) + oy) + 2_147_483_648),
            "node": np.tile(b["node"].to_numpy(np.int64), 9),
            "lon": np.tile(lon, 9), "lat": np.tile(lat, 9),
            "real": (ox == 0) & (oy == 0),
        })

    def group_counts(g: pd.DataFrame) -> pd.DataFrame:
        real = g[g["real"]]
        if len(real) == 0:
            return pd.DataFrame({
                "r_ix": np.empty(0, np.int64),
                "n": np.empty(0, np.int64)})
        d = haversine_m(
            real["lon"].to_numpy()[:, None],
            real["lat"].to_numpy()[:, None],
            g["lon"].to_numpy()[None, :],
            g["lat"].to_numpy()[None, :])
        newer = (g["node"].to_numpy()[None, :]
                 > real["node"].to_numpy()[:, None])
        rix = [len(radii)]  # sentinel row: real-point count
        cnt = [len(real)]
        for k, r in enumerate(radii):
            rix.append(k)
            cnt.append(int(((d <= r) & newer).sum()))
        return pd.DataFrame({"r_ix": np.asarray(rix, np.int64),
                             "n": np.asarray(cnt, np.int64)})

    exploded = points.map_batches(explode, batch_format="pandas")
    partials = exploded.groupby("cell").map_groups(
        group_counts, batch_format="pandas")
    tot = sum_final(partials, ["r_ix"]).to_pandas()
    tot = (tot.set_index("r_ix")["n"] if len(tot)
           else pd.Series(dtype=np.int64))
    # empty / single-point input: defined 0-pair rows (no KeyError,
    # no 0/0), matching the zero-variance convention of the grid stats
    n_pts = int(tot.get(len(radii), 0))
    n_pairs = np.array([int(tot.get(k, 0)) for k in range(len(radii))],
                       np.int64)
    denom = n_pts * (n_pts - 1.0)
    pair_frac = (2.0 * n_pairs / denom if denom > 0
                 else np.zeros(len(radii), np.float64))
    return pd.DataFrame({
        "r_m": np.asarray(radii, np.float64),
        "n_pairs": n_pairs,
        "pair_frac": pair_frac,
    })


def stay_points(
    points: ray.data.Dataset,
    dist_m: float,
    min_fixes: int,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Stay-point detection (the Li/Zheng GPS-trajectory algorithm):
    greedily scan each track in seq order; a stay is a maximal run of
    >= ``min_fixes`` consecutive fixes all within ``dist_m`` of the
    run's FIRST fix (the anchor); after emitting a stay the scan
    resumes at the first fix outside it. Emits one row per stay with
    its fix span and centroid — the dwell-location extraction that
    feeds POI mining.

    Greedy anchor advance is sequential per track, but each anchor's
    step is a pure function of position, so the SQL twin follows
    precomputed next-pointers with a recursive CTE; the pytest
    self-oracle is a brute-force single-process reference. Tracks
    hash-shard by ``track_id``; the
    per-anchor distance test is one vectorized haversine slice, so the
    scan is O(stays + fixes) anchor steps, not O(n^2) Python."""
    from engine.ops.relational import _sharded_by_key

    def shard_stays(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for tid, sub in g.groupby("track_id", sort=False):
            sub = sub.sort_values("seq", kind="stable")
            lon = sub["lon"].to_numpy(np.float64)
            lat = sub["lat"].to_numpy(np.float64)
            seq = sub["seq"].to_numpy(np.int64)
            n, i, k = len(sub), 0, 0
            while i < n:
                d = knn_mod.haversine_m(lon[i], lat[i], lon[i:], lat[i:])
                far = np.flatnonzero(d > dist_m)
                j = i + (int(far[0]) if len(far) else n - i)  # run end
                if j - i >= min_fixes:
                    rows.append((tid, k, int(seq[i]), int(seq[j - 1]),
                                 j - i, float(lon[i:j].mean()),
                                 float(lat[i:j].mean())))
                    k += 1
                    i = j
                else:
                    i += 1
        return pd.DataFrame(rows, columns=[
            "track_id", "stay_ix", "start_seq", "end_seq",
            "n_fixes", "c_lon", "c_lat",
        ]).astype({"stay_ix": np.int64, "start_seq": np.int64,
                   "end_seq": np.int64, "n_fixes": np.int64})

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_stays(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def bearing_rose(
    points: ray.data.Dataset, num_shards: int = 64
) -> ray.data.Dataset:
    """Per-track compass rose: segment counts by 45-degree bearing
    sector (0 = north up to <45, ... 7 = NW) over seq-consecutive
    great-circle bearings — the heading-distribution profile of
    movement analytics. Hash-sharded by track, fully vectorized;
    SQL twin recomputes the identical atan2 bearing and sector."""
    from engine.ops.relational import _sharded_by_key

    def shard_rose(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lon = np.deg2rad(g["lon"].to_numpy(np.float64))
        lat = np.deg2rad(g["lat"].to_numpy(np.float64))
        tid = g["track_id"].to_numpy()
        same = tid[1:] == tid[:-1]
        dl = (lon[1:] - lon[:-1])[same]
        la, lb = lat[:-1][same], lat[1:][same]
        theta = np.arctan2(
            np.sin(dl) * np.cos(lb),
            np.cos(la) * np.sin(lb) - np.sin(la) * np.cos(lb) * np.cos(dl))
        deg = (np.rad2deg(theta) + 360.0) % 360.0
        sector = np.minimum((deg / 45.0).astype(np.int64), 7)
        out = pd.DataFrame({"track_id": tid[1:][same],
                            "sector": sector})
        agg = out.groupby(["track_id", "sector"], as_index=False,
                          sort=False).size()
        agg = agg.rename(columns={"size": "n_segs"})
        agg["n_segs"] = agg["n_segs"].astype(np.int64)
        return agg

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_rose(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def track_self_intersections(
    points: ray.data.Dataset, num_shards: int = 64
) -> ray.data.Dataset:
    """Per-track count of PROPER self-intersections: pairs of
    NON-ADJACENT segments (j > i + 1) of the same track that strictly
    straddle each other (same orientation sign tests as
    ``boundary_crossings``) — the trajectory-quality / loop-detection
    metric. Per-track (n_segs x n_segs) vectorized orientation
    matrix; hash-sharded by track."""
    from engine.ops.relational import _sharded_by_key

    def shard_self(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for tid, sub in g.groupby("track_id", sort=False):
            sub = sub.sort_values("seq", kind="stable")
            x = sub["lon"].to_numpy(np.float64)
            y = sub["lat"].to_numpy(np.float64)
            m = len(x) - 1  # segments
            if m < 3:
                rows.append((tid, max(m, 0), 0))
                continue
            ax, ay = x[:-1], y[:-1]
            vx, vy = x[1:] - ax, y[1:] - ay
            o1 = (vx[:, None] * (ay[None, :] - ay[:, None])
                  - vy[:, None] * (ax[None, :] - ax[:, None]))
            o2 = (vx[:, None] * (ay[None, :] + vy[None, :] - ay[:, None])
                  - vy[:, None] * (ax[None, :] + vx[None, :] - ax[:, None]))
            c = o1 * o2 < 0  # j's endpoints straddle i's line
            cross = c & c.T  # ... and i's endpoints straddle j's
            ii, jj = np.triu_indices(m, k=2)
            rows.append((tid, m, int(cross[ii, jj].sum())))
        return pd.DataFrame(rows, columns=[
            "track_id", "n_segs", "n_self_x",
        ]).astype({"n_segs": np.int64, "n_self_x": np.int64})

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_self(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def line_density_grid(
    points: ray.data.Dataset,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Line-density raster: per grid cell, the number of track
    SEGMENTS (seq-consecutive fix pairs) whose planar lon/lat chord
    intersects the cell — the GPS route-heatmap op (vector-to-raster
    for polylines, where ``kde_heatmap`` rasters points).

    Per shard: segments assemble ordered (hash by track), each segment
    enumerates only its bbox's candidate cell rectangle, and one
    vectorized Liang-Barsky slab test keeps real intersections; only
    (cell, n) combiner partials leave the shard. The SQL twin runs the
    identical slab test as an inequality join against the cell grid."""
    from engine.ops.relational import _sharded_by_key, sum_final

    def shard_cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        tid = g["track_id"].to_numpy()
        same = tid[1:] == tid[:-1]
        x0, y0 = lon[:-1][same], lat[:-1][same]
        x1, y1 = lon[1:][same], lat[1:][same]
        # candidate cell ranges from each segment's bbox, clipped
        cx0 = np.clip(np.floor((np.minimum(x0, x1) - lon0)
                               / cell_deg), 0, nx - 1).astype(np.int64)
        cx1 = np.clip(np.floor((np.maximum(x0, x1) - lon0)
                               / cell_deg), 0, nx - 1).astype(np.int64)
        cy0 = np.clip(np.floor((np.minimum(y0, y1) - lat0)
                               / cell_deg), 0, ny - 1).astype(np.int64)
        cy1 = np.clip(np.floor((np.maximum(y0, y1) - lat0)
                               / cell_deg), 0, ny - 1).astype(np.int64)
        ncell = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        seg_ix = np.repeat(np.arange(len(x0)), ncell)
        # local cell offset within each segment's rectangle
        local = np.arange(len(seg_ix)) - np.repeat(
            np.cumsum(ncell) - ncell, ncell)
        w = (cy1 - cy0 + 1)[seg_ix]
        gx = cx0[seg_ix] + local // w
        gy = cy0[seg_ix] + local % w
        # Liang-Barsky: param interval of the segment inside the slab
        ax0 = lon0 + gx * cell_deg
        ay0 = lat0 + gy * cell_deg
        sx, sy = x0[seg_ix], y0[seg_ix]
        dx = (x1 - x0)[seg_ix]
        dy = (y1 - y0)[seg_ix]
        with np.errstate(divide="ignore", invalid="ignore"):
            txa = (ax0 - sx) / dx
            txb = (ax0 + cell_deg - sx) / dx
            tya = (ay0 - sy) / dy
            tyb = (ay0 + cell_deg - sy) / dy
        tx_in = np.minimum(txa, txb)
        tx_out = np.maximum(txa, txb)
        ty_in = np.minimum(tya, tyb)
        ty_out = np.maximum(tya, tyb)
        # degenerate axes: inside the slab -> (-inf, +inf), else empty
        zx = dx == 0.0
        in_x = (sx >= ax0) & (sx <= ax0 + cell_deg)
        tx_in = np.where(zx, np.where(in_x, -np.inf, np.inf), tx_in)
        tx_out = np.where(zx, np.where(in_x, np.inf, -np.inf), tx_out)
        zy = dy == 0.0
        in_y = (sy >= ay0) & (sy <= ay0 + cell_deg)
        ty_in = np.where(zy, np.where(in_y, -np.inf, np.inf), ty_in)
        ty_out = np.where(zy, np.where(in_y, np.inf, -np.inf), ty_out)
        tmin = np.maximum(np.maximum(tx_in, ty_in), 0.0)
        tmax = np.minimum(np.minimum(tx_out, ty_out), 1.0)
        hit = tmin <= tmax
        out = pd.DataFrame({"gx": gx[hit], "gy": gy[hit]})
        agg = out.groupby(["gx", "gy"], as_index=False,
                          sort=False).size()
        agg = agg.rename(columns={"size": "n_segments"})
        agg["n_segments"] = agg["n_segments"].astype(np.int64)
        return agg

    sharded = _sharded_by_key(points, "track_id", num_shards)
    partials = sharded.groupby("__shard").map_groups(
        lambda g: shard_cells(g.drop(columns="__shard")),
        batch_format="pandas",
    )
    return sum_final(partials, ["gx", "gy"])


def _welzl_circle(x: np.ndarray, y: np.ndarray):
    """Deterministic smallest enclosing circle (planar degrees):
    incremental Welzl without randomization — input order is the
    (deterministic) insertion order. O(n) expected on shuffled input,
    O(n^2)-ish worst case; tracks are small, so determinism wins."""

    def circ2(ax, ay, bx, by):
        return ((ax + bx) / 2.0, (ay + by) / 2.0,
                np.hypot(ax - bx, ay - by) / 2.0)

    def circ3(ax, ay, bx, by, cx, cy):
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if d == 0.0:
            return None
        ux = ((ax * ax + ay * ay) * (by - cy)
              + (bx * bx + by * by) * (cy - ay)
              + (cx * cx + cy * cy) * (ay - by)) / d
        uy = ((ax * ax + ay * ay) * (cx - bx)
              + (bx * bx + by * by) * (ax - cx)
              + (cx * cx + cy * cy) * (bx - ax)) / d
        return ux, uy, np.hypot(ax - ux, ay - uy)

    def inside(c, px, py):
        return np.hypot(px - c[0], py - c[1]) <= c[2] * (1 + 1e-12)

    n = len(x)
    c = (x[0], y[0], 0.0)
    for i in range(1, n):
        if inside(c, x[i], y[i]):
            continue
        c = (x[i], y[i], 0.0)
        for j in range(i):
            if inside(c, x[j], y[j]):
                continue
            c = circ2(x[i], y[i], x[j], y[j])
            for k in range(j):
                if inside(c, x[k], y[k]):
                    continue
                c3 = circ3(x[i], y[i], x[j], y[j], x[k], y[k])
                if c3 is not None:
                    c = c3
    return c


def enclosing_circles(
    points: ray.data.Dataset, num_shards: int = 64
) -> ray.data.Dataset:
    """Per-track smallest enclosing circle (Welzl) in planar degrees:
    center, radius, and the fix count — the minimal-coverage-disk
    summary (antenna placement / track-extent analytics). The SQL
    twin brute-forces all 2-/3-point support circles; the pytest
    self-oracle checks containment of every fix and minimality the
    same way."""
    from engine.ops.relational import _sharded_by_key

    def shard_circles(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for tid, sub in g.groupby("track_id", sort=False):
            sub = sub.sort_values("seq", kind="stable")
            cx, cy, r = _welzl_circle(
                sub["lon"].to_numpy(np.float64),
                sub["lat"].to_numpy(np.float64))
            rows.append((tid, len(sub), float(cx), float(cy),
                         float(r)))
        return pd.DataFrame(rows, columns=[
            "track_id", "n_fixes", "c_lon", "c_lat", "radius_deg",
        ]).astype({"n_fixes": np.int64})

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_circles(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def flow_field_grid(
    points: ray.data.Dataset,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Movement vector field: per grid cell, the mean displacement
    (dlon, dlat in degrees) of track segments STARTING in the cell
    plus the segment count — the aggregate flow-direction raster of
    movement analytics (wind-map rendering of GPS traffic).

    Per-shard segment assembly (hash by track), then one (cell ->
    sum dlon, sum dlat, n) combiner; ``sum_final`` merges. The SQL
    twin recomputes the LAG displacements and cell floors."""
    from engine.ops.relational import _sharded_by_key, sum_final

    def shard_flow(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        tid = g["track_id"].to_numpy()
        same = tid[1:] == tid[:-1]
        x0, y0 = lon[:-1][same], lat[:-1][same]
        dx = (lon[1:] - lon[:-1])[same]
        dy = (lat[1:] - lat[:-1])[same]
        gx = np.floor((x0 - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((y0 - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        out = pd.DataFrame({
            "gx": gx[ok], "gy": gy[ok],
            "sum_dlon": dx[ok], "sum_dlat": dy[ok],
        })
        agg = out.groupby(["gx", "gy"], as_index=False, sort=False
                          ).agg(sum_dlon=("sum_dlon", "sum"),
                                sum_dlat=("sum_dlat", "sum"),
                                n_segments=("sum_dlon", "size"))
        agg["n_segments"] = agg["n_segments"].astype(np.int64)
        return agg

    sharded = _sharded_by_key(points, "track_id", num_shards)
    partials = sharded.groupby("__shard").map_groups(
        lambda g: shard_flow(g.drop(columns="__shard")),
        batch_format="pandas",
    )
    return sum_final(partials, ["gx", "gy"])


def visit_entropy_grid(
    points: ray.data.Dataset,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
) -> ray.data.Dataset:
    """Per-cell visitor-diversity raster: Shannon entropy (nats) of
    the distribution of fixes over TRACKS within each grid cell, plus
    distinct-track and fix counts — low entropy = a cell dominated by
    one commuter, high = shared public space (the mobility-privacy /
    popularity diagnostic).

    Stage 1 is a (cell, track) count combiner — the only shuffle
    moves one partial row per (cell, track) per block; stage 2 groups
    the SMALL (cells x visiting tracks) table per cell and computes
    the entropy vectorized."""
    from engine.ops.relational import sum_final

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        tid = np.asarray(b["track_id"], dtype=np.int64)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        df = pd.DataFrame({"gx": gx[ok], "gy": gy[ok],
                           "track_id": tid[ok]})
        agg = df.groupby(["gx", "gy", "track_id"], as_index=False,
                         sort=False).size()
        agg = agg.rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = points.map_batches(cells, batch_format="pyarrow")
    counts = sum_final(partials, ["gx", "gy", "track_id"])

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(np.float64)
        tot = n.sum()
        p = n / tot
        return pd.DataFrame({
            "gx": g["gx"].iloc[:1], "gy": g["gy"].iloc[:1],
            "n_tracks": np.asarray([len(g)], np.int64),
            "n_fixes": np.asarray([int(tot)], np.int64),
            "entropy": np.asarray([float(-(p * np.log(p)).sum())],
                                  np.float64),
        })

    return counts.groupby(["gx", "gy"]).map_groups(
        per_cell, batch_format="pandas")


def polygon_convexity(
    vertices: ray.data.Dataset, num_shards: int = 16
) -> ray.data.Dataset:
    """Per-polygon convexity ratio (ST_Area / ST_Area(ST_ConvexHull)):
    shoelace area of the OUTER ring over its convex hull's area — 1
    for convex boundaries, lower the more star-shaped/indented (the
    shape-compactness diagnostic of admin-boundary QA). Input rows
    are exploded ring vertices (admin_id, ring_ix, vertex_ix, lon,
    lat); only ring_ix = 0 contributes. Hash-shards by polygon;
    per-group monotone-chain hull + shoelace, both vectorized."""
    from engine.ops.relational import _sharded_by_key

    import pyarrow.compute as pc

    outer = vertices.map_batches(
        lambda t: t.filter(pc.equal(t["ring_ix"], 0)),
        batch_format="pyarrow")

    def shard_conv(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for aid, sub in g.groupby("admin_id", sort=False):
            sub = sub.sort_values("vertex_ix", kind="stable")
            x = sub["lon"].to_numpy(np.float64)
            y = sub["lat"].to_numpy(np.float64)
            area = abs(float(
                (x * np.roll(y, -1) - np.roll(x, -1) * y).sum()) / 2.0)
            h = _hull_ccw(x, y)
            hx, hy = x[h], y[h]
            hull = abs(float(
                (hx * np.roll(hy, -1)
                 - np.roll(hx, -1) * hy).sum()) / 2.0)
            rows.append((aid, len(x), area, hull,
                         area / hull if hull > 0 else 1.0))
        return pd.DataFrame(rows, columns=[
            "admin_id", "n_vertices", "poly_area", "hull_area",
            "convexity",
        ]).astype({"n_vertices": np.int64})

    sharded = _sharded_by_key(outer, "admin_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_conv(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def _gc_bearing(lon1, lat1, lon2, lat2):
    """Great-circle initial bearing (radians), vectorized; the exact
    float twin of the SQL atan2 expression used by the oracles."""
    la, lb = np.deg2rad(lat1), np.deg2rad(lat2)
    dl = np.deg2rad(lon2 - lon1)
    return np.arctan2(
        np.sin(dl) * np.cos(lb),
        np.cos(la) * np.sin(lb) - np.sin(la) * np.cos(lb) * np.cos(dl))


def turning_stats(
    points: ray.data.Dataset, num_shards: int = 64
) -> ray.data.Dataset:
    """Per-track turning behavior: count of interior turn vertices,
    total absolute turning angle (radians; consecutive-bearing deltas
    wrapped to (-pi, pi]) and the mean absolute turn — straight
    commutes score near 0, random walks near pi/2 per vertex (the
    path-tortuosity diagnostic complementing sinuosity). One
    segmented vectorized pass per shard; the wrap uses the same
    CASE logic as the SQL twin (not fmod) for float parity."""
    from engine.ops.relational import _sharded_by_key

    def shard_turns(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        tid = g["track_id"].to_numpy()
        same = tid[1:] == tid[:-1]
        th = _gc_bearing(lon[:-1], lat[:-1], lon[1:], lat[1:])
        # turns exist where segment i and i+1 belong to the same track
        both = same[1:] & same[:-1]
        dd = th[1:] - th[:-1]
        dd = np.where(dd > np.pi, dd - 2 * np.pi, dd)
        dd = np.where(dd < -np.pi, dd + 2 * np.pi, dd)
        t = pd.DataFrame({"track_id": tid[1:-1][both],
                          "a": np.abs(dd[both])})
        agg = t.groupby("track_id", as_index=False, sort=False).agg(
            n_turns=("a", "size"), total_turn=("a", "sum"),
            mean_abs_turn=("a", "mean"))
        agg["n_turns"] = agg["n_turns"].astype(np.int64)
        return agg

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_turns(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def cross_track_stats(
    points: ray.data.Dataset, num_shards: int = 64
) -> ray.data.Dataset:
    """Per-track route-deviation profile: the cross-track distance of
    every fix from the great circle through the track's FIRST and
    LAST fixes, xtd = asin(sin(d13) * sin(b13 - b12)) * R — max and
    mean absolute deviation in meters (how far the path strays from
    the direct route; pairs with sinuosity, which only measures
    length). Segmented vectorized; endpoints score 0 by identity."""
    from engine.geo.knn import EARTH_RADIUS_M
    from engine.ops.relational import _sharded_by_key

    def shard_xtd(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for tid, sub in g.groupby("track_id", sort=False):
            sub = sub.sort_values("seq", kind="stable")
            lon = sub["lon"].to_numpy(np.float64)
            lat = sub["lat"].to_numpy(np.float64)
            d13 = knn_mod.haversine_m(
                lon[0], lat[0], lon, lat) / EARTH_RADIUS_M
            b13 = _gc_bearing(lon[0], lat[0], lon, lat)
            b12 = _gc_bearing(lon[0], lat[0], lon[-1], lat[-1])
            xtd = np.abs(np.arcsin(
                np.clip(np.sin(d13) * np.sin(b13 - b12), -1.0, 1.0))
                * EARTH_RADIUS_M)
            rows.append((tid, len(sub), float(xtd.max()),
                         float(xtd.mean())))
        return pd.DataFrame(rows, columns=[
            "track_id", "n_fixes", "max_xtd_m", "mean_xtd_m",
        ]).astype({"n_fixes": np.int64})

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_xtd(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def coverage_fraction(
    indexed: ray.data.Dataset, poly: dict,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 48, ny: int = 24,
    cell_deg: float = 0.5,
) -> pd.DataFrame:
    """Per-admin-polygon survey coverage: of the grid cells whose
    CENTER lies inside the polygon, the fraction that contain at
    least one image — the per-area completeness metric behind the
    reference's coverage reporting [PK], here as an exact grid
    statistic. The distributed stage is the cell-occupancy combiner
    (one partial row per nonempty cell per block); cell centers x
    polygons is the documented small side (|grid| x |admins| on the
    driver)."""
    from engine.ops.relational import sum_final
    from engine.pipeline.join import build_polygon_set

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        flat = gx[ok] * ny + gy[ok]
        cnt = np.bincount(flat, minlength=nx * ny)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    occ = sum_final(
        indexed.map_batches(cells, batch_format="pyarrow"),
        ["cell"]).to_pandas()
    occupied = np.zeros(nx * ny, bool)
    occupied[occ["cell"].to_numpy(np.int64)] = True

    polys = build_polygon_set(poly)
    cx = lon0 + (np.arange(nx) + 0.5) * cell_deg
    cy = lat0 + (np.arange(ny) + 0.5) * cell_deg
    px = np.repeat(cx, ny)
    py = np.tile(cy, nx)
    p_idx, g_idx = polys.contains_pairs(px, py)
    rows = []
    for gi in np.unique(g_idx):
        inside = p_idx[g_idx == gi]
        cov = occupied[inside]
        rows.append((str(polys.admin_ids[gi]),
                     int(polys.levels[gi]), len(inside),
                     int(cov.sum()),
                     float(cov.sum()) / len(inside)))
    out = pd.DataFrame(rows, columns=[
        "admin_id", "level", "n_cells", "n_covered", "coverage"])
    out["level"] = out["level"].astype(np.int64)
    out["n_cells"] = out["n_cells"].astype(np.int64)
    out["n_covered"] = out["n_covered"].astype(np.int64)
    return out.sort_values("admin_id", ignore_index=True)


def spatiotemporal_pairs(
    points: ray.data.Dataset,
    radius_m: float,
    max_dt: int,
    *,
    max_abs_lat: float = 80.0,
) -> ray.data.Dataset:
    """Spatio-TEMPORAL co-occurrence join: all pairs of points within
    ``radius_m`` meters AND within ``max_dt`` of each other on the
    ``seq`` clock — the same-place-same-time primitive behind contact
    tracing, photo-session detection, and convoy mining. Same
    grid-halo owner rule as ``ripley_k`` (pair counted at the smaller
    node's home cell), with the temporal predicate applied inside the
    same vectorized mask — no second shuffle for the time axis."""
    from engine.geo.knn import haversine_m

    if max_abs_lat >= 89.0:
        raise ValueError("grid cover needs max_abs_lat < 89")
    cos_w = float(np.cos(np.deg2rad(max_abs_lat)))
    cd = radius_m / (110_000.0 * cos_w)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        lat = b["lat"].to_numpy(np.float64)
        if len(lat) and float(np.abs(lat).max()) > max_abs_lat:
            raise ValueError("|lat| > max_abs_lat")
        lon = b["lon"].to_numpy(np.float64)
        cx = np.floor(lon / cd).astype(np.int64)
        cy = np.floor(lat / cd).astype(np.int64)
        n = len(b)
        off = np.array([-1, 0, 1], np.int64)
        ox = np.repeat(np.tile(off, 3), n)
        oy = np.repeat(np.repeat(off, 3), n)
        return pd.DataFrame({
            "cell": ((np.tile(cx, 9) + ox) * 4_294_967_296
                     + (np.tile(cy, 9) + oy) + 2_147_483_648),
            "node": np.tile(b["node"].to_numpy(np.int64), 9),
            "lon": np.tile(lon, 9), "lat": np.tile(lat, 9),
            "real": (ox == 0) & (oy == 0),
        })

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        real = g[g["real"]]
        if len(real) == 0:
            return pd.DataFrame({
                "node_a": np.empty(0, np.int64),
                "node_b": np.empty(0, np.int64),
                "dist_m": np.empty(0, np.float64)})
        na = real["node"].to_numpy(np.int64)
        nb = g["node"].to_numpy(np.int64)
        d = haversine_m(
            real["lon"].to_numpy()[:, None],
            real["lat"].to_numpy()[:, None],
            g["lon"].to_numpy()[None, :],
            g["lat"].to_numpy()[None, :])
        m = ((nb[None, :] > na[:, None])
             & (d <= radius_m)
             & (np.abs(nb[None, :] - na[:, None]) <= max_dt))
        ii, jj = np.nonzero(m)
        return pd.DataFrame({
            "node_a": na[ii], "node_b": nb[jj],
            "dist_m": d[ii, jj],
        })

    exploded = points.map_batches(explode, batch_format="pandas")
    return exploded.groupby("cell").map_groups(
        group_pairs, batch_format="pandas")


def dead_reckoning_error(
    points: ray.data.Dataset, num_shards: int = 64
) -> ray.data.Dataset:
    """Trajectory-model baseline: predict each fix as the previous
    fix plus its last displacement (constant-velocity dead reckoning
    in planar degrees) and report the per-track mean/max haversine
    prediction error — the floor any learned next-location model must
    beat. Segmented vectorized; tracks need >= 3 fixes."""
    from engine.ops.relational import _sharded_by_key

    def shard_dr(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["track_id", "seq"], kind="stable")
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        tid = g["track_id"].to_numpy()
        same = tid[1:] == tid[:-1]
        ok = same[1:] & same[:-1]  # fix i-1, i, i+1 in one track
        plon = 2.0 * lon[1:-1][ok] - lon[:-2][ok]
        plat = 2.0 * lat[1:-1][ok] - lat[:-2][ok]
        err = knn_mod.haversine_m(
            plon, plat, lon[2:][ok], lat[2:][ok])
        t = pd.DataFrame({"track_id": tid[1:-1][ok], "e": err})
        agg = t.groupby("track_id", as_index=False, sort=False).agg(
            n_preds=("e", "size"), mean_err_m=("e", "mean"),
            max_err_m=("e", "max"))
        agg["n_preds"] = agg["n_preds"].astype(np.int64)
        return agg

    sharded = _sharded_by_key(points, "track_id", num_shards)
    return sharded.groupby("__shard").map_groups(
        lambda g: shard_dr(g.drop(columns="__shard")),
        batch_format="pandas",
    )


def spacetime_cube(
    points: ray.data.Dataset,
    t_bucket: int,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
) -> ray.data.Dataset:
    """Space-time cube rollup: per grid cell, total fixes, the number
    of occupied ``seq``-buckets of width ``t_bucket``, and the PEAK
    bucket (max count, smallest bucket id on ties) — when is each
    place busiest. One (cell, bucket) count combiner; the per-cell
    argmax runs on the small rollup table."""
    from engine.ops.relational import sum_final

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        seq = np.asarray(b["seq"], dtype=np.int64)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        df = pd.DataFrame({"gx": gx[ok], "gy": gy[ok],
                           "tb": seq[ok] // t_bucket})
        agg = df.groupby(["gx", "gy", "tb"], as_index=False,
                         sort=False).size()
        agg = agg.rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    counts = sum_final(
        points.map_batches(cells, batch_format="pyarrow"),
        ["gx", "gy", "tb"])

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "tb"], ascending=[False, True],
                          kind="stable")
        return pd.DataFrame({
            "gx": g["gx"].iloc[:1], "gy": g["gy"].iloc[:1],
            "n_fixes": np.asarray([int(g["n"].sum())], np.int64),
            "n_buckets": np.asarray([len(g)], np.int64),
            "peak_bucket": np.asarray([int(g["tb"].iloc[0])],
                                      np.int64),
            "peak_n": np.asarray([int(g["n"].iloc[0])], np.int64),
        })

    return counts.groupby(["gx", "gy"]).map_groups(
        per_cell, batch_format="pandas")


def local_morans_grid(
    indexed: ray.data.Dataset,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
) -> pd.DataFrame:
    """Local Moran's I (Anselin 1995 LISA) per grid cell, rook
    adjacency WITHOUT self, binary weights:

    I_i = (x_i - xbar) * (nbr_sum_i - xbar * w_i) / m2

    with m2 the population variance over ALL nx*ny cells (empties
    count 0) and nbr_sum/w over existing rook neighbors only. The
    neighbor deviation sum is kept as ``nbr_sum - xbar * w`` (raw
    counts are exact integers, so the sum is order-free) rather than
    summing per-neighbor deviations — that keeps the DuckDB twin
    bit-identical regardless of SQL aggregation order.

    Distributed stage: the per-cell count combiner (one partial row
    per nonzero cell per block); the nx*ny grid math runs on the
    driver — the documented small side (grid size is fixed, not
    data-sized)."""
    from engine.ops.relational import sum_final

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        flat = gx[ok] * ny + gy[ok]
        cnt = np.bincount(flat, minlength=nx * ny)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    partials = indexed.map_batches(cells, batch_format="pyarrow")
    counts = sum_final(partials, ["cell"]).to_pandas()
    x = np.zeros(nx * ny, np.float64)
    if len(counts) and "cell" in counts.columns:
        x[counts["cell"].to_numpy(np.int64)] = counts["n"].to_numpy()
    grid = x.reshape(nx, ny)
    xbar = grid.mean()
    m2 = (grid * grid).mean() - xbar * xbar

    def shift_nbr(a: np.ndarray) -> np.ndarray:
        p = np.pad(a, 1)  # zero border: missing neighbors drop out
        return (p[:-2, 1:-1] + p[2:, 1:-1]
                + p[1:-1, :-2] + p[1:-1, 2:])

    nbr_sum = shift_nbr(grid)
    w = shift_nbr(np.ones_like(grid))
    # m2 == 0 (all counts equal): defined 0.0, the morans_i convention
    if m2 > 0:
        li = (grid - xbar) * (nbr_sum - xbar * w) / m2
    else:
        li = np.zeros_like(grid)
    gxs, gys = np.divmod(np.arange(nx * ny, dtype=np.int64), ny)
    return pd.DataFrame({
        "gx": gxs, "gy": gys,
        "n": grid.reshape(-1).astype(np.int64),
        "local_i": li.reshape(-1),
    })


def quadtree_leaves(
    indexed: ray.data.Dataset,
    lon0: float = -12.0, lat0: float = 35.0,
    span_lon: float = 24.0, span_lat: float = 12.0,
    max_depth: int = 6, cap: int = 32,
) -> pd.DataFrame:
    """Adaptive quadtree occupancy over the bbox: a cell is split
    while its count exceeds ``cap``; every point is assigned the
    SHALLOWEST ancestor cell with count <= cap (depth ``max_depth``
    if none) — the adaptive spatial binning used for balanced tile
    sharding over skewed point sets.

    Distributed stage: the depth-``max_depth`` cell-count combiner
    (sum_final over <= 4^max_depth cells). The per-depth rollup and
    leaf assignment run on the driver over that bounded table — its
    size is 4^max_depth regardless of input rows, so the driver work
    does NOT grow with data (the documented small side)."""
    from engine.ops.relational import sum_final

    side = 1 << max_depth

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        ok = ((lon >= lon0) & (lon < lon0 + span_lon)
              & (lat >= lat0) & (lat < lat0 + span_lat))
        cx = np.floor((lon[ok] - lon0) / span_lon * side).astype(
            np.int64)
        cy = np.floor((lat[ok] - lat0) / span_lat * side).astype(
            np.int64)
        u, cnt = np.unique(cx * side + cy, return_counts=True)
        return pa.table({"cell": pa.array(u, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    partials = indexed.map_batches(cells, batch_format="pyarrow")
    counts = sum_final(partials, ["cell"]).to_pandas()
    full = np.zeros(side * side, np.int64)
    if len(counts) and "cell" in counts.columns:
        full[counts["cell"].to_numpy(np.int64)] = (
            counts["n"].to_numpy())
    levels = {max_depth: full.reshape(side, side)}
    for d in range(max_depth - 1, -1, -1):
        g = levels[d + 1]
        s = g.shape[0] // 2
        levels[d] = g.reshape(s, 2, s, 2).sum(axis=(1, 3))

    g6 = levels[max_depth]
    nzx, nzy = np.nonzero(g6)
    depth = np.full(len(nzx), max_depth, np.int64)
    assigned = np.zeros(len(nzx), bool)
    for d in range(0, max_depth):
        anc = levels[d][nzx >> (max_depth - d), nzy >> (max_depth - d)]
        pick = ~assigned & (anc <= cap)
        depth[pick] = d
        assigned |= pick
    cx = nzx >> (max_depth - depth)
    cy = nzy >> (max_depth - depth)
    out = (pd.DataFrame({
        "depth": depth, "cx": cx, "cy": cy, "n": g6[nzx, nzy]})
        .groupby(["depth", "cx", "cy"], as_index=False)["n"].sum()
        .sort_values(["depth", "cx", "cy"], ignore_index=True))
    return out


def semivariogram(
    points: ray.data.Dataset,
    bin_m: float,
    n_bins: int,
    *,
    max_abs_lat: float = 80.0,
) -> pd.DataFrame:
    """Empirical semivariogram of an integer point attribute ``z``:
    gamma(bin) = sum (z_i - z_j)^2 / (2 * n_pairs) over unordered
    pairs bucketed by haversine distance into ``n_bins`` lags of
    ``bin_m`` meters (Matheron 1963 estimator, public formula) — the
    spatial-continuity diagnostic that sizes kriging/IDW ranges.

    Scale shape is ``ripley_k``'s both-big pattern: points explode
    into the 3x3 grid halo sized to the LARGEST lag, one
    groupby(cell) co-locates candidates, the owner rule (node_b >
    node_a at the smaller node's home cell) counts each pair once,
    and only n_bins partial rows leave each group. Squared deltas of
    integer z are exact, so the all-pairs SQL twin matches
    bit-for-bit through the final division."""
    from engine.geo.knn import haversine_m
    from engine.ops.relational import sum_final

    rmax = bin_m * n_bins
    if max_abs_lat >= 89.0:
        raise ValueError("semivariogram grid cover needs "
                         "max_abs_lat < 89")
    cos_w = float(np.cos(np.deg2rad(max_abs_lat)))
    cd = rmax / (110_000.0 * cos_w)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        lat = b["lat"].to_numpy(np.float64)
        if len(lat) and float(np.abs(lat).max()) > max_abs_lat:
            raise ValueError(
                f"semivariogram: |lat| > max_abs_lat={max_abs_lat}")
        lon = b["lon"].to_numpy(np.float64)
        cx = np.floor(lon / cd).astype(np.int64)
        cy = np.floor(lat / cd).astype(np.int64)
        n = len(b)
        off = np.array([-1, 0, 1], np.int64)
        ox = np.repeat(np.tile(off, 3), n)
        oy = np.repeat(np.repeat(off, 3), n)
        return pd.DataFrame({
            "cell": ((np.tile(cx, 9) + ox) * 4_294_967_296
                     + (np.tile(cy, 9) + oy) + 2_147_483_648),
            "node": np.tile(b["node"].to_numpy(np.int64), 9),
            "z": np.tile(b["z"].to_numpy(np.int64), 9),
            "lon": np.tile(lon, 9), "lat": np.tile(lat, 9),
            "real": (ox == 0) & (oy == 0),
        })

    def group_counts(g: pd.DataFrame) -> pd.DataFrame:
        real = g[g["real"]]
        if len(real) == 0:
            return pd.DataFrame({
                "bin": np.empty(0, np.int64),
                "n": np.empty(0, np.int64),
                "ss": np.empty(0, np.float64)})
        d = haversine_m(
            real["lon"].to_numpy()[:, None],
            real["lat"].to_numpy()[:, None],
            g["lon"].to_numpy()[None, :],
            g["lat"].to_numpy()[None, :])
        newer = (g["node"].to_numpy()[None, :]
                 > real["node"].to_numpy()[:, None])
        ok = newer & (d < rmax)
        bins = np.floor(d / bin_m).astype(np.int64)[ok]
        dz = (real["z"].to_numpy(np.int64)[:, None]
              - g["z"].to_numpy(np.int64)[None, :])
        dz2 = (dz * dz)[ok]
        n = np.bincount(bins, minlength=n_bins)
        s = np.bincount(bins, weights=dz2.astype(np.float64),
                        minlength=n_bins)
        return pd.DataFrame({
            "bin": np.arange(n_bins, dtype=np.int64),
            "n": n.astype(np.int64), "ss": s})

    exploded = points.map_batches(explode, batch_format="pandas")
    partials = exploded.groupby("cell").map_groups(
        group_counts, batch_format="pandas")
    tot = sum_final(partials, ["bin"]).to_pandas()
    tot = tot[tot["n"] > 0].reset_index(drop=True)
    tot["gamma"] = tot["ss"] / (2.0 * tot["n"].astype(np.float64))
    return tot.rename(columns={"n": "n_pairs"})[
        ["bin", "n_pairs", "gamma"]].sort_values(
        "bin", ignore_index=True)


def knox_spacetime(
    points: ray.data.Dataset,
    radius_m: float,
    tau: int,
    *,
    t_domain: int,
    max_abs_lat: float = 80.0,
) -> pd.DataFrame:
    """Knox space-time interaction statistic (Knox 1964, public
    epidemiology formula): over unordered point pairs, counts
    close-in-space (haversine < ``radius_m``), close-in-time
    (|dt| <= ``tau`` over integer times in [0, ``t_domain``)), and
    close-in-both, plus the permutation-null expectation
    E = n_space * n_time / n_pairs and the ratio n_both / E.

    Space counts ride the ripley-style 3x3 grid-halo owner-rule pass
    (only two partial ints leave each cell group). The time margin
    never touches pairs: a per-value count combiner reduces to at
    most ``t_domain`` rows, and the pair count is a prefix-sum scan
    over that tiny table on the driver (the O(T) small side). The
    SQL twin recomputes all three margins from the all-pairs join."""
    from engine.geo.knn import haversine_m
    from engine.ops.relational import sum_final

    if max_abs_lat >= 89.0:
        raise ValueError("knox grid cover needs max_abs_lat < 89")
    cos_w = float(np.cos(np.deg2rad(max_abs_lat)))
    cd = radius_m / (110_000.0 * cos_w)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        lat = b["lat"].to_numpy(np.float64)
        if len(lat) and float(np.abs(lat).max()) > max_abs_lat:
            raise ValueError(
                f"knox: |lat| > max_abs_lat={max_abs_lat}")
        lon = b["lon"].to_numpy(np.float64)
        cx = np.floor(lon / cd).astype(np.int64)
        cy = np.floor(lat / cd).astype(np.int64)
        n = len(b)
        off = np.array([-1, 0, 1], np.int64)
        ox = np.repeat(np.tile(off, 3), n)
        oy = np.repeat(np.repeat(off, 3), n)
        return pd.DataFrame({
            "cell": ((np.tile(cx, 9) + ox) * 4_294_967_296
                     + (np.tile(cy, 9) + oy) + 2_147_483_648),
            "node": np.tile(b["node"].to_numpy(np.int64), 9),
            "t": np.tile(b["t"].to_numpy(np.int64), 9),
            "lon": np.tile(lon, 9), "lat": np.tile(lat, 9),
            "real": (ox == 0) & (oy == 0),
        })

    def group_counts(g: pd.DataFrame) -> pd.DataFrame:
        real = g[g["real"]]
        if len(real) == 0:
            return pd.DataFrame({"k": np.empty(0, np.int64),
                                 "ns": np.empty(0, np.int64),
                                 "nst": np.empty(0, np.int64)})
        d = haversine_m(
            real["lon"].to_numpy()[:, None],
            real["lat"].to_numpy()[:, None],
            g["lon"].to_numpy()[None, :],
            g["lat"].to_numpy()[None, :])
        newer = (g["node"].to_numpy()[None, :]
                 > real["node"].to_numpy()[:, None])
        close = newer & (d < radius_m)
        dt = np.abs(real["t"].to_numpy()[:, None]
                    - g["t"].to_numpy()[None, :])
        return pd.DataFrame({
            "k": np.zeros(1, np.int64),
            "ns": np.array([close.sum()], np.int64),
            "nst": np.array([(close & (dt <= tau)).sum()],
                            np.int64)})

    exploded = points.map_batches(explode, batch_format="pandas")
    partials = exploded.groupby("cell").map_groups(
        group_counts, batch_format="pandas")
    sp = sum_final(partials, ["k"]).to_pandas()
    n_space = int(sp["ns"].sum())
    n_both = int(sp["nst"].sum())

    def t_counts(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["t"].value_counts()
        return pd.DataFrame({"t": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    tm = sum_final(points.map_batches(t_counts,
                                      batch_format="pandas"),
                   ["t"]).to_pandas().sort_values(
                       "t", ignore_index=True)
    tv = tm["t"].to_numpy(np.int64)
    tc = tm["n"].to_numpy(np.int64)
    csum = np.concatenate([[0], np.cumsum(tc)])
    hi = np.searchsorted(tv, tv + tau, side="right")
    lo = np.arange(1, len(tv) + 1)
    n_time = int((tc * (csum[hi] - csum[lo])).sum()
                 + (tc * (tc - 1) // 2).sum())
    n_total = int(tc.sum())
    n_pairs = n_total * (n_total - 1) // 2

    # shared expression tree — mirrored verbatim in the twin
    expected = (float(n_space) * float(n_time)) / float(n_pairs)
    ratio = float(n_both) / expected if expected > 0 else 0.0
    return pd.DataFrame({
        "n_pairs": [n_pairs], "n_space": [n_space],
        "n_time": [n_time], "n_both": [n_both],
        "expected": [expected], "ratio": [ratio]})


def mann_kendall_cells(
    points: ray.data.Dataset,
    n_buckets: int,
    n_total: int,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
) -> pd.DataFrame:
    """Emerging-hotspot trend screen: per grid cell, the Mann-Kendall
    trend statistic of its fix-count series over ``n_buckets`` dense
    time buckets (tb = seq * n_buckets // n_total), zeros included —
    S = sum sign(x_j - x_i) over bucket pairs i < j, tie-corrected
    variance, and the +-1-continuity z score (Mann 1945 / Kendall
    1975, public formulas; the trend half of ESRI-style emerging
    hot spot analysis).

    One (cell, bucket) count combiner feeds a per-cell map_groups
    over the rollup (cells x n_buckets rows, never raw fixes); S and
    the tie terms are exact integers, so the SQL twin — dense bucket
    domain via range() + the same pair signs — matches through the
    final z division."""
    from engine.ops.relational import sum_final

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        seq = np.asarray(b["seq"], dtype=np.int64)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        df = pd.DataFrame({"gx": gx[ok], "gy": gy[ok],
                           "tb": seq[ok] * n_buckets // n_total})
        agg = df.groupby(["gx", "gy", "tb"], as_index=False,
                         sort=False).size()
        agg = agg.rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    counts = sum_final(
        points.map_batches(cells, batch_format="pyarrow"),
        ["gx", "gy", "tb"])
    m = n_buckets
    var_base = m * (m - 1) * (2 * m + 5)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        x = np.zeros(m, np.int64)
        x[g["tb"].to_numpy(np.int64)] = g["n"].to_numpy(np.int64)
        iu = np.triu_indices(m, 1)
        s = int(np.sign(x[iu[1]] - x[iu[0]]).sum())
        _, tc = np.unique(x, return_counts=True)
        tt = int((tc * (tc - 1) * (2 * tc + 5)).sum())
        # shared expression tree — mirrored verbatim in the twin
        var = float(var_base - tt) / 18.0
        if s > 0:
            z = (s - 1) / np.sqrt(var)
        elif s < 0:
            z = (s + 1) / np.sqrt(var)
        else:
            z = 0.0
        return pd.DataFrame({
            "gx": g["gx"].iloc[:1], "gy": g["gy"].iloc[:1],
            "n_fixes": np.asarray([int(g["n"].sum())], np.int64),
            "s": np.asarray([s], np.int64),
            "z": np.asarray([z], np.float64)})

    out = (counts.groupby(["gx", "gy"])
           .map_groups(per_cell, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["gx", "gy"], ignore_index=True)


def colocation_quotient(
    points: ray.data.Dataset,
    *,
    cat_col: str = "cat",
    id_col: str = "image_id",
    coarse_res: int = 5,
    broadcast_rows: int = 2_000_000,
) -> pd.DataFrame:
    """Nearest-neighbor colocation quotient (Leslie & Kronenfeld
    2011, public formula): for every ordered category pair (A, B),
    CLQ = (C_A->B / N_A) / (N'_B / (N-1)) where C_A->B counts
    A-points whose single nearest neighbor is a B-point and N'_B is
    N_B (or N_B - 1 when A = B) — which categories attract which.

    The NN pass is the certified halo-shuffle self-kNN (k=1, same
    tie-break: distance then neighbor id). Pair labeling is
    size-gated (J14's stats-driven rule, round-4 verdict item 3): at
    or below ``broadcast_rows`` the (id, cat) map broadcasts once
    (``ray.put`` of two sorted arrays) and both labels attach inside
    one ``map_batches`` searchsorted pass — zero label shuffles;
    above the gate two hash co-shuffle joins of the NN edge list
    against the (id, cat) table run instead — both sides unbounded,
    no corpus broadcast. A (cat_a, cat_b) count combiner then reduces
    everything to the K x K grid where the exact-integer CLQ formula
    runs. Zero-count pairs are kept (full grid, chi2_independence
    convention)."""
    import ray as _ray

    from engine.ops.relational import bucketed_join, sum_final
    from engine.state import cached_get

    points = points.materialize()  # feeds kNN, labels AND margins
    geo = points.map_batches(
        lambda b: b[[id_col, "lon", "lat"]], batch_format="pandas")
    nn = self_knn_halo(geo, k=1, coarse_res=coarse_res)
    nn = nn.map_batches(
        lambda b: b[["image_id", "neighbor_id"]],
        batch_format="pandas")

    def count(b: pd.DataFrame) -> pd.DataFrame:
        agg = b.groupby(["cat_a", "cat_b"], as_index=False,
                        sort=False).size()
        agg = agg.rename(columns={"size": "c_ab"})
        agg["c_ab"] = agg["c_ab"].astype(np.int64)
        return agg

    if points.count() <= broadcast_rows:
        lab_pdf = points.map_batches(
            lambda b: pd.DataFrame({"id": b[id_col],
                                    "cat": b[cat_col]}),
            batch_format="pandas").to_pandas()
        ids = lab_pdf["id"].to_numpy(object)
        cats = lab_pdf["cat"].to_numpy(object)
        order = np.argsort(ids, kind="stable")
        lab_ref = _ray.put((ids[order], cats[order]))

        def attach(b: pd.DataFrame) -> pd.DataFrame:
            sids, scats = cached_get(lab_ref)
            a = scats[np.searchsorted(sids, b["image_id"].to_numpy(
                object))]
            c = scats[np.searchsorted(sids, b["neighbor_id"].to_numpy(
                object))]
            return count(pd.DataFrame({"cat_a": a, "cat_b": c}))

        parts = nn.map_batches(attach, batch_format="pandas")
        cnt = sum_final(parts, ["cat_a", "cat_b"]).to_pandas()
    else:
        cat_a = points.map_batches(
            lambda b: pd.DataFrame({"image_id": b[id_col],
                                    "cat_a": b[cat_col]}),
            batch_format="pandas")
        cat_b = points.map_batches(
            lambda b: pd.DataFrame({"neighbor_id": b[id_col],
                                    "cat_b": b[cat_col]}),
            batch_format="pandas")
        lab = bucketed_join(
            bucketed_join(nn, cat_a, on="image_id"),
            cat_b, on="neighbor_id")
        cnt = sum_final(lab.map_batches(count, batch_format="pandas"),
                        ["cat_a", "cat_b"]).to_pandas()

    def marg(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[cat_col].value_counts()
        return pd.DataFrame({"cat": vc.index.astype(object),
                             "n": vc.to_numpy(np.int64)})

    margins = sum_final(
        points.map_batches(marg, batch_format="pandas"),
        ["cat"]).to_pandas().sort_values("cat", ignore_index=True)
    n = int(margins["n"].sum())
    key = {(a, b): c for a, b, c in
           cnt.itertuples(index=False, name=None)}
    rows = []
    for ca, na in margins.itertuples(index=False, name=None):
        for cb, nb in margins.itertuples(index=False, name=None):
            c = int(key.get((ca, cb), 0))
            nb_eff = nb - 1 if ca == cb else nb
            # shared expression tree — mirrored verbatim in the twin
            clq = ((float(c) / float(na))
                   / (float(nb_eff) / float(n - 1))
                   if nb_eff > 0 else 0.0)
            rows.append((ca, cb, int(na), int(nb), c, clq))
    return pd.DataFrame(
        rows, columns=["cat_a", "cat_b", "n_a", "n_b", "c_ab",
                       "clq"])


def join_counts_grid(
    indexed: ray.data.Dataset,
    thr: int,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
) -> pd.DataFrame:
    """Binary join-count spatial autocorrelation (Cliff & Ord 1981,
    public formula): mark each OCCUPIED grid cell black when its fix
    count >= ``thr``, count rook-adjacent occupied-cell joins by
    class (BB / WW / BW), and compare against the nonfree-sampling
    expectations E[BB] = J nB(nB-1)/(n(n-1)), E[WW] likewise, E[BW] =
    J 2 nB nW / (n(n-1)) — the do-hot-cells-border-hot-cells test.

    Distributed stage: the same per-cell count combiner as the other
    grid statistics; the join census is vectorized mask shifts on the
    fixed nx*ny grid (the documented small side). Every count is an
    exact integer, so the SQL twin — a neighbor self-join on the
    cell table — matches through the final expectation divisions."""
    from engine.ops.relational import sum_final

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        flat = gx[ok] * ny + gy[ok]
        cnt = np.bincount(flat, minlength=nx * ny)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    partials = indexed.map_batches(cells, batch_format="pyarrow")
    counts = sum_final(partials, ["cell"]).to_pandas()
    cnt = np.zeros(nx * ny, np.int64)
    if len(counts) and "cell" in counts.columns:
        cnt[counts["cell"].to_numpy(np.int64)] = \
            counts["n"].to_numpy(np.int64)
    grid = cnt.reshape(nx, ny)
    occ = grid > 0
    blk = grid >= thr
    wht = occ & ~blk

    def joins(a: np.ndarray, b: np.ndarray) -> int:
        return int((a[:-1, :] & b[1:, :]).sum()
                   + (a[:, :-1] & b[:, 1:]).sum())

    j_bb = joins(blk, blk)
    j_ww = joins(wht, wht)
    j_all = joins(occ, occ)
    j_bw = j_all - j_bb - j_ww
    n = int(occ.sum())
    nb = int(blk.sum())
    nw = int(wht.sum())
    denom = float(n * (n - 1))
    # shared expression tree — mirrored verbatim in the twin
    e_bb = (float(j_all) * float(nb * (nb - 1))) / denom
    e_ww = (float(j_all) * float(nw * (nw - 1))) / denom
    e_bw = (float(j_all) * float(2 * nb * nw)) / denom
    return pd.DataFrame({
        "n_cells": [n], "n_black": [nb], "n_joins": [j_all],
        "j_bb": [j_bb], "j_ww": [j_ww], "j_bw": [j_bw],
        "e_bb": [e_bb], "e_ww": [e_ww], "e_bw": [e_bw]})


def track_lcss(
    points: ray.data.Dataset,
    eps_m: float,
) -> ray.data.Dataset:
    """Pairwise LCSS trajectory similarity (Vlachos et al. 2002,
    public formula) between bbox-overlapping tracks: the longest
    common subsequence of fixes matched when within ``eps_m``
    haversine meters — lcss[i,j] = lcss[i-1,j-1]+1 when d < eps else
    max(lcss[i-1,j], lcss[i,j-1]) — plus sim = lcss / min(na, nb).
    LCSS tolerates outlier fixes and gaps that inflate DTW's total
    cost, which makes it the noise-robust member of the
    Frechet/DTW/LCSS trio.

    Same scale shape as DTW (shared ``_track_pair_explode``, one
    groupby(pair) co-shuffle, per-pair DP inside the group task).
    The DP is all-integer, so the anti-diagonal wavefront SQL twin
    matches exactly; the only float is the final sim division."""
    exploded, mem_ref = _track_pair_explode(points, with_seq=True)

    def pair_lcss(g: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        _, _, _, pair_a_, pair_b_ = cached_get(mem_ref)
        pid = int(g["pair"].iloc[0])
        a = g[g["side"] == 0].sort_values("seq", kind="stable")
        b = g[g["side"] == 1].sort_values("seq", kind="stable")
        d = knn_mod.haversine_m(
            a["lon"].to_numpy()[:, None], a["lat"].to_numpy()[:, None],
            b["lon"].to_numpy()[None, :], b["lat"].to_numpy()[None, :])
        na, nb = d.shape
        hit = d < eps_m
        lr = np.zeros((na + 1, nb + 1), np.int64)
        for i in range(1, na + 1):
            li, lp, hi = lr[i], lr[i - 1], hit[i - 1]
            for j in range(1, nb + 1):
                li[j] = (lp[j - 1] + 1 if hi[j - 1]
                         else max(lp[j], li[j - 1]))
        lc = int(lr[na, nb])
        return pd.DataFrame({
            "track_a": [pair_a_[pid]], "track_b": [pair_b_[pid]],
            "lcss": [lc],
            "sim": [float(lc) / float(min(na, nb))],
        })

    return exploded.groupby("pair").map_groups(
        pair_lcss, batch_format="pandas")


def quadrat_chi2(
    indexed: ray.data.Dataset,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
) -> pd.DataFrame:
    """Quadrat-count test of complete spatial randomness (Greig-Smith
    1952 / Diggle, public formula): chi2 = sum over ALL k = nx*ny
    quadrats (empties included) of (n_i - n/k)^2 / (n/k), which
    reduces to the exact-integer form (k * sum n_i^2 - n^2) / n; the
    variance-mean ratio chi2 / (k - 1) reads > 1 clustered, < 1
    regular. Same per-cell count combiner as the other fixed-grid
    statistics; only occupied-cell partials move."""
    from engine.ops.relational import sum_final

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        flat = gx[ok] * ny + gy[ok]
        cnt = np.bincount(flat, minlength=nx * ny)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    counts = sum_final(
        indexed.map_batches(cells, batch_format="pyarrow"),
        ["cell"]).to_pandas()
    k = nx * ny
    if len(counts) and "n" in counts.columns:
        ni = counts["n"].to_numpy(np.int64)
    else:
        ni = np.zeros(0, np.int64)
    n = int(ni.sum())
    ssq = int((ni * ni).sum())
    # shared expression tree — mirrored verbatim in the twin
    chi2 = float(k * ssq - n * n) / n if n > 0 else 0.0
    vmr = chi2 / (k - 1)
    return pd.DataFrame({
        "n_points": [n], "n_quadrats": [k], "n_occupied": [len(ni)],
        "sum_sq": [ssq], "chi2": [chi2], "vmr": [vmr]})


def segregation_dissimilarity(
    points: ray.data.Dataset,
    *,
    cat_col: str = "cat",
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
) -> pd.DataFrame:
    """Duncan & Duncan (1955) index of dissimilarity between every
    unordered category pair over the fixed grid: D = 0.5 * sum_cells
    |a_i/A - b_i/B|, computed in the EXACT integer form
    sum |a_i * B - b_i * A| / (2 * A * B) so the float summation
    order can't diverge between engine and twin (one division at the
    end). D = 0 is an identical spatial distribution, 1 is complete
    segregation. One (cell, cat) count combiner; the pairing runs on
    the O(cells x cats) rollup."""
    from engine.ops.relational import sum_final

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        cat = np.asarray(b[cat_col]).astype(object)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        df = pd.DataFrame({"cell": gx[ok] * ny + gy[ok],
                           "cat": cat[ok]})
        agg = df.groupby(["cell", "cat"], as_index=False,
                         sort=False).size()
        agg = agg.rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    rollup = sum_final(
        points.map_batches(cells, batch_format="pyarrow"),
        ["cell", "cat"]).to_pandas()
    pv = rollup.pivot_table(index="cell", columns="cat", values="n",
                            aggfunc="sum", fill_value=0)
    cats = sorted(pv.columns)
    rows = []
    for ia in range(len(cats)):
        for ib in range(ia + 1, len(cats)):
            a = pv[cats[ia]].to_numpy(np.int64)
            b = pv[cats[ib]].to_numpy(np.int64)
            ta, tb = int(a.sum()), int(b.sum())
            num = int(np.abs(a * tb - b * ta).sum())
            d = float(num) / float(2 * ta * tb) \
                if ta > 0 and tb > 0 else 0.0
            rows.append((cats[ia], cats[ib], ta, tb, d))
    return pd.DataFrame(rows, columns=["cat_a", "cat_b", "n_a",
                                       "n_b", "d_index"])


def theil_sen_cells(
    points: ray.data.Dataset,
    n_buckets: int,
    n_total: int,
    lon0: float = -12.0, lat0: float = 35.0,
    nx: int = 24, ny: int = 12,
    cell_deg: float = 1.0,
) -> pd.DataFrame:
    """Per-cell Theil-Sen slope (Theil 1950 / Sen 1968, public
    formula) of the dense fix-count series over ``n_buckets`` time
    buckets — the robust-trend companion of ``mann_kendall_cells``
    (same rollup combiner, same dense domain): slope = median over
    bucket pairs i < j of (x_j - x_i) / (j - i). The pair count
    m(m-1)/2 is even for m = 24 (276), so the median is the mean of
    the two middle slopes — both sides sort and average the SAME two
    doubles ((a + b) / 2; float + is commutative), keeping the twin
    exact before the 6dp round."""
    from engine.ops.relational import sum_final

    def cells(b: pa.Table) -> pa.Table:
        lon = np.asarray(b["lon"], dtype=np.float64)
        lat = np.asarray(b["lat"], dtype=np.float64)
        seq = np.asarray(b["seq"], dtype=np.int64)
        gx = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        gy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        ok = (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
        df = pd.DataFrame({"gx": gx[ok], "gy": gy[ok],
                           "tb": seq[ok] * n_buckets // n_total})
        agg = df.groupby(["gx", "gy", "tb"], as_index=False,
                         sort=False).size()
        agg = agg.rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    counts = sum_final(
        points.map_batches(cells, batch_format="pyarrow"),
        ["gx", "gy", "tb"])
    m = n_buckets
    iu = np.triu_indices(m, 1)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        x = np.zeros(m, np.int64)
        x[g["tb"].to_numpy(np.int64)] = g["n"].to_numpy(np.int64)
        sl = np.sort((x[iu[1]] - x[iu[0]]).astype(np.float64)
                     / (iu[1] - iu[0]).astype(np.float64))
        half = sl.size // 2
        if sl.size % 2:
            slope = float(sl[half])
        else:
            slope = (float(sl[half - 1]) + float(sl[half])) / 2.0
        return pd.DataFrame({
            "gx": g["gx"].iloc[:1], "gy": g["gy"].iloc[:1],
            "n_fixes": np.asarray([int(g["n"].sum())], np.int64),
            "sen_slope": np.asarray([slope], np.float64)})

    out = (counts.groupby(["gx", "gy"])
           .map_groups(per_cell, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["gx", "gy"], ignore_index=True)


def cross_k(
    points: ray.data.Dataset,
    radii_m: list[float],
    cat_a: str,
    cat_b: str,
    *,
    cat_col: str = "cat",
    max_abs_lat: float = 80.0,
) -> pd.DataFrame:
    """Bivariate (cross) Ripley K12: for each radius r, the exact count
    of (A-point, B-point) pairs within haversine distance r, plus the
    pair fraction n_pairs/(n_a*n_b) — "does category B cluster AROUND
    category A" at multiple scales, the cross-category companion of
    ``ripley_k`` (Ripley 1977, public statistic).

    Same both-big grid-cover shape as ``ripley_k``: points of the two
    categories explode into their 3x3 neighborhood with the cell edge
    sized to the largest radius; one groupby(cell) co-locates every
    candidate pair; per group one vectorized (real-A x all-B)
    haversine matrix counts each qualifying pair exactly once (B's
    ghost copy in A's home cell is unique). |radii|+2 partial rows
    leave each group."""
    from engine.geo.knn import haversine_m
    from engine.ops.relational import sum_final

    radii = sorted(float(r) for r in radii_m)
    rmax = radii[-1]
    if max_abs_lat >= 89.0:
        raise ValueError("cross_k grid cover needs max_abs_lat < 89")
    cos_w = float(np.cos(np.deg2rad(max_abs_lat)))
    cd = rmax / (110_000.0 * cos_w)
    n_r = len(radii)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        cat = b[cat_col].astype(str)
        keep = cat.isin([cat_a, cat_b]).to_numpy()
        b = b[keep]
        if not len(b):
            return pd.DataFrame({
                "cell": pd.Series(dtype=np.int64),
                "is_a": pd.Series(dtype=bool),
                "lon": pd.Series(dtype=np.float64),
                "lat": pd.Series(dtype=np.float64),
                "real": pd.Series(dtype=bool)})
        lat = b["lat"].to_numpy(np.float64)
        if float(np.abs(lat).max()) > max_abs_lat:
            raise ValueError(
                f"cross_k: |lat| > max_abs_lat={max_abs_lat}")
        lon = b["lon"].to_numpy(np.float64)
        is_a = (b[cat_col].astype(str) == cat_a).to_numpy()
        cx = np.floor(lon / cd).astype(np.int64)
        cy = np.floor(lat / cd).astype(np.int64)
        n = len(b)
        off = np.array([-1, 0, 1], np.int64)
        ox = np.repeat(np.tile(off, 3), n)
        oy = np.repeat(np.repeat(off, 3), n)
        return pd.DataFrame({
            "cell": ((np.tile(cx, 9) + ox) * 4_294_967_296
                     + (np.tile(cy, 9) + oy) + 2_147_483_648),
            "is_a": np.tile(is_a, 9),
            "lon": np.tile(lon, 9), "lat": np.tile(lat, 9),
            "real": (ox == 0) & (oy == 0),
        })

    def group_counts(g: pd.DataFrame) -> pd.DataFrame:
        real_a = g[g["real"] & g["is_a"]]
        bb = g[~g["is_a"]]
        rix = [n_r, n_r + 1]  # sentinels: real-A count, real-B count
        cnt = [int((g["real"] & g["is_a"]).sum()),
               int((g["real"] & ~g["is_a"]).sum())]
        if len(real_a) and len(bb):
            d = haversine_m(
                real_a["lon"].to_numpy()[:, None],
                real_a["lat"].to_numpy()[:, None],
                bb["lon"].to_numpy()[None, :],
                bb["lat"].to_numpy()[None, :])
            for k, r in enumerate(radii):
                rix.append(k)
                cnt.append(int((d <= r).sum()))
        return pd.DataFrame({"r_ix": np.asarray(rix, np.int64),
                             "n": np.asarray(cnt, np.int64)})

    exploded = points.map_batches(explode, batch_format="pandas")
    partials = exploded.groupby("cell").map_groups(
        group_counts, batch_format="pandas")
    tot = sum_final(partials, ["r_ix"]).to_pandas()
    tot = (tot.set_index("r_ix")["n"] if len(tot)
           else pd.Series(dtype=np.int64))
    n_a = int(tot.get(n_r, 0))
    n_b = int(tot.get(n_r + 1, 0))
    pairs = np.array([int(tot.get(k, 0)) for k in range(n_r)],
                     np.int64)
    denom = max(1, n_a * n_b)
    return pd.DataFrame({
        "r_m": np.asarray(radii, np.float64),
        "n_a": np.full(n_r, n_a, np.int64),
        "n_b": np.full(n_r, n_b, np.int64),
        "n_pairs": pairs,
        "pair_frac": np.round(pairs / denom, 6)})


def theil_sen_gradient(
    indexed: ray.data.Dataset,
    *,
    cell_col: str = "h3_r5",
) -> pd.DataFrame:
    """Theil-Sen robust slope of per-cell image density against
    distance from the corpus mean center — the monotone
    "density decays with distance from the hotspot" screen, immune to
    the heavy-tailed cell counts that wreck an OLS fit (Theil 1950 /
    Sen 1968, public estimator).

    Distributed part: ONE pass of per-cell (count, sum lon, sum lat)
    partials + the global mean-center moments. The pairwise-median
    fold runs on the driver over the CELL table (O(cells^2) pair
    slopes — cells are the aggregated unit, bounded by the grid
    resolution, not the corpus; documented small side). Returns one
    row: n_cells, slope (images per meter), intercept."""
    from engine.geo.knn import haversine_m
    from engine.ops.relational import sum_final

    def part(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            cell_col: b[cell_col].to_numpy(np.uint64).view(np.int64),
            "n": np.ones(len(b), np.int64),
            "slon": b["lon"].to_numpy(np.float64),
            "slat": b["lat"].to_numpy(np.float64)})
        return g.groupby(cell_col, as_index=False, sort=False).sum()

    cells = sum_final(
        indexed.map_batches(part, batch_format="pandas"),
        [cell_col]).to_pandas().sort_values(cell_col,
                                            ignore_index=True)
    if len(cells) < 2:
        return pd.DataFrame({"n_cells": [len(cells)],
                             "slope": [0.0], "intercept": [0.0]})
    n = cells["n"].to_numpy(np.float64)
    clon = cells["slon"].to_numpy() / n
    clat = cells["slat"].to_numpy() / n
    mlon = float(cells["slon"].sum() / n.sum())
    mlat = float(cells["slat"].sum() / n.sum())
    d = haversine_m(np.full(len(n), mlon), np.full(len(n), mlat),
                    clon, clat)
    ii, jj = np.triu_indices(len(n), k=1)
    dd = d[jj] - d[ii]
    ok = dd != 0
    slopes = (n[jj][ok] - n[ii][ok]) / dd[ok]
    slope = float(np.median(slopes)) if len(slopes) else 0.0
    intercept = float(np.median(n - slope * d))
    return pd.DataFrame({
        "n_cells": np.asarray([len(n)], np.int64),
        "slope": np.asarray([round(slope, 10)], np.float64),
        "intercept": np.asarray([round(intercept, 6)], np.float64)})
