"""Spatial join stage: STRtree point-in-polygon actor pool + kNN stage.

Reproduces the reference's "assign every object/article to the admin
areas containing it" (SURVEY.md J1) and "nearest suggestion" (J4) as
Ray-Data-native stages:

- **Broadcast, not shuffle**: the polygon side is orders of magnitude
  smaller than the image side, so it is ``ray.put`` once on the driver
  and each PIP actor builds nothing — the prebuilt ``PolygonSet``
  (flat numpy arrays + STR tree) arrives ready via the object store.
  The big side streams through ``map_batches`` with zero block movement.
- **Deterministic tie-break** (J1): within each (image, level) the
  match with the smallest admin_id is flagged ``is_primary`` so
  boundary points give reproducible assignments.
- **kNN** (J4): an actor pool holding a ``CellIndex`` over broadcast
  candidate points; per batch, queries expand H3-like cell rings with
  a metric-lower-bound termination (exact — verified vs brute force).

Scale notes (10^12-image design point, SURVEY.md §4): the image side is
never shuffled; polygon tables up to ~10^6 rings fit comfortably in one
broadcast object; per-actor state is immutable after init so actor
restarts (``max_restarts``) are safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from engine.geo import knn as knn_mod
from engine.geo import pip as pip_mod

JOINED_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("admin_id", pa.string()),
        ("level", pa.int32()),
        ("is_primary", pa.bool_()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("h3_r7", pa.uint64()),
        ("caption_canon", pa.string()),
    ]
)


def build_polygon_set(poly: dict) -> pip_mod.PolygonSet:
    """polygons fixture dict -> broadcastable PolygonSet."""
    return pip_mod.PolygonSet(
        poly["admin_id"], poly["level"], poly["ring_lon"], poly["ring_lat"],
        poly.get("holes"),
    )


def _pip_join_batch(polys: pip_mod.PolygonSet, batch: pa.Table) -> pa.Table:
    lon = np.asarray(batch["lon"], dtype=np.float64)
    lat = np.asarray(batch["lat"], dtype=np.float64)
    p_idx, g_idx = polys.contains_pairs(lon, lat)
    levels = polys.levels[g_idx]
    admin = polys.admin_ids[g_idx]
    # primary per (point, level): smallest admin_id — lexicographic
    # argsort then first-of-group, deterministic regardless of input order
    order = np.lexsort((admin, levels, p_idx))
    ps, ls = p_idx[order], levels[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (ps[1:] != ps[:-1]) | (ls[1:] != ls[:-1])
    is_primary = np.empty(len(order), dtype=bool)
    is_primary[order] = first
    take = pa.array(p_idx, pa.int64())
    return pa.table(
        {
            "image_id": pa.compute.take(batch["image_id"], take),
            "admin_id": pa.array(admin, pa.string()),
            "level": pa.array(levels, pa.int32()),
            "is_primary": pa.array(is_primary),
            "lon": pa.array(lon[p_idx], pa.float64()),
            "lat": pa.array(lat[p_idx], pa.float64()),
            "h3_r7": pa.compute.take(batch["h3_r7"], take),
            "caption_canon": pa.compute.take(batch["caption_canon"], take),
        },
        schema=JOINED_SCHEMA,
    )


class PIPJoiner:
    """map_batches actor: images_indexed batch -> joined match rows.

    ``__init__`` runs once per actor (ray.get of the broadcast polygon
    set); ``__call__`` per batch emits one row per (image, containing
    polygon) with the deterministic primary flag.
    """

    def __init__(self, poly_ref):
        self.polys: pip_mod.PolygonSet = ray.get(poly_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _pip_join_batch(self.polys, batch)


def run_pip_join(
    ds: ray.data.Dataset,
    poly: dict,
    *,
    batch_size: int = 4096,
    concurrency=(2, 8),
    use_actors: bool = True,
) -> ray.data.Dataset:
    """images_indexed -> joined. Polygon side broadcast once.

    ``use_actors=False`` runs the same kernel as cached-state tasks
    (``engine.state.cached_get``): identical semantics, no actor-spawn
    cost — preferred when the stage is one of many short executions
    (resumable per-partition runs); actors pay off on long stages.
    """
    poly_ref = ray.put(build_polygon_set(poly))
    if use_actors:
        return ds.map_batches(
            PIPJoiner,
            fn_constructor_args=(poly_ref,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )

    from engine.state import cached_get

    def fn(batch: pa.Table) -> pa.Table:
        return _pip_join_batch(cached_get(poly_ref), batch)

    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )


def _build_knn_state(cand: dict, k: int, res: int | None):
    return (
        np.asarray(cand["id"]),
        knn_mod.CellIndex(cand["lon"], cand["lat"], res=res, k_hint=max(8, k)),
    )


CHORD_MAX_CANDIDATES = 65536  # above this, ring walks beat the matmul


def _knn_batch(cand_ids, index, k: int, batch: pa.Table) -> pa.Table:
    lon = np.asarray(batch["lon"], dtype=np.float64)
    lat = np.asarray(batch["lat"], dtype=np.float64)
    if len(index.lon) <= CHORD_MAX_CANDIDATES:
        # exact + same (distance, row) tie-break as ring expansion
        nn, nd = knn_mod.knn_chord_topk(
            index.lon, index.lat, lon, lat, k=k, c_xyz=index.xyz
        )
    else:
        nn, nd = knn_mod.knn_ring_expand(index, lon, lat, k=k)
    n, kk = nn.shape
    valid = (nn >= 0).ravel()
    rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), kk)[valid])
    neigh = np.where(nn >= 0, nn, 0).ravel()[valid]
    return pa.table(
        {
            "image_id": pa.compute.take(batch["image_id"], rep),
            "neighbor_id": pa.array(cand_ids[neigh].astype(str), pa.string()),
            "rank": pa.array(np.tile(np.arange(kk, dtype=np.int32), n)[valid]),
            "dist_m": pa.array(nd.ravel()[valid], pa.float64()),
        }
    )


class KNNQuerier:
    """map_batches actor: per-row top-k nearest broadcast candidates."""

    def __init__(self, cand_ref, k: int, res: int | None):
        cand = ray.get(cand_ref)  # dict: id (array), lon, lat
        self.cand_ids, self.index = _build_knn_state(cand, k, res)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _knn_batch(self.cand_ids, self.index, self.k, batch)


def run_knn(
    ds: ray.data.Dataset,
    candidates: dict,
    *,
    k: int = 5,
    res: int | None = None,
    batch_size: int = 4096,
    concurrency=(2, 8),
    use_actors: bool = True,
) -> ray.data.Dataset:
    """images_indexed -> knn table (image_id, neighbor_id, rank, dist_m).

    Candidate side broadcast (suggestion semantics: candidates ≪ images).
    ``use_actors=False``: cached-state tasks (see ``run_pip_join``).
    For self-kNN over the full image table see
    ``engine.ops.geo_self_knn`` (halo-shuffle variant).
    """
    cand_ref = ray.put(
        {
            "id": np.asarray(candidates["id"]),
            "lon": np.asarray(candidates["lon"], dtype=np.float64),
            "lat": np.asarray(candidates["lat"], dtype=np.float64),
        }
    )
    if use_actors:
        return ds.map_batches(
            KNNQuerier,
            fn_constructor_args=(cand_ref, k, res),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )

    from engine.state import cached_get

    def fn(batch: pa.Table) -> pa.Table:
        cand_ids, index = cached_get(
            cand_ref, build=lambda c: _build_knn_state(c, k, res)
        )
        return _knn_batch(cand_ids, index, k, batch)

    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )
