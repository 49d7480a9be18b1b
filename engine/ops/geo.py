"""Distributed geo operators beyond the broadcast flagship stages.

``self_knn_halo``: kNN of every row against the WHOLE table (no
broadcastable candidate side — the both-big case, SURVEY T2 phase 2).

Partitioning scheme: each point is assigned to its coarse H3-like cell;
a ``flat_map``-style batch stage also emits GHOST copies of each point
into the ``halo_rings`` neighboring cells. One ``groupby(cell)`` then
co-locates every point with all candidates that could be among its k
nearest, and ``map_groups`` runs an exact local kNN for the group's
non-ghost members.

PARTITIONING ASSUMPTION (documented per the brief): results are exact
iff each point's true k-th neighbor lies within ``halo_rings`` rings of
its coarse cell — i.e. local density ensures >= k candidates within
``(1.5*halo_rings - 2) * cell_size`` degrees. Choose ``coarse_res`` so
the expected per-cell count >> k. The fixture test verifies exactness
vs brute force at the chosen setting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from engine.geo import h3like, knn as knn_mod


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
    """image table with lon/lat -> (image_id, neighbor_id, rank, dist_m).

    One shuffle (groupby coarse cell); ghosts multiply rows by
    ~1 + 6*halo_rings * (boundary fraction), the explicit cost of
    exactness without an all-to-all.
    """

    def explode(batch: pa.Table) -> pa.Table:
        return _halo_explode(batch, coarse_res, halo_rings)

    def local_knn(g: pd.DataFrame) -> pd.DataFrame:
        own = g[~g["ghost"]]
        if own.empty:
            return pd.DataFrame(
                {"image_id": pd.Series(dtype=str),
                 "neighbor_id": pd.Series(dtype=str),
                 "rank": pd.Series(dtype=np.int32),
                 "dist_m": pd.Series(dtype=np.float64)}
            )
        # candidates: every row in the group (dedup ghosts of same id)
        cand = g.drop_duplicates("image_id")
        c_lon, c_lat = cand["lon"].to_numpy(), cand["lat"].to_numpy()
        c_ids = cand["image_id"].to_numpy()
        order = np.argsort(c_ids, kind="stable")
        c_lon, c_lat, c_ids = c_lon[order], c_lat[order], c_ids[order]
        q_ids = own["image_id"].to_numpy()
        self_rows = np.searchsorted(c_ids, q_ids)
        nn, nd = knn_mod.knn_brute_force(
            c_lon, c_lat, own["lon"].to_numpy(), own["lat"].to_numpy(),
            k, exclude_self_rows=self_rows,
        )
        valid = nn >= 0
        n, kk = nn.shape
        rep = np.repeat(q_ids, kk)[valid.ravel()]
        return pd.DataFrame(
            {
                "image_id": rep,
                "neighbor_id": c_ids[np.where(valid, nn, 0)].ravel()[valid.ravel()],
                "rank": np.tile(np.arange(kk, dtype=np.int32), n)[valid.ravel()],
                "dist_m": np.round(nd.ravel()[valid.ravel()], 6),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return exploded.groupby("cell").map_groups(local_knn, batch_format="pandas")
