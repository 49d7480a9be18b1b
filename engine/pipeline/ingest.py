"""Ingest stage: geotag derivation + H3/S2 cell encoding (SURVEY.md M1-M3).

One vectorized ``map_batches`` over zero-copy Arrow batches adds to the
images table:

- ``lon``, ``lat``          float64 geotags (deterministic per row; rows
                            with invalid coordinates are dropped, like the
                            reference drops geometry-less OSM objects)
- ``h3_r5`` .. ``h3_r12``   uint64 H3-like cells, one column per res
                            (equivalent to the ``h3_cells`` list column of
                            SURVEY.md §1.2 but directly groupby-able)
- ``s2_cell``               uint64 S2-like cell at ``S2_LEVEL`` (exact
                            prefix hierarchy → range-partitionable key)
- ``caption_canon``         canonicalized caption (M4: underscores→spaces,
                            first-letter title case on the title part)

The stage is stateless and embarrassingly parallel: no shuffle, no actor
state, Arrow in / Arrow out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from engine import fixtures
from engine.geo import h3like, s2like

H3_RESOLUTIONS = tuple(range(5, 13))
S2_LEVEL = 16


def canonicalize_captions(caption: pa.Array) -> pa.Array:
    """``lang:Title`` canonical form — vectorized Arrow kernels (M4).

    Mirrors the reference's wikipedia-tag normalization semantics
    (underscores to spaces, first letter of the title upper-cased);
    the lang prefix is preserved as-is.
    """
    parts = pc.split_pattern(caption, ":", max_splits=1)
    lang = pc.list_element(parts, 0)
    title = pc.list_element(parts, 1)
    title = pc.replace_substring(title, "_", " ")
    first = pc.utf8_upper(pc.utf8_slice_codeunits(title, 0, 1))
    rest = pc.utf8_slice_codeunits(title, 1, 2**31 - 1)
    title = pc.binary_join_element_wise(first, rest, "")
    return pc.binary_join_element_wise(lang, title, ":")


def derive_geotags(image_id: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-row geotag: pure function of the numeric part of
    image_id (fixture convention ``img%09d``, FIXTURES.md B.1)."""
    ids = pc.utf8_slice_codeunits(image_id, 3, 2**31 - 1)
    i = np.asarray(pc.cast(ids, pa.int64()))
    return fixtures.row_lonlat(i)


def index_batch(batch: pa.Table) -> pa.Table:
    """The ingest map_batches body: geotag + encode + canonicalize."""
    lon, lat = derive_geotags(batch["image_id"])
    valid = (
        np.isfinite(lon) & np.isfinite(lat)
        & (np.abs(lon) <= 180.0) & (np.abs(lat) <= 90.0)
    )
    if not valid.all():
        batch = batch.filter(pa.array(valid))
        lon, lat = lon[valid], lat[valid]
    batch = batch.append_column("lon", pa.array(lon, pa.float64()))
    batch = batch.append_column("lat", pa.array(lat, pa.float64()))
    for res in H3_RESOLUTIONS:
        batch = batch.append_column(
            f"h3_r{res}", pa.array(h3like.encode(lon, lat, res), pa.uint64())
        )
    batch = batch.append_column(
        "s2_cell", pa.array(s2like.encode(lon, lat, S2_LEVEL), pa.uint64())
    )
    if "caption" in batch.column_names:  # column-pruned reads may drop it
        batch = batch.append_column(
            "caption_canon", canonicalize_captions(batch["caption"])
        )
    return batch


def run_ingest(ds: ray.data.Dataset, batch_size: int = 4096) -> ray.data.Dataset:
    """images -> images_indexed (lazy; caller consumes/writes)."""
    return ds.map_batches(
        index_batch, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
