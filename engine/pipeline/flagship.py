"""Flagship pipeline: ingest -> PIP join -> kNN -> tiling, resumable.

The end-to-end job the benchmark and ``__ray_entry__.entry()`` run
(SURVEY.md §3.2): partitioned by input fragment groups, one manifest row
per (stage, partition), resume = anti-join vs the manifest. Stage
outputs are parquet directories named by partition id so re-runs
overwrite idempotently and never produce one giant file.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq

import ray.data

from engine import fixtures
from engine.io import read_images
from engine.pipeline import ingest, join, manifest, tile


def _count_rows(d: str) -> int:
    return sum(
        pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(d, "*.parquet"))
    )


def _poly_centroids(poly: dict) -> dict:
    """kNN candidate set: polygon centroids (suggestion semantics)."""
    return {
        "id": poly["admin_id"],
        "lon": np.array([r.mean() for r in poly["ring_lon"]]),
        "lat": np.array([r.mean() for r in poly["ring_lat"]]),
    }


def run_flagship(
    images_dir: str,
    out_dir: str,
    *,
    poly: dict | None = None,
    zoom: int = tile.DEFAULT_ZOOM,
    knn_k: int = 5,
    target_partitions: int = 4,
    resume: bool = True,
    pip_concurrency=(2, 8),
    decoder_concurrency=(2, 8),
    batch_size: int = 2048,
    run_id: str = "run",
) -> dict:
    """Run (or resume) the full pipeline; returns summary counts.

    Partition = a group of input parquet fragments. Each partition runs
    ingest+join+knn+thumb-decode+tiling as one streaming Dataset job and
    commits a manifest row per stage on completion. The tile merge phase
    runs once at the end over ALL partitions' partial tiles (tiles span
    partitions), keyed by tile_key — its input is the small partial-tile
    table, not the image table.
    """
    poly = poly or fixtures.polygons()
    man_dir = os.path.join(out_dir, "manifest")
    paths = sorted(glob.glob(os.path.join(images_dir, "*.parquet")))
    if not paths:
        raise FileNotFoundError(f"no parquet under {images_dir}")
    planned = manifest.plan_partitions(paths, target_partitions)
    todo = manifest.plan_resume(man_dir, "join", planned) if resume else planned
    cand = _poly_centroids(poly)
    hot = tile.count_tiles(paths, zoom=zoom)
    hot = tile.hot_tile_salts(hot)

    for pid, frags in sorted(todo.items()):
        # prune at the read: the join needs no image bytes
        ds = read_images(frags, columns=["image_id", "caption"])
        indexed = ingest.run_ingest(ds, batch_size=batch_size)
        # ---- joined (streamed to parquet, one dir per partition)
        joined = join.run_pip_join(
            indexed, poly, batch_size=batch_size, concurrency=pip_concurrency
        )
        jdir = os.path.join(out_dir, "joined", pid)
        joined.write_parquet(jdir)
        jrows = _count_rows(jdir)
        manifest.write_manifest_row(
            man_dir, partition_id=pid, stage="join", input_fragment_ids=frags,
            row_count=jrows, run_id=run_id,
        )
        # ---- knn
        indexed2 = ingest.run_ingest(
            read_images(frags, columns=["image_id"]), batch_size=batch_size
        )
        knn_ds = join.run_knn(
            indexed2, cand, k=knn_k, batch_size=batch_size,
            concurrency=pip_concurrency,
        )
        kdir = os.path.join(out_dir, "knn", pid)
        knn_ds.write_parquet(kdir)
        krows = _count_rows(kdir)
        manifest.write_manifest_row(
            man_dir, partition_id=pid, stage="knn", input_fragment_ids=frags,
            row_count=krows, run_id=run_id,
        )
        # ---- partial tiles (decode -> salted compose), merge happens later
        indexed3 = ingest.run_ingest(
            read_images(frags, columns=["image_id", "bytes", "fmt"]),
            batch_size=batch_size,
        )
        keyed = indexed3.map_batches(
            lambda b: tile.add_tile_keys(b, zoom), batch_format="pyarrow"
        )
        thumbed = keyed.map_batches(
            tile.ThumbDecoder,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=decoder_concurrency,
            num_cpus=1,
        )
        salted = thumbed.map_batches(
            lambda b: tile.add_salt(b, hot), batch_format="pyarrow"
        )
        partials = salted.groupby("salt_key").map_groups(
            tile.compose_partial, batch_format="pyarrow"
        )
        pdir = os.path.join(out_dir, "tile_partials", pid)
        partials.write_parquet(pdir)
        prows = _count_rows(pdir)
        manifest.write_manifest_row(
            man_dir, partition_id=pid, stage="tile_partials",
            input_fragment_ids=frags, row_count=prows, run_id=run_id,
        )

    # ---- global tile merge (small input: one partial row per tile/salt/partition)
    merge_todo = manifest.plan_resume(man_dir, "tiles", {"all": []}) if resume else {"all": []}
    tdir = os.path.join(out_dir, "tiles")
    if merge_todo:
        pglob = glob.glob(os.path.join(out_dir, "tile_partials", "*", "*.parquet"))
        partial_ds = ray.data.read_parquet(pglob)
        tiles = partial_ds.groupby("tile_key").map_groups(
            lambda g: tile.merge_partials(g, zoom), batch_format="pyarrow"
        )
        tiles.write_parquet(tdir)
        trows = _count_rows(tdir)
        manifest.write_manifest_row(
            man_dir, partition_id="all", stage="tiles",
            input_fragment_ids=sorted(planned), row_count=trows, run_id=run_id,
        )
    return {
        "partitions": len(planned),
        "resumed_skipped": len(planned) - len(todo),
        "joined_rows": manifest.stage_row_count(man_dir, "join"),
        "knn_rows": manifest.stage_row_count(man_dir, "knn"),
        "tiles": manifest.stage_row_count(man_dir, "tiles"),
        "out_dir": out_dir,
    }
