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
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from engine import fixtures
from engine.io import read_images
from engine.pipeline import ingest, join, manifest, tile


import re

_NROWS_RE = re.compile(r"\.n(\d+)\.parquet$")


def _count_rows(d: str) -> int:
    """Rows in a stage output dir. Side-written files carry their row
    count in the filename (``<id>.n<rows>.parquet``) so counting is a
    directory listing, not thousands of driver-side metadata reads."""
    total = 0
    for f in glob.glob(os.path.join(d, "*.parquet")):
        m = _NROWS_RE.search(f)
        total += int(m.group(1)) if m else pq.read_metadata(f).num_rows
    return total


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
    pip_concurrency=None,
    decoder_concurrency=None,
    batch_size: int = 2048,
    run_id: str = "run",
    partition_threads: int = 1,
    use_actors: bool = True,
    fused: bool = True,
    read_blocks: int | None = None,
    planned: dict[str, list[str]] | None = None,
) -> dict:
    """Run (or resume) the full pipeline; returns summary counts.

    Partition = a group of input parquet fragments. Each partition runs
    ingest+join+knn+thumb-decode+tiling streaming Dataset work and
    commits a manifest row per stage on completion. The tile merge phase
    runs once at the end over ALL partitions' partial tiles (tiles span
    partitions), keyed by tile_key — its input is the small partial-tile
    table, not the image table.

    ``fused=True`` (default) runs each partition as ONE streaming
    execution: one read of the fragments, ingest once, and the joined /
    knn outputs are written as idempotent SIDE-WRITES from inside the
    pipeline (files named by each batch's first image_id; the partition
    dirs are cleared before recompute, so retries and resumes never
    duplicate rows). The manifest "join" row commits LAST and is the
    partition's completion marker. ``fused=False`` is the staged
    three-execution variant (one column-pruned read per stage), whose
    sinks are Ray-native ``write_parquet`` only.

    ``partition_threads`` > 1 runs that many partitions' streaming jobs
    concurrently from driver threads (independent executions; Ray
    arbitrates resources) — this overlaps per-execution scheduling gaps,
    the multi-node analog being one driverless job per partition under
    ``ray job submit``.
    """
    from engine.state import default_pool

    # cluster-derived pool caps (round-5: fixed caps are scaling
    # poison — see the LangId lesson in BASELINE.md); explicit
    # tuples still pass through for tests and small fixtures
    pip_concurrency = default_pool(pip_concurrency, mn=2, floor=8)
    decoder_concurrency = default_pool(decoder_concurrency, mn=2, floor=8)

    poly = poly or fixtures.polygons()
    man_dir = os.path.join(out_dir, "manifest")
    paths = sorted(glob.glob(os.path.join(images_dir, "*.parquet")))
    if not paths:
        raise FileNotFoundError(f"no parquet under {images_dir}")
    if planned is None:
        planned = manifest.plan_partitions(paths, target_partitions)
    # else: caller-supplied plan (incremental update reuses the prior
    # run's lineage plan so untouched partition ids stay stable)
    todo = manifest.plan_resume(man_dir, "join", planned) if resume else planned
    cand = _poly_centroids(poly)
    if fused:
        # fused path: packs scatter by tile shard at write time and the
        # merge ACCUMULATES (never materializes a group), so hot cells
        # need no salting and the bytes-free count pre-pass is skipped
        hot = {}
        num_tile_shards = max(4, int(ray.cluster_resources().get("CPU", 8)))
    else:
        hot = tile.hot_tile_salts(tile.count_tiles(paths, zoom=zoom))
        num_tile_shards = 0

    def _dirs(pid: str) -> tuple[str, str, str]:
        return (
            os.path.join(out_dir, "joined", pid),
            os.path.join(out_dir, "knn", pid),
            os.path.join(out_dir, "tile_partials", pid),
        )

    def _list_tile_partials(pdir: str) -> dict:
        """ONE partition-local listing of the partials this partition
        wrote, recorded into its manifest row's metrics — the global
        merge is then lineage-driven instead of a cluster-wide glob
        (O(files of one partition) metadata per writer, zero listing
        on the merge driver)."""
        out: dict = {"shard_files": {}, "files": []}
        if not os.path.isdir(pdir):
            return out
        for entry in sorted(os.listdir(pdir)):
            p = os.path.join(pdir, entry)
            if os.path.isdir(p) and entry.startswith("s"):
                out["shard_files"][entry] = sorted(
                    f for f in os.listdir(p) if f.endswith(".parquet")
                )
            elif entry.endswith(".parquet"):
                out["files"].append(entry)
        return out

    def run_partition_fused(pid: str, frags: list[str]) -> None:
        import shutil

        from engine.pipeline.join import (
            _build_knn_state, _knn_batch, _pip_join_batch, build_polygon_set,
        )
        from engine.state import cached_get

        jdir, kdir, pdir = _dirs(pid)
        for d in (jdir, kdir, pdir):  # idempotent recompute
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d, exist_ok=True)
        poly_ref = ray.put(build_polygon_set(poly))
        cand_ref = ray.put(
            {
                "id": np.asarray(cand["id"]),
                "lon": np.asarray(cand["lon"], dtype=np.float64),
                "lat": np.asarray(cand["lat"], dtype=np.float64),
            }
        )

        def side_write(table, d: str) -> None:
            if table.num_rows == 0:
                return
            name = table["image_id"][0].as_py()  # unique & stable per batch
            tmp = os.path.join(d, f".{name}.tmp")
            pq.write_table(table, tmp)
            os.replace(tmp, os.path.join(d, f"{name}.n{table.num_rows}.parquet"))

        def join_knn_stage(batch):
            joined = _pip_join_batch(cached_get(poly_ref), batch)
            side_write(joined, jdir)
            knn_t = _knn_batch(
                *cached_get(cand_ref, build=lambda c: _build_knn_state(c, knn_k, None)),
                knn_k, batch,
            )
            side_write(knn_t, kdir)
            # prune for the tile path: the only shuffle downstream should
            # move thumbs + keys, not captions/cell columns
            return batch.select(["image_id", "bytes", "fmt", "lon", "lat"])

        ds = read_images(
            frags, columns=["image_id", "caption", "bytes", "fmt"],
            override_num_blocks=read_blocks,
        )
        indexed = ingest.run_ingest(ds, batch_size=batch_size)
        staged = indexed.map_batches(
            join_knn_stage, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
        )
        keyed = staged.map_batches(
            lambda b: tile.add_tile_keys(b, zoom), batch_format="pyarrow"
        )
        thumbed = keyed.map_batches(
            tile.thumb_decode_batch, batch_format="pyarrow",
            batch_size=batch_size, num_cpus=1,
        )
        salted = thumbed.map_batches(
            lambda b: tile.add_salt(b, hot), batch_format="pyarrow"
        )

        # pack combiner + tile-shard scatter: the partition stays a pure
        # shuffle-free stream (read -> maps -> side-writes). Pack rows
        # land in s<k> subdirs by tile_key % num_tile_shards, so each
        # merge task later reads exactly its own rows.
        def pack_scatter(batch):
            packs = tile.pack_draws_batch(batch)
            if packs.num_rows:
                keys = np.asarray(packs["tile_key"], dtype=np.int64) % num_tile_shards
                name = packs["members"][0][0].as_py()  # stable per batch
                for k in np.unique(keys):
                    sub = packs.filter(pa.array(keys == k))
                    d = os.path.join(pdir, f"s{int(k):05d}")
                    os.makedirs(d, exist_ok=True)
                    tmp = os.path.join(d, f".{name}.tmp")
                    pq.write_table(sub, tmp)
                    os.replace(tmp, os.path.join(d, f"{name}.n{sub.num_rows}.parquet"))
            return pa.table({"n": pa.array([packs.num_rows], pa.int64())})

        prows = salted.map_batches(
            pack_scatter, batch_format="pyarrow", batch_size=16384
        ).sum("n") or 0
        manifest.write_manifest_row(
            man_dir, partition_id=pid, stage="tile_partials",
            input_fragment_ids=frags, row_count=int(prows), run_id=run_id,
            metrics=_list_tile_partials(pdir),
        )
        manifest.write_manifest_row(
            man_dir, partition_id=pid, stage="knn", input_fragment_ids=frags,
            row_count=_count_rows(kdir), run_id=run_id,
        )
        manifest.write_manifest_row(  # completion marker: committed last
            man_dir, partition_id=pid, stage="join", input_fragment_ids=frags,
            row_count=_count_rows(jdir), run_id=run_id,
        )

    def run_partition_staged(pid: str, frags: list[str]) -> None:
        jdir, kdir, pdir = _dirs(pid)
        # prune at the read: the join needs no image bytes
        ds = read_images(frags, columns=["image_id", "caption"])
        indexed = ingest.run_ingest(ds, batch_size=batch_size)
        # ---- joined (streamed to parquet, one dir per partition)
        joined = join.run_pip_join(
            indexed, poly, batch_size=batch_size, concurrency=pip_concurrency,
            use_actors=use_actors,
        )
        joined.write_parquet(jdir)
        # ---- knn
        indexed2 = ingest.run_ingest(
            read_images(frags, columns=["image_id"]), batch_size=batch_size
        )
        knn_ds = join.run_knn(
            indexed2, cand, k=knn_k, batch_size=batch_size,
            concurrency=pip_concurrency, use_actors=use_actors,
        )
        knn_ds.write_parquet(kdir)
        # ---- partial tiles (decode -> salted compose), merge happens later
        indexed3 = ingest.run_ingest(
            read_images(frags, columns=["image_id", "bytes", "fmt"]),
            batch_size=batch_size,
        )
        keyed = indexed3.map_batches(
            lambda b: tile.add_tile_keys(b, zoom), batch_format="pyarrow"
        )
        if use_actors:
            thumbed = keyed.map_batches(
                tile.ThumbDecoder,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=decoder_concurrency,
                num_cpus=1,
            )
        else:
            thumbed = keyed.map_batches(
                tile.thumb_decode_batch,
                batch_format="pyarrow",
                batch_size=batch_size,
                num_cpus=1,
            )
        salted = thumbed.map_batches(
            lambda b: tile.add_salt(b, hot), batch_format="pyarrow"
        )
        partials = salted.groupby("salt_key").map_groups(
            tile.compose_partial, batch_format="pyarrow"
        )
        partials.write_parquet(pdir)
        manifest.write_manifest_row(
            man_dir, partition_id=pid, stage="tile_partials",
            input_fragment_ids=frags, row_count=_count_rows(pdir), run_id=run_id,
            metrics=_list_tile_partials(pdir),
        )
        manifest.write_manifest_row(
            man_dir, partition_id=pid, stage="knn", input_fragment_ids=frags,
            row_count=_count_rows(kdir), run_id=run_id,
        )
        manifest.write_manifest_row(
            man_dir, partition_id=pid, stage="join", input_fragment_ids=frags,
            row_count=_count_rows(jdir), run_id=run_id,
        )

    run_partition = run_partition_fused if fused else run_partition_staged

    items = sorted(todo.items())
    if partition_threads > 1 and len(items) > 1:
        # pre-warm lazy imports that race under concurrent first-import
        try:
            import fsspec.implementations.http  # noqa: F401
        except ImportError:
            pass
        with ThreadPoolExecutor(max_workers=partition_threads) as pool:
            futures = [pool.submit(run_partition, pid, frags) for pid, frags in items]
            for f in futures:
                f.result()
    else:
        for pid, frags in items:
            run_partition(pid, frags)

    # ---- global tile merge (small input: one partial row per tile/salt/partition)
    merge_todo = manifest.plan_resume(man_dir, "tiles", {"all": []}) if resume else {"all": []}
    tdir = os.path.join(out_dir, "tiles")
    if merge_todo:
        import shutil

        shutil.rmtree(tdir, ignore_errors=True)  # idempotent remerge
        # lineage-driven listing: each partition's manifest row carries
        # the exact partial files it wrote (metrics.shard_files/files),
        # so the merge reads lineage instead of walking the output tree
        import json as _json

        sharded: list[str] = []
        pglob: list[str] = []
        mtab = manifest.read_manifest(man_dir)
        seen_manifest = set()
        if mtab.num_rows:
            for rec in mtab.to_pylist():
                if (rec["stage"] != "tile_partials"
                        or rec["status"] != "done"
                        or rec["partition_id"] not in planned):
                    continue
                seen_manifest.add(rec["partition_id"])
                met = _json.loads(rec["metrics"] or "{}")
                base = os.path.join(out_dir, "tile_partials",
                                    rec["partition_id"])
                for shard, files in sorted(met.get("shard_files", {}).items()):
                    sharded.extend(os.path.join(base, shard, f) for f in files)
                pglob.extend(os.path.join(base, f)
                             for f in met.get("files", []))
        if seen_manifest != set(planned):
            # back-compat: manifests predating the metrics listing
            # (or partial coverage) fall back to the directory walk
            sharded = sorted(glob.glob(
                os.path.join(out_dir, "tile_partials", "*", "s*", "*.parquet")
            ))
            pglob = sorted(glob.glob(
                os.path.join(out_dir, "tile_partials", "*", "*.parquet")
            ))
        else:
            sharded, pglob = sorted(sharded), sorted(pglob)
        if sharded:
            # fused path: packs pre-scattered by tile shard; one raw Ray
            # task per shard accumulates + writes its tiles directly
            groups: dict[str, list[str]] = {}
            for f in sharded:
                groups.setdefault(os.path.basename(os.path.dirname(f)), []).append(f)
            tile.merge_pack_shards(groups, tdir, zoom)
        else:  # canvas/draw partials (staged path): groupby merge
            # coalesce: sort-shuffle cost grows superlinearly in block
            # count (measured 7x between 450 and 64 blocks, same bytes)
            partial_ds = ray.data.read_parquet(
                pglob, override_num_blocks=min(64, len(pglob))
            )
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
