"""Source/sink seam (SURVEY.md S1/S4): parquet today, Lance-shaped schema.

The driver's input hint specifies a Lance table of image+caption pairs
(BASELINE.json:15); no ``lance`` wheel exists in this sandbox (SURVEY.md
§7.1), so storage is parquet carrying the exact Lance logical schema.
``read_images`` is the single indirection every pipeline uses — swapping
in ``ray.data.read_lance`` later touches only this module.
"""

from __future__ import annotations

import sys
import types

import ray.data


def _stub_fsspec_http() -> None:
    """Make ``from fsspec.implementations.http import HTTPFileSystem``
    deterministic and thread-safe.

    In this sandbox ``aiohttp`` is absent, so that import fails on every
    attempt; under CONCURRENT first-import (threaded partition runs) the
    failure can surface as a plain ``ImportError`` that Ray's
    ``except ModuleNotFoundError`` in ``path_util._is_http_filesystem``
    does not catch. A sentinel class (never instantiated — no real
    HTTPFileSystem can exist without aiohttp) keeps the isinstance check
    correct (always False)."""
    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ImportError:
        pass
    try:
        import fsspec.implementations
    except ImportError:  # no fsspec at all: nothing to stub
        return
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel only
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    fsspec.implementations.http = mod


_stub_fsspec_http()

IMAGE_COLUMNS = ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")


def read_images(
    uri: str | list[str],
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Read the primary images table, pruning columns at the read
    (SURVEY.md "prune at the read"). ``override_num_blocks`` coalesces
    small files into fewer, fatter blocks — fewer tasks means less
    driver-side coordination, which is the scaling bottleneck when many
    streaming executions share one driver."""
    return ray.data.read_parquet(
        uri,
        columns=list(columns) if columns else None,
        override_num_blocks=override_num_blocks,
    )


def read_table(uri: str | list[str], columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(uri, columns=list(columns) if columns else None)


def sf_table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """One of the driver's TPC-H-ish tables (TESTDATA.md)."""
    return read_table(f"{sf_dir}/{name}.parquet", columns)


_FORMAT_READERS = {
    "parquet": "read_parquet",
    "csv": "read_csv",
    "json": "read_json",
}


def read_any(
    uri: str | list[str],
    fmt: str = "parquet",
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Format-dispatching read seam (SURVEY S2 residue: the reference
    ingests XML/CSV side files next to its main extract). Column
    pruning is pushed into the reader only for parquet — csv/json are
    row-major formats, so pruning happens right after the read via
    ``select_columns`` (still before any wide op)."""
    if fmt not in _FORMAT_READERS:
        raise ValueError(f"unsupported format: {fmt!r}")
    if fmt == "parquet":
        return read_table(uri, columns)
    ds = getattr(ray.data, _FORMAT_READERS[fmt])(uri)
    return ds.select_columns(list(columns)) if columns else ds


def write_any(ds: ray.data.Dataset, out_dir: str, fmt: str = "parquet") -> None:
    """Format-dispatching sink twin of ``read_any``."""
    if fmt == "parquet":
        ds.write_parquet(out_dir)
    elif fmt == "csv":
        ds.write_csv(out_dir)
    elif fmt == "json":
        ds.write_json(out_dir)
    else:
        raise ValueError(f"unsupported format: {fmt!r}")


def bucket_of(values, num_buckets: int):
    """Deterministic storage-bucket id of a key array: pandas
    ``hash_array`` (fixed-key siphash — stable across processes and
    nodes, unlike Python's randomized ``hash``) mod ``num_buckets``.
    ONE function so every writer and every reader agrees on the
    layout."""
    import numpy as np
    from pandas.util import hash_array

    return (hash_array(values, categorize=False) % num_buckets).astype(np.int32)


def write_bucketed(
    ds: ray.data.Dataset, out_dir: str, key: str, num_buckets: int
) -> None:
    """Materialize a table hash-bucketed by ``key`` (hive layout
    ``bucket=<k>/``). The point at 100 TB: pay the partitioning ONCE at
    write time, then every later equi-join/groupby on the same key is
    shuffle-free — tasks read bucket k of each side and join locally
    (``ops.relational.colocated_join``). The "pick ONE partitioning key
    and reuse it across stages" rule, made durable."""
    import pandas as pd

    def add_bucket(b: "pd.DataFrame") -> "pd.DataFrame":
        b = b.copy()
        b["bucket"] = bucket_of(b[key].to_numpy(), num_buckets)
        return b

    ds.map_batches(add_bucket, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["bucket"]
    )


def bucketed_schema(bucketed_dir: str):
    """Arrow schema of a bucketed layout — one parquet-footer read of
    the first file found (all files share the write schema)."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{bucketed_dir}/bucket=*/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no bucket files under {bucketed_dir}")
    return pq.read_schema(files[0])


def read_bucket_pandas(bucketed_dir: str, bucket: int, columns=None):
    """All rows of one storage bucket as pandas (task-local read)."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{bucketed_dir}/bucket={bucket}/*.parquet"))
    if not files:
        return None
    tabs = [pq.read_table(f, columns=list(columns) if columns else None)
            for f in files]
    import pyarrow as pa

    return pa.concat_tables(tabs).to_pandas()


def write_range_partitioned(
    ds: ray.data.Dataset, out_dir: str, key: str, num_buckets: int
) -> None:
    """Materialize a table RANGE-partitioned on an integer ``key``
    (hive layout ``rbucket=<k>/``, rows inside each bucket sorted by
    the key) plus a ``_zonemap.json`` of per-bucket (lo, hi, rows).
    The ordered twin of ``write_bucketed``: hash buckets serve
    equi-joins, range buckets serve scans — a later key-range read
    opens ONLY overlapping buckets (zone-map pruning), and ordered
    consumers (merges, as-of probes, packing) read each bucket
    pre-sorted. One span pass + one range shuffle, same plan as
    ``ops.relational.ordered_prefix_sum``."""
    import json

    import numpy as np
    import pandas as pd

    def key_span(b: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({"__lo": [b[key].min()], "__hi": [b[key].max()]})

    span = ds.map_batches(key_span, batch_format="pandas").to_pandas()
    lo, hi = int(span["__lo"].min()), int(span["__hi"].max())
    width = max(1, (hi - lo + num_buckets) // num_buckets)

    def add_bucket(b: "pd.DataFrame") -> "pd.DataFrame":
        b = b.copy()
        b["rbucket"] = (b[key].to_numpy() - lo) // width
        return b

    def sort_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.sort_values(key, kind="stable", ignore_index=True)

    (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("rbucket")
        .map_groups(sort_bucket, batch_format="pandas")
        .write_parquet(out_dir, partition_cols=["rbucket"])
    )
    zonemap = {"key": key, "lo": lo, "width": width,
               "num_buckets": num_buckets}
    with open(f"{out_dir}/_zonemap.json", "w") as f:
        json.dump(zonemap, f)


def read_key_range(
    dir_: str, lo: int, hi: int, columns=None
) -> ray.data.Dataset:
    """Scan of ``[lo, hi]`` (inclusive) over a ``write_range_
    partitioned`` layout: the zone map turns the range into bucket
    ids, ONLY those hive dirs are listed/read, and the residual
    row filter runs inside the (column-pruned) read. At 100 TB a
    1% key range touches ~1% of files — pruning at the directory
    level, before any task is scheduled."""
    import glob
    import json

    with open(f"{dir_}/_zonemap.json") as f:
        zm = json.load(f)
    b0 = max(0, (lo - zm["lo"]) // zm["width"])
    b1 = (hi - zm["lo"]) // zm["width"]
    files: list[str] = []
    for k in range(int(b0), int(b1) + 1):
        files.extend(sorted(glob.glob(f"{dir_}/rbucket={k}/*.parquet")))
    key = zm["key"]
    ds = ray.data.read_parquet(
        files, columns=list(columns) if columns else None
    )
    return ds.filter(expr=f"{key} >= {lo} and {key} <= {hi}")


def write_tar_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    key_col: str,
    payload_cols: Sequence[str],
    order_col: str,
    shard_budget_bytes: int = 1 << 20,
) -> pd.DataFrame:
    """WebDataset-style sink: pack rows into sequential ``.tar`` shards
    (one member per payload column, named ``<key>.<col>``) — the file
    layout multimodal training loaders stream. Shard assignment is the
    byte-budget analog of token packing: one distributed ordered
    prefix sum over per-row payload sizes, ``shard = excl_cumsum //
    budget``, then ONE range shuffle co-locates each shard, which is
    written atomically (tmp + rename, idempotent on re-run — the
    resumable-output rule). Deterministic: same input -> byte-identical
    shards. Returns the shard manifest (shard_id, path, rows, bytes).
    """
    import os

    import numpy as np
    import pandas as pd

    from engine.ops import relational

    def sizes(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__nbytes"] = sum(
            b[c].map(len).to_numpy(dtype=np.int64) for c in payload_cols
        )
        return b

    sized = ds.map_batches(sizes, batch_format="pandas")
    scanned = relational.ordered_prefix_sum(
        sized, order_col, "__nbytes", out_col="__run"
    )

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b["__shard"] = (b["__run"] - b["__nbytes"]) // shard_budget_bytes
        return b

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        import io
        import tarfile

        g = g.sort_values(order_col, kind="stable")
        sid = int(g["__shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{sid:06d}.tar")
        tmp = path + ".tmp"
        total = 0
        with tarfile.open(tmp, "w") as tar:
            for _, row in g.iterrows():
                for c in payload_cols:
                    data = bytes(row[c])
                    info = tarfile.TarInfo(name=f"{row[key_col]}.{c}")
                    info.size = len(data)
                    info.mtime = 0  # deterministic archive bytes
                    tar.addfile(info, io.BytesIO(data))
                    total += len(data)
        os.replace(tmp, path)
        return pd.DataFrame([{
            "shard_id": sid, "path": path, "rows": len(g),
            "bytes": int(total),
        }])

    manifest = (
        scanned.map_batches(assign, batch_format="pandas")
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
        .sort_values("shard_id", ignore_index=True)
    )
    return manifest


def _interleave_bits16(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
    """Morton/Z-value of two uint16 arrays (vectorized bit spread)."""
    import numpy as np

    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
        return x

    return (spread(a) | (spread(b) << np.uint64(1))).astype(np.int64)


def write_zordered(
    ds: ray.data.Dataset,
    out_dir: str,
    col_a: str,
    col_b: str,
    num_buckets: int = 64,
) -> None:
    """Z-order-clustered layout over TWO numeric columns: rows sort by
    the Morton interleave of their (quantized) coordinates, range-
    bucket into hive dirs, and a 2-D zone map (per-bucket min/max of
    BOTH columns) lands in ``_zonemap2.json``. Because Z-order keeps
    2-D-close rows in the same bucket, the per-bucket boxes are TIGHT,
    so a rectangle query (``read_rect``) skips most buckets — the
    data-skipping layout for geo scans (Delta/Iceberg OPTIMIZE ZORDER
    semantics, public technique). Two passes: span + the one range
    shuffle that also computes the zone map."""
    import json

    import numpy as np
    import pandas as pd

    def span(b: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({
            "alo": [float(b[col_a].min())], "ahi": [float(b[col_a].max())],
            "blo": [float(b[col_b].min())], "bhi": [float(b[col_b].max())],
        })

    ds = ds.materialize()  # consumed by span pass + write pass
    s = ds.map_batches(span, batch_format="pandas").to_pandas()
    alo, ahi = float(s["alo"].min()), float(s["ahi"].max())
    blo, bhi = float(s["blo"].min()), float(s["bhi"].max())

    def quant(v, lo, hi):
        import numpy as np

        x = (np.asarray(v, dtype=np.float64) - lo) / max(hi - lo, 1e-300)
        return np.clip((x * 65535.0).astype(np.int64), 0, 65535).astype("uint16")

    def add_z(b: "pd.DataFrame") -> "pd.DataFrame":
        b = b.copy()
        z = _interleave_bits16(quant(b[col_a], alo, ahi),
                               quant(b[col_b], blo, bhi))
        b["zbucket"] = (z // max(1, (1 << 32) // num_buckets)).astype(np.int64)
        b["__z"] = z
        return b

    def sort_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.sort_values("__z", kind="stable").drop(columns="__z")

    zed = ds.map_batches(add_z, batch_format="pandas")
    zed.groupby("zbucket").map_groups(
        sort_bucket, batch_format="pandas"
    ).write_parquet(out_dir, partition_cols=["zbucket"])

    from engine.ops.relational import partial_groupby_agg

    zm = partial_groupby_agg(
        zed, ["zbucket"],
        {"amin": (col_a, "min"), "amax": (col_a, "max"),
         "bmin": (col_b, "min"), "bmax": (col_b, "max")},
    ).to_pandas()
    with open(f"{out_dir}/_zonemap2.json", "w") as f:
        json.dump({"col_a": col_a, "col_b": col_b,
                   "buckets": zm.to_dict("records")}, f)


def read_rect(
    dir_: str,
    a_range: tuple[float, float],
    b_range: tuple[float, float],
    columns=None,
) -> ray.data.Dataset:
    """Rectangle scan over a ``write_zordered`` layout: the 2-D zone
    map drops every bucket whose box misses the rectangle BEFORE any
    task schedules; the residual row filter runs inside the read."""
    import glob
    import json

    with open(f"{dir_}/_zonemap2.json") as f:
        zm = json.load(f)
    (a0, a1), (b0, b1) = a_range, b_range
    files: list[str] = []
    for e in zm["buckets"]:
        if e["amax"] >= a0 and e["amin"] <= a1 and \
           e["bmax"] >= b0 and e["bmin"] <= b1:
            files.extend(sorted(
                glob.glob(f"{dir_}/zbucket={e['zbucket']}/*.parquet")))
    ca, cb = zm["col_a"], zm["col_b"]
    ds = ray.data.read_parquet(
        files, columns=list(columns) if columns else None
    )
    return ds.filter(
        expr=f"{ca} >= {a0} and {ca} <= {a1} and {cb} >= {b0} and {cb} <= {b1}"
    )


def coalesce_to_target(
    ds: ray.data.Dataset, target_mb: int = 96
) -> ray.data.Dataset:
    """Repartition to ~``target_mb`` blocks using Dataset METADATA
    (``size_bytes`` — no scan). Block-count discipline, automated: too
    many small blocks pay per-task dispatch (measured 7x on a
    sort-shuffle between 450 and 64 blocks of identical bytes); too few
    starve the pool. No-op when the count is already within 2x."""
    size = ds.size_bytes()
    if not size or size <= 0:
        return ds
    want = max(1, int(size // (target_mb * 1024 * 1024)) or 1)
    try:  # only MaterializedDataset knows its block count (Ray 2.49)
        cur = ds.num_blocks()
    except NotImplementedError:
        cur = None
    if cur is not None and want <= cur <= want * 2:
        return ds  # already within 2x of target: no-op
    return ds.repartition(want)


def write_cell_partitioned(
    ds: ray.data.Dataset, out_dir: str, level: int = 4
) -> None:
    """Materialize a point table SPATIALLY partitioned by its S2-like
    cell at ``level`` (hive layout ``cell=<id>/``). The geo twin of
    ``write_bucketed``: pay the spatial clustering ONCE at write time,
    then every later spatial-predicate scan (polygon containment,
    radius, bbox) prunes to the predicate's cell cover at the
    DIRECTORY level — at 100 TB a city-sized polygon touches a handful
    of the planet's cells, before any task schedules."""
    import json

    import numpy as np
    import pandas as pd

    from engine.geo import s2like

    def add_cell(b: "pd.DataFrame") -> "pd.DataFrame":
        b = b.copy()
        cells = s2like.encode(
            b["lon"].to_numpy(np.float64),
            b["lat"].to_numpy(np.float64), level)
        # uint64 ids don't survive hive-partition round-trips; the dir
        # name is the decimal string (readers parse it back)
        b["cell"] = np.char.mod("%d", cells)
        return b

    ds.map_batches(add_cell, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["cell"]
    )
    with open(f"{out_dir}/_cellmap.json", "w") as f:
        json.dump({"level": level}, f)


def read_cell_cover(
    dir_: str, cover: "np.ndarray", columns=None
) -> ray.data.Dataset:
    """Scan of a ``write_cell_partitioned`` layout pruned to a cell
    cover (e.g. ``s2like.covering`` of a polygon): only hive dirs whose
    cell is contained in some cover cell are listed/read. Over-coverage
    is safe — the caller applies its exact residual predicate (PIP,
    haversine) on the surviving rows."""
    import glob
    import json
    import os

    import numpy as np

    from engine.geo import s2like

    with open(f"{dir_}/_cellmap.json") as f:
        json.load(f)  # layout marker; level is implicit in the ids
    dirs = sorted(glob.glob(f"{dir_}/cell=*"))
    cell_ids = np.array(
        [np.uint64(os.path.basename(d).split("=", 1)[1]) for d in dirs],
        dtype=np.uint64,
    )
    cover = np.asarray(cover, dtype=np.uint64)
    keep = np.zeros(len(cell_ids), dtype=bool)
    for c in cover:  # |cover| <= 64 — tiny driver-side loop
        keep |= s2like.contains(np.array([c], dtype=np.uint64), cell_ids)
    files: list[str] = []
    for d in np.asarray(dirs, dtype=object)[keep]:
        files.extend(sorted(glob.glob(f"{d}/*.parquet")))
    if not files:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table({c: pa.array([], pa.string()) for c in (columns or [])})
        )
    return ray.data.read_parquet(
        files, columns=list(columns) if columns else None
    )


def read_osm_xml(path: str) -> dict:
    """Parse an OSM XML file of admin-boundary relations into the
    polygons dict shape (admin_id, name, level, parent_id, ring_lon,
    ring_lat, holes) — the reference's phase-1 OSM ingest [PK],
    re-expressed over a local fixture file (no network in this
    sandbox; ``engine.fixtures.polygons_to_osm_xml`` is the writer
    twin and roundtrip equality is pytest-verified).

    Single streaming pass with ``iterparse`` + element eviction, so
    memory is O(nodes of one file), not O(document tree). At planet
    scale the same three-table plan (nodes, ways, relations) runs as
    Ray Data stages over pre-split PBF blocks; the assembly below is
    the per-shard kernel."""
    import xml.etree.ElementTree as ET

    import numpy as np

    nodes: dict[int, tuple[float, float]] = {}
    ways: dict[int, list[int]] = {}
    rels: list[dict] = []
    for _, el in ET.iterparse(path, events=("end",)):
        # clear ONLY the three top-level tags once consumed: clearing
        # every end event would strip child <nd>/<member> attributes
        # before their parent's end event fires
        if el.tag == "node":
            nodes[int(el.get("id"))] = (float(el.get("lon")),
                                        float(el.get("lat")))
            el.clear()
        elif el.tag == "way":
            ways[int(el.get("id"))] = [int(nd.get("ref"))
                                       for nd in el.findall("nd")]
            el.clear()
        elif el.tag == "relation":
            tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
            if tags.get("type") == "boundary":
                members = [(m.get("role"), int(m.get("ref")))
                           for m in el.findall("member")
                           if m.get("type") == "way"]
                rels.append({"tags": tags, "members": members})
            el.clear()  # evict: keeps iterparse memory flat

    admin_id, name, level, parent = [], [], [], []
    rings_x, rings_y, holes = [], [], []
    for r in rels:
        outer = [w for role, w in r["members"] if role == "outer"]
        inner = [w for role, w in r["members"] if role == "inner"]
        if not outer:
            continue

        def ring_coords(way_id: int):
            refs = ways[way_id]
            if len(refs) > 1 and refs[-1] == refs[0]:
                refs = refs[:-1]  # drop the closing duplicate
            pts = [nodes[rf] for rf in refs]
            return (np.array([p[0] for p in pts], dtype=np.float64),
                    np.array([p[1] for p in pts], dtype=np.float64))

        ox, oy = ring_coords(outer[0])
        admin_id.append(r["tags"].get("ref", ""))
        name.append(r["tags"].get("name", ""))
        level.append(int(r["tags"].get("admin_level", 0)))
        parent.append(r["tags"].get("parent_ref", ""))
        rings_x.append(ox)
        rings_y.append(oy)
        holes.append([ring_coords(w) for w in inner])
    return {
        "admin_id": np.array(admin_id),
        "name": np.array(name),
        "level": np.array(level, dtype=np.int32),
        "parent_id": np.array(parent),
        "ring_lon": rings_x,
        "ring_lat": rings_y,
        "holes": holes,
    }
