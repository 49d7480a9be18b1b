"""Incremental-update flagship: changefile -> touched partitions only.

The reference's defining operational loop [PK §0.1 item 1] is nightly
incremental maintenance: osmupdate applies a changefile of
modified/deleted objects to the previous extract, and only the affected
areas are reprocessed. This module composes that loop from the engine's
existing primitives (round-3 verdict item 2):

1. **Route** the changefile's rows to input fragments by parquet
   footer min/max statistics on the key — O(fragments) metadata reads,
   zero data scan (the same data-skipping contract as the zone maps,
   ``engine/io.py`` S11). Keys outside every fragment's range spill to
   one new fragment.
2. **Rewrite** each affected fragment in place (atomic tmp +
   ``os.replace``) with ``merge_upserts`` semantics applied
   fragment-locally: delete rows drop, upsert rows replace-or-insert.
   One raw Ray task per affected fragment — the deliberate raw-task
   exception (SURVEY §2.3): an in-place per-file rewrite is a
   filesystem mutation the Dataset write API cannot express.
3. **Invalidate** the manifest rows (status="stale") of every partition
   whose fragment list intersects the rewritten set, plus the global
   tile-merge row (tiles span partitions).
4. **Resume** ``run_flagship`` with the PREVIOUS partition plan (read
   back from manifest lineage, so untouched partitions keep their
   partition ids and their on-disk outputs byte-identical) extended by
   one new partition for the spill fragment. The resume anti-join then
   recomputes exactly the stale + new partitions and re-merges tiles
   from all partials.

Overlapping fragment key-ranges are handled correctly (round-4 ADVICE
item 1): a changed key routes to EVERY fragment whose [min, max]
contains it — deletes apply everywhere, the upsert row lands in the
first (sorted-path) containing fragment and acts as a delete in the
rest, so a stale duplicate in a later overlapping fragment cannot
survive. With the disjoint ranges the engine's own writers produce
(``engine/io.py`` S9) this degenerates to the single-destination fast
case. Fragments whose footer statistics are missing OR inexact
(truncated min/max on long binary values, pyarrow
``is_{min,max}_value_exact``) conservatively match every key.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from engine.pipeline import manifest


def fragment_key_ranges(
    paths: list[str], key: str = "image_id"
) -> list[tuple[str, object, object]]:
    """(path, min, max) of ``key`` per fragment from parquet FOOTER
    statistics only (no data read). Fragments lacking stats — or whose
    stats are INEXACT (parquet writers may truncate min/max for long
    binary values while still reporting ``has_min_max``; pyarrow >= 13
    exposes ``is_min_value_exact`` / ``is_max_value_exact``) — get
    (None, None) and are treated as matching everything, the
    conservative data-skipping fallback."""
    out = []
    for p in sorted(paths):
        md = pq.read_metadata(p)
        names = md.schema.to_arrow_schema().names
        ci = names.index(key)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if (st is None or not st.has_min_max
                    or getattr(st, "is_min_value_exact", True) is False
                    or getattr(st, "is_max_value_exact", True) is False):
                lo, hi = None, None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((p, lo, hi))
    return out


def route_changes(
    changes: pa.Table,
    paths: list[str],
    key: str = "image_id",
    op_col: str = "__op",
) -> tuple[dict[str, pa.Table], pa.Table]:
    """Split the changefile by destination fragment: each key routes
    to EVERY fragment whose [min, max] contains it. Deletes apply in
    all containing fragments; the upsert row replaces-or-inserts in
    the FIRST (sorted-path) containing fragment and is demoted to a
    delete in the others, so overlapping ranges cannot leave a stale
    duplicate behind (round-4 ADVICE item 1). Keys contained by no
    fragment -> the spill table (new inserts beyond every existing
    range); deletes that match no fragment are dropped (deleting an
    absent key is a no-op)."""
    ranges = fragment_key_ranges(paths, key)
    keys = np.asarray(changes[key].to_pylist(), dtype=object)
    ops = np.asarray(changes[op_col].to_pylist(), dtype=object)
    is_ups = ops == "U"
    primary = np.full(len(keys), -1, dtype=np.int64)
    contains = []
    for fi, (_, lo, hi) in enumerate(ranges):
        if lo is None:
            m = np.ones(len(keys), dtype=bool)
        else:
            m = (keys >= lo) & (keys <= hi)
        contains.append(m)
        primary[m & (primary == -1)] = fi
    per_frag: dict[str, pa.Table] = {}
    for fi, (p, _, _) in enumerate(ranges):
        m = contains[fi]
        if not m.any():
            continue
        frag = changes.filter(pa.array(m))
        demote = m & is_ups & (primary != fi)
        if demote.any():
            # non-primary overlapping fragment: the upsert acts as a
            # pure delete of any stale copy of the key living here
            new_ops = np.where(demote, "D", ops)[m]
            frag = frag.set_column(
                frag.schema.get_field_index(op_col), op_col,
                pa.array(new_ops.tolist(), type=pa.string()))
        per_frag[p] = frag
    spill = changes.filter(pa.array((primary == -1) & is_ups))
    return per_frag, spill


@ray.remote
def _rewrite_fragment(
    path: str, delta: pa.Table, key: str, op_col: str
) -> int:
    """Apply one fragment's delta slice in place (merge_upserts
    semantics, fragment-local): delete keys drop, upsert keys replace
    existing rows or insert; rows stay sorted by key so the fragment's
    footer range invariant survives. Atomic tmp + os.replace."""
    t = pq.read_table(path)
    df = t.to_pandas()
    d = delta.to_pandas()
    del_keys = set(d.loc[d[op_col] == "D", key])
    ups = d[d[op_col] == "U"].drop(columns=[op_col])
    gone = del_keys | set(ups[key])
    df = df[~df[key].isin(gone)]
    merged = pd.concat([df, ups[df.columns]], ignore_index=True)
    merged = merged.sort_values(key, kind="stable", ignore_index=True)
    out = pa.Table.from_pandas(merged, schema=t.schema,
                               preserve_index=False)
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    return out.num_rows


def apply_changefile(
    images_dir: str,
    changes: pa.Table,
    *,
    key: str = "image_id",
    op_col: str = "__op",
    spill_name: str | None = None,
) -> dict:
    """Route + rewrite. Returns {"rewritten": [paths], "spill": path
    or None}. Untouched fragments are not opened, let alone written —
    their bytes and mtimes cannot change."""
    paths = sorted(glob.glob(os.path.join(images_dir, "*.parquet")))
    per_frag, spill = route_changes(changes, paths, key, op_col)
    futures = [
        _rewrite_fragment.remote(p, d, key, op_col)
        for p, d in sorted(per_frag.items())
    ]
    ray.get(futures)
    spill_path = None
    if spill.num_rows:
        name = spill_name or f"images-incr-{uuid.uuid4().hex[:8]}.parquet"
        spill_path = os.path.join(images_dir, name)
        sp = spill.drop_columns([op_col]).to_pandas().sort_values(
            key, kind="stable", ignore_index=True)
        schema = pq.read_schema(paths[0]) if paths else None
        tmp = spill_path + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(sp, schema=schema, preserve_index=False),
            tmp)
        os.replace(tmp, spill_path)
    return {"rewritten": sorted(per_frag), "spill": spill_path}


def previous_plan(man_dir: str) -> dict[str, list[str]]:
    """Partition plan of the last run, read back from manifest lineage
    ("join" rows, any status): pid -> input fragment paths. Reusing it
    keeps untouched partitions' ids — and therefore their on-disk
    outputs — stable across incremental runs."""
    m = manifest.read_manifest(man_dir)
    plan: dict[str, list[str]] = {}
    if m.num_rows:
        for rec in m.to_pylist():
            if rec["stage"] == "join":
                plan[rec["partition_id"]] = list(rec["input_fragment_ids"])
    return plan


def invalidate_partitions(
    man_dir: str,
    pids: set[str],
    plan: dict[str, list[str]] | None = None,
    stages: tuple[str, ...] = ("join", "knn", "tile_partials"),
) -> None:
    """Overwrite the named partitions' manifest rows with
    status="stale" (one file per (stage, pid), so the overwrite is the
    invalidation); ``plan_resume``'s done-filter then schedules them.
    The stale row KEEPS the partition's fragment list so lineage (and
    ``previous_plan``) survives a crash between invalidate and
    recompute."""
    plan = plan or {}
    for pid in sorted(pids):
        for stage in stages:
            manifest.write_manifest_row(
                man_dir, partition_id=pid, stage=stage,
                input_fragment_ids=plan.get(pid, []), row_count=0,
                status="stale",
            )


def run_incremental_update(
    images_dir: str,
    out_dir: str,
    changes: pa.Table,
    *,
    run_id: str = "incr",
    **flagship_kwargs,
) -> dict:
    """The composed nightly loop. Requires a completed prior
    ``run_flagship`` into ``out_dir`` (its manifest carries the plan);
    raises otherwise — an incremental update with no base run is a
    full run, and the caller should say so explicitly."""
    from engine.pipeline import flagship

    man_dir = os.path.join(out_dir, "manifest")
    plan = previous_plan(man_dir)
    if not plan:
        raise RuntimeError(
            f"no prior flagship manifest under {man_dir}; run "
            "run_flagship first — incremental resume needs its lineage")
    if f"pincr-{run_id}" in plan:
        raise ValueError(
            f"run_id {run_id!r} was already used for an incremental "
            "run against this out_dir; each changefile application "
            "needs a distinct run_id (its spill fragment and "
            "partition are named by it)")
    res = apply_changefile(
        images_dir, changes, spill_name=f"images-incr-{run_id}.parquet")
    rewritten = set(res["rewritten"])
    stale = {pid for pid, frags in plan.items()
             if rewritten & set(frags)}
    if res["spill"]:
        plan[f"pincr-{run_id}"] = [res["spill"]]
    invalidate_partitions(man_dir, stale, plan)
    if stale or res["spill"]:
        # tiles span partitions: the merge row must recompute whenever
        # ANY partial changed (it re-reads all partitions' partials)
        manifest.write_manifest_row(
            man_dir, partition_id="all", stage="tiles",
            input_fragment_ids=[], row_count=0, status="stale")
    summary = flagship.run_flagship(
        images_dir, out_dir, planned=plan, resume=True, run_id=run_id,
        **flagship_kwargs)
    summary["stale_partitions"] = sorted(stale)
    summary["rewritten_fragments"] = sorted(rewritten)
    summary["spill_fragment"] = res["spill"]
    summary["changes"] = json.loads(json.dumps({
        "n": changes.num_rows}))
    return summary
