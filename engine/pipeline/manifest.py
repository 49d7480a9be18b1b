"""Per-partition lineage manifest + resume planner (SURVEY.md §4.3).

The reference resumed by re-running whole per-region phases; the engine
makes resume first-class (BASELINE.json:6 "lineage records ... so a
killed ``ray job submit`` run resumes without recomputing completed
cells"):

- A *partition* is a named unit of work: (stage, partition_id) with the
  exact input fragment list it consumed.
- Each completed partition appends ONE manifest row — written atomically
  (tmp file + ``os.replace``) into ``manifest_dir`` as its own parquet
  file named by partition_id, so concurrent writers never conflict and
  a re-run overwrites idempotently.
- ``plan_resume`` anti-joins planned partitions against manifest rows
  with status=done and returns only the missing work.
- ``sum(row_count)`` per stage is the parity audit hook (BASELINE.json:2).

Schema: partition_id, stage, input_fragment_ids list<string>,
cell_lo/cell_hi (uint64 S2-like key range covered), row_count, status,
metrics (JSON string), run_id.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.string()),
        ("stage", pa.string()),
        ("input_fragment_ids", pa.list_(pa.string())),
        ("cell_lo", pa.uint64()),
        ("cell_hi", pa.uint64()),
        ("row_count", pa.int64()),
        ("status", pa.string()),
        ("metrics", pa.string()),
        ("run_id", pa.string()),
    ]
)


def write_manifest_row(
    manifest_dir: str,
    *,
    partition_id: str,
    stage: str,
    input_fragment_ids: list[str],
    row_count: int,
    cell_lo: int = 0,
    cell_hi: int = 2**64 - 1,
    status: str = "done",
    metrics: dict | None = None,
    run_id: str = "",
) -> str:
    """Atomically persist one partition's lineage record."""
    os.makedirs(manifest_dir, exist_ok=True)
    t = pa.table(
        {
            "partition_id": [partition_id],
            "stage": [stage],
            "input_fragment_ids": [list(input_fragment_ids)],
            "cell_lo": pa.array([cell_lo], pa.uint64()),
            "cell_hi": pa.array([cell_hi], pa.uint64()),
            "row_count": pa.array([row_count], pa.int64()),
            "status": [status],
            "metrics": [json.dumps(metrics or {}, sort_keys=True)],
            "run_id": [run_id],
        },
        schema=MANIFEST_SCHEMA,
    )
    final = os.path.join(manifest_dir, f"{stage}__{partition_id}.parquet")
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(t, tmp)
    os.replace(tmp, final)
    return final


def read_manifest(manifest_dir: str) -> pa.Table:
    if not os.path.isdir(manifest_dir):
        return MANIFEST_SCHEMA.empty_table()
    files = [
        os.path.join(manifest_dir, f)
        for f in sorted(os.listdir(manifest_dir))
        if f.endswith(".parquet")
    ]
    if not files:
        return MANIFEST_SCHEMA.empty_table()
    return pa.concat_tables([pq.read_table(f) for f in files])


def completed_partitions(manifest_dir: str, stage: str) -> set[str]:
    m = read_manifest(manifest_dir)
    if m.num_rows == 0:
        return set()
    mask = pa.compute.and_(
        pa.compute.equal(m["stage"], stage), pa.compute.equal(m["status"], "done")
    )
    return set(m.filter(mask)["partition_id"].to_pylist())


def plan_resume(
    manifest_dir: str, stage: str, planned: dict[str, list[str]]
) -> dict[str, list[str]]:
    """planned: partition_id -> input fragment paths. Returns only the
    partitions NOT yet marked done (the anti-join of SURVEY.md §4.3)."""
    done = completed_partitions(manifest_dir, stage)
    return {pid: frags for pid, frags in planned.items() if pid not in done}


def stage_row_count(manifest_dir: str, stage: str) -> int:
    m = read_manifest(manifest_dir)
    if m.num_rows == 0:
        return 0
    mask = pa.compute.and_(
        pa.compute.equal(m["stage"], stage), pa.compute.equal(m["status"], "done")
    )
    col = m.filter(mask)["row_count"]
    return int(pa.compute.sum(col).as_py() or 0)


def plan_partitions(
    input_paths: list[str], target_partitions: int
) -> dict[str, list[str]]:
    """Group input fragments into partitions of roughly equal file count.

    At cluster scale each partition stays big enough to keep the whole
    pool busy (one internally-parallel Dataset job per partition) while
    giving resume a useful granularity — the explicit tradeoff noted in
    SURVEY.md §4.3.
    """
    paths = sorted(input_paths)
    n = max(1, min(target_partitions, len(paths)))
    out: dict[str, list[str]] = {}
    per = int(np.ceil(len(paths) / n))
    for i in range(n):
        frags = paths[i * per : (i + 1) * per]
        if frags:
            out[f"p{i:05d}"] = frags
    return out
