"""Run-history append + time series (SURVEY S7/A6).

The reference appends one global-stats row per nightly run to a CSV and
plots the series. Engine version: an append-only parquet directory
partitioned by ``run_ts`` (injected by the caller — kernels never read
the wall clock, determinism rule SURVEY §7.4), one file per run,
atomic tmp+rename, idempotent per run_ts.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def append_run_stats(history_dir: str, run_ts: str, stats: dict) -> str:
    """Append one run's global stats row; overwrite-idempotent per run_ts."""
    os.makedirs(history_dir, exist_ok=True)
    row = {"run_ts": [run_ts], **{k: [v] for k, v in stats.items()}}
    path = os.path.join(history_dir, f"run={run_ts}.parquet")
    tmp = path + ".tmp"
    pq.write_table(pa.table(row), tmp)
    os.replace(tmp, path)
    return path


def read_history(history_dir: str) -> pd.DataFrame:
    """Full history, sorted by run_ts (small: one row per run)."""
    files = sorted(
        os.path.join(history_dir, f)
        for f in os.listdir(history_dir)
        if f.endswith(".parquet")
    )
    if not files:
        return pd.DataFrame()
    out = ray.data.read_parquet(files).to_pandas()
    return out.sort_values("run_ts", ignore_index=True)


def global_stats(
    ds: ray.data.Dataset, sum_cols: list[str], decimals: int = 4
) -> dict:
    """One-row global aggregate (count + sums) computed distributed.
    ``decimals``: float sums of large-magnitude columns (~1e10 price
    totals at sf0.1) carry summation-order noise past the 4th decimal —
    callers comparing against a serial oracle pass 2."""
    n = ds.count()
    out = {"n_rows": int(n)}
    for c in sum_cols:
        out[f"sum_{c}"] = round(float(ds.sum(c) or 0.0), decimals)
    return out
