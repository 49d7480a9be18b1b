"""Relational operator building blocks over Ray Datasets.

Reproduces the reference's join/aggregate/report semantics (SURVEY.md
§2.4-§2.7) as generic, scale-aware pieces:

- ``broadcast_hash_join``: small side -> ``ray.put`` once, probe inside
  ``map_batches`` with a vectorized pandas merge per batch. No shuffle
  of the big side — the J2 pattern.
- ``semi_join`` / ``anti_join``: broadcast key set + vectorized
  ``isin`` filter (J3).
- ``partial_groupby_sum``: pre-aggregates inside ``map_batches`` (one
  row per key per batch) before the shuffle, so the all-to-all moves
  partials, not rows — the A2 combiner pattern.
- ``topk``: per-batch local top-k prune, then global sort+limit on the
  tiny survivor set (O1) — never a full sort of the input.

All functions keep user-facing column names intact so DuckDB oracle SQL
can name identical output columns.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def broadcast_hash_join(
    big: ray.data.Dataset,
    small_df: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> ray.data.Dataset:
    """Equi-join where one side fits in an object-store broadcast.

    ``small_df`` is put once; every task reads it zero-copy-ish from the
    local object store (never re-shipped per batch).
    """
    ref = ray.put(small_df)

    class Probe:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return big.map_batches(Probe, batch_format="pandas", concurrency=(1, 8))


def _key_frame(df: pd.DataFrame, on: Sequence[str]):
    return pd.MultiIndex.from_frame(df[list(on)]) if len(on) > 1 else df[on[0]]


def semi_join(
    big: ray.data.Dataset, keys_df: pd.DataFrame, on: str | list[str]
) -> ray.data.Dataset:
    """Rows of ``big`` whose key appears in ``keys_df`` (broadcast)."""
    on_l = [on] if isinstance(on, str) else list(on)
    ref = ray.put(set(map(tuple, keys_df[on_l].itertuples(index=False))) if len(on_l) > 1
                  else set(keys_df[on_l[0]]))

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(ref)
        if len(on_l) > 1:
            mask = pd.MultiIndex.from_frame(batch[on_l]).isin(keys)
        else:
            mask = batch[on_l[0]].isin(keys)
        return batch[np.asarray(mask)]

    return big.map_batches(probe, batch_format="pandas")


def anti_join(
    big: ray.data.Dataset, keys_df: pd.DataFrame, on: str | list[str]
) -> ray.data.Dataset:
    """Rows of ``big`` whose key does NOT appear in ``keys_df`` — the
    reference's "articles with no matching OSM object" lists (J3)."""
    on_l = [on] if isinstance(on, str) else list(on)
    ref = ray.put(set(map(tuple, keys_df[on_l].itertuples(index=False))) if len(on_l) > 1
                  else set(keys_df[on_l[0]]))

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(ref)
        if len(on_l) > 1:
            mask = pd.MultiIndex.from_frame(batch[on_l]).isin(keys)
        else:
            mask = batch[on_l[0]].isin(keys)
        return batch[~np.asarray(mask)]

    return big.map_batches(probe, batch_format="pandas")


def partial_groupby_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: dict[str, str],
    count_as: str | None = None,
) -> ray.data.Dataset:
    """groupby(keys).sum with a per-batch combiner before the shuffle.

    ``sums``: {input_col: output_name}. The map_batches stage emits one
    partial row per distinct key per batch; the following groupby only
    shuffles those partials (A2 — FP-Hadoop-style partial/final split).
    """
    cnt = count_as or "__count"

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, as_index=False, sort=False).agg(
            **{out: (col, "sum") for col, out in sums.items()},
            **{cnt: (keys[0], "size")},
        )
        return g

    partials = ds.map_batches(combine, batch_format="pandas")
    from ray.data.aggregate import Sum

    aggs = [Sum(out, alias_name=out) for out in sums.values()]
    aggs.append(Sum(cnt, alias_name=cnt))
    out = partials.groupby(keys[0] if len(keys) == 1 else keys).aggregate(*aggs)
    if count_as is None:
        out = out.drop_columns([cnt])
    return out


def topk(
    ds: ray.data.Dataset, col: str, k: int, descending: bool = True
) -> ray.data.Dataset:
    """Global top-k with per-batch pruning: each batch keeps its local
    top-k, the global sort then runs over <= k*n_batches survivors."""

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.nlargest(k, col) if descending else batch.nsmallest(k, col)

    return ds.map_batches(prune, batch_format="pandas").sort(
        col, descending=descending
    ).limit(k)


def distinct(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Distinct over selected columns: per-batch dedup combiner, then a
    single groupby-dedup of the (much smaller) partials."""

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[cols].drop_duplicates()

    partials = ds.map_batches(local, batch_format="pandas")
    return partials.groupby(cols[0] if len(cols) == 1 else cols).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def bucketed_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, ...],
    num_partitions: int = 32,
    how: str = "inner",
) -> ray.data.Dataset:
    """Both-sides-large equi-join: hash-partitioned co-shuffle.

    Wraps the native ``Dataset.join`` (hash partition both sides on the
    key, join partitions independently). ``num_partitions`` is the
    explicit partitioning knob — raise it for skewed/huge keys so each
    partition fits an aggregator's heap. Prefer ``broadcast_hash_join``
    whenever one side fits in a broadcast: it avoids this all-to-all
    entirely.
    """
    on_t = (on,) if isinstance(on, str) else tuple(on)
    return left.join(
        right, join_type=how, num_partitions=num_partitions, on=on_t
    )
