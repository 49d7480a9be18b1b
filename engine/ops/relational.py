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

from engine.state import default_pool


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

    return big.map_batches(Probe, batch_format="pandas", concurrency=default_pool())


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
        from engine.state import cached_get, default_pool

        keys = cached_get(ref)  # deserialized once per worker, not per batch
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
        from engine.state import cached_get

        keys = cached_get(ref)  # deserialized once per worker, not per batch
        if len(on_l) > 1:
            mask = pd.MultiIndex.from_frame(batch[on_l]).isin(keys)
        else:
            mask = batch[on_l[0]].isin(keys)
        return batch[~np.asarray(mask)]

    return big.map_batches(probe, batch_format="pandas")


def sum_final(
    partials: ray.data.Dataset, keys: list[str]
) -> ray.data.Dataset:
    """Final merge of per-batch partial sums when the distinct-key set
    fits one worker — the normal case after a combiner, since partials
    are bounded by distinct_keys x blocks, not input rows. One
    ``repartition(1)`` + one pandas groupby-sum on a single fat block:
    measured 6x faster than Ray 2.49's sort-based ``Aggregate``
    operator at this shape (2.4s vs 15s over 64 partial blocks of a
    1500-key pivot) because it skips boundary sampling and per-block
    sort/reduce task fan-out. For huge key spaces (keys ~ input rows,
    e.g. per-URL counts at 10^12 scale) callers pass
    ``final="shuffle"`` to keep the distributed sort-aggregate.
    Every non-key column of ``partials`` must be numeric (it is
    summed)."""

    def final(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(keys, as_index=False, sort=False).sum()
        return out.sort_values(keys, ignore_index=True)

    # batch_size=None => whole-block batches; repartition(1) => exactly
    # one block, so `final` sees every partial row in a single call.
    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


def partial_groupby_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: dict[str, str],
    count_as: str | None = None,
    final: str = "small",
) -> ray.data.Dataset:
    """groupby(keys).sum with a per-batch combiner before the shuffle.

    ``sums``: {input_col: output_name}. The map_batches stage emits one
    partial row per distinct key per batch; only those partials move
    (A2 — FP-Hadoop-style partial/final split). ``final="small"``
    (default) merges partials via ``sum_final`` (single-worker final,
    see its scale note); ``final="shuffle"`` keeps Ray's distributed
    sort-aggregate for huge key cardinality.

    Round-5 (verdict item 4): the per-batch combiner is Arrow-native —
    ``Table.group_by`` C++ hash aggregate on the zero-copy block, no
    pandas conversion on the wide input; output column order (keys,
    sums, count) matches the historical pandas combiner exactly. Key
    columns must be non-null (the engine's key columns are by
    construction; the old pandas combiner silently DROPPED null-key
    rows, Arrow would keep them)."""
    import pyarrow as pa

    cnt = count_as or "__count"

    def combine(t: "pa.Table") -> "pa.Table":
        gb = t.group_by(keys, use_threads=False).aggregate(
            [(col, "sum") for col in sums] + [(keys[0], "count")]
        )
        rename = {f"{col}_sum": out for col, out in sums.items()}
        rename[f"{keys[0]}_count"] = cnt
        gb = gb.rename_columns(
            [rename.get(n, n) for n in gb.column_names])
        return gb.select(list(keys) + list(sums.values()) + [cnt])

    partials = ds.map_batches(combine, batch_format="pyarrow")
    if final == "small":
        out = sum_final(partials, keys)
    else:
        from ray.data.aggregate import Sum

        aggs = [Sum(out, alias_name=out) for out in sums.values()]
        aggs.append(Sum(cnt, alias_name=cnt))
        out = partials.groupby(
            keys[0] if len(keys) == 1 else keys
        ).aggregate(*aggs)
    if count_as is None:
        out = out.drop_columns([cnt])
    return out


def partial_groupby_sum_arrow(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: dict[str, str],
    count_as: str | None = None,
    derive=None,
    final: str = "small",
) -> ray.data.Dataset:
    """Arrow-native twin of ``partial_groupby_sum``: the per-batch
    combiner runs entirely on the zero-copy pyarrow block —
    ``derive(table) -> table`` optionally appends computed columns
    with ``pyarrow.compute`` kernels first, then ``Table.group_by``
    (C++ hash aggregate) emits the partial sums. No Arrow->pandas
    conversion ever happens on the wide input, only on the tiny
    partials at the final. Semantics identical to the pandas twin."""
    import pyarrow as pa

    cnt = count_as or "__count"

    def combine(t: "pa.Table") -> "pa.Table":
        if derive is not None:
            t = derive(t)
        gb = t.group_by(keys, use_threads=False).aggregate(
            [(col, "sum") for col in sums] + [(keys[0], "count")]
        )
        rename = {f"{col}_sum": out for col, out in sums.items()}
        rename[f"{keys[0]}_count"] = cnt
        return gb.rename_columns(
            [rename.get(n, n) for n in gb.column_names]
        )

    partials = ds.map_batches(combine, batch_format="pyarrow")
    if final == "small":
        out = sum_final(partials, keys)
    else:
        from ray.data.aggregate import Sum

        aggs = [Sum(out, alias_name=out) for out in sums.values()]
        aggs.append(Sum(cnt, alias_name=cnt))
        out = partials.groupby(
            keys[0] if len(keys) == 1 else keys
        ).aggregate(*aggs)
    if count_as is None:
        out = out.drop_columns([cnt])
    return out


def bloom_semi_join(
    big: ray.data.Dataset,
    keys: ray.data.Dataset,
    on: str,
    *,
    bits_per_key: int = 10,
    k_hashes: int = 3,
    expected_keys: int | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Semi-join for the case ``semi_join`` can't handle: the key side
    is itself a big Dataset (too large to collect as a driver set) but a
    full both-sides co-shuffle of ``big`` would be wasteful because most
    probe rows miss. A Bloom filter of the keys (``bits_per_key`` x
    |keys| bits, ~1% false positives at 10/3) is built distributed —
    per-block bitmaps OR-folded driver-side, O(num_blocks x m/8) bytes —
    broadcast once via ``ray.put``, and probes drop misses BEFORE the
    shuffle. Only the (small) survivor set then co-shuffles against the
    distinct keys for the exact residual check, so output is EXACTLY the
    semi-join (false positives are eliminated, never emitted).

    Shuffle volume: |matches| + FP·|big| instead of |big| — at a 1%
    match rate that is a ~50x cut of the all-to-all.

    ``num_partitions`` feeds the residual ``bucketed_join``; the native
    JoinOperator keeps all partition aggregators resident, so it must
    stay O(cluster CPUs) — 32 partitions on a 4-cpu node livelocks
    (measured: 50+ blocked workers). ``None`` derives it from
    ``state.default_partitions()`` (tracks the cluster's CPU count)."""
    from engine.ops.sketch import _hash64

    # the key pipeline feeds THREE consumers (count, bitmap pass,
    # residual distinct) — pin its blocks once instead of recomputing
    # the upstream read/filter per consumer
    keys = keys.materialize()
    if expected_keys is None:
        expected_keys = max(1024, keys.count())
    m_bits = int(bits_per_key * expected_keys)
    seeds = np.arange(1, k_hashes + 1, dtype=np.uint64)

    def positions(vals: np.ndarray) -> np.ndarray:
        h = _hash64(vals)
        h2 = ((h >> np.uint64(33)) | np.uint64(1))  # odd -> full cycle
        return (
            (h[:, None] + seeds[None, :] * h2[:, None]) % np.uint64(m_bits)
        ).ravel()

    def local_bitmap(b: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(m_bits // 8 + 1, dtype=np.uint8)
        pos = positions(b[on].to_numpy())
        np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame({"bm": [bm.tobytes()]})

    parts = keys.map_batches(local_bitmap, batch_format="pandas").to_pandas()
    bm = np.zeros(m_bits // 8 + 1, dtype=np.uint8)
    for blob in parts["bm"]:
        np.bitwise_or(bm, np.frombuffer(blob, dtype=np.uint8), out=bm)
    bm_ref = ray.put(bm)

    def prefilter(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        f = cached_get(bm_ref)
        pos = positions(b[on].to_numpy()).reshape(-1, k_hashes)
        hit = ((f[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
        return b[hit]

    survivors = big.map_batches(prefilter, batch_format="pandas")
    dkeys = distinct(keys, [on])
    return bucketed_join(
        survivors, dkeys, on=on, num_partitions=num_partitions, how="inner"
    )


def bucketed_anti_join(
    left: ray.data.Dataset,
    right_keys: ray.data.Dataset,
    on: str,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Both-sides-big NOT IN (the reference's "articles with no matching
    object" lists when neither side fits a broadcast): distinct right
    keys carry a presence marker through a LEFT OUTER hash-partitioned
    co-shuffle; survivors are the rows whose marker came back null.
    Exact — unlike a Bloom prefilter, misses are what we KEEP, so false
    positives would drop valid rows and no sketch shortcut applies."""
    dk = distinct(right_keys, [on])

    def mark(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__present"] = np.int8(1)
        return b

    j = bucketed_join(
        left, dk.map_batches(mark, batch_format="pandas"),
        on=on, num_partitions=num_partitions, how="left_outer",
    )

    def keep_missing(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["__present"].isna()].drop(columns="__present")

    return j.map_batches(keep_missing, batch_format="pandas")


def rollup_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: dict[str, str],
    count_as: str = "n",
    all_value: str = "ALL",
) -> pd.DataFrame:
    """``GROUP BY ROLLUP(keys)`` (the reference's child->parent report
    rollups, SURVEY.md §2.5 A3): ONE distributed finest-level aggregate
    (combiner + small final) over the input; every coarser level is then
    re-aggregated from the previous level's (tiny) result driver-side —
    the rollup cascade never re-reads the input. Super-aggregate rows
    carry ``all_value`` in the rolled-up key columns, matching a SQL
    twin of ``COALESCE(key, 'ALL') .. GROUP BY ROLLUP(keys)``."""
    finest = partial_groupby_sum(ds, keys, sums, count_as=count_as).to_pandas()
    vals = list(sums.values()) + [count_as]
    levels = [finest[keys + vals]]
    cur = finest
    for i in range(len(keys) - 1, -1, -1):
        kept = keys[:i]
        if kept:
            g = cur.groupby(kept, as_index=False, sort=False)[vals].sum()
        else:
            g = cur[vals].sum().to_frame().T
        for k in keys[i:]:
            g[k] = all_value
        g = g[keys + vals]
        levels.append(g)
        cur = g
    out = pd.concat(levels, ignore_index=True)
    # super-aggregate rows put the string sentinel into the key columns,
    # so keys canonicalize to string (matches the SQL COALESCE twin and
    # keeps the final sort comparable for numeric keys)
    for k in keys:
        out[k] = out[k].astype(str)
    out[count_as] = out[count_as].astype(np.int64)
    for v in sums.values():
        out[v] = out[v].astype(np.float64)
    return out.sort_values(keys, ignore_index=True)


def merge_upserts(
    base: ray.data.Dataset,
    delta: ray.data.Dataset,
    key: str,
    op_col: str = "__op",
) -> ray.data.Dataset:
    """Delta-style MERGE — the reference's incremental OSM update
    (osmupdate applies a changefile of modified/deleted objects to the
    previous extract): ``delta`` rows carry ``op_col`` = 'U' (upsert) or
    'D' (delete); the result is base with deltas applied, latest-wins
    per key. ONE shuffle: both sides get a version column (base 0,
    delta 1), union, argmax per key by (version, op), then delete rows
    drop. Multiple delta rows per key resolve deterministically
    ('U' > 'D' at equal version never happens: one delta generation =
    one op per key is the caller's contract, documented here)."""

    def tag(v: int, with_op: bool):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__v"] = np.int64(v)
            if not with_op:
                b[op_col] = "U"
            return b
        return f

    b2 = base.map_batches(tag(0, False), batch_format="pandas")
    d2 = delta.map_batches(tag(1, True), batch_format="pandas")
    merged = argmax_per_group(b2.union(d2), key, "__v", op_col)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return b[b[op_col] != "D"].drop(columns=["__v", op_col])

    return merged.map_batches(finish, batch_format="pandas")


def cube_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: dict[str, str],
    count_as: str = "n",
    all_value: str = "ALL",
) -> pd.DataFrame:
    """``GROUP BY CUBE(keys)``: every subset of the keys aggregated.
    Same one-distributed-pass discipline as ``rollup_sum`` — the finest
    (all-keys) aggregate runs with the combiner, then each of the
    2^k - 1 coarser grouping sets re-aggregates the finest's TINY result
    driver-side (finest cardinality = product of key cardinalities;
    keep k small and keys low-cardinality, as SQL CUBE users do)."""
    from itertools import combinations

    finest = partial_groupby_sum(ds, keys, sums, count_as=count_as).to_pandas()
    vals = list(sums.values()) + [count_as]
    levels = [finest[keys + vals]]
    for r in range(len(keys) - 1, -1, -1):
        for kept in combinations(keys, r):
            kept = list(kept)
            if kept:
                g = finest.groupby(kept, as_index=False, sort=False)[vals].sum()
            else:
                g = finest[vals].sum().to_frame().T
            for k in keys:
                if k not in kept:
                    g[k] = all_value
            levels.append(g[keys + vals])
    out = pd.concat(levels, ignore_index=True)
    for k in keys:  # string-canonical keys, same rationale as rollup_sum
        out[k] = out[k].astype(str)
    out[count_as] = out[count_as].astype(np.int64)
    for v in sums.values():
        out[v] = out[v].astype(np.float64)
    return out.sort_values(keys, ignore_index=True)


def topk(
    ds: ray.data.Dataset, col: str, k: int, descending: bool = True
) -> ray.data.Dataset:
    """Global top-k with per-batch pruning: each batch keeps its local
    top-k (a combiner), then the <= k-per-block survivors coalesce into
    ONE block for the final exact prune. Strictly fewer stages than
    ``sort(col).limit(k)`` — no boundary-sampling pass and no
    range-partition all-to-all; the only data movement is the tiny
    survivor set. Output block is sorted by ``col``."""

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.nlargest(k, col) if descending else batch.nsmallest(k, col)

    return (
        ds.map_batches(prune, batch_format="pandas")
        .repartition(1)
        .map_batches(prune, batch_format="pandas", batch_size=None)
    )


def distinct(
    ds: ray.data.Dataset, cols: list[str], num_shards: int = 256
) -> ray.data.Dataset:
    """Distinct over selected columns: per-batch dedup combiner, then
    hash-SHARD co-location and one ``drop_duplicates`` pass per shard.
    (The earlier per-key ``map_groups`` paid one Python dispatch per
    distinct value — measured 30s of a 550k-edge PageRank prologue;
    sharding the final cut it to ~2s.) Sharding on ``cols[0]`` is
    sufficient: equal full keys share their first column."""

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[cols].drop_duplicates()

    partials = ds.map_batches(local, batch_format="pandas")
    sharded = _sharded_by_key(partials, cols[0], num_shards)

    def dedup_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(cols)[cols]

    return sharded.groupby("__shard").map_groups(
        dedup_shard, batch_format="pandas"
    )


def asof_join_grouped(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    right_value_cols: dict[str, str],
    left_cols: list[str],
    right_tie_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """As-of join: for each left row, the latest right row of the same
    ``by`` key with ``right.on <= left.on`` (exact matches allowed);
    left rows with no earlier right row are dropped (inner semantics).

    Ray Data has no native as-of join; this is the SURVEY.md §2.9
    "custom operator" composition (a): tag each side, union, ONE hash
    shuffle on ``by``, then a per-group sorted ``pd.merge_asof``. Both
    sides may be large — nothing is broadcast. Partitioning assumption:
    all rows of one ``by`` key fit in one group (true for per-user /
    per-entity timelines; salt the key upstream if a single entity's
    history exceeds a worker's heap).

    ``right_value_cols``: {right_col: output_name} carried from the
    matched right row (output names must not collide with left_cols).
    Right-side ties on ``on`` are broken deterministically: the kept
    row is the one sorting LAST by ``[on] + right_tie_cols`` — i.e.
    the max of the tie columns, which oracle SQL expresses as a
    row_number-DESC dedupe per (by, on).
    """
    tie = right_tie_cols or []
    src_cols = list(right_value_cols)
    all_cols = list(dict.fromkeys(left_cols + [by, on] + src_cols + tie))

    def tag(side: str):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            for c in all_cols:
                if c not in b.columns:
                    b[c] = np.nan
            b["__side"] = side
            return b[all_cols + ["__side"]]
        return f

    l_t = left.map_batches(tag("l"), batch_format="pandas")
    r_t = right.map_batches(tag("r"), batch_format="pandas")
    both = l_t.union(r_t)
    out_cols = left_cols + list(right_value_cols.values())

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"]
        rg = g[g["__side"] == "r"]
        int_outs = [right_value_cols[c] for c in src_cols
                    if np.issubdtype(g[c].dtype, np.integer)]
        if len(lg) == 0 or len(rg) == 0:
            empty = {c: pd.Series(dtype=g[c].dtype) for c in left_cols}
            for c in src_cols:
                empty[right_value_cols[c]] = pd.Series(dtype=g[c].dtype)
            return pd.DataFrame(empty)
        lg = lg.sort_values(on, kind="stable")
        rg = rg.sort_values([on] + tie, kind="stable")
        merged = pd.merge_asof(
            lg[left_cols + ([on] if on not in left_cols else [])],
            rg[[on] + src_cols].rename(columns=right_value_cols),
            on=on, direction="backward", allow_exact_matches=True,
        )
        merged = merged.dropna(subset=list(right_value_cols.values()))
        for c in int_outs:  # NaN-padding floated them; restore
            merged[c] = merged[c].astype(np.int64)
        return merged[out_cols]

    return both.groupby(by).map_groups(per_key, batch_format="pandas")


def range_join_broadcast(
    ds: ray.data.Dataset,
    ranges_df: pd.DataFrame,
    col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> ray.data.Dataset:
    """Join each row to the (single) range with ``lo <= col < hi``.

    Ranges must be non-overlapping and sorted-able by ``lo`` (verified
    at build time); they are broadcast once via ``ray.put`` and probed
    with one vectorized ``np.searchsorted`` per batch — no shuffle of
    the big side. Rows matching no range are dropped (inner semantics).
    """
    r = ranges_df.sort_values(lo_col, ignore_index=True)
    lo = r[lo_col].to_numpy()
    hi = r[hi_col].to_numpy()
    if not (hi[:-1] <= lo[1:]).all() or not (lo < hi).all():
        raise ValueError("ranges must be non-overlapping with lo < hi")
    ref = ray.put((lo, hi, r))

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        lo_, hi_, rdf = cached_get(ref)  # once per worker, not per batch
        v = batch[col].to_numpy()
        ix = np.searchsorted(lo_, v, side="right") - 1
        ok = (ix >= 0) & (v < hi_[np.clip(ix, 0, len(hi_) - 1)])
        out = batch[ok].reset_index(drop=True)
        picked = rdf.iloc[ix[ok]].reset_index(drop=True)
        return pd.concat([out, picked], axis=1)

    return ds.map_batches(probe, batch_format="pandas")


def grouped_topk(
    ds: ray.data.Dataset,
    group_key: str,
    col: str,
    k: int,
    tie_col: str,
    rank_as: str | None = "rank",
    ascending: bool = False,
) -> ray.data.Dataset:
    """Top-k rows per group by (col DESC, tie_col ASC) — or bottom-k
    with ``ascending=True`` (nearest-neighbor merges) — with 1-based
    rank. Per-batch combiner keeps only k rows per key per batch, so
    the shuffle moves at most k * n_batches rows per key."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values([col, tie_col], ascending=[ascending, True], kind="stable")
        return b.groupby(group_key, sort=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([col, tie_col], ascending=[ascending, True],
                          kind="stable").head(k)
        if rank_as:
            g = g.copy()
            g[rank_as] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    partials = ds.map_batches(local, batch_format="pandas")
    return partials.groupby(group_key).map_groups(final, batch_format="pandas")


def argmax_per_group(
    ds: ray.data.Dataset, group_key: str, col: str, tie_col: str
) -> ray.data.Dataset:
    """The single best row per group by (col DESC, tie_col DESC) — the
    reference's "latest run / newest entry per area" lookup. Same
    combiner discipline as grouped_topk with k=1."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values([col, tie_col], ascending=False, kind="stable")
        return b.groupby(group_key, sort=False).head(1)

    # final on hash SHARDS, not per-key map_groups: at high-cardinality
    # keys (every order key in a MERGE) per-group dispatch dominated —
    # one sorted drop_duplicates pass per shard finals every key in it
    def final_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_key, col, tie_col],
                          ascending=[True, False, False], kind="stable")
        return g.drop_duplicates(group_key, keep="first").drop(
            columns="__shard")

    partials = ds.map_batches(local, batch_format="pandas")
    return _sharded_by_key(partials, group_key, 256).groupby(
        "__shard"
    ).map_groups(final_shard, batch_format="pandas")


def grouped_quantile_disc(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    qs: dict[float, str],
) -> ray.data.Dataset:
    """Exact discrete quantiles per group: the value at sorted index
    ``ceil(q*n) - 1`` (DuckDB ``quantile_disc`` semantics, verified
    empirically against duckdb 1.0).

    One shuffle on ``keys``; each group's values are sorted locally in
    ``map_groups``. Partitioning assumption: one group's values fit in
    one worker (true for low-cardinality group keys; for a 100 TB
    high-cardinality case, pre-aggregate to per-(key, value) counts
    first and walk the CDF — that variant is ``partial_groupby_sum`` +
    this over the counts)."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[col].to_numpy())
        n = len(v)
        row = {k: [g[k].iloc[0]] for k in keys}
        for q, name in qs.items():
            row[name] = [float(v[min(max(int(np.ceil(q * n)) - 1, 0), n - 1)])]
        return pd.DataFrame(row)

    return ds.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        f, batch_format="pandas"
    )


def grouped_quantile_disc_counts(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    qs: dict[float, str],
    final: str = "small",
) -> ray.data.Dataset:
    """The 100-TB path for ``grouped_quantile_disc``: pre-aggregate to
    per-(key, value) COUNTS inside map_batches (combiner), shuffle only
    the counts, then walk each group's CDF to the ``ceil(q*n)``-th
    element. A group's footprint is its distinct-value count, not its
    row count — correct for skewed hot keys where raw values would
    blow a worker's heap. Identical results to grouped_quantile_disc
    (DuckDB ``quantile_disc`` semantics)."""
    gcols = keys + [col]

    def local(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(gcols, as_index=False, sort=False).agg(
            __cnt=(col, "size")
        )

    partials = ds.map_batches(local, batch_format="pandas")

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col, kind="stable")
        cum = g["__cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        v = g[col].to_numpy()
        row = {k: [g[k].iloc[0]] for k in keys}
        for q, name in qs.items():
            pos = min(max(int(np.ceil(q * n)), 1), n)
            row[name] = [float(v[np.searchsorted(cum, pos, side="left")])]
        return pd.DataFrame(row)

    if final == "small":
        # (key, value) count table fits one worker: one repartition
        # replaces BOTH shuffles (count-sum + walk's groupby).
        counts = sum_final(partials, gcols)

        def walk_all(b: pd.DataFrame) -> pd.DataFrame:
            if not len(b):
                return pd.DataFrame({c: [] for c in keys + list(qs.values())})
            return pd.concat(
                [walk(g) for _, g in b.groupby(keys, sort=True)],
                ignore_index=True,
            )

        return counts.map_batches(
            walk_all, batch_format="pandas", batch_size=None
        )

    from ray.data.aggregate import Sum

    counts = partials.groupby(
        gcols[0] if len(gcols) == 1 else gcols
    ).aggregate(Sum("__cnt", alias_name="__cnt"))
    return counts.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        walk, batch_format="pandas"
    )


def rolling_mean(
    ds: ray.data.Dataset,
    group_key: str,
    order_cols: list[str],
    col: str,
    window: int,
    out: str = "rolling_mean",
) -> ray.data.Dataset:
    """Per-group moving average over the current + preceding
    ``window-1`` rows in ``order_cols`` order (SQL ``ROWS BETWEEN n
    PRECEDING AND CURRENT ROW``). One shuffle on the group key.

    The window sum is built oldest-term-first with explicit shifts (not
    pandas' sliding accumulator) so float summation order matches a SQL
    engine's frame-order sum bit-for-bit — required for the rounded
    oracle comparison."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable").copy()
        v = g[col].to_numpy(dtype=np.float64)
        n = len(v)
        acc = np.zeros(n)
        for sh in range(window - 1, -1, -1):  # oldest frame row first
            if sh < n:
                acc[sh:] += v[: n - sh]
        cnt = np.minimum(np.arange(1, n + 1), window)
        g[out] = acc / cnt
        return g

    return ds.groupby(group_key).map_groups(f, batch_format="pandas")


def stratified_sample(
    ds: ray.data.Dataset,
    strata: str,
    key_col: str,
    frac: float,
) -> ray.data.Dataset:
    """Deterministic stratified sample: within each stratum, rows are
    ordered by a Knuth multiplicative hash of the key and the first
    ``ceil(n * frac)`` are kept — every stratum is represented at the
    target rate regardless of skew (unlike a global hash filter).
    One shuffle on the stratum key; reproducible with no RNG state."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        h = (g[key_col].to_numpy(dtype=np.int64) * 2654435761) % 4294967296
        g = g.assign(__h=h).sort_values(["__h", key_col], kind="stable")
        take = int(np.ceil(len(g) * frac))
        return g.head(take).drop(columns="__h")

    return ds.groupby(strata).map_groups(f, batch_format="pandas")


def pivot_counts(
    ds: ray.data.Dataset,
    group_key: str,
    pivot_col: str,
    categories: list[str],
    prefix: str = "n_",
    final: str = "small",
) -> ray.data.Dataset:
    """Pivot ``pivot_col`` categories into count columns per group —
    the reference's per-area/per-theme wide report tables. Vectorized:
    each batch emits one indicator-sum row per key (combiner), the
    final sums partials (``sum_final`` by default; ``final="shuffle"``
    for huge group cardinality). ``categories`` must be the known
    closed set (pass the result of ``distinct`` for open sets)."""

    out_cols = {c: f"{prefix}{c}" for c in categories}

    def local(b: pd.DataFrame) -> pd.DataFrame:
        d = {group_key: b[group_key]}
        pv = b[pivot_col].to_numpy()
        for c, name in out_cols.items():
            d[name] = (pv == c).astype(np.int64)
        return pd.DataFrame(d).groupby(group_key, as_index=False, sort=False).sum()

    partials = ds.map_batches(local, batch_format="pandas")
    if final == "small":
        return sum_final(partials, [group_key])
    from ray.data.aggregate import Sum

    return partials.groupby(group_key).aggregate(
        *[Sum(name, alias_name=name) for name in out_cols.values()]
    )


def grouped_corr(
    ds: ray.data.Dataset,
    group_key: str,
    x: str,
    y: str,
    out: str = "corr",
) -> pd.DataFrame:
    """Pearson correlation of (x, y) per group, two-pass distributed:
    pass 1 aggregates per-group means (tiny shuffle of partial sums);
    pass 2 broadcasts the means and sums centered products per batch —
    numerically stable (no catastrophic cancellation of raw-moment
    formulas) and never materializes the input."""
    sums = partial_groupby_sum(
        ds, [group_key], {x: "__sx", y: "__sy"}, count_as="__n"
    ).to_pandas()
    if sums.empty:
        return pd.DataFrame({group_key: [], out: []})
    mdf = pd.DataFrame(
        {group_key: sums[group_key],
         "__mx": sums["__sx"] / sums["__n"],
         "__my": sums["__sy"] / sums["__n"]}
    )
    ref = ray.put(mdf)

    def centered(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        b = b.merge(cached_get(ref), on=group_key)
        dx = b[x].to_numpy() - b["__mx"].to_numpy()
        dy = b[y].to_numpy() - b["__my"].to_numpy()
        return pd.DataFrame(
            {group_key: b[group_key], "__sxy": dx * dy,
             "__sxx": dx * dx, "__syy": dy * dy}
        ).groupby(group_key, as_index=False, sort=False).sum()

    parts = ds.map_batches(centered, batch_format="pandas")
    tot = sum_final(parts, [group_key]).to_pandas()
    tot[out] = tot["__sxy"] / np.sqrt(tot["__sxx"] * tot["__syy"])
    return tot[[group_key, out]]


def grouped_var_std(
    ds: ray.data.Dataset,
    group_key: str,
    x: str,
    var_out: str = "var_pop",
    std_out: str = "std_pop",
) -> pd.DataFrame:
    """Population variance + stddev of ``x`` per group, the same
    two-pass centered scheme as ``grouped_corr``: pass 1 gets per-group
    means (combiner + tiny final), pass 2 broadcasts them and sums
    squared deviations per batch — stable against the catastrophic
    cancellation of the raw ``E[x^2]-E[x]^2`` formula, never
    materializes the input."""
    sums = partial_groupby_sum(
        ds, [group_key], {x: "__sx"}, count_as="__n"
    ).to_pandas()
    if sums.empty:
        return pd.DataFrame({group_key: [], var_out: [], std_out: []})
    mdf = pd.DataFrame(
        {group_key: sums[group_key], "__mx": sums["__sx"] / sums["__n"]}
    )
    ref = ray.put(mdf)

    def centered(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        b = b.merge(cached_get(ref), on=group_key)
        dx = b[x].to_numpy() - b["__mx"].to_numpy()
        return pd.DataFrame(
            {group_key: b[group_key], "__sxx": dx * dx, "__n": 1}
        ).groupby(group_key, as_index=False, sort=False).sum()

    parts = ds.map_batches(centered, batch_format="pandas")
    tot = sum_final(parts, [group_key]).to_pandas()
    tot[var_out] = tot["__sxx"] / tot["__n"]
    tot[std_out] = np.sqrt(tot[var_out])
    return tot[[group_key, var_out, std_out]]


def _sharded_by_key(
    ds: ray.data.Dataset, group_key: str, num_shards: int
) -> ray.data.Dataset:
    """Add a ``__shard = hash(group_key) % num_shards`` column. High-
    cardinality partition keys (15k customers here, 10^9 users at
    scale) must NOT become one map_groups group each — per-group Python
    dispatch dominates (measured 12s -> 3s on the ranking query). The
    shuffle moves shards; every group still lands wholly in one shard.
    Arrow-native: integer keys hash via the splitmix64 mix on a
    zero-copy view (no per-batch pandas conversion in the stage that
    feeds EVERY co-group shuffle); other dtypes fall back to pandas
    hashing. Shard assignment is internal, so the hash choice never
    reaches results."""
    import pyarrow as pa

    from engine.ops.sketch import _hash64

    def add(t: "pa.Table") -> "pa.Table":
        col = t.column(group_key)
        if pa.types.is_integer(col.type):
            vals = col.combine_chunks().to_numpy(zero_copy_only=False)
            h = _hash64(np.asarray(vals, np.int64))
        else:
            from pandas.util import hash_array

            h = hash_array(
                np.asarray(col.to_pandas()), categorize=False
            ).astype(np.uint64)
        return t.append_column(
            "__shard",
            pa.array((h % np.uint64(num_shards)).astype(np.int32),
                     pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow")


def window_rank(
    ds: ray.data.Dataset,
    group_key: str,
    order_cols: list[str],
    ascending: list[bool],
    methods: dict[str, str],
    rank_on: list[str] | None = None,
    num_shards: int = 256,
) -> ray.data.Dataset:
    """SQL ranking window functions per group, all in ONE shuffle:
    ``methods`` maps output column -> ``row_number`` (ties broken by
    the full ``order_cols`` sort), ``rank`` (ties share, gaps after),
    ``dense_rank`` (ties share, no gaps), ``percent_rank``
    ((rank-1)/(n-1), 0.0 for singleton groups), ``cume_dist``
    (rows <= current tie-run end / n) or ``ntile:<k>`` (SQL NTILE
    bucketing by row_number: the first n%k buckets get one extra row)
    — the reference's per-area "position in ranking" report columns. Tie equality is tested on
    ``rank_on`` (default: ``order_cols``), so a trailing deterministic
    tie-break column can be part of the sort without splitting SQL tie
    groups.

    Shuffles on ``hash(group_key) % num_shards`` rather than the raw
    key: a shard holds many whole groups and ranks ALL of them in one
    segmented-numpy pass (group boundaries become run flags; rank =
    position at last tie-run start via a forward-fill index), so cost
    is per-shard, not per-group — the high-cardinality PARTITION BY
    path. Partitioning assumption: one shard fits a worker; raise
    ``num_shards`` with cluster size."""
    rank_on = rank_on if rank_on is not None else order_cols

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key] + order_cols, ascending=[True] + ascending,
            kind="stable",
        ).drop(columns="__shard")
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        gk = g[group_key].to_numpy()
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = gk[1:] != gk[:-1]
        # position within group: global index minus group-start index
        gstart = np.maximum.accumulate(np.where(starts, idx, 0))
        pos = idx - gstart + 1
        new = starts.copy()
        for c in rank_on:
            v = g[c].to_numpy()
            new[1:] |= v[1:] != v[:-1]
        # group sizes per row (segmented), for the normalized methods
        s_idx = np.flatnonzero(starts)
        sizes = np.diff(np.r_[s_idx, n])
        gs = np.repeat(sizes, sizes)
        # forward-fill index of the last tie-run start (rank base)
        last_new = np.maximum.accumulate(np.where(new, idx, 0))
        for out, method in methods.items():
            if method == "row_number":
                g[out] = pos
            elif method == "dense_rank":
                cn = np.cumsum(new)
                g[out] = cn - cn[gstart] + 1
            elif method == "rank":
                g[out] = pos[last_new]
            elif method == "percent_rank":
                g[out] = np.where(
                    gs > 1, (pos[last_new] - 1) / np.maximum(gs - 1, 1), 0.0
                )
            elif method == "cume_dist":
                # within-group position of the END of the current tie run
                run_id = np.cumsum(new) - 1
                run_starts = np.flatnonzero(new)
                run_end_idx = np.r_[run_starts[1:], n] - 1
                g[out] = pos[run_end_idx[run_id]] / gs
            elif method.startswith("ntile:"):
                k = int(method.split(":", 1)[1])
                q, r = gs // k, gs % k
                fat = r * (q + 1)  # rows covered by the (q+1)-sized buckets
                p0 = pos - 1
                with np.errstate(divide="ignore", invalid="ignore"):
                    tail = np.where(q > 0, r + (p0 - fat) // np.maximum(q, 1) + 1, 0)
                g[out] = np.where(p0 < fat, p0 // (q + 1) + 1, tail).astype(np.int64)
            else:
                raise ValueError(f"unknown rank method: {method}")
        return g

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def window_value(
    ds: ray.data.Dataset,
    group_key: str,
    order_cols: list[str],
    col: str,
    outs: dict[str, str],
    num_shards: int = 256,
) -> ray.data.Dataset:
    """Value-carrying window functions per group in ONE shuffle:
    ``outs`` maps output column -> ``lag:k`` / ``lead:k`` (NaN outside
    the partition, SQL default) / ``first`` / ``last`` (whole-partition
    frame, i.e. ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING). Same segmented-numpy shard pass as ``window_rank`` —
    all groups of a shard computed together, no per-group dispatch.
    ``order_cols`` must be a total order for deterministic results."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key] + order_cols, kind="stable"
        ).drop(columns="__shard")
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        gk = g[group_key].to_numpy()
        starts = np.zeros(n, dtype=bool)
        if n:
            starts[0] = True
            starts[1:] = gk[1:] != gk[:-1]
        gstart = np.maximum.accumulate(np.where(starts, idx, 0))
        s_idx = np.flatnonzero(starts)
        sizes = np.diff(np.r_[s_idx, n])
        gs = np.repeat(sizes, sizes) if n else sizes
        pos = idx - gstart
        v = g[col].to_numpy(dtype=np.float64)
        for out, spec in outs.items():
            if spec == "first":
                g[out] = v[gstart]
            elif spec == "last":
                g[out] = v[gstart + gs - 1]
            elif spec.startswith(("lag:", "lead:")):
                kind, k = spec.split(":", 1)
                k = int(k)
                if kind == "lag":
                    src = idx - k
                    valid = pos >= k
                else:
                    src = idx + k
                    valid = pos + k < gs
                g[out] = np.where(valid, v[np.clip(src, 0, n - 1)], np.nan)
            else:
                raise ValueError(f"unknown window_value spec: {spec}")
        return g

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def grouped_string_agg(
    ds: ray.data.Dataset,
    group_key: str,
    value_col: str,
    order_cols: list[str],
    *,
    sep: str = ",",
    out_col: str = "agg",
    num_shards: int = 256,
) -> ray.data.Dataset:
    """SQL ``string_agg(value ORDER BY order_cols)`` per group — the
    reference's per-area article list / per-theme report row (it renders
    one comma-joined list of matched titles per admin area). Ordered
    concatenation is not commutative, so there is no combiner; instead
    ONE shuffle on ``hash(group_key) % num_shards`` co-locates whole
    groups, each shard sorts once by (key, order_cols) and joins every
    group's run in a single pandas pass. ``order_cols`` must make the
    order total (include a unique tie-break column) or the result is
    nondeterministic. Partitioning assumption: a shard's concatenated
    strings fit one worker; raise ``num_shards`` with data size."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key] + order_cols, kind="stable"
        )
        agg = g.groupby(group_key, sort=False)[value_col].agg(sep.join)
        return pd.DataFrame({group_key: agg.index, out_col: agg.to_numpy()})

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def lag_delta(
    ds: ray.data.Dataset,
    group_key: str,
    order_cols: list[str],
    col: str,
    out: str = "delta",
    fill: float = 0.0,
    num_shards: int = 256,
) -> ray.data.Dataset:
    """Per-group ``col - LAG(col)`` in ``order_cols`` order (first row
    of each partition gets ``fill``, the COALESCE'd SQL convention so
    the output stays null-free for hashing). Same sharded shuffle as
    ``window_rank``: one segmented diff ranks every group in the shard
    — group starts just zero out."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key] + order_cols, kind="stable"
        ).drop(columns="__shard")
        gk = g[group_key].to_numpy()
        v = g[col].to_numpy(dtype=np.float64)
        d = np.empty_like(v)
        if len(v):
            d[0] = fill
            d[1:] = np.where(gk[1:] != gk[:-1], fill, v[1:] - v[:-1])
        g[out] = d
        return g

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def grouped_quantile_cont(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    qs: dict[float, str],
) -> ray.data.Dataset:
    """Exact continuous (interpolated) quantiles per group — DuckDB
    ``quantile_cont`` semantics: value at fractional sorted position
    ``q * (n - 1)``, linearly interpolated between neighbors (verified
    empirically against duckdb 1.0). Same shuffle/partitioning contract
    as ``grouped_quantile_disc``."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[col].to_numpy(dtype=np.float64))
        n = len(v)
        row = {k: [g[k].iloc[0]] for k in keys}
        for q, name in qs.items():
            pos = q * (n - 1)
            lo = int(np.floor(pos))
            hi = min(lo + 1, n - 1)
            frac = pos - lo
            row[name] = [float(v[lo] * (1 - frac) + v[hi] * frac)]
        return pd.DataFrame(row)

    return ds.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        f, batch_format="pandas"
    )


def grouped_count_distinct(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    out: str = "n_distinct",
    final: str = "small",
) -> ray.data.Dataset:
    """Exact ``COUNT(DISTINCT col)`` per group. Combiner discipline:
    each batch first collapses to its distinct (keys, col) pairs, so
    the exchange moves at most distinct-pairs x blocks rows — never the
    raw input. ``final="small"`` merges pairs on one worker (right
    whenever the distinct-pair table is small); ``final="shuffle"``
    keeps a distributed groupby on the pair key for huge value spaces
    (per-URL distinct users at 10^12 scale). For approximate counting
    at that scale see ``ops.sketch.hll_count_distinct``."""
    pair_cols = keys + [col]

    def local(b: pd.DataFrame) -> pd.DataFrame:
        return b[pair_cols].drop_duplicates()

    partials = ds.map_batches(local, batch_format="pandas")

    if final == "small":

        def merge(b: pd.DataFrame) -> pd.DataFrame:
            pairs = b.drop_duplicates()
            g = pairs.groupby(keys, as_index=False, sort=True).agg(
                **{out: (col, "size")}
            )
            return g

        return partials.repartition(1).map_batches(
            merge, batch_format="pandas", batch_size=None
        )

    # shuffle final: shard on the GROUP key so a shard holds whole
    # groups; one drop_duplicates + size pass finals every group in it
    # (per-pair map_groups dispatch was the distinct-30s bug family)
    def shard_final(g: pd.DataFrame) -> pd.DataFrame:
        pairs = g.drop(columns="__shard").drop_duplicates()
        return pairs.groupby(keys, as_index=False, sort=True).agg(
            **{out: (col, "size")}
        )

    return _sharded_by_key(partials, keys[0], 256).groupby(
        "__shard"
    ).map_groups(shard_final, batch_format="pandas")


def bucketed_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, ...],
    num_partitions: int | None = None,
    how: str = "inner",
) -> ray.data.Dataset:
    """Both-sides-large equi-join: hash-partitioned co-shuffle.

    Wraps the native ``Dataset.join`` (hash partition both sides on the
    key, join partitions independently). ``num_partitions`` defaults to
    ``state.default_partitions()`` (1x cluster CPUs — the JoinOperator
    keeps every partition aggregator resident, so the count must track
    the cluster, not a constant); pass it explicitly for skewed/huge
    keys so each partition fits an aggregator's heap. Prefer
    ``broadcast_hash_join`` whenever one side fits in a broadcast: it
    avoids this all-to-all entirely.
    """
    from engine.state import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions()
    on_t = (on,) if isinstance(on, str) else tuple(on)
    return left.join(
        right, join_type=how, num_partitions=num_partitions, on=on_t
    )


def intersect_distinct(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    cols: list[str],
) -> ray.data.Dataset:
    """SQL ``INTERSECT`` (distinct-row semantics, D4): rows present in
    BOTH inputs. Per-batch ``drop_duplicates`` combiner tags each side
    with an indicator column, one union + one groupby-sum shuffle of
    the (already-distinct-per-batch) partials, keep rows seen on both
    sides. Never moves more than distinct_keys x blocks rows."""
    return _set_op_distinct(a, b, cols, keep="both")


def except_distinct(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    cols: list[str],
) -> ray.data.Dataset:
    """SQL ``EXCEPT`` (distinct-row semantics, D4): distinct rows of
    ``a`` absent from ``b``. Same one-shuffle tagged-union plan as
    ``intersect_distinct``."""
    return _set_op_distinct(a, b, cols, keep="left_only")


def _set_op_distinct(
    a: ray.data.Dataset, b: ray.data.Dataset, cols: list[str], keep: str
) -> ray.data.Dataset:
    def tag(side_a: int, side_b: int):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[cols].drop_duplicates()
            out["__a"] = side_a
            out["__b"] = side_b
            return out

        return f

    tagged = a.map_batches(tag(1, 0), batch_format="pandas").union(
        b.map_batches(tag(0, 1), batch_format="pandas")
    )
    merged = sum_final(tagged, cols)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        if keep == "both":
            m = (batch["__a"] > 0) & (batch["__b"] > 0)
        elif keep == "any":
            m = (batch["__a"] > 0) | (batch["__b"] > 0)
        else:
            m = (batch["__a"] > 0) & (batch["__b"] == 0)
        return batch.loc[m, cols]

    return merged.map_batches(pick, batch_format="pandas")


def grouped_cov_slope(
    ds: ray.data.Dataset,
    group_key: str,
    x: str,
    y: str,
    cov_out: str = "covar_samp",
    slope_out: str = "slope",
    icept_out: str = "icept",
) -> pd.DataFrame:
    """Sample covariance + least-squares regression slope/intercept of
    y on x per group (DuckDB ``covar_samp`` / ``regr_slope`` /
    ``regr_intercept`` semantics). Same stable two-pass centered plan
    as ``grouped_corr``: pass 1 per-group means, pass 2 broadcasts them
    and sums centered products per batch. ``x`` and ``y`` must be
    distinct columns (the combiner maps input cols uniquely; for
    var(x) use ``grouped_var_std``)."""
    if x == y:
        raise ValueError("x and y must differ; use grouped_var_std for var(x)")
    sums = partial_groupby_sum(
        ds, [group_key], {x: "__sx", y: "__sy"}, count_as="__n"
    ).to_pandas()
    if sums.empty:
        return pd.DataFrame(
            {group_key: [], cov_out: [], slope_out: [], icept_out: []})
    mdf = pd.DataFrame(
        {group_key: sums[group_key],
         "__mx": sums["__sx"] / sums["__n"],
         "__my": sums["__sy"] / sums["__n"]}
    )
    ref = ray.put(mdf)

    def centered(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        b = b.merge(cached_get(ref), on=group_key)
        dx = b[x].to_numpy() - b["__mx"].to_numpy()
        dy = b[y].to_numpy() - b["__my"].to_numpy()
        return pd.DataFrame(
            {group_key: b[group_key], "__sxy": dx * dy, "__sxx": dx * dx}
        ).groupby(group_key, as_index=False, sort=False).sum()

    parts = ds.map_batches(centered, batch_format="pandas")
    tot = sum_final(parts, [group_key]).to_pandas()
    tot = tot.merge(
        pd.DataFrame({group_key: sums[group_key], "__n": sums["__n"],
                      "__mx": mdf["__mx"], "__my": mdf["__my"]}),
        on=group_key,
    )
    tot[cov_out] = tot["__sxy"] / (tot["__n"] - 1)
    tot[slope_out] = tot["__sxy"] / tot["__sxx"]
    tot[icept_out] = tot["__my"] - tot[slope_out] * tot["__mx"]
    return tot[[group_key, cov_out, slope_out, icept_out]]


def ordered_prefix_sum(
    ds: ray.data.Dataset,
    order_key: str,
    value_col: str,
    out_col: str = "running_sum",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Global ordered running sum of ``value_col`` by ``order_key`` —
    the distributed scan primitive (SQL ``SUM(v) OVER (ORDER BY k)``),
    exact for unique integer keys. Classic two-phase parallel prefix:

    1. one cheap pass finds the key range and per-range-bucket sums
       (combiner groupby on the bucket id — tiny shuffle of partials);
    2. the driver exclusive-scans the ~``num_buckets`` bucket totals and
       broadcasts the offsets;
    3. one shuffle co-locates each bucket, which is sorted and
       cumsummed locally, + its offset.

    Nothing materializes: the wide data crosses exactly one shuffle,
    keyed by a RANGE bucket so output blocks stay globally ordered —
    this is how a 10^12-row corpus gets a deterministic linear layout
    (token-budget packing, §2.10) without a global ``sort``."""

    # this op consumes its input THREE times (span pass, bucket sums,
    # final scan); Ray Data has no common-subexpression caching, so an
    # unmaterialized upstream chain would re-execute per pass (measured
    # 29s -> 9s on the corpus-prep pipeline). Pin the blocks once —
    # scan inputs are narrow post-projection tables (key + value), and
    # the object store spills if they exceed memory.
    ds = ds.materialize()

    def key_span(b: pd.DataFrame) -> pd.DataFrame:
        k = b[order_key]
        return pd.DataFrame({"__lo": [k.min()], "__hi": [k.max()]})

    span = ds.map_batches(key_span, batch_format="pandas").to_pandas()
    if span.empty or "__lo" not in span.columns:  # empty input: no scan
        def add_empty(b: pd.DataFrame) -> pd.DataFrame:
            b[out_col] = b[value_col]
            return b

        return ds.map_batches(add_empty, batch_format="pandas")
    lo, hi = int(span["__lo"].min()), int(span["__hi"].max())
    width = max(1, (hi - lo + num_buckets) // num_buckets)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = (b[order_key].to_numpy() - lo) // width
        return b

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")
    bucket_sums = partial_groupby_sum(
        bucketed, ["__bucket"], {value_col: "__bsum"}
    ).to_pandas().sort_values("__bucket")
    bsum = bucket_sums["__bsum"].to_numpy()
    offsets = dict(zip(
        bucket_sums["__bucket"],
        np.concatenate([np.zeros(1, dtype=bsum.dtype), np.cumsum(bsum)[:-1]]),
    ))
    ref = ray.put(offsets)

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        g = g.sort_values(order_key, kind="stable")
        off = cached_get(ref)[g["__bucket"].iloc[0]]
        g[out_col] = np.cumsum(g[value_col].to_numpy()) + off
        return g.drop(columns="__bucket")

    return bucketed.groupby("__bucket").map_groups(
        scan_bucket, batch_format="pandas"
    )


def colocated_join(
    dir_left: str,
    dir_right: str,
    on: str | list[str],
    num_buckets: int,
    how: str = "inner",
    columns_left: Sequence[str] | None = None,
    columns_right: Sequence[str] | None = None,
) -> ray.data.Dataset:
    """Shuffle-FREE equi-join of two tables pre-bucketed on the join
    key by ``engine.io.write_bucketed`` (same ``num_buckets``). Task k
    reads ``bucket=k`` of each side from shared storage and merges
    locally — co-partitioned layout means no all-to-all at query time;
    the exchange happened once, at write time. This is the scale path
    for join keys reused across many pipelines (e.g. image_id:
    bytes-join, dedup, stats all reuse one layout).

    Bucket tasks fan out as a Dataset of bucket ids, so the streaming
    executor schedules/pipelines them like any other stage.

    ``how`` is 'inner' (default) or 'left'/'left_outer' (synonyms, the
    repo's Ray-style name translated for pandas). Other join types are
    refused — a right/full outer over a bucketed layout should swap the
    sides / use ``bucketed_join``. Left-join blocks keep a consistent
    schema across buckets: right-side value columns are nullable, so
    integer ones are emitted as float64 in EVERY bucket (pandas NaN
    semantics), not just the buckets that happened to have misses."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"colocated_join supports how='inner'|'left'|'left_outer', got {how!r}"
        )
    pd_how = "inner" if how == "inner" else "left"
    on_l = [on] if isinstance(on, str) else list(on)

    from engine.io import bucketed_schema

    # resolve both sides' column lists + right dtypes ONCE on the driver
    # (one parquet-footer read per side), so every bucket task emits the
    # same schema even for empty/missing buckets
    sch_l, sch_r = bucketed_schema(dir_left), bucketed_schema(dir_right)
    cols_l = list(columns_left) if columns_left else list(sch_l.names)
    cols_r = list(columns_right) if columns_right else list(sch_r.names)
    out_cols = cols_l + [c for c in cols_r if c not in cols_l]
    empty_l = sch_l.empty_table().select(cols_l).to_pandas()
    empty_r = sch_r.empty_table().select(cols_r).to_pandas()
    r_value_cols = [c for c in cols_r if c not in on_l]

    def merge_one(lt: pd.DataFrame, rt: pd.DataFrame) -> pd.DataFrame:
        m = lt.merge(rt, on=on_l, how=pd_how)
        if pd_how == "left":
            for c in r_value_cols:  # nullable → uniform float64
                if pd.api.types.is_integer_dtype(m[c]):
                    m[c] = m[c].astype(np.float64)
        return m[out_cols]

    def join_bucket(b: pd.DataFrame) -> pd.DataFrame:
        from engine.io import read_bucket_pandas

        outs = []
        for k in b["bucket_id"]:
            lt = read_bucket_pandas(dir_left, int(k), cols_l)
            if lt is None:
                continue
            rt = read_bucket_pandas(dir_right, int(k), cols_r)
            if rt is None:
                if pd_how == "inner":
                    continue
                rt = empty_r
            outs.append(merge_one(lt, rt))
        if not outs:
            # same code path as a real merge → identical empty schema
            return merge_one(empty_l, empty_r)
        return pd.concat(outs, ignore_index=True)

    buckets = ray.data.from_items(
        [{"bucket_id": k} for k in range(num_buckets)]
    )
    return buckets.map_batches(
        join_bucket, batch_size=1, batch_format="pandas"
    )


def skew_hybrid_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    hot_threshold: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Skew-aware equi-join: keys hotter than ``hot_threshold`` on the
    left are handled by BROADCASTING their (few) right-side rows —
    they never enter the shuffle — while the cold long tail takes the
    normal hash-partitioned co-shuffle. A single pathological key (half
    the fact table) would otherwise pin one join partition; here it
    costs one map-side probe. Exact: hot/cold row sets are disjoint by
    key, union of the two joins = the full join.

    The hot-key census is an exact per-batch count combiner (partials
    bounded by keys x blocks); at open-ended key spaces swap in a
    sampled or Misra-Gries census — the split stays correct for ANY
    hot set, only the routing changes."""
    # left feeds three consumers (census, hot semi, cold anti) and
    # right two; pin blocks once so a derived upstream chain is not
    # re-executed per consumer (same rationale as ordered_prefix_sum)
    left = left.materialize()
    right = right.materialize()
    counts = partial_groupby_sum(left, [on], {}, count_as="__n").to_pandas()
    hot_keys = set(counts.loc[counts["__n"] > hot_threshold, on])

    if not hot_keys:
        return bucketed_join(left, right, on=on, num_partitions=num_partitions)

    hot_df = pd.DataFrame({on: sorted(hot_keys)})
    right_hot = semi_join(right, hot_df, on=on).to_pandas()
    left_hot = semi_join(left, hot_df, on=on)
    hot_joined = broadcast_hash_join(left_hot, right_hot, on=on)

    if len(hot_keys) == len(counts):
        # every left key is hot (tiny key spaces): the cold side is
        # empty, and Ray's native JoinOperator rejects a zero-block
        # input — the census already proves there is nothing to join
        return hot_joined

    left_cold = anti_join(left, hot_df, on=on)
    right_cold = anti_join(right, hot_df, on=on)
    cold_joined = bucketed_join(
        left_cold, right_cold, on=on, num_partitions=num_partitions
    )
    return hot_joined.union(cold_joined)


def profile_table(
    ds: ray.data.Dataset, cols: Sequence[str]
) -> pd.DataFrame:
    """One-pass ANALYZE-style column statistics: per numeric column,
    row count, null count, min, max — per-batch partials (one row per
    column per batch) merged by a single min/max/sum reduce; the input
    crosses the wire as |cols| x blocks stat rows only. Approximate
    distinct counts compose via ``ops.sketch.hll_count_distinct``
    (mergeable registers) when ndv is needed too. This is the stats
    pass a planner runs before choosing broadcast vs co-shuffle joins."""
    cols_l = list(cols)

    def local(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols_l:
            v = b[c]
            vv = v.dropna()
            rows.append({
                "col": c, "n": len(v), "nulls": int(v.isna().sum()),
                "min_val": float(vv.min()) if len(vv) else np.nan,
                "max_val": float(vv.max()) if len(vv) else np.nan,
            })
        return pd.DataFrame(rows)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("col", as_index=False).agg(
            n=("n", "sum"), nulls=("nulls", "sum"),
            min_val=("min_val", "min"), max_val=("max_val", "max"),
        )
        return g.sort_values("col", ignore_index=True)

    return (
        ds.map_batches(local, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
        .to_pandas()
    )


def interval_overlap_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    lo: str = "lo",
    hi: str = "hi",
    grid: float | None = None,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> ray.data.Dataset:
    """Join two interval tables on OVERLAP (``a.lo < b.hi AND b.lo <
    a.hi``, half-open) — the 1-D spatial join. No equi-key exists, so
    a hash join can't express it; the scale plan is the same as the
    2-D PIP join's cell cover: each interval fans out to every
    ``grid``-sized cell it touches (``flat_map``-style per batch), the
    cell id becomes the shuffle key, each cell is joined locally, and
    a pair is emitted ONLY by the cell containing ``max(a.lo, b.lo)``
    so duplicates never exist (no global dedup pass). ``grid``
    defaults to the mean left-interval width — a few cells per
    interval.

    Skew note: a cell holding n_a x n_b intervals does n_a*n_b work;
    pick ``grid`` >= typical width so fan-out stays O(1) per interval,
    and salt pathological cells like A1 tiles if one cell dominates."""
    if grid is None:
        span = left.map_batches(
            lambda b: pd.DataFrame({"w": [float((b[hi] - b[lo]).mean())]}),
            batch_format="pandas",
        ).to_pandas()
        grid = max(float(span["w"].mean()), 1e-9)

    g = float(grid)

    def fan_out(side: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            lo_v = b[lo].to_numpy(dtype=np.float64)
            hi_v = b[hi].to_numpy(dtype=np.float64)
            c0 = np.floor(lo_v / g).astype(np.int64)
            c1 = np.floor(np.nextafter(hi_v, -np.inf) / g).astype(np.int64)
            reps = (c1 - c0 + 1).clip(min=1)
            idx = np.repeat(np.arange(len(b)), reps)
            out = b.iloc[idx].reset_index(drop=True)
            cells = np.concatenate(
                [np.arange(a, a + r) for a, r in zip(c0, reps)]
            ) if len(b) else np.empty(0, np.int64)
            out["__cell"] = cells
            out["__side"] = np.int8(side)
            return out

        return f

    both = left.map_batches(fan_out(0), batch_format="pandas").union(
        right.map_batches(fan_out(1), batch_format="pandas")
    )

    def join_cell(grp: pd.DataFrame) -> pd.DataFrame:
        cell = int(grp["__cell"].iloc[0])
        a = grp[grp["__side"] == 0]
        b = grp[grp["__side"] == 1]
        if a.empty or b.empty:
            return pd.DataFrame()
        pairs = a.drop(columns=["__cell", "__side"]).merge(
            b.drop(columns=["__cell", "__side"]), how="cross",
            suffixes=suffixes,
        )
        la, ha = lo + suffixes[0], hi + suffixes[0]
        lb, hb = lo + suffixes[1], hi + suffixes[1]
        ov = (pairs[la] < pairs[hb]) & (pairs[lb] < pairs[ha])
        owner = np.floor(
            np.maximum(pairs[la], pairs[lb]).to_numpy(np.float64) / g
        ).astype(np.int64) == cell
        return pairs[ov & owner]

    return both.groupby("__cell").map_groups(join_cell, batch_format="pandas")


def union_distinct(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    cols: list[str],
) -> ray.data.Dataset:
    """SQL ``UNION`` (distinct-row semantics, D4): rows present in
    EITHER input, once. Same one-shuffle tagged-union plan as
    ``intersect_distinct``."""
    return _set_op_distinct(a, b, cols, keep="any")


def auto_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    *,
    broadcast_max_rows: int = 2_000_000,
    skew_threshold: int | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Stats-driven equi-join strategy pick — the one-rule planner a
    pipeline author otherwise applies by hand:

    1. either side's row count (cheap: parquet metadata / cached block
       counts, no scan) <= ``broadcast_max_rows`` -> broadcast it, the
       big side never shuffles;
    2. both big and ``skew_threshold`` given -> ``skew_hybrid_join``
       (hot keys broadcast, cold tail co-shuffled);
    3. both big -> native hash-partitioned co-shuffle.

    ``broadcast_max_rows`` approximates "fits one worker's heap next
    to a batch"; tune with row width. At 100 TB the same rule holds
    per-stage — the count is metadata, so the pick costs nothing."""
    n_left = left.count()
    n_right = right.count()
    if n_right <= broadcast_max_rows and n_right <= n_left:
        return broadcast_hash_join(left, right.to_pandas(), on=on)
    if n_left <= broadcast_max_rows:
        return broadcast_hash_join(right, left.to_pandas(), on=on)
    if skew_threshold is not None:
        return skew_hybrid_join(
            left, right, on=on, hot_threshold=skew_threshold,
            num_partitions=num_partitions,
        )
    return bucketed_join(left, right, on=on, num_partitions=num_partitions)


def partial_groupby_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
) -> ray.data.Dataset:
    """Generalized combiner groupby: ``aggs`` maps output column ->
    (input column, fn) with fn in {sum, min, max} — all associative,
    so per-batch partials + one tiny final are exact. The min/max
    sibling of ``partial_groupby_sum`` (funnels, extremes-per-key,
    zone maps)."""
    fns = {out: fn for out, (_c, fn) in aggs.items()}

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(keys, as_index=False, sort=False).agg(
            **{out: (col, fn) for out, (col, fn) in aggs.items()}
        )

    partials = ds.map_batches(combine, batch_format="pandas")

    def final(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(keys, as_index=False, sort=False).agg(
            **{out_c: (out_c, fn) for out_c, fn in fns.items()}
        )
        return out.sort_values(keys, ignore_index=True)

    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


def weighted_sample(
    ds: ray.data.Dataset,
    id_col: str,
    weight_col: str,
    k: int,
) -> pd.DataFrame:
    """Weighted sampling without replacement, DETERMINISTIC and
    mergeable: A-Res priorities (Efraimidis & Spirakis 2006, public
    algorithm) with the uniform draw replaced by a stable hash of the
    id — ``u = hash64(id)/2^64``, ``priority = u^(1/w)`` — so every
    worker computes identical priorities and the global top-k by
    priority is exact via per-batch top-k partials + one tiny final
    (k-selection under a total order is associative). Same input ->
    same sample on any cluster shape; heavier rows win
    proportionally."""
    from engine.ops.sketch import _hash64

    def prio(b: pd.DataFrame) -> pd.DataFrame:
        h = _hash64(b[id_col].to_numpy())
        u = (h.astype(np.float64) + 0.5) / 2.0**64
        w = np.maximum(b[weight_col].to_numpy(dtype=np.float64), 1e-300)
        b = b.copy()
        b["__prio"] = u ** (1.0 / w)
        return b.sort_values(
            ["__prio", id_col], ascending=[False, True]
        ).head(k)

    parts = ds.map_batches(prio, batch_format="pandas").to_pandas()
    if "__prio" not in parts.columns:  # empty input
        return parts
    out = parts.sort_values(
        ["__prio", id_col], ascending=[False, True], kind="stable"
    ).head(k)
    return out.drop(columns="__prio").reset_index(drop=True)


def rolling_sum_range(
    ds: ray.data.Dataset,
    group_key: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    out: str = "trailing_sum",
    num_shards: int = 256,
) -> ray.data.Dataset:
    """Time-RANGE-frame trailing sum per group (SQL ``SUM(v) OVER
    (PARTITION BY g ORDER BY ts RANGE BETWEEN INTERVAL s PRECEDING AND
    CURRENT ROW)``, peers included on both frame edges, so output is
    independent of tie order). One shuffle on hash SHARDS of the group
    key; inside a shard EVERY group is processed by one vectorized
    pass: timestamps are offset per group onto disjoint ranges so a
    single global searchsorted yields all frame bounds, and the frame
    sum is a cumsum difference — no per-group Python dispatch (the
    window_rank lesson)."""
    w_ns = np.int64(window_seconds) * np.int64(1_000_000_000)

    def shard_pass(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_key, ts_col], kind="stable").copy()
        ts = g[ts_col].astype("datetime64[ns]").astype(np.int64).to_numpy()
        keys = g[group_key].to_numpy()
        # per-group disjoint offsets: frames can never cross a boundary
        change = np.concatenate([[True], keys[1:] != keys[:-1]])
        gid = np.cumsum(change) - 1
        span = (ts.max() - ts.min()) + w_ns + np.int64(2) if len(ts) else np.int64(1)
        n_groups = int(gid[-1]) + 1 if len(ts) else 0
        v = g[value_col].to_numpy(dtype=np.float64)
        cum = np.concatenate([[0.0], np.cumsum(v)])
        # gid*span must stay in int64 — with ~4M groups/shard over a
        # multi-day range it silently wraps and corrupts frame bounds,
        # so the offset trick is guarded and the rare overflow case
        # falls back to per-group searchsorted on group slices (each
        # iteration still a vectorized kernel)
        if n_groups == 0 or int(n_groups) * int(span) < 2 ** 62:
            ts_off = ts - ts.min() + gid * span
            lo = np.searchsorted(ts_off, ts_off - w_ns, side="left")
            hi = np.searchsorted(ts_off, ts_off, side="right")
        else:
            starts = np.flatnonzero(change)
            ends = np.concatenate([starts[1:], [len(ts)]])
            lo = np.empty(len(ts), dtype=np.int64)
            hi = np.empty(len(ts), dtype=np.int64)
            for s, e in zip(starts, ends):
                seg = ts[s:e]
                lo[s:e] = s + np.searchsorted(seg, seg - w_ns, side="left")
                hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        g[out] = cum[hi] - cum[lo]
        return g.drop(columns="__shard")

    return _sharded_by_key(ds, group_key, num_shards).groupby(
        "__shard"
    ).map_groups(shard_pass, batch_format="pandas")


def cooccurrence(
    ds: ray.data.Dataset,
    group_key: str,
    item_key: str,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Market-basket co-occurrence: for every unordered pair of
    DISTINCT items sharing a group (user, order, session...), the
    number of groups containing both — the support table behind
    association/lift mining. Hash-shards by group so each group's
    item set assembles locally; per shard, a distinct-pair self-merge
    emits (item_a < item_b) partials and ONE combiner count merges —
    pairs move, group contents never re-shuffle. Pair fan-out is
    k*(k-1)/2 per group; bound k upstream for heavy groups (classic
    a-priori pruning)."""

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[group_key, item_key]].drop_duplicates()
        m = d.merge(d, on=group_key, suffixes=("_a", "_b"))
        m = m[m[f"{item_key}_a"] < m[f"{item_key}_b"]]
        agg = m.groupby([f"{item_key}_a", f"{item_key}_b"],
                        as_index=False, sort=False).size()
        agg = agg.rename(columns={"size": "n_groups"})
        agg["n_groups"] = agg["n_groups"].astype(np.int64)
        return agg

    sharded = _sharded_by_key(ds, group_key, num_shards)
    partials = sharded.groupby("__shard").map_groups(
        lambda g: shard_pairs(g.drop(columns="__shard")),
        batch_format="pandas",
    )
    return sum_final(partials, [f"{item_key}_a", f"{item_key}_b"])


def ewma_last(
    ds: ray.data.Dataset,
    group_key: str,
    order_cols: list[str],
    col: str,
    alpha: float,
    num_shards: int = 256,
) -> ray.data.Dataset:
    """Per-group exponentially weighted moving average, reported at
    each group's LAST row (the monitoring decay state:
    e_1 = v_1, e_i = alpha*v_i + (1-alpha)*e_{i-1}) — computed in
    closed form as a weight-sum (alpha*(1-alpha)^(m-i), seed weight
    (1-alpha)^(m-1)), one segmented vectorized pass per shard. The
    SQL twin evaluates the identical closed form with POWER(), so no
    sequential recursion crosses the oracle boundary."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key] + order_cols, kind="stable"
        ).drop(columns="__shard")
        n = len(g)
        if n == 0:
            return pd.DataFrame({group_key: [], "n_events": [],
                                 "ewma": []})
        idx = np.arange(n, dtype=np.int64)
        gk = g[group_key].to_numpy()
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = gk[1:] != gk[:-1]
        s_idx = np.flatnonzero(starts)
        sizes = np.diff(np.r_[s_idx, n])
        gstart = np.repeat(s_idx, sizes)
        gs = np.repeat(sizes, sizes)
        pos = idx - gstart  # 0-based position in group
        v = g[col].to_numpy(np.float64)
        w = np.where(pos == 0,
                     (1.0 - alpha) ** (gs - 1),
                     alpha * (1.0 - alpha) ** (gs - 1 - pos))
        contrib = v * w
        sums = np.add.reduceat(contrib, s_idx)
        return pd.DataFrame({
            group_key: gk[s_idx],
            "n_events": sizes.astype(np.int64),
            "ewma": sums,
        })

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def cusum_changepoint(
    ds: ray.data.Dataset,
    group_key: str,
    order_cols: list[str],
    col: str,
    num_shards: int = 256,
) -> ray.data.Dataset:
    """Per-group CUSUM changepoint scan: with S_t the running sum of
    deviations from the group mean, the statistic is
    max_t |S_t| / (sigma * sqrt(m)) (sigma = population std) and the
    changepoint is the FIRST position attaining the max — the
    level-shift detector of monitoring pipelines. One segmented
    cumsum per shard; groups with sigma = 0 report (0, 1)."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key] + order_cols, kind="stable"
        ).drop(columns="__shard")
        n = len(g)
        if n == 0:
            return pd.DataFrame({group_key: [], "n_events": [],
                                 "cusum_stat": [], "t_ix": []})
        idx = np.arange(n, dtype=np.int64)
        gk = g[group_key].to_numpy()
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = gk[1:] != gk[:-1]
        s_idx = np.flatnonzero(starts)
        sizes = np.diff(np.r_[s_idx, n])
        gstart = np.repeat(s_idx, sizes)
        gs = np.repeat(sizes, sizes)
        v = g[col].to_numpy(np.float64)
        sums = np.add.reduceat(v, s_idx)
        sqs = np.add.reduceat(v * v, s_idx)
        mean = np.repeat(sums / sizes, sizes)
        var = np.repeat(sqs / sizes, sizes) - mean * mean
        sig = np.sqrt(np.maximum(var, 0.0))
        pos = idx - gstart + 1  # 1-based
        # numerator as running_sum(v) - t*mean — the SAME expression
        # tree the SQL twin evaluates (rs - rn*mu), so engine and
        # oracle floats track each other to the ulp (round-2 ADVICE:
        # cumsum(v - mean) drifted differently near argmax ties)
        csv = np.cumsum(v)
        base = np.repeat(np.r_[0.0, csv[s_idx[1:] - 1]], sizes)
        s_t = np.abs((csv - base) - pos * mean)
        denom = sig * np.sqrt(gs.astype(np.float64))
        with np.errstate(divide="ignore", invalid="ignore"):
            stat = np.where(denom > 0, s_t / denom, 0.0)
        # per-group argmax, first occurrence, on the ROUNDED statistic
        # (both sides round to 6, so a near-tie resolves to the same
        # earliest position on both sides)
        stat = np.round(stat, 6)
        gmax = np.maximum.reduceat(stat, s_idx)
        is_max = stat == np.repeat(gmax, sizes)
        big = np.where(is_max, pos, np.iinfo(np.int64).max)
        t_ix = np.minimum.reduceat(big, s_idx)
        return pd.DataFrame({
            group_key: gk[s_idx],
            "n_events": sizes.astype(np.int64),
            "cusum_stat": gmax,
            "t_ix": t_ix.astype(np.int64),
        })

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def markov_entropy(
    ds: ray.data.Dataset,
    group_key: str,
    order_cols: list[str],
    item_col: str,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Per-group sequence predictability: the conditional entropy
    H(next | current) of the group's first-order Markov transition
    matrix, in nats — 0 for perfectly scripted behavior, ln(k) for
    uniform wandering over k symbols (the bot/human discriminator of
    event-sequence mining). One shard pass builds per-group bigram
    and unigram counts vectorized; only per-group scalars leave."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key] + order_cols, kind="stable"
        ).drop(columns="__shard")
        gk = g[group_key].to_numpy()
        it = g[item_col].to_numpy()
        same = gk[1:] == gk[:-1]
        t = pd.DataFrame({
            "k": gk[1:][same],
            "a": it[:-1][same],
            "b": it[1:][same],
        })
        if not len(t):
            return pd.DataFrame({group_key: pd.Series(dtype=gk.dtype),
                                 "n_transitions": pd.Series(
                                     dtype=np.int64),
                                 "entropy": pd.Series(
                                     dtype=np.float64)})
        ab = t.groupby(["k", "a", "b"], as_index=False,
                       sort=False).size()
        a = ab.groupby(["k", "a"], as_index=False)["size"].sum() \
            .rename(columns={"size": "na"})
        m = ab.merge(a, on=["k", "a"])
        tot = m.groupby("k")["size"].transform("sum")
        contrib = -(m["size"] / tot) * np.log(m["size"] / m["na"])
        m = m.assign(__c=contrib)
        out = m.groupby("k", as_index=False).agg(
            n_transitions=("size", "sum"), entropy=("__c", "sum"))
        out = out.rename(columns={"k": group_key})
        out["n_transitions"] = out["n_transitions"].astype(np.int64)
        return out

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def benford_first_digit(
    ds: ray.data.Dataset, col: str
) -> "pd.DataFrame":
    """Benford's-law audit of a positive numeric column: observed
    first-significant-digit distribution vs log10(1 + 1/d), with the
    per-digit chi-square contribution — the fraud/synthetic-data
    smell test. One 9-bucket count combiner; everything else is
    driver arithmetic on 9 rows."""
    import pyarrow as pa

    def local(t: "pa.Table") -> "pa.Table":
        x = np.asarray(t[col], np.float64)
        x = x[x > 0]
        d = np.floor(x / np.power(10.0, np.floor(np.log10(x))))
        d = np.clip(d.astype(np.int64), 1, 9)
        cnt = np.bincount(d, minlength=10)[1:]
        return pa.table({
            "digit": pa.array(np.arange(1, 10), pa.int64()),
            "n": pa.array(cnt, pa.int64()),
        })

    tot = sum_final(
        ds.map_batches(local, batch_format="pyarrow"),
        ["digit"]).to_pandas()
    n = float(tot["n"].sum())
    p = np.log10(1.0 + 1.0 / tot["digit"].to_numpy(np.float64))
    exp = n * p
    obs = tot["n"].to_numpy(np.float64)
    tot["frac"] = obs / n
    tot["benford_p"] = p
    tot["chi2_part"] = (obs - exp) ** 2 / exp
    tot["n"] = tot["n"].astype(np.int64)
    return tot[["digit", "n", "frac", "benford_p", "chi2_part"]]


def welch_ttest(
    ds: ray.data.Dataset,
    value_col: str,
    flag_col: str,
) -> "pd.DataFrame":
    """Welch's unequal-variance t statistic between the rows where
    ``flag_col`` is true vs false — the two-cohort A/B comparison
    as one streaming moment combiner (n, sum, sumsq per cohort);
    t = (m1 - m0) / sqrt(s1^2/n1 + s0^2/n0) with SAMPLE variances,
    plus the Welch-Satterthwaite degrees of freedom."""
    import pyarrow as pa

    def local(t: "pa.Table") -> "pa.Table":
        v = np.asarray(t[value_col], np.float64)
        f = np.asarray(t[flag_col]).astype(bool)
        rows = []
        for grp in (0, 1):
            x = v[f] if grp else v[~f]
            rows.append((grp, len(x), x.sum(), (x * x).sum()))
        a = np.array(rows)
        return pa.table({
            "grp": pa.array(a[:, 0].astype(np.int64), pa.int64()),
            "n": pa.array(a[:, 1], pa.float64()),
            "s": pa.array(a[:, 2], pa.float64()),
            "ss": pa.array(a[:, 3], pa.float64()),
        })

    tot = sum_final(
        ds.map_batches(local, batch_format="pyarrow"),
        ["grp"]).to_pandas().set_index("grp")
    out = {}
    for grp in (0, 1):
        n = tot.loc[grp, "n"]
        m = tot.loc[grp, "s"] / n
        var = (tot.loc[grp, "ss"] - n * m * m) / (n - 1.0)
        out[grp] = (n, m, var)
    n0, m0, v0 = out[0]
    n1, m1, v1 = out[1]
    se2 = v1 / n1 + v0 / n0
    tstat = (m1 - m0) / np.sqrt(se2)
    dof = se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1.0)
                       + (v0 / n0) ** 2 / (n0 - 1.0))
    return pd.DataFrame({
        "n_true": np.asarray([int(n1)], np.int64),
        "n_false": np.asarray([int(n0)], np.int64),
        "mean_true": np.asarray([m1], np.float64),
        "mean_false": np.asarray([m0], np.float64),
        "t_stat": np.asarray([tstat], np.float64),
        "welch_df": np.asarray([dof], np.float64),
    })


def grouped_mad(
    ds: ray.data.Dataset,
    group_key: str,
    col: str,
) -> "pd.DataFrame":
    """Per-group median absolute deviation (MAD = median(|x -
    median(x)|), DuckDB quantile_cont interpolation on both levels) —
    the robust spread estimate outliers can't poison, paired with the
    robust z-score gate MAD-based filters use. Two passes: the
    per-group median table broadcasts (one row per group, the
    documented small side), then the deviation quantile reuses
    ``grouped_quantile_cont``."""
    import ray as _ray

    from engine.state import cached_get

    med = grouped_quantile_cont(
        ds, [group_key], col, {0.5: "__med"}).to_pandas()
    med_ref = _ray.put(dict(zip(med[group_key], med["__med"])))

    def dev(b: pd.DataFrame) -> pd.DataFrame:
        m = cached_get(med_ref)
        b = b.copy()
        b["__dev"] = np.abs(
            b[col].to_numpy(np.float64)
            - b[group_key].map(m).to_numpy(np.float64))
        return b[[group_key, "__dev"]]

    mad = grouped_quantile_cont(
        ds.map_batches(dev, batch_format="pandas"),
        [group_key], "__dev", {0.5: "mad"}).to_pandas()
    out = med.merge(mad, on=group_key)
    out = out.rename(columns={"__med": "median"})
    return out[[group_key, "median", "mad"]].sort_values(
        group_key, ignore_index=True)


def herfindahl_index(
    ds: ray.data.Dataset,
    group_key: str,
    member_key: str,
    value_col: str,
    num_shards: int = 64,
) -> "pd.DataFrame":
    """Per-group Herfindahl-Hirschman concentration index:
    HHI = sum over members of (member share of the group's total)^2
    — 1/k for k equal members, ->1 under monopoly (the
    concentration/diversity audit of revenue, traffic, or corpus
    sources). Stage 1: (group, member) sum combiner; stage 2 groups
    the member-level rollup (one row per member) per group."""

    member_tot = partial_groupby_sum(
        ds, [group_key, member_key], {value_col: "__v"})

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        v = g["__v"].to_numpy(np.float64)
        tot = v.sum()
        share2 = (v / tot) ** 2 if tot != 0 else np.zeros_like(v)
        return pd.DataFrame({
            group_key: g[group_key].iloc[:1],
            "n_members": np.asarray([len(g)], np.int64),
            "total": np.asarray([tot], np.float64),
            "hhi": np.asarray([float(share2.sum())], np.float64),
        })

    return member_tot.groupby(group_key).map_groups(
        per_group, batch_format="pandas").to_pandas().sort_values(
        group_key, ignore_index=True)


def grouped_gini(
    ds: ray.data.Dataset,
    group_key: str,
    col: str,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Per-group Gini coefficient over non-negative values (the
    inequality companion of ``herfindahl_index``):
    G = (2 * sum_i i*x_(i)) / (n * sum x) - (n + 1) / n with x sorted
    ascending and i 1-based — 0 for perfect equality, ->1 when one
    member holds everything. Hash-sharded by group, one segmented
    sort + weighted-sum pass per shard."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.drop(columns="__shard").sort_values(
            [group_key, col], kind="stable")
        gk = g[group_key].to_numpy()
        v = g[col].to_numpy(np.float64)
        n = len(g)
        if n == 0:
            return pd.DataFrame({group_key: [], "n": [], "gini": []})
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = gk[1:] != gk[:-1]
        s_idx = np.flatnonzero(starts)
        sizes = np.diff(np.r_[s_idx, n])
        pos = np.arange(n) - np.repeat(s_idx, sizes) + 1  # 1-based
        tot = np.add.reduceat(v, s_idx)
        wsum = np.add.reduceat(pos * v, s_idx)
        m = sizes.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            gini = np.where(tot > 0,
                            2.0 * wsum / (m * tot) - (m + 1.0) / m,
                            0.0)
        return pd.DataFrame({
            group_key: gk[s_idx],
            "n": sizes.astype(np.int64),
            "gini": gini,
        })

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def burstiness(
    ds: ray.data.Dataset,
    group_key: str,
    order_cols: list[str],
    ts_col: str,
    num_shards: int = 256,
) -> ray.data.Dataset:
    """Per-group burstiness of inter-event gaps: B = (sigma - mu) /
    (sigma + mu) over the gaps of the ordered sequence (Goh-Barabasi)
    — -1 for a perfect clock, 0 for Poisson, ->1 for heavy bursts.
    Population sigma. One segmented diff + moment pass per shard;
    groups with < 2 events or zero mean gap report 0 gaps / NaN-free
    defaults."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key] + order_cols, kind="stable"
        ).drop(columns="__shard")
        gk = g[group_key].to_numpy()
        t = g[ts_col].to_numpy(np.float64)
        same = gk[1:] == gk[:-1]
        d = pd.DataFrame({"k": gk[1:][same],
                          "dt": (t[1:] - t[:-1])[same]})
        if not len(d):
            return pd.DataFrame({group_key: pd.Series(dtype=gk.dtype),
                                 "n_gaps": pd.Series(dtype=np.int64),
                                 "mean_gap": pd.Series(
                                     dtype=np.float64),
                                 "burstiness": pd.Series(
                                     dtype=np.float64)})
        agg = d.groupby("k", sort=False)["dt"].agg(
            n_gaps="size", mean_gap="mean",
            sd=lambda s: float(s.to_numpy().std()))
        agg = agg.reset_index().rename(columns={"k": group_key})
        mu = agg["mean_gap"].to_numpy(np.float64)
        sd = agg["sd"].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            b = np.where(sd + mu > 0, (sd - mu) / (sd + mu), 0.0)
        agg["burstiness"] = b
        agg["n_gaps"] = agg["n_gaps"].astype(np.int64)
        return agg[[group_key, "n_gaps", "mean_gap", "burstiness"]]

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def grouped_skew_kurt(
    ds: ray.data.Dataset,
    group_key: str,
    col: str,
) -> ray.data.Dataset:
    """Per-group population skewness g1 = m3 / m2^1.5 and excess
    kurtosis g2 = m4 / m2^2 - 3 from raw power sums (n, sum x..x^4)
    — one streaming moment combiner, the shape-diagnostics extension
    of the var/corr family. Central moments come from the binomial
    expansion of the raw sums, so nothing but 5 scalars per group
    moves."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(np.float64)
        g = pd.DataFrame({group_key: b[group_key], "x1": v,
                          "x2": v * v, "x3": v ** 3, "x4": v ** 4})
        return g.groupby(group_key, as_index=False, sort=False).agg(
            n=("x1", "size"), s1=("x1", "sum"), s2=("x2", "sum"),
            s3=("x3", "sum"), s4=("x4", "sum"))

    tot = sum_final(
        ds.map_batches(local, batch_format="pandas"), [group_key])

    def final(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.float64)
        m1 = b["s1"].to_numpy() / n
        m2 = b["s2"].to_numpy() / n - m1 ** 2
        m3 = (b["s3"].to_numpy() / n - 3 * m1 * b["s2"].to_numpy()
              / n + 2 * m1 ** 3)
        m4 = (b["s4"].to_numpy() / n
              - 4 * m1 * b["s3"].to_numpy() / n
              + 6 * m1 ** 2 * b["s2"].to_numpy() / n - 3 * m1 ** 4)
        with np.errstate(divide="ignore", invalid="ignore"):
            g1 = np.where(m2 > 0, m3 / m2 ** 1.5, 0.0)
            g2 = np.where(m2 > 0, m4 / (m2 * m2) - 3.0, 0.0)
        out = b[[group_key]].copy()
        out["n"] = b["n"].to_numpy(np.int64)
        out["skewness"] = g1
        out["excess_kurtosis"] = g2
        return out

    return tot.map_batches(final, batch_format="pandas")


def sessionize(
    ds: ray.data.Dataset,
    group_key: str,
    ts_col: str,
    order_cols: list[str],
    gap: float,
    num_shards: int = 256,
) -> ray.data.Dataset:
    """Gap-based sessionization (web/event analytics staple): within
    each group ordered by ``[ts_col] + order_cols``, a new session
    starts at the first event and whenever the gap from the previous
    event is STRICTLY greater than ``gap`` (equal-to-gap stays in the
    session, the convention SQL's ``t - pt > gap`` twin reproduces).
    Emits one row per session: ``(group_key, session_seq, n_events,
    start_ts, end_ts, duration)`` with ``session_seq`` 1-based per
    group.

    Physical plan: one co-shuffle by ``hash(group_key)`` (a group
    lives wholly in one shard, so no session ever spans a task), then
    a single segmented diff + flag-cumsum + reduceat pass per shard —
    no per-group Python dispatch, no window materialization. At 10^9
    users the exchange moves (key, ts) pairs only."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key, ts_col] + order_cols, kind="stable"
        ).drop(columns="__shard")
        gk = g[group_key].to_numpy()
        t = g[ts_col].to_numpy(np.float64)
        n = len(g)
        empty = pd.DataFrame(
            {group_key: pd.Series(dtype=gk.dtype),
             "session_seq": pd.Series(dtype=np.int64),
             "n_events": pd.Series(dtype=np.int64),
             "start_ts": pd.Series(dtype=np.float64),
             "end_ts": pd.Series(dtype=np.float64),
             "duration": pd.Series(dtype=np.float64)})
        if n == 0:
            return empty
        new_group = np.ones(n, dtype=bool)
        new_group[1:] = gk[1:] != gk[:-1]
        flag = new_group.copy()
        flag[1:] |= (t[1:] - t[:-1]) > gap
        pos = np.flatnonzero(flag)
        sid = np.cumsum(flag)                     # global session id
        # 1-based seq within group: sid minus sid at the group's start
        grp_start_sid = sid[np.flatnonzero(new_group)]
        seq_at_start = (
            sid[pos]
            - np.repeat(grp_start_sid,
                        np.add.reduceat(flag.astype(np.int64),
                                        np.flatnonzero(new_group)))
            + 1
        )
        ends = np.empty_like(pos)
        ends[:-1] = pos[1:] - 1
        ends[-1] = n - 1
        return pd.DataFrame(
            {group_key: gk[pos],
             "session_seq": seq_at_start.astype(np.int64),
             "n_events": np.diff(np.append(pos, n)).astype(np.int64),
             "start_ts": t[pos],
             "end_ts": t[ends],
             "duration": t[ends] - t[pos]})

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def theil_index(
    ds: ray.data.Dataset,
    group_key: str,
    col: str,
) -> ray.data.Dataset:
    """Per-group Theil T inequality index over POSITIVE values:
    T = sum((x/mu) * ln(x/mu)) / n = (sum x*ln x) / (n*mu) - ln(mu)
    — 0 for perfect equality, ln(n) when one member holds everything;
    unlike Gini it decomposes additively across subgroups, which is
    why economics pipelines carry both. Pure streaming moment
    combiner: only (n, sum x, sum x*ln x) scalars per group move —
    no sort, no shuffle of raw rows (cheaper than ``grouped_gini``,
    whose rank weights force a segmented sort). Non-positive values
    are the caller's contract (same as SQL ln())."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(np.float64)
        g = pd.DataFrame({group_key: b[group_key], "s1": v,
                          "sxl": v * np.log(v)})
        return g.groupby(group_key, as_index=False, sort=False).agg(
            n=("s1", "size"), s1=("s1", "sum"), sxl=("sxl", "sum"))

    tot = sum_final(
        ds.map_batches(local, batch_format="pandas"), [group_key])

    def final(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.float64)
        mu = b["s1"].to_numpy() / n
        with np.errstate(divide="ignore", invalid="ignore"):
            t = b["sxl"].to_numpy() / (n * mu) - np.log(mu)
        out = b[[group_key]].copy()
        out["n"] = b["n"].to_numpy(np.int64)
        out["theil"] = np.where(mu > 0, t, 0.0)
        return out

    return tot.map_batches(final, batch_format="pandas")


def trimmed_mean(
    ds: ray.data.Dataset,
    group_key: str,
    col: str,
    trim_frac: float = 0.1,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Per-group symmetric trimmed mean: drop the lowest and highest
    ``floor(trim_frac * n)`` values, average the rest — the robust
    location estimate between mean (outlier-fragile) and median
    (discards ordering weight). Tie handling is position-free: the
    kept MULTISET is identical for any tie order, so only values sort
    (no tie-break columns needed). Hash-sharded by group, one
    segmented sort + two reduceat passes per shard."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.drop(columns="__shard").sort_values(
            [group_key, col], kind="stable")
        gk = g[group_key].to_numpy()
        v = g[col].to_numpy(np.float64)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {group_key: pd.Series(dtype=gk.dtype),
                 "n": pd.Series(dtype=np.int64),
                 "n_kept": pd.Series(dtype=np.int64),
                 "trimmed_mean": pd.Series(dtype=np.float64)})
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = gk[1:] != gk[:-1]
        s_idx = np.flatnonzero(starts)
        sizes = np.diff(np.r_[s_idx, n])
        k = np.floor(trim_frac * sizes).astype(np.int64)
        keep = np.maximum(sizes - 2 * k, 0)
        # prefix sums give the kept-window sum per segment in O(n)
        cs = np.concatenate([[0.0], np.cumsum(v)])
        lo = s_idx + k
        hi = s_idx + k + keep
        ksum = cs[hi] - cs[lo]
        with np.errstate(divide="ignore", invalid="ignore"):
            tm = np.where(keep > 0, ksum / keep, np.nan)
        return pd.DataFrame({
            group_key: gk[s_idx],
            "n": sizes.astype(np.int64),
            "n_kept": keep.astype(np.int64),
            "trimmed_mean": tm,
        })

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def fk_audit(
    child: ray.data.Dataset,
    parent: ray.data.Dataset,
    child_key: str,
    parent_key: str,
    fk_name: str,
    *,
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Referential-integrity audit of one FK edge — the data-quality
    gate a pipeline runs before trusting a join: child rows whose key
    has no parent (orphans, would silently vanish from inner joins),
    parent rows with no child (childless, would vanish from the other
    side), and duplicated parent keys (would fan out).

    Plan (round-5 rev — the first cut ran row-level both-big
    anti-joins and was the suite's 15s heavy tail): ONE exchange
    total. Each side emits per-batch (key, child_rows, parent_rows)
    count partials (distinct keys per batch, not rows); the unioned
    partials hash-shard by key, and each shard folds its complete
    key groups into FOUR scalars — orphan child rows (parent count
    0), childless parent rows (child count 0), distinct parent keys,
    and the row totals. The driver sums one row per shard. Exact NOT
    IN semantics with no anti-join machinery, no distinct pass, and
    no per-direction re-scan."""

    def partials(key, col):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(key, as_index=False, sort=False).size()
            out = pd.DataFrame({"__k": g[key]})
            out["__nc"] = np.int64(0)
            out["__np"] = np.int64(0)
            out[col] = g["size"].astype(np.int64)
            return out
        return f

    both = child.map_batches(
        partials(child_key, "__nc"), batch_format="pandas"
    ).union(parent.map_batches(
        partials(parent_key, "__np"), batch_format="pandas"))

    def fold(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.drop(columns="__shard").groupby(
            "__k", as_index=False, sort=False).sum()
        nc = g["__nc"].to_numpy(np.int64)
        np_ = g["__np"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_child": [int(nc.sum())],
            "n_parent": [int(np_.sum())],
            "child_orphan_rows": [int(nc[np_ == 0].sum())],
            "parent_childless": [int(np_[nc == 0].sum())],
            "parent_keys": [int((np_ > 0).sum())],
        })

    nsh = num_partitions or 256
    per_shard = (
        _sharded_by_key(both, "__k", nsh)
        .groupby("__shard")
        .map_groups(fold, batch_format="pandas")
    ).to_pandas()
    tot = per_shard.sum()
    return pd.DataFrame({
        "fk": [fk_name],
        "n_child": np.array([tot["n_child"]], np.int64),
        "n_parent": np.array([tot["n_parent"]], np.int64),
        "child_orphan_rows": np.array([tot["child_orphan_rows"]],
                                      np.int64),
        "parent_childless": np.array([tot["parent_childless"]],
                                     np.int64),
        "parent_dup_keys": np.array(
            [tot["n_parent"] - tot["parent_keys"]], np.int64),
    })


def winsorized_mean(
    ds: ray.data.Dataset,
    group_key: str,
    col: str,
    trim_frac: float = 0.1,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Per-group positional winsorized mean (Tukey/Dixon, public
    formula): CLAMP the lowest ``k = floor(trim_frac * n)`` values to
    the (k+1)-th smallest and the highest k to the (n-k)-th smallest,
    then average ALL n — the robust companion of :func:`trimmed_mean`
    that keeps the sample size (no mass discarded, outliers pulled to
    the fences). Positional definition (not quantile-interpolated) so
    the result is an exact multiset function with a clean SQL twin
    (ROW_NUMBER + per-group fence values). Same shard plan as
    trimmed_mean: hash-sharded by group, one segmented sort + prefix
    sums per shard."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.drop(columns="__shard").sort_values(
            [group_key, col], kind="stable")
        gk = g[group_key].to_numpy()
        v = g[col].to_numpy(np.float64)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {group_key: pd.Series(dtype=gk.dtype),
                 "n": pd.Series(dtype=np.int64),
                 "n_clamped": pd.Series(dtype=np.int64),
                 "winsorized_mean": pd.Series(dtype=np.float64)})
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = gk[1:] != gk[:-1]
        s_idx = np.flatnonzero(starts)
        sizes = np.diff(np.r_[s_idx, n])
        k = np.floor(trim_frac * sizes).astype(np.int64)
        # middle window [k, n-k) summed exactly; the 2k clamped slots
        # contribute k * fence_lo + k * fence_hi
        cs = np.concatenate([[0.0], np.cumsum(v)])
        lo = s_idx + k
        hi = s_idx + sizes - k
        mid = cs[hi] - cs[lo]
        fence_lo = v[np.minimum(s_idx + k, s_idx + sizes - 1)]
        fence_hi = v[np.maximum(s_idx + sizes - 1 - k, s_idx)]
        total = mid + k * fence_lo + k * fence_hi
        return pd.DataFrame({
            group_key: gk[s_idx],
            "n": sizes.astype(np.int64),
            "n_clamped": (2 * k).astype(np.int64),
            "winsorized_mean": total / sizes,
        })

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def mutual_information(
    ds: ray.data.Dataset,
    a_col: str,
    b_col: str,
) -> pd.DataFrame:
    """Mutual information I(A;B) between two categorical columns in
    nats (Shannon, public formula), plus the marginal entropies and
    the arithmetic-mean-normalized NMI = 2 I / (H(A) + H(B)) — the
    information-theoretic dependence measure behind feature selection
    and leakage screens (chi-square's companion: MI weights by
    probability mass, chi2 by squared deviation). One (a, b) count
    combiner feeds ``sum_final``; margins and the O(KxL) sum fold on
    the driver — only distinct-pair partials ever move."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby([a_col, b_col], as_index=False, sort=False).size()
        g = g.rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return g

    cnt = sum_final(
        ds.map_batches(local, batch_format="pandas"), [a_col, b_col]
    ).to_pandas()
    if cnt.empty:
        return pd.DataFrame({
            "mi_nats": [0.0], "h_a": [0.0], "h_b": [0.0],
            "nmi": [0.0]})
    n = float(cnt["n"].sum())
    pab = cnt["n"].to_numpy(np.float64) / n
    pa = cnt.groupby(a_col)["n"].transform("sum").to_numpy(
        np.float64) / n
    pb = cnt.groupby(b_col)["n"].transform("sum").to_numpy(
        np.float64) / n
    mi = float(np.sum(pab * np.log(pab / (pa * pb))))
    ha = -float(np.sum(
        (ma := cnt.groupby(a_col)["n"].sum().to_numpy(np.float64) / n)
        * np.log(ma)))
    hb = -float(np.sum(
        (mb := cnt.groupby(b_col)["n"].sum().to_numpy(np.float64) / n)
        * np.log(mb)))
    denom = ha + hb
    return pd.DataFrame({
        "mi_nats": [round(mi, 6)], "h_a": [round(ha, 6)],
        "h_b": [round(hb, 6)],
        "nmi": [round(2.0 * mi / denom if denom > 0 else 0.0, 6)]})


def lorenz_deciles(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
) -> pd.DataFrame:
    """Lorenz concentration curve at population deciles: entities
    sorted by total value ASCENDING (ties -> key ascending), decile d
    covers the first ceil(n * d / 10) entities, reporting each
    decile's cumulative share of total value — the curve behind the
    Gini/Pareto scalars already in the suite (this is the auditable
    10-point shape). Per-entity totals come from one exact combiner
    groupby; the decile fold sorts the O(entities) totals on one
    worker — the same documented small side as the Pareto query
    (entity tables are O(customers), not O(rows))."""
    per = sum_final(
        ds.map_batches(
            lambda b: b.groupby(key_col, as_index=False, sort=False)
            .agg(v=(value_col, "sum")),
            batch_format="pandas"), [key_col]).to_pandas()
    if per.empty:
        return pd.DataFrame({
            "decile": pd.Series(dtype=np.int64),
            "n_entities": pd.Series(dtype=np.int64),
            "cum_share": pd.Series(dtype=np.float64)})
    per = per.sort_values(["v", key_col], kind="stable",
                          ignore_index=True)
    v = per["v"].to_numpy(np.float64)
    cs = np.cumsum(v)
    tot = cs[-1]
    n = len(v)
    rows = []
    for d in range(1, 11):
        m = int(np.ceil(n * d / 10))
        rows.append((d, m, round(float(cs[m - 1] / tot), 6)
                     if tot != 0 else 0.0))
    return pd.DataFrame(
        rows, columns=["decile", "n_entities", "cum_share"])


def spearman_corr(
    ds: ray.data.Dataset,
    group_key: str,
    x: str,
    y: str,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Per-group Spearman rank correlation with MIDRANK tie handling
    (the fractional-rank convention every stats package and SQL's
    RANK() + (ties-1)/2 reproduce) — the monotone-association
    companion of ``grouped_corr``'s linear Pearson. One co-shuffle by
    group, then per shard: two lexsorts produce midranks for x and y,
    and the Pearson of the ranks uses the closed-form rank mean
    (n+1)/2 — exact, so no first aggregation pass is needed. Midranks
    are exact halves (representable), keeping both sides' arithmetic
    aligned."""

    def _midranks(gk: np.ndarray, v: np.ndarray) -> np.ndarray:
        n = len(gk)
        order = np.lexsort((v, gk))
        gs, vs = gk[order], v[order]
        seg = np.zeros(n, bool)
        seg[0] = True
        seg[1:] = gs[1:] != gs[:-1]
        s_idx = np.flatnonzero(seg)
        pos = (np.arange(n)
               - np.repeat(s_idx, np.diff(np.r_[s_idx, n])) + 1)
        run = seg.copy()
        run[1:] |= vs[1:] != vs[:-1]
        r_idx = np.flatnonzero(run)
        r_sizes = np.diff(np.r_[r_idx, n])
        mid = pos[r_idx] + (r_sizes - 1) / 2.0
        out = np.empty(n, np.float64)
        out[order] = np.repeat(mid, r_sizes)
        return out

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.drop(columns="__shard")
        gk = g[group_key].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {group_key: pd.Series(dtype=gk.dtype),
                 "n": pd.Series(dtype=np.int64),
                 "spearman": pd.Series(dtype=np.float64)})
        rx = _midranks(gk, g[x].to_numpy())
        ry = _midranks(gk, g[y].to_numpy())
        order = np.argsort(gk, kind="stable")
        gs = gk[order]
        seg = np.zeros(n, bool)
        seg[0] = True
        seg[1:] = gs[1:] != gs[:-1]
        s_idx = np.flatnonzero(seg)
        sizes = np.diff(np.r_[s_idx, n]).astype(np.float64)
        mu = (sizes + 1.0) / 2.0  # exact rank mean
        dx = rx[order] - np.repeat(mu, sizes.astype(np.int64))
        dy = ry[order] - np.repeat(mu, sizes.astype(np.int64))
        sxy = np.add.reduceat(dx * dy, s_idx)
        sxx = np.add.reduceat(dx * dx, s_idx)
        syy = np.add.reduceat(dy * dy, s_idx)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where((sxx > 0) & (syy > 0),
                         sxy / np.sqrt(sxx * syy), np.nan)
        return pd.DataFrame({
            group_key: gs[s_idx],
            "n": sizes.astype(np.int64),
            "spearman": r,
        })

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def mann_whitney_u(
    ds: ray.data.Dataset,
    col: str,
    flag_col: str,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Two-cohort Mann-Whitney U (Wilcoxon rank-sum) test with midrank
    ties and the normal approximation's tie-corrected z — the
    distribution-free companion of ``welch_ttest`` (rank-based, so a
    heavy-tailed metric can't fake a difference through variance).

    Fully distributed without a global sort of ROWS: midranks only
    need the global CDF of DISTINCT values, so (1) a combiner reduces
    rows to per-value (n, n_true) counts, (2) distinct values bucket
    by VALUE RANGE, the driver exclusive-scans the ~num_buckets bucket
    totals, (3) each bucket locally sorts its values and folds
    R1 += n_true * midrank plus the tie term t^3 - t. Midranks are
    half-integers and counts are ints, so every partial is EXACT in
    float64 below 2^53 — the SQL twin's per-row rank sum lands on the
    identical values."""
    from engine.state import cached_get

    def local(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "v": b[col].to_numpy(np.float64),
            "n": np.ones(len(b), np.int64),
            "n1": b[flag_col].to_numpy(bool).astype(np.int64)})
        return g.groupby("v", as_index=False, sort=False).sum()

    per_val = sum_final(
        ds.map_batches(local, batch_format="pandas"), ["v"]
    ).materialize()

    span = per_val.map_batches(
        lambda b: pd.DataFrame({
            "lo": [b["v"].min()], "hi": [b["v"].max()],
            "n": [b["n"].sum()], "n1": [b["n1"].sum()]}),
        batch_format="pandas").to_pandas()
    if span.empty:
        return pd.DataFrame({"n_true": [0], "n_false": [0],
                             "u_stat": [np.nan], "z_stat": [np.nan]})
    lo, hi = float(span["lo"].min()), float(span["hi"].max())
    n_tot = int(span["n"].sum())
    n1 = int(span["n1"].sum())
    n0 = n_tot - n1
    width = max((hi - lo) / num_buckets, 1e-300)

    def bucket_ix(v: np.ndarray) -> np.ndarray:
        return np.minimum(((v - lo) / width).astype(np.int64),
                          num_buckets - 1)

    bsums = per_val.map_batches(
        lambda b: pd.DataFrame(
            {"bk": bucket_ix(b["v"].to_numpy()),
             "n": b["n"].to_numpy()}
        ).groupby("bk", as_index=False, sort=False).sum(),
        batch_format="pandas").to_pandas()
    bt = np.zeros(num_buckets, np.int64)
    agg = bsums.groupby("bk")["n"].sum()
    bt[agg.index.to_numpy()] = agg.to_numpy()
    offsets = np.zeros(num_buckets, np.int64)
    np.cumsum(bt[:-1], out=offsets[1:])
    off_ref = ray.put(offsets)

    def add_bk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__shard"] = bucket_ix(b["v"].to_numpy()).astype(np.int32)
        return b

    def contrib(g: pd.DataFrame) -> pd.DataFrame:
        offs = cached_get(off_ref)
        bk = int(g["__shard"].iloc[0])
        g = g.sort_values("v", kind="stable")
        n = g["n"].to_numpy(np.int64)
        m1 = g["n1"].to_numpy(np.int64)
        c_less = offs[bk] + np.concatenate(
            [[0], np.cumsum(n[:-1])])
        mr = c_less + (n + 1) / 2.0  # exact half-integers
        return pd.DataFrame({
            "part": [np.int64(0)],
            "r1": [float((m1 * mr).sum())],
            "ties": [float((n.astype(np.float64) ** 3 - n).sum())],
        })

    tot = sum_final(
        per_val.map_batches(add_bk, batch_format="pandas")
        .groupby("__shard")
        .map_groups(contrib, batch_format="pandas"),
        ["part"]).to_pandas()
    r1 = float(tot["r1"].sum())
    ties = float(tot["ties"].sum())
    u = r1 - n1 * (n1 + 1) / 2.0
    mu = n1 * n0 / 2.0
    nn = float(n_tot)
    with np.errstate(divide="ignore", invalid="ignore"):
        sig = np.sqrt((n1 * n0 / 12.0)
                      * ((nn + 1.0) - ties / (nn * (nn - 1.0))))
        z = (u - mu) / sig if sig > 0 else np.nan
    return pd.DataFrame({
        "n_true": [np.int64(n1)], "n_false": [np.int64(n0)],
        "u_stat": [u], "z_stat": [z]})


def ks_test_2samp(
    ds: ray.data.Dataset,
    col: str,
    flag_col: str,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic D = max_v |F1(v) -
    F0(v)| over the cohort ECDFs, plus the scaled statistic
    sqrt(n1*n0/(n1+n0)) * D — the whole-distribution drift detector
    (data-drift monitoring between ingest days), complementing
    Mann-Whitney's location shift. Same distributed shape as
    ``mann_whitney_u``: rows reduce to per-value cohort counts, value
    ranges give per-bucket cumulative offsets, each bucket scans its
    local CDF — the ECDF differences are ratios of EXACT integer
    counts, so the SQL twin's window cumsum lands on identical
    floats."""
    from engine.state import cached_get

    def local(b: pd.DataFrame) -> pd.DataFrame:
        f = b[flag_col].to_numpy(bool)
        g = pd.DataFrame({
            "v": b[col].to_numpy(np.float64),
            "n1": f.astype(np.int64),
            "n0": (~f).astype(np.int64)})
        return g.groupby("v", as_index=False, sort=False).sum()

    per_val = sum_final(
        ds.map_batches(local, batch_format="pandas"), ["v"]
    ).materialize()

    span = per_val.map_batches(
        lambda b: pd.DataFrame({
            "lo": [b["v"].min()], "hi": [b["v"].max()],
            "n1": [b["n1"].sum()], "n0": [b["n0"].sum()]}),
        batch_format="pandas").to_pandas()
    if span.empty:
        return pd.DataFrame({"n_true": [0], "n_false": [0],
                             "ks_d": [np.nan], "ks_stat": [np.nan]})
    lo, hi = float(span["lo"].min()), float(span["hi"].max())
    t1, t0 = int(span["n1"].sum()), int(span["n0"].sum())
    width = max((hi - lo) / num_buckets, 1e-300)

    def bucket_ix(v: np.ndarray) -> np.ndarray:
        return np.minimum(((v - lo) / width).astype(np.int64),
                          num_buckets - 1)

    bsums = per_val.map_batches(
        lambda b: pd.DataFrame(
            {"bk": bucket_ix(b["v"].to_numpy()),
             "n1": b["n1"].to_numpy(), "n0": b["n0"].to_numpy()}
        ).groupby("bk", as_index=False, sort=False).sum(),
        batch_format="pandas").to_pandas()
    b1 = np.zeros(num_buckets, np.int64)
    b0 = np.zeros(num_buckets, np.int64)
    agg = bsums.groupby("bk")[["n1", "n0"]].sum()
    b1[agg.index.to_numpy()] = agg["n1"].to_numpy()
    b0[agg.index.to_numpy()] = agg["n0"].to_numpy()
    off1 = np.zeros(num_buckets, np.int64)
    off0 = np.zeros(num_buckets, np.int64)
    np.cumsum(b1[:-1], out=off1[1:])
    np.cumsum(b0[:-1], out=off0[1:])
    off_ref = ray.put((off1, off0))

    def add_bk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__shard"] = bucket_ix(b["v"].to_numpy()).astype(np.int32)
        return b

    def local_max(g: pd.DataFrame) -> pd.DataFrame:
        o1, o0 = cached_get(off_ref)
        bk = int(g["__shard"].iloc[0])
        g = g.sort_values("v", kind="stable")
        c1 = o1[bk] + np.cumsum(g["n1"].to_numpy(np.int64))
        c0 = o0[bk] + np.cumsum(g["n0"].to_numpy(np.int64))
        d = np.abs(c1 / float(t1) - c0 / float(t0))
        return pd.DataFrame({"dmax": [float(d.max())]})

    parts = (per_val.map_batches(add_bk, batch_format="pandas")
             .groupby("__shard")
             .map_groups(local_max, batch_format="pandas")
             .to_pandas())
    d = float(parts["dmax"].max())
    ks = np.sqrt(t1 * t0 / float(t1 + t0)) * d
    return pd.DataFrame({
        "n_true": [np.int64(t1)], "n_false": [np.int64(t0)],
        "ks_d": [d], "ks_stat": [ks]})


def chi2_independence(
    ds: ray.data.Dataset,
    a: str,
    b: str,
) -> pd.DataFrame:
    """Chi-square test of independence between two categorical
    columns, plus Cramér's V effect size — the "is this feature
    informative" screen over label-ish columns. The contingency
    table comes from one (a, b) count combiner (r x c cells move,
    never rows); the full grid INCLUDING zero-observed cells enters
    the statistic (their (0-e)^2/e = e terms), matching the textbook
    definition and the SQL twin's cross-join spine."""
    counts = partial_groupby_sum(
        ds, [a, b], {}, count_as="n").to_pandas()
    if counts.empty:
        return pd.DataFrame({"n": [0], "chi2": [np.nan], "df": [0],
                             "cramers_v": [np.nan]})
    piv = counts.pivot_table(index=a, columns=b, values="n",
                             fill_value=0, aggfunc="sum")
    n_ij = piv.to_numpy(np.float64)
    row = n_ij.sum(axis=1)
    col = n_ij.sum(axis=0)
    tot = n_ij.sum()
    e = np.outer(row, col) / tot
    chi2 = float(((n_ij - e) ** 2 / e).sum())
    r, c = n_ij.shape
    df = (r - 1) * (c - 1)
    v = float(np.sqrt(chi2 / (tot * min(r - 1, c - 1)))) \
        if min(r, c) > 1 else np.nan
    return pd.DataFrame({
        "n": [np.int64(tot)], "chi2": [chi2],
        "df": [np.int64(df)], "cramers_v": [v]})


def km_survival(
    ds: ray.data.Dataset,
    duration_col: str,
    event_col: str,
) -> pd.DataFrame:
    """Kaplan-Meier survival estimate over INTEGER-bucketed durations
    (e.g. whole days) with right censoring: at each bucket t with
    d_t > 0 observed events, S(t) = prod_{u <= t} (1 - d_u /
    n_risk_u) — the product-limit retention/churn curve. Bucketing
    keeps the reduced table O(time-span), never O(subjects): one
    (duration, event) count combiner moves per-day scalars, the
    driver folds the <=span-row table. The product is computed as
    exp(cumsum(ln ...)) with a 1e-300 floor — the exact expression
    tree of the SQL twin, so both sides agree bit-for-bit."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "day": b[duration_col].to_numpy(np.int64),
            "d": b[event_col].to_numpy(np.int64),
            "t": np.ones(len(b), np.int64)})
        return g.groupby("day", as_index=False, sort=False).sum()

    per_day = sum_final(
        ds.map_batches(local, batch_format="pandas"), ["day"]
    ).to_pandas().sort_values("day", ignore_index=True)
    if per_day.empty:
        return pd.DataFrame({"day": pd.Series(dtype=np.int64),
                             "n_risk": pd.Series(dtype=np.int64),
                             "n_events": pd.Series(dtype=np.int64),
                             "survival": pd.Series(dtype=np.float64)})
    tot = int(per_day["t"].sum())
    before = np.concatenate(
        [[0], np.cumsum(per_day["t"].to_numpy(np.int64)[:-1])])
    per_day["n_risk"] = tot - before
    d = per_day["d"].to_numpy(np.float64)
    nr = per_day["n_risk"].to_numpy(np.float64)
    surv = np.exp(np.cumsum(
        np.log(np.maximum(1.0 - d / nr, 1e-300))))
    per_day["survival"] = surv
    out = per_day[per_day["d"] > 0].reset_index(drop=True)
    return pd.DataFrame({
        "day": out["day"].astype(np.int64),
        "n_risk": out["n_risk"].astype(np.int64),
        "n_events": out["d"].astype(np.int64),
        "survival": out["survival"].astype(np.float64)})


def weighted_median(
    ds: ray.data.Dataset,
    group_key: str,
    col: str,
    weight_col: str,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Per-group WEIGHTED lower median: the smallest value v whose
    cumulative weight (values sorted ascending) reaches half the
    group's total weight — the robust center when rows carry
    multiplicity (quantity-weighted price, token-weighted score).
    Deterministic tie rule: cumulative weights compare with >= and
    equal-VALUE rows all carry the same candidate, so tie order can't
    change the result. With integer weights (the common multiplicity
    case) every cumulative sum is exact in float64, making the >=
    boundary bit-identical to the SQL twin's window cumsum. One
    co-shuffle by group, then a segmented sort + cumsum pass per
    shard."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.drop(columns="__shard").sort_values(
            [group_key, col], kind="stable")
        gk = g[group_key].to_numpy()
        v = g[col].to_numpy(np.float64)
        w = g[weight_col].to_numpy(np.float64)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {group_key: pd.Series(dtype=gk.dtype),
                 "total_w": pd.Series(dtype=np.float64),
                 "weighted_median": pd.Series(dtype=np.float64)})
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = gk[1:] != gk[:-1]
        s_idx = np.flatnonzero(starts)
        sizes = np.diff(np.r_[s_idx, n])
        cw = np.cumsum(w)
        base = np.concatenate([[0.0], cw])[s_idx]
        cum_in = cw - np.repeat(base, sizes)  # per-group running sum
        tot = np.add.reduceat(w, s_idx)
        half = np.repeat(tot / 2.0, sizes)
        hit = cum_in >= half
        # first hit per group: positions where hit first flips true
        first = np.zeros(n, dtype=bool)
        first[s_idx] = hit[s_idx]
        inner = ~starts & hit
        inner[1:] &= ~hit[:-1]
        first |= inner
        sel = np.flatnonzero(first)
        return pd.DataFrame({
            group_key: gk[sel],
            "total_w": tot,
            "weighted_median": v[sel],
        })

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas")
    )


def kendall_tau_grid(
    ds: ray.data.Dataset,
    group_key: str,
    x: str,
    y: str,
    y_div: float = 1000.0,
) -> pd.DataFrame:
    """Per-group Kendall tau-b over a DISCRETIZED value grid: x taken
    as integers, y bucketed by ``floor(y / y_div)``. Concordant /
    discordant pair counts come from 2D prefix sums over the per-group
    contingency grid — C = sum n_ij * N(<i,<j), D = sum n_ij *
    N(<i,>j), tau_b = (C-D)/sqrt((n0-n1)(n0-n2)) with the standard
    tie terms (Kendall 1945, public formula). Every count is an exact
    integer, so the SQL twin (dense-grid window cumsums) matches
    bit-for-bit through the one final float expression.

    Distributed stage: the (group, x, y) count combiner; the grid math
    runs on the driver over a table bounded by the VALUE DOMAIN
    (|x-levels| x |y-buckets| per group), not by input rows — the
    documented small side. O(n^2) pair enumeration never happens."""

    def cnt(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            group_key: b[group_key],
            "xv": b[x].to_numpy(np.int64),
            "yv": np.floor(
                b[y].to_numpy(np.float64) / y_div).astype(np.int64),
        })
        return (d.groupby([group_key, "xv", "yv"], as_index=False)
                .size().rename(columns={"size": "n"}))

    partials = ds.map_batches(cnt, batch_format="pandas")
    counts = sum_final(partials, [group_key, "xv", "yv"]).to_pandas()
    rows = []
    for g, sub in counts.groupby(group_key, sort=True):
        qv = np.sort(sub["xv"].unique())
        pv = np.sort(sub["yv"].unique())
        M = np.zeros((len(qv), len(pv)), np.int64)
        M[np.searchsorted(qv, sub["xv"].to_numpy()),
          np.searchsorted(pv, sub["yv"].to_numpy())] = (
            sub["n"].to_numpy(np.int64))
        S = M.cumsum(0).cumsum(1)  # inclusive 2D prefix sums
        lt_lt = np.zeros_like(M)
        lt_lt[1:, 1:] = S[:-1, :-1]  # N(x'<x, y'<y)
        row_lt = np.zeros_like(M)
        row_lt[1:, :] = S[:-1, -1:]  # N(x'<x, any y)
        le_y = np.zeros_like(M)
        le_y[1:, :] = S[:-1, :]  # N(x'<x, y'<=y)
        lt_gt = row_lt - le_y  # N(x'<x, y'>y)
        c = int((M * lt_lt).sum())
        d = int((M * lt_gt).sum())
        n = int(M.sum())
        tq = M.sum(axis=1)
        tp = M.sum(axis=0)
        n0 = n * (n - 1) // 2
        n1 = int((tq * (tq - 1) // 2).sum())
        n2 = int((tp * (tp - 1) // 2).sum())
        denom = np.sqrt(float(n0 - n1) * float(n0 - n2))
        tau = float(c - d) / denom if denom > 0 else 0.0
        rows.append({group_key: g, "n": n, "concordant": c,
                     "discordant": d, "kendall_tau": tau})
    return pd.DataFrame(rows)


def ols2_by_group(
    ds: ray.data.Dataset,
    group_key: str,
    x1: str,
    x2: str,
    y: str,
    x2_scale: float = 100.0,
    y_scale: float = 100.0,
) -> pd.DataFrame:
    """Per-group ordinary least squares with TWO regressors solved in
    closed form: moment sums -> 3x3 normal equations -> Cramer's rule.
    x1 is integer-valued; x2 and y are fixed-point decimals lifted to
    exact integers by ``round(v * scale)`` so every moment sum is an
    exact integer. The determinant expansion is ONE shared f64
    expression tree over those exact operands, so the DuckDB twin
    lands on bit-identical coefficients (f64 ops are deterministic
    given equal inputs — exactness of intermediates is not required).

    Distributed stage: the per-block moment combiner (9 sums per
    group); the 3x3 solve runs on the driver over one row per group."""

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        v1 = b[x1].to_numpy(np.int64)
        v2 = np.round(
            b[x2].to_numpy(np.float64) * x2_scale).astype(np.int64)
        vy = np.round(
            b[y].to_numpy(np.float64) * y_scale).astype(np.int64)
        d = pd.DataFrame({
            group_key: b[group_key], "cnt": 1,
            "s1": v1, "s2": v2, "sy": vy,
            "s11": v1 * v1, "s22": v2 * v2, "s12": v1 * v2,
            "s1y": v1 * vy, "s2y": v2 * vy,
        })
        return d.groupby(group_key, as_index=False).sum()

    partials = ds.map_batches(moments, batch_format="pandas")
    m = sum_final(partials, [group_key]).to_pandas()
    out = []
    for _, r in m.iterrows():
        n = float(r["cnt"])
        s1, s2, sy = float(r["s1"]), float(r["s2"]), float(r["sy"])
        s11, s22, s12 = float(r["s11"]), float(r["s22"]), float(r["s12"])
        s1y, s2y = float(r["s1y"]), float(r["s2y"])
        # shared expression tree — mirrored verbatim in the twin
        det = (n * (s11 * s22 - s12 * s12)
               - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2))
        det0 = (sy * (s11 * s22 - s12 * s12)
                - s1y * (s1 * s22 - s2 * s12)
                + s2y * (s1 * s12 - s2 * s11))
        det1 = (n * (s1y * s22 - s12 * s2y)
                - sy * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s2y - s1y * s2))
        det2 = (n * (s11 * s2y - s1y * s12)
                - s1 * (s1 * s2y - s1y * s2)
                + sy * (s1 * s12 - s11 * s2))
        out.append({
            group_key: r[group_key], "n": int(r["cnt"]),
            "b0": det0 / det / y_scale,
            "b1": det1 / det / y_scale,
            "b2": det2 / det / y_scale * x2_scale,
        })
    return pd.DataFrame(out)


def rfm_scores(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    n_tiles: int = 5,
) -> pd.DataFrame:
    """RFM customer scoring (Hughes 1994 recency/frequency/monetary
    quantile segmentation, public formula): per user last event time,
    event count, and value sum, each scored 1..``n_tiles`` by global
    ascending rank: score = 1 + floor(n_tiles * (rank-1) / n_users).

    Pass 1 is a map_batches combiner (per-batch max/count/sum
    partials, one co-shuffle final) so only distinct-user rows move.
    The rank step sorts the per-user AGGREGATE — the small side
    (users << events); at web scale it is one distributed sort +
    zip-with-index per metric, here np.lexsort on the driver. Every
    rank is over the total order (metric, user), so ties are
    deterministic on both sides, and monetary is rounded to 4dp
    BEFORE ranking so a partial-sum-order ulp cannot flip a rank.
    ``ts_col`` must already be an exact integer (epoch us)."""

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(user_col, as_index=False, sort=False).agg(
            last_us=(ts_col, "max"), n_events=(ts_col, "size"),
            mon=(value_col, "sum"))

    parts = ds.map_batches(combine, batch_format="pandas")

    def final(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(user_col, as_index=False, sort=False).agg(
            last_us=("last_us", "max"), n_events=("n_events", "sum"),
            mon=("mon", "sum"))

    agg = (parts.repartition(1)
           .map_batches(final, batch_format="pandas",
                        batch_size=None).to_pandas())
    n = len(agg)
    users = agg[user_col].to_numpy()

    def score(key: np.ndarray) -> np.ndarray:
        order = np.lexsort((users, key))
        rank = np.empty(n, np.int64)
        rank[order] = np.arange(1, n + 1)
        return 1 + (n_tiles * (rank - 1)) // n

    r = score(agg["last_us"].to_numpy(np.int64))
    f = score(agg["n_events"].to_numpy(np.int64))
    m = score(np.round(agg["mon"].to_numpy(np.float64), 4))
    out = pd.DataFrame({
        user_col: users, "n_events": agg["n_events"].astype(np.int64),
        "r_score": r, "f_score": f, "m_score": m,
        "rfm_code": 100 * r + 10 * f + m})
    return out.sort_values(user_col, ignore_index=True)


def anova_oneway(
    ds: ray.data.Dataset,
    col: str,
    group_col: str,
) -> pd.DataFrame:
    """One-way ANOVA F statistic across the K groups of ``group_col``
    — the K-cohort generalization of ``welch_ttest``'s two-cohort
    comparison (equal-variance, between/within sum-of-squares
    decomposition), plus eta^2 = SSB / SST effect size. One streaming
    moment combiner (n, sum, sumsq per group) is the only pass over
    the rows; everything else is O(K) driver arithmetic, so the SQL
    twin is the identical closed-form expression tree over the same
    per-group sums."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(np.float64)
        g = pd.DataFrame({"g": b[group_col].to_numpy(),
                          "n": np.ones(len(b), np.int64),
                          "s": v, "ss": v * v})
        return g.groupby("g", as_index=False, sort=False).sum()

    m = sum_final(
        ds.map_batches(local, batch_format="pandas"), ["g"]
    ).to_pandas()
    k = len(m)
    n_tot = float(m["n"].sum())
    grand = float(m["s"].sum()) / n_tot
    mu = m["s"].to_numpy(np.float64) / m["n"].to_numpy(np.float64)
    ssb = float((m["n"].to_numpy(np.float64)
                 * (mu - grand) ** 2).sum())
    ssw = float((m["ss"].to_numpy(np.float64)
                 - m["n"].to_numpy(np.float64) * mu * mu).sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        f = ((ssb / (k - 1.0)) / (ssw / (n_tot - k))
             if k > 1 and n_tot > k and ssw > 0 else np.nan)
        eta = ssb / (ssb + ssw) if ssb + ssw > 0 else np.nan
    return pd.DataFrame({
        "k_groups": [np.int64(k)], "n": [np.int64(n_tot)],
        "f_stat": [f], "eta_sq": [eta]})


def kruskal_wallis(
    ds: ray.data.Dataset,
    col: str,
    group_col: str,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Kruskal-Wallis H test across the K groups of ``group_col`` —
    the rank-based (distribution-free) companion of ``anova_oneway``,
    exactly as ``mann_whitney_u`` is of ``welch_ttest``. Midrank ties
    with the standard tie correction C = 1 - sum(t^3 - t)/(N^3 - N).

    Same no-global-row-sort layout as ``mann_whitney_u``: a combiner
    reduces rows to per-(value, group) counts, distinct values bucket
    by VALUE RANGE, the driver exclusive-scans bucket totals, and each
    bucket folds per-group rank sums from exact half-integer midranks
    — so the SQL twin's per-row rank sums land on identical floats.
    Output: one row per group (n, rank_sum, mean_rank) with the
    scalar H statistics replicated across rows."""
    from engine.state import cached_get

    def local(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "v": b[col].to_numpy(np.float64),
            "g": b[group_col].to_numpy(),
            "n": np.ones(len(b), np.int64)})
        return g.groupby(["v", "g"], as_index=False, sort=False).sum()

    per_vg = sum_final(
        ds.map_batches(local, batch_format="pandas"), ["v", "g"]
    ).materialize()

    span = per_vg.map_batches(
        lambda b: pd.DataFrame({
            "lo": [b["v"].min()], "hi": [b["v"].max()],
            "n": [b["n"].sum()]}),
        batch_format="pandas").to_pandas()
    if span.empty:
        return pd.DataFrame({
            "grp": pd.Series(dtype=object),
            "n": pd.Series(dtype=np.int64),
            "rank_sum": pd.Series(dtype=np.float64),
            "mean_rank": pd.Series(dtype=np.float64),
            "h_stat": pd.Series(dtype=np.float64),
            "h_corrected": pd.Series(dtype=np.float64)})
    lo, hi = float(span["lo"].min()), float(span["hi"].max())
    n_tot = int(span["n"].sum())
    width = max((hi - lo) / num_buckets, 1e-300)

    def bucket_ix(v: np.ndarray) -> np.ndarray:
        return np.minimum(((v - lo) / width).astype(np.int64),
                          num_buckets - 1)

    bsums = per_vg.map_batches(
        lambda b: pd.DataFrame(
            {"bk": bucket_ix(b["v"].to_numpy()),
             "n": b["n"].to_numpy()}
        ).groupby("bk", as_index=False, sort=False).sum(),
        batch_format="pandas").to_pandas()
    bt = np.zeros(num_buckets, np.int64)
    agg = bsums.groupby("bk")["n"].sum()
    bt[agg.index.to_numpy()] = agg.to_numpy()
    offsets = np.zeros(num_buckets, np.int64)
    np.cumsum(bt[:-1], out=offsets[1:])
    off_ref = ray.put(offsets)

    def add_bk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__shard"] = bucket_ix(b["v"].to_numpy()).astype(np.int32)
        return b

    def contrib(g: pd.DataFrame) -> pd.DataFrame:
        offs = cached_get(off_ref)
        bk = int(g["__shard"].iloc[0])
        g = g.sort_values("v", kind="stable")
        v = g["v"].to_numpy(np.float64)
        n = g["n"].to_numpy(np.int64)
        vals, idx = np.unique(v, return_inverse=True)
        nv = np.bincount(idx, weights=n).astype(np.int64)
        c_less = offs[bk] + np.concatenate(
            [[0], np.cumsum(nv[:-1])])
        mr = c_less + (nv + 1) / 2.0  # exact half-integers
        out = pd.DataFrame({
            "grp": g["g"].to_numpy(),
            "n": n,
            "rank_sum": mr[idx] * n,
        }).groupby("grp", as_index=False, sort=False).sum()
        out["ties"] = 0.0
        out.iloc[0, out.columns.get_loc("ties")] = float(
            (nv.astype(np.float64) ** 3 - nv).sum())
        return out

    tot = sum_final(
        per_vg.map_batches(add_bk, batch_format="pandas")
        .groupby("__shard")
        .map_groups(contrib, batch_format="pandas"),
        ["grp"]).to_pandas().sort_values("grp", ignore_index=True)
    ng = tot["n"].to_numpy(np.float64)
    rg = tot["rank_sum"].to_numpy(np.float64)
    ties = float(tot["ties"].sum())
    nn = float(n_tot)
    h = 12.0 / (nn * (nn + 1.0)) * float(
        (rg * rg / ng).sum()) - 3.0 * (nn + 1.0)
    c = 1.0 - ties / (nn ** 3 - nn) if nn > 1 else 1.0
    hc = h / c if c > 0 else np.nan
    return pd.DataFrame({
        "grp": tot["grp"],
        "n": tot["n"].astype(np.int64),
        "rank_sum": rg,
        "mean_rank": rg / ng,
        "h_stat": np.full(len(tot), h),
        "h_corrected": np.full(len(tot), hc)})


def durbin_watson(
    ds: ray.data.Dataset,
    group_key: str,
    order_cols: list[str],
    col: str,
    min_n: int = 2,
    num_shards: int = 256,
) -> ray.data.Dataset:
    """Per-group Durbin-Watson statistic of the ordered, mean-centered
    series: DW = sum((e_t - e_{t-1})^2) / sum(e_t^2) with e = x -
    mean(x) per group — ~2 for no lag-1 autocorrelation, ->0 positive,
    ->4 negative. The serial-correlation screen over per-entity event
    series (is this user's metric trending/oscillating or i.i.d.?).

    Same segmented one-sort-per-shard layout as ``burstiness``: hash
    groups to shards, sort each shard once, vectorized per-group mean
    (groupby transform), squared diffs masked to same-group adjacent
    rows. Groups with < min_n rows or zero variance are dropped (the
    SQL twin mirrors both with HAVING)."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key] + order_cols, kind="stable"
        ).drop(columns="__shard")
        gk = g[group_key].to_numpy()
        v = g[col].to_numpy(np.float64)
        e = v - g.groupby(group_key, sort=False)[col].transform(
            "mean").to_numpy(np.float64)
        same = gk[1:] == gk[:-1]
        d2 = np.where(same, (e[1:] - e[:-1]) ** 2, 0.0)
        agg = pd.DataFrame({
            group_key: gk,
            "n": np.ones(len(g), np.int64),
            "den": e * e,
            "num": np.concatenate([[0.0], d2]),
        }).groupby(group_key, as_index=False, sort=False).sum()
        agg = agg[(agg["n"] >= min_n) & (agg["den"] > 0)]
        out = agg[[group_key]].copy()
        out["n"] = agg["n"].astype(np.int64)
        out["dw"] = agg["num"].to_numpy(np.float64) / agg[
            "den"].to_numpy(np.float64)
        return out

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas"))


def ab_conversion_ztest(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
) -> pd.DataFrame:
    """Two-proportion z-test of conversion between the two arms of a
    deterministic hash split (arm = splitmix64(user) & 1 — exactly
    how real experiment assignment works, and reproducible on any
    cluster shape). A user converts when they have >= 1
    ``convert_type`` event. Per-batch (user, n_conv) partials fold
    through one co-shuffle; the per-arm census is 4 integers, and z
    uses the pooled-variance form through one shared expression tree
    mirrored in the SQL twin."""
    from engine.ops.sketch import _hash64

    def per_user(b: pa.Table) -> pd.DataFrame:
        u = np.asarray(b[user_col], np.int64)
        conv = (np.asarray(b[type_col]).astype(object)
                == convert_type).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        s = np.zeros(len(uu), np.int64)
        np.add.at(s, inv, conv)
        return pd.DataFrame({"user_id": uu, "n_conv": s})

    users = sum_final(
        events.map_batches(per_user, batch_format="pyarrow"),
        ["user_id"])

    def census(b: pd.DataFrame) -> pd.DataFrame:
        arm = (_hash64(b["user_id"].to_numpy(np.int64))
               & np.uint64(1)).astype(np.int64)
        conv = (b["n_conv"].to_numpy(np.int64) > 0).astype(np.int64)
        out = []
        for a in (0, 1):
            m = arm == a
            out.append((a, int(m.sum()), int(conv[m].sum())))
        return pd.DataFrame(out, columns=["arm", "n", "conv"])

    cs = sum_final(
        users.map_batches(census, batch_format="pandas"),
        ["arm"]).to_pandas().set_index("arm")
    n0 = int(cs.loc[0, "n"]) if 0 in cs.index else 0
    n1 = int(cs.loc[1, "n"]) if 1 in cs.index else 0
    c0 = int(cs.loc[0, "conv"]) if 0 in cs.index else 0
    c1 = int(cs.loc[1, "conv"]) if 1 in cs.index else 0
    # shared expression tree — mirrored verbatim in the twin
    if n0 > 0 and n1 > 0:
        p0 = c0 / n0
        p1 = c1 / n1
        p = (c0 + c1) / (n0 + n1)
        se2 = p * (1.0 - p) * (1.0 / n0 + 1.0 / n1)
        z = (p1 - p0) / np.sqrt(se2) if se2 > 0 else 0.0
    else:
        p0 = p1 = z = 0.0
    return pd.DataFrame({
        "n_a": [n0], "n_b": [n1], "conv_a": [c0], "conv_b": [c1],
        "p_a": [p0], "p_b": [p1], "z": [float(z)]})


def weekly_profile(
    events: ray.data.Dataset,
    *,
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Hour-of-week seasonality profile with per-bucket z-scores over
    the dense 168-bucket domain (dow*24 + hour, dow 0 = Sunday to
    match DuckDB's dayofweek()) — the anomalous-traffic-hour screen.
    One bincount combiner; mean/std over the fixed 168 buckets use
    exact integer sums, so the SQL twin matches through the final
    divisions. Timestamps reduce via datetime64[us] integer floor
    division (exact; the ns path is not — see burstiness)."""

    def part(b: pa.Table) -> pd.DataFrame:
        ts = np.asarray(b[ts_col].to_pandas()
                        .astype("datetime64[us]").astype(np.int64))
        days = ts // 86_400_000_000
        hour = (ts % 86_400_000_000) // 3_600_000_000
        dow = (days + 4) % 7  # 1970-01-01 was a Thursday; Sunday = 0
        hw = dow * 24 + hour
        cnt = np.bincount(hw, minlength=168)
        return pd.DataFrame({"hw": np.arange(168, dtype=np.int64),
                             "n": cnt.astype(np.int64)})

    counts = sum_final(
        events.map_batches(part, batch_format="pyarrow"),
        ["hw"]).to_pandas().sort_values("hw", ignore_index=True)
    full = np.zeros(168, np.int64)
    full[counts["hw"].to_numpy(np.int64)] = \
        counts["n"].to_numpy(np.int64)
    nt = int(full.sum())
    ssq = int((full * full).sum())
    # shared expression tree — mirrored verbatim in the twin
    mu = nt / 168.0
    var = ssq / 168.0 - mu * mu
    sd = np.sqrt(var) if var > 0 else 0.0
    z = (full - mu) / sd if sd > 0 else np.zeros(168)
    return pd.DataFrame({"hw": np.arange(168, dtype=np.int64),
                         "n": full, "z": z})


def fisher_exact_conversion(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
) -> pd.DataFrame:
    """One-sided Fisher exact test (P[X >= observed], hypergeometric
    tail) on the same 2x2 conversion table as ``ab_conversion_ztest``
    (deterministic splitmix arm assignment) — the small-sample exact
    companion to the z-test. The distributed part is the identical
    per-user census (one co-shuffle, 4 integers out); the tail sum
    runs on the driver from a cumulative log-factorial table, the
    SAME construction (SUM LN over 1..n, never lgamma) the SQL twin
    uses, and is rounded 6dp on both sides."""
    from engine.ops.sketch import _hash64

    def per_user(b: pa.Table) -> pd.DataFrame:
        u = np.asarray(b[user_col], np.int64)
        conv = (np.asarray(b[type_col]).astype(object)
                == convert_type).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        s = np.zeros(len(uu), np.int64)
        np.add.at(s, inv, conv)
        return pd.DataFrame({"user_id": uu, "n_conv": s})

    users = sum_final(
        events.map_batches(per_user, batch_format="pyarrow"),
        ["user_id"])

    def census(b: pd.DataFrame) -> pd.DataFrame:
        arm = (_hash64(b["user_id"].to_numpy(np.int64))
               & np.uint64(1)).astype(np.int64)
        conv = (b["n_conv"].to_numpy(np.int64) > 0).astype(np.int64)
        out = []
        for a in (0, 1):
            m = arm == a
            out.append((a, int(m.sum()), int(conv[m].sum())))
        return pd.DataFrame(out, columns=["arm", "n", "conv"])

    cs = sum_final(
        users.map_batches(census, batch_format="pandas"),
        ["arm"]).to_pandas().set_index("arm")
    r1 = int(cs.loc[0, "n"]) if 0 in cs.index else 0
    r2 = int(cs.loc[1, "n"]) if 1 in cs.index else 0
    k = int(cs.loc[0, "conv"]) if 0 in cs.index else 0
    c1 = int(cs.loc[1, "conv"]) if 1 in cs.index else 0
    ct = k + c1
    n = r1 + r2
    if n == 0 or ct == 0 or r1 == 0 or r2 == 0:
        p = 1.0
    else:
        lf = np.concatenate(
            [[0.0], np.cumsum(np.log(np.arange(1, n + 1,
                                               dtype=np.float64)))])
        hi = min(r1, ct)
        i = np.arange(k, hi + 1, dtype=np.int64)
        logp = (lf[r1] - lf[i] - lf[r1 - i]
                + lf[r2] - lf[ct - i] - lf[r2 - ct + i]
                - (lf[n] - lf[ct] - lf[n - ct]))
        p = float(np.exp(logp).sum())
    return pd.DataFrame({
        "n_a": [r1], "n_b": [r2], "conv_a": [k], "conv_b": [c1],
        "p_fisher": [round(p, 6)]})


def bootstrap_mean_ci(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    value_col: str = "value",
    n_boot: int = 200,
    alpha: float = 0.05,
) -> pd.DataFrame:
    """Percentile-bootstrap CI for the mean of per-user mean values,
    with DETERMINISTIC hash resampling (Efron 1979 bootstrap, public
    method; resample index i of replicate b is
    ``splitmix64(b * n + i) % n`` over the user-id-sorted mean vector
    — reproducible on any cluster shape, and exactly re-derivable in
    SQL). The distributed work is the per-user (sum, count) combiner;
    the B x n resample fold runs vectorized on the driver over the
    n-row mean vector (user cardinality — the same driver-side-small
    contract as the other per-user finals). Bounds use the explicit
    k-th-smallest rank rule k = ceil(q * B); mean/lo/hi rounded 6dp."""
    from engine.ops.sketch import _hash64

    def per_user(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(user_col, as_index=False).agg(
            __s=(value_col, "sum"), __c=(value_col, "count"))
        g["__c"] = g["__c"].astype(np.int64)
        return g

    agg = sum_final(
        events.map_batches(per_user, batch_format="pandas"),
        [user_col]).to_pandas().sort_values(
        user_col, ignore_index=True)
    v = (agg["__s"].to_numpy(np.float64)
         / agg["__c"].to_numpy(np.float64))
    n = len(v)
    if n == 0:
        return pd.DataFrame({"n_users": [0], "mean": [0.0],
                             "ci_lo": [0.0], "ci_hi": [0.0]})
    ks = np.arange(n_boot * n, dtype=np.int64)
    idx = (_hash64(ks) % np.uint64(n)).astype(np.int64)
    means = v[idx].reshape(n_boot, n).mean(axis=1)
    s = np.sort(means)
    k_lo = int(np.ceil(alpha / 2.0 * n_boot))
    k_hi = int(np.ceil((1.0 - alpha / 2.0) * n_boot))
    return pd.DataFrame({
        "n_users": [n],
        "mean": [round(float(v.mean()), 6)],
        "ci_lo": [round(float(s[k_lo - 1]), 6)],
        "ci_hi": [round(float(s[k_hi - 1]), 6)]})


def acf_lags(
    ds: ray.data.Dataset,
    group_key: str,
    order_cols: list[str],
    col: str,
    max_lag: int = 3,
    min_n: int = 8,
    num_shards: int = 256,
) -> ray.data.Dataset:
    """Per-group sample autocorrelation function at lags 1..max_lag
    over the ordered, mean-centered series: r_k = sum_t e_t e_{t-k}
    / sum_t e_t^2 with e = x - mean(x) per group — the spectral
    fingerprint that generalizes ``durbin_watson``'s single lag-1
    screen (DW ~ 2 - 2*r_1) to a small correlogram per entity.
    Output one row per (group, lag).

    Same segmented one-sort-per-shard layout as ``durbin_watson``:
    hash groups to shards, sort each shard once, vectorized per-group
    mean, lag products masked to same-group rows k apart. Groups with
    < min_n rows or zero variance are dropped (HAVING in the twin)."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key] + order_cols, kind="stable"
        ).drop(columns="__shard")
        gk = g[group_key].to_numpy()
        v = g[col].to_numpy(np.float64)
        e = v - g.groupby(group_key, sort=False)[col].transform(
            "mean").to_numpy(np.float64)
        base = pd.DataFrame({
            group_key: gk,
            "n": np.ones(len(g), np.int64),
            "den": e * e,
        }).groupby(group_key, as_index=False, sort=False).sum()
        outs = []
        for k in range(1, max_lag + 1):
            if len(g) <= k:
                continue
            same = gk[k:] == gk[:-k]
            prod = np.where(same, e[k:] * e[:-k], 0.0)
            num = pd.DataFrame({
                group_key: gk[k:], "num": prod,
            }).groupby(group_key, as_index=False, sort=False).sum()
            m = base.merge(num, on=group_key, how="left")
            m["num"] = m["num"].fillna(0.0)
            m = m[(m["n"] >= min_n) & (m["den"] > 0)]
            o = m[[group_key]].copy()
            o["lag"] = np.int64(k)
            o["n"] = m["n"].astype(np.int64)
            o["acf"] = (m["num"].to_numpy(np.float64)
                        / m["den"].to_numpy(np.float64))
            outs.append(o)
        if not outs:
            return pd.DataFrame({
                group_key: pd.Series(dtype=np.int64),
                "lag": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64),
                "acf": pd.Series(dtype=np.float64)})
        return pd.concat(outs, ignore_index=True)

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas"))


def permutation_entropy(
    ds: ray.data.Dataset,
    group_key: str,
    order_cols: list[str],
    col: str,
    min_n: int = 8,
    num_shards: int = 256,
) -> ray.data.Dataset:
    """Per-group ordinal-pattern (Bandt-Pompe 2002, order m=3)
    permutation entropy of the ordered value series, normalized to
    [0, 1] by ln(6): the model-free complexity screen — ~1 for an
    i.i.d./chaotic series, ~0 for a monotone or strictly periodic
    one. Each length-3 window (a, b, c) maps to one of 6 ordinal
    patterns; ties break toward the EARLIER position (the standard
    (value, position) lexicographic rule), encoded as the 3-bit code
    4*(a<=b) + 2*(a<=c) + (b<=c) — code 5 (a<=b, a>c, b<=c) and
    code 2 (a>b, a<=c, b>c) violate transitivity and are unreachable,
    leaving exactly the 6 valid permutations. The twin reproduces the code via two LAGs and
    the same three comparisons, so both sides count identical
    patterns.

    Same segmented one-sort-per-shard layout as ``durbin_watson``;
    windows never cross group boundaries. Groups with < min_n windows
    are dropped."""

    def f(shard: pd.DataFrame) -> pd.DataFrame:
        g = shard.sort_values(
            [group_key] + order_cols, kind="stable"
        ).drop(columns="__shard")
        gk = g[group_key].to_numpy()
        v = g[col].to_numpy(np.float64)
        if len(g) < 3:
            return pd.DataFrame({
                group_key: pd.Series(dtype=np.int64),
                "n_windows": pd.Series(dtype=np.int64),
                "perm_entropy": pd.Series(dtype=np.float64)})
        a, b, c = v[:-2], v[1:-1], v[2:]
        same = (gk[:-2] == gk[1:-1]) & (gk[1:-1] == gk[2:])
        code = (4 * (a <= b).astype(np.int64)
                + 2 * (a <= c).astype(np.int64)
                + (b <= c).astype(np.int64))
        d = pd.DataFrame({group_key: gk[:-2], "code": code})[same]
        if d.empty:
            return pd.DataFrame({
                group_key: pd.Series(dtype=np.int64),
                "n_windows": pd.Series(dtype=np.int64),
                "perm_entropy": pd.Series(dtype=np.float64)})
        cnt = d.groupby([group_key, "code"]).size().rename(
            "k").reset_index()
        tot = cnt.groupby(group_key)["k"].transform("sum")
        p = cnt["k"].to_numpy(np.float64) / tot.to_numpy(np.float64)
        cnt["h"] = -p * np.log(p)
        agg = cnt.groupby(group_key, as_index=False).agg(
            n_windows=("k", "sum"), h=("h", "sum"))
        agg = agg[agg["n_windows"] >= min_n]
        out = agg[[group_key]].copy()
        out["n_windows"] = agg["n_windows"].astype(np.int64)
        out["perm_entropy"] = (agg["h"].to_numpy(np.float64)
                               / np.log(6.0))
        return out

    return (
        _sharded_by_key(ds, group_key, num_shards)
        .groupby("__shard")
        .map_groups(f, batch_format="pandas"))


def js_divergence_arms(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> pd.DataFrame:
    """Jensen-Shannon divergence (nats; Lin 1991) between the
    event-type distributions of the two arms of a deterministic hash
    split (arm = splitmix64(user) & 1 — the same reproducible
    assignment as ``ab_conversion_ztest``): JSD = H((p+q)/2) -
    (H(p) + H(q))/2, bounded in [0, ln 2]. The A/B sanity check that
    the split did NOT skew the composition of traffic — near 0 when
    randomization is healthy, and the symmetric, finite alternative
    to KL when either arm has types the other lacks.

    The distributed stage is one (arm, event_type) count combiner
    (2 x |types| cells move, never rows); the entropy fold runs on
    the driver over that tiny grid."""
    from engine.ops.sketch import _hash64

    def local(b: pd.DataFrame) -> pd.DataFrame:
        u = b[user_col].to_numpy(np.int64)
        arm = (_hash64(u) & np.uint64(1)).astype(np.int64)
        g = pd.DataFrame({
            "arm": arm, type_col: b[type_col].to_numpy(),
            "n": np.ones(len(b), np.int64)})
        return g.groupby(["arm", type_col],
                         as_index=False, sort=False).sum()

    cnt = sum_final(
        events.map_batches(local, batch_format="pandas"),
        ["arm", type_col]).to_pandas()
    if cnt.empty:
        return pd.DataFrame({"n_a": [0], "n_b": [0],
                             "jsd_nats": [0.0]})
    piv = cnt.pivot_table(index=type_col, columns="arm", values="n",
                          fill_value=0, aggfunc="sum")
    for arm in (0, 1):
        if arm not in piv.columns:
            piv[arm] = 0
    na, nb = float(piv[0].sum()), float(piv[1].sum())
    # degenerate arm (all traffic hashed to one side): the other arm's
    # distribution is the zero VECTOR, not a scalar — h() indexes it
    zeros = np.zeros(len(piv), np.float64)
    p = piv[0].to_numpy(np.float64) / na if na > 0 else zeros
    q = piv[1].to_numpy(np.float64) / nb if nb > 0 else zeros
    m = 0.5 * (p + q)

    def h(x: np.ndarray) -> float:
        nz = x[x > 0]
        return float(-(nz * np.log(nz)).sum())

    jsd = h(m) - 0.5 * (h(p) + h(q))
    return pd.DataFrame({
        "n_a": np.asarray([na], np.int64),
        "n_b": np.asarray([nb], np.int64),
        "jsd_nats": np.asarray([jsd], np.float64)})


def hourly_ccf(
    events: ray.data.Dataset,
    type_a: str,
    type_b: str,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_lag: int = 3,
) -> pd.DataFrame:
    """Cross-correlation function between the HOURLY count series of
    two event types at lags 0..max_lag hours: with a_t, b_t the
    per-hour counts over the corpus's full [min, max] hour span
    (silent hours count 0) and deviations from the span means,
    r_k = sum_t (a_t - abar)(b_{t+k} - bbar) / sqrt(sum (a-abar)^2 *
    sum (b-bbar)^2) — "does type_b follow type_a k hours later", the
    lead-lag screen behind funnel timing. One row per lag.

    The distributed stage is one (hour, type) count combiner (span x
    2 cells move, never rows); the O(span)-length alignment and the
    lag products fold on the driver — the same driver-side-small
    contract as the other per-hour finals (720 hours at sf0.1)."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        et = b[type_col].to_numpy()
        keep = (et == type_a) | (et == type_b)
        if not keep.any():
            return pd.DataFrame({"hour": pd.Series(dtype=np.int64),
                                 "is_a": pd.Series(dtype=np.int64),
                                 "n": pd.Series(dtype=np.int64)})
        ts = b[ts_col].to_numpy()[keep]
        hour = (ts.astype("datetime64[s]").astype(np.int64)
                // 3600).astype(np.int64)
        g = pd.DataFrame({
            "hour": hour,
            "is_a": (et[keep] == type_a).astype(np.int64),
            "n": np.ones(int(keep.sum()), np.int64)})
        return g.groupby(["hour", "is_a"],
                         as_index=False, sort=False).sum()

    cnt = sum_final(
        events.map_batches(local, batch_format="pandas"),
        ["hour", "is_a"]).to_pandas()
    if cnt.empty or "hour" not in cnt.columns:
        # the SQL twin's lag spine survives an empty corpus (cross join
        # with the generated 0..max_lag series): match it — full spine,
        # ccf 0.0 — so row counts agree unconditionally
        return pd.DataFrame({
            "lag": np.arange(max_lag + 1, dtype=np.int64),
            "ccf": np.zeros(max_lag + 1, np.float64)})
    h0, h1 = int(cnt["hour"].min()), int(cnt["hour"].max())
    span = h1 - h0 + 1
    a = np.zeros(span, np.float64)
    b = np.zeros(span, np.float64)
    ca = cnt[cnt["is_a"] == 1]
    cb = cnt[cnt["is_a"] == 0]
    a[ca["hour"].to_numpy(np.int64) - h0] = ca["n"].to_numpy()
    b[cb["hour"].to_numpy(np.int64) - h0] = cb["n"].to_numpy()
    ad = a - a.sum() / span
    bd = b - b.sum() / span
    den = np.sqrt((ad * ad).sum() * (bd * bd).sum())
    lags = np.arange(max_lag + 1, dtype=np.int64)
    ccf = np.zeros(max_lag + 1, np.float64)
    if den > 0:
        for k in range(max_lag + 1):
            ccf[k] = (ad[: span - k] * bd[k:]).sum() / den
    return pd.DataFrame({"lag": lags, "ccf": ccf})


def hhi_by_group(
    left: ray.data.Dataset,
    dim: ray.data.Dataset,
    *,
    key: str = "o_custkey",
    dim_key: str = "c_custkey",
    group_col: str = "c_nationkey",
    value_col: str = "o_totalprice",
) -> pd.DataFrame:
    """Herfindahl-Hirschman concentration index of per-entity value
    share within each group: HHI = sum_e share_e^2 with share_e =
    s_e / sum(s) over the group — 1/n_entities for perfectly even
    spending, -> 1 for a single dominant customer. The market-
    concentration screen over (orders x customer.nation).

    Values lift to exact integer cents before any sum, so the
    per-entity totals are exact in float64 (and HUGEINT in the SQL
    twin). Two combiner exchanges move (entity, group, sum) then
    (group, sum_s, sum_s2) partials — never rows; the dimension side
    broadcasts once via cached_get."""
    from engine.state import cached_get

    dim_pdf = dim.to_pandas()
    dk = dim_pdf[dim_key].to_numpy(np.int64)
    dv = dim_pdf[group_col].to_numpy(np.int64)
    order = np.argsort(dk, kind="stable")
    ref = ray.put((dk[order], dv[order]))

    def local(b: pd.DataFrame) -> pd.DataFrame:
        keys, vals = cached_get(ref)
        k = b[key].to_numpy(np.int64)
        # inner-join semantics (the twin joins): keys absent from the
        # dimension are DROPPED, not silently mapped to a neighbor
        idx = np.searchsorted(keys, k)
        ok = (idx < len(keys)) & (keys[np.minimum(idx, len(keys) - 1)] == k)
        k, idx = k[ok], idx[ok]
        g = pd.DataFrame({
            key: k,
            group_col: vals[idx],
            "s": np.rint(b[value_col].to_numpy(np.float64)[ok]
                         * 100.0).astype(np.int64)})
        return g.groupby([key, group_col],
                         as_index=False, sort=False).sum()

    per_ent = sum_final(
        left.map_batches(local, batch_format="pandas"),
        [key, group_col])

    def sq(b: pd.DataFrame) -> pd.DataFrame:
        s = b["s"].to_numpy(np.float64)
        g = pd.DataFrame({
            group_col: b[group_col].to_numpy(np.int64),
            "tot": s, "s2": s * s,
            "n_customers": np.ones(len(b), np.int64)})
        return g.groupby(group_col, as_index=False, sort=False).sum()

    agg = sum_final(
        per_ent.map_batches(sq, batch_format="pandas"),
        [group_col]).to_pandas()
    if agg.empty:
        return pd.DataFrame({group_col: pd.Series(dtype=np.int64),
                             "n_customers": pd.Series(dtype=np.int64),
                             "hhi": pd.Series(dtype=np.float64)})
    agg["hhi"] = (agg["s2"].to_numpy(np.float64)
                  / (agg["tot"].to_numpy(np.float64)
                     * agg["tot"].to_numpy(np.float64)))
    out = agg[[group_col]].copy()
    out["n_customers"] = agg["n_customers"].astype(np.int64)
    out["hhi"] = agg["hhi"].astype(np.float64)
    return out.sort_values(group_col, ignore_index=True)


def grouped_pythagorean_means(
    ds: ray.data.Dataset,
    group_key: str,
    col: str,
) -> pd.DataFrame:
    """Per-group geometric and harmonic means of a POSITIVE column:
    gm = exp(sum(ln x) / n), hm = n / sum(1/x) — the AM >= GM >= HM
    trio completing the arithmetic means elsewhere; GM is the right
    average for ratio-like columns, HM for rate-like ones. One
    (n, sum ln x, sum 1/x) combiner per group moves; the closed forms
    fold on the driver over the group table."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        x = b[col].to_numpy(np.float64)
        g = pd.DataFrame({
            group_key: b[group_key].to_numpy(),
            "n": np.ones(len(b), np.int64),
            "sln": np.log(x),
            "sinv": 1.0 / x})
        return g.groupby(group_key, as_index=False, sort=False).sum()

    agg = sum_final(
        ds.map_batches(local, batch_format="pandas"),
        [group_key]).to_pandas()
    if agg.empty:
        return pd.DataFrame({group_key: pd.Series(dtype=object),
                             "n": pd.Series(dtype=np.int64),
                             "geo_mean": pd.Series(dtype=np.float64),
                             "harm_mean": pd.Series(dtype=np.float64)})
    n = agg["n"].to_numpy(np.float64)
    out = agg[[group_key]].copy()
    out["n"] = agg["n"].astype(np.int64)
    out["geo_mean"] = np.exp(agg["sln"].to_numpy(np.float64) / n)
    out["harm_mean"] = n / agg["sinv"].to_numpy(np.float64)
    return out.sort_values(group_key, ignore_index=True)


def cuped_adjusted_means(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    split_frac: float = 0.5,
) -> pd.DataFrame:
    """CUPED variance reduction (Deng et al. 2013, public): per user,
    Y = total value in the experiment period, X = total value in the
    pre-period (the earliest ``split_frac`` of the corpus time span);
    theta = cov(X, Y) / var(X) over all users; the adjusted metric is
    Y - theta (X - mean X). Arms = the deterministic splitmix hash
    split (same rule as ``ab_conversion_ztest`` / JSD). One row per
    arm: n users, raw mean, CUPED mean, and the variance-reduction
    ratio 1 - var(Ycuped)/var(Y).

    Exchanges: one (user, x, y) combiner groupby, then one pass of
    per-arm moment partials (n, Σx, Σy, Σxy, Σx², Σy²) — the driver
    folds O(arms) rows; theta and the means are closed forms."""
    from engine.ops.sketch import _hash64

    # corpus time span -> split point (driver scalars from min/max
    # metadata-light aggregates)
    lo = events.min(ts_col)
    hi = events.max(ts_col)
    import pandas as _pd

    lo_i = _pd.Timestamp(lo).value
    hi_i = _pd.Timestamp(hi).value
    split_i = lo_i + int((hi_i - lo_i) * split_frac)

    def per_user(b: pd.DataFrame) -> pd.DataFrame:
        ts = b[ts_col].astype("datetime64[ns]").astype(np.int64)
        pre = ts < split_i
        v = b[value_col].to_numpy(np.float64)
        g = pd.DataFrame({
            user_col: b[user_col].to_numpy(np.int64),
            "x": np.where(pre, v, 0.0),
            "y": np.where(pre, 0.0, v)})
        return g.groupby(user_col, as_index=False, sort=False).sum()

    xy = sum_final(
        events.map_batches(per_user, batch_format="pandas"), [user_col])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        u = b[user_col].to_numpy(np.int64)
        arm = (_hash64(u) & np.uint64(1)).astype(np.int64)
        x = b["x"].to_numpy(np.float64)
        y = b["y"].to_numpy(np.float64)
        g = pd.DataFrame({
            "arm": arm, "n": np.ones(len(b), np.int64),
            "sx": x, "sy": y, "sxy": x * y,
            "sxx": x * x, "syy": y * y})
        return g.groupby("arm", as_index=False, sort=False).sum()

    agg = sum_final(
        xy.map_batches(moments, batch_format="pandas"), ["arm"]
    ).to_pandas().sort_values("arm", ignore_index=True)
    if agg.empty:
        return pd.DataFrame({
            "arm": pd.Series(dtype=np.int64),
            "n": pd.Series(dtype=np.int64),
            "mean_raw": pd.Series(dtype=np.float64),
            "mean_cuped": pd.Series(dtype=np.float64),
            "var_reduction": pd.Series(dtype=np.float64)})
    # pooled theta over BOTH arms (the standard pre-experiment
    # covariate is assignment-independent)
    n = float(agg["n"].sum())
    mx = float(agg["sx"].sum()) / n
    my = float(agg["sy"].sum()) / n
    cov = float(agg["sxy"].sum()) / n - mx * my
    varx = float(agg["sxx"].sum()) / n - mx * mx
    theta = cov / varx if varx > 0 else 0.0
    out_rows = []
    for _, r in agg.iterrows():
        an = float(r["n"])
        a_my = r["sy"] / an
        a_mx = r["sx"] / an
        mean_cuped = a_my - theta * (a_mx - mx)
        vary = r["syy"] / an - a_my * a_my
        # var(Y - theta X) within the arm
        a_cov = r["sxy"] / an - a_mx * a_my
        a_varx = r["sxx"] / an - a_mx * a_mx
        var_adj = vary - 2.0 * theta * a_cov + theta * theta * a_varx
        vr = 1.0 - var_adj / vary if vary > 0 else 0.0
        out_rows.append((int(r["arm"]), int(r["n"]),
                         round(a_my, 6), round(mean_cuped, 6),
                         round(vr, 6)))
    return pd.DataFrame(out_rows, columns=[
        "arm", "n", "mean_raw", "mean_cuped", "var_reduction"])


def activity_streaks(
    events: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_gap_days: int = 3,
    num_shards: int = 256,
) -> pd.DataFrame:
    """Islands-and-gaps at day granularity: per user, contiguous runs
    of ACTIVE days where consecutive active days at most
    ``max_gap_days`` apart stay in one streak — n_streaks,
    longest_streak_days (covered span of the longest island, first to
    last active day inclusive) and active_days. The engagement-streak
    report behind retention dashboards.

    One hash-shard co-shuffle (the ``window_rank`` pattern: every
    user's rows land in one shard, many users per shard) and a single
    vectorized pass per shard — day extraction, sorted distinct days,
    gap splits via diff, all numpy."""

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        days = (g[ts_col].astype("datetime64[ns]").astype(np.int64)
                // 86_400_000_000_000)
        d = pd.DataFrame({user_col: g[user_col].to_numpy(np.int64),
                          "day": days}).drop_duplicates()
        d = d.sort_values([user_col, "day"], kind="stable")
        if d.empty:
            return pd.DataFrame({
                user_col: pd.Series(dtype=np.int64),
                "n_streaks": pd.Series(dtype=np.int64),
                "longest_streak_days": pd.Series(dtype=np.int64),
                "active_days": pd.Series(dtype=np.int64)})
        u = d[user_col].to_numpy()
        dy = d["day"].to_numpy()
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap = np.r_[True, (dy[1:] - dy[:-1]) > max_gap_days]
        start = new_user | gap
        # per-streak span via the sorted order: first day at each
        # start, last day just before the next start
        starts_ix = np.flatnonzero(start)
        ends_ix = np.r_[starts_ix[1:], len(dy)] - 1
        span = dy[ends_ix] - dy[starts_ix] + 1
        streak_user = u[starts_ix]
        s = pd.DataFrame({user_col: streak_user, "span": span})
        agg = s.groupby(user_col, as_index=False).agg(
            n_streaks=("span", "size"),
            longest_streak_days=("span", "max"))
        act = d.groupby(user_col, as_index=False).agg(
            active_days=("day", "size"))
        out = agg.merge(act, on=user_col)
        out["n_streaks"] = out["n_streaks"].astype(np.int64)
        out["longest_streak_days"] = \
            out["longest_streak_days"].astype(np.int64)
        out["active_days"] = out["active_days"].astype(np.int64)
        return out[[user_col, "n_streaks", "longest_streak_days",
                    "active_days"]]

    out = _sharded_by_key(
        events, user_col, num_shards
    ).groupby("__shard").map_groups(
        lambda g: per_shard(g.drop(columns="__shard")),
        batch_format="pandas").to_pandas()
    return out.sort_values(user_col, ignore_index=True)
