"""Sketch aggregates for cardinality at 100 TB scale.

The reference computes exact distinct counts on single-machine data
(SURVEY.md §2.5 A5/A7 — no sketches existed there); at the engine's
design scale (10^12 rows) an exact distinct over a high-cardinality key
would shuffle the whole key column. HyperLogLog gives a fixed
``2**p``-byte state per group that merges associatively, so the whole
aggregation is one combiner pass + a tiny register-max reduce — no
all-to-all of raw keys.

Implementation is the standard HLL of Flajolet et al. with the usual
small-range (linear counting) correction; register update is fully
vectorized numpy (hash -> bucket index + leading-zero rank via log2).
Accuracy ~= 1.04 / sqrt(2**p) relative std error (p=12 -> ~1.6%).
Exactness vs a brute-force distinct is covered by pytest self-oracles
(tests/test_ops_extra.py) — approximate ops get no DuckDB twin.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

import ray
import ray.data

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 finalizer) over an int64 or
    string array. No RNG state — same value hashes identically on every
    worker and every run."""
    if values.dtype.kind in ("i", "u"):
        x = values.astype(np.uint64)
    else:
        # strings: cheap FNV-1a via pandas hashing (stable, no PYTHONHASHSEED)
        from pandas.util import hash_array

        x = hash_array(np.asarray(values, dtype=object), categorize=False).astype(
            np.uint64
        )
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
        return x ^ (x >> np.uint64(31))


def _registers_for(h: np.ndarray, p: int) -> np.ndarray:
    """Max leading-zero rank per bucket for one batch of 64-bit hashes."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & _MASK64
    # rank = leading zeros of `rest` + 1; rest==0 -> max rank (64-p+1)
    nz = rest != 0
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    if nz.any():
        # leading zeros via floor(log2): lz = 63 - floor(log2(x))
        lz = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
        rank[nz] = (lz + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def hll_count_distinct(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> int:
    """Approximate global ``COUNT(DISTINCT col)``. Per-batch combiner
    emits one ``2**p``-register row; registers merge by elementwise max
    on the driver (the reduced set is blocks x 4KB — trivially small).
    Cost: one streaming pass, zero shuffles."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        regs = _registers_for(_hash64(b[col].to_numpy()), p)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    parts = ds.map_batches(local, batch_format="pandas").take_all()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in parts:
        np.maximum(merged, np.frombuffer(row["regs"], dtype=np.uint8), out=merged)
    return int(round(_estimate(merged, p)))


def grouped_hll_count_distinct(
    ds: ray.data.Dataset, group_key: str, col: str, p: int = 10,
    out: str = "approx_distinct",
) -> pd.DataFrame:
    """Approximate ``COUNT(DISTINCT col)`` per group. Each batch emits
    one register blob per key present (combiner); the shuffle moves
    ``keys x blocks`` 1KB blobs, never raw values; the final is an
    associative register-max merge per key on one worker (group-key
    cardinality is report-sized here; shard the merge by
    ``hash(key) % K`` for huge key spaces)."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list] = {group_key: [], "regs": []}
        for key, g in b.groupby(group_key, sort=False):
            rows[group_key].append(key)
            rows["regs"].append(
                _registers_for(_hash64(g[col].to_numpy()), p).tobytes()
            )
        return pd.DataFrame(rows)

    parts = ds.map_batches(local, batch_format="pandas")

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        keys_out, ns = [], []
        for key, g in b.groupby(group_key, sort=True):
            merged = np.zeros(1 << p, dtype=np.uint8)
            for blob in g["regs"]:
                np.maximum(
                    merged, np.frombuffer(blob, dtype=np.uint8), out=merged
                )
            keys_out.append(key)
            ns.append(int(round(_estimate(merged, p))))
        return pd.DataFrame({group_key: keys_out, out: ns})

    return parts.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    ).to_pandas()


# Reserved key carrying the stream length through the same shuffle as
# the candidate counts (NUL prefix cannot appear in extracted tokens).
_TOTAL_SENTINEL = "\x00__total__"


def heavy_hitters_exact(
    ds: ray.data.Dataset,
    phi: float,
    extract,
    out_col: str = "value",
    k_factor: int = 4,
) -> pd.DataFrame:
    """EXACT frequent items (support >= ``phi`` of the stream) in two
    streaming passes — the scale path when the value space (tokens,
    URLs, user ids) is far too large to groupby-count outright:

    pass 1: each batch emits its exact ``np.unique`` counts pruned to a
    ``k = k_factor/phi``-entry Misra-Gries summary (subtract the
    (k+1)-th count, drop non-positive). Per-batch exact counts are
    zero-error MG summaries, and MG summaries merge by count-sum +
    re-prune (mergeable-summaries result), so the merged candidate set
    PROVABLY contains every item with true frequency > n/k — a
    superset of the phi-heavy items at k_factor x margin. State is
    O(k) per batch regardless of cardinality.

    pass 2: the candidate set (tiny) broadcasts; batches count ONLY
    candidates; an exact filter ``count >= phi * n`` runs on the merged
    totals. Output is exactly SQL ``GROUP BY .. HAVING count >= phi *
    total`` (see the ``heavy_hitter_tokens`` DuckDB oracle).

    ``extract(batch) -> np.ndarray`` maps a pandas batch to the value
    stream (a column, or tokens exploded from one).
    """
    k = int(np.ceil(k_factor / phi))

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        vals = extract(b)
        n = len(vals)
        if n == 0:
            return pd.DataFrame({out_col: pd.Series(dtype=object),
                                 "__c": pd.Series(dtype=np.int64)})
        u, c = np.unique(vals, return_counts=True)
        if len(u) > k:
            thr = np.sort(c)[::-1][k]  # (k+1)-th largest
            keep = (c - thr) > 0
            u, c = u[keep], c[keep] - thr
        return pd.DataFrame(
            {out_col: np.append(u, _TOTAL_SENTINEL),
             "__c": np.append(c, n).astype(np.int64)}
        )

    merged = (
        ds.map_batches(summarize, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby(out_col, as_index=False, sort=False)["__c"].sum(),
            batch_format="pandas", batch_size=None,
        )
        .to_pandas()
    )
    if out_col not in merged.columns:  # empty input: nothing frequent
        return pd.DataFrame({out_col: pd.Series(dtype=object),
                             "n": pd.Series(dtype=np.int64)})
    total = int(merged.loc[merged[out_col] == _TOTAL_SENTINEL, "__c"].iloc[0])
    cand = merged[merged[out_col] != _TOTAL_SENTINEL]
    if len(cand) > k:  # final MG prune of the merged summary
        thr = np.sort(cand["__c"].to_numpy())[::-1][k]
        cand = cand[cand["__c"] - thr > 0]
    cand_ref = ray.put(frozenset(cand[out_col]))

    def exact_counts(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        cset = cached_get(cand_ref)
        vals = extract(b)
        vals = vals[pd.Series(vals).isin(cset).to_numpy()]
        u, c = np.unique(vals, return_counts=True)
        return pd.DataFrame({out_col: u, "n": c.astype(np.int64)})

    counts = (
        ds.map_batches(exact_counts, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: b.groupby(out_col, as_index=False, sort=False)["n"].sum(),
            batch_format="pandas", batch_size=None,
        )
        .to_pandas()
    )
    out = counts[counts["n"] >= phi * total]
    return out.sort_values(
        ["n", out_col], ascending=[False, True], kind="stable", ignore_index=True
    )


def ddsketch_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    rel_err: float = 0.01,
) -> pd.DataFrame:
    """Mergeable relative-error quantile sketch (DDSketch semantics,
    Masson et al. 2019, VLDB — public algorithm): positive values map
    to log-gamma bins ``ceil(log_gamma(v))`` with
    ``gamma = (1+a)/(1-a)``; each bin is at most ``2a`` relative wide,
    so any quantile read back from merged bin counts is within
    ``rel_err`` of the true value. The per-batch state is a tiny
    (bin, count) frame — counts merge by SUM, so the whole sketch is
    one combiner pass + ``sum_final``; no sort, no all-to-all of
    values. This is the quantile path when the exact per-group sorts
    of ``grouped_quantile_*`` are too wide (e.g. latency percentiles
    over 10^12 rows). Zeros/negatives share a zero bin (values here
    are magnitudes: prices, sizes, latencies).

    Returns one row per q: (q, est) with est = gamma^bin * 2/(1+gamma)
    (bin midpoint in log space). Accuracy pytest-oracled vs exact."""
    from engine.ops import relational

    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    lg = np.log(gamma)

    def local(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(dtype=np.float64)
        pos = v > 0
        # non-positive values live in a sentinel bin that sorts first
        bins = np.full(len(v), np.iinfo(np.int64).min, dtype=np.int64)
        bins[pos] = np.ceil(np.log(v[pos]) / lg).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pd.DataFrame({"bin": u, "n": c.astype(np.int64)})

    merged = relational.sum_final(
        ds.map_batches(local, batch_format="pandas"), ["bin"]
    ).to_pandas()
    if "bin" not in merged.columns:  # empty input: no quantiles
        return pd.DataFrame({"q": list(qs), "est": [np.nan] * len(qs)})
    merged = merged.sort_values("bin", ignore_index=True)
    total = int(merged["n"].sum())
    cum = merged["n"].cumsum().to_numpy()
    zero_sent = np.int64(np.iinfo(np.int64).min)
    rows = []
    for q in qs:
        rank = max(1, int(np.ceil(q * total)))
        i = int(np.searchsorted(cum, rank))
        b = int(merged["bin"].iloc[i])
        est = 0.0 if b == zero_sent else gamma ** b * 2.0 / (1.0 + gamma)
        rows.append({"q": q, "est": est})
    return pd.DataFrame(rows)


_CM_SEEDS = np.uint64([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5])


def count_min(
    ds: ray.data.Dataset,
    col: str,
    depth: int = 4,
    width: int = 4096,
) -> np.ndarray:
    """Count-Min sketch of a key column (Cormode & Muthukrishnan 2005,
    public algorithm): a (depth x width) counter matrix where row d
    increments at ``h_d(key) % width``. Each batch builds its LOCAL
    matrix (two vectorized passes), matrices merge by element-wise SUM
    — associative, so the exchange moves depth*width int64s per block
    regardless of input size. Point lookups (``count_min_query``)
    return min over rows: never an undercount, overcount <= 2N/width
    with prob >= 1 - 2^-depth. The approximate dual of the exact
    Misra-Gries heavy hitters above."""
    if depth > len(_CM_SEEDS):
        raise ValueError(f"depth <= {len(_CM_SEEDS)}")

    def local(b: pd.DataFrame) -> pd.DataFrame:
        h = _hash64(b[col].to_numpy())
        m = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            hd = (h * _CM_SEEDS[d]) >> np.uint64(32)
            np.add.at(m[d], (hd % np.uint64(width)).astype(np.int64), 1)
        return pd.DataFrame({"m": [m.ravel().tolist()]})

    parts = ds.map_batches(local, batch_format="pandas").to_pandas()
    total = np.zeros(depth * width, dtype=np.int64)
    if "m" not in parts.columns:  # empty input: zero sketch
        return total.reshape(depth, width)
    for row in parts["m"]:
        total += np.asarray(row, dtype=np.int64)
    return total.reshape(depth, width)


def count_min_query(
    sketch: np.ndarray, keys: np.ndarray
) -> np.ndarray:
    """Point estimates for ``keys`` from a ``count_min`` matrix."""
    depth, width = sketch.shape
    h = _hash64(np.asarray(keys))
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        hd = ((h * _CM_SEEDS[d]) >> np.uint64(32)) % np.uint64(width)
        est = np.minimum(est, sketch[d, hd.astype(np.int64)])
    return est


def grouped_ddsketch_quantiles(
    ds: ray.data.Dataset,
    group_key: str,
    col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    rel_err: float = 0.01,
) -> pd.DataFrame:
    """Per-group DDSketch quantiles: the (group, bin) count frame is
    the per-batch combiner state — SUM-mergeable like the global
    sketch, so the exchange moves groups x ~hundreds-of-bins partials.
    Returns one row per (group, q). Same <=rel_err guarantee per
    group; pytest-oracled."""
    from engine.ops import relational

    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    lg = np.log(gamma)
    zero_sent = np.int64(np.iinfo(np.int64).min)

    def local(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(dtype=np.float64)
        bins = np.full(len(v), zero_sent, dtype=np.int64)
        pos = v > 0
        bins[pos] = np.ceil(np.log(v[pos]) / lg).astype(np.int64)
        out = pd.DataFrame({group_key: b[group_key], "bin": bins})
        return out.groupby([group_key, "bin"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    merged = relational.sum_final(
        ds.map_batches(local, batch_format="pandas"), [group_key, "bin"]
    ).to_pandas()
    if group_key not in merged.columns:  # empty input
        return pd.DataFrame({group_key: [], "q": [], "est": []})
    rows = []
    for key, g in merged.groupby(group_key, sort=True):
        g = g.sort_values("bin", ignore_index=True)
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        for q in qs:
            rank = max(1, int(np.ceil(q * total)))
            i = int(np.searchsorted(cum, rank))
            b = int(g["bin"].iloc[i])
            est = 0.0 if b == zero_sent else gamma ** b * 2.0 / (1.0 + gamma)
            rows.append({group_key: key, "q": q, "est": est})
    return pd.DataFrame(rows)


def kmv_count_distinct(
    ds: ray.data.Dataset,
    col: str,
    k: int = 256,
) -> pd.DataFrame:
    """KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
    2002, public): keep the k smallest DISTINCT splitmix64 hash values;
    with h_(k) the k-th smallest as a fraction of 2^64, the estimator
    is (k-1)/h_(k). Fully deterministic given the hash — unlike HLL's
    register layout, the sketch value itself is SQL-reproducible, so
    the DuckDB twin recomputes the exact same estimate (the one
    approximate-distinct family with a hash-equal oracle).

    Mergeable: per-batch k-min arrays union + re-truncate (the
    combiner); below k distinct hashes the estimate is the exact
    distinct-hash count. One row out: (k_used, approx_distinct)."""
    from engine.ops.sketch import _hash64  # self-import safe

    def local(b: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(_hash64(b[col].to_numpy()))
        return pd.DataFrame({"h": h[:k].astype(np.uint64).view(np.int64)})

    parts = ds.map_batches(local, batch_format="pandas").to_pandas()
    if parts.empty or "h" not in parts.columns:
        return pd.DataFrame({
            "k_used": np.asarray([0], np.int64),
            "approx_distinct": np.asarray([0.0], np.float64)})
    hs = np.unique(parts["h"].to_numpy().view(np.uint64))
    if len(hs) == 0:
        est = 0.0
    elif len(hs) < k:
        est = float(len(hs))
    else:
        hk = float(hs[k - 1]) / float(2 ** 64)
        est = (k - 1) / hk
    return pd.DataFrame({
        "k_used": np.asarray([min(k, len(hs))], np.int64),
        "approx_distinct": np.asarray([round(est, 4)], np.float64)})
