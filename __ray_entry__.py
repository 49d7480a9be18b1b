"""Driver contract: ``entry()`` / ``queries()`` / ``oracle_sql()``.

Ray is initialised by the driver BEFORE this module is imported — no
``ray.init``/``ray.shutdown`` here or in ``engine.*`` (SURVEY.md §3.2).

``queries()`` exposes the operator inventory of SURVEY.md §2 over the
driver's TPC-H-ish tables (SQL-expressible ops get a DuckDB twin in
``oracle_sql()``; names and column names match exactly) plus the geo /
dedup / similarity / multimodal operators over deterministic synthetic
fixtures (rows-only checks — their exactness is covered by the pytest
oracles instead, see tests/).

Float discipline: aggregate outputs are rounded to 4-6 decimals on BOTH
sides so parallel summation order can't flip the value-hash.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd

_GEO_N = 1500  # geo fixture rows used by the geo_* queries (any sf_dir)
_GEO_NPT = _GEO_N // 50  # points per track in the 50-track fixture


def _cached_dir(base: str, populate: Callable[[str], None]) -> str:
    """Crash-safe cached layout: populate a temp sibling dir, mark it
    complete, and ``os.rename`` it into place atomically. A crashed or
    interrupted first attempt used to leave partial output files in the
    final dir that a retry silently duplicated (Ray writers emit
    uniquely-named files); stale partials are now cleared and a
    half-built temp dir can never be read."""
    import shutil

    marker = os.path.join(base, "_COMPLETE")
    if os.path.exists(marker):
        return base
    shutil.rmtree(base, ignore_errors=True)  # stale partial from a crash
    tmp = f"{base}.building.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    populate(tmp)
    open(os.path.join(tmp, "_COMPLETE"), "w").write("ok")
    try:
        os.rename(tmp, base)
    except OSError:  # concurrent process won the rename race
        shutil.rmtree(tmp, ignore_errors=True)
    return base


# --------------------------------------------------------------------- geo fixture

def _geo_fixture_dir(n: int = _GEO_N) -> str:
    """Deterministic on-disk geo fixture, generated once per machine."""
    from engine import fixtures

    return _cached_dir(
        f"/tmp/graft_geo_fixture_{n}",
        lambda d: fixtures.write_images_parquet(n, d, num_files=4),
    )


def _geo_indexed(columns=None):
    from engine.io import read_images
    from engine.pipeline import ingest

    ds = read_images(_geo_fixture_dir(), columns=columns)
    return ingest.run_ingest(ds)


def _geo_aux_dir() -> str:
    """Geo fixture SIDE-tables materialized as parquet (articles list,
    admin-polygon vertices) so the DuckDB oracles read the same inputs
    the geo queries consume — the oracle then recomputes the TRANSFORM
    (join / dedup / centroid / radius) independently in SQL. Created
    eagerly by ``queries()`` so the files exist whichever side the
    driver runs first. Pure driver-side writes, cached, atomic."""
    from engine import fixtures

    def pop(d: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        arts = fixtures.articles(_GEO_N)
        pq.write_table(
            pa.Table.from_pandas(arts, preserve_index=False),
            os.path.join(d, "articles.parquet"),
        )
        poly = fixtures.polygons()
        rows: dict[str, list] = {
            "admin_id": [], "level": [], "ring_ix": [],
            "vertex_ix": [], "lon": [], "lat": [],
        }
        for i in range(len(poly["admin_id"])):
            rings = [(0, poly["ring_lon"][i], poly["ring_lat"][i])]
            for hix, (hx, hy) in enumerate(poly["holes"][i], start=1):
                rings.append((hix, hx, hy))
            for rix, xs, ys in rings:
                for vix, (x, y) in enumerate(zip(xs, ys)):
                    rows["admin_id"].append(str(poly["admin_id"][i]))
                    rows["level"].append(int(poly["level"][i]))
                    rows["ring_ix"].append(rix)
                    rows["vertex_ix"].append(vix)
                    rows["lon"].append(float(x))
                    rows["lat"].append(float(y))
        pq.write_table(pa.table(rows),
                       os.path.join(d, "polygon_vertices.parquet"))
        pq.write_table(
            pa.table({
                "admin_id": [str(a) for a in poly["admin_id"]],
                "level": [int(v) for v in poly["level"]],
                "parent_id": [str(p) for p in poly["parent_id"]],
                "name": [str(nm) for nm in poly["name"]],
            }),
            os.path.join(d, "polygon_meta.parquet"),
        )

    return _cached_dir("/tmp/graft_geo_aux_v3", pop)


# --------------------------------------------------------------------- PQ fixture

_PQ_M, _PQ_KS, _PQ_NQ, _PQ_DIM = 16, 64, 4, 64
_PQ_CACHE: list = []


def _pq_fixture():
    """Deterministic PQ codebooks + query vectors, sf-independent so the
    ``ann_pq_topk`` oracle can inline them as SQL constants (no side
    tables, no query/oracle ordering hazard). Codebooks are fit on a
    seeded unit-normalized gaussian sample (the embeddings table is
    unit-norm 64-dim); both sides consume values rounded to 6 decimals,
    so engine and DuckDB score the IDENTICAL floats."""
    if _PQ_CACHE:
        return _PQ_CACHE[0]
    from engine.ops.simsearch import pq_fit

    rng = np.random.default_rng(20260819)
    sample = rng.standard_normal((512, _PQ_DIM))
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    cb = np.round(pq_fit(sample, m=_PQ_M, ks=_PQ_KS, iters=8, seed=42), 6)
    q = rng.standard_normal((_PQ_NQ, _PQ_DIM))
    q = np.round(q / np.linalg.norm(q, axis=1, keepdims=True), 6)
    _PQ_CACHE.append((cb, q))
    return _PQ_CACHE[0]


_CENT_CACHE: dict = {}


def _seed_centroids(k: int) -> np.ndarray:
    """Deterministic sf-independent k-means centroids (unit-norm, fit
    on a seeded unit-normalized gaussian sample — the embeddings table
    is unit-norm 64-dim), rounded to 6 decimals so the engine and a
    SQL VALUES inline consume the IDENTICAL floats. Used by
    embedding_kmeans_clusters (k=8) and ann_ivf_topk (k=16)."""
    got = _CENT_CACHE.get(k)
    if got is None:
        from engine.ops.simsearch import kmeans_fit

        rng = np.random.default_rng(20260819 + k)
        sample = rng.standard_normal((512, _PQ_DIM))
        sample /= np.linalg.norm(sample, axis=1, keepdims=True)
        got = _CENT_CACHE[k] = np.round(kmeans_fit(sample, k), 6)
    return got


def _sql_centroid_values(cent: np.ndarray) -> str:
    """(c, d, val) VALUES rows for a centroid matrix — 1-based dim to
    match DuckDB list indexing."""
    return ",".join(
        f"({c},{d + 1},{float(cent[c, d])!r})"
        for c in range(cent.shape[0]) for d in range(cent.shape[1])
    )


def _sql_pq_topk(k: int = 10) -> str:
    """Self-contained DuckDB ADC twin: inline codebook + query-subvector
    VALUES tables, per-(vec, subspace) argmax code via the same
    ``2*x.c - ||c||^2`` score the engine uses, LUT distance rebuilt from
    the same constants, ROW_NUMBER top-k ordered (adist, vec_id)."""
    cb, q = _pq_fixture()
    m, ks, sub = cb.shape
    cb_rows = ",".join(
        f"({j},{c},{','.join(repr(float(v)) for v in cb[j, c])})"
        for j in range(m) for c in range(ks)
    )
    qs_rows = ",".join(
        f"({qi},{j},{','.join(repr(float(v)) for v in q[qi, j * sub:(j + 1) * sub])})"
        for qi in range(len(q)) for j in range(m)
    )
    xcols = "+".join(f"s.x{i + 1}*cb.c{i + 1}" for i in range(sub))
    c2 = "+".join(f"cb.c{i + 1}*cb.c{i + 1}" for i in range(sub))
    lutd = "+".join(
        f"(qs.q{i + 1}-cb.c{i + 1})*(qs.q{i + 1}-cb.c{i + 1})"
        for i in range(sub)
    )
    subsel = ",".join(
        f"emb[{sub}*j.j+{i + 1}] AS x{i + 1}" for i in range(sub)
    )
    return f"""
        WITH cb(j, c, {','.join(f'c{i + 1}' for i in range(sub))}) AS (
            VALUES {cb_rows}
        ),
        qs(qid, j, {','.join(f'q{i + 1}' for i in range(sub))}) AS (
            VALUES {qs_rows}
        ),
        sub AS (
            SELECT vec_id, j.j, {subsel}
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                  FROM embeddings) e
            CROSS JOIN (SELECT unnest(range(0, {m})) AS j) j
        ),
        scored AS (
            SELECT s.vec_id, s.j, cb.c,
                   2*({xcols}) - ({c2}) AS sc
            FROM sub s JOIN cb ON cb.j = s.j
        ),
        codes AS (
            SELECT vec_id, j, c FROM (
                SELECT vec_id, j, c,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                          ORDER BY sc DESC, c) AS rn
                FROM scored) WHERE rn = 1
        ),
        lut AS (
            SELECT qs.qid, cb.j, cb.c, {lutd} AS d
            FROM qs JOIN cb ON cb.j = qs.j
        ),
        ad AS (
            SELECT l.qid, c.vec_id, SUM(l.d) AS adist
            FROM codes c JOIN lut l ON l.j = c.j AND l.c = c.c
            GROUP BY l.qid, c.vec_id
        ),
        rk AS (
            SELECT qid, vec_id, adist,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY adist, vec_id) AS rank
            FROM ad
        )
        SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS INT) AS rank,
               vec_id, ROUND(adist, 6) AS adist
        FROM rk WHERE rank <= {k}
    """


# --------------------------------------------------------------------- entry

def entry() -> Any:
    """Flagship pipeline at sf0.001 scale: ingest -> PIP join on the
    synthetic geo fixture; returns the joined Dataset."""
    from engine import fixtures
    from engine.pipeline import join

    indexed = _geo_indexed(columns=["image_id", "caption"])
    return join.run_pip_join(indexed, fixtures.polygons(), concurrency=(1, 4))


# --------------------------------------------------------------------- queries

def queries() -> dict[str, Callable[[str], Any]]:
    import ray
    import ray.data
    from ray.data.aggregate import Count, Mean, Sum

    from engine import codec, fixtures
    from engine.io import sf_table
    from engine.ops import dedup, geo as geo_ops, multimodal, relational, simsearch, text
    from engine.pipeline import ingest, join, tile

    # materialize the geo fixture + its side-tables up front: several
    # oracle_sql twins read these parquet files, and the driver may run
    # the oracle before the Ray query
    _geo_fixture_dir()
    _geo_aux_dir()

    # ---- relational over the driver tables -----------------------------

    def q1_pricing_summary(sf_dir: str):
        ds = sf_table(
            sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
        )

        def add_disc(t):
            # zero-copy Arrow elementwise: no pandas conversion on the
            # wide input (round-1 verdict: the pandas add_disc stage
            # paid a conversion tax for one multiply)
            import pyarrow as pa
            import pyarrow.compute as pc

            disc = pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
            return t.append_column("disc_price", disc)

        out = relational.partial_groupby_sum_arrow(
            ds,
            ["l_returnflag", "l_linestatus"],
            {"l_quantity": "sum_qty", "l_extendedprice": "sum_base_price",
             "disc_price": "sum_disc_price"},
            count_as="count_order",
            derive=add_disc,
        ).to_pandas()
        out["sum_qty"] = out["sum_qty"].round(4)
        # price sums reach ~2e11 at sf0.1: 4 decimals sits at the edge
        # of double precision and summation order flips the last digit;
        # 2 decimals keeps the comparison stable at any sf
        for c in ("sum_base_price", "sum_disc_price"):
            out[c] = out[c].round(2)
        return out

    def revenue_by_nation(sf_dir: str):
        orders = sf_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        cust = sf_table(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
        nation = sf_table(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
        small = cust.merge(
            nation, left_on="c_nationkey", right_on="n_nationkey"
        )[["c_custkey", "n_name"]].rename(columns={"c_custkey": "o_custkey"})
        joined = relational.broadcast_hash_join(orders, small, on="o_custkey")
        out = relational.partial_groupby_sum(
            joined, ["n_name"], {"o_totalprice": "revenue"}, count_as="n_orders"
        ).to_pandas()
        out["revenue"] = out["revenue"].round(4)
        return out

    def top_customers_by_acctbal(sf_dir: str):
        ds = sf_table(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
        return relational.topk(ds, "c_acctbal", 10).to_pandas()

    def customers_with_orders(sf_dir: str):
        cust = sf_table(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
        keys = sf_table(sf_dir, "orders", ["o_custkey"]).to_pandas()
        keys = keys.rename(columns={"o_custkey": "c_custkey"})
        return relational.semi_join(cust, keys, on="c_custkey")

    def customers_without_big_orders(sf_dir: str):
        # anti-join (J3): customers with no order over 300k
        cust = sf_table(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
        keys = (
            sf_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .filter(expr="o_totalprice > 300000")
            .to_pandas()
        )
        keys = keys.rename(columns={"o_custkey": "c_custkey"})
        return relational.anti_join(cust, keys, on="c_custkey")

    def distinct_mktsegment(sf_dir: str):
        return relational.distinct(
            sf_table(sf_dir, "customer", ["c_mktsegment"]), ["c_mktsegment"]
        )

    def lineitem_revenue_rows(sf_dir: str):
        ds = sf_table(
            sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
        )

        def f(t):
            # zero-copy Arrow filter + elementwise (no pandas tax on
            # the widest table)
            import pyarrow as pa
            import pyarrow.compute as pc

            t = t.filter(pc.greater(t["l_discount"], pa.scalar(0.08)))
            rev = pc.round(
                pc.multiply(t["l_extendedprice"],
                            pc.subtract(pa.scalar(1.0), t["l_discount"])),
                ndigits=4,
            )
            return t.select(["l_orderkey", "l_linenumber"]).append_column(
                "revenue", rev
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def orders_from_csv_by_status(sf_dir: str):
        # format seam (S2 residue): the same rows round-tripped through
        # CSV must aggregate identically to the parquet oracle
        import zlib

        from engine.io import read_any, write_any

        def pop(d: str) -> None:
            o = sf_table(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
            write_any(o, f"{d}/orders_csv", fmt="csv")

        base = _cached_dir(f"/tmp/graft_csv_{zlib.crc32(sf_dir.encode())}", pop)
        import glob as _glob

        ds = read_any(sorted(_glob.glob(f"{base}/orders_csv/*")), fmt="csv")
        out = relational.partial_groupby_sum(
            ds, ["o_orderstatus"], {"o_totalprice": "total"}, count_as="n"
        ).to_pandas()
        out["total"] = out["total"].round(2)
        return out

    def parts_name_like(sf_dir: str):
        # LIKE predicate pushdown analog: vectorized substring filter
        p = sf_table(sf_dir, "part", ["p_partkey", "p_name"])

        def f(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["p_name"].str.contains("re", regex=False)]

        return p.map_batches(f, batch_format="pandas")

    def orders_by_weekday(sf_dir: str):
        # EXTRACT(dow): ISO day number computed identically both sides
        ds = sf_table(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

        def f(b: pd.DataFrame) -> pd.DataFrame:
            b["dow"] = b["o_orderdate"].dt.isocalendar().day.astype(np.int64)
            return b[["dow", "o_totalprice"]]

        out = relational.partial_groupby_sum(
            ds.map_batches(f, batch_format="pandas"),
            ["dow"], {"o_totalprice": "total"}, count_as="n",
        ).to_pandas()
        out["total"] = out["total"].round(2)
        return out

    def orders_by_month(sf_dir: str):
        ds = sf_table(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

        def f(b: pd.DataFrame) -> pd.DataFrame:
            b["month"] = b["o_orderdate"].dt.strftime("%Y-%m")
            return b[["month", "o_totalprice"]]

        out = relational.partial_groupby_sum(
            ds.map_batches(f, batch_format="pandas"),
            ["month"], {"o_totalprice": "total"}, count_as="n_orders",
        ).to_pandas()
        out["total"] = out["total"].round(4)
        return out

    def part_supplier_join(sf_dir: str):
        # both-sides co-shuffle join (native hash-partitioned Dataset.join)
        li = sf_table(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        part = sf_table(sf_dir, "part", ["p_partkey", "p_brand"])

        def ren(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns={"p_partkey": "l_partkey"})

        joined = relational.bucketed_join(
            li, part.map_batches(ren, batch_format="pandas"),
            on="l_partkey",
        )
        out = relational.partial_groupby_sum(
            joined, ["p_brand"], {"l_quantity": "sum_qty"}, count_as="n_items"
        ).to_pandas()
        out["sum_qty"] = out["sum_qty"].round(4)
        return out

    def orders_with_delta_applied(sf_dir: str):
        # Delta-style MERGE (the reference's incremental-update pass):
        # a deterministic changefile (price bump on keys %10==3,
        # deletes on %10==7) applied latest-wins in one shuffle
        cols = ["o_orderkey", "o_custkey", "o_totalprice"]
        base = sf_table(sf_dir, "orders", cols)

        def make_delta(b: pd.DataFrame) -> pd.DataFrame:
            m = b["o_orderkey"] % 10
            up = b[m == 3].copy()
            up["o_totalprice"] = up["o_totalprice"] + 1000.0
            up["__op"] = "U"
            de = b[m == 7].copy()
            de["__op"] = "D"
            return pd.concat([up, de], ignore_index=True)

        delta = sf_table(sf_dir, "orders", cols).map_batches(
            make_delta, batch_format="pandas"
        )
        out = relational.merge_upserts(base, delta, "o_orderkey").to_pandas()
        out["o_totalprice"] = out["o_totalprice"].round(4)
        return out[cols]

    def supplier_stats_by_region(sf_dir: str):
        # 3-table star join (J5 hierarchy lookup): the two tiny
        # dimension tables pre-merge driver-side into ONE broadcast map,
        # the fact scan never shuffles; AVG = sum/count from the combiner
        sup = sf_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
        nation = sf_table(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
        region = sf_table(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
        dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
            ["n_nationkey", "r_name"]
        ].rename(columns={"n_nationkey": "s_nationkey"})
        joined = relational.broadcast_hash_join(sup, dim, on="s_nationkey")
        out = relational.partial_groupby_sum(
            joined, ["r_name"], {"s_acctbal": "sum_bal"}, count_as="n_suppliers"
        ).to_pandas()
        out["avg_bal"] = (out["sum_bal"] / out["n_suppliers"]).round(4)
        return out[["r_name", "n_suppliers", "avg_bal"]]

    def union_order_status(sf_dir: str):
        o = sf_table(sf_dir, "orders", ["o_orderstatus", "o_orderkey"])
        a = o.filter(expr="o_orderstatus == 'O'")
        b = o.filter(expr="o_orderstatus == 'F'")
        out = (
            a.union(b)
            .groupby("o_orderstatus")
            .aggregate(Count(alias_name="n"))
            .to_pandas()
        )
        return out

    def events_json_stats(sf_dir: str):
        ds = sf_table(sf_dir, "events", ["event_type", "props"])

        def f(b: pd.DataFrame) -> pd.DataFrame:
            import json

            b["k"] = [int(json.loads(p)["k"]) for p in b["props"]]
            return b[["event_type", "k"]]

        out = relational.partial_groupby_sum(
            ds.map_batches(f, batch_format="pandas"),
            ["event_type"], {"k": "sum_k"}, count_as="n",
        ).to_pandas()
        return out

    def running_total_by_user(sf_dir: str):
        ds = sf_table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

        def f(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="stable")
            g["running_value"] = g["value"].cumsum().round(4)
            return g[["event_id", "user_id", "running_value"]]

        return ds.groupby("user_id").map_groups(f, batch_format="pandas")

    def sessionize_events(sf_dir: str):
        ds = sf_table(sf_dir, "events", ["event_id", "user_id", "ts"])

        def f(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="stable")
            gap = g["ts"].diff().dt.total_seconds()
            new_sess = ((gap > 3600) | gap.isna()).astype(np.int64)
            g["session_seq"] = new_sess.cumsum()
            return g[["event_id", "user_id", "session_seq"]]

        return ds.groupby("user_id").map_groups(f, batch_format="pandas")

    def top_users_by_events(sf_dir: str):
        # A4: per-user counts + global top-k by (count desc, user asc)
        ds = sf_table(sf_dir, "events", ["user_id"])
        counts = ds.groupby("user_id").aggregate(Count(alias_name="n_events"))
        out = counts.sort(["n_events", "user_id"], descending=[True, False]).limit(20)
        return out.to_pandas()

    def scalar_string_funcs(sf_dir: str):
        # M9: scalar string/date/math kernels via pyarrow.compute
        import pyarrow.compute as pc

        ds = sf_table(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

        def f(b):
            return b.select(["c_custkey"]).append_column(
                "name_upper", pc.utf8_upper(b["c_name"])
            ).append_column(
                "name_prefix", pc.utf8_slice_codeunits(b["c_name"], 0, 8)
            ).append_column(
                "bal_bucket",
                pc.cast(pc.floor(pc.divide(b["c_acctbal"], 1000.0)), "int64"),
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def sample_customers(sf_dir: str):
        # O3: deterministic systematic sample (key mod m == r) — the
        # seeded-sampling analog that stays oracle-checkable
        import pyarrow as pa

        ds = sf_table(sf_dir, "customer", ["c_custkey", "c_name"])

        def f(b: "pa.Table") -> "pa.Table":
            mask = (np.asarray(b["c_custkey"], dtype=np.int64) % 17) == 3
            return b.filter(pa.array(mask))

        return ds.map_batches(f, batch_format="pyarrow")

    def events_hourly_window(sf_dir: str):
        # tumbling 1h window per event_type: the windowed-aggregate op
        ds = sf_table(sf_dir, "events", ["event_type", "ts", "value"])

        def f(b: pd.DataFrame) -> pd.DataFrame:
            b["window_start"] = b["ts"].dt.floor("h")
            return b[["event_type", "window_start", "value"]]

        out = relational.partial_groupby_sum(
            ds.map_batches(f, batch_format="pandas"),
            ["event_type", "window_start"], {"value": "sum_value"}, count_as="n",
        ).to_pandas()
        out["sum_value"] = out["sum_value"].round(4)
        return out

    def events_asof_purchase(sf_dir: str):
        # as-of join (custom operator, SURVEY §2.9a): each click joined
        # to the user's latest purchase at-or-before it
        ev = sf_table(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])
        clicks = ev.filter(expr="event_type == 'click'").select_columns(
            ["event_id", "user_id", "ts"]
        )
        purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
            ["event_id", "user_id", "ts", "value"]
        )
        out = relational.asof_join_grouped(
            clicks, purchases, by="user_id", on="ts",
            right_value_cols={"event_id": "purchase_event_id",
                              "value": "purchase_value"},
            left_cols=["event_id", "user_id", "ts"],
            right_tie_cols=["event_id"],
        ).to_pandas()
        out["purchase_value"] = out["purchase_value"].round(4)
        return out

    def quantity_range_buckets(sf_dir: str):
        # range join (broadcast interval table, no shuffle of lineitem)
        li = sf_table(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
        ranges = pd.DataFrame(
            {"lo": [1.0, 11.0, 21.0, 31.0], "hi": [11.0, 21.0, 31.0, 51.0],
             "bucket": ["q1", "q2", "q3", "q4"]}
        )
        joined = relational.range_join_broadcast(li, ranges, "l_quantity")
        out = relational.partial_groupby_sum(
            joined, ["bucket"], {"l_extendedprice": "sum_price"}, count_as="n"
        ).to_pandas()
        out["sum_price"] = out["sum_price"].round(2)
        return out

    def top3_orders_per_customer(sf_dir: str):
        ds = sf_table(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        out = relational.grouped_topk(
            ds, "o_custkey", "o_totalprice", 3, tie_col="o_orderkey", rank_as="rank"
        )
        return out.select_columns(["o_custkey", "o_orderkey", "o_totalprice", "rank"])

    def latest_event_per_user(sf_dir: str):
        ev = sf_table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        out = relational.argmax_per_group(ev, "user_id", "ts", "event_id").to_pandas()
        out["value"] = out["value"].round(4)
        return out[["user_id", "event_id", "ts", "value"]]

    def acctbal_quantiles_by_segment(sf_dir: str):
        cust = sf_table(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])
        out = relational.grouped_quantile_disc(
            cust, ["c_mktsegment"], "c_acctbal",
            {0.25: "q25", 0.5: "q50", 0.75: "q75"},
        ).to_pandas()
        for c in ("q25", "q50", "q75"):
            out[c] = out[c].round(4)
        return out

    def rolling_avg_user_value(sf_dir: str):
        ev = sf_table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        out = relational.rolling_mean(
            ev, "user_id", ["ts", "event_id"], "value", window=3, out="rolling_avg"
        ).to_pandas()
        out["rolling_avg"] = out["rolling_avg"].round(4)
        return out[["event_id", "user_id", "rolling_avg"]]

    def stratified_sample_customers(sf_dir: str):
        cust = sf_table(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
        return relational.stratified_sample(cust, "c_mktsegment", "c_custkey", 0.125)

    def events_pivot_by_user(sf_dir: str):
        # pivot: event_type categories -> count columns per user
        ev = sf_table(sf_dir, "events", ["user_id", "event_type"])
        cats = ["click", "view", "purchase", "signup", "error"]
        return relational.pivot_counts(ev, "user_id", "event_type", cats)

    def qty_price_corr_by_flag(sf_dir: str):
        li = sf_table(sf_dir, "lineitem",
                      ["l_returnflag", "l_quantity", "l_extendedprice"])
        out = relational.grouped_corr(
            li, "l_returnflag", "l_quantity", "l_extendedprice", out="corr_qp"
        )
        out["corr_qp"] = out["corr_qp"].round(4)
        return out

    def order_rank_in_customer(sf_dir: str):
        # SQL ranking window functions (row_number/rank/dense_rank),
        # one shuffle on the partition key
        ds = sf_table(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        out = relational.window_rank(
            ds, "o_custkey", ["o_totalprice", "o_orderkey"], [False, True],
            methods={"rn": "row_number", "rnk": "rank", "drnk": "dense_rank"},
            rank_on=["o_totalprice"],
        )
        return out.select_columns(["o_custkey", "o_orderkey", "rn", "rnk", "drnk"])

    def orders_of_rich_customers(sf_dir: str):
        # Bloom-prefiltered semi-join: key side stays distributed, the
        # broadcast is a bitset not a key set; misses drop BEFORE the
        # co-shuffle, the exact residual join removes false positives
        orders = sf_table(sf_dir, "orders",
                          ["o_orderkey", "o_custkey", "o_totalprice"])
        rich = (
            sf_table(sf_dir, "customer", ["c_custkey", "c_acctbal"])
            .filter(expr="c_acctbal > 9000.0")
            .map_batches(
                lambda b: b[["c_custkey"]].rename(
                    columns={"c_custkey": "o_custkey"}
                ),
                batch_format="pandas",
            )
        )
        out = relational.bloom_semi_join(orders, rich, "o_custkey")
        out = out.select_columns(
            ["o_orderkey", "o_custkey", "o_totalprice"]
        ).to_pandas()
        out["o_totalprice"] = out["o_totalprice"].round(4)
        return out

    def acctbal_var_by_segment(sf_dir: str):
        # per-group population variance/stddev, two-pass centered sums
        ds = sf_table(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])
        out = relational.grouped_var_std(ds, "c_mktsegment", "c_acctbal")
        out["var_pop"] = out["var_pop"].round(4)
        out["std_pop"] = out["std_pop"].round(4)
        return out

    def orders_priority_rollup(sf_dir: str):
        # GROUP BY ROLLUP: one distributed finest aggregate, coarser
        # levels cascaded from its tiny result (A3 report rollup)
        ds = sf_table(sf_dir, "orders",
                      ["o_orderstatus", "o_orderpriority", "o_totalprice"])
        out = relational.rollup_sum(
            ds, ["o_orderstatus", "o_orderpriority"],
            {"o_totalprice": "total"}, count_as="n_orders",
        )
        out["total"] = out["total"].round(2)
        return out

    def orders_status_priority_cube(sf_dir: str):
        # GROUP BY CUBE: all 2^k grouping sets from one distributed
        # finest aggregate, coarser sets derived driver-side
        ds = sf_table(sf_dir, "orders",
                      ["o_orderstatus", "o_orderpriority", "o_totalprice"])
        out = relational.cube_sum(
            ds, ["o_orderstatus", "o_orderpriority"],
            {"o_totalprice": "total"}, count_as="n_orders",
        )
        out["total"] = out["total"].round(2)
        return out

    def order_pctrank_in_customer(sf_dir: str):
        # normalized window functions (PERCENT_RANK / CUME_DIST / NTILE),
        # same single sharded shuffle as the ranking query
        ds = sf_table(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        out = relational.window_rank(
            ds, "o_custkey", ["o_totalprice", "o_orderkey"], [True, True],
            methods={"pct_rnk": "percent_rank", "cume_d": "cume_dist",
                     "tile4": "ntile:4"},
            rank_on=["o_totalprice"],
        ).to_pandas()
        out["pct_rnk"] = out["pct_rnk"].round(6)
        out["cume_d"] = out["cume_d"].round(6)
        return out[["o_custkey", "o_orderkey", "pct_rnk", "cume_d", "tile4"]]

    def event_value_delta(sf_dir: str):
        # LAG window function: per-user delta vs previous event
        ev = sf_table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        out = relational.lag_delta(
            ev, "user_id", ["ts", "event_id"], "value", out="delta"
        ).to_pandas()
        out["delta"] = out["delta"].round(4)
        return out[["event_id", "user_id", "delta"]]

    def parts_never_ordered_heavy(sf_dir: str):
        # both-sides-big anti-join: parts with no heavy (>45 qty)
        # lineitem — neither side broadcastable at scale, so the NOT IN
        # runs as a marker-carrying left-outer co-shuffle
        part = sf_table(sf_dir, "part", ["p_partkey", "p_name"])
        li = (
            sf_table(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
            .filter(expr="l_quantity > 45")
            .map_batches(
                lambda b: b[["l_partkey"]].rename(
                    columns={"l_partkey": "p_partkey"}
                ),
                batch_format="pandas",
            )
        )
        out = relational.bucketed_anti_join(part, li, "p_partkey")
        return out.select_columns(["p_partkey", "p_name"]).to_pandas()

    def user_top_paths(sf_dir: str):
        # path analysis: the 10 most common first-5-event journeys
        # ('signup>view>click>...') — per-shard path combiner counts,
        # one tiny final; ties broken by path ascending
        ev = sf_table(sf_dir, "events",
                      ["user_id", "ts", "event_id", "event_type"])

        def f(shard: pd.DataFrame) -> pd.DataFrame:
            g = shard.drop(columns="__shard").sort_values(
                ["user_id", "ts", "event_id"], kind="stable")
            pos = g.groupby("user_id", sort=False).cumcount()
            g = g[pos.to_numpy() < 5]
            agg = g.groupby("user_id", sort=False)[
                "event_type"].agg(">".join)
            vc = agg.value_counts()
            return pd.DataFrame({"path": vc.index.to_numpy(),
                                 "n_users": vc.to_numpy()})

        parts = relational._sharded_by_key(
            ev, "user_id", 64).groupby("__shard").map_groups(
            f, batch_format="pandas")
        tot = relational.sum_final(parts, ["path"]).to_pandas()
        tot["n_users"] = tot["n_users"].astype(np.int64)
        return tot.sort_values(
            ["n_users", "path"], ascending=[False, True],
            ignore_index=True).head(10)

    def user_event_type_seq(sf_dir: str):
        # ordered per-group string_agg — the reference's per-area
        # article list (one comma-joined titles row per admin area)
        ev = sf_table(sf_dir, "events",
                      ["event_id", "user_id", "ts", "event_type"])
        return relational.grouped_string_agg(
            ev, "user_id", "event_type", ["ts", "event_id"],
            out_col="type_seq",
        ).to_pandas()

    def top_event_type_per_user(sf_dir: str):
        # mode per group composed from existing pieces: combiner counts
        # per (user, type), then argmax per user (ties -> larger type,
        # matching argmax_per_group's DESC tie rule)
        ev = sf_table(sf_dir, "events", ["user_id", "event_type"])
        counts = relational.partial_groupby_sum(
            ev, ["user_id", "event_type"], {}, count_as="n"
        )
        out = relational.argmax_per_group(
            counts, "user_id", "n", "event_type"
        ).to_pandas()
        return out.rename(columns={"event_type": "top_type"})

    def event_value_window(sf_dir: str):
        # LEAD / FIRST_VALUE / LAST_VALUE per user, whole-partition
        # frame, one sharded shuffle
        ev = sf_table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        out = relational.window_value(
            ev, "user_id", ["ts", "event_id"], "value",
            {"next_value": "lead:1", "first_value": "first",
             "last_value": "last"},
        ).to_pandas()
        for c in ("next_value", "first_value", "last_value"):
            out[c] = out[c].round(4)
        return out[["event_id", "user_id", "next_value",
                    "first_value", "last_value"]]

    def acctbal_qcont_by_segment(sf_dir: str):
        # continuous (interpolated) quantiles, DuckDB quantile_cont parity
        cust = sf_table(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])
        out = relational.grouped_quantile_cont(
            cust, ["c_mktsegment"], "c_acctbal", {0.5: "median_bal", 0.9: "p90_bal"}
        ).to_pandas()
        for c in ("median_bal", "p90_bal"):
            out[c] = out[c].round(4)
        return out

    def distinct_users_per_event_type(sf_dir: str):
        # exact COUNT(DISTINCT) with a per-batch distinct-pair combiner
        ev = sf_table(sf_dir, "events", ["event_type", "user_id"])
        return relational.grouped_count_distinct(
            ev, ["event_type"], "user_id", out="n_users"
        )

    def customer_big_order_counts(sf_dir: str):
        # LEFT OUTER broadcast join: every customer kept, zero-filled
        # count of their >150k orders (COALESCE'd so output is null-free)
        cust = sf_table(sf_dir, "customer", ["c_custkey", "c_name"])
        big = sf_table(sf_dir, "orders", ["o_custkey", "o_totalprice"]).filter(
            expr="o_totalprice > 150000.0"
        )
        counts = relational.partial_groupby_sum(
            big, ["o_custkey"], {}, count_as="n_big"
        ).to_pandas().rename(columns={"o_custkey": "c_custkey"})
        out = relational.broadcast_hash_join(
            cust, counts, on="c_custkey", how="left"
        ).to_pandas()
        out["n_big"] = out["n_big"].fillna(0).astype(np.int64)
        return out

    def docs_top_tokens(sf_dir: str):
        # corpus vocabulary report: global token counts, top 50
        ds = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return text.token_topk(ds, k=50)

    def docs_lexical_richness(sf_dir: str):
        # corpus-level Yule's K (repeat rate, length-invariant) and
        # Herdan's C (type-token exponent) over the [a-z]+ token
        # stream — the generated-boilerplate screen; (token, count)
        # partials move, four scalars fold on the driver
        ds = sf_table(sf_dir, "documents", ["text"])
        out = text.lexical_richness(ds)
        out["yule_k"] = out["yule_k"].round(6)
        out["herdan_c"] = out["herdan_c"].round(6)
        return out[["n_tokens", "n_types", "yule_k", "herdan_c"]]

    def click_purchase_hourly_ccf(sf_dir: str):
        # cross-correlation between the hourly click and purchase
        # count series at lags 0-3h ("do purchases follow clicks k
        # hours later") — the lead-lag screen behind funnel timing;
        # one (hour, type) combiner, O(span) fold on the driver
        ev = sf_table(sf_dir, "events", ["ts", "event_type"])
        out = relational.hourly_ccf(
            ev, "click", "purchase", max_lag=3)
        out["ccf"] = out["ccf"].round(4)
        return out[["lag", "ccf"]]

    def heavy_hitter_tokens(sf_dir: str):
        # EXACT phi-frequent tokens in two streaming passes over a
        # Misra-Gries candidate summary — O(k) state per batch, no
        # full-vocabulary shuffle (the scale path for 10^9-term streams)
        from engine.ops import sketch

        ds = sf_table(sf_dir, "documents", ["text"])

        def extract(b):
            toks: list = []
            for s in b["text"]:
                toks.extend(text._ALPHA_RE.findall(s.lower()))
            return np.asarray(toks, dtype=object)

        return sketch.heavy_hitters_exact(
            ds, phi=0.005, extract=extract, out_col="token"
        )

    def urgent_vs_big_orders(sf_dir: str):
        # FULL OUTER co-shuffle join of two aggregates with disjoint
        # key coverage; both sides null-filled so output hashes cleanly
        orders = sf_table(sf_dir, "orders",
                          ["o_custkey", "o_orderpriority", "o_totalprice"])
        urgent = relational.partial_groupby_sum(
            orders.filter(expr="o_orderpriority == '1-URGENT'"),
            ["o_custkey"], {}, count_as="n_urgent",
        )
        big = relational.partial_groupby_sum(
            orders.filter(expr="o_totalprice > 300000.0"),
            ["o_custkey"], {}, count_as="n_big",
        )
        out = relational.bucketed_join(
            urgent, big, on="o_custkey", how="full_outer"
        ).to_pandas()
        for c in ("n_urgent", "n_big"):
            out[c] = out[c].fillna(0).astype(np.int64)
        return out

    def docs_token_stats(sf_dir: str):
        ds = sf_table(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
        ds = ds.map_batches(text.token_count_batch, batch_format="pandas")
        out = relational.partial_groupby_sum(
            ds, ["lang"], {"n_tokens": "sum_tokens", "n_chars": "sum_chars"},
            count_as="n_docs",
        ).to_pandas()
        return out

    def docs_vocab_diversity(sf_dir: str):
        # per-doc distinct-token count + type/token ratio (degenerate
        # repeated-token docs score near 0 — a dedup-adjacent filter)
        ds = sf_table(sf_dir, "documents", ["doc_id", "text"])
        out = ds.map_batches(text.distinct_token_batch, batch_format="pandas")
        return out.select_columns(["doc_id", "n_distinct", "ttr"])

    def docs_repetition_ratio(sf_dir: str):
        # Gopher-style duplicate-bigram fraction: boilerplate / looping
        # docs that length and TTR filters miss
        ds = sf_table(sf_dir, "documents", ["doc_id", "text"])
        out = ds.map_batches(text.repetition_ratio_batch,
                             batch_format="pandas")
        return out.select_columns(["doc_id", "n_bigrams", "rep_ratio"])

    def docs_quality(sf_dir: str):
        ds = sf_table(sf_dir, "documents", ["doc_id", "text"])
        out = ds.map_batches(text.quality_score_batch, batch_format="pandas")
        return out.select_columns(
            ["doc_id", "n_chars_q", "mean_word_len", "stopword_ratio"]
        )

    def dedup_documents_exact(sf_dir: str):
        ds = sf_table(sf_dir, "documents", ["doc_id", "text"])
        out = dedup.exact_dedup(ds, key="text", order_col="doc_id")
        return out.select_columns(["doc_id", "text"])

    def ann_cosine_range(sf_dir: str):
        # radius similarity search: all vectors within cosine >= 0.25
        # of the 5 lowest-id query vectors — the fixed-threshold dual
        # of ann_cosine_topk; hits-only leave each task
        emb = sf_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        qdf = relational.topk(
            emb, "vec_id", 5, descending=False).to_pandas()
        q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
        res = simsearch.cosine_range_search(
            emb, q, min_cos=0.25).to_pandas()
        res["query_vec_id"] = qdf["vec_id"].to_numpy()[
            res["query_ix"].to_numpy()]
        res["cos"] = res["cos"].round(6)
        return res.sort_values(
            ["query_vec_id", "vec_id"], ignore_index=True)[
            ["query_vec_id", "vec_id", "cos"]]

    def ann_cosine_topk(sf_dir: str):
        emb = sf_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        qdf = relational.topk(emb, "vec_id", 5, descending=False).to_pandas()
        q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
        res = simsearch.brute_force_topk(emb, q, k=10)
        res["query_vec_id"] = qdf["vec_id"].to_numpy()[res["query_ix"].to_numpy()]
        return res[["query_vec_id", "rank", "vec_id", "cos"]]

    def docs_winnow_fingerprints(sf_dir: str):
        # winnowing (MOSS) fingerprint selection: per-doc distinct
        # window-min hashes of 8-char grams (djb32 + splitmix64, the
        # SQL-reproducible chain) — the guaranteed-recall substring
        # fingerprint layer; value set is position-independent so no
        # tie-break crosses the oracle boundary
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return dedup.winnow_fingerprints(docs).select_columns(
            ["doc_id", "n_grams", "n_fp", "fp_min"])

    def embedding_mmr_topk(sf_dir: str):
        # Maximal-Marginal-Relevance diversified top-5 from a
        # distributed brute-force top-20 pool (3 smallest query ids,
        # lambda=0.7); all similarities rounded 6dp BEFORE the greedy
        # arithmetic so both sides run the identical argmax; twin =
        # 5 unrolled selection CTEs
        emb = sf_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        qdf = relational.topk(emb, "vec_id", 3,
                              descending=False).to_pandas()
        q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
        return simsearch.mmr_topk(
            emb, q, qdf["vec_id"].to_numpy(), k=5, pool=20, lam=0.7)

    def embedding_truncation_recall(sf_dir: str):
        # Matryoshka-style truncation audit: recall@10 of the
        # first-32-dim cosine ranking against the full 64-dim ranking
        # for the 5 smallest query ids — how much ANN quality a 2x
        # vector-storage cut costs; two distributed brute-force
        # passes (pc.list_slice keeps the half view zero-copy),
        # overlap counted on the tiny (5 x 10) results
        import pyarrow.compute as pc

        emb = sf_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        qdf = relational.topk(emb, "vec_id", 5,
                              descending=False).to_pandas()
        q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
        full = simsearch.brute_force_topk(emb, q, k=10)

        def half_view(t):
            import pyarrow as pa

            return pa.table({
                "vec_id": t["vec_id"],
                "embedding": pc.list_slice(t["embedding"], 0, 32)})

        halfr = simsearch.brute_force_topk(
            emb.map_batches(half_view, batch_format="pyarrow"),
            q[:, :32], k=10)
        qids = qdf["vec_id"].to_numpy()
        rows = []
        for ix in range(len(qids)):
            fs = set(full.loc[full["query_ix"] == ix, "vec_id"])
            hs = set(halfr.loc[halfr["query_ix"] == ix, "vec_id"])
            rows.append((int(qids[ix]), len(fs & hs),
                         len(fs & hs) / 10.0))
        return pd.DataFrame(rows, columns=["query_vec_id", "n_common",
                                           "recall_at_10"])

    # ---- rows-only: text / dedup / similarity --------------------------

    def lang_id_documents(sf_dir: str):
        ds = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return text.run_lang_id(ds).select_columns(["doc_id", "lang_pred", "lang_score"])

    def fingerprint_documents(sf_dir: str):
        ds = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return ds.map_batches(text.fingerprint_batch, batch_format="pandas").select_columns(
            ["doc_id", "fingerprint"]
        )

    def simhash_documents(sf_dir: str):
        # 64-bit simhash over whitespace tokens; token hashes are the
        # SQL-reproducible djb-polynomial + splitmix64 chain, so the
        # DuckDB twin (_sql_simhash) recomputes every hash bit-exactly
        ds = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return dedup.simhash_table(ds).select_columns(["doc_id", "simhash"])

    def minhash_dedup_documents(sf_dir: str):
        ds = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return dedup.minhash_lsh_dedup(ds)  # verify fetches candidate texts only

    def embedding_near_dups(sf_dir: str):
        import ray.data as rd

        from engine.ops.sketch import _hash64

        emb = sf_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        # plant deterministic near-duplicates: the first 10 vectors
        # perturbed by a splitmix64-signed +-5% per dimension under new
        # ids (random vectors have none). The perturbation chain is
        # SQL-reproducible, so the DuckDB twin regenerates the planted
        # corpus and rederives every pair (multi-probe membership ==
        # signature hamming <= 1).
        base = relational.topk(emb, "vec_id", 10, descending=False).to_pandas()
        ids = base["vec_id"].to_numpy(np.int64)
        mat = np.stack(base["embedding"].to_numpy()).astype(np.float64)
        d = mat.shape[1]
        signs = 1.0 - 2.0 * (
            _hash64((ids[:, None] * 131
                     + np.arange(d)[None, :]).ravel().astype(np.int64))
            .reshape(len(ids), d).astype(np.int64) & 1)
        planted = pd.DataFrame({
            "vec_id": ids + 1_000_000,
            "embedding": [r.astype(np.float32).tolist()
                          for r in mat * (1.0 + 0.05 * signs)],
        })
        corpus = emb.union(rd.from_pandas(planted))
        return dedup.embedding_near_dups(corpus, threshold=0.9)

    def ngram_jaccard_docs(sf_dir: str):
        import ray.data as rd

        ds = sf_table(sf_dir, "documents", ["doc_id", "text"])
        # plant deterministic near-dups: tail-mutated copies of the first
        # 10 docs under new ids (plus the corpus's own exact dups at 1.0)
        base = relational.topk(ds, "doc_id", 10, descending=False).to_pandas()
        mut = base.copy()
        mut["doc_id"] = mut["doc_id"].to_numpy() + 10_000_000
        mut["text"] = [
            str(t)[: max(0, len(str(t)) - 8)] + " extra tail sentence"
            for t in mut["text"]
        ]
        corpus = ds.union(rd.from_pandas(mut))
        return dedup.ngram_jaccard_pairs(corpus, threshold=0.5)

    def embedding_norm_by_label(sf_dir: str):
        # vector math with a SQL twin: mean L2 norm per label
        emb = sf_table(sf_dir, "embeddings", ["label", "embedding"])

        def f(b: pd.DataFrame) -> pd.DataFrame:
            v = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            return pd.DataFrame(
                {"label": b["label"].to_numpy(),
                 "norm": np.sqrt((v * v).sum(axis=1))}
            )

        out = relational.partial_groupby_sum(
            emb.map_batches(f, batch_format="pandas"),
            ["label"], {"norm": "sum_norm"}, count_as="n_vecs",
        ).to_pandas()
        out["avg_norm"] = (out["sum_norm"] / out["n_vecs"]).round(4)
        return out[["label", "n_vecs", "avg_norm"]]

    def embedding_kmeans_clusters(sf_dir: str):
        # corpus curation clustering: broadcast centroids, streaming
        # assignment, then a combiner-first per-cluster report. The
        # centroids are the deterministic seeded fixture so the DuckDB
        # twin inlines them and recomputes assignment + report in SQL.
        emb = sf_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        assigned = simsearch.kmeans_assign(
            emb, n_clusters=8, centroids=_seed_centroids(8))
        out = relational.partial_groupby_sum(
            assigned, ["cluster"], {"cos": "sum_cos"}, count_as="n_vecs"
        ).to_pandas()
        out["avg_cos"] = (out["sum_cos"] / out["n_vecs"]).round(4)
        return out[["cluster", "n_vecs", "avg_cos"]]

    def embedding_cluster_ari(sf_dir: str):
        # external clustering validation: ARI + NMI between the
        # fixed-centroid k-means assignment and the ground-truth
        # label; contingency combiner, exact-int pair/margin terms;
        # SQL twin re-derives the assignment from the inlined
        # centroids and mirrors the formula tree
        emb = sf_table(sf_dir, "embeddings",
                       ["vec_id", "embedding", "label"])
        assigned = simsearch.kmeans_assign(
            emb, n_clusters=8, centroids=_seed_centroids(8),
            keep_cols=("label",))
        out = simsearch.cluster_agreement(assigned)
        out["ari"] = out["ari"].round(6)
        out["nmi"] = out["nmi"].round(6)
        return out[["n_vecs", "n_clusters", "n_labels", "ari",
                    "nmi"]]

    def approx_distinct_users(sf_dir: str):
        # HyperLogLog sketch: one streaming pass, zero shuffles; the
        # ~1.6% (p=12) accuracy bound is pytest-verified vs the exact
        # count (approximate => rows-only, no SQL twin)
        from engine.ops import sketch

        ev = sf_table(sf_dir, "events", ["user_id", "event_type"])
        n = sketch.hll_count_distinct(ev, "user_id", p=12)
        per_type = sketch.grouped_hll_count_distinct(
            ev, "event_type", "user_id", p=12, out="approx_users"
        )
        per_type["global_approx_users"] = np.int64(n)
        return per_type

    def dedup_components_documents(sf_dir: str):
        # distributed connected components (iterated min-label
        # propagation, one co-shuffle join per round) over verified
        # near-dup pairs — the scale path past driver-side union-find
        import ray.data as rd

        ds = sf_table(sf_dir, "documents", ["doc_id", "text"])
        # bottom-10 doc_ids via the pruning top-k (no range-sort of the
        # full text column just to pick 10 seed rows)
        base = relational.topk(ds, "doc_id", 10, descending=False).to_pandas()
        mut = base.copy()
        mut["doc_id"] = mut["doc_id"].to_numpy() + 10_000_000
        mut["text"] = [
            str(t)[: max(0, len(str(t)) - 8)] + " extra tail sentence"
            for t in mut["text"]
        ]
        corpus = ds.union(rd.from_pandas(mut))
        pairs = dedup.ngram_jaccard_pairs(corpus, threshold=0.5)
        if not len(pairs):
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "label": pd.Series(dtype=np.int64)})
        edges = rd.from_pandas(pairs[["a", "b"]].astype(np.int64))
        return dedup.connected_components_distributed(edges)

    def video_frame_plan(sf_dir: str):
        # video-as-binary plumbing: clip metadata -> deterministic
        # uniform-stride frame-sampling plan (decode itself is the
        # stubbed external-codec step, engine/ops/multimodal.py)
        ds = sf_table(sf_dir, "events", ["event_id"])

        def add_meta(b: pd.DataFrame) -> pd.DataFrame:
            b["n_frames"] = (b["event_id"].to_numpy() % 12) + 1
            return b

        out = ds.map_batches(add_meta, batch_format="pandas").map_batches(
            multimodal.FrameSampler,
            fn_constructor_kwargs={"frames_per_clip": 4},
            batch_format="pandas", concurrency=(1, 4), num_cpus=1,
        )
        return out.select_columns(["event_id", "n_frames", "frame_index"])

    def audio_chunk_plan(sf_dir: str):
        # audio-as-binary plumbing: 5s fixed windows at 16kHz from
        # n_samples metadata (PCM decode is the stubbed step)
        ds = sf_table(sf_dir, "events", ["event_id"])

        def add_meta(b: pd.DataFrame) -> pd.DataFrame:
            b["n_samples"] = ((b["event_id"].to_numpy() * 37) % 200001) + 16000
            b["sample_rate"] = np.int64(16000)
            return b

        out = ds.map_batches(add_meta, batch_format="pandas").map_batches(
            multimodal.AudioChunker,
            fn_constructor_kwargs={"chunk_seconds": 5.0},
            batch_format="pandas", concurrency=(1, 4), num_cpus=1,
        )
        return out.select_columns(
            ["event_id", "n_samples", "chunk_index", "start_sample", "end_sample"]
        )

    def ann_ivf_topk(sf_dir: str):
        # IVF over a pre-bucketed layout: the index (bucket=<centroid>/
        # hive dirs) is built ONCE per sf_dir and cached; each probe
        # lists and reads only the nprobe bucket directories — the
        # corpus is never rescanned per query set
        import zlib

        emb = sf_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        qdf = relational.topk(emb, "vec_id", 5, descending=False).to_pandas()
        q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)

        def pop(tmp: str) -> None:
            # seeded sf-independent coarse centroids -> the DuckDB twin
            # inlines them and replays assignment + probe + top-k
            simsearch.ivf_build(
                sf_table(sf_dir, "embeddings", ["vec_id", "embedding"]),
                os.path.join(tmp, "index"),
                centroids=_seed_centroids(16),
            )

        base = _cached_dir(f"/tmp/graft_ivf2_{zlib.crc32(sf_dir.encode())}", pop)
        res, _stats = simsearch.ivf_probe(
            os.path.join(base, "index"), q, k=10, nprobe=4
        )
        return res

    def ann_ivf_recall(sf_dir: str):
        # recall@10 evaluation of the IVF index (nprobe=4) against the
        # exact brute-force top-10 — the accuracy/throughput audit an
        # ANN deployment runs before flipping traffic; composes the
        # two existing pipelines and folds a 5x10-row overlap count
        ivf = ann_ivf_topk(sf_dir)
        bf = ann_cosine_topk(sf_dir)
        # bf keys queries by vec_id; map back to the dense query_ix
        # (queries are the 5 smallest vec_ids, in order)
        qids = np.sort(bf["query_vec_id"].unique())
        qix = {int(v): i for i, v in enumerate(qids)}
        bf = bf.assign(query_ix=[qix[int(v)]
                                 for v in bf["query_vec_id"]])
        bset = set(zip(bf["query_ix"], bf["vec_id"]))
        hits = np.fromiter(
            ((int(r.query_ix), int(r.vec_id)) in bset
             for r in ivf.itertuples()), bool, count=len(ivf))
        g = ivf.assign(hit=hits).groupby(
            "query_ix", as_index=False)["hit"].sum()
        out = pd.DataFrame({
            "query_ix": g["query_ix"].astype(np.int64),
            "recall": (g["hit"] / 10.0).round(6)})
        return out.sort_values("query_ix", ignore_index=True)

    # ---- geo / multimodal over the synthetic fixture -------------------

    def geo_h3_cell_counts(sf_dir: str):
        idx = _geo_indexed(columns=["image_id"])
        return idx.groupby("h3_r5").aggregate(Count(alias_name="n"))

    def geo_s2_cell_counts(sf_dir: str):
        # S2-like covering path (M3): per-cell counts at the ingest
        # level via a parent rollup — self-consistency pytest-oracled
        # in tests/test_geo_kernels.py
        from engine.geo import s2like

        idx = _geo_indexed(columns=["image_id"])

        def parent_cell(b: pd.DataFrame) -> pd.DataFrame:
            cells = b["s2_cell"].to_numpy(dtype=np.uint64)
            b = b[[]].copy()
            b["s2_parent"] = s2like.parent(cells, steps=6).astype(np.int64)
            return b

        return relational.partial_groupby_sum(
            idx.map_batches(parent_cell, batch_format="pandas"),
            ["s2_parent"], {}, count_as="n",
        )

    def geo_geohash_counts(sf_dir: str):
        # standard base-32 geohash (precision 6) as a third spatial
        # key family next to H3/S2 — prefix-hierarchical, so coarser
        # rollups are substr groupbys; SQL twin rebuilds every char
        # from the same quantize+interleave bit arithmetic
        from engine.geo import geohash

        idx = _geo_indexed(columns=["image_id"])

        def add_gh(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "geohash": geohash.encode(
                    b["lon"].to_numpy(), b["lat"].to_numpy(), 6)})

        out = relational.partial_groupby_sum(
            idx.map_batches(add_gh, batch_format="pandas"),
            ["geohash"], {}, count_as="n",
        ).to_pandas()
        return out.sort_values("geohash", ignore_index=True)[
            ["geohash", "n"]]

    def docs_chunked(sf_dir: str):
        # context-window chunking (flat_map): 128-token windows with
        # 16-token overlap; reconstruction invariant pytest-oracled
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        out = text.chunk_documents(docs, chunk_tokens=128, overlap=16)
        return out.select_columns(["doc_id", "chunk_ix", "n_tokens"])

    def docs_token_ids(sf_dir: str):
        # vocab-id encoding: top-2000 corpus tokens broadcast as the
        # vocabulary, docs -> list<int32> ids; exactness pytest-oracled
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        vocab = text.token_topk(docs, k=2000)["token"].tolist()
        out = text.encode_token_ids(docs, vocab)

        def summ(b: pd.DataFrame) -> pd.DataFrame:
            b["n_ids"] = [len(x) for x in b["token_ids"]]
            return b[["doc_id", "n_ids", "n_unk"]]

        return out.map_batches(summ, batch_format="pandas")

    def docs_unigram_logprob(sf_dir: str):
        # perplexity-family quality filter: corpus unigram LM broadcast
        # once, per-doc mean log-prob; brute-force pytest-oracled
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        counts = text.unigram_counts(docs)
        out = text.unigram_logprob(docs, counts)
        return out.select_columns(["doc_id", "mean_logp"])

    def docs_bigram_logprob(sf_dir: str):
        # order-sensitive perplexity stand-in: corpus bigram LM
        # (add-1 over V+1) broadcast once, per-doc mean conditional
        # log-prob; SQL twin rebuilds the positional token list via a
        # range() index (no WITH ORDINALITY in this DuckDB)
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        bi, uni = text.bigram_counts(docs)
        out = text.bigram_logprob(docs, bi, uni).to_pandas()
        return out.sort_values("doc_id", ignore_index=True)

    def docs_bigram_pmi(sf_dir: str):
        # collocation extraction: PMI of adjacent token pairs seen
        # >= 5 times, from the same one-scan bigram/unigram combiner
        # as the bigram LM; exact-int counts through a shared f64
        # product tree, libm-ln slack absorbed by the 6dp round
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        out = text.bigram_pmi(docs, min_count=5)
        out["pmi"] = out["pmi"].round(6)
        return out[["w1", "w2", "n", "pmi"]]

    def docs_levenshtein_pairs(sf_dir: str):
        # typo-level fuzzy dedup screen: same-length-bucket doc pairs
        # whose 24-char prefixes are within edit distance 6; the DP
        # runs vectorized across each bucket's pair axis; SQL twin is
        # DuckDB levenshtein() over the identical blocked join
        docs = sf_table(sf_dir, "documents",
                        ["doc_id", "text", "n_chars"])
        return text.levenshtein_prefix_pairs(
            docs, prefix_len=24, bucket_w=16, max_dist=6)

    def docs_jaro_winkler_pairs(sf_dir: str):
        # fuzzy-title JW screen: same (length-bucket, first-char)
        # block, 20-char prefixes, similarity >= 0.85 after a 6dp
        # round on BOTH sides; engine scorer verified 1e-12-equal to
        # DuckDB's jaro_winkler_similarity over 5000 random cases
        docs = sf_table(sf_dir, "documents",
                        ["doc_id", "text", "n_chars"])
        return text.jaro_winkler_prefix_pairs(
            docs, prefix_len=20, bucket_w=16, min_sim=0.85)

    def docs_rake_keywords(sf_dir: str):
        # RAKE keyword extraction (stopword-delimited phrase core):
        # corpus top-20 words by degree/frequency; integer partials,
        # one vocabulary-bounded exchange; twin = windowed phrase-id
        # cumsum over unnested tokens
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return text.rake_keywords(docs, k=20, stopwords=("a", "the"))

    def events_bootstrap_ci(sf_dir: str):
        # deterministic-hash percentile bootstrap (B=200) of the mean
        # of per-user mean values: resample index = splitmix64(b*n+i)
        # % n over the user-sorted mean vector, exactly re-derivable
        # in SQL; distributed per-user combiner + driver fold
        ev = sf_table(sf_dir, "events", ["user_id", "value"])
        return relational.bootstrap_mean_ci(ev, n_boot=200, alpha=0.05)

    def events_fisher_exact(sf_dir: str):
        # one-sided Fisher exact test on the deterministic-arm
        # conversion table — the small-sample exact companion to
        # events_ab_conversion; tail summed from a cumulative
        # log-factorial table (SUM LN, never lgamma) on both sides
        ev = sf_table(sf_dir, "events", ["user_id", "event_type"])
        return relational.fisher_exact_conversion(ev)

    def event_type_cooccurrence(sf_dir: str):
        # market-basket association: for each unordered event-type
        # pair, how many users did both, plus the lift vs independent
        # supports; SQL twin via distinct self-join
        ev = sf_table(sf_dir, "events", ["user_id", "event_type"])
        pairs = relational.cooccurrence(
            ev, "user_id", "event_type").to_pandas()

        def shard_support(g: pd.DataFrame) -> pd.DataFrame:
            # per-type distinct-user partials PLUS one total-users
            # sentinel row per shard (sharded by user, so shard
            # distinct-user counts sum to the global count)
            d = g[["user_id", "event_type"]].drop_duplicates()
            agg = d.groupby("event_type", as_index=False).size()
            agg = agg.rename(columns={"size": "ns"})
            agg["ns"] = agg["ns"].astype(np.int64)
            tot = pd.DataFrame({
                "event_type": ["\x00total"],
                "ns": np.asarray([g["user_id"].nunique()], np.int64),
            })
            return pd.concat([agg, tot], ignore_index=True)

        from engine.ops.relational import _sharded_by_key

        sup = relational.sum_final(
            _sharded_by_key(ev, "user_id", 16)
            .groupby("__shard")
            .map_groups(
                lambda g: shard_support(g.drop(columns="__shard")),
                batch_format="pandas"),
            ["event_type"],
        ).to_pandas().set_index("event_type")["ns"]
        n_users = int(sup.pop("\x00total"))
        ns = sup
        out = pairs.rename(columns={
            "event_type_a": "type_a", "event_type_b": "type_b",
            "n_groups": "n_users"})
        out["lift"] = (out["n_users"].astype(float) * n_users
                       / (out["type_a"].map(ns)
                          * out["type_b"].map(ns))).round(6)
        out = out.sort_values(["type_a", "type_b"],
                              ignore_index=True)
        return out[["type_a", "type_b", "n_users", "lift"]]

    def part_triangle_count(sf_dir: str):
        # distributed triangle counting on the co-order parts graph
        # (edges = distinct part pairs sharing an order, from the
        # cooccurrence combiner): node-iterator wedges co-shuffled
        # against the edge set; SQL twin is the canonical 3-way join
        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_partkey"])
        edges = relational.cooccurrence(
            li, "l_orderkey", "l_partkey")

        def rn(t):
            import pyarrow as pa

            return pa.table({
                "a": t["l_partkey_a"], "b": t["l_partkey_b"]})

        from engine.ops import graph as graph_ops

        return graph_ops.triangle_count(
            edges.map_batches(rn, batch_format="pyarrow"),
            num_shards=16)

    def part_bfs_hops(sf_dir: str):
        # single-source BFS over the co-order parts graph from the
        # smallest part id: hop-count histogram (the reachability /
        # small-world diagnostic); SQL twin is a UNION-deduped
        # recursive CTE with MIN(hop) semantics
        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_partkey"])
        edges = relational.cooccurrence(
            li, "l_orderkey", "l_partkey")

        def rn(t):
            import pyarrow as pa

            return pa.table({
                "a": t["l_partkey_a"], "b": t["l_partkey_b"]})

        from engine.ops import graph as graph_ops

        e = edges.map_batches(rn, batch_format="pyarrow")
        src_id = int(e.map_batches(
            lambda t: pd.DataFrame(
                {"m": [np.asarray(t["a"], np.int64).min()]}),
            batch_format="pyarrow").to_pandas()["m"].min())
        reached = graph_ops.bfs_hops(e, src_id, max_hops=8)
        out = reached.groupby("hop", as_index=False).agg(
            n_nodes=("node", "size"))
        out["n_nodes"] = out["n_nodes"].astype(np.int64)
        return out.sort_values("hop", ignore_index=True)

    def part_closeness_sampled(sf_dir: str):
        # truncated (8-hop) closeness centrality for the 3 smallest
        # part ids: C = n_reached / sum_hops over the multi-round
        # distributed BFS frontier; twin = multi-source recursive CTE
        # with MIN(hop) semantics and the identical hop cap
        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_partkey"])
        edges = relational.cooccurrence(
            li, "l_orderkey", "l_partkey")

        def rn(t):
            import pyarrow as pa

            return pa.table({
                "a": t["l_partkey_a"], "b": t["l_partkey_b"]})

        from engine.ops import graph as graph_ops

        e = edges.map_batches(rn, batch_format="pyarrow") \
            .materialize()

        def small3(t):
            u = np.unique(np.concatenate([
                np.asarray(t["a"], np.int64),
                np.asarray(t["b"], np.int64)]))
            return pd.DataFrame({"node": u[:3]})

        cand = e.map_batches(
            small3, batch_format="pyarrow").to_pandas()
        srcs = np.sort(cand["node"].unique())[:3]
        rows = []
        for s in srcs:
            reached = graph_ops.bfs_hops(e, int(s), max_hops=8)
            n_reached = len(reached) - 1
            sum_hops = int(reached["hop"].sum())
            c = n_reached / sum_hops if sum_hops > 0 else 0.0
            rows.append((int(s), n_reached, sum_hops,
                         float(np.round(c, 6))))
        return pd.DataFrame(rows, columns=["source", "n_reached",
                                           "sum_hops", "closeness"])

    def part_degree_assortativity(sf_dir: str):
        # hub-to-hub vs hub-to-leaf wiring: Pearson correlation of
        # endpoint degrees over symmetrized co-order edges; only
        # scalar moment partials move. SQL twin uses corr() over the
        # same symmetrized pairs.
        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_partkey"])
        edges = relational.cooccurrence(
            li, "l_orderkey", "l_partkey")

        def rn(t):
            import pyarrow as pa

            return pa.table({
                "a": t["l_partkey_a"], "b": t["l_partkey_b"]})

        from engine.ops import graph as graph_ops

        out = graph_ops.degree_assortativity(
            edges.map_batches(rn, batch_format="pyarrow"))
        out["assortativity"] = out["assortativity"].round(6)
        return out

    def part_avg_neighbor_degree(sf_dir: str):
        # degree-binned average neighbor degree knn(k) — the detail
        # curve behind the assortativity scalar; exact-integer
        # incidence sums grouped by deg(v), one division per bin;
        # degree census broadcast once, O(distinct k) partials move
        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_partkey"])
        edges = relational.cooccurrence(
            li, "l_orderkey", "l_partkey")

        def rn(t):
            import pyarrow as pa

            return pa.table({
                "a": t["l_partkey_a"], "b": t["l_partkey_b"]})

        from engine.ops import graph as graph_ops

        out = graph_ops.avg_neighbor_degree(
            edges.map_batches(rn, batch_format="pyarrow"))
        out["avg_nbr_deg"] = out["avg_nbr_deg"].round(6)
        return out

    def part_link_jaccard(sf_dir: str):
        # link prediction on a 20% order subgraph: top-20 non-edge
        # part pairs by neighborhood Jaccard (wedge counts = common
        # neighbors, edges removed by the co-shard side trick);
        # SQL twin is the adjacency self-join + NOT EXISTS
        def fl(t):
            import pyarrow as pa

            ok = np.asarray(t["l_orderkey"], np.int64) % 5 == 0
            return t.filter(pa.array(ok))

        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_partkey"]).map_batches(
            fl, batch_format="pyarrow")
        edges = relational.cooccurrence(
            li, "l_orderkey", "l_partkey")

        def rn(t):
            import pyarrow as pa

            return pa.table({
                "a": t["l_partkey_a"], "b": t["l_partkey_b"]})

        from engine.ops import graph as graph_ops

        out = graph_ops.common_neighbor_jaccard(
            edges.map_batches(rn, batch_format="pyarrow"),
            k=20, num_shards=16)
        out["jaccard"] = out["jaccard"].round(6)
        return out[["node_b", "node_c", "n_common", "jaccard"]]

    def part_adamic_adar(sf_dir: str):
        # Adamic-Adar link prediction on the same 20% co-order
        # subgraph: top-20 non-edge pairs by sum 1/ln(deg(w)) over
        # common neighbors w — the pivot-retaining wedge stage
        # weighted per wedge; scores rounded 6dp BEFORE the top-k
        # argsort on both sides so ordering is identical
        def fl(t):
            import pyarrow as pa

            ok = np.asarray(t["l_orderkey"], np.int64) % 5 == 0
            return t.filter(pa.array(ok))

        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_partkey"]).map_batches(
            fl, batch_format="pyarrow")
        edges = relational.cooccurrence(
            li, "l_orderkey", "l_partkey")

        def rn(t):
            import pyarrow as pa

            return pa.table({
                "a": t["l_partkey_a"], "b": t["l_partkey_b"]})

        from engine.ops import graph as graph_ops

        return graph_ops.adamic_adar(
            edges.map_batches(rn, batch_format="pyarrow"),
            k=20, num_shards=16)[
            ["node_b", "node_c", "n_common", "aa_score"]]

    def customer_part_hits(sf_dir: str):
        # HITS hubs/authorities on the bipartite customer->part
        # purchase digraph (20% order sample): hubs = broad-basket
        # customers, authorities = parts hub customers buy. Stats-
        # driven join builds the edge list; 5 L1-normalized
        # iterations, twin = unrolled CTE half-steps
        li = sf_table(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

        def fl(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["l_orderkey"] % 5 == 0]
            return b.rename(columns={"l_orderkey": "o_orderkey"})

        li = li.map_batches(fl, batch_format="pandas")
        o = sf_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        j = relational.auto_join(li, o, on="o_orderkey")

        def mk_edges(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "src": b["o_custkey"].to_numpy(np.int64),
                "dst": b["l_partkey"].to_numpy(np.int64) + 10_000_000,
            }).drop_duplicates()

        edges = relational.distinct(
            j.map_batches(mk_edges, batch_format="pandas"),
            ["src", "dst"])
        from engine.ops import graph as graph_ops

        out = graph_ops.hits(edges, iters=5)
        out["auth"] = out["auth"].round(8)
        out["hub"] = out["hub"].round(8)
        # keep the result driver-sized: top-50 authorities + top-50
        # hubs (rounded scores, node tie-break), deterministic
        top_a = out.sort_values(["auth", "node"],
                                ascending=[False, True]).head(50)
        top_h = out.sort_values(["hub", "node"],
                                ascending=[False, True]).head(50)
        res = pd.concat([top_a, top_h]).drop_duplicates(
            subset="node").sort_values("node", ignore_index=True)
        return res[["node", "auth", "hub"]]

    def part_k_core(sf_dir: str):
        # dense-backbone extraction: 5-core of the 20% co-order
        # subgraph by iterative peeling (census + broadcast filter
        # per round). Rounds are data-dependent, but trailing no-op
        # rounds are free, so the SQL twin unrolls 8 peel rounds
        # (observed depth 1-2) and counts the ones that dropped;
        # pytest self-oracle is single-process peeling.
        def fl(t):
            import pyarrow as pa

            ok = np.asarray(t["l_orderkey"], np.int64) % 5 == 0
            return t.filter(pa.array(ok))

        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_partkey"]).map_batches(
            fl, batch_format="pyarrow")
        edges = relational.cooccurrence(
            li, "l_orderkey", "l_partkey")

        def rn(t):
            import pyarrow as pa

            return pa.table({
                "a": t["l_partkey_a"], "b": t["l_partkey_b"]})

        from engine.ops import graph as graph_ops

        return graph_ops.k_core(
            edges.map_batches(rn, batch_format="pyarrow"), k=5)

    def part_local_clustering(sf_dir: str):
        # ego-density per part on the 20% co-order subgraph: closed
        # wedges at each vertex / C(deg,2), via the degree-split wedge
        # stage with pivot retention + broadcast edge-set probe; SQL
        # twin is the canonical adjacency 3-way join
        def fl(t):
            import pyarrow as pa

            ok = np.asarray(t["l_orderkey"], np.int64) % 5 == 0
            return t.filter(pa.array(ok))

        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_partkey"]).map_batches(
            fl, batch_format="pyarrow")
        edges = relational.cooccurrence(
            li, "l_orderkey", "l_partkey")

        def rn(t):
            import pyarrow as pa

            return pa.table({
                "a": t["l_partkey_a"], "b": t["l_partkey_b"]})

        from engine.ops import graph as graph_ops

        return graph_ops.local_clustering(
            edges.map_batches(rn, batch_format="pyarrow"),
            num_shards=16)

    def user_value_ewma(sf_dir: str):
        # monitoring decay state: per-user EWMA of event value at the
        # last event (alpha 0.1, closed-form weight sum); SQL twin
        # evaluates the identical POWER() weights
        ev = sf_table(sf_dir, "events",
                      ["user_id", "ts", "event_id", "value"])
        out = relational.ewma_last(
            ev, "user_id", ["ts", "event_id"], "value",
            alpha=0.1, num_shards=32).to_pandas()
        out["ewma"] = out["ewma"].round(6)
        return out.sort_values("user_id", ignore_index=True)[
            ["user_id", "n_events", "ewma"]]

    def user_value_cusum(sf_dir: str):
        # level-shift detection: per-user max |cumsum of deviations|
        # normalized by sigma*sqrt(m), plus the first position
        # attaining it; SQL twin via running-sum windows
        ev = sf_table(sf_dir, "events",
                      ["user_id", "ts", "event_id", "value"])
        out = relational.cusum_changepoint(
            ev, "user_id", ["ts", "event_id"], "value",
            num_shards=32).to_pandas()
        out["cusum_stat"] = out["cusum_stat"].round(6)
        return out.sort_values("user_id", ignore_index=True)[
            ["user_id", "n_events", "cusum_stat", "t_ix"]]

    def docs_sentence_stats(sf_dir: str):
        # doc-structure features: sentence count, token count, mean
        # tokens per sentence; SQL twin via list_filter over the
        # identical [.!?]+ / [^a-z]+ splits
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        out = text.sentence_stats(docs).to_pandas()
        return out.sort_values("doc_id", ignore_index=True)

    def geom_harmonic_price_by_status(sf_dir: str):
        # multiplicative-domain aggregates: per-status geometric and
        # harmonic mean of order price via (sum ln, sum 1/x, n)
        # combiner partials — the log-domain twin of AVG; SQL twin
        # uses exp(AVG(ln)) and COUNT/SUM(1/x)
        o = sf_table(sf_dir, "orders",
                     ["o_orderstatus", "o_totalprice"])

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            v = b["o_totalprice"].to_numpy(np.float64)
            b["__ln"] = np.log(v)
            b["__inv"] = 1.0 / v
            return b[["o_orderstatus", "__ln", "__inv"]]

        tot = relational.partial_groupby_sum(
            o.map_batches(prep, batch_format="pandas"),
            ["o_orderstatus"],
            {"__ln": "s_ln", "__inv": "s_inv"}, count_as="n",
        ).to_pandas()
        tot["geom_mean"] = np.exp(
            tot["s_ln"] / tot["n"]).round(4)
        tot["harm_mean"] = (tot["n"] / tot["s_inv"]).round(4)
        tot["n"] = tot["n"].astype(np.int64)
        out = tot.sort_values("o_orderstatus", ignore_index=True)
        return out[["o_orderstatus", "n", "geom_mean", "harm_mean"]]

    def user_sequence_entropy(sf_dir: str):
        # per-user Markov H(next|current) over event types in nats
        # (behavioral predictability); SQL twin via LAG bigram and
        # unigram counts
        ev = sf_table(sf_dir, "events",
                      ["user_id", "ts", "event_id", "event_type"])
        out = relational.markov_entropy(
            ev, "user_id", ["ts", "event_id"], "event_type",
            num_shards=32).to_pandas()
        out["entropy"] = out["entropy"].round(6)
        return out.sort_values("user_id", ignore_index=True)[
            ["user_id", "n_transitions", "entropy"]]

    def orders_benford_digits(sf_dir: str):
        # Benford first-digit audit of order prices: observed vs
        # log10(1+1/d) with per-digit chi-square contributions; SQL
        # twin computes the same digit extraction and expectations
        o = sf_table(sf_dir, "orders", ["o_totalprice"])
        out = relational.benford_first_digit(o, "o_totalprice")
        for c in ("frac", "benford_p", "chi2_part"):
            out[c] = out[c].round(6)
        return out

    def acctbal_mad_by_segment(sf_dir: str):
        # robust spread: per-segment median + MAD of account balance
        # (quantile_cont convention on both levels); SQL twin uses
        # MEDIAN twice with a join on the per-group median
        c = sf_table(sf_dir, "customer",
                     ["c_mktsegment", "c_acctbal"])
        out = relational.grouped_mad(c, "c_mktsegment", "c_acctbal")
        out["median"] = out["median"].round(4)
        out["mad"] = out["mad"].round(4)
        return out

    def nation_revenue_hhi(sf_dir: str):
        # market concentration: per-nation HHI of customer shares of
        # total account balance (clipped to positive); SQL twin sums
        # squared shares over the same member rollup
        c = sf_table(sf_dir, "customer",
                     ["c_nationkey", "c_custkey", "c_acctbal"])

        def pos(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["bal"] = np.maximum(
                b["c_acctbal"].to_numpy(np.float64), 0.0)
            return b[["c_nationkey", "c_custkey", "bal"]]

        out = relational.herfindahl_index(
            c.map_batches(pos, batch_format="pandas"),
            "c_nationkey", "c_custkey", "bal")
        out["total"] = out["total"].round(4)
        out["hhi"] = out["hhi"].round(6)
        return out

    def nation_acctbal_gini(sf_dir: str):
        # inequality audit: per-nation Gini of (clipped) customer
        # balances; SQL twin uses the ROW_NUMBER rank-weighted sum
        c = sf_table(sf_dir, "customer",
                     ["c_nationkey", "c_acctbal"])

        def pos(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["bal"] = np.maximum(
                b["c_acctbal"].to_numpy(np.float64), 0.0)
            return b[["c_nationkey", "bal"]]

        out = relational.grouped_gini(
            c.map_batches(pos, batch_format="pandas"),
            "c_nationkey", "bal", num_shards=16).to_pandas()
        out["gini"] = out["gini"].round(6)
        return out.sort_values("c_nationkey", ignore_index=True)[
            ["c_nationkey", "n", "gini"]]

    def user_burstiness(sf_dir: str):
        # Goh-Barabasi burstiness of per-user inter-event gaps in
        # epoch seconds; SQL twin via LAG(epoch(ts)) and the same
        # population sigma
        ev = sf_table(sf_dir, "events",
                      ["user_id", "ts", "event_id"])

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["ts_s"] = (b["ts"].astype("datetime64[ns]")
                         .astype("int64") / 1e9)
            return b[["user_id", "ts_s", "event_id"]]

        out = relational.burstiness(
            ev.map_batches(prep, batch_format="pandas"),
            "user_id", ["ts_s", "event_id"], "ts_s",
            num_shards=32).to_pandas()
        out["mean_gap"] = out["mean_gap"].round(6)
        out["burstiness"] = out["burstiness"].round(6)
        return out.sort_values("user_id", ignore_index=True)[
            ["user_id", "n_gaps", "mean_gap", "burstiness"]]

    def user_rfm_scores(sf_dir: str):
        # marketing-standard RFM segmentation: per-user recency /
        # frequency / monetary quintile scores from global ranks
        # with (metric, user) total-order tie-breaks; SQL twin =
        # ROW_NUMBER ranks over the same keys
        ev = sf_table(sf_dir, "events", ["user_id", "ts", "value"])

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": b["user_id"],
                "ts_us": (b["ts"].astype("datetime64[us]")
                          .astype("int64")),
                "value": b["value"]})

        return relational.rfm_scores(
            ev.map_batches(prep, batch_format="pandas"))

    def user_sessions(sf_dir: str):
        # gap-based sessionization (the 30-minute web-analytics rule):
        # a new session starts when the inter-event gap exceeds 1800s;
        # one co-shuffle by user then a segmented flag-cumsum pass.
        # Timestamps go through MICROsecond ints (exactly representable
        # in float64, unlike ns at epoch scale) so epoch(ts) in the
        # DuckDB twin reproduces them bit-for-bit and round(.,6) is the
        # identity on both sides.
        ev = sf_table(sf_dir, "events",
                      ["user_id", "ts", "event_id"])

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["ts_s"] = (b["ts"].astype("datetime64[us]")
                         .astype("int64") / 1e6)
            return b[["user_id", "ts_s", "event_id"]]

        out = relational.sessionize(
            ev.map_batches(prep, batch_format="pandas"),
            "user_id", "ts_s", ["event_id"], gap=1800.0,
            num_shards=32).to_pandas()
        for c in ("start_ts", "end_ts", "duration"):
            out[c] = out[c].round(6)
        return out.sort_values(
            ["user_id", "session_seq"], ignore_index=True)[
            ["user_id", "session_seq", "n_events",
             "start_ts", "end_ts", "duration"]]

    def price_weighted_median_by_flag(sf_dir: str):
        # quantity-weighted lower median of extended price per return
        # flag — the multiplicity-aware robust center; integer weights
        # keep every cumulative sum exact, so the >= crossing matches
        # the SQL window cumsum bit-for-bit
        li = sf_table(sf_dir, "lineitem",
                      ["l_returnflag", "l_extendedprice",
                       "l_quantity"])
        out = relational.weighted_median(
            li, "l_returnflag", "l_extendedprice",
            "l_quantity").to_pandas()
        out["total_w"] = out["total_w"].astype(np.int64)
        out["weighted_median"] = out["weighted_median"].round(4)
        return out.sort_values("l_returnflag", ignore_index=True)[
            ["l_returnflag", "total_w", "weighted_median"]]

    def qty_price_spearman_by_flag(sf_dir: str):
        # Spearman rank correlation (midrank ties) of quantity vs
        # price per return flag — the monotone-association companion
        # of the Pearson query; SQL twin builds the identical
        # midranks via RANK() + (ties-1)/2 and corr() over them
        li = sf_table(sf_dir, "lineitem",
                      ["l_returnflag", "l_quantity",
                       "l_extendedprice"])
        out = relational.spearman_corr(
            li, "l_returnflag", "l_quantity",
            "l_extendedprice").to_pandas()
        out["spearman"] = out["spearman"].round(4)
        return out.sort_values("l_returnflag", ignore_index=True)[
            ["l_returnflag", "n", "spearman"]]

    def qty_price_kendall_by_flag(sf_dir: str):
        # Kendall tau-b of quantity vs price (bucketed to $1000) per
        # return flag — the ordinal-association companion of the
        # Spearman query, computed from the per-group contingency
        # grid (2D prefix sums), never O(n^2) pairs; all counts are
        # exact integers, so the dense-grid window-cumsum twin
        # matches bit-for-bit
        li = sf_table(sf_dir, "lineitem",
                      ["l_returnflag", "l_quantity",
                       "l_extendedprice"])
        out = relational.kendall_tau_grid(
            li, "l_returnflag", "l_quantity", "l_extendedprice",
            y_div=1000.0)
        out["kendall_tau"] = out["kendall_tau"].round(6)
        return out.sort_values("l_returnflag", ignore_index=True)[
            ["l_returnflag", "n", "concordant", "discordant",
             "kendall_tau"]]

    def lineitem_ols_price_model(sf_dir: str):
        # per-flag two-regressor OLS price ~ quantity + discount via
        # moment sums -> 3x3 normal equations -> Cramer's rule;
        # discount/price lifted to exact integer cents so the moment
        # sums are exact and the determinant expansion is one shared
        # f64 expression tree on both sides
        li = sf_table(sf_dir, "lineitem",
                      ["l_returnflag", "l_quantity", "l_discount",
                       "l_extendedprice"])
        out = relational.ols2_by_group(
            li, "l_returnflag", "l_quantity", "l_discount",
            "l_extendedprice")
        for c in ["b0", "b1", "b2"]:
            out[c] = out[c].round(6)
        return out.sort_values("l_returnflag", ignore_index=True)[
            ["l_returnflag", "n", "b0", "b1", "b2"]]

    def order_priority_theil(sf_dir: str):
        # per-priority Theil T inequality of order values — the
        # additively-decomposable inequality companion of Gini; pure
        # moment combiner (n, sum x, sum x ln x), no sort
        o = sf_table(sf_dir, "orders",
                     ["o_orderpriority", "o_totalprice"])
        out = relational.theil_index(
            o, "o_orderpriority", "o_totalprice").to_pandas()
        out["theil"] = out["theil"].round(6)
        return out.sort_values("o_orderpriority", ignore_index=True)[
            ["o_orderpriority", "n", "theil"]]

    def event_value_trimmed_mean(sf_dir: str):
        # per-event-type 10% symmetric trimmed mean — the robust
        # location estimate between mean and median; segmented sort +
        # prefix-sum window per shard, tie-order-free by construction
        ev = sf_table(sf_dir, "events", ["event_type", "value"])
        out = relational.trimmed_mean(
            ev, "event_type", "value", trim_frac=0.1).to_pandas()
        out["trimmed_mean"] = out["trimmed_mean"].round(6)
        return out.sort_values("event_type", ignore_index=True)[
            ["event_type", "n", "n_kept", "trimmed_mean"]]

    def value_shape_by_event_type(sf_dir: str):
        # distribution-shape diagnostics: per-event-type population
        # skewness and excess kurtosis from one power-sum combiner;
        # SQL twin expands the same raw moments
        ev = sf_table(sf_dir, "events", ["event_type", "value"])
        out = relational.grouped_skew_kurt(
            ev, "event_type", "value").to_pandas()
        out["skewness"] = out["skewness"].round(6)
        out["excess_kurtosis"] = out["excess_kurtosis"].round(6)
        return out.sort_values("event_type", ignore_index=True)[
            ["event_type", "n", "skewness", "excess_kurtosis"]]

    def events_hourly_acf(sf_dir: str):
        # temporal self-similarity: lag-1 Pearson autocorrelation of
        # the per-hour event-count series (the rhythm detector);
        # counts come from a tiny combiner, the ACF runs on the
        # ~720-row series. SQL twin uses LEAD over the same buckets.
        ev = sf_table(sf_dir, "events", ["ts"])

        def hours(b: pd.DataFrame) -> pd.DataFrame:
            h = (b["ts"].astype("datetime64[ns]").astype("int64")
                 // 3_600_000_000_000)
            agg = pd.DataFrame({"hour": h}).groupby(
                "hour", as_index=False).size()
            agg = agg.rename(columns={"size": "n"})
            agg["n"] = agg["n"].astype(np.int64)
            return agg

        cnt = relational.sum_final(
            ev.map_batches(hours, batch_format="pandas"),
            ["hour"]).to_pandas().sort_values(
            "hour", ignore_index=True)
        x = cnt["n"].to_numpy(np.float64)
        a, b = x[:-1], x[1:]
        num = ((a - a.mean()) * (b - b.mean())).sum()
        den = np.sqrt(((a - a.mean()) ** 2).sum()
                      * ((b - b.mean()) ** 2).sum())
        return pd.DataFrame({
            "n_hours": np.asarray([len(x)], np.int64),
            "acf_lag1": np.asarray(
                [round(float(num / den), 6)], np.float64),
        })

    def supplier_activity_span(sf_dir: str):
        # per-supplier activity profile: distinct active ship months,
        # first/last month, net revenue, and revenue per active
        # month — one (supplier, month) combiner then a small
        # per-supplier rollup; SQL twin via strftime buckets
        li = sf_table(sf_dir, "lineitem",
                      ["l_suppkey", "l_shipdate", "l_extendedprice",
                       "l_discount"])

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            d = pd.to_datetime(b["l_shipdate"])
            b["month"] = (d.dt.year * 100 + d.dt.month).astype(
                np.int64)
            b["rev"] = (b["l_extendedprice"].to_numpy(np.float64)
                        * (1.0 - b["l_discount"].to_numpy(
                            np.float64)))
            return b[["l_suppkey", "month", "rev"]]

        per_month = relational.partial_groupby_sum(
            li.map_batches(prep, batch_format="pandas"),
            ["l_suppkey", "month"], {"rev": "rev"},
        ).to_pandas()
        agg = per_month.groupby("l_suppkey", as_index=False).agg(
            n_months=("month", "size"),
            first_month=("month", "min"),
            last_month=("month", "max"),
            revenue=("rev", "sum"))
        agg["n_months"] = agg["n_months"].astype(np.int64)
        agg["rev_per_month"] = (agg["revenue"]
                                / agg["n_months"]).round(4)
        agg["revenue"] = agg["revenue"].round(4)
        return agg.sort_values("l_suppkey", ignore_index=True)[
            ["l_suppkey", "n_months", "first_month", "last_month",
             "revenue", "rev_per_month"]]

    def docs_hapax_rate(sf_dir: str):
        # vocabulary freshness: per-doc share of token positions
        # whose token is corpus-unique; SQL twin joins tokens to the
        # vocab counts and averages the n=1 indicator
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        counts = text.unigram_counts(docs)
        out = text.hapax_rate(docs, counts).to_pandas()
        return out.sort_values("doc_id", ignore_index=True)[
            ["doc_id", "n_tokens", "hapax_rate"]]

    def geo_clark_evans(sf_dir: str):
        # point-pattern aggregation index R = mean NN distance over
        # the expected Poisson mean 0.5*sqrt(A/n) (R<1 clustered,
        # ~1 random, >1 dispersed) — composes the exact self-kNN
        # (k=1) with a scalar moment combiner; SQL twin takes the
        # all-pairs min haversine with identical area constants
        idx = _geo_indexed(columns=["image_id"])
        nn = geo_ops.self_knn_halo(idx, k=1, coarse_res=5,
                                   halo_rings=1)

        def mom(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "part": np.zeros(1, np.int64),
                "n": np.asarray([len(b)], np.int64),
                "s": np.asarray(
                    [b["dist_m"].to_numpy(np.float64).sum()],
                    np.float64),
            })

        tot = relational.sum_final(
            nn.map_batches(mom, batch_format="pandas"),
            ["part"]).to_pandas().iloc[0]
        n = int(tot["n"])
        mean_nn = float(tot["s"]) / n
        deg_m = 2.0 * np.pi * 6371008.8 / 360.0
        area = (24.0 * deg_m * np.cos(np.deg2rad(41.0))) \
            * (12.0 * deg_m)
        expected = 0.5 * np.sqrt(area / n)
        return pd.DataFrame({
            "n_points": np.asarray([n], np.int64),
            "mean_nn_m": np.asarray([round(mean_nn, 4)],
                                    np.float64),
            "clark_evans": np.asarray(
                [round(mean_nn / expected, 6)], np.float64),
        })

    def geo_nn_g_function(sf_dir: str):
        # G-function (nearest-neighbor distance CDF at 10/25/50 km):
        # the point-pattern companion of Ripley's K and Clark-Evans —
        # composes the exact self-kNN (k=1) with a 3-counter combiner;
        # SQL twin takes per-point all-pairs min haversine
        idx = _geo_indexed(columns=["image_id"])
        nn = geo_ops.self_knn_halo(idx, k=1, coarse_res=5,
                                   halo_rings=1)
        radii = [10e3, 25e3, 50e3]

        def cnt(b: pd.DataFrame) -> pd.DataFrame:
            d = b["dist_m"].to_numpy(np.float64)
            row = {"part": np.zeros(1, np.int64),
                   "n": np.asarray([len(d)], np.int64)}
            for i, r in enumerate(radii):
                row[f"c{i}"] = np.asarray([(d <= r).sum()], np.int64)
            return pd.DataFrame(row)

        tot = relational.sum_final(
            nn.map_batches(cnt, batch_format="pandas"),
            ["part"]).to_pandas().iloc[0]
        n = int(tot["n"])
        return pd.DataFrame({
            "r_m": np.asarray(radii, np.float64),
            "n_within": np.asarray(
                [int(tot[f"c{i}"]) for i in range(3)], np.int64),
            "g_frac": np.asarray(
                [round(int(tot[f"c{i}"]) / float(n), 6)
                 for i in range(3)], np.float64),
        })

    def docs_char_entropy(sf_dir: str):
        # per-doc codepoint entropy (gibberish/padding detector);
        # SQL twin groups per-character counts over a position spine
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return text.char_entropy(docs).select_columns(
            ["doc_id", "n_chars", "char_entropy"])

    def docs_script_profile(sf_dir: str):
        # per-doc Unicode class fractions (Latin / digit / whitespace
        # / CJK / other) — the script-mix curation signal; one
        # concatenated utf-32 view per batch, reduceat segment
        # counts; twin counts via regexp_replace removals
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return text.script_profile(docs).select_columns(
            ["doc_id", "n_chars", "latin_frac", "digit_frac",
             "ws_frac", "cjk_frac", "other_frac"])

    def docs_readability_lix(sf_dir: str):
        # LIX readability index (deterministic: no syllable
        # heuristics) — words/sentences + 100*long/words over the
        # same segmentation as docs_sentence_stats; SQL twin rebuilds
        # it with list_filter
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return text.readability_lix(docs).select_columns(
            ["doc_id", "n_words", "n_long_words", "lix"])

    def docs_zipf_fit(sf_dir: str):
        # corpus macro-statistics: least-squares slope of
        # ln(freq) ~ ln(rank) over the top-100 tokens (the Zipf
        # exponent, ~-1 for natural language); vocab counts come
        # from the distributed combiner, the 100-row fit is driver
        # arithmetic. SQL twin ranks with ROW_NUMBER and computes
        # the same closed-form slope.
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        counts = text.unigram_counts(docs)
        top = counts.sort_values(
            ["n", "token"], ascending=[False, True],
            kind="stable").head(100)
        r = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
        f = np.log(top["n"].to_numpy(np.float64))
        slope = (((r - r.mean()) * (f - f.mean())).sum()
                 / ((r - r.mean()) ** 2).sum())
        return pd.DataFrame({
            "n_tokens_fit": np.asarray([len(top)], np.int64),
            "zipf_slope": np.asarray([round(float(slope), 6)],
                                     np.float64),
            "top_freq": np.asarray([int(top["n"].iloc[0])],
                                   np.int64),
        })

    def docs_banned_terms(sf_dir: str):
        # multi-pattern content filter: Aho-Corasick automaton built
        # once per actor; occurrence counts brute-force pytest-oracled
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        terms = ["the quick", "lorem", "error", "click here", "qq"]
        out = text.flag_banned_terms(docs, terms)
        return out.select_columns(["doc_id", "banned", "n_banned_hits"])

    def docs_incremental_dedup(sf_dir: str):
        # day-2 ingestion: dedup a new batch against a durable bucketed
        # fingerprint index; cost scales with the batch, not the
        # corpus. SQL twin collapses day1-index + day2-replay into one
        # fingerprint GROUP BY (admitted = min-id doc of every
        # all-odd-ids fingerprint group)
        import shutil

        from engine.ops.dedup import incremental_dedup

        idx = "/tmp/graft_fpindex_demo"
        shutil.rmtree(idx, ignore_errors=True)
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])

        def day1(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["doc_id"] % 2 == 0]

        def day2(b: pd.DataFrame) -> pd.DataFrame:
            return b  # half are already indexed from day 1

        incremental_dedup(docs.map_batches(day1, batch_format="pandas"), idx)\
            .materialize()
        admitted = incremental_dedup(
            docs.map_batches(day2, batch_format="pandas"), idx
        )
        return admitted.select_columns(["doc_id"])

    def docs_containment_pairs(sf_dir: str):
        # asymmetric near-dup pairs: max-directional shingle
        # containment >= 0.5 over the non-ubiquitous (df <= 100)
        # 12-token shingle universe — catches a snippet quoted inside
        # a larger doc that whole-doc Jaccard scores near 0; SQL twin
        # replays the same df filter, triu pairs, and max ratio
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        out = dedup.containment_pairs(
            docs, ngram=12, threshold=0.5, max_df=100)
        out["containment"] = out["containment"].round(6)
        return out[["a", "b", "inter", "containment"]]

    def docs_ngram_span_dups(sf_dir: str):
        # cross-document duplicated 12-gram spans (substring-dedup
        # family); exactness pytest-oracled vs brute force
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return dedup.ngram_span_dups(docs, ngram=12)

    def orders_cube(sf_dir: str):
        # full CUBE (status x priority): ONE (s, p) combiner pass over
        # the rows; the three coarser grouping sets re-aggregate the
        # tiny cell table (never the rows) — the scale-right CUBE plan
        o = sf_table(sf_dir, "orders",
                     ["o_orderstatus", "o_orderpriority",
                      "o_totalprice"])
        cells = relational.partial_groupby_sum(
            o, ["o_orderstatus", "o_orderpriority"],
            {"o_totalprice": "total"}, count_as="n").to_pandas()
        by_s = cells.groupby("o_orderstatus", as_index=False)[
            ["total", "n"]].sum()
        by_s["o_orderpriority"] = "ALL"
        by_p = cells.groupby("o_orderpriority", as_index=False)[
            ["total", "n"]].sum()
        by_p["o_orderstatus"] = "ALL"
        top = pd.DataFrame({
            "o_orderstatus": ["ALL"], "o_orderpriority": ["ALL"],
            "total": [cells["total"].sum()],
            "n": [cells["n"].sum()]})
        out = pd.concat([cells, by_s, by_p, top], ignore_index=True)
        out["total"] = out["total"].round(2)
        out["n"] = out["n"].astype(np.int64)
        return out.sort_values(
            ["o_orderstatus", "o_orderpriority"],
            ignore_index=True)[
            ["o_orderstatus", "o_orderpriority", "total", "n"]]

    def orders_grouping_sets(sf_dir: str):
        # GROUPING SETS ((status), (priority)) — two independent
        # combiner aggregates of one scan, unioned; NULL slot = "ALL"
        o = sf_table(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
        by_s = relational.partial_groupby_sum(
            o, ["o_orderstatus"], {"o_totalprice": "total"}, count_as="n"
        ).to_pandas()
        by_s["o_orderpriority"] = "ALL"
        by_p = relational.partial_groupby_sum(
            o, ["o_orderpriority"], {"o_totalprice": "total"}, count_as="n"
        ).to_pandas()
        by_p["o_orderstatus"] = "ALL"
        out = pd.concat([by_s, by_p], ignore_index=True)
        out["total"] = out["total"].round(2)
        return out[["o_orderstatus", "o_orderpriority", "total", "n"]]

    def prepare_corpus_pipeline(sf_dir: str):
        # the text flagship: lang-id -> quality gate -> exact dedup ->
        # token counting -> token-budget packing, one streaming plan
        # (two exchanges total); determinism pytest-oracled
        from engine.pipeline.corpus import prepare_corpus

        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return prepare_corpus(docs, quality_min=0.3, pack_budget_tokens=4096)

    def corpus_to_shards_pipeline(sf_dir: str):
        # the COMPLETE text path: curate -> chunk -> encode -> pack ->
        # tar shards; returns the shard manifest (byte-identical
        # re-runs pytest-oracled)
        import shutil

        from engine.pipeline.corpus import corpus_to_shards

        out = "/tmp/graft_shards_demo"
        shutil.rmtree(out, ignore_errors=True)
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        man = corpus_to_shards(docs, out, shard_budget_bytes=1 << 20)
        return man[["shard_id", "rows", "bytes"]]

    def prepare_image_corpus_pipeline(sf_dir: str):
        # the multimodal flagship twin: key-projection phash dedup ->
        # resize -> deterministic augment; bytes never shuffle
        from engine.io import read_images
        from engine.pipeline.corpus import prepare_image_corpus

        ds = read_images(
            _geo_fixture_dir(), columns=["image_id", "bytes", "fmt", "phash"]
        )
        return prepare_image_corpus(ds, concurrency=(1, 4))

    def geo_radius_join(sf_dir: str):
        # ST_DWithin: images within 30km of any polygon centroid;
        # exactness vs brute-force haversine pytest-oracled
        from engine.ops.geo import polygon_centroids, radius_join

        idx = _geo_indexed(columns=["image_id"])
        cents = polygon_centroids(fixtures.polygons()).to_pandas()
        out = radius_join(
            idx.select_columns(["image_id", "lon", "lat"]),
            cents["admin_id"].to_numpy(),
            cents["centroid_lon"].to_numpy(),
            cents["centroid_lat"].to_numpy(),
            radius_m=30_000.0, concurrency=(1, 4),
        )
        return out

    def geo_article_fuzzy_match(sf_dir: str):
        # typo-tolerant title matching (edit distance <= 1) via the
        # SymSpell deletion-variant band index, broadcast once;
        # exactness pytest-oracled vs brute-force DP edit distance
        idx = _geo_indexed(columns=["image_id", "caption"])
        arts = fixtures.articles(_GEO_N)
        out = text.fuzzy_match_join(
            idx, arts["title_canon"], "caption_canon"
        )
        return out.select_columns(["image_id", "matched_title"])

    def geo_toponym_infer(sf_dir: str):
        # nuts4nuts analog (reference S3 fallback [PK]): infer a
        # location for articles from gazetteer mentions in their
        # summary text; leftmost-longest match at polygon centroid
        import ray.data as rd

        arts = rd.from_pandas(
            fixtures.articles(_GEO_N)[["article_id", "summary"]]
        ).repartition(2)
        return geo_ops.toponym_infer(arts, fixtures.polygons())

    def geo_josm_links(sf_dir: str):
        # reference phase-3 editor handoff [PK]: JOSM remote-control +
        # Overpass links for every matched image (broadcast title-set
        # semi-join keeps lon/lat, then vectorized string templating)
        import ray

        from engine.state import cached_get

        idx = _geo_indexed(columns=["image_id", "caption"])
        titles_ref = ray.put(set(fixtures.articles(_GEO_N)["title_canon"]))

        def semi(b: pd.DataFrame) -> pd.DataFrame:
            t = cached_get(titles_ref)
            return b.loc[b["caption_canon"].isin(t),
                         ["image_id", "lon", "lat"]]

        return geo_ops.josm_links(
            idx.map_batches(semi, batch_format="pandas")
        )

    def geo_pip_join(sf_dir: str):
        idx = _geo_indexed(columns=["image_id", "caption"])
        j = join.run_pip_join(idx, fixtures.polygons(), concurrency=(1, 4))
        return j.select_columns(["image_id", "admin_id", "level", "is_primary"])

    def geo_pip_join_from_osm_xml(sf_dir: str):
        # the reference's phase-1 OSM ingest seam: polygons arrive as
        # OSM XML (nodes/ways/boundary relations), parsed by the
        # streaming read_osm_xml source; join rows equal geo_pip_join
        # exactly (pytest-verified roundtrip)
        from engine.io import read_osm_xml

        xml_dir = _cached_dir(
            "/tmp/graft_osm_xml_fixture",
            lambda d: fixtures.polygons_to_osm_xml(
                fixtures.polygons(), os.path.join(d, "fixture.osm.xml")
            ),
        )
        poly = read_osm_xml(os.path.join(xml_dir, "fixture.osm.xml"))
        idx = _geo_indexed(columns=["image_id", "caption"])
        j = join.run_pip_join(idx, poly, concurrency=(1, 4))
        return j.select_columns(["image_id", "admin_id", "level", "is_primary"])

    def geo_pip_join_incremental(sf_dir: str):
        # the incremental-update loop's MERGE->join composition
        # (engine/pipeline/incremental.py is the partition-invalidating
        # flagship form, pytest-oracled): a deterministic changefile —
        # DELETE i%97==3, MOVE i%89==5 (lon+0.35, lat-0.20), INSERT 500
        # new ids past the corpus — applies via relational.merge_upserts
        # (one shuffle), then the standard broadcast PIP join runs over
        # the merged point set. The DuckDB twin applies the identical
        # rules to the regenerated lon/lat stream.
        import pyarrow as pa

        from engine.pipeline.join import build_polygon_set
        from engine.state import cached_get

        base = _geo_indexed(columns=["image_id"]).select_columns(
            ["image_id", "lon", "lat"])
        i = np.arange(_GEO_N, dtype=np.int64)
        del_m = (i % 97) == 3
        mv_i = i[((i % 89) == 5) & ~del_m]
        lon_m, lat_m = fixtures.row_lonlat(mv_i)
        ins_i = np.arange(_GEO_N, _GEO_N + 500, dtype=np.int64)
        lon_i, lat_i = fixtures.row_lonlat(ins_i)
        delta = pd.DataFrame({
            "image_id": [f"img{int(x):09d}" for x in
                         np.concatenate([i[del_m], mv_i, ins_i])],
            "lon": np.concatenate(
                [np.zeros(int(del_m.sum())), lon_m + 0.35, lon_i]),
            "lat": np.concatenate(
                [np.zeros(int(del_m.sum())), lat_m - 0.20, lat_i]),
            "__op": (["D"] * int(del_m.sum())
                     + ["U"] * (len(mv_i) + len(ins_i))),
        })
        merged = relational.merge_upserts(
            base, ray.data.from_pandas(delta), key="image_id")
        poly_ref = ray.put(build_polygon_set(fixtures.polygons()))

        def pip(batch: pa.Table) -> pa.Table:
            polys = cached_get(poly_ref)
            lon = np.asarray(batch["lon"], dtype=np.float64)
            lat = np.asarray(batch["lat"], dtype=np.float64)
            p_idx, g_idx = polys.contains_pairs(lon, lat)
            levels = polys.levels[g_idx]
            admin = polys.admin_ids[g_idx]
            order = np.lexsort((admin, levels, p_idx))
            ps, ls = p_idx[order], levels[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = (ps[1:] != ps[:-1]) | (ls[1:] != ls[:-1])
            is_primary = np.empty(len(order), dtype=bool)
            is_primary[order] = first
            take = pa.array(p_idx, pa.int64())
            return pa.table({
                "image_id": pa.compute.take(batch["image_id"], take),
                "admin_id": pa.array(admin, pa.string()),
                "level": pa.array(levels.astype(np.int32), pa.int32()),
                "is_primary": pa.array(is_primary),
            })

        return merged.map_batches(pip, batch_format="pyarrow")

    def geo_knn(sf_dir: str):
        from engine.pipeline.flagship import _poly_centroids

        idx = _geo_indexed(columns=["image_id"])
        out = join.run_knn(idx, _poly_centroids(fixtures.polygons()), k=5,
                           concurrency=(1, 4))

        def rnd(b: pd.DataFrame) -> pd.DataFrame:
            # micro-meter rounding so the DuckDB twin hash-compares
            # (ranks stay computed on unrounded distances)
            b["dist_m"] = b["dist_m"].round(6)
            return b

        return out.map_batches(rnd, batch_format="pandas")

    def geo_self_knn(sf_dir: str):
        idx = _geo_indexed(columns=["image_id"])
        return geo_ops.self_knn_halo(idx, k=3, coarse_res=5, halo_rings=1)

    def geo_join_counts(sf_dir: str):
        # do dense cells border dense cells: binary join-count
        # statistics (BB/WW/BW rook joins over occupied 1-deg cells,
        # black = count >= 6) vs nonfree-sampling expectations; cell
        # combiner + fixed-grid census; SQL twin self-joins the cell
        # table on rook adjacency
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.join_counts_grid(idx, thr=6)
        for c in ["e_bb", "e_ww", "e_bw"]:
            out[c] = out[c].round(6)
        return out

    def geo_density_gradient(sf_dir: str):
        # Theil-Sen robust slope of per-cell density vs distance from
        # the corpus mean center (outlier-immune sprawl gradient); the
        # pairwise-median fold runs over the CELL table (grid-bounded)
        idx = _geo_indexed(columns=["image_id"])
        return geo_ops.theil_sen_gradient(idx)

    def geo_cross_k(sf_dir: str):
        # bivariate Ripley K12 between the 'en' and 'it' caption-lang
        # point sets: does one language's coverage cluster around the
        # other's, at 3 scales (grid-cover pair counting, no all-pairs)
        import pyarrow.compute as pc

        idx = _geo_indexed(columns=["image_id", "caption"])

        def prep(t) -> pd.DataFrame:
            return pd.DataFrame({
                "cat": np.asarray(pc.utf8_slice_codeunits(
                    t["caption_canon"], 0, 2)).astype(object),
                "lon": np.asarray(t["lon"], np.float64),
                "lat": np.asarray(t["lat"], np.float64)})

        pts = idx.map_batches(prep, batch_format="pyarrow")
        return geo_ops.cross_k(
            pts, [100_000.0, 300_000.0, 600_000.0], "en", "it")

    def geo_colocation_quotient(sf_dir: str):
        # which caption languages cluster together: NN colocation
        # quotient over the 3 lang categories via the certified
        # halo self-kNN (k=1) + two hash co-shuffle label joins;
        # SQL twin argmins the all-pairs distances with the same
        # (dist, neighbor) tie-break
        import pyarrow.compute as pc

        idx = _geo_indexed(columns=["image_id", "caption"])

        def prep(t) -> pd.DataFrame:
            return pd.DataFrame({
                "image_id": t["image_id"].to_pandas(),
                "cat": np.asarray(pc.utf8_slice_codeunits(
                    t["caption_canon"], 0, 2)).astype(object),
                "lon": np.asarray(t["lon"], np.float64),
                "lat": np.asarray(t["lat"], np.float64)})

        pts = idx.map_batches(prep, batch_format="pyarrow")
        out = geo_ops.colocation_quotient(pts)
        out["clq"] = out["clq"].round(6)
        return out[["cat_a", "cat_b", "n_a", "n_b", "c_ab", "clq"]]

    def geo_tile_assignments(sf_dir: str):
        idx = _geo_indexed(columns=["image_id"])
        keyed = idx.map_batches(
            lambda b: tile.add_tile_keys(b, tile.DEFAULT_ZOOM), batch_format="pyarrow"
        )
        out = keyed.groupby("tile_key").aggregate(Count(alias_name="n_images"))
        return out

    def geo_tile_pyramid(sf_dir: str):
        # overzoom cascade: rendered z8 tiles -> z7/z6 parents, each
        # composed from <=4 children by 2x2 box-downsample (groupby on
        # parent tile_key); quadrant/count exactness pytest-oracled
        idx = _geo_indexed(columns=["image_id", "bytes", "fmt"])
        keyed = idx.map_batches(
            lambda b: tile.add_tile_keys(b, tile.DEFAULT_ZOOM),
            batch_format="pyarrow",
        ).map_batches(tile.thumb_decode_batch, batch_format="pyarrow")
        tiles = tile.run_tiling(keyed, zoom=tile.DEFAULT_ZOOM)
        pyr = tile.build_pyramid(tiles, zoom=tile.DEFAULT_ZOOM,
                                 min_zoom=tile.DEFAULT_ZOOM - 2)
        frames = []
        for z in sorted(pyr):
            if z == tile.DEFAULT_ZOOM:
                continue
            frames.append(
                pyr[z].select_columns(["z", "x", "y", "n_images"]).to_pandas()
            )
        out = pd.concat(frames, ignore_index=True)
        return out.sort_values(["z", "x", "y"], ignore_index=True)

    def geo_tile_compaction(sf_dir: str):
        # H3-compact analog on the slippy pyramid: minimal mixed-zoom
        # cover of the occupied z9 tiles (full quads collapse to
        # parents recursively, z9 down to z6); distributed keys-only
        # distinct + a grid-bounded driver fold; twin = per-level
        # HAVING COUNT(*)=4 CTEs + anti-joins
        idx = _geo_indexed(columns=["image_id"])
        return tile.compact_tiles(idx, zoom=9, min_zoom=6)

    def run_history_series(sf_dir: str):
        # S7/A6: per-run global stats appended to a history partition,
        # read back as a series (run_ts injected; deterministic)
        import shutil

        from engine.ops import history

        hdir = "/tmp/graft_history_demo"
        shutil.rmtree(hdir, ignore_errors=True)
        orders = sf_table(sf_dir, "orders", ["o_totalprice"])
        stats = history.global_stats(orders, ["o_totalprice"], decimals=2)
        for run_ts in ("2026-08-15", "2026-08-16", "2026-08-17"):
            history.append_run_stats(hdir, run_ts, stats)
        # idempotency: re-append of an existing run overwrites, not dupes
        history.append_run_stats(hdir, "2026-08-17", stats)
        return history.read_history(hdir)

    def geo_phash_verify(sf_dir: str):
        # M6: recompute phash from decoded pixels, verify vs the column
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(), columns=["image_id", "bytes", "fmt", "phash"])

        def f(b: pd.DataFrame) -> pd.DataFrame:
            vals = [
                codec.phash64(codec.decode(d, f_))
                for d, f_ in zip(b["bytes"], b["fmt"])
            ]
            b = b[["image_id", "phash"]].copy()
            b["phash_ok"] = np.asarray(vals, dtype=np.int64) == b["phash"].to_numpy()
            return b

        return ds.map_batches(f, batch_format="pandas", batch_size=512)

    def geo_polygon_centroids(sf_dir: str):
        return geo_ops.polygon_centroids(fixtures.polygons())

    def geo_admin_nearest_admin(sf_dir: str):
        # nearest neighboring admin by haversine centroid distance
        # (the adjacency/confusion map of the admin hierarchy); the
        # admin table is O(dozens) by construction, so the K x K fold
        # is driver math over the distributed shoelace centroids;
        # ties -> smaller admin_id (rows pre-sorted by admin_id)
        from engine.geo.knn import haversine_m

        cents = geo_ops.polygon_centroids(
            fixtures.polygons()).to_pandas().sort_values(
            "admin_id", ignore_index=True)
        lon = cents["centroid_lon"].to_numpy(np.float64)
        lat = cents["centroid_lat"].to_numpy(np.float64)
        d = haversine_m(lon[:, None], lat[:, None],
                        lon[None, :], lat[None, :])
        np.fill_diagonal(d, np.inf)
        d = np.round(d, 3)
        nn = d.argmin(axis=1)  # first occurrence = smallest admin_id
        return pd.DataFrame({
            "admin_id": cents["admin_id"],
            "level": cents["level"].astype(np.int64),
            "nearest_admin_id": cents["admin_id"].to_numpy()[nn],
            "dist_m": d[np.arange(len(nn)), nn]})

    def click_to_purchase_latency(sf_dir: str):
        # conversion-latency profile: per user, first purchase at or
        # after the first click; p50/p90/mean seconds over converting
        # users — one (user, min-click, min-purchase) combiner, then
        # the exact discrete quantiles on the latency column
        ev = sf_table(sf_dir, "events", ["user_id", "event_type", "ts"])
        big = np.iinfo(np.int64).max

        def per_user(b: pd.DataFrame) -> pd.DataFrame:
            m = b["event_type"].isin(["click", "purchase"])
            b = b[m]
            t = b["ts"].astype("datetime64[ns]").astype(np.int64)
            g = pd.DataFrame({
                "user_id": b["user_id"].to_numpy(np.int64),
                "fc": np.where(b["event_type"] == "click", t, big),
                "fp": np.where(b["event_type"] == "purchase", t, big)})
            return g.groupby("user_id", as_index=False).min()

        agg = relational.partial_groupby_agg(
            ev.map_batches(per_user, batch_format="pandas"),
            ["user_id"], {"fc": ("fc", "min"), "fp": ("fp", "min")})

        def lat(b: pd.DataFrame) -> pd.DataFrame:
            ok = (b["fc"] < big) & (b["fp"] < big) & (b["fp"] >= b["fc"])
            out = pd.DataFrame(
                {"lat": (b.loc[ok, "fp"].to_numpy(np.int64)
                         - b.loc[ok, "fc"].to_numpy(np.int64)) / 1e9})
            out["grp"] = np.int64(0)
            return out

        h = agg.map_batches(lat, batch_format="pandas").materialize()
        q = relational.grouped_quantile_disc(
            h, ["grp"], "lat", {0.5: "p50_s", 0.9: "p90_s"}
        ).to_pandas()
        stats = h.map_batches(
            lambda b: pd.DataFrame({"n": [len(b)],
                                    "s": [float(b["lat"].sum())]}),
            batch_format="pandas").to_pandas()
        n = int(stats["n"].sum())
        return pd.DataFrame({
            "n_users": np.array([n], np.int64),
            "p50_s": [round(float(q["p50_s"].iloc[0]), 6)],
            "p90_s": [round(float(q["p90_s"].iloc[0]), 6)],
            "mean_s": [round(float(stats["s"].sum()) / n, 6)]})

    def geo_polygon_areas(sf_dir: str):
        # shoelace area with hole subtraction; the SQL twin recomputes
        # per-ring cross products with LEAD/FIRST_VALUE windows over the
        # shared polygon_vertices parquet
        out = geo_ops.polygon_areas(fixtures.polygons()).to_pandas()
        out["area_deg2"] = out["area_deg2"].round(6)
        return out[["admin_id", "level", "area_deg2"]]

    def geo_admin_image_density(sf_dir: str):
        # per-admin image density (contained images / shoelace area):
        # composes the STRtree PIP join's per-admin counts with the
        # hole-subtracted polygon areas — the coverage-pressure map
        # that decides which regions need more acquisition
        idx = _geo_indexed(columns=["image_id", "caption"])
        j = join.run_pip_join(idx, fixtures.polygons(),
                              concurrency=(1, 4))
        cnt = relational.partial_groupby_sum(
            j, ["admin_id"], {}, count_as="n_images").to_pandas()
        areas = geo_ops.polygon_areas(
            fixtures.polygons()).to_pandas()
        out = areas.merge(cnt, on="admin_id", how="left")
        out["n_images"] = out["n_images"].fillna(0).astype(np.int64)
        a = out["area_deg2"].to_numpy(np.float64)
        out["density"] = np.round(
            out["n_images"].to_numpy(np.float64) / a, 6)
        out["area_deg2"] = out["area_deg2"].round(6)
        return out.sort_values("admin_id", ignore_index=True)[
            ["admin_id", "level", "area_deg2", "n_images", "density"]]

    def geo_idw_mpx_at_centroids(sf_dir: str):
        # IDW spatial interpolation: megapixel field sampled at the
        # polygon centroids from each centroid's 5 nearest images;
        # SQL twin ranks the full cross join by (haversine, image_id)
        idx = _geo_indexed(columns=["image_id", "w", "h"])

        def mpx(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            w = pc.cast(t["w"], pa.float64())
            h = pc.cast(t["h"], pa.float64())
            return t.append_column(
                "mpx", pc.divide(pc.multiply(w, h), 1e6))

        poly = fixtures.polygons()
        pts = pd.DataFrame({
            "poi_id": [str(a) for a in poly["admin_id"]],
            "lon": [r.mean() for r in poly["ring_lon"]],
            "lat": [r.mean() for r in poly["ring_lat"]],
        })
        out = geo_ops.idw_interpolate(
            idx.map_batches(mpx, batch_format="pyarrow"), pts, "mpx",
            k=5, power=2,
        ).to_pandas()
        out["idw_val"] = out["idw_val"].round(6)
        return out[["poi_id", "n_used", "idw_val"]]

    def geo_coverage_gaps(sf_dir: str):
        # spatial ANTI-join: images inside NO admin polygon; SQL twin
        # is the PIP CTE's complement (NOT IN over ghits)
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.coverage_gaps(idx, fixtures.polygons()).to_pandas()
        out["lon"] = out["lon"].round(6)
        out["lat"] = out["lat"].round(6)
        return out[["image_id", "lon", "lat"]]

    def geo_ring_perimeters(sf_dir: str):
        # ST_Perimeter over the shared polygon-vertices parquet (outer
        # ring + holes); SQL twin closes each ring with LEAD/FIRST_VALUE
        import ray.data

        _geo_aux_dir()
        verts = ray.data.read_parquet(_GEO_AUX_VERTICES)
        out = geo_ops.ring_perimeters(verts, num_shards=16).to_pandas()
        out["perimeter_m"] = out["perimeter_m"].round(4)
        return out[["admin_id", "level", "perimeter_m"]]

    def geo_polygon_convexity(sf_dir: str):
        # shape-compactness QA: outer-ring shoelace area over its
        # convex-hull area; SQL twin computes the hull with the
        # all-pairs strict-left hull-edge rule and the ring area
        # with the LEAD/FIRST_VALUE closure
        import ray.data

        _geo_aux_dir()
        verts = ray.data.read_parquet(_GEO_AUX_VERTICES)
        out = geo_ops.polygon_convexity(verts, num_shards=8
                                        ).to_pandas()
        for c in ("poly_area", "hull_area", "convexity"):
            out[c] = out[c].round(6)
        out = out.sort_values("admin_id", ignore_index=True)
        return out[["admin_id", "n_vertices", "poly_area",
                    "hull_area", "convexity"]]

    def geo_voronoi_assign(sf_dir: str):
        # nearest-site (Voronoi) classification of every image against
        # the polygon-centroid sites; per-site member count + mean dist
        idx = _geo_indexed(columns=["image_id"])
        poly = fixtures.polygons()
        sites = pd.DataFrame({
            "site_id": [str(a) for a in poly["admin_id"]],
            "lon": [r.mean() for r in poly["ring_lon"]],
            "lat": [r.mean() for r in poly["ring_lat"]],
        }).sort_values("site_id", ignore_index=True)
        out = geo_ops.voronoi_assign(idx, sites).to_pandas()
        out["mean_dist_m"] = out["mean_dist_m"].round(4)
        return out[["site_id", "n_points", "mean_dist_m"]]

    def geo_polygon_pruned_scan(sf_dir: str):
        # spatial predicate pushdown: images inside the first level-1
        # admin polygon, scanned off a cell-partitioned layout — only
        # the polygon's s2-cover dirs are read, then exact PIP filters;
        # SQL twin is the PIP CTE restricted to that admin_id
        from engine.io import write_cell_partitioned

        def pop(d: str) -> None:
            write_cell_partitioned(
                _geo_indexed(columns=["image_id"]), d, level=6)

        layout = _cached_dir("/tmp/graft_geo_cells_l6", pop)
        poly = fixtures.polygons()
        lvl1 = [i for i in range(len(poly["admin_id"]))
                if int(poly["level"][i]) == 1]
        j = min(lvl1, key=lambda i: str(poly["admin_id"][i]))
        out = geo_ops.polygon_scan(
            layout, poly["ring_lon"][j], poly["ring_lat"][j],
            holes=poly["holes"][j], columns=["image_id"],
        ).to_pandas()
        return out[["image_id"]]

    def _geo_tracked():
        # the fixture's points as 50 GPS tracks (track_id = i mod 50,
        # seq = i) — shared input of the trajectory-analytics queries
        idx = _geo_indexed(columns=["image_id"])

        def keyed(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            i = pc.cast(
                pc.utf8_slice_codeunits(t["image_id"], 3, 12),
                pa.int64())
            iv = i.combine_chunks().to_numpy() if isinstance(
                i, pa.ChunkedArray) else i.to_numpy()
            t = t.append_column(
                "track_id", pa.array(iv % 50, pa.int64()))
            return t.append_column("seq", pa.array(iv, pa.int64()))

        return idx.map_batches(keyed, batch_format="pyarrow")

    def geo_track_stats(sf_dir: str):
        # trajectory analytics: per track point count, polyline
        # length, net start->end displacement
        out = geo_ops.track_stats(
            _geo_tracked(), num_shards=16).to_pandas()
        out["track_m"] = out["track_m"].round(4)
        out["net_m"] = out["net_m"].round(4)
        return out[["track_id", "n_points", "track_m", "net_m"]]

    def geo_track_bearings(sf_dir: str):
        # circular bearing stats per track: mean resultant length of
        # the great-circle segment bearings + sinuosity; SQL twin
        # recomputes atan2 bearings via LAG windows
        out = geo_ops.track_bearings(
            _geo_tracked(), num_shards=16).to_pandas()
        out["bearing_concentration"] = (
            out["bearing_concentration"].round(4))
        out["sinuosity"] = out["sinuosity"].round(4)
        return out[["track_id", "n_segs", "bearing_concentration",
                    "sinuosity"]]

    def geo_boundary_crossings(sf_dir: str):
        # ST_Crosses event detection: per track, how many times do its
        # segments properly cross an admin boundary edge; exact integer
        # counts, oracled via orientation sign tests in a cross join
        out = geo_ops.boundary_crossings(
            _geo_tracked(), fixtures.polygons(), num_shards=16,
        ).to_pandas()
        return out[["track_id", "n_segs", "n_crossings"]]

    def geo_geofence_dwell(sf_dir: str):
        # geofence visit analytics: per (track, admin polygon), the
        # number of distinct visit episodes (maximal runs of
        # consecutive fixes inside) and total fix-dwell; SQL twin
        # reuses the ray-casting PIP CTE and finds episode starts by
        # probing the previous fix on the fixture's seq lattice
        # (prev seq = seq - 50 within a track)
        out = geo_ops.geofence_dwell(
            _geo_tracked(), fixtures.polygons(), num_shards=16,
        ).to_pandas()
        out = out.sort_values(
            ["track_id", "admin_id"], ignore_index=True)
        return out[["track_id", "admin_id", "level",
                    "n_episodes", "n_inside"]]

    def geo_track_hausdorff(sf_dir: str):
        # pairwise discrete Hausdorff distance between tracks with
        # overlapping bboxes (route similarity matrix); SQL twin
        # recomputes the bbox candidates and the max-of-directed
        # min distances over the fix cross product
        out = geo_ops.track_hausdorff(_geo_tracked()).to_pandas()
        out["hausdorff_m"] = out["hausdorff_m"].round(4)
        out = out.sort_values(["track_a", "track_b"],
                              ignore_index=True)
        return out[["track_a", "track_b", "hausdorff_m"]]

    def geo_track_frechet(sf_dir: str):
        # pairwise discrete Frechet distance between bbox-overlapping
        # tracks — the order-aware route-similarity metric (opposite
        # traversals are Hausdorff-equal but Frechet-far); SQL twin
        # walks the same coupling recurrence as an anti-diagonal
        # wavefront recursion over the per-pair distance matrix
        out = geo_ops.track_frechet(_geo_tracked()).to_pandas()
        out["frechet_m"] = out["frechet_m"].round(4)
        out = out.sort_values(["track_a", "track_b"],
                              ignore_index=True)
        return out[["track_a", "track_b", "frechet_m"]]

    def geo_track_sde(sf_dir: str):
        # per-track standard deviational ellipse (centrography's
        # grouped form): orientation + major/minor axes from the
        # closed-form 2x2 covariance eigenpair — moment combiner only,
        # no eigensolve; SQL twin expands the identical expressions
        pts = _geo_tracked()

        def mom(t):
            import pyarrow as pa

            lon = np.asarray(t["lon"], np.float64)
            lat = np.asarray(t["lat"], np.float64)
            return pa.table({
                "track_id": t["track_id"],
                "sx": pa.array(lon), "sy": pa.array(lat),
                "sxx": pa.array(lon * lon),
                "syy": pa.array(lat * lat),
                "sxy": pa.array(lon * lat),
            })

        agg = relational.partial_groupby_sum(
            pts.map_batches(mom, batch_format="pyarrow"),
            ["track_id"],
            {"sx": "sx", "sy": "sy", "sxx": "sxx", "syy": "syy",
             "sxy": "sxy"}, count_as="n").to_pandas()
        n = agg["n"].to_numpy(np.float64)
        mx = agg["sx"].to_numpy() / n
        my = agg["sy"].to_numpy() / n
        vx = agg["sxx"].to_numpy() / n - mx * mx
        vy = agg["syy"].to_numpy() / n - my * my
        cv = agg["sxy"].to_numpy() / n - mx * my
        theta = 0.5 * np.arctan2(2.0 * cv, vx - vy)
        half = 0.5 * (vx + vy)
        root = np.sqrt((0.5 * (vx - vy)) ** 2 + cv * cv)
        out = pd.DataFrame({
            "track_id": agg["track_id"],
            "n": agg["n"].astype(np.int64),
            "theta": np.round(theta, 6),
            "major_deg": np.round(
                np.sqrt(np.maximum(half + root, 0.0)), 6),
            "minor_deg": np.round(
                np.sqrt(np.maximum(half - root, 0.0)), 6),
        })
        return out.sort_values("track_id", ignore_index=True)

    def geo_track_dtw(sf_dir: str):
        # pairwise DTW between bbox-overlapping tracks — the elastic
        # sum-cost alignment (speed-variation-tolerant) companion of
        # Frechet's bottleneck max; SQL twin walks the identical
        # recurrence as an anti-diagonal wavefront recursion
        out = geo_ops.track_dtw(_geo_tracked()).to_pandas()
        out["dtw_m"] = out["dtw_m"].round(4)
        out = out.sort_values(["track_a", "track_b"],
                              ignore_index=True)
        return out[["track_a", "track_b", "dtw_m"]]

    def geo_track_lcss(sf_dir: str):
        # pairwise LCSS trajectory similarity between bbox-overlapping
        # tracks: longest common subsequence of fixes matched under a
        # 150 km haversine radius — the outlier-robust member of the
        # Frechet/DTW/LCSS trio (a single bad fix inflates DTW's sum
        # but costs LCSS at most one match); all-integer DP, so the
        # anti-diagonal wavefront SQL twin is exact
        out = geo_ops.track_lcss(_geo_tracked(), 150e3).to_pandas()
        out["sim"] = out["sim"].round(6)
        out = out.sort_values(["track_a", "track_b"],
                              ignore_index=True)
        return out[["track_a", "track_b", "lcss", "sim"]]

    def geo_ripley_k(sf_dir: str):
        # Ripley's K multi-scale point-pattern statistic: exact pair
        # counts within 100/300/600 km + pair fraction; grid-halo
        # owner-rule counting, no broadcast; SQL twin is the all-pairs
        # haversine count per radius
        pts = _geo_tracked().map_batches(
            lambda t: t.select(["seq", "lon", "lat"]).rename_columns(
                ["node", "lon", "lat"]),
            batch_format="pyarrow")
        out = geo_ops.ripley_k(
            pts, [100e3, 300e3, 600e3], max_abs_lat=50.0)
        out["pair_frac"] = out["pair_frac"].round(6)
        return out[["r_m", "n_pairs", "pair_frac"]]

    def geo_semivariogram(sf_dir: str):
        # empirical semivariogram of the per-image pixel count
        # (w*h, an exact integer) over 6 lags of 100 km — the
        # spatial-continuity curve that sizes IDW/kriging ranges;
        # same halo-grid owner-rule pair counting as ripley_k, twin
        # is the all-pairs haversine bin aggregate
        idx = _geo_indexed(columns=["image_id", "w", "h"])

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": b["image_id"].str.slice(3).astype(np.int64),
                "z": (b["w"].to_numpy(np.int64)
                      * b["h"].to_numpy(np.int64)),
                "lon": b["lon"], "lat": b["lat"]})

        pts = idx.map_batches(prep, batch_format="pandas")
        out = geo_ops.semivariogram(
            pts, bin_m=100e3, n_bins=6, max_abs_lat=50.0)
        out["gamma"] = out["gamma"].round(6)
        return out[["bin", "n_pairs", "gamma"]]

    def geo_knox_spacetime(sf_dir: str):
        # Knox space-time interaction test: pairs close in space
        # (<50 km), close in time (<=64 of 4096 hash-derived ticks),
        # and both, vs the permutation-null expectation — the classic
        # disease-cluster screen; space counts via the grid-halo
        # owner rule, time margin via an O(T) value-count table; SQL
        # twin recomputes all margins from the all-pairs join
        idx = _geo_indexed(columns=["image_id"])

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            from engine import fixtures

            i = (b["image_id"].str.slice(3)
                 .astype(np.int64).to_numpy())
            t = (fixtures._hash_stream(i, 13)
                 % np.uint64(4096)).astype(np.int64)
            return pd.DataFrame({"node": i, "t": t,
                                 "lon": b["lon"], "lat": b["lat"]})

        pts = idx.map_batches(prep, batch_format="pandas")
        out = geo_ops.knox_spacetime(
            pts, radius_m=50e3, tau=64, t_domain=4096,
            max_abs_lat=50.0)
        out["expected"] = out["expected"].round(6)
        out["ratio"] = out["ratio"].round(6)
        return out[["n_pairs", "n_space", "n_time", "n_both",
                    "expected", "ratio"]]

    def geo_stay_points(sf_dir: str):
        # Li/Zheng stay-point extraction (20 km anchor radius, >= 5
        # fixes): the 5 hotspot-only tracks each collapse to one stay,
        # random-walk tracks produce none. The greedy anchor advance
        # is a pure function of position, so the SQL twin precomputes
        # each anchor's next-pointer and walks the chain with a
        # recursive CTE; brute-force pytest is the second oracle.
        out = geo_ops.stay_points(
            _geo_tracked(), dist_m=20000.0, min_fixes=5, num_shards=16,
        ).to_pandas()
        out["c_lon"] = out["c_lon"].round(6)
        out["c_lat"] = out["c_lat"].round(6)
        out = out.sort_values(["track_id", "stay_ix"],
                              ignore_index=True)
        return out[["track_id", "stay_ix", "start_seq", "end_seq",
                    "n_fixes", "c_lon", "c_lat"]]

    def geo_bearing_rose(sf_dir: str):
        # per-track compass rose: segment counts by 45-deg bearing
        # sector; SQL twin recomputes the identical atan2 bearing
        out = geo_ops.bearing_rose(
            _geo_tracked(), num_shards=16).to_pandas()
        out = out.sort_values(["track_id", "sector"],
                              ignore_index=True)
        return out[["track_id", "sector", "n_segs"]]

    def geo_track_self_x(sf_dir: str):
        # per-track proper self-intersection count over non-adjacent
        # segments (loop detection); SQL twin self-joins the segment
        # list with the same orientation sign tests
        out = geo_ops.track_self_intersections(
            _geo_tracked(), num_shards=16).to_pandas()
        out = out.sort_values("track_id", ignore_index=True)
        return out[["track_id", "n_segs", "n_self_x"]]

    def geo_line_density(sf_dir: str):
        # route-heatmap raster: per grid cell, how many track
        # segments intersect it (Liang-Barsky slab test); SQL twin
        # runs the identical slab interval test as a cross join
        # against the cell grid
        out = geo_ops.line_density_grid(
            _geo_tracked(), num_shards=16).to_pandas()
        out = out.sort_values(["gx", "gy"], ignore_index=True)
        return out[["gx", "gy", "n_segments"]]

    def geo_enclosing_circles(sf_dir: str):
        # per-track smallest enclosing circle (Welzl, planar deg).
        # The MEC is determined by <=3 support points, so the SQL
        # twin brute-forces all pair/triple support circles (tracks
        # are 30 fixes); pytest self-oracle additionally checks
        # containment + minimality.
        out = geo_ops.enclosing_circles(
            _geo_tracked(), num_shards=16).to_pandas()
        for c in ("c_lon", "c_lat", "radius_deg"):
            out[c] = out[c].round(6)
        out = out.sort_values("track_id", ignore_index=True)
        return out[["track_id", "n_fixes", "c_lon", "c_lat",
                    "radius_deg"]]

    def geo_flow_field(sf_dir: str):
        # per-cell mean displacement vector of segments starting in
        # the cell (movement flow raster); SQL twin recomputes LAG
        # displacements and cell floors
        out = geo_ops.flow_field_grid(
            _geo_tracked(), num_shards=16).to_pandas()
        out["mean_dlon"] = (out["sum_dlon"]
                            / out["n_segments"]).round(6)
        out["mean_dlat"] = (out["sum_dlat"]
                            / out["n_segments"]).round(6)
        out = out.sort_values(["gx", "gy"], ignore_index=True)
        return out[["gx", "gy", "n_segments",
                    "mean_dlon", "mean_dlat"]]

    def geo_visit_entropy(sf_dir: str):
        # per-cell Shannon entropy (nats) of fix counts over tracks
        # (visitor-diversity raster); SQL twin computes
        # -(sum p ln p) over the same (cell, track) counts
        out = geo_ops.visit_entropy_grid(_geo_tracked()).to_pandas()
        out["entropy"] = out["entropy"].round(6)
        out = out.sort_values(["gx", "gy"], ignore_index=True)
        return out[["gx", "gy", "n_tracks", "n_fixes", "entropy"]]

    def geo_turning_stats(sf_dir: str):
        # path tortuosity: per-track count/total/mean of absolute
        # consecutive-bearing turns wrapped to (-pi, pi]; SQL twin
        # uses the identical atan2 bearing and CASE wrap
        out = geo_ops.turning_stats(
            _geo_tracked(), num_shards=16).to_pandas()
        out["total_turn"] = out["total_turn"].round(6)
        out["mean_abs_turn"] = out["mean_abs_turn"].round(6)
        out = out.sort_values("track_id", ignore_index=True)
        return out[["track_id", "n_turns", "total_turn",
                    "mean_abs_turn"]]

    def geo_cross_track(sf_dir: str):
        # route deviation: per-track max/mean |cross-track distance|
        # of every fix from the start->end great circle; SQL twin
        # evaluates the same asin(sin d13 * sin(b13-b12)) formula
        out = geo_ops.cross_track_stats(
            _geo_tracked(), num_shards=16).to_pandas()
        out["max_xtd_m"] = out["max_xtd_m"].round(4)
        out["mean_xtd_m"] = out["mean_xtd_m"].round(4)
        out = out.sort_values("track_id", ignore_index=True)
        return out[["track_id", "n_fixes", "max_xtd_m",
                    "mean_xtd_m"]]

    def geo_coverage_fraction(sf_dir: str):
        # per-admin survey completeness: fraction of inside-center
        # 0.5-deg cells containing >= 1 image; SQL twin reuses the
        # ray-casting PIP CTE over the cell-center lattice
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.coverage_fraction(idx, fixtures.polygons())
        out["coverage"] = out["coverage"].round(6)
        return out[["admin_id", "level", "n_cells", "n_covered",
                    "coverage"]]

    def balanced_sample_events(sf_dir: str):
        # class-balanced downsampling: at most 50 events per type by
        # the deterministic splitmix64 hash order (same sample on any
        # cluster shape); SQL twin uses ROW_NUMBER over the identical
        # hash expression
        from engine.ops.sketch import _hash64

        ev = sf_table(sf_dir, "events",
                      ["event_id", "user_id", "event_type"])

        def add_u(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__u"] = _hash64(b["event_id"].to_numpy())
            return b

        out = relational.grouped_topk(
            ev.map_batches(add_u, batch_format="pandas"),
            "event_type", "__u", k=50, tie_col="event_id",
            rank_as=None, ascending=True,
        ).to_pandas()
        out = out.sort_values(["event_type", "event_id"],
                              ignore_index=True)
        return out[["event_type", "event_id", "user_id"]]

    def geo_st_pairs(sf_dir: str):
        # same-place-same-time co-occurrence: pairs within 50 km AND
        # 100 seq units (grid-halo owner rule, temporal mask in the
        # same pass); SQL twin is the all-pairs filtered cross join
        pts = _geo_tracked().map_batches(
            lambda t: t.select(["seq", "lon", "lat"]).rename_columns(
                ["node", "lon", "lat"]),
            batch_format="pyarrow")
        out = geo_ops.spatiotemporal_pairs(
            pts, radius_m=50e3, max_dt=100,
            max_abs_lat=50.0).to_pandas()
        out["dist_m"] = out["dist_m"].round(4)
        out = out.sort_values(["node_a", "node_b"],
                              ignore_index=True)
        return out[["node_a", "node_b", "dist_m"]]

    def geo_dead_reckoning(sf_dir: str):
        # constant-velocity baseline: per-track mean/max haversine
        # error of predicting each fix from the previous two; SQL
        # twin uses double LAG and the same extrapolation
        out = geo_ops.dead_reckoning_error(
            _geo_tracked(), num_shards=16).to_pandas()
        out["mean_err_m"] = out["mean_err_m"].round(4)
        out["max_err_m"] = out["max_err_m"].round(4)
        out = out.sort_values("track_id", ignore_index=True)
        return out[["track_id", "n_preds", "mean_err_m",
                    "max_err_m"]]

    def geo_spacetime_cube(sf_dir: str):
        # when is each place busiest: per-cell fix totals, occupied
        # seq-bucket count (width 150), and the peak bucket
        # (min-id tie-break); SQL twin via the same floors + argmax
        out = geo_ops.spacetime_cube(
            _geo_tracked(), t_bucket=150).to_pandas()
        out = out.sort_values(["gx", "gy"], ignore_index=True)
        return out[["gx", "gy", "n_fixes", "n_buckets",
                    "peak_bucket", "peak_n"]]

    def geo_mann_kendall_cells(sf_dir: str):
        # emerging-hotspot screen: per cell, Mann-Kendall trend of
        # the fix-count series over 24 dense seq buckets (S, tie-
        # corrected z); rollup combiner + per-cell map_groups; SQL
        # twin builds the dense domain with range() and the same
        # integer pair signs
        out = geo_ops.mann_kendall_cells(
            _geo_tracked(), n_buckets=24, n_total=_GEO_N)
        out["z"] = out["z"].round(6)
        return out[["gx", "gy", "n_fixes", "s", "z"]]

    def geo_theil_sen_cells(sf_dir: str):
        # robust-trend companion of the Mann-Kendall screen: per-cell
        # Theil-Sen (median pairwise) slope over the same 24 dense
        # seq buckets; both sides average the SAME two middle doubles
        # of the 276-slope multiset, so the twin is exact
        out = geo_ops.theil_sen_cells(
            _geo_tracked(), n_buckets=24, n_total=_GEO_N)
        out["sen_slope"] = out["sen_slope"].round(6)
        return out[["gx", "gy", "n_fixes", "sen_slope"]]

    def geo_quadrat_chi2(sf_dir: str):
        # quadrat-count CSR test over the fixed 24x12 grid (empties
        # included): chi2 in the exact-integer form (k*sum n_i^2 -
        # n^2)/n plus the variance-mean ratio; per-cell combiner,
        # occupied partials only
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.quadrat_chi2(idx)
        out["chi2"] = out["chi2"].round(6)
        out["vmr"] = out["vmr"].round(6)
        return out

    def geo_segregation_d(sf_dir: str):
        # Duncan index of dissimilarity between every caption-language
        # pair over the fixed grid, in the exact integer form
        # sum|a_i*B - b_i*A| / (2AB) — float sum order can't diverge;
        # one (cell, cat) combiner
        import pyarrow.compute as pc

        idx = _geo_indexed(columns=["image_id", "caption"])

        def prep(t) -> pd.DataFrame:
            return pd.DataFrame({
                "cat": np.asarray(pc.utf8_slice_codeunits(
                    t["caption_canon"], 0, 2)).astype(object),
                "lon": np.asarray(t["lon"], np.float64),
                "lat": np.asarray(t["lat"], np.float64)})

        pts = idx.map_batches(prep, batch_format="pyarrow")
        out = geo_ops.segregation_dissimilarity(pts)
        out["d_index"] = out["d_index"].round(6)
        return out

    def events_weekly_profile(sf_dir: str):
        # hour-of-week seasonality z-profile (dense 168 buckets, dow
        # 0 = Sunday): the anomalous-traffic-hour screen; bincount
        # combiner + exact integer moments over the fixed domain
        ev = sf_table(sf_dir, "events", ["ts"])
        out = relational.weekly_profile(ev)
        out["z"] = out["z"].round(6)
        return out

    def events_ab_conversion(sf_dir: str):
        # two-proportion z-test between the arms of a deterministic
        # splitmix64(user) & 1 experiment split (how real A/B
        # assignment works, reproducible on any cluster shape);
        # conversion = >=1 purchase event; one per-user co-shuffle,
        # then a 4-integer census drives the pooled-z expression
        # tree mirrored in the twin
        ev = sf_table(sf_dir, "events", ["user_id", "event_type"])
        out = relational.ab_conversion_ztest(ev)
        for c in ["p_a", "p_b", "z"]:
            out[c] = out[c].round(6)
        return out

    def orders_urgency_ttest(sf_dir: str):
        # Welch two-cohort comparison: URGENT vs non-URGENT order
        # prices, streaming moment combiner; SQL twin computes the
        # same sample variances, t, and Welch-Satterthwaite df
        o = sf_table(sf_dir, "orders",
                     ["o_orderpriority", "o_totalprice"])

        def fl(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["is_urgent"] = (
                b["o_orderpriority"] == "1-URGENT")
            return b[["o_totalprice", "is_urgent"]]

        out = relational.welch_ttest(
            o.map_batches(fl, batch_format="pandas"),
            "o_totalprice", "is_urgent")
        for c in ("mean_true", "mean_false", "t_stat", "welch_df"):
            out[c] = out[c].round(4)
        return out

    def orders_urgency_ranksum(sf_dir: str):
        # Mann-Whitney U (rank-sum, midrank ties, tie-corrected z):
        # the distribution-free companion of the Welch query over the
        # same cohorts; per-value combiner + range-bucket scan, no
        # global row sort. Exact half-integer arithmetic makes the
        # SQL twin's per-row rank sum land on identical floats.
        o = sf_table(sf_dir, "orders",
                     ["o_orderpriority", "o_totalprice"])

        def fl(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["is_urgent"] = (
                b["o_orderpriority"] == "1-URGENT")
            return b[["o_totalprice", "is_urgent"]]

        out = relational.mann_whitney_u(
            o.map_batches(fl, batch_format="pandas"),
            "o_totalprice", "is_urgent")
        out["u_stat"] = out["u_stat"].round(4)
        out["z_stat"] = out["z_stat"].round(4)
        return out

    def orders_priority_anova(sf_dir: str):
        # one-way ANOVA across ALL five order priorities — the
        # K-cohort generalization of the urgency t-test: one
        # streaming (n, sum, sumsq)-per-group combiner, closed-form
        # F + eta^2 mirrored as the identical SQL expression tree
        o = sf_table(sf_dir, "orders",
                     ["o_orderpriority", "o_totalprice"])
        out = relational.anova_oneway(
            o, "o_totalprice", "o_orderpriority")
        out["f_stat"] = out["f_stat"].round(4)
        out["eta_sq"] = out["eta_sq"].round(4)
        return out

    def orders_priority_kruskal(sf_dir: str):
        # Kruskal-Wallis H across the five priorities — rank-based
        # companion of the ANOVA (as ranksum is of the t-test);
        # per-value combiner + range-bucket midrank scan, no global
        # row sort; exact half-integer rank sums make the twin's
        # per-group rank_sum land on identical floats
        o = sf_table(sf_dir, "orders",
                     ["o_orderpriority", "o_totalprice"])
        out = relational.kruskal_wallis(
            o, "o_totalprice", "o_orderpriority")
        out = out.rename(columns={"grp": "o_orderpriority"})
        for c in ("mean_rank", "h_stat", "h_corrected"):
            out[c] = out[c].round(4)
        return out[["o_orderpriority", "n", "rank_sum",
                    "mean_rank", "h_stat", "h_corrected"]]

    def user_value_durbin_watson(sf_dir: str):
        # per-user Durbin-Watson over the (ts, event_id)-ordered
        # mean-centered value series: the lag-1 serial-correlation
        # screen (~2 iid, ->0 trending, ->4 oscillating); segmented
        # one-sort-per-shard kernel, LAG-window SQL twin
        ev = sf_table(sf_dir, "events",
                      ["user_id", "ts", "event_id", "value"])
        out = relational.durbin_watson(
            ev, "user_id", ["ts", "event_id"], "value",
            min_n=5).to_pandas()
        out["dw"] = out["dw"].round(4)
        return out.sort_values("user_id", ignore_index=True)[
            ["user_id", "n", "dw"]]

    def nation_spend_hhi(sf_dir: str):
        # Herfindahl-Hirschman concentration of customer spending
        # within each nation (1/n even -> 1 monopolized) — the
        # market-concentration screen; exact-cents lift, two combiner
        # exchanges, broadcast-once customer->nation side
        orders = sf_table(sf_dir, "orders",
                          ["o_custkey", "o_totalprice"])
        cust = sf_table(sf_dir, "customer",
                        ["c_custkey", "c_nationkey"])
        out = relational.hhi_by_group(orders, cust)
        out["hhi"] = out["hhi"].round(6)
        return out[["c_nationkey", "n_customers", "hhi"]]

    def price_pythagorean_means_by_flag(sf_dir: str):
        # per-returnflag geometric and harmonic means of extended
        # price (the AM >= GM >= HM trio; GM for ratio-like, HM for
        # rate-like columns) — one (n, sum ln, sum 1/x) combiner
        li = sf_table(sf_dir, "lineitem",
                      ["l_returnflag", "l_extendedprice"])
        out = relational.grouped_pythagorean_means(
            li, "l_returnflag", "l_extendedprice")
        out["geo_mean"] = out["geo_mean"].round(4)
        out["harm_mean"] = out["harm_mean"].round(4)
        return out[["l_returnflag", "n", "geo_mean", "harm_mean"]]

    def user_value_acf(sf_dir: str):
        # per-user correlogram at lags 1-3 over the (ts, event_id)-
        # ordered mean-centered value series: r_k = sum e_t e_{t-k}
        # / sum e_t^2 — generalizes user_value_durbin_watson's lag-1
        # screen (DW ~ 2 - 2 r_1) to a small spectrum per entity;
        # three-LAG window SQL twin, one row per (user, lag)
        ev = sf_table(sf_dir, "events",
                      ["user_id", "ts", "event_id", "value"])
        out = relational.acf_lags(
            ev, "user_id", ["ts", "event_id"], "value",
            max_lag=3, min_n=8).to_pandas()
        out["acf"] = out["acf"].round(4)
        return out.sort_values(["user_id", "lag"],
                               ignore_index=True)[
            ["user_id", "lag", "n", "acf"]]

    def user_value_perm_entropy(sf_dir: str):
        # per-user Bandt-Pompe order-3 permutation entropy of the
        # ordered value series, normalized by ln 6 — the model-free
        # complexity screen (~1 iid, ~0 monotone/periodic); ordinal
        # codes rebuilt from two LAGs + three comparisons in the twin
        ev = sf_table(sf_dir, "events",
                      ["user_id", "ts", "event_id", "value"])
        out = relational.permutation_entropy(
            ev, "user_id", ["ts", "event_id"], "value",
            min_n=8).to_pandas()
        out["perm_entropy"] = out["perm_entropy"].round(4)
        return out.sort_values("user_id", ignore_index=True)[
            ["user_id", "n_windows", "perm_entropy"]]

    def event_type_jsd_arms(sf_dir: str):
        # Jensen-Shannon divergence (nats) between the event-type
        # mixes of the two splitmix64(user)&1 experiment arms — the
        # composition-skew sanity check next to events_ab_conversion
        # (near 0 when randomization is healthy); one (arm, type)
        # count combiner, entropy fold on the driver
        ev = sf_table(sf_dir, "events", ["user_id", "event_type"])
        out = relational.js_divergence_arms(ev)
        out["jsd_nats"] = out["jsd_nats"].round(6)
        return out[["n_a", "n_b", "jsd_nats"]]

    def user_decayed_engagement(sf_dir: str):
        # recency-weighted engagement: per-user sum of
        # 2^(-(t_end - t)/7d) event weights (half-life 7 days) — the
        # leaderboard metric that forgets stale activity; one tiny
        # max-ts pass then a weighted-count combiner, identical
        # expression tree in the SQL twin
        ev = sf_table(sf_dir, "events", ["user_id", "ts"])

        def mx(b: pd.DataFrame) -> pd.DataFrame:
            t = (b["ts"].astype("datetime64[us]")
                 .astype("int64") / 1e6)
            return pd.DataFrame({"m": [t.max()]})

        cend = float(ev.map_batches(
            mx, batch_format="pandas").to_pandas()["m"].max())
        hl = 7.0 * 86400.0

        def wsum(b: pd.DataFrame) -> pd.DataFrame:
            t = (b["ts"].astype("datetime64[us]")
                 .astype("int64") / 1e6).to_numpy()
            g = pd.DataFrame({
                "user_id": b["user_id"].to_numpy(),
                "w": np.power(2.0, -(cend - t) / hl),
                "n": np.ones(len(b), np.int64)})
            return g.groupby("user_id", as_index=False,
                             sort=False).sum()

        out = relational.sum_final(
            ev.map_batches(wsum, batch_format="pandas"),
            ["user_id"]).to_pandas()
        out["w"] = out["w"].round(6)
        out["n"] = out["n"].astype(np.int64)
        return out.sort_values("user_id", ignore_index=True)[
            ["user_id", "n", "w"]].rename(
            columns={"w": "decayed_count"})

    def user_purchase_survival(sf_dir: str):
        # Kaplan-Meier time-to-first-purchase curve (hour buckets):
        # event = the user's first 'purchase' after their first event,
        # right-censored at the last event for never-purchasers. The
        # per-hour reduced table is O(span), never O(users); the
        # product is exp(cumsum(ln)) with a 1e-300 floor — the exact
        # tree of the SQL twin.
        ev = sf_table(sf_dir, "events",
                      ["user_id", "ts", "event_type"])

        def pl(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["ts_s"] = (b["ts"].astype("datetime64[us]")
                         .astype("int64") / 1e6)
            b["pp"] = np.where(b["event_type"] == "purchase",
                               b["ts_s"], np.nan)
            return b.groupby("user_id", as_index=False).agg(
                f=("ts_s", "min"), l=("ts_s", "max"),
                fp=("pp", "min"))

        partials = ev.map_batches(pl, batch_format="pandas")
        users = relational._sharded_by_key(
            partials, "user_id", 32).groupby("__shard").map_groups(
            lambda g: g.drop(columns="__shard").groupby(
                "user_id", as_index=False).agg(
                f=("f", "min"), l=("l", "max"), fp=("fp", "min")),
            batch_format="pandas")

        def derive(b: pd.DataFrame) -> pd.DataFrame:
            f = b["f"].to_numpy(np.float64)
            l = b["l"].to_numpy(np.float64)
            fp = b["fp"].to_numpy(np.float64)
            has = ~np.isnan(fp)
            end = np.where(has, fp, l)
            return pd.DataFrame({
                "hour": np.floor((end - f) / 3600.0).astype(np.int64),
                "ev": has.astype(np.int64)})

        out = relational.km_survival(
            users.map_batches(derive, batch_format="pandas"),
            "hour", "ev")
        out = out.rename(columns={"day": "hour"})
        out["survival"] = out["survival"].round(6)
        return out

    def event_type_dow_chi2(sf_dir: str):
        # chi-square independence of event type vs ISO weekday +
        # Cramér's V — the feature-informativeness screen; the
        # contingency combiner moves r*c cells, never rows. SQL twin
        # builds the same full grid (zero cells included) via a
        # cross-join spine.
        ev = sf_table(sf_dir, "events", ["event_type", "ts"])

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["dow"] = (b["ts"].dt.dayofweek + 1).astype(np.int64)
            return b[["event_type", "dow"]]

        out = relational.chi2_independence(
            ev.map_batches(prep, batch_format="pandas"),
            "event_type", "dow")
        out["chi2"] = out["chi2"].round(4)
        out["cramers_v"] = out["cramers_v"].round(6)
        return out

    def event_type_dow_mi(sf_dir: str):
        # mutual information I(type; ISO weekday) in nats + marginal
        # entropies + arithmetic-NMI — chi2's information-theoretic
        # companion (feature-selection / leakage screen); one (a, b)
        # count combiner, margins fold on the driver
        ev = sf_table(sf_dir, "events", ["event_type", "ts"])

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["dow"] = (b["ts"].dt.dayofweek + 1).astype(np.int64)
            return b[["event_type", "dow"]]

        return relational.mutual_information(
            ev.map_batches(prep, batch_format="pandas"),
            "event_type", "dow")

    def event_value_winsorized_mean(sf_dir: str):
        # per-type positional winsorized mean (10% fences):
        # trimmed_mean's keep-the-mass robust companion
        ev = sf_table(sf_dir, "events", ["event_type", "value"])
        out = relational.winsorized_mean(
            ev, "event_type", "value", trim_frac=0.1
        ).to_pandas().sort_values("event_type", ignore_index=True)
        out["winsorized_mean"] = out["winsorized_mean"].round(6)
        return out

    def customer_lorenz_deciles(sf_dir: str):
        # Lorenz concentration curve of order spend at population
        # deciles — the 10-point shape behind the Gini / Pareto
        # scalars; per-customer combiner totals, sorted decile fold
        orders = sf_table(sf_dir, "orders",
                          ["o_custkey", "o_totalprice"])
        return relational.lorenz_deciles(
            orders, "o_custkey", "o_totalprice")

    def orders_urgency_ks(sf_dir: str):
        # two-sample Kolmogorov-Smirnov distribution-drift statistic
        # over the same cohorts as the t-test / rank-sum pair; ECDF
        # differences are ratios of exact integer counts, so the SQL
        # window-cumsum twin lands on identical floats
        o = sf_table(sf_dir, "orders",
                     ["o_orderpriority", "o_totalprice"])

        def fl(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["is_urgent"] = (
                b["o_orderpriority"] == "1-URGENT")
            return b[["o_totalprice", "is_urgent"]]

        out = relational.ks_test_2samp(
            o.map_batches(fl, batch_format="pandas"),
            "o_totalprice", "is_urgent")
        out["ks_d"] = out["ks_d"].round(6)
        out["ks_stat"] = out["ks_stat"].round(6)
        return out

    def geo_cell_lang_share(sf_dir: str):
        # geo x text: per 1-deg cell, the dominant caption language
        # (mode with smallest-lang tie-break) and its share — the
        # localization map of a captioned-image corpus; SQL twin
        # rebuilds captions via gcanon and argmaxes with ROW_NUMBER
        import pyarrow as pa
        import pyarrow.compute as pc

        idx = _geo_indexed(columns=["image_id", "caption"])

        def cl(t: pa.Table) -> pa.Table:
            lon = np.asarray(t["lon"], np.float64)
            lat = np.asarray(t["lat"], np.float64)
            lang = pc.utf8_slice_codeunits(
                t["caption_canon"], 0, 2)
            df = pd.DataFrame({
                "gx": np.floor((lon - -12.0) / 1.0).astype(np.int64),
                "gy": np.floor((lat - 35.0) / 1.0).astype(np.int64),
                "lang": np.asarray(lang).astype(object),
            })
            df = df[(df["gx"] >= 0) & (df["gx"] < 24)
                    & (df["gy"] >= 0) & (df["gy"] < 12)]
            agg = df.groupby(["gx", "gy", "lang"], as_index=False,
                             sort=False).size()
            agg = agg.rename(columns={"size": "n"})
            agg["n"] = agg["n"].astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        counts = relational.sum_final(
            idx.map_batches(cl, batch_format="pyarrow"),
            ["gx", "gy", "lang"]).to_pandas()
        tot = counts.groupby(["gx", "gy"])["n"].transform("sum")
        counts["tot"] = tot
        counts = counts.sort_values(
            ["gx", "gy", "n", "lang"],
            ascending=[True, True, False, True], kind="stable")
        top = counts.groupby(["gx", "gy"], as_index=False).first()
        top["share"] = (top["n"] / top["tot"]).round(6)
        top = top.rename(columns={"lang": "top_lang",
                                  "tot": "n_images"})
        top["n_images"] = top["n_images"].astype(np.int64)
        return top[["gx", "gy", "n_images", "top_lang",
                    "share"]].sort_values(["gx", "gy"],
                                          ignore_index=True)

    def geo_admin_lang_share(sf_dir: str):
        # geo x text over polygons: per admin area, the dominant
        # caption language and its share of contained images; engine
        # composes the broadcast PIP with a (admin, lang) combiner,
        # the SQL twin joins the ray-cast PIP CTE with gcanon
        import pyarrow as pa
        import pyarrow.compute as pc

        from engine.pipeline.join import build_polygon_set
        from engine.state import cached_get

        idx = _geo_indexed(columns=["image_id", "caption"])
        import ray as _ray

        poly_ref = _ray.put(build_polygon_set(fixtures.polygons()))

        def combine(t: pa.Table) -> pa.Table:
            polys = cached_get(poly_ref)
            lon = np.asarray(t["lon"], np.float64)
            lat = np.asarray(t["lat"], np.float64)
            lang = np.asarray(pc.utf8_slice_codeunits(
                t["caption_canon"], 0, 2)).astype(object)
            p_idx, g_idx = polys.contains_pairs(lon, lat)
            df = pd.DataFrame({
                "admin_id": polys.admin_ids[g_idx].astype(str),
                "lang": lang[p_idx],
            })
            agg = df.groupby(["admin_id", "lang"], as_index=False,
                             sort=False).size()
            agg = agg.rename(columns={"size": "n"})
            agg["n"] = agg["n"].astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        counts = relational.sum_final(
            idx.map_batches(combine, batch_format="pyarrow"),
            ["admin_id", "lang"]).to_pandas()
        tot = counts.groupby("admin_id")["n"].transform("sum")
        counts["tot"] = tot
        counts = counts.sort_values(
            ["admin_id", "n", "lang"],
            ascending=[True, False, True], kind="stable")
        top = counts.groupby("admin_id", as_index=False).first()
        top["share"] = (top["n"] / top["tot"]).round(6)
        top = top.rename(columns={"lang": "top_lang",
                                  "tot": "n_images"})
        top["n_images"] = top["n_images"].astype(np.int64)
        return top[["admin_id", "n_images", "top_lang",
                    "share"]].sort_values("admin_id",
                                          ignore_index=True)

    def geo_track_home_cell(sf_dir: str):
        # per-track "home" detection: the modal 1-deg cell (min cell
        # id tie-break) and the share of the track's fixes spent
        # there; SQL twin argmaxes the same (track, cell) counts
        import pyarrow as pa

        def cells(t: pa.Table) -> pa.Table:
            lon = np.asarray(t["lon"], np.float64)
            lat = np.asarray(t["lat"], np.float64)
            tid = np.asarray(t["track_id"], np.int64)
            df = pd.DataFrame({
                "track_id": tid,
                "gx": np.floor((lon - -12.0) / 1.0).astype(np.int64),
                "gy": np.floor((lat - 35.0) / 1.0).astype(np.int64),
            })
            df = df[(df["gx"] >= 0) & (df["gx"] < 24)
                    & (df["gy"] >= 0) & (df["gy"] < 12)]
            agg = df.groupby(["track_id", "gx", "gy"],
                             as_index=False, sort=False).size()
            agg = agg.rename(columns={"size": "n"})
            agg["n"] = agg["n"].astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        counts = relational.sum_final(
            _geo_tracked().map_batches(cells,
                                       batch_format="pyarrow"),
            ["track_id", "gx", "gy"]).to_pandas()
        tot = counts.groupby("track_id")["n"].transform("sum")
        counts["tot"] = tot
        counts = counts.sort_values(
            ["track_id", "n", "gx", "gy"],
            ascending=[True, False, True, True], kind="stable")
        top = counts.groupby("track_id", as_index=False).first()
        top["home_share"] = (top["n"] / top["tot"]).round(6)
        top = top.rename(columns={"gx": "home_gx",
                                  "gy": "home_gy",
                                  "tot": "n_fixes"})
        top["n_fixes"] = top["n_fixes"].astype(np.int64)
        return top[["track_id", "n_fixes", "home_gx", "home_gy",
                    "home_share"]].sort_values("track_id",
                                               ignore_index=True)

    def geo_centrography(sf_dir: str):
        # centrographic summary of the point pattern: mean center,
        # standard distance (planar degrees), and the standard
        # deviational ellipse orientation 0.5*atan2(2*cov, vx - vy)
        # — one scalar moment combiner; SQL twin uses the identical
        # closed forms
        import pyarrow as pa

        idx = _geo_indexed(columns=["image_id"])

        def mom(t: pa.Table) -> pd.DataFrame:
            x = np.asarray(t["lon"], np.float64)
            y = np.asarray(t["lat"], np.float64)
            return pd.DataFrame({
                "part": np.zeros(1, np.int64),
                "n": np.asarray([len(x)], np.float64),
                "sx": np.asarray([x.sum()], np.float64),
                "sy": np.asarray([y.sum()], np.float64),
                "sxx": np.asarray([(x * x).sum()], np.float64),
                "syy": np.asarray([(y * y).sum()], np.float64),
                "sxy": np.asarray([(x * y).sum()], np.float64),
            })

        m = relational.sum_final(
            idx.map_batches(mom, batch_format="pyarrow"),
            ["part"]).to_pandas().iloc[0]
        n = m["n"]
        mx, my = m["sx"] / n, m["sy"] / n
        vx = m["sxx"] / n - mx * mx
        vy = m["syy"] / n - my * my
        cov = m["sxy"] / n - mx * my
        return pd.DataFrame({
            "n_points": np.asarray([int(n)], np.int64),
            "mean_lon": np.asarray([round(float(mx), 6)],
                                   np.float64),
            "mean_lat": np.asarray([round(float(my), 6)],
                                   np.float64),
            "std_dist_deg": np.asarray(
                [round(float(np.sqrt(vx + vy)), 6)], np.float64),
            "ellipse_theta": np.asarray(
                [round(float(0.5 * np.arctan2(2.0 * cov, vx - vy)),
                       6)], np.float64),
        })

    def embedding_participation_ratio(sf_dir: str):
        # intrinsic dimensionality: PCA participation ratio
        # (sum lambda)^2 / sum lambda^2 over ALL eigenvalues.
        # Non-SQL (eigendecomposition); builds on the pytest-oracled
        # embedding_pca moment machinery.
        from engine.ops import simsearch

        ds = sf_table(sf_dir, "embeddings", ["embedding"])
        out = simsearch.embedding_pca(ds, k=64)
        ev = out["eigval"].to_numpy(np.float64)
        pr = float(ev.sum() ** 2 / (ev * ev).sum())
        return pd.DataFrame({
            "n_components": np.asarray([len(ev)], np.int64),
            "participation_ratio": np.asarray([round(pr, 6)],
                                              np.float64),
        })

    def geo_simplify_tracks(sf_dir: str):
        # Douglas-Peucker track thinning summary (eps 0.5 deg).
        # DP's interval tree walks with a recursive CTE over a
        # precomputed per-interval argmax table, so it IS
        # SQL-expressible; the epsilon guarantee stays the pytest
        # self-oracle (test_simplify_tracks_epsilon_guarantee).
        out = geo_ops.simplify_tracks(
            _geo_tracked(), epsilon_deg=0.5, num_shards=16,
        ).to_pandas()
        out["max_dev_deg"] = out["max_dev_deg"].round(6)
        return out[["track_id", "n_in", "n_kept", "max_dev_deg"]]

    def geo_morans_i(sf_dir: str):
        # global spatial autocorrelation of per-cell image counts
        # (rook adjacency, binary weights) — strongly positive here
        # because of the planted hotspot; SQL twin recomputes counts,
        # deviations, and the neighbor-pair sums over the same grid
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.morans_i_grid(idx)
        out["moran_i"] = out["moran_i"].round(6)
        return out[["n_cells", "s0_pairs", "moran_i"]]

    def geo_geary_c(sf_dir: str):
        # global Geary's C (rook adjacency, binary weights) over the
        # same per-cell count grid as geo_morans_i — the squared-
        # difference companion, sensitive to LOCAL patchiness: C < 1
        # = clustering (the planted hotspot pushes it well below 1);
        # SQL twin recomputes the grid and the neighbor squared diffs
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.geary_c_grid(idx)
        out["geary_c"] = out["geary_c"].round(6)
        return out[["n_cells", "s0_pairs", "geary_c"]]

    def geo_getis_ord(sf_dir: str):
        # Getis-Ord Gi* local hotspot z-score per grid cell (rook +
        # self, binary weights) — the local counterpart of
        # geo_morans_i: the planted hotspot cell and its ring light
        # up with large positive z; SQL twin recomputes the grid,
        # neighbor sums, and the variance-normalized deviate
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.getis_ord_grid(idx)
        out["gi_z"] = out["gi_z"].round(6)
        return out[["gx", "gy", "n", "gi_z"]]

    def geo_local_morans(sf_dir: str):
        # Anselin local Moran's I (LISA) per grid cell (rook, binary
        # weights, no self) — which cells ARE the clusters: high-high
        # around the planted hotspot. The neighbor deviation sum is
        # kept as nbr_sum - xbar*w (raw counts are exact ints, so any
        # SQL aggregation order matches the engine's shift order);
        # the twin mirrors the rest of the expression tree verbatim
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.local_morans_grid(idx)
        out["local_i"] = out["local_i"].round(6)
        return out[["gx", "gy", "n", "local_i"]]

    def geo_quadtree_cells(sf_dir: str):
        # adaptive quadtree occupancy: split while count > 32, points
        # assigned the shallowest ancestor cell meeting the cap —
        # balanced spatial sharding over the skewed (hotspot-planted)
        # point set; all-integer, twin = per-depth rollup + CASE on
        # the ancestor chain
        idx = _geo_indexed(columns=["image_id"])
        return geo_ops.quadtree_leaves(idx)[["depth", "cx", "cy", "n"]]

    def geo_speed_outliers(sf_dir: str):
        # GPS spike detection: per-track implied speed between
        # consecutive fixes (meters per seq unit; the fixture's seq
        # is the clock) vs a 10 km/unit ceiling — hotspot-only
        # tracks are clean, random-walk tracks spike; SQL twin uses
        # LAG + the same haversine, gated on the LAG column
        out = geo_ops.speed_outliers(
            _geo_tracked(), max_speed=10000.0, num_shards=16,
        ).to_pandas()
        out["max_speed_mps"] = out["max_speed_mps"].round(4)
        return out[["track_id", "n_segs", "n_spikes", "max_speed_mps"]]

    def geo_resample_tracks(sf_dir: str):
        # equal-spacing GPS resampler: one interpolated fix every
        # 2000 km of path per track; SQL twin reproduces the
        # searchsorted boundary rule as an inequality join against a
        # range() ladder
        out = geo_ops.resample_tracks(
            _geo_tracked(), step_m=2_000_000.0, num_shards=16,
        ).to_pandas()
        out["lon"] = out["lon"].round(4)
        out["lat"] = out["lat"].round(4)
        return out[["track_id", "k", "lon", "lat"]]

    def geo_track_medoids(sf_dir: str):
        # representative point per track: the fix minimizing total
        # haversine distance to its trackmates ((sum, seq) tie-break);
        # SQL twin: all-pairs sum + ROW_NUMBER argmin
        out = geo_ops.track_medoids(
            _geo_tracked(), num_shards=16).to_pandas()
        out["sum_km"] = out["sum_km"].round(4)
        return out[["track_id", "medoid_seq", "sum_km"]]

    def geo_phash_spread(sf_dir: str):
        # duplicate-image geo-consistency: the fixture's planted exact
        # dups (i % 100 == 7 copies a source row's pixels => phash)
        # sit at independent uniform locations — report each dup
        # phash's copy count and max pairwise km
        idx = _geo_indexed(columns=["image_id", "phash"])
        out = geo_ops.phash_spread(idx, num_shards=16).to_pandas()
        out["max_km"] = out["max_km"].round(4)
        return out[["phash", "n", "max_km"]]

    def geo_trip_od_matrix(sf_dir: str):
        # origin-destination flow matrix: trips (same 800 km jump rule
        # as geo_trip_segments) counted from first-fix cell to
        # last-fix cell at H3-like res 4 (1-degree cells)
        out = geo_ops.trip_od_matrix(
            _geo_tracked(), jump_m=800_000.0, res=4, num_shards=16,
        ).to_pandas()
        return out[["o_cell", "d_cell", "n_trips"]]

    def geo_gravity_fit(sf_dir: str):
        # gravity-model fit over the OD flow matrix: ln(trips) ~ a +
        # b * ln(center distance) closed-form OLS across distinct-cell
        # pairs — the classic spatial-interaction decay estimate; the
        # distributed work is the OD matrix itself, the fold is a
        # 4-moment scalar over OD-pair-bounded rows
        from engine.geo import h3like
        from engine.geo.knn import haversine_m

        od = geo_ops.trip_od_matrix(
            _geo_tracked(), jump_m=800_000.0, res=4, num_shards=16,
        ).to_pandas()
        od = od[od["o_cell"] != od["d_cell"]]
        olon, olat = h3like.cell_center(od["o_cell"].to_numpy(np.uint64))
        dlon, dlat = h3like.cell_center(od["d_cell"].to_numpy(np.uint64))
        dist = haversine_m(olon, olat, dlon, dlat)
        x = np.log(dist)
        y = np.log(od["n_trips"].to_numpy(np.float64))
        n = len(x)
        sx, sy = x.sum(), y.sum()
        sxx, sxy, syy = (x * x).sum(), (x * y).sum(), (y * y).sum()
        dx = sxx - sx * sx / n
        dy = syy - sy * sy / n
        cov = sxy - sx * sy / n
        slope = cov / dx if dx > 0 else 0.0
        intercept = sy / n - slope * sx / n
        r2 = cov * cov / (dx * dy) if dx > 0 and dy > 0 else 0.0
        return pd.DataFrame({
            "n_pairs": [n], "slope": [round(float(slope), 6)],
            "intercept": [round(float(intercept), 6)],
            "r2": [round(float(r2), 6)]})

    def geo_trip_segments(sf_dir: str):
        # spatial sessionization: a track opens a new trip wherever
        # the inter-fix jump exceeds 800 km (the fixture hops the
        # whole region between uniform points, so trips vary); SQL
        # twin: LAG + conditional running SUM window
        out = geo_ops.trip_segments(
            _geo_tracked(), jump_m=800_000.0, num_shards=16,
        ).to_pandas()
        out["trip_m"] = out["trip_m"].round(4)
        return out[["track_id", "trip_ix", "n_points", "trip_m"]]

    def geo_cell_best_image(sf_dir: str):
        # mosaic-plan argmax: per H3-res5 cell the single best image
        # by pixel count (ties -> smallest image_id); classic grouped
        # top-1 with a per-batch combiner before the shuffle
        import pyarrow as pa
        import pyarrow.compute as pc

        idx = _geo_indexed(columns=["image_id", "w", "h"])

        def derive(t: pa.Table) -> pa.Table:
            w = pc.cast(t["w"], pa.int64())
            h = pc.cast(t["h"], pa.int64())
            return t.append_column("mpx_px", pc.multiply(w, h))

        ds = idx.map_batches(
            derive, batch_format="pyarrow"
        ).select_columns(["h3_r5", "image_id", "mpx_px"])
        out = relational.grouped_topk(
            ds, "h3_r5", "mpx_px", 1, "image_id", rank_as=None,
        ).to_pandas()
        return out[["h3_r5", "image_id", "mpx_px"]]

    def geo_track_hulls(sf_dir: str):
        # ST_ConvexHull per track: hull vertex count + shoelace area;
        # SQL twin detects hull edges via the all-pairs strict-left
        # rule (edge p->q is on the CCW hull iff every other point is
        # strictly left) and sums the same shoelace terms
        out = geo_ops.convex_hulls(
            _geo_tracked(), num_shards=16).to_pandas()
        out["hull_area"] = out["hull_area"].round(6)
        return out[["track_id", "n_hull", "hull_area"]]

    def geo_bbox_candidates(sf_dir: str):
        # filter stage of the filter-refine spatial join: image boxes
        # (point +- 0.01 deg) x admin outer-ring bboxes, both sides
        # streaming through the PBSM owner-cell grid join
        idx = _geo_indexed(columns=["image_id"])

        def boxify(b):
            import pandas as pd

            return pd.DataFrame({
                "id": b["image_id"],
                "minx": b["lon"] - 0.01, "maxx": b["lon"] + 0.01,
                "miny": b["lat"] - 0.01, "maxy": b["lat"] + 0.01,
            })

        poly = fixtures.polygons()
        pb = pd.DataFrame({
            "id": [str(a) for a in poly["admin_id"]],
            "minx": [float(np.min(x)) for x in poly["ring_lon"]],
            "maxx": [float(np.max(x)) for x in poly["ring_lon"]],
            "miny": [float(np.min(y)) for y in poly["ring_lat"]],
            "maxy": [float(np.max(y)) for y in poly["ring_lat"]],
        })
        out = geo_ops.bbox_overlap_join(
            idx.map_batches(boxify, batch_format="pandas"),
            ray.data.from_pandas(pb),
            cell_deg=1.0,
        ).to_pandas()
        out = out.rename(columns={"a_id": "image_id",
                                  "b_id": "admin_id"})
        return out[["image_id", "admin_id"]]

    def geo_dbscan_clusters(sf_dir: str):
        # density-based spatial clustering (DBSCAN, eps 2km, minPts 5):
        # the fixture's 10% planted hotspot condenses into one cluster,
        # the uniform background is noise; SQL twin recomputes the
        # eps-graph via a cross join and the components via a
        # recursive min-label CTE
        idx = _geo_indexed(columns=["image_id"])

        def keyed(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            i = pc.cast(
                pc.utf8_slice_codeunits(t["image_id"], 3, 12),
                pa.int64())
            return t.append_column("node", i)

        out = geo_ops.dbscan(
            idx.map_batches(keyed, batch_format="pyarrow"),
            eps_m=2000.0, min_pts=5,
        ).to_pandas()
        return out[["node", "cluster", "is_core"]]

    def geo_kde_heatmap(sf_dir: str):
        # gaussian kernel-density hotspot grid (24x12 one-degree
        # cells, h=1.5deg, equirect at cell latitude); combiner emits
        # 288 partial rows per block, nothing else moves
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.kde_heatmap(idx).to_pandas()
        out["density"] = out["density"].round(4)
        return out[["gx", "gy", "density"]]

    def geo_snap_to_boundary(sf_dir: str):
        # map-matching lite: snap every image point to the closest
        # admin-boundary segment (segment identity + projected point +
        # distance); SQL twin runs the same clamped projection over a
        # cross join with the ROW_NUMBER (d, admin, ring, vertex)
        # tie-break the pre-sorted engine argmin reproduces
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.snap_to_boundary(
            idx, fixtures.polygons()).to_pandas()
        out["snap_lon"] = out["snap_lon"].round(6)
        out["snap_lat"] = out["snap_lat"].round(6)
        out["dist_m"] = out["dist_m"].round(4)
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "seg_admin", "ring_ix", "vertex_ix",
             "snap_lon", "snap_lat", "dist_m"]]

    def geo_dist_to_boundary(sf_dir: str):
        # ST_Distance to the nearest polygon boundary edge (equirect
        # local projection, (d, admin_id) tie-break); SQL twin runs the
        # same clamped point-to-segment arithmetic over a cross join
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.dist_to_boundary(
            idx, fixtures.polygons()).to_pandas()
        out["dist_m"] = out["dist_m"].round(4)
        return out[["image_id", "boundary_admin", "dist_m"]]

    def geo_reverse_geocode(sf_dir: str):
        # deepest containing polygon + ancestor breadcrumb per image;
        # SQL twin: PIP CTE -> per-image argmax(level) -> bounded
        # depth-3 self-joins over the polygon meta parquet
        idx = _geo_indexed(columns=["image_id"])
        return geo_ops.reverse_geocode(idx, fixtures.polygons())

    def geo_zonal_image_stats(sf_dir: str):
        # zonal statistics: per-admin image count + total megapixels via
        # broadcast PIP containment + combiner — only |admins| partials
        # move; SQL twin composes the ray-cast PIP CTE with the dims
        # regeneration chain
        idx = _geo_indexed(columns=["image_id", "w", "h"])
        out = geo_ops.zonal_image_stats(
            idx, fixtures.polygons()
        ).to_pandas()
        out["sum_mpx"] = out["sum_mpx"].round(4)
        return out[["admin_id", "level", "n_images", "sum_mpx"]]

    def geo_cell_ring_density(sf_dir: str):
        # hex focal sum: per occupied res-5 cell, own count + ring-1
        # neighbor total (packed-id arithmetic scatter, one grouped sum)
        idx = _geo_indexed(columns=["image_id"])
        out = geo_ops.cell_ring_density(idx, res=5).to_pandas()
        return out[["h3_r5", "n", "ring1_n", "disk_n"]]

    def geo_vector_tiles(sf_dir: str):
        # vector half of raster<->vector tiling: admin polygons clipped
        # to z/x/y tile rects (Sutherland-Hodgman), per-tile net area;
        # SQL twin replays the four half-plane passes edge-for-edge;
        # area conservation is also pytest-oracled (test_geo_kernels)
        out = geo_ops.vector_tiles(fixtures.polygons(), zoom=8).to_pandas()
        out["area"] = out["area"].round(9)
        return (
            out[["tile_key", "z", "x", "y", "admin_id", "level",
                 "n_vertices", "area"]]
            .sort_values(["tile_key", "admin_id"], ignore_index=True)
        )

    def geo_admin_rollup(sf_dir: str):
        idx = _geo_indexed(columns=["image_id", "caption"])
        j = join.run_pip_join(idx, fixtures.polygons(), concurrency=(1, 4))
        return geo_ops.admin_rollup(j, fixtures.polygons())

    def geo_article_match(sf_dir: str):
        # J2 tag-equality join: canonical caption == article title
        idx = _geo_indexed(columns=["image_id", "caption"])
        return geo_ops.article_match(idx, fixtures.articles(_GEO_N))

    def geo_articles_untagged(sf_dir: str):
        # J3 anti side: the reference's "articles still to tag" list
        # (export columns only — the fixture's summary text feeds the
        # toponym query, not this list)
        idx = _geo_indexed(columns=["image_id", "caption"])
        return geo_ops.articles_untagged(idx, fixtures.articles(_GEO_N))[
            ["article_id", "title_canon", "theme", "lon", "lat"]
        ]

    def geo_suggestions(sf_dir: str):
        # the reference's suggestion lists: k nearest images for each
        # untagged geolocated article; exactness pytest-oracled
        idx = _geo_indexed(columns=["image_id", "caption"])
        out = geo_ops.suggestions(idx, fixtures.articles(_GEO_N), k=3)
        return out.to_pandas().sort_values(
            ["article_id", "rank"], ignore_index=True
        )

    def geo_vector_tiles_simplified(sf_dir: str):
        # per-zoom detail knob: Douglas-Peucker at 0.05 tile units
        # before the clip; SQL twin runs the closed-ring DP (two
        # recursive chord trees) then the same clip passes; deviation
        # bound also pytest-oracled
        out = geo_ops.vector_tiles(
            fixtures.polygons(), zoom=8, epsilon=0.05
        ).to_pandas()
        out["area"] = out["area"].round(9)
        return (
            out[["tile_key", "z", "x", "y", "admin_id", "level",
                 "n_vertices", "area"]]
            .sort_values(["tile_key", "admin_id"], ignore_index=True)
        )

    def geo_tile_boundary_masks(sf_dir: str):
        # vector->raster: each clipped boundary ring scanline-filled
        # into its tile mask; pixel area tracks the clipped vector area
        out = geo_ops.vector_tile_masks(fixtures.polygons(), zoom=8).to_pandas()
        out["area"] = out["area"].round(9)
        return out.sort_values(["tile_key", "admin_id"], ignore_index=True)

    def geo_area_tag_stats(sf_dir: str):
        # A2: per-admin-area located/tagged counts + percentage
        idx = _geo_indexed(columns=["image_id", "caption"])
        j = join.run_pip_join(idx, fixtures.polygons(), concurrency=(1, 4))
        return geo_ops.area_tag_stats(j, fixtures.articles(_GEO_N))

    def geo_area_export_rows(sf_dir: str):
        # reference phase-3 export content [PK]: one row per (admin
        # area, untagged geolocated article) — the rows behind the
        # per-area GPX/CSV files editors download
        idx = _geo_indexed(columns=["image_id", "caption"])
        return geo_ops.untagged_by_area(
            idx, fixtures.articles(_GEO_N), fixtures.polygons()
        )

    def geo_area_export_files(sf_dir: str):
        # GPX + per-area CSV sinks over the export rows (distributed
        # per-area write, atomic, byte-deterministic); returns the two
        # write manifests — crc32 doubles as the idempotency witness
        import ray.data as rd

        from engine import sinks

        idx = _geo_indexed(columns=["image_id", "caption"])
        rows = geo_ops.untagged_by_area(
            idx, fixtures.articles(_GEO_N), fixtures.polygons()
        )
        ds = rd.from_pandas(rows)
        g = sinks.write_gpx_per_area(
            ds, "/tmp/graft_export_gpx", area_col="admin_id",
            name_col="title_canon",
        )
        c = sinks.write_csv_per_area(
            ds, "/tmp/graft_export_csv", area_col="admin_id",
            columns=["article_id", "title_canon", "theme", "lon", "lat"],
            sort_by=["article_id"],
        )
        h = sinks.write_html_per_area(
            ds, "/tmp/graft_export_html", area_col="admin_id",
            columns=["article_id", "title_canon", "theme"],
        )
        g, c, h = (g.assign(kind="gpx"), c.assign(kind="csv"),
                   h.assign(kind="html"))
        out = pd.concat([g, c, h], ignore_index=True)
        return out[["kind", "area", "n_rows", "crc32"]].sort_values(
            ["kind", "area"], ignore_index=True
        )

    def geo_site_index(sf_dir: str):
        # cross-area site assembly (reference phase-3 index pages
        # [PK]): distributed per-THEME pages + a root index over the
        # per-area exports; returns the page manifest (crc32 dropped —
        # the SQL twin recomputes page/area/count from the same
        # untagged-by-area derivation; byte determinism is the pytest
        # oracle)
        import ray.data as rd

        from engine import sinks

        idx = _geo_indexed(columns=["image_id", "caption"])
        rows = geo_ops.untagged_by_area(
            idx, fixtures.articles(_GEO_N), fixtures.polygons()
        )
        man = sinks.assemble_site(
            rd.from_pandas(rows), "/tmp/graft_export_site"
        )
        return man[["page", "area", "n_rows"]]

    def geo_phash_near_dups(sf_dir: str):
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(), columns=["image_id", "phash"])
        return dedup.phash_near_dups(ds, max_hamming=6)

    def geo_dedup_phash(sf_dir: str):
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(), columns=["image_id", "phash"])
        return dedup.exact_dedup(ds, key="phash", order_col="image_id")

    def image_similar_topk(sf_dir: str):
        # image-axis similarity search composition: per-image feature
        # vector (actor-pool decode) -> exact cosine top-k against the
        # 5 smallest-id query images via the distributed top-k merge.
        # Corpus restricted to the lossless raw16 subset so the DuckDB
        # twin can regenerate the same 6-dim features from pixels
        # (image_resize narrowing precedent; the full-corpus op incl.
        # qdct stays pytest-oracled vs a numpy brute force)
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        feats = multimodal.image_features(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4))
        fcols = ["mean_r", "mean_g", "mean_b",
                 "lum_mean", "lum_std", "edge_energy"]

        def to_vec(b: pd.DataFrame) -> pd.DataFrame:
            v = np.stack([b[c].to_numpy(dtype=np.float64) for c in fcols],
                         axis=1)
            return pd.DataFrame({"vec_id": b["image_id"],
                                 "embedding": list(v)})

        corp = feats.map_batches(to_vec, batch_format="pandas").materialize()

        def first5(b: pd.DataFrame) -> pd.DataFrame:
            # string ids: per-block sort-head combiner, then the <= 5
            # survivors per block coalesce for the exact final prune
            return b.sort_values("vec_id", kind="stable").head(5)

        qdf = corp.map_batches(first5, batch_format="pandas") \
            .repartition(1).map_batches(
                first5, batch_format="pandas", batch_size=None
            ).to_pandas().sort_values("vec_id", ignore_index=True)
        res = simsearch.brute_force_topk(
            corp, np.stack(qdf["embedding"].to_numpy()), k=5,
        )
        res["query_vec_id"] = qdf["vec_id"].to_numpy()[
            res["query_ix"].to_numpy()]
        return res[["query_vec_id", "rank", "vec_id", "cos"]] \
            .sort_values(["query_vec_id", "rank"], ignore_index=True)

    def image_features(sf_dir: str):
        # per-image feature extraction over the lossless raw16 subset
        # (DuckDB twin regenerates pixels + gradients; see
        # image_pixel_histogram for the raw16 rationale)
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(), columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        return multimodal.image_features(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4))

    def image_pixel_histogram(sf_dir: str):
        # per-channel 16-bin pixel histogram over the LOSSLESS-codec
        # (raw16) subset: decode in the actor pool, merge = one 48-key
        # combiner. The raw16 restriction makes the DuckDB twin exact —
        # it regenerates the pixels from the fixture's splitmix chains
        # and must match the decode actor's output bit for bit (the
        # lossy-qdct corpus variant stays covered by the pytest decode
        # oracle in test_multimodal_dedup_ops).
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.pixel_histogram(
            ds.map_batches(raw_only, batch_format="pandas"),
            bins=16, concurrency=(1, 4)).to_pandas()
        return out.sort_values(["channel", "bin"], ignore_index=True)

    def embedding_pca_components(sf_dir: str):
        # distributed PCA: per-block Gram/moment partials -> driver
        # covariance eigh; top-8 eigenvalues + explained variance.
        # Non-SQL (eigendecomposition); pytest self-oracle vs a
        # single-process numpy covariance eigh.
        from engine.ops import simsearch

        ds = sf_table(sf_dir, "embeddings", ["embedding"])
        out = simsearch.embedding_pca(ds, k=8)
        out["eigval"] = out["eigval"].round(6)
        out["explained_var"] = out["explained_var"].round(6)
        return out

    def q18_large_volume_customers(sf_dir: str):
        # TPC-H Q18 (public spec, threshold 150): per-order quantity
        # combiner -> HAVING survivor set (a tiny fraction of orders,
        # so it broadcasts by construction) -> two broadcast joins ->
        # deterministic (totalprice desc, orderkey asc) top-100 via
        # the sort-head prune pair; the lineitem fact never shuffles
        li = sf_table(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        qty = relational.partial_groupby_sum(
            li, ["l_orderkey"], {"l_quantity": "sum_qty"})

        def gate(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["sum_qty"] > 150]

        big = qty.map_batches(gate, batch_format="pandas") \
            .to_pandas().rename(columns={"l_orderkey": "o_orderkey"})
        orders = sf_table(sf_dir, "orders",
                          ["o_orderkey", "o_custkey", "o_orderdate",
                           "o_totalprice"])
        j = relational.broadcast_hash_join(orders, big, on="o_orderkey")
        cust = sf_table(sf_dir, "customer",
                        ["c_custkey", "c_name"]).to_pandas().rename(
            columns={"c_custkey": "o_custkey"})
        j2 = relational.broadcast_hash_join(j, cust, on="o_custkey")

        def prune(b: pd.DataFrame) -> pd.DataFrame:
            return b.sort_values(
                ["o_totalprice", "o_orderkey"],
                ascending=[False, True], kind="stable").head(100)

        out = j2.map_batches(prune, batch_format="pandas") \
            .repartition(1).map_batches(
                prune, batch_format="pandas", batch_size=None
            ).to_pandas().reset_index(drop=True)
        return out[["c_name", "o_custkey", "o_orderkey",
                    "o_orderdate", "o_totalprice", "sum_qty"]]

    def embedding_label_centroid_sims(sf_dir: str):
        # pairwise cosine between label centroids (the class-confusion
        # structure map next to Fisher/silhouette); centroids fold
        # from the existing (label, dim) combiner partials, the K x K
        # matrix is driver math
        from engine.ops import simsearch

        cent = simsearch.embedding_centroid_by_label(
            sf_table(sf_dir, "embeddings", ["embedding", "label"]))
        labs = np.sort(cent["label"].unique())
        m = cent.pivot(index="label", columns="dim",
                       values="avg_val").loc[labs].to_numpy(np.float64)
        nrm = np.linalg.norm(m, axis=1)
        rows = []
        for i, a in enumerate(labs):
            for jx in range(i + 1, len(labs)):
                b = labs[jx]
                rows.append((a, b, round(
                    float(m[i] @ m[jx] / (nrm[i] * nrm[jx])), 6)))
        out = pd.DataFrame(rows,
                           columns=["label_a", "label_b", "cos"])
        ldt = cent["label"].dtype
        out["label_a"] = out["label_a"].astype(ldt)
        out["label_b"] = out["label_b"].astype(ldt)
        return out

    def event_gap_quantiles(sf_dir: str):
        # per-type p50/p90 of inter-event gaps within each user's
        # ordered stream of that type (cadence profile): one sharded
        # LAG pass over a composite (user, type) key, then the exact
        # grouped discrete quantiles; gap multisets are tie-order
        # invariant (differences of consecutive order statistics)
        ev = sf_table(sf_dir, "events",
                      ["event_id", "user_id", "event_type", "ts"])

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "__grp": b["user_id"].astype(np.int64).astype(str)
                + "|" + b["event_type"].astype(str),
                "event_type": b["event_type"],
                "event_id": b["event_id"].to_numpy(np.int64),
                "t": b["ts"].astype("datetime64[ns]").astype(np.int64)
                / 1e9})

        gaps = relational.lag_delta(
            ev.map_batches(prep, batch_format="pandas"),
            "__grp", ["t", "event_id"], "t", out="gap", fill=-1.0)

        def keep(b: pd.DataFrame) -> pd.DataFrame:
            return b.loc[b["gap"] >= 0, ["event_type", "gap"]]

        h = gaps.map_batches(keep, batch_format="pandas").materialize()
        q = relational.grouped_quantile_disc(
            h, ["event_type"], "gap",
            {0.5: "p50_gap_s", 0.9: "p90_gap_s"}).to_pandas()
        n = relational.partial_groupby_sum(
            h, ["event_type"], {}, count_as="n_gaps").to_pandas()
        out = n.merge(q, on="event_type").sort_values(
            "event_type", ignore_index=True)
        out["p50_gap_s"] = out["p50_gap_s"].round(6)
        out["p90_gap_s"] = out["p90_gap_s"].round(6)
        return out[["event_type", "n_gaps", "p50_gap_s", "p90_gap_s"]]

    def q6_forecast_revenue(sf_dir: str):
        # TPC-H Q6 (public spec): pure scan-filter-aggregate over the
        # fact table — one revenue partial per batch, zero shuffles;
        # the column-pruned read is the whole plan
        li = sf_table(sf_dir, "lineitem",
                      ["l_shipdate", "l_discount", "l_quantity",
                       "l_extendedprice"])

        def local(b: pd.DataFrame) -> pd.DataFrame:
            d = b["l_shipdate"].astype("datetime64[ns]")
            keep = ((d >= pd.Timestamp("1996-01-01"))
                    & (d < pd.Timestamp("1997-01-01"))
                    & (b["l_discount"] >= 0.05)
                    & (b["l_discount"] <= 0.07)
                    & (b["l_quantity"] < 24))
            return pd.DataFrame({
                "revenue": [float((b.loc[keep, "l_extendedprice"]
                                   * b.loc[keep, "l_discount"]).sum())],
                "n_rows": [int(keep.sum())]})

        p = li.map_batches(local, batch_format="pandas").to_pandas()
        return pd.DataFrame({
            "revenue": [round(float(p["revenue"].sum()), 4)],
            "n_rows": np.array([int(p["n_rows"].sum())], np.int64)})

    def q13_customer_distribution(sf_dir: str):
        # TPC-H Q13 (public spec, sans the comment-filter predicate
        # our synthetic orders lack): per-customer order counts via
        # one count combiner, LEFT join onto the customer universe
        # (zero-order customers count), then the distribution
        orders = sf_table(sf_dir, "orders", ["o_custkey"])
        cust = sf_table(sf_dir, "customer", ["c_custkey"])
        cnt = relational.partial_groupby_sum(
            orders.map_batches(
                lambda b: pd.DataFrame({"c_custkey": b["o_custkey"]}),
                batch_format="pandas"),
            ["c_custkey"], {}, count_as="c_count")
        j = relational.bucketed_join(cust, cnt, on="c_custkey",
                                     how="left_outer")

        def hist(b: pd.DataFrame) -> pd.DataFrame:
            c = b["c_count"].fillna(0).astype(np.int64)
            g = pd.DataFrame({"c_count": c}).groupby(
                "c_count", as_index=False).size().rename(
                columns={"size": "custdist"})
            g["custdist"] = g["custdist"].astype(np.int64)
            return g

        out = relational.sum_final(
            j.map_batches(hist, batch_format="pandas"),
            ["c_count"]).to_pandas()
        return out.sort_values(
            ["custdist", "c_count"], ascending=[False, False],
            ignore_index=True)

    def docs_heaps_fit(sf_dir: str):
        # Heaps'-law vocabulary-growth fit V(n) = k * n^beta (Heaps
        # 1978, public): per-token MIN doc_id (a min combiner — the
        # distributed formulation: vocab at checkpoint c = tokens
        # first seen at doc_id <= c), four doc-id-range checkpoints
        # at power-of-two fractions (exact in float on both sides),
        # then the closed-form least-squares fit in log space
        from engine.ops.text import _ALPHA_RE

        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])

        def tok_min(b: pd.DataFrame) -> pd.DataFrame:
            toks: list[str] = []
            ds_: list[int] = []
            for d, s in zip(b["doc_id"].to_numpy(np.int64),
                            b["text"].astype(str)):
                u = set(_ALPHA_RE.findall(s.lower()))
                toks.extend(u)
                ds_.extend([int(d)] * len(u))
            g = pd.DataFrame({"token": toks, "md": ds_})
            return g.groupby("token", as_index=False).min()

        md = relational.partial_groupby_agg(
            docs.map_batches(tok_min, batch_format="pandas"),
            ["token"], {"md": ("md", "min")}).materialize()
        lo = int(docs.min("doc_id"))
        hi = int(docs.max("doc_id"))
        thrs = [lo + (hi - lo) * f for f in (0.125, 0.25, 0.5, 1.0)]

        def cnt_thr(col):
            def f(b: pd.DataFrame) -> pd.DataFrame:
                x = b[col].to_numpy(np.float64)
                return pd.DataFrame({
                    "ckpt": np.arange(1, 5, dtype=np.int64),
                    "n": np.array([(x <= t).sum() for t in thrs],
                                  np.int64)})
            return f

        nd = relational.sum_final(
            docs.map_batches(cnt_thr("doc_id"),
                             batch_format="pandas"),
            ["ckpt"]).to_pandas().sort_values("ckpt")
        nv = relational.sum_final(
            md.map_batches(cnt_thr("md"), batch_format="pandas"),
            ["ckpt"]).to_pandas().sort_values("ckpt")
        lx = np.log(nd["n"].to_numpy(np.float64))
        ly = np.log(nv["n"].to_numpy(np.float64))
        beta = float(((lx * ly).mean() - lx.mean() * ly.mean())
                     / ((lx * lx).mean() - lx.mean() ** 2))
        ln_k = float(ly.mean() - beta * lx.mean())
        return pd.DataFrame({
            "ckpt": np.arange(1, 5, dtype=np.int64),
            "n_docs": nd["n"].to_numpy(np.int64),
            "vocab": nv["n"].to_numpy(np.int64),
            "beta": np.round([beta] * 4, 6),
            "ln_k": np.round([ln_k] * 4, 6)})

    def orders_lineitem_ri_audit(sf_dir: str):
        # referential-integrity audit of the two FK edges a pipeline
        # joins across: exact both-sides-big anti-joins count orphan
        # child rows, childless parents and duplicated parent keys
        li = sf_table(sf_dir, "lineitem", ["l_orderkey"])
        orders = sf_table(sf_dir, "orders",
                          ["o_orderkey", "o_custkey"])
        cust = sf_table(sf_dir, "customer", ["c_custkey"])
        a = relational.fk_audit(li, orders, "l_orderkey", "o_orderkey",
                                "lineitem->orders")
        b = relational.fk_audit(orders, cust, "o_custkey", "c_custkey",
                                "orders->customer")
        return pd.concat([a, b], ignore_index=True).sort_values(
            "fk", ignore_index=True)

    def embedding_fisher_ratio(sf_dir: str):
        # Fisher between/within variance ratio of the labeled corpus
        # (LDA criterion) — scalar separability audit from one pass of
        # (label, sum, count, sum-sq) moment partials
        from engine.ops import simsearch

        ds = sf_table(sf_dir, "embeddings", ["embedding", "label"])
        return simsearch.embedding_fisher_ratio(ds)

    def embedding_1nn_accuracy(sf_dir: str):
        # leave-self-out 1-NN label agreement over the 64 smallest-id
        # probes (cosine, (cos desc, id asc) ties) — the classic
        # embedding eval; probe matrix broadcasts, corpus streams
        from engine.ops import simsearch

        ds = sf_table(sf_dir, "embeddings",
                      ["vec_id", "embedding", "label"])
        return simsearch.embedding_1nn_accuracy(ds, n_probes=64)

    def embedding_cov_moments(sf_dir: str):
        # SQL-exact companion of embedding_pca_components (round-4
        # verdict item 2): tr(C^p) p=1..4 from the SAME distributed
        # (count, sum, Gram) partials that feed the eigensolve —
        # DuckDB reproduces them via long-form covariance matrix
        # products, so the distributed half of PCA is hash-checked;
        # only the driver-side d x d eigh stays pytest-oracled.
        from engine.ops import simsearch

        ds = sf_table(sf_dir, "embeddings", ["embedding"])
        return simsearch.embedding_cov_trace_moments(ds, powers=4)

    def image_sharpness(sf_dir: str):
        # focus scoring (variance of luminance Laplacian) in the
        # decode actor pool, over the lossless raw16 subset (DuckDB
        # twin rebuilds the Laplacian from regenerated pixels; the
        # blurred-copy ordering pytest still covers the op itself).
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_sharpness(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "sharpness"]]

    def image_patches(sf_dir: str):
        # ViT-style patch extraction (8x8 tiles, remainder cropped):
        # per-image patch count + encoded payload bytes. Non-SQL;
        # pytest verifies grid counts and byte-exact reconstruction.
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])
        patches = multimodal.patchify_images(
            ds, patch=8, concurrency=(1, 4))

        def pc(t):
            import pyarrow as pa

            df = pd.DataFrame({
                "image_id": np.asarray(t["image_id"]).astype(object),
                "nb": [len(b) for b in t["bytes"].to_pylist()],
            })
            agg = df.groupby("image_id", as_index=False).agg(
                n_patches=("nb", "size"), sum_bytes=("nb", "sum"))
            agg["n_patches"] = agg["n_patches"].astype(np.int64)
            agg["sum_bytes"] = agg["sum_bytes"].astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

        out = relational.sum_final(
            patches.map_batches(pc, batch_format="pyarrow"),
            ["image_id"]).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "n_patches", "sum_bytes"]]

    def image_entropy_contrast(sf_dir: str):
        # per-image Shannon entropy (16-bin, nats) + RMS contrast
        # over the lossless raw16 subset — the flat-image and
        # low-contrast curation filters; DuckDB twin regenerates the
        # pixels and recomputes both from exact integer sums
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_entropy_contrast(
            ds.map_batches(raw_only, batch_format="pandas"),
            bins=16, concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "entropy", "contrast"]]

    def image_fractal_dim(sf_dir: str):
        # box-counting fractal dimension of the brighter-than-average
        # pixel set over the lossless raw16 subset — the structural-
        # complexity curation screen next to entropy/GLCM; occupancy
        # is an all-integer comparison (s3 * n_pix > total), so the
        # pixel-regeneration twin thresholds identically
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_fractal_dim(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "n_occupied", "fractal_dim"]]

    def image_quadrant_asym(sf_dir: str):
        # per-image left-right / top-bottom luminance asymmetry
        # (middle row/col excluded on odd dims) over the raw16 subset
        # — the horizon/vignetting screen; exact integer channel sums
        # make the twin's AVG ratios bit-identical
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_quadrant_asymmetry(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "lr_asym", "tb_asym"]]

    def image_colorfulness(sf_dir: str):
        # Hasler-Süsstrunk colorfulness over the lossless raw16
        # subset — the monochrome-corpus filter; opponent-plane sums
        # are exact in float64 so the pixel-regeneration twin matches
        # bit-for-bit
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_colorfulness(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "colorfulness"]]

    def image_otsu_threshold(sf_dir: str):
        # per-image Otsu binarization threshold (channel 0) over the
        # lossless raw16 subset — the scan/mask curation filter; the
        # DuckDB twin regenerates the pixels and recomputes the
        # between-class variance from exact integer cumsums, argmax
        # tie-broken on the 6dp-rounded statistic (smallest t first)
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_otsu(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "threshold", "between_var", "fg_frac"]]

    def image_quantile_stretch(sf_dir: str):
        # per-image 2%/98% percentile contrast-stretch audit over the
        # lossless raw16 subset (explicit k-th-smallest rank rule);
        # clamp-sum is an exact integer, so the pixel-regeneration
        # twin matches through the one float division
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_quantile_stretch(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)

    def image_bitplane_entropy(sf_dir: str):
        # per-image bit-plane binary entropy (channel 0, raw16
        # subset): the bit-significance / compressibility profile;
        # p1 is an exact integer ratio, entropy rounded 6dp; twin
        # regenerates pixels and recomputes both per (image, bit)
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_bitplane_entropy(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values(["image_id", "bit"],
                               ignore_index=True)[
            ["image_id", "bit", "p1", "entropy"]]

    def image_neighbor_brighter(sf_dir: str):
        # LBP-style local-contrast census: per interior pixel the
        # count of strictly-brighter 8-neighbors, histogrammed 0..8
        # per image — pure integer comparisons, so the neighbor
        # self-join twin is bit-exact
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_neighbor_brighter(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values(["image_id", "n_brighter"],
                               ignore_index=True)[
            ["image_id", "n_brighter", "n_px"]]

    def image_grad_orient_hist(sf_dir: str):
        # HOG-lite gradient-octant histogram on interior pixels:
        # octants decided by ORDERED integer sign/magnitude rules
        # (no atan2), counts + exact integer sum of squared magnitude
        # per (image, octant); the SQL CASE runs the identical rules
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_grad_orient_hist(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values(["image_id", "octant"],
                               ignore_index=True)[
            ["image_id", "octant", "n_px", "sum_mag2"]]

    def image_glcm_texture(sf_dir: str):
        # per-image Haralick GLCM texture (8-level, dx=1 offset):
        # energy / contrast / homogeneity over the lossless raw16
        # subset — the texture-based curation features; all numerators
        # are exact integer sums (homogeneity scaled by lcm(1..8)=840)
        # so the pixel-regeneration twin matches bit-for-bit
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_glcm(
            ds.map_batches(raw_only, batch_format="pandas"),
            levels=8, concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "glcm_energy", "glcm_contrast",
             "glcm_homogeneity"]]

    def image_hu_moments(sf_dir: str):
        # per-image Hu moment invariants 1-4 (channel 0) over the
        # lossless raw16 subset — shape fingerprints for crop
        # bucketing; raw moments are exact integers and the twin
        # re-derives the invariants through the identical expression
        # tree (central -> normalized -> Hu), so floats match bitwise
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_hu_moments(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "hu1", "hu2", "hu3", "hu4"]]

    def image_run_length(sf_dir: str):
        # per-image horizontal run-length stats (channel 0 binarized
        # at 128) over the raw16 subset — compressibility / noisiness
        # proxy; all counts exact integers, twin via LAG within rows
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_run_length(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "n_runs", "fg_runs", "mean_run_len"]]

    def image_busiest_block(sf_dir: str):
        # per-image argmax-variance 8x8 block (channel 0, raw16
        # subset) — the detail-selecting patch sampler; exact integer
        # block sums, argmax tie-broken on the 6dp-rounded variance
        # then smallest (by, bx) on both sides
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_busiest_block(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "by", "bx", "block_var"]]

    def image_radial_profile(sf_dir: str):
        # per-image radial intensity profile (vignetting curve):
        # mean channel-0 intensity by integer radius bin from the
        # center, raw16 subset; doubled-coordinate integer radii keep
        # both sides exact (floor(sqrt(int))//2 is bit-stable)
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_radial_profile(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values(["image_id", "rbin"],
                               ignore_index=True)[
            ["image_id", "rbin", "mean_px", "n_px"]]

    def image_tenengrad(sf_dir: str):
        # per-image Tenengrad focus measure (Sobel gradient energy on
        # interior pixels of channel 0, raw16 subset) + strong-edge
        # fraction — the out-of-focus curation filter; gx/gy and the
        # energy sum are exact integers, twin = 8-offset weighted
        # self-join over the regenerated pixel grid
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_tenengrad(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "tenengrad", "edge_frac"]]

    def image_border_contrast(sf_dir: str):
        # letterbox / frame / vignette detector: border-ring mean vs
        # interior mean (channel 0, raw16 subset); exact integer sums,
        # two divisions mirrored in the twin
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_border_contrast(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "border_mean", "inner_mean",
             "border_contrast"]]

    def image_dominant_color(sf_dir: str):
        # per-image dominant 6-bit RGB-cube color code + its pixel
        # share (raw16 subset) — the palette/duotone curation signal;
        # mode tie-broken on the smallest code on both sides
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_dominant_color(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "color_code", "color_share"]]

    def image_equalize_audit(sf_dir: str):
        # histogram-equalization audit (channel 0, raw16 subset): the
        # standard integer eq mapping's output mean + distinct output
        # levels — the dynamic-range-recovery estimate; all-integer
        # until the one final division
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.image_equalize_audit(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out.sort_values("image_id", ignore_index=True)[
            ["image_id", "eq_mean", "eq_levels"]]

    def image_norm_moments(sf_dir: str):
        # per-channel mean/std normalization constants over the
        # LOSSLESS-codec (raw16) subset (exact moment combiner). The
        # raw16 restriction makes the DuckDB twin exact via splitmix
        # pixel regeneration (see image_pixel_histogram).
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.pixel_moments(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4))
        out["mean"] = out["mean"].round(6)
        out["std"] = out["std"].round(6)
        return out

    def image_patch_dup_pairs(sf_dir: str):
        # partial-duplicate image detection: pairs sharing byte-exact
        # 8x8 patches — the planted exact dups (i%100==7) surface
        # with full patch overlap. Non-SQL; pytest plants a shared
        # sub-block crop.
        from engine.io import read_images
        from engine.ops import dedup as dedup_ops

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])
        patches = multimodal.patchify_images(
            ds, patch=8, concurrency=(1, 4))
        out = dedup_ops.patch_hash_pairs(
            patches, num_shards=16).to_pandas()
        out = out.sort_values(["image_id_a", "image_id_b"],
                              ignore_index=True)
        return out[["image_id_a", "image_id_b", "n_shared"]]

    def image_augment(sf_dir: str):
        # deterministic augmentation over the LOSSLESS raw16 subset:
        # externally-planned hflip / rot90 / center-crop (plan =
        # splitmix stream 20 of the numeric id — the SQL-reproducible
        # planner form; the id-hash default stays pytest-oracled), then
        # a position-weighted pixel checksum of the augmented image.
        # The DuckDB twin regenerates the pixels, applies the SAME
        # coordinate transforms and must match the checksum bit for
        # bit. Full-corpus (qdct) byte exactness stays pytest-oracled.
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def plan(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["fmt"] == "raw16"].copy()
            i = b["image_id"].str[3:].astype(np.int64).to_numpy()
            h = fixtures._hash_stream(i, 20)
            b["plan_hflip"] = (h & np.uint64(1)).astype(bool)
            b["plan_rot90"] = ((h >> np.uint64(1))
                               % np.uint64(4)).astype(np.int64)
            b["plan_crop_ix"] = ((h >> np.uint64(3))
                                 % np.uint64(3)).astype(np.int64)
            return b

        out = multimodal.augment_images(
            ds.map_batches(plan, batch_format="pandas"),
            concurrency=(1, 4),
            param_cols=("plan_hflip", "plan_rot90", "plan_crop_ix"))

        def checksum(b: pd.DataFrame) -> pd.DataFrame:
            sums = np.empty(len(b), np.int64)
            for k, blob in enumerate(b["aug_bytes"]):
                px = codec.decode(blob).astype(np.int64).ravel()
                sums[k] = int((px * (1 + np.arange(px.size))).sum())
            b = b.copy()
            b["aug_checksum"] = sums
            return b[["image_id", "aug_w", "aug_h", "aug_hflip",
                      "aug_rot90", "aug_crop", "aug_checksum"]]

        res = out.map_batches(checksum, batch_format="pandas").to_pandas()
        return res.sort_values("image_id", ignore_index=True)

    def image_resize(sf_dir: str):
        # 8x8 area-mean thumbnail over the lossless raw16 subset with
        # a position-weighted pixel checksum; the DuckDB twin rebuilds
        # the integer-boundary box means from regenerated pixels
        # (half-even rounding reproduced). qdct byte exactness stays
        # pytest-oracled via the codec PSNR/thumb suites.
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.resize_images(
            ds.map_batches(raw_only, batch_format="pandas"),
            size=8, concurrency=(1, 4))

        def checksum(b: pd.DataFrame) -> pd.DataFrame:
            sums = np.empty(len(b), np.int64)
            for k, blob in enumerate(b["resized_bytes"]):
                px = codec.decode(blob).astype(np.int64).ravel()
                sums[k] = int((px * (1 + np.arange(px.size))).sum())
            b = b.copy()
            b["resized_checksum"] = sums
            return b[["image_id", "resized_w", "resized_h",
                      "resized_checksum"]]

        res = out.map_batches(checksum, batch_format="pandas").to_pandas()
        return res.sort_values("image_id", ignore_index=True)

    def image_color_cast(sf_dir: str):
        # white-balance / exposure QA over the lossless raw16 subset:
        # gray-world cast ratio + clipped-pixel fractions (the frame
        # drop screens); DuckDB twin recomputes from regenerated pixels
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        out = multimodal.channel_balance(
            ds.map_batches(raw_only, batch_format="pandas"),
            concurrency=(1, 4)).to_pandas()
        return out[["image_id", "cast_ratio", "clip_lo", "clip_hi"]] \
            .sort_values("image_id", ignore_index=True)

    def image_thumb_near_dups(sf_dir: str):
        # multimodal x simsearch composition: 8x8 RGB thumbnails of
        # the raw16 subset become 192-d vectors, then EXACT all-pairs
        # cosine >= 0.9995 finds visual near-duplicates (the exactness
        # baseline the phash/LSH families trade recall against)
        from engine.io import read_images
        from engine.ops.simsearch import all_pairs_cosine_exact

        ds = read_images(_geo_fixture_dir(),
                         columns=["image_id", "bytes", "fmt"])

        def raw_only(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["fmt"] == "raw16"]

        thumbs = multimodal.resize_images(
            ds.map_batches(raw_only, batch_format="pandas"),
            size=8, concurrency=(1, 4))

        def vecs(b: pd.DataFrame) -> pd.DataFrame:
            ids = b["image_id"].str[3:].astype(np.int64).to_numpy()
            embs = [codec.decode(blob).astype(np.float64).ravel()
                    for blob in b["resized_bytes"]]
            return pd.DataFrame({"vec_id": ids, "embedding": embs})

        emb = thumbs.map_batches(vecs, batch_format="pandas")
        return all_pairs_cosine_exact(emb, threshold=0.9995)

    def image_dims_by_fmt(sf_dir: str):
        # image-axis per-codec stats: count, mean dims, total megapixels.
        # Oracle regenerates w/h/fmt from splitmix64 streams 10-12 over
        # the dup source-row rule entirely in SQL — the strongest twin
        # form (proves the fixture streams AND the aggregate).
        import pyarrow as pa
        import pyarrow.compute as pc
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(), columns=["w", "h", "fmt"])

        def derive(t: pa.Table) -> pa.Table:
            w = pc.cast(t["w"], pa.float64())
            h = pc.cast(t["h"], pa.float64())
            return t.append_column(
                "mpx", pc.divide(pc.multiply(w, h), 1e6))

        out = relational.partial_groupby_sum_arrow(
            ds, ["fmt"], {"w": "sum_w", "h": "sum_h", "mpx": "sum_mpx"},
            count_as="n", derive=derive,
        ).to_pandas()
        out["avg_w"] = (out["sum_w"] / out["n"]).round(4)
        out["avg_h"] = (out["sum_h"] / out["n"]).round(4)
        out["sum_mpx"] = out["sum_mpx"].round(4)
        return out[["fmt", "n", "avg_w", "avg_h", "sum_mpx"]]

    def image_mpx_by_cell(sf_dir: str):
        # pixel-volume skew map: per-H3-res5-cell image count + total
        # megapixels (the quantity the tile codec stage actually pays
        # for). Geotags AND dims both regenerate in the SQL twin.
        import pyarrow as pa
        import pyarrow.compute as pc

        idx = _geo_indexed(columns=["image_id", "w", "h"])

        def derive(t: pa.Table) -> pa.Table:
            w = pc.cast(t["w"], pa.float64())
            h = pc.cast(t["h"], pa.float64())
            return t.append_column(
                "mpx", pc.divide(pc.multiply(w, h), 1e6))

        out = relational.partial_groupby_sum_arrow(
            idx, ["h3_r5"], {"mpx": "sum_mpx"}, count_as="n",
            derive=derive,
        ).to_pandas()
        out["sum_mpx"] = out["sum_mpx"].round(4)
        return out[["h3_r5", "n", "sum_mpx"]]

    def image_payload_bytes_by_fmt(sf_dir: str):
        # encoded payload budget per codec: total/avg blob bytes by fmt
        # (drives batch-size sizing for the decode actor pool). Oracle
        # reads the same parquet and recomputes with octet_length.
        import pyarrow as pa
        import pyarrow.compute as pc
        from engine.io import read_images

        ds = read_images(_geo_fixture_dir(), columns=["bytes", "fmt"])

        def derive(t: pa.Table) -> pa.Table:
            return t.append_column(
                "blen", pc.cast(pc.binary_length(t["bytes"]), pa.int64()))

        out = relational.partial_groupby_sum_arrow(
            ds, ["fmt"], {"blen": "total_bytes"}, count_as="n",
            derive=derive,
        ).to_pandas()
        out["avg_bytes"] = (out["total_bytes"] / out["n"]).round(4)
        return out[["fmt", "n", "total_bytes", "avg_bytes"]]

    def q3_shipping_priority(sf_dir: str):
        # TPC-H Q3 shape, composed from the engine's join primitives:
        # filtered dimension -> semi-join orders -> broadcast order
        # attrs into the lineitem scan -> combiner groupby -> top-10.
        # The big lineitem side never shuffles.
        cust = (
            sf_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
            .filter(expr="c_mktsegment == 'BUILDING'")
            .to_pandas()
            .rename(columns={"c_custkey": "o_custkey"})
        )
        orders = sf_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

        def fo(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["o_orderdate"] < pd.Timestamp("1995-03-15")].copy()
            b["o_orderdate"] = b["o_orderdate"].dt.strftime("%Y-%m-%d")
            return b

        small = (
            relational.semi_join(
                orders.map_batches(fo, batch_format="pandas"), cust, on="o_custkey"
            )
            .to_pandas()[["o_orderkey", "o_orderdate"]]
            .rename(columns={"o_orderkey": "l_orderkey"})
        )
        li = sf_table(
            sf_dir, "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )

        def fl(t):
            # Arrow-native filter + elementwise on the widest scan
            import pyarrow as pa
            import pyarrow.compute as pc

            t = t.filter(pc.greater(
                t["l_shipdate"], pa.scalar(pd.Timestamp("1995-03-15"))
            ))
            rev = pc.multiply(t["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0), t["l_discount"]))
            return t.select(["l_orderkey"]).append_column("rev", rev)

        joined = relational.broadcast_hash_join(
            li.map_batches(fl, batch_format="pyarrow"), small, on="l_orderkey"
        )
        out = relational.partial_groupby_sum(
            joined, ["l_orderkey", "o_orderdate"], {"rev": "revenue"}
        ).to_pandas()
        out["revenue"] = out["revenue"].round(4)
        out = out.sort_values(
            ["revenue", "l_orderkey"], ascending=[False, True], kind="stable"
        ).head(10)
        return out[["l_orderkey", "o_orderdate", "revenue"]]

    def supplier_part_pagerank(sf_dir: str):
        # PageRank over the supplier->part shipment digraph (distinct
        # lineitem edges): edges stream, rank table broadcast per
        # iteration; power-iteration exactness pytest-oracled
        from engine.ops.graph import pagerank

        li = sf_table(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

        def mk_edges(b: pd.DataFrame) -> pd.DataFrame:
            b = b.drop_duplicates()
            return pd.DataFrame({
                "src": b["l_suppkey"].to_numpy(),
                "dst": b["l_partkey"].to_numpy() + 10_000_000,  # disjoint ids
            })

        edges = relational.distinct(
            li.map_batches(mk_edges, batch_format="pandas"), ["src", "dst"]
        )
        out = pagerank(edges, damping=0.85, iters=8)
        out["rank"] = out["rank"].round(8)
        return out

    def supplier_part_sssp(sf_dir: str):
        # Bellman-Ford single-source shortest paths over the UNDIRECTED
        # supplier<->part co-shipment graph, weight = min l_quantity of
        # the (supplier, part) shipments; source = supplier 1. Dist
        # stays a Dataset end-to-end (one co-shuffle relax join + one
        # min-combiner per round); the SQL twin unrolls the rounds.
        from engine.ops.graph import sssp

        li = sf_table(sf_dir, "lineitem",
                      ["l_suppkey", "l_partkey", "l_quantity"])

        def mk_edges(b: pd.DataFrame) -> pd.DataFrame:
            s = b["l_suppkey"].to_numpy(np.int64)
            p = b["l_partkey"].to_numpy(np.int64) + 10_000_000
            w = b["l_quantity"].to_numpy(np.float64)
            g = pd.DataFrame({
                "src": np.concatenate([s, p]),
                "dst": np.concatenate([p, s]),
                "w": np.concatenate([w, w])})
            return g.groupby(["src", "dst"], as_index=False).min()

        edges = relational.partial_groupby_agg(
            li.map_batches(mk_edges, batch_format="pandas"),
            ["src", "dst"], {"w": ("w", "min")})
        return sssp(edges, source=1, rounds=4)

    def source_mix_weights(sf_dir: str):
        # domain-mixing weights (the LLaMA-style data-recipe step):
        # per-source char share vs a uniform target share -> sampling
        # weight = target/actual. One combiner pass; O(sources) rows.
        docs = sf_table(sf_dir, "documents", ["source", "n_chars"])
        agg = relational.partial_groupby_sum(
            docs, ["source"], {"n_chars": "sum_chars"},
            count_as="n_docs").to_pandas()
        total = float(agg["sum_chars"].sum())
        k = len(agg)
        agg["char_share"] = (agg["sum_chars"] / total).round(6)
        agg["weight"] = ((1.0 / k)
                         / (agg["sum_chars"] / total)).round(6)
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        agg["sum_chars"] = agg["sum_chars"].astype(np.int64)
        return agg[["source", "n_docs", "sum_chars", "char_share",
                    "weight"]].sort_values("source", ignore_index=True)

    def docs_epoch_multiplicity(sf_dir: str):
        # quality-tiered upsampling plan: per-doc epoch multiplicity
        # 3/2/1 by global quality terciles (quantile_cont thresholds)
        # — the deterministic "repeat good data" recipe step. Output:
        # per-tier doc counts + total expanded rows.
        from engine.ops.text import quality_score_batch

        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        scored = docs.map_batches(
            quality_score_batch, batch_format="pandas"
        ).select_columns(["doc_id", "quality"])
        qs = relational.grouped_quantile_cont(
            scored.map_batches(
                lambda b: b.assign(__g=0), batch_format="pandas"),
            ["__g"], "quality", {1 / 3: "t1", 2 / 3: "t2"}).to_pandas()
        t1, t2 = float(qs["t1"].iloc[0]), float(qs["t2"].iloc[0])

        def tier(b: pd.DataFrame) -> pd.DataFrame:
            q = b["quality"].to_numpy(np.float64)
            ep = np.where(q > t2, 3, np.where(q > t1, 2, 1))
            g = pd.DataFrame({"epochs": ep.astype(np.int64),
                              "n_docs": np.ones(len(b), np.int64),
                              "rows_out": ep.astype(np.int64)})
            return g.groupby("epochs", as_index=False, sort=False).sum()

        out = relational.sum_final(
            scored.map_batches(tier, batch_format="pandas"),
            ["epochs"]).to_pandas()
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["rows_out"] = out["rows_out"].astype(np.int64)
        return out.sort_values("epochs", ignore_index=True)

    def part_lpa_communities(sf_dir: str):
        # deterministic synchronous label propagation (3 rounds,
        # majority neighbor label, min-label ties) over the undirected
        # supplier<->part graph; output = community size per surviving
        # label — the cheap community pass before per-community
        # sampling of a link graph
        from engine.ops.graph import label_propagation

        li = sf_table(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

        def mk(b: pd.DataFrame) -> pd.DataFrame:
            b = b.drop_duplicates()
            s = b["l_suppkey"].to_numpy(np.int64)
            p = b["l_partkey"].to_numpy(np.int64) + 10_000_000
            return pd.DataFrame({
                "src": np.concatenate([s, p]),
                "dst": np.concatenate([p, s])})

        edges = relational.distinct(
            li.map_batches(mk, batch_format="pandas"), ["src", "dst"])
        lab = label_propagation(edges, rounds=3)
        g = lab.groupby("lab", as_index=False).size()
        out = pd.DataFrame({
            "label": g["lab"].astype(np.int64),
            "size": g["size"].astype(np.int64)})
        return out.sort_values("label", ignore_index=True)

    def docs_bpe_merges(sf_dir: str):
        # BPE tokenizer training over the corpus's word-frequency
        # table (the distributed fold; the merge loop is vocab-sized).
        # Non-SQL (iterative replace); reference-implementation pytest
        # is the oracle.
        from engine.ops.text import bpe_train

        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return bpe_train(docs, n_merges=8)

    def docs_bm25_topk(sf_dir: str):
        # Okapi BM25 relevance of every document against a fixed
        # query-term set (topic mining for curation); the twin
        # evaluates the identical Lucene-idf formula in SQL
        from engine.ops.text import bm25_topk

        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return bm25_topk(
            docs, ["merge", "vector", "window", "scan"], top_k=20)

    def embedding_label_silhouette(sf_dir: str):
        # centroid-silhouette clustering validation per label: two
        # combiner passes (per-label centroid partials; broadcast-
        # centroid scoring partials) — O(labels x dim) rows move
        from engine.ops.simsearch import label_silhouette

        emb = sf_table(sf_dir, "embeddings", ["embedding", "label"])
        return label_silhouette(emb)

    def q5_local_supplier_volume(sf_dir: str):
        # TPC-H Q5 composition: revenue shipped within one region's
        # nations (customer AND supplier in the same nation), one
        # year. Join plan: tiny dims (region x nation, supplier map)
        # broadcast; orders year-filtered then broadcast-joined to
        # customer; lineitem STREAMS through auto_join (stats-driven
        # pick broadcasts the filtered order side) — the fact table
        # never shuffles.
        from engine.state import cached_get

        reg = sf_table(sf_dir, "region", None).to_pandas()
        nat = sf_table(sf_dir, "nation", None).to_pandas()
        rk = int(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0])
        nat = nat[nat["n_regionkey"] == rk]
        nat_ids = set(nat["n_nationkey"].astype(int))
        cust = sf_table(sf_dir, "customer",
                        ["c_custkey", "c_nationkey"]).to_pandas()
        cust = cust[cust["c_nationkey"].isin(nat_ids)]
        orders = sf_table(sf_dir, "orders",
                          ["o_orderkey", "o_custkey", "o_orderdate"])

        def year(b: pd.DataFrame) -> pd.DataFrame:
            d = b["o_orderdate"].astype("datetime64[ns]")
            keep = (d >= pd.Timestamp("1996-01-01")) & \
                   (d < pd.Timestamp("1997-01-01"))
            return b.loc[keep, ["o_orderkey", "o_custkey"]]

        cust = cust.rename(columns={"c_custkey": "o_custkey"})
        # materialize before the count() gate: the gate executes the
        # plan, and without this the to_pandas()/co-shuffle branch
        # would recompute the year filter + join from scratch
        ordy = relational.broadcast_hash_join(
            orders.map_batches(year, batch_format="pandas"),
            cust, on="o_custkey").materialize()
        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_suppkey",
                       "l_extendedprice", "l_discount"])
        # attach supplier nation via broadcast map, then the equality
        # filter and one n_name combiner
        supp = sf_table(sf_dir, "supplier",
                        ["s_suppkey", "s_nationkey"]).to_pandas()
        sk = supp["s_suppkey"].to_numpy(np.int64)
        sv = supp["s_nationkey"].to_numpy(np.int64)
        so = np.argsort(sk, kind="stable")
        s_ref = ray.put((sk[so], sv[so]))
        nmap = dict(zip(nat["n_nationkey"].astype(int),
                        nat["n_name"].astype(str)))

        def score_common(b: pd.DataFrame,
                         cnat: np.ndarray) -> pd.DataFrame:
            skeys, snats = cached_get(s_ref)
            ls = b["l_suppkey"].to_numpy(np.int64)
            sidx = np.searchsorted(skeys, ls)
            shit = (sidx < len(skeys)) & \
                   (skeys[np.minimum(sidx, len(skeys) - 1)] == ls)
            same = shit & (snats[np.minimum(sidx, len(skeys) - 1)]
                           == cnat)
            if not same.any():
                return pd.DataFrame({
                    "n_name": pd.Series(dtype=str),
                    "revenue": pd.Series(dtype=np.float64)})
            b = b[same]
            rev = b["l_extendedprice"].to_numpy(np.float64) * \
                (1.0 - b["l_discount"].to_numpy(np.float64))
            g = pd.DataFrame({
                "n_name": [nmap[int(x)] for x in cnat[same]],
                "revenue": rev})
            return g.groupby("n_name", as_index=False, sort=False).sum()

        # the year+region-filtered order side broadcasts below the
        # gate (one ray.put, read per worker); above it the fact
        # table takes a hash co-shuffle join instead (J14's rule) —
        # identical semantics, no driver pull
        if ordy.count() <= 2_000_000:
            o_pdf = ordy.to_pandas()
            ok_ = o_pdf["o_orderkey"].to_numpy(np.int64)
            on_ = o_pdf["c_nationkey"].to_numpy(np.int64)
            oo = np.argsort(ok_, kind="stable")
            o_ref = ray.put((ok_[oo], on_[oo]))

            def score(b: pd.DataFrame) -> pd.DataFrame:
                okeys, onats = cached_get(o_ref)
                lo = b["l_orderkey"].to_numpy(np.int64)
                idx = np.searchsorted(okeys, lo)
                hit = (idx < len(okeys)) & \
                      (okeys[np.minimum(idx, len(okeys) - 1)] == lo)
                if not hit.any():
                    return pd.DataFrame({
                        "n_name": pd.Series(dtype=str),
                        "revenue": pd.Series(dtype=np.float64)})
                return score_common(b[hit], onats[idx[hit]])

            scored = li.map_batches(score, batch_format="pandas")
        else:
            keyed = ordy.map_batches(
                lambda b: b[["o_orderkey", "c_nationkey"]].rename(
                    columns={"o_orderkey": "l_orderkey"}),
                batch_format="pandas")
            j = relational.bucketed_join(li, keyed, on="l_orderkey")

            def score_j(b: pd.DataFrame) -> pd.DataFrame:
                if b.empty or "c_nationkey" not in b.columns:
                    return pd.DataFrame({
                        "n_name": pd.Series(dtype=str),
                        "revenue": pd.Series(dtype=np.float64)})
                return score_common(
                    b, b["c_nationkey"].to_numpy(np.int64))

            scored = j.map_batches(score_j, batch_format="pandas")
        out = relational.sum_final(scored, ["n_name"]).to_pandas()
        out["revenue"] = out["revenue"].round(4)
        return out.sort_values("n_name", ignore_index=True)

    def q10_returned_items(sf_dir: str):
        # TPC-H Q10 composition: top-20 customers by revenue lost to
        # returned items in one quarter — broadcast the quarter's
        # orders into the lineitem stream, per-customer combiner, tiny
        # final join to customer/nation names
        from engine.state import cached_get

        orders = sf_table(sf_dir, "orders",
                          ["o_orderkey", "o_custkey", "o_orderdate"])

        def quarter(b: pd.DataFrame) -> pd.DataFrame:
            d = b["o_orderdate"].astype("datetime64[ns]")
            keep = (d >= pd.Timestamp("1996-10-01")) & \
                   (d < pd.Timestamp("1997-01-01"))
            return b.loc[keep, ["o_orderkey", "o_custkey"]]

        o_pdf = orders.map_batches(
            quarter, batch_format="pandas").to_pandas()
        ok_ = o_pdf["o_orderkey"].to_numpy(np.int64)
        oc_ = o_pdf["o_custkey"].to_numpy(np.int64)
        oo = np.argsort(ok_, kind="stable")
        o_ref = ray.put((ok_[oo], oc_[oo]))
        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_returnflag",
                       "l_extendedprice", "l_discount"])

        def per_cust(b: pd.DataFrame) -> pd.DataFrame:
            okeys, ocust = cached_get(o_ref)
            b = b[b["l_returnflag"] == "R"]
            if not len(b):
                return pd.DataFrame({
                    "c_custkey": pd.Series(dtype=np.int64),
                    "revenue": pd.Series(dtype=np.float64)})
            lo = b["l_orderkey"].to_numpy(np.int64)
            idx = np.searchsorted(okeys, lo)
            hit = (idx < len(okeys)) & \
                  (okeys[np.minimum(idx, len(okeys) - 1)] == lo)
            b = b[hit]
            rev = b["l_extendedprice"].to_numpy(np.float64) * \
                (1.0 - b["l_discount"].to_numpy(np.float64))
            g = pd.DataFrame({"c_custkey": ocust[idx[hit]],
                              "revenue": rev})
            return g.groupby("c_custkey",
                             as_index=False, sort=False).sum()

        agg = relational.sum_final(
            li.map_batches(per_cust, batch_format="pandas"),
            ["c_custkey"]).to_pandas()
        agg["revenue"] = agg["revenue"].round(4)
        agg = agg.sort_values(
            ["revenue", "c_custkey"], ascending=[False, True],
            kind="stable", ignore_index=True).head(20)
        cust = sf_table(sf_dir, "customer",
                        ["c_custkey", "c_name", "c_nationkey"]
                        ).to_pandas()
        nat = sf_table(sf_dir, "nation",
                       ["n_nationkey", "n_name"]).to_pandas()
        out = agg.merge(cust, on="c_custkey").merge(
            nat, left_on="c_nationkey", right_on="n_nationkey")
        return out[["c_custkey", "c_name", "n_name", "revenue"]] \
            .sort_values(["revenue", "c_custkey"],
                         ascending=[False, True], kind="stable",
                         ignore_index=True)

    def customer_pareto_share(sf_dir: str):
        # Pareto (80/20) concentration: revenue share of the top 20%
        # of customers by order revenue — one per-customer combiner
        # (cents-exact), the sorted fold runs over the O(customers)
        # aggregate (documented small side; the rule generalizes with
        # grouped_topk at 10^9 customers)
        o = sf_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])

        def cents(b: pd.DataFrame) -> pd.DataFrame:
            g = pd.DataFrame({
                "o_custkey": b["o_custkey"].to_numpy(np.int64),
                "c": np.rint(b["o_totalprice"].to_numpy(np.float64)
                             * 100.0).astype(np.int64)})
            return g.groupby("o_custkey",
                             as_index=False, sort=False).sum()

        per = relational.sum_final(
            o.map_batches(cents, batch_format="pandas"),
            ["o_custkey"]).to_pandas()
        v = np.sort(per["c"].to_numpy(np.int64))[::-1]
        n = len(v)
        k = max(1, int(n * 0.2))
        share = float(v[:k].sum()) / float(v.sum()) if n else 0.0
        return pd.DataFrame({
            "n_customers": np.asarray([n], np.int64),
            "top_k": np.asarray([k], np.int64),
            "top20_share": np.asarray([round(share, 6)], np.float64)})

    def user_activity_streaks(sf_dir: str):
        # islands-and-gaps engagement streaks at day granularity
        # (gap > 3 days splits); one hash-shard co-shuffle + a
        # vectorized per-shard pass
        ev = sf_table(sf_dir, "events", ["user_id", "ts"])
        return relational.activity_streaks(ev, max_gap_days=3)

    def kmv_distinct_users(sf_dir: str):
        # KMV distinct sketch — deterministic given the splitmix hash,
        # so the twin recomputes the SAME estimate (hash-equal oracle,
        # unlike HLL's register estimate)
        from engine.ops.sketch import kmv_count_distinct

        ev = sf_table(sf_dir, "events", ["user_id"])
        return kmv_count_distinct(ev, "user_id", k=256)

    def events_cuped_means(sf_dir: str):
        # CUPED variance-reduced A/B means (pre-period covariate)
        ev = sf_table(sf_dir, "events", ["user_id", "ts", "value"])
        return relational.cuped_adjusted_means(ev)

    def purchase_attribution_counts(sf_dir: str):
        # last-touch marketing attribution: each purchase credits the
        # user's latest preceding click/view (as-of join), plus the
        # unattributed remainder — conversion analysis over the event
        # stream
        ev = sf_table(sf_dir, "events",
                      ["event_id", "ts", "user_id", "event_type"])

        def purchases(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["event_type"] == "purchase"]

        def touches(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["event_type"].isin(["click", "view"])]

        p = ev.map_batches(purchases, batch_format="pandas")
        n_purch = p.count()
        j = relational.asof_join_grouped(
            p, ev.map_batches(touches, batch_format="pandas"),
            by="user_id", on="ts",
            right_value_cols={"event_type": "attributed_type"},
            left_cols=["event_id"],
            right_tie_cols=["event_id"],
        )
        att = relational.partial_groupby_sum(
            j, ["attributed_type"], {}, count_as="n").to_pandas()
        none_n = n_purch - int(att["n"].sum()) if len(att) else n_purch
        out = pd.concat([att, pd.DataFrame(
            {"attributed_type": ["none"], "n": [none_n]})],
            ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out.sort_values("attributed_type", ignore_index=True)

    def acctbal_tukey_outliers(sf_dir: str):
        # Tukey-fence outlier screen per segment: quartiles from the
        # distributed continuous-quantile op, fences broadcast back
        # into one counting pass
        from engine.state import cached_get

        cust = sf_table(sf_dir, "customer",
                        ["c_mktsegment", "c_acctbal"])
        q = relational.grouped_quantile_cont(
            cust, ["c_mktsegment"], "c_acctbal",
            {0.25: "q1", 0.75: "q3"}).to_pandas()
        q["lo"] = q["q1"] - 1.5 * (q["q3"] - q["q1"])
        q["hi"] = q["q3"] + 1.5 * (q["q3"] - q["q1"])
        fences = ray.put(dict(zip(
            q["c_mktsegment"],
            zip(q["lo"].astype(float), q["hi"].astype(float)))))

        def count(b: pd.DataFrame) -> pd.DataFrame:
            f = cached_get(fences)
            lo = b["c_mktsegment"].map(lambda s: f[s][0]).to_numpy()
            hi = b["c_mktsegment"].map(lambda s: f[s][1]).to_numpy()
            v = b["c_acctbal"].to_numpy(np.float64)
            g = pd.DataFrame({
                "c_mktsegment": b["c_mktsegment"],
                "n": np.ones(len(b), np.int64),
                "n_low": (v < lo).astype(np.int64),
                "n_high": (v > hi).astype(np.int64)})
            return g.groupby("c_mktsegment",
                             as_index=False, sort=False).sum()

        out = relational.sum_final(
            cust.map_batches(count, batch_format="pandas"),
            ["c_mktsegment"]).to_pandas()
        for c in ("n", "n_low", "n_high"):
            out[c] = out[c].astype(np.int64)
        return out.sort_values("c_mktsegment", ignore_index=True)

    def order_share_of_customer(sf_dir: str):
        # ratio-to-report: each order's share of its customer's total —
        # grouped totals (combiner) broadcast back into the same scan
        o = sf_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        sums = relational.partial_groupby_sum(
            o, ["o_custkey"], {"o_totalprice": "__tot"}
        ).to_pandas()
        joined = relational.broadcast_hash_join(o, sums, on="o_custkey")

        def f(b: pd.DataFrame) -> pd.DataFrame:
            b["share"] = (b["o_totalprice"] / b["__tot"]).round(6)
            return b[["o_orderkey", "share"]]

        return joined.map_batches(f, batch_format="pandas")

    def approx_value_quantiles_by_type(sf_dir: str):
        # grouped DDSketch: (group, bin) combiner partials; <=1%
        # relative error per group pytest-oracled
        from engine.ops import sketch as sketch_ops

        ev = sf_table(sf_dir, "events", ["event_type", "value"])
        out = sketch_ops.grouped_ddsketch_quantiles(
            ev, "event_type", "value", qs=(0.5, 0.9), rel_err=0.01
        )
        out["est"] = out["est"].round(4)
        return out

    def approx_user_event_counts(sf_dir: str):
        # Count-Min point estimates (never undercount; bound pytest-
        # oracled): per-batch local matrices merged by sum
        from engine.ops import sketch as sketch_ops

        ev = sf_table(sf_dir, "events", ["user_id"])
        sk = sketch_ops.count_min(ev, "user_id", depth=4, width=4096)
        keys = np.arange(1, 11, dtype=np.int64)
        est = sketch_ops.count_min_query(sk, keys)
        return pd.DataFrame({"user_id": keys, "est": est})

    def event_trailing_hour_sum(sf_dir: str):
        # time-RANGE window: trailing 1h sum per user, peers included
        ev = sf_table(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        out = relational.rolling_sum_range(
            ev, "user_id", "ts", "value", window_seconds=3600
        )

        def r(b: pd.DataFrame) -> pd.DataFrame:
            b["trailing_sum"] = b["trailing_sum"].round(4)
            return b[["event_id", "trailing_sum"]]

        return out.map_batches(r, batch_format="pandas")

    def event_type_transitions(sf_dir: str):
        # sequence bigrams: (LAG(type), type) counts per user order —
        # one sharded shuffle, every user's sequence diffed in one
        # segmented pass, then a combiner count of the pairs
        ev = sf_table(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

        def per_shard(shard: pd.DataFrame) -> pd.DataFrame:
            g = shard.sort_values(["user_id", "ts", "event_id"],
                                  kind="stable").drop(columns="__shard")
            uk = g["user_id"].to_numpy()
            et = g["event_type"].to_numpy()
            prev = np.empty_like(et)
            if len(et):
                prev[0] = ""
                prev[1:] = np.where(uk[1:] != uk[:-1], "", et[:-1])
            g = g.assign(prev_type=prev)
            g = g[g["prev_type"] != ""]
            return g.groupby(["prev_type", "event_type"], as_index=False) \
                    .size().rename(columns={"size": "n"})

        from engine.ops.relational import _sharded_by_key

        partials = _sharded_by_key(ev, "user_id", 256).groupby(
            "__shard"
        ).map_groups(per_shard, batch_format="pandas")
        return relational.sum_final(partials, ["prev_type", "event_type"])

    def user_retention_cohorts(sf_dir: str):
        # cohort retention matrix: per-user first epoch-week (min
        # combiner) broadcast back, then COUNT(DISTINCT user) per
        # (cohort_week, week). Week id = epoch seconds // 604800 so
        # pandas and DuckDB bucket identically.
        ev = sf_table(sf_dir, "events", ["user_id", "ts"])

        def week(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["week"] = (
                b["ts"].astype("datetime64[ns]").astype(np.int64)
                // (604800 * 10**9)
            ).astype(np.int64)
            return b[["user_id", "week"]]

        weekly = ev.map_batches(week, batch_format="pandas")
        first = relational.partial_groupby_agg(
            weekly, ["user_id"], {"cohort_week": ("week", "min")}
        ).to_pandas()
        joined = relational.broadcast_hash_join(weekly, first, on="user_id")
        out = relational.grouped_count_distinct(
            joined, ["cohort_week", "week"], "user_id", out="n_users"
        ).to_pandas()
        return out.sort_values(["cohort_week", "week"], ignore_index=True)

    def user_funnel_counts(sf_dir: str):
        # funnel: first view < first click < first purchase per user;
        # per-stage first-timestamps via the min combiner (one tiny
        # shuffle of per-batch minima), ordering check on the result
        ev = sf_table(sf_dir, "events", ["user_id", "event_type", "ts"])

        def stage_ts(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["event_type"].isin(["view", "click", "purchase"])]
            return b

        mins = relational.partial_groupby_agg(
            ev.map_batches(stage_ts, batch_format="pandas"),
            ["user_id", "event_type"], {"first_ts": ("ts", "min")},
        ).to_pandas()
        wide = mins.pivot(index="user_id", columns="event_type",
                          values="first_ts")
        ok = wide.dropna(subset=["view", "click", "purchase"])
        n = int(((ok["view"] < ok["click"]) & (ok["click"] < ok["purchase"])).sum())
        return pd.DataFrame([{"n_users": n}])

    def weighted_sample_orders(sf_dir: str):
        # deterministic A-Res weighted sample: price-weighted top-100;
        # exactness (vs single-process A-Res) pytest-oracled
        o = sf_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        out = relational.weighted_sample(o, "o_orderkey", "o_totalprice", k=100)
        return out[["o_orderkey"]]

    def orders_page3_by_price(sf_dir: str):
        # ORDER BY ... LIMIT/OFFSET pagination: combiner prunes to the
        # top (offset+limit) per batch, tiny final sort, slice
        ds = sf_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

        def prune(b: pd.DataFrame) -> pd.DataFrame:
            # per-batch k-selection under the FULL total order (price
            # desc, key asc) — exact under ties, unlike value-only topk
            return b.sort_values(
                ["o_totalprice", "o_orderkey"], ascending=[False, True],
                kind="stable",
            ).head(30)

        top = ds.map_batches(prune, batch_format="pandas").to_pandas()
        top = top.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True],
            kind="stable", ignore_index=True,
        )
        return top.iloc[20:30].reset_index(drop=True)

    def events_value_range_by_type(sf_dir: str):
        # generic associative combiner (A22) as an oracled aggregate
        ev = sf_table(sf_dir, "events", ["event_type", "value"])
        out = relational.partial_groupby_agg(
            ev, ["event_type"],
            {"lo": ("value", "min"), "hi": ("value", "max"),
             "total": ("value", "sum")},
        ).to_pandas()
        for c in ("lo", "hi", "total"):
            out[c] = out[c].round(4)
        return out

    def lineitem_quarterly_volume(sf_dir: str):
        # date_trunc('quarter') bucketing, identical on both sides
        li = sf_table(sf_dir, "lineitem", ["l_shipdate", "l_quantity"])

        def f(b: pd.DataFrame) -> pd.DataFrame:
            p = b["l_shipdate"].dt.to_period("Q")
            b["quarter"] = p.dt.start_time.dt.strftime("%Y-%m-%d")
            return b[["quarter", "l_quantity"]]

        out = relational.partial_groupby_sum(
            li.map_batches(f, batch_format="pandas"),
            ["quarter"], {"l_quantity": "qty"}, count_as="n",
        ).to_pandas()
        out["qty"] = out["qty"].round(4)
        return out

    def weighted_avg_discount_by_flag(sf_dir: str):
        # grouped weighted mean: SUM(w*x)/SUM(w) from one combiner pass
        li = sf_table(sf_dir, "lineitem",
                      ["l_returnflag", "l_quantity", "l_discount"])

        def derive(t):
            import pyarrow.compute as pc

            return t.append_column(
                "__wx", pc.multiply(t["l_quantity"], t["l_discount"])
            )

        out = relational.partial_groupby_sum_arrow(
            li, ["l_returnflag"], {"__wx": "__swx", "l_quantity": "__sw"},
            derive=derive,
        ).to_pandas()
        out["wavg_discount"] = (out["__swx"] / out["__sw"]).round(6)
        return out[["l_returnflag", "wavg_discount"]]

    def priciest_order_per_status(sf_dir: str):
        # arg_max: whole best row per group (combiner prune, sharded
        # final) vs DuckDB's arg_max pair
        o = sf_table(sf_dir, "orders",
                     ["o_orderstatus", "o_orderkey", "o_totalprice"])
        out = relational.argmax_per_group(
            o, "o_orderstatus", "o_totalprice", "o_orderkey"
        ).to_pandas()
        return out[["o_orderstatus", "o_orderkey", "o_totalprice"]]

    def distinct_users_per_hour(sf_dir: str):
        # windowed distinct: exact COUNT(DISTINCT) per hour bucket
        ev = sf_table(sf_dir, "events", ["user_id", "ts"])

        def f(b: pd.DataFrame) -> pd.DataFrame:
            b["hour"] = (
                b["ts"].astype("datetime64[ns]").astype(np.int64)
                // (3600 * 10**9)
            ).astype(np.int64)
            return b[["hour", "user_id"]]

        return relational.grouped_count_distinct(
            ev.map_batches(f, batch_format="pandas"),
            ["hour"], "user_id", out="n_users",
        )

    def busy_users_event_totals(sf_dir: str):
        # GROUP BY ... HAVING: the gate runs on the tiny aggregate
        ev = sf_table(sf_dir, "events", ["user_id", "value"])
        out = relational.partial_groupby_sum(
            ev, ["user_id"], {"value": "total_value"}, count_as="n_events"
        ).to_pandas()
        out = out[out["n_events"] >= 30].reset_index(drop=True)
        out["total_value"] = out["total_value"].round(4)
        return out

    def ranged_orders_scan(sf_dir: str):
        # zone-map pruned scan: orders written range-partitioned on
        # o_orderkey ONCE (cached), then a key-range read opens only
        # the overlapping rbucket dirs before any task is scheduled
        from engine.io import read_key_range, write_range_partitioned

        import zlib

        def pop(d: str) -> None:
            o = sf_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
            write_range_partitioned(o, f"{d}/orders", "o_orderkey", 16)

        base = _cached_dir(f"/tmp/graft_ranged_{zlib.crc32(sf_dir.encode())}", pop)
        ds = read_key_range(
            f"{base}/orders", 1000, 5000, columns=["o_orderkey", "o_totalprice"]
        )
        out = ds.map_batches(
            lambda b: pd.DataFrame({
                "n": [len(b)], "total": [b["o_totalprice"].sum()]}),
            batch_format="pandas",
        ).to_pandas().sum()
        return pd.DataFrame([{"n": int(out["n"]),
                              "total": round(float(out["total"]), 4)}])

    def auto_join_lineitem_orders(sf_dir: str):
        # stats-driven strategy pick (J14): metadata row counts route
        # this to broadcast (orders side) without the caller choosing
        li = sf_table(sf_dir, "lineitem",
                      ["l_orderkey", "l_extendedprice", "l_discount"])
        o = sf_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

        def ren(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns={"o_orderkey": "l_orderkey"})

        joined = relational.auto_join(
            li, o.map_batches(ren, batch_format="pandas"), "l_orderkey"
        )

        def rev(b: pd.DataFrame) -> pd.DataFrame:
            b["rev"] = b["l_extendedprice"] * (1 - b["l_discount"])
            return b[["o_orderpriority", "rev"]]

        out = relational.partial_groupby_sum(
            joined.map_batches(rev, batch_format="pandas"),
            ["o_orderpriority"], {"rev": "revenue"}, count_as="n_items",
        ).to_pandas()
        out["revenue"] = out["revenue"].round(2)  # big-sum rule
        return out

    def zordered_orders_rect(sf_dir: str):
        # 2-D data-skipping scan: orders Z-order-clustered on
        # (custkey, totalprice) ONCE (cached); the rectangle read drops
        # non-intersecting buckets via the 2-D zone map
        import zlib

        from engine.io import read_rect, write_zordered

        def pop(d: str) -> None:
            o = sf_table(sf_dir, "orders",
                         ["o_orderkey", "o_custkey", "o_totalprice"])
            write_zordered(o, f"{d}/orders", "o_custkey", "o_totalprice",
                           num_buckets=64)

        base = _cached_dir(f"/tmp/graft_zorder_{zlib.crc32(sf_dir.encode())}", pop)
        ds = read_rect(
            f"{base}/orders", (100.0, 500.0), (50000.0, 150000.0),
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )
        out = ds.map_batches(
            lambda b: pd.DataFrame({
                "n": [len(b)], "total": [b["o_totalprice"].sum()]}),
            batch_format="pandas",
        ).to_pandas().sum()
        return pd.DataFrame([{"n": int(out["n"]),
                              "total": round(float(out["total"]), 4)}])

    def nation_region_cross(sf_dir: str):
        # cross join: tiny x tiny cartesian via broadcast (a constant
        # join key on both sides); big x big cross joins are refused by
        # design — at 10^12 rows they are always a modeling error
        n = sf_table(sf_dir, "nation", ["n_name"])

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            b["__one"] = 1
            return b

        r = sf_table(sf_dir, "region", ["r_name"]).to_pandas()
        r["__one"] = 1
        out = relational.broadcast_hash_join(
            n.map_batches(tag, batch_format="pandas"), r, on="__one"
        )
        return out.select_columns(["n_name", "r_name"])

    def custkeys_any_big_or_urgent(sf_dir: str):
        # SQL UNION (distinct semantics): same tagged-union plan,
        # keep rows seen on EITHER side
        o = sf_table(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"])
        a = o.filter(expr="o_totalprice > 200000")
        b = o.filter(expr="o_orderpriority == '1-URGENT'")
        return relational.union_distinct(a, b, ["o_custkey"])

    def custkeys_big_and_urgent(sf_dir: str):
        # SQL INTERSECT (distinct semantics, D4): one tagged-union shuffle
        o = sf_table(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"])
        a = o.filter(expr="o_totalprice > 200000")
        b = o.filter(expr="o_orderpriority == '1-URGENT'")
        return relational.intersect_distinct(a, b, ["o_custkey"])

    def custkeys_never_urgent(sf_dir: str):
        # SQL EXCEPT (distinct semantics, D4)
        o = sf_table(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        b = o.filter(expr="o_orderpriority == '1-URGENT'")
        return relational.except_distinct(o, b, ["o_custkey"])

    def qty_price_regression_by_flag(sf_dir: str):
        ds = sf_table(
            sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
        )
        out = relational.grouped_cov_slope(
            ds, "l_returnflag", "l_quantity", "l_extendedprice"
        )
        # covar sums ~1e9: parallel-order float error ~1e-4 absolute,
        # so 2 decimals; slope/intercept are O(1e2-1e3) -> 4 is safe
        out["covar_samp"] = out["covar_samp"].round(2)
        out["slope"] = out["slope"].round(4)
        out["icept"] = out["icept"].round(4)
        return out

    def docs_packed_by_chars(sf_dir: str):
        # token-budget corpus packing via the distributed ordered
        # prefix sum: pack_id = exclusive running chars // budget
        ds = sf_table(sf_dir, "documents", ["doc_id", "n_chars"])
        out = relational.ordered_prefix_sum(
            ds, "doc_id", "n_chars", out_col="running_chars"
        )

        def f(b: pd.DataFrame) -> pd.DataFrame:
            b["pack_id"] = (b["running_chars"] - b["n_chars"]) // 20000
            return b[["doc_id", "running_chars", "pack_id"]]

        return out.map_batches(f, batch_format="pandas")

    def decontaminate_documents(sf_dir: str):
        # test-set decontamination: benchmark = doc_id % 53 == 1,
        # 8-gram shingle index broadcast once; exactness pytest-oracled
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])

        def pick_bench(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["doc_id"] % 53 == 1]

        bench = docs.map_batches(pick_bench, batch_format="pandas")
        idx = text.build_contamination_index(bench, ngram=8)
        out = text.flag_contaminated(docs, idx, ngram=8)
        return out.select_columns(["doc_id", "contaminated", "n_hits"])

    def docs_bpe_pair_counts(sf_dir: str):
        # BPE tokenizer bootstrap: top-50 adjacent character pairs
        # within whitespace words (merge-candidate table, iteration
        # zero of byte-pair encoding); vocabulary-bounded partials
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        return text.bpe_pair_counts(docs, k=50)

    def docs_tfidf_top_terms(sf_dir: str):
        # two-pass TF-IDF: distributed DF table broadcast into a
        # streaming scoring pass; exactness pytest-oracled
        docs = sf_table(sf_dir, "documents", ["doc_id", "text"])
        n = docs.count()
        df = text.doc_frequency(docs)
        return text.tfidf_top_terms(docs, n, df, k=3)

    def ann_pq_topk(sf_dir: str):
        # product-quantization ANN (ADC lookup-table scoring) against
        # the deterministic sf-independent codebook/query fixture; the
        # DuckDB twin (_sql_pq_topk) recomputes codes + ADC distances
        # from the same inlined constants. Recall of the corpus-trained
        # path stays pytest-oracled (tests/test_simsearch.py).
        from engine.ops.simsearch import pq_score_topk

        cb, q = _pq_fixture()
        emb = sf_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        out = pq_score_topk(emb, cb, q, k=10)
        out["qid"] = out["qid"].astype(np.int64)
        out["adist"] = out["adist"].round(6)
        return out[["qid", "rank", "vec_id", "adist"]]

    def embedding_centroid_by_label(sf_dir: str):
        # list-column GROUP BY: per-batch (labels x d) partial-sum
        # matrix via np.add.at; exchange moves label x dim partials
        from engine.ops.simsearch import embedding_centroid_by_label as _cent

        ds = sf_table(sf_dir, "embeddings", ["label", "embedding"])
        out = _cent(ds)
        out["avg_val"] = out["avg_val"].round(6)
        return out

    def embedding_sq8_error(sf_dir: str):
        # int8 scalar-quantization audit: per-dim corpus min/max,
        # then the RMS reconstruction error of uniform 8-bit
        # quantization — the embedding-compression loss report; two
        # combiner passes, ranges broadcast once into pass 2; twin
        # mirrors the quantize/dequantize tree with half-even rounds
        from engine.ops import simsearch

        ds = sf_table(sf_dir, "embeddings", ["embedding"])
        out = simsearch.embedding_sq8_stats(ds)
        for c in ["mn", "mx", "rmse"]:
            out[c] = out[c].round(6)
        return out[["dim", "mn", "mx", "n", "rmse"]]

    def embedding_dim_stats(sf_dir: str):
        # list-column UNNEST analog: zero-copy Arrow flatten ->
        # (rows x dim) numpy view -> per-dim partial sums (one tiny
        # shuffle of d-sized partials, never element rows)
        import pyarrow as pa

        ds = sf_table(sf_dir, "embeddings", ["embedding"])

        def f(t: pa.Table) -> pd.DataFrame:
            col = t.column("embedding").combine_chunks()
            mat = col.flatten().to_numpy(zero_copy_only=False).reshape(len(t), -1)
            return pd.DataFrame({
                "dim": np.arange(1, mat.shape[1] + 1, dtype=np.int64),
                "__s": mat.sum(axis=0, dtype=np.float64),
                "__n": np.int64(len(t)),
            })

        tot = relational.sum_final(
            ds.map_batches(f, batch_format="pyarrow"), ["dim"]
        ).to_pandas()
        tot["avg_val"] = (tot["__s"] / tot["__n"]).round(6)
        return tot[["dim", "avg_val"]]

    def orders_above_cust_avg(sf_dir: str):
        # correlated-subquery pattern: grouped avg (combiner) broadcast
        # BACK into the same scan — two passes, zero row shuffles
        o = sf_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        sums = relational.partial_groupby_sum(
            o, ["o_custkey"], {"o_totalprice": "__s"}, count_as="__n"
        ).to_pandas()
        sums["__avg"] = sums["__s"] / sums["__n"]
        joined = relational.broadcast_hash_join(
            o, sums[["o_custkey", "__avg"]], on="o_custkey"
        )

        def pick(b: pd.DataFrame) -> pd.DataFrame:
            # +1e-6 guard so float summation order can't flip boundary
            # rows (single-order customers sit exactly ON their avg)
            return b.loc[b["o_totalprice"] > b["__avg"] + 1e-6, ["o_orderkey"]]

        return joined.map_batches(pick, batch_format="pandas")

    def orders_price_histogram(sf_dir: str):
        # equi-width histogram: bucket id derived per batch, count
        # partials combined before one tiny shuffle
        o = sf_table(sf_dir, "orders", ["o_totalprice"])

        def f(b: pd.DataFrame) -> pd.DataFrame:
            b["bucket_id"] = np.floor(
                b["o_totalprice"].to_numpy() / 50000.0
            ).astype(np.int64)
            return b[["bucket_id"]]

        return relational.partial_groupby_sum(
            o.map_batches(f, batch_format="pandas"), ["bucket_id"], {},
            count_as="n",
        )

    def colocated_order_customer_revenue(sf_dir: str):
        # shuffle-free co-located join over a bucketed storage layout:
        # both tables written hash-bucketed on custkey ONCE (cached per
        # sf_dir), then task k joins bucket k of each side locally
        from engine.io import write_bucketed

        nb = 8
        import zlib
        def pop(d: str) -> None:
            o = sf_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])

            def ren(b: pd.DataFrame) -> pd.DataFrame:
                return b.rename(columns={"c_custkey": "o_custkey"})

            c = sf_table(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
                ren, batch_format="pandas"
            )
            write_bucketed(o, f"{d}/orders", "o_custkey", nb)
            write_bucketed(c, f"{d}/customer", "o_custkey", nb)

        base = _cached_dir(f"/tmp/graft_bucketed_{zlib.crc32(sf_dir.encode())}", pop)

        joined = relational.colocated_join(
            f"{base}/orders", f"{base}/customer", on="o_custkey", num_buckets=nb,
            columns_left=["o_custkey", "o_totalprice"],
            columns_right=["o_custkey", "c_nationkey"],
        )
        out = relational.partial_groupby_sum(
            joined, ["c_nationkey"], {"o_totalprice": "revenue"}, count_as="n_orders"
        ).to_pandas()
        out["revenue"] = out["revenue"].round(4)
        return out

    def events_user_count_skew_join(sf_dir: str):
        # skew-aware hybrid join: hot users' dim rows broadcast, cold
        # tail co-shuffles; exact union of the two disjoint joins
        ev = sf_table(sf_dir, "events", ["event_id", "user_id"])
        dim = relational.partial_groupby_sum(
            ev, ["user_id"], {}, count_as="u_n"
        )
        return relational.skew_hybrid_join(
            ev, dim, on="user_id", hot_threshold=40
        ).select_columns(["event_id", "user_id", "u_n"])

    def profile_lineitem(sf_dir: str):
        # one-pass ANALYZE: per-column count/nulls/min/max partials
        cols = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
        out = relational.profile_table(sf_table(sf_dir, "lineitem", cols), cols)
        out["min_val"] = out["min_val"].round(4)
        out["max_val"] = out["max_val"].round(4)
        return out

    def approx_price_quantiles(sf_dir: str):
        # mergeable DDSketch: rows-only here; the <=1% relative error
        # guarantee is pytest-oracled against exact numpy quantiles
        from engine.ops import sketch

        o = sf_table(sf_dir, "orders", ["o_totalprice"])
        out = sketch.ddsketch_quantiles(
            o, "o_totalprice", qs=(0.5, 0.9, 0.99), rel_err=0.01
        )
        out["est"] = out["est"].round(4)
        return out

    def click_view_value_overlaps(sf_dir: str):
        # interval-overlap (non-equi) join: grid-cell fan-out shuffle,
        # owner-cell rule guarantees no duplicate pairs
        ev = sf_table(sf_dir, "events", ["event_id", "event_type", "value"])

        def mk(et: str):
            def f(b: pd.DataFrame) -> pd.DataFrame:
                b = b[b["event_type"] == et].copy()
                b["lo"] = b["value"]
                b["hi"] = b["value"] + 0.1
                return b[["event_id", "lo", "hi"]]

            return f

        left = ev.map_batches(mk("click"), batch_format="pandas")
        right = ev.map_batches(mk("view"), batch_format="pandas")
        out = relational.interval_overlap_join(left, right, grid=0.5)
        return out.select_columns(["event_id_a", "event_id_b"])

    def docs_above_p75_chars(sf_dir: str):
        # global-quantile gate: exact P75 from a counts CDF walk
        # (distinct-value footprint), broadcast as a plain float
        ds = sf_table(sf_dir, "documents", ["doc_id", "n_chars"])
        counts = relational.partial_groupby_sum(
            ds, ["n_chars"], {}, count_as="__n"
        ).to_pandas().sort_values("n_chars", ignore_index=True)
        cum = counts["__n"].cumsum()
        total = int(cum.iloc[-1])
        import math
        thr = float(counts["n_chars"].iloc[int(np.searchsorted(cum, math.ceil(0.75 * total)))])
        return ds.filter(expr=f"n_chars > {thr}").select_columns(["doc_id"])

    def docs_zscore_chars(sf_dir: str):
        # global standardization: one stats pass broadcast back
        ds = sf_table(sf_dir, "documents", ["doc_id", "n_chars"])
        stats = ds.map_batches(
            lambda b: pd.DataFrame({
                "s": [b["n_chars"].sum()],
                "s2": [(b["n_chars"].astype(np.float64) ** 2).sum()],
                "n": [len(b)],
            }),
            batch_format="pandas",
        ).to_pandas().sum()
        mean = stats["s"] / stats["n"]
        std = float(np.sqrt(stats["s2"] / stats["n"] - mean * mean))

        def f(b: pd.DataFrame) -> pd.DataFrame:
            b["z"] = ((b["n_chars"] - mean) / std).round(4)
            return b[["doc_id", "z"]]

        return ds.map_batches(f, batch_format="pandas")

    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "click_view_value_overlaps": click_view_value_overlaps,
        "docs_above_p75_chars": docs_above_p75_chars,
        "docs_zscore_chars": docs_zscore_chars,
        "profile_lineitem": profile_lineitem,
        "approx_price_quantiles": approx_price_quantiles,
        "colocated_order_customer_revenue": colocated_order_customer_revenue,
        "events_user_count_skew_join": events_user_count_skew_join,
        "ann_pq_topk": ann_pq_topk,
        "embedding_centroid_by_label": embedding_centroid_by_label,
        "embedding_dim_stats": embedding_dim_stats,
        "embedding_sq8_error": embedding_sq8_error,
        "embedding_cluster_ari": embedding_cluster_ari,
        "orders_above_cust_avg": orders_above_cust_avg,
        "orders_price_histogram": orders_price_histogram,
        "supplier_part_pagerank": supplier_part_pagerank,
        "supplier_part_sssp": supplier_part_sssp,
        "docs_bm25_topk": docs_bm25_topk,
        "docs_bpe_merges": docs_bpe_merges,
        "part_lpa_communities": part_lpa_communities,
        "source_mix_weights": source_mix_weights,
        "docs_epoch_multiplicity": docs_epoch_multiplicity,
        "embedding_label_silhouette": embedding_label_silhouette,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q10_returned_items": q10_returned_items,
        "customer_pareto_share": customer_pareto_share,
        "user_activity_streaks": user_activity_streaks,
        "kmv_distinct_users": kmv_distinct_users,
        "events_cuped_means": events_cuped_means,
        "purchase_attribution_counts": purchase_attribution_counts,
        "acctbal_tukey_outliers": acctbal_tukey_outliers,
        "order_share_of_customer": order_share_of_customer,
        "approx_value_quantiles_by_type": approx_value_quantiles_by_type,
        "approx_user_event_counts": approx_user_event_counts,
        "event_trailing_hour_sum": event_trailing_hour_sum,
        "event_type_transitions": event_type_transitions,
        "user_retention_cohorts": user_retention_cohorts,
        "user_funnel_counts": user_funnel_counts,
        "weighted_sample_orders": weighted_sample_orders,
        "orders_page3_by_price": orders_page3_by_price,
        "weighted_avg_discount_by_flag": weighted_avg_discount_by_flag,
        "priciest_order_per_status": priciest_order_per_status,
        "distinct_users_per_hour": distinct_users_per_hour,
        "busy_users_event_totals": busy_users_event_totals,
        "ranged_orders_scan": ranged_orders_scan,
        "auto_join_lineitem_orders": auto_join_lineitem_orders,
        "zordered_orders_rect": zordered_orders_rect,
        "nation_region_cross": nation_region_cross,
        "custkeys_any_big_or_urgent": custkeys_any_big_or_urgent,
        "custkeys_big_and_urgent": custkeys_big_and_urgent,
        "custkeys_never_urgent": custkeys_never_urgent,
        "qty_price_regression_by_flag": qty_price_regression_by_flag,
        "docs_packed_by_chars": docs_packed_by_chars,
        "decontaminate_documents": decontaminate_documents,
        "docs_tfidf_top_terms": docs_tfidf_top_terms,
        "docs_bpe_pair_counts": docs_bpe_pair_counts,
        "revenue_by_nation": revenue_by_nation,
        "top_customers_by_acctbal": top_customers_by_acctbal,
        "customers_with_orders": customers_with_orders,
        "customers_without_big_orders": customers_without_big_orders,
        "distinct_mktsegment": distinct_mktsegment,
        "lineitem_revenue_rows": lineitem_revenue_rows,
        "orders_from_csv_by_status": orders_from_csv_by_status,
        "parts_name_like": parts_name_like,
        "orders_by_weekday": orders_by_weekday,
        "orders_by_month": orders_by_month,
        "part_supplier_join": part_supplier_join,
        "supplier_stats_by_region": supplier_stats_by_region,
        "orders_with_delta_applied": orders_with_delta_applied,
        "union_order_status": union_order_status,
        "events_json_stats": events_json_stats,
        "running_total_by_user": running_total_by_user,
        "sessionize_events": sessionize_events,
        "top_users_by_events": top_users_by_events,
        "scalar_string_funcs": scalar_string_funcs,
        "sample_customers": sample_customers,
        "events_hourly_window": events_hourly_window,
        "events_asof_purchase": events_asof_purchase,
        "quantity_range_buckets": quantity_range_buckets,
        "top3_orders_per_customer": top3_orders_per_customer,
        "latest_event_per_user": latest_event_per_user,
        "acctbal_quantiles_by_segment": acctbal_quantiles_by_segment,
        "rolling_avg_user_value": rolling_avg_user_value,
        "stratified_sample_customers": stratified_sample_customers,
        "events_pivot_by_user": events_pivot_by_user,
        "qty_price_corr_by_flag": qty_price_corr_by_flag,
        "order_rank_in_customer": order_rank_in_customer,
        "order_pctrank_in_customer": order_pctrank_in_customer,
        "orders_status_priority_cube": orders_status_priority_cube,
        "orders_priority_rollup": orders_priority_rollup,
        "acctbal_var_by_segment": acctbal_var_by_segment,
        "orders_of_rich_customers": orders_of_rich_customers,
        "parts_never_ordered_heavy": parts_never_ordered_heavy,
        "user_event_type_seq": user_event_type_seq,
        "user_top_paths": user_top_paths,
        "top_event_type_per_user": top_event_type_per_user,
        "event_value_delta": event_value_delta,
        "event_value_window": event_value_window,
        "acctbal_qcont_by_segment": acctbal_qcont_by_segment,
        "distinct_users_per_event_type": distinct_users_per_event_type,
        "customer_big_order_counts": customer_big_order_counts,
        "docs_top_tokens": docs_top_tokens,
        "docs_lexical_richness": docs_lexical_richness,
        "click_purchase_hourly_ccf": click_purchase_hourly_ccf,
        "heavy_hitter_tokens": heavy_hitter_tokens,
        "urgent_vs_big_orders": urgent_vs_big_orders,
        "embedding_norm_by_label": embedding_norm_by_label,
        "embedding_kmeans_clusters": embedding_kmeans_clusters,
        "approx_distinct_users": approx_distinct_users,
        "dedup_components_documents": dedup_components_documents,
        "docs_token_stats": docs_token_stats,
        "docs_quality": docs_quality,
        "docs_vocab_diversity": docs_vocab_diversity,
        "docs_repetition_ratio": docs_repetition_ratio,
        "dedup_documents_exact": dedup_documents_exact,
        "ann_cosine_topk": ann_cosine_topk,
        "embedding_truncation_recall": embedding_truncation_recall,
        "embedding_mmr_topk": embedding_mmr_topk,
        "docs_winnow_fingerprints": docs_winnow_fingerprints,
        "ann_cosine_range": ann_cosine_range,
        "lang_id_documents": lang_id_documents,
        "fingerprint_documents": fingerprint_documents,
        "simhash_documents": simhash_documents,
        "minhash_dedup_documents": minhash_dedup_documents,
        "embedding_near_dups": embedding_near_dups,
        "ngram_jaccard_docs": ngram_jaccard_docs,
        "video_frame_plan": video_frame_plan,
        "audio_chunk_plan": audio_chunk_plan,
        "ann_ivf_topk": ann_ivf_topk,
        "ann_ivf_recall": ann_ivf_recall,
        "geo_h3_cell_counts": geo_h3_cell_counts,
        "geo_s2_cell_counts": geo_s2_cell_counts,
        "geo_geohash_counts": geo_geohash_counts,
        "docs_chunked": docs_chunked,
        "docs_token_ids": docs_token_ids,
        "docs_unigram_logprob": docs_unigram_logprob,
        "docs_banned_terms": docs_banned_terms,
        "docs_incremental_dedup": docs_incremental_dedup,
        "docs_ngram_span_dups": docs_ngram_span_dups,
        "docs_containment_pairs": docs_containment_pairs,
        "orders_grouping_sets": orders_grouping_sets,
        "orders_cube": orders_cube,
        "prepare_corpus_pipeline": prepare_corpus_pipeline,
        "corpus_to_shards_pipeline": corpus_to_shards_pipeline,
        "prepare_image_corpus_pipeline": prepare_image_corpus_pipeline,
        "geo_pip_join": geo_pip_join,
        "geo_pip_join_incremental": geo_pip_join_incremental,
        "geo_toponym_infer": geo_toponym_infer,
        "geo_josm_links": geo_josm_links,
        "geo_pip_join_from_osm_xml": geo_pip_join_from_osm_xml,
        "geo_knn": geo_knn,
        "geo_self_knn": geo_self_knn,
        "geo_tile_assignments": geo_tile_assignments,
        "geo_tile_pyramid": geo_tile_pyramid,
        "geo_tile_compaction": geo_tile_compaction,
        "run_history_series": run_history_series,
        "geo_phash_verify": geo_phash_verify,
        "geo_polygon_centroids": geo_polygon_centroids,
        "geo_admin_nearest_admin": geo_admin_nearest_admin,
        "click_to_purchase_latency": click_to_purchase_latency,
        "geo_polygon_areas": geo_polygon_areas,
        "geo_admin_image_density": geo_admin_image_density,
        "geo_idw_mpx_at_centroids": geo_idw_mpx_at_centroids,
        "geo_coverage_gaps": geo_coverage_gaps,
        "geo_polygon_pruned_scan": geo_polygon_pruned_scan,
        "geo_track_stats": geo_track_stats,
        "geo_track_bearings": geo_track_bearings,
        "geo_boundary_crossings": geo_boundary_crossings,
        "geo_kde_heatmap": geo_kde_heatmap,
        "geo_dbscan_clusters": geo_dbscan_clusters,
        "geo_bbox_candidates": geo_bbox_candidates,
        "geo_track_hulls": geo_track_hulls,
        "geo_trip_segments": geo_trip_segments,
        "geo_phash_spread": geo_phash_spread,
        "geo_track_medoids": geo_track_medoids,
        "geo_resample_tracks": geo_resample_tracks,
        "geo_morans_i": geo_morans_i,
        "geo_geary_c": geo_geary_c,
        "geo_simplify_tracks": geo_simplify_tracks,
        "geo_getis_ord": geo_getis_ord,
        "geo_local_morans": geo_local_morans,
        "geo_quadtree_cells": geo_quadtree_cells,
        "geo_speed_outliers": geo_speed_outliers,
        "geo_geofence_dwell": geo_geofence_dwell,
        "geo_track_hausdorff": geo_track_hausdorff,
        "geo_track_frechet": geo_track_frechet,
        "geo_track_dtw": geo_track_dtw,
        "geo_track_lcss": geo_track_lcss,
        "geo_track_sde": geo_track_sde,
        "geo_ripley_k": geo_ripley_k,
        "geo_semivariogram": geo_semivariogram,
        "geo_knox_spacetime": geo_knox_spacetime,
        "geo_mann_kendall_cells": geo_mann_kendall_cells,
        "geo_theil_sen_cells": geo_theil_sen_cells,
        "geo_quadrat_chi2": geo_quadrat_chi2,
        "geo_segregation_d": geo_segregation_d,
        "geo_colocation_quotient": geo_colocation_quotient,
        "geo_cross_k": geo_cross_k,
        "geo_density_gradient": geo_density_gradient,
        "geo_join_counts": geo_join_counts,
        "geo_stay_points": geo_stay_points,
        "geo_bearing_rose": geo_bearing_rose,
        "geo_track_self_x": geo_track_self_x,
        "image_pixel_histogram": image_pixel_histogram,
        "image_sharpness": image_sharpness,
        "image_entropy_contrast": image_entropy_contrast,
        "image_fractal_dim": image_fractal_dim,
        "image_quadrant_asym": image_quadrant_asym,
        "image_colorfulness": image_colorfulness,
        "image_otsu_threshold": image_otsu_threshold,
        "image_bitplane_entropy": image_bitplane_entropy,
        "image_neighbor_brighter": image_neighbor_brighter,
        "image_grad_orient_hist": image_grad_orient_hist,
        "image_quantile_stretch": image_quantile_stretch,
        "image_glcm_texture": image_glcm_texture,
        "image_hu_moments": image_hu_moments,
        "image_run_length": image_run_length,
        "image_busiest_block": image_busiest_block,
        "image_radial_profile": image_radial_profile,
        "image_tenengrad": image_tenengrad,
        "image_border_contrast": image_border_contrast,
        "image_dominant_color": image_dominant_color,
        "image_equalize_audit": image_equalize_audit,
        "image_patches": image_patches,
        "image_norm_moments": image_norm_moments,
        "image_patch_dup_pairs": image_patch_dup_pairs,
        "embedding_pca_components": embedding_pca_components,
        "embedding_cov_moments": embedding_cov_moments,
        "orders_lineitem_ri_audit": orders_lineitem_ri_audit,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q18_large_volume_customers": q18_large_volume_customers,
        "embedding_label_centroid_sims": embedding_label_centroid_sims,
        "event_gap_quantiles": event_gap_quantiles,
        "q13_customer_distribution": q13_customer_distribution,
        "docs_heaps_fit": docs_heaps_fit,
        "embedding_fisher_ratio": embedding_fisher_ratio,
        "embedding_1nn_accuracy": embedding_1nn_accuracy,
        "geo_line_density": geo_line_density,
        "geo_enclosing_circles": geo_enclosing_circles,
        "geo_flow_field": geo_flow_field,
        "geo_visit_entropy": geo_visit_entropy,
        "geo_polygon_convexity": geo_polygon_convexity,
        "docs_bigram_logprob": docs_bigram_logprob,
        "docs_bigram_pmi": docs_bigram_pmi,
        "docs_levenshtein_pairs": docs_levenshtein_pairs,
        "docs_jaro_winkler_pairs": docs_jaro_winkler_pairs,
        "event_type_cooccurrence": event_type_cooccurrence,
        "part_triangle_count": part_triangle_count,
        "part_bfs_hops": part_bfs_hops,
        "part_degree_assortativity": part_degree_assortativity,
        "part_avg_neighbor_degree": part_avg_neighbor_degree,
        "part_closeness_sampled": part_closeness_sampled,
        "part_link_jaccard": part_link_jaccard,
        "part_adamic_adar": part_adamic_adar,
        "customer_part_hits": customer_part_hits,
        "part_k_core": part_k_core,
        "part_local_clustering": part_local_clustering,
        "user_value_ewma": user_value_ewma,
        "user_value_cusum": user_value_cusum,
        "geo_turning_stats": geo_turning_stats,
        "geo_cross_track": geo_cross_track,
        "geo_coverage_fraction": geo_coverage_fraction,
        "balanced_sample_events": balanced_sample_events,
        "geo_st_pairs": geo_st_pairs,
        "geo_dead_reckoning": geo_dead_reckoning,
        "docs_sentence_stats": docs_sentence_stats,
        "docs_readability_lix": docs_readability_lix,
        "docs_char_entropy": docs_char_entropy,
        "docs_script_profile": docs_script_profile,
        "geom_harmonic_price_by_status": geom_harmonic_price_by_status,
        "user_sequence_entropy": user_sequence_entropy,
        "orders_benford_digits": orders_benford_digits,
        "geo_spacetime_cube": geo_spacetime_cube,
        "geo_cell_lang_share": geo_cell_lang_share,
        "geo_admin_lang_share": geo_admin_lang_share,
        "geo_track_home_cell": geo_track_home_cell,
        "orders_urgency_ttest": orders_urgency_ttest,
        "events_ab_conversion": events_ab_conversion,
        "events_fisher_exact": events_fisher_exact,
        "docs_rake_keywords": docs_rake_keywords,
        "events_bootstrap_ci": events_bootstrap_ci,
        "events_weekly_profile": events_weekly_profile,
        "orders_urgency_ranksum": orders_urgency_ranksum,
        "orders_urgency_ks": orders_urgency_ks,
        "orders_priority_anova": orders_priority_anova,
        "orders_priority_kruskal": orders_priority_kruskal,
        "user_value_durbin_watson": user_value_durbin_watson,
        "user_value_acf": user_value_acf,
        "nation_spend_hhi": nation_spend_hhi,
        "price_pythagorean_means_by_flag": price_pythagorean_means_by_flag,
        "user_value_perm_entropy": user_value_perm_entropy,
        "event_type_jsd_arms": event_type_jsd_arms,
        "event_type_dow_chi2": event_type_dow_chi2,
        "event_type_dow_mi": event_type_dow_mi,
        "event_value_winsorized_mean": event_value_winsorized_mean,
        "customer_lorenz_deciles": customer_lorenz_deciles,
        "user_purchase_survival": user_purchase_survival,
        "user_decayed_engagement": user_decayed_engagement,
        "acctbal_mad_by_segment": acctbal_mad_by_segment,
        "nation_revenue_hhi": nation_revenue_hhi,
        "nation_acctbal_gini": nation_acctbal_gini,
        "user_burstiness": user_burstiness,
        "user_rfm_scores": user_rfm_scores,
        "user_sessions": user_sessions,
        "order_priority_theil": order_priority_theil,
        "qty_price_spearman_by_flag": qty_price_spearman_by_flag,
        "qty_price_kendall_by_flag": qty_price_kendall_by_flag,
        "lineitem_ols_price_model": lineitem_ols_price_model,
        "price_weighted_median_by_flag": price_weighted_median_by_flag,
        "event_value_trimmed_mean": event_value_trimmed_mean,
        "value_shape_by_event_type": value_shape_by_event_type,
        "events_hourly_acf": events_hourly_acf,
        "supplier_activity_span": supplier_activity_span,
        "docs_hapax_rate": docs_hapax_rate,
        "geo_clark_evans": geo_clark_evans,
        "geo_nn_g_function": geo_nn_g_function,
        "geo_centrography": geo_centrography,
        "embedding_participation_ratio": embedding_participation_ratio,
        "docs_zipf_fit": docs_zipf_fit,
        "geo_trip_od_matrix": geo_trip_od_matrix,
        "geo_gravity_fit": geo_gravity_fit,
        "geo_cell_best_image": geo_cell_best_image,
        "geo_dist_to_boundary": geo_dist_to_boundary,
        "geo_snap_to_boundary": geo_snap_to_boundary,
        "geo_ring_perimeters": geo_ring_perimeters,
        "geo_voronoi_assign": geo_voronoi_assign,
        "geo_reverse_geocode": geo_reverse_geocode,
        "geo_zonal_image_stats": geo_zonal_image_stats,
        "geo_cell_ring_density": geo_cell_ring_density,
        "geo_vector_tiles": geo_vector_tiles,
        "image_augment": image_augment,
        "geo_admin_rollup": geo_admin_rollup,
        "geo_article_match": geo_article_match,
        "geo_radius_join": geo_radius_join,
        "geo_article_fuzzy_match": geo_article_fuzzy_match,
        "geo_articles_untagged": geo_articles_untagged,
        "geo_suggestions": geo_suggestions,
        "geo_tile_boundary_masks": geo_tile_boundary_masks,
        "geo_vector_tiles_simplified": geo_vector_tiles_simplified,
        "geo_area_tag_stats": geo_area_tag_stats,
        "geo_area_export_rows": geo_area_export_rows,
        "geo_area_export_files": geo_area_export_files,
        "geo_site_index": geo_site_index,
        "geo_phash_near_dups": geo_phash_near_dups,
        "geo_dedup_phash": geo_dedup_phash,
        "image_features": image_features,
        "image_similar_topk": image_similar_topk,
        "image_resize": image_resize,
        "image_dims_by_fmt": image_dims_by_fmt,
        "image_color_cast": image_color_cast,
        "image_thumb_near_dups": image_thumb_near_dups,
        "image_mpx_by_cell": image_mpx_by_cell,
        "image_payload_bytes_by_fmt": image_payload_bytes_by_fmt,
    }


# --------------------------------------------------------------------- oracles

_STOPWORDS_SQL = "('the','and','of','to','a','in','is','that','it','for','with','was','il','la','di','e','che','un','una','per','con','del','della','non','der','die','das','und','ist','ein','eine','mit','von','nicht','den')"

# ---- SQL twins of the engine's deterministic hash/sketch kernels -------
# DuckDB has no 64-bit wrap-around multiply, so (x*c) mod 2^64 is built
# from HUGEINT-safe 32-bit partial products; XOR/shift run in UBIGINT.
# These reproduce engine.ops.sketch._hash64 (splitmix64) BIT-EXACTLY for
# integer keys, which is what makes the sampling / CMS / HLL queries
# SQL-oracle-able at all (round-1 verdict item #1).

_M64_SQL = "18446744073709551616"  # 2**64
_M32_SQL = "4294967296"  # 2**32


def _sql_mulmod64(x: str, c: str) -> str:
    """(x*c) mod 2^64; x < 2^64 HUGEINT expr, c a < 2^64 constant."""
    return (
        f"((({x}) % {_M32_SQL}) * CAST({c} AS HUGEINT) + "
        f"(((({x}) // {_M32_SQL}) * CAST({c} AS HUGEINT)) % {_M32_SQL}) * {_M32_SQL}) "
        f"% {_M64_SQL}"
    )


def _sql_xorshift(x: str, s: int) -> str:
    """x XOR (x >> s) for x < 2^64, returned as HUGEINT."""
    return (
        f"CAST(xor(CAST(({x}) AS UBIGINT), CAST(({x}) AS UBIGINT) >> {s}) "
        f"AS HUGEINT)"
    )


def _sql_splitmix64(v: str) -> str:
    """engine.ops.sketch._hash64 for integer inputs, bit-exact."""
    x = (
        f"((CAST({v} AS HUGEINT) % {_M64_SQL} + {_M64_SQL}) % {_M64_SQL} "
        f"+ 11400714819323198485) % {_M64_SQL}"
    )
    x = _sql_mulmod64(_sql_xorshift(x, 30), "13787848793156543929")
    x = _sql_mulmod64(_sql_xorshift(x, 27), "10723151780598845931")
    return _sql_xorshift(x, 31)


# ---- geo-fixture SQL regeneration -----------------------------------
# The geo fixture is a pure function of (seed=42, row index) through
# the SAME splitmix64 mix (engine/fixtures.py), so DuckDB can rebuild
# lon/lat/captions bit-exactly and oracle the geo transforms. Hash
# chains run as CTE steps (columns, not nested expressions — a nested
# splitmix expansion explodes exponentially).

def _sql_geo_hashes(n: int, streams: list[int], seed: int = 42) -> str:
    """CTE chain: gi(i) -> ... -> ghash(i, h<s> UBIGINT per stream),
    h<s> = fixtures._hash_stream(i, s) bit-exactly."""
    seed_c = seed << 48
    cols0 = ", ".join(
        f"CAST(xor(xor(CAST(i AS UBIGINT), CAST({s << 40} AS UBIGINT)), "
        f"CAST({seed_c} AS UBIGINT)) AS HUGEINT) AS h{s}_0"
        for s in streams
    )
    step1 = ", ".join(
        f"(h{s}_0 + 11400714819323198485) % {_M64_SQL} AS h{s}_1"
        for s in streams
    )
    step2 = ", ".join(
        f"{_sql_mulmod64(_sql_xorshift(f'h{s}_1', 30), '13787848793156543929')}"
        f" AS h{s}_2"
        for s in streams
    )
    step3 = ", ".join(
        f"{_sql_mulmod64(_sql_xorshift(f'h{s}_2', 27), '10723151780598845931')}"
        f" AS h{s}_3"
        for s in streams
    )
    stepf = ", ".join(
        f"CAST({_sql_xorshift(f'h{s}_3', 31)} AS UBIGINT) AS h{s}"
        for s in streams
    )
    return f"""
        gi AS (SELECT CAST(range AS BIGINT) AS i FROM range({n})),
        gh0 AS (SELECT i, {cols0} FROM gi),
        gh1 AS (SELECT i, {step1} FROM gh0),
        gh2 AS (SELECT i, {step2} FROM gh1),
        gh3 AS (SELECT i, {step3} FROM gh2),
        ghash AS (SELECT i, {stepf} FROM gh3)
    """


def _sql_gll_body() -> str:
    """gll(i, lon, lat) = fixtures.row_lonlat(i); expects ghash with
    h1..h4 in scope."""
    u = {s: f"(CAST(h{s} AS DOUBLE) / 18446744073709551616e0)"
         for s in (1, 2, 3, 4)}
    return f"""
        gll AS (SELECT i,
            CASE WHEN i % 10 = 0
                 THEN 9.05e0 + (0.045e0 * sqrt({u[4]}))
                      * cos(2e0 * pi() * {u[3]})
                 ELSE -12e0 + 24e0 * {u[1]} END AS lon,
            CASE WHEN i % 10 = 0
                 THEN 41.05e0 + (0.045e0 * sqrt({u[4]}))
                      * sin(2e0 * pi() * {u[3]})
                 ELSE 35e0 + 12e0 * {u[2]} END AS lat
          FROM ghash)
    """


def _sql_geo_lonlat(n: int) -> str:
    """CTE chain ending in gll(i, lon, lat) = fixtures.row_lonlat(i)."""
    return f"{_sql_geo_hashes(n, [1, 2, 3, 4])}, {_sql_gll_body()}"


def _sql_geo_h3(res: int) -> str:
    """CTE chain gll -> gcell(i, h3_r<res>) = engine.geo.h3like.encode
    (aperture-4 axial grid: fractional axial coords, cube round, pack).
    Bit-for-bit except np.rint half-even vs SQL round half-away — a
    measure-zero difference for irrational axial coordinates."""
    size = 16.0 / (1 << res)
    off = 1 << 27
    return f"""
        gax AS (SELECT i,
            (lon / sqrt(3e0) - lat / 3e0) / {size!r}e0 AS qf,
            ((2e0 / 3e0) * lat) / {size!r}e0 AS rf
          FROM gll),
        grnd AS (SELECT i, qf, rf, -qf - rf AS sf,
            round(qf) AS q0, round(rf) AS r0, round(-qf - rf) AS s0
          FROM gax),
        gfix AS (SELECT i,
            CASE WHEN abs(q0 - qf) > abs(r0 - rf)
                      AND abs(q0 - qf) > abs(s0 - sf)
                 THEN -r0 - s0 ELSE q0 END AS q,
            CASE WHEN NOT (abs(q0 - qf) > abs(r0 - rf)
                           AND abs(q0 - qf) > abs(s0 - sf))
                      AND abs(r0 - rf) > abs(s0 - sf)
                 THEN -q0 - s0 ELSE r0 END AS r
          FROM grnd),
        gcell AS (SELECT i, CAST(
            {res} * 72057594037927936
            + (CAST(q AS BIGINT) + {off}) * 268435456
            + (CAST(r AS BIGINT) + {off}) AS UBIGINT) AS h3_r{res}
          FROM gfix)
    """


def _sql_gcanon_body() -> str:
    """gcanon(i, image_id, caption_canon) — the CANONICAL caption
    (fixtures.row_caption + ingest.canonicalize: the ~5% denormalized
    variants fold back to the same canon, so the denorm stream never
    enters). Expects ghash with h5..h8 in scope."""
    words = ("castello torre ponte chiesa museo piazza fontana palazzo "
             "teatro monte lago fiume isola porto borgo rocca abbazia "
             "duomo villa parco").split()
    warr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"""
        gwords AS (SELECT {warr} AS ws),
        gcanon AS (SELECT i,
            'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
            (['it', 'en', 'de'][CAST(h5 % 3 AS INT) + 1]) || ':' ||
            upper(substr(ws[CAST(h6 % 20 AS INT) + 1], 1, 1)) ||
            substr(ws[CAST(h6 % 20 AS INT) + 1], 2) || ' ' ||
            ws[CAST(h7 % 20 AS INT) + 1] || ' ' ||
            CAST(h8 % 97 AS VARCHAR) AS caption_canon
          FROM ghash CROSS JOIN gwords)
    """


def _sql_geo_canon(n: int) -> str:
    """CTE chain ending in gcanon (see _sql_gcanon_body)."""
    return f"{_sql_geo_hashes(n, [5, 6, 7, 8])}, {_sql_gcanon_body()}"


def _sql_gdims_body() -> str:
    """gdim(i, w, h, fmt) = the fixture's dims/fmt columns (streams
    10-12 evaluated at pixel_source_row(i): exact duplicates carry the
    SOURCE row's dims/fmt so pixels match — engine/fixtures.py:107-141).
    Expects ghash with h10..h12 in scope."""
    return """
        gsrc AS (SELECT i, CASE WHEN i % 100 = 7 AND i > 0
                                THEN GREATEST(0, i - 1 - (i % 13))
                                ELSE i END AS src
                 FROM ghash),
        gdim AS (SELECT s.i,
                    16 + 8 * CAST(g.h10 % 3 AS INT) AS w,
                    16 + 8 * CAST(g.h11 % 3 AS INT) AS h,
                    CASE WHEN g.h12 % 10 < 7
                         THEN 'raw16' ELSE 'qdct' END AS fmt
                 FROM gsrc s JOIN ghash g ON g.i = s.src)
    """


def _sql_pixels_cte(n: int, streams: list[int] | None = None) -> str:
    """CTE chain ending in gpx(i, c, px): every decoded pixel of every
    raw16 fixture row, regenerated bit-exactly from the splitmix chains
    (fixtures.image_pixels; raw16 decode is the lossless identity).
    np.rint's half-to-even is reproduced explicitly (SQL round() is
    half-away). Extra ``streams`` ride along in ghash for twins that
    also need per-row parameter hashes (augment plan = stream 20)."""
    k0 = ("CAST(xor(xor(CAST(src AS UBIGINT) << 32, "
          "CAST(y AS UBIGINT) << 16), CAST(x AS UBIGINT)) AS HUGEINT)")
    return f"""
        {_sql_geo_hashes(n, list(streams or [10, 11, 12]))},
        {_sql_gdims_body()},
        praw AS (SELECT d.i, s.src, d.w, d.h
                 FROM gdim d JOIN gsrc s ON s.i = d.i
                 WHERE d.fmt = 'raw16'),
        pyx AS (SELECT i, src, w, h, yy.y AS y, xx.x AS x
                FROM praw
                CROSS JOIN (SELECT unnest(range(0, 32)) AS y) yy
                CROSS JOIN (SELECT unnest(range(0, 32)) AS x) xx
                WHERE yy.y < h AND xx.x < w),
        pk0 AS (SELECT i, w, h, x, y, {k0} AS k0 FROM pyx),
        pk1 AS (SELECT i, w, h, x, y,
                   (k0 + 11400714819323198485) % {_M64_SQL} AS k1
                FROM pk0),
        pk2 AS (SELECT i, w, h, x, y,
                   {_sql_mulmod64(_sql_xorshift('k1', 30),
                                  '13787848793156543929')} AS k2
                FROM pk1),
        pk3 AS (SELECT i, w, h, x, y,
                   {_sql_mulmod64(_sql_xorshift('k2', 27),
                                  '10723151780598845931')} AS k3
                FROM pk2),
        pkf AS (SELECT i, w, h, x, y,
                   CAST({_sql_xorshift('k3', 31)} AS UBIGINT) AS base
                FROM pk3),
        pgrad AS (SELECT i, x, y, base,
                   (CAST(x + y AS DOUBLE)
                    / CAST(GREATEST(w + h - 2, 1) AS DOUBLE)) * 255e0
                       AS grad
                  FROM pkf),
        pv AS (SELECT i, y, x, cc.c,
                   0.5e0 * CAST((base >> (8 * cc.c)) & 255 AS DOUBLE)
                   + 0.5e0 * grad AS v
               FROM pgrad
               CROSS JOIN (SELECT unnest(range(0, 3)) AS c) cc),
        gpx AS (SELECT i, y, x, c,
                   LEAST(GREATEST(
                       FLOOR(v + 0.5e0)
                       - CASE WHEN FLOOR(v + 0.5e0) - v = 0.5e0
                                   AND CAST(FLOOR(v + 0.5e0) AS BIGINT)
                                       % 2 <> 0
                              THEN 1 ELSE 0 END, 0e0), 255e0) AS px
                FROM pv)
    """


def _sql_image_entropy_contrast(bins: int = 16) -> str:
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        st AS (SELECT i, COUNT(*) AS np, AVG(px) AS m,
                      AVG(px * px) AS m2
               FROM gpx GROUP BY i),
        hh AS (SELECT i, (CAST(px AS BIGINT) * {bins}) // 256 AS bin,
                      COUNT(*) AS n
               FROM gpx GROUP BY i, bin),
        hn AS (SELECT h.i,
                  -SUM((CAST(h.n AS DOUBLE) / s.np)
                       * ln(CAST(h.n AS DOUBLE) / s.np)) AS ent
               FROM hh h JOIN st s ON s.i = h.i GROUP BY h.i)
        SELECT 'img' || lpad(CAST(s.i AS VARCHAR), 9, '0') AS image_id,
               {_sql_round_even('hn.ent')} AS entropy,
               {_sql_round_even(
                   'sqrt(GREATEST(s.m2 - s.m * s.m, 0e0))')}
                   AS contrast
        FROM st s JOIN hn ON hn.i = s.i
        ORDER BY image_id
    """


def _sql_image_fractal_dim() -> str:
    # brighter-than-average occupancy is the all-integer comparison
    # s3 * npix > tot (channel sums and counts are exact in float64);
    # box counts at scales 1/2/4/8, OLS slope written in the engine's
    # exact expression order
    lns = "(ln(1e0) + ln(2e0) + ln(4e0) + ln(8e0))"
    lns2 = ("(ln(1e0) * ln(1e0) + ln(2e0) * ln(2e0)"
            " + ln(4e0) * ln(4e0) + ln(8e0) * ln(8e0))")
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        pg AS (SELECT i, y, x, SUM(px) AS s3 FROM gpx
               GROUP BY i, y, x),
        tt AS (SELECT i, SUM(s3) AS tot, COUNT(*) AS npix FROM pg
               GROUP BY i),
        oc AS (SELECT p.i, p.y, p.x FROM pg p JOIN tt t ON t.i = p.i
               WHERE p.s3 * t.npix > t.tot),
        bc AS (SELECT i, sc.s AS s,
                  COUNT(DISTINCT (y // sc.s) * 64 + (x // sc.s))
                      AS nb
               FROM oc
               CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS s) sc
               GROUP BY i, sc.s),
        fpv AS (SELECT t.i,
                  ln(GREATEST(COALESCE(MAX(CASE WHEN s = 1
                      THEN nb END), 0), 1)) AS y1,
                  ln(GREATEST(COALESCE(MAX(CASE WHEN s = 2
                      THEN nb END), 0), 1)) AS y2,
                  ln(GREATEST(COALESCE(MAX(CASE WHEN s = 4
                      THEN nb END), 0), 1)) AS y4,
                  ln(GREATEST(COALESCE(MAX(CASE WHEN s = 8
                      THEN nb END), 0), 1)) AS y8,
                  COALESCE(MAX(CASE WHEN s = 1 THEN nb END), 0)
                      AS nocc
               FROM tt t LEFT JOIN bc ON bc.i = t.i
               GROUP BY t.i)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               CAST(nocc AS BIGINT) AS n_occupied,
               round(-((4e0 * (ln(1e0) * y1 + ln(2e0) * y2
                               + ln(4e0) * y4 + ln(8e0) * y8)
                        - {lns} * (y1 + y2 + y4 + y8))
                       / (4e0 * {lns2} - {lns} * {lns})), 4)
                   AS fractal_dim
        FROM fpv ORDER BY image_id
    """


def _sql_image_quadrant_asym() -> str:
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        pg AS (SELECT i, y, x, SUM(px) AS s3 FROM gpx
               GROUP BY i, y, x),
        q AS (SELECT p.i,
                 SUM(CASE WHEN p.x < d.w // 2 THEN p.s3 END) AS sl,
                 COUNT(CASE WHEN p.x < d.w // 2 THEN 1 END) AS nl,
                 SUM(CASE WHEN p.x >= (d.w + 1) // 2
                     THEN p.s3 END) AS sr,
                 COUNT(CASE WHEN p.x >= (d.w + 1) // 2
                       THEN 1 END) AS nr,
                 SUM(CASE WHEN p.y < d.h // 2 THEN p.s3 END) AS st_,
                 COUNT(CASE WHEN p.y < d.h // 2 THEN 1 END) AS nt,
                 SUM(CASE WHEN p.y >= (d.h + 1) // 2
                     THEN p.s3 END) AS sb,
                 COUNT(CASE WHEN p.y >= (d.h + 1) // 2
                       THEN 1 END) AS nb
              FROM pg p JOIN praw d ON d.i = p.i
              GROUP BY p.i)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               {_sql_round_even('abs(sl / nl - sr / nr)')} AS lr_asym,
               {_sql_round_even('abs(st_ / nt - sb / nb)')} AS tb_asym
        FROM q ORDER BY image_id
    """


def _sql_image_colorfulness() -> str:
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        pp AS (SELECT i, y, x,
                  MAX(CASE WHEN c = 0 THEN px END) AS r,
                  MAX(CASE WHEN c = 1 THEN px END) AS g,
                  MAX(CASE WHEN c = 2 THEN px END) AS b2
               FROM gpx GROUP BY i, y, x),
        cf AS (SELECT i, r - g AS rg,
                      0.5e0 * (r + g) - b2 AS yb
               FROM pp),
        m AS (SELECT i, AVG(rg) AS mrg, AVG(yb) AS myb,
                 AVG(rg * rg) - AVG(rg) * AVG(rg) AS vrg,
                 AVG(yb * yb) - AVG(yb) * AVG(yb) AS vyb
              FROM cf GROUP BY i)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               {_sql_round_even(
                   'sqrt(GREATEST(vrg + vyb, 0e0))'
                   ' + 0.3e0 * sqrt(mrg * mrg + myb * myb)')}
                   AS colorfulness
        FROM m ORDER BY image_id
    """


def _sql_image_otsu() -> str:
    # between-class variance at every DISTINCT present pixel value of
    # channel 0 (constant across empty bins, so the argmax domain is
    # the same as all-t); every operand is an exact integer in f64, so
    # the engine and this twin land on bit-identical statistics.
    d_expr = ("(c.cs / c.cn - CASE WHEN t.nn - c.cn > 0e0"
              " THEN (t.ss - c.cs) / (t.nn - c.cn) ELSE 0e0 END)")
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        hist AS (SELECT i, CAST(px AS BIGINT) AS v, COUNT(*) AS n
                 FROM gpx WHERE c = 0 GROUP BY i, v),
        tot AS (SELECT i, CAST(SUM(n) AS DOUBLE) AS nn,
                       CAST(SUM(v * n) AS DOUBLE) AS ss
                FROM hist GROUP BY i),
        cum AS (SELECT i, v,
                   CAST(SUM(n) OVER w AS DOUBLE) AS cn,
                   CAST(SUM(v * n) OVER w AS DOUBLE) AS cs
                FROM hist
                WINDOW w AS (PARTITION BY i ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)),
        st AS (SELECT c.i, c.v, t.nn, t.nn - c.cn AS rest,
                  {_sql_round_even(
                      '(c.cn / t.nn) * (1e0 - c.cn / t.nn) * '
                      + d_expr + ' * ' + d_expr)} AS stat
               FROM cum c JOIN tot t USING (i)),
        best AS (SELECT i, v, stat, rest, nn,
                    ROW_NUMBER() OVER (PARTITION BY i
                        ORDER BY stat DESC, v ASC) AS rn
                 FROM st)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               v AS threshold, stat AS between_var,
               {_sql_round_even('rest / nn')} AS fg_frac
        FROM best WHERE rn = 1 ORDER BY image_id
    """


def _sql_image_bitplane() -> str:
    # p1 = exact integer ratio (denominator <= 1024 can never land on
    # a 6dp half, so plain ROUND is side-agnostic); entropy from the
    # unrounded p on both sides.
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        bp AS (SELECT i, bb.bit,
                  SUM((CAST(px AS BIGINT) >> bb.bit) & 1) AS ones,
                  COUNT(*) AS n
               FROM gpx
               CROSS JOIN (SELECT unnest(range(0, 8)) AS bit) bb
               WHERE c = 0 GROUP BY i, bb.bit),
        pe AS (SELECT i, bit, CAST(ones AS DOUBLE) / n AS p FROM bp)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               bit, ROUND(p, 6) AS p1,
               ROUND(-(CASE WHEN p > 0e0 THEN p * log2(p)
                       ELSE 0e0 END)
                     - (CASE WHEN p < 1e0
                        THEN (1e0 - p) * log2(1e0 - p)
                        ELSE 0e0 END), 6) AS entropy
        FROM pe ORDER BY image_id, bit
    """


def _sql_image_neighbor_brighter() -> str:
    # pure integer comparisons: the 8-neighbor self-join is bit-exact
    # vs the engine's shifted-array census; images with w or h < 3
    # have no interior pixels and drop out on both sides.
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        c0 AS (SELECT i, y, x, px FROM gpx WHERE c = 0),
        ctr AS (SELECT c.i, c.y, c.x, c.px
                FROM c0 c JOIN praw d ON d.i = c.i
                WHERE c.x BETWEEN 1 AND d.w - 2
                  AND c.y BETWEEN 1 AND d.h - 2),
        cnt AS (SELECT ctr.i, ctr.y, ctr.x,
                   SUM(CASE WHEN nb.px > ctr.px THEN 1 ELSE 0 END)
                       AS nbright
                FROM ctr JOIN c0 nb ON nb.i = ctr.i
                  AND nb.y BETWEEN ctr.y - 1 AND ctr.y + 1
                  AND nb.x BETWEEN ctr.x - 1 AND ctr.x + 1
                  AND NOT (nb.x = ctr.x AND nb.y = ctr.y)
                GROUP BY ctr.i, ctr.y, ctr.x)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               CAST(nbright AS BIGINT) AS n_brighter,
               COUNT(*) AS n_px
        FROM cnt GROUP BY i, nbright ORDER BY image_id, n_brighter
    """


def _sql_image_grad_orient() -> str:
    # the CASE arms are engine.ops.multimodal._OCTANT_RULES verbatim
    # and in the same order — integer sign/magnitude comparisons only,
    # so no atan2/ulp boundary can diverge.
    from engine.ops.multimodal import _OCTANT_RULES

    arms = "\n".join(
        f"               WHEN {r} THEN {i}"
        for i, r in enumerate(_OCTANT_RULES))
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        c0 AS (SELECT i, y, x, px FROM gpx WHERE c = 0),
        g AS (SELECT c.i,
                 CAST(r.px - l.px AS BIGINT) AS gx,
                 CAST(d2.px - u.px AS BIGINT) AS gy
              FROM c0 c
              JOIN praw dd ON dd.i = c.i
              JOIN c0 l ON l.i = c.i AND l.y = c.y AND l.x = c.x - 1
              JOIN c0 r ON r.i = c.i AND r.y = c.y AND r.x = c.x + 1
              JOIN c0 u ON u.i = c.i AND u.x = c.x AND u.y = c.y - 1
              JOIN c0 d2 ON d2.i = c.i AND d2.x = c.x
                 AND d2.y = c.y + 1
              WHERE c.x BETWEEN 1 AND dd.w - 2
                AND c.y BETWEEN 1 AND dd.h - 2),
        gnz AS (SELECT i, gx, gy FROM g
                WHERE gx <> 0 OR gy <> 0),
        ob AS (SELECT i,
                  CASE
{arms}
                       ELSE 7 END AS octant,
                  gx * gx + gy * gy AS m2
               FROM gnz)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               octant, COUNT(*) AS n_px,
               CAST(SUM(m2) AS BIGINT) AS sum_mag2
        FROM ob GROUP BY i, octant ORDER BY image_id, octant
    """


def _sql_image_quantile_stretch() -> str:
    # explicit rank rule: p = smallest v with cumcount >= ceil(q * n);
    # the clamp sum is an exact integer, one float division at the end.
    sm = ("CASE WHEN q.p_hi > p.p_lo THEN "
          "(CAST(a.s AS DOUBLE) / CAST(t.nn AS DOUBLE)"
          " - CAST(p.p_lo AS DOUBLE)) / CAST(q.p_hi - p.p_lo"
          " AS DOUBLE) ELSE 0e0 END")
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        hist AS (SELECT i, CAST(px AS BIGINT) AS v, COUNT(*) AS n
                 FROM gpx WHERE c = 0 GROUP BY i, v),
        tot AS (SELECT i, SUM(n) AS nn FROM hist GROUP BY i),
        cum AS (SELECT i, v, SUM(n) OVER w AS cn
                FROM hist
                WINDOW w AS (PARTITION BY i ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)),
        ks AS (SELECT i, nn,
                  CAST(ceil(0.02e0 * nn) AS BIGINT) AS k_lo,
                  CAST(ceil(0.98e0 * nn) AS BIGINT) AS k_hi
               FROM tot),
        plo AS (SELECT c.i, MIN(c.v) AS p_lo
                FROM cum c JOIN ks USING (i)
                WHERE c.cn >= ks.k_lo GROUP BY c.i),
        phi AS (SELECT c.i, MIN(c.v) AS p_hi
                FROM cum c JOIN ks USING (i)
                WHERE c.cn >= ks.k_hi GROUP BY c.i),
        agg AS (SELECT h.i,
                   SUM(CASE WHEN h.v < p.p_lo THEN h.n
                       ELSE 0 END) AS n_below,
                   SUM(CASE WHEN h.v > q.p_hi THEN h.n
                       ELSE 0 END) AS n_above,
                   SUM(GREATEST(LEAST(h.v, q.p_hi), p.p_lo) * h.n)
                       AS s
                FROM hist h JOIN plo p USING (i)
                JOIN phi q USING (i)
                GROUP BY h.i)
        SELECT 'img' || lpad(CAST(a.i AS VARCHAR), 9, '0')
                   AS image_id,
               p.p_lo, q.p_hi,
               CAST(a.n_below AS BIGINT) AS n_below,
               CAST(a.n_above AS BIGINT) AS n_above,
               {_sql_round_even(sm)} AS stretch_mean
        FROM agg a JOIN plo p ON p.i = a.i
        JOIN phi q ON q.i = a.i JOIN tot t ON t.i = a.i
        ORDER BY image_id
    """


def _sql_image_glcm(levels: int = 8) -> str:
    # 8-level co-occurrence at (dx=1): integer numerators only
    # (homogeneity scaled by 840 = lcm(1..8)), one float division at
    # the end — summation order cannot matter.
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        q AS (SELECT i, y, x,
                 (CAST(px AS BIGINT) * {levels}) // 256 AS qv
              FROM gpx WHERE c = 0),
        pr AS (SELECT a.i, a.qv AS qa, b.qv AS qb
               FROM q a JOIN q b
                 ON b.i = a.i AND b.y = a.y AND b.x = a.x + 1),
        cell AS (SELECT i, qa, qb, COUNT(*) AS n FROM pr
                 GROUP BY i, qa, qb),
        ag AS (SELECT i, CAST(SUM(n) AS DOUBLE) AS tot,
                  CAST(SUM(n * n) AS DOUBLE) AS s_en,
                  CAST(SUM(n * (qa - qb) * (qa - qb)) AS DOUBLE)
                      AS s_con,
                  CAST(SUM(n * (840 // (1 + abs(qa - qb))))
                       AS DOUBLE) AS s_hom
               FROM cell GROUP BY i)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               {_sql_round_even('s_en / (tot * tot)')} AS glcm_energy,
               {_sql_round_even('s_con / tot')} AS glcm_contrast,
               {_sql_round_even('s_hom / (840e0 * tot)')}
                   AS glcm_homogeneity
        FROM ag ORDER BY image_id
    """


def _sql_image_hu() -> str:
    # raw moments are exact integers in f64; every derived value goes
    # through the SAME expression tree as engine.ops.multimodal
    # .HuMoments (central -> normalized -> invariants), so each float
    # is bit-identical before the 6dp round.
    n3 = "(m00 * m00 * sqrt(m00))"
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        m AS (SELECT i,
                 SUM(px) AS m00,
                 SUM(x * px) AS m10,
                 SUM(y * px) AS m01,
                 SUM(x * x * px) AS m20,
                 SUM(y * y * px) AS m02,
                 SUM(x * y * px) AS m11,
                 SUM(x * x * x * px) AS m30,
                 SUM(y * y * y * px) AS m03,
                 SUM(x * x * y * px) AS m21,
                 SUM(x * y * y * px) AS m12
              FROM gpx WHERE c = 0 GROUP BY i),
        cb AS (SELECT *, m10 / m00 AS xb, m01 / m00 AS yb FROM m),
        mu AS (SELECT i, m00,
                  m20 - xb * m10 AS mu20,
                  m02 - yb * m01 AS mu02,
                  m11 - xb * m01 AS mu11,
                  m30 - 3e0 * xb * m20 + 2e0 * xb * xb * m10 AS mu30,
                  m12 - 2e0 * yb * m11 - xb * m02
                      + 2e0 * yb * yb * m10 AS mu12,
                  m21 - 2e0 * xb * m11 - yb * m20
                      + 2e0 * xb * xb * m01 AS mu21,
                  m03 - 3e0 * yb * m02 + 2e0 * yb * yb * m01 AS mu03
               FROM cb),
        et AS (SELECT i,
                  mu20 / (m00 * m00) AS e20,
                  mu02 / (m00 * m00) AS e02,
                  mu11 / (m00 * m00) AS e11,
                  mu30 / {n3} AS e30,
                  mu12 / {n3} AS e12,
                  mu21 / {n3} AS e21,
                  mu03 / {n3} AS e03
               FROM mu)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
           {_sql_round_even('e20 + e02')} AS hu1,
           {_sql_round_even(
               '(e20 - e02) * (e20 - e02) + 4e0 * e11 * e11')} AS hu2,
           {_sql_round_even(
               '(e30 - 3e0 * e12) * (e30 - 3e0 * e12)'
               ' + (3e0 * e21 - e03) * (3e0 * e21 - e03)')} AS hu3,
           {_sql_round_even(
               '(e30 + e12) * (e30 + e12)'
               ' + (e21 + e03) * (e21 + e03)')} AS hu4
        FROM et ORDER BY image_id
    """


def _sql_image_run_length() -> str:
    # run starts = x=0 or value change vs the left neighbor (LAG
    # within each row); counts are BIGINTs, mean is one int/int
    # division — bit-identical to the engine.
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        q AS (SELECT i, y, x,
                 CASE WHEN px >= 128e0 THEN 1 ELSE 0 END AS b
              FROM gpx WHERE c = 0),
        s AS (SELECT i, b,
                 CASE WHEN lag(b) OVER (PARTITION BY i, y ORDER BY x)
                      IS DISTINCT FROM b THEN 1 ELSE 0 END AS st
              FROM q),
        ag AS (SELECT i,
                  COUNT(*) FILTER (WHERE st = 1) AS n_runs,
                  COUNT(*) FILTER (WHERE st = 1 AND b = 1) AS fg_runs,
                  COUNT(*) AS npx
               FROM s GROUP BY i)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
           n_runs, fg_runs,
           {_sql_round_even(
               'CAST(npx AS DOUBLE) / CAST(n_runs AS DOUBLE)')}
               AS mean_run_len
        FROM ag ORDER BY image_id
    """


def _sql_image_tenengrad(thr: int = 250_000) -> str:
    # Sobel responses via an 8-offset weighted self-join over the
    # regenerated channel-0 grid; gx/gy and the energy sum are exact
    # integers, so engine and twin agree bit-for-bit through the one
    # final division on each statistic.
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        g AS (SELECT i, y, x, CAST(px AS BIGINT) AS v
              FROM gpx WHERE c = 0),
        soff AS (SELECT * FROM (VALUES
            (-1, -1, -1, -1), (-1, 0, 0, -2), (-1, 1, 1, -1),
            (0, -1, -2, 0), (0, 1, 2, 0),
            (1, -1, -1, 1), (1, 0, 0, 2), (1, 1, 1, 1))
            AS t(dy, dx, wx, wy)),
        nb AS (SELECT a.i, a.y, a.x,
                  SUM(b.v * o.wx) AS gx, SUM(b.v * o.wy) AS gy
               FROM g a
               JOIN gdim d ON d.i = a.i
               CROSS JOIN soff o
               JOIN g b ON b.i = a.i AND b.y = a.y + o.dy
                        AND b.x = a.x + o.dx
               WHERE a.y BETWEEN 1 AND d.h - 2
                 AND a.x BETWEEN 1 AND d.w - 2
               GROUP BY a.i, a.y, a.x),
        st AS (SELECT i, COUNT(*) AS n_int,
                  CAST(SUM(gx * gx + gy * gy) AS DOUBLE) AS s,
                  CAST(SUM(CASE WHEN gx * gx + gy * gy >= {thr}
                       THEN 1 ELSE 0 END) AS DOUBLE) AS ne
               FROM nb GROUP BY i)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               {_sql_round_even('s / n_int')} AS tenengrad,
               {_sql_round_even('ne / n_int')} AS edge_frac
        FROM st ORDER BY image_id
    """


def _sql_image_border_contrast() -> str:
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        g AS (SELECT i, y, x, CAST(px AS BIGINT) AS v
              FROM gpx WHERE c = 0),
        st AS (SELECT g.i,
                  SUM(CASE WHEN g.y = 0 OR g.y = d.h - 1
                           OR g.x = 0 OR g.x = d.w - 1
                       THEN g.v ELSE 0 END) AS bs,
                  SUM(CASE WHEN g.y = 0 OR g.y = d.h - 1
                           OR g.x = 0 OR g.x = d.w - 1
                       THEN 1 ELSE 0 END) AS bn,
                  SUM(CASE WHEN g.y > 0 AND g.y < d.h - 1
                           AND g.x > 0 AND g.x < d.w - 1
                       THEN g.v ELSE 0 END) AS isv,
                  SUM(CASE WHEN g.y > 0 AND g.y < d.h - 1
                           AND g.x > 0 AND g.x < d.w - 1
                       THEN 1 ELSE 0 END) AS inn
               FROM g JOIN gdim d ON d.i = g.i
               GROUP BY g.i)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               {_sql_round_even('bs / bn')} AS border_mean,
               {_sql_round_even('isv / inn')} AS inner_mean,
               {_sql_round_even('bs / bn - isv / inn')}
                   AS border_contrast
        FROM st ORDER BY image_id
    """


def _sql_image_dominant_color() -> str:
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        pp AS (SELECT i, y, x,
                  MAX(CASE WHEN c = 0 THEN CAST(px AS BIGINT) END) AS r,
                  MAX(CASE WHEN c = 1 THEN CAST(px AS BIGINT) END) AS g,
                  MAX(CASE WHEN c = 2 THEN CAST(px AS BIGINT) END) AS b2
               FROM gpx GROUP BY i, y, x),
        cc AS (SELECT i,
                  (r // 64) * 16 + (g // 64) * 4 + (b2 // 64) AS code,
                  COUNT(*) AS n
               FROM pp GROUP BY i, code),
        tot AS (SELECT i, SUM(n) AS nn FROM cc GROUP BY i),
        best AS (SELECT i, code, n,
                    ROW_NUMBER() OVER (PARTITION BY i
                        ORDER BY n DESC, code ASC) AS rn
                 FROM cc)
        SELECT 'img' || lpad(CAST(b.i AS VARCHAR), 9, '0') AS image_id,
               CAST(b.code AS BIGINT) AS color_code,
               {_sql_round_even(
                   'CAST(b.n AS DOUBLE) / CAST(t.nn AS DOUBLE)')}
                   AS color_share
        FROM best b JOIN tot t ON t.i = b.i
        WHERE b.rn = 1 ORDER BY image_id
    """


def _sql_image_equalize_audit() -> str:
    # the standard integer equalization map: floor division on exact
    # integer cumulative counts, cdf_min = count of the smallest
    # present value; a constant image maps to level 0.
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        hist AS (SELECT i, CAST(px AS BIGINT) AS v, COUNT(*) AS n
                 FROM gpx WHERE c = 0 GROUP BY i, v),
        tot AS (SELECT i, SUM(n) AS nn FROM hist GROUP BY i),
        cum AS (SELECT i, v, n, SUM(n) OVER w AS cn
                FROM hist
                WINDOW w AS (PARTITION BY i ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)),
        mn AS (SELECT i, MIN(v) AS mv FROM hist GROUP BY i),
        c0 AS (SELECT h.i, h.n AS cdfmin
               FROM hist h JOIN mn ON mn.i = h.i AND h.v = mn.mv),
        eq AS (SELECT c.i, c.n,
                  CASE WHEN t.nn > z.cdfmin
                       THEN ((c.cn - z.cdfmin) * 255)
                            // (t.nn - z.cdfmin)
                       ELSE 0 END AS ev
               FROM cum c JOIN tot t ON t.i = c.i
               JOIN c0 z ON z.i = c.i),
        st AS (SELECT i, CAST(SUM(ev * n) AS DOUBLE) AS s,
                  CAST(SUM(n) AS DOUBLE) AS nn2,
                  COUNT(DISTINCT ev) AS levels
               FROM eq GROUP BY i)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               {_sql_round_even('s / nn2')} AS eq_mean,
               CAST(levels AS BIGINT) AS eq_levels
        FROM st ORDER BY image_id
    """


def _sql_image_busiest_block() -> str:
    # 8x8 block sums / sumsq are exact integers; variance through the
    # shared tree (ss - s*s/n)/n, argmax on the 6dp-rounded statistic
    # with smallest (by, bx) tie-break — mirrors BusiestBlock exactly.
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        blk AS (SELECT i, y // 8 AS by, x // 8 AS bx, COUNT(*) AS n,
                   SUM(px) AS s, SUM(px * px) AS ss
                FROM gpx WHERE c = 0 GROUP BY i, by, bx),
        st AS (SELECT i, by, bx,
                  {_sql_round_even(
                      '(ss - s * s / CAST(n AS DOUBLE))'
                      ' / CAST(n AS DOUBLE)')} AS v
               FROM blk),
        best AS (SELECT i, by, bx, v,
                    ROW_NUMBER() OVER (PARTITION BY i
                        ORDER BY v DESC, by ASC, bx ASC) AS rn
                 FROM st)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               by, bx, v AS block_var
        FROM best WHERE rn = 1 ORDER BY image_id
    """


def _sql_image_radial_profile() -> str:
    # doubled-coordinate integer radii: r2 = (2x-(w-1))^2 +
    # (2y-(h-1))^2 is exact, floor(sqrt(int))//2 is bit-stable in
    # IEEE doubles, and the per-bin mean is exact-int / count.
    r2 = ("(2 * g.x - (d.w - 1)) * (2 * g.x - (d.w - 1))"
          " + (2 * g.y - (d.h - 1)) * (2 * g.y - (d.h - 1))")
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        g2 AS (SELECT g.i, g.px,
                  CAST(FLOOR(SQRT(CAST({r2} AS DOUBLE)))
                       AS BIGINT) // 2 AS rbin
               FROM gpx g JOIN gdim d ON d.i = g.i
               WHERE g.c = 0),
        ag AS (SELECT i, rbin, COUNT(*) AS n_px, SUM(px) AS s
               FROM g2 GROUP BY i, rbin)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
           rbin, {_sql_round_even('s / CAST(n_px AS DOUBLE)')}
               AS mean_px, n_px
        FROM ag ORDER BY image_id, rbin
    """


def _sql_image_norm_moments() -> str:
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)}
        SELECT c AS channel, COUNT(*) AS n_pixels,
               {_sql_round_even('AVG(px)')} AS mean,
               {_sql_round_even(
                   'sqrt(GREATEST(AVG(px * px) '
                   '- AVG(px) * AVG(px), 0e0))')} AS std
        FROM gpx GROUP BY c
    """


def _sql_image_pixel_histogram(bins: int = 16) -> str:
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        hh AS (SELECT c AS channel,
                      (CAST(px AS BIGINT) * {bins}) // 256 AS bin
               FROM gpx),
        spine AS (SELECT ch.c AS channel, bb.b AS bin
                  FROM (SELECT unnest(range(0, 3)) AS c) ch
                  CROSS JOIN (SELECT unnest(range(0, {bins})) AS b) bb),
        cnt AS (SELECT channel, bin, COUNT(*) AS n
                FROM hh GROUP BY channel, bin)
        SELECT s.channel, s.bin, COALESCE(c.n, 0) AS n
        FROM spine s LEFT JOIN cnt c USING (channel, bin)
    """


def _sql_image_patches() -> str:
    # raw16 patch payload: 9-byte header + 8*8*3 pixel bytes = 201
    return f"""
        WITH {_sql_geo_hashes(_GEO_N, [10, 11, 12])},
        {_sql_gdims_body()}
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
               CAST((h // 8) * (w // 8) AS BIGINT) AS n_patches,
               CAST((h // 8) * (w // 8) * 201 AS BIGINT) AS sum_bytes
        FROM gdim
    """


_SQL_LUM_CTE = """
        lum AS (SELECT i, y, x, SUM(px) / 3e0 AS l
                FROM gpx GROUP BY i, y, x)
"""


def _sql_round_even(expr: str, nd: int = 6) -> str:
    """np.round (half-to-even) at ``nd`` decimals — SQL ROUND is
    half-AWAY, which differs on the exact .5 halves that pixel means
    over power-of-two counts produce constantly."""
    s = 10 ** nd
    r = f"(({expr}) * {s}e0)"
    fl = f"FLOOR({r} + 0.5e0)"
    return (f"(({fl} - CASE WHEN {fl} - {r} = 0.5e0 "
            f"AND CAST({fl} AS BIGINT) % 2 <> 0 "
            f"THEN 1 ELSE 0 END) / {s}e0)")


def _sql_image_sharpness() -> str:
    # variance of the 4-neighbor Laplacian of the luminance plane over
    # the interior; variance as mean squared deviation (two-pass, the
    # numpy .var() formula) so float paths track the engine
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        {_SQL_LUM_CTE},
        nb AS (SELECT i, y, x, l,
                  LAG(l)  OVER wy AS lu, LEAD(l) OVER wy AS ld,
                  LAG(l)  OVER wx AS ll, LEAD(l) OVER wx AS lr
               FROM lum
               WINDOW wy AS (PARTITION BY i, x ORDER BY y),
                      wx AS (PARTITION BY i, y ORDER BY x)),
        lap AS (SELECT n.i,
                   -4e0 * n.l + n.lu + n.ld + n.ll + n.lr AS lp
                FROM nb n JOIN praw p ON p.i = n.i
                WHERE n.y BETWEEN 1 AND p.h - 2
                  AND n.x BETWEEN 1 AND p.w - 2),
        lm AS (SELECT i, AVG(lp) AS m FROM lap GROUP BY i)
        SELECT 'img' || lpad(CAST(lap.i AS VARCHAR), 9, '0')
                   AS image_id,
               {_sql_round_even('AVG((lp - m) * (lp - m))')}
                   AS sharpness
        FROM lap JOIN lm ON lm.i = lap.i
        GROUP BY lap.i
    """


def _sql_image_features() -> str:
    # np.gradient: central differences interior, one-sided at edges;
    # lum_std as mean squared deviation (numpy .std() two-pass)
    return f"""
        WITH {_sql_pixels_cte(_GEO_N)},
        {_SQL_LUM_CTE},
        nb AS (SELECT n.i, n.y, n.x, n.l, p.w, p.h,
                  LAG(n.l)  OVER wy AS lu, LEAD(n.l) OVER wy AS ld,
                  LAG(n.l)  OVER wx AS ll, LEAD(n.l) OVER wx AS lr
               FROM lum n JOIN praw p ON p.i = n.i
               WINDOW wy AS (PARTITION BY n.i, n.x ORDER BY n.y),
                      wx AS (PARTITION BY n.i, n.y ORDER BY n.x)),
        grads AS (SELECT i,
                    CASE WHEN y = 0 THEN ld - l
                         WHEN y = h - 1 THEN l - lu
                         ELSE (ld - lu) / 2e0 END AS gy,
                    CASE WHEN x = 0 THEN lr - l
                         WHEN x = w - 1 THEN l - ll
                         ELSE (lr - ll) / 2e0 END AS gx
                  FROM nb),
        chan AS (SELECT i,
                    AVG(CASE WHEN c = 0 THEN px END) AS mean_r,
                    AVG(CASE WHEN c = 1 THEN px END) AS mean_g,
                    AVG(CASE WHEN c = 2 THEN px END) AS mean_b
                 FROM gpx GROUP BY i),
        lmean AS (SELECT i, AVG(l) AS lm FROM lum GROUP BY i),
        lstd AS (SELECT lum.i,
                    sqrt(AVG((l - lm) * (l - lm))) AS ls
                 FROM lum JOIN lmean ON lmean.i = lum.i GROUP BY lum.i),
        edge AS (SELECT i, AVG(sqrt(gx * gx + gy * gy)) AS ee
                 FROM grads GROUP BY i)
        SELECT 'img' || lpad(CAST(chan.i AS VARCHAR), 9, '0')
                   AS image_id,
               'raw16' AS fmt,
               {_sql_round_even('mean_r')} AS mean_r,
               {_sql_round_even('mean_g')} AS mean_g,
               {_sql_round_even('mean_b')} AS mean_b,
               {_sql_round_even('lm')} AS lum_mean,
               {_sql_round_even('ls')} AS lum_std,
               {_sql_round_even('ee')} AS edge_energy
        FROM chan
        JOIN lmean ON lmean.i = chan.i
        JOIN lstd ON lstd.i = chan.i
        JOIN edge ON edge.i = chan.i
    """


def _sql_geohash_counts() -> str:
    """geo_geohash_counts twin: regenerate the fixture lon/lat, apply
    the IDENTICAL quantization expression (floor((lon+180)/360 * 2^15)),
    then rebuild each of the 6 base-32 chars from its 5 interleaved
    bits (even stream = lon, odd = lat, MSB first) — generated
    mechanically so the bit layout can't drift from
    engine/geo/geohash.py."""
    precision, nlon, nlat = 6, 15, 15
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    chars = []
    for c in range(precision):
        terms = []
        for k in range(5):
            t = 5 * c + k
            w = 1 << (4 - k)
            src = "gx" if t % 2 == 0 else "gy"
            sh = (nlon if t % 2 == 0 else nlat) - 1 - t // 2
            terms.append(f"{w} * (({src} >> {sh}) & 1)")
        chars.append(f"substr('{alpha}', CAST(1 + ({' + '.join(terms)}) AS INT), 1)")
    gh = " || ".join(chars)
    return f"""
        WITH {_sql_geo_lonlat(_GEO_N)},
        q AS (SELECT i,
            LEAST(GREATEST(CAST(FLOOR((lon + 180e0) / 360e0 * 32768e0)
                                AS BIGINT), 0), 32767) AS gx,
            LEAST(GREATEST(CAST(FLOOR((lat + 90e0) / 180e0 * 32768e0)
                                AS BIGINT), 0), 32767) AS gy
          FROM gll)
        SELECT {gh} AS geohash, COUNT(*) AS n
        FROM q GROUP BY 1 ORDER BY 1
    """


def _sql_s2_cell_counts() -> str:
    """geo_s2_cell_counts twin: the full S2-like chain in SQL — sphere
    point -> cube face (u, v) -> quantized (i, j) -> level-10 Hilbert
    position (10 unrolled integer rotation steps; the level-10 prefix
    of the level-30 curve equals the level-10 curve of the top-10
    bits) -> packed cell id. engine/geo/s2like.py operation-for-
    operation; the level-16 encode + parent(steps=6) the query runs
    collapses exactly to the level-10 id (bit-prefix property)."""
    steps = []
    for k, s in enumerate([512, 256, 128, 64, 32, 16, 8, 4, 2, 1]):
        steps.append(f"""
        hr{k} AS (SELECT i, face, x{k}, y{k}, d{k},
                    CASE WHEN (x{k} & {s}) > 0 THEN 1 ELSE 0 END AS rx,
                    CASE WHEN (y{k} & {s}) > 0 THEN 1 ELSE 0 END AS ry
                  FROM hs{k}),
        hs{k + 1} AS (SELECT i, face,
              CASE WHEN ry = 0
                   THEN (CASE WHEN rx = 1 THEN {s - 1} - y{k}
                         ELSE y{k} END)
                   ELSE x{k} END AS x{k + 1},
              CASE WHEN ry = 0
                   THEN (CASE WHEN rx = 1 THEN {s - 1} - x{k}
                         ELSE x{k} END)
                   ELSE y{k} END AS y{k + 1},
              d{k} + {s * s} * xor(3 * rx, ry) AS d{k + 1}
            FROM hr{k})""")
    hilbert = ",".join(steps)
    return f"""
        WITH {_sql_geo_lonlat(_GEO_N)},
        sxyz AS (SELECT i,
                   cos(radians(lat)) * cos(radians(lon)) AS sx,
                   cos(radians(lat)) * sin(radians(lon)) AS sy,
                   sin(radians(lat)) AS sz
                 FROM gll),
        sface AS (SELECT i, sx, sy, sz,
                    CASE WHEN abs(sx) >= abs(sy) AND abs(sx) >= abs(sz)
                         THEN (CASE WHEN sx >= 0 THEN 0 ELSE 3 END)
                         WHEN abs(sy) >= abs(sz)
                         THEN (CASE WHEN sy >= 0 THEN 1 ELSE 4 END)
                         ELSE (CASE WHEN sz >= 0 THEN 2 ELSE 5 END)
                    END AS face
                  FROM sxyz),
        suv AS (SELECT i, face,
                  CASE face % 3 WHEN 0 THEN sy WHEN 1 THEN sz
                                ELSE sx END
                  / abs(CASE face % 3 WHEN 0 THEN sx WHEN 1 THEN sy
                                      ELSE sz END) AS u,
                  CASE face % 3 WHEN 0 THEN sz WHEN 1 THEN sx
                                ELSE sy END
                  / abs(CASE face % 3 WHEN 0 THEN sx WHEN 1 THEN sy
                                      ELSE sz END) AS v
                FROM sface),
        sij AS (SELECT i, face,
                  LEAST(CAST(FLOOR((u + 1e0) / 2e0 * 1073741824e0)
                             AS BIGINT), 1073741823) >> 20 AS x0,
                  LEAST(CAST(FLOOR((v + 1e0) / 2e0 * 1073741824e0)
                             AS BIGINT), 1073741823) >> 20 AS y0,
                  CAST(0 AS BIGINT) AS d0
                FROM suv),
        hs0 AS (SELECT * FROM sij),
        {hilbert},
        scell AS (SELECT i,
                    CAST(face AS HUGEINT) * 2305843009213693952
                    + CAST(d10 AS HUGEINT) * 2199023255552
                    + 1099511627776 AS cellh
                  FROM hs10)
        SELECT CAST(CASE WHEN cellh >= 9223372036854775808
                         THEN cellh - 18446744073709551616
                         ELSE cellh END AS BIGINT) AS s2_parent,
               COUNT(*) AS n
        FROM scell GROUP BY 1
    """


def _sql_embedding_near_dups(threshold: float = 0.9) -> str:
    """embedding_near_dups twin: regenerate the planted +-5%
    splitmix-signed perturbations (float32-rounded like the engine),
    compute the 8-plane sign signatures from the inlined seeded
    hyperplanes, and enumerate pairs with signature hamming <= 1 —
    exactly the multi-probe meeting rule (a pair meets in some bucket
    with an exact-probe member iff their signatures differ in at most
    one bit) — then exact-cosine verify."""
    from engine.ops.dedup import _lsh_planes

    pl = _lsh_planes(64, 8, 42)
    rows = ",".join(
        f"({d + 1},{j},{float(pl[d, j])!r})"
        for d in range(64) for j in range(8))
    return f"""
        WITH planes(d, j, val) AS (VALUES {rows}),
        dims AS (SELECT unnest(range(1, 65)) AS d),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
        base AS (SELECT vec_id, d.d AS d, v[d.d] AS val
                 FROM e CROSS JOIN dims d),
        f10 AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 10),
        pert AS (SELECT b.vec_id + 1000000 AS vec_id, b.d,
                    CAST(CAST(b.val * (1e0 + 0.05e0 *
                        (CASE WHEN {_sql_splitmix64(
                            'b.vec_id * 131 + (b.d - 1)')} % 2 = 1
                              THEN -1 ELSE 1 END)) AS FLOAT)
                         AS DOUBLE) AS val
                 FROM base b JOIN f10 USING (vec_id)),
        allv AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        sigj AS (SELECT a.vec_id, p.j, SUM(a.val * p.val) AS dot
                 FROM allv a JOIN planes p ON p.d = a.d
                 GROUP BY a.vec_id, p.j),
        sig AS (SELECT vec_id,
                   SUM(CASE WHEN dot > 0
                       THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                       ELSE 0 END) AS sg
                FROM sigj GROUP BY vec_id),
        nrm AS (SELECT vec_id,
                   GREATEST(sqrt(SUM(val * val)), 1e-12) AS nn
                FROM allv GROUP BY vec_id),
        cand AS (SELECT s1.vec_id AS a, s2.vec_id AS b
                 FROM sig s1 JOIN sig s2
                   ON s1.vec_id < s2.vec_id
                  AND bit_count(xor(s1.sg, s2.sg)) <= 1),
        cosv AS (SELECT c.a, c.b,
                    SUM((va.val / na.nn) * (vb.val / nb.nn)) AS cs
                 FROM cand c
                 JOIN allv va ON va.vec_id = c.a
                 JOIN allv vb ON vb.vec_id = c.b AND vb.d = va.d
                 JOIN nrm na ON na.vec_id = c.a
                 JOIN nrm nb ON nb.vec_id = c.b
                 GROUP BY c.a, c.b)
        SELECT a, b, ROUND(cs, 6) AS cos
        FROM cosv WHERE cs >= {threshold!r}
    """


def _sql_simhash(seed: int = 42) -> str:
    """simhash_documents twin: djb-polynomial token hash widened by
    the splitmix CTE (exactly SimHasher._hash_tokens), per-(doc, bit)
    sign sums, two-BIGINT-halves bit packing (bit 63 is the int64 sign
    bit)."""
    hi = seed << 32
    return f"""
        WITH tok AS (
            SELECT doc_id, t AS token, COUNT(*) AS c
            FROM (SELECT doc_id,
                         unnest(list_filter(
                             string_split_regex(lower(text), '\\s+'),
                             s -> s <> '')) AS t
                  FROM documents)
            GROUP BY doc_id, t
        ),
        ut AS (SELECT DISTINCT token FROM tok),
        h32 AS (SELECT token,
                   list_reduce(
                       list_prepend(CAST(5381 AS BIGINT),
                           list_transform(split(token, ''),
                               ch -> CAST(unicode(ch) AS BIGINT))),
                       (a, c) -> (a * 31 + c) % 4294967296)
                   + {hi} AS p
                FROM ut),
        h64 AS (SELECT token,
                   CAST({_sql_splitmix64('p')} AS UBIGINT) AS h
                FROM h32),
        sbits AS (SELECT t.doc_id, bb.b,
                    SUM(t.c * (CASE WHEN (h64.h >> CAST(bb.b AS INT))
                                         & 1 = 1
                               THEN 1 ELSE -1 END)) AS s
                 FROM tok t
                 JOIN h64 ON h64.token = t.token
                 CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb
                 GROUP BY t.doc_id, bb.b),
        sh AS (SELECT doc_id,
                  SUM(CASE WHEN s > 0 AND b < 63
                           THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                           ELSE 0 END)
                  + MAX(CASE WHEN s > 0 AND b = 63 THEN 1 ELSE 0 END)
                    * (-9223372036854775807 - 1) AS hv
               FROM sbits GROUP BY doc_id)
        SELECT d.doc_id, CAST(COALESCE(sh.hv, 0) AS BIGINT) AS simhash
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN sh ON sh.doc_id = d.doc_id
    """


def _sql_winnow(k: int = 8, w: int = 4, seed: int = 42) -> str:
    """docs_winnow_fingerprints twin: per-position 8-char-gram djb32
    (list_reduce over codepoints) widened by the splitmix CTE —
    exactly dedup.winnow_fingerprints — then a w-row window MIN and a
    per-doc DISTINCT. fp_min converts UBIGINT -> the engine's int64
    view via the HUGEINT two's-complement shift."""
    hi = seed << 32
    return f"""
        WITH gpos AS (SELECT doc_id, text,
                 length(text) - {k - 1} AS ng,
                 CAST(unnest(range(1, GREATEST(length(text)
                     - {k - 2}, 1))) AS BIGINT) AS p
              FROM documents WHERE length(text) >= {k}),
        gh32 AS (SELECT doc_id, ng, p,
                    list_reduce(
                        list_prepend(CAST(5381 AS BIGINT),
                            list_transform(
                                split(substring(text, CAST(p AS INT),
                                                {k}), ''),
                                ch -> CAST(unicode(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 4294967296)
                    + {hi} AS hp
                 FROM gpos),
        gh AS (SELECT doc_id, ng, p,
                  CAST({_sql_splitmix64('hp')} AS UBIGINT) AS h
               FROM gh32),
        wm AS (SELECT doc_id, ng, p,
                  MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                               ROWS BETWEEN CURRENT ROW
                               AND {w - 1} FOLLOWING) AS wmin
               FROM gh),
        sel AS (SELECT DISTINCT doc_id, wmin FROM wm
                WHERE p <= GREATEST(ng - {w - 1}, 1)),
        ag AS (SELECT doc_id, COUNT(*) AS n_fp,
                  MIN(wmin) AS fpm
               FROM sel GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(CASE WHEN length(d.text) >= {k}
                    THEN length(d.text) - {k - 1}
                    ELSE 0 END AS BIGINT) AS n_grams,
               CAST(COALESCE(ag.n_fp, 0) AS BIGINT) AS n_fp,
               CAST(COALESCE(
                   CAST(ag.fpm AS HUGEINT)
                   - CASE WHEN ag.fpm >= 9223372036854775808
                          THEN CAST(18446744073709551616 AS HUGEINT)
                          ELSE 0 END, 0) AS BIGINT) AS fp_min
        FROM documents d
        LEFT JOIN ag ON ag.doc_id = d.doc_id
        ORDER BY d.doc_id
    """


def _sql_mmr(nq: int = 3, pool: int = 20, k: int = 5,
             lam: str = "0.7e0") -> str:
    """embedding_mmr_topk twin: greedy MMR unrolled into k selection
    CTEs. Similarities are 6dp-rounded BEFORE the score arithmetic
    (matching simsearch.mmr_topk), the diversity weight is written
    (1e0 - lam) so it equals Python's 1.0 - 0.7 bit-for-bit, and
    each stage's argmax breaks ties on the smallest vec_id."""
    sc = f"{lam} * s - (1e0 - {lam}) * 0e0"
    parts = [f"""
        q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
              FROM embeddings ORDER BY vec_id LIMIT {nq}),
        sc AS (SELECT q.qid, e.vec_id,
                  list_cosine_similarity(q.qe,
                      CAST(e.embedding AS DOUBLE[])) AS c
               FROM q CROSS JOIN embeddings e),
        pool AS (SELECT qid, vec_id, {_sql_round_even('c')} AS s
                 FROM (SELECT qid, vec_id, c,
                          ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY c DESC, vec_id) AS rn
                       FROM sc) WHERE rn <= {pool}),
        pv AS (SELECT p.qid, p.vec_id,
                  CAST(e.embedding AS DOUBLE[]) AS v
               FROM pool p JOIN embeddings e
                 ON e.vec_id = p.vec_id),
        pp AS (SELECT a.qid, a.vec_id AS u, b.vec_id AS w2,
                  {_sql_round_even(
                      'list_cosine_similarity(a.v, b.v)')} AS dd
               FROM pv a JOIN pv b ON a.qid = b.qid),
        sel1 AS (SELECT qid, vec_id, score FROM (
                     SELECT qid, vec_id, {sc} AS score,
                        ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY {sc} DESC, vec_id) AS rn
                     FROM pool) WHERE rn = 1)"""]
    for t in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT qid, vec_id FROM sel{j}" for j in range(1, t))
        st = f"{lam} * s - (1e0 - {lam}) * pen"
        parts.append(f"""
        chosen{t} AS ({prev}),
        cand{t} AS (SELECT p.qid, p.vec_id, p.s, MAX(d.dd) AS pen
                    FROM pool p
                    JOIN pp d ON d.qid = p.qid AND d.u = p.vec_id
                    JOIN chosen{t} ch
                      ON ch.qid = d.qid AND ch.vec_id = d.w2
                    LEFT JOIN chosen{t} ex
                      ON ex.qid = p.qid AND ex.vec_id = p.vec_id
                    WHERE ex.vec_id IS NULL
                    GROUP BY p.qid, p.vec_id, p.s),
        sel{t} AS (SELECT qid, vec_id, score FROM (
                       SELECT qid, vec_id, {st} AS score,
                          ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY {st} DESC, vec_id) AS rn
                       FROM cand{t}) WHERE rn = 1)""")
    final = " UNION ALL ".join(
        f"SELECT qid, {t - 1} AS rank, vec_id, score FROM sel{t}"
        for t in range(1, k + 1))
    return f"""
        WITH {','.join(parts)}
        SELECT qid AS query_vec_id, CAST(rank AS BIGINT) AS rank,
               vec_id, {_sql_round_even('score')} AS mmr_score
        FROM ({final}) ORDER BY query_vec_id, rank
    """


def _sql_kmeans_clusters() -> str:
    cent = _seed_centroids(8)
    return f"""
        WITH cent(c, d, val) AS (VALUES {_sql_centroid_values(cent)}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     sqrt(list_sum(list_transform(
                         CAST(embedding AS DOUBLE[]), x -> x * x)))
                         AS nrm
              FROM embeddings),
        sim AS (SELECT e.vec_id, cent.c,
                       SUM((e.v[cent.d] / GREATEST(e.nrm, 1e-12))
                           * cent.val) AS s
                FROM e CROSS JOIN cent GROUP BY e.vec_id, cent.c),
        pick AS (SELECT vec_id, c, s FROM (
                     SELECT vec_id, c, s, ROW_NUMBER() OVER (
                         PARTITION BY vec_id ORDER BY s DESC, c) AS rn
                     FROM sim) WHERE rn = 1)
        SELECT CAST(c AS INT) AS cluster, COUNT(*) AS n_vecs,
               ROUND(SUM(ROUND(s, 6)) / COUNT(*), 4) AS avg_cos
        FROM pick GROUP BY c
    """


def _sql_cluster_ari() -> str:
    cent = _seed_centroids(8)
    return f"""
        WITH cent(c, d, val) AS (VALUES {_sql_centroid_values(cent)}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     sqrt(list_sum(list_transform(
                         CAST(embedding AS DOUBLE[]), x -> x * x)))
                         AS nrm
              FROM embeddings),
        sim AS (SELECT e.vec_id, cent.c,
                       SUM((e.v[cent.d] / GREATEST(e.nrm, 1e-12))
                           * cent.val) AS s
                FROM e CROSS JOIN cent GROUP BY e.vec_id, cent.c),
        pick AS (SELECT vec_id, c FROM (
                     SELECT vec_id, c, ROW_NUMBER() OVER (
                         PARTITION BY vec_id ORDER BY s DESC, c) AS rn
                     FROM sim) WHERE rn = 1),
        asg AS (SELECT p.c AS cluster, emb.label
                FROM pick p JOIN embeddings emb USING (vec_id)),
        cont AS (SELECT cluster, label, COUNT(*) AS n
                 FROM asg GROUP BY cluster, label),
        ma AS (SELECT cluster, SUM(n) AS a FROM cont
               GROUP BY cluster),
        mb AS (SELECT label, SUM(n) AS b FROM cont GROUP BY label),
        s1 AS (SELECT SUM((n * (n - 1)) // 2) AS sij, SUM(n) AS nt
               FROM cont),
        s2 AS (SELECT SUM((a * (a - 1)) // 2) AS sa,
                      COUNT(*) AS kc FROM ma),
        s3 AS (SELECT SUM((b * (b - 1)) // 2) AS sb,
                      COUNT(*) AS kl FROM mb),
        smi AS (SELECT SUM((CAST(c.n AS DOUBLE) / t.nt)
                    * ln(CAST(c.n AS DOUBLE) * t.nt
                         / (CAST(a.a AS DOUBLE)
                            * CAST(b.b AS DOUBLE)))) AS mi
                FROM cont c
                JOIN ma a USING (cluster) JOIN mb b USING (label)
                CROSS JOIN s1 t),
        shc AS (SELECT -SUM((CAST(a AS DOUBLE) / t.nt)
                    * ln(CAST(a AS DOUBLE) / t.nt)) AS hc
                FROM ma CROSS JOIN s1 t),
        shl AS (SELECT -SUM((CAST(b AS DOUBLE) / t.nt)
                    * ln(CAST(b AS DOUBLE) / t.nt)) AS hl
                FROM mb CROSS JOIN s1 t),
        fin AS (SELECT s1.nt, s2.kc, s3.kl,
                   CAST(s1.sij AS DOUBLE) AS sij,
                   CAST(s2.sa AS DOUBLE) AS sa,
                   CAST(s3.sb AS DOUBLE) AS sb,
                   CAST(s2.sa AS DOUBLE) * CAST(s3.sb AS DOUBLE)
                       / (CAST(s1.nt AS DOUBLE)
                          * (CAST(s1.nt AS DOUBLE) - 1e0) / 2e0)
                       AS expv,
                   smi.mi, shc.hc, shl.hl
                FROM s1, s2, s3, smi, shc, shl)
        SELECT CAST(nt AS BIGINT) AS n_vecs,
               CAST(kc AS BIGINT) AS n_clusters,
               CAST(kl AS BIGINT) AS n_labels,
               round(CASE WHEN (sa + sb) / 2e0 - expv <> 0e0
                     THEN (sij - expv) / ((sa + sb) / 2e0 - expv)
                     ELSE 0e0 END, 6) AS ari,
               round(CASE WHEN hc + hl > 0e0
                     THEN 2e0 * mi / (hc + hl)
                     ELSE 0e0 END, 6) AS nmi
        FROM fin
    """


def _sql_ivf_topk(k: int = 10, nprobe: int = 4) -> str:
    cent = _seed_centroids(16)
    return f"""
        WITH cent(c, d, val) AS (VALUES {_sql_centroid_values(cent)}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     sqrt(list_sum(list_transform(
                         CAST(embedding AS DOUBLE[]), x -> x * x)))
                         AS nrm
              FROM embeddings),
        sims AS (SELECT e.vec_id, cent.c,
                        SUM((e.v[cent.d] / GREATEST(e.nrm, 1e-12))
                            * cent.val) AS s
                 FROM e CROSS JOIN cent GROUP BY e.vec_id, cent.c),
        asg AS (SELECT vec_id, c AS bkt FROM (
                    SELECT vec_id, c, ROW_NUMBER() OVER (
                        PARTITION BY vec_id ORDER BY s DESC, c) AS rn
                    FROM sims) WHERE rn = 1),
        q AS (SELECT vec_id AS qvid, v, nrm,
                     ROW_NUMBER() OVER (ORDER BY vec_id) - 1
                         AS query_ix
              FROM e ORDER BY vec_id LIMIT 5),
        qsim AS (SELECT q.query_ix, cent.c,
                        SUM((q.v[cent.d] / GREATEST(q.nrm, 1e-12))
                            * cent.val) AS s
                 FROM q CROSS JOIN cent GROUP BY q.query_ix, cent.c),
        probe AS (SELECT query_ix, c FROM (
                      SELECT query_ix, c, ROW_NUMBER() OVER (
                          PARTITION BY query_ix
                          ORDER BY s DESC, c) AS rn
                      FROM qsim) WHERE rn <= {nprobe}),
        scored AS (SELECT p.query_ix, a.vec_id,
                      SUM((e.v[dd.d] / GREATEST(e.nrm, 1e-12))
                          * (q.v[dd.d] / GREATEST(q.nrm, 1e-12))) AS c
                   FROM probe p
                   JOIN asg a ON a.bkt = p.c
                   JOIN e ON e.vec_id = a.vec_id
                   JOIN q ON q.query_ix = p.query_ix
                   CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
                   GROUP BY p.query_ix, a.vec_id),
        ranked AS (SELECT query_ix, vec_id, c,
                      ROW_NUMBER() OVER (PARTITION BY query_ix
                                         ORDER BY c DESC, vec_id) - 1
                          AS rank
                   FROM scored)
        SELECT query_ix, CAST(rank AS INT) AS rank, vec_id,
               ROUND(c, 6) AS cos
        FROM ranked WHERE rank < {k}
    """


def _sql_participation_ratio() -> str:
    # trace identities: sum(lambda) = tr(C), sum(lambda^2) = ||C||_F^2
    # -> the PCA participation ratio without an eigensolve
    return """
        WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        dims AS (SELECT unnest(range(1, 65)) AS d),
        m1 AS (SELECT d.d AS i, AVG(v[d.d]) AS mu
               FROM e CROSS JOIN dims d GROUP BY d.d),
        m2 AS (SELECT a.d AS i, b.d AS j, AVG(v[a.d] * v[b.d]) AS m
               FROM e CROSS JOIN dims a CROSS JOIN dims b
               GROUP BY a.d, b.d),
        c AS (SELECT m2.i, m2.j, m2.m - ma.mu * mb.mu AS cij
              FROM m2 JOIN m1 ma ON ma.i = m2.i
                      JOIN m1 mb ON mb.i = m2.j)
        SELECT CAST(64 AS BIGINT) AS n_components,
               ROUND(POWER(SUM(CASE WHEN i = j THEN cij ELSE 0e0 END),
                           2)
                     / SUM(cij * cij), 6) AS participation_ratio
        FROM c
    """


def _sql_geo_full(n: int) -> str:
    """ONE shared hash chain (streams 1-8) + both gll and gcanon —
    for oracles that need geotags AND canonical captions together."""
    return (f"{_sql_geo_hashes(n, [1, 2, 3, 4, 5, 6, 7, 8])}, "
            f"{_sql_gll_body()}, {_sql_gcanon_body()}")


_GEO_FIXTURE_SQL = "/tmp/graft_geo_fixture_1500/*.parquet"
_GEO_AUX_ARTICLES = "/tmp/graft_geo_aux_v3/articles.parquet"
_GEO_AUX_VERTICES = "/tmp/graft_geo_aux_v3/polygon_vertices.parquet"
_GEO_AUX_POLYMETA = "/tmp/graft_geo_aux_v3/polygon_meta.parquet"

# shoelace centroid of each polygon's OUTER ring, rounded like
# engine.ops.geo.polygon_centroids (the engine feeds these rounded
# centroids to the radius join, so the oracle must too)
_SQL_GEO_CENTROIDS = f"""
    gv AS (SELECT admin_id, level, vertex_ix, lon AS x, lat AS y,
               COUNT(*) OVER (PARTITION BY admin_id) AS nv
           FROM read_parquet('{_GEO_AUX_VERTICES}') WHERE ring_ix = 0),
    ge AS (SELECT admin_id, level, x, y,
               COALESCE(LEAD(x) OVER w, FIRST_VALUE(x) OVER w) AS x1,
               COALESCE(LEAD(y) OVER w, FIRST_VALUE(y) OVER w) AS y1
           FROM gv
           WINDOW w AS (PARTITION BY admin_id ORDER BY vertex_ix
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING)),
    gcent AS (SELECT admin_id, ANY_VALUE(level) AS level,
               round(SUM((x + x1) * (x * y1 - x1 * y))
                     / (6e0 * (SUM(x * y1 - x1 * y) / 2e0)), 9)
                   AS centroid_lon,
               round(SUM((y + y1) * (x * y1 - x1 * y))
                     / (6e0 * (SUM(x * y1 - x1 * y) / 2e0)), 9)
                   AS centroid_lat
           FROM ge GROUP BY admin_id)
"""


def _sql_haversine(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """engine.geo.knn.haversine_m, operation-for-operation."""
    return (
        f"2e0 * 6371008.8e0 * asin(sqrt(LEAST(GREATEST("
        f"pow(sin((radians({lat2}) - radians({lat1})) / 2e0), 2) "
        f"+ cos(radians({lat1})) * cos(radians({lat2})) "
        f"* pow(sin((radians({lon2}) - radians({lon1})) / 2e0), 2), "
        f"0e0), 1e0)))"
    )


def _sql_bearing(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """engine.ops.geo._gc_bearing (great-circle initial bearing,
    radians), operation-for-operation."""
    return (
        f"atan2(sin(radians(({lon2}) - ({lon1})))"
        f" * cos(radians({lat2})), "
        f"cos(radians({lat1})) * sin(radians({lat2}))"
        f" - sin(radians({lat1})) * cos(radians({lat2}))"
        f" * cos(radians(({lon2}) - ({lon1}))))"
    )


# even-odd ray cast of every point in gpts(image_id, lon, lat) against
# every polygon ring (engine.geo.pip.points_in_ring crossing rule:
# edge straddles the horizontal AND the +x ray passes left of the
# intersection), holes subtract membership. DuckDB returns NULL for
# 0/0 division, which the crossing CASE folds to 0 — matching the
# engine, where a horizontal edge can never satisfy the straddle test.
_SQL_GEO_PIP = f"""
    gvx AS (SELECT admin_id, level, ring_ix, lon AS x, lat AS y,
            COALESCE(LEAD(lon) OVER w, FIRST_VALUE(lon) OVER w) AS x1,
            COALESCE(LEAD(lat) OVER w, FIRST_VALUE(lat) OVER w) AS y1
        FROM read_parquet('{_GEO_AUX_VERTICES}')
        WINDOW w AS (PARTITION BY admin_id, ring_ix ORDER BY vertex_ix
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING)),
    gpar AS (SELECT p.image_id, v.admin_id, v.ring_ix,
            ANY_VALUE(v.level) AS level,
            SUM(CASE WHEN (v.y > p.lat) != (v.y1 > p.lat)
                          AND p.lon < v.x + (p.lat - v.y) * (v.x1 - v.x)
                                            / (v.y1 - v.y)
                     THEN 1 ELSE 0 END) % 2 AS par
        FROM gpts p CROSS JOIN gvx v
        GROUP BY p.image_id, v.admin_id, v.ring_ix),
    ghits AS (SELECT image_id, admin_id,
            CAST(ANY_VALUE(level) AS INT) AS level
        FROM gpar GROUP BY image_id, admin_id
        HAVING MAX(CASE WHEN ring_ix = 0 THEN par ELSE 0 END) = 1
           AND MAX(CASE WHEN ring_ix > 0 THEN par ELSE 0 END) = 0)
"""

_SQL_GEO_PIP_JOIN = f"""
    WITH __BASE__,
    gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
                    lon, lat FROM gll),
    {_SQL_GEO_PIP}
    SELECT image_id, admin_id, level,
           (ROW_NUMBER() OVER (PARTITION BY image_id, level
                               ORDER BY admin_id) = 1) AS is_primary
    FROM ghits ORDER BY image_id, admin_id
"""


def _sql_pagerank(iters: int = 8, damping: float = 0.85) -> str:
    """Unrolled power iteration over the supplier->part digraph —
    chained CTEs r0..r{iters}, one per iteration (fixed iteration
    count, so no recursive-CTE aggregation restrictions apply).
    Mirrors engine.ops.graph.pagerank: dangling (zero-outdeg) mass is
    redistributed uniformly each step."""
    head = f"""
        WITH edges AS (
            SELECT DISTINCT l_suppkey AS src,
                   CAST(l_partkey + 10000000 AS BIGINT) AS dst
            FROM lineitem
        ),
        nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges)
        ),
        odeg AS (
            SELECT n.node, COALESCE(o.c, 0) AS outdeg
            FROM nodes n LEFT JOIN (
                SELECT src, COUNT(*) AS c FROM edges GROUP BY src
            ) o ON o.src = n.node
        ),
        np_ AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        r0 AS (SELECT node, outdeg, 1.0 / (SELECT n FROM np_) AS rank
               FROM odeg)
    """
    steps = []
    for i in range(iters):
        steps.append(f"""
        , r{i + 1} AS (
            SELECT d.node, d.outdeg,
                   (1.0 - {damping}) / (SELECT n FROM np_) + {damping} * (
                       COALESCE(inc.s, 0.0)
                       + (SELECT COALESCE(SUM(rank), 0.0) FROM r{i}
                          WHERE outdeg = 0) / (SELECT n FROM np_)
                   ) AS rank
            FROM odeg d LEFT JOIN (
                SELECT e.dst AS node, SUM(r.rank / r.outdeg) AS s
                FROM edges e JOIN r{i} r ON r.node = e.src
                GROUP BY e.dst
            ) inc ON inc.node = d.node
        )""")
    return (
        head + "".join(steps)
        + f" SELECT node, ROUND(rank, 8) AS rank FROM r{iters}"
    )


def _sql_lpa(rounds: int = 3) -> str:
    """Unrolled deterministic label propagation over the undirected
    supplier<->part graph — mirrors engine.ops.graph.label_propagation:
    per round every node adopts the most frequent in-neighbor label
    (ties -> smallest label), keeping its own when it has no
    in-neighbor (LEFT JOIN); final output = community sizes."""
    head = """
        WITH e0 AS MATERIALIZED (
            SELECT DISTINCT l_suppkey AS s,
                   CAST(l_partkey + 10000000 AS BIGINT) AS p
            FROM lineitem),
        e AS MATERIALIZED (
            SELECT s AS src, p AS dst FROM e0
            UNION ALL SELECT p, s FROM e0),
        l0 AS (SELECT DISTINCT src AS v, src AS lab FROM e)
    """
    steps = []
    for i in range(rounds):
        steps.append(f"""
        , c{i} AS MATERIALIZED (
            SELECT e.dst AS v, l.lab, COUNT(*) AS c
            FROM e JOIN l{i} l ON l.v = e.src
            GROUP BY e.dst, l.lab),
        p{i} AS (SELECT v, lab FROM (
                    SELECT v, lab, ROW_NUMBER() OVER (
                        PARTITION BY v ORDER BY c DESC, lab) AS rn
                    FROM c{i}) WHERE rn = 1),
        l{i + 1} AS MATERIALIZED (
            SELECT l.v, COALESCE(p.lab, l.lab) AS lab
            FROM l{i} l LEFT JOIN p{i} p ON p.v = l.v)
        """)
    return (head + "".join(steps)
            + f" SELECT lab AS label, CAST(COUNT(*) AS BIGINT) AS size"
            f" FROM l{rounds} GROUP BY lab ORDER BY label")


def _sql_sssp(rounds: int = 4) -> str:
    """Unrolled Bellman-Ford over the undirected supplier<->part
    graph (weight = min l_quantity per edge), source supplier 1 —
    mirrors engine.ops.graph.sssp: each round, dist rows union the
    one-hop relaxations and a MIN per node folds them. MATERIALIZED
    CTEs: each d{i} is referenced twice per step, and inlined CTE
    chains go exponential (the _sql_hits lesson)."""
    head = """
        WITH e0 AS MATERIALIZED (
            SELECT l_suppkey AS s,
                   CAST(l_partkey + 10000000 AS BIGINT) AS p,
                   MIN(CAST(l_quantity AS DOUBLE)) AS w
            FROM lineitem GROUP BY 1, 2),
        e AS MATERIALIZED (
            SELECT s AS src, p AS dst, w FROM e0
            UNION ALL SELECT p, s, w FROM e0),
        d0 AS (SELECT CAST(1 AS BIGINT) AS node, 0.0e0 AS dist)
    """
    steps = []
    for i in range(rounds):
        steps.append(f"""
        , d{i + 1} AS MATERIALIZED (
            SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d{i}
                UNION ALL
                SELECT e.dst AS node, d.dist + e.w AS dist
                FROM d{i} d JOIN e ON e.src = d.node
            ) GROUP BY node)
        """)
    return (head + "".join(steps)
            + f" SELECT node, ROUND(dist, 4) AS dist FROM d{rounds}"
            " ORDER BY node")


def _sql_hits(iters: int = 5) -> str:
    """Unrolled HITS half-steps over the bipartite customer->part
    digraph — mirrors engine.ops.graph.hits: auth = per-dst sum of
    hub, L1-normalize; hub = per-src sum of auth, L1-normalize;
    rounded 8dp before the top-50 selections."""
    head = """
        WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                    WHERE l_orderkey % 5 = 0),
        edges AS MATERIALIZED (
            SELECT DISTINCT o.o_custkey AS src,
                   CAST(l.l_partkey + 10000000 AS BIGINT) AS dst
            FROM li l JOIN orders o ON o.o_orderkey = l.l_orderkey
        ),
        nodes AS MATERIALIZED (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges)
        ),
        h0 AS (SELECT node, 1.0 AS hub FROM nodes)
    """
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
        , a{i}r AS MATERIALIZED (
            SELECT n.node, COALESCE(s.v, 0.0) AS auth
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS node, SUM(h.hub) AS v
                FROM edges e JOIN h{i - 1} h ON h.node = e.src
                GROUP BY e.dst) s ON s.node = n.node
        ),
        a{i} AS MATERIALIZED (SELECT node,
                        auth / (SELECT SUM(auth) FROM a{i}r) AS auth
                 FROM a{i}r),
        h{i}r AS MATERIALIZED (
            SELECT n.node, COALESCE(s.v, 0.0) AS hub
            FROM nodes n LEFT JOIN (
                SELECT e.src AS node, SUM(a.auth) AS v
                FROM edges e JOIN a{i} a ON a.node = e.dst
                GROUP BY e.src) s ON s.node = n.node
        ),
        h{i} AS MATERIALIZED (SELECT node,
                        hub / (SELECT SUM(hub) FROM h{i}r) AS hub
                 FROM h{i}r)""")
    return (
        head + "".join(steps) + f"""
        , fin AS (
            SELECT n.node, ROUND(a.auth, 8) AS auth,
                   ROUND(h.hub, 8) AS hub
            FROM nodes n
            JOIN a{iters} a ON a.node = n.node
            JOIN h{iters} h ON h.node = n.node
        ),
        ta AS (SELECT * FROM fin ORDER BY auth DESC, node LIMIT 50),
        th AS (SELECT * FROM fin ORDER BY hub DESC, node LIMIT 50)
        SELECT node, auth, hub
        FROM (SELECT * FROM ta UNION SELECT * FROM th)
        ORDER BY node
    """)


def _sql_ddsketch(table: str, col: str, qs: tuple, rel_err: float,
                  group: str | None = None) -> str:
    """DDSketch quantile read-back (engine.ops.sketch.ddsketch_quantiles
    / grouped_*): log-gamma bins, cumulative-count rank walk, bin-
    midpoint estimate — all closed-form, so the sketch IS SQL."""
    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    sent = "-9223372036854775808"
    # e0 suffix: parse as DOUBLE, not DECIMAL — the engine's rank
    # ceil(q*total) is float64 (0.9*500 = 450.0000000000000056 -> 451),
    # and a DECIMAL q would ceil to 450 instead
    g = repr(gamma) + "e0"
    qs_sql = "[" + ", ".join(repr(float(q)) + "e0" for q in qs) + "]"
    gcol = f"{group}, " if group else ""
    gpart = f"PARTITION BY {group} " if group else ""
    return f"""
        WITH binned AS (
            SELECT {gcol}CASE WHEN {col} > 0
                   THEN CAST(CEIL(LN({col}) / LN({g})) AS BIGINT)
                   ELSE {sent} END AS bin
            FROM {table}
        ),
        cnt AS (SELECT {gcol}bin, COUNT(*) AS n FROM binned
                GROUP BY {gcol}bin),
        cum AS (SELECT {gcol}bin,
                       SUM(n) OVER ({gpart}ORDER BY bin) AS cumn,
                       SUM(n) OVER ({gpart}) AS total
                FROM cnt),
        qs AS (SELECT UNNEST({qs_sql}) AS q),
        pick AS (
            SELECT {gcol}q, MIN(bin) AS b FROM qs JOIN cum
              ON cumn >= GREATEST(1, CAST(CEIL(q * total) AS BIGINT))
            GROUP BY {gcol}q
        )
        SELECT {gcol}q,
               ROUND(CASE WHEN b = {sent} THEN 0.0
                     ELSE POW({g}, b) * 2.0 / (1.0 + {g}) END, 4) AS est
        FROM pick
    """


# splitmix seed constants of engine.ops.sketch._CM_SEEDS
_CM_SEEDS_SQL = ("11400714819323198485", "14029467366897019727",
                 "1609587929392839161", "2870177450012600261")


def _sql_count_min(keys_hi: int = 10, width: int = 4096) -> str:
    """Count-Min point estimates for user_id 1..keys_hi (engine
    count_min/count_min_query): cell_d(k) = ((h(k)*seed_d) mod 2^64
    >> 32) mod width; est = min over d of the cell's total count."""
    seeds = " UNION ALL ".join(
        f"SELECT {d} AS d, '{s}' AS seed" for d, s in enumerate(_CM_SEEDS_SQL)
    )
    h_ev = _sql_splitmix64("user_id")
    # (h*seed >> 32) % width, seed substituted per row from the seeds CTE
    cell = (f"(({_sql_mulmod64(f'({h_ev})', 'seed')}) // {_M32_SQL}) "
            f"% {width}")
    return f"""
        WITH seeds AS ({seeds}),
        cells AS (
            SELECT d, {cell} AS cell, COUNT(*) AS n
            FROM events CROSS JOIN seeds GROUP BY d, cell
        ),
        keys AS (SELECT UNNEST(range(1, {keys_hi + 1})) AS user_id),
        kc AS (
            SELECT user_id, d, {cell} AS cell
            FROM keys CROSS JOIN seeds
        )
        SELECT user_id, CAST(MIN(COALESCE(c.n, 0)) AS BIGINT) AS est
        FROM kc LEFT JOIN cells c USING (d, cell)
        GROUP BY user_id
    """


def _sql_hll(p: int = 12) -> str:
    """HyperLogLog distinct-user estimate per event_type + global
    (engine hll_count_distinct / grouped_hll_count_distinct): bucket =
    top p hash bits, rank = leading zeros of the remaining bits + 1,
    bias-corrected harmonic mean with the small-range linear-counting
    fallback."""
    m = 1 << p
    # exponent suffix forces DOUBLE — a bare decimal literal parses as
    # DECIMAL(17,16) in DuckDB and overflows when multiplied by m*m
    alpha = repr(0.7213 / (1 + 1.079 / m)) + "e0"
    h = _sql_splitmix64("user_id")
    rank = (f"MAX(CASE WHEN rest = 0 THEN {64 - p + 1} "
            f"ELSE CAST(63 - FLOOR(LOG2(CAST(rest AS DOUBLE))) AS BIGINT) + 1 "
            f"END)")
    est = (f"CASE WHEN {alpha} * {m} * {m} / denom <= 2.5 * {m} "
           f"AND zeros > 0 THEN {m} * LN({m} / CAST(zeros AS DOUBLE)) "
           f"ELSE {alpha} * {m} * {m} / denom END")
    body = f"""
        h AS (
            SELECT event_type, CAST({h} AS UBIGINT) AS hv FROM events
        ),
        parts AS (
            SELECT event_type, hv >> {64 - p} AS idx,
                   CAST((CAST(hv AS HUGEINT) * {m}) % {_M64_SQL}
                        AS UBIGINT) AS rest
            FROM h
        ),
        regs AS (
            SELECT event_type, idx, {rank} AS rank
            FROM parts GROUP BY event_type, idx
        ),
        agg AS (
            SELECT event_type,
                   SUM(POW(2.0, -rank)) + ({m} - COUNT(*)) AS denom,
                   {m} - COUNT(*) AS zeros
            FROM regs GROUP BY event_type
        ),
        per_type AS (
            SELECT event_type,
                   CAST(ROUND({est}) AS BIGINT) AS approx_users
            FROM agg
        ),
        gregs AS (SELECT idx, {rank} AS rank FROM parts GROUP BY idx),
        gagg AS (
            SELECT SUM(POW(2.0, -rank)) + ({m} - COUNT(*)) AS denom,
                   {m} - COUNT(*) AS zeros
            FROM gregs
        ),
        gest AS (SELECT CAST(ROUND({est}) AS BIGINT)
                 AS global_approx_users FROM gagg)
    """
    return (f"WITH {body} SELECT event_type, approx_users, "
            f"global_approx_users FROM per_type CROSS JOIN gest")


# whitespace tokens of lower(text), empties dropped (the engine's
# `[t for t in _WS_RE.split(s.lower()) if t]`)
_SQL_WS_TOKENS_LOWER = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
)
_SQL_WS_TOKENS_RAW = (
    "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"
)


def _sql_shingles(ngram: int, source: str = "documents",
                  where: str = "") -> str:
    """Per-doc n-token shingle STRINGS (chr(31)-joined) of lowercased
    whitespace tokens — the collision-free twin of the engine's
    _shingle_hashes windows (short docs: one shingle of the whole
    text, same min(n, len) rule)."""
    return f"""
        SELECT doc_id, array_to_string(tk[i : i + m - 1], chr(31)) AS sg
        FROM (
            SELECT doc_id, tk, LEAST({ngram}, len(tk)) AS m
            FROM (SELECT doc_id, {_SQL_WS_TOKENS_LOWER} AS tk
                  FROM {source}{where})
            WHERE len(tk) > 0
        ), UNNEST(range(1, len(tk) - m + 2)) AS u(i)
    """


def _sql_char_jaccard_pairs(threshold: float, with_muts: bool) -> str:
    """Shared CTE block for the ngram-Jaccard dedup family twins:
    EXACT char-5-shingle Jaccard pairs over the (optionally
    tail-mutated) document corpus. The engine side is MinHash-LSH
    candidate generation + exact-Jaccard verify; its banding is
    recall-floor escalated (``lsh_params_recall`` >= 0.95 at the
    threshold itself) and MEASURED at full recall on these
    deterministic fixtures — engine pair set == exact all-pairs set at
    sf0.001/0.01/0.1 for both the 0.5 and 0.8 thresholds — so the
    exact semantics below are a valid oracle. Shingles here are the
    raw 5-char windows of lower(text), a bijection of the engine's
    FNV-polynomial window hashes (verified collision-free on the
    fixture vocab: 2092 raw == 2092 hashed), and Jaccard is invariant
    under any shingle bijection. Emits CTEs: corpus, shp, szp, jpairs
    (a < b, jaccard rounded half-to-even at 6dp, >= threshold).

    Cost note: an EXACT all-pairs oracle is inherently quadratic in
    shingle collisions — fast at the driver's sf0.01 gate (~7s for
    all three dedup twins), but >25 min at sf0.1 (small shared vocab
    => the shingle self-join explodes); verify the family at sf0.01,
    like the brute-force PIP parity oracle's 50k cap."""
    if with_muts:
        corpus = """
        corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000000 AS doc_id,
                   substr(text, 1, GREATEST(0, length(text) - 8))
                       || ' extra tail sentence' AS text
            FROM (SELECT doc_id, text FROM documents
                  ORDER BY doc_id LIMIT 10)
        )"""
    else:
        corpus = "corpus AS (SELECT doc_id, text FROM documents)"
    jac = _sql_round_even("CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i)")
    return f"""{corpus},
        shp AS (
            SELECT DISTINCT doc_id, substr(lower(text), p, 5) AS sg
            FROM corpus, UNNEST(range(1, length(text) - 3)) AS u(p)
        ),
        szp AS (SELECT doc_id, COUNT(*) AS n FROM shp GROUP BY doc_id),
        jpairs AS (
            SELECT a, b, jr AS jaccard FROM (
                SELECT i.a, i.b, {jac} AS jr
                FROM (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
                      FROM shp x JOIN shp y
                          ON y.sg = x.sg AND y.doc_id > x.doc_id
                      GROUP BY x.doc_id, y.doc_id) i
                JOIN szp sa ON sa.doc_id = i.a
                JOIN szp sb ON sb.doc_id = i.b
            ) WHERE jr >= {threshold}e0
        )"""


def _sql_minlabel_components() -> str:
    """Min-label connected components over ``jpairs`` via a recursive
    transitive closure (UNION dedups => terminates at the closure;
    near-dup components are tiny, so the closure row count is bounded
    by sum of component sizes squared). Twin of
    ``connected_components_distributed``'s min-label law. Emits CTEs:
    symp, lab(node, label)."""
    return """
        symp AS (SELECT a, b FROM jpairs UNION SELECT b, a FROM jpairs),
        reachp(src, dst) AS (
            SELECT a, a FROM symp
            UNION
            SELECT r.src, e.b FROM reachp r JOIN symp e ON e.a = r.dst
        ),
        lab AS (SELECT src AS node, MIN(dst) AS label
                FROM reachp GROUP BY src)"""


def _sql_k_core(k: int, rounds: int) -> str:
    """Twin of ``graph.k_core`` by UNROLLED peel rounds: round i drops
    every vertex with degree < k in the round-(i-1) subgraph;
    ``n_rounds`` counts the rounds that actually dropped something
    (the engine's census-with-bad-nodes count), so trailing no-op
    rounds are free — ``rounds`` just needs to exceed the peel depth
    (observed 1-2 at sf0.001-0.1; 8 is generous headroom, and the
    sf0.01/sf0.1 conformance sweeps would catch an overflow as a
    mismatch). Every CTE is MATERIALIZED: the round tree references
    each predecessor three times, so un-materialized CTEs inline
    exponentially (3^rounds parquet opens — measured 'too many open
    files' at rounds=8)."""
    parts = [f"""pe0 AS MATERIALIZED (
            SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1 JOIN lineitem l2
              ON l2.l_orderkey = l1.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            WHERE l1.l_orderkey % 5 = 0)"""]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f"""d{i} AS MATERIALIZED (
            SELECT node, COUNT(*) AS deg FROM
              (SELECT a AS node FROM pe{p}
               UNION ALL SELECT b AS node FROM pe{p})
            GROUP BY node)""")
        parts.append(f"s{i} AS (SELECT node FROM d{i} WHERE deg >= {k})")
        parts.append(
            f"b{i} AS (SELECT CASE WHEN EXISTS(SELECT 1 FROM d{i} "
            f"WHERE deg < {k}) THEN 1 ELSE 0 END AS r)")
        parts.append(f"""pe{i} AS MATERIALIZED (
            SELECT e.a, e.b FROM pe{p} e
            JOIN s{i} sa ON sa.node = e.a
            JOIN s{i} sb ON sb.node = e.b)""")
    nr = " + ".join(f"(SELECT r FROM b{i})" for i in range(1, rounds + 1))
    return "WITH " + ",\n".join(parts) + f"""
        SELECT CAST({k} AS BIGINT) AS k, CAST({nr} AS BIGINT) AS n_rounds,
               (SELECT COUNT(*) FROM (SELECT a FROM pe{rounds}
                                      UNION SELECT b FROM pe{rounds}))
                   AS n_vertices,
               (SELECT COUNT(*) FROM pe{rounds}) AS n_edges"""


def _sql_enclosing_circles() -> str:
    """Twin of ``geo.enclosing_circles`` by support-set enumeration:
    the smallest enclosing circle is determined by 2 or 3 support
    points, so enumerate every pair (diameter circle) and every
    non-degenerate triple (circumcircle, the engine's exact ``circ3``
    determinant formula), keep candidates containing all fixes
    (tolerance 1e-9 deg absorbs the engine's r*(1+1e-12) inside-test
    slack), and take the min-radius one. Tracks are 30 fixes, so the
    candidate space is C(30,2)+C(30,3) per track — brute force IS the
    scale-appropriate oracle here. 6dp rounding on both sides kills
    the Welzl-vs-circumcenter FP noise (~1e-12)."""
    d = ("(2e0 * (a.lon * (b.lat - c.lat) + b.lon * (c.lat - a.lat)"
         " + c.lon * (a.lat - b.lat)))")
    return f"""
        gt AS MATERIALIZED (SELECT i % 50 AS track_id, i AS seq,
                                   lon, lat FROM gll),
        ctri AS (
            SELECT track_id, ux, uy,
                   sqrt(pow(ax - ux, 2) + pow(ay - uy, 2)) AS r
            FROM (
                SELECT a.track_id AS track_id,
                       a.lon AS ax, a.lat AS ay,
                       ((a.lon*a.lon + a.lat*a.lat) * (b.lat - c.lat)
                        + (b.lon*b.lon + b.lat*b.lat) * (c.lat - a.lat)
                        + (c.lon*c.lon + c.lat*c.lat) * (a.lat - b.lat))
                           / {d} AS ux,
                       ((a.lon*a.lon + a.lat*a.lat) * (c.lon - b.lon)
                        + (b.lon*b.lon + b.lat*b.lat) * (a.lon - c.lon)
                        + (c.lon*c.lon + c.lat*c.lat) * (b.lon - a.lon))
                           / {d} AS uy
                FROM gt a
                JOIN gt b ON b.track_id = a.track_id AND b.seq > a.seq
                JOIN gt c ON c.track_id = a.track_id AND c.seq > b.seq
                WHERE abs({d}) > 0e0)),
        cand AS (
            SELECT p.track_id, (p.lon + q.lon) / 2e0 AS cx,
                   (p.lat + q.lat) / 2e0 AS cy,
                   sqrt(pow(p.lon - q.lon, 2)
                        + pow(p.lat - q.lat, 2)) / 2e0 AS r
            FROM gt p JOIN gt q
                ON q.track_id = p.track_id AND q.seq > p.seq
            UNION ALL SELECT track_id, ux, uy, r FROM ctri),
        mec AS (
            SELECT track_id, cx, cy, r FROM (
                SELECT v.*, ROW_NUMBER() OVER (
                    PARTITION BY track_id ORDER BY r, cx, cy) AS rn
                FROM (
                    SELECT c.track_id, c.cx, c.cy, c.r
                    FROM cand c JOIN gt p ON p.track_id = c.track_id
                    GROUP BY c.track_id, c.cx, c.cy, c.r
                    HAVING MAX(sqrt(pow(p.lon - c.cx, 2)
                                    + pow(p.lat - c.cy, 2)))
                           <= c.r + 1e-9) v)
            WHERE rn = 1)"""


def _sql_clamped_d2(px, py, sx, sy, ex, ey) -> str:
    """Squared distance from point (px,py) to SEGMENT (s..e), clamped
    like ``geo._simplify_open`` (t clipped to [0,1], degenerate
    zero-length segment falls back to point distance)."""
    seg2 = f"(pow(({ex}) - ({sx}), 2) + pow(({ey}) - ({sy}), 2))"
    t = (f"LEAST(GREATEST(((({px}) - ({sx})) * (({ex}) - ({sx}))"
         f" + (({py}) - ({sy})) * (({ey}) - ({sy}))) / {seg2}, "
         f"0e0), 1e0)")
    return (f"CASE WHEN {seg2} = 0e0 THEN pow(({px}) - ({sx}), 2)"
            f" + pow(({py}) - ({sy}), 2)"
            f" ELSE pow(({px}) - (({sx}) + {t} * (({ex}) - ({sx}))), 2)"
            f" + pow(({py}) - (({sy}) + {t} * (({ey}) - ({sy}))), 2)"
            f" END")


def _sql_simplify_tracks(eps: float) -> str:
    """Twin of ``geo.simplify_tracks`` (Douglas-Peucker): DP's
    recursion is a binary interval tree, so precompute for EVERY
    (i, j) interval its first-argmax interior deviation (``pinfo`` —
    np.argmax's first-index tie-break = ROW_NUMBER by d2 DESC, pos
    ASC), then walk the tree with a recursive CTE whose recursive
    term only JOINS that static table (DuckDB forbids aggregates over
    the recursive reference; this shape needs none). Each splitting
    interval contributes its split point to the kept set; max_dev is
    the max over dropped fixes of min clamped distance to the kept
    polyline, exactly the engine's formula."""
    d2_pin = _sql_clamped_d2("p.lon", "p.lat", "s.lon", "s.lat",
                             "e.lon", "e.lat")
    d2_dev = _sql_clamped_d2("dp.lon", "dp.lat", "ka.lon", "ka.lat",
                             "kb.lon", "kb.lat")
    e2 = f"{eps * eps}e0"
    return f"""
        gt AS MATERIALIZED (SELECT i % 50 AS track_id, i AS seq,
                                   lon, lat FROM gll),
        gp AS MATERIALIZED (
            SELECT track_id, lon, lat,
                   ROW_NUMBER() OVER (PARTITION BY track_id
                                      ORDER BY seq) - 1 AS pos,
                   COUNT(*) OVER (PARTITION BY track_id) AS n
            FROM gt),
        pinfo AS MATERIALIZED (
            SELECT track_id, i, j, p AS m, d2 AS maxd2 FROM (
                SELECT s.track_id, s.pos AS i, e.pos AS j, p.pos AS p,
                       {d2_pin} AS d2,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.track_id, s.pos, e.pos
                           ORDER BY {d2_pin} DESC, p.pos) AS rn
                FROM gp s
                JOIN gp e ON e.track_id = s.track_id
                         AND e.pos > s.pos + 1
                JOIN gp p ON p.track_id = s.track_id
                         AND p.pos > s.pos AND p.pos < e.pos)
            WHERE rn = 1),
        ivals(track_id, i, j) AS (
            SELECT track_id, 0, n - 1
            FROM (SELECT DISTINCT track_id, n FROM gp)
            UNION ALL
            SELECT v.track_id,
                   CASE WHEN c.c = 0 THEN v.i ELSE pi.m END,
                   CASE WHEN c.c = 0 THEN pi.m ELSE v.j END
            FROM ivals v
            JOIN pinfo pi ON pi.track_id = v.track_id
                         AND pi.i = v.i AND pi.j = v.j
            CROSS JOIN (VALUES (0), (1)) c(c)
            WHERE pi.maxd2 > {e2}),
        kept AS MATERIALIZED (
            SELECT track_id, CAST(0 AS BIGINT) AS pos
            FROM (SELECT DISTINCT track_id FROM gp)
            UNION
            SELECT track_id, n - 1
            FROM (SELECT DISTINCT track_id, n FROM gp)
            UNION
            SELECT v.track_id, pi.m
            FROM ivals v JOIN pinfo pi
                ON pi.track_id = v.track_id
               AND pi.i = v.i AND pi.j = v.j
            WHERE pi.maxd2 > {e2}),
        kseg AS (
            SELECT track_id, pos AS a,
                   LEAD(pos) OVER (PARTITION BY track_id
                                   ORDER BY pos) AS b
            FROM kept),
        dropped AS (
            SELECT g.track_id, g.pos, g.lon, g.lat FROM gp g
            ANTI JOIN kept k
                ON k.track_id = g.track_id AND k.pos = g.pos),
        devs AS (
            SELECT dp.track_id, dp.pos, MIN({d2_dev}) AS mind2
            FROM dropped dp
            JOIN kseg sg ON sg.track_id = dp.track_id
                        AND sg.b IS NOT NULL
            JOIN gp ka ON ka.track_id = dp.track_id AND ka.pos = sg.a
            JOIN gp kb ON kb.track_id = dp.track_id AND kb.pos = sg.b
            GROUP BY dp.track_id, dp.pos)"""


def _sql_stay_points(dist_m: float, min_fixes: int) -> str:
    """Twin of ``geo.stay_points`` (Li/Zheng greedy anchor scan): the
    scan is sequential per track, but each anchor's behavior is a PURE
    function of its position — ``nf`` precomputes the first fix
    farther than ``dist_m`` from each potential anchor, ``st`` the
    qualifies flag and the next-anchor pointer (run end if the run
    qualifies, pos+1 otherwise) — so the recursive CTE just follows
    the precomputed pointer chain from pos 0 (strictly increasing =>
    terminates; no aggregates over the recursive reference). Stays
    are the qualifying anchors the chain actually reaches."""
    hav = _sql_haversine("a.lat", "a.lon", "b.lat", "b.lon")
    return f"""
        gt AS MATERIALIZED (SELECT i % 50 AS track_id, i AS seq,
                                   lon, lat FROM gll),
        gp AS MATERIALIZED (
            SELECT track_id, seq, lon, lat,
                   ROW_NUMBER() OVER (PARTITION BY track_id
                                      ORDER BY seq) - 1 AS pos,
                   COUNT(*) OVER (PARTITION BY track_id) AS n
            FROM gt),
        nf AS MATERIALIZED (
            SELECT a.track_id, a.pos AS i, a.n,
                   COALESCE(MIN(CASE WHEN {hav} > {dist_m}e0
                                     THEN b.pos END), a.n) AS j
            FROM gp a LEFT JOIN gp b
                ON b.track_id = a.track_id AND b.pos > a.pos
            GROUP BY a.track_id, a.pos, a.n),
        st AS MATERIALIZED (
            SELECT track_id, i, j, n, (j - i) >= {min_fixes} AS qual,
                   CASE WHEN (j - i) >= {min_fixes} THEN j
                        ELSE i + 1 END AS nxt
            FROM nf),
        chain(track_id, i) AS (
            SELECT track_id, 0 FROM (SELECT DISTINCT track_id FROM gp)
            UNION ALL
            SELECT c.track_id, s.nxt FROM chain c
            JOIN st s ON s.track_id = c.track_id AND s.i = c.i
            WHERE s.nxt < s.n),
        stays AS (
            SELECT c.track_id, s.i, s.j,
                   ROW_NUMBER() OVER (PARTITION BY c.track_id
                                      ORDER BY s.i) - 1 AS stay_ix
            FROM chain c
            JOIN st s ON s.track_id = c.track_id AND s.i = c.i
            WHERE s.qual)"""


def _sql_doc_fingerprints() -> str:
    """(doc_id, fingerprint) for every document — the engine's
    FNV-style ``text.fingerprint64`` over utf-8 bytes as a
    list_reduce over code points (the driver corpus is ASCII, so code
    point == byte). Shared by ``fingerprint_documents`` and
    ``docs_incremental_dedup``."""
    return f"""
            SELECT doc_id,
                   CASE WHEN f >= 9223372036854775808
                        THEN CAST(f - {_M64_SQL} AS BIGINT)
                        ELSE CAST(f AS BIGINT) END AS fingerprint
            FROM (
                SELECT doc_id, list_reduce(
                    list_prepend(CAST(1469598103934665603 AS HUGEINT),
                        list_transform(
                            list_filter(split(text, ''), c -> c <> ''),
                            c -> CAST(ord(c) AS HUGEINT))),
                    (h, b) -> CAST(xor(
                        CAST({_sql_mulmod64("h", "1000003")} AS UBIGINT),
                        CAST(b AS UBIGINT)) AS HUGEINT)) AS f
                FROM documents
            )"""


_VT_ZOOM, _VT_NT = 8, 256  # geo_vector_tiles zoom + tile-grid width
_VT_KEY = "admin_id, level, ring_ix, tx, ty"

# Web-Mercator tile units (engine/geo/clip.py lonlat_to_mercator_unit);
# DuckDB has no asinh, so arcsinh(t) is spelled ln(t + sqrt(t*t + 1)).
_VT_LATC = "LEAST(GREATEST(lat, -85.0511e0), 85.0511e0)"
_VT_MERC_Y = (
    f"(1e0 - ln(tan(radians({_VT_LATC}))"
    f" + sqrt(tan(radians({_VT_LATC})) * tan(radians({_VT_LATC}))"
    f" + 1e0)) / pi()) / 2e0 * {_VT_NT}e0")


def _sql_clip_pass(k: int, src: str, axis: int, bound: str,
                   keep_less: bool) -> str:
    """One Sutherland-Hodgman half-plane pass, emission-for-emission
    the engine's ``_clip_halfplane`` (engine/geo/clip.py): classify
    each wraparound edge, emit next-vertex for in->in, the
    intersection for in->out, and intersection-then-next for out->in;
    renumber by (edge, sub-emission). The clipped coordinate is set
    EXACTLY to ``bound`` like the engine. Output ring order is a
    rotation of the engine's, which area/count can't see. Window
    names carry the pass index (one WITH RECURSIVE tree shares a
    window namespace in DuckDB)."""
    v0 = "x" if axis == 0 else "y"
    cmp0 = "<=" if keep_less else ">="
    pred0 = f"({v0} {cmp0} {bound})"
    pred1 = (f"(x1 {cmp0} {bound})" if axis == 0
             else f"(y1 {cmp0} {bound})")
    t = f"(({bound}) - {v0}) / ({'x1 - x' if axis == 0 else 'y1 - y'})"
    if axis == 0:
        ix, iy = f"({bound})", f"y + {t} * (y1 - y)"
    else:
        ix, iy = f"x + {t} * (x1 - x)", f"({bound})"
    return f"""
        e{k} AS (
            SELECT *,
                COALESCE(LEAD(x) OVER w{k},
                         FIRST_VALUE(x) OVER w{k}) AS x1,
                COALESCE(LEAD(y) OVER w{k},
                         FIRST_VALUE(y) OVER w{k}) AS y1
            FROM {src}
            WINDOW w{k} AS (PARTITION BY {_VT_KEY} ORDER BY vid
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)),
        c{k} AS MATERIALIZED (
            SELECT {_VT_KEY},
                   ROW_NUMBER() OVER (PARTITION BY {_VT_KEY}
                                      ORDER BY vid, s.sub) - 1 AS vid,
                   CASE WHEN {pred0} AND {pred1} THEN x1
                        WHEN s.sub = 0 THEN {ix} ELSE x1 END AS x,
                   CASE WHEN {pred0} AND {pred1} THEN y1
                        WHEN s.sub = 0 THEN {iy} ELSE y1 END AS y
            FROM e{k} CROSS JOIN (VALUES (0), (1)) s(sub)
            WHERE ({pred0} AND s.sub = 0) OR (NOT {pred0} AND {pred1}))"""


def _sql_ring_simplify(eps: float) -> str:
    """Twin of ``clip.simplify_ring`` (closed-ring Douglas-Peucker in
    mercator tile units): wrap the anchor at position n, split first
    at the first-argmax farthest-from-anchor vertex, then walk the
    two chord trees exactly like ``_sql_simplify_tracks`` — two
    recursive CTEs (one per root chord; a recursive term may
    reference its own table only once, so two roots with one UNION
    ALL branch each beats encoding both chords in one tree). Rings
    with n <= 3 or a degenerate far-split pass through unchanged,
    matching the engine guard. Emits ``souter`` (simplified outer
    rings, renumbered). Expects CTE ``mv`` (projected vertices)."""
    d2_pin = _sql_clamped_d2("p.x", "p.y", "s.x", "s.y", "e.x", "e.y")
    e2 = f"{eps * eps}e0"
    two_child = """
            SELECT v.admin_id,
                   CASE WHEN c.c = 0 THEN v.i ELSE pi.m END,
                   CASE WHEN c.c = 0 THEN pi.m ELSE v.j END
            FROM {T} v
            JOIN pinfo pi ON pi.admin_id = v.admin_id
                         AND pi.i = v.i AND pi.j = v.j
            CROSS JOIN (VALUES (0), (1)) c(c)
            WHERE pi.maxd2 > {E2}"""
    return f"""
        mvr AS MATERIALIZED (
            SELECT admin_id, level, vertex_ix AS pos, x, y,
                   COUNT(*) OVER (PARTITION BY admin_id) AS n
            FROM mv WHERE ring_ix = 0),
        wring AS MATERIALIZED (
            SELECT admin_id, level, pos, x, y, n FROM mvr
            UNION ALL
            SELECT admin_id, level, n, x, y, n FROM mvr WHERE pos = 0),
        farx AS MATERIALIZED (
            SELECT admin_id, pos AS far, n FROM (
                SELECT admin_id, pos, n,
                       ROW_NUMBER() OVER (PARTITION BY admin_id
                           ORDER BY pow(x - ax, 2) + pow(y - ay, 2)
                                    DESC, pos) AS rn
                FROM (SELECT w.*,
                             FIRST_VALUE(x) OVER (PARTITION BY admin_id
                                 ORDER BY pos) AS ax,
                             FIRST_VALUE(y) OVER (PARTITION BY admin_id
                                 ORDER BY pos) AS ay
                      FROM wring w))
            WHERE rn = 1),
        simple_adm AS (
            SELECT admin_id FROM farx
            WHERE n <= 3 OR far = 0 OR far = n),
        pinfo AS MATERIALIZED (
            SELECT admin_id, i, j, p AS m, d2 AS maxd2 FROM (
                SELECT s.admin_id, s.pos AS i, e.pos AS j, p.pos AS p,
                       {d2_pin} AS d2,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.admin_id, s.pos, e.pos
                           ORDER BY {d2_pin} DESC, p.pos) AS rn
                FROM wring s
                JOIN wring e ON e.admin_id = s.admin_id
                            AND e.pos > s.pos + 1
                JOIN wring p ON p.admin_id = s.admin_id
                            AND p.pos > s.pos AND p.pos < e.pos
                WHERE s.admin_id NOT IN
                      (SELECT admin_id FROM simple_adm))
            WHERE rn = 1),
        ivals(admin_id, i, j) AS (
            SELECT admin_id, 0, far FROM farx
            WHERE admin_id NOT IN (SELECT admin_id FROM simple_adm)
            UNION ALL
            {two_child.format(T='ivals', E2=e2)}),
        iv2(admin_id, i, j) AS (
            SELECT admin_id, far, n FROM farx
            WHERE admin_id NOT IN (SELECT admin_id FROM simple_adm)
            UNION ALL
            {two_child.format(T='iv2', E2=e2)}),
        keptr AS MATERIALIZED (
            SELECT admin_id, pos FROM mvr
            WHERE admin_id IN (SELECT admin_id FROM simple_adm)
            UNION
            SELECT admin_id, CAST(0 AS BIGINT) FROM farx
            WHERE admin_id NOT IN (SELECT admin_id FROM simple_adm)
            UNION
            SELECT admin_id, far FROM farx
            WHERE admin_id NOT IN (SELECT admin_id FROM simple_adm)
            UNION
            SELECT v.admin_id, pi.m FROM ivals v JOIN pinfo pi
                ON pi.admin_id = v.admin_id
               AND pi.i = v.i AND pi.j = v.j
            WHERE pi.maxd2 > {e2}
            UNION
            SELECT v.admin_id, pi.m FROM iv2 v JOIN pinfo pi
                ON pi.admin_id = v.admin_id
               AND pi.i = v.i AND pi.j = v.j
            WHERE pi.maxd2 > {e2}),
        souter AS MATERIALIZED (
            SELECT r.admin_id, r.level, CAST(0 AS BIGINT) AS ring_ix,
                   ROW_NUMBER() OVER (PARTITION BY r.admin_id
                                      ORDER BY r.pos) - 1 AS vertex_ix,
                   r.x, r.y
            FROM mvr r JOIN keptr k
                ON k.admin_id = r.admin_id AND k.pos = r.pos)"""


def _sql_vector_tiles(epsilon: float = 0.0) -> str:
    """Twin of ``geo.vector_tiles``: project every admin ring to
    mercator tile units, optionally Douglas-Peucker the OUTER ring
    (``_sql_ring_simplify`` — the engine simplifies outer rings only),
    fan each ring onto the outer ring's bbox tile range, run the four
    half-plane clip passes, and compute per-(polygon, tile) vertex
    count + net shoelace area (holes with >= 3 clipped vertices
    subtract). tile_key packs (z << 52) | (x << 26) | y like
    ``pipeline/tile.tile_key``."""
    if epsilon > 0.0:
        simp = f"{_sql_ring_simplify(epsilon)},"
        ring_src = f"""
        sv AS MATERIALIZED (
            SELECT * FROM souter
            UNION ALL
            SELECT admin_id, level, ring_ix, vertex_ix, x, y
            FROM mv WHERE ring_ix > 0),"""
    else:
        simp = ""
        ring_src = "sv AS (SELECT admin_id, level, ring_ix," \
                   " vertex_ix, x, y FROM mv),"
    return f"""
        WITH RECURSIVE mv AS MATERIALIZED (
            SELECT admin_id, level, ring_ix, vertex_ix,
                   (lon + 180e0) / 360e0 * {_VT_NT}e0 AS x,
                   {_VT_MERC_Y} AS y
            FROM read_parquet('{_GEO_AUX_VERTICES}')),
        {simp}
        {ring_src}
        trange AS (
            SELECT admin_id,
                   GREATEST(0, CAST(floor(MIN(x)) AS BIGINT)) AS tx0,
                   LEAST({_VT_NT - 1},
                         CAST(floor(MAX(x)) AS BIGINT)) AS tx1,
                   GREATEST(0, CAST(floor(MIN(y)) AS BIGINT)) AS ty0,
                   LEAST({_VT_NT - 1},
                         CAST(floor(MAX(y)) AS BIGINT)) AS ty1
            FROM sv WHERE ring_ix = 0 GROUP BY admin_id),
        c0 AS MATERIALIZED (
            SELECT v.admin_id, v.level, v.ring_ix, gx.tx, gy.ty,
                   v.vertex_ix AS vid, v.x, v.y
            FROM sv v JOIN trange r ON r.admin_id = v.admin_id
            JOIN LATERAL (SELECT UNNEST(range(r.tx0, r.tx1 + 1))
                          AS tx) gx ON true
            JOIN LATERAL (SELECT UNNEST(range(r.ty0, r.ty1 + 1))
                          AS ty) gy ON true),
        {_sql_clip_pass(1, 'c0', 0, 'CAST(tx AS DOUBLE)', False)},
        {_sql_clip_pass(2, 'c1', 0, 'CAST(tx AS DOUBLE) + 1e0', True)},
        {_sql_clip_pass(3, 'c2', 1, 'CAST(ty AS DOUBLE)', False)},
        {_sql_clip_pass(4, 'c3', 1, 'CAST(ty AS DOUBLE) + 1e0', True)},
        ring_area AS (
            SELECT {_VT_KEY}, COUNT(*) AS nv,
                   abs(0.5e0 * SUM(x * y1 - x1 * y)) AS aabs
            FROM (SELECT *,
                      COALESCE(LEAD(x) OVER wra,
                               FIRST_VALUE(x) OVER wra) AS x1,
                      COALESCE(LEAD(y) OVER wra,
                               FIRST_VALUE(y) OVER wra) AS y1
                  FROM c4
                  WINDOW wra AS (PARTITION BY {_VT_KEY} ORDER BY vid
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING))
            GROUP BY {_VT_KEY}),
        net AS (
            SELECT o.admin_id, o.level, o.tx, o.ty, o.nv AS n_vertices,
                   o.aabs - COALESCE(h.hsum, 0e0) AS area
            FROM ring_area o
            LEFT JOIN (SELECT admin_id, tx, ty, SUM(aabs) AS hsum
                       FROM ring_area WHERE ring_ix > 0 AND nv >= 3
                       GROUP BY admin_id, tx, ty) h
                ON h.admin_id = o.admin_id
               AND h.tx = o.tx AND h.ty = o.ty
            WHERE o.ring_ix = 0 AND o.nv >= 3)
        SELECT CAST({_VT_ZOOM} AS BIGINT) * 4503599627370496
                   + tx * 67108864 + ty AS tile_key,
               CAST({_VT_ZOOM} AS BIGINT) AS z, tx AS x, ty AS y,
               admin_id, level, n_vertices,
               {_sql_round_even('area', 9)} AS area
        FROM net WHERE area > 1e-12
        ORDER BY tile_key, admin_id"""


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 4) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "click_view_value_overlaps": """
            SELECT a.event_id AS event_id_a, b.event_id AS event_id_b
            FROM (SELECT event_id, value AS lo, value + 0.1 AS hi
                  FROM events WHERE event_type = 'click') a
            JOIN (SELECT event_id, value AS lo, value + 0.1 AS hi
                  FROM events WHERE event_type = 'view') b
              ON a.lo < b.hi AND b.lo < a.hi
        """,
        "docs_above_p75_chars": """
            SELECT doc_id FROM documents
            WHERE n_chars > (SELECT quantile_disc(n_chars, 0.75)
                             FROM documents)
        """,
        "orders_cube": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   COALESCE(o_orderpriority, 'ALL')
                       AS o_orderpriority,
                   ROUND(SUM(o_totalprice), 2) AS total,
                   COUNT(*) AS n
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY 1, 2
        """,
        "orders_grouping_sets": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   ROUND(SUM(o_totalprice), 2) AS total, COUNT(*) AS n
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """,
        "docs_zscore_chars": """
            SELECT doc_id,
                   ROUND((n_chars - AVG(n_chars) OVER ())
                         / STDDEV_POP(n_chars) OVER (), 4) AS z
            FROM documents
        """,
        "profile_lineitem": """
            SELECT col, n, nulls, min_val, max_val FROM (
              SELECT 'l_discount' AS col, COUNT(*) AS n,
                     COUNT(*) - COUNT(l_discount) AS nulls,
                     ROUND(MIN(l_discount), 4) AS min_val,
                     ROUND(MAX(l_discount), 4) AS max_val FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', COUNT(*),
                     COUNT(*) - COUNT(l_extendedprice),
                     ROUND(MIN(l_extendedprice), 4),
                     ROUND(MAX(l_extendedprice), 4) FROM lineitem
              UNION ALL
              SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
                     ROUND(MIN(l_quantity), 4),
                     ROUND(MAX(l_quantity), 4) FROM lineitem
              UNION ALL
              SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
                     ROUND(MIN(l_tax), 4), ROUND(MAX(l_tax), 4) FROM lineitem
            )
        """,
        "colocated_order_customer_revenue": """
            SELECT c_nationkey, ROUND(SUM(o_totalprice), 4) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey
        """,
        "events_user_count_skew_join": """
            SELECT event_id, user_id, u_n FROM events
            JOIN (SELECT user_id, COUNT(*) AS u_n FROM events
                  GROUP BY user_id) USING (user_id)
        """,
        "embedding_centroid_by_label": """
            SELECT label, i AS dim, ROUND(AVG(CAST(e AS DOUBLE)), 6) AS avg_val
            FROM (SELECT label, UNNEST(embedding) AS e,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings)
            GROUP BY label, i
        """,
        "embedding_sq8_error": f"""
            WITH e AS (SELECT CAST(UNNEST(embedding) AS DOUBLE) AS v,
                          generate_subscripts(embedding, 1) AS dim
                       FROM embeddings),
            r AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx
                  FROM e GROUP BY dim),
            q AS (SELECT e.dim, e.v, r.mn, r.mx,
                     {_sql_round_even('(e.v - r.mn) / (r.mx - r.mn) * 255e0', 0)} AS qv
                  FROM e JOIN r USING (dim)),
            s AS (SELECT dim, mn, mx,
                     v - (mn + qv * (mx - mn) / 255e0) AS err
                  FROM q),
            ag AS (SELECT dim, MIN(mn) AS mn, MIN(mx) AS mx,
                      COUNT(*) AS n, SUM(err * err) AS sse
                   FROM s GROUP BY dim)
            SELECT dim, {_sql_round_even('mn')} AS mn,
                   {_sql_round_even('mx')} AS mx, n,
                   {_sql_round_even('sqrt(sse / CAST(n AS DOUBLE))')}
                       AS rmse
            FROM ag ORDER BY dim
        """,
        "embedding_dim_stats": """
            SELECT i AS dim, ROUND(AVG(CAST(e AS DOUBLE)), 6) AS avg_val
            FROM (SELECT UNNEST(embedding) AS e,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings)
            GROUP BY i
        """,
        "orders_above_cust_avg": """
            SELECT o_orderkey FROM orders
            JOIN (SELECT o_custkey, AVG(o_totalprice) AS a
                  FROM orders GROUP BY o_custkey) t USING (o_custkey)
            WHERE o_totalprice > t.a + 1e-6
        """,
        "orders_price_histogram": """
            SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket_id,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        """,
        "orders_from_csv_by_status": """
            SELECT o_orderstatus, ROUND(SUM(o_totalprice), 2) AS total,
                   COUNT(*) AS n
            FROM orders GROUP BY o_orderstatus
        """,
        "parts_name_like": """
            SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%re%'
        """,
        "orders_by_weekday": """
            SELECT isodow(o_orderdate) AS dow,
                   ROUND(SUM(o_totalprice), 2) AS total, COUNT(*) AS n
            FROM orders GROUP BY 1
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < DATE '1995-03-15'
              AND l_shipdate > DATE '1995-03-15'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "order_share_of_customer": """
            SELECT o_orderkey,
                   ROUND(o_totalprice / SUM(o_totalprice)
                         OVER (PARTITION BY o_custkey), 6) AS share
            FROM orders
        """,
        "event_trailing_hour_sum": """
            SELECT event_id,
                   ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                         AND CURRENT ROW), 4) AS trailing_sum
            FROM events
        """,
        "event_type_transitions": """
            SELECT prev_type, event_type, COUNT(*) AS n FROM (
              SELECT LAG(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_type,
                     event_type
              FROM events)
            WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        """,
        "user_retention_cohorts": """
            SELECT f.cohort_week, w.week, COUNT(DISTINCT w.user_id) AS n_users
            FROM (SELECT user_id,
                         CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS week
                  FROM events) w
            JOIN (SELECT user_id,
                         MIN(CAST(FLOOR(epoch(ts) / 604800) AS BIGINT))
                             AS cohort_week
                  FROM events GROUP BY user_id) f USING (user_id)
            GROUP BY f.cohort_week, w.week
        """,
        "user_funnel_counts": """
            SELECT COUNT(*) AS n_users FROM (
              SELECT user_id,
                     MIN(CASE WHEN event_type = 'view' THEN ts END) AS tv,
                     MIN(CASE WHEN event_type = 'click' THEN ts END) AS tc,
                     MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
              FROM events GROUP BY user_id)
            WHERE tv IS NOT NULL AND tc IS NOT NULL AND tp IS NOT NULL
              AND tv < tc AND tc < tp
        """,
        "orders_page3_by_price": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20
        """,
        "weighted_avg_discount_by_flag": """
            SELECT l_returnflag,
                   ROUND(SUM(l_quantity * l_discount) / SUM(l_quantity), 6)
                       AS wavg_discount
            FROM lineitem GROUP BY l_returnflag
        """,
        "priciest_order_per_status": """
            SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                         ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
              FROM orders) WHERE rn = 1
        """,
        "distinct_users_per_hour": """
            SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        """,
        "busy_users_event_totals": """
            SELECT user_id, ROUND(SUM(value), 4) AS total_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY user_id HAVING COUNT(*) >= 30
        """,
        "ranged_orders_scan": """
            SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
            FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000
        """,
        "auto_join_lineitem_orders": """
            SELECT o_orderpriority,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "zordered_orders_rect": """
            SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
            FROM orders
            WHERE o_custkey BETWEEN 100 AND 500
              AND o_totalprice BETWEEN 50000 AND 150000
        """,
        "nation_region_cross": """
            SELECT n_name, r_name FROM nation CROSS JOIN region
        """,
        "custkeys_any_big_or_urgent": """
            SELECT o_custkey FROM orders WHERE o_totalprice > 200000
            UNION
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        """,
        "custkeys_big_and_urgent": """
            SELECT o_custkey FROM orders WHERE o_totalprice > 200000
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        """,
        "custkeys_never_urgent": """
            SELECT o_custkey FROM orders
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        """,
        "qty_price_regression_by_flag": """
            SELECT l_returnflag,
                   ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_samp,
                   ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
                   ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS icept
            FROM lineitem GROUP BY l_returnflag
        """,
        "docs_packed_by_chars": """
            SELECT doc_id,
                   CAST(SUM(n_chars) OVER w AS BIGINT) AS running_chars,
                   CAST(FLOOR((SUM(n_chars) OVER w - n_chars) / 20000) AS BIGINT)
                       AS pack_id
            FROM documents
            WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        """,
        "revenue_by_nation": """
            SELECT n_name, ROUND(SUM(o_totalprice), 4) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_customers_by_acctbal": """
            SELECT c_custkey, c_name, c_acctbal FROM customer
            ORDER BY c_acctbal DESC LIMIT 10
        """,
        "customers_with_orders": """
            SELECT c_custkey, c_name, c_nationkey FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "customers_without_big_orders": """
            SELECT c_custkey, c_name, c_nationkey FROM customer
            WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        """,
        "distinct_mktsegment": "SELECT DISTINCT c_mktsegment FROM customer",
        "lineitem_revenue_rows": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
            FROM lineitem WHERE l_discount > 0.08
        """,
        "orders_by_month": """
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                   ROUND(SUM(o_totalprice), 2) AS total, COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        """,
        "orders_with_delta_applied": """
            SELECT o_orderkey, o_custkey,
                   ROUND(CASE WHEN o_orderkey % 10 = 3
                              THEN o_totalprice + 1000.0
                              ELSE o_totalprice END, 4) AS o_totalprice
            FROM orders WHERE o_orderkey % 10 <> 7
        """,
        "supplier_stats_by_region": """
            SELECT r_name,
                   COUNT(*) AS n_suppliers,
                   ROUND(SUM(s_acctbal) / COUNT(*), 4) AS avg_bal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "part_supplier_join": """
            SELECT p_brand, ROUND(SUM(l_quantity), 4) AS sum_qty,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "union_order_status": """
            SELECT o_orderstatus, COUNT(*) AS n FROM (
                SELECT o_orderstatus FROM orders WHERE o_orderstatus = 'O'
                UNION ALL
                SELECT o_orderstatus FROM orders WHERE o_orderstatus = 'F'
            ) GROUP BY o_orderstatus
        """,
        "events_json_stats": """
            SELECT event_type,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   COUNT(*) AS n
            FROM events GROUP BY event_type
        """,
        "running_total_by_user": """
            SELECT event_id, user_id,
                   ROUND(SUM(value) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING), 4) AS running_value
            FROM events
        """,
        "sessionize_events": """
            SELECT event_id, user_id,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
            FROM (
                SELECT event_id, user_id, ts,
                       CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 IS NULL THEN 1
                            WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 > INTERVAL 1 HOUR THEN 1
                            ELSE 0 END AS new_sess
                FROM events
            )
        """,
        "top_users_by_events": """
            SELECT user_id, COUNT(*) AS n_events
            FROM events GROUP BY user_id
            ORDER BY n_events DESC, user_id LIMIT 20
        """,
        "scalar_string_funcs": """
            SELECT c_custkey, upper(c_name) AS name_upper,
                   substr(c_name, 1, 8) AS name_prefix,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
            FROM customer
        """,
        "sample_customers": """
            SELECT c_custkey, c_name FROM customer WHERE c_custkey % 17 = 3
        """,
        "events_hourly_window": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   ROUND(SUM(value), 4) AS sum_value, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "events_asof_purchase": """
            WITH pur AS (
                SELECT user_id, ts, event_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'purchase'
            ), p AS (SELECT user_id, ts, event_id, value FROM pur WHERE rn = 1),
            c AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click')
            SELECT c.event_id, c.user_id, c.ts,
                   p.event_id AS purchase_event_id,
                   ROUND(p.value, 4) AS purchase_value
            FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "quantity_range_buckets": """
            SELECT bucket, ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   COUNT(*) AS n
            FROM lineitem
            JOIN (VALUES (1.0, 11.0, 'q1'), (11.0, 21.0, 'q2'),
                         (21.0, 31.0, 'q3'), (31.0, 51.0, 'q4'))
                 r(lo, hi, bucket)
              ON l_quantity >= lo AND l_quantity < hi
            GROUP BY bucket
        """,
        "top3_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(rnk AS BIGINT) AS rank
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rnk
                FROM orders
            ) WHERE rnk <= 3
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id, ts, ROUND(value, 4) AS value
            FROM (
                SELECT user_id, event_id, ts, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "acctbal_quantiles_by_segment": """
            SELECT c_mktsegment,
                   ROUND(quantile_disc(c_acctbal, 0.25), 4) AS q25,
                   ROUND(quantile_disc(c_acctbal, 0.5), 4) AS q50,
                   ROUND(quantile_disc(c_acctbal, 0.75), 4) AS q75
            FROM customer GROUP BY c_mktsegment
        """,
        "rolling_avg_user_value": """
            SELECT event_id, user_id,
                   ROUND(AVG(value) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                       AS rolling_avg
            FROM events
        """,
        "events_pivot_by_user": """
            SELECT user_id,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
                   SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
                   SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup,
                   SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error
            FROM events GROUP BY user_id
        """,
        "qty_price_corr_by_flag": """
            SELECT l_returnflag,
                   ROUND(corr(l_extendedprice, l_quantity), 4) AS corr_qp
            FROM lineitem GROUP BY l_returnflag
        """,
        "stratified_sample_customers": """
            SELECT c_custkey, c_name, c_mktsegment FROM (
                SELECT c_custkey, c_name, c_mktsegment,
                       ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                           ORDER BY (c_custkey * 2654435761) % 4294967296,
                                    c_custkey) AS rn,
                       COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
                FROM customer
            ) WHERE rn <= CEIL(n * 0.125)
        """,
        "docs_token_stats": """
            SELECT lang,
                   CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'), t -> t != ''))) AS BIGINT) AS sum_tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "docs_quality": """
            SELECT doc_id,
                   length(text) AS n_chars_q,
                   ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                         / len(list_filter(string_split_regex(text, '\\s+'), t -> t != '')), 6)
                       AS mean_word_len,
                   ROUND(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                              t -> t IN """ + _STOPWORDS_SQL + """)) AS DOUBLE)
                         / len(list_filter(string_split_regex(text, '\\s+'), t -> t != '')), 6)
                       AS stopword_ratio
            FROM documents
        """,
        "dedup_documents_exact": """
            SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
        """,
        "video_frame_plan": """
            SELECT DISTINCT event_id, n_frames,
                   CASE WHEN i = m - 1 THEN n_frames - 1
                        ELSE CAST(trunc(i * ((n_frames - 1.0) / GREATEST(m - 1, 1)))
                                  AS BIGINT)
                   END AS frame_index
            FROM (
                SELECT event_id, (event_id % 12) + 1 AS n_frames,
                       LEAST(4, (event_id % 12) + 1) AS m
                FROM events
            ), LATERAL (SELECT unnest(generate_series(0, m - 1)) AS i)
        """,
        "audio_chunk_plan": """
            SELECT event_id, n_samples, i AS chunk_index,
                   i * 80000 AS start_sample,
                   LEAST((i + 1) * 80000, n_samples) AS end_sample
            FROM (
                SELECT event_id, ((event_id * 37) % 200001) + 16000 AS n_samples
                FROM events
            ), LATERAL (SELECT unnest(generate_series(
                    0, CAST(ceil(n_samples / 80000.0) AS BIGINT) - 1)) AS i)
        """,
        "order_rank_in_customer": """
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                   RANK() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC) AS rnk,
                   DENSE_RANK() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC) AS drnk
            FROM orders
        """,
        "orders_of_rich_customers": """
            SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS o_totalprice
            FROM orders
            WHERE o_custkey IN (
                SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
            )
        """,
        "docs_vocab_diversity": """
            SELECT d.doc_id,
                   COALESCE(s.n_distinct, 0) AS n_distinct,
                   COALESCE(s.ttr, 0.0) AS ttr
            FROM documents d LEFT JOIN (
                SELECT doc_id,
                       COUNT(DISTINCT t) AS n_distinct,
                       ROUND(COUNT(DISTINCT t)::DOUBLE
                             / GREATEST(COUNT(*), 1), 6) AS ttr
                FROM (
                    SELECT doc_id,
                           UNNEST(regexp_split_to_array(text, '\\s+')) AS t
                    FROM documents
                ) WHERE t <> '' GROUP BY doc_id
            ) s USING (doc_id)
        """,
        "docs_repetition_ratio": """
            WITH t AS (SELECT doc_id,
                    list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '') AS ts
                FROM documents)
            SELECT doc_id,
                   CAST(CASE WHEN len(ts) < 2 THEN 0
                             ELSE len(ts) - 1 END AS BIGINT) AS n_bigrams,
                   ROUND(CASE WHEN len(ts) < 2 THEN 0.0
                         ELSE 1.0 - len(list_distinct(list_transform(
                                  range(1, len(ts)),
                                  i -> ts[i] || ' ' || ts[i + 1])))
                              / (len(ts) - 1.0) END, 6) AS rep_ratio
            FROM t ORDER BY doc_id
        """,
        "parts_never_ordered_heavy": """
            SELECT p_partkey, p_name FROM part
            WHERE p_partkey NOT IN (
                SELECT l_partkey FROM lineitem WHERE l_quantity > 45
            )
        """,
        "user_top_paths": """
            WITH r AS (SELECT user_id, event_type,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS rn
                FROM events),
            p AS (SELECT user_id,
                     string_agg(event_type, '>' ORDER BY rn) AS path
                  FROM r WHERE rn <= 5 GROUP BY user_id)
            SELECT path, COUNT(*) AS n_users FROM p GROUP BY path
            ORDER BY n_users DESC, path LIMIT 10
        """,
        "user_event_type_seq": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id) AS type_seq
            FROM events GROUP BY user_id
        """,
        "top_event_type_per_user": """
            SELECT user_id, event_type AS top_type, n FROM (
                SELECT user_id, event_type, COUNT(*) AS n,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id
                           ORDER BY COUNT(*) DESC, event_type DESC) AS rn
                FROM events GROUP BY user_id, event_type
            ) WHERE rn = 1
        """,
        "acctbal_var_by_segment": """
            SELECT c_mktsegment,
                   ROUND(VAR_POP(c_acctbal), 4) AS var_pop,
                   ROUND(STDDEV_POP(c_acctbal), 4) AS std_pop
            FROM customer GROUP BY c_mktsegment
        """,
        "orders_priority_rollup": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   ROUND(SUM(o_totalprice), 2) AS total,
                   COUNT(*) AS n_orders
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "orders_status_priority_cube": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   ROUND(SUM(o_totalprice), 2) AS total,
                   COUNT(*) AS n_orders
            FROM orders
            GROUP BY CUBE(o_orderstatus, o_orderpriority)
        """,
        "order_pctrank_in_customer": """
            SELECT o_custkey, o_orderkey,
                   ROUND(PERCENT_RANK() OVER (PARTITION BY o_custkey
                                              ORDER BY o_totalprice), 6) AS pct_rnk,
                   ROUND(CUME_DIST() OVER (PARTITION BY o_custkey
                                           ORDER BY o_totalprice), 6) AS cume_d,
                   NTILE(4) OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice, o_orderkey) AS tile4
            FROM orders
        """,
        "event_value_delta": """
            SELECT event_id, user_id,
                   ROUND(COALESCE(value - LAG(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id), 0), 4) AS delta
            FROM events
        """,
        "event_value_window": """
            SELECT event_id, user_id,
                   ROUND(LEAD(value, 1) OVER w, 4) AS next_value,
                   ROUND(FIRST_VALUE(value) OVER w, 4) AS first_value,
                   ROUND(LAST_VALUE(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING), 4) AS last_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "acctbal_qcont_by_segment": """
            SELECT c_mktsegment,
                   ROUND(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
                   ROUND(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal
            FROM customer GROUP BY c_mktsegment
        """,
        "distinct_users_per_event_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "customer_big_order_counts": """
            SELECT c.c_custkey, c.c_name, COALESCE(o.n_big, 0) AS n_big
            FROM customer c LEFT JOIN (
                SELECT o_custkey, COUNT(*) AS n_big FROM orders
                WHERE o_totalprice > 150000.0 GROUP BY o_custkey
            ) o ON c.c_custkey = o.o_custkey
        """,
        "docs_top_tokens": """
            SELECT token, COUNT(*) AS n FROM (
                SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
                FROM documents
            ) WHERE token <> ''
            GROUP BY token ORDER BY n DESC, token LIMIT 50
        """,
        "heavy_hitter_tokens": """
            WITH t2 AS (
                SELECT token FROM (
                    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
                    FROM documents
                ) WHERE token <> ''
            )
            SELECT token, COUNT(*) AS n FROM t2
            GROUP BY token
            HAVING COUNT(*) >= 0.005 * (SELECT COUNT(*) FROM t2)
            ORDER BY n DESC, token
        """,
        "urgent_vs_big_orders": """
            SELECT COALESCE(u.o_custkey, b.o_custkey) AS o_custkey,
                   COALESCE(u.n_urgent, 0) AS n_urgent,
                   COALESCE(b.n_big, 0) AS n_big
            FROM (SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
                  WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) u
            FULL OUTER JOIN
                 (SELECT o_custkey, COUNT(*) AS n_big FROM orders
                  WHERE o_totalprice > 300000.0 GROUP BY o_custkey) b
            ON u.o_custkey = b.o_custkey
        """,
        "embedding_norm_by_label": """
            SELECT label, COUNT(*) AS n_vecs,
                   ROUND(AVG(sqrt(list_sum(list_transform(
                       CAST(embedding AS DOUBLE[]), x -> x*x)))), 4) AS avg_norm
            FROM embeddings GROUP BY label
        """,
        "ann_cosine_range": """
            WITH q AS (
                SELECT vec_id AS query_vec_id, embedding AS qe
                FROM embeddings ORDER BY vec_id LIMIT 5
            )
            SELECT q.query_vec_id, e.vec_id,
                   ROUND(list_cosine_similarity(
                       CAST(q.qe AS DOUBLE[]),
                       CAST(e.embedding AS DOUBLE[])), 6) AS cos
            FROM q CROSS JOIN embeddings e
            WHERE list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                         CAST(e.embedding AS DOUBLE[]))
                  >= 0.25
            ORDER BY query_vec_id, vec_id
        """,
        "ann_cosine_topk": """
            WITH q AS (
                SELECT vec_id AS query_vec_id, embedding AS qe
                FROM embeddings ORDER BY vec_id LIMIT 5
            ),
            scored AS (
                SELECT q.query_vec_id, e.vec_id,
                       list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])) AS c
                FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
                SELECT query_vec_id, vec_id, c,
                       ROW_NUMBER() OVER (PARTITION BY query_vec_id
                                          ORDER BY c DESC, vec_id) - 1 AS rank
                FROM scored
            )
            SELECT query_vec_id, CAST(rank AS INT) AS rank, vec_id,
                   ROUND(c, 6) AS cos
            FROM ranked WHERE rank < 10
        """,
        # ---- round-2 twins for formerly rows-only queries ------------
        "weighted_sample_orders": f"""
            SELECT o_orderkey FROM (
                SELECT o_orderkey,
                       POW((CAST(CAST({_sql_splitmix64("o_orderkey")}
                                 AS UBIGINT) AS DOUBLE) + 0.5)
                           / 18446744073709551616.0,
                           1.0 / GREATEST(o_totalprice, 1e-300)) AS prio
                FROM orders)
            ORDER BY prio DESC, o_orderkey LIMIT 100
        """,
        "supplier_part_pagerank": _sql_pagerank(iters=8, damping=0.85),
        "supplier_part_sssp": _sql_sssp(rounds=4),
        "part_lpa_communities": _sql_lpa(rounds=3),
        "customer_pareto_share": """
            WITH per AS (SELECT o_custkey,
                             SUM(CAST(round(o_totalprice * 100)
                                      AS BIGINT)) AS c
                         FROM orders GROUP BY o_custkey),
            r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC) AS rn
                  FROM per),
            st AS (SELECT COUNT(*) AS n,
                       GREATEST(1, CAST(trunc(COUNT(*) * 0.2)
                                        AS BIGINT)) AS k
                   FROM per)
            SELECT (SELECT CAST(n AS BIGINT) FROM st) AS n_customers,
                   (SELECT k FROM st) AS top_k,
                   ROUND((SELECT CAST(SUM(c) AS DOUBLE) FROM r
                          WHERE rn <= (SELECT k FROM st))
                         / (SELECT CAST(SUM(c) AS DOUBLE) FROM per),
                         6) AS top20_share
        """,
        "user_activity_streaks": """
            WITH d AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 86400000000 AS day
                       FROM events),
            s AS (SELECT user_id, day,
                      CASE WHEN LAG(day) OVER w IS NULL
                                OR day - LAG(day) OVER w > 3
                           THEN 1 ELSE 0 END AS brk
                  FROM d
                  WINDOW w AS (PARTITION BY user_id ORDER BY day)),
            g AS (SELECT user_id, day,
                      SUM(brk) OVER (PARTITION BY user_id
                                     ORDER BY day) AS sid
                  FROM s),
            st AS (SELECT user_id, sid,
                       MAX(day) - MIN(day) + 1 AS span,
                       COUNT(*) AS ndays
                   FROM g GROUP BY user_id, sid)
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks,
                   CAST(MAX(span) AS BIGINT) AS longest_streak_days,
                   CAST(SUM(ndays) AS BIGINT) AS active_days
            FROM st GROUP BY user_id ORDER BY user_id
        """,
        # KMV: the estimate is a pure function of the splitmix hashes,
        # so the twin recomputes the identical value (hash-equal
        # oracle for an approximate-distinct sketch)
        "q5_local_supplier_volume": """
            SELECT n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)
                       AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name ORDER BY n_name
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name, n_name, revenue FROM (
                SELECT c.c_custkey,
                       ANY_VALUE(c.c_name) AS c_name,
                       ANY_VALUE(n.n_name) AS n_name,
                       ROUND(SUM(l.l_extendedprice
                                 * (1 - l.l_discount)), 4) AS revenue
                FROM customer c
                JOIN orders o ON o.o_custkey = c.c_custkey
                JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                JOIN nation n ON n.n_nationkey = c.c_nationkey
                WHERE l.l_returnflag = 'R'
                  AND o.o_orderdate >= TIMESTAMP '1996-10-01'
                  AND o.o_orderdate < TIMESTAMP '1997-01-01'
                GROUP BY c.c_custkey)
            ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "kmv_distinct_users": f"""
            WITH h AS (SELECT DISTINCT
                    CAST({_sql_splitmix64('user_id')} AS UBIGINT) AS hv
                FROM events),
            o AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
                  FROM h),
            st AS (SELECT COUNT(*) AS nd FROM h)
            SELECT CAST(LEAST(256, (SELECT nd FROM st)) AS BIGINT)
                       AS k_used,
                   ROUND(CASE
                       WHEN (SELECT nd FROM st) = 0 THEN 0.0
                       WHEN (SELECT nd FROM st) < 256
                       THEN CAST((SELECT nd FROM st) AS DOUBLE)
                       ELSE 255 / (CAST((SELECT hv FROM o WHERE rn = 256)
                                        AS DOUBLE)
                                   / 18446744073709551616.0)
                   END, 4) AS approx_distinct
        """,
        "events_cuped_means": f"""
            WITH bounds AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi
                            FROM events),
            sp AS (SELECT epoch_ns(lo)
                       + CAST(trunc((epoch_ns(hi) - epoch_ns(lo))
                                    * 0.5) AS BIGINT) AS s
                   FROM bounds),
            xy AS (SELECT user_id,
                       SUM(CASE WHEN epoch_ns(ts) < (SELECT s FROM sp)
                                THEN value ELSE 0 END) AS x,
                       SUM(CASE WHEN epoch_ns(ts) < (SELECT s FROM sp)
                                THEN 0 ELSE value END) AS y
                   FROM events GROUP BY user_id),
            ar AS (SELECT x, y,
                       CAST(CAST({_sql_splitmix64('user_id')} AS UBIGINT)
                            % 2 AS BIGINT) AS arm
                   FROM xy),
            m AS (SELECT arm, CAST(COUNT(*) AS DOUBLE) AS n,
                       SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                       SUM(x * x) AS sxx, SUM(y * y) AS syy
                  FROM ar GROUP BY arm),
            g AS (SELECT SUM(n) AS nn, SUM(sx) AS tsx, SUM(sy) AS tsy,
                       SUM(sxy) AS tsxy, SUM(sxx) AS tsxx FROM m),
            th AS (SELECT
                    COALESCE((tsxy / nn - (tsx / nn) * (tsy / nn))
                    / NULLIF(tsxx / nn - (tsx / nn) * (tsx / nn), 0),
                    0.0) AS theta,
                    tsx / nn AS mx
                   FROM g)
            SELECT CAST(arm AS BIGINT) AS arm, CAST(n AS BIGINT) AS n,
                   ROUND(sy / n, 6) AS mean_raw,
                   ROUND(sy / n - (SELECT theta FROM th)
                         * (sx / n - (SELECT mx FROM th)), 6)
                       AS mean_cuped,
                   ROUND(COALESCE(1.0 - (syy / n - (sy / n) * (sy / n)
                         - 2.0 * (SELECT theta FROM th)
                           * (sxy / n - (sx / n) * (sy / n))
                         + (SELECT theta FROM th)
                           * (SELECT theta FROM th)
                           * (sxx / n - (sx / n) * (sx / n)))
                         / NULLIF(syy / n - (sy / n) * (sy / n), 0),
                         0.0), 6)
                       AS var_reduction
            FROM m ORDER BY arm
        """,
        "purchase_attribution_counts": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
            t AS (SELECT event_id, user_id, ts, event_type FROM events
                  WHERE event_type IN ('click', 'view')),
            m AS (SELECT p.event_id AS pid, t.event_type AS at
                  FROM p JOIN t ON t.user_id = p.user_id
                               AND t.ts <= p.ts
                  QUALIFY ROW_NUMBER() OVER (
                      PARTITION BY p.event_id
                      ORDER BY t.ts DESC, t.event_id DESC) = 1)
            SELECT at AS attributed_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM m GROUP BY at
            UNION ALL
            SELECT 'none',
                   (SELECT COUNT(*) FROM p) - (SELECT COUNT(*) FROM m)
            ORDER BY attributed_type
        """,
        "acctbal_tukey_outliers": """
            WITH q AS (SELECT c_mktsegment,
                           quantile_cont(c_acctbal, 0.25) AS q1,
                           quantile_cont(c_acctbal, 0.75) AS q3
                       FROM customer GROUP BY c_mktsegment),
            f AS (SELECT c_mktsegment, q1 - 1.5 * (q3 - q1) AS lo,
                       q3 + 1.5 * (q3 - q1) AS hi FROM q)
            SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN c.c_acctbal < f.lo
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
                   CAST(SUM(CASE WHEN c.c_acctbal > f.hi
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
            FROM customer c JOIN f USING (c_mktsegment)
            GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
        """,
        "source_mix_weights": """
            WITH agg AS (SELECT source,
                           CAST(COUNT(*) AS BIGINT) AS n_docs,
                           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
                         FROM documents GROUP BY source),
            t AS (SELECT CAST(SUM(sum_chars) AS DOUBLE) AS total,
                       COUNT(*) AS k FROM agg)
            SELECT source, n_docs, sum_chars,
                   ROUND(sum_chars / (SELECT total FROM t), 6)
                       AS char_share,
                   ROUND((1.0 / (SELECT k FROM t))
                         / (sum_chars / (SELECT total FROM t)), 6)
                       AS weight
            FROM agg ORDER BY source
        """,
        "docs_epoch_multiplicity": f"""
            WITH wq AS (SELECT doc_id, text,
                    len(list_filter(string_split_regex(text, '\\s+'),
                                    t -> t != '')) AS n_words,
                    len(list_filter(string_split_regex(lower(text),
                                                       '\\s+'),
                        t -> t IN {_STOPWORDS_SQL})) AS n_stop,
                    length(regexp_replace(text,
                        '[0-9A-Za-z \\t\\n\\r\\x0b\\x0c\\x1c-\\x1f]',
                        '', 'g')) AS n_punct
                FROM documents),
            ql AS (SELECT doc_id,
                    {_sql_round_even(
                        "LEAST(GREATEST("
                        "0.4 * LEAST(1.0, length(text) / 200.0)"
                        " + 0.3 * (CAST(n_stop AS DOUBLE)"
                        "          / GREATEST(n_words, 1))"
                        " + 0.3 * (1.0 - LEAST(1.0,"
                        "     4.0 * CAST(n_punct AS DOUBLE)"
                        "     / GREATEST(length(text), 1)))"
                        ", 0.0), 1.0)")} AS quality
                   FROM wq),
            th AS (SELECT quantile_cont(quality,
                              0.3333333333333333) AS t1,
                          quantile_cont(quality,
                              0.6666666666666666) AS t2
                   FROM ql)
            SELECT CAST(epochs AS BIGINT) AS epochs,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(epochs) AS BIGINT) AS rows_out
            FROM (SELECT CASE
                    WHEN quality > (SELECT t2 FROM th) THEN 3
                    WHEN quality > (SELECT t1 FROM th) THEN 2
                    ELSE 1 END AS epochs
                  FROM ql)
            GROUP BY epochs ORDER BY epochs
        """,
        "docs_bm25_topk": """
            WITH toks AS (
                SELECT doc_id, t FROM (
                    SELECT doc_id,
                           unnest(string_split_regex(lower(text),
                                                     '[^a-z]+')) AS t
                    FROM documents) WHERE t != ''),
            dl AS (SELECT doc_id, COUNT(*) AS len
                   FROM toks GROUP BY doc_id),
            st AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE)
                           FROM documents) AS n_docs,
                          (SELECT CAST(COALESCE(SUM(len), 0) AS DOUBLE)
                           FROM dl) AS sum_len),
            qt AS (SELECT unnest(['merge', 'scan', 'vector',
                                  'window']) AS term),
            dfq AS (SELECT q.term,
                        CAST(COUNT(DISTINCT k.doc_id) AS DOUBLE) AS df
                    FROM qt q LEFT JOIN toks k ON k.t = q.term
                    GROUP BY q.term),
            tf AS (SELECT doc_id, t AS term,
                        CAST(COUNT(*) AS DOUBLE) AS tf
                   FROM toks
                   WHERE t IN ('merge', 'scan', 'vector', 'window')
                   GROUP BY doc_id, t),
            sc AS (SELECT tf.doc_id,
                        SUM(ln(1.0 + ((SELECT n_docs FROM st) - dfq.df
                                      + 0.5) / (dfq.df + 0.5))
                            * tf.tf * (1.2 + 1.0)
                            / (tf.tf + 1.2 * (1.0 - 0.75
                                + 0.75 * dl.len
                                  / ((SELECT sum_len FROM st)
                                     / (SELECT n_docs FROM st))))
                        ) AS score
                   FROM tf
                   JOIN dfq ON dfq.term = tf.term
                   JOIN dl ON dl.doc_id = tf.doc_id
                   GROUP BY tf.doc_id)
            SELECT doc_id, ROUND(score, 6) AS score FROM sc
            ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 20
        """,
        "embedding_label_silhouette": """
            WITH el AS (
                SELECT vec_id, label, CAST(e AS DOUBLE) AS e, i FROM (
                    SELECT vec_id, label, unnest(embedding) AS e,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings)),
            cent AS (SELECT label, i, AVG(e) AS c
                     FROM el GROUP BY label, i),
            d2 AS (SELECT v.vec_id, v.label AS vlabel,
                        c.label AS clabel,
                        SUM((v.e - c.c) * (v.e - c.c)) AS ss
                   FROM el v JOIN cent c ON c.i = v.i
                   GROUP BY v.vec_id, v.label, c.label),
            ab AS (SELECT vec_id, vlabel,
                        MAX(CASE WHEN clabel = vlabel
                                 THEN sqrt(ss) END) AS a,
                        MIN(CASE WHEN clabel != vlabel
                                 THEN sqrt(ss) END) AS b
                   FROM d2 GROUP BY vec_id, vlabel),
            s AS (SELECT vlabel AS label,
                        CASE WHEN b IS NULL THEN 0.0
                             WHEN GREATEST(a, b) > 0
                             THEN (b - a) / GREATEST(a, b)
                             ELSE 0.0 END AS sil
                  FROM ab)
            SELECT label, COUNT(*) AS n, ROUND(AVG(sil), 6) AS mean_sil
            FROM s GROUP BY label ORDER BY label
        """,
        "ann_pq_topk": _sql_pq_topk(10),
        # ---- round-3 twins for formerly rows-only queries ------------
        "ann_ivf_topk": _sql_ivf_topk(10, 4),
        # recall twin: both ranked lists re-derive in SQL (the IVF CTE
        # chain and the brute-force chain run as parenthesized
        # subqueries), then one overlap count per query
        "ann_ivf_recall": f"""
            WITH ivf AS ({_sql_ivf_topk(10, 4)}),
            bfq AS (SELECT vec_id AS query_vec_id, embedding AS qe
                    FROM embeddings ORDER BY vec_id LIMIT 5),
            bfs AS (SELECT q.query_vec_id, e.vec_id,
                        list_cosine_similarity(
                            CAST(q.qe AS DOUBLE[]),
                            CAST(e.embedding AS DOUBLE[])) AS c
                    FROM bfq q CROSS JOIN embeddings e),
            bfr AS (SELECT query_vec_id, vec_id,
                        ROW_NUMBER() OVER (PARTITION BY query_vec_id
                                           ORDER BY c DESC, vec_id)
                            - 1 AS rank
                    FROM bfs),
            bf AS (SELECT query_vec_id, vec_id FROM bfr
                   WHERE rank < 10),
            qmap AS (SELECT query_vec_id,
                        ROW_NUMBER() OVER (ORDER BY query_vec_id) - 1
                            AS query_ix
                     FROM (SELECT DISTINCT query_vec_id FROM bf))
            SELECT i.query_ix,
                   ROUND(COUNT(b.vec_id) / 10.0, 6) AS recall
            FROM ivf i
            LEFT JOIN (SELECT m.query_ix, f.vec_id
                       FROM bf f JOIN qmap m USING (query_vec_id)) b
              ON b.query_ix = i.query_ix AND b.vec_id = i.vec_id
            GROUP BY i.query_ix ORDER BY i.query_ix
        """,
        "embedding_kmeans_clusters": _sql_kmeans_clusters(),
        "embedding_cluster_ari": _sql_cluster_ari(),
        "embedding_participation_ratio": _sql_participation_ratio(),
        # trace moments of the embedding covariance: long-form matrix
        # products over the same m1/m2 covariance CTEs (C2 = C x C,
        # then tr(C^3) = sum C2 o C, tr(C^4) = sum C2 o C2)
        "q18_large_volume_customers": """
            WITH q AS (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
                       FROM lineitem GROUP BY l_orderkey
                       HAVING SUM(l_quantity) > 150)
            SELECT c.c_name, o.o_custkey, o.o_orderkey,
                   o.o_orderdate, o.o_totalprice, q.sum_qty
            FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
                 JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
        """,
        "embedding_label_centroid_sims": """
            WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            dims AS (SELECT unnest(range(1, 65)) AS d),
            m AS (SELECT label, d.d AS dim, AVG(v[d.d]) AS mu
                  FROM e CROSS JOIN dims d GROUP BY label, d.d),
            n AS (SELECT label, sqrt(SUM(mu * mu)) AS nrm
                  FROM m GROUP BY label),
            p AS (SELECT a.label AS la, b.label AS lb,
                         SUM(a.mu * b.mu) AS dot
                  FROM m a JOIN m b
                      ON a.dim = b.dim AND a.label < b.label
                  GROUP BY a.label, b.label)
            SELECT p.la AS label_a, p.lb AS label_b,
                   ROUND(p.dot / (na.nrm * nb.nrm), 6) AS cos
            FROM p JOIN n na ON na.label = p.la
                 JOIN n nb ON nb.label = p.lb
            ORDER BY label_a, label_b
        """,
        "event_gap_quantiles": """
            WITH s AS (SELECT user_id, event_type, event_id,
                              epoch(ts) AS t FROM events),
            g AS (SELECT event_type,
                     t - LAG(t) OVER (PARTITION BY user_id, event_type
                                      ORDER BY t, event_id) AS gap
                  FROM s),
            h AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   ROUND(quantile_disc(gap, 0.5), 6) AS p50_gap_s,
                   ROUND(quantile_disc(gap, 0.9), 6) AS p90_gap_s
            FROM h GROUP BY event_type ORDER BY event_type
        """,
        "q6_forecast_revenue": """
            SELECT ROUND(SUM(l_extendedprice * l_discount), 4)
                       AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q13_customer_distribution": """
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (SELECT c.c_custkey,
                         CAST(COUNT(o.o_custkey) AS BIGINT) AS c_count
                  FROM customer c
                  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                  GROUP BY c.c_custkey)
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "docs_heaps_fit": """
            WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi
                       FROM documents),
            thr AS (SELECT ck, lo + (hi - lo) * f AS t
                    FROM b CROSS JOIN (VALUES (1, 0.125e0),
                        (2, 0.25e0), (3, 0.5e0), (4, 1.0e0))
                        AS v(ck, f)),
            tk AS (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-z]+')) AS token
                   FROM documents),
            md AS (SELECT token, MIN(doc_id) AS md FROM tk
                   GROUP BY token),
            pts AS (SELECT thr.ck,
                       (SELECT COUNT(*) FROM documents d
                        WHERE d.doc_id <= thr.t) AS n_docs,
                       (SELECT COUNT(*) FROM md
                        WHERE md.md <= thr.t) AS vocab
                    FROM thr),
            fit AS (SELECT
                       (AVG(ln(n_docs) * ln(vocab))
                        - AVG(ln(n_docs)) * AVG(ln(vocab)))
                       / (AVG(ln(n_docs) * ln(n_docs))
                          - AVG(ln(n_docs)) * AVG(ln(n_docs)))
                           AS beta
                    FROM pts),
            fk AS (SELECT (SELECT AVG(ln(vocab)) FROM pts)
                       - (SELECT beta FROM fit)
                         * (SELECT AVG(ln(n_docs)) FROM pts) AS ln_k)
            SELECT CAST(ck AS BIGINT) AS ckpt,
                   CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(vocab AS BIGINT) AS vocab,
                   ROUND((SELECT beta FROM fit), 6) AS beta,
                   ROUND((SELECT ln_k FROM fk), 6) AS ln_k
            FROM pts ORDER BY ckpt
        """,
        "orders_lineitem_ri_audit": """
            SELECT 'lineitem->orders' AS fk,
                (SELECT COUNT(*) FROM lineitem) AS n_child,
                (SELECT COUNT(*) FROM orders) AS n_parent,
                (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
                    (SELECT 1 FROM orders o
                     WHERE o.o_orderkey = l.l_orderkey))
                    AS child_orphan_rows,
                (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
                    (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey))
                    AS parent_childless,
                (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey)
                 FROM orders) AS parent_dup_keys
            UNION ALL
            SELECT 'orders->customer',
                (SELECT COUNT(*) FROM orders),
                (SELECT COUNT(*) FROM customer),
                (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
                    (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey)),
                (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
                    (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey)),
                (SELECT COUNT(*) - COUNT(DISTINCT c_custkey)
                 FROM customer)
            ORDER BY fk
        """,
        "embedding_fisher_ratio": """
            WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            dims AS (SELECT unnest(range(1, 65)) AS d),
            ls AS (SELECT label, d.d AS dim, SUM(v[d.d]) AS s,
                          SUM(v[d.d] * v[d.d]) AS ss
                   FROM e CROSS JOIN dims d GROUP BY label, d.d),
            lcnt AS (SELECT label, CAST(COUNT(*) AS DOUBLE) AS nl
                     FROM e GROUP BY label),
            agg AS (SELECT l.label, c.nl, SUM(l.s * l.s) AS s2,
                           SUM(l.ss) AS sq
                    FROM ls l JOIN lcnt c ON c.label = l.label
                    GROUP BY l.label, c.nl),
            tots AS (SELECT SUM(nl) AS n, SUM(s2 / nl) AS sw,
                            SUM(sq) AS sqt,
                            COUNT(*) AS nlab FROM agg),
            gd AS (SELECT dim, SUM(s) AS gs FROM ls GROUP BY dim),
            g2 AS (SELECT SUM(gs * gs) AS gs2 FROM gd)
            SELECT CAST(nlab AS BIGINT) AS n_labels,
                   ROUND((sqt - sw) / n, 6) AS within_var,
                   ROUND((sw - gs2 / n) / n, 6) AS between_var,
                   ROUND(CASE WHEN sqt - sw > 0
                         THEN (sw - gs2 / n) / (sqt - sw)
                         ELSE 0.0 END, 6) AS fisher_ratio
            FROM tots CROSS JOIN g2
        """,
        "embedding_1nn_accuracy": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                              label FROM embeddings),
            q AS (SELECT vec_id AS qid, v AS qv, label AS qlab
                  FROM e ORDER BY vec_id LIMIT 64),
            sc AS (SELECT q.qid, q.qlab, e.vec_id, e.label,
                      list_cosine_similarity(q.qv, e.v) AS c
                   FROM q CROSS JOIN e WHERE e.vec_id <> q.qid),
            best AS (SELECT qid, qlab, label AS plab,
                        ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY c DESC, vec_id) AS rn
                     FROM sc)
            SELECT qlab AS label, CAST(COUNT(*) AS BIGINT) AS n_probes,
                   CAST(SUM(CASE WHEN plab = qlab THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_correct,
                   ROUND(SUM(CASE WHEN plab = qlab THEN 1 ELSE 0 END)
                         / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
            FROM best WHERE rn = 1 GROUP BY qlab ORDER BY qlab
        """,
        "embedding_cov_moments": """
            WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            dims AS (SELECT unnest(range(1, 65)) AS d),
            m1 AS (SELECT d.d AS i, AVG(v[d.d]) AS mu
                   FROM e CROSS JOIN dims d GROUP BY d.d),
            m2 AS (SELECT a.d AS i, b.d AS j, AVG(v[a.d] * v[b.d]) AS m
                   FROM e CROSS JOIN dims a CROSS JOIN dims b
                   GROUP BY a.d, b.d),
            c AS (SELECT m2.i, m2.j, m2.m - ma.mu * mb.mu AS cij
                  FROM m2 JOIN m1 ma ON ma.i = m2.i
                          JOIN m1 mb ON mb.i = m2.j),
            c2 AS (SELECT a.i AS i, b.j AS j, SUM(a.cij * b.cij) AS v
                   FROM c a JOIN c b ON a.j = b.i GROUP BY a.i, b.j)
            SELECT CAST(1 AS BIGINT) AS power,
                   ROUND((SELECT SUM(cij) FROM c WHERE i = j), 6)
                       AS trace_val
            UNION ALL
            SELECT 2, ROUND((SELECT SUM(a.cij * b.cij) FROM c a
                             JOIN c b ON a.i = b.j AND a.j = b.i), 6)
            UNION ALL
            SELECT 3, ROUND((SELECT SUM(x.v * c.cij) FROM c2 x
                             JOIN c ON c.i = x.j AND c.j = x.i), 6)
            UNION ALL
            SELECT 4, ROUND((SELECT SUM(a.v * b.v) FROM c2 a
                             JOIN c2 b ON a.i = b.j AND a.j = b.i), 6)
            ORDER BY power
        """,
        "image_norm_moments": _sql_image_norm_moments(),
        "image_pixel_histogram": _sql_image_pixel_histogram(16),
        # 8x8 area-mean thumbnail checksum over the raw16 subset:
        # integer box boundaries (o*dim)//8, box mean = AVG over the
        # box's pixels (integer sums are exact in double, so this
        # equals the engine's cumsum-difference tot/area bit for bit),
        # half-even rounding, then the position-weighted checksum
        "image_resize": f"""
            WITH {_sql_pixels_cte(_GEO_N)},
            rmap AS (
                SELECT g.i, g.c, g.px, oy.o AS oy, ox.o AS ox
                FROM gpx g JOIN gdim d ON d.i = g.i
                CROSS JOIN (SELECT unnest(range(0, 8)) AS o) oy
                CROSS JOIN (SELECT unnest(range(0, 8)) AS o) ox
                WHERE (oy.o * d.h) // 8 <= g.y
                  AND g.y < ((oy.o + 1) * d.h) // 8
                  AND (ox.o * d.w) // 8 <= g.x
                  AND g.x < ((ox.o + 1) * d.w) // 8),
            ravg AS (SELECT i, oy, ox, c, AVG(px) AS v
                     FROM rmap GROUP BY i, oy, ox, c),
            rpx AS (SELECT i, oy, ox, c,
                        LEAST(GREATEST(
                            FLOOR(v + 0.5e0)
                            - CASE WHEN FLOOR(v + 0.5e0) - v = 0.5e0
                                        AND CAST(FLOOR(v + 0.5e0) AS BIGINT)
                                            % 2 <> 0
                                   THEN 1 ELSE 0 END, 0e0), 255e0) AS pxr
                    FROM ravg)
            SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
                   8 AS resized_w, 8 AS resized_h,
                   CAST(SUM(pxr * (1 + (oy * 8 + ox) * 3 + c))
                        AS BIGINT) AS resized_checksum
            FROM rpx GROUP BY i ORDER BY image_id
        """,
        # externally-planned augmentation (plan hashes = splitmix
        # stream 20): hflip -> rot90 (np.rot90 CCW coordinate maps) ->
        # centered crop (trunc(dim * frac), floor-div offsets), then
        # the same position-weighted checksum over the raw16 subset
        "image_augment": f"""
            WITH {_sql_pixels_cte(_GEO_N, [10, 11, 12, 20])},
            apar AS (SELECT i, (h20 & 1) = 1 AS flip,
                        CAST((h20 >> 1) % 4 AS INT) AS rot,
                        CAST((h20 >> 3) % 3 AS INT) AS cix
                     FROM ghash),
            aflip AS (SELECT g.i, g.c, g.px, d.w, d.h, p.rot, p.cix,
                        p.flip, g.y AS y1,
                        CASE WHEN p.flip THEN d.w - 1 - g.x
                             ELSE g.x END AS x1
                      FROM gpx g JOIN gdim d ON d.i = g.i
                      JOIN apar p ON p.i = g.i),
            arot AS (SELECT i, c, px, rot, cix, flip,
                        CASE rot WHEN 0 THEN y1 WHEN 1 THEN w - 1 - x1
                                 WHEN 2 THEN h - 1 - y1 ELSE x1 END AS y2,
                        CASE rot WHEN 0 THEN x1 WHEN 1 THEN y1
                                 WHEN 2 THEN w - 1 - x1
                                 ELSE h - 1 - y1 END AS x2,
                        CASE WHEN rot % 2 = 1 THEN w ELSE h END AS h2,
                        CASE WHEN rot % 2 = 1 THEN h ELSE w END AS w2
                     FROM aflip),
            adims AS (SELECT i, c, px, flip, rot, cix, y2, x2, h2, w2,
                        CASE cix WHEN 0 THEN 1.0e0 WHEN 1 THEN 0.875e0
                                 ELSE 0.75e0 END AS f
                      FROM arot),
            acrop AS (SELECT i, c, px, flip, rot, f, y2, x2, h2, w2,
                        CAST(GREATEST(1, trunc(h2 * f)) AS INT) AS ch,
                        CAST(GREATEST(1, trunc(w2 * f)) AS INT) AS cw
                      FROM adims),
            afin AS (SELECT i, c, px, flip, rot, f, ch, cw,
                        y2 - (h2 - ch) // 2 AS y3,
                        x2 - (w2 - cw) // 2 AS x3
                     FROM acrop
                     WHERE y2 >= (h2 - ch) // 2
                       AND y2 < (h2 - ch) // 2 + ch
                       AND x2 >= (w2 - cw) // 2
                       AND x2 < (w2 - cw) // 2 + cw)
            SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS image_id,
                   CAST(ANY_VALUE(cw) AS BIGINT) AS aug_w,
                   CAST(ANY_VALUE(ch) AS BIGINT) AS aug_h,
                   ANY_VALUE(flip) AS aug_hflip,
                   CAST(ANY_VALUE(rot) AS BIGINT) AS aug_rot90,
                   ANY_VALUE(f) AS aug_crop,
                   CAST(SUM(px * (1 + (y3 * cw + x3) * 3 + c))
                        AS BIGINT) AS aug_checksum
            FROM afin GROUP BY i ORDER BY image_id
        """,
        "image_patches": _sql_image_patches(),
        "image_sharpness": _sql_image_sharpness(),
        "image_entropy_contrast": _sql_image_entropy_contrast(),
        "image_fractal_dim": _sql_image_fractal_dim(),
        "image_quadrant_asym": _sql_image_quadrant_asym(),
        "image_colorfulness": _sql_image_colorfulness(),
        "image_otsu_threshold": _sql_image_otsu(),
        "image_bitplane_entropy": _sql_image_bitplane(),
        "image_neighbor_brighter": _sql_image_neighbor_brighter(),
        "image_grad_orient_hist": _sql_image_grad_orient(),
        "image_quantile_stretch": _sql_image_quantile_stretch(),
        "image_glcm_texture": _sql_image_glcm(),
        "image_hu_moments": _sql_image_hu(),
        "image_run_length": _sql_image_run_length(),
        "image_busiest_block": _sql_image_busiest_block(),
        "image_radial_profile": _sql_image_radial_profile(),
        "image_tenengrad": _sql_image_tenengrad(),
        "image_border_contrast": _sql_image_border_contrast(),
        "image_dominant_color": _sql_image_dominant_color(),
        "image_equalize_audit": _sql_image_equalize_audit(),
        "image_features": _sql_image_features(),
        # cosine top-5 over the raw16 features regenerated in SQL
        # (feature values are 6dp-round-even on BOTH sides, so the
        # score inputs are bit-identical; ties -> vec_id asc)
        "image_similar_topk": f"""
            WITH f AS (SELECT image_id,
                              list_value(mean_r, mean_g, mean_b,
                                         lum_mean, lum_std,
                                         edge_energy) AS e
                       FROM ({_sql_image_features()}) t),
            q AS (SELECT image_id AS query_vec_id, e AS qe
                  FROM f ORDER BY image_id LIMIT 5),
            scored AS (
                SELECT q.query_vec_id, f.image_id AS vec_id,
                       list_cosine_similarity(
                           CAST(q.qe AS DOUBLE[]),
                           CAST(f.e AS DOUBLE[])) AS c
                FROM q CROSS JOIN f),
            ranked AS (
                SELECT query_vec_id, vec_id, c,
                       ROW_NUMBER() OVER (PARTITION BY query_vec_id
                                          ORDER BY c DESC, vec_id) - 1
                           AS rank
                FROM scored)
            SELECT query_vec_id, CAST(rank AS INT) AS rank, vec_id,
                   ROUND(c, 6) AS cos
            FROM ranked WHERE rank < 5
            ORDER BY query_vec_id, rank
        """,
        "simhash_documents": _sql_simhash(42),
        "docs_winnow_fingerprints": _sql_winnow(),
        "embedding_mmr_topk": _sql_mmr(),
        "geo_s2_cell_counts": _sql_s2_cell_counts(),
        "geo_geohash_counts": _sql_geohash_counts(),
        "embedding_near_dups": _sql_embedding_near_dups(0.9),
        "ngram_jaccard_docs": f"""
            WITH {_sql_char_jaccard_pairs(0.5, with_muts=True)}
            SELECT a, b, jaccard FROM jpairs ORDER BY a, b
        """,
        "dedup_components_documents": f"""
            WITH RECURSIVE {_sql_char_jaccard_pairs(0.5, with_muts=True)},
            {_sql_minlabel_components()}
            SELECT node, label FROM lab ORDER BY node
        """,
        "minhash_dedup_documents": f"""
            WITH RECURSIVE {_sql_char_jaccard_pairs(0.8, with_muts=False)},
            {_sql_minlabel_components()}
            SELECT d.doc_id, COALESCE(l.label, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
            ORDER BY d.doc_id
        """,
        "part_k_core": _sql_k_core(5, 8),
        "geo_vector_tiles": _sql_vector_tiles(),
        "geo_vector_tiles_simplified": _sql_vector_tiles(0.05),
        "geo_enclosing_circles": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            {_sql_enclosing_circles()}
            SELECT m.track_id, n.n_fixes,
                   round(m.cx, 6) AS c_lon, round(m.cy, 6) AS c_lat,
                   round(m.r, 6) AS radius_deg
            FROM mec m JOIN (SELECT track_id, COUNT(*) AS n_fixes
                             FROM gt GROUP BY track_id) n
                USING (track_id)
            ORDER BY m.track_id
        """,
        "geo_simplify_tracks": f"""
            WITH RECURSIVE {_sql_geo_lonlat(_GEO_N)},
            {_sql_simplify_tracks(0.5)}
            SELECT g.track_id, CAST(ANY_VALUE(g.n) AS BIGINT) AS n_in,
                   (SELECT COUNT(*) FROM kept k
                    WHERE k.track_id = g.track_id) AS n_kept,
                   round(COALESCE((SELECT sqrt(MAX(d.mind2))
                                   FROM devs d
                                   WHERE d.track_id = g.track_id),
                                  0e0), 6) AS max_dev_deg
            FROM gp g GROUP BY g.track_id ORDER BY g.track_id
        """,
        "geo_stay_points": f"""
            WITH RECURSIVE {_sql_geo_lonlat(_GEO_N)},
            {_sql_stay_points(20000.0, 5)}
            SELECT s.track_id, s.stay_ix,
                   MIN(CASE WHEN p.pos = s.i THEN p.seq END)
                       AS start_seq,
                   MIN(CASE WHEN p.pos = s.j - 1 THEN p.seq END)
                       AS end_seq,
                   CAST(s.j - s.i AS BIGINT) AS n_fixes,
                   round(AVG(p.lon), 6) AS c_lon,
                   round(AVG(p.lat), 6) AS c_lat
            FROM stays s JOIN gp p
                ON p.track_id = s.track_id
               AND p.pos >= s.i AND p.pos < s.j
            GROUP BY s.track_id, s.stay_ix, s.i, s.j
            ORDER BY s.track_id, s.stay_ix
        """,
        "docs_bpe_pair_counts": """
            WITH tok AS (
                SELECT unnest(list_filter(
                    string_split_regex(lower(text), '\\s+'),
                    s -> s <> '')) AS w
                FROM documents
            ),
            pr AS (SELECT substring(w, pp, 1) AS lsym,
                          substring(w, pp + 1, 1) AS rsym
                   FROM (SELECT w, unnest(range(1, length(w))) AS pp
                         FROM tok)),
            cnt AS (SELECT lsym, rsym, COUNT(*) AS n
                    FROM pr GROUP BY lsym, rsym),
            rk AS (SELECT lsym, rsym, n,
                      ROW_NUMBER() OVER (ORDER BY n DESC, lsym, rsym)
                          AS rank
                   FROM cnt)
            SELECT CAST(rank AS INT) AS rank, lsym, rsym, n
            FROM rk WHERE rank <= 50
        """,
        "part_local_clustering": """
            WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                        WHERE l_orderkey % 5 = 0),
            pe AS (SELECT DISTINCT
                       l1.l_partkey AS a, l2.l_partkey AS b
                   FROM li l1 JOIN li l2
                     ON l2.l_orderkey = l1.l_orderkey
                    AND l1.l_partkey < l2.l_partkey),
            adj AS (SELECT a AS v, b AS w FROM pe
                    UNION ALL SELECT b, a FROM pe),
            dg AS (SELECT v, COUNT(*) AS degree FROM adj GROUP BY v),
            cl AS (SELECT x.v, COUNT(*) AS n_closed
                   FROM adj x JOIN adj y
                     ON y.v = x.v AND x.w < y.w
                   JOIN pe e ON e.a = x.w AND e.b = y.w
                   GROUP BY x.v)
            SELECT d.v AS node, CAST(d.degree AS BIGINT) AS degree,
                   CAST(d.degree * (d.degree - 1) // 2 AS BIGINT)
                       AS n_wedges,
                   CAST(COALESCE(cl.n_closed, 0) AS BIGINT)
                       AS n_closed,
                   ROUND(CASE WHEN d.degree >= 2
                         THEN CAST(COALESCE(cl.n_closed, 0) AS DOUBLE)
                              / (d.degree * (d.degree - 1) / 2)
                         ELSE 0e0 END, 6) AS lcc
            FROM dg d LEFT JOIN cl ON cl.v = d.v
        """,
        "approx_price_quantiles": _sql_ddsketch(
            "orders", "o_totalprice", (0.5, 0.9, 0.99), 0.01),
        "approx_value_quantiles_by_type": _sql_ddsketch(
            "events", "value", (0.5, 0.9), 0.01, group="event_type"),
        "approx_user_event_counts": _sql_count_min(keys_hi=10, width=4096),
        "approx_distinct_users": _sql_hll(p=12),
        "docs_tfidf_top_terms": """
            WITH tok AS (
                SELECT doc_id,
                       UNNEST(string_split_regex(lower(text), '[^a-z]+'))
                           AS token
                FROM documents
            ),
            tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
            dl AS (SELECT doc_id, COUNT(*) AS n_toks FROM tok2
                   GROUP BY doc_id),
            tf AS (SELECT doc_id, token, COUNT(*) AS c FROM tok2
                   GROUP BY doc_id, token),
            df AS (SELECT token, COUNT(DISTINCT doc_id) AS dfreq FROM tok2
                   GROUP BY token),
            nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.token AS term,
                       ROUND((CAST(tf.c AS DOUBLE) / dl.n_toks)
                             * LN((SELECT n FROM nd) / df.dfreq), 6)
                           AS score
                FROM tf JOIN dl USING (doc_id) JOIN df USING (token)
            )
            SELECT doc_id, term, score, trank FROM (
                SELECT doc_id, term, score,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, term)
                           AS trank
                FROM scored
            ) WHERE trank <= 3
        """,
        "docs_unigram_logprob": """
            WITH tok AS (
                SELECT doc_id,
                       UNNEST(string_split_regex(lower(text), '[^a-z]+'))
                           AS token
                FROM documents
            ),
            tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
            vocab AS (SELECT token, COUNT(*) AS n FROM tok2 GROUP BY token),
            par AS (SELECT CAST(SUM(n) + COUNT(*) + 1 AS DOUBLE) AS denom
                    FROM vocab),
            lp AS (SELECT token,
                          LN(CAST(n + 1 AS DOUBLE)
                             / (SELECT denom FROM par)) AS logp
                   FROM vocab),
            per AS (SELECT t.doc_id, SUM(lp.logp) / COUNT(*) AS m
                    FROM tok2 t JOIN lp USING (token) GROUP BY t.doc_id)
            SELECT d.doc_id, ROUND(COALESCE(per.m, 0.0), 6) AS mean_logp
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "docs_bigram_pmi": """
            WITH arrs AS (
                SELECT doc_id,
                       string_split_regex(lower(text), '[^a-z]+')
                           AS arr
                FROM documents
            ),
            tokp AS (SELECT doc_id, arr[i] AS token, i AS ord
                     FROM arrs,
                          UNNEST(range(1, len(arr) + 1)) AS u(i)),
            tok2 AS (SELECT doc_id, token,
                        ROW_NUMBER() OVER (PARTITION BY doc_id
                                           ORDER BY ord) AS pos
                     FROM tokp WHERE token <> ''),
            uc AS (SELECT token, COUNT(*) AS n1 FROM tok2
                   GROUP BY token),
            nu AS (SELECT CAST(SUM(n1) AS DOUBLE) AS v FROM uc),
            big AS (SELECT a.doc_id, a.token AS w1, b.token AS w2
                    FROM tok2 a JOIN tok2 b
                      ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
            bc AS (SELECT w1, w2, COUNT(*) AS nb FROM big
                   GROUP BY w1, w2),
            nbt AS (SELECT CAST(SUM(nb) AS DOUBLE) AS v FROM bc)
            SELECT bc.w1, bc.w2, CAST(bc.nb AS BIGINT) AS n,
               round(ln(CAST(bc.nb AS DOUBLE) * (SELECT v FROM nu)
                        * (SELECT v FROM nu)
                        / ((SELECT v FROM nbt)
                           * CAST(u1.n1 AS DOUBLE)
                           * CAST(u2.n1 AS DOUBLE))), 6) AS pmi
            FROM bc
            JOIN uc u1 ON u1.token = bc.w1
            JOIN uc u2 ON u2.token = bc.w2
            WHERE bc.nb >= 5
            ORDER BY w1, w2
        """,
        "docs_jaro_winkler_pairs": """
            WITH d AS (SELECT doc_id, substr(text, 1, 20) AS p,
                              n_chars // 16 AS bkt
                       FROM documents)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   ROUND(jaro_winkler_similarity(a.p, b.p), 6) AS jw
            FROM d a JOIN d b
              ON a.bkt = b.bkt
             AND substr(a.p, 1, 1) = substr(b.p, 1, 1)
             AND b.doc_id > a.doc_id
            WHERE ROUND(jaro_winkler_similarity(a.p, b.p), 6) >= 0.85
            ORDER BY a, b
        """,
        "docs_levenshtein_pairs": """
            WITH d AS (SELECT doc_id, substr(text, 1, 24) AS p,
                              n_chars // 16 AS bkt
                       FROM documents)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
            FROM d a JOIN d b
              ON a.bkt = b.bkt AND b.doc_id > a.doc_id
            WHERE levenshtein(a.p, b.p) <= 6
            ORDER BY a, b
        """,
        "docs_bigram_logprob": """
            WITH arrs AS (
                SELECT doc_id,
                       string_split_regex(lower(text), '[^a-z]+')
                           AS arr
                FROM documents
            ),
            tokp AS (SELECT doc_id, arr[i] AS token, i AS ord
                     FROM arrs,
                          UNNEST(range(1, len(arr) + 1)) AS u(i)),
            tok2 AS (SELECT doc_id, token,
                        ROW_NUMBER() OVER (PARTITION BY doc_id
                                           ORDER BY ord) AS pos
                     FROM tokp WHERE token <> ''),
            uc AS (SELECT token, COUNT(*) AS n1 FROM tok2
                   GROUP BY token),
            vsz AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uc),
            big AS (SELECT a.doc_id, a.token AS w1, b.token AS w2
                    FROM tok2 a JOIN tok2 b
                      ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
            bc AS (SELECT w1, w2, COUNT(*) AS nb FROM big
                   GROUP BY w1, w2),
            lp AS (SELECT g.doc_id,
                      LN((bc.nb + 1e0)
                         / (uc.n1 + (SELECT v FROM vsz) + 1e0))
                          AS logp
                   FROM big g
                   JOIN bc ON bc.w1 = g.w1 AND bc.w2 = g.w2
                   JOIN uc ON uc.token = g.w1),
            per AS (SELECT doc_id, SUM(logp) / COUNT(*) AS m
                    FROM lp GROUP BY doc_id)
            SELECT d.doc_id,
                   ROUND(COALESCE(per.m, 0.0), 6)
                       AS mean_bigram_logp
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "part_bfs_hops": """
            WITH RECURSIVE pe AS (SELECT DISTINCT
                            l1.l_partkey AS a, l2.l_partkey AS b
                        FROM lineitem l1 JOIN lineitem l2
                          ON l2.l_orderkey = l1.l_orderkey
                         AND l1.l_partkey < l2.l_partkey),
            sym AS (SELECT a, b FROM pe
                    UNION ALL SELECT b, a FROM pe),
            src AS (SELECT MIN(a) AS s FROM pe),
            bfs AS (
                SELECT (SELECT s FROM src) AS node, 0 AS hop
                UNION
                SELECT sym.b, bfs.hop + 1
                FROM bfs JOIN sym ON sym.a = bfs.node
                WHERE bfs.hop < 8
            ),
            d AS (SELECT node, MIN(hop) AS hop FROM bfs
                  GROUP BY node)
            SELECT hop, COUNT(*) AS n_nodes FROM d
            GROUP BY hop ORDER BY hop
        """,
        "part_closeness_sampled": f"""
            WITH RECURSIVE pe AS (SELECT DISTINCT
                            l1.l_partkey AS a, l2.l_partkey AS b
                        FROM lineitem l1 JOIN lineitem l2
                          ON l2.l_orderkey = l1.l_orderkey
                         AND l1.l_partkey < l2.l_partkey),
            sym AS (SELECT a, b FROM pe
                    UNION ALL SELECT b, a FROM pe),
            vsrc AS (SELECT node AS s FROM (
                        SELECT a AS node FROM pe
                        UNION SELECT b FROM pe)
                     ORDER BY node LIMIT 3),
            bfs AS (
                SELECT s AS src, s AS node, 0 AS hop FROM vsrc
                UNION
                SELECT bfs.src, sym.b, bfs.hop + 1
                FROM bfs JOIN sym ON sym.a = bfs.node
                WHERE bfs.hop < 8
            ),
            d AS (SELECT src, node, MIN(hop) AS hop FROM bfs
                  GROUP BY src, node),
            ag AS (SELECT src, COUNT(*) - 1 AS nr, SUM(hop) AS sh
                   FROM d GROUP BY src)
            SELECT src AS source, CAST(nr AS BIGINT) AS n_reached,
                   CAST(sh AS BIGINT) AS sum_hops,
                   {_sql_round_even(
                       'CASE WHEN sh > 0 THEN CAST(nr AS DOUBLE)'
                       ' / CAST(sh AS DOUBLE) ELSE 0e0 END')}
                       AS closeness
            FROM ag ORDER BY source
        """,
        "part_triangle_count": """
            WITH pe AS (SELECT DISTINCT
                            l1.l_partkey AS a, l2.l_partkey AS b
                        FROM lineitem l1 JOIN lineitem l2
                          ON l2.l_orderkey = l1.l_orderkey
                         AND l1.l_partkey < l2.l_partkey),
            se AS (SELECT COUNT(*) AS n_edges FROM pe),
            sw AS (SELECT COUNT(*) AS n_wedges
                   FROM pe e1 JOIN pe e2
                     ON e2.a = e1.a AND e1.b < e2.b),
            st AS (SELECT COUNT(*) AS n_triangles
                   FROM pe e1 JOIN pe e2
                     ON e2.a = e1.a AND e1.b < e2.b
                   JOIN pe e3
                     ON e3.a = e1.b AND e3.b = e2.b)
            SELECT n_edges, n_wedges, n_triangles FROM se, sw, st
        """,
        "user_value_ewma": """
            WITH r AS (SELECT user_id, value,
                    ROW_NUMBER() OVER w AS rn,
                    COUNT(*) OVER (PARTITION BY user_id) AS m
                FROM events
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY ts, event_id))
            SELECT user_id, COUNT(*) AS n_events,
                   round(SUM(CASE WHEN rn = 1
                             THEN value * POWER(0.9e0, m - 1)
                             ELSE 0.1e0 * value
                                  * POWER(0.9e0, m - rn) END), 6)
                       AS ewma
            FROM r GROUP BY user_id
        """,
        "user_value_cusum": """
            WITH r AS (SELECT user_id, value,
                    ROW_NUMBER() OVER w AS rn,
                    COUNT(*) OVER (PARTITION BY user_id) AS m,
                    AVG(value) OVER (PARTITION BY user_id) AS mu,
                    SUM(value) OVER w AS rs,
                    SUM(value * value)
                        OVER (PARTITION BY user_id) AS sq
                FROM events
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY ts, event_id)),
            st AS (SELECT user_id, rn, m,
                      CASE WHEN sqrt(GREATEST(sq / m - mu * mu, 0e0))
                                > 0e0
                           THEN abs(rs - rn * mu)
                                / (sqrt(GREATEST(sq / m - mu * mu,
                                                 0e0))
                                   * sqrt(CAST(m AS DOUBLE)))
                           ELSE 0e0 END AS stat
                   FROM r),
            sel AS (SELECT user_id, m, rn, stat,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY round(stat, 6) DESC,
                                                   rn)
                           AS rk
                    FROM st)
            SELECT user_id, CAST(m AS BIGINT) AS n_events,
                   round(stat, 6) AS cusum_stat,
                   CAST(rn AS BIGINT) AS t_ix
            FROM sel WHERE rk = 1
        """,
        "docs_char_entropy": """
            WITH ch AS (SELECT doc_id, substr(text, i, 1) AS c
                        FROM documents,
                        UNNEST(range(1, length(text) + 1)) AS u(i)),
            cnt AS (SELECT doc_id, c, COUNT(*) AS n
                    FROM ch GROUP BY doc_id, c),
            tot AS (SELECT doc_id, SUM(n) AS nt FROM cnt
                    GROUP BY doc_id),
            e AS (SELECT cnt.doc_id,
                     -SUM((CAST(cnt.n AS DOUBLE) / tot.nt)
                          * ln(CAST(cnt.n AS DOUBLE) / tot.nt)) AS h
                  FROM cnt JOIN tot USING (doc_id)
                  GROUP BY cnt.doc_id)
            SELECT d.doc_id,
                   CAST(length(d.text) AS BIGINT) AS n_chars,
                   round(COALESCE(e.h, 0e0), 6) AS char_entropy
            FROM documents d LEFT JOIN e ON e.doc_id = d.doc_id
        """,
        "docs_readability_lix": """
            WITH st AS (SELECT doc_id,
                    len(list_filter(
                        string_split_regex(text, '[.!?]+'),
                        s -> trim(s) <> '')) AS ns,
                    len(list_filter(
                        string_split_regex(lower(text), '[^a-z]+'),
                        s -> s <> '')) AS nw,
                    len(list_filter(
                        string_split_regex(lower(text), '[^a-z]+'),
                        s -> length(s) > 6)) AS nl
                FROM documents)
            SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
                   CAST(nl AS BIGINT) AS n_long_words,
                   round(CASE WHEN nw > 0 AND ns > 0
                         THEN CAST(nw AS DOUBLE) / ns
                              + 100.0 * nl / nw
                         ELSE 0e0 END, 6) AS lix
            FROM st
        """,
        "docs_sentence_stats": """
            WITH st AS (SELECT doc_id,
                    len(list_filter(
                        string_split_regex(text, '[.!?]+'),
                        s -> trim(s) <> '')) AS n_sentences,
                    len(list_filter(
                        string_split_regex(lower(text), '[^a-z]+'),
                        s -> s <> '')) AS n_tokens
                FROM documents)
            SELECT doc_id, n_sentences, n_tokens,
                   round(CASE WHEN n_sentences > 0
                         THEN CAST(n_tokens AS DOUBLE)
                              / GREATEST(n_sentences, 1)
                         ELSE 0e0 END, 6) AS mean_sent_tokens
            FROM st
        """,
        "geom_harmonic_price_by_status": """
            SELECT o_orderstatus, COUNT(*) AS n,
                   round(exp(AVG(ln(o_totalprice))), 4) AS geom_mean,
                   round(COUNT(*) / SUM(1e0 / o_totalprice), 4)
                       AS harm_mean
            FROM orders GROUP BY o_orderstatus
        """,
        "user_sequence_entropy": """
            WITH r AS (SELECT user_id, event_type,
                    LAG(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                        AS prev_type
                FROM events),
            ab AS (SELECT user_id, prev_type, event_type,
                          COUNT(*) AS nab
                   FROM r WHERE prev_type IS NOT NULL
                   GROUP BY user_id, prev_type, event_type),
            ua AS (SELECT user_id, prev_type, SUM(nab) AS na
                   FROM ab GROUP BY user_id, prev_type),
            tt AS (SELECT user_id, SUM(nab) AS nt FROM ab
                   GROUP BY user_id)
            SELECT ab.user_id,
                   CAST(ANY_VALUE(tt.nt) AS BIGINT)
                       AS n_transitions,
                   round(-SUM((ab.nab / tt.nt)
                              * ln(ab.nab / ua.na)), 6) AS entropy
            FROM ab
            JOIN ua ON ua.user_id = ab.user_id
                   AND ua.prev_type = ab.prev_type
            JOIN tt ON tt.user_id = ab.user_id
            GROUP BY ab.user_id
        """,
        "orders_benford_digits": """
            WITH d AS (SELECT LEAST(GREATEST(CAST(floor(
                        o_totalprice / power(10e0,
                            floor(log10(o_totalprice))))
                        AS BIGINT), 1), 9) AS digit
                    FROM orders WHERE o_totalprice > 0),
            c AS (SELECT g.digit, COUNT(d.digit) AS n
                  FROM (SELECT CAST(range AS BIGINT) + 1 AS digit
                        FROM range(9)) g
                  LEFT JOIN d ON d.digit = g.digit
                  GROUP BY g.digit),
            t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM c)
            SELECT c.digit, c.n,
                   round(c.n / t.tot, 6) AS frac,
                   round(log10(1e0 + 1e0 / c.digit), 6) AS benford_p,
                   round(pow(c.n - t.tot * log10(1e0 + 1e0 / c.digit),
                             2)
                         / (t.tot * log10(1e0 + 1e0 / c.digit)), 6)
                       AS chi2_part
            FROM c CROSS JOIN t
        """,
        "acctbal_mad_by_segment": """
            WITH med AS (SELECT c_mktsegment,
                            MEDIAN(c_acctbal) AS m
                         FROM customer GROUP BY c_mktsegment)
            SELECT c.c_mktsegment,
                   round(ANY_VALUE(med.m), 4) AS median,
                   round(MEDIAN(abs(c.c_acctbal - med.m)), 4) AS mad
            FROM customer c JOIN med USING (c_mktsegment)
            GROUP BY c.c_mktsegment
        """,
        "nation_revenue_hhi": """
            WITH mem AS (SELECT c_nationkey, c_custkey,
                            SUM(GREATEST(c_acctbal, 0e0)) AS v
                         FROM customer
                         GROUP BY c_nationkey, c_custkey),
            tot AS (SELECT c_nationkey, SUM(v) AS t,
                           COUNT(*) AS n_members
                    FROM mem GROUP BY c_nationkey)
            SELECT m.c_nationkey,
                   CAST(ANY_VALUE(t.n_members) AS BIGINT)
                       AS n_members,
                   round(ANY_VALUE(t.t), 4) AS total,
                   round(SUM(pow(m.v / t.t, 2)), 6) AS hhi
            FROM mem m JOIN tot t USING (c_nationkey)
            GROUP BY m.c_nationkey
        """,
        "nation_acctbal_gini": """
            WITH v AS (SELECT c_nationkey,
                    GREATEST(c_acctbal, 0e0) AS x,
                    ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                       ORDER BY GREATEST(c_acctbal,
                                                         0e0))
                        AS i
                FROM customer)
            SELECT c_nationkey, COUNT(*) AS n,
                   round(2e0 * SUM(i * x)
                         / (COUNT(*) * SUM(x))
                         - (COUNT(*) + 1e0) / COUNT(*), 6) AS gini
            FROM v GROUP BY c_nationkey
        """,
        "price_weighted_median_by_flag": """
            WITH c AS (SELECT l_returnflag, l_extendedprice AS v,
                    SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                          ORDER BY l_extendedprice
                                          ROWS UNBOUNDED PRECEDING)
                        AS cw,
                    SUM(l_quantity) OVER (PARTITION BY l_returnflag)
                        AS tot
                FROM lineitem)
            SELECT l_returnflag, CAST(MAX(tot) AS BIGINT) AS total_w,
                   round(MIN(v), 4) AS weighted_median
            FROM c WHERE cw >= tot / 2.0
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "qty_price_spearman_by_flag": """
            WITH r AS (SELECT l_returnflag,
                  RANK() OVER (PARTITION BY l_returnflag
                               ORDER BY l_quantity)
                    + (COUNT(*) OVER (PARTITION BY l_returnflag,
                                                   l_quantity)
                       - 1) / 2.0 AS rx,
                  RANK() OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice)
                    + (COUNT(*) OVER (PARTITION BY l_returnflag,
                                                   l_extendedprice)
                       - 1) / 2.0 AS ry
               FROM lineitem)
            SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(corr(rx, ry), 4) AS spearman
            FROM r GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "qty_price_kendall_by_flag": """
            WITH b AS (SELECT l_returnflag AS flag,
                          CAST(l_quantity AS BIGINT) AS q,
                          CAST(floor(l_extendedprice / 1000e0)
                               AS BIGINT) AS p
                       FROM lineitem),
            g AS (SELECT flag, q, p, COUNT(*) AS n FROM b
                  GROUP BY flag, q, p),
            dq AS (SELECT DISTINCT flag, q FROM b),
            dp AS (SELECT DISTINCT flag, p FROM b),
            dense AS (SELECT dq.flag, dq.q, dp.p,
                         COALESCE(g.n, 0) AS n
                      FROM dq JOIN dp USING (flag)
                      LEFT JOIN g ON g.flag = dq.flag
                                 AND g.q = dq.q AND g.p = dp.p),
            cc AS (SELECT flag, q, p, n,
                      COALESCE(SUM(n) OVER (PARTITION BY flag, p
                          ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS bel
                   FROM dense),
            c2 AS (SELECT flag, q, p, n, bel,
                      COALESCE(SUM(bel) OVER (PARTITION BY flag, q
                          ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS lt_lt,
                      SUM(bel) OVER (PARTITION BY flag, q) AS t_lt
                   FROM cc),
            agg AS (SELECT flag,
                       CAST(SUM(n * lt_lt) AS BIGINT) AS c,
                       CAST(SUM(n * (t_lt - lt_lt - bel)) AS BIGINT)
                           AS d,
                       CAST(SUM(n) AS BIGINT) AS nn
                    FROM c2 GROUP BY flag),
            tieq AS (SELECT flag,
                        CAST(SUM(tq * (tq - 1) // 2) AS BIGINT) AS n1
                     FROM (SELECT flag, q, CAST(SUM(n) AS BIGINT)
                               AS tq
                           FROM g GROUP BY flag, q)
                     GROUP BY flag),
            tiep AS (SELECT flag,
                        CAST(SUM(tp * (tp - 1) // 2) AS BIGINT) AS n2
                     FROM (SELECT flag, p, CAST(SUM(n) AS BIGINT)
                               AS tp
                           FROM g GROUP BY flag, p)
                     GROUP BY flag)
            SELECT a.flag AS l_returnflag, a.nn AS n,
                   a.c AS concordant, a.d AS discordant,
                   round(CAST(a.c - a.d AS DOUBLE)
                         / sqrt(CAST(a.nn * (a.nn - 1) // 2 - t1.n1
                                     AS DOUBLE)
                                * CAST(a.nn * (a.nn - 1) // 2 - t2.n2
                                       AS DOUBLE)), 6) AS kendall_tau
            FROM agg a JOIN tieq t1 USING (flag)
            JOIN tiep t2 USING (flag)
            ORDER BY l_returnflag
        """,
        "lineitem_ols_price_model": f"""
            WITH b AS (SELECT l_returnflag AS flag,
                          CAST(l_quantity AS BIGINT) AS v1,
                          CAST(round(l_discount * 100e0, 0)
                               AS BIGINT) AS v2,
                          CAST(round(l_extendedprice * 100e0, 0)
                               AS BIGINT) AS vy
                       FROM lineitem),
            m AS (SELECT flag, COUNT(*) AS cnt,
                     CAST(SUM(v1) AS DOUBLE) AS s1,
                     CAST(SUM(v2) AS DOUBLE) AS s2,
                     CAST(SUM(vy) AS DOUBLE) AS sy,
                     CAST(SUM(v1 * v1) AS DOUBLE) AS s11,
                     CAST(SUM(v2 * v2) AS DOUBLE) AS s22,
                     CAST(SUM(v1 * v2) AS DOUBLE) AS s12,
                     CAST(SUM(v1 * vy) AS DOUBLE) AS s1y,
                     CAST(SUM(v2 * vy) AS DOUBLE) AS s2y
                  FROM b GROUP BY flag),
            d AS (SELECT flag, cnt, CAST(cnt AS DOUBLE) AS n,
                     s1, s2, sy, s11, s22, s12, s1y, s2y FROM m),
            dets AS (SELECT flag, cnt,
                n * (s11 * s22 - s12 * s12)
                    - s1 * (s1 * s22 - s12 * s2)
                    + s2 * (s1 * s12 - s11 * s2) AS det,
                sy * (s11 * s22 - s12 * s12)
                    - s1y * (s1 * s22 - s2 * s12)
                    + s2y * (s1 * s12 - s2 * s11) AS det0,
                n * (s1y * s22 - s12 * s2y)
                    - sy * (s1 * s22 - s12 * s2)
                    + s2 * (s1 * s2y - s1y * s2) AS det1,
                n * (s11 * s2y - s1y * s12)
                    - s1 * (s1 * s2y - s1y * s2)
                    + sy * (s1 * s12 - s11 * s2) AS det2
              FROM d)
            SELECT flag AS l_returnflag, cnt AS n,
               {_sql_round_even('det0 / det / 100e0')} AS b0,
               {_sql_round_even('det1 / det / 100e0')} AS b1,
               {_sql_round_even('det2 / det / 100e0 * 100e0')} AS b2
            FROM dets ORDER BY l_returnflag
        """,
        "order_priority_theil": """
            WITH m AS (SELECT o_orderpriority, COUNT(*) AS n,
                          SUM(o_totalprice) AS s1,
                          SUM(o_totalprice * ln(o_totalprice)) AS sxl
                       FROM orders GROUP BY o_orderpriority)
            SELECT o_orderpriority, n,
                   round(sxl / (n * (s1 / n)) - ln(s1 / n), 6) AS theil
            FROM m ORDER BY o_orderpriority
        """,
        "event_value_trimmed_mean": """
            WITH r AS (SELECT event_type, value,
                          ROW_NUMBER() OVER (PARTITION BY event_type
                                             ORDER BY value) AS rn,
                          COUNT(*) OVER (PARTITION BY event_type) AS n
                       FROM events),
            k AS (SELECT event_type, value, rn, n,
                     CAST(FLOOR(0.1e0 * n) AS BIGINT) AS kk
                  FROM r)
            SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                   COUNT(*) FILTER (WHERE rn > kk AND rn <= n - kk)
                       AS n_kept,
                   round(AVG(value) FILTER (WHERE rn > kk
                                            AND rn <= n - kk), 6)
                       AS trimmed_mean
            FROM k GROUP BY event_type ORDER BY event_type
        """,
        "user_sessions": """
            WITH r AS (SELECT user_id, event_id, epoch(ts) AS t,
                    LAG(epoch(ts)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS pt
                FROM events),
            s AS (SELECT user_id, t,
                    SUM(CASE WHEN pt IS NULL OR t - pt > 1800e0
                        THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id
                              ORDER BY t, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_seq
                  FROM r)
            SELECT user_id, session_seq, COUNT(*) AS n_events,
                   round(MIN(t), 6) AS start_ts,
                   round(MAX(t), 6) AS end_ts,
                   round(MAX(t) - MIN(t), 6) AS duration
            FROM s GROUP BY user_id, session_seq
            ORDER BY user_id, session_seq
        """,
        "user_burstiness": """
            WITH r AS (SELECT user_id, epoch(ts) AS t,
                    LAG(epoch(ts)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                        AS pt
                FROM events),
            g AS (SELECT user_id, t - pt AS dt FROM r
                  WHERE pt IS NOT NULL),
            a AS (SELECT user_id, COUNT(*) AS n_gaps,
                     AVG(dt) AS mu,
                     sqrt(GREATEST(AVG(dt * dt)
                                   - AVG(dt) * AVG(dt), 0e0)) AS sd
                  FROM g GROUP BY user_id)
            SELECT user_id, n_gaps, round(mu, 6) AS mean_gap,
                   round(CASE WHEN sd + mu > 0e0
                         THEN (sd - mu) / (sd + mu)
                         ELSE 0e0 END, 6) AS burstiness
            FROM a
        """,
        "user_rfm_scores": f"""
            WITH a AS (SELECT user_id,
                     max(epoch_us(ts)) AS last_us,
                     count(*) AS n_events,
                     {_sql_round_even('sum(value)', 4)} AS mon
                FROM events GROUP BY user_id),
            r AS (SELECT user_id, n_events,
                     row_number() OVER (ORDER BY last_us, user_id)
                         AS rr,
                     row_number() OVER (ORDER BY n_events, user_id)
                         AS fr,
                     row_number() OVER (ORDER BY mon, user_id)
                         AS mr,
                     count(*) OVER () AS n
                  FROM a),
            s AS (SELECT user_id, n_events,
                     1 + (5 * (rr - 1)) // n AS r_score,
                     1 + (5 * (fr - 1)) // n AS f_score,
                     1 + (5 * (mr - 1)) // n AS m_score
                  FROM r)
            SELECT user_id, n_events, r_score, f_score, m_score,
                   100 * r_score + 10 * f_score + m_score AS rfm_code
            FROM s ORDER BY user_id
        """,
        "value_shape_by_event_type": """
            WITH m AS (SELECT event_type, COUNT(*) AS n,
                          AVG(value) AS m1,
                          AVG(value * value) AS r2,
                          AVG(pow(value, 3)) AS r3,
                          AVG(pow(value, 4)) AS r4
                       FROM events GROUP BY event_type),
            c AS (SELECT event_type, n,
                     r2 - m1 * m1 AS m2,
                     r3 - 3e0 * m1 * r2 + 2e0 * pow(m1, 3) AS m3,
                     r4 - 4e0 * m1 * r3 + 6e0 * m1 * m1 * r2
                         - 3e0 * pow(m1, 4) AS m4
                  FROM m)
            SELECT event_type, n,
                   round(CASE WHEN m2 > 0e0
                         THEN m3 / pow(m2, 1.5e0)
                         ELSE 0e0 END, 6) AS skewness,
                   round(CASE WHEN m2 > 0e0
                         THEN m4 / (m2 * m2) - 3e0
                         ELSE 0e0 END, 6) AS excess_kurtosis
            FROM c
        """,
        "events_hourly_acf": """
            WITH h AS (SELECT CAST(floor(epoch(ts) / 3600e0)
                               AS BIGINT) AS hour,
                          COUNT(*) AS n
                       FROM events GROUP BY hour),
            p AS (SELECT CAST(n AS DOUBLE) AS a,
                     CAST(LEAD(n) OVER (ORDER BY hour) AS DOUBLE)
                         AS b
                  FROM h)
            SELECT (SELECT COUNT(*) FROM h) AS n_hours,
                   round(corr(a, b), 6) AS acf_lag1
            FROM p WHERE b IS NOT NULL
        """,
        "supplier_activity_span": """
            WITH pm AS (SELECT l_suppkey,
                           CAST(year(l_shipdate) * 100
                                + month(l_shipdate) AS BIGINT)
                               AS month,
                           SUM(l_extendedprice * (1e0 - l_discount))
                               AS rev
                        FROM lineitem
                        GROUP BY l_suppkey, month)
            SELECT l_suppkey, COUNT(*) AS n_months,
                   MIN(month) AS first_month,
                   MAX(month) AS last_month,
                   round(SUM(rev), 4) AS revenue,
                   round(SUM(rev) / COUNT(*), 4) AS rev_per_month
            FROM pm GROUP BY l_suppkey
        """,
        "docs_hapax_rate": """
            WITH tok AS (
                SELECT doc_id,
                       UNNEST(string_split_regex(lower(text),
                                                 '[^a-z]+'))
                           AS token
                FROM documents
            ),
            tok2 AS (SELECT doc_id, token FROM tok
                     WHERE token <> ''),
            vocab AS (SELECT token, COUNT(*) AS n FROM tok2
                      GROUP BY token),
            per AS (SELECT t.doc_id, COUNT(*) AS c,
                       AVG(CASE WHEN v.n = 1 THEN 1e0
                           ELSE 0e0 END) AS r
                    FROM tok2 t JOIN vocab v USING (token)
                    GROUP BY t.doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(per.c, 0) AS BIGINT) AS n_tokens,
                   ROUND(COALESCE(per.r, 0e0), 6) AS hapax_rate
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "docs_zipf_fit": """
            WITH tok AS (
                SELECT UNNEST(string_split_regex(lower(text),
                                                 '[^a-z]+'))
                           AS token
                FROM documents
            ),
            vocab AS (SELECT token, COUNT(*) AS n FROM tok
                      WHERE token <> '' GROUP BY token),
            rk AS (SELECT n,
                      ROW_NUMBER() OVER (ORDER BY n DESC, token)
                          AS r
                   FROM vocab
                   ORDER BY n DESC, token LIMIT 100),
            lg AS (SELECT ln(CAST(r AS DOUBLE)) AS lr,
                          ln(CAST(n AS DOUBLE)) AS lf,
                          n, r
                   FROM rk),
            m AS (SELECT AVG(lr) AS mr, AVG(lf) AS mf,
                         COUNT(*) AS k FROM lg)
            SELECT (SELECT CAST(k AS BIGINT) FROM m)
                       AS n_tokens_fit,
                   round((SELECT SUM((lr - m.mr) * (lf - m.mf))
                          FROM lg, m)
                         / (SELECT SUM(pow(lr - m.mr, 2))
                            FROM lg, m), 6) AS zipf_slope,
                   (SELECT CAST(n AS BIGINT) FROM lg WHERE r = 1)
                       AS top_freq
        """,
        "part_degree_assortativity": """
            WITH pe AS (SELECT DISTINCT
                            l1.l_partkey AS a, l2.l_partkey AS b
                        FROM lineitem l1 JOIN lineitem l2
                          ON l2.l_orderkey = l1.l_orderkey
                         AND l1.l_partkey < l2.l_partkey),
            dg AS (SELECT node, COUNT(*) AS deg FROM (
                       SELECT a AS node FROM pe
                       UNION ALL SELECT b FROM pe)
                   GROUP BY node),
            pp AS (SELECT CAST(da.deg AS DOUBLE) AS x,
                          CAST(db.deg AS DOUBLE) AS y
                   FROM pe
                   JOIN dg da ON da.node = pe.a
                   JOIN dg db ON db.node = pe.b
                   UNION ALL
                   SELECT CAST(db.deg AS DOUBLE),
                          CAST(da.deg AS DOUBLE)
                   FROM pe
                   JOIN dg da ON da.node = pe.a
                   JOIN dg db ON db.node = pe.b)
            SELECT (SELECT COUNT(*) FROM pe) AS n_edges,
                   round(corr(x, y), 6) AS assortativity
            FROM pp
        """,
        "part_avg_neighbor_degree": f"""
            WITH pe AS (SELECT DISTINCT
                            l1.l_partkey AS a, l2.l_partkey AS b
                        FROM lineitem l1 JOIN lineitem l2
                          ON l2.l_orderkey = l1.l_orderkey
                         AND l1.l_partkey < l2.l_partkey),
            dg AS (SELECT node, COUNT(*) AS deg FROM (
                       SELECT a AS node FROM pe
                       UNION ALL SELECT b FROM pe)
                   GROUP BY node),
            inc AS (SELECT da.deg AS k, db.deg AS nb
                    FROM pe
                    JOIN dg da ON da.node = pe.a
                    JOIN dg db ON db.node = pe.b
                    UNION ALL
                    SELECT db.deg, da.deg
                    FROM pe
                    JOIN dg da ON da.node = pe.a
                    JOIN dg db ON db.node = pe.b),
            nk AS (SELECT deg AS k, COUNT(*) AS nv FROM dg
                   GROUP BY deg),
            ac AS (SELECT k, SUM(nb) AS s FROM inc GROUP BY k)
            SELECT ac.k AS deg, CAST(nk.nv AS BIGINT) AS n_vertices,
                   {_sql_round_even(
                       'CAST(ac.s AS DOUBLE)'
                       ' / CAST(ac.k * nk.nv AS DOUBLE)')}
                       AS avg_nbr_deg
            FROM ac JOIN nk ON nk.k = ac.k ORDER BY deg
        """,
        "events_ab_conversion": f"""
            WITH uc AS (SELECT user_id,
                           SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS n_conv
                        FROM events GROUP BY user_id),
            ar AS (SELECT CAST(({_sql_splitmix64('user_id')}) % 2
                              AS BIGINT) AS arm,
                      CASE WHEN n_conv > 0 THEN 1 ELSE 0 END AS cv
                   FROM uc),
            cs AS (SELECT
                      SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
                      SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
                      SUM(CASE WHEN arm = 0 THEN cv ELSE 0 END) AS c0,
                      SUM(CASE WHEN arm = 1 THEN cv ELSE 0 END) AS c1
                   FROM ar),
            ex AS (SELECT n0, n1, c0, c1,
                      CAST(c0 AS DOUBLE) / n0 AS p0,
                      CAST(c1 AS DOUBLE) / n1 AS p1,
                      CAST(c0 + c1 AS DOUBLE) / (n0 + n1) AS p
                   FROM cs)
            SELECT CAST(n0 AS BIGINT) AS n_a,
                   CAST(n1 AS BIGINT) AS n_b,
                   CAST(c0 AS BIGINT) AS conv_a,
                   CAST(c1 AS BIGINT) AS conv_b,
                   {_sql_round_even('p0')} AS p_a,
                   {_sql_round_even('p1')} AS p_b,
                   {_sql_round_even(
                       'CASE WHEN p * (1e0 - p) * (1e0 / n0 + 1e0 /'
                       ' n1) > 0e0 THEN (p1 - p0) / sqrt(p * (1e0 -'
                       ' p) * (1e0 / n0 + 1e0 / n1)) ELSE 0e0 END')}
                       AS z
            FROM ex
        """,
        "docs_rake_keywords": """
            WITH arrs AS (
                SELECT doc_id,
                       string_split_regex(lower(text), '[^a-z]+')
                           AS arr
                FROM documents),
            tokp AS (SELECT doc_id, arr[i] AS token, i AS pos
                     FROM arrs,
                          UNNEST(range(1, len(arr) + 1)) AS u(i)),
            tok AS (SELECT doc_id, token, pos FROM tokp
                    WHERE token <> ''),
            fl AS (SELECT doc_id, token, pos,
                      CASE WHEN token IN ('a', 'the') THEN 1
                           ELSE 0 END AS stop
                   FROM tok),
            ph AS (SELECT doc_id, token, stop,
                      SUM(stop) OVER (PARTITION BY doc_id
                                      ORDER BY pos
                                      ROWS BETWEEN UNBOUNDED
                                      PRECEDING AND CURRENT ROW)
                          AS pid
                   FROM fl),
            nz AS (SELECT doc_id, token, pid FROM ph WHERE stop = 0),
            pl AS (SELECT doc_id, pid, COUNT(*) AS plen FROM nz
                   GROUP BY doc_id, pid),
            sc AS (SELECT n.token, COUNT(*) AS freq,
                          SUM(p.plen) AS deg
                   FROM nz n JOIN pl p
                     ON p.doc_id = n.doc_id AND p.pid = n.pid
                   GROUP BY n.token)
            SELECT token, CAST(freq AS BIGINT) AS freq,
                   CAST(deg AS BIGINT) AS deg,
                   ROUND(CAST(deg AS DOUBLE) / freq, 6) AS rake
            FROM sc ORDER BY rake DESC, token LIMIT 20
        """,
        "events_bootstrap_ci": f"""
            WITH um AS (SELECT user_id, SUM(value) AS s,
                               COUNT(value) AS c
                        FROM events GROUP BY user_id),
            ordv AS MATERIALIZED (
                SELECT s / c AS v,
                       ROW_NUMBER() OVER (ORDER BY user_id) - 1 AS rn
                FROM um),
            nn AS MATERIALIZED (
                SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ordv),
            ks AS (SELECT CAST(u.i AS BIGINT) AS kk
                   FROM (SELECT unnest(range(0,
                       200 * (SELECT n FROM nn))) AS i) u),
            ix AS (SELECT kk // (SELECT n FROM nn) AS b,
                      CAST(({_sql_splitmix64('kk')})
                           % (SELECT n FROM nn) AS BIGINT) AS rn
                   FROM ks),
            bm AS MATERIALIZED (
                SELECT b, SUM(o.v) / (SELECT n FROM nn) AS m
                FROM ix JOIN ordv o USING (rn) GROUP BY b),
            srt AS MATERIALIZED (
                SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS r
                FROM bm)
            SELECT (SELECT n FROM nn) AS n_users,
                   ROUND((SELECT SUM(v) FROM ordv)
                         / (SELECT n FROM nn), 6) AS mean,
                   ROUND((SELECT m FROM srt WHERE r = 5), 6)
                       AS ci_lo,
                   ROUND((SELECT m FROM srt WHERE r = 195), 6)
                       AS ci_hi
        """,
        "events_fisher_exact": f"""
            WITH uc AS (SELECT user_id,
                           SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS n_conv
                        FROM events GROUP BY user_id),
            ar AS (SELECT CAST(({_sql_splitmix64('user_id')}) % 2
                              AS BIGINT) AS arm,
                      CASE WHEN n_conv > 0 THEN 1 ELSE 0 END AS cv
                   FROM uc),
            mx AS MATERIALIZED (SELECT
                      CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                           AS BIGINT) AS r1,
                      CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                           AS BIGINT) AS r2,
                      CAST(SUM(CASE WHEN arm = 0 THEN cv ELSE 0 END)
                           AS BIGINT) AS k,
                      CAST(SUM(CASE WHEN arm = 1 THEN cv ELSE 0 END)
                           AS BIGINT) AS cb,
                      CAST(SUM(cv) AS BIGINT) AS ct,
                      CAST(COUNT(*) AS BIGINT) AS n
                   FROM ar),
            lf AS MATERIALIZED (
                SELECT CAST(u.i AS BIGINT) AS i,
                       SUM(CASE WHEN u.i >= 1
                           THEN LN(CAST(u.i AS DOUBLE))
                           ELSE 0e0 END)
                       OVER (ORDER BY u.i
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS v
                FROM (SELECT unnest(range(0,
                          (SELECT n FROM mx) + 1)) AS i) u),
            t AS (SELECT m.r1, m.r2, m.k, m.cb, m.ct, m.n,
                         CAST(u.i AS BIGINT) AS i
                  FROM mx m,
                       UNNEST(range(m.k,
                           LEAST(m.r1, m.ct) + 1)) AS u(i)),
            lp AS (SELECT t.r1, t.r2, t.k, t.cb,
                      (SELECT v FROM lf WHERE i = t.r1)
                      - (SELECT v FROM lf WHERE i = t.i)
                      - (SELECT v FROM lf WHERE i = t.r1 - t.i)
                      + (SELECT v FROM lf WHERE i = t.r2)
                      - (SELECT v FROM lf WHERE i = t.ct - t.i)
                      - (SELECT v FROM lf
                         WHERE i = t.r2 - t.ct + t.i)
                      - ((SELECT v FROM lf WHERE i = t.n)
                         - (SELECT v FROM lf WHERE i = t.ct)
                         - (SELECT v FROM lf WHERE i = t.n - t.ct))
                          AS logp
                   FROM t)
            SELECT r1 AS n_a, r2 AS n_b, k AS conv_a, cb AS conv_b,
                   ROUND(SUM(EXP(logp)), 6) AS p_fisher
            FROM lp GROUP BY r1, r2, k, cb
        """,
        "events_weekly_profile": f"""
            WITH b AS (SELECT dayofweek(ts) * 24 + hour(ts) AS hw,
                          COUNT(*) AS n
                       FROM events GROUP BY hw),
            dom AS (SELECT CAST(r.range AS BIGINT) AS hw
                    FROM range(168) r),
            d AS (SELECT dom.hw, COALESCE(b.n, 0) AS n
                  FROM dom LEFT JOIN b USING (hw)),
            st AS (SELECT CAST(SUM(n) AS DOUBLE) / 168 AS mu,
                      CAST(SUM(n * n) AS DOUBLE) / 168 AS m2
                   FROM d)
            SELECT d.hw, CAST(d.n AS BIGINT) AS n,
                   {_sql_round_even(
                       'CASE WHEN st.m2 - st.mu * st.mu > 0e0 THEN'
                       ' (d.n - st.mu) / sqrt(st.m2 - st.mu * st.mu)'
                       ' ELSE 0e0 END')} AS z
            FROM d CROSS JOIN st ORDER BY d.hw
        """,
        "docs_script_profile": f"""
            WITH cnts AS (SELECT doc_id,
                     length(text) AS n,
                     length(text) - length(regexp_replace(
                         text, '[A-Za-z]', '', 'g')) AS nl,
                     length(text) - length(regexp_replace(
                         text, '[0-9]', '', 'g')) AS nd,
                     length(text) - length(regexp_replace(
                         text, '[ \\t\\n\\r]', '', 'g')) AS nw,
                     length(text) - length(regexp_replace(
                         text, '[\\x{{4E00}}-\\x{{9FFF}}]', '', 'g'))
                         AS nc
                  FROM documents)
            SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
                   {_sql_round_even(
                       'CAST(nl AS DOUBLE)'
                       ' / CAST(GREATEST(n, 1) AS DOUBLE)')}
                       AS latin_frac,
                   {_sql_round_even(
                       'CAST(nd AS DOUBLE)'
                       ' / CAST(GREATEST(n, 1) AS DOUBLE)')}
                       AS digit_frac,
                   {_sql_round_even(
                       'CAST(nw AS DOUBLE)'
                       ' / CAST(GREATEST(n, 1) AS DOUBLE)')}
                       AS ws_frac,
                   {_sql_round_even(
                       'CAST(nc AS DOUBLE)'
                       ' / CAST(GREATEST(n, 1) AS DOUBLE)')}
                       AS cjk_frac,
                   {_sql_round_even(
                       'CAST(n - nl - nd - nw - nc AS DOUBLE)'
                       ' / CAST(GREATEST(n, 1) AS DOUBLE)')}
                       AS other_frac
            FROM cnts ORDER BY doc_id
        """,
        "embedding_truncation_recall": """
            WITH q AS (SELECT vec_id AS qid,
                          CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings ORDER BY vec_id LIMIT 5),
            fs AS (SELECT q.qid, e.vec_id,
                      list_cosine_similarity(q.qe,
                          CAST(e.embedding AS DOUBLE[])) AS c
                   FROM q CROSS JOIN embeddings e),
            fr AS (SELECT qid, vec_id FROM (
                       SELECT qid, vec_id,
                          ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY c DESC, vec_id) AS rn
                       FROM fs) WHERE rn <= 10),
            hs AS (SELECT q.qid, e.vec_id,
                      list_cosine_similarity(
                          list_slice(q.qe, 1, 32),
                          list_slice(CAST(e.embedding AS DOUBLE[]),
                                     1, 32)) AS c
                   FROM q CROSS JOIN embeddings e),
            hr AS (SELECT qid, vec_id FROM (
                       SELECT qid, vec_id,
                          ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY c DESC, vec_id) AS rn
                       FROM hs) WHERE rn <= 10),
            ov AS (SELECT f.qid, COUNT(h.vec_id) AS m
                   FROM fr f LEFT JOIN hr h
                     ON h.qid = f.qid AND h.vec_id = f.vec_id
                   GROUP BY f.qid)
            SELECT qid AS query_vec_id, CAST(m AS BIGINT) AS n_common,
                   CAST(m AS DOUBLE) / 10e0 AS recall_at_10
            FROM ov ORDER BY query_vec_id
        """,
        "part_adamic_adar": """
            WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                        WHERE l_orderkey % 5 = 0),
            pe AS (SELECT DISTINCT
                       l1.l_partkey AS a, l2.l_partkey AS b
                   FROM li l1 JOIN li l2
                     ON l2.l_orderkey = l1.l_orderkey
                    AND l1.l_partkey < l2.l_partkey),
            adj AS (SELECT a, b FROM pe
                    UNION ALL SELECT b, a FROM pe),
            dg AS (SELECT a AS node, COUNT(*) AS deg FROM adj
                   GROUP BY a),
            wed AS (SELECT x.b AS nb, y.b AS nc, x.a AS pv
                    FROM adj x JOIN adj y
                      ON y.a = x.a AND x.b < y.b),
            sc AS (SELECT w.nb, w.nc, COUNT(*) AS n_common,
                          SUM(1.0 / LN(d.deg)) AS s
                   FROM wed w JOIN dg d ON d.node = w.pv
                   GROUP BY w.nb, w.nc),
            cand AS (SELECT nb AS node_b, nc AS node_c, n_common,
                            ROUND(s, 6) AS aa_score
                     FROM sc
                     WHERE NOT EXISTS (
                         SELECT 1 FROM pe
                         WHERE pe.a = sc.nb AND pe.b = sc.nc))
            SELECT node_b, node_c, n_common, aa_score
            FROM cand
            ORDER BY aa_score DESC, node_b, node_c LIMIT 20
        """,
        "customer_part_hits": _sql_hits(iters=5),
        "part_link_jaccard": """
            WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                        WHERE l_orderkey % 5 = 0),
            pe AS (SELECT DISTINCT
                       l1.l_partkey AS a, l2.l_partkey AS b
                   FROM li l1 JOIN li l2
                     ON l2.l_orderkey = l1.l_orderkey
                    AND l1.l_partkey < l2.l_partkey),
            adj AS (SELECT a, b FROM pe
                    UNION ALL SELECT b, a FROM pe),
            dg AS (SELECT a AS node, COUNT(*) AS deg FROM adj
                   GROUP BY a),
            wed AS (SELECT x.b AS nb, y.b AS nc,
                           COUNT(*) AS n_common
                    FROM adj x JOIN adj y
                      ON y.a = x.a AND x.b < y.b
                    GROUP BY x.b, y.b),
            cand AS (SELECT w.nb AS node_b, w.nc AS node_c,
                        w.n_common,
                        CAST(w.n_common AS DOUBLE)
                            / (db.deg + dc.deg - w.n_common)
                            AS jacc
                     FROM wed w
                     JOIN dg db ON db.node = w.nb
                     JOIN dg dc ON dc.node = w.nc
                     WHERE NOT EXISTS (
                         SELECT 1 FROM pe
                         WHERE pe.a = w.nb AND pe.b = w.nc))
            SELECT node_b, node_c, n_common,
                   round(jacc, 6) AS jaccard
            FROM cand
            ORDER BY jacc DESC, node_b, node_c LIMIT 20
        """,
        "event_type_cooccurrence": """
            WITH du AS (SELECT DISTINCT user_id, event_type
                        FROM events),
            pr AS (SELECT a.event_type AS type_a,
                          b.event_type AS type_b,
                          COUNT(*) AS n_users
                   FROM du a JOIN du b
                     ON a.user_id = b.user_id
                    AND a.event_type < b.event_type
                   GROUP BY 1, 2),
            sup AS (SELECT event_type, COUNT(*) AS ns FROM du
                    GROUP BY event_type),
            nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE)
                       AS n FROM events)
            SELECT p.type_a, p.type_b, p.n_users,
                   round(p.n_users * (SELECT n FROM nu)
                         / (sa.ns * sb.ns), 6) AS lift
            FROM pr p
            JOIN sup sa ON sa.event_type = p.type_a
            JOIN sup sb ON sb.event_type = p.type_b
        """,
        "docs_chunked": f"""
            WITH toks AS (
                SELECT doc_id, len({_SQL_WS_TOKENS_RAW}) AS n
                FROM documents
            )
            SELECT doc_id, CAST(i // 112 AS BIGINT) AS chunk_ix,
                   CAST(LEAST(128, n - i) AS BIGINT) AS n_tokens
            FROM toks, UNNEST(range(0, GREATEST(n - 16, 1), 112)) AS u(i)
            WHERE n > 0
        """,
        "docs_token_ids": f"""
            WITH tok AS (
                SELECT doc_id, UNNEST({_SQL_WS_TOKENS_RAW}) AS t
                FROM documents
            ),
            vocab AS (
                SELECT token FROM (
                    SELECT token, COUNT(*) AS n FROM (
                        SELECT UNNEST(string_split_regex(lower(text),
                                                         '[^a-z]+')) AS token
                        FROM documents
                    ) WHERE token <> '' GROUP BY token
                ) ORDER BY n DESC, token LIMIT 2000
            ),
            per AS (
                SELECT doc_id, COUNT(*) AS n_ids,
                       SUM(CASE WHEN t IN (SELECT token FROM vocab)
                           THEN 0 ELSE 1 END) AS n_unk
                FROM tok GROUP BY doc_id
            )
            SELECT d.doc_id, CAST(COALESCE(per.n_ids, 0) AS BIGINT) AS n_ids,
                   CAST(COALESCE(per.n_unk, 0) AS BIGINT) AS n_unk
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "docs_banned_terms": """
            WITH t AS (SELECT doc_id, lower(text) AS s FROM documents),
            terms AS (SELECT UNNEST(['the quick', 'lorem', 'error',
                                     'click here', 'qq']) AS term),
            hits AS (
                SELECT doc_id, COUNT(*) AS n
                FROM t, terms,
                     UNNEST(range(1, length(s) - length(term) + 2)) AS u(i)
                WHERE length(s) >= length(term)
                  AND substr(s, CAST(i AS INT), length(term)) = term
                GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(CASE WHEN COALESCE(h.n, 0) > 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS banned,
                   CAST(COALESCE(h.n, 0) AS BIGINT) AS n_banned_hits
            FROM documents d LEFT JOIN hits h USING (doc_id)
        """,
        # stopword-overlap lang-id (engine text.LangId); the CJK script
        # rule never fires on the driver's ASCII corpus, so the SQL twin
        # needs only the stopword path. Tie-break: smallest lang name.
        "lang_id_documents": """
            WITH w AS (
                SELECT doc_id,
                       list_distinct(string_split_regex(lower(text), '\\s+'))
                           AS words
                FROM documents
            ),
            sc AS (
                SELECT doc_id, len(words) AS nw,
                       len(list_filter(words, t -> t IN ('the','and','of','to','a','in','is','that','it','for','with','was'))) AS s_en,
                       len(list_filter(words, t -> t IN ('il','la','di','e','che','un','una','per','con','del','della','non'))) AS s_it,
                       len(list_filter(words, t -> t IN ('der','die','das','und','ist','ein','eine','mit','von','nicht','den'))) AS s_de,
                       len(list_filter(words, t -> t IN ('le','la','de','et','un','une','est','que','pour','dans','avec','pas'))) AS s_fr,
                       len(list_filter(words, t -> t IN ('el','la','de','y','que','un','una','es','en','por','con','para'))) AS s_es
                FROM w
            )
            SELECT doc_id,
                   CASE WHEN GREATEST(s_en,s_it,s_de,s_fr,s_es) = 0 THEN 'unk'
                        WHEN s_de = GREATEST(s_en,s_it,s_de,s_fr,s_es) THEN 'de'
                        WHEN s_en = GREATEST(s_en,s_it,s_de,s_fr,s_es) THEN 'en'
                        WHEN s_es = GREATEST(s_en,s_it,s_de,s_fr,s_es) THEN 'es'
                        WHEN s_fr = GREATEST(s_en,s_it,s_de,s_fr,s_es) THEN 'fr'
                        ELSE 'it' END AS lang_pred,
                   ROUND(CAST(GREATEST(s_en,s_it,s_de,s_fr,s_es) AS DOUBLE)
                         / GREATEST(nw, 1), 6) AS lang_score
            FROM sc
        """,
        # FNV-style rolling hash over utf-8 bytes (engine
        # text.fingerprint64); the driver corpus is ASCII so code point
        # == byte and split('') enumerates bytes exactly.
        "fingerprint_documents": f"""
            SELECT doc_id, fingerprint FROM ({_sql_doc_fingerprints()})
        """,
        # day-2 incremental ingestion vs the durable fingerprint index:
        # day 1 indexes the even-doc_id half, day 2 replays ALL docs —
        # admitted = the min-id doc of each fingerprint group that
        # contains NO even doc (in-batch keep-smallest + index
        # anti-join, collapsed into one GROUP BY since the index IS the
        # even half's fingerprints).
        "docs_incremental_dedup": f"""
            SELECT MIN(doc_id) AS doc_id
            FROM ({_sql_doc_fingerprints()})
            GROUP BY fingerprint
            HAVING SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) = 0
            ORDER BY doc_id
        """,
        "docs_containment_pairs": f"""
            WITH shx AS (
                SELECT DISTINCT doc_id, sg FROM ({_sql_shingles(12)})
            ),
            ok AS (SELECT sg FROM shx GROUP BY sg
                   HAVING COUNT(*) <= 100),
            s2 AS (SELECT doc_id, sg FROM shx
                   WHERE sg IN (SELECT sg FROM ok)),
            ndoc AS (SELECT doc_id, COUNT(*) AS n FROM s2
                     GROUP BY doc_id),
            pr AS (SELECT a.doc_id AS a, b.doc_id AS b,
                          COUNT(*) AS inter
                   FROM s2 a JOIN s2 b
                     ON a.sg = b.sg AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
            SELECT p.a, p.b, CAST(p.inter AS BIGINT) AS inter,
                   round(GREATEST(
                       p.inter / CAST(na.n AS DOUBLE),
                       p.inter / CAST(nb.n AS DOUBLE)), 6)
                       AS containment
            FROM pr p JOIN ndoc na ON na.doc_id = p.a
                      JOIN ndoc nb ON nb.doc_id = p.b
            WHERE GREATEST(p.inter / CAST(na.n AS DOUBLE),
                           p.inter / CAST(nb.n AS DOUBLE)) >= 0.5
            ORDER BY p.a, p.b
        """,
        "docs_ngram_span_dups": f"""
            WITH sh AS (
                SELECT DISTINCT doc_id, sg FROM ({_sql_shingles(12)})
            ),
            shared AS (SELECT sg FROM sh GROUP BY sg HAVING COUNT(*) > 1)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_spans
            FROM sh WHERE sg IN (SELECT sg FROM shared)
            GROUP BY doc_id
        """,
        "decontaminate_documents": f"""
            WITH sh AS ({_sql_shingles(8)}),
            bench AS (SELECT DISTINCT sg FROM sh WHERE doc_id % 53 = 1),
            hits AS (
                SELECT doc_id, COUNT(*) AS n FROM sh
                WHERE sg IN (SELECT sg FROM bench) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(CASE WHEN COALESCE(h.n, 0) > 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS contaminated,
                   CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits
            FROM documents d LEFT JOIN hits h USING (doc_id)
        """,
        # ---- geo fixture twins: lon/lat/captions regenerated in SQL
        # through the same splitmix64 streams; side-tables read from
        # the /tmp parquet the queries consume (_geo_aux_dir)
        "geo_h3_cell_counts": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            {_sql_geo_h3(5)}
            SELECT h3_r5, COUNT(*) AS n FROM gcell GROUP BY h3_r5
        """,
        "geo_tile_assignments": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT lon,
                tan(radians(LEAST(GREATEST(lat, -85.0511e0), 85.0511e0)))
                    AS tphi
              FROM gll)
            SELECT CAST(36028797018963968
                + CAST(LEAST(floor((lon + 180e0) / 360e0 * 256e0), 255e0)
                       AS BIGINT) * 67108864
                -- asinh(x) = ln(x + sqrt(x*x + 1)) (DuckDB has no asinh)
                + CAST(LEAST(floor((1e0 - ln(tphi + sqrt(tphi * tphi + 1e0))
                      / pi()) / 2e0 * 256e0), 255e0) AS BIGINT)
              AS BIGINT) AS tile_key, COUNT(*) AS n_images
            FROM gt GROUP BY tile_key
        """,
        "geo_dedup_phash": f"""
            SELECT image_id, phash FROM (
                SELECT image_id, phash,
                       ROW_NUMBER() OVER (PARTITION BY phash
                                          ORDER BY image_id) AS rn
                FROM read_parquet('{_GEO_FIXTURE_SQL}'))
            WHERE rn = 1
        """,
        "geo_phash_near_dups": f"""
            WITH t AS (SELECT image_id,
                    CAST((CAST(phash AS HUGEINT) + {_M64_SQL})
                         % {_M64_SQL} AS UBIGINT) AS h
                 FROM read_parquet('{_GEO_FIXTURE_SQL}'))
            SELECT a.image_id AS a, b.image_id AS b,
                   CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
            FROM t a JOIN t b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.h, b.h)) <= 6
            ORDER BY a, b
        """,
        "image_thumb_near_dups": f"""
            WITH {_sql_pixels_cte(_GEO_N)},
            rmap AS (
                SELECT g.i, g.c, g.px, oy.o AS oy, ox.o AS ox
                FROM gpx g JOIN gdim d ON d.i = g.i
                CROSS JOIN (SELECT unnest(range(0, 8)) AS o) oy
                CROSS JOIN (SELECT unnest(range(0, 8)) AS o) ox
                WHERE (oy.o * d.h) // 8 <= g.y
                  AND g.y < ((oy.o + 1) * d.h) // 8
                  AND (ox.o * d.w) // 8 <= g.x
                  AND g.x < ((ox.o + 1) * d.w) // 8),
            ravg AS (SELECT i, oy, ox, c, AVG(px) AS v
                     FROM rmap GROUP BY i, oy, ox, c),
            rpx AS (SELECT i, (oy * 8 + ox) * 3 + c AS d,
                        LEAST(GREATEST(
                            FLOOR(v + 0.5e0)
                            - CASE WHEN FLOOR(v + 0.5e0) - v = 0.5e0
                                        AND CAST(FLOOR(v + 0.5e0)
                                                 AS BIGINT) % 2 <> 0
                                   THEN 1 ELSE 0 END, 0e0), 255e0)
                            AS val
                    FROM ravg),
            rn AS (SELECT i, GREATEST(sqrt(SUM(val * val)), 1e-12)
                          AS nrm
                   FROM rpx GROUP BY i),
            prs AS (SELECT a.i AS ia, b.i AS ib,
                        SUM((a.val / na.nrm) * (b.val / nb.nrm)) AS c
                    FROM rpx a
                    JOIN rpx b ON b.i > a.i AND b.d = a.d
                    JOIN rn na ON na.i = a.i
                    JOIN rn nb ON nb.i = b.i
                    GROUP BY a.i, b.i)
            SELECT ia AS a, ib AS b, {_sql_round_even('c')} AS cos
            FROM prs WHERE {_sql_round_even('c')} >= 0.9995
            ORDER BY a, b
        """,
        "image_color_cast": f"""
            WITH {_sql_pixels_cte(_GEO_N)},
            st AS (SELECT i, c, AVG(px) AS m FROM gpx GROUP BY i, c),
            cr AS (SELECT i, MAX(m) / MIN(m) AS cast_ratio
                   FROM st GROUP BY i),
            cl AS (SELECT i,
                       AVG(CASE WHEN px = 0 THEN 1e0 ELSE 0e0 END)
                           AS clip_lo,
                       AVG(CASE WHEN px = 255 THEN 1e0 ELSE 0e0 END)
                           AS clip_hi
                   FROM gpx GROUP BY i)
            SELECT 'img' || lpad(CAST(cr.i AS VARCHAR), 9, '0')
                       AS image_id,
                   {_sql_round_even('cr.cast_ratio')} AS cast_ratio,
                   {_sql_round_even('cl.clip_lo')} AS clip_lo,
                   {_sql_round_even('cl.clip_hi')} AS clip_hi
            FROM cr JOIN cl ON cl.i = cr.i ORDER BY image_id
        """,
        "image_dims_by_fmt": f"""
            WITH {_sql_geo_hashes(_GEO_N, [10, 11, 12])},
            {_sql_gdims_body()}
            SELECT fmt, COUNT(*) AS n,
                   round(AVG(CAST(w AS DOUBLE)), 4) AS avg_w,
                   round(AVG(CAST(h AS DOUBLE)), 4) AS avg_h,
                   round(SUM(CAST(w AS DOUBLE) * CAST(h AS DOUBLE)
                             / 1e6), 4) AS sum_mpx
            FROM gdim GROUP BY fmt
        """,
        "image_mpx_by_cell": f"""
            WITH {_sql_geo_hashes(_GEO_N, [1, 2, 3, 4, 10, 11, 12])},
            {_sql_gll_body()},
            {_sql_geo_h3(5)},
            {_sql_gdims_body()}
            SELECT c.h3_r5, COUNT(*) AS n,
                   round(SUM(CAST(d.w AS DOUBLE) * CAST(d.h AS DOUBLE)
                             / 1e6), 4) AS sum_mpx
            FROM gcell c JOIN gdim d USING (i) GROUP BY c.h3_r5
        """,
        "image_payload_bytes_by_fmt": f"""
            SELECT fmt, COUNT(*) AS n,
                   CAST(SUM(octet_length(bytes)) AS BIGINT) AS total_bytes,
                   round(AVG(CAST(octet_length(bytes) AS DOUBLE)), 4)
                       AS avg_bytes
            FROM read_parquet('{_GEO_FIXTURE_SQL}') GROUP BY fmt
        """,
        "geo_article_match": f"""
            WITH {_sql_geo_canon(_GEO_N)}
            SELECT g.image_id, a.article_id, g.caption_canon, a.theme
            FROM gcanon g
            JOIN read_parquet('{_GEO_AUX_ARTICLES}') a
              ON a.title_canon = g.caption_canon
        """,
        "geo_articles_untagged": f"""
            WITH {_sql_geo_canon(_GEO_N)}
            SELECT article_id, title_canon, theme, lon, lat
            FROM read_parquet('{_GEO_AUX_ARTICLES}')
            WHERE title_canon NOT IN (SELECT caption_canon FROM gcanon)
            ORDER BY article_id
        """,
        "geo_article_fuzzy_match": f"""
            WITH {_sql_geo_canon(_GEO_N)},
            garts AS (SELECT DISTINCT title_canon
                      FROM read_parquet('{_GEO_AUX_ARTICLES}'))
            SELECT g.image_id,
                   COALESCE(MIN(CASE WHEN levenshtein(g.caption_canon,
                                                      a.title_canon) <= 1
                                     THEN a.title_canon END),
                            '') AS matched_title
            FROM gcanon g CROSS JOIN garts a
            GROUP BY g.image_id
        """,
        "geo_toponym_infer": f"""
            WITH {_SQL_GEO_CENTROIDS},
            gaz AS (SELECT p.admin_id, p.name,
                       ROW_NUMBER() OVER (ORDER BY length(p.name) DESC,
                                          p.admin_id) AS rnk
                    FROM read_parquet('{_GEO_AUX_POLYMETA}') p),
            gm AS (SELECT a.article_id, g.admin_id, g.name, g.rnk,
                          strpos(a.summary, g.name) AS pos
                   FROM read_parquet('{_GEO_AUX_ARTICLES}') a
                   CROSS JOIN gaz g
                   WHERE strpos(a.summary, g.name) > 0),
            gb AS (SELECT article_id, admin_id, name,
                       ROW_NUMBER() OVER (PARTITION BY article_id
                                          ORDER BY pos, rnk) AS rn
                   FROM gm)
            SELECT b.article_id, b.admin_id, b.name,
                   CAST(c.level AS INT) AS level,
                   c.centroid_lon AS inferred_lon,
                   c.centroid_lat AS inferred_lat
            FROM gb b JOIN gcent c USING (admin_id)
            WHERE b.rn = 1 ORDER BY b.article_id
        """,
        "geo_josm_links": f"""
            WITH {_sql_geo_full(_GEO_N)},
            gm AS (SELECT c.image_id, g.lon, g.lat
                   FROM gcanon c JOIN gll g USING (i)
                   WHERE c.caption_canon IN
                         (SELECT title_canon
                          FROM read_parquet('{_GEO_AUX_ARTICLES}')))
            SELECT image_id,
                   'http://localhost:8111/load_and_zoom?left='
                   || printf('%.6f', lon - 0.001)
                   || '&right=' || printf('%.6f', lon + 0.001)
                   || '&top=' || printf('%.6f', lat + 0.001)
                   || '&bottom=' || printf('%.6f', lat - 0.001)
                       AS josm_url,
                   'node(around:100,' || printf('%.6f', lat) || ','
                   || printf('%.6f', lon) || ');out;' AS overpass_query
            FROM gm ORDER BY image_id
        """,
        "geo_area_export_rows": f"""
            WITH {_sql_geo_canon(_GEO_N)},
            gunt AS (SELECT article_id, title_canon, theme, lon, lat
                     FROM read_parquet('{_GEO_AUX_ARTICLES}')
                     WHERE title_canon NOT IN
                           (SELECT caption_canon FROM gcanon)),
            gpts AS (SELECT article_id AS image_id, lon, lat FROM gunt),
            {_SQL_GEO_PIP}
            SELECT h.admin_id, h.level, u.article_id, u.title_canon,
                   u.theme, u.lon, u.lat
            FROM ghits h JOIN gunt u ON u.article_id = h.image_id
            ORDER BY h.admin_id, u.article_id
        """,
        "geo_site_index": f"""
            WITH {_sql_geo_canon(_GEO_N)},
            gunt AS (SELECT article_id, theme, lon, lat
                     FROM read_parquet('{_GEO_AUX_ARTICLES}')
                     WHERE title_canon NOT IN
                           (SELECT caption_canon FROM gcanon)),
            gpts AS (SELECT article_id AS image_id, lon, lat FROM gunt),
            {_SQL_GEO_PIP},
            ex AS (SELECT h.admin_id, u.theme
                   FROM ghits h JOIN gunt u ON u.article_id = h.image_id),
            per AS (SELECT 'theme_' || theme || '.html' AS page,
                           admin_id AS area, COUNT(*) AS n_rows
                    FROM ex GROUP BY theme, admin_id),
            top AS (SELECT 'theme_' || theme || '.html' AS page,
                           '*' AS area, COUNT(*) AS n_rows
                    FROM ex GROUP BY theme),
            idx AS (SELECT 'index.html' AS page, '*' AS area,
                           COUNT(*) AS n_rows FROM ex)
            SELECT * FROM per UNION ALL SELECT * FROM top
            UNION ALL SELECT * FROM idx
        """,
        "geo_polygon_centroids": f"""
            WITH {_SQL_GEO_CENTROIDS}
            SELECT admin_id, level, centroid_lon, centroid_lat
            FROM gcent ORDER BY admin_id
        """,
        "geo_admin_nearest_admin": f"""
            WITH {_SQL_GEO_CENTROIDS},
            p AS (SELECT a.admin_id, a.level, b.admin_id AS nb,
                     round({_sql_haversine(
                         'a.centroid_lat', 'a.centroid_lon',
                         'b.centroid_lat', 'b.centroid_lon')}, 3)
                         AS dist
                  FROM gcent a JOIN gcent b
                      ON b.admin_id <> a.admin_id),
            r AS (SELECT admin_id, level, nb, dist,
                     ROW_NUMBER() OVER (PARTITION BY admin_id
                         ORDER BY dist, nb) AS rn
                  FROM p)
            SELECT admin_id, CAST(level AS BIGINT) AS level,
                   nb AS nearest_admin_id, dist AS dist_m
            FROM r WHERE rn = 1 ORDER BY admin_id
        """,
        "click_to_purchase_latency": """
            WITH f AS (SELECT user_id,
                    MIN(CASE WHEN event_type = 'click'
                        THEN epoch(ts) END) AS fc,
                    MIN(CASE WHEN event_type = 'purchase'
                        THEN epoch(ts) END) AS fp
                FROM events GROUP BY user_id),
            l AS (SELECT fp - fc AS lat FROM f
                  WHERE fc IS NOT NULL AND fp IS NOT NULL
                    AND fp >= fc)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   ROUND(quantile_disc(lat, 0.5), 6) AS p50_s,
                   ROUND(quantile_disc(lat, 0.9), 6) AS p90_s,
                   ROUND(AVG(lat), 6) AS mean_s
            FROM l
        """,
        "geo_admin_image_density": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gll),
            {_SQL_GEO_PIP},
            cnt AS (SELECT admin_id, COUNT(*) AS n_images
                    FROM ghits GROUP BY admin_id),
            av AS (SELECT admin_id, level, ring_ix, vertex_ix,
                          lon, lat
                   FROM read_parquet('{_GEO_AUX_VERTICES}')),
            aw AS (SELECT admin_id, level, ring_ix,
                     lon * COALESCE(LEAD(lat) OVER rw,
                                    FIRST_VALUE(lat) OVER rw)
                   - COALESCE(LEAD(lon) OVER rw,
                              FIRST_VALUE(lon) OVER rw) * lat AS cr
                  FROM av WINDOW rw AS (PARTITION BY admin_id, ring_ix
                                        ORDER BY vertex_ix)),
            ar0 AS (SELECT admin_id, level, ring_ix,
                           ABS(SUM(cr)) / 2e0 AS a
                    FROM aw GROUP BY admin_id, level, ring_ix),
            ar AS (SELECT admin_id, level,
                      SUM(CASE WHEN ring_ix = 0 THEN a ELSE -a END)
                          AS area
                   FROM ar0 GROUP BY admin_id, level)
            SELECT ar.admin_id, ar.level,
                   round(ar.area, 6) AS area_deg2,
                   CAST(COALESCE(c.n_images, 0) AS BIGINT)
                       AS n_images,
                   round(CAST(COALESCE(c.n_images, 0) AS DOUBLE)
                         / ar.area, 6) AS density
            FROM ar LEFT JOIN cnt c ON c.admin_id = ar.admin_id
            ORDER BY ar.admin_id
        """,
        "geo_polygon_areas": f"""
            WITH v AS (SELECT admin_id, level, ring_ix, vertex_ix,
                              lon, lat
                       FROM read_parquet('{_GEO_AUX_VERTICES}')),
            w AS (SELECT admin_id, level, ring_ix,
                     lon * COALESCE(LEAD(lat) OVER rw,
                                    FIRST_VALUE(lat) OVER rw)
                   - COALESCE(LEAD(lon) OVER rw,
                              FIRST_VALUE(lon) OVER rw) * lat AS cr
                  FROM v WINDOW rw AS (PARTITION BY admin_id, ring_ix
                                       ORDER BY vertex_ix)),
            r AS (SELECT admin_id, level, ring_ix,
                         ABS(SUM(cr)) / 2e0 AS a
                  FROM w GROUP BY admin_id, level, ring_ix)
            SELECT admin_id, level,
                   round(SUM(CASE WHEN ring_ix = 0 THEN a ELSE -a END),
                         6) AS area_deg2
            FROM r GROUP BY admin_id, level
        """,
        "geo_idw_mpx_at_centroids": f"""
            WITH {_sql_geo_hashes(_GEO_N, [1, 2, 3, 4, 10, 11, 12])},
            {_sql_gll_body()},
            {_sql_gdims_body()},
            gimg AS (SELECT 'img' || lpad(CAST(g.i AS VARCHAR), 9, '0')
                         AS image_id,
                        g.lon, g.lat, d.w * d.h / 1e6 AS mpx
                     FROM gll g JOIN gdim d ON d.i = g.i),
            qpts AS (SELECT admin_id AS poi_id,
                            AVG(lon) AS qlon, AVG(lat) AS qlat
                     FROM read_parquet('{_GEO_AUX_VERTICES}')
                     WHERE ring_ix = 0 GROUP BY admin_id),
            gd AS (SELECT q.poi_id, g.image_id, g.mpx,
                      GREATEST({_sql_haversine('q.qlat', 'q.qlon',
                                               'g.lat', 'g.lon')},
                               1e-9) AS dist_m
                   FROM qpts q CROSS JOIN gimg g),
            gr AS (SELECT poi_id, mpx, dist_m,
                      ROW_NUMBER() OVER (PARTITION BY poi_id
                                         ORDER BY dist_m, image_id)
                          AS rn
                   FROM gd)
            SELECT poi_id, COUNT(*) AS n_used,
                   round(SUM(mpx / pow(dist_m, 2))
                         / SUM(1e0 / pow(dist_m, 2)), 6) AS idw_val
            FROM gr WHERE rn <= 5 GROUP BY poi_id
        """,
        "geo_coverage_gaps": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gll),
            {_SQL_GEO_PIP}
            SELECT image_id, round(lon, 6) AS lon, round(lat, 6) AS lat
            FROM gpts
            WHERE image_id NOT IN (SELECT image_id FROM ghits)
        """,
        "geo_polygon_pruned_scan": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gll),
            {_SQL_GEO_PIP},
            sel AS (SELECT MIN(admin_id) AS a
                    FROM read_parquet('{_GEO_AUX_POLYMETA}')
                    WHERE level = 1)
            SELECT image_id FROM ghits
            WHERE admin_id = (SELECT a FROM sel)
        """,
        "geo_track_stats": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gs AS (SELECT track_id, seq, lon, lat,
                      LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat
                   FROM gt
                   WINDOW w AS (PARTITION BY track_id ORDER BY seq))
            SELECT track_id, COUNT(*) AS n_points,
                   round(COALESCE(SUM(
                       {_sql_haversine('plat', 'plon', 'lat', 'lon')}),
                       0), 4) AS track_m,
                   round({_sql_haversine(
                       'arg_min(lat, seq)', 'arg_min(lon, seq)',
                       'arg_max(lat, seq)', 'arg_max(lon, seq)')},
                       4) AS net_m
            FROM gs GROUP BY track_id
        """,
        "geo_track_bearings": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gs AS (SELECT track_id, seq, lon, lat,
                      LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat
                   FROM gt
                   WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            gb AS (SELECT track_id,
                      atan2(sin(radians(lon - plon)) * cos(radians(lat)),
                            cos(radians(plat)) * sin(radians(lat))
                            - sin(radians(plat)) * cos(radians(lat))
                              * cos(radians(lon - plon))) AS theta,
                      {_sql_haversine('plat', 'plon', 'lat', 'lon')} AS d
                   FROM gs WHERE plon IS NOT NULL),
            ga AS (SELECT track_id, COUNT(*) AS n_segs,
                      AVG(sin(theta)) AS ms, AVG(cos(theta)) AS mc,
                      SUM(d) AS track_m
                   FROM gb GROUP BY track_id),
            gn AS (SELECT track_id,
                      {_sql_haversine(
                          'arg_min(lat, seq)', 'arg_min(lon, seq)',
                          'arg_max(lat, seq)', 'arg_max(lon, seq)')}
                          AS net_m
                   FROM gt GROUP BY track_id)
            SELECT a.track_id, a.n_segs,
                   round(sqrt(ms * ms + mc * mc), 4)
                       AS bearing_concentration,
                   round(CASE WHEN n.net_m > 0e0
                              THEN a.track_m / n.net_m
                              ELSE 0e0 END, 4) AS sinuosity
            FROM ga a JOIN gn n USING (track_id)
        """,
        "geo_boundary_crossings": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gsg AS (SELECT track_id, lon AS bx, lat AS by,
                       LAG(lon) OVER w AS ax, LAG(lat) OVER w AS ay
                    FROM gt
                    WINDOW w AS (PARTITION BY track_id ORDER BY seq)
                    QUALIFY ax IS NOT NULL),
            gvx AS (SELECT lon AS x, lat AS y,
                       COALESCE(LEAD(lon) OVER w,
                                FIRST_VALUE(lon) OVER w) AS x1,
                       COALESCE(LEAD(lat) OVER w,
                                FIRST_VALUE(lat) OVER w) AS y1
                    FROM read_parquet('{_GEO_AUX_VERTICES}')
                    WINDOW w AS (PARTITION BY admin_id, ring_ix
                                 ORDER BY vertex_ix
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING)),
            go AS (SELECT s.track_id,
                      (s.bx - s.ax) * (e.y - s.ay)
                      - (s.by - s.ay) * (e.x - s.ax) AS o1,
                      (s.bx - s.ax) * (e.y1 - s.ay)
                      - (s.by - s.ay) * (e.x1 - s.ax) AS o2,
                      (e.x1 - e.x) * (s.ay - e.y)
                      - (e.y1 - e.y) * (s.ax - e.x) AS o3,
                      (e.x1 - e.x) * (s.by - e.y)
                      - (e.y1 - e.y) * (s.bx - e.x) AS o4
                   FROM gsg s CROSS JOIN gvx e),
            gcnt AS (SELECT track_id, COUNT(*) AS n_segs
                     FROM gsg GROUP BY track_id),
            ghit AS (SELECT track_id,
                        CAST(SUM(CASE WHEN o1 * o2 < 0e0
                                       AND o3 * o4 < 0e0
                                      THEN 1 ELSE 0 END) AS BIGINT)
                            AS n_crossings
                     FROM go GROUP BY track_id)
            SELECT c.track_id, c.n_segs, h.n_crossings
            FROM gcnt c JOIN ghit h USING (track_id)
        """,
        "geo_morans_i": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gcc AS (SELECT CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                        AS gx,
                        CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                        AS gy
                    FROM gll),
            gcnt AS (SELECT gx, gy, COUNT(*) AS n FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY gx, gy),
            ggrid AS (SELECT CAST(x.range AS BIGINT) AS gx,
                             CAST(y.range AS BIGINT) AS gy
                      FROM range(24) x CROSS JOIN range(12) y),
            gx0 AS (SELECT g.gx, g.gy,
                       CAST(COALESCE(c.n, 0) AS DOUBLE) AS v
                    FROM ggrid g LEFT JOIN gcnt c USING (gx, gy)),
            gdev AS (SELECT gx, gy,
                        v - (SELECT AVG(v) FROM gx0) AS xd
                     FROM gx0),
            gpair AS (SELECT a.xd AS xa, b.xd AS xb
                      FROM gdev a JOIN gdev b
                        ON abs(a.gx - b.gx) + abs(a.gy - b.gy) = 1)
            SELECT CAST(288 AS BIGINT) AS n_cells,
                   (SELECT COUNT(*) FROM gpair) AS s0_pairs,
                   round((288e0 / (SELECT COUNT(*) FROM gpair))
                         * (SELECT SUM(xa * xb) FROM gpair)
                         / (SELECT SUM(xd * xd) FROM gdev), 6)
                       AS moran_i
        """,
        "geo_geary_c": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gcc AS (SELECT CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                        AS gx,
                        CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                        AS gy
                    FROM gll),
            gcnt AS (SELECT gx, gy, COUNT(*) AS n FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY gx, gy),
            ggrid AS (SELECT CAST(x.range AS BIGINT) AS gx,
                             CAST(y.range AS BIGINT) AS gy
                      FROM range(24) x CROSS JOIN range(12) y),
            gx0 AS (SELECT g.gx, g.gy,
                       CAST(COALESCE(c.n, 0) AS DOUBLE) AS v
                    FROM ggrid g LEFT JOIN gcnt c USING (gx, gy)),
            gdev AS (SELECT gx, gy,
                        v - (SELECT AVG(v) FROM gx0) AS xd
                     FROM gx0),
            gpair AS (SELECT a.v AS va, b.v AS vb
                      FROM gx0 a JOIN gx0 b
                        ON abs(a.gx - b.gx) + abs(a.gy - b.gy) = 1)
            SELECT CAST(288 AS BIGINT) AS n_cells,
                   (SELECT COUNT(*) FROM gpair) AS s0_pairs,
                   round((288e0 - 1e0)
                         / (2e0 * (SELECT COUNT(*) FROM gpair))
                         * ((SELECT SUM((va - vb) * (va - vb))
                             FROM gpair)
                            / (SELECT SUM(xd * xd) FROM gdev)), 6)
                       AS geary_c
        """,
        "geo_getis_ord": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gcc AS (SELECT CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                        AS gx,
                        CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                        AS gy
                    FROM gll),
            gcnt AS (SELECT gx, gy, COUNT(*) AS n FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY gx, gy),
            ggrid AS (SELECT CAST(x.range AS BIGINT) AS gx,
                             CAST(y.range AS BIGINT) AS gy
                      FROM range(24) x CROSS JOIN range(12) y),
            gx0 AS (SELECT g.gx, g.gy,
                       CAST(COALESCE(c.n, 0) AS DOUBLE) AS v
                    FROM ggrid g LEFT JOIN gcnt c USING (gx, gy)),
            gstat AS (SELECT AVG(v) AS xbar,
                             sqrt(AVG(v * v) - AVG(v) * AVG(v)) AS s
                      FROM gx0),
            gnbr AS (SELECT a.gx, a.gy,
                        SUM(b.v) AS nbr_sum, COUNT(*) AS w
                     FROM gx0 a JOIN gx0 b
                       ON abs(a.gx - b.gx) + abs(a.gy - b.gy) <= 1
                     GROUP BY a.gx, a.gy)
            SELECT n.gx, n.gy, CAST(x.v AS BIGINT) AS n,
                   round((n.nbr_sum - st.xbar * n.w)
                         / (st.s * sqrt((288e0 * n.w - n.w * n.w)
                                        / 287e0)), 6) AS gi_z
            FROM gnbr n
            JOIN gx0 x USING (gx, gy)
            CROSS JOIN gstat st
        """,
        "geo_local_morans": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gcc AS (SELECT CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                        AS gx,
                        CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                        AS gy
                    FROM gll),
            gcnt AS (SELECT gx, gy, COUNT(*) AS n FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY gx, gy),
            ggrid AS (SELECT CAST(x.range AS BIGINT) AS gx,
                             CAST(y.range AS BIGINT) AS gy
                      FROM range(24) x CROSS JOIN range(12) y),
            gx0 AS (SELECT g.gx, g.gy,
                       CAST(COALESCE(c.n, 0) AS DOUBLE) AS v
                    FROM ggrid g LEFT JOIN gcnt c USING (gx, gy)),
            gstat AS (SELECT AVG(v) AS xbar,
                             AVG(v * v) - AVG(v) * AVG(v) AS m2
                      FROM gx0),
            gnbr AS (SELECT a.gx, a.gy,
                        SUM(b.v) AS nbr_sum, COUNT(*) AS w
                     FROM gx0 a JOIN gx0 b
                       ON abs(a.gx - b.gx) + abs(a.gy - b.gy) = 1
                     GROUP BY a.gx, a.gy)
            SELECT n.gx, n.gy, CAST(x.v AS BIGINT) AS n,
                   round((x.v - st.xbar)
                         * (n.nbr_sum - st.xbar * n.w) / st.m2, 6)
                       AS local_i
            FROM gnbr n
            JOIN gx0 x USING (gx, gy)
            CROSS JOIN gstat st
        """,
        "geo_quadtree_cells": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            p AS (SELECT lon, lat FROM gll
                  WHERE lon >= -12e0 AND lon < 12e0
                    AND lat >= 35e0 AND lat < 47e0),
            c6 AS (SELECT CAST(floor((lon - -12e0) / 24e0 * 64)
                            AS BIGINT) AS x,
                      CAST(floor((lat - 35e0) / 12e0 * 64)
                            AS BIGINT) AS y,
                      COUNT(*) AS n
                   FROM p GROUP BY x, y),
            c5 AS (SELECT x // 2 AS x, y // 2 AS y,
                      CAST(SUM(n) AS BIGINT) AS n FROM c6 GROUP BY 1, 2),
            c4 AS (SELECT x // 2 AS x, y // 2 AS y,
                      CAST(SUM(n) AS BIGINT) AS n FROM c5 GROUP BY 1, 2),
            c3 AS (SELECT x // 2 AS x, y // 2 AS y,
                      CAST(SUM(n) AS BIGINT) AS n FROM c4 GROUP BY 1, 2),
            c2 AS (SELECT x // 2 AS x, y // 2 AS y,
                      CAST(SUM(n) AS BIGINT) AS n FROM c3 GROUP BY 1, 2),
            c1 AS (SELECT x // 2 AS x, y // 2 AS y,
                      CAST(SUM(n) AS BIGINT) AS n FROM c2 GROUP BY 1, 2),
            c0 AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM c1),
            asg AS (SELECT c6.x AS x6, c6.y AS y6, c6.n AS n6,
                       CASE WHEN c0.n <= 32 THEN 0
                            WHEN c1.n <= 32 THEN 1
                            WHEN c2.n <= 32 THEN 2
                            WHEN c3.n <= 32 THEN 3
                            WHEN c4.n <= 32 THEN 4
                            WHEN c5.n <= 32 THEN 5
                            ELSE 6 END AS depth
                    FROM c6
                    JOIN c5 ON c5.x = c6.x // 2 AND c5.y = c6.y // 2
                    JOIN c4 ON c4.x = c6.x // 4 AND c4.y = c6.y // 4
                    JOIN c3 ON c3.x = c6.x // 8 AND c3.y = c6.y // 8
                    JOIN c2 ON c2.x = c6.x // 16 AND c2.y = c6.y // 16
                    JOIN c1 ON c1.x = c6.x // 32 AND c1.y = c6.y // 32
                    CROSS JOIN c0)
            SELECT depth, x6 >> (6 - depth) AS cx,
                   y6 >> (6 - depth) AS cy,
                   CAST(SUM(n6) AS BIGINT) AS n
            FROM asg GROUP BY depth, cx, cy
            ORDER BY depth, cx, cy
        """,
        "geo_speed_outliers": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gs AS (SELECT track_id, seq, lon, lat,
                      LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat,
                      LAG(seq) OVER w AS pseq
                   FROM gt
                   WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            gv AS (SELECT track_id,
                      {_sql_haversine('plat', 'plon', 'lat', 'lon')}
                          / (seq - pseq) AS v
                   FROM gs WHERE plon IS NOT NULL)
            SELECT track_id, COUNT(*) AS n_segs,
                   COUNT(*) FILTER (WHERE v > 10000e0) AS n_spikes,
                   round(MAX(v), 4) AS max_speed_mps
            FROM gv GROUP BY track_id
        """,
        "geo_geofence_dwell": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gll),
            {_SQL_GEO_PIP},
            gin AS (SELECT
                       CAST(substr(image_id, 4) AS BIGINT) % 50
                           AS track_id,
                       CAST(substr(image_id, 4) AS BIGINT) AS seq,
                       admin_id, CAST(level AS BIGINT) AS level
                    FROM ghits),
            gst AS (SELECT a.track_id, a.admin_id, a.level,
                       CASE WHEN b.seq IS NULL THEN 1 ELSE 0 END AS st
                    FROM gin a LEFT JOIN gin b
                      ON b.track_id = a.track_id
                     AND b.admin_id = a.admin_id
                     AND b.seq = a.seq - 50)
            SELECT track_id, admin_id, level,
                   CAST(SUM(st) AS BIGINT) AS n_episodes,
                   COUNT(*) AS n_inside
            FROM gst GROUP BY track_id, admin_id, level
        """,
        "geo_track_hausdorff": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS tid, i, lon, lat FROM gll),
            gbb AS (SELECT tid, MIN(lon) AS minx, MAX(lon) AS maxx,
                           MIN(lat) AS miny, MAX(lat) AS maxy
                    FROM gt GROUP BY tid),
            gpair AS (SELECT a.tid AS ta, b.tid AS tb
                      FROM gbb a JOIN gbb b
                        ON a.tid < b.tid
                       AND a.minx <= b.maxx AND b.minx <= a.maxx
                       AND a.miny <= b.maxy AND b.miny <= a.maxy),
            gd AS (SELECT p.ta, p.tb, x.i AS ai, y.i AS bi,
                      {_sql_haversine('x.lat', 'x.lon',
                                      'y.lat', 'y.lon')} AS d
                   FROM gpair p
                   JOIN gt x ON x.tid = p.ta
                   JOIN gt y ON y.tid = p.tb),
            gm1 AS (SELECT ta, tb, ai, MIN(d) AS md FROM gd
                    GROUP BY ta, tb, ai),
            gm2 AS (SELECT ta, tb, bi, MIN(d) AS md FROM gd
                    GROUP BY ta, tb, bi),
            ghda AS (SELECT ta, tb, MAX(md) AS h FROM gm1
                    GROUP BY ta, tb),
            ghdb AS (SELECT ta, tb, MAX(md) AS h FROM gm2
                    GROUP BY ta, tb)
            SELECT ghda.ta AS track_a, ghda.tb AS track_b,
                   round(GREATEST(ghda.h, ghdb.h), 4) AS hausdorff_m
            FROM ghda JOIN ghdb ON ghda.ta = ghdb.ta AND ghda.tb = ghdb.tb
        """,
        # discrete Frechet coupling DP as an anti-diagonal wavefront
        # recursion: one row per candidate pair per step carrying the
        # last TWO ca-diagonals as DOUBLE lists; the new diagonal is a
        # single list_transform whose neighbor indices shift by
        # base(t) = GREATEST(0, t - (n-1)) (out-of-range / [0] list
        # probes yield NULL -> 1e30 sentinel = missing neighbor).
        # Track length n = _GEO_N // 50 is fixture-fixed, so the
        # recursion depth (2n - 2 diagonals) is a constant.
        "geo_track_frechet": f"""
            WITH RECURSIVE {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS tid, i // 50 AS si, lon, lat
                   FROM gll),
            gbb AS (SELECT tid, MIN(lon) AS minx, MAX(lon) AS maxx,
                           MIN(lat) AS miny, MAX(lat) AS maxy
                    FROM gt GROUP BY tid),
            gpair AS (SELECT a.tid AS ta, b.tid AS tb
                      FROM gbb a JOIN gbb b
                        ON a.tid < b.tid
                       AND a.minx <= b.maxx AND b.minx <= a.maxx
                       AND a.miny <= b.maxy AND b.miny <= a.maxy),
            gdm AS (SELECT p.ta, p.tb, x.si AS ai, y.si AS bi,
                      {_sql_haversine('x.lat', 'x.lon',
                                      'y.lat', 'y.lon')} AS d
                   FROM gpair p
                   JOIN gt x ON x.tid = p.ta
                   JOIN gt y ON y.tid = p.tb),
            gdg AS (SELECT ta, tb, ai + bi AS t,
                           list(d ORDER BY ai) AS dl
                    FROM gdm GROUP BY ta, tb, ai + bi),
            gwave AS (
              SELECT ta, tb, 0 AS t, dl AS cur,
                     CAST([] AS DOUBLE[]) AS prev
              FROM gdg WHERE t = 0
              UNION ALL
              SELECT w.ta, w.tb, w.t + 1,
                list_transform(g.dl, (dv, p) -> GREATEST(dv, LEAST(
                  COALESCE(w.cur[p + GREATEST(0, w.t - {_GEO_NPT - 2})
                             - GREATEST(0, w.t - {_GEO_NPT - 1}) - 1],
                           1e30),
                  COALESCE(w.cur[p + GREATEST(0, w.t - {_GEO_NPT - 2})
                             - GREATEST(0, w.t - {_GEO_NPT - 1})],
                           1e30),
                  COALESCE(w.prev[p + GREATEST(0, w.t - {_GEO_NPT - 2})
                             - GREATEST(0, w.t - {_GEO_NPT}) - 1],
                           1e30)))),
                w.cur
              FROM gwave w JOIN gdg g ON g.ta = w.ta AND g.tb = w.tb
                            AND g.t = w.t + 1
            )
            SELECT ta AS track_a, tb AS track_b,
                   round(cur[1], 4) AS frechet_m
            FROM gwave WHERE t = {2 * _GEO_NPT - 2}
            ORDER BY track_a, track_b
        """,
        "geo_track_sde": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, lon, lat FROM gll),
            m AS (SELECT track_id, COUNT(*) AS n,
                     SUM(lon) / COUNT(*) AS mx,
                     SUM(lat) / COUNT(*) AS my,
                     SUM(lon * lon) / COUNT(*) AS rxx,
                     SUM(lat * lat) / COUNT(*) AS ryy,
                     SUM(lon * lat) / COUNT(*) AS rxy
                  FROM gt GROUP BY track_id),
            v AS (SELECT track_id, n,
                     rxx - mx * mx AS vx, ryy - my * my AS vy,
                     rxy - mx * my AS cv
                  FROM m)
            SELECT track_id, CAST(n AS BIGINT) AS n,
                   round(0.5e0 * atan2(2e0 * cv, vx - vy), 6)
                       AS theta,
                   round(sqrt(GREATEST(0.5e0 * (vx + vy)
                       + sqrt(pow(0.5e0 * (vx - vy), 2) + cv * cv),
                       0e0)), 6) AS major_deg,
                   round(sqrt(GREATEST(0.5e0 * (vx + vy)
                       - sqrt(pow(0.5e0 * (vx - vy), 2) + cv * cv),
                       0e0)), 6) AS minor_deg
            FROM v ORDER BY track_id
        """,
        "geo_track_dtw": f"""
            WITH RECURSIVE {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS tid, i // 50 AS si, lon, lat
                   FROM gll),
            gbb AS (SELECT tid, MIN(lon) AS minx, MAX(lon) AS maxx,
                           MIN(lat) AS miny, MAX(lat) AS maxy
                    FROM gt GROUP BY tid),
            gpair AS (SELECT a.tid AS ta, b.tid AS tb
                      FROM gbb a JOIN gbb b
                        ON a.tid < b.tid
                       AND a.minx <= b.maxx AND b.minx <= a.maxx
                       AND a.miny <= b.maxy AND b.miny <= a.maxy),
            gdm AS (SELECT p.ta, p.tb, x.si AS ai, y.si AS bi,
                      {_sql_haversine('x.lat', 'x.lon',
                                      'y.lat', 'y.lon')} AS d
                   FROM gpair p
                   JOIN gt x ON x.tid = p.ta
                   JOIN gt y ON y.tid = p.tb),
            gdg AS (SELECT ta, tb, ai + bi AS t,
                           list(d ORDER BY ai) AS dl
                    FROM gdm GROUP BY ta, tb, ai + bi),
            gwave AS (
              SELECT ta, tb, 0 AS t, dl AS cur,
                     CAST([] AS DOUBLE[]) AS prev
              FROM gdg WHERE t = 0
              UNION ALL
              SELECT w.ta, w.tb, w.t + 1,
                list_transform(g.dl, (dv, p) -> dv + LEAST(
                  COALESCE(w.cur[p + GREATEST(0, w.t - {_GEO_NPT - 2})
                             - GREATEST(0, w.t - {_GEO_NPT - 1}) - 1],
                           1e30),
                  COALESCE(w.cur[p + GREATEST(0, w.t - {_GEO_NPT - 2})
                             - GREATEST(0, w.t - {_GEO_NPT - 1})],
                           1e30),
                  COALESCE(w.prev[p + GREATEST(0, w.t - {_GEO_NPT - 2})
                             - GREATEST(0, w.t - {_GEO_NPT}) - 1],
                           1e30))),
                w.cur
              FROM gwave w JOIN gdg g ON g.ta = w.ta AND g.tb = w.tb
                            AND g.t = w.t + 1
            )
            SELECT ta AS track_a, tb AS track_b,
                   round(cur[1], 4) AS dtw_m
            FROM gwave WHERE t = {2 * _GEO_NPT - 2}
            ORDER BY track_a, track_b
        """,
        "geo_track_lcss": f"""
            WITH RECURSIVE {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS tid, i // 50 AS si, lon, lat
                   FROM gll),
            gbb AS (SELECT tid, MIN(lon) AS minx, MAX(lon) AS maxx,
                           MIN(lat) AS miny, MAX(lat) AS maxy
                    FROM gt GROUP BY tid),
            gpair AS (SELECT a.tid AS ta, b.tid AS tb
                      FROM gbb a JOIN gbb b
                        ON a.tid < b.tid
                       AND a.minx <= b.maxx AND b.minx <= a.maxx
                       AND a.miny <= b.maxy AND b.miny <= a.maxy),
            gdm AS (SELECT p.ta, p.tb, x.si AS ai, y.si AS bi,
                      CASE WHEN {_sql_haversine('x.lat', 'x.lon',
                                                'y.lat', 'y.lon')}
                           < 150000e0
                           THEN CAST(1 AS BIGINT)
                           ELSE CAST(0 AS BIGINT) END AS hv
                   FROM gpair p
                   JOIN gt x ON x.tid = p.ta
                   JOIN gt y ON y.tid = p.tb),
            gdg AS (SELECT ta, tb, ai + bi AS t,
                           list(hv ORDER BY ai) AS hl
                    FROM gdm GROUP BY ta, tb, ai + bi),
            gwave AS (
              SELECT ta, tb, 0 AS t, hl AS cur,
                     CAST([] AS BIGINT[]) AS prev
              FROM gdg WHERE t = 0
              UNION ALL
              SELECT w.ta, w.tb, w.t + 1,
                list_transform(g.hl, (hv, p) -> CASE WHEN hv = 1
                  THEN COALESCE(
                    w.prev[p + GREATEST(0, w.t - {_GEO_NPT - 2})
                             - GREATEST(0, w.t - {_GEO_NPT}) - 1],
                    CAST(0 AS BIGINT)) + 1
                  ELSE GREATEST(
                    COALESCE(
                      w.cur[p + GREATEST(0, w.t - {_GEO_NPT - 2})
                              - GREATEST(0, w.t - {_GEO_NPT - 1})
                              - 1],
                      CAST(0 AS BIGINT)),
                    COALESCE(
                      w.cur[p + GREATEST(0, w.t - {_GEO_NPT - 2})
                              - GREATEST(0, w.t - {_GEO_NPT - 1})],
                      CAST(0 AS BIGINT)))
                  END),
                w.cur
              FROM gwave w JOIN gdg g ON g.ta = w.ta AND g.tb = w.tb
                            AND g.t = w.t + 1
            )
            SELECT ta AS track_a, tb AS track_b,
                   CAST(cur[1] AS BIGINT) AS lcss,
                   round(CAST(cur[1] AS DOUBLE) / {_GEO_NPT}e0, 6)
                       AS sim
            FROM gwave WHERE t = {2 * _GEO_NPT - 2}
            ORDER BY track_a, track_b
        """,
        "geo_ripley_k": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gp AS (SELECT i AS node, lon, lat FROM gll),
            gd AS (SELECT {_sql_haversine('a.lat', 'a.lon',
                                          'b.lat', 'b.lon')} AS d
                   FROM gp a JOIN gp b ON b.node > a.node),
            grd AS (SELECT r_m FROM (VALUES (100000e0), (300000e0),
                                            (600000e0)) t(r_m))
            SELECT g.r_m,
                   COUNT(*) FILTER (WHERE d.d <= g.r_m) AS n_pairs,
                   round(2e0 * COUNT(*) FILTER (WHERE d.d <= g.r_m)
                         / ({_GEO_N}e0 * {_GEO_N - 1}e0), 6)
                       AS pair_frac
            FROM grd g CROSS JOIN gd d GROUP BY g.r_m
        """,
        "geo_semivariogram": f"""
            WITH {_sql_geo_hashes(_GEO_N, [1, 2, 3, 4, 10, 11, 12])},
            {_sql_gll_body()},
            {_sql_gdims_body()},
            gp AS (SELECT g.i AS node, g.lon, g.lat,
                      CAST(d.w AS BIGINT) * CAST(d.h AS BIGINT) AS z
                   FROM gll g JOIN gdim d USING (i)),
            pr AS (SELECT CAST(floor(
                      {_sql_haversine('a.lat', 'a.lon',
                                      'b.lat', 'b.lon')}
                      / 100000e0) AS BIGINT) AS bin,
                      (a.z - b.z) * (a.z - b.z) AS dz2
                   FROM gp a JOIN gp b ON b.node > a.node),
            ag AS (SELECT bin, COUNT(*) AS n_pairs,
                      CAST(SUM(dz2) AS DOUBLE) AS ss
                   FROM pr WHERE bin < 6 GROUP BY bin)
            SELECT bin, n_pairs,
                   round(ss / (2e0 * CAST(n_pairs AS DOUBLE)), 6)
                       AS gamma
            FROM ag ORDER BY bin
        """,
        "geo_knox_spacetime": f"""
            WITH {_sql_geo_hashes(_GEO_N, [1, 2, 3, 4, 13])},
            {_sql_gll_body()},
            gt AS (SELECT i, CAST(h13 % 4096 AS BIGINT) AS t
                   FROM ghash),
            gp AS (SELECT g.i AS node, g.lon, g.lat, t.t
                   FROM gll g JOIN gt t USING (i)),
            pr AS (SELECT {_sql_haversine('a.lat', 'a.lon',
                                          'b.lat', 'b.lon')} AS d,
                      abs(a.t - b.t) AS dt
                   FROM gp a JOIN gp b ON b.node > a.node),
            ag AS (SELECT COUNT(*) AS n_pairs,
                      COUNT(*) FILTER (WHERE d < 50000e0) AS n_space,
                      COUNT(*) FILTER (WHERE dt <= 64) AS n_time,
                      COUNT(*) FILTER (WHERE d < 50000e0
                                       AND dt <= 64) AS n_both
                   FROM pr)
            SELECT n_pairs, n_space, n_time, n_both,
                   round(CAST(n_space AS DOUBLE)
                         * CAST(n_time AS DOUBLE)
                         / CAST(n_pairs AS DOUBLE), 6) AS expected,
                   round(CAST(n_both AS DOUBLE)
                         / (CAST(n_space AS DOUBLE)
                            * CAST(n_time AS DOUBLE)
                            / CAST(n_pairs AS DOUBLE)), 6) AS ratio
            FROM ag
        """,
        "geo_mann_kendall_cells": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gcc AS (SELECT
                       CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                           AS gx,
                       CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                           AS gy,
                       (i * 24) // {_GEO_N} AS tb
                    FROM gll),
            gcnt AS (SELECT gx, gy, tb, COUNT(*) AS n FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY gx, gy, tb),
            gcel AS (SELECT DISTINCT gx, gy FROM gcnt),
            gdom AS (SELECT c.gx, c.gy, CAST(r.range AS BIGINT) AS tb
                     FROM gcel c CROSS JOIN range(24) r),
            gx AS (SELECT d.gx, d.gy, d.tb, COALESCE(n.n, 0) AS v
                   FROM gdom d LEFT JOIN gcnt n
                     ON n.gx = d.gx AND n.gy = d.gy AND n.tb = d.tb),
            gs AS (SELECT a.gx, a.gy,
                      SUM(CASE WHEN b.v > a.v THEN 1
                               WHEN b.v < a.v THEN -1
                               ELSE 0 END) AS s
                   FROM gx a JOIN gx b
                     ON a.gx = b.gx AND a.gy = b.gy AND b.tb > a.tb
                   GROUP BY a.gx, a.gy),
            gtie AS (SELECT gx, gy,
                        SUM(c * (c - 1) * (2 * c + 5)) AS tt
                     FROM (SELECT gx, gy, v, COUNT(*) AS c
                           FROM gx GROUP BY gx, gy, v)
                     GROUP BY gx, gy),
            gfix AS (SELECT gx, gy, SUM(n) AS n_fixes FROM gcnt
                     GROUP BY gx, gy),
            gz AS (SELECT s.gx, s.gy, f.n_fixes, s.s,
                      CAST({24 * 23 * 53} - t.tt AS DOUBLE) / 18e0
                          AS var
                   FROM gs s JOIN gtie t
                     ON s.gx = t.gx AND s.gy = t.gy
                   JOIN gfix f ON s.gx = f.gx AND s.gy = f.gy)
            SELECT gx, gy, CAST(n_fixes AS BIGINT) AS n_fixes,
                   CAST(s AS BIGINT) AS s,
                   round(CASE WHEN s > 0
                              THEN (s - 1) / sqrt(var)
                              WHEN s < 0
                              THEN (s + 1) / sqrt(var)
                              ELSE 0e0 END, 6) AS z
            FROM gz ORDER BY gx, gy
        """,
        "geo_theil_sen_cells": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gcc AS (SELECT
                       CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                           AS gx,
                       CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                           AS gy,
                       (i * 24) // {_GEO_N} AS tb
                    FROM gll),
            gcnt AS (SELECT gx, gy, tb, COUNT(*) AS n FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY gx, gy, tb),
            gcel AS (SELECT DISTINCT gx, gy FROM gcnt),
            gdom AS (SELECT c.gx, c.gy, CAST(r.range AS BIGINT) AS tb
                     FROM gcel c CROSS JOIN range(24) r),
            gx AS (SELECT d.gx, d.gy, d.tb, COALESCE(n.n, 0) AS v
                   FROM gdom d LEFT JOIN gcnt n
                     ON n.gx = d.gx AND n.gy = d.gy AND n.tb = d.tb),
            gsl AS (SELECT a.gx, a.gy,
                       CAST(b.v - a.v AS DOUBLE)
                       / CAST(b.tb - a.tb AS DOUBLE) AS slope
                    FROM gx a JOIN gx b
                      ON a.gx = b.gx AND a.gy = b.gy AND b.tb > a.tb),
            grk AS (SELECT gx, gy, slope,
                       ROW_NUMBER() OVER (PARTITION BY gx, gy
                                          ORDER BY slope) AS rn
                    FROM gsl),
            gmed AS (SELECT gx, gy, SUM(slope) / 2e0 AS med
                     FROM grk WHERE rn IN (138, 139)
                     GROUP BY gx, gy),
            gfix AS (SELECT gx, gy, SUM(n) AS n_fixes FROM gcnt
                     GROUP BY gx, gy)
            SELECT m.gx, m.gy, CAST(f.n_fixes AS BIGINT) AS n_fixes,
                   {_sql_round_even('m.med')} AS sen_slope
            FROM gmed m JOIN gfix f
              ON f.gx = m.gx AND f.gy = m.gy
            ORDER BY m.gx, m.gy
        """,
        "geo_quadrat_chi2": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gcc AS (SELECT
                       CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                           AS gx,
                       CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                           AS gy
                    FROM gll),
            gcnt AS (SELECT gx, gy, COUNT(*) AS n FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY gx, gy),
            st AS (SELECT COALESCE(SUM(n), 0) AS n,
                      COALESCE(SUM(n * n), 0) AS ssq,
                      COUNT(*) AS occ
                   FROM gcnt)
            SELECT CAST(n AS BIGINT) AS n_points,
                   CAST(288 AS BIGINT) AS n_quadrats,
                   CAST(occ AS BIGINT) AS n_occupied,
                   CAST(ssq AS BIGINT) AS sum_sq,
                   {_sql_round_even(
                       'CASE WHEN n > 0 THEN CAST(288 * ssq - n * n'
                       ' AS DOUBLE) / n ELSE 0e0 END')} AS chi2,
                   {_sql_round_even(
                       '(CASE WHEN n > 0 THEN CAST(288 * ssq - n * n'
                       ' AS DOUBLE) / n ELSE 0e0 END) / 287')} AS vmr
            FROM st
        """,
        "geo_segregation_d": f"""
            WITH {_sql_geo_full(_GEO_N)},
            gp AS (SELECT substr(c.caption_canon, 1, 2) AS cat,
                      g.lon, g.lat
                   FROM gll g JOIN gcanon c USING (i)),
            gcc AS (SELECT
                       CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                           AS gx,
                       CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                           AS gy,
                       cat
                    FROM gp),
            gcnt AS (SELECT gx * 12 + gy AS cell, cat, COUNT(*) AS n
                     FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY cell, cat),
            gm AS (SELECT cat, SUM(n) AS t FROM gcnt GROUP BY cat),
            gcell AS (SELECT DISTINCT cell FROM gcnt),
            gpair AS (SELECT a.cat AS ca, b.cat AS cb,
                         a.t AS ta, b.t AS tb
                      FROM gm a JOIN gm b ON a.cat < b.cat),
            gdiff AS (SELECT p.ca, p.cb, p.ta, p.tb,
                         SUM(ABS(COALESCE(na.n, 0) * p.tb
                                 - COALESCE(nb.n, 0) * p.ta)) AS num
                      FROM gpair p CROSS JOIN gcell c
                      LEFT JOIN gcnt na
                        ON na.cell = c.cell AND na.cat = p.ca
                      LEFT JOIN gcnt nb
                        ON nb.cell = c.cell AND nb.cat = p.cb
                      GROUP BY p.ca, p.cb, p.ta, p.tb)
            SELECT ca AS cat_a, cb AS cat_b,
                   CAST(ta AS BIGINT) AS n_a,
                   CAST(tb AS BIGINT) AS n_b,
                   {_sql_round_even(
                       'CASE WHEN ta > 0 AND tb > 0 THEN '
                       'CAST(num AS DOUBLE) / CAST(2 * ta * tb'
                       ' AS DOUBLE) ELSE 0e0 END')} AS d_index
            FROM gdiff ORDER BY cat_a, cat_b
        """,
        "geo_join_counts": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gcc AS (SELECT
                       CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                           AS gx,
                       CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                           AS gy
                    FROM gll),
            gcnt AS (SELECT gx, gy, COUNT(*) AS n FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY gx, gy),
            gmark AS (SELECT gx, gy,
                         CASE WHEN n >= 6 THEN 1 ELSE 0 END AS blk
                      FROM gcnt),
            gpair AS (SELECT a.blk AS b1, b.blk AS b2
                      FROM gmark a JOIN gmark b
                        ON (b.gx = a.gx + 1 AND b.gy = a.gy)
                        OR (b.gx = a.gx AND b.gy = a.gy + 1)),
            gj AS (SELECT COUNT(*) AS j_all,
                      COALESCE(SUM(b1 * b2), 0) AS j_bb,
                      COALESCE(SUM((1 - b1) * (1 - b2)), 0) AS j_ww
                   FROM gpair),
            gm AS (SELECT COUNT(*) AS n, SUM(blk) AS nb,
                      COUNT(*) - SUM(blk) AS nw
                   FROM gmark)
            SELECT CAST(gm.n AS BIGINT) AS n_cells,
                   CAST(gm.nb AS BIGINT) AS n_black,
                   CAST(gj.j_all AS BIGINT) AS n_joins,
                   CAST(gj.j_bb AS BIGINT) AS j_bb,
                   CAST(gj.j_ww AS BIGINT) AS j_ww,
                   CAST(gj.j_all - gj.j_bb - gj.j_ww AS BIGINT)
                       AS j_bw,
                   round((CAST(gj.j_all AS DOUBLE)
                          * CAST(gm.nb * (gm.nb - 1) AS DOUBLE))
                         / CAST(gm.n * (gm.n - 1) AS DOUBLE), 6)
                       AS e_bb,
                   round((CAST(gj.j_all AS DOUBLE)
                          * CAST(gm.nw * (gm.nw - 1) AS DOUBLE))
                         / CAST(gm.n * (gm.n - 1) AS DOUBLE), 6)
                       AS e_ww,
                   round((CAST(gj.j_all AS DOUBLE)
                          * CAST(2 * gm.nb * gm.nw AS DOUBLE))
                         / CAST(gm.n * (gm.n - 1) AS DOUBLE), 6)
                       AS e_bw
            FROM gj, gm
        """,
        "geo_density_gradient": f"""
            WITH {_sql_geo_hashes(_GEO_N, [1, 2, 3, 4])},
            {_sql_gll_body()},
            {_sql_geo_h3(5)},
            gc AS (SELECT c.h3_r5 AS cell, COUNT(*) AS n,
                       AVG(g.lon) AS clon, AVG(g.lat) AS clat
                   FROM gcell c JOIN gll g USING (i)
                   GROUP BY c.h3_r5),
            gmc AS (SELECT AVG(lon) AS mlon, AVG(lat) AS mlat
                    FROM gll),
            gdd AS (SELECT cell, n,
                       {_sql_haversine('(SELECT mlat FROM gmc)',
                                       '(SELECT mlon FROM gmc)',
                                       'clat', 'clon')} AS d
                    FROM gc),
            gsl AS (SELECT median((CAST(b.n AS DOUBLE) - a.n)
                                  / (b.d - a.d)) AS slope
                    FROM gdd a JOIN gdd b
                      ON a.cell < b.cell AND b.d != a.d)
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM gdd)
                       AS n_cells,
                   ROUND((SELECT slope FROM gsl), 10) AS slope,
                   ROUND(median(CAST(n AS DOUBLE)
                                - (SELECT slope FROM gsl) * d), 6)
                       AS intercept
            FROM gdd
        """,
        "geo_cross_k": f"""
            WITH {_sql_geo_full(_GEO_N)},
            gp AS (SELECT g.i AS node,
                      substr(c.caption_canon, 1, 2) AS cat,
                      g.lon, g.lat
                   FROM gll g JOIN gcanon c USING (i)),
            ga AS (SELECT * FROM gp WHERE cat = 'en'),
            gb AS (SELECT * FROM gp WHERE cat = 'it'),
            gd AS (SELECT {_sql_haversine('a.lat', 'a.lon',
                                          'b.lat', 'b.lon')} AS d
                   FROM ga a CROSS JOIN gb b),
            grd AS (SELECT r_m FROM (VALUES (100000e0), (300000e0),
                                            (600000e0)) t(r_m)),
            gn AS (SELECT (SELECT COUNT(*) FROM ga) AS n_a,
                          (SELECT COUNT(*) FROM gb) AS n_b)
            SELECT g.r_m,
                   CAST((SELECT n_a FROM gn) AS BIGINT) AS n_a,
                   CAST((SELECT n_b FROM gn) AS BIGINT) AS n_b,
                   COUNT(*) FILTER (WHERE d.d <= g.r_m) AS n_pairs,
                   round(COUNT(*) FILTER (WHERE d.d <= g.r_m)
                         / CAST(GREATEST(1, (SELECT n_a FROM gn)
                                * (SELECT n_b FROM gn)) AS DOUBLE), 6)
                       AS pair_frac
            FROM grd g CROSS JOIN gd d GROUP BY g.r_m
        """,
        "geo_colocation_quotient": f"""
            WITH {_sql_geo_full(_GEO_N)},
            gp AS (SELECT g.i AS node,
                      substr(c.caption_canon, 1, 2) AS cat,
                      g.lon, g.lat
                   FROM gll g JOIN gcanon c USING (i)),
            gd AS (SELECT a.node AS na, a.cat AS ca,
                      b.node AS nb2, b.cat AS cb,
                      {_sql_haversine('a.lat', 'a.lon',
                                      'b.lat', 'b.lon')} AS dm
                   FROM gp a JOIN gp b ON a.node <> b.node),
            gr AS (SELECT ca, cb,
                      ROW_NUMBER() OVER (PARTITION BY na
                                         ORDER BY dm, nb2) AS rn
                   FROM gd),
            gnn AS (SELECT ca, cb FROM gr WHERE rn = 1),
            gcnt AS (SELECT ca, cb, COUNT(*) AS c_ab FROM gnn
                     GROUP BY ca, cb),
            gm AS (SELECT cat, COUNT(*) AS n FROM gp GROUP BY cat),
            gtot AS (SELECT SUM(n) AS n FROM gm)
            SELECT a.cat AS cat_a, b.cat AS cat_b,
                   CAST(a.n AS BIGINT) AS n_a,
                   CAST(b.n AS BIGINT) AS n_b,
                   CAST(COALESCE(c.c_ab, 0) AS BIGINT) AS c_ab,
                   round(CASE WHEN (CASE WHEN a.cat = b.cat
                                    THEN b.n - 1 ELSE b.n END) > 0
                       THEN (CAST(COALESCE(c.c_ab, 0) AS DOUBLE)
                             / CAST(a.n AS DOUBLE))
                            / (CAST(CASE WHEN a.cat = b.cat
                                    THEN b.n - 1 ELSE b.n END
                                    AS DOUBLE)
                               / CAST((SELECT n FROM gtot) - 1
                                      AS DOUBLE))
                       ELSE 0e0 END, 6) AS clq
            FROM gm a CROSS JOIN gm b
            LEFT JOIN gcnt c ON c.ca = a.cat AND c.cb = b.cat
            ORDER BY cat_a, cat_b
        """,
        "geo_bearing_rose": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gs AS (SELECT track_id, seq, lon, lat,
                      LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat
                   FROM gt
                   WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            gb AS (SELECT track_id,
                      degrees(atan2(
                          sin(radians(lon - plon)) * cos(radians(lat)),
                          cos(radians(plat)) * sin(radians(lat))
                          - sin(radians(plat)) * cos(radians(lat))
                            * cos(radians(lon - plon)))) AS deg
                   FROM gs WHERE plon IS NOT NULL),
            gn AS (SELECT track_id,
                      CASE WHEN deg < 0 THEN deg + 360e0 ELSE deg END
                          AS nd
                   FROM gb)
            SELECT track_id,
                   LEAST(CAST(floor(nd / 45e0) AS BIGINT), 7)
                       AS sector,
                   COUNT(*) AS n_segs
            FROM gn GROUP BY track_id, sector
        """,
        "geo_track_self_x": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gsx AS (SELECT track_id, lon AS x0, lat AS y0,
                       LEAD(lon) OVER w AS x1, LEAD(lat) OVER w AS y1,
                       ROW_NUMBER() OVER w AS six
                    FROM gt
                    WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            gseg AS (SELECT track_id, six, x0, y0, x1, y1
                     FROM gsx WHERE x1 IS NOT NULL),
            gxp AS (SELECT a.track_id
                    FROM gseg a JOIN gseg b
                      ON b.track_id = a.track_id AND b.six > a.six + 1
                    WHERE ((a.x1 - a.x0) * (b.y0 - a.y0)
                           - (a.y1 - a.y0) * (b.x0 - a.x0))
                          * ((a.x1 - a.x0) * (b.y1 - a.y0)
                             - (a.y1 - a.y0) * (b.x1 - a.x0)) < 0
                      AND ((b.x1 - b.x0) * (a.y0 - b.y0)
                           - (b.y1 - b.y0) * (a.x0 - b.x0))
                          * ((b.x1 - b.x0) * (a.y1 - b.y0)
                             - (b.y1 - b.y0) * (a.x1 - b.x0)) < 0),
            gcnt AS (SELECT track_id, COUNT(*) AS n_segs FROM gseg
                     GROUP BY track_id),
            ghx AS (SELECT track_id, COUNT(*) AS nx FROM gxp
                    GROUP BY track_id)
            SELECT c.track_id, c.n_segs,
                   COALESCE(h.nx, 0) AS n_self_x
            FROM gcnt c LEFT JOIN ghx h USING (track_id)
        """,
        "geo_line_density": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gsx AS (SELECT track_id, lon AS x0, lat AS y0,
                       LEAD(lon) OVER w AS x1, LEAD(lat) OVER w AS y1
                    FROM gt
                    WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            gseg AS (SELECT x0, y0, x1, y1 FROM gsx
                     WHERE x1 IS NOT NULL),
            ggrid AS (SELECT CAST(x.range AS BIGINT) AS gx,
                             CAST(y.range AS BIGINT) AS gy,
                             -12e0 + x.range * 1e0 AS cx0,
                             35e0 + y.range * 1e0 AS cy0
                      FROM range(24) x CROSS JOIN range(12) y),
            gtt AS (SELECT g.gx, g.gy,
                       CASE WHEN s.x1 = s.x0 THEN
                            CASE WHEN s.x0 >= g.cx0
                                  AND s.x0 <= g.cx0 + 1e0
                                 THEN -1e308 ELSE 1e308 END
                       ELSE LEAST((g.cx0 - s.x0) / (s.x1 - s.x0),
                                  (g.cx0 + 1e0 - s.x0)
                                      / (s.x1 - s.x0)) END AS tx_in,
                       CASE WHEN s.x1 = s.x0 THEN
                            CASE WHEN s.x0 >= g.cx0
                                  AND s.x0 <= g.cx0 + 1e0
                                 THEN 1e308 ELSE -1e308 END
                       ELSE GREATEST((g.cx0 - s.x0) / (s.x1 - s.x0),
                                     (g.cx0 + 1e0 - s.x0)
                                         / (s.x1 - s.x0)) END
                           AS tx_out,
                       CASE WHEN s.y1 = s.y0 THEN
                            CASE WHEN s.y0 >= g.cy0
                                  AND s.y0 <= g.cy0 + 1e0
                                 THEN -1e308 ELSE 1e308 END
                       ELSE LEAST((g.cy0 - s.y0) / (s.y1 - s.y0),
                                  (g.cy0 + 1e0 - s.y0)
                                      / (s.y1 - s.y0)) END AS ty_in,
                       CASE WHEN s.y1 = s.y0 THEN
                            CASE WHEN s.y0 >= g.cy0
                                  AND s.y0 <= g.cy0 + 1e0
                                 THEN 1e308 ELSE -1e308 END
                       ELSE GREATEST((g.cy0 - s.y0) / (s.y1 - s.y0),
                                     (g.cy0 + 1e0 - s.y0)
                                         / (s.y1 - s.y0)) END
                           AS ty_out
                    FROM gseg s CROSS JOIN ggrid g)
            SELECT gx, gy, COUNT(*) AS n_segments
            FROM gtt
            WHERE GREATEST(tx_in, ty_in, 0e0)
                  <= LEAST(tx_out, ty_out, 1e0)
            GROUP BY gx, gy
        """,
        "geo_flow_field": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gsx AS (SELECT track_id, lon AS x0, lat AS y0,
                       LEAD(lon) OVER w AS x1, LEAD(lat) OVER w AS y1
                    FROM gt
                    WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            gseg AS (SELECT
                       CAST(floor((x0 - -12e0) / 1e0) AS BIGINT)
                           AS gx,
                       CAST(floor((y0 - 35e0) / 1e0) AS BIGINT)
                           AS gy,
                       x1 - x0 AS dx, y1 - y0 AS dy
                     FROM gsx WHERE x1 IS NOT NULL)
            SELECT gx, gy, COUNT(*) AS n_segments,
                   round(SUM(dx) / COUNT(*), 6) AS mean_dlon,
                   round(SUM(dy) / COUNT(*), 6) AS mean_dlat
            FROM gseg
            WHERE gx >= 0 AND gx < 24 AND gy >= 0 AND gy < 12
            GROUP BY gx, gy
        """,
        "geo_visit_entropy": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, lon, lat FROM gll),
            gcc AS (SELECT track_id,
                       CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                           AS gx,
                       CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                           AS gy
                    FROM gt),
            gcnt AS (SELECT gx, gy, track_id, COUNT(*) AS n
                     FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY gx, gy, track_id),
            gtot AS (SELECT gx, gy, SUM(n) AS tot FROM gcnt
                     GROUP BY gx, gy)
            SELECT c.gx, c.gy,
                   COUNT(*) AS n_tracks,
                   CAST(t.tot AS BIGINT) AS n_fixes,
                   round(-SUM((c.n / t.tot) * ln(c.n / t.tot)), 6)
                       AS entropy
            FROM gcnt c JOIN gtot t USING (gx, gy)
            GROUP BY c.gx, c.gy, t.tot
        """,
        "geo_polygon_convexity": f"""
            WITH gv0 AS (SELECT admin_id, vertex_ix, lon, lat
                         FROM read_parquet('{_GEO_AUX_VERTICES}')
                         WHERE ring_ix = 0),
            gcl AS (SELECT admin_id, lon AS x, lat AS y,
                       COALESCE(LEAD(lon) OVER w,
                                FIRST_VALUE(lon) OVER w) AS x1,
                       COALESCE(LEAD(lat) OVER w,
                                FIRST_VALUE(lat) OVER w) AS y1
                    FROM gv0
                    WINDOW w AS (PARTITION BY admin_id
                                 ORDER BY vertex_ix
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING)),
            garea AS (SELECT admin_id, COUNT(*) AS n_vertices,
                         abs(SUM(x * y1 - x1 * y)) / 2e0 AS poly_area
                      FROM gcl GROUP BY admin_id),
            gpair AS (SELECT p.admin_id,
                             p.vertex_ix AS ps, q.vertex_ix AS qs,
                             p.lon AS px, p.lat AS py,
                             q.lon AS qx, q.lat AS qy
                      FROM gv0 p JOIN gv0 q
                        ON p.admin_id = q.admin_id
                       AND p.vertex_ix <> q.vertex_ix),
            ghullp AS (SELECT e.admin_id, e.px, e.py, e.qx, e.qy
                       FROM gpair e JOIN gv0 r
                         ON r.admin_id = e.admin_id
                        AND r.vertex_ix <> e.ps
                        AND r.vertex_ix <> e.qs
                       GROUP BY e.admin_id, e.ps, e.qs,
                                e.px, e.py, e.qx, e.qy
                       HAVING MIN((e.qx - e.px) * (r.lat - e.py)
                                  - (e.qy - e.py) * (r.lon - e.px))
                              > 0e0),
            ghulla AS (SELECT admin_id,
                          abs(SUM(px * qy - qx * py)) / 2e0
                              AS hull_area
                       FROM ghullp GROUP BY admin_id)
            SELECT a.admin_id, a.n_vertices,
                   round(a.poly_area, 6) AS poly_area,
                   round(h.hull_area, 6) AS hull_area,
                   round(a.poly_area / h.hull_area, 6) AS convexity
            FROM garea a JOIN ghulla h USING (admin_id)
        """,
        "geo_coverage_fraction": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gocc AS (SELECT DISTINCT
                        CAST(floor((lon - -12e0) / 0.5e0) AS BIGINT)
                            AS gx,
                        CAST(floor((lat - 35e0) / 0.5e0) AS BIGINT)
                            AS gy
                     FROM gll
                     WHERE lon >= -12e0 AND lon < 12e0
                       AND lat >= 35e0 AND lat < 47e0),
            gpts AS (SELECT 'c' || CAST(x.range * 24 + y.range
                                        AS VARCHAR) AS image_id,
                        -12e0 + (x.range + 0.5e0) * 0.5e0 AS lon,
                        35e0 + (y.range + 0.5e0) * 0.5e0 AS lat,
                        CAST(x.range AS BIGINT) AS gx,
                        CAST(y.range AS BIGINT) AS gy
                     FROM range(48) x CROSS JOIN range(24) y),
            {_SQL_GEO_PIP},
            gcov AS (SELECT h.admin_id,
                        CAST(h.level AS BIGINT) AS level,
                        CASE WHEN o.gx IS NULL THEN 0 ELSE 1 END
                            AS cov
                     FROM ghits h
                     JOIN gpts p USING (image_id)
                     LEFT JOIN gocc o
                       ON o.gx = p.gx AND o.gy = p.gy)
            SELECT admin_id, level, COUNT(*) AS n_cells,
                   CAST(SUM(cov) AS BIGINT) AS n_covered,
                   round(CAST(SUM(cov) AS DOUBLE) / COUNT(*), 6)
                       AS coverage
            FROM gcov GROUP BY admin_id, level
        """,
        "balanced_sample_events": f"""
            SELECT event_type, event_id, user_id FROM (
                SELECT event_type, event_id, user_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY event_type
                           ORDER BY CAST({_sql_splitmix64("event_id")}
                                         AS UBIGINT), event_id)
                           AS rk
                FROM events) t
            WHERE rk <= 50
        """,
        "geo_st_pairs": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gp AS (SELECT i AS node, lon, lat FROM gll),
            gd AS (SELECT a.node AS node_a, b.node AS node_b,
                      {_sql_haversine('a.lat', 'a.lon',
                                      'b.lat', 'b.lon')} AS d
                   FROM gp a JOIN gp b
                     ON b.node > a.node
                    AND abs(b.node - a.node) <= 100)
            SELECT node_a, node_b, round(d, 4) AS dist_m
            FROM gd WHERE d <= 50000e0
        """,
        "geo_dead_reckoning": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gs AS (SELECT track_id, seq, lon, lat,
                      LAG(lon, 1) OVER w AS l1, LAG(lat, 1) OVER w
                          AS b1,
                      LAG(lon, 2) OVER w AS l2, LAG(lat, 2) OVER w
                          AS b2
                   FROM gt
                   WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            ge AS (SELECT track_id,
                      {_sql_haversine('2e0 * b1 - b2',
                                      '2e0 * l1 - l2',
                                      'lat', 'lon')} AS e
                   FROM gs WHERE l2 IS NOT NULL)
            SELECT track_id, COUNT(*) AS n_preds,
                   round(AVG(e), 4) AS mean_err_m,
                   round(MAX(e), 4) AS max_err_m
            FROM ge GROUP BY track_id
        """,
        "geo_spacetime_cube": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gcc AS (SELECT
                       CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                           AS gx,
                       CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                           AS gy,
                       i // 150 AS tb
                    FROM gll),
            gcnt AS (SELECT gx, gy, tb, COUNT(*) AS n FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY gx, gy, tb),
            gsel AS (SELECT gx, gy, tb, n,
                        ROW_NUMBER() OVER (PARTITION BY gx, gy
                                           ORDER BY n DESC, tb)
                            AS rk,
                        SUM(n) OVER (PARTITION BY gx, gy) AS tot,
                        COUNT(*) OVER (PARTITION BY gx, gy) AS nb
                     FROM gcnt)
            SELECT gx, gy, CAST(tot AS BIGINT) AS n_fixes,
                   CAST(nb AS BIGINT) AS n_buckets,
                   tb AS peak_bucket, n AS peak_n
            FROM gsel WHERE rk = 1
        """,
        "user_decayed_engagement": """
            WITH mx AS (SELECT MAX(epoch(ts)) AS cend FROM events)
            SELECT user_id, COUNT(*) AS n,
                   round(SUM(pow(2e0, -(mx.cend - epoch(ts))
                                      / (7e0 * 86400e0))), 6)
                       AS decayed_count
            FROM events CROSS JOIN mx
            GROUP BY user_id ORDER BY user_id
        """,
        "user_purchase_survival": """
            WITH u AS (SELECT user_id, MIN(epoch(ts)) AS f,
                              MAX(epoch(ts)) AS l,
                              MIN(CASE WHEN event_type = 'purchase'
                                  THEN epoch(ts) END) AS fp
                       FROM events GROUP BY user_id),
            d AS (SELECT CAST(FLOOR((COALESCE(fp, l) - f) / 3600e0)
                              AS BIGINT) AS hour,
                         CASE WHEN fp IS NOT NULL
                              THEN 1 ELSE 0 END AS ev
                  FROM u),
            g AS (SELECT hour, SUM(ev) AS d_i, COUNT(*) AS t_i
                  FROM d GROUP BY hour),
            o AS (SELECT hour, d_i, t_i,
                     (SELECT SUM(t_i) FROM g)
                     - COALESCE(SUM(t_i) OVER (ORDER BY hour
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS n_risk
                  FROM g),
            s AS (SELECT hour, n_risk, d_i,
                     exp(SUM(ln(GREATEST(
                         1e0 - d_i / CAST(n_risk AS DOUBLE),
                         1e-300)))
                         OVER (ORDER BY hour
                               ROWS UNBOUNDED PRECEDING)) AS surv
                  FROM o)
            SELECT hour, CAST(n_risk AS BIGINT) AS n_risk,
                   CAST(d_i AS BIGINT) AS n_events,
                   round(surv, 6) AS survival
            FROM s WHERE d_i > 0 ORDER BY hour
        """,
        "event_type_dow_mi": """
            WITH j AS (SELECT event_type AS a, isodow(ts) AS b,
                              CAST(COUNT(*) AS DOUBLE) AS n
                       FROM events GROUP BY a, b),
            t AS (SELECT SUM(n) AS tot FROM j),
            ma AS (SELECT a, SUM(n) AS na FROM j GROUP BY a),
            mb AS (SELECT b, SUM(n) AS nb FROM j GROUP BY b),
            mi AS (SELECT SUM(j.n / t.tot
                       * ln((j.n / t.tot)
                            / ((ma.na / t.tot) * (mb.nb / t.tot))))
                       AS v
                   FROM j CROSS JOIN t
                        JOIN ma ON ma.a = j.a JOIN mb ON mb.b = j.b),
            ha AS (SELECT -SUM(na / t.tot * ln(na / t.tot)) AS v
                   FROM ma CROSS JOIN t),
            hb AS (SELECT -SUM(nb / t.tot * ln(nb / t.tot)) AS v
                   FROM mb CROSS JOIN t)
            SELECT ROUND((SELECT v FROM mi), 6) AS mi_nats,
                   ROUND((SELECT v FROM ha), 6) AS h_a,
                   ROUND((SELECT v FROM hb), 6) AS h_b,
                   ROUND(CASE WHEN (SELECT v FROM ha)
                                   + (SELECT v FROM hb) > 0
                         THEN 2.0 * (SELECT v FROM mi)
                              / ((SELECT v FROM ha)
                                 + (SELECT v FROM hb))
                         ELSE 0.0 END, 6) AS nmi
        """,
        "event_value_winsorized_mean": """
            WITH r AS (SELECT event_type AS g, value AS v,
                    ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY value) AS rn,
                    COUNT(*) OVER (PARTITION BY event_type) AS n,
                    CAST(FLOOR(0.1 * COUNT(*) OVER (
                        PARTITION BY event_type)) AS BIGINT) AS k
                FROM events),
            w AS (SELECT g, n, k,
                    CASE WHEN rn <= k OR rn > n - k
                         THEN NULL ELSE v END AS mid,
                    CASE WHEN rn = k + 1 THEN v END AS lof,
                    CASE WHEN rn = n - k THEN v END AS hif
                  FROM r)
            SELECT g AS event_type, CAST(MAX(n) AS BIGINT) AS n,
                   CAST(2 * MAX(k) AS BIGINT) AS n_clamped,
                   ROUND((SUM(mid) + MAX(k) * MAX(lof)
                          + MAX(k) * MAX(hif)) / MAX(n), 6)
                       AS winsorized_mean
            FROM w GROUP BY g ORDER BY event_type
        """,
        "customer_lorenz_deciles": """
            WITH per AS (SELECT o_custkey AS k,
                                SUM(o_totalprice) AS v
                         FROM orders GROUP BY o_custkey),
            r AS (SELECT k, v,
                     ROW_NUMBER() OVER (ORDER BY v, k) AS rn,
                     COUNT(*) OVER () AS n,
                     SUM(v) OVER (ORDER BY v, k
                                  ROWS UNBOUNDED PRECEDING) AS cv,
                     SUM(v) OVER () AS tot
                  FROM per),
            d AS (SELECT unnest(range(1, 11)) AS decile)
            SELECT CAST(d.decile AS BIGINT) AS decile,
                   r.rn AS n_entities,
                   ROUND(r.cv / r.tot, 6) AS cum_share
            FROM d JOIN r
                ON r.rn = CAST(CEIL(r.n * d.decile / 10.0) AS BIGINT)
            ORDER BY decile
        """,
        "event_type_dow_chi2": """
            WITH c AS (SELECT event_type AS a, isodow(ts) AS b,
                              COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            t AS (SELECT SUM(n) AS tot FROM c),
            r AS (SELECT a, SUM(n) AS rn FROM c GROUP BY a),
            l AS (SELECT b, SUM(n) AS cn FROM c GROUP BY b),
            grid AS (SELECT r.a, l.b, r.rn, l.cn FROM r CROSS JOIN l),
            x AS (SELECT COALESCE(c.n, 0) AS n,
                         g.rn * g.cn / t.tot AS e
                  FROM grid g LEFT JOIN c ON c.a = g.a AND c.b = g.b
                  CROSS JOIN t),
            dims AS (SELECT (SELECT COUNT(*) FROM r) AS nr,
                            (SELECT COUNT(*) FROM l) AS nc)
            SELECT CAST(t.tot AS BIGINT) AS n,
                   round(SUM((x.n - x.e) * (x.n - x.e) / x.e), 4)
                       AS chi2,
                   CAST((d.nr - 1) * (d.nc - 1) AS BIGINT) AS df,
                   round(sqrt(SUM((x.n - x.e) * (x.n - x.e) / x.e)
                              / (t.tot * LEAST(d.nr - 1, d.nc - 1))),
                         6) AS cramers_v
            FROM x CROSS JOIN t CROSS JOIN dims d
            GROUP BY t.tot, d.nr, d.nc
        """,
        "orders_urgency_ks": """
            WITH c AS (SELECT o_totalprice AS v,
                    CASE WHEN o_orderpriority = '1-URGENT'
                         THEN 1 ELSE 0 END AS f
                FROM orders),
            g AS (SELECT v, SUM(f) AS n1, SUM(1 - f) AS n0
                  FROM c GROUP BY v),
            w AS (SELECT v,
                    SUM(n1) OVER (ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS c1,
                    SUM(n0) OVER (ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS c0
                  FROM g),
            t AS (SELECT SUM(n1) AS t1, SUM(n0) AS t0 FROM g)
            SELECT CAST(t.t1 AS BIGINT) AS n_true,
                   CAST(t.t0 AS BIGINT) AS n_false,
                   round(MAX(ABS(w.c1 / CAST(t.t1 AS DOUBLE)
                                 - w.c0 / CAST(t.t0 AS DOUBLE))), 6)
                       AS ks_d,
                   round(sqrt(t.t1 * t.t0
                              / CAST(t.t1 + t.t0 AS DOUBLE))
                         * MAX(ABS(w.c1 / CAST(t.t1 AS DOUBLE)
                                   - w.c0 / CAST(t.t0 AS DOUBLE))), 6)
                       AS ks_stat
            FROM w CROSS JOIN t GROUP BY t.t1, t.t0
        """,
        "orders_urgency_ranksum": """
            WITH c AS (SELECT o_totalprice AS v,
                    CASE WHEN o_orderpriority = '1-URGENT'
                         THEN 1 ELSE 0 END AS f
                FROM orders),
            r AS (SELECT v, f,
                    RANK() OVER (ORDER BY v)
                      + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0
                      AS mr
                  FROM c),
            s AS (SELECT SUM(mr) FILTER (WHERE f = 1) AS r1,
                         COUNT(*) FILTER (WHERE f = 1) AS n1,
                         COUNT(*) FILTER (WHERE f = 0) AS n0
                  FROM r),
            t AS (SELECT SUM(pow(cnt, 3) - cnt) AS ties
                  FROM (SELECT COUNT(*) AS cnt FROM c GROUP BY v)),
            u AS (SELECT n1, n0, n1 + n0 AS nn,
                         r1 - n1 * (n1 + 1) / 2.0 AS u1, ties
                  FROM s CROSS JOIN t)
            SELECT CAST(n1 AS BIGINT) AS n_true,
                   CAST(n0 AS BIGINT) AS n_false,
                   round(u1, 4) AS u_stat,
                   round((u1 - n1 * n0 / 2.0)
                         / sqrt((n1 * n0 / 12.0)
                                * ((CAST(nn AS DOUBLE) + 1.0)
                                   - ties / (CAST(nn AS DOUBLE)
                                             * (CAST(nn AS DOUBLE)
                                                - 1.0)))), 4)
                       AS z_stat
            FROM u
        """,
        "orders_priority_anova": """
            WITH m AS (SELECT o_orderpriority AS g, COUNT(*) AS n,
                              SUM(o_totalprice) AS s,
                              SUM(o_totalprice * o_totalprice) AS ss
                       FROM orders GROUP BY g),
            t AS (SELECT COUNT(*) AS k, SUM(n) AS nn,
                         SUM(s) / SUM(n) AS grand
                  FROM m),
            p AS (SELECT ANY_VALUE(t.k) AS k, ANY_VALUE(t.nn) AS nn,
                         SUM(m.n * pow(m.s / m.n - t.grand, 2))
                             AS ssb,
                         SUM(m.ss - m.n * pow(m.s / m.n, 2)) AS ssw
                  FROM m CROSS JOIN t)
            SELECT CAST(k AS BIGINT) AS k_groups,
                   CAST(nn AS BIGINT) AS n,
                   round((ssb / (k - 1e0)) / (ssw / (nn - k)), 4)
                       AS f_stat,
                   round(ssb / (ssb + ssw), 4) AS eta_sq
            FROM p
        """,
        "orders_priority_kruskal": """
            WITH c AS (SELECT o_totalprice AS v,
                              o_orderpriority AS g
                       FROM orders),
            r AS (SELECT v, g,
                    RANK() OVER (ORDER BY v)
                      + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0
                      AS mr
                  FROM c),
            gr AS (SELECT g, COUNT(*) AS n, SUM(mr) AS rank_sum
                   FROM r GROUP BY g),
            t AS (SELECT SUM(pow(cnt, 3) - cnt) AS ties,
                         SUM(cnt) AS nn
                  FROM (SELECT COUNT(*) AS cnt FROM c GROUP BY v)),
            h AS (SELECT 12e0 / (CAST(nn AS DOUBLE)
                                 * (CAST(nn AS DOUBLE) + 1e0))
                         * (SELECT SUM(rank_sum * rank_sum / n)
                            FROM gr)
                         - 3e0 * (CAST(nn AS DOUBLE) + 1e0)
                             AS h_stat,
                         1e0 - ties / (CAST(nn AS DOUBLE)
                                       * CAST(nn AS DOUBLE)
                                       * CAST(nn AS DOUBLE)
                                       - CAST(nn AS DOUBLE)) AS c
                  FROM t)
            SELECT gr.g AS o_orderpriority,
                   CAST(gr.n AS BIGINT) AS n,
                   gr.rank_sum AS rank_sum,
                   round(gr.rank_sum / gr.n, 4) AS mean_rank,
                   round(h.h_stat, 4) AS h_stat,
                   round(h.h_stat / h.c, 4) AS h_corrected
            FROM gr CROSS JOIN h
            ORDER BY o_orderpriority
        """,
        "user_value_durbin_watson": """
            WITH b AS (SELECT user_id, value, ts, event_id,
                              AVG(value) OVER (PARTITION BY user_id)
                                  AS mu
                       FROM events),
            c AS (SELECT user_id, value - mu AS e,
                         value - mu
                         - LAG(value - mu) OVER (
                               PARTITION BY user_id
                               ORDER BY ts, event_id) AS d
                  FROM b)
            SELECT user_id, COUNT(*) AS n,
                   round(COALESCE(SUM(d * d), 0) / SUM(e * e), 4)
                       AS dw
            FROM c GROUP BY user_id
            HAVING COUNT(*) >= 5 AND SUM(e * e) > 0
            ORDER BY user_id
        """,
        "nation_spend_hhi": """
            WITH cs AS (SELECT c.c_nationkey, o.o_custkey,
                           SUM(CAST(round(o.o_totalprice * 100)
                                    AS BIGINT)) AS s
                        FROM orders o
                        JOIN customer c
                          ON c.c_custkey = o.o_custkey
                        GROUP BY 1, 2),
            n AS (SELECT c_nationkey,
                     SUM(CAST(s AS DOUBLE)) AS tot,
                     SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                         AS s2,
                     COUNT(*) AS n_customers
                  FROM cs GROUP BY 1)
            SELECT c_nationkey,
                   CAST(n_customers AS BIGINT) AS n_customers,
                   round(s2 / (tot * tot), 6) AS hhi
            FROM n ORDER BY c_nationkey
        """,
        "price_pythagorean_means_by_flag": """
            SELECT l_returnflag, COUNT(*) AS n,
                   round(exp(SUM(ln(l_extendedprice)) / COUNT(*)),
                         4) AS geo_mean,
                   round(COUNT(*) / SUM(1e0 / l_extendedprice), 4)
                       AS harm_mean
            FROM lineitem GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "docs_lexical_richness": """
            WITH tok AS (SELECT unnest(list_filter(
                             string_split_regex(lower(text),
                                                '[^a-z]+'),
                             t -> t <> '')) AS token
                         FROM documents),
            c AS (SELECT token, COUNT(*) AS n FROM tok
                  GROUP BY token),
            s AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn,
                         CAST(COUNT(*) AS DOUBLE) AS v,
                         CAST(SUM(n * n) AS DOUBLE) AS s2
                  FROM c)
            SELECT CAST(nn AS BIGINT) AS n_tokens,
                   CAST(v AS BIGINT) AS n_types,
                   round(1e4 * (s2 - nn) / (nn * nn), 6) AS yule_k,
                   round(ln(v) / ln(nn), 6) AS herdan_c
            FROM s
        """,
        "click_purchase_hourly_ccf": """
            WITH hh AS (SELECT CAST(FLOOR(epoch(ts) / 3600)
                            AS BIGINT) AS hour, event_type
                        FROM events
                        WHERE event_type IN ('click', 'purchase')),
            sp AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM hh),
            spine AS (SELECT CAST(unnest(range(h0, h1 + 1))
                          AS BIGINT) AS hour
                      FROM sp),
            ac AS (SELECT hour, COUNT(*) AS n FROM hh
                   WHERE event_type = 'click' GROUP BY hour),
            bc AS (SELECT hour, COUNT(*) AS n FROM hh
                   WHERE event_type = 'purchase' GROUP BY hour),
            ser AS (SELECT s.hour,
                       CAST(COALESCE(a.n, 0) AS DOUBLE) AS a,
                       CAST(COALESCE(b.n, 0) AS DOUBLE) AS b
                    FROM spine s
                    LEFT JOIN ac a USING (hour)
                    LEFT JOIN bc b USING (hour)),
            m AS (SELECT SUM(a) / COUNT(*) AS ma,
                         SUM(b) / COUNT(*) AS mb FROM ser),
            dv AS (SELECT hour, a - (SELECT ma FROM m) AS ad,
                          b - (SELECT mb FROM m) AS bd
                   FROM ser),
            dn AS (SELECT sqrt((SELECT SUM(ad * ad) FROM dv)
                               * (SELECT SUM(bd * bd) FROM dv))
                       AS den),
            lg AS (SELECT CAST(l.range AS BIGINT) AS lag
                   FROM range(4) l),
            pr AS (SELECT g.lag, SUM(x.ad * y.bd) AS num
                   FROM lg g
                   JOIN dv x ON TRUE
                   JOIN dv y ON y.hour = x.hour + g.lag
                   GROUP BY g.lag)
            SELECT g.lag,
                   CASE WHEN (SELECT den FROM dn) > 0
                        THEN round(COALESCE(pr.num, 0)
                                   / (SELECT den FROM dn), 4)
                        ELSE 0e0 END AS ccf
            FROM lg g LEFT JOIN pr ON pr.lag = g.lag
            ORDER BY g.lag
        """,
        "user_value_acf": """
            WITH b AS (SELECT user_id, value, ts, event_id,
                              AVG(value) OVER (PARTITION BY user_id)
                                  AS mu
                       FROM events),
            c AS (SELECT user_id, value - mu AS e,
                         LAG(value - mu, 1) OVER (
                             PARTITION BY user_id
                             ORDER BY ts, event_id) AS e1,
                         LAG(value - mu, 2) OVER (
                             PARTITION BY user_id
                             ORDER BY ts, event_id) AS e2,
                         LAG(value - mu, 3) OVER (
                             PARTITION BY user_id
                             ORDER BY ts, event_id) AS e3
                  FROM b),
            g AS (SELECT user_id, COUNT(*) AS n, SUM(e * e) AS den,
                         COALESCE(SUM(e * e1), 0) AS n1,
                         COALESCE(SUM(e * e2), 0) AS n2,
                         COALESCE(SUM(e * e3), 0) AS n3
                  FROM c GROUP BY user_id
                  HAVING COUNT(*) >= 8 AND SUM(e * e) > 0)
            SELECT user_id, lag, n, round(num / den, 4) AS acf
            FROM (SELECT user_id, CAST(1 AS BIGINT) AS lag, n,
                         n1 AS num, den FROM g
                  UNION ALL
                  SELECT user_id, CAST(2 AS BIGINT), n, n2, den
                  FROM g
                  UNION ALL
                  SELECT user_id, CAST(3 AS BIGINT), n, n3, den
                  FROM g)
            ORDER BY user_id, lag
        """,
        "user_value_perm_entropy": """
            WITH c AS (SELECT user_id,
                              LAG(value, 2) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS av,
                              LAG(value, 1) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS bv,
                              value AS cv
                       FROM events),
            p AS (SELECT user_id,
                     4 * (CASE WHEN av <= bv THEN 1 ELSE 0 END)
                     + 2 * (CASE WHEN av <= cv THEN 1 ELSE 0 END)
                     + (CASE WHEN bv <= cv THEN 1 ELSE 0 END)
                         AS code
                  FROM c WHERE av IS NOT NULL),
            k AS (SELECT user_id, code, COUNT(*) AS kn
                  FROM p GROUP BY user_id, code),
            t AS (SELECT user_id, SUM(kn) AS tot
                  FROM k GROUP BY user_id)
            SELECT k.user_id, CAST(t.tot AS BIGINT) AS n_windows,
                   round(SUM(-(kn * 1e0 / tot)
                             * ln(kn * 1e0 / tot)) / ln(6e0), 4)
                       AS perm_entropy
            FROM k JOIN t ON k.user_id = t.user_id
            WHERE t.tot >= 8
            GROUP BY k.user_id, t.tot
            ORDER BY k.user_id
        """,
        "event_type_jsd_arms": f"""
            WITH ar AS (SELECT
                    CAST(({_sql_splitmix64('user_id')}) % 2
                         AS BIGINT) AS arm,
                    event_type
                FROM events),
            k AS (SELECT event_type,
                     SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ka,
                     SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS kb
                  FROM ar GROUP BY event_type),
            s AS (SELECT SUM(ka) AS na, SUM(kb) AS nb FROM k),
            pq AS (SELECT ka * 1e0 / (SELECT na FROM s) AS p,
                          kb * 1e0 / (SELECT nb FROM s) AS q
                   FROM k),
            h AS (SELECT
                     SUM(CASE WHEN p + q > 0
                         THEN -(0.5e0 * (p + q))
                              * ln(0.5e0 * (p + q)) ELSE 0 END)
                         AS hm,
                     SUM(CASE WHEN p > 0 THEN -p * ln(p) ELSE 0 END)
                         AS hp,
                     SUM(CASE WHEN q > 0 THEN -q * ln(q) ELSE 0 END)
                         AS hq
                  FROM pq)
            SELECT CAST((SELECT na FROM s) AS BIGINT) AS n_a,
                   CAST((SELECT nb FROM s) AS BIGINT) AS n_b,
                   round(hm - 0.5e0 * (hp + hq), 6) AS jsd_nats
            FROM h
        """,
        "orders_urgency_ttest": """
            WITH c AS (SELECT
                    CASE WHEN o_orderpriority = '1-URGENT'
                         THEN 1 ELSE 0 END AS grp,
                    o_totalprice AS v
                FROM orders),
            m AS (SELECT grp, COUNT(*) AS n, AVG(v) AS mu,
                         VAR_SAMP(v) AS s2
                  FROM c GROUP BY grp),
            w AS (SELECT
                    (SELECT n FROM m WHERE grp = 1) AS n1,
                    (SELECT n FROM m WHERE grp = 0) AS n0,
                    (SELECT mu FROM m WHERE grp = 1) AS m1,
                    (SELECT mu FROM m WHERE grp = 0) AS m0,
                    (SELECT s2 FROM m WHERE grp = 1) AS v1,
                    (SELECT s2 FROM m WHERE grp = 0) AS v0)
            SELECT CAST(n1 AS BIGINT) AS n_true,
                   CAST(n0 AS BIGINT) AS n_false,
                   round(m1, 4) AS mean_true,
                   round(m0, 4) AS mean_false,
                   round((m1 - m0) / sqrt(v1 / n1 + v0 / n0), 4)
                       AS t_stat,
                   round(pow(v1 / n1 + v0 / n0, 2)
                         / (pow(v1 / n1, 2) / (n1 - 1e0)
                            + pow(v0 / n0, 2) / (n0 - 1e0)), 4)
                       AS welch_df
            FROM w
        """,
        "geo_cell_lang_share": f"""
            WITH {_sql_geo_full(_GEO_N)},
            gcl AS (SELECT
                       CAST(floor((l.lon - -12e0) / 1e0) AS BIGINT)
                           AS gx,
                       CAST(floor((l.lat - 35e0) / 1e0) AS BIGINT)
                           AS gy,
                       substr(c.caption_canon, 1, 2) AS lang
                    FROM gll l JOIN gcanon c USING (i)),
            gcnt AS (SELECT gx, gy, lang, COUNT(*) AS n FROM gcl
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY gx, gy, lang),
            gsel AS (SELECT gx, gy, lang, n,
                        SUM(n) OVER (PARTITION BY gx, gy) AS tot,
                        ROW_NUMBER() OVER (PARTITION BY gx, gy
                                           ORDER BY n DESC, lang)
                            AS rk
                     FROM gcnt)
            SELECT gx, gy, CAST(tot AS BIGINT) AS n_images,
                   lang AS top_lang,
                   round(CAST(n AS DOUBLE) / tot, 6) AS share
            FROM gsel WHERE rk = 1
        """,
        "geo_admin_lang_share": f"""
            WITH {_sql_geo_full(_GEO_N)},
            gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gll),
            {_SQL_GEO_PIP},
            gal AS (SELECT h.admin_id,
                       substr(c.caption_canon, 1, 2) AS lang
                    FROM ghits h
                    JOIN gcanon c ON c.image_id = h.image_id),
            gcnt AS (SELECT admin_id, lang, COUNT(*) AS n FROM gal
                     GROUP BY admin_id, lang),
            gsel AS (SELECT admin_id, lang, n,
                        SUM(n) OVER (PARTITION BY admin_id) AS tot,
                        ROW_NUMBER() OVER (PARTITION BY admin_id
                                           ORDER BY n DESC, lang)
                            AS rk
                     FROM gcnt)
            SELECT admin_id, CAST(tot AS BIGINT) AS n_images,
                   lang AS top_lang,
                   round(CAST(n AS DOUBLE) / tot, 6) AS share
            FROM gsel WHERE rk = 1
        """,
        "geo_track_home_cell": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gcc AS (SELECT i % 50 AS track_id,
                       CAST(floor((lon - -12e0) / 1e0) AS BIGINT)
                           AS gx,
                       CAST(floor((lat - 35e0) / 1e0) AS BIGINT)
                           AS gy
                    FROM gll),
            gcnt AS (SELECT track_id, gx, gy, COUNT(*) AS n
                     FROM gcc
                     WHERE gx >= 0 AND gx < 24
                       AND gy >= 0 AND gy < 12
                     GROUP BY track_id, gx, gy),
            gsel AS (SELECT track_id, gx, gy, n,
                        SUM(n) OVER (PARTITION BY track_id) AS tot,
                        ROW_NUMBER() OVER (PARTITION BY track_id
                                           ORDER BY n DESC, gx, gy)
                            AS rk
                     FROM gcnt)
            SELECT track_id, CAST(tot AS BIGINT) AS n_fixes,
                   gx AS home_gx, gy AS home_gy,
                   round(CAST(n AS DOUBLE) / tot, 6) AS home_share
            FROM gsel WHERE rk = 1
        """,
        "geo_nn_g_function": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gp AS (SELECT i, lon, lat FROM gll),
            gd AS (SELECT a.i,
                      MIN({_sql_haversine('a.lat', 'a.lon',
                                          'b.lat', 'b.lon')}) AS d
                   FROM gp a JOIN gp b ON b.i <> a.i
                   GROUP BY a.i),
            grd AS (SELECT r_m FROM (VALUES (10000e0), (25000e0),
                                            (50000e0)) t(r_m))
            SELECT g.r_m,
                   COUNT(*) FILTER (WHERE d.d <= g.r_m) AS n_within,
                   round(COUNT(*) FILTER (WHERE d.d <= g.r_m)
                         / {_GEO_N}e0, 6) AS g_frac
            FROM grd g CROSS JOIN gd d GROUP BY g.r_m ORDER BY g.r_m
        """,
        "geo_clark_evans": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gp AS (SELECT i, lon, lat FROM gll),
            gd AS (SELECT a.i,
                      MIN({_sql_haversine('a.lat', 'a.lon',
                                          'b.lat', 'b.lon')}) AS d
                   FROM gp a JOIN gp b ON b.i <> a.i
                   GROUP BY a.i)
            SELECT CAST({_GEO_N} AS BIGINT) AS n_points,
                   round(AVG(d), 4) AS mean_nn_m,
                   round(AVG(d) / (0.5e0 * sqrt(
                       (24e0 * (2e0 * pi() * 6371008.8e0 / 360e0)
                        * cos(radians(41e0)))
                       * (12e0 * (2e0 * pi() * 6371008.8e0 / 360e0))
                       / {_GEO_N}e0)), 6) AS clark_evans
            FROM gd
        """,
        "geo_centrography": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            m AS (SELECT COUNT(*) AS n, AVG(lon) AS mx,
                     AVG(lat) AS my,
                     AVG(lon * lon) - AVG(lon) * AVG(lon) AS vx,
                     AVG(lat * lat) - AVG(lat) * AVG(lat) AS vy,
                     AVG(lon * lat) - AVG(lon) * AVG(lat) AS cv
                  FROM gll)
            SELECT CAST(n AS BIGINT) AS n_points,
                   round(mx, 6) AS mean_lon,
                   round(my, 6) AS mean_lat,
                   round(sqrt(vx + vy), 6) AS std_dist_deg,
                   round(0.5e0 * atan2(2e0 * cv, vx - vy), 6)
                       AS ellipse_theta
            FROM m
        """,
        "geo_turning_stats": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gs AS (SELECT track_id, seq, lon, lat,
                      LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat
                   FROM gt
                   WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            gb AS (SELECT track_id, seq,
                      {_sql_bearing('plat', 'plon', 'lat', 'lon')}
                          AS th
                   FROM gs WHERE plon IS NOT NULL),
            gd AS (SELECT track_id,
                      th - LAG(th) OVER (PARTITION BY track_id
                                         ORDER BY seq) AS dd
                   FROM gb),
            gw AS (SELECT track_id,
                      CASE WHEN dd > pi() THEN dd - 2e0 * pi()
                           WHEN dd < -pi() THEN dd + 2e0 * pi()
                           ELSE dd END AS w
                   FROM gd WHERE dd IS NOT NULL)
            SELECT track_id, COUNT(*) AS n_turns,
                   round(SUM(abs(w)), 6) AS total_turn,
                   round(AVG(abs(w)), 6) AS mean_abs_turn
            FROM gw GROUP BY track_id
        """,
        "geo_cross_track": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            ge AS (SELECT track_id,
                      arg_min(lon, seq) AS slon,
                      arg_min(lat, seq) AS slat,
                      arg_max(lon, seq) AS elon,
                      arg_max(lat, seq) AS elat
                   FROM gt GROUP BY track_id),
            gx AS (SELECT t.track_id,
                      abs(asin(LEAST(GREATEST(
                          sin({_sql_haversine('e.slat', 'e.slon',
                                              't.lat', 't.lon')}
                              / 6371008.8e0)
                          * sin({_sql_bearing('e.slat', 'e.slon',
                                              't.lat', 't.lon')}
                                - {_sql_bearing('e.slat', 'e.slon',
                                                'e.elat', 'e.elon')}),
                          -1e0), 1e0)) * 6371008.8e0) AS xtd
                   FROM gt t JOIN ge e USING (track_id))
            SELECT track_id, COUNT(*) AS n_fixes,
                   round(MAX(xtd), 4) AS max_xtd_m,
                   round(AVG(xtd), 4) AS mean_xtd_m
            FROM gx GROUP BY track_id
        """,
        "geo_resample_tracks": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gs AS (SELECT track_id, seq, lon, lat,
                      LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat
                   FROM gt
                   WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            gseg AS (SELECT track_id, seq, plon, plat, lon, lat,
                        {_sql_haversine('plat', 'plon',
                                        'lat', 'lon')} AS d,
                        COALESCE(SUM({_sql_haversine('plat', 'plon',
                                                     'lat', 'lon')})
                            OVER (PARTITION BY track_id ORDER BY seq
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0e0) AS c0
                     FROM gs WHERE plon IS NOT NULL)
            SELECT s.track_id, CAST(r.range AS BIGINT) AS k,
                   round(s.plon + ((r.range * 2000000e0 - s.c0) / s.d)
                         * (s.lon - s.plon), 4) AS lon,
                   round(s.plat + ((r.range * 2000000e0 - s.c0) / s.d)
                         * (s.lat - s.plat), 4) AS lat
            FROM gseg s JOIN range(256) r
              ON r.range * 2000000e0 >= s.c0
             AND r.range * 2000000e0 < s.c0 + s.d
        """,
        "geo_track_medoids": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gsum AS (SELECT p.track_id, p.seq,
                        SUM({_sql_haversine('p.lat', 'p.lon',
                                            'q.lat', 'q.lon')}) AS s
                     FROM gt p JOIN gt q
                       ON p.track_id = q.track_id
                     GROUP BY p.track_id, p.seq),
            grk AS (SELECT track_id, seq, s,
                       ROW_NUMBER() OVER (PARTITION BY track_id
                                          ORDER BY s, seq) AS rn
                    FROM gsum)
            SELECT track_id, seq AS medoid_seq,
                   round(s / 1000e0, 4) AS sum_km
            FROM grk WHERE rn = 1
        """,
        "geo_phash_spread": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gpx AS (SELECT f.image_id, f.phash, g.lon, g.lat
                    FROM read_parquet('{_GEO_FIXTURE_SQL}') f
                    JOIN gll g
                      ON g.i = CAST(substr(f.image_id, 4) AS BIGINT)),
            gcnt AS (SELECT phash, COUNT(*) AS n FROM gpx
                     GROUP BY phash HAVING COUNT(*) >= 2),
            gpair AS (SELECT a.phash,
                         {_sql_haversine('a.lat', 'a.lon',
                                         'b.lat', 'b.lon')} AS d
                      FROM gpx a JOIN gpx b
                        ON a.phash = b.phash
                       AND a.image_id < b.image_id)
            SELECT c.phash, c.n,
                   round(MAX(p.d) / 1000e0, 4) AS max_km
            FROM gcnt c JOIN gpair p ON p.phash = c.phash
            GROUP BY c.phash, c.n
        """,
        "geo_trip_od_matrix": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gs AS (SELECT track_id, seq, lon, lat,
                      LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat
                   FROM gt
                   WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            gf AS (SELECT track_id, seq,
                      CASE WHEN plon IS NULL
                                OR {_sql_haversine('plat', 'plon',
                                                   'lat', 'lon')}
                                   > 800000e0
                           THEN 1 ELSE 0 END AS newtrip
                   FROM gs),
            gtr AS (SELECT track_id, seq,
                       SUM(newtrip) OVER (PARTITION BY track_id
                                          ORDER BY seq
                                          ROWS BETWEEN UNBOUNDED
                                          PRECEDING AND CURRENT ROW)
                           AS trip_id
                    FROM gf),
            gends AS (SELECT track_id, trip_id,
                             MIN(seq) AS s0, MAX(seq) AS s1
                      FROM gtr GROUP BY track_id, trip_id),
            {_sql_geo_h3(4)}
            SELECT c0.h3_r4 AS o_cell, c1.h3_r4 AS d_cell,
                   COUNT(*) AS n_trips
            FROM gends e
            JOIN gcell c0 ON c0.i = e.s0
            JOIN gcell c1 ON c1.i = e.s1
            GROUP BY o_cell, d_cell
        """,
        "geo_gravity_fit": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gs AS (SELECT track_id, seq, lon, lat,
                      LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat
                   FROM gt
                   WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            gf AS (SELECT track_id, seq,
                      CASE WHEN plon IS NULL
                                OR {_sql_haversine('plat', 'plon',
                                                   'lat', 'lon')}
                                   > 800000e0
                           THEN 1 ELSE 0 END AS newtrip
                   FROM gs),
            gtr AS (SELECT track_id, seq,
                       SUM(newtrip) OVER (PARTITION BY track_id
                                          ORDER BY seq
                                          ROWS BETWEEN UNBOUNDED
                                          PRECEDING AND CURRENT ROW)
                           AS trip_id
                    FROM gf),
            gends AS (SELECT track_id, trip_id,
                             MIN(seq) AS s0, MAX(seq) AS s1
                      FROM gtr GROUP BY track_id, trip_id),
            {_sql_geo_h3(4)},
            od AS (SELECT c0.h3_r4 AS o_cell, c1.h3_r4 AS d_cell,
                          COUNT(*) AS n_trips
                   FROM gends e
                   JOIN gcell c0 ON c0.i = e.s0
                   JOIN gcell c1 ON c1.i = e.s1
                   GROUP BY o_cell, d_cell),
            dec AS (SELECT n_trips,
                       CAST(o_cell // 268435456 % 268435456
                            AS BIGINT) - 134217728 AS oq,
                       CAST(o_cell % 268435456 AS BIGINT)
                           - 134217728 AS orr,
                       CAST(d_cell // 268435456 % 268435456
                            AS BIGINT) - 134217728 AS dq,
                       CAST(d_cell % 268435456 AS BIGINT)
                           - 134217728 AS dr
                    FROM od WHERE o_cell <> d_cell),
            pt AS (SELECT n_trips,
                      sqrt(3e0) * (oq + orr / 2e0) AS olon,
                      1.5e0 * orr AS olat,
                      sqrt(3e0) * (dq + dr / 2e0) AS dlon,
                      1.5e0 * dr AS dlat
                   FROM dec),
            xy AS (SELECT
                      LN({_sql_haversine('olat', 'olon',
                                         'dlat', 'dlon')}) AS x,
                      LN(CAST(n_trips AS DOUBLE)) AS y
                   FROM pt),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
                     SUM(x * y) AS sxy, SUM(y * y) AS syy
                  FROM xy)
            SELECT n AS n_pairs,
               ROUND(CASE WHEN sxx - sx * sx / n > 0e0
                     THEN (sxy - sx * sy / n) / (sxx - sx * sx / n)
                     ELSE 0e0 END, 6) AS slope,
               ROUND(sy / n
                     - CASE WHEN sxx - sx * sx / n > 0e0
                       THEN (sxy - sx * sy / n)
                            / (sxx - sx * sx / n)
                       ELSE 0e0 END * sx / n, 6) AS intercept,
               ROUND(CASE WHEN sxx - sx * sx / n > 0e0
                          AND syy - sy * sy / n > 0e0
                     THEN (sxy - sx * sy / n) * (sxy - sx * sy / n)
                          / ((sxx - sx * sx / n)
                             * (syy - sy * sy / n))
                     ELSE 0e0 END, 6) AS r2
            FROM m
        """,
        "geo_trip_segments": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gs AS (SELECT track_id, seq, lon, lat,
                      LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat
                   FROM gt
                   WINDOW w AS (PARTITION BY track_id ORDER BY seq)),
            -- NB: DuckDB's GREATEST/LEAST IGNORE NULLs, so a
            -- haversine over a NULL LAG collapses to 0 instead of
            -- NULL — gate on the LAG itself, never on d IS NULL
            gf AS (SELECT track_id, seq,
                      CASE WHEN plon IS NULL THEN NULL ELSE
                          {_sql_haversine('plat', 'plon',
                                          'lat', 'lon')} END AS d,
                      CASE WHEN plon IS NULL
                                OR {_sql_haversine('plat', 'plon',
                                                   'lat', 'lon')}
                                   > 800000e0
                           THEN 1 ELSE 0 END AS newtrip
                   FROM gs),
            gtr AS (SELECT track_id, seq, d, newtrip,
                       SUM(newtrip) OVER (PARTITION BY track_id
                                          ORDER BY seq
                                          ROWS BETWEEN UNBOUNDED
                                          PRECEDING AND CURRENT ROW)
                       - 1 AS trip_ix
                    FROM gf)
            SELECT track_id, CAST(trip_ix AS BIGINT) AS trip_ix,
                   COUNT(*) AS n_points,
                   round(COALESCE(SUM(CASE WHEN newtrip = 0
                                           THEN d END), 0e0), 4)
                       AS trip_m
            FROM gtr GROUP BY track_id, trip_ix
        """,
        "geo_cell_best_image": f"""
            WITH {_sql_geo_hashes(_GEO_N, [1, 2, 3, 4, 10, 11, 12])},
            {_sql_gll_body()},
            {_sql_geo_h3(5)},
            {_sql_gdims_body()},
            gbest AS (SELECT c.h3_r5,
                         'img' || lpad(CAST(c.i AS VARCHAR), 9, '0')
                             AS image_id,
                         CAST(d.w AS BIGINT) * d.h AS mpx_px,
                         ROW_NUMBER() OVER (
                             PARTITION BY c.h3_r5
                             ORDER BY CAST(d.w AS BIGINT) * d.h DESC,
                                      c.i) AS rn
                      FROM gcell c JOIN gdim d USING (i))
            SELECT h3_r5, image_id, mpx_px FROM gbest WHERE rn = 1
        """,
        "geo_track_hulls": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gt AS (SELECT i % 50 AS track_id, i AS seq, lon, lat
                   FROM gll),
            gpair AS (SELECT p.track_id, p.seq AS ps, q.seq AS qs,
                             p.lon AS px, p.lat AS py,
                             q.lon AS qx, q.lat AS qy
                      FROM gt p JOIN gt q
                        ON p.track_id = q.track_id AND p.seq <> q.seq),
            ghull AS (SELECT e.track_id, e.px, e.py, e.qx, e.qy
                      FROM gpair e JOIN gt r
                        ON r.track_id = e.track_id
                       AND r.seq <> e.ps AND r.seq <> e.qs
                      GROUP BY e.track_id, e.ps, e.qs,
                               e.px, e.py, e.qx, e.qy
                      HAVING MIN((e.qx - e.px) * (r.lat - e.py)
                                 - (e.qy - e.py) * (r.lon - e.px))
                             > 0e0)
            SELECT track_id, COUNT(*) AS n_hull,
                   round(SUM(px * qy - qx * py) / 2e0, 6) AS hull_area
            FROM ghull GROUP BY track_id
        """,
        "geo_bbox_candidates": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            ga AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                       AS image_id,
                       lon - 0.01e0 AS aminx, lon + 0.01e0 AS amaxx,
                       lat - 0.01e0 AS aminy, lat + 0.01e0 AS amaxy
                   FROM gll),
            gb AS (SELECT admin_id,
                       MIN(lon) AS bminx, MAX(lon) AS bmaxx,
                       MIN(lat) AS bminy, MAX(lat) AS bmaxy
                   FROM read_parquet('{_GEO_AUX_VERTICES}')
                   WHERE ring_ix = 0 GROUP BY admin_id)
            SELECT image_id, admin_id
            FROM ga JOIN gb
              ON aminx <= bmaxx AND bminx <= amaxx
             AND aminy <= bmaxy AND bminy <= amaxy
        """,
        "geo_dbscan_clusters": f"""
            WITH RECURSIVE {_sql_geo_lonlat(_GEO_N)},
            gp AS (SELECT i AS node, lon, lat FROM gll),
            gd AS (SELECT a.node AS src, b.node AS dst
                   FROM gp a JOIN gp b ON a.node <> b.node
                   WHERE {_sql_haversine('a.lat', 'a.lon',
                                         'b.lat', 'b.lon')} <= 2000e0),
            gcore AS (SELECT src AS node FROM gd
                      GROUP BY src HAVING COUNT(*) + 1 >= 5),
            gcc AS (SELECT d.src, d.dst FROM gd d
                    JOIN gcore c1 ON d.src = c1.node
                    JOIN gcore c2 ON d.dst = c2.node),
            cc(node, lbl) AS (
                SELECT node, node FROM gcore
                UNION
                SELECT e.dst, c.lbl FROM cc c
                JOIN gcc e ON e.src = c.node),
            glab AS (SELECT node, MIN(lbl) AS cluster
                     FROM cc GROUP BY node),
            gbord AS (SELECT d.src AS node, MIN(l.cluster) AS cluster
                      FROM gd d JOIN glab l ON d.dst = l.node
                      WHERE d.src NOT IN (SELECT node FROM gcore)
                      GROUP BY d.src)
            SELECT p.node,
                   COALESCE(c.cluster, b.cluster, -1) AS cluster,
                   CASE WHEN c.node IS NULL THEN 0 ELSE 1 END AS is_core
            FROM gp p
            LEFT JOIN glab c ON c.node = p.node
            LEFT JOIN gbord b ON b.node = p.node
        """,
        "geo_kde_heatmap": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            ggrid AS (SELECT CAST(x.range AS BIGINT) AS gx,
                             CAST(y.range AS BIGINT) AS gy,
                             -12e0 + (CAST(x.range AS DOUBLE) + 0.5e0)
                                 * 1e0 AS lonc,
                             35e0 + (CAST(y.range AS DOUBLE) + 0.5e0)
                                 * 1e0 AS latc
                      FROM range(24) x CROSS JOIN range(12) y)
            SELECT gx, gy,
                   round(SUM(exp(-(
                       pow((lonc - lon) * cos(radians(latc)), 2)
                       + pow(latc - lat, 2))
                       * {1.0 / (2.0 * 1.5 * 1.5)!r}e0)), 4) AS density
            FROM ggrid CROSS JOIN gll
            GROUP BY gx, gy
        """,
        "geo_snap_to_boundary": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gll),
            gvx AS (SELECT admin_id, ring_ix, vertex_ix,
                    lon AS x, lat AS y,
                    COALESCE(LEAD(lon) OVER w,
                             FIRST_VALUE(lon) OVER w) AS x1,
                    COALESCE(LEAD(lat) OVER w,
                             FIRST_VALUE(lat) OVER w) AS y1
                FROM read_parquet('{_GEO_AUX_VERTICES}')
                WINDOW w AS (PARTITION BY admin_id, ring_ix
                             ORDER BY vertex_ix
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)),
            gc1 AS (SELECT p.image_id, e.admin_id, e.ring_ix,
                       e.vertex_ix, e.x, e.y, e.x1, e.y1,
                       (e.x - p.lon) * cos(radians(p.lat)) AS rax,
                       e.y - p.lat AS ray_,
                       (e.x1 - e.x) * cos(radians(p.lat)) AS vx,
                       e.y1 - e.y AS vy
                    FROM gpts p CROSS JOIN gvx e),
            gc2 AS (SELECT image_id, admin_id, ring_ix, vertex_ix,
                       x, y, x1, y1, rax, ray_, vx, vy,
                       LEAST(GREATEST(COALESCE(
                           -(rax * vx + ray_ * vy)
                           / (vx * vx + vy * vy), 0e0), 0e0), 1e0) AS t
                    FROM gc1),
            gc3 AS (SELECT image_id, admin_id, ring_ix, vertex_ix,
                       x + t * (x1 - x) AS sx, y + t * (y1 - y) AS sy,
                       sqrt((rax + t * vx) * (rax + t * vx)
                            + (ray_ + t * vy) * (ray_ + t * vy))
                       * (6371008.8e0 * pi() / 180e0) AS d
                    FROM gc2),
            gr AS (SELECT image_id, admin_id, ring_ix, vertex_ix,
                      sx, sy, d,
                      ROW_NUMBER() OVER (PARTITION BY image_id
                                         ORDER BY d, admin_id,
                                                  ring_ix, vertex_ix)
                          AS rn
                   FROM gc3)
            SELECT image_id, admin_id AS seg_admin, ring_ix, vertex_ix,
                   round(sx, 6) AS snap_lon, round(sy, 6) AS snap_lat,
                   round(d, 4) AS dist_m
            FROM gr WHERE rn = 1 ORDER BY image_id
        """,
        "geo_dist_to_boundary": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gll),
            gvx AS (SELECT admin_id, lon AS x, lat AS y,
                    COALESCE(LEAD(lon) OVER w,
                             FIRST_VALUE(lon) OVER w) AS x1,
                    COALESCE(LEAD(lat) OVER w,
                             FIRST_VALUE(lat) OVER w) AS y1
                FROM read_parquet('{_GEO_AUX_VERTICES}')
                WINDOW w AS (PARTITION BY admin_id, ring_ix
                             ORDER BY vertex_ix
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)),
            gc1 AS (SELECT p.image_id, e.admin_id,
                       (e.x - p.lon) * cos(radians(p.lat)) AS rax,
                       e.y - p.lat AS ray_,
                       (e.x1 - e.x) * cos(radians(p.lat)) AS vx,
                       e.y1 - e.y AS vy
                    FROM gpts p CROSS JOIN gvx e),
            gc2 AS (SELECT image_id, admin_id, rax, ray_, vx, vy,
                       LEAST(GREATEST(COALESCE(
                           -(rax * vx + ray_ * vy)
                           / (vx * vx + vy * vy), 0e0), 0e0), 1e0) AS t
                    FROM gc1),
            gc3 AS (SELECT image_id, admin_id,
                       sqrt((rax + t * vx) * (rax + t * vx)
                            + (ray_ + t * vy) * (ray_ + t * vy))
                       * (6371008.8e0 * pi() / 180e0) AS d
                    FROM gc2),
            gr AS (SELECT image_id, admin_id, d,
                      ROW_NUMBER() OVER (PARTITION BY image_id
                                         ORDER BY d, admin_id) AS rn
                   FROM gc3)
            SELECT image_id, admin_id AS boundary_admin,
                   round(d, 4) AS dist_m
            FROM gr WHERE rn = 1
        """,
        "geo_ring_perimeters": f"""
            WITH v AS (SELECT admin_id, level, ring_ix, vertex_ix,
                              lon, lat
                       FROM read_parquet('{_GEO_AUX_VERTICES}')),
            e AS (SELECT admin_id, level, lon, lat,
                     COALESCE(LEAD(lon) OVER w,
                              FIRST_VALUE(lon) OVER w) AS x1,
                     COALESCE(LEAD(lat) OVER w,
                              FIRST_VALUE(lat) OVER w) AS y1
                  FROM v WINDOW w AS (PARTITION BY admin_id, ring_ix
                      ORDER BY vertex_ix
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING))
            SELECT admin_id, level,
                   round(SUM({_sql_haversine('lat', 'lon', 'y1', 'x1')}),
                         4) AS perimeter_m
            FROM e GROUP BY admin_id, level
        """,
        "geo_voronoi_assign": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gimg AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gll),
            qs AS (SELECT admin_id AS site_id,
                          AVG(lon) AS slon, AVG(lat) AS slat
                   FROM read_parquet('{_GEO_AUX_VERTICES}')
                   WHERE ring_ix = 0 GROUP BY admin_id),
            gd AS (SELECT g.image_id, q.site_id,
                      {_sql_haversine('q.slat', 'q.slon',
                                      'g.lat', 'g.lon')} AS d,
                      ROW_NUMBER() OVER (PARTITION BY g.image_id
                          ORDER BY {_sql_haversine('q.slat', 'q.slon',
                                                   'g.lat', 'g.lon')},
                                   q.site_id) AS rn
                   FROM gimg g CROSS JOIN qs q)
            SELECT site_id, COUNT(*) AS n_points,
                   round(AVG(d), 4) AS mean_dist_m
            FROM gd WHERE rn = 1 GROUP BY site_id
        """,
        "geo_reverse_geocode": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gll),
            {_SQL_GEO_PIP},
            gdeep AS (SELECT image_id, admin_id, level,
                         ROW_NUMBER() OVER (PARTITION BY image_id
                                            ORDER BY level DESC,
                                                     admin_id) AS rn
                      FROM ghits),
            gsel AS (SELECT image_id, admin_id, level
                     FROM gdeep WHERE rn = 1),
            meta AS (SELECT admin_id, parent_id, name
                     FROM read_parquet('{_GEO_AUX_POLYMETA}'))
            SELECT s.image_id, s.admin_id, s.level,
                   CASE WHEN m2.name IS NOT NULL
                        THEN m2.name || ' > ' ELSE '' END
                 || CASE WHEN m1.name IS NOT NULL
                         THEN m1.name || ' > ' ELSE '' END
                 || m0.name AS path
            FROM gsel s
            JOIN meta m0 ON m0.admin_id = s.admin_id
            LEFT JOIN meta m1 ON m1.admin_id = m0.parent_id
                             AND m0.parent_id <> ''
            LEFT JOIN meta m2 ON m2.admin_id = m1.parent_id
                             AND m1.parent_id <> ''
        """,
        "geo_zonal_image_stats": f"""
            WITH {_sql_geo_hashes(_GEO_N, [1, 2, 3, 4, 10, 11, 12])},
            {_sql_gll_body()},
            {_sql_gdims_body()},
            gpts AS (SELECT i,
                        'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                            AS image_id,
                        lon, lat FROM gll),
            {_SQL_GEO_PIP},
            gstat AS (SELECT h.admin_id, h.level,
                             d.w * d.h / 1e6 AS mpx
                      FROM ghits h
                      JOIN gpts p USING (image_id)
                      JOIN gdim d ON d.i = p.i)
            SELECT admin_id, level, COUNT(*) AS n_images,
                   round(SUM(mpx), 4) AS sum_mpx
            FROM gstat GROUP BY admin_id, level
        """,
        "geo_cell_ring_density": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            {_sql_geo_h3(5)},
            gcnt AS (SELECT CAST(h3_r5 AS BIGINT) AS cell, COUNT(*) AS n
                     FROM gcell GROUP BY 1),
            goff AS (SELECT * FROM (VALUES (268435456), (268435455),
                                           (-1), (-268435456),
                                           (-268435455), (1)) AS t(d)),
            gex AS (
                SELECT cell, n AS own_n, 0 AS ring_n FROM gcnt
                UNION ALL
                SELECT cell + d, 0, n FROM gcnt CROSS JOIN goff
            ),
            gagg AS (SELECT cell, SUM(own_n) AS n, SUM(ring_n) AS r1
                     FROM gex GROUP BY cell)
            SELECT cell AS h3_r5, CAST(n AS BIGINT) AS n,
                   CAST(r1 AS BIGINT) AS ring1_n,
                   CAST(n + r1 AS BIGINT) AS disk_n
            FROM gagg WHERE n > 0
        """,
        "run_history_series": """
            WITH s AS (SELECT COUNT(*) AS n_rows,
                              round(SUM(o_totalprice), 2)
                                  AS sum_o_totalprice
                       FROM orders)
            SELECT run_ts, n_rows, sum_o_totalprice
            FROM (VALUES ('2026-08-15'), ('2026-08-16'), ('2026-08-17'))
                 AS t(run_ts)
            CROSS JOIN s ORDER BY run_ts
        """,
        "geo_suggestions": f"""
            WITH {_sql_geo_full(_GEO_N)},
            gimgs AS (SELECT c.image_id, g.lon, g.lat
                      FROM gll g JOIN gcanon c USING (i)),
            gunt AS (SELECT article_id, lon, lat
                     FROM read_parquet('{_GEO_AUX_ARTICLES}')
                     WHERE title_canon NOT IN
                           (SELECT caption_canon FROM gcanon)),
            gd AS (SELECT u.article_id, i.image_id,
                round(2e0 * 6371008.8e0 * asin(sqrt(LEAST(GREATEST(
                    pow(sin((radians(i.lat) - radians(u.lat)) / 2e0), 2)
                    + cos(radians(u.lat)) * cos(radians(i.lat))
                      * pow(sin((radians(i.lon) - radians(u.lon)) / 2e0),
                            2), 0e0), 1e0))), 6) AS dist_m
              FROM gunt u CROSS JOIN gimgs i),
            gr AS (SELECT article_id, image_id, dist_m,
                ROW_NUMBER() OVER (PARTITION BY article_id
                                   ORDER BY dist_m, image_id) AS rank
              FROM gd)
            SELECT article_id, image_id, dist_m, rank
            FROM gr WHERE rank <= 3
            ORDER BY article_id, rank
        """,
        "geo_tile_pyramid": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            t8 AS (SELECT
                CAST(LEAST(floor((lon + 180.0) / 360.0 * 256.0),
                           255) AS INT) AS x8,
                CAST(LEAST(floor((1.0 - ln(tan(radians(lat))
                        + sqrt(tan(radians(lat)) * tan(radians(lat))
                               + 1.0)) / pi()) / 2.0 * 256.0),
                           255) AS INT) AS y8
                FROM gll),
            p AS (SELECT 7 AS z, x8 // 2 AS x, y8 // 2 AS y FROM t8
                  UNION ALL
                  SELECT 6 AS z, x8 // 4 AS x, y8 // 4 AS y FROM t8)
            SELECT CAST(z AS BIGINT) AS z, CAST(x AS BIGINT) AS x,
                   CAST(y AS BIGINT) AS y, COUNT(*) AS n_images
            FROM p GROUP BY z, x, y ORDER BY z, x, y
        """,
        "geo_tile_compaction": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            t9 AS (SELECT DISTINCT
                CAST(LEAST(floor((lon + 180.0) / 360.0 * 512.0),
                           511) AS BIGINT) AS x,
                CAST(LEAST(floor((1.0 - ln(tan(radians(lat))
                        + sqrt(tan(radians(lat)) * tan(radians(lat))
                               + 1.0)) / pi()) / 2.0 * 512.0),
                           511) AS BIGINT) AS y
                FROM gll),
            f8 AS (SELECT x // 2 AS x, y // 2 AS y FROM t9
                   GROUP BY 1, 2 HAVING COUNT(*) = 4),
            f7 AS (SELECT x // 2 AS x, y // 2 AS y FROM f8
                   GROUP BY 1, 2 HAVING COUNT(*) = 4),
            f6 AS (SELECT x // 2 AS x, y // 2 AS y FROM f7
                   GROUP BY 1, 2 HAVING COUNT(*) = 4),
            outp AS (
                SELECT 9 AS z, a.x, a.y FROM t9 a
                LEFT JOIN f8 p ON p.x = a.x // 2 AND p.y = a.y // 2
                WHERE p.x IS NULL
                UNION ALL
                SELECT 8, a.x, a.y FROM f8 a
                LEFT JOIN f7 p ON p.x = a.x // 2 AND p.y = a.y // 2
                WHERE p.x IS NULL
                UNION ALL
                SELECT 7, a.x, a.y FROM f7 a
                LEFT JOIN f6 p ON p.x = a.x // 2 AND p.y = a.y // 2
                WHERE p.x IS NULL
                UNION ALL SELECT 6, x, y FROM f6)
            SELECT CAST(z AS BIGINT) AS z, x, y FROM outp
            ORDER BY z, x, y
        """,
        "geo_knn": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gll),
            gc AS (SELECT admin_id,
                    CAST(substr(admin_id, 6) AS INT) AS ord,
                    AVG(lon) AS clon, AVG(lat) AS clat
                FROM read_parquet('{_GEO_AUX_VERTICES}')
                WHERE ring_ix = 0 GROUP BY admin_id),
            gd AS (SELECT p.image_id, c.admin_id AS neighbor_id, c.ord,
                    {_sql_haversine('p.lat', 'p.lon', 'c.clat', 'c.clon')}
                        AS dm
                FROM gpts p CROSS JOIN gc c),
            gr AS (SELECT image_id, neighbor_id, dm,
                    ROW_NUMBER() OVER (PARTITION BY image_id
                                       ORDER BY dm, ord) AS rn
                FROM gd)
            SELECT image_id, neighbor_id, CAST(rn - 1 AS INT) AS rank,
                   round(dm, 6) AS dist_m
            FROM gr WHERE rn <= 5
        """,
        "geo_self_knn": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gp AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0') AS id,
                          lon, lat FROM gll),
            gd AS (SELECT a.id AS image_id, b.id AS neighbor_id,
                    {_sql_haversine('a.lat', 'a.lon', 'b.lat', 'b.lon')}
                        AS dm
                FROM gp a JOIN gp b ON a.id <> b.id),
            gr AS (SELECT image_id, neighbor_id, dm,
                    ROW_NUMBER() OVER (PARTITION BY image_id
                                       ORDER BY dm, neighbor_id) AS rn
                FROM gd)
            SELECT image_id, neighbor_id, CAST(rn - 1 AS INT) AS rank,
                   round(dm, 6) AS dist_m
            FROM gr WHERE rn <= 3
        """,
        "geo_pip_join": _SQL_GEO_PIP_JOIN.replace("__BASE__", _sql_geo_lonlat(_GEO_N)),
        # MERGE-side twin of the incremental loop: the changefile rules
        # (DELETE i%97==3, MOVE i%89==5 by +0.35/-0.20, INSERT 500 past
        # the corpus) apply to the regenerated point stream in SQL, then
        # the same ray-cast PIP join runs over the merged set
        "geo_pip_join_incremental": f"""
            WITH {_sql_geo_lonlat(_GEO_N + 500)},
            gmer AS (
                SELECT i,
                    CASE WHEN i < {_GEO_N} AND (i % 89) = 5
                              AND (i % 97) != 3
                         THEN lon + 0.35 ELSE lon END AS lon,
                    CASE WHEN i < {_GEO_N} AND (i % 89) = 5
                              AND (i % 97) != 3
                         THEN lat - 0.20 ELSE lat END AS lat
                FROM gll
                WHERE NOT (i < {_GEO_N} AND (i % 97) = 3)),
            gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gmer),
            {_SQL_GEO_PIP}
            SELECT image_id, admin_id, level,
                   (ROW_NUMBER() OVER (PARTITION BY image_id, level
                                       ORDER BY admin_id) = 1) AS is_primary
            FROM ghits ORDER BY image_id, admin_id
        """,
        "geo_pip_join_from_osm_xml":
            _SQL_GEO_PIP_JOIN.replace("__BASE__", _sql_geo_lonlat(_GEO_N)),
        "geo_admin_rollup": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            gpts AS (SELECT 'img' || lpad(CAST(i AS VARCHAR), 9, '0')
                         AS image_id, lon, lat FROM gll),
            {_SQL_GEO_PIP},
            gown AS (SELECT admin_id, COUNT(*) AS own_count
                     FROM ghits GROUP BY admin_id),
            gbase AS (SELECT m.admin_id, CAST(m.level AS BIGINT) AS level,
                    m.parent_id,
                    CAST(COALESCE(o.own_count, 0) AS BIGINT) AS own_count
                FROM read_parquet('{_GEO_AUX_POLYMETA}') m
                LEFT JOIN gown o USING (admin_id)),
            gs3 AS (SELECT admin_id, parent_id, own_count AS subtree
                    FROM gbase WHERE level = 3),
            gs2 AS (SELECT b.admin_id, b.parent_id,
                    b.own_count + COALESCE((SELECT SUM(s.subtree) FROM gs3 s
                        WHERE s.parent_id = b.admin_id), 0) AS subtree
                FROM gbase b WHERE b.level = 2),
            gs1 AS (SELECT b.admin_id,
                    b.own_count
                    + COALESCE((SELECT SUM(s.subtree) FROM gs2 s
                        WHERE s.parent_id = b.admin_id), 0)
                    + COALESCE((SELECT SUM(s.subtree) FROM gs3 s
                        WHERE s.parent_id = b.admin_id), 0) AS subtree
                FROM gbase b WHERE b.level = 1),
            gsubs AS (SELECT admin_id, subtree FROM gs1
                      UNION ALL SELECT admin_id, subtree FROM gs2
                      UNION ALL SELECT admin_id, subtree FROM gs3)
            SELECT b.admin_id, b.level, b.own_count,
                   CAST(s.subtree AS BIGINT) AS subtree_count
            FROM gbase b JOIN gsubs s USING (admin_id)
            ORDER BY b.admin_id
        """,
        "geo_area_tag_stats": f"""
            WITH {_sql_geo_full(_GEO_N)},
            gpts AS (SELECT c.image_id, g.lon, g.lat
                     FROM gll g JOIN gcanon c USING (i)),
            {_SQL_GEO_PIP},
            gflag AS (SELECT h.admin_id,
                    CASE WHEN c.caption_canon IN
                         (SELECT title_canon
                          FROM read_parquet('{_GEO_AUX_ARTICLES}'))
                         THEN 1 ELSE 0 END AS m
                FROM ghits h JOIN gcanon c USING (image_id))
            SELECT admin_id, COUNT(*) AS n_images,
                   CAST(SUM(m) AS BIGINT) AS n_tagged,
                   round(100e0 * SUM(m) / GREATEST(COUNT(*), 1), 4)
                       AS pct_tagged
            FROM gflag GROUP BY admin_id ORDER BY admin_id
        """,
        "geo_radius_join": f"""
            WITH {_sql_geo_lonlat(_GEO_N)},
            {_SQL_GEO_CENTROIDS},
            d AS (SELECT
                'img' || lpad(CAST(g.i AS VARCHAR), 9, '0') AS point_id,
                c.admin_id AS poi_id,
                2e0 * 6371008.8e0 * asin(sqrt(LEAST(GREATEST(
                    pow(sin((radians(c.centroid_lat) - radians(g.lat))
                            / 2e0), 2)
                    + cos(radians(g.lat)) * cos(radians(c.centroid_lat))
                      * pow(sin((radians(c.centroid_lon) - radians(g.lon))
                                / 2e0), 2), 0e0), 1e0))) AS dm
              FROM gll g CROSS JOIN gcent c)
            SELECT point_id, poi_id, round(dm, 3) AS dist_m
            FROM d WHERE dm <= 30000e0
        """,
    }
