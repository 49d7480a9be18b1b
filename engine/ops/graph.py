"""Distributed graph ops beyond connected components (SURVEY §2.10).

PageRank (Page et al. 1999, public algorithm) — the standard iterative
benchmark for a data engine's repeated-join path, and practically the
importance score a corpus-curation pipeline assigns to documents in a
link/similarity graph before sampling.

Shape per iteration: contributions = edges ⋈ ranks on src, summed per
dst. Here the rank table is broadcast once PER ITERATION (``ray.put``,
not per batch) and every edge batch collapses to per-dst partial sums
(combiner) before one tiny ``sum_final`` — so the EDGE set, the big
side, streams and never shuffles. At rank tables too large to
broadcast, swap the probe for a ``bucketed_join`` on src and keep the
same per-dst combiner; the iteration count doesn't change.

Dangling mass (nodes without out-edges) is redistributed uniformly, so
ranks sum to 1 every iteration (the convergence witness the test
asserts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def pagerank(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
) -> pd.DataFrame:
    """Edges (one row per DISTINCT directed edge) -> (node, rank).

    Deterministic: fixed iteration count, no RNG; float sums are
    per-batch-combined then merged in sorted-key order.
    """
    from engine.ops import relational

    # degree table + node universe: one pass over edges
    def ends(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([b[src].to_numpy(), b[dst].to_numpy()]),
            "__out": np.concatenate([
                np.ones(len(b), dtype=np.int64),
                np.zeros(len(b), dtype=np.int64),
            ]),
        })

    # consumed once per iteration + degree pass: pin blocks once, and
    # coalesce to a few fat blocks — per-iteration cost is dominated by
    # task dispatch when the edge set arrives as many small blocks
    edges = edges.repartition(16).materialize()
    deg = relational.sum_final(
        edges.map_batches(
            lambda b: ends(b).groupby("node", as_index=False).sum(),
            batch_format="pandas",
        ),
        ["node"],
    ).to_pandas()
    nodes = deg["node"].to_numpy()
    out_deg = deg["__out"].to_numpy().astype(np.float64)
    n = len(nodes)
    rank = np.full(n, 1.0 / n)
    node_pos = pd.Series(np.arange(n), index=nodes)

    # re-key edges to dense node POSITIONS once (broadcast the id->pos
    # map, one pass), so every iteration's gather/scatter is a pure
    # np.bincount — the round-1 loop re-did a pandas hash merge on the
    # raw int64 keys plus a sum_final shuffle EVERY iteration, ~2s of
    # dispatch+join overhead per round at sf0.1 vs ~0.2s for this form.
    # Broadcast assumption (same as the contrib map before): the rank
    # vector (n doubles) fits one worker's heap.
    pos_ref = ray.put(node_pos)

    def to_pos(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        p = cached_get(pos_ref)
        return pd.DataFrame({
            "s": p[b[src].to_numpy()].to_numpy().astype(np.int64),
            "d": p[b[dst].to_numpy()].to_numpy().astype(np.int64),
        })

    pos_ds = edges.map_batches(
        to_pos, batch_format="pandas"
    ).repartition(8).materialize()

    for _ in range(iters):
        # contribution of each node along each out-edge
        contrib = np.where(out_deg > 0, rank / np.maximum(out_deg, 1.0), 0.0)
        dangling = rank[out_deg == 0].sum()
        c_ref = ray.put(contrib)

        def push(b: pd.DataFrame) -> pd.DataFrame:
            from engine.state import cached_get

            c = cached_get(c_ref)
            v = np.bincount(b["d"].to_numpy(),
                            weights=c[b["s"].to_numpy()], minlength=n)
            nz = np.flatnonzero(v)
            return pd.DataFrame({"node_pos": nz, "__sum": v[nz]})

        parts = pos_ds.map_batches(push, batch_format="pandas").to_pandas()
        # deterministic partial-merge order (float sums)
        parts = parts.sort_values(["node_pos", "__sum"], kind="stable")
        incoming = np.zeros(n)
        np.add.at(incoming, parts["node_pos"].to_numpy(),
                  parts["__sum"].to_numpy())
        rank = (1 - damping) / n + damping * (incoming + dangling / n)

    return pd.DataFrame({"node": nodes, "rank": rank}).sort_values(
        "node", ignore_index=True
    )


def triangle_count(
    edges: ray.data.Dataset,
    num_shards: int = 64,
) -> pd.DataFrame:
    """Distributed triangle counting over an undirected edge list
    (rows ``a < b``, distinct) — the clustering-coefficient /
    community-density primitive. Classic two-round node-iterator:

    1. wedges: shard edges by their LOW endpoint; per vertex a with
       sorted neighbors n1 < n2 < ..., emit each neighbor pair (b, c)
       — every triangle {a<b<c} yields exactly one wedge at a.
    2. closure: co-shuffle wedges against the edge set on the
       composite (b, c) key (co-shard membership count); matches
       ARE the triangles.

    Wedge fan-out is deg(a)^2/2 — the documented skew hazard; for
    power-law graphs split hot vertices' neighbor lists (standard
    degree-splitting) before the pair expansion. Returns one row
    (n_edges, n_wedges, n_triangles)."""
    from engine.ops.relational import _sharded_by_key, sum_final

    edges = edges.materialize()  # feeds wedge build AND closure probe

    import pyarrow as pa

    def shard_wedges(g: pd.DataFrame) -> "pa.Table":
        # returns ARROW so empty shards keep their schema (Ray skips
        # UDFs on empty pandas blocks, which lose column names and
        # would poison the native join downstream)
        ks = []
        for a, sub in g.groupby("a", sort=False):
            nb = np.sort(sub["b"].to_numpy(np.int64))
            k = len(nb)
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, k=1)
            ks.append(nb[ii] * 2_147_483_647 + nb[jj])
        flat = (np.concatenate(ks) if ks
                else np.empty(0, np.int64))
        return pa.table({"k": pa.array(flat, pa.int64()),
                         "side": pa.array(
                             np.ones(len(flat), np.int64),
                             pa.int64())})

    sharded = _sharded_by_key(edges, "a", num_shards)
    wk = sharded.groupby("__shard").map_groups(
        lambda g: shard_wedges(g.drop(columns="__shard")),
        batch_format="pandas",
    )

    def edge_key(t: "pa.Table") -> "pa.Table":
        k = (np.asarray(t["a"], np.int64) * 2_147_483_647
             + np.asarray(t["b"], np.int64))
        return pa.table({"k": pa.array(k, pa.int64()),
                         "side": pa.array(
                             np.zeros(len(k), np.int64), pa.int64())})

    ek = edges.map_batches(edge_key, batch_format="pyarrow")

    # closure: co-shard wedges with the edge set on the composite key
    # and count membership per shard — the same _sharded_by_key
    # discipline as every co-group op here (the native Dataset.join
    # chokes on the schema-less EMPTY pandas blocks a groupby shuffle
    # can emit, so the join stays in our own machinery)
    both = ek.union(wk)
    csh = _sharded_by_key(both, "k", num_shards)

    def shard_close(g: pd.DataFrame) -> pd.DataFrame:
        ed = g.loc[g["side"] == 0, "k"].to_numpy(np.int64)
        wd = g.loc[g["side"] == 1, "k"].to_numpy(np.int64)
        return pd.DataFrame({
            "part": np.zeros(1, np.int64),
            "n_wedges": np.asarray([len(wd)], np.int64),
            "n_edges": np.asarray([len(ed)], np.int64),
            "n_triangles": np.asarray(
                [int(np.isin(wd, ed).sum())], np.int64),
        })

    tot = sum_final(
        csh.groupby("__shard").map_groups(
            lambda g: shard_close(g.drop(columns="__shard")),
            batch_format="pandas"),
        ["part"],
    ).to_pandas()
    return tot[["n_edges", "n_wedges", "n_triangles"]]


def degree_assortativity(
    edges: ray.data.Dataset,
) -> pd.DataFrame:
    """Degree assortativity coefficient: the Pearson correlation of
    endpoint degrees over all (symmetrized) edges — positive means
    hubs link to hubs (social nets), negative means hub-to-leaf
    (tech/biological nets). Degrees come from one count combiner and
    broadcast once; each edge batch folds into 4 scalar moment
    partials (n, sx, sxx, sxy), so nothing but scalars move.
    Symmetrized orientation makes x/y moments identical."""
    from engine.ops.relational import sum_final
    from engine.state import cached_get

    edges = edges.materialize()  # feeds the degree census AND probe

    def local_deg(t: "pa.Table") -> pd.DataFrame:
        both = np.concatenate([np.asarray(t["a"], np.int64),
                               np.asarray(t["b"], np.int64)])
        u, c = np.unique(both, return_counts=True)
        return pd.DataFrame({"node": u, "deg": c.astype(np.int64)})

    deg = sum_final(
        edges.map_batches(local_deg, batch_format="pyarrow"),
        ["node"]).to_pandas()
    order = np.argsort(deg["node"].to_numpy())
    dmap_ref = ray.put((deg["node"].to_numpy()[order],
                        deg["deg"].to_numpy(np.float64)[order]))

    def moments(t: "pa.Table") -> pd.DataFrame:
        nodes, degs = cached_get(dmap_ref)
        a = np.asarray(t["a"], np.int64)
        b = np.asarray(t["b"], np.int64)
        da = degs[np.searchsorted(nodes, a)]
        db = degs[np.searchsorted(nodes, b)]
        x = np.concatenate([da, db])  # both orientations
        y = np.concatenate([db, da])
        return pd.DataFrame({
            "part": np.zeros(1, np.int64),
            "n": np.asarray([len(x)], np.float64),
            "sx": np.asarray([x.sum()], np.float64),
            "sxx": np.asarray([(x * x).sum()], np.float64),
            "sxy": np.asarray([(x * y).sum()], np.float64),
        })

    m = sum_final(
        edges.map_batches(moments, batch_format="pyarrow"),
        ["part"]).to_pandas().iloc[0]
    var = m["n"] * m["sxx"] - m["sx"] * m["sx"]
    cov = m["n"] * m["sxy"] - m["sx"] * m["sx"]
    r = float(cov / var) if var > 0 else 0.0
    return pd.DataFrame({
        "n_edges": np.asarray([int(m["n"] // 2)], np.int64),
        "assortativity": np.asarray([r], np.float64),
    })


def common_neighbor_jaccard(
    edges: ray.data.Dataset,
    k: int = 20,
    num_shards: int = 64,
) -> pd.DataFrame:
    """Link prediction by neighborhood Jaccard: for every NON-edge
    pair (b < c) sharing at least one neighbor, score
    |N(b) ∩ N(c)| / |N(b) ∪ N(c)| and return the top-k candidates
    (ties by (b, c)). Common-neighbor counts ARE the wedge counts of
    ``triangle_count``'s round 1; existing edges are removed by the
    same co-shard side trick; only per-shard top-k partials reach the
    driver."""
    from engine.ops.relational import _sharded_by_key, sum_final
    from engine.state import cached_get

    import pyarrow as pa

    edges = edges.materialize()

    def local_deg(t: "pa.Table") -> pd.DataFrame:
        both = np.concatenate([np.asarray(t["a"], np.int64),
                               np.asarray(t["b"], np.int64)])
        u, c = np.unique(both, return_counts=True)
        return pd.DataFrame({"node": u, "deg": c.astype(np.int64)})

    deg = sum_final(
        edges.map_batches(local_deg, batch_format="pyarrow"),
        ["node"]).to_pandas()
    order = np.argsort(deg["node"].to_numpy())
    dmap_ref = ray.put((deg["node"].to_numpy()[order],
                        deg["deg"].to_numpy(np.float64)[order]))

    def shard_wedges(g: pd.DataFrame) -> "pa.Table":
        ks = []
        for a, sub in g.groupby("a", sort=False):
            nb = np.sort(sub["b"].to_numpy(np.int64))
            if len(nb) < 2:
                continue
            ii, jj = np.triu_indices(len(nb), k=1)
            ks.append(nb[ii] * 2_147_483_647 + nb[jj])
        flat = np.concatenate(ks) if ks else np.empty(0, np.int64)
        return pa.table({"k": pa.array(flat, pa.int64()),
                         "n": pa.array(np.ones(len(flat), np.int64),
                                       pa.int64())})

    # adjacency wedges need BOTH orientations of each edge (N(v) is
    # the full neighbor set, not just higher-id neighbors)
    def both_dirs(t: "pa.Table") -> "pa.Table":
        a = np.asarray(t["a"], np.int64)
        b = np.asarray(t["b"], np.int64)
        return pa.table({
            "a": pa.array(np.concatenate([a, b]), pa.int64()),
            "b": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    adj = edges.map_batches(both_dirs, batch_format="pyarrow")
    cn = sum_final(
        _sharded_by_key(adj, "a", num_shards).groupby("__shard")
        .map_groups(lambda g: shard_wedges(g.drop(columns="__shard")),
                    batch_format="pandas"),
        ["k"])

    def edge_key(t: "pa.Table") -> "pa.Table":
        kk = (np.asarray(t["a"], np.int64) * 2_147_483_647
              + np.asarray(t["b"], np.int64))
        return pa.table({"k": pa.array(kk, pa.int64()),
                         "n": pa.array(np.zeros(len(kk), np.int64),
                                       pa.int64())})

    ek = edges.map_batches(edge_key, batch_format="pyarrow")
    both = ek.union(cn)

    def shard_top(g: pd.DataFrame) -> pd.DataFrame:
        nodes, degs = cached_get(dmap_ref)
        is_edge = g["n"].to_numpy(np.int64) == 0
        kk = g["k"].to_numpy(np.int64)
        keep = ~np.isin(kk, kk[is_edge]) & ~is_edge
        kk = kk[keep]
        n = g["n"].to_numpy(np.int64)[keep]
        b, c = np.divmod(kk, 2_147_483_647)
        db = degs[np.searchsorted(nodes, b)]
        dc = degs[np.searchsorted(nodes, c)]
        jac = n / (db + dc - n)
        out = pd.DataFrame({"node_b": b, "node_c": c,
                            "n_common": n, "jaccard": jac})
        return out.sort_values(
            ["jaccard", "node_b", "node_c"],
            ascending=[False, True, True]).head(k)

    parts = _sharded_by_key(both, "k", num_shards).groupby(
        "__shard").map_groups(
        lambda g: shard_top(g.drop(columns="__shard")),
        batch_format="pandas").to_pandas()
    out = parts.sort_values(
        ["jaccard", "node_b", "node_c"],
        ascending=[False, True, True]).head(k).reset_index(drop=True)
    out["n_common"] = out["n_common"].astype(np.int64)
    return out


def k_core(
    edges: ray.data.Dataset, k: int, max_rounds: int = 200
) -> pd.DataFrame:
    """k-core extraction by iterative peeling: repeatedly drop every
    vertex with degree < k (and its edges) until a fixpoint — the
    dense-subgraph backbone used for community seeding and spam/bot
    pruning. Each round is one degree census (count combiner) plus a
    broadcast filter of the shrinking edge list; rounds are data
    -dependent but bounded by the peel depth (<= max_rounds guard).
    The surviving-vertex set broadcasts per round — at vertex sets
    too large to broadcast, swap the filter for the co-shard side
    trick used by ``triangle_count``'s closure. Returns (n_rounds,
    n_vertices, n_edges) of the k-core; pytest self-oracle is a
    single-process peeling loop."""
    from engine.ops.relational import sum_final
    from engine.state import cached_get

    import pyarrow as pa

    def local_deg(t: "pa.Table") -> pd.DataFrame:
        both = np.concatenate([np.asarray(t["a"], np.int64),
                               np.asarray(t["b"], np.int64)])
        u, c = np.unique(both, return_counts=True)
        return pd.DataFrame({"node": u, "deg": c.astype(np.int64)})

    cur = edges.materialize()
    rounds = 0
    n_edges = cur.count()
    n_vertices = 0
    while rounds < max_rounds and n_edges > 0:
        deg = sum_final(
            cur.map_batches(local_deg, batch_format="pyarrow"),
            ["node"]).to_pandas()
        bad = deg.loc[deg["deg"] < k, "node"].to_numpy(np.int64)
        n_vertices = len(deg)
        if len(bad) == 0:
            break
        keep_ref = ray.put(np.sort(
            deg.loc[deg["deg"] >= k, "node"].to_numpy(np.int64)))

        def drop(t: "pa.Table") -> "pa.Table":
            keep = cached_get(keep_ref)
            a = np.asarray(t["a"], np.int64)
            b = np.asarray(t["b"], np.int64)
            ok = (np.isin(a, keep) & np.isin(b, keep))
            return t.filter(pa.array(ok))

        cur = cur.map_batches(drop,
                              batch_format="pyarrow").materialize()
        n_edges = cur.count()
        rounds += 1
        if n_edges == 0:
            n_vertices = 0
    return pd.DataFrame({
        "k": np.asarray([k], np.int64),
        "n_rounds": np.asarray([rounds], np.int64),
        "n_vertices": np.asarray([n_vertices], np.int64),
        "n_edges": np.asarray([int(n_edges)], np.int64),
    })
