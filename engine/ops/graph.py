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
