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

    for _ in range(iters):
        # contribution of each node along each out-edge
        contrib = np.where(out_deg > 0, rank / np.maximum(out_deg, 1.0), 0.0)
        dangling = rank[out_deg == 0].sum()
        cmap = pd.DataFrame({src: nodes, "__c": contrib})
        ref = ray.put(cmap)

        def push(b: pd.DataFrame) -> pd.DataFrame:
            from engine.state import cached_get

            m = b.merge(cached_get(ref), on=src)
            return (
                pd.DataFrame({"node": m[dst], "__sum": m["__c"]})
                .groupby("node", as_index=False)
                .sum()
            )

        sums = relational.sum_final(
            edges.map_batches(push, batch_format="pandas"), ["node"]
        ).to_pandas()
        incoming = np.zeros(n)
        incoming[node_pos[sums["node"]].to_numpy()] = sums["__sum"].to_numpy()
        rank = (1 - damping) / n + damping * (incoming + dangling / n)

    return pd.DataFrame({"node": nodes, "rank": rank}).sort_values(
        "node", ignore_index=True
    )
