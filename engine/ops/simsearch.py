"""Similarity search over an embedding column (driver mandate).

- ``brute_force_topk``: exact cosine top-k — the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul
  against it; per-batch local top-k partials are merged driver-side
  (k * n_queries rows — tiny), so the corpus streams and nothing
  all-to-all shuffles.
- ``ivf_topk``: IVF-style scale path — k-means coarse centroids
  (trained on a sample), corpus bucketed by nearest centroid
  (groupby), queries probe only ``nprobe`` nearest buckets. Exactness
  is traded for touch-set size; recall measured vs brute force in
  tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    corpus: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k. Returns DataFrame(query_ix, rank, vec_id, cos)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            ids = batch[id_col].to_numpy()
            sim = self.q @ v.T  # (nq, nb)
            kk = min(k, sim.shape[1])
            # local top-k partials per query
            part = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
            rows = []
            for qi in range(sim.shape[0]):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_ix": qi,
                            "vec_id": ids[part[qi]],
                            "cos": sim[qi, part[qi]],
                        }
                    )
                )
            return pd.concat(rows, ignore_index=True)

    partials = corpus.map_batches(
        Score, batch_format="pandas", concurrency=(1, 8)
    ).to_pandas()
    out = []
    for qi, g in partials.groupby("query_ix"):
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int32)
        out.append(g)
    res = pd.concat(out, ignore_index=True)[["query_ix", "rank", "vec_id", "cos"]]
    res["cos"] = np.round(res["cos"], 6)
    return res


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 42):
    """Tiny deterministic k-means (Lloyd) on a driver-side sample."""
    rng = np.random.default_rng(seed)
    x = _normalize(sample.astype(np.float64))
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    corpus: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_sample: int = 2048,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF-bucketed approximate top-k (the 100TB-scale path).

    Centroids trained once on a driver-side sample and broadcast; the
    corpus is scored ONLY in the ``nprobe`` buckets nearest each query.
    At cluster scale the bucket assignment becomes the partition key of
    a pre-bucketed corpus layout, so a query touches nprobe/n_clusters
    of the data.
    """
    sample = np.stack(
        corpus.limit(train_sample).to_pandas()[vec_col].to_numpy()
    )
    cent = kmeans_fit(sample, n_clusters, seed=seed)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_buckets = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    cent_ref = ray.put(cent)
    probe_ref = ray.put(q_buckets)
    q_ref = ray.put(q)

    class Score:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            self.q = ray.get(q_ref)
            self.probe = ray.get(probe_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            ids = batch[id_col].to_numpy()
            vb = np.argmax(v @ self.cent.T, axis=1)  # corpus bucket
            rows = []
            for qi in range(len(self.q)):
                m = np.isin(vb, self.probe[qi])
                if not m.any():
                    continue
                sim = v[m] @ self.q[qi]
                kk = min(k, len(sim))
                part = np.argpartition(-sim, kk - 1)[:kk]
                rows.append(
                    pd.DataFrame(
                        {"query_ix": qi, "vec_id": ids[m][part], "cos": sim[part]}
                    )
                )
            if not rows:
                return pd.DataFrame(
                    {"query_ix": pd.Series(dtype=np.int64),
                     "vec_id": pd.Series(dtype=ids.dtype),
                     "cos": pd.Series(dtype=np.float64)}
                )
            return pd.concat(rows, ignore_index=True)

    partials = corpus.map_batches(
        Score, batch_format="pandas", concurrency=(1, 8)
    ).to_pandas()
    out = []
    for qi, g in partials.groupby("query_ix"):
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int32)
        out.append(g)
    if not out:
        return pd.DataFrame(columns=["query_ix", "rank", "vec_id", "cos"])
    res = pd.concat(out, ignore_index=True)[["query_ix", "rank", "vec_id", "cos"]]
    res["cos"] = np.round(res["cos"], 6)
    return res


def kmeans_assign(
    corpus: ray.data.Dataset,
    *,
    n_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_sample: int = 2048,
    seed: int = 42,
) -> ray.data.Dataset:
    """Embedding clustering for corpus curation: deterministic k-means
    centroids fit on a driver-side sample, broadcast once, then every
    batch assigns its vectors by one matmul — the corpus streams, no
    shuffle. Emits (id_col, cluster: int32, cos: double = similarity to
    the owning centroid). At 100 TB the same centroid broadcast scales
    unchanged; only the sample read grows (swap in a distributed
    reservoir sample)."""
    sample = np.stack(
        corpus.limit(train_sample).to_pandas()[vec_col].to_numpy()
    )
    cent = kmeans_fit(sample, n_clusters, seed=seed)
    cent_ref = ray.put(cent)

    class Assign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            sim = v @ self.cent.T
            a = np.argmax(sim, axis=1)
            return pd.DataFrame(
                {
                    id_col: batch[id_col].to_numpy(),
                    "cluster": a.astype(np.int32),
                    "cos": np.round(sim[np.arange(len(a)), a], 6),
                }
            )

    return corpus.map_batches(Assign, batch_format="pandas", concurrency=(1, 8))


def embedding_centroid_by_label(
    corpus: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pd.DataFrame:
    """Mean vector per label — the list-column GROUP BY. Each batch
    flattens its Arrow list column zero-copy into a (rows x d) view
    and collapses to ONE (labels_in_batch x d) partial sum matrix via
    np.add.at; the exchange moves |labels| x d floats per block, never
    vectors. Returns long form (label, dim, avg_val) so a DuckDB
    UNNEST oracle can name identical columns. dim is 1-based to match
    generate_subscripts."""
    from engine.ops import relational

    def local(t) -> pd.DataFrame:
        import pyarrow as pa  # noqa: F401

        col = t.column(vec_col).combine_chunks()
        mat = col.flatten().to_numpy(zero_copy_only=False).reshape(len(t), -1)
        labels = t.column(label_col).to_numpy()
        u, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(u), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, mat)
        cnt = np.bincount(inv)
        d = mat.shape[1]
        return pd.DataFrame({
            "label": np.repeat(u, d),
            "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), len(u)),
            "__s": sums.ravel(),
            "__n": np.repeat(cnt, d).astype(np.int64),
        })

    tot = relational.sum_final(
        corpus.map_batches(local, batch_format="pyarrow"), ["label", "dim"]
    ).to_pandas()
    tot["avg_val"] = tot["__s"] / tot["__n"]
    return tot[["label", "dim", "avg_val"]]


def _kmeans_l2(sample: np.ndarray, k: int, iters: int = 8, seed: int = 42):
    """Plain-Euclidean Lloyd on a driver-side sample (no normalization
    — PQ quantizes raw subvectors)."""
    rng = np.random.default_rng(seed)
    x = sample.astype(np.float64)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def pq_fit(
    sample: np.ndarray, m: int = 8, ks: int = 32, iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, public
    method): split dims into ``m`` subspaces, k-means each on a
    driver-side sample. Returns (m, ks, d/m) float64."""
    n, d = sample.shape
    assert d % m == 0, "dim must divide into m subspaces"
    sub = d // m
    return np.stack([
        _kmeans_l2(sample[:, j * sub:(j + 1) * sub], ks, iters, seed + j)
        for j in range(m)
    ])


def pq_encode(
    corpus: ray.data.Dataset,
    codebooks: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Compress each vector to ``m`` uint8 codes (argmin-L2 per
    subspace) — 10^12 x 64 float32 vectors (256 TB) become m bytes
    each (8 TB at m=8): the memory path that makes corpus-scale ANN
    fit a cluster. Codebooks broadcast once; assignment is one matmul
    per subspace per batch."""
    import ray

    ref = ray.put(codebooks)

    def enc(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        cb = cached_get(ref)
        m, ks, sub = cb.shape
        x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            xj = x[:, j * sub:(j + 1) * sub]
            # argmin ||x-c||^2 = argmax 2xc - ||c||^2 (one matmul)
            d = 2.0 * (xj @ cb[j].T) - (cb[j] ** 2).sum(axis=1)
            codes[:, j] = np.argmax(d, axis=1)
        return pd.DataFrame({id_col: b[id_col],
                             "codes": [c.tobytes() for c in codes]})

    return corpus.map_batches(enc, batch_format="pandas")


def pq_topk(
    corpus: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    m: int = 8,
    ks: int = 32,
    train_sample: int = 512,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Approximate top-k by asymmetric distance (ADC): per query a
    (m x ks) lookup table of subspace distances to every centroid is
    broadcast with the codebooks; each batch encodes its vectors and
    scores them with ``m`` table lookups instead of a d-dim dot —
    per-batch top-k partials merge exactly (min-k is associative).
    Recall vs exact L2 is pytest-verified. Returns (qid, vec_id, rank,
    adist)."""
    import ray

    sample = np.stack(
        corpus.limit(train_sample).to_pandas()[vec_col].to_numpy()
    ).astype(np.float64)
    cb = pq_fit(sample, m=m, ks=ks)
    sub = cb.shape[2]
    q = np.asarray(queries, dtype=np.float64)
    # LUT[qi, j, c] = ||q_sub - centroid||^2
    lut = np.stack([
        ((q[:, j * sub:(j + 1) * sub][:, None, :] - cb[j][None, :, :]) ** 2)
        .sum(axis=2)
        for j in range(cb.shape[0])
    ], axis=1)
    ref = ray.put((cb, lut))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        cb_, lut_ = cached_get(ref)
        m_, ks_, sub_ = cb_.shape
        x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        codes = np.empty((len(x), m_), dtype=np.int64)
        for j in range(m_):
            xj = x[:, j * sub_:(j + 1) * sub_]
            d = 2.0 * (xj @ cb_[j].T) - (cb_[j] ** 2).sum(axis=1)
            codes[:, j] = np.argmax(d, axis=1)
        # adist[qi, row] = sum_j lut[qi, j, codes[row, j]]
        nq = lut_.shape[0]
        ids = b[id_col].to_numpy()
        out = {"qid": [], id_col: [], "adist": []}
        for qi in range(nq):
            dist = lut_[qi, np.arange(codes.shape[1])[None, :], codes].sum(axis=1)
            take = np.argsort(dist, kind="stable")[:k]
            out["qid"].extend([qi] * len(take))
            out[id_col].extend(ids[take])
            out["adist"].extend(dist[take])
        return pd.DataFrame(out)

    parts = corpus.map_batches(score, batch_format="pandas").to_pandas()
    rows = []
    for qi, g in parts.groupby("qid"):
        g = g.sort_values(["adist", id_col], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        rows.append(g)
    return pd.concat(rows, ignore_index=True)[["qid", id_col, "rank", "adist"]]
