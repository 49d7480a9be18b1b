"""IVF approximate-ANN recall vs brute force (SURVEY simsearch note:
"recall measured vs brute force in tests")."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session, sf_dir):
    from engine.io import sf_table

    return sf_table(sf_dir, "embeddings", ["vec_id", "embedding"])


def test_ivf_recall_vs_brute_force(emb_ds):
    from engine.ops import simsearch

    qdf = emb_ds.sort("vec_id").limit(8).to_pandas()
    q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    exact = simsearch.brute_force_topk(emb_ds, q, k=10)
    approx = simsearch.ivf_topk(emb_ds, q, k=10, n_clusters=8, nprobe=4)
    recalls = []
    for qi in range(len(q)):
        e = set(exact[exact["query_ix"] == qi]["vec_id"])
        a = set(approx[approx["query_ix"] == qi]["vec_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    mean_recall = float(np.mean(recalls))
    # nprobe/n_clusters = 1/2 of the space probed -> recall well above that
    assert mean_recall >= 0.6, f"IVF mean recall {mean_recall:.2f} too low"
    # the self-vector (cos=1.0) must always be found: it lands in the
    # query's own top probe bucket by construction
    for qi, vid in enumerate(qdf["vec_id"]):
        got = approx[(approx["query_ix"] == qi) & (approx["rank"] == 0)]
        assert len(got) == 1 and got["vec_id"].iloc[0] == vid


def test_brute_force_matches_numpy_oracle(emb_ds):
    from engine.ops import simsearch

    qdf = emb_ds.sort("vec_id").limit(4).to_pandas()
    q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    res = simsearch.brute_force_topk(emb_ds, q, k=5)
    all_df = emb_ds.to_pandas().sort_values("vec_id", ignore_index=True)
    v = np.stack(all_df["embedding"].to_numpy()).astype(np.float64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sim = qn @ v.T
    ids = all_df["vec_id"].to_numpy()
    for qi in range(len(q)):
        order = np.lexsort((ids, -sim[qi]))[:5]
        want = ids[order].tolist()
        got = res[res["query_ix"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == want, (qi, got, want)


def test_ivf_bucketed_probe_prunes_dirs(emb_ds, tmp_path):
    """The IVF scale path is data-skipping: a probe reads ONLY the
    nprobe bucket directories per query (mirror of the read_key_range /
    read_rect zone-map pruning tests), and the pre-built-index result
    equals the build-and-probe convenience path exactly."""
    import glob

    import pandas as pd

    from engine.ops import simsearch

    idx = str(tmp_path / "ivf")
    simsearch.ivf_build(emb_ds, idx, n_clusters=16)
    n_dirs = len(glob.glob(f"{idx}/bucket=*"))
    assert n_dirs > 4  # enough buckets for pruning to mean something
    qdf = emb_ds.sort("vec_id").limit(4).to_pandas()
    q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    res, stats = simsearch.ivf_probe(idx, q, k=10, nprobe=2)
    # <= nq * nprobe distinct buckets opened, strictly less than total
    assert stats["buckets_read"] <= 8
    assert stats["buckets_read"] < stats["n_buckets_total"] == 16
    # every probed bucket is one of the declared nprobe-nearest ids
    assert all(0 <= b < 16 for b in stats["probed_buckets"])
    # parity: same centroids (same seed/sample) => identical result
    res2 = simsearch.ivf_topk(emb_ds, q, k=10, n_clusters=16, nprobe=2)
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True), res2.reset_index(drop=True)
    )
    # the self-vector still ranks first for its own query
    for qi, vid in enumerate(qdf["vec_id"]):
        got = res[(res["query_ix"] == qi) & (res["rank"] == 0)]
        assert len(got) == 1 and got["vec_id"].iloc[0] == vid


def test_pq_topk_recall_beats_random(ray_session):
    import ray.data

    from engine.ops.simsearch import pq_topk

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    df = emb.to_pandas()
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    queries = X[:8] + 0.01  # near-copies of corpus vectors
    got = pq_topk(emb, queries, k=10, m=16, ks=64)

    # exact L2 top-10 oracle
    recalls = []
    for qi in range(len(queries)):
        d = ((X - queries[qi]) ** 2).sum(axis=1)
        exact = set(df["vec_id"].to_numpy()[np.argsort(d, kind="stable")[:10]])
        mine = set(got.loc[got["qid"] == qi, "vec_id"])
        recalls.append(len(exact & mine) / 10)
    mean_r = float(np.mean(recalls))
    n = len(df)
    random_baseline = 10 / n
    assert mean_r >= 0.5, recalls            # useful approximation
    assert mean_r > 20 * random_baseline     # far above chance
    # the planted near-copy itself is found for most queries
    hits = sum(
        int(df["vec_id"].iloc[qi] in set(got.loc[got["qid"] == qi, "vec_id"]))
        for qi in range(len(queries))
    )
    assert hits >= 6


def test_cosine_range_search_vs_brute(ray_session):
    import pandas as pd
    import ray.data

    from engine.ops.simsearch import _normalize, cosine_range_search

    rng = np.random.default_rng(41)
    d = 16
    corpus = rng.normal(0, 1, (300, d))
    queries = rng.normal(0, 1, (4, d))
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(300),
        "embedding": list(corpus.astype(np.float32)),
    })).repartition(3)
    out = (cosine_range_search(ds, queries, min_cos=0.3)
           .to_pandas()
           .sort_values(["query_ix", "vec_id"], ignore_index=True))

    cn = _normalize(corpus.astype(np.float32).astype(np.float64))
    qn = _normalize(queries)
    sim = cn @ qn.T
    n_ix, q_ix = np.nonzero(sim >= 0.3)
    assert len(out) == len(n_ix)
    got = set(zip(out["query_ix"], out["vec_id"]))
    assert got == set(zip(q_ix.tolist(), n_ix.tolist()))
    for _, r in out.iterrows():
        assert r["cos"] >= 0.3
