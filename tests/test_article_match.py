"""Article↔image tag-equality match ops (SURVEY J2/J3/A2) vs a DuckDB
oracle over the same fixture tables: the join/anti/agg logic is checked
by SQL equality on precomputed canonical columns (canonicalization
itself has its own unit tests in test_flagship/test_queries)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from engine import fixtures
from engine.ops import geo as geo_ops
from engine.pipeline import ingest, join


N = 900


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("art_imgs"))
    fixtures.write_images_parquet(N, d, num_files=3)
    from engine.io import read_images

    idx = ingest.run_ingest(read_images(d, columns=["image_id", "caption"]))
    arts = fixtures.articles(N)
    # oracle-side canonical image table (same canonicalizer, driver-side)
    import glob

    import pyarrow.parquet as pq

    t = pa.concat_tables(
        [pq.read_table(f, columns=["image_id", "caption"])
         for f in sorted(glob.glob(d + "/*.parquet"))]
    )
    img = pd.DataFrame(
        {
            "image_id": t["image_id"].to_pylist(),
            "caption_canon": ingest.canonicalize_captions(
                t["caption"].combine_chunks()
            ).to_pylist(),
        }
    )
    con = duckdb.connect()
    con.register("img", img)
    con.register("arts", arts)
    return idx, arts, con


def test_article_match_vs_sql(setup):
    idx, arts, con = setup
    got = (
        geo_ops.article_match(idx, arts)
        .to_pandas()
        .sort_values(["image_id", "article_id"], ignore_index=True)
    )
    want = con.execute(
        """SELECT image_id, article_id, caption_canon, theme
           FROM img JOIN arts ON caption_canon = title_canon
           ORDER BY image_id, article_id"""
    ).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )
    assert len(got) > 0


def test_articles_untagged_vs_sql(setup):
    idx, arts, con = setup
    got = geo_ops.articles_untagged(idx, arts)
    want = con.execute(
        """SELECT * FROM arts
           WHERE title_canon NOT IN (SELECT caption_canon FROM img)
           ORDER BY article_id"""
    ).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        want[sorted(want.columns)],
    )
    # every planted no-match article must appear
    assert (got["title_canon"].str.contains("Unmatched article")).sum() == 200


def test_area_tag_stats_vs_sql(setup):
    idx, arts, con = setup
    poly = fixtures.polygons()
    j = join.run_pip_join(idx, poly, concurrency=(1, 2))
    got = geo_ops.area_tag_stats(j, arts)
    jdf = j.select_columns(["admin_id", "caption_canon"]).to_pandas()
    con.register("joined", jdf)
    want = con.execute(
        """SELECT admin_id, COUNT(*) AS n_images,
                  CAST(SUM(CASE WHEN caption_canon IN
                       (SELECT title_canon FROM arts) THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_tagged,
                  ROUND(100.0 * SUM(CASE WHEN caption_canon IN
                       (SELECT title_canon FROM arts) THEN 1 ELSE 0 END)
                       / COUNT(*), 4) AS pct_tagged
           FROM joined GROUP BY admin_id ORDER BY admin_id"""
    ).df()
    got = got.sort_values("admin_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    assert (got["n_tagged"] <= got["n_images"]).all()


def test_suggestions_match_bruteforce(ray_session, tmp_path):
    """Per-untagged-article k nearest images == O(n*m) haversine oracle
    (min-k over a candidate partition is associative, so batch-local
    top-k + grouped merge must be exact)."""
    import ray.data

    from engine import fixtures
    from engine.geo.knn import haversine_m
    from engine.ops.geo import articles_untagged, suggestions
    from engine.pipeline import ingest

    d = str(tmp_path / "imgs")
    fixtures.write_images_parquet(400, d, num_files=3)
    idx = ingest.run_ingest(
        ray.data.read_parquet(d, columns=["image_id", "caption"])
    )
    arts = fixtures.articles(400)
    got = (
        suggestions(idx, arts, k=3, batch_size=64)
        .to_pandas()
        .sort_values(["article_id", "rank"], ignore_index=True)
    )
    pts = idx.select_columns(["image_id", "lon", "lat"]).to_pandas()
    unt = articles_untagged(idx, arts)
    assert got["article_id"].nunique() == len(unt)
    for _, a in unt.head(25).iterrows():
        d_m = haversine_m(
            pts["lon"].to_numpy(), pts["lat"].to_numpy(),
            float(a["lon"]), float(a["lat"]),
        )
        order = np.lexsort((pts["image_id"].to_numpy(), d_m))[:3]
        want = pts["image_id"].to_numpy()[order].tolist()
        sub = got[got["article_id"] == a["article_id"]]
        assert sub["image_id"].tolist() == want, a["article_id"]
        np.testing.assert_allclose(
            sub["dist_m"].to_numpy(), np.sort(d_m)[:3], rtol=1e-6
        )
