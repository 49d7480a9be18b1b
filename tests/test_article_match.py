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
        """SELECT article_id, title_canon, theme FROM arts
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
