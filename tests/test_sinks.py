"""GPX / per-area CSV export sinks (reference phase-3 outputs [PK]):
readback parity, byte-determinism (idempotent re-runs) and the
untagged-by-area row semantics."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def export_rows(ray_session):
    import __ray_entry__  # reuses the cached on-disk geo fixture

    from engine import fixtures
    from engine.io import read_images
    from engine.ops import geo as geo_ops
    from engine.pipeline import ingest

    idx_dir = __ray_entry__._geo_fixture_dir()
    idx = ingest.run_ingest(read_images(idx_dir, columns=["image_id", "caption"]))
    arts = fixtures.articles(__ray_entry__._GEO_N)
    rows = geo_ops.untagged_by_area(idx, arts, fixtures.polygons())
    return rows, arts, idx


def test_untagged_by_area_semantics(export_rows):
    rows, arts, idx = export_rows
    assert len(rows) > 0
    # every exported article is genuinely untagged: no canonical image
    # caption equals its title
    seen = set(
        idx.select_columns(["caption_canon"]).unique("caption_canon")
    )
    assert not set(rows["title_canon"]) & seen
    # rows carry valid area assignments and are (admin_id, article_id)
    # sorted with one row per containing area
    assert rows["admin_id"].str.startswith("adm").all()
    assert rows[["admin_id", "article_id"]].apply(tuple, axis=1).is_monotonic_increasing
    assert not rows.duplicated(["admin_id", "article_id"]).any()


def test_gpx_sink_readback_and_idempotency(ray_session, export_rows, tmp_path):
    import ray.data as rd

    from engine import sinks

    rows, _, _ = export_rows
    ds = rd.from_pandas(rows)
    out = str(tmp_path / "gpx")
    man1 = sinks.write_gpx_per_area(
        ds, out, area_col="admin_id", name_col="title_canon"
    )
    assert (man1["n_rows"].sum()) == len(rows)
    # readback: every file parses as GPX 1.1, waypoint names == rows
    ns = {"g": "http://www.topografix.com/GPX/1/1"}
    for _, m in man1.iterrows():
        root = ET.parse(m["path"]).getroot()
        wpts = root.findall("g:wpt", ns)
        assert len(wpts) == m["n_rows"]
        names = sorted(w.find("g:name", ns).text for w in wpts)
        want = sorted(
            rows.loc[rows["admin_id"] == m["area"], "title_canon"]
        )
        assert names == want
        lats = [float(w.get("lat")) for w in wpts]
        assert all(35.0 - 1 <= la <= 47.0 + 1 for la in lats)
    # idempotency: re-run writes byte-identical files (same crc32)
    man2 = sinks.write_gpx_per_area(
        rd.from_pandas(rows.sample(frac=1.0, random_state=3)),  # shuffled input
        out, area_col="admin_id", name_col="title_canon",
    )
    pd.testing.assert_frame_equal(man1, man2)


def test_csv_sink_readback_and_idempotency(ray_session, export_rows, tmp_path):
    import ray.data as rd

    from engine import sinks

    rows, _, _ = export_rows
    cols = ["article_id", "title_canon", "theme", "lon", "lat"]
    out = str(tmp_path / "csv")
    man1 = sinks.write_csv_per_area(
        rd.from_pandas(rows), out, area_col="admin_id",
        columns=cols, sort_by=["article_id"],
    )
    for _, m in man1.iterrows():
        got = pd.read_csv(m["path"])
        want = (
            rows.loc[rows["admin_id"] == m["area"], cols]
            .sort_values("article_id", ignore_index=True)
        )
        assert list(got.columns) == cols
        assert got["article_id"].tolist() == want["article_id"].tolist()
        np.testing.assert_allclose(got["lat"], want["lat"], rtol=0, atol=1e-9)
    man2 = sinks.write_csv_per_area(
        rd.from_pandas(rows.sample(frac=1.0, random_state=5)),
        out, area_col="admin_id", columns=cols, sort_by=["article_id"],
    )
    pd.testing.assert_frame_equal(man1, man2)


def test_empty_input_yields_empty_manifest(ray_session, tmp_path):
    import ray.data as rd

    from engine import sinks

    empty = pd.DataFrame({
        "admin_id": pd.Series(dtype=str),
        "title_canon": pd.Series(dtype=str),
        "lat": pd.Series(dtype=np.float64),
        "lon": pd.Series(dtype=np.float64),
    })
    man = sinks.write_gpx_per_area(
        rd.from_pandas(empty), str(tmp_path / "e"),
        area_col="admin_id", name_col="title_canon",
    )
    assert len(man) == 0
    assert list(man.columns) == ["area", "path", "n_rows", "crc32"]


def test_html_sink_readback_and_idempotency(ray_session, export_rows, tmp_path):
    import ray.data as rd

    from engine import sinks

    rows, _, _ = export_rows
    cols = ["article_id", "title_canon", "theme"]
    out = str(tmp_path / "html")
    man1 = sinks.write_html_per_area(
        rd.from_pandas(rows), out, area_col="admin_id", columns=cols,
    )
    assert len(man1) == rows["admin_id"].nunique()
    for _, m in man1.iterrows():
        body = open(m["path"], encoding="utf-8").read()
        assert body.startswith("<!DOCTYPE html>")
        want = rows.loc[rows["admin_id"] == m["area"]]
        assert int(m["n_rows"]) == len(want)
        # every article row renders, escaped, in document order
        pos = -1
        for aid in sorted(want["article_id"]):
            nxt = body.find(f"<td>{aid}</td>")
            assert nxt > pos, (m["area"], aid)
            pos = nxt
    # byte-determinism: shuffled input, same bytes, same crcs
    man2 = sinks.write_html_per_area(
        rd.from_pandas(rows.sample(frac=1.0, random_state=5)),
        out, area_col="admin_id", columns=cols,
    )
    pd.testing.assert_frame_equal(man1, man2)


def test_html_escaping():
    from engine import sinks

    rows = pd.DataFrame({
        "a": ["x<script>alert(1)</script>", "b&c"],
        "u": ["http://e/?x=1&y=2", "http://e/2"],
    })
    doc = sinks.html_document(rows, title="t<&>", columns=["a", "u"],
                              link_col="u")
    assert "<script>alert" not in doc
    assert "x&lt;script&gt;" in doc
    assert 'href="http://e/?x=1&amp;y=2"' in doc
    assert "t&lt;&amp;&gt;" in doc


def test_assemble_site_index_and_idempotency(ray_session, export_rows,
                                             tmp_path):
    import ray.data as rd

    from engine import sinks

    rows, _, _ = export_rows
    out = str(tmp_path / "site")
    man1 = sinks.assemble_site(rd.from_pandas(rows), out)
    # index + one page per theme, all on disk
    themes = sorted(set(rows["theme"].astype(str)))
    assert set(man1["page"]) == (
        {"index.html"} | {f"theme_{t}.html" for t in themes})
    for p in set(man1["page"]):
        assert os.path.exists(os.path.join(out, p))
    # the root index links every theme page with its article count
    idx_html = open(os.path.join(out, "index.html")).read()
    for t in themes:
        assert f'href="theme_{t}.html"' in idx_html
        n = int((rows["theme"].astype(str) == t).sum())
        assert f"<td>{n}</td>" in idx_html
    # per-theme totals and the index total reconcile with the rows
    tops = man1[(man1["area"] == "*") & (man1["page"] != "index.html")]
    assert int(tops["n_rows"].sum()) == len(rows)
    assert int(man1.loc[man1["page"] == "index.html",
                        "n_rows"].iloc[0]) == len(rows)
    # byte-determinism: shuffled input -> identical manifest (crc32
    # equality IS the byte witness)
    man2 = sinks.assemble_site(
        rd.from_pandas(rows.sample(frac=1.0, random_state=7)), out)
    pd.testing.assert_frame_equal(man1, man2)
