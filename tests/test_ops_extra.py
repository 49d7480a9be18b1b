"""Unit tests for the operator-pack additions (SURVEY M5/A3/D3).

Each op is verified against a single-process brute-force oracle
(SURVEY.md §5.2 layer 1), same policy as the geo kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from engine import fixtures
from engine.codec.phash import hamming64


@pytest.fixture(scope="module")
def images_ds(ray_session, tmp_path_factory):
    import ray.data

    d = str(tmp_path_factory.mktemp("imgs"))
    fixtures.write_images_parquet(600, d, num_files=3)
    return ray.data.read_parquet(d, columns=["image_id", "phash"])


def test_phash_near_dups_matches_bruteforce(images_ds):
    from engine.ops.dedup import phash_near_dups

    got = phash_near_dups(images_ds, max_hamming=6)
    t = images_ds.to_pandas().sort_values("image_id", ignore_index=True)
    ids = t["image_id"].to_numpy()
    h = t["phash"].to_numpy()
    ia, ib = np.triu_indices(len(ids), k=1)
    d = hamming64(h[ia], h[ib])
    m = d <= 6
    want = pd.DataFrame({"a": ids[ia[m]], "b": ids[ib[m]], "hamming": d[m]})
    want = want.sort_values(["a", "b"], ignore_index=True)
    assert len(got) == len(want)
    assert got["a"].tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()
    assert got["hamming"].tolist() == want["hamming"].tolist()
    # fixture plants exact duplicates -> at least those pairs exist
    assert (got["hamming"] == 0).any()


def test_polygon_centroids_inside_ring_bbox(ray_session):
    from engine.ops.geo import polygon_centroids

    poly = fixtures.polygons()
    df = polygon_centroids(poly).to_pandas().set_index("admin_id")
    for i, a in enumerate(poly["admin_id"]):
        x, y = poly["ring_lon"][i], poly["ring_lat"][i]
        cx, cy = df.loc[str(a), "centroid_lon"], df.loc[str(a), "centroid_lat"]
        assert x.min() <= cx <= x.max()
        assert y.min() <= cy <= y.max()


def test_admin_rollup_conserves_counts(ray_session, tmp_path_factory):
    import ray.data

    from engine.ops.geo import admin_rollup
    from engine.pipeline import ingest, join

    d = str(tmp_path_factory.mktemp("imgs2"))
    fixtures.write_images_parquet(400, d, num_files=2)
    poly = fixtures.polygons()
    idx = ingest.run_ingest(
        ray.data.read_parquet(d, columns=["image_id", "caption"])
    )
    joined = join.run_pip_join(idx, poly, concurrency=(1, 2))
    table = admin_rollup(joined, poly)
    jn = joined.count()
    # total own counts == joined rows
    assert int(table["own_count"].sum()) == jn
    # every subtree >= own; parents accumulate children
    assert (table["subtree_count"] >= table["own_count"]).all()
    by_id = table.set_index("admin_id")
    parent = dict(zip(poly["admin_id"].astype(str), poly["parent_id"].astype(str)))
    for a, p in parent.items():
        if p:
            assert by_id.loc[p, "subtree_count"] >= by_id.loc[a, "subtree_count"]
