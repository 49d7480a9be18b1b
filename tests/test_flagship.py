"""End-to-end golden parity + resume tests (SURVEY.md §5.2 layers 3-4).

The oracle is a single-process numpy implementation (brute-force PIP,
O(n*m) kNN, one-pass tile paint) — "the reference" for parity purposes
(SURVEY.md §0): joined-row sets, per-tile assignment lists, caption
equality and decoded-pixel PSNR must match exactly (BASELINE.json:2/15).
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine import codec, fixtures
from engine.geo import knn as knn_mod
from engine.geo import pip as pip_mod
from engine.pipeline import flagship, tile

N_IMAGES = 800
ZOOM = 8


@pytest.fixture(scope="module")
def flagship_run(ray_session, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("flag"))
    img_dir = os.path.join(base, "images")
    out_dir = os.path.join(base, "out")
    fixtures.write_images_parquet(N_IMAGES, img_dir, num_files=6)
    res = flagship.run_flagship(
        img_dir, out_dir, target_partitions=3, batch_size=256, zoom=ZOOM
    )
    return {"img_dir": img_dir, "out_dir": out_dir, "res": res}


def _read_dir(pattern: str) -> pa.Table:
    files = sorted(glob.glob(pattern))
    return pa.concat_tables([pq.read_table(f) for f in files])


def _oracle_caption_canon(caption: str) -> str:
    lang, title = caption.split(":", 1)
    title = title.replace("_", " ")
    title = title[:1].upper() + title[1:]
    return f"{lang}:{title}"


def _oracle_join(poly):
    i = np.arange(N_IMAGES)
    lon, lat = fixtures.row_lonlat(i)
    pairs = []
    for g in range(len(poly["admin_id"])):
        ins = pip_mod.points_in_ring(lon, lat, poly["ring_lon"][g], poly["ring_lat"][g])
        for hx, hy in poly["holes"][g]:
            ins &= ~pip_mod.points_in_ring(lon, lat, hx, hy)
        for p in np.flatnonzero(ins):
            pairs.append((f"img{p:09d}", poly["admin_id"][g], int(poly["level"][g])))
    return set(pairs), lon, lat


def test_joined_parity(flagship_run):
    poly = fixtures.polygons()
    oracle_pairs, lon, lat = _oracle_join(poly)
    joined = _read_dir(os.path.join(flagship_run["out_dir"], "joined", "*", "*.parquet"))
    eng = set(
        zip(
            joined["image_id"].to_pylist(),
            joined["admin_id"].to_pylist(),
            joined["level"].to_pylist(),
        )
    )
    assert eng == oracle_pairs
    assert len(eng) > 50
    # deterministic primary: exactly one per (image, level)
    prim = joined.filter(joined["is_primary"])
    key = list(zip(prim["image_id"].to_pylist(), prim["level"].to_pylist()))
    assert len(key) == len(set(key))
    # tie-break = min admin_id within (image, level)
    by_key: dict = {}
    for img, adm, lev in eng:
        by_key.setdefault((img, lev), []).append(adm)
    for img, lev, adm in zip(
        prim["image_id"].to_pylist(), prim["level"].to_pylist(), prim["admin_id"].to_pylist()
    ):
        assert adm == min(by_key[(img, lev)])


def test_caption_equality(flagship_run):
    joined = _read_dir(os.path.join(flagship_run["out_dir"], "joined", "*", "*.parquet"))
    ids = joined["image_id"].to_pylist()
    canon = joined["caption_canon"].to_pylist()
    raw = fixtures.row_caption(np.array([int(s[3:]) for s in ids]))
    for c, r in zip(canon, raw):
        assert c == _oracle_caption_canon(r)


def test_knn_parity(flagship_run):
    poly = fixtures.polygons()
    cand_lon = np.array([r.mean() for r in poly["ring_lon"]])
    cand_lat = np.array([r.mean() for r in poly["ring_lat"]])
    i = np.arange(N_IMAGES)
    lon, lat = fixtures.row_lonlat(i)
    bn, bd = knn_mod.knn_brute_force(cand_lon, cand_lat, lon, lat, k=5)
    knn_t = _read_dir(os.path.join(flagship_run["out_dir"], "knn", "*", "*.parquet"))
    assert knn_t.num_rows == N_IMAGES * 5
    got = {}
    for img, nb, rk in zip(
        knn_t["image_id"].to_pylist(),
        knn_t["neighbor_id"].to_pylist(),
        knn_t["rank"].to_pylist(),
    ):
        got[(img, rk)] = nb
    admin_ids = poly["admin_id"]
    for q in range(N_IMAGES):
        for rk in range(5):
            assert got[(f"img{q:09d}", rk)] == admin_ids[bn[q, rk]]


def test_tile_assignment_and_pixel_parity(flagship_run):
    tiles = _read_dir(os.path.join(flagship_run["out_dir"], "tiles", "*.parquet"))
    i = np.arange(N_IMAGES)
    lon, lat = fixtures.row_lonlat(i)
    tx, ty, px, py = tile.lonlat_to_tile(lon, lat, ZOOM)
    keys = tile.tile_key(tx, ty, ZOOM)
    # membership parity
    oracle_members: dict = {}
    for k in range(N_IMAGES):
        oracle_members.setdefault(int(keys[k]), []).append(f"img{k:09d}")
    eng_members = {
        int(k): m
        for k, m in zip(tiles["tile_key"].to_pylist(), tiles["members"].to_pylist())
    }
    assert set(eng_members) == set(oracle_members)
    for k, mem in oracle_members.items():
        assert eng_members[k] == sorted(mem)
    assert (np.asarray(tiles["n_images"]) > 0).all()
    # pixel parity: oracle single-pass paint (order-independent owner rule)
    src = fixtures.pixel_source_row(i)
    some = sorted(oracle_members)[: 12]
    for key in some:
        rows = [int(s[3:]) for s in oracle_members[key]]
        canvas = np.zeros((tile.TILE_SIZE, tile.TILE_SIZE, 3), np.uint8)
        owner = np.full((tile.TILE_SIZE, tile.TILE_SIZE), -1, np.int64)
        order = np.argsort(rows)  # any order; rule is associative
        for r in np.asarray(rows)[order]:
            w, h = fixtures.row_dims(np.array([src[r]]))
            pxl = fixtures.image_pixels(int(src[r]), int(w[0]), int(h[0]))
            fmt = str(fixtures.row_fmt(np.array([src[r]]))[0])
            dec = codec.decode(codec.encode(pxl, fmt), fmt).astype(np.float64)
            thumb = np.stack(
                [codec.phash._resize_area(dec[:, :, c], tile.THUMB) for c in range(3)],
                axis=2,
            )
            thumb = np.clip(np.rint(thumb), 0, 255).astype(np.uint8)
            tile._paint(
                canvas, owner, [thumb.tobytes()],
                [px[r]], [py[r]], [r],
            )
        eng_tile = codec.decode(
            tiles.filter(pa.compute.equal(tiles["tile_key"], key))["tile_bytes"][0].as_py(),
            "raw16",
        )
        assert np.array_equal(eng_tile, canvas)


def test_decoded_pixel_psnr_gate(flagship_run):
    """Per-row invariant vs reference pixels: allclose for raw16, PSNR>=40
    for qdct (BASELINE.json:15)."""
    t = _read_dir(os.path.join(flagship_run["img_dir"], "*.parquet"))
    rng = np.random.default_rng(9)
    take = rng.choice(t.num_rows, 60, replace=False)
    for k in take:
        row = {c: t[c][int(k)].as_py() for c in t.column_names}
        src = int(fixtures.pixel_source_row(np.array([int(row["image_id"][3:])]))[0])
        orig = fixtures.image_pixels(src, row["w"], row["h"])
        dec = codec.decode(row["bytes"], row["fmt"])
        if row["fmt"] == "raw16":
            assert np.array_equal(dec, orig)
        else:
            assert codec.psnr(dec, orig) >= 40.0


def test_resume_skips_completed_and_recomputes_missing(flagship_run):
    out_dir = flagship_run["out_dir"]
    img_dir = flagship_run["img_dir"]
    # full re-run: everything skipped
    res2 = flagship.run_flagship(
        img_dir, out_dir, target_partitions=3, batch_size=256, zoom=ZOOM
    )
    assert res2["resumed_skipped"] == res2["partitions"]
    assert res2["joined_rows"] == flagship_run["res"]["joined_rows"]
    # kill simulation: drop one partition's join manifest + output
    man = os.path.join(out_dir, "manifest")
    victim = "p00001"
    os.remove(os.path.join(man, f"join__{victim}.parquet"))
    os.remove(os.path.join(man, f"tiles__all.parquet"))
    before = _read_dir(os.path.join(out_dir, "joined", "*", "*.parquet"))
    shutil.rmtree(os.path.join(out_dir, "joined", victim))
    untouched = os.path.join(out_dir, "joined", "p00000")
    mtime_before = max(os.path.getmtime(f) for f in glob.glob(untouched + "/*.parquet"))
    res3 = flagship.run_flagship(
        img_dir, out_dir, target_partitions=3, batch_size=256, zoom=ZOOM
    )
    assert res3["resumed_skipped"] == res3["partitions"] - 1
    # completed partitions untouched
    mtime_after = max(os.path.getmtime(f) for f in glob.glob(untouched + "/*.parquet"))
    assert mtime_after == mtime_before
    # recomputed output identical row set
    after = _read_dir(os.path.join(out_dir, "joined", "*", "*.parquet"))
    key = lambda t: sorted(
        zip(t["image_id"].to_pylist(), t["admin_id"].to_pylist())
    )
    assert key(after) == key(before)
    assert res3["joined_rows"] == flagship_run["res"]["joined_rows"]


def test_run_tiling_salted_equals_unsalted_on_hot_tile(ray_session):
    """Skew path (SURVEY §4.2): one deliberately hot tile fanned out by
    salting must produce byte-identical tiles to the unsalted groupby —
    owner-wins painting is associative, so the salt split is invisible
    in the output."""
    import pyarrow as pa
    import ray.data

    rng = np.random.default_rng(21)
    zoom = tile.DEFAULT_ZOOM
    hot_key = int(tile.tile_key(np.array([100]), np.array([90]), zoom)[0])
    cold_keys = [
        int(tile.tile_key(np.array([x]), np.array([91]), zoom)[0])
        for x in (100, 101, 102)
    ]
    n_hot, n_cold = 1500, 40
    keys = np.array(
        [hot_key] * n_hot
        + [k for k in cold_keys for _ in range(n_cold)], dtype=np.int64
    )
    n = len(keys)
    thumbs = [
        rng.integers(0, 256, (tile.THUMB, tile.THUMB, 3), dtype=np.uint8)
        .tobytes()
        for _ in range(n)
    ]
    t = pa.table(
        {
            "tile_key": pa.array(keys, pa.int64()),
            "px": pa.array(rng.integers(8, 248, n), pa.int32()),
            "py": pa.array(rng.integers(8, 248, n), pa.int32()),
            "paint_order": pa.array(rng.permutation(n), pa.int64()),
            "image_id": pa.array([f"img{i:07d}" for i in range(n)]),
            "thumb": pa.array(thumbs, pa.binary()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)

    def tiles_df(hot):
        out = tile.run_tiling(ds, zoom=zoom, hot=hot).to_pandas()
        return out.sort_values("tile_key", ignore_index=True)

    unsalted = tiles_df(None)
    salted = tiles_df({hot_key: 5})
    assert unsalted["tile_key"].tolist() == salted["tile_key"].tolist()
    assert len(unsalted) == 4
    assert (
        unsalted.loc[unsalted["tile_key"] == hot_key, "n_images"].iloc[0]
        == n_hot
    )
    for c in ("n_images", "tile_bytes"):
        assert unsalted[c].tolist() == salted[c].tolist(), c
