"""Incremental-update flagship tests (round-4: SURVEY §4.3 nightly loop).

Plants a changefile (deletes + in-place upserts + out-of-range inserts)
against a completed flagship run and asserts:

- only the touched partitions are invalidated and recomputed;
- UNTOUCHED partitions' on-disk outputs are byte-identical with
  unchanged mtimes (they were never opened);
- the final joined / knn / tiles state equals a from-scratch full run
  over the post-update images (same partition plan -> deterministic
  comparison).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine import fixtures
from engine.pipeline import flagship, incremental

N = 480  # 6 fragments x 80 rows; partitions of 2 fragments each
ZOOM = 8


def _snapshot(root: str) -> dict[str, tuple[float, int]]:
    out = {}
    for f in glob.glob(os.path.join(root, "**", "*.parquet"),
                       recursive=True):
        st = os.stat(f)
        out[os.path.relpath(f, root)] = (st.st_mtime_ns, st.st_size)
    return out


def _read_tree(pattern: str) -> pd.DataFrame:
    files = sorted(glob.glob(pattern, recursive=True))
    return pa.concat_tables(
        [pq.read_table(f) for f in files]).to_pandas()


def _changefile() -> pa.Table:
    """Deterministic changefile: delete 5 ids from fragment 2
    (partition p00001), upsert 5 ids in fragment 3 (p00001) with the
    caption/pixels of OTHER fixture indices, insert 20 brand-new ids
    past every fragment's range (spill)."""
    del_ids = [f"img{i:09d}" for i in range(165, 170)]
    up_idx = np.arange(250, 255)
    donor = fixtures.images_table(len(up_idx), offset=1250)
    ups = donor.set_column(
        0, "image_id",
        pa.array([f"img{i:09d}" for i in up_idx], pa.string()))
    ins = fixtures.images_table(20, offset=N)
    d_tab = pa.table({
        "image_id": pa.array(del_ids, pa.string()),
        "bytes": pa.array([b""] * 5, pa.binary()),
        "w": pa.array([0] * 5, pa.int32()),
        "h": pa.array([0] * 5, pa.int32()),
        "fmt": pa.array([""] * 5, pa.string()),
        "caption": pa.array([""] * 5, pa.string()),
        "phash": pa.array([0] * 5, pa.int64()),
    })
    both = pa.concat_tables([d_tab, ups, ins])
    ops = ["D"] * 5 + ["U"] * (len(up_idx) + 20)
    return both.append_column("__op", pa.array(ops, pa.string()))


@pytest.fixture(scope="module")
def incr_run(ray_session, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("incr"))
    img_dir = os.path.join(base, "images")
    out_dir = os.path.join(base, "out")
    fixtures.write_images_parquet(N, img_dir, num_files=6)
    res0 = flagship.run_flagship(
        img_dir, out_dir, target_partitions=3, batch_size=256, zoom=ZOOM)
    snap_before = {
        stage: _snapshot(os.path.join(out_dir, stage))
        for stage in ("joined", "knn", "tile_partials")
    }
    res1 = incremental.run_incremental_update(
        img_dir, out_dir, _changefile(), run_id="night1",
        batch_size=256, zoom=ZOOM)
    return {
        "img_dir": img_dir, "out_dir": out_dir, "base": base,
        "res0": res0, "res1": res1, "snap_before": snap_before,
    }


def test_overlapping_fragment_ranges_no_stale_duplicate(
        ray_session, tmp_path):
    """Round-4 ADVICE item 1: with OVERLAPPING fragment key-ranges a
    changed key routes to every containing fragment — the upsert row
    lands in the first, acts as a delete in the rest, and a delete
    removes the key from all of them. A key duplicated across two
    overlapping fragments must come out exactly once with the new
    value (no silent stale copy)."""
    img_dir = str(tmp_path / "ovl")
    os.makedirs(img_dir)
    base = fixtures.images_table(40)
    ids = base["image_id"].to_pylist()
    # frag a: rows 0..24; frag b: rows 15..39 -> ranges overlap and
    # ids 15..24 exist in BOTH fragments (planted duplicates)
    pq.write_table(base.slice(0, 25), os.path.join(img_dir, "a.parquet"))
    pq.write_table(base.slice(15, 25), os.path.join(img_dir, "b.parquet"))

    dup_up, dup_del = ids[18], ids[20]
    donor = fixtures.images_table(1, offset=500)
    ups = donor.set_column(0, "image_id",
                           pa.array([dup_up], pa.string()))
    d_tab = pa.table({
        "image_id": pa.array([dup_del], pa.string()),
        "bytes": pa.array([b""], pa.binary()),
        "w": pa.array([0], pa.int32()),
        "h": pa.array([0], pa.int32()),
        "fmt": pa.array([""], pa.string()),
        "caption": pa.array([""], pa.string()),
        "phash": pa.array([0], pa.int64()),
    })
    changes = pa.concat_tables([d_tab, ups]).append_column(
        "__op", pa.array(["D", "U"], pa.string()))

    paths = sorted(glob.glob(os.path.join(img_dir, "*.parquet")))
    per_frag, spill = incremental.route_changes(changes, paths)
    assert spill.num_rows == 0
    # both keys are in both fragments' ranges -> both deltas have both
    assert set(per_frag) == set(paths)
    a_ops = dict(zip(per_frag[paths[0]]["image_id"].to_pylist(),
                     per_frag[paths[0]]["__op"].to_pylist()))
    b_ops = dict(zip(per_frag[paths[1]]["image_id"].to_pylist(),
                     per_frag[paths[1]]["__op"].to_pylist()))
    assert a_ops == {dup_del: "D", dup_up: "U"}
    # non-primary fragment: upsert demoted to delete
    assert b_ops == {dup_del: "D", dup_up: "D"}

    incremental.apply_changefile(img_dir, changes)
    after = _read_tree(os.path.join(img_dir, "*.parquet"))
    assert (after["image_id"] == dup_del).sum() == 0
    got = after[after["image_id"] == dup_up]
    assert len(got) == 1
    assert got["caption"].iloc[0] == donor["caption"][0].as_py()


def test_only_touched_partitions_recompute(incr_run):
    res1 = incr_run["res1"]
    assert res1["stale_partitions"] == ["p00001"]
    assert len(res1["rewritten_fragments"]) == 2  # fragments 2 and 3
    assert res1["spill_fragment"] is not None
    # p00000 + p00002 skipped by the resume anti-join
    assert res1["resumed_skipped"] == 2
    assert res1["partitions"] == 4  # 3 original + pincr-night1


def test_untouched_partition_outputs_byte_identical(incr_run):
    out_dir = incr_run["out_dir"]
    touched = {"p00001", "pincr-night1"}
    for stage, before in incr_run["snap_before"].items():
        after = _snapshot(os.path.join(out_dir, stage))
        for rel, meta in before.items():
            pid = rel.split(os.sep)[0]
            if pid in touched:
                continue
            assert after.get(rel) == meta, (
                f"untouched {stage}/{rel} changed")


def test_deletes_upserts_inserts_visible(incr_run):
    joined = _read_tree(
        os.path.join(incr_run["out_dir"], "joined", "**", "*.parquet"))
    ids = set(joined["image_id"])
    for i in range(165, 170):
        assert f"img{i:09d}" not in ids
    # upserted canonical captions replaced by the donor rows'
    from engine.pipeline.ingest import canonicalize_captions

    donor_caps = canonicalize_captions(
        fixtures.images_table(5, offset=1250)["caption"].combine_chunks())
    up = joined[joined["image_id"].isin(
        [f"img{i:09d}" for i in range(250, 255)])]
    if len(up):  # only rows inside a polygon appear in joined
        want = dict(zip(
            [f"img{i:09d}" for i in range(250, 255)],
            donor_caps.to_pylist()))
        for _, r in up.iterrows():
            assert r["caption_canon"] == want[r["image_id"]]
    # at least one inserted id made it through ingest (valid coords)
    new_ids = {f"img{i:09d}" for i in range(N, N + 20)}
    knn = _read_tree(
        os.path.join(incr_run["out_dir"], "knn", "**", "*.parquet"))
    assert new_ids & set(knn["image_id"])


def test_final_state_equals_full_rerun(incr_run, tmp_path_factory):
    out_dir = incr_run["out_dir"]
    full_dir = str(tmp_path_factory.mktemp("incr_full"))
    plan = incremental.previous_plan(os.path.join(out_dir, "manifest"))
    res_full = flagship.run_flagship(
        incr_run["img_dir"], full_dir, planned=plan, resume=False,
        batch_size=256, zoom=ZOOM)
    assert res_full["joined_rows"] == incr_run["res1"]["joined_rows"]
    assert res_full["knn_rows"] == incr_run["res1"]["knn_rows"]
    for stage in ("joined", "knn"):
        a = _read_tree(os.path.join(out_dir, stage, "**", "*.parquet"))
        b = _read_tree(os.path.join(full_dir, stage, "**", "*.parquet"))
        assert set(a.columns) == set(b.columns)
        # sort on every sortable (non-bytes) column for a total order
        sort_cols = [
            c for c in a.columns
            if not (len(a) and isinstance(a[c].iloc[0], bytes))]
        a = a[sorted(a.columns)].sort_values(sort_cols, ignore_index=True)
        b = b[sorted(b.columns)].sort_values(sort_cols, ignore_index=True)
        pd.testing.assert_frame_equal(a, b)
    ta = _read_tree(os.path.join(out_dir, "tiles", "*.parquet"))
    tb = _read_tree(os.path.join(full_dir, "tiles", "*.parquet"))
    ta = ta.sort_values("tile_key", ignore_index=True)
    tb = tb.sort_values("tile_key", ignore_index=True)
    assert list(ta["tile_key"]) == list(tb["tile_key"])
    assert sorted(ta.columns) == sorted(tb.columns)
    for col in ta.columns:
        va, vb = ta[col].to_numpy(), tb[col].to_numpy()
        if va.dtype == object:  # list / bytes cells
            for x, y in zip(va, vb):
                assert np.array_equal(np.asarray(x), np.asarray(y)), col
        else:
            assert np.array_equal(va, vb), col


def test_second_night_composes(incr_run):
    """Night 2: a changefile touching the night-1 SPILL fragment (its
    footer range now exists) plus a fresh insert must route correctly,
    recompute only the incremental partition, and keep the original
    partitions untouched."""
    out_dir = incr_run["out_dir"]
    img_dir = incr_run["img_dir"]
    snap = {
        stage: _snapshot(os.path.join(out_dir, stage))
        for stage in ("joined", "knn", "tile_partials")
    }
    # delete one night-1 inserted id (lives in the spill fragment) and
    # insert 5 more beyond it
    d_ids = [f"img{N + 3:09d}"]
    d_tab = fixtures.images_table(1, offset=0).slice(0, 1).set_column(
        0, "image_id", pa.array(d_ids, pa.string()))
    ins = fixtures.images_table(5, offset=N + 100)
    ch = pa.concat_tables([d_tab, ins]).append_column(
        "__op", pa.array(["D"] + ["U"] * 5, pa.string()))
    res2 = incremental.run_incremental_update(
        img_dir, out_dir, ch, run_id="night2",
        batch_size=256, zoom=ZOOM)
    # only the night-1 spill partition is stale; plus one new partition
    assert res2["stale_partitions"] == ["pincr-night1"]
    assert res2["spill_fragment"].endswith("images-incr-night2.parquet")
    touched = {"pincr-night1", "pincr-night2"}
    for stage, before in snap.items():
        after = _snapshot(os.path.join(out_dir, stage))
        for rel, meta in before.items():
            pid = rel.split(os.sep)[0]
            if pid in touched:
                continue
            assert after.get(rel) == meta, (
                f"untouched {stage}/{rel} changed on night 2")
    # the deleted night-1 insert is gone; night-2 inserts visible
    knn = _read_tree(
        os.path.join(out_dir, "knn", "**", "*.parquet"))
    ids = set(knn["image_id"])
    assert f"img{N + 3:09d}" not in ids
    assert {f"img{i:09d}" for i in range(N + 100, N + 105)} & ids


def test_stale_rows_preserve_lineage(tmp_path):
    """Crash window: invalidation overwrites manifest rows BEFORE the
    recompute runs. The stale rows must keep their fragment lists so
    previous_plan (and a retried incremental run) still sees the full
    plan."""
    from engine.pipeline import manifest

    man = str(tmp_path / "manifest")
    plan = {"p00000": ["/a/f0.parquet", "/a/f1.parquet"],
            "p00001": ["/a/f2.parquet"]}
    for pid, frags in plan.items():
        manifest.write_manifest_row(
            man, partition_id=pid, stage="join",
            input_fragment_ids=frags, row_count=10)
    incremental.invalidate_partitions(man, {"p00001"}, plan)
    got = incremental.previous_plan(man)
    assert got == plan  # stale row kept p00001's fragments
    # and the resume planner schedules exactly the stale partition
    todo = manifest.plan_resume(man, "join", plan)
    assert set(todo) == {"p00001"}
