"""Pipeline-spec surface (SURVEY §2.9): declarative run == direct run,
and both execution modes produce identical joined/tile outputs."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from engine import fixtures
from engine.pipeline import spec as spec_mod


def _joined_set(out_dir):
    rows = set()
    for f in glob.glob(os.path.join(out_dir, "joined", "*", "*.parquet")):
        t = pq.read_table(f, columns=["image_id", "admin_id"])
        rows.update(zip(t["image_id"].to_pylist(), t["admin_id"].to_pylist()))
    return rows


def _tiles(out_dir):
    out = {}
    for f in glob.glob(os.path.join(out_dir, "tiles", "*.parquet")):
        t = pq.read_table(f, columns=["tile_key", "n_images", "tile_bytes"])
        for k, n, b in zip(
            t["tile_key"].to_pylist(), t["n_images"].to_pylist(),
            t["tile_bytes"].to_pylist(),
        ):
            out[k] = (n, b)
    return out


@pytest.fixture(scope="module")
def img_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spec_imgs"))
    fixtures.write_images_parquet(500, d, num_files=4)
    return d


def test_spec_validation(img_dir, tmp_path):
    with pytest.raises(ValueError, match="unknown spec keys"):
        spec_mod.validate_spec({"source": img_dir, "out": "/tmp/x", "bogus": 1})
    with pytest.raises(ValueError, match="requires 'out'"):
        spec_mod.validate_spec({"source": img_dir})
    with pytest.raises(ValueError, match="mode"):
        spec_mod.validate_spec({"source": img_dir, "out": "/tmp/x", "mode": "turbo"})


def test_fused_and_staged_modes_agree(img_dir, tmp_path):
    out_f = str(tmp_path / "fused")
    out_s = str(tmp_path / "staged")
    r1 = spec_mod.run_spec(
        {"source": img_dir, "out": out_f, "partitions": 2, "mode": "fused"}
    )
    r2 = spec_mod.run_spec(
        {"source": img_dir, "out": out_s, "partitions": 2, "mode": "staged"}
    )
    assert r1["joined_rows"] == r2["joined_rows"] > 0
    assert _joined_set(out_f) == _joined_set(out_s)
    t_f, t_s = _tiles(out_f), _tiles(out_s)
    assert set(t_f) == set(t_s)
    for k in t_f:  # pixel-identical tiles across execution modes
        assert t_f[k] == t_s[k], f"tile {k} differs between modes"
