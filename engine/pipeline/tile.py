"""Raster↔vector tiling: slippy-map tiles composed from decoded images.

Reproduces the reference's per-area map/marker materialization
(SURVEY.md A1/T3/S4) as a Ray-Data-native four-stage pipeline over the
indexed images table:

1. ``add_tile_keys``   stateless map_batches: web-mercator (z, x, y)
                       tile per row + pixel position inside the tile.
2. ``ThumbDecoder``    ACTOR-POOL map_batches (per-actor codec state,
                       BASELINE.json:6): decodes ``bytes`` per ``fmt``
                       and emits a fixed-size thumbnail — so the only
                       shuffle that follows moves 768-byte thumbs, not
                       full images.
3. salted compose      groupby((tile_key, salt)) -> map_groups paints a
                       partial tile raster. ``salt`` fans hot tiles out
                       into ``ceil(count/C)`` sub-groups, sized by a
                       cheap bytes-free count pre-pass (SURVEY.md §4.2).
4. merge               groupby(tile_key) -> map_groups merges partial
                       rasters with an associative owner-wins rule
                       (per-pixel max of paint order key), then encodes
                       ``tile_bytes`` (raw16) + sorted member list.

Compose is associative+commutative by construction, so phase 3/4 order
never affects output — required for exact per-tile parity
(BASELINE.json:2) under parallel execution.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from engine import codec

TILE_SIZE = 256
THUMB = 16
DEFAULT_ZOOM = 8
DEFAULT_GROUP_CAP = 4096


def lonlat_to_tile(lon, lat, zoom: int):
    """Web-mercator slippy tile indices + in-tile pixel position (public
    OSM slippy-map formula)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.0511, 85.0511)
    n = float(1 << zoom)
    xf = (lon + 180.0) / 360.0 * n
    phi = np.deg2rad(lat)
    yf = (1.0 - np.arcsinh(np.tan(phi)) / np.pi) / 2.0 * n
    tx = np.minimum(np.floor(xf), n - 1).astype(np.int32)
    ty = np.minimum(np.floor(yf), n - 1).astype(np.int32)
    px = np.clip(((xf - tx) * TILE_SIZE).astype(np.int32), 0, TILE_SIZE - 1)
    py = np.clip(((yf - ty) * TILE_SIZE).astype(np.int32), 0, TILE_SIZE - 1)
    return tx, ty, px, py


def tile_key(tx: np.ndarray, ty: np.ndarray, zoom: int) -> np.ndarray:
    """(z, x, y) packed into one int64 groupby key."""
    return (
        (np.int64(zoom) << np.int64(52))
        | (tx.astype(np.int64) << np.int64(26))
        | ty.astype(np.int64)
    )


def unpack_tile_key(key: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    key = np.asarray(key, dtype=np.int64)
    return (
        (key >> np.int64(52)).astype(np.int32),
        ((key >> np.int64(26)) & np.int64((1 << 26) - 1)).astype(np.int32),
        (key & np.int64((1 << 26) - 1)).astype(np.int32),
    )


def add_tile_keys(batch: pa.Table, zoom: int = DEFAULT_ZOOM) -> pa.Table:
    lon = np.asarray(batch["lon"], dtype=np.float64)
    lat = np.asarray(batch["lat"], dtype=np.float64)
    tx, ty, px, py = lonlat_to_tile(lon, lat, zoom)
    batch = batch.append_column("tile_key", pa.array(tile_key(tx, ty, zoom), pa.int64()))
    batch = batch.append_column("px", pa.array(px, pa.int32()))
    batch = batch.append_column("py", pa.array(py, pa.int32()))
    return batch


class ThumbDecoder:
    """Actor-pool decode stage (T3): bytes/fmt -> THUMBxTHUMB thumbnail.

    Per-actor codec state (DCT bases, scratch) lives in ``__init__``;
    each ``__call__`` decodes a batch and REPLACES the wide ``bytes``
    column with a fixed 768-byte thumb, so downstream shuffles are
    cheap. Also emits ``paint_order``: the numeric image id used as the
    deterministic owner-wins key.
    """

    def __init__(self):
        # instantiate codec tables once per actor
        from engine.codec.image import _DCT8, _dct_matrix  # noqa: F401
        from engine.codec.phash import _resize_area

        self._resize = _resize_area

    def __call__(self, batch: pa.Table) -> pa.Table:
        datas = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        thumbs = []
        for d, f in zip(datas, fmts):
            px = codec.decode(d, f).astype(np.float64)
            t = np.stack(
                [self._resize(px[:, :, c], THUMB) for c in range(px.shape[2])], axis=2
            )
            thumbs.append(np.clip(np.rint(t), 0, 255).astype(np.uint8).tobytes())
        ids = batch["image_id"].to_pylist()
        paint = np.array([int(s[3:]) for s in ids], dtype=np.int64)
        cols = {name: batch[name] for name in batch.column_names if name != "bytes"}
        cols["thumb"] = pa.array(thumbs, pa.binary())
        cols["paint_order"] = pa.array(paint, pa.int64())
        return pa.table(cols)


def _paint(
    canvas: np.ndarray, owner: np.ndarray, thumbs, pxs, pys, paint_orders
) -> None:
    """Paint thumbs onto (canvas, owner) with owner-wins-by-max rule."""
    half = THUMB // 2
    for t, cx, cy, po in zip(thumbs, pxs, pys, paint_orders):
        img = np.frombuffer(t, dtype=np.uint8).reshape(THUMB, THUMB, 3)
        x0, y0 = int(cx) - half, int(cy) - half
        sx0, sy0 = max(0, -x0), max(0, -y0)
        x0, y0 = max(0, x0), max(0, y0)
        x1 = min(TILE_SIZE, x0 + THUMB - sx0)
        y1 = min(TILE_SIZE, y0 + THUMB - sy0)
        if x1 <= x0 or y1 <= y0:
            continue
        sub_o = owner[y0:y1, x0:x1]
        win = po > sub_o
        sub_o[win] = po
        canvas[y0:y1, x0:x1][win] = img[sy0 : sy0 + (y1 - y0), sx0 : sx0 + (x1 - x0)][win]


SPARSE_LIMIT = 256
_PARTIAL_SCHEMA = pa.schema(
    [
        ("tile_key", pa.int64()),
        ("kind", pa.string()),        # "canvas" | "draw"
        ("canvas", pa.binary()),      # zlib(uint8 256*256*3), canvas rows
        ("owner", pa.binary()),       # zlib(int64 256*256), canvas rows
        ("members", pa.list_(pa.string())),
        ("thumb", pa.binary()),       # draw rows
        ("px", pa.int32()),
        ("py", pa.int32()),
        ("paint_order", pa.int64()),
        ("image_id", pa.string()),
    ]
)


def compose_partial(group: pa.Table) -> pa.Table:
    """One (tile_key, salt) group -> partial rows.

    Hot groups (> SPARSE_LIMIT draws) are pre-composed into one
    zlib-compressed raster+owner partial (the salted-shuffle payoff);
    cold groups pass through as sparse draw rows — composing a dense
    720KB canvas for a 10-image tile would inflate the shuffle instead
    of shrinking it.
    """
    import zlib

    key = group["tile_key"][0].as_py()
    n = group.num_rows
    if n <= SPARSE_LIMIT:
        return pa.table(
            {
                "tile_key": pa.array(np.full(n, key), pa.int64()),
                "kind": pa.array(["draw"] * n),
                "canvas": pa.array([None] * n, pa.binary()),
                "owner": pa.array([None] * n, pa.binary()),
                "members": pa.array([None] * n, pa.list_(pa.string())),
                "thumb": group["thumb"],
                "px": group["px"],
                "py": group["py"],
                "paint_order": group["paint_order"],
                "image_id": group["image_id"],
            },
            schema=_PARTIAL_SCHEMA,
        )
    canvas = np.zeros((TILE_SIZE, TILE_SIZE, 3), dtype=np.uint8)
    owner = np.full((TILE_SIZE, TILE_SIZE), -1, dtype=np.int64)
    po = np.asarray(group["paint_order"], dtype=np.int64)
    _paint(
        canvas, owner,
        group["thumb"].to_pylist(),
        np.asarray(group["px"]), np.asarray(group["py"]), po,
    )
    members = sorted(group["image_id"].to_pylist())
    return pa.table(
        {
            "tile_key": pa.array([key], pa.int64()),
            "kind": pa.array(["canvas"]),
            "canvas": pa.array([zlib.compress(canvas.tobytes(), 1)], pa.binary()),
            "owner": pa.array([zlib.compress(owner.tobytes(), 1)], pa.binary()),
            "members": pa.array([members], pa.list_(pa.string())),
            "thumb": pa.array([None], pa.binary()),
            "px": pa.array([None], pa.int32()),
            "py": pa.array([None], pa.int32()),
            "paint_order": pa.array([None], pa.int64()),
            "image_id": pa.array([None], pa.string()),
        },
        schema=_PARTIAL_SCHEMA,
    )


def merge_partials(group: pa.Table, zoom: int) -> pa.Table:
    """All partials of one tile -> final tile row.

    Associative+commutative: canvas partials merge by per-pixel owner
    max; draw rows paint with the same owner-wins rule, so any merge
    order yields identical pixels."""
    import zlib

    canvas = np.zeros((TILE_SIZE, TILE_SIZE, 3), dtype=np.uint8)
    owner = np.full((TILE_SIZE, TILE_SIZE), -1, dtype=np.int64)
    members: list[str] = []
    kinds = group["kind"].to_pylist()
    for i in range(group.num_rows):
        if kinds[i] != "canvas":
            continue
        c = np.frombuffer(
            zlib.decompress(group["canvas"][i].as_py()), np.uint8
        ).reshape(TILE_SIZE, TILE_SIZE, 3)
        o = np.frombuffer(
            zlib.decompress(group["owner"][i].as_py()), np.int64
        ).reshape(TILE_SIZE, TILE_SIZE)
        win = o > owner
        owner[win] = o[win]
        canvas[win] = c[win]
        members.extend(group["members"][i].as_py())
    draw_ix = [i for i, kd in enumerate(kinds) if kd == "draw"]
    if draw_ix:
        sub = group.take(pa.array(draw_ix, pa.int64()))
        _paint(
            canvas, owner,
            sub["thumb"].to_pylist(),
            np.asarray(sub["px"]), np.asarray(sub["py"]),
            np.asarray(sub["paint_order"], dtype=np.int64),
        )
        members.extend(sub["image_id"].to_pylist())
    members.sort()
    key = group["tile_key"][0].as_py()
    z, x, y = unpack_tile_key(np.array([key]))
    return pa.table(
        {
            "z": pa.array([int(z[0])], pa.int32()),
            "x": pa.array([int(x[0])], pa.int32()),
            "y": pa.array([int(y[0])], pa.int32()),
            "tile_key": pa.array([key], pa.int64()),
            "tile_bytes": pa.array(
                [codec.encode(canvas, "raw16")], pa.binary()
            ),
            "n_images": pa.array([len(members)], pa.int64()),
            "members": pa.array([members], pa.list_(pa.string())),
        }
    )


def hot_tile_salts(
    keyed_counts: dict[int, int], group_cap: int = DEFAULT_GROUP_CAP
) -> dict[int, int]:
    """tile_key -> salt fan-out S for tiles exceeding the group cap."""
    return {
        k: int(np.ceil(c / group_cap)) for k, c in keyed_counts.items() if c > group_cap
    }


def add_salt(batch: pa.Table, hot: dict[int, int]) -> pa.Table:
    keys = np.asarray(batch["tile_key"], dtype=np.int64)
    salt = np.zeros(len(keys), dtype=np.int64)
    if hot:
        po = np.asarray(batch["paint_order"], dtype=np.int64)
        for k, s in hot.items():
            m = keys == k
            salt[m] = po[m] % s
    return batch.append_column(
        "salt_key", pa.array(keys * np.int64(64) + salt, pa.int64())
    )


def run_tiling(
    ds_thumbed: ray.data.Dataset,
    *,
    zoom: int = DEFAULT_ZOOM,
    hot: dict[int, int] | None = None,
    group_cap: int = DEFAULT_GROUP_CAP,
) -> ray.data.Dataset:
    """thumb-decoded, tile-keyed dataset -> tiles dataset.

    ``hot`` is the tile_key->fanout dict from the bytes-free pre-pass
    (``count_tiles``); pass None to skip salting (small runs).
    """
    hot = hot or {}
    ds = ds_thumbed.map_batches(
        lambda b: add_salt(b, hot), batch_format="pyarrow"
    )
    partials = ds.groupby("salt_key").map_groups(
        compose_partial, batch_format="pyarrow"
    )
    return partials.groupby("tile_key").map_groups(
        lambda g: merge_partials(g, zoom), batch_format="pyarrow"
    )


def count_tiles(images_uri, zoom: int = DEFAULT_ZOOM) -> dict[int, int]:
    """Bytes-free pre-pass: tile_key -> row count (drives salt fan-out).

    Reads ONLY image_id (geotags derive from it), so the scan never
    touches the binary column (SURVEY.md §4.2 step 1).
    """
    from engine.io import read_images
    from engine.pipeline.ingest import derive_geotags

    def keys_only(batch: pa.Table) -> pa.Table:
        lon, lat = derive_geotags(batch["image_id"])
        tx, ty, _, _ = lonlat_to_tile(lon, lat, zoom)
        return pa.table({"tile_key": pa.array(tile_key(tx, ty, zoom), pa.int64())})

    counts = (
        read_images(images_uri, columns=["image_id"])
        .map_batches(keys_only, batch_format="pyarrow")
        .groupby("tile_key")
        .count()
        .take_all()
    )
    return {int(r["tile_key"]): int(r["count()"]) for r in counts}
