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

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from engine import codec

TILE_SIZE = 256
THUMB = 16
DEFAULT_ZOOM = 8
DEFAULT_GROUP_CAP = 16384


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


def thumb_decode_batch(batch: pa.Table) -> pa.Table:
    """Decode kernel: bytes/fmt -> THUMBxTHUMB thumbnail columns.

    Vectorized per (header) shape group: same-shape payloads decode as
    one numpy stack and resize in one batched area-mean (bit-identical
    to the per-image path — tile pixel parity holds). REPLACES the wide
    ``bytes`` column with a fixed 768-byte thumb so downstream shuffles
    are cheap; emits ``paint_order`` (numeric image id), the
    deterministic owner-wins key."""
    from collections import defaultdict

    from engine.codec.image import decode_same_shape, header
    from engine.codec.phash import _resize_area_batch

    datas = batch["bytes"].to_pylist()
    n = len(datas)
    thumbs: list[bytes | None] = [None] * n
    groups: dict[tuple, list[int]] = defaultdict(list)
    for ix, d in enumerate(datas):
        groups[header(d)].append(ix)
    for (magic, w, h, c), ixs in groups.items():
        # keep float64 scratch within L2-ish (~1MB working set): the
        # decode+resize chain is memory-bound, and with num_cpus
        # concurrent tasks a large scratch saturates memory bandwidth
        # (measured 20x inflation vs single-task at 32 workers)
        chunk = max(4, 120_000 // max(1, w * h))
        for s in range(0, len(ixs), chunk):
            part = ixs[s : s + chunk]
            stack = decode_same_shape([datas[i] for i in part], magic, w, h, c)
            # uint8 goes in directly: the divisible-dims block-mean path
            # sums integers without materializing a float64 image copy
            small = _resize_area_batch(stack, THUMB)
            tb = np.clip(np.rint(small), 0, 255).astype(np.uint8)
            for j, i in enumerate(part):
                thumbs[i] = tb[j].tobytes()
    ids = batch["image_id"].to_pylist()
    paint = np.array([int(s[3:]) for s in ids], dtype=np.int64)
    cols = {name: batch[name] for name in batch.column_names if name != "bytes"}
    cols["thumb"] = pa.array(thumbs, pa.binary())
    cols["paint_order"] = pa.array(paint, pa.int64())
    return pa.table(cols)


class ThumbDecoder:
    """Actor-pool decode stage (T3): bytes/fmt -> THUMBxTHUMB thumbnail.

    Per-actor codec state (DCT bases, scratch) lives in ``__init__``;
    each ``__call__`` runs ``thumb_decode_batch``. The same kernel runs
    as plain tasks when the caller prefers warm-worker reuse over actor
    pools (short executions; see ``engine.state``).
    """

    def __init__(self):
        # instantiate codec tables once per actor
        from engine.codec.image import _DCT8, _dct_matrix  # noqa: F401
        from engine.codec.phash import _resize_area  # noqa: F401

    def __call__(self, batch: pa.Table) -> pa.Table:
        return thumb_decode_batch(batch)


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


_PACK_SCHEMA = pa.schema(
    [
        ("tile_key", pa.int64()),
        ("salt_key", pa.int64()),
        ("n", pa.int32()),
        ("thumbs", pa.binary()),       # n * THUMB*THUMB*3 uint8, concatenated
        ("px", pa.binary()),           # n int32
        ("py", pa.binary()),           # n int64? no: int32
        ("paint_order", pa.binary()),  # n int64
        ("members", pa.list_(pa.string())),
    ]
)

_THUMB_BYTES = THUMB * THUMB * 3


def pack_draws_batch(batch: pa.Table) -> pa.Table:
    """Shuffle-free combiner: draws -> one packed row per salt_key.

    Groups a thumb-decoded, salted batch by ``salt_key`` and emits ONE
    row per group carrying the concatenated thumbs + positions. Packing
    is what lets a partition pipeline stay a pure stream (read -> map ->
    write, no sort barrier): row count drops ~batch/tiles-fold while
    bytes stay the same, so the later global compose shuffle sorts few,
    fat rows. Compose order is irrelevant (owner-wins paint is
    associative+commutative), so packing cannot change final pixels."""
    n = batch.num_rows
    keys = np.asarray(batch["salt_key"], dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    bounds = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]]) if n else np.empty(0, np.int64)
    thumbs = batch["thumb"].to_pylist()
    ids = batch["image_id"].to_pylist()
    px = np.asarray(batch["px"], dtype=np.int32)
    py = np.asarray(batch["py"], dtype=np.int32)
    po = np.asarray(batch["paint_order"], dtype=np.int64)
    tk = np.asarray(batch["tile_key"], dtype=np.int64)
    o_tk, o_sk, o_n, o_th, o_px, o_py, o_po, o_m = [], [], [], [], [], [], [], []
    for gi, start in enumerate(bounds):
        end = bounds[gi + 1] if gi + 1 < len(bounds) else n
        ix = order[start:end]
        o_tk.append(int(tk[ix[0]]))
        o_sk.append(int(sk[start]))
        o_n.append(len(ix))
        o_th.append(b"".join(thumbs[i] for i in ix))
        o_px.append(px[ix].tobytes())
        o_py.append(py[ix].tobytes())
        o_po.append(po[ix].tobytes())
        o_m.append([ids[i] for i in ix])
    return pa.table(
        {
            "tile_key": pa.array(o_tk, pa.int64()),
            "salt_key": pa.array(o_sk, pa.int64()),
            "n": pa.array(o_n, pa.int32()),
            "thumbs": pa.array(o_th, pa.binary()),
            "px": pa.array(o_px, pa.binary()),
            "py": pa.array(o_py, pa.binary()),
            "paint_order": pa.array(o_po, pa.binary()),
            "members": pa.array(o_m, pa.list_(pa.string())),
        },
        schema=_PACK_SCHEMA,
    )


def _paint_vectorized(
    canvas: np.ndarray, owner: np.ndarray,
    thumbs: np.ndarray, pxs: np.ndarray, pys: np.ndarray, pos: np.ndarray,
) -> None:
    """Paint a draw set onto an EMPTY-or-partial canvas, owner-wins.

    Equivalent to ``_paint``: draws are sorted ascending by paint_order,
    so an unconditional scatter (numpy duplicate-index assignment keeps
    the LAST value) realizes max-owner-wins for the in-bounds majority;
    edge-clipped draws fall back to the masked per-thumb path."""
    order = np.argsort(pos, kind="stable")
    thumbs, pxs, pys, pos = thumbs[order], pxs[order], pys[order], pos[order]
    half = THUMB // 2
    x0 = pxs.astype(np.int64) - half
    y0 = pys.astype(np.int64) - half
    inb = (x0 >= 0) & (y0 >= 0) & (x0 + THUMB <= TILE_SIZE) & (y0 + THUMB <= TILE_SIZE)
    vi = np.flatnonzero(inb)
    if len(vi):
        d = np.arange(THUMB, dtype=np.int64)
        fy = y0[vi, None, None] + d[None, :, None]
        fx = x0[vi, None, None] + d[None, None, :]
        flat = (fy * TILE_SIZE + fx).reshape(-1)
        # existing owners may beat these draws only where owner > po —
        # possible when painting onto a pre-painted canvas; mask those
        prev = owner.reshape(-1)[flat]
        po_rep = np.repeat(pos[vi], THUMB * THUMB)
        win = po_rep > prev
        canvas.reshape(-1, 3)[flat[win]] = thumbs[vi].reshape(-1, 3)[win]
        owner.reshape(-1)[flat[win]] = po_rep[win]
    ci = np.flatnonzero(~inb)
    if len(ci):
        _paint(
            canvas, owner, [thumbs[i].tobytes() for i in ci],
            pxs[ci], pys[ci], pos[ci],
        )


def compose_pack_group(group: pa.Table) -> pa.Table:
    """All packed rows of one (tile, salt) -> one partial row.

    Dense canvas when the group carries enough draws to amortize the
    raster (> SPARSE_LIMIT); otherwise unpacked sparse draw rows — a
    3-image tile's partial should be 2KB, not a 720KB raster. Both row
    kinds flow into ``merge_partials`` unchanged."""
    import zlib

    key = group["tile_key"][0].as_py()
    thumbs = np.frombuffer(
        b"".join(group["thumbs"].to_pylist()), np.uint8
    ).reshape(-1, THUMB, THUMB, 3)
    px = np.concatenate(
        [np.frombuffer(b, np.int32) for b in group["px"].to_pylist()]
    )
    py = np.concatenate(
        [np.frombuffer(b, np.int32) for b in group["py"].to_pylist()]
    )
    po = np.concatenate(
        [np.frombuffer(b, np.int64) for b in group["paint_order"].to_pylist()]
    )
    members: list[str] = []
    for m in group["members"].to_pylist():
        members.extend(m)
    n = len(po)
    if n <= SPARSE_LIMIT:  # sparse pass-through as draw rows
        return pa.table(
            {
                "tile_key": pa.array(np.full(n, key), pa.int64()),
                "kind": pa.array(["draw"] * n),
                "canvas": pa.array([None] * n, pa.binary()),
                "owner": pa.array([None] * n, pa.binary()),
                "members": pa.array([None] * n, pa.list_(pa.string())),
                "thumb": pa.array([thumbs[j].tobytes() for j in range(n)], pa.binary()),
                "px": pa.array(px, pa.int32()),
                "py": pa.array(py, pa.int32()),
                "paint_order": pa.array(po, pa.int64()),
                "image_id": pa.array(members, pa.string()),
            },
            schema=_PARTIAL_SCHEMA,
        )
    canvas = np.zeros((TILE_SIZE, TILE_SIZE, 3), dtype=np.uint8)
    owner = np.full((TILE_SIZE, TILE_SIZE), -1, dtype=np.int64)
    _paint_vectorized(canvas, owner, thumbs, px, py, po)
    members.sort()
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


def _finalize_tile(key: int, canvas, owner, members: list[str], zoom: int) -> dict:
    members.sort()
    z, x, y = unpack_tile_key(np.array([key]))
    return {
        "z": int(z[0]), "x": int(x[0]), "y": int(y[0]), "tile_key": int(key),
        "tile_bytes": codec.encode(canvas, "raw16"),
        "n_images": len(members), "members": members,
    }


def merge_pack_shards(
    shard_files: dict[str, list[str]], out_dir: str, zoom: int
) -> int:
    """Tile merge over PRE-SHARDED packs: partition executions scatter
    pack rows into ``s<k>`` subdirs by ``tile_key % K`` at write time,
    so merge task k reads exactly its own rows — no shuffle AND no
    read amplification. One raw Ray task per shard paints its tiles
    (owner-wins accumulation; no salting needed — no group is ever
    materialized) and writes ``tiles-<shard>.parquet``."""
    import ray

    @ray.remote
    def shard_task(sname: str, files: list[str]) -> int:
        import pyarrow.parquet as pq

        state: dict[int, list] = {}
        for f in files:
            t = pq.read_table(f)
            keys = np.asarray(t["tile_key"], dtype=np.int64)
            for i in range(t.num_rows):
                key = int(keys[i])
                st = state.get(key)
                if st is None:
                    st = state[key] = [
                        np.zeros((TILE_SIZE, TILE_SIZE, 3), np.uint8),
                        np.full((TILE_SIZE, TILE_SIZE), -1, np.int64),
                        [],
                    ]
                thumbs = np.frombuffer(
                    t["thumbs"][i].as_py(), np.uint8
                ).reshape(-1, THUMB, THUMB, 3)
                _paint_vectorized(
                    st[0], st[1], thumbs,
                    np.frombuffer(t["px"][i].as_py(), np.int32),
                    np.frombuffer(t["py"][i].as_py(), np.int32),
                    np.frombuffer(t["paint_order"][i].as_py(), np.int64),
                )
                st[2].extend(t["members"][i].as_py())
        if not state:
            return 0
        rows = [
            _finalize_tile(key, st[0], st[1], st[2], zoom)
            for key, st in sorted(state.items())
        ]
        out = pa.table(
            {
                "z": pa.array([r["z"] for r in rows], pa.int32()),
                "x": pa.array([r["x"] for r in rows], pa.int32()),
                "y": pa.array([r["y"] for r in rows], pa.int32()),
                "tile_key": pa.array([r["tile_key"] for r in rows], pa.int64()),
                "tile_bytes": pa.array([r["tile_bytes"] for r in rows], pa.binary()),
                "n_images": pa.array([r["n_images"] for r in rows], pa.int64()),
                "members": pa.array([r["members"] for r in rows], pa.list_(pa.string())),
            }
        )
        pq.write_table(out, os.path.join(out_dir, f"tiles-{sname}.parquet"))
        return out.num_rows

    os.makedirs(out_dir, exist_ok=True)
    return sum(
        ray.get(
            [shard_task.remote(s, fs) for s, fs in sorted(shard_files.items())]
        )
    )


def merge_packs_sharded(
    pack_files: list[str], out_dir: str, zoom: int, num_shards: int
) -> int:
    """Shuffle-free tile merge: K raw Ray tasks, task k owns tiles with
    ``tile_key % K == k``. Each task streams EVERY pack file, filters to
    its tiles, paints into per-tile accumulators (owner-wins — order
    across files is irrelevant), and writes its own ``tiles-k.parquet``.

    Trade-off (documented per SURVEY §2.9 custom-operator rules): reads
    the partial table K times instead of shuffling it once. Partials are
    ~#tiles-sized — orders of magnitude smaller than the image table —
    so K reads of a small table beat a sort shuffle's barrier + block
    fragmentation (measured 3-6x on the flagship merge). At larger
    scale, write partials partitioned by tile range and prune the reads.
    Skew needs no salting here: accumulation never materializes a
    group.
    """
    import ray

    @ray.remote
    def shard_task(k: int) -> int:
        import pyarrow as pa  # noqa: F401
        import pyarrow.parquet as pq

        state: dict[int, list] = {}  # tile_key -> [canvas, owner, members]
        for f in pack_files:
            t = pq.read_table(f)
            keys = np.asarray(t["tile_key"], dtype=np.int64)
            for i in np.flatnonzero(keys % num_shards == k):
                key = int(keys[i])
                st = state.get(key)
                if st is None:
                    st = state[key] = [
                        np.zeros((TILE_SIZE, TILE_SIZE, 3), np.uint8),
                        np.full((TILE_SIZE, TILE_SIZE), -1, np.int64),
                        [],
                    ]
                if "thumbs" in t.column_names:  # pack row
                    thumbs = np.frombuffer(
                        t["thumbs"][i].as_py(), np.uint8
                    ).reshape(-1, THUMB, THUMB, 3)
                    _paint_vectorized(
                        st[0], st[1], thumbs,
                        np.frombuffer(t["px"][i].as_py(), np.int32),
                        np.frombuffer(t["py"][i].as_py(), np.int32),
                        np.frombuffer(t["paint_order"][i].as_py(), np.int64),
                    )
                    st[2].extend(t["members"][i].as_py())
        if not state:
            return 0
        rows = [
            _finalize_tile(key, st[0], st[1], st[2], zoom)
            for key, st in sorted(state.items())
        ]
        out = pa.table(
            {
                "z": pa.array([r["z"] for r in rows], pa.int32()),
                "x": pa.array([r["x"] for r in rows], pa.int32()),
                "y": pa.array([r["y"] for r in rows], pa.int32()),
                "tile_key": pa.array([r["tile_key"] for r in rows], pa.int64()),
                "tile_bytes": pa.array([r["tile_bytes"] for r in rows], pa.binary()),
                "n_images": pa.array([r["n_images"] for r in rows], pa.int64()),
                "members": pa.array([r["members"] for r in rows], pa.list_(pa.string())),
            }
        )
        pq.write_table(out, os.path.join(out_dir, f"tiles-{k:05d}.parquet"))
        return out.num_rows

    os.makedirs(out_dir, exist_ok=True)
    return sum(ray.get([shard_task.remote(k) for k in range(num_shards)]))


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
    touches the binary column (SURVEY.md §4.2 step 1). Partial counts
    per batch (combiner), merged on the driver — the result is at most
    #tiles × #blocks rows, so no shuffle is ever needed.
    """
    from engine.io import read_images
    from engine.pipeline.ingest import derive_geotags

    def keys_count(batch: pa.Table) -> pa.Table:
        lon, lat = derive_geotags(batch["image_id"])
        tx, ty, _, _ = lonlat_to_tile(lon, lat, zoom)
        u, c = np.unique(tile_key(tx, ty, zoom), return_counts=True)
        return pa.table(
            {"tile_key": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    parts = (
        read_images(images_uri, columns=["image_id"])
        .map_batches(keys_count, batch_format="pyarrow", batch_size=65536)
        .to_pandas()  # small: <= #tiles x #blocks partial rows
    )
    agg = parts.groupby("tile_key")["n"].sum()
    return {int(k): int(v) for k, v in agg.items()}


# --------------------------------------------------------------- tile pyramid

def build_parent_tiles(tiles: ray.data.Dataset, zoom: int) -> ray.data.Dataset:
    """One pyramid step: zoom ``z`` tiles -> zoom ``z-1`` tiles, each
    parent composed from its <=4 children (2x2 box-downsample into the
    matching quadrant — the associative overzoom cascade a slippy map
    serves between rendered levels). Shuffle key = parent tile_key;
    groups are <=4 rows, so the exchange moves each tile once and the
    whole pyramid costs sum_z(tiles_z) tile moves. Missing children
    leave black (zero) quadrants, matching an empty-cell render."""

    def add_parent(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        pk = tile_key(
            (x // 2).astype(np.int64), (y // 2).astype(np.int64), zoom - 1
        )
        return batch.append_column("parent_key", pa.array(pk, pa.int64()))

    def compose_parent(group: pd.DataFrame) -> pd.DataFrame:
        canvas = np.zeros((TILE_SIZE, TILE_SIZE, 3), dtype=np.uint8)
        members: set[str] = set()
        n = 0
        for _, row in group.iterrows():
            child = codec.decode(row["tile_bytes"], "raw16")
            # 2x2 box mean, computed in uint16 to avoid overflow
            small = (
                child.astype(np.uint16)
                .reshape(TILE_SIZE // 2, 2, TILE_SIZE // 2, 2, 3)
                .mean(axis=(1, 3))
                .astype(np.uint8)
            )
            qx = (int(row["x"]) % 2) * (TILE_SIZE // 2)
            qy = (int(row["y"]) % 2) * (TILE_SIZE // 2)
            canvas[qy:qy + TILE_SIZE // 2, qx:qx + TILE_SIZE // 2] = small
            members.update(row["members"])
            n += int(row["n_images"])
        key = int(group["parent_key"].iloc[0])
        z, x, y = unpack_tile_key(np.array([key]))
        return pd.DataFrame([{
            "z": int(z[0]), "x": int(x[0]), "y": int(y[0]),
            "tile_key": key,
            "tile_bytes": codec.encode(canvas, "raw16"),
            "n_images": n, "members": sorted(members),
        }])

    return (
        tiles.map_batches(add_parent, batch_format="pyarrow")
        .groupby("parent_key")
        .map_groups(compose_parent, batch_format="pandas")
    )


def build_pyramid(
    tiles: ray.data.Dataset, zoom: int, min_zoom: int
) -> dict[int, ray.data.Dataset]:
    """Cascade ``build_parent_tiles`` from ``zoom`` down to
    ``min_zoom``; returns {z: tiles_z}. Each level is its own (lazy)
    Dataset so sinks can write levels as they materialize."""
    out = {zoom: tiles}
    cur = tiles
    for z in range(zoom, min_zoom, -1):
        cur = build_parent_tiles(cur, z)
        out[z - 1] = cur
    return out


def compact_tiles(
    pts: "ray.data.Dataset",
    zoom: int = 9,
    min_zoom: int = 6,
) -> pd.DataFrame:
    """H3-``compact``-analog on the slippy pyramid: the minimal
    mixed-zoom tile set covering exactly the occupied base-``zoom``
    tiles — every parent whose 4 children are fully covered replaces
    them, recursively (a cell is emitted iff it is fully covered and
    its parent is not). The distributed step is the keys-only DISTINCT
    of occupied base tiles; the upward fold runs on the driver over
    at most 4^zoom keys — bounded by the GRID, not the data (z12
    worldwide is <=16.7M ints), the same driver-side-small contract as
    the dimension-table folds. Deeper-than-grid-bound zooms would swap
    the fold for per-level ``sum_final`` rounds."""
    from engine.ops import relational

    def keys(b: pd.DataFrame) -> pd.DataFrame:
        tx, ty, _, _ = lonlat_to_tile(
            b["lon"].to_numpy(), b["lat"].to_numpy(), zoom)
        return pd.DataFrame({
            "k": (tx.astype(np.int64) << np.int64(26))
            | ty.astype(np.int64)}).drop_duplicates()

    occ = relational.distinct(
        pts.map_batches(keys, batch_format="pandas"),
        ["k"]).to_pandas()["k"].to_numpy(np.int64)
    x = occ >> np.int64(26)
    y = occ & np.int64((1 << 26) - 1)
    full = {zoom: np.stack([x, y], axis=1)}
    for z in range(zoom - 1, min_zoom - 1, -1):
        ch = full[z + 1]
        par = ch // 2
        u, cnt = np.unique(par, axis=0, return_counts=True)
        full[z] = u[cnt == 4]
    frames = []
    for z in range(min_zoom, zoom + 1):
        cells = full[z]
        if len(cells) == 0:
            continue
        if z == min_zoom:
            keep = np.ones(len(cells), bool)
        else:
            pk = ((cells[:, 0] // 2) << np.int64(26)) | (cells[:, 1] // 2)
            fk = ((full[z - 1][:, 0] << np.int64(26))
                  | full[z - 1][:, 1])
            keep = ~np.isin(pk, fk)
        frames.append(pd.DataFrame({
            "z": np.full(int(keep.sum()), z, np.int64),
            "x": cells[keep, 0], "y": cells[keep, 1]}))
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["z", "x", "y"], ignore_index=True)
