"""Deterministic synthetic geo fixtures (FIXTURES.md §B) — seed=42.

Generates the Lance-shaped ``images`` table (BASELINE.json:15 schema:
image_id, bytes, w, h, fmt, caption, phash) and the OSM-style admin
``polygons`` table. Everything is a pure function of (seed, row index):
no wall clock, no external data, byte-identical regeneration.

Two generation paths:
- ``images_table(n)``     driver-side pyarrow table (tests, tiny n)
- ``images_dataset(n)``   Ray Data pipeline ``range(n) -> map_batches``
                          (bench scale; embarrassingly parallel)

Geotags: lon = -12 + 24*u1, lat = 35 + 12*u2 (Italy-ish bbox), except a
``hot_frac`` of rows pinned inside one small disc so exactly one H3
cell is hot (skew fixture, SURVEY.md §4.2). ``dup_frac`` of rows are
exact pixel duplicates of earlier rows under new image_ids (dedup
fixture, SURVEY.md D2). ~5% of captions are denormalized variants
(underscores / case) that the canonicalizer must fold (SURVEY.md M4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine import codec

SEED = 42
HOT_CENTER = (9.05, 41.05)
HOT_RADIUS = 0.045
LON0, LON_SPAN = -12.0, 24.0
LAT0, LAT_SPAN = 35.0, 12.0

_WORDS = (
    "castello torre ponte chiesa museo piazza fontana palazzo teatro "
    "monte lago fiume isola porto borgo rocca abbazia duomo villa parco"
).split()
_LANGS = ("it", "en", "de")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    z = (np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash_stream(i: np.ndarray, stream: int, seed: int = SEED) -> np.ndarray:
    return _splitmix64(
        np.asarray(i, dtype=np.uint64)
        ^ (np.uint64(stream) << np.uint64(40))
        ^ (np.uint64(seed) << np.uint64(48))
    )


def _uniform(i: np.ndarray, stream: int) -> np.ndarray:
    return _hash_stream(i, stream).astype(np.float64) / float(2**64)


def row_lonlat(i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic geotag of row i (matches the oracle, FIXTURES.md B.1)."""
    i = np.asarray(i, dtype=np.int64)
    lon = LON0 + LON_SPAN * _uniform(i, 1)
    lat = LAT0 + LAT_SPAN * _uniform(i, 2)
    hot = (i % 10) == 0  # 10% hot disc
    ang = 2 * np.pi * _uniform(i, 3)
    rad = HOT_RADIUS * np.sqrt(_uniform(i, 4))
    lon = np.where(hot, HOT_CENTER[0] + rad * np.cos(ang), lon)
    lat = np.where(hot, HOT_CENTER[1] + rad * np.sin(ang), lat)
    return lon, lat


def row_caption(i: np.ndarray) -> list[str]:
    """``lang:Title`` captions; ~5% denormalized variants (M4 fixture)."""
    i = np.asarray(i, dtype=np.int64)
    lang_ix = _hash_stream(i, 5) % np.uint64(3)
    w1 = _hash_stream(i, 6) % np.uint64(len(_WORDS))
    w2 = _hash_stream(i, 7) % np.uint64(len(_WORDS))
    num = _hash_stream(i, 8) % np.uint64(97)
    denorm = (_hash_stream(i, 9) % np.uint64(20)) == 0  # 5%
    out = []
    for k in range(len(i)):
        lang = _LANGS[int(lang_ix[k])]
        t1 = _WORDS[int(w1[k])].capitalize()
        t2 = _WORDS[int(w2[k])]
        title = f"{t1} {t2} {int(num[k])}"
        if denorm[k]:
            title = title.replace(" ", "_").lower()
        out.append(f"{lang}:{title}")
    return out


def row_dims(i: np.ndarray, px_scale: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Image dims 16/24/32 px, times ``px_scale`` (the bench uses scale
    4 -> 64-128px so per-row decode cost approximates real image
    payloads; tests use scale 1)."""
    w = (np.uint64(16) + np.uint64(8) * (_hash_stream(i, 10) % np.uint64(3))) * np.uint64(px_scale)
    h = (np.uint64(16) + np.uint64(8) * (_hash_stream(i, 11) % np.uint64(3))) * np.uint64(px_scale)
    return w.astype(np.int32), h.astype(np.int32)


def row_fmt(i: np.ndarray) -> np.ndarray:
    return np.where((_hash_stream(i, 12) % np.uint64(10)) < np.uint64(7), "raw16", "qdct")


def pixel_source_row(i: np.ndarray, dup_frac_inv: int = 100) -> np.ndarray:
    """Row whose pixels row i carries: i, or an earlier row for exact dups."""
    i = np.asarray(i, dtype=np.int64)
    is_dup = (i % dup_frac_inv) == 7  # ~1% exact duplicates
    base = np.maximum(0, i - 1 - (i % 13))
    return np.where(is_dup & (i > 0), base, i)


def image_pixels(src_row: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for a source row — vectorized
    hash over (row, y, x, channel) with a smooth gradient so qdct stays
    realistic."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    key = (
        (np.uint64(src_row) << np.uint64(32))
        ^ (yy.astype(np.uint64) << np.uint64(16))
        ^ xx.astype(np.uint64)
    )
    base = _splitmix64(key)
    chans = [
        ((base >> np.uint64(8 * c)) & np.uint64(0xFF)).astype(np.float64) for c in range(3)
    ]
    grad = (xx + yy).astype(np.float64) / max(1, (w + h - 2)) * 255.0
    px = np.stack([0.5 * ch + 0.5 * grad for ch in chans], axis=2)
    return np.clip(np.rint(px), 0, 255).astype(np.uint8)


def make_rows(i: np.ndarray, px_scale: int = 1) -> dict[str, np.ndarray | list]:
    """Full fixture rows for indices ``i`` (the map_batches body)."""
    i = np.asarray(i, dtype=np.int64)
    fmts = row_fmt(i)
    src = pixel_source_row(i)
    # duplicates share the SOURCE row's dims/fmt so pixels match exactly
    w_src, h_src = row_dims(src, px_scale)
    fmt_src = row_fmt(src)
    blobs, phashes = [], np.empty(len(i), dtype=np.int64)
    for k in range(len(i)):
        px = image_pixels(int(src[k]), int(w_src[k]), int(h_src[k]))
        blobs.append(codec.encode(px, str(fmt_src[k])))
        phashes[k] = codec.phash64(codec.decode(blobs[-1]))
    return {
        "image_id": [f"img{int(x):09d}" for x in i],
        "bytes": blobs,
        "w": w_src,
        "h": h_src,
        "fmt": fmt_src.astype(object).tolist(),
        "caption": row_caption(i),
        "phash": phashes,
    }


_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def images_table(n: int, offset: int = 0, px_scale: int = 1) -> pa.Table:
    """Driver-side fixture table of n rows (tests / tiny scale)."""
    d = make_rows(np.arange(offset, offset + n), px_scale)
    return pa.table(
        {
            "image_id": pa.array(d["image_id"], pa.string()),
            "bytes": pa.array(d["bytes"], pa.binary()),
            "w": pa.array(d["w"], pa.int32()),
            "h": pa.array(d["h"], pa.int32()),
            "fmt": pa.array(d["fmt"], pa.string()),
            "caption": pa.array(d["caption"], pa.string()),
            "phash": pa.array(d["phash"], pa.int64()),
        },
        schema=_SCHEMA,
    )


def images_dataset(n: int, parallelism: int = 64, px_scale: int = 1):
    """Ray Data generation pipeline for bench-scale fixtures."""
    import ray.data

    def gen(batch: dict) -> pa.Table:
        d = make_rows(batch["id"], px_scale)
        return pa.table(
            {
                "image_id": pa.array(d["image_id"], pa.string()),
                "bytes": pa.array(d["bytes"], pa.binary()),
                "w": pa.array(d["w"], pa.int32()),
                "h": pa.array(d["h"], pa.int32()),
                "fmt": pa.array(d["fmt"], pa.string()),
                "caption": pa.array(d["caption"], pa.string()),
                "phash": pa.array(d["phash"], pa.int64()),
            },
            schema=_SCHEMA,
        )

    return (
        ray.data.range(n, override_num_blocks=max(1, min(parallelism, n)))
        .map_batches(gen, batch_format="numpy", batch_size=4096)
    )


def write_images_parquet(
    n: int, out_dir: str, num_files: int = 8, px_scale: int = 1
) -> list[str]:
    """Deterministic sharded parquet fixture (driver-side, small/medium n)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    per = int(np.ceil(n / num_files))
    paths = []
    for s in range(num_files):
        a = s * per
        b = min(n, a + per)
        if a >= b:
            break
        p = os.path.join(out_dir, f"images-{s:05d}.parquet")
        pq.write_table(images_table(b - a, offset=a, px_scale=px_scale), p)
        paths.append(p)
    return paths


# ------------------------------------------------------------------ polygons

def polygons(seed: int = SEED, n_regions: int = 4, provinces: int = 3, munis: int = 5):
    """Nested 3-level admin polygon fixture (FIXTURES.md §B.2).

    Returns a dict of columns: admin_id, name, level, parent_id,
    ring_lon, ring_lat, holes. Level-(k+1) polygons lie inside their
    level-k parent by construction (child circumradius + center offset
    < parent radius). Two designated polygons carry one hole each.
    """
    rng = np.random.default_rng(seed)
    admin_id, name, level, parent, rings_x, rings_y = [], [], [], [], [], []

    def ring_at(cx, cy, radius, nv):
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = radius * (0.75 + 0.25 * rng.random(nv))
        return cx + rad * np.cos(ang), cy + rad * np.sin(ang)

    k = 0
    for r in range(n_regions):
        rcx = LON0 + LON_SPAN * (0.2 + 0.6 * rng.random())
        rcy = LAT0 + LAT_SPAN * (0.2 + 0.6 * rng.random())
        rrad = rng.uniform(2.2, 3.2)
        rid = f"adm1_{k:04d}"
        k += 1
        rx, ry = ring_at(rcx, rcy, rrad, int(rng.integers(12, 24)))
        admin_id.append(rid)
        name.append(f"{_WORDS[k % len(_WORDS)].capitalize()} Region")
        level.append(1)
        parent.append("")
        rings_x.append(rx)
        rings_y.append(ry)
        for p in range(provinces):
            ang = rng.uniform(0, 2 * np.pi)
            off = rng.uniform(0, rrad * 0.35)
            pcx, pcy = rcx + off * np.cos(ang), rcy + off * np.sin(ang)
            prad = rrad * rng.uniform(0.22, 0.32)
            pid = f"adm2_{k:04d}"
            k += 1
            px, py = ring_at(pcx, pcy, prad, int(rng.integers(10, 20)))
            admin_id.append(pid)
            name.append(f"{_WORDS[k % len(_WORDS)].capitalize()} Province")
            level.append(2)
            parent.append(rid)
            rings_x.append(px)
            rings_y.append(py)
            for m in range(munis):
                ang2 = rng.uniform(0, 2 * np.pi)
                off2 = rng.uniform(0, prad * 0.4)
                mcx, mcy = pcx + off2 * np.cos(ang2), pcy + off2 * np.sin(ang2)
                mrad = prad * rng.uniform(0.18, 0.3)
                mid = f"adm3_{k:04d}"
                k += 1
                mx, my = ring_at(mcx, mcy, mrad, int(rng.integers(8, 16)))
                admin_id.append(mid)
                name.append(f"{_WORDS[k % len(_WORDS)]}")
                level.append(3)
                parent.append(pid)
                rings_x.append(mx)
                rings_y.append(my)
    # hot-disc coverage: one municipality polygon straddling the hot disc
    hx, hy = ring_at(HOT_CENTER[0], HOT_CENTER[1], HOT_RADIUS * 3, 14)
    admin_id.append(f"adm3_{k:04d}")
    name.append("hotspot")
    level.append(3)
    parent.append(admin_id[0])
    rings_x.append(hx)
    rings_y.append(hy)
    k += 1
    # holes in two polygons (PIP edge case)
    holes: list[list[tuple[np.ndarray, np.ndarray]]] = [[] for _ in admin_id]
    for target in (0, 1):
        rx, ry = rings_x[target], rings_y[target]
        cx, cy = rx.mean(), ry.mean()
        holes[target] = [(cx + (rx - cx) * 0.18, cy + (ry - cy) * 0.18)]
    return {
        "admin_id": np.array(admin_id),
        "name": np.array(name),
        "level": np.array(level, dtype=np.int32),
        "parent_id": np.array(parent),
        "ring_lon": rings_x,
        "ring_lat": rings_y,
        "holes": holes,
    }


# ------------------------------------------------------------------ articles

def articles(n_images: int = 1500, extra: int = 200) -> "pd.DataFrame":
    """Deterministic Wikipedia-article-list analog (SURVEY.md §0.2, S3).

    Canonical titles of every 3rd image caption (these MATCH after
    canonicalization even when the image side is denormalized) plus
    ``extra`` titles that match no image (the reference's "articles
    still to tag"). Columns: article_id, title_canon, theme."""
    import pandas as pd
    import pyarrow as pa

    from engine.pipeline.ingest import canonicalize_captions

    i = np.arange(0, n_images, 3, dtype=np.int64)
    caps = pa.array(row_caption(i), pa.string())
    canon = canonicalize_captions(caps).to_pylist()
    missing = [
        f"{_LANGS[k % 3]}:Unmatched article {k}" for k in range(extra)
    ]
    titles = canon + missing
    df = pd.DataFrame({"title_canon": titles})
    df = df.drop_duplicates("title_canon", ignore_index=True)
    df["article_id"] = [f"A{k:06d}" for k in range(len(df))]
    df["theme"] = [
        ("monuments", "nature", "transport")[k % 3] for k in range(len(df))
    ]
    # coordinates "harvested from article templates" (reference S3):
    # deterministic function of the article index, same lon/lat box
    j = np.arange(len(df), dtype=np.int64) + 1_000_000
    df["lon"] = LON0 + LON_SPAN * _uniform(j, 5)
    df["lat"] = LAT0 + LAT_SPAN * _uniform(j, 6)
    # toponym-inference analog (reference nuts4nuts [PK]): a short
    # article summary; ~60% mention an admin-area name from the
    # polygon gazetteer verbatim, the rest carry no toponym. The
    # filler vocabulary is disjoint from every gazetteer name so a
    # mention is present iff planted.
    names = [str(nm) for nm in polygons()["name"]]
    h_m = _hash_stream(j, 9)
    h_n = _hash_stream(j, 10)
    mention = (h_m % 5) < 3
    df["summary"] = [
        (f"Voce {aid}: monumenti e luoghi presso "
         f"{names[int(h_n[k] % len(names))]}, con note storiche."
         if mention[k] else
         f"Voce {aid}: note generali senza riferimenti territoriali.")
        for k, aid in enumerate(df["article_id"])
    ]
    return df[["article_id", "title_canon", "theme", "lon", "lat", "summary"]]


# ------------------------------------------------------------------ OSM XML

def polygons_to_osm_xml(poly: dict, path: str) -> None:
    """Serialize the polygons fixture as OSM XML (the reference's
    phase-1 input format [PK]: admin boundaries arrive as nodes /
    ways / type=boundary relations). Deterministic: node/way ids are
    sequential in fixture order, coordinates printed at 9 decimals.
    ``engine.io.read_osm_xml`` parses it back; roundtrip equality is
    pytest-verified (closing the reference's OSM-ingest seam without
    network access)."""
    import os
    from xml.sax.saxutils import quoteattr

    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<osm version="0.6" generator="ray-geo-engine-fixture">']
    node_id = 0
    way_id = 0
    ways: list[str] = []
    rels: list[str] = []
    n = len(poly["admin_id"])
    for i in range(n):
        ring_ways = []  # (role, way_id)
        rings = [("outer", poly["ring_lon"][i], poly["ring_lat"][i])]
        for hx, hy in (poly.get("holes") or [[] for _ in range(n)])[i]:
            rings.append(("inner", hx, hy))
        for role, xs, ys in rings:
            way_id += 1
            refs = []
            for x, y in zip(xs, ys):
                node_id += 1
                lines.append(
                    f'  <node id="{node_id}" lat="{y:.9f}" lon="{x:.9f}"/>'
                )
                refs.append(node_id)
            refs.append(refs[0])  # closed ring
            nd = "".join(f'<nd ref="{r}"/>' for r in refs)
            ways.append(f'  <way id="{way_id}">{nd}</way>')
            ring_ways.append((role, way_id))
        members = "".join(
            f'<member type="way" ref="{w}" role="{role}"/>'
            for role, w in ring_ways
        )
        tags = (
            '<tag k="type" v="boundary"/>'
            '<tag k="boundary" v="administrative"/>'
            f'<tag k="admin_level" v="{int(poly["level"][i])}"/>'
            f'<tag k="name" v={quoteattr(str(poly["name"][i]))}/>'
            f'<tag k="ref" v={quoteattr(str(poly["admin_id"][i]))}/>'
            f'<tag k="parent_ref" v={quoteattr(str(poly["parent_id"][i]))}/>'
        )
        rels.append(f'  <relation id="{i + 1}">{members}{tags}</relation>')
    lines.extend(ways)
    lines.extend(rels)
    lines.append("</osm>")
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, path)
