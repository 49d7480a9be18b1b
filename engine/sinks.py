"""Report/export sinks — the reference's phase-3 outputs re-expressed
as distributed datasinks (public knowledge of simone-f/
wikipedia-tags-in-osm [PK]: it writes GPX waypoint files of articles
still to tag and per-area CSV lists for editors; SURVEY.md §1.1 S6).

Both sinks follow the same plan: ``groupby(area).map_groups`` routes
every area's rows to ONE task, the task renders the file (rows sorted
— byte-deterministic), writes it atomically (tmp + ``os.rename``) and
emits a manifest row. Re-runs are idempotent: same input, same bytes,
same crc. At 100 TB the per-area fan-out is the partitioning — each
file is owned by exactly one task and a resumed run can skip areas
whose manifest row already exists.
"""

from __future__ import annotations

import os
import zlib
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd

import ray
import ray.data

_GPX_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<gpx version="1.1" creator="ray-geo-engine" '
    'xmlns="http://www.topografix.com/GPX/1/1">\n'
)


def gpx_document(
    rows: pd.DataFrame, *, name_col: str, lat_col: str = "lat",
    lon_col: str = "lon",
) -> str:
    """Render waypoint rows as a GPX 1.1 document (deterministic: rows
    sorted by name then lat/lon; coordinates fixed to 7 decimals —
    ~1 cm, the GPX-community convention)."""
    rows = rows.sort_values([name_col, lat_col, lon_col], kind="stable")
    parts = [_GPX_HEADER]
    for name, lat, lon in zip(rows[name_col].astype(str),
                              rows[lat_col], rows[lon_col]):
        parts.append(
            f'  <wpt lat="{lat:.7f}" lon="{lon:.7f}">'
            f"<name>{escape(name)}</name></wpt>\n"
        )
    parts.append("</gpx>\n")
    return "".join(parts)


def _atomic_write(path: str, data: bytes) -> int:
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return zlib.crc32(data)


def _manifest_schema() -> pd.DataFrame:
    return pd.DataFrame({
        "area": pd.Series(dtype=object),
        "path": pd.Series(dtype=object),
        "n_rows": pd.Series(dtype=np.int64),
        "crc32": pd.Series(dtype=np.int64),
    })


def write_gpx_per_area(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    area_col: str,
    name_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> pd.DataFrame:
    """One GPX waypoint file per area (``<out_dir>/<area>.gpx``),
    written distributed — each area's rows co-locate in one groupby
    task that renders and atomically writes its file. Returns the
    manifest (area, path, n_rows, crc32) sorted by area."""
    os.makedirs(out_dir, exist_ok=True)

    def write_one(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return _manifest_schema()
        area = str(g[area_col].iloc[0])
        doc = gpx_document(g, name_col=name_col,
                           lat_col=lat_col, lon_col=lon_col)
        path = os.path.join(out_dir, f"{area}.gpx")
        crc = _atomic_write(path, doc.encode("utf-8"))
        return pd.DataFrame({"area": [area], "path": [path],
                             "n_rows": [np.int64(len(g))],
                             "crc32": [np.int64(crc)]})

    out = ds.groupby(area_col).map_groups(
        write_one, batch_format="pandas"
    ).to_pandas()
    if "area" not in out.columns:
        return _manifest_schema()
    return out.sort_values("area", ignore_index=True)


def write_csv_per_area(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    area_col: str,
    columns: list[str],
    sort_by: list[str] | None = None,
) -> pd.DataFrame:
    """One CSV file per area (``<out_dir>/<area>.csv``, header +
    ``columns`` in order, rows sorted — byte-deterministic), written
    distributed with the same ownership/atomicity rules as the GPX
    sink. Returns the manifest (area, path, n_rows, crc32)."""
    os.makedirs(out_dir, exist_ok=True)
    sort_cols = list(sort_by or columns)

    def write_one(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return _manifest_schema()
        area = str(g[area_col].iloc[0])
        body = (
            g.sort_values(sort_cols, kind="stable")[columns]
            .to_csv(index=False, lineterminator="\n")
        )
        path = os.path.join(out_dir, f"{area}.csv")
        crc = _atomic_write(path, body.encode("utf-8"))
        return pd.DataFrame({"area": [area], "path": [path],
                             "n_rows": [np.int64(len(g))],
                             "crc32": [np.int64(crc)]})

    out = ds.groupby(area_col).map_groups(
        write_one, batch_format="pandas"
    ).to_pandas()
    if "area" not in out.columns:
        return _manifest_schema()
    return out.sort_values("area", ignore_index=True)


_HTML_HEADER = (
    "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">"
    "<title>{title}</title></head>\n<body>\n<h1>{title}</h1>\n"
)


def assemble_site(
    rows: ray.data.Dataset,
    out_dir: str,
    *,
    area_col: str = "admin_id",
    theme_col: str = "theme",
    name_col: str = "title_canon",
    title: str = "Articles to tag",
) -> pd.DataFrame:
    """Cross-area site assembly (the reference's phase-3 index pages
    [PK]: per-THEME pages listing every area's still-untagged articles,
    plus one root ``index.html`` linking them all — the piece round 2
    left missing above the per-area GPX/CSV/HTML sinks).

    Theme pages are written DISTRIBUTED (``groupby(theme)`` — one task
    owns one page, same atomic/idempotent rules as the per-area sinks);
    only the O(themes + areas) manifest reaches the driver, which then
    renders the root index from it. Returns the combined manifest
    (page, area, n_rows, crc32) sorted — ``area`` is ``*`` for
    theme-level and index rows."""
    os.makedirs(out_dir, exist_ok=True)

    def write_theme(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                "page": pd.Series(dtype=object),
                "area": pd.Series(dtype=object),
                "n_rows": pd.Series(dtype=np.int64),
                "crc32": pd.Series(dtype=np.int64)})
        theme = str(g[theme_col].iloc[0])
        doc = html_document(
            g, title=f"{title} — theme {theme}",
            columns=[area_col, name_col],
        )
        page = f"theme_{theme}.html"
        crc = _atomic_write(os.path.join(out_dir, page),
                            doc.encode("utf-8"))
        per_area = g.groupby(area_col).size()
        return pd.DataFrame({
            "page": [page] * (len(per_area) + 1),
            "area": ["*"] + [str(a) for a in per_area.index],
            "n_rows": np.concatenate(
                [[np.int64(len(g))],
                 per_area.to_numpy(np.int64)]),
            "crc32": np.asarray([np.int64(crc)] * (len(per_area) + 1),
                                np.int64),
        })

    man = rows.groupby(theme_col).map_groups(
        write_theme, batch_format="pandas").to_pandas()
    if "page" not in man.columns:
        man = pd.DataFrame({"page": [], "area": [], "n_rows": [],
                            "crc32": []})
    man = man.sort_values(["page", "area"], ignore_index=True)

    # root index from the manifest (O(themes) — the documented small
    # side): one link + article count per theme page
    tops = man[man["area"] == "*"].sort_values("page")
    parts = [_HTML_HEADER.format(title=escape(title))]
    parts.append("<table>\n<tr><th>page</th><th>articles</th></tr>\n")
    for _, r in tops.iterrows():
        parts.append(
            f'<tr><td><a href="{escape(str(r["page"]))}">'
            f'{escape(str(r["page"]))}</a></td>'
            f'<td>{int(r["n_rows"])}</td></tr>\n')
    parts.append("</table>\n</body></html>\n")
    crc = _atomic_write(os.path.join(out_dir, "index.html"),
                        "".join(parts).encode("utf-8"))
    idx_row = pd.DataFrame({
        "page": ["index.html"], "area": ["*"],
        "n_rows": [np.int64(tops["n_rows"].sum())],
        "crc32": [np.int64(crc)]})
    out = pd.concat([idx_row, man], ignore_index=True)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["crc32"] = out["crc32"].astype(np.int64)
    return out.sort_values(["page", "area"], ignore_index=True)


def html_document(
    rows: pd.DataFrame, *, title: str, columns: list[str],
    link_col: str | None = None,
) -> str:
    """Render rows as a static report page (reference phase-3 HTML
    pages [PK]: per-area lists of articles to tag, with editor links).
    Deterministic: rows sorted by ``columns``; cells HTML-escaped;
    ``link_col`` (if given) renders as an anchor. No JS, no external
    assets — a plain table any browser renders."""
    rows = rows.sort_values(columns, kind="stable")
    parts = [_HTML_HEADER.format(title=escape(title))]
    parts.append("<table>\n<tr>")
    for c in columns:
        parts.append(f"<th>{escape(c)}</th>")
    parts.append("</tr>\n")
    for _, r in rows.iterrows():
        parts.append("<tr>")
        for c in columns:
            v = escape(str(r[c]))
            if c == link_col:
                parts.append(f'<td><a href="{v}">link</a></td>')
            else:
                parts.append(f"<td>{v}</td>")
        parts.append("</tr>\n")
    parts.append("</table>\n</body></html>\n")
    return "".join(parts)


def write_html_per_area(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    area_col: str,
    columns: list[str],
    link_col: str | None = None,
) -> pd.DataFrame:
    """One static HTML report page per area
    (``<out_dir>/<area>.html``), written distributed with the same
    ownership/atomicity/idempotency rules as the GPX/CSV sinks.
    Returns the manifest (area, path, n_rows, crc32)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_one(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return _manifest_schema()
        area = str(g[area_col].iloc[0])
        doc = html_document(
            g, title=f"Articles to tag — {area}", columns=columns,
            link_col=link_col,
        )
        path = os.path.join(out_dir, f"{area}.html")
        crc = _atomic_write(path, doc.encode("utf-8"))
        return pd.DataFrame({"area": [area], "path": [path],
                             "n_rows": [np.int64(len(g))],
                             "crc32": [np.int64(crc)]})

    out = ds.groupby(area_col).map_groups(
        write_one, batch_format="pandas"
    ).to_pandas()
    if "area" not in out.columns:
        return _manifest_schema()
    return out.sort_values("area", ignore_index=True)
