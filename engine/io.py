"""Source/sink seam (SURVEY.md S1/S4): parquet today, Lance-shaped schema.

The driver's input hint specifies a Lance table of image+caption pairs
(BASELINE.json:15); no ``lance`` wheel exists in this sandbox (SURVEY.md
§7.1), so storage is parquet carrying the exact Lance logical schema.
``read_images`` is the single indirection every pipeline uses — swapping
in ``ray.data.read_lance`` later touches only this module.
"""

from __future__ import annotations

import sys
import types

import ray.data


def _stub_fsspec_http() -> None:
    """Make ``from fsspec.implementations.http import HTTPFileSystem``
    deterministic and thread-safe.

    In this sandbox ``aiohttp`` is absent, so that import fails on every
    attempt; under CONCURRENT first-import (threaded partition runs) the
    failure can surface as a plain ``ImportError`` that Ray's
    ``except ModuleNotFoundError`` in ``path_util._is_http_filesystem``
    does not catch. A sentinel class (never instantiated — no real
    HTTPFileSystem can exist without aiohttp) keeps the isinstance check
    correct (always False)."""
    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ImportError:
        pass
    try:
        import fsspec.implementations
    except ImportError:  # no fsspec at all: nothing to stub
        return
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel only
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    fsspec.implementations.http = mod


_stub_fsspec_http()

IMAGE_COLUMNS = ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")


def read_images(
    uri: str | list[str],
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Read the primary images table, pruning columns at the read
    (SURVEY.md "prune at the read"). ``override_num_blocks`` coalesces
    small files into fewer, fatter blocks — fewer tasks means less
    driver-side coordination, which is the scaling bottleneck when many
    streaming executions share one driver."""
    return ray.data.read_parquet(
        uri,
        columns=list(columns) if columns else None,
        override_num_blocks=override_num_blocks,
    )


def read_table(uri: str | list[str], columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(uri, columns=list(columns) if columns else None)


def sf_table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """One of the driver's TPC-H-ish tables (TESTDATA.md)."""
    return read_table(f"{sf_dir}/{name}.parquet", columns)
