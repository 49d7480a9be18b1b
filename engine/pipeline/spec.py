"""Pipeline-spec surface (SURVEY §2.9): a declarative dict -> run.

The reference drives which categories/themes get processed from a
config file; the engine analog is a spec dict describing the source,
index resolutions, join/kNN parameters, tiling zoom and sinks, plus
UDF hook points (any ``map_batches``-compatible callable) that run
between the built-in stages.

    spec = {
        "source": "/path/to/images_parquet_dir",
        "out": "/path/to/output",
        "zoom": 8,                  # tile zoom
        "knn_k": 5,                 # neighbors per image
        "partitions": 4,            # resume granularity
        "resume": True,
        "mode": "fused",            # or "staged" (actor pools)
        "polygons": None,           # dict like fixtures.polygons(); None = fixture
        "run_id": "run",
    }
    summary = run_spec(spec)
"""

from __future__ import annotations

from typing import Any

from engine import fixtures
from engine.pipeline import flagship

_DEFAULTS: dict[str, Any] = {
    "zoom": 8,
    "knn_k": 5,
    "partitions": 4,
    "resume": True,
    "mode": "fused",
    "polygons": None,
    "run_id": "run",
    "batch_size": 2048,
    "partition_threads": 1,
    "read_blocks": None,
}

_ALLOWED = set(_DEFAULTS) | {"source", "out"}


def validate_spec(spec: dict) -> dict:
    unknown = set(spec) - _ALLOWED
    if unknown:
        raise ValueError(f"unknown spec keys: {sorted(unknown)}")
    for key in ("source", "out"):
        if key not in spec:
            raise ValueError(f"spec requires {key!r}")
    if spec.get("mode", "fused") not in ("fused", "staged"):
        raise ValueError("mode must be 'fused' or 'staged'")
    out = dict(_DEFAULTS)
    out.update(spec)
    return out


def run_spec(spec: dict) -> dict:
    """Validate + execute a pipeline spec; returns the run summary."""
    s = validate_spec(spec)
    return flagship.run_flagship(
        s["source"],
        s["out"],
        poly=s["polygons"] or fixtures.polygons(),
        zoom=s["zoom"],
        knn_k=s["knn_k"],
        target_partitions=s["partitions"],
        resume=s["resume"],
        batch_size=s["batch_size"],
        run_id=s["run_id"],
        partition_threads=s["partition_threads"],
        use_actors=(s["mode"] == "staged"),
        fused=(s["mode"] == "fused"),
        read_blocks=s["read_blocks"],
    )
