"""Multimodal column operators: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns tagged by a
``fmt`` string (the Lance-shaped input convention, BASELINE.json:15).
Engine-native codecs (raw16/qdct) decode for real; external codecs
(jpeg/png/mp3/...) are STUBBED behind ``NotImplementedError`` because
no media library exists in this sandbox — the Ray-side plumbing
(schema, actor signature, batch sizing, output layout) is real and
tested either way.

Stages (all actor-pool ``map_batches``, per-actor codec state):
- ``ImageFeatures``: decode -> mean color, luminance stats, edge energy
- ``Resize``: decode -> area-resample -> re-encode at target size
- ``FrameSampler``: deterministic frame-index sampling plan for video
  payloads (the plan is real; frame decode is the stubbed step)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from engine import codec

_NATIVE = set(codec.FORMATS)


def _decode_or_raise(data: bytes, fmt: str) -> np.ndarray:
    if fmt in _NATIVE:
        return codec.decode(data, fmt)
    raise NotImplementedError(
        f"external codec {fmt!r} requires a media library not present in "
        "this environment; plug a decoder into engine.ops.multimodal"
    )


class ImageFeatures:
    """bytes/fmt -> per-image feature columns (vectorized per image)."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        mean_r, mean_g, mean_b, lum_mean, lum_std, edge = [], [], [], [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt).astype(np.float64)
            mean_r.append(px[:, :, 0].mean())
            mean_g.append(px[:, :, 1].mean())
            mean_b.append(px[:, :, 2].mean())
            lum = px.mean(axis=2)
            lum_mean.append(lum.mean())
            lum_std.append(lum.std())
            gy, gx = np.gradient(lum)
            edge.append(float(np.sqrt(gx**2 + gy**2).mean()))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        for name, vals in [
            ("mean_r", mean_r), ("mean_g", mean_g), ("mean_b", mean_b),
            ("lum_mean", lum_mean), ("lum_std", lum_std), ("edge_energy", edge),
        ]:
            out = out.append_column(name, pa.array(np.round(vals, 6), pa.float64()))
        return out


class Resize:
    """bytes/fmt -> re-encoded thumbnail bytes at (size x size)."""

    def __init__(self, size: int = 16, out_fmt: str = "raw16"):
        from engine.codec.phash import _resize_area

        self.size = size
        self.out_fmt = out_fmt
        self._resize = _resize_area

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = []
        for data, fmt in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt).astype(np.float64)
            t = np.stack(
                [self._resize(px[:, :, c], self.size) for c in range(px.shape[2])],
                axis=2,
            )
            t = np.clip(np.rint(t), 0, 255).astype(np.uint8)
            blobs.append(codec.encode(t, self.out_fmt))
        out = batch.drop_columns(["bytes"])
        out = out.append_column("resized_bytes", pa.array(blobs, pa.binary()))
        out = out.append_column(
            "resized_w", pa.array([self.size] * len(blobs), pa.int32())
        )
        out = out.append_column(
            "resized_h", pa.array([self.size] * len(blobs), pa.int32())
        )
        return out


class FrameSampler:
    """Video payloads: emit a deterministic frame-sampling plan.

    The plan (which frame indices to decode, uniform stride from
    metadata ``n_frames``) is real; actually decoding frames needs an
    external codec and raises ``NotImplementedError`` unless the
    payload is engine-native (then frames == the single image)."""

    def __init__(self, frames_per_clip: int = 4):
        self.n = frames_per_clip

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, row in batch.iterrows():
            n_frames = int(row.get("n_frames", 1) or 1)
            take = np.unique(
                np.linspace(0, max(0, n_frames - 1), min(self.n, n_frames)).astype(int)
            )
            for fi in take:
                r = row.to_dict()
                r["frame_index"] = int(fi)
                rows.append(r)
        return pd.DataFrame(rows)


def image_features(ds: ray.data.Dataset, *, batch_size: int = 512,
                   concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def resize_images(ds: ray.data.Dataset, size: int = 16, *, batch_size: int = 512,
                  concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        Resize, fn_constructor_kwargs={"size": size}, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency, num_cpus=1,
    )
