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
from engine.state import default_pool

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

    def __init__(self, size: int = 16, out_fmt: str = "raw16",
                 keep_bytes: bool = False):
        from engine.codec.phash import _resize_area

        self.size = size
        self.out_fmt = out_fmt
        self._resize = _resize_area
        # keep_bytes=True lets a later decode-bearing stage (augment)
        # chain in the same streaming plan
        self.keep_bytes = keep_bytes

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
        out = batch if self.keep_bytes else batch.drop_columns(["bytes"])
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
        self._plans: dict[int, np.ndarray] = {}  # n_frames -> frame indices

    def _plan(self, n_frames: int) -> np.ndarray:
        p = self._plans.get(n_frames)
        if p is None:
            p = self._plans[n_frames] = np.unique(
                np.linspace(
                    0, max(0, n_frames - 1), min(self.n, max(1, n_frames))
                ).astype(int)
            )
        return p

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if "n_frames" in batch.columns:
            f = batch["n_frames"].fillna(1).astype(np.int64).clip(lower=1).to_numpy()
        else:
            f = np.ones(len(batch), dtype=np.int64)
        plans = [self._plan(int(v)) for v in np.unique(f)]
        by_val = dict(zip(np.unique(f), plans))
        counts = np.array([len(by_val[v]) for v in f], dtype=np.int64)
        out = batch.iloc[np.repeat(np.arange(len(batch)), counts)].reset_index(drop=True)
        out["frame_index"] = (
            np.concatenate([by_val[v] for v in f]) if len(f) else
            np.array([], dtype=np.int64)
        )
        return out


class AudioChunker:
    """Audio payloads: emit a deterministic fixed-window chunk plan.

    Metadata ``n_samples``/``sample_rate`` drive the plan (real);
    decoding PCM from an external container (mp3/ogg/...) is the
    stubbed step — engine-native payloads pass through as one chunk of
    raw bytes. Emits one row per ``chunk_seconds`` window with
    ``chunk_index, start_sample, end_sample``."""

    def __init__(self, chunk_seconds: float = 5.0):
        self.chunk_seconds = chunk_seconds

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n_samples"].astype(np.int64).clip(lower=1).to_numpy()
        sr = batch["sample_rate"].astype(np.int64).clip(lower=1).to_numpy()
        win = np.maximum(1, (sr * self.chunk_seconds).astype(np.int64))
        n_chunks = -(-n // win)  # ceil-div
        row_ix = np.repeat(np.arange(len(batch)), n_chunks)
        out = batch.iloc[row_ix].reset_index(drop=True)
        ci = np.concatenate([np.arange(k) for k in n_chunks]) if len(n_chunks) else \
            np.array([], dtype=np.int64)
        out["chunk_index"] = ci
        out["start_sample"] = ci * win[row_ix]
        out["end_sample"] = np.minimum((ci + 1) * win[row_ix], n[row_ix])
        return out


def image_features(ds: ray.data.Dataset, *, batch_size: int = 512,
                   concurrency=None) -> ray.data.Dataset:
    return ds.map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1,
    )


def resize_images(ds: ray.data.Dataset, size: int = 16, *, batch_size: int = 512,
                  concurrency=None, keep_bytes: bool = False) -> ray.data.Dataset:
    return ds.map_batches(
        Resize,
        fn_constructor_kwargs={"size": size, "keep_bytes": keep_bytes},
        batch_format="pyarrow",
        batch_size=batch_size, concurrency=default_pool(concurrency), num_cpus=1,
    )


class Augment:
    """Deterministic per-image augmentation (T3-family actor stage):
    seed = hash64(image_id) drives an hflip bit, a rotate90 count, and a
    centered crop fraction — no RNG state, so every run and every worker
    produces identical bytes (the determinism rule that makes augmented
    corpora resumable and dedupable). Emits the applied params as
    columns for auditability, plus the re-encoded payload."""

    def __init__(self, crop_fracs=(1.0, 0.875, 0.75), out_fmt: str = "raw16",
                 param_cols: tuple[str, str, str] | None = None):
        self.crop_fracs = tuple(crop_fracs)
        self.out_fmt = out_fmt
        # externally-planned augmentation: (hflip bool, rot90 int,
        # crop_ix int) columns computed by an upstream planner stage
        # replace the id-hash derivation — the form a curriculum/
        # replication sampler feeds, and the SQL-reproducible form
        # (the id hash is pandas hash_array, not SQL-expressible)
        self.param_cols = param_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine.ops.sketch import _hash64

        if self.param_cols is not None:
            fc, rc, cc = self.param_cols
            flip = np.asarray(batch[fc]).astype(bool)
            rot = np.asarray(batch[rc]).astype(np.int64)
            cix = np.asarray(batch[cc]).astype(int)
            batch = batch.drop_columns([fc, rc, cc])
        else:
            ids = batch["image_id"].to_pylist()
            h = _hash64(np.asarray(ids, dtype=object))
            flip = (h & np.uint64(1)).astype(bool)
            rot = ((h >> np.uint64(1)) % np.uint64(4)).astype(np.int64)
            cix = ((h >> np.uint64(3)) % np.uint64(len(self.crop_fracs))).astype(int)
        blobs, ws, hs = [], [], []
        for i, (data, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            px = _decode_or_raise(data, fmt)
            if flip[i]:
                px = px[:, ::-1]
            if rot[i]:
                px = np.rot90(px, k=int(rot[i]))
            f = self.crop_fracs[cix[i]]
            if f < 1.0:
                ch, cw = max(1, int(px.shape[0] * f)), max(1, int(px.shape[1] * f))
                y0 = (px.shape[0] - ch) // 2
                x0 = (px.shape[1] - cw) // 2
                px = px[y0 : y0 + ch, x0 : x0 + cw]
            px = np.ascontiguousarray(px)
            blobs.append(codec.encode(px, self.out_fmt))
            hs.append(px.shape[0])
            ws.append(px.shape[1])
        out = batch.drop_columns(["bytes"])
        out = out.append_column("aug_bytes", pa.array(blobs, pa.binary()))
        out = out.append_column("aug_w", pa.array(ws, pa.int32()))
        out = out.append_column("aug_h", pa.array(hs, pa.int32()))
        out = out.append_column("aug_hflip", pa.array(flip.tolist()))
        out = out.append_column("aug_rot90", pa.array(rot, pa.int64()))
        out = out.append_column(
            "aug_crop", pa.array([self.crop_fracs[i] for i in cix], pa.float64())
        )
        return out


def augment_images(ds: ray.data.Dataset, *, batch_size: int = 512,
                   concurrency=None,
                   param_cols: tuple[str, str, str] | None = None
                   ) -> ray.data.Dataset:
    kwargs = {"param_cols": param_cols} if param_cols else {}
    return ds.map_batches(
        Augment, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1,
    )


class PixelHistogram:
    """Corpus-wide pixel-value histogram partials (decode actor
    stage): per batch, decode each image and bincount its pixels per
    channel into ``bins`` equal-width buckets over [0, 256) — one
    (channel, bin, n) partial row set per batch, so only O(3*bins)
    rows ever leave a worker regardless of corpus size."""

    def __init__(self, bins: int = 16):
        self.bins = bins
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        acc = np.zeros((3, self.bins), np.int64)
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            b = (px.astype(np.int64) * self.bins) >> 8
            for c in range(3):
                acc[c] += np.bincount(
                    b[:, :, c].ravel(), minlength=self.bins)
        ch, bn = np.divmod(np.arange(3 * self.bins), self.bins)
        return pa.table({
            "channel": pa.array(ch, pa.int64()),
            "bin": pa.array(bn, pa.int64()),
            "n": pa.array(acc.ravel(), pa.int64()),
        })


def pixel_histogram(ds: ray.data.Dataset, bins: int = 16, *,
                    batch_size: int = 512,
                    concurrency=None) -> ray.data.Dataset:
    """Distributed per-channel pixel histogram over the whole image
    corpus — the exposure/color-balance audit of an image-training
    pipeline. Decode runs in the actor pool; the merge is one tiny
    ``sum_final`` over 3*bins keys (histograms are the canonical
    mergeable combiner)."""
    from engine.ops.relational import sum_final

    partials = ds.map_batches(
        PixelHistogram, fn_constructor_kwargs={"bins": bins},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1,
    )
    return sum_final(partials, ["channel", "bin"])


class Sharpness:
    """Per-image focus score: variance of the 4-neighbor Laplacian of
    the luminance plane — the standard cheap blur detector used to
    drop out-of-focus frames from image training corpora. Decode in
    the actor pool; one vectorized conv-free Laplacian per image."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt).astype(np.float64)
            lum = px.mean(axis=2)
            lap = (-4.0 * lum[1:-1, 1:-1]
                   + lum[:-2, 1:-1] + lum[2:, 1:-1]
                   + lum[1:-1, :-2] + lum[1:-1, 2:])
            scores.append(float(lap.var()) if lap.size else 0.0)
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        return out.append_column(
            "sharpness",
            pa.array(np.round(scores, 6), pa.float64()))


def image_sharpness(ds: ray.data.Dataset, *, batch_size: int = 512,
                    concurrency=None) -> ray.data.Dataset:
    return ds.map_batches(
        Sharpness, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1,
    )


class Patchify:
    """ViT-style patch extraction: decode, split into non-overlapping
    ``patch`` x ``patch`` tiles from the top-left grid (remainder
    cropped, the standard convention), re-encode each tile — the
    image-side analog of text chunking. One row per patch with its
    grid coordinates, so shard layouts stay resumable/joinable."""

    def __init__(self, patch: int = 8, out_fmt: str = "raw16"):
        self.patch = patch
        self.out_fmt = out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine import codec

        p = self.patch
        ids, pix, pxs, pys, datas = [], [], [], [], []
        for img_id, data, fmt in zip(batch["image_id"].to_pylist(),
                                     batch["bytes"].to_pylist(),
                                     batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            ny, nx = px.shape[0] // p, px.shape[1] // p
            k = 0
            for gy in range(ny):
                for gx in range(nx):
                    tile = px[gy * p:(gy + 1) * p,
                              gx * p:(gx + 1) * p]
                    ids.append(img_id)
                    pix.append(k)
                    pxs.append(gx)
                    pys.append(gy)
                    datas.append(codec.encode(
                        np.ascontiguousarray(tile), self.out_fmt))
                    k += 1
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "patch_ix": pa.array(pix, pa.int64()),
            "px": pa.array(pxs, pa.int64()),
            "py": pa.array(pys, pa.int64()),
            "fmt": pa.array([self.out_fmt] * len(ids), pa.string()),
            "bytes": pa.array(datas, pa.binary()),
        })


def patchify_images(ds: ray.data.Dataset, patch: int = 8, *,
                    batch_size: int = 256,
                    concurrency=None) -> ray.data.Dataset:
    return ds.map_batches(
        Patchify, fn_constructor_kwargs={"patch": patch},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1,
    )


def pixel_moments(ds: ray.data.Dataset, *, batch_size: int = 512,
                  concurrency=None) -> "pd.DataFrame":
    """Corpus per-channel pixel mean/std (population) — THE
    normalization constants a training pipeline bakes into its
    preprocessing. One (channel -> n, sum, sumsq) moment partial per
    batch; exact."""
    import pandas as pd

    from engine.ops.relational import sum_final

    class Moments:
        def __init__(self):
            self.native = _NATIVE

        def __call__(self, batch: pa.Table) -> pa.Table:
            acc = np.zeros((3, 3), np.float64)  # n, sum, sumsq
            for data, fmt in zip(batch["bytes"].to_pylist(),
                                 batch["fmt"].to_pylist()):
                px = _decode_or_raise(data, fmt).astype(np.float64)
                for c in range(3):
                    v = px[:, :, c]
                    acc[c] += (v.size, v.sum(), (v * v).sum())
            return pa.table({
                "channel": pa.array(np.arange(3), pa.int64()),
                "n": pa.array(acc[:, 0], pa.float64()),
                "s": pa.array(acc[:, 1], pa.float64()),
                "ss": pa.array(acc[:, 2], pa.float64()),
            })

    tot = sum_final(
        ds.map_batches(
            Moments, batch_format="pyarrow", batch_size=batch_size,
            concurrency=default_pool(concurrency), num_cpus=1),
        ["channel"]).to_pandas()
    mean = tot["s"] / tot["n"]
    var = tot["ss"] / tot["n"] - mean * mean
    return pd.DataFrame({
        "channel": tot["channel"].astype(np.int64),
        "n_pixels": tot["n"].astype(np.int64),
        "mean": mean.astype(np.float64),
        "std": np.sqrt(np.maximum(var, 0.0)).astype(np.float64),
    })


class EntropyContrast:
    """Per-image Shannon entropy (nats, over a 16-bin intensity
    histogram of all channels) + RMS contrast (population std of the
    pixel values) — the flat/over-compressed-image and low-contrast
    filters of an image-curation pipeline. Integer pixel sums stay
    exact in float64, so the mean/contrast arithmetic is reproducible
    bit-for-bit by the SQL twin regardless of summation order."""

    def __init__(self, bins: int = 16):
        self.bins = bins
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        ent, con = [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            flat = px.reshape(-1).astype(np.int64)
            n = flat.size
            h = np.bincount((flat * self.bins) // 256,
                            minlength=self.bins)
            p = h[h > 0] / float(n)
            ent.append(float(-(p * np.log(p)).sum()))
            f = flat.astype(np.float64)
            m = f.sum() / n          # exact: integer-valued sums
            m2 = (f * f).sum() / n
            con.append(float(np.sqrt(max(m2 - m * m, 0.0))))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column(
            "entropy", pa.array(np.round(ent, 6), pa.float64()))
        return out.append_column(
            "contrast", pa.array(np.round(con, 6), pa.float64()))


def image_entropy_contrast(
    ds: ray.data.Dataset, bins: int = 16, *, batch_size: int = 512,
    concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        EntropyContrast, fn_constructor_kwargs={"bins": bins},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class Colorfulness:
    """Per-image Hasler-Süsstrunk colorfulness metric (public 2003
    formula): with opponent planes rg = R-G and yb = (R+G)/2 - B,
    M = sqrt(var(rg) + var(yb)) + 0.3 * sqrt(mean(rg)^2 + mean(yb)^2)
    — the grayscale/monochrome-corpus filter. Opponent values are
    integer/half-integer, so all sums stay exact in float64 and the
    SQL twin's AVG-based variance lands on identical floats (variance
    computed as mean(x^2) - mean(x)^2 on BOTH sides for that
    reason)."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt).astype(np.float64)
            n = px.shape[0] * px.shape[1]
            rg = (px[:, :, 0] - px[:, :, 1]).reshape(-1)
            yb = (0.5 * (px[:, :, 0] + px[:, :, 1])
                  - px[:, :, 2]).reshape(-1)
            mrg = rg.sum() / n
            myb = yb.sum() / n
            vrg = (rg * rg).sum() / n - mrg * mrg
            vyb = (yb * yb).sum() / n - myb * myb
            vals.append(np.sqrt(max(vrg + vyb, 0.0))
                        + 0.3 * np.sqrt(mrg * mrg + myb * myb))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        return out.append_column(
            "colorfulness", pa.array(np.round(vals, 6), pa.float64()))


def image_colorfulness(
    ds: ray.data.Dataset, *, batch_size: int = 512,
    concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        Colorfulness, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class OtsuThreshold:
    """Per-image Otsu binarization threshold on the first channel —
    the foreground/background split behind document-scan and mask
    curation filters (Otsu 1979, public formula). The threshold domain
    is the image's DISTINCT present pixel values (between-class
    variance is constant across empty histogram bins, so the argmax is
    unchanged; restricting BOTH sides to present values makes the
    smallest-t tie-break well-defined for the SQL twin). All cumsum
    operands are exact integers in float64, so w0, mu0, mu1 and the
    variance land on bit-identical floats in numpy and DuckDB."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        thr, var6, fg = [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            c0 = px[:, :, 0].reshape(-1).astype(np.int64)
            u, cnt = np.unique(c0, return_counts=True)
            cn = np.cumsum(cnt).astype(np.float64)
            cs = np.cumsum(u * cnt).astype(np.float64)
            nn = float(c0.size)
            ss = float(cs[-1])
            w0 = cn / nn
            rest = nn - cn
            mu1 = np.where(rest > 0.0, (ss - cs) / np.where(
                rest > 0.0, rest, 1.0), 0.0)
            d = cs / cn - mu1
            stat = np.round(w0 * (1.0 - w0) * d * d, 6)
            ix = int(np.argmax(stat))  # first max = smallest t
            thr.append(int(u[ix]))
            var6.append(float(stat[ix]))
            fg.append(float(rest[ix]) / nn)
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column(
            "threshold", pa.array(np.asarray(thr, np.int64)))
        out = out.append_column(
            "between_var", pa.array(var6, pa.float64()))
        return out.append_column(
            "fg_frac", pa.array(np.round(fg, 6), pa.float64()))


def image_otsu(
    ds: ray.data.Dataset, *, batch_size: int = 512,
    concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        OtsuThreshold, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class GLCMTexture:
    """Per-image gray-level co-occurrence texture features (Haralick
    1973, public formulas) on the first channel, quantized to 8 levels,
    horizontal offset (dx=1): energy = sum(p^2), contrast =
    sum(p*(i-j)^2), homogeneity = sum(p/(1+|i-j|)). Every numerator is
    kept as an exact integer sum (homogeneity scaled by 840 =
    lcm(1..8)) and divided once at the end, so the SQL twin matches
    bit-for-bit regardless of summation order."""

    def __init__(self, levels: int = 8):
        self.levels = levels
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        lv = self.levels
        dd = np.abs(np.arange(lv * lv) // lv - np.arange(lv * lv) % lv)
        hom_w = 840 // (1 + dd)
        con_w = dd * dd
        en, con, hom = [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            q = (px[:, :, 0].astype(np.int64) * lv) // 256
            pair = (q[:, :-1] * lv + q[:, 1:]).reshape(-1)
            n = np.bincount(pair, minlength=lv * lv)
            tot = float(pair.size)
            en.append(float((n * n).sum()) / (tot * tot))
            con.append(float((n * con_w).sum()) / tot)
            hom.append(float((n * hom_w).sum()) / (840.0 * tot))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        for name, vals in [("glcm_energy", en), ("glcm_contrast", con),
                           ("glcm_homogeneity", hom)]:
            out = out.append_column(
                name, pa.array(np.round(vals, 6), pa.float64()))
        return out


def image_glcm(
    ds: ray.data.Dataset, levels: int = 8, *, batch_size: int = 512,
    concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        GLCMTexture, fn_constructor_kwargs={"levels": levels},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class HuMoments:
    """Per-image Hu moment invariants 1-4 on the first channel (Hu
    1962, public formulas) — the translation/scale-invariant shape
    fingerprints used to bucket near-identical crops. Raw moments
    M_pq = sum x^p y^q I are exact integers in float64 (<= 31^3 * 255
    * 1024 ~ 7.8e9), and every downstream value is derived through ONE
    shared expression tree (central -> normalized -> invariants), so
    the pixel-regeneration SQL twin reproduces each float bit-for-bit
    before the final 6dp round."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        h1, h2, h3, h4 = [], [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            gi = px[:, :, 0].astype(np.float64)
            h, w = gi.shape
            xs = np.arange(w, dtype=np.float64)[None, :]
            ys = np.arange(h, dtype=np.float64)[:, None]
            M00 = gi.sum()
            M10 = (xs * gi).sum()
            M01 = (ys * gi).sum()
            M20 = (xs * xs * gi).sum()
            M02 = (ys * ys * gi).sum()
            M11 = (xs * ys * gi).sum()
            M30 = (xs * xs * xs * gi).sum()
            M03 = (ys * ys * ys * gi).sum()
            M21 = (xs * xs * ys * gi).sum()
            M12 = (xs * ys * ys * gi).sum()
            # shared expression tree — mirrored verbatim in the twin
            xb = M10 / M00
            yb = M01 / M00
            mu20 = M20 - xb * M10
            mu02 = M02 - yb * M01
            mu11 = M11 - xb * M01
            mu30 = M30 - 3.0 * xb * M20 + 2.0 * xb * xb * M10
            mu12 = M12 - 2.0 * yb * M11 - xb * M02 + 2.0 * yb * yb * M10
            mu21 = M21 - 2.0 * xb * M11 - yb * M20 + 2.0 * xb * xb * M01
            mu03 = M03 - 3.0 * yb * M02 + 2.0 * yb * yb * M01
            n2 = M00 * M00
            n3 = M00 * M00 * np.sqrt(M00)
            e20 = mu20 / n2
            e02 = mu02 / n2
            e11 = mu11 / n2
            e30 = mu30 / n3
            e12 = mu12 / n3
            e21 = mu21 / n3
            e03 = mu03 / n3
            h1.append(e20 + e02)
            h2.append((e20 - e02) * (e20 - e02) + 4.0 * e11 * e11)
            h3.append((e30 - 3.0 * e12) * (e30 - 3.0 * e12)
                      + (3.0 * e21 - e03) * (3.0 * e21 - e03))
            h4.append((e30 + e12) * (e30 + e12)
                      + (e21 + e03) * (e21 + e03))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        for name, vals in [("hu1", h1), ("hu2", h2),
                           ("hu3", h3), ("hu4", h4)]:
            out = out.append_column(
                name, pa.array(np.round(vals, 6), pa.float64()))
        return out


def image_hu_moments(
    ds: ray.data.Dataset, *, batch_size: int = 512,
    concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        HuMoments, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class RunLength:
    """Per-image horizontal run-length stats of the first channel
    binarized at 128 — a cheap compressibility / noisiness proxy for
    scan curation. All counts are exact integers; mean run length is
    one integer-over-integer division, so the SQL twin (LAG over x
    within each row) matches bit-for-bit."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        nr, fr, ml = [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            b = px[:, :, 0].astype(np.int64) >= 128
            starts = np.ones_like(b)
            starts[:, 1:] = b[:, 1:] != b[:, :-1]
            n_runs = int(starts.sum())
            nr.append(n_runs)
            fr.append(int((starts & b).sum()))
            ml.append(float(np.round(b.size / n_runs, 6)))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column(
            "n_runs", pa.array(np.asarray(nr, np.int64)))
        out = out.append_column(
            "fg_runs", pa.array(np.asarray(fr, np.int64)))
        return out.append_column(
            "mean_run_len", pa.array(ml, pa.float64()))


def image_run_length(
    ds: ray.data.Dataset, *, batch_size: int = 512,
    concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        RunLength, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class BusiestBlock:
    """Per-image argmax-variance 8x8 block of the first channel — the
    'does this crop contain detail' selector behind patch sampling.
    Block sums / sumsq are exact integers; the variance expression
    tree ``(ss - s*s/n)/n`` is shared with the SQL twin and the argmax
    tie-breaks on the 6dp-ROUNDED statistic, then smallest (by, bx)."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        bys, bxs, bvar = [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            gi = px[:, :, 0].astype(np.int64)
            h, w = gi.shape
            bid = ((np.arange(h) // 8)[:, None] * 4
                   + (np.arange(w) // 8)[None, :]).ravel()
            flat = gi.ravel()
            n = np.bincount(bid, minlength=16)
            s = np.bincount(bid, weights=flat.astype(np.float64),
                            minlength=16)
            ss = np.bincount(
                bid, weights=(flat * flat).astype(np.float64),
                minlength=16)
            nn = np.where(n > 0, n, 1).astype(np.float64)
            v = np.round((ss - s * s / nn) / nn, 6)
            v[n == 0] = -np.inf
            ix = int(np.argmax(v))  # bid ascending => (by, bx) tie
            bys.append(ix // 4)
            bxs.append(ix % 4)
            bvar.append(float(v[ix]))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column("by", pa.array(np.asarray(bys, np.int64)))
        out = out.append_column("bx", pa.array(np.asarray(bxs, np.int64)))
        return out.append_column(
            "block_var", pa.array(bvar, pa.float64()))


def image_busiest_block(
    ds: ray.data.Dataset, *, batch_size: int = 512,
    concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        BusiestBlock, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class RadialProfile:
    """Per-image radial intensity profile (vignetting curve): mean of
    channel 0 by integer radius bin from the image center. The radius
    uses the doubled-coordinate trick r2 = (2x-(w-1))^2 + (2y-(h-1))^2
    so everything stays an exact integer; floor(sqrt(int))//2 is
    bit-stable across numpy and DuckDB (IEEE sqrt is correctly
    rounded, and non-square r2 is never within an ulp of an integer)."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rbins, means, npx = [], [], [], []
        for iid, data, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            gi = px[:, :, 0].astype(np.int64)
            h, w = gi.shape
            dy = 2 * np.arange(h, dtype=np.int64) - (h - 1)
            dx = 2 * np.arange(w, dtype=np.int64) - (w - 1)
            r2 = (dy * dy)[:, None] + (dx * dx)[None, :]
            rb = (np.floor(np.sqrt(r2.astype(np.float64)))
                  .astype(np.int64) // 2).ravel()
            s = np.bincount(rb, weights=gi.ravel().astype(np.float64))
            n = np.bincount(rb)
            nz = np.nonzero(n)[0]
            ids.extend([iid] * len(nz))
            rbins.extend(nz.tolist())
            means.extend(np.round(s[nz] / n[nz], 6).tolist())
            npx.extend(n[nz].tolist())
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "rbin": pa.array(rbins, pa.int64()),
            "mean_px": pa.array(means, pa.float64()),
            "n_px": pa.array(npx, pa.int64()),
        })


def image_radial_profile(
    ds: ray.data.Dataset, *, batch_size: int = 512,
    concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        RadialProfile, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class QuantileStretch:
    """Per-image percentile contrast-stretch audit (channel 0):
    p_lo / p_hi are the smallest pixel values whose cumulative count
    reaches ceil(0.02 n) / ceil(0.98 n) (explicit k-th-smallest rank
    rule — no interpolation, so both sides agree exactly), n_below /
    n_above count pixels strictly outside the band, and stretch_mean
    = (S/n - p_lo) / (p_hi - p_lo) with S = sum of clamp(v, p_lo,
    p_hi) — an exact integer, so the one float division tree is
    mirrored verbatim by the SQL twin's histogram-cumsum rebuild.
    Near-constant images (p_hi == p_lo) report 0."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        plos, phis, nbs, nas, sms = [], [], [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)[:, :, 0].reshape(-1)
            n = px.size
            cum = np.cumsum(np.bincount(px, minlength=256))
            k_lo = int(np.ceil(0.02 * n))
            k_hi = int(np.ceil(0.98 * n))
            p_lo = int(np.searchsorted(cum, k_lo))
            p_hi = int(np.searchsorted(cum, k_hi))
            s = int(np.clip(px, p_lo, p_hi).astype(np.int64).sum())
            # shared expression tree — mirrored verbatim in the twin
            sm = ((float(s) / float(n) - float(p_lo))
                  / float(p_hi - p_lo) if p_hi > p_lo else 0.0)
            plos.append(p_lo)
            phis.append(p_hi)
            nbs.append(int((px < p_lo).sum()))
            nas.append(int((px > p_hi).sum()))
            sms.append(sm)
        return pa.table({
            "image_id": batch["image_id"],
            "p_lo": pa.array(plos, pa.int64()),
            "p_hi": pa.array(phis, pa.int64()),
            "n_below": pa.array(nbs, pa.int64()),
            "n_above": pa.array(nas, pa.int64()),
            "stretch_mean": pa.array(np.round(sms, 6),
                                     pa.float64())})


def image_quantile_stretch(
    ds: ray.data.Dataset, *, batch_size: int = 512,
    concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        QuantileStretch, batch_format="pyarrow",
        batch_size=batch_size, concurrency=default_pool(concurrency), num_cpus=1)


class TenengradFocus:
    """Per-image Tenengrad focus measure (Sobel gradient energy on the
    first channel, interior pixels only) — the classic sharpness rank
    used to drop out-of-focus captures. gx/gy are exact integer Sobel
    responses (|gx| <= 4*255), the energy sum is an exact integer in
    f64 (<= 2*1020^2*900 ~ 1.9e9), and edge_frac counts responses with
    gx^2+gy^2 >= thr — so the pixel-regeneration SQL twin (an 8-offset
    weighted self-join) matches bit-for-bit through the one final
    division."""

    def __init__(self, thr: int = 250_000):
        self.thr = thr
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, fracs = [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            gi = px[:, :, 0].astype(np.int64)
            h, w = gi.shape
            if h < 3 or w < 3:
                means.append(0.0)
                fracs.append(0.0)
                continue
            gx = ((gi[:-2, 2:] + 2 * gi[1:-1, 2:] + gi[2:, 2:])
                  - (gi[:-2, :-2] + 2 * gi[1:-1, :-2] + gi[2:, :-2]))
            gy = ((gi[2:, :-2] + 2 * gi[2:, 1:-1] + gi[2:, 2:])
                  - (gi[:-2, :-2] + 2 * gi[:-2, 1:-1] + gi[:-2, 2:]))
            e = gx * gx + gy * gy
            n_int = e.size
            means.append(float(e.sum()) / n_int)
            fracs.append(float((e >= self.thr).sum()) / n_int)
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        for name, vals in [("tenengrad", means), ("edge_frac", fracs)]:
            out = out.append_column(
                name, pa.array(np.round(vals, 6), pa.float64()))
        return out


def image_tenengrad(
    ds: ray.data.Dataset, *, thr: int = 250_000, batch_size: int = 512,
    concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        TenengradFocus, fn_constructor_kwargs={"thr": thr},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class BorderContrast:
    """Per-image border-ring vs interior mean intensity (channel 0) —
    the letterbox / frame / vignette detector. Both sums are exact
    integers; contrast = border_mean - inner_mean computed after the
    two exact divisions, mirrored verbatim in the SQL twin. Images too
    small to have an interior (h<3 or w<3) report inner_mean = 0 by
    convention."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        bm, im, ct = [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            gi = px[:, :, 0].astype(np.int64)
            h, w = gi.shape
            tot = int(gi.sum())
            n_all = gi.size
            if h < 3 or w < 3:
                bmean = tot / n_all
                imean = 0.0
            else:
                inner = gi[1:-1, 1:-1]
                isum = int(inner.sum())
                imean = isum / inner.size
                bmean = (tot - isum) / (n_all - inner.size)
            bm.append(bmean)
            im.append(imean)
            ct.append(bmean - imean)
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        for name, vals in [("border_mean", bm), ("inner_mean", im),
                           ("border_contrast", ct)]:
            out = out.append_column(
                name, pa.array(np.round(vals, 6), pa.float64()))
        return out


def image_border_contrast(
    ds: ray.data.Dataset, *, batch_size: int = 512, concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        BorderContrast, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class DominantColor:
    """Per-image dominant quantized color: each pixel maps to a 6-bit
    code (r>>6)<<4 | (g>>6)<<2 | (b>>6) (64 cells of the RGB cube);
    the mode code wins, ties broken on the SMALLEST code (np.argmax
    returns the first maximal bin, which is exactly ORDER BY n DESC,
    code ASC). share = mode count / pixels, the one float division."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        codes, shares = [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt).astype(np.int64)
            code = ((px[:, :, 0] >> 6) << 4 | (px[:, :, 1] >> 6) << 2
                    | (px[:, :, 2] >> 6)).reshape(-1)
            n = np.bincount(code, minlength=64)
            k = int(np.argmax(n))
            codes.append(k)
            shares.append(float(n[k]) / code.size)
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column(
            "color_code", pa.array(codes, pa.int64()))
        out = out.append_column(
            "color_share", pa.array(np.round(shares, 6), pa.float64()))
        return out


def image_dominant_color(
    ds: ray.data.Dataset, *, batch_size: int = 512, concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        DominantColor, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class EqualizeAudit:
    """Per-image histogram-equalization audit (channel 0): the standard
    integer mapping eq(v) = (cdf(v) - cdf_min) * 255 // (n - cdf_min)
    (floor on exact integers, cdf_min = count of the smallest present
    value). Reports the equalized mean (exact integer sum, one
    division) and the number of distinct output levels — how much
    dynamic range equalization would actually recover. A constant
    image maps to level 0 by convention."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        meq, lev = [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            v = px[:, :, 0].astype(np.int64).reshape(-1)
            vals, cnts = np.unique(v, return_counts=True)
            cdf = np.cumsum(cnts)
            n = int(cdf[-1])
            cdf_min = int(cnts[0])
            if n > cdf_min:
                eq = (cdf - cdf_min) * 255 // (n - cdf_min)
            else:
                eq = np.zeros_like(cdf)
            meq.append(float((eq * cnts).sum()) / n)
            lev.append(int(np.unique(eq).size))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column(
            "eq_mean", pa.array(np.round(meq, 6), pa.float64()))
        out = out.append_column("eq_levels", pa.array(lev, pa.int64()))
        return out


def image_equalize_audit(
    ds: ray.data.Dataset, *, batch_size: int = 512, concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        EqualizeAudit, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class BitPlaneEntropy:
    """Per-image bit-plane binary entropy on channel 0 — the
    bit-significance profile behind lossless-compressibility and
    noise-floor curation (low planes of natural images are ~1 bit of
    entropy; synthetic/flat regions collapse the high planes). One
    long row per (image, bit): p1 = fraction of set bits (exact
    integer count / n) and its binary entropy, rounded 6dp. All eight
    planes extracted in one vectorized shift pass per image."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bits, p1s, ents = [], [], [], []
        shifts = np.arange(8, dtype=np.int64)
        for iid, data, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            c0 = px[:, :, 0].reshape(-1).astype(np.int64)
            ones = ((c0[:, None] >> shifts) & 1).sum(axis=0)
            p = ones.astype(np.float64) / float(c0.size)
            with np.errstate(divide="ignore", invalid="ignore"):
                h = -(np.where(p > 0, p * np.log2(p), 0.0)
                      + np.where(p < 1, (1 - p) * np.log2(1 - p), 0.0))
            ids.extend([iid] * 8)
            bits.extend(range(8))
            p1s.extend(np.round(p, 6))
            ents.extend(np.round(h, 6))
        return pa.table({
            "image_id": pa.array(ids),
            "bit": pa.array(bits, pa.int64()),
            "p1": pa.array(p1s, pa.float64()),
            "entropy": pa.array(ents, pa.float64()),
        })


def image_bitplane_entropy(
    ds: ray.data.Dataset, *, batch_size: int = 512, concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        BitPlaneEntropy, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class NeighborBrighter:
    """LBP-style local-contrast census on channel 0: for each INTERIOR
    pixel, count its 8 neighbors with a strictly greater value, then
    histogram the counts 0..8 per image (Ojala et al. 2002's LBP
    collapsed to its rotation-invariant popcount, public formula).
    Pure integer comparisons via eight array shifts — bit-exact vs the
    SQL neighbor self-join."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nb, npx = [], [], []
        for iid, data, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            c0 = px[:, :, 0].astype(np.int64)
            if c0.shape[0] < 3 or c0.shape[1] < 3:
                continue
            ctr = c0[1:-1, 1:-1]
            cnt = np.zeros_like(ctr)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    h, w = c0.shape
                    cnt += (c0[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
                            > ctr).astype(np.int64)
            hist = np.bincount(cnt.reshape(-1), minlength=9)
            nz = np.flatnonzero(hist)
            ids.extend([iid] * len(nz))
            nb.extend(nz)
            npx.extend(hist[nz])
        return pa.table({
            "image_id": pa.array(ids),
            "n_brighter": pa.array(np.asarray(nb, np.int64)),
            "n_px": pa.array(np.asarray(npx, np.int64)),
        })


def image_neighbor_brighter(
    ds: ray.data.Dataset, *, batch_size: int = 512, concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        NeighborBrighter, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


# ordered octant rules shared (verbatim) by the numpy np.select below
# and the SQL CASE twin — integer comparisons only, so no atan2 ulp
# can flip a boundary pixel between the two sides
_OCTANT_RULES = (
    "gx > 0 AND gy >= 0 AND gx > gy",
    "gx > 0 AND gy > 0 AND gy >= gx",
    "gx <= 0 AND gy > 0 AND gy > -gx",
    "gx < 0 AND gy >= 0",
    "gx < 0 AND gy < 0 AND -gx > -gy",
    "gx <= 0 AND gy < 0",
    "gx > 0 AND gy < 0 AND -gy > gx",
)


class GradOrientHist:
    """HOG-lite: histogram of central-difference gradient octants on
    channel 0 interior pixels (Dalal & Triggs 2005-style orientation
    binning, public technique), with the octant decided by ORDERED
    integer sign/magnitude comparisons instead of atan2 — the same
    rule list drives the SQL CASE, so bin edges are bit-exact. Zero
    gradients are skipped. Per (image, octant): pixel count and the
    exact integer sum of squared gradient magnitude."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ob, npx, m2 = [], [], [], []
        for iid, data, fmt in zip(batch["image_id"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            c0 = px[:, :, 0].astype(np.int64)
            if c0.shape[0] < 3 or c0.shape[1] < 3:
                continue
            gx = c0[1:-1, 2:] - c0[1:-1, :-2]
            gy = c0[2:, 1:-1] - c0[:-2, 1:-1]
            gx, gy = gx.reshape(-1), gy.reshape(-1)
            keep = (gx != 0) | (gy != 0)
            gx, gy = gx[keep], gy[keep]
            conds = [
                (gx > 0) & (gy >= 0) & (gx > gy),
                (gx > 0) & (gy > 0) & (gy >= gx),
                (gx <= 0) & (gy > 0) & (gy > -gx),
                (gx < 0) & (gy >= 0),
                (gx < 0) & (gy < 0) & (-gx > -gy),
                (gx <= 0) & (gy < 0),
                (gx > 0) & (gy < 0) & (-gy > gx),
            ]
            o = np.select(conds, np.arange(7), default=7)
            mag2 = gx * gx + gy * gy
            cnt = np.bincount(o, minlength=8)
            s2 = np.bincount(o, weights=mag2.astype(np.float64),
                             minlength=8).astype(np.int64)
            nz = np.flatnonzero(cnt)
            ids.extend([iid] * len(nz))
            ob.extend(nz)
            npx.extend(cnt[nz])
            m2.extend(s2[nz])
        return pa.table({
            "image_id": pa.array(ids),
            "octant": pa.array(np.asarray(ob, np.int64)),
            "n_px": pa.array(np.asarray(npx, np.int64)),
            "sum_mag2": pa.array(np.asarray(m2, np.int64)),
        })


def image_grad_orient_hist(
    ds: ray.data.Dataset, *, batch_size: int = 512, concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        GradOrientHist, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class FractalDim:
    """Per-image box-counting fractal dimension (Minkowski-Bouligand,
    public method) of the brighter-than-average pixel set: threshold
    each pixel on its exact integer channel sum (occupied iff
    s3 * n_pix > total_sum — an all-integer comparison both the
    engine and the SQL twin evaluate identically), count occupied
    boxes at scales 1/2/4/8, and fit dim = -slope of ln(N_s) vs
    ln(s) by closed-form OLS over the four points. ~2 for texture
    filling the frame, ~1 for edge/line structure — the structural
    complexity curation screen next to the entropy/GLCM features.
    Empty occupied sets (perfectly flat images) get the defined 0.0."""

    _LN_S = np.log(np.array([1.0, 2.0, 4.0, 8.0]))

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        xs = self._LN_S
        k = 4.0
        sx = xs.sum()
        sxx = (xs * xs).sum()
        dims, occn = [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt).astype(np.float64)
            h, w = px.shape[0], px.shape[1]
            s3 = px.sum(axis=2)  # integer channel sums, exact
            tot = s3.sum()
            npix = float(h * w)
            yy, xx = np.nonzero(s3 * npix > tot)
            counts = np.empty(4, np.float64)
            for j, s in enumerate((1, 2, 4, 8)):
                counts[j] = len(np.unique((yy // s) * 64 + xx // s))
            ys = np.log(np.maximum(counts, 1.0))
            sy = ys.sum()
            sxy = (xs * ys).sum()
            slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
            dims.append(-slope)
            occn.append(len(yy))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column(
            "n_occupied", pa.array(np.asarray(occn, np.int64)))
        return out.append_column(
            "fractal_dim", pa.array(np.round(dims, 4), pa.float64()))


def image_fractal_dim(
    ds: ray.data.Dataset, *, batch_size: int = 512, concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        FractalDim, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1)


class QuadrantAsymmetry:
    """Per-image left-right and top-bottom luminance asymmetry:
    |mean(half) - mean(other half)| of the exact integer channel sum
    plane, middle row/column excluded when the dimension is odd.
    The horizon/vignetting/split-frame screen; near 0 for uniform
    scenes. All sums are exact integers in float64, so the two AVG
    ratios and their difference are bit-identical to the SQL twin's."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        lr, tb = [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt).astype(np.float64)
            h, w = px.shape[0], px.shape[1]
            s3 = px.sum(axis=2)
            left = s3[:, : w // 2]
            right = s3[:, (w + 1) // 2:]
            top = s3[: h // 2, :]
            bottom = s3[(h + 1) // 2:, :]
            lr.append(abs(left.sum() / left.size
                          - right.sum() / right.size))
            tb.append(abs(top.sum() / top.size
                          - bottom.sum() / bottom.size))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column(
            "lr_asym", pa.array(np.round(lr, 6), pa.float64()))
        return out.append_column(
            "tb_asym", pa.array(np.round(tb, 6), pa.float64()))


def image_quadrant_asymmetry(
    ds: ray.data.Dataset, *, batch_size: int = 512, concurrency=None,
) -> ray.data.Dataset:
    return ds.map_batches(
        QuadrantAsymmetry, batch_format="pyarrow",
        batch_size=batch_size, concurrency=default_pool(concurrency), num_cpus=1)


class ChannelBalance:
    """Per-image white-balance / exposure QA (decode actor stage):
    gray-world cast ratio (max channel mean / min channel mean — 1.0
    for a neutral image, >> 1 for a color cast) and the clipped-pixel
    fractions at 0 and 255 (blown shadows / highlights) — the two
    standard exposure screens an image-training pipeline drops frames
    on."""

    def __init__(self):
        self.native = _NATIVE

    def __call__(self, batch: pa.Table) -> pa.Table:
        ratios, lo, hi = [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(),
                             batch["fmt"].to_pylist()):
            px = _decode_or_raise(data, fmt)
            means = px.astype(np.float64).mean(axis=(0, 1))
            ratios.append(float(means.max() / means.min())
                          if means.min() > 0 else 0.0)
            npx = float(px.size)
            lo.append(float((px == 0).sum()) / npx)
            hi.append(float((px == 255).sum()) / npx)
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column(
            "cast_ratio", pa.array(np.round(ratios, 6), pa.float64()))
        out = out.append_column(
            "clip_lo", pa.array(np.round(lo, 6), pa.float64()))
        out = out.append_column(
            "clip_hi", pa.array(np.round(hi, 6), pa.float64()))
        return out


def channel_balance(ds: ray.data.Dataset, *, batch_size: int = 512,
                    concurrency=None) -> ray.data.Dataset:
    return ds.map_batches(
        ChannelBalance, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency), num_cpus=1,
    )
