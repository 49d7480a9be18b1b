"""Unit tests for the n-gram Jaccard pair op and the multimodal
frame-sample / audio-chunk plan stages (SURVEY §2.7 D3, multimodal
mandate: plumbing real, external decode stubbed)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest


# ---------------------------------------------------------------- ngram jaccard

def test_ngram_jaccard_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    from engine.ops import dedup

    rng = np.random.default_rng(42)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]
    texts = [
        " ".join(rng.choice(words, 30)) for _ in range(40)
    ]
    # plant near-dups: copies with a short mutated tail
    for i in range(5):
        texts.append(texts[i] + " zulu tail")
    docs = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = dedup.ngram_jaccard_pairs(
        rd.from_pandas(docs), threshold=0.5, bands=32, num_perm=64
    )
    # brute-force oracle: exact jaccard over all pairs
    want = []
    for (ia, ta), (ib, tb) in itertools.combinations(
        zip(docs["doc_id"], docs["text"]), 2
    ):
        j = dedup.ngram_jaccard(ta, tb, k=5)
        if j >= 0.5:
            want.append((min(ia, ib), max(ia, ib), round(j, 6)))
    want_set = {(a, b) for a, b, _ in want}
    got_set = set(zip(got["a"], got["b"]))
    # every planted pair (jaccard >> threshold) must be found; LSH may
    # miss borderline pairs but all true pairs here are well above 0.5
    assert got_set == want_set
    want_j = {(a, b): j for a, b, j in want}
    for a, b, j in zip(got["a"], got["b"], got["jaccard"]):
        assert abs(j - want_j[(a, b)]) < 1e-9


# ---------------------------------------------------------------- frame sampler

def test_frame_sampler_plan_matches_linspace():
    from engine.ops.multimodal import FrameSampler

    fs = FrameSampler(frames_per_clip=4)
    batch = pd.DataFrame({"clip_id": np.arange(1, 15), "n_frames": np.arange(1, 15)})
    out = fs(batch)
    for f in range(1, 15):
        got = out[out["n_frames"] == f]["frame_index"].tolist()
        want = np.unique(
            np.linspace(0, max(0, f - 1), min(4, f)).astype(int)
        ).tolist()
        assert got == want, (f, got, want)
    # rows carry through all metadata columns
    assert set(out.columns) == {"clip_id", "n_frames", "frame_index"}


def test_frame_sampler_defaults_missing_column_to_one_frame():
    from engine.ops.multimodal import FrameSampler

    out = FrameSampler(4)(pd.DataFrame({"clip_id": [1, 2]}))
    assert out["frame_index"].tolist() == [0, 0]


# ---------------------------------------------------------------- audio chunker

def test_audio_chunker_windows_cover_exactly():
    from engine.ops.multimodal import AudioChunker

    ch = AudioChunker(chunk_seconds=5.0)
    batch = pd.DataFrame(
        {
            "audio_id": [1, 2, 3],
            "n_samples": [80000, 80001, 1],  # exact fit / one over / tiny
            "sample_rate": [16000, 16000, 16000],
        }
    )
    out = ch(batch)
    assert out[out["audio_id"] == 1]["chunk_index"].tolist() == [0]
    assert out[out["audio_id"] == 2]["chunk_index"].tolist() == [0, 1]
    assert out[out["audio_id"] == 3]["end_sample"].tolist() == [1]
    # windows tile [0, n_samples) without gap or overlap
    for aid, g in out.groupby("audio_id"):
        g = g.sort_values("chunk_index")
        n = batch[batch["audio_id"] == aid]["n_samples"].iloc[0]
        assert g["start_sample"].iloc[0] == 0
        assert g["end_sample"].iloc[-1] == n
        assert (g["start_sample"].to_numpy()[1:] == g["end_sample"].to_numpy()[:-1]).all()


def test_external_codec_decode_is_stubbed():
    from engine.ops import multimodal

    with pytest.raises(NotImplementedError, match="external codec"):
        multimodal._decode_or_raise(b"\x00", "jpeg")


def test_augment_exactness_and_determinism(ray_session, tmp_path):
    """Augment params derive from hash(image_id): re-deriving the same
    transform on the decoded original must reproduce aug_bytes exactly,
    and a second run is byte-identical."""
    import ray.data

    from engine import codec, fixtures
    from engine.ops.multimodal import Augment, augment_images
    from engine.ops.sketch import _hash64

    d = str(tmp_path / "imgs")
    fixtures.write_images_parquet(60, d, num_files=2)
    ds = ray.data.read_parquet(d, columns=["image_id", "bytes", "fmt"])
    out = augment_images(ds, concurrency=(1, 2)).to_pandas().sort_values(
        "image_id", ignore_index=True
    )
    out2 = augment_images(ds, concurrency=(1, 2)).to_pandas().sort_values(
        "image_id", ignore_index=True
    )
    assert out["aug_bytes"].tolist() == out2["aug_bytes"].tolist()

    src = ds.to_pandas().set_index("image_id")
    aug = Augment()
    for _, row in out.head(12).iterrows():
        px = codec.decode(src.loc[row["image_id"], "bytes"],
                          src.loc[row["image_id"], "fmt"])
        h = int(_hash64(np.asarray([row["image_id"]], dtype=object))[0])
        assert bool(h & 1) == bool(row["aug_hflip"])
        if row["aug_hflip"]:
            px = px[:, ::-1]
        if row["aug_rot90"]:
            px = np.rot90(px, k=int(row["aug_rot90"]))
        f = float(row["aug_crop"])
        if f < 1.0:
            ch, cw = max(1, int(px.shape[0] * f)), max(1, int(px.shape[1] * f))
            y0, x0 = (px.shape[0] - ch) // 2, (px.shape[1] - cw) // 2
            px = px[y0:y0 + ch, x0:x0 + cw]
        got = codec.decode(row["aug_bytes"], "raw16")
        assert got.shape == (row["aug_h"], row["aug_w"], 3)
        np.testing.assert_array_equal(got, np.ascontiguousarray(px))


def test_prepare_image_corpus_dedups_and_is_deterministic(ray_session, tmp_path):
    import ray.data

    from engine import fixtures
    from engine.pipeline.corpus import prepare_image_corpus

    d = str(tmp_path / "imgs")
    fixtures.write_images_parquet(300, d, num_files=2)
    src = ray.data.read_parquet(d, columns=["image_id", "bytes", "fmt", "phash"])
    a = prepare_image_corpus(src).to_pandas().sort_values(
        "image_id", ignore_index=True)
    b = prepare_image_corpus(src).to_pandas().sort_values(
        "image_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)  # byte-identical manifests

    full = src.to_pandas()
    assert a["phash"].is_unique
    # keep-rule: the smallest image_id per phash survives
    want_ids = set(
        full.sort_values("image_id").drop_duplicates("phash")["image_id"]
    )
    assert set(a["image_id"]) == want_ids
    # fixture plants exact duplicates, so dedup actually dropped rows
    assert len(a) < len(full)

    # survivor gate: forcing the big-side path (gate 0 -> distributed
    # bloom_semi_join, no driver id pull) must be byte-identical to the
    # broadcast path
    c = prepare_image_corpus(src, survivor_gate_ids=0).to_pandas(
    ).sort_values("image_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, c)


def test_embedding_near_dups_multiprobe_boundary_pair(ray_session):
    """A 0.95+-cosine pair that straddles exactly ONE hyperplane lands
    in different exact buckets; the 1-bit-flip multi-probe must still
    find it (the round-2 recall gap of exact-signature bucketing)."""
    import ray.data

    from engine.ops.dedup import _lsh_planes, embedding_near_dups

    dim, num_planes, seed = 16, 8, 42
    planes = _lsh_planes(dim, num_planes, seed)
    pn = planes / np.linalg.norm(planes, axis=0, keepdims=True)
    rng = np.random.default_rng(5)
    pair = None
    for _ in range(200):
        u = rng.standard_normal(dim)
        u /= np.linalg.norm(u)
        marg = u @ pn
        j = int(np.argmin(np.abs(marg)))
        v = u - 2.0 * 1.05 * marg[j] * pn[:, j]
        v /= np.linalg.norm(v)
        sig_u = (u @ planes) > 0
        sig_v = (v @ planes) > 0
        c = float(u @ v)
        if (sig_u != sig_v).sum() == 1 and c >= 0.951:
            pair = (u, v, c)
            break
    assert pair is not None, "construction failed to plant a boundary pair"
    u, v, c = pair

    far = [rng.standard_normal(dim) for _ in range(20)]
    far = [x / np.linalg.norm(x) for x in far]
    df = pd.DataFrame({
        "vec_id": np.arange(1, len(far) + 3, dtype=np.int64),
        "embedding": [u.tolist(), v.tolist()] + [x.tolist() for x in far],
    })
    out = embedding_near_dups(
        ray.data.from_pandas(df).repartition(2),
        threshold=0.95, num_planes=num_planes, seed=seed)
    got = {(int(r.a), int(r.b)) for r in out.itertuples()}
    assert (1, 2) in got
    row = out[(out["a"] == 1) & (out["b"] == 2)].iloc[0]
    assert row["cos"] == pytest.approx(round(c, 6), abs=2e-6)
    # and every reported pair genuinely meets the threshold
    vecs = {int(i): np.asarray(e)
            for i, e in zip(df["vec_id"], df["embedding"])}
    for r in out.itertuples():
        assert float(vecs[int(r.a)] @ vecs[int(r.b)]) >= 0.95 - 1e-9


def test_image_similar_topk_matches_bruteforce(ray_session):
    """Image-feature similarity search: the distributed cosine top-k
    over decoded-image feature vectors equals a numpy brute force with
    the same (score desc, id asc) tie rule."""
    import __ray_entry__ as em

    q = em.queries()
    got = q["image_similar_topk"]("/root/testdata/sf0.001")
    got = got.sort_values(["query_vec_id", "rank"], ignore_index=True)
    assert set(got.columns) >= {"query_vec_id", "rank", "vec_id", "cos"}
    assert got["query_vec_id"].nunique() == 5
    assert (got.groupby("query_vec_id").size() == 5).all()

    # rebuild the raw16-subset feature matrix driver-side as the
    # oracle (the query narrows to raw16 so its DuckDB twin can
    # regenerate the features; queries = 5 smallest raw16 ids)
    from engine.io import read_images
    from engine.ops import multimodal

    ds = read_images(em._geo_fixture_dir(),
                     columns=["image_id", "bytes", "fmt"])
    f = multimodal.image_features(
        ds.filter(expr="fmt == 'raw16'"), concurrency=(1, 2)
    ).to_pandas()
    fcols = ["mean_r", "mean_g", "mean_b", "lum_mean", "lum_std",
             "edge_energy"]
    v = f[fcols].to_numpy(dtype=np.float64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    ids = f["image_id"].to_numpy()
    order = np.argsort(ids)
    v, ids = v[order], ids[order]
    qids = ids[:5].tolist()
    assert got["query_vec_id"].unique().tolist() == qids
    qv = v[np.searchsorted(ids, qids)]
    sim = qv @ v.T
    for qi, qid in enumerate(qids):
        row = np.round(sim[qi], 12)
        best = sorted(zip(-row, ids))[:5]
        want_ids = [b[1] for b in best]
        mine = got[got["query_vec_id"] == qid].sort_values("rank")
        assert mine["vec_id"].tolist() == want_ids, qid
        np.testing.assert_allclose(
            mine["cos"].to_numpy(),
            [round(-b[0], 6) for b in best], rtol=0, atol=2e-6,
        )


def test_pixel_histogram_exact(ray_session):
    import ray.data

    from engine import codec
    from engine.ops.multimodal import pixel_histogram

    rng = np.random.default_rng(21)
    imgs = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            for _ in range(12)]
    df = pd.DataFrame({
        "image_id": [f"i{k}" for k in range(len(imgs))],
        "bytes": [codec.encode(px, "raw16") for px in imgs],
        "fmt": "raw16",
    })
    out = (pixel_histogram(
        ray.data.from_pandas(df).repartition(3), bins=16,
        concurrency=(1, 2))
        .to_pandas().sort_values(["channel", "bin"],
                                 ignore_index=True))
    want = np.zeros((3, 16), np.int64)
    for px in imgs:
        dec = codec.decode(codec.encode(px, "raw16"), "raw16")
        for c in range(3):
            want[c] += np.bincount((dec[:, :, c] // 16).ravel(), minlength=16)
    assert len(out) == 48
    assert (out["n"].to_numpy().reshape(3, 16) == want).all()
    assert out["n"].sum() == 12 * 8 * 8 * 3


def test_embedding_pca_matches_numpy(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.ops.simsearch import embedding_pca

    rng = np.random.default_rng(31)
    # anisotropic cloud: variance concentrated in the first axes
    d, n = 12, 400
    scales = np.linspace(3.0, 0.1, d)
    x = rng.normal(size=(n, d)) * scales
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(x.astype(np.float32)),
                              pa.list_(pa.float32())),
    })
    out = embedding_pca(
        ray.data.from_arrow(t).repartition(4), k=5)
    xf = x.astype(np.float32).astype(np.float64)
    cov = np.cov(xf.T, bias=True)
    evals = np.sort(np.linalg.eigh(cov)[0])[::-1]
    assert np.allclose(out["eigval"], evals[:5], rtol=1e-9)
    assert np.allclose(
        out["explained_var"], evals[:5] / evals.sum(), rtol=1e-9)
    assert (np.diff(out["eigval"]) <= 0).all()

    # trace-identity tie to the SQL-twinned companion (round-4 verdict
    # item 2): sum lambda^p over ALL eigenvalues == tr(C^p)
    from engine.ops.simsearch import embedding_cov_trace_moments

    mom = embedding_cov_trace_moments(
        ray.data.from_arrow(t).repartition(4), powers=4)
    assert mom["power"].tolist() == [1, 2, 3, 4]
    for p, tv in zip(mom["power"], mom["trace_val"]):
        assert tv == pytest.approx(float((evals ** p).sum()), abs=2e-6)


def test_image_sharpness_blur_ordering(ray_session):
    import ray.data

    from engine import codec
    from engine.ops.multimodal import image_sharpness

    rng = np.random.default_rng(61)
    sharp = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    # 3x3 box blur (manual, valid region padded by edge replication)
    f = sharp.astype(np.float64)
    pad = np.pad(f, ((1, 1), (1, 1), (0, 0)), mode="edge")
    blur = np.zeros_like(f)
    for dy in range(3):
        for dx in range(3):
            blur += pad[dy:dy + 16, dx:dx + 16]
    blur = (blur / 9.0).astype(np.uint8)
    df = pd.DataFrame({
        "image_id": ["sharp", "blur"],
        "bytes": [codec.encode(sharp, "raw16"),
                  codec.encode(blur, "raw16")],
        "fmt": "raw16",
    })
    out = (image_sharpness(ray.data.from_pandas(df),
                           concurrency=(1, 2))
           .to_pandas().set_index("image_id")["sharpness"])
    assert out["sharp"] > out["blur"] * 2

    # exact value check against a direct Laplacian
    dec = codec.decode(codec.encode(sharp, "raw16"), "raw16")
    lum = dec.astype(np.float64).mean(axis=2)
    lap = (-4 * lum[1:-1, 1:-1] + lum[:-2, 1:-1] + lum[2:, 1:-1]
           + lum[1:-1, :-2] + lum[1:-1, 2:])
    assert out["sharp"] == pytest.approx(round(lap.var(), 6))


def test_patchify_grid_and_roundtrip(ray_session):
    import ray.data

    from engine import codec
    from engine.ops.multimodal import patchify_images

    rng = np.random.default_rng(67)
    img = rng.integers(0, 256, (20, 27, 3), dtype=np.uint8)
    df = pd.DataFrame({
        "image_id": ["im0"],
        "bytes": [codec.encode(img, "raw16")],
        "fmt": "raw16",
    })
    out = (patchify_images(ray.data.from_pandas(df), patch=8,
                           concurrency=(1, 2))
           .to_pandas().sort_values("patch_ix", ignore_index=True))
    dec = codec.decode(codec.encode(img, "raw16"), "raw16")
    assert len(out) == (20 // 8) * (27 // 8)  # 2 x 3 grid
    for r in out.itertuples():
        tile = codec.decode(r.bytes, "raw16")
        want = dec[r.py * 8:(r.py + 1) * 8, r.px * 8:(r.px + 1) * 8]
        rt = codec.decode(codec.encode(
            np.ascontiguousarray(want), "raw16"), "raw16")
        assert (tile == rt).all()


def test_pixel_moments_exact(ray_session):
    import ray.data

    from engine import codec
    from engine.ops.multimodal import pixel_moments

    rng = np.random.default_rng(71)
    imgs = [rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
            for _ in range(9)]
    df = pd.DataFrame({
        "image_id": [f"i{k}" for k in range(9)],
        "bytes": [codec.encode(px, "raw16") for px in imgs],
        "fmt": "raw16",
    })
    out = pixel_moments(ray.data.from_pandas(df).repartition(3),
                        concurrency=(1, 2))
    dec = [codec.decode(codec.encode(px, "raw16"), "raw16")
           for px in imgs]
    for c in range(3):
        allpx = np.concatenate(
            [d[:, :, c].ravel() for d in dec]).astype(np.float64)
        row = out[out["channel"] == c].iloc[0]
        assert int(row["n_pixels"]) == allpx.size
        assert row["mean"] == pytest.approx(allpx.mean(), rel=1e-12)
        assert row["std"] == pytest.approx(allpx.std(), rel=1e-9)


def test_patch_hash_pairs_planted_crop(ray_session):
    import ray.data

    from engine import codec
    from engine.ops.dedup import patch_hash_pairs
    from engine.ops.multimodal import patchify_images

    rng = np.random.default_rng(73)
    base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    # imgB embeds base's top-left 16x16 block at ITS top-left, so
    # 4 aligned 8x8 patches are byte-identical; imgC is unrelated
    b = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    b[:16, :16] = base[:16, :16]
    c = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    df = pd.DataFrame({
        "image_id": ["A", "B", "C"],
        "bytes": [codec.encode(x, "raw16") for x in (base, b, c)],
        "fmt": "raw16",
    })
    patches = patchify_images(
        ray.data.from_pandas(df), patch=8, concurrency=(1, 2))
    out = patch_hash_pairs(patches, num_shards=4).to_pandas()
    got = {(r.image_id_a, r.image_id_b): int(r.n_shared)
           for r in out.itertuples()}
    assert got == {("A", "B"): 4}


def test_entropy_contrast_known_images(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.codec.image import encode
    from engine.ops.multimodal import image_entropy_contrast

    # constant image: entropy 0, contrast 0
    flat = np.full((8, 8, 3), 100, np.uint8)
    # two-level half/half image: entropy ln(2), contrast 50
    duo = np.zeros((8, 8, 3), np.uint8)
    duo[:4] = 50
    duo[4:] = 150
    ds = ray.data.from_arrow(pa.table({
        "image_id": ["flat", "duo"],
        "bytes": [encode(flat, "raw16"), encode(duo, "raw16")],
        "fmt": ["raw16", "raw16"],
    }))
    out = (image_entropy_contrast(ds).to_pandas()
           .set_index("image_id"))
    assert out.loc["flat", "entropy"] == pytest.approx(0.0, abs=1e-12)
    assert out.loc["flat", "contrast"] == pytest.approx(0.0, abs=1e-12)
    assert out.loc["duo", "entropy"] == pytest.approx(np.log(2),
                                                      rel=1e-6)
    assert out.loc["duo", "contrast"] == pytest.approx(50.0, rel=1e-9)


def test_colorfulness_known_images(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.codec.image import encode
    from engine.ops.multimodal import image_colorfulness

    # any gray image (R=G=B): rg = yb = 0 everywhere -> M = 0
    gray = np.full((8, 8, 3), 77, np.uint8)
    # saturated red: rg = 255 const, yb = 127.5 const -> vars 0,
    # M = 0.3 * sqrt(255^2 + 127.5^2)
    red = np.zeros((8, 8, 3), np.uint8)
    red[:, :, 0] = 255
    ds = ray.data.from_arrow(pa.table({
        "image_id": ["gray", "red"],
        "bytes": [encode(gray, "raw16"), encode(red, "raw16")],
        "fmt": ["raw16", "raw16"],
    }))
    out = (image_colorfulness(ds).to_pandas().set_index("image_id"))
    assert out.loc["gray", "colorfulness"] == pytest.approx(0.0,
                                                            abs=1e-12)
    want = 0.3 * np.sqrt(255.0 ** 2 + 127.5 ** 2)
    assert out.loc["red", "colorfulness"] == pytest.approx(want,
                                                           abs=1e-6)


def test_hu_moments_translation_invariance(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.codec.image import encode
    from engine.ops.multimodal import image_hu_moments

    # the same 5x7 blob placed at two offsets inside a 32x32 canvas:
    # Hu invariants are translation-invariant, so hu1..hu4 must agree
    rng = np.random.default_rng(7)
    blob = rng.integers(40, 220, size=(5, 7), dtype=np.uint8)
    a = np.full((32, 32, 3), 0, np.uint8)
    b = np.full((32, 32, 3), 0, np.uint8)
    a[2:7, 3:10, 0] = blob
    b[20:25, 14:21, 0] = blob
    ds = ray.data.from_arrow(pa.table({
        "image_id": ["a", "b"],
        "bytes": [encode(a, "raw16"), encode(b, "raw16")],
        "fmt": ["raw16", "raw16"],
    }))
    out = image_hu_moments(ds).to_pandas().set_index("image_id")
    for c in ["hu1", "hu2", "hu3", "hu4"]:
        assert out.loc["a", c] == pytest.approx(out.loc["b", c],
                                                abs=2e-6)
    # hu1 of a constant image equals eta20+eta02 of a uniform sheet
    assert out.loc["a", "hu1"] > 0.0


def test_run_length_known_image(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.codec.image import encode
    from engine.ops.multimodal import image_run_length

    # 4x8 rows: [all bg] [all fg] [bg fg alternating] [fg bg half]
    img = np.zeros((4, 8, 3), np.uint8)
    img[1, :, 0] = 200
    img[2, ::2, 0] = 200
    img[3, :4, 0] = 200
    ds = ray.data.from_arrow(pa.table({
        "image_id": ["x"],
        "bytes": [encode(img, "raw16")],
        "fmt": ["raw16"],
    }))
    out = image_run_length(ds).to_pandas().iloc[0]
    # runs: 1 + 1 + 8 + 2 = 12; fg runs: 0 + 1 + 4 + 1 = 6
    assert out["n_runs"] == 12
    assert out["fg_runs"] == 6
    assert out["mean_run_len"] == pytest.approx(32 / 12, abs=1e-6)


def test_busiest_block_planted(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.codec.image import encode
    from engine.ops.multimodal import image_busiest_block

    # flat image except a checkerboard planted in block (by=2, bx=1)
    img = np.full((32, 32, 3), 30, np.uint8)
    yy, xx = np.mgrid[16:24, 8:16]
    img[16:24, 8:16, 0] = np.where((yy + xx) % 2 == 0, 0, 255)
    ds = ray.data.from_arrow(pa.table({
        "image_id": ["x"],
        "bytes": [encode(img, "raw16")],
        "fmt": ["raw16"],
    }))
    out = image_busiest_block(ds).to_pandas().iloc[0]
    assert (out["by"], out["bx"]) == (2, 1)
    assert out["block_var"] == pytest.approx(127.5 ** 2, abs=1e-6)


def test_radial_profile_rings(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.codec.image import encode
    from engine.ops.multimodal import image_radial_profile

    # image whose intensity IS its radius bin * 10 -> profile exact
    h = w = 16
    dy = 2 * np.arange(h) - (h - 1)
    dx = 2 * np.arange(w) - (w - 1)
    r2 = (dy * dy)[:, None] + (dx * dx)[None, :]
    rb = np.floor(np.sqrt(r2.astype(np.float64))).astype(np.int64) // 2
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0] = (rb * 10).astype(np.uint8)
    ds = ray.data.from_arrow(pa.table({
        "image_id": ["x"],
        "bytes": [encode(img, "raw16")],
        "fmt": ["raw16"],
    }))
    out = image_radial_profile(ds).to_pandas()
    assert (out["mean_px"] == out["rbin"] * 10.0).all()
    assert out["n_px"].sum() == h * w


def test_tenengrad_ramp_and_flat(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.codec.image import encode
    from engine.ops.multimodal import image_tenengrad

    # flat -> 0; linear x-ramp f(x)=10x -> gx = 4*(f(x+1)-f(x-1)) = 80
    # everywhere interior, gy = 0 -> tenengrad = 6400 exactly
    flat = np.full((8, 8, 3), 50, np.uint8)
    ramp = np.zeros((8, 8, 3), np.uint8)
    ramp[:, :, 0] = (10 * np.arange(8))[None, :]
    ds = ray.data.from_arrow(pa.table({
        "image_id": ["flat", "ramp"],
        "bytes": [encode(flat, "raw16"), encode(ramp, "raw16")],
        "fmt": ["raw16", "raw16"],
    }))
    out = image_tenengrad(ds).to_pandas().set_index("image_id")
    assert out.loc["flat", "tenengrad"] == 0.0
    assert out.loc["flat", "edge_frac"] == 0.0
    assert out.loc["ramp", "tenengrad"] == pytest.approx(6400.0)
    assert out.loc["ramp", "edge_frac"] == 0.0


def test_border_contrast_frame(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.codec.image import encode
    from engine.ops.multimodal import image_border_contrast

    img = np.full((8, 8, 3), 100, np.uint8)
    img[1:-1, 1:-1, 0] = 20
    ds = ray.data.from_arrow(pa.table({
        "image_id": ["x"], "bytes": [encode(img, "raw16")],
        "fmt": ["raw16"],
    }))
    out = image_border_contrast(ds).to_pandas().iloc[0]
    assert out["border_mean"] == 100.0
    assert out["inner_mean"] == 20.0
    assert out["border_contrast"] == 80.0


def test_dominant_color_mode_and_tie(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.codec.image import encode
    from engine.ops.multimodal import image_dominant_color

    solid = np.zeros((4, 4, 3), np.uint8)
    solid[:, :, 0] = 200  # r bucket 3 -> code 48
    solid[:, :, 1] = 100  # g bucket 1 -> +4
    solid[:, :, 2] = 50   # b bucket 0 -> +0
    tie = np.zeros((4, 4, 3), np.uint8)
    tie[:, 2:, 0] = 64    # half code 0, half code 16 -> smallest wins
    ds = ray.data.from_arrow(pa.table({
        "image_id": ["solid", "tie"],
        "bytes": [encode(solid, "raw16"), encode(tie, "raw16")],
        "fmt": ["raw16", "raw16"],
    }))
    out = image_dominant_color(ds).to_pandas().set_index("image_id")
    assert out.loc["solid", "color_code"] == 52
    assert out.loc["solid", "color_share"] == 1.0
    assert out.loc["tie", "color_code"] == 0
    assert out.loc["tie", "color_share"] == 0.5


def test_equalize_audit_known_values(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.codec.image import encode
    from engine.ops.multimodal import image_equalize_audit

    const = np.full((8, 8, 3), 77, np.uint8)
    two = np.zeros((8, 8, 3), np.uint8)
    two[4:, :, 0] = 255  # 32 zeros, 32 x 255 -> eq: 0 and 255
    ds = ray.data.from_arrow(pa.table({
        "image_id": ["const", "two"],
        "bytes": [encode(const, "raw16"), encode(two, "raw16")],
        "fmt": ["raw16", "raw16"],
    }))
    out = image_equalize_audit(ds).to_pandas().set_index("image_id")
    assert out.loc["const", "eq_mean"] == 0.0
    assert out.loc["const", "eq_levels"] == 1
    assert out.loc["two", "eq_mean"] == 127.5
    assert out.loc["two", "eq_levels"] == 2


def test_embedding_near_dups_two_bit_probe_recall(ray_session):
    """Round-4 (verdict item 8): planted pairs with cosine just above
    threshold whose hyperplane signatures differ in EXACTLY two bits.
    probe_bits=2 must find every one (guaranteed recall floor: one
    member's exact bucket is the other's two-flip probe); probe_bits=1
    returns a subset (two-plane straddlers are outside its floor)."""
    import ray.data

    from engine.ops.dedup import _lsh_planes, embedding_near_dups

    rng = np.random.default_rng(11)
    d, num_planes, thr = 16, 8, 0.95
    planes = _lsh_planes(d, num_planes, 42)

    def sig(v):
        return int((((v @ planes) > 0)
                    * (1 << np.arange(num_planes))).sum())

    planted = []
    vecs, ids = [], []
    nid = 0
    while len(planted) < 10:
        u = rng.normal(size=d)
        u /= np.linalg.norm(u)
        v = u + 0.22 * rng.normal(size=d)
        v /= np.linalg.norm(v)
        cos = float(u @ v)
        ham = bin(sig(u) ^ sig(v)).count("1")
        if cos >= thr + 0.001 and ham == 2:
            vecs += [u, v]
            ids += [nid, nid + 1]
            planted.append((nid, nid + 1))
            nid += 2
    # background noise: mutually dissimilar vectors
    for _ in range(60):
        w = rng.normal(size=d)
        vecs.append(w / np.linalg.norm(w))
        ids.append(nid)
        nid += 1
    df = pd.DataFrame({"vec_id": np.asarray(ids, np.int64),
                       "embedding": [v.astype(np.float64) for v in vecs]})
    ds = ray.data.from_pandas(df).repartition(3)

    out2 = embedding_near_dups(ds, threshold=thr, probe_bits=2)
    got2 = {(min(a, b), max(a, b)) for a, b in zip(out2["a"], out2["b"])}
    for p in planted:
        assert p in got2, f"2-bit probe missed planted pair {p}"

    out1 = embedding_near_dups(
        ray.data.from_pandas(df).repartition(3), threshold=thr,
        probe_bits=1)
    got1 = {(min(a, b), max(a, b)) for a, b in zip(out1["a"], out1["b"])}
    assert got1 <= got2  # 2-bit probes strictly widen the candidate set
