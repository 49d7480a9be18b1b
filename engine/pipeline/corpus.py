"""End-to-end training-corpus preparation pipeline (SURVEY §2.10).

The geo flagship proves the spatial stack; this is its text twin — the
standard LLM-data prep chain composed from the operator pack as ONE
streaming Dataset plan (no mid-pipeline materialization):

    lang-id -> quality score -> quality gate -> exact dedup by content
    fingerprint -> token counting -> token-budget packing

Every stage is a ``map_batches`` transform except the dedup shuffle
(hash on fingerprint) and the packing scan (one range shuffle); the
whole plan therefore moves the corpus through exactly two exchanges.
At 100 TB each stage scales independently: lang-id/quality are
embarrassingly parallel, dedup shuffles 64-bit keys (not text), and
packing's prefix sum exchanges only range-bucket partials.
"""

from __future__ import annotations

import pandas as pd

import ray.data


def _gated_semi_join(
    big: ray.data.Dataset,
    keys: ray.data.Dataset,
    on: str,
    *,
    small_ids: int = 500_000,
) -> ray.data.Dataset:
    """Survivor-id filter with a size gate (mirrors
    ``dedup._verify_candidate_pairs``): at or below ``small_ids``
    distinct keys the id column is collected and broadcast once
    (``relational.semi_join``); above it NOTHING corpus-sized touches
    the driver — ``bloom_semi_join`` builds a distributed Bloom filter
    over the key Dataset, drops misses before the shuffle, and resolves
    false positives with a co-shuffle residual check. ``keys`` must be
    a single-column id projection; it is materialized so the count and
    the join read the same (cheap, ids-only) blocks."""
    from engine.ops import relational

    keys = keys.materialize()
    if keys.count() <= small_ids:
        return relational.semi_join(big, keys.to_pandas(), on=on)
    return relational.bloom_semi_join(big, keys, on=on)


def prepare_corpus(
    docs: ray.data.Dataset,
    quality_min: float = 0.3,
    pack_budget_tokens: int = 4096,
) -> ray.data.Dataset:
    """``docs`` needs (doc_id, text). Returns one row per surviving
    document: doc_id, lang_pred, quality, n_tokens, run_tokens,
    pack_id — deterministic (hash keep-rules, no RNG), so re-runs and
    resumed runs produce byte-identical corpora."""
    from engine.ops import dedup, relational, text

    ds = text.run_lang_id(docs)
    ds = ds.map_batches(text.quality_score_batch, batch_format="pandas")

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["quality"] >= quality_min]

    ds = ds.map_batches(gate, batch_format="pandas")
    ds = ds.map_batches(text.fingerprint_batch, batch_format="pandas")
    ds = dedup.exact_dedup(ds, key="fingerprint", order_col="doc_id")
    ds = ds.map_batches(text.token_count_batch, batch_format="pandas")
    ds = ds.select_columns(
        ["doc_id", "lang_pred", "quality", "n_tokens"]
    )
    ds = relational.ordered_prefix_sum(
        ds, "doc_id", "n_tokens", out_col="run_tokens"
    )

    def assign_pack(b: pd.DataFrame) -> pd.DataFrame:
        b["pack_id"] = (b["run_tokens"] - b["n_tokens"]) // pack_budget_tokens
        return b

    return ds.map_batches(assign_pack, batch_format="pandas")


def prepare_image_corpus(
    images: ray.data.Dataset,
    *,
    thumb_size: int = 16,
    concurrency=(1, 8),
    survivor_gate_ids: int = 500_000,
) -> ray.data.Dataset:
    """The multimodal twin of ``prepare_corpus``: decode-verify ->
    exact phash dedup -> thumbnail resize -> deterministic
    augmentation, one streaming plan whose only exchange is the dedup
    hash shuffle on the 8-byte phash key (bytes never shuffle — decode,
    resize and augment all run inside actor-pool ``map_batches``
    stages on whatever block the row already lives in).

    ``images`` needs (image_id, bytes, fmt, phash). Emits one row per
    surviving image: image_id, phash, resized thumbnail crc + dims,
    augmentation params + crc — the manifest a training-data loader
    shards from, with pixels re-derivable deterministically."""
    import zlib

    from engine.ops import dedup, multimodal

    # dedup the (phash, image_id) PROJECTION — the shuffle moves 8-byte
    # keys, never pixels — then filter the byte-bearing rows by the
    # surviving ids through the size-gated path (broadcast when small,
    # distributed Bloom + residual co-shuffle at 10^12 scale; the
    # survivor set never lands on the driver above the gate)
    keys = images.select_columns(["image_id", "phash"])
    survivors = dedup.exact_dedup(
        keys, key="phash", order_col="image_id"
    ).select_columns(["image_id"])
    ds = _gated_semi_join(images, survivors, on="image_id",
                          small_ids=survivor_gate_ids)
    ds = multimodal.resize_images(ds, size=thumb_size, concurrency=concurrency, keep_bytes=True)
    ds = multimodal.augment_images(ds, concurrency=concurrency)

    def manifest(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "image_id": b["image_id"],
            "phash": b["phash"],
            "resized_w": b["resized_w"], "resized_h": b["resized_h"],
            "resized_crc": [zlib.crc32(x) for x in b["resized_bytes"]],
            "aug_hflip": b["aug_hflip"], "aug_rot90": b["aug_rot90"],
            "aug_crop": b["aug_crop"],
            "aug_crc": [zlib.crc32(x) for x in b["aug_bytes"]],
        })

    return ds.map_batches(manifest, batch_format="pandas")


def corpus_to_shards(
    docs: ray.data.Dataset,
    out_dir: str,
    *,
    quality_min: float = 0.3,
    chunk_tokens: int = 256,
    overlap: int = 32,
    shard_budget_bytes: int = 1 << 20,
    survivor_gate_ids: int = 500_000,
) -> "pd.DataFrame":
    """The COMPLETE text path, curation to training shards:

        prepare_corpus (lang-id, quality gate, exact dedup)
          -> chunk_documents (overlapping context windows)
          -> encode_token_ids (corpus top-vocab, list<int32>)
          -> write_tar_shards (byte-budget packing, atomic tars)

    Returns the shard manifest. Every stage is the already-tested
    operator; this function is the end-to-end composition a user of
    the engine actually ships — deterministic, so re-runs produce
    byte-identical shards (the resumable-output rule end to end)."""
    import numpy as np

    from engine.io import write_tar_shards
    from engine.ops import text

    kept = prepare_corpus(docs, quality_min=quality_min)
    kept_ids = kept.select_columns(["doc_id"])
    survivors = _gated_semi_join(docs, kept_ids, on="doc_id",
                                 small_ids=survivor_gate_ids)

    chunks = text.chunk_documents(
        survivors, chunk_tokens=chunk_tokens, overlap=overlap
    )
    vocab = text.token_topk(survivors, k=4000)["token"].tolist()
    encoded = text.encode_token_ids(chunks, vocab, text_col="chunk_text")

    def pack_payload(b: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame({
            "chunk_key": [f"{d:09d}-{i:04d}" for d, i in
                          zip(b["doc_id"], b["chunk_ix"])],
            "ord": b["doc_id"].to_numpy(np.int64) * 100000
            + b["chunk_ix"].to_numpy(np.int64),
            "ids": [np.asarray(x, dtype=np.int32).tobytes()
                    for x in b["token_ids"]],
        })

    payload = encoded.map_batches(pack_payload, batch_format="pandas")
    return write_tar_shards(
        payload, out_dir, key_col="chunk_key", payload_cols=["ids"],
        order_col="ord", shard_budget_bytes=shard_budget_bytes,
    )
