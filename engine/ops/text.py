"""Text-analysis operators for training-data pipelines (driver mandate).

Language-ID (character n-gram heuristic), quality scoring
(length/punctuation/stopword ratios), token counting (whitespace +
BPE-ish regex), and rolling-hash document fingerprinting — each a
vectorized/per-batch ``map_batches`` stage over a ``text`` column.
Stateful pieces (compiled regexes, n-gram profiles) live in actor
``__init__`` per the T4 pattern.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data

# Tiny per-language stopword/character profiles (public common words).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "with", "was"},
    "it": {"il", "la", "di", "e", "che", "un", "una", "per", "con", "del", "della", "non"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "mit", "von", "nicht", "den"},
    "fr": {"le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans", "avec", "pas"},
    "es": {"el", "la", "de", "y", "que", "un", "una", "es", "en", "por", "con", "para"},
}

_TOKEN_RE = re.compile(r"[A-Za-z]+(?:'[a-z]+)?|\d+|[^\sA-Za-z\d]")
_WS_RE = re.compile(r"\s+")
_CJK_RE = re.compile(r"[぀-ヿ㐀-䶿一-鿿]")


class LangId:
    """Stopword-overlap language ID — stateless heuristic, actor-cached
    profiles. Emits ``lang_pred`` and ``lang_score``."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        self.ws = _WS_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds, scores = [], []
        for text in batch["text"].astype(str):
            # script rule first: CJK text has no whitespace stopwords,
            # so stopword overlap can never identify it
            n_cjk = len(_CJK_RE.findall(text))
            if n_cjk >= 0.2 * max(1, len(text)):
                preds.append("zh")
                scores.append(round(n_cjk / max(1, len(text)), 6))
                continue
            words = set(self.ws.split(text.lower()))
            best, best_n = "unk", 0
            for lang, prof in self.profiles.items():
                n = len(words & prof)
                if n > best_n or (n == best_n and n > 0 and lang < best):
                    best, best_n = lang, n
            preds.append(best)
            scores.append(best_n / max(1, len(words)))
        batch = batch.copy()
        batch["lang_pred"] = preds
        batch["lang_score"] = np.round(scores, 6)
        return batch


def token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """``n_tokens``: whitespace tokens; ``n_bpe_ish``: regex sub-tokens
    (letters runs / digit runs / single punctuation — a BPE-ish pre-
    tokenizer)."""
    texts = batch["text"].astype(str)
    batch = batch.copy()
    batch["n_tokens"] = [
        len([t for t in _WS_RE.split(s) if t]) for s in texts
    ]
    batch["n_bpe_ish"] = [len(_TOKEN_RE.findall(s)) for s in texts]
    return batch


def distinct_token_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-document vocabulary features: ``n_distinct`` (unique
    whitespace tokens) and ``ttr`` (type/token ratio — the standard
    lexical-diversity signal used by training-data quality filters;
    near-0 means a degenerate repeated-token document)."""
    texts = batch["text"].astype(str)
    batch = batch.copy()
    n_tok, n_dis = [], []
    for s in texts:
        toks = [t for t in _WS_RE.split(s) if t]
        n_tok.append(len(toks))
        n_dis.append(len(set(toks)))
    batch["n_distinct"] = np.asarray(n_dis, dtype=np.int64)
    batch["ttr"] = np.round(
        np.asarray(n_dis, float) / np.maximum(np.asarray(n_tok, float), 1.0), 6
    )
    return batch


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Heuristic quality features: char length, mean word length,
    punctuation ratio, stopword ratio, upper ratio + a composite score."""
    texts = batch["text"].astype(str)
    stop = _LANG_PROFILES["en"] | _LANG_PROFILES["it"] | _LANG_PROFILES["de"]
    n_chars, mean_wl, punct, stopr, upper = [], [], [], [], []
    for s in texts:
        words = [t for t in _WS_RE.split(s) if t]
        n = max(1, len(s))
        n_chars.append(len(s))
        mean_wl.append(sum(map(len, words)) / max(1, len(words)))
        punct.append(sum(not c.isalnum() and not c.isspace() for c in s) / n)
        stopr.append(sum(w.lower() in stop for w in words) / max(1, len(words)))
        upper.append(sum(c.isupper() for c in s) / n)
    batch = batch.copy()
    batch["n_chars_q"] = n_chars
    batch["mean_word_len"] = np.round(mean_wl, 6)
    batch["punct_ratio"] = np.round(punct, 6)
    batch["stopword_ratio"] = np.round(stopr, 6)
    batch["upper_ratio"] = np.round(upper, 6)
    batch["quality"] = np.round(
        np.clip(
            0.4 * np.minimum(1.0, np.asarray(n_chars) / 200.0)
            + 0.3 * np.asarray(stopr)
            + 0.3 * (1.0 - np.minimum(1.0, 4.0 * np.asarray(punct))),
            0.0,
            1.0,
        ),
        6,
    )
    return batch


_FP_BASE = 1000003
_FP_MASK = (1 << 64) - 1


def fingerprint64(text: str) -> int:
    """Rolling polynomial (FNV-style) hash of the whole document —
    deterministic, order-sensitive content fingerprint. Returned as
    signed int64 for Arrow friendliness."""
    h = 1469598103934665603
    for b in text.encode("utf-8", "ignore"):
        h = ((h * _FP_BASE) & _FP_MASK) ^ b
    return h - (1 << 64) if h >= (1 << 63) else h


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    batch = batch.copy()
    batch["fingerprint"] = [fingerprint64(s) for s in batch["text"].astype(str)]
    return batch


def run_lang_id(ds: ray.data.Dataset, concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(LangId, batch_format="pandas", concurrency=concurrency)


_ALPHA_RE = re.compile(r"[a-z]+")


def token_topk(
    ds: ray.data.Dataset, k: int = 50, final: str = "small"
) -> pd.DataFrame:
    """Global token frequencies, top-k — the corpus-vocabulary report a
    training-data pipeline runs before filtering. Tokenizer: maximal
    ``[a-z]+`` runs of the lowercased text (DuckDB-oracle-equivalent to
    ``string_split_regex(lower(text), '[^a-z]+')``, see
    ``docs_top_tokens``). Each batch collapses to per-token partial
    counts via one ``np.unique`` over the concatenated token array —
    the exchange moves (token, count) partials bounded by vocabulary x
    blocks, never token instances. ``final="small"`` merges on one
    worker (vocabularies are ~10^5-10^6 — small); ``final="shuffle"``
    keeps a distributed groupby for open-ended token spaces (URLs,
    n-grams)."""
    from engine.ops import relational

    def local(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for s in b["text"].astype(str):
            toks.extend(_ALPHA_RE.findall(s.lower()))
        if not toks:
            return pd.DataFrame({"token": pd.Series(dtype=str),
                                 "n": pd.Series(dtype=np.int64)})
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pd.DataFrame({"token": u, "n": c.astype(np.int64)})

    partials = ds.map_batches(local, batch_format="pandas")
    if final == "small":
        counts = relational.sum_final(partials, ["token"]).to_pandas()
    else:
        from ray.data.aggregate import Sum

        counts = (
            partials.groupby("token")
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
        )
    counts = counts.sort_values(
        ["n", "token"], ascending=[False, True], kind="stable", ignore_index=True
    )
    return counts.head(k)
