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

from engine.state import default_pool

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


# ---- vectorized ASCII fast path (round-4: the corpus-prep chain's
# per-char Python loops were its measured hot path). Byte-class lookup
# tables reproduce the PYTHON semantics exactly on ASCII input:
# regex \s in Unicode (str) mode equals str.isspace() on ASCII —
# {9-13, 28-31, 32}, verified against re.match per codepoint. Non-ASCII
# batches fall back to the original per-char loops, so results are
# identical on every input.
_LUT_RE_WS = np.zeros(128, bool)
_LUT_RE_WS[[9, 10, 11, 12, 13, 28, 29, 30, 31, 32]] = True
_LUT_ISSPACE = _LUT_RE_WS
_LUT_ALNUM = np.zeros(128, bool)
for _c in range(128):
    _LUT_ALNUM[_c] = chr(_c).isalnum()


class _AsciiBatch:
    """Byte-level view of a batch of texts: classification masks and
    the word-run structure every vectorized text op shares."""

    __slots__ = ("n", "lens", "offs", "b", "doc_ix", "doc_start",
                 "ws", "nonws", "run_start", "run_doc", "run_len",
                 "run_off", "joined")

    def __init__(self, texts: list[str], joined: str,
                 lens: np.ndarray) -> None:
        self.n = len(texts)
        self.joined = joined
        self.lens = lens
        self.offs = np.zeros(self.n, np.int64)
        np.cumsum(lens[:-1], out=self.offs[1:])
        self.b = np.frombuffer(joined.encode("ascii"), np.uint8)
        total = len(self.b)
        self.doc_ix = np.repeat(np.arange(self.n, dtype=np.int64), lens)
        self.doc_start = np.zeros(total, bool)
        self.doc_start[self.offs[lens > 0]] = True
        self.ws = _LUT_RE_WS[self.b]
        self.nonws = ~self.ws
        prev_ws = np.r_[True, self.ws[:-1]]
        self.run_start = self.nonws & (self.doc_start | prev_ws)
        starts = np.flatnonzero(self.run_start)
        self.run_off = starts
        self.run_doc = self.doc_ix[starts] if len(starts) else \
            np.empty(0, np.int64)
        rid = np.cumsum(self.run_start) - 1
        self.run_len = np.bincount(
            rid[self.nonws], minlength=len(starts)) if total else \
            np.empty(0, np.int64)

    def packed_words(self, start: int = 0) -> np.ndarray:
        """Lowercased bytes [start, start+8) of each word run packed
        little-endian — INJECTIVE for runs <= 8 bytes together with
        ``run_len`` (which covers every stopword, max 5 chars);
        start=8 gives the second half for 16-byte-exact distinctness."""
        rid = np.cumsum(self.run_start) - 1
        sel = self.nonws
        rid_s = rid[sel]
        pos = np.flatnonzero(sel) - self.run_off[rid_s]
        take = (pos >= start) & (pos < start + 8)
        lo = self.b[sel][take].astype(np.uint64)
        up = (lo >= 65) & (lo <= 90)
        lo = np.where(up, lo + 32, lo)
        acc = np.zeros(len(self.run_off), np.uint64)
        np.add.at(acc, rid_s[take],
                  lo << (np.uint64(8)
                         * (pos[take] - start).astype(np.uint64)))
        return acc


def _ascii_batch(texts: list[str]) -> "_AsciiBatch | None":
    lens = np.fromiter((len(s) for s in texts), np.int64,
                       count=len(texts))
    joined = "".join(texts)
    if not joined.isascii():
        return None
    return _AsciiBatch(texts, joined, lens)


def _pack_word(w: str) -> np.uint64:
    acc = np.uint64(0)
    for k, ch in enumerate(w.encode("ascii")[:8]):
        acc |= np.uint64(ch) << np.uint64(8 * k)
    return acc


class LangId:
    """Stopword-overlap language ID — stateless heuristic, actor-cached
    profiles. Emits ``lang_pred`` and ``lang_score``."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        self.ws = _WS_RE

    def _vectorized(self, batch: pd.DataFrame) -> "pd.DataFrame | None":
        """ASCII fast path (exact): CJK is impossible in ASCII, so the
        script rule never fires; distinct lowercased words count via
        16-byte-exact run packing (longer runs — which can never be
        stopwords — de-dup by actual content), the empty-string member
        of the split-set comes from the leading/trailing-\\s rule, and
        the arg-best emulates the insertion-order/lex tie-break of the
        dict loop."""
        texts = list(batch["text"].astype(str))
        st = _ascii_batch(texts)
        if st is None:
            return None
        n = st.n
        p1 = st.packed_words()
        p2 = st.packed_words(8)
        rl = st.run_len
        rd = st.run_doc
        # distinct (doc, word) among runs <= 16 bytes: lexsort + first
        small = rl <= 16
        sd, sl, s1, s2 = rd[small], rl[small], p1[small], p2[small]
        order = np.lexsort((s2, s1, sl, sd))
        sd, sl, s1, s2 = sd[order], sl[order], s1[order], s2[order]
        first = np.ones(len(sd), bool)
        if len(sd) > 1:
            first[1:] = ((sd[1:] != sd[:-1]) | (sl[1:] != sl[:-1])
                         | (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]))
        ud, ul, u1 = sd[first], sl[first], s1[first]
        n_small = np.bincount(ud, minlength=n)
        # long runs (> 16 bytes): de-dup by actual lowercased content
        n_long = np.zeros(n, np.int64)
        if (~small).any():
            seen: set = set()
            for ridx in np.flatnonzero(~small):
                a = int(st.run_off[ridx])
                w = st.joined[a:a + int(rl[ridx])].lower()
                key = (int(rd[ridx]), w)
                if key not in seen:
                    seen.add(key)
                    n_long[rd[ridx]] += 1
        # '' is in the split set iff the doc is empty or starts/ends \s
        has_empty = np.zeros(n, bool)
        nz = st.lens > 0
        if nz.any():
            fi = st.offs[nz]
            la = st.offs[nz] + st.lens[nz] - 1
            has_empty[nz] = st.ws[fi] | st.ws[la]
        has_empty[~nz] = True
        n_words = n_small + n_long + has_empty.astype(np.int64)
        best = np.full(n, "unk", object)
        best_n = np.zeros(n, np.int64)
        for lang, prof in self.profiles.items():
            m = np.zeros(len(ud), bool)
            for w in prof:
                m |= (u1 == _pack_word(w)) & (ul == len(w))
            cnt = np.bincount(ud[m], minlength=n)
            upd = (cnt > best_n) | ((cnt == best_n) & (cnt > 0)
                                    & (lang < best))
            best = np.where(upd, lang, best)
            best_n = np.where(upd, cnt, best_n)
        batch = batch.copy()
        batch["lang_pred"] = best.astype(object)
        batch["lang_score"] = np.round(
            best_n / np.maximum(1, n_words), 6)
        return batch

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fast = self._vectorized(batch)
        if fast is not None:
            return fast
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
    st = _ascii_batch(list(texts))
    if st is not None:
        letter = ((st.b >= 65) & (st.b <= 90)) | \
                 ((st.b >= 97) & (st.b <= 122))
        # the one construct the run algebra can't express locally is
        # the regex's optional ('[a-z]+) suffix-merge; batches that
        # contain a letter-adjacent apostrophe fall back
        apo = st.b == 39
        prev_letter = np.r_[False, letter[:-1]] & ~st.doc_start
        if not (apo & prev_letter).any():
            digit = (st.b >= 48) & (st.b <= 57)
            prev_digit = np.r_[False, digit[:-1]] & ~st.doc_start
            l_start = letter & ~prev_letter
            d_start = digit & ~prev_digit
            other = st.nonws & ~letter & ~digit
            batch["n_tokens"] = np.bincount(st.run_doc, minlength=st.n) \
                if len(st.run_doc) else np.zeros(st.n, np.int64)
            batch["n_bpe_ish"] = (
                np.bincount(st.doc_ix[l_start], minlength=st.n)
                + np.bincount(st.doc_ix[d_start], minlength=st.n)
                + np.bincount(st.doc_ix[other], minlength=st.n))
            return batch
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


def repetition_ratio_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition signal: per-doc duplicate-bigram
    fraction ``rep_ratio = 1 - distinct_bigrams / total_bigrams`` over
    lowercased whitespace tokens (0.0 for docs with < 2 tokens). High
    values mark boilerplate / looping generations that length and TTR
    filters miss. Mirrored exactly by a DuckDB list-comprehension twin
    (``docs_repetition_ratio``)."""
    texts = batch["text"].astype(str)
    batch = batch.copy()
    n_bi, n_dis = [], []
    for s in texts:
        toks = [t for t in _WS_RE.split(s.lower()) if t]
        if len(toks) < 2:
            n_bi.append(0)
            n_dis.append(0)
            continue
        bis = list(zip(toks[:-1], toks[1:]))
        n_bi.append(len(bis))
        n_dis.append(len(set(bis)))
    n_bi = np.asarray(n_bi, dtype=np.int64)
    n_dis = np.asarray(n_dis, dtype=np.int64)
    batch["n_bigrams"] = n_bi
    batch["rep_ratio"] = np.round(
        1.0 - n_dis / np.maximum(n_bi, 1), 6
    )
    return batch


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Heuristic quality features: char length, mean word length,
    punctuation ratio, stopword ratio, upper ratio + a composite score.

    ASCII batches take the fully vectorized byte-class path (exact:
    same masks, same stopword membership via length-checked 8-byte
    packing); any non-ASCII batch falls back to the per-char loop."""
    texts = batch["text"].astype(str)
    stop = _LANG_PROFILES["en"] | _LANG_PROFILES["it"] | _LANG_PROFILES["de"]
    st = _ascii_batch(list(texts))
    if st is not None:
        n_chars = st.lens
        n_words = np.bincount(st.run_doc, minlength=st.n) \
            if len(st.run_doc) else np.zeros(st.n, np.int64)
        wl = np.maximum(n_words, 1).astype(np.float64)
        nonws_per_doc = np.bincount(st.doc_ix[st.nonws], minlength=st.n)
        mean_wl = nonws_per_doc / wl
        alnum = _LUT_ALNUM[st.b]
        issp = _LUT_ISSPACE[st.b]
        pm = (~alnum) & (~issp)
        nd = np.maximum(n_chars, 1).astype(np.float64)
        punct = np.bincount(st.doc_ix[pm], minlength=st.n) / nd
        um = (st.b >= 65) & (st.b <= 90)
        upper = np.bincount(st.doc_ix[um], minlength=st.n) / nd
        packed = st.packed_words()
        is_stop = np.zeros(len(packed), bool)
        for w in stop:
            is_stop |= (packed == _pack_word(w)) & (st.run_len == len(w))
        stopr = (np.bincount(st.run_doc[is_stop], minlength=st.n)
                 if len(st.run_doc) else np.zeros(st.n, np.int64)) / wl
    else:
        n_chars, mean_wl, punct, stopr, upper = [], [], [], [], []
        for s in texts:
            words = [t for t in _WS_RE.split(s) if t]
            n = max(1, len(s))
            n_chars.append(len(s))
            mean_wl.append(sum(map(len, words)) / max(1, len(words)))
            punct.append(
                sum(not c.isalnum() and not c.isspace() for c in s) / n)
            stopr.append(
                sum(w.lower() in stop for w in words) / max(1, len(words)))
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
    """Vectorized across DOCS: the per-byte recurrence
    h = (h * B) ^ b can't collapse to a prefix product (xor doesn't
    distribute over the multiply), but it CAN run one byte POSITION at
    a time over all still-active docs — max-doc-len tiny numpy steps
    instead of sum-of-len Python iterations (the round-3 verdict's
    pandas-tax item; measured ~20x on the corpus chain)."""
    texts = batch["text"].astype(str)
    enc = [s.encode("utf-8", "ignore") for s in texts]
    n = len(enc)
    lens = np.fromiter(map(len, enc), np.int64, count=n)
    h = np.full(n, 1469598103934665603, np.uint64)
    if n and lens.max() > 0:
        flat = np.frombuffer(b"".join(enc), np.uint8)
        offs = np.zeros(n, np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        order = np.argsort(-lens, kind="stable")
        sorted_neg = -lens[order]
        B = np.uint64(_FP_BASE)
        with np.errstate(over="ignore"):
            for k in range(int(lens.max())):
                na = int(np.searchsorted(sorted_neg, -(k + 1), "right"))
                idx = order[:na]
                h[idx] = (h[idx] * B) ^ flat[offs[idx] + k]
    batch = batch.copy()
    batch["fingerprint"] = h.view(np.int64)
    return batch


def run_lang_id(ds: ray.data.Dataset, concurrency=None) -> ray.data.Dataset:
    """Language-ID actor stage. ``concurrency=None`` derives the pool
    cap from the cluster (1x CPUs, floor 4, cap 64) — the round-5
    corpus-scaling fix: the old fixed ``(1, 4)`` cap was invisible at
    the 4-cpu level but throttled the 16-cpu level to a quarter of the
    machine (measured 55s of LangId CPU through 4 actors = the whole
    sub-0.8 efficiency gap)."""
    if concurrency is None:
        from engine.state import default_partitions

        concurrency = (1, default_partitions(mult=1.0, floor=4,
                                             cap=64))
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
        if "token" not in counts.columns:  # empty corpus
            counts = pd.DataFrame({"token": pd.Series(dtype=str),
                                   "n": pd.Series(dtype=np.int64)})
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


# ------------------------------------------------------------ decontamination

def _shingle_hashes(text: str, n: int = 8) -> np.ndarray:
    """64-bit fingerprints of every n-token (whitespace, lowercased)
    shingle of ``text``, fully vectorized: tokens are siphashed once
    (``pandas.util.hash_array`` — process-stable), then each window
    collapses to a rolling polynomial sum(t_j * B^(n-1-j)) mod 2^64 in
    n numpy passes over the whole doc (no per-shingle Python work).
    At 100 TB the index stores these hashes, not strings; 64-bit
    collisions (~1e-8 at 10^9 shingles) only ever ADD a flag, never
    drop one, which is the safe direction for decontamination."""
    from pandas.util import hash_array

    toks = [t for t in _WS_RE.split(text.lower()) if t]
    if not toks:
        return np.zeros(1, dtype=np.int64)
    th = hash_array(np.asarray(toks, dtype=object), categorize=False)
    m = min(n, len(th))  # short doc: one shingle of the whole text
    powers = np.empty(m, dtype=np.uint64)
    powers[m - 1] = 1
    for j in range(m - 2, -1, -1):
        powers[j] = powers[j + 1] * np.uint64(_FP_BASE)
    with np.errstate(over="ignore"):
        out = np.zeros(len(th) - m + 1, dtype=np.uint64)
        for j in range(m):
            out += th[j:len(th) - m + 1 + j] * powers[j]
    return out.view(np.int64)


def build_contamination_index(
    bench: ray.data.Dataset, ngram: int = 8
) -> "ray.ObjectRef":
    """Distributed build of the benchmark-shingle set: each batch emits
    its unique shingle hashes (tiny vs text), the driver unions the
    partials once and broadcasts ONE frozen set via ``ray.put``. The
    benchmark side is small by definition (eval sets, not the corpus)."""
    import ray

    def local(b: pd.DataFrame) -> pd.DataFrame:
        hs = [_shingle_hashes(s, ngram) for s in b["text"].astype(str)]
        u = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.int64)
        return pd.DataFrame({"h": u})

    parts = bench.map_batches(local, batch_format="pandas").to_pandas()
    # sorted array, not a Python set: probes use np.isin (binary
    # search, vectorized) and the broadcast is one flat buffer
    return ray.put(np.unique(parts["h"].to_numpy()))


def flag_contaminated(
    ds: ray.data.Dataset, index_ref: "ray.ObjectRef", ngram: int = 8
) -> ray.data.Dataset:
    """Test-set decontamination sweep: mark every corpus document that
    shares >= 1 n-token shingle with the broadcast benchmark index.
    One streaming pass, no shuffle; emits ``contaminated`` (0/1) and
    ``n_hits`` per doc."""

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        idx = cached_get(index_ref)
        hits = []
        for s in b["text"].astype(str):
            hs = _shingle_hashes(s, ngram)
            hits.append(int(np.isin(hs, idx, assume_unique=False).sum()))
        b = b.copy()
        b["n_hits"] = np.asarray(hits, dtype=np.int64)
        b["contaminated"] = (b["n_hits"] > 0).astype(np.int64)
        return b

    return ds.map_batches(probe, batch_format="pandas")


# ------------------------------------------------------------------- TF-IDF

def doc_frequency(ds: ray.data.Dataset) -> pd.DataFrame:
    """Document frequency per token (``_ALPHA_RE`` tokenizer): each
    batch counts each token once per doc via per-doc ``set``s, one
    ``np.unique`` partial per batch, merged by ``sum_final`` — the
    vocabulary-sized pass 1 of TF-IDF."""
    from engine.ops import relational

    def local(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for s in b["text"].astype(str):
            toks.extend(set(_ALPHA_RE.findall(s.lower())))
        if not toks:
            return pd.DataFrame({"token": pd.Series(dtype=str),
                                 "df": pd.Series(dtype=np.int64)})
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pd.DataFrame({"token": u, "df": c.astype(np.int64)})

    return relational.sum_final(
        ds.map_batches(local, batch_format="pandas"), ["token"]
    ).to_pandas()


def tfidf_top_terms(
    ds: ray.data.Dataset, n_docs: int, df: pd.DataFrame, k: int = 3
) -> ray.data.Dataset:
    """Pass 2 of TF-IDF: broadcast the (vocabulary-sized) DF table once,
    then per doc score tf * ln(N/df) and keep the top-k terms
    (score desc, token asc tie-break). Streaming, no shuffle. Emits
    (doc_id, term, score, trank)."""
    import ray

    ref = ray.put({t: d for t, d in zip(df["token"], df["df"])})

    def score(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        dfm = cached_get(ref)
        out_id, out_t, out_s, out_r = [], [], [], []
        for did, s in zip(b["doc_id"], b["text"].astype(str)):
            toks = _ALPHA_RE.findall(s.lower())
            if not toks:
                continue
            u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            tf = c / len(toks)
            idf = np.asarray([np.log(n_docs / dfm[t]) for t in u])
            sc = np.round(tf * idf, 6)
            order = sorted(range(len(u)), key=lambda i: (-sc[i], u[i]))[:k]
            for r, i in enumerate(order, 1):
                out_id.append(did)
                out_t.append(u[i])
                out_s.append(sc[i])
                out_r.append(r)
        return pd.DataFrame({
            "doc_id": np.asarray(out_id, dtype=np.int64), "term": out_t,
            "score": np.asarray(out_s, dtype=np.float64),
            "trank": np.asarray(out_r, dtype=np.int64),
        })

    return ds.map_batches(score, batch_format="pandas")


# ------------------------------------------------------- fuzzy match join

def _deletion_variants(s: str) -> list[str]:
    """s plus every single-character deletion — the SymSpell banding
    key set: two strings within edit distance 1 ALWAYS share a
    variant (substitution -> shared deletion at that index; insertion/
    deletion -> one side's deletion equals the other; equality ->
    identity), so the band lookup has no false negatives and a cheap
    verify removes false positives."""
    return [s] + [s[:i] + s[i + 1:] for i in range(len(s))]


def _edit_distance_leq1(a: str, b: str) -> bool:
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution allowed
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a shorter by 1: one insertion into a
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_match_join(
    ds: ray.data.Dataset,
    titles: "pd.Series | list[str]",
    col: str,
    out: str = "matched_title",
) -> ray.data.Dataset:
    """Approximate-equality join: each row of ``ds`` matched to any
    reference title within edit distance <= 1 of ``ds[col]`` — the
    typo-tolerant version of the reference's canonical-title equality
    (redirect resolution catches renames; this catches misspellings).
    The (small) title side expands to a deletion-variant dict broadcast
    ONCE; each batch probes its own variants — no shuffle, exact after
    the in-batch verify. Deterministic tie-break: lexicographically
    smallest matching title. Output adds ``out`` (empty = no match)."""
    import ray

    index: dict[str, list[str]] = {}
    for t in sorted(set(titles)):
        for v in _deletion_variants(t):
            index.setdefault(v, []).append(t)
    ref = ray.put(index)

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        idx = cached_get(ref)
        out_vals = []
        for s in b[col].astype(str):
            cands: set[str] = set()
            for v in _deletion_variants(s):
                cands.update(idx.get(v, ()))
            best = ""
            for t in sorted(cands):
                if _edit_distance_leq1(s, t):
                    best = t
                    break
            out_vals.append(best)
        b = b.copy()
        b[out] = out_vals
        return b

    return ds.map_batches(probe, batch_format="pandas")


# --------------------------------------------------- multi-pattern filtering

class AhoCorasick:
    """Multi-pattern substring matcher (Aho & Corasick 1975, public
    algorithm) — the content-filter primitive when the banned-term
    list is thousands of phrases and one regex alternation would
    backtrack. Build cost is paid ONCE PER ACTOR (T4 pattern); match
    is a single pass over the text regardless of pattern count."""

    def __init__(self, patterns: list[str]):
        self.patterns = sorted(set(patterns))
        # trie as dicts: goto[state][ch] -> state
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[set[int]] = [set()]
        for pi, p in enumerate(self.patterns):
            s = 0
            for ch in p:
                if ch not in self.goto[s]:
                    self.goto.append({})
                    self.out.append(set())
                    self.goto[s][ch] = len(self.goto) - 1
                s = self.goto[s][ch]
            self.out[s].add(pi)
        # BFS failure links
        from collections import deque

        self.fail = [0] * len(self.goto)
        dq = deque(self.goto[0].values())
        while dq:
            s = dq.popleft()
            for ch, t in self.goto[s].items():
                dq.append(t)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[t] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != t else 0
                self.out[t] |= self.out[self.fail[t]]

    def count_matches(self, text: str) -> int:
        """Number of pattern OCCURRENCES in text (overlaps counted)."""
        s, n = 0, 0
        for ch in text:
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            n += len(self.out[s])
        return n


class BannedTermsFilter:
    """map_batches actor: flags docs containing any banned phrase.
    Automaton built once per actor from the broadcast term list."""

    def __init__(self, terms_ref):
        import ray

        self.ac = AhoCorasick([t.lower() for t in ray.get(terms_ref)])

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        hits = [self.ac.count_matches(s.lower()) for s in b["text"].astype(str)]
        b["n_banned_hits"] = np.asarray(hits, dtype=np.int64)
        b["banned"] = (b["n_banned_hits"] > 0).astype(np.int64)
        return b


def flag_banned_terms(
    ds: ray.data.Dataset, terms: list[str], concurrency=None
) -> ray.data.Dataset:
    import ray

    ref = ray.put(list(terms))
    return ds.map_batches(
        BannedTermsFilter, fn_constructor_kwargs={"terms_ref": ref},
        batch_format="pandas",
        concurrency=default_pool(concurrency),
    )


# ----------------------------------------------------- unigram LM scoring

def unigram_counts_ds(
    ds: ray.data.Dataset, min_count: int = 1
) -> ray.data.Dataset:
    """Dataset variant of :func:`unigram_counts`: per-batch
    ``np.unique`` partials folded by ``sum_final``; the result STAYS a
    Dataset so O(vocabulary) state never has to land on the driver
    (the BPE big path consumes this directly). ``min_count`` applies
    the standard web-corpus floor — word types rarer than the floor
    are dropped at the fold, which is what keeps a 10^8-row distinct-
    word table tractable before iterative passes over it."""
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

    out = relational.sum_final(
        ds.map_batches(local, batch_format="pandas"), ["token"])
    if min_count > 1:
        def floor(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["n"].to_numpy(np.int64) >= min_count]

        out = out.map_batches(floor, batch_format="pandas")
    return out


def unigram_counts(ds: ray.data.Dataset) -> pd.DataFrame:
    """Corpus unigram counts (``_ALPHA_RE`` tokenizer): per-batch
    ``np.unique`` partials merged once — pass 1 of the unigram-LM
    quality filter."""
    out = unigram_counts_ds(ds).to_pandas()
    if "token" not in out.columns:
        out = pd.DataFrame({"token": pd.Series(dtype=str),
                            "n": pd.Series(dtype=np.int64)})
    return out


def unigram_logprob(
    ds: ray.data.Dataset, counts: pd.DataFrame, alpha: float = 1.0
) -> ray.data.Dataset:
    """Per-doc mean unigram log-probability under the corpus LM
    (add-``alpha`` smoothing) — the cheap stand-in for a perplexity
    quality filter: gibberish and out-of-distribution docs score low,
    repetitive boilerplate scores suspiciously high. Pass 2: the
    vocabulary table broadcasts once; each doc scores with one
    dict-lookup pass. Emits ``mean_logp`` (0.0 for token-less docs)."""
    import ray

    total = float(counts["n"].sum())
    vsize = max(1, len(counts))
    denom = total + alpha * (vsize + 1)
    logp = {t: float(np.log((n + alpha) / denom))
            for t, n in zip(counts["token"], counts["n"])}
    oov = float(np.log(alpha / denom))
    ref = ray.put((logp, oov))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        lp, oo = cached_get(ref)
        out = []
        for s in b["text"].astype(str):
            toks = _ALPHA_RE.findall(s.lower())
            if not toks:
                out.append(0.0)
                continue
            out.append(sum(lp.get(t, oo) for t in toks) / len(toks))
        b = b.copy()
        b["mean_logp"] = np.round(out, 6)
        return b

    return ds.map_batches(score, batch_format="pandas")


# --------------------------------------------------- chunking + id encoding

def chunk_documents(
    ds: ray.data.Dataset,
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> ray.data.Dataset:
    """Context-window chunking: split each doc's whitespace tokens into
    windows of ``chunk_tokens`` advancing by ``chunk_tokens - overlap``
    — the flat_map every LLM pretraining/RAG pipeline runs before
    packing. Deterministic boundaries from token counts only. Emits
    (doc_id, chunk_ix, chunk_text, n_tokens); short docs yield one
    chunk. Reconstruction invariant (strides tile the doc) is
    pytest-oracled."""
    step = max(1, chunk_tokens - overlap)

    def split(b: pd.DataFrame) -> pd.DataFrame:
        ids, ixs, texts, ns = [], [], [], []
        for did, s in zip(b["doc_id"], b["text"].astype(str)):
            toks = [t for t in _WS_RE.split(s) if t]
            if not toks:
                continue
            ix = 0
            for start in range(0, max(1, len(toks) - overlap), step):
                w = toks[start:start + chunk_tokens]
                if not w:
                    break
                ids.append(did)
                ixs.append(ix)
                texts.append(" ".join(w))
                ns.append(len(w))
                ix += 1
        return pd.DataFrame({
            "doc_id": np.asarray(ids, dtype=np.int64),
            "chunk_ix": np.asarray(ixs, dtype=np.int64),
            "chunk_text": texts,
            "n_tokens": np.asarray(ns, dtype=np.int64),
        })

    return ds.map_batches(split, batch_format="pandas")


def encode_token_ids(
    ds: ray.data.Dataset,
    vocab: "pd.Series | list[str]",
    text_col: str = "text",
    unk_id: int = 0,
) -> ray.data.Dataset:
    """Vocabulary lookup: whitespace tokens -> int32 id lists (ids are
    1-based by vocab order; OOV -> ``unk_id``) — the final encode step
    before tensorization. The vocab dict broadcasts once; each batch
    encodes with one lookup pass and emits an Arrow ``list<int32>``
    column (``token_ids``) plus ``n_unk``."""
    import ray

    vlist = sorted(set(vocab))
    ref = ray.put({t: i + 1 for i, t in enumerate(vlist)})

    def enc(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        vmap = cached_get(ref)
        out_ids, out_unk = [], []
        for s in b[text_col].astype(str):
            toks = [t for t in _WS_RE.split(s) if t]
            ids = [vmap.get(t, unk_id) for t in toks]
            out_ids.append(np.asarray(ids, dtype=np.int32))
            out_unk.append(sum(1 for i in ids if i == unk_id))
        b = b.copy()
        b["token_ids"] = out_ids
        b["n_unk"] = np.asarray(out_unk, dtype=np.int64)
        return b

    return ds.map_batches(enc, batch_format="pandas")


def bigram_counts(ds: ray.data.Dataset) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Corpus bigram + unigram counts (``_ALPHA_RE`` tokenizer) — pass
    1 of the bigram-LM scorer. Both tables come from ONE scan: each
    batch emits (w1, w2, n) and (token, n) partials, merged by two
    small ``sum_final`` exchanges. At web scale the bigram table
    would be count-pruned (keep n >= k, score the tail via backoff);
    here it stays exact so the SQL twin can reproduce it."""
    from engine.ops import relational

    def local_bi(b: pd.DataFrame) -> pd.DataFrame:
        w1s: list[str] = []
        w2s: list[str] = []
        for s in b["text"].astype(str):
            toks = _ALPHA_RE.findall(s.lower())
            w1s.extend(toks[:-1])
            w2s.extend(toks[1:])
        if not w1s:
            return pd.DataFrame({"w1": pd.Series(dtype=str),
                                 "w2": pd.Series(dtype=str),
                                 "n": pd.Series(dtype=np.int64)})
        df = pd.DataFrame({"w1": w1s, "w2": w2s})
        agg = df.groupby(["w1", "w2"], as_index=False, sort=False
                         ).size().rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    bi = relational.sum_final(
        ds.map_batches(local_bi, batch_format="pandas"), ["w1", "w2"]
    ).to_pandas()
    uni = unigram_counts(ds)
    return bi, uni


def bigram_logprob(
    ds: ray.data.Dataset, bi: pd.DataFrame, uni: pd.DataFrame,
    alpha: float = 1.0,
) -> ray.data.Dataset:
    """Per-doc mean bigram conditional log-probability
    ln((c(w1,w2)+a) / (c1(w1) + a*(V+1))) — the order-sensitive
    perplexity stand-in that catches shuffled/garbled text the
    unigram LM scores identically. Pass 2: both count tables
    broadcast once; docs with < 2 tokens score 0.0."""
    import ray

    vsize = max(1, len(uni))
    c1 = {t: int(n) for t, n in zip(uni["token"], uni["n"])}
    lp = {}
    for w1, w2, n in zip(bi["w1"], bi["w2"], bi["n"]):
        lp[(w1, w2)] = float(np.log(
            (n + alpha) / (c1[w1] + alpha * (vsize + 1))))
    ref = ray.put((lp, c1, vsize))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        lpd, c1d, vs = cached_get(ref)
        out = []
        for s in b["text"].astype(str):
            toks = _ALPHA_RE.findall(s.lower())
            if len(toks) < 2:
                out.append(0.0)
                continue
            tot = 0.0
            for a, bb in zip(toks[:-1], toks[1:]):
                got = lpd.get((a, bb))
                if got is None:
                    got = float(np.log(alpha / (
                        c1d.get(a, 0) + alpha * (vs + 1))))
                tot += got
            out.append(tot / (len(toks) - 1))
        b = b.copy()
        b["mean_bigram_logp"] = np.round(
            np.asarray(out, np.float64), 6)
        return b[["doc_id", "mean_bigram_logp"]]

    return ds.map_batches(score, batch_format="pandas")


_SENT_SPLIT_RE = re.compile(r"[.!?]+")


def sentence_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc sentence segmentation stats: sentence count (nonblank
    [.!?]+ splits), alpha-token count, and mean tokens per sentence —
    the doc-structure features (run-on boilerplate vs. chopped OCR)
    that quality classifiers consume. Pure vectorized-per-batch
    string pass; SQL twin uses list_filter over the same splits."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        n_sent, n_tok = [], []
        for s in b["text"].astype(str):
            sents = [x for x in _SENT_SPLIT_RE.split(s) if x.strip()]
            n_sent.append(len(sents))
            n_tok.append(len(_ALPHA_RE.findall(s.lower())))
        out = b[["doc_id"]].copy()
        out["n_sentences"] = np.asarray(n_sent, np.int64)
        out["n_tokens"] = np.asarray(n_tok, np.int64)
        out["mean_sent_tokens"] = np.round(np.where(
            out["n_sentences"] > 0,
            out["n_tokens"] / np.maximum(out["n_sentences"], 1),
            0.0), 6)
        return out

    return ds.map_batches(f, batch_format="pandas")


def hapax_rate(
    ds: ray.data.Dataset, counts: pd.DataFrame
) -> ray.data.Dataset:
    """Per-doc hapax-legomena rate: the fraction of token POSITIONS
    whose token occurs exactly once in the whole corpus — high rates
    flag OCR noise / gibberish, near-zero rates flag boilerplate
    (the vocabulary-freshness quality signal). Pass 2 over the
    ``unigram_counts`` table: the sorted hapax vocabulary broadcasts
    once; each batch runs ONE searchsorted membership test over its
    concatenated tokens with a per-doc reduceat."""
    import ray

    hapax = np.sort(counts.loc[counts["n"] == 1, "token"]
                    .to_numpy(object).astype(str))
    ref = ray.put(hapax)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        from engine.state import cached_get

        hx = cached_get(ref)
        toks, lens = [], []
        for s in b["text"].astype(str):
            t = _ALPHA_RE.findall(s.lower())
            toks.extend(t)
            lens.append(len(t))
        lens = np.asarray(lens, np.int64)
        if toks:
            arr = np.asarray(toks, dtype=str)
            pos = np.searchsorted(hx, arr)
            pos = np.minimum(pos, max(len(hx) - 1, 0))
            isin = (hx[pos] == arr) if len(hx) else np.zeros(
                len(arr), bool)
            # prefix-sum segment totals (reduceat chokes on the
            # out-of-range start an empty trailing doc produces)
            csum = np.r_[0, np.cumsum(isin.astype(np.int64))]
            ends = np.cumsum(lens)
            hits = csum[ends] - csum[ends - lens]
        else:
            hits = np.zeros(len(b), np.int64)
        out = b[["doc_id"]].copy()
        out["n_tokens"] = lens
        out["hapax_rate"] = np.round(np.where(
            lens > 0, hits / np.maximum(lens, 1), 0.0), 6)
        return out

    return ds.map_batches(score, batch_format="pandas")


def bpe_pair_counts(
    ds: ray.data.Dataset, k: int = 50, final: str = "small"
) -> pd.DataFrame:
    """Adjacent-symbol (character-pair) frequencies, top-k — the first
    merge-candidate table of byte-pair-encoding tokenizer training
    over the corpus (Sennrich et al. 2016, public method: BPE merges
    the most frequent adjacent symbol pair; this is iteration zero at
    corpus scale). Tokens are whitespace words of the lowercased text;
    pairs never cross a word boundary.

    Scale shape: each batch folds to (pair-key, count) partials — the
    per-UNIQUE-word codepoint pairs weighted by word multiplicity, one
    ``np.unique`` + ``np.bincount`` fold — so the exchange moves
    symbol-vocabulary-bounded partials, never character instances.
    Returns (rank, lsym, rsym, n) with ties broken on (lsym, rsym)."""
    from engine.ops import relational

    def local(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for s in b["text"].astype(str):
            toks.extend(s.lower().split())
        empty = pd.DataFrame({"pair": pd.Series(dtype=np.int64),
                              "n": pd.Series(dtype=np.int64)})
        if not toks:
            return empty
        words, mult = np.unique(np.asarray(toks, dtype=object),
                                return_counts=True)
        keys, cnts = [], []
        for w, m in zip(words, mult):
            if len(w) < 2:
                continue
            cp = np.frombuffer(w.encode("utf-32-le"),
                               np.uint32).astype(np.int64)
            keys.append(cp[:-1] * 0x110000 + cp[1:])
            cnts.append(np.full(len(cp) - 1, m, np.int64))
        if not keys:
            return empty
        flat = np.concatenate(keys)
        wgt = np.concatenate(cnts)
        u, inv = np.unique(flat, return_inverse=True)
        n = np.bincount(inv, weights=wgt.astype(np.float64))
        return pd.DataFrame({"pair": u, "n": n.astype(np.int64)})

    partials = ds.map_batches(local, batch_format="pandas")
    counts = relational.sum_final(partials, ["pair"]).to_pandas()
    if "pair" not in counts.columns:  # empty corpus
        return pd.DataFrame({"rank": pd.Series(dtype=np.int32),
                             "lsym": pd.Series(dtype=str),
                             "rsym": pd.Series(dtype=str),
                             "n": pd.Series(dtype=np.int64)})
    pairs = counts["pair"].to_numpy(np.int64)
    counts["lsym"] = [chr(int(p) // 0x110000) for p in pairs]
    counts["rsym"] = [chr(int(p) % 0x110000) for p in pairs]
    counts = counts.sort_values(
        ["n", "lsym", "rsym"], ascending=[False, True, True],
        kind="stable", ignore_index=True).head(k)
    counts["rank"] = np.arange(1, len(counts) + 1, dtype=np.int32)
    counts["n"] = counts["n"].astype(np.int64)
    return counts[["rank", "lsym", "rsym", "n"]]


def readability_lix(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc LIX readability index (Bjornsson's public formula):
    words/sentences + 100 * long_words/words, with words = alpha
    tokens, sentences = nonblank [.!?]+ splits (same segmentation as
    ``sentence_stats``) and long = more than 6 letters — the
    deterministic, language-agnostic readability gate (no syllable
    heuristics, so the SQL twin reproduces it exactly with
    list_filter). One vectorized string pass per batch."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        n_sent, n_tok, n_long = [], [], []
        for s in b["text"].astype(str):
            sents = [x for x in _SENT_SPLIT_RE.split(s) if x.strip()]
            toks = _ALPHA_RE.findall(s.lower())
            n_sent.append(len(sents))
            n_tok.append(len(toks))
            n_long.append(sum(1 for t in toks if len(t) > 6))
        out = b[["doc_id"]].copy()
        w = np.asarray(n_tok, np.float64)
        sn = np.asarray(n_sent, np.float64)
        lw = np.asarray(n_long, np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            lix = np.where((w > 0) & (sn > 0),
                           w / sn + 100.0 * lw / w, 0.0)
        out["n_words"] = w.astype(np.int64)
        out["n_long_words"] = lw.astype(np.int64)
        out["lix"] = np.round(lix, 6)
        return out

    return ds.map_batches(f, batch_format="pandas")


def char_entropy(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc Shannon entropy (nats) over CODEPOINT frequencies — the
    compressibility proxy that flags key-mash gibberish (entropy too
    high for its language) and repeated-char padding (too low) where
    token-level stats look normal. Codepoints come from a zero-copy
    utf-32 view per doc (no Python char loop); counts are exact ints,
    so the SQL twin's per-character GROUP BY lands on identical
    ratios."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        ents, lens = [], []
        for s in b["text"].astype(str):
            cp = np.frombuffer(s.encode("utf-32-le"), np.uint32)
            n = len(cp)
            if n == 0:
                ents.append(0.0)
                lens.append(0)
                continue
            _, cnt = np.unique(cp, return_counts=True)
            p = cnt / float(n)
            ents.append(float(-(p * np.log(p)).sum()))
            lens.append(n)
        out = b[["doc_id"]].copy()
        out["n_chars"] = np.asarray(lens, np.int64)
        out["char_entropy"] = np.round(ents, 6)
        return out

    return ds.map_batches(f, batch_format="pandas")


def bigram_pmi(ds: ray.data.Dataset, min_count: int = 5) -> pd.DataFrame:
    """Corpus collocation extraction: pointwise mutual information of
    adjacent token pairs, PMI = ln(P(ab) / (P(a) P(b))) computed as
    ln(c_ab * N1 * N1 / (NB * c_a * c_b)) with all counts exact
    integers from ``bigram_counts``'s one-scan combiner (Church &
    Hanks 1990, public formula). Pairs below ``min_count`` are pruned
    (rare-pair PMI is noise); at web scale that prune would move into
    the combiner. The f64 product/quotient tree is mirrored verbatim
    by the SQL twin, so the only nondeterminism budget is libm ln —
    absorbed by the 6dp round (same as the bigram-LM twin)."""
    bi, uni = bigram_counts(ds)
    if not len(bi):
        return pd.DataFrame({"w1": pd.Series(dtype=str),
                             "w2": pd.Series(dtype=str),
                             "n": pd.Series(dtype=np.int64),
                             "pmi": pd.Series(dtype=np.float64)})
    n_uni = float(uni["n"].sum())
    n_bi = float(bi["n"].sum())
    sub = bi[bi["n"] >= min_count].copy()
    cmap = dict(zip(uni["token"], uni["n"].astype(np.int64)))
    c1 = sub["w1"].map(cmap).to_numpy(np.float64)
    c2 = sub["w2"].map(cmap).to_numpy(np.float64)
    # shared expression tree — mirrored verbatim in the twin
    num = sub["n"].to_numpy(np.float64) * n_uni * n_uni
    den = n_bi * c1 * c2
    sub["pmi"] = np.log(num / den)
    sub["n"] = sub["n"].astype(np.int64)
    return sub[["w1", "w2", "n", "pmi"]].sort_values(
        ["w1", "w2"], ignore_index=True)


def levenshtein_prefix_pairs(
    ds: ray.data.Dataset,
    *,
    prefix_len: int = 24,
    bucket_w: int = 16,
    max_dist: int = 6,
) -> pd.DataFrame:
    """Edit-distance near-dup candidate pairs: documents in the same
    ``n_chars // bucket_w`` length bucket whose ``prefix_len``-char
    prefixes are within Levenshtein distance ``max_dist`` (Wagner &
    Fischer 1974 DP, public formula) — the cheap fuzzy-title screen
    that catches typo-level variants n-gram shingles overweight.

    Blocking IS the operator's contract (pairs differing by more
    than a bucket of length never compare — at web scale hot buckets
    would hash-chunk like ``graph.wedge_pairs``); one groupby(bucket)
    co-shuffle, then the DP runs as prefix_len^2 numpy steps
    vectorized ACROSS the bucket's pair axis, never per cell. The
    SQL twin is DuckDB's levenshtein() over the same blocked join."""

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype(np.int64),
            "p": b["text"].astype(str).str.slice(0, prefix_len),
            "bkt": (b["n_chars"].to_numpy(np.int64) // bucket_w)})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                              "b": pd.Series(dtype=np.int64),
                              "dist": pd.Series(dtype=np.int64)})
        if n < 2:
            return empty
        g = g.sort_values("doc_id", ignore_index=True)
        ids = g["doc_id"].to_numpy(np.int64)
        enc = np.zeros((n, prefix_len), np.int32)
        ln = np.zeros(n, np.int64)
        for k, s in enumerate(g["p"]):
            cp = np.array([ord(c) for c in s], np.int32)
            ln[k] = len(cp)
            enc[k, :len(cp)] = cp
        ia, ib = np.triu_indices(n, 1)
        pa, pb = enc[ia], enc[ib]
        m = len(ia)
        lna, lnb = ln[ia], ln[ib]
        # two-row DP (rows x pairs), answers gathered when row == la
        dist = np.zeros(m, np.int64)
        prev = np.broadcast_to(
            np.arange(prefix_len + 1, dtype=np.int32)[:, None],
            (prefix_len + 1, m)).copy()
        hit = lna == 0
        dist[hit] = lnb[hit]
        arange_m = np.arange(m)
        for i in range(1, prefix_len + 1):
            cur = np.empty_like(prev)
            cur[0] = i
            for j in range(1, prefix_len + 1):
                sub = prev[j - 1] + (pa[:, i - 1] != pb[:, j - 1])
                cur[j] = np.minimum(
                    np.minimum(prev[j] + 1, cur[j - 1] + 1), sub)
            hit = lna == i
            if hit.any():
                dist[hit] = cur[lnb[hit], arange_m[hit]]
            prev = cur
        ok = dist <= max_dist
        if not ok.any():
            return empty
        return pd.DataFrame({"a": ids[ia[ok]], "b": ids[ib[ok]],
                             "dist": dist[ok]})

    out = (ds.map_batches(prep, batch_format="pandas")
           .groupby("bkt").map_groups(pairs, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["a", "b"], ignore_index=True)[
        ["a", "b", "dist"]]


def script_profile(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc Unicode script/class profile: fractions of Latin
    letters, ASCII digits, whitespace ([ \\t\\n\\r] exactly), CJK
    unified ideographs (U+4E00..U+9FFF) and everything else — the
    script-mix curation signal that catches mislabeled-language and
    markup-heavy docs. ONE concatenated utf-32 view per batch (no
    per-char work), class counts via reduceat over doc boundaries;
    counts are exact ints so the regexp-counting SQL twin lands on
    identical fractions."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        texts = b["text"].astype(str).tolist()
        lens = np.array([len(t) for t in texts], np.int64)
        cp = np.frombuffer("".join(texts).encode("utf-32-le"),
                           np.uint32)
        bounds = np.concatenate([[0], np.cumsum(lens)[:-1]])
        is_lat = (((cp >= 65) & (cp <= 90))
                  | ((cp >= 97) & (cp <= 122)))
        is_dig = (cp >= 48) & (cp <= 57)
        is_ws = ((cp == 32) | (cp == 9) | (cp == 10) | (cp == 13))
        is_cjk = (cp >= 0x4E00) & (cp <= 0x9FFF)

        def seg(m: np.ndarray) -> np.ndarray:
            if len(cp) == 0:
                return np.zeros(len(lens), np.int64)
            # pad one 0 so a trailing empty doc's start index (==
            # len(cp)) stays valid; reduceat's spurious element for
            # zero-length segments is masked by the lens > 0 where
            c = np.add.reduceat(
                np.concatenate([m.astype(np.int64), [0]]), bounds)
            return np.where(lens > 0, c, 0)

        nl, ndg, nw, nc = seg(is_lat), seg(is_dig), seg(is_ws), \
            seg(is_cjk)
        out = b[["doc_id"]].copy()
        out["n_chars"] = lens
        safe = np.maximum(lens, 1).astype(np.float64)
        out["latin_frac"] = np.round(nl / safe, 6)
        out["digit_frac"] = np.round(ndg / safe, 6)
        out["ws_frac"] = np.round(nw / safe, 6)
        out["cjk_frac"] = np.round(nc / safe, 6)
        out["other_frac"] = np.round(
            (lens - nl - ndg - nw - nc) / safe, 6)
        return out

    return ds.map_batches(f, batch_format="pandas")


def _jaro_winkler(s1: str, s2: str) -> float:
    """Jaro-Winkler similarity, exact DuckDB-builtin semantics
    (verified over 5000 random cases at 1e-12): empty-side -> 0.0,
    match window max(l1,l2)//2 - 1, half transpositions, boost above
    0.7 with prefix scale 0.1 capped at 4 chars (Winkler 1990,
    public formula)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i in range(l1):
        for j in range(max(0, i - window), min(l2, i + window + 1)):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro > 0.7:
        p = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            p += 1
        jaro = jaro + 0.1 * p * (1.0 - jaro)
    return jaro


def jaro_winkler_prefix_pairs(
    ds: ray.data.Dataset,
    *,
    prefix_len: int = 20,
    bucket_w: int = 16,
    min_sim: float = 0.85,
) -> pd.DataFrame:
    """Fuzzy-title near-dup screen by Jaro-Winkler over blocked pairs:
    documents in the same (n_chars // bucket_w, first prefix char)
    block whose ``prefix_len``-char prefixes score >= ``min_sim``.
    Blocking IS the contract (same rule as
    ``levenshtein_prefix_pairs``; the first-char block is also the
    Winkler prefix boost's own support). One groupby(block)
    co-shuffle; the per-pair scorer is O(prefix_len * window) on
    block-bounded pair counts. Similarity is rounded 6dp BEFORE the
    threshold test on BOTH sides so the cut is side-agnostic."""

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        p = b["text"].astype(str).str.slice(0, prefix_len)
        first = p.str.slice(0, 1).to_numpy().astype(str)
        bkt = (b["n_chars"].to_numpy(np.int64)
               // bucket_w).astype(str)
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype(np.int64),
            "p": p.to_numpy(),
            "bkt": np.char.add(np.char.add(bkt, "\x00"), first)})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                              "b": pd.Series(dtype=np.int64),
                              "jw": pd.Series(dtype=np.float64)})
        n = len(g)
        if n < 2:
            return empty
        g = g.sort_values("doc_id", ignore_index=True)
        ids = g["doc_id"].to_numpy(np.int64)
        ps = g["p"].tolist()
        aa, bb, ss = [], [], []
        for i in range(n - 1):
            for j in range(i + 1, n):
                s = round(_jaro_winkler(ps[i], ps[j]), 6)
                if s >= min_sim:
                    aa.append(ids[i])
                    bb.append(ids[j])
                    ss.append(s)
        if not aa:
            return empty
        return pd.DataFrame({"a": np.asarray(aa, np.int64),
                             "b": np.asarray(bb, np.int64),
                             "jw": np.asarray(ss, np.float64)})

    out = (ds.map_batches(prep, batch_format="pandas")
           .groupby("bkt").map_groups(pairs, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["a", "b"], ignore_index=True)[
        ["a", "b", "jw"]]


def rake_keywords(
    ds: ray.data.Dataset,
    k: int = 20,
    stopwords: tuple = ("a", "the"),
) -> pd.DataFrame:
    """RAKE keyword scores (Rose et al. 2010, public algorithm,
    simplified to the stopword-delimited core): phrases are maximal
    non-stopword token runs, word degree = sum of the lengths of the
    phrases each occurrence sits in, score = degree / frequency.
    Tokenizer identical to ``token_topk`` ([a-z]+ runs). Each batch
    folds to per-token (freq, deg) integer partials — one vectorized
    cumsum pass over the batch's token stream, no per-phrase Python —
    then one vocabulary-bounded ``sum_final``; score is an exact
    integer ratio rounded 6dp before the top-k ordering."""
    from engine.ops import relational

    stop = frozenset(stopwords)

    def local(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        doc_ix: list[int] = []
        for dix, s in enumerate(b["text"].astype(str)):
            tt = _ALPHA_RE.findall(s.lower())
            toks.extend(tt)
            doc_ix.extend([dix] * len(tt))
        empty = pd.DataFrame({"token": pd.Series(dtype=str),
                              "freq": pd.Series(dtype=np.int64),
                              "deg": pd.Series(dtype=np.int64)})
        if not toks:
            return empty
        arr = np.asarray(toks, dtype=object)
        dix = np.asarray(doc_ix, np.int64)
        is_stop = np.isin(arr, list(stop))
        newdoc = np.ones(len(arr), bool)
        newdoc[1:] = dix[1:] != dix[:-1]
        pid = np.cumsum(is_stop | newdoc)
        keep = ~is_stop
        if not keep.any():
            return empty
        kw, kp = arr[keep], pid[keep]
        # phrase lengths -> degree of each kept occurrence
        u, inv, cnt = np.unique(kp, return_inverse=True,
                                return_counts=True)
        deg_occ = cnt[inv].astype(np.int64)
        tu, tinv = np.unique(kw, return_inverse=True)
        freq = np.bincount(tinv).astype(np.int64)
        deg = np.bincount(tinv, weights=deg_occ).astype(np.int64)
        return pd.DataFrame({"token": tu, "freq": freq, "deg": deg})

    counts = relational.sum_final(
        ds.map_batches(local, batch_format="pandas"),
        ["token"]).to_pandas()
    if "token" not in counts.columns or not len(counts):
        return pd.DataFrame({"token": pd.Series(dtype=str),
                             "freq": pd.Series(dtype=np.int64),
                             "deg": pd.Series(dtype=np.int64),
                             "rake": pd.Series(dtype=np.float64)})
    counts["rake"] = (counts["deg"].astype(np.float64)
                      / counts["freq"]).round(6)
    counts = counts.sort_values(
        ["rake", "token"], ascending=[False, True], kind="stable",
        ignore_index=True)
    return counts.head(k)[["token", "freq", "deg", "rake"]]


def lexical_richness(ds: ray.data.Dataset) -> pd.DataFrame:
    """Corpus-level lexical-richness constants over the [a-z]+ token
    stream: Yule's K = 1e4 * (sum_t c_t^2 - N) / N^2 (Yule 1944 —
    repeat-rate; LOW for diverse vocabulary, high for template spam)
    and Herdan's C = ln(V) / ln(N) (type-token law exponent), plus
    the N/V census. The generated-boilerplate screen that, unlike
    TTR, is insensitive to corpus length.

    Same exchange as ``token_topk``: per-batch np.unique partial
    counts, (token, count) partials move — never token instances;
    the four scalars fold from the vocabulary table. All counts are
    exact integers in float64, so both statistics land on the SQL
    twin's exact floats."""
    from engine.ops import relational

    def local(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for s in b["text"].astype(str):
            toks.extend(_ALPHA_RE.findall(s.lower()))
        if not toks:
            return pd.DataFrame({"token": pd.Series(dtype=str),
                                 "n": pd.Series(dtype=np.int64)})
        u, c = np.unique(np.asarray(toks, dtype=object),
                         return_counts=True)
        return pd.DataFrame({"token": u, "n": c.astype(np.int64)})

    counts = relational.sum_final(
        ds.map_batches(local, batch_format="pandas"),
        ["token"]).to_pandas()
    if "token" not in counts.columns or not len(counts):
        return pd.DataFrame({"n_tokens": [0], "n_types": [0],
                             "yule_k": [0.0], "herdan_c": [0.0]})
    c = counts["n"].to_numpy(np.float64)
    n = c.sum()
    v = float(len(c))
    s2 = (c * c).sum()
    yule = 1e4 * (s2 - n) / (n * n)
    herdan = np.log(v) / np.log(n)
    return pd.DataFrame({
        "n_tokens": np.asarray([n], np.int64),
        "n_types": np.asarray([v], np.int64),
        "yule_k": np.asarray([yule], np.float64),
        "herdan_c": np.asarray([herdan], np.float64)})


# ------------------------------------------------------------- BM25

def bm25_topk(
    ds: ray.data.Dataset,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Okapi BM25 (Robertson–Spärck Jones, public formula; the Lucene
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf variant) of every doc
    against a fixed query-term set — the relevance ranking a curation
    pipeline uses to mine topic-matched training documents.

    Two distributed passes, both combiner-shaped:
      1. corpus stats: per-batch (n_docs, total_len, per-term df)
         partials — O(terms) rows per batch cross the wire;
      2. scoring: idf table + avgdl broadcast in the UDF closure; each
         batch emits only its (doc_id, score>0) rows, and a per-batch
         local top-k caps the fold at top_k x blocks rows.
    Tokenizer: lowercase ``[a-z]+`` runs — the ``docs_top_tokens``
    twin-equivalent of ``string_split_regex(lower(text), '[^a-z]+')``.
    Deterministic order: (rounded score DESC, doc_id ASC)."""
    terms = sorted(set(query_terms))

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        n_docs = len(batch)
        total = 0
        df_counts = np.zeros(len(terms), np.int64)
        for s in batch["text"].astype(str):
            toks = _ALPHA_RE.findall(s.lower())
            total += len(toks)
            tset = set(toks)
            for j, t in enumerate(terms):
                if t in tset:
                    df_counts[j] += 1
        out = pd.DataFrame({"term": ["", *terms],
                            "df": np.r_[0, df_counts],
                            "n_docs": np.r_[n_docs, np.zeros(len(terms),
                                                             np.int64)],
                            "total_len": np.r_[total,
                                               np.zeros(len(terms),
                                                        np.int64)]})
        return out

    parts = ds.map_batches(stats, batch_format="pandas").to_pandas()
    agg = parts.groupby("term", as_index=False).sum()
    n_total = int(agg.loc[agg["term"] == "", "n_docs"].sum())
    sum_len = int(agg.loc[agg["term"] == "", "total_len"].sum())
    if n_total == 0:
        return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64)})
    avgdl = sum_len / n_total
    dfs = {t: int(agg.loc[agg["term"] == t, "df"].sum()) for t in terms}
    idf = {t: float(np.log(1.0 + (n_total - dfs[t] + 0.5)
                           / (dfs[t] + 0.5))) for t in terms}

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        sc = np.zeros(len(batch), np.float64)
        for i, s in enumerate(batch["text"].astype(str)):
            toks = _ALPHA_RE.findall(s.lower())
            dl = len(toks)
            if not dl:
                continue
            norm = k1 * (1.0 - b + b * dl / avgdl)
            acc = 0.0
            for t in terms:
                tf = toks.count(t)
                if tf:
                    acc += idf[t] * tf * (k1 + 1.0) / (tf + norm)
            sc[i] = acc
        keep = sc > 0
        out = pd.DataFrame({id_col: ids[keep],
                            "score": np.round(sc[keep], 6)})
        # local top-k: the driver folds top_k x blocks rows, not the hits
        return out.sort_values(
            ["score", id_col], ascending=[False, True]).head(top_k)

    cand = ds.map_batches(score, batch_format="pandas").to_pandas()
    if cand.empty:
        return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64)})
    return cand.sort_values(
        ["score", id_col], ascending=[False, True],
        kind="stable", ignore_index=True).head(top_k)


# ------------------------------------------------------- BPE training

# Symbol separator inside the big path's packed word encoding. Safe:
# the ``_ALPHA_RE`` tokenizer only emits [a-z]+ word types, and merged
# symbols are plain concatenations, so \x1f can never occur inside a
# symbol.
_BPE_SEP = "\x1f"

_BPE_MERGE_COLS = ["merge_ix", "left", "right", "pair_count",
                   "new_symbol"]


def _bpe_train_big(
    vocab: ray.data.Dataset, n_merges: int
) -> pd.DataFrame:
    """Vocabulary-as-a-Dataset BPE merge loop (the 10^8-row distinct-
    word path, round-4 verdict item 1): the (word-symbols, count)
    state stays a hash-sharded Dataset end-to-end. Per merge round:
    one ``map_batches`` combiner emits per-shard (left, right, cnt)
    adjacent-pair partials (the pair universe is O(active symbol
    pairs), orders of magnitude below the word vocabulary);
    ``sum_final`` folds them distributed; a top-1 reducer +
    deterministic (count desc, pair asc) driver fold yields the
    winning pair — the driver holds ONE row per round, never the
    vocabulary. The merge then applies per shard via a
    substring-prefiltered ``map_batches`` rewrite (left-to-right
    non-overlapping scan, identical semantics to the driver loop) and
    the state re-materializes for the next round. Word types are
    distinct by construction, so a merge never collapses two state
    rows — no re-aggregation shuffle is needed between rounds."""
    from engine.ops import relational
    from engine.state import default_partitions

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "syms": [_BPE_SEP.join(t) for t in b["token"].astype(str)],
            "n": b["n"].to_numpy(np.int64)})

    state = vocab.map_batches(init, batch_format="pandas") \
        .repartition(default_partitions()).materialize()

    rows = []
    for mi in range(n_merges):
        def pairs(b: pd.DataFrame) -> pd.DataFrame:
            pc: dict[tuple, int] = {}
            for s, c in zip(b["syms"], b["n"].to_numpy(np.int64)):
                sy = s.split(_BPE_SEP)
                for a, r in zip(sy[:-1], sy[1:]):
                    pc[(a, r)] = pc.get((a, r), 0) + int(c)
            if not pc:
                return pd.DataFrame({"left": pd.Series(dtype=str),
                                     "right": pd.Series(dtype=str),
                                     "cnt": pd.Series(dtype=np.int64)})
            ks = list(pc)
            return pd.DataFrame({
                "left": [k[0] for k in ks],
                "right": [k[1] for k in ks],
                "cnt": np.fromiter(pc.values(), np.int64, len(ks))})

        def top1(b: pd.DataFrame) -> pd.DataFrame:
            if not len(b):
                return b
            return b.sort_values(
                ["cnt", "left", "right"],
                ascending=[False, True, True]).head(1)

        winners = relational.sum_final(
            state.map_batches(pairs, batch_format="pandas"),
            ["left", "right"],
        ).map_batches(top1, batch_format="pandas").to_pandas()
        if winners.empty:
            break
        best = min(winners.itertuples(index=False),
                   key=lambda r: (-int(r.cnt), r.left, r.right))
        la, rb, pc_n = str(best.left), str(best.right), int(best.cnt)
        new_sym = la + rb
        rows.append((mi, la, rb, pc_n, new_sym))
        pat = _BPE_SEP + la + _BPE_SEP + rb + _BPE_SEP

        def apply(b: pd.DataFrame, la=la, rb=rb,
                  new_sym=new_sym, pat=pat) -> pd.DataFrame:
            out = []
            for s in b["syms"]:
                # exact adjacency prefilter on the sentinel-wrapped
                # packed form; most words skip the rewrite untouched
                if pat not in (_BPE_SEP + s + _BPE_SEP):
                    out.append(s)
                    continue
                w = s.split(_BPE_SEP)
                o: list[str] = []
                i = 0
                while i < len(w):
                    if i + 1 < len(w) and w[i] == la and w[i + 1] == rb:
                        o.append(new_sym)
                        i += 2
                    else:
                        o.append(w[i])
                        i += 1
                out.append(_BPE_SEP.join(o))
            return pd.DataFrame({"syms": out,
                                 "n": b["n"].to_numpy(np.int64)})

        state = state.map_batches(
            apply, batch_format="pandas").materialize()
    return pd.DataFrame(rows, columns=_BPE_MERGE_COLS)


def bpe_train(
    ds: ray.data.Dataset,
    n_merges: int = 8,
    min_count: int = 1,
    driver_vocab: int = 2_000_000,
) -> pd.DataFrame:
    """Byte-pair-encoding merge training (Sennrich et al. 2016, public
    algorithm) over the corpus: the distributed pass folds the corpus
    to its WORD-FREQUENCY table (``unigram_counts_ds`` — the classic
    BPE trick: merges depend only on (word, count), so the merge loop
    runs over the vocabulary, corpus size never re-enters), applying
    the ``min_count`` floor at the fold (standard practice on web
    corpora — the rare-word tail dominates the distinct-word table but
    not the pair counts). At or below ``driver_vocab`` word types the
    merge loop runs driver-side over the pandas vocabulary (fast at
    fixture scale); above the gate :func:`_bpe_train_big` keeps the
    vocabulary a hash-sharded Dataset with per-round (pair, count)
    combiners, a distributed argmax, and per-shard merge application —
    the driver holds one winning pair per round. Both paths produce
    the identical merge sequence (forced-gate parity pytest).

    Each round picks the most frequent adjacent symbol pair (ties ->
    lexicographically smallest (left, right)) and applies the merge to
    every word. Returns one row per merge: merge_ix, left, right,
    pair_count, new_symbol — the merge table a tokenizer ships with."""
    vocab_ds = unigram_counts_ds(ds, min_count=min_count).materialize()
    if vocab_ds.count() > driver_vocab:
        return _bpe_train_big(vocab_ds, n_merges)
    vocab = vocab_ds.to_pandas()
    if "token" not in vocab.columns or vocab.empty:
        return pd.DataFrame(columns=_BPE_MERGE_COLS)
    words = [tuple(w) for w in vocab["token"].astype(str)]
    counts = vocab["n"].to_numpy(np.int64)
    rows = []
    for mi in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, c in zip(words, counts):
            for a, b in zip(w[:-1], w[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + int(c)
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (la, rb), pc = best
        new_sym = la + rb
        rows.append((mi, la, rb, pc, new_sym))

        def apply(w: tuple) -> tuple:
            out = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == la and w[i + 1] == rb:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            return tuple(out)

        words = [apply(w) if la in w else w for w in words]
    return pd.DataFrame(rows, columns=_BPE_MERGE_COLS)
