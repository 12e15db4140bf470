"""Text-analysis operators for the training-data pipeline: token
counting, quality stats, language-ID heuristic, document fingerprinting.

These extend the engine beyond the reference's operator set (the
reference processes access logs only) toward the large-scale
training-data pipeline the north star describes. Every function is a
vectorized ``map_batches`` body over the ``documents`` table.

The language-ID heuristic is deliberately simple and *exactly mirrored*
by the DuckDB oracle SQL: count per-language stopword hits over
lowercase alphabetic tokens and take the argmax with a deterministic
lexicographic tie-break (de < en < es < fr).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
ALPHA_RE = re.compile(r"[a-z]+")
PUNCT_RE = re.compile(r"[.,;:!?]")
# GPT2-style pretokenizer restricted to ASCII classes so Python re and
# DuckDB RE2 agree exactly (both leftmost-first): contractions, then
# space-prefixed letter runs, digit runs, symbol runs, whitespace runs
BPE_RE_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
BPE_RE = re.compile(BPE_RE_PATTERN)

# keep in lockstep with the oracle SQL in pipelines/dataqueries.py
LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "de": frozenset({"der", "die", "das", "und", "ist", "nicht", "ein"}),
    "en": frozenset({"the", "a", "and", "of", "to", "in", "is"}),
    "es": frozenset({"el", "la", "de", "y", "que", "los", "un"}),
    "fr": frozenset({"le", "la", "de", "et", "les", "un", "une"}),
}
LANGS = sorted(LANG_STOPWORDS)  # de, en, es, fr — tie-break order


def _text_col(batch: pa.Table) -> pa.Array:
    col = batch.column("text")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.fill_null(col, "")


def _alpha_tokens(col: pa.Array):
    """(doc_of, codes, uniques, n_alpha_per_doc) for the lowercase
    [a-z]+ token runs of each doc — vectorized: regex split + dictionary
    encode; per-unique work only (the engine's per-unique idiom)."""
    toks = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z]+")
    offsets = toks.offsets.to_numpy().astype(np.int64)
    wcounts = np.diff(offsets)
    enc = pc.dictionary_encode(toks.values)
    uniq = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = np.repeat(np.arange(len(col), dtype=np.int64), wcounts)
    # the split yields '' entries at boundaries (Python findall doesn't)
    nonempty = pc.utf8_length(toks.values).to_numpy(zero_copy_only=False) > 0
    codes, doc_of = codes[nonempty], doc_of[nonempty]
    n_alpha = np.bincount(doc_of, minlength=len(col)).astype(np.int64)
    return doc_of, codes, uniq, n_alpha


def _count_re(col: pa.Array, pattern: str) -> pa.Array:
    return pc.cast(pc.count_substring_regex(col, pattern), pa.int64())


def token_stats(batch: pa.Table) -> pa.Table:
    """Per-doc token/quality stats: token count, punct count, alpha token
    count, English-stopword count, stopword ratio. Vectorized (r3): RE2
    match counting + dictionary-coded stopword membership; semantics
    identical to the re.findall implementation (same RE2-compatible
    patterns; pinned by the SQL oracle)."""
    col = _text_col(batch)
    doc_of, codes, uniq, n_alpha = _alpha_tokens(col)
    en = LANG_STOPWORDS["en"]
    is_stop = np.fromiter((u in en for u in uniq), dtype=bool, count=len(uniq))
    n_stop_en = np.bincount(doc_of[is_stop[codes]],
                            minlength=len(col)).astype(np.int64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": _count_re(col, TOKEN_RE.pattern),
        "n_punct": _count_re(col, PUNCT_RE.pattern),
        "n_alpha_tokens": pa.array(n_alpha),
        "n_stop_en": pa.array(n_stop_en),
        "n_bpe_tokens": _count_re(col, BPE_RE_PATTERN),
    })


def lang_id(batch: pa.Table) -> pa.Table:
    """Stopword-count argmax language ID with deterministic tie-break
    (first max in sorted LANGS order). Vectorized like token_stats."""
    col = _text_col(batch)
    doc_of, codes, uniq, _ = _alpha_tokens(col)
    counts = np.zeros((len(col), len(LANGS)), dtype=np.int64)
    for j, lang in enumerate(LANGS):
        sw = LANG_STOPWORDS[lang]
        member = np.fromiter((u in sw for u in uniq), dtype=bool,
                             count=len(uniq))
        counts[:, j] = np.bincount(doc_of[member[codes]], minlength=len(col))
    pred_idx = counts.argmax(axis=1)  # first max wins == lexicographic tie-break
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "pred_lang": pc.take(pa.array(LANGS, type=pa.string()),
                             pa.array(pred_idx)),
    })


# ---- fingerprinting (rolling Karp-Rabin + min-sampling) --------------------
_FP_BASE = np.uint64(1099511628211)
_FP_WINDOW = 16


def _rolling_hashes(data: bytes, window: int = _FP_WINDOW) -> np.ndarray:
    """Polynomial rolling hashes of every `window`-byte substring
    (uint64 wraparound arithmetic), vectorized."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    if len(b) < window:
        b = np.pad(b, (0, window - len(b)), constant_values=0)
    # prefix polynomial trick: H[i] = sum b[i+k] * BASE^(window-1-k)
    powers = np.power(_FP_BASE, np.arange(window - 1, -1, -1, dtype=np.uint64))
    n = len(b) - window + 1
    out = np.zeros(n, dtype=np.uint64)
    for k in range(window):  # window is small; n is the long axis
        out += b[k : k + n] * powers[k]
    return out


def fingerprint(batch: pa.Table, n_min: int = 8) -> pa.Table:
    """Document fingerprint: the n_min smallest rolling-window hashes
    (a winnowing-style min-sample; equal docs -> equal fingerprints,
    high overlap -> high fingerprint overlap)."""
    texts = [t or "" for t in batch.column("text").to_pylist()]  # null -> ""
    fps = []
    for t in texts:
        h = _rolling_hashes(t.encode("utf-8"))
        smallest = np.unique(h)[:n_min]  # unique() is already sorted
        fps.append([int(x) for x in smallest.astype(np.int64)])
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(fps, type=pa.list_(pa.int64())),
    })
