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


def token_stats(batch: pa.Table) -> pa.Table:
    """Per-doc token/quality stats: token count, punct count, alpha token
    count, English-stopword count, stopword ratio."""
    texts = [t or "" for t in batch.column("text").to_pylist()]  # null -> ""
    n = len(texts)
    n_tokens = np.empty(n, dtype=np.int64)
    n_punct = np.empty(n, dtype=np.int64)
    n_alpha = np.empty(n, dtype=np.int64)
    n_stop_en = np.empty(n, dtype=np.int64)
    n_bpe = np.empty(n, dtype=np.int64)
    en = LANG_STOPWORDS["en"]
    for i, t in enumerate(texts):
        n_tokens[i] = len(TOKEN_RE.findall(t))
        n_punct[i] = len(PUNCT_RE.findall(t))
        alpha = ALPHA_RE.findall(t.lower())
        n_alpha[i] = len(alpha)
        n_stop_en[i] = sum(1 for w in alpha if w in en)
        n_bpe[i] = len(BPE_RE.findall(t))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens),
        "n_punct": pa.array(n_punct),
        "n_alpha_tokens": pa.array(n_alpha),
        "n_stop_en": pa.array(n_stop_en),
        "n_bpe_tokens": pa.array(n_bpe),
    })


def lang_id(batch: pa.Table) -> pa.Table:
    """Stopword-count argmax language ID with deterministic tie-break."""
    texts = [t or "" for t in batch.column("text").to_pylist()]  # null -> ""
    counts = np.zeros((len(texts), len(LANGS)), dtype=np.int64)
    for i, t in enumerate(texts):
        alpha = ALPHA_RE.findall(t.lower())
        for j, lang in enumerate(LANGS):
            sw = LANG_STOPWORDS[lang]
            counts[i, j] = sum(1 for w in alpha if w in sw)
    pred_idx = counts.argmax(axis=1)  # first max wins == lexicographic tie-break
    preds = [LANGS[j] for j in pred_idx]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "pred_lang": pa.array(preds, type=pa.string()),
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
