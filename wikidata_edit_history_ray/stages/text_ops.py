"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All are vectorized/batched `map_batches` transforms over a generic documents
table (doc_id, text, ...). Regexes compile at module import (once per worker
process), not per batch.
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS_RE = re.compile(r"\s+")
_PUNCT_RE = re.compile(r"[^\w\s]")
# a BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs
_BPE_RE = re.compile(r"\w+|[^\w\s]+")

# tiny n-gram language profiles (top character trigrams per language) — the
# classic heuristic; deterministic, dependency-free
_LANG_PROFILES = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "),
    "de": ("en ", "er ", " de", "der", "ie ", "ch ", "sch", "ein", " un", "und"),
    "fr": (" de", "es ", "de ", " le", "le ", "ent", "nt ", "que", " qu", "la "),
    "es": (" de", "de ", "os ", " la", "la ", "as ", "el ", " el", "que", " qu"),
    "it": (" di", "di ", " co", "to ", "la ", " la", "re ", "one", "che", " ch"),
}
_LANG_SETS = {lang: set(grams) for lang, grams in _LANG_PROFILES.items()}


def detect_language(text: str) -> str:
    """Character-trigram overlap against per-language profiles; 'und' when no
    profile matches."""
    t = f" {text.lower()} "
    grams = {t[i:i + 3] for i in range(len(t) - 2)}
    best, best_score = "und", 0
    for lang, prof in _LANG_SETS.items():
        score = len(grams & prof)
        if score > best_score:
            best, best_score = lang, score
    return best


_LANG_ORDER = list(_LANG_PROFILES.items())


def language_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized: a profile trigram is in the text's trigram set iff it is a
    substring of the padded text, so the score is a sum of Arrow
    match_substring masks (one pass per profile gram, 50 total) and the
    winner is the first-profile-order strict argmax — identical to
    detect_language row by row (differentially tested)."""
    n = batch.num_rows
    if n == 0:
        return batch.append_column("detected_lang",
                                   pa.array([], type=pa.string()))
    lowered = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
    padded = pc.binary_join_element_wise(" ", lowered, " ", "")
    scores = np.zeros((len(_LANG_ORDER), n), dtype=np.int32)
    for li, (_lang, grams) in enumerate(_LANG_ORDER):
        for g in grams:
            scores[li] += pc.match_substring(padded, g).combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int32)
    best_idx = np.argmax(scores, axis=0)  # first max = profile-order winner
    best_score = scores[best_idx, np.arange(n)]
    langs = np.array([lang for lang, _ in _LANG_ORDER])
    out = np.where(best_score > 0, langs[best_idx], "und")
    return batch.append_column("detected_lang",
                               pa.array(out, type=pa.string()))


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace tokens + BPE-ish piece count, vectorized where possible."""
    texts = batch.column(text_col)
    ws_tokens = pc.count_substring_regex(texts, pattern=r"\S+")
    bpe_counts = pa.array(
        [len(_BPE_RE.findall(t or "")) for t in texts.to_pylist()], type=pa.int64())
    out = batch.append_column("ws_token_count", pc.cast(ws_tokens, pa.int64()))
    return out.append_column("bpe_token_count", bpe_counts)


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features + score: length, punctuation ratio, stopword
    ratio, mean word length."""
    stopwords = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
                 "that", "for", "on", "as", "with"}
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    lengths = np.empty(n, dtype=np.int64)
    punct_ratio = np.empty(n, dtype=np.float64)
    stop_ratio = np.empty(n, dtype=np.float64)
    mean_word_len = np.empty(n, dtype=np.float64)
    for i, t in enumerate(texts):
        t = t or ""
        lengths[i] = len(t)
        punct = len(_PUNCT_RE.findall(t))
        punct_ratio[i] = punct / len(t) if t else 0.0
        words = t.lower().split()
        stop_ratio[i] = (sum(w in stopwords for w in words) / len(words)) if words else 0.0
        mean_word_len[i] = float(np.mean([len(w) for w in words])) if words else 0.0
    score = (
        np.clip(lengths / 1000.0, 0, 1) * 0.4
        + (1.0 - np.clip(punct_ratio * 5, 0, 1)) * 0.2
        + np.clip(stop_ratio * 4, 0, 1) * 0.2
        + np.clip(mean_word_len / 8.0, 0, 1) * 0.2
    )
    out = batch.append_column("char_count", pa.array(lengths, type=pa.int64()))
    out = out.append_column("punct_ratio", pa.array(punct_ratio, type=pa.float64()))
    out = out.append_column("stopword_ratio", pa.array(stop_ratio, type=pa.float64()))
    out = out.append_column("mean_word_len", pa.array(mean_word_len, type=pa.float64()))
    return out.append_column("quality_score", pa.array(score, type=pa.float64()))


_FP_BASE = np.uint64(1000003)
_FP_POWERS = {}  # window -> uint64 power vector (mod 2^64 natural wrap)


def _fp_powers(window: int) -> np.ndarray:
    p = _FP_POWERS.get(window)
    if p is None:
        p = np.empty(window, dtype=np.uint64)
        acc = np.uint64(1)
        for i in range(window - 1, -1, -1):
            p[i] = acc
            acc = acc * _FP_BASE  # natural mod 2^64
        _FP_POWERS[window] = p
    return p


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Karp-Rabin document fingerprint: min rolling hash over char windows
    (mod 2^64 natural wrap) — stable content identity robust to document
    concatenation order. Fully vectorized: every window hash is one
    sliding-window x power-vector product (no per-char Python loop)."""
    t = text or ""
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if len(codes) == 0:
        return 0
    if len(codes) < window:
        window = len(codes)
    w = np.lib.stride_tricks.sliding_window_view(codes, window)
    with np.errstate(over="ignore"):
        hashes = w @ _fp_powers(window)  # uint64 wrap == mod 2^64
    return int(hashes.min())


def fingerprint(batch: pa.Table, text_col: str = "text", window: int = 16) -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    vals = [rolling_fingerprint(t, window) for t in texts]
    # store as two's-complement int64 (Arrow has no uint64-friendly hash col)
    return batch.append_column(
        "fingerprint",
        pa.array([v - (1 << 64) if v >= (1 << 63) else v for v in vals],
                 type=pa.int64()))


# ---- Dataset-level wrappers ----

def analyze_text(ds, text_col: str = "text", ops=("language", "tokens", "quality", "fingerprint")):
    """Chain the selected text ops as vectorized map_batches stages."""
    if "language" in ops:
        ds = ds.map_batches(lambda b: language_id(b, text_col), batch_format="pyarrow")
    if "tokens" in ops:
        ds = ds.map_batches(lambda b: token_counts(b, text_col), batch_format="pyarrow")
    if "quality" in ops:
        ds = ds.map_batches(lambda b: quality_score(b, text_col), batch_format="pyarrow")
    if "fingerprint" in ops:
        ds = ds.map_batches(lambda b: fingerprint(b, text_col), batch_format="pyarrow")
    return ds
