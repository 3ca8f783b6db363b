"""Ground-truth generator for the text_analysis operator family.

Independent scalar reimplementation of the text-analysis semantics (language
ID, token counts, quality score, Karp-Rabin fingerprint) used ONLY to persist
an expectation parquet that `oracle_sql()['text_analysis']` reads — the same
pattern as the KG construction-time expectations (sources/corpus.py): the
oracle is derived from the operator SPEC, never from engine output.
`tests/test_text_expectations.py` pins engine == expectation.

Spec notes that make the two implementations provably equal:
- fingerprint: min over char windows of sum(code * B^(w-1-i)) mod 2^64.
  Here: Python-int rolling hash reduced mod 2**64 — definitionally equal to
  the engine's uint64 natural wraparound (stages/text_ops.py:111-125).
- quality_score: same arithmetic expression in the same order; numpy
  element-wise float64 ops are IEEE-identical to the scalar ops used here.
  Word-length sums are exact in float64 (small ints), so sum/n == np.mean.
- language profiles are shared constants (spec data, like the KG generator's
  type lists).
"""
from __future__ import annotations

import re

_WORD_RE = re.compile(r"\S+")
_BPE_RE = re.compile(r"\w+|[^\w\s]+")
_PUNCT_RE = re.compile(r"[^\w\s]")

_STOPWORDS = frozenset(
    ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
     "that", "for", "on", "as", "with"))

# spec data: top character trigrams per language (== stages/text_ops.py)
_LANG_PROFILES = (
    ("en", {" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "}),
    ("de", {"en ", "er ", " de", "der", "ie ", "ch ", "sch", "ein", " un", "und"}),
    ("fr", {" de", "es ", "de ", " le", "le ", "ent", "nt ", "que", " qu", "la "}),
    ("es", {" de", "de ", "os ", " la", "la ", "as ", "el ", " el", "que", " qu"}),
    ("it", {" di", "di ", " co", "to ", "la ", " la", "re ", "one", "che", " ch"}),
)

_FP_BASE = 1000003
_FP_MOD = 1 << 64


def expected_language(text: str) -> str:
    """First language (profile order) whose trigram overlap STRICTLY beats
    the best seen so far; 'und' when nothing overlaps."""
    t = f" {text.lower()} "
    grams = {t[i:i + 3] for i in range(len(t) - 2)}
    best, best_score = "und", 0
    for lang, prof in _LANG_PROFILES:
        score = len(grams & prof)
        if score > best_score:
            best, best_score = lang, score
    return best


def expected_quality(text: str) -> float:
    """Scalar restatement of the quality formula: 0.4*len + 0.2*(1-punct) +
    0.2*stopword + 0.2*mean-word-len terms, each clipped to [0,1]."""
    n = len(text)
    punct = len(_PUNCT_RE.findall(text))
    punct_ratio = punct / n if n else 0.0
    words = text.lower().split()
    stop_ratio = (sum(w in _STOPWORDS for w in words) / len(words)) if words else 0.0
    mean_word_len = (sum(len(w) for w in words) / len(words)) if words else 0.0

    def clip01(x: float) -> float:
        return 0.0 if x < 0.0 else (1.0 if x > 1.0 else x)

    return (clip01(n / 1000.0) * 0.4
            + (1.0 - clip01(punct_ratio * 5)) * 0.2
            + clip01(stop_ratio * 4) * 0.2
            + clip01(mean_word_len / 8.0) * 0.2)


def expected_fingerprint(text: str, window: int = 16) -> int:
    """Min rolling Karp-Rabin hash over UTF-32 code-point windows, mod 2^64,
    returned as two's-complement int64. Rolling Python-int recurrence — a
    different formulation from the engine's vectorized sliding-window matmul,
    equal by the definition of the polynomial hash."""
    codes = [ord(c) for c in text]
    if not codes:
        return 0
    w = min(window, len(codes))
    top = pow(_FP_BASE, w - 1, _FP_MOD)
    h = 0
    for c in codes[:w]:
        h = (h * _FP_BASE + c) % _FP_MOD
    best = h
    for i in range(w, len(codes)):
        h = ((h - codes[i - w] * top) * _FP_BASE + codes[i]) % _FP_MOD
        if h < best:
            best = h
    return best - _FP_MOD if best >= (1 << 63) else best


def expected_row(text: str) -> dict:
    t = text or ""
    return {
        "detected_lang": expected_language(t),
        "ws_token_count": len(_WORD_RE.findall(t)),
        "bpe_token_count": len(_BPE_RE.findall(t)),
        "quality_score": expected_quality(t),
        "fingerprint": expected_fingerprint(t),
    }


def write_text_expectations(docs_parquet: str, out_path: str) -> str:
    """Compute the expectation table for every (doc_id, text) row of a
    documents parquet and persist it. quality_score is stored pre-rounded
    with the SAME Arrow kernel the Ray query output rounds with
    (__ray_entry__._round_cols), so the driver's value hash compares
    identically-rounded float64 on both sides."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = pq.read_table(docs_parquet, columns=["doc_id", "text"])
    rows = [expected_row(t) for t in src.column("text").to_pylist()]
    out = pa.table({
        "doc_id": src.column("doc_id"),
        "detected_lang": pa.array([r["detected_lang"] for r in rows],
                                  type=pa.string()),
        "ws_token_count": pa.array([r["ws_token_count"] for r in rows],
                                   type=pa.int64()),
        "bpe_token_count": pa.array([r["bpe_token_count"] for r in rows],
                                    type=pa.int64()),
        "quality_score": pc.round(
            pa.array([r["quality_score"] for r in rows], type=pa.float64()),
            ndigits=3),
        "fingerprint": pa.array([r["fingerprint"] for r in rows],
                                type=pa.int64()),
    })
    tmp = out_path + ".tmp"
    pq.write_table(out, tmp)
    import os

    os.replace(tmp, out_path)
    return out_path
