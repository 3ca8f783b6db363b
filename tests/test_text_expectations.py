"""Engine text-analysis kernels == the independent oracle restatement
(sources/text_expect.py) — kernel-level pins plus hostile inputs, the fast
failure localizer behind the driver's text_analysis frame compare."""
import numpy as np
import pyarrow as pa

from wikidata_edit_history_ray.sources import text_expect as TE
from wikidata_edit_history_ray.stages import text_ops as TO

CASES = [
    "",
    "x",
    "the quick brown fox jumps over the lazy dog",
    "der schnelle braune Fuchs springt über den faulen Hund und die Katze",
    "le renard brun rapide saute par dessus le chien paresseux que nous",
    "¡Hola! ¿Qué tal? 42 + 17 = 59...",
    "a" * 2000,
    "word " * 300,
    "!!!???...;;;:::",
    "短い非ラテン文字テキスト",
    "mixed 中文 and english the of and to in",
    "\t\n  whitespace   runs\n\nonly\t",
]


def _engine_rows(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    out = TO.fingerprint(TO.quality_score(TO.token_counts(TO.language_id(t))))
    return out.to_pylist()


def test_kernels_match_oracle_restatement():
    rows = _engine_rows(CASES)
    for text, row in zip(CASES, rows):
        exp = TE.expected_row(text)
        assert row["detected_lang"] == exp["detected_lang"], text[:40]
        assert row["ws_token_count"] == exp["ws_token_count"], text[:40]
        assert row["bpe_token_count"] == exp["bpe_token_count"], text[:40]
        # bit-identical float64 (same IEEE ops in the same order)
        assert row["quality_score"] == exp["quality_score"], text[:40]
        assert row["fingerprint"] == exp["fingerprint"], text[:40]


def test_fingerprint_rolling_equals_matmul_randomized():
    rng = np.random.RandomState(11)
    alphabet = "abcdefgh é中"
    for _ in range(50):
        n = int(rng.randint(0, 64))
        s = "".join(alphabet[i] for i in rng.randint(0, len(alphabet), size=n))
        assert TO.rolling_fingerprint(s) % (1 << 64) == \
            TE.expected_fingerprint(s) % (1 << 64), repr(s)


def test_quality_score_bit_identical_randomized():
    rng = np.random.RandomState(12)
    words = ["the", "of", "fox", "supercalifragilistic", "a1!", "...", "und"]
    for _ in range(50):
        k = int(rng.randint(0, 40))
        s = " ".join(words[i] for i in rng.randint(0, len(words), size=k))
        got = _engine_rows([s])[0]["quality_score"]
        assert got == TE.expected_row(s)["quality_score"], s
