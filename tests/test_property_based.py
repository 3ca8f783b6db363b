"""Property-based tests (hypothesis): canonicalization invariants, edit
distance laws, revision-script P/R by construction."""
import json
import random

from hypothesis import given, settings, strategies as st

from wikidata_edit_history_ray.core import features as F
from wikidata_edit_history_ray.core.values import homogenize_snak, snak_value_hash


def _snak(value, type_):
    return {"snaktype": "value", "property": "P1", "hash": "h",
            "datavalue": {"value": value, "type": type_}}


small_text = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                     max_size=24)


class TestCanonicalizationProperties:
    @given(st.integers(min_value=1, max_value=10**8))
    def test_entity_id_forms_hash_equal(self, nid):
        a = _snak({"entity-type": "item", "numeric-id": nid}, "wikibase-entityid")
        b = _snak({"entity-type": "item", "numeric-id": nid, "id": f"Q{nid}"},
                  "wikibase-entityid")
        assert snak_value_hash(homogenize_snak(a)) == snak_value_hash(homogenize_snak(b))

    @given(st.integers(min_value=1, max_value=9999),
           st.integers(min_value=0, max_value=7))
    def test_time_zero_padding_hash_equal(self, year, pad):
        def t(y):
            return _snak({"time": f"+{y}-06-15T00:00:00Z", "timezone": 0,
                          "before": 0, "after": 0, "precision": 11,
                          "calendarmodel": "c"}, "time")

        a = t(str(year))
        b = t("0" * pad + str(year))
        assert snak_value_hash(homogenize_snak(a)) == snak_value_hash(homogenize_snak(b))

    @given(small_text, st.sampled_from(["string", "external-id", "url"]))
    def test_homogenize_idempotent_and_hash_stable(self, text, dtype):
        s = _snak(text, dtype)
        once = homogenize_snak(json.loads(json.dumps(s)))
        h1 = snak_value_hash(once)
        twice = homogenize_snak(json.loads(json.dumps(once)))
        assert snak_value_hash(twice) == h1


class TestEditDistanceProperties:
    @given(small_text, small_text)
    def test_symmetry(self, a, b):
        assert F.levenshtein_distance(a, b) == F.levenshtein_distance(b, a)

    @given(small_text, small_text)
    def test_bounds(self, a, b):
        d = F.levenshtein_distance(a, b)
        assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))
        assert (d == 0) == (a == b)

    @given(small_text, small_text)
    def test_edit_operations_sum_to_distance(self, a, b):
        ins, dels, subs = F._edit_operations(a, b)
        assert ins + dels + subs == F.levenshtein_distance(a, b) \
            or ins + dels + subs >= F.levenshtein_distance(a.lower(), b.lower())
        # exact: ops DP runs on the raw strings
        assert ins + dels + subs == F.levenshtein_distance(a, b)


class TestScriptedDifferProperties:
    @settings(max_examples=15, deadline=None)
    @given(st.integers(min_value=0, max_value=10**6))
    def test_random_scripts_pr_is_one(self, seed):
        """Any generator-produced revision script yields exactly the expected
        change set (P=R=1) — ground truth by construction."""
        from wikidata_edit_history_ray.core.differ import DiffConfig, PageDiffer
        from wikidata_edit_history_ray.sources.corpus import build_doc

        rng = random.Random(seed)
        sim = build_doc(f"Q{rng.randint(1, 10**6)}", rng)
        out = PageDiffer(DiffConfig()).process_doc(sim.qid, sim.spans)
        got = {(c[0], c[1], c[3], c[8], c[9]) for c in out["value_change"]}
        exp = {(e["revision_id"], e["property_id"], e["value_id"],
                e["change_target"], e["action"]) for e in sim.expected_value_changes}
        assert got == exp
