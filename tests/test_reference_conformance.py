"""Conformance: run the ACTUAL reference PageParser (via import shims) on the
synthetic corpus and compare its emitted tuples against this engine's differ.

This is the strongest P/R evidence available in this sandbox: the reference's
own code is the oracle. Target: P/R >= 0.95 on (subj, pred, obj)-style change
tuples; in practice the engine matches exactly on the compared columns.
"""
import os

import pytest

from wikidata_edit_history_ray.core.constants import (
    QUALIFIER_CHANGE_COLS,
    REFERENCE_CHANGE_COLS,
    REVISION_COLS,
    VALUE_CHANGE_COLS,
)
from wikidata_edit_history_ray.core.differ import DiffConfig, PageDiffer
from wikidata_edit_history_ray.sources.corpus import AO_TYPES, SA_TYPES, make_corpus

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/scripts"),
    reason="reference repo not available")


def _norm(v):
    if v is None or v == "":
        return ""
    return str(v)


def _rows(table_rows, cols, keep):
    idx = [cols.index(c) for c in keep]
    return {tuple(_norm(r[i]) for i in idx) for r in table_rows}


@pytest.fixture(scope="module")
def comparison():
    from reference_shim import run_reference_page_parser

    docs, _ = make_corpus(80, seed=777)
    cfg = DiffConfig(extract_datatype_metadata=False)
    ours = PageDiffer(cfg, scholarly_article_types=set(SA_TYPES),
                      astronomical_object_types=set(AO_TYPES))
    mine, theirs = {}, {}
    for i in range(docs.num_rows):
        doc_id = docs["doc_id"][i].as_py()
        spans = docs["spans"][i].as_py()
        mine[doc_id] = ours.process_doc(doc_id, spans)
        theirs[doc_id] = run_reference_page_parser(
            doc_id, spans, sa_types=SA_TYPES, ao_types=AO_TYPES,
            workdir="/tmp/widiff_ref_conformance")
    return mine, theirs


def _pr(got: set, exp: set):
    tp = len(got & exp)
    return (tp / len(got) if got else 1.0, tp / len(exp) if exp else 1.0)


class TestReferenceConformance:
    def test_value_change_triples(self, comparison):
        mine, theirs = comparison
        keep = ["revision_id", "property_id", "value_id", "change_target",
                "action", "old_value", "new_value", "old_datatype",
                "new_datatype", "old_hash", "new_hash", "label",
                "is_reverted", "reversion", "entity_id", "timestamp",
                "week", "year_month", "year"]
        got = set()
        exp = set()
        for d in mine:
            got |= _rows(mine[d]["value_change"], VALUE_CHANGE_COLS, keep)
            exp |= _rows(theirs[d]["value_change"], VALUE_CHANGE_COLS, keep)
        p, r = _pr(got, exp)
        assert p >= 0.95 and r >= 0.95, (p, r, len(got), len(exp))

    def test_value_change_exact(self, comparison):
        """Beyond P/R: the engine matches the reference exactly on these docs."""
        mine, theirs = comparison
        keep = ["revision_id", "property_id", "value_id", "change_target",
                "action", "old_value", "new_value", "old_hash", "new_hash",
                "is_reverted", "reversion", "reversion_timestamp",
                "revision_id_reversion"]
        for d in mine:
            got = _rows(mine[d]["value_change"], VALUE_CHANGE_COLS, keep)
            exp = _rows(theirs[d]["value_change"], VALUE_CHANGE_COLS, keep)
            assert got == exp, f"doc {d}: {got ^ exp}"

    def test_qualifier_and_reference_changes(self, comparison):
        mine, theirs = comparison
        qkeep = ["revision_id", "property_id", "value_id", "qual_property_id",
                 "value_hash", "old_value", "new_value", "action", "label"]
        rkeep = ["revision_id", "property_id", "value_id", "ref_property_id",
                 "ref_hash", "value_hash", "old_value", "new_value", "action"]
        for d in mine:
            assert _rows(mine[d]["qualifier_change"], QUALIFIER_CHANGE_COLS, qkeep) \
                == _rows(theirs[d]["qualifier_change"], QUALIFIER_CHANGE_COLS, qkeep)
            assert _rows(mine[d]["reference_change"], REFERENCE_CHANGE_COLS, rkeep) \
                == _rows(theirs[d]["reference_change"], REFERENCE_CHANGE_COLS, rkeep)

    def test_revision_rows(self, comparison):
        mine, theirs = comparison
        keep = ["prev_revision_id", "revision_id", "entity_id", "timestamp",
                "week", "year_month", "year", "user_id", "username",
                "user_type", "comment", "redirect", "entity_label"]
        for d in mine:
            got = _rows(mine[d]["revision"], REVISION_COLS, keep)
            exp = _rows(theirs[d]["revision"], REVISION_COLS, keep)
            assert got == exp, f"doc {d}"

    def test_routing_flags(self, comparison):
        mine, theirs = comparison
        for d in mine:
            for flag in ("is_scholarly_article", "is_astronomical_object",
                         "has_less_revisions"):
                assert mine[d][flag] == theirs[d][flag], (d, flag)

    def test_feature_tables(self, comparison):
        mine, theirs = comparison
        for d in mine:
            for t in ("features_text", "features_time", "features_quantity",
                      "features_globecoordinate"):
                got = {tuple(_norm(x) for x in row) for row in mine[d][t]}
                exp = {tuple(_norm(x) for x in row) for row in theirs[d][t]}
                assert got == exp, (d, t)
