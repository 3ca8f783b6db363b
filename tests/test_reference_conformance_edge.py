"""Conformance for differ edge paths vs the reference's own PageParser:
redirect revisions, cleaned entities, deleted/malformed revisions,
novalue/somevalue statements, label-delete edges, config variations."""
import copy
import os
import random

import pytest

from wikidata_edit_history_ray.core.constants import (
    REVISION_COLS,
    VALUE_CHANGE_COLS,
)
from wikidata_edit_history_ray.core.differ import DiffConfig, PageDiffer
from wikidata_edit_history_ray.sources.corpus import EntitySim

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/scripts"),
    reason="reference repo not available")

VC_KEEP = ["revision_id", "property_id", "value_id", "change_target", "action",
           "old_value", "new_value", "old_hash", "new_hash", "label",
           "is_reverted", "reversion"]


def _norm(v):
    return "" if v is None or v == "" else str(v)


def _rows(rows, cols, keep):
    idx = [cols.index(c) for c in keep]
    return {tuple(_norm(r[i]) for i in idx) for r in rows}


def run_both(sim, language="en", re_interpretation=True):
    from reference_shim import REFERENCE_SET_UP, run_reference_page_parser
    import reference_shim

    mine = PageDiffer(DiffConfig(
        language=language, re_interpretation=re_interpretation,
        extract_datatype_metadata=False)).process_doc(sim.qid, sim.spans)
    set_up = copy.deepcopy(REFERENCE_SET_UP)
    set_up["change_extraction_processing"]["language"] = language
    set_up["re_interpretation"] = re_interpretation
    old = reference_shim.REFERENCE_SET_UP
    reference_shim.REFERENCE_SET_UP = set_up
    try:
        theirs = run_reference_page_parser(sim.qid, sim.spans,
                                           workdir="/tmp/widiff_ref_conformance")
    finally:
        reference_shim.REFERENCE_SET_UP = old
    return mine, theirs


def assert_vc_and_rev(mine, theirs):
    assert _rows(mine["value_change"], VALUE_CHANGE_COLS, VC_KEEP) \
        == _rows(theirs["value_change"], VALUE_CHANGE_COLS, VC_KEEP)
    rev_keep = ["prev_revision_id", "revision_id", "timestamp", "user_type",
                "redirect", "q_id_redirect", "entity_label"]
    assert _rows(mine["revision"], REVISION_COLS, rev_keep) \
        == _rows(theirs["revision"], REVISION_COLS, rev_keep)


def sim_for(qid, seed=13):
    sim = EntitySim(qid, random.Random(seed), rev_base=9000)
    sim.op_create_entity(type_qids=["Q3000"], n_statements=2,
                         label="Edge", desc="edge case entity")
    return sim


class TestEdgeConformance:
    def test_cleaned_then_redirect(self):
        sim = sim_for("Q701")
        sim.op_add_statement(kind="string", with_qualifier=True, with_reference=True)
        sim.op_cleaned()
        sim.op_redirect("Q42")
        mine, theirs = run_both(sim)
        assert_vc_and_rev(mine, theirs)

    def test_revision_after_redirect(self):
        """After a redirect revision the reference diffs the next snapshot
        against the redirect dict (claims -> {}), re-creating everything."""
        sim = sim_for("Q702")
        sim.op_redirect("Q43")
        sim.snapshot_revision()  # full snapshot again after the redirect
        mine, theirs = run_both(sim)
        assert_vc_and_rev(mine, theirs)

    def test_deleted_between_changes(self):
        sim = sim_for("Q703")
        sim.op_deleted_revision()
        sim.op_add_statement(kind="entity")
        sim.op_deleted_revision()
        sim.op_update_value()
        mine, theirs = run_both(sim)
        assert_vc_and_rev(mine, theirs)

    def test_unrecoverable_malformed_revision_divergence(self):
        """DOCUMENTED DIVERGENCE: on a revision whose JSON both recovery
        stages fail to parse, the reference's error-logging path itself
        crashes (UnboundLocalError on `e`, scripts/page_parser.py:168-175) and
        the surrounding worker drops the ENTIRE page. This engine skips just
        the poison revision (previous-revision pointer not advanced) and keeps
        the document — strictly more data, same diff chain."""
        sim = sim_for("Q711")
        sim.op_malformed_revision()
        r3, *_ = sim.op_add_statement(kind="string")
        mine = PageDiffer(DiffConfig(extract_datatype_metadata=False)) \
            .process_doc(sim.qid, sim.spans)
        # engine: malformed revision invisible, later change still extracted
        assert any(r[0] == r3 for r in mine["value_change"])
        # reference: whole page lost
        from reference_shim import run_reference_page_parser

        with pytest.raises(Exception):
            run_reference_page_parser(sim.qid, sim.spans,
                                      workdir="/tmp/widiff_ref_conformance")

    def test_alias_only_then_change(self):
        sim = sim_for("Q704")
        sim.op_alias_only_revision()
        sim.op_label_change("Edge v2")
        mine, theirs = run_both(sim)
        assert_vc_and_rev(mine, theirs)

    def test_novalue_somevalue_statements(self):
        sim = sim_for("Q705")
        for st in ("novalue", "somevalue"):
            stmt = sim.make_statement(f"P7{10 if st=='novalue' else 11}", None,
                                      snaktype=st)
            sim.claims.setdefault(stmt["mainsnak"]["property"], []).append(stmt)
            sim.snapshot_revision()
        # delete one of them
        sim.claims.pop("P710")
        sim.snapshot_revision()
        mine, theirs = run_both(sim)
        assert_vc_and_rev(mine, theirs)

    def test_label_description_delete(self):
        sim = sim_for("Q706")
        sim.label = None
        sim.snapshot_revision()
        sim.description = None
        sim.snapshot_revision()
        mine, theirs = run_both(sim)
        assert_vc_and_rev(mine, theirs)

    def test_language_filter_de(self):
        """Language-filtered label extraction: en labels invisible under de."""
        sim = sim_for("Q707")
        sim.op_label_change("Edge en v2")
        mine, theirs = run_both(sim, language="de")
        assert_vc_and_rev(mine, theirs)
        # no label rows at all (labels only exist in en)
        assert not any(r[1] == -1 for r in mine["value_change"])

    def test_re_interpretation_off(self):
        sim = sim_for("Q708")
        _, pid, stmt = sim.op_add_statement(kind="string")
        sim.op_rank_change(new_rank="deprecated")
        mine, theirs = run_both(sim, re_interpretation=False)
        assert_vc_and_rev(mine, theirs)
        li = VALUE_CHANGE_COLS.index("label")
        assert all(_norm(r[li]) == "" for r in mine["value_change"])

    def test_duplicate_statement_same_value_different_ids(self):
        sim = sim_for("Q709")
        dv = {"value": "twin value", "type": "string"}
        import json as _json

        s1 = sim.make_statement("P800", _json.loads(_json.dumps(dv)))
        s2 = sim.make_statement("P800", _json.loads(_json.dumps(dv)))
        sim.claims["P800"] = [s1, s2]
        sim.snapshot_revision()
        sim.claims["P800"] = [s1]  # drop one twin
        sim.snapshot_revision()
        mine, theirs = run_both(sim)
        assert_vc_and_rev(mine, theirs)

    def test_property_labels_flow_into_rows(self):
        """J1: the broadcast property-label dict fills property_label columns
        identically to the reference's per-process dict."""
        from reference_shim import run_reference_page_parser

        labels = {"31": "instance of", "-1": "label", "-2": "description",
                  **{str(p): f"prop {p}" for p in range(100, 261)}}
        sim = sim_for("Q712")
        sim.op_add_statement(kind="string")
        mine = PageDiffer(DiffConfig(extract_datatype_metadata=False),
                          property_labels=labels).process_doc(sim.qid, sim.spans)
        theirs = run_reference_page_parser(
            sim.qid, sim.spans, property_labels=labels,
            workdir="/tmp/widiff_ref_conformance")
        li = VALUE_CHANGE_COLS.index("property_label")
        got = sorted(_norm(r[li]) for r in mine["value_change"])
        exp = sorted(_norm(r[li]) for r in theirs["value_change"])
        assert got == exp
        assert any(v == "instance of" for v in got)

    def test_interleaved_media_ignored_by_reference_comparison(self):
        """Media spans are engine-side lineage; the revision walk must be
        unaffected by their presence."""
        sim = sim_for("Q710")
        sim.push_media()
        sim.op_add_statement(kind="time")
        sim.push_media()
        sim.op_update_value()
        mine, theirs = run_both(sim)  # XML shim skips media spans
        assert_vc_and_rev(mine, theirs)
        assert len(mine["doc_spans"]) == len(sim.spans)
