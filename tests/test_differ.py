"""Scenario tests for the page differ (FIXTURES.md §4 catalog)."""
import json
import random

from wikidata_edit_history_ray.core.differ import DiffConfig, PageDiffer
from wikidata_edit_history_ray.sources.corpus import EntitySim, SA_TYPES, AO_TYPES


def run(sim: EntitySim, **cfg_kw):
    differ = PageDiffer(DiffConfig(**cfg_kw),
                        scholarly_article_types=set(SA_TYPES),
                        astronomical_object_types=set(AO_TYPES))
    return differ.process_doc(sim.qid, sim.spans)


def sim_for(qid="Q77", seed=1):
    return EntitySim(qid, random.Random(seed), rev_base=1000)


def vc_index(out):
    """{(revision_id, property_id, value_id, change_target): row dict}"""
    from wikidata_edit_history_ray.core.constants import VALUE_CHANGE_COLS

    rows = [dict(zip(VALUE_CHANGE_COLS, c)) for c in out["value_change"]]
    return {(r["revision_id"], r["property_id"], r["value_id"], r["change_target"]): r
            for r in rows}


class TestCreateAndUpdate:
    def test_entity_created_full_expansion(self):
        sim = sim_for()
        rev = sim.op_create_entity(type_qids=["Q3000"], n_statements=2,
                                   label="L", desc="D")
        out = run(sim)
        idx = vc_index(out)
        creates = [k for k in idx if k[0] == rev]
        # 1 P31 + 2 statements + label + description; no rank rows on first revision
        assert len(creates) == 5
        assert all(idx[k]["action"] == "CREATE" for k in creates)
        assert not any(k[3] == "rank" for k in creates)
        assert idx[(rev, -1, "label", "")]["new_value"] == '"L"'
        assert idx[(rev, -1, "label", "")]["label"] == "statement_insertion"

    def test_string_update_same_datatype(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=0)
        _, pid, stmt = sim.op_add_statement(kind="string")
        r3, *_ = sim.op_update_value(pid=pid, stmt=stmt)
        out = run(sim)
        row = vc_index(out)[(r3, int(pid[1:]), stmt["id"], "")]
        assert row["action"] == "UPDATE"
        assert row["label"] == ""  # same datatype: no value_update label
        assert row["old_hash"] != row["new_hash"] != ""
        # text features emitted for the string update
        assert any(f[0] == r3 for f in out["features_text"])

    def test_update_with_datatype_change_gets_value_update_label(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=0)
        _, pid, stmt = sim.op_add_statement(kind="string")
        r, *_ = sim.op_update_value(pid=pid, stmt=stmt,
                                    new_datavalue=sim.rand_quantity_value())
        out = run(sim, extract_datatype_metadata=False)
        row = vc_index(out)[(r, int(pid[1:]), stmt["id"], "")]
        assert row["action"] == "UPDATE"
        assert row["label"] == "value_update"
        assert row["old_datatype"] == "string" and row["new_datatype"] == "quantity"

    def test_new_and_removed_pid(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=0)
        r2, pid, stmt = sim.op_add_statement(kind="entity")
        r3, *_ = sim.op_delete_statement(pid=pid, stmt=stmt)
        out = run(sim)
        idx = vc_index(out)
        assert idx[(r2, int(pid[1:]), stmt["id"], "")]["action"] == "CREATE"
        assert idx[(r2, int(pid[1:]), stmt["id"], "rank")]["action"] == "CREATE"
        assert idx[(r3, int(pid[1:]), stmt["id"], "")]["action"] == "DELETE"
        assert idx[(r3, int(pid[1:]), stmt["id"], "")]["label"] == "statement_deletion"
        assert idx[(r3, int(pid[1:]), stmt["id"], "rank")]["action"] == "DELETE"


class TestRankAndSoftDeletes:
    def test_rank_update_soft_deletion_insertion(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=0)
        _, pid, stmt = sim.op_add_statement(kind="string")
        r3, *_ = sim.op_rank_change(new_rank="deprecated")
        r4, *_ = sim.op_rank_change(new_rank="preferred")
        out = run(sim)
        idx = vc_index(out)
        assert idx[(r3, int(pid[1:]), stmt["id"], "rank")]["label"] == "soft_deletion"
        assert idx[(r4, int(pid[1:]), stmt["id"], "rank")]["label"] == "soft_insertion"

    def test_end_time_qualifier_soft_deletion(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=0)
        sim.op_add_statement(kind="string")
        r, _, _, _ = sim.op_add_qualifier(qpid="P582")
        out = run(sim)
        from wikidata_edit_history_ray.core.constants import QUALIFIER_CHANGE_COLS

        qrows = [dict(zip(QUALIFIER_CHANGE_COLS, q)) for q in out["qualifier_change"]]
        row = next(q for q in qrows if q["revision_id"] == r)
        assert row["action"] == "CREATE" and row["qual_property_id"] == 582
        assert row["label"] == "soft_deletion"


class TestQualifiersReferences:
    def test_duplicate_qualifier_values_dedup(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=0)
        _, pid, stmt = sim.op_add_statement(kind="string")
        dv = sim.rand_time_value()
        # two identical qualifier snaks under the same pid: hash-dedup -> 1 CREATE
        stmt["qualifiers"] = {"P500": [sim.make_qualifier("P500", dv),
                                       sim.make_qualifier("P500", json.loads(json.dumps(dv)))]}
        rev_id, _ = sim.snapshot_revision()
        out = run(sim)
        qrows = [q for q in out["qualifier_change"] if q[0] == rev_id]
        assert len(qrows) == 1

    def test_reference_snak_change_delete_plus_create(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=0)
        _, pid, stmt = sim.op_add_statement(kind="string")
        ref = sim.make_reference([("P143", sim.rand_entity_value("Q100")),
                                  ("P854", {"value": "http://x", "type": "string"})])
        stmt["references"] = [ref]
        r2, _ = sim.snapshot_revision()
        # change one snak inside the multi-snak reference
        ref["snaks"]["P143"] = [sim.make_qualifier("P143", sim.rand_entity_value("Q200"))]
        r3, _ = sim.snapshot_revision()
        out = run(sim)
        from wikidata_edit_history_ray.core.constants import REFERENCE_CHANGE_COLS

        rows = [dict(zip(REFERENCE_CHANGE_COLS, r)) for r in out["reference_change"]]
        r2_rows = [r for r in rows if r["revision_id"] == r2]
        r3_rows = [r for r in rows if r["revision_id"] == r3]
        assert len(r2_rows) == 2 and all(r["action"] == "CREATE" for r in r2_rows)
        # the ref content hash changed: the unchanged P854 snak moves to a new
        # ref_hash (1 DELETE + 1 CREATE) and P143 likewise => 4 rows
        assert len(r3_rows) == 4
        assert sorted(r["action"] for r in r3_rows) == ["CREATE", "CREATE", "DELETE", "DELETE"]


class TestSkipRules:
    def test_alias_only_revision_skipped(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=1)
        sim.op_alias_only_revision()
        _, pid, stmt = sim.op_add_statement(kind="string")
        out = run(sim)
        stored_ids = [r[1] for r in out["revision"]]
        assert len(stored_ids) == 2  # alias revision not stored

    def test_deleted_revision_prev_pointer_repair(self):
        sim = sim_for()
        r1 = sim.op_create_entity(type_qids=["Q3000"], n_statements=1)
        sim.op_deleted_revision()
        r3, *_ = sim.op_add_statement(kind="string")
        out = run(sim)
        rev_rows = {r[1]: r for r in out["revision"]}
        assert rev_rows[r3][0] == r1  # prev points at last stored, not the deleted one

    def test_malformed_revision_does_not_advance_prev(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=1)
        sim.op_malformed_revision()
        r3, *_ = sim.op_add_statement(kind="string")
        out = run(sim)
        assert len(out["revision"]) == 2
        idx = vc_index(out)
        # the add after the malformed revision diffs against the create snapshot
        assert sum(1 for k in idx if k[0] == r3 and k[3] == "") == 1

    def test_cleaned_entity_full_delete_then_redirect(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=2, label="L", desc="D")
        r2 = sim.op_cleaned()
        r3 = sim.op_redirect("Q999")
        out = run(sim)
        idx = vc_index(out)
        deletes = [k for k in idx if k[0] == r2]
        # 3 stmts (P31 + 2): value+rank each = 6, label, desc = 8
        assert len(deletes) == 8
        rev = {r[1]: r for r in out["revision"]}
        assert rev[r3][12] is True and rev[r3][13] == 999

    def test_zero_padded_time_and_numeric_id_no_change(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=0)
        _, pid, stmt = sim.op_add_statement(kind="time")
        # rewrite same instant zero-padded + entity numeric-only: no UPDATE row
        t = stmt["mainsnak"]["datavalue"]["value"]["time"]
        stmt["mainsnak"]["datavalue"]["value"]["time"] = t[0] + "0000000" + t[1:]
        rev_id, _ = sim.snapshot_revision()
        out = run(sim)
        assert not any(k[0] == rev_id for k in vc_index(out))
        assert len(out["revision"]) == 2  # no change detected => not stored


class TestMetadataChanges:
    def test_unit_change_trims_qid(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=0)
        _, pid, stmt = sim.op_add_statement(kind="quantity")
        stmt["mainsnak"]["datavalue"]["value"]["unit"] = "http://www.wikidata.org/entity/Q999"
        rev_id, _ = sim.snapshot_revision()
        out = run(sim)
        from wikidata_edit_history_ray.core.constants import DATATYPE_METADATA_CHANGE_COLS

        rows = [dict(zip(DATATYPE_METADATA_CHANGE_COLS, r))
                for r in out["datatype_metadata_change"] if r[0] == rev_id]
        assert len(rows) == 1
        assert rows[0]["change_target"] == "unit"
        assert rows[0]["old_value"] == '"Q11573"' and rows[0]["new_value"] == '"Q999"'
        assert rows[0]["label"] == "datatype_context_update"

    def test_monolingual_language_change_routes_to_value_change(self):
        sim = sim_for()
        sim.op_create_entity(type_qids=["Q3000"], n_statements=0)
        _, pid, stmt = sim.op_add_statement(kind="mono")
        stmt["mainsnak"]["datavalue"]["value"]["language"] = "de"
        rev_id, _ = sim.snapshot_revision()
        out = run(sim)
        idx = vc_index(out)
        row = idx[(rev_id, int(pid[1:]), stmt["id"], "language")]
        assert row["old_value"] == '"en"' and row["new_value"] == '"de"'
        assert not any(r[0] == rev_id for r in out["datatype_metadata_change"])


class TestRoutingFlags:
    def test_sa_ao_routing(self):
        sim = sim_for("Q81")
        sim.op_create_entity(type_qids=[SA_TYPES[0]], n_statements=1)
        out = run(sim)
        assert out["is_scholarly_article"] and not out["is_astronomical_object"]

        sim2 = sim_for("Q82")
        sim2.op_create_entity(type_qids=[AO_TYPES[0], SA_TYPES[0]], n_statements=1)
        out2 = run(sim2)
        # both flags set; writer precedence (_ao wins) is downstream routing
        assert out2["is_scholarly_article"] and out2["is_astronomical_object"]
        assert not out2["has_less_revisions"]

    def test_less_revisions_flag(self):
        sim = sim_for("Q83")
        sim.op_create_entity(type_qids=["Q3000"], n_statements=1)
        out = run(sim)
        assert out["has_less_revisions"]  # few value changes, not SA/AO

    def test_user_type_stats(self):
        sim = sim_for("Q84")
        sim.op_create_entity(type_qids=["Q3000"], n_statements=1, username="DataBot")
        sim.op_add_statement(username="")
        sim.op_add_statement(username="Carol")
        out = run(sim)
        from wikidata_edit_history_ray.core.constants import ENTITY_STATS_COLS

        stats = dict(zip(ENTITY_STATS_COLS, out["entity_stats"][0]))
        assert stats["num_bot_edits"] == 1
        assert stats["num_anonymous_edits"] == 1
        assert stats["num_human_edits"] == 1


class TestSpanLineage:
    def test_span_sequence_preserved(self):
        sim = sim_for("Q85")
        sim.op_create_entity(type_qids=["Q3000"], n_statements=1)
        sim.push_media()
        sim.op_add_statement()
        sim.push_media()
        out = run(sim)
        rows = out["doc_spans"]
        assert [r[2] for r in rows] == list(range(len(sim.spans)))
        assert [r[3] for r in rows] == [s["kind"] for s in sim.spans]
        assert [r[5] for r in rows] == [s["media_ref"] for s in sim.spans]
        assert [r[4] for r in rows] == [s["offset"] for s in sim.spans]
