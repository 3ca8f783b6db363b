"""The generator's construction-time ground truth matches the engine exactly,
table by table — the foundation under the driver's DuckDB oracle_sql()
comparison (every kg_* oracle reads the persisted expectation parquet).

No Ray needed: runs the pure differ over a full corpus (with hot docs) and
compares multisets of the oracle-projected columns.
"""
from collections import Counter

import pytest

from wikidata_edit_history_ray.core.constants import ENTITY_STATS_COLS
from wikidata_edit_history_ray.core.differ import DiffConfig, PageDiffer
from wikidata_edit_history_ray.sources.corpus import (AO_TYPES, SA_TYPES,
                                                      make_corpus)

_STATS_PROJ = (
    "entity_id", "entity_label", "entity_types_31", "num_revisions",
    "num_value_changes", "num_value_change_creates",
    "num_value_change_deletes", "num_value_change_updates",
    "num_rank_changes", "num_rank_creates", "num_rank_deletes",
    "num_rank_updates", "num_qualifier_changes", "num_reference_changes",
    "num_datatype_metadata_changes", "num_datatype_metadata_creates",
    "num_datatype_metadata_deletes", "num_datatype_metadata_updates",
    "first_revision_timestamp", "last_revision_timestamp",
    "num_bot_edits", "num_anonymous_edits", "num_human_edits")


@pytest.fixture(scope="module")
def engine_vs_expected():
    table, exp = make_corpus(300, seed=42, hot_doc_revisions=1000,
                             hot_doc_every=30)
    differ = PageDiffer(DiffConfig(), scholarly_article_types=set(SA_TYPES),
                        astronomical_object_types=set(AO_TYPES))
    got = {k: [] for k in ("value_change", "qualifier_change",
                           "reference_change", "datatype_metadata_change",
                           "revision", "entity_stats", "graph_triples",
                           "doc_spans", "features")}
    for d in table.to_pylist():
        out = differ.process_doc(d["doc_id"], d["spans"])
        eid = int(d["doc_id"][1:])
        for c in out["value_change"]:
            got["value_change"].append((c[0], c[1], c[3], c[8], c[9], c[18]))
        for c in out["qualifier_change"]:
            got["qualifier_change"].append((c[0], c[1], c[3], c[4], c[12], c[18]))
        for c in out["reference_change"]:
            got["reference_change"].append((c[0], c[1], c[3], c[4], c[13], c[19]))
        for c in out["datatype_metadata_change"]:
            got["datatype_metadata_change"].append(
                (c[0], c[1], c[3], c[8], c[9], c[17]))
        for r in out["revision"]:
            got["revision"].append((r[0], r[1], r[2], r[3], r[7], r[8], r[9],
                                    r[10], r[14]))
        for tname in ("features_text", "features_time", "features_quantity",
                      "features_globecoordinate", "features_entity"):
            for f in out[tname]:
                got["features"].append((f[0], f[1], f[3], tname))
        s = dict(zip(ENTITY_STATS_COLS, out["entity_stats"][0]))
        got["entity_stats"].append(
            tuple(s[c] for c in _STATS_PROJ)
            + (out["is_scholarly_article"], out["is_astronomical_object"],
               out["has_less_revisions"]))
        for sp in out["doc_spans"]:
            got["doc_spans"].append(tuple(sp))
        state = {}
        for c in sorted(out["value_change"], key=lambda c: c[0]):
            if c[8] == "":
                state[(c[1], c[3])] = c[9]
        got["graph_triples"].extend(
            (eid, pid, vid) for (pid, vid), act in state.items()
            if act != "DELETE")
    return got, exp


def _check(got_rows, exp_rows):
    g, e = Counter(got_rows), Counter(exp_rows)
    assert g == e, (f"got {sum(g.values())} expect {sum(e.values())}; "
                    f"only-got={list((g - e).items())[:3]} "
                    f"only-exp={list((e - g).items())[:3]}")


def test_value_change(engine_vs_expected):
    got, exp = engine_vs_expected
    _check(got["value_change"],
           [(e["revision_id"], e["property_id"], e["value_id"],
             e["change_target"], e["action"], e["entity_id"])
            for e in exp["value_change"]])


def test_qualifier_change(engine_vs_expected):
    got, exp = engine_vs_expected
    _check(got["qualifier_change"],
           [(e["revision_id"], e["property_id"], e["value_id"],
             e["qual_property_id"], e["action"], e["entity_id"])
            for e in exp["qualifier_change"]])


def test_reference_change(engine_vs_expected):
    got, exp = engine_vs_expected
    _check(got["reference_change"],
           [(e["revision_id"], e["property_id"], e["value_id"],
             e["ref_property_id"], e["action"], e["entity_id"])
            for e in exp["reference_change"]])


def test_datatype_metadata_change(engine_vs_expected):
    got, exp = engine_vs_expected
    _check(got["datatype_metadata_change"],
           [(e["revision_id"], e["property_id"], e["value_id"],
             e["change_target"], e["action"], e["entity_id"])
            for e in exp["datatype_metadata_change"]])


def test_revision(engine_vs_expected):
    got, exp = engine_vs_expected
    _check(got["revision"],
           [(e["prev_revision_id"], e["revision_id"], e["entity_id"],
             e["timestamp"], e["user_id"], e["username"], e["user_type"],
             e["comment"], e["entity_label"]) for e in exp["revision"]])


def test_features(engine_vs_expected):
    got, exp = engine_vs_expected
    _check(got["features"],
           [(e["revision_id"], e["property_id"], e["value_id"], e["table"])
            for e in exp["features"]])


def test_entity_stats(engine_vs_expected):
    got, exp = engine_vs_expected
    _check(got["entity_stats"],
           [tuple(e[c] for c in _STATS_PROJ)
            + (e["is_scholarly_article"], e["is_astronomical_object"],
               e["has_less_revisions"]) for e in exp["entity_stats"]])


def test_graph_triples(engine_vs_expected):
    got, exp = engine_vs_expected
    _check(got["graph_triples"],
           [(e["subj"], e["pred"], e["value_id"])
            for e in exp["graph_triples"]])


def test_doc_spans(engine_vs_expected):
    got, exp = engine_vs_expected
    _check(got["doc_spans"],
           [(e["doc_id"], e["entity_id"], e["span_index"], e["kind"],
             e["offset"], e["media_ref"], e["text_sha1"])
            for e in exp["doc_spans"]])


def test_write_expectations_roundtrip(tmp_path):
    import pyarrow.parquet as pq

    from wikidata_edit_history_ray.sources.corpus import write_expectations

    _, exp = make_corpus(30, seed=7)
    d = write_expectations(str(tmp_path / "expect"), exp)
    t = pq.read_table(f"{d}/value_change.parquet")
    assert t.num_rows == len(exp["value_change"])
    assert t.schema.field("property_id").type == "int32"
    assert pq.read_table(f"{d}/doc_spans.parquet").num_rows == len(exp["doc_spans"])
    assert pq.read_table(f"{d}/entity_stats.parquet").num_rows == 30
