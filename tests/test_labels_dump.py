"""S8: label/property extraction from an entity-JSON dump
(wdtk/ExtractLabelsProperties.java parity) — Q-filter, language selection,
first-alias rule, CSV shape, and the dump -> partitioned-dimension path."""
import bz2
import json
import os

import pytest


def _dump_lines():
    ents = [
        {"type": "item", "id": "Q42",
         "labels": {"en": {"language": "en", "value": "Douglas Adams"},
                    "de": {"language": "de", "value": "Douglas Adams de"}},
         "descriptions": {"en": {"language": "en", "value": "writer"}},
         "aliases": {"en": [{"language": "en", "value": "DNA"},
                            {"language": "en", "value": "42"}]}},
        {"type": "item", "id": "Q7", "labels": {},
         "descriptions": {}, "aliases": {}},
        {"type": "item", "id": "Q9", "labels": {
            "en": {"language": "en", "value": 'has, "quotes"'}},
         "descriptions": {}, "aliases": {}},
        {"type": "lexeme", "id": "L1", "labels": {}},
        {"type": "item", "id": "P-weird", "labels": {}},  # non-Q item: skipped
        {"type": "property", "id": "P31",
         "labels": {"en": {"language": "en", "value": "instance of"}}},
    ]
    return ["["] + [json.dumps(e) + "," for e in ents[:-1]] + \
        [json.dumps(ents[-1])] + ["]"]


@pytest.fixture()
def dump_file(tmp_path):
    p = str(tmp_path / "dump.json")
    with open(p, "w") as f:
        f.write("\n".join(_dump_lines()))
    return p


def test_iter_rows_q_filter_language_alias(dump_file):
    from wikidata_edit_history_ray.sources.labels_dump import iter_label_rows

    rows = list(iter_label_rows(dump_file))
    by_id = {r["id"]: r for r in rows}
    assert set(by_id) == {"Q42", "Q7", "Q9", "P31"}  # L1 and P-weird skipped
    assert by_id["Q42"]["label"] == "Douglas Adams"
    assert by_id["Q42"]["alias"] == "DNA"  # FIRST alias only
    assert by_id["Q42"]["description"] == "writer"
    assert by_id["Q42"]["numeric_id"] == 42
    assert by_id["Q7"]["label"] == ""
    assert by_id["P31"]["kind"] == "property"
    assert by_id["P31"]["label"] == "instance of"
    # language selection
    de = {r["id"]: r for r in iter_label_rows(dump_file, language="de")}
    assert de["Q42"]["label"] == "Douglas Adams de"
    assert de["Q42"]["alias"] == ""


def test_bz2_and_ray_pipeline_to_partitioned(ray_session, tmp_path, dump_file):
    from wikidata_edit_history_ray.sources.labels_dump import (
        ingest_labels, labels_to_partitioned, write_labels_csv)
    from wikidata_edit_history_ray.stages.enrich import _load_label_bucket

    bz = str(tmp_path / "dump2.json.bz2")
    with bz2.open(bz, "wt", encoding="utf-8") as f:
        f.write("\n".join(_dump_lines()))

    ds = ingest_labels([dump_file, bz])
    rows = ds.take_all()
    assert len(rows) == 8  # both files contribute 4 rows each

    ldir = labels_to_partitioned(ds, str(tmp_path / "labels"), buckets=4)
    found = {}
    for b in range(4):
        found.update(_load_label_bucket(ldir, b))
    # duplicate files collapse to identical entries keyed by qid
    assert found["Q42"] == ("Douglas Adams", "writer")
    assert found["Q9"][0] == 'has, "quotes"'
    assert "P31" not in found  # properties are not entity labels

    out = write_labels_csv(ds, str(tmp_path / "csv"))
    assert out["entities"] == 6 and out["properties"] == 2
    head = open(out["entity_labels"]).readline().strip()
    assert head == "qid,numeric_id,label,alias,description"
    body = open(out["entity_labels"]).read()
    assert '"has, ""quotes"""' in body  # reference CSV escaping
    phead = open(out["property_labels"]).readline().strip()
    assert phead == "property_id,numeric_id,property_label"


def test_csv_roundtrip_into_differ_dimension(ray_session, tmp_path, dump_file):
    """The emitted property CSV loads straight into the key shape the differ
    probes (str(numeric property id)) — dump -> CSV -> differ dimension."""
    from wikidata_edit_history_ray.sources.labels_dump import (
        ingest_labels, load_property_labels_csv, write_labels_csv)

    out = write_labels_csv(ingest_labels([dump_file]), str(tmp_path / "csv"))
    labels = load_property_labels_csv(out["property_labels"])
    assert labels == {"31": "instance of"}
