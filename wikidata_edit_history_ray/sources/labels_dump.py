"""Label/property extraction from a full Wikidata entity-JSON dump
(operator S8 parity — the reference's offline Java tool
wdtk/ExtractLabelsProperties.java:1-235, re-expressed as a Ray pipeline).

Input: `latest-all.json[.bz2]`-shaped dumps — one entity JSON object per
line, wrapped in `[` / `]`, lines ending with `,`. One streaming pass emits,
per Q item, (qid, numeric_id, label, first alias, description) and, per
property, (property_id, numeric_id, property_label) in a configurable
language — exactly the reference's two CSV schemas. Non-Q items and lexemes
are skipped like the reference.

Scaling shape mirrors xml_ingest: cross-FILE fan-out (bz2 is serial per
file), chunked Arrow yields inside each file so one giant dump pipelines
instead of materializing. The output feeds either the reference-shaped CSVs
(`write_labels_csv`) or directly into the partitioned label dimension
(`labels_to_partitioned` -> stages/enrich.partition_entity_labels), closing
the dump -> label-dimension path end to end.
"""
from __future__ import annotations

import bz2
import json
import os

import pyarrow as pa

LABELS_SCHEMA = pa.schema([
    ("kind", pa.string()),        # entity | property
    ("id", pa.string()),          # Q123 / P31
    ("numeric_id", pa.int64()),
    ("label", pa.string()),
    ("alias", pa.string()),       # first alias; '' for properties
    ("description", pa.string()),  # '' for properties
])


def _open_dump(path: str):
    if path.endswith(".bz2"):
        return bz2.open(path, "rt", encoding="utf-8")
    return open(path, encoding="utf-8")


def _term(doc: dict, field: str, language: str) -> str:
    v = (doc.get(field) or {}).get(language)
    return (v or {}).get("value", "") if isinstance(v, dict) else ""


def _first_alias(doc: dict, language: str) -> str:
    arr = (doc.get("aliases") or {}).get(language) or []
    return arr[0].get("value", "") if arr else ""


def iter_label_rows(path: str, language: str = "en"):
    """Yield one row dict per Q item / property in the dump, streaming."""
    with _open_dump(path) as f:
        for line in f:
            line = line.strip().rstrip(",")
            if not line or line in ("[", "]"):
                continue
            try:
                doc = json.loads(line)
            except json.JSONDecodeError:
                continue  # truncated trailing line etc.
            eid = doc.get("id") or ""
            typ = doc.get("type")
            if typ == "item":
                if not eid.startswith("Q"):
                    continue  # the reference's Q-filter (lexemes, etc.)
                yield {
                    "kind": "entity", "id": eid,
                    "numeric_id": int(eid[1:]) if eid[1:].isdigit() else -1,
                    "label": _term(doc, "labels", language),
                    "alias": _first_alias(doc, language),
                    "description": _term(doc, "descriptions", language),
                }
            elif typ == "property":
                yield {
                    "kind": "property", "id": eid,
                    "numeric_id": int(eid[1:]) if eid[1:].isdigit() else -1,
                    "label": _term(doc, "labels", language),
                    "alias": "", "description": "",
                }


def read_labels_chunked(path: str, language: str = "en",
                        max_rows_per_chunk: int = 50_000):
    """One dump file -> iterator of Arrow label tables."""
    buf: list = []
    for row in iter_label_rows(path, language):
        buf.append(row)
        if len(buf) >= max_rows_per_chunk:
            yield pa.Table.from_pylist(buf, schema=LABELS_SCHEMA)
            buf = []
    if buf:
        yield pa.Table.from_pylist(buf, schema=LABELS_SCHEMA)


def ingest_labels(paths, language: str = "en",
                  max_rows_per_chunk: int = 50_000):
    """Dump file list -> label-rows Dataset (file-level parallelism, chunked
    streaming within each file)."""
    import ray.data

    def one_file(batch: pa.Table):
        for p in batch.column("path").to_pylist():
            yield from read_labels_chunked(p, language, max_rows_per_chunk)

    paths_ds = ray.data.from_items([{"path": p} for p in paths])
    return paths_ds.map_batches(one_file, batch_size=1, batch_format="pyarrow")


def labels_to_partitioned(ds, out_dir: str, buckets: int = 32) -> str:
    """Label-rows Dataset -> hash(qid)-partitioned label dimension (the
    direct input of enrich_entity_features_partitioned): one pass, no CSV
    intermediary, no driver materialization."""
    from ..stages.enrich import partition_entity_labels

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ent = batch.filter(pc.equal(batch.column("kind"), "entity"))
        return pa.table({"qid": ent.column("id"),
                         "label": ent.column("label"),
                         "description": ent.column("description")})

    return partition_entity_labels(
        ds.map_batches(project, batch_format="pyarrow"), out_dir,
        buckets=buckets)


def load_property_labels_csv(path: str) -> dict:
    """Reference-shaped property_labels.csv -> the {numeric-id-string: label}
    dict the differ probes (core/differ.py:325)."""
    import csv

    with open(path, newline="", encoding="utf-8") as f:
        return {str(r["numeric_id"]): r["property_label"]
                for r in csv.DictReader(f)}


def _csv_escape(v: str) -> str:
    if not v:
        return ""
    if any(c in v for c in (",", '"', "\n", "\r")):
        return '"' + v.replace('"', '""') + '"'
    return v


def write_labels_csv(ds, out_dir: str) -> dict:
    """Persist the two reference-shaped CSVs
    (entity_labels_alias_description.csv, property_labels.csv) from a
    label-rows Dataset — drop-in files for a reference deployment. Streaming
    iter_batches on the driver (the CSVs are header-ordered single files,
    exactly like the reference's BufferedWriters)."""
    os.makedirs(out_dir, exist_ok=True)
    ent_path = os.path.join(out_dir, "entity_labels_alias_description.csv")
    prop_path = os.path.join(out_dir, "property_labels.csv")
    counts = {"entities": 0, "properties": 0}
    with open(ent_path, "w", encoding="utf-8") as ef, \
            open(prop_path, "w", encoding="utf-8") as pf:
        ef.write("qid,numeric_id,label,alias,description\n")
        pf.write("property_id,numeric_id,property_label\n")
        for batch in ds.iter_batches(batch_format="pyarrow"):
            for r in batch.to_pylist():
                if r["kind"] == "entity":
                    ef.write(f"{_csv_escape(r['id'])},{r['numeric_id']},"
                             f"{_csv_escape(r['label'])},"
                             f"{_csv_escape(r['alias'])},"
                             f"{_csv_escape(r['description'])}\n")
                    counts["entities"] += 1
                else:
                    pf.write(f"{_csv_escape(r['id'])},{r['numeric_id']},"
                             f"{_csv_escape(r['label'])}\n")
                    counts["properties"] += 1
    return {"entity_labels": ent_path, "property_labels": prop_path, **counts}
