"""Input readers and aux-table broadcast helpers.

The input of record is a Lance table of interleaved text+media documents
(BASELINE.json input_hint); this container has no `lance` package, so Parquet
with the identical schema is the physical stand-in — `read_documents` prefers
Lance when available and falls back to Parquet transparently.
"""
from __future__ import annotations

import os

import pyarrow.csv  # noqa: F401  (ensure csv module is importable early)


def read_documents(path: str, columns=None, override_num_blocks=None):
    """Dataset of (doc_id, spans) rows from a Lance or Parquet source.

    Column pruning is pushed to the read: pass `columns` when a downstream
    stage needs only doc_id (e.g. counting) so span payloads never leave
    storage.
    """
    import ray.data

    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        try:
            return ray.data.read_lance(path, columns=columns)
        except (ImportError, ModuleNotFoundError):
            pass
    kw = {}
    if columns:
        kw["columns"] = columns
    if override_num_blocks:
        kw["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, **kw)


def load_aux_tables(aux_dir: str):
    """Load the small dimension tables (property labels, type lists) as plain
    dicts/sets, ready to be ray.put() once and shared by every extract actor —
    the broadcast analog of the reference's per-process CSV loads
    (scripts/file_parser.py:84-88)."""
    import csv

    def read_csv_rows(name):
        p = os.path.join(aux_dir, name)
        if not os.path.exists(p):
            return []
        with open(p, newline="") as f:
            return list(csv.DictReader(f))

    property_labels = {
        r["property_id"]: r["property_label"] for r in read_csv_rows("property_labels.csv")
    }
    sa_types = {r["s"] for r in read_csv_rows("subclass_scholarly_article.csv")}
    ao_types = {r["s"] for r in read_csv_rows("subclass_astronomical_object.csv")}
    return property_labels, sa_types, ao_types


def write_aux_tables(aux_dir: str):
    """Synthesize the deterministic aux dimension tables used by tests/bench
    (FIXTURES.md §2): property labels + SA/AO subclass lists matching the
    synthetic corpus type universe."""
    import csv

    from .corpus import AO_TYPES, SA_TYPES

    os.makedirs(aux_dir, exist_ok=True)
    with open(os.path.join(aux_dir, "property_labels.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["property_id", "property_label"])
        w.writerow(["-1", "label"])
        w.writerow(["-2", "description"])
        w.writerow(["31", "instance of"])
        w.writerow(["279", "subclass of"])
        for pid in list(range(100, 121)) + list(range(200, 261)) + list(range(500, 521)):
            w.writerow([str(pid), f"property {pid}"])
        for pid, lbl in ((143, "imported from"), (854, "reference URL"), (248, "stated in")):
            w.writerow([str(pid), lbl])
    with open(os.path.join(aux_dir, "subclass_scholarly_article.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["s", "label"])
        for q in SA_TYPES:
            w.writerow([q, f"sa type {q}"])
    with open(os.path.join(aux_dir, "subclass_astronomical_object.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["s", "label"])
        for q in AO_TYPES:
            w.writerow([q, f"ao type {q}"])
    return aux_dir
