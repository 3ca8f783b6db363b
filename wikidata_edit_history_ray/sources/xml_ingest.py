"""MediaWiki export-XML ingest (operator S1 parity).

Converts `pages-meta-history*.xml[.bz2]` dump files into the engine's
interleaved-document table (doc_id, spans): each <page> becomes one row, each
<revision> one text span carrying the engine's revision envelope (the raw
revision body preserved verbatim in envelope["text"], deleted revisions kept
as deleted=true spans so the prev-pointer repair semantics survive ingest).

Reference analog: FileParser.parse_dump (scripts/file_parser.py:303-422) —
streaming iterparse, Q-title filter, per-page element clearing. Built on
stdlib xml.etree.iterparse + bz2 (no lxml in this container).

At scale each dump file is one ingest unit: `ingest_datasource` exposes the
file list as a Ray Dataset of paths fanned out via flat_map, so a 2,000-file
dump ingests with file-level parallelism and the output lands as the sharded
doc-span table the extraction pipeline consumes.
"""
from __future__ import annotations

import bz2
import json
import os
import xml.etree.ElementTree as ET

import pyarrow as pa

from .corpus import DOCS_SCHEMA

NS = "http://www.mediawiki.org/xml/export-0.11/"


def _open_dump(path: str):
    if path.endswith(".bz2"):
        return bz2.open(path, "rt", encoding="utf-8")
    return open(path, encoding="utf-8")


def iter_pages(path: str):
    """Yield (doc_id, spans) per <page>, streaming; only Q-entity pages."""
    page_tag = f"{{{NS}}}page"
    with _open_dump(path) as f:
        for _event, elem in ET.iterparse(f, events=("end",)):
            if elem.tag != page_tag:
                continue
            title = (elem.findtext(f"{{{NS}}}title") or "").strip()
            if title.startswith("Q"):
                spans = _page_to_spans(elem)
                if spans:
                    yield title, spans
            elem.clear()  # streaming: free the subtree immediately


def _page_to_spans(page_elem) -> list[dict]:
    spans = []
    offset = 0
    for rev in page_elem.findall(f"{{{NS}}}revision"):
        text_elem = rev.find(f"{{{NS}}}text")
        deleted = text_elem is not None and bool(text_elem.get("deleted"))
        contrib = rev.find(f"{{{NS}}}contributor")
        username = user_id = ""
        if contrib is not None:
            username = (contrib.findtext(f"{{{NS}}}username") or "").strip()
            user_id = (contrib.findtext(f"{{{NS}}}id") or "").strip()
        parent = (rev.findtext(f"{{{NS}}}parentid") or "").strip()
        envelope = {
            "revision_id": int((rev.findtext(f"{{{NS}}}id") or "0").strip()),
            "parent_id": int(parent) if parent else None,
            "timestamp": (rev.findtext(f"{{{NS}}}timestamp") or "").strip(),
            "username": username,
            "user_id": user_id,
            "comment": (rev.findtext(f"{{{NS}}}comment") or "").strip(),
            "deleted": deleted,
            "text": None if deleted else (
                text_elem.text if text_elem is not None else None),
        }
        spans.append({
            "kind": "text",
            "text": json.dumps(envelope, ensure_ascii=False),
            "media_ref": "",
            "offset": offset,
        })
        offset += 1
    return spans


def read_xml_dump(path: str) -> pa.Table:
    """One dump file -> docs Arrow table (doc_id, spans)."""
    doc_ids, spans_col = [], []
    for doc_id, spans in iter_pages(path):
        doc_ids.append(doc_id)
        spans_col.append(spans)
    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans_col},
                                schema=DOCS_SCHEMA)


def read_xml_dump_chunked(path: str, max_docs_per_chunk: int = 2000):
    """One dump file -> iterator of docs Arrow tables. Sub-file chunking is
    the parallelism story for a single giant dump: each yielded chunk becomes
    its own downstream block, so one 100 GB file does not serialize the whole
    pipeline behind one task's output."""
    doc_ids, spans_col = [], []
    for doc_id, spans in iter_pages(path):
        doc_ids.append(doc_id)
        spans_col.append(spans)
        if len(doc_ids) >= max_docs_per_chunk:
            yield pa.Table.from_pydict(
                {"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA)
            doc_ids, spans_col = [], []
    if doc_ids:
        yield pa.Table.from_pydict(
            {"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA)


def ingest_dumps(paths, output_dir: str | None = None,
                 max_docs_per_chunk: int = 2000):
    """Dump file list -> docs Dataset with file-level parallelism; optionally
    persists the sharded doc-span table (one parquet shard per dump file).

    Arrow-native: each task yields Arrow chunk tables directly (a generator
    from map_batches — Ray streams each yielded table out as a block), never
    materializing per-row Python dicts. bz2 decompression is inherently
    serial per file, so cross-FILE fan-out is the scaling axis; within a
    file, chunked yields bound peak memory and pipeline the downstream."""
    import ray.data

    def one_file(batch: pa.Table):
        out_fs = out_root = None
        if output_dir:
            from ..stages.extract import resolve_filesystem

            out_fs, out_root = resolve_filesystem(output_dir)
            out_fs.create_dir(out_root, recursive=True)
        for p in batch.column("path").to_pylist():
            shard_idx = 0
            for chunk in read_xml_dump_chunked(p, max_docs_per_chunk):
                if output_dir:
                    import pyarrow.parquet as pq

                    stem = os.path.basename(p).split(".")[0]
                    pq.write_table(
                        chunk,
                        f"{out_root}/{stem}-{shard_idx:05d}.parquet",
                        filesystem=out_fs, row_group_size=100)
                shard_idx += 1
                yield chunk

    paths_ds = ray.data.from_items([{"path": p} for p in paths])
    return paths_ds.map_batches(one_file, batch_size=1, batch_format="pyarrow")
