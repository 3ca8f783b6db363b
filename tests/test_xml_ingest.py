"""XML ingest (S1): dump XML -> doc-span table -> extraction produces the
same changes as the direct span path; bz2 round-trip."""
import bz2
import os
import random


def _dump_xml_for(sims) -> str:
    from reference_shim import NS, spans_to_page_xml

    pages = []
    for sim in sims:
        # strip the xmlns from the per-page fragment, wrap in mediawiki root
        page = spans_to_page_xml(sim.qid, sim.spans)
        pages.append(page.replace(f'<page xmlns="{NS}">', "<page>"))
    return f'<mediawiki xmlns="{NS}">' + "".join(pages) + "</mediawiki>"


def _sims(n=12, seed=17):
    from wikidata_edit_history_ray.sources.corpus import build_doc

    rng = random.Random(seed)
    return [build_doc(f"Q{900 + i}", rng, media_prob=0.0) for i in range(n)]


class TestXmlIngest:
    def test_xml_roundtrip_matches_span_path(self, tmp_path):
        from wikidata_edit_history_ray.core.differ import DiffConfig, PageDiffer
        from wikidata_edit_history_ray.sources.xml_ingest import read_xml_dump

        sims = _sims()
        xml_path = str(tmp_path / "dump.xml")
        with open(xml_path, "w") as f:
            f.write(_dump_xml_for(sims))
        table = read_xml_dump(xml_path)
        assert table.num_rows == len(sims)

        differ = PageDiffer(DiffConfig())
        by_doc = {sims[i].qid: sims[i].spans for i in range(len(sims))}
        for i in range(table.num_rows):
            doc_id = table["doc_id"][i].as_py()
            via_xml = differ.process_doc(doc_id, table["spans"][i].as_py())
            via_spans = differ.process_doc(doc_id, by_doc[doc_id])
            got = {c[:13] for c in via_xml["value_change"]}
            exp = {c[:13] for c in via_spans["value_change"]}
            assert got == exp, doc_id

    def test_bz2_and_ray_ingest(self, ray_session, tmp_path):
        from wikidata_edit_history_ray.sources.xml_ingest import ingest_dumps

        sims = _sims(6, seed=23)
        p = str(tmp_path / "dump.xml.bz2")
        with bz2.open(p, "wt", encoding="utf-8") as f:
            f.write(_dump_xml_for(sims))
        out_dir = str(tmp_path / "docs")
        ds = ingest_dumps([p], output_dir=out_dir)
        rows = ds.take_all()
        assert len(rows) == 6
        assert all(r["doc_id"].startswith("Q") for r in rows)
        assert os.listdir(out_dir)  # persisted shard written

    def test_non_q_pages_filtered(self, tmp_path):
        from wikidata_edit_history_ray.sources.xml_ingest import NS, read_xml_dump

        xml = (f'<mediawiki xmlns="{NS}"><page><title>Talk:Foo</title>'
               "<revision><id>1</id><timestamp>2020-01-01T00:00:00Z</timestamp>"
               "<text>{}</text></revision></page></mediawiki>")
        p = str(tmp_path / "d.xml")
        open(p, "w").write(xml)
        assert read_xml_dump(p).num_rows == 0

    def test_chunked_ingest_splits_giant_file(self, ray_session, tmp_path):
        """Sub-file chunking: a single dump file yields multiple Arrow chunks
        (the single-giant-dump parallelism story) with no rows lost."""
        from wikidata_edit_history_ray.sources.xml_ingest import (
            ingest_dumps, read_xml_dump_chunked)

        sims = _sims(9, seed=31)
        p = str(tmp_path / "big.xml")
        open(p, "w", encoding="utf-8").write(_dump_xml_for(sims))
        chunks = list(read_xml_dump_chunked(p, max_docs_per_chunk=4))
        assert [c.num_rows for c in chunks] == [4, 4, 1]
        ds = ingest_dumps([p], output_dir=str(tmp_path / "o"),
                          max_docs_per_chunk=4)
        rows = ds.take_all()
        assert len(rows) == 9
        assert len(os.listdir(str(tmp_path / "o"))) == 3  # one shard per chunk
