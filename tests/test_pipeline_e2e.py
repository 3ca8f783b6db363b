"""End-to-end Ray Data pipeline tests: P/R vs construction oracle,
span-sequence invariant, multi-sink + resume, dedup idempotency."""
import os

import pyarrow.parquet as pq
import pytest


def _pr(got: set, expected: set):
    tp = len(got & expected)
    p = tp / len(got) if got else 1.0
    r = tp / len(expected) if expected else 1.0
    return p, r


class TestExtractionParity:
    @pytest.fixture(scope="class")
    def extracted(self, ray_session, corpus_parquet):
        from wikidata_edit_history_ray.pipelines.kg import extract_table
        from wikidata_edit_history_ray.sources.io import read_documents

        ds = read_documents(corpus_parquet)
        return {
            t: extract_table(ds, t, concurrency=2).take_all()
            for t in ("value_change", "qualifier_change", "reference_change",
                      "revision", "doc_spans")
        }

    def test_value_change_pr(self, extracted, small_corpus):
        _, exp = small_corpus
        got = {(r["revision_id"], r["property_id"], r["value_id"],
                r["change_target"], r["action"]) for r in extracted["value_change"]}
        expected = {(e["revision_id"], e["property_id"], e["value_id"],
                     e["change_target"], e["action"]) for e in exp["value_change"]}
        p, r = _pr(got, expected)
        assert p >= 0.95 and r >= 0.95, (p, r)

    def test_qualifier_reference_pr(self, extracted, small_corpus):
        _, exp = small_corpus
        got_q = {(r["revision_id"], r["property_id"], r["value_id"],
                  r["qual_property_id"], r["action"]) for r in extracted["qualifier_change"]}
        exp_q = {(e["revision_id"], e["property_id"], e["value_id"],
                  e["qual_property_id"], e["action"]) for e in exp["qualifier_change"]}
        p, r = _pr(got_q, exp_q)
        assert p >= 0.95 and r >= 0.95, (p, r)
        got_r = {(r["revision_id"], r["property_id"], r["value_id"],
                  r["ref_property_id"], r["action"]) for r in extracted["reference_change"]}
        exp_r = {(e["revision_id"], e["property_id"], e["value_id"],
                  e["ref_property_id"], e["action"]) for e in exp["reference_change"]}
        p, r = _pr(got_r, exp_r)
        assert p >= 0.95 and r >= 0.95, (p, r)

    def test_revision_rows(self, extracted, small_corpus):
        _, exp = small_corpus
        got = {r["revision_id"] for r in extracted["revision"]}
        expected = {e["revision_id"] for e in exp["revision"]}
        p, r = _pr(got, expected)
        assert p == 1.0 and r == 1.0

    def test_span_sequence_equality(self, extracted, small_corpus):
        """Per-row invariant: (kind, text-hash, media_ref, order) preserved."""
        import hashlib

        _, exp = small_corpus
        by_doc = {}
        for r in extracted["doc_spans"]:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert set(by_doc) == set(exp["spans"])
        for doc_id, spans in exp["spans"].items():
            got = sorted(by_doc[doc_id], key=lambda r: r["span_index"])
            assert len(got) == len(spans)
            for g, s in zip(got, spans):
                assert g["kind"] == s["kind"]
                assert g["media_ref"] == s["media_ref"]
                assert g["offset"] == s["offset"]
                expected_hash = (hashlib.sha1(s["text"].encode()).hexdigest()
                                 if s["text"] else "")
                assert g["text_sha1"] == expected_hash


class TestMultiSinkAndResume:
    def test_run_extraction_writes_all_tables_and_resumes(self, ray_session,
                                                          corpus_parquet, tmp_path):
        from wikidata_edit_history_ray.pipelines.kg import run_extraction

        out_dir = str(tmp_path / "out")
        m1 = run_extraction(corpus_parquet, out_dir, concurrency=2)
        rows1 = m1.take_all()
        assert rows1 and not any(r["resumed"] for r in rows1)
        assert os.path.isdir(os.path.join(out_dir, "value_change"))
        assert os.path.isdir(os.path.join(out_dir, "revision"))
        n_vc = pq.read_table(os.path.join(out_dir, "value_change")).num_rows
        assert n_vc > 0

        # resume: everything skipped, outputs unchanged
        m2 = run_extraction(corpus_parquet, out_dir, concurrency=2)
        rows2 = m2.take_all()
        assert all(r["resumed"] for r in rows2)
        assert pq.read_table(os.path.join(out_dir, "value_change")).num_rows == n_vc

    def test_partial_resume_recomputes_only_missing(self, ray_session,
                                                    corpus_parquet, tmp_path):
        from wikidata_edit_history_ray.pipelines.kg import run_extraction

        out_dir = str(tmp_path / "out2")
        m1 = run_extraction(corpus_parquet, out_dir, concurrency=2)
        parts = sorted(r["partition_id"] for r in m1.take_all())
        # kill one partition's manifest => only it recomputes
        victim = parts[0]
        os.remove(os.path.join(out_dir, "_manifest", f"{victim}.json"))
        m2 = run_extraction(corpus_parquet, out_dir, concurrency=2)
        rows = {r["partition_id"]: r["resumed"] for r in m2.take_all()}
        assert rows[victim] is False
        assert all(v for k, v in rows.items() if k != victim)


class TestDedup:
    def test_dedup_idempotent_on_duplicated_input(self, ray_session, small_corpus):
        import ray

        from wikidata_edit_history_ray.pipelines.kg import dedup_changes, extract_table

        docs, _ = small_corpus
        sub = docs.slice(0, 20)
        ds = ray.data.from_arrow(sub)
        vc = extract_table(ds, "value_change", concurrency=2)
        once = vc.take_all()
        # double the input: same docs twice -> exact dup rows across partitions
        ds2 = ray.data.from_arrow(sub).union(ray.data.from_arrow(sub))
        vc2 = extract_table(ds2, "value_change", concurrency=2)
        deduped = dedup_changes(
            vc2, ["revision_id", "property_id", "value_id", "change_target"])
        assert deduped.count() == len(once)


def test_corpus_prep_cli(ray_session, tmp_path):
    """The corpus-prep subcommand drives the flagship chain end-to-end to
    parquet; an all-decontaminated corpus reports rows=0 instead of
    crashing on the missing output."""
    import json
    import subprocess
    import sys

    sf = "/root/testdata/sf0.001/documents.parquet"
    import pyarrow.parquet as pq

    bench = tmp_path / "bench.parquet"
    pq.write_table(pq.read_table(sf).slice(0, 3), bench)
    out = subprocess.run(
        [sys.executable, "-m", "wikidata_edit_history_ray", "corpus-prep",
         "--input", sf, "--benchmark", str(bench),
         "--output", str(tmp_path / "packed")],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["rows"] > 0
    t = pq.read_table(res["output"])
    assert set(t.schema.names) == {"doc_id", "ws_token_count", "pack_id"}
    assert res["rows"] == t.num_rows

    # rerunning into the SAME non-empty output must refuse loudly (a second
    # write would interleave old and new packs under fresh UUID names)
    again = subprocess.run(
        [sys.executable, "-m", "wikidata_edit_history_ray", "corpus-prep",
         "--input", sf, "--benchmark", str(bench),
         "--output", str(tmp_path / "packed")],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert again.returncode != 0
    assert "previous run" in again.stderr

    # benchmark == corpus: decontamination drops every doc; the command
    # reports rows=0 (footer-count over zero files), exit 0 — even when the
    # output directory pre-exists (mkdir -p is standard practice)
    empty_out = tmp_path / "packed_empty"
    empty_out.mkdir()
    zero = subprocess.run(
        [sys.executable, "-m", "wikidata_edit_history_ray", "corpus-prep",
         "--input", sf, "--benchmark", sf,
         "--output", str(empty_out)],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert zero.returncode == 0, zero.stderr[-2000:]
    assert json.loads(zero.stdout.strip().splitlines()[-1])["rows"] == 0


def test_corpus_prep_checkpoint_resume(ray_session, tmp_path):
    """--checkpoint-dir persists the slim post-filter table; a rerun with
    the SAME parameters must skip the chain entirely — proven by deleting
    the input file between runs — and re-pack to identical rows; a rerun
    with DIFFERENT chain parameters must refuse the stale checkpoint."""
    import json
    import shutil
    import subprocess
    import sys

    import pyarrow.parquet as pq

    sf = tmp_path / "docs.parquet"
    shutil.copy("/root/testdata/sf0.001/documents.parquet", sf)
    bench = tmp_path / "bench.parquet"
    pq.write_table(pq.read_table(sf).slice(0, 3), bench)
    ckpt = tmp_path / "ckpt"

    def run(outdir, extra_args=(), inp=sf):
        return subprocess.run(
            [sys.executable, "-m", "wikidata_edit_history_ray",
             "corpus-prep", "--input", str(inp),
             "--benchmark", str(bench), "--output", str(tmp_path / outdir),
             "--checkpoint-dir", str(ckpt), *extra_args],
            capture_output=True, text=True, cwd="/root/repo", timeout=600)

    first = run("out1")
    assert first.returncode == 0, first.stderr[-2000:]
    r1 = json.loads(first.stdout.strip().splitlines()[-1])
    assert r1["rows"] > 0 and not r1["resumed_from_checkpoint"]
    assert (ckpt / "_SUCCESS.json").exists()

    sf.unlink()  # the input is GONE — only a true chain skip can succeed
    second = run("out2")
    assert second.returncode == 0, second.stderr[-2000:]
    r2 = json.loads(second.stdout.strip().splitlines()[-1])
    assert r2["resumed_from_checkpoint"] and r2["rows"] == r1["rows"]
    t1 = pq.read_table(str(tmp_path / "out1")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    t2 = pq.read_table(str(tmp_path / "out2")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert t1.equals(t2)

    # changed chain parameter -> the stale checkpoint must be refused
    third = run("out3", extra_args=("--min-tokens", "50"))
    assert third.returncode != 0
    assert "different" in third.stderr and "chain parameters" in third.stderr

    # a TORN checkpoint (sentinel missing) is never a resume point: with
    # the input gone the rerun must fail trying to read it, not silently
    # pack a partial table
    (ckpt / "_SUCCESS.json").unlink()
    fourth = run("out4")
    assert fourth.returncode != 0
