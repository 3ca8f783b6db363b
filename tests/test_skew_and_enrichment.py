"""Scale/skew tests (SURVEY §5): salted dedup == unsalted dedup on a corpus
with one hot doc among many small docs; second-pass enrichment pipeline."""
import pytest


@pytest.fixture(scope="module")
def hot_corpus(ray_session):
    from wikidata_edit_history_ray.sources.corpus import make_corpus

    # 60 docs, every 10th hot with 300 revisions on few properties
    docs, _ = make_corpus(60, seed=99, hot_doc_revisions=300, hot_doc_every=10)
    return docs


class TestSaltedDedup:
    def test_salted_equals_unsalted(self, ray_session, hot_corpus):
        import ray

        from wikidata_edit_history_ray.pipelines.kg import dedup_changes, extract_table

        pk = ["revision_id", "property_id", "value_id", "change_target"]
        # duplicate the input so real duplicate keys exist across partitions
        ds = ray.data.from_arrow(hot_corpus).union(ray.data.from_arrow(hot_corpus))
        vc = extract_table(ds, "value_change", concurrency=2).materialize()

        plain = dedup_changes(vc, pk).select_columns(pk).take_all()
        salted = dedup_changes(vc, pk, salt_buckets=8).select_columns(pk).take_all()
        key = lambda r: tuple(r[c] for c in pk)
        assert sorted(map(key, plain)) == sorted(map(key, salted))
        # exactly one row per PK
        assert len({key(r) for r in salted}) == len(salted)

    def test_hot_doc_extraction_correct(self, ray_session, hot_corpus):
        import ray

        from wikidata_edit_history_ray.pipelines.kg import extract_table

        ds = ray.data.from_arrow(hot_corpus)
        es = extract_table(ds, "entity_stats", concurrency=2).take_all()
        hot = [r for r in es if r["num_revisions"] >= 290]
        assert len(hot) == 5  # every 10th of 60 docs (indices 10..50)
        assert all(r["num_value_change_updates"] >= 280 for r in hot)


class TestEnrichmentPipeline:
    def test_run_enrichment_over_sink_output(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from wikidata_edit_history_ray.pipelines.kg import run_enrichment, run_extraction
        from wikidata_edit_history_ray.sources.corpus import make_corpus
        from wikidata_edit_history_ray.state.closure import write_synthetic_closures

        docs, _ = make_corpus(40, seed=5)
        import pyarrow.parquet as pqw
        src = str(tmp_path / "docs.parquet")
        pqw.write_table(docs, src, row_group_size=20)
        out = str(tmp_path / "out")
        run_extraction(src, out, concurrency=2)

        closures = write_synthetic_closures(str(tmp_path / "closures"))
        res = run_enrichment(out, closure_dir=closures,
                             entity_labels={"Q5": ("human", "person")})
        t = pq.read_table(res["features_entity_enriched"])
        assert t.num_rows > 0
        cols = t.column_names
        assert "label_cosine_similarity" in cols
        # enrichment filled the closure probe columns with real ints
        assert t.column("old_value_subclass_new_value").null_count == 0
        t2 = pq.read_table(res["features_text_enriched"])
        assert t2.column("value_cosine_similarity").null_count == 0


class TestWideDocGuard:
    def test_over_limit_docs_routed_to_errors(self, ray_session):
        import ray

        from wikidata_edit_history_ray.core.differ import DiffConfig
        from wikidata_edit_history_ray.pipelines.kg import extract_table
        from wikidata_edit_history_ray.sources.corpus import make_corpus

        docs, _ = make_corpus(30, seed=3, hot_doc_revisions=200, hot_doc_every=10)
        ds = ray.data.from_arrow(docs)
        cfg = DiffConfig(max_spans_per_doc=100)
        errs = extract_table(ds, "errors", config=cfg, concurrency=2).take_all()
        assert len(errs) == 2
        assert all("WideDocSkipped" in e["error"] for e in errs)
        n_guarded = extract_table(ds, "entity_stats", config=cfg, concurrency=2).count()
        n_full = extract_table(ds, "entity_stats", concurrency=2).count()
        assert n_guarded == n_full - 2
