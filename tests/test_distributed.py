"""Distributed anti-join / broadcast primitives + dedup skew behavior."""
import numpy as np
import pyarrow as pa


class TestFilterOutIds:
    def _mk(self, n=1000):
        import ray.data

        t = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                      "text": [f"t{i}" for i in range(n)]})
        drops = pa.table({"drop_id": pa.array(range(0, n, 3), type=pa.int64())})
        return ray.data.from_arrow(t), ray.data.from_arrow(drops)

    def test_broadcast_path(self, ray_session):
        from wikidata_edit_history_ray.stages.distributed import filter_out_ids

        ds, drops = self._mk()
        out = filter_out_ids(ds, drops, "doc_id")
        ids = sorted(r["doc_id"] for r in out.take_all())
        assert ids == [i for i in range(1000) if i % 3 != 0]

    def test_shuffle_path_matches_broadcast(self, ray_session):
        from wikidata_edit_history_ray.stages.distributed import filter_out_ids

        ds, drops = self._mk()
        out = filter_out_ids(ds, drops, "doc_id", broadcast_limit=0)
        rows = out.take_all()
        ids = sorted(r["doc_id"] for r in rows)
        assert ids == [i for i in range(1000) if i % 3 != 0]
        # full rows survive the shuffle path intact
        by_id = {r["doc_id"]: r["text"] for r in rows}
        assert by_id[1] == "t1" and by_id[998] == "t998"

    def test_string_ids_shuffle_path(self, ray_session):
        import ray.data

        from wikidata_edit_history_ray.stages.distributed import filter_out_ids

        t = pa.table({"k": [f"id{i}" for i in range(50)]})
        d = pa.table({"drop_id": [f"id{i}" for i in range(0, 50, 2)]})
        out = filter_out_ids(ray.data.from_arrow(t), ray.data.from_arrow(d),
                             "k", broadcast_limit=0)
        assert sorted(r["k"] for r in out.take_all()) == \
            sorted(f"id{i}" for i in range(1, 50, 2))


class TestGatherPairValues:
    def test_resolves_both_endpoints(self, ray_session):
        import ray.data

        from wikidata_edit_history_ray.stages.distributed import \
            gather_pair_values

        n = 200
        t = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                      "text": [f"payload-{i}" for i in range(n)]})
        edges = pa.table({
            "cand_a": pa.array([i for i in range(0, n, 4)], type=pa.int64()),
            "cand_b": pa.array([i + 1 for i in range(0, n, 4)], type=pa.int64())})
        out = gather_pair_values(ray.data.from_arrow(t, override_num_blocks=4),
                                 ray.data.from_arrow(edges),
                                 "doc_id", "text").take_all()
        assert len(out) == n // 4
        for r in out:
            assert r["val_a"] == f"payload-{r['cand_a']}"
            assert r["val_b"] == f"payload-{r['cand_b']}"
            assert r["cand_b"] == r["cand_a"] + 1

    def test_duplicate_edges_resolve_once(self, ray_session):
        import ray.data

        from wikidata_edit_history_ray.stages.distributed import \
            gather_pair_values

        t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                      "text": ["a", "b", "c"]})
        edges = pa.table({"cand_a": pa.array([1, 1, 1], type=pa.int64()),
                          "cand_b": pa.array([2, 2, 3], type=pa.int64())})
        out = gather_pair_values(ray.data.from_arrow(t),
                                 ray.data.from_arrow(edges),
                                 "doc_id", "text").take_all()
        pairs = sorted((r["cand_a"], r["cand_b"], r["val_a"], r["val_b"])
                       for r in out)
        assert pairs == [(1, 2, "a", "b"), (1, 3, "a", "c")]


class TestDedupSkew:
    def test_minhash_hot_bucket(self, ray_session):
        """One LSH bucket with thousands of members (identical docs) — the
        pipeline must collapse them to the min-id survivor without the driver
        ever holding the drop set (no take_all in the dedup path)."""
        import ray.data

        from wikidata_edit_history_ray.stages.dedup_ops import minhash_lsh_dedup

        n = 3000
        hot = "the same hot document text repeated verbatim across the corpus"
        texts = [hot] * n + [f"unique doc {i} with its own words w{i}a w{i}b w{i}c"
                             for i in range(20)]
        ids = list(range(n + 20))
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})
        out = minhash_lsh_dedup(ray.data.from_arrow(t, override_num_blocks=8))
        got = sorted(r["doc_id"] for r in out.take_all())
        assert got == [0] + list(range(n, n + 20))

    def test_minhash_partitioned_verify_matches_broadcast(self, ray_session):
        """Forcing candidate_broadcast_limit=0 routes verification through the
        hash-partitioned pair join; the survivor set must be identical to the
        broadcast path's."""
        import ray.data

        from wikidata_edit_history_ray.stages.dedup_ops import minhash_lsh_dedup

        texts, ids = [], []
        for i in range(60):
            toks = [f"w{i}x{j}" for j in range(40)]
            ids.append(i)
            texts.append(" ".join(toks))
            if i % 5 == 0:  # near clone, must drop
                ids.append(1000 + i)
                texts.append(" ".join(toks[:-1] + ["zz"]))
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})
        src = ray.data.from_arrow(t, override_num_blocks=4)
        broadcast = sorted(r["doc_id"] for r in minhash_lsh_dedup(src).take_all())
        partitioned = sorted(r["doc_id"] for r in minhash_lsh_dedup(
            src, candidate_broadcast_limit=0).take_all())
        assert partitioned == broadcast == list(range(60))

    def test_simhash_hot_bucket(self, ray_session):
        import ray.data

        from wikidata_edit_history_ray.stages.dedup_ops import simhash_dedup

        n = 2000
        hot = " ".join(f"tok{i}" for i in range(40))
        texts = [hot] * n + [" ".join(f"u{j}x{i}" for i in range(40))
                             for j in range(10)]
        ids = list(range(n + 10))
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})
        out = simhash_dedup(ray.data.from_arrow(t, override_num_blocks=8))
        got = sorted(r["doc_id"] for r in out.take_all())
        assert got == [0] + list(range(n, n + 10))

    def test_embedding_multi_table_recall(self, ray_session):
        """Identical vectors collapse regardless of which LSH table buckets
        them; distinct vectors survive."""
        import ray.data

        from wikidata_edit_history_ray.stages.dedup_ops import embedding_dedup

        rng = np.random.RandomState(3)
        base = rng.randn(50, 16).astype(np.float32)
        vecs = list(base) + [base[i] for i in range(0, 50, 5)]
        ids = list(range(50)) + [100 + i for i in range(0, 50, 5)]
        t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                      "embedding": [v.tolist() for v in vecs]})
        out = embedding_dedup(ray.data.from_arrow(t), cosine_threshold=0.999)
        assert sorted(r["vec_id"] for r in out.take_all()) == list(range(50))


class TestExactDedupHostile:
    def test_all_duplicates_collapse_to_one(self, ray_session):
        import pyarrow as pa
        import ray.data

        from wikidata_edit_history_ray.stages.dedup_ops import exact_dedup

        n = 5000
        t = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                      "text": ["same text"] * n})
        out = exact_dedup(ray.data.from_arrow(t, override_num_blocks=8))
        assert [r["doc_id"] for r in out.take_all()] == [0]

    def test_no_duplicates_passthrough(self, ray_session):
        import pyarrow as pa
        import ray.data

        from wikidata_edit_history_ray.stages.dedup_ops import exact_dedup

        t = pa.table({"doc_id": pa.array(range(100), type=pa.int64()),
                      "text": [f"t{i}" for i in range(100)]})
        out = exact_dedup(ray.data.from_arrow(t, override_num_blocks=4))
        assert sorted(r["doc_id"] for r in out.take_all()) == list(range(100))

    def test_cross_block_duplicates_min_id_wins(self, ray_session):
        """Duplicates split across blocks: the local pre-dedup emits block
        losers, the bucket reduce picks the global min id."""
        import pyarrow as pa
        import ray.data

        from wikidata_edit_history_ray.stages.dedup_ops import exact_dedup

        ids = list(range(400))
        texts = [f"dup{i % 7}" for i in ids]  # 7 distinct texts, everywhere
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})
        out = exact_dedup(ray.data.from_arrow(t, override_num_blocks=16))
        assert sorted(r["doc_id"] for r in out.take_all()) == list(range(7))


class TestGatherPairValuesStringIds:
    def test_string_ids(self, ray_session):
        import ray.data

        from wikidata_edit_history_ray.stages.distributed import \
            gather_pair_values

        t = pa.table({"k": [f"d{i}" for i in range(40)],
                      "text": [f"p{i}" for i in range(40)]})
        edges = pa.table({"cand_a": [f"d{i}" for i in range(0, 40, 4)],
                          "cand_b": [f"d{i+1}" for i in range(0, 40, 4)]})
        out = gather_pair_values(ray.data.from_arrow(t, override_num_blocks=3),
                                 ray.data.from_arrow(edges),
                                 "k", "text").take_all()
        assert len(out) == 10
        for r in out:
            assert r["val_a"] == "p" + r["cand_a"][1:]
            assert r["val_b"] == "p" + r["cand_b"][1:]
