"""In-repo replica of the driver's side-by-side comparison: run a
representative subset of queries() and their oracle_sql() through DuckDB at
sf0.001 and require exact (rows, schema, values) matches — the same gate
CORRECTNESS_r{N}.json applies at sf0.01.
"""
import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

# representative slice: KG differ tables, aggregates, graph replay, dedup,
# errors, ANN — one per oracle family (full sweep is the driver's job)
SUBSET = [
    "kg_value_change",
    "kg_revision",
    "kg_entity_stats",
    "kg_graph_triples",
    "kg_features_text",
    "kg_errors",
    "kg_revision_distribution",
    "kg_graph_asof",
    "kg_media_features",
    "media_frame_samples",
    "minhash_dedup_docs",
    "embedding_dedup",
    "ivf_topk",
    "events_type_stats",
    "text_analysis",
    "pack_sequences",
    "llm_corpus_prep",
    "unigram_logprob",
    "kmeans_assign",
    "events_sessionize",
    "chunk_dedup",
    "weighted_sample",
    "corpus_mix",
    "semdedup",
    "dsir_logratio",
    "epoch_shuffle",
    "epoch_pack",
    "corpus_diff",
    "apply_corpus_delta",
    "blocklist_flags",
    "pack_texts",
]


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as E

    return E.queries(), E.oracle_sql(sf_dir=SF)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * "
                  f"FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, contract, con, name):
    queries, oracles = contract
    got = _canon(_to_df(queries[name](SF)))
    exp = _canon(con.execute(oracles[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp) > 0 or name == "kg_errors"
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))


def test_every_query_has_oracle(contract):
    queries, oracles = contract
    missing = set(queries) - set(oracles)
    assert missing == set(), missing
