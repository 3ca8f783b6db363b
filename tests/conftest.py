"""Session-scoped Ray fixture: one ray.init per pytest session."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, log_to_driver=False)
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """(docs_table, expectations) — 120 random-script docs, fixed seed."""
    from wikidata_edit_history_ray.sources.corpus import make_corpus

    return make_corpus(120, seed=42)


@pytest.fixture(scope="session")
def corpus_parquet(tmp_path_factory, small_corpus):
    import pyarrow.parquet as pq

    path = tmp_path_factory.mktemp("corpus") / "docs.parquet"
    pq.write_table(small_corpus[0], str(path), row_group_size=20)
    return str(path)
