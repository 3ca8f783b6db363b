"""The KG change-history construction pipeline, Ray-Data-first.

Two consumption shapes:
- `extract_table(ds, table, ...)` — lazy Dataset of ONE logical change table
  (used by queries / tests / downstream aggregates).
- `run_extraction(input_path, output_dir, ...)` — one streaming pass that fans
  out ALL logical tables to partitioned Parquet with a per-partition lineage
  manifest; restartable (completed partitions are skipped via their manifest
  files). This replaces the reference's db_writer process + processed-files
  claim protocol (scripts/db_writer.py, main.py:62-131).
"""
from __future__ import annotations

import os

from ..core.differ import DiffConfig
from ..stages.extract import ChangeExtractor, MultiSinkExtractor


def _broadcast_aux(property_labels, sa_types, ao_types):
    """ray.put the small side tables once so every actor reads the same
    object-store copy instead of re-shipping per task."""
    import ray

    return (
        ray.put(property_labels or {}),
        ray.put(sorted(sa_types or ())),
        ray.put(sorted(ao_types or ())),
    )


def extract_table(ds, table: str = "value_change", config: DiffConfig | None = None,
                  property_labels=None, sa_types=None, ao_types=None,
                  concurrency=None, batch_size: int = 32):
    """documents Dataset -> Dataset of one logical change table.

    The extractor is a callable class => actor pool; per-actor setup happens
    once. batch_size is small because each row is a whole document (many spans).
    """
    import ray

    pl_ref, sa_ref, ao_ref = _broadcast_aux(property_labels, sa_types, ao_types)
    cfg = (config or DiffConfig()).to_dict()
    if concurrency is None:
        # autoscaling actor pool sized to the cluster: extraction is the
        # CPU-dominant stage, so it may use (almost) every core
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, ncpu))
    return ds.map_batches(
        ChangeExtractor,
        fn_constructor_kwargs=dict(
            config=cfg, property_labels=pl_ref, sa_types=sa_ref,
            ao_types=ao_ref, emit=table),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def run_extraction(input_path: str, output_dir: str,
                   config: DiffConfig | None = None, property_labels=None,
                   sa_types=None, ao_types=None, concurrency=None,
                   batch_size: int = 32, documents_ds=None):
    """Full multi-table extraction with lineage manifest; returns the manifest
    as a small materialized Dataset (one row per partition).

    Resume: re-running with the same input + output_dir skips every partition
    whose manifest file exists — only missing partitions are recomputed.
    """
    from ..sources.io import read_documents

    os.makedirs(output_dir, exist_ok=True)
    ds = documents_ds if documents_ds is not None else read_documents(input_path)
    pl_ref, sa_ref, ao_ref = _broadcast_aux(property_labels, sa_types, ao_types)
    cfg = (config or DiffConfig()).to_dict()
    manifest = ds.map_batches(
        MultiSinkExtractor,
        fn_constructor_kwargs=dict(
            output_dir=output_dir, config=cfg, property_labels=pl_ref,
            sa_types=sa_ref, ao_types=ao_ref),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    mat = manifest.materialize()
    # persist the run-level manifest next to the outputs (throughput accounting,
    # the analog of the reference's per-file metrics CSV, scripts/file_parser.py:393-417)
    mat.write_parquet(os.path.join(output_dir, "_run_manifest"))
    return mat


def dedup_changes(ds, pk_cols, salt_buckets: int = 0):
    """Exact keep-first dedup on a composite PK — the ON CONFLICT DO NOTHING
    analog (scripts/utils.py:205-212), needed only across partition boundaries
    or after a partial re-run.

    For skewed keys pass salt_buckets > 0: rows are pre-grouped on
    (hash(pk) % salt) inside map_batches (partial dedup), then globally.
    Within one run partitions are disjoint in doc_id, so the global groupby
    only pays for the duplicate keys that actually exist.
    """
    import pyarrow as pa

    def drop_local_dupes(batch: pa.Table) -> pa.Table:
        # partial dedup inside each block before any shuffle
        df = batch.to_pandas()
        df = df.drop_duplicates(subset=pk_cols, keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    ds = ds.map_batches(drop_local_dupes, batch_format="pyarrow")

    def first_of_group(group):
        return group.head(1)

    return ds.groupby(pk_cols).map_groups(first_of_group, batch_format="pandas")
