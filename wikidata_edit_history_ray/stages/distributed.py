"""Distributed small-side exchange primitives.

Two building blocks the dedup/enrichment stages share:

- `broadcast_dataset` / `_get_broadcast_table`: materialize a (small) Dataset
  into object-store blocks and hand its block REFS to downstream tasks — the
  rows are fetched and concatenated once per worker process, never through
  the driver heap (the round-1 `take_all()` anti-pattern this replaces).
- `filter_out_ids`: anti-join `ds` against a drop-id Dataset. Broadcast path
  for small drop sets; hash-partitioned shuffle anti-join for drop sets too
  big to broadcast (both sides co-partition on the id hash, so each reduce
  bucket filters locally — the shape that holds when the drop set is billions
  of ids on a 256-node cluster).
"""
from __future__ import annotations

import pyarrow as pa

def default_reduce_buckets(minimum: int = 64) -> int:
    """Coarse-reducer bucket count proportional to the cluster: ~2 reduce
    tasks per CPU, floored at `minimum`. A fixed 64 would cap reduce-side
    parallelism on a 256-node cluster at 64 tasks; resolved at pipeline build
    time on the driver."""
    try:
        import ray

        if ray.is_initialized():
            return max(minimum,
                       int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:
        pass
    return minimum


# per-worker cache of fetched broadcast tables, keyed by the ref tuple
_BCAST_CACHE: dict = {}

# driver-side pins: the MaterializedDataset that owns the broadcast blocks
# must outlive the downstream execution — if it is GC'd, Ray may reclaim the
# blocks under object-store pressure and the captured refs dangle (observed
# as a rare UserCodeException in the filter stage on small-memory sessions)
_BCAST_PINS: list = []


def broadcast_dataset(ds):
    """Materialize a Dataset and return a lightweight handle (tuple of Arrow
    block refs) that tasks can capture in closures."""
    mat = ds.materialize()
    _BCAST_PINS.append(mat)
    if len(_BCAST_PINS) > 64:
        del _BCAST_PINS[:32]
    return tuple(mat.to_arrow_refs())


def _get_broadcast_table(refs) -> pa.Table:
    """Fetch + concat the broadcast blocks, once per worker process."""
    import ray

    key = tuple(r.hex() for r in refs)
    hit = _BCAST_CACHE.get(key)
    if hit is None:
        if len(_BCAST_CACHE) > 16:
            _BCAST_CACHE.clear()
        tables = [t for t in ray.get(list(refs)) if t.num_rows > 0]
        hit = pa.concat_tables(tables) if tables else None
        _BCAST_CACHE[key] = hit
    return hit


def broadcast_id_set(ds, col: str):
    """Broadcast handle for a single-column id set."""
    return broadcast_dataset(ds.select_columns([col]))


def _get_broadcast_set(refs, col: str) -> set:
    key = (tuple(r.hex() for r in refs), col, "set")
    hit = _BCAST_CACHE.get(key)
    if hit is None:
        t = _get_broadcast_table(refs)
        hit = set(t.column(col).to_pylist()) if t is not None else set()
        _BCAST_CACHE[key] = hit
    return hit


def filter_out_ids(ds, drop_ds, id_col: str, drop_col: str = "drop_id",
                   broadcast_limit: int = 2_000_000, buckets: int | None = None):
    """Remove from `ds` every row whose `id_col` appears in `drop_ds[drop_col]`.

    drop count <= broadcast_limit: drop ids are broadcast as block refs and
    each filter task tests membership locally (one object-store fetch per
    worker, zero shuffle of `ds`).
    Beyond the limit: shuffle anti-join — both sides co-partition on
    hash(id) % buckets and each bucket filters with a local hash set, so
    neither side ever materializes centrally.
    """
    drop_small = drop_ds.select_columns([drop_col]).materialize()
    _BCAST_PINS.append(drop_small)
    if len(_BCAST_PINS) > 64:
        del _BCAST_PINS[:32]
    if buckets is None:
        buckets = default_reduce_buckets()
    if drop_small.count() <= broadcast_limit:
        refs = tuple(drop_small.to_arrow_refs())

        def filter_batch(batch: pa.Table) -> pa.Table:
            drops = _get_broadcast_set(refs, drop_col)
            if not drops:
                return batch
            mask = pa.array([v not in drops
                             for v in batch.column(id_col).to_pylist()])
            return batch.filter(mask)

        return ds.map_batches(filter_batch, batch_format="pyarrow")
    return _anti_join_shuffle(ds, drop_small, id_col, drop_col, buckets)


def _hash_bucket_array(values, buckets: int) -> pa.Array:
    """Process-stable id-hash buckets (Python's str hash is salted per
    process, which would scatter the two join sides into different buckets)."""
    import hashlib

    import numpy as np

    def h(v):
        if isinstance(v, (int, np.integer)):
            return int(v) % buckets
        d = hashlib.sha1(str(v).encode("utf-8")).digest()
        return int.from_bytes(d[:8], "little") % buckets

    return pa.array(np.fromiter((h(v) for v in values), dtype=np.int64,
                                count=len(values)), type=pa.int64())


def _anti_join_shuffle(ds, drop_ds, id_col: str, drop_col: str, buckets: int):
    """Hash-partitioned anti-join: union main rows (+marker) with drop-id rows
    null-padded to the main schema, one groupby shuffle on the id-hash bucket,
    per-bucket local filter."""
    schema = ds.schema()
    full = pa.schema(list(zip(schema.names, schema.types))
                     + [pa.field("_is_drop", pa.bool_())])

    def tag_main(batch: pa.Table) -> pa.Table:
        b = batch.append_column(
            "_is_drop", pa.array([False] * batch.num_rows, type=pa.bool_()))
        return b.append_column(
            "_aj_bucket",
            _hash_bucket_array(batch.column(id_col).to_pylist(), buckets))

    def tag_drop(batch: pa.Table) -> pa.Table:
        ids = batch.column(drop_col)
        n = len(ids)
        cols = []
        for f in full:
            if f.name == id_col:
                cols.append(ids.cast(f.type))
            elif f.name == "_is_drop":
                cols.append(pa.array([True] * n, type=pa.bool_()))
            else:
                cols.append(pa.nulls(n, type=f.type))
        t = pa.Table.from_arrays(cols, schema=full)
        return t.append_column(
            "_aj_bucket", _hash_bucket_array(ids.to_pylist(), buckets))

    main = ds.map_batches(tag_main, batch_format="pyarrow")
    drop_tagged = drop_ds.map_batches(tag_drop, batch_format="pyarrow")
    unioned = main.union(drop_tagged)

    def bucket_filter(group):
        dropped = set(group.loc[group["_is_drop"], id_col])
        keep = group[~group["_is_drop"]]
        if dropped:
            keep = keep[~keep[id_col].isin(dropped)]
        return keep.drop(columns=["_is_drop", "_aj_bucket"])

    return unioned.groupby("_aj_bucket").map_groups(
        bucket_filter, batch_format="pandas")


def fetch_rows_by_ids(ds, id_ds, id_col: str, columns=None,
                      warn_above: int = 5_000_000):
    """Small-result point lookup: scan `ds`, keep rows whose id is in the
    (broadcast) id set, return a broadcast handle for the result table.

    The scan is shuffle-free (a filter pass); the result must be small (the
    candidate set of a dedup pass, not the corpus). When the id set exceeds
    `warn_above`, a warning is logged — at that size the fetched rows may not
    fit a worker heap and the caller should switch to a partitioned join
    (no silent degradation)."""
    n_ids = id_ds.count()
    if n_ids > warn_above:
        import logging

        logging.getLogger(__name__).warning(
            "fetch_rows_by_ids: %d candidate ids exceed the broadcast "
            "comfort zone (%d); fetched rows are broadcast per worker — "
            "consider a partitioned join for this dup rate", n_ids, warn_above)
    refs = broadcast_id_set(id_ds, id_col)

    def filt(batch: pa.Table) -> pa.Table:
        ids = _get_broadcast_set(refs, id_col)
        mask = pa.array([v in ids for v in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    out = ds.map_batches(filt, batch_format="pyarrow")
    if columns:
        out = out.select_columns(columns)
    return broadcast_dataset(out)
