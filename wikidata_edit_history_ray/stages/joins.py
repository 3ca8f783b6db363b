"""As-of join: match every left row to the most recent right row of the same
key with right.ts <= left.ts (ANSI/DuckDB `ASOF LEFT JOIN ... ON l.k = r.k
AND l.ts >= r.ts` semantics, ties at equal ts matching).

Distributed shape — the classic union trick, ONE shuffle:
1. null-pad both sides to a common schema, tag the side, hash-bucket on the
   join key (all rows of a key co-locate; ~buckets reduce groups);
2. per bucket: one sort by (key, ts, side) with right-before-left at equal
   ts, then a vectorized per-key forward-fill of the right payload;
3. emit the left rows with the filled columns. Right payloads move through
   the shuffle once; no per-key task, no driver materialization.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def broadcast_range_join(ds, value_col: str, intervals,
                         id_cols: list | None = None,
                         band_col: str = "band_id"):
    """Interval-containment join: one output row per (row, interval) with
    interval.lo <= value <= interval.hi — intervals may overlap (1:N).

    `intervals`: [(band_id, lo, hi), ...] — a DIMENSION-sized side, shipped
    once in the task closure (the broadcast-join shape; at 100 TB the fact
    side streams, the interval table is bytes). Vectorized: one containment
    mask per interval per batch, rows gathered with Arrow take."""
    import numpy as np

    ivs = [(int(b), float(lo), float(hi)) for b, lo, hi in intervals]

    def join_batch(batch: pa.Table) -> pa.Table:
        src = batch.select(id_cols) if id_cols else batch
        vals = batch.column(value_col).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        take_idx, bands = [], []
        for b, lo, hi in ivs:
            hit = np.nonzero((vals >= lo) & (vals <= hi))[0]
            take_idx.append(hit)
            bands.append(np.full(len(hit), b, dtype=np.int64))
        idx = np.concatenate(take_idx) if take_idx else np.array([], np.int64)
        out = src.take(pa.array(idx))
        return out.append_column(
            band_col, pa.array(np.concatenate(bands) if bands
                               else np.array([], np.int64), type=pa.int64()))

    return ds.map_batches(join_batch, batch_format="pyarrow")


def asof_join(left_ds, right_ds, key_col: str, ts_col: str,
              right_value_cols: list, suffix: str = "_right",
              buckets: int | None = None):
    """Returns left rows + `<col><suffix>` columns (null when the key has no
    right row at or before the left timestamp)."""
    from .distributed import _hash_bucket_array, default_reduce_buckets

    if buckets is None:
        buckets = default_reduce_buckets()

    l_schema = left_ds.schema()
    left_names = list(l_schema.names)
    r_schema = right_ds.schema()
    rtypes = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    out_cols = [(c, f"{c}{suffix}", rtypes[c]) for c in right_value_cols]

    union_fields = list(zip(l_schema.names, l_schema.types)) \
        + [(oc, t) for _, oc, t in out_cols] + [("_side", pa.int8())]
    union_schema = pa.schema(union_fields)

    def tag_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays = [batch.column(name).cast(typ) if name in left_names
                  else pa.nulls(n, typ)
                  for name, typ in union_fields[:-1]]
        arrays.append(pa.array(np.ones(n, dtype=np.int8), type=pa.int8()))
        t = pa.Table.from_arrays(arrays, schema=union_schema)
        return t.append_column(
            "_jb", _hash_bucket_array(batch.column(key_col).to_pylist(),
                                      buckets))

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays = []
        for name, typ in union_fields[:-1]:
            if name in (key_col, ts_col):
                arrays.append(batch.column(name).cast(typ))
            else:
                src = next((c for c, oc, _ in out_cols if oc == name), None)
                arrays.append(batch.column(src).cast(typ) if src
                              else pa.nulls(n, typ))
        arrays.append(pa.array(np.zeros(n, dtype=np.int8), type=pa.int8()))
        t = pa.Table.from_arrays(arrays, schema=union_schema)
        return t.append_column(
            "_jb", _hash_bucket_array(batch.column(key_col).to_pylist(),
                                      buckets))

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.select_columns([key_col, ts_col] + right_value_cols)
        .map_batches(tag_right, batch_format="pyarrow"))

    filled = [oc for _, oc, _ in out_cols]
    # one FIXED output schema for every bucket: right rows null-pad the
    # left-only columns so pandas coerces them (ints to float64 with NaN),
    # and per-group dtype inference would let each bucket emit different
    # column types — instead every bucket casts back to the declared schema
    # (convert_dtypes first so NaN misses become real Arrow nulls, which
    # cast into nullable int/float columns; a bare float->int cast of NaN
    # would throw)
    out_schema = pa.schema(list(zip(l_schema.names, l_schema.types))
                           + [(oc, t) for _, oc, t in out_cols])

    def join_bucket(group):
        # right rows (side 0) sort before left rows at equal (key, ts), so a
        # per-key forward fill realizes "greatest right.ts <= left.ts"
        g = group.sort_values([key_col, ts_col, "_side"], kind="mergesort")
        g[filled] = g.groupby(key_col, sort=False)[filled].ffill()
        g = g[g["_side"] == 1].drop(columns=["_side", "_jb"])
        t = pa.Table.from_pandas(g.convert_dtypes(), preserve_index=False)
        cols = [t.column(name).cast(typ)
                for name, typ in zip(out_schema.names, out_schema.types)]
        return pa.Table.from_arrays(cols, schema=out_schema)

    return unioned.groupby("_jb").map_groups(join_bucket, batch_format="pandas")
