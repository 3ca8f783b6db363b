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

    # one FIXED output schema for every bucket — the union schema already
    # carries every column at its declared Arrow type, and the Arrow-format
    # reducer below only ever `take`s from those columns, so no per-group
    # dtype inference and no pandas float64 coercion can occur
    out_schema = pa.schema(list(zip(l_schema.names, l_schema.types))
                           + [(oc, t) for _, oc, t in out_cols])

    def join_bucket(group: pa.Table) -> pa.Table:
        # right rows (side 0) sort before left rows at equal (key, ts), so
        # "index of the latest right row so far within the key segment" —
        # one vectorized maximum.accumulate over segment-offset scores —
        # realizes "greatest right.ts <= left.ts" with ties matching
        import pyarrow.compute as pc

        from .distributed import adjacent_equal_mask

        idx = pc.sort_indices(group, sort_keys=[(key_col, "ascending"),
                                                (ts_col, "ascending"),
                                                ("_side", "ascending")])
        g = group.take(idx)
        n = g.num_rows
        side = g.column("_side").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        new_key = np.concatenate([[True], ~adjacent_equal_mask(g, [key_col])]) \
            if n else np.zeros(0, dtype=bool)
        seg_id = np.cumsum(new_key) - 1 if n else np.zeros(0, dtype=np.int64)
        base = seg_id.astype(np.int64) * np.int64(n + 1)
        rows = np.arange(n, dtype=np.int64)
        # score = segment-offset right-row index + 1; left rows contribute 0,
        # so the running max at a left row is the latest right row at or
        # before it IN ITS SEGMENT (scores from earlier segments are < base)
        score = np.where(side == 0, base + rows + 1, 0)
        acc = np.maximum.accumulate(score) if n else score
        left_rows = rows[side == 1]
        match = acc[left_rows] - base[left_rows] - 1   # -1 = no right row yet
        # SQL ON l.k = r.k never matches NULL keys (the segment kernel
        # groups nulls together — correct for PARTITION BY, not for a join)
        key_null = pc.is_null(g.column(key_col)).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        match = np.where(key_null[left_rows], -1, match)
        left_take = pa.array(left_rows, type=pa.int64())
        fill_take = pa.array(match, type=pa.int64(), mask=match < 0)
        arrays = [g.column(name).take(left_take) for name in l_schema.names]
        arrays += [g.column(oc).take(fill_take) for _, oc, _ in out_cols]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return unioned.groupby("_jb").map_groups(join_bucket,
                                             batch_format="pyarrow")
