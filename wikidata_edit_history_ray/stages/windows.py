"""Sliding time-window aggregates over a keyed event stream.

`sliding_window_sum(ds, key_col, ts_col, value_col, window)` computes, per
row, the sum of `value_col` over that key's events in
[ts - window, ts] — ANSI-SQL `SUM(v) OVER (PARTITION BY key ORDER BY ts
RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)`, including the frame's
PEER semantics (rows sharing the current timestamp are all in-frame).

Distributed shape: keys hash into coarse buckets (one shuffle; ~buckets
reduce groups, never one per key), each bucket sorts once by (key, ts) and
runs a vectorized prefix-sum + binary-search window per key segment — no
per-row Python, no per-key task. Event-time windows only need co-location of
a KEY's rows, so the bucket shuffle is the entire exchange cost; at 100 TB
the window state per task is bucket-sized, not stream-sized.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ts_to_us(col: pa.ChunkedArray, op_name: str, ts_col: str) -> np.ndarray:
    """Arrow ts column -> int64 epoch MICROSECONDS. Numeric columns are
    epoch SECONDS (the unit every *_seconds parameter uses); blind
    datetime64[us] reinterpretation would make windows 1e6x too wide."""
    t = col.type
    if pa.types.is_timestamp(t):
        return col.cast(pa.timestamp("us")).cast(pa.int64()) \
            .combine_chunks().to_numpy(zero_copy_only=False)
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        v = col.combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return np.round(v * 1e6).astype(np.int64)
    raise TypeError(
        f"{op_name}: ts column {ts_col!r} must be a timestamp or numeric "
        f"epoch-seconds column, got {t}")


def sliding_window_sum(ds, key_col: str, ts_col: str, value_col: str,
                       window_seconds: float, out_col: str = "window_sum",
                       buckets: int | None = None):
    from .distributed import _hash_bucket_array, default_reduce_buckets

    if buckets is None:
        buckets = default_reduce_buckets()

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_wb", _hash_bucket_array(batch.column(key_col).to_pylist(),
                                      buckets))

    def window_bucket(group: pa.Table) -> pa.Table:
        from .distributed import adjacent_equal_mask

        idx = pc.sort_indices(group, sort_keys=[(key_col, "ascending"),
                                                (ts_col, "ascending")])
        g = group.take(idx)
        n = g.num_rows
        ts = _ts_to_us(g.column(ts_col), "sliding_window_sum", ts_col)
        vals = g.column(value_col).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        win = np.int64(round(window_seconds * 1_000_000))
        # segment trick: shift each key's timestamps into its own disjoint
        # band, then ONE global searchsorted answers every per-key window —
        # no per-key Python loop (null keys form one segment, SQL PARTITION
        # BY semantics)
        new_key = np.concatenate([[False], ~adjacent_equal_mask(g, [key_col])]) \
            if n > 1 else np.zeros(n, dtype=bool)
        seg_id = np.cumsum(new_key)
        tr = ts - (ts.min() if n else 0)
        band = (tr.max() if n else 0) + win + 1
        ts_adj = tr + seg_id * band
        prefix = np.concatenate([[0.0], np.cumsum(vals)])
        lo = np.searchsorted(ts_adj, ts_adj - win, side="left")
        hi = np.searchsorted(ts_adj, ts_adj, side="right")  # peers in-frame
        return g.drop_columns(["_wb"]).append_column(
            out_col, pa.array(prefix[hi] - prefix[lo], type=pa.float64()))

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_wb").map_groups(window_bucket, batch_format="pyarrow")


def sessionize(ds, key_col: str, ts_col: str, gap_seconds: float,
               id_col: str | None = None, out_col: str = "session_id",
               buckets: int | None = None):
    """Gap-based sessionization: per key, a new session starts whenever the
    time since the PREVIOUS event (ordered by ts, then `id_col` for
    deterministic tie-break) exceeds `gap_seconds` — the standard
    user-activity / conversation-turn segmentation a training-data pipeline
    applies before assembling dialogue or interaction sequences. Adds
    `out_col` (per-key session number, 1-based) to every row. Exactly the
    SQL window
        1 + SUM(CASE WHEN ts - lag(ts) > gap THEN 1 ELSE 0 END)
            OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED PRECEDING)

    Distributed shape — identical to sliding_window_sum: ONE key-hash coarse
    bucket shuffle (~buckets reduce groups, never one per key), then each
    bucket sorts once and derives every key's session numbers from three
    vectorized scans (key-change mask, timestamp diff, cumulative sum) — no
    per-key task, no per-row Python; per-task state is bucket-sized."""
    from .distributed import _hash_bucket_array, default_reduce_buckets

    if buckets is None:
        buckets = default_reduce_buckets()
    gap_us = np.int64(round(gap_seconds * 1_000_000))

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_sb", _hash_bucket_array(batch.column(key_col).to_pylist(),
                                      buckets))

    sort_cols = [key_col, ts_col] + ([id_col] if id_col else [])

    def session_bucket(group: pa.Table) -> pa.Table:
        from .distributed import adjacent_equal_mask

        idx = pc.sort_indices(
            group, sort_keys=[(c, "ascending") for c in sort_cols])
        g = group.take(idx)
        n = g.num_rows
        if n == 0:
            return g.drop_columns(["_sb"]).append_column(
                out_col, pa.array([], type=pa.int64()))
        ts = _ts_to_us(g.column(ts_col), "sessionize", ts_col)
        # SQL PARTITION BY groups all NULL keys together — the shared
        # null==null segmentation kernel handles that uniformly
        same = adjacent_equal_mask(g, [key_col])
        new_key = np.concatenate([[True], ~same])
        gap_break = np.concatenate([[False], (ts[1:] - ts[:-1]) > gap_us])
        is_start = new_key | gap_break
        global_sid = np.cumsum(is_start)          # monotone non-decreasing
        key_base = np.maximum.accumulate(np.where(new_key, global_sid, 0))
        return g.drop_columns(["_sb"]).append_column(
            out_col, pa.array((global_sid - key_base + 1).astype(np.int64),
                              type=pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_sb").map_groups(session_bucket, batch_format="pyarrow")
