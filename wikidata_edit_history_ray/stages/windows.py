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

    def window_bucket(group):
        import pandas.api.types as pdt

        g = group.sort_values([key_col, ts_col], kind="mergesort")
        n = len(g)
        ser = g[ts_col]
        if pdt.is_datetime64_any_dtype(ser):
            ts = ser.to_numpy().astype("datetime64[us]").astype(np.int64)
        elif pdt.is_numeric_dtype(ser):
            # numeric timestamps are epoch SECONDS — the same unit as
            # window_seconds; blind datetime64[us] reinterpretation would
            # make the window 1e6x too wide
            ts = np.round(
                ser.to_numpy(dtype=np.float64) * 1e6).astype(np.int64)
        else:
            raise TypeError(
                f"sliding_window_sum: ts column {ts_col!r} must be a "
                f"timestamp or numeric epoch-seconds column, got "
                f"{ser.dtype}")
        vals = g[value_col].to_numpy(dtype=np.float64)
        keys = g[key_col].to_numpy()
        win = np.int64(round(window_seconds * 1_000_000))
        # segment trick: shift each key's timestamps into its own disjoint
        # band, then ONE global searchsorted answers every per-key window —
        # no per-key Python loop
        new_key = np.concatenate([[False], keys[1:] != keys[:-1]]) \
            if n > 1 else np.zeros(n, dtype=bool)
        seg_id = np.cumsum(new_key)
        tr = ts - (ts.min() if n else 0)
        band = (tr.max() if n else 0) + win + 1
        ts_adj = tr + seg_id * band
        prefix = np.concatenate([[0.0], np.cumsum(vals)])
        lo = np.searchsorted(ts_adj, ts_adj - win, side="left")
        hi = np.searchsorted(ts_adj, ts_adj, side="right")  # peers in-frame
        g = g.drop(columns=["_wb"]).copy()
        g[out_col] = prefix[hi] - prefix[lo]
        return g

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_wb").map_groups(window_bucket, batch_format="pandas")
