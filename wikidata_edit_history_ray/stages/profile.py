"""Dataset profiling operators: exact distributed quantiles.

Exact quantiles of an integer-valued column without a global sort: the
classic VALUE-HISTOGRAM reduction. Per-block `value_counts` partials ->
one (value, count) groupby-sum shuffle (cardinality = distinct values of the
column, e.g. a few thousand for document lengths — bytes, not terabytes) ->
the tiny histogram sorts on the driver and a cumulative-count walk reads the
quantiles off exactly. No sampling error (t-digest/GK sketches trade
accuracy for the cases where the value domain is unbounded floats; for
int-valued profile columns the histogram IS the exact answer at a fraction
of a sort's cost).

Definition (mirrors the oracle SQL verbatim): quantile(q) = the smallest
value v whose cumulative count >= ceil(q * N).
"""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def column_quantiles(ds, col: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99),
                     max_distinct: int = 4_000_000):
    """Dataset -> Dataset of (q float64, value int64), one row per quantile.

    `col` must be integer-valued — validated loudly up front (a float column
    would only fail later inside the partial pass's int64 cast, and the
    value-histogram approach is only exact/bounded for integer domains).
    The histogram is materialized in the object store and its cardinality
    checked against `max_distinct` BEFORE the driver pulls it: quantiles
    over an id-like unique column surface as a clear error, not a driver
    OOM. The only full pass is the per-block partial count."""
    import ray.data

    schema = ds.schema()
    if schema is None:
        # fully-empty upstream (a filter chain that dropped every row)
        # yields blocks with no schema at all — same contract as
        # pack_sequences: return the typed empty result
        return ray.data.from_arrow(pa.table({
            "q": pa.array([], type=pa.float64()),
            "value": pa.array([], type=pa.int64())}))
    col_type = schema.types[schema.names.index(col)]
    if not pa.types.is_integer(col_type):
        raise TypeError(
            f"column_quantiles needs an integer column; {col!r} is "
            f"{col_type} — the exact value-histogram reduction is only "
            f"bounded for integer domains (bucket or cast floats first)")

    def partial(batch: pa.Table) -> pa.Table:
        # nulls are ignored (quantiles of the present values — the SQL
        # COUNT(*) GROUP BY v convention would rank a NULL group; dropping
        # is the profile-friendly semantic and keeps the finish arithmetic
        # integer-clean)
        vc = pc.value_counts(pc.drop_null(batch.column(col)))
        return pa.table({
            "v": pc.cast(vc.field("values"), pa.int64()),
            "cnt": pc.cast(vc.field("counts"), pa.int64())})

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("v").sum("cnt").materialize()
    n_distinct = hist.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"column_quantiles({col!r}): {n_distinct} distinct values exceed "
            f"max_distinct={max_distinct} — the distinct-value histogram "
            f"would not fit the driver (is this an id-like column?); bucket "
            f"the values first or raise max_distinct explicitly")
    # distinct-value histogram: small (guarded) — driver-side finish
    rows = hist.take_all()
    if not rows:
        return ray.data.from_arrow(pa.table({
            "q": pa.array([], type=pa.float64()),
            "value": pa.array([], type=pa.int64())}))
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    cnts = np.array([r["sum(cnt)"] for r in rows], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    total = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        rank = math.ceil(q * total)
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(float(q))
        out_v.append(int(vals[min(idx, len(vals) - 1)]))
    return ray.data.from_arrow(pa.table({
        "q": pa.array(out_q, type=pa.float64()),
        "value": pa.array(out_v, type=pa.int64())}))


def grouped_quantiles(ds, col: str, group_col: str,
                      qs=(0.25, 0.5, 0.9)):
    """Exact per-group quantiles -> Dataset of (group_col, q, value).

    Same value-histogram reduction as `column_quantiles`, grouped: per-batch
    Arrow group_by partials -> one (group, value) groupby-sum shuffle
    (cardinality = groups x distinct values, not rows) -> per-group
    cumulative walk inside map_groups. The only corpus-sized pass is the
    partial count; every group's finish step sees only its own tiny
    histogram, so skewed group sizes cost nothing."""
    import math

    import pandas as pd

    schema = ds.schema()
    if schema is None:
        # schema-less fully-empty upstream (pack_sequences contract): the
        # group column's type is unknowable — string is the documented
        # placeholder for the zero-row result
        import ray.data
        return ray.data.from_arrow(pa.table({
            group_col: pa.array([], type=pa.string()),
            "q": pa.array([], type=pa.float64()),
            "value": pa.array([], type=pa.int64())}))
    col_type = schema.types[schema.names.index(col)]
    if not pa.types.is_integer(col_type):
        raise TypeError(
            f"grouped_quantiles needs an integer column; {col!r} is "
            f"{col_type} — the exact value-histogram reduction is only "
            f"bounded for integer domains (bucket or cast floats first)")

    def partial(batch: pa.Table) -> pa.Table:
        # null values ignored, same semantic as column_quantiles
        g = batch.select([group_col, col]) \
            .filter(pc.is_valid(batch.column(col))) \
            .group_by([group_col, col]).aggregate([([], "count_all")])
        return pa.table({
            "g": g.column(group_col),
            "v": pc.cast(g.column(col), pa.int64()),
            "cnt": pc.cast(g.column("count_all"), pa.int64())})

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["g", "v"]).sum("cnt")

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("v", kind="mergesort")
        cum = group["sum(cnt)"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = group["v"].to_numpy()
        rows = []
        for q in qs:
            rank = math.ceil(q * total)
            idx = int(np.searchsorted(cum, rank, side="left"))
            rows.append((group["g"].iloc[0], float(q),
                         int(vals[min(idx, len(vals) - 1)])))
        return pd.DataFrame(rows, columns=[group_col, "q", "value"])

    return hist.groupby("g").map_groups(finish, batch_format="pandas")
