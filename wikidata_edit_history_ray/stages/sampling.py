"""Deterministic stratified sampling for training-data mixing: keep the k
rows with the lowest md5(id) per stratum (language, source, quality band...).

Hash-rank sampling is the standard reproducible sampler: the choice is a pure
function of the id, so reruns, resumes and different cluster shapes pick the
IDENTICAL sample, and the driver oracles it with a SQL window
(ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY md5(id)) <= k).

Distributed shape — partial top-k, then a tiny final merge:
1. block-local: keep at most k lowest-hash rows per stratum per block
   (vectorized pandas groupby.head after sort) — the shuffle moves at most
   k x strata x blocks slim rows, never the corpus;
2. one groupby shuffle on the stratum, final per-stratum head(k).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _id_norm_strs(ids) -> list:
    """Value-pure string forms of the ids every rank hash consumes: a null
    id raises loudly (hash-rank sampling of an unnamed row is meaningless,
    and silently hashing the COERCED block — pandas turns an int64 column
    float64 when any null is present — would make every OTHER id's hash
    depend on its block's null composition); integral floats normalize to
    the int form ('5', never '5.0') for the same reason, matching what
    DuckDB's md5(CAST(id AS VARCHAR)) produces for integer columns."""
    out = []
    for v in ids:
        if v is None or (isinstance(v, float) and v != v):
            raise ValueError(
                "rank hash: id column contains a null — hash-rank sampling "
                "needs a non-null id per row")
        if isinstance(v, float) and v.is_integer():
            out.append(str(int(v)))
        else:
            out.append(str(v))
    return out


def _md5_rank(ids) -> list:
    return [hashlib.md5(s.encode()).hexdigest() for s in _id_norm_strs(ids)]


def _fast_hash64(ids) -> np.ndarray:
    """Fast rank mode's 64-bit hash: integer ids go through pandas
    `hash_array`'s fully vectorized integer bit-mix (one C pass, no Python
    objects, deterministic fixed constants); strings go through the
    keyed-siphash object path. Pure function of the id VALUE: an int64
    block that pandas coerced to float64 (null padding) hashes through the
    SAME int path after an exact cast — and nulls / non-integral floats
    raise loudly, because either would make the dispatch (and so every
    hash) depend on block composition instead of the value. Not
    SQL-restatable (no siphash/bit-mix in DuckDB), which is why md5 stays
    the oracle-parity default. Measured (2M int64 ids, best-of-3): ~100x
    less CPU than per-row hashlib.md5 for the bucket/uniform consumers
    that use the hash directly; ~5x for the 16-byte rank-key path (bytes
    materialization dominates there)."""
    from pandas.util import hash_array

    arr = np.asarray(ids)
    if arr.dtype.kind in "iu":
        return hash_array(arr.astype(np.int64, copy=False)
                          .view(np.uint64), categorize=False)
    if arr.dtype.kind == "f":
        if np.isnan(arr).any():
            raise ValueError(
                "rank hash: id column contains a null — hash-rank sampling "
                "needs a non-null id per row")
        ints = arr.astype(np.int64)
        if not (ints == arr).all():
            raise ValueError(
                "fast rank mode needs integer or string ids; got "
                "non-integral float ids (use rank_mode='md5' or cast)")
        return hash_array(ints.view(np.uint64), categorize=False)
    s = np.array(_id_norm_strs(ids), dtype=object)
    return hash_array(s, hash_key="wdsamplerank0001", categorize=False)


def _fast_rank(ids) -> list:
    """16-byte big-endian (h1, h2) sort keys from two chained `_fast_hash64`
    mixes — BYTE order equals the numeric (h1, h2) order, so sort_values
    ranks them exactly like the md5 hex strings rank md5 values. The keys
    are materialized through numpy's S16 view (one C pass); S-dtype item
    access strips TRAILING null bytes, which is order-preserving and
    injective for fixed-width keys (the first differing byte of two
    same-length keys always survives the strip), and the keys are only ever
    compared, never re-parsed."""
    from pandas.util import hash_array

    m = len(ids)
    if m == 0:
        return []
    h1 = _fast_hash64(ids)
    h2 = hash_array(h1 ^ np.uint64(0x9E3779B97F4A7C15), categorize=False)
    data = np.empty((m, 2), dtype=">u8")
    data[:, 0] = h1
    data[:, 1] = h2
    return np.frombuffer(data.tobytes(), dtype="S16").tolist()


def _rank_fn(rank_mode: str):
    if rank_mode == "md5":
        return _md5_rank
    if rank_mode == "fast":
        return _fast_rank
    raise ValueError(f"rank_mode must be 'md5' (oracle-parity) or 'fast' "
                     f"(keyed siphash), got {rank_mode!r}")


_NULL_STRAT = "\x00<null>"


def _strat_keys(col) -> list:
    """String stratum keys derived from the ARROW column, BEFORE any pandas
    round-trip: Ray's sort-based groupby cannot shuffle a None among string
    keys (boundary computation compares None < str), so nulls map to a
    reserved sentinel. Deriving from Arrow makes the key a pure function of
    the VALUE — to_pandas turns an int64 stratum column float64 only in
    blocks that contain a null, so a pandas-derived key would stringify the
    same stratum as '5' in null-free blocks and '5.0' (or, above 2^53, a
    PRECISION-ROUNDED int) in null-containing ones, splitting one stratum
    into two groups. Arrow int64 values surface as exact Python ints
    regardless of null composition. Integral floats (a genuinely-float
    stratum column) still normalize to the int form so '5.0' and int 5
    stratify together across mixed-type corpora."""
    out = []
    for v in col.to_pylist():
        if v is None or (isinstance(v, float) and v != v):
            out.append(_NULL_STRAT)
        elif isinstance(v, float) and v.is_integer():
            out.append(str(int(v)))
        else:
            out.append(str(v))
    return out


def stratified_sample(ds, stratum_col: str, k: int, id_col: str = "doc_id",
                      rank_mode: str = "md5"):
    """Keep the k lowest-hash(id) rows per stratum; ties impossible (hash of
    distinct ids). Returns the full surviving rows. rank_mode='md5' (default)
    is the SQL-oracle-parity hash; 'fast' is the keyed-siphash kernel
    (same determinism contract, ~20x less hash CPU, different sample)."""
    rank = _rank_fn(rank_mode)

    def local_topk(batch: pa.Table) -> pa.Table:
        # ranks and stratum keys both derive from the ARROW columns (exact
        # Python values, no pandas null-composition coercion), then pandas
        # does the per-block sort+head; grouping on the sentinel key keeps
        # NULL strata as one group (SQL PARTITION BY semantics)
        batch = batch.append_column(
            "_sk", pa.array(_strat_keys(batch.column(stratum_col)),
                            type=pa.string()))
        rk = rank(batch.column(id_col).to_pylist())
        df = batch.to_pandas()
        df["_rk"] = rk
        df = df.sort_values(["_sk", "_rk"], kind="mergesort") \
            .groupby("_sk", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final_topk(group: pa.Table) -> pa.Table:
        # Arrow reduce: stable sort + head — the shuffled partials keep
        # their exact types, no pandas round-trip per group batch
        idx = pc.sort_indices(group, sort_keys=[("_rk", "ascending")])
        return group.take(idx[:k]).drop_columns(["_rk", "_sk"])

    return ds.map_batches(local_topk, batch_format="pyarrow") \
        .groupby("_sk").map_groups(final_topk, batch_format="pyarrow")


def hash_split(ds, id_col: str = "doc_id",
               bands=(("train", 90), ("val", 95), ("test", 100)),
               rank_mode: str = "md5"):
    """Deterministic train/val/test assignment: bucket = first 8 hex chars
    of md5(str(id)) mod 100, mapped through cumulative `bands` thresholds
    (name, upper_bound_exclusive-ish: bucket < bound). Adds a `split`
    column. Pure function of the id — reruns, resumes and any cluster
    shape produce the identical split; zero shuffle (one streaming
    map_batches). Oracle: the same md5-substring arithmetic in SQL.

    `bands` must have strictly increasing bounds ending >= 100 (every
    bucket 0-99 must land somewhere) — validated loudly up front, because
    an uncovered or out-of-order band table would otherwise surface as an
    opaque Arrow length error or a silently wrong split."""
    bounds = [b for _, b in bands]
    if bounds != sorted(bounds) or len(set(bounds)) != len(bounds):
        raise ValueError(f"hash_split bands must have strictly increasing "
                         f"bounds, got {bounds}")
    if bounds[-1] < 100:
        raise ValueError(f"hash_split bands must cover buckets 0-99: last "
                         f"bound {bounds[-1]} < 100")
    _rank_fn(rank_mode)  # validate loudly up front

    def _buckets_md5(ids):
        return [int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                % 100 for s in _id_norm_strs(ids)]

    def _buckets_fast(ids):
        # bucket = 64-bit fast hash mod 100 — the same pure-function-of-id
        # contract, one vectorized C pass; md5 stays the default because
        # DuckDB can restate it
        return (_fast_hash64(ids) % np.uint64(100)).astype(np.int64).tolist()

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        buckets = (_buckets_md5(ids) if rank_mode == "md5"
                   else _buckets_fast(ids))
        names = []
        for b in buckets:
            for name, bound in bands:
                if b < bound:
                    names.append(name)
                    break
        return batch.append_column("split", pa.array(names, type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def weighted_sample(ds, weight_col: str, k: int, id_col: str = "doc_id",
                    stratum_col: str | None = None,
                    rank_mode: str = "md5"):
    """Deterministic weighted sampling without replacement, the
    Efraimidis-Spirakis A-ES scheme (key = u^(1/w), keep the k largest keys)
    with the uniform u derived from md5(id) instead of a RNG:
        u = (int(md5(str(id))[:15 hex], 16) + 0.5) / 16^15   in (0, 1)
    so the selection is a pure function of (id, weight) — reruns, resumes
    and any cluster shape pick the IDENTICAL sample, and a SQL window
    (ORDER BY pow(u, 1.0/w) DESC) oracles it. Keys compute through C libm
    pow (math.pow) — the same libm DuckDB's POW calls, so the order is
    bit-identical on both sides. Per-`stratum_col` when given, else global.
    Weights must be strictly positive (validated loudly: a zero weight makes
    u^(1/w) degenerate and a negative one inverts the order).

    Distributed shape — identical to stratified_sample: block-local top-k
    per stratum (the shuffle moves at most k x strata x blocks slim rows),
    one groupby on the stratum, final per-stratum top-k."""
    import math

    _GLOBAL = "\x00all"
    strat = stratum_col if stratum_col is not None else "_stratum"
    _rank_fn(rank_mode)  # validate loudly up front

    def _us_md5(ids):
        return [(int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                 + 0.5) / 1152921504606846976.0
                for s in _id_norm_strs(ids)]  # 16^15

    def _us_fast(ids):
        # u = (64-bit fast hash + 0.5) / 2^64 — the same uniform-in-(0,1)
        # pure function of the id, one vectorized C pass; not
        # SQL-restatable, which is why md5 stays the oracle default
        return ((_fast_hash64(ids).astype(np.float64) + 0.5)
                / 18446744073709551616.0).tolist()

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ws = batch.column(weight_col).to_pylist()
        us = _us_md5(ids) if rank_mode == "md5" else _us_fast(ids)
        keys = []
        for v, w, u in zip(ids, ws, us):
            if w is None or not w > 0:
                raise ValueError(
                    f"weighted_sample: weight must be > 0, got {w!r} for "
                    f"{id_col}={v!r}")
            keys.append(math.pow(u, 1.0 / float(w)))
        out = batch.append_column("_wk", pa.array(keys, type=pa.float64()))
        if stratum_col is None:
            out = out.append_column(
                "_stratum", pa.array([_GLOBAL] * batch.num_rows,
                                     type=pa.string()))
        return out

    def local_topk(batch: pa.Table) -> pa.Table:
        t = add_key(batch)
        t = t.append_column(
            "_sk", pa.array(_strat_keys(t.column(strat)), type=pa.string()))
        df = t.to_pandas()
        df = df.sort_values(["_sk", "_wk", id_col],
                            ascending=[True, False, True],
                            kind="mergesort") \
            .groupby("_sk", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final_topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("_wk", "descending"),
                                                (id_col, "ascending")])
        drop = ["_wk", "_sk"] + (["_stratum"] if stratum_col is None else [])
        return group.take(idx[:k]).drop_columns(drop)

    return ds.map_batches(local_topk, batch_format="pyarrow") \
        .groupby("_sk").map_groups(final_topk, batch_format="pyarrow")


def corpus_mix(ds, group_col: str, targets: dict, total: int,
               id_col: str = "doc_id", rank_mode: str = "md5"):
    """Deterministic training-mix construction: draw a corpus of ~`total`
    rows matching the target group proportions — quota_g = floor(f_g * total)
    rows per group g, chosen as the quota_g lowest-md5(id) rows (the same
    reproducible hash-rank draw as stratified_sample, so reruns and any
    cluster shape build the IDENTICAL mix). Groups absent from `targets` are
    dropped; a group with fewer rows than its quota keeps all (the mix
    under-fills rather than re-weighting silently — the caller decides).
    Fractions must be positive and sum to <= 1 (validated loudly).

    Distributed shape: block-local per-group top-quota partials (the shuffle
    moves at most sum(quota_g) x blocks slim rows), one groupby on the
    group, final per-group head(quota)."""
    for g, f in targets.items():
        if not f > 0:
            raise ValueError(f"corpus_mix: target fraction for {g!r} must "
                             f"be > 0, got {f!r}")
    if sum(targets.values()) > 1 + 1e-9:
        raise ValueError(f"corpus_mix: target fractions sum to "
                         f"{sum(targets.values())} > 1")
    # round at the 9th decimal before flooring: 0.29 * 100 is
    # 28.999999999999996 in floats and a bare int() silently under-fills
    # the quota the docstring promises (floor of the REAL product)
    quotas = {g: int(round(f * total, 9)) for g, f in targets.items()}
    rank = _rank_fn(rank_mode)
    rk_type = pa.string() if rank_mode == "md5" else pa.binary()

    def _out_schema(in_schema: pa.Schema) -> pa.Schema:
        return in_schema.append(pa.field("_rk", rk_type))

    def local_topq(batch: pa.Table) -> pa.Table:
        # rank from the ARROW ids (exact values, no pandas coercion), then
        # the pandas per-block quota pass over the pre-filtered frame
        rk = rank(batch.column(id_col).to_pylist())
        df = batch.to_pandas()
        df["_rk"] = rk
        df = df[df[group_col].isin(quotas)]
        if not len(df):
            # a typed empty table — from_pandas on an all-filtered frame
            # types string columns as null and the block schemas diverge
            return _out_schema(batch.schema).empty_table()
        df = df.sort_values([group_col, "_rk"], kind="mergesort")
        rn = df.groupby(group_col, sort=False).cumcount()
        df = df[rn.values < df[group_col].map(quotas).values]
        return pa.Table.from_pandas(df, preserve_index=False) \
            .cast(_out_schema(batch.schema))

    def final_topq(group: pa.Table) -> pa.Table:
        q = quotas[group.column(group_col)[0].as_py()]
        idx = pc.sort_indices(group, sort_keys=[("_rk", "ascending")])
        return group.take(idx[:q]).drop_columns(["_rk"])

    out = ds.map_batches(local_topq, batch_format="pyarrow") \
        .groupby(group_col).map_groups(final_topq, batch_format="pyarrow")
    # when NO row matches any targeted group the groupby emits zero blocks
    # and the dataset loses its schema entirely (downstream select_columns
    # crashes) — union one typed empty block so an all-dropped mix still
    # carries (id, group, ...) types; the schema is known statically
    import ray.data

    schema = ds.schema()
    empty = ray.data.from_arrow(
        pa.schema(list(zip(schema.names, schema.types))).empty_table())
    return out.union(empty)


def epoch_shuffle(ds, id_col: str = "doc_id", seed: int = 0):
    """Deterministic global training order (the 'epoch shuffle' every
    pretraining run needs): epoch_pos = rank of h(id) where
        h = int(md5(f"{seed}:{id}")[:15 hex], 16)
    -> Dataset of (id_col, epoch_pos), 0-based, a permutation that is a pure
    function of (seed, id) — reruns, resumes and any cluster shape produce
    the identical order, a new seed produces a fresh epoch, and a SQL
    ROW_NUMBER window oracles it. Ties (60-bit h collisions — expected at
    trillion-doc scale) break on the id, so the order is total on both
    sides.

    Distributed shape — a global ordered prefix COUNT, the same three-pass
    pattern as pack_sequences' prefix sum: range-partition on h (md5 is
    uniform, so ranges balance by construction), ONE tiny per-range count
    aggregate -> driver running offsets (B rows, bytes), then per-range
    sort + local arange + broadcast offset. Only slim (h, id) rows move;
    the documents themselves never shuffle — consumers join or gather on
    the id."""
    import ray.data

    from .distributed import default_reduce_buckets

    num_ranges = default_reduce_buckets()
    scale = num_ranges / float(1 << 60)  # h is uniform in [0, 16^15)

    def add_rank(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = [int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:15], 16)
              for v in ids]
        rng = np.clip((np.array(hs, dtype=np.float64) * scale).astype(
            np.int64), 0, num_ranges - 1)
        return pa.table({
            id_col: batch.column(id_col),
            "_h": pa.array(hs, type=pa.int64()),
            "_range": pa.array(rng, type=pa.int64())})

    tagged = ds.select_columns([id_col]) \
        .map_batches(add_rank, batch_format="pyarrow").materialize()

    counts = {int(r["_range"]): int(r["count()"]) for r in
              tagged.groupby("_range").count().take_all()}
    offsets, acc = {}, 0
    for r in range(num_ranges):
        offsets[r] = acc
        acc += counts.get(r, 0)

    def finalize(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(group, sort_keys=[("_h", "ascending"),
                                                  (id_col, "ascending")])
        g = group.take(order)
        start = offsets[int(g.column("_range")[0].as_py())]
        pos = np.arange(start, start + g.num_rows, dtype=np.int64)
        return pa.table({id_col: g.column(id_col),
                         "epoch_pos": pa.array(pos)})

    return tagged.groupby("_range").map_groups(finalize,
                                               batch_format="pyarrow")
