"""Distributed connected components — duplicate-cluster canonicalization.

Near-dup dedup (minhash/simhash/embedding LSH) produces PAIR edges; turning
pairs into canonical clusters (every doc labeled with the min doc-id of its
duplicate cluster, one representative kept per cluster) is a connected-
components problem. This is min-label propagation WITH POINTER JUMPING:

  labels(node) := node                                -- every node its own id
  repeat:
    edge_cands := { (dst, label[src])    for each directed edge (src, dst) }
    jump_cands := { (node, label[label[node]]) for each node }   -- shortcut
    labels     := min per node of (labels ∪ edge_cands ∪ jump_cands)
  until no label changed

Plain propagation moves the min label ONE hop per round (rounds = component
diameter); the jump candidates chase the label chain label[label[node]],
which doubles the reach each round — convergence in O(log diameter) rounds
(a 100-hop chain converges in ~8), the same doubling trick as the
Kiveris et al. MapReduce CC family.

Each round is two hash-bucket shuffles of SLIM (node, label) / (src, dst)
rows — never document text — plus one tiny change-count aggregate, so at
100 TB the exchange volume is edge-set-sized, not corpus-sized. The bucket
count adapts to graph size (rows/50k clamped to [4, default]) so small
graphs don't pay big-shuffle fixed costs, while big graphs spread across
the cluster. Labels and the symmetrized edge table are materialized once
per round (they are endpoint-sized); bucket tags are computed once per
table and carried.

`max_iters` is a loud guard (raises, never silently truncates).

No reference analog — the reference deduplicates by SQL primary key only
(scripts/utils.py COPY/upsert); this operator is part of the training-data
canonicalization surface (SURVEY §9.1).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .distributed import _hash_bucket_array

# one reduce bucket per this many (node|edge) rows, so tiny graphs run in a
# handful of tasks and huge ones spread across the cluster
_ROWS_PER_BUCKET = 50_000


def _tag_bucket(batch: pa.Table, col: str, buckets: int,
                out: str = "bucket") -> pa.Table:
    return batch.append_column(
        out, _hash_bucket_array(batch.column(col).to_numpy(
            zero_copy_only=False), buckets))


def connected_components(nodes, edges, node_col: str = "node",
                         src_col: str = "src", dst_col: str = "dst",
                         buckets: int | None = None, max_iters: int = 30,
                         small_edge_limit: int = 1_000_000):
    """(nodes, edges) -> Dataset of (node_col, 'cluster_id').

    `nodes`: Dataset with a UNIQUE integer id column `node_col` (isolated
    nodes keep their own id as cluster_id). `edges`: Dataset with integer
    columns (src_col, dst_col) whose endpoints all appear in `nodes`;
    direction is ignored (symmetrized internally). cluster_id = min node id
    reachable through the undirected edge set.

    Edge sets up to `small_edge_limit` take the BROADCAST path: the slim
    (src, dst) pairs (16 MB at the 1M default) come to the driver, a
    union-find solves them in one pass, and only the non-singleton
    node->root map ships back through the object store for a streaming
    label assignment over `nodes` — the same small-side-broadcast economics
    as the dedup anti-joins, and the common case for LSH dup edges (a few
    percent of corpus rows). Bigger edge sets run the iterative
    min-label-propagation rounds; the corpus-sized `nodes` table streams in
    both paths.
    """
    import ray.data

    # ---- slim + int64-normalize the edge pairs once ------------------------
    def slim(batch: pa.Table) -> pa.Table:
        for c in (src_col, dst_col):
            t = batch.column(c).type
            if not (pa.types.is_integer(t) or pa.types.is_floating(t)):
                # loud: a string endpoint would otherwise surface as an
                # opaque ValueError deep inside the astype below — string
                # ids must be rank-mapped first (see dedup_ops.
                # _canonical_filter_from_edges for the order-preserving map)
                raise TypeError(
                    f"connected_components needs integer edge endpoints; "
                    f"{c!r} is {t} — map string ids to dense ints first")
        s = batch.column(src_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = batch.column(dst_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"src": pa.array(s), "dst": pa.array(d)})

    edges_raw = edges.map_batches(slim, batch_format="pyarrow").materialize()
    n_edges = edges_raw.count()

    if 0 < n_edges <= small_edge_limit:
        # un-symmetrized: the union-find needs each undirected edge once
        return _cc_broadcast(nodes, edges_raw, node_col)

    # ---- symmetrize for the iterative rounds -------------------------------
    def sym(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([s, d])),
                         "dst": pa.array(np.concatenate([d, s]))})

    edges_sym = edges_raw.map_batches(sym, batch_format="pyarrow")

    if buckets is None:
        # sized by graph rows, not cluster: tiny graphs run in 4 tasks with
        # near-zero shuffle fixed cost; a 100M-node graph gets ~2000 buckets
        # of ~50k slim rows each — enough parallelism for any cluster
        n_nodes = nodes.count()
        buckets = min(4096, max(4, max(n_nodes, n_edges) // _ROWS_PER_BUCKET))

    edges_sym = edges_sym.map_batches(
        lambda b: _tag_bucket(b, "src", buckets),
        batch_format="pyarrow").materialize()

    # ---- init labels: every node its own label, bucketed by node ----------
    def init_labels(batch: pa.Table) -> pa.Table:
        n = batch.column(node_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = pa.table({"node": pa.array(n, type=pa.int64()),
                      "label": pa.array(n, type=pa.int64())})
        return _tag_bucket(t, "node", buckets)

    labels = nodes.map_batches(init_labels, batch_format="pyarrow") \
        .materialize()

    if n_edges == 0:
        out = labels.select_columns(["node", "label"])
        return _rename(out, node_col)

    for it in range(max_iters):
        labels, changed = _propagate_round(labels, edges_sym, buckets)
        if changed == 0:
            out = labels.select_columns(["node", "label"])
            return _rename(out, node_col)
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        f"component diameter exceeds 2^max_iters reach; raise max_iters "
        f"(results are never silently truncated)")


def _cc_broadcast(nodes, edges_raw, node_col: str):
    """Small-edge-set path: driver union-find over the slim UN-symmetrized
    pair table (each undirected edge once), broadcast of the non-singleton
    node->root map, streaming assignment."""
    import ray

    pairs = edges_raw.to_pandas()
    src = pairs["src"].to_numpy(dtype=np.int64)
    dst = pairs["dst"].to_numpy(dtype=np.int64)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    remap_n, remap_r = [], []
    for n in set(src.tolist()) | set(dst.tolist()):
        r = find(n)
        if r != n:
            remap_n.append(n)
            remap_r.append(r)
    order = np.argsort(np.asarray(remap_n, dtype=np.int64))
    map_ref = ray.put(pa.table({
        "n": pa.array(np.asarray(remap_n, dtype=np.int64)[order]),
        "r": pa.array(np.asarray(remap_r, dtype=np.int64)[order])}))

    def assign(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)  # zero-copy from the local object store
        keys = m.column("n").to_numpy(zero_copy_only=False)
        roots = m.column("r").to_numpy(zero_copy_only=False)
        nv = batch.column(node_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(keys) == 0:
            lbl = nv
        else:
            idx = np.searchsorted(keys, nv)
            idxc = np.minimum(idx, len(keys) - 1)
            hit = keys[idxc] == nv
            lbl = np.where(hit, roots[idxc], nv)
        return pa.table({node_col: batch.column(node_col),
                         "cluster_id": pa.array(lbl, type=pa.int64())})

    return nodes.map_batches(assign, batch_format="pyarrow")


def _rename(ds, node_col: str):
    def fix(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: batch.column("node"),
                         "cluster_id": batch.column("label")})
    return ds.map_batches(fix, batch_format="pyarrow")


def _propagate_round(labels, edges_sym, buckets: int):
    """One CC round. Shuffle 1 co-buckets three row kinds on the lookup key
    (edge src / label's node / jump target = current label): per bucket,
    map key -> label and emit min-combined candidates keyed by the receiving
    node. Shuffle 2 min-combines candidates with the current labels per
    node. Returns (new labels materialized, #changed)."""
    import ray.data
    from ray.data.aggregate import Sum

    # kind 0: edge (a=src lookup key, b=dst receiver), bucket by a
    # kind 1: label (a=node, b=label) — both the lookup table per bucket
    #         AND its own carrier between rounds
    # kind 2: jump request (a=current label lookup key, b=node receiver),
    #         bucket by a — resolves to label[label[node]]
    def tag_kind_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"bucket": batch.column("bucket"),
                         "a": batch.column("src"),
                         "b": batch.column("dst"),
                         "kind": pa.array(
                             np.zeros(batch.num_rows, dtype=np.int8))})

    def tag_kind_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"bucket": batch.column("bucket"),
                         "a": batch.column("node"),
                         "b": batch.column("label"),
                         "kind": pa.array(
                             np.ones(batch.num_rows, dtype=np.int8))})

    def tag_kind_jumps(batch: pa.Table) -> pa.Table:
        t = pa.table({"a": batch.column("label"),
                      "b": batch.column("node"),
                      "kind": pa.array(
                          np.full(batch.num_rows, 2, dtype=np.int8))})
        return _tag_bucket(t, "a", buckets)

    unioned = edges_sym.map_batches(tag_kind_edges, batch_format="pyarrow") \
        .union(labels.map_batches(tag_kind_labels, batch_format="pyarrow")) \
        .union(labels.map_batches(tag_kind_jumps, batch_format="pyarrow"))

    def propagate(group: pd.DataFrame) -> pd.DataFrame:
        lab = group[group["kind"] == 1]
        req = group[group["kind"] != 1]  # edges and jumps resolve the same
        if len(req) == 0 or len(lab) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "cand": pd.Series([], dtype="int64")})
        m = req.merge(lab[["a", "b"]].rename(
            columns={"a": "key", "b": "lbl"}),
            left_on="a", right_on="key", how="inner")
        if len(m) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "cand": pd.Series([], dtype="int64")})
        # pre-combine inside the bucket: one candidate row per receiver
        out = m.groupby("b", sort=False)["lbl"].min().reset_index()
        return pd.DataFrame({"node": out["b"].astype("int64"),
                             "cand": out["lbl"].astype("int64")})

    cands = unioned.groupby("bucket").map_groups(
        propagate, batch_format="pandas")

    # shuffle 2: candidates (re-bucket by node) + old labels -> min per node
    def tag_cands(batch: pa.Table) -> pa.Table:
        t = pa.table({"node": batch.column("node"),
                      "lbl": batch.column("cand"),
                      "is_old": pa.array(
                          np.zeros(batch.num_rows, dtype=np.int8))})
        return _tag_bucket(t, "node", buckets)

    def tag_old(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "lbl": batch.column("label"),
                         "is_old": pa.array(
                             np.ones(batch.num_rows, dtype=np.int8)),
                         "bucket": batch.column("bucket")})

    merged = cands.map_batches(tag_cands, batch_format="pyarrow") \
        .union(labels.map_batches(tag_old, batch_format="pyarrow"))

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("node", sort=False)
        new = g["lbl"].min()
        old = group[group["is_old"] == 1].set_index("node")["lbl"]
        old = old.reindex(new.index)
        changed = (new < old).astype("int64")
        out = new.reset_index()
        out.columns = ["node", "label"]
        out["changed"] = changed.to_numpy()
        return out

    new_labels = merged.groupby("bucket").map_groups(
        combine, batch_format="pandas")

    def retag(batch: pa.Table) -> pa.Table:
        t = pa.table({"node": batch.column("node"),
                      "label": batch.column("label"),
                      "changed": batch.column("changed")})
        return _tag_bucket(t, "node", buckets)

    # repartition bounds the label block count at `buckets` — without it the
    # unions compound block counts ~3x per round (4 -> 13 -> 40 -> 121 ...)
    # and round latency grows with the accumulated tiny blocks
    new_labels = new_labels.map_batches(
        retag, batch_format="pyarrow").repartition(buckets).materialize()
    changed = new_labels.aggregate(Sum("changed", alias_name="c"))["c"] or 0
    # the `changed` column rides along (next round's taggers only read
    # node/label/bucket; the final select_columns drops it) — stripping it
    # would cost a second materialize per round
    return new_labels, int(changed)
