"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k — numpy matmul per batch against a
  broadcast query matrix, merge per-batch candidates (the baseline).
- ivf_topk: IVF-style scale path — k-means coarse centroids (built on a
  sample), probe only the nearest partitions.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

# per-chunk element budget for the semdedup cluster scan's similarity
# temporaries (floats, ~32 MB) — module-level so tests can pin it down and
# exercise the chunked path on small planted clusters
_SCAN_CHUNK_ELEMS = 4_000_000


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _vec_matrix(col, dtype=np.float64) -> np.ndarray:
    """list<float> column -> (n, d) matrix WITHOUT the Python-float detour:
    when the lists are dense and uniform (the embedding-table invariant) the
    Arrow values buffer reshapes zero-copy (then one exact widening cast if
    the child type differs); nulls or ragged rows fall back to the list
    path. to_pylist()+np.array costs ~n x d Python float objects per batch —
    measured 6-10x slower than the buffer path at 4096 x 64."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, (pa.ListArray, pa.LargeListArray)) \
            and arr.null_count == 0 and len(arr):
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        widths = np.diff(offs)
        if (widths == widths[0]).all() and widths[0] > 0:
            vals = arr.values.to_numpy(zero_copy_only=False)
            mat = vals[offs[0]:offs[-1]].reshape(len(arr), int(widths[0]))
            return mat if mat.dtype == dtype else mat.astype(dtype)
    return np.array(arr.to_pylist(), dtype=dtype)


class BatchTopK:
    """map_batches actor: per-batch exact top-k against the broadcast query
    matrix; emits (query_idx, id, score) candidates only — k rows per query
    per batch, so the reduce side merges candidates, never raw vectors."""

    def __init__(self, query_matrix, k: int = 10, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        try:
            import ray

            if isinstance(query_matrix, ray.ObjectRef):
                query_matrix = ray.get(query_matrix)
        except ImportError:
            pass
        self.q = _normalize(np.asarray(query_matrix, dtype=np.float32))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        if not ids:
            return pa.table({"query_idx": pa.array([], type=pa.int64()),
                             self.id_col: pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        vecs = _normalize(_vec_matrix(batch.column(self.vec_col),
                                      dtype=np.float32))
        scores = self.q @ vecs.T  # (n_queries, n_batch)
        k = min(self.k, scores.shape[1])
        top_idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        out_q, out_id, out_s = [], [], []
        ids_arr = np.asarray(ids)
        for qi in range(scores.shape[0]):
            sel = top_idx[qi]
            out_q.extend([qi] * len(sel))
            out_id.extend(ids_arr[sel].tolist())
            out_s.extend(scores[qi, sel].tolist())
        return pa.table({"query_idx": pa.array(out_q, type=pa.int64()),
                         self.id_col: pa.array(out_id, type=pa.int64()),
                         "score": pa.array(out_s, type=pa.float64())})


def brute_force_topk(ds, query_matrix, k: int = 10, vec_col: str = "embedding",
                     id_col: str = "vec_id", concurrency=None):
    """Exact cosine top-k: map_batches candidates -> tiny global merge.

    Returns a Dataset of (query_idx, id, score), k rows per query.
    """
    # instance => task-based map_batches: the small query matrix ships in the
    # task spec, and no actor pool reserves CPUs away from the downstream
    # shuffle (an actor pool sized to the whole cluster can starve it)
    stage = BatchTopK(query_matrix=np.asarray(query_matrix, dtype=np.float32),
                      k=k, vec_col=vec_col, id_col=id_col)
    candidates = ds.map_batches(stage, batch_format="pyarrow",
                                concurrency=concurrency)

    def merge(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(group, sort_keys=[("score", "descending"),
                                                (id_col, "ascending")])
        return group.take(idx[:k])

    return candidates.groupby("query_idx").map_groups(
        merge, batch_format="pyarrow")


class IVFIndex:
    """Coarse k-means partitions for the scale path: assign each vector to its
    nearest centroid (one pass), store centroid id as a partition column; a
    query probes only nprobe partitions. Centroids are trained on a driver-side
    sample (small) and broadcast."""

    @staticmethod
    def train_centroids(sample_vecs: np.ndarray, n_centroids: int = 16,
                        iters: int = 10, seed: int = 0) -> np.ndarray:
        rng = np.random.RandomState(seed)
        X = _normalize(np.asarray(sample_vecs, dtype=np.float32))
        idx = rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)
        C = X[idx].copy()
        for _ in range(iters):
            assign = np.argmax(X @ C.T, axis=1)
            for c in range(len(C)):
                members = X[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
            C = _normalize(C)
        return C

    @staticmethod
    def assign_stage(centroids):
        C = _normalize(np.asarray(centroids, dtype=np.float32))

        def assign(batch: pa.Table, vec_col="embedding") -> pa.Table:
            vecs = _vec_matrix(batch.column(vec_col), dtype=np.float32)
            if len(vecs) == 0:
                return batch.append_column("ivf_cell", pa.array([], type=pa.int64()))
            cells = np.argmax(_normalize(vecs) @ C.T, axis=1).astype(np.int64)
            return batch.append_column("ivf_cell", pa.array(cells, type=pa.int64()))

        return assign


def _deterministic_sample(ds, id_col: str, sample_size: int):
    """Unbiased deterministic training sample: keep rows whose stable id hash
    falls under the sampling rate (NOT ds.limit(), which takes the FIRST rows
    and biases centroids on any sorted/clustered input)."""
    import hashlib

    total = ds.count()
    if total <= sample_size:
        return ds.take_all()
    rate = min(1.0, (2.0 * sample_size) / total)
    cutoff = int(rate * 0xFFFFFFFF)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        mask = pa.array([
            int.from_bytes(hashlib.sha1(str(v).encode()).digest()[:4],
                           "little") <= cutoff for v in ids])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow") \
        .limit(sample_size).take_all()


def ivf_topk(ds, query_matrix, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
             sample_size: int = 2000):
    """IVF approximate top-k: train centroids on a deterministic random
    sample, filter to the nprobe nearest cells per query union, then exact
    top-k within the probed subset. nprobe == n_centroids degenerates to the
    exact result (the oracle configuration)."""
    sample = _deterministic_sample(ds, id_col, sample_size)
    sample_vecs = np.array([r[vec_col] for r in sample], dtype=np.float32)
    C = IVFIndex.train_centroids(sample_vecs, n_centroids)
    assign = IVFIndex.assign_stage(C)
    ds_cells = ds.map_batches(lambda b: assign(b, vec_col), batch_format="pyarrow")

    q = _normalize(np.asarray(query_matrix, dtype=np.float32))
    probe_cells = set()
    cell_scores = q @ _normalize(C).T  # (nq, ncentroids)
    for qi in range(len(q)):
        top = np.argsort(-cell_scores[qi])[:nprobe]
        probe_cells.update(int(c) for c in top)

    probed = ds_cells.filter(
        expr=f"ivf_cell in {sorted(probe_cells)}")
    return brute_force_topk(probed, query_matrix, k=k, vec_col=vec_col,
                            id_col=id_col)


# ---------------------------------------------------------------------------
# k-means over the embedding column (SemDeDup-style corpus clustering)
# ---------------------------------------------------------------------------

def _k_lowest_id_vectors(ds, k: int, vec_col: str, id_col: str) -> np.ndarray:
    """The k lowest-id vectors as a (k, d) float64 matrix — the
    deterministic, SQL-restatable centroid seed. Scale shape: per-batch
    local min-k candidates, then one driver merge over k x blocks rows
    (never a global sort of the corpus)."""
    import pyarrow.compute as pc

    def local_mink(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, vec_col])
        order = pc.sort_indices(t.column(id_col))[:k]
        return t.take(order)

    cand = ds.map_batches(local_mink, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: r[id_col])
    if not cand:
        raise ValueError(
            "k-means centroid seeding needs at least one vector; the input "
            "dataset is empty")
    # fewer vectors than k: every vector is its own centroid (standard
    # k-means degeneracy) — callers must size cluster arrays to len(C),
    # not the requested k
    return np.array([r[vec_col] for r in cand[:k]], dtype=np.float64)


def _nearest_centroid(X: np.ndarray, C: np.ndarray, rows_per_chunk=None):
    """(argmin cluster, its squared L2 dist) per row via the EXACT
    sum((x-c)^2) form — the expanded |x|^2 - 2xC + |c|^2 form changes the
    float rounding and can flip near-tie argmins vs the SQL oracle. Row
    CHUNKING is float-transparent (each row's arithmetic is independent)
    and caps the (rows, k, d) broadcast temp at ~32 MB: one un-chunked
    4096-row batch against 256 centroids allocates a 537 MB temp, which
    this host's memory bus punishes far beyond the flop cost."""
    n, d = X.shape
    if rows_per_chunk is None:
        rows_per_chunk = max(1, 4_000_000 // max(1, len(C) * d))
    cluster = np.empty(n, dtype=np.int64)
    dist = np.empty(n, dtype=np.float64)
    for s in range(0, n, rows_per_chunk):
        e = min(n, s + rows_per_chunk)
        d2 = ((X[s:e, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        cluster[s:e] = a
        dist[s:e] = d2[np.arange(e - s), a]
    return cluster, dist


def kmeans_assign(ds, centroids=None, k: int = 8, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """One Lloyd ASSIGNMENT step: nearest centroid per vector by squared L2
    distance -> Dataset of (id_col, cluster, dist) — the partitioning
    primitive behind SemDeDup-style semantic dedup and clustered data
    mixing. `centroids` defaults to the k lowest-id vectors (deterministic
    and exactly restatable in SQL, so the step hard-oracles); ties go to the
    lowest centroid index on both sides.

    100-TB shape: the (k, d) centroid matrix is the ONLY side state —
    broadcast once (task-spec capture, same as BatchTopK) — and the corpus
    streams through one map_batches; distances are one vectorized
    (n, k, d) reduction per batch. No shuffle at all. `dist` is a raw
    double; round it when comparing against a SQL restatement (summation
    order differs)."""
    if centroids is None:
        centroids = _k_lowest_id_vectors(ds, k, vec_col, id_col)
    C = np.asarray(centroids, dtype=np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if batch.num_rows == 0:
            return pa.table({id_col: ids,
                             "cluster": pa.array([], type=pa.int64()),
                             "dist": pa.array([], type=pa.float64())})
        X = _vec_matrix(batch.column(vec_col))
        cluster, dist = _nearest_centroid(X, C)
        return pa.table({
            id_col: ids,
            "cluster": pa.array(cluster),
            "dist": pa.array(dist, type=pa.float64())})

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_fit(ds, k: int = 8, iters: int = 5, vec_col: str = "embedding",
               id_col: str = "vec_id") -> np.ndarray:
    """Full distributed Lloyd loop -> (k, d) float64 centroids.
    Deterministic: seeds from the k lowest-id vectors; empty clusters keep
    their previous centroid.

    100-TB shape per iteration: centroids broadcast in the task spec, ONE
    streaming pass emits per-batch partial (cluster, sum, count) rows —
    k rows per batch, vectorized np.add.at — and the driver combines
    k x blocks tiny partials (bytes, not data). The corpus never shuffles;
    iteration count bounds total passes."""
    C = _k_lowest_id_vectors(ds, k, vec_col, id_col)
    k = len(C)  # fewer vectors than requested clusters: k degrades to n
    d = C.shape[1]

    for _ in range(iters):
        Cc = C  # capture by value per iteration

        def partials(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({
                    "cluster": pa.array([], type=pa.int64()),
                    "vsum": pa.array([], type=pa.list_(pa.float64())),
                    "n": pa.array([], type=pa.int64())})
            X = _vec_matrix(batch.column(vec_col))
            a, _ = _nearest_centroid(X, Cc)
            sums = np.zeros((len(Cc), X.shape[1]), dtype=np.float64)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=len(Cc)).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(len(Cc), dtype=np.int64)),
                "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
                "n": pa.array(counts)})

        rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["vsum"], dtype=np.float64)
            counts[r["cluster"]] += r["n"]
        nz = counts > 0
        C = C.copy()
        C[nz] = sums[nz] / counts[nz, None]
    return C


def semdedup(ds, k: int = 8, threshold: float = 0.9,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids=None):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup that
    bounds the quadratic pair comparison by k-means clustering — a vector is
    a semantic duplicate iff some LOWER-id vector in the SAME cluster has
    cosine similarity above `threshold` (the paper keeps one exemplar per
    tight semantic clique; lowest-id is the deterministic, SQL-restatable
    exemplar rule) -> Dataset of (id_col, cluster, is_dup 0/1).

    The cosine DECISION is taken on round(cos, 6) > threshold on both the
    engine and oracle sides: cos = dot / (|a| |b|) sums in different orders
    (numpy pairwise vs SQL sequential), so the raw doubles can differ by
    ~1 ulp; 6-decimal rounding makes the branch identical except when a pair
    sits within ~1e-12 of a rounding boundary (same convention as the
    kmeans_assign dist comparison).

    100-TB shape: the assignment pass streams (no shuffle, broadcast
    centroid matrix); then ONE groupby shuffle on the cluster id and a
    vectorized per-cluster normalized-matmul upper-triangle scan. Choose k
    proportional to corpus size (SemDeDup uses ~100k clusters at
    LAION scale) so a cluster — the only quadratic unit — fits a worker
    heap; skewed clusters are the operator's documented limit, mitigated by
    raising k."""
    if centroids is None:
        centroids = _k_lowest_id_vectors(ds, k, vec_col, id_col)
    C = np.asarray(centroids, dtype=np.float64)
    scan_chunk_elems = _SCAN_CHUNK_ELEMS  # bind at call time (test-pinnable)

    def assign_with_vec(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if batch.num_rows == 0:
            return pa.table({id_col: ids,
                             "cluster": pa.array([], type=pa.int64()),
                             vec_col: batch.column(vec_col)})
        X = _vec_matrix(batch.column(vec_col))
        cluster, _ = _nearest_centroid(X, C)
        return pa.table({
            id_col: ids,
            "cluster": pa.array(cluster),
            vec_col: batch.column(vec_col)})

    def cluster_scan(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        order = np.argsort(np.asarray(ids))
        X = _vec_matrix(group.column(vec_col))[order]
        ids_sorted = [ids[i] for i in order]
        norms = np.sqrt((X * X).sum(axis=1))
        n = len(ids_sorted)
        # dup[i] = any lower-id j with S[j, i] > threshold. The strict
        # upper triangle is scanned in COLUMN CHUNKS — columns [s, e)
        # against all rows below the diagonal, i.e. X[:e] — so a skewed
        # hot cluster streams through (n x chunk) temporaries bounded at
        # _SCAN_CHUNK_ELEMS floats (~32 MB) instead of materializing the
        # full c x c similarity matrix (a 1M-row cluster would be 8 TB).
        # Arithmetic per element is IDENTICAL to the unchunked
        # (X @ X.T) / outer(norms, norms): same d-length dot reduction,
        # same elementwise divide, so the round(.., 6) decision bits match
        # the oracle exactly.
        dup = np.zeros(n, dtype=np.int64)
        chunk = max(1, scan_chunk_elems // max(1, n))
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            S = np.round((X[:e] @ X[s:e].T)
                         / np.outer(norms[:e], norms[s:e]), 6)
            mask = np.arange(e)[:, None] < np.arange(s, e)[None, :]
            dup[s:e] = ((S > threshold) & mask).any(axis=0)
        id_type = group.schema.field(id_col).type
        return pa.table({
            id_col: pa.array(ids_sorted, type=id_type),
            "cluster": pa.array(
                [group.column("cluster")[0].as_py()] * len(X),
                type=pa.int64()),
            "is_dup": pa.array(dup)})

    return ds.map_batches(assign_with_vec, batch_format="pyarrow") \
        .groupby("cluster").map_groups(cluster_scan, batch_format="pyarrow")


def semdedup_filter(ds, k: int = 8, threshold: float = 0.9,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    centroids=None, broadcast_limit: int = 2_000_000,
                    buckets: int | None = None):
    """Row-keeping sibling of `semdedup` (same shape as the other dedup
    families' _filter variants): drop every semantic duplicate, return the
    surviving rows with ALL their columns — what a composed pipeline
    chains. The dup ids flow through the dual-path distributed anti-join
    (stages/distributed.filter_out_ids): broadcast below `broadcast_limit`,
    id-hash bucketed beyond."""
    from .distributed import filter_out_ids

    flags = semdedup(ds, k=k, threshold=threshold, vec_col=vec_col,
                     id_col=id_col, centroids=centroids)
    dup_ids = flags.filter(expr="is_dup == 1").select_columns([id_col])
    return filter_out_ids(ds, dup_ids, id_col, drop_col=id_col,
                          broadcast_limit=broadcast_limit, buckets=buckets)
