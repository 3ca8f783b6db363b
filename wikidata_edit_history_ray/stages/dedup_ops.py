"""Deduplication operators for training-data pipelines.

- exact_dedup:      hash-partitioned keep-first on a content hash
- minhash_lsh_dedup: shingle -> minhash -> LSH band buckets -> per-bucket
                     verify; groupby shuffles only (band, band_hash) keys
- simhash_dedup:    64-bit simhash, bucketed by rotated prefixes
- ngram_jaccard:    exact n-gram Jaccard verification for candidate pairs
- embedding_dedup:  cosine near-dup over an embedding column (bucket via
                    random-hyperplane LSH, verify by exact cosine)

All shuffles move only (key, id, sketch) columns — never full text — so at
100 TB the exchange volume is the sketch table, not the corpus.
"""
from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"\w+")


def _sha1_int(b: bytes) -> int:
    return int.from_bytes(hashlib.sha1(b).digest()[:8], "little")


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    return batch.append_column(
        out_col,
        pa.array([hashlib.sha1((t or "").encode("utf-8")).hexdigest() for t in texts],
                 type=pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                buckets: int = 64):
    """Keep the min-id row per exact content hash; deterministic tie-break.

    Shuffle key is a coarse hash bucket (all rows with one content hash share
    a bucket), and the per-bucket reducer is one vectorized pandas
    drop_duplicates — ~`buckets` reduce groups total instead of one group per
    distinct document, which is what keeps the reduce side cheap at corpus
    scale."""
    def hash_and_bucket(batch: pa.Table) -> pa.Table:
        out = add_content_hash(batch, text_col)
        hashes = out.column("content_hash").to_pylist()
        keys = np.fromiter((int(h[:8], 16) % buckets for h in hashes),
                           dtype=np.int64, count=len(hashes))
        return out.append_column("_bucket", pa.array(keys, type=pa.int64()))

    hashed = ds.map_batches(hash_and_bucket, batch_format="pyarrow")

    def keep_first(group):
        g = group.sort_values([("content_hash"), (id_col)])
        g = g.drop_duplicates(subset=["content_hash"], keep="first")
        return g.drop(columns=["_bucket"])

    return hashed.groupby("_bucket").map_groups(keep_first, batch_format="pandas")


# --------------------------------------------------------------------------
# minhash + LSH
# --------------------------------------------------------------------------

class MinHasher:
    """Stateful minhash signatures: permutation parameters generated once per
    actor (shared seed => identical across actors)."""

    def __init__(self, num_perm: int = 64, shingle_size: int = 3, seed: int = 1):
        rng = np.random.RandomState(seed)
        # 31-bit Mersenne prime modulus: a*h products stay inside int64
        self._mod = (1 << 31) - 1
        self.a = rng.randint(1, self._mod, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, self._mod, size=num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.shingle_size = shingle_size

    def shingles(self, text: str) -> np.ndarray:
        toks = _TOKEN_RE.findall((text or "").lower())
        k = self.shingle_size
        if len(toks) < k:
            grams = [" ".join(toks)] if toks else [""]
        else:
            grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        return np.fromiter((_sha1_int(g.encode()) & 0x7FFFFFFF for g in set(grams)),
                           dtype=np.int64)

    def signature(self, text: str) -> np.ndarray:
        h = self.shingles(text)
        if h.size == 0:
            return np.zeros(self.num_perm, dtype=np.int64)
        # (num_perm, n_shingles) affine hash, min over shingles — vectorized
        vals = (np.outer(self.a, h) + self.b[:, None]) % self._mod
        return vals.min(axis=1)


class MinHashStage:
    """map_batches actor: adds minhash signature + per-band bucket keys."""

    def __init__(self, num_perm=64, shingle_size=3, bands=16, text_col="text",
                 id_col="doc_id"):
        assert num_perm % bands == 0
        self.hasher = MinHasher(num_perm, shingle_size)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Explode each doc into `bands` rows of (id, minhash, bucket) — one
        row per LSH band — so candidate generation across ALL bands is a
        SINGLE groupby shuffle on `bucket`, not one shuffle per band."""
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        sigs = np.stack([self.hasher.signature(t) for t in texts]) if texts else \
            np.zeros((0, self.hasher.num_perm), dtype=np.int64)
        out_ids, out_sigs, out_buckets = [], [], []
        for i, doc_id in enumerate(ids):
            sig = sigs[i]
            for band in range(self.bands):
                seg = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                out_ids.append(doc_id)
                out_sigs.append(sig.tolist())
                out_buckets.append(
                    f"{band}:{hashlib.sha1(seg.tobytes()).hexdigest()[:16]}")
        return pa.table({
            self.id_col: pa.array(out_ids),
            "minhash": pa.array(out_sigs, type=pa.list_(pa.int64())),
            "bucket": pa.array(out_buckets, type=pa.string()),
        })


def minhash_lsh_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.8, concurrency=None):
    """Near-dup removal: docs sharing any LSH band bucket whose signature
    Jaccard >= threshold collapse to the min-id survivor.

    Shuffle shape: ONE groupby over the exploded (bucket, id, signature)
    sketch table — bands are encoded into the bucket key, so the exchange
    moves bands x (id + signature) bytes, never document text; verification
    happens inside each bucket group; the surviving-id set filters the
    original dataset in a final broadcast pass.
    """
    # instance => task-based stage (tiny permutation state ships per task;
    # avoids an actor pool reserving CPUs away from the groupby shuffle)
    sig_ds = ds.map_batches(
        MinHashStage(num_perm=num_perm, bands=bands, text_col=text_col,
                     id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency)

    def coarse_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column("bucket").to_pylist()
        coarse = np.fromiter((int(k.split(":", 1)[1][:8], 16) % 64 for k in keys),
                             dtype=np.int64, count=len(keys))
        return batch.append_column("_coarse", pa.array(coarse, type=pa.int64()))

    def bucket_losers(group):
        """Per coarse partition: for every LSH bucket inside it, verify
        signature-level Jaccard of each member against the min-id
        representative; emit ids to drop. One pandas pass over the partition,
        not one task per bucket."""
        import pandas as pd

        drops = []
        g = group.sort_values(["bucket", id_col])
        for _, bucket in g.groupby("bucket", sort=False):
            if len(bucket) < 2:
                continue
            sigs = np.stack(bucket["minhash"].to_numpy())
            ids = bucket[id_col].to_numpy()
            sim = (sigs[1:] == sigs[0]).mean(axis=1)
            drops.extend(ids[1:][sim >= jaccard_threshold])
        return pd.DataFrame({"drop_id": drops}).astype(
            {"drop_id": group[id_col].dtype})

    drops = sig_ds.map_batches(coarse_bucket, batch_format="pyarrow") \
        .groupby("_coarse").map_groups(bucket_losers, batch_format="pandas")
    drop_ids = set(r["drop_id"] for r in drops.take_all())

    def filter_dropped(batch: pa.Table) -> pa.Table:
        mask = pa.array([i not in drop_ids for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(filter_dropped, batch_format="pyarrow")


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """Classic 64-bit simhash over word tokens."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in _TOKEN_RE.findall((text or "").lower()):
        h = int.from_bytes(hashlib.sha1(tok.encode()).digest()[:8], "little")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
        acc += np.where(bits > 0, 1, -1)
    v = 0
    for i, x in enumerate(acc):
        if x > 0:
            v |= (1 << i)
    return v


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    hashes = [simhash64(t) for t in texts]
    return batch.append_column(
        "simhash", pa.array(np.array(hashes, dtype=np.uint64).astype(np.int64),
                            type=pa.int64()))


def _explode_simhash_blocks(batch: pa.Table, text_col: str, id_col: str,
                            n_blocks: int) -> pa.Table:
    """(id, simhash, bucket) rows — n_blocks block keys per doc: by
    pigeonhole, docs within Hamming distance n_blocks-1 share at least one
    block. Encoding the block index into the key makes candidate generation a
    single shuffle."""
    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col).to_pylist()
    hashes = np.array([simhash64(t) for t in texts], dtype=np.uint64)
    width = 64 // n_blocks
    mask = np.uint64((1 << width) - 1)
    out_ids, out_hash, out_bucket = [], [], []
    for blk in range(n_blocks):
        keys = (hashes >> np.uint64(blk * width)) & mask
        for i, doc_id in enumerate(ids):
            out_ids.append(doc_id)
            out_hash.append(int(hashes[i]))
            out_bucket.append((blk << width) | int(keys[i]))
    return pa.table({
        id_col: pa.array(out_ids),
        "simhash": pa.array(np.array(out_hash, dtype=np.uint64).astype(np.int64),
                            type=pa.int64()),
        "bucket": pa.array(out_bucket, type=pa.int64()),
    })


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3):
    """Near-dup removal by simhash: block-key buckets propose candidates in
    one groupby shuffle, exact Hamming distance verifies. Block count adapts
    to the Hamming budget (n_blocks = max_hamming + 1, pigeonhole guarantee);
    wider budgets mean shorter block keys => bigger buckets, the usual recall
    vs shuffle-fanout tradeoff."""
    n_blocks = min(8, max_hamming + 1)
    slim = ds.map_batches(
        lambda b: _explode_simhash_blocks(b, text_col, id_col, n_blocks),
        batch_format="pyarrow")

    def coarse(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column("bucket").to_pylist(), dtype=np.int64)
        return batch.append_column("_coarse", pa.array(keys % 64, type=pa.int64()))

    def bucket_losers(group):
        import pandas as pd

        drops = []
        g = group.sort_values(["bucket", id_col])
        for _, bucket in g.groupby("bucket", sort=False):
            if len(bucket) < 2:
                continue
            hashes = bucket["simhash"].to_numpy().astype(np.uint64)
            ids = bucket[id_col].to_numpy()
            x = hashes[1:] ^ hashes[0]
            dist = np.array([bin(int(v)).count("1") for v in x])
            drops.extend(ids[1:][dist <= max_hamming])
        return pd.DataFrame({"drop_id": drops}).astype(
            {"drop_id": group[id_col].dtype})

    drops = slim.map_batches(coarse, batch_format="pyarrow") \
        .groupby("_coarse").map_groups(bucket_losers, batch_format="pandas")
    drop_ids = set(r["drop_id"] for r in drops.take_all())

    def filter_dropped(batch: pa.Table) -> pa.Table:
        mask = pa.array([i not in drop_ids for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(filter_dropped, batch_format="pyarrow")


# --------------------------------------------------------------------------
# exact n-gram Jaccard (pair verification)
# --------------------------------------------------------------------------

def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    def grams(t):
        toks = _TOKEN_RE.findall((t or "").lower())
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    a, b = grams(text_a), grams(text_b)
    if not a and not b:
        return 1.0
    u = a | b
    return len(a & b) / len(u) if u else 0.0


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_dedup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                    cosine_threshold: float = 0.95, num_planes: int = 12,
                    seed: int = 7):
    """Near-dup over an embedding column: random-hyperplane LSH buckets, exact
    cosine verify per bucket, keep min-id."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float32)
        if vecs.size == 0:
            return batch.append_column("lsh_bucket", pa.array([], type=pa.int64()))
        rng = np.random.RandomState(seed)
        planes = rng.randn(vecs.shape[1], num_planes).astype(np.float32)
        bits = (vecs @ planes) > 0
        keys = bits.dot(1 << np.arange(num_planes)).astype(np.int64)
        return batch.append_column("lsh_bucket", pa.array(keys, type=pa.int64()))

    bds = ds.map_batches(add_bucket, batch_format="pyarrow")

    def coarse(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column("lsh_bucket").to_pylist(), dtype=np.int64)
        return batch.append_column("_coarse", pa.array(keys % 64, type=pa.int64()))

    def bucket_losers(group):
        import pandas as pd

        drops = []
        g = group.sort_values(["lsh_bucket", id_col])
        for _, bucket in g.groupby("lsh_bucket", sort=False):
            if len(bucket) < 2:
                continue
            vecs = np.stack(bucket[vec_col].to_numpy()).astype(np.float32)
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            vecs = vecs / norms[:, None]
            ids = bucket[id_col].to_numpy()
            sims = vecs[1:] @ vecs[0]
            drops.extend(ids[1:][sims >= cosine_threshold])
        return pd.DataFrame({"drop_id": drops}).astype(
            {"drop_id": group[id_col].dtype})

    drops = bds.select_columns([id_col, vec_col, "lsh_bucket"]) \
        .map_batches(coarse, batch_format="pyarrow") \
        .groupby("_coarse").map_groups(bucket_losers, batch_format="pandas")
    drop_ids = set(r["drop_id"] for r in drops.take_all())

    def filter_dropped(batch: pa.Table) -> pa.Table:
        mask = pa.array([i not in drop_ids for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(filter_dropped, batch_format="pyarrow")
