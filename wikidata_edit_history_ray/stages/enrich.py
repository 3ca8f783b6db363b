"""Second-pass enrichment stages (operators J3, J4, ML1, ML2).

Actor-pool `map_batches` classes: heavy read-only state (closure index, label
dictionary, embedding model) loads once per actor in __init__; __call__ is
vectorized over the batch. Replaces the reference's DB-paged batch loop
(scripts/feature_creation.py:1207-1466) with a streaming Dataset pass:

    read(features_entity) -> map_batches(EntityFeatureEnricher, concurrency=N)
                          -> write back

The embedding model: the reference uses SentenceTransformer all-MiniLM-L6-v2
(scripts/feature_creation.py:1248). That library is not in this container, so
`HashingEmbedder` is a deterministic stand-in producing stable unit vectors
from token hashes (the Ray-side plumbing — batched encode, cosine per pair —
is the real, tested component; swap the embedder class in production).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..core import features as F
from ..state.closure import TransitiveClosureCache


class HashingEmbedder:
    """Deterministic token-hash embedding: encode(list[str]) -> (n, dim) unit
    vectors. Stable across processes (sha1-based, no Python hash salt)."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def encode(self, texts, batch_size: int = 512) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            for tok in str(t).lower().split():
                h = hashlib.sha1(tok.encode("utf-8")).digest()
                idx = int.from_bytes(h[:4], "little") % self.dim
                sign = 1.0 if h[4] % 2 else -1.0
                out[i, idx] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms


class SentenceTransformerEmbedder:
    """ML1 with a real model (reference: SentenceTransformer
    'all-MiniLM-L6-v2', GPU if available, encode batch 512 —
    scripts/feature_creation.py:62, 87, 1248). The library is absent from
    this container, so construction raises ImportError here; the spec string
    plumbs through actor constructors unchanged, and on a cluster with the
    package + `num_gpus` the same pipeline runs the real model."""

    def __init__(self, model_name: str = "all-MiniLM-L6-v2",
                 batch_size: int = 512, device: str | None = None):
        from sentence_transformers import SentenceTransformer  # ImportError here if absent

        self.model = SentenceTransformer(model_name, device=device)
        self.batch_size = batch_size

    def encode(self, texts, batch_size: int | None = None) -> np.ndarray:
        return np.asarray(self.model.encode(
            list(texts), batch_size=batch_size or self.batch_size,
            normalize_embeddings=True), dtype=np.float32)


def make_embedder(spec=None):
    """Resolve an embedder from a config spec — the injection point for ML1.

    None / 'hashing' / 'hashing:<dim>' -> HashingEmbedder (container default);
    'st:<model-name>' -> SentenceTransformerEmbedder; a class -> instantiated;
    an object with .encode -> used as-is."""
    if spec is None or spec == "hashing":
        return HashingEmbedder()
    if isinstance(spec, str):
        if spec.startswith("hashing:"):
            return HashingEmbedder(dim=int(spec.split(":", 1)[1]))
        if spec.startswith("st:"):
            return SentenceTransformerEmbedder(model_name=spec.split(":", 1)[1])
        raise ValueError(f"unknown embedder spec: {spec!r}")
    if isinstance(spec, type):
        return spec()
    if hasattr(spec, "encode"):
        return spec
    raise ValueError(f"unknown embedder spec: {spec!r}")


def _pairwise_cosine(model, old_texts, new_texts) -> np.ndarray:
    """Cosine per (old, new) pair, encoding each UNIQUE text once — labels
    repeat heavily across a batch, and with a real model (ML1) the encode is
    the dominant cost, so dedup-then-gather is the scale lever."""
    old_texts, new_texts = list(old_texts), list(new_texts)
    uniq: dict = {}
    for t in old_texts:
        uniq.setdefault(t, len(uniq))
    for t in new_texts:
        uniq.setdefault(t, len(uniq))
    embs = model.encode(list(uniq))
    a = embs[np.fromiter((uniq[t] for t in old_texts), dtype=np.int64,
                         count=len(old_texts))]
    b = embs[np.fromiter((uniq[t] for t in new_texts), dtype=np.int64,
                         count=len(new_texts))]
    return (a * b).sum(axis=1)


class TextFeatureEnricher:
    """ML1 for features_text: fills value_cosine_similarity from batched
    old/new value embeddings (reference: scripts/feature_creation.py:29-121)."""

    def __init__(self, embedder=None):
        self.model = make_embedder(embedder)

    def __call__(self, batch: pa.Table) -> pa.Table:
        old = [str(v).replace('"', "") for v in batch.column("old_value").to_pylist()]
        new = [str(v).replace('"', "") for v in batch.column("new_value").to_pylist()]
        sims = _pairwise_cosine(self.model, old, new) if len(old) else np.array([])
        i = batch.schema.get_field_index("value_cosine_similarity")
        return batch.set_column(i, "value_cosine_similarity",
                                pa.array(sims, type=pa.float64()))


class EntityFeatureEnricher:
    """ML2 + J3 + J4 for features_entity: label/description lookup, label text
    features, 8 transitive-closure probes, is_link_change, label/description
    embedding cosines (reference: scripts/feature_creation.py:804-846,
    1320-1356, 1359-1466)."""

    def __init__(self, closure_dir: str | None = None, entity_labels=None,
                 embedder=None, closure_cache=None,
                 prefilled_labels: bool = False):
        # prefilled_labels: the label/description columns were already filled
        # by an upstream partitioned hash join (enrich_entity_features_partitioned)
        # — skip the broadcast-dict lookup and read them from the batch
        self.prefilled_labels = prefilled_labels
        if closure_cache is not None:
            self.closure = closure_cache if isinstance(closure_cache, TransitiveClosureCache) \
                else TransitiveClosureCache(closure_cache)
        elif closure_dir:
            self.closure = TransitiveClosureCache.from_csv_dir(closure_dir)
        else:
            self.closure = TransitiveClosureCache()
        labels = entity_labels
        try:
            import ray

            if isinstance(labels, ray.ObjectRef):
                labels = ray.get(labels)
        except ImportError:
            pass
        self.entity_labels = labels or {}  # {qid: (label, description)}
        self.model = make_embedder(embedder)

    def _lookup(self, serialized_qid):
        q = str(serialized_qid).replace('"', "")
        return self.entity_labels.get(q, ("", ""))

    def __call__(self, batch: pa.Table) -> pa.Table:
        old_vals = batch.column("old_value").to_pylist()
        new_vals = batch.column("new_value").to_pylist()
        n = len(old_vals)

        if self.prefilled_labels:
            old_labels = [v or "" for v in batch.column("old_value_label").to_pylist()]
            new_labels = [v or "" for v in batch.column("new_value_label").to_pylist()]
            old_descs = [v or "" for v in batch.column("old_value_description").to_pylist()]
            new_descs = [v or "" for v in batch.column("new_value_description").to_pylist()]
        else:
            old_labels, new_labels, old_descs, new_descs = [], [], [], []
        closure_cols = {name: [] for name in (
            "old_value_subclass_new_value", "new_value_subclass_old_value",
            "old_value_located_in_new_value", "new_value_located_in_old_value",
            "old_value_has_parts_new_value", "new_value_has_parts_old_value",
            "old_value_part_of_new_value", "new_value_part_of_old_value")}
        text_feats = {name: [] for name in (
            "token_overlap", "old_in_new", "new_in_old", "edit_distance_ratio",
            "complete_replacement")}
        is_link_change = []

        for idx, (ov, nv) in enumerate(zip(old_vals, new_vals)):
            if self.prefilled_labels:
                ol, od = old_labels[idx], old_descs[idx]
                nl, nd = new_labels[idx], new_descs[idx]
            else:
                ol, od = self._lookup(ov)
                nl, nd = self._lookup(nv)
                old_labels.append(ol)
                new_labels.append(nl)
                old_descs.append(od)
                new_descs.append(nd)
            t = F.create_text_features("entity", ol, nl)
            for name, v in zip(text_feats, t):
                text_feats[name].append(v)
            c = self.closure
            closure_cols["old_value_subclass_new_value"].append(c.check(ov, nv, "subclass_transitive"))
            closure_cols["new_value_subclass_old_value"].append(c.check(nv, ov, "subclass_transitive"))
            closure_cols["old_value_located_in_new_value"].append(c.check(ov, nv, "located_in_transitive"))
            closure_cols["new_value_located_in_old_value"].append(c.check(nv, ov, "located_in_transitive"))
            closure_cols["old_value_has_parts_new_value"].append(c.check(ov, nv, "has_part_transitive"))
            closure_cols["new_value_has_parts_old_value"].append(c.check(nv, ov, "has_part_transitive"))
            closure_cols["old_value_part_of_new_value"].append(c.check(ov, nv, "part_of_transitive"))
            closure_cols["new_value_part_of_old_value"].append(c.check(nv, ov, "part_of_transitive"))
            is_link_change.append(int((ol == nl) and (ov != nv)))

        if n:
            label_cos = _pairwise_cosine(self.model, old_labels, new_labels)
            desc_cos = _pairwise_cosine(self.model, old_descs, new_descs)
        else:
            label_cos = desc_cos = np.array([])

        def set_col(table, name, values, typ):
            i = table.schema.get_field_index(name)
            return table.set_column(i, name, pa.array(values, type=typ))

        out = batch
        for name, vals in text_feats.items():
            typ = pa.float64() if name in ("token_overlap", "edit_distance_ratio") else pa.int64()
            out = set_col(out, name, vals, typ)
        for name, vals in closure_cols.items():
            out = set_col(out, name, vals, pa.int64())
        out = set_col(out, "is_link_change", is_link_change, pa.int64())
        out = set_col(out, "old_value_label", old_labels, pa.string())
        out = set_col(out, "new_value_label", new_labels, pa.string())
        out = set_col(out, "old_value_description", old_descs, pa.string())
        out = set_col(out, "new_value_description", new_descs, pa.string())
        out = set_col(out, "label_cosine_similarity", label_cos, pa.float64())
        out = set_col(out, "description_cosine_similarity", desc_cos, pa.float64())
        return out


def enrich_entity_features(ds, closure_dir=None, entity_labels=None,
                           concurrency=None, batch_size: int = 4096,
                           embedder=None, num_gpus=None):
    """features_entity Dataset -> enriched Dataset (actor pool: the closure
    index + label dict + embedding model load once per actor).

    `embedder` is a make_embedder() spec — e.g. 'st:all-MiniLM-L6-v2' with
    num_gpus=1 reproduces the reference's GPU model configuration
    (scripts/feature_creation.py:62, 87, 1248); the container default is the
    deterministic HashingEmbedder."""
    import ray

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, ncpu // 2))
    labels_ref = ray.put(entity_labels or {})
    kwargs = {}
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return ds.map_batches(
        EntityFeatureEnricher,
        fn_constructor_kwargs=dict(closure_dir=closure_dir,
                                   entity_labels=labels_ref,
                                   embedder=embedder),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
        **kwargs)


def enrich_text_features(ds, concurrency=None, batch_size: int = 4096,
                         embedder=None, num_gpus=None):
    """features_text Dataset -> Dataset with value_cosine_similarity filled."""
    kwargs = {}
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    if concurrency:
        return ds.map_batches(TextFeatureEnricher,
                              fn_constructor_kwargs=dict(embedder=embedder),
                              batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency,
                              **kwargs)
    return ds.map_batches(TextFeatureEnricher(embedder=embedder),
                          batch_format="pyarrow", batch_size=batch_size,
                          **kwargs)


# ---------------------------------------------------------------------------
# J3 at scale: partitioned entity-label hash join.
#
# The broadcast-dict path above assumes the label dimension fits a worker
# heap; full Wikidata has ~100M entity labels (reference loads them from a DB
# table, scripts/feature_creation.py:1320-1356). Here the dimension is
# hash-partitioned by QID once (a cheap one-time layout job), and each
# enrichment pass co-partitions the FEATURE rows on the same hash so a task
# ever holds exactly one label bucket — memory per task = dimension/buckets,
# independent of total dimension size. Two passes (old side, new side: a row
# probes two keys), then the standard enricher runs with prefilled labels.
# ---------------------------------------------------------------------------

_LABEL_BUCKET_CACHE: dict = {}


def _qid_bucket(serialized_qid, buckets: int) -> int:
    q = str(serialized_qid).replace('"', "")
    d = hashlib.sha1(q.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "little") % buckets


def partition_entity_labels(labels, out_dir: str, buckets: int = 32) -> str:
    """Lay the label dimension out as hash(qid)-partitioned parquet — a Ray
    pipeline, not a driver loop: bucket-tag via map_batches, then one
    groupby-bucket task per bucket sorts and writes its file. Driver heap
    stays flat at any dimension size (the reference's full dimension is ~100M
    labels, scripts/feature_creation.py:1320-1356).

    `labels`: a Ray Dataset or Arrow table with columns
    (qid, label, description), or a {qid: (label, description)} dict (small
    dimensions / tests). `out_dir` is a bare path or any pyarrow FileSystem
    URI (file://, s3://) every node can reach — same contract as the
    multi-sink (stages/extract.resolve_filesystem).

    Each run writes into a UNIQUE run-token subdirectory of `out_dir` and
    RETURNS that subdirectory — callers must use the return value as their
    labels_dir. This versions the layout: long-lived workers cache buckets
    keyed on (labels_dir, bucket), so re-laying the dimension into the same
    directory in a live cluster would let workers that already cached a
    bucket keep serving the previous run's labels (deleting files only helps
    workers that have not cached yet). A fresh directory per run makes every
    cache key run-unique. Old run directories are left in place — a running
    pipeline may still read them; prune retired runs externally. A run that
    dies mid-write leaves a token directory that is never returned, hence
    never read."""
    import uuid

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from .extract import resolve_filesystem

    if isinstance(labels, dict):
        ds = ray.data.from_arrow(pa.table({
            "qid": pa.array(list(labels), type=pa.string()),
            "label": pa.array([v[0] or "" for v in labels.values()],
                              type=pa.string()),
            "description": pa.array([v[1] or "" for v in labels.values()],
                                    type=pa.string()),
        }))
    elif isinstance(labels, pa.Table):
        ds = ray.data.from_arrow(labels)
    else:
        ds = labels
    run_rel = f"run-{uuid.uuid4().hex[:12]}"
    fs, base = resolve_filesystem(out_dir)
    run_path = f"{base.rstrip('/')}/{run_rel}"
    fs.create_dir(run_path, recursive=True)
    run_uri = f"{out_dir.rstrip('/')}/{run_rel}"

    def tag(batch: pa.Table) -> pa.Table:
        qids = batch.column("qid").to_pylist()
        arr = np.fromiter((_qid_bucket(q, buckets) for q in qids),
                          dtype=np.int64, count=len(qids))
        return pa.table({
            "qid": batch.column("qid").cast(pa.string()),
            "label": pc.fill_null(batch.column("label").cast(pa.string()), ""),
            "description": pc.fill_null(
                batch.column("description").cast(pa.string()), ""),
            "_b": pa.array(arr, type=pa.int64()),
        })

    def write_bucket(group):
        import pandas as pd

        wfs, wbase = resolve_filesystem(run_uri)  # workers re-resolve the URI
        b = int(group["_b"].iloc[0])
        g = group.sort_values("qid", kind="mergesort")
        t = pa.table({
            "qid": pa.array(g["qid"], type=pa.string()),
            "label": pa.array(g["label"], type=pa.string()),
            "description": pa.array(g["description"], type=pa.string()),
        })
        # write-then-rename: a worker declared lost mid-write can still be
        # flushing when Ray re-executes the task — two writers interleaving
        # on the FINAL path would leave a corrupt bucket that a "successful"
        # run then serves. Each attempt writes its own unique tmp name and
        # the rename (atomic on local/NFS, last-writer-wins elsewhere)
        # publishes only complete files. The run-unique directory protects
        # against stale PREVIOUS runs; this protects within-run retries.
        final = f"{wbase.rstrip('/')}/labels-{b:05d}.parquet"
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(t, tmp, filesystem=wfs)
        wfs.move(tmp, final)
        return pd.DataFrame({"bucket": [b], "rows": [len(g)]})

    # materialize the tiny per-bucket manifest — this is what runs the writes
    ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(write_bucket, batch_format="pandas") \
        .materialize()
    return run_uri


def _load_label_bucket(labels_dir: str, bucket: int) -> dict:
    """{qid: (label, description)} for one bucket; cached per worker. The
    cache key (labels_dir, bucket) is collision-free because
    partition_entity_labels returns a run-unique directory. `labels_dir`
    may be a bare path or any pyarrow FileSystem URI."""
    import pyarrow.parquet as pq

    from .extract import _fs_exists, resolve_filesystem

    key = (labels_dir, bucket)
    hit = _LABEL_BUCKET_CACHE.get(key)
    if hit is None:
        if len(_LABEL_BUCKET_CACHE) > 64:
            _LABEL_BUCKET_CACHE.clear()
        fs, base = resolve_filesystem(labels_dir)
        path = f"{base.rstrip('/')}/labels-{bucket:05d}.parquet"
        if _fs_exists(fs, path):
            t = pq.read_table(path, filesystem=fs)
            hit = {q: (l, d) for q, l, d in zip(
                t.column("qid").to_pylist(), t.column("label").to_pylist(),
                t.column("description").to_pylist())}
        else:
            hit = {}
        _LABEL_BUCKET_CACHE[key] = hit
    return hit


def _resolve_label_side(ds, labels_dir: str, buckets: int, side: str):
    """Co-partition feature rows with the label dimension on hash(qid of
    `side`) and fill that side's label/description columns per bucket."""
    val_col = f"{side}_value"
    label_col = f"{side}_value_label"
    desc_col = f"{side}_value_description"

    def add_bucket(batch: pa.Table) -> pa.Table:
        import numpy as np

        vals = batch.column(val_col).to_pylist()
        arr = np.fromiter((_qid_bucket(v, buckets) for v in vals),
                          dtype=np.int64, count=len(vals))
        return batch.append_column("_lb", pa.array(arr, type=pa.int64()))

    def fill(group):
        if not len(group):
            return group
        lookup = _load_label_bucket(labels_dir, int(group["_lb"].iloc[0]))
        keys = group[val_col].astype(str).str.replace('"', "", regex=False)
        pairs = [lookup.get(k, ("", "")) for k in keys]
        group = group.copy()
        group[label_col] = [p[0] for p in pairs]
        group[desc_col] = [p[1] for p in pairs]
        return group.drop(columns=["_lb"])

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_lb").map_groups(fill, batch_format="pandas")


def enrich_entity_features_partitioned(ds, labels_dir: str, buckets: int = 32,
                                       closure_dir=None, embedder=None,
                                       concurrency=None,
                                       batch_size: int = 4096):
    """features_entity Dataset -> enriched Dataset via the partitioned label
    join (for dimensions too large to broadcast). Output is identical to
    `enrich_entity_features` with the same labels as a dict (tested)."""
    ds = _resolve_label_side(ds, labels_dir, buckets, "old")
    ds = _resolve_label_side(ds, labels_dir, buckets, "new")
    kwargs = dict(closure_dir=closure_dir, embedder=embedder,
                  prefilled_labels=True)
    if concurrency is not None:
        return ds.map_batches(EntityFeatureEnricher,
                              fn_constructor_kwargs=kwargs,
                              batch_format="pyarrow", batch_size=batch_size,
                              concurrency=concurrency)
    return ds.map_batches(EntityFeatureEnricher(**kwargs),
                          batch_format="pyarrow", batch_size=batch_size)
