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


def _pairwise_cosine(model, old_texts, new_texts) -> np.ndarray:
    a = model.encode(list(old_texts))
    b = model.encode(list(new_texts))
    return (a * b).sum(axis=1)


class TextFeatureEnricher:
    """ML1 for features_text: fills value_cosine_similarity from batched
    old/new value embeddings (reference: scripts/feature_creation.py:29-121)."""

    def __init__(self, embedder=None):
        self.model = embedder() if isinstance(embedder, type) else (embedder or HashingEmbedder())

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
                 embedder=None, closure_cache=None):
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
        self.model = embedder() if isinstance(embedder, type) else (embedder or HashingEmbedder())

    def _lookup(self, serialized_qid):
        q = str(serialized_qid).replace('"', "")
        return self.entity_labels.get(q, ("", ""))

    def __call__(self, batch: pa.Table) -> pa.Table:
        old_vals = batch.column("old_value").to_pylist()
        new_vals = batch.column("new_value").to_pylist()
        n = len(old_vals)

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

        for ov, nv in zip(old_vals, new_vals):
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
                           concurrency=None, batch_size: int = 4096):
    """features_entity Dataset -> enriched Dataset (actor pool: the closure
    index + label dict load once per actor)."""
    import ray

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, ncpu // 2))
    labels_ref = ray.put(entity_labels or {})
    return ds.map_batches(
        EntityFeatureEnricher,
        fn_constructor_kwargs=dict(closure_dir=closure_dir, entity_labels=labels_ref),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def enrich_text_features(ds, concurrency=None, batch_size: int = 4096):
    """features_text Dataset -> Dataset with value_cosine_similarity filled."""
    if concurrency:
        return ds.map_batches(TextFeatureEnricher, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency)
    return ds.map_batches(TextFeatureEnricher(), batch_format="pyarrow",
                          batch_size=batch_size)
