"""Flagship composed training-data pipeline: llm_corpus_prep.

Chains the engine's training-data primitives into ONE streaming corpus
preparation run — the end-to-end shape a 100-TB pretraining-data job takes:

    raw docs
      -> exact dedup            (slim content-hash shuffle + anti-join)
      -> near-dup cluster canonicalization
                                (minhash LSH -> exact-Jaccard verify ->
                                 connected components -> keep min-id rep)
      -> benchmark decontamination
                                (broadcast gram set / bucketed gram-hash
                                 co-partition beyond broadcast size)
      -> quality gate           (whitespace-token floor + Gopher-style
                                 bigram repetition ceiling, pure batch kernel)
      -> deterministic hash split (keep one band, zero shuffle)
      -> sequence packing       (distributed ordered prefix sum over slim
                                 (id, tokens) rows)

Every stage streams Dataset -> Dataset; document text never rides a shuffle
(the dedup/decontamination exchanges move content hashes, band keys and
128-bit gram keys; packing moves (id, token-count) pairs). The only
materializations are edge-set/benchmark-sized side tables. Between stages
the pipeline stays lazy, so block lineage fuses where Ray Data can.

No single reference analog — the reference's closest shape is the
multi-pass feature pipeline (scripts/compute_remaining_features.py); this
composition is the SURVEY §9.1 training-data surface exercised as one job.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup_ops import exact_dedup, near_dup_canonical_filter
from ..stages.packing import pack_sequences
from ..stages.sampling import hash_split
from ..stages.text_ops import decontaminate_filter


def quality_gate(ds, text_col: str = "text", min_tokens: int = 20,
                 max_rep_ratio: float = 0.1):
    """Keep docs with >= `min_tokens` whitespace tokens AND a word-bigram
    duplicate fraction <= `max_rep_ratio` (Gopher-style repetition signal,
    same kernels as token_counts / repetition_stats). Appends the
    'ws_token_count' column the packing stage consumes. Pure per-doc batch
    kernel — zero shuffle."""

    from ..stages.text_ops import bigram_rep_arrays

    def gate(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column(text_col), "")
        ws = pc.cast(pc.count_substring_regex(texts, pattern=r"\S+"),
                     pa.int64())
        wsv = ws.to_numpy(zero_copy_only=False)
        # the SAME kernel as repetition_stats — the gate and the standalone
        # operator (and its SQL oracle) cannot drift apart
        _, _, rep = bigram_rep_arrays(texts.to_pylist())
        keep = pa.array((wsv >= min_tokens) & (rep <= max_rep_ratio))
        return batch.append_column("ws_token_count", ws).filter(keep)

    return ds.map_batches(gate, batch_format="pyarrow")


# the chain parameters the CLI does NOT expose — single source of truth for
# both the function signature and the CLI's resume fingerprint
CHAIN_DEFAULTS = {
    "lsh_num_perm": 64,
    "lsh_bands": 32,
    "max_compare": 8,
    "split_bands": (("train", 90), ("val", 95), ("test", 100)),
}


def llm_corpus_prep(docs, bench_docs, text_col: str = "text",
                    id_col: str = "doc_id",
                    jaccard_threshold: float = 0.8,
                    lsh_num_perm: int = CHAIN_DEFAULTS["lsh_num_perm"],
                    lsh_bands: int = CHAIN_DEFAULTS["lsh_bands"],
                    max_compare: int = CHAIN_DEFAULTS["max_compare"],
                    decontam_n: int = 8,
                    decontam_broadcast_limit: int = 2_000_000,
                    min_tokens: int = 20, max_rep_ratio: float = 0.1,
                    pack_tokens: int = 512, keep_split: str = "train",
                    split_bands=CHAIN_DEFAULTS["split_bands"],
                    checkpoint_dir: str | None = None,
                    checkpoint_extra: dict | None = None):
    """docs + benchmark docs -> Dataset of (id_col, ws_token_count, pack_id):
    the packed training stream of the deduplicated, canonicalized,
    decontaminated, quality-filtered `keep_split` slice.

    LSH geometry defaults to 32 bands x 2 rows: at the verify threshold the
    per-pair miss probability is (1 - J^2)^32 — ~6e-15 at J=0.8 and ~1e-42
    at J=0.97 — so the verified edge set equals the exact >=threshold pair
    set for any non-adversarial corpus; the extra random band collisions the
    shorter bands admit only cost verify work, never correctness (verify is
    exact n-gram Jaccard). `max_compare` caps peers per bucket member;
    transitive clusters are stitched by the CC pass, so the cap bounds
    per-bucket work, not cluster capture.

    Composition semantics (the SQL oracle mirrors this order exactly):
    dedup before near-dup (exact clones must not inflate clusters),
    decontamination over survivors only, the quality gate computes its
    token counts on post-filter text, the split keeps `keep_split`, and
    packing orders by id over the surviving docs.

    `checkpoint_dir` makes the expensive half RESUMABLE at two rungs: the
    dedup / decontamination / gate / split stages are corpus-GLOBAL (their
    state spans every row), so the honest final resume point is the slim
    surviving (id, ws_token_count) table that feeds packing — it persists
    there after the chain, and a rerun that finds it skips the chain
    entirely and re-packs from the checkpoint (deterministic: packing is a
    pure function of that table; ~16 bytes/surviving doc). Beneath it, the
    verified near-dup EDGE set — the chain's single most expensive stage —
    checkpoints into `<checkpoint_dir>.edges` under its own fingerprint,
    so a failure during decontamination or the gate resumes from the edges
    instead of redoing LSH + verify."""
    import ray.data

    checkpoint_dir = checkpoint_dir or None  # "" must never glob the CWD
    fp = _chain_fingerprint(
        text_col=text_col, id_col=id_col,
        jaccard_threshold=jaccard_threshold, lsh_num_perm=lsh_num_perm,
        lsh_bands=lsh_bands, max_compare=max_compare, decontam_n=decontam_n,
        min_tokens=min_tokens, max_rep_ratio=max_rep_ratio,
        keep_split=keep_split, split_bands=split_bands,
        extra=checkpoint_extra)
    if checkpoint_dir is not None and \
            checkpoint_resume_state(checkpoint_dir, fp) is not None:
        kept = ray.data.read_parquet(checkpoint_dir,
                                     columns=[id_col, "ws_token_count"])
        return pack_sequences(kept, token_col="ws_token_count",
                              max_tokens=pack_tokens, order_col=id_col)
    # docs/bench_docs may be zero-arg LOADERS (the CLI passes these so the
    # resume decision above is the only owner of "do the inputs get
    # opened"); materialize them only now that the chain will really run
    if callable(docs):
        docs = docs()
    if callable(bench_docs):
        bench_docs = bench_docs()
    d1 = exact_dedup(docs, text_col=text_col, id_col=id_col)
    lsh_kwargs = dict(num_perm=lsh_num_perm, bands=lsh_bands,
                      jaccard_threshold=jaccard_threshold,
                      max_compare=max_compare)
    if checkpoint_dir is not None:
        # the LSH -> verify pass dominates the chain's cost; persist its
        # verified edge set (slim id pairs) under the same sentinel +
        # fingerprint discipline so a failure DURING decontamination / gate
        # resumes from the edges instead of redoing the whole dedup. The
        # edge fingerprint carries only edge-affecting parameters — a rerun
        # that changes decontam/gate/split params still reuses the edges.
        edge_fp = _chain_fingerprint(
            stage="near_dup_edges", text_col=text_col, id_col=id_col,
            jaccard_threshold=jaccard_threshold, lsh_num_perm=lsh_num_perm,
            lsh_bands=lsh_bands, max_compare=max_compare, split_bands=None,
            extra=checkpoint_extra)
        d2 = _near_dup_with_edge_checkpoint(
            d1, _edges_dir(checkpoint_dir), edge_fp, text_col, id_col,
            lsh_kwargs)
    else:
        d2 = near_dup_canonical_filter(
            d1, text_col=text_col, id_col=id_col, **lsh_kwargs)
    # 8-word grams (the GPT-3/FineWeb-style window): short grams flag every
    # doc sharing a common phrase with the benchmark — measured 413/500 docs
    # at n=3 on this corpus vs exactly the bench docs + their near-dups at
    # n=8 — while an 8-gram hit is a real leak
    d3 = decontaminate_filter(d2, bench_docs, text_col=text_col,
                              id_col=id_col, n=decontam_n,
                              broadcast_limit=decontam_broadcast_limit)
    d4 = quality_gate(d3, text_col=text_col, min_tokens=min_tokens,
                      max_rep_ratio=max_rep_ratio)
    d5 = hash_split(d4, id_col=id_col, bands=split_bands)

    def keep_band(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("split"), keep_split))

    kept = d5.map_batches(keep_band, batch_format="pyarrow") \
        .select_columns([id_col, "ws_token_count"])
    if checkpoint_dir is not None:
        # a TORN directory from an interrupted prior attempt (block files,
        # no sentinel) must be cleared first: write_parquet APPENDS
        # UUID-named files, and marking a mixed old+new directory complete
        # would duplicate surviving rows in this run's pack AND poison
        # every future resume
        import os as _os

        for stale in _checkpoint_files(checkpoint_dir):
            _os.remove(stale)
        kept.write_parquet(checkpoint_dir)
        # the sentinel (written AFTER every block file, carrying the chain
        # fingerprint) is what marks the checkpoint complete: Ray streams
        # one file per block, so an interrupted run leaves a TORN directory
        # that must never be mistaken for a resume point. A zero-survivor
        # run writes no files at all — keep the (empty) in-memory dataset
        # then; such a run is trivially cheap to redo and is NOT marked
        # resumable.
        if _checkpoint_files(checkpoint_dir):
            _write_checkpoint_sentinel(checkpoint_dir, fp)
            kept = ray.data.read_parquet(checkpoint_dir,
                                         columns=[id_col, "ws_token_count"])
    return pack_sequences(kept, token_col="ws_token_count",
                          max_tokens=pack_tokens, order_col=id_col)


def _checkpoint_files(checkpoint_dir: str) -> list:
    import glob
    import os

    return glob.glob(os.path.join(checkpoint_dir, "*.parquet"))


def _edges_dir(checkpoint_dir: str) -> str:
    """The verified-edge checkpoint lives in a SIBLING directory of the
    survivor checkpoint (own sentinel, own fingerprint). A subdirectory
    would be wrong: read_parquet(checkpoint_dir) recurses, so edge files
    inside the survivor dir would ride into the survivor resume read."""
    import os

    return os.path.normpath(checkpoint_dir) + ".edges"


def _near_dup_with_edge_checkpoint(d1, edges_dir: str, edge_fp: dict,
                                   text_col: str, id_col: str,
                                   lsh_kwargs: dict):
    """near_dup_canonical_filter split at its natural resume point: the
    verified (cand_a, cand_b) edge set is materialized anyway (the CC pass
    iterates over it), so persisting it costs one slim parquet write. A
    zero-edge corpus writes no files and is NOT marked resumable (redoing
    LSH is then the honest cost — same rule as the survivor checkpoint)."""
    import os

    import ray.data

    from ..stages.dedup_ops import (_canonical_filter_from_edges,
                                    minhash_lsh_verified_edges)

    if checkpoint_resume_state(edges_dir, edge_fp) is not None:
        edges = ray.data.read_parquet(
            edges_dir, columns=["cand_a", "cand_b"]).materialize()
    else:
        for stale in _checkpoint_files(edges_dir):
            os.remove(stale)
        edges = minhash_lsh_verified_edges(
            d1, text_col=text_col, id_col=id_col, **lsh_kwargs).materialize()
        edges.write_parquet(edges_dir)
        if _checkpoint_files(edges_dir):
            _write_checkpoint_sentinel(edges_dir, edge_fp)
    return _canonical_filter_from_edges(d1, edges, id_col)


_SENTINEL = "_SUCCESS.json"


def _chain_fingerprint(**params) -> dict:
    """Canonical JSON-stable dict of every chain-affecting parameter
    (pack_tokens deliberately EXCLUDED — packing runs after the checkpoint,
    so a rerun may change it and still resume)."""
    import json

    fp = dict(params)
    fp["split_bands"] = [list(b) for b in fp.get("split_bands") or []]
    return json.loads(json.dumps(fp, sort_keys=True))


def checkpoint_resume_state(checkpoint_dir: str | None, fp: dict):
    """The ONE owner of the resume decision (CLI and library both call
    this): returns the stored fingerprint when `checkpoint_dir` holds a
    COMPLETE checkpoint (sentinel present — a torn directory from an
    interrupted write is never a resume point) whose fingerprint matches
    `fp`; None when there is nothing to resume; raises loudly when a
    complete checkpoint was built with DIFFERENT chain parameters or
    inputs (silently re-packing stale survivors would produce wrong data
    for the requested parameters)."""
    import json
    import os

    if not checkpoint_dir:
        return None
    path = os.path.join(checkpoint_dir, _SENTINEL)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        stored = json.load(f)
    if stored != fp:
        raise ValueError(
            f"checkpoint at {checkpoint_dir} was built with different "
            f"chain parameters/inputs:\n  stored: {stored}\n  "
            f"requested: {fp}\nRemove the checkpoint directory or rerun "
            f"with the original parameters.")
    if not _checkpoint_files(checkpoint_dir):
        raise ValueError(
            f"checkpoint at {checkpoint_dir} has a sentinel but no parquet "
            f"files — the directory was partially deleted; remove it and "
            f"rerun")
    return stored


def _write_checkpoint_sentinel(checkpoint_dir: str, fp: dict) -> None:
    import json
    import os

    tmp = os.path.join(checkpoint_dir, _SENTINEL + ".tmp")
    with open(tmp, "w") as f:
        json.dump(fp, f, sort_keys=True)
    os.replace(tmp, os.path.join(checkpoint_dir, _SENTINEL))
