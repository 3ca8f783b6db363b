"""Randomized differential tests: the round-3 relational operators (sliding
window, as-of join, sequence packing) against brute-force O(n^2)/sequential
references on adversarial data (duplicate timestamps, singleton keys, empty
strata)."""
import datetime as dt

import numpy as np
import pyarrow as pa
import pytest


def _events(seed, n=300, n_keys=7):
    rng = np.random.RandomState(seed)
    base = dt.datetime(2024, 1, 1)
    keys = rng.randint(0, n_keys, size=n)
    # coarse second grid -> plenty of duplicate (key, ts) peers
    secs = rng.randint(0, 500, size=n)
    vals = np.round(rng.rand(n) * 100, 2)
    return [(i, int(keys[i]), base + dt.timedelta(seconds=int(secs[i])),
             float(vals[i])) for i in range(n)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sliding_window_vs_bruteforce(ray_session, seed):
    import ray.data

    from wikidata_edit_history_ray.stages.windows import sliding_window_sum

    rows = _events(seed)
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "k": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
        "v": pa.array([r[3] for r in rows], type=pa.float64()),
    })
    got = {r["event_id"]: r["window_sum"] for r in sliding_window_sum(
        ray.data.from_arrow(t, override_num_blocks=5), "k", "ts", "v",
        window_seconds=60).take_all()}
    for i, k, ts, _v in rows:
        exp = sum(v2 for _i2, k2, ts2, v2 in rows
                  if k2 == k and ts - dt.timedelta(seconds=60) <= ts2 <= ts)
        assert abs(got[i] - exp) < 1e-9, (seed, i)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_vs_bruteforce(ray_session, seed):
    import ray.data

    from wikidata_edit_history_ray.stages.joins import asof_join

    rows = _events(seed, n=250)
    right_rows = [r for r in rows if r[0] % 3 == 0]
    left = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "k": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
    })
    right = pa.table({
        "k": pa.array([r[1] for r in right_rows], type=pa.int64()),
        "ts": pa.array([r[2] for r in right_rows], type=pa.timestamp("us")),
        "v": pa.array([r[3] for r in right_rows], type=pa.float64()),
    })
    got = {r["event_id"]: r["v_right"] for r in asof_join(
        ray.data.from_arrow(left, override_num_blocks=4),
        ray.data.from_arrow(right), "k", "ts", ["v"]).take_all()}
    for i, k, ts, _v in rows:
        cands = [(ts2, i2, v2) for i2, k2, ts2, v2 in right_rows
                 if k2 == k and ts2 <= ts]
        if not cands:
            assert got[i] is None, (seed, i)
        else:
            # greatest ts wins; among exact-ts ties any peer value is the
            # match — accept the set (the engine picks a deterministic one)
            best_ts = max(c[0] for c in cands)
            vals = {c[2] for c in cands if c[0] == best_ts}
            assert got[i] in vals, (seed, i)


@pytest.mark.parametrize("seed", [0, 1])
def test_pack_sequences_vs_sequential(ray_session, seed):
    import ray.data

    from wikidata_edit_history_ray.stages.packing import pack_sequences

    rng = np.random.RandomState(seed)
    n = 400
    ids = rng.permutation(10_000)[:n].astype(np.int64)  # sparse, unordered
    toks = rng.randint(0, 300, size=n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "tok": pa.array(toks)})
    got = {r["doc_id"]: r["pack_id"] for r in pack_sequences(
        ray.data.from_arrow(t, override_num_blocks=6), "tok", 777,
        num_ranges=9).take_all()}
    order = np.argsort(ids)
    acc = 0
    for j in order:
        assert got[int(ids[j])] == acc // 777, (seed, int(ids[j]))
        acc += int(toks[j])


@pytest.mark.parametrize("seed,broadcast_limit",
                         [(0, 10**6), (1, 10**6), (0, 0), (1, 0)])
def test_chunk_dedup_vs_bruteforce(ray_session, seed, broadcast_limit):
    """Random small-vocab corpora (guaranteed cross-doc chunk collisions,
    empty docs, string ids) through both the broadcast and forced-shuffle
    paths of chunk_dedup."""
    from collections import Counter

    import ray.data

    from wikidata_edit_history_ray.stages.text_ops import (_doc_chunks,
                                                           chunk_dedup)

    rng = np.random.RandomState(seed)
    vocab = ["w%d" % i for i in range(9)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(0, 14)))
             for _ in range(120)]
    texts[0] = texts[1] = ""  # shared empty chunk
    ids = ["d%03d" % i for i in range(120)]
    W, MD = int(rng.randint(1, 4)), int(rng.randint(2, 4))

    cnt = Counter()
    for t in texts:
        for ch in set(_doc_chunks(t, W)):
            cnt[ch] += 1
    freq = {k for k, v in cnt.items() if v >= MD}
    expect = {}
    for d, t in zip(ids, texts):
        chs = _doc_chunks(t, W)
        kept = [c for c in chs if c not in freq]
        expect[d] = (" ".join(kept) if kept else None,
                     len(chs) - len(kept), len(chs))

    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}),
                             override_num_blocks=6)
    res = chunk_dedup(ds, chunk_words=W, min_docs=MD,
                      broadcast_limit=broadcast_limit).to_pandas()
    got = {r.doc_id: (r.clean_text if isinstance(r.clean_text, str)
                      else None,
                      int(r.removed_chunks), int(r.total_chunks))
           for r in res.itertuples()}
    assert got == expect
