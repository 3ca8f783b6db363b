"""Revert-tagging tests: the three patterns, window limit, rank mirroring,
restore-intermediate tagging (FIXTURES.md scenarios 11-14)."""
import random

from wikidata_edit_history_ray.core.constants import VALUE_CHANGE_COLS
from wikidata_edit_history_ray.core.differ import DiffConfig, PageDiffer
from wikidata_edit_history_ray.sources.corpus import EntitySim


def run(sim):
    return PageDiffer(DiffConfig()).process_doc(sim.qid, sim.spans)


def rows(out):
    return [dict(zip(VALUE_CHANGE_COLS, c)) for c in out["value_change"]]


def stats(out):
    from wikidata_edit_history_ray.core.constants import ENTITY_STATS_COLS

    return dict(zip(ENTITY_STATS_COLS, out["entity_stats"][0]))


def make_sim(qid="Q90", seed=5):
    sim = EntitySim(qid, random.Random(seed), rev_base=100)
    sim.op_create_entity(type_qids=["Q3000"], n_statements=0)
    return sim


class TestDirectRevert:
    def test_update_then_inverse_update_tags_both(self):
        sim = make_sim()
        _, pid, stmt = sim.op_add_statement(kind="string")
        original_dv = {"value": "alpha", "type": "string"}
        changed_dv = {"value": "beta", "type": "string"}
        sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=original_dv)
        r_fwd, *_ = sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=changed_dv)
        r_back, *_ = sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=original_dv)
        out = run(sim)
        by_rev = {(r["revision_id"], r["change_target"]): r for r in rows(out)}
        fwd = by_rev[(r_fwd, "")]
        back = by_rev[(r_back, "")]
        assert fwd["is_reverted"] == 1 and fwd["reversion"] == 0
        assert fwd["revision_id_reversion"] == r_back
        assert fwd["reversion_timestamp"] is not None
        assert back["is_reverted"] == 0 and back["reversion"] == 1
        st = stats(out)
        assert st["num_reverted_edits"] == 1 and st["num_reversions"] == 1
        assert st["num_reverted_edits_update"] == 1

    def test_create_then_delete_tags_and_mirrors_rank(self):
        sim = make_sim("Q91")
        r_add, pid, stmt = sim.op_add_statement(kind="string")
        r_del, *_ = sim.op_delete_statement(pid=pid, stmt=stmt)
        out = run(sim)
        by = {(r["revision_id"], r["change_target"]): r for r in rows(out)}
        assert by[(r_add, "")]["is_reverted"] == 1
        assert by[(r_add, "rank")]["is_reverted"] == 1  # rank mirrors value row
        assert by[(r_del, "")]["reversion"] == 1
        assert by[(r_del, "rank")]["reversion"] == 1


class TestWindowLimit:
    def test_revert_outside_window_not_tagged(self):
        sim = make_sim("Q92")
        _, pid, stmt = sim.op_add_statement(kind="string")
        a = {"value": "one", "type": "string"}
        b = {"value": "two", "type": "string"}
        sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=a)
        r_fwd, *_ = sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=b)
        # jump the clock past 4 weeks by inflating the revision counter
        sim.rev_count += 10000  # 10000 * 7 min >> 4 weeks
        r_back, *_ = sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=a)
        out = run(sim)
        by = {(r["revision_id"], r["change_target"]): r for r in rows(out)}
        assert by[(r_fwd, "")]["is_reverted"] == 0
        assert by[(r_back, "")]["reversion"] == 0


class TestTrailingRestore:
    def test_restore_after_delete_tags_intermediates(self):
        sim = make_sim("Q93")
        _, pid, stmt = sim.op_add_statement(kind="string")
        v1 = {"value": "v one", "type": "string"}
        v2 = {"value": "v two", "type": "string"}
        v3 = {"value": "v three", "type": "string"}
        sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=v1)
        r_u2, *_ = sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=v2)
        r_u3, *_ = sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=v3)
        r_del, *_ = sim.op_delete_statement(pid=pid, stmt=stmt)
        # restore: CREATE with the same statement id and value v1
        sim.claims.setdefault(pid, []).append(stmt)
        stmt["mainsnak"]["datavalue"] = v1
        r_restore, _ = sim.snapshot_revision(comment="restore to older version")
        out = run(sim)
        by = {(r["revision_id"], r["change_target"]): r for r in rows(out)}
        # u2: UPDATE v1->v2 is the reverted head (old_value == restored value)
        assert by[(r_u2, "")]["is_reverted"] == 1
        assert by[(r_u2, "")]["revision_id_reversion"] == r_restore
        # intermediates (u3, del) tagged as reverted too
        assert by[(r_u3, "")]["is_reverted"] == 1
        assert by[(r_del, "")]["is_reverted"] == 1
        assert by[(r_restore, "")]["reversion"] == 1

    def test_trailing_without_restore_comment_not_tagged(self):
        sim = make_sim("Q94")
        _, pid, stmt = sim.op_add_statement(kind="string")
        a = {"value": "aa", "type": "string"}
        b = {"value": "bb", "type": "string"}
        c = {"value": "cc", "type": "string"}
        sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=a)
        r_fwd, *_ = sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=b)
        sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=c)
        r_back, *_ = sim.op_update_value(pid=pid, stmt=stmt, new_datavalue=a)
        out = run(sim)
        by = {(r["revision_id"], r["change_target"]): r for r in rows(out)}
        # A->B ... ->A with intermediates but no restore/rollback comment
        assert by[(r_fwd, "")]["is_reverted"] == 0


class TestHotDocMemoryBound:
    def test_20k_revision_doc_bounded_heap_and_time(self):
        """Per-doc memory model (BASELINE.md): the revert scan holds one
        document's change rows + posting lists + flag dicts — O(changes in
        the doc), independent of corpus size. A 20k-revision single-statement
        doc (the pathological pv-group shape: every change in ONE posting
        list) must tag within a small constant factor of its own row
        footprint and in near-linear time."""
        import time
        import tracemalloc

        from wikidata_edit_history_ray.core.revert import tag_reverted_edits

        n = 20_000
        changes, tuples = [], []
        for i in range(n):
            # alternating A->B / B->A pairs: every odd row reverts its
            # predecessor, so the flag dict actually fills up
            old, new = ("A", "B") if i % 2 == 0 else ("B", "A")
            ts = f"2020-01-01T{(i // 3600) % 24:02d}:{(i // 60) % 60:02d}:{i % 60:02d}Z"
            changes.append({
                "revision_id": i, "change_target": "", "action": "UPDATE",
                "old_value": old, "new_value": new, "timestamp": ts,
                "comment": ""})
            t = [None] * 9
            t[0], t[1], t[3], t[8] = i, 1, "sid", ""
            tuples.append(tuple(t))

        tracemalloc.start()
        t0 = time.time()
        final, st = tag_reverted_edits({(1, "sid", ""): changes}, tuples, 86400)
        wall = time.time() - t0
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()

        assert len(final) == n
        # chained A->B/B->A: every row except the last reverts its
        # predecessor (reversions may themselves be reverted)
        assert st["num_reversions"] == n - 1
        # bound: well under a worker heap — 20k changes must stay in the
        # tens-of-MB range (the input dicts alone are ~8 MB)
        assert peak < 100 * 1024 * 1024, f"peak {peak/1e6:.0f} MB"
        assert wall < 30, f"wall {wall:.1f}s"
