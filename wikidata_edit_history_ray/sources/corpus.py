"""Deterministic synthetic corpus of interleaved text+media documents.

Generates the engine's input table (doc_id:string,
spans:list<struct<kind:string,text:string,media_ref:string,offset:int32>>)
per BASELINE.json `input_hint`, together with ground-truth-by-construction
expected change rows: every edit operation the generator applies records the
change rows it must produce, giving an oracle for P/R scoring that is
independent of the differ implementation (FIXTURES.md §4 scenario catalog).

Each text span carries a revision envelope:
{"revision_id", "parent_id", "timestamp", "username", "user_id", "comment",
 "deleted", "text"} where "text" is the raw (possibly HTML-escaped, possibly
malformed) entity-JSON snapshot string, mirroring the reference's revision
<text> body (scripts/page_parser.py:1988-2043).
"""
from __future__ import annotations

import html
import json
import random
from datetime import datetime, timedelta

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])
DOCS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

_BASE_TS = datetime(2020, 1, 1, 12, 0, 0)

# a small synthetic P31 type universe; Q1000-Q1004 are "scholarly article"
# subclasses, Q2000-Q2004 "astronomical object" subclasses
SA_TYPES = [f"Q{1000 + i}" for i in range(5)]
AO_TYPES = [f"Q{2000 + i}" for i in range(5)]
OTHER_TYPES = [f"Q{3000 + i}" for i in range(10)]

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega"
).split()


def _ts(i: int) -> str:
    return (_BASE_TS + timedelta(minutes=7 * i)).strftime("%Y-%m-%dT%H:%M:%SZ")


class EntitySim:
    """Simulates one entity's revision history and records the expected
    change rows for every edit operation it applies."""

    def __init__(self, qid: str, rng: random.Random, rev_base: int):
        self.qid = qid
        self.rng = rng
        self.rev_base = rev_base
        self.rev_count = 0
        self.claims: dict[str, list[dict]] = {}
        self.label = None
        self.description = None
        self.spans: list[dict] = []
        self.offset = 0
        self.media_count = 0
        # expectations
        self.expected_value_changes: list[dict] = []
        self.expected_qualifier_changes: list[dict] = []
        self.expected_reference_changes: list[dict] = []
        self.expected_revisions: list[dict] = []
        self._stmt_counter = 0

    # ---- snapshot plumbing ----
    def _entity_json(self) -> dict:
        labels = {"en": {"language": "en", "value": self.label}} if self.label else []
        descs = {"en": {"language": "en", "value": self.description}} if self.description else []
        return {
            "labels": labels,
            "descriptions": descs,
            "aliases": [],
            "claims": {p: [json.loads(json.dumps(s)) for s in stmts]
                       for p, stmts in self.claims.items()},
            "sitelinks": {},
        }

    def _next_rev_id(self) -> int:
        self.rev_count += 1
        return self.rev_base + self.rev_count

    def push_media(self):
        self.media_count += 1
        self.spans.append({
            "kind": "media", "text": "",
            "media_ref": f"media://img/{self.qid}/{self.media_count:04d}.png",
            "offset": self.offset,
        })
        self.offset += 1

    def push_revision(self, body: str, username="Alice", comment="", deleted=False,
                      stored=True, user_id="7", escape=False):
        rev_id = self._next_rev_id()
        ts = _ts(rev_id - self.rev_base)
        envelope = {
            "revision_id": rev_id,
            "parent_id": rev_id - 1 if self.rev_count > 1 else None,
            "timestamp": ts,
            "username": username,
            "user_id": user_id,
            "comment": comment,
            "deleted": deleted,
            "text": None if deleted else (html.escape(body) if escape else body),
        }
        self.spans.append({
            "kind": "text", "text": json.dumps(envelope, ensure_ascii=False),
            "media_ref": "", "offset": self.offset,
        })
        self.offset += 1
        if stored and not deleted:
            self.expected_revisions.append({"revision_id": rev_id, "timestamp": ts})
        return rev_id, ts

    def snapshot_revision(self, **kw):
        """Emit the current entity state as a revision span."""
        return self.push_revision(json.dumps(self._entity_json(), ensure_ascii=False), **kw)

    # ---- value constructors ----
    def _new_stmt_id(self) -> str:
        self._stmt_counter += 1
        return f"{self.qid}${self._stmt_counter:04d}"

    def make_statement(self, pid: str, datavalue: dict | None, rank="normal",
                       snaktype="value"):
        stmt = {
            "id": self._new_stmt_id(),
            "mainsnak": {
                "snaktype": snaktype,
                "property": pid,
                "hash": f"wdh{self.rng.randrange(10**9)}",
            },
            "rank": rank,
            "type": "statement",
        }
        if snaktype == "value":
            stmt["mainsnak"]["datavalue"] = datavalue
        return stmt

    def rand_string_value(self):
        n = self.rng.randint(1, 5)
        return {"value": " ".join(self.rng.choice(_WORDS) for _ in range(n)),
                "type": "string"}

    def rand_entity_value(self, qid=None):
        q = qid or f"Q{self.rng.randint(1, 99999)}"
        return {"value": {"entity-type": "item", "numeric-id": int(q[1:]), "id": q},
                "type": "wikibase-entityid"}

    def rand_time_value(self, year=None):
        y = year or self.rng.randint(1800, 2024)
        return {
            "value": {
                "time": f"+{y}-{self.rng.randint(1,12):02d}-{self.rng.randint(1,28):02d}T00:00:00Z",
                "timezone": 0, "before": 0, "after": 0,
                "precision": 11,
                "calendarmodel": "http://www.wikidata.org/entity/Q1985727",
            },
            "type": "time",
        }

    def rand_quantity_value(self):
        amt = round(self.rng.uniform(-1000, 1000), self.rng.randint(0, 3))
        return {
            "value": {"amount": f"+{amt}" if amt >= 0 else str(amt),
                      "unit": "http://www.wikidata.org/entity/Q11573"},
            "type": "quantity",
        }

    def rand_globe_value(self):
        return {
            "value": {
                "latitude": round(self.rng.uniform(-90, 90), 4),
                "longitude": round(self.rng.uniform(-180, 180), 4),
                "precision": 0.0001,
                "globe": "http://www.wikidata.org/entity/Q2",
            },
            "type": "globecoordinate",
        }

    def rand_monolingual_value(self):
        return {"value": {"text": " ".join(self.rng.choice(_WORDS) for _ in range(2)),
                          "language": "en"},
                "type": "monolingualtext"}

    def rand_value(self, kind=None):
        kind = kind or self.rng.choice(["string", "entity", "time", "quantity", "globe", "mono"])
        return {
            "string": self.rand_string_value,
            "entity": self.rand_entity_value,
            "time": self.rand_time_value,
            "quantity": self.rand_quantity_value,
            "globe": self.rand_globe_value,
            "mono": self.rand_monolingual_value,
        }[kind]()

    def make_qualifier(self, pid: str, datavalue: dict):
        return {"snaktype": "value", "property": pid,
                "hash": f"wdh{self.rng.randrange(10**9)}", "datavalue": datavalue}

    def make_reference(self, snak_pids_values):
        return {
            "hash": f"refh{self.rng.randrange(10**9)}",
            "snaks": {pid: [self.make_qualifier(pid, dv)] for pid, dv in snak_pids_values},
            "snaks-order": [pid for pid, _ in snak_pids_values],
        }

    # ---- expectation recording ----
    def _expect_value(self, rev_id, pid, value_id, change_target, action):
        self.expected_value_changes.append({
            "revision_id": rev_id,
            "property_id": int(pid[1:]) if isinstance(pid, str) else pid,
            "value_id": value_id,
            "change_target": change_target,
            "action": action,
        })

    def _expect_qual(self, rev_id, pid, value_id, qual_pid, action):
        self.expected_qualifier_changes.append({
            "revision_id": rev_id, "property_id": int(pid[1:]),
            "value_id": value_id, "qual_property_id": int(qual_pid[1:]),
            "action": action,
        })

    def _expect_ref(self, rev_id, pid, value_id, ref_pid, action):
        self.expected_reference_changes.append({
            "revision_id": rev_id, "property_id": int(pid[1:]),
            "value_id": value_id, "ref_property_id": int(ref_pid[1:]),
            "action": action,
        })

    # ---- edit operations (each applies the edit AND records expectations) ----
    def op_create_entity(self, type_qids, n_statements=2, label="Entity", desc="a thing", **kw):
        """First revision: P31 types + a few statements + label + description."""
        for tq in type_qids:
            self.claims.setdefault("P31", []).append(
                self.make_statement("P31", self.rand_entity_value(tq)))
        for _ in range(n_statements):
            pid = f"P{self.rng.randint(100, 120)}"
            self.claims.setdefault(pid, []).append(
                self.make_statement(pid, self.rand_value()))
        self.label = label
        self.description = desc
        rev_id, _ = self.snapshot_revision(**kw)
        for pid, stmts in self.claims.items():
            for s in stmts:
                self._expect_value(rev_id, pid, s["id"], "", "CREATE")
        if label:
            self._expect_value(rev_id, -1, "label", "", "CREATE")
        if desc:
            self._expect_value(rev_id, -2, "description", "", "CREATE")
        return rev_id

    def op_add_statement(self, kind=None, pid=None, with_qualifier=False,
                         with_reference=False, **kw):
        pid = pid or f"P{self.rng.randint(200, 260)}"
        new_pid = pid not in self.claims
        stmt = self.make_statement(pid, self.rand_value(kind))
        if with_qualifier:
            qpid = f"P{self.rng.randint(500, 520)}"
            stmt["qualifiers"] = {qpid: [self.make_qualifier(qpid, self.rand_time_value())]}
        if with_reference:
            rpid = "P143"
            stmt["references"] = [self.make_reference([(rpid, self.rand_entity_value())])]
        self.claims.setdefault(pid, []).append(stmt)
        rev_id, _ = self.snapshot_revision(**kw)
        self._expect_value(rev_id, pid, stmt["id"], "", "CREATE")
        if stmt["mainsnak"].get("datavalue", {}).get("type") == "monolingualtext":
            # mono 'language' metadata routes into value_change on statement create
            self._expect_value(rev_id, pid, stmt["id"], "language", "CREATE")
        self._expect_value(rev_id, pid, stmt["id"], "rank", "CREATE")
        if with_qualifier:
            self._expect_qual(rev_id, pid, stmt["id"], qpid, "CREATE")
        if with_reference:
            self._expect_ref(rev_id, pid, stmt["id"], rpid, "CREATE")
        return rev_id, pid, stmt

    def _pick_statement(self, exclude_pids=("P31",)):
        cands = [(p, s) for p, stmts in self.claims.items() if p not in exclude_pids
                 for s in stmts]
        return self.rng.choice(cands) if cands else (None, None)

    def op_update_value(self, pid=None, stmt=None, new_datavalue=None, **kw):
        if stmt is None:
            pid, stmt = self._pick_statement()
            if stmt is None:
                return None
        old_dv = stmt["mainsnak"]["datavalue"]
        if new_datavalue is None:
            kind_map = {"string": "string", "wikibase-entityid": "entity",
                        "time": "time", "quantity": "quantity",
                        "globecoordinate": "globe", "monolingualtext": "mono"}
            new_datavalue = self.rand_value(kind_map.get(old_dv["type"], "string"))
            # ensure an actual value change
            attempts = 0
            while json.dumps(new_datavalue) == json.dumps(old_dv) and attempts < 10:
                new_datavalue = self.rand_value(kind_map.get(old_dv["type"], "string"))
                attempts += 1
        stmt["mainsnak"]["datavalue"] = new_datavalue
        stmt["mainsnak"]["hash"] = f"wdh{self.rng.randrange(10**9)}"
        rev_id, _ = self.snapshot_revision(**kw)
        self._expect_value(rev_id, pid, stmt["id"], "", "UPDATE")
        return rev_id, pid, stmt, old_dv

    def op_delete_statement(self, pid=None, stmt=None, **kw):
        if stmt is None:
            pid, stmt = self._pick_statement()
            if stmt is None:
                return None
        self.claims[pid] = [s for s in self.claims[pid] if s["id"] != stmt["id"]]
        removed_pid = not self.claims[pid]
        if removed_pid:
            del self.claims[pid]
        rev_id, _ = self.snapshot_revision(**kw)
        self._expect_value(rev_id, pid, stmt["id"], "", "DELETE")
        if stmt["mainsnak"].get("datavalue", {}).get("type") == "monolingualtext":
            self._expect_value(rev_id, pid, stmt["id"], "language", "DELETE")
        self._expect_value(rev_id, pid, stmt["id"], "rank", "DELETE")
        for qpid in (stmt.get("qualifiers") or {}):
            self._expect_qual(rev_id, pid, stmt["id"], qpid, "DELETE")
        for ref in (stmt.get("references") or []):
            for rpid in ref["snaks"]:
                self._expect_ref(rev_id, pid, stmt["id"], rpid, "DELETE")
        return rev_id, pid, stmt

    def op_rank_change(self, new_rank=None, **kw):
        pid, stmt = self._pick_statement()
        if stmt is None:
            return None
        old_rank = stmt["rank"]
        if new_rank is None:
            new_rank = self.rng.choice([r for r in ("normal", "preferred", "deprecated")
                                        if r != old_rank])
        stmt["rank"] = new_rank
        rev_id, _ = self.snapshot_revision(**kw)
        self._expect_value(rev_id, pid, stmt["id"], "rank", "UPDATE")
        return rev_id, pid, stmt, old_rank

    def op_add_qualifier(self, qpid=None, datavalue=None, **kw):
        pid, stmt = self._pick_statement()
        if stmt is None:
            return None
        qpid = qpid or f"P{self.rng.randint(500, 520)}"
        datavalue = datavalue or self.rand_time_value()
        stmt.setdefault("qualifiers", {}).setdefault(qpid, []).append(
            self.make_qualifier(qpid, datavalue))
        rev_id, _ = self.snapshot_revision(**kw)
        self._expect_qual(rev_id, pid, stmt["id"], qpid, "CREATE")
        return rev_id, pid, stmt, qpid

    def op_remove_qualifier(self, **kw):
        cands = [(p, s) for p, stmts in self.claims.items() for s in stmts
                 if s.get("qualifiers")]
        if not cands:
            return None
        pid, stmt = self.rng.choice(cands)
        qpid = self.rng.choice(list(stmt["qualifiers"].keys()))
        stmt["qualifiers"].pop(qpid)
        if not stmt["qualifiers"]:
            stmt.pop("qualifiers")
        rev_id, _ = self.snapshot_revision(**kw)
        self._expect_qual(rev_id, pid, stmt["id"], qpid, "DELETE")
        return rev_id, pid, stmt, qpid

    def op_add_reference(self, **kw):
        pid, stmt = self._pick_statement()
        if stmt is None:
            return None
        rpid = self.rng.choice(["P143", "P854", "P248"])
        stmt.setdefault("references", []).append(
            self.make_reference([(rpid, self.rand_entity_value())]))
        rev_id, _ = self.snapshot_revision(**kw)
        self._expect_ref(rev_id, pid, stmt["id"], rpid, "CREATE")
        return rev_id, pid, stmt

    def op_label_change(self, new_label, **kw):
        old = self.label
        if new_label == old:  # no-op revision: nothing stored, prev not advanced
            return self.push_revision(json.dumps(self._entity_json(), ensure_ascii=False),
                                      stored=False, **kw)[0]
        self.label = new_label
        rev_id, _ = self.snapshot_revision(**kw)
        action = "UPDATE" if old and new_label else ("CREATE" if new_label else "DELETE")
        self._expect_value(rev_id, -1, "label", "", action)
        return rev_id

    def op_description_change(self, new_desc, **kw):
        old = self.description
        if new_desc == old:
            return self.push_revision(json.dumps(self._entity_json(), ensure_ascii=False),
                                      stored=False, **kw)[0]
        self.description = new_desc
        rev_id, _ = self.snapshot_revision(**kw)
        action = "UPDATE" if old and new_desc else ("CREATE" if new_desc else "DELETE")
        self._expect_value(rev_id, -2, "description", "", action)
        return rev_id

    def op_alias_only_revision(self, **kw):
        """Snapshot with aliases/sitelinks but no claims/labels/descriptions —
        the differ must skip it entirely (not stored, prev not advanced)."""
        body = json.dumps({
            "labels": [], "descriptions": [],
            "aliases": {"en": [{"language": "en", "value": "AKA"}]},
            "claims": [], "sitelinks": {},
        })
        return self.push_revision(body, stored=False, **kw)

    def op_deleted_revision(self, **kw):
        return self.push_revision("", deleted=True, stored=False, **kw)

    def op_malformed_revision(self, **kw):
        return self.push_revision('{"labels": {"en": truncated', stored=False, **kw)

    def op_redirect(self, target_qid, **kw):
        body = json.dumps({"entity": self.qid, "redirect": target_qid})
        rev_id, _ = self.push_revision(body, **kw)
        return rev_id

    def op_cleaned(self, **kw):
        """Fully-empty snapshot: expect DELETEs for everything."""
        old_claims = self.claims
        old_label, old_desc = self.label, self.description
        self.claims, self.label, self.description = {}, None, None
        rev_id, _ = self.snapshot_revision(**kw)
        for pid, stmts in old_claims.items():
            for s in stmts:
                self._expect_value(rev_id, pid, s["id"], "", "DELETE")
                self._expect_value(rev_id, pid, s["id"], "rank", "DELETE")
                for qpid in (s.get("qualifiers") or {}):
                    self._expect_qual(rev_id, pid, s["id"], qpid, "DELETE")
                for ref in (s.get("references") or []):
                    for rpid in ref["snaks"]:
                        self._expect_ref(rev_id, pid, s["id"], rpid, "DELETE")
        if old_label:
            self._expect_value(rev_id, -1, "label", "", "DELETE")
        if old_desc:
            self._expect_value(rev_id, -2, "description", "", "DELETE")
        return rev_id


def build_doc(qid: str, rng: random.Random, n_revisions: int | None = None,
              media_prob: float = 0.15) -> EntitySim:
    """One random-script document: create + a run of random ops."""
    sim = EntitySim(qid, rng, rev_base=int(qid[1:]) * 1000)
    n = n_revisions if n_revisions is not None else max(2, int(rng.gauss(7, 3)))
    type_pool = rng.choice([SA_TYPES, AO_TYPES, OTHER_TYPES, OTHER_TYPES])
    sim.op_create_entity(
        type_qids=rng.sample(type_pool, rng.randint(1, 2)),
        n_statements=rng.randint(1, 4),
        label=f"Entity {qid}", desc=f"synthetic entity {qid}",
        username=rng.choice(["Alice", "DataBot", "", "Carol"]),
    )
    ops = [
        (0.30, lambda: sim.op_update_value(username=rng.choice(["Alice", "FixBot", ""]))),
        (0.15, lambda: sim.op_add_statement(with_qualifier=rng.random() < 0.3,
                                            with_reference=rng.random() < 0.3)),
        (0.10, lambda: sim.op_delete_statement()),
        (0.08, lambda: sim.op_rank_change()),
        (0.08, lambda: sim.op_add_qualifier()),
        (0.05, lambda: sim.op_remove_qualifier()),
        (0.07, lambda: sim.op_add_reference()),
        (0.07, lambda: sim.op_label_change(f"Entity {qid} v{rng.randint(2,9)}")),
        (0.05, lambda: sim.op_description_change(" ".join(rng.choice(_WORDS) for _ in range(3)))),
        (0.03, lambda: sim.op_alias_only_revision()),
        (0.02, lambda: sim.op_deleted_revision()),
    ]
    weights = [w for w, _ in ops]
    fns = [f for _, f in ops]
    for _ in range(n - 1):
        if rng.random() < media_prob:
            sim.push_media()
        rng.choices(fns, weights=weights, k=1)[0]()
    if rng.random() < media_prob:
        sim.push_media()
    return sim


def make_corpus(num_docs: int, seed: int = 42, hot_doc_revisions: int = 0,
                hot_doc_every: int = 0):
    """(docs pyarrow.Table, expectations dict) for `num_docs` documents.

    hot_doc_every > 0 plants a hot document (hot_doc_revisions revisions on few
    properties) every N docs to exercise skew handling.
    """
    rng = random.Random(seed)
    sims = []
    for i in range(num_docs):
        qid = f"Q{10 + i}"
        if hot_doc_every and i > 0 and i % hot_doc_every == 0 and hot_doc_revisions:
            sim = EntitySim(qid, rng, rev_base=int(qid[1:]) * 1000)
            sim.op_create_entity(type_qids=[rng.choice(OTHER_TYPES)], n_statements=2,
                                 label=f"Hot {qid}", desc="hot")
            _, pid, stmt = sim.op_add_statement(kind="string")
            for _ in range(hot_doc_revisions - 2):
                sim.op_update_value(pid=pid, stmt=stmt)
            sims.append(sim)
        else:
            sims.append(build_doc(qid, rng))
    table = pa.Table.from_pydict(
        {"doc_id": [s.qid for s in sims], "spans": [s.spans for s in sims]},
        schema=DOCS_SCHEMA,
    )
    expectations = {
        "value_change": [e for s in sims for e in s.expected_value_changes],
        "qualifier_change": [e for s in sims for e in s.expected_qualifier_changes],
        "reference_change": [e for s in sims for e in s.expected_reference_changes],
        "revision": [dict(e, doc_id=s.qid) for s in sims for e in s.expected_revisions],
        "spans": {s.qid: s.spans for s in sims},
    }
    return table, expectations


def write_corpus_parquet(path: str, num_docs: int, seed: int = 42,
                         n_shards: int | None = None, **kw) -> str:
    """Materialize a corpus to parquet; returns the path.

    With n_shards (or when num_docs is large) writes a DIRECTORY of shard
    files with small row groups — the physical shape a web-scale corpus has,
    and what lets Ray parallelize the read (one 25MB single-row-group file
    yields ~1 input block no matter how many cores you have)."""
    import os

    import pyarrow.parquet as pq

    table, _ = make_corpus(num_docs, seed=seed, **kw)
    if n_shards is None:
        # power-of-two shard counts divide typical block counts (2x cores)
        # evenly, so no task gets 1.5x the files of another
        n_shards = 1
        while n_shards < 512 and num_docs // (n_shards * 2) >= 300:
            n_shards *= 2
    if n_shards <= 1:
        pq.write_table(table, path, row_group_size=200)
        return path
    os.makedirs(path, exist_ok=True)
    per = (table.num_rows + n_shards - 1) // n_shards
    for s in range(n_shards):
        shard = table.slice(s * per, per)
        if shard.num_rows == 0:
            break
        pq.write_table(shard, os.path.join(path, f"shard-{s:05d}.parquet"),
                       row_group_size=100)
    return path
