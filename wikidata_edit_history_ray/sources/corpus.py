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

import hashlib
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


def _expected_user_type(username: str) -> str:
    """The M7 user-type spec ('bot' substring -> bot; empty -> anonymous;
    else human) restated independently in the generator so the expectation is
    ground truth by specification, not by engine import."""
    if "bot" in username.lower():
        return "bot"
    if username == "":
        return "anonymous"
    return "human"


# datatype-metadata keys per generated value kind: every datavalue key that is
# not a value field (reference: scripts/page_parser.py:263-271). The generator
# only emits these fixed shapes, so the metadata key set is known a priori.
_MD_KEYS_BY_TYPE = {
    "time": ("precision", "calendarmodel"),
    "quantity": ("unit",),
    "globecoordinate": ("precision", "globe"),
}

# feature-table routing per datavalue type for same-datatype UPDATEs
# (reference: scripts/page_parser.py feature routing / sql/features_schema.sql)
_FEATURE_TABLE_BY_TYPE = {
    "string": "features_text",
    "monolingualtext": "features_text",
    "wikibase-entityid": "features_entity",
    "time": "features_time",
    "quantity": "features_quantity",
    "globecoordinate": "features_globecoordinate",
}


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
        self.expected_metadata_changes: list[dict] = []
        self.expected_features: list[dict] = []
        self.expected_revisions: list[dict] = []
        self._stmt_counter = 0
        self._last_stored_rev = -1
        self._last_nonempty_label = ""

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
            uname = username.strip()
            self.expected_revisions.append({
                "prev_revision_id": self._last_stored_rev,
                "revision_id": rev_id,
                "entity_id": int(self.qid[1:]),
                "timestamp": ts,
                "user_id": str(user_id).strip(),
                "username": uname,
                "user_type": _expected_user_type(uname),
                "comment": comment.strip(),
            })
            self._last_stored_rev = rev_id
        return rev_id, ts

    def snapshot_revision(self, **kw):
        """Emit the current entity state as a revision span."""
        if self.label:
            self._last_nonempty_label = self.label
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

    def _expect_metadata(self, rev_id, pid, value_id, datavalue, action):
        """Statement CREATE/DELETE (outside first-revision/cleaned expansion)
        expands datatype metadata one row per key; monolingualtext 'language'
        routes to value_change instead and is expected separately."""
        for key in _MD_KEYS_BY_TYPE.get((datavalue or {}).get("type"), ()):
            self.expected_metadata_changes.append({
                "revision_id": rev_id, "property_id": int(pid[1:]),
                "value_id": value_id, "change_target": key, "action": action,
            })

    def _expect_feature(self, rev_id, pid_int, value_id, table):
        self.expected_features.append({
            "revision_id": rev_id, "property_id": pid_int,
            "value_id": value_id, "table": table,
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
        self._expect_metadata(rev_id, pid, stmt["id"],
                              stmt["mainsnak"].get("datavalue"), "CREATE")
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
        # same-datatype UPDATE -> one feature row in the per-datatype table
        table = _FEATURE_TABLE_BY_TYPE.get(old_dv["type"])
        if table:
            self._expect_feature(rev_id, int(pid[1:]), stmt["id"], table)
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
        self._expect_metadata(rev_id, pid, stmt["id"],
                              stmt["mainsnak"].get("datavalue"), "DELETE")
        self._expect_value(rev_id, pid, stmt["id"], "rank", "DELETE")
        for qpid, snaks in (stmt.get("qualifiers") or {}).items():
            for _ in snaks:  # one DELETE per snak (engine keys by value hash)
                self._expect_qual(rev_id, pid, stmt["id"], qpid, "DELETE")
        for ref in (stmt.get("references") or []):
            for rpid, snaks in ref["snaks"].items():
                for _ in snaks:
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
        if datavalue is None:
            # avoid a canonical-value collision with an existing snak of the
            # same qualifier property: the engine dedups snaks by value hash,
            # so a duplicate would make the expectation over-count
            existing = {json.dumps(s["datavalue"], sort_keys=True)
                        for s in (stmt.get("qualifiers") or {}).get(qpid, [])}
            datavalue = self.rand_time_value()
            while json.dumps(datavalue, sort_keys=True) in existing:
                datavalue = self.rand_time_value()
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
        removed = stmt["qualifiers"].pop(qpid)
        if not stmt["qualifiers"]:
            stmt.pop("qualifiers")
        rev_id, _ = self.snapshot_revision(**kw)
        for _ in removed:  # one DELETE per removed snak
            self._expect_qual(rev_id, pid, stmt["id"], qpid, "DELETE")
        return rev_id, pid, stmt, qpid

    def op_add_reference(self, **kw):
        pid, stmt = self._pick_statement()
        if stmt is None:
            return None
        rpid = self.rng.choice(["P143", "P854", "P248"])
        # avoid a reference whose canonical snak set duplicates an existing
        # one on this statement (engine keys references by content hash)
        existing = {json.dumps([(p, s["datavalue"]) for p, sl in r["snaks"].items()
                                for s in sl], sort_keys=True)
                    for r in (stmt.get("references") or [])}
        dv = self.rand_entity_value()
        while json.dumps([(rpid, dv)], sort_keys=True) in existing:
            dv = self.rand_entity_value()
        stmt.setdefault("references", []).append(
            self.make_reference([(rpid, dv)]))
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
        if action == "UPDATE":
            # label diffs are 'string'-datatype UPDATEs -> features_text row
            self._expect_feature(rev_id, -1, "label", "features_text")
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
        if action == "UPDATE":
            self._expect_feature(rev_id, -2, "description", "features_text")
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

    # ---- end-of-history expectations (ground truth by construction) ----
    def expected_stats(self, sa_types=None, ao_types=None, less_threshold=10):
        """The entity_stats row this history must produce under the default
        DiffConfig (revert counters excluded — revert detection is a separate
        engine pass the generator does not model)."""
        sa_types = set(sa_types or SA_TYPES)
        ao_types = set(ao_types or AO_TYPES)
        vc = self.expected_value_changes
        md = self.expected_metadata_changes
        revs = self.expected_revisions

        def count(rows, target=None, action=None):
            return sum(1 for e in rows
                       if (target is None or e.get("change_target", "") == target)
                       and (action is None or e["action"] == action))

        final_types = sorted({s["mainsnak"]["datavalue"]["value"]["id"]
                              for s in self.claims.get("P31", [])})
        num_value_changes = count(vc, target="")
        is_sa = any(t in sa_types for t in final_types)
        is_ao = any(t in ao_types for t in final_types)
        has_less = (not is_sa and not is_ao
                    and num_value_changes <= less_threshold)
        return {
            "entity_id": int(self.qid[1:]),
            "entity_label": self._last_nonempty_label,
            "entity_types_31": ", ".join(final_types),
            "num_revisions": len(revs),
            "num_value_changes": num_value_changes,
            "num_value_change_creates": count(vc, "", "CREATE"),
            "num_value_change_deletes": count(vc, "", "DELETE"),
            "num_value_change_updates": count(vc, "", "UPDATE"),
            "num_rank_changes": count(vc, "rank"),
            "num_rank_creates": count(vc, "rank", "CREATE"),
            "num_rank_deletes": count(vc, "rank", "DELETE"),
            "num_rank_updates": count(vc, "rank", "UPDATE"),
            "num_qualifier_changes": len(self.expected_qualifier_changes),
            "num_reference_changes": len(self.expected_reference_changes),
            "num_datatype_metadata_changes": len(md),
            "num_datatype_metadata_creates": count(md, action="CREATE"),
            "num_datatype_metadata_deletes": count(md, action="DELETE"),
            "num_datatype_metadata_updates": count(md, action="UPDATE"),
            "first_revision_timestamp": revs[0]["timestamp"] if revs else None,
            "last_revision_timestamp": revs[-1]["timestamp"] if revs else None,
            "num_bot_edits": sum(1 for r in revs if r["user_type"] == "bot"),
            "num_anonymous_edits": sum(1 for r in revs if r["user_type"] == "anonymous"),
            "num_human_edits": sum(1 for r in revs if r["user_type"] == "human"),
            "is_scholarly_article": is_sa,
            "is_astronomical_object": is_ao,
            "has_less_revisions": has_less,
        }

    def expected_triples(self):
        """The CURRENT (subj, pred, value_id) triples after replaying the full
        change history — i.e. the generator's final claim state."""
        eid = int(self.qid[1:])
        rows = [{"subj": eid, "pred": int(pid[1:]), "value_id": s["id"]}
                for pid, stmts in self.claims.items() for s in stmts]
        if self.label:
            rows.append({"subj": eid, "pred": -1, "value_id": "label"})
        if self.description:
            rows.append({"subj": eid, "pred": -2, "value_id": "description"})
        return rows

    def expected_doc_spans(self):
        """Span-sequence lineage rows (the north-rule per-row invariant:
        kind, text identity, media_ref, order)."""
        eid = int(self.qid[1:])
        rows = []
        for idx, span in enumerate(self.spans):
            t = span["text"] or ""
            rows.append({
                "doc_id": self.qid, "entity_id": eid, "span_index": idx,
                "kind": span["kind"], "offset": span["offset"],
                "media_ref": span["media_ref"] or "",
                "text_sha1": hashlib.sha1(t.encode("utf-8")).hexdigest() if t else "",
            })
        return rows

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
                for qpid, snaks in (s.get("qualifiers") or {}).items():
                    for _ in snaks:
                        self._expect_qual(rev_id, pid, s["id"], qpid, "DELETE")
                for ref in (s.get("references") or []):
                    for rpid, snaks in ref["snaks"].items():
                        for _ in snaks:
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
                hot_doc_every: int = 0, qid_offset: int = 0):
    """(docs pyarrow.Table, expectations dict) for `num_docs` documents.

    hot_doc_every > 0 plants a hot document (hot_doc_revisions revisions on few
    properties) every N docs to exercise skew handling. qid_offset shifts the
    entity-id range so independently generated chunks never collide (chunked /
    parallel generation of multi-million-doc corpora).
    """
    rng = random.Random(seed)
    sims = []
    for i in range(num_docs):
        qid = f"Q{10 + qid_offset + i}"
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
        "value_change": [dict(e, entity_id=int(s.qid[1:])) for s in sims
                         for e in s.expected_value_changes],
        "qualifier_change": [dict(e, entity_id=int(s.qid[1:])) for s in sims
                             for e in s.expected_qualifier_changes],
        "reference_change": [dict(e, entity_id=int(s.qid[1:])) for s in sims
                             for e in s.expected_reference_changes],
        "datatype_metadata_change": [dict(e, entity_id=int(s.qid[1:])) for s in sims
                                     for e in s.expected_metadata_changes],
        "features": [dict(e, entity_id=int(s.qid[1:])) for s in sims
                     for e in s.expected_features],
        "revision": [dict(e, doc_id=s.qid,
                          entity_label=s._last_nonempty_label)
                     for s in sims for e in s.expected_revisions],
        "entity_stats": [s.expected_stats() for s in sims],
        "graph_triples": [e for s in sims for e in s.expected_triples()],
        "doc_spans": [e for s in sims for e in s.expected_doc_spans()],
        "spans": {s.qid: s.spans for s in sims},
    }
    return table, expectations


# typed parquet schemas for the persisted expectation tables — column types
# pinned to the engine's Arrow output types so a DuckDB read of these files
# compares cleanly against the Ray pipeline results
_EXPECT_SCHEMAS = {
    "value_change": pa.schema([
        ("revision_id", pa.int64()), ("property_id", pa.int32()),
        ("value_id", pa.string()), ("change_target", pa.string()),
        ("action", pa.string()), ("entity_id", pa.int64())]),
    "qualifier_change": pa.schema([
        ("revision_id", pa.int64()), ("property_id", pa.int32()),
        ("value_id", pa.string()), ("qual_property_id", pa.int32()),
        ("action", pa.string()), ("entity_id", pa.int64())]),
    "reference_change": pa.schema([
        ("revision_id", pa.int64()), ("property_id", pa.int32()),
        ("value_id", pa.string()), ("ref_property_id", pa.int32()),
        ("action", pa.string()), ("entity_id", pa.int64())]),
    "datatype_metadata_change": pa.schema([
        ("revision_id", pa.int64()), ("property_id", pa.int32()),
        ("value_id", pa.string()), ("change_target", pa.string()),
        ("action", pa.string()), ("entity_id", pa.int64())]),
    "features": pa.schema([
        ("revision_id", pa.int64()), ("property_id", pa.int32()),
        ("value_id", pa.string()), ("table", pa.string()),
        ("entity_id", pa.int64())]),
    "revision": pa.schema([
        ("prev_revision_id", pa.int64()), ("revision_id", pa.int64()),
        ("entity_id", pa.int64()), ("timestamp", pa.string()),
        ("user_id", pa.string()), ("username", pa.string()),
        ("user_type", pa.string()), ("comment", pa.string()),
        ("doc_id", pa.string()), ("entity_label", pa.string())]),
    "entity_stats": pa.schema(
        [("entity_id", pa.int64()), ("entity_label", pa.string()),
         ("entity_types_31", pa.string())]
        + [(c, pa.int64()) for c in (
            "num_revisions", "num_value_changes", "num_value_change_creates",
            "num_value_change_deletes", "num_value_change_updates",
            "num_rank_changes", "num_rank_creates", "num_rank_deletes",
            "num_rank_updates", "num_qualifier_changes",
            "num_reference_changes", "num_datatype_metadata_changes",
            "num_datatype_metadata_creates", "num_datatype_metadata_deletes",
            "num_datatype_metadata_updates")]
        + [("first_revision_timestamp", pa.string()),
           ("last_revision_timestamp", pa.string()),
           ("num_bot_edits", pa.int64()), ("num_anonymous_edits", pa.int64()),
           ("num_human_edits", pa.int64()),
           ("is_scholarly_article", pa.bool_()),
           ("is_astronomical_object", pa.bool_()),
           ("has_less_revisions", pa.bool_())]),
    "graph_triples": pa.schema([
        ("subj", pa.int64()), ("pred", pa.int32()), ("value_id", pa.string())]),
    "doc_spans": pa.schema([
        ("doc_id", pa.string()), ("entity_id", pa.int64()),
        ("span_index", pa.int32()), ("kind", pa.string()),
        ("offset", pa.int32()), ("media_ref", pa.string()),
        ("text_sha1", pa.string())]),
}


def write_expectations(expect_dir: str, expectations: dict) -> str:
    """Persist the construction-time ground-truth tables as typed parquet —
    the DuckDB side of the driver's oracle comparison reads these files."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(expect_dir, exist_ok=True)
    for name, schema in _EXPECT_SCHEMAS.items():
        rows = expectations.get(name, [])
        t = pa.Table.from_pylist(
            [{f: r.get(f) for f in schema.names} for r in rows], schema=schema)
        pq.write_table(t, os.path.join(expect_dir, f"{name}.parquet"))
    return expect_dir


def write_corpus_parquet(path: str, num_docs: int, seed: int = 42,
                         n_shards: int | None = None,
                         expect_dir: str | None = None,
                         chunk_docs: int | None = None, **kw) -> str:
    """Materialize a corpus to parquet; returns the path.

    With n_shards (or when num_docs is large) writes a DIRECTORY of shard
    files with small row groups — the physical shape a web-scale corpus has,
    and what lets Ray parallelize the read (one 25MB single-row-group file
    yields ~1 input block no matter how many cores you have).

    With expect_dir, the construction-time ground-truth tables are persisted
    there as typed parquet (the oracle side of the driver comparison).

    With chunk_docs, generation runs CHUNKED (qid_offset keeps entity ids
    disjoint) — as parallel Ray tasks when a Ray session exists, else
    sequentially — each chunk writing its own shard files: multi-million-doc
    corpora generate at cluster speed with flat driver memory. Expectations
    are a small-tier feature and are not supported chunked."""
    import os

    import pyarrow.parquet as pq

    if chunk_docs and num_docs > chunk_docs:
        if expect_dir:
            raise ValueError("expect_dir is not supported with chunked "
                             "generation (expectations are a small-tier tool)")
        return _write_corpus_chunked(path, num_docs, seed, chunk_docs, kw)

    table, expectations = make_corpus(num_docs, seed=seed, **kw)
    if expect_dir:
        write_expectations(expect_dir, expectations)
    if n_shards is None:
        # power-of-two shard counts divide typical block counts (2x cores)
        # evenly, so no task gets 1.5x the files of another
        n_shards = 1
        while n_shards < 512 and num_docs // (n_shards * 2) >= 300:
            n_shards *= 2
    if n_shards <= 1:
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)
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


def _gen_corpus_chunk(path: str, chunk_idx: int, offset: int, n: int,
                      seed: int, kw: dict) -> int:
    """Generate one chunk and write it as ~1250-doc shard files."""
    import os

    import pyarrow.parquet as pq

    table, _ = make_corpus(n, seed=seed + offset, qid_offset=offset, **kw)
    per = 1250
    for s in range((table.num_rows + per - 1) // per):
        shard = table.slice(s * per, per)
        pq.write_table(
            shard,
            os.path.join(path, f"shard-{chunk_idx:04d}-{s:04d}.parquet"),
            row_group_size=100)
    return table.num_rows


def _write_corpus_chunked(path: str, num_docs: int, seed: int,
                          chunk_docs: int, kw: dict) -> str:
    import os

    os.makedirs(path, exist_ok=True)
    chunks = [(ci, off, min(chunk_docs, num_docs - off))
              for ci, off in enumerate(range(0, num_docs, chunk_docs))]
    try:
        import ray

        have_ray = ray.is_initialized()
    except ImportError:
        have_ray = False
    if have_ray:
        import ray

        gen = ray.remote(_gen_corpus_chunk)
        ray.get([gen.remote(path, ci, off, n, seed, kw)
                 for ci, off, n in chunks])
    else:
        for ci, off, n in chunks:
            _gen_corpus_chunk(path, ci, off, n, seed, kw)
    return path
