"""Transitive-closure membership cache (operator J4).

A read-only {relation -> {entity -> frozenset(closure QIDs)}} index probed per
feature row. In the reference this is a multi-GB pickle loaded once per process
(scripts/transitive_closure_cache.py:10-112); here it is the canonical
actor-pool state: built once in the enricher actor's __init__ and probed by
every batch that actor processes.
"""
from __future__ import annotations

import csv
import os

RELATIONS = (
    "subclass_transitive",
    "part_of_transitive",
    "has_part_transitive",
    "located_in_transitive",
)

_REL_FILES = {
    "subclass_transitive": "subclass_of_transitive.csv",
    "part_of_transitive": "part_of_transitive.csv",
    "has_part_transitive": "has_parts_transitive.csv",
    "located_in_transitive": "located_in_transitive.csv",
}


class TransitiveClosureCache:
    def __init__(self, caches: dict | None = None):
        self.caches = caches or {rel: {} for rel in RELATIONS}

    @classmethod
    def from_csv_dir(cls, closure_dir: str) -> "TransitiveClosureCache":
        """CSV rows: entity_id, entity_id_numeric, transitive_closure_qids
        (comma-separated), transitive_closure_numeric_ids."""
        caches = {}
        for rel, fname in _REL_FILES.items():
            path = os.path.join(closure_dir, fname)
            rel_cache = {}
            if os.path.exists(path):
                with open(path, newline="") as f:
                    for row in csv.DictReader(f):
                        qids = row.get("transitive_closure_qids", "") or ""
                        rel_cache[row["entity_id"]] = frozenset(
                            q.strip() for q in qids.split(",") if q.strip())
            caches[rel] = rel_cache
        return cls(caches)

    @classmethod
    def from_edges(cls, edges_by_relation: dict, max_hops: int = 10) -> "TransitiveClosureCache":
        """Build closures from direct edges {relation: [(src, dst), ...]} —
        the offline closure computation (reference: wdtk Java extractors) as
        an iterative expansion capped at max_hops."""
        caches = {}
        for rel in RELATIONS:
            direct: dict[str, set] = {}
            for src, dst in edges_by_relation.get(rel, ()):  # direct edges
                direct.setdefault(src, set()).add(dst)
            closure = {k: set(v) for k, v in direct.items()}
            for _ in range(max_hops - 1):
                changed = False
                for src, dsts in closure.items():
                    add = set()
                    for d in dsts:
                        add |= direct.get(d, set())
                    before = len(dsts)
                    dsts |= add
                    changed = changed or len(dsts) != before
                if not changed:
                    break
            caches[rel] = {k: frozenset(v) for k, v in closure.items()}
        return cls(caches)

    def check(self, v1, v2, relation: str) -> int:
        """1 if v2 is in v1's transitive closure under `relation`.
        Values arrive as serialized JSON strings ('"Q5"') — quotes stripped."""
        if v1 is None or v2 is None:
            return 0
        a = str(v1).replace('"', "")
        b = str(v2).replace('"', "")
        members = self.caches.get(relation, {}).get(a)
        return int(members is not None and b in members)


def write_synthetic_closures(closure_dir: str, seed: int = 42, n_entities: int = 200):
    """Deterministic small closure CSVs for tests/bench (FIXTURES.md §2)."""
    import random

    rng = random.Random(seed)
    os.makedirs(closure_dir, exist_ok=True)
    for rel, fname in _REL_FILES.items():
        rows = []
        for i in range(n_entities):
            qid = f"Q{rng.randint(1, 99999)}"
            closure = {f"Q{rng.randint(1, 99999)}" for _ in range(rng.randint(1, 8))}
            rows.append((qid, qid[1:], ",".join(sorted(closure)),
                        ",".join(q[1:] for q in sorted(closure))))
        with open(os.path.join(closure_dir, fname), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["entity_id", "entity_id_numeric",
                        "transitive_closure_qids", "transitive_closure_numeric_ids"])
            w.writerows(rows)
    return closure_dir
