"""Import shims that let the READ-ONLY reference engine at /root/reference run
in this container (its deps — lxml, Levenshtein, sentence_transformers, torch,
sklearn, psycopg2, requests, bs4, psutil, dotenv — are absent).

Used ONLY by the conformance test to execute the reference's PageParser as a
ground-truth oracle; nothing from the reference is copied into the engine.
"""
from __future__ import annotations

import sys
import types
import xml.etree.ElementTree as ET


class _Elem:
    """Minimal lxml-like wrapper over xml.etree elements (find/findall/
    findtext/get/clear/getprevious/getparent + .text)."""

    def __init__(self, e):
        self._e = e

    @property
    def text(self):
        return self._e.text

    def find(self, tag):
        e = self._e.find(tag)
        return _Elem(e) if e is not None else None

    def findall(self, tag):
        return [_Elem(x) for x in self._e.findall(tag)]

    def findtext(self, tag, default=None):
        return self._e.findtext(tag, default)

    def get(self, key, default=None):
        return self._e.get(key, default)

    def clear(self):
        pass

    def getprevious(self):
        return None

    def getparent(self):
        return None


def install_reference_shims():
    """Register fake modules for the reference's unavailable dependencies and
    put /root/reference on sys.path. Idempotent."""
    if "lxml" in sys.modules and hasattr(sys.modules["lxml"], "_widiff_shim"):
        return

    from wikidata_edit_history_ray.core.features import levenshtein_distance

    lxml = types.ModuleType("lxml")
    lxml._widiff_shim = True
    etree = types.ModuleType("lxml.etree")
    etree.fromstring = lambda s: _Elem(ET.fromstring(s))
    etree.iterparse = None
    etree.tostring = lambda e, **kw: "<shim/>"
    lxml.etree = etree
    sys.modules["lxml"] = lxml
    sys.modules["lxml.etree"] = etree

    lev = types.ModuleType("Levenshtein")
    lev.distance = levenshtein_distance
    sys.modules["Levenshtein"] = lev

    st = types.ModuleType("sentence_transformers")
    st.SentenceTransformer = lambda *a, **k: None
    sys.modules["sentence_transformers"] = st

    torch = types.ModuleType("torch")
    torch.cuda = types.SimpleNamespace(is_available=lambda: False)
    sys.modules["torch"] = torch

    sklearn = types.ModuleType("sklearn")
    metrics = types.ModuleType("sklearn.metrics")
    pairwise = types.ModuleType("sklearn.metrics.pairwise")
    pairwise.cosine_similarity = lambda a, b: [[0.0]]
    metrics.pairwise = pairwise
    sklearn.metrics = metrics
    sys.modules["sklearn"] = sklearn
    sys.modules["sklearn.metrics"] = metrics
    sys.modules["sklearn.metrics.pairwise"] = pairwise

    psycopg2 = types.ModuleType("psycopg2")
    psycopg2.connect = lambda *a, **k: None
    extras = types.ModuleType("psycopg2.extras")
    extras.execute_batch = lambda *a, **k: None
    psycopg2.extras = extras
    sys.modules["psycopg2"] = psycopg2
    sys.modules["psycopg2.extras"] = extras

    for name in ("requests", "psutil"):
        sys.modules.setdefault(name, types.ModuleType(name))

    bs4 = types.ModuleType("bs4")
    bs4.BeautifulSoup = object
    sys.modules["bs4"] = bs4

    dotenv = types.ModuleType("dotenv")
    dotenv.load_dotenv = lambda *a, **k: None
    sys.modules["dotenv"] = dotenv

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


NS = "http://www.mediawiki.org/xml/export-0.11/"


def spans_to_page_xml(doc_id: str, spans) -> str:
    """Render a document's revision spans as the MediaWiki export XML the
    reference engine consumes (one <page> element)."""
    import json
    from xml.sax.saxutils import escape

    parts = [f'<page xmlns="{NS}">', f"<title>{doc_id}</title>", "<ns>0</ns>"]
    for span in sorted(spans, key=lambda s: s["offset"]):
        if span.get("kind") != "text":
            continue
        env = json.loads(span["text"])
        parts.append("<revision>")
        parts.append(f"<id>{env['revision_id']}</id>")
        if env.get("parent_id") is not None:
            parts.append(f"<parentid>{env['parent_id']}</parentid>")
        parts.append(f"<timestamp>{escape(env.get('timestamp') or '')}</timestamp>")
        username = env.get("username") or ""
        user_id = env.get("user_id") or ""
        parts.append("<contributor>")
        parts.append(f"<username>{escape(username)}</username>")
        parts.append(f"<id>{escape(str(user_id))}</id>")
        parts.append("</contributor>")
        if env.get("comment"):
            parts.append(f"<comment>{escape(env['comment'])}</comment>")
        if env.get("deleted"):
            parts.append('<text deleted="deleted"/>')
        else:
            parts.append(f"<text>{escape(env.get('text') or '')}</text>")
        parts.append("</revision>")
    parts.append("</page>")
    return "".join(parts)


REFERENCE_SET_UP = {
    "change_extraction_processing": {"language": "en"},
    "change_extraction_filters": {
        "scholarly_articles_filter": {
            "extract": True, "feature_extraction": True,
            "datatype_metadata_extraction": False},
        "astronomical_objects_filter": {
            "extract": True, "feature_extraction": True,
            "datatype_metadata_extraction": False},
        "less_filter": {
            "extract": True, "feature_extraction": True,
            "datatype_metadata_extraction": False, "threshold": 10},
        "rest": {"feature_extraction": True,
                 "datatype_metadata_extraction": False},
    },
    "re_interpretation": True,
    "time_threshold_seconds": 2419200,
}


def run_reference_page_parser(doc_id: str, spans, property_labels=None,
                              sa_types=None, ao_types=None, workdir=None,
                              set_up=None):
    """Execute the reference PageParser on one document; returns its result
    dict of per-table tuple lists. `set_up` overrides the default
    REFERENCE_SET_UP (e.g. asymmetric per-class change_extraction_filters)."""
    import os

    install_reference_shims()
    cwd = os.getcwd()
    if workdir:
        os.makedirs(os.path.join(workdir, "logs"), exist_ok=True)
        os.chdir(workdir)
    try:
        from scripts.page_parser import PageParser  # reference import

        xml = spans_to_page_xml(doc_id, spans)
        parser = PageParser(
            file_path="",
            page_elem_str=xml,
            set_up=set_up or REFERENCE_SET_UP,
            property_labels=property_labels or {},
            astronomical_object_types=set(ao_types or ()),
            scholarly_article_types=set(sa_types or ()),
        )
        return parser.process_page()
    finally:
        os.chdir(cwd)


def reference_write_gates(change_extraction_filters: dict, is_sa: bool,
                          is_ao: bool, has_less: bool):
    """Replicate the reference db_writer routing + batch_insert gates
    (scripts/db_writer.py:16-49, 146-155: _ao overrides _sa) so a test can
    compute which tables the reference would PERSIST for a page."""
    cf = change_extraction_filters
    if is_ao:
        name = "astronomical_objects_filter"
    elif is_sa:
        name = "scholarly_articles_filter"
    elif has_less:
        name = "less_filter"
    else:
        name = "rest"
    f = cf.get(name, {})
    if name == "rest":
        extract = True
        feats = bool(f.get("feature_extraction", False))
    else:
        extract = bool(f.get("extract", False))
        feats = extract and bool(f.get("feature_extraction", False))
    md = (bool(f.get("datatype_metadata_extraction", False))
          and (extract if name != "rest" else True))
    return extract, feats, md
