"""Execute web/kjarni-search.js (the drop-in site-search widget) via jsvm.

Port-parity for the reference's zero-config search widget
(crates/kjarni-wasm/src/kjarni-search.js:11-27): init options, modal UI,
Cmd/Ctrl-K hotkey, debounced input, and hybrid | semantic | keyword modes.
The widget runs against the pure-JS engine (web/kjarni.js) plus a minimal
DOM shim (tests/js_dom_shim.js); the index is the JSON exported by
`kjarni export-browser --index` (export_search_index). The keyword and
hybrid rankings are checked for EXACT parity against the Python engine's
Bm25Index / hybrid_search (same constants: k1=1.2, b=0.75, RRF k=60).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from helpers import tiny_bert_dir

from kjarni_tpu.export.browser import export_browser_model, export_search_index

WEB = Path(__file__).resolve().parent.parent / "web"
SHIM = Path(__file__).resolve().parent / "js_dom_shim.js"

DOCS = [
    ("the doctor examined the patient and prescribed medicine",
     {"source": "docs/medical.md"}),
    ("stock markets fell sharply as investors sold shares",
     {"source": "docs/finance.md"}),
    ("the quick brown fox jumps over the lazy dog",
     {"source": "docs/animals.md"}),
    ("<script>alert('xss')</script> the doctor of markets",
     {"source": "docs/evil.md"}),
]


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    """A static site dir: dist/ bundle + kjarni-search.json from a real
    RAG index built with the production Embedder."""
    from kjarni_tpu.rag.index import IndexConfig, IndexWriter
    from kjarni_tpu.tasks.embedder import Embedder

    base = tmp_path_factory.mktemp("site")
    model_dir = tmp_path_factory.mktemp("widget_model")
    tiny_bert_dir(model_dir, seed=5)
    dist = base / "dist"
    export_browser_model(model_dir, dist)

    emb = Embedder(model_dir)
    idx_root = base / "ragindex"
    writer = IndexWriter.open(idx_root, IndexConfig())
    vecs = emb.embed_batch([t for t, _ in DOCS])
    for (text, meta), v in zip(DOCS, vecs):
        writer.add(text, v, meta)
    writer.commit()
    export_search_index(idx_root, dist / "kjarni-search.json")
    return base, model_dir, dist, np.asarray(vecs)


@pytest.fixture(scope="module")
def widget(site):
    """One jsvm interpreter with engine + DOM shim + widget loaded, the
    widget initialized, opened (model + index fetched), ready to search."""
    from kjarni_tpu.export.jsvm import load_module

    base, _, _, _ = site
    interp, _ = load_module(WEB / "kjarni.js", fetch_base=base)
    interp.run(SHIM.read_text())
    interp.run((WEB / "kjarni-search.js").read_text())
    ks = interp.globals.get("KjarniSearch")
    opts = interp.call_method(ks, "init",
                              {"model": "dist/",
                               "index": "dist/kjarni-search.json"})
    interp.call_method(ks, "open")
    return interp, ks, opts


def _el(interp, expr):
    return interp.run(expr)


class TestWidgetLifecycle:
    def test_init_defaults_mirror_reference(self, widget):
        _, _, opts = widget
        assert opts["mode"] == "hybrid"
        assert opts["limit"] == 8
        assert opts["hotkey"] is True
        assert opts["placeholder"] == "Search docs..."

    def test_modal_created_and_open(self, widget):
        interp, _, _ = widget
        assert interp.run(
            'document.getElementById("kjarni-modal")'
            '.classList.contains("open")') is True
        # loading finished: input enabled, status empty
        assert interp.run(
            'document.getElementById("kjarni-input").disabled') is False
        assert interp.run(
            'document.getElementById("kjarni-status").textContent') == ""

    def test_close_clears(self, widget):
        interp, ks, _ = widget
        interp.call_method(ks, "doSearch", "doctor")
        interp.call_method(ks, "close")
        assert interp.run(
            'document.getElementById("kjarni-modal")'
            '.classList.contains("open")') is False
        assert interp.run(
            'document.getElementById("kjarni-results")'
            '.childNodes.length') == 0
        interp.call_method(ks, "open")    # reopen for later tests

    def test_hotkey_opens_modal(self, widget):
        interp, ks, _ = widget
        interp.call_method(ks, "close")
        interp.run('document.dispatchEvent("keydown", '
                   '{ metaKey: true, ctrlKey: false, key: "k", '
                   'preventDefault: () => {} })')
        assert interp.run(
            'document.getElementById("kjarni-modal")'
            '.classList.contains("open")') is True


class TestWidgetSearch:
    def test_dosearch_renders_results(self, widget):
        interp, ks, _ = widget
        results = interp.call_method(ks, "doSearch", "doctor")
        assert len(results) >= 1
        srcs = [r["metadata"]["source"] for r in results]
        assert "docs/medical.md" in srcs[:2]
        # rendered anchors carry href + title + snippet
        n = interp.run(
            'document.getElementById("kjarni-results").childNodes.length')
        assert n == len(results) + 1     # + the meta line
        first_href = interp.run(
            'document.getElementById("kjarni-results").childNodes[0].href')
        assert first_href == srcs[0]

    def test_debounced_input_event_searches(self, widget):
        interp, _, _ = widget
        interp.run('(() => { const i = '
                   'document.getElementById("kjarni-input"); '
                   'i.value = "fox"; '
                   'i.dispatchEvent("input", { target: i }); })()')
        n = interp.run(
            'document.getElementById("kjarni-results").childNodes.length')
        assert n >= 2
        title = interp.run(
            'document.getElementById("kjarni-results")'
            '.childNodes[0].childNodes[0].textContent')
        assert title == "animals.md"

    def test_untrusted_text_stays_text(self, widget):
        """The reference widget injects result text via innerHTML; this one
        must not — indexed docs are untrusted. Structural: the widget source
        never uses innerHTML, and the rendered snippet is a text node."""
        src = (WEB / "kjarni-search.js").read_text()
        assert ".innerHTML" not in src   # header comment may name it; code must not use it
        interp, ks, _ = widget
        interp.call_method(ks, "doSearch", "xss alert")
        snippet = interp.run(
            'document.getElementById("kjarni-results")'
            '.childNodes[0].childNodes[1].textContent')
        assert snippet.startswith("<script>")   # literal text, not markup

    def test_empty_query_renders_nothing(self, widget):
        interp, ks, _ = widget
        assert interp.call_method(ks, "doSearch", "   ") == []


class TestModeParityVsPythonEngine:
    """The JS KjarniIndex must rank exactly like the Python engine."""

    def _js_query(self, widget, method, query, limit=8):
        interp, ks, _ = widget
        idx = interp.call_method(ks, "load", raw=True)
        out = interp.call_method(idx, method, query, limit)
        return [(r["id"], r["score"]) for r in out]

    def test_keyword_scores_match_bm25(self, widget):
        from kjarni_tpu.search.bm25 import Bm25Index

        py = Bm25Index()
        for i, (text, _) in enumerate(DOCS):
            py.add_document(i, text)
        for query in ("doctor", "markets fell", "the doctor of markets",
                      "quick fox", "nothing matches here"):
            want = py.search(query, 8)
            got = self._js_query(widget, "searchKeyword", query)
            assert [i for i, _ in got] == [i for i, _ in want], query
            for (gi, gs), (wi, ws) in zip(got, want):
                assert abs(gs - ws) < 1e-9, (query, gi, gs, ws)

    def test_semantic_ranking_matches_vector_store(self, widget, site):
        from kjarni_tpu.search.vector import VectorStore
        from kjarni_tpu.tasks.embedder import Embedder

        _, model_dir, _, vecs = site
        store = VectorStore(vecs.astype(np.float32))
        emb = Embedder(model_dir)
        for query in ("doctor medicine", "stock investors"):
            want = store.search(emb.embed(query), 8)
            got = self._js_query(widget, "search", query)
            assert [i for i, _ in got] == [i for i, _ in want], query

    def test_hybrid_matches_rrf(self, widget, site):
        from kjarni_tpu.search.bm25 import Bm25Index
        from kjarni_tpu.search.hybrid import hybrid_search
        from kjarni_tpu.search.vector import VectorStore
        from kjarni_tpu.tasks.embedder import Embedder

        _, model_dir, _, vecs = site
        py = Bm25Index()
        for i, (text, _) in enumerate(DOCS):
            py.add_document(i, text)
        store = VectorStore(vecs.astype(np.float32))
        emb = Embedder(model_dir)
        for query in ("doctor of markets", "fox doctor"):
            want = hybrid_search(py.search(query, 8),
                                 store.search(emb.embed(query), 8), 8)
            got = self._js_query(widget, "searchHybrid", query)
            assert [i for i, _ in got] == [i for i, _ in want], query
            for (gi, gs), (wi, ws) in zip(got, want):
                assert abs(gs - ws) < 1e-12, query


class TestExportSearchIndex:
    def test_roundtrip_vectors_and_cli(self, site, tmp_path, capsys):
        base, model_dir, dist, vecs = site
        data = json.loads((dist / "kjarni-search.json").read_text())
        assert data["dim"] == vecs.shape[1]
        assert len(data["docs"]) == len(DOCS)
        got = np.array([d["vector"] for d in data["docs"]])
        # 5-decimal rounding of L2-normalized vectors: cosine error < 1e-4
        cos = np.sum(got * vecs, axis=1) / (
            np.linalg.norm(got, axis=1) * np.linalg.norm(vecs, axis=1))
        assert cos.min() > 0.9999
        assert data["docs"][0]["metadata"]["source"] == "docs/medical.md"

        from kjarni_tpu.cli.main import main
        out = tmp_path / "cli_dist"
        rc = main(["export-browser", str(model_dir), "-o", str(out),
                   "--index", str(base / "ragindex"), "--format", "json"])
        assert rc == 0
        info = json.loads(capsys.readouterr().out)
        assert info["search_index"]["docs"] == len(DOCS)
        assert (out / "kjarni-search.json").exists()
        assert (out / "kjarni-search.js").exists()
        assert (out / "kjarni.js").exists()
