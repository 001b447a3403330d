// kjarni-search.js — drop-in semantic site-search widget.
//
// Port of the reference's zero-config widget
// (crates/kjarni-wasm/src/kjarni-search.js:11-27): same init options, modal
// UI, Cmd/Ctrl-K hotkey, 150ms debounce, and hybrid | semantic | keyword
// modes — over this repo's pure-JS engine (web/kjarni.js KjarniModel +
// KjarniIndex) instead of a compiled WASM module. Two deliberate deltas:
// results are rendered with createElement/textContent rather than innerHTML
// (indexed documents can't inject markup into the host page), and the index
// is a JSON file produced by `kjarni export-browser --index <dir>` (docs +
// metadata + precomputed embedding vectors) rather than a bincode blob.
//
// Usage:
//   <script src="kjarni.js"></script>
//   <script src="kjarni-search.js"></script>
//   <script>KjarniSearch.init({ model: '/dist/', index: '/dist/kjarni-search.json' })</script>

const KjarniSearch = (() => {
  let index = null;
  let modal = null;
  let debounceTimer = null;
  let opts = {};

  function init(options) {
    options = options || {};
    opts = {
      model: options.model || "/dist/",
      index: options.index || "/dist/kjarni-search.json",
      limit: options.limit || 8,
      placeholder: options.placeholder || "Search docs...",
      hotkey: options.hotkey !== false,
      mode: options.mode || "hybrid", // hybrid | semantic | keyword
    };
    createModal();
    if (opts.hotkey) bindHotkey();
    return opts;
  }

  async function load() {
    if (index) return index;
    setStatus("Loading search engine...");
    const [model, data] = await Promise.all([
      KjarniModel.load(opts.model),
      fetch(opts.index).then((r) => r.json()),
    ]);
    setStatus("Indexing...");
    const idx = new KjarniIndex(model);
    for (const doc of data.docs) {
      idx.add(doc.text, doc.metadata, doc.vector);
    }
    index = idx;
    setStatus("");
    const input = document.getElementById("kjarni-input");
    if (input) {
      input.disabled = false;
      input.focus();
    }
    return index;
  }

  function runQuery(query, limit) {
    if (!index || !query.trim()) return [];
    if (opts.mode === "semantic") return index.search(query, limit);
    if (opts.mode === "keyword") return index.searchKeyword(query, limit);
    return index.searchHybrid(query, limit);
  }

  function doSearch(query) {
    const start = (typeof performance !== "undefined")
      ? performance.now() : Date.now();
    const results = runQuery(query, opts.limit);
    const now = (typeof performance !== "undefined")
      ? performance.now() : Date.now();
    renderResults(results, (now - start).toFixed(0));
    return results;
  }

  // remove children one by one (not innerHTML/textContent assignment):
  // browser-correct, and lets the jsvm DOM shim track the tree with a
  // plain childNodes array
  function clearElement(el) {
    while (el.childNodes.length) el.removeChild(el.childNodes[0]);
  }

  function resultTitle(r, i) {
    const source = r.metadata && r.metadata.source;
    if (source) {
      const parts = String(source).split("/");
      return parts[parts.length - 1] || "Result " + (i + 1);
    }
    return "Result " + (i + 1);
  }

  function renderResults(results, elapsed) {
    const container = document.getElementById("kjarni-results");
    if (!container) return;
    clearElement(container);
    if (!results || results.length === 0) {
      const input = document.getElementById("kjarni-input");
      if (input && input.value) {
        const empty = document.createElement("div");
        empty.className = "kjarni-empty";
        empty.textContent = "No results found";
        container.appendChild(empty);
      }
      return;
    }
    for (let i = 0; i < results.length; i++) {
      const r = results[i];
      const a = document.createElement("a");
      a.className = "kjarni-result";
      a.href = (r.metadata && r.metadata.source) || "#";
      const title = document.createElement("div");
      title.className = "kjarni-result-title";
      title.textContent = resultTitle(r, i);
      const score = document.createElement("span");
      score.className = "kjarni-score";
      score.textContent = (r.score * 100).toFixed(0) + "%";
      title.appendChild(score);
      const text = document.createElement("div");
      text.className = "kjarni-result-text";
      text.textContent = r.text.length > 200
        ? r.text.slice(0, 200) + "..." : r.text;
      a.appendChild(title);
      a.appendChild(text);
      container.appendChild(a);
    }
    const meta = document.createElement("div");
    meta.className = "kjarni-meta";
    meta.textContent =
      results.length + " results in " + elapsed + "ms · kjarni";
    container.appendChild(meta);
  }

  function setStatus(msg) {
    const el = document.getElementById("kjarni-status");
    if (el) el.textContent = msg;
  }

  const CSS = [
    ".kjarni-overlay { display:none; position:fixed; inset:0;",
    "  background:rgba(0,0,0,0.5); z-index:9999; justify-content:center;",
    "  align-items:flex-start; padding-top:min(20vh,120px); }",
    ".kjarni-overlay.open { display:flex; }",
    ".kjarni-modal { background:#fff; border-radius:12px; width:90%;",
    "  max-width:620px; max-height:70vh; display:flex;",
    "  flex-direction:column; box-shadow:0 20px 60px rgba(0,0,0,0.3); }",
    ".kjarni-header { padding:16px; border-bottom:1px solid #e5e7eb;",
    "  display:flex; align-items:center; gap:8px; }",
    "#kjarni-input { flex:1; border:none; outline:none; font-size:16px;",
    "  background:none; }",
    "#kjarni-input:disabled { opacity:0.5; }",
    ".kjarni-kbd { font-size:11px; padding:2px 6px;",
    "  border:1px solid #d1d5db; border-radius:4px; color:#6b7280; }",
    "#kjarni-results { overflow-y:auto; padding:8px; }",
    ".kjarni-result { display:block; padding:10px 12px; border-radius:8px;",
    "  text-decoration:none; color:inherit; cursor:pointer; }",
    ".kjarni-result:hover { background:#f3f4f6; }",
    ".kjarni-result-title { font-weight:600; font-size:14px;",
    "  margin-bottom:2px; display:flex; justify-content:space-between; }",
    ".kjarni-result-text { font-size:13px; color:#6b7280;",
    "  line-height:1.4; }",
    ".kjarni-score { font-size:11px; color:#9ca3af; font-weight:400; }",
    ".kjarni-empty, #kjarni-status { padding:20px; text-align:center;",
    "  color:#9ca3af; font-size:14px; }",
    ".kjarni-meta { padding:8px 12px; font-size:11px; color:#9ca3af;",
    "  text-align:right; }",
    "@media(prefers-color-scheme:dark) {",
    "  .kjarni-modal { background:#1f2937; color:#f9fafb; }",
    "  .kjarni-header { border-color:#374151; }",
    "  .kjarni-result:hover { background:#374151; }",
    "  .kjarni-result-text { color:#9ca3af; }",
    "  .kjarni-kbd { border-color:#4b5563; color:#9ca3af; }",
    "}",
  ].join("\n");

  function createModal() {
    if (document.getElementById("kjarni-modal")) {
      modal = document.getElementById("kjarni-modal");
      return;
    }
    const style = document.createElement("style");
    style.textContent = CSS;
    document.head.appendChild(style);

    const overlay = document.createElement("div");
    overlay.id = "kjarni-modal";
    overlay.className = "kjarni-overlay";

    const box = document.createElement("div");
    box.className = "kjarni-modal";
    box.addEventListener("click", (e) => {
      if (e && e.stopPropagation) e.stopPropagation();
    });

    const header = document.createElement("div");
    header.className = "kjarni-header";
    const input = document.createElement("input");
    input.id = "kjarni-input";
    input.type = "text";
    input.placeholder = opts.placeholder;
    input.disabled = true;
    const kbd = document.createElement("span");
    kbd.className = "kjarni-kbd";
    kbd.textContent = "esc";
    header.appendChild(input);
    header.appendChild(kbd);

    const status = document.createElement("div");
    status.id = "kjarni-status";
    const results = document.createElement("div");
    results.id = "kjarni-results";

    box.appendChild(header);
    box.appendChild(status);
    box.appendChild(results);
    overlay.appendChild(box);
    overlay.addEventListener("click", close);
    document.body.appendChild(overlay);

    input.addEventListener("input", (e) => {
      clearTimeout(debounceTimer);
      debounceTimer = setTimeout(() => doSearch(e.target.value), 150);
    });
    input.addEventListener("keydown", (e) => {
      if (e.key === "Escape") close();
    });
    modal = overlay;
  }

  function bindHotkey() {
    document.addEventListener("keydown", (e) => {
      if ((e.metaKey || e.ctrlKey) && e.key === "k") {
        if (e.preventDefault) e.preventDefault();
        open();
      }
    });
  }

  async function open() {
    if (!modal) return;
    modal.classList.add("open");
    await load();
  }

  function close() {
    if (!modal) return;
    modal.classList.remove("open");
    const input = document.getElementById("kjarni-input");
    if (input) input.value = "";
    const results = document.getElementById("kjarni-results");
    if (results) clearElement(results);
  }

  // runQuery/renderResults exposed for the jsvm execution tests
  return { init, open, close, load, doSearch, runQuery, renderResults };
})();

if (typeof module !== "undefined" && module.exports) {
  module.exports = { KjarniSearch };
}
