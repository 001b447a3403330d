/* kjarni.js — dependency-free browser inference for kjarni encoder bundles.
 *
 * Counterpart of the reference's kjarni-wasm crate (crates/kjarni-wasm/src/
 * lib.rs:42: browser BERT embeddings + index, SIMD128). The TPU rebuild's
 * engine is JAX/XLA (no browser target), so the browser path is this small
 * pure-JS engine over a static bundle produced by `kjarni export-browser`:
 * manifest.json + weights.bin (little-endian f32) + tokenizer.json.
 *
 * Surface (kjarni-wasm parity):
 *   const model = await KjarniModel.load("dist/");   // Model::new
 *   const vec = model.embed("hello world");          // embed (normalized)
 *   model.similarity(a, b);                          // cosine
 *   const index = new KjarniIndex(model);            // WasmIndexBuilder
 *   index.add("doc text", {meta: 1});
 *   index.search("query", 5);                        // WasmSearch
 *
 * Works in any modern browser and in Node >= 18 (pass file contents to
 * KjarniModel.fromBuffers for non-fetch environments).
 */
"use strict";

// ---------------------------------------------------------------------------
// Tokenizer: reads HF tokenizer.json — WordPiece (BERT) or WordLevel models.
// ---------------------------------------------------------------------------

class KjarniTokenizer {
  constructor(tk) {
    this.spec = tk;
    const model = tk.model || {};
    this.type = model.type || "WordPiece";
    this.vocab = model.vocab || {};
    this.unk = model.unk_token || "[UNK]";
    this.prefix = model.continuing_subword_prefix || "##";
    this.maxChars = model.max_input_chars_per_word || 100;
    this.lowercase = true; // BertNormalizer default in kjarni's models
    const norm = tk.normalizer;
    if (norm && norm.lowercase === false) this.lowercase = false;
    this.clsId = this.vocab["[CLS]"];
    this.sepId = this.vocab["[SEP]"];
    this.unkId = this.vocab[this.unk] !== undefined ? this.vocab[this.unk] : 0;
  }

  normalize(text) {
    let t = text;
    if (this.lowercase) t = t.toLowerCase();
    // strip accents (BertNormalizer strip_accents follows lowercase)
    t = t.normalize("NFD").replace(/[̀-ͯ]/g, "");
    return t;
  }

  pretokenize(text) {
    // whitespace split + isolate punctuation (Bert pre-tokenizer)
    const words = [];
    for (const chunk of text.split(/\s+/)) {
      if (!chunk) continue;
      let cur = "";
      for (const ch of chunk) {
        if (/[\p{P}\p{S}]/u.test(ch)) {
          if (cur) { words.push(cur); cur = ""; }
          words.push(ch);
        } else {
          cur += ch;
        }
      }
      if (cur) words.push(cur);
    }
    return words;
  }

  wordpiece(word) {
    if (word.length > this.maxChars) return [this.unkId];
    const ids = [];
    let start = 0;
    while (start < word.length) {
      let end = word.length;
      let id = undefined;
      while (start < end) {
        const sub = (start > 0 ? this.prefix : "") + word.slice(start, end);
        if (this.vocab[sub] !== undefined) { id = this.vocab[sub]; break; }
        end -= 1;
      }
      if (id === undefined) return [this.unkId];
      ids.push(id);
      start = end;
    }
    return ids;
  }

  encode(text) {
    const words = this.pretokenize(this.normalize(text));
    const ids = [];
    for (const w of words) {
      if (this.type === "WordLevel") {
        ids.push(this.vocab[w] !== undefined ? this.vocab[w] : this.unkId);
      } else {
        ids.push(...this.wordpiece(w));
      }
    }
    const out = [];
    if (this.clsId !== undefined) out.push(this.clsId);
    out.push(...ids);
    if (this.sepId !== undefined) out.push(this.sepId);
    return out;
  }

  decode(ids) {
    if (!this.inv) {
      this.inv = {};
      for (const [t, i] of Object.entries(this.vocab)) this.inv[i] = t;
    }
    return ids.map((i) => this.inv[i] ?? this.unk).join(" ");
  }
}

// ---------------------------------------------------------------------------
// Math helpers (Float32Array)
// ---------------------------------------------------------------------------

/* int8 per-output-channel quantized tensor (bundle dtype "q8"): `q` holds
 * the int8 payload, `s` one float32 scale per output channel (`n` = last
 * axis). Counterpart of the reference's quantized browser weights
 * (kjarni-wasm/src/lib.rs:1064 from_quantized_bytes) — ~4x smaller
 * download; matmuls dequantize in the inner loop. */
class Q8Tensor {
  constructor(q, s, n) {
    this.q = q;
    this.s = s;
    this.n = n;
    this.length = q.length; // mirror TypedArray.length for layer slicing
  }
  // element-range slice aligned to whole scale groups (layer slicing):
  // for a [L, K, N] payload the scales are [L, N]
  subarray(a, b) {
    const perGroup = (this.q.length / this.s.length) * this.n; // = K*N
    return new Q8Tensor(
      this.q.subarray(a, b),
      this.s.subarray((a / perGroup) * this.n, (b / perGroup) * this.n),
      this.n,
    );
  }
}

function tensorFromRecord(rec, weightsBuf) {
  if (rec.dtype === "q8") {
    return new Q8Tensor(
      new Int8Array(weightsBuf, rec.offset, rec.size),
      new Float32Array(weightsBuf, rec.scale_offset, rec.scale_size),
      rec.shape[rec.shape.length - 1],
    );
  }
  return new Float32Array(weightsBuf, rec.offset, rec.size);
}

// embedding-row gather with optional dequant: out[i] += table[row*H + i]
function addEmbeddingRow(out, outOff, table, row, H) {
  if (table instanceof Q8Tensor) {
    const q = table.q, s = table.s, off = row * H;
    for (let i = 0; i < H; i++) out[outOff + i] += q[off + i] * s[i];
  } else {
    const off = row * H;
    for (let i = 0; i < H; i++) out[outOff + i] += table[off + i];
  }
}

// y[S,N] = x[S,K] @ w[K,N] + b[N]; w may be f32 or Q8Tensor (inner-loop
// dequant: integer products accumulate per channel, one scale multiply at
// the end of each output row)
function matmul(x, S, K, w, N, b) {
  if (w instanceof Q8Tensor) {
    const q = w.q, sc = w.s;
    const y = new Float32Array(S * N);
    const acc = new Float32Array(N);
    for (let s = 0; s < S; s++) {
      acc.fill(0);
      const xoff = s * K;
      for (let k = 0; k < K; k++) {
        const xv = x[xoff + k];
        if (xv === 0) continue;
        const woff = k * N;
        for (let n = 0; n < N; n++) acc[n] += xv * q[woff + n];
      }
      const yoff = s * N;
      for (let n = 0; n < N; n++) {
        y[yoff + n] = acc[n] * sc[n] + (b ? b[n] : 0);
      }
    }
    return y;
  }
  const y = new Float32Array(S * N);
  for (let s = 0; s < S; s++) {
    const xoff = s * K;
    const yoff = s * N;
    if (b) y.set(b, yoff);
    for (let k = 0; k < K; k++) {
      const xv = x[xoff + k];
      if (xv === 0) continue;
      const woff = k * N;
      for (let n = 0; n < N; n++) y[yoff + n] += xv * w[woff + n];
    }
  }
  return y;
}

function layerNorm(x, S, H, weight, bias, eps) {
  for (let s = 0; s < S; s++) {
    const off = s * H;
    let mean = 0;
    for (let i = 0; i < H; i++) mean += x[off + i];
    mean /= H;
    let varr = 0;
    for (let i = 0; i < H; i++) {
      const d = x[off + i] - mean;
      varr += d * d;
    }
    const inv = 1 / Math.sqrt(varr / H + eps);
    for (let i = 0; i < H; i++) {
      x[off + i] = (x[off + i] - mean) * inv * weight[i] + bias[i];
    }
  }
}

function geluInplace(x) {
  // tanh approximation (within bf16 rounding of exact erf gelu)
  const c = Math.sqrt(2 / Math.PI);
  for (let i = 0; i < x.length; i++) {
    const v = x[i];
    x[i] = 0.5 * v * (1 + Math.tanh(c * (v + 0.044715 * v * v * v)));
  }
}

function softmaxRows(x, rows, cols) {
  for (let r = 0; r < rows; r++) {
    const off = r * cols;
    let m = -Infinity;
    for (let c = 0; c < cols; c++) if (x[off + c] > m) m = x[off + c];
    let sum = 0;
    for (let c = 0; c < cols; c++) {
      const e = Math.exp(x[off + c] - m);
      x[off + c] = e;
      sum += e;
    }
    for (let c = 0; c < cols; c++) x[off + c] /= sum;
  }
}

function cosine(a, b) {
  let dot = 0, na = 0, nb = 0;
  for (let i = 0; i < a.length; i++) {
    dot += a[i] * b[i];
    na += a[i] * a[i];
    nb += b[i] * b[i];
  }
  return dot / (Math.sqrt(na) * Math.sqrt(nb) || 1);
}

// ---------------------------------------------------------------------------
// Model
// ---------------------------------------------------------------------------

class KjarniModel {
  constructor(manifest, weightsBuf, tokenizerJson) {
    this.cfg = manifest.config;
    this.t = {};
    for (const rec of manifest.tensors) {
      this.t[rec.name] = tensorFromRecord(rec, weightsBuf);
    }
    this.tokenizer = new KjarniTokenizer(tokenizerJson);
  }

  static async load(baseUrl) {
    const strip = baseUrl.endsWith("/") ? baseUrl : baseUrl + "/";
    const [manifest, weights, tok] = await Promise.all([
      fetch(strip + "manifest.json").then((r) => r.json()),
      fetch(strip + "weights.bin").then((r) => r.arrayBuffer()),
      fetch(strip + "tokenizer.json").then((r) => r.json()),
    ]);
    return new KjarniModel(manifest, weights, tok);
  }

  static fromBuffers(manifestJson, weightsArrayBuffer, tokenizerJson) {
    return new KjarniModel(manifestJson, weightsArrayBuffer, tokenizerJson);
  }

  // Forward pass -> [S, H] hidden states (Float32Array)
  forward(ids) {
    const cfg = this.cfg;
    const H = cfg.hidden_size;
    const S = ids.length;
    const nh = cfg.num_heads;
    const hd = H / nh;
    const t = this.t;

    const x = new Float32Array(S * H);
    const word = t["embeddings.word"];
    const pos = t["embeddings.position"];
    const tt = t["embeddings.token_type"];
    for (let s = 0; s < S; s++) {
      // roberta-style: positions are cumsum over the (all-real) mask plus
      // pad id, i.e. s + pad + 1 = s + position_offset
      const p = cfg.position_offset > 0 ? s + cfg.position_offset : s;
      addEmbeddingRow(x, s * H, word, ids[s], H);   // q8-aware gather
      for (let i = 0; i < H; i++) {
        x[s * H + i] += pos[p * H + i] + (tt ? tt[i] : 0);
      }
    }
    layerNorm(x, S, H, t["embeddings.norm.weight"], t["embeddings.norm.bias"],
              cfg.layer_norm_eps);

    let h = x;
    const L = cfg.num_layers;
    for (let l = 0; l < L; l++) {
      const lw = (name) => {
        const full = t["layers." + name + ".w"];
        const per = full.length / L;
        return full.subarray(l * per, (l + 1) * per);
      };
      const lb = (name) => {
        const full = t["layers." + name + ".b"];
        if (!full) return undefined;
        const per = full.length / L;
        return full.subarray(l * per, (l + 1) * per);
      };
      const ln = (name, part) => {
        const full = t["layers." + name + "." + part];
        const per = full.length / L;
        return full.subarray(l * per, (l + 1) * per);
      };

      const q = matmul(h, S, H, lw("q"), H, lb("q"));
      const k = matmul(h, S, H, lw("k"), H, lb("k"));
      const v = matmul(h, S, H, lw("v"), H, lb("v"));

      // attention per head
      const ctx = new Float32Array(S * H);
      const scale = 1 / Math.sqrt(hd);
      const scores = new Float32Array(S * S);
      for (let head = 0; head < nh; head++) {
        const off = head * hd;
        for (let i = 0; i < S; i++) {
          for (let j = 0; j < S; j++) {
            let dot = 0;
            for (let d = 0; d < hd; d++) {
              dot += q[i * H + off + d] * k[j * H + off + d];
            }
            scores[i * S + j] = dot * scale;
          }
        }
        softmaxRows(scores, S, S);
        for (let i = 0; i < S; i++) {
          for (let d = 0; d < hd; d++) {
            let acc = 0;
            for (let j = 0; j < S; j++) {
              acc += scores[i * S + j] * v[j * H + off + d];
            }
            ctx[i * H + off + d] = acc;
          }
        }
      }

      const attnOut = matmul(ctx, S, H, lw("o"), H, lb("o"));
      for (let i = 0; i < S * H; i++) attnOut[i] += h[i];
      layerNorm(attnOut, S, H, ln("attn_norm", "weight"),
                ln("attn_norm", "bias"), cfg.layer_norm_eps);

      const I = cfg.intermediate_size;
      const mid = matmul(attnOut, S, H, lw("fc1"), I, lb("fc1"));
      geluInplace(mid);
      const ffn = matmul(mid, S, I, lw("fc2"), H, lb("fc2"));
      for (let i = 0; i < S * H; i++) ffn[i] += attnOut[i];
      layerNorm(ffn, S, H, ln("ffn_norm", "weight"), ln("ffn_norm", "bias"),
                cfg.layer_norm_eps);
      h = ffn;
    }
    return h;
  }

  // Mean-pooled, L2-normalized sentence embedding (kjarni-wasm Model::encode)
  embed(text) {
    const ids = this.tokenizer.encode(text);
    const S = ids.length;
    const H = this.cfg.hidden_size;
    const hidden = this.forward(ids);
    const out = new Float32Array(H);
    for (let s = 0; s < S; s++) {
      for (let i = 0; i < H; i++) out[i] += hidden[s * H + i];
    }
    let norm = 0;
    for (let i = 0; i < H; i++) {
      out[i] /= S;
      norm += out[i] * out[i];
    }
    norm = Math.sqrt(norm) || 1;
    for (let i = 0; i < H; i++) out[i] /= norm;
    return out;
  }

  similarity(a, b) {
    return cosine(this.embed(a), this.embed(b));
  }
}

// ---------------------------------------------------------------------------
// In-memory index (kjarni-wasm WasmIndexBuilder / WasmSearch)
// ---------------------------------------------------------------------------

// BM25 tokenization identical to the Python engine (search/bm25.py:19 and
// the reference kjarni-search/src/bm25.rs): lowercase, split on
// non-alphanumeric, drop tokens shorter than 2 chars.
function bm25Tokenize(text) {
  return text.toLowerCase().split(/[^0-9a-z]+/).filter((t) => t.length >= 2);
}

class KjarniIndex {
  constructor(model) {
    this.model = model;
    this.docs = [];
    this.vectors = [];
    // BM25 state (k1=1.2, b=0.75 — same constants as bm25.rs:44)
    this.bm25 = { inverted: {}, docFreq: {}, docLengths: [], totalLength: 0 };
  }

  // `vector` is optional: pass a precomputed embedding (e.g. from an
  // exported kjarni-search.json) to skip the forward pass at load time.
  add(text, metadata, vector) {
    const id = this.docs.length;
    this.vectors.push(vector ? new Float32Array(vector)
                             : this.model.embed(text));
    this.docs.push({ text, metadata: metadata || {} });
    const tokens = bm25Tokenize(text);
    const b = this.bm25;
    b.docLengths.push(tokens.length);
    b.totalLength += tokens.length;
    const counts = {};
    for (const t of tokens) counts[t] = (counts[t] || 0) + 1;
    for (const t of Object.keys(counts)) {
      if (!b.inverted[t]) b.inverted[t] = [];
      b.inverted[t].push([id, counts[t]]);
      b.docFreq[t] = (b.docFreq[t] || 0) + 1;
    }
    return id;
  }

  _result(i, score) {
    return { score, text: this.docs[i].text,
             metadata: this.docs[i].metadata, id: i };
  }

  search(query, topK) {
    const q = this.model.embed(query);
    const scored = this.vectors.map((v, i) => this._result(i, cosine(q, v)));
    scored.sort((a, b) => b.score - a.score);
    return scored.slice(0, topK || 10);
  }

  // BM25 scoring, formula-identical to search/bm25.py:53 (idf =
  // ln((N - df + 0.5)/(df + 0.5) + 1), tf * (k1+1) / (tf + k1 * lengthNorm))
  searchKeyword(query, topK) {
    const N = this.docs.length;
    if (N === 0) return [];
    const k1 = 1.2, bp = 0.75;
    const b = this.bm25;
    const avg = b.totalLength / N;
    const scores = {};
    for (const term of bm25Tokenize(query)) {
      const postings = b.inverted[term];
      if (!postings) continue;
      const df = b.docFreq[term];
      const idf = Math.log((N - df + 0.5) / (df + 0.5) + 1.0);
      for (const [docId, tf] of postings) {
        const lengthNorm = 1.0 - bp + bp * (b.docLengths[docId] / avg);
        scores[docId] = (scores[docId] || 0) +
          idf * (tf * (k1 + 1.0)) / (tf + k1 * lengthNorm);
      }
    }
    const out = [];
    for (const d of Object.keys(scores)) {
      if (scores[d] > 0) out.push(this._result(Number(d), scores[d]));
    }
    out.sort((a, b2) => b2.score - a.score);
    return out.slice(0, topK || 10);
  }

  // Reciprocal-rank fusion, k=60 (search/hybrid.py:7, hybrid.rs:3-31):
  // fuse the keyword and semantic rankings by 1/(60 + rank + 1).
  searchHybrid(query, topK) {
    const limit = topK || 10;
    const kw = this.searchKeyword(query, limit);
    const sem = this.search(query, limit);
    const combined = {};
    for (let r = 0; r < kw.length; r++) {
      combined[kw[r].id] = (combined[kw[r].id] || 0) + 1.0 / (60.0 + r + 1);
    }
    for (let r = 0; r < sem.length; r++) {
      combined[sem[r].id] = (combined[sem[r].id] || 0) + 1.0 / (60.0 + r + 1);
    }
    const out = Object.keys(combined).map(
      (d) => this._result(Number(d), combined[d]));
    out.sort((a, b) => b.score - a.score);
    return out.slice(0, limit);
  }
}

// ---------------------------------------------------------------------------
// GPT-2 byte-level BPE tokenizer (reads HF tokenizer.json, model.type "BPE")
// ---------------------------------------------------------------------------

function bytesToUnicode() {
  // GPT-2's reversible byte<->unicode table
  const bs = [];
  for (let i = 33; i <= 126; i++) bs.push(i);
  for (let i = 161; i <= 172; i++) bs.push(i);
  for (let i = 174; i <= 255; i++) bs.push(i);
  const cs = bs.slice();
  let n = 0;
  for (let b = 0; b < 256; b++) {
    if (!bs.includes(b)) {
      bs.push(b);
      cs.push(256 + n);
      n += 1;
    }
  }
  const enc = {};
  const dec = {};
  for (let i = 0; i < bs.length; i++) {
    enc[bs[i]] = String.fromCharCode(cs[i]);
    dec[String.fromCharCode(cs[i])] = bs[i];
  }
  return { enc, dec };
}

const GPT2_SPLIT =
  /'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+/gu;

class KjarniBpeTokenizer {
  constructor(tk) {
    const model = tk.model || {};
    this.vocab = model.vocab || {};
    this.decoder = {};
    for (const [t, i] of Object.entries(this.vocab)) this.decoder[i] = t;
    this.ranks = {};
    (model.merges || []).forEach((m, i) => {
      const pair = Array.isArray(m) ? m.join(" ") : m;
      this.ranks[pair] = i;
    });
    const { enc, dec } = bytesToUnicode();
    this.byteEnc = enc;
    this.byteDec = dec;
    this.cache = {};
  }

  bpe(word) {
    if (this.cache[word] !== undefined) return this.cache[word];
    let parts = Array.from(word);
    while (parts.length > 1) {
      let best = null;
      let bestRank = Infinity;
      for (let i = 0; i < parts.length - 1; i++) {
        const r = this.ranks[parts[i] + " " + parts[i + 1]];
        if (r !== undefined && r < bestRank) {
          bestRank = r;
          best = i;
        }
      }
      if (best === null) break;
      parts = parts
        .slice(0, best)
        .concat([parts[best] + parts[best + 1]])
        .concat(parts.slice(best + 2));
    }
    this.cache[word] = parts;
    return parts;
  }

  encode(text) {
    const ids = [];
    const utf8 = new TextEncoder();
    for (const m of text.matchAll(GPT2_SPLIT)) {
      let mapped = "";
      for (const b of utf8.encode(m[0])) mapped += this.byteEnc[b];
      for (const tok of this.bpe(mapped)) {
        if (this.vocab[tok] !== undefined) ids.push(this.vocab[tok]);
      }
    }
    return ids;
  }

  decode(ids) {
    let text = "";
    for (const id of ids) {
      const tok = this.decoder[id];
      if (tok !== undefined) text += tok;
    }
    const bytes = [];
    for (const ch of text) {
      const b = this.byteDec[ch];
      if (b !== undefined) bytes.push(b);
    }
    return new TextDecoder().decode(new Uint8Array(bytes));
  }
}

// ---------------------------------------------------------------------------
// GPT-2 decoder (WasmGPT counterpart, kjarni-models/src/wasm/mod.rs:47)
// ---------------------------------------------------------------------------

class KjarniGPT {
  constructor(manifest, weightsBuf, tokenizerJson) {
    if (manifest.kind !== "gpt2") {
      throw new Error("bundle kind is not gpt2");
    }
    this.cfg = manifest.config;
    this.t = {};
    for (const rec of manifest.tensors) {
      this.t[rec.name] = tensorFromRecord(rec, weightsBuf);
    }
    const model = (tokenizerJson.model || {});
    this.tokenizer = model.type === "BPE"
      ? new KjarniBpeTokenizer(tokenizerJson)
      : new KjarniTokenizer(tokenizerJson);
    if (this.tokenizer instanceof KjarniTokenizer) {
      // Decoder prompts are continued, not classified: never wrap them in
      // [CLS]/[SEP] (a [SEP]==eos tail would end generation at step 0).
      this.tokenizer.clsId = undefined;
      this.tokenizer.sepId = undefined;
    }
  }

  static async load(baseUrl) {
    const strip = baseUrl.endsWith("/") ? baseUrl : baseUrl + "/";
    const [manifest, weights, tok] = await Promise.all([
      fetch(strip + "manifest.json").then((r) => r.json()),
      fetch(strip + "weights.bin").then((r) => r.arrayBuffer()),
      fetch(strip + "tokenizer.json").then((r) => r.json()),
    ]);
    return new KjarniGPT(manifest, weights, tok);
  }

  static fromBuffers(manifestJson, weightsArrayBuffer, tokenizerJson) {
    return new KjarniGPT(manifestJson, weightsArrayBuffer, tokenizerJson);
  }

  newCache() {
    return { k: [], v: [], len: 0 }; // per-layer arrays of [H*D] rows
  }

  // run `ids` through the decoder starting at cache.len; returns last logits
  forwardStep(ids, cache) {
    const cfg = this.cfg;
    const H = cfg.hidden_size;
    const nh = cfg.num_heads;
    const hd = H / nh;
    const L = cfg.num_layers;
    const eps = cfg.layer_norm_eps;
    const t = this.t;
    const S = ids.length;
    const past = cache.len;

    let x = new Float32Array(S * H);
    const wpe = t["wpe"];
    for (let s = 0; s < S; s++) {
      addEmbeddingRow(x, s * H, t["embed"], ids[s], H);  // q8-aware gather
      for (let i = 0; i < H; i++) {
        x[s * H + i] += wpe[(past + s) * H + i];
      }
    }

    const sub = (name, l, per) => t[name].subarray(l * per, (l + 1) * per);
    for (let l = 0; l < L; l++) {
      if (cache.k.length <= l) {
        cache.k.push([]);
        cache.v.push([]);
      }
      const ln1w = sub("layers.ln1_w", l, H);
      const ln1b = sub("layers.ln1_b", l, H);
      const hn = new Float32Array(x);
      layerNorm(hn, S, H, ln1w, ln1b, eps);
      const qkv = matmul(hn, S, H, sub("layers.c_attn_w", l, H * 3 * H),
                         3 * H, sub("layers.c_attn_b", l, 3 * H));
      // append this step's K/V rows to the cache
      for (let s = 0; s < S; s++) {
        cache.k[l].push(qkv.slice(s * 3 * H + H, s * 3 * H + 2 * H));
        cache.v[l].push(qkv.slice(s * 3 * H + 2 * H, s * 3 * H + 3 * H));
      }
      const T = past + S;
      const ctx = new Float32Array(S * H);
      const scale = 1 / Math.sqrt(hd);
      for (let head = 0; head < nh; head++) {
        const off = head * hd;
        for (let s = 0; s < S; s++) {
          const limit = past + s + 1; // causal
          const scores = new Float32Array(limit);
          for (let j = 0; j < limit; j++) {
            let dot = 0;
            const krow = cache.k[l][j];
            for (let d = 0; d < hd; d++) {
              dot += qkv[s * 3 * H + off + d] * krow[off + d];
            }
            scores[j] = dot * scale;
          }
          softmaxRows(scores, 1, limit);
          for (let d = 0; d < hd; d++) {
            let acc = 0;
            for (let j = 0; j < limit; j++) {
              acc += scores[j] * cache.v[l][j][off + d];
            }
            ctx[s * H + off + d] = acc;
          }
        }
      }
      const attnOut = matmul(ctx, S, H, sub("layers.c_proj_w", l, H * H), H,
                             sub("layers.c_proj_b", l, H));
      for (let i = 0; i < S * H; i++) x[i] += attnOut[i];

      const hn2 = new Float32Array(x);
      layerNorm(hn2, S, H, sub("layers.ln2_w", l, H),
                sub("layers.ln2_b", l, H), eps);
      const I = t["layers.fc_w"].length / (L * H);
      const mid = matmul(hn2, S, H, sub("layers.fc_w", l, H * I), I,
                         sub("layers.fc_b", l, I));
      geluInplace(mid); // GPT-2 uses gelu_new (tanh) — exact here
      const ffn = matmul(mid, S, I, sub("layers.mlp_proj_w", l, I * H), H,
                         sub("layers.mlp_proj_b", l, H));
      for (let i = 0; i < S * H; i++) x[i] += ffn[i];
    }
    cache.len = past + S;

    const lnf = new Float32Array(x.subarray((S - 1) * H, S * H));
    layerNorm(lnf, 1, H, t["lnf_w"], t["lnf_b"], eps);
    // logits = lnf @ wte^T; a q8 wte pre-scales lnf once (per-H-channel
    // scales) so the vocab loop runs over raw int8
    const V = cfg.vocab_size;
    const logits = new Float32Array(V);
    const wte = t["embed"];
    if (wte instanceof Q8Tensor) {
      const lnfS = new Float32Array(H);
      for (let i = 0; i < H; i++) lnfS[i] = lnf[i] * wte.s[i];
      const q = wte.q;
      for (let vIdx = 0; vIdx < V; vIdx++) {
        let dot = 0;
        const woff = vIdx * H;
        for (let i = 0; i < H; i++) dot += lnfS[i] * q[woff + i];
        logits[vIdx] = dot;
      }
    } else {
      for (let vIdx = 0; vIdx < V; vIdx++) {
        let dot = 0;
        const woff = vIdx * H;
        for (let i = 0; i < H; i++) dot += lnf[i] * wte[woff + i];
        logits[vIdx] = dot;
      }
    }
    return logits;
  }

  // Greedy generation (WasmGPT generate); onToken optional callback
  generate(prompt, maxNewTokens, onToken) {
    const ids = this.tokenizer.encode(prompt);
    const cache = this.newCache();
    let logits = this.forwardStep(ids, cache);
    const outIds = [];
    const eos = this.cfg.eos_token_id;
    for (let step = 0; step < (maxNewTokens || 32); step++) {
      let best = 0;
      for (let i = 1; i < logits.length; i++) {
        if (logits[i] > logits[best]) best = i;
      }
      if (eos !== null && best === eos) break;
      outIds.push(best);
      if (onToken && onToken(this.tokenizer.decode([best])) === false) break;
      if (cache.len >= this.cfg.max_seq_len - 1) break;
      logits = this.forwardStep([best], cache);
    }
    return this.tokenizer.decode(outIds);
  }
}

if (typeof module !== "undefined" && module.exports) {
  module.exports = { KjarniModel, KjarniIndex, KjarniTokenizer,
                     KjarniBpeTokenizer, KjarniGPT, Q8Tensor };
}
