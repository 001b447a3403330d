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
}

// ---------------------------------------------------------------------------
// Math helpers (Float32Array)
// ---------------------------------------------------------------------------

// y[S,N] = x[S,K] @ w[K,N] + b[N]
function matmul(x, S, K, w, N, b) {
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
      this.t[rec.name] = new Float32Array(weightsBuf, rec.offset, rec.size);
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
      for (let i = 0; i < H; i++) {
        x[s * H + i] = word[ids[s] * H + i] + pos[p * H + i] +
          (tt ? tt[i] : 0);
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

class KjarniIndex {
  constructor(model) {
    this.model = model;
    this.docs = [];
    this.vectors = [];
  }

  add(text, metadata) {
    this.vectors.push(this.model.embed(text));
    this.docs.push({ text, metadata: metadata || {} });
    return this.docs.length - 1;
  }

  search(query, topK) {
    const q = this.model.embed(query);
    const scored = this.vectors.map((v, i) => ({
      score: cosine(q, v),
      text: this.docs[i].text,
      metadata: this.docs[i].metadata,
      id: i,
    }));
    scored.sort((a, b) => b.score - a.score);
    return scored.slice(0, topK || 10);
  }
}

if (typeof module !== "undefined" && module.exports) {
  module.exports = { KjarniModel, KjarniIndex, KjarniTokenizer };
}
