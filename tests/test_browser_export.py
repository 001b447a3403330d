"""Browser bundle export (web/kjarni.js counterpart of kjarni-wasm).

No JS runtime exists in this image, so the JS engine's algorithm is validated
by a numpy mirror that consumes the exported bundle exactly as kjarni.js does
(same tensor records, same tokenization, tanh gelu, per-head attention loops)
and must match the production Embedder to >=0.999 cosine.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from helpers import tiny_bert_dir

from kjarni_tpu.export.browser import export_browser_model, load_browser_bundle


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    model_dir = tmp_path_factory.mktemp("web_model")
    tiny_bert_dir(model_dir, seed=5)
    out = tmp_path_factory.mktemp("web_dist")
    manifest = export_browser_model(model_dir, out)
    return model_dir, out, manifest


class TestExportFormat:
    def test_manifest_and_roundtrip(self, bundle):
        model_dir, out, manifest = bundle
        assert manifest["format"] == "kjarni-browser-v1"
        assert (out / "weights.bin").stat().st_size == manifest["weights_bytes"]
        assert (out / "tokenizer.json").exists()
        _, tensors = load_browser_bundle(out)
        assert "embeddings.word" in tensors
        assert tensors["layers.q.w"].shape[0] == manifest["config"]["num_layers"]

    def test_roundtrip_bitexact(self, bundle):
        model_dir, out, _ = bundle
        import kjarni_tpu.models.bert as kbert
        from kjarni_tpu.weights.safetensors_loader import ModelWeights
        cfg = kbert.BertConfig.from_hf(
            json.loads((model_dir / "config.json").read_text()))
        params = kbert.load_params(ModelWeights(model_dir), cfg, np.float32)
        _, tensors = load_browser_bundle(out)
        np.testing.assert_array_equal(tensors["embeddings.word"],
                                      params["embeddings"]["word"])
        np.testing.assert_array_equal(
            tensors["layers.fc1.w"].reshape(params["layers"]["fc1"]["w"].shape),
            params["layers"]["fc1"]["w"])

    def test_cli_export(self, bundle, tmp_path, capsys):
        model_dir, _, _ = bundle
        from kjarni_tpu.cli.main import main
        rc = main(["export-browser", str(model_dir), "-o", str(tmp_path / "d"),
                   "--format", "json"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip())
        assert out["tensors"] > 0

    def test_rejects_unsupported_arch(self, tmp_path):
        from kjarni_tpu.core.errors import InvalidConfigError
        (tmp_path / "config.json").write_text(json.dumps(
            {"model_type": "llama", "vocab_size": 8, "hidden_size": 8,
             "num_hidden_layers": 1, "num_attention_heads": 1,
             "intermediate_size": 8, "max_position_embeddings": 8}))
        with pytest.raises(InvalidConfigError):
            export_browser_model(tmp_path, tmp_path / "out")


# ---------------------------------------------------------------------------
# numpy mirror of web/kjarni.js — keep in lockstep with the JS
# ---------------------------------------------------------------------------

def js_tokenize(tok_json: dict, text: str) -> list[int]:
    model = tok_json.get("model", {})
    vocab = model.get("vocab", {})
    ttype = model.get("type", "WordPiece")
    unk = model.get("unk_token", "[UNK]")
    prefix = model.get("continuing_subword_prefix", "##")
    unk_id = vocab.get(unk, 0)

    import unicodedata
    t = text.lower()
    t = "".join(c for c in unicodedata.normalize("NFD", t)
                if not unicodedata.combining(c))
    words = []
    for chunk in t.split():
        cur = ""
        for ch in chunk:
            if unicodedata.category(ch)[0] in ("P", "S"):
                if cur:
                    words.append(cur)
                    cur = ""
                words.append(ch)
            else:
                cur += ch
        if cur:
            words.append(cur)

    ids = []
    for w in words:
        if ttype == "WordLevel":
            ids.append(vocab.get(w, unk_id))
            continue
        if len(w) > model.get("max_input_chars_per_word", 100):
            ids.append(unk_id)
            continue
        start, sub_ids, bad = 0, [], False
        while start < len(w):
            end = len(w)
            tid = None
            while start < end:
                sub = (prefix if start > 0 else "") + w[start:end]
                if sub in vocab:
                    tid = vocab[sub]
                    break
                end -= 1
            if tid is None:
                bad = True
                break
            sub_ids.append(tid)
            start = end
        ids.extend([unk_id] if bad else sub_ids)
    out = []
    if "[CLS]" in vocab:
        out.append(vocab["[CLS]"])
    out.extend(ids)
    if "[SEP]" in vocab:
        out.append(vocab["[SEP]"])
    return out


def js_forward(manifest: dict, t: dict, ids: list[int]) -> np.ndarray:
    cfg = manifest["config"]
    H, nh = cfg["hidden_size"], cfg["num_heads"]
    hd = H // nh
    L = cfg["num_layers"]
    eps = cfg["layer_norm_eps"]
    S = len(ids)

    def layer_norm(x, w, b):
        m = x.mean(-1, keepdims=True)
        v = x.var(-1, keepdims=True)
        return (x - m) / np.sqrt(v + eps) * w + b

    def gelu_tanh(x):
        c = np.sqrt(2 / np.pi)
        return 0.5 * x * (1 + np.tanh(c * (x + 0.044715 * x ** 3)))

    word = t["embeddings.word"]
    pos = t["embeddings.position"]
    off = cfg["position_offset"]
    positions = np.arange(S) + (off if off > 0 else 0)
    x = word[ids] + pos[positions]
    if "embeddings.token_type" in t:
        x = x + t["embeddings.token_type"][0]
    x = layer_norm(x, t["embeddings.norm.weight"], t["embeddings.norm.bias"])

    for l in range(L):
        def lw(name):
            return t[f"layers.{name}.w"][l]

        def lb(name):
            key = f"layers.{name}.b"
            return t[key][l] if key in t else 0.0

        def ln(name, part):
            return t[f"layers.{name}.{part}"][l]

        q = x @ lw("q") + lb("q")
        k = x @ lw("k") + lb("k")
        v = x @ lw("v") + lb("v")
        ctx = np.zeros_like(x)
        for h in range(nh):
            sl = slice(h * hd, (h + 1) * hd)
            scores = q[:, sl] @ k[:, sl].T / np.sqrt(hd)
            scores = scores - scores.max(-1, keepdims=True)
            p = np.exp(scores)
            p /= p.sum(-1, keepdims=True)
            ctx[:, sl] = p @ v[:, sl]
        x = layer_norm(x + ctx @ lw("o") + lb("o"),
                       ln("attn_norm", "weight"), ln("attn_norm", "bias"))
        ffn = gelu_tanh(x @ lw("fc1") + lb("fc1")) @ lw("fc2") + lb("fc2")
        x = layer_norm(x + ffn, ln("ffn_norm", "weight"), ln("ffn_norm", "bias"))
    return x


def js_embed(out_dir: Path, text: str) -> np.ndarray:
    manifest, tensors = load_browser_bundle(out_dir)
    # reshape stacked layer tensors the way kjarni.js subarrays them
    tok = json.loads((out_dir / "tokenizer.json").read_text())
    ids = js_tokenize(tok, text)
    hidden = js_forward(manifest, tensors, ids)
    pooled = hidden.mean(axis=0)
    return pooled / (np.linalg.norm(pooled) or 1.0)


class TestJsAlgorithmParity:
    def test_embed_matches_production(self, bundle):
        model_dir, out, _ = bundle
        from kjarni_tpu.tasks.embedder import Embedder
        emb = Embedder(str(model_dir), quiet=True)
        for text in ("hello world the doctor went", "doctor", "physician"):
            want = np.asarray(emb.embed(text))
            got = js_embed(out, text)
            cos = float(got @ want / (np.linalg.norm(got)
                                      * np.linalg.norm(want)))
            assert cos > 0.999, f"{text}: cosine {cos}"

    def test_similarity_matches(self, bundle):
        model_dir, out, _ = bundle
        from kjarni_tpu.tasks.embedder import Embedder
        emb = Embedder(str(model_dir), quiet=True)
        want = emb.similarity("doctor", "physician")
        a, b = js_embed(out, "doctor"), js_embed(out, "physician")
        got = float(a @ b)
        assert abs(got - want) < 5e-3

    def test_wordpiece_mirror_matches_hf(self, tmp_path):
        """The mirrored WordPiece matches the HF tokenizers library."""
        from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
        vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
                 "un": 4, "##aff": 5, "##able": 6, "hello": 7, "world": 8,
                 ",": 9, "##b": 10}
        tk = Tokenizer(models.WordPiece(vocab, unk_token="[UNK]"))
        tk.normalizer = normalizers.BertNormalizer(lowercase=True)
        tk.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
        tk.save(str(tmp_path / "tok.json"))
        spec = json.loads((tmp_path / "tok.json").read_text())
        for text in ("Hello world", "unaffable", "hello, world", "xyzzy"):
            want = tk.encode(text).ids
            got = js_tokenize(spec, text)
            # mirror adds CLS/SEP only when present in vocab AND the HF
            # tokenizer has a post-processor; this one has none, so strip
            got = [i for i in got if i not in (vocab["[CLS]"], vocab["[SEP]"])]
            assert got == want, text


# ---------------------------------------------------------------------------
# GPT-2 bundle (WasmGPT counterpart) — numpy mirror of KjarniGPT
# ---------------------------------------------------------------------------

def js_gpt_generate(out_dir: Path, prompt_ids: list[int],
                    max_new: int) -> list[int]:
    """Mirror of web/kjarni.js KjarniGPT.forwardStep/generate."""
    manifest, t = load_browser_bundle(out_dir)
    cfg = manifest["config"]
    H, nh, L = cfg["hidden_size"], cfg["num_heads"], cfg["num_layers"]
    hd = H // nh
    eps = cfg["layer_norm_eps"]

    def layer_norm(x, w, b):
        m = x.mean(-1, keepdims=True)
        v = x.var(-1, keepdims=True)
        return (x - m) / np.sqrt(v + eps) * w + b

    def gelu_tanh(x):
        c = np.sqrt(2 / np.pi)
        return 0.5 * x * (1 + np.tanh(c * (x + 0.044715 * x ** 3)))

    ks = [np.zeros((0, H), np.float32) for _ in range(L)]
    vs = [np.zeros((0, H), np.float32) for _ in range(L)]
    state = {"len": 0}

    def step(ids):
        S = len(ids)
        past = state["len"]
        x = t["embed"][ids] + t["wpe"][past:past + S]
        for l in range(L):
            hn = layer_norm(x, t["layers.ln1_w"][l], t["layers.ln1_b"][l])
            qkv = hn @ t["layers.c_attn_w"][l] + t["layers.c_attn_b"][l]
            q, k, v = np.split(qkv, 3, axis=-1)
            ks[l] = np.concatenate([ks[l], k])
            vs[l] = np.concatenate([vs[l], v])
            ctx = np.zeros_like(x)
            for h in range(nh):
                sl = slice(h * hd, (h + 1) * hd)
                for s in range(S):
                    limit = past + s + 1
                    sc = (ks[l][:limit, sl] @ q[s, sl]) / np.sqrt(hd)
                    sc = np.exp(sc - sc.max())
                    sc /= sc.sum()
                    ctx[s, sl] = sc @ vs[l][:limit, sl]
            x = x + ctx @ t["layers.c_proj_w"][l] + t["layers.c_proj_b"][l]
            hn = layer_norm(x, t["layers.ln2_w"][l], t["layers.ln2_b"][l])
            mid = gelu_tanh(hn @ t["layers.fc_w"][l] + t["layers.fc_b"][l])
            x = x + mid @ t["layers.mlp_proj_w"][l] + t["layers.mlp_proj_b"][l]
        state["len"] = past + S
        last = layer_norm(x[-1:], t["lnf_w"], t["lnf_b"])[0]
        return last @ t["embed"].T

    logits = step(prompt_ids)
    out = []
    for _ in range(max_new):
        nxt = int(np.argmax(logits))
        if cfg.get("eos_token_id") is not None and nxt == cfg["eos_token_id"]:
            break
        out.append(nxt)
        logits = step([nxt])
    return out


class TestGptBundle:
    @pytest.fixture(scope="class")
    def gpt_bundle(self, tmp_path_factory):
        import torch
        from helpers import build_word_tokenizer, save_torch_model
        from transformers import GPT2Config, GPT2LMHeadModel
        d = tmp_path_factory.mktemp("web_gpt")
        vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
        config = GPT2Config(vocab_size=len(vm), n_embd=32, n_layer=2,
                            n_head=4, n_positions=64, bos_token_id=2,
                            eos_token_id=3)
        torch.manual_seed(17)
        save_torch_model(d, GPT2LMHeadModel(config).eval(), config)
        out = tmp_path_factory.mktemp("web_gpt_dist")
        manifest = export_browser_model(d, out)
        return d, out, manifest

    def test_gpt_manifest(self, gpt_bundle):
        _, out, manifest = gpt_bundle
        assert manifest["kind"] == "gpt2"
        _, tensors = load_browser_bundle(out)
        assert "layers.c_attn_w" in tensors
        assert "lm_head" not in tensors  # tied; JS reuses embed

    def test_gpt_greedy_matches_production(self, gpt_bundle):
        d, out, _ = gpt_bundle
        from kjarni_tpu.models.decoder_lm import DecoderLM
        from kjarni_tpu.generate.sampling import GenerationConfig
        lm = DecoderLM(d, max_context=64)
        cfg = GenerationConfig.greedy(max_new_tokens=8, max_length=64)
        prompt = "hello world the"
        want = [st.id for st in lm.generate_stream(prompt, config=cfg)]
        ids = lm.tokenizer.encode(prompt, add_special_tokens=False)
        got = js_gpt_generate(out, ids, 8)
        assert got == want


class TestBpeMirror:
    """The JS byte-level BPE (mirrored here) matches the HF tokenizers lib."""

    def js_bpe_encode(self, spec: dict, text: str) -> list[int]:
        import regex
        model = spec["model"]
        vocab = model["vocab"]
        ranks = {}
        for i, m in enumerate(model["merges"]):
            pair = " ".join(m) if isinstance(m, list) else m
            ranks[pair] = i
        # bytes_to_unicode (GPT-2 standard)
        bs = list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
        cs = bs[:]
        n = 0
        for b in range(256):
            if b not in bs:
                bs.append(b)
                cs.append(256 + n)
                n += 1
        enc = {b: chr(c) for b, c in zip(bs, cs)}
        pat = regex.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
            r"|\s+(?!\S)|\s+")
        ids = []
        for m in pat.findall(text):
            word = "".join(enc[b] for b in m.encode("utf-8"))
            parts = list(word)
            while len(parts) > 1:
                best, best_rank = None, float("inf")
                for i in range(len(parts) - 1):
                    r = ranks.get(parts[i] + " " + parts[i + 1])
                    if r is not None and r < best_rank:
                        best, best_rank = i, r
                if best is None:
                    break
                parts = (parts[:best] + [parts[best] + parts[best + 1]]
                         + parts[best + 2:])
            for tok in parts:
                if tok in vocab:
                    ids.append(vocab[tok])
        return ids

    def test_matches_hf_bpe(self, tmp_path):
        from tokenizers import Tokenizer, models, pre_tokenizers, decoders
        # tiny byte-level BPE trained on a few strings
        tk = Tokenizer(models.BPE(unk_token=None))
        tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tk.decoder = decoders.ByteLevel()
        from tokenizers.trainers import BpeTrainer
        trainer = BpeTrainer(
            vocab_size=300, special_tokens=[],
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
        tk.train_from_iterator(
            ["hello world", "the doctor went home", "hello there doctor",
             "worlds apart", "1234 numbers!"], trainer)
        tk.save(str(tmp_path / "bpe.json"))
        spec = json.loads((tmp_path / "bpe.json").read_text())
        for text in ("hello world", "the doctor", "hello, world!",
                     "numbers 1234", "unseen zebra words"):
            want = tk.encode(text).ids
            got = self.js_bpe_encode(spec, text)
            assert got == want, text
