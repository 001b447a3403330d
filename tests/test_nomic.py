"""NomicBERT flavor tests: fused Wqkv split, rotary QK, SwiGLU FFN — verified
against an independent numpy reference implementation (HF needs remote code,
so no torch golden is possible offline)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import build_word_tokenizer

from kjarni_tpu.models import bert as kbert
from kjarni_tpu.weights.safetensors_loader import ModelWeights


def make_nomic_dir(d, seed=0, n_embd=32, n_layer=2, n_head=4, vocab=39 + 5):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.1):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    n_inner = n_embd * 2
    tensors = {
        "embeddings.word_embeddings.weight": w(vocab, n_embd),
        "embeddings.token_type_embeddings.weight": w(2, n_embd),
        "emb_ln.weight": np.ones(n_embd, np.float32),
        "emb_ln.bias": np.zeros(n_embd, np.float32),
    }
    for i in range(n_layer):
        p = f"encoder.layers.{i}"
        tensors[f"{p}.attn.Wqkv.weight"] = w(3 * n_embd, n_embd)
        tensors[f"{p}.attn.out_proj.weight"] = w(n_embd, n_embd)
        tensors[f"{p}.norm1.weight"] = np.ones(n_embd, np.float32)
        tensors[f"{p}.norm1.bias"] = np.zeros(n_embd, np.float32)
        tensors[f"{p}.mlp.fc11.weight"] = w(n_inner, n_embd)
        tensors[f"{p}.mlp.fc12.weight"] = w(n_inner, n_embd)
        tensors[f"{p}.mlp.fc2.weight"] = w(n_embd, n_inner)
        tensors[f"{p}.norm2.weight"] = np.ones(n_embd, np.float32)
        tensors[f"{p}.norm2.bias"] = np.zeros(n_embd, np.float32)
    d.mkdir(parents=True, exist_ok=True)
    save_file(tensors, str(d / "model.safetensors"))
    config = {"model_type": "nomic_bert", "vocab_size": vocab, "n_embd": n_embd,
              "n_layer": n_layer, "n_head": n_head, "n_inner": n_inner,
              "n_positions": 64, "rotary_emb_base": 1000.0,
              "activation_function": "swiglu", "layer_norm_epsilon": 1e-12}
    (d / "config.json").write_text(json.dumps(config))
    build_word_tokenizer(d / "tokenizer.json")
    return tensors, config


def np_layer_norm(x, w, b, eps=1e-12):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_rope(x, theta, positions):
    # x: [B, H, S, D]; duplicated-half-freq tables, rotate-half convention
    D = x.shape[-1]
    inv = 1.0 / theta ** (np.arange(0, D, 2) / D)
    ang = np.outer(positions, inv)
    cos = np.concatenate([np.cos(ang), np.cos(ang)], -1)[None, None]
    sin = np.concatenate([np.sin(ang), np.sin(ang)], -1)[None, None]
    half = D // 2
    rot = np.concatenate([-x[..., half:], x[..., :half]], -1)
    return x * cos + rot * sin


def np_reference_nomic(tensors, config, ids, mask):
    H = config["n_head"]
    n_embd = config["n_embd"]
    D = n_embd // H
    x = tensors["embeddings.word_embeddings.weight"][ids]
    x = x + tensors["embeddings.token_type_embeddings.weight"][0]
    x = np_layer_norm(x, tensors["emb_ln.weight"], tensors["emb_ln.bias"])
    B, S, _ = x.shape
    bias = (1 - mask.astype(np.float32)) * -1e9

    def silu(v):
        return v / (1 + np.exp(-v))

    for i in range(config["n_layer"]):
        p = f"encoder.layers.{i}"
        qkv = x @ tensors[f"{p}.attn.Wqkv.weight"].T
        q, k, v = np.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, S, H, D).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        q = np_rope(q, config["rotary_emb_base"], np.arange(S))
        k = np_rope(k, config["rotary_emb_base"], np.arange(S))
        scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(D)
        scores = scores + bias[:, None, None, :]
        e = np.exp(scores - scores.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        ctx = (probs @ v).transpose(0, 2, 1, 3).reshape(B, S, n_embd)
        attn_out = ctx @ tensors[f"{p}.attn.out_proj.weight"].T
        x = np_layer_norm(x + attn_out, tensors[f"{p}.norm1.weight"],
                          tensors[f"{p}.norm1.bias"])
        gate = silu(x @ tensors[f"{p}.mlp.fc11.weight"].T)
        up = x @ tensors[f"{p}.mlp.fc12.weight"].T
        ffn = (gate * up) @ tensors[f"{p}.mlp.fc2.weight"].T
        x = np_layer_norm(x + ffn, tensors[f"{p}.norm2.weight"],
                          tensors[f"{p}.norm2.bias"])
    return x


class TestNomic:
    def test_forward_matches_numpy_reference(self, tmp_path):
        tensors, config = make_nomic_dir(tmp_path, seed=1)
        cfg = kbert.BertConfig.from_hf(config)
        assert cfg.flavor == "nomic" and cfg.swiglu
        params = kbert.load_params(ModelWeights(tmp_path), cfg)
        rng = np.random.default_rng(0)
        ids = rng.integers(5, 40, (2, 7)).astype(np.int32)
        mask = np.ones((2, 7), dtype=np.int32)
        mask[1, 5:] = 0
        expected = np_reference_nomic(tensors, config, ids, mask)
        got = np.asarray(kbert.encode(params, cfg, jnp.asarray(ids),
                                      jnp.asarray(mask)))
        m = mask.astype(bool)
        np.testing.assert_allclose(got[m], expected[m], atol=1e-4, rtol=1e-4)

    def test_sentence_encoder_wrapper(self, tmp_path):
        make_nomic_dir(tmp_path, seed=2)
        from kjarni_tpu.models.encoder_models import SentenceEncoder
        enc = SentenceEncoder(tmp_path)
        v = enc.encode("hello world")
        assert v.shape == (enc.hidden_size,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    def test_rotary_positions_matter(self, tmp_path):
        # swapping token order must change (rotary) outputs
        make_nomic_dir(tmp_path, seed=3)
        from kjarni_tpu.models.encoder_models import SentenceEncoder
        enc = SentenceEncoder(tmp_path)
        a = enc.encode("doctor physician nurse")
        b = enc.encode("nurse physician doctor")
        assert not np.allclose(a, b)
