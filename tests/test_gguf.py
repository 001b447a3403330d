"""GGUF loader tests: container parsing, block dequantization vs independent
scalar reference, name mapping, config synthesis, end-to-end llama load."""

import struct

import numpy as np
import pytest

from kjarni_tpu.weights.gguf import (GGML_F16, GGML_F32, GGML_Q4_K, GGML_Q6_K,
                                     GGML_Q8_0, GgufFile, GgufWeights,
                                     dequant_q4_k, dequant_q6_k, dequant_q8_0,
                                     gguf_to_hf_name)

ALIGN = 32


# ---------------------------------------------------------------------------
# Test-side GGUF writer (independent of the loader)
# ---------------------------------------------------------------------------

def _pack_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _pack_kv(key: str, value) -> bytes:
    out = _pack_string(key)
    if isinstance(value, bool):
        out += struct.pack("<I", 7) + struct.pack("<?", value)
    elif isinstance(value, int):
        out += struct.pack("<I", 4) + struct.pack("<I", value)
    elif isinstance(value, float):
        out += struct.pack("<I", 6) + struct.pack("<f", value)
    elif isinstance(value, str):
        out += struct.pack("<I", 8) + _pack_string(value)
    else:
        raise TypeError(type(value))
    return out


def write_gguf(path, tensors: dict, metadata: dict):
    """tensors: name -> (dims_ne, ggml_type, raw_bytes)."""
    header = struct.pack("<IIQQ", 0x46554747, 3, len(tensors), len(metadata))
    kv = b"".join(_pack_kv(k, v) for k, v in metadata.items())
    infos = b""
    data_parts = []
    offset = 0
    for name, (dims, ttype, raw) in tensors.items():
        infos += _pack_string(name)
        infos += struct.pack("<I", len(dims))
        for d in dims:
            infos += struct.pack("<Q", d)
        infos += struct.pack("<I", ttype)
        infos += struct.pack("<Q", offset)
        pad = (-len(raw)) % ALIGN
        data_parts.append(raw + b"\x00" * pad)
        offset += len(raw) + pad
    head = header + kv + infos
    head_pad = (-len(head)) % ALIGN
    with open(path, "wb") as f:
        f.write(head + b"\x00" * head_pad + b"".join(data_parts))


def make_q8_0(values: np.ndarray) -> bytes:
    """Quantize to Q8_0 blocks (scale = absmax/127)."""
    blocks = values.reshape(-1, 32)
    out = b""
    for blk in blocks:
        d = np.abs(blk).max() / 127.0 or 1e-8
        qs = np.clip(np.round(blk / d), -127, 127).astype(np.int8)
        out += np.float16(d).tobytes() + qs.tobytes()
    return out


def random_q4k_block(rng) -> bytes:
    d = np.float16(rng.uniform(0.01, 0.1))
    dmin = np.float16(rng.uniform(0.0, 0.05))
    scales = rng.integers(0, 256, 12, dtype=np.uint8).tobytes()
    qs = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
    return d.tobytes() + dmin.tobytes() + scales + qs


def random_q6k_block(rng) -> bytes:
    ql = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
    qh = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    scales = rng.integers(-64, 64, 16, dtype=np.int8).tobytes()
    d = np.float16(rng.uniform(0.01, 0.1)).tobytes()
    return ql + qh + scales + d


# scalar reference dequantizers implementing the ggml layout directly
def ref_dequant_q4k(raw: bytes) -> np.ndarray:
    b = np.frombuffer(raw, dtype=np.uint8)
    d = b[0:2].view(np.float16)[0].astype(np.float32)
    dmin = b[2:4].view(np.float16)[0].astype(np.float32)
    scales = b[4:16]
    qs = b[16:144]
    sc = np.zeros(8); mi = np.zeros(8)
    for j in range(4):
        sc[j] = scales[j] & 63
        mi[j] = scales[j + 4] & 63
    for j in range(4, 8):
        sc[j] = (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4)
        mi[j] = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
    y = np.zeros(256, dtype=np.float32)
    pos = 0
    q = 0
    is_ = 0
    for _ in range(4):  # 4 chunks of 64
        d1, m1 = d * sc[is_], dmin * mi[is_]
        d2, m2 = d * sc[is_ + 1], dmin * mi[is_ + 1]
        for l in range(32):
            y[pos + l] = d1 * (qs[q + l] & 0xF) - m1
        for l in range(32):
            y[pos + 32 + l] = d2 * (qs[q + l] >> 4) - m2
        pos += 64
        q += 32
        is_ += 2
    return y


def ref_dequant_q6k(raw: bytes) -> np.ndarray:
    b = np.frombuffer(raw, dtype=np.uint8)
    ql = b[0:128]
    qh = b[128:192]
    scales = b[192:208].view(np.int8)
    d = b[208:210].view(np.float16)[0].astype(np.float32)
    y = np.zeros(256, dtype=np.float32)
    for half in range(2):
        base = 128 * half
        qlh = ql[64 * half:64 * half + 64]
        qhh = qh[32 * half:32 * half + 32]
        sb = 8 * half
        for l in range(32):
            is_ = l // 16
            lo1, lo2 = int(qlh[l]), int(qlh[l + 32])
            h = int(qhh[l])
            q1 = ((lo1 & 0xF) | ((h & 3) << 4)) - 32
            q2 = ((lo2 & 0xF) | (((h >> 2) & 3) << 4)) - 32
            q3 = ((lo1 >> 4) | (((h >> 4) & 3) << 4)) - 32
            q4 = ((lo2 >> 4) | (((h >> 6) & 3) << 4)) - 32
            y[base + l] = d * scales[sb + is_] * q1
            y[base + l + 32] = d * scales[sb + is_ + 2] * q2
            y[base + l + 64] = d * scales[sb + is_ + 4] * q3
            y[base + l + 96] = d * scales[sb + is_ + 6] * q4
    return y


class TestDequant:
    def test_q8_0_roundtrip(self):
        rng = np.random.default_rng(0)
        vals = rng.standard_normal(64).astype(np.float32)
        raw = np.frombuffer(make_q8_0(vals), dtype=np.uint8)
        got = dequant_q8_0(raw)
        np.testing.assert_allclose(got, vals, atol=0.02)

    def test_q4_k_matches_scalar_reference(self):
        rng = np.random.default_rng(1)
        raws = [random_q4k_block(rng) for _ in range(3)]
        raw = np.frombuffer(b"".join(raws), dtype=np.uint8)
        got = dequant_q4_k(raw)
        expected = np.concatenate([ref_dequant_q4k(r) for r in raws])
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_q6_k_matches_scalar_reference(self):
        rng = np.random.default_rng(2)
        raws = [random_q6k_block(rng) for _ in range(3)]
        raw = np.frombuffer(b"".join(raws), dtype=np.uint8)
        got = dequant_q6_k(raw)
        expected = np.concatenate([ref_dequant_q6k(r) for r in raws])
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestGgufContainer:
    def test_parse_and_read(self, tmp_path):
        rng = np.random.default_rng(3)
        w = rng.standard_normal((4, 8)).astype(np.float32)  # [out=4, in=8]
        tensors = {
            "token_embd.weight": ([8, 4], GGML_F32, w.tobytes()),
            "blk.0.attn_q.weight": ([8, 4], GGML_F16,
                                    w.astype(np.float16).tobytes()),
        }
        md = {"general.architecture": "llama", "llama.block_count": 1}
        write_gguf(tmp_path / "m.gguf", tensors, md)
        g = GgufFile(tmp_path / "m.gguf")
        assert g.metadata["general.architecture"] == "llama"
        got = g.get("token_embd.weight")
        assert got.shape == (4, 8)
        np.testing.assert_allclose(got, w)
        got16 = g.get("blk.0.attn_q.weight")
        np.testing.assert_allclose(got16, w, atol=1e-2)

    def test_name_mapping(self):
        assert gguf_to_hf_name("token_embd.weight") == "model.embed_tokens.weight"
        assert gguf_to_hf_name("blk.3.ffn_gate.weight") == \
            "model.layers.3.mlp.gate_proj.weight"
        assert gguf_to_hf_name("output.weight") == "lm_head.weight"
        assert gguf_to_hf_name("unknown.thing") is None

    def test_quantized_llama_end_to_end(self, tmp_path):
        """Full pipeline: quantized GGUF -> DecoderLM greedy generation."""
        from helpers import build_word_tokenizer
        rng = np.random.default_rng(4)
        V, H, I_, nh, nkv, hd = 40, 32, 64, 4, 2, 8

        def lin(o, i):
            return (rng.standard_normal((o, i)) * 0.05).astype(np.float32)

        tensors = {}
        md = {
            "general.architecture": "llama",
            "llama.block_count": 2,
            "llama.embedding_length": H,
            "llama.feed_forward_length": I_,
            "llama.attention.head_count": nh,
            "llama.attention.head_count_kv": nkv,
            "llama.context_length": 64,
            "llama.attention.layer_norm_rms_epsilon": 1e-6,
            "llama.rope.freq_base": 10000.0,
            "llama.vocab_size": V,
            "tokenizer.ggml.eos_token_id": 3,
            "tokenizer.ggml.bos_token_id": 2,
        }
        emb = lin(V, H)
        tensors["token_embd.weight"] = ([H, V], GGML_F32, emb.tobytes())
        tensors["output_norm.weight"] = ([H], GGML_F32,
                                         np.ones(H, np.float32).tobytes())
        tensors["output.weight"] = ([H, V], GGML_F32, lin(V, H).tobytes())
        for i in range(2):
            p = f"blk.{i}."
            # q8_0-quantized projections exercise the dequant path
            qw = lin(nh * hd, H)
            tensors[p + "attn_q.weight"] = ([H, nh * hd], GGML_Q8_0,
                                            make_q8_0(qw.reshape(-1)))
            tensors[p + "attn_k.weight"] = ([H, nkv * hd], GGML_Q8_0,
                                            make_q8_0(lin(nkv * hd, H).reshape(-1)))
            tensors[p + "attn_v.weight"] = ([H, nkv * hd], GGML_Q8_0,
                                            make_q8_0(lin(nkv * hd, H).reshape(-1)))
            tensors[p + "attn_output.weight"] = ([nh * hd, H], GGML_F32,
                                                 lin(H, nh * hd).tobytes())
            tensors[p + "attn_norm.weight"] = ([H], GGML_F32,
                                               np.ones(H, np.float32).tobytes())
            tensors[p + "ffn_gate.weight"] = ([H, I_], GGML_F32,
                                              lin(I_, H).tobytes())
            tensors[p + "ffn_up.weight"] = ([H, I_], GGML_F32,
                                            lin(I_, H).tobytes())
            tensors[p + "ffn_down.weight"] = ([I_, H], GGML_F32,
                                              lin(H, I_).tobytes())
            tensors[p + "ffn_norm.weight"] = ([H], GGML_F32,
                                              np.ones(H, np.float32).tobytes())
        write_gguf(tmp_path / "model.gguf", tensors, md)
        build_word_tokenizer(tmp_path / "tokenizer.json", bert_style=False)

        gw = GgufWeights(tmp_path / "model.gguf")
        cfg = gw.hf_config()
        assert cfg["model_type"] == "llama"
        assert cfg["num_key_value_heads"] == 2
        assert cfg["vocab_size"] == V

        from kjarni_tpu.generate.sampling import GenerationConfig
        from kjarni_tpu.models.decoder_lm import DecoderLM
        lm = DecoderLM(tmp_path, max_context=64)
        out = [st.id for st in lm.generate_stream(
            "hello world", config=GenerationConfig.greedy(max_new_tokens=4,
                                                          max_length=32))]
        assert all(0 <= t < V for t in out)


def random_q5k_block(rng) -> bytes:
    d = np.float16(rng.uniform(0.01, 0.1))
    dmin = np.float16(rng.uniform(0.0, 0.05))
    scales = rng.integers(0, 256, 12, dtype=np.uint8).tobytes()
    qh = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    qs = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
    return d.tobytes() + dmin.tobytes() + scales + qh + qs


def ref_dequant_q5k(raw: bytes) -> np.ndarray:
    b = np.frombuffer(raw, dtype=np.uint8)
    d = b[0:2].view(np.float16)[0].astype(np.float32)
    dmin = b[2:4].view(np.float16)[0].astype(np.float32)
    scales = b[4:16]
    qh = b[16:48]
    ql = b[48:176]
    sc = np.zeros(8); mi = np.zeros(8)
    for j in range(4):
        sc[j] = scales[j] & 63
        mi[j] = scales[j + 4] & 63
    for j in range(4, 8):
        sc[j] = (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4)
        mi[j] = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
    y = np.zeros(256, dtype=np.float32)
    pos = 0; q = 0; is_ = 0; u1, u2 = 1, 2
    for _ in range(4):
        d1, m1 = d * sc[is_], dmin * mi[is_]
        d2, m2 = d * sc[is_ + 1], dmin * mi[is_ + 1]
        for l in range(32):
            y[pos + l] = d1 * ((int(ql[q + l]) & 0xF) +
                               (16 if int(qh[l]) & u1 else 0)) - m1
        for l in range(32):
            y[pos + 32 + l] = d2 * ((int(ql[q + l]) >> 4) +
                                    (16 if int(qh[l]) & u2 else 0)) - m2
        pos += 64; q += 32; is_ += 2; u1 <<= 2; u2 <<= 2
    return y


class TestQ5K:
    def test_q5_k_matches_scalar_reference(self):
        from kjarni_tpu.weights.gguf import dequant_q5_k
        rng = np.random.default_rng(5)
        raws = [random_q5k_block(rng) for _ in range(3)]
        raw = np.frombuffer(b"".join(raws), dtype=np.uint8)
        got = dequant_q5_k(raw)
        expected = np.concatenate([ref_dequant_q5k(r) for r in raws])
        np.testing.assert_allclose(got, expected, atol=1e-5)
