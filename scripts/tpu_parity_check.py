"""CPU <-> TPU output parity check (the reference's CPU<->GPU parity suite,
kjarni-models/src/tests/parity_test.rs:36, rebuilt for the TPU backend).

Runs tiny random models twice — f32 on the host CPU backend and bf16 on the
accelerator — and reports max-abs-diff + cosine similarity per model family.
Run manually on a TPU host:  python scripts/tpu_parity_check.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    a, b = a.ravel().astype(np.float64), b.ravel().astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def check_encoder() -> tuple[float, float]:
    import jax
    from helpers import tiny_bert_dir
    from kjarni_tpu.models.encoder_models import SentenceEncoder

    d = Path(tempfile.mkdtemp())
    tiny_bert_dir(d, seed=1)
    texts = ["i love this product", "keeping data safe is the best"]
    cpu_dev = jax.devices("cpu")[0]
    with jax.default_device(cpu_dev):
        ref = SentenceEncoder(d, dtype="f32", device="cpu").encode_batch(texts)
    got = SentenceEncoder(d, dtype="auto").encode_batch(texts)
    return float(np.abs(got - ref).max()), cosine(got, ref)


def check_decoder() -> tuple[float, float, bool]:
    import torch
    from helpers import build_word_tokenizer, save_torch_model
    from transformers import LlamaConfig, LlamaForCausalLM
    from kjarni_tpu.generate.sampling import GenerationConfig
    from kjarni_tpu.models.decoder_lm import DecoderLM
    from kjarni_tpu.models import llama as kllama
    from kjarni_tpu.weights.safetensors_loader import ModelWeights
    import jax
    import jax.numpy as jnp
    import json

    d = Path(tempfile.mkdtemp())
    vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=len(vm), hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, bos_token_id=2,
                         eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(3)
    save_torch_model(d, LlamaForCausalLM(config).eval(), config)

    hf = json.loads((d / "config.json").read_text())
    cfg = kllama.DecoderConfig.from_hf(hf)
    params32 = kllama.load_params(ModelWeights(d), cfg)
    ids = np.array([[5, 9, 23, 12]], dtype=np.int32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ck, cv = kllama.init_cache(cfg, 1, 8)
        ref, _, _ = kllama.forward_all_logits(
            jax.tree.map(jnp.asarray, params32), cfg, jnp.asarray(ids), ck, cv, 0)
        ref = np.asarray(ref)
    lm = DecoderLM(d, max_context=64)  # auto dtype on the accelerator
    ck, cv = lm.family.init_cache(cfg, 1, 8, lm.params["embed"].dtype)
    got, _, _ = kllama.forward_all_logits(lm.params, cfg, jnp.asarray(ids),
                                          ck, cv, 0)
    got = np.asarray(got, dtype=np.float32)

    gen = GenerationConfig.greedy(max_new_tokens=8, max_length=64)
    toks_acc = [st.id for st in lm.generate_stream("hello world", config=gen)]
    with jax.default_device(cpu):
        lm_cpu = DecoderLM(d, dtype="f32", max_context=64)
        toks_cpu = [st.id for st in lm_cpu.generate_stream("hello world",
                                                           config=gen)]
    return (float(np.abs(got - ref).max()), cosine(got, ref),
            toks_acc == toks_cpu)


def main() -> int:
    import jax
    dev = jax.devices()[0]
    print(f"accelerator: {dev} | parity vs CPU f32")
    err, cos = check_encoder()
    print(f"encoder (bf16 vs f32): max|Δ|={err:.4f} cosine={cos:.6f}")
    ok_enc = cos >= 0.999
    err, cos, greedy_match = check_decoder()
    print(f"decoder logits (bf16 vs f32): max|Δ|={err:.4f} cosine={cos:.6f}")
    print(f"decoder greedy tokens match: {greedy_match}")
    ok = ok_enc and cos >= 0.999
    print("PARITY", "OK (>=0.999 cosine)" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
