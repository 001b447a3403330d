#!/usr/bin/env python
"""Build the random-weight llama-geometry model dir for serving load tests.

scripts/serve_load_test.py needs a local model dir; the BASELINE serving
tables use a ~0.36B tiny-vocab llama so the decode step is weight-bound
enough to be representative while still building in ~a minute. Usage:

    python scripts/build_serve_model.py /tmp/serve_model
    python scripts/serve_load_test.py --model /tmp/serve_model
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

# --geom choices. "0.4b" is the BASELINE serving-table model; "1b" matches
# scripts/kv_int8_batch_bench.py's GEOM (16L/2048h/8192i, kvh 8, 4k ctx)
# minus its 128k vocab, for the continuous-engine int8-KV serving row.
GEOMS = {
    "0.4b": dict(intermediate_size=5632, num_hidden_layers=8,
                 max_position_embeddings=2048),
    "1b": dict(intermediate_size=8192, num_hidden_layers=16,
               max_position_embeddings=4096),
}


def main(out: str, geom: str = "0.4b") -> None:
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from helpers import build_word_tokenizer, save_torch_model

    d = Path(out)
    d.mkdir(parents=True, exist_ok=True)
    vm = build_word_tokenizer(d / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=max(len(vm), 2048), hidden_size=2048,
                         num_attention_heads=32, num_key_value_heads=8,
                         bos_token_id=2, eos_token_id=3,
                         tie_word_embeddings=True, **GEOMS[geom])
    torch.manual_seed(7)
    model = LlamaForCausalLM(config).eval()
    n = sum(p.numel() for p in model.parameters())
    save_torch_model(d, model, config)
    print(f"wrote {out}: {n / 1e9:.3f}B params")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/serve_model",
         sys.argv[2] if len(sys.argv) > 2 else "0.4b")
