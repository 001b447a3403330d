"""Shared test fixtures: build tiny HF checkpoints on disk (no network).

Creates full model dirs (config.json + tokenizer.json + model.safetensors) from
randomly initialised transformers models, so kjarni-tpu's registry-independent
load path and parity vs torch can be tested hermetically.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import torch

VOCAB_WORDS = [
    "i", "love", "this", "product", "terrible", "quality", "great", "service",
    "hello", "world", "doctor", "physician", "nurse", "the", "a", "is", "was",
    "good", "bad", "best", "worst", "purchase", "ever", "made", "hate",
    "mondays", "data", "safe", "keeping", "and", "of", "to", "in", "it",
]


def build_word_tokenizer(path: Path, bert_style: bool = True, vocab=None):
    """Tiny whitespace WordLevel tokenizer with [CLS]/[SEP] (BERT) special tokens."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, processors

    words = vocab or VOCAB_WORDS
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab_map = {tok: i for i, tok in enumerate(specials + words)}
    tk = Tokenizer(models.WordLevel(vocab_map, unk_token="[UNK]"))
    tk.normalizer = normalizers.Lowercase()
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    if bert_style:
        tk.post_processor = processors.TemplateProcessing(
            single="[CLS] $A [SEP]",
            pair="[CLS] $A [SEP] $B:1 [SEP]:1",
            special_tokens=[("[CLS]", vocab_map["[CLS]"]), ("[SEP]", vocab_map["[SEP]"])],
        )
    tk.save(str(path))
    return vocab_map


def save_torch_model(model_dir: Path, model, config) -> None:
    from safetensors.torch import save_file
    model_dir.mkdir(parents=True, exist_ok=True)
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    # drop aliases of shared tensors (HF omits tied lm_head.weight on disk too)
    seen_ptrs = {}
    for k in list(sd):
        ptr = sd[k].data_ptr()
        if ptr in seen_ptrs and sd[k].shape == sd[seen_ptrs[ptr]].shape:
            del sd[k]
        else:
            seen_ptrs[ptr] = k
    save_file(sd, str(model_dir / "model.safetensors"))
    (model_dir / "config.json").write_text(json.dumps(config.to_dict()))


def tiny_bert_dir(model_dir: Path, *, num_labels: int = 0, seed: int = 0,
                  problem_type: str | None = None, for_pair: bool = False):
    """Build a tiny BERT checkpoint; with num_labels>0, a classifier variant."""
    from transformers import BertConfig, BertForSequenceClassification, BertModel

    vocab_map = build_word_tokenizer(model_dir / "tokenizer.json"
                                     if (model_dir.mkdir(parents=True, exist_ok=True) or True)
                                     else None)
    kwargs = dict(vocab_size=len(vocab_map), hidden_size=32, num_hidden_layers=2,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=64, pad_token_id=0)
    torch.manual_seed(seed)
    if num_labels:
        id2label = {i: f"LABEL_{i}" for i in range(num_labels)}
        if num_labels == 2:
            id2label = {0: "NEGATIVE", 1: "POSITIVE"}
        config = BertConfig(num_labels=num_labels, id2label=id2label,
                            problem_type=problem_type, **kwargs)
        model = BertForSequenceClassification(config).eval()
    else:
        config = BertConfig(**kwargs)
        model = BertModel(config).eval()
    save_torch_model(model_dir, model, config)
    return model, config
