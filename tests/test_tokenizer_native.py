"""In-tree BPE/WordPiece tokenizers vs the HF `tokenizers` runtime."""

import numpy as np
import pytest

from kjarni_tpu.tokenizer_native import (BPETokenizer, WordPieceTokenizer,
                                         bpe_from_gguf_metadata,
                                         bytes_to_unicode)


class TestByteLevel:
    def test_bytes_to_unicode_bijection(self):
        m = bytes_to_unicode()
        assert len(m) == 256
        assert len(set(m.values())) == 256


@pytest.fixture(scope="module")
def hf_gpt2_like():
    """Train a tiny byte-level BPE with HF tokenizers as ground truth."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    tk = Tokenizer(models.BPE())
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tk.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(vocab_size=500, special_tokens=["<|end|>"],
                                  initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    corpus = ["hello world", "the doctor and the physician",
              "keeping data safe is the best", "i love this product"] * 10
    tk.train_from_iterator(corpus, trainer)
    return tk


class TestBPE:
    def test_matches_hf_roundtrip(self, hf_gpt2_like):
        hf = hf_gpt2_like
        vocab = hf.get_vocab()
        # extract merges from the trained model
        import json, tempfile, os
        with tempfile.TemporaryDirectory() as d:
            hf.model.save(d)
            merges = []
            for line in open(os.path.join(d, "merges.txt")):
                if line.startswith("#") or not line.strip():
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b.strip()))
        bpe = BPETokenizer(vocab, merges)
        for text in ("hello world", "the doctor", "keeping data safe",
                     "i love this product"):
            expected = hf.encode(text).ids
            got = bpe.encode(text)
            assert got == expected, text
            assert bpe.decode(got) == hf.decode(expected)

    def test_decode_utf8(self):
        # bytes round-trip through the unicode mapping
        vocab = {c: i for i, c in enumerate(bytes_to_unicode().values())}
        bpe = BPETokenizer(vocab, [])
        ids = bpe.encode("héllo ✓")
        assert bpe.decode(ids) == "héllo ✓"


class TestWordPiece:
    @pytest.fixture
    def wp(self):
        vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
                 "hello": 4, "world": 5, "un": 6, "##believ": 7, "##able": 8,
                 "!": 9}
        return WordPieceTokenizer(vocab)

    def test_basic(self, wp):
        ids = wp.encode("hello world")
        assert ids == [2, 4, 5, 3]

    def test_subword_split(self, wp):
        ids = wp.encode("unbelievable", add_special_tokens=False)
        assert ids == [6, 7, 8]
        assert wp.decode(ids) == "unbelievable"

    def test_unknown_word(self, wp):
        ids = wp.encode("xyzzy", add_special_tokens=False)
        assert ids == [1]

    def test_punctuation_split(self, wp):
        ids = wp.encode("hello!", add_special_tokens=False)
        assert ids == [4, 9]

    def test_matches_hf_wordpiece(self):
        from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
        vocab = {"[UNK]": 0, "[CLS]": 1, "[SEP]": 2, "the": 3, "doc": 4,
                 "##tor": 5, "best": 6, "pro": 7, "##duct": 8}
        hf = Tokenizer(models.WordPiece(vocab, unk_token="[UNK]"))
        hf.normalizer = normalizers.Lowercase()
        hf.pre_tokenizer = pre_tokenizers.Whitespace()
        mine = WordPieceTokenizer(vocab)
        for text in ("the doctor", "best product", "the best"):
            assert mine.encode(text, add_special_tokens=False) == \
                hf.encode(text).ids, text


class TestGgufTokenizer:
    def test_build_from_metadata(self):
        bu = bytes_to_unicode()
        base = list(bu.values())
        tokens = base + ["he", "ll", "hell", "llo", "hello"]
        vocab_idx = {t: i for i, t in enumerate(tokens)}
        merges = ["h e", "l l", "he ll", "ll o", "hell o"]
        md = {"tokenizer.ggml.tokens": tokens,
              "tokenizer.ggml.merges": merges,
              "tokenizer.ggml.eos_token_id": 0}
        bpe = bpe_from_gguf_metadata(md)
        assert bpe is not None
        ids = bpe.encode("hello")
        assert ids == [vocab_idx["hello"]]
        assert bpe.decode(ids) == "hello"

    def test_missing_metadata_returns_none(self):
        assert bpe_from_gguf_metadata({}) is None


class TestSpecialTokens:
    def test_bpe_splits_special_tokens_in_text(self):
        bu = bytes_to_unicode()
        base = list(bu.values())
        tokens = base + ["<|eot|>", "<|bos|>"]
        vocab = {t: i for i, t in enumerate(tokens)}
        specials = {"<|eot|>": vocab["<|eot|>"], "<|bos|>": vocab["<|bos|>"]}
        bpe = BPETokenizer(vocab, [], specials)
        ids = bpe.encode("<|bos|>hi<|eot|>")
        assert ids[0] == vocab["<|bos|>"]
        assert ids[-1] == vocab["<|eot|>"]
        # the inner text is byte-encoded, not swallowed
        assert len(ids) > 2

    def test_gguf_control_tokens_registered(self):
        bu = bytes_to_unicode()
        tokens = list(bu.values()) + ["<|im_start|>", "<|im_end|>"]
        md = {"tokenizer.ggml.tokens": tokens, "tokenizer.ggml.merges": [],
              "tokenizer.ggml.eos_token_id": len(tokens) - 1}
        bpe = bpe_from_gguf_metadata(md)
        assert bpe.token_to_id("<|im_start|>") == len(tokens) - 2
        ids = bpe.encode("<|im_start|>x")
        assert ids[0] == len(tokens) - 2
