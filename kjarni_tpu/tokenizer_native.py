"""Minimal in-tree tokenizers: byte-level BPE (GPT-2 style) and WordPiece.

Rebuild of kjarni-transformers/src/tokenizer/{bpe,wordpiece}.rs — the
reference keeps small self-contained tokenizers for paths where the full HF
`tokenizers` runtime isn't available (WASM/GPT). Here they additionally unlock
GGUF-only model dirs: GGUF files embed vocab+merges in metadata, so
`bpe_from_gguf_metadata` builds a working tokenizer with no tokenizer.json.
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path
from typing import Optional, Sequence

import regex

# GPT-2 pre-tokenization pattern (bpe.rs)
_GPT2_PATTERN = regex.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte <-> printable-unicode mapping."""
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("¡"), ord("¬") + 1)) +
          list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class BPETokenizer:
    """Byte-level BPE (cf. tokenizer/bpe.rs:20)."""

    def __init__(self, vocab: dict[str, int], merges: Sequence[tuple[str, str]],
                 special_tokens: Optional[dict[str, int]] = None):
        self.vocab = dict(vocab)
        self.id_to_token = {v: k for k, v in self.vocab.items()}
        self.merge_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.special_tokens = dict(special_tokens or {})
        for tok, tid in self.special_tokens.items():
            self.id_to_token.setdefault(tid, tok)
        self._byte_encoder = bytes_to_unicode()
        self._byte_decoder = {v: k for k, v in self._byte_encoder.items()}
        self._cache: dict[str, list[str]] = {}
        # chat templates embed special tokens as literal text (<|eot_id|> ...);
        # split them out so they map to their ids, not byte-BPE pieces
        specials = sorted(self.special_tokens, key=len, reverse=True)
        self._special_re = (
            regex.compile("(" + "|".join(regex.escape(t) for t in specials) + ")")
            if specials else None)

    @classmethod
    def from_files(cls, vocab_path: Path, merges_path: Path) -> "BPETokenizer":
        vocab = json.loads(Path(vocab_path).read_text())
        merges = []
        for line in Path(merges_path).read_text().splitlines():
            if line.startswith("#") or not line.strip():
                continue
            a, _, b = line.partition(" ")
            merges.append((a, b))
        return cls(vocab, merges)

    def _bpe(self, token: str) -> list[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.merge_ranks.get(p, 1 << 30))
            if best not in self.merge_ranks:
                break
            a, b = best
            out: list[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        self._cache[token] = word
        return word

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        ids: list[int] = []
        segments = (self._special_re.split(text) if self._special_re
                    else [text])
        for seg in segments:
            if not seg:
                continue
            if self._special_re is not None and seg in self.special_tokens:
                ids.append(self.special_tokens[seg])
                continue
            for piece in _GPT2_PATTERN.findall(seg):
                mapped = "".join(self._byte_encoder[b]
                                 for b in piece.encode("utf-8"))
                for sub in self._bpe(mapped):
                    tid = self.vocab.get(sub)
                    if tid is not None:
                        ids.append(tid)
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        special_ids = set(self.special_tokens.values())
        parts = []
        for i in ids:
            if skip_special_tokens and i in special_ids:
                continue
            tok = self.id_to_token.get(int(i))
            if tok is not None:
                parts.append(tok)
        text = "".join(parts)
        data = bytes(self._byte_decoder.get(c, ord(" ")) for c in text)
        return data.decode("utf-8", errors="replace")

    def token_to_id(self, token: str) -> Optional[int]:
        tid = self.special_tokens.get(token)
        return tid if tid is not None else self.vocab.get(token)


class WordPieceTokenizer:
    """Greedy longest-match WordPiece (cf. tokenizer/wordpiece.rs:9)."""

    def __init__(self, vocab: dict[str, int], unk_token: str = "[UNK]",
                 cls_token: str = "[CLS]", sep_token: str = "[SEP]",
                 lowercase: bool = True, max_word_chars: int = 100):
        self.vocab = dict(vocab)
        self.id_to_token = {v: k for k, v in self.vocab.items()}
        self.unk_token = unk_token
        self.cls_token = cls_token
        self.sep_token = sep_token
        self.lowercase = lowercase
        self.max_word_chars = max_word_chars

    @classmethod
    def from_vocab_file(cls, path: Path, **kw) -> "WordPieceTokenizer":
        vocab = {}
        for i, line in enumerate(Path(path).read_text().splitlines()):
            vocab[line.strip()] = i
        return cls(vocab, **kw)

    def _split_words(self, text: str) -> list[str]:
        if self.lowercase:
            text = text.lower()
        out: list[str] = []
        word = ""
        for ch in text:
            if ch.isspace():
                if word:
                    out.append(word)
                    word = ""
            elif not (ch.isalnum() or ch == "'"):
                if word:
                    out.append(word)
                    word = ""
                out.append(ch)
            else:
                word += ch
        if word:
            out.append(word)
        return out

    def _wordpiece(self, word: str) -> list[str]:
        if len(word) > self.max_word_chars:
            return [self.unk_token]
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    cur = piece
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            pieces.append(cur)
            start = end
        return pieces

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        toks: list[str] = []
        if add_special_tokens and self.cls_token in self.vocab:
            toks.append(self.cls_token)
        for word in self._split_words(text):
            toks.extend(self._wordpiece(word))
        if add_special_tokens and self.sep_token in self.vocab:
            toks.append(self.sep_token)
        unk = self.vocab.get(self.unk_token, 0)
        return [self.vocab.get(t, unk) for t in toks]

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        specials = {self.cls_token, self.sep_token, "[PAD]", "[MASK]"}
        words: list[str] = []
        for i in ids:
            tok = self.id_to_token.get(int(i), self.unk_token)
            if skip_special_tokens and tok in specials:
                continue
            if tok.startswith("##") and words:
                words[-1] += tok[2:]
            else:
                words.append(tok)
        return " ".join(words)

    def token_to_id(self, token: str) -> Optional[int]:
        return self.vocab.get(token)


def bpe_from_gguf_metadata(metadata: dict) -> Optional[BPETokenizer]:
    """Build a BPE tokenizer from GGUF tokenizer.ggml.* metadata."""
    tokens = metadata.get("tokenizer.ggml.tokens")
    merges = metadata.get("tokenizer.ggml.merges")
    if not tokens or merges is None:
        return None
    vocab = {t: i for i, t in enumerate(tokens)}
    merge_pairs = []
    for m in merges:
        a, _, b = m.partition(" ")
        merge_pairs.append((a, b))
    specials = {}
    for key in ("tokenizer.ggml.bos_token_id", "tokenizer.ggml.eos_token_id"):
        tid = metadata.get(key)
        if tid is not None and tid < len(tokens):
            specials[tokens[tid]] = tid
    # control tokens (token_type 3 in ggml, or <|...|> shaped) act as specials
    types = metadata.get("tokenizer.ggml.token_type")
    if types:
        for i, t in enumerate(types):
            if t == 3 and i < len(tokens):
                specials[tokens[i]] = i
    else:
        for i, tok in enumerate(tokens):
            if tok.startswith("<|") and tok.endswith("|>"):
                specials[tok] = i
    return BPETokenizer(vocab, merge_pairs, specials)
