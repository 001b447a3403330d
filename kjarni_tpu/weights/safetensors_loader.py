"""Zero-copy mmap-backed safetensors loading.

Rebuild of kjarni-transformers/src/weights/safetensors_loader.rs:21 (mmap + shard
index) and weights/mmap_cache.rs:12 (process-wide mmap cache). The format is
parsed by hand — 8-byte little-endian header length, JSON header, raw buffer —
and each tensor is a numpy view into one shared np.memmap, so loading a model
costs no copies until tensors are placed on the TPU. bfloat16 uses ml_dtypes
(numpy has no native bf16).
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Iterator

import ml_dtypes
import numpy as np

from ..core.errors import WeightLoadError

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "U16": np.uint16,
    "U32": np.uint32,
    "U64": np.uint64,
    "BOOL": np.bool_,
    "F8_E4M3": ml_dtypes.float8_e4m3fn,
    "F8_E5M2": ml_dtypes.float8_e5m2,
}

# Process-wide cache: path -> (header, memmap). Mirrors mmap_cache.rs:12 so two
# models sharing a file (or re-loads) map it once.
_MMAP_CACHE: dict[Path, tuple[dict, np.memmap]] = {}


def _open_file(path: Path) -> tuple[dict, np.memmap]:
    path = Path(path).resolve()
    cached = _MMAP_CACHE.get(path)
    if cached is not None:
        return cached
    with open(path, "rb") as f:
        header_len = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(header_len))
    data = np.memmap(path, dtype=np.uint8, mode="r", offset=8 + header_len)
    _MMAP_CACHE[path] = (header, data)
    return header, data


def clear_mmap_cache() -> None:
    _MMAP_CACHE.clear()


class SafeTensorsFile:
    """One mmap'd .safetensors file; tensors are lazy zero-copy views."""

    def __init__(self, path: Path):
        self.path = Path(path)
        if not self.path.exists():
            raise WeightLoadError(f"weights file not found: {self.path}")
        self._header, self._data = _open_file(self.path)

    def keys(self) -> list[str]:
        return [k for k in self._header if k != "__metadata__"]

    def metadata(self) -> dict:
        return self._header.get("__metadata__", {})

    def get(self, name: str) -> np.ndarray:
        info = self._header.get(name)
        if info is None:
            raise WeightLoadError(f"tensor '{name}' not found in {self.path.name}")
        dtype = _DTYPES.get(info["dtype"])
        if dtype is None:
            raise WeightLoadError(f"unsupported safetensors dtype {info['dtype']}")
        start, end = info["data_offsets"]
        buf = self._data[start:end]
        return buf.view(dtype).reshape(info["shape"])


class ModelWeights:
    """Facade over single-file or sharded safetensors (cf. model_weights.rs:31).

    Resolves `model.safetensors` / `model.safetensors.index.json` inside a model
    dir, exposes dict-like access by HF tensor name, and keeps everything mmap'd.
    """

    def __init__(self, model_dir: Path):
        model_dir = Path(model_dir)
        self.model_dir = model_dir
        self._files: dict[str, SafeTensorsFile] = {}
        self._tensor_to_file: dict[str, str] = {}

        index = model_dir / "model.safetensors.index.json"
        single = model_dir / "model.safetensors"
        if index.exists():
            idx = json.loads(index.read_text())
            for tensor, shard in idx["weight_map"].items():
                self._tensor_to_file[tensor] = shard
            for shard in set(idx["weight_map"].values()):
                self._files[shard] = SafeTensorsFile(model_dir / shard)
        elif single.exists():
            f = SafeTensorsFile(single)
            self._files["model.safetensors"] = f
            for k in f.keys():
                self._tensor_to_file[k] = "model.safetensors"
        else:
            # fall back to any .safetensors files present
            shards = sorted(model_dir.glob("*.safetensors"))
            if not shards:
                raise WeightLoadError(f"no safetensors weights found in {model_dir}")
            for p in shards:
                f = SafeTensorsFile(p)
                self._files[p.name] = f
                for k in f.keys():
                    self._tensor_to_file[k] = p.name

    @classmethod
    def from_file(cls, path: Path) -> "ModelWeights":
        path = Path(path)
        self = cls.__new__(cls)
        self.model_dir = path.parent
        f = SafeTensorsFile(path)
        self._files = {path.name: f}
        self._tensor_to_file = {k: path.name for k in f.keys()}
        return self

    def __contains__(self, name: str) -> bool:
        return name in self._tensor_to_file

    def keys(self) -> Iterator[str]:
        return iter(self._tensor_to_file)

    def get(self, name: str) -> np.ndarray:
        shard = self._tensor_to_file.get(name)
        if shard is None:
            raise WeightLoadError(
                f"tensor '{name}' not found in {self.model_dir} "
                f"(have {len(self._tensor_to_file)} tensors)")
        return self._files[shard].get(name)

    def get_f32(self, name: str) -> np.ndarray:
        return np.asarray(self.get(name), dtype=np.float32)

    def first(self, *names: str) -> np.ndarray:
        """Return the first tensor that exists among `names` (layout sniffing)."""
        for n in names:
            if n in self:
                return self.get(n)
        raise WeightLoadError(f"none of {names} found in {self.model_dir}")

    def has_any(self, *names: str) -> bool:
        return any(n in self for n in names)

    # Architecture sniffing helpers (cf. model_weights.rs:231 is_bert/is_mpnet/...)
    def is_bert(self) -> bool:
        return self.has_any("bert.embeddings.word_embeddings.weight",
                            "embeddings.word_embeddings.weight")

    def is_distilbert(self) -> bool:
        return self.has_any("distilbert.embeddings.word_embeddings.weight")

    def is_roberta(self) -> bool:
        return self.has_any("roberta.embeddings.word_embeddings.weight")

    def is_mpnet(self) -> bool:
        return self.has_any("mpnet.embeddings.word_embeddings.weight",
                            "encoder.layer.0.attention.attn.q.weight")

    def is_gpt2(self) -> bool:
        return self.has_any("wte.weight", "transformer.wte.weight")


def load_model_weights(model_dir: Path) -> ModelWeights:
    return ModelWeights(model_dir)
