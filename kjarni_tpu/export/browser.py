"""Browser deployment: export an encoder to a static bundle for web/kjarni.js.

Rebuild of the reference's WASM story (crates/kjarni-wasm/src/lib.rs:42 —
standalone browser BERT embeddings + index via wasm-bindgen + SIMD128).
TPU-native design decision: the compute engine here is JAX/XLA, which has no
browser target, so the browser path is a separate thin artifact — a static
weight bundle (manifest.json + weights.bin + tokenizer.json) consumed by a
dependency-free JavaScript engine (web/kjarni.js) that implements WordPiece/
WordLevel tokenization, the BERT forward, mean pooling, cosine similarity,
and an in-memory index (the kjarni-wasm Model / WasmIndexBuilder / WasmSearch
surface). No build toolchain is needed on either side: `kjarni export-browser
<model> -o dist/` then serve dist/ + web/ as static files.

Format: weights.bin is the concatenation of little-endian float32 tensors;
manifest.json carries the encoder config and per-tensor {name, shape,
offset (bytes), size (elements)} records.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np

from ..core.errors import InvalidConfigError
from ..models import bert as kbert
from ..weights.safetensors_loader import ModelWeights


def _flatten(prefix: str, tree) -> list[tuple[str, np.ndarray]]:
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flatten(f"{prefix}.{k}" if prefix else k, v))
    elif tree is None:
        pass
    else:
        out.append((prefix, np.asarray(tree, dtype=np.float32)))
    return out


def export_browser_model(model_dir: Path, out_dir: Path) -> dict:
    """Export a BERT-family encoder checkpoint to a browser bundle.

    Returns the manifest dict. Raises InvalidConfigError for non-encoder
    models (the browser engine implements the encoder forward only, like
    kjarni-wasm).
    """
    model_dir = Path(model_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    hf_cfg = json.loads((model_dir / "config.json").read_text())
    cfg = kbert.BertConfig.from_hf(hf_cfg)
    if cfg.flavor not in ("bert", "distilbert", "roberta", "mpnet"):
        raise InvalidConfigError(
            f"browser export supports BERT-family encoders, not '{cfg.flavor}'")
    if cfg.flavor == "mpnet":
        raise InvalidConfigError(
            "browser export does not implement MPNet relative attention yet")

    ws = ModelWeights(model_dir)
    params = kbert.load_params(ws, cfg, dtype=np.float32)

    tensors = _flatten("", params)
    records = []
    offset = 0
    blobs = []
    for name, arr in tensors:
        arr = np.ascontiguousarray(arr, dtype="<f4")
        records.append({"name": name, "shape": list(arr.shape),
                        "offset": offset, "size": int(arr.size)})
        offset += arr.nbytes
        blobs.append(arr.tobytes())

    manifest = {
        "format": "kjarni-browser-v1",
        "config": {
            "flavor": cfg.flavor,
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "num_layers": cfg.num_layers,
            "num_heads": cfg.num_heads,
            "intermediate_size": cfg.intermediate_size,
            "max_position_embeddings": cfg.max_position_embeddings,
            "type_vocab_size": cfg.type_vocab_size,
            "pad_token_id": cfg.pad_token_id,
            "layer_norm_eps": cfg.layer_norm_eps,
            "activation": cfg.activation,
            "position_offset": cfg.position_offset,
        },
        "tensors": records,
        "weights_bytes": offset,
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest))
    with open(out_dir / "weights.bin", "wb") as f:
        for b in blobs:
            f.write(b)
    tok = model_dir / "tokenizer.json"
    if tok.exists():
        shutil.copy(tok, out_dir / "tokenizer.json")
    return manifest


def load_browser_bundle(out_dir: Path) -> tuple[dict, dict]:
    """Read a bundle back into {name: array} (round-trip tests / JS oracle)."""
    out_dir = Path(out_dir)
    manifest = json.loads((out_dir / "manifest.json").read_text())
    raw = (out_dir / "weights.bin").read_bytes()
    tensors = {}
    for rec in manifest["tensors"]:
        a = np.frombuffer(raw, dtype="<f4", count=rec["size"],
                          offset=rec["offset"])
        tensors[rec["name"]] = a.reshape(rec["shape"])
    return manifest, tensors
