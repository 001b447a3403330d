"""Native checkpoint format (Orbax): save/restore prepared param pytrees.

The reference's checkpoint/resume story is its model cache + index commit
atomicity (SURVEY §5.4). The TPU rebuild adds a real checkpoint layer: after
the HF/GGUF weights are mapped into the stacked pytree (transposed, split,
dequantized), `save_checkpoint` persists that prepared tree with Orbax so the
next load skips all host-side preprocessing — mmap-to-device, already laid out.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Optional

CHECKPOINT_DIR = "kjarni_ckpt"


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(params: Any, model_dir: Path) -> Path:
    """Persist a prepared params pytree under <model_dir>/kjarni_ckpt."""
    target = Path(model_dir) / CHECKPOINT_DIR
    if target.exists():
        shutil.rmtree(target)
    _checkpointer().save(target.resolve(), params)
    return target


def load_checkpoint(model_dir: Path) -> Optional[Any]:
    """Restore a prepared pytree, or None if absent."""
    target = Path(model_dir) / CHECKPOINT_DIR
    if not target.exists():
        return None
    return _checkpointer().restore(target.resolve())


def has_checkpoint(model_dir: Path) -> bool:
    return (Path(model_dir) / CHECKPOINT_DIR).exists()


def convert_model(model_dir: Path, out_dir: Path, *, dtype="auto",
                  max_context: Optional[int] = None,
                  quantize: Optional[str] = None) -> Path:
    """Convert an HF/GGUF model dir into a fast-loading native checkpoint dir.

    Copies config/tokenizer, maps the weights once, saves the prepared pytree.
    The result loads through DecoderLM/Seq2SeqLM without re-mapping.
    """
    from ..models.decoder_lm import DecoderLM

    model_dir = Path(model_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    lm = DecoderLM(model_dir, dtype=dtype, max_context=max_context,
                   quantize=quantize)
    for name in ("config.json", "tokenizer.json", "generation_config.json"):
        src = model_dir / name
        if src.exists():
            shutil.copy(src, out_dir / name)
    if not (out_dir / "config.json").exists():
        (out_dir / "config.json").write_text(json.dumps(lm.hf_config))
    save_checkpoint(lm.params, out_dir)
    return out_dir
