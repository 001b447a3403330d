"""Encoder model wrappers: SentenceEncoder, CrossEncoder, SequenceClassifier.

Rebuild of kjarni-models/src/models/{sentence_encoder,cross_encoder,
sequence_classifier}. Each wrapper owns a tokenizer, a static BertConfig, a
device-resident params pytree, and a jitted forward closure; XLA's jit cache
keyed on the bucketed (batch, seq) shape replaces the reference's
ComputeStrategy dispatch (cpu/strategy.rs).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.errors import WeightLoadError
from ..ops.pooling import PoolingStrategy, pool
from ..tokenizer import KjarniTokenizer
from ..weights.safetensors_loader import ModelWeights
from . import bert as kbert


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class _EncoderBase:
    """Shared load path: config.json + tokenizer.json + safetensors -> jitted encode."""

    def __init__(self, model_dir: Path, dtype="auto", device=None,
                 dp: Optional[int] = None):
        from .decoder_lm import resolve_dtype
        dtype = resolve_dtype(dtype)
        model_dir = Path(model_dir)
        self.model_dir = model_dir
        self._device = device
        hf_cfg = json.loads((model_dir / "config.json").read_text())
        self.hf_config = hf_cfg
        self.config = kbert.BertConfig.from_hf(hf_cfg)
        self.tokenizer = KjarniTokenizer.from_file(
            model_dir / "tokenizer.json", pad_token_id=self.config.pad_token_id)
        ws = ModelWeights(model_dir)
        from ..core.placement import resolve_jax_device
        dev = resolve_jax_device(device)
        self.params = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), dev),
            kbert.load_params(ws, self.config, dtype))
        # dp=N: replicate params over an N-device mesh and shard every batch
        # row-wise over "dp" — throughput scale-out over ICI for encoder
        # workloads (SURVEY §2.5/§7; parallel/inference.py is the library
        # form, this is the product path)
        self._mesh = None
        self._dp = 1
        if dp is not None and dp > 1:
            from ..core.errors import InvalidConfigError
            n_dev = len(jax.devices())
            if n_dev < dp:
                raise InvalidConfigError(
                    f"dp={dp} requested but only {n_dev} device(s) visible")
            from ..parallel.inference import replicate_params
            from ..parallel.mesh import make_mesh
            self._mesh = make_mesh(dp, dp=dp, tp=1)
            self._dp = dp
            self.params = replicate_params(self.params, self._mesh)
        self._weights = ws
        cfg = self.config

        @jax.jit
        def _encode(params, ids, mask, token_type):
            return kbert.encode_auto(params, cfg, ids, mask, token_type)

        self._encode = _encode

    def _device_batch(self, ids: np.ndarray, mask: np.ndarray,
                      tt: np.ndarray):
        """Host batch -> device arrays; under dp, pad rows to a multiple of
        the mesh size and shard them over "dp" (pad rows get mask=1 so pooling
        never divides by zero; callers slice results back to the true count).
        """
        if self._mesh is None:
            return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)
        pad = (-ids.shape[0]) % self._dp
        if pad:
            ids = np.concatenate(
                [ids, np.zeros((pad, ids.shape[1]), ids.dtype)])
            mask = np.concatenate(
                [mask, np.ones((pad, mask.shape[1]), mask.dtype)])
            tt = np.concatenate([tt, np.zeros((pad, tt.shape[1]), tt.dtype)])
        from jax.sharding import NamedSharding, PartitionSpec as P
        rows = NamedSharding(self._mesh, P("dp", None))
        return (jax.device_put(jnp.asarray(ids), rows),
                jax.device_put(jnp.asarray(mask), rows),
                jax.device_put(jnp.asarray(tt), rows))

    @property
    def hidden_size(self) -> int:
        return self.config.hidden_size

    @property
    def max_seq_len(self) -> int:
        return self.config.max_position_embeddings - self.config.position_offset

    def hidden_states(self, texts: Sequence[str],
                      pairs: Sequence[str] | None = None) -> tuple[jnp.ndarray, np.ndarray, np.ndarray]:
        ids, mask = self.tokenizer.encode_batch(
            texts, pairs=pairs, max_len=self.max_seq_len, padding="right",
            pad_batch=True)  # batch bucket -> bounded compile cache
        # token_type ids: second segment = 1 for pair inputs on BERT-type models
        if pairs is not None and self.config.type_vocab_size > 1:
            tt = self._pair_type_ids(texts, pairs, ids.shape[1], ids.shape[0])
        else:
            tt = np.zeros_like(ids)
        ids_d, mask_d, tt_d = self._device_batch(ids, mask, tt)
        hidden = self._encode(self.params, ids_d, mask_d, tt_d)
        # under dp, hidden/mask may carry padding rows; callers slice by the
        # true batch length
        return hidden, np.asarray(ids_d), np.asarray(mask_d)

    def _pair_type_ids(self, texts, pairs, width, rows=None) -> np.ndarray:
        encs = self.tokenizer.tk.encode_batch(list(zip(texts, pairs)))
        tt = np.zeros((rows or len(texts), width), dtype=np.int32)
        for i, e in enumerate(encs):
            type_ids = e.type_ids[:width]
            tt[i, :len(type_ids)] = type_ids
        return tt


class SentenceEncoder(_EncoderBase):
    """Text -> embedding (cf. sentence_encoder/model.rs:33).

    Defaults mirror the reference: mean pooling + L2 normalization.
    """

    MAX_ENCODE_BATCH = 512  # chunk huge corpora to bound activation memory

    def encode_batch(self, texts: Sequence[str], *,
                     pooling: PoolingStrategy | str = PoolingStrategy.MEAN,
                     normalize: bool = True) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.hidden_size), dtype=np.float32)
        if isinstance(pooling, str):
            pooling = PoolingStrategy(
                {"lastToken": "last", "last_token": "last"}.get(pooling, pooling))
        chunks = []
        for i in range(0, len(texts), self.MAX_ENCODE_BATCH):
            batch = list(texts[i:i + self.MAX_ENCODE_BATCH])
            hidden, _, mask = self.hidden_states(batch)
            pooled = np.asarray(pool(pooling, hidden, jnp.asarray(mask)),
                                dtype=np.float32)[:len(batch)]
            chunks.append(pooled)
        pooled = np.concatenate(chunks, axis=0)
        if normalize:
            pooled = _l2_normalize(pooled)
        return pooled

    def encode(self, text: str, **kw) -> np.ndarray:
        return self.encode_batch([text], **kw)[0]

    def similarity(self, a: str, b: str) -> float:
        va, vb = self.encode_batch([a, b])
        return float(va @ vb)


class CrossEncoder(_EncoderBase):
    """Query-document relevance scoring (cf. cross_encoder/model.rs:32)."""

    def __init__(self, model_dir: Path, dtype="auto", device=None,
                 dp: Optional[int] = None):
        super().__init__(model_dir, dtype, device, dp)
        self.head = _load_classification_head(self._weights, self.hf_config)
        if self._mesh is not None:
            from ..parallel.inference import replicate_params
            self.head.params = replicate_params(self.head.params, self._mesh)

        head = self.head
        cfg = self.config

        @jax.jit
        def _score(params, head_params, ids, mask, token_type):
            hidden = kbert.encode_auto(params, cfg, ids, mask, token_type)
            logits = _head_forward(head, head_params, hidden, mask)
            return logits[:, 0]

        self._score = _score

    MAX_PAIR_BATCH = 256

    def predict_pairs(self, pairs: Sequence[tuple[str, str]]) -> np.ndarray:
        """Raw relevance logits, first column (cf. model.rs:170 predict_pairs)."""
        if not pairs:
            return np.zeros((0,), dtype=np.float32)
        if len(pairs) > self.MAX_PAIR_BATCH:
            return np.concatenate([
                self.predict_pairs(pairs[i:i + self.MAX_PAIR_BATCH])
                for i in range(0, len(pairs), self.MAX_PAIR_BATCH)])
        queries = [q for q, _ in pairs]
        docs = [d for _, d in pairs]
        ids, mask = self.tokenizer.encode_batch(
            queries, pairs=docs, max_len=self.max_seq_len, pad_batch=True)
        if self.config.type_vocab_size > 1:
            tt = self._pair_type_ids(queries, docs, ids.shape[1], ids.shape[0])
        else:
            tt = np.zeros_like(ids)
        ids_d, mask_d, tt_d = self._device_batch(ids, mask, tt)
        scores = np.asarray(self._score(self.params, self.head.params,
                                        ids_d, mask_d, tt_d))
        return scores[:len(pairs)].astype(np.float32)

    def predict_pair(self, query: str, document: str) -> float:
        return float(self.predict_pairs([(query, document)])[0])

    def rerank(self, query: str, documents: Sequence[str]) -> list[tuple[int, float]]:
        if not documents:
            return []
        scores = self.predict_pairs([(query, d) for d in documents])
        order = np.argsort(-scores)
        return [(int(i), float(scores[i])) for i in order]

    def rerank_top_k(self, query: str, documents: Sequence[str], k: int):
        return self.rerank(query, documents)[:k]


# ---------------------------------------------------------------------------
# Classification head (auto-detected, cf. cpu/encoder/classifier.rs:101)
# ---------------------------------------------------------------------------

class _HeadSpec:
    def __init__(self, kind: str, activation: str, pooling: str, params: dict,
                 labels: Optional[list[str]]):
        self.kind = kind              # pre_classifier | pooler | plain
        self.activation = activation  # tanh | relu | none
        self.pooling = pooling        # cls | last
        self.params = params
        self.labels = labels

    @property
    def num_classes(self) -> int:
        return self.params["classifier"]["w"].shape[-1]


def _lin(ws: ModelWeights, name: str) -> dict:
    p = {"w": jnp.asarray(np.asarray(ws.get(f"{name}.weight"), dtype=np.float32).T)}
    if f"{name}.bias" in ws:
        p["b"] = jnp.asarray(np.asarray(ws.get(f"{name}.bias"), dtype=np.float32))
    return p


def _load_classification_head(ws: ModelWeights, hf_cfg: dict) -> _HeadSpec:
    """Detection cascade matching classifier.rs from_weights (order matters)."""
    labels = None
    id2label = hf_cfg.get("id2label")
    if isinstance(id2label, dict) and id2label:
        labels = [v for _, v in sorted(id2label.items(), key=lambda kv: int(kv[0]))]
    pooling = "last" if hf_cfg.get("model_type") == "bart" else "cls"

    if ws.has_any("classification_head.dense.weight"):
        params = {"pre": _lin(ws, "classification_head.dense"),
                  "classifier": _lin(ws, "classification_head.out_proj")}
        return _HeadSpec("pre_classifier", "tanh", pooling, params, labels)
    if ws.has_any("classifier.dense.weight"):
        params = {"pre": _lin(ws, "classifier.dense"),
                  "classifier": _lin(ws, "classifier.out_proj")}
        return _HeadSpec("pre_classifier", "tanh", pooling, params, labels)
    if ws.has_any("pre_classifier.weight"):
        params = {"pre": _lin(ws, "pre_classifier"),
                  "classifier": _lin(ws, "classifier")}
        return _HeadSpec("pre_classifier", "relu", pooling, params, labels)
    if ws.has_any("bert.pooler.dense.weight"):
        params = {"pre": _lin(ws, "bert.pooler.dense"),
                  "classifier": _lin(ws, "classifier")}
        return _HeadSpec("pooler", "tanh", pooling, params, labels)
    if ws.has_any("classifier.weight"):
        return _HeadSpec("plain", "none", pooling, {"classifier": _lin(ws, "classifier")},
                         labels)
    raise WeightLoadError(
        "Could not auto-detect a classification head (checked classification_head.dense, "
        "classifier.dense, pre_classifier, bert.pooler, classifier)")


def _head_forward(head: _HeadSpec, params: dict, hidden: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    if head.pooling == "last":
        lengths = jnp.sum(mask.astype(jnp.int32), axis=1)
        idx = jnp.maximum(lengths - 1, 0)
        x = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0, :]
    else:
        x = hidden[:, 0, :]
    if "pre" in params:
        x = x @ params["pre"]["w"] + params["pre"].get("b", 0.0)
        if head.activation == "tanh":
            x = jnp.tanh(x)
        elif head.activation == "relu":
            x = jax.nn.relu(x)
    c = params["classifier"]
    return x @ c["w"] + c.get("b", 0.0)


class SequenceClassifier(_EncoderBase):
    """Text -> label scores (cf. sequence_classifier/mod.rs:42)."""

    def __init__(self, model_dir: Path, dtype="auto", device=None,
                 dp: Optional[int] = None):
        super().__init__(model_dir, dtype, device, dp)
        self.head = _load_classification_head(self._weights, self.hf_config)
        if self._mesh is not None:
            from ..parallel.inference import replicate_params
            self.head.params = replicate_params(self.head.params, self._mesh)
        self.labels = self.head.labels
        self.is_multi_label = (
            self.hf_config.get("problem_type") == "multi_label_classification")

        head = self.head
        cfg = self.config

        @jax.jit
        def _logits(params, head_params, ids, mask, token_type):
            hidden = kbert.encode_auto(params, cfg, ids, mask, token_type)
            return _head_forward(head, head_params, hidden, mask)

        self._logits = _logits

    def predict_logits(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.head.num_classes), dtype=np.float32)
        ids, mask = self.tokenizer.encode_batch(texts, max_len=self.max_seq_len,
                                                pad_batch=True)
        tt = np.zeros_like(ids)
        ids_d, mask_d, tt_d = self._device_batch(ids, mask, tt)
        logits = np.asarray(self._logits(self.params, self.head.params,
                                         ids_d, mask_d, tt_d))
        return logits[:len(texts)].astype(np.float32)

    def classify_scores_batch(self, texts: Sequence[str],
                              multi_label: Optional[bool] = None) -> np.ndarray:
        logits = self.predict_logits(texts)
        ml = self.is_multi_label if multi_label is None else multi_label
        if ml:
            return 1.0 / (1.0 + np.exp(-logits))
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    def classify_batch(self, texts: Sequence[str], top_k: int = 1,
                       multi_label: Optional[bool] = None) -> list[list[tuple[str, float]]]:
        scores = self.classify_scores_batch(texts, multi_label)
        labels = self.labels or [f"LABEL_{i}" for i in range(scores.shape[1])]
        out = []
        for row in scores:
            ranked = sorted(zip(labels, row.tolist()), key=lambda t: -t[1])
            out.append([(l, float(s)) for l, s in ranked[:top_k]])
        return out

    def classify(self, text: str) -> tuple[str, float]:
        return self.classify_batch([text], top_k=1)[0][0]
