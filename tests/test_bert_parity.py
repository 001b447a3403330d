"""Golden parity tests: kjarni-tpu encoder vs HuggingFace torch models.

SURVEY §4 tier 4 — the reference tested against hardcoded PyTorch outputs
(sentence_encoder/tests.rs:212). With zero network egress we instead instantiate
HF models from config with random weights, save to safetensors, load through the
kjarni-tpu weight mapper, and require elementwise agreement.
"""

import json

import numpy as np
import pytest
import torch

from kjarni_tpu.models import bert as kbert
from kjarni_tpu.weights.safetensors_loader import ModelWeights

COS_TOL = 0.999


def save_model(tmp_path, model, config):
    from safetensors.torch import save_file
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    save_file(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps(config.to_dict()))


def run_kjarni(tmp_path, hf_config, ids, mask, token_type=None):
    import jax.numpy as jnp
    cfg = kbert.BertConfig.from_hf(json.loads((tmp_path / "config.json").read_text()))
    ws = ModelWeights(tmp_path)
    params = kbert.load_params(ws, cfg)
    tt = jnp.asarray(token_type) if token_type is not None else None
    out = kbert.encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask), tt)
    return np.asarray(out), cfg, params


def assert_close(got, expected, mask=None, atol=2e-4):
    if mask is not None:
        got = got[mask.astype(bool)]
        expected = expected[mask.astype(bool)]
    np.testing.assert_allclose(got, expected, atol=atol, rtol=1e-3)
    # cosine parity (the reference's headline metric, BASELINE.json >= 0.999)
    g, e = got.ravel(), expected.ravel()
    cos = float(g @ e / (np.linalg.norm(g) * np.linalg.norm(e) + 1e-12))
    assert cos >= COS_TOL


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def make_inputs(rng, vocab, batch=2, seq=12, pad_from=9):
    ids = rng.integers(3, vocab - 1, size=(batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), dtype=np.int32)
    mask[1, pad_from:] = 0
    ids[1, pad_from:] = 0
    return ids, mask


class TestBert:
    def test_bert_model_parity(self, tmp_path, rng):
        from transformers import BertConfig, BertModel
        config = BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=3,
                            num_attention_heads=4, intermediate_size=128,
                            max_position_embeddings=64)
        torch.manual_seed(0)
        model = BertModel(config).eval()
        save_model(tmp_path, model, config)
        ids, mask = make_inputs(rng, 128)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64)),
                             attention_mask=torch.from_numpy(mask.astype(np.int64))
                             ).last_hidden_state.numpy()
        got, cfg, params = run_kjarni(tmp_path, config, ids, mask)
        assert_close(got, expected, mask)
        # pooler parity too
        import jax.numpy as jnp
        pooled = np.asarray(kbert.pooler_forward(params["pooler"], jnp.asarray(got)))
        with torch.no_grad():
            pooled_t = model(torch.from_numpy(ids.astype(np.int64)),
                             attention_mask=torch.from_numpy(mask.astype(np.int64))
                             ).pooler_output.numpy()
        np.testing.assert_allclose(pooled, pooled_t, atol=5e-4, rtol=1e-3)

    def test_distilbert_parity(self, tmp_path, rng):
        from transformers import DistilBertConfig, DistilBertModel
        config = DistilBertConfig(vocab_size=100, dim=48, n_layers=2, n_heads=4,
                                  hidden_dim=96, max_position_embeddings=64)
        torch.manual_seed(1)
        model = DistilBertModel(config).eval()
        save_model(tmp_path, model, config)
        ids, mask = make_inputs(rng, 100)
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64)),
                             attention_mask=torch.from_numpy(mask.astype(np.int64))
                             ).last_hidden_state.numpy()
        got, _, _ = run_kjarni(tmp_path, config, ids, mask)
        assert_close(got, expected, mask)

    def test_roberta_parity(self, tmp_path, rng):
        from transformers import RobertaConfig, RobertaModel
        config = RobertaConfig(vocab_size=120, hidden_size=64, num_hidden_layers=2,
                               num_attention_heads=4, intermediate_size=128,
                               max_position_embeddings=66, pad_token_id=1,
                               type_vocab_size=1)
        torch.manual_seed(2)
        model = RobertaModel(config).eval()
        save_model(tmp_path, model, config)
        ids, mask = make_inputs(rng, 120)
        ids[mask == 0] = 1  # roberta pad id
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64)),
                             attention_mask=torch.from_numpy(mask.astype(np.int64))
                             ).last_hidden_state.numpy()
        got, _, _ = run_kjarni(tmp_path, config, ids, mask)
        assert_close(got, expected, mask)

    def test_mpnet_parity(self, tmp_path, rng):
        from transformers import MPNetConfig, MPNetModel
        config = MPNetConfig(vocab_size=120, hidden_size=64, num_hidden_layers=2,
                             num_attention_heads=4, intermediate_size=128,
                             max_position_embeddings=66)
        torch.manual_seed(3)
        model = MPNetModel(config).eval()
        save_model(tmp_path, model, config)
        ids, mask = make_inputs(rng, 120)
        ids[mask == 0] = 1
        with torch.no_grad():
            expected = model(torch.from_numpy(ids.astype(np.int64)),
                             attention_mask=torch.from_numpy(mask.astype(np.int64))
                             ).last_hidden_state.numpy()
        got, _, _ = run_kjarni(tmp_path, config, ids, mask)
        assert_close(got, expected, mask)
