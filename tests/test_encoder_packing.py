"""Packed-row encoding (encode_packed_n) must equal the plain encoder.

The embed headline routes short rows through packed kernels
(bert.py::encode_auto — pack-4 at S<=32, pack-2 at S<=64; measured 2.32x /
1.31x over plain on v5e, scripts/encoder_packn.py). These tests pin the
packing's correctness in f32 on the virtual-CPU mesh: block-diagonal
attention, per-lane positions, ragged padding masks, token types, and both
absolute- and roberta-style position schemes. No reference counterpart —
the packing is a rebuild-side optimization; the contract is equality
with encode() to f32 roundoff (different row shapes fuse differently in
XLA, so bitwise equality is not guaranteed; observed <=2e-7).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import tiny_bert_dir

from kjarni_tpu.models import bert as kbert
from kjarni_tpu.weights.safetensors_loader import ModelWeights

ATOL = 2e-6


@pytest.fixture(scope="module")
def bert(tmp_path_factory):
    d = tmp_path_factory.mktemp("pack_bert")
    tiny_bert_dir(d, seed=7)
    cfg = kbert.BertConfig.from_hf(json.loads((d / "config.json").read_text()))
    params = kbert.load_params(ModelWeights(d), cfg)
    return cfg, params


def ragged_batch(rng, B, S, vocab_hi=38):
    # stay inside the tiny fixture vocab: out-of-range ids turn into
    # platform-defined gather behavior (NaN on some backends)
    ids = rng.integers(5, vocab_hi, (B, S)).astype(np.int32)
    mask = np.zeros((B, S), np.int32)
    for b in range(B):
        n = int(rng.integers(1, S + 1))
        mask[b, :n] = 1
        ids[b, n:] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


class TestPackedEquality:
    @pytest.mark.parametrize("n,B,S", [(2, 6, 16), (4, 8, 16), (4, 4, 32)])
    def test_matches_plain_ragged(self, bert, n, B, S):
        cfg, params = bert
        rng = np.random.default_rng(100 + n * 10 + S)
        ids, mask = ragged_batch(rng, B, S)
        tt = jnp.zeros_like(ids)
        plain = kbert.encode(params, cfg, ids, mask, tt)
        packed = kbert.encode_packed_n(params, cfg, ids, mask, tt, n=n)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(packed),
                                   atol=ATOL, rtol=0)

    def test_matches_with_token_types(self, bert):
        cfg, params = bert
        rng = np.random.default_rng(3)
        ids, mask = ragged_batch(rng, 8, 12)
        tt = jnp.asarray((np.arange(12)[None, :] >= 6).astype(np.int32)
                         * np.ones((8, 1), np.int32))
        plain = kbert.encode(params, cfg, ids, mask, tt)
        packed = kbert.encode_packed_n(params, cfg, ids, mask, tt, n=4)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(packed),
                                   atol=ATOL, rtol=0)

    def test_pairs_wrapper_is_pack2(self, bert):
        cfg, params = bert
        rng = np.random.default_rng(4)
        ids, mask = ragged_batch(rng, 4, 10)
        a = kbert.encode_packed_pairs(params, cfg, ids, mask)
        b = kbert.encode_packed_n(params, cfg, ids, mask, n=2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # same fn


class TestAutoRouting:
    """encode_auto is a trace-time dispatch; equality IS the routing test —
    whatever path it picks must equal plain encode()."""

    @pytest.mark.parametrize("B,S", [
        (8, 16),   # pack-4 region
        (8, 48),   # pack-2 region
        (6, 16),   # divisible by 2 not 4 -> pack-2
        (5, 16),   # odd batch -> padded pack (sliced back)
        (7, 16),   # 3-remainder batch -> padded pack-4
        (3, 48),   # odd batch in the pack-2 region
        (4, 100),  # long rows -> plain
    ])
    def test_auto_equals_plain(self, bert, B, S):
        cfg, params = bert
        rng = np.random.default_rng(B * 1000 + S)
        ids, mask = ragged_batch(rng, B, S)
        plain = kbert.encode(params, cfg, ids, mask)
        auto = kbert.encode_auto(params, cfg, ids, mask)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(auto),
                                   atol=ATOL, rtol=0)

    def test_pack_plan_crossovers(self):
        """The plan maximizes measured-gain * B/(B+pad); pin the decisions
        the constants imply so a constant edit that flips one is visible."""
        assert kbert._pack_plan(8, 16) == (4, 0)
        assert kbert._pack_plan(6, 16) == (2, 0)   # pack-4 pad-2 eff 1.74 < 1.87
        assert kbert._pack_plan(5, 16) == (2, 1)   # pack-2 pad-1 eff 1.56 wins
        assert kbert._pack_plan(7, 16) == (4, 1)   # pack-4 pad-1 eff 2.03
        assert kbert._pack_plan(2, 16) == (2, 0)
        assert kbert._pack_plan(1, 16) == (1, 0)
        assert kbert._pack_plan(8, 48) == (2, 0)
        assert kbert._pack_plan(3, 48) == (1, 0)   # eff 0.98 loses to plain
        assert kbert._pack_plan(5, 48) == (2, 1)   # eff 1.09 > plain
        assert kbert._pack_plan(4, 100) == (1, 0)


class TestRobertaPositions:
    """roberta's cumsum-over-mask positions are per-sequence state the
    packing must compute BEFORE reshaping lanes together."""

    def test_roberta_style_packing(self, tmp_path):
        import torch
        from transformers import RobertaConfig, RobertaModel

        from helpers import save_torch_model

        config = RobertaConfig(vocab_size=120, hidden_size=32,
                               num_hidden_layers=2, num_attention_heads=4,
                               intermediate_size=64,
                               max_position_embeddings=40, pad_token_id=1,
                               type_vocab_size=1)
        torch.manual_seed(9)
        save_torch_model(tmp_path, RobertaModel(config).eval(), config)
        cfg = kbert.BertConfig.from_hf(
            json.loads((tmp_path / "config.json").read_text()))
        params = kbert.load_params(ModelWeights(tmp_path), cfg)
        rng = np.random.default_rng(11)
        ids, mask = ragged_batch(rng, 8, 16)
        plain = kbert.encode(params, cfg, ids, mask)
        packed = kbert.encode_packed_n(params, cfg, ids, mask, n=4)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(packed),
                                   atol=ATOL, rtol=0)
