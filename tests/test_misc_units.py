"""Unit coverage for the remaining small modules: tokenizer batching, beam
hypothesis scoring, masks.combine, placement, CLI config-file effect."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import build_word_tokenizer


class TestTokenizerBatching:
    @pytest.fixture
    def tk(self, tmp_path):
        from kjarni_tpu.tokenizer import KjarniTokenizer
        build_word_tokenizer(tmp_path / "t.json")
        return KjarniTokenizer.from_file(tmp_path / "t.json")

    def test_right_padding(self, tk):
        ids, mask = tk.encode_batch(["hello", "hello world the doctor"])
        assert ids.shape == mask.shape
        assert mask[0].sum() < mask[1].sum()
        assert mask[0, 0] == 1  # right padding: content at the front

    def test_left_padding(self, tk):
        ids, mask = tk.encode_batch(["hello", "hello world the doctor"],
                                    padding="left")
        assert mask[0, -1] == 1  # left padding: content at the back
        assert mask[0, 0] == 0

    def test_bucketing_rounds_up(self, tk):
        ids, _ = tk.encode_batch(["hello world the doctor and the nurse"])
        assert ids.shape[1] in (8, 16, 32)  # a power-of-two bucket

    def test_truncation(self, tk):
        ids, mask = tk.encode_batch(["hello world the doctor and the nurse"],
                                    max_len=4)
        assert ids.shape[1] == 4
        assert mask.sum() == 4

    def test_pair_encoding(self, tk):
        ids, mask = tk.encode_batch(["hello"], pairs=["world"])
        # [CLS] hello [SEP] world [SEP]
        assert mask.sum() == 5

    def test_batch_padding_rows(self, tk):
        ids, mask = tk.encode_batch(["a", "b", "c"], pad_batch=True)
        assert ids.shape[0] == 4  # batch bucket


class TestBeamHypothesis:
    def test_normalized_score(self):
        from kjarni_tpu.generate.beam import BeamHypothesis
        h = BeamHypothesis(tokens=[1, 2, 3, 4], score=-8.0, length_penalty=2.0)
        assert h.normalized_score == pytest.approx(-8.0 / 16.0)
        h1 = BeamHypothesis(tokens=[], score=-1.0, length_penalty=1.0)
        assert h1.normalized_score == -1.0  # length floor of 1


class TestMaskCombine:
    def test_combine_sums_and_skips_none(self):
        from kjarni_tpu.ops.masks import combine
        a = jnp.ones((1, 1, 2, 2))
        b = jnp.full((1, 1, 2, 2), 2.0)
        out = combine(a, None, b)
        np.testing.assert_allclose(np.asarray(out), 3.0)
        assert combine(None, None) is None


class TestPlacement:
    def test_resolve_cpu(self):
        from kjarni_tpu.core.placement import resolve_jax_device
        dev = resolve_jax_device("cpu")
        assert dev.platform == "cpu"

    def test_resolve_auto(self):
        from kjarni_tpu.core.placement import resolve_jax_device
        assert resolve_jax_device(None) is not None

    def test_place_params(self):
        from kjarni_tpu.core.placement import place_params
        tree = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
        placed = place_params(tree, "cpu")
        assert placed["a"].devices().pop().platform == "cpu"


class TestCliConfigFile:
    def test_config_sets_default_model(self, tmp_path, monkeypatch, capsys):
        from helpers import tiny_bert_dir
        model_dir = tmp_path / "model"
        tiny_bert_dir(model_dir, num_labels=2, seed=81)
        cfg = tmp_path / "kjarni.toml"
        cfg.write_text(f'[classify]\nmodel = "{model_dir}"\n')
        monkeypatch.setenv("KJARNI_CONFIG", str(cfg))
        from kjarni_tpu.cli.main import main
        assert main(["classify", "i love this product",
                     "--format", "json"]) == 0
        data = json.loads(capsys.readouterr().out)
        assert data["label"] in ("NEGATIVE", "POSITIVE")

    def test_cli_flag_beats_config(self, tmp_path, monkeypatch, capsys):
        from helpers import tiny_bert_dir
        good = tmp_path / "good"
        tiny_bert_dir(good, num_labels=2, seed=82)
        cfg = tmp_path / "kjarni.toml"
        cfg.write_text('[classify]\nmodel = "definitely-not-a-model"\n')
        monkeypatch.setenv("KJARNI_CONFIG", str(cfg))
        from kjarni_tpu.cli.main import main
        assert main(["classify", "great service", "--model", str(good),
                     "--format", "json"]) == 0
        json.loads(capsys.readouterr().out)
