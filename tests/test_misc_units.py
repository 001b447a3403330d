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


class TestPlacementHelpers:
    def test_execution_plan_presets(self):
        from kjarni_tpu.core.placement import ExecutionPlan
        from kjarni_tpu.core.errors import InvalidConfigError
        assert ExecutionPlan.resolve(None) == ExecutionPlan()
        assert ExecutionPlan.resolve("offload_ends") == ExecutionPlan(
            embeddings="host", lm_head="host")
        assert ExecutionPlan.resolve("offload_head").embeddings == "device"
        p = ExecutionPlan(embeddings="host")
        assert ExecutionPlan.resolve(p) is p
        with pytest.raises(InvalidConfigError, match="unknown execution plan"):
            ExecutionPlan.resolve("gpu_offload_ends")

    def test_host_gather_and_matmul_numerics(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from kjarni_tpu.core.placement import (host_gather, host_matmul,
                                               to_host_memory)
        table = to_host_memory(jnp.arange(40.0).reshape(10, 4))
        ids = jnp.array([[1, 3], [7, 0]], jnp.int32)

        @jax.jit
        def f(t, i):
            return host_gather(t, i)
        np.testing.assert_allclose(
            np.asarray(f(table, ids)),
            np.take(np.arange(40.0).reshape(10, 4), np.asarray(ids), axis=0))

        w = to_host_memory(jnp.ones((4, 6)) * 2.0)

        @jax.jit
        def g(x, w):
            return host_matmul(x, w)
        out = np.asarray(g(jnp.ones((3, 4)), w))
        np.testing.assert_allclose(out, np.full((3, 6), 8.0))
