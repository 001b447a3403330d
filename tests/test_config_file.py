"""kjarni.toml config chain tests (cf. kjarni_config*.rs tests)."""

import pytest

from kjarni_tpu.config_file import (KjarniConfig, TaskConfig, load_config,
                                    load_config_from_path, parse_config)


SAMPLE = """
[defaults]
chat = "llama3.2-1b-instruct"
embed = "mpnet-base-v2"

[chat]
temperature = 0.5
system_prompt = "be brief"

[embed]
pooling = "cls"
normalize = false

[models."llama3.2-1b-instruct"]
max_context = 2048

[cache]
dir = "~/my-models"

[hardware]
device = "tpu"

[output]
format = "json"
quiet = true
"""


class TestConfigFile:
    def test_parse_full(self, tmp_path):
        p = tmp_path / "kjarni.toml"
        p.write_text(SAMPLE)
        cfg = load_config_from_path(p)
        assert cfg.model_for("chat") == "llama3.2-1b-instruct"
        assert cfg.model_for("embed") == "mpnet-base-v2"
        # unset task falls back to builtin default
        assert cfg.model_for("classify") == "distilbert-sentiment"
        assert cfg.task_config("chat").temperature == 0.5
        assert cfg.task_config("chat").system_prompt == "be brief"
        assert cfg.task_config("embed").pooling == "cls"
        assert cfg.model_override("llama3.2-1b-instruct") == {"max_context": 2048}
        assert cfg.hardware.device == "tpu"
        assert cfg.output.format == "json" and cfg.output.quiet
        assert str(cfg.cache_dir()).endswith("my-models")

    def test_empty_config_defaults(self):
        cfg = parse_config({})
        assert cfg.model_for("chat") == "qwen2.5-0.5b-instruct"
        assert cfg.output.format == "text"

    def test_task_model_beats_defaults(self):
        cfg = parse_config({"defaults": {"chat": "a"}, "chat": {"model": "b"}})
        assert cfg.model_for("chat") == "b"

    def test_merged_with_overrides(self):
        tc = TaskConfig(temperature=0.5, max_tokens=10)
        merged = tc.merged_with({"temperature": 0.9, "max_tokens": None})
        assert merged.temperature == 0.9
        assert merged.max_tokens == 10

    def test_load_config_env_path(self, tmp_path, monkeypatch):
        p = tmp_path / "custom.toml"
        p.write_text('[defaults]\nembed = "bge-m3"\n')
        monkeypatch.setenv("KJARNI_CONFIG", str(p))
        cfg = load_config()
        assert cfg.model_for("embed") == "bge-m3"

    def test_load_config_missing_returns_defaults(self, tmp_path, monkeypatch):
        monkeypatch.delenv("KJARNI_CONFIG", raising=False)
        cfg = load_config(cwd=tmp_path)
        assert isinstance(cfg, KjarniConfig)
