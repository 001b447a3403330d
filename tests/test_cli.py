"""CLI tests: subcommand dispatch, JSON output, stdin piping, bar charts."""

import json

import pytest

from helpers import tiny_bert_dir

from kjarni_tpu.cli.main import main
from kjarni_tpu.cli.display import bar, format_table


@pytest.fixture(scope="module")
def clf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_clf")
    tiny_bert_dir(d, num_labels=2, seed=1)
    return d


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_emb")
    tiny_bert_dir(d, seed=2)
    return d


class TestDisplay:
    def test_bar(self):
        assert bar(1.0) == "█" * 20
        assert bar(0.0) == "░" * 20
        assert len(bar(0.5)) == 20

    def test_table(self):
        out = format_table([["a", "1"], ["bb", "22"]], ["N", "V"])
        assert "N" in out and "bb" in out


class TestModelCommands:
    def test_model_list(self, capsys):
        assert main(["model", "list"]) == 0
        out = capsys.readouterr().out
        assert "minilm-l6-v2" in out
        assert "whisper-small" in out

    def test_model_info_json(self, capsys):
        assert main(["model", "info", "gpt2", "--format", "json"]) == 0
        info = json.loads(capsys.readouterr().out)
        assert info["name"] == "gpt2"
        assert info["repo"] == "gpt2/resolve"or info["repo"]  # repo id present

    def test_model_search(self, capsys):
        assert main(["model", "search", "sentiment"]) == 0
        assert "distilbert-sentiment" in capsys.readouterr().out

    def test_unknown_model_error(self, capsys):
        assert main(["model", "info", "nonexistent-model-xyz"]) == 1
        assert "error" in capsys.readouterr().err


class TestClassify:
    def test_classify_text_output(self, clf_dir, capsys):
        assert main(["classify", "i love this product", "--model",
                     str(clf_dir)]) == 0
        out = capsys.readouterr().out
        assert "█" in out and "%" in out
        assert "✓" in out

    def test_classify_json(self, clf_dir, capsys):
        assert main(["classify", "terrible quality", "--model", str(clf_dir),
                     "--format", "json"]) == 0
        data = json.loads(capsys.readouterr().out)
        assert data["label"] in ("NEGATIVE", "POSITIVE")
        assert 0 <= data["score"] <= 1

    def test_classify_stdin(self, clf_dir, capsys, monkeypatch):
        import io
        monkeypatch.setattr("sys.stdin", io.StringIO("i hate mondays"))
        assert main(["classify", "--model", str(clf_dir)]) == 0
        assert "%" in capsys.readouterr().out


class TestEmbedSimilarity:
    def test_embed_json(self, emb_dir, capsys):
        assert main(["embed", "hello world", "--model", str(emb_dir),
                     "--format", "json"]) == 0
        data = json.loads(capsys.readouterr().out)
        assert data["dim"] == len(data["embedding"])

    def test_similarity(self, emb_dir, capsys):
        assert main(["similarity", "doctor", "physician", "--model",
                     str(emb_dir)]) == 0
        out = capsys.readouterr().out
        assert "%" in out and "doctor" in out


class TestIndexSearch:
    def test_index_create_then_search(self, emb_dir, tmp_path, capsys):
        docs = tmp_path / "docs"
        docs.mkdir()
        (docs / "a.txt").write_text("keeping data safe with quality service")
        (docs / "b.txt").write_text("i love this product")
        idx = tmp_path / "myidx"
        assert main(["index", "create", str(idx), str(docs), "--model",
                     str(emb_dir)]) == 0
        capsys.readouterr()
        assert main(["search", str(idx), "keeping data safe", "--model",
                     str(emb_dir), "--top-k", "2"]) == 0
        out = capsys.readouterr().out
        assert "1." in out

    def test_search_json(self, emb_dir, tmp_path, capsys):
        docs = tmp_path / "docs"
        docs.mkdir()
        (docs / "a.txt").write_text("data safe keeping")
        idx = tmp_path / "idx2"
        main(["index", "create", str(idx), str(docs), "--model", str(emb_dir)])
        capsys.readouterr()
        assert main(["search", str(idx), "data", "--model", str(emb_dir),
                     "--format", "json", "--mode", "keyword"]) == 0
        data = json.loads(capsys.readouterr().out)
        assert isinstance(data, list) and data


class TestRerank:
    def test_rerank(self, tmp_path, capsys):
        tiny_bert_dir(tmp_path, num_labels=1, seed=5)
        assert main(["rerank", "data safe", "doc one here", "data safe doc",
                     "--model", str(tmp_path)]) == 0
        out = capsys.readouterr().out
        assert "doc" in out
