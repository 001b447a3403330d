"""The shipped Python binding (bindings/python/kjarni) over libkjarni.so."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from helpers import tiny_bert_dir

REPO = Path(__file__).resolve().parent.parent
SO = REPO / "native" / "libkjarni.so"


@pytest.fixture(scope="module")
def kjarni_binding():
    if not SO.exists():
        r = subprocess.run(["make", "-C", str(REPO / "native")],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("native toolchain unavailable")
    sys.path.insert(0, str(REPO / "bindings" / "python"))
    import kjarni
    return kjarni


class TestPythonBinding:
    def test_version(self, kjarni_binding):
        assert kjarni_binding.version() == "0.1.0"

    def test_embedder_context_manager(self, kjarni_binding, tmp_path):
        tiny_bert_dir(tmp_path, seed=21)
        with kjarni_binding.Embedder(str(tmp_path)) as e:
            vec = e.embed("hello world")
            assert abs(np.linalg.norm(vec) - 1.0) < 1e-4
            assert e.similarity("doctor", "doctor") == pytest.approx(1.0,
                                                                     abs=1e-3)

    def test_classifier(self, kjarni_binding, tmp_path):
        tiny_bert_dir(tmp_path, num_labels=2, seed=22)
        with kjarni_binding.Classifier(str(tmp_path)) as c:
            r = c.classify("best purchase ever")
            assert r["label"] in ("NEGATIVE", "POSITIVE")
            assert c.labels == ["NEGATIVE", "POSITIVE"]

    def test_bad_model_raises(self, kjarni_binding):
        with pytest.raises(RuntimeError):
            kjarni_binding.Embedder("not-a-model-at-all", offline=True)
