"""Run the C ABI from a REAL compiled C program (native/test_host.c).

tests/test_ffi.py drives libkjarni.so via ctypes from inside this Python
process, which means kjarni_init() finds an interpreter already running.
This test compiles and executes a standalone C binary instead — the exact
path a C/C#/Go host takes, where kjarni_init() must boot the embedded
CPython itself (kjarni_ffi.cpp: Py_InitializeEx, g_owns_interpreter=true)
and every GIL acquisition starts from a foreign thread state. Counterpart
of the reference's compiled binding test suites
(crates/kjarni-ffi/bindings/csharp/Kjarni.Tests/, bindings/go/*_test.go).
"""

import os
import site
import subprocess
import sys
from pathlib import Path

import pytest

from helpers import build_word_tokenizer, save_torch_model, tiny_bert_dir

REPO = Path(__file__).resolve().parent.parent
NATIVE = REPO / "native"
HOST = NATIVE / "test_host"


def _build() -> bool:
    r = subprocess.run(["make", "-C", str(NATIVE), "test_host"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout + r.stderr)
    return r.returncode == 0 and HOST.exists()


@pytest.fixture(scope="module")
def model_dirs(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    bert = tmp_path_factory.mktemp("chost_bert")
    tiny_bert_dir(bert, seed=41)
    clf = tmp_path_factory.mktemp("chost_clf")
    tiny_bert_dir(clf, num_labels=2, seed=42)

    llama = tmp_path_factory.mktemp("chost_llama")
    vm = build_word_tokenizer(llama / "tokenizer.json", bert_style=False)
    config = LlamaConfig(vocab_size=len(vm), hidden_size=32,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, bos_token_id=2,
                         eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(43)
    save_torch_model(llama, LlamaForCausalLM(config).eval(), config)
    return bert, clf, llama


def test_compiled_c_host(model_dirs):
    if not _build():
        pytest.skip("native toolchain unavailable")
    bert, clf, llama = model_dirs

    # The embedded interpreter is the python3 libkjarni.so links against —
    # it knows nothing of this venv or repo, so module resolution comes in
    # via PYTHONPATH (harmless here: the C host never uses the axon plugin).
    env = dict(os.environ)
    paths = [str(REPO)] + site.getsitepackages()
    env["PYTHONPATH"] = os.pathsep.join(paths)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.setdefault("TOKENIZERS_PARALLELISM", "false")

    r = subprocess.run([str(HOST), str(bert), str(clf), str(llama)],
                       capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "OK" in r.stdout and "checks" in r.stdout, r.stdout
