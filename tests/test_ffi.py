"""C ABI tests: load libkjarni.so via ctypes (a C host stand-in) and drive the
full surface end-to-end with tiny local models (cf. kjarni-ffi bindings tests)."""

import ctypes
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from helpers import tiny_bert_dir

REPO = Path(__file__).resolve().parent.parent
SO = REPO / "native" / "libkjarni.so"


def _build_so():
    if SO.exists():
        return True
    r = subprocess.run(["make", "-C", str(REPO / "native")],
                       capture_output=True, text=True)
    return r.returncode == 0 and SO.exists()


@pytest.fixture(scope="module")
def lib():
    if not _build_so():
        pytest.skip("native toolchain unavailable")
    lib = ctypes.CDLL(str(SO))
    lib.kjarni_init.restype = ctypes.c_int
    lib.kjarni_version.restype = ctypes.c_char_p
    lib.kjarni_last_error.restype = ctypes.c_char_p
    lib.kjarni_new.restype = ctypes.c_longlong
    lib.kjarni_new.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.kjarni_call.restype = ctypes.c_void_p  # manual free
    lib.kjarni_call.argtypes = [ctypes.c_longlong, ctypes.c_char_p,
                                ctypes.c_char_p]
    lib.kjarni_string_free.argtypes = [ctypes.c_void_p]
    lib.kjarni_free.argtypes = [ctypes.c_longlong]
    lib.kjarni_embedder_embed.restype = ctypes.c_int
    lib.kjarni_embedder_embed.argtypes = [
        ctypes.c_longlong, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.kjarni_embedder_similarity.restype = ctypes.c_float
    lib.kjarni_embedder_similarity.argtypes = [
        ctypes.c_longlong, ctypes.c_char_p, ctypes.c_char_p]
    assert lib.kjarni_init() == 0, "init failed"
    return lib


def _call(lib, handle, method, args: dict) -> dict:
    p = lib.kjarni_call(handle, method.encode(), json.dumps(args).encode())
    if not p:
        raise RuntimeError(lib.kjarni_last_error().decode())
    s = ctypes.string_at(p).decode()
    lib.kjarni_string_free(p)
    return json.loads(s)


class TestFfi:
    def test_version(self, lib):
        assert lib.kjarni_version().decode() == "0.1.0"

    def test_embedder_roundtrip(self, lib, tmp_path_factory):
        d = tmp_path_factory.mktemp("ffi_emb")
        tiny_bert_dir(d, seed=11)
        h = lib.kjarni_new(b"embedder", json.dumps({"model": str(d)}).encode())
        assert h > 0, lib.kjarni_last_error().decode()
        try:
            out = _call(lib, h, "embed", {"text": "hello world"})
            vec = out["embedding"]
            assert abs(np.linalg.norm(vec) - 1.0) < 1e-4

            # typed buffer API
            buf = (ctypes.c_float * 64)()
            n = lib.kjarni_embedder_embed(h, b"hello world", buf, 64)
            assert n == len(vec)
            np.testing.assert_allclose(np.asarray(buf[:n]), vec, atol=1e-5)

            sim = lib.kjarni_embedder_similarity(h, b"doctor", b"doctor")
            assert abs(sim - 1.0) < 1e-3
        finally:
            lib.kjarni_free(h)

    def test_classifier(self, lib, tmp_path_factory):
        d = tmp_path_factory.mktemp("ffi_clf")
        tiny_bert_dir(d, num_labels=2, seed=12)
        h = lib.kjarni_new(b"classifier", json.dumps({"model": str(d)}).encode())
        assert h > 0, lib.kjarni_last_error().decode()
        try:
            out = _call(lib, h, "classify", {"text": "i love this product"})
            assert out["label"] in ("NEGATIVE", "POSITIVE")
            assert len(out["all_scores"]) == 2
        finally:
            lib.kjarni_free(h)

    def test_invalid_model_sets_error(self, lib):
        h = lib.kjarni_new(b"classifier",
                           json.dumps({"model": "no-such-model-xyz",
                                       "offline": True}).encode())
        assert h == 0
        assert "no-such-model-xyz" in lib.kjarni_last_error().decode()

    def test_invalid_handle_error(self, lib):
        p = lib.kjarni_call(99999, b"embed", b"{}")
        assert not p
        assert "handle" in lib.kjarni_last_error().decode()

    def test_unknown_task(self, lib):
        h = lib.kjarni_new(b"quantum-oracle", b"{}")
        assert h == 0
