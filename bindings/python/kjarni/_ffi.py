"""ctypes loader for libkjarni.so (cf. kjarni-ffi/bindings/python/kjarni/_ffi.py).

This binding talks ONLY to the C ABI — it works from any Python process, even
one without kjarni_tpu importable, as long as libkjarni.so (and its embedded
interpreter's environment) is present.
"""

from __future__ import annotations

import ctypes
import json
import os
from pathlib import Path

_LIB = None


def _find_library() -> str:
    env = os.environ.get("KJARNI_LIBRARY")
    if env:
        return env
    here = Path(__file__).resolve()
    candidates = [
        here.parent / "libkjarni.so",
        here.parents[3] / "native" / "libkjarni.so",
        Path("libkjarni.so"),
    ]
    for c in candidates:
        if c.exists():
            return str(c)
    return "libkjarni.so"  # system search path


def lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        L = ctypes.CDLL(_find_library())
        L.kjarni_init.restype = ctypes.c_int
        L.kjarni_version.restype = ctypes.c_char_p
        L.kjarni_last_error.restype = ctypes.c_char_p
        L.kjarni_new.restype = ctypes.c_longlong
        L.kjarni_new.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        L.kjarni_call.restype = ctypes.c_void_p
        L.kjarni_call.argtypes = [ctypes.c_longlong, ctypes.c_char_p,
                                  ctypes.c_char_p]
        L.kjarni_string_free.argtypes = [ctypes.c_void_p]
        L.kjarni_free.argtypes = [ctypes.c_longlong]
        L.kjarni_stream_start.restype = ctypes.c_int
        L.kjarni_stream_start.argtypes = [ctypes.c_longlong, ctypes.c_char_p,
                                          ctypes.c_char_p]
        L.kjarni_stream_next.restype = ctypes.c_void_p
        L.kjarni_stream_next.argtypes = [ctypes.c_longlong]
        L.kjarni_stream_cancel.argtypes = [ctypes.c_longlong]
        if L.kjarni_init() != 0:
            raise RuntimeError(
                f"kjarni_init failed: {L.kjarni_last_error().decode()}")
        _LIB = L
    return _LIB


def last_error() -> str:
    return lib().kjarni_last_error().decode()


def new(task: str, **options) -> int:
    h = lib().kjarni_new(task.encode(), json.dumps(options).encode())
    if h == 0:
        raise RuntimeError(last_error())
    return h


def call(handle: int, method: str, **args) -> dict:
    p = lib().kjarni_call(handle, method.encode(), json.dumps(args).encode())
    if not p:
        raise RuntimeError(last_error())
    s = ctypes.string_at(p).decode()
    lib().kjarni_string_free(p)
    return json.loads(s)


def free(handle: int) -> None:
    lib().kjarni_free(handle)


def stream(handle: int, method: str, **args):
    if lib().kjarni_stream_start(handle, method.encode(),
                                 json.dumps(args).encode()) != 0:
        raise RuntimeError(last_error())
    while True:
        p = lib().kjarni_stream_next(handle)
        if not p:
            break
        s = ctypes.string_at(p).decode()
        lib().kjarni_string_free(p)
        yield s
