"""kjarni Python binding over the C ABI (cf. kjarni-ffi/bindings/python).

Same task classes as the reference bindings: Classifier, Embedder, Reranker,
Chat, Indexer, Searcher — context managers over libkjarni.so handles.
"""

from __future__ import annotations

from . import _ffi


class _Handle:
    _task = ""

    def __init__(self, model: str | None = None, **options):
        if model is not None:
            options["model"] = model
        self._h = _ffi.new(self._task, **options)

    def close(self) -> None:
        if self._h:
            _ffi.free(self._h)
            self._h = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class Embedder(_Handle):
    _task = "embedder"

    def embed(self, text: str) -> list[float]:
        return _ffi.call(self._h, "embed", text=text)["embedding"]

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        return _ffi.call(self._h, "embed_batch", texts=texts)["embeddings"]

    def similarity(self, a: str, b: str) -> float:
        return _ffi.call(self._h, "similarity", a=a, b=b)["similarity"]


class Classifier(_Handle):
    _task = "classifier"

    def classify(self, text: str) -> dict:
        return _ffi.call(self._h, "classify", text=text)

    def classify_batch(self, texts: list[str]) -> list[dict]:
        return _ffi.call(self._h, "classify_batch", texts=texts)["results"]

    @property
    def labels(self) -> list[str]:
        return _ffi.call(self._h, "labels")["labels"]


class Reranker(_Handle):
    _task = "reranker"

    def score(self, query: str, document: str) -> float:
        return _ffi.call(self._h, "score", query=query,
                         document=document)["score"]

    def rerank(self, query: str, documents: list[str]) -> list[dict]:
        return _ffi.call(self._h, "rerank", query=query,
                         documents=documents)["results"]


class Chat(_Handle):
    _task = "chat"

    def send(self, message: str) -> str:
        return _ffi.call(self._h, "send", message=message)["reply"]

    def stream(self, message: str):
        yield from _ffi.stream(self._h, "stream", message=message)

    def clear_history(self, keep_system: bool = True) -> None:
        _ffi.call(self._h, "clear_history", keep_system=keep_system)


class Indexer(_Handle):
    _task = "indexer"

    def create(self, index_path: str, paths: list[str]) -> dict:
        return _ffi.call(self._h, "create", index_path=index_path, paths=paths)

    def add(self, index_path: str, paths: list[str]) -> dict:
        return _ffi.call(self._h, "add", index_path=index_path, paths=paths)


class Searcher(_Handle):
    _task = "searcher"

    def search(self, index_path: str, query: str, mode: str = "hybrid",
               top_k: int = 10) -> list[dict]:
        return _ffi.call(self._h, "search", index_path=index_path, query=query,
                         mode=mode, top_k=top_k)["results"]


def version() -> str:
    return _ffi.lib().kjarni_version().decode()
