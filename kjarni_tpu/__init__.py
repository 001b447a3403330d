"""kjarni-tpu: a TPU-native ML inference engine and toolkit.

A from-scratch JAX/XLA/Pallas rebuild of the kjarni engine ("The SQLite of AI"):
transformer models (BERT-family encoders, cross-encoder rerankers,
Llama/Qwen/Mistral/Phi-3/GPT-2 decoders, T5/BART/Whisper encoder-decoders)
wrapped in task-level APIs, a CLI, and a C ABI — compiled by XLA onto TPUs with
Pallas kernels for the hot paths.
"""

__version__ = "0.1.0"

from .core.errors import KjarniError  # noqa: F401
from .core.metadata import Device  # noqa: F401


def __getattr__(name):
    # Lazy task imports keep `import kjarni_tpu` light (no jax trace at import).
    if name == "Classifier":
        from .tasks.classifier import Classifier
        return Classifier
    if name == "Embedder":
        from .tasks.embedder import Embedder
        return Embedder
    if name == "Reranker":
        from .tasks.reranker import Reranker
        return Reranker
    if name == "Chat":
        from .tasks.chat import Chat
        return Chat
    if name == "Generator":
        from .tasks.generator import Generator
        return Generator
    if name == "Summarizer":
        from .tasks.summarizer import Summarizer
        return Summarizer
    if name == "Translator":
        from .tasks.translator import Translator
        return Translator
    if name == "Transcriber":
        from .tasks.transcriber import Transcriber
        return Transcriber
    if name == "Indexer":
        from .tasks.indexer import Indexer
        return Indexer
    if name == "Searcher":
        from .tasks.searcher import Searcher
        return Searcher
    if name == "classify":
        from .tasks.classifier import classify
        return classify
    if name == "embed":
        from .tasks.embedder import embed
        return embed
    if name == "chat_send":
        from .tasks.chat import chat_send
        return chat_send
    raise AttributeError(f"module 'kjarni_tpu' has no attribute '{name}'")


__all__ = [
    "Classifier", "Embedder", "Reranker", "Chat", "Generator", "Summarizer",
    "Translator", "Transcriber", "Indexer", "Searcher",
    "classify", "embed", "chat_send", "Device", "KjarniError",
]
