"""Model plug point — the reference's load-once model loader surface
(model_loader.py:1-296) adapted to Ray actor pools.

The reference caches heavyweight models per process with ``@lru_cache``
(load_HF_embedding_model, load_bert_base_uncased), picks a device
(cuda > mps > cpu) and derives a batch size from device memory. In Ray
Data the same contract is "build once per ACTOR in ``__init__``"; this
module provides:

- ``get_device()`` / ``get_available_memory`` / ``calculate_batch_size``
  — the reference's device/batch laws (model_loader.py:12-54), probing
  torch when importable and degrading to cpu/16 otherwise;
- ``load_embedding_model(model_name, device)`` — process-cached loader
  returning an object with ``.encode(texts) -> np.ndarray [n, dim]``.
  With transformers+torch present it loads the HF model exactly like
  load_HF_embedding_model (mean-pooled last hidden state); in this
  environment (no weights, no torch) it returns a clearly-labeled
  deterministic ``HashedNgramEmbedder`` adapter with the SAME interface
  — swap happens at load time, not at call sites;
- ``EmbeddingModelStage`` — the actor-pool ``map_batches`` stage whose
  constructor surface (model_name / device / batch_size kwargs) is what
  a real sentence-transformers actor needs, so dropping real weights in
  changes zero call sites (tests/test_model_loader.py instantiates a
  mock heavy model once per actor to prove the contract).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa

DEFAULT_EMBEDDING_MODEL = "BAAI/bge-small-en-v1.5"


@lru_cache()
def get_device() -> str:
    """cuda > mps > cpu (model_loader.py:44-54)."""
    try:
        import torch

        if torch.cuda.is_available():
            return "cuda"
        if getattr(torch.backends, "mps", None) and \
                torch.backends.mps.is_available():
            return "mps"
    except ImportError:
        pass
    return "cpu"


@lru_cache()
def get_available_memory(device: str) -> int:
    """model_loader.py:12-21 law."""
    if device == "cuda":
        try:
            import torch

            return torch.cuda.get_device_properties(0).total_memory
        except Exception:
            return 0
    if device == "mps":
        return 48 * 1024 ** 3
    return 0


@lru_cache()
def calculate_batch_size(device: str) -> int:
    """model_loader.py:24-41 law (cpu→16; gpu tiers by memory)."""
    if device == "cpu":
        return 16
    if device in ("cuda", "mps"):
        mem = get_available_memory(device)
        if mem >= 31 * 1024 ** 3:
            return 256
        if mem >= 15 * 1024 ** 3:
            return 128
        if mem >= 8 * 1024 ** 3:
            return 64
        return 32
    return 16


class _HashedNgramAdapter:
    """Stub adapter (labeled): HashedNgramEmbedder behind the real model
    interface. Deterministic, no weights needed."""

    is_stub = True

    def __init__(self, dim: int = 64):
        from .textstats import HashedNgramEmbedder

        self.dim = dim
        self._embedder = HashedNgramEmbedder(dim=dim)

    def encode(self, texts: list[str],
               batch_size: int | None = None) -> np.ndarray:
        return np.stack(
            [self._embedder._embed(t or "") for t in texts]
        ) if texts else np.zeros((0, self.dim), dtype=np.float32)


class _HFAdapter:
    """Real path: transformers AutoModel, mean-pooled last hidden state
    (the reference pairs load_HF_embedding_model with its
    get_text_embeddings mean-pool in utils.py)."""

    is_stub = False

    def __init__(self, model_name: str, device: str):
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name)
        self.model.eval()
        self.device = device
        self.model.to(device)
        self.dim = int(self.model.config.hidden_size)

    def encode(self, texts: list[str],
               batch_size: int | None = None) -> np.ndarray:
        import torch

        bs = batch_size or calculate_batch_size(self.device)
        out = []
        with torch.no_grad():
            for i in range(0, len(texts), bs):
                enc = self.tokenizer(texts[i:i + bs], padding=True,
                                     truncation=True, max_length=512,
                                     return_tensors="pt").to(self.device)
                hidden = self.model(**enc).last_hidden_state
                mask = enc["attention_mask"].unsqueeze(-1)
                pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1)
                out.append(pooled.cpu().numpy())
        return np.concatenate(out) if out else \
            np.zeros((0, self.dim), dtype=np.float32)


@lru_cache(maxsize=4)
def load_embedding_model(model_name: str = DEFAULT_EMBEDDING_MODEL,
                         device: str | None = None, *, dim: int = 64):
    """Process-cached loader (the @lru_cache law of model_loader.py:86):
    one model instance per (name, device) per worker process. Returns the
    HF adapter when transformers+torch are importable, else the stub."""
    device = device or get_device()
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401

        return _HFAdapter(model_name, device)
    except ImportError:
        return _HashedNgramAdapter(dim=dim)


class EmbeddingModelStage:
    """A6 embedding actor: ``map_batches(EmbeddingModelStage,
    fn_constructor_kwargs={'model_name': ..., 'device': ...,
    'batch_size': ...}, concurrency=N)``. The model loads ONCE per actor
    (``__init__``); ``__call__`` only encodes. Identical constructor for
    stub and real model — the adapter swap is inside
    ``load_embedding_model``."""

    def __init__(self, *, model_name: str = DEFAULT_EMBEDDING_MODEL,
                 device: str | None = None, batch_size: int | None = None,
                 dim: int = 64, text_col: str = "text",
                 out_col: str = "embedding"):
        self.model = load_embedding_model(model_name, device, dim=dim)
        self.batch_size = batch_size
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        emb = self.model.encode(texts, batch_size=self.batch_size)
        return batch.append_column(
            self.out_col,
            pa.array([e.astype(np.float32).tolist() for e in emb],
                     type=pa.list_(pa.float32())),
        )
