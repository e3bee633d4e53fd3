"""Model plug point: device/batch laws, load-once-per-process caching,
the stage contract (a mock heavy model is constructed once per actor),
and stub/real adapter interchangeability."""

import numpy as np
import pyarrow as pa
import pytest

from crawl4ai_ray.functions.model_loader import (
    EmbeddingModelStage,
    calculate_batch_size,
    get_device,
    load_embedding_model,
)


def test_device_and_batch_laws():
    dev = get_device()
    assert dev in ("cuda", "mps", "cpu")
    assert calculate_batch_size("cpu") == 16
    assert calculate_batch_size("other") == 16
    # mps memory is pinned at 48GB by the reference law → top tier
    assert calculate_batch_size("mps") == 256


def test_loader_is_process_cached():
    a = load_embedding_model("any/model", "cpu", dim=32)
    b = load_embedding_model("any/model", "cpu", dim=32)
    assert a is b
    c = load_embedding_model("other/model", "cpu", dim=32)
    assert c is not a
    # this environment has no torch/transformers → labeled stub
    assert a.is_stub
    emb = a.encode(["hello world", "other text"])
    assert emb.shape == (2, 32)
    assert np.allclose(np.linalg.norm(emb, axis=1), 1.0)
    assert a.encode([]).shape == (0, 32)


def test_stage_contract_loads_once(monkeypatch):
    """A mock heavy model proves the actor contract: constructed exactly
    once per stage instance (per actor), reused across batches."""
    import crawl4ai_ray.functions.model_loader as ml

    loads = []

    class MockHeavyModel:
        is_stub = False

        def __init__(self, name, device):
            loads.append((name, device))
            self.dim = 8

        def encode(self, texts, batch_size=None):
            return np.full((len(texts), self.dim), 0.5, dtype=np.float32)

    def fake_loader(model_name, device=None, *, dim=64):
        return MockHeavyModel(model_name, device or "cpu")

    monkeypatch.setattr(ml, "load_embedding_model", fake_loader)
    stage = ml.EmbeddingModelStage(model_name="mock/heavy",
                                   device="cpu", batch_size=4)
    for _ in range(3):  # three batches, one construction
        out = stage(pa.table({"text": ["a", "b"]}))
        assert out.column("embedding").to_pylist()[0] == [0.5] * 8
    assert loads == [("mock/heavy", "cpu")]


def test_stage_with_stub_end_to_end(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"doc_id": i, "text": f"document {i} text"}
                        for i in range(20)])
    out = ds.map_batches(
        EmbeddingModelStage,
        fn_constructor_kwargs={"dim": 16, "batch_size": 8},
        batch_format="pyarrow", batch_size=10, concurrency=2,
    ).to_pandas()
    assert len(out) == 20
    assert all(len(e) == 16 for e in out["embedding"])


def test_cosine_strategy_accepts_model_kwargs():
    from crawl4ai_ray.functions.cosine_extract import CosineClusterStrategy

    s = CosineClusterStrategy("filter text", model_name="any/model",
                              device="cpu", embed_dim=32)
    emb = s.embed(["hello world"])
    assert emb.shape == (1, 32)
