"""CosineStrategy semantic extraction — chunk → embed → cluster → extract.

Behavioral port of the reference's CosineStrategy
(/root/reference/crawl4ai/extraction_strategy.py:121-478): sections join on
``DEL`` = ``"<|DEL|>"``, an optional ``semantic_filter`` keeps chunks whose
embedding-cosine to the filter text is ≥ ``sim_threshold`` (back-filling to
``at_least_k`` by similarity), hierarchical (Ward) clustering over cosine
distances is cut at ``max_dist``, clusters below ``word_count_threshold``
words are dropped, and the output is ``[{"index", "tags", "content"}]``
with chunk order preserved inside each cluster.

Environment adaptations (documented, same policy as the A6 embedder):
- sentence-transformers is absent → embeddings come from the deterministic
  ``HashedNgramEmbedder`` stub (functions/textstats.py); swap the embedder
  for a real model actor in deployment — the interface is one
  ``embed(texts) -> (n, dim) ndarray``.
- scipy is absent → Ward linkage is implemented directly via the
  Lance-Williams update (the same recurrence scipy's ``linkage`` uses) and
  the dendrogram is cut at ``max_dist`` (``fcluster(criterion="distance")``
  semantics — Ward merge heights are monotone, so stopping when the next
  merge exceeds the cut equals cutting the finished tree). Cluster ids are
  renumbered by first chunk occurrence (scipy's leaf-order numbering
  differs; grouping is identical).
- the text-classification tagger is absent → ``tags`` are the cluster's
  ``top_k`` most frequent non-stopword tokens (a labeled stub).

Runs distributed as ``CosineExtractStage`` — an actor-pool map_batches
stage (embedder built once per actor in ``__init__``), one document per
row, clustering per document (documents are independent; no shuffle).
"""

from __future__ import annotations

import json
from collections import Counter

import numpy as np
import pyarrow as pa

from .textstats import HashedNgramEmbedder
from .textutils import clean_tokens

DEL = "<|DEL|>"


def ward_labels(emb: np.ndarray, max_dist: float) -> np.ndarray:
    """Agglomerative Ward clustering over cosine distances, cut at
    ``max_dist``; returns int labels (1-based, first-occurrence order)."""
    n = len(emb)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n == 1:
        return np.ones(1, dtype=np.int64)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = emb / norms
    d = 1.0 - unit @ unit.T            # cosine distance matrix
    np.fill_diagonal(d, np.inf)
    d = np.maximum(d, 0.0)
    d2 = np.where(np.isfinite(d), d ** 2, np.inf)
    size = np.ones(n)
    active = np.ones(n, dtype=bool)
    members: list[list[int]] = [[i] for i in range(n)]
    while active.sum() > 1:
        dd = np.where(active[:, None] & active[None, :], d2, np.inf)
        np.fill_diagonal(dd, np.inf)
        i, j = np.unravel_index(np.argmin(dd), dd.shape)
        merge_dist = float(np.sqrt(dd[i, j]))
        if merge_dist > max_dist:
            break
        # Lance-Williams Ward update on squared distances:
        # d(k, i∪j)² = ((n_i+n_k)d_ki² + (n_j+n_k)d_kj² − n_k d_ij²) / N
        ni, nj = size[i], size[j]
        nk = size
        with np.errstate(invalid="ignore"):
            new = ((ni + nk) * d2[i] + (nj + nk) * d2[j]
                   - nk * d2[i, j]) / (ni + nj + nk)
        d2[i, :] = new
        d2[:, i] = new
        d2[i, i] = np.inf
        size[i] = ni + nj
        members[i] = members[i] + members[j]
        active[j] = False
    labels = np.zeros(n, dtype=np.int64)
    clusters = sorted(
        (members[i] for i in range(n) if active[i]),
        key=lambda m: min(m),
    )
    for lbl, m in enumerate(clusters, start=1):
        labels[m] = lbl
    return labels


class CosineClusterStrategy:
    """Per-document semantic clustering; see module docstring."""

    def __init__(self, semantic_filter: str | None = None, *,
                 word_count_threshold: int = 10, max_dist: float = 0.2,
                 top_k: int = 3, sim_threshold: float = 0.3,
                 embed_dim: int = 64, model_name: str | None = None,
                 device: str | None = None):
        # model plug point (functions/model_loader.py): same constructor
        # surface as a real sentence-transformers actor — with weights
        # present load_embedding_model returns the HF adapter, here the
        # deterministic HashedNgram stub (identical .encode interface)
        from .model_loader import DEFAULT_EMBEDDING_MODEL, \
            load_embedding_model

        self.semantic_filter = semantic_filter
        self.word_count_threshold = word_count_threshold
        self.max_dist = max_dist
        self.top_k = top_k
        self.sim_threshold = sim_threshold
        self._model = load_embedding_model(
            model_name or DEFAULT_EMBEDDING_MODEL, device, dim=embed_dim)

    def embed(self, texts: list[str]) -> np.ndarray:
        return self._model.encode(list(texts)).astype(np.float64)

    def _filter_chunks(self, chunks: list[str],
                       at_least_k: int = 20) -> list[str]:
        """filter_documents_embeddings (extraction_strategy.py:228-283):
        keep chunks ≥ sim_threshold vs the filter text, back-fill the
        most-similar rest up to at_least_k, cap at at_least_k."""
        if not self.semantic_filter:
            return chunks
        if len(chunks) < at_least_k:
            at_least_k = len(chunks) // 2
        q = self.embed([self.semantic_filter])[0]
        qn = np.linalg.norm(q) or 1.0
        mat = self.embed(chunks)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ q) / (norms * qn)
        kept = [(c, s) for c, s in zip(chunks, sims)
                if s >= self.sim_threshold]
        if len(kept) < at_least_k:
            rest = sorted(
                ((c, s) for c, s in zip(chunks, sims)
                 if s < self.sim_threshold),
                key=lambda cs: cs[1], reverse=True,
            )
            kept.extend(rest[: at_least_k - len(kept)])
        return [c for c, _ in kept][:at_least_k]

    def _tags(self, content: str) -> list[str]:
        toks = clean_tokens(content.lower().split())
        return [w for w, _ in Counter(toks).most_common(self.top_k)]

    def extract(self, url: str, html: str) -> list[dict]:
        chunks = [c for c in html.split(DEL)]
        chunks = self._filter_chunks(chunks, 20)
        chunks = [c for c in chunks if c.strip()]
        if not chunks:
            return []
        labels = ward_labels(self.embed(chunks), self.max_dist)
        clusters: dict[int, list[str]] = {}
        for idx, lbl in enumerate(labels):
            clusters.setdefault(int(lbl), []).append(chunks[idx])
        out = []
        for lbl in sorted(clusters):
            content = " ".join(clusters[lbl])
            if len(content.split()) < self.word_count_threshold:
                continue
            out.append({"index": lbl, "tags": self._tags(content),
                        "content": content})
        return out

    def run(self, url: str, sections: list[str]) -> list[dict]:
        return self.extract(url, DEL.join(sections))


class CosineExtractStage:
    """Actor-pool map_batches stage: (key, text) rows → one row per
    extracted cluster (doc_key, cluster_index, tags json, content).
    Strategy (embedder) is built once per actor."""

    def __init__(self, *, text_col: str = "text", key_col: str = "doc_id",
                 chunk_chars: int = 300, **strategy_kwargs):
        self.strategy = CosineClusterStrategy(**strategy_kwargs)
        self.text_col = text_col
        self.key_col = key_col
        self.chunk_chars = chunk_chars

    def _sections(self, text: str) -> list[str]:
        """Fixed-size word sections (the engine's docs are plain text; the
        reference feeds markdown sections from its chunker here)."""
        words = (text or "").split()
        per = max(1, self.chunk_chars // 6)
        return [" ".join(words[i:i + per])
                for i in range(0, len(words), per)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, idxs, tags, contents = [], [], [], []
        for key, text in zip(batch.column(self.key_col).to_pylist(),
                             batch.column(self.text_col).to_pylist()):
            for c in self.strategy.run("", self._sections(text)):
                keys.append(key)
                idxs.append(c["index"])
                tags.append(json.dumps(c["tags"]))
                contents.append(c["content"])
        return pa.table(
            {
                "doc_key": pa.array(keys),
                "cluster_index": pa.array(idxs, pa.int64()),
                "tags": pa.array(tags, pa.string()),
                "content": pa.array(contents, pa.string()),
            }
        )


def cosine_extract_clusters(sf_dir: str, *, semantic_filter: str | None
                            = None, max_dist: float = 0.35,
                            word_count_threshold: int = 10):
    """Pipeline entry: documents table → per-document semantic clusters
    (rows-only query; determinism is pytest-gated)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(
        CosineExtractStage,
        fn_constructor_kwargs={
            "semantic_filter": semantic_filter, "max_dist": max_dist,
            "word_count_threshold": word_count_threshold,
        },
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=2,
    )
