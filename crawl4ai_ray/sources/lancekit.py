"""Lance table adapter — the north-rule storage format, activated iff
the ``lance`` package imports (the ``functions/model_loader.py``
availability pattern; this sandbox ships without it).

The north rule stores the frontier / documents / checkpoint tables as
Lance datasets. Lance's properties the engine actually relies on are
(a) atomic versioned commits and (b) columnar scans with column
projection + predicate pushdown; the engine's native layout — a parquet
directory whose writer stages into a temp dir and renames after writing
a ``_COMMIT`` marker (``pipelines/crawl.py``) — provides the same two
guarantees, which is why every pipeline is format-agnostic above this
seam. When ``lance`` IS present, ``write_table``/``read_table`` here
produce and scan real Lance datasets:

- write: Arrow table / Ray ``Dataset`` → ``lance.write_dataset`` with
  ``mode='create'|'append'|'overwrite'`` (Lance's own atomic manifest
  commit replaces the ``_COMMIT`` rename).
- read: ``ray.data.read_lance`` (Ray Data's native Lance datasource;
  fragment-parallel, column projection + filter pushdown) when the path
  holds a Lance dataset, else ``read_parquet``.

Nothing else in the engine needs to change: both formats expose the
same Dataset surface, so the pipelines stay identical — exactly how
``stages/render.py`` treats Playwright and ``functions/llm_extract.py``
treats a live endpoint.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

try:  # pragma: no cover - exercised only where the package exists
    import lance  # type: ignore

    LANCE_AVAILABLE = True
except ImportError:
    lance = None  # type: ignore
    LANCE_AVAILABLE = False


def is_lance_dataset(path: str) -> bool:
    """A Lance dataset directory carries a ``_versions``/``_latest.manifest``
    tree; the engine's fallback layout carries parquet + ``_COMMIT``."""
    return os.path.isdir(path) and (
        os.path.isdir(os.path.join(path, "_versions"))
        or any(n.endswith(".manifest") for n in os.listdir(path))
    )


def write_table(data, path: str, *, mode: str = "create") -> str:
    """Write an Arrow table or Ray Dataset to ``path`` atomically.

    mode: 'create' (error if exists), 'append', 'overwrite' — the Lance
    mode vocabulary; the parquet fallback implements the same semantics
    with a staged temp dir + ``_COMMIT`` rename (append adds a new
    staged part file; readers ignore parts without the marker).
    """
    if hasattr(data, "to_arrow_refs"):  # Ray Dataset
        import ray

        tbl = pa.concat_tables(ray.get(data.to_arrow_refs()))
    else:
        tbl = data
    if LANCE_AVAILABLE:
        lance.write_dataset(tbl, path, mode=mode)
        return path

    if mode == "create" and os.path.isdir(path) and os.listdir(path):
        raise FileExistsError(path)
    if mode == "overwrite" and os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    # staged write + marker rename: readers never see a torn part
    existing = [n for n in os.listdir(path) if n.endswith(".parquet")]
    part = f"part-{len(existing):05d}.parquet"
    tmp = os.path.join(path, f".{part}.tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(path, part))
    with open(os.path.join(path, "_COMMIT"), "w") as f:
        f.write("1")
    return path


def write_dataset_streaming(ds: "rd.Dataset", path: str) -> str:
    """Streaming sink for n-sized tables — blocks flow task-side, nothing
    lands on the driver (``write_table`` above concatenates on the
    driver and is for small control tables: checkpoints, metrics,
    lineage). Uses Ray Data's native ``Dataset.write_lance`` when the
    package exists, else ``write_parquet`` + ``_COMMIT`` marker."""
    if LANCE_AVAILABLE:
        ds.write_lance(path)
        return path
    ds.write_parquet(path)
    with open(os.path.join(path, "_COMMIT"), "w") as f:
        f.write("1")
    return path


def read_table(path: str, *, columns=None) -> "rd.Dataset":
    """Scan ``path`` as a Ray Dataset with column projection, choosing
    the Lance datasource when the directory is a Lance dataset."""
    if LANCE_AVAILABLE and is_lance_dataset(path):
        return rd.read_lance(path, columns=columns)
    if os.path.isdir(path) and not os.path.exists(
            os.path.join(path, "_COMMIT")):
        raise FileNotFoundError(
            f"{path}: no _COMMIT marker — torn or in-progress write")
    return rd.read_parquet(path, columns=columns)
