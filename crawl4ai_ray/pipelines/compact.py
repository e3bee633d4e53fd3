"""Small-file compaction — the table-maintenance operator a crawl sink
needs at scale: the superstep sink intentionally writes one file per
task per level (crash-resumable, no coordination), which after a long
crawl leaves thousands of small parquet files that slow every
downstream read (per-file open/footer costs dominate under ~16 MB).

``compact_parquet`` rewrites a parquet tree into evenly-sized files:
one streaming read, a shuffle-free ``repartition`` (split/coalesce of
existing blocks — rows never hash-exchange), and one write bounded by
``rows_per_file``. Content is preserved row-for-row (pytest law:
sorted byte-equality before/after); the output directory gets a
``_COMPACTED`` marker so orchestration can skip finished inputs.

Reference scope note: cbwinslow/crawl4ai stores results in SQLite
(async_database.py) and never faces the many-files problem; this is
the parquet-lake replacement for its VACUUM-style maintenance.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd


def compact_parquet(in_dir: str, out_dir: str,
                    rows_per_file: int = 100_000,
                    columns: list[str] | None = None) -> pa.Table:
    """Compact the parquet tree at ``in_dir`` into ``out_dir``; returns
    a one-row stats table (rows, files_in, files_out). Skips (returning
    the recorded stats) when the ``_COMPACTED`` marker already exists —
    reruns are free."""
    marker = os.path.join(out_dir, "_COMPACTED")
    if os.path.exists(marker):
        import json

        with open(marker) as f:
            st = json.load(f)
        return pa.table({k: [v] for k, v in st.items()})

    files_in = _count_parquet_files(in_dir)
    ds = rd.read_parquet(in_dir, columns=columns)
    n = ds.count()
    n_blocks = max(1, -(-n // rows_per_file))
    ds.repartition(n_blocks).write_parquet(
        out_dir, max_rows_per_file=rows_per_file, mode="overwrite")
    files_out = _count_parquet_files(out_dir)
    st = {"rows": n, "files_in": files_in, "files_out": files_out}
    import json

    with open(marker, "w") as f:
        json.dump(st, f)
    return pa.table({k: [v] for k, v in st.items()})


def _count_parquet_files(root: str) -> int:
    total = 0
    for _dir, _sub, files in os.walk(root):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total
