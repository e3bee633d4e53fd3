#!/usr/bin/env python
"""Freeze golden outputs for deterministic non-SQL-expressible queries.

``simhash_table`` and ``doc_embeddings`` are pure per-row transforms
(64-bit simhash of text; hashed-n-gram embedding), deterministic for a
given input — but no DuckDB oracle can express them. This writes their
sf0.001 outputs to tests/golden/query/ as parquet; pytest gates the live
pipelines against these snapshots byte-for-byte
(tests/test_query_goldens.py), upgrading both from rows-only to hard
equality. Regenerate ONLY after an intentional law change:

    python tools/gen_query_goldens.py
"""

import hashlib
import os

import ray


def main() -> None:
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    qs = entry.queries()
    out_dir = "tests/golden/query"
    os.makedirs(out_dir, exist_ok=True)
    for name in ("simhash_table", "doc_embeddings"):
        res = qs[name]("/root/testdata/sf0.001")
        tbl = res.to_pandas() if hasattr(res, "to_pandas") else res
        import pandas as pd
        import pyarrow as pa

        if not isinstance(tbl, pd.DataFrame):
            tbl = tbl.to_pandas() if isinstance(tbl, pa.Table) else tbl
        tbl = tbl.sort_values("doc_id").reset_index(drop=True)
        path = os.path.join(out_dir, f"{name}_sf0001.parquet")
        pq.write_table(pa.Table.from_pandas(tbl, preserve_index=False),
                       path)
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()[:16]
        print(f"{name}: {len(tbl)} rows -> {path} ({digest})")
    ray.shutdown()


if __name__ == "__main__":
    main()
