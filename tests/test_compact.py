"""Compaction laws: content preserved row-for-row, file count reduced,
rerun with the marker is a no-op returning recorded stats."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from crawl4ai_ray.pipelines.compact import compact_parquet

SF = "/root/testdata/sf0.001"


def _make_small_files(dst: str, n_files: int = 20):
    tbl = pq.read_table(f"{SF}/documents.parquet")
    per = -(-tbl.num_rows // n_files)
    os.makedirs(dst)
    for i in range(n_files):
        s = tbl.slice(i * per, per)
        if s.num_rows:
            pq.write_table(s, f"{dst}/part-{i:04d}.parquet")
    return tbl


def test_compact_preserves_content_and_merges(ray_session, tmp_path):
    src = str(tmp_path / "small")
    out = str(tmp_path / "big")
    tbl = _make_small_files(src)
    st = compact_parquet(src, out, rows_per_file=400).to_pandas()
    assert st.loc[0, "rows"] == tbl.num_rows
    assert st.loc[0, "files_in"] == 20
    assert st.loc[0, "files_out"] < st.loc[0, "files_in"]
    a = rd.read_parquet(src).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = rd.read_parquet(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b[a.columns])
    # every output file respects the rows_per_file bound
    for f in os.listdir(out):
        if f.endswith(".parquet"):
            assert pq.read_metadata(os.path.join(out, f)).num_rows <= 400
    # rerun: marker short-circuits and returns the same stats
    st2 = compact_parquet(src, out, rows_per_file=400).to_pandas()
    assert st.equals(st2)
