"""Lance adapter laws: the parquet fallback implements the Lance mode
vocabulary (create/append/overwrite) with atomic _COMMIT visibility;
the real-Lance path is skip-marked where the package is absent."""

import os

import pyarrow as pa
import pytest

from crawl4ai_ray.sources import lancekit


def _tbl(lo, hi):
    return pa.table({"doc_id": pa.array(range(lo, hi), pa.int64()),
                     "text": pa.array([f"d{i}" for i in range(lo, hi)])})


def test_roundtrip_and_projection(ray_session, tmp_path):
    p = str(tmp_path / "t")
    lancekit.write_table(_tbl(0, 10), p)
    ds = lancekit.read_table(p, columns=["doc_id"])
    df = ds.to_pandas()
    assert sorted(df["doc_id"]) == list(range(10))
    assert list(df.columns) == ["doc_id"]


def test_mode_vocabulary(ray_session, tmp_path):
    p = str(tmp_path / "t")
    lancekit.write_table(_tbl(0, 5), p, mode="create")
    with pytest.raises(FileExistsError):
        lancekit.write_table(_tbl(0, 5), p, mode="create")
    lancekit.write_table(_tbl(5, 8), p, mode="append")
    assert len(lancekit.read_table(p).to_pandas()) == 8
    lancekit.write_table(_tbl(0, 3), p, mode="overwrite")
    assert len(lancekit.read_table(p).to_pandas()) == 3


def test_torn_write_invisible(ray_session, tmp_path):
    p = str(tmp_path / "t")
    os.makedirs(p)
    import pyarrow.parquet as pq
    pq.write_table(_tbl(0, 5), os.path.join(p, "part-00000.parquet"))
    # no _COMMIT marker -> the reader must refuse, not return torn data
    with pytest.raises(FileNotFoundError):
        lancekit.read_table(p)


def test_dataset_input(ray_session, tmp_path):
    import ray.data as rd

    p = str(tmp_path / "t")
    lancekit.write_table(rd.from_arrow(_tbl(0, 6)), p)
    assert len(lancekit.read_table(p).to_pandas()) == 6


@pytest.mark.skipif(not lancekit.LANCE_AVAILABLE,
                    reason="lance package not in this environment")
def test_real_lance_roundtrip(ray_session, tmp_path):
    p = str(tmp_path / "t")
    lancekit.write_table(_tbl(0, 10), p)
    assert lancekit.is_lance_dataset(p)
    assert len(lancekit.read_table(p).to_pandas()) == 10


def test_streaming_sink(ray_session, tmp_path):
    import ray.data as rd

    p = str(tmp_path / "t")
    lancekit.write_dataset_streaming(rd.from_arrow(_tbl(0, 20)), p)
    assert len(lancekit.read_table(p).to_pandas()) == 20
