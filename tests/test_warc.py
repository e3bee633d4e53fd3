"""WARC sink/source laws (sources/warckit.py): record format, per-record
gzip members, byte-fidelity roundtrip, determinism of IDs/dates."""

import gzip
import hashlib
import io

import pyarrow as pa
import ray.data as rd

from crawl4ai_ray.sources.warckit import (_record_bytes, parse_warc_bytes,
                                          warc_export, warc_read)


def test_record_format_and_parse():
    payload = "héllo *world*".encode()
    rec = _record_bytes("http://x.test/a", payload)
    assert rec.startswith(b"WARC/1.1\r\n")
    assert rec.endswith(payload + b"\r\n\r\n")
    [(url, body, digest)] = list(parse_warc_bytes(rec))
    assert url == "http://x.test/a"
    assert body == payload
    assert digest == "sha256:" + hashlib.sha256(payload).hexdigest()


def test_parse_concatenated_gzip_members():
    recs = [_record_bytes(f"http://x.test/{i}", f"doc {i}".encode())
            for i in range(3)]
    blob = b"".join(gzip.compress(r, mtime=0) for r in recs)
    got = list(parse_warc_bytes(blob))
    assert [u for u, _, _ in got] == [f"http://x.test/{i}"
                                      for i in range(3)]
    assert [b for _, b, _ in got] == [f"doc {i}".encode()
                                      for i in range(3)]


def test_roundtrip_distributed(ray_session, tmp_path):
    t = pa.table({
        "url": [f"http://x.test/p{i:02d}" for i in range(23)],
        "markdown": [f"# doc {i}\n\nbody {'x' * i}" for i in range(23)],
    })
    ds = rd.from_arrow([t.slice(i * 5, 5) for i in range(5)])
    manifest = warc_export(ds, str(tmp_path / "w")).to_pandas()
    assert manifest["n_records"].sum() == 23
    back = warc_read(str(tmp_path / "w")).to_pandas()
    assert len(back) == 23
    orig = {u: m.encode() for u, m in zip(t.column("url").to_pylist(),
                                          t.column("markdown").to_pylist())}
    for _, row in back.iterrows():
        assert bytes(row["payload"]) == orig[row["url"]]
        assert row["declared_digest"] == "sha256:" + hashlib.sha256(
            bytes(row["payload"])).hexdigest()


def test_export_is_deterministic(ray_session, tmp_path):
    t = pa.table({"url": ["http://x.test/a", "http://x.test/b"],
                  "markdown": ["one", "two"]})
    a = warc_export(rd.from_arrow(t), str(tmp_path / "a")).to_pandas()
    b = warc_export(rd.from_arrow(t), str(tmp_path / "b")).to_pandas()
    fa = (tmp_path / "a" / a["file"][0].split("/")[-1]).read_bytes()
    fb = (tmp_path / "b" / b["file"][0].split("/")[-1]).read_bytes()
    assert fa == fb     # pinned mtime + derived IDs = byte-stable


def test_wds_shards_deterministic_and_balanced(ray_session, tmp_path):
    from crawl4ai_ray.pipelines.export import wds_export, wds_read

    t = pa.table({
        "url": [f"http://x.test/p{i:02d}" for i in range(40)],
        "markdown": [f"doc {i}" for i in range(40)],
    })
    m1 = wds_export(rd.from_arrow(t), str(tmp_path / "a"),
                    n_shards=4).to_pandas().sort_values("shard")
    m2 = wds_export(rd.from_arrow(
        [t.slice(0, 13), t.slice(13)]), str(tmp_path / "b"),
        n_shards=4).to_pandas().sort_values("shard")
    assert m1["n_docs"].sum() == 40
    # blocking-insensitive AND byte-identical shard files
    for s in m1["shard"]:
        fa = (tmp_path / "a" / f"shard-{s:04d}.tar").read_bytes()
        fb = (tmp_path / "b" / f"shard-{s:04d}.tar").read_bytes()
        assert fa == fb, s
    back = wds_read(str(tmp_path / "a")).to_pandas()
    assert len(back) == 40
    assert set(back["text"]) == {f"doc {i}" for i in range(40)}
