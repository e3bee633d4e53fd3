"""Multimodal stage tests: codec round-trip, decode/resize/frame-sample
plumbing, determinism, end-to-end pipelines."""

import pyarrow as pa
import pytest

from crawl4ai_ray.stages.multimodal import (
    FakeCodec,
    FrameSampleStage,
    ImageResizeStage,
    MediaDecodeStage,
    MediaFeatureStage,
    frame_sample_pipeline,
    media_pipeline,
    synth_media_table,
)

SF = "/root/testdata/sf0.001"


def test_codec_roundtrip():
    blob = FakeCodec.encode("image", 7, width=128, height=96, body_len=512)
    d = FakeCodec.decode(blob)
    assert (d["kind"], d["width"], d["height"]) == ("image", 128, 96)
    assert len(d["body"]) == 512
    assert blob == FakeCodec.encode("image", 7, width=128, height=96,
                                    body_len=512)
    with pytest.raises(ValueError):
        FakeCodec.decode(b"\x89PNG fake real png")


def test_decode_stage():
    tbl = synth_media_table(9)
    out = MediaDecodeStage()(tbl)
    assert out.num_rows == 9
    assert "payload" not in out.column_names
    kinds = out.column("kind").to_pylist()
    widths = out.column("width").to_pylist()
    rates = out.column("sample_rate").to_pylist()
    assert kinds[0] == "image" and widths[0] > 0
    assert kinds[1] == "audio" and rates[1] == 16000
    assert kinds[2] == "video" and out.column("n_frames").to_pylist()[2] > 0
    # deterministic
    out2 = MediaDecodeStage()(synth_media_table(9))
    assert out.equals(out2)


def test_decode_stage_strict_raises():
    bad = pa.table(
        {"media_id": [0], "kind": ["image"],
         "payload": pa.array([b"JFIF..."], type=pa.large_binary())}
    )
    with pytest.raises(ValueError):
        MediaDecodeStage(strict=True)(bad)
    lenient = MediaDecodeStage()(bad)
    assert lenient.column("width").to_pylist() == [-1]


def test_feature_stage():
    out = MediaFeatureStage()(synth_media_table(6))
    feats = out.column("features").to_pylist()
    assert all(len(f) == 16 for f in feats)
    assert all(-1.0 <= v <= 1.0 for f in feats for v in f)
    assert feats[0] != feats[1]


def test_resize_stage():
    tbl = synth_media_table(6)
    out = ImageResizeStage(224, 224)(tbl)
    dec = MediaDecodeStage()(out)
    for kind, w, h in zip(dec.column("kind").to_pylist(),
                          dec.column("width").to_pylist(),
                          dec.column("height").to_pylist()):
        if kind == "image":
            assert (w, h) == (224, 224)


def test_frame_sample_stage():
    tbl = synth_media_table(9)
    out = FrameSampleStage(stride=8)(tbl)
    ids = set(out.column("media_id").to_pylist())
    assert ids == {2, 5, 8}  # only videos
    idxs = [i for m, i in zip(out.column("media_id").to_pylist(),
                              out.column("frame_idx").to_pylist()) if m == 2]
    assert idxs == list(range(0, idxs[-1] + 1, 8))


def test_media_pipelines_e2e(ray_session):
    df = media_pipeline(SF, n=60).to_pandas()
    assert len(df) == 60
    assert {"media_id", "kind", "width", "checksum"} <= set(df.columns)
    frames = frame_sample_pipeline(SF, n=60).to_pandas()
    assert len(frames) > 0
    assert set(frames.columns) == {"media_id", "frame_idx", "frame_checksum"}


def test_phash_dedup_planted_pairs(ray_session):
    """Every planted near-dup (3 byte flips inside the dHash window) is
    found at Hamming <= 6, exactly once, with no spurious pairs, and
    8-band bucketing is complete for the radius (pigeonhole law)."""
    from crawl4ai_ray.stages.multimodal import (PerceptualHashStage,
                                                phash_dedup_pipeline,
                                                synth_media_with_neardups)

    df = phash_dedup_pipeline("/root/testdata/sf0.001").to_pandas()
    planted = {(i, 500 + j) for j, i in enumerate(range(0, 500, 10))}
    got = set(zip(df["media_a"], df["media_b"]))
    assert got == planted
    assert int(df["hamming"].max()) <= 6
    assert not df.duplicated(["media_a", "media_b"]).any()
    # hamming values match a direct hash recompute
    tbl = synth_media_with_neardups(500)
    stage = PerceptualHashStage()
    ph = dict(zip(tbl.column("media_id").to_pylist(),
                  stage(tbl).column("phash").to_pylist()))
    for _, r in df.iterrows():
        d = bin(ph[r["media_a"]] ^ ph[r["media_b"]]).count("1")
        assert d == r["hamming"]


def test_caption_pairing_laws():
    """Synthetic span layouts lock the pairing law independent of
    crawl content: image-first docs drop the image, empty/whitespace
    text spans never caption, ties resolve to the largest offset
    strictly below the media span, and multiple images may share one
    caption."""
    import pyarrow as pa

    import __ray_entry__ as entry

    def doc(url, spans):
        return {"url": url, "spans": spans}

    def sp(kind, offset, text="", media_ref=""):
        return {"kind": kind, "text": text, "media_ref": media_ref,
                "offset": offset}

    batch = pa.Table.from_pylist([
        # image before any text -> dropped; later image pairs
        doc("u1", [sp("image", 0, media_ref="m0"),
                   sp("text", 1, "alpha"),
                   sp("image", 2, media_ref="m1")]),
        # whitespace-only text never captions; falls back to 'beta'
        doc("u2", [sp("text", 0, "beta"),
                   sp("text", 1, "   "),
                   sp("image", 2, media_ref="m2")]),
        # two images share the same nearest caption
        doc("u3", [sp("text", 0, "gamma"),
                   sp("image", 1, media_ref="m3"),
                   sp("image", 2, media_ref="m4"),
                   sp("text", 3, "delta"),
                   sp("image", 4, media_ref="m5")]),
        # no text at all -> no pairs
        doc("u4", [sp("image", 0, media_ref="m6")]),
    ])
    out = entry._caption_pairs_batch(batch).to_pylist()
    got = {(r["url"], r["media_ref"]): r["caption"] for r in out}
    assert got == {
        ("u1", "m1"): "alpha",
        ("u2", "m2"): "beta",
        ("u3", "m3"): "gamma",
        ("u3", "m4"): "gamma",
        ("u3", "m5"): "delta",
    }
