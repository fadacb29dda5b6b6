"""Multimodal binary-column plumbing: schema, determinism, codec stub."""

from __future__ import annotations

import pytest

from projet_meteo_etl_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def test_payload_schema_and_magic(spark):
    from projet_meteo_etl_spark.catalog import load_table

    m = mm.with_media_payload(load_table(spark, SF, "documents"))
    dt = dict(m.dtypes)
    assert dt["payload"] == "binary"
    assert dt["kind"] == "string"
    assert dt["meta"].startswith("struct<width:int,height:int,sample_rate:int")
    rows = m.limit(30).collect()
    for r in rows:
        magic = bytes.fromhex(mm.MAGIC_HEX[r.kind])
        assert bytes(r.payload)[: len(magic)] == magic
        assert r.meta.sample_rate == (16000 if r.kind == "audio" else 0)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x89PNG", "image")


def test_fake_decoder_deterministic():
    payload = bytes(range(256)) * 3
    f1 = mm.decode_media(payload, "image", fake=True)
    f2 = mm.decode_media(payload, "image", fake=True)
    assert f1 == f2
    assert len(f1) == 16
    assert sum(f1) == len(payload)


def test_features_shape_and_determinism(spark):
    a = mm.multimodal_features(spark, SF).collect()
    b = mm.multimodal_features(spark, SF).collect()
    assert a == b
    assert len(a) > 0
    # long form: 16 dims per doc, each normalized histogram sums to ~1
    by_doc: dict[int, list] = {}
    for r in a:
        assert r.n_bytes > 0
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in list(by_doc.items())[:20]:
        assert sorted(r.dim for r in rows) == list(range(16))
        assert abs(sum(r.feature for r in rows) - 1.0) < 1e-9


def test_frame_sample_counts(spark):
    rows = mm.multimodal_frame_sample(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.frame_idx % 4 == 0
        assert 1 <= r.frame_bytes <= 256


def test_resize_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.resize_media(b"\x89PNG", "image")


def test_thumbnails_deterministic(spark):
    a = mm.multimodal_thumbnails(spark, SF).collect()
    b = mm.multimodal_thumbnails(spark, SF).collect()
    assert a == b
    assert len(a) > 0
    for r in a:
        assert r.thumb_side == 8
        assert r.thumb_bytes == 64
        assert 0 <= r.thumb_checksum <= 64 * 255
