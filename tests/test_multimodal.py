"""Multimodal binary-column plumbing: schema, header parse, determinism."""

import hashlib

from pyspark.sql import functions as F

from docling_metrics_spark.datagen import generate_documents_df
from docling_metrics_spark.multimodal import (
    HEADER,
    MAGIC,
    decode_media_features,
    media_table,
    sample_frames,
    synth_payload,
)


def test_synth_payload_header_roundtrip():
    p = synth_payload("media://doc_x/3", media_type=2, width=96, height=64)
    magic, mt, w, h, n = HEADER.unpack_from(p)
    assert magic == MAGIC and mt == 2 and (w, h) == (96, 64)
    assert len(p) == HEADER.size + n
    # deterministic
    assert p == synth_payload("media://doc_x/3", media_type=2, width=96, height=64)


def test_media_table_schema_and_payloads(spark):
    docs = generate_documents_df(spark, 40)
    media = media_table(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    rows = media.collect()
    n_image_spans = docs.select(
        F.explode(F.filter("spans", lambda s: s.kind == F.lit("image")))
    ).count()
    assert len(rows) == n_image_spans > 0
    for r in rows[:5]:
        magic, mt, w, h, n = HEADER.unpack_from(bytes(r.payload))
        assert magic == MAGIC and (w, h) == (r.width, r.height)


def test_decode_features_deterministic(spark):
    docs = generate_documents_df(spark, 30)
    media = media_table(docs)
    feats = decode_media_features(media).orderBy("media_ref").collect()
    assert len(feats) > 0
    for f_ in feats[:5]:
        payload = synth_payload(
            f_.media_ref,
            {"image": 0, "audio": 1, "video": 2}[f_.media_type],
            f_.width,
            f_.height,
        )
        body = payload[HEADER.size:]
        assert f_.n_bytes == len(body)
        assert f_.checksum == hashlib.md5(body).hexdigest()
        assert f_.decoder == "stub"  # no codec libs in sandbox


def test_frame_sampling(spark):
    docs = generate_documents_df(spark, 60)
    media = media_table(docs)
    frames = sample_frames(media, every=2, frame_bytes=128)
    rows = frames.collect()
    n_videos = media.filter("media_type = 'video'").count()
    if n_videos == 0:
        return
    assert len(rows) > 0
    assert {r.frame_index % 2 for r in rows} == {0}
