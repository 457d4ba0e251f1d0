"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlp_entity_linking_spark.operators import multimodal as M


def test_gen_media_deterministic_schema(spark):
    a = M.gen_media(spark, 50)
    b = M.gen_media(spark, 50)
    assert a.exceptAll(b).count() == 0
    assert a.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,"
        "meta:struct<width:int,height:int,n_frames:int,bytes:bigint>>"
    )
    kinds = {r.kind for r in a.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_media_parses_headers(spark):
    media = M.gen_media(spark, 60)
    dec = M.decode_media(media)
    rows = dec.collect()
    assert len(rows) == 60 and all(r.ok for r in rows)
    meta = {
        r.media_id: (r.meta.width, r.meta.height, r.meta.n_frames)
        for r in media.collect()
    }
    for r in rows:
        assert (r.width, r.height, r.n_frames) == meta[r.media_id]


def test_decode_media_rejects_garbage(spark):
    bad = spark.createDataFrame(
        [(1, "image", b"NOTSYNM-garbage")], "media_id long, kind string, payload binary"
    )
    row = M.decode_media(bad).collect()[0]
    assert row.ok is False and row.width is None


def test_decode_real_is_marked_stub():
    with pytest.raises(NotImplementedError):
        M._decode_real(b"\x89PNG....")


def test_extract_features_deterministic(spark):
    media = M.gen_media(spark, 40)
    f1 = {r.media_id: r.features for r in M.extract_features(media).collect()}
    f2 = {r.media_id: r.features for r in M.extract_features(media.repartition(7)).collect()}
    assert f1 == f2
    assert all(len(v) == M.FEATURE_DIM for v in f1.values())


def test_resize_and_frames(spark):
    media = M.gen_media(spark, 80)
    rs = M.resize_images(media, max_side=16).collect()
    assert rs and all(max(r.width, r.height) <= 16 for r in rs)
    fr = M.sample_frames(media, every=5)
    vids = media.filter("kind = 'video'")
    per = fr.groupBy("media_id").count().collect()
    nmeta = {r.media_id: r.meta.n_frames for r in vids.collect()}
    assert {r.media_id for r in per} == set(nmeta)
    for r in per:
        assert r["count"] == (nmeta[r.media_id] + 4) // 5
