"""Multimodal plumbing + end-to-end corpus pipeline tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jschon_spark.operators.multimodal import (
    frame_sample_plan,
    media_features,
    with_media_meta,
)
from jschon_spark.pipeline import validate_corpus, validate_corpus_checkpointed
from jschon_spark.sources.webpages import generate_webpages


def test_media_meta_and_features(spark):
    rows = [(1, b"payload-one", "image/png"), (2, b"x" * 100, "audio/wav"), (3, None, "image/png")]
    df = spark.createDataFrame(rows, "id long, payload binary, mt string")
    meta = with_media_meta(df, "payload", "mt").collect()
    by_id = {r.id: r.media_meta for r in meta}
    assert by_id[1].n_bytes == 11 and by_id[1].media_type == "image/png"
    assert by_id[3].n_bytes is None

    feats = media_features(df, "payload", "mt").collect()
    ok = [r for r in feats if r.decode_ok]
    assert len(ok) == 2
    assert all(len(r.feature) == 16 for r in ok)
    # deterministic: same payload -> same feature
    feats2 = media_features(df, "payload", "mt").collect()
    assert sorted(str(r.feature) for r in feats) == sorted(str(r.feature) for r in feats2)


def test_media_decode_not_implemented(spark):
    df = spark.createDataFrame([(b"data",)], "payload binary")
    with pytest.raises(Exception) as exc:
        media_features(df, "payload", decode_stub=False).collect()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 3.0), (2, 0.5)], "id long, dur double")
    rows = frame_sample_plan(df, "dur", every_sec=1.0).collect()
    frames = {(r.id, r.frame_ts) for r in rows}
    assert {(1, 0.0), (1, 1.0), (1, 2.0), (2, 0.0)} == frames


def test_validate_corpus_end_to_end(spark):
    docs = generate_webpages(spark, 4000)
    rep = validate_corpus(spark, docs)
    m = rep.metrics
    assert m["n_docs"] == 4000
    assert 0 < m["n_failed"] < 4000
    assert m["n_duplicate_url_groups"] > 0
    assert m["n_lang_violations"] > 0
    assert rep.violations.count() > 0
    # every failing verdict has at least one violation row
    n_failed_docs = rep.verdicts.filter("NOT passed").count()
    n_viol_docs = rep.violations.select("url").distinct().count()
    # NULL urls collapse in the distinct; allow that slack
    assert n_viol_docs >= n_failed_docs - rep.verdicts.filter(
        F.col("url").isNull()
    ).count()


def test_validate_corpus_checkpointed(spark, tmp_path):
    docs = generate_webpages(spark, 2000)
    days = [
        r.day
        for r in docs.select(F.date_format("warc_ts", "yyyy-MM-dd").alias("day"))
        .distinct()
        .collect()
    ]
    snaps = {d: "s1" for d in days}
    out1 = validate_corpus_checkpointed(spark, docs, str(tmp_path), snaps)
    assert len(out1) == len(days)
    assert sum(m["metrics"]["n_docs"] for m in out1.values()) == 2000
    out2 = validate_corpus_checkpointed(spark, docs, str(tmp_path), snaps)
    assert out2 == {}


def test_iceberg_fallback_roundtrip(spark, tmp_path):
    from jschon_spark.sources.iceberg import (
        iceberg_available,
        partition_snapshots,
        read_webpages_table,
        write_webpages_table,
    )

    assert iceberg_available(spark) is False  # no jars in this image
    docs = generate_webpages(spark, 1000)
    target = str(tmp_path / "pages_tbl")
    assert write_webpages_table(spark, docs, target) == "parquet"
    back = read_webpages_table(spark, target)
    assert set(back.columns) == {"url", "warc_ts", "html", "text", "lang"}
    assert back.count() == 1000
    snaps = partition_snapshots(spark, target)
    assert len(snaps) == 30  # 30 distinct days
    assert all(len(s) == 16 for s in snaps.values())
    # fingerprints are stable across calls
    assert snaps == partition_snapshots(spark, target)
