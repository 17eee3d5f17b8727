"""Byte-identical text extraction (north-rule invariant) + goldens."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from jschon_spark.sources.extract import (
    EXTRACTOR_VERSION,
    GOLDEN_CASES as GOLDENS,
    extract_text_bytes,
    with_extracted_text,
)
from jschon_spark.sources.webpages import generate_webpages


@pytest.mark.parametrize("html,want", GOLDENS, ids=range(len(GOLDENS)))
def test_extract_goldens(html, want):
    assert extract_text_bytes(html) == want


def test_extract_none():
    assert extract_text_bytes(None) is None


def test_extractor_version_pinned():
    # hash of the golden outputs IS the behavioural contract: if this
    # changes, EXTRACTOR_VERSION must change with it.
    h = hashlib.sha256("\x00".join(t for _, t in GOLDENS).encode()).hexdigest()[:12]
    assert (EXTRACTOR_VERSION, h) == ("1.0.0", "fde72e6543db")


def test_generated_corpus_byte_identity(spark):
    df = generate_webpages(spark, 3000)
    ext = with_extracted_text(df)
    mismatches = ext.filter(
        F.col("html").isNotNull() & (F.col("text") != F.col("text_extracted"))
    ).count()
    assert mismatches == 0
    nulls = ext.filter(F.col("html").isNull() & F.col("text_extracted").isNotNull()).count()
    assert nulls == 0


def test_udf_matches_pure_function(spark):
    rows = [(i, g[0]) for i, g in enumerate(GOLDENS)]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {
        r.id: r.text_extracted
        for r in with_extracted_text(df).collect()
    }
    for i, (html, want) in enumerate(GOLDENS):
        assert got[i] == want
