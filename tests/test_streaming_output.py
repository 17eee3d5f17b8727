"""Streaming validation smoke (memory sink) + output formats + registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jschon_spark.engine import ConstraintEngine
from jschon_spark.output import basic, create_output, flag
from jschon_spark.pipeline import PAGE_DOC_COLS, PAGE_SCHEMA
from jschon_spark.sources.webpages import generate_webpages
from jschon_spark.streaming.validate import (
    validate_stream,
    windowed_verdicts,
)


@pytest.fixture(scope="module")
def validated(spark):
    docs = generate_webpages(spark, 2000)
    eng = ConstraintEngine(assert_formats=True)
    return eng.compile(PAGE_SCHEMA).apply_typed(docs, PAGE_DOC_COLS).cache()


def test_flag_and_basic_formats(spark, validated):
    f = flag(validated, "url")
    assert f.columns == ["url", "valid"]
    b = basic(validated, "url")
    assert b.columns == ["url", "keyword", "keywordLocation", "instanceLocation", "error"]
    assert b.count() > 0
    assert create_output(validated, "flag", "url").count() == validated.count()
    with pytest.raises(ValueError):
        create_output(validated, "nope", "url")


def _count_errors(node: dict) -> int:
    return len(node.get("errors", [])) + sum(
        _count_errors(c) for c in node.get("children", [])
    )


def test_detailed_format(spark, validated):
    bad = validated.filter(~F.col("passed")).select("url").first()
    doc = create_output(validated, "detailed", "url", doc_id=bad.url)
    assert doc["valid"] is False
    assert _count_errors(doc) > 0


def test_detailed_and_hierarchical_goldens(spark):
    """Recursive nesting goldens mirroring the reference's formats
    (/root/reference/tests/test_output.py:85+): detailed follows the
    instance tree, hierarchical the keyword evaluation path."""
    schema = {
        "type": "object",
        "required": ["name"],
        "properties": {
            "name": {"type": "string"},
            "tags": {"items": {"maxLength": 2}},
        },
    }
    df = spark.createDataFrame(
        [(1, None, ["okk", "a", "bcd"])],
        "id long, name string, tags array<string>",
    )
    compiled = ConstraintEngine().compile(schema)
    validated = compiled.apply_typed(df, ["name", "tags"])

    det = create_output(validated, "detailed", "id", doc_id=1)
    assert det == {
        "valid": False,
        "instanceLocation": "",
        "errors": [
            {"keyword": "required", "keywordLocation": "/required",
             "error": "missing required properties", "value": "name"},
        ],
        "children": [
            {"valid": False, "instanceLocation": "/tags", "children": [
                {"valid": False, "instanceLocation": "/tags/0",
                 "errors": [{"keyword": "maxLength",
                             "keywordLocation": "/properties/tags/items/maxLength",
                             "error": "longer than 2", "value": "okk"}]},
                {"valid": False, "instanceLocation": "/tags/2",
                 "errors": [{"keyword": "maxLength",
                             "keywordLocation": "/properties/tags/items/maxLength",
                             "error": "longer than 2", "value": "bcd"}]},
            ]},
        ],
    }

    hier = create_output(validated, "hierarchical", "id", doc_id=1)
    assert hier == {
        "valid": False,
        "evaluationPath": "",
        "children": [
            {"valid": False, "evaluationPath": "/properties/tags/items/maxLength",
             "errors": [
                 {"keyword": "maxLength", "instanceLocation": "/tags/0",
                  "error": "longer than 2", "value": "okk"},
                 {"keyword": "maxLength", "instanceLocation": "/tags/2",
                  "error": "longer than 2", "value": "bcd"},
             ]},
            {"valid": False, "evaluationPath": "/required",
             "errors": [
                 {"keyword": "required", "instanceLocation": "",
                  "error": "missing required properties", "value": "name"},
             ]},
        ],
    }


def test_streaming_validation_memory_sink(spark, tmp_path):
    # materialize a small corpus as the file-stream source
    src = str(tmp_path / "stream_src")
    generate_webpages(spark, 1000).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    eng = ConstraintEngine(assert_formats=True)
    compiled = eng.compile(PAGE_SCHEMA)
    validated = validate_stream(compiled, stream, PAGE_DOC_COLS)
    rollup = windowed_verdicts(validated, "warc_ts", "24 hours", "48 hours")

    q = (
        rollup.writeStream.outputMode("append")
        .format("memory")
        .queryName("verdict_windows")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM verdict_windows").collect()
    # append mode only emits watermark-closed windows; with availableNow
    # over a bounded source the final watermark closes all but the last
    assert rows, "no windows emitted"
    assert {c for c in spark.table("verdict_windows").columns} == {
        "window_start", "window_end", "n_docs", "n_failed", "passed"
    }
    # batch ground truth: same plan, same data
    batch = compiled.apply_typed(spark.read.parquet(src), PAGE_DOC_COLS)
    got_failed = sum(r.n_failed for r in rows)
    want_failed_upper = batch.filter(~F.col("passed")).count()
    assert 0 < got_failed <= want_failed_upper


def test_custom_format_and_keyword_registry(spark):
    from jschon_spark.functions import custom_keyword, format_validator
    from jschon_spark.functions.registry import FORMAT_REGISTRY, KEYWORD_REGISTRY

    @format_validator(
        "even-digits", column_fn=lambda c: (F.length(c) % 2) == 0
    )
    def _even_digits(v):
        return isinstance(v, str) and len(v) % 2 == 0

    @custom_keyword(
        "startsWith",
        column_fn=lambda kwv, col, dtype: col.startswith(kwv),
        error="value does not start with the prefix",
    )
    def _starts_with(kwv):
        return lambda inst: isinstance(inst, str) and inst.startswith(kwv)

    try:
        from jschon_spark.evaluator import Evaluator

        ev = Evaluator(assert_formats=True)
        assert ev.validate({"format": "even-digits"}, "abcd").valid
        assert not ev.validate({"format": "even-digits"}, "abc").valid
        assert ev.validate({"startsWith": "ab"}, "abc").valid
        assert not ev.validate({"startsWith": "ab"}, "xbc").valid

        # column path
        eng = ConstraintEngine(assert_formats=True)
        cs = eng.compile(
            {"properties": {"s": {"type": "string", "startsWith": "ab", "format": "even-digits"}}}
        )
        df = spark.createDataFrame([("abcd",), ("abc",), ("xb",)], "s string")
        got = [r.passed for r in cs.apply_typed(df).collect()]
        assert got == [True, False, False]
    finally:
        FORMAT_REGISTRY.pop("even-digits", None)
        KEYWORD_REGISTRY.pop("startsWith", None)


def test_stateful_violation_monitor(spark, tmp_path):
    """State accumulates across micro-batches (two files, two triggers)."""
    import pandas as pd
    from jschon_spark.streaming.stateful import violation_monitor

    src = str(tmp_path / "mon_src")
    schema = "url string, passed boolean"
    df1 = spark.createDataFrame(
        [("https://a.x/1", True), ("https://a.x/2", False), ("https://b.y/1", True)],
        schema,
    )
    df1.write.mode("append").parquet(src)

    stream = spark.readStream.schema(df1.schema).option("maxFilesPerTrigger", "100").parquet(src)
    mon = violation_monitor(stream, threshold=0.4)
    q = (
        mon.writeStream.outputMode("update")
        .format("memory")
        .queryName("monitor_out")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.key: (r.n_docs, r.n_failed, r.alert)
                 for r in spark.sql("SELECT * FROM monitor_out").collect()}
        assert first["a.x"] == (2, 1, True)
        assert first["b.y"] == (1, 0, False)

        # second micro-batch: counts must ACCUMULATE (stateful), not reset
        spark.createDataFrame(
            [("https://a.x/3", True), ("https://a.x/4", True), ("https://b.y/2", False)],
            schema,
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM monitor_out").collect()
        latest = {}
        for r in rows:  # update mode appends revisions; last write wins
            latest[r.key] = (r.n_docs, r.n_failed, r.alert)
        assert latest["a.x"] == (4, 1, False)   # ratio 0.25 -> alert cleared
        assert latest["b.y"] == (2, 1, True)    # ratio 0.5 -> alert raised
    finally:
        q.stop()


def test_verbose_format(spark, validated):
    from jschon_spark.pipeline import PAGE_SCHEMA

    bad = validated.filter(~F.col("passed")).select("url").first()
    doc = create_output(
        validated, "verbose", "url", doc_id=bad.url, schema=PAGE_SCHEMA
    )
    assert doc["valid"] is False
    assert isinstance(doc["annotations"], list)
    # PAGE_SCHEMA declares format: date-time on warc_ts
    assert any(a["keyword"] == "format" for a in doc["annotations"])


def test_streaming_first_seen_dedup(spark, tmp_path):
    """applyInPandasWithState dedup: a key appearing in two micro-batches
    is emitted exactly once, with the introducing batch's count."""
    from jschon_spark.streaming.dedup import first_seen

    src = str(tmp_path / "dedup_src")
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [("u1", 1), ("u1", 2), ("u2", 3)], "url string, x int"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [("u1", 4), ("u3", 5)], "url string, x int"
    ).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = first_seen(stream, "url")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("first_seen_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r.url: r.n_first_batch for r in spark.sql(
            "SELECT * FROM first_seen_t").collect()}
    finally:
        q.stop()
    # each key exactly once; u1 counted within its introducing batch only
    assert set(rows) == {"u1", "u2", "u3"}
    assert rows["u2"] == 1 and rows["u3"] == 1 and rows["u1"] >= 1


def test_basic_with_annotations_for_valid(spark):
    schema = {"title": "Doc", "properties": {"a": {"type": "integer",
                                                   "description": "an int"}}}
    df = spark.createDataFrame([(1, 5), (2, None)], "id long, a long")
    compiled = ConstraintEngine().compile(schema, validate_schema=False)
    validated = compiled.apply_typed(df, ["a"])
    rows = basic(validated, "id", schema=schema).collect()
    # both docs valid -> 2 docs x 2 annotations, 0 error rows
    assert len(rows) == 4
    assert {(r.keyword, r.keywordLocation) for r in rows} == {
        ("title", "/title"), ("description", "/properties/a/description")
    }


def test_custom_registry_query_is_side_effect_free(spark):
    """VERDICT r4 #8: custom_registry_verdicts must unregister its
    custom format/keyword in a finally block — the process-global
    registries are clean after the query builds (the compiled plan
    carries the baked Column expressions), and the result still
    executes correctly."""
    from jschon_spark.functions.registry import FORMAT_REGISTRY, KEYWORD_REGISTRY
    from jschon_spark.queries import custom_registry_verdicts

    assert "x-short-tag" not in FORMAT_REGISTRY
    assert "x-divisibleBy" not in KEYWORD_REGISTRY
    df = custom_registry_verdicts(spark, "/root/testdata/sf0.001")
    assert "x-short-tag" not in FORMAT_REGISTRY
    assert "x-divisibleBy" not in KEYWORD_REGISTRY
    rows = df.collect()  # plan executes AFTER unregistration
    assert len(rows) > 0
    assert any(r.passed is False for r in rows)
    assert any(r.passed is True for r in rows)
