"""Physical-plan audits: the scale properties the operators promise.

These assert plan *shape*, not timing: broadcast for small dims, column
pruning at the parquet scan, no Exchange in the row-local keyword pass,
map-side partial aggregation for the rollups.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from jschon_spark.engine import ConstraintEngine
from jschon_spark.operators import referential, uniqueness
from jschon_spark.pipeline import PAGE_DOC_COLS, PAGE_SCHEMA
from jschon_spark.sources.webpages import generate_webpages, lang_dim


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "pages")
    generate_webpages(spark, 5000).write.parquet(path)
    return path


def test_validation_pass_has_no_shuffle(spark, pages_path):
    docs = spark.read.parquet(pages_path)
    compiled = ConstraintEngine(assert_formats=True).compile(PAGE_SCHEMA)
    out = compiled.apply_typed(docs, PAGE_DOC_COLS).select("url", "passed")
    plan = plan_of(out)
    assert "Exchange" not in plan, plan
    assert "codegen id" in plan, plan  # whole-stage codegen fused the pass
    # no Python in the hot path: the whole keyword pass is JVM-side
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_validation_prunes_unused_columns(spark, pages_path):
    docs = spark.read.parquet(pages_path)
    compiled = ConstraintEngine(assert_formats=True).compile(PAGE_SCHEMA)
    out = compiled.apply_typed(docs, PAGE_DOC_COLS).select("url", "passed")
    plan = plan_of(out)
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan, plan
    # html:binary is never referenced -> must not be read from parquet
    assert "html" not in scan[0], scan[0]


def test_referential_check_broadcasts_dimension(spark, pages_path):
    docs = spark.read.parquet(pages_path)
    viol = referential.referential_violations(
        docs, lang_dim(spark), "lang", "lang_code", select=["url", "lang"]
    )
    plan = plan_of(viol)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the fact side is scanned once with only (url, lang) read
    scan = [l for l in plan.splitlines() if "ReadSchema" in l and "lang_code" not in l]
    assert scan and "html" not in scan[0] and "text" not in scan[0], plan


def test_rollup_uses_partial_aggregation(spark, pages_path):
    docs = spark.read.parquet(pages_path)
    dup = uniqueness.duplicate_keys(docs, "url")
    plan = plan_of(dup, "simple")
    # two HashAggregates around one Exchange = map-side combine
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.count("Exchange") == 1, plan


def test_filter_pushdown_reaches_scan(spark, pages_path):
    docs = spark.read.parquet(pages_path)
    q = docs.filter(F.col("lang") == "en").select("url")
    plan = plan_of(q)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "lang" in pushed[0], plan


def test_drift_scores_plan_shape(spark, pages_path):
    """drift_scores: the only full-input scans are the two histogram
    groupBys (map-side combined); the bins grid and the global
    distribution join as broadcasts; no cartesian of the input."""
    from jschon_spark.operators import drift

    docs = spark.read.parquet(pages_path).withColumn(
        "day", F.date_format("warc_ts", "yyyy-MM-dd")
    ).withColumn("text_len", F.length("text").cast("double"))
    out = drift.drift_scores(docs, "text_len", "day", 0.0, 2000.0, 20)
    plan = plan_of(out)
    assert plan.count("BroadcastExchange") >= 2, plan
    # histograms partial-aggregate before their shuffles
    assert plan.count("HashAggregate") >= 4, plan
    # the histogram is persisted: after execution every branch reads the
    # cached ≤ partitions×bins relation, so the INPUT is scanned once
    out.collect()
    executed = out._jdf.queryExecution().executedPlan().toString()
    assert (
        "InMemoryTableScan" in executed or "TableCacheQueryStage" in executed
    ), executed


def test_checkpoint_day_job_prunes_partitions(spark, tmp_path):
    """validate_corpus_checkpointed's per-day filter must reach the scan:
    PartitionFilters on a day-partitioned table, PushedFilters (warc_ts
    range) on an unpartitioned one."""
    from jschon_spark.pipeline import PAGE_SCHEMA

    pages = generate_webpages(spark, 2000).withColumn(
        "day", F.date_format("warc_ts", "yyyy-MM-dd")
    )
    part_path = str(tmp_path / "by_day")
    pages.write.partitionBy("day").parquet(part_path)
    flat_path = str(tmp_path / "flat")
    pages.drop("day").write.parquet(flat_path)

    a_day = pages.select("day").first()["day"]
    compiled = ConstraintEngine(assert_formats=True).compile(PAGE_SCHEMA)

    # partitioned table: physical column filter -> PartitionFilters
    docs = spark.read.parquet(part_path)
    out = compiled.apply_typed(
        docs.filter(F.col("day") == a_day), PAGE_DOC_COLS
    ).select("url", "passed")
    plan = plan_of(out)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any(a_day in l for l in pf), plan

    # unpartitioned table: warc_ts range must be in PushedFilters
    start = F.to_timestamp(F.lit(a_day), "yyyy-MM-dd")
    end = F.to_timestamp(F.date_add(F.to_date(F.lit(a_day), "yyyy-MM-dd"), 1))
    flat = spark.read.parquet(flat_path)
    out2 = compiled.apply_typed(
        flat.filter((F.col("warc_ts") >= start) & (F.col("warc_ts") < end)),
        PAGE_DOC_COLS,
    ).select("url", "passed")
    plan2 = plan_of(out2)
    pushed = [l for l in plan2.splitlines() if "PushedFilters" in l]
    assert pushed and any("warc_ts" in l for l in pushed), plan2


def test_prefiltered_dup_plan_shape(spark, pages_path):
    """Hash-prefilter: phase-1 exchange carries only the 8-byte hash
    (map-side combine), candidates broadcast back onto the scan."""
    from jschon_spark.operators import uniqueness

    docs = spark.read.parquet(pages_path)
    out = uniqueness.duplicate_keys_prefiltered(docs, "url")
    plan = plan_of(out)
    # the candidate join is a broadcast, not a shuffle of url strings
    assert "BroadcastExchange" in plan, plan
    # phase 1's exchange partitions by the 8-byte hash, not the key
    hash_parts = [
        l for l in plan.splitlines()
        if "hashpartitioning" in l and "__h" in l
    ]
    assert hash_parts, plan
    # two-phase shape: partial agg below each exchange
    assert plan.count("HashAggregate") >= 4, plan


def test_prefiltered_dup_no_forced_broadcast_above_threshold(spark, pages_path):
    """Above ``broadcast_max_candidates`` the candidate join must NOT
    carry a forced broadcast hint — the one data-shape-triggered OOM
    left in the flagship pass (VERDICT r3 #1). AQE may still convert
    at runtime from measured sizes; what's forbidden is forcing it
    from an unmeasured assumption."""
    from jschon_spark.operators import uniqueness

    docs = spark.read.parquet(pages_path)
    # turn off statistics-based broadcast so any BroadcastExchange left
    # in the plan can only come from a forced hint
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = uniqueness.duplicate_keys_prefiltered(
            docs, "url", broadcast_max_candidates=0
        )
        assert "BroadcastExchange" not in plan_of(out), plan_of(out)
        # the explicit False override takes the same unhinted path
        # without running the measuring action
        out2 = uniqueness.duplicate_keys_prefiltered(
            docs, "url", broadcast_candidates=False
        )
        assert "BroadcastExchange" not in plan_of(out2), plan_of(out2)
        # and under the bound the hint IS applied (threshold still -1,
        # so its presence proves the gate, not the statistics)
        out3 = uniqueness.duplicate_keys_prefiltered(docs, "url")
        assert "BroadcastExchange" in plan_of(out3), plan_of(out3)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_emb_near_dup_candidate_join_moves_only_ids(spark, tmp_path):
    """Multi-table LSH: the candidate self-join's exchanges carry
    (id, tbl, bucket) — never the vectors."""
    import numpy as np
    from jschon_spark.operators import similarity

    rng = np.random.RandomState(7)
    rows = [(int(i), [float(x) for x in rng.randn(16)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "emb")
    emb.write.parquet(path)
    df = spark.read.parquet(path)
    out = similarity.embedding_near_duplicates(
        df, dim=16, n_planes=4, n_tables=3, min_cos=0.9
    )
    plan = plan_of(out)
    for seg in plan.split("Exchange hashpartitioning")[1:]:
        head = seg[:150]
        assert "embedding" not in head and "__va" not in head, head


def test_ivf_seeded_broadcasts_probes(spark, tmp_path):
    """IVF: the corpus side never shuffles — probes broadcast onto the
    assigned scan."""
    import numpy as np
    from jschon_spark.operators.similarity import ivf_topk_seeded

    rng = np.random.RandomState(9)
    rows = [(int(i), [float(x) for x in rng.randn(16)]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "emb2")
    emb.write.parquet(path)
    df = spark.read.parquet(path)
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk_seeded(df, queries, dim=16, k=3, n_lists=8, n_probe=2)
    plan = plan_of(out)
    assert "BroadcastExchange" in plan, plan
    # the only hash exchange allowed is the top-k window by query_id
    # (tiny candidate set), never a corpus-wide vector shuffle.
    # NOTE: inline exchange args only print in "simple" mode — the
    # formatted-mode split matched nothing and passed vacuously.
    simple = plan_of(out, "simple")
    segs = simple.split("Exchange hashpartitioning")[1:]
    assert segs, simple
    assert all("query_id" in s[:120] for s in segs), simple


def test_dedup_representatives_anti_join_not_forced_broadcast(spark):
    """VERDICT r2 #1: the loser relation is every non-representative dup
    id (billions at crawl scale) — it must NOT carry a broadcast hint.
    With auto-broadcast disabled, a forced hint would still produce a
    BroadcastHashJoin; the default must fall back to a shuffled anti-
    join, and the explicit opt-in must still broadcast."""
    from jschon_spark.operators import dedup

    docs = spark.range(1000).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = dedup.dedup_representatives(docs, pairs, "doc_id")
        plan = plan_of(out)
        assert "LeftAnti" in plan, plan
        assert "BroadcastHashJoin" not in plan, plan
        forced = dedup.dedup_representatives(
            docs, pairs, "doc_id", broadcast_losers=True
        )
        assert "BroadcastHashJoin" in plan_of(forced)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_fan_out_estimates_splits_from_bytes(spark, tmp_path):
    """One LARGE splittable file must not read as '1 partition' and
    trigger a pointless full repartition (ADVICE r2): split count is
    total bytes / maxPartitionBytes."""
    from jschon_spark.operators import _partitions

    assert _partitions._parse_bytes("134217728b") == 134217728
    assert _partitions._parse_bytes("128m") == 128 * 1024**2
    assert _partitions._parse_bytes("1g") == 1024**3

    path = str(tmp_path / "one_big_file")
    spark.range(200_000).selectExpr(
        "id", "repeat(uuid(), 4) AS pad"
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try:
        est = _partitions.estimated_scan_splits(df)
        assert est is not None and est >= 8, est
        # >= cores worth of splits -> fan_out is a no-op (same plan object)
        assert _partitions.fan_out(df) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    # non-file plan: unknown split count -> never repartition
    rng = spark.range(10)
    assert _partitions.fan_out(rng) is rng


def test_pattern_props_plan_is_jvm_only(spark):
    """Round 4: schema-valued patternProperties + compound const lower
    onto map<string,variant> HOFs — the plan must contain no Python
    stage."""
    from jschon_spark.engine import ConstraintEngine
    from jschon_spark.queries import PATTERN_PROPS_SCHEMA

    df = spark.createDataFrame(
        [('{"k_click": 12.5, "tag": "click", "meta": {"v": 1}}',),
         ('{"x_view": 3, "tag": "view", "meta": {"v": 1}}',),
         (None,)],
        "j string",
    )
    out = ConstraintEngine().compile(PATTERN_PROPS_SCHEMA).apply_json(df, "j")
    plan = plan_of(out)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    rows = {r.j: r.passed for r in out.collect()}
    assert rows['{"k_click": 12.5, "tag": "click", "meta": {"v": 1}}'] is True
    assert rows['{"x_view": 3, "tag": "view", "meta": {"v": 1}}'] is False


def test_dynref_plan_is_jvm_only(spark):
    """Round 5: statically-resolvable $dynamicRef (single anchor owner
    / plain-$anchor fragment) lowers inline like $ref — the plan must
    contain no Python stage."""
    from jschon_spark.engine import ConstraintEngine
    from jschon_spark.queries import DYNREF_SCHEMA

    df = spark.createDataFrame(
        [('{"k": 42, "tag": "click"}',),
         ('{"k": 42.5, "tag": "click"}',),
         ('{"k": 42, "tag": "CLICK"}',),
         ('{"k": 99, "tag": "click"}',),
         (None,)],
        "j string",
    )
    out = ConstraintEngine().compile(DYNREF_SCHEMA).apply_json(df, "j")
    plan = plan_of(out)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    rows = {r.j: r.passed for r in out.collect()}
    assert rows['{"k": 42, "tag": "click"}'] is True
    assert rows['{"k": 42.5, "tag": "click"}'] is False
    assert rows['{"k": 42, "tag": "CLICK"}'] is False
    assert rows['{"k": 99, "tag": "click"}'] is False


def test_array_schema_plan_is_jvm_only(spark):
    """Round 3: dynamic-JSON ARRAY keywords lower onto array<variant>
    higher-order functions — the plan must contain no Python stage."""
    from jschon_spark.engine import ConstraintEngine
    from jschon_spark.queries import ARRAY_PROPS_SCHEMA

    df = spark.createDataFrame(
        [('{"vals": [1, 2]}',), ('{"vals": [1, "x"]}',), (None,)],
        "j string",
    )
    out = ConstraintEngine().compile(ARRAY_PROPS_SCHEMA).apply_json(df, "j")
    plan = plan_of(out)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    got = {r.j: r.passed for r in out.collect()}
    assert got['{"vals": [1, 2]}'] is True
    assert got['{"vals": [1, "x"]}'] is False


def test_quantiles_scale_path_single_scan_partial_agg(spark, pages_path):
    """numeric_quantiles(exact=False) — the 100 TB path: ONE scan of
    the input feeding a partial/final aggregate pair (the GK sketches
    merge map-side), never a per-column rescan or a global sort."""
    from jschon_spark.operators import stats

    docs = spark.read.parquet(pages_path).select(
        F.length("text").alias("n_chars"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    q = stats.numeric_quantiles(docs, ["n_chars", "n_tokens"], exact=False)
    plan = plan_of(q, "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert "Sort" not in plan, plan
    # partial + final aggregate around one single-partition exchange
    assert plan.count("Aggregate") >= 2, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_windowed_rollup_partial_aggregation(spark, pages_path):
    """The streaming window rollup's batch plan: map-side combine
    (two HashAggregates around one Exchange keyed by the window),
    whole-stage codegen, no Python stage — per-window state is O(1)
    in document volume."""
    from jschon_spark.streaming.validate import windowed_verdicts

    docs = spark.read.parquet(pages_path)
    compiled = ConstraintEngine().compile(PAGE_SCHEMA)
    validated = compiled.apply_typed(docs, PAGE_DOC_COLS)
    out = windowed_verdicts(validated, ts_col="warc_ts", window="1 hour")
    plan = plan_of(out, "simple")
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.count("Exchange") == 1, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_contamination_plan_broadcasts_bench(spark, pages_path):
    """The benchmark gram-hash set must broadcast (eval sets are MBs vs
    a 100 TB corpus) and the corpus side must reach the join without a
    shuffle: the only Exchange in the plan is the post-join groupBy of
    MATCHED rows (plus the broadcast exchange itself)."""
    from jschon_spark.operators import decontam

    docs = spark.read.parquet(pages_path).select(
        F.col("url").alias("doc_id"), F.col("text")
    )
    bench = docs.limit(20)
    rep = decontam.contamination_report(docs, bench, n=4)
    plan = plan_of(rep)
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftSemi" in plan, plan
    # corpus side: scan -> generate(explode) -> project -> join with no
    # Exchange in between (shuffle exchanges appear only after the join
    # for the matched-row groupBy)
    pre_join = plan.split("BroadcastHashJoin")[0]
    n_shuffle = pre_join.count("Exchange hashpartitioning")
    assert n_shuffle == 0, plan


def test_webtext_row_local_ops_have_no_exchange(spark):
    """c4_clean / stratified_sample / url_features are scan->project
    contracts: ANY exchange in their plans is a defect at 100 TB."""
    from jschon_spark.operators import webtext

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w x y z q."), F.lit("\n"), F.lit("b")).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("https://e.org/"), F.col("id").cast("string")).alias("url"),
    )
    for df in (
        webtext.c4_clean(docs),
        webtext.stratified_sample(docs, rates={"en": 0.5}),
        webtext.url_features(docs),
    ):
        plan = plan_of(df)
        assert "Exchange" not in plan, plan


def test_webtext_keyed_ops_single_hash_exchange(spark):
    """per_key_cap and pack_token_bins need exactly the exchanges
    their semantics require: one hash exchange on the grouping key
    (pack adds the partial->final agg exchange on (stratum, bin))."""
    from jschon_spark.operators import webtext

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d e").alias("text"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") % 7).cast("string").alias("source"),
        (F.col("id") % 100).alias("n_chars"),
    )
    cap_plan = plan_of(webtext.per_key_cap(docs, k=3), "simple")
    assert cap_plan.count("Exchange hashpartitioning") == 1, cap_plan
    assert "source" in cap_plan.split("Exchange hashpartitioning")[1][:80]
    pack_df = webtext.pack_token_bins(docs, budget=64)
    pack_plan = plan_of(pack_df, "simple")
    # round 6 (two-phase prefix sum) initial plan: range agg on lang,
    # the (lang,__bkt) window exchange TWICE pre-AQE (the local-cumsum
    # branch and the subtotal branch — AQE collapses them to one
    # ReusedExchange at runtime, asserted below), tiny offsets window
    # on lang, final (lang,bin) agg; everything else is a broadcast
    assert pack_plan.count("Exchange hashpartitioning") <= 6, pack_plan
    pack_df.collect()
    final = plan_of(pack_df, "simple")
    assert "ReusedExchange" in final or "reused exchange" in final.lower(), final


def test_pack_token_bins_no_single_task_stratum_window(spark):
    """Round-6 scale audit: the cumsum window over the RAW token rows
    must partition by (stratum, bucket) — a window partitioned by the
    low-cardinality stratum alone puts tens of TB into one task's sort
    at 100 TB. Only the tiny bucket-offset window (over <= n_buckets
    aggregated __bt subtotal rows) may key on the stratum alone."""
    from jschon_spark.operators import webtext

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d e").alias("text"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )
    plan = plan_of(webtext.pack_token_bins(docs, budget=64), "simple")
    saw_raw = saw_off = False
    for line in plan.splitlines():
        if "windowspecdefinition" not in line:
            continue
        spec = line.split("windowspecdefinition")[1]
        if "doc_id" in spec:  # raw-row cumsum window, ordered by id
            assert spec.index("__bkt") < spec.index("doc_id"), line
            saw_raw = True
        else:  # offsets window: consumes only the __bt subtotals
            assert "sum(__bt" in line, line
            saw_off = True
    assert saw_raw and saw_off, plan


def test_line_dedup_frequent_set_broadcasts_and_ships_hashes(spark, tmp_path):
    """The anti-join side (frequent-line hashes) is tiny by Zipf: with
    AQE it must arrive as a BroadcastHashJoin LeftAnti, and the
    frequency aggregation must group on the 16-byte md5, never the raw
    line text."""
    from jschon_spark.operators import webtext

    path = str(tmp_path / "docs")
    spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique "), F.col("id").cast("string"),
                 F.lit("\nBOILERPLATE")).alias("text"),
    ).write.parquet(path)
    out = webtext.line_dedup(spark.read.parquet(path), min_docs=100)
    out.collect()  # AQE: final plan only exists after execution
    plan = plan_of(out)
    # mark-then-aggregate shape: the tiny frequent set arrives as a
    # broadcast LEFT join marker (one aggregation rebuilds the docs)
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftOuter" in plan, plan
    # the frequency agg keys on md5(line)
    assert "md5" in plan, plan


def test_sessionize_single_exchange_on_user(spark):
    from jschon_spark.operators import sessions

    ev = spark.range(300).select(
        (F.col("id") % 20).alias("user_id"),
        F.timestamp_micros(F.col("id") * 60_000_000).alias("ts"),
        F.lit(1.0).alias("value"),
    )
    plan = plan_of(sessions.sessionize(ev), "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "user_id" in plan.split("Exchange hashpartitioning")[1][:80]


def test_ngram_span_single_scan_linear_chain(spark, tmp_path):
    """ngram_span_duplicates must be ONE straight chain: the corpus is
    scanned and tokenized exactly once (the fence is non-deterministic,
    so a branch-and-rejoin shape would re-tokenize per branch), with
    exactly the three exchanges the semantics require — (doc, hash)
    pair agg, the window on the hash, the doc rollup — and no Python
    stage."""
    from jschon_spark.operators import dedup

    path = str(tmp_path / "docs")
    spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon zeta "),
                 (F.col("id") % 9).cast("string")).alias("text"),
    ).write.parquet(path)
    out = dedup.ngram_span_duplicates(spark.read.parquet(path))
    plan = plan_of(out, "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 3, plan
    assert plan.count("Window") == 1, plan
    # tokenization happens once: exactly two fenced projections
    # (token array + gram array), each mentioning `split` once
    assert plan.count("split(regexp_replace") == 1, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    # map-side combine on both aggregations
    assert plan.count("HashAggregate") >= 4, plan


def test_semantic_dedup_plan_shape(spark, tmp_path):
    """semantic_dedup: the representative window must run over the
    members-only relation (a corpus-wide window would put every
    non-duplicate into one NULL-group partition); no Python stage; the
    small reps/groups joins convert to broadcast at runtime under AQE."""
    from jschon_spark.operators import similarity

    path = str(tmp_path / "emb")
    spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % 7 + i).cast("double") for i in range(8)]
                ).alias("embedding"),
    ).write.parquet(path)
    out = similarity.semantic_dedup(
        spark.read.parquet(path), dim=8, threshold=0.999, n_lists=4
    )
    plan = plan_of(out, "simple")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    # exactly ONE window — the keep rank over __g on the members side
    assert plan.count("Window") == 1, plan
    assert "__g" in plan.split("Window")[1][:200], plan
    out.collect()
    executed = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed, executed
    assert "EvalPython" not in executed, executed


def test_incremental_dedup_only_hashes_shuffle(spark, tmp_path):
    """dedup_against_corpus (exact path): both sides reduce to md5
    hashes BEFORE any exchange — history documents never move. Every
    hash-partitioned exchange in the plan is keyed on the 32-char hash
    or the batch id; the text column crosses no exchange."""
    from jschon_spark.operators import dedup

    path = str(tmp_path / "docs")
    spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body number "),
                 (F.col("id") % 500).cast("string")).alias("text"),
    ).write.parquet(path)
    docs = spark.read.parquet(path)
    out = dedup.dedup_against_corpus(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
    ).select("doc_id", "is_exact_dup")
    plan = plan_of(out, "simple")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line
