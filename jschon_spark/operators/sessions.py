"""Event sessionization: gap-based session windows over a keyed event
stream (the classic web-analytics operator; the reference has no
analogue — LLM-pipeline/analytics family).

Spark-first shape: the native ``F.session_window`` aggregation — the
SAME expression runs in batch and in Structured Streaming (with a
watermark), and the plan is one hash exchange on the user key followed
by the session-merge aggregation. Spark's semantics (measured, Spark
4.1): per-event windows ``[ts, ts + gap]`` merge when they OVERLAP OR
TOUCH, so an event extends the session iff its delta to the previous
event is <= gap — only a delta STRICTLY GREATER than the gap opens a
new session. The SQL oracle replays that boundary with
gaps-and-islands window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-(user, session) rollup via native session windows.

    Output: ``user_id, session_start_us (epoch micros of the first
    event), n_events, span_us (last - first event), total_value``
    (sum of ``value`` when present). Epoch-micro bigints rather than
    timestamps so cross-engine comparison is exact.
    """
    def _us(c):
        # parquet timestamps load as TIMESTAMP_NTZ; the session pins
        # UTC, so the NTZ->TZ cast is value-preserving and unix_micros
        # matches DuckDB's naive epoch_us exactly
        return F.unix_micros(c.cast("timestamp"))

    aggs = [
        F.count("*").alias("n_events"),
        (_us(F.max(ts_col)) - _us(F.min(ts_col))).alias("span_us"),
    ]
    if "value" in events.columns:
        aggs.append(F.sum("value").alias("total_value"))
    out_cols = ["n_events", "span_us"]
    if "value" in events.columns:
        out_cols.append("total_value")
    return (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(*aggs)
        .select(
            F.col(user_col),
            _us(F.col("session_window.start")).alias("session_start_us"),
            *out_cols,
        )
    )
