"""Event sessionization: gap-based session windows over a keyed event
stream (the classic web-analytics operator; the reference has no
analogue — LLM-pipeline/analytics family).

Spark-first shape: the native ``F.session_window`` aggregation — the
SAME expression runs in batch and in Structured Streaming (with a
watermark), and the plan is one hash exchange on the user key followed
by the session-merge aggregation.

The merge/eviction boundary the SQL oracle replays is Spark's
DOCUMENTED contract, not just observed behavior (round-6 doc fix):

- Session merge — the Structured Streaming guide ("Types of time
  windows": session windows) defines a session as starting an input
  and extending it "if a subsequent input is received within the gap
  duration from its latest input"; per-event windows ``[ts, ts+gap]``
  that overlap or touch merge. Hence an event extends the session iff
  its delta to the previous event is <= gap — only a delta STRICTLY
  GREATER than the gap opens a new session. (Verified against Spark
  4.1: ``sql/core/.../UpdatingSessionsIterator`` merges on
  ``sessionStart <= currentEnd``.)
- Watermark eviction — the guide's "Handling Late Data and
  Watermarking" + "Semantic Guarantees of Aggregation with
  Watermarking" section: the engine guarantees a window is dropped
  only AFTER the watermark (max event time seen in PREVIOUS batches
  minus the delay) passes its end; state eviction happens at the end
  of the micro-batch in which that becomes true. The late-data oracle
  in queries.py replays exactly that batch-boundary rule.

The hand-computed pytest fixtures pin the boundary cases so a Spark
behavior change would fail the suite loudly rather than silently
re-blessing new output.
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
