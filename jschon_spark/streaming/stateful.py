"""Custom stateful streaming operator: per-key running violation monitor.

Tracks, per key (e.g. url domain), the running document/violation
counts across micro-batches with ``applyInPandasWithState`` and emits
an updated row whenever the key's failure ratio crosses a threshold —
the streaming analogue of the per-partition verdict rollup, but with
*cumulative* state rather than per-window aggregates.

State is one small tuple per key (3 longs), so the state store stays
O(distinct keys) regardless of document volume. Batches arrive as
pandas frames (Arrow), so the per-batch work is vectorized.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key string, n_docs bigint, n_failed bigint, fail_ratio double, alert boolean"
)
STATE_SCHEMA = "n_docs bigint, n_failed bigint"


def _monitor(threshold: float):
    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n_docs, n_failed = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_docs += len(pdf)
            n_failed += int((~pdf["passed"].fillna(True)).sum())
        state.update((n_docs, n_failed))
        ratio = (n_failed / n_docs) if n_docs else 0.0
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_docs": [n_docs],
                "n_failed": [n_failed],
                "fail_ratio": [ratio],
                "alert": [ratio > threshold],
            }
        )

    return fn


def violation_monitor(
    validated: DataFrame,
    key_col: str = "url",
    key_expr=None,
    threshold: float = 0.5,
) -> DataFrame:
    """Cumulative per-key verdict monitor over a validated stream.

    ``key_expr`` defaults to the url's host (per-domain monitoring).
    Output mode must be ``update``.
    """
    key = key_expr if key_expr is not None else F.parse_url(F.col(key_col), F.lit("HOST"))
    keyed = validated.select(
        F.coalesce(key, F.lit("<null>")).alias("key"), F.col("passed")
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _monitor(threshold),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
