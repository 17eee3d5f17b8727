"""Stateful streaming exact-dedup: emit each key's FIRST occurrence
across micro-batches.

The batch engine's exact dedup (operators/dedup.py) is a groupBy; under
Structured Streaming "have I seen this key before" needs a state store.
``applyInPandasWithState`` keeps one small record per key (count +
first-seen wall clock), with a processing-time timeout bounding the
store — the state is O(distinct keys within TTL), independent of stream
volume. This is the custom-stateful-operator pattern the north rule's
architecture calls for beyond watermarked window aggs.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def first_seen(
    stream: DataFrame,
    key_col: str,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """One output row per key the FIRST time it is seen: (key,
    n_first_batch) where n_first_batch counts occurrences in the
    micro-batch that introduced the key. Re-occurrences in later
    batches emit nothing but keep the state's count current.

    ``ttl_minutes`` enables a processing-time timeout: a key idle that
    long is dropped from the store and may be emitted again — the
    bounded-store trade-off for unbounded key spaces. Leave None
    (NoTimeout) when the key space fits the store, or when driving the
    query with ``processAllAvailable`` in tests: a pending
    processing-time timeout keeps scheduling wake-up triggers, so
    processAllAvailable never settles.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_field = stream.schema[key_col]
    out_type = T.StructType(
        [key_field, T.StructField("n_first_batch", T.LongType())]
    )
    state_type = T.StructType([T.StructField("seen", T.LongType())])
    ttl_ms = ttl_minutes * 60 * 1000 if ttl_minutes else None

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            (seen,) = state.get
            state.update((seen + n,))
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return
        state.update((n,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({key_col: [key[0]], "n_first_batch": [n]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_type,
            stateStructType=state_type,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
