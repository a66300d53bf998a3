"""Arbitrary stateful streaming (SURVEY.md §2.9 'absent' row):
`applyInPandasWithState` custom operators.

The reference's only state is the serving table itself — each cron run
re-queries Postgres to decide skip/insert/upsert (converter.py:157-171).
Here that decision lives in OPERATOR STATE: per (recorded_time, param)
key the winning forecast-run version survives across micro-batches in
the checkpoint, so the skip/replace decision needs no store lookup at
all — state is local to the shuffle partition that owns the key.

State stays O(keys × 16 bytes): versions only, never payloads — the
payload rides the output stream; at 56 steady-state keys (BASELINE.md)
or 56 million, the state store holds longs, not rasters.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["latest_version_decisions", "DECISION_SCHEMA", "STATE_SCHEMA"]

#: output: one row per key per micro-batch in which the winner IMPROVED
DECISION_SCHEMA = StructType(
    [
        StructField("recorded_time", TimestampType()),
        StructField("param", IntegerType()),
        StructField("ref_time", TimestampType()),
        StructField("decision", IntegerType()),  # 0 = insert, 1 = replace
    ]
)

#: per-key state: the winning version as epoch microseconds
STATE_SCHEMA = StructType([StructField("best_us", LongType())])


def latest_version_decisions(records: DataFrame) -> DataFrame:
    """Streaming skip/insert/replace decisions, keyed on
    (recorded_time, param), versioned by ref_time — converter.py:160-171
    as a stateful operator.

    Emits a row only when a batch IMPROVES the stored version (insert on
    first sight, replace on a strictly newer ref_time); stale and
    duplicate records emit nothing — which is precisely the reference's
    `sys.exit()` skip path (converter.py:168-171), minus the re-query
    of the serving store.
    """

    def decide(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        recorded_time, param = key
        best = state.get[0] if state.exists else None
        incoming = None
        for pdf in pdfs:
            for t in pd.to_datetime(pdf["ref_time"]):
                us = t.value // 1_000
                if incoming is None or us > incoming:
                    incoming = us
        if incoming is not None and (best is None or incoming > best):
            decision = 0 if best is None else 1
            state.update((incoming,))
            yield pd.DataFrame(
                {
                    "recorded_time": [recorded_time],
                    "param": [param],
                    "ref_time": [pd.Timestamp(incoming * 1_000)],
                    "decision": [decision],
                }
            )

    return (
        records.groupBy("recorded_time", "param")
        .applyInPandasWithState(
            decide,
            outputStructType=DECISION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
