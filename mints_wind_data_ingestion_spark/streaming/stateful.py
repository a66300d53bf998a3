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

__all__ = ["latest_version_decisions", "streaming_ewma",
           "DECISION_SCHEMA", "STATE_SCHEMA", "EWMA_SCHEMA", "EWMA_STATE"]

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


#: streaming-EWMA output: one row per event, the recurrence value
EWMA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ewma_e6", LongType()),
    ]
)

#: per-key state: the running accumulator (IEEE bits, exact) + last order
EWMA_STATE = StructType(
    [StructField("acc_bits", LongType()), StructField("last_order", LongType())]
)


def streaming_ewma(events: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Per-user EWMA as a STATEFUL STREAMING operator: the recurrence
    acc' = α·x + (1−α)·acc continues across micro-batches — the state
    is one float per user (stored as raw IEEE-754 bits in a long so the
    checkpoint round-trip is bit-exact; a double column would survive
    too, but bits make the exactness contract explicit).

    The batch twin is functions.stats.ewma_group; the test pins that
    streaming over N micro-batches equals the batch fold over the
    concatenation EXACTLY (same arithmetic, same e6 quantization) —
    the cross-batch-continuity property that makes incremental feature
    pipelines trustworthy. Late rows (order below the state's
    last_order) are dropped: a recurrence cannot retro-insert without
    replaying, which is the checkpoint's job, not the operator's.
    """
    import math
    import struct

    a = float(alpha)

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            acc_bits, last_order = state.get
            acc = struct.unpack("<d", struct.pack("<q", acc_bits))[0]
        else:
            acc, last_order = math.nan, -(1 << 62)
        rows_id, rows_val = [], []
        # Materialize the whole group before sorting: a micro-batch larger
        # than one Arrow record batch (default 10k rows) arrives as multiple
        # chunks, and per-chunk sorting would misclassify in-order rows in a
        # later chunk as late.  One group's micro-batch worth of rows must
        # fit in memory — the same contract applyInPandasWithState already
        # imposes on its state granularity.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            sub = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            ).sort_values("event_id", kind="stable")
            for eid, x in zip(sub["event_id"], sub["value"]):
                if eid <= last_order:
                    continue  # late/duplicate: replay territory
                acc = float(x) if math.isnan(acc) else a * float(x) + (1.0 - a) * acc
                last_order = int(eid)
                rows_id.append(int(eid))
                rows_val.append(math.floor(acc * 1e6 + 0.5))
        if rows_id:
            state.update(
                (struct.unpack("<q", struct.pack("<d", acc))[0], last_order)
            )
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(rows_id),
                    "event_id": rows_id,
                    "ewma_e6": rows_val,
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=EWMA_SCHEMA,
        stateStructType=EWMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
