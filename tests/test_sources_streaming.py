"""Source & streaming coverage: the GRIB decode UDTF plumbing (X1),
watermarked streaming window aggregation (T2/T4), and property-based
verification of the discovery calendar arithmetic (SURVEY.md §5
strategy #3 — the class of bug at converter.py:204, a hand-rolled
`year % 4` leap test, cannot survive this)."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mints_wind_data_ingestion_spark.operators.discovery import (
    MAX_ATTEMPTS,
    OBS_BUCKET_HOURS,
    RUN_CYCLE_HOURS,
    candidates,
)
from mints_wind_data_ingestion_spark.sources.grib import fake_decoder, read_grib_dir
from mints_wind_data_ingestion_spark.sources.wind_json import to_wind_table
from mints_wind_data_ingestion_spark.streaming.pipeline import stream_windowed_counts


def test_grib_binaryfile_decode(spark, tmp_path):
    """X1: binaryFile scan → Arrow-batched decode UDTF, one file in,
    many records out, schema-checked."""
    for i, body in enumerate((b"grib-one", b"grib-two-longer")):
        (tmp_path / f"f{i}.grb2").write_bytes(body)
    decoded = read_grib_dir(spark, str(tmp_path), decoder=fake_decoder(nx=4, ny=3))
    rows = decoded.collect()
    assert len(rows) == 4  # 2 files × (U, V)
    by_key = {(os.path.basename(r.source_path), r.header.parameterNumber): r for r in rows}
    assert set(k[1] for k in by_key) == {2, 3}
    r = by_key[("f0.grb2", 2)]
    assert r.header.numberPoints == 12 and len(r.data) == 12
    # deterministic fake: value = (sum(bytes) % 97 + param*10 + i) % 100
    seed = sum(b"grib-one") % 97
    assert r.data[0] == float((seed + 20) % 100)
    # downstream normalization works on decoded output unchanged
    tbl = to_wind_table(decoded.drop("source_path"))
    assert {x.param for x in tbl.collect()} == {2, 3}


def test_streaming_windowed_counts(spark, tmp_path, sf_dir):
    """T2/T4: watermarked tumbling-window aggregate over a file stream
    equals the same aggregate computed in batch (availableNow drains
    the backlog in one trigger)."""
    from mints_wind_data_ingestion_spark.sources.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"].limit(2000)
    src = str(tmp_path / "events_stream")
    ev.write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    agg = stream_windowed_counts(stream, window="6 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r.w_start), r.event_type): (r.event_cnt, r.value_sum)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expect_df = stream_windowed_counts(spark.read.parquet(src))
    expect = {
        (str(r.w_start), r.event_type): (r.event_cnt, r.value_sum)
        for r in expect_df.collect()
    }
    assert got == expect and len(got) > 0


def _expected_candidates(now: dt.datetime) -> list[tuple[str, str, int]]:
    """Pure-python model of the discovery schedule: 6 h run cycles
    backwards from now, 3 h observation bucket, offset = obs − run."""
    epoch = int(now.replace(tzinfo=dt.timezone.utc).timestamp())
    run0 = epoch // (RUN_CYCLE_HOURS * 3600) * (RUN_CYCLE_HOURS * 3600)
    obs = epoch // (OBS_BUCKET_HOURS * 3600) * (OBS_BUCKET_HOURS * 3600)
    out = []
    for i in range(MAX_ATTEMPTS):
        run = run0 - i * RUN_CYCLE_HOURS * 3600
        rts = dt.datetime.fromtimestamp(run, dt.timezone.utc)
        out.append(
            (
                rts.strftime("%Y-%m-%d %H:%M:%S"),
                dt.datetime.fromtimestamp(obs, dt.timezone.utc).strftime(
                    "%Y-%m-%d %H:%M:%S"
                ),
                (obs - run) // 3600,
            )
        )
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.datetimes(
        min_value=dt.datetime(1999, 12, 28),
        max_value=dt.datetime(2101, 1, 3),
    ).map(lambda d: d.replace(microsecond=0))
)
def test_discovery_calendar_property(shared_spark, now):
    """Calendar arithmetic property: for ARBITRARY datetimes (century
    leap years included) the declarative candidate schedule equals the
    pure-python epoch model. Subsumes the reference's hand-rolled
    rollback (converter.py:185-227) and kills its `year % 4` bug class."""
    got = [
        (str(r.run_ts), str(r.obs_ts), r.forecast_hours)
        for r in candidates(shared_spark, now.strftime("%Y-%m-%d %H:%M:%S"))
        .orderBy("rank")
        .collect()
    ]
    assert got == _expected_candidates(now)


@pytest.fixture(scope="module")
def shared_spark(spark):
    return spark


def test_discovery_century_edges(spark):
    """Fixed edge pins (besides the property): 2000 IS a leap year,
    2100 is NOT."""
    c2000 = candidates(spark, "2000-03-01 02:00:00", attempts=5).collect()
    assert any(str(r.run_ts).startswith("2000-02-29") for r in c2000)
    c2100 = candidates(spark, "2100-03-01 02:00:00", attempts=5).collect()
    runs = [str(r.run_ts) for r in c2100]
    assert not any(t.startswith("2100-02-29") for t in runs)
    assert any(t.startswith("2100-02-28") for t in runs)


def test_stateful_latest_version_decisions(spark, tmp_path):
    """applyInPandasWithState: per-key winning version lives in
    CHECKPOINTED operator state across restarts — batch 2's newer U
    run emits `replace`, its stale V emits nothing, all without any
    store lookup (the reference re-queried Postgres per run)."""
    import json

    from mints_wind_data_ingestion_spark.schemas import WIND_RECORD
    from mints_wind_data_ingestion_spark.sources.wind_json import to_wind_table
    from mints_wind_data_ingestion_spark.streaming.stateful import (
        latest_version_decisions,
    )
    from tests.test_wind_pipeline import U1, V1, _record, _write_batch

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "decisions")

    def run_once(run_tag: str):
        raw = (
            spark.readStream.schema(WIND_RECORD)
            .option("multiLine", "true")
            .json(str(landing))
        )
        decisions = latest_version_decisions(
            to_wind_table(raw).select("recorded_time", "param", "ref_time")
        )

        def sink(batch, epoch_id):
            import pyspark.sql.functions as SF

            batch.withColumn("run_tag", SF.lit(run_tag)).write.mode(
                "append"
            ).parquet(out)

        q = (
            decisions.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [
            (r.param, r.decision, str(r.ref_time))
            for r in spark.read.parquet(out)
            .filter(F.col("run_tag") == run_tag)
            .collect()
        ]

    _write_batch(
        str(landing / "b1.json"),
        [
            _record(2, "2020-08-12 12:00:00+00", "2020-08-12T06:00:00.000Z", U1),
            _record(3, "2020-08-12 12:00:00+00", "2020-08-12T06:00:00.000Z", V1),
        ],
    )
    first = run_once("dec_run1")
    assert sorted((p, d) for p, d, _ in first) == [(2, 0), (3, 0)]  # inserts

    _write_batch(
        str(landing / "b2.json"),
        [
            # newer U run → replace; stale V run → silence
            _record(2, "2020-08-12 12:00:00+00", "2020-08-12T12:00:00.000Z", U1),
            _record(3, "2020-08-12 12:00:00+00", "2020-08-12T00:00:00.000Z", V1),
        ],
    )
    # fresh query, same checkpoint: state carries across the restart
    second = run_once("dec_run2")
    assert [(p, d) for p, d, _ in second] == [(2, 1)]  # one replace, V silent
