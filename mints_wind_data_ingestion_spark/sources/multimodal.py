"""Multimodal binary columns (SURVEY.md §2.11; BASELINE.json north_star).

Images / audio / video ride through the engine as opaque `binary`
payload columns plus a typed metadata struct — exactly the pattern the
reference's wind record already uses (GRIB2 blob → header struct + data
array, SURVEY.md §1.4). This module supplies the Spark-side plumbing:

- `with_payload`: attach a binary payload column (from a `binaryFile`
  scan in production; synthesized from text in tests).
- `extract_meta`: Arrow-batched `mapInPandas` feature extraction — the
  UDTF shape every real decoder (PIL/ffmpeg/librosa) would plug into.
  One partition in → one iterator of pandas batches out; nothing is
  collected to the driver, and the payload column is dropped on output
  so only the (small) metadata survives the shuffle boundary.
- `decode_image` / `decode_audio` / `sample_video_frames`: the real
  decoders. The image/audio libraries are not in this container, so
  these raise NotImplementedError with the intended contract documented;
  `byte_stats_meta` is the deterministic fake used by tests and the
  registry query — same schema, same batch shape, real arithmetic on
  the real bytes.

Scale posture: payloads never expand in memory beyond one Arrow batch
(`spark.sql.execution.arrow.maxRecordsPerBatch` bounds it); the
metadata projection happens executor-side so a 100 TB blob store scans
into a few GB of metadata; decode failures become NULL-metadata rows,
not task failures.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "META_SCHEMA",
    "with_payload",
    "byte_stats_meta",
    "extract_meta",
    "decode_image",
    "decode_audio",
    "sample_video_frames",
]

#: metadata emitted per payload — the shape a real image decoder fills
META_SCHEMA = StructType(
    [
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("checksum", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

_ADLER_MOD = 65521  # adler32 modulus — any fixed modulus works


def with_payload(df: DataFrame, text_col: str = "text", out: str = "payload") -> DataFrame:
    """Synthesize a binary payload from a text column (UTF-8 bytes).

    Production path replaces this with
    ``spark.read.format("binaryFile").load(dir)`` whose `content`
    column is already binary; everything downstream is identical.
    """
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8"))


def byte_stats_meta(payload: bytes) -> tuple[int, int, int, int, int]:
    """Deterministic fake 'decode': metadata derived from raw bytes.

    Stands in for a real header parse; width/height are synthesized
    from the checksum/first byte so tests exercise real per-byte work
    with an exact SQL-expressible oracle.
    """
    n = len(payload)
    first = payload[0] if n else 0
    checksum = sum(payload) % _ADLER_MOD
    return n, first, checksum, 16 + checksum % 32, 16 + first % 32


def extract_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    `mapInPandas` — not a scalar pandas_udf — because real decoders are
    one-row-in/variable-out (corrupt frames dropped, multi-page TIFFs
    exploded); the iterator contract supports that for free.
    """
    out_schema = StructType(
        [df.schema[id_col], *META_SCHEMA.fields]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [byte_stats_meta(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [s[0] for s in stats],
                    "first_byte": [s[1] for s in stats],
                    "checksum": [s[2] for s in stats],
                    "width": [s[3] for s in stats],
                    "height": [s[4] for s in stats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def decode_image(payload: bytes) -> dict:
    """Real image decode (PIL/opencv): not available in this container.

    Contract: returns {"width", "height", "mode", "pixels": ndarray}.
    Plug into `extract_meta`'s iterator in place of `byte_stats_meta`.
    """
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not shipped in this environment; "
        "use byte_stats_meta for the deterministic test path"
    )


def decode_audio(payload: bytes) -> dict:
    """Real audio decode (librosa/soundfile): not available here.

    Contract: returns {"sample_rate", "n_samples", "waveform": ndarray}.
    """
    raise NotImplementedError(
        "audio decoding requires librosa/soundfile, not shipped in this "
        "environment; use byte_stats_meta for the deterministic test path"
    )


def sample_video_frames(payload: bytes, every_n: int = 30) -> list:
    """Real video frame sampling (ffmpeg/pyav): not available here.

    Contract: returns [(frame_index, ndarray), ...] for every Nth frame.
    """
    raise NotImplementedError(
        "video decoding requires ffmpeg/pyav, not shipped in this "
        "environment; use byte_stats_meta for the deterministic test path"
    )
