"""Multimodal column operators: image/audio/video payloads as opaque
binary columns with typed metadata (driver-mandated extension surface).

The decode/feature libraries (PIL, torchaudio, ...) are NOT in this
container, so the modality-specific decode step is a clearly-marked stub
behind `_decode_payload` — a deterministic fake that parses the fixture's
synthetic header.  Everything Spark-side is real and tested: the binary
packing schema, the `mapInPandas` Arrow batch plumbing (batch shape,
iterator contract, output schema), and the partition-preserving pipeline
layout a real decoder would drop into unchanged.

Scale notes (100 TB): binary payloads ride in parquet alongside their
metadata struct — one table, no side-channel files.  `mapInPandas`
streams Arrow batches per partition: memory is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` × payload size, and the
decode stage parallelizes to exactly the scan parallelism.  Frame
sampling / resizing happens inside the same batch iterator, so decoded
frames never materialize globally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from migbq_spark.catalog import load
from migbq_spark.registry import register


def _decode_payload(payload: bytes) -> tuple[int, int]:
    """STUB decode step — deterministic fake.

    A real deployment replaces this body with e.g. PIL.Image.open /
    soundfile.read; the container has no media libraries.  The fake
    "decodes" the fixture payload `b"IMG|<doc_id>|<n_chars>"` into a
    (width, height)-shaped tuple so the downstream plumbing is exercised
    with real values.  Raise NotImplementedError for unknown magic bytes
    exactly as a real decoder would reject a corrupt file."""
    if not payload.startswith(b"IMG|"):
        raise NotImplementedError("unknown payload format (real decoder stub)")
    _, a, b = payload.split(b"|")
    return int(a) % 640 + 1, int(b) % 480 + 1


@register("mm_pack_binary")  # rows-only: binary columns not oracle-hashable
def mm_pack_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack each document into a multimodal record: opaque binary payload
    + typed metadata struct (modality, byte length, source).  This is the
    carrier schema every downstream multimodal op consumes."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode(
        F.concat_ws("|", F.lit("IMG"), F.col("doc_id"), F.col("n_chars")), "utf-8"
    )
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


@register("mm_decode_stub")  # rows-only: decode is a stubbed modality step
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over Arrow batches via mapInPandas.

    The iterator-of-batches contract, output schema, and per-partition
    execution are the real production shape; only `_decode_payload`'s
    body is fake (see its docstring)."""
    packed = mm_pack_binary(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_decode_payload)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "aspect": decoded.map(lambda t: t[0] / t[1]),
                }
            )

    return packed.mapInPandas(
        decode,
        "doc_id bigint, width bigint, height bigint, n_bytes bigint, aspect double",
    )


@register("mm_frame_sample")  # rows-only: frame sampling over stub decode
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame sampling: treat each payload as a pseudo-video
    with n_chars "frames" and emit every k-th frame index (posexplode of
    a generated sequence).  Real video decode plugs into the same shape:
    one input row → few sampled-frame rows, all JVM-side except the
    decode itself."""
    packed = mm_pack_binary(spark, sf_dir)
    n_frames = F.least(F.col("meta.n_bytes"), F.lit(30)).cast("int")
    return packed.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1, F.lit(10))).alias(
            "frame_no", "frame_idx"
        ),
    ).select("doc_id", "frame_no", "frame_idx")


@register(
    "mm_meta_audit",
    oracle="""
    SELECT source,
           COUNT(*) AS n_records,
           CAST(SUM(length(concat_ws('|', 'IMG', CAST(doc_id AS VARCHAR),
                                CAST(n_chars AS VARCHAR)))) AS BIGINT) AS total_bytes,
           MIN(length(concat_ws('|', 'IMG', CAST(doc_id AS VARCHAR),
                                CAST(n_chars AS VARCHAR)))) AS min_bytes,
           MAX(length(concat_ws('|', 'IMG', CAST(doc_id AS VARCHAR),
                                CAST(n_chars AS VARCHAR)))) AS max_bytes
    FROM documents GROUP BY source
    """,
)
def mm_meta_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage audit over the packed multimodal records (mm_pack_binary's
    carrier schema): per source, record count and payload byte totals
    from the typed metadata struct — the blob-store capacity/QA report.
    The binary payloads themselves are not oracle-hashable, but their
    LENGTHS are deterministic functions of the source row, so this
    audit hash-checks the multimodal plumbing end-to-end (schema,
    packing, metadata) without comparing raw bytes.

    Scale (100 TB): runs entirely on the metadata struct — the binary
    column is never read (columnar pruning elides it from the scan);
    one map-side-combinable aggregation."""
    packed = mm_pack_binary(spark, sf_dir)
    return packed.select(
        F.col("meta.source").alias("source"),
        F.col("meta.n_bytes").alias("n_bytes"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )
