"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side design is the real deliverable here: media travels as a
``binary`` payload column next to a typed metadata struct, partition-
parallel transforms run as Arrow-batched ``mapInPandas`` operators, and
the decoded outputs are ordinary columns that downstream relational ops
(joins, dedup, similarity) consume. PME encrypts binary columns like any
other (reference README.md:44 — encryption is after encoding, type-
agnostic), so a RESTRICTED media payload composes with crypto/policy.py.

Actual codec work (JPEG decode, resampling, frame extraction) needs
libraries this container doesn't ship (Pillow/ffmpeg/torchaudio), so the
decoders are STUBS: ``decode=fake`` parses the deterministic synthetic
payload format below (so the full pipeline is testable end-to-end);
``decode=real`` raises NotImplementedError at the exact seam where a
production codec plugs in. Batch shapes, schemas, and partitioning are
real either way.

Synthetic payload format (deterministic, seedless):
    magic b"FAKE" | u8 modality | u32 width | u32 height | u32 n_bytes |
    n_bytes of LCG bytes derived from (doc_id, width, height)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"FAKE"
MODALITIES = {"image": 1, "audio": 2, "video": 3}

MEDIA_SCHEMA = (
    "media_id bigint, modality string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id bigint, modality string, n_bytes int, mean_byte double, "
    "checksum bigint, width int, height int"
)


def _lcg_bytes(seed: int, n: int) -> bytes:
    out = bytearray(n)
    state = (seed * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
    for i in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out[i] = (state >> 33) & 0xFF
    return bytes(out)


def fake_payload(media_id: int, modality: str, width: int, height: int) -> bytes:
    n = max(16, (width * height) % 4096)
    body = _lcg_bytes(media_id * 2654435761 + width * 31 + height, n)
    return MAGIC + struct.pack("<BIII", MODALITIES[modality], width, height, n) + body


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table: the stand-in for an ingested
    multimodal dataset (payloads would come from object storage refs or
    inline parquet binary at 100 TB — same schema either way)."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        w, h = 32 + (i % 7) * 16, 32 + (i % 5) * 16
        rows.append(
            (
                i,
                modality,
                bytearray(fake_payload(i, modality, w, h)),
                (w, h, 16000 if modality == "audio" else None, 30 if modality == "video" else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_payload(payload: bytes, decode: str = "fake") -> dict:
    """Decode one payload. ``fake`` parses the synthetic format; ``real``
    is the seam where Pillow/ffmpeg would be called."""
    if decode != "fake":
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; plug Pillow/ffmpeg in here"
        )
    if payload[:4] != MAGIC:
        raise ValueError("not a synthetic payload")
    modality_id, width, height, n = struct.unpack("<BIII", bytes(payload[4:17]))
    body = bytes(payload[17 : 17 + n])
    return {
        "n_bytes": n,
        "mean_byte": sum(body) / n,
        "checksum": sum((i + 1) * b for i, b in enumerate(body)) % (1 << 61),
        "width": width,
        "height": height,
    }


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    mapInPandas streams record batches through Python once per partition —
    the decode cost parallelizes with the data, and no payload ever lands
    on the driver. This is the template for resize / spectrogram /
    frame-sample operators: same batch shape, different inner function.
    """

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_payload(p, decode) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "modality", pdf["modality"].values)
            yield out[
                ["media_id", "modality", "n_bytes", "mean_byte", "checksum", "width", "height"]
            ]

    return media.mapInPandas(per_batch, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame sampling stub: emits (media_id, frame_index) rows for
    every ``every_nth`` frame per the metadata — the explode pattern a real
    decoder would follow with actual frame payloads."""
    video = media.filter(F.col("modality") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta.n_frames"), F.lit(0)) - 1, F.lit(every_nth))
        ).alias("frame_index"),
    )


# -- driver-visible registration -------------------------------------------

from parquet_modular_encryption_spark.registry import register  # noqa: E402
from parquet_modular_encryption_spark.session import prep  # noqa: E402


@register("q91_multimodal_features", oracle=None, tags=("multimodal", "pandas-udf"))
def q91_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on the synthetic media table: binary
    payload + metadata struct → mapInPandas feature extraction → per-modality
    aggregate joined with frame-sampling counts. Rows-only driver check (the
    payload decode is not SQL-expressible); tests/test_pipeline.py checks the
    per-payload features exactly against the pure-Python decoder."""
    prep(spark)
    media = synthetic_media(spark, n=96)
    feats = extract_features(media)
    frames = frame_sample(media, every_nth=10).groupBy("media_id").count()
    agg = feats.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("checksum").alias("checksum_sum"),
    )
    sampled = (
        feats.join(frames, "media_id", "left")
        .groupBy("modality")
        .agg(F.sum(F.coalesce(F.col("count"), F.lit(0))).alias("n_sampled_frames"))
    )
    return agg.join(sampled, "modality").orderBy("modality")
