"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed with Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_image``/``decode_audio`` raise NotImplementedError,
and ``fake_feature_extractor`` provides a deterministic stand-in so the
Spark-side plumbing — schema, batch shape, partitioning — is fully real
and tested. Swap the extractor for a real one (PIL / torchaudio) on a
cluster with the libs installed; nothing else changes.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` modest for large blobs,
and partition by size (``repartitionByRange`` on meta.n_bytes) when
payloads are skewed.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real image decode requires PIL/opencv — not in this container."""
    raise NotImplementedError("image decode libs not available in this environment")


def decode_audio(payload: bytes):  # pragma: no cover - stub by design
    raise NotImplementedError("audio decode libs not available in this environment")


def fake_feature_extractor(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decode+embed step: cheap byte stats."""
    if payload is None or len(payload) == 0:
        return [0.0, 0.0, 0.0]
    return [float(len(payload)), float(payload[0]), float(payload[-1])]


def attach_binary(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    mime: str = "text/plain",
) -> DataFrame:
    """Wrap a column as an opaque media payload + typed metadata —
    the canonical multimodal row shape."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"), F.octet_length(payload).cast("long").alias("n_bytes")
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame,
    extractor: Callable[[bytes], list[float]] = fake_feature_extractor,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "features": pdf["payload"].map(extractor),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: truncates /
    zero-pads the payload to width*height bytes. Swap for a real
    PIL/opencv resize on a cluster with the libs; the Spark plumbing
    (schema, batching, metadata propagation) is identical."""
    target = width * height
    if payload is None:
        payload = b""
    return payload[:target] + b"\x00" * max(0, target - len(payload))


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] = fake_resizer,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads, propagating the
    typed metadata struct with the new dimensions.

    Scale: pure map — no shuffle; payload bytes move once through Arrow.
    Real decode is stubbed (``decode_image``) per environment limits.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(lambda b: resizer(b, width, height))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "meta": [
                        {
                            "mime": m["mime"] if m else None,
                            "n_bytes": len(p),
                            "width": width,
                            "height": height,
                        }
                        for m, p in zip(pdf["meta"], out)
                    ],
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType()),
    ]
)


def fake_frame_decoder(payload: bytes, frame_size: int) -> list[bytes]:
    """Deterministic stand-in for a video demuxer: fixed-size chunks."""
    if payload is None:
        return []
    return [
        payload[i : i + frame_size]
        for i in range(0, len(payload), frame_size)
    ]


def sample_frames(
    media: DataFrame,
    every_nth: int = 2,
    frame_size: int = 16,
    decoder: Callable[[bytes, int], "list[bytes]"] = fake_frame_decoder,
) -> DataFrame:
    """Video frame sampling: one input row fans out to every Nth frame
    (a flat-map — ``mapInPandas`` yields more rows than it consumes).

    Scale: fan-out happens task-locally; downstream per-frame work sees
    ordinary rows. For real video, swap ``decoder`` for an av/ffmpeg
    demux — signature and batch shape unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, fr in enumerate(decoder(payload, frame_size)):
                    if i % every_nth == 0:
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(fr)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
