"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas functions.

The Spark-side machinery (schemas, mapInPandas batching, partition
discipline) is real and tested; the actual media decoding is stubbed
behind ``DECODERS`` because codec libraries aren't in this container —
swap in PIL/ffmpeg implementations by registering a decoder. The
deterministic fake decoder lets tests assert the full pipeline shape.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# decoder registry: mime prefix -> bytes -> dict of features
DECODERS: dict[str, Callable[[bytes], dict]] = {}


def real_image_decode(payload: bytes) -> dict:
    """Placeholder for a real decoder (PIL.Image.open(BytesIO(payload))).
    Media libs are not in this container."""
    raise NotImplementedError("image codec not available in this environment")


def fake_image_decode(payload: bytes) -> dict:
    """Deterministic fake: derives pseudo-dimensions from the payload so
    the distributed plumbing (schema, batching, partitioning) is testable
    without codecs."""
    h = len(payload)
    return {"width": 64 + h % 512, "height": 64 + (h * 31) % 512, "n_bytes": h}


DECODERS["image/fake"] = fake_image_decode
DECODERS["image/png"] = real_image_decode
DECODERS["image/jpeg"] = real_image_decode


def attach_binary_payload(df: DataFrame, source_col: str, mime: str = "image/fake") -> DataFrame:
    """Model a multimodal asset: binary payload + typed metadata struct.
    (In production the payload column arrives from parquet/lance/tar
    shards; here it is synthesized from an existing column.)"""
    return df.withColumn("payload", F.encode(F.col(source_col).cast("string"), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(F.col("payload")).alias("n_bytes"),
        ),
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    mime_col: str = "media_meta.mime",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches, one
    Python worker per partition — scales with executors; no shuffle).

    Output schema: id columns + (width int, height int, n_bytes long).
    """
    id_list = list(id_cols)
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in id_list]
        + ["width int", "height int", "n_bytes long"]
    )
    mime_field = mime_col.split(".")[-1]
    narrow = df.select(*id_list, F.col(payload_col).alias("__payload"), F.col(mime_col).alias("__mime"))

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mime in zip(pdf["__payload"], pdf["__mime"]):
                decoder = DECODERS.get(mime)
                if decoder is None:
                    raise ValueError(f"no decoder registered for {mime!r}")
                feats.append(decoder(bytes(payload)))
            out = pdf[id_list].copy()
            out["width"] = [f["width"] for f in feats]
            out["height"] = [f["height"] for f in feats]
            out["n_bytes"] = [f["n_bytes"] for f in feats]
            yield out

    return narrow.mapInPandas(_decode, schema=schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Resize step: payload -> resized payload + new dims, via
    ``mapInPandas`` (Arrow batches; no shuffle — executes where the data
    sits). The real implementation would be PIL ``Image.resize``; the
    deterministic stand-in truncates/pads the byte payload to the target
    pixel count so schema, batching and size accounting are exercised."""
    id_list = list(id_cols)
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in id_list]
        + ["payload binary", "width int", "height int"]
    )
    narrow = df.select(*id_list, F.col(payload_col).alias("__p"))
    n_bytes = target_w * target_h

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[id_list].copy()
            out["payload"] = [
                bytes(p)[:n_bytes].ljust(n_bytes, b"\0") for p in pdf["__p"]
            ]
            out["width"] = target_w
            out["height"] = target_h
            yield out

    return narrow.mapInPandas(_resize, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    payload_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
    frame_size: int = 64,
) -> DataFrame:
    """Video frame sampling: one input row -> N frame rows (frame index +
    frame payload), via ``mapInPandas`` so a single huge video never
    materializes as one Python object per row downstream. The stand-in
    treats the payload as ``frame_size``-byte frames and emits every
    ``every_n``-th; a real decoder would seek keyframes (ffmpeg)."""
    id_list = list(id_cols)
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in id_list]
        + ["frame_idx int", "frame binary"]
    )
    narrow = df.select(*id_list, F.col(payload_col).alias("__p"))

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                data = bytes(rec["__p"])
                n_frames = max(len(data) // frame_size, 1)
                for i in range(0, n_frames, every_n):
                    frame = data[i * frame_size : (i + 1) * frame_size]
                    rows.append(
                        {**{c: rec[c] for c in id_list}, "frame_idx": i, "frame": frame}
                    )
            if rows:
                yield pd.DataFrame(rows)

    return narrow.mapInPandas(_sample, schema=schema)


def real_audio_decode(payload: bytes) -> dict:
    """Placeholder for a real decoder (soundfile/ffmpeg probe).
    Media libs are not in this container."""
    raise NotImplementedError("audio codec not available in this environment")


def fake_audio_decode(payload: bytes) -> dict:
    """Deterministic fake audio probe: pseudo duration / rate / channels
    derived from payload length so the distributed plumbing is testable
    without codecs."""
    h = len(payload)
    return {
        "duration_ms": 1000 + (h * 17) % 600_000,
        "sample_rate": (8000, 16000, 44100, 48000)[h % 4],
        "n_channels": 1 + h % 2,
        "n_bytes": h,
    }


DECODERS["audio/fake"] = fake_audio_decode
DECODERS["audio/wav"] = real_audio_decode
DECODERS["audio/mpeg"] = real_audio_decode


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    mime_col: str = "media_meta.mime",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Audio twin of :func:`extract_image_features` — same Arrow-batched
    ``mapInPandas`` shape, audio-typed output schema:
    id columns + (duration_ms long, sample_rate int, n_channels int,
    n_bytes long)."""
    id_list = list(id_cols)
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in id_list]
        + ["duration_ms long", "sample_rate int", "n_channels int", "n_bytes long"]
    )
    narrow = df.select(*id_list, F.col(payload_col).alias("__payload"), F.col(mime_col).alias("__mime"))

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mime in zip(pdf["__payload"], pdf["__mime"]):
                decoder = DECODERS.get(mime)
                if decoder is None:
                    raise ValueError(f"no decoder registered for {mime!r}")
                feats.append(decoder(bytes(payload)))
            out = pdf[id_list].copy()
            for k in ("duration_ms", "sample_rate", "n_channels", "n_bytes"):
                out[k] = [f[k] for f in feats]
            yield out

    return narrow.mapInPandas(_decode, schema=schema)
