"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas functions.

The Spark-side machinery (schemas, mapInPandas batching, partition
discipline) is real and tested. Decoding is a registry (``DECODERS``):
PIL / soundfile / PyAV are detected at import and used when present;
without them, PNG/JPEG dimensions come from pure-Python header parsing,
WAV probing uses the stdlib ``wave`` module, and AVI videos demux with a
pure-Python RIFF walker — real files decode correctly in a bare
container. Formats with no available codec (e.g. mp3 without soundfile,
mp4 without PyAV) raise ``NotImplementedError``; the deterministic fake
decoders remain registered under ``*/fake`` for pipeline-shape tests.
"""

from __future__ import annotations

import io
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional codec upgrade
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

try:  # optional codec upgrade
    import soundfile as _soundfile
except ImportError:
    _soundfile = None

try:  # optional codec upgrade (ffmpeg bindings)
    import av as _av
except ImportError:
    _av = None

# decoder registry: mime prefix -> bytes -> dict of features
DECODERS: dict[str, Callable[[bytes], dict]] = {}

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_dims(payload: bytes) -> tuple[int, int]:
    """Width/height from the IHDR chunk (always the first chunk, offset 16)."""
    if payload[:8] != _PNG_SIG or payload[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    return (
        int.from_bytes(payload[16:20], "big"),
        int.from_bytes(payload[20:24], "big"),
    )


def _jpeg_dims(payload: bytes) -> tuple[int, int]:
    """Width/height from the first SOFn marker segment."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    while i + 9 < len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(payload[i + 5 : i + 7], "big")
            w = int.from_bytes(payload[i + 7 : i + 9], "big")
            return (w, h)
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        i += 2 + seg_len
    raise ValueError("no SOF marker found")


def real_image_decode(payload: bytes) -> dict:
    """Real image probe: PIL when installed (full decode), else
    pure-Python PNG/JPEG header parsing — correct dimensions for real
    files with zero native dependencies."""
    if _PILImage is not None:
        with _PILImage.open(io.BytesIO(payload)) as im:
            w, h = im.size
        return {"width": w, "height": h, "n_bytes": len(payload)}
    if payload[:8] == _PNG_SIG:
        w, h = _png_dims(payload)
    elif payload[:2] == b"\xff\xd8":
        w, h = _jpeg_dims(payload)
    else:
        raise NotImplementedError("unrecognized image format and PIL not installed")
    return {"width": w, "height": h, "n_bytes": len(payload)}


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
    sits). With PIL installed, payloads that decode as images are really
    resized (``Image.resize`` → PNG bytes); otherwise — and for payloads
    PIL cannot open — the deterministic stand-in truncates/pads the byte
    payload to the target pixel count so schema, batching and size
    accounting are exercised without codecs."""
    id_list = list(id_cols)
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in id_list]
        + ["payload binary", "width int", "height int"]
    )
    narrow = df.select(*id_list, F.col(payload_col).alias("__p"))
    n_bytes = target_w * target_h

    def _one(p: bytes) -> bytes:
        if _PILImage is not None:
            try:
                with _PILImage.open(io.BytesIO(p)) as im:
                    buf = io.BytesIO()
                    im.resize((target_w, target_h)).save(buf, format="PNG")
                    return buf.getvalue()
            except Exception:
                pass  # not an image PIL can open -> stand-in below
        return p[:n_bytes].ljust(n_bytes, b"\0")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[id_list].copy()
            out["payload"] = [_one(bytes(p)) for p in pdf["__p"]]
            out["width"] = target_w
            out["height"] = target_h
            yield out

    return narrow.mapInPandas(_resize, schema=schema)


def _is_video_container(data: bytes) -> bool:
    """Signature probe for the containers the real path understands:
    MP4/MOV (ftyp box), Matroska/WebM (EBML), AVI (RIFF 'AVI ')."""
    return (
        (len(data) >= 12 and data[4:8] == b"ftyp")
        or data[:4] == b"\x1a\x45\xdf\xa3"
        or (data[:4] == b"RIFF" and data[8:12] == b"AVI ")
    )


def _avi_sampled_frames(data: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """Pure-Python AVI demux: walk the RIFF chunk tree and return every
    ``every_n``-th stored video frame (``##db`` uncompressed / ``##dc``
    compressed stream chunks, in file order) as (index, bytes). No codec
    needed — the chunks ARE the per-frame payloads, so real AVI files
    demux correctly in a bare container (the video twin of the
    PNG-header / ``wave`` fallbacks above). Unsampled frames are never
    copied out of the buffer."""
    frames: list[tuple[int, bytes]] = []
    count = 0

    def walk(start: int, end: int) -> None:
        nonlocal count
        i = start
        while i + 8 <= end:
            cid = data[i : i + 4]
            size = int.from_bytes(data[i + 4 : i + 8], "little")
            if cid == b"LIST":
                walk(i + 12, min(i + 8 + size, end))
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                if count % every_n == 0:
                    frames.append((count, data[i + 8 : i + 8 + size]))
                count += 1
            i += 8 + size + (size & 1)  # chunks are word-aligned

    walk(12, len(data))
    if count == 0:
        raise ValueError("AVI payload contains no video stream chunks (audio-only or unparsed movi list)")
    return frames


def _real_video_frames(data: bytes, every_n: int) -> list[tuple[int, bytes]] | None:
    """Decode a recognized video container to SAMPLED (index, payload)
    frames — only every ``every_n``-th frame is converted/kept, so a
    single huge video never materializes fully in the worker.

    PyAV (ffmpeg bindings) when installed: full decode of any container,
    sampled frames as raw RGB24 bytes. Without it, uncompressed/MJPEG
    AVI demuxes in pure Python. Returns None for unrecognized payloads
    (callers fall back to the byte-chunk stand-in); raises for real
    video containers that need a missing codec or carry no video frames
    — silent garbage is worse than an error."""
    if not _is_video_container(data):
        return None
    if _av is not None:
        out: list[tuple[int, bytes]] = []
        with _av.open(io.BytesIO(data)) as container:
            stream = container.streams.video[0]
            for idx, frame in enumerate(container.decode(stream)):
                if idx % every_n == 0:
                    out.append((idx, frame.to_ndarray(format="rgb24").tobytes()))
        if not out:
            raise ValueError("video container decoded to zero frames")
        return out
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return _avi_sampled_frames(data, every_n)
    raise NotImplementedError("video codec not available for this container (install av)")


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    payload_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
    frame_size: int = 64,
) -> DataFrame:
    """Video frame sampling: one input row -> N frame rows (frame index +
    frame payload), via ``mapInPandas`` so a single huge video never
    materializes as one Python object per row downstream.

    Payloads with a real video-container signature decode through
    :func:`_real_video_frames` (PyAV when installed, pure-Python AVI
    demux otherwise) and emit every ``every_n``-th real frame; anything
    else keeps the deterministic stand-in (``frame_size``-byte chunks) so
    the pipeline shape stays testable without codecs."""
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
                real = _real_video_frames(data, every_n)
                if real is not None:
                    for idx, frame in real:
                        rows.append(
                            {**{c: rec[c] for c in id_list}, "frame_idx": idx, "frame": frame}
                        )
                    continue
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
    """Real audio probe: soundfile when installed, else stdlib ``wave``
    for RIFF/WAVE payloads (real WAV files decode correctly with zero
    extra dependencies). Other formats need soundfile/ffmpeg."""
    if _soundfile is not None:
        with _soundfile.SoundFile(io.BytesIO(payload)) as sf:
            return {
                "duration_ms": int(len(sf) * 1000 / sf.samplerate),
                "sample_rate": int(sf.samplerate),
                "n_channels": int(sf.channels),
                "n_bytes": len(payload),
            }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            return {
                "duration_ms": int(w.getnframes() * 1000 / rate) if rate else 0,
                "sample_rate": rate,
                "n_channels": w.getnchannels(),
                "n_bytes": len(payload),
            }
    raise NotImplementedError("audio codec not available for this format")


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
