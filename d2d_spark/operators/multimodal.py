"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed in Arrow batches via
mapInPandas.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic STUB (`_fake_decode`) — the Spark-side
contract (schema, batch shape, partitioning, UDF signature) is real
and tested, and swapping in PIL/torchaudio later changes only the
kernel body.

`sniff_image_metadata` is NOT a stub: PNG/GIF/BMP/JPEG dimensions
live in the container headers and parse with stdlib byte reads — the
size/aspect/format filter pass over a media corpus needs no codec.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate an ingest that lands opaque media bytes alongside
    metadata: payload = utf-8 bytes of the text (stand-in for image
    bytes), media_type + byte length as typed metadata columns."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("image/fake")
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decode standing in for PIL.Image.open(...).size + a model
    feature vector. Deterministic pure function of the bytes; replace
    with a real codec in production. Raises on empty payload the way
    a real decoder raises on truncated files."""
    if not payload:
        raise NotImplementedError("empty payload: real decoder unavailable in sandbox")
    n = len(payload)
    width, height = (n % 640) + 1, (n % 480) + 1
    feature = [float(payload[0]), float(payload[-1]), float(n % 256), float(n % 101)]
    return width, height, feature


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    mapInPandas streams record batches through Python once — the 10 to
    100x-over-row-UDF path. Partition count is preserved, so upstream
    repartitioning by size controls decode parallelism at scale."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "fake_width": [d[0] for d in decoded],
                    "fake_height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, FEATURE_SCHEMA)


RESIZED_SCHEMA_FIELDS = [
    T.StructField("resized", T.BinaryType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
]


def resize_payload(
    df: DataFrame, target_w: int = 64, target_h: int = 48, id_col: str = "doc_id"
) -> DataFrame:
    """Resize plumbing: binary in -> smaller binary + output dims out,
    Arrow-batched. The STUB kernel decimates bytes to target_w*target_h
    (deterministic stand-in for PIL resize); schema/batching/partition
    preservation are the real contract. Output keeps the id so the
    resized payload joins back to its metadata row."""
    out_schema = T.StructType([df.schema[id_col]] + RESIZED_SCHEMA_FIELDS)
    target = target_w * target_h

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for p in pdf["payload"]:
                if not p:
                    raise NotImplementedError("empty payload: real codec unavailable")
                step = max(len(p) // target, 1)
                resized.append(bytes(p[::step][:target]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": resized,
                    "out_width": target_w,
                    "out_height": target_h,
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, out_schema)


def _image_dims(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """REAL (not stubbed) image-header sniffing: container format and
    pixel dimensions from the first bytes of PNG / GIF / BMP / JPEG /
    WebP (VP8, VP8L, VP8X) payloads, stdlib-only — dimension metadata
    never needs a codec.
    Unknown or truncated payloads return NULLs (bad media is a row to
    filter downstream, not a job-killer)."""
    # Python slices never raise on short payloads and int.from_bytes
    # of an empty slice is 0, so every branch checks the byte length
    # it is about to read EXPLICITLY — a magic prefix on a truncated
    # file must yield NULLs, not 0-dim phantom metadata
    def _dims(fmt: str, w: int, h: int):
        return (fmt, w, h) if w > 0 and h > 0 else (None, None, None)

    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            if len(payload) < 24:
                return (None, None, None)
            return _dims(
                "png",
                int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"),
            )
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            if len(payload) < 10:
                return (None, None, None)
            return _dims(
                "gif",
                int.from_bytes(payload[6:8], "little"),
                int.from_bytes(payload[8:10], "little"),
            )
        if payload[:2] == b"BM" and len(payload) >= 26:
            return _dims(
                "bmp",
                int.from_bytes(payload[18:22], "little", signed=True),
                abs(int.from_bytes(payload[22:26], "little", signed=True)),
            )
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            # dims live in the first chunk's header: VP8 (lossy) sync
            # frame, VP8L (lossless) stream header, or VP8X canvas
            if len(payload) < 30:
                return (None, None, None)
            chunk = payload[12:16]
            d = payload[20:]
            if chunk == b"VP8 " and d[3:6] == b"\x9d\x01\x2a":
                return _dims(
                    "webp",
                    int.from_bytes(d[6:8], "little") & 0x3FFF,
                    int.from_bytes(d[8:10], "little") & 0x3FFF,
                )
            if chunk == b"VP8L" and d[0:1] == b"\x2f":
                bits = int.from_bytes(d[1:5], "little")
                return _dims("webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
            if chunk == b"VP8X" and len(d) >= 10:
                return _dims(
                    "webp",
                    int.from_bytes(d[4:7], "little") + 1,
                    int.from_bytes(d[7:10], "little") + 1,
                )
            return (None, None, None)
        if payload[:2] == b"\xff\xd8":
            # walk JPEG segments to the first SOF marker (C0-CF minus
            # the non-frame C4/C8/CC): height/width sit 5 bytes in
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    break
                if payload[i + 1] == 0xFF:
                    # optional 0xFF fill bytes before a marker are
                    # legal — skip them, they are not the marker
                    i += 1
                    continue
                marker = payload[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    return _dims(
                        "jpeg",
                        int.from_bytes(payload[i + 7 : i + 9], "big"),
                        int.from_bytes(payload[i + 5 : i + 7], "big"),
                    )
                i += 2 + seg_len
    except (IndexError, ValueError):
        pass
    return (None, None, None)


METADATA_SCHEMA_FIELDS = [
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.IntegerType()),
]


def sniff_image_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Typed metadata from raw image bytes — the first real pass over
    an ingested media corpus (size/aspect filters, format composition
    stats) and the one that needs NO codec. Arrow-batched map-only
    kernel; unknown formats surface as NULL rows to filter, never
    errors. Unlike `decode_features`' stub kernel, this parses the
    actual container headers."""
    out_schema = T.StructType([df.schema[id_col]] + METADATA_SCHEMA_FIELDS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_image_dims(p or b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": pd.array([d[0] for d in dims], dtype="string"),
                    "width": pd.array([d[1] for d in dims], dtype="Int32"),
                    "height": pd.array([d[2] for d in dims], dtype="Int32"),
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, out_schema)


def _wav_meta(payload: bytes) -> tuple[int | None, int | None, int | None, float | None]:
    """(channels, sample_rate, bits_per_sample, seconds) from a
    RIFF/WAVE header — like image dims, audio bookkeeping metadata
    parses with stdlib byte reads, no codec. NULLs for anything that
    isn't a WAV or is truncated."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return (None, None, None, None)
        i = 12
        channels = rate = bits = None
        data_size = None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            size = int.from_bytes(payload[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 24 <= len(payload):
                channels = int.from_bytes(payload[i + 10 : i + 12], "little")
                rate = int.from_bytes(payload[i + 12 : i + 16], "little")
                bits = int.from_bytes(payload[i + 22 : i + 24], "little")
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if channels and rate and bits and data_size is not None:
            seconds = data_size / (rate * channels * (bits // 8))
            return (channels, rate, bits, seconds)
    except (IndexError, ValueError, ZeroDivisionError):
        pass
    return (None, None, None, None)


AUDIO_SCHEMA_FIELDS = [
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("bits_per_sample", T.IntegerType()),
    T.StructField("seconds", T.DoubleType()),
    T.StructField("n_bytes", T.IntegerType()),
]


def sniff_audio_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """WAV bookkeeping metadata (duration/rate/channel filters over an
    audio corpus) straight from the RIFF header — real, codec-free,
    Arrow-batched, map-only. Non-WAV payloads yield NULL rows."""
    out_schema = T.StructType([df.schema[id_col]] + AUDIO_SCHEMA_FIELDS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_wav_meta(p or b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "channels": pd.array([m[0] for m in metas], dtype="Int32"),
                    "sample_rate": pd.array([m[1] for m in metas], dtype="Int32"),
                    "bits_per_sample": pd.array([m[2] for m in metas], dtype="Int32"),
                    "seconds": pd.array([m[3] for m in metas], dtype="Float64"),
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, out_schema)


def _mp4_boxes(payload: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the ISO-BMFF boxes in
    payload[start:end]. Stops (never raises) on truncated/garbage
    sizes; size==1 reads the 64-bit largesize, size==0 extends to the
    region end."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(payload[i : i + 4], "big")
        btype = payload[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(payload[i + 8 : i + 16], "big")
            body = i + 16
            if size < 16:
                return
        elif size == 0:
            size = end - i
        elif size < 8:
            return
        if i + size > end:
            return
        yield btype, body, i + size
        i += size


def _mp4_meta(
    payload: bytes,
) -> tuple[str | None, float | None, int | None, int | None, int | None]:
    """(brand, seconds, n_tracks, width, height) from an MP4/ISO-BMFF
    container — the same codec-free byte walk as the image/WAV
    sniffers: ftyp gives the brand, moov/mvhd the timescale+duration,
    moov/trak count the tracks, the first trak/tkhd with a non-zero
    16.16 canvas gives the visual dimensions. NULLs for anything that
    isn't BMFF or is truncated mid-box."""
    brand = seconds = n_tracks = width = height = None
    try:
        if payload[4:8] != b"ftyp":
            return (None, None, None, None, None)
        for btype, body, bend in _mp4_boxes(payload, 0, len(payload)):
            if btype == b"ftyp" and bend - body >= 4:
                brand = payload[body : body + 4].decode("ascii", "replace").strip()
            elif btype == b"moov":
                n_tracks = 0
                for ctype, cbody, cend in _mp4_boxes(payload, body, bend):
                    if ctype == b"mvhd" and cend - cbody >= 4:
                        ver = payload[cbody]
                        if ver == 1 and cend - cbody >= 32:
                            ts = int.from_bytes(payload[cbody + 20 : cbody + 24], "big")
                            dur = int.from_bytes(payload[cbody + 24 : cbody + 32], "big")
                        elif ver == 0 and cend - cbody >= 20:
                            ts = int.from_bytes(payload[cbody + 12 : cbody + 16], "big")
                            dur = int.from_bytes(payload[cbody + 16 : cbody + 20], "big")
                        else:
                            continue
                        if ts:
                            seconds = dur / ts
                    elif ctype == b"trak":
                        n_tracks += 1
                        for ttype, tbody, tend in _mp4_boxes(payload, cbody, cend):
                            if ttype != b"tkhd":
                                continue
                            off = 88 if payload[tbody] == 1 else 76
                            if tend - tbody >= off + 8 and width is None:
                                w = int.from_bytes(payload[tbody + off : tbody + off + 4], "big") >> 16
                                h = int.from_bytes(payload[tbody + off + 4 : tbody + off + 8], "big") >> 16
                                if w > 0 and h > 0:
                                    width, height = w, h
    except (IndexError, ValueError):
        pass
    return (brand, seconds, n_tracks, width, height)


VIDEO_SCHEMA_FIELDS = [
    T.StructField("brand", T.StringType()),
    T.StructField("seconds", T.DoubleType()),
    T.StructField("n_tracks", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.IntegerType()),
]


def sniff_video_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """MP4/ISO-BMFF bookkeeping metadata (brand, duration, track
    count, visual dimensions) straight from the box structure — real,
    codec-free, Arrow-batched, map-only; the video analog of
    `sniff_image_metadata`/`sniff_audio_metadata`. Non-BMFF payloads
    yield NULL rows to filter downstream, never errors."""
    out_schema = T.StructType([df.schema[id_col]] + VIDEO_SCHEMA_FIELDS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_mp4_meta(p or b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "brand": pd.array([m[0] for m in metas], dtype="string"),
                    "seconds": pd.array([m[1] for m in metas], dtype="Float64"),
                    "n_tracks": pd.array([m[2] for m in metas], dtype="Int32"),
                    "width": pd.array([m[3] for m in metas], dtype="Int32"),
                    "height": pd.array([m[4] for m in metas], dtype="Int32"),
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, out_schema)


def sample_frames(df: DataFrame, text_col: str = "text", every: int = 16) -> DataFrame:
    """Frame-sampling analog: take every `every`-th "pixel" (character
    code) as a frame array — pure columnar expression, no Python."""
    frames = F.transform(
        F.sequence(F.lit(1), F.length(text_col), F.lit(every)),
        lambda p: F.ascii(F.substring(F.col(text_col), p, 1)),
    )
    # sequence(1, 0) throws under Spark; empty text has no frames
    # (matches the oracle's range(), which yields [])
    return df.withColumn(
        "frames",
        F.when(F.length(text_col) == 0, F.array().cast("array<int>")).otherwise(frames),
    )
