"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched Pandas UDFs
(``mapInPandas``).

The Spark-side contract is real and tested — schema, partition sizing, UDF
signature, batch shape. GENUINE stdlib decoders exist for 16-bit PCM WAV
(``real_audio_features``), 24-bit BMP (``real_image_features``), 8-bit
truecolor/grayscale/palette PNG, sequential or Adam7 interlaced
(``real_png_features`` — zlib inflate + per-pass five-filter
defiltering + PLTE resolution), single-frame GIF87a/89a, plain or
interlaced (``real_gif_features`` — variable-width LZW decompression,
extension skipping, global/local color tables, 4-pass deinterlace), and
baseline sequential JPEG (``real_jpeg_features`` — canonical Huffman
entropy decode, dequantization, full 2-D IDCT, YCbCr→RGB,
4:4:4/4:2:2/4:2:0 sampling, DRI/RSTn restart intervals). Still stubbed,
because they genuinely need external codec libraries: MP3/AAC audio,
video containers, progressive (SOF2) JPEG, and alpha/16-bit PNG — those
slots raise ``NotImplementedError`` rather than mis-decode. Since round
11 the refusal sites carry OPT-IN feature-detected adapters
(``pillow_image_decode`` / ``pillow_resize`` / ``soundfile_audio_decode``
behind ``allow_adapter=True`` on ``real_decode`` / ``real_resize`` /
``audio_decode``): when Pillow/soundfile are installed those payloads
decode for real, when absent the refusals are byte-identical to before,
and the stdlib decoders remain the oracle-checked default either way —
zero new required dependencies. The once-untested "swap in Pillow
changes ~5 lines inside a UDF" claim is now the adapter itself, with a
pytest that skips (not fails) when the library is absent.

WAV audio, however, needs no third-party codec: ``real_audio_features``
GENUINELY decodes 16-bit PCM RIFF/WAVE payloads with stdlib ``wave`` and
computes duration / RMS / peak from the actual samples. The fixtures in
``wav_fixture_clips`` are hand-packed (raw ``struct`` RIFF chunks — a
different implementation than the ``wave``-module reader that decodes
them) with expected features computed directly from the sample arrays, so
the decode path is cross-checked against an independent reference.

Batch sizing note for 100 TB: media rows are fat — keep
``spark.sql.files.maxPartitionBytes`` at 128 MB and let mapInPandas stream
Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch) instead of
collecting a partition at once.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _codec_guard(fmt: str, *extra_excs: type):
    """Normalize a byte-walking decoder's failure surface: arbitrary
    corrupt input must raise ``ValueError`` (or the honest
    ``NotImplementedError``), never a parser internal like
    ``struct.error``/``IndexError``/``KeyError`` — at 100 TB these run
    inside executors and downstream error routing keys on the type.
    Found by fuzzing the fixtures with random byte flips/truncations/
    insertions (tests/test_corpus_ops.py:test_codec_fuzz_failure_surface)."""
    import struct
    import zlib

    caught = (
        IndexError,
        KeyError,
        OverflowError,
        struct.error,
        zlib.error,
    ) + extra_excs

    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(payload, *a, **kw):
            try:
                return fn(payload, *a, **kw)
            except (ValueError, NotImplementedError):
                raise
            except caught as e:
                raise ValueError(f"corrupt {fmt} stream: {e}") from e

        return wrapped

    return deco


MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def real_decode(payload: bytes, allow_adapter: bool = False) -> tuple[int, int]:
    """Format-dispatching real-codec slot: BMP, PNG, GIF, and baseline
    JPEG are genuinely decodable here (``real_image_decode`` /
    ``real_png_decode`` / ``real_gif_decode`` / ``real_jpeg_decode``);
    WebP/AVIF and other formats still need Pillow/libvips.
    ``allow_adapter=True`` OPTS IN to the feature-detected Pillow
    fallback (``pillow_image_decode``) for exactly the payloads the
    stdlib decoders refuse — stdlib still runs first, so every
    oracle-checked decode is byte-identical with or without the lib,
    and with the default ``False`` the refusal contract is unchanged
    no matter what is installed."""
    try:
        if payload[:2] == b"BM":
            d = real_image_decode(payload)
            return (d["width"], d["height"])
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            d = real_png_decode(payload)
            return (d["width"], d["height"])
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            d = real_gif_decode(payload)
            return (d["width"], d["height"])
        if payload[:2] == b"\xff\xd8":
            d = real_jpeg_decode(payload)
            return (d["width"], d["height"])
        raise NotImplementedError(
            "only BMP/PNG/GIF/baseline-JPEG decode without external codecs; "
            "decode_image_meta uses the deterministic fake instead"
        )
    except NotImplementedError:
        if allow_adapter and _pillow() is not None:
            d = pillow_image_decode(payload)
            return (d["width"], d["height"])
        raise


# ------------------------------------------------- optional codec adapters
#
# Feature-detected externals behind the honest refusal sites: the stdlib
# decoders above stay the ORACLE-CHECKED default (deterministic, zero
# dependencies, refusals included), and nothing in this repo requires
# Pillow/soundfile — but when one IS installed, these adapters close the
# refusal gaps a real multimodal corpus hits in its first hour
# (MP3/AAC, progressive SOF2 JPEG, alpha/16-bit PNG, WebP, real video
# containers via per-frame stills). They are OPT-IN at the call site
# (`allow_adapter=True`), never ambient: a refusal a test or routing
# policy pins must not silently flip because a library appeared on the
# image. The "swap in Pillow changes ~5 lines inside a UDF" claim from
# the module docstring is exactly `pillow_image_decode` — and a pytest
# (skipped, not failed, when the lib is absent) finally exercises it.


def _pillow():
    """Feature-detect Pillow; None when absent (adapter unavailable)."""
    try:
        from PIL import Image

        return Image
    except ImportError:  # pragma: no cover - env-dependent
        return None


def _soundfile():
    """Feature-detect soundfile; None when absent."""
    try:
        import soundfile

        return soundfile
    except ImportError:  # pragma: no cover - env-dependent
        return None


def pillow_image_decode(payload: bytes) -> dict:
    """Pillow-backed decode for formats the stdlib decoders refuse.
    Raises NotImplementedError (the same refusal contract) when Pillow
    is not installed."""
    Image = _pillow()
    if Image is None:
        raise NotImplementedError(
            "Pillow is not installed — the optional image adapter is "
            "unavailable; stdlib decoders cover BMP/PNG/GIF/baseline-JPEG"
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:
        return {"width": im.width, "height": im.height, "mode": im.mode}


def pillow_resize(payload: bytes, width: int, height: int) -> bytes:
    """Pillow-backed real resize (PNG-serialized output — deterministic
    given one Pillow version; cross-version byte stability is NOT
    promised, which is why the oracle-checked default stays the fake)."""
    Image = _pillow()
    if Image is None:
        raise NotImplementedError(
            "Pillow is not installed — the optional resize adapter is "
            "unavailable; resize_image uses the deterministic fake"
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:
        out = io.BytesIO()
        im.resize((width, height)).save(out, format="PNG")
        return out.getvalue()


def soundfile_audio_decode(payload: bytes) -> dict:
    """soundfile-backed decode for audio the stdlib ``wave`` reader
    refuses (MP3, float/24-bit WAV, FLAC, OGG — whatever the linked
    libsndfile supports). Same output contract as
    ``real_audio_decode``'s header fields."""
    sf = _soundfile()
    if sf is None:
        raise NotImplementedError(
            "soundfile is not installed — the optional audio adapter is "
            "unavailable; stdlib wave covers 16-bit PCM WAV"
        )
    import io

    with sf.SoundFile(io.BytesIO(payload)) as f:
        n_frames = len(f)
        return {
            "sample_rate": f.samplerate,
            "n_channels": f.channels,
            "n_frames": n_frames,
            "duration_ms": n_frames * 1000 // f.samplerate,
        }


def audio_decode(payload: bytes, allow_adapter: bool = False) -> dict:
    """Dispatching audio entry point mirroring ``real_decode``'s
    contract: stdlib ``real_audio_decode`` first (16-bit PCM WAV, the
    oracle-checked path), and with ``allow_adapter=True`` the
    feature-detected soundfile fallback for what it refuses — both the
    in-container refusal (non-PCM16 WAV → NotImplementedError) and
    not-a-WAV-at-all payloads like MP3 (→ ValueError from the codec
    guard), which ARE decodable audio to libsndfile."""
    try:
        return real_audio_decode(payload)
    except (NotImplementedError, ValueError):
        if allow_adapter and _soundfile() is not None:
            return soundfile_audio_decode(payload)
        raise


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake 'decode': derive a plausible (width, height) from
    the payload hash so tests and the SQL oracle can reproduce it."""
    h = hashlib.md5(payload).hexdigest()
    return (int(h[:4], 16) % 1920 + 1, int(h[4:8], 16) % 1080 + 1)


def to_media_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat a payload as an opaque media blob: ``binary`` column + nothing
    else typed. (Here the bytes are the utf-8 of the text column; in
    production they come straight from the file/source.)"""
    return df.withColumn("media", F.encode(F.col(text_col), "utf-8"))


def frame_sample(
    df: DataFrame,
    key_col: str = "doc_id",
    media_col: str = "media",
    frame_len: int = 64,
) -> DataFrame:
    """Frame sampling: one media blob → N fixed-size frames (video frame
    extraction's plumbing — the codec that would decode real frames plugs
    into the per-frame projection). Pure Catalyst: byte-slice + explode,
    no Python; frames carry (frame_no, frame_md5, frame_bytes_len) so
    downstream per-frame stages (decode, embed) fan out row-per-frame.

    At scale this is the row-explosion pattern for video: keep frames
    with their parent key so a later groupBy(key) re-assembles clips
    without a shuffle beyond the original partitioning."""
    media = F.col(media_col)
    n_frames = F.greatest(
        F.ceil(F.length(media) / F.lit(float(frame_len))).cast("int"), F.lit(1)
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.substring(media, i * frame_len + 1, frame_len),
    )
    out = df.select(
        F.col(key_col), F.posexplode_outer(frames).alias("frame_no", "frame")
    )
    return out.select(
        key_col,
        "frame_no",
        F.md5(F.col("frame")).alias("frame_md5"),
        F.length(F.col("frame")).cast("long").alias("frame_bytes"),
    )


RESIZE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("resized_md5", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def real_resize(
    payload: bytes, width: int, height: int, allow_adapter: bool = False
) -> bytes:
    """The real-resize slot. ``allow_adapter=True`` opts in to the
    feature-detected Pillow path (``pillow_resize``); the default keeps
    the honest refusal so ``resize_image``'s oracle-checked fake stays
    the deterministic contract."""
    if allow_adapter and _pillow() is not None:
        return pillow_resize(payload, width, height)
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "resize_image uses the deterministic fake instead"
    )


def _fake_resize(payload: bytes, width: int, height: int) -> str:
    """Deterministic fake resize: the 'resized payload' digest is a pure
    function of (payload, target dims) so the SQL oracle reproduces it."""
    return hashlib.md5(payload + f"{width}x{height}".encode()).hexdigest()


def resize_image(
    df: DataFrame,
    key_col: str = "doc_id",
    width: int = 640,
    height: int = 480,
) -> DataFrame:
    """mapInPandas resize stage: (key, media) → (key, n_bytes, digest of
    the resized payload, target dims). Same Arrow-batched plumbing as
    ``decode_image_meta`` — only the per-payload function differs; the
    real codec plugs into ``real_resize``."""
    media_df = df.select(F.col(key_col).alias("doc_id"), "media")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "resized_md5": [
                        _fake_resize(p, width, height) for p in payloads
                    ],
                    "width": [width] * len(payloads),
                    "height": [height] * len(payloads),
                }
            )

    return media_df.mapInPandas(resize, RESIZE_META_SCHEMA)


def audio_features(
    df: DataFrame, key_col: str = "doc_id", sample_rate: int = 16000
) -> DataFrame:
    """mapInPandas audio feature extraction: the blob is treated as a
    1-byte-per-sample PCM stream (deterministic stand-in — torchaudio
    plugs into the same signature), yielding sample-rate and duration
    features used for corpus filtering (e.g. drop clips < 1 s)."""
    media_df = df.select(F.col(key_col).alias("doc_id"), "media")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = [len(bytes(p)) for p in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "sample_rate": [sample_rate] * len(n),
                    "duration_ms": [b * 1000 // sample_rate for b in n],
                }
            )

    return media_df.mapInPandas(feats, AUDIO_META_SCHEMA)


# ------------------------------------------------------- real WAV decode
REAL_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def _pack_wav(sample_rate: int, n_channels: int, samples: list[int]) -> bytes:
    """Hand-pack interleaved 16-bit PCM samples into a RIFF/WAVE payload
    (raw ``struct``, deliberately NOT the ``wave`` module — the fixture
    writer and the operator's reader must be independent implementations
    for the decode test to mean anything)."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate,
        byte_rate, n_channels * 2, 16,
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff_len = 4 + len(fmt) + len(data_chunk)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt + data_chunk


def wav_fixture_clips(n_clips: int = 12) -> list[dict]:
    """Deterministic WAV fixtures: integer triangle waves at varied
    sample rates / channel counts / amplitudes. Each dict carries the
    payload bytes AND expected features computed straight from the
    sample list (pure integer math — independent of any WAV parser), so
    both the tests and the DuckDB oracle can assert the decode exactly."""
    import hashlib as _hl
    import math

    clips = []
    for cid in range(n_clips):
        sr = (8000, 16000, 22050, 44100)[cid % 4]
        n_ch = 1 + cid % 2
        n_frames = 400 + 37 * cid
        amp = 1000 + 700 * cid
        period = 50 + 3 * cid
        mono = [
            amp * (2 * min(i % period, period - i % period) - period // 2)
            // period
            for i in range(n_frames)
        ]
        if n_ch == 1:
            samples = mono
        else:  # second channel phase-shifted, interleaved
            shifted = mono[7:] + mono[:7]
            samples = [s for pair in zip(mono, shifted) for s in pair]
        payload = _pack_wav(sr, n_ch, samples)
        clips.append(
            {
                "clip_id": cid,
                "payload": payload,
                "n_bytes": len(payload),
                "content_md5": _hl.md5(payload).hexdigest(),
                "sample_rate": sr,
                "n_channels": n_ch,
                "n_frames": n_frames,
                "duration_ms": n_frames * 1000 // sr,
                "rms": math.isqrt(
                    sum(s * s for s in samples) // len(samples)
                ),
                "peak": max(abs(s) for s in samples),
            }
        )
    return clips


@_codec_guard("WAV", __import__("wave").Error, EOFError, RuntimeError)
def real_audio_decode(payload: bytes) -> dict:
    """GENUINE WAV decode via stdlib ``wave`` — the formerly-stubbed
    real-codec slot for audio. 16-bit PCM only; other sample widths (and
    compressed containers) still need an external codec and raise."""
    import array
    import io
    import math
    import sys
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        n_frames = w.getnframes()
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                "only 16-bit PCM WAV is decodable without external codecs"
            )
        raw = w.readframes(n_frames)
    samples = array.array("h")
    samples.frombytes(raw)
    if sys.byteorder == "big":  # WAV data is little-endian
        samples.byteswap()
    n = len(samples)
    return {
        "sample_rate": sr,
        "n_channels": n_ch,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sr,
        "rms": math.isqrt(sum(s * s for s in samples) // n) if n else 0,
        "peak": max(abs(s) for s in samples) if n else 0,
    }


def real_audio_features(
    df: DataFrame, key_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """mapInPandas REAL audio feature extraction: decodes each WAV blob
    with ``real_audio_decode`` and derives duration/RMS/peak from the
    actual samples — the genuinely-decoding counterpart of
    ``audio_features``. Same Arrow-batched plumbing, same 100 TB shape
    (narrow, no shuffle; media bytes never leave their partition)."""
    media_df = df.select(
        F.col(key_col).alias("doc_id"), F.col(media_col).alias("media")
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(p)
                d = real_audio_decode(payload)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(payload),
                        "content_md5": hashlib.md5(payload).hexdigest(),
                        **d,
                    }
                )
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(feats, REAL_AUDIO_SCHEMA)


# ------------------------------------------------------- real BMP decode
REAL_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_rgb", T.LongType()),  # r*65536 + g*256 + b
    ]
)


def _pack_bmp(width: int, height: int, rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Hand-pack 24-bit uncompressed BMP (BITMAPINFOHEADER): rows given
    top-down as (r, g, b), stored bottom-up with 4-byte row padding —
    raw ``struct``, independent of the reader for the same
    cross-implementation reason as ``_pack_wav``."""
    import struct

    row_stride = (width * 3 + 3) // 4 * 4
    body = bytearray()
    for row in reversed(rows):  # BMP stores bottom-up
        line = bytearray()
        for r, g, b in row:
            line += struct.pack("<3B", b, g, r)  # little-endian BGR
        line += b"\x00" * (row_stride - len(line))
        body += line
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    offset = 14 + len(info)
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    return header + info + bytes(body)


def bmp_fixture_images(n_images: int = 8) -> list[dict]:
    """Deterministic BMP fixtures (integer gradient patterns, varied
    dimensions incl. non-multiple-of-4 widths to exercise row padding)
    with expected features computed straight from the pixel arrays."""
    import hashlib as _hl

    out = []
    for iid in range(n_images):
        w = 5 + iid  # 5..12 — odd widths force row padding
        h = 3 + iid % 4
        rows = [
            [
                (
                    (iid * 37 + x * 11 + y * 7) % 256,
                    (iid * 53 + x * 3 + y * 19) % 256,
                    (iid * 29 + x * 13 + y * 5) % 256,
                )
                for x in range(w)
            ]
            for y in range(h)
        ]
        payload = _pack_bmp(w, h, rows)
        flat = [p for row in rows for p in row]
        n = len(flat)
        mr = sum(p[0] for p in flat) // n
        mg = sum(p[1] for p in flat) // n
        mb = sum(p[2] for p in flat) // n
        out.append(
            {
                "img_id": iid,
                "payload": payload,
                "n_bytes": len(payload),
                "content_md5": _hl.md5(payload).hexdigest(),
                "width": w,
                "height": h,
                "n_pixels": n,
                "mean_rgb": mr * 65536 + mg * 256 + mb,
            }
        )
    return out


@_codec_guard("BMP")
def real_image_decode(payload: bytes) -> dict:
    """GENUINE uncompressed-BMP decode with stdlib ``struct``: parses the
    file + info headers, walks the bottom-up padded pixel rows, and
    computes per-channel means from the actual pixels. 24-bit
    BI_RGB only; anything else still needs an external codec."""
    import struct

    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            "only 24-bit uncompressed BMP is decodable without external codecs"
        )
    top_down = height < 0
    h = abs(height)
    row_stride = (width * 3 + 3) // 4 * 4
    sr = sg = sb = 0
    for row_i in range(h):
        src_row = row_i if top_down else h - 1 - row_i
        base = offset + src_row * row_stride
        for x in range(width):
            b, g, r = struct.unpack_from("<3B", payload, base + x * 3)
            sr += r
            sg += g
            sb += b
    n = width * h
    return {
        "width": width,
        "height": h,
        "n_pixels": n,
        "mean_rgb": (sr // n) * 65536 + (sg // n) * 256 + (sb // n),
    }


def _image_features(df: DataFrame, key_col: str, media_col: str, decode) -> DataFrame:
    """Shared mapInPandas plumbing for the real image codecs (BMP, PNG):
    only the per-payload ``decode`` differs; the Arrow-batched stage,
    schema, and narrow no-shuffle 100 TB shape are identical."""
    media_df = df.select(
        F.col(key_col).alias("doc_id"), F.col(media_col).alias("media")
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(p)
                d = decode(payload)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(payload),
                        "content_md5": hashlib.md5(payload).hexdigest(),
                        **d,
                    }
                )
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(feats, REAL_IMAGE_SCHEMA)


def real_image_features(
    df: DataFrame, key_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """mapInPandas REAL image feature extraction over BMP payloads —
    same Arrow-batched plumbing as ``real_audio_features``."""
    return _image_features(df, key_col, media_col, real_image_decode)


# ---------------------------------------------- perceptual-hash image dedup
def _bmp_pixel_rows(payload: bytes) -> list[list[tuple[int, int, int]]]:
    """Top-down (r, g, b) pixel rows from a 24-bit uncompressed BMP —
    the pixel-returning sibling of ``real_image_decode`` (same header
    walk, same honest refusals)."""
    import struct

    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    (_hdr, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            "only 24-bit uncompressed BMP is decodable without external codecs"
        )
    top_down = height < 0
    h = abs(height)
    row_stride = (width * 3 + 3) // 4 * 4
    rows = []
    for row_i in range(h):
        src_row = row_i if top_down else h - 1 - row_i
        base = offset + src_row * row_stride
        row = []
        for x in range(width):
            b, g, r = struct.unpack_from("<3B", payload, base + x * 3)
            row.append((r, g, b))
        rows.append(row)
    return rows


def image_pixel_rows(payload: bytes) -> list[list[tuple[int, int, int]]]:
    """Container-dispatched RGB pixel rows — the pixel counterpart of
    ``real_decode``'s metadata dispatch, so content-level operators
    (pHash dedup) see THE SAME pixel grid whether the bytes arrived as
    BMP, PNG, or GIF. Honest refusals for everything else (JPEG/MP3
    pixel extraction would need the DCT path's pixel plumbing; the
    class of formats the codec module already refuses stays refused).

    PNG support here: 8-bit truecolor (2), grayscale (0), and palette
    (3) — the fixture-exercised layouts; alpha/16-bit/sub-byte rows
    decode for MEANS in real_png_decode but are refused for pixel
    reconstruction rather than silently dropped channels."""
    if payload[:2] == b"BM":
        return _bmp_pixel_rows(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        d = real_png_decode(payload, with_pixels=True)
        w, h, raw = d["width"], d["height"], d["pixels"]
        ctype, depth, palette = d["ctype"], d["depth"], d["palette"]
        stride = len(raw) // h
        if ctype == 2 and depth == 8:
            return [
                [
                    (
                        raw[y * stride + 3 * x],
                        raw[y * stride + 3 * x + 1],
                        raw[y * stride + 3 * x + 2],
                    )
                    for x in range(w)
                ]
                for y in range(h)
            ]
        if ctype == 0 and depth == 8:
            return [
                [(raw[y * stride + x],) * 3 for x in range(w)]
                for y in range(h)
            ]
        if ctype == 3 and depth == 8:
            return [
                [palette[raw[y * stride + x]] for x in range(w)]
                for y in range(h)
            ]
        raise NotImplementedError(
            f"pixel reconstruction for PNG ctype={ctype} depth={depth} "
            "not supported (means-only decode path handles it)"
        )
    if payload[:6] in (b"GIF89a", b"GIF87a"):
        d = real_gif_decode(payload, with_pixels=True)
        w, h, raw, palette = d["width"], d["height"], d["pixels"], d["palette"]
        return [
            [palette[raw[y * w + x]] for x in range(w)] for y in range(h)
        ]
    raise NotImplementedError(
        "pixel extraction supports BMP/PNG/GIF; JPEG needs the DCT "
        "pixel path and other containers need external codecs"
    )


def dhash_from_rows(
    rows: list[list[tuple[int, int, int]]], hash_size: int = 8
) -> str:
    """Difference hash (dHash) of an RGB pixel grid as a bit string —
    pure integer math shared by the Spark operator and the oracle
    builder, so both engines pin the identical value.

    Spec: ITU-R BT.601 integer luma ``(299r + 587g + 114b) // 1000``;
    box-downsample to (hash_size+1) columns × hash_size rows with
    floor-division cell boundaries (every cell ≥ 1 px, so any image
    size works); bit (gy, gx) = 1 iff cell[gy][gx] > cell[gy][gx+1].
    Uniform brightness shifts cancel exactly (every luma and therefore
    every box mean shifts by the same integer), which is why the hash
    pairs a re-exposed copy with its original."""
    lu = [
        [(299 * r + 587 * g + 114 * b) // 1000 for (r, g, b) in row]
        for row in rows
    ]
    h, w = len(lu), len(lu[0])
    gw = hash_size + 1
    cells = []
    for gy in range(hash_size):
        y0 = gy * h // hash_size
        y1 = min(max(y0 + 1, (gy + 1) * h // hash_size), h)
        crow = []
        for gx in range(gw):
            x0 = gx * w // gw
            x1 = min(max(x0 + 1, (gx + 1) * w // gw), w)
            s = sum(lu[y][x] for y in range(y0, y1) for x in range(x0, x1))
            crow.append(s // ((y1 - y0) * (x1 - x0)))
        cells.append(crow)
    return "".join(
        "1" if cells[gy][gx] > cells[gy][gx + 1] else "0"
        for gy in range(hash_size)
        for gx in range(hash_size)
    )


def real_image_dhash(
    df: DataFrame,
    key_col: str = "doc_id",
    media_col: str = "media",
    hash_size: int = 8,
) -> DataFrame:
    """mapInPandas perceptual hash over BMP/PNG/GIF payloads
    (``image_pixel_rows`` dispatches on container magic): genuine pixel
    decode → dHash bit string. Narrow (key, media) in, (key, 64-char
    string) out — media bytes never shuffle, the same 100 TB shape as
    the other real codecs. Because the hash sees the PIXELS, the same
    image packed in different containers hashes identically — the
    cross-format dedup a byte-level digest can never see."""
    media_df = df.select(
        F.col(key_col).alias("key"), F.col(media_col).alias("media")
    )

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, fps = [], []
            for key, p in zip(pdf["key"], pdf["media"]):
                keys.append(key)
                fps.append(
                    dhash_from_rows(image_pixel_rows(bytes(p)), hash_size)
                )
            yield pd.DataFrame({"key": keys, "dhash": fps})

    return media_df.mapInPandas(hashes, "key long, dhash string")


def _hamming_dedup_tail(
    fps: DataFrame,
    bits: int,
    radius: int,
    bands: int,
    max_bucket_size: int | None,
) -> DataFrame:
    """Shared fingerprint→clusters tail for the perceptual-dedup family
    (image dHash, audio energy-dHash): Hamming-banded pairs → CC →
    keep-minimum-key. Guarantee check lives here: radius ≤ bands−1 or
    the banding could silently miss pairs."""
    from .dedup import connected_components, hamming_banded_pairs

    if radius > bands - 1:
        raise ValueError(
            f"radius {radius} exceeds the banding guarantee (bands - 1 = "
            f"{bands - 1}): pairs beyond it could be silently missed"
        )
    pairs = hamming_banded_pairs(
        fps, "fp", "key", bits=bits, bands=bands, radius=radius,
        max_bucket_size=max_bucket_size,
    )
    cc = connected_components(pairs.select("id_a", "id_b"))
    return (
        fps.join(
            cc.select(F.col("node").alias("key"), "cluster_id"), "key", "left"
        )
        .select(
            "key",
            "fp",
            F.coalesce(F.col("cluster_id"), F.col("key")).alias("keep_id"),
            F.when(
                F.col("cluster_id").isNotNull()
                & (F.col("cluster_id") != F.col("key")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_dup"),
        )
    )


def image_phash_dedup(
    df: DataFrame,
    key_col: str = "doc_id",
    media_col: str = "media",
    hash_size: int = 8,
    radius: int = 7,
    bands: int = 8,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Image-content near-dup: dHash over the decoded pixels →
    Hamming-banded candidate pairs → connected components → keep the
    minimum key per cluster. The multimodal counterpart of SemDeDup /
    MinHash text dedup — content-granularity dedup the reference's
    key-equality MERGE can't see (extractor_bq_helpers.py:159-169).

    Completeness: with ``bands`` bands of bits/bands bits, any pair
    within Hamming distance < bands shares an identical band
    (pigeonhole), so radius ≤ bands−1 has zero candidate misses and the
    banded result EQUALS the brute-force spec the oracle computes.

    Returns (key, dhash, keep_id, is_dup): singletons keep themselves;
    within a cluster the minimum key survives.

    At 100 TB: the decode is one Arrow crossing; pairs are generated
    band-bucket-locally ((band_no, band_bits, key)-only shuffle) with
    the standard mega-bucket cap, never n²; CC is the shared pointer-
    jumping operator."""
    fps = real_image_dhash(df, key_col, media_col, hash_size).select(
        "key", F.col("dhash").alias("fp")
    )
    out = _hamming_dedup_tail(
        fps, hash_size * hash_size, radius, bands, max_bucket_size
    )
    return out.select("key", F.col("fp").alias("dhash"), "keep_id", "is_dup")


def _wav_samples(payload: bytes) -> tuple[int, list[int]]:
    """(n_channels, interleaved 16-bit samples) from a WAV payload —
    the sample-returning sibling of ``real_audio_decode`` (same stdlib
    ``wave`` walk, same 16-bit-only refusal)."""
    import array
    import io
    import sys
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        n_ch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                "only 16-bit PCM WAV is decodable without external codecs"
            )
        raw = w.readframes(w.getnframes())
    samples = array.array("h")
    samples.frombytes(raw)
    if sys.byteorder == "big":
        samples.byteswap()
    return n_ch, list(samples)


def audio_fingerprint_from_samples(
    samples: list[int], n_channels: int, n_windows: int = 65
) -> str:
    """Temporal-energy dHash of a PCM clip as a bit string — the audio
    analog of ``dhash_from_rows``, pure integer math shared by the Spark
    operator and the oracle builder.

    Spec: mono-mix each frame (channel SUM — a stereo clip duplicating
    its mono source scales every frame by exactly 2); split the frame
    axis into ``n_windows`` floor-bounded windows; window energy =
    Σ|frame|; bit w = 1 iff sum[w]·cnt[w+1] > sum[w+1]·cnt[w] (cross-
    multiplied means — exact integers, so an exactly-volume-scaled copy
    fingerprints IDENTICALLY: both sides of every comparison scale by
    the same factor, ties stay ties). Sample-rate metadata is ignored —
    the fingerprint sees content, so a re-headered re-encode matches."""
    if n_channels > 1:
        frames = [
            sum(samples[i * n_channels : (i + 1) * n_channels])
            for i in range(len(samples) // n_channels)
        ]
    else:
        frames = list(samples)
    n = len(frames)
    sums, cnts = [], []
    for w in range(n_windows):
        x0 = w * n // n_windows
        x1 = min(max(x0 + 1, (w + 1) * n // n_windows), n)
        sums.append(sum(abs(frames[i]) for i in range(x0, x1)))
        cnts.append(x1 - x0)
    return "".join(
        "1" if sums[w] * cnts[w + 1] > sums[w + 1] * cnts[w] else "0"
        for w in range(n_windows - 1)
    )


def real_audio_fingerprint(
    df: DataFrame,
    key_col: str = "doc_id",
    media_col: str = "media",
    n_windows: int = 65,
) -> DataFrame:
    """mapInPandas audio fingerprint over WAV payloads: genuine PCM
    decode → 64-bit temporal-energy dHash. Same narrow no-shuffle shape
    as the other real codecs."""
    media_df = df.select(
        F.col(key_col).alias("key"), F.col(media_col).alias("media")
    )

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, out = [], []
            for key, p in zip(pdf["key"], pdf["media"]):
                n_ch, samples = _wav_samples(bytes(p))
                keys.append(key)
                out.append(
                    audio_fingerprint_from_samples(samples, n_ch, n_windows)
                )
            yield pd.DataFrame({"key": keys, "fp": out})

    return media_df.mapInPandas(fps, "key long, fp string")


def audio_fp_dedup(
    df: DataFrame,
    key_col: str = "doc_id",
    media_col: str = "media",
    n_windows: int = 65,
    radius: int = 7,
    bands: int = 8,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Audio-content near-dup: temporal-energy dHash over decoded PCM →
    Hamming-banded pairs → CC → keep-one — the third modality of the
    perceptual-dedup family (text SemDeDup/MinHash, image pHash, now
    audio). A volume-scaled, re-headered, or stereo-duplicated copy of a
    clip clusters with its original; byte digests see four distinct
    files. Same completeness guarantee and 100 TB shape as
    ``image_phash_dedup`` (shared ``_hamming_dedup_tail``)."""
    fps = real_audio_fingerprint(df, key_col, media_col, n_windows)
    return _hamming_dedup_tail(
        fps, n_windows - 1, radius, bands, max_bucket_size
    )


def audio_fp_fixture_clips() -> list[dict]:
    """Audio-dedup fixtures: five block-envelope noise clips (8-frame
    md5 envelope blocks over a small triangle residual — window energies
    contrast strongly, so fingerprints are stable, not knife-edge) plus
    content-level duplicates of two of them:

      * 10: base 0 re-headered at a different sample_rate (payload md5
        differs; samples identical → Hamming 0, the fingerprint ignores
        rate metadata)
      * 11: base 0 at exactly 2× volume (Hamming 0 by the cross-
        multiplied-comparison argument)
      * 12: base 1 truncated by 4 frames (measured Hamming 6 — the
        nonzero-distance case the banding must recover)
      * 13: base 2 duplicated to stereo (mono mix = exact 2× → Hamming 0
        — cross-channel-layout dedup)

    Expected ``fp`` computed from the raw sample lists (pre-pack)."""
    import hashlib as _hl

    def noise_clip(cid: int, n_frames: int = 2080, block: int = 8):
        out = []
        for i in range(n_frames):
            hx = _hl.md5(f"{cid}:{i // block}".encode()).hexdigest()
            amp = 200 + int(hx[0:3], 16) % 7800
            sign = 1 if int(hx[3], 16) % 2 == 0 else -1
            out.append(sign * amp + (i % 7) - 3)
        return out

    bases = {i: noise_clip(i) for i in range(5)}
    variants: list[tuple[int, list[int], int, int]] = [
        (i, s, 1, 16000) for i, s in bases.items()
    ]
    variants.append((10, bases[0], 1, 8000))  # re-headered rate
    variants.append((11, [s * 2 for s in bases[0]], 1, 16000))  # 2x volume
    variants.append((12, bases[1][:-4], 1, 16000))  # 4-frame truncation
    stereo = [s for x in bases[2] for s in (x, x)]
    variants.append((13, stereo, 2, 16000))  # stereo duplicate
    return [
        {
            "clip_id": cid,
            "payload": _pack_wav(sr, n_ch, samples),
            "fp": audio_fingerprint_from_samples(samples, n_ch),
        }
        for cid, samples, n_ch, sr in variants
    ]


def _pack_gif_anim(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[list[list[int]]],
    with_gce: bool = False,
) -> bytes:
    """Hand-pack a multi-frame (animated) GIF89a: one global color
    table, then per frame an optional Graphic Control Extension and a
    full-canvas image descriptor with genuinely LZW-compressed data —
    the animation layout ``real_gif_frames`` walks. Same independent-
    implementation rationale as ``_pack_gif``."""
    import struct

    bits = max(2, (len(palette) - 1).bit_length())
    pal = palette + [(0, 0, 0)] * ((1 << bits) - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    out += b"".join(bytes(c) for c in pal)
    min_code = max(2, bits)
    for index_rows in frames:
        if with_gce:  # delay 4/100 s, no transparency, no disposal
            out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(min_code)
        data = _gif_lzw_encode(
            bytes(i for row in index_rows for i in row), min_code
        )
        for off in range(0, len(data), 255):
            blk = data[off : off + 255]
            out.append(len(blk))
            out += blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


@_codec_guard("GIF")
def real_gif_frames(payload: bytes) -> dict:
    """GENUINE multi-frame GIF decode: walks EVERY image descriptor of
    an animation (the single-frame ``real_gif_decode`` honestly refuses
    them), LZW-decoding each frame and resolving indices through its
    local-or-global palette. Supported subset, refusals explicit:
    full-canvas opaque frames only — a frame that is offset, smaller
    than the logical screen, or transparency-flagged composites onto the
    PREVIOUS canvas under a disposal method this decoder does not model,
    and mis-decoding an animation is worse than refusing it. Interlaced
    frames are deinterlaced per pass order.

    Returns {width, height, n_frames, frames: [rows of (r, g, b)]}."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")
    try:
        sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = [
                (payload[pos + 3 * i], payload[pos + 3 * i + 1],
                 payload[pos + 3 * i + 2])
                for i in range(n)
            ]
            pos += 3 * n
        frames: list[list[list[tuple[int, int, int]]]] = []
        while payload[pos] != 0x3B:
            if payload[pos] == 0x21:  # extension block
                label = payload[pos + 1]
                if label == 0xF9 and payload[pos + 2] >= 1:
                    if payload[pos + 3] & 0x01:
                        raise NotImplementedError(
                            "transparent GIF frame composites onto the "
                            "previous canvas — refused, not mis-decoded"
                        )
                pos += 2
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
                continue
            if payload[pos] != 0x2C:
                raise ValueError("unexpected GIF block")
            _l, _t, width, height, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            if _l != 0 or _t != 0 or width != sw or height != sh:
                raise NotImplementedError(
                    "GIF frame offset/smaller than logical screen"
                )
            palette = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                palette = [
                    (payload[pos + 3 * i], payload[pos + 3 * i + 1],
                     payload[pos + 3 * i + 2])
                    for i in range(n)
                ]
                pos += 3 * n
            if palette is None:
                raise ValueError("GIF has neither global nor local color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            pixels = bytearray(_gif_lzw_decode(bytes(data), min_code))
            if len(pixels) != width * height:
                raise ValueError("GIF pixel count mismatch")
            if ipacked & 0x40:
                ordered = bytearray(len(pixels))
                for src, y in enumerate(_gif_interlace_order(height)):
                    ordered[y * width : (y + 1) * width] = pixels[
                        src * width : (src + 1) * width
                    ]
                pixels = ordered
            frames.append(
                [
                    [palette[pixels[y * width + x]] for x in range(width)]
                    for y in range(height)
                ]
            )
    except IndexError as e:
        raise ValueError("truncated GIF stream") from e
    if not frames:
        raise ValueError("GIF contains no image descriptor")
    return {
        "width": sw,
        "height": sh,
        "n_frames": len(frames),
        "frames": frames,
    }


def real_video_frame_dhash(
    df: DataFrame,
    key_col: str = "doc_id",
    media_col: str = "media",
    frame_stride: int = 1,
    hash_size: int = 8,
) -> DataFrame:
    """mapInPandas per-frame perceptual hash over animated-GIF payloads:
    decode every ``frame_stride``-th frame → dHash each. One Arrow
    crossing; output is the narrow (key, frame_no, fp) relation the
    video dedup consumes — media bytes never shuffle, frame hashes do."""
    media_df = df.select(
        F.col(key_col).alias("key"), F.col(media_col).alias("media")
    )

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, fnos, fps = [], [], []
            for key, p in zip(pdf["key"], pdf["media"]):
                d = real_gif_frames(bytes(p))
                for fno in range(0, d["n_frames"], frame_stride):
                    keys.append(key)
                    fnos.append(fno)
                    fps.append(dhash_from_rows(d["frames"][fno], hash_size))
            yield pd.DataFrame(
                {"key": keys, "frame_no": fnos, "fp": fps}
            )

    return media_df.mapInPandas(hashes, "key long, frame_no int, fp string")


def video_phash_dedup(
    df: DataFrame,
    key_col: str = "doc_id",
    media_col: str = "media",
    frame_stride: int = 1,
    min_matching_frames: int = 4,
    hash_size: int = 8,
    radius: int = 5,
    bands: int = 8,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Video-content near-dup via sampled-frame perceptual hashing — the
    VIDEO member of the perceptual-dedup family (text, image, audio,
    now video): two videos are near-duplicates when at least
    ``min_matching_frames`` cross-video frame pairs sit within Hamming
    ``radius``; duplicate groups close under CC and the minimum key
    survives. A re-encoded or head-trimmed copy clusters with its
    original; unrelated videos share no frames.

    Spec (deterministic, oracle-mirrored): frame hashes ride a composite
    key ``key·10^6 + frame_no`` through the SAME banded Hamming pair
    machinery as image/audio (complete for radius ≤ bands−1); composite
    ordering puts every cross-video pair as (lower video, higher video),
    same-video pairs are discarded, and the match count per video pair
    is the number of matched frame PAIRS.

    At 100 TB: frames fan out at the stride, hashes are 64-bit strings,
    and everything after the one decode crossing shuffles (band_key,
    composite-key) ints — the video bytes stay columnar at rest."""
    if frame_stride < 1:
        raise ValueError("frame_stride must be >= 1")
    from .dedup import connected_components, hamming_banded_pairs

    if radius > bands - 1:
        raise ValueError(
            f"radius {radius} exceeds the banding guarantee (bands - 1 = "
            f"{bands - 1}): pairs beyond it could be silently missed"
        )
    fps = real_video_frame_dhash(df, key_col, media_col, frame_stride, hash_size)
    composite = fps.select(
        (F.col("key") * F.lit(1_000_000) + F.col("frame_no")).alias("key"),
        "fp",
    )
    pairs = hamming_banded_pairs(
        composite, "fp", "key", bits=hash_size * hash_size,
        bands=bands, radius=radius, max_bucket_size=max_bucket_size,
    )
    vpairs = (
        pairs.select(
            F.floor(F.col("id_a") / 1_000_000).cast("long").alias("vid_a"),
            F.floor(F.col("id_b") / 1_000_000).cast("long").alias("vid_b"),
        )
        .where(F.col("vid_a") != F.col("vid_b"))
        .groupBy("vid_a", "vid_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_frame_matches"))
        .where(F.col("n_frame_matches") >= min_matching_frames)
    )
    cc = connected_components(vpairs.select(
        F.col("vid_a").alias("id_a"), F.col("vid_b").alias("id_b")
    ))
    vids = fps.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames")
    )
    return (
        vids.join(
            cc.select(F.col("node").alias("key"), "cluster_id"), "key", "left"
        )
        .select(
            "key",
            "n_frames",
            F.coalesce(F.col("cluster_id"), F.col("key")).alias("keep_id"),
            F.when(
                F.col("cluster_id").isNotNull()
                & (F.col("cluster_id") != F.col("key")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_dup"),
        )
    )


def video_fixture_clips() -> list[dict]:
    """Video-dedup fixtures: four 8-frame 20×16 animated GIFs (4×4
    md5-noise blocks keyed (video, frame, block) — every frame of every
    video is far from every other in dHash space) plus:

      * 10: re-encode of video 0 with per-frame GCEs inserted (payload
        bytes differ, pixels identical → all 8 frames match)
      * 11: video 1 with its FIRST frame trimmed (7 of 8 frames match
        exactly at shifted positions — matching is on frame CONTENT,
        not frame index)

    Expected per-frame dHashes computed from the raw pixel ROWS
    (pre-pack), so the oracle pins the animated pack→decode round trip."""
    import hashlib as _hl

    W, H, NF, BLOCK = 20, 16, 8, 4

    def frame_rows(vid: int, fno: int):
        rows = []
        for y in range(H):
            row = []
            for x in range(W):
                hx = _hl.md5(
                    f"v{vid}:f{fno}:{x // BLOCK}:{y // BLOCK}".encode()
                ).hexdigest()
                row.append(
                    (int(hx[0:2], 16), int(hx[2:4], 16), int(hx[4:6], 16))
                )
            rows.append(row)
        return rows

    def gif_of(frames_rows):
        colors = sorted({p for fr in frames_rows for row in fr for p in row})
        cidx = {c: i for i, c in enumerate(colors)}
        return colors, [
            [[cidx[p] for p in row] for row in fr] for fr in frames_rows
        ]

    out = []
    base_frames = {
        vid: [frame_rows(vid, f) for f in range(NF)] for vid in range(4)
    }
    for vid, frames in base_frames.items():
        pal, idx = gif_of(frames)
        out.append((vid, frames, _pack_gif_anim(W, H, pal, idx)))
    pal0, idx0 = gif_of(base_frames[0])
    out.append((10, base_frames[0], _pack_gif_anim(W, H, pal0, idx0, with_gce=True)))
    trimmed = base_frames[1][1:]
    pal1, idx1 = gif_of(trimmed)
    out.append((11, trimmed, _pack_gif_anim(W, H, pal1, idx1)))
    return [
        {
            "video_id": vid,
            "payload": payload,
            "frame_dhashes": [dhash_from_rows(fr) for fr in frames],
        }
        for vid, frames, payload in out
    ]


def phash_fixture_images() -> list[dict]:
    """Deterministic pHash-dedup fixtures: five 4×4-block md5-noise base
    images (36×24, channel values 16-239 so brightness shifts never
    clamp) plus content-level duplicates of two of them —

      * 10: byte-level re-encode of base 0 (trailing junk byte: payload
        md5 differs, pixels identical → Hamming 0)
      * 11: base 0 with +4 uniform brightness (Hamming 0 by the exact
        shift-cancellation argument in ``dhash_from_rows``)
      * 12: base 0 with the left pixel column cropped (Hamming 0 at this
        block size — boundary shifts stay inside the boxes)
      * 13: base 1 with the bottom pixel row cropped (measured Hamming 6
        — the nonzero-distance case the banding must recover)
      * 14: base 0 RE-PACKED AS PNG (truecolor, filter-cycled scanlines)
      * 15: base 2 RE-PACKED AS GIF (LZW, 54-color palette) — 14/15 pin
        the CROSS-FORMAT pairing: same pixels, different container,
        Hamming 0 to their BMP originals

    Expected ``dhash`` is computed from the raw pixel ROWS (pre-pack),
    so the oracle pins the pack→decode round trip of every container."""
    import hashlib as _hl

    def noise_rows(iid: int, w: int, h: int, block: int = 4):
        lo, hi = 16, 239
        span = hi - lo + 1
        rows = []
        for y in range(h):
            row = []
            for x in range(w):
                hx = _hl.md5(f"{iid}:{x // block}:{y // block}".encode()).hexdigest()
                row.append(
                    (
                        lo + int(hx[0:2], 16) % span,
                        lo + int(hx[2:4], 16) % span,
                        lo + int(hx[4:6], 16) % span,
                    )
                )
            rows.append(row)
        return rows

    bases = {i: noise_rows(i, 36, 24) for i in range(5)}
    variants: list[tuple[int, list, bytes]] = []
    for iid, rows in bases.items():
        variants.append((iid, rows, _pack_bmp(len(rows[0]), len(rows), rows)))
    re_enc = _pack_bmp(36, 24, bases[0]) + b"\x00"  # trailing byte ignored
    variants.append((10, bases[0], re_enc))
    bright = [[(r + 4, g + 4, b + 4) for (r, g, b) in row] for row in bases[0]]
    variants.append((11, bright, _pack_bmp(36, 24, bright)))
    crop_col = [row[1:] for row in bases[0]]
    variants.append((12, crop_col, _pack_bmp(35, 24, crop_col)))
    crop_row = bases[1][:-1]
    variants.append((13, crop_row, _pack_bmp(36, 23, crop_row)))
    variants.append((14, bases[0], _pack_png(36, 24, bases[0], ctype=2)))
    colors = sorted({p for row in bases[2] for p in row})
    cidx = {c: i for i, c in enumerate(colors)}
    variants.append(
        (
            15,
            bases[2],
            _pack_gif(36, 24, colors, [[cidx[p] for p in row] for row in bases[2]]),
        )
    )
    return [
        {
            "img_id": iid,
            "payload": payload,
            "dhash": dhash_from_rows(rows),
        }
        for iid, rows, payload in variants
    ]


# ------------------------------------------------------- real PNG decode
def _pack_png(
    width: int,
    height: int,
    rows: list,
    ctype: int = 2,
    palette: list[tuple[int, int, int]] | None = None,
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """Hand-pack an 8/16-bit PNG: per-scanline filter bytes CYCLING through
    all five filter types (None/Sub/Up/Average/Paeth) so the reader's
    defiltering is genuinely exercised, zlib-compressed IDAT,
    CRC-carrying chunks — raw ``struct``/``zlib``, independent of the
    reader for the same cross-implementation reason as
    ``_pack_wav``/``_pack_bmp``. ``ctype`` 2 (truecolor, rows of RGB
    triples), 0 (grayscale, rows of ints) or 3 (palette — rows of
    indices into ``palette``, which becomes the PLTE chunk).
    ``interlace`` emits the seven Adam7 per-pass sub-images, each
    filtered against its own prior scanline. Alpha variants: ctype 6
    (truecolor+alpha, rows of RGBA 4-tuples) and 4 (grayscale+alpha,
    rows of (gray, alpha) pairs). ``depth`` 16 packs every sample as a
    big-endian pair (values 0..65535); palette stays 8-bit per spec."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    sub = depth < 8
    bpp = 1 if sub else _PNG_BPP[ctype] * (depth // 8)
    if ctype in (2, 4, 6):
        flat_rows = [[v for px in row for v in px] for row in rows]
    else:
        flat_rows = [list(row) for row in rows]
    def bitpack(r: list[int]) -> bytes:
        # MSB-first bit packing, scanlines padded to whole bytes
        acc = bytearray((len(r) * depth + 7) // 8)
        for i, v in enumerate(r):
            bit = i * depth
            acc[bit >> 3] |= v << (8 - depth - (bit & 7))
        return bytes(acc)

    if sub:
        byte_rows = [bitpack(r) for r in flat_rows]
    elif depth == 8:
        byte_rows = [bytes(r) for r in flat_rows]
    else:
        byte_rows = [
            b"".join(struct.pack(">H", v) for v in r) for r in flat_rows
        ]
    raw = bytearray()

    def filt_image(lines: list[bytes]) -> None:
        # filters reference the RAW prior scanline OF THIS (sub-)image
        if not lines:
            return
        prior = bytes(len(lines[0]))
        for y, line in enumerate(lines):
            ft = y % 5
            filt = bytearray()
            for i in range(len(line)):
                a = line[i - bpp] if i >= bpp else 0
                up = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                x = line[i]
                if ft == 0:
                    v = x
                elif ft == 1:
                    v = (x - a) & 0xFF
                elif ft == 2:
                    v = (x - up) & 0xFF
                elif ft == 3:
                    v = (x - (a + up) // 2) & 0xFF
                else:  # Paeth
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = (
                        a if (pa <= pb and pa <= pc)
                        else (up if pb <= pc else c)
                    )
                    v = (x - pred) & 0xFF
                filt.append(v)
            raw.append(ft)
            raw.extend(filt)
            prior = line

    if interlace:
        for xoff, yoff, xstep, ystep in _PNG_ADAM7:
            if sub:  # sample-level pass rows, re-bit-packed per pass
                prows = [
                    bitpack(
                        [flat_rows[y][x] for x in range(xoff, width, xstep)]
                    )
                    for y in range(yoff, height, ystep)
                ]
            else:
                prows = [
                    b"".join(
                        byte_rows[y][x * bpp : (x + 1) * bpp]
                        for x in range(xoff, width, xstep)
                    )
                    for y in range(yoff, height, ystep)
                ]
            filt_image([s for s in prows if s])
    else:
        filt_image(byte_rows)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, ctype, 0, 0, 1 if interlace else 0
    )
    plte = (
        chunk(b"PLTE", b"".join(bytes(c) for c in palette))
        if ctype == 3
        else b""
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def png_fixture_images(n_images: int = 8) -> list[dict]:
    """Deterministic PNG fixtures (distinct gradient constants from the
    BMP set; heights ≥ 5 so every filter type 0-4 appears in each image)
    with expected features computed straight from the pixel arrays —
    independent of the decoder, so an oracle match certifies the decode.
    Three color types: truecolor (img_id 0+), grayscale (100+) and
    palette (200+, indices through a deterministic PLTE) — the gray and
    palette sets exercise the 1-byte-per-pixel defiltering stride and
    the PLTE resolution path."""
    import hashlib as _hl

    def entry(iid, payload, w, h, flat_rgb):
        n = len(flat_rgb)
        mr = sum(p[0] for p in flat_rgb) // n
        mg = sum(p[1] for p in flat_rgb) // n
        mb = sum(p[2] for p in flat_rgb) // n
        return {
            "img_id": iid,
            "payload": payload,
            "n_bytes": len(payload),
            "content_md5": _hl.md5(payload).hexdigest(),
            "width": w,
            "height": h,
            "n_pixels": n,
            "mean_rgb": mr * 65536 + mg * 256 + mb,
        }

    out = []
    for iid in range(n_images):
        w = 6 + iid
        h = 5 + iid % 3  # 5..7 rows — the packer cycles filters 0..4
        rows = [
            [
                (
                    (iid * 41 + x * 17 + y * 3) % 256,
                    (iid * 59 + x * 7 + y * 23) % 256,
                    (iid * 31 + x * 5 + y * 11) % 256,
                )
                for x in range(w)
            ]
            for y in range(h)
        ]
        out.append(
            entry(iid, _pack_png(w, h, rows), w, h,
                  [p for row in rows for p in row])
        )
    for j in range(min(n_images, 4)):
        w, h = 7 + j, 5 + j % 3
        grows = [
            [(j * 37 + x * 13 + y * 29) % 256 for x in range(w)]
            for y in range(h)
        ]
        out.append(
            entry(
                100 + j,
                _pack_png(w, h, grows, ctype=0),
                w,
                h,
                [(v, v, v) for row in grows for v in row],
            )
        )
    for j in range(min(n_images, 4)):
        w, h = 6 + j, 6 + j % 2
        pal = [
            ((k * 53 + j) % 256, (k * 97 + 2 * j) % 256, (k * 29 + 3 * j) % 256)
            for k in range(16)
        ]
        prows = [
            [(j * 11 + x * 3 + y * 7) % 16 for x in range(w)]
            for y in range(h)
        ]
        out.append(
            entry(
                200 + j,
                _pack_png(w, h, prows, ctype=3, palette=pal),
                w,
                h,
                [pal[i] for row in prows for i in row],
            )
        )
    # alpha variants: RGBA (img_id 400+) and gray+alpha (500+); means
    # are over the COLOR channels only (alpha excluded by contract)
    for j in range(min(n_images, 2)):
        w, h = 8 + j, 5 + j
        arows = [
            [
                (
                    (j * 29 + x * 13 + y * 7) % 256,
                    (j * 43 + x * 3 + y * 19) % 256,
                    (j * 67 + x * 23 + y * 11) % 256,
                    (x * 31 + y * 37) % 256,
                )
                for x in range(w)
            ]
            for y in range(h)
        ]
        out.append(
            entry(
                400 + j,
                _pack_png(w, h, arows, ctype=6),
                w,
                h,
                [p[:3] for row in arows for p in row],
            )
        )
    for j in range(min(n_images, 2)):
        w, h = 7 + j, 6 + j
        garows = [
            [((j * 31 + x * 17 + y * 3) % 256, (x * 5 + y * 41) % 256)
             for x in range(w)]
            for y in range(h)
        ]
        out.append(
            entry(
                500 + j,
                _pack_png(w, h, garows, ctype=4),
                w,
                h,
                [(p[0], p[0], p[0]) for row in garows for p in row],
            )
        )
    # 16-bit: big-endian sample pairs; the 8-bit-equivalent means use
    # each sample's HIGH byte (standard 16→8 truncation)
    for j in range(min(n_images, 2)):
        w, h = 7 + j, 5 + j
        drows = [
            [
                (
                    (j * 5147 + x * 1717 + y * 301) % 65536,
                    (j * 911 + x * 777 + y * 2311) % 65536,
                    (j * 333 + x * 515 + y * 1111) % 65536,
                )
                for x in range(w)
            ]
            for y in range(h)
        ]
        out.append(
            entry(
                600 + j,
                _pack_png(w, h, drows, depth=16),
                w,
                h,
                [(p[0] >> 8, p[1] >> 8, p[2] >> 8)
                 for row in drows for p in row],
            )
        )
    # sub-byte depths (700+): 4-bit palette, 1-bit gray, and 2-bit gray
    # packed Adam7 — bit-level scanline packing with the gray samples
    # scaled ·255/(2^d−1) in the expectations (exact: 1,3,15 divide 255)
    sub_pal = [(k * 53 % 256, k * 97 % 256, k * 29 % 256) for k in range(16)]
    for j, (depth, ctype, inter) in enumerate(
        ((4, 3, False), (1, 0, False), (2, 0, True))
    ):
        w, h = 11 + j, 6 + j
        mx = 1 << depth
        rows = [
            [(j * 5 + x * 3 + y * 7 + 1) % mx for x in range(w)]
            for y in range(h)
        ]
        if ctype == 0:
            gs = 255 // (mx - 1)
            flat = [(v * gs, v * gs, v * gs) for row in rows for v in row]
        else:
            flat = [sub_pal[v] for row in rows for v in row]
        out.append(
            entry(
                700 + j,
                _pack_png(
                    w, h, rows, ctype=ctype,
                    palette=sub_pal[:mx] if ctype == 3 else None,
                    interlace=inter, depth=depth,
                ),
                w,
                h,
                flat,
            )
        )
    # Adam7 interlaced truecolor (odd geometries so several passes are
    # partially or fully empty)
    for j in range(min(n_images, 3)):
        w, h = 9 + 4 * j, 10 + 3 * j
        rows = [
            [
                (
                    (j * 47 + x * 19 + y * 5) % 256,
                    (j * 71 + x * 11 + y * 13) % 256,
                    (j * 23 + x * 3 + y * 17) % 256,
                )
                for x in range(w)
            ]
            for y in range(h)
        ]
        out.append(
            entry(
                300 + j,
                _pack_png(w, h, rows, interlace=True),
                w,
                h,
                [p for row in rows for p in row],
            )
        )
    return out


# bytes per pixel at depth 8, by color type (0 gray, 2 RGB, 3 palette
# index, 4 gray+alpha, 6 RGBA)
_PNG_BPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 interlace passes: (xoff, yoff, xstep, ystep) per PNG spec §8.2
_PNG_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_defilter(
    raw: bytes, off: int, stride: int, height: int, bpp: int
) -> tuple[list[bytes], int]:
    """Defilter one (sub-)image of scanlines starting at ``off``:
    five-filter reconstruction per the PNG spec §9, prior-line state
    scoped to this image (each Adam7 pass filters against its own
    previous scanline). ``stride`` is the scanline byte width (for
    sub-byte depths that's ceil(width·depth/8), not width·bpp) and
    ``bpp`` the filter delta distance (min 1 byte per spec §9.2).
    Returns the decoded lines and the new offset."""
    prior = bytes(stride)
    lines: list[bytes] = []
    for _y in range(height):
        if off + 1 + stride > len(raw):
            raise ValueError("PNG scanline data length mismatch")
        ft = raw[off]
        off += 1
        line = bytearray(raw[off : off + stride])
        off += stride
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            up = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = (line[i] + a) & 0xFF
            elif ft == 2:
                v = (line[i] + up) & 0xFF
            elif ft == 3:
                v = (line[i] + (a + up) // 2) & 0xFF
            elif ft == 4:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                v = (line[i] + pred) & 0xFF
            else:
                raise ValueError(f"unknown PNG filter type {ft}")
            line[i] = v
        prior = bytes(line)
        lines.append(prior)
    return lines, off


@_codec_guard("PNG")
def real_png_decode(payload: bytes, with_pixels: bool = False) -> dict:
    """GENUINE PNG decode with stdlib ``struct`` + ``zlib``: chunk walk
    with CRC verification, IDAT inflate, and full five-filter scanline
    defiltering (None/Sub/Up/Average/Paeth per the PNG spec §9) — for
    BOTH pixel layouts: sequential and Adam7 interlaced (seven per-pass
    sub-images defiltered independently and scattered back). All five
    8-bit color types: truecolor (2), grayscale (0 — channel means over
    the replicated gray value), palette (3 — indices resolved through
    the PLTE chunk), and the alpha variants (6 RGBA / 4 gray+alpha —
    alpha participates in defiltering strides but is excluded from the
    channel means), at EVERY legal bit depth: 8, 16 (big-endian
    samples; means use each sample's high byte, the standard 16→8
    truncation) and the sub-byte 1/2/4 (MSB-first bit-packed samples,
    gray scaled ·255/(2^d−1) — exact, those factors divide 255). That
    is the complete PNG §11.2.2 static matrix; only JPEG/MP3-class
    formats genuinely need external codecs. ``with_pixels`` returns the
    row-major channel bytes — means are permutation-invariant, so tests
    use the exact layout to certify the Adam7 scatter."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG payload")
    pos = 8
    width = height = ctype = None
    palette: list[tuple[int, int, int]] | None = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        if typ == b"IHDR":
            width, height, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            legal = {  # PNG spec §11.2.2 depth/color-type combinations
                0: (1, 2, 4, 8, 16),
                2: (8, 16),
                3: (1, 2, 4, 8),
                4: (8, 16),
                6: (8, 16),
            }
            if (
                (comp, filt) != (0, 0)
                or inter not in (0, 1)
                or ctype not in legal
                or depth not in legal[ctype]
            ):
                raise NotImplementedError(
                    "illegal or unsupported PNG depth/color-type/"
                    "interlace combination"
                )
        elif typ == b"PLTE":
            if length % 3 != 0:
                raise ValueError("PNG PLTE length not a multiple of 3")
            palette = [
                (data[i], data[i + 1], data[i + 2])
                for i in range(0, length, 3)
            ]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if ctype == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    raw = zlib.decompress(bytes(idat))
    sub = depth < 8  # 1/2/4-bit: single-channel (ctype 0/3), bit-packed
    sw = max(1, depth // 8)  # bytes per sample once expanded
    bpp = 1 if sub else _PNG_BPP[ctype] * sw  # filter delta, min 1 byte

    def nbytes(npx: int) -> int:
        return (npx * depth + 7) // 8 if sub else npx * bpp

    def expand(line: bytes, npx: int) -> bytes:
        # unpack MSB-first sub-byte samples to one byte each (spec §7.2)
        mask = (1 << depth) - 1
        out = bytearray(npx)
        for i in range(npx):
            bit = i * depth
            out[i] = (line[bit >> 3] >> (8 - depth - (bit & 7))) & mask
        return bytes(out)

    pb = 1 if sub else bpp  # bytes per pixel AFTER expansion
    if inter == 0:
        if len(raw) != (nbytes(width) + 1) * height:
            raise ValueError("PNG scanline data length mismatch")
        lines, off = _png_defilter(raw, 0, nbytes(width), height, bpp)
        if sub:
            lines = [expand(ln, width) for ln in lines]
    else:  # Adam7: seven per-pass sub-images, each defiltered on its
        # own prior scanline, scattered back onto the canvas
        canvas = [bytearray(width * pb) for _ in range(height)]
        off = 0
        for xoff, yoff, xstep, ystep in _PNG_ADAM7:
            wp = (width - xoff + xstep - 1) // xstep
            hp = (height - yoff + ystep - 1) // ystep
            if wp <= 0 or hp <= 0:
                continue
            plines, off = _png_defilter(raw, off, nbytes(wp), hp, bpp)
            if sub:
                plines = [expand(pl, wp) for pl in plines]
            for j, pline in enumerate(plines):
                y = yoff + j * ystep
                row = canvas[y]
                for i in range(wp):
                    x = xoff + i * xstep
                    row[x * pb : (x + 1) * pb] = pline[
                        i * pb : (i + 1) * pb
                    ]
        if off != len(raw):
            raise ValueError("PNG scanline data length mismatch")
        lines = [bytes(r) for r in canvas]
    stride = width * pb
    # sub-byte gray scales to 8-bit exactly: 2^d−1 divides 255 for
    # d ∈ {1,2,4} (factors 255, 85, 17)
    gray_scale = 255 // ((1 << depth) - 1) if (sub and ctype == 0) else 1
    sr = sg = sb = 0
    for line in lines:
        # big-endian samples: the byte at each sample's offset 0 is the
        # high byte, i.e. the standard 16→8 truncation — so indexing at
        # channel*sw reads the 8-bit value for BOTH depths
        if ctype in (2, 6):  # RGB / RGBA — alpha excluded from means
            for x in range(0, stride, pb):
                sr += line[x]
                sg += line[x + sw]
                sb += line[x + 2 * sw]
        elif ctype in (0, 4):  # gray / gray+alpha
            for x in range(0, stride, pb):
                v = line[x] * gray_scale
                sr += v
                sg += v
                sb += v
        else:  # palette indices resolved through PLTE
            for x in range(stride):
                idx = line[x]
                if idx >= len(palette):
                    raise ValueError("PNG palette index out of range")
                r, g, b = palette[idx]
                sr += r
                sg += g
                sb += b
    n = width * height
    out_d = {
        "width": width,
        "height": height,
        "n_pixels": n,
        "mean_rgb": (sr // n) * 65536 + (sg // n) * 256 + (sb // n),
    }
    if with_pixels:
        out_d["pixels"] = b"".join(lines)
        # layout metadata so pixel consumers (image_pixel_rows → pHash)
        # can reconstruct RGB without re-walking the chunk stream
        out_d["ctype"] = ctype
        out_d["depth"] = depth
        out_d["palette"] = palette
    return out_d


def real_png_features(
    df: DataFrame, key_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """mapInPandas REAL image feature extraction over PNG payloads —
    inflate + defilter per blob, same Arrow-batched plumbing and schema
    as the BMP path."""
    return _image_features(df, key_col, media_col, real_png_decode)


# ------------------------------------------------------- real GIF decode
# GIF87a/89a (CompuServe spec): header + logical screen descriptor,
# global/local color tables, extension-block skipping, and genuine
# variable-width LZW decompression of the image data. Non-interlaced
# single-frame only; interlaced images raise.


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW compression (variable code width, LSB-first bit
    packing, CLEAR/EOI codes) — the FIXTURE side, an independent
    implementation from the reader's decompressor. Width grows when
    ``next_code`` passes the current code space **offset by one emit**
    relative to the decoder (the decoder materializes each table entry
    one code later than the encoder does, so the encoder bumps at
    ``next_code == 2^width + 1``)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return (
            {bytes([i]): i for i in range(clear)},
            clear + 2,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    out: list[tuple[int, int]] = [(clear, width)]
    w = b""
    for ch in indices:
        wb = w + bytes([ch])
        if wb in table:
            w = wb
            continue
        out.append((table[w], width))
        table[wb] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4095:  # reset before the 12-bit space fills
            out.append((clear, width))
            table, next_code, width = fresh()
        w = bytes([ch])
    if w:
        out.append((table[w], width))
    out.append((eoi, width))
    acc = nbits = 0
    buf = bytearray()
    for code, cw in out:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(height: int) -> list[int]:
    """Row indices in GIF 4-pass interlace transmission order."""
    return [
        y
        for start, step in _GIF_INTERLACE_PASSES
        for y in range(start, height, step)
    ]


def _pack_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    index_rows: list[list[int]],
    with_gce: bool = False,
    local_palette: bool = False,
    interlaced: bool = False,
) -> bytes:
    """Hand-pack a single-frame GIF89a: logical screen descriptor with a
    global color table (or a per-image LOCAL one when ``local_palette``),
    an optional Graphic Control Extension (exercises the reader's
    extension skipping), the image descriptor, and genuinely
    LZW-compressed pixel data in ≤255-byte sub-blocks. ``interlaced``
    writes the rows in 4-pass interlace transmission order and sets the
    descriptor flag."""
    import struct

    bits = max(2, (len(palette) - 1).bit_length())
    pal = palette + [(0, 0, 0)] * ((1 << bits) - len(palette))
    pal_bytes = b"".join(bytes(c) for c in pal)
    out = bytearray(b"GIF89a")
    gct_flag = 0 if local_palette else 0x80
    out += struct.pack("<HHBBB", width, height,
                       gct_flag | (bits - 1), 0, 0)
    if not local_palette:
        out += pal_bytes
    if with_gce:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: 4-byte block + 0
        out += b"\x21\xfe\x05hello\x00"  # comment extension, 5-byte block
    ipacked = (0x80 if local_palette else 0) | (0x40 if interlaced else 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height,
                                 ipacked | ((bits - 1) if local_palette else 0))
    if local_palette:
        out += pal_bytes
    min_code = max(2, bits)
    out.append(min_code)
    rows = (
        [index_rows[y] for y in _gif_interlace_order(height)]
        if interlaced
        else index_rows
    )
    data = _gif_lzw_encode(
        bytes(i for row in rows for i in row), min_code
    )
    for off in range(0, len(data), 255):
        blk = data[off : off + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3b"
    return bytes(out)


def gif_fixture_images(n_images: int = 6) -> list[dict]:
    """Deterministic GIF fixtures: 16-color deterministic palettes,
    index gradients wide enough that the LZW code width genuinely grows
    past its initial size; fixtures cycle through extension blocks, a
    LOCAL color table, and (img_id 3+) 4-pass INTERLACED transmission,
    so every reader path is exercised. Expected features come straight
    from the palette-resolved pixel arrays."""
    import hashlib as _hl

    out = []
    for iid in range(n_images):
        w, h = 10 + 2 * iid, 7 + iid % 3
        pal = [
            ((k * 61 + iid * 5) % 256, (k * 83 + iid * 11) % 256,
             (k * 17 + iid * 23) % 256)
            for k in range(16)
        ]
        rows = [
            [(iid * 7 + x * 5 + y * 3) % 16 for x in range(w)]
            for y in range(h)
        ]
        payload = _pack_gif(
            w, h, pal, rows,
            with_gce=(iid % 3 == 1),
            local_palette=(iid % 3 == 2),
            interlaced=(iid % 3 == 0 and iid > 0),
        )
        flat = [pal[i] for row in rows for i in row]
        n = len(flat)
        mr = sum(p[0] for p in flat) // n
        mg = sum(p[1] for p in flat) // n
        mb = sum(p[2] for p in flat) // n
        out.append(
            {
                "img_id": iid,
                "payload": payload,
                "n_bytes": len(payload),
                "content_md5": _hl.md5(payload).hexdigest(),
                "width": w,
                "height": h,
                "n_pixels": n,
                "mean_rgb": mr * 65536 + mg * 256 + mb,
            }
        )
    return out


@_codec_guard("GIF")
def _gif_lzw_decode(data: bytes, min_code: int) -> bytes:
    """Spec-standard variable-width GIF LZW decompressor (CLEAR/EOI
    handling, the KwKwK first-char case, width growth at table-size
    boundaries) — shared by the single-frame summary decode and the
    multi-frame walker."""
    clear = 1 << min_code
    eoi = clear + 1
    width_bits = min_code + 1
    acc = nbits = 0
    dpos = 0
    prev: bytes | None = None
    pixels = bytearray()

    def reset_table():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = reset_table()
    while True:
        while nbits < width_bits:
            if dpos >= len(data):
                raise ValueError("GIF LZW stream exhausted before EOI")
            acc |= data[dpos] << nbits
            dpos += 1
            nbits += 8
        code = acc & ((1 << width_bits) - 1)
        acc >>= width_bits
        nbits -= width_bits
        if code == clear:
            table = reset_table()
            width_bits = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("GIF LZW code out of range")
        pixels += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width_bits) and width_bits < 12:
                width_bits += 1
        prev = entry
    return bytes(pixels)


@_codec_guard("GIF")
def real_gif_decode(payload: bytes, with_pixels: bool = False) -> dict:
    """GENUINE GIF decode with pure stdlib byte-walking: logical screen
    descriptor, global/local color tables, extension-block skipping, a
    spec-standard variable-width LZW decompressor (CLEAR/EOI handling,
    the KwKwK first-char case, width growth at table-size boundaries),
    and 4-pass deinterlacing when the descriptor flags it, then channel
    means from the palette-resolved pixels. Single-frame GIF87a/89a.
    ``with_pixels`` additionally returns the row-major palette indices —
    channel means are permutation-INVARIANT, so tests use the exact
    pixel layout to certify deinterlacing."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")
    try:
        sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = [
                (payload[pos + 3 * i], payload[pos + 3 * i + 1],
                 payload[pos + 3 * i + 2])
                for i in range(n)
            ]
            pos += 3 * n
        while payload[pos] == 0x21:  # extension blocks: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        if payload[pos] != 0x2C:
            raise ValueError("GIF image descriptor not found")
        _l, _t, width, height, ipacked = struct.unpack_from(
            "<HHHHB", payload, pos + 1
        )
        pos += 10
        # the channel means summarize the LOGICAL SCREEN; a frame that is
        # offset or smaller than it composites onto a background this
        # single-frame decoder doesn't model — refuse rather than misdecode
        if _l != 0 or _t != 0 or width != sw or height != sh:
            raise NotImplementedError(
                "GIF frame offset/smaller than logical screen"
            )
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = [
                (payload[pos + 3 * i], payload[pos + 3 * i + 1],
                 payload[pos + 3 * i + 2])
                for i in range(n)
            ]
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF has neither global nor local color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # past the frame's sub-block terminator
        # drain trailing extensions, then REQUIRE the 0x3B trailer: an
        # animated GIF's second image descriptor must refuse (frame 1
        # alone would silently mis-summarize the animation)
        while payload[pos] == 0x21:
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        if payload[pos] == 0x2C:
            raise NotImplementedError("multi-frame (animated) GIF")
        if payload[pos] != 0x3B:
            raise ValueError("GIF trailer not found")
    except IndexError as e:
        raise ValueError("truncated GIF stream") from e

    pixels = bytearray(_gif_lzw_decode(data, min_code))
    if len(pixels) != width * height:
        raise ValueError("GIF pixel count mismatch")
    if ipacked & 0x40:  # de-permute 4-pass interlace transmission order
        ordered = bytearray(len(pixels))
        for src, y in enumerate(_gif_interlace_order(height)):
            ordered[y * width : (y + 1) * width] = pixels[
                src * width : (src + 1) * width
            ]
        pixels = ordered
    sr = sg = sb = 0
    for idx in pixels:
        if idx >= len(palette):
            raise ValueError("GIF palette index out of range")
        r, g, b = palette[idx]
        sr += r
        sg += g
        sb += b
    n = width * height
    out_d = {
        "width": width,
        "height": height,
        "n_pixels": n,
        "mean_rgb": (sr // n) * 65536 + (sg // n) * 256 + (sb // n),
    }
    if with_pixels:
        out_d["pixels"] = bytes(pixels)
        out_d["palette"] = palette  # resolves the indices to RGB
    return out_d


def real_gif_features(
    df: DataFrame, key_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """mapInPandas REAL image feature extraction over GIF payloads —
    LZW decompression per blob, same Arrow-batched plumbing and schema
    as the BMP/PNG paths."""
    return _image_features(df, key_col, media_col, real_gif_decode)


# ------------------------------------------------------ real JPEG decode
# Baseline sequential JPEG (ITU T.81): marker parse, canonical Huffman
# entropy decode with byte-unstuffing, dequantization, full 2-D IDCT,
# YCbCr→RGB. 8-bit baseline 4:4:4 (or grayscale) only — progressive,
# subsampled, arithmetic-coded, and 12-bit streams raise. Fixtures are
# built so the LOSSY transform is exact for them (8×8-aligned block-
# constant components whose DC quantizes without remainder), which is
# what lets pixel-array-derived expectations certify a lossy codec.

# diagonal zigzag scan order: natural (row, col) per zigzag index
_JPEG_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    for _r in range(_s, -1, -1) if _s % 2 == 0 else range(_s + 1):
        _c = _s - _r
        if _r < 8 and _c < 8:
            _JPEG_ZIGZAG.append((_r, _c))

# encoder-side canonical tables (decoder reads whatever DHT carries):
# DC categories 0..6 at length 3 + 7 at length 4; AC: EOB only at length
# 1 — the all-ones code of every length stays reserved per T.81 C.2
_JPEG_DC_BITS = [0, 0, 7, 1] + [0] * 12
_JPEG_DC_VALS = list(range(8))
_JPEG_AC_BITS = [1] + [0] * 15
_JPEG_AC_VALS = [0x00]
_JPEG_QSTEP = 16  # uniform quant table: every entry 16


def _jpeg_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:  # pad the last byte with 1-bits
            self.put(1, 1)


def _pack_jpeg(
    block_vals: list[list[list[int]]] | list[list[tuple[int, int, int]]],
    subsample_420: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Hand-pack a baseline JFIF stream from BLOCK-CONSTANT component
    values: ``block_vals[by][bx]`` is either a (Y, Cb, Cr) triple or a
    single grayscale value per cell; every value must sit an EVEN
    offset from 128 so its DC coefficient (8·(v−128)) quantizes exactly
    by the uniform step 16 and the round trip is lossless. A cell is one
    8×8 block (4:4:4 / grayscale), or — with ``subsample_420`` — one
    16×16 MACROBLOCK (Y sampled 2×2: four identical Y blocks + one Cb +
    one Cr per MCU, the dominant real-world layout). With
    ``restart_interval`` a DRI segment is emitted and every interval MCUs
    the entropy stream is byte-aligned, an RSTm marker (m cycling 0-7)
    inserted, and DC predictors reset — the error-resilience layout
    camera JPEGs ship. Raw struct + hand-rolled Huffman/bit writer —
    independent of the reader."""
    import struct

    by_n = len(block_vals)
    bx_n = len(block_vals[0])
    gray = not isinstance(block_vals[0][0], (tuple, list))
    if gray and subsample_420:
        raise ValueError("4:2:0 needs three components")
    n_comp = 1 if gray else 3
    cell = 16 if subsample_420 else 8
    h, w = by_n * cell, bx_n * cell
    y_samp = 0x22 if subsample_420 else 0x11
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: Pq=0/Tq=0, uniform table (zigzag order is uniform too)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([_JPEG_QSTEP] * 64)
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for cid in range(1, n_comp + 1):
        sof += struct.pack(">BBB", cid, y_samp if cid == 1 else 0x11, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC class 0 id 0, AC class 1 id 0
    for cls, bits, vals in (
        (0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
        (0x10, _JPEG_AC_BITS, _JPEG_AC_VALS),
    ):
        payload = bytes([cls]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([n_comp])
    for cid in range(1, n_comp + 1):
        sos += bytes([cid, 0x00])  # DC/AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    dc_codes = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    wtr = _JpegBitWriter()
    pred = [0] * n_comp

    def put_block(comp: int, v: int) -> None:
        if (v - 128) % 2:
            raise ValueError("block value must be an even offset from 128")
        dcq = (v - 128) // 2  # round(8·(v−128) / 16), exact
        diff = dcq - pred[comp]
        pred[comp] = dcq
        s = abs(diff).bit_length()
        code, ln = dc_codes[s]
        wtr.put(code, ln)
        if s:
            wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        code, ln = ac_codes[0x00]  # EOB: all AC are zero
        wtr.put(code, ln)

    n_mcu = 0
    rst = 0
    total_mcus = by_n * bx_n
    for by in range(by_n):
        for bx in range(bx_n):
            c = block_vals[by][bx]
            if gray:
                put_block(0, c)
            elif subsample_420:
                for _ in range(4):  # four identical Y blocks per MCU
                    put_block(0, c[0])
                put_block(1, c[1])
                put_block(2, c[2])
            else:
                for comp, v in enumerate(c):
                    put_block(comp, v)
            n_mcu += 1
            if (
                restart_interval
                and n_mcu % restart_interval == 0
                and n_mcu < total_mcus
            ):
                wtr.flush()  # byte-align, pad with 1-bits
                wtr.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred[:] = [0] * n_comp
    wtr.flush()
    out += wtr.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _ycc_to_rgb(y: float, cb: float, cr: float) -> tuple[int, int, int]:
    """JFIF YCbCr→RGB (shared by decoder and fixture expectations — the
    independently-verified machinery is everything upstream of it)."""

    def clamp(x: float) -> int:
        v = int(x + 0.5) if x >= 0 else -int(-x + 0.5)
        return 0 if v < 0 else 255 if v > 255 else v

    return (
        clamp(y + 1.402 * (cr - 128.0)),
        clamp(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)),
        clamp(y + 1.772 * (cb - 128.0)),
    )


@_codec_guard("JPEG")
def real_jpeg_decode(payload: bytes) -> dict:
    """GENUINE baseline JPEG decode with stdlib ``struct``/``math``:
    marker walk, DQT/DHT parsing with canonical Huffman reconstruction,
    entropy decode (byte-unstuffed, DC prediction + AC run-length/EOB),
    dequantization, full 2-D IDCT, level shift, chroma upsampling,
    YCbCr→RGB. Baseline (SOF0) 8-bit with sampling factors up to 2×2 —
    covers 4:4:4, 4:2:2, and the dominant 4:2:0 layout (interleaved
    MCUs, nearest-neighbor chroma upsampling), plus DRI/RSTn restart
    intervals (per-segment byte alignment + DC predictor reset);
    progressive (SOF2) and arithmetic-coded streams raise — out of
    scope, not silently mis-decoded."""
    import math
    import struct

    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huffs: dict[tuple[int, int], dict] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, tq)
    width = height = 0
    restart_interval = 0
    scan_comps: list[tuple[int, int, int]] = []  # (id, td, ta)
    segments: list[bytes] = []  # entropy data, split at RSTn markers
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qtables[tq] = list(seg[off + 1 : off + 65])
                off += 65
        elif marker in (
            0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
        ):  # every non-SOF0 frame type incl. arithmetic/differential
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0) is decodable here"
            )
        elif marker == 0xC0:  # SOF0
            prec, height, width, nf = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for i in range(nf):
                cid, samp, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                if (samp >> 4) not in (1, 2) or (samp & 15) not in (1, 2):
                    raise NotImplementedError(
                        "sampling factors above 2x2 unsupported"
                    )
                comps.append((cid, samp, tq))
        elif marker == 0xC4:  # DHT (possibly several tables)
            off = 0
            while off < len(seg):
                cls, tid = seg[off] >> 4, seg[off] & 15
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                decode: dict[tuple[int, int], int] = {}
                code = 0
                k = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        decode[(ln, code)] = vals[k]
                        k += 1
                        code += 1
                    code <<= 1
                huffs[(cls, tid)] = decode
                off += 17 + n
        elif marker == 0xDD:  # DRI — restart interval in MCUs
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = seg[0]
            for i in range(ns):
                cid, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cid, tds >> 4, tds & 15))
            # unstuff entropy bytes up to the next real marker, splitting
            # restart segments at RSTn (each resumes byte-aligned)
            body = bytearray()
            while pos + 1 < len(payload):
                b = payload[pos]
                if b == 0xFF:
                    nxt = payload[pos + 1]
                    if nxt == 0x00:
                        body.append(0xFF)
                        pos += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segments.append(bytes(body))
                        body = bytearray()
                        pos += 2
                        continue
                    break  # real marker (EOI) — scan ends
                body.append(b)
                pos += 1
            segments.append(bytes(body))
            break
    if not comps or not segments or not segments[0]:
        raise ValueError("JPEG missing SOF/scan data")
    if len(scan_comps) != len(comps):
        # a legal non-interleaved multi-scan baseline stream (SOS carries
        # fewer components than SOF) — unsupported, not corrupt: refuse
        # honestly instead of KeyError-ing into 'corrupt JPEG stream'
        raise NotImplementedError(
            "non-interleaved multi-scan baseline JPEG"
        )
    if len(segments) > 1 and restart_interval == 0:
        raise ValueError(
            "RST markers present but no DRI restart interval declared"
        )

    seg_i = 0
    bitpos = 0

    def read_bit() -> int:
        nonlocal bitpos
        seg = segments[seg_i]
        if (bitpos >> 3) >= len(seg):
            raise ValueError(
                "entropy data exhausted mid-MCU (truncated stream or "
                "restart-interval mismatch)"
            )
        byte = seg[bitpos >> 3]
        bit = (byte >> (7 - (bitpos & 7))) & 1
        bitpos += 1
        return bit

    def read_bits(n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | read_bit()
        return v

    def read_huff(table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def extend(v: int, s: int) -> int:
        return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1

    cos_t = [
        [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
        for x in range(8)
    ]
    c_u = [1 / math.sqrt(2)] + [1.0] * 7
    td_ta = {cid: (td, ta) for cid, td, ta in scan_comps}
    samp_hv = [((samp >> 4), (samp & 15)) for _cid, samp, _tq in comps]
    hmax = max(sh for sh, _sv in samp_hv)
    vmax = max(sv for _sh, sv in samp_hv)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [
        [[0] * (mcux * 8 * sh) for _ in range(mcuy * 8 * sv)]
        for sh, sv in samp_hv
    ]
    pred = [0] * len(comps)

    def decode_block(ci: int, row0: int, col0: int) -> None:
        cid, _samp, tq = comps[ci]
        td, ta = td_ta[cid]
        q = qtables[tq]
        coefs = [0] * 64
        s = read_huff(huffs[(0, td)])
        pred[ci] += extend(read_bits(s), s)
        coefs[0] = pred[ci] * q[0]
        k = 1
        while k < 64:
            rs = read_huff(huffs[(1, ta)])
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            s = rs & 15
            coefs[k] = extend(read_bits(s), s) * q[k]
            k += 1
        nz = [
            (_JPEG_ZIGZAG[i][0], _JPEG_ZIGZAG[i][1], coefs[i])
            for i in range(64)
            if coefs[i]
        ]
        plane = planes[ci]
        for y in range(8):
            row = plane[row0 + y]
            for x in range(8):
                acc = 0.0
                for v, u, fv in nz:
                    acc += c_u[u] * c_u[v] * fv * cos_t[x][u] * cos_t[y][v]
                val = int(round(acc / 4 + 128))
                row[col0 + x] = 0 if val < 0 else 255 if val > 255 else val

    # interleaved MCU scan: each component contributes its h×v block grid
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                # RST boundary: next entropy segment, byte-aligned, DC
                # predictors reset (T.81 F.2.1.3.1)
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError(
                        "fewer RST segments than the DRI interval implies"
                    )
                bitpos = 0
                pred[:] = [0] * len(comps)
            for ci, (sh, sv) in enumerate(samp_hv):
                for vb in range(sv):
                    for hb in range(sh):
                        decode_block(
                            ci, (my * sv + vb) * 8, (mx * sh + hb) * 8
                        )
            n_mcu += 1
    sr = sg = sb = 0
    for y in range(height):
        for x in range(width):
            if len(comps) == 1:
                r = g = b = planes[0][y][x]
            else:
                # nearest-neighbor upsample: component sample for pixel
                # (x, y) sits at (x·sh/hmax, y·sv/vmax) in its plane
                def comp_at(ci: int) -> int:
                    sh, sv = samp_hv[ci]
                    return planes[ci][y * sv // vmax][x * sh // hmax]

                r, g, b = _ycc_to_rgb(
                    float(comp_at(0)), float(comp_at(1)), float(comp_at(2))
                )
            sr += r
            sg += g
            sb += b
    n = width * height
    return {
        "width": width,
        "height": height,
        "n_pixels": n,
        "mean_rgb": (sr // n) * 65536 + (sg // n) * 256 + (sb // n),
    }


def jpeg_fixture_images(n_images: int = 9) -> list[dict]:
    """Deterministic baseline-JPEG fixtures: block-constant (Y, Cb, Cr)
    grids — five 4:4:4 images, one grayscale, two 4:2:0 subsampled
    images (16×16 macroblock cells, four Y blocks + Cb + Cr per MCU),
    and one with a DRI restart interval of 1 MCU (three RSTm markers, m cycling) — whose values sit
    even offsets from 128, the one family for which the lossy pipeline
    is EXACT (DC quantizes without remainder, all AC vanish, constant
    chroma upsamples exactly), so expected features derive from the
    chosen component values, independent of the Huffman/DCT machinery
    under test."""
    import hashlib as _hl

    out = []
    for iid in range(n_images):
        bx_n = 2 + iid % 3
        by_n = 1 + iid % 2
        gray = iid == 5
        sub420 = iid in (6, 7)
        rst = 1 if iid == 8 else 0
        grid = []
        for by in range(by_n):
            row = []
            for bx in range(bx_n):
                y = 128 + 2 * ((iid * 7 + bx * 3 + by * 5) % 25 - 12)
                cb = 128 + 2 * ((iid * 11 + bx * 5 + by * 3) % 21 - 10)
                cr = 128 + 2 * ((iid * 13 + bx * 7 + by * 9) % 19 - 9)
                row.append(y if gray else (y, cb, cr))
            grid.append(row)
        payload = _pack_jpeg(grid, subsample_420=sub420, restart_interval=rst)
        px_per_cell = 256 if sub420 else 64
        sr = sg = sb = 0
        for row in grid:
            for cell in row:
                if gray:
                    r = g = b = cell
                else:
                    r, g, b = _ycc_to_rgb(
                        float(cell[0]), float(cell[1]), float(cell[2])
                    )
                sr += r * px_per_cell
                sg += g * px_per_cell
                sb += b * px_per_cell
        n = bx_n * by_n * px_per_cell
        side = 16 if sub420 else 8
        out.append(
            {
                "img_id": iid,
                "payload": payload,
                "n_bytes": len(payload),
                "content_md5": _hl.md5(payload).hexdigest(),
                "width": bx_n * side,
                "height": by_n * side,
                "n_pixels": n,
                "mean_rgb": (sr // n) * 65536 + (sg // n) * 256 + (sb // n),
            }
        )
    return out


def real_jpeg_features(
    df: DataFrame, key_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """mapInPandas REAL image feature extraction over baseline JPEG
    payloads — Huffman entropy decode + IDCT per blob, same Arrow-batched
    plumbing and schema as the BMP/PNG paths."""
    return _image_features(df, key_col, media_col, real_jpeg_decode)


def decode_image_meta(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature-extraction over binary media columns.

    Arrow-batched: each pandas batch holds (key, media) rows; output is the
    typed metadata struct. This is the pattern for decode / resize /
    frame-sample — only the per-payload function changes."""
    media_df = df.select(F.col(key_col).alias("doc_id"), "media")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]
            dims = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "content_md5": [
                        hashlib.md5(bytes(p)).hexdigest() for p in payloads
                    ],
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                }
            )

    return media_df.mapInPandas(extract, MEDIA_META_SCHEMA)
