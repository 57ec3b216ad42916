"""Multimodal column plumbing (EXT — SURVEY §2.3).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct alongside.  The Spark-side mechanics — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — are real and tested; the
actual media decode is STUBBED (the container ships no image/audio libs):
:func:`_decode_bytes` raises ``NotImplementedError`` when asked for a real
decoder and otherwise produces a deterministic fake derived from the
payload, so pipelines exercise the exact plumbing a real decoder would use.

Scale design: decode runs inside ``mapInPandas`` so each task streams
Arrow batches — no per-row Python, no driver involvement; batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.  Binary
payloads ride the shuffle only when explicitly selected (column pruning
drops them otherwise).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)

DECODED_SCHEMA = "doc_id bigint, n_bytes bigint, width int, height int, n_frames int"


def attach_payload(df: DataFrame, id_col: str, text_col: str, media_type: str = "image/fake") -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata struct.

    Here the payload is the utf-8 text bytes (the fixtures carry no real
    media); a real pipeline reads it from object storage with
    ``spark.read.format("binaryFile")`` and the rest of the plumbing is
    unchanged.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.xxhash64(payload).alias("checksum"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("media_meta"))


try:  # import-gated real decoder: present on real clusters, absent here
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover — container has no Pillow
    _PILImage = None

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"
# JPEG SOFn markers that carry frame dimensions (0xC0–0xCF minus the
# non-frame C4=DHT, C8=JPG-extension, CC=DAC; public JPEG/JFIF spec)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _decode_png_header(buf: bytes) -> tuple[int, int, int]:
    """Real (library-free) PNG decode: IHDR dimensions plus the APNG
    frame count.  The first chunk after the 8-byte signature is always
    IHDR with big-endian width/height at offsets 16/20; an animated PNG
    additionally carries an ``acTL`` chunk (num_frames at its first 4
    bytes) before the first IDAT (PNG/APNG specs, public) — parsed here
    so this tier reports the same n_frames Pillow's tier does for the
    same payload.  Raises ValueError on a truncated or non-IHDR stream —
    a corrupt payload must fail loudly, not fall through to the fake."""
    if len(buf) < 24 or buf[12:16] != b"IHDR":
        raise ValueError("corrupt PNG: missing IHDR")
    width = int.from_bytes(buf[16:20], "big")
    height = int.from_bytes(buf[20:24], "big")
    n_frames = 1
    pos = 8  # walk chunks: [len:4][type:4][data:len][crc:4]
    while pos + 8 <= len(buf):
        clen = int.from_bytes(buf[pos : pos + 4], "big")
        ctype = buf[pos + 4 : pos + 8]
        if ctype == b"IDAT" or ctype == b"IEND":
            break  # acTL must precede IDAT per the APNG spec
        if ctype == b"acTL" and pos + 12 <= len(buf):
            n_frames = max(1, int.from_bytes(buf[pos + 8 : pos + 12], "big"))
            break
        pos += 12 + clen
    return (width, height, n_frames)


def _decode_jpeg_header(buf: bytes) -> tuple[int, int, int]:
    """Real (library-free) JPEG decode of the SOF frame dimensions: walk
    the marker stream (each segment is FF <marker> <len:2 incl. itself>)
    to the first SOFn, whose payload is precision(1) height(2) width(2)
    big-endian (JPEG spec, public).  JPEG is single-frame (n_frames=1,
    matching Pillow).  Raises ValueError when no SOF is found — corrupt
    payloads fail loudly, same policy as the PNG tier."""
    pos = 2  # past FFD8
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            break
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker in (0x01, 0xFF):
            pos += 2  # standalone marker / fill byte, no length field
            continue
        seg_len = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        if marker in _JPEG_SOF:
            if pos + 9 > len(buf):
                break
            height = int.from_bytes(buf[pos + 5 : pos + 7], "big")
            width = int.from_bytes(buf[pos + 7 : pos + 9], "big")
            return (width, height, 1)
        pos += 2 + seg_len
    raise ValueError("corrupt JPEG: no SOF marker")


def _decode_bytes(buf: bytes, real_decoder: bool = False) -> tuple[int, int, int]:
    """Decode chain for (width, height, n_frames):

    1. Pillow when importable (real clusters) — full decode, animated
       formats report their true frame count;
    2. a library-free PNG (IHDR + APNG acTL frame count) or JPEG (SOF
       markers) header parse — real decodes of real formats, tier-
       consistent with Pillow's answers for the same payloads (APNG
       frame counts included), and what the container CAN verify
       end-to-end through the Arrow plumbing
       (tests/test_operators_multimodal.py);
    3. the deterministic fake for non-media payloads (the driver
       fixtures carry utf-8 text, which can never start with the PNG or
       JPEG magic — ``ext_multimodal_decode``'s pinned oracle is
       unchanged).

    ``real_decoder=True`` demands a real decode (tier 1 or 2) and raises
    NotImplementedError if neither applies — the documented seam for
    ffmpeg-class formats this module does not parse."""
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(buf)) as img:
                return (img.width, img.height, getattr(img, "n_frames", 1))
        except Exception:  # noqa: BLE001 — not an image: fall through
            pass
    if buf[:8] == _PNG_MAGIC:
        return _decode_png_header(buf)
    if buf[:3] == _JPEG_MAGIC:
        return _decode_jpeg_header(buf)
    if real_decoder:
        raise NotImplementedError(
            "real media decoding for this format needs PIL/ffmpeg — "
            "unavailable here; wire the full decoder at this seam"
        )
    n = len(buf)
    return (n % 640 + 1, (n // 640) % 480 + 1, n % 24 + 1)


def decode_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode payloads to (doc_id, n_bytes, width, height, n_frames).

    ``mapInPandas``: tasks receive Arrow record batches, decode in bulk,
    emit a narrow frame — the canonical shape for CPU-bound media feature
    extraction on a cluster.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_bytes(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(b) for b in pdf[payload_col]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode_batches, DECODED_SCHEMA)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", *, dim: int = 8
) -> DataFrame:
    """Feature-extraction stub: deterministic pseudo-embedding from the
    payload bytes (real seam: a vision/audio encoder batch-invoked here).

    Emits (doc_id, features array<double>) — the Arrow-batched shape a
    real encoder UDF produces; downstream similarity/dedup operators
    consume it unchanged.
    """

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(((len(b) * k) % 97) / 97.0) for k in range(1, dim + 1)]
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(
        feat_batches, "doc_id bigint, features array<double>"
    )


def resize_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    target: tuple[int, int] = (224, 224),
) -> DataFrame:
    """Resize stub: emits the payload truncated/padded to a deterministic
    length derived from the target box plus the claimed output dims —
    the byte-in/byte-out transform shape (payload stays binary through
    the pipeline; real resize slots into the marked seam)."""
    tw, th = target

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for b in pdf[payload_col]:
                raw = bytes(b)
                want = (tw * th) % 4096 + 16  # deterministic stub size
                out_bytes.append((raw * (want // max(1, len(raw)) + 1))[:want])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": out_bytes,
                    "width": pd.Series([tw] * len(pdf), dtype="int32"),
                    "height": pd.Series([th] * len(pdf), dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        resize_batches, "doc_id bigint, payload binary, width int, height int"
    )


def sample_frames(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", *, every_nth: int = 8) -> DataFrame:
    """Frame-sampling stub: emits one row per sampled frame index with a
    deterministic per-frame checksum — the row-explosion shape (one media
    row → many frame rows) that a real video pipeline produces.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, sums = [], [], []
            for doc, buf in zip(pdf[id_col], pdf[payload_col]):
                _, _, n_frames = _decode_bytes(buf)
                for fi in range(0, n_frames, every_nth):
                    ids.append(doc)
                    frames.append(fi)
                    # deterministic stand-in for the frame's pixel hash
                    sums.append(hash((len(buf), fi)) & 0x7FFFFFFF)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_index": pd.Series(frames, dtype="int32"),
                 "frame_checksum": pd.Series(sums, dtype="int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(
        frame_batches, "doc_id bigint, frame_index int, frame_checksum bigint"
    )


def extract_features_arrow(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", *, dim: int = 8
) -> DataFrame:
    """`mapInArrow` variant of :func:`extract_features`: the batch
    arrives as a pyarrow RecordBatch and the output is built with arrow
    compute — no pandas materialization at all, the lowest-overhead
    Python boundary Spark offers (one fewer copy per batch than
    mapInPandas; the shape a real vectorized encoder wants).  Emits the
    identical (doc_id, features) frame as the pandas path — equality is
    pinned in tests, so either boundary can serve the seam."""
    import pyarrow as pa

    def feat_batches(batches):
        for rb in batches:
            ids = rb.column(rb.schema.get_field_index(id_col))
            payloads = rb.column(rb.schema.get_field_index(payload_col))
            feats = [
                [float(((len(b.as_py()) * k) % 97) / 97.0) for k in range(1, dim + 1)]
                for b in payloads
            ]
            yield pa.RecordBatch.from_arrays(
                [ids.cast(pa.int64()), pa.array(feats, type=pa.list_(pa.float64()))],
                names=["doc_id", "features"],
            )

    return df.select(id_col, payload_col).mapInArrow(
        feat_batches, "doc_id bigint, features array<double>"
    )


_RIFF_MAGIC = b"RIFF"


def synth_wav_bytes(doc_id: int) -> bytes:
    """Spec-valid mono/stereo 16-bit PCM WAV bytes, deterministic in
    doc_id: sample_rate ∈ {8000, 16000, 24000}, channels ∈ {1, 2},
    n_samples = 100 + doc_id % 50, samples from a hash recurrence.
    Layout per the public RIFF/WAVE spec: "RIFF" <size> "WAVE", a
    "fmt " chunk (format=1 PCM, channels, rate, byte-rate, block-align,
    bits), then "data" <size> <pcm>."""
    import struct

    rate = 8000 * (1 + doc_id % 3)
    channels = 1 + doc_id % 2
    bits = 16
    n_samples = 100 + doc_id % 50
    block_align = channels * bits // 8
    seed = (doc_id * 2654435761) & 0xFFFFFFFF
    frames = bytearray()
    for i in range(n_samples * channels):
        seed = (seed * 1103515245 + 12345) & 0xFFFFFFFF
        frames += struct.pack("<h", (seed >> 16) - 32768)
    data = bytes(frames)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return _RIFF_MAGIC + struct.pack("<I", len(body)) + body


def _decode_wav_header(buf: bytes) -> tuple[int, int, int, int]:
    """Real (library-free) WAV metadata parse: walk RIFF chunks to
    "fmt " (channels, sample rate, bits) and "data" (n_samples =
    data_size / block_align) — public RIFF/WAVE spec, little-endian
    throughout.  Raises ValueError on truncated/non-WAVE payloads —
    corrupt audio fails loudly, same policy as the PNG/JPEG tiers.
    Returns (sample_rate, channels, bits_per_sample, n_samples)."""
    import struct

    if len(buf) < 12 or buf[:4] != _RIFF_MAGIC or buf[8:12] != b"WAVE":
        raise ValueError("corrupt WAV: not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    n_samples = None
    while pos + 8 <= len(buf):
        ctype = buf[pos : pos + 4]
        clen = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        if ctype == b"fmt " and pos + 8 + 16 <= len(buf):
            fmt = struct.unpack("<HHIIHH", buf[pos + 8 : pos + 24])
        elif ctype == b"data" and fmt is not None:
            block_align = fmt[4]
            if block_align == 0:
                raise ValueError("corrupt WAV: zero block align")
            n_samples = clen // block_align
            break
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or n_samples is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    _, channels, rate, _, _, bits = fmt
    return (rate, channels, bits, n_samples)


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, payload binary) with deterministic spec-valid WAV bytes —
    the audio twin of :func:`attach_payload` (fixtures carry no real
    media; generation and parsing are independent code paths, so the
    round-trip is a real test of both)."""
    from typing import Iterator

    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [synth_wav_bytes(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(gen, f"{id_col} long, payload binary")


def audio_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Parse WAV payloads to (id, sample_rate, channels, bits_per_sample,
    n_samples, duration_us) with the library-free RIFF walker — Arrow
    record batches through ``mapInPandas``, the same batch shape a real
    soundfile/librosa tier would use at this seam."""
    from typing import Iterator

    import pandas as pd

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                rate, channels, bits, n = _decode_wav_header(bytes(buf))
                # integer microseconds: ROUND(double) is not engine-stable
                # (docs/scale.md round-7 note; same reason pagerank is
                # integer fixed-point), floor-div on positive ints is
                rows.append(
                    (int(i), rate, channels, bits, n, n * 1_000_000 // rate)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "sample_rate",
                    "channels",
                    "bits_per_sample",
                    "n_samples",
                    "duration_us",
                ],
            )

    return df.mapInPandas(
        parse,
        f"{id_col} long, sample_rate int, channels int, bits_per_sample int, "
        "n_samples int, duration_us long",
    )


def synth_mp4_bytes(doc_id: int) -> bytes:
    """Spec-valid minimal MP4 (ISO base media file format) bytes,
    deterministic in doc_id: an `ftyp` box, a `moov` container holding an
    `mvhd` (version 0: timescale ∈ {600, 1000, 90000}, duration units =
    1200 + doc_id % 400) and 1 + doc_id % 2 `trak` containers each with a
    minimal v0 `tkhd`, then an `mdat` with 32 + doc_id % 64 hash-derived
    payload bytes.  Box layout per the public ISO/IEC 14496-12 spec:
    every box = 4-byte BIG-endian size (incl. header) + 4-byte type."""
    import struct

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    timescale = (600, 1000, 90000)[doc_id % 3]
    duration = 1200 + doc_id % 400
    n_tracks = 1 + doc_id % 2
    mvhd = (
        b"\x00\x00\x00\x00"                      # version 0 + flags
        + struct.pack(">II", 0, 0)               # creation/modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">i", 0x00010000)          # rate 1.0
        + struct.pack(">h", 0x0100)              # volume 1.0
        + b"\x00" * 10                           # reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24                           # pre_defined
        + struct.pack(">I", n_tracks + 1)        # next_track_ID
    )
    traks = b""
    for t in range(n_tracks):
        tkhd = (
            b"\x00\x00\x00\x07"                  # version 0, flags enabled
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", t + 1)           # track_ID
            + b"\x00" * 4                        # reserved
            + struct.pack(">I", duration)
            + b"\x00" * 8                        # reserved
            + struct.pack(">hhhh", 0, 0, 0, 0)   # layer/group/volume/reserved
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", 640 << 16, 360 << 16)  # width/height 16.16
        )
        traks += box(b"trak", box(b"tkhd", tkhd))
    n_payload = 32 + doc_id % 64
    seed = (doc_id * 2246822519) & 0xFFFFFFFF
    payload = bytearray()
    for _ in range(n_payload):
        seed = (seed * 1103515245 + 12345) & 0xFFFFFFFF
        payload.append(seed >> 24)
    return (
        box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
        + box(b"moov", box(b"mvhd", mvhd) + traks)
        + box(b"mdat", bytes(payload))
    )


def _decode_mp4_boxes(buf: bytes) -> tuple[int, int, int, int]:
    """Real (library-free) ISO-BMFF box walk: top-level boxes by 4-byte
    BE size + fourcc (64-bit `size==1` largesize supported per spec),
    recursion into `moov` for the `mvhd` (timescale, duration) and the
    `trak` count, `mdat` payload size collected at top level.  Raises
    ValueError on truncated boxes or a missing ftyp/moov — corrupt video
    fails loudly, same policy as the PNG/JPEG/WAV tiers.  Returns
    (timescale, duration_units, n_tracks, mdat_bytes)."""
    import struct

    def walk(data: bytes, lo: int, hi: int):
        pos = lo
        while pos < hi:
            if pos + 8 > hi:
                raise ValueError("corrupt MP4: truncated box header")
            size = int.from_bytes(data[pos : pos + 4], "big")
            btype = data[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if body + 8 > hi:
                    raise ValueError("corrupt MP4: truncated largesize")
                size = int.from_bytes(data[body : body + 8], "big")
                body += 8
            elif size == 0:  # box extends to end of enclosing container
                size = hi - pos
            if size < body - pos or pos + size > hi:
                raise ValueError("corrupt MP4: box overruns container")
            yield btype, body, pos + size
            pos += size

    have_ftyp = False
    timescale = duration = None
    n_tracks = 0
    mdat_bytes = 0
    for btype, body, end in walk(buf, 0, len(buf)):
        if btype == b"ftyp":
            have_ftyp = True
        elif btype == b"mdat":
            mdat_bytes += end - body
        elif btype == b"moov":
            for ctype, cbody, cend in walk(buf, body, end):
                if ctype == b"mvhd":
                    version = buf[cbody]
                    if version == 1:  # 64-bit times per spec
                        timescale = int.from_bytes(buf[cbody + 20 : cbody + 24], "big")
                        duration = int.from_bytes(buf[cbody + 24 : cbody + 32], "big")
                    else:
                        timescale, duration = struct.unpack(
                            ">II", buf[cbody + 12 : cbody + 20]
                        )
                elif ctype == b"trak":
                    n_tracks += 1
    if not have_ftyp or timescale is None:
        raise ValueError("corrupt MP4: missing ftyp/moov/mvhd")
    if timescale == 0:
        raise ValueError("corrupt MP4: zero timescale")
    return (timescale, duration, n_tracks, mdat_bytes)


def attach_mp4_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, payload binary) with deterministic spec-valid MP4 bytes —
    the video twin of :func:`attach_wav_payload`; generation and parsing
    are independent code paths, so the round-trip tests both."""
    from typing import Iterator

    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [synth_mp4_bytes(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(gen, f"{id_col} long, payload binary")


def video_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Parse MP4 payloads to (id, timescale, duration_units, n_tracks,
    mdat_bytes, duration_us) with the library-free box walker — Arrow
    batches through ``mapInPandas``, the batch shape a real
    ffmpeg/pyav tier would use at this seam.  Integer microseconds
    (floor-div), same engine-stability rule as the audio tier."""
    from typing import Iterator

    import pandas as pd

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                ts, dur, trk, mdat = _decode_mp4_boxes(bytes(buf))
                rows.append((int(i), ts, dur, trk, mdat, dur * 1_000_000 // ts))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "timescale",
                    "duration_units",
                    "n_tracks",
                    "mdat_bytes",
                    "duration_us",
                ],
            )

    return df.mapInPandas(
        parse,
        f"{id_col} long, timescale int, duration_units int, n_tracks int, "
        "mdat_bytes int, duration_us long",
    )
