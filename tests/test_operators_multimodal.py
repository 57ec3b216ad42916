"""Multimodal plumbing: binary columns, Arrow batch decode, frame fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remote_shuffle_spark.operators import multimodal
from remote_shuffle_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def payloads(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    return multimodal.attach_payload(docs, "doc_id", "text"), docs


def test_attach_payload_schema_and_sizes(spark, payloads):
    with_payload, docs = payloads
    assert dict(with_payload.dtypes)["payload"] == "binary"
    meta = with_payload.select("doc_id", "media_meta.n_bytes").collect()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for r in meta:
        assert r.n_bytes == len(texts[r.doc_id].encode("utf-8"))


def test_decode_media_matches_stub_arithmetic(spark, payloads):
    with_payload, docs = payloads
    decoded = {r.doc_id: r for r in multimodal.decode_media(with_payload).collect()}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert len(decoded) == len(texts)
    for doc_id, t in texts.items():
        w, h, nf = multimodal._decode_bytes(t.encode("utf-8"))
        r = decoded[doc_id]
        assert (r.n_bytes, r.width, r.height, r.n_frames) == (len(t.encode()), w, h, nf)


def test_real_decoder_seam_is_marked(spark):
    with pytest.raises(NotImplementedError):
        multimodal._decode_bytes(b"bytes", real_decoder=True)


def test_sample_frames_fanout(spark, payloads):
    with_payload, _ = payloads
    one = with_payload.filter(F.col("doc_id") == 0)
    payload = one.collect()[0].payload
    _, _, n_frames = multimodal._decode_bytes(bytes(payload))
    frames = multimodal.sample_frames(one, every_nth=8).collect()
    assert [f.frame_index for f in frames] == list(range(0, n_frames, 8))
    assert all(f.doc_id == 0 for f in frames)


def test_extract_features_deterministic(spark, payloads):
    with_payload, docs = payloads
    feats = {r.doc_id: r.features for r in multimodal.extract_features(with_payload, dim=8).collect()}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert len(feats) == len(texts)
    for doc_id, t in texts.items():
        n = len(t.encode("utf-8"))
        expect = [((n * k) % 97) / 97.0 for k in range(1, 9)]
        assert feats[doc_id] == pytest.approx(expect)


def test_resize_media_shapes(spark, payloads):
    with_payload, _ = payloads
    out = multimodal.resize_media(with_payload.limit(10), target=(224, 224)).collect()
    want = (224 * 224) % 4096 + 16
    for r in out:
        assert len(r.payload) == want
        assert (r.width, r.height) == (224, 224)


def _tiny_png(width: int, height: int) -> bytes:
    """Build a REAL, spec-valid PNG in pure stdlib (zlib + struct): 8-bit
    grayscale, one black scanline row per pixel row."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_media_real_png_fixture(spark):
    """A real tiny PNG goes through the FULL Spark plumbing (binary column
    -> Arrow batch -> mapInPandas decode) and comes back with its true
    dimensions — the decode seam is exercised with real media, not the
    deterministic fake (which still serves the text payloads)."""
    from remote_shuffle_spark.operators.multimodal import decode_media

    png_a = _tiny_png(7, 3)
    png_b = _tiny_png(640, 480)
    df = spark.createDataFrame(
        [(1, bytearray(png_a)), (2, bytearray(png_b)), (3, bytearray(b"plain text"))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: (r.width, r.height, r.n_frames) for r in decode_media(df).collect()}
    assert got[1] == (7, 3, 1)
    assert got[2] == (640, 480, 1)
    # non-media payload: deterministic fake, unchanged contract
    n = len(b"plain text")
    assert got[3] == (n % 640 + 1, (n // 640) % 480 + 1, n % 24 + 1)


def test_decode_corrupt_png_fails_loudly():
    """A payload claiming the PNG magic but lacking IHDR must raise, not
    fall through to the fake decode."""
    import pytest as _pytest

    from remote_shuffle_spark.operators.multimodal import _decode_bytes

    with _pytest.raises(ValueError, match="corrupt PNG"):
        _decode_bytes(b"\x89PNG\r\n\x1a\n-too-short")


def _tiny_apng(width: int, height: int, n_frames: int) -> bytes:
    """Spec-valid APNG skeleton: the static PNG plus an acTL chunk
    (num_frames, num_plays) BEFORE the first IDAT (APNG spec, public)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    actl = struct.pack(">II", n_frames, 0)
    raw = b"".join(b"\x00" + b"\x00" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"acTL", actl)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _tiny_jpeg(width: int, height: int) -> bytes:
    """Build a REAL, spec-valid JPEG header stream in pure stdlib: SOI,
    APP0/JFIF, DQT, SOF0 (baseline, 1 grayscale component), EOI.  Enough
    of the marker grammar for any SOF-walking parser; no entropy data
    (the header tier never reads past SOF)."""
    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + seg(0xE0, app0)
        + seg(0xDB, dqt)
        + seg(0xC0, sof0)
        + b"\xff\xd9"
    )


def test_decode_media_real_jpeg_fixture(spark):
    """A real tiny JPEG goes through the FULL Spark plumbing (binary
    column -> Arrow batch -> mapInPandas decode) and comes back with its
    true SOF dimensions — same end-to-end guarantee as the PNG tier."""
    from remote_shuffle_spark.operators.multimodal import decode_media

    jpg_a = _tiny_jpeg(13, 9)
    jpg_b = _tiny_jpeg(1920, 1080)
    df = spark.createDataFrame(
        [(1, bytearray(jpg_a)), (2, bytearray(jpg_b))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: (r.width, r.height, r.n_frames) for r in decode_media(df).collect()}
    assert got[1] == (13, 9, 1)
    assert got[2] == (1920, 1080, 1)


def test_apng_frame_count_tier_consistent():
    """The header tier parses acTL so an animated PNG reports the SAME
    n_frames Pillow's tier would — no environment-dependent results for
    the same payload (round-5 advice)."""
    from remote_shuffle_spark.operators.multimodal import _decode_bytes

    assert _decode_bytes(_tiny_apng(5, 4, 12)) == (5, 4, 12)
    # static PNG unchanged
    assert _decode_bytes(_tiny_png(5, 4)) == (5, 4, 1)


def test_decode_corrupt_jpeg_fails_loudly():
    """A payload with the JPEG magic but no SOF marker must raise, not
    fall through to the fake decode (fail-loud policy, same as PNG)."""
    import pytest as _pytest

    from remote_shuffle_spark.operators.multimodal import _decode_bytes

    with _pytest.raises(ValueError, match="corrupt JPEG"):
        _decode_bytes(b"\xff\xd8\xff\xd9")


def test_extract_features_arrow_equals_pandas_path(spark, payloads):
    """The mapInArrow feature extractor must emit exactly what the
    mapInPandas path emits — the two Python boundaries are
    interchangeable at the seam."""
    with_payload, _ = payloads
    a = {
        r.doc_id: r.features
        for r in multimodal.extract_features_arrow(with_payload, dim=8).collect()
    }
    b = {
        r.doc_id: r.features
        for r in multimodal.extract_features(with_payload, dim=8).collect()
    }
    assert a == b and len(a) > 0


def test_wav_header_parser_agrees_with_stdlib_wave():
    """The library-free RIFF walker must report exactly what Python's
    stdlib `wave` module (independent, spec-complete reader) reports for
    the same synthesized payloads — the audio tier's ground-truth pin,
    the role Pillow plays for the image tiers."""
    import io
    import wave

    from remote_shuffle_spark.operators.multimodal import (
        _decode_wav_header,
        synth_wav_bytes,
    )

    for doc_id in (0, 1, 2, 3, 7, 49, 107, 9999):
        buf = synth_wav_bytes(doc_id)
        rate, channels, bits, n = _decode_wav_header(buf)
        w = wave.open(io.BytesIO(buf))
        assert (rate, channels, bits, n) == (
            w.getframerate(),
            w.getnchannels(),
            w.getsampwidth() * 8,
            w.getnframes(),
        ), doc_id


def test_wav_corrupt_payloads_fail_loudly():
    import pytest as _pytest

    from remote_shuffle_spark.operators.multimodal import _decode_wav_header

    for bad in (b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE", b"not audio at all"):
        with _pytest.raises(ValueError, match="corrupt WAV"):
            _decode_wav_header(bad)


def test_audio_metadata_roundtrip(spark, sf_smoke):
    """Generate → parse round-trip through the Arrow batch plumbing:
    every field equals its closed form in doc_id."""
    from remote_shuffle_spark.operators.multimodal import (
        attach_wav_payload,
        audio_metadata,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(50)
    rows = audio_metadata(attach_wav_payload(docs)).collect()
    assert len(rows) == 50
    for r in rows:
        i = r.doc_id
        assert r.sample_rate == 8000 * (1 + i % 3)
        assert r.channels == 1 + i % 2
        assert r.bits_per_sample == 16
        assert r.n_samples == 100 + i % 50
        assert r.duration_us == r.n_samples * 1_000_000 // r.sample_rate


def test_mp4_roundtrip_and_closed_form():
    from remote_shuffle_spark.operators.multimodal import (
        _decode_mp4_boxes,
        synth_mp4_bytes,
    )

    for i in (0, 1, 2, 7, 123, 399, 4096):
        ts, dur, trk, mdat = _decode_mp4_boxes(synth_mp4_bytes(i))
        assert ts == (600, 1000, 90000)[i % 3]
        assert dur == 1200 + i % 400
        assert trk == 1 + i % 2
        assert mdat == 32 + i % 64


def test_mp4_largesize_and_to_end_boxes():
    """Spec paths the synth never emits: size==1 (64-bit largesize) and
    size==0 (box extends to end of container) must both parse."""
    import struct

    from remote_shuffle_spark.operators.multimodal import (
        _decode_mp4_boxes,
        synth_mp4_bytes,
    )

    base = synth_mp4_bytes(5)
    # re-wrap the mdat payload as a largesize box + a size==0 free box
    payload = b"\xab" * 10
    large_mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 10) + payload
    tail_free = struct.pack(">I", 0) + b"free" + b"\x00" * 4
    # strip original mdat (last box) and append the exotic ones:
    # find the final mdat offset by walking top-level boxes
    pos, cut = 0, None
    while pos < len(base):
        size = int.from_bytes(base[pos : pos + 4], "big")
        if base[pos + 4 : pos + 8] == b"mdat":
            cut = pos
        if size == 0:  # to-end box: nothing can follow it
            break
        pos += size
    doctored = base[:cut] + large_mdat + tail_free
    ts, dur, trk, mdat = _decode_mp4_boxes(doctored)
    assert (ts, dur, trk) == (90000, 1205, 2)
    assert mdat == 10


def test_mp4_corrupt_fails_loud():
    import pytest

    from remote_shuffle_spark.operators.multimodal import (
        _decode_mp4_boxes,
        synth_mp4_bytes,
    )

    with pytest.raises(ValueError):
        _decode_mp4_boxes(b"\x00\x00\x00\x08junk")
    with pytest.raises(ValueError):
        _decode_mp4_boxes(synth_mp4_bytes(3)[:-5])  # truncated mdat
