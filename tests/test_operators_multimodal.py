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
