"""Oracle parity on ADVERSARIAL documents — insurance against fixture
regeneration.

The driver regenerates fixtures between rounds (events.ts already changed
type once).  If a future generation includes empty / whitespace / single-
token / unicode documents, any oracle that disagrees with the Spark
operator on those edges fails the external gate.  This suite runs every
documents-reading declared query against a crafted corpus containing
exactly those shapes, using the same compare as the driver."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from remote_shuffle_spark.sources.tables import TABLES, table_path
from tests.parity import compare_frames, duckdb_connection

EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (0, "the quick brown fox jumps over the lazy dog", "en", "src0"),
    (1, "the quick brown fox jumps over the lazy dog", "en", "src1"),  # exact dup
    (2, "", "en", "src0"),                          # empty
    (3, "   \t  ", "en", "src1"),                   # whitespace-only
    (4, "solo", "en", "src0"),                      # single token
    (5, "two tokens", "en", "src1"),                # minimal bigram
    (6, "der hund ist nicht da und die katze ist da", "de", "src0"),
    (7, "Élan à la carte — naïve café über alles", "fr", "src1"),  # unicode
    (8, "的 是 了 在 我 的 是 了", "zh", "src0"),   # CJK markers
    (9, "spark query window join spark query window join", "en", "src1"),
    (10, "  The   QUICK brown  fox ", "en", "src0"),  # case/space variants of 0? (not exact dup)
    (11, "w1 w2 w3 w1 w2 w3 w1 w2 w3 w1 w2 w3", "en", "src1"),  # high repetition
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    # all non-documents tables come from the smallest real fixture
    for name in TABLES:
        if name == "documents":
            continue
        src = table_path("/root/testdata/sf0.001", name)
        shutil.copy(src, os.path.join(str(d), f"{name}.parquet"))
    docs = pd.DataFrame(
        [
            {"doc_id": i, "text": t, "lang": lang, "source": s, "n_chars": len(t)}
            for i, t, lang, s in EDGE_DOCS
        ]
    )
    docs.to_parquet(os.path.join(str(d), "documents.parquet"), index=False)
    return str(d)


def _documents_query_names() -> list[str]:
    oracles = entrymod.oracle_sql()
    return sorted(
        n for n, sql in oracles.items()
        if "documents" in sql and "embeddings" not in sql
    )


@pytest.mark.parametrize("name", _documents_query_names())
def test_documents_oracle_survives_edge_corpus(spark, edge_dir, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    con = duckdb_connection(edge_dir)
    try:
        spark_pdf = fn(spark, edge_dir).toPandas()
        oracle_pdf = con.execute(sql).df()
    finally:
        con.close()
    res = compare_frames(name, spark_pdf, oracle_pdf)
    assert res.ok, res.detail


EDGE_EMBEDDINGS = [
    # (vec_id, embedding, label) — dim 8 to keep the math visible
    (0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0),
    (1, [0.9, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0),
    (2, [0.0] * 8, 1),                                  # ZERO vector
    (3, [-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 1),  # antiparallel to 0
    (4, [1e-30] * 8, 2),                                 # denormal-ish tiny
    (5, [0.5] * 8, 2),
]

EDGE_EVENTS = [
    # (event_id, ts_us, user_id, event_type, value, props) — timestamp
    # ties, sparse users, and edge JSON (missing key, null key, empty obj)
    (0, 1_000_000_000_000_000, 1, "view", 1.0, '{"k": 5}'),
    (1, 1_000_000_000_000_000, 1, "click", 2.0, '{"k": 0}'),   # same instant as the view
    (2, 1_000_000_000_000_000, 1, "purchase", 3.0, "{}"),      # same instant; no key
    (3, 1_000_000_600_000_000, 1, "purchase", 4.0, '{"k": null}'),
    (4, 1_000_000_000_000_000, 2, "view", 5.0, '{"other": 1}'),  # single-event user
    (5, 1_000_003_600_000_000, 3, "view", 6.0, '{"k": -3}'),
    (6, 1_000_003_600_000_000, 3, "view", 6.0, '{"k": -3}'),   # full duplicate row values
    (7, 1_000_007_200_000_000, 3, "purchase", 0.0, '{"k": 9}'),
]


@pytest.fixture(scope="module")
def edge_vec_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_vec_sf")
    for name in TABLES:
        if name in ("embeddings", "events"):
            continue
        shutil.copy(
            table_path("/root/testdata/sf0.001", name),
            os.path.join(str(d), f"{name}.parquet"),
        )
    emb = pa.table(
        {
            "vec_id": pa.array([r[0] for r in EDGE_EMBEDDINGS], pa.int64()),
            "embedding": pa.array([r[1] for r in EDGE_EMBEDDINGS], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in EDGE_EMBEDDINGS], pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(str(d), "embeddings.parquet"))
    ev = pd.DataFrame(
        [
            {
                "event_id": e,
                "ts": pd.Timestamp(t, unit="us"),
                "user_id": u,
                "event_type": k,
                "value": v,
                "props": p,
            }
            for e, t, u, k, v, p in EDGE_EVENTS
        ]
    )
    ev.to_parquet(os.path.join(str(d), "events.parquet"), index=False)
    return str(d)


def _vec_event_query_names() -> list[str]:
    oracles = entrymod.oracle_sql()
    picked = set()
    for n, sql in oracles.items():
        if "embeddings" in sql or "FROM events" in sql or "JOIN events" in sql:
            picked.add(n)
    # streaming queries run real micro-batch drains — they read events via
    # the symlink stream dir and are covered by their own multi-batch
    # tests; keep this suite batch-only for runtime
    return sorted(n for n in picked if not n.startswith("ext_stream"))


@pytest.mark.parametrize("name", _vec_event_query_names())
def test_vector_event_oracle_survives_edge_fixtures(spark, edge_vec_dir, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    con = duckdb_connection(edge_vec_dir)
    try:
        spark_pdf = fn(spark, edge_vec_dir).toPandas()
        oracle_pdf = con.execute(sql).df()
    finally:
        con.close()
    res = compare_frames(name, spark_pdf, oracle_pdf)
    assert res.ok, res.detail


def test_known_engine_divergence_levenshtein_unicode(spark):
    """DOCUMENTED BOUNDARY, not a bug: DuckDB's levenshtein counts BYTES
    (lev('naïve','naive') = 2) while Spark counts CHARACTERS (= 1).  The
    fuzzy-join and q52 oracles are safe because the fixture's compared
    strings (c_name, p_name) are ASCII by generation; a fixture regen
    that introduces unicode names there will fail this sentinel first
    with a pointer instead of a bare gate hash-mismatch."""
    import duckdb

    from pyspark.sql import functions as F

    duck = duckdb.connect().execute("select levenshtein('naïve','naive')").fetchone()[0]
    spark_lev = (
        spark.range(1)
        .select(F.levenshtein(F.lit("naïve"), F.lit("naive")).alias("d"))
        .collect()[0]
        .d
    )
    assert spark_lev == 1  # characters
    assert duck == 2  # bytes — if DuckDB ever changes this, revisit the note
    # the fixture columns compared with levenshtein must remain ASCII
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    n_non_ascii = cust.filter(~F.col("c_name").rlike("^[\\x00-\\x7F]*$")).count()
    assert n_non_ascii == 0


def test_kcore_peel_empty_and_self_loop_graphs(spark):
    """k-core edge shapes: an empty edge frame yields all-zero rounds
    (no crash), and self-loops are dropped by canonicalization before
    they can inflate degrees."""
    from remote_shuffle_spark.operators.graph import kcore_peel

    empty = spark.createDataFrame([], "src long, dst long")
    rows = kcore_peel(empty, 2, rounds=2).collect()
    assert [(r.removed_vertices, r.remaining_edges) for r in rows] == [(0, 0), (0, 0)]

    loops = spark.createDataFrame(
        [(1, 1), (2, 2), (1, 2)], "src long, dst long"
    )
    rows = {r.round: r for r in kcore_peel(loops, 1, rounds=1).collect()}
    # only the 1-2 edge survives canonicalization; both endpoints degree 1
    assert rows[1].remaining_edges == 1 and rows[1].remaining_vertices == 2


def test_assign_training_shards_fewer_docs_than_shards(spark):
    """n < n_shards: every doc gets its own shard, empty shards simply
    don't appear (no crash, no modulo wrap artifacts)."""
    from remote_shuffle_spark.operators.pipeline import assign_training_shards

    df = spark.createDataFrame([(1, 5), (2, 9)], "doc_id long, w long")
    got = {
        r.doc_id: r.shard
        for r in assign_training_shards(df, "doc_id", "w", n_shards=8).collect()
    }
    assert got == {2: 0, 1: 1}  # rank 0 = heaviest (w=9) -> shard 0


def test_char_entropy_frame_empty_and_symbol_only_docs(spark):
    """Docs with no alphanumeric characters have n_chars == 0 and entropy
    0 (the empty fold), not NULL/NaN — the bucket report must not lose
    them."""
    from remote_shuffle_spark.operators.text import char_entropy_frame

    df = spark.createDataFrame(
        [(1, ""), (2, "!!! ... ???"), (3, "abc")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chars, r.entropy)
        for r in char_entropy_frame(df, "text").collect()
    }
    assert got[1] == (0, 0.0)
    assert got[2] == (0, 0.0)
    assert got[3][0] == 3 and got[3][1] > 1.0


def test_exact_substring_dedup_identical_window_within_one_doc(spark):
    """Self-repetition INSIDE one document is also deduped: the second
    occurrence of a window in the same doc is a duplicate of the first
    (keep-first is global order (doc_id, pos), not cross-doc-only)."""
    from remote_shuffle_spark.operators.dedup import exact_substring_dedup_stats

    df = spark.createDataFrame(
        [(1, "a b c a b c")], "doc_id long, text string"
    )
    (row,) = exact_substring_dedup_stats(
        df, "doc_id", "text", window_tokens=3
    ).collect()
    # windows: abc bca cab abc -> pos 3 duplicates pos 0
    assert (row.dup_windows, row.dup_tokens) == (1, 3)
