"""Property-based checks (hypothesis) for operators whose edge cases are
easy to miss with fixture data: as-of join vs pandas, Jaccard verify vs
python sets, fingerprint whitespace invariance."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(min_value=0, max_value=3)
ts_us = st.integers(min_value=0, max_value=10_000)


@SLOW
@given(
    left=st.lists(st.tuples(keys, ts_us), min_size=1, max_size=25),
    right=st.lists(st.tuples(keys, ts_us, st.floats(allow_nan=False, allow_infinity=False, width=32)), max_size=25),
)
def test_asof_join_matches_pandas(spark, left, right):
    from remote_shuffle_spark.operators.joins import asof_join

    # dedupe right on (key, ts): merge_asof picks the LAST among equal ts,
    # our operator the window-latest — pin uniqueness to make both total
    right = list({(k, t): (k, t, v) for (k, t, v) in right}.values())
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], ["lid", "k", "t_us"]
    ).select("lid", "k", F.timestamp_micros("t_us").alias("ts"))
    rdf_rows = [(k, t, float(v)) for (k, t, v) in right]
    if rdf_rows:
        rdf = spark.createDataFrame(rdf_rows, ["k", "t_us", "v"]).select(
            "k", F.timestamp_micros("t_us").alias("ts"), "v"
        )
    else:
        rdf = spark.createDataFrame([], "k int, ts timestamp, v double")
    got = {
        r.lid: r.v_asof
        for r in asof_join(ldf, rdf, on=["k"], left_ts="ts", right_ts="ts", right_values=["v"]).collect()
    }
    lp = pd.DataFrame(
        {"lid": range(len(left)), "k": pd.Series([k for k, _ in left], dtype="int64"),
         "ts": pd.to_datetime([t for _, t in left], unit="us")}
    ).sort_values("ts", kind="mergesort")
    rp = pd.DataFrame(
        {"k": pd.Series([k for k, _, _ in right], dtype="int64"),
         "ts": pd.to_datetime([t for _, t, _ in right], unit="us"),
         "v": pd.Series([v for _, _, v in right], dtype="float64")}
    ).sort_values("ts", kind="mergesort")
    expect_df = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    expect = dict(zip(expect_df["lid"], expect_df["v"]))
    assert set(got) == set(expect)
    for lid in got:
        g, e = got[lid], expect[lid]
        if pd.isna(e):
            assert g is None
        else:
            assert g is not None and abs(g - e) < 1e-9


token = st.text(alphabet="abcd", min_size=1, max_size=3)
doc = st.lists(token, min_size=1, max_size=12).map(" ".join)


@SLOW
@given(docs=st.lists(doc, min_size=2, max_size=12, unique=True))
def test_ngram_jaccard_matches_python_sets(spark, docs):
    from remote_shuffle_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0, block_prefix_tokens=1).collect()
    }
    expect = {}
    toks = [(i, t.split()[0], set(t.split())) for i, t in enumerate(docs)]
    for ia, ba, sa in toks:
        for ib, bb, sb in toks:
            if ia < ib and ba == bb:
                expect[(ia, ib)] = len(sa & sb) / len(sa | sb)
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-12


ws = st.lists(st.sampled_from([" ", "  ", "\t", "\n", "   "]), min_size=1, max_size=6)


@SLOW
@given(words=st.lists(token, min_size=1, max_size=6), seps=ws)
def test_fingerprint_whitespace_invariant(spark, words, seps):
    from remote_shuffle_spark.operators.text import with_fingerprint

    canonical = " ".join(words)
    seps = (seps * len(words))[: max(0, len(words) - 1)]
    messy = words[0] + "".join(s + w for s, w in zip(seps, words[1:]))
    df = spark.createDataFrame([(1, canonical), (2, messy)], ["doc_id", "text"])
    fps = {r.doc_id: r.fingerprint for r in with_fingerprint(df, "text").collect()}
    assert fps[1] == fps[2]


@SLOW
@given(weights=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60))
def test_chunk_and_pack_sequences_properties(spark, weights):
    from remote_shuffle_spark.operators.pipeline import chunk_sequences, pack_sequences

    budget = 100
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "id long, w long"
    )
    # chunk: start offsets are the exact prefix sums in id order
    chunks = sorted(
        (r.id, r.start_offset, r.seq_id)
        for r in chunk_sequences(df, "id", "w", budget=budget, num_partitions=3).collect()
    )
    running = 0
    for (i, start, seq), w in zip(chunks, weights):
        assert start == running and seq == running // budget
        running += w
    # pack: every item exactly once, budget respected except oversize-alone
    packed = pack_sequences(df, "id", "w", budget=budget, num_partitions=3).collect()
    assert sorted(r.id for r in packed) == list(range(len(weights)))
    by_seq: dict[int, list] = {}
    for r in packed:
        by_seq.setdefault(r.seq_id, []).append(r)
    for rows in by_seq.values():
        rows.sort(key=lambda r: r.seq_pos)
        assert [r.seq_pos for r in rows] == list(range(len(rows)))
        assert sum(r.w for r in rows) <= budget or len(rows) == 1


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1_000_000)),
        min_size=1,
        max_size=40,
    ),
    dim_keys=st.lists(st.integers(0, 5), max_size=6),
    buckets=st.integers(min_value=1, max_value=5),
)
def test_salted_join_property_equals_plain(spark, rows, dim_keys, buckets):
    """salted_join ≡ plain join for arbitrary key/row distributions,
    duplicate dim keys included, any salt bucket count."""
    from remote_shuffle_spark.plans.shuffle_policy import salted_join

    left = spark.createDataFrame(
        [(i, k, rid) for i, (k, rid) in enumerate(rows)], ["row_id", "k", "payload"]
    )
    dim_rows = [(k, f"d{j}") for j, k in enumerate(dim_keys)]
    right = (
        spark.createDataFrame(dim_rows, ["k", "tag"])
        if dim_rows
        else spark.createDataFrame([], "k long, tag string")
    )
    for how in ("inner", "left"):
        plain = sorted(
            map(tuple, left.join(right, "k", how).select("row_id", "tag").collect())
        )
        salted = sorted(
            map(
                tuple,
                salted_join(left, right, "k", salt_buckets=buckets, how=how)
                .select("row_id", "tag")
                .collect(),
            )
        )
        assert plain == salted


@SLOW
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-8, 8, allow_nan=False, allow_infinity=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=20,
    )
)
def test_lsh_full_radius_equals_brute_force(spark, vecs):
    """lsh_topk at full Hamming radius must equal brute-force top-k for
    arbitrary vectors (zero vectors included — the cosine guard)."""
    from remote_shuffle_spark.operators.similarity import brute_force_topk, lsh_topk

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = df.limit(1)
    exact = [tuple(r) for r in brute_force_topk(df, "vec_id", "embedding", q, k=5).collect()]
    full = [
        tuple(r)
        for r in lsh_topk(
            df, "vec_id", "embedding", q, k=5, dim=4, num_planes=4, hamming_radius=4
        ).collect()
    ]
    assert full == exact


def _lev_py(a: str, b: str) -> int:
    m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        m[i][0] = i
    for j in range(len(b) + 1):
        m[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            m[i][j] = min(
                m[i - 1][j] + 1,
                m[i][j - 1] + 1,
                m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return m[len(a)][len(b)]


@SLOW
@given(
    texts=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=12), min_size=2, max_size=14
    ),
    d=st.integers(min_value=1, max_value=2),
)
def test_fuzzy_segments_property_full_recall(spark, texts, d):
    """Pigeonhole guarantee as a PROPERTY: on arbitrary short strings
    (tiny alphabet maximizes collisions, empty strings and duplicates
    included) the segment join with an unreachable block cap returns
    EXACTLY the brute-force ≤d pair set — full recall AND no false
    pairs, at both supported distances."""
    import itertools

    from remote_shuffle_spark.operators.joins import fuzzy_self_join_segments

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "id long, txt string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_join_segments(
            df, "id", "txt", max_distance=d, max_block_size=100_000
        ).collect()
    }
    want = {
        (i, j, _lev_py(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev_py(a, b) <= d
    }
    assert got == want


@SLOW
@given(
    cases=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["a", "b", "ab", "ba", "c"]), min_size=1, max_size=12
            ),
            st.sampled_from([("a", "b"), ("a", "a"), ("b", "a"), ("ab", "c")]),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_merge_fold_matches_reference_greedy(spark, cases):
    """_bpe_merge_fold (the Spark/DuckDB shared string algebra) must
    equal canonical greedy left-to-right non-overlapping merging for any
    symbol sequence, including overlapping same-symbol runs."""
    from remote_shuffle_spark.operators.text import _bpe_merge_fold

    def reference(seq, a, b):
        out = []
        i = 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        return out

    for symbols, (a, b) in cases:
        got = (
            spark.range(1)
            .select(
                _bpe_merge_fold(
                    F.split(F.lit("|".join(symbols)), r"\|"), a, b
                ).alias("m")
            )
            .collect()[0]
            .m
        )
        assert got.split("|") == reference(symbols, a, b), (symbols, (a, b), got)


@SLOW
@given(vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60))
def test_histogram_cdf_matches_sorted_ranks(spark, vals):
    """r13 primitive: for ANY integer multiset, histogram_cdf's
    (cum − cnt, cum] intervals must reproduce every 1-indexed rank of the
    sorted multiset, cum must be the exact inclusive prefix count, and
    the interval containing rank r must hold sorted(vals)[r-1]."""
    from remote_shuffle_spark.operators.stats import histogram_cdf

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = sorted(
        histogram_cdf(df, "v", num_partitions=4).collect(), key=lambda r: r.v
    )
    s = sorted(vals)
    # cum is the inclusive prefix count in value order
    running = 0
    for r in rows:
        running += r.cnt
        assert r.cum == running, (r, running)
    assert running == len(vals)
    # every rank maps to the correct sorted element
    for rank in range(1, len(vals) + 1):
        hit = [r.v for r in rows if r.cum - r.cnt < rank <= r.cum]
        assert hit == [s[rank - 1]], (rank, hit, s)


@SLOW
@given(
    vals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),
                  st.integers(min_value=-1000, max_value=1000)),
        min_size=1,
        max_size=60,
    )
)
def test_trimmed_interval_arithmetic_matches_bruteforce(spark, vals):
    """The per-group histogram interval-overlap form of the 5%-trim
    (ext_trimmed_mean's r13 plan) must equal the brute-force sorted-list
    trim for any grouped integer multiset."""
    from pyspark.sql import Window

    df = spark.createDataFrame(vals, "g int, v long")
    hist = df.groupBy("g", "v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wg = Window.partitionBy("g")
    h = (
        hist.withColumn(
            "cum",
            F.sum("cnt").over(
                wg.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("n", F.sum("cnt").over(wg))
        .withColumn("cut", F.expr("(n + 19) div 20"))
    )
    k = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.col("n") - F.col("cut"))
        - F.greatest(F.col("cum") - F.col("cnt"), F.col("cut")),
    )
    got = {
        r.g: (r.n_kept, r.s)
        for r in h.groupBy("g")
        .agg(F.sum(k).alias("n_kept"), F.sum(k * F.col("v")).alias("s"))
        .collect()
    }
    for g in {g for g, _ in vals}:
        xs = sorted(v for gg, v in vals if gg == g)
        cut = (len(xs) + 19) // 20
        kept = xs[cut : len(xs) - cut]
        assert got[g] == (len(kept), sum(kept)), (g, got[g], kept)


@SLOW
@given(vals=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60))
def test_gini_rank_sum_identity_matches_bruteforce(spark, vals):
    """Σ i·x computed from the histogram (ties contribute
    x·(cnt·(cum−cnt) + cnt(cnt+1)/2)) must equal the brute-force
    Σ of rank·value over the sorted multiset — the ext_gini_index
    identity, for any multiset and any tie structure."""
    from remote_shuffle_spark.operators.stats import histogram_cdf

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    hist = histogram_cdf(df, "v", num_partitions=4)
    six = hist.agg(
        F.sum(
            F.col("v")
            * (
                F.col("cnt") * (F.col("cum") - F.col("cnt"))
                + F.expr("cnt * (cnt + 1) div 2")
            )
        ).alias("six")
    ).collect()[0].six
    expect = sum(i * x for i, x in enumerate(sorted(vals), start=1))
    assert six == expect
