"""Temporal join operators vs Python/pandas oracles."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from remote_shuffle_spark.operators.joins import asof_join, range_join
from remote_shuffle_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 205), (3, "A", 310), (4, "B", 150), (5, "B", 255), (6, "C", 100)],
        ["trade_id", "sym", "t_us"],
    ).select("trade_id", "sym", F.timestamp_micros("t_us").alias("ts"))
    quotes = spark.createDataFrame(
        [("A", 90, 1.0), ("A", 100, 2.0), ("A", 300, 3.0), ("B", 200, 4.0)],
        ["sym", "t_us", "px"],
    ).select("sym", F.timestamp_micros("t_us").alias("ts"), "px")
    return trades, quotes


def test_asof_backward_inclusive(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts", right_values=["px"]
    )
    got = {r.trade_id: r.px_asof for r in out.collect()}
    # trade1@100 matches quote@100 (inclusive), trade2@205 → quote@100,
    # trade3@310 → quote@300, trade4@150 → none, trade5@255 → quote@200,
    # trade6 sym C → none
    assert got == {1: 2.0, 2: 2.0, 3: 3.0, 4: None, 5: 4.0, 6: None}


def test_asof_null_in_latest_right_row_is_preserved(spark):
    # ADVICE round-1: a NULL value on the latest qualifying right row must
    # come through as NULL (merge_asof / DuckDB ASOF semantics), not fall
    # back to an older non-null right row.
    trades = spark.createDataFrame(
        [(1, "A", 300)], ["trade_id", "sym", "t_us"]
    ).select("trade_id", "sym", F.timestamp_micros("t_us").alias("ts"))
    quotes = spark.createDataFrame(
        [("A", 100, 1.0, 10.0), ("A", 200, None, 20.0)],
        "sym string, t_us long, px double, qty double",
    ).select("sym", F.timestamp_micros("t_us").alias("ts"), "px", "qty")
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts", right_values=["px", "qty"]
    ).collect()
    assert len(out) == 1
    # latest right row (t=200) carries px=NULL, qty=20 — both must come from it
    assert out[0].px_asof is None
    assert out[0].qty_asof == 20.0


def test_asof_matches_pandas_merge_asof(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view")
    got = (
        asof_join(clicks, views, on=["user_id"], left_ts="ts", right_ts="ts", right_values=["value"])
        .select("event_id", "value_asof")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    lp = clicks.select("event_id", "user_id", "ts").toPandas().sort_values("ts")
    rp = views.select("user_id", "ts", "value").toPandas().sort_values("ts")
    expect = (
        pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
        .rename(columns={"value": "value_asof"})[["event_id", "value_asof"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect)


def test_range_join_matches_naive(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    errors = ev.filter(F.col("event_type") == "error")
    got = (
        range_join(
            errors, ev, on=["user_id"], left_ts="ts", right_ts="ts",
            lower_us=-60_000_000, upper_us=60_000_000, right_values=[],
        )
        .groupBy("event_id")
        .count()
        .collect()
    )
    got_map = {r.event_id: r["count"] for r in got}
    # naive python oracle (exact integer-microsecond window)
    from datetime import timedelta

    all_ev = [(r.user_id, r.ts) for r in ev.select("user_id", "ts").collect()]
    errs = [(r.user_id, r.event_id, r.ts) for r in errors.select("user_id", "event_id", "ts").collect()]
    tol = timedelta(seconds=60)
    expect = {
        i: sum(1 for (u2, t2) in all_ev if u2 == u and abs(t2 - t) <= tol)
        for (u, i, t) in errs
    }
    assert got_map == expect


def test_range_join_rejects_bad_bounds(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError):
        range_join(
            trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
            lower_us=10, upper_us=10, right_values=[],
        )


def test_fuzzy_self_join_blocked_planted(spark):
    from remote_shuffle_spark.operators.joins import fuzzy_self_join_blocked

    rows = [
        (1, "alpha-record-000x"),
        (2, "alpha-record-000y"),   # dist 1 to id 1, same block -> found
        (3, "alpha-record-0zzz"),   # dist 3 to id 1 -> filtered by verify
        (4, "Alpha-record-000x"),   # edit INSIDE the 16-char prefix -> different block, unseen
        (5, "beta"),                # different length -> different block
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_join_blocked(df, "id", "name").collect()
    }
    assert got == {(1, 2, 1)}


def test_fuzzy_self_join_hot_block_guard(spark):
    from remote_shuffle_spark.operators.joins import fuzzy_self_join_blocked

    # 5 identical-prefix rows with a block cap of 4 -> block dropped whole
    rows = [(i, f"same-prefix-van-{i}") for i in range(5)]
    df = spark.createDataFrame(rows, ["id", "name"])
    assert fuzzy_self_join_blocked(df, "id", "name", max_block_size=4).count() == 0


def test_fuzzy_self_join_recalls_indel_pairs(spark):
    """Insertion/deletion pairs differ in LENGTH; the length-band blocking
    (every row emitted under keys len-0..len-max_distance) must co-block
    them as long as the edit is after the prefix (ADVICE r3: exact-length
    blocking made every indel pair structurally unreachable)."""
    from remote_shuffle_spark.operators.joins import fuzzy_self_join_blocked

    rows = [
        (1, "alpha-record-000-suffix"),
        (2, "alpha-record-000-suffi"),    # DELETION after prefix -> dist 1
        (3, "alpha-record-000-suffixx"),  # INSERTION after prefix -> dist 1
        (4, "lpha-record-000-suffix"),    # deletion INSIDE prefix -> unseen (documented)
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_join_blocked(df, "id", "name").collect()
    }
    # 1<->2 and 1<->3 are single indels; 2<->3 is dist 2 > max_distance=1
    assert got == {(1, 2, 1), (1, 3, 1)}


def test_fuzzy_self_join_no_duplicate_pairs_from_band_overlap(spark):
    """Same-length pairs share BOTH their len-0 and len-1 band keys; the
    candidate dedup must emit each pair exactly once."""
    from remote_shuffle_spark.operators.joins import fuzzy_self_join_blocked

    rows = [(1, "alpha-record-000x"), (2, "alpha-record-000y")]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = fuzzy_self_join_blocked(df, "id", "name").collect()
    assert [(r.id_a, r.id_b, r.dist) for r in out] == [(1, 2, 1)]


def test_fuzzy_self_join_suffix_pass_recalls_prefix_edits(spark):
    """suffix_block=True unions a reversed-prefix pass: pairs whose edit
    sits INSIDE the 16-char prefix (structurally unseen by the prefix
    pass, including indels that shift every later position) are recalled,
    while pairs already found by both passes stay deduplicated."""
    from remote_shuffle_spark.operators.joins import fuzzy_self_join_blocked

    rows = [
        (1, "alpha-record-000-shared-tail-suffix"),
        (2, "alXha-record-000-shared-tail-suffix"),  # substitution at pos 3
        (3, "lpha-record-000-shared-tail-suffix"),   # deletion at pos 1 (indel shift)
        (4, "alpha-record-000-shared-tail-suffiy"),  # edit in the TAIL (prefix pass finds)
    ]
    df = spark.createDataFrame(rows, ["id", "name"])

    prefix_only = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_join_blocked(df, "id", "name").collect()
    }
    assert prefix_only == {(1, 4, 1)}  # prefix-zone edits unseen

    both = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_join_blocked(df, "id", "name", suffix_block=True).collect()
    }
    # 1<->2 (substitution in prefix) and 1<->3 (indel in prefix) recalled;
    # 2<->3, 2<->4, 3<->4 are all dist 2 > max_distance
    assert both == {(1, 2, 1), (1, 3, 1), (1, 4, 1)}

    # union stays exactly-once per pair (no duplicates from double-found pairs)
    rows_out = fuzzy_self_join_blocked(df, "id", "name", suffix_block=True).collect()
    assert len(rows_out) == len({(r.id_a, r.id_b) for r in rows_out})


def test_interval_overlap_join_exactly_once_and_guard(spark):
    """Pairs overlapping MANY grid cells must emit exactly once (the
    credit-to-first-common-chunk dedup), boundary-touching intervals
    (le == rs) must NOT match (half-open), and the per-row explosion
    guard must fail loud on a mis-sized grid."""
    import pytest as _pytest

    from remote_shuffle_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 1000), (1, 2000, 2100), (2, 0, 100)],
        "k long, start long, end long",
    )
    right = spark.createDataFrame(
        [(1, 500, 2050), (1, 2100, 2200), (2, 100, 200)],
        "k long, start long, end long",
    )
    out = interval_overlap_join(left, right, on=["k"], chunk_us=128)
    rows = sorted(map(tuple, out.collect()))
    # (1,0,1000)x(1,500,2050) spans many cells -> once; (1,2000,2100) overlaps
    # (1,500,2050) -> once; (1,2100,2200) touches at the boundary -> no match;
    # (2,0,100) touches (2,100,200) at the boundary -> no match (half-open)
    assert rows == [(1, 0, 1000, 500, 2050), (1, 2000, 2100, 500, 2050)]

    with _pytest.raises(Exception, match="max_chunks_per_row"):
        interval_overlap_join(
            left, right, on=["k"], chunk_us=1, max_chunks_per_row=4
        ).collect()


def test_asof_join_forward_direction(spark):
    """direction='forward' picks the EARLIEST right row at or after each
    left timestamp (inclusive), null when none follows — the reversed
    ordering must not disturb backward semantics."""
    from pyspark.sql import functions as F

    from remote_shuffle_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 250), (3, "B", 50)], ["id", "k", "t"]
    ).select("id", "k", F.timestamp_micros("t").alias("ts"))
    right = spark.createDataFrame(
        [("A", 100, 1.0), ("A", 200, 2.0), ("B", 40, 3.0)], ["k", "t", "v"]
    ).select("k", F.timestamp_micros("t").alias("ts"), "v")

    fwd = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_values=["v"], direction="forward",
    )
    assert sorted((r.id, r.v_asof) for r in fwd.collect()) == [
        (1, 1.0),   # inclusive: right at exactly ts=100
        (2, None),  # nothing at or after 250
        (3, None),  # B's only right row precedes the left row
    ]
    bwd = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_values=["v"]
    )
    assert sorted((r.id, r.v_asof) for r in bwd.collect()) == [
        (1, 1.0), (2, 2.0), (3, 3.0)
    ]


def test_asof_join_nearest_matches_pandas(spark):
    """Nearest direction vs pandas merge_asof: equidistant ties go
    backward, forward-only and backward-only neighbors both match."""
    import pandas as pd
    from pyspark.sql import functions as F

    from remote_shuffle_spark.operators.joins import asof_join_nearest

    left = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 240), (3, "A", 151), (4, "B", 10)],
        ["id", "k", "t"],
    ).select("id", "k", F.timestamp_micros("t").alias("ts"))
    right = spark.createDataFrame(
        [("A", 100, 1.0), ("A", 202, 2.0), ("B", 400, 3.0)], ["k", "t", "v"]
    ).select("k", F.timestamp_micros("t").alias("ts"), "v")
    got = sorted(
        (r.id, r.v_nearest)
        for r in asof_join_nearest(
            left, right, on=["k"], left_ts="ts", right_ts="ts", right_values=["v"]
        ).collect()
    )
    lp = pd.DataFrame(
        {"id": [1, 2, 3, 4], "k": ["A", "A", "A", "B"], "t": [100, 240, 151, 10]}
    ).sort_values("t")
    rp = pd.DataFrame(
        {"k": ["A", "A", "B"], "t": [100, 202, 400], "v": [1.0, 2.0, 3.0]}
    ).sort_values("t")
    m = pd.merge_asof(lp, rp, on="t", by="k", direction="nearest")
    assert got == sorted(zip(m["id"], m["v"]))


def _lev(a: str, b: str) -> int:
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


def test_fuzzy_segments_full_recall_vs_brute_force(spark):
    """Pigeonhole segment blocking must recall EVERY pair within
    max_distance=2 — including pairs with one edit in the prefix zone AND
    one in the suffix zone (the documented blind spot of the
    prefix+suffix union, round-5 verdict item 2), and indel+substitution
    combinations.  Verified pair-for-pair against a brute-force
    Levenshtein oracle."""
    import itertools

    from remote_shuffle_spark.operators.joins import (
        fuzzy_self_join_blocked,
        fuzzy_self_join_segments,
    )

    alpha = "abcdefghijklmnopqrstuvwxyz"
    rows = []
    for i in range(40):
        s = "".join(alpha[(i * 7 + k * 3) % 26] for k in range(40))
        rows.append((i, s))
        # one edit at pos 3 (prefix zone) AND one at pos 37 (suffix zone)
        rows.append((1000 + i, s[:3] + "Z" + s[4:37] + "Q" + s[38:]))
        # deletion at pos 5 + substitution at pos 35 (indel shift case)
        rows.append((2000 + i, s[:5] + s[6:35] + "X" + s[36:]))

    df = spark.createDataFrame(rows, "id long, txt string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_join_segments(
            df, "id", "txt", max_distance=2, max_block_size=4096
        ).collect()
    }
    want = {
        (min(i, j), max(i, j), _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= 2
    }
    assert got == want  # full recall AND no false pairs
    # the double-zone pairs are exactly what prefix+suffix cannot see
    union = {
        (r.id_a, r.id_b)
        for r in fuzzy_self_join_blocked(
            df, "id", "txt", max_distance=2, suffix_block=True, max_block_size=4096
        ).collect()
    }
    double_zone = {(i, 1000 + i) for i in range(40)}
    assert double_zone.isdisjoint(union)
    assert double_zone <= {(a, b) for a, b, _ in got}


def test_fuzzy_segments_hot_block_guard_and_validation(spark):
    from pytest import raises

    from remote_shuffle_spark.operators.joins import fuzzy_self_join_segments

    # identical strings: every block is one hot block -> dropped, empty
    df = spark.createDataFrame(
        [(i, "samesamesame") for i in range(50)], "id long, txt string"
    )
    assert fuzzy_self_join_segments(df, "id", "txt", max_block_size=10).count() == 0
    with raises(ValueError, match="max_distance"):
        fuzzy_self_join_segments(df, "id", "txt", max_distance=0)


def test_fuzzy_link_segments_cross_table_recall(spark):
    """Cross-table linkage must recall every L-R pair within distance 2
    (brute-force verified) and emit NO same-table pairs."""
    import itertools

    from remote_shuffle_spark.operators.joins import fuzzy_link_segments

    alpha = "abcdefghijklmnopqrstuvwxyz"
    lrows, rrows = [], []
    for i in range(30):
        s = "".join(alpha[(i * 5 + k * 3) % 26] for k in range(30))
        lrows.append((i, s))
        # right-side partner: edits in first AND last segment zones
        rrows.append((i, s[:2] + "Z" + s[3:27] + "Q" + s[28:]))
        rrows.append((100 + i, s[::-1]))  # far string, no accidental link
    ldf = spark.createDataFrame(lrows, "lid long, ltxt string")
    rdf = spark.createDataFrame(rrows, "rid long, rtxt string")
    got = {
        (r.left_id, r.right_id, r.dist)
        for r in fuzzy_link_segments(
            ldf,
            rdf,
            left_id="lid",
            left_text="ltxt",
            right_id="rid",
            right_text="rtxt",
            max_distance=2,
            max_block_size=4096,
        ).collect()
    }
    want = {
        (li, ri, _lev(a, b))
        for (li, a), (ri, b) in itertools.product(lrows, rrows)
        if _lev(a, b) <= 2
    }
    assert got == want
    assert {(i, i) for i in range(30)} <= {(a, b) for a, b, _ in got}
