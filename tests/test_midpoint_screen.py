"""Rounding-midpoint distance screen for the rounded-transcendental oracles.

The round-10 gate recorded a hash-only mismatch on ext_freshness_weights that
no local re-run reproduced; the prime suspect was a driver-side libm exp()
differing by 1 ULP at a 6-dp rounding midpoint.  That query is now
engine-exact (Python-precomputed literal weight table), but four other
declared queries still round a transcendental (ln) to 6 dp on the compared
path: ext_label_entropy, ext_char_entropy, ext_dsir_weights and
ext_snapshot_drift (PSI terms + the KS round).  They are safe only while no
compared term sits close enough to a 0.5e-6 rounding midpoint for a 1-ULP
libm skew to flip the rounded digit.

This screen PROVES that margin for the shipped fixtures: for every raw
(pre-round) term at both gate SFs, the distance from the nearest rounding
midpoint must exceed SCALED_MARGIN in round-scaled space.  A 1-ULP skew of a
double x <= ~10 moves it by <= ~2e-15, i.e. <= ~2e-9 in 1e6-scaled space —
three orders of magnitude inside the 1e-6 margin asserted here.  Fixture
regeneration that lands a term near a midpoint fails THIS test loudly
instead of surfacing as an unreproducible gate hash mismatch.

DuckDB computes the raw terms (IEEE +,-,*,/ are correctly rounded and
engine-identical; ln's possible 1-ULP skew is far below the asserted
margin, so either engine's ln is valid for measuring the distance).
"""
from __future__ import annotations

import math

import duckdb
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# minimum allowed |frac(value * 10^dp) - 0.5|; 1-ULP libm skew is ~2e-9 in
# this scaled space for values <= ~10, so 1e-6 is a ~500x safety margin.
SCALED_MARGIN = 1e-6

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _docs(sf_dir: str) -> str:
    return f"read_parquet('{sf_dir}/documents.parquet')"


def _assert_margin(values: list[float], dp: int, what: str) -> None:
    assert values, f"{what}: screen query returned no terms"
    scale = 10.0**dp
    worst = min(abs((v * scale) % 1.0 - 0.5) for v in values)
    assert worst > SCALED_MARGIN, (
        f"{what}: a pre-round term sits {worst:.3e} (scaled) from a "
        f"0.5e-{dp} rounding midpoint — a 1-ULP libm skew could flip the "
        f"rounded digit and the gate hash; regenerate or re-quantize"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_label_entropy_terms_clear_of_midpoints(sf_dir):
    rows = duckdb.sql(
        f"""
        WITH c AS (SELECT lang, COUNT(*) AS cnt FROM {_docs(sf_dir)} GROUP BY lang),
        tot AS (SELECT SUM(cnt) AS n FROM c)
        SELECT -(cnt / tot.n) * ln(cnt / tot.n) AS raw FROM c CROSS JOIN tot
        """
    ).fetchall()
    _assert_margin([r[0] for r in rows], 6, "ext_label_entropy ln term")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_char_entropy_terms_clear_of_midpoints(sf_dir):
    chars = ",".join("abcdefghijklmnopqrstuvwxyz0123456789")
    rows = duckdb.sql(
        f"""
        WITH nt AS (SELECT doc_id, {_NORM} AS t FROM {_docs(sf_dir)}),
        c AS (
          SELECT doc_id,
            list_transform(string_split('{chars}', ','),
              ch -> CAST(len(t) - len(replace(t, ch, '')) AS BIGINT)) AS cnts
          FROM nt
        ), s AS (
          SELECT doc_id, cnts, CAST(list_sum(cnts) AS BIGINT) AS n FROM c
        )
        SELECT UNNEST(list_filter(
                 list_transform(cnts,
                   x -> CASE WHEN x > 0
                        THEN -(CAST(x AS DOUBLE) / n) * ln(CAST(x AS DOUBLE) / n)
                        ELSE NULL END),
                 v -> v IS NOT NULL)) AS raw
        FROM s WHERE n > 0
        """
    ).fetchall()
    _assert_margin([r[0] for r in rows], 6, "ext_char_entropy ln term")


# NOTE on the SECOND rounding stage (char_entropy's round-5 of the decimal
# sum): ~5% of per-doc 6-dp entropy sums sit EXACTLY on a 5-dp midpoint
# (6th digit = 5) in the shipped fixtures, and the query is still green
# every round — because an exact-decimal midpoint is NOT the libm hazard.
# Both engines see the identical decimal; Spark's Round(double) goes
# through BigDecimal.valueOf (the SHORTEST decimal representation, which
# round-trips 6-dp sums exactly) with HALF_UP, and DuckDB's scaled
# multiply lands exactly on .5 and rounds away-from-zero — identical
# results for exact ties.  The fragile case is only a value that is NEAR
# a midpoint because a transcendental computed it — which the tests above
# screen.


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_dsir_log_ratio_terms_clear_of_midpoints(sf_dir):
    rows = duckdb.sql(
        f"""
        WITH toks AS MATERIALIZED (
          SELECT doc_id, lang, string_split({_NORM}, ' ') AS tk FROM {_docs(sf_dir)}
        ), bg AS MATERIALIZED (
          SELECT doc_id, lang,
                 substr(md5(array_to_string(tk[i+1 : i+2], ' ')), 1, 3) AS b
          FROM toks, UNNEST(range(len(tk) - 1)) AS r(i)
          WHERE len(tk) >= 2
        ), cnt AS MATERIALIZED (
          SELECT b, COUNT(*) AS c_s, COUNT(*) FILTER (lang = 'en') AS c_t
          FROM bg GROUP BY b
        ), tot AS (SELECT SUM(c_s) AS n_s, SUM(c_t) AS n_t, COUNT(*) AS bb FROM cnt)
        SELECT ln(((c_t + 1.0)/(n_t + bb)) / ((c_s + 1.0)/(n_s + bb))) AS raw
        FROM cnt CROSS JOIN tot
        """
    ).fetchall()
    _assert_margin([r[0] for r in rows], 6, "ext_dsir_weights log-ratio term")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_snapshot_drift_terms_clear_of_midpoints(sf_dir):
    """PSI ln terms AND the raw KS distances (the KS stat is rational-only
    but still passes through ROUND(double, 6), whose tie handling can
    differ between BigDecimal HALF_UP and scaled-multiply rounding)."""
    raws: list[float] = []
    for feat_key in (
        "lang",
        f"len(string_split({_NORM}, ' ')) // 8",
    ):
        rows = duckdb.sql(
            f"""
            WITH old AS MATERIALIZED (
              SELECT doc_id, lang,
                     CASE WHEN doc_id % 7 = 0 THEN 'OLD ' || text ELSE text END AS text
              FROM {_docs(sf_dir)} WHERE doc_id % 11 <> 0
            ), new AS MATERIALIZED (
              SELECT doc_id, lang, text FROM {_docs(sf_dir)} WHERE doc_id % 13 <> 0
            ),
            lo AS (SELECT {feat_key} AS k, COUNT(*) AS c_o FROM old GROUP BY 1),
            ln_ AS (SELECT {feat_key} AS k, COUNT(*) AS c_n FROM new GROUP BY 1),
            lf AS MATERIALIZED (
              SELECT COALESCE(lo.k, ln_.k) AS k,
                     COALESCE(c_o, 0) AS c_o, COALESCE(c_n, 0) AS c_n
              FROM lo FULL OUTER JOIN ln_ ON lo.k = ln_.k
            ), lt AS (SELECT SUM(c_o) AS t_o, SUM(c_n) AS t_n, COUNT(*) AS b FROM lf)
            SELECT ((c_n + 1.0)/(t_n + b) - (c_o + 1.0)/(t_o + b))
                   * ln(((c_n + 1.0)/(t_n + b)) / ((c_o + 1.0)/(t_o + b))) AS psi_raw,
                   ABS(SUM(c_o) OVER (ORDER BY k
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t_o
                     - SUM(c_n) OVER (ORDER BY k
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t_n)
                     AS ks_raw
            FROM lf CROSS JOIN lt
            """
        ).fetchall()
        raws.extend(r[0] for r in rows)
        raws.extend(r[1] for r in rows)
    _assert_margin(raws, 6, "ext_snapshot_drift PSI/KS term")


def test_freshness_weight_table_is_literal_and_exact():
    """The rebuilt ext_freshness_weights must stay transcendental-free on
    the compared path: its per-day weights are Python literals whose 6-dp
    strings round-trip exactly, and the table extends to the day where
    the weight reaches an exact 0.000000 (so the beyond-table coalesce to
    zero is exact, not an approximation)."""
    from remote_shuffle_spark.ext_queries import _FRESHNESS_ROWS

    assert _FRESHNESS_ROWS[0] == (0, "1.000000", "1.000000")
    assert _FRESHNESS_ROWS[-1][1] == "0.000000"
    for d, w, s in _FRESHNESS_ROWS:
        assert w == f"{round(math.exp(-d / 30.0), 6):.6f}"
        assert s == f"{round(float(w) * float(w), 6):.6f}"


def test_freshness_micro_table_matches_strings():
    """The r12 BIGINT micro-unit table must be the exact integer image of
    the 6-dp literal strings (string surgery, no float in the derivation),
    and the canary/weights results must carry ONLY integer columns — the
    r11 verdict's prescription for the gate-only hash mismatch was to
    remove every DECIMAL from the compared result; this pins it."""
    from decimal import Decimal

    from remote_shuffle_spark.ext_queries import (
        _FRESHNESS_ROWS,
        _FRESHNESS_ROWS_MICRO,
    )

    assert len(_FRESHNESS_ROWS_MICRO) == len(_FRESHNESS_ROWS) == 441
    for (d, w, s), (d2, wm, sm) in zip(_FRESHNESS_ROWS, _FRESHNESS_ROWS_MICRO):
        assert d == d2
        assert Decimal(wm) == Decimal(w) * 1_000_000
        assert Decimal(sm) == Decimal(s) * 1_000_000
    assert _FRESHNESS_ROWS_MICRO[0] == (0, 1_000_000, 1_000_000)
    assert _FRESHNESS_ROWS_MICRO[-1][1] == 0


def test_freshness_results_are_integer_only(spark, sf_smoke):
    """Schema guard: neither freshness query may ever reintroduce a
    DECIMAL/DOUBLE column into the compared result."""
    from remote_shuffle_spark.ext_queries import (
        ext_freshness_canary,
        ext_freshness_weights,
    )

    # Pin the EXACT schema per query (r12 ADVICE): a dtype allowlist let a
    # future DECIMAL/DOUBLE column rendered as string slip past the guard.
    expected = {
        "ext_freshness_weights": (
            "struct<event_type:string,n_events:bigint,"
            "total_weight_millionths:bigint,sum_sq_millionths:bigint>"
        ),
        "ext_freshness_canary": "struct<d:bigint,wt_micro:bigint,wt_sq_micro:bigint>",
    }
    for fn in (ext_freshness_weights, ext_freshness_canary):
        got = fn(spark, sf_smoke).schema.simpleString()
        assert got == expected[fn.__name__], (
            f"{fn.__name__} schema drifted: {got!r} != {expected[fn.__name__]!r}"
        )
    assert ext_freshness_canary(spark, sf_smoke).count() == 441


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_assortativity_term_clear_of_midpoints(sf_dir):
    """ext_degree_assortativity rounds one sqrt-based double to 6dp; screen
    the pre-round value at both gate SFs (same margin rationale as the
    ln-based screens above)."""
    import duckdb

    q = f"""
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
      FROM read_parquet('{sf_dir}/lineitem.parquet')
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-02-01'
    ),
    edges AS (
      SELECT DISTINCT a.sk AS src, b.sk AS dst
      FROM pairs a JOIN pairs b ON a.ok = b.ok AND a.sk < b.sk
    ),
    adj AS (
      SELECT src AS u, dst AS v FROM edges UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (SELECT u, COUNT(*) AS d FROM adj GROUP BY u),
    dd AS (
      SELECT du.d AS x, dv.d AS y
      FROM adj JOIN deg du ON adj.u = du.u JOIN deg dv ON adj.v = dv.u
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(y*y) AS BIGINT) AS syy
      FROM dd
    )
    SELECT (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS raw
    FROM mom
    """
    rows = duckdb.sql(q).fetchall()
    # a NULL corr (degenerate degree variance, e.g. the sf0.001 slice) is
    # NULL in both engines — nothing to round, nothing to screen
    values = [r[0] for r in rows if r[0] is not None]
    if not values:
        return
    _assert_margin(values, 6, "ext_degree_assortativity corr")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_abtest_zscore_term_clear_of_midpoints(sf_dir):
    """ext_abtest_zscore rounds one sqrt-based double to 6dp; same screen
    as the assortativity round."""
    import duckdb

    q = f"""
    WITH assign AS (
      SELECT user_id, user_id % 2 AS grp,
             CASE WHEN 5 * COUNT(*) FILTER (WHERE event_type = 'purchase')
                       > COUNT(*)
                  THEN 1 ELSE 0 END AS converted
      FROM read_parquet('{sf_dir}/events.parquet')
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      GROUP BY user_id
    ),
    agg AS (
      SELECT CAST(COUNT(*) FILTER (WHERE grp = 0) AS BIGINT) AS n_a,
             CAST(SUM(converted) FILTER (WHERE grp = 0) AS BIGINT) AS c_a,
             CAST(COUNT(*) FILTER (WHERE grp = 1) AS BIGINT) AS n_b,
             CAST(SUM(converted) FILTER (WHERE grp = 1) AS BIGINT) AS c_b
      FROM assign
    )
    SELECT (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
           / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                  * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                  * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)) AS raw
    FROM agg
    """
    rows = duckdb.sql(q).fetchall()
    values = [r[0] for r in rows if r[0] is not None]
    if not values:
        return
    _assert_margin(values, 6, "ext_abtest_zscore z term")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_autocorr_lag1_term_clear_of_midpoints(sf_dir):
    """ext_autocorr_lag1 rounds one sqrt-based double to 6dp; same screen
    as assortativity / abtest."""
    import duckdb

    q = f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*) AS c
      FROM read_parquet('{sf_dir}/events.parquet') WHERE ts IS NOT NULL
      GROUP BY 1
    ),
    lagged AS (SELECT c AS x, lag(c) OVER (ORDER BY day) AS y FROM daily),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(y*y) AS BIGINT) AS syy
      FROM lagged WHERE y IS NOT NULL
    )
    SELECT (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS raw
    FROM mom
    """
    rows = duckdb.sql(q).fetchall()
    values = [r[0] for r in rows if r[0] is not None]
    if not values:
        return
    _assert_margin(values, 6, "ext_autocorr_lag1 corr")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_semantic_decontam_tau_boundary_clear(sf_dir):
    """ext_decontaminate_semantic compares ROUND(cosine, 6) >= 0.35 and
    hash-compares only integer hit counts — the single flippable decision
    is a raw cosine close enough to the 0.3499995 rounding midpoint for a
    1-ULP numpy-vs-DuckDB skew to move a pair across τ.  Assert every
    same-cell train×eval raw cosine keeps its distance from that midpoint
    (same contract as the ln/corr screens above, specialized to the one
    boundary that matters)."""
    import duckdb

    q = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM read_parquet('{sf_dir}/embeddings.parquet')
    ), cents AS (
      SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cid, v AS cv
      FROM e ORDER BY vec_id LIMIT 16
    ), assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                          c.cid DESC
               ) AS rn
        FROM e CROSS JOIN cents c
      ) WHERE rn = 1
    ), sides AS (
      SELECT a.vec_id, a.cell, e.v, (a.vec_id % 17 = 0) AS is_eval
      FROM assign a JOIN e USING (vec_id)
    )
    SELECT list_cosine_similarity(t.v, b.v) AS raw
    FROM sides t JOIN sides b ON t.cell = b.cell
    WHERE NOT t.is_eval AND b.is_eval
    """
    values = [r[0] for r in duckdb.sql(q).fetchall() if r[0] is not None]
    assert values, "screen query returned no same-cell pairs"
    worst = min(abs(v - 0.3499995) for v in values)
    assert worst > SCALED_MARGIN / 1e6, (
        f"a train×eval cosine sits {worst:.3e} from the τ=0.35 rounding "
        f"midpoint — a 1-ULP skew could flip a hit count; re-quantize τ"
    )
