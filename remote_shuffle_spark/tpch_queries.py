"""Classic TPC-H query shapes beyond the Q1/Q3/Q5 variants already in the
parity set — the decision-support plans a reference user runs through the
shuffle plugin (the reference ships no query layer of its own; its README
positions it under Spark SQL workloads, RH/README.md:1-40, so the TPC-H
suite is the canonical workload family above the plugin's exchanges).

Each query keeps the official TPC-H PLAN SHAPE (the optimizer features it
exists to exercise) while adapting predicates to the driver fixture's
columns (FIXTURES.md — no l_shipmode/l_commitdate/p_container here).
Determinism follows queries.py rules: money through DECIMAL, every result
ordered on a unique key set, dates rendered as strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from remote_shuffle_spark.queries import SQL_DSUM, declared, dsum
from remote_shuffle_spark.sources.tables import load_table

# exact-decimal revenue product (same idiom as q06/q41/q42)
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))"
)


def _rev() -> F.Column:
    price = F.col("l_extendedprice").cast("decimal(12,4)")
    one = F.lit(1).cast("decimal(5,4)")
    return price * (one - F.col("l_discount").cast("decimal(6,4)"))


@declared(
    "q62_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("tpch", "join", "semi"),
)
def q62_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority count over a quarter, EXISTS-correlated to
    lineitem (ships-after-order stands in for commit<receipt, absent in
    the fixture).  The EXISTS must plan as a LEFT SEMI join after the
    date filter pushes into the orders scan — no decorrelation blowup."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-04-01 00:00:00").cast("timestamp_ntz")
    o = orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    semi = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@declared(
    "q63_conditional_priority_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("tpch", "join", "agg"),
)
def q63_conditional_priority_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: orders⋈lineitem with a year filter, conditional
    CASE counts by a lineitem attribute (l_returnflag stands in for the
    fixture's missing l_shipmode).  The CASE sums must map-side combine;
    the date range must push into the lineitem scan."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@declared(
    "q64_customer_order_histogram",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'F'
      GROUP BY c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "join", "outer", "agg"),
)
def q64_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer distribution — LEFT OUTER join with an
    extra join-condition predicate (status<>'F' stands in for the comment
    anti-pattern), per-customer count including zeros, then a histogram
    of the counts.  Two aggregations, the second over ≤ max-orders keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.withColumnRenamed("o_custkey", "ock"),
            (F.col("c_custkey") == F.col("ock"))
            & (F.col("o_orderstatus") != "F"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@declared(
    "q65_promo_revenue_share",
    oracle=f"""
    SELECT CAST(ROUND(
             100.00 * SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                               ELSE CAST(0 AS DECIMAL(12,4)) END)
             / SUM({_REV_SQL}), 6) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("tpch", "join", "agg"),
)
def q65_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month — part⋈lineitem
    (part is the broadcast side), conditional decimal sums, one exact
    division rendered at 6 dp.  The month filter prunes lineitem before
    the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lo = F.lit("1997-03-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-04-01 00:00:00").cast("timestamp_ntz")
    zero = F.lit(0).cast("decimal(12,4)")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    joined = li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    return joined.agg(
        F.round(100.00 * F.sum(promo) / F.sum(_rev()), 6)
        .cast("double")
        .alias("promo_revenue_pct")
    )


@declared(
    "q66_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) / 7.0, 4) AS DOUBLE)
             AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    tags=("tpch", "join", "subquery"),
)
def q66_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity order revenue — per-part correlated
    scalar AVG subquery, decorrelated by Catalyst into an aggregate-then-
    join (the per-part averages are a partkey-sized table, broadcastable).
    The decimal sum divided by exact 7.0 keeps the double engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part_avg, F.col("ap") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,4)")) / 7.0, 4)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@declared(
    "q67_large_volume_orders",
    oracle="""
    SELECT c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(total_qty AS DOUBLE) AS total_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    ) big
    JOIN orders ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("tpch", "join", "agg", "topk"),
)
def q67_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — aggregate lineitem to
    order-level quantity, HAVING threshold, join back up to orders and
    customers, top-20.  The heavy groupBy runs FIRST so the joins see
    only qualifying orderkeys; l_quantity sums are exact (integral
    doubles), so no decimal detour is needed."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@declared(
    "q68_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM({_REV_SQL}), 4) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("tpch", "join", "filter"),
)
def q68_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR'd brand/size/quantity branches across a
    part⋈lineitem join.  Catalyst must extract the common join key and
    push the disjunction's per-side conjuncts (size predicates to part,
    quantity to lineitem) instead of evaluating the OR post-join only."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    q, s, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((br == "Brand#13") & s.between(10, 30) & q.between(10, 30))
        | ((br == "Brand#20") & s.between(20, 50) & q.between(20, 40))
    )
    return j.filter(cond).agg(
        F.round(F.sum(_rev()), 4).cast("double").alias("revenue")
    )


@declared(
    "q69_idle_customer_balance",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.00
      )
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '2000-01-01')
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    tags=("tpch", "subquery", "anti"),
)
def q69_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the global positive-balance
    average (uncorrelated scalar subquery → broadcast one-row frame) with
    no *recent* orders (anti join on a date-filtered orders scan), grouped
    by nation (nationkey stands in for the fixture's missing phone country
    code).  The driver fixture gives every custkey at least one order, so
    classic Q22's "no orders at all" predicate is vacuously empty; anchoring
    the anti join at 2000-01-01 keeps the identical plan shape (pushed
    filter → anti SMJ) while producing a non-trivial result (~55 rows at
    sf0.01) the oracle hash actually exercises.

    AVG determinism note: both engines average the same ~1.5k doubles in
    ascending-partition order only by accident, so the cutoff itself is
    compared, not emitted — a last-ULP cutoff difference could only flip
    a customer whose balance ties the average to 16 digits, which the
    fixture's 2-decimal balances cannot."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cutoff = (
        cust.filter(F.col("c_acctbal") > 0.00)
        .agg(F.avg("c_acctbal").alias("cut"))
    )
    return (
        cust.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(
            orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@declared(
    "q70_grouping_id",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
    """,
    tags=("tpch", "agg", "rollup"),
)
def q70_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING_ID: the bitmask distinguishes a genuine NULL
    grouping value from a subtotal row — the part of the cube surface
    q21/q25 don't pin.  Same single Expand+aggregate plan as plain
    rollup."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "gid",
            "n",
            "total",
        )
        .orderBy("gid", "status", "priority")
    )


@declared(
    "q71_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT CAST(strftime(o_orderdate, '%Y%m') AS BIGINT) AS ym,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    )
    SELECT ym, rev,
           LAG(rev) OVER (ORDER BY ym) AS prev_rev,
           CAST(ROUND(CASE WHEN LAG(rev) OVER (ORDER BY ym) > 0
                THEN (rev - LAG(rev) OVER (ORDER BY ym))
                     / LAG(rev) OVER (ORDER BY ym) * 100 END, 6) AS DOUBLE)
             AS growth_pct
    FROM monthly ORDER BY ym
    """,
    tags=("tpch", "window", "timeseries"),
)
def q71_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: bucket to month (combinable
    decimal agg — ~80 rows), then LAG over the tiny monthly series.  The
    window's single partition is fine BECAUSE it runs on the aggregate,
    never the corpus — the pattern that keeps 'global' time series cheap
    at any scale.  Growth is one double expression rounded to 6 dp."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    monthly = (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyyMM").cast("long").alias("ym")
        )
        .agg(dsum("o_totalprice", "rev"))
    )
    w = W.orderBy("ym")
    prev = F.lag("rev").over(w)
    return (
        monthly.select(
            "ym",
            "rev",
            prev.alias("prev_rev"),
            F.round(
                F.when(prev > 0, (F.col("rev") - prev) / prev * 100), 6
            ).alias("growth_pct"),
        )
        .orderBy("ym")
    )


@declared(
    "q72_union_by_name",
    oracle="""
    SELECT k, src, n FROM (
      SELECT o_orderpriority AS k, 'orders' AS src, COUNT(*) AS n
      FROM orders GROUP BY 1
      UNION ALL BY NAME
      SELECT 'returns:' || l_returnflag AS k, COUNT(*) AS n, 'lineitem' AS src
      FROM lineitem GROUP BY l_returnflag
    ) ORDER BY src, k
    """,
    tags=("tpch", "setops"),
)
def q72_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName across differently-ordered schemas — the schema-drift-
    tolerant append every multi-source pipeline needs (positional UNION
    would silently cross-wire columns here)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = orders.groupBy(F.col("o_orderpriority").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    ).select("k", F.lit("orders").alias("src"), "n")
    b = li.groupBy(
        F.concat(F.lit("returns:"), F.col("l_returnflag")).alias("k")
    ).agg(F.count(F.lit(1)).alias("n")).select("k", "n", F.lit("lineitem").alias("src"))
    return a.unionByName(b).orderBy("src", "k")


@declared(
    "q73_volume_shipping",
    oracle=f"""
    SELECT supp_region, cust_region, l_year,
           CAST(ROUND(SUM(rev), 4) AS DOUBLE) AS revenue
    FROM (
      SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
             CAST(year(l_shipdate) AS BIGINT) AS l_year, {_REV_SQL} AS rev
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE r1.r_name IN ('EUROPE', 'ASIA') AND r2.r_name IN ('EUROPE', 'ASIA')
        AND r1.r_name <> r2.r_name
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    tags=("tpch", "join", "agg"),
)
def q73_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional trade volume between two geographies
    by ship year — the long join chain (lineitem ⋈ supplier ⋈ orders ⋈
    customer plus two nation→region dimension arms).  Q7's nation pair is
    lifted to the REGION pair (EUROPE ↔ ASIA) because the fixture's
    supplier table is sparse at sf0.001 (10 suppliers over 25 nations —
    a nation pair is empty there; a region pair is not).  Both dimension
    arms broadcast pre-filtered to the two regions, so the big joins stay
    key-pruned; the cross-direction inequality runs after both arms."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("EUROPE", "ASIA"))
    arm1 = nat.join(
        reg.select(F.col("r_regionkey").alias("r1k"), F.col("r_name").alias("supp_region")),
        F.col("n_regionkey") == F.col("r1k"),
    ).select(F.col("n_nationkey").alias("n1k"), "supp_region")
    arm2 = nat.join(
        reg.select(F.col("r_regionkey").alias("r2k"), F.col("r_name").alias("cust_region")),
        F.col("n_regionkey") == F.col("r2k"),
    ).select(F.col("n_nationkey").alias("n2k"), "cust_region")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    j = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(arm1), F.col("s_nationkey") == F.col("n1k"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(arm2), F.col("c_nationkey") == F.col("n2k"))
        .filter(F.col("supp_region") != F.col("cust_region"))
    )
    return (
        j.groupBy(
            "supp_region", "cust_region", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(F.round(F.sum(_rev()), 4).cast("double").alias("revenue"))
        .orderBy("supp_region", "cust_region", "l_year")
    )


@declared(
    "q74_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, {_REV_SQL} AS rev,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                               ELSE CAST(0 AS DECIMAL(12,4)) END)
                      / SUM(rev), 6) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
    tags=("tpch", "join", "agg"),
)
def q74_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of ECONOMY-part revenue
    sold into ASIA customers, by order year — the 8-table star with a
    conditional-share division.  part/nation/region broadcast; the share
    is two exact decimal sums and ONE double division rounded at 6 dp
    (engine-stable; no double accumulation)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nat.select(F.col("n_nationkey").alias("n1k"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("n2k"), F.col("n_regionkey").alias("n2r"))
    zero = F.lit(0).cast("decimal(12,4)")
    j = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1k"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2k"))
        .join(F.broadcast(reg), F.col("n2r") == F.col("r_regionkey"))
    )
    national = F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(zero)
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(F.sum(national) / F.sum(_rev()), 6)
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


@declared(
    "q75_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM({_REV_SQL}), 4) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS acctbal, n_name
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "agg", "topk"),
)
def q75_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in one
    quarter.  The returnflag filter prunes lineitem map-side, the quarter
    filter prunes orders before the join, nation broadcasts, and the
    top-k is a TakeOrdered over the customer-sized aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-04-01 00:00:00").cast("timestamp_ntz")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    j = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("c_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 4).cast("double").alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            F.col("c_acctbal").cast("double").alias("acctbal"), "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@declared(
    "q76_product_type_revenue",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(SUM({_REV_SQL}), 4) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("tpch", "join", "agg"),
)
def q76_product_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit → revenue; the fixture has no partsupp/
    supplycost): widget-part revenue by supplier nation and order year.
    The LIKE filter prunes part before its broadcast, so the lineitem
    join is both key- and content-pruned."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(_rev()), 4).cast("double").alias("revenue"))
        .orderBy("nation", "o_year")
    )


@declared(
    "q77_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_REV_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(ROUND(total_rev, 4) AS DOUBLE) AS total_rev
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "join", "subquery", "topk"),
)
def q77_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    the view + scalar-max-subquery pattern.  The max comparison runs on
    the EXACT decimal revenue (ties included, per spec), not the rounded
    double render; the one-row max broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-04-01 00:00:00").cast("timestamp_ntz")
    revenue = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_rev"))
    )
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name",
            F.round("total_rev", 4).cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


@declared(
    "q78_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey  = l1.l_orderkey
    JOIN supplier ON s_suppkey   = l1.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND r_name = 'ASIA'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("tpch", "join", "anti", "agg"),
)
def q78_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier order — the classic double-correlated EXISTS / NOT
    EXISTS plan.  Fixture adaptation (FIXTURES.md has no l_receiptdate /
    l_commitdate): "late" := l_shipdate > o_orderdate + 60 days, and the
    single-nation filter widens to one region (supplier counts per nation
    are single-digit at fixture scale).

    Spark plan: instead of the literal pair of correlated self-joins on
    lineitem (two extra shuffles of the fact table, reference-class
    engines rewrite them the same way), aggregate once per
    (order, supplier) and once per order — both map-side combinable, no
    Expand — then the order-level frame pins EXISTS as
    n_supp >= 2 and NOT EXISTS as "the late-supplier set is exactly
    {l1.l_suppkey}" (n_late_supp = 1).  One shuffle of 8-byte keys
    replaces two fact-fact joins; supplier/nation/region are broadcast.
    At 100 TB the only wide exchange is lineitem keyed by l_orderkey.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")

    flagged = (
        li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        )
    )
    per_supp = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("any_late"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("late_lines"),
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.when(F.col("any_late"), 1).otherwise(0)).alias("n_late_supp"),
        F.max(F.when(F.col("any_late"), F.col("l_suppkey"))).alias("late_supp"),
        F.sum(F.when(F.col("any_late"), F.col("late_lines"))).alias("late_lines"),
    )
    waiting = (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .groupBy("late_supp")
        .agg(F.sum("late_lines").alias("numwait"))
    )
    return (
        waiting.join(F.broadcast(supp), F.col("s_suppkey") == F.col("late_supp"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("s_name")
        .agg(F.sum("numwait").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@declared(
    "q79_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "agg", "pushdown"),
)
def q79_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate forecast query —
    every predicate (date range, discount band, quantity cap) must reach
    the parquet scan as a pushed filter, and the single global sum runs
    map-side-combined with no groupBy shuffle at all.  Money through the
    exact-decimal idiom (queries.py dec/dsum rules) so the cross-engine
    sum is order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    disc_rev = F.col("l_extendedprice").cast("decimal(12,4)") * F.col(
        "l_discount"
    ).cast("decimal(6,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(disc_rev).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Synthesized partsupp: the driver fixture has no partsupp table, which
# blocked TPC-H Q2/Q11/Q16/Q20 (docs/coverage.md).  Both engines derive the
# SAME deterministic partsupp from part × supplier cardinalities (the public
# dbgen idea — 4 suppliers per part spread S/4 apart — with overflow-safe
# congruences for qty/cost), so the oracle stays a pure function of the
# pre-registered views and the driver gate CAN check these shapes.
# ps_suppkey = (p + p//S + i*(S//4)) % S is 4 DISTINCT suppliers per part
# for any S >= 4 (i*(S//4) < S for i in 0..3), verified key-unique in
# tests/test_queries_oracle.py.  In production partsupp is a real table;
# the query plans below do not depend on the synthesis (it's a leaf).
# ---------------------------------------------------------------------------

_PARTSUPP_SQL = """
    s_cnt AS (SELECT COUNT(*) AS s FROM supplier),
    partsupp AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + p_partkey // s + i.i * (s // 4)) % s AS ps_suppkey,
             (p_partkey * 37 + i.i * 101) % 9999 + 1 AS ps_availqty,
             CAST((p_partkey * 13 + i.i * 7) % 99000 + 100 AS DOUBLE) / 100.0
               AS ps_supplycost
      FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i) CROSS JOIN s_cnt
    )
"""


def _partsupp(spark: SparkSession, sf_dir: str, part: DataFrame | None = None) -> DataFrame:
    """Deterministic partsupp synthesis (see block comment above).  ``part``
    lets callers pass an already-filtered part frame so the synthesis only
    materializes the rows the query needs — the stand-in for partition
    pruning on a real partsupp table."""
    if part is None:
        part = load_table(spark, sf_dir, "part")
    s_cnt = load_table(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("s"))
    quarters = spark.range(4).select(F.col("id").alias("i"))
    return (
        part.select("p_partkey")
        .crossJoin(F.broadcast(quarters))
        .crossJoin(F.broadcast(s_cnt))
        .selectExpr(
            "p_partkey AS ps_partkey",
            "(p_partkey + p_partkey DIV s + i * (s DIV 4)) % s AS ps_suppkey",
            "(p_partkey * 37 + i * 101) % 9999 + 1 AS ps_availqty",
            "CAST((p_partkey * 13 + i * 7) % 99000 + 100 AS DOUBLE) / 100.0"
            " AS ps_supplycost",
        )
    )


@declared(
    "q80_min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    eu_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p_partkey, p_brand, ps_supplycost, s_name, s_acctbal, n_name
      FROM part JOIN partsupp ON ps_partkey = p_partkey
      JOIN eu_supp ON s_suppkey = ps_suppkey
      WHERE p_size = 15
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
    FROM cand
    WHERE ps_supplycost = (
      SELECT MIN(c2.ps_supplycost) FROM cand c2 WHERE c2.p_partkey = cand.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("tpch", "join", "subquery", "window"),
)
def q80_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the cheapest EUROPE supplier per size-15 part — the
    classic correlated-MIN subquery.  Spark plans it as ONE window
    (min over p_partkey) + filter instead of the literal self-join
    decorrelation: one exchange on the part key, dimension joins all
    broadcast.  The partsupp leaf is synthesized from the already-filtered
    part frame, the engine analog of pruning a real partsupp scan to the
    selected parts."""
    part_f = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    ps = _partsupp(spark, sf_dir, part=part_f)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    eu = (
        supp.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    from pyspark.sql import Window as W

    cand = ps.join(
        F.broadcast(part_f.select(F.col("p_partkey").alias("pk"), "p_brand")),
        F.col("pk") == F.col("ps_partkey"),
    ).join(F.broadcast(eu), F.col("s_suppkey") == F.col("ps_suppkey"))
    mincost = F.min("ps_supplycost").over(W.partitionBy("ps_partkey"))
    return (
        cand.withColumn("mincost", mincost)
        .filter(F.col("ps_supplycost") == F.col("mincost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand",
            "ps_supplycost",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@declared(
    "q81_important_stock",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    nat_ps AS (
      SELECT ps_partkey, CAST(ps_supplycost AS DECIMAL(12,4)) * ps_availqty AS v
      FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_8', 'NATION_13')
    ),
    per_part AS (SELECT ps_partkey, SUM(v) AS value FROM nat_ps GROUP BY ps_partkey),
    tot AS (SELECT SUM(value) AS total FROM per_part)
    SELECT ps_partkey, CAST(ROUND(value, 4) AS DOUBLE) AS value
    FROM per_part CROSS JOIN tot
    WHERE CAST(value AS DECIMAL(18,4)) * 200 > CAST(total AS DECIMAL(18,4))
    ORDER BY value DESC, ps_partkey
    """,
    tags=("tpch", "agg", "subquery"),
)
def q81_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value within a nation group,
    HAVING value > 1/200 of the group total (uncorrelated scalar
    aggregate → broadcast one-row frame).  Threshold compared in exact
    DECIMAL on both engines (value*200 > total — integer multiplier, no
    division rounding).  Two combinable aggregations; the only wide
    exchange carries (partkey, decimal) pairs."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    nat_supp = (
        supp.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .filter(F.col("n_name").isin("NATION_3", "NATION_8", "NATION_13"))
        .select("s_suppkey")
    )
    v = F.col("ps_supplycost").cast("decimal(12,4)") * F.col("ps_availqty")
    per_part = (
        ps.join(F.broadcast(nat_supp), F.col("s_suppkey") == F.col("ps_suppkey"))
        .groupBy("ps_partkey")
        .agg(F.sum(v).alias("value"))
        # part-cardinality (≪ partsupp) — materialize so the scalar-total
        # branch reuses it instead of re-scanning partsupp (the naive
        # dataflow evaluates the whole aggregation subtree twice).
        # localCheckpoint, not persist: blocks are context-cleaned once
        # the result plan is dropped, so gate sessions running all 169
        # queries don't accumulate pinned cache entries
        .localCheckpoint(eager=False)
    )
    tot = per_part.agg(F.sum("value").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value").cast("decimal(18,4)") * F.lit(200)
            > F.col("total").cast("decimal(18,4)")
        )
        .select("ps_partkey", F.round("value", 4).cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@declared(
    "q82_supplier_cnt_by_part",
    oracle=f"""
    WITH {_PARTSUPP_SQL}
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'ECONOMY'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "agg", "anti", "distinct"),
)
def q82_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute group,
    excluding blacklisted suppliers (negative balance stands in for the
    fixture's missing comment column) — NOT IN planned as a broadcast
    ANTI join (s_suppkey is non-null, so anti ≡ NOT IN).  The distinct
    aggregate is the one genuine exchange."""
    part_f = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    ps = _partsupp(spark, sf_dir, part=part_f)
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(
            part_f.select(
                F.col("p_partkey").alias("pk"), "p_brand", "p_type", "p_size"
            ),
            F.col("pk") == F.col("ps_partkey"),
        )
        .join(F.broadcast(bad), F.col("s_suppkey") == F.col("ps_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@declared(
    "q83_promotable_parts",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_regionkey = 2
      AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        JOIN part ON p_partkey = ps_partkey
        JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        WHERE p_name LIKE 'small%'
          AND CAST(ps_availqty AS DOUBLE) > 0.5 * qty
      )
    ORDER BY s_name
    """,
    tags=("tpch", "join", "semi"),
)
def q83_promotable_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region holding excess stock
    (availqty > half of what they shipped in 1997) of 'small%' parts —
    nested IN over a join of partsupp with a pre-aggregated lineitem
    frame, planned as two semi joins.  l_quantity is whole-number-valued
    so the double SUM is order-independent-exact and the 0.5*qty
    comparison cannot tie-break differently across engines."""
    part_f = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    ps = _partsupp(spark, sf_dir, part=part_f)
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    shipped = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    promo = (
        ps.join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty").cast("double") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .filter(F.col("n_regionkey") == 2)
        .join(F.broadcast(promo), F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )
