"""Wider TPC-H-shaped analytics surface (SURVEY §2.2-§2.7 composites).

The testdata star schema is a simplified TPC-H (no partsupp, no
commit/receipt dates, no shipmode/comment columns — see TESTDATA.md), so
each query here is the *shape* of its TPC-H namesake re-cut to available
columns: same operator composition (disjunctive predicates, group-HAVING
against a scalar subquery, exists/not-exists rewritten as semi/anti joins,
distribution-of-counts), not the literal spec text.

Scale notes (100 TB thinking), per query in its docstring. The common
pattern: dimensions broadcast, the single fact-fact shuffle is on the join
key Catalyst would pick anyway, float aggregates go through exact decimal
sums (ops/relational.exact_sum) so results are shuffle-order-invariant.

Reference basis: the reference's own query surface is two WAU queries over
one fact table (README.md:13-74); everything here is the north-star
extension lane (SURVEY §2.12) exercising the same relational operator set
its SQL engine exposes.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from sparkgraft.io.readers import read_table
from sparkgraft.ops.relational import exact_sum
from sparkgraft.registry import _DEC_SUM, register


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


_TS = "timestamp_ntz"


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: the canonical pushdown showcase
# ---------------------------------------------------------------------------

@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.07
      AND l_quantity < 24
    """,
)
def q_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: single-table filter + aggregate, no join, no group.

    At 100 TB this is bandwidth-bound: all three predicates and the 3-column
    projection must reach the parquet scan (min/max row-group skipping on
    l_shipdate), and the agg is a partial-final pair with a 1-row shuffle.
    test_q6_scan_prunes asserts PushedFilters/ReadSchema.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast(_TS))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast(_TS))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(exact_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------

@register(
    "q9_product_profit",
    """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.1 * p_retailprice * l_quantity
                         AS DECIMAL(28,6))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: 5-way join, profit aggregate by (nation, year).

    No partsupp in this schema, so supply cost is modeled as
    0.1 * p_retailprice * l_quantity — same expression both sides.

    Scale: part/supplier/nation broadcast (the LIKE filter shrinks part
    further before the hint); lineitem⋈orders is the one real shuffle, on
    l_orderkey — exactly the key both sides would co-partition on under
    bucketing (catalog.save_bucketed). Aggregate is 25 nations × ~7 years:
    the final groupBy is a near-free 32-partition shuffle of partials.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(exact_sum(profit).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: HAVING against an uncorrelated scalar subquery
# ---------------------------------------------------------------------------

@register(
    "q11_important_parts",
    """
    WITH part_value AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                  AS DOUBLE) AS value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name = 'JAPAN'
      GROUP BY l_partkey
    )
    SELECT l_partkey, value
    FROM part_value
    WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                          * 0.001
                   FROM part_value)
    ORDER BY value DESC, l_partkey
    """,
)
def q_q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: grouped value per part, kept only when above a
    fraction of the GLOBAL total — an uncorrelated scalar subquery over the
    same aggregate.

    Scale: the per-part aggregate is one shuffle on l_partkey; the global
    total is a 1-row reduction of the already-aggregated relation (re-used,
    not recomputed from the fact), joined back by broadcast — the
    textbook two-pass plan for a fraction-of-total HAVING. Both the decimal
    per-part sums and the decimal total make the threshold comparison
    shuffle-order-invariant.
    """
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name") == "JAPAN")
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    part_value = (
        li.join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(exact_sum(value).alias("value"))
    )
    total = part_value.agg(
        (exact_sum("value") * F.lit(0.001)).alias("__threshold")
    )
    return (
        part_value.join(F.broadcast(total))
        .where(F.col("value") > F.col("__threshold"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-delay priority split (shipmode → delay-bucket re-cut)
# ---------------------------------------------------------------------------

@register(
    "q12_shipping_priority_split",
    """
    SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY
                THEN 'SLOW' ELSE 'FAST' END AS ship_speed,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ship_speed
    ORDER BY ship_speed
    """,
)
def q_q12_shipping_priority_split(spark, sf_dir):
    """TPC-H Q12 shape: fact⋈fact join + conditional counts. The schema has
    no l_shipmode, so the grouping key is a derived ship-delay bucket
    (slow = shipped ≥90 days after order date) — same CASE-in-GROUP-BY +
    CASE-in-SUM operator composition.

    Scale: one shuffle on orderkey (both inputs partition on it); the
    2-row final aggregate is all map-side partials.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast(_TS))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast(_TS))
    ).select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "ship_speed",
            F.when(
                F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                "SLOW",
            ).otherwise("FAST"),
        )
        .groupBy("ship_speed")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_speed")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------

@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of per-customer order counts, including
    zero-order customers (LEFT JOIN + count(col) null-skipping), with a
    join-side filter that must NOT drop customers.

    Scale: the only heavy shuffle is customer⋈orders on custkey; the second
    aggregate runs over |customers| rows already reduced, and the final
    distribution is a few dozen rows. count(o_orderkey) (not count(*))
    encodes the 0-for-no-match semantics.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue
# ---------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY supplier_no
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: quarterly revenue per supplier, keep the max (view reused
    twice: once grouped, once reduced to a scalar).

    Scale: revenue is one shuffle on suppkey over the date-pruned scan; the
    max is a 1-row reduction of that small relation, broadcast back. The
    supplier dim joins by broadcast. Decimal sums make the max-equality
    comparison exact — no epsilon needed.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast(_TS))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast(_TS))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        ))
    )
    best = revenue.agg(F.max("total_revenue").alias("__best"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("__best"))
        .join(sup, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part group, excluding flagged suppliers
# ---------------------------------------------------------------------------

@register(
    "q16_part_supplier_diversity",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_q16_part_supplier_diversity(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    with NOT-IN exclusion — here, suppliers in deficit (s_acctbal < 0)
    stand in for the spec's complaint-comment LIKE (no comment column).

    Scale: the NOT IN is a broadcast anti join (supplier is a dim); the
    distinct-count shuffles once on the 3-col group key. part is broadcast
    after its selective size/brand/type filter.
    """
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    flagged = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(flagged, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated aggregate on the fact)
# ---------------------------------------------------------------------------

@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND p_type = 'SMALL'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: rows below 20% of their part's average quantity — a
    correlated aggregate against the SAME fact table.

    Written as the decorrelated two-pass plan Catalyst would produce from
    the subquery: per-part avg (shuffle on partkey), broadcast-joined back
    (post-filter the avg relation is small: parts of one brand+type).
    l_quantity is integral-valued, so double avg is exact and the
    threshold comparison is engine-stable.
    """
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    # per-part avg over ONLY the parts that survive the dim filter — at
    # scale this avoids aggregating the 99% of lineitem that can't match
    li_branded = li.join(part, F.col("p_partkey") == F.col("l_partkey"))
    per_part = li_branded.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("__q_thresh")
    )
    return (
        li_branded.join(per_part, F.col("l_partkey") == F.col("__pk"))
        .where(F.col("l_quantity") < F.col("__q_thresh"))
        .agg((exact_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING over a fact aggregate, then joins)
# ---------------------------------------------------------------------------

@register(
    "q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey,
           o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q_q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds 300, with customer
    detail — IN-subquery-on-aggregate expressed as a semi join against the
    grouped fact.

    Scale: the HAVING aggregate shuffles lineitem once on orderkey; the
    surviving keyset is tiny (heavy-volume tail) so the semi join
    broadcasts it; orders⋈customer broadcasts the dim side of whichever
    relation is smaller post-filter. Final LIMIT is TakeOrderedAndProject
    (no global sort materialization). l_quantity is integral: the decimal
    sum and the >300 comparison are exact.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 300)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders").join(
        big_orders,
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(exact_sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive band predicates (OR-of-ANDs across join inputs)
# ---------------------------------------------------------------------------

@register(
    "q19_banded_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
             AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
             AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q_q19_banded_revenue(spark, sf_dir):
    """TPC-H Q19: revenue under an OR of per-brand (size, quantity) bands —
    the predicate spans both join inputs, so it can only be applied AFTER
    the join, but its single-table implicants can be inferred and pushed.

    Scale: part is broadcast pre-filtered to the union of brand/size
    implicants (p_brand IN (...) AND p_size <= 50); lineitem pre-filters
    the quantity hull [1, 30] at the scan. Catalyst derives these from the
    disjunction via constraint propagation; stating them explicitly makes
    the pushdown independent of optimizer version.
    """
    part = _t(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 50)
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(band)
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ))
    )


# ---------------------------------------------------------------------------
# Q20 — dominant suppliers (nested aggregate thresholds, semi-join chain)
# ---------------------------------------------------------------------------

@register(
    "q20_dominant_suppliers",
    """
    WITH supp_part AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey),
    part_total AS (
      SELECT l_partkey,
             CAST(SUM(CAST(supp_qty AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
      FROM supp_part GROUP BY l_partkey)
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey
                        FROM supp_part JOIN part_total USING (l_partkey)
                        WHERE supp_qty > 0.5 * total_qty)
    ORDER BY s_suppkey
    """,
)
def q_q20_dominant_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped more than half of some part's
    1996 volume — an aggregate compared against a second-level aggregate of
    itself, feeding a semi join. (No partsupp table: 'availqty vs half the
    shipped volume' becomes 'supplier share vs half the part total'.)

    Scale: supp_part is one shuffle of the date-pruned fact on
    (suppkey, partkey); part_total re-aggregates THAT small relation (no
    second fact scan); the qualifying suppkey set is tiny and broadcast
    into the semi join. Decimal sums keep the 0.5*total comparison exact.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast(_TS))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast(_TS))
    )
    supp_part = li.groupBy("l_suppkey", "l_partkey").agg(
        exact_sum("l_quantity").alias("supp_qty")
    )
    part_total = supp_part.groupBy("l_partkey").agg(
        exact_sum("supp_qty").alias("total_qty")
    )
    dominant = (
        supp_part.join(part_total, "l_partkey")
        .where(F.col("supp_qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        sup.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — last supplier to ship on multi-supplier finished orders
# ---------------------------------------------------------------------------

@register(
    "q21_blocking_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q_q21_blocking_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: per supplier, count lines in finished orders where
    ANOTHER supplier participated (EXISTS) but none shipped later (NOT
    EXISTS) — i.e. this supplier shipped last on a shared order. The spec's
    receipt/commit dates don't exist here; shipdate carries the "waiting"
    semantics.

    Semi/anti joins carry the EXISTS pair. Scale: all three lineitem roles
    join on l_orderkey — ONE partitioning serves the whole plan (AQE
    reuses the exchange); supplier and the order-status filter broadcast.
    The anti join's extra shipdate inequality rides the same equi-key, so
    it stays a shuffled hash join, not a nested loop.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    fin = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    l1 = li.join(fin, F.col("l_orderkey") == F.col("o_orderkey")).drop("o_orderkey")
    l2 = li.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("__ok3"),
        F.col("l_suppkey").alias("__sk3"),
        F.col("l_shipdate").alias("__sd3"),
    )
    waiting = l1.join(
        l2,
        (F.col("__ok2") == F.col("l_orderkey")) & (F.col("__sk2") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("__ok3") == F.col("l_orderkey"))
        & (F.col("__sk3") != F.col("l_suppkey"))
        & (F.col("__sd3") > F.col("l_shipdate")),
        "left_anti",
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers by nation
# ---------------------------------------------------------------------------

@register(
    "q22_dormant_capital",
    """
    SELECT c_nationkey AS nationkey, count(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6)))
                                   AS DOUBLE) / count(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY nationkey
    ORDER BY nationkey
    """,
)
def q_q22_dormant_capital(spark, sf_dir):
    """TPC-H Q22 shape: customers richer than the positive-balance average
    who never ordered, grouped by nation (no phone column, so nationkey
    replaces the country-code substring).

    Scale: the average is a 1-row broadcast; the NOT EXISTS is an anti
    join on custkey against orders' distinct custkeys (projection prunes
    to one column at the scan); the final aggregate is 25 rows. The
    threshold uses a decimal sum / count on BOTH engines so the boundary
    comparison never flips on shuffle order.
    """
    cust = _t(spark, sf_dir, "customer")
    avg_pos = cust.where(F.col("c_acctbal") > 0.0).agg(
        (exact_sum("c_acctbal") / F.count(F.lit(1))).alias("__avg")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Round-6 tail: the three TPC-H shapes the registry did not yet exercise.
# q2 = correlated min-subquery over a DERIVED part-supplier relation (the
# testdata has no partsupp; (l_partkey, l_suppkey) pairs from lineitem with
# min observed price stand in — same join topology, same correlation).
# q7 = disjunctive two-nation pair predicate (nation_pair_volume groups ALL
# pairs; Q7's shape is the OR-of-ANDs restriction to one named pair, both
# directions, plus the shipdate year band).
# q8 = one nation's market share within a region+part-type market: TWO
# nation roles at once (supplier side inside the share numerator, customer
# side restricting the market) — asia_market_share has only the customer
# role and no part dimension.
# ---------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(CAST(round(l_extendedprice * 100) AS BIGINT))
                 AS ps_supplycost_cents
        FROM lineitem GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost_cents
    FROM part
    JOIN ps       ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 25 AND p_type LIKE '%AR%' AND r_name = 'EUROPE'
      AND ps_supplycost_cents = (
          SELECT MIN(ps2.ps_supplycost_cents)
          FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: cheapest EUROPE supplier per qualifying part — a
    correlated scalar MIN subquery, decorrelated the way Catalyst itself
    would: one window MIN per part over the region-restricted pairs, then
    an equality filter (identical result: the correlation key IS the
    window key, and both outer and inner carry the same region filter).

    Scale: the derived part-supplier relation aggregates lineitem on its
    natural (partkey, suppkey) shuffle; supplier/nation/region reduce to
    a broadcast before touching it, and the qualifying-parts filter is a
    broadcast semi-reduction applied BEFORE the window, so the per-part
    MIN runs over only surviving parts' pairs — at 100 TB the window
    input is |qualifying parts| x |euro suppliers per part|, not the full
    pair relation.  Costs are exact integer cents end to end; the final
    ORDER BY carries full tiebreakers so LIMIT 100 is total-order
    deterministic."""
    from pyspark.sql import Window

    ps = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "ps_supplycost_cents"
            )
        )
    )
    parts = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_size") == 25) & F.col("p_type").like("%AR%"))
        .select("p_partkey", "p_type")
    )
    euro_supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    cand = (
        ps.join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(euro_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .withColumn("__min_cost", F.min("ps_supplycost_cents").over(w))
        .where(F.col("ps_supplycost_cents") == F.col("__min_cost"))
    )
    return (
        cand.select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            "ps_supplycost_cents",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {_DEC_SUM.format(expr='l_extendedprice * (1 - l_discount)')} AS volume
    FROM (SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                 CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
                 l_extendedprice, l_discount
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
              OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between ONE named nation pair, both
    directions, by ship year — the OR-of-ANDs pair predicate plus a two-year
    shipdate band.

    Scale: the shipdate band is pushed to the lineitem scan (row-group
    skipping); both nation roles are pre-filtered to the two named rows
    BEFORE their joins, so each broadcast hash join keeps only lines whose
    supplier (resp. customer) sits in the pair — the surviving disjunction
    is just the cross-direction exclusion.  The only big shuffles are the
    lineitem⋈orders join on orderkey and the 4-row aggregate.  Volume is
    the exact decimal sum, shuffle-order-invariant."""
    pair = ("NATION_1", "NATION_2")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast(_TS))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast(_TS))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    sn = nat.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            (
                (F.col("supp_nation") == pair[0])
                & (F.col("cust_nation") == pair[1])
            )
            | (
                (F.col("supp_nation") == pair[1])
                & (F.col("cust_nation") == pair[0])
            )
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(exact_sum(revenue).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_nation_market_share",
    f"""
    SELECT o_year,
           {_DEC_SUM.format(expr="CASE WHEN supp_nation = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
           / {_DEC_SUM.format(expr='l_extendedprice * (1 - l_discount)')}
             AS mkt_share
    FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                 sn.n_name AS supp_nation, l_extendedprice, l_discount
          FROM lineitem
          JOIN part     ON l_partkey = p_partkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN region   ON cn.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'STANDARD')
    GROUP BY o_year ORDER BY o_year
    """,
)
def q_q8_nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_3 suppliers' share of AMERICA customers'
    STANDARD-part market per order year — both nation ROLES in one query
    (customer-side nation→region restricts the market, supplier-side
    nation feeds the share numerator) over a part-type-filtered fact.

    Scale: part is filtered to one of six types before its join and
    broadcast (at extreme part cardinality swap to a shuffled join on
    partkey — the filter itself still prunes 5/6 of the build side);
    every other dimension (supplier, both nation roles, region) is an
    unconditional broadcast.  The market restriction (AMERICA) is an
    inner-join semi-reduction applied before the orderkey shuffle.  Share
    = exact-decimal numerator / exact-decimal denominator, one double
    division per year row, bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.when(F.col("supp_nation") == "NATION_3", revenue).otherwise(F.lit(0.0))
    joined = (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
    )
    return (
        joined.groupBy("o_year")
        .agg((exact_sum(num) / exact_sum(revenue)).alias("mkt_share"))
        .orderBy("o_year")
    )
