"""Relational benchmark queries over the TPC-H-ish driver tables.

These exercise the engine's join/aggregate machinery the way the
time-series operators exercise its window machinery — and they are the
headline bench queries. Plans are written so Catalyst produces the shape
you'd want on a cluster: filters first (pushdown), small dimensions
broadcast, aggregates with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary: one scan, hash aggregate with
    map-side partial; sums rounded for cross-engine stability."""
    return (
        lineitem.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_unshipped_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, segment: str = "BUILDING", k: int = 10
) -> DataFrame:
    """TPC-H Q3-style shipping priority: two joins (customer broadcast),
    aggregate, deterministic top-k."""
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(k)
    )


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5-style revenue by nation: star join with every dimension
    broadcast — only the fact table shuffles, once, for the aggregate."""
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


def order_priority_counts(
    orders: DataFrame, lineitem: DataFrame, shipped_after: str = "1995-01-01"
) -> DataFrame:
    """TPC-H Q4-style: orders with at least one lineitem shipped after the
    cutoff, counted per priority — a semi-join (no row multiplication,
    no distinct needed) + hash aggregate."""
    late = lineitem.filter(F.col("l_shipdate") > shipped_after).select("l_orderkey")
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def returned_item_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-style: revenue lost to returned items per customer —
    fact filter first (only 'R' lineitems enter the join), orders join
    shuffles once on the order key, both dimensions broadcast, then a
    customer-keyed aggregate and a deterministic top-k
    (TakeOrderedAndProject; ties broken by customer key)."""
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def disjunctive_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    tiers: tuple[tuple[str, int, float], ...] = (
        ("Brand#2", 10, 15.0),
        ("Brand#4", 20, 30.0),
        ("Brand#19", 30, 45.0),
    ),
) -> DataFrame:
    """TPC-H Q19-style: discounted revenue under an OR-of-ANDs predicate
    — per tier, (p_brand = b AND p_size ≤ max_size AND l_quantity ≤
    max_qty). The classic plan trap is evaluating the disjunction as a
    theta-join; expressed declaratively, Catalyst keeps the equi-join on
    the part key (part broadcasts) and runs the disjunction as a residual
    filter AFTER the join — plus it pushes the derived single-table
    prefilters (p_brand IN tiers, l_quantity ≤ global max) into both
    scans, so non-qualifying rows never reach the join."""
    brands = [b for b, _, _ in tiers]
    max_q = max(q for _, _, q in tiers)
    tier_pred = None
    for b, sz, q in tiers:
        p = (
            (F.col("p_brand") == b)
            & (F.col("p_size") <= sz)
            & (F.col("l_quantity") <= q)
        )
        tier_pred = p if tier_pred is None else (tier_pred | p)
    return (
        lineitem.filter(F.col("l_quantity") <= max_q)
        .join(
            F.broadcast(part.filter(F.col("p_brand").isin(brands))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(tier_pred)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def forecast_revenue(
    lineitem: DataFrame,
    d0: str = "1996-01-01",
    d1: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-style: revenue increase from discount elimination — the
    canonical predicate-pushdown probe: a single-table scan whose THREE
    range predicates must all reach the parquet reader (date, discount
    band, quantity cap), then one agg with map-side partials. No join,
    no shuffle beyond the final 1-row combine."""
    tol = 1e-9  # the double discount column stores exact hundredths
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= d0)
            & (F.col("l_shipdate") < d1)
            & (F.col("l_discount") >= disc_lo - tol)
            & (F.col("l_discount") <= disc_hi + tol)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def large_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_qty: float = 300.0,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q18-style: the largest orders by total line quantity. The
    fact reduces FIRST (one order-keyed aggregate with map-side
    partials, then the HAVING filter drops ~99% of orders before any
    join); the surviving keys join orders on the order key and broadcast
    customer; top-k is TakeOrderedAndProject with deterministic ties.
    Quantities are integer-valued doubles, so the sum is exact and
    order-independent."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") >= min_qty)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    d0: str = "1996-01-01",
    d1: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q14-style: promotional share of revenue in a shipdate
    window — one broadcast join, the date range pushed to the fact scan,
    conditional + total sums in a single aggregate pass (no second scan
    for the denominator)."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= d0) & (F.col("l_shipdate") < d1)
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.sum(promo), 2).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
        )
    )


def supplier_part_counts(
    part: DataFrame, lineitem: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q16-style: distinct suppliers per (p_brand, p_size),
    excluding suppliers in deficit (negative account balance — the
    complaints predicate of Q16, adapted to this schema). The fact
    reduces to distinct (part, supplier) pairs FIRST (map-side partial
    dedup before any join), the exclusion list rides a broadcast
    anti-join, the part dimension broadcasts, and the distinct
    (brand, size, supplier) reduction makes the final count a plain
    count — no count-distinct Expand doubling the shuffle."""
    excluded = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .dropDuplicates()
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_size", "l_suppkey")
        .dropDuplicates()
        .groupBy("p_brand", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
    )


def part_value_share(
    lineitem: DataFrame, part: DataFrame, fraction: float = 0.001
) -> DataFrame:
    """TPC-H Q11-style "important stock": parts whose traded value
    exceeds ``fraction`` of the corpus-wide total (Q11's partsupp value
    adapted to this schema's lineitem fact). One fact scan produces the
    per-part aggregate; the SAME aggregate re-reduces to the global
    total, which rides a broadcast one-row frame into the HAVING filter
    — no second fact scan, no scalar-subquery recompute. The part
    dimension broadcasts onto the (already reduced, |parts|-sized)
    survivor set, never the raw fact."""
    val = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_part = lineitem.groupBy("l_partkey").agg(F.round(val, 2).alias("part_value"))
    total = per_part.agg(F.sum("part_value").alias("_tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(fraction) * F.col("_tot"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_partkey"), F.col("p_brand"), F.col("p_type"), F.col("part_value")
        )
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    d0: str = "1996-01-01",
    d1: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15-style top supplier: the supplier(s) with maximum
    revenue in a shipdate quarter. Per-supplier revenue is one map-side
    partial aggregate over the date-pruned fact scan; the max rides back
    as a broadcast one-row frame joined on equality of the ROUNDED
    revenue (2dp before the max, so the tie set is well-defined across
    engines — Q15's correlated subquery, expressed as aggregate + 
    broadcast semi-equality instead of a rescan)."""
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_supp = (
        lineitem.filter((F.col("l_shipdate") >= d0) & (F.col("l_shipdate") < d1))
        .groupBy("l_suppkey")
        .agg(F.round(rev, 2).alias("total_revenue"))
    )
    mx = per_supp.agg(F.max("total_revenue").alias("_mx"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def idle_wealthy_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22-style "global sales opportunity": customers with an
    account balance above the average POSITIVE balance who have never
    placed an order, rolled up per nation. The average is a broadcast
    one-row frame (Q22's scalar subquery); the no-orders predicate is a
    left anti-join against the DISTINCT custkeys of orders — reduced
    map-side before the join so the anti side shuffles |customers with
    orders| keys, not |orders| rows."""
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    buyers = orders.select("o_custkey").dropDuplicates()
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(buyers, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


def order_count_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13-style customer distribution: how many customers placed
    exactly N orders — INCLUDING the zero-order customers, which is why
    this is the canonical left-outer double-aggregate (an inner join
    silently drops the biggest bucket). First aggregate reduces orders
    to per-customer counts keyed by custkey; the left join then runs
    customer-side with the reduced frame (AQE broadcasts it when it
    fits); the second aggregate is over the |distinct counts| frame —
    tiny. No Expand, no count-distinct."""
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("c_count"))
    return (
        customer.select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    d0: str = "1996-01-01",
    d1: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7-style bilateral trade volume: revenue shipped between
    two nations (either direction), by supplier nation / customer
    nation / ship year. The canonical DUAL-dimension star shape: the
    fact resolves its supplier nation through one broadcast chain and
    its customer nation through a second (orders → customer →
    nation), with the (a→b | b→a) predicate applied AFTER both
    resolutions. Date range is pushed to the fact scan; both nation
    dims and supplier/customer broadcast; orders is the one genuinely
    big join and carries only (orderkey, custkey) into it."""
    n1 = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    supp = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("_snk")
    )
    cust = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("_cnk")
    )
    fact = (
        lineitem.filter((F.col("l_shipdate") >= d0) & (F.col("l_shipdate") < d1))
        .select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
        )
        .join(F.broadcast(supp.select("s_suppkey", "supp_nation")), 
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust.select("c_custkey", "cust_nation")),
              F.col("o_custkey") == F.col("c_custkey"))
    )
    flow = (
        (F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b)
    ) | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    return (
        fact.filter(flow)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("_rev"), 2).alias("revenue"))
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_1",
    region_name: str = "EUROPE",
    p_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q8-style national market share: of the revenue a region's
    customers spent on one part type, what fraction was supplied by
    ``target_nation``, per order year. (Q8's two-level nation→region
    chain adapted to this schema: part filtered by ``p_type``; no
    partsupp table exists, so supplier cost never enters.)

    Shape: the conditional-share division happens AFTER a years-sized
    aggregate — revenue and the target-nation slice sum in ONE pass
    (sum(when(...))) so the fact scans once. Every dimension chain
    (part→type, supplier→nation, customer→nation→region) broadcasts;
    orders is the only shuffled join, carrying (orderkey, custkey,
    year). Cross-engine-stable: integer-cent-free but both sums round
    AFTER the divide at 6dp against the 2dp-rounded denominator."""
    pt = part.filter(F.col("p_type") == p_type).select("p_partkey")
    supp = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("_snk"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("_snk"),
    )
    cust_region = (
        customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    fact = (
        lineitem.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(supp.select("s_suppkey", "supp_nation")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            orders.select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    tgt = F.when(F.col("supp_nation") == target_nation, rev).otherwise(F.lit(0.0))
    return (
        fact.groupBy("o_year")
        .agg(
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.round(F.sum(tgt), 2).alias("nation_revenue"),
        )
        .withColumn(
            "mkt_share",
            F.round(F.col("nation_revenue") / F.col("total_revenue"), 6),
        )
    )


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_like: str = "%1%",
) -> DataFrame:
    """TPC-H Q9-style product profit by supplier nation and order year:
    profit = discounted revenue − retail cost of the quantity moved
    (Q9's ps_supplycost adapted to ``p_retailprice`` — no partsupp
    table in this schema). Part (name LIKE) and supplier→nation chains
    broadcast onto the fact; orders joins shuffled carrying only
    (orderkey, year); one nations×years-sized aggregate."""
    pt = part.filter(F.col("p_name").like(name_like)).select(
        "p_partkey", "p_retailprice"
    )
    supp = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("nation")
            )
        ),
        F.col("s_nationkey") == F.col("_snk"),
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(supp.select("s_suppkey", "nation")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1"
) -> DataFrame:
    """TPC-H Q17-style small-quantity revenue: average yearly revenue
    that would be lost by refusing orders below 20% of a part's average
    quantity, for one brand. Q17's correlated scalar subquery
    (0.2·avg(l_quantity) per part) is ONE per-part aggregate joined
    back — the fact scans twice logically but the avg side reduces
    map-side to |parts| rows and broadcasts; no per-row rescan, no
    nested-loop correlation."""
    bp = part.filter(F.col("p_brand") == brand).select("p_partkey")
    fact = lineitem.join(F.broadcast(bp), F.col("l_partkey") == F.col("p_partkey"))
    thresholds = fact.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("_cut")
    )
    return (
        fact.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def late_sole_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    status: str = "F",
    late_days: int = 90,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21-style "suppliers who kept orders waiting": on finished
    multi-supplier orders, the suppliers who were the ONLY late party
    (shipped > ``late_days`` past the order date while every co-supplier
    shipped on time), ranked by offence count. (This testdata has no
    commit/receipt dates, so "late" is defined against o_orderdate.)

    Q21's EXISTS + NOT-EXISTS pair of correlated self-joins is ONE
    pass here: reduce lines to (order, supplier, was_late), then count
    suppliers and late suppliers per order with an unordered window.
    At scale (both sides too big to broadcast → sort-merge join) the
    order-keyed shuffle happens ONCE, at the orders join: the grouped
    reduce and both window counts reuse the join's
    HashPartitioning(l_orderkey) (it satisfies ClusteredDistribution
    on (l_orderkey, l_suppkey) and on l_orderkey), so no fact-sized
    Exchange appears between the join and the window — plan-pinned
    with broadcasts disabled in tests/test_plans.py. When orders
    broadcasts instead (small SF), the post-join exchanges are the
    pre-reduced (order, supplier) frame, not raw lines. The final
    per-supplier rollup is |suppliers|-sized; the name join broadcasts;
    top-k is TakeOrderedAndProject, never a global sort."""
    from pyspark.sql import Window

    fin = orders.filter(F.col("o_orderstatus") == status).select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        F.col("l_shipdate").cast("date")
        > F.date_add(F.col("o_orderdate").cast("date"), late_days)
    ).cast("int")
    per_os = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(fin, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("_late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("_late").alias("was_late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.select(
        "l_suppkey",
        "was_late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("was_late").over(w).alias("n_late"),
    )
    return (
        flagged.filter(
            (F.col("was_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )


def ship_delay_distribution(
    lineitem: DataFrame, orders: DataFrame, bucket_days: int = 30
) -> DataFrame:
    """TPC-H Q12-style priority-by-delay distribution: line counts of
    critical (1-URGENT / 2-HIGH) vs other orders per order-to-ship
    delay bucket. (No l_shipmode in this testdata — the delay bucket
    stands in as the grouping dimension, which keeps Q12's point: the
    CASE-conditional dual count inside one aggregate, not two scans.)
    The orderkey shuffle join carries only (orderkey, priority) against
    (orderkey, shipdate); the aggregate reduces map-side to the
    ~hundred-bucket frame."""
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int")
    return (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.floor(delay / float(bucket_days)).alias("delay_bucket"),
            crit.alias("_crit"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum("_crit").alias("high_line_count"),
            F.sum(1 - F.col("_crit")).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


def min_cost_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    region_name: str = "EUROPE",
    max_size: int = 15,
    part_type: str = "STANDARD",
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier. The testdata has no
    partsupp relation, so the observed supply cost is derived from the
    fact table itself: min(l_extendedprice / l_quantity) per
    (part, supplier) pair. Q2's correlated "cost = min cost for this
    part" subquery becomes a rank()==1 window (ties kept, exactly the
    subquery semantics) which Catalyst compiles to WindowGroupLimit —
    the min-cost filter runs map-side before the shuffle.

    Scale shape: the fact table reduces FIRST to the distinct
    (part, supplier) pair frame (one shuffle, ~|pairs| rows); the
    supplier→nation→region chain and the filtered part dimension both
    broadcast; the rank window keys on the same l_partkey the pair
    aggregate produced. Unit cost is a single IEEE division and min is
    selection, not summation — cross-engine deterministic; rounding
    happens only at projection.
    """
    pairs = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("_cost")
    )
    reg_supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts_f = part.filter(
        (F.col("p_type") == part_type) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_name")
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey").orderBy("_cost")
    return (
        pairs.join(F.broadcast(reg_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(parts_f), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("_rk", F.rank().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(k)
    )


def dominant_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_prefix: str = "red",
    date0: str = "1996-01-01",
    date1: str = "1997-01-01",
    share: float = 0.5,
) -> DataFrame:
    """TPC-H Q20-style part-promotion supplier list. Without partsupp's
    ps_availqty, "supplier holds excess stock of a promoted part"
    becomes "supplier shipped more than `share` of a promoted part's
    total quantity in the window" — the same nested-aggregate shape:
    an inner per-(part, supplier) sum compared against a per-part
    scalar aggregate, then a semi-join up to the supplier dimension.

    Scale shape: the promoted-part filter broadcasts into the
    date-pruned fact scan (both predicates reach the parquet reader);
    the fact reduces to the (part, supplier) pair frame in one shuffle;
    the per-part total is a window over that already-small frame keyed
    by the same l_partkey. Quantities are integral doubles, so every
    sum is exact and the share comparison cannot waver across engines.
    The supplier dimension joins only the distinct qualifying supplier
    ids (a broadcast-sized set).
    """
    from pyspark.sql import Window

    parts_f = part.filter(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey"
    )
    fact = (
        lineitem.filter(
            (F.col("l_shipdate") >= date0) & (F.col("l_shipdate") < date1)
        )
        .join(F.broadcast(parts_f), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
    )
    total = F.sum("_qty").over(Window.partitionBy("l_partkey"))
    winners = (
        fact.withColumn("_total", total)
        .filter(F.col("_qty") > share * F.col("_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        winners.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"), "n_name")
        .orderBy("s_name")
    )
