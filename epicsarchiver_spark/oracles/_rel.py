"""DuckDB oracles: relational gates (rel_*) — split from the former
oracles.py monolith (VERDICT r10 task 8); ``build(o)`` mutates the
shared registry dict. Statement order (and any support helpers each
family needs) is preserved verbatim from the original file, so the
composed oracle_sql() output is byte-identical."""

from __future__ import annotations

from epicsarchiver_spark.catalog import POINTS_ORACLE_CTE
from epicsarchiver_spark.gate_constants import (
    ALARM_TRIP,
    ALERT_RULES,
    ASOF_LOOKBACK,
    BLOCKWORDS,
    BOILER_MIN_WORDS,
    BOILER_SEG_WORDS,
    BOILER_STOPWORDS,
    BLOCK_MAX_RATIO,
    BM25_QUERY,
    COMPRESS_DEADBAND,
    COMPRESS_DEADTIME,
    CORR_MIN_R,
    DEADBAND,
    DEADTIME,
    DISCORD_K,
    DISCORD_WINDOW,
    ENUM_LABELS,
    FUNNEL_STEPS,
    GRID_STEP,
    HEARTBEAT,
    HH_MIN_COUNT,
    HIST_BINS,
    INSTRUMENT,
    KEYWORD_TAXONOMY,
    MAIL_LOOKUP_PV,
    MAIL_TEMPLATE,
    MULTI_QUERIES,
    OUTLIER_K,
    PROJ_DIM,
    RAMP_MIN_STEPS,
    RECENT_RUNS_LIMIT,
    RELATED_NODE,
    SAX_ALPHABET,
    SAX_EXPAND,
    SAX_NCAND,
    SAX_QUERY_PV,
    SAX_SEGMENTS,
    SAX_TOPK,
    SESSION_GAP,
    SHIFT_THRESHOLD,
    SHIFT_WINDOW,
    T0,
    T1,
    T_ASOF,
    WINNOW_MAX_DF,
    WINNOW_MIN_SHARED,
    _EDGES_CTE,
    _XCORR_PAIRS,
)
from epicsarchiver_spark.operators import similarity


def build(o: dict[str, str]) -> None:
    P = f"WITH {POINTS_ORACLE_CTE}"
    E = f"WITH {_EDGES_CTE}"

    P = f"WITH {POINTS_ORACLE_CTE}"

    E = f"WITH {_EDGES_CTE}"

    o["rel_score_sums"] = (
        E
        + """,
        canon AS (
          SELECT least(pv1, pv2) AS pv1, greatest(pv1, pv2) AS pv2, max(score) AS score
          FROM edges GROUP BY 1, 2
        ),
        nbrs AS (
          SELECT pv2 AS pvname, score FROM canon WHERE pv1 IN ('S:1','S:2')
          UNION ALL
          SELECT pv1 AS pvname, score FROM canon WHERE pv2 IN ('S:1','S:2')
        )
        SELECT pvname, sum(score) AS total_score FROM nbrs
        WHERE pvname NOT IN ('S:1','S:2')
        GROUP BY pvname ORDER BY total_score DESC, pvname
        """
    )

    o["rel_orders_no_lineitem"] = """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """

    o["rel_runs_window"] = (
        P
        + f""",
        runs AS (
          SELECT 'run_' || CAST(CAST(floor(time / 86400.0) AS BIGINT) AS VARCHAR) AS db,
                 min(time) AS start_time, max(time) AS stop_time
          FROM points GROUP BY floor(time / 86400.0)
        )
        SELECT db, start_time, stop_time FROM runs
        WHERE stop_time > {T0} AND start_time < {T1}
        """
    )

    o["rel_pair_scores"] = (
        E
        + """
        SELECT least(pv1, pv2) AS pv1, greatest(pv1, pv2) AS pv2, max(score) AS score
        FROM edges GROUP BY least(pv1, pv2), greatest(pv1, pv2)
        """
    )

    o["rel_related_topk"] = (
        E
        + f""",
        nbrs AS (
          SELECT pv2 AS pvname, score FROM edges WHERE pv1 = '{RELATED_NODE}'
          UNION ALL
          SELECT pv1 AS pvname, score FROM edges WHERE pv2 = '{RELATED_NODE}'
        )
        SELECT pvname, max(score) AS score FROM nbrs GROUP BY pvname
        ORDER BY score DESC, pvname LIMIT 20
        """
    )

    o["rel_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """

    o["rel_top_orders"] = """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """

    o["rel_regional_revenue"] = """
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """

    o["rel_order_priority"] = """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem WHERE l_shipdate > TIMESTAMP '1995-01-01'
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """

    o["rel_returned_items"] = """
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """

    o["rel_supplier_parts"] = """
        WITH assoc AS (
          SELECT DISTINCT p_brand, p_size, l_suppkey
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        )
        SELECT p_brand, p_size, CAST(count(*) AS BIGINT) AS supplier_cnt
        FROM assoc GROUP BY 1, 2
    """

    o["rel_disjunctive_revenue"] = """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#2'  AND p_size <= 10 AND l_quantity <= 15)
           OR (p_brand = 'Brand#4'  AND p_size <= 20 AND l_quantity <= 30)
           OR (p_brand = 'Brand#19' AND p_size <= 30 AND l_quantity <= 45)
    """

    # TPC-H Q18 shape: fact reduces first, quantities are integer-valued
    # doubles so the sum is exact and order-independent
    o["rel_large_orders"] = """
        WITH big AS (
          SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY 1 HAVING sum(l_quantity) >= 300
        )
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(o_totalprice, 2) AS o_totalprice, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey LIMIT 20
    """

    o["rel_forecast_revenue"] = """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 - 1e-9 AND l_discount <= 0.07 + 1e-9
          AND l_quantity < 24
    """

    o["rel_promo_share"] = """
        SELECT round(sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END), 2) AS promo_revenue,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
               round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
    """

    o["rel_nation_trade"] = """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
    """

    o["rel_market_share"] = """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
               round(sum(CASE WHEN n1.n_name = 'NATION_1'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END), 2) AS nation_revenue,
               round(round(sum(CASE WHEN n1.n_name = 'NATION_1'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0.0 END), 2)
                     / round(sum(l_extendedprice * (1 - l_discount)), 2),
                     6) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
        GROUP BY o_year
    """

    o["rel_product_profit"] = """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity), 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%1%'
        GROUP BY n_name, o_year
    """

    o["rel_small_qty_revenue"] = """
        WITH fact AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#1'
        ), cuts AS (
          SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS cut
          FROM fact GROUP BY l_partkey
        )
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM fact JOIN cuts ON l_partkey = pk
        WHERE l_quantity < cut
    """

    o["rel_order_count_dist"] = """
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
          SELECT c_custkey,
                 CAST(coalesce(cnt, 0) AS BIGINT) AS c_count
          FROM customer
          LEFT JOIN (
            SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
          ) o ON c_custkey = o_custkey
        )
        GROUP BY c_count
    """

    o["rel_part_value_share"] = """
        WITH pp AS (
          SELECT l_partkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_value
          FROM lineitem GROUP BY l_partkey
        ), tot AS (SELECT sum(part_value) AS t FROM pp)
        SELECT p_partkey, p_brand, p_type, part_value
        FROM pp JOIN part ON l_partkey = p_partkey CROSS JOIN tot
        WHERE part_value > 0.001 * tot.t
    """

    o["rel_top_supplier"] = """
        WITH ps AS (
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM ps JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM ps)
    """

    o["rel_idle_customers"] = """
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_custs,
               round(sum(c_acctbal), 2) AS total_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND c_custkey NOT IN (SELECT o_custkey FROM orders)
        GROUP BY c_nationkey
    """

    o["rel_fuzzy_customers"] = """
        WITH side0 AS (
          SELECT c_custkey AS id, c_name AS name,
                 substr(c_name, 1, length(c_name) - 2) AS blk
          FROM customer
        ),
        -- the operator's default hot-block fence (max_block=10000):
        -- a block over the cap contributes no pairs at ANY scale
        side AS (
          SELECT * FROM (
            SELECT s.*, count(*) OVER (PARTITION BY blk) AS bn FROM side0 s
          ) WHERE bn <= 10000
        )
        SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS INT) AS distance
        FROM side a JOIN side b ON a.blk = b.blk AND a.id < b.id
        WHERE levenshtein(a.name, b.name) <= 1
    """

    # fuzzy pairs → recursive-CTE closure → min-id canonical labels →
    # full spine with cluster sizes (the emb_dedup_groups closure over
    # the rel_fuzzy_customers pair lane)
    o["rel_entity_resolution"] = """
        WITH RECURSIVE side0 AS (
          SELECT c_custkey AS id, c_name AS name,
                 substr(c_name, 1, length(c_name) - 2) AS blk
          FROM customer
        ),
        side AS (
          SELECT * FROM (
            SELECT s.*, count(*) OVER (PARTITION BY blk) AS bn FROM side0 s
          ) WHERE bn <= 10000
        ),
        pairs AS (
          SELECT a.id AS id_a, b.id AS id_b
          FROM side a JOIN side b ON a.blk = b.blk AND a.id < b.id
          WHERE levenshtein(a.name, b.name) <= 1
        ),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL
          SELECT id_b, id_a FROM pairs
        ),
        reach(id, root) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.id
        ),
        comp AS (SELECT id, min(root) AS component FROM reach GROUP BY id),
        spine AS (
          SELECT s.id AS c_custkey, s.name AS c_name,
                 coalesce(c.component, s.id) AS canonical_id
          FROM side0 s LEFT JOIN comp c ON c.id = s.id
        )
        SELECT c_custkey, c_name, canonical_id,
               CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT)
                 AS cluster_size
        FROM spine
    """

    # the artifact lane answers the SAME question
    o["rel_entity_resolution_indexed"] = o["rel_entity_resolution"]

    o["rel_late_suppliers"] = """
        WITH per_os AS (
          SELECT l_orderkey, l_suppkey,
                 max(CASE WHEN CAST(l_shipdate AS DATE)
                            > CAST(o_orderdate AS DATE) + 90 THEN 1 ELSE 0 END)
                   AS was_late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
          GROUP BY 1, 2
        ),
        flagged AS (
          SELECT l_suppkey, was_late,
                 count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                 sum(was_late) OVER (PARTITION BY l_orderkey) AS n_late
          FROM per_os
        )
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM flagged JOIN supplier ON l_suppkey = s_suppkey
        WHERE was_late = 1 AND n_supp > 1 AND n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """

    o["rel_ship_delay_dist"] = """
        SELECT CAST(floor(datediff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) / 30.0) AS BIGINT)
                 AS delay_bucket,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY delay_bucket
        ORDER BY delay_bucket
    """

    o["rel_fuzzy_blocks"] = """
        SELECT substr(c_name, 1, 15) AS block_key,
               CAST(count(*) AS BIGINT) AS n_records
        FROM customer
        GROUP BY 1
        HAVING count(*) > 400
        ORDER BY n_records DESC, block_key
    """

    # fixed-point PageRank: the engine's integer recurrence unrolled as
    # one CTE pair per power-iteration round (same bit-exact arithmetic)
    _pr_scale, _pr_rounds = 10**9, 8

    _pr_base = (15 * _pr_scale) // 100

    _pr = [
        E
        + f""",
        canon AS (
          SELECT least(pv1, pv2) AS p1, greatest(pv1, pv2) AS p2,
                 max(score) AS s
          FROM edges GROUP BY 1, 2
        ),
        dir AS (
          SELECT src, dst, w FROM (
            SELECT p1 AS src, p2 AS dst,
                   CAST(round(s * 100) AS BIGINT) AS w FROM canon
            UNION ALL
            SELECT p2 AS src, p1 AS dst,
                   CAST(round(s * 100) AS BIGINT) AS w FROM canon
          ) WHERE w > 0
        ),
        wout AS (SELECT src, sum(w) AS wt FROM dir GROUP BY src),
        g AS (SELECT dst, src, w, wt FROM dir JOIN wout USING (src)),
        nodes AS (SELECT DISTINCT src AS id FROM dir),
        r0 AS (SELECT id, CAST({_pr_scale} AS BIGINT) AS r FROM nodes)"""
    ]

    for _k in range(1, _pr_rounds + 1):
        _pr.append(
            f""",
        c{_k} AS (
          SELECT dst AS id, sum((r * w) // wt) AS c
          FROM g JOIN r{_k - 1} ON r{_k - 1}.id = g.src GROUP BY dst
        ),
        r{_k} AS (
          SELECT n.id,
                 CAST({_pr_base} + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS r
          FROM nodes n LEFT JOIN c{_k} USING (id)
        )"""
        )

    _pr.append(
        f"""
        SELECT id AS pvname, r AS rank_units,
               round(r / {float(_pr_scale)!r}, 6) AS rank
        FROM r{_pr_rounds}"""
    )

    o["rel_pagerank"] = "".join(_pr)

    o["rel_min_cost_supplier"] = """
        WITH pairs AS (
          SELECT l_partkey, l_suppkey,
                 min(l_extendedprice / l_quantity) AS _cost
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ), reg_supp AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        ), ranked AS (
          SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                 round(_cost, 6) AS unit_cost,
                 rank() OVER (PARTITION BY l_partkey ORDER BY _cost) AS rk
          FROM pairs
          JOIN reg_supp ON l_suppkey = s_suppkey
          JOIN part ON l_partkey = p_partkey
          WHERE p_type = 'STANDARD' AND p_size <= 15
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        FROM ranked WHERE rk = 1
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """

    o["rel_dominant_suppliers"] = """
        WITH pairqty AS (
          SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_partkey, l_suppkey
        ), shared AS (
          SELECT l_suppkey, qty,
                 sum(qty) OVER (PARTITION BY l_partkey) AS total
          FROM pairqty
        ), winners AS (
          SELECT DISTINCT l_suppkey FROM shared WHERE qty > 0.5 * total
        )
        SELECT s_name, round(s_acctbal, 2) AS s_acctbal, n_name
        FROM winners
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        ORDER BY s_name
    """
