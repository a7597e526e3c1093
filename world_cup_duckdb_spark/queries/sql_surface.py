"""The SQL entry point (§3.1): one ANSI SQL text, two engines, equal
hashes.

The reference's real query interface is DuckDB SQL over the schema
(README.md:1-3 — "implemented as a DuckDB database"); this engine serves
the same surface through `spark.sql` over the registered views
(sources/catalog.py:register_views — Spark's temp views play the role of
DuckDB replacement scans). Each query here is a SINGLE shared SQL string:
the Spark implementation runs it verbatim through Catalyst, the oracle
runs the identical text in DuckDB — the strongest possible statement of
SQL-surface parity (no per-engine rewriting at all), covering the classic
TPC-H-style analytical shapes the schema exists to serve.

Determinism: decimal-cast money math (order-independent sums), explicit
tie-breaks on every ORDER BY ... LIMIT, DATE literals (not bare strings)
for timestamp comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import register_views

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

SHARED_SQL: dict[str, str] = {
    # TPC-H Q1 shape: full-scan conditional aggregation
    "sql_pricing_summary": f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    # TPC-H Q3 shape: 3-way join + group + deterministic top-10
    "sql_shipping_priority": f"""
    SELECT o_orderkey,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    # TPC-H Q5 shape: star join to region level
    "sql_local_supplier_volume": f"""
    SELECT n_name,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    # TPC-H Q6 shape: selective scan-heavy aggregate (pushdown showcase)
    "sql_revenue_change": """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity < 24
      AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
    """,
    # correlated-shape rewrite: customers whose spend exceeds 2x the
    # average order price (join against a scalar aggregate).
    # Cross-multiplied (total*n > 2*sum, exact decimal/integer) instead
    # of comparing against AVG: Spark types AVG(DECIMAL(18,2)) as
    # DECIMAL(22,6) while DuckDB returns DOUBLE, so an AVG threshold can
    # flip boundary customers between engines (same fix as
    # sql_idle_customers).
    "sql_big_spenders": """
    SELECT c_custkey,
           CAST(total AS DOUBLE) AS total_spend
    FROM (
      SELECT c_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    ) s
    CROSS JOIN (
      SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_price,
             COUNT(*) AS n_orders
      FROM orders
    ) a
    WHERE total * n_orders > 2 * sum_price
    """,
    # TPC-H Q4 shape: correlated EXISTS — Catalyst decorrelates to a
    # semi join (SURVEY §4 "subquery decorrelation" exercised end-to-end)
    "sql_order_priority_check": """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_quantity > 49
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    # anti-join path: customers that never placed an urgent order
    "sql_customers_without_orders": """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
    # multi-grain aggregation in one pass (OP49's SQL form)
    "sql_grouping_sets": f"""
    SELECT r_name, n_name,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """,
    # hypertable-style continuous aggregate: one pass materializes the
    # hour/day/week grains (time-chunked rollup over the event stream)
    "sql_hypertable_rollup": """
    SELECT grain_hour, grain_day, grain_week, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS grain_hour,
             CAST(date_trunc('day',  CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS grain_day,
             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS grain_week,
             event_type, value
      FROM events
    ) g
    GROUP BY GROUPING SETS (
      (grain_hour, event_type), (grain_day, event_type),
      (grain_week, event_type)
    )
    """,
    # calendar rollup: monthly order volume (event-time bucketing in SQL)
    "sql_monthly_volume": """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM orders
    GROUP BY 1
    """,
    # TPC-H Q7 shape: two roles of the same dimension (supplier nation vs
    # customer nation) with a disjunctive cross-pair predicate — join-order
    # and predicate-pushdown exercise over a 5-way join
    "sql_nation_volume": f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS INT) AS l_year,
             {_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    # TPC-H Q13 shape: outer-join aggregation distribution — customers
    # bucketed by how many orders they placed, including the zero bucket
    # (the LEFT JOIN is load-bearing)
    "sql_order_count_distribution": """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    # TPC-H Q15 shape: CTE reused twice — once as a join input, once
    # inside a scalar MAX subquery (exact decimal revenue, so the
    # equality predicate is engine-stable)
    "sql_top_supplier": f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_revenue
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    # TPC-H Q17 shape: correlated scalar subquery (per-part average
    # quantity threshold) — Catalyst decorrelates to an aggregate+join;
    # quantities are integer-valued doubles so the correlated AVG is
    # order-independent and bit-stable across engines
    "sql_small_quantity_revenue": """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l1
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
      )
    """,
    # TPC-H Q18 shape: IN-subquery over a grouped HAVING — large-order
    # customers; the IN list is itself an aggregation result
    "sql_large_orders": """
    SELECT c_custkey, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200
    )
    GROUP BY c_custkey, o_orderkey
    """,
    # event-time RANGE frame (interval-bounded, not row-counted): rolling
    # 7-day order volume — the moving-aggregate shape a RANGE window
    # exists for; frame membership is by date arithmetic, so gaps in the
    # calendar are handled correctly (a ROWS frame would not)
    "sql_rolling_7day": """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS vol
      FROM orders GROUP BY 1
    )
    SELECT day, n,
           CAST(SUM(n) OVER (ORDER BY day
             RANGE BETWEEN INTERVAL '6' DAY PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_7d,
           CAST(SUM(vol) OVER (ORDER BY day
             RANGE BETWEEN INTERVAL '6' DAY PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS vol_7d
    FROM daily
    """,
    # window over SQL text: per-nation customer account-balance rank
    "sql_balance_rank": """
    SELECT n_name, c_custkey, bal_rank FROM (
      SELECT n_name, c_custkey,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY n_name
               ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
             ) AS INT) AS bal_rank
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) ranked
    WHERE bal_rank <= 3
    """,
    # TPC-H Q2 shape: correlated scalar MIN — for each small part, the
    # supplier rows hitting its minimum observed price. The equality is on
    # an untouched double column (selection, not arithmetic), so both
    # engines compare identical bit patterns.
    "sql_min_price_supplier": """
    SELECT p_partkey, s_suppkey, s_name,
           CAST(l_extendedprice AS DOUBLE) AS price
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size <= 5
      AND l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    # TPC-H Q8 shape: market share — one nation's fraction of regional
    # revenue per year; exact decimal sums feed a double division, and the
    # nation dimension appears in two roles (supplier side vs customer side)
    "sql_market_share": f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                              ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INT) AS o_year,
             {_REV} AS volume,
             n1.n_name AS nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ) all_nations
    GROUP BY o_year
    """,
    # TPC-H Q9 shape: profit by supplier nation and year over a 5-way join
    # with a LIKE part filter; amount is a decimal difference (exact)
    "sql_nation_profit": """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               - CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_tax AS DECIMAL(18,2)) AS amount
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
    # TPC-H Q10 shape: returned-item reporting — top-20 customers by
    # revenue lost to returns in a half-year window
    "sql_returned_items": f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    # TPC-H Q12 shape: dual conditional counts after a fact-fact join,
    # split by order priority class inside a one-year shipping window
    "sql_priority_linestatus": """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
    GROUP BY l_returnflag
    """,
    # TPC-H Q14 shape: promo revenue ratio — two exact decimal sums from
    # one scan, divided as doubles only at the end
    "sql_promo_revenue_ratio": f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM({_REV}) AS DOUBLE) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
    """,
    # TPC-H Q16 shape: COUNT DISTINCT per attribute triple with a NOT IN
    # subquery knocking out low-balance suppliers (null-safe anti join)
    "sql_supplier_part_counts": """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier
        WHERE CAST(s_acctbal AS DECIMAL(18,2)) < 2000.00
      )
    GROUP BY p_brand, p_type, p_size
    """,
    # TPC-H Q19 shape: three-arm disjunctive join predicate mixing part
    # attributes and lineitem quantity ranges — Catalyst must keep the
    # equi-join key and push the residual disjunction above the join
    "sql_disjunctive_parts": f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
    # TPC-H Q20 shape: two nested IN subqueries — suppliers who moved a
    # large volume of a name-matched part family
    "sql_top_part_suppliers": """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'
      )
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 500.00
    )
    """,
    # TPC-H Q21 shape: EXISTS + NOT EXISTS over two self-references of the
    # fact — the supplier who alone returned lines on a multi-supplier
    # finished order (two correlated semi/anti joins on the same table)
    "sql_sole_returner": """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    # TPC-H Q22 shape: substring-derived country code, an above-average
    # balance threshold (expressed as exact decimal cross-multiplication,
    # sidestepping engine-specific AVG-of-decimal typing), and NOT EXISTS
    "sql_idle_customers": """
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT SUBSTRING(c_name, LENGTH(c_name), 1) AS cntrycode,
             c_acctbal, c_custkey
      FROM customer
    ) c
    CROSS JOIN (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
             COUNT(*) AS bal_n
      FROM customer
      WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 3000.00
    ) a
    WHERE cntrycode IN ('1', '3', '5', '7', '9')
      AND CAST(c_acctbal AS DECIMAL(18,2)) * bal_n > bal_sum
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
      )
    GROUP BY cntrycode
    """,
    # set operators (INTERSECT / EXCEPT) — absent from the reference's ELT
    # but part of the DuckDB SQL surface it serves; hash-distinct semantics
    "sql_nation_set_ops": """
    SELECT 'both' AS side, CAST(nationkey AS INT) AS nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    ) b
    UNION ALL
    SELECT 'customer_only' AS side, CAST(nationkey AS INT) AS nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
    ) e
    """,
    # frame-exact value windows: FIRST/LAST/NTH over an explicit
    # unbounded ROWS frame (LAST_VALUE is wrong without it — the default
    # frame stops at CURRENT ROW)
    "sql_first_last_window": """
    SELECT n_name, c_custkey,
           CAST(FIRST_VALUE(c_acctbal) OVER (
             PARTITION BY n_name
             ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS DOUBLE) AS richest_bal,
           CAST(LAST_VALUE(c_acctbal) OVER (
             PARTITION BY n_name
             ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS DOUBLE) AS poorest_bal,
           CAST(NTH_VALUE(c_acctbal, 2) OVER (
             PARTITION BY n_name
             ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS DOUBLE) AS second_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    # recursive CTE (Spark 4.0+ / DuckDB): calendar spine over the full
    # order-date range, LEFT-joined so months without qualifying orders
    # surface as zero rows — the gap-filling shape reporting pipelines
    # need (a plain GROUP BY silently drops empty months)
    "sql_recursive_calendar": """
    WITH RECURSIVE months(m) AS (
      SELECT CAST('1995-01-01' AS DATE)
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE)
      FROM months WHERE m < CAST('2001-08-01' AS DATE)
    ),
    big AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS om
      FROM orders WHERE o_totalprice > 70000
    )
    SELECT m AS order_month, CAST(COUNT(om) AS BIGINT) AS n_big_orders
    FROM months LEFT JOIN big ON om = m
    GROUP BY m
    """,
    # correlated LATERAL subquery with per-row LIMIT: top-2 nations by
    # customer count within each region — the join-then-rank pattern
    # written as a lateral, planned by both engines as a per-group limit
    "sql_lateral_topk": """
    SELECT r_name, l.n_name, l.n_customers
    FROM region, LATERAL (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM nation JOIN customer ON c_nationkey = n_nationkey
      WHERE n_regionkey = r_regionkey
      GROUP BY n_name
      ORDER BY n_customers DESC, n_name
      LIMIT 2
    ) l
    """,
    # GROUP BY ALL / ORDER BY ALL (Spark 4 / DuckDB): grouping keys
    # inferred from the non-aggregate select list, total order over the
    # whole row — removes the classic copy-the-select-list error class
    "sql_group_by_all": """
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
    # bag-semantics set operators: EXCEPT ALL keeps multiplicity
    # differences, INTERSECT ALL keeps min multiplicities — the
    # reconciliation shape (row-level diffs between two loads) that
    # DISTINCT set ops silently flatten
    "sql_bag_set_ops": """
    SELECT 'cust_minus_supp' AS side, CAST(nationkey AS INT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey FROM supplier
    ) GROUP BY ALL
    UNION ALL
    SELECT 'intersect_bag' AS side, CAST(nationkey AS INT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey FROM supplier
    ) GROUP BY ALL
    """,
    # aggregate FILTER clause (SQL:2003, Spark 4 / DuckDB): per-aggregate
    # predicates without CASE-WHEN noise; one scan, n conditional sums
    "sql_filter_clause": """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 30) AS BIGINT)
             AS n_bulk,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
             AS n_discounted,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS taxed_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    # TPC-H Q11 shape: scalar-subquery threshold in HAVING — groups kept
    # only if they exceed a fraction of the global total (partsupp is
    # absent from the testdata; lineitem revenue stands in as the value)
    "sql_important_parts": f"""
    SELECT l_partkey,
           CAST(SUM({_REV}) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM({_REV}) > (
      SELECT SUM({_REV}) * 0.0005 FROM lineitem
    )
    """,
    # ratio-to-parent windows: each nation's share of its region's
    # revenue and of the global total, in one pass over the rollup
    "sql_percent_of_total": f"""
    WITH nation_rev AS (
      SELECT r_name, n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
      FROM region
      JOIN nation   ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name, revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY r_name), 8)
             AS share_of_region,
           ROUND(revenue / SUM(revenue) OVER (), 8) AS share_of_total
    FROM nation_rev
    """,
    # CUBE: all 2^2 grouping-set combinations in one pass, with GROUPING()
    # flags disambiguating the NULL-as-total rows from genuine NULLs
    "sql_cube": """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
}


def _make(name: str, text: str):
    @register(name, oracle=text)
    def _q(spark: SparkSession, sf_dir: str, _text=text) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_text)

    _q.__name__ = name
    _q.__doc__ = (
        "Shared-text SQL query (§3.1 lifecycle): the identical string "
        "runs through Catalyst here and through DuckDB as its own oracle."
    )
    return _q


for _name, _text in SHARED_SQL.items():
    _make(_name, _text)


@register(
    "sql_pipe_syntax",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      AND l_quantity >= 10
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0 `|>` operators): the Q1 pricing-summary
    shape written as a linear pipeline — FROM |> WHERE |> AGGREGATE ...
    GROUP BY |> ORDER BY. Parses to the exact same logical plan as the
    nested form (the oracle is the standard-SQL equivalent, since DuckDB
    has no pipe dialect), so Catalyst's optimizations — scan pruning,
    partial aggregation — are identical; this is a parser-level surface,
    not a new execution path."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        FROM lineitem
        |> WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |> WHERE l_quantity >= 10
        |> AGGREGATE CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty,
                     CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
                     CAST(COUNT(*) AS BIGINT) AS count_order
             GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@register(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 150000.00
      AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-argument API): the query text
    carries `:threshold` / `:status` placeholders and values bind at
    execution — templating without string interpolation, so user input
    can never rewrite the query shape (the SQL-injection-proof path a
    query service must use). Catalyst sees bound literals, so constant
    folding and pushdown behave exactly as with inline values; the
    oracle runs the same query with the literals inlined."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) > :threshold
          AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"threshold": 150000.00, "status": "O"},
    )
