"""Core slice: flagship query + scans / projections / filters.

Covers SURVEY.md §2.1 (OP02-OP09) and §2.2/§2.3 (OP12-OP22). Site
citations in each docstring point at the reference behavior the operator
re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.functions.strings import cents, dec
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables

# Exact revenue term used consistently across queries: decimal so the
# distributed sum is order-independent and oracle-exact.
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

# Hot-path variant: the same revenue term in exact 10^-4 units on BIGINT
# (functions.strings.cents rationale) — the hash aggregate sums primitive
# longs instead of decimal buffers, 2-4× faster per aggregate at any SF.
_REV_E4_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


def _rev() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))


def _rev_e4() -> F.Column:
    return cents("l_extendedprice") * (F.lit(100).cast("long") - cents("l_discount"))


@register(
    "flagship",
    oracle="""
    WITH rev AS (
      SELECT r_name, n_name,
             CAST(SUM({rev_e4}) AS DOUBLE) / 10000.0 AS revenue,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name, revenue, n_orders, revenue_rank
    FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY r_name ORDER BY revenue DESC, n_name) AS INT)
             AS revenue_rank
      FROM rev
    )
    WHERE revenue_rank <= 3
    """.format(rev_e4=_REV_E4_SQL),
)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nations by lineitem revenue within each region.

    The §2.7 capability bundle in one plan (SURVEY.md Phase 1): scan →
    pre-aggregation → 4-way join → exact aggregation (OP43) with a
    distinct-order count (OP44) → ranking window (OP45) → filter
    (OP47-style top-k per group).

    Scale design: lineitem is reduced FIRST — revenue pre-aggregated per
    l_orderkey, so (a) the biggest fact collapses ~4× before any join,
    (b) the orderkey shuffle is shared by the aggregation and the orders
    join (one exchange of the big side total), and (c) the distinct order
    count becomes a plain count (one row per order post-agg) — no
    expand/two-phase distinct machinery over fact volume. Measured ~30%
    faster than the join-then-countDistinct form at sf0.1, and the gap
    widens with lines-per-order. nation/region are bounded dims →
    broadcast (never shuffled); customer/orders are PLAIN joins — never
    force-broadcast — so Catalyst/AQE broadcasts them at small SF and
    shuffles on the key at scale. The window partitions by r_name only
    AFTER reduction to ≤(nations) rows, so it never sees fact volume.

    Job-floor note (r8): a 2-job variant (per-customer pre-agg, all dims
    as post-reduction SHUFFLE_HASH joins) was built and interleaved-A/B'd
    against this 5-job form at sf0.1 — 0.48/0.53 min vs 0.57-0.81: the
    extra fact-grain custkey exchange costs MORE than three tiny
    broadcast-build jobs, so job count alone is not the cost model and
    the broadcast form stays (BASELINE.md r8 section has the full A/B;
    the same rework DID win on op49/op28/bloom, where it removed
    exchanges or fact broadcasts instead of adding one).
    """
    t = load_tables(spark, sf_dir)
    per_order = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(_rev_e4()).alias("order_rev_e4"))
    )
    rev = (
        per_order
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        # Two-level exact sum: long partials per (group, partition) — a
        # partition's row count is bounded, so the ≤10^10-per-order term
        # can't overflow — then decimal(38,0) over the tiny partial rows,
        # so nation-level totals survive 10^10-order groups at 100 TB.
        .groupBy("r_name", "n_name", F.spark_partition_id().alias("_pid"))
        .agg(
            F.sum("order_rev_e4").alias("_rev_part"),
            F.count(F.lit(1)).alias("_n_part"),
        )
        .groupBy("r_name", "n_name")
        .agg(
            (
                F.sum(F.col("_rev_part").cast("decimal(38,0)")).cast("double")
                / 10000.0
            ).alias("revenue"),
            F.sum("_n_part").alias("n_orders"),
        )
    )
    w = Window.partitionBy("r_name").orderBy(F.desc("revenue"), F.asc("n_name"))
    return (
        rev.withColumn("revenue_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("revenue_rank") <= 3)
        .select("r_name", "n_name", "revenue", "n_orders", "revenue_rank")
    )


@register(
    "op02_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 45
    """,
)
def op02_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with column projection + filter pushdown (OP02).

    Reference: positional-column CSV projection `pl.read_csv(columns=[...])`
    (scripts/build_db.py:104-108). In Spark the select/filter reach the
    parquet reader via Catalyst (ReadSchema + PushedFilters) — verified in
    tests/test_plans.py.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select("l_orderkey", "l_linenumber", "l_quantity").filter(
        F.col("l_quantity") > 45
    )


@register(
    "op03_date_parse",
    oracle="""
    SELECT o_orderkey,
           CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS o_date,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month
    FROM orders
    """,
)
def op03_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String↔date round-trip + date-part extraction (OP03).

    Reference: `try_parse_dates=True` CSV inference
    (scripts/build_db.py:455-461, :489-495). The engine policy is explicit
    parse formats instead of inference (SURVEY.md §7 hard part 5): format
    to 'yyyy-MM-dd' text and parse back with an explicit pattern.
    """
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd"), "yyyy-MM-dd").alias("o_date"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
    )


@register(
    "op04_literal_table",
    oracle="""
    SELECT pr.priority_rank,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3),
                 ('4-NOT SPECIFIED', 4), ('5-LOW', 5))
         AS pr(o_orderpriority, priority_rank)
      ON orders.o_orderpriority = pr.o_orderpriority
    GROUP BY pr.priority_rank
    """,
)
def op04_literal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal in-memory lookup table joined to a fact (OP04).

    Reference: constant `pl.DataFrame({...})` lookup frames — event types
    (scripts/build_db.py:216-228), position types (:353-375). Spark:
    `createDataFrame` + broadcast join (a literal table is by definition
    broadcastable).
    """
    t = load_tables(spark, sf_dir)
    lookup = spark.createDataFrame(
        [
            ("1-URGENT", 1),
            ("2-HIGH", 2),
            ("3-MEDIUM", 3),
            ("4-NOT SPECIFIED", 4),
            ("5-LOW", 5),
        ],
        "o_orderpriority string, priority_rank int",
    )
    return (
        t["orders"]
        .join(F.broadcast(lookup), "o_orderpriority")
        .groupBy("priority_rank")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


@register(
    "op09_preview_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders ORDER BY o_orderkey LIMIT 5
    """,
)
def op09_preview_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic preview: ordered LIMIT (OP09).

    Reference: `SELECT * FROM t LIMIT 5` preview (scripts/build_db.py:86-92).
    An unordered LIMIT is non-deterministic on distributed data, so the
    engine's preview pins an order → Spark plans TakeOrderedAndProject
    (no full sort, no full shuffle).
    """
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
        .limit(5)
    )


@register(
    "op12_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST({rev} AS DOUBLE) AS net_price,
           CAST({rev} * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS charged_price
    FROM lineitem
    """.format(rev=_REV_SQL),
)
def op12_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed expressions (OP12/OP41).

    Reference: every table build is a `select` of computed expressions
    (e.g. scripts/build_db.py:143-148, :756-785); integer arithmetic in
    exprs at :985-989, :1297-1300.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    one = F.lit(1).cast("decimal(18,2)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _rev().cast("double").alias("net_price"),
        (_rev() * (one + dec("l_tax"))).cast("double").alias("charged_price"),
    )


@register(
    "op14_rename",
    oracle="""
    SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
           s_nationkey AS nation_id, s_acctbal AS account_balance
    FROM supplier
    """,
)
def op14_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk column rename (OP14/OP13).

    Reference: `rename({...})` (scripts/build_db.py:671-673, :752, :1232).
    """
    s = load_tables(spark, sf_dir)["supplier"]
    return s.withColumnsRenamed(
        {
            "s_suppkey": "supplier_id",
            "s_name": "supplier_name",
            "s_nationkey": "nation_id",
            "s_acctbal": "account_balance",
        }
    )


@register(
    "op15_drop",
    oracle="SELECT p_partkey, p_name, p_brand, p_type FROM part",
)
def op15_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop columns (OP15) — reference scripts/build_db.py:256, :607,
    :674-678. Catalyst folds the drop into scan-level column pruning."""
    p = load_tables(spark, sf_dir)["part"]
    return p.drop("p_size", "p_retailprice")


@register(
    "op16_with_column",
    oracle="""
    SELECT o_orderkey,
           (o_orderstatus = 'O') AS is_open,
           CASE WHEN o_totalprice >= 300000 THEN 'large' ELSE 'small' END AS size_band
    FROM orders
    """,
)
def op16_with_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add/replace columns on an existing frame (OP16).

    Reference: `with_columns` (scripts/build_db.py:903-906, :1056-1062,
    :1156-1158).
    """
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.withColumn("is_open", F.col("o_orderstatus") == "O")
        .withColumn(
            "size_band",
            F.when(F.col("o_totalprice") >= 300000, "large").otherwise("small"),
        )
        .select("o_orderkey", "is_open", "size_band")
    )


@register(
    "op17_filter_eq",
    oracle="SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F'",
)
def op17_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter (OP17) — reference `.filter(pl.col('value')==1)`
    (scripts/build_db.py:1080, :1098, :1188, :1195). Pushed to the scan."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_custkey")


@register(
    "op18_when_chain",
    oracle="""
    SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'critical'
                WHEN o_orderpriority = '2-HIGH' THEN 'elevated'
                WHEN o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED') THEN 'normal'
                ELSE 'low' END AS urgency,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
    """,
)
def op18_when_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch conditional mapping (OP18) + membership predicate (OP19).

    Reference: the 11 when/then/otherwise chains — event typing
    (scripts/build_db.py:234-240), position→type map (:414-428), stage
    classification (:585-591, :958-974), penalty nulling (:996-1010), etc.
    """
    o = load_tables(spark, sf_dir)["orders"]
    urgency = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "critical")
        .when(F.col("o_orderpriority") == "2-HIGH", "elevated")
        .when(F.col("o_orderpriority").isin("3-MEDIUM", "4-NOT SPECIFIED"), "normal")
        .otherwise("low")
    )
    return o.groupBy(urgency.alias("urgency")).agg(F.count("*").alias("n"))


@register(
    "op19_isin",
    oracle="""
    SELECT p_partkey, p_type FROM part
    WHERE p_type IN ('ECONOMY', 'PROMO')
    """,
)
def op19_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership predicate (OP19) — reference `is_in([...])`
    (scripts/build_db.py:234, :416-419). Compiles to an In filter pushed
    to the scan."""
    p = load_tables(spark, sf_dir)["part"]
    return p.filter(F.col("p_type").isin("ECONOMY", "PROMO")).select(
        "p_partkey", "p_type"
    )


@register(
    "op20_null_test",
    oracle="""
    SELECT o_orderkey, (NULLIF(o_orderstatus, 'O') IS NULL) AS is_open
    FROM orders
    """,
)
def op20_null_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null test (OP20) — reference `is_null()` on the host-flag probe
    (scripts/build_db.py:837). NULLIF manufactures nulls so both branches
    are exercised on data with no natural nulls."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull().alias("is_open"),
    )


@register(
    "op21_contains",
    oracle="""
    SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%widget%'
    """,
)
def op21_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring predicate (OP21) — reference `str.contains('Group')`
    (scripts/build_db.py:760, :959)."""
    p = load_tables(spark, sf_dir)["part"]
    return p.filter(F.col("p_name").contains("widget")).select("p_partkey", "p_name")


@register(
    "op22_endswith",
    oracle="SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%bolt'",
)
def op22_endswith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix predicate (OP22) — reference `str.ends_with('s')`
    (scripts/build_db.py:763, :962)."""
    p = load_tables(spark, sf_dir)["part"]
    return p.filter(F.col("p_name").endswith("bolt")).select("p_partkey", "p_name")


@register(
    "op05_lazy_plan",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 0
    GROUP BY n_name
    """,
)
def op05_lazy_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy plan construction (OP05) — reference `.lazy()` defers every
    Polars pipeline until DuckDB's load scans it (scripts/build_db.py:108,
    :72-83). Spark DataFrames are lazy by construction: this chain of
    scan→filter→join→agg builds only a Catalyst logical plan; nothing
    executes until the caller's action, and the optimizer sees the whole
    pipeline (filter is pushed below the join into the customer scan)."""
    t = load_tables(spark, sf_dir)
    plan = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return plan
