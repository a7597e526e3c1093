"""SQL-surface batch 3: dialect conveniences a DuckDB user reaches for
daily — QUALIFY, DISTINCT ON, star EXCLUDE/REPLACE, inline VALUES,
NATURAL JOIN, ILIKE, TRY_CAST, generate_series spines, list
comprehensions, and ntile bucketing.

Same rationale as batches 1-2 (SURVEY.md §2.7: the reference repo's
purpose is to BE queried in DuckDB SQL): every query a reference user
runs must have a spelling here. Where Spark lacks the dialect form
(QUALIFY, DISTINCT ON, EXCLUDE/REPLACE), the Spark side expresses the
identical semantics with the idiomatic window/subquery/projection form
and the oracle carries the DuckDB spelling — the pair documents the
translation a migrating user needs.

Determinism notes: every pick/bucket carries a total tie-break order;
list-comprehension outputs reduce to scalars (the driver's pandas-sort
canonicalizer rejects array cells); TRY_CAST failures are NULL in both
engines by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import register_views


@register(
    "sql_qualify",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) = 1
    """,
)
def sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's single largest order — DuckDB's QUALIFY clause
    (filter on a window result without a subquery) vs the portable
    window-in-subquery spelling Spark requires. Identical plans after
    optimization: one hash exchange on the partition key, a
    WindowGroupLimit-able rank, a filter.

    Scale: partition count = customers (uniform key); the rank-=1
    filter truncates per group during the sort."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn = 1
    """)


@register(
    "sql_distinct_on",
    oracle="""
    SELECT DISTINCT ON (c_nationkey)
           CAST(c_nationkey AS INT) AS c_nationkey, c_custkey,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer
    ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """,
)
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Richest customer per nation — DuckDB/Postgres DISTINCT ON (the
    first row of each key under the query's ORDER BY) vs Spark's
    row_number pick. DISTINCT ON without a total order is
    nondeterministic in ANY engine; the tie-break on c_custkey is what
    makes the two spellings provably equal."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(c_nationkey AS INT) AS c_nationkey, c_custkey,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM (
          SELECT c_nationkey, c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer
        ) WHERE rn = 1
    """)


@register(
    "sql_star_exclude_replace",
    oracle="""
    SELECT * EXCLUDE (p_name, p_type)
             REPLACE (upper(p_brand) AS p_brand,
                      CAST(p_retailprice AS DOUBLE) AS p_retailprice)
    FROM part WHERE p_size <= 10
    """,
)
def sql_star_exclude_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-projection surgery — DuckDB's SELECT * EXCLUDE/REPLACE vs
    the explicit-projection spelling. A schema-evolution staple: drop
    the wide text columns, normalize brand casing and price type, keep
    everything else positionally intact."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT p_partkey, upper(p_brand) AS p_brand, p_size,
               CAST(p_retailprice AS DOUBLE) AS p_retailprice
        FROM part WHERE p_size <= 10
    """)


@register(
    "sql_values_inline",
    oracle="""
    SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN (VALUES ('low', -1000.0, 1000.0),
                 ('mid', 1000.0, 5000.0),
                 ('high', 5000.0, 100000.0)) AS t(tier, lo, hi)
      ON c_acctbal >= t.lo AND c_acctbal < t.hi
    GROUP BY t.tier
    """,
)
def sql_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES as a first-class relation: a literal tier table
    range-joined to customers — the ad-hoc bucketing idiom that needs no
    DDL. Both engines support VALUES; only the FROM-clause nesting
    differs.

    Scale: the literal side is 3 rows — Spark broadcasts it and the
    range join is a map-side BroadcastNestedLoopJoin over one customer
    scan (bounded 3x row amplification, then hash-agg)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer
        JOIN (SELECT * FROM VALUES ('low', -1000.0D, 1000.0D),
                                   ('mid', 1000.0D, 5000.0D),
                                   ('high', 5000.0D, 100000.0D)
              AS v(tier, lo, hi)) t
          ON c_acctbal >= t.lo AND c_acctbal < t.hi
        GROUP BY t.tier
    """)


@register(
    "sql_natural_join",
    oracle="""
    WITH n AS (
      SELECT n_nationkey AS nationkey, n_name, n_regionkey AS regionkey
      FROM nation
    ),
    r AS (SELECT r_regionkey AS regionkey, r_name FROM region)
    SELECT n_name, r_name, CAST(nationkey AS INT) AS nationkey
    FROM n NATURAL JOIN r
    """,
)
def sql_natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN over a shared-name CTE rename — the implicit
    equi-join on every common column, identical in both dialects. The
    rename CTE is the point: the fixture's prefixed columns (n_, r_)
    mean natural joins only arise after projection, exactly how users
    hit them."""
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH n AS (
          SELECT n_nationkey AS nationkey, n_name, n_regionkey AS regionkey
          FROM nation
        ),
        r AS (SELECT r_regionkey AS regionkey, r_name FROM region)
        SELECT n_name, r_name, CAST(nationkey AS INT) AS nationkey
        FROM n NATURAL JOIN r
    """)


@register(
    "sql_ilike",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name ILIKE '%GREEN%' OR p_name ILIKE 'sm%'
    """,
)
def sql_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive LIKE — ILIKE is native in both engines (Spark
    since 3.3); the predicate pushes to the scan like any string
    filter. Mixed-case patterns on both sides prove the
    case-insensitivity rather than just the spelling."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT p_partkey, p_name
        FROM part
        WHERE p_name ILIKE '%GREEN%' OR p_name ILIKE 'sm%'
    """)


@register(
    "sql_try_cast",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(TRY_CAST(substring(p_name, 1, 2) AS INTEGER))
                AS BIGINT) AS n_numeric_prefix,
           CAST(COUNT(TRY_CAST(p_brand AS DOUBLE)) AS BIGINT) AS n_brandnum,
           CAST(SUM(COALESCE(TRY_CAST(substring(p_name, 1, 2) AS INTEGER), 0))
                AS BIGINT) AS prefix_sum
    FROM part
    """,
)
def sql_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST over dirty strings: failed casts yield NULL (never an
    error) in both engines — the ingestion idiom for semi-trusted text
    columns, and the opposite of the engine's ANSI strict-cast default.
    Counting the successes doubles as a data-quality metric."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(TRY_CAST(substring(p_name, 1, 2) AS INTEGER))
                    AS BIGINT) AS n_numeric_prefix,
               CAST(COUNT(TRY_CAST(p_brand AS DOUBLE)) AS BIGINT) AS n_brandnum,
               CAST(SUM(COALESCE(TRY_CAST(substring(p_name, 1, 2) AS INTEGER), 0))
                    AS BIGINT) AS prefix_sum
        FROM part
    """)


@register(
    "sql_generate_series",
    oracle="""
    WITH months AS (
      SELECT unnest(generate_series(1, 12)) AS month
    ),
    per_month AS (
      SELECT CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS month,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
      GROUP BY 1
    )
    SELECT CAST(m.month AS INT) AS month,
           CAST(COALESCE(p.n_orders, 0) AS BIGINT) AS n_orders
    FROM months m LEFT JOIN per_month p ON m.month = p.month
    """,
)
def sql_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar spine via a series generator — DuckDB's
    generate_series table function vs Spark's explode(sequence(...)) —
    left-joined to monthly order counts so empty months surface as
    zeros instead of vanishing (the gap a bare GROUP BY leaves).

    Complements sql_recursive_calendar: same spine need, the
    table-function spelling instead of the recursive-CTE one."""
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH months AS (
          SELECT explode(sequence(1, 12)) AS month
        ),
        per_month AS (
          SELECT CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS month,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995
          GROUP BY 1
        )
        SELECT CAST(m.month AS INT) AS month,
               CAST(COALESCE(p.n_orders, 0) AS BIGINT) AS n_orders
        FROM months m LEFT JOIN per_month p ON m.month = p.month
    """)


@register(
    "sql_list_comprehension",
    oracle="""
    SELECT p_partkey,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
           CAST(list_sum(list_transform(string_split(p_name, ' '),
                                        w -> length(w) * length(w)))
                AS BIGINT) AS sq_len_sum
    FROM part
    WHERE p_partkey <= 200
    """,
)
def sql_list_comprehension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order pipeline fully inside SQL: split each part
    name, square every word length, sum — DuckDB's list_transform /
    list_sum vs Spark's transform / aggregate lambdas. The output
    reduces to scalars (array cells would crash the driver's pandas
    canonicalizer — the ext_feature_hash lesson), so the comprehension
    itself is what the value hash checks."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT p_partkey,
               CAST(size(split(p_name, ' ')) AS INT) AS n_words,
               CAST(aggregate(transform(split(p_name, ' '),
                                        w -> length(w) * length(w)),
                              0L, (acc, x) -> acc + x)
                    AS BIGINT) AS sq_len_sum
        FROM part
        WHERE p_partkey <= 200
    """)


@register(
    "sql_ntile",
    oracle="""
    WITH bucketed AS (
      SELECT c_custkey, c_acctbal,
             ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer
    )
    SELECT CAST(quartile AS INT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(c_acctbal) AS DOUBLE) AS lo,
           CAST(MAX(c_acctbal) AS DOUBLE) AS hi
    FROM bucketed
    GROUP BY quartile
    """,
)
def sql_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quartiles of customer balances via ntile — both
    engines implement the ISO distribution rule (the first n mod k
    buckets take the extra row), so bucket boundaries match exactly
    given the same total order (balance, then key).

    The single unpartitioned window runs over customer (a dimension);
    an equivalent over a fact table would ntile WITHIN partitions or
    use approx percentiles (ext_quantiles) instead."""
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH bucketed AS (
          SELECT c_custkey, c_acctbal,
                 ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
          FROM customer
        )
        SELECT CAST(quartile AS INT) AS quartile,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(c_acctbal) AS DOUBLE) AS lo,
               CAST(MAX(c_acctbal) AS DOUBLE) AS hi
        FROM bucketed
        GROUP BY quartile
    """)
