"""Fourth analytics batch (EXTENSION): MATCH_RECOGNIZE-style event-pattern
matching, an exact covariance matrix, order-independent table checksums,
the Mann-Whitney rank-sum test, and Apriori 3-itemset mining.

Scale shape: every operator reduces the fact to a grouped/derived set
before any global or quadratic step — pattern matching compresses each
user's history to a compact symbol string, covariances are algebraic
decimal moment sums (partial-combinable), checksums are commutative
hash sums, rank statistics run on value-grouped counts, and itemset
mining prunes by broadcast frequent-pair sets (downward closure) before
any triple is counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.relational import (
    distributed_running_sum,
)
from world_cup_duckdb_spark.queries import register, tracked_persist
from world_cup_duckdb_spark.sources.catalog import load_tables


@register(
    "ext_match_recognize",
    oracle="""
    WITH s AS (
      -- ts IS NOT NULL on both sides: a null-ts event has no position
      -- in the symbol sequence (Spark's array_sort would place its
      -- struct first, this ORDER BY last)
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    )
    SELECT user_id,
           CAST(len(seq) AS INTEGER) AS n_events,
           CAST(len(regexp_extract_all(seq, 'v+cp')) AS INTEGER)
             AS n_browse_buy,
           CAST(COALESCE(list_max(list_transform(
                  regexp_extract_all(seq, 'v+'), x -> len(x))), 0)
                AS INTEGER) AS longest_view_run
    FROM s
    """,
)
def ext_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style complex-event pattern detection: compress
    each user's event history into an ordered symbol string (one char per
    event type) and run regex patterns over it — here `v+cp` ("a run of
    views, then a click, then a purchase"), counting non-overlapping
    browse-to-buy episodes and the longest uninterrupted view run. The
    regex-over-symbols trick gives full SQL:2016 row-pattern semantics
    (greedy quantifiers, alternation) without a dedicated operator.

    Scale: one shuffle on user_id; each user's history compresses to a
    byte-per-event string before any matching, so state is bounded by
    history length, and the regex runs JVM-side per row. Determinism:
    explicit (ts, event_id) ordering inside the sorted-struct aggregation;
    leftmost non-overlapping matching is identical in Java regex and RE2
    for this pattern class; all outputs are integers."""
    e = load_tables(spark, sf_dir)["events"]
    # ts IS NOT NULL mirrors the oracle (null ts has no sequence position)
    s = (
        e.filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("us"),
                "event_id",
                F.substring("event_type", 1, 1).alias("ini"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "concat_ws('', transform(array_sort(collect_list(ev)),"
                " x -> x.ini))"
            ).alias("seq")
        )
    )
    return s.select(
        "user_id",
        F.length("seq").cast("int").alias("n_events"),
        F.expr("size(regexp_extract_all(seq, 'v+cp', 0))")
        .cast("int")
        .alias("n_browse_buy"),
        F.coalesce(
            F.expr(
                "array_max(transform(regexp_extract_all(seq, 'v+', 0),"
                " x -> length(x)))"
            ),
            F.lit(0),
        )
        .cast("int")
        .alias("longest_view_run"),
    )


_COV_COLS = ["qty", "price", "disc", "tax"]
_COV_DEC = {
    "qty": "CAST(l_quantity AS DECIMAL(4,0))",
    "price": "CAST(l_extendedprice AS DECIMAL(12,2))",
    "disc": "CAST(l_discount AS DECIMAL(4,2))",
    "tax": "CAST(l_tax AS DECIMAL(4,2))",
}


def _cov_oracle() -> str:
    pair_rows = []
    for i, x in enumerate(_COV_COLS):
        for y in _COV_COLS[i:]:
            pair_rows.append(
                f"SELECT '{x}' AS var1, '{y}' AS var2,"
                f" ROUND(CAST(sxy_{x}_{y} AS DOUBLE) / n"
                f" - (CAST(sx_{x} AS DOUBLE) / n)"
                f" * (CAST(sx_{y} AS DOUBLE) / n), 4) + 0.0 AS cov FROM m"
            )
    sums = ["COUNT(*) AS n"]
    for x in _COV_COLS:
        sums.append(f"SUM({_COV_DEC[x]}) AS sx_{x}")
    for i, x in enumerate(_COV_COLS):
        for y in _COV_COLS[i:]:
            sums.append(f"SUM({_COV_DEC[x]} * {_COV_DEC[y]}) AS sxy_{x}_{y}")
    return (
        "WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(pair_rows)
    )


@register("ext_covariance_matrix", oracle=_cov_oracle())
def ext_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance matrix (upper triangle, long form) over the
    lineitem numeric columns — the feature-correlation profile computed
    the way a 100 TB engine must: as algebraic moment sums (Σx, Σxy, n)
    that partial-combine map-side, never via a per-pair data pass.

    Determinism: every moment is an exact decimal sum (quantities and
    rates fit DECIMAL(4,·), money DECIMAL(12,2); products stay within
    precision 38 so no silent scale loss), making the sums accumulation-
    order exact; cov = Sxy/n − (Sx/n)(Sy/n) is then three deterministic
    IEEE ops per pair, ROUND()ed to 4 to absorb the decimal→double cast's
    last-ulp difference between engines. One aggregate row fans out to
    the 10-row matrix via a literal pair spine."""
    li = load_tables(spark, sf_dir)["lineitem"]
    exprs = [F.count(F.lit(1)).alias("n")]
    dec = {
        "qty": F.col("l_quantity").cast("decimal(4,0)"),
        "price": F.col("l_extendedprice").cast("decimal(12,2)"),
        "disc": F.col("l_discount").cast("decimal(4,2)"),
        "tax": F.col("l_tax").cast("decimal(4,2)"),
    }
    pairs = [
        (x, y) for i, x in enumerate(_COV_COLS) for y in _COV_COLS[i:]
    ]
    for x in _COV_COLS:
        exprs.append(F.sum(dec[x]).alias(f"sx_{x}"))
    for x, y in pairs:
        exprs.append(F.sum(dec[x] * dec[y]).alias(f"sxy_{x}_{y}"))
    m = li.agg(*exprs)
    # One aggregate pass; the 10-row matrix comes from exploding a literal
    # pair spine against the single moment row (never 10 scans).
    spine = F.explode(
        F.array(
            *[
                F.struct(F.lit(x).alias("var1"), F.lit(y).alias("var2"))
                for x, y in pairs
            ]
        )
    ).alias("pair")
    covs = {
        # + 0.0 normalizes IEEE -0.0 (a tiny negative cov rounded to zero)
        # so both engines render the same zero.
        (x, y): F.round(
            F.col(f"sxy_{x}_{y}").cast("double") / F.col("n")
            - (F.col(f"sx_{x}").cast("double") / F.col("n"))
            * (F.col(f"sx_{y}").cast("double") / F.col("n")),
            4,
        )
        + F.lit(0.0)
        for x, y in pairs
    }
    cov = None
    for (x, y), expr in covs.items():
        cond = (F.col("pair.var1") == x) & (F.col("pair.var2") == y)
        cov = F.when(cond, expr) if cov is None else cov.when(cond, expr)
    return m.select(spine, *[F.col(c) for c in m.columns]).select(
        F.col("pair.var1").alias("var1"),
        F.col("pair.var2").alias("var2"),
        cov.alias("cov"),
    )


_CK_HEX = 14  # 56 bits per row: sums fit DECIMAL(38,0) at any scale


@register(
    "ext_table_checksum",
    oracle=f"""
    WITH h AS (
      SELECT l_returnflag,
             ('0x' || substring(md5(concat_ws(chr(31),
                 COALESCE(CAST(l_orderkey AS VARCHAR), '␀'),
                 COALESCE(CAST(l_linenumber AS VARCHAR), '␀'),
                 COALESCE(CAST(l_partkey AS VARCHAR), '␀'),
                 COALESCE(CAST(l_suppkey AS VARCHAR), '␀'),
                 COALESCE(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                               AS VARCHAR), '␀'),
                 COALESCE(CAST(CAST(l_discount AS DECIMAL(8,2))
                               AS VARCHAR), '␀'),
                 COALESCE(CAST(l_shipdate AS VARCHAR), '␀'),
                 COALESCE(l_linestatus, '␀')
             )), 1, {_CK_HEX}))::BIGINT AS h
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(h) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
    FROM h GROUP BY 1
    """,
)
def ext_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum per shard (return flag): md5
    each row's canonical rendering, keep 56 bits, and SUM — the
    replication/migration reconciliation primitive. Two copies of a table
    agree iff (n_rows, checksum) agree per shard; a commutative sum makes
    the result independent of row order, partitioning, and engine.

    Canonical rendering: fields joined with an unprintable separator,
    NULLs as a sentinel (concat_ws would silently drop them), and money
    through DECIMAL rendering (raw double formatting diverges between
    engines for extreme values; decimal strings never do).

    Scale: map-only hashing plus a partial-combinable sum per shard — no
    shuffle wider than the group-by. 56-bit terms keep the DECIMAL(38,0)
    sum overflow-free past 10^21 rows. Determinism: md5 and integer
    arithmetic only."""
    li = load_tables(spark, sf_dir)["lineitem"]
    sent = "␀"
    parts = [
        F.coalesce(F.col("l_orderkey").cast("string"), F.lit(sent)),
        F.coalesce(F.col("l_linenumber").cast("string"), F.lit(sent)),
        F.coalesce(F.col("l_partkey").cast("string"), F.lit(sent)),
        F.coalesce(F.col("l_suppkey").cast("string"), F.lit(sent)),
        F.coalesce(
            F.col("l_extendedprice").cast("decimal(18,2)").cast("string"),
            F.lit(sent),
        ),
        F.coalesce(
            F.col("l_discount").cast("decimal(8,2)").cast("string"),
            F.lit(sent),
        ),
        F.coalesce(F.col("l_shipdate").cast("string"), F.lit(sent)),
        F.coalesce(F.col("l_linestatus"), F.lit(sent)),
    ]
    h = li.select(
        "l_returnflag",
        F.conv(
            F.substring(F.md5(F.concat_ws("", *parts)), 1, _CK_HEX),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    # The sum is rendered as its exact decimal STRING: a decimal(38,0)
    # survives neither engine's pandas bridge identically (Spark emits
    # Decimal, DuckDB float64 — which has already lost bits at 2^53),
    # while the digit string is exact and portable at any magnitude.
    return h.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("h").cast("decimal(28,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("checksum"),
    )


@register(
    "ext_mann_whitney",
    oracle="""
    WITH v AS (
      SELECT o_totalprice AS val,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a
      FROM orders
    ),
    g AS (
      SELECT val, SUM(a) AS ca, COUNT(*) - SUM(a) AS cb, COUNT(*) AS c
      FROM v GROUP BY 1
    ),
    r AS (
      SELECT ca, cb, c,
             COALESCE(SUM(c) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1) / 2.0 AS avg_rank
      FROM g
    ),
    s AS (
      SELECT SUM(ca) AS na, SUM(cb) AS nb,
             CAST(SUM(CAST(ca AS DECIMAL(10,0))
                      * CAST(avg_rank AS DECIMAL(20,1))) AS DOUBLE) AS ra,
             SUM(CAST(c AS DECIMAL(12,0)) * CAST(c AS DECIMAL(12,0))
                 * CAST(c AS DECIMAL(12,0)) - c) AS ties
      FROM r
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           ra - na * (na + 1) / 2.0 AS u_a,
           ROUND((ra - na * (na + 1) / 2.0 - na * CAST(nb AS DOUBLE) / 2.0)
                 / sqrt(na * CAST(nb AS DOUBLE) / 12.0
                        * ((na + nb + 1)
                           - CAST(ties AS DOUBLE)
                             / ((na + nb) * CAST(na + nb - 1 AS DOUBLE)))),
                 9) AS z
    FROM s
    """,
)
def ext_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: do URGENT orders have stochastically
    larger totals than the rest? Nonparametric two-sample comparison —
    the distribution-free sibling of ext_ab_test's proportion z-test —
    with midrank tie handling and the tie-corrected normal approximation.

    Scale: the fact reduces to one row per distinct value (counts per
    group) before ranking, so the rank window runs over the value
    cardinality, not the row count, and U comes from one more aggregate.
    Determinism: midranks are exact halves (k + (c+1)/2), so every
    ca·avg_rank term is an exact DECIMAL(20,1) — the rank-sum is
    accumulation-order exact; the tie term Σ(c³−c) is exact integer; only
    the final sqrt/divide are IEEE, and z is ROUND()ed to 9."""
    o = load_tables(spark, sf_dir)["orders"]
    v = o.select(
        F.col("o_totalprice").alias("val"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("a"),
    )
    g = v.groupBy("val").agg(
        F.sum("a").alias("ca"),
        (F.count(F.lit(1)) - F.sum("a")).alias("cb"),
        F.count(F.lit(1)).alias("c"),
    )
    # Exclusive prefix of tie-group sizes via distributed_running_sum
    # (operators/relational.py): range shuffle + broadcast partition
    # offsets — the window form (`SUM(c) OVER (ORDER BY val)`) is a
    # single-partition sort that at 100× the distinct-value cardinality
    # funnels the whole relation through one task (VERDICT r6 item 4).
    # Bare "val" gets asc_nulls_last: a NULL-val group must rank AFTER
    # every real value (the oracle's default), not shift every real
    # rank from the front. val is the group key, so the order is total
    # and the prefix equals the ANSI window exactly.
    r = distributed_running_sum(
        g, ["val"], "c", out_col="_before", inclusive=False
    ).select(
        "ca",
        "cb",
        "c",
        (F.col("_before") + (F.col("c") + 1) / F.lit(2.0)).alias("avg_rank"),
    )
    s = r.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("ca").cast("decimal(10,0)")
            * F.col("avg_rank").cast("decimal(20,1)")
        )
        .cast("double")
        .alias("ra"),
        F.sum(
            F.col("c").cast("decimal(12,0)")
            * F.col("c").cast("decimal(12,0)")
            * F.col("c").cast("decimal(12,0)")
            - F.col("c")
        ).alias("ties"),
    )
    na, nb = F.col("na"), F.col("nb")
    u_a = F.col("ra") - na * (na + 1) / F.lit(2.0)
    mu = na * nb.cast("double") / 2.0
    n = na + nb
    # try_divide: n <= 1 zeroes the ties denominator — DuckDB's /0 is
    # NULL, and the z guard below then yields NULL rather than ANSI error
    sigma2 = (
        na * nb.cast("double") / 12.0
        * (
            (n + 1)
            - F.try_divide(
                F.col("ties").cast("double"), n * (n - 1).cast("double")
            )
        )
    )
    return s.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        u_a.alias("u_a"),
        # z is NULL when either sample is empty (sigma2 = 0): the
        # oracle's x/0.0 is NULL, an unguarded divide is an ANSI error
        F.when(
            sigma2 > 0, F.round((u_a - mu) / F.sqrt(sigma2), 9)
        ).alias("z"),
    )


_SUPPORT_PM = 1  # a triple is frequent if it appears in ≥0.1% of orders


@register(
    "ext_apriori_triples",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, p_brand AS p
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    tot AS (SELECT COUNT(DISTINCT o) AS n_orders FROM items)
    SELECT a.p AS item_a, b.p AS item_b, c.p AS item_c,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM items a
    JOIN items b ON a.o = b.o AND b.p > a.p
    JOIN items c ON b.o = c.o AND c.p > b.p
    GROUP BY 1, 2, 3
    HAVING COUNT(*) * 1000 >= {_SUPPORT_PM} * (SELECT n_orders FROM tot)
    """,
)
def ext_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets (part brands bought together in an order) via
    the Apriori level-wise method: count pairs, keep the frequent ones
    (L2), and only count triples whose THREE sub-pairs are all frequent —
    downward closure guarantees this pruning is lossless, and the oracle
    (the naive all-triples GROUP BY ... HAVING) proves it by hash match.
    Support is RELATIVE (≥0.1% of orders), so the result stays meaningful
    at every scale factor — an absolute count would go empty as the key
    space grows.

    Scale: this is why Apriori exists — at 100 TB the all-triples
    generate-then-filter explodes combinatorially, while L2 is small
    enough to BROADCAST, so candidate triples are pruned with map-side
    semi-joins before the only wide shuffle (the final triple count).
    The brand rollup (broadcast dim join) bounds the item alphabet.
    Determinism: integer keys and counts only."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    pt = t["part"].select("p_partkey", "p_brand")
    items = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("p"))
        .distinct()
    )
    # tot (1 row) and l2 (frequent pairs — broadcast-sized BY the
    # algorithm's own premise) are each consumed by multiple branches;
    # without the persist cuts every consumer re-executes the fact join
    # and, for l2, the whole pair self-join (plan census r10: 26 parquet
    # scans; 8 after). items itself is ORDER-GRAIN and deliberately
    # NOT persisted — recomputing it is the memory-safe choice.
    tot = items.agg(F.count_distinct("o").alias("n_orders")).transform(
        tracked_persist
    )
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b, (F.col("a.o") == F.col("b.o")) & (F.col("b.p") > F.col("a.p"))
    ).select(F.col("a.o").alias("o"), F.col("a.p").alias("x"), F.col("b.p").alias("y"))
    l2 = (
        pairs.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n") * 1000 >= _SUPPORT_PM * F.col("n_orders"))
        .select("x", "y")
        .transform(tracked_persist)
    )
    p2 = pairs.join(F.broadcast(l2), ["x", "y"])
    c = items.select(F.col("o").alias("co"), F.col("p").alias("z"))
    tri = (
        p2.join(c, (F.col("o") == F.col("co")) & (F.col("z") > F.col("y")))
        .select("o", "x", "y", "z")
        .join(
            F.broadcast(l2.select(F.col("x").alias("x2"), F.col("y").alias("z2"))),
            (F.col("x") == F.col("x2")) & (F.col("z") == F.col("z2")),
        )
        .join(
            F.broadcast(l2.select(F.col("x").alias("y3"), F.col("y").alias("z3"))),
            (F.col("y") == F.col("y3")) & (F.col("z") == F.col("z3")),
        )
    )
    return (
        tri.groupBy(
            F.col("x").alias("item_a"),
            F.col("y").alias("item_b"),
            F.col("z").alias("item_c"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("support") * 1000 >= _SUPPORT_PM * F.col("n_orders"))
        .drop("n_orders")
    )
