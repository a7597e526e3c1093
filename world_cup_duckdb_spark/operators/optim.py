"""Distributed-plan optimization primitives: Bloom semi-join reduction,
Z-order multi-dimensional clustering, count-min frequency sketching, and
priority sampling.

These are the classic techniques a 100 TB plan leans on when the built-in
strategies run out: a Bloom filter built from the small side prunes the big
side's rows BEFORE they shuffle (semi-join reduction / sideways information
passing — the idea behind Spark's AQE runtime bloom pruning, expressed here
as an explicit, portable operator); Z-ordering co-locates rows that are
close in two dimensions so min/max zone maps prune on both columns at once
(Morton order, the layout behind OPTIMIZE ZORDER in open table formats);
the count-min sketch answers frequency point queries from O(d·w) mergeable
state (Cormode & Muthukrishnan 2005); priority sampling draws a
weight-biased fixed-size sample with unbiased Horvitz-Thompson totals
(Duffield, Lund & Thorup, JACM 2007).

Everything here is integer / IEEE-754-exact arithmetic on JVM-side columns
(no UDFs, no transcendental functions), so results are bit-identical to the
DuckDB oracle running the same formulas. Hashing is an explicit
multiply-add-mod family (h(x) = (a·x + b) mod P mod m with P = 2^31 - 1):
`xxhash64`/`md5` would be faster but are not portable across engines, and
parity is the point of the differential gate. The reference has no
counterpart for any of this (it is single-process DuckDB, SURVEY.md §4) —
these are extension operators for the scale posture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1. Inputs are reduced mod P before the multiply so
#: a·x stays below 2^62 — no 64-bit overflow under ANSI mode, and the same
#: expression is exact in DuckDB.
MERSENNE_P = 2_147_483_647

#: (a, b) multiply-add parameters per hash row. Two independent rows give a
#: Bloom filter its k=2 probes and the CMS its d=2 counters.
HASH_PARAMS = ((1103, 12345), (2971, 6789))


def poly_hash(col: Column, row: int, m: int) -> Column:
    """h(x) = ((a·(x mod P) + b) mod P) mod m — portable integer hash."""
    a, b = HASH_PARAMS[row]
    x = col.cast("long") % MERSENNE_P
    return ((F.lit(a) * x + F.lit(b)) % MERSENNE_P) % m


def mix_hash(col: Column) -> Column:
    """Nonlinear portable mix: two quadratic rounds y ← (y² + a·y + b) mod P.

    A single multiply-add round is LINEAR in the input, so for sequential
    ids the output is locally linear too — fatal when the hash feeds a
    pseudo-uniform draw (priority sampling would correlate u with id and
    bias every priority). The quadratic term breaks linearity; values stay
    < P = 2^31-1, so y² < 2^62 never overflows signed 64-bit arithmetic in
    either engine — the same expression is exact in DuckDB."""
    y = col.cast("long") % MERSENNE_P
    for a, b in HASH_PARAMS:
        y = (y * y + F.lit(a) * y + F.lit(b)) % MERSENNE_P
    return y


def bloom_build(keys: DataFrame, key_col: str, m_bits: int) -> DataFrame:
    """Build a Bloom bitset from the distinct keys as (word, bits) rows.

    The bitset is data, not driver state: words assembled with a `bit_or`
    aggregate, so the build is one shuffle of at most m/63 rows and the
    result broadcasts to every probe task. k=2 probe positions per key
    (HASH_PARAMS rows). Words hold 63 bits (positions 0..62): a shift
    into bit 63 overflows signed BIGINT on ANSI engines (DuckDB errors on
    `1 << 63`), and portability of the exact arithmetic is the contract.
    """
    probes = None
    for row in range(len(HASH_PARAMS)):
        p = keys.select(poly_hash(F.col(key_col), row, m_bits).alias("pos"))
        probes = p if probes is None else probes.unionAll(p)
    return (
        probes.select(
            (F.col("pos") / 63).cast("long").alias("word"),
            # call_function: the Python shiftleft wrapper only takes a
            # literal int shift, the SQL function takes an expression.
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 63).cast("int")
            ).alias("one_bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("one_bit").alias("bits"))
    )


def bloom_bitmap(keys: DataFrame, key_col: str, m_bits: int) -> DataFrame:
    """The Bloom bitset as ONE row holding a ``map<word, bits>`` column.

    This is the shape sideways information passing actually ships at
    scale: the whole filter is a compact value (≤ m/63 map entries ≈ 1 KB
    at m=8192) broadcast to every scan task as a single-row nested-loop
    build, so a probe is a pure map lookup + bit test inside the scan's
    codegen stage — no per-probe broadcast HASH join relation, and only
    ONE join however many hash rows k the filter uses (``bloom_probe``
    pays one join per hash row). Same (word, bits) arithmetic as
    :func:`bloom_build`, so the DuckDB oracle mirrors it unchanged."""
    return bloom_build(keys, key_col, m_bits).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word"), F.col("bits")))
        ).alias("_bloom_bitmap")
    )


def bloom_semijoin_state(
    keys: DataFrame, key_col: str, m_bits: int
) -> DataFrame:
    """The COMPLETE sideways-information-passing state as ONE row: the
    Bloom bitset (``_bloom_words``) AND an EXACT membership bitset over
    the key domain (``_exact_words``), both as dense ``array<long>``
    columns, fused into a single broadcastable value built from ONE
    scan of the key relation.

    Why fuse (VERDICT r11 item 1): a query that needs both the
    approximate prune and the exact verdict — ext_bloom_semijoin counts
    candidates against exact matches — otherwise ships TWO broadcasts
    (the bitmap row and the key relation), each its own broadcast-build
    job; on a multi-job scheduler-floor-bound query that is the whole
    gap vs a single-process engine.

    Why dense arrays, not maps: Spark's MapType lookup is a LINEAR scan
    of ArrayBasedMapData — O(entries) per probe, which at fact-table
    row counts dominates the query (measured: the map-typed form spent
    ~2× the bare scan-agg wall in map scans). ``element_at`` on an
    array is an O(1) index, so both probes stay constant-time inside
    the scan's codegen stage (:func:`bitset_test`).

    The exact bitset is a DIRECT bitmap over the key domain (word =
    key/63), not a hash: no collisions, so membership is exact — the
    identity mapping is only viable because the contract requires a
    bounded non-negative integer key domain (a dimension PK: suppkey,
    custkey, …). Size is max(key)/63 longs — ~2 MB per 10^9 of domain
    width, the same order as broadcasting the key relation itself,
    which the two-broadcast form already required."""
    k = len(HASH_PARAMS)
    nw = m_bits // 63 + 1
    pts = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(0).alias("kind"),
                        poly_hash(F.col(key_col), r, m_bits).alias("pos"),
                    )
                    for r in range(k)
                ],
                F.struct(
                    F.lit(1).alias("kind"),
                    F.col(key_col).cast("long").alias("pos"),
                ),
            )
        ).alias("e")
    ).select("e.kind", "e.pos")
    # One word-grain exchange of ≤ m/63 + domain/63 rows; bit_or is the
    # map-side-combinable reduction.
    words = pts.groupBy(
        "kind", (F.col("pos") / 63).cast("long").alias("word")
    ).agg(
        F.bit_or(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 63).cast("int")
            )
        ).alias("bits")
    )
    # collect_list skips the NULLs the other kind produces, so each map
    # gathers exactly its own word set; the dense arrays are built by a
    # single-row sequence/transform — O(words) once, not per probe.
    m0 = F.map_from_entries(
        F.collect_list(
            F.when(F.col("kind") == 0, F.struct(F.col("word"), F.col("bits")))
        )
    )
    m1 = F.map_from_entries(
        F.collect_list(
            F.when(F.col("kind") == 1, F.struct(F.col("word"), F.col("bits")))
        )
    )

    def _dense(m, last_word):
        return F.transform(
            F.sequence(F.lit(0).cast("long"), last_word),
            lambda w: F.coalesce(
                F.try_element_at(m, w), F.lit(0).cast("long")
            ),
        )

    return words.agg(
        _dense(m0, F.lit(nw - 1).cast("long")).alias("_bloom_words"),
        _dense(m1, F.array_max(F.map_keys(m1))).alias("_exact_words"),
    )


def bitset_test(words: Column, pos: Column) -> Column:
    """Boolean: is bit ``pos`` set in the dense long-array bitset? O(1):
    one array index (``try_element_at`` — out-of-domain positions fall
    off the array end and read as 0/absent) + shift + mask, all inside
    whole-stage codegen. Positions must be non-negative (a negative
    index would read from the array END under Spark's element_at
    semantics — callers probe hash values or PK domains, both ≥ 0)."""
    word_bits = F.coalesce(
        F.try_element_at(
            words, ((pos / 63).cast("long") + F.lit(1)).cast("int")
        ),
        F.lit(0).cast("long"),
    )
    return (
        F.call_function(
            "shiftright", word_bits, (pos % 63).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        == 1
    )


def bloom_bit_test(bitmap: Column, probe: Column, m_bits: int, row: int) -> Column:
    """Boolean: does hash-row ``row``'s probe position hit in ``bitmap``?

    ``try_element_at`` (not ``element_at``): a word no key ever touched is
    absent from the map, and under ANSI mode a plain map lookup on a
    missing key raises instead of returning NULL."""
    pos = poly_hash(probe, row, m_bits)
    word_bits = F.coalesce(
        F.try_element_at(bitmap, (pos / 63).cast("long")),
        F.lit(0).cast("long"),
    )
    return (
        F.call_function(
            "shiftright", word_bits, (pos % 63).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        == 1
    )


def bloom_probe(
    big: DataFrame, probe_col: str, bloom: DataFrame, m_bits: int
) -> DataFrame:
    """Filter `big` to rows whose key passes every Bloom probe.

    Each probe is a broadcast join on the word index (the bitset is ≤
    m/63 rows) plus a bit test — the big side is pruned map-side, before
    any shuffle a downstream join would need. No false negatives; false
    positives are bounded by the m/n sizing and must be removed by the
    exact join that follows (callers keep the exact join — the filter
    only shrinks its input).
    """
    out = big
    for row in range(len(HASH_PARAMS)):
        pos = poly_hash(F.col(probe_col), row, m_bits)
        w = bloom.select(
            F.col("word").alias(f"_w{row}"), F.col("bits").alias(f"_bits{row}")
        )
        out = out.join(
            F.broadcast(w),
            (pos / 63).cast("long") == F.col(f"_w{row}"),
            "left",
        ).filter(
            F.call_function(
                "shiftright",
                F.coalesce(F.col(f"_bits{row}"), F.lit(0).cast("long")),
                (pos % 63).cast("int"),
            ).bitwiseAND(F.lit(1).cast("long"))
            == 1
        )
    return out.drop(*[c for r in range(len(HASH_PARAMS)) for c in (f"_w{r}", f"_bits{r}")])


def morton_interleave(cols: list[Column], bits: int) -> Column:
    """Morton (Z-order) interleave of `bits`-bit non-negative ints: bit i
    of column j lands at position i·len(cols)+j, so rows close in EVERY
    dimension get close z-values. Unrolled shift/mask arithmetic — stays
    in whole-stage codegen, and the identical expression runs on the
    oracle side. Shared by zorder_key (integer-exact, oracle-checked) and
    scale.zorder_value (float-quantizing file-layout variant)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, i * len(cols) + j)
    return z


def zorder_key(x: Column, y: Column, bits: int) -> Column:
    """Two-dimensional Morton key: range-partitioning a write by this value
    gives files whose min/max zone maps are tight on BOTH columns at once
    (a one-dimensional sort leaves the other column's span at full width).
    """
    return morton_interleave([x, y], bits)


def cms_cells(items: DataFrame, key_col: str, width: int) -> DataFrame:
    """Count-min sketch state: (row, bucket, cnt) cells, d = len(HASH_PARAMS).

    One shuffle of at most d·width rows regardless of input size; cells
    merge across shards/time by summing cnt — the mergeability is what
    makes the sketch a pre-aggregable distributed object.
    """
    cells = None
    for row in range(len(HASH_PARAMS)):
        c = items.select(
            F.lit(row).alias("row"),
            poly_hash(F.col(key_col), row, width).alias("bucket"),
        )
        cells = c if cells is None else cells.unionAll(c)
    return cells.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_estimate(
    queries: DataFrame, key_col: str, cells: DataFrame, width: int
) -> DataFrame:
    """Point-query the sketch: estimate = min over rows of the hashed cell.

    Broadcast-joins the (tiny) cell state to the query keys; the estimate
    never undercounts (cnt ≥ true frequency, overcount bounded by N/width
    per row with probability 1/2^d).
    """
    probes = None
    for row in range(len(HASH_PARAMS)):
        p = queries.select(
            F.col(key_col),
            F.lit(row).alias("row"),
            poly_hash(F.col(key_col), row, width).alias("bucket"),
        )
        probes = p if probes is None else probes.unionAll(p)
    return (
        probes.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_est"))
    )


def priority_sample(
    items: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Priority sample of size k (Duffield-Lund-Thorup, JACM 2007).

    Each item gets priority q = w / u with u a deterministic pseudo-uniform
    in (0, 1] derived from its id via the NONLINEAR mix_hash — a linear
    multiply-add hash is locally linear over sequential ids, which would
    correlate u with id and void the unbiased-totals guarantee. Top-(k+1)
    runs as TakeOrderedAndProject (per-partition heaps, no full sort);
    arithmetic is integer + division/comparison only, so the oracle
    reproduces the selection bit-for-bit.
    """
    u = (mix_hash(F.col(id_col)) + 1).cast("double") / F.lit(float(MERSENNE_P))
    pri = (F.col(weight_col).cast("double") / u).alias("priority")
    # Materialized: both the tau aggregate and the k-row re-sort consume
    # `top`; unmaterialized, each would re-run the TakeOrdered heap scan
    # over the full input (correct either way thanks to the
    # deterministic tie-break, but twice the corpus reads).
    top = (
        items.select(F.col(id_col), F.col(weight_col), pri)
        .orderBy(F.desc("priority"), F.col(id_col))
        .limit(k + 1)
        .localCheckpoint(eager=True)
    )
    tau = top.agg(F.min("priority").alias("tau"))
    return (
        top.orderBy(F.desc("priority"), F.col(id_col))
        .limit(k)
        .crossJoin(F.broadcast(tau))
        .select(
            id_col,
            weight_col,
            F.greatest(F.col(weight_col).cast("double"), F.col("tau")).alias("w_hat"),
        )
    )
