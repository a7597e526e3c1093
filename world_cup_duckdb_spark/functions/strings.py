"""Scalar expression library (SURVEY.md §2.6, OP35-OP42).

The reference implements three of these as row-at-a-time Python lambda UDFs
over Polars columns (capitalize at scripts/build_db.py:581, capitalize +
singularize at :764-771 and :963-970). Python UDFs are the slow path in
Spark (per-row serde, breaks whole-stage codegen), and all three are
expressible with built-in JVM functions — so this engine has **zero Python
UDFs on the reference surface**; every expression here stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(c: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast to decimal for exact, partition-order-independent arithmetic.

    Distributed sums of doubles are non-deterministic (FP addition is not
    associative; partition order varies). Money-like columns are cast to
    decimal before aggregation so the result is exact and reproducible —
    and comparable bit-for-bit against a DuckDB oracle.
    """
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(f"decimal({precision},{scale})")


def cents(c: Column | str, scale: int = 2) -> Column:
    """Exact scaled-integer money: ROUND(x·10^scale) cast BIGINT.

    Long sums are exact, associative, and 2-4× faster in the hash
    aggregate than decimal buffers (the fixed-point path `dec` takes) —
    same partition-order independence, primitive-typed codegen. Divide
    once after the final aggregate (`CAST(SUM(..) AS DOUBLE) / 10^scale`,
    mirrored verbatim in the oracle so the two roundings happen in the
    same sequence on both engines). Caveat: a cents·(100-cents) revenue
    term is ≤10^9 per row, so a single-level long sum overflows past
    ~10^10 rows per group. Queries whose group sizes are unbounded
    (flagship, op43) therefore sum in TWO levels: long partials per
    (group, spark_partition_id) — partition row counts are bounded by the
    scan split size, so partials can't overflow — then decimal(38,0) over
    the tiny partial rows. The hot fact-volume pass keeps primitive
    codegen'd buffers; decimal cost lands only on groups × partitions
    rows.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.round(c * (10**scale)).cast("long")


def prefixed_key(prefix: str, n: Column | str) -> Column:
    """``'CTY-' || n`` style prefixed surrogate key (OP35).

    Reference: ``'CTY-' + row_nr.cast(str)`` at scripts/build_db.py:144
    (same pattern at :231, :279, :411, :578, :979, :1111).
    """
    n = F.col(n) if isinstance(n, str) else n
    return F.concat(F.lit(prefix), n.cast("string"))


def capitalize_first(c: Column | str) -> Column:
    """Upper-case the first letter, keep the rest as-is (OP37).

    Replaces the reference's Python lambda ``s[0].upper() + s[1:]``
    (scripts/build_db.py:581) with codegen-friendly builtins. Not
    ``initcap`` — that would also lower-case the tail and title-case every
    word, which differs from the reference semantics.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.concat(F.upper(c.substr(F.lit(1), F.lit(1))), c.substr(F.lit(2), F.length(c)))


def singularize(c: Column | str) -> Column:
    """Drop a trailing ``'s'`` if present (OP38/OP22).

    Reference: ``s[:-1]`` inside the stage-name lambdas
    (scripts/build_db.py:765-767, :964-966), guarded by ``ends_with('s')``.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.when(c.endswith("s"), c.substr(F.lit(1), F.length(c) - 1)).otherwise(c)


def md5_bucket(c: Column | str, seed: int | Column = 0) -> Column:
    """Portable uniform hash: ``md5(seed || ':' || value)`` as a hex string.

    Used by the dedup/sketch extension operators (MinHash, SimHash,
    fingerprinting). md5 is chosen deliberately over the engine-native
    ``xxhash64``: it produces identical values in any engine (DuckDB,
    Trino, Spark), which makes sketch outputs portable and differentially
    testable. Min/ordering over the hex strings is a valid uniform random
    permutation for MinHash purposes.
    """
    c = F.col(c) if isinstance(c, str) else c
    seed = F.lit(seed) if isinstance(seed, int) else seed
    return F.md5(F.concat(seed.cast("string"), F.lit(":"), c.cast("string")))


def hex_nibble(hexcol: Column, pos: int) -> Column:
    """Value 0-15 of the hex digit at 1-based ``pos`` — portable bit source
    (DuckDB equivalent: ``strpos('0123456789abcdef', substr(h, pos, 1)) - 1``).
    """
    return (
        F.instr(F.lit("0123456789abcdef"), F.substring(hexcol, pos, 1)) - 1
    ).cast("int")


def bounded_one_partition(anchor):
    """Constant-zero, NON-FOLDABLE window partition key for windows that
    are deliberately global over a BOUNDED relation (per-group stats,
    25-row dims...).

    Why not ``Window.partitionBy()``: an empty partition spec makes
    WindowExec emit its "No Partition Defined" warning on every
    execution. For the handful of documented-bounded global windows in
    this engine the warning is noise — and noise that masks the one
    case where the warning is a REAL alarm, a corpus-grain window
    regressing to a single task (VERDICT r8 item 4). Partitioning by a
    constant keeps execution equivalent (every row hashes to the same
    partition; one shuffle to one partition either way) while freeing
    the warning to mean only trouble.

    Why not ``F.lit(1)`` or an aliased literal column: Catalyst's
    ConstantFolding/FoldablePropagation strip foldable expressions from
    the partition spec, restoring the empty spec and the warning
    (measured on Spark 4.1: both forms produce the IDENTICAL
    SinglePartition plan of the bare global window, warning included).
    ``hash(anchor) * 0`` is ALSO stripped — hash is non-nullable, so the
    multiply-by-zero simplification folds it to literal 0. The surviving
    form is ``pmod(hash(anchor), 1)``: it references a column (not
    foldable), has no zero-product shortcut, evaluates to 0 for every
    row (x mod 1 = 0; hash never returns NULL — null input hashes to
    the seed), and costs one hash+mod per row of the bounded relation.
    """
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = anchor if isinstance(anchor, Column) else F.col(anchor)
    return F.pmod(F.hash(c), F.lit(1))
