"""Training-data preparation extensions: document chunking and sequence
packing — the two transforms between "clean corpus" and "model-ready
batches" in an LLM data pipeline.

Reference scope: beyond the reference surface (its corpus is relational);
these extend the engine the way the dedup/quality/similarity families do,
over the same `documents` fixture. Both are pure DataFrame compositions
(no Python in the row path) and carry full DuckDB value-hash oracles.

Scale notes: chunking is a per-row explode — embarrassingly parallel, no
shuffle, output size ~ corpus/stride; packing is one shuffle per source
partition plus a window cumsum, the same exchange shape as sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import table

CHUNK = 200  # chars per training chunk
STRIDE = 150  # chunk start step (CHUNK - STRIDE = 50 chars of overlap)
BUDGET = 4096  # chars per packed training sequence


@register(
    "ext_chunk_documents",
    oracle=f"""
    WITH starts AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(n_chars AS BIGINT), {STRIDE})) AS start
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id,
           CAST(start / {STRIDE} AS INT) AS chunk_idx,
           CAST(start AS BIGINT) AS chunk_start,
           CAST(length(substring(text, CAST(start AS INT) + 1, {CHUNK}))
                AS INT) AS chunk_len,
           md5(substring(text, CAST(start AS INT) + 1, {CHUNK})) AS chunk_md5
    FROM starts
    """,
)
def ext_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking: split each document into
    {CHUNK}-char windows every {STRIDE} chars (50-char overlap preserves
    context across boundaries) — the transform that turns a cleaned corpus
    into training examples. Emits the chunk's md5, not its text, so the
    oracle hash-compares full content cheaply.

    Scale: `sequence` + `posexplode` is a per-row generator inside the
    scan stage — no shuffle, no Python, output rows ~ total_chars/STRIDE.
    At 100 TB this is the map-only stage you run right before packing;
    partition count follows the input splits, so it scales linearly with
    executors. Token-based chunking swaps the char arithmetic for
    ext_token_count's tokenizer over the same plan shape.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    starts = d.select(
        "doc_id",
        "text",
        F.posexplode(
            F.sequence(
                F.lit(0).cast("bigint"),
                (F.col("n_chars") - 1).cast("bigint"),
                F.lit(STRIDE).cast("bigint"),
            )
        ).alias("chunk_idx", "start"),
    )
    chunk = F.substring(F.col("text"), F.col("start").cast("int") + 1, CHUNK)
    return starts.select(
        "doc_id",
        F.col("chunk_idx").cast("int"),
        F.col("start").alias("chunk_start"),
        F.length(chunk).cast("int").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


@register(
    "ext_pack_sequences",
    oracle=f"""
    WITH placed AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
             ) - n_chars AS start_offset
      FROM documents
    )
    SELECT source,
           CAST(FLOOR(start_offset / {BUDGET}.0) AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS pack_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM placed
    GROUP BY source, pack_id
    """,
)
def ext_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (per source, in stable doc_id
    order) to fixed-budget training packs of {BUDGET} chars by contiguous
    fill — each document lands in the pack where its running offset
    starts. The deterministic, engine-reproducible variant of batch
    packing (first-fit-decreasing is sequential and
    partition-order-dependent; contiguous fill is a pure window function).

    Scale: one shuffle on source, one cumsum window pass, then a tiny
    aggregate per (source, pack) — identical cost shape to batch
    sessionization. At 100 TB, packing within ingest partitions (source ×
    date) keeps every window small and the job embarrassingly parallel
    across them.
    """
    d = table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = d.select(
        "source",
        "doc_id",
        "n_chars",
        (F.sum("n_chars").over(w) - F.col("n_chars")).alias("start_offset"),
    )
    return (
        placed.withColumn(
            "pack_id", F.floor(F.col("start_offset") / F.lit(BUDGET))
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("pack_chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )
