"""Streaming eval-set decontamination: cut contaminated spans from an
UNBOUNDED document stream with a map-only plan.

The batch form (queries/ext_dedup.py:ext_eval_decontaminate) finds
contaminated positions with a gram-keyed equi-join — the right shape
when the eval side might be large. On a STREAM the regroup after an
explode+join would be a stateful aggregation; but an eval set is
benchmark-sized BY CONTRACT (a held-out suite, not a corpus), so the
production-standard plan is the one real pipelines run: broadcast the
eval gram set to every executor and cut each document IN-ROW as it
arrives — an Arrow-batched ``mapInPandas`` with ZERO shuffles and ZERO
streaming state, valid in append mode on an infinite stream. This is
the documented scale path ext_eval_decontaminate's docstring promises
("the eval gram set likely broadcast-sized").

The per-document cut replicates the distributed form exactly: k-token
shingle membership against the set, gaps-and-islands merge (gap > k
opens a new span), covered tokens dropped, text rebuilt with single
spaces. Batch ≡ stream is pinned in tests/test_streaming.py; the batch
twin ``ext_stream_decontaminate`` hash-matches the SAME DuckDB oracle
as the join form, proving the two plans compute one answer.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame

#: documents fixture schema for readStream (streaming parquet sources
#: require an explicit schema).
DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def cut_contaminated_spans(
    tokens: list[str], eval_grams, k: int = 5
) -> tuple[int, list[str]]:
    """Pure per-document cut: positions whose k-shingle is in
    ``eval_grams`` merge into maximal spans (gap > k breaks); covered
    tokens are dropped. Returns (n_removed, kept_tokens). Shared by the
    Arrow batch kernel and the pytest reference so there is exactly ONE
    implementation of the policy."""
    n = len(tokens)
    hits = (
        [p for p in range(n - k + 1) if " ".join(tokens[p : p + k]) in eval_grams]
        if n >= k
        else []
    )
    spans: list[tuple[int, int]] = []
    start = prev = None
    for p in hits:
        if prev is None or p - prev > k:
            if start is not None:
                spans.append((start, prev + k))
            start = p
        prev = p
    if start is not None:
        spans.append((start, prev + k))
    covered: set[int] = set()
    for s, e in spans:
        covered.update(range(s, e))
    kept = [t for i, t in enumerate(tokens) if i not in covered]
    return n - len(kept), kept


def decontaminate_docs(
    docs: DataFrame, eval_grams: Iterable[str], k: int = 5
) -> DataFrame:
    """Map-only decontamination of ``docs`` (batch OR streaming frame
    with doc_id/text columns) against a bounded eval gram set.

    The gram set is shipped once per executor as a Spark broadcast
    (`O(|eval grams|)` memory each — benchmark-sized by contract; an
    unbounded eval side belongs in the batch join form instead). Rows
    flow through one Arrow ``mapInPandas`` stage: no shuffle, no state,
    so the SAME call works under ``readStream`` in append mode. Output
    matches ext_eval_decontaminate's schema: (doc_id, n_tokens,
    n_removed, clean_text).

    The naive ``' '.join`` shingle probe is O(n·k) chars per doc; at
    100 TB swap the set for the same grams' xxhash64 values and a
    rolling hash probe — the plan shape (broadcast + map-only) is the
    part that matters and does not change."""
    import pandas as pd

    spark = docs.sparkSession
    b = spark.sparkContext.broadcast(frozenset(eval_grams))

    def cut(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        ev = b.value
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.split(" ")
                n_removed, kept = cut_contaminated_spans(toks, ev, k)
                rows.append(
                    (doc_id, len(toks), n_removed, " ".join(kept))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_tokens", "n_removed", "clean_text"],
            )

    return docs.select("doc_id", "text").mapInPandas(
        cut,
        schema="doc_id long, n_tokens long, n_removed long, "
        "clean_text string",
    )
