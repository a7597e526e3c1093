"""Property-based spot checks (SURVEY.md §5): hypothesis-driven invariants
for the fiddly operators — surrogate keys (OP33) and diagonal union (OP31).
Few examples per property (each example runs Spark jobs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from world_cup_duckdb_spark.plans.worldcup import surrogate_key

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_names = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4),
    min_size=1,
    max_size=12,
)


@given(names=_names)
@_slow
def test_surrogate_keys_dense_unique_order_invariant(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string").distinct()
    keyed = surrogate_key(df, "X-", ["name"])
    rows = {r["name"]: r["id"] for r in keyed.collect()}
    n = len(set(names))
    # dense 1-based ids, one per distinct value
    assert sorted(int(v.removeprefix("X-")) for v in rows.values()) == list(
        range(1, n + 1)
    )
    # permutation invariance: reversed input produces the same mapping
    rev = spark.createDataFrame(
        [(x,) for x in reversed(names)], "name string"
    ).distinct()
    rows_rev = {
        r["name"]: r["id"] for r in surrogate_key(rev, "X-", ["name"]).collect()
    }
    assert rows == rows_rev


@given(
    left=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=6
    ),
    right=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=6
    ),
)
@_slow
def test_diagonal_union_schema_and_null_fill(spark, left, right):
    df1 = spark.createDataFrame(left, "a int, b int")
    df2 = spark.createDataFrame(right, "b int, c int")
    out = df1.unionByName(df2, allowMissingColumns=True)
    # column set = union of inputs, in first-seen order
    assert out.columns == ["a", "b", "c"]
    rows = out.collect()
    assert len(rows) == len(left) + len(right)
    # missing columns are null exactly for the frame that lacked them
    assert out.filter(F.col("c").isNull()).count() == len(left)
    assert out.filter(F.col("a").isNull()).count() == len(right)
    # b survives from both sides intact
    got_b = sorted(r["b"] for r in rows)
    want_b = sorted([t[1] for t in left] + [t[0] for t in right])
    assert got_b == want_b


_doc_texts = st.lists(
    st.text(alphabet="abc d", min_size=0, max_size=40),
    min_size=1,
    max_size=10,
)


@given(texts=_doc_texts)
@_slow
def test_chunking_covers_every_char_exactly_by_stride(spark, texts):
    """Invariants of ext_chunk_documents' construction, on arbitrary
    corpora: ceil(n/STRIDE) chunks per non-empty doc, first chunk at 0,
    consecutive starts exactly STRIDE apart, and concatenating the
    stride-prefixes of all chunks reconstructs the document."""
    from world_cup_duckdb_spark.queries.ext_training import CHUNK, STRIDE

    docs = spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, n_chars long",
    )
    starts = docs.filter(F.col("n_chars") > 0).select(
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
    rows = starts.select(
        "doc_id", "chunk_idx", "start",
        F.substring("text", F.col("start").cast("int") + 1, CHUNK).alias("c"),
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        if not t:
            assert i not in by_doc
            continue
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        assert len(chunks) == -(-len(t) // STRIDE)  # ceil
        assert [r["start"] for r in chunks] == [
            j * STRIDE for j in range(len(chunks))
        ]
        assert "".join(r["c"][:STRIDE] for r in chunks) == t


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=7000), min_size=1,
                   max_size=12)
)
@_slow
def test_packing_partitions_corpus_exactly(spark, sizes):
    """ext_pack_sequences invariants on arbitrary size distributions:
    every document lands in exactly one pack, pack char totals sum to the
    corpus total, pack ids start at 0 and never decrease in doc order
    (they may skip when one document spans several budgets), and each
    doc's pack is exactly its running offset div BUDGET."""
    from world_cup_duckdb_spark.queries.ext_training import BUDGET

    docs = spark.createDataFrame(
        [(i, "s", n) for i, n in enumerate(sizes)],
        "doc_id long, source string, n_chars long",
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = docs.select(
        "doc_id", "n_chars",
        F.floor(
            (F.sum("n_chars").over(w) - F.col("n_chars")) / F.lit(BUDGET)
        ).alias("pack_id"),
    ).collect()
    assert len(packed) == len(sizes)  # every doc placed once
    assert sum(r["n_chars"] for r in packed) == sum(sizes)
    by_doc = sorted(packed, key=lambda r: r["doc_id"])
    offset, prev_pack = 0, 0
    for r in by_doc:
        assert r["pack_id"] == offset // BUDGET  # formula holds per doc
        assert r["pack_id"] >= prev_pack  # monotone in doc order
        prev_pack = r["pack_id"]
        offset += r["n_chars"]
    assert by_doc[0]["pack_id"] == 0
    # contiguous fill: cumulative chars through pack p reach past p*BUDGET
    ids = sorted({r["pack_id"] for r in packed})
    for p in ids[:-1]:
        through = sum(r["n_chars"] for r in packed if r["pack_id"] <= p)
        assert through >= (p + 1) * BUDGET


@settings(max_examples=5, deadline=None)
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(0, 3)),
            st.tuples(st.just("overwrite"), st.integers(0, 3)),
            st.tuples(st.just("merge"), st.integers(0, 3)),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_lakehouse_log_matches_model(spark, tmp_path_factory, ops):
    """Model-based check of the versioned-table transaction log: any
    sequence of append/overwrite/merge commits must leave the table
    equal to a plain-Python model of the same semantics (append = bag
    union, overwrite = replace, merge = upsert by key), with one version
    per operation and every historical version still readable."""
    from world_cup_duckdb_spark.operators.lakehouse import (
        latest_version,
        merge_table,
        read_table,
        write_table,
    )

    path = str(tmp_path_factory.mktemp("lh_model") / "t")

    def batch(seed):
        # 3 rows keyed (seed, seed+1, seed+2) with op-dependent payloads
        return [(k, f"payload-{seed}-{k}") for k in range(seed, seed + 3)]

    model: list[tuple] = []
    for i, (op, seed) in enumerate(ops):
        rows = batch(seed * 10 + i)
        df = spark.createDataFrame(rows, "k int, v string")
        if op == "append" or latest_version(path) is None:
            write_table(df, path, mode="append" if model else "overwrite")
            model = model + rows
        elif op == "overwrite":
            write_table(df, path, mode="overwrite")
            model = list(rows)
        else:  # merge: upsert by key
            merge_table(spark, path, df, ["k"])
            newk = {k for k, _ in rows}
            model = [r for r in model if r[0] not in newk] + rows
    got = sorted(tuple(r) for r in read_table(spark, path).collect())
    assert got == sorted(model)
    assert latest_version(path) == len(ops) - 1
    for v in range(len(ops)):
        assert read_table(spark, path, version=v).count() >= 0


_corpora = st.lists(
    st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=3),
        min_size=1,
        max_size=20,
    ),
    min_size=1,
    max_size=25,
)
_fracs = st.sampled_from([0.0, 0.1, 0.3, 0.5, 0.9, 1.0])


@given(docs=_corpora, frac=_fracs)
@_slow
def test_token_budget_census_invariants(spark, docs, frac):
    """ext_token_budget_select's histogram-threshold selection, under
    arbitrary corpora and budget fractions: (a) keep decisions are
    monotone in quality — ordering buckets best-first the sequence is
    all* partial? none*, with at most one 'partial'; (b) cum_tokens is
    the exact best-first running sum; (c) the 'all' buckets fit the
    budget and adding the partial bucket (if any) exceeds it."""
    from world_cup_duckdb_spark.queries.ext_training2 import (
        token_budget_census,
    )

    df = spark.createDataFrame([(" ".join(ws),) for ws in docs], "text string")
    rows = sorted(
        token_budget_census(df, frac).collect(),
        key=lambda r: -r["bucket"],
    )
    total = sum(r["bucket_tokens"] for r in rows)
    budget = int(frac * total)  # floor of double product
    seq = [r["selected"] for r in rows]
    # monotone: all* partial? none*
    order = {"all": 0, "partial": 1, "none": 2}
    assert [order[s] for s in seq] == sorted(order[s] for s in seq), seq
    assert seq.count("partial") <= 1, seq
    # exact running sum, best-first
    cum = 0
    for r in rows:
        cum += r["bucket_tokens"]
        assert r["cum_tokens"] == cum, rows
    # budget arithmetic
    all_tokens = sum(r["bucket_tokens"] for r in rows if r["selected"] == "all")
    assert all_tokens <= budget, rows
    partial = [r for r in rows if r["selected"] == "partial"]
    if partial:
        assert all_tokens + partial[0]["bucket_tokens"] > budget, rows
    none_rows = [r for r in rows if r["selected"] == "none"]
    for r in none_rows:
        # a 'none' bucket would not have fit even before its own tokens
        assert r["cum_tokens"] - r["bucket_tokens"] >= budget, rows


@given(
    sizes=st.lists(st.integers(0, 500), min_size=1, max_size=6),
)
@_slow
def test_temperature_mix_envelope_on_random_corpora(spark, sizes):
    """Over arbitrary per-source weight shapes (including zero-weight
    sources): every row keeps >= 1 copy, realized copies stay inside
    the md5-coin envelope [n*floor(m), n*ceil(m)] for the group's
    capped multiplier, and the output never exceeds cap x input."""
    from world_cup_duckdb_spark.operators.training import temperature_mix

    cap = 8.0
    rows = [
        (f"s{i}", i * 1000 + j, w)
        for i, size in enumerate(sizes)
        for j, w in enumerate([size] * max(1, min(size, 4)))
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, w long")
    out = temperature_mix(df, "w", max_upsample=cap).collect()
    n_in = len(rows)
    assert len(out) <= cap * n_in
    # every input row keeps at least one copy
    assert len({(r["source"], r["doc_id"]) for r in out}) == n_in
    import math
    from collections import Counter

    per_group_w = {}
    per_group_n = Counter()
    for s, _, w in rows:
        per_group_w[s] = per_group_w.get(s, 0) + w
        per_group_n[s] += 1
    cmax = max(per_group_w.values())
    got = Counter(r["source"] for r in out)
    for s, c in per_group_w.items():
        m = min(cap, math.sqrt(cmax / c)) if c > 0 else 1.0
        n = per_group_n[s]
        assert n * math.floor(m) <= got[s] <= n * math.ceil(m), (s, m, got[s])


@given(
    vals=st.lists(st.integers(0, 20), min_size=1, max_size=40),
    n=st.integers(1, 12),
    n_ranges=st.integers(1, 6),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_distributed_window_family_matches_ansi_property(
    spark, vals, n, n_ranges
):
    """Hypothesis sweep of the distributed global-window decomposition
    (round 7): for arbitrary value multisets (ties included), tile
    counts, and range-partition counts, distributed_ntile /
    distributed_row_number / distributed_running_sum over the TOTAL
    order (v, idx) must equal the single-task ANSI window forms row for
    row — including uneven splits, n > N, and all-duplicate inputs."""
    from pyspark.sql import Window
    from world_cup_duckdb_spark.operators.relational import (
        distributed_ntile,
        distributed_row_number,
        distributed_running_sum,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "idx int, v int").repartition(3)
    order = [F.col("v").asc_nulls_last(), F.col("idx").asc_nulls_last()]
    w = Window.orderBy(*order)

    got = distributed_ntile(df, n, ["v", "idx"], "t", n_ranges=n_ranges)
    exp = df.withColumn("t", F.ntile(n).over(w))
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0

    got = distributed_row_number(df, ["v", "idx"], "rn", n_ranges=n_ranges)
    exp = df.withColumn("rn", F.row_number().over(w).cast("bigint"))
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0

    got = distributed_running_sum(
        df, ["v", "idx"], F.col("v").cast("bigint"), "rs",
        n_ranges=n_ranges, inclusive=False,
    )
    exp = df.withColumn(
        "rs",
        F.coalesce(
            F.sum(F.col("v").cast("bigint")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("bigint"),
        ),
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


_url_hosts = st.from_regex(r"[a-z]{1,8}(\.[a-z]{1,6}){1,2}", fullmatch=True)
_url_params = st.lists(
    st.tuples(
        st.from_regex(r"[a-z]{1,6}", fullmatch=True),
        st.from_regex(r"[A-Za-z0-9]{0,6}", fullmatch=True),
    ),
    max_size=4,
)


@_slow
@given(
    host=_url_hosts,
    path_segs=st.lists(st.from_regex(r"[A-Za-z0-9._-]{1,8}", fullmatch=True),
                       max_size=3),
    params=_url_params,
    scheme_caps=st.booleans(),
    www=st.booleans(),
    trailing=st.booleans(),
    fragment=st.booleans(),
    utm=st.booleans(),
    host_caps=st.booleans(),
)
def test_url_canonicalization_idempotent_and_invariant(
    spark, host, path_segs, params, scheme_caps, www, trailing, fragment,
    utm, host_caps,
):
    """canonical_url must be (a) IDEMPOTENT — its output re-parses to
    itself — and (b) INVARIANT under every normalization axis it claims
    to fold: scheme case, host case, a www. prefix, a trailing slash,
    utm_* params, param order, and fragments. Each generated URL is
    rendered messy and clean; both must canonicalize identically, and
    canonicalizing the canonical form must be a fixed point."""
    from world_cup_duckdb_spark.operators.text import canonical_url

    path = "".join("/" + s for s in path_segs)
    qs = "&".join(f"{k}={v}" for k, v in params)
    clean = f"https://{host}{path}" + (f"?{qs}" if qs else "")

    messy_host = ("WWW." if www else "") + (host.upper() if host_caps else host)
    messy_path = path + ("/" if trailing and path else "")
    messy_params = [f"{k}={v}" for k, v in params]
    if utm:
        messy_params.insert(0, "utm_source=feed")
        messy_params.append("utm_campaign=x")
    # reverse param order to exercise the sort
    messy_qs = "&".join(reversed(messy_params))
    messy = (
        ("HTTP://" if scheme_caps else "http://")
        + messy_host
        + messy_path
        + (f"?{messy_qs}" if messy_qs else "")
        + ("#frag" if fragment else "")
    )

    df = spark.createDataFrame([(clean,), (messy,)], "url string").select(
        "url", canonical_url("url").alias("c")
    )
    rows = {r["url"]: r["c"] for r in df.collect()}
    c_clean, c_messy = rows[clean], rows[messy]
    assert c_clean == c_messy, (clean, messy, c_clean, c_messy)
    # idempotence: canonical output is a fixed point
    again = (
        spark.createDataFrame([(c_clean,)], "url string")
        .select(canonical_url("url").alias("c"))
        .collect()[0]["c"]
    )
    assert again == c_clean, (c_clean, again)


_span_corpora = st.lists(
    # tiny vocab so 5-gram collisions actually occur across docs
    st.lists(st.sampled_from("abc"), min_size=0, max_size=14),
    min_size=1,
    max_size=8,
)


@given(docs=_span_corpora)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_span_pipeline_matches_python_reference(spark, docs):
    """The whole sequence-level span pipeline (shingle -> cross-doc dup
    set -> hits -> gaps-and-islands merge, both policies) must equal a
    direct python reference on arbitrary tiny corpora — the oracle gate
    proves engine parity on the fixture corpus; this proves the
    ALGORITHM on adversarial shapes (all-identical docs, empty docs,
    sub-width docs, heavy overlap)."""
    from world_cup_duckdb_spark.queries.ext_dedup import (
        _grams,
        _islands_to_spans,
    )

    k = 5
    toks = {i: d for i, d in enumerate(docs)}
    # python reference
    grams: dict = {}
    for d, l in toks.items():
        for p in range(len(l) - k + 1):
            grams.setdefault(tuple(l[p : p + k]), []).append((d, p))
    dup = {g for g, occ in grams.items() if len({d for d, _ in occ}) >= 2}

    def islands(hits_by_doc):
        spans = set()
        for d, ps in hits_by_doc.items():
            ps = sorted(ps)
            start = prev = None
            for p in ps:
                if prev is None or p - prev > k:
                    if start is not None:
                        spans.add((d, start, prev + k))
                    start = p
                prev = p
            if start is not None:
                spans.add((d, start, prev + k))
        return spans

    hits_all: dict = {}
    hits_keepone: dict = {}
    for g in dup:
        occ = sorted(grams[g])
        for j, (d, p) in enumerate(occ):
            hits_all.setdefault(d, set()).add(p)
            if j > 0:  # canonical (min doc_id, pos) spared
                hits_keepone.setdefault(d, set()).add(p)
    exp_all = islands(hits_all)
    exp_keepone = islands(hits_keepone)

    # spark side, same helpers the registry keys use
    base = spark.createDataFrame(
        [(d, " ".join(l)) for d, l in toks.items()], "doc_id long, text string"
    ).select("doc_id", F.split("text", " ").alias("l"))
    # split('', ' ') yields [''] not [] — drop sub-width docs the same
    # way _grams does (size filter), so empty docs are a non-issue.
    g = _grams(base)
    dup_df = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    ha = g.join(dup_df, "gram")
    got_all = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in _islands_to_spans(ha.select("doc_id", "pos")).collect()
    }
    enc = F.col("doc_id") * F.lit(1000000000) + F.col("pos")
    canon = ha.groupBy("gram").agg(F.min(enc).alias("ck"))
    hk = ha.join(canon, "gram").filter(enc != F.col("ck")).select(
        "doc_id", "pos"
    )
    got_keepone = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in _islands_to_spans(hk).collect()
    }
    assert got_all == exp_all, (docs, got_all, exp_all)
    assert got_keepone == exp_keepone, (docs, got_keepone, exp_keepone)
