"""Document-level text-analysis operators (north-star extension,
SURVEY.md §2.9) over the ``documents`` table: token statistics, token
frequency, language distribution, quality scoring, language ID,
fingerprinting. All composed from the codegen'd expressions in
``functions.text`` — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import text as TX
from movie_data_etl_pipeline_spark.sources.parquet import ensure_min_partitions


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token statistics: token count, distinct-token count,
    type-token ratio, mean token length."""
    toks = TX.tokens("text")
    # tokenization is the CPU-dominant map stage: spread the pruned
    # projection so a coarse input (single row group) uses every core
    return ensure_min_partitions(docs.select("doc_id", "text", "n_chars")).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x))
            / F.size(toks),
            6,
        ).alias("mean_token_len"),
        "n_chars",
    )


def token_frequency(docs: DataFrame, top_k: int = 100) -> DataFrame:
    """Corpus-wide token frequency, top-k by count (ties broken by token
    asc so the cut is deterministic). Explode → map-side partial count →
    single shuffle; the top-k is TakeOrderedAndProject, not a full sort."""
    return (
        ensure_min_partitions(docs.select("text"))
        .select(F.explode(TX.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(top_k)
    )


def lang_distribution(docs: DataFrame) -> DataFrame:
    """Corpus profile by declared language: doc count, source count,
    char-length stats. (Reference shape A3 applied to documents.)"""
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
            # unrounded exact-int division: deterministic across engines
            # (round(avg) on knife-edge values is not; functions.scalar)
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        )
        .orderBy(F.desc("n_docs"), F.asc("lang"))
    )


def _doc_quality(
    docs: DataFrame,
    carry: tuple[str, ...] = (),
    keep_text: bool = False,
    with_n_tokens: bool = False,
) -> DataFrame:
    """Shared per-document quality projection: ``doc_id``, any carried
    columns, optionally ``text`` itself, and the rounded composite
    ``quality`` plus its signals.

    The token array is projected ONCE and reused — passing raw text to
    each metric would re-run split+filter per sub-expression (Catalyst
    does not CSE across aggregate lambdas), a measured ~10× slowdown."""
    sw = F.array(*[F.lit(s) for s in TX.STOPWORDS])
    text_out = ("text",) if keep_text else ()
    toks = ensure_min_partitions(docs.select("doc_id", "text", *carry)).select(
        "doc_id", *carry, F.col("text"), TX.tokens("text").alias("t")
    )
    ntok_out = (F.size("t").cast("long").alias("n_ws_tokens"),) if with_n_tokens else ()
    m = toks.select(
        "doc_id",
        *carry,
        *text_out,
        *ntok_out,
        (
            F.aggregate("t", F.lit(0).cast("double"), lambda acc, x: acc + F.length(x))
            / F.size("t")
        ).alias("mean_len"),
        (F.size(F.array_distinct("t")) / F.size("t")).alias("ttr"),
        (
            F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", ""))
            / F.length("text")
        ).alias("punct"),
        (
            F.size(F.filter("t", lambda x: F.array_contains(sw, F.lower(x)))) / F.size("t")
        ).alias("sw_ratio"),
    )
    len_term = F.lit(1.0) - F.least(F.abs(F.col("mean_len") - 5.0) / 5.0, F.lit(1.0))
    score = 0.4 * len_term + 0.4 * F.col("ttr") + 0.2 * (
        1.0 - F.least(F.col("punct") * 5.0, F.lit(1.0))
    )
    return m.select(
        "doc_id",
        *carry,
        *text_out,
        *(("n_ws_tokens",) if with_n_tokens else ()),
        F.round(score, 6).alias("quality"),
        F.round("sw_ratio", 6).alias("stopword_ratio"),
        F.round("punct", 6).alias("punct_ratio"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document heuristic quality: composite score plus the
    underlying signals (stopword ratio, punctuation ratio)."""
    return _doc_quality(docs)


def _quality_hist_and_floors(
    docs: DataFrame, k_num: int, k_den: int
) -> tuple[DataFrame, DataFrame]:
    """The (source, quality)-histogram (checkpointed) and the derived
    per-source floors ``(source, q_floor, n_docs)``. Shared by the
    report and the row-filter forms of the adaptive quality gate."""
    s = _doc_quality(docs, carry=("source",)).select("source", "quality")
    hist = (
        s.where(F.col("quality").isNotNull())
        .groupBy("source", "quality")
        .agg(F.count(F.lit(1)).alias("c"))
        # hist feeds multiple branches (floor derivation + the report's
        # kept-count). Without materialization, each branch re-runs the
        # full scoring scan — the dominant cost at corpus scale. The
        # checkpointed relation is the histogram itself: bounded by
        # distinct rounded scores, trivially small.
        .localCheckpoint()
    )
    w_all = Window.partitionBy("source")
    w_cum = (
        Window.partitionBy("source")
        .orderBy("quality")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "source",
        "quality",
        "c",
        F.sum("c").over(w_all).alias("n"),
        F.sum("c").over(w_cum).alias("cumc"),
    )
    k = F.expr(f"(n * {int(k_num)} + {int(k_den) - 1}) div {int(k_den)}")
    fl = (
        cum.where(F.col("cumc") >= k)
        .groupBy("source")
        .agg(F.min("quality").alias("q_floor"), F.max("n").alias("n_docs"))
    )
    return hist, fl


def adaptive_quality_filter(
    docs: DataFrame, k_num: int = 1, k_den: int = 4
) -> DataFrame:
    """Per-source adaptive quality floor (the CCNet recipe): instead of
    one global threshold, each source keeps documents at or above its
    OWN ``k_num/k_den`` quality percentile, so a uniformly-noisy crawl
    source is not wiped out by a clean-source-calibrated cutoff.

    The floor is the discrete percentile — the ``ceil(n*k_num/k_den)``-th
    smallest rounded score — computed over the ``(source, quality)``
    HISTOGRAM, never a per-row window: after the one map-side-combining
    groupBy, every window/join below runs on a relation bounded by
    distinct rounded scores (≤1e6+1) per source, independent of corpus
    row count. That is what makes the ordered statistic safe when one
    source holds half of 100 TB: no single task ever sorts a source's
    documents. ``k = ceil`` is integer arithmetic (``(n*k_num +
    k_den-1) div k_den``) — no float percentile boundary to disagree
    across engines.

    Returns per source: ``n_docs``, ``q_floor``, ``n_kept`` (docs with
    ``quality >= q_floor``)."""
    hist, fl = _quality_hist_and_floors(docs, k_num, k_den)
    return (
        hist.join(fl, "source")
        .groupBy("source")
        .agg(
            F.max("n_docs").cast("bigint").alias("n_docs"),
            F.max("q_floor").alias("q_floor"),
            F.sum(
                F.when(F.col("quality") >= F.col("q_floor"), F.col("c")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


def adaptive_quality_keep(
    docs: DataFrame,
    k_num: int = 1,
    k_den: int = 4,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """The row-filter form of the adaptive gate: the documents
    themselves (``doc_id``, ``source``, any ``carry`` columns,
    ``text``, ``quality``) at/above their source's floor — what the
    next pipeline stage consumes, where ``adaptive_quality_filter``
    returns the per-source report.

    Two scoring passes by design (the CCNet shape): one map-only pass
    aggregated to the tiny histogram that fixes the floors, one pass
    filtered against the broadcast floors. The alternative — carrying
    every row through the percentile machinery — would shuffle the
    full corpus on ``source`` (few distinct values ⇒ catastrophic skew
    at 100 TB); re-scanning a map-only projection is the cheaper side
    of that trade at any scale."""
    _, fl = _quality_hist_and_floors(docs, k_num, k_den)
    scored = _doc_quality(docs, carry=("source",) + tuple(carry), keep_text=True)
    return (
        scored.join(F.broadcast(fl.select("source", "q_floor")), "source")
        .where(F.col("quality") >= F.col("q_floor"))
        .select("doc_id", "source", *carry, "text", "quality")
    )


def source_token_budget(docs: DataFrame, budget_tokens: int = 600) -> DataFrame:
    """Per-source token-budget curation: give every source the same
    token allowance and fill it best-quality-first — the domain
    balancing step of a training mix when the constraint is a TOKEN
    budget, not a document count (a source of long low-quality pages
    must not crowd out a source of short good ones; cf. the
    document-count mixing in ``operators/sampling.mixture_sample``).

    Mechanism: one scoring scan (shared ``_doc_quality`` projection,
    token count emitted from the same token array — no second
    tokenize), then a running token sum per source in (quality DESC,
    doc_id) order; a document survives iff it fits inside the budget
    cumulatively. Greedy-prefix selection is deterministic because
    ``quality`` is rounded to 6dp (cross-engine bit-stable) and ties
    break on ``doc_id``.

    Scale: the window shuffles only the scored projection (five
    narrow columns, not ``text``) and partitions by ``source``. With
    few huge sources that key skews — at 100 TB first thin each
    source with ``mixture_sample``-style hash sampling to ~budget-
    scale survivors, then run the exact prefix on the residue; the
    greedy semantics are unchanged because the running sum only needs
    the docs that could possibly fit."""
    scored = _doc_quality(docs, carry=("source",), with_n_tokens=True)
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.select(
            "doc_id",
            "source",
            "quality",
            "n_ws_tokens",
            F.sum("n_ws_tokens").over(w).alias("cum_tokens"),
        )
        .where(F.col("cum_tokens") <= F.lit(int(budget_tokens)))
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-heuristic language prediction vs the declared label."""
    return ensure_min_partitions(docs.select("doc_id", "lang", "text")).select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        TX.lang_id("text").alias("predicted_lang"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Canonical md5 content fingerprint per document (exact-dedup key)."""
    return ensure_min_partitions(docs.select("doc_id", "text")).select(
        "doc_id", TX.fingerprint("text").alias("fingerprint")
    )


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents: the
    fingerprint duplicate report (A6 generalized to content keys)."""
    return (
        fingerprints(docs)
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n") > 1)
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace-word vs BPE-ish-pre-tokenizer counts per document —
    the cheap size signals a token-budgeted corpus pipeline tracks
    (human-ish words vs model-ish tokens; ``functions.text.tokens`` /
    ``bpe_ish_tokens``)."""
    return ensure_min_partitions(docs.select("doc_id", "text")).select(
        "doc_id",
        F.size(TX.tokens("text")).cast("long").alias("n_ws_tokens"),
        F.size(TX.bpe_ish_tokens("text")).cast("long").alias("n_bpe_tokens"),
    )


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.35,
    keep_langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """End-to-end corpus-cleaning manifest — the composite shape an LLM
    training-data pipeline runs over raw web text (C4/Gopher-style):
    language filter → heuristic-quality floor → exact dedup keeping the
    canonical (lowest-id) copy.

    All per-document signals (lang guess, quality, fingerprint, token
    count) come out of ONE shuffle-free projection over a single scan —
    running the standalone signal operators and joining them would scan
    the corpus four times for no semantic difference. The only exchange
    is the fingerprint window for canonical-copy selection; at 100 TB
    that one shuffle IS the dedup, irreducibly.

    Output: (doc_id, predicted_lang, quality, n_ws_tokens) for every
    surviving document.
    """
    from pyspark.sql import Window

    sig = ensure_min_partitions(docs.select("doc_id", "text")).select(
        "doc_id",
        TX.lang_id("text").alias("predicted_lang"),
        TX.quality_score("text").alias("quality"),
        TX.fingerprint("text").alias("fingerprint"),
        F.size(TX.tokens("text")).cast("long").alias("n_ws_tokens"),
    )
    kept = sig.filter(
        F.col("predicted_lang").isin(*keep_langs)
        & (F.col("quality") >= F.lit(min_quality))
    )
    canon = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    return (
        kept.withColumn("__canon", canon)
        .filter(F.col("doc_id") == F.col("__canon"))
        .select("doc_id", "predicted_lang", "quality", "n_ws_tokens")
    )


@F.udtf(returnType="chunk_id: int, chunk: string, chunk_chars: int", useArrow=False)
class ChunkText:
    """UDTF: split one document into greedy whitespace-respecting chunks
    of at most ``max_chars`` characters — the segmentation step that
    turns arbitrarily long documents into bounded training examples.
    A UDTF (not a UDF) because the output is a *relation* per input row
    with its own cardinality; SQL surface: ``LATERAL chunk_text(text,
    N)``. Tokens longer than the budget become their own oversized
    chunk rather than being split mid-token (deterministic, lossless
    modulo whitespace). Python-boundary operator by design — chunking
    is a per-row generator, the exact shape UDTFs exist for; each task
    streams rows, no driver involvement."""

    def eval(self, text: str, max_chars: int):  # noqa: ANN001 - UDTF contract
        if text is None:
            return
        import re

        # ASCII whitespace, matching the engine's JVM tokenizer
        # (functions.text.tokens) and the DuckDB oracle's RE2 \s —
        # Python's bare str.split() would also break on NBSP etc.
        words = [w for w in re.split(r"\s+", text, flags=re.ASCII) if w]
        if not words:
            return
        chunk_id = 0
        cur: list[str] = []
        cur_len = 0
        for w in words:
            add = len(w) if not cur else len(w) + 1
            if cur and cur_len + add > max_chars:
                joined = " ".join(cur)
                yield (chunk_id, joined, len(joined))
                chunk_id += 1
                cur, cur_len = [w], len(w)
            else:
                cur.append(w)
                cur_len += add
        joined = " ".join(cur)
        yield (chunk_id, joined, len(joined))


def chunk_documents(spark, docs: DataFrame, max_chars: int = 400) -> DataFrame:
    """Apply the ChunkText UDTF laterally: one output row per chunk,
    keyed (doc_id, chunk_id). At 100 TB this is a pure map stage — no
    shuffle, parallelism = input partitions; the Python boundary is
    per-partition generator streaming."""
    spark.udtf.register("chunk_text", ChunkText)
    docs.select("doc_id", "text").createOrReplaceTempView("__chunk_in")
    return spark.sql(
        f"""
        SELECT i.doc_id, c.chunk_id, c.chunk, c.chunk_chars
        FROM __chunk_in i, LATERAL chunk_text(i.text, {int(max_chars)}) c
        """
    )


# PII patterns deliberately use only regex constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
# classes, bounded repetition, \d, \b word boundaries.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII-shaped spans (email / phone / IPv4 / SSN) from
    ``text_col`` and count what was removed, per document.

    A training-data pipeline must scrub before anything else sees the
    text, so this is a pure per-row map: chained ``regexp_replace`` with
    typed placeholder tokens (``<EMAIL>`` …) plus a ``regexp_count`` per
    pattern — all JVM regex inside one codegen span, no Python, no
    shuffle, and the counts come from the SAME scan as the rewrite.

    Order matters, and the counts follow the SAME order as the
    replacements: each pattern is counted against the progressively
    scrubbed text (after all earlier patterns have been replaced), so a
    span consumed by an earlier pattern can never be counted again by a
    later one — e.g. the ``1.2.3.4`` inside ``user@1.2.3.4.com`` is
    part of the email match and must not also count as an IPv4. The
    invariant, asserted in tests: ``sum(n_*) == number of placeholder
    tokens inserted``, making the counts a true audit of the rewrite.
    """
    counts = []
    staged = F.col(text_col)
    for name, pat in PII_PATTERNS:
        counts.append(F.regexp_count(staged, F.lit(pat)).cast("bigint").alias(f"n_{name}"))
        staged = F.regexp_replace(staged, pat, f"<{name.upper()}>")
    keep = [c for c in docs.columns if c != text_col]
    return docs.select(*keep, *counts, staged.alias("scrubbed_text"))


def span_dedup(docs: DataFrame, span_tokens: int = 10) -> DataFrame:
    """C4-style span-level exact dedup across the corpus: split every
    document into consecutive non-overlapping ``span_tokens``-token
    blocks, keep only the globally-first occurrence of each distinct
    block (ordered by ``doc_id``, then block position), and reassemble
    each document from its surviving blocks in order.

    This is the middle ground between document-level dedup (misses
    boilerplate repeated inside otherwise-distinct pages) and shingle
    near-dup (probabilistic): repeated spans are removed *surgically*
    wherever they recur.

    Plan shape: tokenize once (the spans are built from a materialized
    token column, NOT by re-tokenizing inside the lambda — see the
    ``shingles`` docstring for why), posexplode, ONE window over the
    span hash for first-occurrence ranking, then re-aggregate with an
    order-restoring ``array_sort`` — two shuffles total (window +
    groupBy), both keyed well for AQE. At 100 TB the window partitions
    by span text whose cardinality is huge → no skew.
    """
    toks = docs.select("doc_id", TX.tokens("text").alias("toks")).where(
        # empty docs would make sequence(0, -1) run DESCENDING (Spark
        # defaults step to -1 when start > stop) and emit phantom spans
        F.size("toks") > 0
    )
    spans = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size("toks") - 1) / span_tokens).cast("int"),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("toks"), i * span_tokens + 1, span_tokens)
                ),
            )
        ).alias("pos", "span"),
    )
    first = F.row_number().over(
        Window.partitionBy("span").orderBy("doc_id", "pos")
    )
    kept = spans.withColumn("rn", first).where(F.col("rn") == 1)
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "span"))
            ).alias("ordered")
        )
        .select(
            "doc_id",
            F.size("ordered").cast("bigint").alias("n_spans_kept"),
            F.concat_ws(
                " ", F.transform("ordered", lambda s: s["span"])
            ).alias("dedup_text"),
        )
    )


def pack_sequences(docs: DataFrame, budget_tokens: int = 64) -> DataFrame:
    """GPT-style sequence packing: conceptually concatenate every
    document's tokens in ``doc_id`` order into one global stream, cut
    the stream every ``budget_tokens`` tokens, and report which bins
    each document lands in — one output row per (bin, document) with
    the token count that document contributes to that bin. This is the
    "pack then split" batch-construction step of a training-data
    pipeline (no padding waste, deterministic layout).

    The core is a GLOBAL exclusive prefix sum of per-document token
    counts. The naive rendering — ``sum().over(Window.orderBy(...))``
    with no partitionBy — funnels the whole relation through ONE task
    and is exactly what dies at 100 TB. Instead this uses the
    distributed two-phase prefix sum:

    1. range-repartition by ``doc_id`` (so partition order == key
       order), count tokens per doc;
    2. per-partition totals → a tiny relation (one row per partition);
       the exclusive prefix over THAT runs in a single task but touches
       only #partitions rows;
    3. broadcast the per-partition prefix back and add the
       within-partition running sum (window partitioned by partition
       id — parallel across partitions).

    Offsets are exact and the widest shuffle moved is one long per
    partition. Bin membership is then pure per-row arithmetic:
    bins ``floor(off/B) .. floor((off+n-1)/B)`` via an exploded
    ``sequence``.
    """
    n_tok = F.size(TX.tokens("text"))
    per_doc = (
        docs.select("doc_id", n_tok.cast("bigint").alias("n_tokens"))
        .where(F.col("n_tokens") > 0)
        .repartitionByRange("doc_id")
        .withColumn("pid", F.spark_partition_id())
        # Materialize ONCE before branching: both the partition-totals
        # branch and the offset join below must observe the SAME
        # pid↔row assignment. Without this the correctness of the
        # prefix sum silently depends on Catalyst exchange reuse — with
        # reuse disabled (or a future plan change) the range exchange
        # runs twice and spark_partition_id() may disagree between
        # branches. The checkpointed relation is tiny (doc_id + one
        # long per doc) and tokenization runs once instead of twice.
        .localCheckpoint()
    )
    part_totals = per_doc.groupBy("pid").agg(F.sum("n_tokens").alias("ptotal"))
    prefix = part_totals.withColumn(
        "pprefix",
        F.coalesce(
            F.sum("ptotal").over(
                Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("pid", "pprefix")
    intra = Window.partitionBy("pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        per_doc.join(F.broadcast(prefix), "pid")
        .withColumn(
            "offset",
            F.col("pprefix") + F.coalesce(F.sum("n_tokens").over(intra), F.lit(0)),
        )
        .select("doc_id", "n_tokens", "offset")
    )
    b = F.lit(budget_tokens).cast("bigint")
    first_bin = F.floor(F.col("offset") / b)
    last_bin = F.floor((F.col("offset") + F.col("n_tokens") - 1) / b)
    return (
        offsets.select(
            "doc_id",
            "n_tokens",
            "offset",
            F.explode(F.sequence(first_bin, last_bin)).alias("bin_id"),
        )
        .select(
            F.col("bin_id").cast("bigint"),
            "doc_id",
            "n_tokens",
            "offset",
            (
                F.least(F.col("offset") + F.col("n_tokens"), (F.col("bin_id") + 1) * b)
                - F.greatest(F.col("offset"), F.col("bin_id") * b)
            ).cast("bigint").alias("bin_tokens"),
        )
    )


def heavy_hitters(docs: DataFrame, k: int = 20, capacity: int = 256) -> DataFrame:
    """Exact corpus top-k tokens with BOUNDED shuffle: per-partition
    Misra–Gries candidate generation, then an exact recount restricted
    to the candidate set.

    Why not plain explode→groupBy→top-k (``token_frequency``): that
    shuffles one record per *distinct token per map partition* — at
    100 TB the token dictionary itself is the shuffle. Here each scan
    task emits at most ``capacity`` candidate tokens (the Misra–Gries
    summary, O(capacity) memory regardless of input size), and only the
    candidate set — not the dictionary — crosses the wire for the exact
    recount (broadcast semi join, map-side partial count).

    Exactness guarantee (classic MG bound): if a token's global count
    exceeds N/capacity (N = total tokens), it survives at least one
    partition's summary — contrapositive: a token missing from every
    summary has count <= n_p/capacity in each partition p, summing to
    <= N/capacity. So whenever the true k-th count > N/capacity (easily
    sized: Zipfian corpora need tiny capacities), the recounted top-k
    equals the exact top-k and the operator is oracle-checkable against
    plain SQL. Tests assert the bound holds at fixture scale.

    The Python tokenizer below deliberately mirrors ``functions.text.
    tokens`` (split on whitespace runs, drop empties) — candidates and
    recount must tokenize identically or the guarantee breaks. Java's
    ``\\s`` is ASCII-only while Python's is Unicode, so the candidate
    splitter is compiled with ``re.ASCII``: a corpus where tokens are
    glued with NBSP must see the SAME token boundaries on both sides,
    else high-count NBSP-joined tokens silently vanish from the "exact"
    top-k.
    """
    import re

    ws = re.compile(r"\s+", re.ASCII)

    def _mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf["text"]:
                if text is None:
                    continue
                for tok in ws.split(text):
                    if not tok:
                        continue
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < capacity:
                        counters[tok] = 1
                    else:
                        # decrement-all step; drop zeros
                        dead = []
                        for key in counters:
                            counters[key] -= 1
                            if counters[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del counters[key]
        yield pd.DataFrame({"token": list(counters.keys())})

    candidates = (
        ensure_min_partitions(docs.select("text")).mapInPandas(_mg, "token string").distinct()
    )
    toks = docs.select(F.explode(TX.tokens("text")).alias("token"))
    return (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def corpus_datacard(docs: DataFrame) -> DataFrame:
    """Per-(source, language) corpus profile — the data-card /
    datasheet step every training-data release ships: volume (docs,
    tokens, chars), exact-duplicate pressure (distinct canonical
    fingerprints vs rows), and document-length shape (average and max
    tokens). ONE scan and ONE groupBy over the full corpus; at 100 TB
    the group count is |sources|x|langs| (tiny), so the aggregate is
    all map-side partials plus a trivial final reduce. The fingerprint
    count rides the same Expand-based plan Catalyst uses for any
    count(distinct) alongside plain aggregates."""
    fp = TX.fingerprint("text")
    ntok = TX.token_count("text").cast("bigint")
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(ntok).alias("total_tokens"),
            F.sum(F.length("text").cast("bigint")).alias("total_chars"),
            F.countDistinct(fp).alias("n_unique"),
            F.round(F.avg(ntok), 2).alias("avg_tokens"),
            F.max(ntok).alias("max_tokens"),
        )
        .withColumn("n_exact_dups", (F.col("n_docs") - F.col("n_unique")).cast("bigint"))
        .orderBy("source", "lang")
    )


def source_divergence(docs: DataFrame, source_col: str = "source") -> DataFrame:
    """Distribution drift per corpus slice: for each ``source``, the
    total-variation distance and KL divergence between that source's
    unigram distribution and the whole-corpus distribution — the gate a
    training-data pipeline runs when a new crawl/source lands ("does
    this slice look like the mixture we trained on?").

    Determinism discipline (same as the unigram LM scorer above):

    - **TV is exact rational end-to-end**: TV(s) = ½·Σ_tok |p_s − p| =
      Σ|c_s·T − c·T_s| / (2·T_s·T); numerator summed in int64, one
      final division. Tokens absent from the source contribute
      T_s·(T − Σ_{tok∈s} c), computed from the same joined relation —
      no vocab×source cross join.
    - **KL quantizes per row, sums in int64**: each present token's
      log-ratio ln(c_s·T / (c·T_s)) converts ONCE to 2^-20 units (a
      per-row IEEE expression, no accumulation ordering), weighted by
      the exact count c_s and integer-summed; the single final division
      renders the double.

    Plan: explode → (source,tok) counts → tok-keyed join to the vocab
    relation (the Zipf-skew-bounding pre-aggregation) → one groupBy
    source with broadcast totals. int64 headroom: |c_s·T| ≤ T² needs
    T < 3·10⁹ tokens per exact-TV job; beyond that, shard the vocab by
    token range and sum per-shard TV numerators (associative), or drop
    to the double rendering.
    """
    toks = ensure_min_partitions(docs.select(F.col(source_col).alias("source"), "text")).select(
        "source", F.explode(TX.tokens("text")).alias("tok")
    )
    # three consumers (vocab, per-source totals, the scoring join) hang
    # off this pre-aggregation; persist it so the corpus is scanned and
    # tokenized ONCE — the (source,tok) relation is vocabulary-sized,
    # orders of magnitude smaller than the corpus it summarizes
    st = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c_s")).persist()
    vocab = st.groupBy("tok").agg(F.sum("c_s").alias("c"))
    s_tot = st.groupBy("source").agg(F.sum("c_s").alias("t_s"))
    total = vocab.agg(F.sum("c").alias("t"))
    joined = (
        st.join(vocab, "tok")
        .join(F.broadcast(s_tot), "source")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "t_s",
            "t",
            "c",
            "c_s",
            F.abs(F.col("c_s") * F.col("t") - F.col("c") * F.col("t_s")).alias("tv_term"),
            (
                F.col("c_s")
                * F.floor(
                    F.log(
                        (F.col("c_s") * F.col("t")).cast("double")
                        / (F.col("c") * F.col("t_s")).cast("double")
                    )
                    * F.lit(1048576.0)
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias("kl_term"),
        )
    )
    return (
        joined.groupBy("source", "t_s", "t")
        .agg(
            F.sum("tv_term").alias("tv_present"),
            F.sum("c").alias("c_covered"),
            F.sum("kl_term").alias("kl_q"),
        )
        .select(
            "source",
            F.col("t_s").alias("n_tokens"),
            F.round(
                (F.col("tv_present") + F.col("t_s") * (F.col("t") - F.col("c_covered")))
                / (F.lit(2.0) * F.col("t_s") * F.col("t")),
                6,
            ).alias("tv_dist"),
            F.round(F.col("kl_q") / (F.lit(1048576.0) * F.col("t_s")), 6).alias("kl_nats"),
        )
        .orderBy("source")
    )


def frequent_token_pairs(
    docs: DataFrame, min_support: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Frequent co-occurring token pairs with lift — the first two
    passes of a-priori frequent-itemset mining, the market-basket shape
    over documents (finds collocations / template phrases a cleaning
    pass should treat as units).

    Scale discipline: the pair explosion is the quadratic danger, so the
    classic a-priori prune runs FIRST — only tokens present in ≥
    ``min_support`` documents enter the per-document self-join (any
    frequent pair's members are themselves frequent, so this loses
    nothing). Join is equality on ``doc_id`` with ``tok_a < tok_b``;
    per-doc fan-out is (frequent-tokens-per-doc choose 2), the quantity
    ``min_support`` tunes. Lift = n_ab·N / (n_a·n_b) is rendered by ONE
    division of exact int64 products.
    """
    # consumed by the support count, both sides of the pair self-join,
    # and the doc count — tokenize + distinct once
    dt = (
        ensure_min_partitions(docs.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select("id", F.explode(TX.tokens(text_col)).alias("tok"))
        .distinct()
        .persist()
    )
    n_docs = docs.select(F.countDistinct(id_col).alias("n")).withColumn("__x", F.lit(1))
    freq = (
        dt.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_tok"))
        .filter(F.col("n_tok") >= min_support)
    )
    filtered = dt.join(F.broadcast(freq), "tok")
    pairs = (
        filtered.alias("a")
        .join(
            filtered.alias("b"),
            (F.col("a.id") == F.col("b.id")) & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(
            F.col("a.tok").alias("tok_a"),
            F.col("b.tok").alias("tok_b"),
            F.col("a.n_tok").alias("n_a"),
            F.col("b.n_tok").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    return (
        pairs.withColumn("__x", F.lit(1))
        .join(F.broadcast(n_docs), "__x")
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            F.round((F.col("n_ab") * F.col("n")) / (F.col("n_a") * F.col("n_b")), 6).alias(
                "lift"
            ),
        )
    )


def bigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-1 language-model scoring: per document, the mean add-one-
    smoothed bigram surprisal −ln P(w₂|w₁) under the corpus bigram
    distribution — the next step up from the unigram gate (catches
    scrambled/concatenated text that unigram frequencies cannot: the
    tokens are normal, their SEQUENCE is not).

    Determinism (same discipline as the unigram scorer): each bigram
    TYPE's surprisal ln((c₁+V)/(c₁₂+1)) quantizes ONCE to integer 2^-20
    units — a per-row IEEE expression with no accumulation order — then
    per-doc occurrence counts weight it in int64 sums; one final
    division renders the double.

    Plan: bigrams are built JVM-side from the token array (zip_with of
    two slices — zero shuffle, no posexplode self-join), pre-aggregated
    to (doc, w1, w2, k) before any join (the Zipf-skew bound), then one
    tok-pair-keyed join to the priced bigram vocabulary and one groupBy
    doc.
    """
    t = TX.tokens(text_col)
    base = ensure_min_partitions(
        docs.select(F.col(id_col).alias("id"), t.alias("t"))
    ).filter(F.size("t") >= 2)
    pairs = F.zip_with(
        F.slice("t", 1, F.size("t") - 1),
        F.slice("t", 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    dk = (
        base.select("id", F.explode(pairs).alias("b"))
        .select("id", "b.w1", "b.w2")
        .groupBy("id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
        .persist()
    )
    c12 = dk.groupBy("w1", "w2").agg(F.sum("k").alias("c12")).persist()
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = c12.agg(F.countDistinct("w2").alias("v")).withColumn("__x", F.lit(1))
    priced = (
        c12.join(c1, "w1")
        .withColumn("__x", F.lit(1))
        .join(F.broadcast(v), "__x")
        .select(
            "w1",
            "w2",
            F.floor(
                F.log(
                    (F.col("c1") + F.col("v")).cast("double")
                    / (F.col("c12") + 1).cast("double")
                )
                * F.lit(1048576.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("u"),
        )
    )
    return (
        dk.join(priced, ["w1", "w2"])
        .groupBy("id")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("u")).alias("su"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            F.round(F.col("su") / (F.lit(1048576.0) * F.col("n_bigrams")), 6).alias(
                "mean_surprisal"
            ),
        )
        .orderBy(id_col)
    )


def learn_bpe_merges(
    docs: DataFrame,
    rounds: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-merge learning (word-level BPE): ``rounds`` iterations
    of [count adjacent token pairs → pick the most frequent (count
    DESC, pair ASC — a total order, so the pick is deterministic) →
    greedily merge its occurrences left-to-right corpus-wide]. Returns
    the learned merge table (round, left, right, pair_count) — the
    artifact a BPE tokenizer ships.

    Distribution shape: the scale-critical part of BPE is the PAIR
    COUNT (full-corpus shuffle at pair grain, here one zip_with
    projection + map-side-combining groupBy per round) and the top-1
    pick (TakeOrdered, one row to the driver per round — the same
    bounded driver coordination as the IVF quantizer fit). The merge
    application is a per-doc ``aggregate`` fold — O(len²) per doc in
    this array-rendering (each step copies the accumulator), which is
    fine for chunk-bounded documents (``chunk_documents`` upstream
    bounds len); the fold matches reference BPE's leftmost-first
    overlap rule ("a a a" merges once, the survivor does not re-merge
    this round).
    """
    t = TX.tokens(text_col)
    cur = ensure_min_partitions(docs.select(t.alias("t"))).filter(F.size("t") >= 2)
    cur = cur.localCheckpoint()  # pin: each round re-reads the corpus
    out: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        pairs = cur.select(
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.struct(a.alias("x"), b.alias("y")),
                )
            ).alias("p")
        )
        top = (
            pairs.groupBy("p.x", "p.y")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        x, y, c = top[0]["x"], top[0]["y"], int(top[0]["c"])
        out.append((r, x, y, c))
        if r == rounds:
            # r10 (guide §1.2 — don't compute things you throw away):
            # the LAST round's merge application feeds nothing (only
            # the per-round pair counts are returned), but the eager
            # checkpoint used to materialize it anyway — a full
            # corpus-wide merge pass of pure dead work.
            break
        joined = f"{x} {y}"
        if x == y:
            # greedy leftmost with self-overlap ("a a a" merges once):
            # genuinely sequential — keep the O(len²) fold (rare: a
            # top pair with lhs == rhs)
            merged = F.aggregate(
                F.col("t"),
                F.array().cast("array<string>"),
                lambda acc, tok: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(x))
                    & (tok == F.lit(y)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(joined))
                    ),
                ).otherwise(F.concat(acc, F.array(tok))),
            )
        else:
            # r10 (guide §1.2 per-task work): with x ≠ y matches can
            # never overlap (a match ending at i+1 needs t[i+1] = x,
            # but t[i+1] = y ≠ x), so leftmost-greedy == "merge every
            # match site" and the O(len²) accumulator-copying fold
            # becomes one O(len) positional transform: emit the joined
            # token at match starts, drop the swallowed right token,
            # pass everything else through. Values identical (the
            # fold's own no-false-chain property: a merged survivor
            # "x y" never re-equals x this round).
            t = F.col("t")

            def tok(i):
                return F.element_at(t, i)

            def match_at(i):
                # try_element_at: NULL past the end (falsy in when());
                # plain element_at would THROW there under ANSI
                return (tok(i) == F.lit(x)) & (
                    F.try_element_at(t, i + 1) == F.lit(y)
                )

            cells = F.transform(
                F.sequence(F.lit(1), F.size(t)),
                # the (i > 1) guard must come first: And short-circuits,
                # and element_at(t, 0) would throw (array indices start
                # at 1)
                lambda i: F.when(match_at(i), F.lit(joined)).otherwise(
                    F.when(
                        (i > F.lit(1)) & match_at(i - 1),
                        F.lit(None).cast("string"),
                    ).otherwise(tok(i))
                ),
            )
            merged = F.filter(cells, lambda v: v.isNotNull())
        cur = cur.select(merged.alias("t")).localCheckpoint()
    spark = docs.sparkSession
    return spark.createDataFrame(
        out, "round int, lhs string, rhs string, pair_count bigint"
    )
