"""Corpus-curation operators for LLM training-data pipelines.

The selection/quality layer that sits between raw ingestion and training:
Gopher-style repetition filtering, C4/RefinedWeb-style per-source caps,
and token-budget corpus sampling. All three are standard steps in public
web-scale data recipes (Gopher: Rae et al. 2021 §A1.1; C4: Raffel et al.
2020 §2.2) re-expressed as declarative DataFrame plans with exact DuckDB
oracle twins.

Scale notes per operator are in the docstrings; the common theme is that
selection is driven by deterministic md5-derived ordering (stable under
re-partitioning, appends, and engine choice — no rand()), and the only
shuffles are per-group windows whose group counts, not group contents,
bound driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.text import sql_hash60, sql_tokens, tokens
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load

# Gopher-style repetition thresholds: a document is dropped when its most
# frequent word bigram covers more than this fraction of all bigrams, or
# when the fraction of repeated (non-first-occurrence) words exceeds the
# word threshold.
TOP_BIGRAM_MAX_FRAC = 0.20
DUP_WORD_MAX_FRAC = 0.70

# C4-style per-source cap: keep at most this many documents per source,
# chosen by deterministic hash order.
SOURCE_CAP = 300

# Token budget per language for corpus sampling.
LANG_TOKEN_BUDGET = 50_000


@register(
    "q116_repetition_filter",
    oracle=f"""
    WITH toks0 AS (
        SELECT doc_id, lang,
               list_filter({sql_tokens('text')}, x -> x <> '') AS t
        FROM documents
    ), toks AS (
        SELECT * FROM toks0 WHERE len(t) >= 1
    ), grams AS (
        SELECT doc_id, lang,
               len(t) AS n_words,
               len(list_distinct(t)) AS n_distinct_words,
               CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                    ELSE [list_aggregate(t, 'string_agg', ' ')] END AS bigrams
        FROM toks
    ), exploded AS (
        SELECT doc_id, lang, n_words, n_distinct_words,
               len(bigrams) AS n_bigrams, unnest(bigrams) AS bigram
        FROM grams
    ), per_gram AS (
        SELECT doc_id, lang, n_words, n_distinct_words, n_bigrams, bigram,
               COUNT(*) AS c
        FROM exploded
        GROUP BY ALL
    )
    SELECT doc_id, lang,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS BIGINT) AS top_bigram_count,
           CAST(MAX(c) AS DOUBLE) / n_bigrams AS top_bigram_frac,
           CAST(n_words - n_distinct_words AS DOUBLE) / n_words AS dup_word_frac,
           (CAST(MAX(c) AS DOUBLE) / n_bigrams <= {TOP_BIGRAM_MAX_FRAC}
            AND CAST(n_words - n_distinct_words AS DOUBLE) / n_words
                <= {DUP_WORD_MAX_FRAC}) AS keep
    FROM per_gram
    GROUP BY doc_id, lang, n_words, n_distinct_words, n_bigrams
    """,
    tags=("curation", "quality", "repetition"),
)
def q116_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: per-document duplicate-word fraction
    and most-frequent-bigram coverage, with the keep/drop decision both
    recipes use (Rae et al. 2021 §A1.1 re-expressed; the reference has no
    text ops — LLM-pipeline expansion surface).

    Scale: the WHOLE operator is a single map-side projection — tokenize,
    bigram, and the top-bigram count (array_sort + an aggregate() run-length
    fold over the sorted array) are all array expressions, so the plan has
    ZERO exchanges. The previous explode + (doc_id, bigram) groupBy shipped
    ~one shuffle row per corpus token; this shape ships nothing. O(n log n)
    per document for the sort, linear for the fold. No Python in the plan.

    Whitespace-only/empty documents are excluded up front (empty tokens
    filtered, then n_words >= 1 required) — identically in plan and
    oracle — because their token arrays are where the engines' regex-split
    edge behaviors could diverge, and a 0-token doc has no well-defined
    repetition fractions."""
    prep(spark)
    t = F.filter(tokens("text"), lambda x: x != "")
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", t.alias("t"))
        .filter(F.size("t") >= 1)
    )
    n = F.size("t")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at("t", i), F.element_at("t", i + 1)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", F.col("t"))))
    grams = docs.select(
        "doc_id",
        "lang",
        n.alias("n_words"),
        F.size(F.array_distinct("t")).alias("n_distinct_words"),
        F.array_sort(bigrams).alias("sb"),
    )
    # Max run length over the sorted bigram array == count of the most
    # frequent bigram, computed map-side with a struct-accumulator fold
    # (prev element, current run, best run) — no explode, no shuffle.
    zero = F.lit(0)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
    )

    def _step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + F.lit(1)).otherwise(
            F.lit(1)
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top = F.aggregate(F.col("sb"), init, _step, lambda acc: acc["best"])
    dup_frac = (F.col("n_words") - F.col("n_distinct_words")).cast("double") / F.col(
        "n_words"
    )
    top_frac = F.col("top_bigram_count").cast("double") / F.col("n_bigrams")
    return (
        grams.select(
            "doc_id",
            "lang",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.size("sb").cast("bigint").alias("n_bigrams"),
            top.cast("bigint").alias("top_bigram_count"),
            dup_frac.alias("dup_word_frac"),
        )
        .select(
            "doc_id",
            "lang",
            "n_words",
            "n_bigrams",
            "top_bigram_count",
            top_frac.alias("top_bigram_frac"),
            "dup_word_frac",
            (
                (top_frac <= TOP_BIGRAM_MAX_FRAC)
                & (F.col("dup_word_frac") <= DUP_WORD_MAX_FRAC)
            ).alias("keep"),
        )
    )


_ORDER_KEY = "md5(CAST(doc_id AS VARCHAR))"


@register(
    "q117_source_cap_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY {_ORDER_KEY}, doc_id
               ) AS BIGINT) AS rk
        FROM documents
    )
    SELECT doc_id, source, n_chars, rk
    FROM ranked WHERE rk <= {SOURCE_CAP}
    """,
    tags=("curation", "sampling", "source-cap"),
)
def q117_source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style per-source cap: keep at most SOURCE_CAP
    documents per source, selected by deterministic md5 order (so the
    sample is stable across runs, engines, and repartitioning — no
    rand()).

    Scale: one shuffle on source for the row_number window. A pathological
    mega-source makes that partition hot; the standard mitigation is a
    two-phase cap (cap within (source, shard) at ceil(K/shards), then
    re-cap within source over the ≤ K·shards survivors) — unnecessary here
    because output per source is bounded at K regardless, and the window
    sorts only the per-source slice."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= SOURCE_CAP)
    )


# Temperature-mixed sampling budget and the fixed-point weight scale.
# Temperature t=0.5 (i.e. weight ∝ n^0.5) is deliberate: sqrt is the ONE
# power IEEE 754 requires correctly rounded, so it is bit-identical
# across engines where a general pow(n, alpha) is not — the same
# portability reasoning as q53's rational idf.
MIX_BUDGET = 400
_MIX_QUOTA = "CAST(floor((CAST(w_fp AS DOUBLE) / total_fp) * 400.0) AS BIGINT)"


@register(
    "q76c_temperature_mix",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
        FROM documents GROUP BY source
    ), weights AS (
        SELECT source, n_s,
               CAST(floor(sqrt(CAST(n_s AS DOUBLE)) * 10000000.0) AS BIGINT)
                   AS w_fp
        FROM counts
    ), total AS (
        SELECT CAST(SUM(w_fp) AS BIGINT) AS total_fp FROM weights
    ), quotas AS (
        SELECT source, n_s, {_MIX_QUOTA} AS quota
        FROM weights CROSS JOIN total
    ), ranked AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY {_ORDER_KEY}, doc_id
               ) AS BIGINT) AS rk
        FROM documents
    )
    SELECT r.doc_id, r.source, r.rk, q.quota, q.n_s
    FROM ranked r JOIN quotas q USING (source)
    WHERE r.rk <= q.quota
    """,
    tags=("curation", "sampling", "mixture"),
)
def q76c_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixture sampling — the multilingual /
    multi-source mixing knob (XLM-R-style n^alpha upsampling of small
    sources): each source's share of a MIX_BUDGET-doc sample is
    proportional to sqrt(n_s) instead of n_s, flattening the mixture so
    dominant sources stop drowning out rare ones. Selection within a
    source is the deterministic md5 order q117 uses (stable across runs,
    engines, and repartitioning — no rand()).

    Determinism engineering: weights are floor(sqrt(n)·1e7) BIGINTs
    (sqrt is IEEE-correctly-rounded in both engines, the fixed-point sum
    is order-free), and the quota arithmetic is ONE shared expression
    string. Scale: counts is a map-side agg; weights/quotas are
    #sources rows (broadcast); the rank window shuffles once on source —
    the same shape as q117, with the same two-phase mitigation available
    for a pathological mega-source."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    weights = counts.select(
        "source",
        "n_s",
        F.expr(
            "CAST(floor(sqrt(CAST(n_s AS DOUBLE)) * 10000000.0) AS BIGINT)"
        ).alias("w_fp"),
    )
    total = weights.agg(F.sum("w_fp").cast("bigint").alias("total_fp"))
    quotas = (
        weights.crossJoin(F.broadcast(total))
        .select("source", "n_s", F.expr(_MIX_QUOTA).alias("quota"))
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w).cast("bigint").alias("rk")
    )
    return ranked.join(F.broadcast(quotas), "source").filter(
        F.col("rk") <= F.col("quota")
    ).select("doc_id", "source", "rk", "quota", "n_s")


# Cluster-balanced sampling budget: quota per embedding cluster is
# temperature-flattened (weight ∝ sqrt(cell size)) exactly like q76c's
# source mixture, but the strata are LEARNED k-means cells instead of
# metadata — the semantic-diversity sampling used by DCLM-style curation
# (cap dominant content clusters, keep rare ones represented).
CB_BUDGET = 200
_CB_QUOTA = f"CAST(floor((CAST(w_fp AS DOUBLE) / total_fp) * {CB_BUDGET}.0) AS BIGINT)"


def _cluster_balanced_oracle() -> str:
    from parquet_modular_encryption_spark.pipeline.similarity import _ivf_assign_ctes

    return f"""
    WITH {_ivf_assign_ctes()}, counts AS (
        SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_c FROM assign GROUP BY cell
    ), weights AS (
        SELECT cell, n_c,
               CAST(floor(sqrt(CAST(n_c AS DOUBLE)) * 10000000.0) AS BIGINT)
                   AS w_fp
        FROM counts
    ), total AS (
        SELECT CAST(SUM(w_fp) AS BIGINT) AS total_fp FROM weights
    ), quotas AS (
        SELECT cell, n_c, {_CB_QUOTA} AS quota
        FROM weights CROSS JOIN total
    ), rksel AS (
        SELECT vec_id, cell,
               CAST(row_number() OVER (
                   PARTITION BY cell
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) AS BIGINT) AS rk
        FROM assign
    )
    SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell, r.rk, q.quota, q.n_c
    FROM rksel r JOIN quotas q ON r.cell = q.cell
    WHERE r.rk <= q.quota
    """


@register(
    "q76d_cluster_balanced_sample",
    oracle=_cluster_balanced_oracle(),
    tags=("curation", "sampling", "clustering"),
)
def q76d_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced corpus sampling: q76c's temperature-flattened
    quota mixture applied to LEARNED strata — every embedding is
    assigned to its k-means cell (q54d's broadcast-codebook argmax via
    :func:`ivf_assignment`), each cell gets a sqrt(n_c)-proportional
    share of the CB_BUDGET sample, and selection within a cell is the
    deterministic md5 order. This is the semantic-diversity pass of a
    DCLM-style curation pipeline: dominant content clusters are capped,
    rare clusters stay represented, and no metadata column is needed.

    Composition of verified pieces end-to-end: deterministic centroid
    reduce (q52) → argmax assignment (q54d) → fixed-point sqrt weights
    and shared quota expression (q76c) → md5 rank selection (q117) —
    fully hash-checked through all four stages. Scale: assignment never
    shuffles the corpus (broadcast codebook, map-side argmax with
    partial-agg collapse); the assignment frame is materialized once
    (localCheckpoint) for its two consumers; quotas are K rows
    broadcast; the rank window shuffles once on cell."""
    from parquet_modular_encryption_spark.pipeline.similarity import ivf_assignment

    prep(spark)
    emb = load(spark, sf_dir, "embeddings")
    assign = ivf_assignment(emb).localCheckpoint(eager=True)
    counts = assign.groupBy("cell").agg(F.count(F.lit(1)).alias("n_c"))
    weights = counts.select(
        "cell",
        "n_c",
        F.expr(
            "CAST(floor(sqrt(CAST(n_c AS DOUBLE)) * 10000000.0) AS BIGINT)"
        ).alias("w_fp"),
    )
    total = weights.agg(F.sum("w_fp").cast("bigint").alias("total_fp"))
    quotas = weights.crossJoin(F.broadcast(total)).select(
        "cell", "n_c", F.expr(_CB_QUOTA).alias("quota")
    )
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    ranked = assign.select(
        "vec_id", "cell", F.row_number().over(w).cast("bigint").alias("rk")
    )
    return (
        ranked.join(F.broadcast(quotas), "cell")
        .filter(F.col("rk") <= F.col("quota"))
        .select("vec_id", "cell", "rk", "quota", "n_c")
    )


@register(
    "q118_token_budget_sample",
    oracle=f"""
    WITH counted AS (
        SELECT doc_id, lang,
               CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
        FROM documents
    ), cum AS (
        SELECT doc_id, lang, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY lang
                   ORDER BY {_ORDER_KEY}, doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_tokens
        FROM counted
    ), kept AS (
        SELECT * FROM cum WHERE cum_tokens - n_tokens < {LANG_TOKEN_BUDGET}
    )
    SELECT lang,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
           MAX(cum_tokens) AS budget_watermark
    FROM kept
    GROUP BY lang
    """,
    tags=("curation", "sampling", "token-budget"),
)
def q118_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus sampling: walk each language's documents in
    deterministic md5 order, keeping documents until the language's token
    budget is exhausted (a document that starts under budget is kept whole
    — the standard semantics so no document is split).

    Scale: the running sum is a per-lang window — one shuffle; languages
    are few but each partition streams (running-sum frames need no full
    materialization). Whole pipeline is codegen'd expressions; the final
    per-lang report is a tiny agg."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id",
        "lang",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = counted.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
    ).filter(F.col("cum_tokens") - F.col("n_tokens") < LANG_TOKEN_BUDGET)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        F.max("cum_tokens").alias("budget_watermark"),
    )


# End-to-end pipeline thresholds (q63b): quality floor and a tighter
# per-source cap than the standalone q117 so every stage visibly prunes.
PIPE_QUALITY_MIN = 0.5
PIPE_SOURCE_CAP = 100


def _q63b_oracle() -> str:
    from parquet_modular_encryption_spark.functions.numeric import sql_davg
    from parquet_modular_encryption_spark.functions.text import sql_normalized
    from parquet_modular_encryption_spark.pipeline.textops import SQL_QUALITY

    return f"""
    WITH fp AS (
        SELECT doc_id, lang, source, text,
               row_number() OVER (PARTITION BY md5({sql_normalized('text')})
                                  ORDER BY doc_id) AS fp_rn
        FROM documents
    ), deduped AS (
        SELECT doc_id, lang, source, text FROM fp WHERE fp_rn = 1
    ), scored AS (
        SELECT doc_id, lang, source, text, {SQL_QUALITY} AS q
        FROM deduped
        WHERE {SQL_QUALITY} >= {PIPE_QUALITY_MIN}
    ), capped AS (
        SELECT * FROM (
            SELECT doc_id, lang, source, text, q,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY {_ORDER_KEY}, doc_id) AS src_rn
            FROM scored
        ) WHERE src_rn <= {PIPE_SOURCE_CAP}
    ), counted AS (
        SELECT doc_id, lang, source, q,
               CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
        FROM capped
    ), budgeted AS (
        SELECT * FROM (
            SELECT doc_id, lang, source, q, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY lang
                       ORDER BY {_ORDER_KEY}, doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS cum_tokens
            FROM counted
        ) WHERE cum_tokens - n_tokens < {LANG_TOKEN_BUDGET}
    )
    SELECT lang, source,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
           {sql_davg('q')} AS avg_quality
    FROM budgeted
    GROUP BY lang, source
    """


@register(
    "q63b_curation_pipeline",
    oracle=_q63b_oracle(),
    tags=("curation", "pipeline", "dedup", "quality", "token-budget"),
)
def q63b_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pass end-to-end, composed from this repo's own
    stages: exact dedup (normalized fingerprint, min-doc_id canonical) →
    quality floor (q43's score ≥ 0.5) → per-source cap (q117's
    deterministic md5 order, cap 100) → per-language token budget (q118
    semantics) → per-(lang, source) report. Every stage is deterministic,
    so the WHOLE pipeline is one hash-checked oracle — the composability
    proof that the standalone operators chain without hidden state.

    Scale: four shuffles total (fingerprint window, source window, lang
    window, final agg) — each keyed on a different natural column, none
    avoidable without changing semantics; all intermediate rows stay
    columnar expressions inside codegen (no UDF, no collect)."""
    from parquet_modular_encryption_spark.functions.numeric import davg
    from parquet_modular_encryption_spark.functions.text import normalized
    from parquet_modular_encryption_spark.pipeline.textops import quality_score

    prep(spark)
    docs = load(spark, sf_dir, "documents")
    w_fp = Window.partitionBy(F.md5(normalized("text"))).orderBy("doc_id")
    deduped = (
        docs.withColumn("fp_rn", F.row_number().over(w_fp))
        .filter(F.col("fp_rn") == 1)
        .select("doc_id", "lang", "source", "text")
    )
    scored = deduped.select(
        "doc_id", "lang", "source", "text", quality_score(F.col("text")).alias("q")
    ).filter(F.col("q") >= PIPE_QUALITY_MIN)
    w_src = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    capped = (
        scored.withColumn("src_rn", F.row_number().over(w_src))
        .filter(F.col("src_rn") <= PIPE_SOURCE_CAP)
    )
    counted = capped.select(
        "doc_id",
        "lang",
        "source",
        "q",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
    )
    w_bud = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budgeted = counted.withColumn(
        "cum_tokens", F.sum("n_tokens").over(w_bud).cast("bigint")
    ).filter(F.col("cum_tokens") - F.col("n_tokens") < LANG_TOKEN_BUDGET)
    return budgeted.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        davg(F.col("q")).alias("avg_quality"),
    )


# DSIR-style importance weighting (Xie et al., NeurIPS'23, "Data
# Selection for Language Models via Importance Resampling"): score every
# document by how much its hashed-unigram distribution looks like a
# TARGET domain (here: the English slice) relative to the raw corpus,
# then keep the top scorers. Token features are hashed into a fixed
# bucket table, so the "model" is two bounded count vectors — the trick
# that makes importance estimation O(corpus) with O(buckets) state.
DSIR_BUCKETS = 4096
DSIR_TOP_K = 100
# Per-bucket importance ratio in exact integer arithmetic. Dropping the
# constant total-count normalization (p_t/p_r = (cnt_t/T)/(cnt_r/R))
# rescales every bucket by the same T/R factor and leaves the ranking
# untouched, while keeping all intermediates < 2^63 at any corpus size
# where per-bucket counts fit a BIGINT.


@register(
    "q43c_dsir_importance",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, source, unnest({sql_tokens('text')}) AS token
        FROM documents
    ), bucketed AS (
        SELECT doc_id, lang, source,
               {sql_hash60('token')} % {DSIR_BUCKETS} AS bucket
        FROM tok
    ), cnt_r AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt_r
        FROM bucketed GROUP BY bucket
    ), cnt_t AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt_t
        FROM bucketed WHERE lang = 'en' GROUP BY bucket
    ), ratio AS (
        SELECT r.bucket,
               CAST(((COALESCE(t.cnt_t, 0) + 1) * 10000000) // (r.cnt_r + 1)
                    AS BIGINT) AS ratio_fp
        FROM cnt_r r LEFT JOIN cnt_t t ON r.bucket = t.bucket
    ), scored AS (
        SELECT b.doc_id, b.lang, b.source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(ratio_fp) AS BIGINT) AS score_sum
        FROM bucketed b JOIN ratio USING (bucket)
        GROUP BY b.doc_id, b.lang, b.source
    )
    SELECT doc_id, lang, source, n_tokens,
           CAST(score_sum // n_tokens AS BIGINT) AS avg_ratio_fp
    FROM scored
    ORDER BY avg_ratio_fp DESC, doc_id
    LIMIT {DSIR_TOP_K}
    """,
    tags=("curation", "sampling", "dsir"),
)
def q43c_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting: rank documents by hashed-unigram
    likelihood ratio against a target domain (the English slice) and
    keep the top {DSIR_TOP_K} — the quality-by-distribution-match
    selection pass (Xie et al. 2023) that complements q43's rule-based
    quality filter and q76d's diversity sampling.

    Determinism engineering: token features hash through the portable
    md5-derived hash60 into {DSIR_BUCKETS} buckets; the per-bucket
    importance ratio is exact integer arithmetic (+1 smoothing, the
    constant total-count normalization dropped — it rescales every
    bucket identically, preserving ranking while keeping intermediates
    in BIGINT range); per-doc scores are exact integer sums with an
    integer-division average, and the top-K tie-breaks on doc_id — so
    the whole selection is hash-checked bit-for-bit.

    100 TB shape: two bounded aggregations build the {DSIR_BUCKETS}-row
    ratio table (map-side combinable — state is O(buckets) per mapper
    regardless of corpus size); scoring joins the token stream to the
    BROADCAST ratio table (no shuffle) and groups once on doc_id; the
    global top-K is orderBy+limit, which Spark plans as
    TakeOrderedAndProject (per-partition heaps + a K-row driver merge,
    never a global sort)."""
    prep(spark)
    from parquet_modular_encryption_spark.functions.text import hash60

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", "source", F.explode(tokens("text")).alias("token")
    )
    bucketed = tok.select(
        "doc_id",
        "lang",
        "source",
        (hash60(F.col("token")) % DSIR_BUCKETS).alias("bucket"),
    )
    cnt_r = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt_r"))
    cnt_t = (
        bucketed.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt_t"))
    )
    ratio = cnt_r.join(cnt_t, "bucket", "left").select(
        "bucket",
        F.expr(
            "CAST(((COALESCE(cnt_t, 0) + 1) * 10000000) DIV (cnt_r + 1) AS BIGINT)"
        ).alias("ratio_fp"),
    )
    scored = (
        bucketed.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("ratio_fp").cast("bigint").alias("score_sum"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            F.expr("CAST(score_sum DIV n_tokens AS BIGINT)").alias("avg_ratio_fp"),
        )
        .orderBy(F.desc("avg_ratio_fp"), F.asc("doc_id"))
        .limit(DSIR_TOP_K)
    )


# Gopher-style duplicate n-gram character threshold (Rae et al. 2021 §A1.1:
# drop when characters inside duplicated 5-grams exceed this fraction).
DUP_NGRAM_N = 5
DUP_NGRAM_MAX_FRAC = 0.15


@register(
    "q41b_dup_ngram_chars",
    oracle=f"""
    WITH toks0 AS (
        SELECT doc_id, lang,
               list_filter({sql_tokens('text')}, x -> x <> '') AS t
        FROM documents
    ), toks AS (
        SELECT * FROM toks0 WHERE len(t) >= 1
    ), grams AS (
        SELECT doc_id, lang,
               CASE WHEN len(t) >= {DUP_NGRAM_N}
                    THEN list_transform(
                        range(1, len(t) - {DUP_NGRAM_N} + 2),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                             || ' ' || t[i+3] || ' ' || t[i+4])
                    ELSE [array_to_string(t, ' ')] END AS g
        FROM toks
    ), exploded AS (
        SELECT doc_id, lang, len(g) AS n_grams, unnest(g) AS gram
        FROM grams
    ), per_gram AS (
        SELECT doc_id, lang, n_grams, gram,
               COUNT(*) AS c, length(gram) AS chars
        FROM exploded
        GROUP BY ALL
    )
    SELECT doc_id, lang,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(SUM(c * chars) AS BIGINT) AS total_gram_chars,
           CAST(SUM(CASE WHEN c >= 2 THEN c * chars ELSE 0 END) AS BIGINT)
               AS dup_gram_chars,
           CAST(SUM(CASE WHEN c >= 2 THEN c * chars ELSE 0 END) AS DOUBLE)
               / SUM(c * chars) AS dup_char_frac,
           (CAST(SUM(CASE WHEN c >= 2 THEN c * chars ELSE 0 END) AS DOUBLE)
               / SUM(c * chars) <= {DUP_NGRAM_MAX_FRAC}) AS keep
    FROM per_gram
    GROUP BY doc_id, lang, n_grams
    """,
    tags=("curation", "quality", "repetition"),
)
def q41b_dup_ngram_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's OTHER repetition rule — the duplicate n-gram character
    fraction (Rae et al. 2021 §A1.1: drop documents where characters
    belonging to duplicated 5-grams exceed 15%). Complements
    q116_repetition_filter (top-bigram coverage + duplicate-word fraction):
    that rule catches one dominant repeated phrase, this one catches many
    DIFFERENT repeated passages each occurring a few times — the templated-
    page signature top-bigram coverage misses.

    Character accounting is the occurrence-weighted published form (NeMo
    Curator / Dolma): chars(g)·count(g) summed over duplicated grams,
    normalized by the same sum over all grams — both sums are exact BIGINTs
    so the only float op is one division, identical cross-engine.

    Scale: same zero-exchange shape as q116 — n-gram construction, sort,
    and a run-length fold over the sorted gram array are all map-side array
    expressions; nothing shuffles, no Python in the plan. O(G log G) per
    document, G = token count. Documents shorter than n words contribute a
    single whole-text gram (never duplicated ⇒ frac 0, kept)."""
    prep(spark)
    n_ = DUP_NGRAM_N
    t = F.filter(tokens("text"), lambda x: x != "")
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", t.alias("t"))
        .filter(F.size("t") >= 1)
    )
    k = F.size("t")
    grams = F.when(
        k >= n_,
        F.transform(
            F.sequence(F.lit(1), k - n_ + 1),
            lambda i: F.concat_ws(
                " ", *[F.element_at("t", i + j) for j in range(n_)]
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", F.col("t"))))
    sg = docs.select(
        "doc_id", "lang", F.array_sort(grams).alias("sg")
    )
    # Sorted-run fold: equal grams are adjacent, so duplicate-char credit
    # is run-local — when a run reaches 2, credit both occurrences (the
    # first retroactively); each further repeat credits itself.
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).cast("bigint").alias("dup"),
    )

    def _step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + F.lit(1)).otherwise(
            F.lit(1)
        )
        add = (
            F.when(run == 2, F.length(x) * 2)
            .when(run > 2, F.length(x))
            .otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (acc["dup"] + add).cast("bigint").alias("dup"),
        )

    dup = F.aggregate(F.col("sg"), init, _step, lambda acc: acc["dup"])
    total = F.aggregate(
        F.col("sg"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.length(x),
    )
    frac = F.col("dup_gram_chars").cast("double") / F.col("total_gram_chars")
    return sg.select(
        "doc_id",
        "lang",
        F.size("sg").cast("bigint").alias("n_grams"),
        total.alias("total_gram_chars"),
        dup.alias("dup_gram_chars"),
    ).select(
        "*",
        frac.alias("dup_char_frac"),
        (frac <= F.lit(DUP_NGRAM_MAX_FRAC)).alias("keep"),
    )
