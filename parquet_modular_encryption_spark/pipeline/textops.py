"""Text-analysis operators for LLM training-data pipelines, over documents.

All pure built-in expressions (whole-stage codegen, no Python UDFs): token
counting, quality scoring, language profiling, document fingerprinting.
The language-ID heuristic lives in ``langid()`` as a reusable column
expression built from stopword hit-rates.

Scale notes: every query here is scan → map-side expressions → hash agg.
No joins, no windows; at 100 TB these are embarrassingly parallel and
bounded by parquet scan throughput."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.numeric import davg, sql_davg
from parquet_modular_encryption_spark.functions.text import (
    hash60,
    normalized,
    sql_hash60,
    sql_normalized,
    sql_tokens,
    tokens,
)
from parquet_modular_encryption_spark.pipeline.partitioning import widened
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load

# Tiny per-language trigger lexicons for the n-gram/stopword language-ID
# heuristic. Deliberately simple and deterministic (no model weights).
LANG_TRIGGERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "que", "de", "los"),
    "zh": ("的", "是", "了", "在", "我"),
}


@register(
    "q41_text_stats",
    oracle="""
    SELECT doc_id, lang, source,
           length(text) AS n_chars_measured,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
           CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS n_distinct_words,
           length(replace(text, ' ', '')) AS n_nonspace_chars,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(string_split_regex(trim(text), '\\s+')) AS avg_word_len
    FROM documents
    """,
    tags=("text", "stats"),
)
def q41_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics: char/word/distinct-word counts, mean
    word length — the standard quality-filter features."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars_measured"),
        F.size(toks).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_words"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("n_nonspace_chars"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("avg_word_len"),
    )


_SQL_NTOKENS = "len(string_split_regex(trim(text), '\\s+'))"


@register(
    "q42_token_counts",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST({_SQL_NTOKENS} AS BIGINT)) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST({_SQL_NTOKENS} AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "tokens"),
)
def q42_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per language (budget estimation for training
    runs): exact integer token totals, deterministic double average."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(tokens("text")).cast("bigint")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
        (F.sum(n_tokens).cast("double") / F.count(F.lit(1))).alias("avg_tokens_per_doc"),
        F.sum("n_chars").alias("total_chars"),
    )


# BPE-ish pretokenization regex (GPT-2 family shape): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs.
# Deliberately restricted to constructs with IDENTICAL semantics in
# Java's regex engine (Spark) and RE2 (DuckDB): ordered alternation,
# character classes, no lookaround (RE2 has none), no unicode
# categories. Subword counts from this pattern track BPE token counts
# closely enough for corpus budgeting, at zero Python cost.
# The whitespace class is spelled out as [ \t\n\r\f\x0B] rather than \s:
# Java's ASCII \s includes vertical tab (\x0B) while RE2's \s does not,
# so a bare \s would tokenize a VT-bearing document differently in Spark
# vs the DuckDB oracle (a confusing hash-check failure). The explicit
# class has identical membership in both engines.
BPE_ISH_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^ \t\n\r\f\x0Ba-zA-Z0-9]+"
)
# SQL literal form: double the quotes; backslashes pass through verbatim
# in DuckDB single-quoted strings (no escape processing).
_SQL_BPE = BPE_ISH_PATTERN.replace("'", "''")


@register(
    "q42b_subword_token_counts",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(len(regexp_extract_all(text, '{_SQL_BPE}')) AS BIGINT))
                AS BIGINT) AS total_subwords,
           CAST(SUM(CAST(len(regexp_extract_all(text, '{_SQL_BPE}')) AS BIGINT))
                AS DOUBLE)
               / SUM(CAST({_SQL_NTOKENS} AS BIGINT)) AS subwords_per_word
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "tokens", "bpe"),
)
def q42b_subword_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword token accounting with a BPE-ish pretokenization regex —
    the training-budget estimate q42's whitespace counts under-report
    (punctuation, contractions, and digit runs become separate tokens).
    Pure regexp_extract_all + integer sums: whole-stage codegen, no
    Python, and the fertility ratio (subwords per whitespace word) is a
    deterministic quotient of two exact BIGINTs. The pattern is pinned
    to the Java-regex ∩ RE2 common subset so the DuckDB oracle
    hash-checks the tokenization itself."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    # idx=0 = whole match (the pattern has no capture groups; Spark's
    # default idx=1 would demand one)
    n_sub = F.size(
        F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0)
    ).cast("bigint")
    n_ws = F.size(tokens("text")).cast("bigint")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_sub).alias("total_subwords"),
        (F.sum(n_sub).cast("double") / F.sum(n_ws)).alias("subwords_per_word"),
    )


def quality_score(text_col: Column) -> Column:
    """Heuristic quality score in [0,1]: length saturation × lexical
    diversity. IEEE double ops only → oracle-reproducible."""
    toks = tokens(text_col)
    n = F.size(toks).cast("double")
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    length_sat = F.least(n / F.lit(50.0), F.lit(1.0))
    return length_sat * F.lit(0.5) + diversity * F.lit(0.5)


SQL_QUALITY = (
    "(least(len(string_split_regex(trim(text), '\\s+')) / 50.0, 1.0) * 0.5"
    " + (CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)"
    "    / len(string_split_regex(trim(text), '\\s+'))) * 0.5)"
)


@register(
    "q43_quality_filter",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {sql_davg(SQL_QUALITY)} AS avg_quality,
           CAST(SUM(CASE WHEN {SQL_QUALITY} >= 0.75 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "quality"),
)
def q43_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + threshold filter accounting per language — the
    keep/drop decision of a training-data curation pass."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    q = quality_score(F.col("text"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg(q).alias("avg_quality"),
        F.sum(F.when(q >= 0.75, 1).otherwise(0)).alias("n_high_quality"),
    )


def langid(text_col: Column) -> Column:
    """Stopword-trigger language-ID heuristic: argmax of per-language
    trigger-word hit counts (ties broken by language code order).
    Returns 'und' when nothing triggers."""
    toks = tokens(text_col)

    def _matches(words):
        # `Column.isin` is unsupported on lambda variables inside
        # higher-order functions; an OR chain compiles to the same plan.
        def pred(t):
            cond = t == F.lit(words[0])
            for w in words[1:]:
                cond = cond | (t == F.lit(w))
            return cond

        return pred

    scores = [
        F.struct(
            F.size(F.filter(toks, _matches(words))).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, words in sorted(LANG_TRIGGERS.items())
    ]
    # array_max over (hits, code) structs: max hits, then max code — invert
    # code ordering is not needed for a heuristic; keep deterministic.
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


def _sql_langid_oracle() -> str:
    """DuckDB twin of ``langid``: per-language trigger-hit counts, argmax
    with the SAME tie-break as the Spark struct array_max (max hits, then
    max language code — hence the descending-code CASE cascade)."""
    hits = ", ".join(
        "len(list_filter(t, x -> x IN ({words}))) AS h_{code}".format(
            code=code, words=", ".join(f"'{w}'" for w in words)
        )
        for code, words in sorted(LANG_TRIGGERS.items())
    )
    codes = sorted(LANG_TRIGGERS)
    m = f"greatest({', '.join(f'h_{c}' for c in codes)})"
    cascade = " ".join(
        f"WHEN h_{c} = m THEN '{c}'" for c in sorted(codes, reverse=True)
    )
    return f"""
    WITH toks AS (
        SELECT lang, {sql_tokens('text')} AS t FROM documents
    ), hits AS (
        SELECT lang, {hits} FROM toks
    ), best AS (
        SELECT lang, m,
               CASE WHEN m = 0 THEN 'und' {cascade} END AS predicted_lang
        FROM (SELECT *, {m} AS m FROM hits)
    )
    SELECT lang, predicted_lang, COUNT(*) AS n_docs
    FROM best GROUP BY lang, predicted_lang
    """


@register("q44_langid", oracle=_sql_langid_oracle(), tags=("text", "langid"))
def q44_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion profile: heuristic prediction vs labeled lang.
    Hash-checked: the stopword-scoring argmax is deterministic integer
    arithmetic, so the SQL twin reproduces it exactly (tie-break
    included); tests/test_pipeline.py additionally asserts the confusion
    matrix is well-formed."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("predicted_lang", langid(F.col("text")))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "q45_fingerprint",
    oracle=f"""
    SELECT md5({sql_normalized('text')}) AS fingerprint,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies,
           MIN(n_chars) AS n_chars
    FROM documents
    GROUP BY 1
    """,
    tags=("text", "fingerprint", "dedup"),
)
def q45_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-text fingerprinting (md5 over canonical form) + collapse
    to canonical doc — whitespace/case-insensitive exact dedup."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("fingerprint", F.md5(normalized("text")))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_chars").alias("n_chars"),
        )
    )


# BM25 retrieval fixture + parameters. k1=1.2, b=0.75 (the standard
# defaults); idf is the RATIONAL (N - df + 0.5)/(df + 0.5) form — the
# log() in textbook BM25 is monotone, so top-k ranking is preserved,
# and rational arithmetic is cross-engine exact where ln is not (the
# q53 trick). Per-(query, doc) term scores are summed in FIXED-POINT
# (floor(s * 1e7) as BIGINT) because double addition is not associative
# and aggregation order differs between engines; integer sums are exact
# in any order (the q52 centroid trick).
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "hash"), (1, "join"),
    (2, "window"), (2, "agg"),
    (3, "stream"), (3, "batch"), (3, "scan"),
)
# Identical expression STRING evaluated by both engines (F.expr on the
# Spark side) over identically-named columns — same parse tree, same
# IEEE operation order, bit-identical doubles.
_BM25_TERM_SCORE = (
    "(((CAST(n AS DOUBLE) - df) + 0.5) / (df + 0.5))"
    " * ((tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl)))"
)
_BM25_TERM_FP = f"CAST(floor(({_BM25_TERM_SCORE}) * 10000000.0) AS BIGINT)"


# WITH-body fragment ending in ``scored`` (query_id, doc_id, score) —
# the BM25 scoring core shared by q53c's top-k and q53d's hybrid fusion.
_BM25_SCORED_CTES = f"""tok AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS token FROM documents
    ),
    qt(query_id, token) AS (
        VALUES {', '.join(f"({q}, '{t}')" for q, t in BM25_QUERIES)}
    ),
    dl AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST((SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS DOUBLE)
                   / COUNT(*) AS avgdl
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        WHERE token IN (SELECT token FROM qt) GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
    ),
    term_scores AS (
        SELECT qt.query_id, tf.doc_id, {_BM25_TERM_FP} AS s_fp
        FROM qt
        JOIN tf USING (token)
        JOIN df USING (token)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats
    ),
    scored AS (
        SELECT query_id, doc_id,
               CAST(SUM(s_fp) AS BIGINT) / 10000000.0 AS score
        FROM term_scores GROUP BY query_id, doc_id
    )"""


@register(
    "q53c_bm25_topk",
    oracle=f"""
    WITH {_BM25_SCORED_CTES}
    SELECT query_id, doc_id, score, CAST(rn AS INT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
    tags=("text", "retrieval", "bm25"),
)
def q53c_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the corpus — the quality-biased document
    selection primitive (query-driven curation, contamination triage,
    RAG indexing all rank this way): per query, top-5 documents by
    Okapi BM25 with k1=1.2, b=0.75 and the rational idf (see
    BM25_QUERIES/_BM25_TERM_SCORE for the determinism engineering:
    shared expression string, fixed-point term-score summation).

    Scale shape: tf/df are computed ONLY for query terms (the IN filter
    sits under the aggregation, so the exploded token stream shrinks to
    the term postings before any shuffle — at 100 TB this is the
    posting-list fetch of an inverted index, cf. q98); dl is a per-doc
    count (one shuffle); qt/df/stats are bounded and broadcast; the
    tf-dl join shuffles on doc_id (dl is corpus-wide — NOT broadcast,
    AQE decides); the rank window partitions by query over <= N_docs
    candidate rows."""
    prep(spark)
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    scored = _bm25_scored(spark, docs)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "doc_id", "score", "rank")
    )


def _bm25_scored(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(query_id, doc_id, score) BM25 scoring core — the Spark twin of
    ``_BM25_SCORED_CTES``, shared by q53c (top-k) and q53d (hybrid RRF)."""
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    qt = spark.createDataFrame(list(BM25_QUERIES), "query_id int, token string")
    terms = sorted({t for _, t in BM25_QUERIES})
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    # avgdl = total tokens / total docs, both corpus-wide BIGINTs
    stats = n_docs.crossJoin(
        dl.agg(F.sum("dl").cast("bigint").alias("total_dl"))
    ).select("n", (F.col("total_dl").cast("double") / F.col("n")).alias("avgdl"))
    tf = (
        tok.filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df from tf, not a second pass over the token stream: tf has one
    # row per (doc, token), so rows-per-token IS the document frequency.
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    term_scores = (
        tf.join(F.broadcast(qt), "token")
        .join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", F.expr(_BM25_TERM_FP).alias("s_fp"))
    )
    return term_scores.groupBy("query_id", "doc_id").agg(
        (F.sum("s_fp").cast("bigint") / F.lit(10000000.0)).alias("score")
    )


# Hybrid retrieval (q53d): fuse the BM25 lexical ranking with a dense
# cosine ranking via Reciprocal Rank Fusion (Cormack et al., SIGIR'09):
# score(d) = sum over systems of 1/(K_RRF + rank_s(d)). Determinism:
# ranks are integers, and each contribution is floor(1e12/(K_RRF+r)) —
# a correctly-rounded IEEE division of exact integers followed by floor,
# bit-identical in both engines — summed as exact BIGINTs, so fusion
# order can never flip a tie. The dense query vector for BM25 query q is
# embeddings.vec_id == q (the testdata contract keeps doc_id and vec_id
# row-aligned); the query's own vector is excluded from its candidates.
K_RRF = 60
RRF_CAND_K = 20  # per-system candidate depth fed into fusion
RRF_TOP_K = 10
_RRF_FP = (
    f"coalesce(CAST(floor(1000000000000.0 / ({K_RRF} + r_lex)) AS BIGINT), 0)"
    f" + coalesce(CAST(floor(1000000000000.0 / ({K_RRF} + r_dense)) AS BIGINT), 0)"
)


@register(
    "q53d_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_SCORED_CTES},
    lex AS (
        SELECT query_id, doc_id, CAST(rn AS INT) AS r_lex FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, doc_id) AS rn
            FROM scored
        ) WHERE rn <= {RRF_CAND_K}
    ),
    dq AS (
        SELECT CAST(vec_id AS INT) AS query_id, embedding::DOUBLE[] AS qe
        FROM embeddings
        WHERE vec_id IN (SELECT DISTINCT query_id FROM qt)
    ),
    dense_scored AS (
        SELECT dq.query_id, e.vec_id AS doc_id,
               list_dot_product(qe, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(qe, qe))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))) AS cos
        FROM dq JOIN embeddings e ON e.vec_id <> dq.query_id
    ),
    dense AS (
        SELECT query_id, doc_id, CAST(rn AS INT) AS r_dense FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, doc_id) AS rn
            FROM dense_scored
        ) WHERE rn <= {RRF_CAND_K}
    ),
    fused AS (
        SELECT query_id, doc_id, r_lex, r_dense, {_RRF_FP} AS rrf_fp
        FROM lex FULL JOIN dense USING (query_id, doc_id)
    )
    SELECT query_id, doc_id, r_lex, r_dense, rrf_fp,
           CAST(rn AS INT) AS hybrid_rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_fp DESC, doc_id) AS rn
        FROM fused
    ) WHERE rn <= {RRF_TOP_K}
    """,
    tags=("text", "retrieval", "hybrid", "similarity"),
)
def q53d_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval — BM25 (q53c's scoring core) and
    dense cosine top-{RRF_CAND_K} lists fused per query by Reciprocal
    Rank Fusion, the standard production hybrid-search combiner: a
    document ranked by either system scores 1/({K_RRF}+rank) per list,
    summed in exact fixed-point (see _RRF_FP), top-{RRF_TOP_K} kept.

    Scale shape: each branch is a verified bounded-output primitive —
    BM25's posting-list fetch (tf computed only for query terms) and the
    broadcast-queries×corpus-scan cosine ranking (q50's shape) each end
    in a per-query top-k window over candidate rows, so the fusion join
    receives at most 2×queries×{RRF_CAND_K} rows regardless of corpus
    size; the full-outer fuse and final window are driver-scale work.
    Fully hash-checked: both rankings and the fixed-point RRF sum are
    deterministic in both engines."""
    prep(spark)
    from pyspark.sql import Window

    from parquet_modular_encryption_spark.pipeline.similarity import (
        as_double,
        cosine,
    )

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    query_ids = sorted({q for q, _ in BM25_QUERIES})

    w_lex = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        _bm25_scored(spark, docs)
        .withColumn("r_lex", F.row_number().over(w_lex).cast("int"))
        .filter(F.col("r_lex") <= RRF_CAND_K)
        .select("query_id", "doc_id", "r_lex")
    )

    dq = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").cast("int").alias("query_id"),
        as_double(F.col("embedding")).alias("qe"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("doc_id"), as_double(F.col("embedding")).alias("ee")
    )
    w_dense = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    dense = (
        F.broadcast(dq)
        .join(corpus, F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id", cosine(F.col("qe"), F.col("ee")).alias("cos"))
        .withColumn("r_dense", F.row_number().over(w_dense).cast("int"))
        .filter(F.col("r_dense") <= RRF_CAND_K)
        .select("query_id", "doc_id", "r_dense")
    )

    fused = lex.join(dense, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_fp", F.expr(_RRF_FP)
    )
    w_rrf = Window.partitionBy("query_id").orderBy(F.desc("rrf_fp"), F.asc("doc_id"))
    return (
        fused.withColumn("hybrid_rank", F.row_number().over(w_rrf).cast("int"))
        .filter(F.col("hybrid_rank") <= RRF_TOP_K)
        .select("query_id", "doc_id", "r_lex", "r_dense", "rrf_fp", "hybrid_rank")
    )


# Fixed-window chunking parameters: 64-token windows advancing by 48
# (16-token overlap) — the RAG / long-document pretraining chunker.
# Overlap preserves context across boundaries; stride < size guarantees
# every token lands in >= 1 chunk.
CHUNK_SIZE = 64
CHUNK_STRIDE = 48

# DuckDB WITH-body fragment ending in ``ch`` (doc_id, c.idx, c.chunk) —
# the chunking core shared by q43b's listing and q43d's recursive chain.
_CHUNK_CTES = f"""tok AS (
        SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    ), ch AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) + 1, {CHUNK_STRIDE}),
                      s -> struct_pack(
                          idx := CAST((s - 1) // {CHUNK_STRIDE} AS BIGINT),
                          chunk := toks[s : s + {CHUNK_SIZE} - 1]))) AS c
        FROM tok
    )"""


@register(
    "q43b_doc_chunks",
    oracle=f"""
    WITH {_CHUNK_CTES}
    SELECT doc_id,
           c.idx AS chunk_index,
           CAST(len(c.chunk) AS BIGINT) AS n_tokens,
           md5(array_to_string(c.chunk, ' ')) AS chunk_hash
    FROM ch
    """,
    tags=("text", "chunking", "rag"),
)
def q43b_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window document chunking with overlap — the context-window
    splitter every RAG index and long-document pretraining pipeline runs:
    {CHUNK_SIZE}-token windows advancing {CHUNK_STRIDE} tokens (so
    consecutive chunks share {CHUNK_SIZE - CHUNK_STRIDE} tokens of
    context), identified by (doc_id, chunk_index) with a deterministic
    content hash for downstream dedup/joins. Complements q63's
    bin-packing (which concatenates whole docs to a budget) — chunking
    SPLITS oversized docs instead.

    Pure map-side higher-order expressions (sequence → slice → md5):
    ZERO shuffles at any scale, the plan is scan → project → explode.
    Tail chunks are kept truncated (slice clips at the array end) — both
    engines apply the identical rule, so the output is hash-checked
    including chunk hashes."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    chunks = F.expr(
        f"transform(sequence(1, size(toks), {CHUNK_STRIDE}), "
        f"s -> slice(toks, s, {CHUNK_SIZE}))"
    )
    return (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", F.posexplode(chunks).alias("chunk_index", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_index").cast("bigint").alias("chunk_index"),
            F.size("chunk").cast("bigint").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_hash"),
        )
    )


@register(
    "q43d_chunk_hash_chain",
    oracle=f"""
    WITH RECURSIVE {_CHUNK_CTES}, chunks AS (
        SELECT doc_id, c.idx AS chunk_index,
               md5(array_to_string(c.chunk, ' ')) AS chunk_hash
        FROM ch
    ), chain(doc_id, chunk_index, h) AS (
        SELECT doc_id, chunk_index, chunk_hash FROM chunks WHERE chunk_index = 0
        UNION ALL
        SELECT c.doc_id, c.chunk_index, md5(concat(chain.h, c.chunk_hash))
        FROM chain JOIN chunks c
          ON c.doc_id = chain.doc_id AND c.chunk_index = chain.chunk_index + 1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           max_by(h, chunk_index) AS chain_hash
    FROM chain GROUP BY doc_id
    """,
    tags=("text", "chunking", "recursive", "provenance"),
)
def q43d_chunk_hash_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Merkle-style hash chain over the q43b chunk sequence,
    computed with Spark 4's RECURSIVE CTE: h_0 = hash(chunk_0),
    h_i = md5(h_{{i-1}} || hash(chunk_i)), reported as (doc_id, n_chunks,
    final chain hash) — the tamper-evident provenance fingerprint a
    training-data pipeline stamps on every document so any chunk
    insertion, deletion, reorder, or edit changes the chain (a plain
    unordered hash of chunk hashes would miss reorders).

    This is the one computation class windows cannot express: an
    ORDER-DEPENDENT fold whose step function (md5 of the running state)
    is neither associative nor a SQL aggregate. The recursive CTE is the
    declarative form of that fold, and Spark 4.1 executes it as an
    iterative loop over the previous step's rows — each step one
    hash-join on (doc_id, chunk_index), depth = max chunks per document
    (bounded by the longest document / CHUNK_STRIDE, far under the
    default 100-level recursion limit; a 100 TB corpus raises
    spark.sql.cteRecursionLevelLimit for pathological documents or
    pre-splits them). The same recursive SQL runs verbatim on DuckDB, so
    the engine's recursion, not just the chain arithmetic, is
    hash-checked."""
    prep(spark)
    chunks = q43b_doc_chunks(spark, sf_dir).select(
        "doc_id", "chunk_index", "chunk_hash"
    )
    chunks.createOrReplaceTempView("pme_chunks_v")
    return spark.sql("""
        WITH RECURSIVE chain (doc_id, chunk_index, h) AS (
            SELECT doc_id, chunk_index, chunk_hash
            FROM pme_chunks_v WHERE chunk_index = 0
            UNION ALL
            SELECT c.doc_id, c.chunk_index, md5(concat(chain.h, c.chunk_hash))
            FROM chain JOIN pme_chunks_v c
              ON c.doc_id = chain.doc_id AND c.chunk_index = chain.chunk_index + 1
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               max_by(h, chunk_index) AS chain_hash
        FROM chain GROUP BY doc_id
    """)


# Winnowing fingerprint parameters (Schleimer, Wilkerson & Aiken,
# SIGMOD'03 — the MOSS scheme): k-char grams hashed, then the minimum
# hash of every w-window selected. Guarantee: any shared substring of
# length >= k + w - 1 yields at least one shared fingerprint, while the
# selected set is ~2/(w+1) of all gram hashes — the density knob that
# makes fingerprint indexes affordable at 100 TB.
WINNOW_K = 8
WINNOW_W = 4
WINNOW_MIN_SHARED = 2
# Document-frequency cap (MOSS's boilerplate drop): a fingerprint shared
# by more than this many documents is template/license text that carries
# no dedup signal — every document "matches" boilerplate. Dropping those
# fingerprints BEFORE pair generation is what keeps the pair count
# linear on web corpora: without it, one license header shared by k docs
# puts k rows on a single fingerprint key => k^2 pairs on one reducer.
WINNOW_MAX_DF = 50


def _winnow_fps_sql() -> str:
    """DuckDB winnowing fingerprint set for a ``norm`` column."""
    grams = (
        f"list_transform(range(1, length(norm) - {WINNOW_K} + 2), "
        f"i -> substr(norm, i, {WINNOW_K}))"
    )
    hashes = (
        f"list_transform({grams}, g -> "
        f"CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT))"
    )
    minima = (
        f"list_distinct(list_transform(range(1, len(h) - {WINNOW_W} + 2), "
        f"j -> list_min(h[j:j+{WINNOW_W - 1}])))"
    )
    return f"""
    normed AS (
        SELECT doc_id, {sql_normalized('text')} AS norm FROM documents
    ), hashed AS (
        SELECT doc_id, {hashes} AS h FROM normed
        WHERE length(norm) >= {WINNOW_K + WINNOW_W - 1}
    ), fps AS (
        SELECT DISTINCT doc_id, unnest({minima}) AS fp FROM hashed
    )
    """


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) winnowing fingerprint set for a (doc_id, text, ...)
    frame — the q45b core, exposed for the guarantee property test.

    The input is widened to session parallelism first (r15): the md5
    gram hashing below is the operator's dominant cost and a small
    corpus arrives as ONE scan partition — the fingerprint checkpoint
    was a measured 6 s single-task stage at sf0.1 (see
    partitioning.widened; a no-op on already-wide production scans)."""
    normed = widened(
        docs.select("doc_id", normalized("text").alias("norm")).filter(
            F.length("norm") >= WINNOW_K + WINNOW_W - 1
        )
    )
    hashes = F.expr(
        f"transform(transform(sequence(1, length(norm) - {WINNOW_K} + 1), "
        f"i -> substr(norm, i, {WINNOW_K})), "
        f"g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT))"
    )
    minima = F.expr(
        f"array_distinct(transform(sequence(1, size(h) - {WINNOW_W} + 1), "
        f"j -> array_min(slice(h, j, {WINNOW_W}))))"
    )
    # No .distinct(): the per-document array_distinct above already makes
    # every exploded (doc_id, fp) row unique, so a distinct here would be
    # a semantic no-op costing one full shuffle of the fingerprint index.
    # The fingerprint-ARRAY frame is localCheckpointed before the explode:
    # codegen inlines a Generate's child, so exploding the lazy minima HOF
    # would re-run the md5 gram hashing + window minima per emitted
    # fingerprint (the round-9 q49c finding; md5 dominates this operator).
    arrays = (
        normed.select("doc_id", hashes.alias("h"))
        .select("doc_id", minima.alias("fps"))
        .localCheckpoint(eager=True)
    )
    return arrays.select("doc_id", F.explode("fps").alias("fp"))


def winnow_candidate_pairs(docs: DataFrame, max_df: int = WINNOW_MAX_DF) -> DataFrame:
    """(doc_a, doc_b, n_shared) winnowing candidate pairs with a
    document-frequency cap — the q45b core, exposed for the adversarial
    boilerplate test.

    One shuffle total: group the fingerprint index by ``fp``, drop
    fingerprints whose document frequency exceeds ``max_df`` (MOSS's
    boilerplate filter — see WINNOW_MAX_DF), and generate pairs directly
    from the surviving per-fingerprint doc sets with higher-order array
    functions. Because every surviving set has <= max_df members, pair
    fan-out per key is bounded by max_df^2/2 regardless of corpus size —
    no self-join, no hot reducer, no quadratic output on templated text."""
    fps = winnow_fingerprints(docs)
    pairs = F.expr(
        "flatten(transform(docs, (a, i) -> "
        "transform(slice(docs, i + 2, size(docs)), "
        "b -> struct(a AS doc_a, b AS doc_b))))"
    )
    return (
        fps.groupBy("fp")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("docs"))
        .filter(F.size("docs").between(2, max_df))
        .select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )


@register(
    "q45b_winnow_fingerprint",
    oracle=f"""
    WITH {_winnow_fps_sql()},
    kept AS (
        SELECT fp, list_sort(list(DISTINCT doc_id)) AS docs
        FROM fps GROUP BY fp
        HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {WINNOW_MAX_DF}
    ),
    pair AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        JOIN kept k ON a.fp = k.fp
    )
    SELECT doc_a, doc_b, COUNT(*) AS n_shared
    FROM pair
    GROUP BY doc_a, doc_b
    HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
    """,
    tags=("text", "fingerprint", "dedup", "winnowing"),
)
def q45b_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing: k-gram hashes
    over the normalized text, windowed-minimum selection, a MOSS-style
    document-frequency cap (fingerprints in > {WINNOW_MAX_DF} documents
    are boilerplate and dropped), then candidate pairs sharing >=
    {WINNOW_MIN_SHARED} surviving fingerprints. Unlike q45's
    whole-document md5 (exact dedup only), winnowing localizes:
    documents sharing any run of {WINNOW_K + WINNOW_W - 1}+ characters
    are guaranteed a shared fingerprint, catching copied passages inside
    otherwise-different documents.

    Everything is higher-order array expressions (substr-gram transform,
    slice/array_min winnowing, struct-pair generation) — no explode
    until the fingerprint set, no Python, no self-join. Scale: a single
    shuffle on the fingerprint value groups each fp's doc set; the DF
    cap bounds every set at {WINNOW_MAX_DF} members so per-key pair
    fan-out is constant — a license header shared by 10^6 documents
    contributes zero pairs instead of 10^12. Winnowing's ~2/(w+1)
    density bound keeps the index a fraction of the gram count. Fully
    hash-checked including the cap: the oracle applies the identical
    document-frequency filter.

    Cost note: gram hashing is md5 (the only hash with identical
    cross-engine semantics for the DuckDB oracle) and dominates the map
    side; a production deployment keeps this exact plan shape and swaps
    md5 for xxhash64 — measured ~1.4x on the fingerprint stage at sf0.1
    (3.5 s -> 2.5 s), zero change to shuffle or pair structure."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    return winnow_candidate_pairs(docs)


# Exact-substring dedup threshold (Lee et al., ACL'22, "Deduplicating
# Training Data Makes Language Models Better"): any normalized-text run
# of >= SUBDUP_K characters that occurs more than once ANYWHERE in the
# corpus (across documents or within one) is a duplicated span to flag.
# Stride-1 k-grams make this exact for runs >= k: a shared run of length
# L >= k contains L - k + 1 aligned k-grams, so every character of the
# run is covered by at least one duplicated gram.
SUBDUP_K = 20


def dup_grams(docs: DataFrame) -> DataFrame:
    """Stage 1 of :func:`dup_substring_spans`: the stride-1 SUBDUP_K-char
    gram index with positions (pure HOF transform + posexplode).

    The gram-ARRAY frame is localCheckpointed before the posexplode:
    whole-stage codegen inlines a Generate's child expression, so
    exploding the LAZY transform would rebuild the ENTIRE per-document
    gram array once per emitted gram — O(|doc|^2) character work per
    document (the round-9 q49c finding, worst here because the fan-out
    is ~|doc| instead of ~52)."""
    normed = widened(
        docs.select("doc_id", normalized("text").alias("norm")).filter(
            F.length("norm") >= SUBDUP_K
        )
    )  # r15: the O(|doc|) gram build below ran on ONE scan partition
    arrays = normed.select(
        "doc_id",
        F.length("norm").cast("bigint").alias("norm_len"),
        F.expr(
            f"transform(sequence(1, length(norm) - {SUBDUP_K} + 1), "
            f"i -> substr(norm, i, {SUBDUP_K}))"
        ).alias("grams"),
    ).localCheckpoint(eager=True)
    return arrays.select(
        "doc_id",
        "norm_len",
        F.posexplode("grams").alias("pos0", "gram"),
    ).select(
        "doc_id",
        "norm_len",
        "gram",
        (F.col("pos0") + 1).cast("bigint").alias("s"),
        (F.col("pos0") + SUBDUP_K).cast("bigint").alias("e"),
    )


def dup_gram_hits(grams: DataFrame) -> DataFrame:
    """Stage 2 of :func:`dup_substring_spans`: duplicated-gram positions
    (one row per duplicated position — the operator's LINEAR "candidate"
    frame, exposed so the scale experiment can count it at multiple SFs)."""
    from pyspark.sql import Window

    occ = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    return (
        grams.withColumn("occ", occ)
        .filter(F.col("occ") >= 2)
        .select("doc_id", "norm_len", "s", "e")
    )


def dup_substring_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, n_dup_spans, dup_chars, norm_len, clean_chars) per
    document containing at least one duplicated >= SUBDUP_K-char
    substring — the q45c core, exposed for the adversarial test.

    Three stages, all linear in corpus characters:
    1. gram index: stride-1 SUBDUP_K-char substrings with positions
       (higher-order transform + posexplode, no Python);
    2. duplicated-gram detection: ONE exchange on the gram value with a
       partition-wide count window (COUNT over PARTITION BY gram, no
       ORDER BY — no frame scan), filtering occ >= 2 in place. The index
       rows carry their positions THROUGH the shuffle, so there is no
       count-then-join-back — the first cut of this operator computed
       the gram index on both sides of a self-semi-join, paying the
       20x substr blowup three times and the exchange twice; this shape
       pays each once (measured ~2x end-to-end at sf0.1). Output is one
       row per duplicated position, never pairs, so a boilerplate gram
       in 10^6 documents contributes 10^6 linear rows, not 10^12 pairs
       (contrast q45b's pair generation, which needs the DF cap for
       exactly that reason);
    3. span assembly: per-document gaps-and-islands over the hit
       positions (one window pass ordered by start) merges overlapping
       or adjacent [s, s+k-1] intervals into maximal duplicated spans.

    At 100 TB the gram exchange is the one skew-sensitive edge (every
    position of a hot gram hashes to one reducer, linearly); AQE handles
    the imbalance, and a production variant pre-salts the count (two-
    phase: count per (gram, salt), sum per gram — q86's pattern) if one
    boilerplate gram dominates a corpus."""
    from pyspark.sql import Window

    hits = dup_gram_hits(dup_grams(docs))
    w = Window.partitionBy("doc_id").orderBy("s")
    prev_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = hits.withColumn(
        "new_island",
        F.when(F.col("s") > F.coalesce(prev_e, F.lit(-1)) + 1, F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("new_island").over(w))
    spans = flagged.groupBy("doc_id", "norm_len", "island").agg(
        F.min("s").alias("ss"), F.max("e").alias("ee")
    )
    return spans.groupBy("doc_id", "norm_len").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("ee") - F.col("ss") + 1).cast("bigint").alias("dup_chars"),
    ).select(
        "doc_id",
        "n_dup_spans",
        "dup_chars",
        "norm_len",
        (F.col("norm_len") - F.col("dup_chars")).alias("clean_chars"),
    )


@register(
    "q45c_dup_substring_spans",
    oracle=f"""
    WITH normed AS (
        SELECT doc_id, {sql_normalized('text')} AS norm FROM documents
    ), pos AS (
        SELECT doc_id, CAST(length(norm) AS BIGINT) AS norm_len, norm,
               unnest(range(1, length(norm) - {SUBDUP_K} + 2)) AS s
        FROM normed WHERE length(norm) >= {SUBDUP_K}
    ), grams AS (
        SELECT doc_id, norm_len, CAST(s AS BIGINT) AS s,
               CAST(s + {SUBDUP_K} - 1 AS BIGINT) AS e,
               substr(norm, CAST(s AS INT), {SUBDUP_K}) AS gram
        FROM pos
    ), dup AS (
        SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
    ), hits AS (
        SELECT doc_id, norm_len, s, e FROM grams JOIN dup USING (gram)
    ), isl AS (
        SELECT doc_id, norm_len, s, e,
               CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) + 1
                    THEN 1 ELSE 0 END AS new_island
        FROM hits
    ), isl2 AS (
        SELECT doc_id, norm_len, s, e,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s) AS island
        FROM isl
    ), spans AS (
        SELECT doc_id, norm_len, island, MIN(s) AS ss, MAX(e) AS ee
        FROM isl2 GROUP BY doc_id, norm_len, island
    )
    SELECT doc_id,
           COUNT(*) AS n_dup_spans,
           CAST(SUM(ee - ss + 1) AS BIGINT) AS dup_chars,
           norm_len,
           norm_len - CAST(SUM(ee - ss + 1) AS BIGINT) AS clean_chars
    FROM spans GROUP BY doc_id, norm_len
    """,
    tags=("text", "dedup", "substring"),
)
def q45c_dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring span detection (Lee et al., ACL'22):
    flag every maximal region of a document covered by a >= {SUBDUP_K}
    normalized-char substring that occurs more than once in the corpus —
    the "remove the duplicated bytes, keep the rest of the document"
    dedup mode, complementing q45 (whole-doc exact), q45b (winnowed
    passage pairs), and q47 (MinHash near-dup): those decide which
    DOCUMENTS to drop; this decides which BYTES.

    Lee et al. build a corpus suffix array; the Spark-native equivalent
    is a stride-1 k-gram index, identical in output for runs >= k and
    O(corpus chars) in both index size and work — see
    :func:`dup_substring_spans` for the three-stage shape and the 100 TB
    skew note. Output is all-integer (span counts, char counts), so the
    hash check is exact with no floating-point canonicalization."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    return dup_substring_spans(docs)


@register(
    "q46_lang_profile",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {sql_davg('n_chars')} AS avg_chars,
           CAST(SUM(CASE WHEN len({sql_tokens('text')}) >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_long_docs
    FROM documents
    GROUP BY lang, source
    """,
    tags=("text", "profile"),
)
def q46_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition profile by (lang, source) — the mix report that
    drives sampling weights for training-data assembly."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        davg("n_chars").alias("avg_chars"),
        F.sum(F.when(F.size(tokens("text")) >= 30, 1).otherwise(0)).alias("n_long_docs"),
    )


@register(
    "q53_tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ), tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ), df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ), total AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token, tf.tf, df.df,
               tf.tf * (CAST(total.n AS DOUBLE) / (1.0 + df.df)) AS score
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN total
        WHERE tf.doc_id < 30
    )
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           score, CAST(rn AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, token) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
    tags=("text", "tfidf"),
)
def q53_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style term salience: term frequency × rational inverse
    document frequency N/(1+df) — rational rather than log-scaled so the
    score is cross-engine exact (ln is not correctly-rounded-portable).
    Top-3 terms per document over a doc_id slice.

    Scale notes: tf is a (doc, token) hash agg; df is a token-level agg
    small enough to broadcast (vocabulary ≪ corpus); the rank window
    partitions by doc_id — no skew since docs are bounded."""
    prep(spark)
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    # tf only matters for the selected doc slice — filter at the source
    # so the parquet scan on this branch prunes (df_ still scans all
    # docs, as it must: document frequency is a corpus-wide statistic)
    tf = (
        docs.filter(F.col("doc_id") < 30)
        .select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * (F.col("n").cast("double") / (F.lit(1.0) + F.col("df"))),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tf", "df", "score", "rank")
    )


# PII patterns for the scrubbing operator — mirrors the data classes the
# reference protects with encryption (SSN/name/DOB, write_encrypted_parquet
# .py:75-79); scrubbing is the complementary control for free text.
SSN_PATTERN = r"\d{3}-\d{2}-\d{4}"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


@register(
    "q56_pii_scrub",
    oracle=f"""
    WITH synth AS (
        SELECT c_custkey,
               concat('Contact ', c_name, ' at user', CAST(c_custkey AS VARCHAR),
                      '@example.com or SSN ',
                      lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0'), '-',
                      lpad(CAST(c_custkey % 90 + 10 AS VARCHAR), 2, '0'), '-',
                      lpad(CAST(c_custkey % 9000 + 1000 AS VARCHAR), 4, '0'))
                   AS raw_text
        FROM customer
    )
    SELECT c_custkey,
           regexp_replace(regexp_replace(raw_text, '{SSN_PATTERN}', '[SSN]', 'g'),
                          '{EMAIL_PATTERN}', '[EMAIL]', 'g') AS scrubbed,
           CAST(length(regexp_replace(raw_text, '{SSN_PATTERN}', '', 'g'))
                < length(raw_text) AS INT) AS had_ssn,
           CAST(length(regexp_replace(raw_text, '{EMAIL_PATTERN}', '', 'g'))
                < length(raw_text) AS INT) AS had_email
    FROM synth
    """,
    tags=("text", "pii", "scrub"),
)
def q56_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over free text: regex redaction of SSN/email patterns
    plus per-row detection flags — the text-pipeline complement to the
    column-level encryption the reference applies to structured PII. The
    PII-bearing text is synthesized deterministically from customer rows
    (the corpus itself contains none)."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    raw = F.concat(
        F.lit("Contact "), F.col("c_name"),
        F.lit(" at user"), F.col("c_custkey").cast("string"), F.lit("@example.com or SSN "),
        F.lpad((F.col("c_custkey") % 900 + 100).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((F.col("c_custkey") % 90 + 10).cast("string"), 2, "0"), F.lit("-"),
        F.lpad((F.col("c_custkey") % 9000 + 1000).cast("string"), 4, "0"),
    )
    synth = cust.select("c_custkey", raw.alias("raw_text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("raw_text"), SSN_PATTERN, "[SSN]"),
        EMAIL_PATTERN,
        "[EMAIL]",
    )
    had_ssn = (
        F.length(F.regexp_replace(F.col("raw_text"), SSN_PATTERN, ""))
        < F.length(F.col("raw_text"))
    ).cast("int")
    had_email = (
        F.length(F.regexp_replace(F.col("raw_text"), EMAIL_PATTERN, ""))
        < F.length(F.col("raw_text"))
    ).cast("int")
    return synth.select(
        "c_custkey",
        scrubbed.alias("scrubbed"),
        had_ssn.alias("had_ssn"),
        had_email.alias("had_email"),
    )


MIN_DOC_FREQ = 100  # vocabulary cut: term must appear in >= this many docs


@register(
    "q73_term_doc_freq",
    oracle=f"""
    SELECT term,
           COUNT(*) AS occurrences,
           COUNT(DISTINCT doc_id) AS doc_freq,
           COUNT(DISTINCT lang) AS n_langs
    FROM (
        SELECT doc_id, lang,
               unnest({sql_tokens('text')}) AS term
        FROM documents
    )
    GROUP BY term
    HAVING COUNT(DISTINCT doc_id) >= {MIN_DOC_FREQ}
    """,
    tags=("text", "lateral", "explode"),
)
def q73_term_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary extraction via lateral explode (LATERAL VIEW/UNNEST
    semantics): token stream → per-term occurrence and document frequency
    with a HAVING cut. Scale design: explode is pipelined inside codegen (no
    shuffle), the groupBy shuffles on term with map-side partial aggregation;
    count(DISTINCT doc_id) expands to a two-phase aggregate that Spark plans
    without a second shuffle of the raw token stream."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("term")
    )
    return (
        exploded.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .filter(F.col("doc_freq") >= MIN_DOC_FREQ)
    )


POSTING_MIN_DF = 80  # index only terms appearing in >= this many docs


@register(
    "q98_inverted_index",
    oracle=f"""
    WITH tokenized AS (
        SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    ), postings AS (
        SELECT doc_id, i - 1 AS pos, toks[i] AS term
        FROM tokenized, unnest(range(1, len(toks) + 1)) AS t(i)
    )
    SELECT term,
           COUNT(*) AS n_postings,
           COUNT(DISTINCT doc_id) AS doc_freq,
           array_to_string(
               list_sort(list(doc_id || ':' || pos)), ','
           ) AS posting_list
    FROM postings
    GROUP BY term
    HAVING COUNT(DISTINCT doc_id) >= {POSTING_MIN_DF}
    """,
    tags=("text", "index", "posexplode"),
)
def q98_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction (term → positional posting list) via
    posexplode — the search-infrastructure build step. The posting list is
    canonicalized to a lexicographically sorted string (collect_list order
    is partition-dependent; the sort makes it comparable, same rule as
    q71). Scale: one shuffle on term; the df cut bounds posting-list width,
    and a real deployment would range-partition terms and write the lists
    as the sorted layout from operators/storage.py."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "term")
    )
    entry = F.concat_ws(":", F.col("doc_id"), F.col("pos"))
    return (
        postings.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_postings"),
            F.countDistinct("doc_id").alias("doc_freq"),
            F.concat_ws(",", F.sort_array(F.collect_list(entry))).alias("posting_list"),
        )
        .filter(F.col("doc_freq") >= POSTING_MIN_DF)
    )


CTX_TOKENS = 2048  # context-window budget for packing


@register(
    "q63_document_packing",
    oracle=f"""
    WITH counted AS (
        SELECT doc_id, lang,
               CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
        FROM documents
    ), placed AS (
        SELECT doc_id, lang, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS tokens_before
        FROM counted
    )
    SELECT lang,
           CAST(floor(tokens_before / {CTX_TOKENS}.0) AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / {CTX_TOKENS}.0 AS fill_ratio
    FROM placed
    GROUP BY lang, pack_id
    """,
    tags=("text", "packing", "window"),
)
def q63_document_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window document packing (sequence assembly for pretraining):
    documents stream per language in stable doc_id order and a running
    token total assigns each to a ~{CTX_TOKENS}-token pack — the streaming
    approximation of bin packing (no lookahead, one window pass, exact
    integer arithmetic). Scale: one window shuffle on lang; a production
    packer adds a salt-within-lang partition key so a single language
    doesn't serialize, at the cost of cross-salt fragmentation."""
    prep(spark)
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id", "lang", F.size(tokens("text")).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = counted.withColumn(
        "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        placed.groupBy(
            "lang",
            F.floor(F.col("tokens_before") / float(CTX_TOKENS)).alias("pack_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            (F.sum("n_tokens").cast("double") / float(CTX_TOKENS)).alias("fill_ratio"),
        )
    )


# -- fastText-style hashed linear quality classifier -----------------------

# Two-class linear model over hashed word uni+bigram features. Weights are
# DERIVED from the feature hash itself (md5 with a per-class salt, mapped to
# [-1000, 1000]) — a deterministic stand-in for trained parameters with the
# exact serving shape: production swaps the weight expression for a
# broadcast-joined weight table without touching the plan.
CLF_WEIGHT_RANGE = 2001  # odd => symmetric [-1000, 1000]


def _clf_weight(feat: Column, salt: str) -> Column:
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), feat)), 1, 15), 16, 10).cast(
        "bigint"
    )
    return h % CLF_WEIGHT_RANGE - F.lit((CLF_WEIGHT_RANGE - 1) // 2)


def _sql_clf_weight(expr: str, salt: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5('{salt}' || {expr}), 1, 15)) AS BIGINT) "
        f"% {CLF_WEIGHT_RANGE} - {(CLF_WEIGHT_RANGE - 1) // 2}"
    )


@register(
    "q43e_quality_classifier",
    oracle=f"""
    WITH toks0 AS (
        SELECT doc_id, lang,
               list_filter({sql_tokens('text')}, x -> x <> '') AS t
        FROM documents
    ), toks AS (
        SELECT * FROM toks0 WHERE len(t) >= 1
    ), feats AS (
        SELECT doc_id, lang,
               t || CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                    ELSE [] END AS f
        FROM toks
    )
    SELECT doc_id, lang,
           CAST(len(f) AS BIGINT) AS n_features,
           CAST(list_sum(list_transform(f, x -> {_sql_clf_weight('x', 'q|')}))
                AS BIGINT) AS pos_score,
           CAST(list_sum(list_transform(f, x -> {_sql_clf_weight('x', 's|')}))
                AS BIGINT) AS neg_score,
           (list_sum(list_transform(f, x -> {_sql_clf_weight('x', 'q|')}))
            >= list_sum(list_transform(f, x -> {_sql_clf_weight('x', 's|')})))
               AS keep
    FROM feats
    """,
    tags=("curation", "quality", "classifier"),
)
def q43e_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering, the DCLM/fastText recipe (Li et al.
    2024 §4.1; Joulin et al. 2017): a linear classifier over hashed word
    uni+bigram features scores every document, and the keep decision
    compares the quality-class score against the spam-class score. The
    reference has no text surface — LLM-pipeline expansion per SURVEY §2B.

    The model here is weight-by-hash (deterministic, so the whole inference
    pass is hash-checked cross-engine); the SERVING shape is the real
    deliverable and survives a trained model unchanged: per-doc feature
    extraction is a map-side array expression, scoring is a fold over the
    feature array — zero exchanges, no Python, no weight table shuffle. A
    trained fastText model at 100 TB broadcasts its (bucket → weight)
    table (a few MB for 2^20 buckets) and the fold becomes a lookup —
    same single-pass, still shuffle-free.

    Integer engineering: weights live in [-1000, 1000] (md5-derived), a
    1e5-word doc bounds |score| < 2·10^8 — BIGINT-exact everywhere; the
    keep decision is an integer comparison, no float anywhere."""
    prep(spark)
    t = F.filter(tokens("text"), lambda x: x != "")
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", t.alias("t"))
        .filter(F.size("t") >= 1)
    )
    k = F.size("t")
    bigrams = F.when(
        k >= 2,
        F.transform(
            F.sequence(F.lit(1), k - 1),
            lambda i: F.concat_ws(" ", F.element_at("t", i), F.element_at("t", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = docs.select(
        "doc_id", "lang", F.concat(F.col("t"), bigrams).alias("f")
    )

    def score(salt: str) -> Column:
        return F.aggregate(
            F.col("f"),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + _clf_weight(x, salt),
        )

    return feats.select(
        "doc_id",
        "lang",
        F.size("f").cast("bigint").alias("n_features"),
        score("q|").alias("pos_score"),
        score("s|").alias("neg_score"),
    ).select("*", (F.col("pos_score") >= F.col("neg_score")).alias("keep"))


# -- BPE merge training -----------------------------------------------------

BPE_MERGES = 6  # learned merge rules per training run (demo depth)


def _bpe_oracle(m: int) -> str:
    """Unrolled m-iteration BPE trainer as chained CTEs (the q57b/q43d
    pattern: iterative fixpoints become CTE chains so DuckDB replays the
    EXACT algorithm). Symbol sequences are '|'-wrapped ('|a||b||c|') so a
    literal replace('|a||b|' -> '|ab|') applies one merge rule greedily
    left-to-right without cross-symbol false matches — semantics probed
    identical in Spark and DuckDB."""
    ctes = [
        f"""words AS (
        SELECT x AS word, COUNT(*) AS freq
        FROM (SELECT unnest(list_filter({sql_tokens('text')}, x -> x <> '')) AS x
              FROM documents)
        WHERE NOT contains(x, '|')
        GROUP BY x
    ), v0 AS (
        SELECT word, freq, regexp_replace(word, '(.)', '|\\1|', 'g') AS s
        FROM words
    )"""
    ]
    for i in range(1, m + 1):
        ctes.append(f"""p{i} AS (
        SELECT pair, SUM(freq) AS c FROM (
            SELECT freq, unnest(
                CASE WHEN len(y) >= 2
                     THEN list_transform(range(1, len(y)), j -> y[j] || ' ' || y[j+1])
                     ELSE [] END) AS pair
            FROM (SELECT freq, string_split(trim(s, '|'), '||') AS y FROM v{i - 1})
        ) GROUP BY pair
    ), b{i} AS (
        SELECT pair, c FROM p{i} ORDER BY c DESC, pair ASC LIMIT 1
    ), v{i} AS (
        SELECT word, freq,
               replace(s,
                       '|' || replace((SELECT pair FROM b{i}), ' ', '||') || '|',
                       '|' || replace((SELECT pair FROM b{i}), ' ', '') || '|') AS s
        FROM v{i - 1}
    )""")
    finals = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, pair, "
        f"replace(pair, ' ', '') AS merged, CAST(c AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, m + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + finals


@register(
    "q42c_bpe_merge_train",
    oracle=_bpe_oracle(BPE_MERGES),
    tags=("text", "tokenizer", "iterative"),
)
def q42c_bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016 §3.2): learn the top
    merge rules from the corpus — count adjacent symbol pairs over the
    word-type vocabulary (frequency-weighted), merge the argmax pair
    (count DESC, pair ASC tie-break) in every word, repeat. This is the
    genuinely iterative data-dependent step q42b's fixed BPE-ish regex
    only mimics; together they cover tokenizer train + apply.

    Spark shape per iteration: pair explode → one tiny aggregate (pairs
    are bounded by total chars over word TYPES, not corpus size — the
    classic vocab-based formulation) → 1-row argmax collect → the merge
    applies map-side as a literal string replace. Training cost scales
    with |vocab|, not the 100 TB corpus: the one corpus-sized pass is the
    initial word count; every merge iteration touches only word types
    (~10^7 at web scale, a few MB of driver traffic per rule). Production
    BPE learns ~32k merges with pair-delta bookkeeping instead of a full
    recount; {BPE_MERGES} full-recount rounds pin the semantics the
    incremental algorithm must preserve. The oracle replays all
    iterations as an unrolled CTE chain, so every learned rule, its
    count, and every tie-break is hash-checked; the pure-Python trainer
    equality test is independent of both engines."""
    prep(spark)
    t = F.filter(tokens("text"), lambda x: x != "")
    vocab = (
        load(spark, sf_dir, "documents")
        .select(F.explode(t).alias("word"))
        .filter(~F.col("word").contains("|"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            "freq",
            F.regexp_replace(F.col("word"), "(.)", r"|$1|").alias("s"),
        )
        .localCheckpoint(eager=True)  # truncate lineage across iterations
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, BPE_MERGES + 1):
        y = F.split(F.expr("btrim(s, '|')"), r"\|\|")
        pairs = F.when(
            F.size(y) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(y) - 1),
                lambda j: F.concat_ws(
                    " ", F.element_at(y, j), F.element_at(y, j + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        top = (
            vocab.select(F.col("freq"), F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("pair").asc())
            .first()
        )
        a, b = top.pair.split(" ")
        merges.append((rank, top.pair, a + b, int(top.c)))
        vocab = vocab.withColumn(
            "s",
            F.replace(
                F.col("s"), F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|")
            ),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank bigint, pair string, merged string, pair_count bigint"
    )


# Count-min sketch shape: depth x width counter grid. 4 x 512 keeps the
# whole sketch at 2048 cells (~16 KiB of BIGINTs) regardless of corpus
# size — the point of the structure at 100 TB.
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOPK = 20

_SQL_CMS_BUCKET_TC = sql_hash60("CAST(t.d AS VARCHAR) || ':' || tc.tok") + f" % {CMS_WIDTH}"
_SQL_CMS_BUCKET_P = sql_hash60("CAST(t.d AS VARCHAR) || ':' || p.tok") + f" % {CMS_WIDTH}"


@register(
    "q88c_heavy_hitters_cms",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ), tc AS (
        SELECT tok, COUNT(*) AS cnt FROM toks WHERE tok <> '' GROUP BY tok
    ), cells AS (
        SELECT t.d AS d, {_SQL_CMS_BUCKET_TC} AS bucket, SUM(tc.cnt) AS cell_cnt
        FROM tc CROSS JOIN range({CMS_DEPTH}) t(d)
        GROUP BY 1, 2
    ), probe AS (
        SELECT tok, cnt FROM tc ORDER BY cnt DESC, tok LIMIT {CMS_TOPK}
    )
    SELECT p.tok,
           CAST(p.cnt AS BIGINT) AS exact_cnt,
           CAST(MIN(c.cell_cnt) AS BIGINT) AS cms_est,
           CAST(MIN(c.cell_cnt) - p.cnt AS BIGINT) AS overcount
    FROM probe p
    CROSS JOIN range({CMS_DEPTH}) t(d)
    JOIN cells c ON c.d = t.d AND c.bucket = {_SQL_CMS_BUCKET_P}
    GROUP BY p.tok, p.cnt
    ORDER BY exact_cnt DESC, tok
    """,
    tags=("text", "sketch", "cms", "heavy-hitters"),
)
def q88c_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters over the corpus token stream
    (Cormode & Muthukrishnan 2005): the bounded-memory frequency structure
    a 100 TB vocabulary census uses when the exact token->count map no
    longer fits anywhere.

    Unlike the engine-specific HLL (q28) and GK (q87) sketches, CMS is
    DETERMINISTIC given its hash family — built here on the portable
    md5-based ``hash60`` both engines compute bit-identically — so the
    whole sketch, not just its shape, is hash-checked against the DuckDB
    oracle. Output: the top-{CMS_TOPK} exact heavy hitters with their CMS
    estimates and the (always >= 0) overcount.

    Scale shape: one token-count pass (map-side combinable hash agg) feeds
    both branches; the sketch build folds per-token partial counts into
    {CMS_DEPTH} x {CMS_WIDTH} cells — the explode is over DISTINCT tokens
    (vocabulary-sized), never the raw token stream, exactly how a combiner
    -based CMS build distributes. The 2048-cell sketch is broadcast to the
    {CMS_TOPK}-row probe join; nothing after the first shuffle depends on
    corpus size. The exact top-k branch (TakeOrderedAndProject) exists to
    price the sketch's error in the output; a production pipeline ships
    only the cells."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # Both the sketch build and the probe branch consume tc; without
        # materialization each would re-tokenize the whole corpus (the
        # planner does not reuse the exchange across the differing branch
        # subtrees). Vocabulary is corpus-sublinear — checkpointing it is
        # the one-pass shape the sketch exists for.
        .localCheckpoint(eager=False)
    )
    probe = tc.orderBy(F.col("cnt").desc(), F.col("tok")).limit(CMS_TOPK)
    est = cms_estimate(probe, cms_sketch(tc))
    return (
        est.select(
            "tok",
            F.col("cnt").alias("exact_cnt"),
            "cms_est",
            (F.col("cms_est") - F.col("cnt")).alias("overcount"),
        ).orderBy(F.col("exact_cnt").desc(), F.col("tok"))
    )


def _cms_depths(depth: int) -> Column:
    return F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d")


def _cms_bucket(width: int) -> Column:
    return (
        hash60(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("tok"))) % width
    ).alias("bucket")


def cms_sketch(tc: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Fold (tok, cnt) partial counts into a depth x width count-min grid.

    The explode is over distinct tokens (vocabulary-sized), not the raw
    stream — the combiner-based build. Output is at most depth*width rows
    regardless of input size."""
    return (
        tc.select("tok", "cnt", _cms_depths(depth))
        .select("cnt", "d", _cms_bucket(width))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cell_cnt"))
    )


def cms_estimate(
    probe: DataFrame, cells: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Point-query the sketch: min over the depth cells each probed token
    hashes to. ``cells`` is tiny by construction — broadcast it."""
    probed = probe.select("tok", "cnt", _cms_depths(depth)).select(
        "tok", "cnt", "d", _cms_bucket(width)
    )
    return (
        probed.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("tok", "cnt")
        .agg(F.min("cell_cnt").alias("cms_est"))
    )


# PMI collocation mining: minimum pair frequency (kills hapax noise) and
# the fixed-point scale for the rational PMI core.
PMI_MIN_PAIR = 5
PMI_SCALE = 1_000_000_000_000  # 1e12
PMI_TOPK = 50


@register(
    "q42d_word_cooccurrence_pmi",
    oracle=f"""
    WITH docs_t AS (
        SELECT list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
        FROM documents
    ), uni AS (
        SELECT w, COUNT(*) AS cnt FROM (SELECT unnest(t) AS w FROM docs_t) GROUP BY w
    ), bi AS (
        SELECT p['w1'] AS w1, p['w2'] AS w2, COUNT(*) AS pair_cnt FROM (
            SELECT unnest(list_transform(range(1, len(t)),
                                         i -> {{'w1': t[i], 'w2': t[i + 1]}})) AS p
            FROM docs_t WHERE len(t) >= 2
        ) GROUP BY 1, 2
    )
    SELECT b.w1, b.w2,
           CAST(b.pair_cnt AS BIGINT) AS pair_cnt,
           CAST(u1.cnt AS BIGINT) AS cnt_w1,
           CAST(u2.cnt AS BIGINT) AS cnt_w2,
           CAST((b.pair_cnt * {PMI_SCALE}) // (u1.cnt * u2.cnt) AS BIGINT) AS pmi_fixed
    FROM bi b
    JOIN uni u1 ON u1.w = b.w1
    JOIN uni u2 ON u2.w = b.w2
    WHERE b.pair_cnt >= {PMI_MIN_PAIR}
    ORDER BY pmi_fixed DESC, w1, w2
    LIMIT {PMI_TOPK}
    """,
    tags=("text", "collocations", "pmi"),
)
def q42d_word_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: the top-{PMI_TOPK}
    adjacent word pairs whose co-occurrence most exceeds independence —
    the standard phrase/multiword-expression detector a tokenizer- or
    glossary-building pass runs over a corpus.

    Determinism engineering: for a fixed corpus size N, PMI ordering is
    the ordering of the RATIONAL p(ab)/(p(a)p(b)) = N*c_ab/(c_a*c_b), so
    the log never needs to be computed — the score is the exact integer
    (c_ab * 1e12) div (c_a * c_b), identical in both engines (production
    swaps in log-space doubles when c_ab*scale could overflow BIGINT; at
    that point ranking no longer needs cross-engine exactness).

    Scale shape: one bigram hash-agg + one unigram hash-agg (both
    map-side combinable, vocabulary-sized outputs), two equi-joins on the
    word key (AQE picks broadcast when the unigram side is small; at web
    scale they are plain shuffle hash joins on a well-distributed key),
    then TakeOrderedAndProject for the top-k — nothing downstream of the
    aggregations depends on corpus size."""
    prep(spark)
    return pmi_collocations(load(spark, sf_dir, "documents"))


def pmi_collocations(docs: DataFrame) -> DataFrame:
    """The q42d core over any frame with a ``text`` column (factored out
    so tests can drive engineered corpora through the same plan)."""
    toked = docs.select(
        F.filter(tokens("text"), lambda x: x != "").alias("t")
    )
    uni = (
        toked.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    t = F.col("t")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.struct(
            F.element_at(t, i).alias("w1"), F.element_at(t, i + 1).alias("w2")
        ),
    )
    bi = (
        toked.filter(F.size(t) >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= PMI_MIN_PAIR)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cnt").alias("cnt_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cnt").alias("cnt_w2"))
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            "pair_cnt",
            "cnt_w1",
            "cnt_w2",
            F.expr(
                f"pair_cnt * CAST({PMI_SCALE} AS BIGINT) div (cnt_w1 * cnt_w2)"
            ).alias("pmi_fixed"),
        )
        .orderBy(F.col("pmi_fixed").desc(), "w1", "w2")
        .limit(PMI_TOPK)
    )


@register(
    "q43f_pareto_frontier",
    oracle="""
    WITH feat AS (
        SELECT doc_id, lang, n_chars AS x,
               CAST(len(list_distinct(list_filter(
                   string_split_regex(trim(text), '\\s+'), w -> w <> '')))
                 AS BIGINT) AS y
        FROM documents
    )
    SELECT f.lang, f.doc_id, CAST(f.x AS BIGINT) AS x, f.y
    FROM feat f
    WHERE NOT EXISTS (
        SELECT 1 FROM feat g
        WHERE g.lang = f.lang AND g.x >= f.x AND g.y >= f.y
          AND (g.x > f.x OR g.y > f.y)
    )
    ORDER BY lang, doc_id
    """,
    tags=("curation", "skyline", "window"),
)
def q43f_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Pareto frontier (skyline) of documents on
    (length, lexical richness): the multi-criteria curation primitive —
    "keep documents no other document beats on every axis" — used when
    quality signals should not be collapsed into one weighted score.

    The ORACLE is the quadratic spec (NOT EXISTS a dominating row); the
    ENGINE is the O(n log n) sort-based skyline: order each language by
    x descending, then a document is on the frontier iff (a) its y
    strictly exceeds the running max of y over all STRICTLY longer
    documents (a value-based range frame, so equal-x rows never see each
    other) and (b) no same-x document has strictly higher y. The hash
    match proves the linear-pass window algorithm equivalent to the
    quadratic definition — the same shape as q57c's oriented triangle
    count vs its naive oracle.

    Scale shape: one sort per language (Spark range-partitions the sort;
    no self-join, no explode); the frontier of web-corpus features is
    tiny relative to n, but the plan cost is the sort either way —
    against the oracle's O(n^2) semantics that is the difference between
    feasible and not at 100 TB."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    feat = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(
            F.array_distinct(F.filter(tokens("text"), lambda w: w != ""))
        ).cast("bigint").alias("y"),
    )
    w_longer = (
        Window.partitionBy("lang")
        .orderBy(F.desc("x"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same_x = Window.partitionBy("lang", "x")
    return (
        feat.withColumn("best_y_longer", F.max("y").over(w_longer))
        .withColumn("best_y_same_x", F.max("y").over(w_same_x))
        .filter(
            (F.col("best_y_longer").isNull() | (F.col("best_y_longer") < F.col("y")))
            & (F.col("best_y_same_x") <= F.col("y"))
        )
        .select("lang", "doc_id", "x", "y")
        .orderBy("lang", "doc_id")
    )


# ---------------------------------------------------------------------------
# Hashed bigram-LM familiarity scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------

#: hashed LM vocabulary: bigram/unigram identities are hashed into a FIXED
#: bucket space (CCNet's trick), so the model table is bounded by 2^18 rows
#: at ANY corpus size — which is what makes the scoring join broadcastable
#: at 100 TB. Collisions are deterministic and identical cross-engine.
LM_BUCKETS = 1 << 18
LM_SCALE = 1_000_000

#: model/eval split: same md5-on-doc_id device as the contamination check
#: ('0'..'b' = 12/16 of docs train the LM; the rest are scored). Stands in
#: for CCNet's external reference corpus (they train on Wikipedia).
_LM_TRAIN_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'"


def _bigram_lm_oracle() -> str:
    bigram_expr = "toks[i] || ' ' || toks[i+1]"
    b1 = f"({sql_hash60('toks[i]')} % {LM_BUCKETS})"
    b2 = f"({sql_hash60(bigram_expr)} % {LM_BUCKETS})"
    return f"""
    WITH tokd AS (
        SELECT doc_id, lang, {_LM_TRAIN_SQL} AS is_train,
               {sql_tokens(sql_normalized('text'))} AS toks
        FROM documents
    ), idx AS (
        SELECT doc_id, lang, is_train, toks,
               unnest(range(1, len(toks))) AS i
        FROM tokd
    ), big AS (
        SELECT doc_id, lang, is_train, {b1} AS b1, {b2} AS b2 FROM idx
    ), c2 AS (
        SELECT b1, b2, COUNT(*) AS n2 FROM big WHERE is_train GROUP BY 1, 2
    ), c1 AS (
        SELECT b1, CAST(SUM(n2) AS BIGINT) AS n1 FROM c2 GROUP BY 1
    ), model AS (
        SELECT c2.b1, c2.b2, c2.n2, c1.n1 FROM c2 JOIN c1 ON c1.b1 = c2.b1
    ), scored AS (
        SELECT g.doc_id, g.lang,
               COUNT(*) AS n_bigrams,
               CAST(SUM(COALESCE(({LM_SCALE} * m.n2) // m.n1, 0)) AS BIGINT) AS sum_fp
        FROM big g
        LEFT JOIN model m ON g.b1 = m.b1 AND g.b2 = m.b2
        WHERE NOT g.is_train
        GROUP BY 1, 2
    )
    SELECT doc_id, lang, n_bigrams, sum_fp // n_bigrams AS score_fp
    FROM scored
    ORDER BY score_fp DESC, doc_id
    LIMIT 50
    """


@register(
    "q46b_bigram_lm_score",
    oracle=_bigram_lm_oracle(),
    tags=("text", "quality", "lm", "ccnet"),
)
def q46b_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM familiarity scoring: a hashed bigram language model
    is trained on the md5-split TRAIN slice (standing in for CCNet's
    Wikipedia reference corpus), then every EVAL document is scored by
    its average next-token likelihood — top 50 most-familiar documents.

    Determinism engineering: no logs and no floats anywhere. The per-
    bigram likelihood is the exact fixed-point rational
    ``(LM_SCALE * count(w1,w2)) DIV count(w1-as-left)`` with unseen
    bigrams backing off to 0, summed and averaged in BIGINT — identical
    in both engines (Spark ``DIV`` == DuckDB ``//`` on nonnegative
    ints). Dropping the log keeps this an arithmetic rather than
    geometric mean — a familiarity score, not perplexity proper; the
    ranking signal (formulaic text up, noise down) is the same and the
    ordering is reproducible bit-for-bit, which a libm `ln` is not.

    Scale shape: tokenize+hash is pure map work; the model is TWO tiny
    aggregates over the hashed bucket space — AT MOST ``LM_BUCKETS``
    (2^18) rows no matter how big the corpus — so the scoring join
    BROADCASTS the model and the per-doc aggregate is the only shuffle
    that scales with data. Zipf-hot bigrams are a non-issue under a
    broadcast join (no shuffle key to skew). Top-50 is
    TakeOrderedAndProject with a doc_id tiebreak."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    is_train = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "b"
    tokd = docs.select(
        "doc_id", "lang", is_train.alias("is_train"),
        tokens(normalized("text")).alias("toks"),
    )
    k = F.size("toks")
    idx = tokd.select(
        "doc_id", "lang", "is_train", "toks",
        F.explode(
            F.when(k >= 2, F.sequence(F.lit(1), k - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("i"),
    )
    w1 = F.element_at("toks", F.col("i"))
    w2 = F.element_at("toks", F.col("i") + 1)
    big = idx.select(
        "doc_id", "lang", "is_train",
        (hash60(w1) % LM_BUCKETS).alias("b1"),
        (hash60(F.concat_ws(" ", w1, w2)) % LM_BUCKETS).alias("b2"),
    )
    c2 = big.filter("is_train").groupBy("b1", "b2").agg(
        F.count(F.lit(1)).alias("n2")
    )
    c1 = c2.groupBy("b1").agg(F.sum("n2").cast("bigint").alias("n1"))
    model = F.broadcast(c2.join(c1, "b1"))
    scored = (
        big.filter(~F.col("is_train"))
        .join(model, ["b1", "b2"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.coalesce(F.expr(f"({LM_SCALE} * n2) DIV n1"), F.lit(0))
            ).cast("bigint").alias("sum_fp"),
        )
    )
    return (
        scored.select(
            "doc_id", "lang", "n_bigrams",
            F.expr("sum_fp DIV n_bigrams").alias("score_fp"),
        )
        .orderBy(F.desc("score_fp"), "doc_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Phrase search over the positional index
# ---------------------------------------------------------------------------
# Fixed query workload: exact 3-word phrases, chosen to occur at every
# shipped scale factor so the result is non-trivial wherever the driver
# checks it.
PHRASE_QUERIES: tuple[str, ...] = (
    "row column sort",
    "customer part join",
    "part filter scan",
)


def _phrase_oracle() -> str:
    values = ", ".join(
        "('{0}', '{1}', '{2}', '{3}')".format(p, *p.split()) for p in PHRASE_QUERIES
    )
    return f"""
    WITH tokenized AS (
        SELECT doc_id, {sql_tokens("text")} AS toks FROM documents
    ), postings AS (
        SELECT doc_id, i - 1 AS pos, toks[i] AS term
        FROM tokenized, unnest(range(1, len(toks) + 1)) AS t(i)
    ), phrases AS (
        SELECT * FROM (VALUES {values}) v(phrase, w1, w2, w3)
    ), hits AS (
        SELECT ph.phrase, p1.doc_id, p1.pos
        FROM phrases ph
        JOIN postings p1 ON p1.term = ph.w1
        JOIN postings p2 ON p2.doc_id = p1.doc_id
                        AND p2.pos = p1.pos + 1 AND p2.term = ph.w2
        JOIN postings p3 ON p3.doc_id = p1.doc_id
                        AND p3.pos = p1.pos + 2 AND p3.term = ph.w3
    )
    SELECT phrase, doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(pos) AS BIGINT) AS first_pos
    FROM hits GROUP BY phrase, doc_id
    """


@register(
    "q98b_phrase_search",
    oracle=_phrase_oracle(),
    tags=("text", "index", "phrase-search"),
)
def q98b_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over the positional inverted index (the query
    side of q98's index build): for each query phrase, postings of its
    words are joined on (doc_id, adjacent positions) — the classic
    positional-index intersection (Manning et al., IR book §2.4) — and
    matches are aggregated per document.

    Scale notes (100 TB): the posting scan is filtered to the query's
    terms FIRST (posting-list fetch — the index serves exactly this), so
    join input is proportional to the queried terms' document frequency,
    not the corpus; the adjacency joins share one (doc_id) shuffle after
    the term cut, and the tiny phrase table is a broadcast. Rare-term-
    first intersection order (the IR-classic optimization) falls out of
    joining the LEADING word's postings down the chain."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    words = sorted({w for p in PHRASE_QUERIES for w in p.split()})
    postings = (
        docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "term"))
        .filter(F.col("term").isin(words))
    )
    phrases = spark.createDataFrame(
        [(p, *p.split()) for p in PHRASE_QUERIES],
        "phrase string, w1 string, w2 string, w3 string",
    )
    p1 = postings.join(
        F.broadcast(phrases), F.col("term") == F.col("w1")
    ).select("phrase", "doc_id", "pos", "w2", "w3")
    p2 = postings.select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("pos2"), F.col("term").alias("t2")
    )
    p3 = postings.select(
        F.col("doc_id").alias("d3"), F.col("pos").alias("pos3"), F.col("term").alias("t3")
    )
    hits = (
        p1.join(
            p2,
            (F.col("d2") == F.col("doc_id"))
            & (F.col("pos2") == F.col("pos") + 1)
            & (F.col("t2") == F.col("w2")),
        )
        .join(
            p3,
            (F.col("d3") == F.col("doc_id"))
            & (F.col("pos3") == F.col("pos") + 2)
            & (F.col("t3") == F.col("w3")),
        )
        .select("phrase", "doc_id", "pos")
    )
    return hits.groupBy("phrase", "doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("pos").cast("bigint").alias("first_pos"),
    )


# ---------------------------------------------------------------------------
# Cross-corpus chunk-level exact dedup (q43g)
# ---------------------------------------------------------------------------
DEDUP_CHUNK_TOKENS = 16  # disjoint windows: removal is unambiguous
# (doc_id, chunk_index) packed into one BIGINT so "first occurrence" is a
# plain integer MIN — associative and map-side combinable. Bits: 20 for
# the chunk index (docs up to ~1M chunks), the rest for doc_id (safe to
# 2^43 docs).
_CHUNK_PACK = 1 << 20


@register(
    "q43g_chunk_dedup",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {sql_tokens("text")} AS toks FROM documents
    ), ch AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) + 1, {DEDUP_CHUNK_TOKENS}),
                      s -> struct_pack(
                          idx := CAST((s - 1) // {DEDUP_CHUNK_TOKENS} AS BIGINT),
                          chunk := toks[s : s + {DEDUP_CHUNK_TOKENS} - 1]))) AS c
        FROM tok
    ), hashed AS (
        SELECT doc_id,
               CAST(len(c.chunk) AS BIGINT) AS n_tokens,
               md5(array_to_string(c.chunk, ' ')) AS h,
               doc_id * {_CHUNK_PACK} + c.idx AS packed
        FROM ch
    ), firsts AS (
        SELECT h, MIN(packed) AS first_packed FROM hashed GROUP BY h
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN packed = first_packed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(CASE WHEN packed = first_packed THEN n_tokens ELSE 0 END) AS BIGINT)
               AS tokens_kept,
           CAST(SUM(CASE WHEN packed = first_packed THEN 0 ELSE n_tokens END) AS BIGINT)
               AS tokens_dropped
    FROM hashed JOIN firsts USING (h)
    GROUP BY doc_id
    """,
    tags=("text", "dedup", "chunking"),
)
def q43g_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus chunk-level exact dedup — the REMOVE action of
    segment-granular deduplication (CCNet dedups shared paragraphs across
    the crawl; Lee et al. ACL'22 remove duplicated spans, not documents):
    documents are cut into disjoint {DEDUP_CHUNK_TOKENS}-token chunks,
    each chunk keeps only its globally FIRST occurrence (lexicographic
    (doc_id, chunk_index)), and the per-document report (kept/dropped
    chunk and token counts) is what the pipeline uses to rewrite or
    discard documents downstream. Complements q45 (whole-doc exact dedup),
    q45c (duplicated-span detection) and q63c (document-level pass).

    Scale design: "first occurrence" is deliberately NOT a window over
    the chunk hash — a boilerplate chunk shared by 10^6 documents would
    put 10^6 rows in one window partition. Packing (doc_id, chunk_index)
    into one BIGINT turns it into MIN(packed) GROUP BY hash: associative,
    map-side-combined before the shuffle, so a hot hash costs one partial
    row per task, and the join back fans out linearly (occurrence count),
    never quadratically."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    k = DEDUP_CHUNK_TOKENS
    chunks = F.expr(
        f"transform(sequence(1, size(toks), {k}), s -> slice(toks, s, {k}))"
    )
    hashed = (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", F.posexplode(chunks).alias("chunk_index", "chunk"))
        .select(
            "doc_id",
            F.size("chunk").cast("bigint").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.col("chunk"))).alias("h"),
            (F.col("doc_id") * _CHUNK_PACK + F.col("chunk_index")).alias("packed"),
        )
    )
    firsts = hashed.groupBy("h").agg(F.min("packed").alias("first_packed"))
    kept = F.col("packed") == F.col("first_packed")
    return (
        hashed.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
            F.sum(F.when(kept, 0).otherwise(F.col("n_tokens")))
            .cast("bigint")
            .alias("tokens_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV-rate report (q46c)
# ---------------------------------------------------------------------------
OOV_VOCAB_SIZE = 16  # top-K frequency-ranked vocabulary budget
OOV_PPM = 1_000_000


@register(
    "q46c_oov_rate",
    oracle=f"""
    WITH tok AS (
        SELECT lang, unnest({sql_tokens("text")}) AS token FROM documents
    ), counts AS (
        SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
    ), vocab AS (
        SELECT token FROM counts
        QUALIFY row_number() OVER (ORDER BY cnt DESC, token) <= {OOV_VOCAB_SIZE}
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST((SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * {OOV_PPM})
                // COUNT(*) AS BIGINT) AS oov_ppm
    FROM tok LEFT JOIN vocab v USING (token)
    GROUP BY lang
    """,
    tags=("text", "tokenizer", "coverage"),
)
def q46c_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage report — the tokenizer-budget planning number:
    fix the vocabulary to the top-{OOV_VOCAB_SIZE} corpus tokens by
    frequency (ties broken lexicographically, so the vocab is
    deterministic) and measure each language's out-of-vocabulary token
    rate in exact ppm. This is the sweep you run per candidate vocab size
    before training a tokenizer — a language with high OOV under the
    shared budget is the one whose text will fragment.

    Scale: token counts are one map-side-combined hash-agg; the vocab cut
    is orderBy().limit() = TakeOrderedAndProject (no global sort); the
    membership join broadcasts the {OOV_VOCAB_SIZE}-row vocab to the
    token stream — no shuffle touches the corpus-sized side except the
    final per-lang agg (a handful of groups)."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(tokens("text")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        counts.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(OOV_VOCAB_SIZE)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_oov",
            F.expr(f"(n_oov * {OOV_PPM}) DIV n_tokens").alias("oov_ppm"),
        )
    )


@register(
    "q63e_chunk_dedup_rewrite",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {sql_tokens("text")} AS toks FROM documents
    ), ch AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) + 1, {DEDUP_CHUNK_TOKENS}),
                      s -> struct_pack(
                          idx := CAST((s - 1) // {DEDUP_CHUNK_TOKENS} AS BIGINT),
                          chunk := toks[s : s + {DEDUP_CHUNK_TOKENS} - 1]))) AS c
        FROM tok
    ), hashed AS (
        SELECT doc_id, c.idx AS chunk_index,
               array_to_string(c.chunk, ' ') AS ctext,
               CAST(len(c.chunk) AS BIGINT) AS n_tokens,
               md5(array_to_string(c.chunk, ' ')) AS h,
               doc_id * {_CHUNK_PACK} + c.idx AS packed
        FROM ch
    ), firsts AS (
        SELECT h, MIN(packed) AS first_packed FROM hashed GROUP BY h
    )
    SELECT doc_id,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_before,
           CAST(SUM(CASE WHEN packed = first_packed THEN n_tokens ELSE 0 END)
                AS BIGINT) AS n_tokens_after,
           md5(coalesce(string_agg(
               CASE WHEN packed = first_packed THEN ctext END, ' '
               ORDER BY chunk_index), '')) AS rewritten_md5
    FROM hashed JOIN firsts USING (h)
    GROUP BY doc_id
    """,
    tags=("text", "dedup", "chunking", "rewrite"),
)
def q63e_chunk_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REWRITE action for chunk-level dedup — q43g reports what would
    drop; this operator actually produces the deduplicated corpus:
    surviving chunks are reassembled in chunk order into the new document
    text (fingerprinted with md5 so the rewritten content itself is
    hash-checked, not just its size). A document whose every chunk is a
    duplicate rewrites to the empty string — a downstream length filter
    (q43) discards it, keeping the drop decision composable rather than
    baked in here.

    Order-correct reassembly without a window: per-doc collect_list of
    (chunk_index, text) structs, array_sort (struct order = field order,
    chunk_index first), then join — collect_list order is partition-
    nondeterministic but the sort canonicalizes it, the q71/q98 rule."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    k = DEDUP_CHUNK_TOKENS
    chunks = F.expr(
        f"transform(sequence(1, size(toks), {k}), s -> slice(toks, s, {k}))"
    )
    hashed = (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", F.posexplode(chunks).alias("chunk_index", "chunk"))
        .select(
            "doc_id",
            "chunk_index",
            F.concat_ws(" ", F.col("chunk")).alias("ctext"),
            F.size("chunk").cast("bigint").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.col("chunk"))).alias("h"),
            (F.col("doc_id") * _CHUNK_PACK + F.col("chunk_index")).alias("packed"),
        )
    )
    firsts = hashed.groupBy("h").agg(F.min("packed").alias("first_packed"))
    kept = F.col("packed") == F.col("first_packed")
    kept_struct = F.when(kept, F.struct("chunk_index", "ctext"))
    return (
        hashed.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("n_tokens").cast("bigint").alias("n_tokens_before"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("n_tokens_after"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s.ctext,
                    ),
                    " ",
                )
            ).alias("rewritten_md5"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic pseudonymization (q56b)
# ---------------------------------------------------------------------------
# Demo-only derivation secret (a production deployment pulls this from the
# KMS — the reference's wrapping-key registry is exactly the right home).
PSEUDO_SECRET = "pme-demo-pseudonym-secret-v1"
PSEUDO_LEN = 16  # hex chars kept: 64 bits of pseudonym space


@register(
    "q56b_pseudonymize",
    oracle=f"""
    SELECT c_custkey,
           substr(sha256('{PSEUDO_SECRET}:name:' || c_name), 1, {PSEUDO_LEN})
               AS name_token,
           substr(sha256('{PSEUDO_SECRET}:nation:' || CAST(c_nationkey AS VARCHAR)),
                  1, {PSEUDO_LEN}) AS nation_token,
           c_mktsegment
    FROM customer WHERE c_custkey <= 200
    """,
    tags=("privacy", "pseudonymization"),
)
def q56b_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyed pseudonymization — the third leg of the privacy
    toolbox beside redaction (q56 scrubs and destroys linkage) and
    encryption (q60 preserves the value for keyholders): a keyed-hash
    token per (secret, column, value) that is stable — the same name
    always maps to the same token, so joins, group-bys, and frequency
    analysis still work on the pseudonymized table — while unlinkable
    across columns (the column tag in the derivation prevents a name
    token matching another column's token even for equal raw strings) and
    irreversible without the secret. Crypto-shredding the secret (q60c's
    operation) anonymizes every table derived with it at once.

    Pure map-side projection (sha256 is a builtin in both engines — the
    only privacy transform here with literally zero shuffle), so the
    pseudonymized output is hash-checked end to end."""
    prep(spark)
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)

    def token(tag: str, col: str):
        return F.substring(
            F.sha2(
                F.concat(
                    F.lit(f"{PSEUDO_SECRET}:{tag}:"), F.col(col).cast("string")
                ),
                256,
            ),
            1,
            PSEUDO_LEN,
        )

    return cust.select(
        "c_custkey",
        token("name", "c_name").alias("name_token"),
        token("nation", "c_nationkey").alias("nation_token"),
        "c_mktsegment",
    )


# ---------------------------------------------------------------------------
# Curation verdict with reason codes (q43h)
# ---------------------------------------------------------------------------
# Rule bits (a production pipeline logs WHY each document dropped, not
# just that it did — reason-code distributions are how rule regressions
# get caught):
VERDICT_MIN_TOKENS = 30       # bit 0: too short
VERDICT_MIN_QUALITY = 0.75    # bit 1: low composite quality
VERDICT_MIN_DIVERSITY = 0.45  # bit 2: repetitive (low distinct-token ratio)
VERDICT_BLOCKED_SOURCES = ("src7", "src13")  # bit 3: source blocklist
# Explicit IN-list (not the tuple repr, which renders ('x',) — invalid
# SQL — the moment the blocklist shrinks to one entry).
_VERDICT_BLOCKED_IN = "(" + ", ".join(f"'{s}'" for s in VERDICT_BLOCKED_SOURCES) + ")"


@register(
    "q43h_curation_verdict",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, source,
               {sql_tokens("text")} AS ts,
               {SQL_QUALITY} AS q
        FROM documents
    ), bits AS (
        SELECT doc_id, lang,
               (CASE WHEN len(ts) < {VERDICT_MIN_TOKENS} THEN 1 ELSE 0 END)
             + (CASE WHEN q < {VERDICT_MIN_QUALITY} THEN 2 ELSE 0 END)
             + (CASE WHEN CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts)
                          < {VERDICT_MIN_DIVERSITY} THEN 4 ELSE 0 END)
             + (CASE WHEN source IN {_VERDICT_BLOCKED_IN} THEN 8 ELSE 0 END)
                   AS reasons_mask
        FROM t
    )
    SELECT doc_id, lang,
           CAST(reasons_mask AS BIGINT) AS reasons_mask,
           CAST(CASE WHEN reasons_mask = 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM bits
    """,
    tags=("text", "curation", "verdict"),
)
def q43h_curation_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation verdict with REASON CODES — the rule-engine
    shape every production curation pass emits (drops without reasons are
    undebuggable; the reason-mask histogram is the regression alarm when
    a rule or the data shifts): each filter contributes one bit
    (too-short / low-quality / repetitive / blocked-source), a document
    is kept iff its mask is zero, and every rule is evaluated for every
    document (contrast q63b's short-circuiting pipeline, which stops at
    the first failing stage — here the full diagnosis is the product).

    Pure map-side projection over expressions already verified by q42/
    q43/q116's oracles — composing existing rules costs zero extra
    shuffles, and the bitmask is exact integer output."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    diversity = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    mask = (
        F.when(F.size(toks) < VERDICT_MIN_TOKENS, 1).otherwise(0)
        + F.when(quality_score(F.col("text")) < VERDICT_MIN_QUALITY, 2).otherwise(0)
        + F.when(diversity < VERDICT_MIN_DIVERSITY, 4).otherwise(0)
        + F.when(F.col("source").isin(*VERDICT_BLOCKED_SOURCES), 8).otherwise(0)
    )
    return docs.select(
        "doc_id",
        "lang",
        mask.cast("bigint").alias("reasons_mask"),
        F.when(mask == 0, 1).otherwise(0).cast("bigint").alias("kept"),
    )
