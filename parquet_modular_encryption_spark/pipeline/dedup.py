"""Near-duplicate detection over documents: MinHash+LSH, SimHash,
n-gram Jaccard — the fuzzy-dedup family of a training-data pipeline.
Exact dedup lives in q13 (distinct) and q45 (normalized fingerprint).

Everything is built from portable primitives (md5-based 60-bit hash,
integer modular arithmetic, distinct word shingles) so the full
MinHash → banding → candidate-join → Jaccard-verify pipeline is
reproduced verbatim by the DuckDB oracle — the near-dup results are
hash-checked, not just smoke-checked.

Scale notes (100 TB): the banding self-join is the only shuffle — its key
(band_id, band_key) is high-cardinality and uniform by construction, so it
partitions well; candidate verification joins back to shingle sets by
doc_id. Pair count is controlled by B/R (banding probability curve), not by
O(n²) comparison. SimHash is a pure map + one agg; n-gram Jaccard is
blocked on (source, length bucket) to bound the quadratic term."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.functions.text import (
    MINHASH_PRIME as P,
)
from parquet_modular_encryption_spark.functions.text import (
    hash60,
    normalized,
    raw_shingles_from,
    shingles_from,
    sql_hash60,
    sql_normalized,
    sql_raw_word_shingles,
    sql_tokens,
    sql_word_shingles,
    tokens,
)
from parquet_modular_encryption_spark.pipeline.partitioning import pinned, widened
from parquet_modular_encryption_spark.registry import register
from parquet_modular_encryption_spark.session import prep
from parquet_modular_encryption_spark.sources.datasets import load

# 8 fixed MinHash permutations (a*h + b) mod P, P = 2^31-1 (Mersenne).
# Constants are arbitrary-but-fixed odd multipliers < P; identical literals
# are embedded in the SQL oracle.
# The BUDGET operating point: 8 perms = 4 bands × 2 rows. This was the
# engine's default through round 11; at the planted J≈0.55 dedup regime
# its s-curve caps per-pair candidate recall at 1-(1-s²)⁴ ≈ 0.76
# (measured 0.861/0.913/0.915 planted group recall on duph0.1/1/3,
# GROUPED_r11.json) — a production near-dedup defaulting here silently
# drops ~10% of true near-duplicates, which is why round 12 promoted the
# 16-perm point below to the default (VERDICT r11 #1) and kept this one
# registered as the explicitly-priced budget sibling (q47d).
MINHASH_PERMS_BUDGET: tuple[tuple[int, int], ...] = (
    (1000000007, 337),
    (998244353, 7919),
    (774856787, 104729),
    (592342111, 29),
    (429496751, 65521),
    (275604541, 1299709),
    (179424673, 15485863),
    (104395301, 982451653),
)
N_BANDS_BUDGET = 4  # s-curve threshold ≈ (1/4)^(1/2) ≈ 0.5
ROWS_PER_BAND = 2
JACCARD_THRESHOLD = 0.4
SHINGLE_N = 3

# THE DEFAULT operating point (round 12, VERDICT r11 #1): 16 fixed
# permutations = 8 bands × 2 rows. Constants are arbitrary-but-fixed odd
# multipliers < P (same convention throughout); the first 8 ARE the
# budget perms, so budget band keys are bands 0-3 of this config and the
# budget candidate set is a subset of the default's. Why 8 bands is the
# default: recall is a measured budget knob, not folklore — at the
# planted J≈0.55 regime 8×2 banding holds per-pair candidate recall
# 1-(1-s²)⁸ ≈ 0.94 (measured planted recall 0.989/0.988/0.990 at
# duph0.1/1/3, GROUPED_r11.json — flat across 30× scale) vs the 4-band
# point's 0.76 theory / 0.86-0.92 measured, at ~2× band-bucket candidate
# mass (bands add, they don't multiply — still linear in corpus size)
# and ~1.5× wall (13.3 s vs 8.9 s at the 150k-doc duph3). Downstream
# consumers (q57's recursive-CTE components oracle, q63d/e incremental
# dedup, the q47c sketch audit) all derive BOTH their Spark plans and
# their DuckDB oracles from these module constants via _minhash_ctes, so
# the default moves everywhere in lock-step — no oracle re-derives a
# banding shape of its own.
MINHASH_PERMS: tuple[tuple[int, int], ...] = MINHASH_PERMS_BUDGET + (
    (122949823, 2741),
    (86028121, 9973),
    (67867967, 524287),
    (49979687, 6700417),
    (32452843, 1299721),
    (23462467, 15485867),
    (15485863, 32452867),
    (10000019, 49979693),
)
N_BANDS = 8


def minhash_signature(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sig_0..sig_7): MinHash signature over distinct word shingles.

    Array-checkpoint before the explode (round-9 discipline, enforced by
    scripts/lint.py): exploding the lazy shingle HOF re-runs the whole
    construction per emitted shingle."""
    arrays = df.select(F.col(id_col), tokens(text_col).alias("toks")).select(
        F.col(id_col), shingles_from(F.col("toks"), SHINGLE_N).alias("shingles")
    ).localCheckpoint(eager=True)
    # hv is PROJECTED once per shingle row before the aggregate (r15):
    # as an agg-input expression it appears in all 16 permutation mins,
    # and relying on codegen subexpression elimination to evaluate the
    # md5 once is fragile — the explicit projection guarantees one
    # md5+conv per row with the same values.
    sh = arrays.select(F.col(id_col), F.explode("shingles").alias("shingle")).select(
        F.col(id_col), (hash60(F.col("shingle")) % P).alias("hv")
    )
    aggs = [
        F.min((F.lit(a) * F.col("hv") + F.lit(b)) % P).alias(f"sig_{j}")
        for j, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def band_keys(sig: DataFrame, id_col: str, n_bands: int = N_BANDS) -> DataFrame:
    """Explode a signature into (id, band_id, band_key) LSH bucket rows."""
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"sig_{i * ROWS_PER_BAND + r}")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("band_key"),
            )
            for i in range(n_bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(bands).alias("b")).select(
        id_col, F.col("b.band_id").alias("band_id"), F.col("b.band_key").alias("band_key")
    )


def _minhash_oracle(
    perms: tuple[tuple[int, int], ...] = MINHASH_PERMS,
    n_bands: int = N_BANDS,
    bucket_cap: int | None = None,
) -> str:
    return f"""
    WITH {_minhash_ctes(perms, n_bands, bucket_cap)}
    SELECT doc_a, doc_b, jaccard FROM verified
    """


def _sql_bucket_cap_clause(bucket_cap: int | None) -> str:
    """Pairs-CTE predicate dropping over-cap band buckets (q63g's
    degenerate-block filter): correlated membership count against the
    same bands CTE — empty string when no cap applies, so every
    existing _minhash_ctes consumer is byte-identical."""
    if bucket_cap is None:
        return ""
    return (
        "AND (SELECT COUNT(*) FROM bands c WHERE c.band_id = a.band_id "
        f"AND c.band_key = a.band_key) <= {bucket_cap}"
    )


def _minhash_ctes(
    perms: tuple[tuple[int, int], ...] = MINHASH_PERMS,
    n_bands: int = N_BANDS,
    bucket_cap: int | None = None,
) -> str:
    """The q47 MinHash+LSH pipeline as a WITH-clause body ending in a
    ``verified(doc_a, doc_b, jaccard)`` CTE — shared by the q47 oracle and
    q57's recursive-CTE connected-components oracle. The defaults are the
    q47 config; q47d passes its 16-perm/8-band high-recall ladder.
    ``bucket_cap`` (q63g) drops candidate generation from band buckets
    with more than cap members — the degenerate-block filter mirrored."""
    toks = sql_tokens("text")
    shingles = sql_word_shingles("toks", SHINGLE_N)
    hv = f"({sql_hash60('shingle')} % {P})"
    sig_cols = ", ".join(
        f"MIN(({a} * {hv} + {b}) % {P}) AS sig_{j}" for j, (a, b) in enumerate(perms)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {i} AS band_id, concat({cols}) AS band_key FROM sig".format(
            i=i,
            cols=", ',', ".join(
                f"sig_{i * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for i in range(n_bands)
    )
    return f"""
    tokenized AS (
        SELECT doc_id, {toks} AS toks FROM documents
    ), shingled AS (
        SELECT doc_id, {shingles} AS shingles FROM tokenized
    ), exploded AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM shingled
    ), sig AS (
        SELECT doc_id, {sig_cols} FROM exploded GROUP BY doc_id
    ), bands AS (
        {band_selects}
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
        {_sql_bucket_cap_clause(bucket_cap)}
    ), verified AS (
        SELECT p.doc_a, p.doc_b,
               CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                   / len(list_distinct(sa.shingles || sb.shingles)) AS jaccard
        FROM pairs p
        JOIN shingled sa ON sa.doc_id = p.doc_a
        JOIN shingled sb ON sb.doc_id = p.doc_b
        WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                   / len(list_distinct(sa.shingles || sb.shingles)) >= {JACCARD_THRESHOLD}
    )
    """


@register(
    "q47_minhash_neardup",
    oracle=_minhash_oracle(),
    tags=("dedup", "minhash", "lsh"),
)
def q47_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with Jaccard verification:
    shingle → 16-perm MinHash → 8×2 banding → bucket self-join → verify.
    The full pipeline is mirrored in the DuckDB oracle, so candidate
    generation AND verification are value-checked.

    The 8×2 banding is the round-12 default (VERDICT r11 #1): measured
    planted recall 0.989/0.988/0.990 across the 5k/50k/150k dup-heavy
    corpora vs 0.861/0.913/0.915 for the historic 4-band point, at ~2×
    candidate mass and ~1.5× wall — see the MINHASH_PERMS constant block
    for the full pricing. The 4-band point stays registered as
    q47d_minhash_budget."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    shingled, bands = minhash_bands(docs)
    pairs = banded_pairs(bands).distinct()
    return _jaccard_verify(shingled, pairs)


@register(
    "q47d_minhash_budget",
    oracle=_minhash_oracle(MINHASH_PERMS_BUDGET, N_BANDS_BUDGET),
    tags=("dedup", "minhash", "lsh", "budget"),
)
def q47d_minhash_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q47's pipeline at the BUDGET operating point: 8 MinHash
    permutations banded 4×2 instead of the default 16 banded 8×2 — the
    engine's pre-round-12 default, kept registered because the trade is
    real in both directions. Same shingles, same verification threshold,
    same output frame — only the s-curve moves: at the planted J≈0.55
    dedup regime per-pair candidate recall drops from ≈0.94 to ≈0.76
    (1-(1-s²)^B; measured planted recall 0.86-0.92 vs the default's
    0.989+, GROUPED_r11.json), buying ~half the band-bucket candidate
    mass and ~0.65× wall. The right choice when the corpus is being
    deduped repeatedly (incremental ingest re-screens survivors) or when
    a downstream exact pass catches stragglers; the wrong default for a
    one-shot production dedup, which is why round 12 swapped the roles
    (VERDICT r11 #1). The budget perms are the first 8 of the default's,
    so this candidate set is a strict subset of q47's. The full
    8-perm/4-band pipeline is mirrored in the DuckDB oracle, and tests
    pin q47's measured planted-pair recall STRICTLY above this one's on
    the same corpus."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    shingled, bands = minhash_bands(docs, MINHASH_PERMS_BUDGET, N_BANDS_BUDGET)
    pairs = banded_pairs(bands).distinct()
    return _jaccard_verify(shingled, pairs)


#: per-(app, sf) memo of the q47e encrypted-documents fixture directory
_ENC_DOCS_CACHE: dict[tuple[str, str], str] = {}


def _encrypted_docs_dir(spark: SparkSession, sf_dir: str) -> str:
    """documents written PME-encrypted once per session+sf: text is the
    sensitive column (CONFIDENTIAL), doc_id stays plaintext so catalog
    operations need no key — the reference's id-column convention."""
    import os as _os

    key = (spark.sparkContext.applicationId, f"q47e:{sf_dir}")
    cached = _ENC_DOCS_CACHE.get(key)
    if cached is not None and _os.path.isdir(cached):
        return cached
    from parquet_modular_encryption_spark.crypto.policy import (
        EncryptionPolicy,
        Privilege,
    )
    from parquet_modular_encryption_spark.scratch import scratch_dir
    from parquet_modular_encryption_spark.sources.encrypted import write_encrypted

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").coalesce(4)
    path = scratch_dir("pme_q47e_")
    # v1 data pages: q49f reads this lake through the native parquet-mr
    # scan when the session carries the KMS jar, and the arrow<->mr PME
    # interop holds for v1 pages only (see _decrypting_pinned_read)
    write_encrypted(
        docs,
        path,
        EncryptionPolicy(
            column_levels={"text": Privilege.CONFIDENTIAL}, name="documents"
        ),
        data_page_version="1.0",
    )
    _ENC_DOCS_CACHE[key] = path
    return path


@register(
    "q47e_minhash_encrypted",
    oracle=_minhash_oracle(),
    tags=("dedup", "minhash", "lsh", "encryption"),
)
def q47e_minhash_encrypted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q47's MinHash+LSH near-dup dedup over an ENCRYPTED document lake —
    the text-pipeline twin of q91f's encrypted media dedup, closing the
    composition the engine's two halves promise: document text is written
    AES-GCM-encrypted under the CONFIDENTIAL key (doc_id plaintext for
    keyless catalog ops), then the IDENTICAL shingle → signature → band →
    verify pipeline runs on the decrypting scan with a CONFIDENTIAL
    token. Sharing q47's plaintext oracle makes the claim hash-checkable:
    encryption at rest changes NOTHING about the dedup on top — same
    shingles, same signatures, same verified pairs.

    Scale: the encrypted write is one file per partition executor-side;
    the decrypting scan is file-granular parallel with per-task KMS
    clients and the 60 s key cache, so the KMS cost is per-file-per-key,
    amortized over row groups — dedup's shuffle structure is untouched.
    tests pin the negative side (keyless/insufficient tokens cannot touch
    text; doc_id stays readable without any key).

    Boundary disclosure: like the grouped operator's DEFAULT plaintext-
    scratch contract, this single-pass path checkpoints the shingle
    arrays through Spark's local block store (content derivatives
    outside the envelope, on executor disk). The closed-boundary
    composition is q49f (encrypt_scratch + spill-safe checkpoints)."""
    prep(spark)
    from parquet_modular_encryption_spark.sources.encrypted import read_encrypted

    enc_path = _encrypted_docs_dir(spark, sf_dir)
    docs = read_encrypted(spark, enc_path, token="CONFIDENTIAL")
    shingled, bands = minhash_bands(docs)
    pairs = banded_pairs(bands).distinct()
    return _jaccard_verify(shingled, pairs)


def minhash_bands(
    docs: DataFrame,
    perms: tuple[tuple[int, int], ...] = MINHASH_PERMS,
    n_bands: int = N_BANDS,
) -> tuple[DataFrame, DataFrame]:
    """Shared q47/q47b/q47d front half: (shingled, bands).

    The shingle sets feed both the signature pipeline and the Jaccard
    verification, and re-shingling (regex tokenize + n-gram assembly)
    dominates recomputation cost, so they are materialized once. Tokens
    are projected into a column BEFORE shingling so the regex split runs
    once per doc, not once per element_at (see
    functions.text.shingles_from). localCheckpoint, not persist: the
    ContextCleaner reclaims checkpoint blocks when the frame is
    garbage-collected, where a bare persist() leaked cached partitions
    across repeated invocations (bench min-of-3, driver registry
    re-runs) for the session's lifetime — same fix as q49b."""
    shingled = (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", shingles_from(F.col("toks"), SHINGLE_N).alias("shingles"))
        .localCheckpoint(eager=True)
    )
    # hv PROJECTED once per shingle row before the aggregate (r16 —
    # the r15 minhash_signature fix, which this front half had its own
    # un-fixed copy of): as an agg-input expression the md5+conv hash
    # appears in all {len(perms)} permutation mins and relying on
    # codegen subexpression elimination to evaluate it once is fragile;
    # the explicit projection guarantees ONE md5 per row, same values.
    sh = shingled.select(F.col("doc_id"), F.explode("shingles").alias("shingle")).select(
        F.col("doc_id"), (hash60(F.col("shingle")) % P).alias("hv")
    )
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("hv") + F.lit(b)) % P).alias(f"sig_{j}")
            for j, (a, b) in enumerate(perms)
        ]
    )
    return shingled, band_keys(sig, "doc_id", n_bands)


def banded_pairs(bands: DataFrame) -> DataFrame:
    """Candidate pairs from an LSH bands frame: plain bucket self-join on
    (band_id, band_key), emitting each (doc_a < doc_b) pair once per
    bucket they co-occur in (callers dedup across bands with distinct).
    The input is key-repartition-pinned — see :func:`partitioning.pinned` for why
    letting AQE size this stage serializes explosive joins."""
    bands = pinned(bands, "band_id", "band_key")
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )


# Bucket size above which the self-join work (k² pairs on ONE reducer) is
# spread over a grid × grid cell grid. At 100 TB this threshold rises
# with cluster reducer capacity; the replication cost of the hot path is
# grid× on hot rows only.
HOT_BUCKET_THRESHOLD = 8
#: Floor of the ADAPTIVE grid (and the pre-r12 fixed value).
PAIR_GRID = 4
#: Grid ceiling — raised 16 -> 256 in r13 (VERDICT r12 #5): at the old
#: cap a 10^6-member mega-block (empty/boilerplate docs at 100 TB)
#: would still park (10^6/16)² ≈ 3.9G pairs on ONE cell. 256 keeps the
#: per-cell target honest up to ~128k-member blocks (rule: g >= k/500);
#: past THAT the operator cannot make the k² pair mass tractable by
#: gridding alone — it warns with the measured per-cell estimate and
#: records the clamp in LAST_SALTED_GRID (pytest-pinned), because a
#: block that big is a data-quality fact the pipeline must see, not
#: silently grind through. Replication stays proportional: since r13
#: the grid is PER-BLOCK (each hot block gets the smallest grid its OWN
#: census count needs), so raising the ceiling never inflates small hot
#: blocks — a 2,980-member boiler bucket still replicates 8x while the
#: mega-block beside it takes 256.
PAIR_GRID_MAX = 256
#: Target per-cell pair work: a g×g grid hands each cell ~(k/g)² pairs
#: of a k-member block, so the rule picks the smallest power-of-two g in
#: [PAIR_GRID, PAIR_GRID_MAX] with (k/g)² <= this. Calibrated on
#: boiler3 (max bucket 2,980): the rule picks 8, measured 22.7 s at
#: straggler 1.24 vs the fixed grid-4's 42.7 s at 1.85 in the same
#: session, identical fingerprints (SCALE_r12_boiler.json
#: adaptive_grid_probe). NOTE: kept a perfect square (500²) so the
#: per-block SQL mirror `k <= 500*g` is integer-exact.
PAIR_CELL_TARGET = 250_000

#: (k_max, grid[, clamped, est_cell_pairs]) of the most recent auto-grid
#: decision — for artifacts/tests. `grid` is the LARGEST block's grid
#: (the per-block rule applied to k_max); clamped/est_cell_pairs appear
#: only when even PAIR_GRID_MAX leaves a cell above target.
LAST_SALTED_GRID: dict[str, int] = {}


def _auto_grid(k_max: int) -> int:
    g = PAIR_GRID
    while g < PAIR_GRID_MAX and (k_max / g) ** 2 > PAIR_CELL_TARGET:
        g *= 2
    return g


#: Grid cells per execution slot the parallelism cap aims for: a g×g
#: grid can occupy at most g² tasks, so any g far beyond
#: sqrt(occupancy × parallelism) buys replication the session cannot
#: cash as balance — the measured 33% local overhead of r13's mega
#: probe (grid 128 = 16,384 cells for 32 threads, NOTES_r13 §4).
#: 128 cells/slot is the measured local[32] sweet spot (r14 grid
#: sweep on the 50k mega probe: grid 64 = 4,096 cells lands straggler
#: 1.24 at wall parity with grid 16, where 16,384 cells paid 33%) —
#: generous wave smoothing is free until per-task overhead dominates.
PAIR_GRID_OCCUPANCY = 128


def _parallelism_grid_cap(parallelism: int) -> int:
    """Largest USEFUL per-block grid for this session (VERDICT r13 #5):
    smallest power-of-two g in [PAIR_GRID, PAIR_GRID_MAX] with
    g² >= PAIR_GRID_OCCUPANCY × parallelism. local[32] → 64 (measured:
    straggler 1.24 at wall parity with the old uniform-16, SCALE_r14_
    mega); a 1000-executor × 8-core cluster (parallelism 8000) → 256
    (the mega-block ceiling preserved). The cap is PHYSICAL only — the
    work rule (:func:`_auto_grid`) still decides what a block NEEDS;
    this decides what the session can USE."""
    g = PAIR_GRID
    while g < PAIR_GRID_MAX and g * g < PAIR_GRID_OCCUPANCY * max(1, parallelism):
        g *= 2
    return g


def _auto_grid_expr(n_col: Column, cap: int = PAIR_GRID_MAX) -> Column:
    """Column mirror of :func:`_auto_grid` for the per-block grid:
    smallest power-of-two g with block_count <= 500*g (integer-exact
    equivalent of (k/g)² <= PAIR_CELL_TARGET since 250_000 = 500²),
    clamped to [PAIR_GRID, min(PAIR_GRID_MAX, cap)] — ``cap`` carries
    the session parallelism ceiling (:func:`_parallelism_grid_cap`).
    Both join sides derive the SAME g from the block's census count, so
    every pair still meets in exactly one cell."""
    root = 500  # isqrt(PAIR_CELL_TARGET); the constant block pins squareness
    ceiling = min(PAIR_GRID_MAX, max(PAIR_GRID, cap))
    expr = None
    g = PAIR_GRID
    while True:
        cond = n_col <= F.lit(root * g)
        expr = F.when(cond, F.lit(g)) if expr is None else expr.when(cond, F.lit(g))
        if g >= ceiling:
            break
        g *= 2
    return expr.otherwise(F.lit(ceiling)).cast("long")


def _block_pairs(
    df: DataFrame,
    block_keys: list[str],
    id_col: str,
    out_a: str,
    out_b: str,
    extra_cond=None,
) -> DataFrame:
    """Plain within-block self-join: (out_a < out_b) id pairs sharing every
    block key (plus ``extra_cond`` on the a/b aliases when given)."""
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for k in block_keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    if extra_cond is not None:
        cond = cond & extra_cond
    df = pinned(df, *block_keys)  # explosive-join guard (see partitioning.pinned)
    return (
        df.alias("a")
        .join(df.alias("b"), cond)
        .select(
            F.col(f"a.{id_col}").alias(out_a), F.col(f"b.{id_col}").alias(out_b)
        )
    )


def salted_block_self_join(
    df: DataFrame,
    block_keys: tuple[str, ...] | list[str],
    id_col: str = "doc_id",
    hot_threshold: int = HOT_BUCKET_THRESHOLD,
    grid: int | None = None,
    out_a: str = "doc_a",
    out_b: str = "doc_b",
) -> DataFrame:
    """Skew-hardened blocked self-join, generalized over arbitrary block
    keys: identical output to the plain within-block self-join, hot blocks
    fragment-replicated over a ``grid``×``grid`` reducer grid.

    A block shared by k rows (a boilerplate LSH signature, a dominant
    (source, length) bucket, a common document prefix) puts k² pair work
    on a single reducer — the straggler that stalls the stage at 100 TB.
    Mitigation, mirroring q86's two-phase salted agg but adapted to a
    self-join:

    1. Block census: one count per block (same shuffle key as the join,
       so the exchange is reusable); keys with count > ``hot_threshold``
       form the hot set.
    2. Cold blocks take the plain self-join unchanged.
    3. Hot-block rows are fragment-replicated (the 1-bucket-theta join
       of Okcan & Riedewald, SIGMOD'11): a row with salt s = hash(id)
       % g enters the build side in cells (s, *) and the probe side in
       cells (*, s), so every pair meets in EXACTLY one cell and each
       block's k² work splits g² ways for g× row replication. Since r13
       g is PER-BLOCK when adaptive (``grid=None``): each hot block
       takes the smallest power-of-two grid its own census count needs
       (:func:`_auto_grid_expr`), so a 3k-member bucket replicates 8x
       while a 100k mega-block beside it takes the 256 ceiling —
       replication proportional to each block's own pair mass. Since
       r14 the per-block grid is additionally capped by the session's
       parallelism (:func:`_parallelism_grid_cap`): g² cells far beyond
       the available slots is replication the session cannot cash as
       balance (the measured 33% local mega-probe overhead of grid 128,
       NOTES_r13 §4) — local[32] caps at 64, the measured
       straggler-1.24-at-wall-parity point, while a 1000-executor
       session keeps the full ceiling. An
       explicit ``grid`` applies uniformly (experiments/A-B probes).

    No forced broadcasts: the hot-key set joins on the same block key
    (AQE broadcasts it when small; the worst-case hot-set size is
    data-dependent, so forcing would be a 100 TB hazard).
    """
    keys = list(block_keys)
    rows = df.select(id_col, *keys)
    counts = rows.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    per_block = grid is None
    if per_block:
        # Census-adaptive grid (r12), PER-BLOCK since r13: the block
        # census is computed anyway; each hot block gets the smallest
        # power-of-two grid its OWN count needs (see _auto_grid_expr),
        # so replication stays proportional — raising PAIR_GRID_MAX for
        # the mega-block tail never inflates ordinary hot blocks. The
        # grid is PHYSICAL only (output and oracle identical for any
        # value), so adapting it can never break parity. The k_max MAX
        # costs one aggregate job per salted join (~0.2-0.4 s at
        # sf0.1); payoff measured on boiler3: auto picks 8 -> 2x
        # faster, straggler 1.85 -> 1.24 (SCALE_r12_boiler.json).
        k_max = int(counts.agg(F.max("__n")).first()[0] or 0)
        # Two independent clamps (r14): the WORK rule decides what the
        # block needs ((k/g)² <= target); the PARALLELISM cap decides
        # what this session can use (g² cells vs available slots) —
        # local[32] lands at the uniform-16 wall it used to pay 33%
        # over, while a 1000-executor session keeps the full 256
        # ceiling. Both are physical-only: output and oracle identical
        # for any grid value.
        cap = _parallelism_grid_cap(
            df.sparkSession.sparkContext.defaultParallelism
        )
        grid_work = _auto_grid(k_max)
        grid = min(grid_work, cap)
        LAST_SALTED_GRID.clear()
        LAST_SALTED_GRID.update(
            k_max=k_max, grid=grid, grid_work=grid_work, parallelism_cap=cap
        )
        if grid_work == PAIR_GRID_MAX and (k_max / grid_work) ** 2 > PAIR_CELL_TARGET:
            # Over-cap contract (VERDICT r12 #5): a block too large for
            # even the max grid is a data-quality fact (empty/boiler
            # docs, degenerate keys) the pipeline must SEE — gridding
            # distributes k² pair work, it cannot shrink it.
            import warnings

            est = int((k_max / grid_work) ** 2)
            LAST_SALTED_GRID.update(clamped=1, est_cell_pairs=est)
            warnings.warn(
                f"salted_block_self_join: block of {k_max} rows exceeds "
                f"the {PAIR_GRID_MAX}x{PAIR_GRID_MAX} grid ceiling — "
                f"~{est} pairs PER CELL ({k_max * (k_max - 1) // 2} total "
                f"in the block). Expect a straggling stage; consider "
                f"filtering or pre-splitting degenerate blocks upstream.",
                stacklevel=2,
            )
    hot_keys = counts.filter(F.col("__n") > hot_threshold).select(
        *keys, "__n"
    )
    tagged = rows.join(hot_keys, keys, "left")
    cold = tagged.filter(F.col("__n").isNull()).select(id_col, *keys)
    hot = tagged.filter(F.col("__n").isNotNull()).withColumn(
        "__g",
        _auto_grid_expr(F.col("__n"), cap=cap)
        if per_block
        else F.lit(grid).cast("long"),
    ).select(id_col, *keys, "__g")

    cold_pairs = _block_pairs(cold, keys, id_col, out_a, out_b)

    # cell ids as BIGINT to match pmod(xxhash64)'s type: a type mismatch
    # here makes the join keys cast(__col as bigint)/cast(__row as bigint),
    # which no longer match the pinned repartition columns below — the
    # planner then inserts its own ENSURE_REQUIREMENTS exchange, and AQE
    # coalesces THAT by input bytes, re-serializing the very stage the
    # grid exists to spread (measured: 60 s single task on a planted 6k
    # bucket with the casts; balanced without them). __g is long, so
    # sequence() yields array<long> and pmod(xxhash64, __g) stays long.
    cells = F.sequence(F.lit(0).cast("long"), F.col("__g") - F.lit(1).cast("long"))
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.col("__g"))
    keys_and_cells = [*keys, "__row", "__col"]
    ha = pinned(
        hot.withColumn("__row", salt)
        .withColumn("__col", F.explode(cells))
        .select(id_col, *keys_and_cells),
        *keys_and_cells,
    )
    hb = pinned(
        hot.withColumn("__col", salt)
        .withColumn("__row", F.explode(cells))
        .select(id_col, *keys_and_cells),
        *keys_and_cells,
    )
    grid_cond = (F.col("a.__row") == F.col("b.__row")) & (
        F.col("a.__col") == F.col("b.__col")
    )
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for k in keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    hot_pairs = (
        ha.alias("a")
        .join(hb.alias("b"), cond & grid_cond)
        .select(
            F.col(f"a.{id_col}").alias(out_a), F.col(f"b.{id_col}").alias(out_b)
        )
    )
    return cold_pairs.unionByName(hot_pairs)


def banded_pairs_salted(
    bands: DataFrame,
    hot_threshold: int = HOT_BUCKET_THRESHOLD,
    grid: int | None = None,
) -> DataFrame:
    """Skew-hardened ``banded_pairs``: identical output, hot LSH buckets
    spread over the reducer grid. Thin wrapper over the generalized
    :func:`salted_block_self_join` with (band_id, band_key) as the block
    key — see that function for the mechanism and 100 TB rationale."""
    return salted_block_self_join(
        bands,
        ("band_id", "band_key"),
        id_col="doc_id",
        hot_threshold=hot_threshold,
        grid=grid,
    )


def _jaccard_verify(
    shingled: DataFrame, pairs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against the persisted
    shingle sets. Verification joins are plain shuffle joins on
    doc_a/doc_b: the keys are high-cardinality so they partition evenly,
    and candidate-pair count grows with corpus size x dup rate — it is
    smaller than n but NOT bounded, so broadcasting pairs (let alone
    pairs enriched with shingle arrays) would eventually exceed any
    broadcast threshold at 100 TB. AQE may still choose a broadcast at
    small SF; the plan must not force one."""
    sa = shingled.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sb = shingled.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    enriched = sa.join(pairs, "doc_a")
    return (
        sb.join(enriched, "doc_b")
        .select("doc_a", "doc_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


@register(
    "q47b_minhash_neardup_salted",
    oracle=_minhash_oracle(),
    tags=("dedup", "minhash", "lsh", "skew"),
)
def q47b_minhash_neardup_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened q47: byte-identical near-dup output (it shares q47's
    oracle, so the equivalence is hash-checked by the driver), with hot
    LSH buckets spread over a reducer grid via ``banded_pairs_salted``.
    The shingle → signature → banding → verify pipeline is q47's; only
    candidate generation differs. See banded_pairs_salted for the
    100 TB rationale; tests/test_plans.py pins the no-forced-broadcast
    property and tests/test_pipeline.py checks salted == plain on an
    adversarially skewed bucket."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    shingled, bands = minhash_bands(docs)
    pairs = banded_pairs_salted(bands).distinct()
    return _jaccard_verify(shingled, pairs)


#: Band buckets with more than this many members are DEGENERATE: past it
#: even the PAIR_GRID_MAX reducer grid leaves cells above
#: PAIR_CELL_TARGET (the boundary is exactly 500 × 256 — the integer
#: form of the over-cap warning in salted_block_self_join), and C(k,2)
#: pair work that large is a data-quality fact (empty/boilerplate
#: documents hashing to one bucket), not a join to grind through:
#: gridding distributes k² work, it cannot shrink it, and hash-prefix
#: sub-splitting cannot either — per-row replication to hold a pair
#: target scales as k/sqrt(target) no matter how the block is cut. The
#: production remedy is therefore UPSTREAM: see the block census
#: (q63f) and the capped dedup pass (q63g). The warning path in
#: salted_block_self_join is retained — filtering is a policy decision
#: the pipeline owner makes with the census in hand, never a silent
#: default.
DEGENERATE_BLOCK_CAP = 500 * PAIR_GRID_MAX  # 128,000 members


def degenerate_block_filter(
    bands: DataFrame,
    cap: int = DEGENERATE_BLOCK_CAP,
    block_keys: tuple[str, ...] = ("band_id", "band_key"),
) -> tuple[DataFrame, DataFrame]:
    """(kept, dropped_blocks): remove rows of blocks with more than
    ``cap`` members from a banding frame. The census shuffles on the
    same key as the downstream bucket join; the over-cap key set is
    tiny by nature, so the anti-join is cheap. ``dropped_blocks``
    carries (block keys, n_members) for reporting."""
    keys = list(block_keys)
    over = (
        bands.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > cap)
    )
    kept = bands.join(over.select(*keys), keys, "left_anti")
    return kept, over


@register(
    "q63f_block_census_report",
    oracle=f"""
    WITH {_minhash_ctes()}, census AS (
        SELECT band_id, band_key, COUNT(*) AS n_members,
               MIN(doc_id) AS representative
        FROM bands GROUP BY band_id, band_key
    )
    SELECT band_id, band_key, n_members, representative,
           CAST(n_members * (n_members - 1) // 2 AS BIGINT) AS block_pairs,
           n_members > {DEGENERATE_BLOCK_CAP} AS is_degenerate
    FROM census
    ORDER BY n_members DESC, band_id, band_key
    LIMIT 10
    """,
    tags=("dedup", "census", "data-quality"),
)
def q63f_block_census_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH block census — the data-quality report that makes degenerate
    blocks VISIBLE before the pair join runs (VERDICT r13 #3): the ten
    largest band buckets with member count, a representative doc, the
    closed-form pair mass C(n,2) the bucket would put on the join, and
    the over-cap flag at DEGENERATE_BLOCK_CAP (= the exact boundary
    where salted_block_self_join's grid ceiling leaves cells above
    PAIR_CELL_TARGET). At 100 TB this census is the cheap first pass —
    one count per bucket on the banding shuffle the dedup needs anyway
    — that tells the pipeline owner whether to run q47 as-is, switch to
    the capped pass (q63g), or fix the corpus upstream. Fully
    hash-checked: counts, representatives, and the flag are exact
    integer arithmetic in both engines, top-10 totally ordered."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    _, bands = minhash_bands(docs)
    return (
        bands.groupBy("band_id", "band_key")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("doc_id").alias("representative"),
        )
        .select(
            "band_id",
            "band_key",
            "n_members",
            "representative",
            F.expr("CAST(n_members * (n_members - 1) DIV 2 AS BIGINT)").alias(
                "block_pairs"
            ),
            (F.col("n_members") > DEGENERATE_BLOCK_CAP).alias("is_degenerate"),
        )
        .orderBy(F.desc("n_members"), "band_id", "band_key")
        .limit(10)
    )


@register(
    "q63g_dedup_degenerate_capped",
    oracle=_minhash_oracle(bucket_cap=DEGENERATE_BLOCK_CAP),
    tags=("dedup", "minhash", "data-quality", "degenerate-filter"),
)
def q63g_dedup_degenerate_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q47's near-dup pass with the degenerate-block filter upstream of
    candidate generation (VERDICT r13 #3, remedy option B): band buckets
    over DEGENERATE_BLOCK_CAP members contribute NO candidate pairs —
    their C(k,2) mass is excluded by policy instead of ground through
    the grid — and the skew-hardened salted join handles everything
    kept. On a clean corpus the output equals q47's exactly (no bucket
    is near the cap at any test scale — the oracle mirrors the cap, so
    the equality is hash-checked, and the planted-mega pytest pins the
    divergence case); on a boilerplate-polluted corpus the excluded
    blocks are exactly the census rows q63f flags. The recall loss is
    the DOCUMENTED intent: members of a 128k+ bucket are wholesale
    near-identical — the owner keeps q63f's representative and drops
    the rest, O(k) instead of O(k²)."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    shingled, bands = minhash_bands(docs)
    kept, _ = degenerate_block_filter(bands)
    pairs = banded_pairs_salted(kept).distinct()
    return _jaccard_verify(shingled, pairs)


SIMHASH_BITS = 16


@register(
    "q48_simhash",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS token FROM documents
    ), hashed AS (
        SELECT doc_id, {sql_hash60('token')} AS hv FROM tok
    ), bits AS (
        SELECT doc_id,
               {", ".join(
                   f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS c{b}"
                   for b in range(SIMHASH_BITS)
               )}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({" + ".join(f"(CASE WHEN c{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS))}
                AS BIGINT) AS simhash
    FROM bits
    """,
    tags=("dedup", "simhash"),
)
def q48_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from token-hash bit votes. Documents with
    equal/near signatures are near-dup candidates; Hamming-distance pairing
    is a self-join on signature prefixes at scale."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    hv = hash60(F.col("token"))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(hv, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"c{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"c{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.cast("bigint").alias("simhash"))


NGRAM_SHINGLE_N = 2
NGRAM_JACCARD_THRESHOLD = 0.35


def _ngram_jaccard_oracle() -> str:
    """Shared by q49 (plain block join) and q49b (salted grid): the salted
    path's output is identical by construction, so one oracle hash-checks
    both."""
    return f"""
    WITH sh AS (
        SELECT doc_id, source, CAST(floor(n_chars / 50) AS BIGINT) AS len_bucket,
               {sql_word_shingles(sql_tokens('text'), NGRAM_SHINGLE_N)} AS shingles
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(list_distinct(a.shingles || b.shingles)) AS jaccard
    FROM sh a JOIN sh b
      ON a.source = b.source AND a.len_bucket = b.len_bucket
     AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(list_distinct(a.shingles || b.shingles)) >= {NGRAM_JACCARD_THRESHOLD}
    """


@register(
    "q49_ngram_jaccard_blocked",
    oracle=_ngram_jaccard_oracle(),
    tags=("dedup", "jaccard"),
)
def q49_ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairwise n-gram Jaccard: candidate pairs restricted to the
    same (source, length-bucket) block, bounding the quadratic comparison —
    the classic pre-LSH dedup baseline. This is the PLAIN block join (pair
    work within a block lands on one reducer); q49b is the skew-hardened
    twin for corpora where one source × length bucket dominates."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    # localCheckpoint (q49b already does this): the self-join otherwise
    # re-evaluates the lazy tokenize+shingle construction per joined PAIR
    # on both sides — measured 4.2 s -> ~1.5 s at sf0.1 (round 9).
    sh = _ngram_blocked_shingles(docs).localCheckpoint(eager=True)
    sh = pinned(sh, "source", "len_bucket")  # explosive-join guard (see partitioning.pinned)
    a = sh.alias("a")
    b = sh.alias("b")
    jaccard = F.size(F.array_intersect("a.shingles", "b.shingles")).cast("double") / F.size(
        F.array_union("a.shingles", "b.shingles")
    )
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jaccard.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD)
    )


def _ngram_blocked_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, source, len_bucket, shingles) blocking frame shared by
    q49/q49b."""
    return docs.select(
        "doc_id",
        "source",
        F.floor(F.col("n_chars") / 50).cast("bigint").alias("len_bucket"),
        tokens("text").alias("toks"),
    ).select(
        "doc_id",
        "source",
        "len_bucket",
        shingles_from(F.col("toks"), NGRAM_SHINGLE_N).alias("shingles"),
    )


@register(
    "q49b_ngram_jaccard_salted",
    oracle=_ngram_jaccard_oracle(),
    tags=("dedup", "jaccard", "skew"),
)
def q49b_ngram_jaccard_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened q49: byte-identical blocked-Jaccard output (it shares
    q49's oracle, so the equivalence is hash-checked by the driver), with
    hot (source, len_bucket) blocks spread over a reducer grid via the
    generalized :func:`salted_block_self_join` — the same 1-bucket-theta
    fragment replication that q47b applies to LSH buckets.

    Candidate generation carries only (doc_id, source, len_bucket); the
    shingle arrays join back in the verification step, so hot-path row
    replication never replicates the (wide) shingle payload. The
    adversarial hot-block equivalence and the no-forced-broadcast plan are
    pinned by tests/test_pipeline.py and tests/test_plans.py."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    # localCheckpoint (not persist): materializes the shingle frame once
    # for its two consumers AND lets the ContextCleaner reclaim the blocks
    # when the frame is garbage-collected — a bare persist() here leaked
    # cached partitions across repeated invocations (bench runs 3x, the
    # driver re-runs the whole registry) for the session's lifetime.
    sh = _ngram_blocked_shingles(docs).localCheckpoint(eager=True)
    pairs = salted_block_self_join(sh, ("source", "len_bucket"), id_col="doc_id")
    return _jaccard_verify(
        sh.select("doc_id", "shingles"), pairs, threshold=NGRAM_JACCARD_THRESHOLD
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph by iterative
    label propagation: every node repeatedly adopts the smallest label in
    its neighborhood until fixpoint. Converges in O(diameter) rounds —
    near-dup clusters are tiny and dense, so a handful of iterations.

    Each iteration is two shuffles (join + min-agg) and exactly two jobs:
    the eager localCheckpoint that materializes the new labels (and
    truncates lineage), then a convergence probe that scans ONLY the
    checkpointed result for any row whose label changed — the old label
    rides along as a column, so no second join against the previous
    labels frame is launched (that extra per-iteration join was real
    money on a 100 TB graph). The loop is driver-coordinated but all
    data stays distributed. Returns (node, component) with component =
    min doc_id of the cluster. ``stats`` (optional) receives
    {"iterations": n} for the job-count test."""
    # edges materialized ONCE (r16, VERDICT r15 #5 profiling): every
    # round's neighbor-min join consumes `edges`, and without the
    # checkpoint each round re-ran the whole upstream pair pipeline —
    # for q57/q63c that is q47's signature/banding self-join + Jaccard
    # verify per round (the shingle checkpoint capped it, but the
    # sig/band/verify recompute was still the bulk of the measured
    # q57/q63c cost — isolated min-of-3 at sf0.1: q57 3.93 -> 2.63 s,
    # q63c 4.45 -> 2.89 s). One extra job, lineage truncated for the
    # whole loop.
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    iterations = 0
    converged = False
    for _ in range(20):  # diameter bound; near-dup clusters converge fast
        iterations += 1
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("neighbor_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
        changed = (
            updated.filter(F.col("component") != F.col("__old")).limit(1).count()
        )
        labels = updated.select("node", "component")
        if changed == 0:
            converged = True
            break
    if not converged:
        # Min-label propagation needs O(diameter) rounds; silently
        # returning the capped labels would be WRONG on high-diameter
        # graphs (a 41-node path under a 20-round cap mislabels half the
        # nodes — caught by the q57d equivalence test). Fail loudly and
        # point at the O(log n) algorithm instead.
        raise RuntimeError(
            "connected_components did not converge within 20 rounds — "
            "graph diameter exceeds the label-propagation budget; use "
            "two_phase_connected_components (large-star/small-star, "
            "O(log n) rounds) for high-diameter graphs"
        )
    if stats is not None:
        stats["iterations"] = iterations
    return labels


def _cc_oracle() -> str:
    """Recursive-CTE transitive-closure components over the MinHash pair
    graph — shared VERBATIM by q57 (label propagation) and q57d
    (alternating large-star/small-star): two different distributed CC
    algorithms must produce the identical component census."""
    return f"""
    WITH RECURSIVE {_minhash_ctes()},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM verified
        UNION
        SELECT doc_b, doc_a FROM verified
    ),
    reach(node, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.label
        FROM edges e JOIN reach r ON e.dst = r.node
    ),
    comp AS (
        SELECT node, MIN(label) AS component FROM reach GROUP BY node
    )
    SELECT component,
           COUNT(*) AS cluster_size,
           MIN(node) AS canonical_doc_id,
           MAX(node) AS max_doc_id
    FROM comp
    GROUP BY component
    """


@register(
    "q57_neardup_clusters",
    oracle=_cc_oracle(),
    tags=("dedup", "clusters", "iterative"),
)
def q57_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: MinHash candidate pairs → connected
    components → one canonical doc per cluster. The keep/drop decision of
    a dedup pass (keep component representative, drop the rest).

    The engine side is iterative label propagation
    (:func:`connected_components` — O(diameter) distributed rounds with
    lineage truncation); the oracle expresses the same fixpoint as a
    DuckDB ``WITH RECURSIVE`` transitive closure: every node's component
    is the MIN label over its reachability set, which on a symmetric edge
    relation is exactly the min doc_id of its connected component. The
    recursive UNION deduplicates, so the closure terminates. sf0.01
    near-dup graphs are tiny and sparse; the quadratic closure is oracle
    machinery only, never the engine path. tests/test_pipeline.py
    additionally verifies components against a driver-side union-find."""
    prep(spark)
    pairs = q47_minhash_neardup(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("node").alias("canonical_doc_id"),
        F.max("node").alias("max_doc_id"),
    )


# PageRank over the near-dup similarity graph: 3 power iterations in
# exact BIGINT fixed-point (rank scaled by 1e7; damping 0.85 applied as
# (x * 17) DIV 20; per-edge contribution r DIV deg). Integer division
# and integer sums are bit-identical in every engine and order-
# independent, so an ITERATIVE numeric algorithm becomes fully
# hash-checkable — the same trick as q53c's fixed-point BM25, extended
# to a multi-round fixpoint.
PAGERANK_ITERS = 3
PAGERANK_SCALE = 10_000_000
_PR_BASE = PAGERANK_SCALE * 15 // 100  # (1 - d) * scale, exact


def _pagerank_sql() -> str:
    it_prev = "r0"
    its = []
    for i in range(1, PAGERANK_ITERS + 1):
        its.append(
            f"""it{i} AS (
        SELECT e.dst AS node,
               {_PR_BASE} + CAST((SUM(r.r_fp // d.deg) * 17) // 20 AS BIGINT)
                   AS r_fp
        FROM edges e
        JOIN deg d ON e.src = d.src
        JOIN {it_prev} r ON e.src = r.node
        GROUP BY e.dst
    )"""
        )
        it_prev = f"it{i}"
    return f"""
    WITH {_minhash_ctes()}, edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM verified
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM verified
    ), deg AS (
        SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
    ), r0 AS (
        SELECT src AS node, CAST({PAGERANK_SCALE} AS BIGINT) AS r_fp FROM deg
    ), {", ".join(its)}
    SELECT r.node AS doc_id, d.deg AS degree, r.r_fp AS rank_fp
    FROM {it_prev} r JOIN deg d ON r.node = d.src
    """


@register("q57b_pagerank", oracle=_pagerank_sql(), tags=("dedup", "graph", "pagerank"))
def q57b_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the MinHash near-dup graph — the
    generic iterative-graph-algorithm primitive (q57's label propagation
    specialized to components; this is the weighted-importance variant
    used to pick the most-connected canonical document of a dup family,
    or to rank pages by link authority in a crawl): symmetric edges from
    q47's verified pairs, then {PAGERANK_ITERS} power iterations of
    r' = 0.15 + 0.85 * sum(r_in / deg).

    Determinism: ranks live in BIGINT fixed-point (scale 1e7); each
    neighbor contribution is an exact integer division r DIV deg, the
    damping factor is (x*17) DIV 20, and per-node sums are exact-integer
    and order-independent — so a multi-round iterative fixpoint is fully
    hash-checked against the oracle's unrolled CTE chain.

    100 TB shape: per iteration ONE shuffle (contributions grouped by
    destination, map-side combinable); the edge list with degrees is
    localCheckpointed once and reused by every round (q57's
    lineage-truncation pattern); a production run replaces the unrolled
    loop with convergence-tested rounds, same per-round plan."""
    prep(spark)
    pairs = q47_minhash_neardup(spark, sf_dir).select("doc_a", "doc_b")
    return pagerank_fixed_point(pairs)


def pagerank_fixed_point(pairs: DataFrame, iters: int = PAGERANK_ITERS) -> DataFrame:
    """(doc_id, degree, rank_fp) fixed-point PageRank over an undirected
    (doc_a, doc_b) pair frame — the q57b core, exposed for the exact
    pure-Python cross-check test."""
    # materialize the pair frame once: both edge directions consume it,
    # and without this the whole upstream pipeline (for q57b: the full
    # MinHash candidate+verify DAG) is planned twice under the unionAll
    pairs = pairs.localCheckpoint(eager=True)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg): the iteration-invariant adjacency, materialized once
    adj = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(PAGERANK_SCALE).cast("bigint").alias("r_fp")
    )
    for _ in range(iters):
        contribs = adj.join(ranks, adj.src == ranks.node).select(
            "dst", F.expr("r_fp DIV deg").alias("c")
        )
        ranks = contribs.groupBy(F.col("dst").alias("node")).agg(
            (F.lit(_PR_BASE) + F.expr("(SUM(c) * 17) DIV 20")).alias("r_fp")
        )
    return ranks.join(deg, ranks.node == deg.src).select(
        F.col("node").alias("doc_id"),
        F.col("deg").alias("degree"),
        F.col("r_fp").alias("rank_fp"),
    )


@register("q58_ml_minhash_lsh", oracle=None, tags=("dedup", "minhash", "ml"))
def q58_ml_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark ML's MinHashLSH (SURVEY.md §2B's mapped primitive) as the
    library-backed near-dup path: shingles → binarized HashingTF vectors →
    seeded MinHashLSH → approxSimilarityJoin on Jaccard distance. Fixed
    seed keeps output stable; rows-only driver check (Spark ML's internal
    hash family is not reproducible in SQL) — tests cross-check overlap
    with the hand-rolled q47 pipeline."""
    prep(spark)
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load(spark, sf_dir, "documents")
    # localCheckpoint: approxSimilarityJoin self-joins feats, which would
    # otherwise re-run the lazy tokenize+shingle+HashingTF lineage on both
    # join sides and inside the hash-explode (measured 16.0 s -> 3.1 s at
    # sf0.1, round 9 — the Generate-inlining finding applied to the ML
    # pipeline's own explode).
    shingled = widened(
        docs.select("doc_id", tokens("text").alias("toks"))
    ).select(
        "doc_id", shingles_from(F.col("toks"), SHINGLE_N).alias("shingles")
    ).localCheckpoint(eager=True)  # widened (r15): see partitioning.widened
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, threshold=1.0 - JACCARD_THRESHOLD, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            (1.0 - F.col("jaccard_dist")).alias("jaccard"),
        )
    )


LEV_PREFIX = 80  # compare normalized prefixes, bounding O(n·m) cost per pair
LEV_MAX = 20  # edit-distance acceptance threshold
BLOCK_PREFIX = 12  # blocking key: normalized 12-char prefix + language


def _fuzzy_oracle() -> str:
    """Blocked-Levenshtein oracle shared by q59 (plain block join) and
    q59b (salted block join) — the two must be byte-identical, so the
    shared oracle makes the driver hash-check that equivalence."""
    return f"""
    WITH canon AS (
        SELECT doc_id, lang,
               {sql_normalized('text')} AS norm
        FROM documents
    ), blocked AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(substr(a.norm, 1, {LEV_PREFIX}),
                           substr(b.norm, 1, {LEV_PREFIX})) AS edit_dist
        FROM canon a JOIN canon b
          ON a.lang = b.lang
         AND substr(a.norm, 1, {BLOCK_PREFIX}) = substr(b.norm, 1, {BLOCK_PREFIX})
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(edit_dist AS INT) AS edit_dist
    FROM blocked
    WHERE edit_dist <= {LEV_MAX}
    """


@register(
    "q59_fuzzy_match_levenshtein",
    oracle=_fuzzy_oracle(),
    tags=("dedup", "fuzzy", "levenshtein"),
)
def q59_fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: edit-distance near-dup detection with a
    (lang, normalized-prefix) blocking key so the quadratic levenshtein
    only runs inside small candidate blocks — the classic record-linkage
    decomposition. Scale: the block join is an equi-join (shuffles on the
    block key, no cross product); prefix truncation bounds the per-pair
    DP cost at {LEV_PREFIX}² regardless of document length.

    Skew audit (r7): the same hot-block hazard as q49 exists in principle
    (k docs sharing one {BLOCK_PREFIX}-char opening ⇒ k² pairs on one
    reducer), but the 12-char prefix key is far finer-grained than
    (source, len_bucket) and, unlike q49/q47, a hot block here means the
    docs are already near-identical — the pair OUTPUT is quadratic, not
    just the comparison work, so salting moves the bottleneck rather than
    removing it. For corpora with hot prefixes use q59b, which routes
    pair generation through :func:`salted_block_self_join` with
    ("lang", "block") and joins the prefixes back for the DP step."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    canon = docs.select("doc_id", "lang", normalized("text").alias("norm"))
    a = canon.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.substring("norm", 1, BLOCK_PREFIX).alias("block_a"),
        F.substring("norm", 1, LEV_PREFIX).alias("prefix_a"),
    )
    b = canon.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.substring("norm", 1, BLOCK_PREFIX).alias("block_b"),
        F.substring("norm", 1, LEV_PREFIX).alias("prefix_b"),
    )
    return (
        a.join(
            b,
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("block_a") == F.col("block_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("prefix_a", "prefix_b").cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= LEV_MAX)
    )


@register(
    "q59b_fuzzy_match_salted",
    oracle=_fuzzy_oracle(),
    tags=("dedup", "fuzzy", "levenshtein", "skew"),
)
def q59b_fuzzy_match_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened q59: byte-identical blocked-Levenshtein output (it
    shares q59's oracle, so the driver hash-checks the equivalence), with
    hot (lang, prefix) blocks spread over the reducer grid via
    :func:`salted_block_self_join` — exactly the routing q59's docstring
    prescribes, and the same recipe q49b applies to (source, len_bucket).

    Pair generation carries only (doc_id, lang, block); the LEV_PREFIX
    comparison prefixes join back at the verify step, so hot-block row
    replication never replicates the wide prefix payload, and the
    expensive part — the O(LEV_PREFIX²) Levenshtein DP per pair — runs
    grid²-ways parallel instead of on one straggler reducer. The pair
    OUTPUT of a hot block remains inherently quadratic (docs sharing a
    12-char opening are near-identical by construction); salting
    parallelizes the comparison work, which is the actual stage cost."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    canon = docs.select("doc_id", "lang", normalized("text").alias("norm"))
    blocked = canon.select(
        "doc_id", "lang", F.substring("norm", 1, BLOCK_PREFIX).alias("block")
    )
    prefixes = canon.select(
        "doc_id", F.substring("norm", 1, LEV_PREFIX).alias("prefix")
    )
    pairs = salted_block_self_join(blocked, ("lang", "block"), id_col="doc_id")
    return (
        pairs.join(
            prefixes.select(
                F.col("doc_id").alias("doc_a"), F.col("prefix").alias("prefix_a")
            ),
            "doc_a",
        )
        .join(
            prefixes.select(
                F.col("doc_id").alias("doc_b"), F.col("prefix").alias("prefix_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("prefix_a", "prefix_b").cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= LEV_MAX)
    )


@register(
    "q63c_dedup_pass",
    oracle=f"""
    WITH RECURSIVE {_minhash_ctes()},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM verified
        UNION
        SELECT doc_b, doc_a FROM verified
    ),
    reach(node, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    fpg AS (
        SELECT doc_id, lang, n_chars,
               md5({sql_normalized('text')}) AS fingerprint
        FROM documents
    ),
    exact_keep AS (
        SELECT doc_id, lang, n_chars FROM (
            SELECT doc_id, lang, n_chars,
                   MIN(doc_id) OVER (PARTITION BY fingerprint) AS canon
            FROM fpg
        ) WHERE doc_id = canon
    ),
    kept AS (
        SELECT k.* FROM exact_keep k
        WHERE NOT EXISTS (
            SELECT 1 FROM comp c WHERE c.node = k.doc_id AND c.component <> k.doc_id
        )
    ),
    keptagg AS (
        SELECT lang, COUNT(*) AS n_kept,
               CAST(SUM(n_chars) AS BIGINT) AS chars_kept
        FROM kept GROUP BY lang
    )
    SELECT t.lang,
           CAST(t.n_total AS BIGINT) AS n_total,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(k.chars_kept, 0) AS BIGINT) AS chars_kept
    FROM (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang) t
    LEFT JOIN keptagg k USING (lang)
    """,
    tags=("dedup", "pipeline", "clusters"),
)
def q63c_dedup_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone DEDUP PASS a training-data pipeline actually runs,
    composed end-to-end from verified pieces: exact dedup (q45's
    normalized fingerprint, keep min doc_id per group) ∩ near-dup dedup
    (q47's MinHash-verified pairs → q57's connected components, keep the
    component canonical) → per-language survivor census against the raw
    corpus. Fully hash-checked: the oracle replays the same fingerprint
    window, the same recursive-CTE transitive closure as q57, and the
    same NOT-EXISTS drop rule.

    Scale shape: one shuffle for the fingerprint window, the q47 banding
    pipeline (already skew-audited), O(diameter) label-propagation
    rounds, then a broadcast-friendly left-anti join of the (tiny) drop
    list against the survivors — nothing new beyond the verified parts,
    which is the point: composition adds no untested machinery."""
    from pyspark.sql import Window

    prep(spark)
    docs = load(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "lang", "n_chars", F.md5(normalized("text")).alias("fingerprint")
    )
    exact_keep = (
        fp.withColumn(
            "canon", F.min("doc_id").over(Window.partitionBy("fingerprint"))
        )
        .filter(F.col("doc_id") == F.col("canon"))
        .select("doc_id", "lang", "n_chars")
    )
    pairs = q47_minhash_neardup(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    drop = comp.filter(F.col("component") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    kept = exact_keep.join(drop, "doc_id", "left_anti")
    keptagg = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("chars_kept"),
    )
    totals = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    return totals.join(keptagg, "lang", "left").select(
        "lang",
        "n_total",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce("chars_kept", F.lit(0)).cast("bigint").alias("chars_kept"),
    )


CONTAM_SHINGLE_N = 5  # longer n-grams: contamination wants high precision

# Shared by q61 (raw shingle join) and q61b (bloom pre-pass): the bloom
# sketch has NO false negatives, so after exact verification both queries
# produce byte-identical output — one oracle serves both.
_CONTAM_ORACLE = f"""
    WITH tokenized AS (
        SELECT doc_id, {sql_normalized('text')} AS norm,
               {sql_tokens(sql_normalized('text'))} AS toks,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                    THEN 'train' ELSE 'eval' END AS split
        FROM documents
    ), shingled AS (
        SELECT doc_id, split,
               unnest({sql_word_shingles('toks', CONTAM_SHINGLE_N)}) AS shingle
        FROM tokenized
    )
    SELECT e.doc_id AS eval_doc,
           COUNT(DISTINCT t.doc_id) AS n_train_docs,
           COUNT(DISTINCT e.shingle) AS n_shared_shingles
    FROM shingled e
    JOIN shingled t ON e.shingle = t.shingle
    WHERE e.split = 'eval' AND t.split = 'train'
    GROUP BY e.doc_id
    """


@register(
    "q61_contamination_check",
    oracle=_CONTAM_ORACLE,
    tags=("dedup", "contamination", "eval"),
)
def q61_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination detection: hash-split the corpus (the q75
    rule collapsed to train vs eval), then find eval documents sharing
    {CONTAM_SHINGLE_N}-gram shingles with ANY training document — the
    benchmark-leakage audit every training pipeline must run. Scale: the
    shingle equi-join shuffles on the shingle string (the same blocked
    decomposition as the LSH pipelines — never a doc×doc product); at
    100 TB the train side would be a bloom/minhash sketch instead of raw
    shingles, with this exact query as the verification pass."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "b", "train"
    ).otherwise("eval")
    tokenized = docs.select(
        "doc_id",
        split.alias("split"),
        tokens(normalized("text")).alias("toks"),
    )
    # array-checkpoint before the explode (round-9 discipline, enforced
    # by scripts/lint.py; this frame also feeds both ev and tr branches)
    arrays = tokenized.select(
        "doc_id",
        "split",
        shingles_from(F.col("toks"), CONTAM_SHINGLE_N).alias("shingles"),
    ).localCheckpoint(eager=True)
    shingled = arrays.select(
        "doc_id", "split", F.explode("shingles").alias("shingle")
    )
    ev = shingled.filter(F.col("split") == "eval").select(
        F.col("doc_id").alias("eval_doc"), F.col("shingle")
    )
    tr = shingled.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), F.col("shingle")
    )
    return (
        ev.join(tr, "shingle")
        .groupBy("eval_doc")
        .agg(
            F.countDistinct("train_doc").alias("n_train_docs"),
            F.countDistinct("shingle").alias("n_shared_shingles"),
        )
    )


# -- bloom-sketch contamination pre-pass (the 100 TB train side) -----------

BLOOM_M_BITS = 1 << 22  # 4M bits = 64K words = 512 KiB bitmap
BLOOM_K = 3  # hash functions per shingle


def _bloom_positions(shingle_col) -> "F.Column":
    """K bit positions for one shingle: xxhash64 under K fixed salts,
    folded into [0, M). Same family on build and probe side."""
    return F.array(
        *[
            F.pmod(
                F.xxhash64(F.concat(F.lit(f"bloom{i}:"), shingle_col)),
                F.lit(BLOOM_M_BITS),
            )
            for i in range(BLOOM_K)
        ]
    )


def bloom_build(shingles: DataFrame, col: str = "shingle") -> DataFrame:
    """Distributed bloom-filter build: every shingle sets K bits; bits are
    grouped into 64-bit words and OR-folded with ``bit_or`` — a map-side-
    combinable aggregation whose output is AT MOST M/64 rows (65,536 here)
    no matter how many input shingles there are. That fixed-size output is
    the whole point: at 100 TB the train corpus compresses to a ~512 KiB
    (word_idx, mask) table that broadcasts to every executor."""
    return (
        shingles.select(F.explode(_bloom_positions(F.col(col))).alias("pos"))
        .groupBy(F.floor(F.col("pos") / 64).alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))")
            ).alias("mask")
        )
    )


def bloom_probe(candidates: DataFrame, bloom_words: DataFrame, col: str = "shingle") -> DataFrame:
    """Keep only rows whose shingle has ALL K bloom bits set. Bloom
    semantics: no false negatives (every truly-present shingle survives),
    tunable false positives (removed by the exact verify join downstream).
    The probe is a broadcast join on word_idx — no shuffle of the
    candidate side."""
    probed = (
        candidates.withColumn("__pos_arr", _bloom_positions(F.col(col)))
        .select("*", F.posexplode("__pos_arr").alias("__k", "__pos"))
        .drop("__pos_arr")
        .withColumn("__word_idx", F.floor(F.col("__pos") / 64))
        .join(
            F.broadcast(bloom_words.withColumnRenamed("word_idx", "__word_idx")),
            "__word_idx",
        )
        .filter(
            F.col("mask").bitwiseAND(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos, 64) AS INT))")
            )
            != 0
        )
    )
    group_cols = [c for c in candidates.columns]
    return (
        probed.groupBy(*group_cols)
        .agg(F.countDistinct("__k").alias("__k_hits"))
        .filter(F.col("__k_hits") == BLOOM_K)
        .drop("__k_hits")
    )


@register(
    "q61b_contamination_sketch",
    oracle=_CONTAM_ORACLE,
    tags=("dedup", "contamination", "bloom", "sketch"),
)
def q61b_contamination_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination detection with a bloom-sketch train side — the 100 TB
    shape q61's docstring promises, with q61 as its verification pass (the
    shared oracle hash-checks both).

    Pipeline: (1) the train corpus's shingles are folded into a fixed-size
    512 KiB bloom bitmap via a map-side-combinable ``bit_or`` aggregation
    (output ≤ 65,536 rows regardless of corpus size); (2) eval shingles are
    probed against the BROADCAST bitmap — only rows with all K bits set
    survive; (3) survivors (truly-shared shingles plus a tunable trickle of
    bloom false positives) hit the exact train-shingle join for
    verification. Because blooms have no false negatives, the final result
    is byte-identical to q61 — but the expensive eval-side shuffle into the
    verify join now carries only probable-contamination shingles instead of
    the whole eval corpus. At 100 TB: train side streams once through a
    fixed-memory aggregation, the bitmap broadcast replaces a shuffle of
    the (huge) eval side against the (huge) train side with a pre-filtered
    sliver join."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "b", "train"
    ).otherwise("eval")
    # Two disciplines from the round-9 profile (15.7 s -> ~2 s at sf0.1):
    # tokens() projected into a column BEFORE shingling — nesting
    # tokens(normalized(text)) inside shingles_from inlines the regex
    # split into the transform lambda, re-running it once per element_at
    # (O(n^2) splits per doc; the exact pitfall functions/text.py:53
    # documents) — and the array frame localCheckpointed before the
    # explode (the Generate-inlining finding, see ppjoin_candidates),
    # since it feeds BOTH the train and eval branches.
    arrays = docs.select(
        "doc_id", split.alias("split"), tokens(normalized("text")).alias("toks")
    ).select(
        "doc_id",
        "split",
        shingles_from(F.col("toks"), CONTAM_SHINGLE_N).alias("shingles"),
    ).localCheckpoint(eager=True)
    shingled = arrays.select(
        "doc_id", "split", F.explode("shingles").alias("shingle")
    )
    tr = shingled.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    ev = (
        shingled.filter(F.col("split") == "eval")
        .select(F.col("doc_id").alias("eval_doc"), "shingle")
        .distinct()
    )
    bloom = bloom_build(tr)
    survivors = bloom_probe(ev, bloom)
    return (
        survivors.join(tr, "shingle")
        .groupBy("eval_doc")
        .agg(
            F.countDistinct("train_doc").alias("n_train_docs"),
            F.countDistinct("shingle").alias("n_shared_shingles"),
        )
    )


# -- triangle counting ------------------------------------------------------

TRIANGLE_QTY_MIN = 45  # bulk-line threshold defining the co-supplier graph


@register(
    "q57c_triangle_count",
    oracle=f"""
    WITH lo AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        WHERE l_quantity >= {TRIANGLE_QTY_MIN}
    ), e AS (
        SELECT DISTINCT x.l_suppkey AS u, y.l_suppkey AS v
        FROM lo x JOIN lo y
          ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
    ), deg AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT u AS node FROM e UNION ALL SELECT v FROM e
        ) GROUP BY node
    ), tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), tn AS (
        SELECT node, COUNT(*) AS n_tri FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY node
    )
    SELECT d.node AS supp_key,
           CAST(d.degree AS BIGINT) AS degree,
           CAST(COALESCE(tn.n_tri, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN CAST(2 * COALESCE(tn.n_tri, 0) AS DOUBLE)
                     / (d.degree * (d.degree - 1))
                ELSE 0.0 END AS clustering_coeff
    FROM deg d LEFT JOIN tn ON tn.node = d.node
    """,
    tags=("graph", "triangles"),
)
def q57c_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    bulk-shipment co-supplier graph (suppliers sharing an order's >=45-qty
    lines) — the graph-analytics primitive behind community detection and
    near-dup cluster QA (a near-dup relation with few triangles relative
    to paths signals weak transitivity; q57's components + q57b's
    PageRank + this close out the graph toolbox).

    The ENGINE counts via degree-ordered edge orientation (Suri &
    Vassilvitskii 2011): every edge points from its lower-(degree, id)
    endpoint to the higher, making the orientation acyclic; each triangle
    then has exactly ONE node with two out-edges, so wedges built from
    co-oriented out-edge pairs close against a single oriented edge
    lookup. On a skewed graph this caps per-node wedge work at
    d_out² where d_out is bounded by ~sqrt(edges) for the hubs — the
    hub's quadratic blowup lands on its (many) low-degree neighbors
    instead — while the naive id-ordered join pays deg(hub)² on one
    node. The ORACLE deliberately uses the naive id-ordered 3-way join:
    same triangle set counted a provably different way, so the
    hash-match doubles as an algorithm-equivalence proof. Clustering
    coefficient stays exact: integer 2·tri and deg·(deg−1), one double
    division identical in both engines."""
    prep(spark)
    lo = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= TRIANGLE_QTY_MIN)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    x, y = lo.alias("x"), lo.alias("y")
    e = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .select(F.col("x.l_suppkey").alias("u"), F.col("y.l_suppkey").alias("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # Degree-ordered orientation: src = endpoint with smaller (degree, id).
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oe = (
        e.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
        )
    ).localCheckpoint(eager=True)  # reused 3x (two wedge legs + closing edge)
    # wedge join explodes on high-degree apexes while the edge list's
    # bytes stay small — pin its parallelism (see partitioning.pinned)
    oe_src = pinned(oe, "src")
    a, b = oe_src.alias("a"), oe_src.alias("b")
    wedge_order = (F.col("a.ddeg") < F.col("b.ddeg")) | (
        (F.col("a.ddeg") == F.col("b.ddeg")) & (F.col("a.dst") < F.col("b.dst"))
    )
    wedges = a.join(
        b, (F.col("a.src") == F.col("b.src")) & wedge_order
    ).select(
        F.col("a.src").alias("apex"),
        F.col("a.dst").alias("p"),
        F.col("b.dst").alias("q"),
    )
    closing = oe.select(F.col("src").alias("p"), F.col("dst").alias("q"))
    tri = wedges.join(closing, ["p", "q"])
    tn = (
        tri.select(F.col("apex").alias("node"))
        .unionAll(tri.select(F.col("p").alias("node")))
        .unionAll(tri.select(F.col("q").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0))
    return (
        deg.join(tn, "node", "left")
        .select(
            F.col("node").alias("supp_key"),
            F.col("degree").cast("bigint").alias("degree"),
            n_tri.cast("bigint").alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                (n_tri * 2).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def _canon_undirected(df: DataFrame, a: str = "src", b: str = "dst") -> DataFrame:
    """Canonical undirected edge set: (a < b) ordering, self-loops dropped,
    distinct."""
    return (
        df.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def two_phase_connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star edge
    rewrites (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the O(log n)-round algorithm for 100 TB graphs,
    vs :func:`connected_components`' O(diameter) label propagation (fine
    for shallow near-dup clusters, unbounded for path-shaped graphs).

    Per round, with m(v) = min of v's closed neighborhood:

    - large-star: every center v re-attaches its STRICTLY LARGER
      neighbors to m(v) — emit (u, m(v)) for u in N(v), u > v. Each
      undirected edge {x<y} is represented from center x, so
      connectivity is preserved while long chains halve.
    - small-star: every center v re-attaches its smaller-or-equal
      closed neighborhood to m(v) — emit (u, m(v)) for
      u in N(v) ∪ {v}, u <= v. The u = v case keeps every node attached
      to its current minimum (no orphaning).

    Both phases are one groupBy (min over neighborhood, map-side
    combinable) + one join + a projection — no windows, no driver-side
    graph state; the edge set is localCheckpointed per round to truncate
    lineage. Convergence = the canonical edge set reaches a fixpoint
    (then it IS a star forest rooted at each component's minimum), so
    labels fall out of one final neighborhood-min. Returns
    (node, component) exactly like :func:`connected_components`;
    q57d shares q57's recursive-CTE oracle, so the two algorithms'
    equivalence is hash-checked by the driver."""
    edges = _canon_undirected(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    ).localCheckpoint(eager=True)
    rounds = 0
    for _ in range(25):  # paper: O(log n) rounds; near-dup graphs need ~2-3
        rounds += 1
        sym = edges.select(F.col("a").alias("v"), F.col("b").alias("u")).union(
            edges.select(F.col("b").alias("v"), F.col("a").alias("u"))
        )
        m = (
            sym.groupBy("v")
            .agg(F.min("u").alias("mn"))
            .select("v", F.least(F.col("v"), F.col("mn")).alias("m"))
        )
        # large-star
        ls = (
            sym.join(m, "v")
            .filter(F.col("u") > F.col("v"))
            .select(F.col("u").alias("src"), F.col("m").alias("dst"))
        )
        mid = _canon_undirected(ls).localCheckpoint(eager=True)
        # small-star over the large-star result
        sym2 = mid.select(F.col("a").alias("v"), F.col("b").alias("u")).union(
            mid.select(F.col("b").alias("v"), F.col("a").alias("u"))
        )
        m2 = (
            sym2.groupBy("v")
            .agg(F.min("u").alias("mn"))
            .select("v", F.least(F.col("v"), F.col("mn")).alias("m"))
        )
        ss = (
            sym2.join(m2, "v")
            .filter(F.col("u") <= F.col("v"))
            .select(F.col("u").alias("src"), F.col("m").alias("dst"))
            .union(m2.select(F.col("v").alias("src"), F.col("m").alias("dst")))
        )
        new_edges = _canon_undirected(ss).localCheckpoint(eager=True)
        # ONE probe job per round (r15; was two): the union's limit(1)
        # short-circuits on the first differing row from either
        # direction, and both branches scan only the two checkpointed
        # edge frames — set equality iff both exceptAlls are empty,
        # exactly the two-job formulation's predicate.
        changed = (
            new_edges.exceptAll(edges)
            .unionByName(edges.exceptAll(new_edges))
            .limit(1)
            .count()
        )
        edges = new_edges
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    # fixpoint edge set is a star forest: component = min of closed
    # neighborhood for every node
    sym = edges.select(F.col("a").alias("node"), F.col("b").alias("u")).union(
        edges.select(F.col("b").alias("node"), F.col("a").alias("u"))
    )
    return (
        sym.groupBy("node")
        .agg(F.min("u").alias("mn"))
        .select("node", F.least(F.col("node"), F.col("mn")).alias("component"))
    )


@register(
    "q57d_cc_two_phase",
    oracle=_cc_oracle(),
    tags=("dedup", "clusters", "iterative", "two-phase"),
)
def q57d_cc_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q57's component census computed by the alternating large-star /
    small-star algorithm (:func:`two_phase_connected_components`) instead
    of label propagation: O(log n) rounds regardless of graph diameter —
    the difference between 3 and 60 driver-coordinated rounds on a
    path-shaped 100 TB graph. Shares q57's recursive-CTE oracle verbatim,
    so the driver hash-checks that both distributed algorithms produce
    the identical census; tests additionally pin equivalence on random
    graphs including long paths (where diameter >> log n)."""
    prep(spark)
    pairs = q47_minhash_neardup(spark, sf_dir).select("doc_a", "doc_b")
    comp = two_phase_connected_components(pairs)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("node").alias("canonical_doc_id"),
        F.max("node").alias("max_doc_id"),
    )


# ---------------------------------------------------------------------------
# Incremental (batch-vs-corpus) dedup — the shape a DAILY ingest actually runs
# ---------------------------------------------------------------------------
#
# q63c dedups a whole corpus in one pass; production pipelines almost never
# do that twice. Day N takes a small NEW batch and asks "which of these are
# already in the corpus (exactly or nearly)?" — the corpus side is a
# PRECOMPUTED index (fingerprints + MinHash band keys stored at ingest
# time), so daily cost is O(batch) work plus index lookups, never a fresh
# O(corpus) shingle pass. Here both sides derive from the same `documents`
# table via a deterministic md5 split so the oracle can replay the logic;
# the engine still computes the join the incremental way (batch bands
# probing corpus bands), which is the part whose shape matters at 100 TB.

_INCR_SPLIT_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'"


def _incremental_dedup_oracle() -> str:
    return f"""
    WITH {_minhash_ctes()},
    splitd AS (
        SELECT doc_id, lang, {_INCR_SPLIT_SQL} AS is_corpus FROM documents
    ), fps AS (
        SELECT doc_id, md5({sql_normalized('text')}) AS fp FROM documents
    ), exact_dropped AS (
        SELECT DISTINCT f.doc_id
        FROM fps f JOIN splitd s ON f.doc_id = s.doc_id
        WHERE NOT s.is_corpus AND EXISTS (
            SELECT 1 FROM fps f2 JOIN splitd s2 ON f2.doc_id = s2.doc_id
            WHERE s2.is_corpus AND f2.fp = f.fp
        )
    ), near_dropped AS (
        SELECT DISTINCT CASE WHEN sa.is_corpus THEN v.doc_b ELSE v.doc_a END AS doc_id
        FROM verified v
        JOIN splitd sa ON sa.doc_id = v.doc_a
        JOIN splitd sb ON sb.doc_id = v.doc_b
        WHERE sa.is_corpus <> sb.is_corpus
          AND CASE WHEN sa.is_corpus THEN v.doc_b ELSE v.doc_a END
              NOT IN (SELECT doc_id FROM exact_dropped)
    )
    SELECT s.lang,
           COUNT(*) AS n_batch,
           COUNT(e.doc_id) AS n_dropped_exact,
           COUNT(n.doc_id) AS n_dropped_near,
           COUNT(*) FILTER (WHERE e.doc_id IS NULL AND n.doc_id IS NULL) AS n_ingested
    FROM splitd s
    LEFT JOIN exact_dropped e ON e.doc_id = s.doc_id
    LEFT JOIN near_dropped n ON n.doc_id = s.doc_id
    WHERE NOT s.is_corpus
    GROUP BY s.lang
    """


@register(
    "q63d_incremental_dedup",
    oracle=_incremental_dedup_oracle(),
    tags=("dedup", "incremental", "minhash", "pipeline"),
)
def q63d_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: a new BATCH of documents is screened
    against the existing CORPUS — dropped if its normalized fingerprint
    already exists in the corpus (exact), else dropped if it MinHash-band
    collides with a corpus document and exact Jaccard verifies >= the q47
    threshold (near). Census per language: batch size, exact drops, near
    drops (among exact survivors), ingested.

    Incremental shape: candidate generation is batch-bands PROBING
    corpus-bands — a one-sided join whose cost is O(batch x bucket hit
    rate), not the q47 corpus self-join. At 100 TB the corpus fingerprint
    set and band index are materialized once at ingest time (they are
    exactly the frames named `corpus_fps` / `corpus_bands` here) and the
    daily job computes signatures only for the new batch; the md5 split
    below stands in for that storage boundary so DuckDB can replay both
    sides from one table. Exact-drop precedence (near-dedup only screens
    exact survivors) is pinned by the oracle's NOT IN.

    Oracle note: `verified` restricted to cross-split pairs equals the
    one-sided band probe — band co-occurrence and Jaccard are symmetric,
    so the all-pairs CTE loses nothing and the shared q47 CTE body stays
    the single source of truth.
    """
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    is_corpus = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "b"
    docs = docs.withColumn("is_corpus", is_corpus)

    shingled = (
        docs.select("doc_id", "is_corpus", tokens("text").alias("toks"))
        .select(
            "doc_id",
            "is_corpus",
            shingles_from(F.col("toks"), SHINGLE_N).alias("shingles"),
        )
        .localCheckpoint(eager=True)
    )
    sh = shingled.select("doc_id", "is_corpus", F.explode("shingles").alias("shingle"))
    hv = hash60(F.col("shingle")) % P
    sig = sh.groupBy("doc_id", "is_corpus").agg(
        *[
            F.min((F.lit(a) * hv + F.lit(b)) % P).alias(f"sig_{j}")
            for j, (a, b) in enumerate(MINHASH_PERMS)
        ]
    )
    bands = band_keys(sig.drop("is_corpus"), "doc_id").join(
        sig.select("doc_id", "is_corpus"), "doc_id"
    )
    corpus_bands = bands.filter(F.col("is_corpus")).select(
        F.col("doc_id").alias("corpus_id"), "band_id", "band_key"
    )
    batch_bands = bands.filter(~F.col("is_corpus")).select(
        F.col("doc_id").alias("batch_id"), "band_id", "band_key"
    )
    # One-sided probe: batch bands against the corpus band index.
    cand = (
        batch_bands.join(corpus_bands, ["band_id", "band_key"])
        .select(F.col("batch_id").alias("doc_a"), F.col("corpus_id").alias("doc_b"))
        .distinct()
    )
    verified = _jaccard_verify(shingled.drop("is_corpus"), cand)
    near_ids = verified.select(F.col("doc_a").alias("doc_id")).distinct()

    fps = docs.select(
        "doc_id", "is_corpus", F.md5(normalized("text")).alias("fp")
    )
    corpus_fps = fps.filter(F.col("is_corpus")).select("fp").distinct()
    batch = docs.filter(~F.col("is_corpus")).select("doc_id", "lang")
    exact_ids = (
        fps.filter(~F.col("is_corpus"))
        .join(corpus_fps, "fp", "left_semi")
        .select("doc_id")
    )
    near_dropped = near_ids.join(exact_ids, "doc_id", "left_anti")

    flagged = (
        batch.join(exact_ids.withColumn("e", F.lit(1)), "doc_id", "left")
        .join(near_dropped.withColumn("n", F.lit(1)), "doc_id", "left")
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.count("e").alias("n_dropped_exact"),
        F.count("n").alias("n_dropped_near"),
        F.sum(
            F.when(F.col("e").isNull() & F.col("n").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_ingested"),
    )


# ---------------------------------------------------------------------------
# All-pairs sparse cosine similarity with prefix filtering
# ---------------------------------------------------------------------------
# Threshold t as an exact rational so the accept test is pure integer
# arithmetic: cos >= num/den  <=>  den^2 * dot^2 >= num^2 * |a|^2 * |b|^2
# (dot >= 0 since tf weights are non-negative).
ALLPAIRS_T_NUM = 1
ALLPAIRS_T_DEN = 2
# Engine-side slack absorbing float error in the (double) prefix bound.
# Only ever ENLARGES the candidate set — output exactness is unaffected.
ALLPAIRS_PREFIX_EPS = 1e-9
# ONE expression string evaluated by F.expr and inlined in the oracle:
# identical parse tree => identical IEEE rounding on both engines (the
# inputs are exact BIGINTs, sqrt/mul/div are correctly rounded).
_ALLPAIRS_COSINE = "dot_ab / sqrt(CAST(norm2_a AS DOUBLE) * norm2_b)"


def _allpairs_oracle() -> str:
    grams = sql_raw_word_shingles("ts", SHINGLE_N)
    n2, d2 = ALLPAIRS_T_NUM**2, ALLPAIRS_T_DEN**2
    return f"""
    WITH tok AS (
        SELECT doc_id, {sql_tokens("text")} AS ts FROM documents
    ), grams AS (
        SELECT doc_id, unnest({grams}) AS g FROM tok
    ), tf AS (
        SELECT doc_id, g, COUNT(*) AS w FROM grams GROUP BY doc_id, g
    ), nrm AS (
        SELECT doc_id, SUM(w * w) AS n2 FROM tf GROUP BY doc_id
    ), dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
        FROM tf a JOIN tf b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, dot_ab, norm2_a, norm2_b,
           {_ALLPAIRS_COSINE} AS cosine_sim
    FROM (
        SELECT doc_a, doc_b, CAST(dot AS BIGINT) AS dot_ab,
               CAST(na.n2 AS BIGINT) AS norm2_a, CAST(nb.n2 AS BIGINT) AS norm2_b
        FROM dots
        JOIN nrm na ON na.doc_id = doc_a
        JOIN nrm nb ON nb.doc_id = doc_b
        WHERE {d2} * dot * dot >= {n2} * na.n2 * nb.n2
    )
    """


def shingle_tf(
    docs: DataFrame, spill_safe: bool = False, pins: list | None = None
) -> DataFrame:
    """(doc_id, g, w): term-frequency sparse vectors over word
    {SHINGLE_N}-gram shingles WITH multiplicity (contrast minhash_signature,
    which wants the distinct shingle *set*).

    The shingle-ARRAY frame is localCheckpointed before the explode:
    codegen inlines a Generate's child, so exploding the LAZY HOF would
    re-run the tokenize+shingle construction once per output row (the
    q49c finding — see ppjoin_candidates). This is NOT the post-explode
    tf checkpoint that the round-8 A/B measured as a loss: the array
    frame is |docs| rows, its materialization costs ~0.5 s at sf0.1, and
    q55c's six tf branches each re-run only the cheap explode+hash-agg."""
    tf, _ = shingle_tf_with_census(docs, spill_safe, pins)
    return tf


def shingle_tf_with_census(
    docs: DataFrame, spill_safe: bool = False, pins: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """(tf, gram_counts): :func:`shingle_tf` plus the per-gram document
    frequency ``(g, __rn)`` — exactly ``tf.groupBy(g).count()`` (tf has
    one row per (doc, g)), but derived from the CHECKPOINTED array frame
    via ``explode(array_distinct(gs))``, which partial-aggregates to
    vocabulary size on the map side and shuffles only the tiny census
    frame. Computing the same census through tf costs the full
    (doc_id, g) exchange first — that extra pass was the hot-feature
    prescreen's ~+2 s tax on every clean-corpus q55c run (VERDICT r14
    #4); this census makes the prescreen pay one cheap vocab shuffle
    instead."""
    tf, gram_counts, _arrays = _shingle_tf_census_arrays(docs, spill_safe, pins)
    return tf, gram_counts


def _shingle_tf_census_arrays(
    docs: DataFrame, spill_safe: bool = False, pins: list | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(tf, gram_counts, arrays): :func:`shingle_tf_with_census` plus the
    CHECKPOINTED shingle-array frame itself — |docs| rows, the cheapest
    place to read per-doc distinct-gram counts
    (``size(array_distinct(gs))``) without paying the full (doc_id, g)
    tf exchange. The grouped operator's bound prescreen (r16) reads
    max-m from it."""
    # widened (r15): the shingle construction is the heavy map over a
    # possibly one-partition small-corpus scan (partitioning.widened)
    toks = widened(docs.select("doc_id", tokens("text").alias("toks")))
    arrays = _content_checkpoint(
        toks.select(
            "doc_id", raw_shingles_from(F.col("toks"), SHINGLE_N).alias("gs")
        ),
        spill_safe,
        pins,
    )
    tf = (
        arrays.select("doc_id", F.explode("gs").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    gram_counts = (
        arrays.select(F.explode(F.array_distinct("gs")).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("__rn"))
    )
    return tf, gram_counts, arrays


def salted_hot_feature_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_salt: str,
    r_salt: str,
    threshold: int = PAIR_CELL_TARGET,
    left_subset_of_right: bool = False,
    right_counts: DataFrame | None = None,
    right_max: int | None = None,
) -> DataFrame:
    """``left.join(right, key)`` with hot keys fragment-replicated over a
    per-key 2D grid — the bipartite generalization of
    :func:`salted_block_self_join` (r14, the last boiler straggler).

    Prefix filtering guarantees hot features never become join keys on a
    NORMAL corpus (rarest-first prefixes), but a template group breaks
    the premise: the rarest grams of a template doc are shared by its
    whole k-member group, so the candidate join's gram key carries
    |prefix_g| x |tf_g| ≈ k² hits on one reducer (measured at boiler3:
    3.4-3.6 max/median task ratio in the candidate stage — the residual
    the r13 verdict attributed to the verify chunks). Census: one count
    per key on each side; keys with row-product > ``threshold`` get the
    smallest power-of-two grid g with product/g² <= threshold (capped
    like the self-join grid, incl. the session-parallelism cap) — a left
    row lands in cells (h(l_salt), *), a right row in (*, h(r_salt)), so
    every cross pair meets exactly once and each side replicates g times
    (g ≈ k/sqrt(threshold): 8 for a 3k-member template group). Cold keys
    take the plain join; when the census finds no hot key at all the
    plain join is returned UNCHANGED (driver-side branch, the k_max
    precedent) so normal corpora pay only the census aggregate. Output
    row set is exactly the plain join's — purely physical, every oracle
    unchanged.

    ``left_subset_of_right``: declare that left's rows per key are a
    subset of right's (true for a prefix index vs its postings). Then
    product <= rn², and one CHEAP aggregate over the right side decides
    hotness-at-all — crucial when the left side is expensive to compute
    (the prefix frame re-runs a corpus window; the r14 bench caught the
    unscreened census pricing q55c at 3x on hot-free corpora just to
    COUNT that frame).

    ``right_counts``: precomputed ``right.groupBy(key).count()`` as
    ``(key, __rn)`` — r15, VERDICT r14 #4. The caller often has (or can
    derive) this census far cheaper than a fresh groupBy over the
    postings (shingle_tf_with_census folds it to vocabulary size on the
    map side); threading it in removes the census pass that taxed every
    clean-corpus q55c run. Must be EXACTLY the right frame's per-key
    row count — both the prescreen and the grid sizing read it.

    ``right_max``: precomputed ``max(__rn)`` (r16). The grouped bound
    prescreen already folds the per-gram census into one driver action;
    passing its max here removes the prescreen's own ``rc.agg(max)``
    action — the last extra job the bound path paid over the monolith.
    Must equal the exact max per-key right count; None keeps the
    self-computed census action."""
    rc = (
        right_counts
        if right_counts is not None
        else right.groupBy(key).agg(F.count(F.lit(1)).alias("__rn"))
    )
    if left_subset_of_right:
        rmax = (
            int(right_max)
            if right_max is not None
            else int(rc.agg(F.max("__rn")).first()[0] or 0)
        )
        if rmax * rmax <= threshold:
            # pinned: the join's OUTPUT (sharing pairs) dwarfs its input
            # bytes, and AQE sizes the stage by shuffle-read bytes — a
            # few-MB candidate exchange coalesces to single-digit tasks
            # that then each compute millions of join hits (measured
            # r15: q55c's 46M-hit candidate join ran on 6 tasks, 13 s
            # apiece, the whole 2-24 s q55c variance). Same guard as
            # every other pair-generating join (see partitioning.pinned).
            return pinned(left, key).join(right, key)
    lc = left.groupBy(key).agg(F.count(F.lit(1)).alias("__ln"))
    census = lc.join(rc, key).filter(
        F.col("__ln") * F.col("__rn") > F.lit(threshold)
    )
    cap = _parallelism_grid_cap(
        left.sparkSession.sparkContext.defaultParallelism
    )
    # per-key grid: smallest power-of-two g with ln*rn <= threshold*g²
    ceiling = min(PAIR_GRID_MAX, max(PAIR_GRID, cap))
    prod = F.col("__ln") * F.col("__rn")
    g_expr = None
    g = PAIR_GRID
    while True:
        cond = prod <= F.lit(threshold) * F.lit(g * g)
        g_expr = (
            F.when(cond, F.lit(g)) if g_expr is None else g_expr.when(cond, F.lit(g))
        )
        if g >= ceiling:
            break
        g *= 2
    hot = census.select(key, g_expr.otherwise(F.lit(ceiling)).cast("long").alias("__g"))
    if not hot.limit(1).count():
        return pinned(left, key).join(right, key)

    l_tag = left.join(hot, key, "left")
    r_tag = right.join(hot, key, "left")
    cold = pinned(l_tag.filter(F.col("__g").isNull()).drop("__g"), key).join(
        r_tag.filter(F.col("__g").isNull()).drop("__g"), key
    )
    cells = F.sequence(F.lit(0).cast("long"), F.col("__g") - F.lit(1).cast("long"))
    l_h = (
        l_tag.filter(F.col("__g").isNotNull())
        .withColumn("__row", F.pmod(F.xxhash64(F.col(l_salt)), F.col("__g")))
        .withColumn("__col", F.explode(cells))
        .drop("__g")
    )
    r_h = (
        r_tag.filter(F.col("__g").isNotNull())
        .withColumn("__col", F.pmod(F.xxhash64(F.col(r_salt)), F.col("__g")))
        .withColumn("__row", F.explode(cells))
        .drop("__g")
    )
    keys_and_cells = [key, "__row", "__col"]
    joined = (
        pinned(l_h, *keys_and_cells)
        .join(r_h, keys_and_cells)
        .drop("__row", "__col")
    )
    return cold.unionByName(joined.select(*cold.columns))


def allpairs_candidates(
    tf: DataFrame,
    nrm: DataFrame,
    gram_counts: DataFrame | None = None,
    split_verify: bool = False,
    gram_max: int | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Prefix-filtered candidate pairs (doc_a < doc_b): a SUPERSET of all
    pairs with cosine >= t, generated without ever joining on a hot
    feature (steps 1-3 of :func:`allpairs_cosine`'s docstring).

    ``gram_counts``: optional precomputed per-gram df census
    (see :func:`shingle_tf_with_census`) forwarded to the hot-feature
    prescreen so it skips its own postings aggregate (VERDICT r14 #4).

    ``gram_max`` (r16): precomputed ``max(df)`` over the gram census,
    forwarded to the prescreen so it skips its own max action entirely
    (the grouped bound prescreen computes it as a byproduct of the same
    fused job). Must be the exact max or None.

    ``split_verify`` (r15, the PPJoin positional-sum idea applied to
    Bayardo): return ``(cand, suffix)`` where cand carries ``dot_p`` —
    the EXACT partial dot over prefix(a)-shared grams, folded for free
    into the aggregation that deduplicated the join hits — and
    ``suffix`` is the complementary (doc_id, g, w) posting frame. The
    verify stage then re-joins candidates against SUFFIX postings only
    (dot = dot_p + suffix dot): the pair-gram fan-out drops by the
    prefix fraction (~3.4x at sf0.1 — prefixes are ~70% of each doc
    under the maxw bound), while every emitted number stays
    integer-exact. Default False keeps the legacy bare-candidate frame
    for the experiment scripts and chunk-equality tests."""
    from pyspark.sql import Window

    t = ALLPAIRS_T_NUM / ALLPAIRS_T_DEN
    tfn = tf.join(nrm, "doc_id").withColumn(
        "wn", F.col("w") / F.sqrt(F.col("n2").cast("double"))
    )
    stats = tfn.groupBy("g").agg(
        F.count(F.lit(1)).alias("df"), F.max("wn").alias("maxw")
    )
    w_ord = (
        Window.partitionBy("doc_id")
        .orderBy(F.desc("df"), F.asc("g"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = tfn.join(F.broadcast(stats), "g").withColumn(
        "cum", F.sum(F.col("wn") * F.col("maxw")).over(w_ord)
    )
    prefix = ranked.filter(F.col("cum") >= t - ALLPAIRS_PREFIX_EPS).select(
        F.col("doc_id").alias("doc_a"), "g", F.col("w").alias("wa")
    )
    # Hot-feature-salted candidate join (r14): on a template-group corpus
    # the rarest grams of a doc are group-shared, so this gram-keyed join
    # is where the prefix filter's skew-kill premise fails — see
    # salted_hot_feature_join. Plain join on normal corpora (driver-side
    # empty-hot-census branch).
    hits = salted_hot_feature_join(
        prefix,
        tf.select(F.col("doc_id").alias("doc_b"), "g", F.col("w").alias("wb")),
        key="g",
        l_salt="doc_a",
        r_salt="doc_b",
        left_subset_of_right=True,  # prefix rows per gram ⊆ postings rows
        right_counts=gram_counts,
        right_max=gram_max,
    )
    ordered = hits.filter(F.col("doc_a") < F.col("doc_b"))
    if not split_verify:
        return ordered.select("doc_a", "doc_b").distinct()
    # One hit row per (a, b, g) with g in prefix(a) ∩ b (tf is one row
    # per (doc, g); the salted join's row set equals the plain join's),
    # so this aggregation — the same shuffle the legacy .distinct() paid
    # — ALSO yields the exact prefix-restricted dot.
    cand = ordered.groupBy("doc_a", "doc_b").agg(
        F.sum(F.col("wa") * F.col("wb")).alias("dot_p")
    )
    suffix = ranked.filter(F.col("cum") < t - ALLPAIRS_PREFIX_EPS).select(
        "doc_id", "g", "w"
    )
    return cand, suffix


def allpairs_cosine(docs: DataFrame) -> DataFrame:
    """Exact all-pairs sparse cosine >= t via prefix filtering (Bayardo,
    Ma & Srikant, WWW'07 "Scaling Up All Pairs Similarity Search").

    The naive form joins full posting lists on the shingle key: a
    boilerplate shingle shared by k documents contributes k^2 join hits —
    quadratic on one reducer at web-corpus scale, the same failure class
    q45b's DF cap kills. Prefix filtering is the LOSSLESS fix:

    1. order features globally by (document frequency DESC, shingle) —
       common features first;
    2. per document, walk its features in that order accumulating the
       bound sum(x_hat_j * maxw_j) where x_hat is the L2-normalized weight
       and maxw_j the corpus-wide max normalized weight of feature j. The
       initial run with cumulative bound < t - eps is the SUFFIX: a
       document sharing only suffix features can never reach cosine t
       (its dot is bounded by that sum). Only the remaining rare tail
       (the PREFIX) enters the candidate index.
    3. candidates = prefix(a) JOIN full-tf(b) on the shingle, a < b: any
       qualifying pair must share a prefix feature of a, so the candidate
       set is a SUPERSET of the answer — hot/boilerplate shingles sit in
       suffixes and never become join keys, which is exactly the skew
       kill;
    4. exact verification in pure BIGINT arithmetic (dot, squared norms,
       cross-multiplied threshold test) — associativity-safe, so the
       whole operator is hash-checked against the brute-force oracle.

    The float prefix bound only chooses HOW MUCH to index (any error is
    absorbed by eps and merely enlarges the candidate set); every emitted
    number is integer-derived. Fixed-point range: the accept test's LHS
    den^2 * dot^2 can reach den^2 * (norm2_a * norm2_b) (Cauchy-Schwarz;
    den=2 here), so BIGINT safety needs norm2_a * norm2_b < 2^63/den^2 =
    2^61, i.e. sum(w^2) < ~1.5e9 per doc — any real document qualifies;
    a production guard would clamp or fall back to DOUBLE compare for
    larger vectors.

    Scale notes (100 TB): tf and the norm are one hash-agg each; the
    feature-stats frame is vocabulary-sized (broadcast here; a shuffle
    join at true corpus scale, same note as q53's df frame); the rank
    walk is a per-document window (bounded partitions); candidate
    generation joins a rare-feature index against postings; verification
    touches candidate pairs only."""
    # tf feeds six plan branches (norms, feature stats, rank walk, both
    # candidate sides, both verify sides). Deliberately NOT checkpointed:
    # an eager localCheckpoint variant measured 6.1 -> 10.5 s at sf0.1
    # (min-of-3, clean bench) — the serial materialization costs more
    # than the recompute, because AQE reuses the identical shuffle query
    # stages across branches at runtime and the upstream scan is cheap.
    # On a cluster where the scan is NOT cheap (100 TB of cold object
    # storage), persist tf to MEMORY_AND_DISK instead — the branch count
    # is the same; only the recompute price changes.
    tf, gram_counts = shingle_tf_with_census(docs)
    nrm = tf.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    cand, suffix = allpairs_candidates(
        tf, nrm, gram_counts=gram_counts, split_verify=True
    )
    return allpairs_verify(tf, nrm, cand, suffix=suffix)


#: Pairs per salt cell for the verify stage's doc_a fan-out. The verify
#: joins shuffle candidate pairs by doc_a to meet that doc's postings;
#: a doc with p partners puts p x m_a pair-token rows on ONE reducer.
#: Sized as a DORMANT safety net (r14): the boiler3 stage-level
#: diagnosis showed the verify stages were never key-skewed there
#: (chunk ratios <= 1.6 — r13's 3.15 lived in the CANDIDATE stage, see
#: salted_hot_feature_join), and an eagerly-engaged salt (the first
#: r14 cut used 512) cost q49e ~50% wall at boiler3 for balance it
#: didn't need. 50k pairs x real posting sizes ~ tens of millions of
#: rows on one reducer — the scale at which a single doc_a key
#: genuinely dominates a task; below it the hash spread across doc_a
#: keys balances on its own. When no doc is hot the plain join returns
#: unchanged (driver-side branch), so the net cost is one census
#: aggregate per verify call.
VERIFY_SALT_PAIR_TARGET = 50_000


def salted_verify_fanout(
    cand: DataFrame, post: DataFrame, key: str = "doc_a", salt_src: str = "doc_b"
) -> DataFrame:
    """``cand.join(post, key)`` with the hot-key fan-out salted — the
    banding join's census-adaptive skew treatment applied to the verify
    stage (VERDICT r13 #2). Output row set is EXACTLY the plain join's
    (each hot pair meets each posting replica at precisely one salt), so
    every verify consumer keeps its oracle unchanged; only the physical
    distribution moves.

    Census: one count per doc_a over the candidate frame (in the grouped
    path cand is already materialized parquet, so this is a cheap
    rescan). Docs with more than VERIFY_SALT_PAIR_TARGET pairs split
    into s = ceil(count/target) salt cells by hash(doc_b); their postings
    replicate s ways (bounded: s x m_a rows for the few hot docs only).
    Cold docs take the original plan untouched. The hot branch is
    partition-pinned — its shuffle-read bytes are tiny id pairs while
    its output is the pair-token explosion, exactly the AQE-coalescing
    trap :func:`~parquet_modular_encryption_spark.pipeline.partitioning.pinned`
    exists for."""
    counts = cand.groupBy(key).agg(F.count(F.lit(1)).alias("__vn"))
    hot = counts.filter(F.col("__vn") > VERIFY_SALT_PAIR_TARGET)
    if not hot.limit(1).count():
        # nothing hot: the plain join — pinned (r15): the pair-token
        # fan-out's output dwarfs the candidate exchange bytes AQE sizes
        # the stage by (see salted_hot_feature_join's prescreen note)
        return pinned(cand, key).join(post, key)
    tagged = cand.join(hot, key, "left")
    cold = pinned(tagged.filter(F.col("__vn").isNull()).drop("__vn"), key).join(
        post, key
    )
    s_expr = F.ceil(F.col("__vn") / F.lit(VERIFY_SALT_PAIR_TARGET)).cast("long")
    hot_cand = (
        tagged.filter(F.col("__vn").isNotNull())
        .withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src)), s_expr))
        .drop("__vn")
    )
    hot_post = (
        post.join(hot, key)
        .withColumn(
            "__salt", F.explode(F.sequence(F.lit(0).cast("long"), s_expr - 1))
        )
        .drop("__vn")
    )
    joined = (
        pinned(hot_cand, key, "__salt")
        .join(hot_post, [key, "__salt"])
        .drop("__salt")
    )
    return cold.unionByName(joined.select(*cold.columns))


def allpairs_verify(
    tf: DataFrame,
    nrm: DataFrame,
    cand: DataFrame,
    salted: bool = False,
    suffix: DataFrame | None = None,
) -> DataFrame:
    """q55c's exact verification stage, factored out of
    :func:`allpairs_cosine` so the bounded-spill chunked execution path
    (:func:`verify_chunk` + scripts/sf10_chunked_experiment.py) runs the
    IDENTICAL plan on a candidate subset.

    Per-pair verification re-joins candidates against the posting rows:
    the first join fans out |candidates| x |doc_a grams|, the second
    keeps only shared grams, and the pair-keyed agg folds the dot. A
    map-typed-vector variant (map_zip_with + aggregate over broadcast
    per-doc maps) was measured equal-or-slower at sf0.1 — the HOF fold
    per pair costs what the row explosion costs, without the benefit of
    whole-stage-codegen hash aggregation — so the row form stays.

    ``salted=True`` (the grouped/bounded-spill path) routes the doc_a
    fan-out through :func:`salted_verify_fanout` — identical row set,
    hot template docs split across salt cells (VERDICT r13 #2).

    ``suffix`` (r15): the complementary posting frame from
    ``allpairs_candidates(split_verify=True)``. When given (cand must
    carry ``dot_p``), the fan-out joins candidates against SUFFIX
    postings only and dot_ab = dot_p + the suffix-restricted dot — the
    same BIGINT, partitioned over disjoint gram sets (prefix(a) ∪
    suffix(a) = a's grams, each shared gram counted in exactly one
    part). Pairs whose shared grams all sit in prefix(a) survive via
    the left join (their suffix dot is the empty sum). ~3.4x fewer
    pair-gram rows at sf0.1; identical output frame."""
    tb = tf.select(F.col("doc_id").alias("doc_b"), "g", F.col("w").alias("wb"))
    if suffix is not None:
        assert "dot_p" in cand.columns, "split verify needs dot_p on cand"
        pairs = cand.select("doc_a", "doc_b")
        ta = suffix.select(
            F.col("doc_id").alias("doc_a"), "g", F.col("w").alias("wa")
        )
        fanout = (
            salted_verify_fanout(pairs, ta)
            if salted
            else pinned(pairs, "doc_a").join(ta, "doc_a")
        )
        sdots = (
            fanout.join(tb, ["doc_b", "g"])
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("sdot"))
        )
        dots = cand.join(sdots, ["doc_a", "doc_b"], "left").select(
            "doc_a",
            "doc_b",
            (F.col("dot_p") + F.coalesce(F.col("sdot"), F.lit(0))).alias("dot_ab"),
        )
    else:
        ta = tf.select(F.col("doc_id").alias("doc_a"), "g", F.col("w").alias("wa"))
        fanout = (
            salted_verify_fanout(cand, ta)
            if salted
            else pinned(cand, "doc_a").join(ta, "doc_a")
        )
        dots = (
            fanout.join(tb, ["doc_b", "g"])
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot_ab"))
        )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("norm2_a"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("norm2_b"))
    n2c, d2c = ALLPAIRS_T_NUM**2, ALLPAIRS_T_DEN**2
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(
            F.lit(d2c) * F.col("dot_ab") * F.col("dot_ab")
            >= F.lit(n2c) * F.col("norm2_a") * F.col("norm2_b")
        )
        .select(
            "doc_a",
            "doc_b",
            "dot_ab",
            "norm2_a",
            "norm2_b",
            F.expr(_ALLPAIRS_COSINE).alias("cosine_sim"),
        )
    )


def verify_chunk(cand: DataFrame, chunk: int, n_chunks: int) -> DataFrame:
    """One bounded-spill verify chunk: the candidate pairs whose doc_a
    falls in residue class ``chunk`` mod ``n_chunks``.

    Residue classes partition the candidate frame EXACTLY (each pair has
    one doc_a), so the union of per-chunk verify outputs equals the
    monolithic verify row-for-row — pinned by
    tests/test_pipeline.py::test_chunked_verify_equals_monolithic. The
    point is spill bounding: the exact joins' verify stage shuffles the
    pair-token incidence (~5e9 rows at sf10 — ~70 GB of compressed spill,
    more than this VM's free disk, SF10_r09.json), and running chunks in
    SEPARATE sessions caps concurrent spill at ~1/n_chunks of that. This
    is the grouped-execution pattern a real cluster uses to bound
    per-stage disk: candidates are cheap to rescan/materialize; only the
    verify fan-out needs grouping. doc_ids are dense, so residue classes
    balance chunk sizes without a hash."""
    return cand.filter(F.pmod(F.col("doc_a"), F.lit(n_chunks)) == F.lit(chunk))


@register(
    "q55c_allpairs_sparse",
    oracle=_allpairs_oracle(),
    tags=("dedup", "similarity", "allpairs", "prefix-filter"),
)
def q55c_allpairs_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with shingle-tf cosine >= 1/2, found by exact
    prefix-filtered all-pairs search (see :func:`allpairs_cosine`) and
    verified in integer arithmetic — the sparse-vector complement of the
    dense-embedding near-dup family (q55/q55b) and the similarity-join
    complement of the threshold-free ANN top-k family (q54*)."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    return allpairs_cosine(docs)


# ---------------------------------------------------------------------------
# MinHash sketch-accuracy audit (q47c)
# ---------------------------------------------------------------------------
N_PERMS = len(MINHASH_PERMS)
AUDIT_PPM = 1_000_000


def _minhash_audit_oracle() -> str:
    agree = " + ".join(
        f"(CASE WHEN sa.sig_{j} = sb.sig_{j} THEN 1 ELSE 0 END)"
        for j in range(N_PERMS)
    )
    return f"""
    WITH {_minhash_ctes()}
    SELECT doc_a, doc_b, n_agree, inter_size, union_size,
           CAST((abs(n_agree * union_size - {N_PERMS} * inter_size) * {AUDIT_PPM})
                // ({N_PERMS} * union_size) AS BIGINT) AS est_err_ppm
    FROM (
        SELECT p.doc_a, p.doc_b,
               CAST({agree} AS BIGINT) AS n_agree,
               CAST(len(list_intersect(ha.shingles, hb.shingles)) AS BIGINT)
                   AS inter_size,
               CAST(len(list_distinct(ha.shingles || hb.shingles)) AS BIGINT)
                   AS union_size
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_a
        JOIN sig sb ON sb.doc_id = p.doc_b
        JOIN shingled ha ON ha.doc_id = p.doc_a
        JOIN shingled hb ON hb.doc_id = p.doc_b
    )
    """


@register(
    "q47c_minhash_error_audit",
    oracle=_minhash_audit_oracle(),
    tags=("dedup", "minhash", "sketch", "evaluation"),
)
def q47c_minhash_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit for the MinHash estimator — the evaluation a
    pipeline runs before trusting {N_PERMS} permutations in production:
    for every LSH candidate pair, the signature-agreement estimate
    (n_agree/{N_PERMS} is the unbiased Jaccard estimator) next to the
    EXACT shingle-set Jaccard (intersection and union sizes as integers),
    plus their absolute error in exact ppm — the per-pair number whose
    distribution tells you whether to buy more permutations.

    Everything is integer-derived (agreement count, set sizes, the
    cross-multiplied error |n_agree*union - {N_PERMS}*inter| /
    ({N_PERMS}*union) in fixed point), so the audit itself is
    hash-checked — estimator, banding, and exact verification all mirror
    the q47 pipeline (same CTE body). Scale: signatures and shingle sets
    are per-doc aggregates; the audit joins touch candidate pairs only —
    the audit costs what the dedup it validates costs, nothing more."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    shingled = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", shingles_from(F.col("toks"), SHINGLE_N).alias("shingles")
    )
    sig = minhash_signature(docs, "doc_id", "text")
    pairs = banded_pairs(band_keys(sig, "doc_id")).distinct()
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{j}").alias(f"a{j}") for j in range(N_PERMS)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{j}").alias(f"b{j}") for j in range(N_PERMS)],
    )
    ha = shingled.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    hb = shingled.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    n_agree = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(N_PERMS)
    ).cast("bigint")
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(ha, "doc_a")
        .join(hb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_agree.alias("n_agree"),
            F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint").alias("inter_size"),
            F.size(F.array_union("sh_a", "sh_b")).cast("bigint").alias("union_size"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_agree",
            "inter_size",
            "union_size",
            F.expr(
                f"(abs(n_agree * union_size - {N_PERMS} * inter_size) * {AUDIT_PPM})"
                f" DIV ({N_PERMS} * union_size)"
            ).alias("est_err_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Exact global Jaccard join via PPJoin-style prefix filtering (q49c)
# ---------------------------------------------------------------------------
# Threshold as an exact rational (7/20 = 0.35) so every pruning bound is
# integer arithmetic.
PPJOIN_T_NUM = 7
PPJOIN_T_DEN = 20


def _decrypting_pinned_read(
    spark: SparkSession, path: str, token: str, pins: list
) -> DataFrame:
    """One decrypting pass, pinned MEMORY_ONLY, served from RAM to every
    consumer until the caller releases it (VERDICT r13 #4). Capability-
    gated reader choice (the TWS probe pattern): sessions launched with
    the KMS jar (bench, get_spark+native_session_conf) take the NATIVE
    parquet-mr scan — measured ~0.9x a PLAIN scan in the bench
    encryption_overhead sidecar, reading arrow-written files via the
    pinned interop (tests/test_encrypted_native.py interop_arrow_to_jvm)
    — while a vanilla session (the driver's) falls back to the arrow
    mapInArrow scan, still decrypt-once via the same MEMORY_ONLY pin.
    Either way no decrypted block can spill to disk; eviction recomputes
    through the decrypting scan."""
    from parquet_modular_encryption_spark.sources.encrypted import (
        _resolve_kms_url,
        read_encrypted,
    )
    from parquet_modular_encryption_spark.sources.encrypted_native import (
        native_pme_available,
        read_encrypted_native,
    )

    ok, _probe = native_pme_available(spark)
    if ok:
        enc = read_encrypted_native(
            spark, path, _resolve_kms_url(spark, None), token=token
        )
        pins.append(enc)
        _ = enc.unpersist  # release handle registered for the chunk-loop end
        return enc
    return _content_checkpoint(
        read_encrypted(spark, path, token=token), spill_safe=True, pins=pins
    )


def _content_checkpoint(
    df: DataFrame, spill_safe: bool, pins: list | None = None
) -> DataFrame:
    """Materialize a content-bearing intermediate. Default: localCheckpoint
    (eager) — the q49b/q49c pattern, reclaimed by the ContextCleaner on
    GC. ``spill_safe=True`` (the encrypted-lake paths): persist
    MEMORY_ONLY + materializing count instead — localCheckpoint force-
    includes executor DISK, which would park decrypted content
    derivatives (shingle arrays reconstruct text) in plaintext outside
    the PME envelope, the exact leak read_encrypted_native's pin
    discipline exists to prevent. MEMORY_ONLY never touches disk; an
    evicted block recomputes through the decrypting scan it came from —
    slower, never leaky. The pinned frame is appended to ``pins`` for
    the caller to release when its consumers are done.

    SCOPE OF THE GUARANTEE (ADVICE r14): this protects CACHED /
    CHECKPOINTED blocks only. Downstream candidate/verify joins still
    hash-shuffle plaintext tok/gram values, and shuffle files (plus any
    shuffle spill) land on executor local disk outside the PME envelope
    regardless of this pin. A fully closed boundary additionally
    requires ``spark.io.encryption.enabled=true`` (Spark's shuffle/spill
    file encryption) — a launch-time deployment conf, not something a
    query can set on a running session."""
    if spill_safe:
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_ONLY)
        out.count()
        if pins is not None:
            pins.append(out)
        _ = out.unpersist  # release handle registered above for the caller
        return out
    return df.localCheckpoint(eager=True)


def ppjoin_candidates(
    docs: DataFrame,
    spill_safe: bool = False,
    pins: list | None = None,
    split_verify: bool = False,
) -> tuple[DataFrame, DataFrame] | tuple[DataFrame, DataFrame, DataFrame]:
    """q49c's candidate stage: (token postings, candidate pairs).

    ``split_verify`` (r15): return ``(toks, cand, suffix)`` where cand
    additionally carries ``i_p`` — the EXACT |prefix(a) ∩ b| overlap
    count, folded for free into the aggregation that deduplicated the
    candidate join's hits (PPJoin's own positional-sum idea) — and
    ``suffix`` is the complementary (doc_id, tok) posting frame
    (rn > prefix length). The verify stage then counts only
    suffix(a)-shared tokens: I = i_p + suffix overlap, fan-out reduced
    by the prefix fraction (prefixes are ~65% of each set at t=7/20).

    Length filter (cross-multiplied integers) inside the join; prefix
    filter indexes only each set's first p = m - ceil(t*m) + 1 tokens in
    rarest-first (document frequency ASC, token) order — see q49c's
    docstring for the superset proof. Exposed so the scale experiment can
    count the candidate frame at multiple SFs.

    The shingle-ARRAY frame is localCheckpointed before the explode —
    the round-9 scale experiment caught q49c at ~4x its recorded cost,
    and the profile isolated the cause: whole-stage codegen inlines a
    Generate's child expression, so explode over a LAZY shingle HOF
    re-evaluates the whole tokenize+shingle construction once per OUTPUT
    row (~52x the per-document work here; measured 7 s vs 0.1 s for the
    explode from materialized arrays, with the array build itself only
    0.5 s). Materializing the ~|docs|-row array frame and exploding
    lazily makes every one of the five consuming branches (df stats,
    prefix side, probe side, both verification posting sides) pay only
    the cheap explode."""
    from pyspark.sql import Window

    shingled = _content_checkpoint(
        widened(docs.select("doc_id", tokens("text").alias("toks"))).select(
            "doc_id", shingles_from(F.col("toks"), SHINGLE_N).alias("shingles")
        ),
        spill_safe,
        pins,
    )  # widened (r15): see partitioning.widened
    toks = shingled.select(
        "doc_id", F.size("shingles").alias("m"), F.explode("shingles").alias("tok")
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("tok"))
    num, den = PPJOIN_T_NUM, PPJOIN_T_DEN
    # p = m - ceil(t*m) + 1, with ceil(num*m/den) = (num*m + den - 1) DIV den
    prefix_len = F.col("m") - F.expr(f"(({num} * m) + {den} - 1) DIV {den}") + 1
    ranked = toks.join(F.broadcast(dfreq), "tok").withColumn(
        "rn", F.row_number().over(w)
    )
    prefix = ranked.filter(F.col("rn") <= prefix_len).select(
        F.col("doc_id").alias("doc_a"), F.col("m").alias("ma"), "tok"
    )
    full = toks.select(
        F.col("doc_id").alias("doc_b"), F.col("m").alias("mb"), "tok"
    )
    # Deliberately the PLAIN token join (r14): the boiler3 stage-level
    # diagnosis measured this stage balanced (ratio <= 1.36) — PPJoin's
    # rarest-first prefixes stay short enough that even group-shared
    # tokens spread across reducers — and an A/B with
    # salted_hot_feature_join here made the wall AND dispersion worse
    # (grid overhead for balance the stage already had). The salted
    # variant guards q55c's candidate join, where the same corpus
    # measurably straggles at 3.4-3.6.
    ordered = prefix.join(full, "tok").filter(
        (F.col("doc_a") < F.col("doc_b"))
        & (F.lit(den) * F.col("mb") >= F.lit(num) * F.col("ma"))
        & (F.lit(den) * F.col("ma") >= F.lit(num) * F.col("mb"))
    )
    if not split_verify:
        return toks, ordered.select("doc_a", "doc_b", "ma", "mb").distinct()
    # one hit row per (a, b, tok) with tok in prefix(a) ∩ b (token sets
    # are distinct per doc), so the dedup aggregation counts the exact
    # prefix-restricted overlap as a by-product
    cand = ordered.groupBy("doc_a", "doc_b", "ma", "mb").agg(
        F.count(F.lit(1)).alias("i_p")
    )
    suffix = ranked.filter(F.col("rn") > prefix_len).select("doc_id", "tok")
    return toks, cand, suffix


def _ppjoin_oracle() -> str:
    """Brute-force global Jaccard join — shared by q49c and its grouped
    execution twin q49e (identical answer frame by the residue-class
    partition lemma, tests/test_pipeline.py::
    test_chunked_verify_equals_monolithic)."""
    return f"""
    WITH tok AS (
        SELECT doc_id, {sql_tokens("text")} AS toks FROM documents
    ), sh AS (
        SELECT doc_id, {sql_word_shingles("toks", SHINGLE_N)} AS shingles FROM tok
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(list_distinct(a.shingles || b.shingles)) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE {PPJOIN_T_DEN} * len(list_intersect(a.shingles, b.shingles))
          >= {PPJOIN_T_NUM} * len(list_distinct(a.shingles || b.shingles))
    """


@register(
    "q49c_jaccard_ppjoin",
    oracle=_ppjoin_oracle(),
    tags=("dedup", "jaccard", "ppjoin", "prefix-filter"),
)
def q49c_jaccard_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus-global Jaccard similarity join (no blocks, no
    probability of a miss) via PPJoin-style prefix filtering (Xiao, Wang,
    Lin & Yu, WWW'08; the set-overlap sibling of q55c's Bayardo cosine
    filter) over the same word {SHINGLE_N}-gram shingle sets q47's
    MinHash uses — so the three similarity-join strategies compare
    directly: q49 bounds work by BLOCKING (lossy by design, pairs must
    share a block), q47 by PROBABILITY (LSH banding can miss), q49c by
    LOSSLESS pruning:

    - length filter: J >= t forces t*|x| <= |y| <= |x|/t — cross-
      multiplied integers, applied inside the candidate join;
    - prefix filter: order tokens globally by (document frequency ASC,
      token) — rarest first — and index only each set's first
      p = m - ceil(t*m) + 1 tokens. A pair sharing ONLY suffix tokens
      has intersection <= m - p = ceil(t*m) - 1 < ceil(t*m) <= the
      minimum intersection J >= t requires (I >= t*U >= t*m), so every
      qualifying pair shares a prefix token: the candidate set is a
      superset. Rare-first ordering makes prefix tokens the LOW-df ones,
      so candidate-join keys are cold by construction.

    Verification is the exact integer-ratio test (den*I >= num*U) and
    the emitted jaccard is one INT/INT division — cross-engine
    deterministic, so the global join is fully hash-checked against the
    brute-force oracle. Scale: candidates ~ sharing-pairs over LOW-df
    tokens only; a boilerplate shingle in 10^6 docs is high-df, lands in
    every suffix, and never generates a candidate."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    toks, cand, suffix = ppjoin_candidates(docs, split_verify=True)
    return ppjoin_verify(toks, cand, suffix=suffix)


def ppjoin_verify(
    toks: DataFrame,
    cand: DataFrame,
    salted: bool = False,
    suffix: DataFrame | None = None,
) -> DataFrame:
    """q49c's exact verification stage, factored out (like
    :func:`allpairs_verify`) so the bounded-spill chunked execution path
    runs the identical plan on a :func:`verify_chunk` subset.

    Verify by COUNTING shared tokens through the posting rows (only
    shared tokens survive the second join) and derive the union from
    the set sizes: U = ma + mb - I. Shipping shingle ARRAYS to every
    candidate pair and running array_intersect measured ~3x slower at
    sf0.1 — the token join stays in whole-stage-codegen hash
    aggregation and moves ids, never payloads.

    ``salted=True`` (the grouped/bounded-spill path) routes the doc_a
    fan-out through :func:`salted_verify_fanout` — identical row set,
    hot template docs split across salt cells (VERDICT r13 #2).

    ``suffix`` (r15): the rn > prefix-length posting frame from
    ``ppjoin_candidates(split_verify=True)``. When given (cand must
    carry ``i_p``), the fan-out joins candidates against SUFFIX postings
    only and I = i_p + the suffix overlap — the same integer, counted
    over the disjoint prefix/suffix split of a's token set; pairs whose
    shared tokens all sit in prefix(a) survive via the left join."""
    num, den = PPJOIN_T_NUM, PPJOIN_T_DEN
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    if suffix is not None:
        assert "i_p" in cand.columns, "split verify needs i_p on cand"
        pairs = cand.select("doc_a", "doc_b")
        ta = suffix.select(F.col("doc_id").alias("doc_a"), "tok")
        fanout = (
            salted_verify_fanout(pairs, ta)
            if salted
            else pinned(pairs, "doc_a").join(ta, "doc_a")
        )
        scnt = (
            fanout.join(tb, ["doc_b", "tok"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("s_i"))
        )
        inter = cand.join(scnt, ["doc_a", "doc_b"], "left").select(
            "doc_a",
            "doc_b",
            "ma",
            "mb",
            (F.col("i_p") + F.coalesce(F.col("s_i"), F.lit(0))).alias("i"),
        )
    else:
        ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
        fanout = (
            salted_verify_fanout(cand, ta)
            if salted
            else pinned(cand, "doc_a").join(ta, "doc_a")
        )
        inter = (
            fanout.join(tb, ["doc_b", "tok"])
            .groupBy("doc_a", "doc_b", "ma", "mb")
            .agg(F.count(F.lit(1)).alias("i"))
        )
    union = F.col("ma") + F.col("mb") - F.col("i")
    return (
        inter.filter(F.lit(den) * F.col("i") >= F.lit(num) * union)
        .select(
            "doc_a",
            "doc_b",
            (F.col("i").cast("double") / union).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental PPJoin: batch-vs-corpus EXACT Jaccard at ingest shape (q49d)
# ---------------------------------------------------------------------------
# The round-9 scale experiment measured q49c at ~O(n log n): its candidates
# stay exactly linear, but the rarest-first prefix ranking re-sorts the
# whole corpus's postings by (df, tok) on every run. Production never does
# that twice — the corpus's inverted index and df table are maintained at
# ingest, and the daily question is "which NEW documents near-duplicate the
# corpus?". q49d is that job: the window runs over BATCH postings only, the
# corpus side contributes a standing (tok, doc, m) posting index and a df
# lookup, and the log factor drops from O(corpus) to O(batch).


def ppjoin_incremental_candidates(
    batch_toks: DataFrame, corpus_toks: DataFrame, split_verify: bool = False
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """One-sided PPJoin candidate stage: BATCH prefixes probing the CORPUS
    posting index. `*_toks` are (doc_id, m, tok) posting frames.

    ``split_verify`` (r15, same move as :func:`ppjoin_candidates`):
    return ``(cand, batch_suffix)`` with the exact |prefix(batch) ∩
    corpus| count ``i_p`` folded into the hit-dedup aggregation and the
    batch's rn > prefix-length posting rows as the suffix frame — the
    verify stage then fans out over batch SUFFIX tokens only.

    Correctness does not depend on the ranking order: for any fixed total
    order on tokens, a pair with J >= t shares >= ceil(t*U) >= ceil(t*ma)
    tokens, more than the ma - p = ceil(t*ma) - 1 tokens in the batch
    doc's suffix, so at least one shared token sits in the batch doc's
    first p = ma - ceil(t*ma) + 1 tokens and the prefix x postings join
    catches the pair (property-tested on random split corpora). That is
    what makes the INCREMENTAL shape safe: the ranking uses the standing
    corpus df (unseen tokens COALESCE to df 0 — rarest, their posting
    lists are empty), which can go arbitrarily stale between index
    rebuilds without ever losing a pair — staleness only degrades how
    cold the probe keys are, never exactness."""
    from pyspark.sql import Window

    num, den = PPJOIN_T_NUM, PPJOIN_T_DEN
    dfreq = corpus_toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("tok"))
    prefix_len = F.col("m") - F.expr(f"(({num} * m) + {den} - 1) DIV {den}") + 1
    ranked = (
        batch_toks.join(F.broadcast(dfreq), "tok", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
        .withColumn("rn", F.row_number().over(w))
    )
    prefix = ranked.filter(F.col("rn") <= prefix_len).select(
        F.col("doc_id").alias("doc_batch"), F.col("m").alias("ma"), "tok"
    )
    postings = corpus_toks.select(
        F.col("doc_id").alias("doc_corpus"), F.col("m").alias("mb"), "tok"
    )
    hits = prefix.join(postings, "tok").filter(
        (F.lit(den) * F.col("mb") >= F.lit(num) * F.col("ma"))
        & (F.lit(den) * F.col("ma") >= F.lit(num) * F.col("mb"))
    )
    if not split_verify:
        return hits.select("doc_batch", "doc_corpus", "ma", "mb").distinct()
    cand = hits.groupBy("doc_batch", "doc_corpus", "ma", "mb").agg(
        F.count(F.lit(1)).alias("i_p")
    )
    suffix = ranked.filter(F.col("rn") > prefix_len).select("doc_id", "tok")
    return cand, suffix


@register(
    "q49d_jaccard_ppjoin_incremental",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {sql_tokens("text")} AS toks,
               {_INCR_SPLIT_SQL} AS is_corpus
        FROM documents
    ), sh AS (
        SELECT doc_id, is_corpus,
               {sql_word_shingles("toks", SHINGLE_N)} AS shingles
        FROM tok
    )
    SELECT a.doc_id AS doc_batch, b.doc_id AS doc_corpus,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(list_distinct(a.shingles || b.shingles)) AS jaccard
    FROM sh a JOIN sh b ON NOT a.is_corpus AND b.is_corpus
    WHERE {PPJOIN_T_DEN} * len(list_intersect(a.shingles, b.shingles))
          >= {PPJOIN_T_NUM} * len(list_distinct(a.shingles || b.shingles))
    """,
    tags=("dedup", "jaccard", "ppjoin", "incremental", "pipeline"),
)
def q49d_jaccard_ppjoin_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT batch-vs-corpus Jaccard join at ingest shape: every pair
    (batch doc, corpus doc) with shingle-set Jaccard >= {PPJOIN_T_NUM}/
    {PPJOIN_T_DEN}, found losslessly via a ONE-SIDED PPJoin — batch
    prefixes (ranked by the standing corpus df, q63d's md5 split stands
    in for the storage boundary) probe the corpus posting index; see
    :func:`ppjoin_incremental_candidates` for why stale df ranking can
    never lose a pair.

    This is q49c's daily-ingest twin and the structural answer to its
    measured ~O(n log n) wall-clock (SCALE_r09.json): q49c's log factor
    is the corpus-wide rarest-first ranking window, which here shrinks
    to the BATCH (corpus-side work is the linear, map-side-combinable
    df aggregate plus posting joins — no corpus-wide sort or window
    anywhere in the plan). At 100 TB the corpus posting/df frames are
    the standing index maintained at ingest; the verification join
    moves only (doc ids, token hashes), never shingle arrays — the
    array-shipping variant measured ~3x slower on the q49c path."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    is_corpus = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "b"
    shingled = (
        widened(
            docs.select(
                "doc_id", is_corpus.alias("is_corpus"), tokens("text").alias("toks")
            )
        )
        .select(
            "doc_id",
            "is_corpus",
            shingles_from(F.col("toks"), SHINGLE_N).alias("shingles"),
        )
        .localCheckpoint(eager=True)  # four consuming branches; see
        # ppjoin_candidates for the Generate-over-lazy-HOF measurement
    )
    toks = shingled.select(
        "doc_id",
        "is_corpus",
        F.size("shingles").alias("m"),
        F.explode("shingles").alias("tok"),
    )
    batch_toks = toks.filter(~F.col("is_corpus")).drop("is_corpus")
    corpus_toks = toks.filter(F.col("is_corpus")).drop("is_corpus")
    cand, suffix = ppjoin_incremental_candidates(
        batch_toks, corpus_toks, split_verify=True
    )
    num, den = PPJOIN_T_NUM, PPJOIN_T_DEN
    # split verify (r15): fan out over batch SUFFIX tokens only — the
    # prefix-shared count i_p rides on the candidate frame; the pinned
    # repartition is the explosive-join parallelism guard
    ta = suffix.select(F.col("doc_id").alias("doc_batch"), "tok")
    tb = corpus_toks.select(F.col("doc_id").alias("doc_corpus"), "tok")
    scnt = (
        pinned(cand.select("doc_batch", "doc_corpus"), "doc_batch")
        .join(ta, "doc_batch")
        .join(tb, ["doc_corpus", "tok"])
        .groupBy("doc_batch", "doc_corpus")
        .agg(F.count(F.lit(1)).alias("s_i"))
    )
    inter = cand.join(scnt, ["doc_batch", "doc_corpus"], "left").select(
        "doc_batch",
        "doc_corpus",
        "ma",
        "mb",
        (F.col("i_p") + F.coalesce(F.col("s_i"), F.lit(0))).alias("i"),
    )
    union = F.col("ma") + F.col("mb") - F.col("i")
    return inter.filter(F.lit(den) * F.col("i") >= F.lit(num) * union).select(
        "doc_batch",
        "doc_corpus",
        (F.col("i").cast("double") / union).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# Grouped (bounded-spill) execution of the exact similarity joins
# (q49e / q55d) — the sf10 chunked-verify shape as a first-class operator
# ---------------------------------------------------------------------------
# VERDICT r10 item 2: verify_chunk + the chunk-union reduce proved out in
# scripts/sf10_chunked_experiment.py (both sf10 exact joins finished inside
# the disk that killed the monoliths; zipf3 chunked even BEAT the monolith,
# 651 vs 948 s) but lived only as an experiment harness. These registered
# twins make the scale-safe execution shape invocable through the registry:
# materialize the candidate frame (and the posting/tf frames every chunk
# re-reads) to scratch parquet ONCE, then run the factored verify stage
# over one doc_a residue class at a time — n_chunks sequential jobs — and
# return the union read back from the chunk outputs. The union equals the
# monolithic join row-for-row (residue classes partition candidates
# exactly; pinned by tests/test_pipeline.py::
# test_chunked_verify_equals_monolithic), so q49e/q55d share q49c/q55c's
# brute-force oracles unchanged.
#
# What this bounds: the verify stage's shuffle (the pair-token incidence —
# ~5e9 rows at sf10) is split into n_chunks independent shuffles of ~1/n
# the size each. On a cluster, that caps per-stage aggregate spill and
# lets a dedup of arbitrary size run within fixed scratch capacity; the
# single-VM extreme (one JVM per chunk so even COMPLETED shuffle files
# free their disk between chunks) remains in the experiment script. The
# price is re-reading the materialized postings per chunk — linear, cheap,
# and parquet-compressed, vs the quadratic-prone verify fan-out it bounds.

#: Spark conf key for the grouped-execution scratch budget in bytes. When
#: unset, the sizing rule probes the scratch filesystem's free space and
#: takes GROUPED_SCRATCH_FRACTION of it — the operator's whole point is
#: bounding live shuffle to what the disk can absorb, so the disk is the
#: default authority (VERDICT r11 #3: a user at an unknown scale must not
#: have to guess n_chunks).
GROUPED_SCRATCH_BUDGET_CONF = "spark.graft.grouped.scratchBudgetBytes"
GROUPED_SCRATCH_FRACTION = 0.25
#: Estimated on-disk bytes per pair-token incidence row in the verify
#: stage's live shuffle (two bigint ids + gram key + weight, after the
#: shuffle codec). sf10 calibration: ~5e9 incidence rows produced ~70 GB
#: of lz4 spill (SF10_r09.json) — ~14 B/row; 24 keeps headroom for the
#: pre-agg map-side buffers that spill alongside.
GROUPED_VERIFY_ROW_BYTES = 24
#: Hard cap on auto-chosen chunk count: beyond this the per-chunk
#: candidate rescans dominate (each chunk re-reads the full postings
#: parquet), and a corpus needing >64 bounded chunks on one machine
#: should be running on a cluster with a larger aggregate budget anyway.
GROUPED_MAX_CHUNKS = 64

#: (op, est_rows, est_bytes, budget_bytes, n_chunks) of the most recent
#: auto-sizing decision — read by the experiment scripts so artifacts can
#: record WHY a chunk count was chosen, and by tests.
LAST_GROUPED_SIZING: dict[str, int | str] = {}


def grouped_scratch_budget(spark: SparkSession, work_dir: str) -> int:
    """Scratch budget in bytes for grouped execution: the explicit conf
    when set, else GROUPED_SCRATCH_FRACTION of the free space on the
    filesystem holding ``work_dir`` (where chunk spill actually lands)."""
    import os as _os

    conf = spark.conf.get(GROUPED_SCRATCH_BUDGET_CONF, None)
    if conf:
        return max(1, int(conf))
    st = _os.statvfs(work_dir)
    return max(1, int(st.f_bavail * st.f_frsize * GROUPED_SCRATCH_FRACTION))


def grouped_chunk_count(
    cand: DataFrame, postings: DataFrame, budget_bytes: int, id_col: str = "doc_id"
) -> tuple[int, int]:
    """(n_chunks, est_incidence_rows): size the residue-class count from
    the work the verify stage will actually shuffle, instead of a fixed
    default (VERDICT r11 #3).

    The verify stage's live shuffle is the pair-token incidence: joining
    candidates to doc_a's postings fans out sum(m_a) rows and the
    (doc_b, g) probe side re-shuffles the m_b postings per pair, so the
    estimate is sum over candidate pairs of (m_a + m_b) — computable
    with one cheap aggregate over the ALREADY-materialized candidate
    parquet joined to per-doc posting counts (both frames the grouped
    plan has on scratch disk regardless). n_chunks = ceil(estimated
    bytes / budget), clamped to [1, GROUPED_MAX_CHUNKS]: at driver/bench
    scales the estimate sits far under any real disk's budget and the
    rule picks 1 (the grouped operator degenerates to the monolith plus
    one materialization — the honest answer when no spill bounding is
    needed); at sf10 (~5e9 incidence rows, ~120 GB estimated vs ~19 GB
    of budget on this VM) it picks the 7-10 range the disk-overflow
    experiments converged on by hand."""
    import math as _math

    if {"ma", "mb"} <= set(cand.columns):
        # the PPJoin candidate frame already carries both posting sizes
        # (length-filter residue) — one aggregate over the materialized
        # cand parquet, no postings scan at all (which, under
        # encrypt_scratch, would be a decrypting read)
        est = (
            cand.agg(F.sum(F.col("ma") + F.col("mb")).alias("rows")).first()["rows"]
        ) or 0
    else:
        sizes = postings.groupBy(id_col).agg(F.count(F.lit(1)).alias("__m"))
        sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("__m").alias("__ma"))
        sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("__m").alias("__mb"))
        est = (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .agg(F.sum(F.col("__ma") + F.col("__mb")).alias("rows"))
            .first()["rows"]
        ) or 0
    n = int(_math.ceil(est * GROUPED_VERIFY_ROW_BYTES / budget_bytes))
    return max(1, min(GROUPED_MAX_CHUNKS, n)), int(est)


def grouped_exact_join(
    spark: SparkSession,
    docs: DataFrame,
    op: str,
    n_chunks: int | None = None,
    encrypt_scratch: bool = False,
) -> DataFrame:
    """Run q49c's or q55c's verify stage in ``n_chunks`` bounded-spill
    groups (``op`` in {"q49c", "q55c"}) and return the union frame —
    column-identical to the monolithic operator.

    Stage layout (mirrors scripts/sf10_chunked_experiment.py's phases,
    one session instead of one JVM per phase):

    1. materialize: postings (q49c: toks; q55c: tf + norms) and the
       prefix-filtered candidate frame to scratch parquet. Candidates
       are cheap relative to verify and rescanned by every chunk, so
       they are computed exactly once.
    2. verify chunk i: the IDENTICAL factored verify plan
       (:func:`ppjoin_verify` / :func:`allpairs_verify`) over
       ``verify_chunk(cand, i, n_chunks)``, written to its own chunk
       directory — one sequential Spark job per chunk, so at most one
       chunk's pair-token shuffle is live at a time.
    3. reduce: read the explicit chunk-directory list back with the
       verify schema pinned (a chunk with zero surviving pairs leaves a
       part-less directory; schema inference would fail on it — the
       ADVICE-r10 lesson from the experiment script's reduce).

    ``n_chunks`` resolution (r12, bound prescreen r16): an explicit
    argument wins, then the SPARK_GRAFT_GROUPED_CHUNKS env override.
    Otherwise a gram-census UPPER BOUND on the verify incidence
    ((sum_g df_g^2) * 2 * m_max) is computed first: when even the bound
    fits the scratch budget in one chunk, the operator returns the
    MONOLITHIC lazy plan — no scratch materializations, censuses or
    chunk writes at all, because at n_chunks = 1 nothing is ever re-read
    and those jobs were pure overhead (VERDICT r15 #1: a ~40-job
    sequential chain, the 2-3 s q55d/q49e floor at sf0.1). Only when the
    bound exceeds the budget does the exact-census sizing rule run over
    the materialized candidate frame. Either decision is recorded in
    LAST_GROUPED_SIZING (``mode``: "bound_prescreen" / "exact_census").

    PLAINTEXT-SCRATCH CONTRACT: this function materializes postings,
    candidate pairs, and chunk outputs as PLAINTEXT parquet under the
    session scratch dir — DERIVATIVES of the input (shingle postings
    reconstruct text n-grams) leave any PME encryption envelope the
    input had. Callers deduping an encrypted lake who need scratch
    inside the envelope must pass ``encrypt_scratch=True``, which routes
    every scratch write/read through the uniform-key PME writer (one
    CONFIDENTIAL column policy per frame) at the cost of the
    encrypt/decrypt pass per materialization. The contract is pinned by
    tests/test_pipeline.py::test_grouped_scratch_encryption_boundary.
    """
    import os as _os

    from parquet_modular_encryption_spark.scratch import scratch_dir

    assert op in ("q49c", "q55c"), op
    work = scratch_dir(f"pme_grouped_{op}_")
    pins: list = []  # MEMORY_ONLY frames to release after the chunk loop

    def _materialize(df: DataFrame, sub: str, enc_cols: tuple[str, ...] = ()):
        """Write one scratch frame and read it back. Content-bearing
        columns (``enc_cols`` — the shingle/gram postings that
        reconstruct input n-grams) go through the uniform-key PME writer
        when ``encrypt_scratch`` is set; id/weight/score frames stay
        plaintext either way, matching the lake convention that ids are
        keyless catalog columns (q47e)."""
        path = f"{work}/{sub}"
        # Narrow lineage from a small lake leaves one partition all the
        # way down — a single-threaded GCM encrypt, a single-threaded
        # decrypt, and a 1-task cache scan for every verify consumer
        # (measured: the dominant term of q49f's r13 premium). Widen to
        # the session's parallelism before the ENCRYPTED write; skipped
        # when the frame is already wide (sf10: postings arrive 100+
        # partitions wide and an extra full shuffle would cost real
        # time) and on the plaintext path entirely (a plain parquet
        # scan re-splits by size on read — only the GCM pipeline is
        # partition-bound, and the shuffle cost the plain twins a
        # measured ~15% at sf0.1 for nothing).
        if encrypt_scratch and enc_cols:
            n_target = spark.sparkContext.defaultParallelism
            if df.rdd.getNumPartitions() < n_target:
                df = df.repartition(n_target)
            from parquet_modular_encryption_spark.crypto.policy import (
                EncryptionPolicy,
                Privilege,
            )
            from parquet_modular_encryption_spark.sources.encrypted import (
                read_encrypted,
                write_encrypted,
            )

            # v1 data pages: the arrow<->parquet-mr PME interop holds for
            # v1 only (DataPage v2 + GCM AAD ordinals diverge between the
            # implementations — the interop test pins v1 for the same
            # reason), and this scratch must be readable by whichever
            # decrypting scan the session supports (_decrypting_pinned_read)
            write_encrypted(
                df,
                path,
                EncryptionPolicy(
                    column_levels={c: Privilege.CONFIDENTIAL for c in enc_cols},
                    name=f"grouped_{sub}",
                ),
                data_page_version="1.0",
            )
            # Decrypt ONCE (VERDICT r13 #4): without the pin, every
            # consumer of the scratch frame — both posting sides of the
            # verify join, in every chunk — re-runs the decrypting scan,
            # which is what priced q49f at ~1.9x its plaintext twin.
            return _decrypting_pinned_read(spark, path, "CONFIDENTIAL", pins)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    # n_chunks forced up front? Explicit argument wins, then the env
    # override — either skips the bound prescreen (the caller has
    # already decided chunking is wanted).
    env = _os.environ.get("SPARK_GRAFT_GROUPED_CHUNKS")
    forced = n_chunks if n_chunks is not None else (max(1, int(env)) if env else None)

    if op == "q49c":
        # spill_safe under encrypt_scratch: the shingle-array checkpoint
        # inside candidate generation must not park content derivatives
        # on executor disk in plaintext (see _content_checkpoint)
        toks, cand, suffix = ppjoin_candidates(
            docs, spill_safe=encrypt_scratch, pins=pins, split_verify=True
        )
    else:
        tf, gram_counts, arrays = _shingle_tf_census_arrays(
            docs, spill_safe=encrypt_scratch, pins=pins
        )

    budget = None
    gram_max: int | None = None  # q55c-op prescreen byproduct (max df)
    if forced is None:
        budget = grouped_scratch_budget(spark, work)
        # Bound prescreen (r16, VERDICT r15 #1): before materializing
        # anything, upper-bound the verify incidence from the gram census
        # alone. Candidate-join hits are at most sum_g df_g^2 (prefix
        # rows per gram <= posting rows per gram = df_g), distinct pairs
        # <= hits, and each pair contributes ma+mb <= 2*m_max incidence
        # rows, so  est_rows <= (sum_g df_g^2) * 2 * m_max.  When even
        # this BOUND fits the scratch budget in one chunk, no spill
        # bounding is needed and the bounded-spill plan IS the monolithic
        # plan: every scratch materialization, census and chunk write
        # exists only so n_chunks > 1 can re-read instead of recompute —
        # at n_chunks = 1 they were pure job-chain overhead (the measured
        # ~40 sequential driver-blocking jobs putting a 2-3 s floor under
        # q55d/q49e at sf0.1, VERDICT r15 #1). A template corpus pushes
        # df_g^2 quadratic and blows the bound, so the exact-census path
        # below engages — the prescreen errs conservative by construction
        # (bound >= exact). Cost when it fails: one vocabulary-sized
        # aggregate over the already-checkpointed array frame. Doubles
        # avoid the bigint overflow df^2 would hit at web scale; the
        # bound needs no exactness, only monotonicity.
        if op == "q49c":
            row = (
                toks.groupBy("tok")
                .agg(F.count(F.lit(1)).alias("__c"), F.max("m").alias("__mm"))
                .agg(
                    F.sum((F.col("__c") * F.col("__c")).cast("double")).alias("h"),
                    F.max("__mm").alias("mm"),
                )
                .first()
            )
            hits_bound, m_max = float(row["h"] or 0.0), int(row["mm"] or 0)
        else:
            # one fused job (mirrors the q49c branch): per-gram df AND
            # per-doc distinct-gram size ride the same exploded frame.
            # max df rides along too — it is exactly the hot-feature
            # prescreen's census max, so the bound path can hand it to
            # salted_hot_feature_join and pay ZERO extra actions over
            # the monolith (this job replaces the prescreen's own).
            row = (
                arrays.select(
                    F.size(F.array_distinct("gs")).alias("m"),
                    F.explode(F.array_distinct("gs")).alias("g"),
                )
                .groupBy("g")
                .agg(F.count(F.lit(1)).alias("__c"), F.max("m").alias("__mm"))
                .agg(
                    F.sum((F.col("__c") * F.col("__c")).cast("double")).alias("h"),
                    F.max("__mm").alias("mm"),
                    F.max("__c").alias("rmax"),
                )
                .first()
            )
            hits_bound, m_max = float(row["h"] or 0.0), int(row["mm"] or 0)
            gram_max = int(row["rmax"] or 0)
        bound_rows = hits_bound * 2.0 * m_max
        if bound_rows * GROUPED_VERIFY_ROW_BYTES <= budget:
            LAST_GROUPED_SIZING.clear()
            LAST_GROUPED_SIZING.update(
                op=op,
                mode="bound_prescreen",
                est_rows=int(min(bound_rows, float(2**62))),
                est_bytes=int(
                    min(bound_rows * GROUPED_VERIFY_ROW_BYTES, float(2**62))
                ),
                budget_bytes=budget,
                n_chunks=1,
            )
            if op == "q49c":
                result = ppjoin_verify(toks, cand, suffix=suffix)
            else:
                nrm = tf.groupBy("doc_id").agg(
                    F.sum(F.col("w") * F.col("w")).alias("n2")
                )
                cand, suffix = allpairs_candidates(
                    tf,
                    nrm,
                    gram_counts=gram_counts,
                    split_verify=True,
                    gram_max=gram_max,
                )
                result = allpairs_verify(tf, nrm, cand, suffix=suffix)
            if not pins:
                # plaintext scratch (q49e/q55d): nothing is pinned, so
                # hand the lazy monolithic frame straight back — the
                # caller's one action computes it end to end, exactly
                # like q49c/q55c
                return result
            # encrypted-lake path (q49f): the MEMORY_ONLY decrypt pins
            # must outlive every consumer, so materialize the ANSWER
            # frame (id pairs + exact scores — plaintext by the same
            # keyless-id convention as the chunk outputs) before
            # releasing them
            out = f"{work}/out/chunk_0"
            try:
                schema = result.schema
                result.write.mode("overwrite").parquet(out)
            finally:
                for p in pins:
                    p.unpersist()
            return spark.read.schema(schema).parquet(out)
        LAST_GROUPED_SIZING.clear()  # the exact census below re-records

    # ---- exact-census path: chunking forced, or the bound exceeds the
    # scratch budget. Independent scratch writes overlap via a small
    # driver thread pool (guide §2.6): the materializations are separate
    # Spark jobs with no mutual dependency, and running them serially
    # left the session idling through each write's task tail — part of
    # the measured grouped job-chain floor.
    from concurrent.futures import ThreadPoolExecutor

    if op == "q49c":
        with ThreadPoolExecutor(max_workers=3) as pool:
            f_toks = pool.submit(_materialize, toks, "toks", ("tok",))
            # the suffix posting frame every chunk's verify fan-out reads
            # (r15, split verify — see ppjoin_verify): materialized once
            # so chunks neither re-run the prefix window nor re-decrypt
            f_suffix = pool.submit(_materialize, suffix, "suffix", ("tok",))
            f_cand = pool.submit(_materialize, cand, "cand")
            toks_m = f_toks.result()
            suffix_m = f_suffix.result()
            cand_m = f_cand.result()

        def _verify(part: DataFrame, salted: bool) -> DataFrame:
            return ppjoin_verify(toks_m, part, salted=salted, suffix=suffix_m)

    else:
        # m (distinct grams per doc) rides on the norm frame so the
        # sizing census reads per-doc posting sizes from the TINY nrm
        # parquet instead of re-aggregating the full postings scratch
        # (r15; unused columns are pruned from every other nrm consumer)
        nrm = tf.groupBy("doc_id").agg(
            F.sum(F.col("w") * F.col("w")).alias("n2"),
            F.count(F.lit(1)).alias("m"),
        )
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_tf = pool.submit(_materialize, tf, "tf", ("g",))
            f_nrm = pool.submit(_materialize, nrm, "nrm")
            tf_m = f_tf.result()
            nrm_m = f_nrm.result()
        cand, suffix = allpairs_candidates(
            tf_m,
            nrm_m,
            gram_counts=gram_counts,
            split_verify=True,
            gram_max=gram_max,
        )
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_cand = pool.submit(_materialize, cand, "cand")
            f_suffix = pool.submit(_materialize, suffix, "suffix", ("g",))
            cand_m = f_cand.result()
            suffix_m = f_suffix.result()

        def _verify(part: DataFrame, salted: bool) -> DataFrame:
            return allpairs_verify(
                tf_m, nrm_m, part, salted=salted, suffix=suffix_m
            )

    def _cand_census(with_sizing: bool) -> tuple[int, int]:
        """(est incidence rows, max per-doc_a candidate count) over the
        materialized candidate parquet — ONE job for both the chunk
        sizing and the verify-salt decision (r15: these were two
        separate actions; the per-doc_a grouping is shared work).
        ``with_sizing=False`` (explicit/env n_chunks) skips the size
        columns so the census stays a bare pair-count aggregate."""
        if not with_sizing:
            sized = cand_m.select("doc_a", F.lit(0).alias("ma"), F.lit(0).alias("mb"))
        elif {"ma", "mb"} <= set(cand_m.columns):
            sized = cand_m
        else:
            sa = nrm_m.select(F.col("doc_id").alias("doc_a"), F.col("m").alias("ma"))
            sb = nrm_m.select(F.col("doc_id").alias("doc_b"), F.col("m").alias("mb"))
            sized = cand_m.join(sa, "doc_a").join(sb, "doc_b")
        per_a = sized.groupBy("doc_a").agg(
            F.count(F.lit(1)).alias("__vn"),
            F.sum(F.col("ma") + F.col("mb")).alias("__rows"),
        )
        row = per_a.agg(
            F.sum("__rows").alias("rows"), F.max("__vn").alias("vmax")
        ).first()
        return int(row["rows"] or 0), int(row["vmax"] or 0)

    if forced is not None:
        n_chunks = forced
        _, vmax = _cand_census(with_sizing=False)
    else:
        import math as _math

        est_rows, vmax = _cand_census(with_sizing=True)
        n_chunks = max(
            1,
            min(
                GROUPED_MAX_CHUNKS,
                int(_math.ceil(est_rows * GROUPED_VERIFY_ROW_BYTES / budget)),
            ),
        )
        LAST_GROUPED_SIZING.clear()
        LAST_GROUPED_SIZING.update(
            op=op,
            mode="exact_census",
            est_rows=est_rows,
            est_bytes=est_rows * GROUPED_VERIFY_ROW_BYTES,
            budget_bytes=budget,
            n_chunks=n_chunks,
        )

    # ONE census over the full materialized candidate frame decides
    # verify salting for every chunk (a residue class's per-doc_a counts
    # are bounded by the full frame's, so "no hot doc_a overall" implies
    # none in any chunk) — the dormant-by-default contract costs one
    # cheap parquet aggregate FOLDED INTO the sizing job (VERDICT r13
    # #2 / r15; the salt itself engages only for true mega-fanout docs,
    # see VERIFY_SALT_PAIR_TARGET).
    verify_salted = vmax > VERIFY_SALT_PAIR_TARGET
    schema = None
    chunk_dirs = []
    try:
        for i in range(n_chunks):
            out = f"{work}/out/chunk_{i}"
            part = _verify(verify_chunk(cand_m, i, n_chunks), verify_salted)
            schema = part.schema
            part.write.mode("overwrite").parquet(out)
            chunk_dirs.append(out)
    finally:
        # release the decrypted MEMORY_ONLY pins: every consumer (the
        # chunk verify jobs) has run; the returned frame reads only the
        # chunk parquet directories
        for p in pins:
            p.unpersist()
    return spark.read.schema(schema).parquet(*chunk_dirs)


@register(
    "q49e_jaccard_ppjoin_grouped",
    oracle=_ppjoin_oracle(),
    tags=("dedup", "jaccard", "ppjoin", "grouped-execution"),
)
def q49e_jaccard_ppjoin_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q49c (EXACT global Jaccard join, PPJoin prefix filtering) executed
    in bounded-spill groups: same candidates, same verify plan, same
    answer frame — but the verify fan-out runs one doc_a residue class
    at a time over a materialized candidate/posting scratch, capping the
    live pair-token shuffle at ~1/n_chunks of the monolith's. The shape
    that finished sf10 in 920.5 s where the monolithic join overflowed
    78 GB of scratch (SF10_r10.json); oracle and output identical to
    q49c by the residue-partition lemma."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    return grouped_exact_join(spark, docs, "q49c")


@register(
    "q49f_jaccard_grouped_encrypted",
    oracle=_ppjoin_oracle(),
    tags=("dedup", "jaccard", "ppjoin", "grouped-execution", "encryption"),
)
def q49f_jaccard_grouped_encrypted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full PME-envelope composition of the grouped exact join
    (VERDICT r11 #4, closed driver-visibly): documents are read from the
    ENCRYPTED lake (q47e's fixture — text under the CONFIDENTIAL key,
    doc_id plaintext) and the bounded-spill q49e execution runs with
    ``encrypt_scratch=True``, so the content DERIVATIVES the grouped
    plan materializes (token postings, which reconstruct text n-grams)
    are PME-encrypted on scratch disk too — no content-bearing
    MATERIALIZATION (scratch parquet, cache/checkpoint block) leaves the
    envelope between the lake and the answer frame. Scope (ADVICE r14):
    the verify joins still hash-shuffle plaintext tok values, so shuffle
    files/spill sit outside the envelope unless the deployment also sets
    ``spark.io.encryption.enabled`` — see _content_checkpoint. The
    answer (id pairs + exact Jaccard) is plaintext by the same
    convention that keeps doc_id keyless in the lake. Sharing q49c's
    plaintext brute-force oracle makes the whole composition
    hash-checkable: encryption at rest AND in scratch changes nothing
    about the join. Scale: q49e's shape (auto-sized residue-class
    chunks) plus ONE encrypt pass and ONE decrypt pass per posting
    materialization — since r14 the decrypting scratch read is pinned
    MEMORY_ONLY for the chunk loop's lifetime (VERDICT r13 #4), so the
    per-chunk/per-join-side re-decrypt multiplier is gone; an evicted
    block recomputes through the decrypting scan (never spilled
    plaintext — see _content_checkpoint, which also keeps the shingle
    checkpoint off executor disk on this path)."""
    prep(spark)
    enc_path = _encrypted_docs_dir(spark, sf_dir)
    # Decrypting lake scan, pinned once (r14): jar-equipped sessions take
    # the NATIVE parquet-mr path at ~plain-scan speed (vs ~5x for the
    # arrow path this query used through r13 — the bulk of its 1.9x
    # premium over q49e); vanilla sessions fall back to the arrow scan,
    # still read exactly once. Released when the grouped join returns.
    lake_pins: list = []
    docs = _decrypting_pinned_read(spark, enc_path, "CONFIDENTIAL", lake_pins)
    try:
        return grouped_exact_join(spark, docs, "q49c", encrypt_scratch=True)
    finally:
        for p in lake_pins:
            p.unpersist()


@register(
    "q55d_allpairs_sparse_grouped",
    oracle=_allpairs_oracle(),
    tags=("dedup", "similarity", "allpairs", "grouped-execution"),
)
def q55d_allpairs_sparse_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q55c (EXACT all-pairs sparse cosine, Bayardo prefix filtering)
    executed in bounded-spill groups — the q55c twin of q49e; see
    :func:`grouped_exact_join`. Same integer verify arithmetic, same
    answer frame, same brute-force oracle; at sf10 this shape finished
    in 1057.5 s with pair fingerprints exactly equal to the q49c-family
    monolith invariant (SF10_r10.json)."""
    prep(spark)
    docs = load(spark, sf_dir, "documents")
    return grouped_exact_join(spark, docs, "q55c")
