"""Property-based tests (hypothesis) for the pure-Python cores: key
wrapping, the privilege lattice, and the portable hash/shingle helpers."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_modular_encryption_spark.crypto import kms_core
from parquet_modular_encryption_spark.crypto.policy import (
    Privilege,
    can_unwrap,
)

keys8 = st.binary(min_size=16, max_size=64).filter(lambda b: len(b) % 8 == 0)
keks = st.sampled_from(list(kms_core.WRAPPING_KEYS.values()))


@given(kek=keks, key=keys8)
@settings(max_examples=200)
def test_wrap_unwrap_identity(kek, key):
    assert kms_core.unwrap(kek, kms_core.wrap(kek, key)) == key


@given(kek=keks, key=keys8, flip=st.integers(min_value=0))
@settings(max_examples=100)
def test_tampered_blob_always_rejected(kek, key, flip):
    blob = kms_core.wrap(kek, key)
    i = flip % len(blob)
    tampered = blob[:i] + bytes([blob[i] ^ 1]) + blob[i + 1 :]
    try:
        result = kms_core.unwrap(kek, tampered)
    except kms_core.KeyValidationError:
        return
    # AES-KW (RFC 3394) authenticates via its integrity check value: any
    # single-bit flip anywhere in the wrapped blob must fail the unwrap ICV
    raise AssertionError(f"tampered blob accepted: {result!r}")


@given(kek=keks, other=keks, key=keys8)
@settings(max_examples=100)
def test_wrong_kek_rejected(kek, other, key):
    if kek == other:
        return
    blob = kms_core.wrap(kek, key)
    try:
        kms_core.unwrap(other, blob)
    except kms_core.KeyValidationError:
        return
    raise AssertionError("unwrap succeeded with the wrong KEK")


@given(
    token=st.sampled_from([None, "PUBLIC", "INTERNAL", "CONFIDENTIAL", "RESTRICTED", "garbage"]),
    level=st.sampled_from(list(Privilege)),
)
def test_lattice_monotone(token, level):
    """If a token can unwrap a level, every stronger token can too."""
    if can_unwrap(token, level.name):
        for stronger in Privilege:
            if token in Privilege.__members__ and stronger >= Privilege[token]:
                assert can_unwrap(stronger.name, level.name)
    # PUBLIC keys unwrap for everyone, including no token
    assert can_unwrap(token, "PUBLIC")


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=100)
def test_python_hash60_range(s):
    """The portable 60-bit hash stays in [0, 2^60) — headroom for MinHash
    modular arithmetic in a signed 64-bit lane (python reference of the
    SQL/Spark construction)."""
    import hashlib

    h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert 0 <= h < 1 << 60


def test_approx_percentiles_within_tolerance(spark):
    """q87's sketch values must bracket the exact rank within ε·n ranks."""
    from parquet_modular_encryption_spark.operators.grouping import (
        q87_approx_percentiles,
    )

    sf = "/root/testdata/sf0.01"
    approx = {r.l_returnflag: r for r in q87_approx_percentiles(spark, sf).collect()}
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    for flag, row in approx.items():
        vals = sorted(
            v.l_extendedprice
            for v in li.filter(li.l_returnflag == flag).select("l_extendedprice").collect()
        )
        n = len(vals)
        for q, got in ((0.25, row.p25), (0.5, row.p50), (0.75, row.p75), (0.95, row.p95)):
            # rank of the sketch answer must be within ε·n of the target rank
            import bisect

            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            target = q * n
            eps_ranks = max(2.0, 1e-4 * n * 2)
            assert lo - eps_ranks <= target <= hi + eps_ranks, (
                f"{flag} p{int(q*100)}: value {got} at ranks [{lo},{hi}], "
                f"target {target}"
            )


def test_q28_hll_within_bound_of_duckdb_exact(spark, duck, sf_dir):
    """q28's HLL++ estimates must land within the sketch's published error
    bound of the EXACT answer computed by an independent engine (DuckDB
    COUNT(DISTINCT)) — the tolerance-banded cross-check for a rows-only
    sketch query. rsd=0.02 is the one-sigma relative standard deviation;
    3 sigma = 6% bounds the estimate with ~99.7% confidence, floored at
    +-2 for the small-cardinality regime where HLL++ uses exact sparse
    counting anyway."""
    from parquet_modular_encryption_spark.operators.relational import (
        q28_approx_distinct,
    )

    got = {r.l_returnflag: r for r in q28_approx_distinct(spark, sf_dir).collect()}
    rows = duck.sql(
        """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_orderkey), COUNT(*)
        FROM lineitem GROUP BY l_returnflag
        """
    ).fetchall()
    assert len(rows) == len(got)
    for flag, parts, orders, n in rows:
        r = got[flag]
        assert abs(r.approx_parts - parts) <= max(0.06 * parts, 2), (
            f"{flag}: HLL parts {r.approx_parts} vs exact {parts}"
        )
        assert abs(r.approx_orders - orders) <= max(0.06 * orders, 2), (
            f"{flag}: HLL orders {r.approx_orders} vs exact {orders}"
        )
        assert r.n_rows == n


def test_q87_gk_within_bound_of_duckdb_exact(spark, duck, sf_dir):
    """q87's Greenwald-Khanna values must land within the sketch's rank
    guarantee of the exact distribution held by an independent engine:
    accuracy 10000 => epsilon = 1e-4, i.e. the returned value's rank is
    within eps*n of the target rank. We bracket each sketch value between
    DuckDB's exact discrete quantiles at q -+ eps_rank/n (eps_rank floored
    at 2 ranks to absorb the engines' different rank-rounding conventions
    at small n)."""
    from parquet_modular_encryption_spark.operators.grouping import (
        q87_approx_percentiles,
    )

    approx = {r.l_returnflag: r for r in q87_approx_percentiles(spark, sf_dir).collect()}
    for flag, row in approx.items():
        n = row.n_rows
        eps_q = max(2.0, 2 * 1e-4 * n) / n
        for q, got in ((0.25, row.p25), (0.5, row.p50), (0.75, row.p75), (0.95, row.p95)):
            lo_q, hi_q = max(0.0, q - eps_q), min(1.0, q + eps_q)
            lo, hi = duck.sql(
                f"""
                SELECT quantile_disc(l_extendedprice, {lo_q}),
                       quantile_disc(l_extendedprice, {hi_q})
                FROM lineitem WHERE l_returnflag = '{flag}'
                """
            ).fetchone()
            assert float(lo) <= got <= float(hi), (
                f"{flag} p{int(q * 100)}: sketch {got} outside exact band "
                f"[{lo}, {hi}] (eps_q={eps_q:.5f}, n={n})"
            )


def _py_winnow(norm: str, k: int, w: int) -> set[int]:
    """Pure-Python mirror of textops.winnow_fingerprints' SQL construction
    (same md5-based 60-bit gram hash, same windowed minima)."""
    import hashlib

    if len(norm) < k + w - 1:
        return set()
    hs = [
        int(hashlib.md5(norm[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(norm) - k + 1)
    ]
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


@given(
    shared=st.text(alphabet="abcdefghij", min_size=11, max_size=40),
    pre_a=st.text(alphabet="klmnopqrst", min_size=0, max_size=30),
    suf_a=st.text(alphabet="klmnopqrst", min_size=0, max_size=30),
    pre_b=st.text(alphabet="uvwxyz", min_size=0, max_size=30),
    suf_b=st.text(alphabet="uvwxyz", min_size=0, max_size=30),
)
@settings(max_examples=150)
def test_winnowing_theorem_property(shared, pre_a, suf_a, pre_b, suf_b):
    """The winnowing guarantee (Schleimer et al., SIGMOD'03) over random
    documents: ANY shared substring of length >= k + w - 1 (= 11 for the
    production k=8, w=4) forces at least one shared selected fingerprint,
    whatever surrounds it — the property the q45b candidate generator
    relies on for recall. Also pins the selection invariant: every
    fingerprint is one of the document's gram hashes."""
    from parquet_modular_encryption_spark.pipeline.textops import (
        WINNOW_K,
        WINNOW_W,
    )

    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    a, b = pre_a + shared + suf_a, pre_b + shared + suf_b
    fa, fb = _py_winnow(a, WINNOW_K, WINNOW_W), _py_winnow(b, WINNOW_K, WINNOW_W)
    assert fa & fb, "shared passage produced no shared fingerprint"
    for norm, fps in ((a, fa), (b, fb)):
        grams = {
            int(__import__("hashlib").md5(norm[i : i + WINNOW_K].encode()).hexdigest()[:15], 16)
            for i in range(len(norm) - WINNOW_K + 1)
        }
        assert fps <= grams


def _py_dup_spans(norms: dict[int, str], k: int) -> dict[int, list[tuple[int, int]]]:
    """Pure-Python mirror of textops.dup_substring_spans' construction:
    stride-1 k-gram occurrence counts, hits where count >= 2, per-doc
    merge of overlapping-or-adjacent [s, s+k-1] intervals (1-based)."""
    from collections import Counter

    cnt: Counter = Counter()
    grams: dict[int, list[str]] = {}
    for d, n in norms.items():
        if len(n) < k:
            continue
        g = [n[i : i + k] for i in range(len(n) - k + 1)]
        grams[d] = g
        cnt.update(g)
    spans: dict[int, list[tuple[int, int]]] = {}
    for d, g in grams.items():
        merged: list[tuple[int, int]] = []
        for i, x in enumerate(g):
            if cnt[x] < 2:
                continue
            s, e = i + 1, i + k
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        if merged:
            spans[d] = merged
    return spans


@given(
    shared=st.text(alphabet="abcdefghij", min_size=20, max_size=60),
    pre_a=st.text(alphabet="klmnopqrst", min_size=0, max_size=40),
    suf_a=st.text(alphabet="klmnopqrst", min_size=0, max_size=40),
    pre_b=st.text(alphabet="uvwxyz", min_size=0, max_size=40),
    suf_b=st.text(alphabet="uvwxyz", min_size=0, max_size=40),
)
@settings(max_examples=150)
def test_dup_substring_span_coverage_property(shared, pre_a, suf_a, pre_b, suf_b):
    """q45c's exactness guarantee over random documents: a shared run of
    length >= k is FULLY covered by a detected duplicated span in both
    documents (stride-1 grams leave no gap — the property Lee et al.
    get from suffix arrays), while a document sharing nothing stays
    span-free. Alphabets are disjoint so the only >= k-char repeat is
    the planted passage."""
    from parquet_modular_encryption_spark.pipeline.textops import SUBDUP_K

    assert len(shared) >= SUBDUP_K
    a, b = pre_a + shared + suf_a, pre_b + shared + suf_b
    # all-distinct codepoints: no within-doc gram repeat (a run like
    # "AAA..." would legitimately self-match — within-doc duplicates
    # count by design) and disjoint from every lowercase doc
    unique = "".join(chr(0x100 + i) for i in range(SUBDUP_K * 3))
    spans = _py_dup_spans({1: a, 2: b, 3: unique}, SUBDUP_K)
    assert 3 not in spans, "unique doc got a duplicated span"
    for doc, text, pre in ((1, a, pre_a), (2, b, pre_b)):
        region = (len(pre) + 1, len(pre) + len(shared))
        covering = [
            (s, e) for s, e in spans.get(doc, []) if s <= region[0] and e >= region[1]
        ]
        assert covering, (
            f"doc {doc}: shared run {region} not covered by spans {spans.get(doc)}"
        )


# ---------------------------------------------------------------------------
# Prefix-filter candidate-superset guarantees (q55c / q49c)
# ---------------------------------------------------------------------------
# Pure-Python mirrors of the SQL constructions (the winnowing-theorem test
# pattern): the mathematical guarantee — every pair meeting the similarity
# threshold shares an indexed prefix feature — must hold on arbitrary
# corpora, not just the fixed adversarial fixtures.

_words = st.sampled_from([f"w{i}" for i in range(12)])
_doc = st.lists(_words, min_size=1, max_size=40)
_corpus = st.lists(_doc, min_size=2, max_size=12)


def _tf_vectors(corpus):
    vecs = []
    for toks in corpus:
        grams = (
            [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            if len(toks) >= 3
            else [" ".join(toks)]
        )
        v = {}
        for g in grams:
            v[g] = v.get(g, 0) + 1
        vecs.append(v)
    return vecs


@settings(max_examples=150, deadline=None)
@given(corpus=_corpus)
def test_bayardo_prefix_superset(corpus):
    """q55c's suffix bound: order features by (df DESC, g), drop the
    initial run with cumulative sum(x_hat * maxw) < t - eps from the
    index — every pair with cosine >= t must still share a prefix
    feature of its smaller-id member."""
    import itertools
    import math

    from parquet_modular_encryption_spark.pipeline.dedup import (
        ALLPAIRS_PREFIX_EPS,
        ALLPAIRS_T_DEN,
        ALLPAIRS_T_NUM,
    )

    t = ALLPAIRS_T_NUM / ALLPAIRS_T_DEN
    vecs = _tf_vectors(corpus)
    norms = [math.sqrt(sum(w * w for w in v.values())) for v in vecs]
    df = {}
    for v in vecs:
        for g in v:
            df[g] = df.get(g, 0) + 1
    maxw = {}
    for v, n in zip(vecs, norms):
        for g, w in v.items():
            maxw[g] = max(maxw.get(g, 0.0), w / n)

    prefixes = []
    for v, n in zip(vecs, norms):
        feats = sorted(v, key=lambda g: (-df[g], g))
        cum, pref = 0.0, set()
        for g in feats:
            cum += (v[g] / n) * maxw[g]
            if cum >= t - ALLPAIRS_PREFIX_EPS:
                pref.add(g)
        prefixes.append(pref)

    for a, b in itertools.combinations(range(len(vecs)), 2):
        va, vb = vecs[a], vecs[b]
        dot = sum(w * vb[g] for g, w in va.items() if g in vb)
        if ALLPAIRS_T_DEN**2 * dot * dot >= ALLPAIRS_T_NUM**2 * (
            sum(w * w for w in va.values()) * sum(w * w for w in vb.values())
        ) and dot > 0:
            assert prefixes[a] & set(vb), (
                f"qualifying pair ({a},{b}) shares no prefix feature of {a}"
            )


@settings(max_examples=150, deadline=None)
@given(corpus=_corpus)
def test_ppjoin_prefix_superset(corpus):
    """q49c's PPJoin bound: order tokens by (df ASC, tok), index the first
    m - ceil(t*m) + 1 of each set — every pair with Jaccard >= t shares
    an indexed prefix token of its smaller-id member, and passes the
    length filter."""
    import itertools

    from parquet_modular_encryption_spark.pipeline.dedup import (
        PPJOIN_T_DEN,
        PPJOIN_T_NUM,
    )

    sets = [set(v) for v in _tf_vectors(corpus)]
    df = {}
    for s in sets:
        for g in s:
            df[g] = df.get(g, 0) + 1
    num, den = PPJOIN_T_NUM, PPJOIN_T_DEN

    prefixes = []
    for s in sets:
        m = len(s)
        p = m - -(-num * m // den) + 1  # m - ceil(num*m/den) + 1
        feats = sorted(s, key=lambda g: (df[g], g))
        prefixes.append(set(feats[:p]))

    for a, b in itertools.combinations(range(len(sets)), 2):
        sa, sb = sets[a], sets[b]
        i = len(sa & sb)
        u = len(sa | sb)
        if den * i >= num * u and i > 0:
            assert den * len(sb) >= num * len(sa), "length filter rejected a true pair"
            assert den * len(sa) >= num * len(sb), "length filter rejected a true pair"
            assert prefixes[a] & sb, (
                f"qualifying pair ({a},{b}) shares no prefix token of {a}"
            )


@settings(max_examples=150, deadline=None)
@given(corpus=_corpus, split=st.lists(st.booleans(), min_size=2, max_size=12))
def test_ppjoin_incremental_superset(corpus, split):
    """q49d's one-sided bound: rank each BATCH set's tokens by the
    CORPUS-side df (unseen tokens df 0 — arbitrarily stale ranking),
    index the first m - ceil(t*m) + 1 — every cross-split pair with
    Jaccard >= t still shares an indexed batch-prefix token, because the
    superset lemma holds under ANY total order."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        PPJOIN_T_DEN,
        PPJOIN_T_NUM,
    )

    sets = [set(v) for v in _tf_vectors(corpus)]
    flags = [split[i % len(split)] for i in range(len(sets))]  # True = corpus
    df = {}
    for s, fl in zip(sets, flags):
        if fl:
            for g in s:
                df[g] = df.get(g, 0) + 1
    num, den = PPJOIN_T_NUM, PPJOIN_T_DEN

    for a, sa in enumerate(sets):
        if flags[a]:
            continue
        m = len(sa)
        p = m - -(-num * m // den) + 1
        feats = sorted(sa, key=lambda g: (df.get(g, 0), g))
        pref = set(feats[:p])
        for b, sb in enumerate(sets):
            if not flags[b]:
                continue
            i = len(sa & sb)
            u = len(sa | sb)
            if den * i >= num * u and i > 0:
                assert pref & sb, (
                    f"qualifying cross pair ({a},{b}) shares no batch-prefix token"
                )


# ---------------------------------------------------------------------------
# q88f deterministic HLL: estimator accuracy, register mergeability, rho ladder
# ---------------------------------------------------------------------------


def test_q88f_hll_estimate_within_bound_of_exact(spark, sf_dir):
    """The full HLL decision rule (raw estimate, or linear counting from
    the shipped zero_registers when est <= 2.5m and V > 0 — applied here,
    outside the hash-checked core, exactly as the docstring prescribes)
    must land within 10% of the exact COUNT(DISTINCT) computed in the
    same query. m=1024 ⇒ ~3.25% sigma raw / ~2-4% LC at these loads; the
    sketch is deterministic given md5, so 10% (~3 sigma) is a stable pin,
    not a flaky tolerance."""
    import math

    from parquet_modular_encryption_spark.operators.relational import (
        HLL_M,
        q88f_hll_deterministic,
    )

    rows = q88f_hll_deterministic(spark, sf_dir).collect()
    assert rows, "q88f returned no groups"
    for r in rows:
        est = r.hll_est
        if est <= 2.5 * HLL_M and r.zero_registers > 0:
            est = HLL_M * math.log(HLL_M / r.zero_registers)
        assert abs(est - r.exact_distinct) <= 0.10 * r.exact_distinct, (
            f"{r.l_returnflag}: corrected HLL {est} vs exact {r.exact_distinct}"
        )


def test_q88f_hll_registers_merge_by_max(spark, sf_dir):
    """Sketch mergeability — the property that lets HLL registers compose
    across partitions, epochs, and streaming micro-batches: building
    registers on two disjoint halves of lineitem and MAX-merging them must
    reproduce the whole-corpus register frame exactly."""
    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.operators.relational import hll_registers
    from parquet_modular_encryption_spark.sources.datasets import load

    li = load(spark, sf_dir, "lineitem")
    key = F.concat(F.lit("pk:"), F.col("l_partkey").cast("string"))
    whole = hll_registers(li, "l_returnflag", key)
    halves = [
        hll_registers(li.filter(F.col("l_orderkey") % 2 == i), "l_returnflag", key)
        for i in (0, 1)
    ]
    merged = (
        halves[0]
        .unionByName(halves[1])
        .groupBy("l_returnflag", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    diff = whole.exceptAll(merged).unionByName(merged.exceptAll(whole))
    assert diff.count() == 0, "MAX-merge of split registers != whole-corpus registers"


def test_q88f_rho_ladder_exact_bit_positions(spark):
    """rho(w) boundary pins: all-zero w ⇒ RMAX; the highest representable
    w-bit ⇒ 1; each exact power of two sits on the correct rung (the CASE
    ladder exists precisely because float log2 is untrustworthy at these
    boundaries)."""
    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.operators.relational import (
        HLL_RMAX,
        HLL_WBITS,
        hll_rho_sql,
    )

    cases = [(0, HLL_RMAX), (1, HLL_WBITS), ((1 << (HLL_WBITS - 1)) - 1, 2)] + [
        (1 << k, HLL_WBITS - k) for k in range(0, HLL_WBITS, 7)
    ] + [(1 << (HLL_WBITS - 1), 1)]
    df = spark.createDataFrame([(w,) for w, _ in cases], "w long").select(
        "w", F.expr(hll_rho_sql("w")).alias("rho")
    )
    got = {r.w: r.rho for r in df.collect()}
    for w, want in cases:
        assert got[w] == want, f"rho({w}) = {got[w]}, want {want}"


# ---------------------------------------------------------------------------
# q88g deterministic DDSketch quantiles: guarantee, mergeability, bucket map
# ---------------------------------------------------------------------------


def test_q88g_ddsketch_error_within_guarantee(spark, sf_dir):
    """Every reported quantile must honor the log-linear map's relative-
    error guarantee: bucket edges ratio <= 17/16 ⇒ err < 1/17 (58824 ppm),
    with the sketch value never above the exact one (it reports the lower
    edge of the bucket containing the exact crossing value)."""
    from parquet_modular_encryption_spark.operators.relational import (
        q88g_ddsketch_quantiles,
    )

    rows = q88g_ddsketch_quantiles(spark, sf_dir).collect()
    assert len(rows) >= 4, "expected >= 1 group x 4 quantiles"
    for r in rows:
        assert r.sketch_cents <= r.exact_cents, (
            f"{r.l_returnflag} p{r.q_pct}: sketch {r.sketch_cents} above "
            f"exact {r.exact_cents}"
        )
        assert r.err_ppm <= 58824, (
            f"{r.l_returnflag} p{r.q_pct}: err {r.err_ppm} ppm breaks the "
            f"1/17 guarantee"
        )


def test_q88g_ddsketch_buckets_merge_by_sum(spark, sf_dir):
    """Bucket counts from two disjoint halves of lineitem SUM-merge into
    the whole-corpus bucket frame exactly — the composition property that
    lets the sketch ship per-partition/per-micro-batch state."""
    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.operators.relational import (
        _DDS_CENTS,
        dds_buckets,
    )
    from parquet_modular_encryption_spark.sources.datasets import load

    li = load(spark, sf_dir, "lineitem")
    cents = F.expr(_DDS_CENTS)
    whole = dds_buckets(li, "l_returnflag", cents)
    halves = [
        dds_buckets(li.filter(F.col("l_orderkey") % 2 == i), "l_returnflag", cents)
        for i in (0, 1)
    ]
    merged = (
        halves[0]
        .unionByName(halves[1])
        .groupBy("l_returnflag", "bucket", "rep")
        .agg(F.sum("c").alias("c"))
    )
    diff = whole.exceptAll(merged).unionByName(merged.exceptAll(whole))
    assert diff.count() == 0, "SUM-merge of split buckets != whole-corpus buckets"


def test_q88g_bucket_map_matches_python_reference(spark):
    """The generated bucket/rep SQL must agree with a transparent python
    reference on the boundary-heavy cases: the exact region's edge (15,
    16), octave edges (31/32, 2^k, 2^k - 1), and mid-bucket values."""
    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.operators.relational import (
        DDS_BITS,
        DDS_EXACT,
        DDS_SUB,
        _dds_bucket_rep_sql,
        bitlen_sql,
    )

    def ref(v: int) -> tuple[int, int]:
        if v < DDS_EXACT:
            return v, v
        k = v.bit_length() - 1
        m = (v >> (k - 4)) - DDS_SUB
        return DDS_SUB * k + m, (DDS_SUB + m) << (k - 4)

    cases = [0, 1, 15, 16, 17, 31, 32, 33, 255, 256, 257, 1023, 1024,
             (1 << 20) - 1, 1 << 20, (1 << 20) + (1 << 16), (1 << 39) - 1,
             1 << 39, 9_999_999, 10_000_001]
    bucket, rep = _dds_bucket_rep_sql("v", "bl", "DIV")
    df = (
        spark.createDataFrame([(v,) for v in cases], "v long")
        .select("v", F.expr(bitlen_sql("v", DDS_BITS)).alias("bl"))
        .select("v", F.expr(bucket).alias("bucket"), F.expr(rep).alias("rep"))
    )
    got = {r.v: (r.bucket, r.rep) for r in df.collect()}
    for v in cases:
        assert got[v] == ref(v), f"bucket_map({v}) = {got[v]}, want {ref(v)}"
