"""LLM-pipeline operator tests beyond oracle parity: multimodal plumbing,
ANN recall vs the exact baseline, sketch accuracy, language-ID sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_modular_encryption_spark.pipeline.multimodal import (
    decode_payload,
    extract_features,
    fake_payload,
    frame_sample,
    synthetic_media,
)

SF = "/root/testdata/sf0.001"


def test_multimodal_feature_extraction(spark):
    media = synthetic_media(spark, n=48).repartition(4)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 48
    by_id = {r.media_id: r for r in rows}
    # spot-check against a driver-side decode of the same payload
    expect = decode_payload(fake_payload(7, "audio", 32 + (7 % 7) * 16, 32 + (7 % 5) * 16))
    assert by_id[7].checksum == expect["checksum"]
    assert by_id[7].n_bytes == expect["n_bytes"]
    assert abs(by_id[7].mean_byte - expect["mean_byte"]) < 1e-12
    # schema stability (driver contract requirement for any mapInPandas op)
    assert [f.name for f in feats.schema.fields] == [
        "media_id", "modality", "n_bytes", "mean_byte", "checksum", "width", "height",
    ]


def test_resize_images_composes_with_feature_extraction(spark):
    """resize_images is a binary->binary Arrow-batched transform whose
    output feeds extract_features unchanged: resized payloads must carry
    the target dimensions and byte counts, values drawn from the source
    grid (nearest-neighbor), and the pipeline must stay distributed (no
    driver-side payloads)."""
    from parquet_modular_encryption_spark.pipeline.multimodal import (
        decode_payload,
        extract_features,
        fake_payload,
        resize_images,
        resize_payload,
        synthetic_media,
    )

    media = synthetic_media(spark, n=24).repartition(3)
    resized = resize_images(media, out_w=16, out_h=16)
    feats = extract_features(resized).collect()
    n_images = media.filter(F.col("modality") == "image").count()
    assert len(feats) == n_images > 0
    for r in feats:
        assert (r.width, r.height, r.n_bytes) == (16, 16, 256)
    # driver-side twin: identical bytes for the same media_id
    src = next(m for m in media.collect() if m.media_id == feats[0].media_id)
    expect = decode_payload(resize_payload(bytes(src.payload), 16, 16))
    got = next(r for r in feats if r.media_id == src.media_id)
    assert got.checksum == expect["checksum"]
    # upscale also exact (floor sampling is defined for both directions)
    up = decode_payload(resize_payload(fake_payload(3, "image", 32, 48), 64, 64))
    assert (up["width"], up["height"], up["n_bytes"]) == (64, 64, 4096)


def test_real_png_decode_roundtrip():
    """encode_png emits spec-valid PNGs; decode=real must header-parse the
    exact dimensions back out of the real bytes."""
    from parquet_modular_encryption_spark.pipeline.multimodal import (
        encode_png,
        sniff_dimensions,
    )

    for w, h in [(1, 1), (16, 48), (640, 480), (3, 257)]:
        png = encode_png(w, h, seed=w * 1000 + h)
        fmt, gw, gh, channels = sniff_dimensions(png)
        assert (fmt, gw, gh, channels) == ("png", w, h, 1)
        got = decode_payload(png, decode="real")
        assert (got["width"], got["height"]) == (w, h)
        assert got["n_bytes"] == len(png)
    # zlib must actually be able to re-inflate the IDAT (proves the file is
    # a real PNG, not just a lookalike header)
    import struct
    import zlib

    png = encode_png(16, 48, seed=1)
    i = 8
    while i < len(png):
        (length,) = struct.unpack(">I", png[i : i + 4])
        tag = png[i + 4 : i + 8]
        if tag == b"IDAT":
            raw = zlib.decompress(png[i + 8 : i + 8 + length])
            assert len(raw) == 48 * (16 + 1)  # scanlines + filter bytes
            break
        i += 12 + length
    else:
        raise AssertionError("no IDAT chunk")


def test_real_jpeg_gif_bmp_header_decode():
    """Header parse for the other real containers: a structurally valid
    JPEG marker stream (APP0 + DQT before SOF0, as real encoders emit),
    a GIF89a screen descriptor, and a BITMAPINFOHEADER BMP."""
    import struct

    from parquet_modular_encryption_spark.pipeline.multimodal import sniff_dimensions

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    jpeg = (
        b"\xff\xd8"  # SOI
        + seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")  # APP0
        + seg(0xDB, b"\x00" + bytes(64))  # DQT
        + seg(0xC0, b"\x08" + struct.pack(">HH", 480, 640) + b"\x03" + bytes(9))  # SOF0
        + seg(0xDA, b"\x01\x01\x00")  # SOS — walker must stop here
        + b"\x12\x34\xff\xd9"
    )
    assert sniff_dimensions(jpeg) == ("jpeg", 640, 480, 3)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert sniff_dimensions(gif) == ("gif", 320, 200, 3)

    bmp = (
        b"BM"
        + struct.pack("<IHHI", 122, 0, 0, 122)
        + struct.pack("<IiiHH", 40, 24, -32, 1, 24)  # negative height = top-down
        + bytes(24)
    )
    assert sniff_dimensions(bmp) == ("bmp", 24, 32, 3)

    with pytest.raises(ValueError, match="unrecognized"):
        sniff_dimensions(b"NOTANIMAGEFORMAT")


def test_real_decode_distributed(spark):
    """decode=real through the actual mapInPandas operator: real PNG bytes
    in, parsed dimensions out, executed on executors not the driver."""
    from parquet_modular_encryption_spark.pipeline.multimodal import encode_png

    rows = [
        (i, "image", bytearray(encode_png(8 + i, 8 + 2 * i, seed=i)), None)
        for i in range(12)
    ]
    media = spark.createDataFrame(
        rows,
        "media_id bigint, modality string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    ).repartition(4)
    feats = {r.media_id: r for r in extract_features(media, decode="real").collect()}
    assert len(feats) == 12
    for i in range(12):
        assert (feats[i].width, feats[i].height) == (8 + i, 8 + 2 * i)


def test_frame_sampling(spark):
    media = synthetic_media(spark, n=30)
    frames = frame_sample(media, every_nth=10)
    rows = frames.collect()
    # videos have n_frames=30 → frames 0,10,20 per video
    n_videos = media.filter(F.col("modality") == "video").count()
    assert len(rows) == 3 * n_videos
    assert {r.frame_index for r in rows} == {0, 10, 20}


def test_ann_lsh_recall_vs_exact(spark):
    """LSH candidates must recover a reasonable share of the true top-5
    (8 hyperplanes on 64-dim random vectors is a coarse index; the
    measurement is what matters — recall is the tunable)."""
    from parquet_modular_encryption_spark.pipeline.similarity import (
        q50_knn_bruteforce,
        q54_ann_lsh_search,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in q50_knn_bruteforce(spark, SF).filter(F.col("rank") <= 5).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in q54_ann_lsh_search(spark, SF).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"


def test_approx_distinct_accuracy(spark):
    from parquet_modular_encryption_spark.operators.relational import q28_approx_distinct

    got = {r.l_returnflag: r for r in q28_approx_distinct(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r.l_returnflag: (r.parts, r.orders)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_orderkey").alias("orders"),
        )
        .collect()
    }
    for flag, (parts, orders) in exact.items():
        assert abs(got[flag].approx_parts - parts) / parts < 0.05
        assert abs(got[flag].approx_orders - orders) / orders < 0.05


def test_langid_prefers_english_saladtext(spark):
    """The synthetic corpus is English-ish word salad; the trigger heuristic
    should classify the bulk as 'en' or 'und', never crash, and cover all
    docs exactly once."""
    from parquet_modular_encryption_spark.pipeline.textops import q44_langid

    rows = q44_langid(spark, SF).collect()
    total = sum(r.n_docs for r in rows)
    assert total == spark.read.parquet(f"{SF}/documents.parquet").count()
    preds = {r.predicted_lang for r in rows}
    assert preds <= {"en", "de", "fr", "es", "zh", "und"}


def test_neardup_clusters_match_union_find(spark):
    """Distributed label propagation must produce exactly the components a
    driver-side union-find computes on the same candidate pairs."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        connected_components,
        q47_minhash_neardup,
    )

    pairs = [(r.doc_a, r.doc_b) for r in q47_minhash_neardup(spark, SF).collect()]
    assert pairs, "expected some near-dup pairs at sf0.001"

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    want = {n: find(n) for n in parent}

    got_df = connected_components(
        spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    )
    got = {r.node: r.component for r in got_df.collect()}
    assert got == want


def test_connected_components_two_jobs_per_iteration(spark):
    """The convergence probe must ride the propagation pass: each
    iteration launches exactly the eager localCheckpoint job plus one
    scan of the checkpointed labels — no extra join job against the
    previous labels (the r6 implementation's per-iteration overhead)."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        connected_components,
    )

    # chain 0-1-2-3-4 + isolated pair: several propagation rounds
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    sc = spark.sparkContext
    # AQE materializes every query stage as its own job, which would make
    # the count measure Catalyst's stage accounting instead of the loop's
    # structure; with it off, each iteration is exactly (checkpoint job,
    # convergence-probe job).
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("cc-jobs", "connected components job count")
    try:
        stats: dict = {}
        labels = connected_components(pairs, stats=stats)
        labels.collect()
    finally:
        sc.setJobGroup("", "")
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    jobs = sc.statusTracker().getJobIdsForGroup("cc-jobs")
    iters = stats["iterations"]
    assert iters >= 3  # the chain actually exercised propagation
    # 2 jobs per iteration + the one-time edges checkpoint (r16: rounds
    # must read materialized edges, not re-run the pair pipeline) + the
    # final collect
    assert len(jobs) <= 2 * iters + 2, (
        f"{len(jobs)} jobs for {iters} iterations — convergence check is "
        "launching extra per-iteration work"
    )


def test_pagerank_matches_exact_integer_reference(spark):
    """q57b core against a pure-Python integer PageRank with the same
    fixed-point arithmetic: since every operation is exact BIGINT math
    (r DIV deg, (sum * 17) DIV 20), the distributed result must equal
    the single-threaded reference BIT-FOR-BIT, not approximately. Also
    pins the semantics: a hub node outranks leaves."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        PAGERANK_ITERS,
        PAGERANK_SCALE,
        pagerank_fixed_point,
    )

    # star (hub 0, leaves 1-4) + a triangle (10, 11, 12) + an isolated pair
    pairs = [(0, i) for i in (1, 2, 3, 4)] + [(10, 11), (10, 12), (11, 12), (20, 21)]
    df = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")

    # single-threaded exact-integer reference
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    r = {n: PAGERANK_SCALE for n in adj}
    base = PAGERANK_SCALE * 15 // 100
    for _ in range(PAGERANK_ITERS):
        nxt = {n: 0 for n in adj}
        for u, nbrs in adj.items():
            c = r[u] // len(nbrs)
            for v in nbrs:
                nxt[v] += c
        r = {n: base + (s * 17) // 20 for n, s in nxt.items()}

    out = {row.doc_id: row for row in pagerank_fixed_point(df).collect()}
    assert set(out) == set(adj)
    for n in adj:
        assert out[n].degree == len(adj[n])
        assert out[n].rank_fp == r[n], f"node {n}: {out[n].rank_fp} != {r[n]}"
    # hub centrality: the star hub outranks every leaf
    assert all(out[0].rank_fp > out[i].rank_fp for i in (1, 2, 3, 4))


def test_ml_minhash_overlaps_handrolled(spark):
    """Spark ML's MinHashLSH and the hand-rolled q47 pipeline hunt the same
    ground truth; their verified pair sets must substantially overlap."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        q47_minhash_neardup,
        q58_ml_minhash_lsh,
    )

    ours = {(r.doc_a, r.doc_b) for r in q47_minhash_neardup(spark, SF).collect()}
    ml = {(r.doc_a, r.doc_b) for r in q58_ml_minhash_lsh(spark, SF).collect()}
    assert ml, "ML MinHashLSH found no pairs"
    # both are LSH approximations of the same Jaccard graph: require
    # meaningful agreement, not equality (different hash families)
    overlap = len(ours & ml) / max(1, len(ours))
    assert overlap >= 0.5, f"overlap {overlap}: ours={len(ours)} ml={len(ml)}"


def test_bloom_prepass_no_false_negatives(spark):
    """Bloom guarantee the q61b pipeline rests on: every train-side shingle
    must survive a probe of itself (no false negatives), and probing
    disjoint strings must prune most of them (bounded false positives)."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        bloom_build,
        bloom_probe,
    )

    train = spark.createDataFrame(
        [(f"present shingle {i}",) for i in range(500)], "shingle string"
    )
    bloom = bloom_build(train)
    # bitmap is bounded: at most M/64 words regardless of input size
    assert bloom.count() <= (1 << 22) // 64

    hits = bloom_probe(train, bloom).count()
    assert hits == 500, f"false negatives: {500 - hits} train shingles lost"

    absent = spark.createDataFrame(
        [(f"absent shingle {i}",) for i in range(500)], "shingle string"
    )
    fp = bloom_probe(absent, bloom).count()
    assert fp < 50, f"false-positive rate collapsed: {fp}/500"


def test_salted_banded_pairs_equal_plain_on_skew(spark):
    """banded_pairs_salted must produce exactly the pairs of the plain
    bucket self-join on an adversarially skewed bands frame (one hot
    bucket far above the threshold, plus scattered cold buckets), and the
    hot path must actually engage (bucket size > threshold)."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        HOT_BUCKET_THRESHOLD,
        banded_pairs,
        banded_pairs_salted,
    )

    hot_n = HOT_BUCKET_THRESHOLD * 5  # one boilerplate bucket of 40 docs
    rows = [(i, 0, "HOT") for i in range(hot_n)]
    rows += [(100 + i, 0, f"cold_{i % 7}") for i in range(21)]  # buckets of 3
    rows += [(200 + i, 1, "HOT") for i in range(2)]  # same key, other band
    bands = spark.createDataFrame(rows, "doc_id bigint, band_id int, band_key string")

    plain = sorted(map(tuple, banded_pairs(bands).distinct().collect()))
    salted = sorted(map(tuple, banded_pairs_salted(bands).distinct().collect()))
    assert plain == salted
    assert len(plain) >= hot_n * (hot_n - 1) // 2  # hot bucket contributed


def test_winnowing_guarantee(spark):
    """The winnowing theorem (Schleimer et al.): two documents sharing any
    substring of length >= k + w - 1 MUST share at least one selected
    fingerprint, however different their surroundings — and unrelated
    random-ish docs should share none."""
    from parquet_modular_encryption_spark.pipeline.textops import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    shared = "x" * 0 + "the quick brown fox jumps"  # >> k + w - 1 chars
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"zzz completely different prefix {shared}"),
            (3, "nothing in common with either of the others at all ok"),
        ],
        "doc_id bigint, text string",
    )
    fps = winnow_fingerprints(docs)
    by_doc = {
        r.doc_id: {x.fp for x in rows}
        for r in fps.select("doc_id").distinct().collect()
        for rows in [fps.filter(F.col("doc_id") == r.doc_id).collect()]
    }
    assert by_doc[1] & by_doc[2], "shared passage produced no shared fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnowing_boilerplate_cap(spark):
    """MOSS document-frequency cap adversarial test: a boilerplate passage
    injected into 500 documents must NOT produce ~500^2/2 pairs — its
    fingerprints exceed WINNOW_MAX_DF and are dropped, so the pair count
    stays linear (here: exactly the genuinely-duplicated pairs). The
    capped pipeline must still agree with the uncapped one on
    non-boilerplate pairs."""
    from parquet_modular_encryption_spark.pipeline.textops import (
        WINNOW_MAX_DF,
        WINNOW_MIN_SHARED,
        winnow_candidate_pairs,
        winnow_fingerprints,
    )

    import hashlib

    boiler = "copyright acme corporation all rights reserved do not redistribute"
    n_docs = 500
    # per-doc bodies from md5 so no two docs accidentally share an 8-gram
    rows = [
        (i, f"{hashlib.md5(str(i).encode()).hexdigest()} "
            f"{hashlib.md5(f'x{i}'.encode()).hexdigest()} {boiler}")
        for i in range(n_docs)
    ]
    # one genuine near-dup pair that shares a long NON-boilerplate passage
    passage = "the quick brown fox jumps over the lazy dog repeatedly tonight"
    rows += [
        (1000, f"intro text aaa {passage} outro one"),
        (1001, f"different preamble zzz {passage} closing words two"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    capped = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_candidate_pairs(docs, WINNOW_MAX_DF).collect()
    }
    # linear, not quadratic: boilerplate fps (df=500 > cap) are dropped,
    # so none of the 500*499/2 = 124750 boilerplate pairs appear
    assert len(capped) < n_docs, f"cap failed: {len(capped)} pairs (quadratic blowup)"
    assert (1000, 1001) in capped, "genuine near-dup lost by the DF cap"

    # agreement with the uncapped pipeline on non-boilerplate pairs: every
    # capped pair is an uncapped pair with n_shared <= the uncapped count
    # (the cap only removes fingerprints, never adds)
    fps = winnow_fingerprints(docs)
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    uncapped = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
        .collect()
    }
    for pair, n in capped.items():
        assert pair in uncapped and n <= uncapped[pair]


def test_dup_substring_spans_adversarial(spark):
    """Exact-substring span dedup (q45c core): a cross-document shared
    passage is flagged in BOTH documents with a span covering exactly the
    shared run; a within-document repeat yields two disjoint spans; a
    unique document is absent; and a passage shared by 500 documents
    produces 500 linear per-doc rows, never pairs."""
    import hashlib

    from parquet_modular_encryption_spark.pipeline.textops import (
        SUBDUP_K,
        dup_substring_spans,
    )

    passage = "the quick brown fox jumps over the lazy dog tonight"
    assert len(passage) >= SUBDUP_K
    rows = [
        (1, f"alpha beta {passage} gamma delta unique closing one"),
        (2, f"zzz entirely different preamble {passage} other suffix"),
        # within-doc repeat: two copies separated by a unique bridge
        (3, f"opening {passage} unique bridging middle part {passage} end"),
        (4, "nothing here repeats anywhere else in this corpus at all ok"),
    ]
    # 500 boilerplate-sharing docs with md5-unique bodies
    boiler = "copyright acme corporation all rights reserved worldwide"
    rows += [
        (100 + i, f"{hashlib.md5(str(i).encode()).hexdigest()} {boiler}")
        for i in range(500)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in dup_substring_spans(docs).collect()}

    # linear output: one row per affected doc (503 = docs 1,2,3 + 500)
    assert len(out) == 503
    assert 4 not in out

    # cross-doc passage: flagged in both, span covers the shared run
    # (± the flanking spaces both sides share)
    for d in (1, 2):
        assert out[d].n_dup_spans == 1
        assert len(passage) <= out[d].dup_chars <= len(passage) + 2

    # within-doc repeat: two disjoint spans, each covering one copy
    assert out[3].n_dup_spans == 2
    assert out[3].dup_chars >= 2 * len(passage)

    # invariants: spans are disjoint and >= K chars each
    for r in out.values():
        assert 0 < r.dup_chars <= r.norm_len
        assert r.clean_chars == r.norm_len - r.dup_chars
        assert r.dup_chars >= SUBDUP_K * r.n_dup_spans


def test_winnowing_covers_minhash_neardups(spark):
    """Cross-method validation (the q58-vs-q47 pattern): documents that
    MinHash verifies as Jaccard-similar share whole word shingles, hence
    long character runs, hence winnowing fingerprints — q47's verified
    pairs must be (almost entirely) a subset of q45b's candidate pairs."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        q47_minhash_neardup,
    )
    from parquet_modular_encryption_spark.pipeline.textops import (
        q45b_winnow_fingerprint,
    )

    minhash = {(r.doc_a, r.doc_b) for r in q47_minhash_neardup(spark, SF).collect()}
    assert minhash, "expected some near-dup pairs at sf0.001"
    winnow = {(r.doc_a, r.doc_b) for r in q45b_winnow_fingerprint(spark, SF).collect()}
    covered = len(minhash & winnow) / len(minhash)
    assert covered >= 0.8, (
        f"winnowing caught only {covered:.0%} of MinHash-verified near-dups"
    )


def test_salted_block_self_join_equal_plain_on_hot_block(spark):
    """The generalized salted grid must emit exactly the plain within-block
    pairs on an adversarially skewed frame: one dominant (source,
    len_bucket) block far above the hot threshold, plus cold blocks, plus
    a same-bucket-different-source block that must NOT pair with it."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        HOT_BUCKET_THRESHOLD,
        salted_block_self_join,
    )

    hot_n = HOT_BUCKET_THRESHOLD * 5  # one dominant source x length block
    rows = [(i, "web", 3) for i in range(hot_n)]
    rows += [(100 + i, f"src_{i % 4}", i % 3) for i in range(12)]  # cold
    rows += [(200 + i, "books", 3) for i in range(2)]  # same bucket, other source
    df = spark.createDataFrame(rows, "doc_id bigint, source string, len_bucket int")

    expected = sorted(
        (a, b)
        for (a, sa, la) in rows
        for (b, sb, lb) in rows
        if sa == sb and la == lb and a < b
    )
    got = sorted(
        map(
            tuple,
            salted_block_self_join(df, ("source", "len_bucket"), id_col="doc_id")
            .collect(),
        )
    )
    assert got == expected
    assert len(expected) >= hot_n * (hot_n - 1) // 2  # hot path engaged


def test_q49b_salted_equals_q49(spark):
    """q49b (salted grid) must be row-identical to q49 (plain block join)
    on real testdata — the same equivalence the shared oracle hash-checks
    at sf0.01, pinned here at sf0.001 including the jaccard doubles."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        q49_ngram_jaccard_blocked,
        q49b_ngram_jaccard_salted,
    )

    plain = sorted(map(tuple, q49_ngram_jaccard_blocked(spark, SF).collect()))
    salted = sorted(map(tuple, q49b_ngram_jaccard_salted(spark, SF).collect()))
    assert plain == salted


def test_q59b_salted_equals_q59(spark):
    """q59b (salted block join) must be row-identical to q59 (plain) on
    real testdata — the equivalence the shared oracle hash-checks at
    sf0.01, pinned here at sf0.001 including the edit distances."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        q59_fuzzy_match_levenshtein,
        q59b_fuzzy_match_salted,
    )

    plain = sorted(map(tuple, q59_fuzzy_match_levenshtein(spark, SF).collect()))
    salted = sorted(map(tuple, q59b_fuzzy_match_salted(spark, SF).collect()))
    assert plain == salted


def test_q59b_hot_prefix_block(spark):
    """Adversarial hot-prefix corpus: many documents share one 12-char
    opening (a boilerplate header), far above the hot threshold. The
    salted pipeline must emit exactly the pairs a plain blocked join
    would — same pairs, same edit distances — with the hot block routed
    through the fragment-replication grid."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        BLOCK_PREFIX,
        HOT_BUCKET_THRESHOLD,
        LEV_MAX,
        LEV_PREFIX,
        normalized,
        salted_block_self_join,
    )

    hot_n = HOT_BUCKET_THRESHOLD * 3
    header = "breaking news"  # 13 chars >= BLOCK_PREFIX after normalization
    rows = [(i, "en", f"{header} item {i} body text {i}") for i in range(hot_n)]
    rows += [(1000 + i, "en", f"totally unrelated opening {i} zzz") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")

    canon = docs.select("doc_id", "lang", normalized("text").alias("norm"))
    blocked = canon.select(
        "doc_id", "lang", F.substring("norm", 1, BLOCK_PREFIX).alias("block")
    )
    prefixes = canon.select(
        "doc_id", F.substring("norm", 1, LEV_PREFIX).alias("prefix")
    )
    pairs = salted_block_self_join(blocked, ("lang", "block"), id_col="doc_id")
    salted = sorted(
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in pairs.join(
            prefixes.select(F.col("doc_id").alias("doc_a"), F.col("prefix").alias("prefix_a")),
            "doc_a",
        )
        .join(
            prefixes.select(F.col("doc_id").alias("doc_b"), F.col("prefix").alias("prefix_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("prefix_a", "prefix_b").cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= LEV_MAX)
        .collect()
    )
    import re as _re

    def _norm(t):
        return _re.sub(r"\s+", " ", t.lower()).strip()

    def _lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    norms = {i: _norm(t) for i, _, t in rows}
    expected = sorted(
        (a, b, _lev(norms[a][:LEV_PREFIX], norms[b][:LEV_PREFIX]))
        for a in norms
        for b in norms
        if a < b and norms[a][:BLOCK_PREFIX] == norms[b][:BLOCK_PREFIX]
        and _lev(norms[a][:LEV_PREFIX], norms[b][:LEV_PREFIX]) <= LEV_MAX
    )
    assert salted == expected
    assert len([p for p in expected if p[0] < 1000 and p[1] < 1000]) > 0


def test_multiprobe_recall_dominates_single_probe(spark):
    """The promoted q54 default (multiprobe) probes a strict superset of
    the budget point's buckets (masks (0,) ⊂ (0,1,2,4)), so its recall
    of the exact top-5 must be >= the budget recall — the r13 flip's
    direction pinned in-code. Also pins the lock-step: q54 and q54b
    share one core and must return identical result sets."""
    from parquet_modular_encryption_spark.pipeline.similarity import (
        q50_knn_bruteforce,
        q54_ann_lsh_search,
        q54b_ann_multiprobe,
        q54h_ann_lsh_budget,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in q50_knn_bruteforce(spark, SF).filter(F.col("rank") <= 5).collect()
    }
    budget = {(r.query_id, r.neighbor_id) for r in q54h_ann_lsh_budget(spark, SF).collect()}
    multi = {(r.query_id, r.neighbor_id) for r in q54_ann_lsh_search(spark, SF).collect()}
    anchor = {(r.query_id, r.neighbor_id) for r in q54b_ann_multiprobe(spark, SF).collect()}
    assert anchor == multi, "q54 default and q54b anchor must be hash-identical"
    r_budget = len(exact & budget) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_budget, f"default recall {r_multi} < budget {r_budget}"


def test_kmeans_refine_matches_numpy_lloyd(spark):
    """q52b against a hand-rolled numpy Lloyd iteration: same
    floor-quantized centroid means, same cosine argmax with the
    (max cos, min cell) tie-break, same update/reassign. Membership and
    migration counts must agree exactly (an argmax flip needs a
    cross-cell cosine tie, far above ulp noise); fixed-point inertia is
    allowed +-1 per vector for summation-order ulp drift."""
    import numpy as np
    import pyarrow.parquet as pq

    from parquet_modular_encryption_spark.pipeline.similarity import (
        q52b_kmeans_refine,
    )

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    vecs = np.array([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    labels = t["label"].to_numpy()
    cells = np.sort(np.unique(labels))

    def centroids_from(assign):
        return np.stack([
            np.floor(vecs[assign == c] * 1e7).sum(axis=0) / 1e7
            / (assign == c).sum()
            for c in cells
        ])

    def assign_to(cb):
        # cosine against each centroid; argmax with min-cell tie-break
        sims = (vecs @ cb.T) / (
            np.linalg.norm(vecs, axis=1)[:, None] * np.linalg.norm(cb, axis=1)[None, :]
        )
        best = sims.argmax(axis=1)  # np.argmax takes the FIRST max = min cell
        return cells[best], sims[np.arange(len(vecs)), best]

    a0, _ = assign_to(centroids_from(labels))
    a1, cos1 = assign_to(centroids_from(a0))

    out = {r.cell: r for r in q52b_kmeans_refine(spark, SF).collect()}
    assert set(out) == set(cells.tolist())
    n_total = len(vecs)
    assert sum(r.n_init for r in out.values()) == n_total
    assert sum(r.n_refined for r in out.values()) == n_total
    for c in cells:
        r = out[int(c)]
        assert r.n_init == int((a0 == c).sum()), f"cell {c} init count"
        assert r.n_refined == int((a1 == c).sum()), f"cell {c} refined count"
        assert r.n_moved_in == int(((a1 == c) & (a0 != c)).sum()), f"cell {c} moved"
        assert r.n_moved_in <= r.n_refined
        ref_inertia = int(np.floor(cos1[a1 == c] * 1e7).sum())
        assert abs(r.inertia_fp - ref_inertia) <= max(1, r.n_refined)


def test_quantization_zero_vector_guard(spark):
    """An all-zero embedding must quantize to finite scale and all-zero
    codes — without the greatest(max|x|, eps) floor the scale is Inf and
    the codes are NaN (0 * Inf), with engine-dependent ordering downstream."""
    import math

    from parquet_modular_encryption_spark.pipeline.similarity import QUANT_BITS

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [0.5, -1.0, 0.25])],
        "vec_id bigint, e array<double>",
    )
    scale = F.lit(QUANT_BITS) / F.greatest(
        F.array_max(F.transform(F.col("e"), lambda x: F.abs(x))), F.lit(1e-30)
    )
    rows = {
        r.vec_id: r
        for r in df.select(
            "vec_id",
            scale.alias("scale"),
            F.transform(F.col("e"), lambda x: F.floor(x * scale + 0.5)).alias("code"),
        ).collect()
    }
    assert math.isfinite(rows[1].scale) and rows[1].code == [0.0, 0.0, 0.0]
    assert rows[2].code == [64.0, -127.0, 32.0]


def test_quantized_ann_recall_matches_full_precision(spark):
    """q54c scores candidates against int8-reconstructed vectors before the
    exact rerank; with PQ_RERANK_CAND = 4x the final k, the reconstruction
    error (<=0.4% of max component) must not cost recall vs q54's
    full-precision rerank of the same LSH candidates — measured against
    the q50 exact top-5 ground truth."""
    from parquet_modular_encryption_spark.pipeline.similarity import (
        q50_knn_bruteforce,
        q54_ann_lsh_search,
        q54c_ann_quantized,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in q50_knn_bruteforce(spark, SF).filter(F.col("rank") <= 5).collect()
    }
    full = {(r.query_id, r.neighbor_id) for r in q54_ann_lsh_search(spark, SF).collect()}
    quant = {(r.query_id, r.neighbor_id) for r in q54c_ann_quantized(spark, SF).collect()}
    r_full = len(exact & full) / len(exact)
    r_quant = len(exact & quant) / len(exact)
    assert r_quant >= r_full, f"quantized recall {r_quant} < full-precision {r_full}"


def test_ivf_exact_at_full_probe_and_monotone_recall(spark):
    """IVF's defining invariants: probing ALL cells degenerates to the
    exact scan (every vector is in some probed cell), and recall is
    monotone in nprobe. Pinning these checks the cell assignment and
    probe ranking, not just the rerank."""
    from parquet_modular_encryption_spark.pipeline.similarity import (
        IVF_NPROBE,
        _ivf_search,
        q50_knn_bruteforce,
    )

    exact_rows = sorted(
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in q50_knn_bruteforce(spark, SF).filter(F.col("rank") <= 5).collect()
    )
    all_cells = sorted(
        tuple(r) for r in _ivf_search(spark, SF, nprobe=10).collect()
    )
    assert all_cells == exact_rows, "nprobe=K must equal the exact top-5"

    exact_set = {(q, n) for q, n, _, _ in exact_rows}
    # r13: the registered default is the deeper measured-recall probe
    # (IVF_NPROBE=8); the budget sibling q54i keeps the old nprobe=3.
    # Monotonicity now reads budget <= default <= exact.
    from parquet_modular_encryption_spark.pipeline.similarity import (
        IVF_NPROBE_BUDGET,
        q54d_ann_ivf,
        q54i_ann_ivf_budget,
    )

    assert IVF_NPROBE_BUDGET < IVF_NPROBE
    got_default = {
        (r.query_id, r.neighbor_id) for r in q54d_ann_ivf(spark, SF).collect()
    }
    got_budget = {
        (r.query_id, r.neighbor_id) for r in q54i_ann_ivf_budget(spark, SF).collect()
    }
    r_default = len(exact_set & got_default) / len(exact_set)
    r_budget = len(exact_set & got_budget) / len(exact_set)
    assert r_budget <= r_default <= 1.0
    assert r_budget > 0, "IVF found none of the true neighbors"


def test_ivf_sqrtn_codebook_shape_and_invariants(spark):
    """q54j's production-shaped codebook (r13 verdict #1): the stride
    rule must yield K ≈ isqrt(n) cells, full probing must degenerate to
    the exact scan (same defining invariant as the label codebook), and
    recall must be monotone in nprobe. The codebook SHAPE is the point —
    these pins make sure a future corpus regeneration can't silently
    turn the sqrt(n) family back into a handful-of-cells search."""
    import math

    from parquet_modular_encryption_spark.pipeline.similarity import (
        IVF_SQRTN_NPROBE,
        _ivf_sqrtn_search,
        q50_knn_bruteforce,
        q54j_ann_ivf_sqrtn,
        sqrtn_stride,
    )
    from parquet_modular_encryption_spark.sources.datasets import load

    # the stride rule at representative scales (pure function pin)
    for n in (50, 500, 2000, 20000, 240000):
        stride = sqrtn_stride(n)
        k = math.ceil(n / stride)
        assert math.isqrt(n) <= k <= math.isqrt(n) + 1, (n, stride, k)

    n = load(spark, SF, "embeddings").count()
    stride = sqrtn_stride(n)
    k_actual = sum(1 for i in range(n) if i % stride == 0)

    exact_rows = sorted(
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in q50_knn_bruteforce(spark, SF).filter(F.col("rank") <= 5).collect()
    )
    all_cells = sorted(
        tuple(r) for r in _ivf_sqrtn_search(spark, SF, nprobe=k_actual).collect()
    )
    assert all_cells == exact_rows, "nprobe=K must equal the exact top-5"

    exact_set = {(q, nb) for q, nb, _, _ in exact_rows}
    got_default = {
        (r.query_id, r.neighbor_id) for r in q54j_ann_ivf_sqrtn(spark, SF).collect()
    }
    got_shallow = {
        (r.query_id, r.neighbor_id)
        for r in _ivf_sqrtn_search(spark, SF, nprobe=1).collect()
    }
    r_default = len(exact_set & got_default) / len(exact_set)
    r_shallow = len(exact_set & got_shallow) / len(exact_set)
    assert r_shallow <= r_default <= 1.0
    assert r_default > 0, "sqrt(n) IVF found none of the true neighbors"
    assert IVF_SQRTN_NPROBE >= 1


def test_semdedup_matches_greedy_reference(spark):
    """q55b vs an independent pure-Python SemDeDup: recompute the
    floor-quantized centroids, the argmax cell assignment, and the
    greedy keep-lowest-id within-cell pruning with sequential-fold
    arithmetic (the same left-to-right IEEE order both engines use),
    and require exact agreement on every (vec_id, cell, pruned) row.
    Also pins the structural invariant that a cell's minimum-id member
    is never pruned (greedy keeps the first arrival by construction)."""
    import math

    from parquet_modular_encryption_spark.pipeline.similarity import (
        NEARDUP_COSINE,
        q55b_semdedup,
    )
    from parquet_modular_encryption_spark.sources.datasets import load

    rows = load(spark, SF, "embeddings").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    labels = {r.vec_id: r.label for r in rows}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        return fold_dot(a, b) / (math.sqrt(fold_dot(a, a)) * math.sqrt(fold_dot(b, b)))

    # centroid per label: floor-quantized integer mean per dim (q52 trick)
    by_label: dict[int, list[list[float]]] = {}
    for vid, v in vecs.items():
        by_label.setdefault(labels[vid], []).append(v)
    centroids = {}
    for lab, members in by_label.items():
        dims = len(members[0])
        centroids[lab] = [
            (sum(math.floor(m[d] * 1e7) for m in members) / 1e7) / len(members)
            for d in range(dims)
        ]
    # argmax assignment, tie-break lowest cell (matches ORDER BY cos DESC, cell)
    assign = {}
    for vid, v in vecs.items():
        best = max(
            ((cos(v, ce), -lab) for lab, ce in centroids.items()),
        )
        assign[vid] = -best[1]
    # greedy prune: vec pruned iff a lower-id same-cell member is >= tau close
    cells: dict[int, list[int]] = {}
    for vid in sorted(assign):
        cells.setdefault(assign[vid], []).append(vid)
    expected = {}
    for cell, members in cells.items():
        for i, b in enumerate(members):
            pruned = any(
                cos(vecs[a], vecs[b]) >= NEARDUP_COSINE for a in members[:i]
            )
            expected[b] = (cell, pruned)

    got = {
        r.vec_id: (r.cell, r.pruned) for r in q55b_semdedup(spark, SF).collect()
    }
    assert got == expected
    for cell, members in cells.items():
        assert got[min(members)] == (cell, False)


def test_semdedup_subcell_split_at_scale(spark, tmp_path):
    """The r9 scale fix: when the corpus outgrows K * TARGET_CELL, q55b
    splits each label cell into residual-sign sub-cells so pair counts
    stay linear. This pins the bits>=1 path (the fixed SFs all run at
    bits=0): a 3000-vector corpus (1500 random bases + 1500 exact
    duplicates) forces bits=1; the operator must (a) still hash-match
    its own DuckDB oracle exactly (the oracle computes the same bit
    ladder, so this catches any engine/oracle drift in the sub-cell
    arithmetic) and (b) prune EVERY planted duplicate — an identical
    vector shares its base's cell AND sub-cell by construction, so
    sub-cell splitting cannot lose exact dups."""
    import random

    import duckdb

    from parquet_modular_encryption_spark.pipeline.similarity import (
        q55b_semdedup,
        semdedup_subbits,
    )

    rng = random.Random(55)
    n_base, dims, k = 1500, 32, 10
    rows = []
    for i in range(n_base):
        vec = [rng.gauss(0.0, 1.0) for _ in range(dims)]
        rows.append((i, vec, i % k))
        rows.append((n_base + i, vec, i % k))  # exact duplicate, higher id
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(4).write.parquet(f"{sf}/embeddings.parquet")

    assert semdedup_subbits(2 * n_base, k) >= 1

    got = q55b_semdedup(spark, sf).collect()
    by_id = {r.vec_id: (r.cell, r.pruned) for r in got}

    # (b) every exact duplicate pruned
    missed = [i for i in range(n_base) if not by_id[n_base + i][1]]
    assert not missed, f"sub-cell split lost exact duplicates: {missed[:5]}"

    # (a) exact oracle agreement on the same corpus
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    from parquet_modular_encryption_spark.registry import load_all

    oracle = load_all()["q55b_semdedup"].oracle
    orows = {r[0]: (r[1], r[2]) for r in con.execute(oracle).fetchall()}
    assert by_id == orows


def test_embedding_neardup_band_widening_at_scale(spark, tmp_path):
    """q55's corpus-scaled band widening (the r9 scale fix twin of
    q55b's sub-cells): a corpus past Q55_BAND_TARGET forces x>=1 extra
    band bits. The operator must still hash-match its DuckDB oracle
    (same integer ladder both sides), and every planted EXACT duplicate
    pair must still be found — identical vectors agree on every sign
    plane, so widening can never lose them."""
    import random

    import duckdb

    from parquet_modular_encryption_spark.pipeline.similarity import (
        q55_embedding_neardup,
        q55_extra_band_bits,
    )
    from parquet_modular_encryption_spark.registry import load_all

    rng = random.Random(551)
    n_base, dims, k = 1500, 32, 10
    rows = []
    for i in range(n_base):
        vec = [rng.gauss(0.0, 1.0) for _ in range(dims)]
        rows.append((i, vec, i % k))
        rows.append((n_base + i, vec, i % k))
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(4).write.parquet(f"{sf}/embeddings.parquet")

    assert q55_extra_band_bits(2 * n_base) >= 1

    got = {
        (r.vec_a, r.vec_b): round(r.cosine_sim, 9)
        for r in q55_embedding_neardup(spark, sf).collect()
    }
    for i in range(n_base):
        assert got.get((i, n_base + i)) == 1.0, f"lost exact-dup pair {i}"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    oracle = load_all()["q55_embedding_neardup"].oracle
    orows = {(r[0], r[1]): round(r[2], 9) for r in con.execute(oracle).fetchall()}
    assert got == orows


def test_band_widening_recall_at_planted_cosines(spark):
    """VERDICT r9 item 2: recall at the PRODUCTION near-dup regime,
    measured — not argued from the 1 - theta/pi per-plane survival.
    Pairs planted at exact cosines 0.90/0.95/0.99 into a corpus large
    enough to force x = 2 extra band bits (the registered per_doubling =
    1.0 widening) must survive the widened banding at near-unit recall;
    the planted 0.80 stratum documents the intended mid-cosine decay.
    Fully deterministic: fixed corpus seed, fixed LCG planes, fixed x.
    Mirrors scripts/q55_recall_experiment.py --plant (Q55_RECALL_r10)."""
    import importlib.util
    import os

    import numpy as np

    from parquet_modular_encryption_spark.pipeline.similarity import (
        q55_corpus_bands,
        q55_extra_band_bits,
    )

    spec = importlib.util.spec_from_file_location(
        "q55_recall_experiment",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "q55_recall_experiment.py"),
    )
    exp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(exp)

    rng = np.random.default_rng(5510)
    n_base, dims = 5000, 32
    mat = rng.standard_normal((n_base, dims))
    partners, raw_pairs = exp.plant_pairs(mat, k=100)
    full = np.vstack([mat, partners]).astype(np.float32)
    # realized cosine is the target to float32 rounding
    for b, o, c in raw_pairs[:20]:
        u, v = full[b].astype(np.float64), full[n_base + o].astype(np.float64)
        realized = (u @ v) / (np.linalg.norm(u) * np.linalg.norm(v))
        assert abs(realized - c) < 1e-6, (c, realized)

    n_total = n_base + len(partners)
    x = q55_extra_band_bits(n_total)
    assert x == 2, f"fixture no longer forces the widening under test: x={x}"

    emb = spark.createDataFrame(
        [(i, [float(v) for v in full[i]]) for i in range(n_total)],
        "vec_id bigint, embedding array<float>",
    ).coalesce(8)

    def measure(n_bands=None):
        _, bands = q55_corpus_bands(emb, n_bands=n_bands)
        keys: dict[int, dict[int, int]] = {}
        for r in bands.collect():
            keys.setdefault(r.vec_id, {})[r.band_id] = r.band_key
        recall = {}
        for c in exp.PLANT_COSINES:
            sub = [(b, n_base + o) for b, o, cc in raw_pairs if cc == c]
            hits = sum(
                1
                for a, b in sub
                if any(keys[a][band] == keys[b].get(band) for band in keys[a])
            )
            recall[c] = hits / len(sub)
        return recall

    # Registered config (r11, the corpus-scaled band-count ladder): at
    # x = 2 the default is B = q55_band_count(2) = 4 bands of
    # (3 + x) = 5 bits. Per-plane survival s = 1 - acos(c)/pi, recall =
    # 1 - (1 - s^5)^B -> 0.994 @0.99, 0.971 @0.95, 0.914 @0.90. The
    # production-regime pin is the VERDICT-r10 target: >= 0.9 at cosine
    # 0.95 under the REGISTERED default — the round-10 2-band default
    # measured 0.81 here and decayed with corpus growth.
    from parquet_modular_encryption_spark.pipeline.similarity import (
        q55_band_count,
    )

    assert q55_band_count(x) == 4
    registered = measure()
    assert registered[0.95] >= 0.90, registered
    assert registered[0.99] >= 0.95, registered
    assert registered[0.90] >= 0.80, registered

    # The historic fixed-2-band config, kept measurable via the
    # experiment override: band COUNT, not plane quality, limits recall
    # at the production 0.9+ regime (theory 0.829 @0.95; the round-10
    # finding that motivated the ladder).
    two_band = measure(n_bands=2)
    assert 0.75 <= two_band[0.95] <= 0.92, two_band
    assert two_band[0.95] < registered[0.95], (two_band, registered)

    # OR-amplification headroom: 8 plane-disjoint bands reach near-unit
    # recall (theory 0.9993 @0.95) for ~4x the 2-band candidate volume
    # — the measured trade a 100 TB near-dup deployment budgets
    # (Q55_RECALL_r10).
    wide = measure(n_bands=8)
    assert wide[0.95] >= 0.99, wide
    assert wide[0.99] >= 0.99, wide
    assert wide[0.90] >= 0.97, wide
    # 0.80 is outside the production regime; theory 0.953, measured 0.89
    # on this 100-pair stratum (plane-lattice correlation at the margin)
    assert wide[0.80] >= 0.85, wide

    # The REGISTERED budget knob (q55e, r12): per_doubling = 1.6 reaches
    # deeper ladder rungs at the same n (x = 3, B = 6 bands of 6 bits
    # here vs the default's x = 2, B = 4 of 5) — per-band candidate mass
    # shrinks ~0.64x per extra bit while the band-count ladder holds the
    # recall floor (theory 1-(1-s^6)^6 = 0.989 @0.95). Pin the ladder
    # arithmetic and the floor; the candidate-mass payoff is asymptotic
    # and measured at scale in Q55_RECALL_r12.json, not here.
    from parquet_modular_encryption_spark.pipeline.similarity import (
        Q55_BUDGET_PER_DOUBLING,
    )

    xb = q55_extra_band_bits(n_total, per_doubling=Q55_BUDGET_PER_DOUBLING)
    assert xb == 3 and q55_band_count(xb) == 6, (xb, q55_band_count(xb))

    def measure_budget():
        _, bands = q55_corpus_bands(emb, per_doubling=Q55_BUDGET_PER_DOUBLING)
        keys: dict[int, dict[int, int]] = {}
        for r in bands.collect():
            keys.setdefault(r.vec_id, {})[r.band_id] = r.band_key
        return {
            c: sum(
                1
                for a, b in [
                    (b0, n_base + o) for b0, o, cc in raw_pairs if cc == c
                ]
                if any(keys[a][band] == keys[b].get(band) for band in keys[a])
            )
            / sum(1 for _, _, cc in raw_pairs if cc == c)
            for c in exp.PLANT_COSINES
        }

    budget = measure_budget()
    assert budget[0.95] >= 0.90, budget
    assert budget[0.99] >= 0.95, budget


def test_chunking_coverage_and_overlap(spark):
    """q43b invariants on a synthetic doc: chunk i starts at token
    i*stride, consecutive chunks share exactly size-stride tokens, every
    token is covered, and only the tail chunk may be short."""
    from parquet_modular_encryption_spark.pipeline.textops import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    n_toks = 200
    words = [f"w{i}" for i in range(n_toks)]
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id bigint, text string")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    chunks = F.expr(
        f"transform(sequence(1, size(toks), {CHUNK_STRIDE}), "
        f"s -> slice(toks, s, {CHUNK_SIZE}))"
    )
    rows = sorted(
        (r.chunk_index, r.chunk)
        for r in docs.select(toks.alias("toks"))
        .select(F.posexplode(chunks).alias("chunk_index", "chunk"))
        .collect()
    )
    covered = []
    for idx, chunk in rows:
        start = idx * CHUNK_STRIDE
        assert chunk == words[start : start + CHUNK_SIZE]
        covered.extend(chunk)
    assert set(covered) == set(words), "a token escaped every chunk"
    for (i, a), (_, b) in zip(rows, rows[1:]):
        shared = CHUNK_SIZE - CHUNK_STRIDE
        if len(a) == CHUNK_SIZE:
            assert a[-shared:] == b[:shared], f"overlap broken at chunk {i}"


def test_python_udtf_surface(spark):
    """Spark 4 Python UDTF (user-defined TABLE function) surface: a
    lateral-joinable table function, registered for SQL use, matching
    the equivalent built-in explode. Row-at-a-time Python — kept OUT of
    the registry/hot paths deliberately (plan audit would flag
    ROW_PYTHON); this pins the API for the rare genuinely-tabular UDF
    (multi-column, variable-arity output per input row)."""
    from pyspark.sql.functions import explode, lit, posexplode, split, udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split()):
                yield w, i

    got = SplitWords(lit("alpha beta gamma")).collect()
    assert [(r.word, r.pos) for r in got] == [
        ("alpha", 0), ("beta", 1), ("gamma", 2)
    ]

    # SQL registration + LATERAL application over a real column
    spark.udtf.register("pme_split_words", SplitWords)
    df = spark.createDataFrame(
        [(1, "a b"), (2, "c d e")], "id int, txt string"
    )
    df.createOrReplaceTempView("pme_udtf_in")
    via_udtf = spark.sql(
        "SELECT id, word, pos FROM pme_udtf_in, "
        "LATERAL pme_split_words(txt)"
    ).collect()
    via_builtin = df.select(
        "id", posexplode(split("txt", " ")).alias("pos", "word")
    ).select("id", "word", "pos").collect()
    assert sorted(map(tuple, via_udtf)) == sorted(map(tuple, via_builtin))


def test_chunk_hash_chain_matches_python_fold(spark):
    """q43d's recursive-CTE chain vs a driver-side md5 fold over q43b's
    chunk listing: exact equality per document, and order sensitivity —
    reversing a multi-chunk document's fold yields a DIFFERENT chain
    (the property an unordered hash-of-hashes would lose)."""
    import hashlib

    from parquet_modular_encryption_spark.pipeline.textops import (
        q43b_doc_chunks,
        q43d_chunk_hash_chain,
    )

    chunks: dict[int, list[str]] = {}
    for r in q43b_doc_chunks(spark, SF).collect():
        chunks.setdefault(r.doc_id, []).append((r.chunk_index, r.chunk_hash))

    def fold(hashes):
        h = hashes[0]
        for nxt in hashes[1:]:
            h = hashlib.md5((h + nxt).encode()).hexdigest()
        return h

    out = {r.doc_id: r for r in q43d_chunk_hash_chain(spark, SF).collect()}
    assert set(out) == set(chunks)
    multi = 0
    for doc_id, pairs in chunks.items():
        ordered = [h for _, h in sorted(pairs)]
        assert out[doc_id].n_chunks == len(ordered)
        assert out[doc_id].chain_hash == fold(ordered), f"doc {doc_id}"
        if len(ordered) >= 2:
            multi += 1
            assert fold(ordered) != fold(list(reversed(ordered)))
    assert multi > 0, "fixture has no multi-chunk docs; order test vacuous"


def test_bm25_scores_run_invariant(spark):
    """q53c's fixed-point score summation must make results identical
    across runs (double addition is not associative; Spark's aggregation
    order varies with partitioning) — two executions at different
    parallelism must agree bit-for-bit, scores included."""
    from parquet_modular_encryption_spark.pipeline.textops import q53c_bm25_topk

    a = sorted(map(tuple, q53c_bm25_topk(spark, SF).collect()))
    b = sorted(map(tuple, q53c_bm25_topk(spark, SF).coalesce(1).collect()))
    assert a == b
    assert len(a) > 0 and all(r[2] > 0 for r in a)


def test_hybrid_rrf_fusion_invariants(spark):
    """q53d structural pins: every fused row came from >= 1 candidate
    list; the fixed-point RRF score equals the driver-side recomputation
    from its component ranks (floor(1e12/(60+r)) per present list); and
    within each query the hybrid ranking is exactly (rrf_fp DESC, doc_id)
    with no gaps. Fusion-dominance: if some doc is #1 in BOTH lists it
    must be hybrid #1 (2/(K+1) strictly beats any other achievable sum)."""
    from parquet_modular_encryption_spark.pipeline.textops import (
        K_RRF,
        RRF_TOP_K,
        q53d_hybrid_rrf,
    )

    rows = q53d_hybrid_rrf(spark, SF).collect()
    assert rows

    def contrib(r):
        return 0 if r is None else int(1_000_000_000_000 // (K_RRF + r))

    by_query: dict[int, list] = {}
    for r in rows:
        assert r.r_lex is not None or r.r_dense is not None
        assert r.rrf_fp == contrib(r.r_lex) + contrib(r.r_dense)
        by_query.setdefault(r.query_id, []).append(r)
    for qid, qrows in by_query.items():
        qrows.sort(key=lambda r: r.hybrid_rank)
        assert [r.hybrid_rank for r in qrows] == list(range(1, len(qrows) + 1))
        assert len(qrows) <= RRF_TOP_K
        keys = [(-r.rrf_fp, r.doc_id) for r in qrows]
        assert keys == sorted(keys)
        double_first = [r for r in qrows if r.r_lex == 1 and r.r_dense == 1]
        if double_first:
            assert double_first[0].hybrid_rank == 1


def test_real_video_header_decode():
    """sniff_video parses real AVI MainAVIHeader and MP4 tkhd/stsz box
    layouts exactly — the video twin of the real-image header decode."""
    from parquet_modular_encryption_spark.pipeline.multimodal import (
        encode_avi_header,
        encode_mp4_header,
        sniff_video,
    )

    assert sniff_video(encode_avi_header(640, 480, 300)) == ("avi", 640, 480, 300)
    assert sniff_video(encode_mp4_header(1920, 1080, 24)) == ("mp4", 1920, 1080, 24)
    with pytest.raises(ValueError, match="unrecognized"):
        sniff_video(b"NOTAVIDEOCONTAINER")
    # truncated AVI (magic ok, avih missing) must fail loudly, not guess
    with pytest.raises(ValueError, match="avih"):
        sniff_video(b"RIFF\x04\x00\x00\x00AVI ")


def test_real_video_frame_sampling_distributed(spark):
    """frame_sample_real through the actual mapInPandas operator: real
    container bytes in, per-frame fetch rows out, executed on executors."""
    from parquet_modular_encryption_spark.pipeline.multimodal import (
        encode_avi_header,
        encode_mp4_header,
        frame_sample_real,
    )

    rows = [
        (0, "video", bytearray(encode_avi_header(320, 240, 25)), None),
        (1, "video", bytearray(encode_mp4_header(640, 360, 7)), None),
        (2, "image", bytearray(b"not a video, filtered out"), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id bigint, modality string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    ).repartition(2)
    got = frame_sample_real(media, every_nth=10).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.media_id, []).append(r)
    assert sorted(r.frame_index for r in by_id[0]) == [0, 10, 20]
    assert all((r.container, r.width, r.height) == ("avi", 320, 240) for r in by_id[0])
    assert sorted(r.frame_index for r in by_id[1]) == [0]
    assert all((r.container, r.width, r.height) == ("mp4", 640, 360) for r in by_id[1])
    assert 2 not in by_id


def test_dsir_importance_enriches_target_domain(spark):
    """q43c: selecting by hashed-unigram importance ratio against the
    English target distribution must ENRICH English — the en share of
    the top-K strictly exceeds the en share of the corpus — and scores
    must be positive integers with the advertised K."""
    import pyarrow.parquet as pq

    from parquet_modular_encryption_spark.pipeline.curation import (
        DSIR_TOP_K,
        q43c_dsir_importance,
    )

    rows = q43c_dsir_importance(spark, SF).collect()
    assert len(rows) == DSIR_TOP_K
    assert all(r.avg_ratio_fp > 0 and r.n_tokens > 0 for r in rows)
    langs = pq.read_table(f"{SF}/documents.parquet", columns=["lang"])
    corpus_share = sum(1 for v in langs["lang"].to_pylist() if v == "en") / len(langs)
    top_share = sum(1 for r in rows if r.lang == "en") / len(rows)
    assert top_share > corpus_share, f"no enrichment: {top_share} <= {corpus_share}"


def test_cluster_balanced_sample_invariants(spark):
    """q76d: every cell keeps exactly min(quota, n_c) vectors, the total
    stays within the budget, and the sqrt-temperature flattening holds —
    smaller cells get a HIGHER sampling rate than larger ones."""
    from parquet_modular_encryption_spark.pipeline.curation import (
        CB_BUDGET,
        q76d_cluster_balanced_sample,
    )

    rows = q76d_cluster_balanced_sample(spark, SF).collect()
    assert rows and sum(1 for _ in rows) <= CB_BUDGET
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    for cell, rs in by_cell.items():
        quota, n_c = rs[0].quota, rs[0].n_c
        assert len(rs) == min(quota, n_c), f"cell {cell}"
        assert all(r.rk <= r.quota for r in rs)
    # flattening: the ideal rate is ∝ 1/sqrt(n_c); the floored integer
    # quota perturbs it by < 1 doc, so compare only cells whose sizes are
    # clearly separated (2x) and allow the one-doc flooring margin
    rates = sorted((rs[0].n_c, len(rs) / rs[0].n_c) for rs in by_cell.values())
    for n1, r1 in rates:
        for n2, r2 in rates:
            if n2 >= 2 * n1:
                assert r1 + 1.0 / n1 >= r2, (
                    f"rate not flattened: {n1}:{r1} vs {n2}:{r2}"
                )


def test_temperature_mix_flattens_sources(spark):
    """q117b's sqrt weighting must FLATTEN the mixture: a smaller source's
    sampling rate (quota / n_s) is >= any larger source's rate, and
    per-source quotas are respected exactly."""
    from parquet_modular_encryption_spark.pipeline.curation import (
        q76c_temperature_mix,
    )

    rows = q76c_temperature_mix(spark, SF).collect()
    assert rows
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, {"n_s": r.n_s, "quota": r.quota, "got": 0})
        per_source[r.source]["got"] += 1
        assert r.rk <= r.quota
    for s, info in per_source.items():
        assert info["got"] == min(info["quota"], info["n_s"]), s
    rates = sorted(
        ((v["n_s"], v["quota"] / v["n_s"]) for v in per_source.values())
    )
    for (n_small, rate_small), (n_big, rate_big) in zip(rates, rates[1:]):
        if n_small < n_big:
            assert rate_small >= rate_big - 1e-9, (
                f"flattening violated: n={n_small} rate={rate_small} vs "
                f"n={n_big} rate={rate_big}"
            )


def test_jvm_header_parse_matches_duckdb_blob_parse(spark, tmp_path):
    """Cross-engine BINARY decode check: Spark's pure-JVM header parse
    (parse_headers: substring/hex/conv over the binary column) and DuckDB
    parsing the SAME parquet blobs byte-for-byte (hex() + '0x' CAST) must
    agree on every row — pinning that the little-endian field decode is
    byte-identical across engines, not just census-level."""
    import duckdb

    from parquet_modular_encryption_spark.pipeline.multimodal import parse_headers

    path = str(tmp_path / "media")
    synthetic_media(spark, n=60).write.mode("overwrite").parquet(path)
    parsed = parse_headers(spark.read.parquet(path))
    spark_rows = {
        r.media_id: (r.modality, r.width, r.height, r.n_declared, r.payload_bytes)
        for r in parsed.collect()
    }

    # DuckDB-side decode: byte k (0-indexed) of the blob is hex chars
    # [2k+1, 2k+2]; a LE u32 is the four pairs concatenated MSB-first.
    def le_u32(off0: int) -> str:  # off0 = 0-indexed byte offset
        pairs = " || ".join(
            f"substr(hx, {2 * (off0 + k) + 1}, 2)" for k in (3, 2, 1, 0)
        )
        return f"CAST('0x' || {pairs} AS BIGINT)"

    sql = f"""
    WITH raw AS (
        SELECT media_id, hex(payload) AS hx, octet_length(payload) AS nb
        FROM read_parquet('{path}/*.parquet')
    )
    SELECT media_id,
           ['image', 'audio', 'video'][CAST('0x' || substr(hx, 9, 2) AS INTEGER)]
               AS modality,
           {le_u32(5)} AS width,
           {le_u32(9)} AS height,
           {le_u32(13)} AS n_declared,
           CAST(nb AS BIGINT) AS payload_bytes
    FROM raw
    WHERE substr(hx, 1, 8) = hex('FAKE')
    """
    duck_rows = {
        mid: (modality, w, h, n, pb)
        for mid, modality, w, h, n, pb in duckdb.sql(sql).fetchall()
    }
    assert len(spark_rows) == 60
    assert spark_rows == duck_rows


def test_dup_ngram_chars_catches_multi_passage_repetition(spark, tmp_path):
    """The complementarity claim behind q41b: a document made of MANY
    DIFFERENT passages each repeated twice sails past q116's top-bigram
    rule (no single bigram dominates) but must be dropped by the duplicate
    5-gram character rule; a no-repeat document must be kept with frac 0."""
    from parquet_modular_encryption_spark.pipeline.curation import (
        q41b_dup_ngram_chars,
        q116_repetition_filter,
    )

    passages = [
        " ".join(f"w{p}{i}" for i in range(6)) for p in range(12)
    ]
    repeated = " ".join(p for p in passages for _ in (0, 1))  # p0 p0 p1 p1 ...
    unique = " ".join(f"u{i}" for i in range(80))
    rows = [(1, repeated, "en", "web", len(repeated)),
            (2, unique, "en", "web", len(unique))]
    sdf = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sdf.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    by_id = {r.doc_id: r for r in q41b_dup_ngram_chars(spark, sf).collect()}
    # back-to-back repeats duplicate ~1/3 of gram chars (boundary grams
    # mixing two passages occur once) — comfortably past the 0.15 threshold
    assert by_id[1].keep is False and by_id[1].dup_char_frac > 0.30
    assert by_id[2].keep is True and by_id[2].dup_gram_chars == 0

    # q116's top-bigram rule does NOT catch the multi-passage document:
    # twelve distinct passages mean no bigram covers >20% of the text.
    g = {r.doc_id: r for r in q116_repetition_filter(spark, sf).collect()}
    assert g[1].top_bigram_frac <= 0.20


def test_quality_classifier_matches_python_reference(spark, tmp_path):
    """q43e's fold-based scoring must equal a pure-Python reimplementation
    of the hashed linear model (independent of the DuckDB oracle), and the
    plan must stay shuffle-free (map-side fold, no exchange)."""
    import hashlib

    from parquet_modular_encryption_spark.pipeline.textops import (
        CLF_WEIGHT_RANGE,
        q43e_quality_classifier,
    )

    rows = [(1, "good clean prose about data", "en", "web", 27),
            (2, "spam spam buy now spam", "en", "web", 22),
            (3, "solo", "en", "web", 4)]
    sdf = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sdf.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    def pyscore(text: str, salt: str) -> tuple[int, int]:
        toks = [t for t in text.strip().split() if t]
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        half = (CLF_WEIGHT_RANGE - 1) // 2
        s = sum(
            int(hashlib.md5((salt + f).encode()).hexdigest()[:15], 16)
            % CLF_WEIGHT_RANGE
            - half
            for f in feats
        )
        return s, len(feats)

    out = q43e_quality_classifier(spark, str(tmp_path))
    got = {r.doc_id: r for r in out.collect()}
    for doc_id, text, *_ in rows:
        pos, n = pyscore(text, "q|")
        neg, _ = pyscore(text, "s|")
        assert got[doc_id].pos_score == pos
        assert got[doc_id].neg_score == neg
        assert got[doc_id].n_features == n
        assert got[doc_id].keep == (pos >= neg)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_bpe_merge_train_matches_python_reference(spark):
    """q42c's learned merge rules must equal a pure-Python BPE trainer
    (Sennrich et al. alg.: vocab of word types, frequency-weighted
    adjacent-pair counts, argmax with (count DESC, pair ASC) tie-break,
    greedy left-to-right non-overlapping merge) — independent of the
    unrolled-CTE oracle."""
    from collections import Counter

    import pyarrow.parquet as pq

    from parquet_modular_encryption_spark.pipeline.textops import (
        BPE_MERGES,
        q42c_bpe_merge_train,
    )

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])["text"]
    vocab = Counter()
    for t in texts.to_pylist():
        for w in t.strip().split():
            if w and "|" not in w:
                vocab[w] += 1
    syms = {w: list(w) for w in vocab}

    expect = []
    for rank in range(1, BPE_MERGES + 1):
        counts = Counter()
        for w, freq in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += freq
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, f"{a} {b}", a + b, c))
        for w in vocab:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out

    got = [
        (r.merge_rank, r.pair, r.merged, r.pair_count)
        for r in q42c_bpe_merge_train(spark, SF).orderBy("merge_rank").collect()
    ]
    assert got == expect


def test_mmr_rerank_matches_python_greedy_reference(spark):
    """q50c's window-argmax formulation must reproduce the classic greedy
    MMR loop (numpy reference over the same vectors): identical selections
    in identical order for every query."""
    import numpy as np
    import pyarrow.parquet as pq

    from parquet_modular_encryption_spark.pipeline.similarity import (
        MMR_K,
        MMR_LAMBDA,
        N_QUERIES,
        TOP_K,
        q50c_mmr_rerank,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_pylist()
    vecs = {i: np.array(v, dtype=np.float64) for i, v in zip(ids, tbl["embedding"].to_pylist())}

    def cos(a, b):
        return float(np.dot(a, b) / (np.sqrt(np.dot(a, a)) * np.sqrt(np.dot(b, b))))

    expect = {}
    for qid in range(N_QUERIES):
        rel = {i: cos(vecs[qid], v) for i, v in vecs.items() if i != qid}
        cand = sorted(rel, key=lambda i: (-rel[i], i))[:TOP_K]
        sel = []
        while len(sel) < MMR_K:
            if not sel:
                scores = {i: MMR_LAMBDA * rel[i] for i in cand}
            else:
                scores = {
                    i: MMR_LAMBDA * rel[i]
                    - (1 - MMR_LAMBDA) * max(cos(vecs[i], vecs[s]) for s in sel)
                    for i in cand
                    if i not in sel
                }
            sel.append(min(scores, key=lambda i: (-scores[i], i)))
        expect[qid] = sel

    got = {}
    for r in q50c_mmr_rerank(spark, SF).orderBy("query_id", "select_rank").collect():
        got.setdefault(r.query_id, []).append(r.selected_id)
    assert got == expect


def test_cms_guarantees_under_collisions(spark):
    """Count-min sketch invariants on a forced-collision sketch (width 4
    << vocabulary): estimate never undercounts, equals the exact count
    when the grid is collision-free, and the min over more depth rows is
    never looser than over fewer."""
    from parquet_modular_encryption_spark.pipeline.textops import (
        cms_estimate,
        cms_sketch,
    )

    rows = [(f"tok{i}", (i % 7) + 1) for i in range(64)]
    tc = spark.createDataFrame(rows, "tok string, cnt bigint")

    tight = {
        r.tok: r.cms_est
        for r in cms_estimate(tc, cms_sketch(tc, 4, 4), 4, 4).collect()
    }
    exact = dict(rows)
    assert set(tight) == set(exact)
    assert all(tight[t] >= exact[t] for t in exact)
    # width-4 over 64 tokens must actually collide somewhere
    assert any(tight[t] > exact[t] for t in exact)

    # depth-1 estimate (single hash row) is an upper bound on the depth-4 min
    loose = {
        r.tok: r.cms_est
        for r in cms_estimate(tc, cms_sketch(tc, 1, 4), 1, 4).collect()
    }
    assert all(loose[t] >= tight[t] for t in exact)

    # a wide collision-free grid recovers exact counts
    wide = {
        r.tok: r.cms_est
        for r in cms_estimate(tc, cms_sketch(tc, 4, 65536), 4, 65536).collect()
    }
    assert wide == exact


def test_random_projection_jl_distortion(spark):
    """JL guarantee for the q90b sign matrix: E[||P(a)-P(b)||^2] =
    K * ||a-b||^2 for +-1 sign projections, so over sampled pairs the
    normalized ratio concentrates near 1 (rel. std ~ sqrt(2/K) ~ 0.35)."""
    import numpy as np

    from parquet_modular_encryption_spark.pipeline.similarity import (
        PROJ_K,
        proj_sign,
        q90b_random_projection,
    )

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").limit(40).collect()
    }
    d = len(next(iter(emb.values())))
    S = np.array(
        [[proj_sign(i, j) for i in range(1, d + 1)] for j in range(PROJ_K)]
    )  # K x D

    proj = {}
    for r in q90b_random_projection(spark, SF).collect():
        proj.setdefault(r.vec_id, {})[r.proj_dim] = r.y_fixed
    ids = sorted(set(emb) & set(proj))[:30]

    # engine output matches the numpy reference using the same matrix
    for v in ids[:10]:
        q = np.floor(emb[v] * 1e6)
        np.testing.assert_array_equal(
            S @ q, np.array([proj[v][j] for j in range(PROJ_K)], dtype=np.float64)
        )

    ratios = []
    for a, b in zip(ids, ids[1:]):
        orig = float(np.sum((emb[a] - emb[b]) ** 2)) * 1e12
        ya = np.array([proj[a][j] for j in range(PROJ_K)], dtype=np.float64)
        yb = np.array([proj[b][j] for j in range(PROJ_K)], dtype=np.float64)
        if orig > 0:
            ratios.append(float(np.sum((ya - yb) ** 2)) / (PROJ_K * orig))
    assert ratios, "no distinct pairs sampled"
    assert all(0.05 < r < 5.0 for r in ratios)
    assert 0.6 < sum(ratios) / len(ratios) < 1.6


def test_ivfpq_contained_in_ivf_candidates_with_recall(spark):
    """q54f composes q54d's cell routing with q54c's code-resident
    pre-rank: its results must come from q54d's candidate universe (same
    probes, same assignment), and the int8 pre-rank must not cost recall
    of the exact top-5 vs plain IVF at the same nprobe (reconstruction
    error is far below the rank-5 boundary at this scale)."""
    from parquet_modular_encryption_spark.pipeline.similarity import (
        q50_knn_bruteforce,
        q54d_ann_ivf,
        q54f_ann_ivfpq,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in q50_knn_bruteforce(spark, SF).filter(F.col("rank") <= 5).collect()
    }
    ivf_rows = q54d_ann_ivf(spark, SF).collect()
    ivf = {(r.query_id, r.neighbor_id) for r in ivf_rows}
    ivfpq_rows = q54f_ann_ivfpq(spark, SF).collect()
    ivfpq = {(r.query_id, r.neighbor_id) for r in ivfpq_rows}

    # same routing => the composed search returns a subset of IVF's
    # candidate universe; at rank<=5 with a 20-deep prerank the final
    # top-5 should in fact coincide with plain IVF's top-5 here.
    assert ivfpq == ivf

    r_ivf = len(exact & ivf) / len(exact)
    r_ivfpq = len(exact & ivfpq) / len(exact)
    assert r_ivfpq >= r_ivf


def test_wav_decoder_matches_stdlib_wave_module():
    """decode_wav is checked against an INDEPENDENT reference decoder:
    the stdlib wave module reads the same blobs; samples must agree
    byte-exactly and the derived features must match a pure-python
    recompute."""
    import io
    import wave as wave_mod

    import numpy as np

    from parquet_modular_encryption_spark.pipeline.multimodal import (
        WAV_RATE,
        decode_wav,
        encode_wav,
    )

    for media_id in (0, 1, 6, 13, 47):
        blob = encode_wav(media_id)
        with wave_mod.open(io.BytesIO(blob)) as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == WAV_RATE
            ref = np.frombuffer(
                w.readframes(w.getnframes()), dtype="<i2"
            ).astype(np.int64)
        got = decode_wav(blob)
        assert got["n_samples"] == len(ref)
        assert got["peak"] == int(np.max(np.abs(ref)))
        assert got["sum_sq"] == int(np.sum(ref * ref))
        assert got["sum_abs"] == int(np.sum(np.abs(ref)))
        assert got["zero_crossings"] == int(np.sum((ref[:-1] * ref[1:]) < 0))
        assert got["duration_ms"] == len(ref) * 1000 // WAV_RATE


def test_wav_decoder_walks_noncanonical_chunk_order():
    """The chunk walk must survive a LIST/extra chunk before fmt and an
    odd-sized chunk (word alignment padding) — real WAV files in the wild
    carry both."""
    import struct

    from parquet_modular_encryption_spark.pipeline.multimodal import (
        decode_wav,
        encode_wav,
    )

    canonical = encode_wav(3)
    expected = decode_wav(canonical)
    # splice an odd-sized junk chunk between WAVE and fmt
    fmt_at = canonical.index(b"fmt ")
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
    hacked = canonical[:12] + junk + canonical[fmt_at:]
    hacked = b"RIFF" + struct.pack("<I", len(hacked) - 8) + hacked[8:]
    assert decode_wav(hacked) == expected


def test_pmi_ranks_true_collocation_above_frequent_independents(spark):
    """An engineered corpus where 'new york' only ever co-occur vs filler
    words that are frequent but independently distributed: the true
    collocation must take rank 1, and every reported pair must satisfy
    the exact integer PMI formula."""
    from parquet_modular_encryption_spark.pipeline.textops import (
        PMI_SCALE,
        pmi_collocations,
    )

    filler = ["the", "of", "data", "with", "runs"]
    rows = []
    for i in range(40):
        # 'new york' always adjacent; filler words shuffled deterministically
        f = [filler[(i + k) % 5] for k in range(5)]
        rows.append((i, " ".join(f[:2] + ["new", "york"] + f[2:] + f)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    out = pmi_collocations(docs).collect()
    assert out, "no collocations found"
    assert (out[0].w1, out[0].w2) == ("new", "york")
    for r in out:
        assert r.pmi_fixed == r.pair_cnt * PMI_SCALE // (r.cnt_w1 * r.cnt_w2)
    # the collocation's PMI strictly dominates any filler-filler pair
    filler_scores = [r.pmi_fixed for r in out[1:] if r.w1 in filler and r.w2 in filler]
    assert filler_scores and out[0].pmi_fixed > max(filler_scores)


def test_pareto_frontier_matches_bruteforce_with_ties(spark):
    """The window skyline must agree with a brute-force dominance check on
    an engineered set with every tie case: equal-x differing y, equal-y
    differing x, and fully duplicated (x, y) points (neither dominates —
    both stay on the frontier)."""
    from parquet_modular_encryption_spark.pipeline.textops import q43f_pareto_frontier

    out = q43f_pareto_frontier(spark, SF).collect()
    got = {(r.lang, r.doc_id) for r in out}

    # brute force over the same features the query derives
    import re

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    pts = []
    for d in docs:
        toks = [w for w in re.split(r"\s+", d.text.strip()) if w != ""]
        pts.append((d.lang, d.doc_id, d.n_chars, len(set(toks))))
    expect = set()
    for lang, doc_id, x, y in pts:
        dominated = any(
            g_lang == lang
            and gx >= x
            and gy >= y
            and (gx > x or gy > y)
            for g_lang, _gid, gx, gy in pts
        )
        if not dominated:
            expect.add((lang, doc_id))
    assert got == expect

    # engineered tie cases through the same plan via a temp parquet table
    rows = [
        (1, "a b c", "xx", "s", 10),   # frontier (longest, richest)
        (2, "a b", "xx", "s", 10),     # same x, lower y -> dominated
        (3, "a b c", "xx", "s", 7),    # shorter, same y as 1 -> dominated
        (4, "a b c", "xx", "s", 7),    # duplicate of 3 -> still dominated by 1
        (5, "d e f", "xx", "s", 10),   # duplicate (x, y) of 1 -> frontier too
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).write.mode("overwrite").parquet(f"{td}/documents.parquet")
        tie = {r.doc_id for r in q43f_pareto_frontier(spark, td).collect()}
    assert tie == {1, 5}


def test_scd2_pit_join_never_looks_ahead(spark):
    """PIT join leakage check: a fact row must never match a dimension
    version newer than its as-of version, and as-of 0 facts must see
    exactly version 0."""
    from parquet_modular_encryption_spark.operators.lifecycle import (
        q95c_scd2_point_in_time,
    )

    rows = q95c_scd2_point_in_time(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.matched_version <= r.version_queried
    v0 = [r for r in rows if r.version_queried == 0]
    assert {r.matched_version for r in v0} == {0}


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_two_phase_cc_matches_union_find_on_adversarial_graphs(spark):
    """large-star/small-star vs a driver-side union-find ground truth on:
    a long path (diameter >> log n — the case the algorithm exists for),
    disjoint cliques, a star, and a seeded random graph. Must converge in
    far fewer rounds than the path's diameter. Label propagation, whose
    round budget is O(diameter), must refuse the path graph loudly
    instead of returning capped (wrong) labels."""
    import random

    import pytest as _pytest

    from parquet_modular_encryption_spark.pipeline.dedup import (
        connected_components,
        two_phase_connected_components,
    )

    def labels_of(edges, stats=None):
        df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
        return {
            (r.node, r.component)
            for r in two_phase_connected_components(df, stats=stats).collect()
        }

    # long path 0-1-2-...-40 plus two cliques and a star
    path = [(i, i + 1) for i in range(40)]
    cliques = [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)] + [
        (200 + i, 200 + j) for i in range(4) for j in range(i + 1, 4)
    ]
    star = [(300, 300 + k) for k in range(1, 8)]
    rng = random.Random(7)
    rand = [(rng.randrange(400, 450), rng.randrange(400, 450)) for _ in range(60)]
    rand = [(a, b) for a, b in rand if a != b]

    for edges in (path, cliques, star, rand, path + cliques + star + rand):
        stats = {}
        got = labels_of(edges, stats)
        assert got == set(_union_find_components(edges).items())
    # the combined graph contains the 41-node path: diameter 40, but
    # two-phase must stay logarithmic
    assert stats["rounds"] <= 8

    # label propagation on the bare path exceeds its 20-round budget —
    # it must raise (silently-wrong capped labels were a real bug this
    # test caught), steering callers to the two-phase algorithm
    with _pytest.raises(RuntimeError, match="two_phase"):
        connected_components(
            spark.createDataFrame(path, "doc_a bigint, doc_b bigint")
        ).collect()


def test_incremental_dedup_census_invariants(spark, sf_dir):
    """q63d's census must tile the batch exactly (every batch doc counted
    in exactly one of exact/near/ingested) and the md5 split must cover
    the whole corpus — precedence and partition bugs both break these."""
    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.pipeline.dedup import (
        q63d_incremental_dedup,
    )
    from parquet_modular_encryption_spark.sources.datasets import load

    census = q63d_incremental_dedup(spark, sf_dir).collect()
    assert census, "empty census"
    for r in census:
        assert r.n_batch == r.n_dropped_exact + r.n_dropped_near + r.n_ingested

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_batch = sum(r.n_batch for r in census)
    n_corpus = docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "b"
    ).count()
    assert n_batch + n_corpus == n_docs
    assert 0 < n_batch < n_docs  # split actually produces both sides


def test_bigram_lm_scores_familiar_above_gibberish(spark, tmp_path):
    """q46b on an engineered corpus: an eval doc repeating the training
    distribution must out-score a gibberish doc (which backs off to ~0) —
    the CCNet-style ranking signal the fixed-point scheme must preserve."""
    import hashlib

    from parquet_modular_encryption_spark.pipeline.textops import (
        q46b_bigram_lm_score,
    )

    def side(doc_id):
        return hashlib.md5(str(doc_id).encode()).hexdigest()[0] <= "b"

    train_ids = [i for i in range(200) if side(i)][:40]
    eval_ids = [i for i in range(200) if not side(i)][:2]
    familiar_id, gibberish_id = eval_ids
    sentence = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, sentence, "en", "web", len(sentence)) for i in train_ids]
    rows.append((familiar_id, sentence, "en", "web", len(sentence)))
    gib = "zqx wvu jkl pqr mno abc def ghi stu vwx"
    rows.append((gibberish_id, gib, "en", "web", len(gib)))
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    scores = {
        r.doc_id: r.score_fp
        for r in q46b_bigram_lm_score(spark, str(tmp_path)).collect()
    }
    assert scores[familiar_id] > scores[gibberish_id]
    assert scores[gibberish_id] == 0  # no gibberish bigram appears in train
    # perfectly-reproduced training text scores the full fixed-point scale
    # except where bigram hashing merges left-contexts; allow headroom
    assert scores[familiar_id] > 500_000


def test_allpairs_prefix_filter_boilerplate(spark):
    """Prefix-filter skew kill (Bayardo WWW'07): a boilerplate tail shared
    by 300 documents makes its shingles df=300 hot keys. A naive inverted-
    index join would emit ~300^2/2 hits through those keys; the prefix
    filter puts high-df features in the (unindexed) suffix, so candidate
    count stays linear while the output remains EXACT — verified against
    a driver-side brute-force cosine over the same integer tf vectors."""
    import itertools
    import math

    from parquet_modular_encryption_spark.pipeline.dedup import (
        ALLPAIRS_T_DEN,
        ALLPAIRS_T_NUM,
        allpairs_candidates,
        allpairs_cosine,
        shingle_tf,
    )

    import hashlib

    boiler = "released under the acme public license version two"
    n_docs = 300
    # large unique bodies (md5 words) + small shared boilerplate tail:
    # boilerplate-pair cosine stays well under t, so the TRUE answer is
    # linear and any quadratic candidate blowup is pure prefix failure
    rows = [
        (
            i,
            " ".join(
                hashlib.md5(f"{i}-{j}".encode()).hexdigest() for j in range(30)
            )
            + " "
            + boiler,
        )
        for i in range(n_docs)
    ]
    # one genuine near-dup pair (mostly shared text => cosine > t)
    passage = " ".join(f"shared{k} word{k}" for k in range(40))
    rows += [
        (1000, f"alpha beta {passage}"),
        (1001, f"gamma delta {passage}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    tf = shingle_tf(docs)
    nrm = tf.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    n_cand = allpairs_candidates(tf, nrm).count()
    assert n_cand < 8 * n_docs, f"candidate blowup: {n_cand} (quadratic)"

    got = {
        (r.doc_a, r.doc_b): (r.dot_ab, r.norm2_a, r.norm2_b)
        for r in allpairs_cosine(docs).collect()
    }
    assert (1000, 1001) in got, "genuine near-dup pair lost"

    # exact agreement with driver-side brute force on integer tf vectors
    vecs: dict[int, dict[str, int]] = {}
    for doc_id, text in rows:
        toks = text.split()
        grams = (
            [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            if len(toks) >= 3
            else [" ".join(toks)]
        )
        v: dict[str, int] = {}
        for g in grams:
            v[g] = v.get(g, 0) + 1
        vecs[doc_id] = v
    want = {}
    for a, b in itertools.combinations(sorted(vecs), 2):
        va, vb = vecs[a], vecs[b]
        dot = sum(w * vb[g] for g, w in va.items() if g in vb)
        na = sum(w * w for w in va.values())
        nb = sum(w * w for w in vb.values())
        if ALLPAIRS_T_DEN**2 * dot * dot >= ALLPAIRS_T_NUM**2 * na * nb and dot > 0:
            want[(a, b)] = (dot, na, nb)
    assert got == want


def test_phrase_search_positions(spark):
    """Positional-index phrase intersection on engineered documents:
    counts and first positions must match hand-computed values, including
    back-to-back (overlap-free) repeats and a decoy doc containing all
    three words non-adjacently."""
    from parquet_modular_encryption_spark.pipeline.textops import (
        q98b_phrase_search,
    )
    from parquet_modular_encryption_spark.pipeline import textops

    rows = [
        # two matches at pos 2 and 7
        (1, "xx yy row column sort zz qq row column sort"),
        # all words present but never adjacent in order => no match
        (2, "row xx column yy sort part zz filter qq scan"),
        # match at pos 0
        (3, "customer part join tail words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    import unittest.mock as mock

    with mock.patch.object(textops, "load", lambda s, d, t: docs):
        got = {
            (r.phrase, r.doc_id): (r.n_matches, r.first_pos)
            for r in q98b_phrase_search(spark, "unused").collect()
        }
    assert got == {
        ("row column sort", 1): (2, 2),
        ("customer part join", 3): (1, 0),
    }


def test_png_unfilter_all_types_roundtrip():
    """decode_png_pixels must reverse every PNG scanline filter: the same
    pixel array encoded under None/Sub/Up/Average/Paeth decodes to
    identical bytes (the non-zero filters produce different COMPRESSED
    streams, so this genuinely exercises each unfilter branch)."""
    from parquet_modular_encryption_spark.pipeline.multimodal import (
        decode_png_pixels,
        lcg_pixels,
        png_from_pixels,
    )

    w, h = 21, 13  # deliberately not multiples of 8
    px = lcg_pixels(w, h, seed=99)
    encodings = {ft: png_from_pixels(w, h, px, filter_type=ft) for ft in range(5)}
    # sanity: filters actually change the byte stream
    assert len({e for e in encodings.values()}) == 5
    for ft, blob in encodings.items():
        got_w, got_h, got_px = decode_png_pixels(blob)
        assert (got_w, got_h) == (w, h), f"filter {ft}"
        assert got_px == px, f"filter {ft} roundtrip mismatch"


def test_ahash_flip_bound_exact():
    """Midpoint-threshold aHash decoupling: flipping a sampled pixel by
    +128 mod 256 changes EXACTLY that hash bit, so the planted twin sits
    at exactly PHASH_N_FLIPS Hamming distance — the bound the banding
    pigeonhole guarantee (PHASH_N_FLIPS < PHASH_BANDS) rests on."""
    from parquet_modular_encryption_spark.pipeline.multimodal import (
        _PHASH_FLIP_CELLS,
        PHASH_BANDS,
        PHASH_N_FLIPS,
        ahash64,
        lcg_pixels,
    )

    assert PHASH_N_FLIPS < PHASH_BANDS  # pigeonhole precondition
    for seed in range(20):
        w, h = 16 + (seed % 9) * 4, 16 + (seed % 7) * 4
        px = bytearray(lcg_pixels(w, h, seed=seed))
        twin = bytearray(px)
        for cell in _PHASH_FLIP_CELLS:
            y, x = ((cell // 8) * h) // 8, ((cell % 8) * w) // 8
            twin[y * w + x] = (twin[y * w + x] + 128) % 256
        ha = ahash64(w, h, bytes(px))
        hb = ahash64(w, h, bytes(twin))
        assert bin((ha ^ hb) & (1 << 64) - 1).count("1") == PHASH_N_FLIPS


def test_chunk_dedup_first_occurrence(spark):
    """Chunk-level dedup precedence: the lexicographically first
    (doc_id, chunk_index) occurrence of a chunk survives; exact-copy
    documents lose every chunk, partial copies lose only the copied
    prefix chunks."""
    from parquet_modular_encryption_spark.pipeline import textops
    from parquet_modular_encryption_spark.pipeline.textops import (
        DEDUP_CHUNK_TOKENS,
        q43g_chunk_dedup,
    )
    import unittest.mock as mock

    k = DEDUP_CHUNK_TOKENS
    body = " ".join(f"w{i}" for i in range(2 * k))  # exactly 2 full chunks
    uniq = " ".join(f"u{i}" for i in range(k))
    rows = [
        (1, body),                                   # both chunks original
        (2, body),                                   # exact copy: all dropped
        (3, " ".join(f"w{i}" for i in range(k)) + " " + uniq),  # chunk0 copied
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    with mock.patch.object(textops, "load", lambda s, d, t: docs):
        got = {
            r.doc_id: (r.n_chunks, r.n_kept, r.tokens_kept, r.tokens_dropped)
            for r in q43g_chunk_dedup(spark, "unused").collect()
        }
    assert got == {
        1: (2, 2, 2 * k, 0),
        2: (2, 0, 0, 2 * k),
        3: (2, 1, k, k),
    }


def test_skew_profile_uniform_vs_hot(spark):
    """q86b's skew multiplier calibration: a perfectly uniform key
    profiles at exactly 1e6 ppm (cnt * n_keys == total), while a key
    holding half the rows profiles at n_keys/2 x 1e6."""
    from parquet_modular_encryption_spark.operators import grouping
    from parquet_modular_encryption_spark.operators.grouping import (
        SKEW_PPM,
        q86b_skew_profile,
    )
    import unittest.mock as mock

    # uniform: 10 supplier keys x 5 rows; hot: part key 1 takes 50 of 100
    # rows, the rest spread over keys 2..51
    li_rows = []
    for i in range(50):
        li_rows.append((i % 10 + 1, 1 if i < 25 else (i - 23)))
    for i in range(50):
        li_rows.append(((i + 5) % 10 + 1, 1 if i < 25 else (i + 25)))
    li = spark.createDataFrame(li_rows, "l_suppkey bigint, l_partkey bigint")
    orders = spark.createDataFrame([(k,) for k in range(4)], "o_custkey bigint")

    tables = {"lineitem": li, "orders": orders}
    with mock.patch.object(grouping, "load", lambda s, d, t: tables[t]):
        rows = q86b_skew_profile(spark, "unused").collect()

    supp = [r for r in rows if r.key_column == "l_suppkey"]
    assert all(r.skew_x_ppm == SKEW_PPM for r in supp), supp
    part_top = next(
        r for r in rows if r.key_column == "l_partkey" and r.rank == 1
    )
    assert part_top.key_value == 1 and part_top.cnt == 50
    n_part_keys = li.select("l_partkey").distinct().count()
    assert part_top.skew_x_ppm == (50 * n_part_keys * SKEW_PPM) // 100


def test_chunk_dedup_rewrite_content(spark):
    """q63e reassembly correctness on engineered docs: kept chunks
    concatenate in chunk order; a fully-duplicated document rewrites to
    the empty string (md5 of '')."""
    import hashlib
    import unittest.mock as mock

    from parquet_modular_encryption_spark.pipeline import textops
    from parquet_modular_encryption_spark.pipeline.textops import (
        DEDUP_CHUNK_TOKENS,
        q63e_chunk_dedup_rewrite,
    )

    k = DEDUP_CHUNK_TOKENS
    c0 = " ".join(f"a{i}" for i in range(k))
    c1 = " ".join(f"b{i}" for i in range(k))
    uniq = " ".join(f"u{i}" for i in range(k))
    rows = [
        (1, f"{c0} {c1}"),          # both original
        (2, f"{c0} {c1}"),          # exact copy -> rewrites to ""
        (3, f"{c1} {uniq}"),        # chunk c1 dropped, uniq kept
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    with mock.patch.object(textops, "load", lambda s, d, t: docs):
        got = {
            r.doc_id: (r.n_tokens_before, r.n_tokens_after, r.rewritten_md5)
            for r in q63e_chunk_dedup_rewrite(spark, "unused").collect()
        }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got == {
        1: (2 * k, 2 * k, md5(f"{c0} {c1}")),
        2: (2 * k, 0, md5("")),
        3: (2 * k, k, md5(uniq)),
    }


def test_phash_encrypted_least_privilege(spark):
    """q91f's encrypted media lake enforces the lattice: payload bytes
    need a RESTRICTED token (PUBLIC is denied by the KMS), while the
    plaintext media_id column reads fine with no token at all."""
    import pytest

    from parquet_modular_encryption_spark.pipeline.multimodal import (
        _media_encryption_policy,
        _phash_fixture_dir,
        encode_png,
    )
    from parquet_modular_encryption_spark.scratch import scratch_dir
    from parquet_modular_encryption_spark.sources.encrypted import (
        read_encrypted,
        write_encrypted,
    )
    from pyspark.sql import functions as F

    media = spark.createDataFrame(
        [(i, bytearray(encode_png(16, 16, seed=i))) for i in range(8)],
        "media_id bigint, payload binary",
    ).coalesce(1)
    path = scratch_dir("pme_q91f_test_")
    write_encrypted(media, path, _media_encryption_policy())

    # keyless catalog read of the plaintext id column
    ids = read_encrypted(spark, path, token=None, columns=["media_id"])
    assert sorted(r.media_id for r in ids.collect()) == list(range(8))

    # PUBLIC token must not decrypt the RESTRICTED payload
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        read_encrypted(spark, path, token="PUBLIC", columns=["payload"]).collect()
    assert "403" in str(ei.value) or "Forbidden" in str(ei.value) or "unwrap" in str(
        ei.value
    ).lower()

    # RESTRICTED token round-trips the exact bytes
    got = {
        r.media_id: bytes(r.payload)
        for r in read_encrypted(spark, path, token="RESTRICTED").collect()
    }
    assert got[3] == encode_png(16, 16, seed=3)


def test_jsonl_sink_commit_protocol(spark, tmp_path):
    """The custom sink's two-phase commit: a committed job leaves only
    visible *.json shards plus a _SUCCESS manifest with exact row/file
    counts; mode('overwrite') replaces prior data; abort() removes
    temporaries so failed jobs leave nothing visible."""
    import json
    import os

    from parquet_modular_encryption_spark.sources.python_datasource import (
        JsonlCommit,
        JsonlDataSource,
        JsonlShardWriter,
    )

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(i, f"t{i}", "en", "web", 2) for i in range(20)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).repartition(3)
    df.write.format("pme_jsonl").mode("append").option("path", out).save()

    files = sorted(os.listdir(out))
    shards = [f for f in files if f.endswith(".json")]
    assert not [f for f in files if f.endswith(".tmp")]
    assert "_SUCCESS" in files
    manifest = json.loads(open(os.path.join(out, "_SUCCESS")).read())
    assert manifest == {"rows": 20, "files": len(shards)}

    # read-back sees exactly the committed rows
    back = spark.read.format("pme_jsonl").option("path", out).load()
    assert back.count() == 20

    # overwrite replaces: half the rows, manifest updated
    df.limit(10).repartition(2).write.format("pme_jsonl").mode(
        "overwrite"
    ).option("path", out).save()
    back2 = spark.read.format("pme_jsonl").option("path", out).load()
    assert back2.count() == 10

    # abort cleans temporaries
    tmp_file = os.path.join(out, "part-99999-dead.json.tmp")
    open(tmp_file, "w").write("{}\n")
    JsonlShardWriter(out, overwrite=False).abort(
        [JsonlCommit(tmp_path=tmp_file, n_rows=1)]
    )
    assert not os.path.exists(tmp_file)


def test_weighted_median_reference(spark):
    """q66b against a hand-computed weighted median, including the
    half-total boundary case (cumulative weight exactly half lands ON the
    crossing value — lower-median convention)."""
    import unittest.mock as mock

    from decimal import Decimal

    from parquet_modular_encryption_spark.operators import advanced
    from parquet_modular_encryption_spark.operators.advanced import (
        q66b_weighted_median,
    )

    # group X: values 1,2,3 weights 1,1,2 -> total 4, half 2, cum at
    # price 2 is exactly 2 -> median 2 (lower convention)
    # group Y: single heavy value dominates
    rows = [
        ("X", Decimal("1.00"), Decimal("1")),
        ("X", Decimal("2.00"), Decimal("1")),
        ("X", Decimal("3.00"), Decimal("2")),
        ("Y", Decimal("10.00"), Decimal("1")),
        ("Y", Decimal("20.00"), Decimal("5")),
    ]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_extendedprice decimal(12,2), l_quantity decimal(12,2)",
    )
    with mock.patch.object(advanced, "load", lambda s, d, t: li):
        got = {
            r.l_returnflag: (r.weighted_median, r.total_weight_x100, r.n_rows)
            for r in q66b_weighted_median(spark, "unused").collect()
        }
    assert got == {"X": (2.0, 400, 3), "Y": (20.0, 600, 2)}


def test_hard_negative_margins(spark):
    """q50d structure on engineered embeddings: the anchor positive is
    the most similar same-label vector (margin exactly 0), negatives are
    different-label with non-positive margins in rank order, and a query
    whose label is unique yields no rows."""
    import unittest.mock as mock

    from parquet_modular_encryption_spark.pipeline import similarity
    from parquet_modular_encryption_spark.pipeline.similarity import (
        HN_K,
        q50d_hard_negatives,
    )

    # queries are vec_id < N_QUERIES (8); keep ids 0..7 as queries and
    # give label 99 only to query 7 (no positive possible)
    rows = []
    import math

    for i in range(16):
        angle = i * 0.3
        label = 99 if i == 7 else i % 3
        rows.append((i, [math.cos(angle), math.sin(angle)], label))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    with mock.patch.object(similarity, "load", lambda s, d, t: emb):
        out = q50d_hard_negatives(spark, "unused").collect()

    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert 7 not in by_q, "label-unique query must yield no rows"
    for qid, rs in by_q.items():
        pos = [r for r in rs if r.role == "pos"]
        neg = sorted((r for r in rs if r.role == "neg"), key=lambda r: r.rank)
        assert len(pos) == 1 and pos[0].rank == 1 and pos[0].margin == 0.0
        assert 1 <= len(neg) <= HN_K
        # negatives in descending-similarity rank order
        sims = [r.cosine_sim for r in neg]
        assert sims == sorted(sims, reverse=True)


def test_ppjoin_prefix_skew_and_exactness(spark):
    """q49c's PPJoin filters on an engineered corpus: boilerplate shingles
    (high df) sit in every suffix so no candidate flows through them, the
    length filter kills size-mismatched pairs, and the output equals a
    driver-side brute-force global Jaccard — lossless pruning."""
    import hashlib
    import itertools
    import unittest.mock as mock

    from parquet_modular_encryption_spark.pipeline import dedup as dd
    from parquet_modular_encryption_spark.pipeline.dedup import (
        PPJOIN_T_DEN,
        PPJOIN_T_NUM,
        q49c_jaccard_ppjoin,
    )

    boiler = "standard footer text appended to every document here"
    rows = [
        (
            i,
            " ".join(
                hashlib.md5(f"{i}-{j}".encode()).hexdigest() for j in range(25)
            )
            + " "
            + boiler,
        )
        for i in range(200)
    ]
    passage = " ".join(f"s{k} t{k}" for k in range(30))
    rows += [(1000, f"aa bb {passage}"), (1001, f"cc dd {passage}")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    with mock.patch.object(dd, "load", lambda s, d, t: docs):
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in q49c_jaccard_ppjoin(spark, "unused").collect()
        }
    assert (1000, 1001) in got

    # driver-side brute force over distinct shingle sets
    def sset(text):
        t = text.split()
        return (
            {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
            if len(t) >= 3
            else {" ".join(t)}
        )

    sets = {i: sset(tx) for i, tx in rows}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if PPJOIN_T_DEN * i >= PPJOIN_T_NUM * u:
            want[(a, b)] = i / u
    assert got == want


def test_rolling_anomaly_engineered(spark):
    """q97c on an engineered stream: a flat baseline then one spike — the
    spike is flagged against its trailing history, the baseline rows are
    not, and the event AFTER the spike is judged against a window that
    now CONTAINS the spike (inflated variance => not flagged)."""
    import datetime
    import unittest.mock as mock

    from parquet_modular_encryption_spark.operators import events as ev_mod
    from parquet_modular_encryption_spark.operators.events import (
        ANOMALY_MIN_HIST,
        q97c_rolling_anomaly,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # 30 baseline events oscillating 10.0/10.2 (non-zero variance), then a
    # 100x spike, then a return to baseline
    for i in range(30):
        rows.append((i, base + datetime.timedelta(minutes=i), 1, "m", 10.0 + 0.2 * (i % 2), "{}"))
    rows.append((30, base + datetime.timedelta(minutes=30), 1, "m", 1000.0, "{}"))
    rows.append((31, base + datetime.timedelta(minutes=31), 1, "m", 10.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    with mock.patch.object(ev_mod, "load", lambda s, d, t: ev):
        flagged = {r.event_id for r in q97c_rolling_anomaly(spark, "unused").collect()}
    assert 30 in flagged, "spike not flagged"
    assert all(i not in flagged for i in range(ANOMALY_MIN_HIST, 30)), "baseline flagged"


def test_csv_failfast_aborts(spark, tmp_path):
    """The third malformed-record mode: FAILFAST must abort the read on
    the first corrupt line (q39d covers PERMISSIVE/DROPMALFORMED, whose
    counts are hash-checked; abort semantics can only be pinned here)."""
    import pytest

    src = tmp_path / "bad.csv"
    src.write_text("1,ok,2.5\ncorrupt,###,zzz\n")
    df = (
        spark.read.schema("k bigint, s string, v double")
        .option("mode", "FAILFAST")
        .csv(str(src))
    )
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_pseudonym_properties(spark):
    """q56b invariants: tokens are stable across runs (same input, same
    token), distinct across column tags for identical raw values, and the
    raw value never appears in the output."""
    from parquet_modular_encryption_spark.pipeline.textops import (
        PSEUDO_LEN,
        PSEUDO_SECRET,
        q56b_pseudonymize,
    )
    import hashlib

    rows = q56b_pseudonymize(spark, "/root/testdata/sf0.001").collect()
    assert rows
    r = next(x for x in rows if x.c_custkey == 1)
    # independently recompute the keyed token for custkey 1's name
    import duckdb

    name = duckdb.sql(
        "SELECT c_name FROM '/root/testdata/sf0.001/customer.parquet' "
        "WHERE c_custkey = 1"
    ).fetchone()[0]
    want = hashlib.sha256(f"{PSEUDO_SECRET}:name:{name}".encode()).hexdigest()[:PSEUDO_LEN]
    assert r.name_token == want
    assert name not in (r.name_token, r.nation_token)
    # same raw value under different tags -> different tokens
    t_name = hashlib.sha256(f"{PSEUDO_SECRET}:name:5".encode()).hexdigest()[:PSEUDO_LEN]
    t_nation = hashlib.sha256(f"{PSEUDO_SECRET}:nation:5".encode()).hexdigest()[:PSEUDO_LEN]
    assert t_name != t_nation


def test_avi_bi_rgb_roundtrip():
    """q91g's decoder recovers the exact planted pixels from a
    spec-correct uncompressed AVI for every (width, height, frame-count)
    combination the fixture uses — widths are odd, so 1-3 stride-padding
    bytes per row are always in play, and the row-gradient pattern makes
    the bottom-up un-flip load-bearing (a flip-forgetting decode produces
    reversed rows, not equal bytes). A compressed strf must raise: the
    decoder is honest about its BI_RGB-only scope."""
    import struct

    import pytest

    from parquet_modular_encryption_spark.pipeline.multimodal import (
        _avi_frame_pixels,
        _avi_params,
        decode_avi_bi_rgb,
        encode_avi_bi_rgb,
    )

    for mid in (0, 41, 82, 123, 164):  # covers all 5 widths / 3 heights
        w, h, nf = _avi_params(mid)
        frames = [_avi_frame_pixels(mid, f, w, h) for f in range(nf)]
        blob = encode_avi_bi_rgb(w, h, frames)
        rw, rh, back = decode_avi_bi_rgb(blob)
        assert (rw, rh) == (w, h)
        assert back == frames, f"pixel mismatch for media {mid}"
        assert (w * 3) % 4 != 0, "fixture width no longer exercises padding"
        # header-only parsers still work on the same bytes (q91c interop)
        from parquet_modular_encryption_spark.pipeline.multimodal import sniff_video

        fmt, sw, sh, sn = sniff_video(blob)
        assert (fmt, sw, sh, sn) == ("avi", w, h, nf)

    # flipping rows is NOT a no-op: decoded frames differ from a
    # bottom-up (unflipped) reading whenever h > 1
    w, h, nf = _avi_params(41)
    f0 = _avi_frame_pixels(41, 0, w, h)
    assert f0 != f0[::-1] and decode_avi_bi_rgb(
        encode_avi_bi_rgb(w, h, [f0])
    )[2][0] == f0

    # compressed or non-24-bit content is refused, never guessed at
    blob = bytearray(encode_avi_bi_rgb(w, h, [f0]))
    i = blob.find(b"strf") + 8
    comp_off = i + 16  # biSize(4) biWidth(4) biHeight(4) biPlanes+biBitCount(4)
    blob[comp_off:comp_off + 4] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError, match="BI_RGB"):
        decode_avi_bi_rgb(bytes(blob))


def test_ppjoin_incremental_bruteforce_exactness(spark):
    """q49d's one-sided PPJoin (batch prefixes ranked by STALE corpus df
    probing the corpus posting index) equals a driver-side brute force
    over all cross-split pairs — lossless even though batch-only tokens
    rank with df 0 and a planted near-dup pair straddles the split."""
    import hashlib
    import unittest.mock as mock

    from parquet_modular_encryption_spark.pipeline import dedup as dd
    from parquet_modular_encryption_spark.pipeline.dedup import (
        PPJOIN_T_DEN,
        PPJOIN_T_NUM,
        q49d_jaccard_ppjoin_incremental,
    )

    def is_corpus(doc_id: int) -> bool:
        return hashlib.md5(str(doc_id).encode()).hexdigest()[0] <= "b"

    boiler = "standard footer text appended to every document here"
    rows = [
        (
            i,
            " ".join(
                hashlib.md5(f"{i}-{j}".encode()).hexdigest() for j in range(25)
            )
            + " "
            + boiler,
        )
        for i in range(200)
    ]
    # plant a near-dup pair that STRADDLES the split (and a batch-internal
    # pair that must NOT be reported — q49d screens batch vs corpus only)
    batch_ids = [i for i in range(1000, 1100) if not is_corpus(i)]
    corpus_ids = [i for i in range(1000, 1100) if is_corpus(i)]
    passage = " ".join(f"s{k} t{k}" for k in range(30))
    straddle = (batch_ids[0], corpus_ids[0])
    rows += [
        (straddle[0], f"aa bb {passage}"),
        (straddle[1], f"cc dd {passage}"),
        (batch_ids[1], f"ee ff {passage}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    with mock.patch.object(dd, "load", lambda s, d, t: docs):
        got = {
            (r.doc_batch, r.doc_corpus): r.jaccard
            for r in q49d_jaccard_ppjoin_incremental(spark, "unused").collect()
        }
    assert (straddle[0], straddle[1]) in got
    assert all(is_corpus(b) and not is_corpus(a) for a, b in got)

    def sset(text):
        t = text.split()
        return (
            {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
            if len(t) >= 3
            else {" ".join(t)}
        )

    sets = {i: sset(tx) for i, tx in rows}
    want = {}
    for a in sets:
        if is_corpus(a):
            continue
        for b in sets:
            if not is_corpus(b):
                continue
            i = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if PPJOIN_T_DEN * i >= PPJOIN_T_NUM * u:
                want[(a, b)] = i / u
    assert got == want


def test_split_verify_equals_legacy(spark):
    """r15 split verify (prefix-overlap folded into the candidate
    aggregation, fan-out over SUFFIX postings only) must return exactly
    the legacy full-fan-out verify's frame for BOTH exact-join families,
    including pairs whose shared features sit entirely in prefix(a) —
    those reach the answer through the left join's empty suffix sum, so
    they are the regression this test exists to catch. The chunked
    variant must also hold chunk-by-chunk (cand carries the extra
    dot_p/i_p column through verify_chunk)."""
    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.pipeline.dedup import (
        allpairs_candidates,
        allpairs_verify,
        ppjoin_candidates,
        ppjoin_verify,
        shingle_tf,
        verify_chunk,
    )
    from parquet_modular_encryption_spark.sources.datasets import load

    docs = load(spark, SF, "documents")

    # --- q49c (PPJoin Jaccard) ---
    toks, legacy_cand = ppjoin_candidates(docs)
    toks2, cand, suffix = ppjoin_candidates(docs, split_verify=True)
    # same candidate pair set, plus the exact prefix-overlap count
    legacy_pairs = {(r.doc_a, r.doc_b) for r in legacy_cand.collect()}
    split_rows = cand.collect()
    assert {(r.doc_a, r.doc_b) for r in split_rows} == legacy_pairs
    assert all(r.i_p >= 1 for r in split_rows), "every candidate shares a prefix tok"
    want = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in ppjoin_verify(toks, legacy_cand).collect()
    }
    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in ppjoin_verify(toks2, cand, suffix=suffix).collect()
    }
    assert want and got == want
    chunked: set = set()
    for c in range(3):
        chunked |= {
            (r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in ppjoin_verify(
                toks2, verify_chunk(cand, c, 3), suffix=suffix
            ).collect()
        }
    assert chunked == want

    # --- q55c (Bayardo cosine) ---
    tf = shingle_tf(docs)
    nrm = tf.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    legacy_cand2 = allpairs_candidates(tf, nrm)
    cand2, suffix2 = allpairs_candidates(tf, nrm, split_verify=True)
    assert {(r.doc_a, r.doc_b) for r in cand2.collect()} == {
        (r.doc_a, r.doc_b) for r in legacy_cand2.collect()
    }
    # prefix/suffix partition each doc's posting rows exactly
    n_tf = tf.count()
    n_suffix = suffix2.count()
    prefix_rows = n_tf - n_suffix
    assert 0 < n_suffix < n_tf and prefix_rows > 0
    want2 = {
        (r.doc_a, r.doc_b, r.dot_ab, r.norm2_a, r.norm2_b)
        for r in allpairs_verify(tf, nrm, legacy_cand2).collect()
    }
    got2 = {
        (r.doc_a, r.doc_b, r.dot_ab, r.norm2_a, r.norm2_b)
        for r in allpairs_verify(tf, nrm, cand2, suffix=suffix2).collect()
    }
    assert want2 and got2 == want2

    # a synthetic pair whose shared grams are ALL in prefix(a): two short
    # identical docs — every gram is rare (df 2), the maxw bound keeps
    # them entirely in each other's prefixes, so the suffix join finds
    # nothing and the pair must survive on dot_p alone
    tiny = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "wholly different text entirely")],
        "doc_id bigint, text string",
    )
    ttf = shingle_tf(tiny)
    tnrm = ttf.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    tcand, tsuffix = allpairs_candidates(ttf, tnrm, split_verify=True)
    tres = {
        (r.doc_a, r.doc_b)
        for r in allpairs_verify(ttf, tnrm, tcand, suffix=tsuffix).collect()
    }
    assert (1, 2) in tres, "all-shared-in-prefix pair lost by split verify"


def test_chunked_verify_equals_monolithic(spark):
    """VERDICT r9 item 3: the bounded-spill chunked verify must be
    EXACTLY the monolithic exact join. verify_chunk partitions the
    candidate frame by doc_a residue class, each chunk runs the
    identical factored verify stage (ppjoin_verify / allpairs_verify),
    and the union of chunk outputs must equal the one-shot result
    row-for-row — the correctness lemma that lets the sf10 experiment
    (scripts/sf10_chunked_experiment.py) run each chunk in its own
    session to cap concurrent shuffle spill at ~1/n_chunks."""
    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.pipeline.dedup import (
        allpairs_candidates,
        allpairs_cosine,
        allpairs_verify,
        ppjoin_candidates,
        ppjoin_verify,
        shingle_tf,
        verify_chunk,
    )
    from parquet_modular_encryption_spark.sources.datasets import load

    docs = load(spark, SF, "documents")
    n_chunks = 4

    # --- q49c (PPJoin Jaccard) ---
    toks, cand = ppjoin_candidates(docs)
    n_cand = cand.count()
    assert n_cand > 0, "fixture has no candidates — test is vacuous"
    full = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in ppjoin_verify(toks, cand).collect()
    }
    assert full, "fixture has no verified pairs — test is vacuous"
    chunked: set = set()
    chunk_sizes = []
    for c in range(n_chunks):
        part = verify_chunk(cand, c, n_chunks)
        chunk_sizes.append(part.count())
        got = {
            (r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in ppjoin_verify(toks, part).collect()
        }
        assert not (got & chunked), "chunks overlap"
        chunked |= got
    assert sum(chunk_sizes) == n_cand, "residue classes must partition candidates"
    assert chunked == full

    # --- q55c (Bayardo all-pairs cosine) ---
    tf = shingle_tf(docs)
    nrm = tf.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    cand2 = allpairs_candidates(tf, nrm)
    full2 = {
        (r.doc_a, r.doc_b, r.dot_ab, r.norm2_a, r.norm2_b)
        for r in allpairs_cosine(docs).collect()
    }
    assert full2, "fixture has no qualifying cosine pairs — test is vacuous"
    chunked2: set = set()
    for c in range(n_chunks):
        chunked2 |= {
            (r.doc_a, r.doc_b, r.dot_ab, r.norm2_a, r.norm2_b)
            for r in allpairs_verify(
                tf, nrm, verify_chunk(cand2, c, n_chunks)
            ).collect()
        }
    assert chunked2 == full2


def test_salted_verify_fanout_equals_plain_join(spark, monkeypatch):
    """VERDICT r13 #2: the verify stage's skew salting must be a purely
    PHYSICAL transform — identical row set to the plain cand x postings
    join for both verify flavors, hot branch exercised. The salt target
    is monkeypatched down so the tiny fixture actually has hot doc_a's
    (every doc with >2 pairs splits into salt cells), and a planted
    mega-doc drives multi-cell salting; equality then covers cold path,
    hot path, and the union seam at once."""
    from parquet_modular_encryption_spark.pipeline import dedup
    from parquet_modular_encryption_spark.pipeline.dedup import (
        allpairs_candidates,
        allpairs_verify,
        ppjoin_candidates,
        ppjoin_verify,
        salted_verify_fanout,
        shingle_tf,
    )
    from parquet_modular_encryption_spark.sources.datasets import load

    # direct helper equality on a planted-skew frame: doc 0 carries 40
    # of the 46 pairs, so with target 3 it salts ~14 ways
    monkeypatch.setattr(dedup, "VERIFY_SALT_PAIR_TARGET", 3)
    cand = spark.createDataFrame(
        [(0, b) for b in range(1, 41)] + [(5, 6), (7, 8), (9, 10), (2, 3), (4, 6), (1, 9)],
        "doc_a bigint, doc_b bigint",
    )
    post = spark.createDataFrame(
        [(d, f"t{j}") for d in range(11) for j in range(d % 4 + 1)],
        "doc_a bigint, tok string",
    )
    plain = {tuple(r) for r in cand.join(post, "doc_a").collect()}
    salted = {tuple(r) for r in salted_verify_fanout(cand, post).collect()}
    assert salted == plain and plain, "salting must not change the row set"

    # end-to-end: both verify flavors, salted vs not, on the real fixture
    docs = load(spark, SF, "documents")
    toks, pcand = ppjoin_candidates(docs)
    monkeypatch.setattr(dedup, "VERIFY_SALT_PAIR_TARGET", 2)
    ref = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in ppjoin_verify(toks, pcand).collect()
    }
    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in ppjoin_verify(toks, pcand, salted=True).collect()
    }
    assert ref and got == ref

    tf = shingle_tf(docs)
    nrm = tf.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    acand = allpairs_candidates(tf, nrm)
    ref2 = {
        (r.doc_a, r.doc_b, r.dot_ab) for r in allpairs_verify(tf, nrm, acand).collect()
    }
    got2 = {
        (r.doc_a, r.doc_b, r.dot_ab)
        for r in allpairs_verify(tf, nrm, acand, salted=True).collect()
    }
    assert ref2 and got2 == ref2


def test_grouped_exact_joins_equal_monolith(spark, monkeypatch):
    """The REGISTERED grouped operators (q49e/q55d, VERDICT r10 item 2)
    must return the monolithic q49c/q55c answer frame exactly — same
    columns, same rows — through the full materialize -> chunked verify
    -> schema-pinned union-read path (not just the in-memory
    verify_chunk lemma the sibling test pins). Runs with a chunk count
    that does not divide the doc-id range evenly, and large enough that
    at least one chunk plausibly writes zero pairs — the part-less
    chunk directory must not break the reduce read (ADVICE r10)."""
    from parquet_modular_encryption_spark.registry import load_all

    monkeypatch.setenv("SPARK_GRAFT_GROUPED_CHUNKS", "7")
    registry = load_all()
    for grouped_name, mono_name, cols in [
        ("q49e_jaccard_ppjoin_grouped", "q49c_jaccard_ppjoin",
         ("doc_a", "doc_b", "jaccard")),
        ("q55d_allpairs_sparse_grouped", "q55c_allpairs_sparse",
         ("doc_a", "doc_b", "dot_ab", "norm2_a", "norm2_b", "cosine_sim")),
    ]:
        g = registry[grouped_name].builder(spark, SF)
        m = registry[mono_name].builder(spark, SF)
        assert g.columns == m.columns == list(cols)
        canon = lambda df: sorted(
            tuple(round(v, 12) if isinstance(v, float) else v for v in r)
            for r in df.collect()
        )
        grows, mrows = canon(g), canon(m)
        assert mrows, f"{mono_name}: fixture has no pairs — test is vacuous"
        assert grows == mrows, grouped_name


def test_salted_grid_auto_sizing(spark):
    """The salted self-join's reducer grid sizes itself from the block
    census (r12; PER-BLOCK + cap 256 since r13): smallest power-of-two
    g in [4, 256] with per-cell pair work (k/g)^2 <= PAIR_CELL_TARGET —
    pinned at the measured calibration points (boiler1 max 1,018 -> 4;
    boiler3 2,980 -> 8; the r11 planted 6,143 bucket -> 16; a 50k block
    -> 128; cap at 256). The grid is physical only, so the adaptive
    choice must leave the pair set exactly equal to the plain join's —
    asserted on a planted hot-bucket frame big enough to force g = 8,
    with the decision recorded. The per-block SQL mirror must agree
    with the Python rule at every boundary."""
    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.pipeline import dedup as D

    assert [D._auto_grid(k) for k in (0, 1018, 2980, 6143, 50_000, 10**6)] == [
        4, 4, 8, 16, 128, 256,
    ]

    # parallelism cap (r14): the grid a session can USE — pinned at both
    # regimes the rule is sized for. local[32] → 64 (the measured
    # straggler-1.24-at-wall-parity point, SCALE_r14_mega; grid 128's
    # 16,384 cells paid 33% wall in r13); a 1000-executor × 8-core
    # session keeps the full 256 mega-block ceiling.
    assert D._parallelism_grid_cap(32) == 64
    assert D._parallelism_grid_cap(8000) == 256
    assert D._parallelism_grid_cap(1) == 16
    assert D._parallelism_grid_cap(500_000) == D.PAIR_GRID_MAX

    # engine-side per-block mirror == the Python rule, swept across every
    # power-of-two boundary +-1 (k <= 500g is the integer-exact form)
    probes = sorted(
        {1, 2, D.HOT_BUCKET_THRESHOLD + 1}
        | {500 * g + d for g in (4, 8, 16, 32, 64, 128, 256) for d in (-1, 0, 1)}
        | {10**6}
    )
    got = (
        spark.createDataFrame([(n,) for n in probes], "n long")
        .select("n", D._auto_grid_expr(F.col("n")).alias("g"))
        .collect()
    )
    assert {r.n: r.g for r in got} == {n: D._auto_grid(n) for n in probes}

    # one hot bucket of 2,400 members forces g = 8: per-cell pair work on
    # the 4x4 floor is (2400/4)^2 = 360k > PAIR_CELL_TARGET (250k), and
    # one doubling lands at (2400/8)^2 = 90k <= 250k
    hot = [(i, 0, "HOT") for i in range(2400)]
    cold = [(10_000 + i, 0, f"c{i // 3}") for i in range(90)]
    bands = spark.createDataFrame(
        hot + cold, "doc_id bigint, band_id int, band_key string"
    )
    plain = {
        (r.doc_a, r.doc_b) for r in D.banded_pairs(bands).distinct().collect()
    }
    salted = {
        (r.doc_a, r.doc_b)
        for r in D.banded_pairs_salted(bands).distinct().collect()
    }
    cap = D._parallelism_grid_cap(spark.sparkContext.defaultParallelism)
    assert D.LAST_SALTED_GRID == {
        "k_max": 2400,
        "grid": min(8, cap),
        "grid_work": 8,
        "parallelism_cap": cap,
    }
    assert salted == plain and len(plain) > 2_800_000


def test_salted_grid_over_cap_warns(spark):
    """The mega-block contract (VERDICT r12 #5): a block whose pair work
    exceeds the PAIR_CELL_TARGET even at the PAIR_GRID_MAX ceiling must
    raise a visible warning with the per-cell estimate and record the
    clamp in LAST_SALTED_GRID — gridding distributes k^2 work, it cannot
    shrink it, and a 100 TB pipeline must SEE degenerate blocks instead
    of silently straggling. The warning fires at census/decision time
    (driver-side), so asserting it does not require executing the
    explosive join itself."""
    import warnings

    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.pipeline import dedup as D

    k = 130_000  # _auto_grid clamps at 256 and (k/256)^2 > PAIR_CELL_TARGET
    assert D._auto_grid(k) == D.PAIR_GRID_MAX
    bands = spark.range(k).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band_id"),
        F.lit("MEGA").alias("band_key"),
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        D.banded_pairs_salted(bands)  # lazy: only the census job runs
    msgs = [str(w.message) for w in caught if "grid ceiling" in str(w.message)]
    assert msgs, "over-cap block did not warn"
    assert str(k) in msgs[0] and "pairs PER CELL" in msgs[0]
    g = D.LAST_SALTED_GRID
    # the WORK rule hits the ceiling (the over-cap contract keys off it);
    # the APPLIED grid additionally respects the session parallelism cap
    cap = D._parallelism_grid_cap(spark.sparkContext.defaultParallelism)
    assert g["k_max"] == k and g["grid_work"] == D.PAIR_GRID_MAX
    assert g["grid"] == min(D.PAIR_GRID_MAX, cap)
    assert g["clamped"] == 1
    assert g["est_cell_pairs"] == int((k / D.PAIR_GRID_MAX) ** 2) > D.PAIR_CELL_TARGET


def test_salted_hot_feature_join_equals_plain_join(spark):
    """r14: the bipartite hot-feature grid must be purely physical —
    identical row set to the plain key join with a planted hot key big
    enough to force a real grid (threshold driven low), cold keys and
    the union seam covered, and the no-hot-key census branch returning
    the plain join's rows too."""
    from parquet_modular_encryption_spark.pipeline import dedup as D

    left = spark.createDataFrame(
        [(a, "HOT") for a in range(40)] + [(100 + a, f"c{a % 5}") for a in range(20)],
        "doc_a bigint, g string",
    )
    right = spark.createDataFrame(
        [(b, "HOT") for b in range(1000, 1060)]
        + [(2000 + b, f"c{b % 5}") for b in range(25)],
        "doc_b bigint, g string",
    )
    plain = {tuple(r) for r in left.join(right, "g").collect()}
    # 40*60 = 2400 > 100 forces a grid on HOT; cold keys stay plain
    salted = {
        tuple(r)
        for r in D.salted_hot_feature_join(
            left, right, key="g", l_salt="doc_a", r_salt="doc_b", threshold=100
        ).collect()
    }
    assert salted == plain and plain

    # census finds nothing hot -> the plain join comes back row-identical
    quiet = {
        tuple(r)
        for r in D.salted_hot_feature_join(
            left, right, key="g", l_salt="doc_a", r_salt="doc_b", threshold=10**9
        ).collect()
    }
    assert quiet == plain


def test_degenerate_block_filter_and_census(spark):
    """VERDICT r13 #3: the degenerate-block remedy. On a banding frame
    with a planted over-cap block, (a) degenerate_block_filter drops
    exactly that block's rows and reports it with its member count,
    (b) the kept pair set equals the plain join MINUS the planted
    block's C(k,2) closed-form mass, and (c) the census report frame
    flags the block as degenerate with the exact pair estimate. The cap
    is driven low via the explicit argument — the production constant
    (128k members) is pinned separately against the grid ceiling it
    mirrors."""
    from parquet_modular_encryption_spark.pipeline import dedup as D

    assert D.DEGENERATE_BLOCK_CAP == 500 * D.PAIR_GRID_MAX

    k = 200  # planted degenerate block (with cap=100)
    mega = [(i, 0, "MEGA") for i in range(k)]
    normal = [(10_000 + i, 0, f"n{i // 4}") for i in range(80)]
    bands = spark.createDataFrame(
        mega + normal, "doc_id bigint, band_id int, band_key string"
    )
    kept, dropped = D.degenerate_block_filter(bands, cap=100)
    drows = dropped.collect()
    assert [(r.band_id, r.band_key, r.n_members) for r in drows] == [(0, "MEGA", k)]
    assert kept.count() == 80 and kept.filter("band_key = 'MEGA'").count() == 0

    plain = {(r.doc_a, r.doc_b) for r in D.banded_pairs(bands).distinct().collect()}
    capped = {
        (r.doc_a, r.doc_b)
        for r in D.banded_pairs_salted(kept).distinct().collect()
    }
    assert capped < plain
    assert len(plain) - len(capped) == k * (k - 1) // 2  # closed-form mass
    assert {p for p in plain if p[0] >= 10_000} == capped


def test_grouped_auto_sizing_rule(spark, monkeypatch):
    """VERDICT r11 #3 (sizing from measurement, not a guessed default),
    updated DELIBERATELY for the r16 bound prescreen (VERDICT r15 #1):
    the sizing ladder is now three-rung. (1) When even the gram-census
    UPPER BOUND on the verify incidence fits the scratch budget, the
    operator takes the bound_prescreen path: 1 chunk, the monolithic
    lazy plan, and NO scratch materializations at all (the ~40-job chain
    existed only so n_chunks > 1 could re-read). (2) A budget just under
    the bound forces the exact census: candidates are materialized, the
    measured incidence (<= the bound by construction) sizes the chunks.
    (3) A budget at ~1/3 of the exact estimate picks ceil(est/budget)
    chunks. The answer frame is identical on every rung
    (residue-partition lemma / the bound path IS the monolith)."""
    import math
    import os

    import parquet_modular_encryption_spark.scratch as scratch_mod
    from parquet_modular_encryption_spark.pipeline import dedup as D
    from parquet_modular_encryption_spark.sources.datasets import load

    monkeypatch.delenv("SPARK_GRAFT_GROUPED_CHUNKS", raising=False)

    made = []
    real = scratch_mod.scratch_dir

    def recording(prefix):
        d = real(prefix)
        made.append(d)
        return d

    monkeypatch.setattr(scratch_mod, "scratch_dir", recording)
    docs = load(spark, SF, "documents")
    spark.conf.set(D.GROUPED_SCRATCH_BUDGET_CONF, str(1 << 60))
    try:
        # rung 1: huge budget -> bound fits -> monolithic lazy plan
        n_huge = D.grouped_exact_join(spark, docs, "q49c").count()
        s1 = dict(D.LAST_GROUPED_SIZING)
        assert s1["op"] == "q49c" and s1["mode"] == "bound_prescreen", s1
        assert s1["n_chunks"] == 1 and s1["est_rows"] > 0, s1
        assert not os.path.exists(f"{made[-1]}/cand"), (
            "bound path must skip every scratch materialization"
        )

        # rung 2: budget one byte under the bound -> exact census runs;
        # the measured estimate must come in at or under the bound
        spark.conf.set(D.GROUPED_SCRATCH_BUDGET_CONF, str(s1["est_bytes"] - 1))
        n_exact = D.grouped_exact_join(spark, docs, "q49c").count()
        s2 = dict(D.LAST_GROUPED_SIZING)
        assert s2["mode"] == "exact_census" and s2["est_rows"] > 0, s2
        assert s2["est_bytes"] <= s1["est_bytes"], "bound must dominate exact"
        expect = min(
            D.GROUPED_MAX_CHUNKS,
            math.ceil(s2["est_bytes"] / (s1["est_bytes"] - 1)),
        )
        assert s2["n_chunks"] == expect, (s2, expect)
        assert os.path.exists(f"{made[-1]}/cand"), (
            "exact-census path must materialize candidates"
        )

        # rung 3: budget ~1/3 of the exact estimate -> >= 3 chunks
        budget = s2["est_bytes"] // 3 + 1
        spark.conf.set(D.GROUPED_SCRATCH_BUDGET_CONF, str(budget))
        n_tiny = D.grouped_exact_join(spark, docs, "q49c").count()
        s3 = dict(D.LAST_GROUPED_SIZING)
        assert s3["est_rows"] == s2["est_rows"], "estimate must be deterministic"
        expect = min(D.GROUPED_MAX_CHUNKS, math.ceil(s3["est_bytes"] / budget))
        assert s3["n_chunks"] == expect >= 3, (s3, expect)
        assert n_exact == n_huge and n_tiny == n_huge
    finally:
        spark.conf.unset(D.GROUPED_SCRATCH_BUDGET_CONF)


def test_grouped_scratch_encryption_boundary(spark, monkeypatch):
    """The grouped-execution scratch contract (VERDICT r11 #4): by
    DEFAULT the materialized postings are plaintext parquet — documented,
    and pinned here by reading them back with a vanilla reader — so a
    grouped run over an encrypted lake spills content DERIVATIVES
    (shingle postings reconstruct text n-grams) outside the PME
    envelope. ``encrypt_scratch=True`` closes the boundary: the
    content-bearing posting column is PME-encrypted on scratch disk
    (keyless read of tok fails closed; CONFIDENTIAL token succeeds) and
    the answer frame is identical to the plaintext-scratch run."""
    import pytest

    import parquet_modular_encryption_spark.scratch as scratch_mod
    from parquet_modular_encryption_spark.pipeline import dedup as D
    from parquet_modular_encryption_spark.sources.datasets import load
    from parquet_modular_encryption_spark.sources.encrypted import read_encrypted

    made = []
    real = scratch_mod.scratch_dir

    def recording(prefix):
        d = real(prefix)
        made.append(d)
        return d

    monkeypatch.setattr(scratch_mod, "scratch_dir", recording)
    monkeypatch.setenv("SPARK_GRAFT_GROUPED_CHUNKS", "3")

    def canon(df):
        return sorted(
            tuple(round(v, 12) if isinstance(v, float) else v for v in r)
            for r in df.collect()
        )

    docs = load(spark, SF, "documents")
    plain_rows = canon(D.grouped_exact_join(spark, docs, "q49c"))
    assert plain_rows, "fixture has no pairs — test is vacuous"
    work_plain = made[-1]
    toks = spark.read.parquet(f"{work_plain}/toks")  # plaintext by contract
    assert "tok" in toks.columns and toks.count() > 0

    enc_rows = canon(D.grouped_exact_join(spark, docs, "q49c", encrypt_scratch=True))
    assert enc_rows == plain_rows
    work_enc = made[-1]
    with pytest.raises(Exception, match="(?i)unwrap|denied|authoriz|403|key"):
        read_encrypted(
            spark, f"{work_enc}/toks", token=None, columns=["doc_id", "tok"]
        ).collect()
    ok = read_encrypted(spark, f"{work_enc}/toks", token="CONFIDENTIAL")
    assert ok.count() == toks.count()


def test_q55_budget_ladder_engine_oracle_agree():
    """q55e's per_doubling=1.6 knob is oracle-mirrored by floor-threshold
    CASE literals (similarity._sql_bands_cte_scaled). For integer n the
    SQL predicate `n <= floor(TARGET * 2**(x/pd))` must pick exactly the
    x the Spark side's float comparison `n > TARGET * 2**(x/pd)` walks
    to — sweep every regime boundary +-2 plus a dense range to pin the
    equivalence, for both the registered knobs."""
    import math

    from parquet_modular_encryption_spark.pipeline.similarity import (
        Q55_BAND_TARGET,
        Q55_BUDGET_PER_DOUBLING,
        Q55_MAX_EXTRA_BITS,
        q55_extra_band_bits,
    )

    for pd_knob in (1.0, Q55_BUDGET_PER_DOUBLING):
        thresholds = [
            int(math.floor(Q55_BAND_TARGET * 2.0 ** (x / pd_knob)))
            for x in range(Q55_MAX_EXTRA_BITS)
        ]

        def sql_case(n, th=thresholds):  # the CASE the oracle executes
            for x, t in enumerate(th):
                if n <= t:
                    return x
            return Q55_MAX_EXTRA_BITS

        probe = set(range(1, 5000))
        for t in thresholds:
            probe.update(range(max(1, t - 2), t + 3))
        probe.update(int(thresholds[-1] * f) for f in (1.5, 2.0, 10.0))
        for n in sorted(probe):
            assert q55_extra_band_bits(n, per_doubling=pd_knob) == sql_case(n), (
                pd_knob,
                n,
            )


def test_q55_wide_ladders_and_plane_namespace():
    """q55f's wide config (r13): (1) the integer widening ladder the
    oracle mirrors as `n <= TARGET << x` literals must agree with the
    Spark-side walk at every regime boundary and cover >= 10^6 vectors
    before the cap binds; (2) the band-count ladder must hold the
    1-(1-s^(6+x))^B >= 0.97 theory floor at planted cosine 0.95 for
    every rung and be monotone; (3) the wide plane-id namespace must be
    disjoint from EVERY plane the q51/q54/q55 family uses — the layout
    constraint that forced a new registered sibling instead of raising
    Q55_MAX_EXTRA_BITS in place."""
    import math

    from parquet_modular_encryption_spark.pipeline.similarity import (
        LSH_BANDS,
        N_PLANES,
        Q55_EXTRA_BAND_PLANE_BASE,
        Q55_MAX_BANDS,
        Q55_MAX_EXTRA_BITS,
        Q55W_BAND_TARGET,
        Q55W_BASE_BITS,
        Q55W_MAX_BANDS,
        Q55W_MAX_EXTRA_BITS,
        _q55_band_planes,
        _q55w_plane,
        q55w_band_count,
        q55w_extra_band_bits,
    )

    # (1) ladder agreement + scale coverage
    thresholds = [Q55W_BAND_TARGET << x for x in range(Q55W_MAX_EXTRA_BITS)]

    def sql_case(n):
        for x, t in enumerate(thresholds):
            if n <= t:
                return x
        return Q55W_MAX_EXTRA_BITS

    probe = set(range(1, 5000))
    for t in thresholds:
        probe.update(range(max(1, t - 2), t + 3))
    probe.update(int(thresholds[-1] * f) for f in (1.5, 2.0, 10.0))
    probe.update((10**6, 16_000_000, 17_000_000))
    for n in sorted(probe):
        assert q55w_extra_band_bits(n) == sql_case(n), n
    # the cap binds only past ~16.8M vectors — 16x beyond the 10^6 target
    assert (Q55W_BAND_TARGET << Q55W_MAX_EXTRA_BITS) > 10**7

    # (2) theory recall floor and monotone band count
    s = 1.0 - math.acos(0.95) / math.pi
    prev_b = 0
    for x in range(Q55W_MAX_EXTRA_BITS + 1):
        b = q55w_band_count(x)
        assert b >= prev_b, (x, b, prev_b)
        prev_b = b
        p = s ** (Q55W_BASE_BITS + x)
        assert 1.0 - (1.0 - p) ** b >= 0.97, (x, b)
    assert q55w_band_count(Q55W_MAX_EXTRA_BITS) == Q55W_MAX_BANDS

    # (3) plane-namespace disjointness vs every existing consumer
    legacy = set(range(N_PLANES))  # q51/q54 base planes
    legacy |= {
        N_PLANES + b * Q55_MAX_EXTRA_BITS + j
        for b in range(Q55_MAX_BANDS)
        for j in range(Q55_MAX_EXTRA_BITS)
    }
    legacy |= {
        p for b in range(24) for p in _q55_band_planes(b)
    }  # extra-band bases up to the n_bands<=24 assert
    assert max(legacy) < Q55_EXTRA_BAND_PLANE_BASE + 24 * 16
    wide = {
        _q55w_plane(b, i)
        for b in range(Q55W_MAX_BANDS)
        for i in range(Q55W_BASE_BITS)
    } | {
        _q55w_plane(b, j, widening=True)
        for b in range(Q55W_MAX_BANDS)
        for j in range(Q55W_MAX_EXTRA_BITS)
    }
    assert not (wide & legacy)
    assert len(wide) == Q55W_MAX_BANDS * (Q55W_BASE_BITS + Q55W_MAX_EXTRA_BITS)
    assert LSH_BANDS  # imported to keep the legacy set honest if bands move


def test_q55_wide_planted_recall_pin(spark):
    """Deterministic planted-recall pin for the wide config (the q47
    337/360 pattern): 40 partners planted at EXACTLY cosine 0.95 (seeded
    Gram-Schmidt) plus 10 exact duplicates onto the sf0.001 corpus must
    collide with their bases in >= 1 of q55w_corpus_bands' buckets at a
    rate matching the artifact-measured band-correlation gap (theory
    0.977 at x=0/B=5; Q55_RECALL_r13 measures 0.91-0.955 at real
    scales), and exact duplicates must NEVER be lost (they agree on
    every sign plane by construction)."""
    import numpy as np
    import pyarrow.parquet as pq

    from parquet_modular_encryption_spark.pipeline.similarity import (
        q55w_band_count,
        q55w_corpus_bands,
        q55w_extra_band_bits,
    )

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"))
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    rng = np.random.default_rng(5513)
    rows = [
        (int(i), [float(x) for x in v]) for i, v in zip(ids, mat)
    ]
    planted, next_id = [], int(ids.max()) + 1
    for j in range(40):  # cosine-0.95 partners on every 12th base vector
        base = (j * 12) % len(mat)
        u = mat[base]
        u_hat = u / max(np.linalg.norm(u), 1e-30)
        w = rng.standard_normal(mat.shape[1])
        w -= (w @ u_hat) * u_hat
        w_hat = w / max(np.linalg.norm(w), 1e-30)
        v = np.linalg.norm(u) * (0.95 * u_hat + np.sqrt(1 - 0.95**2) * w_hat)
        rows.append((next_id, [float(x) for x in v]))
        planted.append((int(ids[base]), next_id))
        next_id += 1
    exact_dups = []
    for j in range(10):  # exact duplicates: must never be lost
        base = (j * 37) % len(mat)
        rows.append((next_id, [float(x) for x in mat[base]]))
        exact_dups.append((int(ids[base]), next_id))
        next_id += 1

    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    x = q55w_extra_band_bits(len(rows))
    assert x == 0 and q55w_band_count(0) == 5  # tiny corpus: base rung
    _, bands = q55w_corpus_bands(emb)
    keys: dict[int, dict[int, int]] = {}
    involved = {v for p in planted + exact_dups for v in p}
    for r in bands.filter(F.col("vec_id").isin(list(involved))).collect():
        keys.setdefault(r.vec_id, {})[r.band_id] = r.band_key

    def hit(a: int, b: int) -> bool:
        return any(keys[a][band] == keys[b].get(band) for band in keys[a])

    assert all(hit(a, b) for a, b in exact_dups), "widening lost an exact dup"
    hits = sum(1 for a, b in planted if hit(a, b))
    # deterministic (seeded planting, LCG planes): pin the exact count,
    # and keep the production floor explicit alongside it
    assert hits / len(planted) >= 0.85, f"planted recall {hits}/40"
    assert hits == PLANTED_Q55W_HITS, f"determinism drift: {hits}"


#: Exact planted-pair hit count of test_q55_wide_planted_recall_pin —
#: measured once (35/40 = 0.875 on the 550-vector fixture, consistent
#: with the 0.91-0.955 Q55_RECALL_r13 curve and the known ~0.02-0.07
#: band-correlation gap under theory 0.977), pinned so any change to
#: the wide banding (planes, ladder, band count) surfaces as a visible
#: diff here — the q47 337/360 convention.
PLANTED_Q55W_HITS = 35


def test_jpeg_restart_intervals_roundtrip_and_refuse():
    """DRI support (r13, VERDICT r12 optional #7): restart markers are
    PHYSICAL stream structure — byte realignment + DC predictor reset —
    so decoding a DRI stream must yield pixels IDENTICAL to the same
    blocks encoded without restarts, for gray and color at several
    interval lengths (including intervals that wrap the modulo-8 marker
    index). The refusal boundary narrows but stays strict: a reordered
    RSTm index and a truncation at a restart boundary both raise, and
    restart_interval=0 emits the historic byte-identical stream."""
    import numpy as np

    from parquet_modular_encryption_spark.pipeline.jpegcodec import (
        decode_jpeg_color,
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_ycbcr,
    )

    rng = np.random.RandomState(99)
    n_by, n_bx = 3, 4  # 12 MCUs: interval 1 wraps the RST0-7 cycle
    blocks = rng.randint(-180, 180, size=(n_by, n_bx, 8, 8))
    blocks[0, 1, :, :] = 0  # an early-EOB block right before a boundary
    w, h = n_bx * 8, n_by * 8
    plain = encode_jpeg_gray(w, h, blocks)
    assert plain == encode_jpeg_gray(w, h, blocks, restart_interval=0)
    _, _, px_plain = decode_jpeg_gray(plain)
    for ri in (1, 3, 5):
        data = encode_jpeg_gray(w, h, blocks, restart_interval=ri)
        assert data != plain and b"\xff\xdd" in data
        rw, rh, px = decode_jpeg_gray(data)
        assert (rw, rh) == (w, h)
        assert np.array_equal(px, px_plain), f"ri={ri} pixels drifted"

    # color: 4:2:0 (2x2 Y + chroma per MCU) and 4:4:4
    for sampling, ydim in (("420", (4, 4)), ("444", (2, 2))):
        cdim = (2, 2)
        by = rng.randint(-120, 120, size=ydim + (8, 8))
        bcb = rng.randint(-120, 120, size=cdim + (8, 8))
        bcr = rng.randint(-120, 120, size=cdim + (8, 8))
        cw, ch = (32, 32) if sampling == "420" else (16, 16)
        ref = encode_jpeg_ycbcr(cw, ch, by, bcb, bcr, sampling)
        _, _, rgb_plain = decode_jpeg_color(ref)
        data = encode_jpeg_ycbcr(cw, ch, by, bcb, bcr, sampling, restart_interval=1)
        _, _, rgb = decode_jpeg_color(data)
        assert np.array_equal(rgb, rgb_plain), sampling

    # refusals: a swapped RSTm index must not decode
    data = bytearray(encode_jpeg_gray(w, h, blocks, restart_interval=1))
    first_rst = data.find(b"\xff\xd0")
    assert first_rst > 0
    data[first_rst + 1] = 0xD3  # wrong modulo-8 index
    try:
        decode_jpeg_gray(bytes(data))
        raise AssertionError("reordered RST marker decoded silently")
    except ValueError as exc:
        assert "RST" in str(exc)
    # truncation exactly at a restart boundary
    try:
        decode_jpeg_gray(bytes(encode_jpeg_gray(w, h, blocks, restart_interval=1))[: first_rst + 1])
        raise AssertionError("truncated restart stream decoded silently")
    except ValueError:
        pass


def test_jpeg_codec_roundtrips_random_coefficients():
    """The baseline-JPEG decoder is general over its stated profile, not
    just the fixture's DC-only subspace: random dense coefficient blocks
    (runs, ZRL, EOB, negative values, the full zigzag) encode and decode
    to the same pixels an INDEPENDENT textbook O(N^4) IDCT produces from
    the raw coefficients — so the entropy coding, zigzag order, EXTEND,
    DC-difference chain, and fast matrix IDCT are each load-bearing."""
    import numpy as np

    from parquet_modular_encryption_spark.pipeline.jpegcodec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    def idct_ref(B):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = np.sqrt(0.5) if u == 0 else 1.0
                        cv = np.sqrt(0.5) if v == 0 else 1.0
                        s += (cu * cv / 4.0 * B[u, v]
                              * np.cos((2 * x + 1) * u * np.pi / 16)
                              * np.cos((2 * y + 1) * v * np.pi / 16))
                out[x, y] = s
        return out

    rng = np.random.RandomState(1234)
    for trial in range(3):
        n_by, n_bx = 2, 3
        blocks = rng.randint(-200, 200, size=(n_by, n_bx, 8, 8))
        # sparsify some blocks to exercise long runs / ZRL / early EOB
        blocks[0, 0, :, :] = 0
        blocks[0, 0, 0, 0] = rng.randint(-900, 900)
        blocks[1, 2] *= rng.random(size=(8, 8)) < 0.1
        w, h = n_bx * 8, n_by * 8
        data = encode_jpeg_gray(w, h, blocks)
        rw, rh, px = decode_jpeg_gray(data)
        assert (rw, rh) == (w, h)
        ref = np.zeros((h, w))
        for by in range(n_by):
            for bx in range(n_bx):
                ref[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = idct_ref(
                    blocks[by, bx]
                )
        ref = np.clip(np.round(ref) + 128, 0, 255).astype(np.uint8)
        assert np.array_equal(px, ref), f"trial {trial} mismatch"


def test_color_jpeg_codec_roundtrips_random_coefficients():
    """The COLOR decoder is general over its stated profile (both
    sampling layouts, per-component tables, interleaved MCU raster, the
    fixed-point conversion), not just the fixture's flat-block subspace:
    random dense coefficient blocks for all three components encode and
    decode to exactly the pixels an independent textbook O(N^4) IDCT +
    nearest-neighbor upsample + the module's integer YCbCr->RGB contract
    produce from the raw coefficients."""
    import numpy as np

    from parquet_modular_encryption_spark.pipeline.jpegcodec import (
        decode_jpeg_color,
        encode_jpeg_ycbcr,
        ycbcr_to_rgb,
    )

    def idct_ref(B):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = np.sqrt(0.5) if u == 0 else 1.0
                        cv = np.sqrt(0.5) if v == 0 else 1.0
                        s += (cu * cv / 4.0 * B[u, v]
                              * np.cos((2 * x + 1) * u * np.pi / 16)
                              * np.cos((2 * y + 1) * v * np.pi / 16))
                out[x, y] = s
        return out

    def plane(blocks):
        nby, nbx = blocks.shape[:2]
        ref = np.zeros((nby * 8, nbx * 8))
        for by in range(nby):
            for bx in range(nbx):
                ref[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = idct_ref(
                    blocks[by, bx]
                )
        return np.clip(np.round(ref) + 128, 0, 255).astype(np.uint8)

    rng = np.random.RandomState(91)
    for sampling in ("420", "444"):
        if sampling == "420":
            n_mcuy, n_mcux = 1, 2
            w, h = 16 * n_mcux, 16 * n_mcuy
            y_shape, c_shape = (2 * n_mcuy, 2 * n_mcux), (n_mcuy, n_mcux)
        else:
            w, h = 24, 16
            y_shape = c_shape = (2, 3)
        by = rng.randint(-120, 120, size=y_shape + (8, 8))
        bcb = rng.randint(-120, 120, size=c_shape + (8, 8))
        bcr = rng.randint(-120, 120, size=c_shape + (8, 8))
        bcb[0, 0] *= rng.random(size=(8, 8)) < 0.1  # long runs / early EOB
        data = encode_jpeg_ycbcr(w, h, by, bcb, bcr, sampling)
        rw, rh, rgb = decode_jpeg_color(data)
        assert (rw, rh) == (w, h)
        yp = plane(by)[:h, :w]
        up = (lambda p: np.repeat(np.repeat(p, 2, 0), 2, 1)) if sampling == "420"             else (lambda p: p)
        cbp = up(plane(bcb))[:h, :w]
        crp = up(plane(bcr))[:h, :w]
        exp = ycbcr_to_rgb(yp, cbp, crp)
        assert np.array_equal(rgb, exp), sampling
    # cross-refusals between the two decoders
    import pytest

    from parquet_modular_encryption_spark.pipeline.jpegcodec import (
        decode_jpeg_gray,
        encode_jpeg_gray_flat,
    )

    gray_blob = encode_jpeg_gray_flat(16, 16, np.full((2, 2), 77))
    with pytest.raises(ValueError, match="3-component"):
        decode_jpeg_color(gray_blob)
    with pytest.raises(ValueError, match="single-component"):
        decode_jpeg_gray(data)


def test_jpeg_codec_refusal_contract():
    """Everything outside the stated profile raises rather than guessing:
    progressive SOF2, color (3-component), 16-bit quant tables, truncated
    entropy data, and a non-JPEG prefix. DRI left the refusal set in r13
    — a DRI segment now decodes (and with an interval longer than the
    MCU count must decode IDENTICALLY to the plain stream)."""
    import struct

    import numpy as np
    import pytest

    from parquet_modular_encryption_spark.pipeline.jpegcodec import (
        decode_jpeg_gray,
        encode_jpeg_gray_flat,
    )

    base = bytearray(encode_jpeg_gray_flat(16, 8, np.full((1, 2), 99)))

    def mutated(find: bytes, repl: bytes) -> bytes:
        i = bytes(base).find(find)
        assert i >= 0
        out = bytearray(base)
        out[i:i + len(find)] = repl
        return bytes(out)

    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg_gray(mutated(b"\xff\xc0", b"\xff\xc2"))
    with pytest.raises(ValueError, match="single-component"):
        # SOF0 ncomp byte: marker(2) len(2) precision(1) h(2) w(2) -> +9
        i = bytes(base).find(b"\xff\xc0")
        out = bytearray(base)
        out[i + 9] = 3
        with_color = bytes(out)
        decode_jpeg_gray(with_color)
    # DRI inserted before SOS: supported since r13 — with Ri=8 > the
    # image's 2 MCUs no restart ever fires, so pixels must be identical
    i = bytes(base).find(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
    _, _, px_plain = decode_jpeg_gray(bytes(base))
    _, _, px_dri = decode_jpeg_gray(bytes(base[:i]) + dri + bytes(base[i:]))
    assert np.array_equal(px_dri, px_plain)
    # 16-bit DQT precision nibble
    i = bytes(base).find(b"\xff\xdb")
    out = bytearray(base)
    out[i + 4] = 0x10
    with pytest.raises(ValueError, match="16-bit"):
        decode_jpeg_gray(bytes(out))
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_gray(bytes(base[:-12]))  # drop EOI + scan tail
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x89PNG" + bytes(base))


def test_avi_mjpeg_roundtrip_and_refusals():
    """q91h's container path: planted flat-block frames round-trip
    BIT-EXACT through encode_jpeg_gray_flat + encode_avi_mjpeg +
    decode_avi_mjpeg for every (nbx, nby, nf) the fixture uses; the MJPEG
    decoder refuses BI_RGB containers (and the BI_RGB decoder refuses
    MJPG ones), so neither path can silently mis-handle the other's
    format; header-only parsers (q91c interop) still read the geometry."""
    import numpy as np
    import pytest

    from parquet_modular_encryption_spark.pipeline.jpegcodec import (
        encode_jpeg_gray_flat,
    )
    from parquet_modular_encryption_spark.pipeline.multimodal import (
        _avi_frame_pixels,
        _avi_params,
        _mjpeg_block_values,
        _mjpeg_params,
        decode_avi_bi_rgb,
        decode_avi_mjpeg,
        encode_avi_bi_rgb,
        encode_avi_mjpeg,
        sniff_video,
    )

    for mid in (0, 43, 86, 129, 172, 215):  # covers nbx 2..4 x nby 1..2
        nbx, nby, nf = _mjpeg_params(mid)
        w, h = nbx * 8, nby * 8
        vals = [_mjpeg_block_values(mid, f, nbx, nby) for f in range(nf)]
        blob = encode_avi_mjpeg(
            w, h, [encode_jpeg_gray_flat(w, h, v) for v in vals]
        )
        rw, rh, frames = decode_avi_mjpeg(blob)
        assert (rw, rh, len(frames)) == (w, h, nf)
        for f, v in enumerate(vals):
            exp = np.repeat(np.repeat(v, 8, 0), 8, 1).astype(np.uint8)
            assert np.array_equal(frames[f], exp), f"media {mid} frame {f}"
        fmt, sw, sh, sn = sniff_video(blob)
        assert (fmt, sw, sh, sn) == ("avi", w, h, nf)

    # cross-refusals: each decoder rejects the other's biCompression
    w, h, nf = _avi_params(41)
    rgb_blob = encode_avi_bi_rgb(
        w, h, [_avi_frame_pixels(41, 0, w, h)]
    )
    with pytest.raises(ValueError, match="MJPG"):
        decode_avi_mjpeg(rgb_blob)
    nbx, nby, _ = _mjpeg_params(43)
    mjpg_blob = encode_avi_mjpeg(
        nbx * 8, nby * 8,
        [encode_jpeg_gray_flat(nbx * 8, nby * 8,
                               _mjpeg_block_values(43, 0, nbx, nby))],
    )
    with pytest.raises(ValueError, match="BI_RGB"):
        decode_avi_bi_rgb(mjpg_blob)


def test_avi_rle8_roundtrip_opcodes_and_refusals():
    """q91i's codec: planted index grids (run-stripe + literal-stripe rows)
    round-trip through encode_avi_rle8 + decode_avi_rle8 to the exact
    palette-folded grays for every (w, h, nf) the fixture uses; the full
    opcode set (delta with zero-fill, absolute-mode pad byte, EOL, EOB,
    truncation/overflow guards) is pinned directly on rle8_decode_frame;
    and the three AVI decoders refuse each other's biCompression, so none
    can silently mis-handle another's format."""
    import numpy as np
    import pytest

    from parquet_modular_encryption_spark.pipeline.multimodal import (
        _avi_frame_pixels,
        _avi_params,
        _rle8_frame_pixels,
        _rle8_gray_lut,
        _rle8_palette,
        _rle8_params,
        decode_avi_bi_rgb,
        decode_avi_mjpeg,
        decode_avi_rle8,
        encode_avi_bi_rgb,
        encode_avi_rle8,
        rle8_decode_frame,
        rle8_encode_row,
        sniff_video,
    )

    lut = _rle8_gray_lut(_rle8_palette())
    assert not np.array_equal(lut, np.arange(256, dtype=np.uint8)), (
        "fixture palette must be non-identity or the lookup is unobservable"
    )
    for mid in (0, 47, 94, 141, 188, 235):  # covers w 13..37 x h 6..15
        w, h, nf = _rle8_params(mid)
        frames = [_rle8_frame_pixels(mid, f, w, h) for f in range(nf)]
        blob = encode_avi_rle8(w, h, frames)
        rw, rh, back = decode_avi_rle8(blob)
        assert (rw, rh, len(back)) == (w, h, nf)
        for f, src in enumerate(frames):
            exp = lut[np.frombuffer(src, dtype=np.uint8).reshape(h, w)]
            assert np.array_equal(back[f], exp), f"media {mid} frame {f}"
        fmt, sw, sh, sn = sniff_video(blob)
        assert (fmt, sw, sh, sn) == ("avi", w, h, nf)

    # opcode semantics on a hand-built stream: run, EOL, delta (skipped
    # pixels are background index 0), run, EOB — bottom-up, so decoded
    # row 0 of the stream lands on the LAST top-down row
    data = bytes([2, 5, 0, 2, 3, 1, 2, 7, 0, 1])
    g = rle8_decode_frame(data, 8, 3)
    exp = np.zeros((3, 8), np.uint8)
    exp[2, 0:2] = 5
    exp[1, 5:7] = 7  # delta moved (x 2->5, y 0->1)
    assert np.array_equal(g, exp)
    # absolute mode word-aligns odd literal counts
    enc = rle8_encode_row(bytes([1, 2, 3, 4, 5]))
    assert enc[:2] == bytes([0, 5]) and len(enc) % 2 == 0
    # guards: overflow and missing EOB raise, never guess
    with pytest.raises(ValueError, match="overflows"):
        rle8_decode_frame(bytes([9, 1, 0, 1]), 8, 3)
    with pytest.raises(ValueError, match="EOB"):
        rle8_decode_frame(bytes([2, 5, 0, 0]), 8, 3)

    # cross-refusals: RLE8 rejects BI_RGB; BI_RGB and MJPEG reject RLE8
    w, h, _nf = _avi_params(41)
    rgb_blob = encode_avi_bi_rgb(w, h, [_avi_frame_pixels(41, 0, w, h)])
    with pytest.raises(ValueError, match="BI_RLE8"):
        decode_avi_rle8(rgb_blob)
    w, h, _nf = _rle8_params(47)
    rle8_blob = encode_avi_rle8(w, h, [_rle8_frame_pixels(47, 0, w, h)])
    with pytest.raises(ValueError, match="BI_RGB"):
        decode_avi_bi_rgb(rle8_blob)
    with pytest.raises(ValueError, match="MJPG"):
        decode_avi_mjpeg(rle8_blob)


def test_minhash_high_recall_ladder_on_planted_groups(spark, tmp_path):
    """q47's DEFAULT measured planted recall sits STRICTLY above the
    q47d budget point's on the same corpus, at the s-curve-predicted
    levels — the round-12 role swap (VERDICT r11 #1: the registered
    default must be the measured-recall operating point). The corpus is
    fully deterministic: 60 groups x 4 docs of 40 tokens sharing a group
    prefix of m in {26,28,30,32} tokens with per-doc disjoint tails and
    per-group disjoint vocabularies, so the TRUE qualifying set is
    exactly the 360 within-group pairs (shingle Jaccard
    (m-2)/(76-(m-2)) = 0.46..0.65, all >= the 0.4 threshold; cross-group
    Jaccard identically 0) and each operator's recall is its row count
    / 360 — the verify stage already guarantees precision 1.0. Expected
    per-pair candidate recall at these strata: 1-(1-J^2)^4 averages
    ~0.76 for q47d's 4 bands, ~0.93 for the default's 8; measured (fixed
    hashes, fully deterministic): 276/360 and 337/360."""
    from parquet_modular_encryption_spark.pipeline.dedup import (
        q47_minhash_neardup,
        q47d_minhash_budget,
    )

    rows = []
    n_tokens, prefix_lens = 40, (26, 28, 30, 32)
    for g in range(60):
        m = prefix_lens[g % 4]
        prefix = [f"g{g}t{k}" for k in range(m)]
        for j in range(4):
            tail = [f"g{g}d{j}x{k}" for k in range(n_tokens - m)]
            rows.append((g * 4 + j, " ".join(prefix + tail)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    d = str(tmp_path / "corpus")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    default = q47_minhash_neardup(spark, d).count()
    budget = q47d_minhash_budget(spark, d).count()
    assert budget == 276 and default == 337, (budget, default)  # deterministic
    assert default / 360 >= 0.90, "the DEFAULT must hold >=0.90 here"
    assert 0.70 <= budget / 360 <= 0.85, "budget point moved — re-derive pins"
    assert default > budget


def test_minhash_encrypted_lake_access_matrix(spark, sf_dir):
    """q47e's negative side: the encrypted document lake denies text to
    keyless and under-privileged readers while doc_id (plaintext column)
    stays readable with no token at all; the CONFIDENTIAL token runs the
    identical q47 pipeline (positive side is the shared hash-checked
    oracle, re-pinned here as q47e == q47 row counts)."""
    import pytest

    from parquet_modular_encryption_spark.pipeline.dedup import (
        _encrypted_docs_dir,
        q47_minhash_neardup,
        q47e_minhash_encrypted,
    )
    from parquet_modular_encryption_spark.sources.encrypted import read_encrypted

    enc = _encrypted_docs_dir(spark, sf_dir)
    # keyless catalog op on the plaintext id column succeeds
    n_ids = read_encrypted(spark, enc, token=None, columns=["doc_id"]).count()
    assert n_ids > 0
    # keyless and INTERNAL (< CONFIDENTIAL) reads of text fail closed
    for tok in (None, "INTERNAL"):
        with pytest.raises(Exception, match="(?i)unwrap|denied|authoriz|403|key"):
            read_encrypted(spark, enc, token=tok, columns=["doc_id", "text"]).collect()
    # positive side: same pairs as the plaintext pipeline
    assert (
        q47e_minhash_encrypted(spark, sf_dir).count()
        == q47_minhash_neardup(spark, sf_dir).count()
    )


def test_plane_weight_literals_match(spark):
    """r15 (r16: the dead literal-array production form was dropped per
    ADVICE — _lcg_weight is the single driver-side twin): the Python
    _lcg_weight values arrow_projections bakes into its numpy pass must
    be BIT-identical to the per-row LCG Column form (_plane_weights) —
    the banding keys, and therefore every q55-family result, depend on
    exact double equality. Checked across a spread of plane ids
    including the widening and q55w namespaces."""
    import struct

    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.pipeline import similarity as S

    dim = 24
    df = spark.range(1).select(
        F.sequence(F.lit(0), F.lit(dim - 1)).alias("dims")
    )
    for plane in (0, 7, 16, 199, 200, 423, 5000, 5123):
        via_transform = df.select(
            F.transform(
                F.col("dims"), lambda d: S._plane_weights(plane, d)
            ).alias("w")
        ).first()["w"]
        via_driver = [S._lcg_weight(plane, d) for d in range(dim)]
        assert [struct.pack("<d", x) for x in via_transform] == [
            struct.pack("<d", x) for x in via_driver
        ], f"plane {plane} weights diverge"


def test_q55_band_keys_unchanged_by_literal_weights(spark):
    """The banding frame produced with literal weights must equal the
    r14 transform-form frame row-for-row (same vec_id/band_id/band_key
    triples) — band keys are the q55 family's entire physical identity."""
    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.pipeline import similarity as S
    from parquet_modular_encryption_spark.sources.datasets import load

    emb = load(spark, SF, "embeddings")
    _, bands_lit = S.q55_corpus_bands(emb)
    got = {(r.vec_id, r.band_id, r.band_key) for r in bands_lit.collect()}

    # reference frame: the r14 per-row transform path, rebuilt verbatim
    e = emb.select("vec_id", S.as_double(F.col("embedding")).alias("ee"))
    n = emb.count()
    x = S.q55_extra_band_bits(n)
    n_bands = S.q55_band_count(x)
    dims = F.sequence(F.lit(0), F.size(F.col("ee")) - 1)
    bands_spec = [S._q55_band_planes(b) for b in range(n_bands)]
    plane_ids = {p for band in bands_spec for p in band} | {
        S.N_PLANES + b * S.Q55_MAX_EXTRA_BITS + j
        for b in range(len(bands_spec))
        for j in range(x)
    }
    projs = {
        p: S.dot(
            F.col("ee"),
            F.transform(dims, (lambda pl: lambda d: S._plane_weights(pl, d))(p)),
        )
        for p in plane_ids
    }
    band_structs = []
    for b, band in enumerate(bands_spec):
        key = None
        for i, p in enumerate(band):
            bit = F.when(projs[p] > 0, F.lit(1 << i)).otherwise(F.lit(0))
            key = bit if key is None else key + bit
        for j in range(x):
            p = S.N_PLANES + b * S.Q55_MAX_EXTRA_BITS + j
            key = key + F.when(projs[p] > 0, F.lit(1 << (len(band) + j))).otherwise(
                F.lit(0)
            )
        band_structs.append(
            F.struct(F.lit(b).alias("band_id"), key.alias("band_key"))
        )
    want_df = e.select("vec_id", F.explode(F.array(*band_structs)).alias("bk")).select(
        "vec_id", F.col("bk.band_id"), F.col("bk.band_key")
    )
    want = {(r.vec_id, r.band_id, r.band_key) for r in want_df.collect()}
    assert got == want


def test_arrow_cell_scores_bit_identical(spark):
    """ADVICE r15 #1: the pin arrow_cell_scores' docstring promises, now
    real — the numpy Arrow path must emit BIT-identical doubles to the
    crossJoin + cosine() expression form it replaced (q52b, q54d/e/f/i/j,
    q55b and q76d all ride it). Compared via struct.pack bytes, never
    float ==. Also pins the ADVICE r15 #2 zero-norm contract: a planted
    zero-norm embedding and a zero-norm centroid must yield NULL — the
    try_divide semantics: under the session's ANSI default the plain
    Divide expression RAISES on x / 0.0, and raw numpy would emit
    NaN/Inf, which Spark sorts ABOVE every double and would therefore
    win max(struct(cos, ...)) best-cell picks. try_divide is
    bit-identical to Divide wherever den != 0, so ONE reference covers
    both the parity and the degenerate contract."""
    import struct

    from pyspark.sql import functions as F

    from parquet_modular_encryption_spark.pipeline import similarity as S
    from parquet_modular_encryption_spark.sources.datasets import load

    emb = load(spark, SF, "embeddings")
    e = emb.select("vec_id", S.as_double(F.col("embedding")).alias("ee"))
    dim = len(e.first()["ee"])
    # plant one zero-norm embedding row and one zero-norm centroid
    zero = spark.createDataFrame(
        [(10_000_000, [0.0] * dim)], "vec_id bigint, ee array<double>"
    )
    e = e.unionByName(zero)
    codebook = S._ivf_codebook(emb)
    zero_cell = spark.createDataFrame(
        [(99_999, [0.0] * dim)],
        f"cell {codebook.schema['cell'].dataType.simpleString()}, ce array<double>",
    )
    codebook = codebook.unionByName(zero_cell)

    def packed(df):
        return {
            (r["vec_id"], r["cell"]): (
                None if r["cos"] is None else struct.pack("<d", r["cos"])
            )
            for r in df.collect()
        }

    got = packed(S.arrow_cell_scores(e, codebook))
    ref_cos = F.try_divide(
        S.dot(F.col("ee"), F.col("ce")),
        F.sqrt(S.dot(F.col("ee"), F.col("ee")))
        * F.sqrt(S.dot(F.col("ce"), F.col("ce"))),
    )
    want = packed(
        e.crossJoin(F.broadcast(codebook)).select(
            "vec_id", "cell", ref_cos.alias("cos")
        )
    )
    assert set(got) == set(want) and len(got) > 0
    diverging = [k for k in want if got[k] != want[k]]
    assert not diverging, diverging[:5]
    # the planted degenerates really exercised the NULL contract
    assert all(v is None for k, v in want.items() if k[0] == 10_000_000)
    assert all(v is None for k, v in want.items() if k[1] == 99_999)


def test_arrow_cell_scores_bounded_batches():
    """VERDICT r15 #3: at K = isqrt(corpus) the r15 form yielded ONE
    (n x K)-row RecordBatch per input batch — a memory blow-up at the
    q54j design point. The generator must now (a) cap every yielded
    batch at max(n, ARROW_SCORES_MAX_OUT_ROWS) rows over a planted
    K >= 4096 codebook, (b) cover all n*K scores exactly once in the
    r15 cell-major order, and (c) match a direct sequential-accumulation
    recompute bit-for-bit. Drives the module-level generator directly —
    no Spark session needed."""
    import struct

    import pyarrow as pa

    from parquet_modular_encryption_spark.pipeline import similarity as S

    K, dim, n = 4096, 8, 1000
    cells = list(range(K))
    ces = [
        [float((k * 31 + j * 7) % 13) - 6.0 for j in range(dim)] for k in range(K)
    ]
    ces[5] = [0.0] * dim  # planted zero-norm centroid -> NULL column
    rows = [
        [float((i * 17 + j * 3) % 11) - 5.0 for j in range(dim)] for i in range(n)
    ]
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(list(range(n)), type=pa.int64()),
            pa.array(rows, type=pa.list_(pa.float64())),
        ],
        names=["vec_id", "ee"],
    )
    out = list(S._cell_score_batches(cells, ces, pa.int64(), iter([batch])))
    cap = max(n, S.ARROW_SCORES_MAX_OUT_ROWS)
    assert len(out) > 1, "large-K output must be split across batches"
    assert all(b.num_rows <= cap for b in out), [b.num_rows for b in out]
    assert sum(b.num_rows for b in out) == n * K

    # flatten and verify coverage, order, values
    got = {}
    seq = []
    for b in out:
        vid = b.column("vec_id").to_pylist()
        cell = b.column("cell").to_pylist()
        cos = b.column("cos").to_pylist()
        for v, c, s in zip(vid, cell, cos):
            got[(v, c)] = s
            seq.append((v, c))
    assert len(got) == n * K, "every (row, cell) scored exactly once"
    # cell-major order within the input batch (the r15 contract)
    assert seq == [(v, c) for c in range(K) for v in range(n)]

    def seq_cos(x, y):
        d = x[0] * y[0]
        for j in range(1, dim):
            d = d + x[j] * y[j]
        nx = x[0] * x[0]
        ny = y[0] * y[0]
        for j in range(1, dim):
            nx = nx + x[j] * x[j]
            ny = ny + y[j] * y[j]
        den = (nx**0.5) * (ny**0.5)
        return None if den == 0.0 else d / den

    for v, c in [(0, 0), (7, 5), (999, 4095), (13, 64), (500, 2048)]:
        want = seq_cos(rows[v], ces[c])
        have = got[(v, c)]
        if want is None:
            assert have is None, (v, c, have)
        else:
            assert struct.pack("<d", have) == struct.pack("<d", want), (v, c)
    assert all(got[(v, 5)] is None for v in range(n)), "zero centroid -> NULL"
