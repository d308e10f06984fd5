#!/usr/bin/env python
"""Generate an sfN-equivalent dataset by tiling the driver's sf0.1 tables.

Usage: python scripts/gen_scaled_testdata.py [MULT] [DST_DIR]
       (defaults: MULT=10, DST=build/testdata/sf1)

The driver's generator is not available, so the 10x dataset is built by
UNION-ing MULT key-offset copies of sf0.1 — every copy keeps the source's
value distributions, FK relationships (all key domains are dense 0..max,
so offsetting each domain by i*(max+1) preserves joins copy-locally), and
within-copy duplicate/near-duplicate structure, which is what the scale
experiment measures. Two deliberate de-correlations stop the tiling
itself from manufacturing cross-copy structure that would corrupt the
measurement:

- documents.text: copy i>0 applies an INJECTIVE, LENGTH-PRESERVING
  per-copy token rename (each vocabulary word maps to a same-length
  pseudo-word derived from md5(copy, token)). Within a copy this is an
  isomorphism of both the token algebra AND the character geometry:
  word-shingle sets, document frequencies, near-duplicate pairs, AND
  stride-1 char-gram structure are EXACTLY copy 0's under relabeling —
  so per-copy structure replicates and corpus totals scale by MULT,
  which is what the experiment must measure. Across copies the
  vocabularies are disjoint, so the tiling cannot manufacture cross-copy
  pairs (without this, every document would have MULT-1 exact twins and
  pair counts would grow ~MULT^2 by construction). Two earlier cuts are
  cautionary tales: a per-DOCUMENT token permutation destroyed
  within-copy structure (two near-dups permute differently, leaving only
  copy 0's pairs), and a uniform per-copy token SUFFIX preserved word
  structure but inflated char-20-gram collisions ~4x (every token ending
  in the same 3 chars makes unrelated text self-similar at the char
  level) — the length-preserving rename fixes both.
- embeddings.embedding: copy i rolls the vector by i positions. Rolling
  is an inner-product-preserving permutation WITHIN a copy (the kNN/ANN
  topology of each copy replicates sf0.1's exactly) while cross-copy
  dot products decorrelate.

region/nation stay fixed (as in real TPC-H at every SF). events offsets
user_id, so per-user streams replicate rather than deepen — windows and
sessionization scale by user count, the realistic axis.

Output layout: at MULT=1, one <table>.parquet FILE per table (matching
/root/testdata); at MULT>1, <table>.parquet is a DIRECTORY of one part
file per copy — row-group-aligned scan parallelism (see the layout note
in main()).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")

#: key columns to offset per copy: table -> {column: domain_size}
#: (domain sizes read from the source at runtime; entries here name the
#: DOMAIN each column belongs to so FK references shift consistently)
KEY_DOMAINS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}

#: where each domain's size is measured: domain -> (table, column)
DOMAIN_SOURCE = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}


def _copy_token_map(vocab: set[str], copy_idx: int) -> dict[str, str]:
    """Injective, length-preserving pseudo-word map for one copy: letters
    from md5(copy, token, probe), same length as the original, linear
    probing on hash-input collisions (the corpus vocabulary is far
    smaller than 26^len for every length in play)."""
    import hashlib

    used: set[str] = set()
    out: dict[str, str] = {}
    for tok in sorted(vocab):
        probe = 0
        while True:
            h = hashlib.md5(f"{copy_idx}:{tok}:{probe}".encode()).digest()
            # repeat the digest if the token is longer than 16 bytes
            reps = (len(tok) // len(h)) + 1
            pseudo = "".join(chr(ord("a") + b % 26) for b in (h * reps)[: len(tok)])
            if pseudo not in used:
                break
            probe += 1
        used.add(pseudo)
        out[tok] = pseudo
    return out


def _rename_documents(tbl: pa.Table, copy_idx: int) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    vocab = {tok for text in texts for tok in text.split()}
    mapping = _copy_token_map(vocab, copy_idx)
    out_text = [" ".join(mapping[tok] for tok in text.split()) for text in texts]
    # lengths are preserved exactly, so n_chars needs no update — assert it
    assert all(len(t) == len(o) for t, o in zip(out_text, texts)), (
        "length-preserving rename changed a document length"
    )
    return tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa.array(out_text, pa.string())
    )


# --------------------------------------------------------------- zipf mode
#
# The tiled corpus above is structure-PRESERVING but near-uniform by
# construction: cross-copy vocabularies are disjoint, so no shingle is hot
# corpus-wide and the salted grids / DF caps / prefix filters are never
# stressed (VERDICT r9 "What's missing" #1). `--zipf` builds the OPPOSITE
# regime — the real-corpus shape: one GLOBAL vocabulary shared by every
# document at every scale, token draw ∝ rank^-s (s = 1.1), plus a fixed
# boilerplate chunk pasted into ~5% of documents. Under this draw the
# rank-1 token lands in ~99% of documents, common word-3-gram shingles
# have df ∝ corpus size, and the boilerplate shingles are shared by every
# hot document — exactly the hot-key load the skew defenses exist for.
#
# Deliberate calibration: the boilerplate chunk is ~15 tokens on ~54-token
# documents, so two boilerplate docs share ~13 of ~91 distinct shingles —
# Jaccard ~0.14, BELOW the q49c/q47 thresholds (7/20). The chunk therefore
# stresses the CANDIDATE path (its shingles' df grows linearly with the
# corpus; an unprotected posting join would produce k^2 hits on them)
# without inflating the TRUE answer set quadratically — defense stress,
# not answer blow-up. Document token COUNTS are taken from the source
# document so the length distribution (and q49c's length filter) stays
# realistic. Everything is seeded from md5 of (copy, row): regenerating
# any scale reproduces bit-identical text, and a document's text depends
# only on its global identity — scales differ by corpus SIZE, not by
# re-rolling the shared prefix.

ZIPF_S = 1.1
ZIPF_VOCAB = 20_000
ZIPF_BOILERPLATE_LEN = 15
ZIPF_HOT_PCT = 5


def _zipf_vocab(n: int = ZIPF_VOCAB) -> list[str]:
    """n distinct letters-only pseudo-words, 3-8 chars, md5-derived with
    linear probing on collisions (same device as _copy_token_map)."""
    import hashlib

    used: set[str] = set()
    out: list[str] = []
    for r in range(n):
        probe = 0
        while True:
            h = hashlib.md5(f"zipfv:{r}:{probe}".encode()).digest()
            word = "".join(chr(ord("a") + b % 26) for b in h[1 : 4 + h[0] % 6])
            if word not in used:
                break
            probe += 1
        used.add(word)
        out.append(word)
    return out


def _zipf_documents(tbl: pa.Table, copy_idx: int, vocab: list[str],
                    cum: "np.ndarray") -> pa.Table:
    """Replace every document's text with a Zipf draw over the shared
    vocabulary (token count preserved from the source doc), pasting the
    boilerplate chunk into ZIPF_HOT_PCT% of documents; n_chars updated."""
    import hashlib

    boiler = [vocab[(100 + i * 37) % 900 + 100] for i in range(ZIPF_BOILERPLATE_LEN)]
    texts = tbl.column("text").to_pylist()
    doc_ids = tbl.column("doc_id").to_pylist()
    out_text = []
    for j, (gid, text) in enumerate(zip(doc_ids, texts)):
        n_toks = len(text.split())
        seed = int.from_bytes(
            hashlib.md5(f"zipfd:{copy_idx}:{j}".encode()).digest()[:8], "big"
        )
        rng = np.random.default_rng(seed)
        toks = [vocab[i] for i in np.searchsorted(cum, rng.random(n_toks))]
        hot = int.from_bytes(hashlib.md5(f"zipfh:{gid}".encode()).digest()[:4],
                             "big") % 100 < ZIPF_HOT_PCT
        if hot and n_toks > ZIPF_BOILERPLATE_LEN:
            p = min(5, n_toks - ZIPF_BOILERPLATE_LEN)
            toks[p : p + ZIPF_BOILERPLATE_LEN] = boiler
        out_text.append(" ".join(toks))
    t = tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa.array(out_text, pa.string())
    )
    return t.set_column(
        t.schema.get_field_index("n_chars"),
        "n_chars",
        pa.array([len(x) for x in out_text], pa.int64()),
    )


# ---------------------------------------------------------- dup-heavy mode
#
# VERDICT r10 "What's missing" #2: the zipf corpus's boilerplate is
# deliberately calibrated BELOW the join thresholds (Jaccard ~0.14 <
# 7/20), so it stresses the CANDIDATE path while the true answer set
# stays tiny — the verify stage never runs under true-positive load and
# connected components never see big clusters. Real pretraining corpora
# are the opposite: template-heavy, with per-document duplicate counts
# roughly CONSTANT as the corpus grows (answers ~linear). `--dup-heavy`
# (composes with --zipf only) builds that regime on top of the Zipf
# background: DUP_PCT% of documents have their text replaced by an
# instance of a TEMPLATE — a fixed Zipf-drawn token sequence per
# template group — with 1..DUP_EDITS_MAX per-doc token substitutions and
# 0..DUP_TRUNC_MAX tokens truncated, so every within-group pair stays
# ABOVE all three join thresholds (worst case ~J 0.5 vs thresholds
# 7/20 Jaccard and 1/2 cosine; pinned by
# tests/test_scaled_gen.py::test_dup_heavy_groups_above_threshold).
#
# Scaling invariants:
# - template count ∝ corpus size (n_groups = dup docs / DUP_GROUP_MEAN),
#   so group sizes are scale-CONSTANT (Poisson around the mean) and the
#   true pair count grows ~linearly — per-doc dup count flat.
# - templates are pairwise-DISSIMILAR by construction: every 3rd token is
#   a group-salted tail draw, so no word 3-gram can be shared between two
#   groups and the PLANTED answer set is exactly the within-group pairs
#   at every scale — a structural guarantee, not a statistical one, and
#   the license for the harness's planted-vs-inherited decomposition
#   (pinned by tests/test_scaled_gen.py::
#   test_dup_heavy_templates_cross_group_dissimilar). NOTE the corpus
#   TOTALS still grow superlinearly: the zipf BACKGROUND's own qualifying
#   pairs ride its measured ~n^2 sharing structure (NOTES r10 §1); the
#   linear-growth claim is about the PLANTED component, which the
#   harness's q*_planted_pairs keys measure separately.
# - DUP_MEGA_PCT% of groups carry DUP_MEGA_WEIGHT x the assignment
#   weight: ~64-member clusters at every scale — large-cluster load for
#   connected components and a true-positive hot spot for verify —
#   while contributing only a bounded constant factor to the (still
#   linear) pair mass.
# - assignment and all edits are md5-seeded from the document's global
#   identity + the corpus-wide group count, so any scale regenerates
#   bit-identically.

DUP_PCT = 20
DUP_GROUP_MEAN = 8
DUP_MEGA_PCT = 1
DUP_MEGA_WEIGHT = 8
DUP_TEMPLATE_LEN = 48
DUP_EDITS_MAX = 2
DUP_TRUNC_MAX = 2


def _dup_heavy_documents(tbl: pa.Table, vocab: list[str], cum: "np.ndarray",
                         n_docs_total: int) -> pa.Table:
    """Replace DUP_PCT% of documents' text with a per-group template
    instance (template + small seeded edits). ``n_docs_total`` is the
    CORPUS-wide document count (all copies), so group count — and hence
    expected group size — is consistent across the copies this is
    called once per."""
    import hashlib

    def _frac(tag: str) -> float:
        return int.from_bytes(hashlib.md5(tag.encode()).digest()[:8], "big") / 2**64

    n_dup = n_docs_total * DUP_PCT / 100.0
    n_groups = max(1, round(n_dup / DUP_GROUP_MEAN))
    n_mega = max(1, n_groups * DUP_MEGA_PCT // 100)
    weights = np.full(n_groups, 1.0)
    weights[:n_mega] = DUP_MEGA_WEIGHT
    wcum = np.cumsum(weights / weights.sum())

    def _template(g: int) -> list[str]:
        rng = np.random.default_rng(
            int.from_bytes(hashlib.md5(f"dupt:{n_groups}:{g}".encode()).digest()[:8],
                           "big")
        )
        toks = [vocab[i] for i in np.searchsorted(cum, rng.random(DUP_TEMPLATE_LEN))]
        # Every 3rd position gets a group-salted TAIL token (uniform over
        # the bottom 3/4 of the vocabulary, where Zipf mass is tiny), so
        # every word-3-gram window of every template contains at least one
        # group-specific token: cross-group SHINGLE similarity is ~0 BY
        # CONSTRUCTION, not by statistical accident of the draw. Measured
        # consequence (round 11): the planted answer set is EXACTLY the
        # within-group pairs — which licenses the harness's planted-vs-
        # inherited answer decomposition (the dup-heavy corpus totals also
        # carry the zipf BACKGROUND's own near-dup pairs, whose ~n^2
        # growth is the background's measured property, not the planting's;
        # salted and unsalted corpora measured identical q49c/q55c answer
        # totals, proving template draws never collided even unsalted).
        tail_lo = len(vocab) // 4
        for pos in range(2, DUP_TEMPLATE_LEN, 3):
            toks[pos] = vocab[tail_lo + int(rng.integers(0, len(vocab) - tail_lo))]
        return toks

    templates: dict[int, list[str]] = {}
    texts = tbl.column("text").to_pylist()
    doc_ids = tbl.column("doc_id").to_pylist()
    out_text = []
    for gid, text in zip(doc_ids, texts):
        if _frac(f"duph:{gid}") * 100 >= DUP_PCT:
            out_text.append(text)
            continue
        g = int(np.searchsorted(wcum, _frac(f"dupg:{n_groups}:{gid}")))
        if g not in templates:
            templates[g] = _template(g)
        toks = list(templates[g])
        rng = np.random.default_rng(
            int.from_bytes(hashlib.md5(f"dupe:{gid}".encode()).digest()[:8], "big")
        )
        for _ in range(1 + rng.integers(0, DUP_EDITS_MAX)):
            pos = int(rng.integers(0, len(toks)))
            toks[pos] = vocab[int(np.searchsorted(cum, rng.random()))]
        trunc = int(rng.integers(0, DUP_TRUNC_MAX + 1))
        if trunc:
            toks = toks[:-trunc]
        out_text.append(" ".join(toks))
    t = tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa.array(out_text, pa.string())
    )
    return t.set_column(
        t.schema.get_field_index("n_chars"),
        "n_chars",
        pa.array([len(x) for x in out_text], pa.int64()),
    )


# -------------------------------------------------- boiler-heavy mode
#
# VERDICT r11 #6: duph3's hot-bucket census never crossed
# HOT_BUCKET_THRESHOLD at real pair mass — dup-heavy group sizes are
# scale-CONSTANT (~8, mega ~64), so the salt grid ran as insurance and
# the census-on path was only ever exercised on a planted synthetic
# bucket. Real pretraining corpora have the OTHER regime too: a handful
# of giant boilerplate templates (cookie banners, license headers,
# scraper error pages) each instantiated by thousands of near-identical
# documents. `--boiler-heavy` (composes with --zipf) builds it:
# BOILER_PCT% of documents become instances of one of N_BOILER_GROUPS
# GIANT templates (Zipf-weighted across the groups, so group sizes scale
# LINEARLY with the corpus — thousand-member groups at 10x, multi-
# thousand at 30x), with 0..BOILER_EDITS_MAX single-token edits. A
# near-identical group of size k floods the MinHash band buckets: a
# 1-token edit of a 48-token template leaves each 2-row band key
# unchanged with probability ~0.85-0.9, so every band carries
# ~0.9k-member buckets — exactly the thousand-member signature buckets
# that activate the hot census and put k^2 pair work on one reducer
# without the fragment grid. Groups use the same every-3rd-token group
# salt as dup-heavy, so cross-group similarity is ~0 by construction
# and within-group pairs are the planted answers.

BOILER_PCT = 3
N_BOILER_GROUPS = 3
BOILER_TEMPLATE_LEN = 48
BOILER_EDITS_MAX = 1


def _boiler_heavy_documents(tbl: pa.Table, vocab: list[str],
                            cum: "np.ndarray") -> pa.Table:
    """Replace BOILER_PCT% of documents' text with an instance of one of
    N_BOILER_GROUPS giant templates. Assignment/edit seeding is from the
    document's global id only (group count is a constant), so any scale
    regenerates bit-identically and group sizes grow linearly."""
    import hashlib

    def _frac(tag: str) -> float:
        return int.from_bytes(hashlib.md5(tag.encode()).digest()[:8], "big") / 2**64

    # Zipf-ish weights over the few giant groups: 1/1, 1/2, 1/3 ...
    weights = 1.0 / np.arange(1, N_BOILER_GROUPS + 1)
    wcum = np.cumsum(weights / weights.sum())

    def _template(g: int) -> list[str]:
        rng = np.random.default_rng(
            int.from_bytes(hashlib.md5(f"boilt:{g}".encode()).digest()[:8], "big")
        )
        toks = [vocab[i] for i in np.searchsorted(cum, rng.random(BOILER_TEMPLATE_LEN))]
        # group-salt every 3rd token (same device as _dup_heavy): no
        # word-3-gram can be shared across groups, so the planted answer
        # set is exactly the within-group pairs
        tail_lo = len(vocab) // 4
        for pos in range(2, BOILER_TEMPLATE_LEN, 3):
            toks[pos] = vocab[tail_lo + int(rng.integers(0, len(vocab) - tail_lo))]
        return toks

    templates = {g: _template(g) for g in range(N_BOILER_GROUPS)}
    texts = tbl.column("text").to_pylist()
    doc_ids = tbl.column("doc_id").to_pylist()
    out_text = []
    for gid, text in zip(doc_ids, texts):
        if _frac(f"boilh:{gid}") * 100 >= BOILER_PCT:
            out_text.append(text)
            continue
        g = int(np.searchsorted(wcum, _frac(f"boilg:{gid}")))
        toks = list(templates[g])
        rng = np.random.default_rng(
            int.from_bytes(hashlib.md5(f"boile:{gid}".encode()).digest()[:8], "big")
        )
        for _ in range(int(rng.integers(0, BOILER_EDITS_MAX + 1))):
            pos = int(rng.integers(0, len(toks)))
            toks[pos] = vocab[int(np.searchsorted(cum, rng.random()))]
        out_text.append(" ".join(toks))
    t = tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa.array(out_text, pa.string())
    )
    return t.set_column(
        t.schema.get_field_index("n_chars"),
        "n_chars",
        pa.array([len(x) for x in out_text], pa.int64()),
    )


def _roll_embeddings(tbl: pa.Table, copy_idx: int) -> pa.Table:
    col = tbl.column("embedding").combine_chunks()
    arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
    flat = arr.values.to_numpy(zero_copy_only=False)
    dim = len(flat) // len(tbl)
    mat = np.roll(flat.reshape(len(tbl), dim), copy_idx, axis=1)
    rolled = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.ravel(), type=arr.values.type), dim
    ) if pa.types.is_fixed_size_list(arr.type) else pa.ListArray.from_arrays(
        pa.array(range(0, (len(tbl) + 1) * dim, dim), pa.int32()),
        pa.array(mat.ravel(), type=arr.values.type),
    )
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"), "embedding", rolled
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    zipf = "--zipf" in sys.argv
    dup_heavy = "--dup-heavy" in sys.argv
    boiler_heavy = "--boiler-heavy" in sys.argv
    if (dup_heavy or boiler_heavy) and not zipf:
        print("--dup-heavy/--boiler-heavy compose with --zipf only (they are "
              "skew-corpus modes: templates must share the global vocabulary)",
              file=sys.stderr)
        return 2
    # --tables a,b: restrict generation to the named tables (e.g.
    # embeddings-only corpora for the q55 recall ladder, where document
    # text is dead weight). FK consistency across tables is the caller's
    # concern under this flag.
    only_tables: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--tables="):
            only_tables = set(a.split("=", 1)[1].split(","))
        elif a == "--tables":
            i = sys.argv.index("--tables")
            only_tables = set(sys.argv[i + 1].split(","))
            args = [x for x in args if x != sys.argv[i + 1]]
    mult = int(args[0]) if args else 10
    dst = (
        args[1]
        if len(args) > 1
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "build", "testdata", "sf1")
    )
    os.makedirs(dst, exist_ok=True)

    vocab: list[str] = []
    cum = None
    if zipf:
        vocab = _zipf_vocab()
        p = 1.0 / np.arange(1, len(vocab) + 1) ** ZIPF_S
        cum = np.cumsum(p / p.sum())

    domain_size = {}
    for dom, (t, c) in DOMAIN_SOURCE.items():
        tbl = pq.read_table(f"{SRC}/{t}.parquet", columns=[c])
        domain_size[dom] = pc.max(tbl.column(c)).as_py() + 1

    for name in ["region", "nation"]:
        if only_tables is not None and name not in only_tables:
            continue
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{dst}/{name}.parquet")
        print(f"{name}: copied verbatim")

    # Layout (VERDICT r10 item 7): mult == 1 keeps /root/testdata's
    # one-FILE-per-table layout; mult > 1 writes <table>.parquet as a
    # DIRECTORY of one row-group-aligned part file per copy. A single
    # multi-GB file at 30-100x forced Spark to carve empty byte-range
    # splits (one row group, maxPartitionBytes-sized slices) — the
    # median~40 ms scan-stage artifact every straggler reading had to
    # explain away. Per-copy parts make scan parallelism honest, read
    # identically through spark.read.parquet / pyarrow datasets, and
    # drop peak generator memory from the whole corpus to one copy.
    for name, keycols in KEY_DOMAINS.items():
        if only_tables is not None and name not in only_tables:
            continue
        src = pq.read_table(f"{SRC}/{name}.parquet")
        multi_file = mult > 1
        if multi_file:
            os.makedirs(f"{dst}/{name}.parquet", exist_ok=True)
        n_out = 0
        for i in range(mult):
            t = src
            for col, dom in keycols.items():
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t.column(col), i * domain_size[dom])
                t = t.set_column(idx, col, pc.cast(shifted, src.schema.field(col).type))
            if name == "documents" and zipf:
                t = _zipf_documents(t, i, vocab, cum)
                if dup_heavy:
                    t = _dup_heavy_documents(t, vocab, cum, len(src) * mult)
                if boiler_heavy:
                    t = _boiler_heavy_documents(t, vocab, cum)
            elif i > 0 and name == "documents":
                t = _rename_documents(t, i)
            if name == "embeddings":
                t = _roll_embeddings(t, i)
            n_out += len(t)
            if multi_file:
                pq.write_table(t, f"{dst}/{name}.parquet/part-{i:05d}.parquet")
            else:
                pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: {len(src)} -> {n_out} rows"
              + (f" in {mult} part files" if multi_file else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
