"""PySpark-native analytics engine with the capabilities of the reference
``manselmi/parquet-modular-encryption`` repo, re-expressed Spark-first.

The reference (/root/reference, see SURVEY.md) is a Parquet Modular
Encryption (PME) demo: encrypted columnar datasets with per-column keys, a
KMS wrap/unwrap protocol behind a privilege lattice, and the demonstration
that projection + predicate pushdown survive encryption. This package keeps
that surface (``crypto``, ``sources.encrypted``) and widens it into a full
DataFrame/SQL engine (``operators``), Structured Streaming (``streaming``),
and LLM-data-pipeline operators (``pipeline``: dedup, similarity search,
text analysis, multimodal columns) — all designed for a multi-executor
cluster even though tests run on ``local[*]``.

Layout:
    session.py    — tuned SparkSession builders
    registry.py   — query registry consumed by ``__spark_entry__.py``
    sources/      — dataset loaders, encrypted parquet IO (PME)
    functions/    — cross-engine-deterministic numeric/text/vector helpers
    operators/    — relational query library (one registered query each)
    streaming/    — Structured Streaming operators over the events table
    crypto/       — privilege lattice policy, KMS client/server
    pipeline/     — dedup / similarity / text-analysis / multimodal ops
    plans/        — plan-inspection helpers (pushdown / broadcast asserts)
"""

__version__ = "0.1.0"
