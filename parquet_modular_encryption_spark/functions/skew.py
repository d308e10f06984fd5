"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the explicit
fallback for the pathological case AQE can't fix — one join key so hot
that even a split partition overwhelms a task, or a broadcast that doesn't
fit. The fact side scatters each row into one of ``n_salts`` sub-keys; the
(smaller) build side replicates once per salt. Join results are identical
to the unsalted join; only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str | Column,
    dim_key: str | Column,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join with the fact side salted across ``n_salts`` sub-keys.

    The salt is derived from a spread of fact columns via xxhash64 — it
    only needs to scatter rows of the SAME key across sub-keys, not be
    reproducible, but a deterministic derivation keeps reruns identical.
    The dim side is exploded ×n_salts (keep it the small side)."""
    fact_key = F.col(fact_key) if isinstance(fact_key, str) else fact_key
    dim_key = F.col(dim_key) if isinstance(dim_key, str) else dim_key

    salted_fact = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
    joined = salted_fact.join(
        salted_dim,
        (fact_key == dim_key) & (salted_fact[SALT_COL] == salted_dim[SALT_COL]),
        how,
    )
    return joined.drop(SALT_COL)
