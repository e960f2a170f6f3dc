"""Skew mitigation for hot join keys.

First resort at 100 TB is AQE's runtime skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on by default in
`session.get_spark`). This module is the *explicit* lever for the
cases AQE can't fix: a broadcast-ineligible dim side, a deliberately
pre-partitioned layout, or an engine without AQE. The pattern is the
classic salt-and-replicate: the skewed fact side fans its hot key
across `n_salts` sub-keys (deterministically, from a content hash of
the whole row so re-runs are stable), the dim side is replicated
`n_salts`×, and the join key becomes (key, salt) — one hot reducer
becomes `n_salts` parallel ones at the cost of a `n_salts`× larger
(but usually tiny) dim side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact` ⋈ `dim` on `key_cols` with a salted shuffle.

    The fact salt hashes ALL fact columns (not just the key — salting
    by key alone would map every row of the hot key to the same salt
    and change nothing). Rows identical in every column hash to the
    same salt, which is harmless: the skew we are splitting comes from
    many *distinct* rows sharing a key. Result is column-identical to
    the plain join (pytest-gated).
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # dim rows are replicated n_salts×, so join modes that emit
        # unmatched DIM rows (right/full) would duplicate them
        raise ValueError(f"salted_join does not support how={how!r}")
    fact_s = fact.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    dim_s = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return fact_s.join(dim_s, [*key_cols, _SALT], how).drop(_SALT)
