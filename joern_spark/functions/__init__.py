"""Shared relational helpers for the CPG pipeline."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(big: DataFrame, dim: DataFrame, key: str, n_salts: int = 8,
                how: str = "inner", salt_cols: list[str] | None = None) -> DataFrame:
    """Skew-safe equi-join of a large probe relation against a dimension.

    Hot join keys (external library symbols like ``printf`` — the skew called
    out in the north rule) concentrate all probe rows for one key in one
    shuffle partition. Salting splits them: the probe side gets a
    deterministic salt in [0, n_salts) derived from its *other* columns, the
    dimension is replicated once per salt value, and the join key becomes
    (key, salt) — each hot key now spreads over n_salts partitions. The
    dimension inflates n_salts×, so this is for dimensions too large to
    broadcast outright; AQE's skew-join splitting is the runtime backstop
    when statistics catch the skew on their own.

    The salt is xxhash64 over ``salt_cols`` (default: every non-key column of
    the probe side) — deterministic, so the operation stays idempotent.
    """
    salt_cols = salt_cols or [c for c in big.columns if c != key]
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
                        F.lit(n_salts)).cast("int"))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = salted_big.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")
