"""Skew-aware join utilities.

At 100 TB, a handful of hot keys (a viral user_id, an empty-string
email) can put most of a shuffle into one task. Two remedies, composed
here:

1. AQE skew-join splitting — on by default in the session factory
   (``spark.sql.adaptive.skewJoin.enabled``); handles moderate skew
   with zero code.
2. **Salting** — for pathological keys AQE can't fix (a build side that
   must replicate): spray the hot side across ``n_salts`` synthetic
   sub-keys and replicate the other side once per salt. This trades
   n_salts× duplication of the small side for an even shuffle of the
   big side — the standard cure when the big side's hot key exceeds a
   single executor.

``salted_join`` is exact for inner equi joins (tested against the
unsalted result).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join with the big side salted and the small side replicated.

    ``big`` gets a uniform random-ish salt derived from xxhash64 of all
    its columns (deterministic — no rand(), so retries/speculation
    reproduce the same partitioning); ``small`` is exploded once per
    salt value. Join keys become (on..., _salt).

    Only ``inner`` and ``left`` are exact under salting: with right or
    full outer joins, an unmatched small-side row would surface once
    per salt replica (n_salts duplicates), so those are rejected.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "outer-unmatched small-side rows would appear once per salt"
        )
    on = list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    ).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [*on, "_salt"], how)
    return out.drop("_salt")
