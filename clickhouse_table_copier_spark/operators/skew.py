"""Skew mitigation: salted joins for hot keys.

AQE's skew-join handles most cases at runtime (enabled in the session
defaults), but two situations still need explicit salting: stream-static
joins (AQE can't re-plan a running stream) and deliberately co-partitioned
layouts. The classic transform:

- replicate the SMALL side S times (one copy per salt value);
- tag each BIG-side row with a deterministic salt = hash(row) % S;
- equi-join on (key, salt) — the hot key's rows now spread over S tasks.

Cost: small side grows ×S (it's small — that's the deal); the big side
gains one cheap column. Result is row-identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small side with salt-spread hot keys.

    Deterministic salt (xxhash64 of the whole big row) keeps re-runs
    identical. Output columns = big's ∪ small's (minus the join key dup),
    exactly as ``big.join(small, key, how)`` would produce.

    Only ``inner`` and ``left`` are supported: the small side is
    replicated ``salt_buckets`` times, so a right/full outer join would
    emit up to S null-extended copies of every small-side key the big
    side lacks — not equivalent to the plain join. Rejected explicitly.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated small side makes right/full outer joins emit "
            "spurious null-extended rows"
        )
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % salt_buckets).alias(
        "__salt"
    )
    big_salted = big.select("*", salt)
    small_rep = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    )
    joined = big_salted.join(small_rep, [key, "__salt"], how)
    return joined.drop("__salt")
