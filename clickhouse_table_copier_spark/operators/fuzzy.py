"""Edit-distance self-join via deletion neighborhoods (SymSpell-style).

The entity-resolution primitive behind ``fuzzy_name_pairs``: find all row
pairs whose string column is within Levenshtein distance ``max_dist``.
Reference parity: the reference exposes no fuzzy matching; this is one of
the training-pipeline extensions (record linkage across sources).

Why deletion neighborhoods
--------------------------
A naive blocked join needs a discriminating blocking key, but any fixed
key function (length, prefix, q-gram) degenerates when the data shares a
constant region — TPC-H customer names are ``Customer#`` + 9 digits, so
*every* length/prefix bucket is the whole table and the "blocked" join is
a full O(n²) self-join (round-3 verdict: 2.25×10⁸ levenshtein calls at
sf0.1, 2×10¹² at 100×).

The deletion-neighborhood filter (Garbe's SymSpell; also the basis of
Mor-Fraenkel dictionaries) is exact and needs no tuning: if
``lev(a, b) <= d`` with s substitutions, i insertions and dl deletions
(s+i+dl <= d), then removing the <=d touched characters from each side
leaves a common skeleton string — i.e. ``del^{<=d}(a) ∩ del^{<=d}(b) ≠ ∅``
where ``del^{<=d}`` is the set of strings obtained by deleting at most d
characters. So candidates = pairs sharing a deletion variant (an
equi-join), verification = one levenshtein per *candidate* pair.
False positives are removed by verification; false negatives are
impossible, so the result equals the brute-force join.

Scale story (100 TB)
--------------------
Variant generation is a per-row expression (no shuffle): three nested
``transform``/``flatten`` levels with ``array_distinct`` applied per level,
bounding the explode factor at C(L,<=d) string copies per row (L=18, d=3:
<=988, far fewer after per-level dedup on repetitive strings). The join is
a hash equi-join on the variant string; per-key fan-out is bounded by the
variant's document frequency, never by n, and the verify predicate runs
only on candidates. On low-entropy data where the true answer itself is
dense, candidate count tracks answer size instead of n². ``max_df``
optionally drops variants hotter than the cap for an approximate
high-recall mode at extreme scale (off by default: exactness).

Measured density caveat (TPC-H customer names): zero-padded ids vary in
only ~log10(n) trailing digit positions, so the TRUE lev<=3 relation is
quadratically dense — at sf0.01, 785k of 1.1M possible pairs qualify; at
sf0.1, 28M of 112M. Any exact method is output-bound there; this one
does ~answer-proportional work plus the variant-join duplication
(~10x: a near pair shares many deletion skeletons). On realistic-entropy
names (the operator's actual use case) the candidate set is sparse and
the join is the cheap part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _del1(v: str) -> str:
    """SQL expr: all strings obtained by deleting exactly 1 char of ``v``.
    Empty input yields an empty array (sequence(1, 0) is illegal)."""
    return (
        f"if(length({v}) = 0, array(), "
        f"transform(sequence(1, length({v}), 1), i -> "
        f"concat(substring({v}, 1, i-1), substring({v}, i+1, length({v})-i))))"
    )


def deletion_variants(col: str, max_dist: int) -> F.Column:
    """Column expr: array of all distinct strings reachable from ``col``
    by deleting at most ``max_dist`` characters (includes the original)."""
    levels = [f"array({col})"]
    for _ in range(max_dist):
        prev = levels[-1]
        levels.append(
            f"array_distinct(flatten(transform({prev}, v -> {_del1('v')})))"
        )
    return F.expr(f"array_distinct(concat({', '.join(levels)}))")


def edit_distance_self_join(
    df: DataFrame,
    key_col: str,
    str_col: str,
    max_dist: int = 3,
    len_tol: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs (key_a < key_b) with ``lev(str_a, str_b) <= max_dist``
    (and ``abs(len_a - len_b) <= len_tol`` when given).

    Returns columns ``key_a, key_b, edit_dist`` (int).
    """
    if len_tol is None:
        len_tol = max_dist
    v = df.select(
        F.col(key_col).alias("_k"),
        F.col(str_col).alias("_s"),
        F.explode(deletion_variants(str_col, max_dist)).alias("_var"),
    )
    if max_df is not None:
        hot = v.groupBy("_var").count().where(F.col("count") > max_df)
        v = v.join(F.broadcast(hot.select("_var")), "_var", "left_anti")
    a = v.select(
        F.col("_var"),
        F.col("_k").alias("key_a"),
        F.col("_s").alias("_sa"),
    )
    b = v.select(
        F.col("_var"),
        F.col("_k").alias("key_b"),
        F.col("_s").alias("_sb"),
    )
    # Catalyst still sees the pre-explode table size and would try to
    # BROADCAST the exploded side (n × |variants| rows); pin a sort-merge
    # join — the robust plan for a large-large self-join: no in-memory
    # hash map to build (a forced shuffle-hash build OOMs once the
    # variant side outgrows executor memory), spills gracefully, and the
    # sort on the variant key is exactly the shuffle the join needs.
    cand = (
        a.hint("merge").join(b.hint("merge"), "_var")
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "_sa", "_sb")
        .distinct()
    )
    dist = F.levenshtein(F.col("_sa"), F.col("_sb"))
    return (
        cand.where(
            (F.abs(F.length("_sa") - F.length("_sb")) <= len_tol)
            & (dist <= max_dist)
        )
        .select("key_a", "key_b", dist.cast("int").alias("edit_dist"))
    )
