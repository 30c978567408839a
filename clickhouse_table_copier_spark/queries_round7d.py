"""Query batch: round-7d — iterative BPE merge training and exact
readability scoring.

- ``bpe_iterative_merges`` — THREE iterations of byte-pair-encoding
  vocabulary training (Sennrich et al. 2016), the loop behind every
  production tokenizer, as a driver-coordinated distributed iteration:
  count symbol pairs over the frequency-collapsed word table → pick the
  argmax merge (1-row metadata collect) → apply the merge to every
  word's symbol sequence → repeat. Extends ``bpe_merge_candidates``
  (iteration 0 only) with the part that makes it training: merged
  symbols participate in later counts.
- ``readability_scores`` — Flesch reading-ease per document from three
  integer regex counts (words, sentence-ending punctuation groups,
  vowel groups as the syllable heuristic); the score is a fixed
  sequence of correctly-rounded double ops on exact integers, so it
  crosses engines bit-for-bit. The classic pre-LLM quality filter
  (and still a cheap first-pass signal next to gopher_signals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_table_copier_spark.queries import _t, register
from clickhouse_table_copier_spark.queries_round6 import _NORM_SQL, _TOKS_SQL, _norm_tokens

# ---------------------------------------------------------------------------
# Iterative BPE. Symbol sequences ride in ONE string column: symbols
# separated by TWO spaces with single-space sentinels at both ends, so a
# merge of pair (a, b) is the LITERAL replace of " a  b " with " ab " —
# plain replace() scans left-to-right over non-overlapping occurrences
# in both engines, which is exactly BPE's greedy leftmost-pair rule
# (" a  a  a " merges to " aa  a ", not " a  aa "). No regex involved,
# so no metacharacter or engine-dialect concerns.
#
# Scale: each iteration is one map-side transform (replace) + one pair
# count over the FREQUENCY-COLLAPSED word table (vocabulary-sized, not
# corpus-sized — the collapse is what makes industrial BPE trainable);
# the argmax is a 1-row metadata collect, same justification as the IVF
# seeds. The oracle unrolls the identical three iterations in SQL with
# scalar-subquery argmaxes, so the driver hash proves the whole loop:
# counts, tie rule, replace semantics, and merged-symbol participation.
# ---------------------------------------------------------------------------
_BPE_ITERS = 3


def _bpe_oracle() -> str:
    toks = _TOKS_SQL.format(c="text")
    ctes = [
        f"""words AS (
      SELECT w, count(*) AS freq
      FROM (SELECT unnest({toks}) AS w FROM documents) GROUP BY 1
    )""",
        """seq0 AS (
      SELECT ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS s,
             freq
      FROM words
    )""",
    ]
    for i in range(_BPE_ITERS):
        ctes.append(f"""p{i} AS (
      SELECT syms[i] AS sym_a, syms[i + 1] AS sym_b,
             CAST(sum(freq) AS BIGINT) AS n_occurrences
      FROM (
        SELECT syms, freq,
               unnest(generate_series(1, len(syms) - 1)) AS i
        FROM (SELECT string_split(trim(s), '  ') AS syms, freq FROM seq{i})
      )
      GROUP BY 1, 2
    )""")
        ctes.append(f"""m{i} AS (
      SELECT sym_a, sym_b, n_occurrences FROM p{i}
      ORDER BY n_occurrences DESC, sym_a, sym_b LIMIT 1
    )""")
        if i + 1 < _BPE_ITERS:
            ctes.append(f"""seq{i + 1} AS (
      SELECT replace(s,
               (SELECT ' ' || sym_a || '  ' || sym_b || ' ' FROM m{i}),
               (SELECT ' ' || sym_a || sym_b || ' ' FROM m{i})) AS s,
             freq
      FROM seq{i}
    )""")
    selects = [
        f"SELECT {i + 1} AS iteration, sym_a, sym_b, sym_a || sym_b AS merged,"
        f" n_occurrences FROM m{i}"
        for i in range(_BPE_ITERS)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(selects)
    )


@register("bpe_iterative_merges", oracle=_bpe_oracle())
def q_bpe_iterative_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(_norm_tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seq = words.select(
        (
            F.concat(
                F.lit(" "),
                F.array_join(F.split(F.col("w"), ""), "  "),
                F.lit(" "),
            )
        ).alias("s"),
        "freq",
    )
    merges = []
    for i in range(_BPE_ITERS):
        syms = F.split(F.trim(F.col("s")), "  ")
        pairs = (
            seq.select(syms.alias("syms"), "freq")
            .where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.sequence(F.lit(1), F.size("syms") - 1)
                ).alias("i"),
                F.col("syms"),
                "freq",
            )
            .select(
                F.element_at("syms", F.col("i")).alias("sym_a"),
                F.element_at("syms", F.col("i") + 1).alias("sym_b"),
                "freq",
            )
            .groupBy("sym_a", "sym_b")
            .agg(F.sum("freq").cast("bigint").alias("n_occurrences"))
        )
        # argmax merge: 1 row — metadata-sized collect (the IVF-seed rule)
        top = (
            pairs.orderBy(
                F.desc("n_occurrences"), F.asc("sym_a"), F.asc("sym_b")
            )
            .limit(1)
            .collect()
        )
        if not top:
            break  # corpus fully merged — BPE's natural stop; the
            # oracle's m{i} CTE is empty past this point too
        best = top[0]
        merges.append(
            (i + 1, best["sym_a"], best["sym_b"],
             best["sym_a"] + best["sym_b"], int(best["n_occurrences"]))
        )
        if i + 1 < _BPE_ITERS:
            seq = seq.select(
                F.replace(
                    F.col("s"),
                    F.lit(f" {best['sym_a']}  {best['sym_b']} "),
                    F.lit(f" {best['sym_a']}{best['sym_b']} "),
                ).alias("s"),
                "freq",
            )
            # cut lineage: without this, iteration i's count replays ALL
            # previous replaces from the raw corpus (measured 3.1 s →
            # the checkpointed word table makes each iteration one pass)
            seq = seq.localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges,
        "iteration int, sym_a string, sym_b string, merged string,"
        " n_occurrences bigint",
    )


# ---------------------------------------------------------------------------
# Flesch reading ease per document. Counts are pure-integer regex
# aggregates over the RE2∩Java-safe patterns the pii_redaction precedent
# established: words from the shared normalized tokenizer, sentences as
# [.!?]+ groups in the RAW text (floored at 1), syllables as [aeiouy]+
# vowel groups in the normalized text. The score
#     206.835 − 1.015·(W/S) − 84.6·(SY/W)
# is the identical left-to-right sequence of correctly-rounded double
# ops in both engines over identical integers — bit-equal, no rounding
# tolerance needed. One expression-only scan, no shuffle at all.
# ---------------------------------------------------------------------------
@register(
    "readability_scores",
    oracle=f"""
    WITH counts AS (
      SELECT doc_id,
             CAST(len({_TOKS_SQL.format(c="text")}) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all({_NORM_SQL.format(c="text")},
                  '[aeiouy]+')) AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             AS flesch
    FROM counts WHERE n_words > 0
    """,
)
def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_table_copier_spark.operators.dedup import normalized_text

    docs = _t(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id",
        F.size(_norm_tokens("text")).cast("bigint").alias("n_words"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
        ).cast("bigint").alias("n_sentences"),
        F.regexp_count(normalized_text("text"), F.lit("[aeiouy]+"))
        .cast("bigint")
        .alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return counts.where(F.col("n_words") > 0).select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias(
            "flesch"
        ),
    )
