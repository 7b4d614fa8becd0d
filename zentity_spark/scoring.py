"""Identity-confidence score math.

Ports the two scoring functions of the reference bit-for-bit (the
reference asserts them to 1e-10, JobTest.java:1111-1239, and the
integration test asserts end-to-end doc scores to 1e-10,
ResolutionActionIT.java:1593-1630):

- attribute score  — Job.java:652-663 calculateAttributeIdentityConfidenceScore
- composite score  — Job.java:608-640 calculateCompositeIdentityConfidenceScore
  (Bayesian conflation, arXiv:0808.1808v4)

Both exist twice: as plain-Python scalar functions (driver-side, used to
precompute the model-sized score table exactly like the reference's memo
cache Job.java:675-700) and as Spark Column expressions for pair-level
scoring at scale.
"""

from __future__ import annotations

import math
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F


def attribute_identity_confidence_score(
    base: float | None,
    matcher_quality: float | None,
    field_quality: float | None,
) -> float | None:
    """Job.java:652-663. Each non-null quality q adjusts score s by
    s' = ((s-0.5)/(s-0.0))·(s·q - s) + s ; NaN (s=0 division) → 0.0."""
    if base is None:
        return None
    score = float(base)
    for q in (matcher_quality, field_quality):
        if q is not None:
            if score == 0.0:
                return 0.0  # 0/0 → NaN → 0.0 per reference
            score = ((score - 0.5) / (score - 0.0)) * ((score * q) - score) + score
    if math.isnan(score):
        return 0.0
    return score


def composite_identity_confidence_score(scores: list[float | None]) -> float | None:
    """Job.java:608-640: conflation ∏s / (∏s + ∏(1-s)); nulls skipped;
    empty → None; NaN (1.0 and 0.0 both present) → 0.5."""
    vals = [s for s in scores if s is not None]
    if not vals:
        return None
    prod = 1.0
    prod_inv = 1.0
    for s in vals:
        prod *= s
        prod_inv *= 1.0 - s
    denom = prod + prod_inv
    if denom == 0.0:
        return 0.5  # NaN guard
    return prod / denom


@lru_cache(maxsize=None)
def _cached_attribute_score(base, matcher_quality, field_quality):
    """Score memo cache analog of Job.java:675-700 (model-sized domain)."""
    return attribute_identity_confidence_score(base, matcher_quality, field_quality)


def score_table(model) -> dict[tuple[str, str, str, str], float | None]:
    """Precompute the attribute score for every
    (attribute, matcher, index, field) combination in the model — the
    entire domain of the reference's 4-level memo cache. Broadcast-sized."""
    out: dict[tuple[str, str, str, str], float | None] = {}
    for index_name, idx in model.indices.items():
        for fname, f_ in idx.fields.items():
            if f_.matcher is None:
                continue
            attr = model.attributes.get(f_.attribute)
            matcher = model.matchers.get(f_.matcher)
            if attr is None or matcher is None:
                continue
            out[(f_.attribute, f_.matcher, index_name, fname)] = _cached_attribute_score(
                attr.score, matcher.quality, f_.quality
            )
    return out


# ----------------------------------------------------------------------
# Pairwise similarity features (north_star scoring surface). Three of
# the four features have exact JVM built-ins and are computed as Column
# expressions (whole-stage codegen, zero Python): Levenshtein-prefix
# (F.levenshtein over substring columns), Soundex equality of the first
# token (F.soundex — cross-checked against the Python reference impl in
# test_score_pairs), token-Jaccard (split + array_intersect /
# array_union). Only Jaro-Winkler — which Spark lacks — runs in an
# Arrow-batched pandas UDF (vectorized numpy, matchers.py).

def _soundex_py(word: str) -> str:
    if not word:
        return ""
    codes = {**{c: "1" for c in "bfpv"}, **{c: "2" for c in "cgjkqsxz"},
             **{c: "3" for c in "dt"}, "l": "4", **{c: "5" for c in "mn"}, "r": "6"}
    w = word.lower()
    out = w[0].upper()
    prev = codes.get(w[0], "")
    for c in w[1:]:
        code = codes.get(c, "")
        if code and code != prev:
            out += code
        if c not in "hw":
            prev = code
    return (out + "000")[:4]


def _lev_py(s1: str, s2: str) -> int:
    if s1 == s2:
        return 0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return max(l1, l2)
    prev = list(range(l2 + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[l2]


def jw_text_udf(text_prefix: int = 200):
    """pandas UDF: Jaro-Winkler similarity over the first `text_prefix`
    chars of two text columns — the one pair feature with no JVM
    built-in (vectorized numpy implementation, matchers.py)."""
    from pyspark.sql.functions import pandas_udf

    def feats(a, b):
        from zentity_spark.matchers import jaro_winkler_pandas

        return jaro_winkler_pandas(
            a.fillna("").str.slice(0, text_prefix),
            b.fillna("").str.slice(0, text_prefix),
        )

    return pandas_udf(feats, "double")


def _first_token(col: Column) -> Column:
    """First whitespace-delimited token (Python str.split() semantics:
    leading whitespace discarded, empty text → '')."""
    # try_element_at, not element_at: under Spark 4's default ANSI mode
    # element_at THROWS on an empty array (whitespace-only/empty text),
    # aborting the whole scoring stage instead of yielding ''.
    return F.coalesce(
        F.try_element_at(
            F.filter(F.split(F.coalesce(col, F.lit("")), r"\s+"),
                     lambda t: t != ""),
            F.lit(1),
        ),
        F.lit(""),
    )


def _token_set(col: Column) -> Column:
    return F.array_distinct(
        F.filter(F.split(F.coalesce(col, F.lit("")), r"\s+"),
                 lambda t: t != "")
    )


def pair_feature_cols(text_l: Column, text_r: Column,
                      text_prefix: int = 200, lev_prefix: int = 32) -> dict:
    """The four pair similarity features as named Column expressions:

    - jw_text: Jaro-Winkler over the first `text_prefix` chars (pandas
      UDF — no JVM built-in)
    - lev_prefix: Levenshtein distance over the first `lev_prefix` chars
      (F.levenshtein on substring columns — JVM)
    - soundex_eq: Soundex equality of the first whitespace token
      (F.soundex — JVM; matches the Python reference _soundex_py on
      letter-leading tokens, asserted in test_score_pairs)
    - token_jaccard: Jaccard of the whitespace token sets
      (array_intersect/array_union — JVM; both empty → 1.0)

    Tokenization semantics are DEFINED as ASCII whitespace (Java regex
    \\s, the same ASCII class — modulo \\x0B — as the RE2 \\s the
    DuckDB oracle splits on) — this is the contract the oracle checks,
    deliberately replacing the round-2 pandas implementation's Python
    str.split() Unicode whitespace. Likewise soundex_eq of non-letter-leading tokens
    follows F.soundex (returns the input's leading non-letter form)
    rather than _soundex_py's digit-coercion; both sides use the same
    function, so equality semantics shift only for digit-leading text.
    """
    l = F.coalesce(text_l, F.lit(""))
    r = F.coalesce(text_r, F.lit(""))
    tl, tr = _token_set(text_l), _token_set(text_r)
    union = F.size(F.array_union(tl, tr))
    return {
        "jw_text": jw_text_udf(text_prefix)(text_l, text_r),
        "lev_prefix": F.levenshtein(
            F.substring(l, 1, lev_prefix), F.substring(r, 1, lev_prefix)
        ),
        "soundex_eq": F.soundex(_first_token(text_l))
        == F.soundex(_first_token(text_r)),
        "token_jaccard": F.when(union == 0, F.lit(1.0)).otherwise(
            F.size(F.array_intersect(tl, tr)) / union
        ),
    }


def score_pairs(pairs, conv_texts, id_l: str = "id_l", id_r: str = "id_r"):
    """Scored-pairs artifact (the `_explanation`/`_score` analog,
    SURVEY §1.5): joins both sides' assembled conversation text onto the
    pair set and computes the similarity-feature struct per pair.

    conv_texts: (record_id, conv_text) — one row per record (e.g. from
    transcripts.assemble_conversations). Both joins shuffle on record id
    only.

    The joined pairs are explicitly repartitioned before the UDF: AQE
    coalesces post-shuffle partitions by BYTE size, which is oblivious to
    per-row Python cost — left alone it squeezes the scoring stage into
    2-3 tasks and serializes the pandas UDF (measured: the stage ran no
    faster on 32 cores than 8). An explicit numPartitions repartition is
    exempt from AQE coalescing, so every core gets scoring work.

    lev/soundex/jaccard run as JVM column expressions; only JW crosses
    into Python (pair_feature_cols)."""
    from pyspark.sql import functions as F

    l = conv_texts.select(
        F.col("record_id").alias(id_l), F.col("conv_text").alias("_text_l")
    )
    r = conv_texts.select(
        F.col("record_id").alias(id_r), F.col("conv_text").alias("_text_r")
    )
    spark = pairs.sparkSession
    n_score_parts = spark.sparkContext.defaultParallelism * 3
    feats = pair_feature_cols(F.col("_text_l"), F.col("_text_r"))
    return (
        pairs.join(l, id_l).join(r, id_r)
        .repartition(n_score_parts)
        .select(
            id_l, id_r,
            *(expr.alias(name) for name, expr in feats.items()),
        )
    )


# ----------------------------------------------------------------------
# Spark Column forms (vectorized, JVM-side — no Python in the hot path)

def attribute_score_col(base: Column, *qualities: Column) -> Column:
    """A4 (Job.java:652-663) as a Column expression: sequential quality
    adjustments s' = ((s-0.5)/s)·(s·q - s) + s, null qualities skipped,
    score 0.0 short-circuits (the reference's 0/0→NaN→0.0 path — guarded
    explicitly because Spark ANSI mode raises on 0/0)."""
    score = base
    for q in qualities:
        adjusted = ((score - F.lit(0.5)) / score) * ((score * q) - score) + score
        score = F.when(q.isNull(), score).when(
            score == F.lit(0.0), F.lit(0.0)
        ).otherwise(adjusted)
    return F.when(F.isnan(score), F.lit(0.0)).otherwise(score)


def composite_score_col(scores_array: Column) -> Column:
    """Conflation of an array<double> column of attribute scores.

    Direct product form via aggregate() HOF — numerically identical to
    the reference's sequential product at model-sized score lists. NaN
    guard (simultaneous 1.0 and 0.0) → 0.5; empty/all-null → null.
    """
    vals = F.filter(scores_array, lambda s: s.isNotNull())
    prod = F.aggregate(vals, F.lit(1.0), lambda acc, s: acc * s)
    prod_inv = F.aggregate(vals, F.lit(1.0), lambda acc, s: acc * (F.lit(1.0) - s))
    # denom = 0 ⟺ a 1.0 and a 0.0 are both present — the reference's NaN
    # case (Job.java:636-637) → 0.5. Guard explicitly: Spark ANSI mode
    # raises on 0/0 rather than producing NaN.
    has_one = F.exists(vals, lambda s: s == 1.0)
    has_zero = F.exists(vals, lambda s: s == 0.0)
    # denom can ALSO hit 0.0 by double underflow on long mid-range
    # score lists (0.5^~2000) with no exact 1.0/0.0 present — under
    # ANSI that 0/0 raises instead of NaN. Match the reference's NaN →
    # 0.5 convention; genuinely long lists should use the log-space
    # form (composite_score_log_space).
    return (
        F.when(F.size(vals) == 0, F.lit(None).cast("double"))
        .when(has_one & has_zero, F.lit(0.5))
        .when(prod + prod_inv == 0.0, F.lit(0.5))
        .otherwise(prod / (prod + prod_inv))
    )


def composite_score_log_space(scores_array: Column) -> Column:
    """Log-space conflation for long score lists (scale path):
    exp(Σ log s) / (exp(Σ log s) + exp(Σ log(1-s))) with max-subtraction
    for stability. Exact scores of 0.0 / 1.0 short-circuit as in the
    direct form. Use when score lists can be long enough to underflow the
    direct product (hundreds of attributes)."""
    vals = F.filter(scores_array, lambda s: s.isNotNull())
    has_one = F.exists(vals, lambda s: s == 1.0)
    has_zero = F.exists(vals, lambda s: s == 0.0)
    log_p = F.aggregate(vals, F.lit(0.0), lambda acc, s: acc + F.log(s))
    log_q = F.aggregate(vals, F.lit(0.0), lambda acc, s: acc + F.log(F.lit(1.0) - s))
    m = F.greatest(log_p, log_q)
    raw = F.exp(log_p - m) / (F.exp(log_p - m) + F.exp(log_q - m))
    return (
        F.when(F.size(vals) == 0, F.lit(None).cast("double"))
        .when(has_one & has_zero, F.lit(0.5))
        .when(has_one, F.lit(1.0))
        .when(has_zero, F.lit(0.0))
        .otherwise(raw)
    )
