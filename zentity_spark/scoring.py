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
# Pairwise similarity features (north_star scoring surface): one
# Arrow-batched pandas UDF computing Jaro-Winkler + Levenshtein +
# Soundex + token-Jaccard per candidate pair over the records'
# concatenated conversation text. Python workers are separate processes,
# so this stage scales with cores independent of JVM GC/shuffle limits.

PAIR_FEATURES_SCHEMA = (
    "struct<jw_text:double, lev_prefix:int, soundex_eq:boolean, token_jaccard:double>"
)


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


def pair_features_udf(text_prefix: int = 200, lev_prefix: int = 32):
    """pandas UDF (two text columns → similarity-feature struct):

    - jw_text: Jaro-Winkler over the first `text_prefix` chars
    - lev_prefix: Levenshtein distance over the first `lev_prefix` chars
    - soundex_eq: Soundex equality of the first whitespace token
    - token_jaccard: Jaccard of the whitespace token sets
    """
    from pyspark.sql.functions import pandas_udf

    def feats(a, b):
        import pandas as pd

        from zentity_spark.matchers import jaro_winkler_pandas

        ap = a.fillna("").str.slice(0, text_prefix)
        bp = b.fillna("").str.slice(0, text_prefix)
        jw = jaro_winkler_pandas(ap, bp)
        lev, sx, jac = [], [], []
        for x, y in zip(a, b):
            x = x or ""
            y = y or ""
            lev.append(_lev_py(x[:lev_prefix], y[:lev_prefix]))
            xt = x.split()
            yt = y.split()
            sx.append(_soundex_py(xt[0] if xt else "") == _soundex_py(yt[0] if yt else ""))
            xs, ys = set(xt), set(yt)
            u = len(xs | ys)
            jac.append(len(xs & ys) / u if u else 1.0)
        return pd.DataFrame(
            {"jw_text": jw, "lev_prefix": lev, "soundex_eq": sx, "token_jaccard": jac}
        )

    return pandas_udf(feats, PAIR_FEATURES_SCHEMA)


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
    exempt from AQE coalescing, so every core gets scoring work."""
    from pyspark.sql import functions as F

    feats = pair_features_udf()
    l = conv_texts.select(
        F.col("record_id").alias(id_l), F.col("conv_text").alias("_text_l")
    )
    r = conv_texts.select(
        F.col("record_id").alias(id_r), F.col("conv_text").alias("_text_r")
    )
    spark = pairs.sparkSession
    n_score_parts = spark.sparkContext.defaultParallelism * 3
    return (
        pairs.join(l, id_l).join(r, id_r)
        .repartition(n_score_parts)
        .withColumn("features", feats(F.col("_text_l"), F.col("_text_r")))
        .drop("_text_l", "_text_r")
        .select(
            id_l, id_r,
            F.col("features.jw_text").alias("jw_text"),
            F.col("features.lev_prefix").alias("lev_prefix"),
            F.col("features.soundex_eq").alias("soundex_eq"),
            F.col("features.token_jaccard").alias("token_jaccard"),
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
    return (
        F.when(F.size(vals) == 0, F.lit(None).cast("double"))
        .when(has_one & has_zero, F.lit(0.5))
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
