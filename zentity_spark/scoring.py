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
# Spark Column forms (vectorized, JVM-side — no Python in the hot path)

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
