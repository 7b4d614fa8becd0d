"""Fellegi–Sunter probabilistic record linkage with EM-estimated
parameters (Fellegi & Sunter 1969, JASA 64:1183-1210; the architecture
popularized by Splink).

The reference scores candidate pairs with FIXED model-declared
qualities (Job.java:652-663 — attribute/matcher/field quality knobs the
user sets by hand). Fellegi–Sunter is the standard UNSUPERVISED
complement: per-pair agreement patterns (gamma vectors) over K
comparison fields, match/non-match conditional agreement probabilities
(m_k = P(agree_k | match), u_k = P(agree_k | non-match)) and the match
prior (lambda) estimated by expectation-maximization over the pattern
contingency table, per-pair match weight = the log2 likelihood ratio.

Spark-first split (this is what makes the method 100 TB-safe):

- the O(pairs) work — computing gamma columns and assigning the final
  weight/probability — stays in JVM column expressions end to end;
- EM itself runs on the DRIVER over the aggregated pattern contingency
  table: `groupBy(gammas).count()` collapses any number of pairs into
  at most 2^K rows (K is small — Splink models rarely exceed ~15
  comparisons; here the collected table is bounded by 2^K, not the
  data), so iterating distributed jobs for a 16-row fixpoint would be
  pure scheduling overhead;
- the learned per-pattern weights return to the pairs as a BROADCAST
  join on the gamma tuple (a ≤2^K-row dim table): zero extra shuffle.

Determinism: patterns are iterated in sorted order, parameters are
clamped to [EPS, 1-EPS] each M-step (a field that never agrees in one
class would otherwise drive a log2 to -inf), and every arithmetic step
mirrors the unrolled-CTE DuckDB oracle (entry_queries.SQL for
`fellegi_sunter`) term-for-term, left-to-right.
"""

from __future__ import annotations

import math
from itertools import product

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS = 1e-6


def _clamp(x: float) -> float:
    return min(max(x, EPS), 1.0 - EPS)


def em_fit(pattern_counts, k: int, n_iters: int = 15,
           lam0: float = 0.1, m0: float = 0.9, u0: float = 0.1):
    """EM over the agreement-pattern contingency table.

    pattern_counts: iterable of (gamma_tuple, count) where gamma_tuple
    is a tuple of K ints in {0,1}. Returns (lambda, m[K], u[K]) after
    exactly n_iters iterations (fixed count, not a convergence test, so
    the result is reproducible across engines — the DuckDB oracle
    replays the identical unrolled recurrence).
    """
    pats = sorted((tuple(int(g) for g in gs), int(c)) for gs, c in pattern_counts)
    if not pats:
        raise ValueError("em_fit: empty pattern table")
    lam, m, u = lam0, [m0] * k, [u0] * k
    total = sum(c for _, c in pats)
    for _ in range(n_iters):
        sum_p = 0.0
        sum_q = 0.0
        sum_m = [0.0] * k
        sum_u = [0.0] * k
        for g, c in pats:
            pm = lam
            pu = 1.0 - lam
            for j in range(k):
                pm *= m[j] if g[j] else (1.0 - m[j])
                pu *= u[j] if g[j] else (1.0 - u[j])
            post = pm / (pm + pu)
            sum_p += c * post
            sum_q += c * (1.0 - post)
            for j in range(k):
                if g[j]:
                    sum_m[j] += c * post
                    sum_u[j] += c * (1.0 - post)
        lam = _clamp(sum_p / total)
        m = [_clamp(sum_m[j] / sum_p) for j in range(k)]
        u = [_clamp(sum_u[j] / sum_q) for j in range(k)]
    return lam, m, u


def pattern_weights(lam: float, m: list, u: list):
    """All 2^K patterns → (match_weight, match_probability).

    match_weight = log2(lam/(1-lam)) + Σ_k log2(m_k/u_k) if agree else
    log2((1-m_k)/(1-u_k)); match_probability is the exact posterior
    lam·Πm / (lam·Πm + (1-lam)·Πu) (= sigmoid of the weight in base 2,
    computed in product form to match the oracle bit-for-bit)."""
    k = len(m)
    out = {}
    prior_w = math.log2(lam / (1.0 - lam))
    for g in product((0, 1), repeat=k):
        w = prior_w
        pm = lam
        pu = 1.0 - lam
        for j in range(k):
            if g[j]:
                w += math.log2(m[j] / u[j])
                pm *= m[j]
                pu *= u[j]
            else:
                w += math.log2((1.0 - m[j]) / (1.0 - u[j]))
                pm *= 1.0 - m[j]
                pu *= 1.0 - u[j]
        out[g] = (w, pm / (pm + pu))
    return out


def term_frequency_adjustment(pairs: DataFrame, val_a: str, val_b: str,
                              m_k: float, u_k: float,
                              tf_source: DataFrame | None = None,
                              tf_col: str | None = None) -> DataFrame:
    """Term-frequency-adjusted agreement weights (the standard FS
    refinement popularized by Splink's term_frequency_adjustments;
    Winkler 1989's value-specific u-probabilities).

    A generic u_k = P(agree_k | non-match) treats agreement on "JOHN"
    and on "ZEBEDIAH" as equal evidence, but the chance two NON-matching
    records agree on value v is ≈ the relative frequency tf(v) of v in
    the population. For an agreeing pair on value v the adjusted
    agreement weight is therefore log2(m_k / tf(v)) — rarer values carry
    MORE evidence; disagreeing pairs keep the generic
    log2((1-m_k)/(1-u_k)).

    pairs must carry the two sides' field values as columns `val_a`,
    `val_b` (NULL-safe equality decides agreement). tf(v) comes from
    `tf_source[tf_col]` when given (the RECORDS population — Splink's
    convention), else from the pair sides unioned. Either way it's one
    value-keyed aggregation bounded by the vocabulary, joined back by
    value: no per-row Python, no extra shuffle beyond the tf groupBy +
    one hash join on the (small, broadcastable) frequency table.

    Returns pairs + (agree int, tf double, base_weight double,
    tf_adj_weight double), weights rounded to 6dp so the arithmetic is
    engine-portable (same convention as the cosine oracles)."""
    if tf_source is not None:
        vals = tf_source.select(F.col(tf_col).alias("_v"))
    else:
        vals = pairs.select(F.col(val_a).alias("_v")).unionAll(
            pairs.select(F.col(val_b).alias("_v"))
        )
    tf = (
        vals.groupBy("_v")
        .agg(F.count("*").alias("_c"))
        .crossJoin(F.broadcast(vals.agg(F.count("*").alias("_n"))))
        .select(
            "_v",
            F.greatest(F.col("_c") / F.col("_n"), F.lit(EPS)).alias("_tf"),
        )
    )
    agree = F.col(val_a).eqNullSafe(F.col(val_b))
    base_w = F.when(
        agree, F.lit(math.log2(m_k / u_k))
    ).otherwise(F.lit(math.log2((1.0 - m_k) / (1.0 - u_k))))
    # fall back to the GENERIC agreement weight when no tf is known for
    # the agreeing value: a value absent from tf_source (newer batch
    # than the reference population) or a NULL≡NULL agreement (eqNullSafe
    # says agree, but the value join finds nothing) must not poison the
    # pair's weight sum with NULL — no tf evidence means no adjustment,
    # not a dropped pair
    adj_w = F.when(
        agree & F.col("_tf").isNotNull(),
        F.log2(F.lit(float(m_k)) / F.col("_tf")),
    ).otherwise(base_w)
    return (
        pairs.join(F.broadcast(tf), pairs[val_a] == tf["_v"], "left")
        .withColumn("agree", agree.cast("int"))
        .withColumn("tf", F.when(agree, F.round(F.col("_tf"), 6)))
        .withColumn("base_weight", F.round(base_w, 6))
        .withColumn("tf_adj_weight", F.round(adj_w, 6))
        .drop("_v", "_tf")
    )


def fellegi_sunter(pairs: DataFrame, gamma_cols: list[str],
                   n_iters: int = 15, lam0: float = 0.1,
                   m0: float = 0.9, u0: float = 0.1):
    """Score candidate pairs with EM-fitted Fellegi–Sunter weights.

    pairs must carry integer 0/1 agreement columns `gamma_cols`
    (computed upstream as JVM expressions). Returns (scored, params):
    scored = pairs + (match_weight double, match_probability double);
    params = {"lambda", "m", "u"} for inspection/persistence.

    One aggregation shuffle (the contingency table), one driver EM over
    ≤2^K rows, one broadcast join back. No per-row Python anywhere.
    """
    counts = (
        pairs.groupBy(*gamma_cols)
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    k = len(gamma_cols)
    pattern_counts = [
        (tuple(int(r[g]) for g in gamma_cols), int(r["cnt"])) for r in counts
    ]
    lam, m, u = em_fit(pattern_counts, k, n_iters=n_iters,
                       lam0=lam0, m0=m0, u0=u0)
    weights = pattern_weights(lam, m, u)
    spark = pairs.sparkSession
    dim = spark.createDataFrame(
        [tuple(g) + (w, p) for g, (w, p) in sorted(weights.items())],
        ", ".join(f"{c} int" for c in gamma_cols)
        + ", match_weight double, match_probability double",
    )
    scored = pairs.join(F.broadcast(dim), on=list(gamma_cols), how="left")
    return scored, {"lambda": lam, "m": m, "u": u}
