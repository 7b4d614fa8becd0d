"""Fellegi–Sunter EM linkage (zentity_spark.probabilistic).

The reference has no probabilistic scoring — its qualities are fixed
model knobs (Job.java:652-663). These tests pin the unsupervised
complement: EM parameter recovery on a planted-mixture contingency
table, the weight/posterior identities, the broadcast-join assignment
path, and clamp behavior on degenerate fields.
"""

import math
from itertools import product

import pytest

from zentity_spark.probabilistic import (
    EPS, em_fit, fellegi_sunter, pattern_weights,
)

K = 3
TRUE_LAM = 0.2
TRUE_M = [0.95, 0.9, 0.8]
TRUE_U = [0.05, 0.2, 0.3]


def _planted_counts(n=100_000):
    """Expected pattern counts of the exact two-class mixture — EM on
    the population table must recover the generating parameters."""
    counts = []
    for g in product((0, 1), repeat=K):
        pm, pu = TRUE_LAM, 1.0 - TRUE_LAM
        for j in range(K):
            pm *= TRUE_M[j] if g[j] else 1.0 - TRUE_M[j]
            pu *= TRUE_U[j] if g[j] else 1.0 - TRUE_U[j]
        counts.append((g, round(n * (pm + pu))))
    return counts


def test_em_recovers_planted_mixture():
    lam, m, u = em_fit(_planted_counts(), K, n_iters=200)
    assert abs(lam - TRUE_LAM) < 0.02
    for j in range(K):
        assert abs(m[j] - TRUE_M[j]) < 0.03, (j, m)
        assert abs(u[j] - TRUE_U[j]) < 0.03, (j, u)


def test_em_deterministic_and_order_independent():
    counts = _planted_counts()
    a = em_fit(counts, K, n_iters=25)
    b = em_fit(list(reversed(counts)), K, n_iters=25)
    assert a == b  # patterns are sorted internally


def test_em_clamps_degenerate_field():
    # field 0 never agrees anywhere: u and m both head to 0 → clamp,
    # and the downstream log2 must stay finite
    counts = [((0, 1), 50), ((0, 0), 950)]
    lam, m, u = em_fit(counts, 2, n_iters=50)
    assert m[0] >= EPS and u[0] >= EPS
    w = pattern_weights(lam, m, u)
    assert all(math.isfinite(v[0]) and math.isfinite(v[1]) for v in w.values())


def test_em_empty_raises():
    with pytest.raises(ValueError):
        em_fit([], 2)


def test_weight_posterior_identity():
    """match_probability == base-2 sigmoid of match_weight, and the
    weight is monotone in agreement count for informative fields."""
    lam, m, u = em_fit(_planted_counts(), K, n_iters=100)
    w = pattern_weights(lam, m, u)
    for g, (weight, prob) in w.items():
        sig = 1.0 / (1.0 + 2.0 ** (-weight))
        assert abs(prob - sig) < 1e-9, g
    assert w[(1, 1, 1)][0] > w[(1, 1, 0)][0] > w[(0, 0, 0)][0]
    assert w[(1, 1, 1)][1] > 0.9
    assert w[(0, 0, 0)][1] < 0.05


def test_fellegi_sunter_spark_assignment(spark):
    """The broadcast-join path assigns exactly the driver-computed
    weight of each pair's pattern."""
    rows = []
    pid = 0
    for g, c in _planted_counts(n=2000):
        for _ in range(max(1, c // 50)):
            rows.append((pid, pid + 1_000_000, *g))
            pid += 1
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, g1 int, g2 int, g3 int"
    )
    scored, params = fellegi_sunter(df, ["g1", "g2", "g3"], n_iters=25)
    expect = pattern_weights(params["lambda"], params["m"], params["u"])
    got = scored.collect()
    assert len(got) == len(rows)
    for r in got:
        w, p = expect[(r["g1"], r["g2"], r["g3"])]
        assert r["match_weight"] == pytest.approx(w, abs=1e-12)
        assert r["match_probability"] == pytest.approx(p, abs=1e-12)


def test_fellegi_sunter_separates_planted_duplicates(spark):
    """End-to-end on records: planted noisy duplicates vs random pairs.
    Duplicate pairs (agree on nearly all fields) must score near 1,
    unrelated pairs near the prior or below."""
    import random

    rng = random.Random(7)
    recs = []
    for e in range(300):
        base = (e % 5, e % 25, e % 10)
        recs.append((2 * e, *base))
        # duplicate copy: one field perturbed 10% of the time
        dup = list(base)
        if rng.random() < 0.1:
            dup[2] = (dup[2] + 1) % 10
        recs.append((2 * e + 1, *dup))
    pairs = []
    for e in range(300):
        pairs.append((2 * e, 2 * e + 1))  # true match
        o = rng.randrange(300)
        if o != e:
            pairs.append((2 * e, 2 * o + 1))  # random cross pair
    by_id = {r[0]: r[1:] for r in recs}
    rows = []
    for a, b in pairs:
        ga = by_id[a]
        gb = by_id[b]
        rows.append((a, b, *(int(x == y) for x, y in zip(ga, gb))))
    df = spark.createDataFrame(rows, "id_a long, id_b long, g1 int, g2 int, g3 int")
    scored, params = fellegi_sunter(df, ["g1", "g2", "g3"], n_iters=60)
    out = {(r["id_a"], r["id_b"]): r["match_probability"] for r in scored.collect()}
    true_probs = [out[(2 * e, 2 * e + 1)] for e in range(300)]
    # true matches: all-agree pairs must be confidently matched
    assert sum(p > 0.9 for p in true_probs) > 250
    rand_probs = [v for k, v in out.items() if k[1] - k[0] != 1]
    # unrelated pairs agree only by chance (fields have 5/25/10 values)
    assert sorted(rand_probs)[len(rand_probs) // 2] < 0.5
