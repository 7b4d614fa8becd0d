"""Score-math vectors ported from the reference unit tests
(JobTest.java:1111-1239) — asserted to 1e-10 exactly as the reference does."""

import pytest

from zentity_spark.scoring import (
    attribute_identity_confidence_score as attr_score,
    composite_identity_confidence_score as comp_score,
)

TOL = 1e-10


# JobTest.java:1111-1143 testCalculateAttributeIdentityConfidenceScore
@pytest.mark.parametrize(
    "base,mq,fq,expected",
    [
        (0.75, 1.00, 1.00, 0.75),
        (0.75, 1.00, 0.00, 0.50),
        (0.75, 0.90, 0.00, 0.50),
        (0.75, 0.00, 0.00, 0.50),
        (0.75, 0.90, 0.80, 0.68),
        (0.75, 0.80, 0.90, 0.68),
        (0.75, 0.90, None, 0.725),
        (0.75, None, 0.8, 0.70),
        (0.75, None, None, 0.75),
        (0.75, 0.625, 0.99, 0.6546875),
        (0.87, 0.817, 0.93, 0.7811297),
    ],
)
def test_attribute_score_vectors(base, mq, fq, expected):
    assert attr_score(base, mq, fq) == pytest.approx(expected, abs=TOL)


@pytest.mark.parametrize("mq,fq", [(0.9, 0.8), (0.9, None), (None, 0.8), (None, None)])
def test_attribute_score_null_base(mq, fq):
    assert attr_score(None, mq, fq) is None


# JobTest.java:1145-1239 testCalculateCompositeIdentityConfidenceScore
@pytest.mark.parametrize(
    "scores,expected",
    [
        ([0.75, 1.00], 1.00000000000),
        ([0.55, 0.65, 0.75], 0.87195121951),
        ([0.55, 0.65, 0.75, 0.50], 0.87195121951),
        ([0.55, 0.65, 0.75, None], 0.87195121951),
        ([0.75, 0.00], 0.00000000000),
        ([0.75, 1.00, 0.00], 0.50000000000),  # NaN guard
        ([0.55, 0.75, 0.65], 0.87195121951),
        ([0.65, 0.55, 0.75], 0.87195121951),
        ([0.65, 0.75, 0.55], 0.87195121951),
        ([0.75, 0.65, 0.55], 0.87195121951),
        ([0.75, 0.55, 0.65], 0.87195121951),
        ([0.75, 0.95], 0.98275862069),
        ([0.75, 0.85], 0.94444444444),
    ],
)
def test_composite_score_vectors(scores, expected):
    assert comp_score(scores) == pytest.approx(expected, abs=TOL)


def test_composite_score_empty_and_null():
    assert comp_score([]) is None
    assert comp_score([None, None]) is None


def test_spark_composite_score_cols(spark):
    """The Spark Column forms must agree with the scalar reference math."""
    from pyspark.sql import functions as F

    from zentity_spark.scoring import composite_score_col, composite_score_log_space

    vectors = [
        [0.75, 1.00],
        [0.55, 0.65, 0.75],
        [0.55, 0.65, 0.75, 0.50],
        [0.55, 0.65, 0.75, None],
        [0.75, 0.00],
        [0.75, 1.00, 0.00],
        [0.75, 0.95],
        [0.75, 0.85],
        [],
        [None, None],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vectors)], "i int, scores array<double>"
    )
    rows = (
        df.select(
            "i",
            composite_score_col(F.col("scores")).alias("direct"),
            composite_score_log_space(F.col("scores")).alias("logspace"),
        )
        .orderBy("i")
        .collect()
    )
    for row, vec in zip(rows, vectors):
        expected = comp_score(vec)
        if expected is None:
            assert row.direct is None and row.logspace is None
        else:
            assert row.direct == pytest.approx(expected, abs=TOL)
            assert row.logspace == pytest.approx(expected, abs=1e-9)


def test_attribute_score_col_matches_scalar(spark):
    """The JVM Column form of A4 must agree with the reference-exact
    Python scalar form across the JobTest vector grid (incl. null
    qualities, the 0.0 short-circuit, and base 0.0)."""
    from pyspark.sql import functions as F

    from zentity_spark.scoring import attribute_score_col

    cases = [
        (0.75, 1.00, 1.00), (0.75, 1.00, 0.00), (0.75, 0.90, 0.00),
        (0.75, 0.00, 0.00), (0.75, 0.90, 0.80), (0.75, 0.80, 0.90),
        (0.75, 0.90, None), (0.75, None, 0.8), (0.75, None, None),
        (0.75, 0.625, 0.99), (0.87, 0.817, 0.93), (0.0, 0.9, 0.8),
        (1.0, 0.5, None), (0.5, 0.5, 0.5),
    ]
    df = spark.createDataFrame(
        [(i, b, m, f) for i, (b, m, f) in enumerate(cases)],
        "i int, base double, mq double, fq double",
    )
    rows = (
        df.select(
            "i",
            attribute_score_col(F.col("base"), F.col("mq"), F.col("fq")).alias("s"),
        )
        .orderBy("i")
        .collect()
    )
    for row, (b, m, f) in zip(rows, cases):
        assert row.s == pytest.approx(attr_score(b, m, f), abs=TOL)
