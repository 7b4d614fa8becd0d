"""SimpleDateFormat parity (Term.java:61-74, Query.java:77-130,
Input.java:380-420) — parse/format/chain/validation matrix over the
format shapes the reference's models and JobTest date cases use."""

from __future__ import annotations

import pytest

from zentity_spark.compiler import compile_model
from zentity_spark.errors import ValidationException
from zentity_spark.java_dates import (
    format_java_date,
    parse_java_date,
    resolve_format_chain,
    validate_date_formats,
)
from zentity_spark.model import Model

EPOCH_Y2K = 946684800.0  # 2000-01-01T00:00:00Z


@pytest.mark.parametrize(
    "s,fmt,expect",
    [
        ("2000-01-01", "yyyy-MM-dd", EPOCH_Y2K),
        ("2000-01-01T00:00:00", "yyyy-MM-dd'T'HH:mm:ss", EPOCH_Y2K),
        ("2000-01-01T00:00:00.000", "yyyy-MM-dd'T'HH:mm:ss.SSS", EPOCH_Y2K),
        # literal-digit fraction (fixture format): '.0000' matches literally
        ("1999-12-31T23:59:57.0000", "yyyy-MM-dd'T'HH:mm:ss.0000", EPOCH_Y2K - 3),
        # SimpleDateFormat.parse accepts a matching PREFIX
        ("2000-01-01 and trailing text", "yyyy-MM-dd", EPOCH_Y2K),
        ("2000-01-01T00:00:00.123", "yyyy-MM-dd'T'HH:mm:ss.SSS", EPOCH_Y2K + 0.123),
        ("946684800000", "epoch_millis", EPOCH_Y2K),
        ("946684800", "epoch_second", EPOCH_Y2K),
        # 12-hour clock with AM/PM
        ("2000-01-01 12:00 AM", "yyyy-MM-dd hh:mm a", EPOCH_Y2K),
        ("2000-01-01 01:30 PM", "yyyy-MM-dd hh:mm a", EPOCH_Y2K + 13 * 3600 + 1800),
        # non-matches
        ("a_00", "yyyy-MM-dd", None),
        ("true", "yyyy-MM-dd", None),
        ("2000-13-01", "yyyy-MM-dd", None),       # non-lenient month
        ("2000-01-01T25:00:00", "yyyy-MM-dd'T'HH:mm:ss", None),
        ("1999-12-31T23:59:59.999", "yyyy-MM-dd'T'HH:mm:ss.0000", None),
    ],
)
def test_parse(s, fmt, expect):
    got = parse_java_date(s, fmt)
    if expect is None:
        assert got is None
    else:
        assert got == pytest.approx(expect, abs=1e-6)


@pytest.mark.parametrize(
    "epoch,fmt,expect",
    [
        (EPOCH_Y2K, "yyyy-MM-dd", "2000-01-01"),
        (EPOCH_Y2K, "yyyy-MM-dd'T'HH:mm:ss.0000", "2000-01-01T00:00:00.0000"),
        # real milliseconds DROPPED by a literal-digit pattern (the
        # script_fields truncation that makes extracted dates converge)
        (EPOCH_Y2K + 0.999, "yyyy-MM-dd'T'HH:mm:ss.0000", "2000-01-01T00:00:00.0000"),
        (EPOCH_Y2K + 0.123, "yyyy-MM-dd'T'HH:mm:ss.SSS", "2000-01-01T00:00:00.123"),
        (EPOCH_Y2K, "epoch_millis", "946684800000"),
        (EPOCH_Y2K + 13 * 3600, "yyyy-MM-dd hh:mm a", "2000-01-01 01:00 PM"),
    ],
)
def test_format(epoch, fmt, expect):
    assert format_java_date(epoch, fmt) == expect


def _date_model(attr_params=None, matcher_params=None):
    return Model(
        {
            "attributes": {
                "ts": {"type": "date", **({"params": attr_params} if attr_params else {})}
            },
            "resolvers": {"r": {"attributes": ["ts"]}},
            "matchers": {
                "rng": {
                    "clause": {"range": {"{{ field }}": {"gte": "{{ value }}||-{{ params.window }}",
                                                         "lte": "{{ value }}||+{{ params.window }}"}}},
                    "params": {"window": "1d", **(matcher_params or {})},
                }
            },
            "indices": {"idx": {"fields": {"f_ts": {"attribute": "ts", "matcher": "rng"}}}},
        }
    )


def test_format_chain_precedence():
    """Input.java:380-420 / Query.java:619-642: input > model-attribute >
    per-field matcher params."""
    m = _date_model(attr_params={"format": "yyyy-MM-dd"},
                    matcher_params={"format": "epoch_millis"})
    compiled = compile_model(m)
    assert resolve_format_chain("ts", compiled, {"ts": {"format": "yyyy"}}) == "yyyy"
    assert resolve_format_chain("ts", compiled, {}) == "yyyy-MM-dd"
    m2 = _date_model(matcher_params={"format": "epoch_millis"})
    assert resolve_format_chain("ts", compile_model(m2), {}) == "epoch_millis"


def test_validation_walk():
    """A date attribute with no format anywhere raises the reference's
    exact message."""
    compiled = compile_model(_date_model())
    with pytest.raises(ValidationException, match="is a 'date' which required a 'format'"):
        validate_date_formats(compiled, {})
    # 'null' and '' don't count as a format (Input.java checks)
    compiled2 = compile_model(_date_model(attr_params={"format": "null"}))
    with pytest.raises(ValidationException):
        validate_date_formats(compiled2, {})
    validate_date_formats(compiled, {"ts": {"format": "yyyy-MM-dd"}})  # ok


def test_unsupported_letter_falls_back():
    assert parse_java_date("2000-01-01", "yyyy-MM-dd zzz") is None


def test_spark_side_epoch_millis_values(spark):
    """values_from_parsed parses date fields through the field's declared
    format — including the non-pattern formats epoch_millis/epoch_second
    — before the trial chain (compiler.date_fmt → transcripts ts)."""
    from zentity_spark.transcripts import build_values

    m = _date_model(matcher_params={"format": "epoch_millis"})
    rows = [
        ("idx/1", 0, "user", "f_ts=946684800000", None, None),
        ("idx/2", 0, "user", "f_ts=946684801500", None, None),
        ("idx/3", 0, "user", "f_ts=notadate", None, None),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    values = build_values(spark, turns, compile_model(m))
    got = {r["record_id"]: r["ts"] for r in values.collect()}
    assert got["idx/1"] == pytest.approx(EPOCH_Y2K)
    assert got["idx/2"] == pytest.approx(EPOCH_Y2K + 1.5)
    assert got["idx/3"] is None  # unparseable → null ts, value kept


def test_spark_side_literal_digit_format(spark):
    """The fixture's literal-digit pattern parses via try_to_timestamp
    (digits are literal in DateTimeFormatter too)."""
    from zentity_spark.transcripts import build_values

    m = _date_model(matcher_params={"format": "yyyy-MM-dd'T'HH:mm:ss.0000"})
    turns = spark.createDataFrame(
        [("idx/1", 0, "user", "f_ts=1999-12-31T23:59:57.0000", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    values = build_values(spark, turns, compile_model(m))
    [r] = values.collect()
    assert r["ts"] == pytest.approx(EPOCH_Y2K - 3)


# ----------------------------------------------------------------------
# Differential golden vectors, captured from real java.text.SimpleDateFormat
# (OpenJDK 17, UTC, setLenient(false)) on 2026-08-17 — the authoritative
# behavior the reference delegates to (Term.java:61-74, Query.java:77-130).

JAVA_PARSE_GOLDEN = [
    ("1999-12-31T23:59:57.000", "yyyy-MM-dd'T'HH:mm:ss.SSS", 946684797000),
    ("1999-12-31T23:59:57.123abc", "yyyy-MM-dd'T'HH:mm:ss.SSS", 946684797123),
    ("2000-2-3", "yyyy-MM-dd", 949536000000),       # greedy non-adjacent numerics
    ("20000203", "yyyyMMdd", 949536000000),         # adjacent-numeric fixed widths
    ("200023", "yyyyMMdd", None),
    ("2000-13-01", "yyyy-MM-dd", None),             # non-lenient month
    ("2000-12-32", "yyyy-MM-dd", None),
    ("2001-02-29", "yyyy-MM-dd", None),             # non-leap Feb 29
    ("12/31/1999 11:59 PM", "MM/dd/yyyy hh:mm a", 946684740000),
    ("12/31/1999 12:00 AM", "MM/dd/yyyy hh:mm a", 946598400000),  # 12 AM = 00
    ("12/31/1999 12:00 PM", "MM/dd/yyyy hh:mm a", 946641600000),  # 12 PM = 12
    ("12/31/1999 00:00 AM", "MM/dd/yyyy hh:mm a", None),          # h is 1-12
    ("2000-01-01 garbage", "yyyy-MM-dd", 946684800000),  # prefix parse
    ("2000-01-01", "yyyy-MM-dd HH:mm:ss", None),         # truncated input
    ("1999365", "yyyyDDD", 946598400000),                # day-of-year
]

JAVA_FORMAT_GOLDEN = [
    (946684799123, "yyyy-MM-dd'T'HH:mm:ss.SSS", "1999-12-31T23:59:59.123"),
    (946684799123, "yyyy-MM-dd'T'HH:mm:ss'.0000'", "1999-12-31T23:59:59.0000"),
    (946684799123, "yy-M-d H:m:s", "99-12-31 23:59:59"),
    (946684799123, "MM/dd/yyyy hh:mm a", "12/31/1999 11:59 PM"),
    (946684799123, "yyyyyy-MM-dd", "001999-12-31"),   # width-padded year
    (63113904000000, "yyyy-MM-dd", "3970-01-01"),
    (946684799123, "S", "123"),
    (946684799123, "SSSSS", "00123"),
    (0, "G yyyy", "AD 1970"),
]


@pytest.mark.parametrize("s,fmt,expect_ms", JAVA_PARSE_GOLDEN)
def test_java_differential_parse(s, fmt, expect_ms):
    got = parse_java_date(s, fmt)
    if expect_ms is None:
        assert got is None
    else:
        assert got is not None and int(round(got * 1000)) == expect_ms


@pytest.mark.parametrize("ms,fmt,expect", JAVA_FORMAT_GOLDEN)
def test_java_differential_format(ms, fmt, expect):
    assert format_java_date(ms / 1000.0, fmt) == expect


def test_two_digit_year_window():
    """SimpleDateFormat maps an exactly-two-digit year into the
    [now-80y, now+20y] window (Java verified: '99-06-15' → 1999-06-15).
    Window edges computed dynamically so the test outlives the decade."""
    import datetime as _dt

    now_year = _dt.datetime.now(_dt.timezone.utc).year
    for yy in (0, 45, 46, 99):
        got = parse_java_date(f"{yy:02d}-06-15", "yy-MM-dd")
        assert got is not None
        y = _dt.datetime.fromtimestamp(got, _dt.timezone.utc).year
        assert now_year - 80 <= y <= now_year + 20
        assert y % 100 == yy
    # four digits against 'yy' parse literally (greedy), no windowing
    got = parse_java_date("1999-06-15", "yy-MM-dd")
    y = __import__("datetime").datetime.fromtimestamp(
        got, __import__("datetime").timezone.utc).year
    assert y == 1999


def test_declared_format_ts_branches(spark):
    """Spark-side F3 chain (transcripts.declared_format_ts): the
    epoch_second branch and the trial-chain fallback when the declared
    format does not match the raw string — neither is exercised by the
    date_parse_chain contract query (which covers declared patterns,
    epoch_millis, and no-format trial parsing)."""
    from pyspark.sql import functions as F

    from zentity_spark.transcripts import declared_format_ts

    df = spark.createDataFrame(
        [
            ("864777600", "epoch_second", 864777600.0),
            # declared format wrong for the raw string -> trial chain
            ("1997-05-28 00:00:00", "MM/dd/yyyy", 864777600.0),
            ("not a date", None, None),
        ],
        "raw string, fmt string, expect double",
    )
    rows = df.select(
        "expect", declared_format_ts(F.col("raw"), F.col("fmt")).alias("ts")
    ).collect()
    for r in rows:
        if r["expect"] is None:
            assert r["ts"] is None
        else:
            assert abs(r["ts"] - r["expect"]) < 1e-6
