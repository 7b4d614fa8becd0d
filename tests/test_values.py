"""Canonical value serialization semantics (reference:
io.zentity.resolution.input.value.*)."""

import pytest

from zentity_spark.errors import ValidationException
from zentity_spark.values import dedupe_sorted, serialize_value


def test_boolean_serialization():
    # BooleanValue.java:126-130
    assert serialize_value(True, "boolean") == "true"
    assert serialize_value(False, "boolean") == "false"
    assert serialize_value(None, "boolean") == "null"


def test_boolean_type_check():
    with pytest.raises(ValidationException):
        serialize_value("true", "boolean")


def test_number_integral_serialization():
    # NumberValue.java:40-41: integral via BigInteger → plain digits
    assert serialize_value(1, "number") == "1"
    assert serialize_value(-922337203685477, "number") == "-922337203685477"
    assert serialize_value(92233720368547758080000, "number") == "92233720368547758080000"


def test_number_floating_serialization():
    # NumberValue.java:42-43: String.valueOf(double)
    assert serialize_value(3.141592653589793, "number") == "3.141592653589793"
    assert serialize_value(-3.141592653589793, "number") == "-3.141592653589793"
    assert serialize_value(1.0, "number") == "1.0"  # JSON float literal keeps .0
    assert serialize_value(-1.0, "number") == "-1.0"
    assert serialize_value(None, "number") == "null"


def test_number_type_check():
    with pytest.raises(ValidationException):
        serialize_value("1", "number")
    with pytest.raises(ValidationException):
        serialize_value(True, "number")


def test_string_and_date_serialization():
    # StringValue.java:181-196; DateValue extends StringValue (DateValue.java:82)
    assert serialize_value("a_00", "string") == "a_00"
    assert serialize_value("1999-12-31T23:59:57.000", "date") == "1999-12-31T23:59:57.000"
    assert serialize_value(None, "string") == "null"


def test_string_type_check():
    with pytest.raises(ValidationException):
        serialize_value(1, "string")


def test_dedupe_sorted_treeset_semantics():
    # Value.java:85-98: dedupe + order on serialized form
    assert dedupe_sorted(["b", "a", "b", "a"]) == ["a", "b"]
