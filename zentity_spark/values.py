"""Typed attribute values and their canonical string serialization.

Port of the semantics of io.zentity.resolution.input.value.* (reference:
src/main/java/io/zentity/resolution/input/value/):

- four scalar types only: boolean, date, number, string
  (Value.java:48-61 `create` factory);
- values compare/dedupe on their SERIALIZED string form
  (Value.java:85-98: compareTo/equals/hashCode over `serialized`);
- nulls serialize as "null" (BooleanValue.java:127-128,
  NumberValue.java:38-39, StringValue semantics);
- number serialization distinguishes integral (BigInteger → plain integer
  string, NumberValue.java:40-41) from floating (Java
  `String.valueOf(double)`, NumberValue.java:42-43);
- date is a STRING subtype (DateValue.java:82 `extends StringValue`) —
  date semantics (format, window) live entirely in the matcher params.

Deterministic ordering everywhere (reference CONTRIBUTING.md "Software
design choices": TreeMap/TreeSet): value sets here are sorted by
serialized form.
"""

from __future__ import annotations

import math
import struct
from typing import Any

from zentity_spark.errors import ValidationException

VALUE_TYPES = ("boolean", "date", "number", "string")


def _java_double_to_string(x: float) -> str:
    """Replicate Java's String.valueOf(double) for the values that appear
    in practice (finite doubles; reference NumberValue.java:42-43).

    Java prints the shortest decimal that round-trips, with at least one
    digit after the point, and uses scientific notation outside
    [1e-3, 1e7). Python's repr() matches the shortest-roundtrip rule; we
    adjust the exponent-form and integral-form edges.
    """
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == 0.0:
        return repr(x)  # '0.0' / '-0.0', both Java forms
    ax = abs(x)
    if 1e-3 <= ax < 1e7:
        # Java plain zone; Python repr is plain decimal here too
        s = repr(x)
        if "." not in s:
            s += ".0"
        return s
    # Java scientific form d.dddEn (no '+' on the exponent). Derive the
    # mantissa from repr's SHORTEST-ROUNDTRIP digits — re-rounding a
    # fixed-width %e mantissa was a hypothesis-found off-by-one-ulp bug.
    sign = "-" if x < 0 else ""
    s = repr(ax)
    if "e" in s:
        mant, _, exp = s.partition("e")
        e = int(exp)
        if "." not in mant:
            mant += ".0"
    else:
        ip, _, fp = s.partition(".")
        digits = ip + fp
        stripped = digits.lstrip("0")
        lead_zeros = len(digits) - len(stripped)
        e = len(ip) - lead_zeros - 1
        rest = stripped[1:].rstrip("0") or "0"
        mant = stripped[0] + "." + rest
    return f"{sign}{mant}E{e}"


def serialize_value(value: Any, attr_type: str = "string") -> str:
    """Canonical serialization of one attribute value.

    Equality, dedup, and blocking keys all operate on this form, exactly
    as the reference compares Value.serialized (Value.java:85-98).
    """
    if attr_type not in VALUE_TYPES:
        raise ValidationException(f"'{attr_type}' is not a recognized attribute data type.")
    if value is None:
        return "null"
    if attr_type == "boolean":
        if isinstance(value, bool):
            return "true" if value else "false"
        raise ValidationException("Expected 'boolean' attribute data type.")
    if attr_type == "number":
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise ValidationException("Expected 'number' attribute data type.")
        if isinstance(value, int):
            return str(value)
        if float(value).is_integer() and _came_from_integral(value):
            return str(int(value))
        return _java_double_to_string(float(value))
    # string and date (DateValue extends StringValue)
    if isinstance(value, (bool, int, float)):
        raise ValidationException(f"Expected '{attr_type}' attribute data type.")
    return str(value)


def _came_from_integral(value: float) -> bool:
    """JSON parsing note: the reference receives values as JsonNode and
    branches on isIntegralNumber (NumberValue.java:40). Python's json
    module already yields int for integral literals, so a float here came
    from a floating literal and keeps double serialization (e.g. 1.0)."""
    return False


def validate_value(value: Any, attr_type: str) -> None:
    """Type check, mirroring *Value.validate (e.g. NumberValue.java:55-58
    message 'Expected 'number' attribute data type.')."""
    serialize_value(value, attr_type)


def value_sort_key(serialized: str) -> str:
    """Values order by serialized form (Value.java:85-87)."""
    return serialized


def dedupe_sorted(values: list[str]) -> list[str]:
    """TreeSet semantics: dedupe + sort by serialized form."""
    return sorted(set(values))


def double_bits(x: float) -> int:
    """Bit pattern of a double — used in tests asserting bit-parity of
    score math with the reference's 1e-10 assertions."""
    return struct.unpack("<q", struct.pack("<d", x))[0]
