"""Java SimpleDateFormat semantics for date attributes.

The reference normalizes every date it touches through
`SimpleDateFormat(params.format)` in UTC:

- term trial-parse: Term.java:61-74 `isDate` — non-lenient field
  values, but SimpleDateFormat.parse accepts a matching PREFIX and
  ignores trailing text;
- query-time doc reformatting: Query.java:77-130 script_fields run
  `new SimpleDateFormat(params.format).format(doc[field].value)` — the
  hit's field value (and therefore every extracted/hop-relayed date and
  every `target_value` in the explanation) is the doc's instant
  RE-PRINTED through the format, digits in the pattern being literal
  characters (".0000" prints literally, dropping real milliseconds);
- format availability: Input.java:380-420 walks input-attribute >
  model-attribute > per-field matcher params and raises when a date
  attribute has no format anywhere.

This module implements the pattern subset that appears in entity
models (G y M d H h m s S a, quoted literals, literal digits and
punctuation) plus the Elasticsearch convenience formats epoch_millis /
epoch_second. Unsupported pattern letters raise ValueError so callers
can fall back to trial parsing rather than silently mis-parse.
"""

from __future__ import annotations

import datetime

_NUMERIC = {"y": 4, "M": 2, "d": 2, "H": 2, "h": 2, "m": 2, "s": 2, "S": 3, "D": 3}
_SUPPORTED = set(_NUMERIC) | {"a", "G"}
_UTC = datetime.timezone.utc


def _tokenize(fmt: str) -> list[tuple[str, str]]:
    """→ [(kind, payload)]: kind 'field' (run of one pattern letter) or
    'lit' (literal text, quotes resolved)."""
    out: list[tuple[str, str]] = []
    i = 0
    n = len(fmt)
    while i < n:
        c = fmt[i]
        if c == "'":
            j = i + 1
            lit = []
            while j < n:
                if fmt[j] == "'":
                    if j + 1 < n and fmt[j + 1] == "'":
                        lit.append("'")
                        j += 2
                        continue
                    break
                lit.append(fmt[j])
                j += 1
            if not lit:  # '' is an escaped quote
                lit = ["'"] if j < n and i + 1 == j else lit
            out.append(("lit", "".join(lit) if lit else "'"))
            i = j + 1
        elif c.isalpha():
            j = i
            while j < n and fmt[j] == c:
                j += 1
            if c not in _SUPPORTED:
                raise ValueError(f"unsupported SimpleDateFormat letter [{c}]")
            out.append(("field", fmt[i:j]))
            i = j
        else:
            j = i
            while j < n and not fmt[j].isalpha() and fmt[j] != "'":
                j += 1
            out.append(("lit", fmt[i:j]))
            i = j
    return out


def parse_java_date(s: str, fmt: str) -> float | None:
    """SimpleDateFormat-style parse → epoch seconds (UTC), or None when
    the string doesn't match. Prefix semantics: trailing text after the
    pattern is ignored (SimpleDateFormat.parse(String)). Non-lenient
    field validation (setLenient(false))."""
    if fmt == "epoch_millis":
        try:
            return int(s) / 1000.0
        except ValueError:
            return None
    if fmt == "epoch_second":
        try:
            return float(int(s))
        except ValueError:
            return None
    try:
        tokens = _tokenize(fmt)
    except ValueError:
        return None
    fields: dict[str, int] = {}
    pos = 0
    n = len(s)
    for idx, (kind, payload) in enumerate(tokens):
        if kind == "lit":
            if not s.startswith(payload, pos):
                return None
            pos += len(payload)
            continue
        letter = payload[0]
        # numeric run: greedy unless the NEXT token is also numeric
        # (SimpleDateFormat's adjacent-numeric rule) — then take exactly
        # len(payload) digits
        next_numeric = (
            idx + 1 < len(tokens)
            and tokens[idx + 1][0] == "field"
            and tokens[idx + 1][1][0] in _NUMERIC
        )
        if letter == "a":
            for mark, val in (("AM", 0), ("PM", 1)):
                if s[pos:pos + 2].upper() == mark:
                    fields["a"] = val
                    pos += 2
                    break
            else:
                return None
            continue
        if letter == "G":
            if s[pos:pos + 2].upper() != "AD":
                return None
            pos += 2
            continue
        j = pos
        if next_numeric:
            j = pos + len(payload)
            if j > n or not s[pos:j].isdigit():
                return None
        else:
            while j < n and s[j].isdigit():
                j += 1
            if j == pos:
                return None
        val = int(s[pos:j])
        if letter == "y" and len(payload) <= 2 and j - pos == 2:
            # SimpleDateFormat two-digit-year window: exactly two digits
            # against a 'y'/'yy' pattern resolve to [now-80y, now+20y]
            # (GregorianCalendar default century window; the reference
            # constructs its SDF at query time, so "now" is run time)
            now_year = datetime.datetime.now(_UTC).year
            start = now_year - 80
            val = start + (val - start % 100) % 100
        fields[letter] = val
        pos = j
    # non-lenient range checks + calendar assembly
    year = fields.get("y", 1970)
    month = fields.get("M", 1)
    day = fields.get("d", 1)
    if "D" in fields and "M" not in fields and "d" not in fields:
        doy = fields["D"]
        leap = year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)
        if not (1 <= doy <= (366 if leap else 365)):
            return None
        d0 = datetime.date(year, 1, 1) + datetime.timedelta(days=doy - 1)
        month, day = d0.month, d0.day
    hour = fields.get("H", 0)
    if "h" in fields:
        h12 = fields["h"]
        if not (1 <= h12 <= 12):
            return None
        hour = (h12 % 12) + (12 if fields.get("a", 0) else 0)
    minute = fields.get("m", 0)
    second = fields.get("s", 0)
    # 'S' is the MILLISECOND field (a count, not a decimal fraction)
    millis = fields.get("S", 0)
    if not (1 <= month <= 12) or not (0 <= hour <= 23):
        return None
    if not (0 <= minute <= 59) or not (0 <= second <= 59) or millis > 999:
        return None
    try:
        dt = datetime.datetime(year, month, day, hour, minute, second,
                               millis * 1000, tzinfo=_UTC)
    except ValueError:
        return None
    return dt.timestamp()


def format_java_date(epoch_secs: float, fmt: str) -> str:
    """SimpleDateFormat.format in UTC — the script_fields reformat
    (Query.java:77-130). Literal digits in the pattern print literally
    (e.g. '.0000'), real sub-second precision beyond the pattern is
    dropped, exactly like Java."""
    if fmt == "epoch_millis":
        return str(int(round(epoch_secs * 1000)))
    if fmt == "epoch_second":
        return str(int(epoch_secs))
    dt = datetime.datetime.fromtimestamp(epoch_secs, tz=_UTC)
    out: list[str] = []
    for kind, payload in _tokenize(fmt):
        if kind == "lit":
            out.append(payload)
            continue
        letter = payload[0]
        width = len(payload)
        if letter == "y":
            out.append(str(dt.year).zfill(width if width != 2 else 2)[-2:]
                       if width == 2 else str(dt.year).zfill(width))
        elif letter == "M":
            out.append(str(dt.month).zfill(width))
        elif letter == "d":
            out.append(str(dt.day).zfill(width))
        elif letter == "H":
            out.append(str(dt.hour).zfill(width))
        elif letter == "h":
            out.append(str((dt.hour % 12) or 12).zfill(width))
        elif letter == "m":
            out.append(str(dt.minute).zfill(width))
        elif letter == "s":
            out.append(str(dt.second).zfill(width))
        elif letter == "S":
            out.append(str(dt.microsecond // 1000).zfill(width))
        elif letter == "D":
            out.append(str(dt.timetuple().tm_yday).zfill(width))
        elif letter == "a":
            out.append("PM" if dt.hour >= 12 else "AM")
        elif letter == "G":
            out.append("AD")
    return "".join(out)


def resolve_format_chain(attribute: str, compiled, input_params: dict | None,
                         index: str | None = None,
                         field: str | None = None) -> str | None:
    """Format availability chain (Input.java:380-420, Query.java:619-642):
    input-attribute params > model-attribute params > the matcher params
    of the index field (the specific field when given, else any field of
    the attribute)."""

    def usable(p):
        f = (p or {}).get("format")
        return f if f not in (None, "", "null") else None

    got = usable((input_params or {}).get(attribute))
    if got:
        return got
    attr = compiled.model.attributes.get(attribute)
    if attr is not None:
        got = usable(attr.params)
        if got:
            return got
    for fs in compiled.field_specs:
        if fs.attribute != attribute:
            continue
        if index is not None and fs.index != index:
            continue
        if field is not None and fs.field != field:
            continue
        m = compiled.model.matchers.get(fs.matcher)
        if m is not None:
            got = usable(m.params)
            if got:
                return got
    return None


def validate_date_formats(compiled, input_params: dict | None) -> None:
    """Input.java:380-420: every date attribute with index fields must
    have a format somewhere in the chain."""
    from zentity_spark.errors import ValidationException

    checked: set[str] = set()
    for fs in compiled.field_specs:
        a = fs.attribute
        if a in checked or compiled.attr_types.get(a) != "date":
            continue
        checked.add(a)
        if resolve_format_chain(a, compiled, input_params) is None:
            raise ValidationException(
                f"'attributes.{a}' is a 'date' which required a 'format' "
                "to be specified in the params."
            )
