"""Matcher registry: interpret matcher clause templates as vectorized
comparator specs.

In the reference, a matcher is an arbitrary Elasticsearch query-DSL JSON
template with {{ field }} / {{ value }} / {{ params.* }} variables
(Matcher.java:80-89, populated at Query.java:142-166) — that template IS
zentity's entire pluggable comparison surface. Spark has no ES to
delegate to, so this module CLASSIFIES the clause into one of a small
set of comparator kinds, each with a Spark-native implementation:

kind          ES clause shape                          Spark semantics
------------  ---------------------------------------  -------------------------------
exact         {"term": {f: v}}                         equality on canonical serialization
normalized    {"match": {f: v}} (no fuzziness)         equality after strip-punct analyzer
                                                       (TestIndex.json analyzer strip_punct:
                                                       pattern_replace [^a-zA-Z0-9] -> "",
                                                       keyword tokenizer, NO lowercasing)
fuzzy         {"match": {f: {query: v, fuzziness: k}}} levenshtein(norm_l, norm_r) <= k
                                                       (JobTest.java:40 matchers y,z)
date_window   {"range": {f: {gte: v||-w, lte: v||+w,   |ts_l - ts_r| <= w, inclusive
               format: fmt}}}                          (TestEntityModelA.json matcher_c)
nested        {"nested": {path: p, query: {term ...}}} exact on flattened path (arrays are
                                                       exploded to rows; TestEntityModel-
                                                       ObjectArrays.json matcher exact_phone)

Custom kinds beyond the reference's surface (north-star requirement):
jaro_winkler (pairwise JW similarity >= threshold, Arrow-batched pandas
UDF) and soundex (phonetic-key equality, Spark built-in soundex()).
These are selected by a zentity_spark extension clause form
{"similarity": {"method": "jaro_winkler"|"soundex"|"levenshtein", ...}}.

Param precedence is input-attribute > model-attribute > matcher default
(Query.java:196-202).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from zentity_spark.errors import ValidationException, ZentityError

# analyzer parity: TestIndex.json strip_punct (pattern_replace [^a-zA-Z0-9] -> '')
STRIP_PUNCT_PATTERN = "[^a-zA-Z0-9]"

KEY_KINDS = ("exact", "normalized", "nested", "soundex")
PAIRWISE_KINDS = ("fuzzy", "date_window", "jaro_winkler", "levenshtein")

# ES date-math units (matcher_c window "2s"; Query.java builds v||-w ranges)
_DATE_MATH_UNITS = {
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
    "H": 3600.0,
    "d": 86400.0,
    "w": 7 * 86400.0,
    "M": 30 * 86400.0,
    "y": 365 * 86400.0,
}
_WINDOW_RE = re.compile(r"^(\d+(?:\.\d+)?)\s*([smhHdwMy])$")


def parse_window_seconds(window: str | int | float) -> float:
    """Parse an ES date-math window like '2s', '1d' into seconds."""
    if isinstance(window, (int, float)) and not isinstance(window, bool):
        return float(window)
    m = _WINDOW_RE.match(str(window).strip())
    if not m:
        raise ValidationException(f"Invalid date-math window [{window}].")
    return float(m.group(1)) * _DATE_MATH_UNITS[m.group(2)]


@dataclass
class ComparatorSpec:
    """The compiled form of one matcher: how two attribute values compare."""

    matcher: str
    kind: str
    params: dict = field(default_factory=dict)
    # fuzzy: edit distance bound ('AUTO' or int); date_window: seconds
    threshold: float | str | None = None

    @property
    def is_key(self) -> bool:
        return self.kind in KEY_KINDS

    @property
    def is_pairwise(self) -> bool:
        return self.kind in PAIRWISE_KINDS


def classify_clause(matcher_name: str, clause: dict, params: dict) -> ComparatorSpec:
    """Map a matcher clause template to a comparator kind.

    Unrecognized/malformed clauses raise ZentityError — the analog of the
    reference's execution-time ES parse error
    (TestEntityModelElasticsearchError.json → error by=elasticsearch,
    ResolutionActionIT.testJobElasticsearchError).
    """
    if not isinstance(clause, dict) or len(clause) != 1:
        raise ZentityError(
            f"matcher [{matcher_name}]: unsupported clause structure {list(clause)[:3]}"
        )
    (kind_key, body), = clause.items()
    if kind_key == "term":
        return ComparatorSpec(matcher_name, "exact", params)
    if kind_key == "match":
        # body: { "{{ field }}": "{{ value }}" } or { f: {query, fuzziness} }
        if isinstance(body, dict) and len(body) == 1:
            (_, spec), = body.items()
            if isinstance(spec, dict) and "fuzziness" in spec:
                fuzz = params.get("fuzziness", spec.get("fuzziness", "AUTO"))
                return ComparatorSpec(matcher_name, "fuzzy", params, threshold=fuzz)
            return ComparatorSpec(matcher_name, "normalized", params)
        raise ZentityError(f"matcher [{matcher_name}]: unsupported match clause")
    if kind_key == "range":
        window = params.get("window")
        if window is None:
            # unresolvable {{ params.window }} without a value is a
            # validation error in the reference (Query.java:142-166)
            raise ValidationException(
                f"matcher [{matcher_name}]: 'params.window' is required and has no value"
            )
        return ComparatorSpec(
            matcher_name, "date_window", params, threshold=parse_window_seconds(window)
        )
    if kind_key == "nested":
        # nested term over object arrays — values are flattened at
        # extraction, so this reduces to exact equality on the leaf path
        return ComparatorSpec(matcher_name, "nested", params)
    if kind_key == "similarity":
        method = (body or {}).get("method") if isinstance(body, dict) else None
        if method == "jaro_winkler":
            thr = float(params.get("threshold", (body or {}).get("threshold", 0.9)))
            return ComparatorSpec(matcher_name, "jaro_winkler", params, threshold=thr)
        if method == "levenshtein":
            thr = params.get("max_edits", (body or {}).get("max_edits", "AUTO"))
            return ComparatorSpec(matcher_name, "levenshtein", params, threshold=thr)
        if method == "soundex":
            return ComparatorSpec(matcher_name, "soundex", params)
        raise ZentityError(f"matcher [{matcher_name}]: unknown similarity method [{method}]")
    raise ZentityError(
        f"matcher [{matcher_name}]: unsupported clause type [{kind_key}]"
    )


def merge_params(matcher_params: dict, model_attr_params: dict, input_attr_params: dict) -> dict:
    """Query.java:196-202: input-attribute > model-attribute > matcher."""
    out = dict(matcher_params or {})
    out.update(model_attr_params or {})
    out.update(input_attr_params or {})
    return out


# ----------------------------------------------------------------------
# Column builders (all JVM-side; no Python row-at-a-time code)

def strip_punct_col(col: Column) -> Column:
    """Parity with the fixture index .clean analyzer: remove [^a-zA-Z0-9]
    (TestIndex.json analysis block). Case-PRESERVING (the analyzer has no
    lowercase filter)."""
    return F.regexp_replace(col, STRIP_PUNCT_PATTERN, "")


def key_col(kind: str, raw: Column, ts_secs: Column | None = None,
            window_secs: float | None = None) -> Column:
    """Equality/blocking key for a KEY-kind comparator.

    exact/nested → raw canonical serialization; normalized → strip-punct;
    soundex → Spark built-in soundex code.
    """
    if kind in ("exact", "nested"):
        return raw
    if kind == "normalized":
        return strip_punct_col(raw)
    if kind == "soundex":
        return F.soundex(raw)
    raise ValidationException(f"[{kind}] is not a key comparator kind")


def date_bucket_keys(ts_secs: Column, window_secs: float) -> Column:
    """Blocking keys for a date_window comparator: emit buckets b and b+1
    of floor(ts/window); two values within ±window always share a key
    (|b_l - b_r| <= 1 ⇒ key-set intersection non-empty). Pairs are then
    verified with the exact inclusive window predicate."""
    b = F.floor(ts_secs / F.lit(window_secs))
    return F.array(b.cast("string"), (b + 1).cast("string"))


def fuzzy_block_keys(raw: Column) -> Column:
    """Blocking keys for fuzzy (edit-distance / JW) comparators: the
    normalized form plus its soundex code — exact-normalized pairs and
    phonetically-alike pairs land in shared blocks; candidates are then
    verified pairwise. (Recall-oriented best effort, standard for
    blocking fuzzy matchers; the reference delegates this to ES's
    fuzzy-term index expansion.)"""
    norm = strip_punct_col(raw)
    return F.array_distinct(F.array(norm, F.soundex(raw)))


def auto_fuzziness_col(a: Column, b: Column) -> Column:
    """ES AUTO fuzziness: 0 edits for length <= 2, 1 for 3-5, 2 for > 5
    (based on the longer operand, matching ES semantics on the query term)."""
    n = F.greatest(F.length(a), F.length(b))
    return F.when(n <= 2, F.lit(0)).when(n <= 5, F.lit(1)).otherwise(F.lit(2))


def pairwise_predicate(spec: ComparatorSpec, left_raw: Column, right_raw: Column,
                       left_ts: Column | None = None,
                       right_ts: Column | None = None) -> Column:
    """Pairwise verification predicate for a comparator spec, evaluated
    on candidate pairs (JVM built-ins: levenshtein, abs; JW uses a pandas
    UDF upstream and is verified via a precomputed similarity column)."""
    if spec.kind == "date_window":
        return F.abs(left_ts - right_ts) <= F.lit(float(spec.threshold))
    if spec.kind in ("fuzzy", "levenshtein"):
        ln = strip_punct_col(left_raw)
        rn = strip_punct_col(right_raw)
        if spec.threshold == "AUTO" or spec.threshold is None:
            return F.levenshtein(ln, rn) <= auto_fuzziness_col(ln, rn)
        return F.levenshtein(ln, rn) <= F.lit(int(spec.threshold))
    if spec.kind in ("exact", "nested"):
        return left_raw == right_raw
    if spec.kind == "normalized":
        return strip_punct_col(left_raw) == strip_punct_col(right_raw)
    if spec.kind == "soundex":
        return F.soundex(left_raw) == F.soundex(right_raw)
    raise ValidationException(f"[{spec.kind}] has no pairwise predicate")


_SX_MAP = "01230127022455012623017202"


def spark_soundex_py(s: str) -> str:
    """Driver-side replica of Spark's UTF8String.soundex (the JVM
    function that builds the soundex eq_keys): US English mapping with
    H/W ('7') transparent, vowels and non-letters resetting the last
    code, and a non-letter FIRST character returning the input
    unchanged. Needed so seeded-mode input values land on the same
    phonetic keys the data side produces."""
    if not s:
        return s
    c0 = s[0]
    if "a" <= c0 <= "z":
        c0 = chr(ord(c0) - 32)
    elif not ("A" <= c0 <= "Z"):
        return s
    sx = [c0, "0", "0", "0"]
    sxi = 1
    last = _SX_MAP[ord(c0) - 65]
    for ch in s[1:]:
        if "a" <= ch <= "z":
            ch = chr(ord(ch) - 32)
        elif not ("A" <= ch <= "Z"):
            last = "0"
            continue
        code = _SX_MAP[ord(ch) - 65]
        if code == "7":
            continue
        if code != "0" and code != last:
            sx[sxi] = code
            sxi += 1
            if sxi > 3:
                break
        last = code
    return "".join(sx)


def jaro_winkler_pandas(a, b):
    """Vectorized Jaro-Winkler similarity over two pd.Series of strings.

    Arrow-batched (used via pandas_udf). The reference gets JW from ES
    fuzzy scoring infrastructure; this is the standard JW definition with
    Winkler prefix boost (p=0.1, max prefix 4). Inner loop is plain
    Python over bytearrays — for the short strings JW applies to, that
    is ~2× faster than per-pair numpy allocations.
    """
    import pandas as pd

    def jw(s1, s2):
        if s1 is None or s2 is None:
            return float("nan")
        l1, l2 = len(s1), len(s2)
        if l1 == 0 or l2 == 0:
            # DuckDB parity: either side empty → 0.0, INCLUDING "" vs ""
            # (hypothesis-found divergence: the equality shortcut used to
            # return 1.0 there)
            return 0.0
        if s1 == s2:
            return 1.0
        match_dist = max(l1, l2) // 2 - 1
        m1 = bytearray(l1)
        m2 = bytearray(l2)
        matches = 0
        for i, c in enumerate(s1):
            lo = max(0, i - match_dist)
            hi = min(l2, i + match_dist + 1)
            for j in range(lo, hi):
                if not m2[j] and s2[j] == c:
                    m1[i] = True
                    m2[j] = True
                    matches += 1
                    break
        if matches == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        t //= 2
        jaro = (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0
        if jaro <= 0.7:  # standard Winkler boost threshold (DuckDB parity)
            return jaro
        prefix = 0
        for c1, c2 in zip(s1[:4], s2[:4]):
            if c1 == c2:
                prefix += 1
            else:
                break
        return jaro + prefix * 0.1 * (1.0 - jaro)

    return pd.Series([jw(x, y) for x, y in zip(a, b)], dtype="float64")


def jaro_winkler_udf():
    """pandas_udf wrapper (Arrow batch transfer, input_hint: no per-row
    Python UDFs)."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(jaro_winkler_pandas, "double")
