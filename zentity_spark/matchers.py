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


def _jw_chunk(s1_list, s2_list, l1, l2):
    """Exact Jaro-Winkler over one chunk, batch-vectorized in numpy.

    Semantics are the classic greedy definition (Winkler boost p=0.1,
    max prefix 4, boost only when jaro > 0.7; either side empty → 0.0
    including "" vs "" — DuckDB-parity edge found by hypothesis). The
    greedy matching advances ONE s1 position per loop iteration across
    ALL rows at once: candidate mask = (char equal) & (s2 position
    unmatched) & (within window) — argmax gives each row's FIRST
    eligible s2 position, which is exactly the scalar algorithm's
    greedy choice. Matching decomposes per character value (a matched
    s2 slot can only block same-char matches), so no cross-row
    interaction is lost. Transpositions: matched chars of each side
    compacted left via stable argsort (preserves original order), then
    positionwise compare. ~15× the throughput of the per-row Python
    loop on 200-char text at Arrow batch sizes."""
    import numpy as np

    n = len(s1_list)
    L = int(max(l1.max(), l2.max()))
    l1 = l1.astype(np.int64)
    l2 = l2.astype(np.int64)
    if L == 0:
        return np.zeros(n)
    # UCS4 matrix: exact code points, shorter strings zero-padded.
    # Padding never participates: every mask is bounded by the TRUE
    # lengths l1/l2 (so embedded NULs still compare correctly).
    A = np.array(s1_list, dtype=f"<U{L}").view(np.uint32).reshape(n, -1)
    B = np.array(s2_list, dtype=f"<U{L}").view(np.uint32).reshape(n, -1)
    # ASCII/Latin-1 chunks compare on uint8 — 4× less memory traffic in
    # the hot loop (padding 0 stays 0, still excluded by length masks)
    if A.max(initial=0) < 256 and B.max(initial=0) < 256:
        Ah, Bh = A.astype(np.uint8), B.astype(np.uint8)
    else:
        Ah, Bh = A, B
    d = np.maximum(l1, l2) // 2 - 1  # window radius; -1 → no matches
    jj = np.arange(L)
    m1 = np.zeros((n, L), dtype=bool)
    matched2 = np.zeros((n, L), dtype=bool)
    d_hi = int(d.max())
    # homogeneous chunks (the common case after length-sorting) skip the
    # per-row masks entirely: equal d ⟹ the column slice IS the window,
    # equal l2 ⟹ no tail mask, i < l1.min() ⟹ every row active
    d_uniform = int(d.min()) == d_hi
    l2_min = int(l2.min())
    l1_min = int(l1.min())
    for i in range(int(l1.max())):
        # only columns inside ANY row's window can match at this i
        c_lo = max(0, i - d_hi)
        c_hi = min(L, i + d_hi + 1)
        cols = jj[c_lo:c_hi]
        cand = (Bh[:, c_lo:c_hi] == Ah[:, i, None]) & ~matched2[:, c_lo:c_hi]
        if not d_uniform:
            cand &= (cols >= (i - d)[:, None]) & (cols <= (i + d)[:, None])
        if c_hi > l2_min:
            cand &= cols < l2[:, None]
        if i >= l1_min:
            cand &= (i < l1)[:, None]
        rows = np.flatnonzero(cand.any(axis=1))
        if rows.size:
            j_star = c_lo + cand[rows].argmax(axis=1)
            matched2[rows, j_star] = True
            m1[rows, i] = True
    matches = m1.sum(axis=1)
    # matched chars compacted left in original order (stable sort on
    # the inverted mask), compared positionwise → half-transpositions
    ord1 = np.argsort(~m1, axis=1, kind="stable")
    ord2 = np.argsort(~matched2, axis=1, kind="stable")
    c1 = np.take_along_axis(A, ord1, axis=1)
    c2 = np.take_along_axis(B, ord2, axis=1)
    t = ((c1 != c2) & (jj < matches[:, None])).sum(axis=1) // 2
    m = matches.astype(np.float64)
    jaro = (
        m / np.maximum(l1, 1) + m / np.maximum(l2, 1)
        + (m - t) / np.maximum(m, 1.0)
    ) / 3.0
    jaro = np.where(matches == 0, 0.0, jaro)
    P = min(4, L)
    eq4 = (A[:, :P] == B[:, :P]) & (np.arange(P) < np.minimum(l1, l2)[:, None])
    prefix = np.cumprod(eq4, axis=1).sum(axis=1)
    out = np.where(jaro > 0.7, jaro + prefix * 0.1 * (1.0 - jaro), jaro)
    return np.where((l1 == 0) | (l2 == 0), 0.0, out)


def jaro_winkler_pandas(a, b):
    """Vectorized Jaro-Winkler similarity over two pd.Series of strings.

    Arrow-batched (used via pandas_udf). The reference gets JW from ES
    fuzzy scoring infrastructure; this is the standard JW definition with
    Winkler prefix boost (p=0.1, max prefix 4). The kernel (_jw_chunk)
    is batch-vectorized numpy; rows are sorted by length and chunked so
    each chunk's matrix width matches its longest string (one 200-char
    outlier must not widen every row's work) and memory stays bounded.
    Null on either side → NaN."""
    import numpy as np
    import pandas as pd

    n = len(a)
    out = np.full(n, np.nan)
    if n == 0:
        return pd.Series(out, dtype="float64")
    null = a.isna().to_numpy() | b.isna().to_numpy()
    valid = np.flatnonzero(~null)
    if valid.size == 0:
        return pd.Series(out, dtype="float64")
    s1 = a.to_numpy(dtype=object)[valid]
    s2 = b.to_numpy(dtype=object)[valid]
    l1 = np.fromiter((len(x) for x in s1), dtype=np.int64, count=valid.size)
    l2 = np.fromiter((len(x) for x in s2), dtype=np.int64, count=valid.size)
    # equal-string fast path. Not only speed: it DEFINES the d = -1
    # case — max(l1,l2)//2 - 1 is -1 for single-char strings, whose
    # empty match window would otherwise score "a" vs "a" as 0.0; the
    # classic algorithm resolves that via this equality rule (and
    # "" vs "" stays 0.0 per the DuckDB-parity edge).
    eq = (s1 == s2) & (l1 > 0)
    out[valid[eq]] = 1.0
    out[valid[(l1 == 0) | (l2 == 0)]] = 0.0
    keep = np.flatnonzero(~eq & (l1 > 0) & (l2 > 0))
    valid = valid[keep]
    s1, s2, l1, l2 = s1[keep], s2[keep], l1[keep], l2[keep]
    if valid.size == 0:
        return pd.Series(out, dtype="float64")
    order = np.argsort(np.maximum(l1, l2), kind="stable")
    budget = 2_000_000  # max elements per chunk matrix (~8 MB at UCS4)
    pos = 0
    while pos < order.size:
        width = 0
        end = pos
        while end < order.size:
            w = max(width, int(max(l1[order[end]], l2[order[end]], 1)))
            if (end - pos + 1) * w > budget and end > pos:
                break
            width = w
            end += 1
        idx = order[pos:end]
        out[valid[idx]] = _jw_chunk(
            list(s1[idx]), list(s2[idx]), l1[idx], l2[idx]
        )
        pos = end
    return pd.Series(out, dtype="float64")


def jaro_winkler_udf():
    """pandas_udf wrapper (Arrow batch transfer, input_hint: no per-row
    Python UDFs)."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(jaro_winkler_pandas, "double")
