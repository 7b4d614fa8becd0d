"""Seeded resolution: the reference's hop-traversal loop, Spark-side.

`resolve()` answers the reference's core request — "given these seed
attributes/terms/ids, which documents belong to this ONE entity, and at
which hop was each found?" (Job.java:1200-1255 run → 1075-1172 traverse).

Faithful port of the loop semantics:
- per hop, per index: one query built from the ACCUMULATED attribute
  values (Job.java:1018-1050 buildHopQueue);
- resolver DNF with weight tiers: the final clause is the lowest-weight
  queryable group, gated per higher-weight resolver by
  should(any-attribute-field-not-exists, resolver-matches)
  (Query.java:488-551) — see pairs.py for the observed-behavior notes;
- ids seed the first hop (Query.java:483-486); terms are trial-parsed
  per attribute type and queried untiered (Query.java:554-702);
- fetched docs are excluded per hop (Query.java:451-453);
- per-query doc cap truncates lowest-id-first, matching ES index-order
  truncation on the fixtures (max_docs_per_query, Job.java:70;
  ResolutionActionIT.testJobMaxHopsAndDocs);
- fixpoint when a hop adds nothing new or max_hops is reached
  (Job.java:1088-1113).

The entity's accumulated values are driver-held (entity-sized — exactly
like the reference holds them in the Job object); each hop's matching is
a distributed broadcast-join against the values table, so the per-hop
work scales with the DATA, not the driver.
"""

from __future__ import annotations

import datetime
import re
import threading
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zentity_spark.compiler import CompiledModel, compile_model
from zentity_spark.errors import ValidationException
from zentity_spark.matchers import parse_window_seconds
from zentity_spark.model import Model
from zentity_spark.scoring import composite_identity_confidence_score
from zentity_spark.transcripts import build_values, parse_turns
from zentity_spark.values import serialize_value

_NUMBER_RE = re.compile(r"^-?\d*\.?\d+$")  # Patterns.java:30 NUMBER_STRING

_PY_TS_FORMATS = [
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
]


def parse_ts_py(raw: str, fmt: str | None = None) -> float | None:
    """Python-side timestamp parse: the declared Java format first
    (full SimpleDateFormat semantics, java_dates.parse_java_date), then
    the same trial formats transcripts.parse_ts uses, so driver-held
    input values land on the same time axis as the data."""
    if fmt:
        from zentity_spark.java_dates import parse_java_date

        ts = parse_java_date(str(raw), fmt)
        if ts is not None:
            return ts
    for f_ in _PY_TS_FORMATS:
        try:
            return datetime.datetime.strptime(raw, f_).replace(
                tzinfo=datetime.timezone.utc
            ).timestamp()
        except (ValueError, TypeError):
            continue
    return None


def strip_punct_py(s: str) -> str:
    return re.sub(r"[^a-zA-Z0-9]", "", s)


@dataclass
class Input:
    """Resolution input (resolution/input/Input.java:36-427)."""

    attributes: dict = field(default_factory=dict)  # name -> [values] | {"values": [...], "params": {...}}
    terms: list = field(default_factory=list)
    ids: dict = field(default_factory=dict)  # index -> [doc ids]
    scope: dict | None = None

    def __post_init__(self):
        if not self.attributes and not self.terms and not self.ids:
            raise ValidationException(
                "The 'attributes', 'terms', and 'ids' fields are missing from the request."
            )

    def attr_values(self) -> dict[str, list]:
        out = {}
        for name, spec in self.attributes.items():
            # a dict entry may carry only params (values then arrive via
            # terms routing — TEST_PAYLOAD_JOB_DATA_TYPES_DATE_TERMS)
            out[name] = spec.get("values", []) if isinstance(spec, dict) else list(spec)
        return out

    def attr_params(self) -> dict[str, dict]:
        return {
            name: dict(spec.get("params", {}))
            for name, spec in self.attributes.items()
            if isinstance(spec, dict)
        }


_TIME_UNITS = {
    "nanos": 1e-9, "micros": 1e-6, "ms": 1e-3,
    "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0,
}


def parse_time_value(s: str | None) -> float | None:
    """ES TimeValue grammar, as the reference applies to
    max_time_per_query (Query.java:427-428 → TimeValue.parseTimeValue):
    a number with a unit suffix in {d, h, m, s, ms, micros, nanos},
    case-insensitive; the only unitless forms are "0" and "-1"
    (-1 = no timeout). Returns seconds, or None for no-timeout.

    Deliberate relaxation vs ES 7+: fractional numerals ("1.5s") are
    accepted here (ES 7+ rejects them); negative durations with a unit
    ("-5s") are rejected like the reference — a negative Event.wait
    timeout returns immediately, so a typo would silently cancel every
    query and yield zero hits (data loss, not a 400)."""
    if s is None:
        return None
    v = str(s).strip().lower()
    if v == "-1":
        return None
    if v == "0":
        return 0.0
    # order matters: multi-char suffixes before their 1-char tails
    for unit in ("nanos", "micros", "ms", "d", "h", "m", "s"):
        if v.endswith(unit):
            num = v[: -len(unit)].strip()
            try:
                secs = float(num) * _TIME_UNITS[unit]
            except ValueError:
                break
            if secs < 0:
                raise ValidationException(
                    f"failed to parse setting [timeout] with value [{s}]"
                    " as a time value: negative durations are not"
                    " supported"
                )
            return secs
    raise ValidationException(
        f"failed to parse setting [timeout] with value [{s}] as a time value:"
        " unit is missing or unrecognized"
    )


def _collect_with_budget(df: DataFrame, budget_s: float | None, tag: str):
    """Collect under a best-effort per-query time budget — the batch
    analog of the reference's max_time_per_query search timeout
    (Job.java:72 default "10s", applied at Query.java:427-428). ES
    timeout semantics are best-effort early termination with PARTIAL
    results; Spark's unit of cancellation is the job, and a cancelled
    collect yields no rows — so a query that exceeds its budget
    contributes ZERO hits (the closest faithful analog to a fully
    timed-out shard set), the traversal continues, and the caller
    records timed_out=true in the query audit log. Returns
    (rows, timed_out). budget_s=None short-circuits to a plain collect
    (no job tag, no timer — zero overhead on the default path).

    Request-scoped ONLY: every call site sits under the seeded
    traversal, whose hit set is bounded by max_docs_per_query — the
    batch path (pipeline.resolve_all) never passes through here, which
    tests/test_session17_fixes.py enforces with a collect audit."""
    if budget_s is None:
        return df.collect(), False
    sc = df.sparkSession.sparkContext
    fired = threading.Event()
    done = threading.Event()

    def _watchdog():
        # cancelJobsWithTag only hits ACTIVE jobs — a one-shot cancel
        # races job submission (first-collect planning can take longer
        # than the budget, and one action may submit several jobs, e.g.
        # AQE stages). Keep cancelling until the collect thread returns.
        if done.wait(budget_s):
            return
        fired.set()
        while not done.wait(0.25):
            sc.cancelJobsWithTag(tag)

    sc.addJobTag(tag)
    sc.setInterruptOnCancel(True)
    watchdog = threading.Thread(target=_watchdog, daemon=True)
    watchdog.start()
    try:
        rows = df.collect()
        # the deadline may pass between job completion and here; a
        # completed collect is a completed query (ES returns full
        # results when they beat the timeout)
        return rows, False
    except Exception as exc:
        # only mask CANCELLATIONS as timeouts: a genuine execution
        # failure (OOM, late analysis error) that happens to land after
        # the deadline must propagate, not be misreported as a clean
        # timed-out query with zero hits
        # match OUR cancellation specifically: the per-invocation uuid tag
        # appears in Spark's cancelJobsWithTag reason, so an unrelated
        # cancellation-flavored failure landing after the deadline
        # (cancelAllJobs on shutdown, a user KeyboardInterrupt) propagates
        # instead of being misreported as a clean timed-out query. The
        # only non-tagged form this watchdog itself produces is the JVM
        # InterruptedException raised by interruptOnCancel.
        msg = f"{type(exc).__name__}: {exc}".lower()
        if fired.is_set() and (tag.lower() in msg
                               or "interruptedexception" in msg):
            return [], True
        raise
    finally:
        done.set()
        watchdog.join(timeout=1.0)
        sc.removeJobTag(tag)


@dataclass
class SeededConfig:
    max_hops: int = 100            # Job.java:71
    max_docs_per_query: int = 1000  # Job.java:70
    # Job.java:72 (reference default "10s", an interactive-search SLA).
    # Batch default is None = no budget: a timed-out query silently
    # dropping documents is data loss in a pipeline, so the SLA is
    # opt-in here; when set, semantics mirror the ES search timeout
    # (best-effort, partial results, audit-logged) via job-tag
    # cancellation — see _collect_with_budget.
    max_time_per_query: str | None = None
    include_score: bool = False
    include_explanation: bool = False


@dataclass
class Hit:
    record_id: str
    index: str
    doc_id: str
    hop: int
    query: int = 0          # query number within the hop (Query.number())
    score: float | None = None
    explanation: list = field(default_factory=list)


class _EntityState:
    """Accumulated attribute values (serialized) + parsed timestamps."""

    def __init__(self, compiled: CompiledModel):
        self.compiled = compiled
        self.values: dict[str, set[str]] = {}
        # serialized form → epoch seconds: the ORIGINAL serialization is
        # what the response envelope reports as input_value
        self.tss: dict[str, dict[str, float]] = {}

    def add(self, attribute: str, serialized: str, fmt: str | None = None) -> bool:
        if serialized in ("", "null") or serialized is None:
            return False
        new = serialized not in self.values.setdefault(attribute, set())
        self.values[attribute].add(serialized)
        if self.compiled.attr_types.get(attribute) == "date":
            ts = parse_ts_py(serialized, fmt)
            if ts is not None:
                self.tss.setdefault(attribute, {})[serialized] = ts
        return new

    def attrs_with_values(self) -> set[str]:
        return {a for a, vs in self.values.items() if vs}


def _input_key_rows(state: _EntityState, compiled: CompiledModel):
    """(attribute, kind, key, orig) equality rows + (attribute, ts,
    window, orig) date rows + (attribute, norm, orig) fuzzy rows, derived
    from the accumulated values for every comparator kind the model uses.
    `orig` is the input value's canonical serialization — the envelope's
    input_value (the reference encodes it base64 into the named filter,
    Query.java:142-166)."""
    eq_rows, date_rows, fuzz_rows, jw_rows = [], [], [], []
    kinds_by_attr = {a: compiled.kinds_for_attribute(a) for a in compiled.attr_types}

    def _lev_meta(attribute):
        """Mirror of pairs.attribute_match_expr's threshold merge: AUTO
        if any field spec says so, widened by the max declared numeric
        fuzziness."""
        specs = [
            fs.spec for fs in compiled.field_specs
            if fs.attribute == attribute and fs.spec.kind in ("fuzzy", "levenshtein")
        ]
        thresholds = {s.threshold for s in specs}
        use_auto = "AUTO" in thresholds or None in thresholds
        max_k = max(
            (int(t) for t in thresholds if t not in ("AUTO", None)), default=None
        )
        return use_auto, max_k

    def _jw_thr(attribute):
        specs = [
            fs.spec for fs in compiled.field_specs
            if fs.attribute == attribute and fs.spec.kind == "jaro_winkler"
        ]
        return min(float(s.threshold) for s in specs)

    for attribute, values in state.values.items():
        kinds = kinds_by_attr.get(attribute, set())
        for v in sorted(values):
            if {"exact", "nested"} & kinds:
                eq_rows.append((attribute, "exact", v, v))
                eq_rows.append((attribute, "nested", v, v))
            if "normalized" in kinds:
                eq_rows.append((attribute, "normalized", strip_punct_py(v), v))
            if "soundex" in kinds:
                from zentity_spark.matchers import spark_soundex_py

                eq_rows.append(
                    (attribute, "soundex", "sx:" + spark_soundex_py(v), v)
                )
            if kinds & {"fuzzy", "levenshtein"}:
                use_auto, max_k = _lev_meta(attribute)
                fuzz_rows.append(
                    (attribute, strip_punct_py(v), v, use_auto, max_k)
                )
            if "jaro_winkler" in kinds:
                jw_rows.append((attribute, v, _jw_thr(attribute)))
        if "date_window" in kinds:
            w = compiled.date_window_for(attribute)
            for orig, ts in sorted(state.tss.get(attribute, {}).items()):
                date_rows.append((attribute, float(ts), float(w), orig))
    return eq_rows, date_rows, fuzz_rows, jw_rows


def _match_records(spark, values_df, state: _EntityState, compiled: CompiledModel):
    """Distributed matching of the accumulated entity values against the
    values table → (record_id, source, attribute, field, matcher, raw,
    input_val). One broadcast join per comparator family."""
    eq_rows, date_rows, fuzz_rows, jw_rows = _input_key_rows(state, compiled)
    parts = []
    if eq_rows:
        rows = [r for r in eq_rows if r[2] is not None]
        if rows:
            keys = spark.createDataFrame(
                rows, "k_attr string, k_kind string, k_key string, k_orig string"
            )
            vv = values_df.withColumn("vkey", F.try_element_at("eq_keys", F.lit(1)))
            parts.append(
                vv.join(
                    F.broadcast(keys),
                    (vv.attribute == keys.k_attr)
                    & (vv.kind == keys.k_kind)
                    & (vv.vkey == keys.k_key),
                    "inner",
                ).select(
                    "record_id", "source", "attribute",
                    "field", "matcher", "raw", F.col("k_orig").alias("input_val"),
                )
            )
    if date_rows:
        dk = spark.createDataFrame(
            date_rows, "k_attr string, its double, window double, k_orig string"
        )
        v = values_df.where(F.col("kind") == "date_window")
        parts.append(
            v.join(F.broadcast(dk), v.attribute == dk.k_attr, "inner")
            .where(F.abs(F.col("ts") - F.col("its")) <= F.col("window"))
            .select(
                "record_id", "source", "attribute", "field", "matcher", "raw",
                F.col("k_orig").alias("input_val"),
            )
        )
    if fuzz_rows:
        fk = spark.createDataFrame(
            fuzz_rows,
            "k_attr string, fnorm string, orig string, use_auto boolean,"
            " max_k int",
        )
        v = values_df.where(F.col("kind").isin("fuzzy", "levenshtein"))
        norm = F.regexp_replace("raw", "[^a-zA-Z0-9]", "")
        from zentity_spark.matchers import auto_fuzziness_col

        # batch parity (pairs.attribute_match_expr): the bound is the
        # DECLARED fuzziness when numeric, AUTO when declared AUTO, and
        # the wider of the two when the attribute's fields declare both
        # — the previous always-AUTO form rejected matches the batch
        # path links (e.g. fuzziness=2 on a 4-char value)
        auto_b = auto_fuzziness_col(norm, F.col("fnorm"))
        bound = (
            F.when(F.col("use_auto") & F.col("max_k").isNotNull(),
                   F.greatest(auto_b, F.col("max_k")))
            .when(F.col("use_auto"), auto_b)
            .otherwise(F.col("max_k"))
        )
        parts.append(
            v.join(F.broadcast(fk), v.attribute == fk.k_attr, "inner")
            .where(F.levenshtein(norm, F.col("fnorm")) <= bound)
            .select(
                "record_id", "source", "attribute", "field", "matcher", "raw",
                F.col("orig").alias("input_val"),
            )
        )
    if jw_rows:
        from zentity_spark.matchers import jaro_winkler_udf

        jk = spark.createDataFrame(
            jw_rows, "k_attr string, jorig string, jthr double"
        )
        v = values_df.where(F.col("kind") == "jaro_winkler")
        jw = jaro_winkler_udf()
        parts.append(
            v.join(F.broadcast(jk), v.attribute == jk.k_attr, "inner")
            .where(jw(F.col("raw"), F.col("jorig")) >= F.col("jthr"))
            .select(
                "record_id", "source", "attribute", "field", "matcher", "raw",
                F.col("jorig").alias("input_val"),
            )
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _resolver_clause(compiled, queryable: list[str], matched_attrs_col, fields_col):
    """Weight-tiered resolver DNF as a boolean Column over a record's
    matched-attribute set (Query.java:488-551 semantics)."""
    def contains_all(attrs):
        c = F.lit(True)
        for a in attrs:
            c = c & F.array_contains(matched_attrs_col, a)
        return c

    groups = compiled.model.resolver_weight_groups(queryable)
    weights = sorted(groups)
    lowest = groups[weights[0]]
    clause = F.lit(False)
    for r in lowest:
        clause = clause | contains_all(compiled.resolver_attrs[r])
    for w in weights[1:]:
        for r in groups[w]:
            not_exists = F.lit(False)
            for a in compiled.resolver_attrs[r]:
                not_exists = not_exists | ~F.array_contains(fields_col, a)
            clause = clause & (contains_all(compiled.resolver_attrs[r]) | not_exists)
    return clause


def resolve(
    spark: SparkSession,
    turns: DataFrame,
    model: Model,
    input: Input,
    config: SeededConfig | None = None,
    _capture: dict | None = None,
) -> list[Hit]:
    """Run the seeded hop traversal; returns hits with hop provenance
    (and score/explanation when requested).

    _capture (internal seam for envelope.resolve_response and the query
    audit log): when a dict is passed, it is filled with values_df,
    compiled, and query_log — the per-(hop, query, index) audit rows
    mirroring Job.java:166-197 serializeLoggedQuery (hop, query number,
    index, attribute resolvers, term resolvers, seed-id count, hit
    count). There is no embedded ES request/response JSON to log — the
    engine runs DataFrame plans, not ES queries."""
    config = config or SeededConfig()
    budget_s = parse_time_value(config.max_time_per_query)
    # per-invocation nonce: bulk runs items concurrently, and
    # cancelJobsWithTag is global — identical (hop, query, index) tags
    # across items would let one item's watchdog cancel a sibling's jobs
    tag_prefix = f"zentity-seeded-{uuid.uuid4().hex}"
    query_log: list[dict] = []
    if _capture is not None:
        # share the LIVE list up front: a mid-traversal failure must not
        # lose the hops already logged (bulk audits error items too)
        _capture["query_log"] = query_log
    model.prune(input.scope)
    compiled = compile_model(model, input.attr_params())

    # Input.java:380-420: every date attribute must have a 'format'
    # somewhere in the input > model-attribute > matcher chain
    from zentity_spark.java_dates import validate_date_formats

    validate_date_formats(compiled, input.attr_params())

    parsed = parse_turns(turns)
    values_df = build_values(spark, turns, compiled).localCheckpoint()

    # physical fields named like attributes, for weight-tier exists gates
    from zentity_spark.transcripts import attr_name_field_presence

    if not compiled.weights_all_equal:
        presence = attr_name_field_presence(parsed, compiled).localCheckpoint()
    else:
        presence = None

    # scope attribute filters (value-level include/exclude,
    # Query.java:456-479) — evaluated with the same matching machinery
    scope = input.scope or {}
    scope_excl = (scope.get("exclude") or {}).get("attributes") or {}
    scope_incl = (scope.get("include") or {}).get("attributes") or {}

    def scope_record_ids(attr_value_map):
        st = _EntityState(compiled)
        for a, vs in attr_value_map.items():
            fmt = (input.attr_params().get(a) or {}).get("format")
            for v in vs:
                st.add(a, serialize_value(v, compiled.attr_types.get(a, "string")), fmt)
        m = _match_records(spark, values_df, st, compiled)
        if m is None:
            return None
        return m.select("record_id").distinct()

    # exclude: doc dropped if it matches ANY excluded attribute value
    # (should-combined, Query.java:456-463); include: doc kept only if it
    # matches EVERY included attribute (filter-combined, Query.java:471-479)
    excl_ids = scope_record_ids(scope_excl) if scope_excl else None
    incl_ids = None
    if scope_incl:
        for a, vs in sorted(scope_incl.items()):
            ids_a = scope_record_ids({a: vs})
            if ids_a is None:
                # the included attribute's filter clause cannot be
                # derived (no matcher-bearing field) → NO document can
                # satisfy it; dropping the constraint instead would turn
                # a must-match filter into match-everything
                ids_a = spark.createDataFrame([], "record_id string")
            incl_ids = ids_a if incl_ids is None else incl_ids.join(
                ids_a, "record_id", "left_semi"
            )

    # seed state from input attributes
    state = _EntityState(compiled)
    for a, vs in input.attr_values().items():
        if a not in compiled.attr_types:
            raise ValidationException(f"'attributes.{a}' is not defined in the entity model.")
        fmt = (input.attr_params().get(a) or {}).get("format")
        for v in vs:
            state.add(a, serialize_value(v, compiled.attr_types[a]), fmt)

    # terms: trial-parse against every attribute type (Term.java:56-74,
    # Query.java:559-702); weights deliberately NOT applied to terms
    term_state = _EntityState(compiled)
    for t in input.terms:
        for a, atype in compiled.attr_types.items():
            s = str(t)
            if atype == "boolean" and s in ("true", "false"):
                term_state.add(a, s)
            elif atype == "number" and _NUMBER_RE.match(s):
                term_state.add(a, s)
            elif atype == "date":
                # term.isDate(format) under the chain format ONLY
                # (Query.java:619-642): no trial-format fallback — a
                # term is a date for this attribute iff the resolved
                # format parses it (SimpleDateFormat prefix semantics)
                from zentity_spark.java_dates import parse_java_date, resolve_format_chain

                fmt = resolve_format_chain(a, compiled, input.attr_params())
                if fmt is not None and parse_java_date(s, fmt) is not None:
                    term_state.add(a, s, fmt)
            elif atype == "string":
                term_state.add(a, s)

    fetched: dict[str, set[str]] = {}
    hits: list[Hit] = []
    indexes = compiled.indexes()
    # the doc universe for seed-id validation: every parsed record,
    # including ones that produce no attribute values (an ES ids query
    # matches existence, not extractability)
    known_ids = parsed.select("record_id").distinct().localCheckpoint()

    for hop in range(config.max_hops + 1):
        hop_new = False
        matches = _match_records(spark, values_df, state, compiled)
        term_matches = (
            _match_records(spark, values_df, term_state, compiled) if hop == 0 and input.terms else None
        )
        # the hop queue is built from PRE-hop values (Job.java:1018-1050):
        # snapshot before the per-index loop so extraction during this hop
        # doesn't leak into this hop's queryability
        awv = set(state.attrs_with_values())
        hop_query_number = 0
        hop_new_ids: list[str] = []

        for index in indexes:
            queryable = [
                r for r in sorted(compiled.resolver_attrs)
                if compiled.model.can_query_resolver(index, r, awv)
            ]
            term_queryable = [
                r for r in sorted(compiled.resolver_attrs)
                if compiled.model.can_query_resolver(index, r, term_state.attrs_with_values())
            ] if term_matches is not None else []

            seeds = input.ids.get(index, []) if hop == 0 else []
            if not queryable and not term_queryable and not seeds:
                continue
            qnum = hop_query_number
            hop_query_number += 1

            pred = F.lit(False)
            per_rec = None
            if queryable and matches is not None:
                m = matches.where(F.col("source") == index)
                per_rec = m.groupBy("record_id").agg(
                    F.collect_set("attribute").alias("ma"),
                    F.collect_list(
                        F.struct("attribute", "field", "matcher", "raw", "input_val")
                    ).alias("detail"),
                )
                if presence is not None:
                    per_rec = per_rec.join(presence, "record_id", "left").withColumn(
                        "attr_name_fields",
                        F.coalesce("attr_name_fields", F.array().cast("array<string>")),
                    )
                else:
                    per_rec = per_rec.withColumn(
                        "attr_name_fields", F.array().cast("array<string>")
                    )
                pred = _resolver_clause(
                    compiled, queryable, F.col("ma"), F.col("attr_name_fields")
                )
            if term_queryable:
                tm = term_matches.where(F.col("source") == index).groupBy("record_id").agg(
                    F.collect_set("attribute").alias("tma")
                )
                tclause = F.lit(False)
                for r in term_queryable:
                    c = F.lit(True)
                    for a in compiled.resolver_attrs[r]:
                        c = c & F.array_contains(F.col("tma"), a)
                    tclause = tclause | c
                if per_rec is None:
                    per_rec = tm.withColumn("ma", F.array().cast("array<string>")).withColumn(
                        "detail",
                        F.array().cast(
                            "array<struct<attribute:string,field:string,matcher:string,raw:string,input_val:string>>"
                        ),
                    )
                    pred = tclause
                else:
                    per_rec = per_rec.join(tm, "record_id", "outer")
                    per_rec = (
                        per_rec.withColumn(
                            "ma", F.coalesce("ma", F.array().cast("array<string>"))
                        )
                        .withColumn("tma", F.coalesce("tma", F.array().cast("array<string>")))
                        .withColumn(
                            "detail",
                            F.coalesce(
                                "detail",
                                F.array().cast(
                                    "array<struct<attribute:string,field:string,matcher:string,raw:string,input_val:string>>"
                                ),
                            ),
                        )
                        .withColumn(
                            "attr_name_fields",
                            F.coalesce("attr_name_fields", F.array().cast("array<string>")),
                        )
                    )
                    pred = pred | tclause

            if per_rec is None:
                cand = spark.createDataFrame([], "record_id string")
            else:
                cand = per_rec.where(pred).select("record_id", "detail")

            # seed ids (hop 0) — validated against the parsed corpus:
            # an ES ids query returns only EXISTING docs, so a
            # nonexistent seed id must not fabricate a hit
            if seeds:
                seed_ids = [f"{index}/{i}" for i in seeds]
                seed_df = spark.createDataFrame(
                    [(s,) for s in seed_ids], "record_id string"
                ).join(known_ids, "record_id", "left_semi").withColumn(
                    "detail",
                    F.array().cast(
                        "array<struct<attribute:string,field:string,matcher:string,raw:string,input_val:string>>"
                    ),
                )
                if per_rec is not None:
                    # a doc both seeded AND attribute-matched must keep
                    # the matched row (its detail feeds _explanation) —
                    # a bare dropDuplicates keeps whichever partition
                    # arrives first
                    from pyspark.sql.window import Window as _W

                    _w = _W.partitionBy("record_id").orderBy(
                        F.size("detail").desc()
                    )
                    cand = (
                        cand.unionByName(seed_df)
                        .withColumn("_rn", F.row_number().over(_w))
                        .where(F.col("_rn") == 1).drop("_rn")
                    )
                else:
                    cand = seed_df

            # exclusions: already-fetched docs + scope filters
            got = fetched.setdefault(index, set())
            if got:
                cand = cand.where(~F.col("record_id").isin(sorted(got)))
            if excl_ids is not None:
                cand = cand.join(excl_ids, "record_id", "left_anti")
            if incl_ids is not None:
                cand = cand.join(incl_ids.select("record_id"), "record_id", "left_semi")

            # deterministic per-query doc cap (lowest record id first),
            # collected under the per-query time budget (O9)
            new_hits, timed_out = _collect_with_budget(
                cand.orderBy("record_id").limit(config.max_docs_per_query),
                budget_s,
                f"{tag_prefix}-h{hop}-q{qnum}-{index}",
            )
            query_log.append(
                {
                    "hop": hop,
                    "query": qnum,
                    "index": index,
                    "resolvers": list(queryable),
                    "term_resolvers": list(term_queryable),
                    "seed_ids": len(seeds),
                    "hits": len(new_hits),
                    "timed_out": timed_out,
                }
            )
            if not new_hits:
                continue
            hop_new = True
            hit_ids = [r["record_id"] for r in new_hits]
            got.update(hit_ids)
            for r in new_hits:
                doc_id = r["record_id"].split("/", 1)[-1]
                h = Hit(record_id=r["record_id"], index=index, doc_id=doc_id,
                        hop=hop, query=qnum)
                detail = r["detail"] or []
                if config.include_explanation:
                    h.explanation = [
                        {
                            "attribute": d["attribute"],
                            "target_field": d["field"],
                            "target_value": d["raw"],
                            "input_value": d["input_val"],
                            "input_matcher": d["matcher"],
                        }
                        for d in detail
                    ]
                if config.include_score:
                    best: dict[str, float] = {}
                    for d in detail:
                        s = compiled.scores.get(
                            (d["attribute"], d["matcher"], index, d["field"])
                        )
                        if s is not None:
                            best[d["attribute"]] = max(best.get(d["attribute"], 0.0), s)
                    h.score = composite_identity_confidence_score(list(best.values()))
                hits.append(h)

            hop_new_ids.extend(hit_ids)

        # extraction: accumulate the new docs' values (Job.java:1096-1113)
        # — ONE driver round-trip per hop covering every index's new hits
        # (extraction order within a hop cannot affect this hop's
        # matching: `matches` was computed from the pre-hop state, and
        # the hop queue snapshot `awv` was taken before the index loop).
        # Date values participate in later hops only when the INPUT
        # declares the date attribute: the reference's date handling is
        # anchored on the input-side format chain (script_fields
        # reformat, Query.java:77-130), and the golden fixtures show
        # extracted dates matching in testJobDataTypesDate (input date
        # present) but never in testJobScore (input date absent —
        # e.g. a1's expected score 0.5 admits no date match,
        # ResolutionActionIT.java:1593-1630).
        if hop_new_ids:
            input_attrs = set(input.attr_values())
            ext = (
                values_df.where(F.col("record_id").isin(sorted(set(hop_new_ids))))
                .select("source", "attribute", "field", "raw", "ts")
                .distinct()
                .collect()
            )
            from zentity_spark.java_dates import format_java_date, resolve_format_chain

            for row in ext:
                a = row["attribute"]
                atype = compiled.attr_types.get(a)
                # typed validation of extracted values (Value.create at
                # Job.java:841/:852) — a doc value that can't be the
                # attribute's declared type is the reference's
                # `by: zentity` error path (testJobZentityError)
                if atype == "number" and not _NUMBER_RE.match(row["raw"]):
                    raise ValidationException("Expected 'number' attribute data type.")
                if atype == "boolean" and row["raw"] not in ("true", "false"):
                    raise ValidationException("Expected 'boolean' attribute data type.")
                if atype == "date" and a not in input_attrs:
                    continue
                fmt = (input.attr_params().get(a) or {}).get("format")
                serialized = row["raw"]
                if atype == "date":
                    # extracted dates arrive through the script_fields
                    # reformat (Query.java:77-130): the doc's instant
                    # RE-PRINTED through the chain format — real
                    # sub-pattern precision is dropped, exactly like the
                    # reference's SimpleDateFormat script
                    chain_fmt = resolve_format_chain(
                        a, compiled, input.attr_params(), index=row["source"],
                        field=row["field"],
                    )
                    if chain_fmt is not None and row["ts"] is not None:
                        try:
                            serialized = format_java_date(row["ts"], chain_fmt)
                        except ValueError:
                            serialized = row["raw"]
                        fmt = chain_fmt
                state.add(a, serialized, fmt)

        if not hop_new:
            break

    if _capture is not None:
        _capture.update(
            values_df=values_df, compiled=compiled, query_log=query_log
        )
    return hits
