"""Transcripts → attribute records.

The pipeline's native input (BASELINE input_hint) is a table of
multi-turn transcripts:

    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string, ts:timestamp

One conversation = one record to resolve. Attribute values are embedded
in turn text as `FIELD=VALUE` (FIXTURES.md §2 encoding of the reference's
`_source` documents: nested paths dotted, arrays as repeated turns) —
the transcript analog of the reference's recursive dotted-path `_source`
extraction (Job.java:264-286 extractValues). Multi-field suffixes that
don't exist in the data (`field_a.clean`) fall back by stripping trailing
path parts, exactly as Job.java:825-853 does.

Stages (all DataFrame ops; one shuffle for the per-record aggregation):
  parse_turns      turn rows → (record_id, source, path, raw)
  build_values     × broadcast field-mapping → long values table with
                   per-matcher-kind blocking/equality keys
  build_records    values → one row per record with a per-attribute
                   map of keys + pairwise payloads (the "wide" record)

Per-row invariant vs the reference: per-turn text equality under stable
(conv_id, turn_idx) ordering — assemble_conversations() preserves it via
sort_array over (turn_idx, text) structs (no window shuffle needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zentity_spark.compiler import CompiledModel

# struct of one attribute's match material on one record:
#  eq_keys  — overlap asserts a match (exact/normalized/nested/soundex)
#  blk_keys — blocking-only recall keys (date buckets, fuzzy norm+soundex);
#             sharing one never asserts a match by itself
#  raws/tss — pairwise-verification payloads (fuzzy / date_window / JW)
ATTR_ENTRY_TYPE = T.StructType(
    [
        T.StructField("eq_keys", T.ArrayType(T.StringType())),
        T.StructField("blk_keys", T.ArrayType(T.StringType())),
        T.StructField("raws", T.ArrayType(T.StringType())),
        T.StructField("tss", T.ArrayType(T.DoubleType())),
    ]
)

_TS_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
]


def parse_ts(raw: Column) -> Column:
    """Best-effort timestamp parse → epoch seconds (double, fractional).

    The reference normalizes date strings between formats with a painless
    script at query time (Query.java:77-130); comparing on the time axis
    is the equivalent (and total-order-correct) batch form.
    """
    ts = F.coalesce(*[F.try_to_timestamp(raw, F.lit(fmt)) for fmt in _TS_FORMATS])
    return ts.cast("double")


def parse_turns(turns: DataFrame) -> DataFrame:
    """FIELD=VALUE turn text → long (record_id, source, path, raw).

    source = conv_id prefix before '/' (FIXTURES.md §2: conv_id =
    `<index>/<doc_id>`); for single-source tables without '/' the whole
    conv_id is its own source and callers pass a source override.
    """
    has_slash = F.instr(F.col("conv_id"), "/") > 0
    return (
        turns.where(F.col("text").isNotNull() & (F.instr(F.col("text"), "=") > 0))
        .select(
            F.col("conv_id").alias("record_id"),
            F.when(has_slash, F.substring_index("conv_id", "/", 1))
            .otherwise(F.lit("default"))
            .alias("source"),
            F.substring_index("text", "=", 1).alias("path"),
            F.expr("substring(text, instr(text, '=') + 1)").alias("raw"),
            # document-order position within the record: turn order. For
            # documents_to_turns-encoded docs, turn order is (path, pos)
            # so per-path order equals the document's array order — the
            # response envelope renders target_value lists in this order
            # (Job.java docIndexFields keeps the _source array order)
            F.col("turn_idx").cast("int").alias("pos"),
        )
    )


def resolve_physical_paths(parsed: DataFrame, compiled: CompiledModel) -> dict:
    """Resolve each model index-field to the physical path present in the
    data, trying the full dotted path then stripping trailing parts
    (Job.java:825-853). One small distinct aggregation over (source,
    path) — schema-sized, not data-sized."""
    present = {
        (r["source"], r["path"])
        for r in parsed.select("source", "path").distinct().collect()
    }
    resolved = {}
    for fs in compiled.field_specs:
        for cand in fs.path_candidates:
            if (fs.index, cand) in present:
                resolved[(fs.index, fs.field)] = cand
                break
    return resolved


def _empty():
    return F.array().cast("array<string>")


def eq_keys_for_kind(kind: Column, raw: Column,
                     norm: Column | None = None) -> Column:
    """Equality keys: sharing one asserts an attribute match.

    Key spaces: exact/nested/normalized share the raw string space — safe
    because strip_punct is idempotent, so a cross-kind collision
    raw(y) == norm(x) implies norm(y) == norm(x), i.e. a genuine match in
    the direction that uses the normalized field. Soundex keys are
    prefixed 'sx:' (codes must not collide with raw values).
    """
    if norm is None:
        norm = F.regexp_replace(raw, "[^a-zA-Z0-9]", "")
    return (
        F.when(kind.isin("exact", "nested"), F.array(raw))
        .when(kind == "normalized", F.array(norm))
        .when(kind == "soundex", F.array(F.concat(F.lit("sx:"), F.soundex(raw))))
        .otherwise(_empty())
    )


def _deletion_keys(norm: Column) -> Column:
    """Symmetric-delete (SymSpell) keys for edit-distance-1 blocking:
    {'d:'+s} ∪ {'d:'+s minus one char}. Two strings within one edit
    (substitution / insertion / deletion) always share a key, and the
    keys are as well-distributed as the values themselves — unlike
    soundex, whose ~9K global code space degenerates into O(n/9K)-sized
    blocks at billion-row scale."""
    dels = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm), F.lit(1))),
        lambda i: F.concat(
            F.lit("d:"),
            norm.substr(F.lit(1), i - 1),
            norm.substr(i + 1, F.length(norm)),
        ),
    )
    return F.array_distinct(F.concat(F.array(F.concat(F.lit("d:"), norm)), dels))


# numeric fuzziness bounds that the deletion-1 scheme fully covers
_DELETION_SAFE_THRESHOLDS = ("0", "1", "0.0", "1.0")


def blk_keys_for_kind(kind: Column, raw: Column, ts: Column, threshold: Column,
                      norm: Column | None = None) -> Column:
    """Blocking-only recall keys: candidates sharing one are VERIFIED
    pairwise, never matched outright.

    - date_window: buckets 'dt:<b>'/'dt:<b+1>' of floor(ts/window) — two
      values within ±window always share a bucket key.
    - fuzzy/levenshtein, fuzziness ≤ 1: deletion-neighborhood keys
      (complete recall for one edit, uniform block sizes at any scale).
    - fuzzy/levenshtein AUTO/2 and jaro_winkler: deletion keys ∪
      normalized form ∪ soundex — the phonetic key keeps recall for
      2-edit/phonetic pairs (coarse; the block-size cap and AQE skew
      handling bound the damage on hot codes).

    Pass `norm` as a MATERIALIZED column when calling in a hot path:
    expressions captured inside _deletion_keys' transform lambda
    re-evaluate PER ELEMENT (PLANS.md rule 1), so an inline
    regexp_replace here runs L times per value — measured 17s of the
    21.5s values stage at 200k entities (round 4); a plain column
    reference is free.
    """
    if norm is None:
        norm = F.regexp_replace(raw, "[^a-zA-Z0-9]", "")
    bucket = F.floor(ts / threshold.cast("double"))
    coarse = F.array_distinct(
        F.concat(
            _deletion_keys(norm),
            F.array(F.concat(F.lit("sx:"), F.soundex(raw))),
        )
    )
    return (
        F.when(
            kind == "date_window",
            F.when(
                ts.isNotNull(),
                F.array(
                    F.concat(F.lit("dt:"), bucket.cast("string")),
                    F.concat(F.lit("dt:"), (bucket + 1).cast("string")),
                ),
            ).otherwise(_empty()),
        )
        .when(
            kind.isin("fuzzy", "levenshtein")
            & threshold.isin(*_DELETION_SAFE_THRESHOLDS),
            _deletion_keys(norm),
        )
        .when(kind.isin("fuzzy", "levenshtein", "jaro_winkler"), coarse)
        .otherwise(_empty())
    )


def build_values(spark: SparkSession, turns: DataFrame, compiled: CompiledModel,
                 physical_paths: dict | None = None) -> DataFrame:
    """Long values table: one row per (record, attribute, field, value).

    Null/blank values are dropped — the reference skips them at query
    build (Query.java:206-208), which is why `type_string_null` never
    links any fixture docs.
    """
    return values_from_parsed(spark, parse_turns(turns), compiled, physical_paths)


def declared_format_ts(raw: Column, fmt: Column) -> Column:
    """F3 date chain, Spark side: parse `raw` with the field's declared
    Java format first, falling back to the trial-format chain.

    `fmt` is the already-merged input > model-attribute > matcher
    `params.format` (Input.java:380-420 availability walk, done by
    CompiledModel.mapping_rows). epoch_millis / epoch_second are handled
    explicitly; any other pattern goes to `try_to_timestamp`, whose
    DateTimeFormatter accepts the same y/M/d/H/m/s/S + quoted-literal
    subset java_dates whitelists driver-side. → epoch seconds (double)."""
    fmt_ts = F.coalesce(
        F.when(fmt == "epoch_millis", raw.try_cast("double") / 1000.0),
        F.when(fmt == "epoch_second", raw.try_cast("double")),
        F.when(
            fmt.isNotNull() & ~fmt.isin("epoch_millis", "epoch_second"),
            F.try_to_timestamp(raw, fmt).cast("double"),
        ),
    )
    return F.coalesce(fmt_ts, parse_ts(raw))


def values_from_parsed(spark: SparkSession, parsed: DataFrame,
                       compiled: CompiledModel,
                       physical_paths: dict | None = None) -> DataFrame:
    """Long values table from an already-parsed leaves table
    (record_id, source, path, raw) — shared by the transcript encoding
    (parse_turns) and the generic JSON document flattener
    (documents.flatten_json_docs)."""
    if physical_paths is None:
        physical_paths = resolve_physical_paths(parsed, compiled)
    rows = compiled.mapping_rows(physical_paths)
    mapping_schema = (
        "source string, path string, field string, attribute string, matcher string,"
        " kind string, threshold string, quality double, attr_type string,"
        " date_fmt string"
    )
    mapping = spark.createDataFrame(rows, mapping_schema) if rows else spark.createDataFrame([], mapping_schema)

    joined = parsed.where(
        F.col("raw").isNotNull() & (F.col("raw") != "") & (F.col("raw") != "null")
    ).join(F.broadcast(mapping), ["source", "path"], "inner")

    ts = F.when(
        F.col("attr_type") == "date",
        declared_format_ts(F.col("raw"), F.col("date_fmt")),
    ).otherwise(F.lit(None).cast("double"))
    return (
        joined.withColumn("ts", ts)
        # materialize the normalized form ONCE per row: captured inside
        # the deletion-keys transform lambda it would re-evaluate per
        # element (PLANS.md rule 1 — this exact inline was 17s of the
        # 21.5s values stage at 200k entities, round 4)
        .withColumn("_norm", F.regexp_replace(F.col("raw"), "[^a-zA-Z0-9]", ""))
        .withColumn("eq_keys", eq_keys_for_kind(F.col("kind"), F.col("raw"),
                                                norm=F.col("_norm")))
        .withColumn(
            "blk_keys",
            blk_keys_for_kind(F.col("kind"), F.col("raw"), F.col("ts"),
                              F.col("threshold"), norm=F.col("_norm")),
        )
        .select(
            "record_id", "source", "attribute", "field", "matcher", "kind",
            "quality", "raw", "ts", "eq_keys", "blk_keys", "pos",
        )
    )


def attr_name_field_presence(parsed: DataFrame, compiled: CompiledModel) -> DataFrame:
    """Per record: which physical fields named EXACTLY like an attribute
    are present with non-blank values. Feeds the weight-tier gates: the
    reference gates lower-weight resolvers with
    must_not(exists(field=<attribute name>)) (Query.java:521-528) — an
    exists check against the ATTRIBUTE name used as a physical field
    name, which passes vacuously unless such a field exists."""
    attr_names = sorted(compiled.model.attributes.keys())
    return (
        parsed.where(
            F.col("path").isin(attr_names)
            & F.col("raw").isNotNull() & (F.col("raw") != "") & (F.col("raw") != "null")
        )
        .groupBy("record_id")
        .agg(F.sort_array(F.collect_set("path")).alias("attr_name_fields"))
    )


def build_records(values: DataFrame, compiled: CompiledModel,
                  parsed: DataFrame | None = None) -> DataFrame:
    """Wide per-record match material:

      record_id, source,
      attrs: map<attribute, struct<keys:array<string>,
                                   raws:array<string>, tss:array<double>>>,
      app_resolvers: array<string>   -- resolvers with values for ALL
                                        their attributes on this record
                                        (canQueryResolver, Job.java:315-346)
      attr_name_fields: array<string> -- for weight-tier exists gates

    raws/tss are kept only for attributes that have a pairwise comparator
    (fuzzy / date_window / JW) — key-kind attributes verify via keys.
    """
    fuzzy_attrs = sorted(
        a for a in compiled.attributes_used()
        if compiled.kinds_for_attribute(a) & {"fuzzy", "levenshtein", "jaro_winkler"}
    )
    date_attrs = sorted(
        a for a in compiled.attributes_used()
        if "date_window" in compiled.kinds_for_attribute(a)
    )
    keep_raw = F.col("attribute").isin(fuzzy_attrs) if fuzzy_attrs else F.lit(False)
    keep_ts = F.col("attribute").isin(date_attrs) if date_attrs else F.lit(False)

    # one explicit shuffle on record_id serves BOTH aggregations below:
    # hash partitioning on record_id satisfies the clustered-distribution
    # requirement of groupBy(record_id, source, attribute) and of
    # groupBy(record_id, source), so Catalyst inserts no further exchange
    per_attr = (
        values.repartition("record_id")
        .groupBy("record_id", "source", "attribute")
        .agg(
            F.array_distinct(F.flatten(F.collect_list("eq_keys"))).alias("eq_keys"),
            F.array_distinct(F.flatten(F.collect_list("blk_keys"))).alias("blk_keys"),
            F.sort_array(
                F.collect_set(F.when(keep_raw, F.col("raw")))
            ).alias("raws"),
            F.sort_array(F.collect_set(F.when(keep_ts, F.col("ts")))).alias("tss"),
        )
    )
    records = per_attr.groupBy("record_id", "source").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct("attribute", F.struct("eq_keys", "blk_keys", "raws", "tss"))
            )
        ).alias("attrs")
    )

    # applicable resolvers per record (driver loop over a model-sized set)
    app = F.array(
        *[
            F.when(
                F.lit(True)
                & _all_attrs_present(compiled.resolver_attrs[r]),
                F.lit(r),
            )
            for r in sorted(compiled.resolver_attrs)
        ]
    )
    records = records.withColumn(
        "app_resolvers", F.filter(app, lambda x: x.isNotNull())
    )

    if parsed is not None and not compiled.weights_all_equal:
        presence = attr_name_field_presence(parsed, compiled)
        records = records.join(presence, "record_id", "left")
        records = records.withColumn(
            "attr_name_fields",
            F.coalesce(F.col("attr_name_fields"), F.array().cast("array<string>")),
        )
    else:
        records = records.withColumn("attr_name_fields", F.array().cast("array<string>"))
    return records


def _all_attrs_present(attrs: list[str]):
    cond = F.lit(True)
    for a in attrs:
        entry = F.col("attrs").getItem(a)
        cond = cond & entry.isNotNull() & (
            (F.size(entry.getField("eq_keys")) > 0)
            | (F.size(entry.getField("blk_keys")) > 0)
        )
    return cond


def assemble_conversations(turns: DataFrame) -> DataFrame:
    """Per-conversation text assembly under stable (conv_id, turn_idx)
    ordering (input_hint invariant): sort_array(collect_list(struct)) in
    a groupBy — one shuffle, no separate window pass."""
    return turns.groupBy("conv_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda s: s.getField("text"),
            ),
        ).alias("conv_text"),
        F.count("*").alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
