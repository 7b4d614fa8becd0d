"""Pairwise verification and weight-tier gating.

verify_pairs: candidates → pairs whose resolver truly matches (every
attribute of the resolver matches between the two records — the
conjunction of Resolver.java:31-176 semantics, evaluated per pair).

gate_edges: reproduces the reference's resolver-weight semantics
(Query.java:488-551). Observed behavior to replicate exactly (fixture
TestEntityModelB + ResolutionActionIT.testJobResolverWeight:1384-1397):
the final resolvers clause is the LOWEST-weight queryable group's
disjunction, AND-ed with, per higher-weight resolver, a gate
`should(any-attribute-not-exists, resolver-matches)` — where the
exists-check targets a physical field named EXACTLY like the attribute
(Query.java:521-528), which passes vacuously unless such a field exists
in the data. Pairwise form:

  app(p)  = resolvers applicable to the pair (both records hold values
            for all the resolver's attributes — canQueryResolver analog)
  wmin(p) = min weight over app(p)
  edge(p) ⇔ ∃ matched resolver with weight == wmin(p)
            ∧ ∀ R' ∈ app(p), weight(R') > wmin(p):
                R' matched  ∨  ∃ a ∈ attrs(R'): physical field named `a`
                absent on either record

All expressions are JVM-side higher-order functions over broadcast-sized
model literals; Jaro-Winkler verification is the one Arrow-batched
pandas UDF (no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from zentity_spark.compiler import CompiledModel


def _jw_max_udf():
    """max Jaro-Winkler similarity between two small string sets (the
    per-record value lists of one attribute). Arrow-batched.

    The value-pair cross product is flattened across the WHOLE Arrow
    batch first, scored with ONE vectorized jaro_winkler_pandas call,
    then segment-maxed back to rows (numpy maximum.at) — no per-value
    pandas allocations inside the loop. Kept as a scalar UDF (rather
    than explode→score→groupBy-max) so the predicate stays a plain
    boolean Column composable inside attribute_match_expr's per-resolver
    OR tree, and the pair set isn't re-shuffled for a groupBy."""
    from zentity_spark.matchers import jaro_winkler_pandas

    def jw_max(ls, rs):
        import numpy as np
        import pandas as pd

        flat_l: list = []
        flat_r: list = []
        seg: list = []
        for i, (lv, rv) in enumerate(zip(ls, rs)):
            if lv is None or rv is None:
                continue
            for u in lv:
                for v in rv:
                    flat_l.append(u)
                    flat_r.append(v)
                    seg.append(i)
        out = np.zeros(len(ls), dtype="float64")
        if flat_l:
            sims = jaro_winkler_pandas(
                pd.Series(flat_l), pd.Series(flat_r)
            ).to_numpy(dtype="float64", na_value=0.0)
            np.maximum.at(out, np.asarray(seg, dtype="int64"), sims)
        return pd.Series(out, dtype="float64")

    return pandas_udf(jw_max, "double")


def attribute_match_expr(compiled: CompiledModel, attribute: str,
                         l_entry: Column, r_entry: Column) -> Column:
    """Does `attribute` match between two records? OR over the
    attribute's comparator kinds (per-field OR, Query.java:246-266):

    - key kinds: eq_keys overlap (exact/normalized/nested/soundex)
    - date_window: ∃ (t1,t2): |t1-t2| <= max window (inclusive — the
      reference's range gte/lte, boundary-tested by
      ResolutionActionIT.testJobDataTypesDate)
    - fuzzy/levenshtein: ∃ (u,v): levenshtein(norm u, norm v) <= k
      (AUTO = ES AUTO ladder 0/1/2)
    - jaro_winkler: max-JW >= threshold (pandas UDF)
    """
    kinds = compiled.kinds_for_attribute(attribute)
    preds: list[Column] = []

    both = l_entry.isNotNull() & r_entry.isNotNull()
    if kinds & {"exact", "normalized", "nested", "soundex"}:
        preds.append(
            F.arrays_overlap(l_entry.getField("eq_keys"), r_entry.getField("eq_keys"))
        )
    if "date_window" in kinds:
        w = compiled.date_window_for(attribute)
        preds.append(
            F.exists(
                l_entry.getField("tss"),
                lambda t1: F.exists(
                    r_entry.getField("tss"), lambda t2: F.abs(t1 - t2) <= F.lit(float(w))
                ),
            )
        )
    fuzzy_specs = [
        fs.spec for fs in compiled.field_specs
        if fs.attribute == attribute and fs.spec.kind in ("fuzzy", "levenshtein")
    ]
    if fuzzy_specs:
        thresholds = {s.threshold for s in fuzzy_specs}
        use_auto = "AUTO" in thresholds or None in thresholds
        max_k = max((int(t) for t in thresholds if t not in ("AUTO", None)), default=None)

        def lev_pred(u, v):
            from zentity_spark.matchers import auto_fuzziness_col

            un = F.regexp_replace(u, "[^a-zA-Z0-9]", "")
            vn = F.regexp_replace(v, "[^a-zA-Z0-9]", "")
            d = F.levenshtein(un, vn)
            bound = auto_fuzziness_col(un, vn) if use_auto else F.lit(max_k)
            if use_auto and max_k is not None:
                bound = F.greatest(bound, F.lit(max_k))
            return d <= bound

        preds.append(
            F.exists(
                l_entry.getField("raws"),
                lambda u: F.exists(r_entry.getField("raws"), lambda v: lev_pred(u, v)),
            )
        )
    jw_specs = [
        fs.spec for fs in compiled.field_specs
        if fs.attribute == attribute and fs.spec.kind == "jaro_winkler"
    ]
    if jw_specs:
        thr = min(float(s.threshold) for s in jw_specs)
        jw = _jw_max_udf()
        preds.append(jw(l_entry.getField("raws"), r_entry.getField("raws")) >= F.lit(thr))

    if not preds:
        return F.lit(False)
    combined = preds[0]
    for p in preds[1:]:
        combined = combined | p
    return both & F.coalesce(combined, F.lit(False))


def resolver_match_expr(compiled: CompiledModel, resolver: str,
                        attrs_l: Column, attrs_r: Column) -> Column:
    """AND over the resolver's attributes (Resolver semantics)."""
    cond = F.lit(True)
    for a in compiled.resolver_attrs[resolver]:
        cond = cond & attribute_match_expr(
            compiled, a, attrs_l.getItem(a), attrs_r.getItem(a)
        )
    return cond


def verify_pairs(candidates: DataFrame, compiled: CompiledModel,
                 records: DataFrame | None = None) -> DataFrame:
    """Candidates → verified pairs with the set of matched resolvers.

    Candidates are skinny (resolver, id_l, id_r); the per-record match
    material is joined back here — pairs were already deduped, so each
    record's attribute map is shuffled once per distinct pair side, not
    once per blocking key (records arrive pre-partitioned by record_id
    from build_records)."""
    if records is None:
        raise ValueError("verify_pairs requires the records DataFrame")
    pair_ids = candidates.groupBy("id_l", "id_r").agg(
        F.sort_array(F.collect_set("resolver")).alias("cand_resolvers")
    )
    l = records.select(
        F.col("record_id").alias("id_l"),
        F.col("attrs").alias("attrs_l"),
        F.col("app_resolvers").alias("app_l"),
        F.col("attr_name_fields").alias("fields_l"),
    )
    r = records.select(
        F.col("record_id").alias("id_r"),
        F.col("attrs").alias("attrs_r"),
        F.col("app_resolvers").alias("app_r"),
        F.col("attr_name_fields").alias("fields_r"),
    )
    joined = pair_ids.join(l, "id_l").join(r, "id_r")

    def match_when(rn):
        cond = resolver_match_expr(compiled, rn, F.col("attrs_l"), F.col("attrs_r"))
        if compiled.weights_all_equal:
            # a resolver can only match a pair it blocked together
            # (equality keys) — skip the others' predicates
            cond = F.array_contains(F.col("cand_resolvers"), rn) & cond
        # weighted models: gate correctness needs matched_resolvers to be
        # complete, so evaluate EVERY resolver's predicate on the pair
        return F.when(cond, F.lit(rn))

    matched_col = F.filter(
        F.array(*[match_when(rn) for rn in sorted(compiled.resolver_attrs)]),
        lambda x: x.isNotNull(),
    )
    return (
        joined.withColumn("matched_resolvers", matched_col)
        .where(F.size("matched_resolvers") > 0)
        .select("id_l", "id_r", "matched_resolvers",
                "app_l", "app_r", "fields_l", "fields_r")
    )


def gate_edges(pairs: DataFrame, compiled: CompiledModel) -> DataFrame:
    """Weight-tier gating → final edge set (id_l, id_r, matched_resolvers).

    Fast path: all resolver weights equal (the overwhelmingly common
    case, incl. fixture models A/Arrays/ObjectArrays) → every matched
    pair is an edge; no extra compute.
    """
    if compiled.weights_all_equal:
        return pairs.select("id_l", "id_r", "matched_resolvers")

    weights_map = F.create_map(
        *[x for r, w in compiled.resolver_weights.items() for x in (F.lit(r), F.lit(w))]
    )
    attrs_map = F.create_map(
        *[
            x
            for r, attrs in compiled.resolver_attrs.items()
            for x in (F.lit(r), F.array(*[F.lit(a) for a in attrs]))
        ]
    )
    app_pair = F.array_intersect("app_l", "app_r")
    wmin = F.array_min(F.transform(app_pair, lambda r: weights_map[r]))
    matched_at_wmin = F.exists(
        F.col("matched_resolvers"), lambda r: weights_map[r] == wmin
    )
    higher = F.filter(app_pair, lambda r: weights_map[r] > wmin)
    gate_ok = F.forall(
        higher,
        lambda r: F.array_contains(F.col("matched_resolvers"), r)
        | F.exists(
            attrs_map[r],
            lambda a: ~F.array_contains(F.col("fields_l"), a)
            | ~F.array_contains(F.col("fields_r"), a),
        ),
    )
    return (
        pairs.withColumn("_edge", matched_at_wmin & gate_ok)
        .where(F.col("_edge"))
        .select("id_l", "id_r", "matched_resolvers")
    )
