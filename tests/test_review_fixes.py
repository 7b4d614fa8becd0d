"""Regression tests for the round-3 self-review findings (seeded-path
comparator parity, seed-id existence, closure across sources, composite
underflow). Each test fails on the pre-fix tree."""

import pytest
from pyspark.sql import functions as F

from zentity_spark.model import Model
from zentity_spark.resolve import Input, SeededConfig, resolve


def _turns(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


def _name_model(matcher_clause, matcher_params=None):
    m = {"clause": matcher_clause}
    if matcher_params:
        m["params"] = matcher_params
    return Model({
        "attributes": {"name": {}},
        "resolvers": {"r": {"attributes": ["name"]}},
        "matchers": {"m": m},
        "indices": {
            "idx": {"fields": {"name": {"attribute": "name", "matcher": "m"}}}
        },
    })


def test_seeded_jaro_winkler_matching(spark):
    """A jaro_winkler similarity matcher must match in SEEDED mode too —
    pre-fix, _match_records only consumed kinds fuzzy/levenshtein, so JW
    values rows never joined and a JW-only model returned zero hits."""
    model = _name_model({"similarity": {"method": "jaro_winkler"}})
    turns = _turns(spark, [
        ("idx/1", 0, "user", "name=MARHTA", None, None),   # JW(MARTHA)=0.961
        ("idx/2", 0, "user", "name=MARTHA", None, None),   # exact → 1.0
        ("idx/3", 0, "user", "name=XYZZY", None, None),
    ])
    hits = resolve(spark, turns, model, Input(attributes={"name": ["MARTHA"]}))
    assert {h.doc_id for h in hits} == {"1", "2"}


def test_seeded_jaro_winkler_threshold_param(spark):
    """Per-matcher JW threshold reaches the seeded comparator:
    JW(DWAYNE, DUANE)=0.84 — below the 0.9 default, above 0.8."""
    model = _name_model(
        {"similarity": {"method": "jaro_winkler", "threshold": 0.8}}
    )
    turns = _turns(spark, [
        ("idx/1", 0, "user", "name=DUANE", None, None),
        ("idx/2", 0, "user", "name=XYZZY", None, None),
    ])
    hits = resolve(spark, turns, model, Input(attributes={"name": ["DWAYNE"]}))
    assert {h.doc_id for h in hits} == {"1"}


def test_seeded_fuzzy_declared_numeric_bound(spark):
    """A declared numeric fuzziness must widen the seeded comparator
    beyond AUTO (batch parity, pairs.attribute_match_expr): fuzziness=2
    on 4-char values ('abcd' vs 'abxy', distance 2) links, while the
    pre-fix always-AUTO bound (1 at that length) rejected it."""
    model = _name_model(
        {"match": {"{{ field }}": {"query": "{{ value }}", "fuzziness": 2}}}
    )
    turns = _turns(spark, [
        ("idx/1", 0, "user", "name=abxy", None, None),   # distance 2
        ("idx/2", 0, "user", "name=wxyz", None, None),   # distance 4
    ])
    hits = resolve(spark, turns, model, Input(attributes={"name": ["abcd"]}))
    assert {h.doc_id for h in hits} == {"1"}


def test_seeded_nonexistent_id_no_hit(spark):
    """An ids seed naming a document that does not exist must not
    fabricate a hit (ES ids query = existence)."""
    model = _name_model({"term": {"{{ field }}": "{{ value }}"}})
    turns = _turns(spark, [
        ("idx/1", 0, "user", "name=n1", None, None),
        ("idx/2", 0, "user", "name=n2", None, None),
    ])
    hits = resolve(
        spark, turns, model, Input(ids={"idx": ["1", "nope"]})
    )
    assert {h.doc_id for h in hits} == {"1"}


def test_seeded_seed_and_match_keeps_explanation(spark):
    """A doc that is BOTH id-seeded and attribute-matched at hop 0 must
    keep the matched row's detail (its _explanation) — pre-fix, a bare
    dropDuplicates kept whichever partition arrived first."""
    model = _name_model({"term": {"{{ field }}": "{{ value }}"}})
    turns = _turns(spark, [
        ("idx/1", 0, "user", "name=n1", None, None),
        ("idx/2", 0, "user", "name=nX", None, None),
    ])
    for _ in range(3):  # pre-fix behavior was nondeterministic
        hits = resolve(
            spark, turns, model,
            Input(ids={"idx": ["1"]}, attributes={"name": ["n1"]}),
            SeededConfig(include_explanation=True),
        )
        by_id = {h.doc_id: h for h in hits}
        assert set(by_id) == {"1"}
        assert by_id["1"].explanation, "matched detail lost to the seed row"


def test_scope_include_unresolvable_attribute_matches_nothing(spark):
    """A scope-include attribute with no matcher-bearing field cannot be
    satisfied by ANY document — the constraint must filter everything
    out, not be silently dropped (pre-fix: `continue` turned a
    must-match filter into match-everything)."""
    model = Model({
        "attributes": {"name": {}, "ghost": {}},
        "resolvers": {"r": {"attributes": ["name"]}},
        "matchers": {"m": {"clause": {"term": {"{{ field }}": "{{ value }}"}}}},
        "indices": {
            "idx": {"fields": {"name": {"attribute": "name", "matcher": "m"}}}
        },
    })
    turns = _turns(spark, [
        ("idx/1", 0, "user", "name=n1", None, None),
        ("idx/2", 0, "user", "name=n1", None, None),
    ])
    base = resolve(spark, turns, model, Input(attributes={"name": ["n1"]}))
    assert {h.doc_id for h in base} == {"1", "2"}
    hits = resolve(
        spark, turns, model,
        Input(
            attributes={"name": ["n1"]},
            scope={"include": {"attributes": {"ghost": ["x"]}}},
        ),
    )
    assert hits == []


def test_entity_closure_across_sources(spark):
    """Closure super-records must union member values ACROSS indices:
    a{name,phone} in idx_a and b{name,email} in idx_b merge via r_name;
    c{phone,email} joins only through the CLUSTER's combined phone+email
    — pre-fix, build_records kept one partial super-record per source
    and r_pe never saw the accumulated set."""
    from zentity_spark.pipeline import ResolutionConfig, resolve_all

    model = Model({
        "attributes": {"name": {}, "phone": {}, "email": {}},
        "resolvers": {
            "r_name": {"attributes": ["name"]},
            "r_pe": {"attributes": ["phone", "email"]},
        },
        "matchers": {"m": {"clause": {"term": {"{{ field }}": "{{ value }}"}}}},
        "indices": {
            idx: {"fields": {
                "name": {"attribute": "name", "matcher": "m"},
                "phone": {"attribute": "phone", "matcher": "m"},
                "email": {"attribute": "email", "matcher": "m"},
            }}
            for idx in ("idx_a", "idx_b")
        },
    })
    turns = _turns(spark, [
        ("idx_a/a", 0, "user", "name=n1", None, None),
        ("idx_a/a", 1, "user", "phone=p1", None, None),
        ("idx_b/b", 0, "user", "name=n1", None, None),
        ("idx_b/b", 1, "user", "email=e1", None, None),
        ("idx_b/c", 0, "user", "phone=p1", None, None),
        ("idx_b/c", 1, "user", "email=e1", None, None),
    ])
    res = resolve_all(spark, turns, model, ResolutionConfig(entity_closure=True))
    clusters = {r["record_id"]: r["cluster_id"] for r in res.clusters.collect()}
    assert len({clusters["idx_a/a"], clusters["idx_b/b"], clusters["idx_b/c"]}) == 1


def test_composite_score_underflow_returns_half(spark):
    """A long all-0.5 score list underflows both products to 0.0 —
    under ANSI mode the pre-fix expression raised DIVIDE_BY_ZERO; the
    reference's NaN path maps to 0.5 (the symmetric answer)."""
    from zentity_spark.scoring import composite_score_col

    df = spark.range(1).select(
        composite_score_col(
            F.array_repeat(F.lit(0.5), 5000)
        ).alias("score")
    )
    assert df.collect()[0]["score"] == pytest.approx(0.5)


def test_checkpoint_fingerprint_tracks_matcher_params(spark, tmp_path):
    """A matcher-param edit (fuzziness) must invalidate the snapshot
    fingerprint — pre-fix, the fingerprint hashed only attr types +
    resolver attrs, so an edited model silently resumed stale results."""
    from zentity_spark.pipeline import ResolutionConfig, resolve_all_checkpointed

    # bata/boto: distance 2 via two vowel edits — same soundex code, so
    # the coarse fuzzy blocking key recalls the pair; AUTO at length 4
    # (1 edit) rejects it, declared fuzziness=2 links it
    turns = _turns(spark, [
        ("idx/1", 0, "user", "name=bata", None, None),
        ("idx/2", 0, "user", "name=boto", None, None),
    ])
    out = str(tmp_path / "wh")
    cfg = ResolutionConfig(entity_closure=False)

    def run(fuzz):
        model = _name_model(
            {"match": {"{{ field }}": {"query": "{{ value }}", "fuzziness": fuzz}}}
        )
        return resolve_all_checkpointed(
            spark, turns, model, out, input_token="t", config=cfg
        )

    first = run(0)
    assert sorted(map(tuple, first["clusters"].select("record_id", "cluster_id")
                      .collect()))
    second = run(2)  # wider fuzziness → 1/2 now link
    assert not second["stages"]["candidates"].get("resumed"), (
        "matcher-param change must not resume the old run's candidates"
    )
    cl = {r["record_id"]: r["cluster_id"] for r in second["clusters"].collect()}
    assert cl["idx/1"] == cl["idx/2"]
