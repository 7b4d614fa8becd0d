"""entity_timeline (SCD2 history) and strip_boilerplate unit tests."""

import pytest
from pyspark.sql import functions as F


def _runs(spark, rows):
    return spark.createDataFrame(
        rows, "run_seq int, entity_id string, attr string, value string")


class TestEntityTimeline:
    def test_islands_and_current(self, spark):
        from zentity_spark.fusion import entity_timeline

        rows = [
            (1, "e1", "name", "alice"),
            (2, "e1", "name", "alice"),
            (3, "e1", "name", "alicia"),
            (4, "e1", "name", "alice"),   # returns → NEW interval
            (1, "e1", "city", "nyc"),
            (3, "e1", "city", "sf"),      # run 2 unobserved: gap is fine
        ]
        out = entity_timeline(_runs(spark, rows)).orderBy(
            "entity_id", "attr", "first_run").collect()
        got = [(r.attr, r.value, r.first_run, r.last_run, r.n_runs,
                r.is_current) for r in out]
        assert got == [
            ("city", "nyc", 1, 1, 1, False),
            ("city", "sf", 3, 3, 1, True),
            ("name", "alice", 1, 2, 2, False),
            ("name", "alicia", 3, 3, 1, False),
            ("name", "alice", 4, 4, 1, True),
        ]

    def test_null_is_a_value(self, spark):
        from zentity_spark.fusion import entity_timeline

        rows = [(1, "e", "a", "x"), (2, "e", "a", None), (3, "e", "a", None),
                (4, "e", "a", "x")]
        out = entity_timeline(_runs(spark, rows)).orderBy(
            "first_run").collect()
        assert [(r.value, r.first_run, r.last_run) for r in out] == [
            ("x", 1, 1), (None, 2, 3), ("x", 4, 4)]

    def test_single_run(self, spark):
        from zentity_spark.fusion import entity_timeline

        out = entity_timeline(_runs(spark, [(1, "e", "a", "v")])).collect()
        r = out[0]
        assert (r.first_run, r.last_run, r.n_runs, r.is_current) == (
            1, 1, 1, True)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


class TestStripBoilerplate:
    def test_threshold_and_order(self, spark):
        from zentity_spark.extras import strip_boilerplate

        nav = "NAV | home | about"
        docs = [(i, "s1", f"{nav}\nbody {i}\nfooter" if i < 3
                 else f"{nav}\nbody {i}") for i in range(4)]
        out = {r.doc_id: r for r in strip_boilerplate(
            _docs(spark, docs), min_df=3, max_df_frac=0.5).collect()}
        # nav: df 4/4 → stripped; footer: df 3/4 ≥ 0.5 and ≥3 → stripped
        assert out[0].clean_text == "body 0"
        assert out[0].n_removed == 2 and out[0].n_lines == 3
        assert out[3].clean_text == "body 3"
        assert out[3].n_removed == 1

    def test_min_df_floor(self, spark):
        from zentity_spark.extras import strip_boilerplate

        docs = [(1, "s", "dup\na"), (2, "s", "dup\nb")]
        out = {r.doc_id: r for r in strip_boilerplate(
            _docs(spark, docs), min_df=3, max_df_frac=0.5).collect()}
        # df=2 meets the 0.5 fraction but not min_df=3 → kept
        assert out[1].clean_text == "dup\na" and out[1].n_removed == 0

    def test_per_stratum_independence(self, spark):
        from zentity_spark.extras import strip_boilerplate

        docs = ([(i, "s1", f"promo\nu{i}") for i in range(4)]
                + [(10, "s2", "promo\nv")])
        out = {r.doc_id: r for r in strip_boilerplate(
            _docs(spark, docs), min_df=3, max_df_frac=0.5).collect()}
        assert out[0].clean_text == "u0"        # stripped in s1 (4/4)
        assert out[10].clean_text == "promo\nv"  # kept in s2 (1/1 < min_df)

    def test_blank_lines_survive(self, spark):
        from zentity_spark.extras import strip_boilerplate

        docs = [(i, "s", f"nav\n\npara {i}") for i in range(3)]
        out = {r.doc_id: r for r in strip_boilerplate(
            _docs(spark, docs), min_df=3, max_df_frac=0.5).collect()}
        assert out[0].clean_text == "\npara 0"

    def test_all_boilerplate_doc_returns_empty(self, spark):
        from zentity_spark.extras import strip_boilerplate

        docs = [(1, "s", "nav"), (2, "s", "nav"), (3, "s", "nav\nreal")]
        out = {r.doc_id: r for r in strip_boilerplate(
            _docs(spark, docs), min_df=3, max_df_frac=0.5).collect()}
        assert out[1].clean_text == "" and out[1].n_removed == 1
        assert out[3].clean_text == "real"

    def test_case_insensitive_key(self, spark):
        from zentity_spark.extras import strip_boilerplate

        docs = [(1, "s", "Nav Bar\nx"), (2, "s", "nav bar\ny"),
                (3, "s", "NAV BAR\nz")]
        out = {r.doc_id: r for r in strip_boilerplate(
            _docs(spark, docs), min_df=3, max_df_frac=0.5).collect()}
        # keys match case-insensitively; removal drops the ORIGINAL line
        assert out[1].clean_text == "x" and out[1].n_removed == 1
        assert out[2].clean_text == "y" and out[3].clean_text == "z"

    def test_validation(self, spark):
        from zentity_spark.extras import strip_boilerplate

        with pytest.raises(ValueError):
            strip_boilerplate(_docs(spark, [(1, "s", "x")]), max_df_frac=0.0)


def test_strip_boilerplate_null_stratum_still_filters(spark):
    """NULL-source docs form their own stratum (sentinel-coalesced):
    repeated lines among them are stripped — equi-joins must not let
    them silently bypass the frequency filter."""
    from zentity_spark.extras import strip_boilerplate

    docs = [(1, None, "nav\nu1"), (2, None, "nav\nu2"),
            (3, None, "nav\nu3"), (4, "s", "nav\nother")]
    out = {r.doc_id: r for r in strip_boilerplate(
        _docs(spark, docs), min_df=3, max_df_frac=0.5).collect()}
    assert out[1].clean_text == "u1" and out[1].n_removed == 1
    assert out[3].clean_text == "u3"
    # the named stratum is independent: df=1 there → kept
    assert out[4].clean_text == "nav\nother" and out[4].n_removed == 0
