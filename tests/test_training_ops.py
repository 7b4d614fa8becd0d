"""Training-data pipeline ops added in round 3: PII scrubbing, vocab
stats, greedy sequence packing. The contract queries oracle-check them
against DuckDB on the documents corpus; these tests pin the semantics
on handcrafted edges (pattern order, budget boundaries, oversized
docs)."""

import pytest

from zentity_spark.extras import pack_sequences, pii_scrub, vocab_stats


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scrub_patterns_and_order(spark):
    rows = [
        (0, "mail a.b+c@ex-1.co.uk and 415-555-1234 from 10.0.0.1"),
        # 16-digit card must be eaten by <CC> before the phone pattern
        # can bite into it
        (1, "card 4111 1111 1111 1111 thanks"),
        (2, "nothing sensitive here"),
        (3, "two mails x@y.io z@w.ai one ip 8.8.8.8"),
    ]
    got = {r["doc_id"]: r for r in pii_scrub(docs_df(spark, rows)).collect()}
    assert (got[0]["n_email"], got[0]["n_phone"], got[0]["n_ip"]) == (1, 1, 1)
    assert "<EMAIL>" in got[0]["clean_text"] and "<PHONE>" in got[0]["clean_text"]
    assert "<IP>" in got[0]["clean_text"]
    assert got[1]["n_cc"] == 1 and got[1]["n_phone"] == 0
    assert got[1]["clean_text"] == "card <CC> thanks"
    assert got[2]["clean_text"] == rows[2][1]
    assert sum(got[2][c] for c in ("n_email", "n_cc", "n_phone", "n_ip")) == 0
    assert got[3]["n_email"] == 2 and got[3]["n_ip"] == 1


def test_vocab_stats_tf_df_idf(spark):
    import math

    rows = [
        (0, "alpha beta alpha"),
        (1, "alpha gamma"),
        (2, "beta; beta, gamma!"),
    ]
    got = {r["token"]: r for r in vocab_stats(docs_df(spark, rows)).collect()}
    assert (got["alpha"]["tf"], got["alpha"]["df"]) == (3, 2)
    assert (got["beta"]["tf"], got["beta"]["df"]) == (3, 2)
    assert (got["gamma"]["tf"], got["gamma"]["df"]) == (2, 2)
    assert got["alpha"]["idf"] == pytest.approx(round(math.log(3 / 2), 6))


def test_pack_sequences_greedy_boundaries(spark):
    # single bucket; token counts 100, 28, 1, 200, 5:
    #   bin0 = [100, 28]            (fill 128 == budget exactly)
    #   bin1 = [1]? no — 128+1 > 128 -> bin1 starts with 1... then 200
    #   exceeds -> bin2 alone; 5 -> bin3
    rows = [
        (0, " ".join(["w"] * 100)),
        (8, " ".join(["w"] * 28)),
        (16, "w"),
        (24, " ".join(["w"] * 200)),  # oversized: own bin
        (32, " ".join(["w"] * 5)),
    ]
    got = {
        r["doc_id"]: r
        for r in pack_sequences(docs_df(spark, rows), budget=128,
                                n_buckets=8).collect()
    }
    assert all(r["bucket"] == 0 for r in got.values())
    assert [got[i]["n_tokens"] for i in (0, 8, 16, 24, 32)] == [100, 28, 1, 200, 5]
    assert (got[0]["bin_idx"], got[0]["pos_in_bin"]) == (0, 0)
    assert (got[8]["bin_idx"], got[8]["pos_in_bin"]) == (0, 1)  # fits exactly
    assert (got[16]["bin_idx"], got[16]["pos_in_bin"]) == (1, 0)
    assert (got[24]["bin_idx"], got[24]["pos_in_bin"]) == (2, 0)  # oversized alone
    assert (got[32]["bin_idx"], got[32]["pos_in_bin"]) == (3, 0)


def test_pack_sequences_buckets_independent(spark):
    rows = [(i, " ".join(["w"] * 60)) for i in range(8)]
    got = pack_sequences(docs_df(spark, rows), budget=128, n_buckets=4).collect()
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    # each bucket has two 60-token docs -> both fit in bin 0
    for rs in by_bucket.values():
        assert sorted((r["bin_idx"], r["pos_in_bin"]) for r in rs) == [(0, 0), (0, 1)]


def test_curate_corpus_composition(spark):
    from zentity_spark.extras import curate_corpus

    long24 = " ".join(f"tok{i}" for i in range(24))
    other24 = " ".join(f"word{i}" for i in range(24))
    rows = [
        (0, long24),                        # survivor
        (1, long24),                        # exact dup of 0 -> dropped
        (2, "too short"),                   # quality gate -> dropped
        (3, " ".join(["the"] * 200)),       # oversized survivor (own bin)
        (8, other24),                       # distinct text, same bucket as 0
    ]
    got = {r["doc_id"]: r for r in curate_corpus(
        docs_df(spark, rows), min_tokens=24, budget=256, n_buckets=8
    ).collect()}
    assert set(got) == {0, 3, 8}            # 1 deduped, 2 quality-dropped
    # bucket 0 packs docs 0 and 8 (24+24 <= 256) into bin 0
    assert (got[0]["bin_idx"], got[0]["pos_in_bin"]) == (0, 0)
    assert (got[8]["bin_idx"], got[8]["pos_in_bin"]) == (0, 1)
    assert got[3]["bucket"] == 3 and got[3]["bin_idx"] == 0
    assert got[3]["pred_lang"] == "en"      # 200x 'the'
    assert got[0]["n_tokens"] == 24


def test_decontaminate_edges(spark):
    from pyspark.sql import functions as F

    from zentity_spark.extras import decontaminate

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # 9 tokens -> 2 distinct 8-grams
    rows = [
        (0, base),                      # benchmark member: ratio 1.0
        (1, "a b c d e f g"),           # 7 tokens -> zero 8-grams
        (2, base + " tail1 tail2"),     # shares both of doc 0's grams
        (3, "x1 x2 x3 x4 x5 x6 x7 x8"), # 1 gram, no overlap
    ]
    docs = docs_df(spark, rows)
    bench = docs.where(F.col("doc_id") == 0)
    got = {r["doc_id"]: r for r in decontaminate(docs, bench, n=8).collect()}
    assert got[0]["n_ngrams"] == 2 and got[0]["contamination"] == 1.0
    assert got[0]["contaminated"]
    # gram-less docs survive (explode_outer) with ratio 0
    assert got[1]["n_ngrams"] == 0 and got[1]["contamination"] == 0.0
    assert not got[1]["contaminated"]
    assert got[2]["n_hits"] == 2 and got[2]["n_ngrams"] == 4
    assert got[2]["contamination"] == 0.5 and got[2]["contaminated"]
    assert got[3]["n_hits"] == 0 and not got[3]["contaminated"]


def test_stratified_sample_deterministic_and_bounded(spark):
    import hashlib

    from pyspark.sql import functions as F

    from zentity_spark.extras import stratified_sample

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("stratum"),
        F.lit("t").alias("text"),
    )
    rates = {"0": 0.5, "1": 0.1}
    kept = stratified_sample(docs, rates).collect()
    # exact replica of the rule in pure python -> identical keep set
    def keep(i):
        k = hashlib.md5(f"zs1:{i}".encode()).hexdigest()[:8]
        thr = format(int(rates[str(i % 2)] * 0x100000000), "09x")
        return "0" + k < thr
    expect = {i for i in range(2000) if keep(i)}
    assert {r["doc_id"] for r in kept} == expect
    # rates hold within a loose tolerance on 1000 per stratum
    n0 = sum(1 for r in kept if r["stratum"] == "0")
    n1 = sum(1 for r in kept if r["stratum"] == "1")
    assert abs(n0 / 1000 - 0.5) < 0.08 and abs(n1 / 1000 - 0.1) < 0.05
    # absent stratum -> dropped entirely
    only0 = stratified_sample(docs, {"0": 1.0}).collect()
    assert {r["stratum"] for r in only0} == {"0"} and len(only0) == 1000


def test_domain_mixture_fractions(spark):
    from zentity_spark.extras import domain_mixture

    docs = spark.createDataFrame(
        [(0, "a", "one two three"), (1, "a", "four five"),
         (2, "b", "six")],
        "doc_id long, stratum string, text string",
    )
    got = {r["stratum"]: r for r in domain_mixture(docs).collect()}
    assert got["a"]["n_docs"] == 2 and got["a"]["n_tokens"] == 5
    assert got["b"]["n_docs"] == 1 and got["b"]["n_tokens"] == 1
    assert got["a"]["doc_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["a"]["token_frac"] == pytest.approx(5 / 6, abs=1e-6)


def test_near_dup_dedup_transitive_groups(spark):
    from zentity_spark.extras import near_dup_dedup

    # a & b share most shingles; b & c share most shingles; a & c are
    # farther apart — transitivity must still group all three. d is a
    # singleton. Ids chosen so numeric min != lexicographic string min
    # (2 vs 10): the zero-pad before CC keeps the keeper numeric.
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        (10, base + " tailb"),
        (2, base + " taila"),
        (30, base.replace("w1 ", "") + " tailb tailc"),
        (40, "completely unrelated text body here"),
    ]
    got = {r["doc_id"]: r for r in
           near_dup_dedup(docs_df(spark, rows), k=3, bands=4,
                          jaccard_threshold=0.5).collect()}
    assert got[2]["group_id"] == 2 and got[2]["kept"]
    assert got[10]["group_id"] == 2 and not got[10]["kept"]
    assert got[30]["group_id"] == 2 and not got[30]["kept"]
    assert got[40]["group_id"] == 40 and got[40]["kept"]


def test_decontaminate_null_text(spark):
    from pyspark.sql import functions as F

    from zentity_spark.extras import decontaminate

    docs = spark.createDataFrame(
        [(0, "w1 w2 w3 w4 w5 w6 w7 w8 w9"), (1, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           decontaminate(docs, docs.where(F.col("doc_id") == 0), n=8).collect()}
    # a NULL-text doc has ZERO n-grams, not an unknown set — every
    # output column must stay non-null (downstream filters on
    # `contaminated` treat NULL as neither true nor false)
    assert got[1]["n_ngrams"] == 0 and got[1]["n_hits"] == 0
    assert got[1]["contamination"] == 0.0 and got[1]["contaminated"] is False


def test_near_dup_dedup_string_ids(spark):
    from zentity_spark.extras import near_dup_dedup

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = spark.createDataFrame(
        [("doc_b", base + " x"), ("doc_a", base + " y"), ("zzz", "unrelated words here")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in
           near_dup_dedup(docs, k=3, bands=4, jaccard_threshold=0.5).collect()}
    # string ids must survive the padded-CC round trip (no cast-to-long
    # nulling); keeper = min by padded order = plain string min here
    assert got["doc_a"]["group_id"] == "doc_a" and got["doc_a"]["kept"]
    assert got["doc_b"]["group_id"] == "doc_a" and not got["doc_b"]["kept"]
    assert got["zzz"]["group_id"] == "zzz" and got["zzz"]["kept"]
