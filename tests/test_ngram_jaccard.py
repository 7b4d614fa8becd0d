"""ngram_jaccard_pairs: the PPJoin-style prefix filter must be LOSSLESS
— its output must equal brute-force all-pairs n-gram Jaccard at the same
threshold. Brute force here is computed in the same Spark session with
the same gram definition, so any divergence isolates the prefix filter
itself (the DuckDB oracle `ngram_jaccard` cross-checks the gram
definition end-to-end against an independent engine)."""

import random

import pytest
from pyspark.sql import functions as F

from zentity_spark.extras import ngram_jaccard_pairs, shingles


def _brute_force(spark, docs, n, threshold):
    sets = docs.select(
        F.col("doc_id"), shingles(F.col("text"), n).alias("g")
    )
    l = sets.select(F.col("doc_id").alias("id_l"), F.col("g").alias("g_l"))
    r = sets.select(F.col("doc_id").alias("id_r"), F.col("g").alias("g_r"))
    return (
        l.crossJoin(r)
        .where(F.col("id_l") < F.col("id_r"))
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("g_l", "g_r"))
                / F.size(F.array_union("g_l", "g_r")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard")
    )


def _corpus(spark, seed=7, n_docs=120):
    """Small-vocab corpus with planted near-duplicates and short-doc
    edge cases (doc shorter than the gram width)."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(n_docs):
        words = [rng.choice(vocab) for _ in range(rng.randint(20, 60))]
        rows.append((i, " ".join(words)))
        if i % 10 == 0:  # planted near-dup: mutate a few words
            mutated = list(words)
            for _ in range(3):
                mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            rows.append((i + 100000, " ".join(mutated)))
    rows.append((900001, "solo"))          # 1 word < n=2 → fallback gram
    rows.append((900002, "solo"))          # identical 1-word pair (J=1)
    rows.append((900003, ""))              # empty text
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("threshold", [0.2, 0.5, 0.8])
def test_prefix_filter_lossless(spark, threshold):
    docs = _corpus(spark)
    got = sorted(
        tuple(r) for r in ngram_jaccard_pairs(
            docs, n=2, threshold=threshold
        ).collect()
    )
    want = sorted(
        tuple(r) for r in _brute_force(spark, docs, 2, threshold).collect()
    )
    assert got == want
    assert want, "corpus must actually contain qualifying pairs"


def test_planted_dups_found(spark):
    docs = _corpus(spark)
    pairs = {
        (r.id_l, r.id_r)
        for r in ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()
    }
    # every planted mutation pair survives a 0.5 threshold
    for i in range(0, 120, 10):
        assert (i, i + 100000) in pairs
    # the identical one-word docs pair at J=1 via the fallback gram
    assert (900001, 900002) in pairs


def test_trigram_variant(spark):
    """n is a real parameter: trigrams produce a (generally stricter)
    pair set that still matches brute force."""
    docs = _corpus(spark, seed=13, n_docs=60)
    got = sorted(
        tuple(r) for r in ngram_jaccard_pairs(docs, n=3, threshold=0.4).collect()
    )
    want = sorted(
        tuple(r) for r in _brute_force(spark, docs, 3, 0.4).collect()
    )
    assert got == want
