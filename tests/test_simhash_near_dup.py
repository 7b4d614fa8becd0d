"""simhash_near_dup_pairs: pigeonhole completeness vs a brute-force
all-pairs hamming scan, plus exact-duplicate behavior.

The banded join is supposed to be LOSSLESS for hamming <= bands-1
(VERDICT r1 flagged simhash as computed-but-never-consumed; this is the
consumer). The oracle contract query (entry_queries.q_simhash_near_dup)
checks DuckDB SQL parity at 16 bits; this test checks the default
32-bit config against brute force, which the SQL oracle can't cover
cheaply at scale.
"""

from pyspark.sql import functions as F

from zentity_spark.extras import sim_hash_expr, simhash_near_dup_pairs

TEXTS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumped over the lazy dog"),
    (2, "the quick brown fox jumps over a lazy dog today"),
    (3, "completely different content about spark shuffles and joins"),
    (4, "completely different content about spark shuffles and joins"),
    (5, "entity resolution with blocking keys and pairwise scoring"),
    (6, "entity resolution with blocking keys and pairwise scores"),
    (7, "unrelated short text"),
    (8, "numbers 123 456 789 mixed With Case and Punctuation!!!"),
    (9, "numbers 123 456 789 mixed with case and punctuation"),
]


def _docs(spark):
    return spark.createDataFrame(TEXTS, ["doc_id", "text"])


def test_matches_bruteforce_hamming(spark):
    docs = _docs(spark)
    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", sim_hash_expr(F.col("text"), 32).alias("fp")
        ).collect()
    }
    expected = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(fps[a] ^ fps[b]).count("1")
            if d <= 3:
                expected.add((a, b, d))

    got = {
        (r["id_l"], r["id_r"], r["hamming"])
        for r in simhash_near_dup_pairs(docs, n_bits=32, bands=4, max_hamming=3)
        .collect()
    }
    # pigeonhole guarantee: banded candidates lose NOTHING at hamming<=bands-1
    assert got == expected
    assert expected, "fixture should contain at least one near-dup pair"


def test_exact_duplicates_are_hamming_zero(spark):
    got = {
        (r["id_l"], r["id_r"]): r["hamming"]
        for r in simhash_near_dup_pairs(_docs(spark), n_bits=32).collect()
    }
    assert got.get((3, 4)) == 0
