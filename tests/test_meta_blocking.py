"""Meta-blocking (blocking.meta_block_pairs): brute-force parity of the
CBS/ARCS/JS weighting, block purging, and WEP pruning semantics."""

from collections import defaultdict

import pytest

from zentity_spark.blocking import meta_block_pairs


BLOCKS = [
    # block -> members; b1 is a singleton (purged), b_stop is oversized
    ("b1", [1]),
    ("b2", [1, 2]),
    ("b3", [1, 2, 3]),
    ("b4", [2, 3]),
    ("b5", [3, 4]),
    ("b_stop", [1, 2, 3, 4, 5, 6, 7]),
]


def _rows():
    return [(k, m) for k, ms in BLOCKS for m in ms]


def _brute(max_block_size=5):
    """Reference implementation over the purged collection."""
    blocks = {k: ms for k, ms in BLOCKS if 2 <= len(ms) <= max_block_size}
    nblocks = defaultdict(int)
    for ms in blocks.values():
        for m in ms:
            nblocks[m] += 1
    agg = defaultdict(lambda: [0, 0.0])
    for ms in blocks.values():
        b = len(ms)
        for i, x in enumerate(ms):
            for y in ms[i + 1:]:
                p = (min(x, y), max(x, y))
                agg[p][0] += 1
                agg[p][1] += 2.0 / (b * (b - 1))
    out = {}
    for (l, r), (cbs, arcs) in agg.items():
        js = cbs / (nblocks[l] + nblocks[r] - cbs)
        out[(l, r)] = (cbs, arcs, js)
    return out


def test_weights_match_brute_force(spark):
    df = spark.createDataFrame(_rows(), "k string, id int")
    got = meta_block_pairs(df, key_col="k", id_col="id",
                           max_block_size=5, prune_scheme=None).collect()
    expect = _brute()
    assert {(r["id_l"], r["id_r"]) for r in got} == set(expect)
    for r in got:
        cbs, arcs, js = expect[(r["id_l"], r["id_r"])]
        assert r["cbs"] == cbs
        assert r["arcs"] == pytest.approx(arcs, abs=1e-12)
        assert r["js"] == pytest.approx(js, abs=1e-12)


def test_purging_excludes_singletons_and_stopword_blocks(spark):
    df = spark.createDataFrame(_rows(), "k string, id int")
    got = meta_block_pairs(df, key_col="k", id_col="id",
                           max_block_size=5, prune_scheme=None).collect()
    # ids 5,6,7 only co-occur inside the oversized block: no edges
    ids = {r["id_l"] for r in got} | {r["id_r"] for r in got}
    assert ids == {1, 2, 3, 4}


def test_wep_keeps_edges_at_or_above_mean(spark):
    df = spark.createDataFrame(_rows(), "k string, id int")
    expect = _brute()
    mean_js = sum(v[2] for v in expect.values()) / len(expect)
    kept = meta_block_pairs(df, key_col="k", id_col="id",
                            max_block_size=5, prune_scheme="js").collect()
    assert {(r["id_l"], r["id_r"]) for r in kept} == {
        p for p, v in expect.items() if v[2] >= mean_js
    }


def test_unknown_scheme_raises(spark):
    df = spark.createDataFrame(_rows(), "k string, id int")
    with pytest.raises(ValueError):
        meta_block_pairs(df, key_col="k", id_col="id", prune_scheme="nope").collect()


def test_planted_near_dups_survive_wep(spark):
    """Token blocking over shingled docs: duplicate docs share many
    5-gram blocks and must survive WEP; unrelated docs must not."""
    import random

    from pyspark.sql import functions as F
    from zentity_spark.extras import shingles

    rng = random.Random(11)
    words = [f"w{i}" for i in range(40)]
    docs = []
    for d in range(20):
        base = rng.choices(words, k=30)
        docs.append((2 * d, " ".join(base)))
        mut = list(base)
        mut[5] = "zz"
        docs.append((2 * d + 1, " ".join(mut)))  # near-duplicate
    df = spark.createDataFrame(docs, "doc_id long, text string")
    blocks = df.select("doc_id", F.explode(shingles(F.col("text"), k=5)).alias("g"))
    kept = meta_block_pairs(blocks, key_col="g", id_col="doc_id",
                            max_block_size=10, prune_scheme="js").collect()
    pairs = {(r["id_l"], r["id_r"]) for r in kept}
    dup_pairs = {(2 * d, 2 * d + 1) for d in range(20)}
    assert dup_pairs <= pairs
    # WEP must prune most incidental token co-occurrence edges
    assert len(pairs - dup_pairs) < len(pairs)
