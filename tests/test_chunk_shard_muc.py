"""chunk_documents / shard_corpus / muc_metrics unit tests.

chunk_documents: boundary math (coverage, overlap, no redundant-suffix
chunks), degenerate inputs. shard_corpus: determinism, ±1 balance,
round-robin positions. muc_metrics: hand-worked Vilain et al. vectors
and degenerate clusterings.
"""

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunkDocuments:
    def test_boundary_math(self, spark):
        from zentity_spark.extras import chunk_documents

        words = [f"w{i}" for i in range(10)]
        d = _docs(spark, [(1, " ".join(words))])
        out = chunk_documents(d, window=8, stride=2).orderBy("chunk_idx")
        rows = out.collect()
        # n=10, w=8, s=2: starts 0 and 2 cover everything; starts 4/6/8
        # would be pure suffixes of the start-2 chunk
        assert [(r.chunk_idx, r.start, r.n_tokens) for r in rows] == [
            (0, 0, 8), (1, 2, 8)]
        assert rows[0].chunk_text == " ".join(words[0:8])
        assert rows[1].chunk_text == " ".join(words[2:10])

    def test_short_doc_single_chunk(self, spark):
        from zentity_spark.extras import chunk_documents

        d = _docs(spark, [(1, "a b c")])
        rows = chunk_documents(d, window=8, stride=2).collect()
        assert len(rows) == 1
        assert (rows[0].start, rows[0].n_tokens, rows[0].chunk_text) == (
            0, 3, "a b c")

    def test_empty_and_null_yield_nothing(self, spark):
        from zentity_spark.extras import chunk_documents

        d = _docs(spark, [(1, ""), (2, "   "), (3, None), (4, "x")])
        rows = chunk_documents(d, window=4).collect()
        assert [(r.doc_id, r.chunk_text) for r in rows] == [(4, "x")]

    def test_disjoint_stride_covers_exactly(self, spark):
        from zentity_spark.extras import chunk_documents

        words = [f"t{i}" for i in range(23)]
        d = _docs(spark, [(1, " ".join(words))])
        rows = chunk_documents(d, window=5, stride=5).orderBy(
            "chunk_idx").collect()
        # disjoint chunks partition the token stream
        rebuilt = " ".join(r.chunk_text for r in rows)
        assert rebuilt == " ".join(words)
        assert [r.n_tokens for r in rows] == [5, 5, 5, 5, 3]

    def test_final_chunk_reaches_end(self, spark):
        from zentity_spark.extras import chunk_documents

        for n in (9, 10, 11, 16, 17):
            words = [str(i) for i in range(n)]
            d = _docs(spark, [(1, " ".join(words))])
            rows = chunk_documents(d, window=8, stride=3).orderBy(
                "chunk_idx").collect()
            last = rows[-1]
            assert last.start + last.n_tokens == n  # covers the end
            # no chunk starts at/after a position already fully covered
            assert all(r.start == i * 3 for i, r in enumerate(rows))
            assert rows[-1].start <= max(n - 8, 0) + 2

    def test_validation(self, spark):
        from zentity_spark.extras import chunk_documents

        d = _docs(spark, [(1, "x")])
        with pytest.raises(ValueError):
            chunk_documents(d, window=0)
        with pytest.raises(ValueError):
            chunk_documents(d, window=4, stride=0)


class TestShardCorpus:
    def test_balance_and_positions(self, spark):
        from zentity_spark.extras import shard_corpus

        d = spark.range(100).select(F.col("id").alias("doc_id"))
        out = shard_corpus(d, n_shards=7).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r.shard, []).append(r)
        sizes = sorted(len(v) for v in by_shard.values())
        assert max(sizes) - min(sizes) <= 1 and sum(sizes) == 100
        for rows in by_shard.values():
            pos = sorted(r.pos_in_shard for r in rows)
            assert pos == list(range(len(rows)))  # contiguous from 0
        # round-robin: rank r lands in shard (r-1) % 7
        assert all(r.shard == (r.rank - 1) % 7 for r in out)

    def test_deterministic(self, spark):
        from zentity_spark.extras import shard_corpus

        d = spark.range(50).select(F.col("id").alias("doc_id"))
        a = {r.doc_id: (r.rank, r.shard) for r in shard_corpus(d, 3).collect()}
        b = {r.doc_id: (r.rank, r.shard) for r in
             shard_corpus(d.repartition(7), 3).collect()}
        assert a == b

    def test_salt_changes_order(self, spark):
        from zentity_spark.extras import shard_corpus

        d = spark.range(50).select(F.col("id").alias("doc_id"))
        a = {r.doc_id: r.rank for r in shard_corpus(d, 3).collect()}
        b = {r.doc_id: r.rank for r in
             shard_corpus(d, 3, salt="other").collect()}
        assert a != b

    def test_validation(self, spark):
        from zentity_spark.extras import shard_corpus

        d = spark.range(3).select(F.col("id").alias("doc_id"))
        with pytest.raises(ValueError):
            shard_corpus(d, 0)


def _clustering(spark, pairs, label):
    return spark.createDataFrame(
        [(i, c) for i, c in pairs], f"record_id string, {label} string")


class TestMucMetrics:
    def test_vilain_over_merge(self, spark):
        from zentity_spark.clustering import muc_metrics

        # pred merges {a,b} and {c} into one cluster: MUC recall 1.0
        # (both gold links present), precision 1/2 (one of the two pred
        # links crosses a gold boundary)
        pred = _clustering(spark, [("a", "x"), ("b", "x"), ("c", "x")],
                           "cluster_id")
        gold = _clustering(spark, [("a", "g1"), ("b", "g1"), ("c", "g2")],
                           "gold_id")
        r = muc_metrics(pred, gold).collect()[0]
        assert r.n_records == 3
        assert r.muc_recall == pytest.approx(1.0)
        assert r.muc_precision == pytest.approx(0.5)
        assert r.muc_f1 == pytest.approx(2 * 0.5 / 1.5)

    def test_symmetry_under_swap(self, spark):
        from zentity_spark.clustering import muc_metrics

        pred = _clustering(spark, [("a", "x"), ("b", "x"), ("c", "y"),
                                   ("d", "y"), ("e", "y")], "cluster_id")
        gold = _clustering(spark, [("a", "1"), ("b", "2"), ("c", "2"),
                                   ("d", "1"), ("e", "1")], "gold_id")
        m1 = muc_metrics(pred, gold).collect()[0]
        m2 = muc_metrics(
            gold.select("record_id", F.col("gold_id").alias("cluster_id")),
            pred.select("record_id", F.col("cluster_id").alias("gold_id")),
        ).collect()[0]
        assert m1.muc_precision == pytest.approx(m2.muc_recall)
        assert m1.muc_recall == pytest.approx(m2.muc_precision)

    def test_perfect_and_singletons(self, spark):
        from zentity_spark.clustering import muc_metrics

        pred = _clustering(spark, [("a", "x"), ("b", "x"), ("c", "y")],
                           "cluster_id")
        gold = _clustering(spark, [("a", "g"), ("b", "g"), ("c", "h")],
                           "gold_id")
        r = muc_metrics(pred, gold).collect()[0]
        assert (r.muc_precision, r.muc_recall, r.muc_f1) == (1.0, 1.0, 1.0)

        singles = _clustering(
            spark, [("a", "1"), ("b", "2"), ("c", "3")], "cluster_id")
        gold_s = _clustering(
            spark, [("a", "1"), ("b", "2"), ("c", "3")], "gold_id")
        r2 = muc_metrics(singles, gold_s).collect()[0]
        # all-singleton: MUC undefined → 0.0 by the CoNLL convention
        assert (r2.muc_precision, r2.muc_recall, r2.muc_f1) == (
            0.0, 0.0, 0.0)

    def test_missing_records_dropped(self, spark):
        from zentity_spark.clustering import muc_metrics

        pred = _clustering(spark, [("a", "x"), ("b", "x"), ("z", "q")],
                           "cluster_id")
        gold = _clustering(spark, [("a", "g"), ("b", "g"), ("w", "h")],
                           "gold_id")
        r = muc_metrics(pred, gold).collect()[0]
        assert r.n_records == 2
        assert (r.muc_precision, r.muc_recall) == (1.0, 1.0)


def _info_reference(pairs):
    """Independent per-record implementation of homogeneity /
    completeness / V-measure / NMI (Counter-based, no contingency
    folds) to cross-check the Spark table formulation."""
    import math
    from collections import Counter

    n = len(pairs)
    cc = Counter(c for c, _ in pairs)
    gc = Counter(g for _, g in pairs)
    cg = Counter(pairs)

    def ent(counts):
        return -sum((v / n) * math.log(v / n) for v in counts.values())

    h_c, h_g = ent(cc), ent(gc)
    h_g_given_c = -sum((v / n) * math.log(v / cc[c])
                       for (c, g), v in cg.items())
    h_c_given_g = -sum((v / n) * math.log(v / gc[g])
                       for (c, g), v in cg.items())
    mi = sum((v / n) * math.log(n * v / (cc[c] * gc[g]))
             for (c, g), v in cg.items())
    h = 1 - h_g_given_c / h_g if h_g > 0 else 1.0
    c_ = 1 - h_c_given_g / h_c if h_c > 0 else 1.0
    v = 2 * h * c_ / (h + c_) if h + c_ > 0 else 0.0
    if h_c > 0 and h_g > 0:
        nmi = mi / math.sqrt(h_c * h_g)
    else:
        nmi = 1.0 if (h_c <= 0 and h_g <= 0) else 0.0
    return h, c_, v, nmi


class TestInformationClusterMetrics:
    def _run(self, spark, pairs):
        from zentity_spark.clustering import information_cluster_metrics

        pred = _clustering(spark, [(f"r{i}", c) for i, (c, _) in
                                   enumerate(pairs)], "cluster_id")
        gold = _clustering(spark, [(f"r{i}", g) for i, (_, g) in
                                   enumerate(pairs)], "gold_id")
        return information_cluster_metrics(pred, gold).collect()[0]

    def test_matches_reference_impl(self, spark):
        pairs = [("x", "1"), ("x", "1"), ("x", "2"), ("y", "2"),
                 ("y", "2"), ("y", "3"), ("z", "3"), ("z", "1")]
        r = self._run(spark, pairs)
        h, c, v, nmi = _info_reference(pairs)
        assert r.homogeneity == pytest.approx(h)
        assert r.completeness == pytest.approx(c)
        assert r.v_measure == pytest.approx(v)
        assert r.nmi == pytest.approx(nmi)

    def test_perfect_match(self, spark):
        pairs = [("x", "1"), ("x", "1"), ("y", "2")]
        r = self._run(spark, pairs)
        assert (r.homogeneity, r.completeness, r.v_measure,
                r.nmi) == (1.0, 1.0, 1.0, pytest.approx(1.0))

    def test_single_gold_class(self, spark):
        # H(G)=0: homogeneity 1.0 by convention; splitting the single
        # class costs completeness; nmi 0.0 (one trivial side)
        pairs = [("x", "g"), ("x", "g"), ("y", "g")]
        r = self._run(spark, pairs)
        assert r.homogeneity == 1.0
        assert r.completeness == pytest.approx(0.0)
        assert r.nmi == 0.0

    def test_both_trivial(self, spark):
        pairs = [("x", "g"), ("x", "g")]
        r = self._run(spark, pairs)
        assert (r.homogeneity, r.completeness, r.v_measure, r.nmi) == (
            1.0, 1.0, 1.0, 1.0)


def test_chunk_documents_grid_matches_python_spec(spark):
    """One Spark job over a grid of document lengths × (window, stride)
    combos, each verified against a brute-force Python spec: start
    positions are the multiples of stride up to the first window that
    reaches the end; every chunk slices [start, start+window); coverage
    is total and the last chunk reaches the document end."""
    from zentity_spark.extras import chunk_documents

    combos = [(1, 1), (2, 1), (3, 2), (5, 5), (8, 3), (8, 8), (13, 7)]
    for w, s in combos:
        docs = [(n, " ".join(f"t{n}_{i}" for i in range(n)))
                for n in range(1, 41)]
        out = {}
        rows = chunk_documents(_docs(spark, docs), window=w,
                               stride=s).collect()
        for r in rows:
            out.setdefault(r.doc_id, []).append(
                (r.chunk_idx, r.start, r.n_tokens, r.chunk_text))
        for n, text in docs:
            words = text.split(" ")
            starts = list(range(0, max(n - w + s - 1, 0) + 1, s))
            expect = [
                (i, st, len(words[st:st + w]), " ".join(words[st:st + w]))
                for i, st in enumerate(starts)
            ]
            got = sorted(out.get(n, []))
            assert got == expect, (n, w, s, got[:3], expect[:3])
            # coverage: every token index falls inside some window and
            # the last chunk reaches the end
            covered = set()
            for _, st, nt, _ in got:
                covered.update(range(st, st + nt))
            assert covered == set(range(n)), (n, w, s)


def test_block_size_stats_buckets_and_pair_mass(spark):
    """Power-of-two bucketing is integer-exact (1→1, 2→2, 3..4→4,
    5..8→8) and n_pairs is the exact comparison mass per bucket."""
    from zentity_spark.blocking import block_size_stats

    rows = []
    # resolver r: one block of 1, one of 3, one of 8 → buckets 1, 4, 8
    for i in range(1):
        rows.append(("r", "k1", f"a{i}"))
    for i in range(3):
        rows.append(("r", "k3", f"b{i}"))
    for i in range(8):
        rows.append(("r", "k8", f"c{i}"))
    # duplicate (key, id) rows must not inflate sizes
    rows.append(("r", "k3", "b0"))
    df = spark.createDataFrame(
        rows, "resolver string, ckey string, record_id string")
    got = {(r.resolver, r.size_bucket): (r.n_blocks, r.n_keys, r.n_pairs)
           for r in block_size_stats(df).collect()}
    assert got == {
        ("r", 1): (1, 1, 0),
        ("r", 4): (1, 3, 3),
        ("r", 8): (1, 8, 28),
    }


def test_cluster_diff_classifies_changes(spark):
    """Hand-built prev/curr with one exact survivor, one split, one
    merge, one all-new cluster, and one dissolved entity."""
    from zentity_spark.clustering import cluster_diff

    prev = spark.createDataFrame(
        [("a1", "E1"), ("a2", "E1"),            # survives exactly
         ("b1", "E2"), ("b2", "E2"),            # splits into c_b1/c_b2
         ("c1", "E3"), ("d1", "E4"),            # merge into one cluster
         ("gone", "E5")],                        # record vanished
        "record_id string, entity_id string")
    curr = spark.createDataFrame(
        [("a1", "ca"), ("a2", "ca"),
         ("b1", "cb1"), ("b2", "cb2"),
         ("c1", "cm"), ("d1", "cm"),
         ("n1", "cn"), ("n2", "cn")],            # brand-new records
        "record_id string, cluster_id string")
    r = cluster_diff(prev, curr).collect()[0]
    assert r.n_prev_entities == 5 and r.n_curr_clusters == 5
    assert r.n_shared_records == 6
    assert r.n_exact == 1          # (ca, E1)
    assert r.n_merge_clusters == 1  # cm holds E3+E4
    assert r.n_split_entities == 1  # E2 over cb1/cb2
    assert r.n_new_clusters == 1    # cn
    assert r.n_dissolved_entities == 1  # E5


def test_chunk_documents_whitespace_edges(spark):
    """Leading/trailing non-space whitespace must not create phantom
    empty tokens or chunks (F.trim strips only 0x20): a trailing
    newline was verified to emit an empty chunk before the fix."""
    from zentity_spark.extras import chunk_documents

    d = _docs(spark, [(1, "a b\n"), (2, "\thello world"),
                      (3, "\n\t"), (4, "x\n\ny \t z\n")])
    rows = chunk_documents(d, window=2, stride=2).orderBy(
        "doc_id", "chunk_idx").collect()
    got = [(r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text) for r in rows]
    assert got == [
        (1, 0, 2, "a b"),
        (2, 0, 2, "hello world"),
        # doc 3 is whitespace-only → no chunks
        (4, 0, 2, "x y"),
        (4, 1, 1, "z"),
    ]
