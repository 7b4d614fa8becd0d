"""Blocking: per-resolver composite keys → candidate pairs.

The reference's candidate generation is the resolver filter tree — the
disjunction over resolvers of the conjunction over their attributes
(Query.java:277-332) — executed by Elasticsearch's inverted index. The
batch analog: each record emits, per resolver, the cartesian product of
its per-attribute key sets as composite blocking keys; candidates are the
equi-self-join on (resolver, key). Equality matchers contribute exact
keys (a shared composite ⇒ those attributes truly match); date-window
and fuzzy matchers contribute coarser recall keys and are re-verified
pairwise (pairs.py).

Scale notes (the part Elasticsearch did for the reference):
- ONE self-join for all resolvers: per-resolver key rows are unioned
  before the join, so Spark plans a single shuffle on (resolver, key).
- AQE skew-join splitting is expected ON (pipeline sets
  spark.sql.adaptive.skewJoin.enabled); a hot composite key (e.g. a
  constant attribute value) otherwise serializes one task.
- max_block_size caps degenerate blocks deterministically: blocks larger
  than the cap are DROPPED and counted in the lineage metrics — a block
  of b records creates b(b-1)/2 pairs, so an uncapped hot key is O(n²).
  (The reference has the same guard in spirit: max_docs_per_query,
  Job.java:70.)
- max_keys_per_record caps the per-record composite-key explosion from
  multi-valued attributes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, DoubleType, FloatType

from zentity_spark.compiler import CompiledModel

SEP = "\x1f"


def _composite_keys(attrs_col: Column, attributes: list[str],
                    max_keys: int) -> Column:
    """Cartesian product of per-attribute key sets (eq ∪ blk keys),
    folded entirely with JVM higher-order functions — no Python per row.
    Returns array<string>; empty when any attribute has no keys (the
    record can't enter this resolver's blocks — canQueryResolver analog,
    Job.java:315-346)."""
    acc = F.array(F.lit(""))
    for a in attributes:
        entry = attrs_col.getItem(a)
        keys = F.when(
            entry.isNotNull(),
            F.array_distinct(
                F.concat(entry.getField("eq_keys"), entry.getField("blk_keys"))
            ),
        ).otherwise(F.array().cast("array<string>"))
        acc = F.flatten(
            F.transform(
                keys,
                lambda k: F.transform(acc, lambda x: F.concat(x, F.lit(SEP), k)),
            )
        )
    return F.slice(acc, 1, max_keys)


def blocking_keys(records: DataFrame, compiled: CompiledModel,
                  resolvers: list[str] | None = None,
                  max_keys_per_record: int = 256,
                  hash_keys: bool = True,
                  return_key_capped: bool = False):
    """records (wide) → (resolver, ckey, record_id, source, attrs,
    app_resolvers, attr_name_fields). One output row per composite key.

    ckey is a 64-bit hash of the concatenated per-attribute keys: the
    join key stays 8 bytes however wide the resolver is; collisions are
    harmless because pairs.verify_pairs re-checks every attribute.

    With return_key_capped=True, also returns a (resolver, record_id)
    DataFrame of records whose composite-key set was TRUNCATED by
    max_keys_per_record — a recall loss that must reach the lineage
    metrics, not happen silently. Detection is free of double
    computation: the key array is sliced to max_keys+1 and posexplode'd
    once; a row at pos == max_keys is the truncation sentinel (excluded
    from the blocks output)."""
    resolvers = resolvers if resolvers is not None else sorted(compiled.resolver_attrs)
    parts = []
    cap_parts = []
    for r in resolvers:
        attrs = compiled.resolver_attrs[r]
        ck = _composite_keys(F.col("attrs"), attrs, max_keys_per_record + 1)
        # SKINNY rows: (resolver, key, id) only — match material is
        # re-joined per record AFTER pair dedup (pairs.verify_pairs), so
        # the blocking shuffle moves 3 small columns, not per-key copies
        # of the attribute maps
        staged = records.select(
            F.lit(r).alias("resolver"),
            F.posexplode(ck).alias("pos", "ckey_s"),
            "record_id",
        )
        if return_key_capped:
            cap_parts.append(
                staged.where(F.col("pos") >= max_keys_per_record).select(
                    "resolver", "record_id"
                )
            )
        part = staged.where(F.col("pos") < max_keys_per_record).drop("pos")
        if hash_keys:
            part = part.withColumn("ckey", F.xxhash64("resolver", "ckey_s")).drop("ckey_s")
        else:
            part = part.withColumnRenamed("ckey_s", "ckey")
        parts.append(part)
    blocks = reduce(DataFrame.unionByName, parts)
    if return_key_capped:
        return blocks, reduce(DataFrame.unionByName, cap_parts)
    return blocks


def candidate_pairs(blocks: DataFrame, max_block_size: int | None = 10000,
                    salt_threshold: int | None = 2000,
                    salt_target: int = 500) -> tuple[DataFrame, DataFrame]:
    """Self-join blocks on (resolver, ckey) → candidate pairs. Returns
    (candidates, dropped_blocks_metrics).

    Skew handling, in two tiers (north_star: "salted keys on hot
    blocks" + deterministic caps):

    - blocks larger than max_block_size (degenerate hot keys) are
      excluded deterministically and reported in the lineage metrics —
      at production scale an uncapped hot key is O(b²) pairs and must be
      an explicit decision, not an accident;
    - blocks larger than salt_threshold (hot but legitimate) go through
      a SALTED self-join: the left side gets salt = hash(id) mod s with
      s = ceil(block_size / salt_target), the right side is replicated
      across all s salts, and the join key becomes (resolver, ckey,
      salt). Every pair is still produced exactly once (pair (x, y),
      x < y, meets only at x's salt), but no single task owns the whole
      b² — the block's pair generation spreads over s tasks. AQE
      skew-join splitting remains on as the runtime backstop.
    """
    sizes = None
    if max_block_size is not None or salt_threshold is not None:
        sizes = blocks.groupBy("resolver", "ckey").agg(F.count("*").alias("block_size"))
    if max_block_size is not None:
        dropped = sizes.where(F.col("block_size") > max_block_size)
        blocks = blocks.join(
            F.broadcast(dropped.select("resolver", "ckey")),
            ["resolver", "ckey"],
            "left_anti",
        )
    else:
        dropped = None

    def pair_join(b: DataFrame, extra_key: list[str]) -> DataFrame:
        left = b.select("resolver", "ckey", *extra_key, F.col("record_id").alias("id_l"))
        right = b.select("resolver", "ckey", *extra_key, F.col("record_id").alias("id_r"))
        return (
            left.join(right, ["resolver", "ckey", *extra_key])
            .where(F.col("id_l") < F.col("id_r"))
            .select("resolver", "id_l", "id_r")
        )

    if salt_threshold is None:
        cand = pair_join(blocks, [])
    else:
        hot_keys = sizes.where(F.col("block_size") > salt_threshold).select(
            "resolver", "ckey", "block_size"
        )
        sized = blocks.join(F.broadcast(hot_keys), ["resolver", "ckey"], "left")
        cold = sized.where(F.col("block_size").isNull()).drop("block_size")
        hot = sized.where(F.col("block_size").isNotNull()).withColumn(
            "n_salts", F.ceil(F.col("block_size") / F.lit(salt_target)).cast("int")
        )
        hot_l = hot.withColumn(
            "salt", F.pmod(F.xxhash64("record_id"), F.col("n_salts")).cast("int")
        )
        # right side replicated across every salt of its block
        hot_r = hot.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.col("n_salts") - 1))
        )
        hot_pairs = (
            hot_l.select("resolver", "ckey", "salt", F.col("record_id").alias("id_l"))
            .join(
                hot_r.select("resolver", "ckey", "salt", F.col("record_id").alias("id_r")),
                ["resolver", "ckey", "salt"],
            )
            .where(F.col("id_l") < F.col("id_r"))
            .select("resolver", "id_l", "id_r")
        )
        cand = pair_join(cold, []).unionByName(hot_pairs)

    return cand.dropDuplicates(["resolver", "id_l", "id_r"]), dropped


def global_rank(df: DataFrame, sort_cols: list[str],
                rank_col: str = "rank") -> DataFrame:
    """Dense global row-number by `sort_cols` WITHOUT a single-partition
    window (the naive `row_number() OVER (ORDER BY ...)` serializes the
    whole table through one task — a non-starter at 10¹² rows).

    The scalable two-pass shape: repartitionByRange on the sort columns
    (range partitions are emitted in key order, so partition i holds
    keys strictly below partition i+1), rank within each partition, then
    shift each partition by the total row count of the partitions before
    it. The per-partition counts are O(#partitions) rows — collected
    once and rebroadcast as a join against literals. Ranks are
    1-based and match ORDER BY exactly when `sort_cols` is a total
    order (callers append a unique id as the last sort column)."""
    parted = df.repartitionByRange(*[F.col(c) for c in sort_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.localCheckpoint(eager=True)
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in sort_cols])
    local = parted.withColumn("_rn", F.row_number().over(w))
    counts = sorted(
        (r["_pid"], r["n"])
        for r in parted.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def global_cumsum(df: DataFrame, sort_cols: list[str],
                  sum_cols: list[str], prefix: str = "cum_") -> DataFrame:
    """Global running totals of `sum_cols` in `sort_cols` order WITHOUT
    a single-partition window — the cumulative-sum sibling of
    global_rank, same two-pass shape: range-partition on the sort
    columns (partition i holds keys strictly below partition i+1),
    windowed cumsum within each partition, then shift each partition by
    the preceding partitions' column totals. The offsets table is
    O(#partitions × #columns), collected once and rebroadcast. Each
    output row's `{prefix}{col}` includes its OWN row (inclusive
    running total), exactly matching `SUM(col) OVER (ORDER BY ...)`
    with the default RANGE frame when `sort_cols` is a total order."""
    parted = df.repartitionByRange(*[F.col(c) for c in sort_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.localCheckpoint(eager=True)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in sort_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parted
    for c in sum_cols:
        local = local.withColumn(f"{prefix}{c}", F.sum(F.col(c)).over(w))
    totals = sorted(
        (r["_pid"], tuple(r[f"_t_{c}"] for c in sum_cols))
        for r in parted.groupBy("_pid")
        .agg(*[F.sum(F.col(c)).alias(f"_t_{c}") for c in sum_cols])
        .collect()
    )
    # offset dtype follows the SOURCE column: fractional sums must not
    # be truncated through int() / a long schema (cum_<col> over a
    # double column would otherwise drift by up to a unit per
    # partition), and DECIMAL offsets must not round-trip through
    # binary float64 (exactness past 2^53 is why decimals were chosen)
    # — decimal totals accumulate as Python Decimal (exact) and land in
    # a DECIMAL(38, s) offsets column
    from decimal import Decimal

    def _kind(c):
        dt = df.schema[c].dataType
        if isinstance(dt, DecimalType):
            return ("decimal", dt.scale)
        if isinstance(dt, (DoubleType, FloatType)):
            return ("double", None)
        return ("long", None)

    kinds = [_kind(c) for c in sum_cols]
    zero = {"decimal": Decimal(0), "double": 0.0, "long": 0}
    conv = {"decimal": lambda a: a, "double": float, "long": int}
    offsets, acc = [], [zero[k] for k, _ in kinds]
    for pid, ts in totals:
        offsets.append((int(pid),) + tuple(
            conv[k](a) for a, (k, _) in zip(acc, kinds)
        ))
        acc = [a + (t or zero[k]) for a, t, (k, _) in zip(acc, ts, kinds)]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets,
        "_pid int, " + ", ".join(
            f"_off_{c} " + (f"decimal(38,{s})" if k == "decimal" else k)
            for c, (k, s) in zip(sum_cols, kinds)
        ),
    )
    out = local.join(F.broadcast(off_df), "_pid")
    for c in sum_cols:
        out = out.withColumn(
            f"{prefix}{c}", F.col(f"{prefix}{c}") + F.col(f"_off_{c}")
        ).drop(f"_off_{c}")
    return out.drop("_pid")


def sorted_neighborhood_pairs(records: DataFrame, key_col: str,
                              id_col: str, window: int = 5) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández & Stolfo
    1995, the merge/purge method) — the classic alternative to key-
    equality blocking when match keys are noisy: sort all records by a
    lexicographic key and pair every record with its `window-1`
    successors in sort order. → (id_a, id_b, dist) with dist = rank
    distance ∈ [1, window-1], ordered pairs (id_a at the lower rank).

    Complements the resolver blocks (blocking_keys/candidate_pairs):
    equality blocking misses pairs whose keys differ in a low-order
    character; SNM catches any pair the sort places within the window.
    Multi-pass SNM = union of calls with different key expressions.

    Scale design: the only global structure is the rank, built by
    global_rank's two-pass range-partition scheme (no single-partition
    window). Pair generation is rank arithmetic: each record explodes
    to its window-1 successor ranks and equi-joins the ranked table on
    that integer — one O(n·(window-1)) hash/SMJ shuffle on a dense
    numeric key (uniform by construction: every rank appears at most
    window-1 times), no all-pairs product, no skew. Ties in `key_col`
    are broken by `id_col`, so output is deterministic."""
    if window < 2:
        raise ValueError("sorted_neighborhood_pairs: window must be >= 2")
    ranked = global_rank(
        records.select(F.col(key_col).alias("_key"), F.col(id_col).alias("_id")),
        ["_key", "_id"],
    )
    probes = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("rank").alias("_rank_a"),
        F.explode(
            F.sequence(F.col("rank") + 1, F.col("rank") + (window - 1))
        ).alias("rank"),
    )
    return (
        probes.join(ranked.select("rank", F.col("_id").alias("id_b")), "rank")
        .select(
            "id_a", "id_b",
            (F.col("rank") - F.col("_rank_a")).cast("int").alias("dist"),
        )
    )

def meta_block_pairs(blocks: DataFrame, key_col: str = "ckey",
                     id_col: str = "record_id",
                     max_block_size: int | None = 100,
                     prune_scheme: str | None = "js") -> DataFrame:
    """Meta-blocking (Papadakis et al., TKDE 2013): refine an OVERLAPPING
    block collection — e.g. token/shingle blocking, where every token is
    a block and blocks share most of their records — by weighting each
    co-occurring record pair with block-graph evidence and pruning the
    weak edges, instead of comparing every co-occurring pair.

    Input: (key_col, id_col) rows — one row per (block, member). Steps:

    1. BLOCK PURGING: drop singleton blocks (no pairs) and blocks larger
       than max_block_size (stop-word keys; O(b²) pairs of near-zero
       evidence — the same degenerate-key guard as candidate_pairs).
    2. EDGE WEIGHTING, one pair-shuffle total: pairs are generated inside
       each surviving block carrying (block size, each side's total block
       count), then groupBy(pair) folds them into the standard schemes —
       cbs   = #shared blocks (Common Blocks Scheme),
       arcs  = Σ_b 1/(|b|·(|b|-1)/2) (Aggregated Reciprocal Comparisons),
       js    = cbs / (n_l + n_r - cbs) (Jaccard of the two block lists).
       Per-record block counts are attached to the skinny block rows
       BEFORE pair generation, so no post-aggregation join on the (much
       larger) pair table is needed.
    3. WEIGHT-EDGE PRUNING (WEP): keep edges whose `prune_scheme` weight
       is >= the global mean edge weight (the classic unsupervised
       threshold). prune_scheme=None returns all weighted edges.

    Returns (id_l, id_r, cbs long, arcs double, js double) pairs with
    id_l < id_r. Scale shape: one groupBy(key) for sizes, one
    groupBy(id) for counts (both map-side combined), one within-block
    self-join on the block key, one groupBy(pair) — no all-pairs
    product, and the mean threshold is a single O(1) aggregate.
    """
    b = blocks.select(F.col(key_col).alias("_bkey"), F.col(id_col).alias("_id"))
    sizes = b.groupBy("_bkey").agg(F.count("*").alias("_bsize"))
    sizes = sizes.where(F.col("_bsize") >= 2)
    if max_block_size is not None:
        sizes = sizes.where(F.col("_bsize") <= max_block_size)
    purged = b.join(sizes, "_bkey")  # purge + attach |b|
    # per-record block counts over the PURGED collection, so js is the
    # Jaccard of the block lists that can actually produce comparisons
    counts = purged.groupBy("_id").agg(F.count("*").alias("_nblocks"))
    member = purged.join(counts, "_id")
    left = member.select(
        "_bkey", "_bsize",
        F.col("_id").alias("id_l"), F.col("_nblocks").alias("_n_l"),
    )
    right = member.select(
        "_bkey",
        F.col("_id").alias("id_r"), F.col("_nblocks").alias("_n_r"),
    )
    pair_rows = (
        left.join(right, "_bkey")
        .where(F.col("id_l") < F.col("id_r"))
    )
    weighted = (
        pair_rows.groupBy("id_l", "id_r")
        .agg(
            F.count("*").alias("cbs"),
            F.sum(2.0 / (F.col("_bsize") * (F.col("_bsize") - F.lit(1)))).alias("arcs"),
            F.max("_n_l").alias("_n_l"),
            F.max("_n_r").alias("_n_r"),
        )
        .withColumn(
            "js",
            F.col("cbs") / (F.col("_n_l") + F.col("_n_r") - F.col("cbs")),
        )
        .select("id_l", "id_r", F.col("cbs").cast("long").alias("cbs"), "arcs", "js")
    )
    if prune_scheme is None:
        return weighted
    if prune_scheme not in ("cbs", "arcs", "js"):
        raise ValueError(f"meta_block_pairs: unknown prune_scheme {prune_scheme!r}")
    weighted = weighted.localCheckpoint()
    mean_w = weighted.agg(F.avg(prune_scheme).alias("_mean"))
    return (
        weighted.crossJoin(F.broadcast(mean_w))
        .where(F.col(prune_scheme) >= F.col("_mean"))
        .drop("_mean")
    )


def block_size_stats(blocks: DataFrame,
                     resolver_col: str = "resolver",
                     key_col: str = "ckey",
                     id_col: str = "record_id") -> DataFrame:
    """Blocking skew diagnostics: per-resolver block-size HISTOGRAM in
    power-of-two buckets, with the exact pairwise-comparison mass each
    bucket contributes — the operational view behind the salting/cap
    machinery (a scheme whose top bucket holds most of the n_pairs mass
    is the one that needs `max_block_size` / salting; the reduction-
    ratio single number in blocking_quality can't show WHERE the
    quadratic mass sits).

    size_bucket = the smallest power of two >= block size, computed in
    INTEGER arithmetic (binary digit length of sz−1, never log2 —
    float log of exact powers of two is off-by-ulp and would flip
    bucket boundaries between engines). n_pairs is the exact
    Σ sz·(sz−1)/2 over the bucket's blocks (integer DIV).

    Scale shape: one distinct + one (resolver, key) aggregation — the
    same shuffle blocking itself pays — then a bucket-keyed fold of the
    already-reduced size table (rows bounded by distinct blocks, output
    by ~64 buckets × resolvers). → (resolver, size_bucket, n_blocks,
    n_keys, n_pairs), ordered.
    """
    sizes = (
        blocks.select(F.col(resolver_col).alias("resolver"),
                      F.col(key_col).alias("_k"),
                      F.col(id_col).alias("_id"))
        .distinct()
        .groupBy("resolver", "_k")
        .agg(F.count("*").alias("sz"))
    )
    bucket = F.when(F.col("sz") == 1, F.lit(1).cast("long")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), "
               "length(conv(CAST(sz - 1 AS STRING), 10, 2)))")
    )
    return (
        sizes.groupBy("resolver", bucket.alias("size_bucket"))
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("sz").alias("n_keys"),
            F.sum(F.expr("sz * (sz - 1) DIV 2")).alias("n_pairs"),
        )
        .orderBy("resolver", "size_bucket")
    )
