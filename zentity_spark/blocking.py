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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
