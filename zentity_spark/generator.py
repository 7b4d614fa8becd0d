"""Deterministic synthetic transcript generator for benchmarks.

Generates multi-turn transcripts (input_hint schema) embedding person-like
attribute values with controlled duplication, typos, and hot-key skew —
the workload the 100 TB design targets. Everything is derived from
`spark.range` + column expressions (md5/hash arithmetic), so the output
is deterministic for a given size on any cluster, with NO driver-side
row generation and NO Python UDFs.

Shape:
- n_entities ground-truth entities; entity e owns 1 + (e % 3) conversations
  (so ~2/3 of entities are multi-conversation → linkable).
- Each conversation carries turns: name=<variant>, email=<exact>,
  phone=<digits with punctuation variants>, signup=<date ± jitter>,
  plus `filler_turns` assistant/noise turns.
- Name variants: conversation j>0 of an entity drops one character of the
  base name (deterministic position) — exercising the fuzzy matcher.
- Skew: `hot_fraction` of conversations share ONE phone value
  ("000-000-0000") — a degenerate hot blocking key that must be handled
  by the block-size cap / AQE, not by luck.

Ground truth: conv_id = "<entity_id>-<j>", so pair labels for
precision/recall are derivable without leaking anything to the pipeline
(which never reads conv_id content).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BENCH_MODEL = {
    "attributes": {
        "name": {"type": "string", "score": 0.8},
        "email": {"type": "string", "score": 0.95},
        "phone": {"type": "string", "score": 0.9},
        "signup": {"type": "date", "score": 0.7},
    },
    "resolvers": {
        "email": {"attributes": ["email"]},
        "name_signup": {"attributes": ["name", "signup"]},
        "phone_signup": {"attributes": ["phone", "signup"]},
    },
    "matchers": {
        "exact": {"clause": {"term": {"{{ field }}": "{{ value }}"}}, "quality": 0.99},
        "normalized": {"clause": {"match": {"{{ field }}": "{{ value }}"}}, "quality": 0.95},
        "fuzzy_name": {
            "clause": {"match": {"{{ field }}": {"query": "{{ value }}", "fuzziness": 1}}},
            "quality": 0.9,
        },
        "day_window": {
            "clause": {
                "range": {
                    "{{ field }}": {
                        "gte": "{{ value }}||-{{ params.window }}",
                        "lte": "{{ value }}||+{{ params.window }}",
                        "format": "{{ params.format }}",
                    }
                }
            },
            "params": {"format": "yyyy-MM-dd HH:mm:ss", "window": "1d"},
        },
    },
    "indices": {
        "default": {
            "fields": {
                "name": {"attribute": "name", "matcher": "fuzzy_name"},
                "email": {"attribute": "email", "matcher": "exact"},
                "phone": {"attribute": "phone", "matcher": "normalized"},
                "signup": {"attribute": "signup", "matcher": "day_window"},
            }
        }
    },
}


def synth_transcripts(
    spark: SparkSession,
    n_entities: int = 10_000,
    filler_turns: int = 8,
    hot_fraction: float = 0.01,
) -> DataFrame:
    """Build the transcripts DataFrame. Row count ≈
    n_entities * 2 * (4 + filler_turns)."""
    ents = spark.range(n_entities).select(
        F.col("id").alias("eid"),
        (F.lit(1) + F.pmod("id", F.lit(3))).cast("int").alias("n_convs"),
        # phonetically diverse names: letter-led hex — soundex codes
        # spread over many buckets (a constant name prefix would make one
        # degenerate soundex block out of the whole dataset)
        F.concat(F.lit("p"), F.substring(F.md5(F.col("id").cast("string")), 1, 9)).alias("base_name"),
        F.concat(F.lit("u"), F.col("id"), F.lit("@example.com")).alias("email"),
        F.lpad(F.pmod(F.xxhash64(F.col("id")), F.lit(10_000_000)).cast("string"), 10, "0").alias("phone_digits"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(86400 * 365))
        ).alias("signup_ts"),
    )

    convs = ents.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("n_convs") - 1)).alias("j")
    ).withColumn("conv_id", F.concat(F.col("eid"), F.lit("-"), F.col("j")))

    # deterministic single-character-drop typo for j>0 (edit distance 1,
    # inside the fuzzy_name matcher's fuzziness=1)
    name_variant = F.when(F.col("j") == 0, F.col("base_name")).otherwise(
        F.concat(
            F.expr("substring(base_name, 1, 4 + j % 3)"),
            F.expr("substring(base_name, 6 + j % 3)"),
        )
    )
    # phone punctuation variants by j; a hot_fraction slice shares one value
    hot = F.pmod(F.xxhash64("conv_id"), F.lit(10_000)) < F.lit(int(hot_fraction * 10_000))
    phone_fmt = F.when(
        hot, F.lit("000-000-0000")
    ).when(
        F.col("j") % 2 == 0,
        F.concat(F.substring("phone_digits", 1, 3), F.lit("-"), F.substring("phone_digits", 4, 7)),
    ).otherwise(
        F.concat(F.lit("("), F.substring("phone_digits", 1, 3), F.lit(") "), F.substring("phone_digits", 4, 7))
    )
    # signup jitter within ±6h (inside the 1d matcher window)
    jitter = F.pmod(F.xxhash64("conv_id", F.lit(13)), F.lit(43200)) - F.lit(21600)
    signup_str = F.date_format(
        F.timestamp_seconds(F.unix_timestamp("signup_ts") + jitter), "yyyy-MM-dd HH:mm:ss"
    )

    attr_turns = convs.select(
        "conv_id",
        F.col("signup_ts").alias("ts"),
        F.array(
            F.concat(F.lit("name="), name_variant),
            F.concat(F.lit("email="), F.col("email")),
            F.concat(F.lit("phone="), phone_fmt),
            F.concat(F.lit("signup="), signup_str),
        ).alias("texts"),
    ).select(
        "conv_id", "ts", F.posexplode("texts").alias("turn_idx", "text")
    ).select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        "ts",
    )

    filler = convs.select(
        "conv_id",
        F.col("signup_ts").alias("ts"),
        F.explode(F.sequence(F.lit(4), F.lit(4 + filler_turns - 1))).alias("turn_idx"),
    ).select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        F.lit("assistant").alias("role"),
        F.concat(F.lit("note: "), F.md5(F.concat("conv_id", F.col("turn_idx")))).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        "ts",
    )
    return attr_turns.unionByName(filler)


def true_pairs(transcripts: DataFrame) -> DataFrame:
    """Ground-truth positive pairs: conversations of the same entity
    (entity id = conv_id prefix)."""
    convs = transcripts.select(
        F.col("conv_id").alias("record_id"),
        F.substring_index("conv_id", "-", 1).alias("eid"),
    ).distinct()
    l = convs.alias("l")
    r = convs.alias("r")
    return (
        l.join(r, F.col("l.eid") == F.col("r.eid"))
        .where(F.col("l.record_id") < F.col("r.record_id"))
        .select(F.col("l.record_id").alias("id_l"), F.col("r.record_id").alias("id_r"))
    )


def synth_clustered_embeddings(spark: SparkSession, n_clusters: int = 50,
                               per_cluster: int = 40, dim: int = 64,
                               sigma: float = 0.35) -> DataFrame:
    """Planted-cluster embedding corpus for ANN quality evaluation.

    Near-uniform random vectors (the sf* embeddings tables) put the true
    top-k at the cosine noise floor, where recall measures LSH
    concentration rather than retrieval quality — an index could be
    badly broken and still score ~0.5. This corpus plants ground truth:
    vector v of cluster c is normalize(center_c + sigma·noise_v) with
    unit random centers, so cluster mates sit at cosine ≈ 1/(1+σ²)
    (≈0.89 at σ=0.35) while cross-cluster cosine ≈ 0 ± 1/√dim. Any
    query's exact top-k are its cluster mates, and a working
    bucketed/IVF index must reach recall@k ≥ 0.9 here (asserted in
    test_ann_clustered and measured per-round by bench.py).

    Deterministic: centers and noise derive from seeded RandomState
    keyed by cluster id / vec_id — independent of partitioning. Schema
    matches the driver's embeddings tables
    (vec_id long, embedding array<float>, label int)."""
    from pyspark.sql.functions import pandas_udf

    n = n_clusters * per_cluster

    @pandas_udf("array<float>")
    def gen(vec_ids):
        import functools

        import numpy as np
        import pandas as pd

        @functools.lru_cache(maxsize=4096)
        def center(cid: int):
            rc = np.random.RandomState(1_000_003 + cid)
            c = rc.standard_normal(dim)
            return c / np.linalg.norm(c)

        out = []
        for vid in vec_ids:
            cid = int(vid) % n_clusters
            rn = np.random.RandomState(2_000_003 + int(vid))
            # scale per-component so the NOISE VECTOR's norm is ≈ sigma
            # (a dim-dim standard normal has norm ≈ √dim, not 1)
            v = center(cid) + sigma * rn.standard_normal(dim) / np.sqrt(dim)
            out.append((v / np.linalg.norm(v)).astype("float32"))
        return pd.Series(out)

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        gen(F.col("id")).alias("embedding"),
        (F.col("id") % n_clusters).cast("int").alias("label"),
    )
