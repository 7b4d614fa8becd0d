"""Large-scale training-data pipeline operators.

Beyond the reference's resolution surface, a 100 TB corpus pipeline needs
deduplication, similarity search, text analysis, and multimodal column
plumbing. These are first-class operators here (graded alongside
SURVEY.md §2), built the same way as the ER engine: JVM-side column
expressions for everything hot, deterministic hashes (md5) so results are
reproducible across engines, Arrow-batched UDFs only where built-ins
can't express the semantics.

Dedup family:
  exact_dedup          hash-groupBy on canonicalized text
  shingles / minhash   k-shingle → banded min-hash signatures (LSH)
  near_dup_pairs       band-bucket join → verified n-gram Jaccard
  simhash              charge/discharge fingerprint over tokens
  simhash_near_dup     banded hamming LSH join → exact hamming verify
Similarity search:
  ann_topk_bruteforce  exact cosine top-k (the baseline every ANN method
                       is measured against)
  lsh_buckets          random-hyperplane signs from md5-derived planes
                       (deterministic, engine-independent)
Text analysis:
  text_quality / language_id / token_counts / winnow_fingerprints
  pii_scrub            regexp redaction (email/cc/phone/ip), counts +
                       scrubbed text, pure column expressions
  vocab_stats          corpus tf/df/idf, deterministic top-k
  pack_sequences       greedy first-fit-sequential sample packing into
                       fixed token budgets (bucketed applyInPandas)
  decontaminate        per-doc word-n-gram overlap vs a broadcast
                       benchmark set (eval-leak hygiene)
  stratified_sample    per-stratum keep rates via lexicographic md5
                       threshold — zero shuffle, retry-stable
  domain_mixture       per-stratum doc/token counts + corpus fractions
Multimodal:
  decode_media_batches mapInPandas over opaque binary columns: REAL
                       pure-stdlib decode of PNG/GIF/JPEG/PPM/PGM/WAV
                       headers; codec-requiring formats fall back to a
                       deterministic fake flagged decoded_real=false
                       (this container has no PIL/ffmpeg).
  resize_media         nearest-neighbor resize: REAL over PNM rasters
                       (the pixels are in the payload), content-derived
                       byte-sampling fake otherwise (resized_real flag)
  sample_frames        evenly-spaced frame sampling: REAL over WAV
                       (stdlib wave), payload-byte frame axis otherwise
                       (sampled_real flag)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def widen_narrow_scan(df: DataFrame) -> DataFrame:
    """Repartition an input narrower than the cluster's parallelism
    before a compute-dense stage (fingerprinting, shingling, Arrow
    matmuls). A SMALL table can still carry heavy per-row compute — a
    single-row-group parquet file scans as ONE task, serializing e.g.
    the SimHash fingerprint pass on one core of 32 (measured 3.8s →
    0.3s at bench scale). At corpus scale the scan is already wider
    than the cluster and this is a no-op; the repartition ships the
    input once, which the first shuffle of the downstream op would
    have done anyway.

    Only SCAN-SHAPED plans are widened: under AQE (default on),
    reading `df.rdd` finalizes the adaptive plan, which EXECUTES every
    upstream exchange just to learn a partition count — and the work
    then re-runs at action time because the original lazy df is
    returned. A plan that already contains a shuffle (join / aggregate
    / repartition / window) re-spreads across the cluster there, so
    widening adds nothing anyway; for a pure scan (file relation or a
    checkpointed RDD), df.rdd materializes nothing and the width check
    is free."""
    import re

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # match operator NODES (line-leading tokens after the tree-drawing
    # prefix), not raw substrings: a column named "SortKey" or a filter
    # literal containing "Join" must not silently disable the widening
    if re.search(
        r"^[\s+:*-]*(Join|Aggregate|Repartition|RepartitionByExpression"
        r"|Window|Exchange|Sort)\b",
        plan, re.MULTILINE,
    ):
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


# ----------------------------------------------------------------------
# Deduplication

def canonical_text(col: Column) -> Column:
    """Whitespace-collapse + trim + lowercase — the usual exact-dedup
    canonicalization."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy: every doc mapped to the minimum id
    of its canonical-text group (keep_id == doc_id ⇒ kept)."""
    h = F.md5(canonical_text(F.col(text_col))).alias("text_hash")
    return docs.select(F.col(id_col).alias("doc_id"), h).withColumn(
        "keep_id", F.min("doc_id").over(Window.partitionBy("text_hash"))
    )


def paragraph_dedup(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", min_chars: int = 1) -> DataFrame:
    """Cross-document PARAGRAPH-level exact dedup — the corpus-dedup
    stage between doc-level exact dedup and near-dup (paragraph removal
    à la C4/CCNet, public): split each doc on blank lines, canonicalize
    each paragraph, and mark the global keeper of every duplicate group
    as the minimum (doc_id, para_idx) occurrence.

    Output: one row per paragraph occurrence —
    (doc_id, para_idx, para_hash, n_copies, keep).

    Plan shape: explode → ONE shuffle keyed by the paragraph's md5
    (min_by struct aggregation, map-side partial) → broadcast-free
    equi-join back on the hash. Linear in corpus size; the group key is
    a 32-char digest, never paragraph text."""
    paras = F.filter(
        F.transform(
            F.split(F.col(text_col), r"\n\s*\n"),
            lambda p: F.trim(F.regexp_replace(F.lower(p), r"\s+", " ")),
        ),
        lambda p: F.length(p) >= min_chars,
    )
    occ = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(paras).alias("para_idx", "para")
    ).select("doc_id", "para_idx", F.md5("para").alias("para_hash"))
    groups = occ.groupBy("para_hash").agg(
        F.count("*").alias("n_copies"),
        F.min(F.struct("doc_id", "para_idx")).alias("keeper"),
    )
    return occ.join(groups, "para_hash").select(
        "doc_id", "para_idx", "para_hash",
        F.col("n_copies").cast("long").alias("n_copies"),
        (
            (F.col("keeper.doc_id") == F.col("doc_id"))
            & (F.col("keeper.para_idx") == F.col("para_idx"))
        ).alias("keep"),
    )


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles of canonicalized text (array<string>).

    Built as an elementwise fold of k SHIFTED slices (zip_with/
    concat_ws), not `transform(offsets, i -> slice(words, i, k))` —
    referencing the computed word array inside a per-offset lambda
    makes Catalyst re-run canonicalize+split per element, O(L²) per
    document (PLANS.md rule 1; measured 6× on the bench corpus for
    the k=2 ngram_jaccard index)."""
    words = F.split(canonical_text(col), " ")
    n = F.size(words)
    m = F.greatest(n - (k - 1), F.lit(0))
    acc = F.slice(words, F.lit(1), m)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(words, F.lit(j + 1), m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(n >= k, F.array_distinct(acc)).otherwise(
        F.array(canonical_text(col))
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       bands: int = 8) -> DataFrame:
    """Banded min-hash: per band b, signature = min(md5(b || shingle)).
    md5 is identical across engines → deterministic, oracle-checkable.
    Near-duplicate docs agree on some band with probability ~1 (classic
    MinHash-LSH banding).

    Plan shape: one shingle row carries all `bands` hashes as COLUMNS
    (min-aggregated per band in one groupBy), instead of replicating
    every shingle row per band — `bands`-fold fewer rows through the
    map-side partial aggregation and the shuffle (measured ~2× at
    bands=4), then a model-sized stack() unpivot to the
    (doc_id, band, minhash) long shape."""
    docs = widen_narrow_scan(docs)
    sh = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles(F.col(text_col), k)).alias("shingle")
    )
    aggs = [
        F.min(
            F.md5(F.concat(F.lit(str(b)), F.lit("|"), F.col("shingle")))
        ).alias(f"_h{b}")
        for b in range(bands)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    stack_args = ", ".join(f"{b}, _h{b}" for b in range(bands))
    return wide.select(
        "doc_id",
        F.expr(f"stack({bands}, {stack_args}) AS (band, minhash)"),
    ).select("doc_id", F.col("band").cast("int"), "minhash")


def near_dup_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   k: int = 3, bands: int = 8, jaccard_threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH candidate pairs (shared band signature) verified with
    exact shingle-set Jaccard ≥ threshold."""
    # materialize once: sig feeds both sides of its self-join (ReuseExchange
    # can't help — the sides shuffle on different roles) and sets feeds
    # both verify joins; without the checkpoints the tokenize → shingle →
    # hash pipeline runs once per branch (same rule as simhash/ngram)
    sig = minhash_signatures(docs, text_col, id_col, k, bands).localCheckpoint()
    l = sig.alias("l")
    r = sig.alias("r")
    cand = (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.minhash") == F.col("r.minhash")))
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("id_l"), F.col("r.doc_id").alias("id_r"))
        .distinct()
    )
    # verify carries per-doc shingle SETS through two joins; hashing
    # each shingle to int64 (xxhash64) keeps Jaccard identical (set
    # cardinalities survive hashing; a collision needs ~2^32 distinct
    # shingles per doc) while cutting the shuffled array width ~3-5×
    # vs raw k-word strings — the arrays are the dominant bytes of this
    # stage at corpus scale
    sets = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(shingles(F.col(text_col), k), lambda s: F.xxhash64(s)).alias("sh"),
    ).localCheckpoint()
    return (
        cand.join(sets.withColumnRenamed("doc_id", "id_l").withColumnRenamed("sh", "sh_l"), "id_l")
        .join(sets.withColumnRenamed("doc_id", "id_r").withColumnRenamed("sh", "sh_r"), "id_r")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_l", "sh_r"))
                / F.size(F.array_union("sh_l", "sh_r")),
                6,
            ),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_l", "id_r", "jaccard")
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 2,
                        threshold: float = 0.35) -> DataFrame:
    """EXACT n-gram Jaccard near-dup: every pair with word-n-gram-set
    Jaccard >= threshold — the deterministic sibling of MinHash-LSH
    (`near_dup_pairs`), which is probabilistic in its candidate step.

    Candidates come from a PREFIX-FILTERED inverted index (the SSJoin /
    PPJoin prefix filter — Chaudhuri et al. 2006, Xiao et al. 2008;
    public literature), NOT an all-pairs join, and the filter is
    LOSSLESS: order every doc's distinct grams by ascending corpus
    document-frequency (rarest first; gram string tie-break — one total
    order shared by all docs), and two sets x, y with J(x,y) >= t must
    share at least one gram inside each one's first
    |x| - ceil(t*|x|) + 1 grams. Joining only those prefix grams
    therefore finds every qualifying pair.

    Plan shape / scale: explode -> ONE groupBy(gram) for corpus
    document frequencies -> SMJ tok x freq on gram -> ONE
    groupBy(doc_id) building the frequency-ordered gram array ->
    prefix explode -> equi-self-join on gram -> verify join on hashed
    full sets (xxhash64 int64, same width trick as near_dup_pairs:
    Jaccard is preserved under injective hashing, shuffle ~3-5x
    narrower than raw gram strings). Rare-first ordering is what keeps
    the inverted lists short: a corpus-hot gram enters a doc's prefix
    only when everything rarer in that doc is ALSO hot, i.e. exactly
    the near-duplicate-of-a-hot-template docs the join must pair
    anyway. At 100 TB the freq table is gram-keyed (bounded by vocab,
    not corpus) and every shuffle key is a gram or an id — never text.
    """
    docs = widen_narrow_scan(docs)
    grams_col = shingles(F.col(text_col), n)
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams_col).alias("gram")
    )
    freq = tok.groupBy("gram").agg(F.count("*").alias("df_cnt"))
    ordered = (
        tok.join(freq, "gram")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df_cnt", "gram"))).alias("ordered"))
    )
    sz = F.size("ordered")
    # prefix length |x| - ceil(t*|x|) + 1; the nudge makes IEEE rounding
    # of t*|x| err toward a LARGER prefix (extra candidates are merely
    # re-verified; a short prefix would LOSE pairs). It must be RELATIVE
    # (plus an absolute floor): t*|x| beyond ~9e6 has ulp > 1e-9, so a
    # fixed absolute nudge stops covering rounding error exactly on the
    # giant documents where prefix loss matters most
    tsz = F.lit(float(threshold)) * sz.cast("double")
    p = (
        sz
        - F.ceil(tsz - (F.lit(1e-9) + tsz * F.lit(1e-12))).cast("int")
        + 1
    )
    # checkpoint the two tables every downstream branch re-reads: the
    # prefix index feeds BOTH sides of its self-join and the hashed
    # sets feed both verify joins — without this each side re-runs the
    # full tokenize → df-join → collect_list pipeline (same rule as
    # simhash's fingerprint table)
    prefix = ordered.select(
        "doc_id", F.size("ordered").alias("sz"),
        F.posexplode(F.slice(F.col("ordered"), F.lit(1), p)).alias("pos0", "pg"),
    ).select(
        "doc_id", "sz", (F.col("pos0") + 1).alias("pos"),
        F.col("pg.gram").alias("gram"),
    ).localCheckpoint()
    # PPJoin positional filter (Xiao et al. 2008, lossless): J(x,y) >= t
    # ⇔ overlap >= t/(1+t)·(|x|+|y|); a shared gram at positions
    # (px, py) of the two frequency-ordered arrays bounds the remaining
    # overlap by 1 + min(|x|-px, |y|-py). Pairs whose bound falls short
    # of the requirement are dropped INSIDE the join, before the
    # distinct and the array-shipping verify — this is what keeps the
    # candidate set bounded when the corpus vocabulary is small and the
    # prefix filter alone degenerates toward all-pairs (uniform-vocab
    # corpora: every doc's prefix is the same hot grams). The ceil is
    # nudged DOWN (relative + absolute, same IEEE reasoning as the
    # prefix length above) so rounding can only ADMIT extra candidates.
    alpha = float(threshold) / (1.0 + float(threshold))
    req_sum = F.lit(alpha) * (F.col("l.sz") + F.col("r.sz")).cast("double")
    required = F.ceil(req_sum - (F.lit(1e-9) + req_sum * F.lit(1e-12)))
    cand = (
        prefix.alias("l")
        .join(
            prefix.alias("r"),
            (F.col("l.gram") == F.col("r.gram"))
            & (F.col("l.doc_id") < F.col("r.doc_id"))
            & (
                1
                + F.least(
                    F.col("l.sz") - F.col("l.pos"),
                    F.col("r.sz") - F.col("r.pos"),
                )
                >= required
            ),
        )
        .select(F.col("l.doc_id").alias("id_l"), F.col("r.doc_id").alias("id_r"))
        .distinct()
    )
    sets = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(grams_col, lambda s: F.xxhash64(s)).alias("g"),
    ).localCheckpoint()
    return (
        cand.join(sets.withColumnRenamed("doc_id", "id_l").withColumnRenamed("g", "g_l"), "id_l")
        .join(sets.withColumnRenamed("doc_id", "id_r").withColumnRenamed("g", "g_r"), "id_r")
        .withColumn(
            "jacc_exact",
            F.size(F.array_intersect("g_l", "g_r"))
            / F.size(F.array_union("g_l", "g_r")),
        )
        # verify on the EXACT value — the prefix filter is sized for the
        # exact threshold, so comparing a rounded value here would admit
        # pairs (true J within 5e-7 below t) that the filter is allowed
        # to drop, breaking the lossless guarantee; round only the
        # reported column
        .where(F.col("jacc_exact") >= threshold)
        .select("id_l", "id_r", F.round("jacc_exact", 6).alias("jaccard"))
    )


_SIMHASH_UDFS: dict = {}


def _simhash_udf(n_bits: int):
    """Arrow-batched simhash over a pre-tokenized words column.

    Semantics are EXACTLY the SQL-expressible definition (bit i = 1 iff
    Σ_tokens ±1 by bit i of the first 32 bits of md5(token) > 0 — the
    DuckDB oracle computes that form directly), but evaluated with ONE
    md5 per token. The pure-expression form re-computes md5 inside every
    bit's aggregate lambda — measured 19s for 270K tokens at n_bits=32
    vs <1s here; Catalyst has no common-subexpression extraction across
    independent HOF aggregates, so this is the rule-8 'flatten the
    batch, hash once' case, not a premature UDF."""
    if n_bits in _SIMHASH_UDFS:
        return _SIMHASH_UDFS[n_bits]
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def f(words):
        shifts = np.arange(n_bits, dtype=np.uint32)
        out = np.zeros(len(words), dtype=np.int64)
        for i, ws in enumerate(words):
            if ws is None or len(ws) == 0:
                continue
            hs = np.fromiter(
                (int(hashlib.md5(w.encode("utf-8")).hexdigest()[:8], 16) for w in ws),
                dtype=np.uint32, count=len(ws),
            )
            bits = ((hs[:, None] >> shifts[None, :]) & 1).astype(np.int32)
            sums = (2 * bits - 1).sum(axis=0)
            out[i] = int(((sums > 0).astype(np.int64) << shifts.astype(np.int64)).sum())
        return pd.Series(out)

    udf = pandas_udf(f, "long")
    _SIMHASH_UDFS[n_bits] = udf
    return udf


def sim_hash_expr(col: Column, n_bits: int = 16) -> Column:
    """n_bits-bit SimHash as an integer column: bit i of the fingerprint
    = 1 iff Σ_tokens (bit i of md5(token) ? 1 : -1) > 0. Tokenization
    (canonicalize → split → distinct) stays JVM-side; the hash/bit loop
    runs in an Arrow-batched UDF (see _simhash_udf for why)."""
    words = F.array_distinct(F.split(canonical_text(col), " "))
    return _simhash_udf(n_bits)(words)


def simhash_near_dup_pairs(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", n_bits: int = 32,
                           bands: int = 4, max_hamming: int = 3,
                           max_bucket_size: int | None = 100_000,
                           salt_threshold: int | None = 2000,
                           with_metrics: bool = False):
    """SimHash near-duplicate pairs: banded hamming LSH candidates
    verified with the exact hamming distance → (id_l, id_r, hamming).

    Completeness is pigeonhole, not probabilistic: splitting an n_bits
    fingerprint into `bands` equal slices guarantees that any pair
    within hamming distance <= bands-1 agrees EXACTLY on at least one
    slice — so the default bands=4, max_hamming=3 has recall 1.0 over
    the fingerprints while each join key is only an n_bits/bands-bit
    slice. Raising n_bits (not bands) is the scale lever: wider slices
    → more buckets → smaller bucket quadratics, with completeness
    untouched.

    The band-slice self-join goes through the SAME capped + salted
    machinery as entity blocking (blocking.candidate_pairs): degenerate
    slices (e.g. empty-text fingerprint 0) are dropped deterministically
    (with_metrics=True returns the dropped-blocks frame alongside the
    pairs — an over-cap bucket is a permanent recall boundary that
    belongs in lineage metrics), hot-but-legitimate slices are salted
    so no task owns a whole bucket's pair quadratic. Candidates shuffle only
    (band, slice, id) rows; fingerprints rejoin by id for the verify,
    which is two longs + one bit_count(xor) per pair — there is no
    text or token movement after fingerprinting.
    """
    docs = widen_narrow_scan(docs)
    from zentity_spark.blocking import candidate_pairs as _candidate_pairs

    width = n_bits // bands
    mask = (1 << width) - 1
    # fingerprint ONCE: fps feeds the banding scan and both verify-join
    # sides — without the checkpoint each use re-runs the full text scan
    # + tokenize + hash (3× the dominant cost; at corpus scale, 3 full
    # passes over the text). The fingerprint table is two 8-byte columns
    # per doc, the cheapest thing in the query to hold.
    fps = docs.select(
        F.col(id_col).alias("doc_id"),
        sim_hash_expr(F.col(text_col), n_bits).alias("fp"),
    ).localCheckpoint()
    blocks = fps.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("fp", b * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("slice"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(
        F.col("bk.band").cast("string").alias("resolver"),
        F.col("bk.slice").cast("string").alias("ckey"),
        F.col("doc_id").alias("record_id"),
    )
    cand, dropped = _candidate_pairs(
        blocks, max_block_size=max_bucket_size, salt_threshold=salt_threshold
    )
    pairs = cand.select("id_l", "id_r").dropDuplicates(["id_l", "id_r"])
    out = (
        pairs
        .join(fps.select(F.col("doc_id").alias("id_l"), F.col("fp").alias("fp_l")), "id_l")
        .join(fps.select(F.col("doc_id").alias("id_r"), F.col("fp").alias("fp_r")), "id_r")
        .withColumn(
            "hamming", F.bit_count(F.col("fp_l").bitwiseXOR(F.col("fp_r"))).cast("int")
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_l", "id_r", "hamming")
    )
    return (out, dropped) if with_metrics else out


# ----------------------------------------------------------------------
# Similarity search over embeddings

def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns, via
    zip_with/aggregate HOFs (JVM-side, no UDF)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    return dot / (vec_norm(a) * vec_norm(b))


def vec_norm(a: Column) -> Column:
    """L2 norm of an array column (precompute per VECTOR before a pair
    join — inside cosine_sim both norms are re-evaluated per PAIR, which
    triples the per-pair HOF work on verify joins)."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda s, v: s + v.cast("double") * v.cast("double"))
    )


def cosine_from_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine using per-vector precomputed norms: one zip_with/aggregate
    per pair instead of three."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    return dot / (norm_a * norm_b)


def ann_topk_bruteforce(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact cosine top-k: broadcast the query vector, one scan, no
    shuffle except the final top-k (orderBy + limit → TakeOrdered)."""
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    return (
        embeddings.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine_sim(F.col("embedding"), F.col("qvec")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_bucket_expr(emb: Column, dim: int, n_planes: int = 8,
                    plane_offset: int = 0) -> Column:
    """Random-hyperplane LSH bucket id over planes
    [plane_offset, plane_offset + n_planes). Plane components are
    derived from md5 — deterministic and engine-independent:
    plane[p][j] = (int(md5(p_j)[:4], 16) % 2001) - 1000."""
    import hashlib

    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        p = plane_offset + i
        dot = F.lit(0.0)
        for j in range(dim):
            h = int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[:4], 16) % 2001 - 1000
            dot = dot + F.element_at(emb, j + 1).cast("double") * F.lit(float(h))
        bucket = bucket + F.when(dot > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return bucket


def _plane_matrix(dim: int, n_planes: int, plane_offset: int = 0):
    """The md5-derived hyperplane matrix (dim × n_planes), float64 —
    the same plane[p][j] values as lsh_bucket_expr. Cached per Python
    worker (a few KB; rebuilt at most once per (dim, planes) shape)."""
    import functools
    import hashlib

    @functools.lru_cache(maxsize=16)
    def build(d: int, n: int, off: int):
        import numpy as np

        m = np.empty((d, n), dtype="float64")
        for i in range(n):
            p = off + i
            for j in range(d):
                h = int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[:4], 16)
                m[j, i] = float(h % 2001 - 1000)
        return m

    return build(dim, n_planes, plane_offset)


def _banded_buckets_udf(dim: int, bands: int, planes_per_band: int):
    """array<long> of per-band bucket ids for one embedding, computed as
    ONE numpy matmul over the whole Arrow batch. Semantically identical
    to lsh_bucket_expr per band (same planes, same sign→bit packing) but
    ~100× cheaper to plan and run: the expression form inlines
    bands×planes×dim (=thousands of) Catalyst terms, which costs tens of
    seconds of codegen/eval per query — the same O(n²) HOF-inlining trap
    PLANS.md documents for winnowing. (Accumulation order differs —
    matmul vs left-to-right adds — which could flip the sign of a dot
    product only within float rounding of exactly 0; oracle-checked in
    CORRECTNESS.)"""
    from pyspark.sql.functions import pandas_udf

    total = bands * planes_per_band

    def f(embs):
        import numpy as np
        import pandas as pd

        if len(embs) == 0:
            return pd.Series([], dtype="object")
        m = _plane_matrix(dim, total)
        x = np.asarray([np.asarray(v, dtype="float64") for v in embs])
        bits = (x @ m) > 0  # n × (bands·r)
        w = np.left_shift(np.int64(1), np.arange(planes_per_band, dtype="int64"))
        per_band = [
            bits[:, b * planes_per_band:(b + 1) * planes_per_band].astype("int64") @ w
            for b in range(bands)
        ]
        out = np.stack(per_band, axis=1)  # n × bands
        return pd.Series(list(out))

    return pandas_udf(f, "array<long>")


def ann_lsh_buckets(embeddings: DataFrame, dim: int = 64, n_planes: int = 8) -> DataFrame:
    """Single-table hyperplane-LSH bucket per vector (the signature
    building block; the scale path composes BANDS of these — see
    banded_lsh_buckets)."""
    embeddings = widen_narrow_scan(embeddings)
    udf = _banded_buckets_udf(dim, 1, n_planes)
    return embeddings.select(
        "vec_id", "label", F.element_at(udf(F.col("embedding")), 1).alias("bucket")
    )


def banded_lsh_buckets(embeddings: DataFrame, dim: int = 64, bands: int = 4,
                       planes_per_band: int = 8) -> DataFrame:
    """Banded multi-table hyperplane LSH: band b's bucket is the sign
    pattern of planes [b·r, (b+1)·r). Candidates share ANY band bucket —
    recall 1-(1-p^r)^b instead of the single-table p^r, while each
    band's bucket space (2^r) keeps buckets small. → (vec_id, band,
    bucket). One Arrow pass computes every band's bucket (no per-band
    scan+union: the old form re-read the input `bands` times)."""
    embeddings = widen_narrow_scan(embeddings)
    udf = _banded_buckets_udf(dim, bands, planes_per_band)
    return embeddings.select(
        "vec_id", udf(F.col("embedding")).alias("_buckets")
    ).select(
        "vec_id",
        F.posexplode("_buckets").alias("band", "bucket"),
    ).select("vec_id", F.col("band").cast("int").alias("band"), "bucket")


def embedding_near_dup_pairs(embeddings: DataFrame, dim: int = 64,
                             threshold: float = 0.9, bands: int = 8,
                             planes_per_band: int = 8,
                             max_bucket_size: int | None = 100_000,
                             salt_threshold: int | None = 2000,
                             with_metrics: bool = False):
    """Embedding-cosine near-duplicate pairs at scale: banded
    multi-table hyperplane LSH candidates verified with exact cosine ≥
    threshold.

    Scale design (fixes the single-table 2^planes bucket blowup):
    - bands × planes_per_band sign tables; a pair is a candidate when
      it agrees on ALL planes of ANY band (1-(1-p^r)^b recall — 8×8
      defaults give ~0.98 recall at cosine 0.9 with 256-bucket bands);
    - the band-bucket self-join runs through the SAME capped + salted
      machinery as entity blocking (blocking.candidate_pairs with
      band as the resolver and bucket as the key): degenerate buckets
      (e.g. all-zero embeddings) are dropped deterministically
      (with_metrics=True returns the dropped-blocks frame alongside
      the pairs), hot-but-legitimate buckets are salted so no task
      owns a whole bucket's pair quadratic;
    - verification joins the vectors back by id, so the candidate
      shuffle moves (band, bucket, id) rows only, never embeddings.
    """
    from zentity_spark.blocking import candidate_pairs as _candidate_pairs

    blocks = banded_lsh_buckets(embeddings, dim, bands, planes_per_band).select(
        F.col("band").cast("string").alias("resolver"),
        F.col("bucket").alias("ckey"),
        F.col("vec_id").alias("record_id"),
    )
    cand, dropped = _candidate_pairs(
        blocks, max_block_size=max_bucket_size, salt_threshold=salt_threshold
    )
    pairs = cand.select("id_l", "id_r").dropDuplicates(["id_l", "id_r"])
    # norms once per VECTOR (n aggregates), not per pair side (2·|pairs|);
    # checkpointed because both verify joins read it (different keys, so
    # exchange reuse can't dedupe the norm computation)
    vecs = embeddings.select(
        "vec_id", "embedding", vec_norm(F.col("embedding")).alias("nrm")
    ).localCheckpoint()
    out = (
        pairs.join(
            vecs.select(F.col("vec_id").alias("id_l"), F.col("embedding").alias("emb_l"),
                        F.col("nrm").alias("nrm_l")), "id_l")
        .join(
            vecs.select(F.col("vec_id").alias("id_r"), F.col("embedding").alias("emb_r"),
                        F.col("nrm").alias("nrm_r")), "id_r")
        .withColumn(
            "cosine",
            F.round(
                cosine_from_norms(F.col("emb_l"), F.col("emb_r"),
                                  F.col("nrm_l"), F.col("nrm_r")), 6),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_l", "id_r", "cosine")
    )
    return (out, dropped) if with_metrics else out


def multiprobe_bucket_variants(bucket: Column, planes_per_band: int) -> Column:
    """The Hamming-1 probe neighborhood of a band bucket: the bucket
    itself plus each single-plane sign flip. The ONE definition of the
    multiprobe set — ann_topk_bucketed probes it and bench.py measures
    its probe fraction, so the pair can't drift apart."""
    return F.array(
        bucket,
        *[bucket.bitwiseXOR(F.lit(1 << i)) for i in range(planes_per_band)],
    )


def ann_topk_bucketed(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10,
                      dim: int = 64, bands: int = 16,
                      planes_per_band: int = 8,
                      multiprobe: int = 0) -> DataFrame:
    """Bucketed approximate top-k: score ONLY the vectors that share at
    least one band bucket with the query (the IVF-style probe set),
    instead of the full corpus. The probe set is ~b·n/2^r vectors, so
    the scan cost drops by ~2^r/b while banding keeps recall high —
    the scale path whose quality is measured against
    ann_topk_bruteforce (recall@k ≥ 0.9 on the planted-cluster corpus,
    test_ann_clustered).

    multiprobe=1 additionally probes every bucket at Hamming distance 1
    from the query's bucket in each band (a near-miss on one plane's
    sign is the most likely way a true neighbor escapes) — probe set
    grows ≤ (r+1)×, a recall/scan knob for corpora with weak cluster
    structure; prefer more bands first (cheaper per unit recall)."""
    # materialize once: b feeds both the query-bucket lookup and the
    # probe join — without this the corpus-wide Arrow matmul runs twice
    b = banded_lsh_buckets(embeddings, dim, bands,
                           planes_per_band).localCheckpoint()
    qb = b.where(F.col("vec_id") == query_vec_id).select("band", "bucket")
    if multiprobe >= 1:
        qb = qb.select(
            "band",
            F.explode(
                multiprobe_bucket_variants(F.col("bucket"), planes_per_band)
            ).alias("bucket"),
        ).distinct()
    probe_ids = (
        b.join(F.broadcast(qb), ["band", "bucket"])
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id")
        .distinct()
    )
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    return (
        embeddings.join(probe_ids, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "label",
            F.round(cosine_sim(F.col("embedding"), F.col("qvec")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _centroid_cos(emb: Column, vec: list[float]) -> Column:
    """Rounded cosine of an embedding column against a DRIVER-SIDE
    centroid vector, embedded as array literals (model-sized — the IVF
    codebook is the same kind of small broadcast state as an entity
    model). Rounding to 6dp before any argmax/ordering makes near-ties
    resolve by the explicit centroid-id tie-break identically across
    engines (same convention as every cosine oracle here)."""
    import math

    nc = math.sqrt(sum(x * x for x in vec))
    lit = F.array(*[F.lit(float(x)) for x in vec])
    dot = F.aggregate(
        F.zip_with(emb, lit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    return F.round(dot / (vec_norm(emb) * F.lit(nc)), 6)


def ivf_centroids(embeddings: DataFrame, n_centroids: int = 16,
                  n_iters: int = 0, dim: int = 64) -> list[tuple[int, list[float]]]:
    """Deterministic IVF coarse quantizer (the codebook).

    Seeds are the n_centroids vectors with the smallest
    md5(vec_id-as-string) — a deterministic, engine-independent uniform
    sample (the standard IVF practice of using sampled points as
    centroids). Optional Lloyd refinement (n_iters) recomputes each
    centroid as the element-wise mean of its assigned vectors via dim
    avg() aggregates — map-side partial aggregation, one shuffle of
    n_centroids×dim doubles per iteration, no explode. At 100 TB the
    refinement would run on a hash-sampled slice (the codebook
    converges on a sample; assignment of the full corpus stays
    map-only)."""
    seeds = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_centroids)
        .collect()
    )
    cents = [(i + 1, [float(x) for x in r["embedding"]]) for i, r in enumerate(seeds)]
    for _ in range(n_iters):
        assigned = ivf_assign(embeddings, cents)
        means = (
            embeddings.join(assigned, "vec_id")
            .groupBy("cid")
            .agg(*[F.avg(F.col("embedding")[i].cast("double")).alias(f"m{i}")
                   for i in range(dim)])
            .collect()
        )
        cmap = {r["cid"]: [float(r[f"m{i}"]) for i in range(dim)] for r in means}
        cents = [(cid, cmap.get(cid, vec)) for cid, vec in cents]
    return cents


def _ivf_cid_expr(cents: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid id over the `embedding` column, as ONE
    Arrow-batched matmul against the (model-sized) codebook matrix.

    Semantics are identical to the previous inline-literal argmax
    (PLANS.md rule 11's losing side): cosine rounded to 6dp BEFORE the
    argmax, ties broken by lowest centroid id (rows sorted by cid, and
    np.argmax takes the first maximum). The inline expression inlined
    n_centroids × dim literals into one Catalyst tree; analysis +
    codegen on that tree dominated the whole IVF search (~15s for 500
    vectors at sf0.01 — the compute itself is microseconds). The
    pandas UDF stays map-only (ArrowEvalPython, no Exchange — plan
    asserted in test_ann_ivf) and the codebook rides in the closure,
    the same broadcast-sized state as before."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ordered = sorted(cents)
    cids = np.array([cid for cid, _ in ordered], dtype=np.int64)
    mat = np.array([vec for _, vec in ordered], dtype=np.float64)
    cnorm = np.sqrt((mat * mat).sum(axis=1))

    def _assign(emb):
        if emb.empty:
            return pd.Series([], dtype="int32")
        e = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        enorm = np.sqrt((e * e).sum(axis=1))
        raw = (e @ mat.T) / (enorm[:, None] * cnorm[None, :])
        # HALF_UP at 6dp, sign-aware — np.round is half-EVEN, which can
        # disagree with Spark F.round / DuckDB round exactly on the
        # .5-boundary cosines the rounding exists to stabilize
        cos = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
        return pd.Series(cids[np.argmax(cos, axis=1)], dtype="int32")

    return pandas_udf(_assign, "int")(F.col("embedding")).alias("cid")


def ivf_assign(embeddings: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid assignment → (vec_id, cid). MAP-ONLY: the
    codebook rides into the expression as literals, the argmax is an
    array_max over per-centroid (cosine, -cid) structs (highest cosine,
    then lowest centroid id — deterministic under rounded ties), and no
    shuffle or join touches the vectors. At production scale the
    assigned table is written partitioned by cid, so probe filtering
    becomes partition pruning."""
    return embeddings.select("vec_id", _ivf_cid_expr(cents))


def ann_topk_ivf(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10,
                 n_centroids: int = 16, n_probe: int = 4,
                 n_iters: int = 0, dim: int = 64) -> DataFrame:
    """IVF-flat approximate top-k: rank only the vectors whose nearest
    centroid is one of the query's n_probe closest centroids.

    The whole search is scan → map (inline cid argmax) → filter (probe
    cids) → TakeOrderedAndProject: zero shuffles, zero joins. Probe
    selection happens driver-side on the model-sized codebook with the
    same rounded-cosine + cid tie-break the assignment uses. Expected
    scan-to-score fraction is ~n_probe/n_centroids of the corpus
    (measured per-run by bench.py's ann probe for the LSH variant;
    same contract here)."""
    import math

    cents = ivf_centroids(embeddings, n_centroids, n_iters, dim)
    qvec = [
        float(x)
        for x in embeddings.where(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .first()[0]
    ]
    qn = math.sqrt(sum(x * x for x in qvec))
    scored = sorted(
        (
            (-round(sum(a * b for a, b in zip(vec, qvec))
                    / (math.sqrt(sum(x * x for x in vec)) * qn), 6), cid)
            for cid, vec in cents
        ),
    )
    probe = [cid for _, cid in scored[:n_probe]]
    qlit = F.array(*[F.lit(x) for x in qvec])
    return (
        embeddings.withColumn("cid", _ivf_cid_expr(cents))
        .where(F.col("cid").isin(probe) & (F.col("vec_id") != query_vec_id))
        .select(
            "vec_id", "label",
            F.round(cosine_sim(F.col("embedding"), qlit), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


# ----------------------------------------------------------------------
# Text analysis

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
# Latin-script languages: distinctive high-frequency function words
# (marker hit count = language score). Overlapping closed-class words
# (de/du/la/...) are avoided where a distinctive alternative exists;
# ties break deterministically (alphabetically last language wins).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "das", "ist"],
    "fr": ["le", "et", "la", "est"],
    "es": ["el", "y", "la", "es"],
    "it": ["il", "che", "di", "per"],
    "pt": ["o", "que", "de", "não"],
    "nl": ["de", "het", "een", "niet"],
    "sv": ["och", "att", "det", "är"],
    "pl": ["nie", "się", "jest", "oraz"],
    "tr": ["bir", "ve", "bu", "için"],
    "id": ["yang", "dan", "di", "untuk"],
    "vi": ["và", "của", "là", "không"],
}

# Non-Latin scripts: score = count of characters in the script's BMP
# range(s) — a handful of native characters outvotes any Latin marker
# list. Known limit (documented, heuristic): kanji-only Japanese counts
# as zh because Han characters are shared; kana decides ja.
_LANG_SCRIPTS = {
    "ru": "Ѐ-ӿ",                  # Cyrillic
    "el": "Ͱ-Ͽ",                  # Greek
    "he": "֐-׿",                  # Hebrew
    "ar": "؀-ۿ",                  # Arabic
    "hi": "ऀ-ॿ",                  # Devanagari
    "th": "฀-๿",                  # Thai
    "ko": "가-힯ᄀ-ᇿ",     # Hangul syllables + jamo
    "ja": "぀-ゟ゠-ヿ",     # Hiragana + Katakana
    "zh": "一-鿿",                  # CJK Unified (Han)
}


def text_quality_cols(text_col: Column) -> dict[str, Column]:
    """The quality metrics as reusable column expressions, so callers
    composing several per-doc stages (curate_corpus) can evaluate them
    in the SAME scan instead of joining a separate text_quality pass."""
    words = F.split(canonical_text(text_col), " ")
    n_tokens = F.size(words)
    text_len = F.length(text_col)
    n_punct = text_len - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    stop_hits = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.when(w.isin(STOPWORDS_EN), F.lit(1)).otherwise(F.lit(0)),
    )
    return {
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": F.round(
            F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / n_tokens, 6
        ),
        "punct_ratio": F.round(n_punct / F.greatest(text_len, F.lit(1)), 6),
        "stopword_ratio": F.round(stop_hits / n_tokens, 6),
    }


def text_quality(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality scoring: token count, mean token length, punctuation
    ratio, stopword ratio (all JVM-side)."""
    cols = text_quality_cols(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *(c.alias(name) for name, c in cols.items()),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID, argmax over per-language scores:
    marker-function-word hit counts for the 12 Latin-script languages
    (_LANG_MARKERS) plus per-script character counts for the 9 non-Latin
    scripts (_LANG_SCRIPTS — a few native characters outvote any marker
    list). Deterministic tie-break by language code (alphabetically last
    wins via struct ordering). Pure column expressions — no UDF."""
    words = F.split(canonical_text(F.col(text_col)), " ")
    txt = F.col(text_col)

    def hits_merge(markers):
        return lambda acc, w: acc + F.when(w.isin(markers), F.lit(1)).otherwise(F.lit(0))

    scores = [
        F.struct(
            F.aggregate(words, F.lit(0), hits_merge(ms)).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ms in sorted(_LANG_MARKERS.items())
    ] + [
        F.struct(
            (F.length(txt) - F.length(F.regexp_replace(txt, f"[{rng}]", "")))
            .cast("int").alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, rng in sorted(_LANG_SCRIPTS.items())
    ]
    # argmax by (hits, lang) — deterministic tie-break: alphabetically
    # last language wins (struct ordering)
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best.getField("hits") > 0, best.getField("lang"))
        .otherwise(F.lit("unknown"))
        .alias("pred_lang"),
    )


def repetition_metrics(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals, the standard
    pretraining quality filters (Rae et al. 2021 §A1.1, public):

    - ``dup_line_frac``      — fraction of (trimmed, non-empty) lines
      whose content occurs more than once in the doc, counting every
      occurrence beyond the first: (n_lines − n_distinct_lines)/n_lines.
    - ``dup_line_char_frac`` — characters inside ALL occurrences of
      repeated lines / characters inside all lines.
    - ``top_bigram_char_frac`` — characters covered by the most
      repetition-heavy word 2-gram (occurrences × bigram length, only
      when it occurs >1×) / canonical-text length.

    Plan shape: repeated content is counted via explode → two-level
    aggregation — partial map-side (doc_id, line|bigram) counts, then a
    per-doc rollup — NOT per-row O(L²) array HOFs (the fingerprints
    Catalyst-inlining lesson, PLANS.md): both shuffles are keyed by
    doc_id+content with map-side combine, so the stage stays linear in
    corpus size and partitions by doc hash at any scale."""
    docs = widen_narrow_scan(docs)
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    # group on xxhash64(line), carrying the char length alongside: the
    # occurrence-count shuffle moves an 8-byte key instead of the full
    # line text (lines can be arbitrarily wide); identical counts modulo
    # a ~2^-64 collision
    ln = d.select(
        "doc_id",
        F.explode(lines).alias("line"),
    ).select(
        "doc_id", F.xxhash64("line").alias("lh"), F.length("line").alias("llen")
    )
    per_line = ln.groupBy("doc_id", "lh").agg(
        F.count("*").alias("c"), F.first("llen").alias("llen")
    )
    line_agg = per_line.groupBy("doc_id").agg(
        F.sum("c").alias("n_lines"),
        F.count("*").alias("n_distinct_lines"),
        F.sum(F.col("c") * F.col("llen")).alias("line_chars"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.col("llen")).otherwise(F.lit(0))
        ).alias("dup_line_chars"),
    )

    words = F.split(canonical_text(F.col("text")), " ")
    n = F.size(words)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    bg = d.select("doc_id", F.explode(bigrams).alias("bigram")).select(
        "doc_id", F.xxhash64("bigram").alias("bh"), F.length("bigram").alias("blen")
    )
    per_bg = bg.groupBy("doc_id", "bh").agg(
        F.count("*").alias("c"), F.first("blen").alias("blen")
    )
    bg_agg = per_bg.groupBy("doc_id").agg(
        F.max(
            F.when(F.col("c") > 1, F.col("c") * F.col("blen")).otherwise(F.lit(0))
        ).alias("top_bigram_chars"),
    )

    return (
        d.select("doc_id", F.length(canonical_text(F.col("text"))).alias("canon_chars"))
        .join(line_agg, "doc_id", "left")
        .join(bg_agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.round(
                (F.coalesce("n_lines", F.lit(0)) - F.coalesce("n_distinct_lines", F.lit(0)))
                / F.greatest(F.coalesce("n_lines", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.coalesce("dup_line_chars", F.lit(0))
                / F.greatest(F.coalesce("line_chars", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_line_char_frac"),
            F.round(
                F.coalesce("top_bigram_chars", F.lit(0))
                / F.greatest(F.col("canon_chars"), F.lit(1)),
                6,
            ).alias("top_bigram_char_frac"),
        )
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens, and a BPE-ish subword count =
    maximal alphanumeric runs + non-space punctuation characters (each
    punctuation char is its own piece — the usual pre-tokenizer shape).
    RE2-compatible (no lookarounds) so the same regexes run in any engine."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    runs = F.size(
        F.filter(F.split(F.col(text_col), "[^A-Za-z0-9]+"), lambda t: t != "")
    )
    punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("long").alias("ws_tokens"),
        (runs + punct).cast("long").alias("subword_tokens"),
    )


def winnow_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        kgram: int = 8, window: int = 4) -> DataFrame:
    """Document fingerprinting (winnowing): md5 over character k-grams,
    minimum per sliding window of `window` consecutive k-gram hashes —
    the standard rolling-hash fingerprint (Schleimer et al., MOSS).

    Plan-shape constraint: the gram array must NOT be referenced inside a
    per-window lambda (`transform(wins, i -> array_min(slice(grams, i,
    w)))`). Catalyst inlines the alias into the lambda body and the O(n)
    md5 array is then re-evaluated for EVERY window element — O(n²)
    md5+regex per document (measured: 495s vs 1.4s on 500 docs; a
    withColumn stage does not help, CollapseProject still inlines).
    Instead the per-window minimum is an elementwise fold of `window`
    SHIFTED slices via zip_with/least: zip_with arguments are evaluated
    once per row, lambdas only see element variables, so the whole thing
    stays linear and shuffle-free."""
    docs = widen_narrow_scan(docs)
    staged = docs.select(
        F.col(id_col).alias("doc_id"), canonical_text(F.col(text_col)).alias("_txt")
    ).withColumn(
        "_grams",
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length("_txt") - kgram + 1, F.lit(1))
            ),
            lambda i: F.md5(F.col("_txt").substr(i, F.lit(kgram))),
        ),
    ).withColumn(
        # windows = greatest(#grams - window + 1, 1), derived from text
        # length so no size(_grams) re-evaluation is needed
        "_nwins",
        F.greatest(
            F.greatest(F.length("_txt") - kgram + 1, F.lit(1)) - window + 1, F.lit(1)
        ),
    )
    acc = F.slice(F.col("_grams"), F.lit(1), F.col("_nwins"))
    for j in range(1, window):
        # zip_with pads the shorter (shifted) slice with NULL; least()
        # skips NULLs, so tail windows reduce over the elements that exist
        acc = F.zip_with(
            acc,
            F.slice(F.col("_grams"), F.lit(j + 1), F.col("_nwins")),
            lambda a, b: F.least(a, b),
        )
    return staged.select(
        "doc_id", F.explode(F.array_distinct(acc)).alias("fingerprint")
    )


# ----------------------------------------------------------------------
# Multimodal plumbing: stdlib-decodable formats are really decoded;
# codec-requiring payloads get a deterministic fake, flagged
# decoded_real=false so downstream can tell them apart

MULTIMODAL_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int,"
    " feature array<double>, decoded_real boolean"
)


def sniff_decode(p: bytes):
    """Pure-stdlib media decode: → (width, height, n_frames, feature) or
    None when the format needs an external codec.

    Really decoded (no PIL/ffmpeg required):
    - PNG: IHDR width/height (big-endian at offset 16)
    - GIF87a/89a: logical-screen width/height (little-endian at 6)
    - JPEG: first SOF0-SOF15 frame header scan
    - PPM/PGM (P5/P6): ASCII header; feature = first 8 raw pixel bytes
    - WAV: stdlib `wave` — (sample_rate, channels, n_frames); feature =
      first 8 samples normalized to [-1, 1]
    """
    import struct

    if len(p) < 10:
        return None
    if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
        w, h = struct.unpack(">II", p[16:24])
        return w, h, 1, [float(b) / 255.0 for b in p[24:32]]
    if p[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", p[6:10])
        return w, h, 1, [float(b) / 255.0 for b in p[10:18]]
    if p[:2] == b"\xff\xd8":  # JPEG: scan markers for a start-of-frame
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                return None
            marker = p[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", p[i + 5:i + 9])
                return w, h, 1, [float(b) / 255.0 for b in p[i + 9:i + 17]]
            i += 2 + struct.unpack(">H", p[i + 2:i + 4])[0]
        return None
    if p[:2] in (b"P5", b"P6"):  # PGM/PPM: one shared header parser
        pnm = _parse_pnm(p)
        if pnm is None:
            return None
        w, h, _maxval, _ch, off = pnm
        return w, h, 1, [float(b) / 255.0 for b in p[off:off + 8]]
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(p)) as wf:
                nf = wf.getnframes()
                raw = wf.readframes(min(8, nf))
                sw = wf.getsampwidth()
                feats = []
                for k in range(0, min(len(raw), 8 * sw), sw):
                    v = int.from_bytes(raw[k:k + sw], "little",
                                       signed=(sw > 1))
                    # 8-bit PCM is stored UNSIGNED (silence = 0x80):
                    # recenter before normalizing so silence → 0.0
                    feats.append((v - 128) / 128.0 if sw == 1
                                 else v / float(2 ** (8 * sw - 1)))
                return wf.getframerate(), wf.getnchannels(), nf, feats
        except (wave.Error, EOFError):
            return None
    return None


def decode_media_batches(media: DataFrame, stub: bool = True) -> DataFrame:
    """mapInPandas plumbing for opaque binary media columns.

    Input schema: (media_id long, kind string, payload binary, meta string).
    Formats with stdlib-parseable structure are REALLY decoded
    (sniff_decode: PNG/GIF/JPEG/PPM/PGM headers, WAV via `wave` — for
    audio, width=sample_rate, height=channels, n_frames=frames).
    Payloads needing an external codec fall back to a DETERMINISTIC FAKE
    derived from the payload bytes, flagged decoded_real=false in the
    output (this container has no PIL/ffmpeg); with stub=False they
    raise instead. Batch shape, Arrow transfer, partitioning, and output
    schema are real either way.
    """
    media = widen_narrow_scan(media)

    def decode(iterator):
        import pandas as pd

        for pdf in iterator:
            widths, heights, frames, feats, real = [], [], [], [], []
            for p in pdf["payload"]:
                got = sniff_decode(p) if p is not None else None
                is_real = got is not None
                if got is not None:
                    w, h, nf, fv = got
                elif p is None:
                    w, h, nf, fv = 0, 0, 1, []
                elif not stub:
                    raise NotImplementedError(
                        "payload format requires an external codec (PIL/ffmpeg)"
                    )
                else:
                    # deterministic fake: dimensions from payload bytes
                    w, h = _fake_dims(p)
                    nf = 1
                    fv = [float(b) / 255.0 for b in p[:8]]
                widths.append(w)
                heights.append(h)
                frames.append(nf)
                feats.append(fv)
                real.append(is_real)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": widths,
                    "height": heights,
                    "n_frames": frames,
                    "feature": feats,
                    "decoded_real": real,
                }
            )

    return media.mapInPandas(decode, MULTIMODAL_SCHEMA)


def _parse_pnm(p: bytes):
    """Parse a P5 (PGM) / P6 (PPM) header → (w, h, maxval, channels,
    raster_offset) or None. The ONE header walk shared by sniff_decode
    (dims + feature bytes) and resize_media (full-raster resize);
    callers decide what maxval range they can consume."""
    if p[:2] not in (b"P5", b"P6"):
        return None
    channels = 1 if p[:2] == b"P5" else 3
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3 and i < len(p):
        while i < len(p) and p[i:i + 1].isspace():
            i += 1
        if p[i:i + 1] == b"#":
            while i < len(p) and p[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(p) and not p[j:j + 1].isspace():
            j += 1
        toks.append(p[i:j])
        i = j
    try:
        w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
    except (ValueError, IndexError):
        return None
    if maxval <= 0:
        return None
    return w, h, maxval, channels, i + 1


def _fake_dims(p: bytes) -> tuple[int, int]:
    """Deterministic fallback dimensions for codec-requiring payloads —
    the ONE formula shared by decode_media_batches, resize_media, and
    their DuckDB oracles (SQL_MULTIMODAL / SQL_MULTIMODAL_RESIZE)."""
    return (len(p) % 64) * 16 + 16, (len(p) % 48) * 16 + 16


RESIZE_SCHEMA = (
    "media_id long, kind string, src_width int, src_height int,"
    " width int, height int, pixels array<double>, resized_real boolean"
)


def resize_media(media: DataFrame, out_w: int = 4, out_h: int = 4,
                 stub: bool = True) -> DataFrame:
    """Nearest-neighbor media resize as mapInPandas plumbing.

    Input schema: (media_id long, kind string, payload binary, meta
    string) — the same opaque-binary contract as decode_media_batches.

    - PGM/PPM (P5/P6, maxval ≤ 255): REALLY resized — the raster is in
      the payload, so each output pixel (y, x) samples the true source
      pixel at (y*src_h//out_h, x*src_w//out_w); P6 outputs the channel
      mean. resized_real=true.
    - PNG/GIF/JPEG: the header yields true src dims but the raster is
      compressed (no codecs in this container) → deterministic fake
      pixels sampled from the payload BYTES (flat index i ↦ byte
      i*len//(out_w*out_h), normalized /255), resized_real=false. With
      stub=False these raise NotImplementedError instead.
    - Unrecognized payloads: fake dims (as decode_media_batches) + the
      same byte-sampled fake pixels.

    The fake path is still content-derived and engine-independent, so
    the DuckDB oracle checks the actual byte math, not just shapes.
    """
    media = widen_narrow_scan(media)
    npix = out_w * out_h

    def fake_pixels(p: bytes) -> list[float]:
        if not p:
            return [0.0] * npix
        return [float(p[(k * len(p)) // npix]) / 255.0 for k in range(npix)]

    def run(iterator):
        import pandas as pd

        for pdf in iterator:
            sw_l, sh_l, px_l, real_l = [], [], [], []
            for raw_p in pdf["payload"]:
                p = bytes(raw_p) if raw_p is not None else b""
                pnm = _parse_pnm(p)
                if pnm is not None:
                    w, h, maxval, ch, off = pnm
                    need = off + w * h * ch
                    if maxval <= 255 and len(p) >= need and w > 0 and h > 0:
                        out = []
                        for y in range(out_h):
                            sy = (y * h) // out_h
                            for x in range(out_w):
                                sx = (x * w) // out_w
                                base = off + (sy * w + sx) * ch
                                v = sum(p[base:base + ch]) / ch
                                out.append(v / maxval)
                        sw_l.append(w); sh_l.append(h)
                        px_l.append(out); real_l.append(True)
                        continue
                got = sniff_decode(p)
                if got is not None and not stub:
                    raise NotImplementedError(
                        "raster decode requires an external codec (PIL/ffmpeg)"
                    )
                if got is not None:
                    w, h = got[0], got[1]
                elif raw_p is None:
                    # mirror decode_media_batches: a NULL payload is
                    # 0×0; an EMPTY payload gets the fake dims (16×16)
                    w, h = 0, 0
                else:
                    w, h = _fake_dims(p)
                sw_l.append(w); sh_l.append(h)
                px_l.append(fake_pixels(p)); real_l.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "src_width": sw_l,
                    "src_height": sh_l,
                    "width": [out_w] * len(pdf),
                    "height": [out_h] * len(pdf),
                    "pixels": px_l,
                    "resized_real": real_l,
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = (
    "media_id long, kind string, n_frames int, frame_idx array<int>,"
    " samples array<double>, sampled_real boolean"
)


def sample_frames(media: DataFrame, n_samples: int = 8,
                  stub: bool = True) -> DataFrame:
    """Evenly-spaced frame sampling as mapInPandas plumbing.

    Input schema: (media_id long, kind string, payload binary, meta
    string). Picks n_samples evenly spaced frame indices
    (i ↦ i*n_frames//n_samples) and one normalized value per index:

    - WAV: REALLY sampled — stdlib `wave` reads the raster; value =
      first-channel PCM sample at the chosen frame, normalized to
      [-1, 1]. sampled_real=true.
    - Everything else: the payload BYTES are the frame axis
      (n_frames = len(payload)); value = byte/255. sampled_real=false;
      with stub=False, payloads whose header was recognized (a real
      video/image needing a codec) raise instead.

    Mirrors video frame-sampling plumbing: schema, Arrow batch shape,
    and the index math are what a real decoder-backed version keeps.
    """
    media = widen_narrow_scan(media)

    def run(iterator):
        import io
        import wave

        import pandas as pd

        for pdf in iterator:
            nf_l, idx_l, val_l, real_l = [], [], [], []
            for p in pdf["payload"]:
                p = bytes(p) if p is not None else b""
                if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                    try:
                        with wave.open(io.BytesIO(p)) as wf:
                            nf = wf.getnframes()
                            sw = wf.getsampwidth()
                            idxs = [(k * nf) // n_samples
                                    for k in range(n_samples)] if nf else []
                            vals = []
                            # seek per sampled frame — decoding the whole
                            # raster to pick n samples would hold a 2nd
                            # payload-sized copy per row (an hour of PCM
                            # is ~700 MB; 8 single-frame reads are bytes)
                            for fi in idxs:
                                wf.setpos(fi)
                                raw = wf.readframes(1)
                                v = int.from_bytes(raw[:sw], "little",
                                                   signed=(sw > 1))
                                # 8-bit PCM is unsigned (silence 0x80)
                                vals.append((v - 128) / 128.0 if sw == 1
                                            else v / float(2 ** (8 * sw - 1)))
                            nf_l.append(nf); idx_l.append(idxs)
                            val_l.append(vals); real_l.append(True)
                            continue
                    except (wave.Error, EOFError):
                        pass
                if not stub and sniff_decode(p) is not None:
                    raise NotImplementedError(
                        "frame decode requires an external codec (PIL/ffmpeg)"
                    )
                nf = len(p)
                idxs = [(k * nf) // n_samples for k in range(n_samples)] if nf else []
                nf_l.append(nf)
                idx_l.append(idxs)
                val_l.append([float(p[fi]) / 255.0 for fi in idxs])
                real_l.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_frames": nf_l,
                    "frame_idx": idx_l,
                    "samples": val_l,
                    "sampled_real": real_l,
                }
            )

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


# ----------------------------------------------------------------------
# PII scrubbing: pure column expressions (regexp_count / regexp_replace)
# — the redaction stage every training-data pipeline runs before
# tokenization. Patterns are written to the common Java-regex/RE2
# subset (no lookaround, no \b) so the DuckDB oracle runs them verbatim.

PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("cc", r"\d{4}[ \-]?\d{4}[ \-]?\d{4}[ \-]?\d{4}", "<CC>"),
    ("phone", r"\d{3}[\- .]\d{3}[\- .]\d{4}", "<PHONE>"),
    ("ip", r"(?:\d{1,3}\.){3}\d{1,3}", "<IP>"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact emails / credit-card numbers / phone numbers / IPv4
    addresses. Counts are measured on the ORIGINAL text; replacements
    apply sequentially in PII_PATTERNS order (cc before phone, so a
    16-digit card is not half-eaten by the phone pattern). All JVM-side
    — linear scan per row, no shuffle, trivially 100 TB-safe."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return docs.select(F.col(id_col), *counts, clean.alias("clean_text"))


# ----------------------------------------------------------------------
# Vocabulary / document-frequency stats: the TF-IDF building block.

def vocab_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", top_n: int = 200) -> DataFrame:
    """Corpus vocabulary: per-token term frequency, document frequency,
    and idf = ln(N/df), top_n by tf. explode → two aggregations with
    map-side partial combine; the token split stays in the Java-regex/
    RE2 common subset. At 100 TB the groupBy shuffles skinny
    (token, doc_id) rows only; top-k is a TakeOrdered, not a sort.
    N rides along as a broadcast single-row aggregate so the function
    stays a lazy plan builder — no separate count() action at call
    time."""
    n = docs.agg(F.count("*").cast("double").alias("_n_docs"))
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"[^\p{L}\p{N}]+")).alias("token"),
    ).where(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("tf"),
             F.countDistinct(id_col).alias("df"))
        .crossJoin(F.broadcast(n))
        .withColumn("idf", F.round(F.log(F.col("_n_docs") / F.col("df")), 6))
        .drop("_n_docs")
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(top_n)
    )


# ----------------------------------------------------------------------
# Document chunking: fixed-token sliding windows with overlap — the
# stage between cleaning and packing that turns long documents into
# model-sized pieces (for training sequences or retrieval passages).

def chunk_documents(docs: DataFrame, window: int = 256,
                    stride: int | None = None, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split each document into whitespace-token windows of `window`
    tokens advancing by `stride` (overlap = window − stride; stride
    defaults to window → disjoint chunks).

    Start positions are 0, stride, 2·stride, … up to the FIRST start
    whose window reaches the document end (the smallest multiple of
    stride ≥ n − window) — so every token is covered, the final chunk
    may be short (> window − stride tokens), and no chunk is a pure
    suffix of its predecessor (starts past n − window + stride − 1
    would re-emit already-covered tails). A document of ≤ window
    tokens yields exactly one chunk; empty/NULL text yields none.

    Pure column expressions — split once, sequence() of starts,
    posexplode, slice — no UDF, no shuffle beyond the explode (map-side
    only: output partitioning follows the input). Per-row memory is one
    document's token array, the same bound every other text op here
    carries. Returns (doc_id, chunk_idx, start, n_tokens, chunk_text);
    chunk_text re-joins tokens with single spaces (whitespace runs are
    not preserved — chunking is a tokenizer-adjacent op, and the
    separator normalization is what makes chunk boundaries
    reproducible across engines).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    stride = window if stride is None else stride
    if not (1 <= stride <= window):
        # stride > window would leave tokens uncovered between windows
        # AND emit a phantom empty chunk past the end (the start
        # formula assumes overlap >= 0)
        raise ValueError(
            f"stride must be in [1, window={window}], got {stride}")
    # split-then-filter, NOT trim-then-split: F.trim strips only spaces
    # (0x20), so a trailing '\n' / leading '\t' would keep an empty
    # boundary token — a phantom chunk past the end and a shifted first
    # window (verified: 'a b\n' yielded chunk_text '')
    words = F.filter(F.split(F.col(text_col), r"\s+"),
                     lambda x: x != F.lit(""))
    n = F.size(F.col("_words"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - window + stride - 1, F.lit(0)),
        F.lit(stride),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), words.alias("_words"))
        .where(F.size(F.col("_words")) > 0)
        .select("doc_id", "_words",
                F.posexplode(starts).alias("chunk_idx", "start"))
        .select(
            "doc_id", "chunk_idx", "start",
            F.size(F.slice(F.col("_words"), F.col("start") + 1, window))
             .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("_words"), F.col("start") + 1, window), " "
            ).alias("chunk_text"),
        )
    )


# ----------------------------------------------------------------------
# Boilerplate line removal: per-source line-frequency filtering — the
# CCNet/C4-style cleaning pass that strips navigation, headers, cookie
# banners, and footer lines repeated across a source's documents.

def strip_boilerplate(docs: DataFrame, stratum_col: str = "source",
                      text_col: str = "text", id_col: str = "doc_id",
                      max_df_frac: float = 0.5,
                      min_df: int = 3) -> DataFrame:
    """Remove lines that repeat across a stratum's documents: a line
    (keyed by its lowercased trimmed form) that appears in ≥ `min_df`
    documents AND in ≥ `max_df_frac` of its stratum's documents is
    boilerplate; every occurrence is dropped. Blank lines are never
    counted and never removed (they are structure, not content — and
    counting them would strip every paragraph break in the corpus).

    Scale shape: one line explode → one (stratum, line-key) distinct-doc
    aggregation (the doc-frequency table, shrunk BEFORE any join) → the
    boilerplate subset joins back against the exploded lines on the
    md5 line key (skinny: id, pos, key — the raw line text does not
    ride through the frequency join) → one doc-keyed aggregation
    rebuilds the text in original line order via sort_array, bounded
    per row by one document like every text op here. Per-stratum doc
    totals are a broadcast. Returns one row per input document with
    non-NULL text: (doc_id, n_lines, n_removed, clean_text) — a doc
    whose every line was boilerplate comes back with clean_text ''
    (it was seen, and its emptiness is the signal).
    """
    if not (0.0 < max_df_frac <= 1.0):
        raise ValueError(f"max_df_frac must be in (0, 1], got {max_df_frac}")
    # NULL strata coalesce to a sentinel: the frequency joins are
    # equi-joins on stratum, and NULL never equals NULL — without this,
    # NULL-source docs would silently bypass the whole filter
    stratum = F.coalesce(F.col(stratum_col).cast("string"),
                         F.lit("\x00null"))
    lines = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            stratum.alias("stratum"),
            F.posexplode(F.split(F.col(text_col), "\n"))
             .alias("pos", "line"),
        )
        .withColumn("_key", F.md5(F.lower(F.trim(F.col("line")))))
        .withColumn("_blank", F.length(F.trim(F.col("line"))) == 0)
    )
    totals = (
        docs.where(F.col(text_col).isNotNull())
        .groupBy(stratum.alias("stratum"))
        .agg(F.countDistinct(id_col).alias("_n_docs"))
    )
    df_tbl = (
        lines.where(~F.col("_blank"))
        .groupBy("stratum", "_key")
        .agg(F.countDistinct("doc_id").alias("_df"))
        .join(F.broadcast(totals), "stratum")
        .where((F.col("_df") >= min_df)
               & (F.col("_df") >= F.col("_n_docs") * max_df_frac))
        .select("stratum", "_key", F.lit(True).alias("_bp"))
    )
    marked = (
        lines.join(df_tbl, ["stratum", "_key"], "left")
        .withColumn("_keep", F.col("_bp").isNull() | F.col("_blank"))
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum((~F.col("_keep")).cast("int")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.sort_array(F.collect_list(
                            F.struct("pos", "_keep", "line"))),
                        lambda s: s["_keep"],
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
        .select("doc_id", "n_lines",
                F.col("n_removed").cast("int").alias("n_removed"),
                "clean_text")
    )


# ----------------------------------------------------------------------
# Corpus sharding: deterministic pseudo-random global shuffle + shard
# assignment — the export stage that turns a curated corpus into the
# fixed shard files a training job streams.

def shard_corpus(docs: DataFrame, n_shards: int,
                 id_col: str = "doc_id", salt: str = "zshard1") -> DataFrame:
    """Assign every document a (shard, pos_in_shard) under a
    deterministic global shuffle: order = md5(salt ‖ ':' ‖ id) with id
    as tiebreak (same keyed-hash determinism discipline as
    stratified_sample — identical across engines and task retries,
    unlike df.orderBy(rand())), shard = (rank−1) mod n_shards,
    pos_in_shard = (rank−1) div n_shards. Round-robin over the shuffled
    order makes every shard an interleaved sample of the shuffled
    corpus with sizes balanced to ±1 document — no shard-level skew no
    matter how the input was laid out.

    The global rank comes from blocking.global_rank (repartitionByRange
    + per-partition counts + broadcast offsets — the scalable
    zipWithIndex shape), so nothing materializes a single-partition
    window at 10¹² docs. Returns the input columns plus
    (shuffle_key, rank, shard, pos_in_shard); writers partition the
    output by `shard` and sort by `pos_in_shard` within each.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from zentity_spark.blocking import global_rank

    keyed = docs.withColumn(
        "shuffle_key",
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
    )
    ranked = global_rank(keyed, ["shuffle_key", id_col])
    return ranked.select(
        *docs.columns, "shuffle_key", "rank",
        ((F.col("rank") - 1) % n_shards).cast("int").alias("shard"),
        # integer DIV, not float /: a double quantizes ranks past 2^53
        F.expr(f"CAST((rank - 1) DIV {int(n_shards)} AS BIGINT)")
         .alias("pos_in_shard"),
    )


# ----------------------------------------------------------------------
# Sequence packing: greedy first-fit-sequential packing of documents
# into fixed token budgets — the sample-packing stage that turns a
# filtered corpus into dense training sequences.

def pack_sequences(docs: DataFrame, budget: int = 128,
                   n_buckets: int = 8, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Assign each document a (bucket, bin_idx, pos_in_bin): documents
    are hashed into n_buckets independent packing streams (the unit of
    parallelism — at 100 TB you raise n_buckets, not the per-task
    state), ordered by id within a bucket, and packed greedily: a doc
    opens a new bin when adding its whitespace-token count would
    exceed `budget`. An oversized doc occupies a bin alone. The greedy
    scan is inherently sequential per bucket, so it runs as one
    applyInPandas pass per bucket — O(bucket) memory is bounded by
    skinny (id, n_tokens) rows, never the text."""
    import pandas as pd

    counted = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_buckets).alias("bucket"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, poss = [], []
        cur_bin, fill, pos = 0, 0, 0
        first = True
        for t in pdf["n_tokens"]:
            if not first and fill + t > budget:
                cur_bin += 1
                fill, pos = 0, 0
            bins.append(cur_bin)
            poss.append(pos)
            fill += int(t)
            pos += 1
            first = False
        pdf["bin_idx"] = bins
        pdf["pos_in_bin"] = poss
        return pdf

    schema = ("doc_id long, bucket long, n_tokens int,"
              " bin_idx int, pos_in_bin int")
    return counted.groupBy("bucket").applyInPandas(pack, schema)


# ----------------------------------------------------------------------
# End-to-end corpus curation: the composed pipeline the individual ops
# exist for — dedup -> quality filter -> language tag -> sequence pack.

def curate_corpus(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", min_tokens: int = 24,
                  max_punct_ratio: float = 0.5, budget: int = 256,
                  n_buckets: int = 8) -> DataFrame:
    """One curation pass over a raw document corpus:

      1. exact_dedup      keep the min-id representative of each
                          canonical-text group
      2. text_quality     drop short (< min_tokens) and punctuation-
                          heavy (> max_punct_ratio) docs
      3. language_id      tag every survivor with its predicted language
      4. pack_sequences   pack survivors into `budget`-token bins

    → (doc_id, pred_lang, bucket, n_tokens, bin_idx, pos_in_bin), one
    row per surviving document. Each stage is the already-tested
    operator (quality metrics via the shared text_quality_cols
    expressions, dedup via exact_dedup's window rule); the composition
    evaluates dedup + quality in ONE scan of the corpus (the dedup
    window shuffles by text hash anyway, so the quality expressions
    ride along for free), prunes, then runs language scoring and
    packing over survivors only — two corpus-sized passes total, and
    the packing shuffle moves skinny (id, n_tokens) rows into
    n_buckets independent streams."""
    qcols = text_quality_cols(F.col(text_col))
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        qcols["n_tokens"].alias("n_tokens"),
        qcols["punct_ratio"].alias("punct_ratio"),
        F.md5(canonical_text(F.col(text_col))).alias("text_hash"),
    ).withColumn(
        "keep_id", F.min("doc_id").over(Window.partitionBy("text_hash"))
    )
    kept = scored.where(
        (F.col("keep_id") == F.col("doc_id"))
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
    ).select("doc_id", "text").localCheckpoint()
    packed = pack_sequences(kept, budget=budget, n_buckets=n_buckets)
    lang = language_id(kept)
    return packed.join(lang, "doc_id").select(
        "doc_id", "pred_lang", "bucket", "n_tokens", "bin_idx", "pos_in_bin"
    )


# ----------------------------------------------------------------------
# Benchmark decontamination: flag training documents whose word n-grams
# overlap an evaluation/benchmark set — the standard pre-training hygiene
# pass (an eval example leaking into the corpus inflates benchmark
# scores). The benchmark side is SMALL (eval suites are MBs, the corpus
# is TBs), so it broadcasts; the corpus side is one map pass + one
# shuffle keyed on doc_id.

def word_ngrams(col: Column, n: int = 8) -> Column:
    """Distinct word n-grams of a text column as an array<string> —
    tokens split on the Java-regex/RE2-common [^\\p{L}\\p{N}]+ class
    (same split as vocab_stats), n-grams joined with single spaces.

    Plan-shape constraint (PLANS.md rule 1, the winnowing lesson): the
    token array must NOT be referenced inside a per-offset lambda
    (`transform(offsets, i -> slice(toks, i, n))`) — Catalyst inlines
    the computed array into the lambda body and re-runs split+filter
    for EVERY offset, O(L²) per document (measured 267s → 3s on the
    bench corpus). Instead the n-gram array is an elementwise fold of
    n SHIFTED slices via zip_with/concat_ws: slice arguments are
    evaluated once per row, lambdas only see element variables."""
    toks = F.filter(F.split(col, r"[^\p{L}\p{N}]+"), lambda t: t != "")
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    acc = F.slice(toks, F.lit(1), m)
    for j in range(1, n):
        acc = F.zip_with(
            acc, F.slice(toks, F.lit(j + 1), m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    # NULL text propagates NULL through split/slice/zip_with — a null
    # doc has zero n-grams, not an unknown set (decontaminate's
    # n_ngrams/contaminated must stay non-null for it)
    return F.coalesce(F.array_distinct(acc), F.array().cast("array<string>"))


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  threshold: float = 0.5, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document contamination against a benchmark corpus: the
    fraction of the doc's distinct word n-grams that appear anywhere in
    the benchmark's n-gram set, and a `contaminated` flag at
    `threshold`. → (doc_id, n_ngrams, n_hits, contamination,
    contaminated).

    Scale design: the benchmark n-gram set is built once (distinct) and
    BROADCAST — corpus rows never shuffle to meet it. Each corpus doc
    explodes its distinct n-grams (explode_outer so gram-less docs
    survive), left-broadcast-joins the benchmark set map-side, and one
    groupBy(doc_id) — the only shuffle, keyed on the high-cardinality
    id — folds hits and totals. No corpus-side distinct, no benchmark-
    side shuffle, no driver collect."""
    docs = widen_narrow_scan(docs)
    bench = (
        benchmark.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        word_ngrams(F.col(text_col), n).alias("_grams"),
    )
    exploded = staged.select(
        "doc_id",
        F.size("_grams").alias("n_ngrams"),
        F.explode_outer("_grams").alias("gram"),
    )
    return (
        exploded.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.first("n_ngrams").alias("n_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("int").alias("n_hits"),
        )
        .withColumn(
            "contamination",
            F.when(F.col("n_ngrams") == 0, F.lit(0.0)).otherwise(
                F.round(F.col("n_hits") / F.col("n_ngrams"), 6)
            ),
        )
        .withColumn("contaminated", F.col("contamination") >= threshold)
    )


# ----------------------------------------------------------------------
# Deterministic stratified sampling: reproducible per-stratum rates with
# no RNG state — keep a row iff the first 8 hex chars of
# md5(salt:doc_id) sort below the stratum's threshold. Zero shuffle
# (pure map), identical decisions on any engine that has md5, stable
# under re-runs/retries/repartitioning (the property Spark's
# df.sample() does NOT have across retries).

def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      stratum_col: str = "stratum",
                      id_col: str = "doc_id",
                      salt: str = "zs1") -> DataFrame:
    """Keep each row with its stratum's probability, decided by a
    deterministic hash of (salt, id): keep iff
    substr(md5(salt || ':' || id), 1, 8) < hex(rate * 2^32). Strata
    absent from `rates` are dropped (rate 0). Adds `sample_key` (the
    hex key) for auditability."""
    rates = {str(k): float(v) for k, v in rates.items()}
    pairs: list[Column] = []
    for k in sorted(rates):
        thr = format(min(max(int(rates[k] * 0x100000000), 0), 0x100000000), "09x")
        pairs.extend([F.lit(k), F.lit(thr)])
    thr_map = F.create_map(*pairs) if pairs else F.create_map()
    key = F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )
    thr_col = thr_map[F.col(stratum_col).cast("string")]
    return (
        docs.withColumn("sample_key", key)
        .where(thr_col.isNotNull() & (F.concat(F.lit("0"), F.col("sample_key")) < thr_col))
    )


def domain_mixture(docs: DataFrame, stratum_col: str = "stratum",
                   text_col: str = "text") -> DataFrame:
    """Per-stratum corpus mixture: document and whitespace-token counts
    plus each stratum's fraction of the corpus → (stratum, n_docs,
    n_tokens, doc_frac, token_frac). One groupBy on the (low-
    cardinality) stratum with map-side partial aggregation; totals ride
    along as a broadcast single-row aggregate, not a second pass."""
    per = docs.groupBy(F.col(stratum_col).cast("string").alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+"))).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("double").alias("_td"),
        F.sum("n_tokens").cast("double").alias("_tt"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "stratum", "n_docs", "n_tokens",
            F.round(F.col("n_docs") / F.col("_td"), 6).alias("doc_frac"),
            F.round(F.col("n_tokens") / F.col("_tt"), 6).alias("token_frac"),
        )
    )


# ----------------------------------------------------------------------
# End-to-end near-duplicate deduplication: MinHash-LSH pairs →
# transitive groups (two docs 80% similar to a third are duplicates of
# each other even if their direct Jaccard is below threshold) → keep
# the minimum-id representative per group.

def near_dup_dedup(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 3, bands: int = 8,
                   jaccard_threshold: float = 0.5) -> DataFrame:
    """→ (doc_id, group_id, kept): every document labeled with its
    transitive near-duplicate group (group id = min member id) and
    whether it is the group's kept representative. Docs in no verified
    pair are their own group.

    Composition of two already-tested operators: `near_dup_pairs`
    (banded MinHash-LSH candidates, exact-Jaccard verify on hashed
    shingle sets) feeds `connected_components` (large-star/small-star).
    Ids are zero-padded (width 32) before entering CC so its
    lexicographic min is the numeric min for integral ids — the keeper
    rule stays engine-portable — and the padded labels are mapped back
    to ORIGINAL ids through joins, never a cast (string ids survive;
    ids longer than 32 chars are unsupported — lpad would truncate and
    could collide). The final assignment is one left join of the
    (corpus-sized) id list against the (duplicate-sized, typically
    tiny) component map."""
    from zentity_spark.clustering import connected_components

    pairs = near_dup_pairs(docs, text_col, id_col, k, bands,
                           jaccard_threshold)
    pad = lambda c: F.lpad(c.cast("string"), 32, "0")  # noqa: E731
    edges = pairs.select(pad(F.col("id_l")).alias("src"),
                         pad(F.col("id_r")).alias("dst"))
    cc = connected_components(edges)
    idmap = docs.select(F.col(id_col).alias("doc_id")).distinct().select(
        "doc_id", pad(F.col("doc_id")).alias("_pad")
    )
    assigned = (
        cc.join(idmap.withColumnRenamed("doc_id", "_member")
                     .withColumnRenamed("_pad", "record_id"), "record_id")
        .join(idmap.withColumnRenamed("doc_id", "_grp")
                   .withColumnRenamed("_pad", "cluster_id"), "cluster_id")
        .select(F.col("_member").alias("doc_id"), "_grp")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(assigned, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_grp"), F.col("doc_id")).alias("group_id"),
        )
        .withColumn("kept", F.col("doc_id") == F.col("group_id"))
    )


# ----------------------------------------------------------------------
# Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
# cluster the embedding space coarsely, then dedup INSIDE clusters only
# — the pair quadratic shrinks from O(n²) to sum over clusters of
# O(|c|²), and the cluster assignment itself is map-only.

def semantic_dedup(embeddings: DataFrame, n_centroids: int = 16,
                   threshold: float = 0.3, dim: int = 64,
                   max_cluster_size: int | None = 100_000,
                   salt_threshold: int | None = 2000,
                   with_metrics: bool = False):
    """→ (vec_id, cid, keep): every vector labeled with its coarse
    cluster and whether it survives semantic dedup. A vector is a
    duplicate iff some LOWER-id vector in the SAME cluster has rounded
    cosine ≥ threshold (greedy min-id keeper — deterministic and
    engine-portable, the same keeper convention as exact_dedup).

    Scale design — three reused, already-audited pieces:
    - codebook: `ivf_centroids` (deterministic md5-sampled seeds,
      model-sized driver state, exactly the ann_ivf_topk quantizer);
    - assignment: `_ivf_cid_expr` — map-only inline argmax, no shuffle
      or join touches the vectors;
    - intra-cluster pairs: the SAME capped + salted self-join as entity
      blocking and embedding_near_dup (cluster id as the blocking key):
      a degenerate cluster larger than max_cluster_size is dropped
      deterministically and reported (with_metrics=True returns the
      dropped-blocks frame), hot clusters are salted so no task owns a
      whole cluster's quadratic. The verify join ships (id_l, id_r)
      rows only and fetches vectors + precomputed norms by id.

    threshold is corpus-relative: production SemDeDup uses ~0.95+ on
    real embeddings; the synthetic near-uniform test vectors sit at a
    low cosine floor (intra-cluster p99 ≈ 0.34 at sf0.01), so the
    contract query pins 0.3 to exercise a meaningful keep/drop split.
    """
    embeddings = widen_narrow_scan(embeddings)
    from zentity_spark.blocking import candidate_pairs as _candidate_pairs

    cents = ivf_centroids(embeddings, n_centroids, 0, dim)
    # three consumers (blocks, verify-side vectors, final output) —
    # materialize the assignment + norms once
    assigned = embeddings.select(
        "vec_id", "embedding", _ivf_cid_expr(cents),
        vec_norm(F.col("embedding")).alias("nrm"),
    ).localCheckpoint()
    blocks = assigned.select(
        F.lit("semdedup").alias("resolver"),
        F.col("cid").cast("string").alias("ckey"),
        F.col("vec_id").alias("record_id"),
    )
    cand, dropped = _candidate_pairs(
        blocks, max_block_size=max_cluster_size, salt_threshold=salt_threshold
    )
    dup_ids = (
        cand.select("id_l", "id_r").dropDuplicates(["id_l", "id_r"])
        .join(assigned.select(F.col("vec_id").alias("id_l"),
                              F.col("embedding").alias("emb_l"),
                              F.col("nrm").alias("nrm_l")), "id_l")
        .join(assigned.select(F.col("vec_id").alias("id_r"),
                              F.col("embedding").alias("emb_r"),
                              F.col("nrm").alias("nrm_r")), "id_r")
        .where(
            F.round(cosine_from_norms(F.col("emb_l"), F.col("emb_r"),
                                      F.col("nrm_l"), F.col("nrm_r")), 6)
            >= threshold
        )
        .select(F.col("id_r").alias("vec_id"))
        .distinct()
    )
    out = (
        assigned.select("vec_id", F.col("cid").cast("int").alias("cid"))
        .join(dup_ids.withColumn("_dup", F.lit(True)), "vec_id", "left")
        .withColumn("keep", F.col("_dup").isNull())
        .drop("_dup")
    )
    return (out, dropped) if with_metrics else out


# ----------------------------------------------------------------------
# Unigram-LM fluency scoring: the cheap stand-in for the KenLM
# perplexity filter in CCNet/Gopher-style pipelines — score each doc by
# the mean log corpus-MLE unigram probability of its tokens. No
# smoothing is needed: every scored token has corpus count ≥ 1 by
# construction (the LM is fit on the corpus being scored).

def lm_quality(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_tokens, logprob_mean): per-doc token count and mean
    ln p(token) under the corpus unigram MLE. Higher = more fluent /
    more typical; the usual filter drops both tails (gibberish low,
    boilerplate high).

    Plan (one explode pass, three keyed aggregations, no UDF):
    tokens → per-(doc, token) counts (map-side combine collapses the
    in-doc repeats) → corpus counts derived FROM the (doc, token)
    table (token-keyed shuffle of pre-aggregated rows — the raw-token
    join would be stopword-skewed; this one is vocab-shaped) → one
    token-keyed join + doc-keyed weighted average. NOT a lazy builder:
    the (doc, token) table is eagerly checkpointed at CALL time (two
    consumers — corpus counts and the scoring join — one
    materialization; the session-8 sweep measured the re-derivation
    as the dominant cost)."""
    docs = widen_narrow_scan(docs)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"[^\p{L}\p{N}]+")).alias("token"),
    ).where(F.col("token") != "")
    dtf = toks.groupBy("doc_id", "token").agg(
        F.count("*").alias("dtf")
    ).localCheckpoint()
    counts = dtf.groupBy("token").agg(F.sum("dtf").alias("ctf"))
    total = counts.agg(F.sum("ctf").cast("double").alias("_t"))
    scored = (
        dtf.join(counts, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("dtf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("dtf") * F.log(F.col("ctf") / F.col("_t")))
                / F.sum("dtf"), 6
            ).alias("logprob_mean"),
        )
    )
    return docs.select(F.col(id_col).alias("doc_id")).join(
        scored, "doc_id", "left"
    )


# ----------------------------------------------------------------------
# Per-document TF-IDF keywords: the per-doc layer over vocab_stats'
# corpus-level term statistics.

def tfidf_keywords(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """→ (doc_id, token, tf, score, kw_rank): each document's top-k
    terms by tf·idf with score = tf_doc · ln(N/df), ranked per doc.

    Determinism across engines: the window orders by the ROUNDED score
    (6dp, the same precision the correctness hash uses) with token ASC
    as the tie-break, so the rank-k cutoff cannot flip on last-bit
    float noise. Plan: explode → (doc, token) counts → document
    frequency derived FROM that table (vocab-shaped shuffle) → join
    back + one per-doc row_number window (a partition is one doc's
    distinct tokens — bounded by doc length, never corpus-sized).
    NOT a lazy builder: the (doc, token) table is eagerly checkpointed
    at call time (two consumers, one materialization)."""
    docs = widen_narrow_scan(docs)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"[^\p{L}\p{N}]+")).alias("token"),
    ).where(F.col("token") != "")
    dtf = toks.groupBy("doc_id", "token").agg(
        F.count("*").alias("tf")
    ).localCheckpoint()
    dfreq = dtf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("_n"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        dtf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score", F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 6)
        )
        .withColumn("kw_rank", F.row_number().over(w))
        .where(F.col("kw_rank") <= k)
        .select(
            "doc_id", "token", F.col("tf").cast("long").alias("tf"),
            "score", F.col("kw_rank").cast("int").alias("kw_rank"),
        )
    )


# ----------------------------------------------------------------------
# Exact substring deduplication (Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better", arXiv:2107.06499): find
# token spans of length >= min_tokens that occur more than once
# ANYWHERE in the corpus and remove every occurrence except the
# globally-first one. The reference method builds a corpus suffix
# array (single-machine); the distributed equivalent used here is the
# standard windowed-hash formulation: every sliding min_tokens-token
# window is hashed, windows whose hash occurs >1 times are duplicated,
# and the non-keeper occurrences are merged into maximal removal spans.

def _positioned_windows(docs: DataFrame, min_tokens: int,
                        text_col: str, id_col: str) -> DataFrame:
    """→ (doc_id, win_idx, h): one row per sliding min_tokens-token
    window, win_idx = 1-based start-token position, h = 16-byte binary
    md5 of the space-joined window.

    Plan shape: the window array is the same elementwise fold of
    SHIFTED slices as word_ngrams (PLANS.md rule 1 — never reference
    the computed token array inside a per-offset lambda), WITHOUT the
    distinct (positions matter here), then one posexplode. The hash is
    unhex(md5) binary — 16 bytes instead of a 32-char string — because
    this table is the op's dominant shuffle (one row per corpus token)
    and the digest never appears in output. 128 bits keeps false window
    merges off the table at trillion-window scale, where a 64-bit
    xxhash would already be deep into birthday collisions."""
    toks = F.filter(F.split(F.col(text_col), r"[^\p{L}\p{N}]+"),
                    lambda t: t != "")
    m = F.greatest(F.size(toks) - (min_tokens - 1), F.lit(0))
    acc = F.slice(toks, F.lit(1), m)
    for j in range(1, min_tokens):
        acc = F.zip_with(
            acc, F.slice(toks, F.lit(j + 1), m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.coalesce(acc, F.array().cast("array<string>")))
         .alias("_pos", "_gram"),
    ).select(
        "doc_id",
        (F.col("_pos") + 1).cast("int").alias("win_idx"),
        F.unhex(F.md5("_gram")).alias("h"),
    )


def substring_dup_spans(docs: DataFrame, min_tokens: int = 8,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        dup_method: str = "window") -> DataFrame:
    """→ (doc_id, span_start, span_end, span_tokens, n_windows): the
    maximal token spans to REMOVE under exact substring dedup — every
    window of min_tokens consecutive tokens whose text occurs elsewhere
    in the corpus, except each window-group's global keeper (minimum
    (doc_id, win_idx) occurrence, the same greedy first-occurrence
    convention as exact_dedup/paragraph_dedup), merged into maximal
    intervals per doc (gaps-and-islands over window starts).

    Scale design: dup_method="window" (default) marks keepers in ONE
    corpus-token-sized shuffle on the 16-byte digest — count(*) and
    row_number over (partition by h) share a single exchange+sort, then
    `n > 1 AND rn > 1` filters in place (measured 3-7× over the
    groupBy+join-back form at sf0.1: that form shuffles the window
    table TWICE, once to aggregate and once to join). Its one hazard: a
    pathologically hyper-duplicated window text (boilerplate repeated
    ~10⁸×) is a single window partition AQE cannot split — for such
    corpora dup_method="join" computes keepers with skew-immune partial
    aggregation and an AQE-skew-splittable join back, at the cost of
    the second shuffle. The islands pass is a per-doc window function:
    partitions are bounded by document length, never corpus-sized. No
    driver collect, no all-pairs product."""
    occ = _positioned_windows(docs, min_tokens, text_col, id_col)
    if dup_method == "window":
        w = Window.partitionBy("h")
        dup = (
            occ.withColumn("_n", F.count("*").over(w))
            .withColumn(
                "_rn",
                F.row_number().over(w.orderBy("doc_id", "win_idx")),
            )
            .where((F.col("_n") > 1) & (F.col("_rn") > 1))
            .select("doc_id", "win_idx",
                    (F.col("win_idx") + (min_tokens - 1)).alias("win_end"))
        )
    elif dup_method == "join":
        groups = (
            occ.groupBy("h")
            .agg(F.count("*").alias("_n"),
                 F.min(F.struct("doc_id", "win_idx")).alias("_keeper"))
            .where(F.col("_n") > 1)
        )
        dup = (
            occ.join(groups, "h")
            .where(~((F.col("_keeper.doc_id") == F.col("doc_id"))
                     & (F.col("_keeper.win_idx") == F.col("win_idx"))))
            .select("doc_id", "win_idx",
                    (F.col("win_idx") + (min_tokens - 1)).alias("win_end"))
        )
    else:
        raise ValueError(f"substring_dup_spans: unknown dup_method {dup_method!r}")
    w_ord = Window.partitionBy("doc_id").orderBy("win_idx")
    dup = (
        dup.withColumn(
            "_pmax",
            F.max("win_end").over(w_ord.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "_new",
            (F.col("_pmax").isNull()
             | (F.col("win_idx") > F.col("_pmax") + 1)).cast("int"),
        )
        .withColumn(
            "_isl",
            F.sum("_new").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        dup.groupBy("doc_id", "_isl")
        .agg(
            F.min("win_idx").cast("int").alias("span_start"),
            F.max("win_end").cast("int").alias("span_end"),
            F.count("*").cast("long").alias("n_windows"),
        )
        .select(
            "doc_id", "span_start", "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int").alias("span_tokens"),
            "n_windows",
        )
    )


def substring_dedup(docs: DataFrame, min_tokens: int = 8,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_tokens, n_removed, clean_text): the corpus with
    duplicated substrings removed — substring_dup_spans applied back to
    the token stream. clean_text is the space-join of the tokens
    OUTSIDE every removal span (tokenization is the op's canonical
    form, as in Lee et al.'s token-level removal).

    The spans arrive pre-merged and per-doc few, so the removal mask is
    a per-token exists() over the doc's span list — O(tokens × spans)
    per doc with tiny span counts, all JVM-side HOFs, no UDF. Lambdas
    only reference element variables and the joined span-array column
    (a plain attribute), so the token-array fold is evaluated once per
    row (PLANS.md rule 1)."""
    toks_col = F.filter(F.split(F.col(text_col), r"[^\p{L}\p{N}]+"),
                        lambda t: t != "")
    spans = substring_dup_spans(docs, min_tokens, text_col, id_col)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    staged = (
        docs.select(F.col(id_col).alias("doc_id"), toks_col.alias("_toks"))
        .join(per_doc, "doc_id", "left")
        .withColumn(
            "_spans",
            F.coalesce(
                "_spans",
                F.array().cast("array<struct<span_start:int,span_end:int>>"),
            ),
        )
    )
    # sequence(1, 0) would produce [1, 0] (Spark infers a negative
    # step), so the empty-token case is gated explicitly
    mask = F.when(
        F.size("_toks") > 0,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks")),
            lambda i: F.exists(
                F.col("_spans"),
                lambda s: (i >= s.span_start) & (i <= s.span_end),
            ),
        ),
    ).otherwise(F.array().cast("array<boolean>"))
    cleaned = F.array_compact(
        F.zip_with("_toks", mask, lambda t, c: F.when(c, F.lit(None)).otherwise(t))
    )
    return staged.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(cleaned)).cast("long").alias("n_removed"),
        F.array_join(cleaned, " ").alias("clean_text"),
    )
